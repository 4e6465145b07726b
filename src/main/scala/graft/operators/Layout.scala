package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-layout planning: Z-order (Morton) interleaving and its measurable
  * effect on file-level min/max pruning.
  *
  * At 100 TB, scan cost is dominated by WHICH files a query touches.
  * Parquet readers prune files/row-groups on column min/max stats, so the
  * write-side sort order decides pruning power: row-major order packs each
  * file with a full-width horizontal stripe (good y bounds, useless x
  * bounds), while Z-order packs ~square tiles, giving every file tight
  * bounds on BOTH dimensions. This is the standard lakehouse layout
  * technique (Morton 1966; used by Delta/Iceberg `OPTIMIZE ZORDER BY`).
  *
  * `zValue` is pure integer bit-interleaving — shiftright/and/sum — exact
  * and identical in any engine; [[layoutReport]] turns it into a
  * falsifiable metric: assign cells to files under both orderings and
  * report total bbox area + how many files a fixed box query must touch.
  *
  * Production path: `df.repartitionByRange(nFiles, zcol)` + in-partition
  * sort by zcol — a single range shuffle; the report here uses an
  * `ntile` window over the (small) cell table purely to make the file
  * assignment deterministic for the oracle.
  */
object Layout {

  /** Morton interleave of two non-negative ints using `bits` bits each:
    * bit i of x lands at position 2i, bit i of y at 2i+1. */
  def zValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      (shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)

  /** Hilbert curve index of (x, y) on a 2^bits × 2^bits grid — the
    * classic level-by-level fold (Hilbert 1891; the xy→d form in
    * Warren, Hacker's Delight / the public-domain Wikipedia routine):
    * at each level s = 2^i the quadrant contributes s²·((3·rx) xor ry)
    * and the coordinate frame is flipped/swapped so the sub-square
    * recursion continues in canonical orientation. Unlike Morton order,
    * consecutive Hilbert indices are ALWAYS 4-neighbours (unit Manhattan
    * step — HilbertSpec proves bijection + adjacency), so equal-count
    * file cuts produce more compact bboxes and strictly better min/max
    * pruning on box queries.
    *
    * Pure integer fold, expressed as `aggregate` over the bit levels —
    * codegen'd, zero shuffles, and replayable op-for-op in the oracle
    * (DuckDB `list_reduce` with a seed-carrying struct). The xor is
    * rewritten `rx=1 ? 3-ry : ry` to stay on portable arithmetic. */
  def hilbertValue(xCol: String, yCol: String, bits: Int): Column = {
    val n1 = (1L << bits) - 1 // flips complement within the full grid
    val s = "shiftleft(cast(1 as bigint), i)"
    val rx = s"(case when (a.hx & $s) > 0 then 1 else 0 end)"
    val ry = s"(case when (a.hy & $s) > 0 then 1 else 0 end)"
    expr(s"""aggregate(
      sequence(${bits - 1}, 0, -1),
      named_struct('hx', cast($xCol as bigint), 'hy', cast($yCol as bigint),
                   'hd', cast(0 as bigint)),
      (a, i) -> named_struct(
        'hx', case when $ry = 0
                then (case when $rx = 1 then cast($n1 as bigint) - a.hy else a.hy end)
                else a.hx end,
        'hy', case when $ry = 0
                then (case when $rx = 1 then cast($n1 as bigint) - a.hx else a.hx end)
                else a.hy end,
        'hd', a.hd + $s * $s * (case when $rx = 1 then 3 - $ry else $ry end)),
      a -> a.hd)""")
  }

  /** The production write path the scorecard argues for: range-partition
    * by the Morton value (ONE range shuffle — Spark samples the z
    * distribution for balanced boundaries), sort within partitions, and
    * write one file per partition. Each output file then covers a
    * contiguous z-range ≈ a square tile, so min/max stats on x and y are
    * BOTH tight — the reader prunes files on either predicate.
    * ZorderWriteSpec verifies the written files' actual bboxes. */
  def zorderWrite(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int,
      path: String,
      nFiles: Int): Unit =
    df.withColumn("_z", zValue(col(xCol).cast("long"), col(yCol).cast("long"), bits))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)

  /** File-pruning scorecard: split `cells` into `nFiles` equal-count
    * files (a) in row-major order and (b) in Z-order; per file compute
    * the bbox; report, per layout, the summed bbox area and the number
    * of files whose bbox intersects the query box — all exact integers.
    *
    * @param cells one row per (x, y) cell, integer coords in [0, 2^bits)
    * @param box   query rectangle (xLo, xHi, yLo, yHi), inclusive
    */
  def layoutReport(
      cells: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int,
      nFiles: Int,
      box: (Int, Int, Int, Int),
      layouts: Seq[String] = Seq("rowmajor", "zorder")): DataFrame = {
    val (xLo, xHi, yLo, yHi) = box
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val keyed = cells.select(
      x.as("x"), y.as("y"),
      (y * (1L << bits) + x).as("ord_rowmajor"),
      zValue(x, y, bits).as("ord_zorder"),
      hilbertValue(xCol, yCol, bits).as("ord_hilbert"))
    def score(layout: String, ordCol: String): DataFrame = keyed
      .withColumn("file_id", ntile(nFiles).over(Window.orderBy(col(ordCol), col("y"), col("x"))))
      .groupBy("file_id")
      .agg(
        count(lit(1)).as("n_cells"),
        min("x").as("x0"), max("x").as("x1"),
        min("y").as("y0"), max("y").as("y1"))
      .withColumn("area", (col("x1") - col("x0") + 1) * (col("y1") - col("y0") + 1))
      .withColumn("touches",
        (col("x0") <= xHi && col("x1") >= xLo && col("y0") <= yHi && col("y1") >= yLo)
          .cast("long"))
      .agg(
        count(lit(1)).as("n_files"),
        sum("area").as("sum_bbox_area"),
        sum("touches").as("files_touched"))
      .select(lit(layout).as("layout"), col("n_files"), col("sum_bbox_area"),
        col("files_touched"))
    layouts.map(l => score(l, s"ord_$l")).reduce(_ unionByName _).orderBy("layout")
  }
}
