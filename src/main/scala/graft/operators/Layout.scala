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
      box: (Int, Int, Int, Int)): DataFrame = {
    val (xLo, xHi, yLo, yHi) = box
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val keyed = cells.select(
      x.as("x"), y.as("y"),
      (y * (1L << bits) + x).as("ord_rowmajor"),
      zValue(x, y, bits).as("ord_zorder"))
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
    score("rowmajor", "ord_rowmajor")
      .unionByName(score("zorder", "ord_zorder"))
      .orderBy("layout")
  }
}
