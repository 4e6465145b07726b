package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** Tiled layout (SCALING.md "tiled source" claim): partition pruning must
  * be PHYSICALLY visible — static (literal tile predicate -> partition
  * filters at listing time) and dynamic (join against a filtered tile set
  * -> runtime dynamicpruning filter on the partition columns) — and
  * semantically invisible (same rows as the unpartitioned computation). */
class TiledDppSpec extends SparkSpec {

  // 3 points per 30-degree tile over the full 12 x 6 tile grid
  private lazy val pts: DataFrame = {
    val s = spark
    import s.implicits._
    (for {
      tx <- 0 until 12; ty <- 0 until 6; i <- 0 until 3
    } yield {
      val lon = -180.0 + tx * 30.0 + 5.0 + i * 7.0
      val lat = 90.0 - ty * 30.0 - 5.0 - i * 7.0
      (tx.toLong * 100 + ty * 10 + i, lon, lat, (tx + ty + i).toDouble)
    }).toDF("pid", "lon", "lat", "value")
  }

  private lazy val tiledDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_tiled").toString + "/pts"
    Tiled.writeTiled(pts, dir, tileDeg = 30.0)
    dir
  }

  /** The scan leaves of the (possibly adaptive) executed plan — descends
    * into AQE query stages (leaf wrappers `collect` won't enter). */
  private def scans(df: DataFrame): Seq[FileSourceScanExec] = {
    def walk(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other =>
        other.children.flatMap(walk) ++ other.subqueries.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  test("tile columns: pure floor arithmetic, partitioned write round-trips") {
    val tiled = spark.read.parquet(tiledDir)
    assert(tiled.count() == pts.count())
    // every row lands in the tile its lon/lat imply
    val bad = tiled.filter(
      col("tile_x") =!= floor((col("lon") + 180.0) / 30.0).cast("int") ||
      col("tile_y") =!= floor((lit(90.0) - col("lat")) / 30.0).cast("int")).count()
    assert(bad == 0L)
  }

  test("static pruning: a literal tile predicate reads only matching partitions") {
    val tiled = spark.read.parquet(tiledDir)
    val q = tiled.filter(col("tile_x") === 3 && col("tile_y") === 2)
    // execute THIS dataframe's plan (count() would build its own) so the
    // scan metrics below belong to the executed query
    assert(q.collect().length == 3)
    val scan = scans(q).head
    assert(scan.toString.contains("PartitionFilters"),
      s"no partition filters in:\n${scan.toString.take(1500)}")
    assert(scan.metrics("numPartitions").value == 1L,
      s"expected 1 partition read, got ${scan.metrics("numPartitions").value}")
  }

  test("dynamic pruning: a filtered tile-set join scans only touched tiles") {
    val s = spark
    import s.implicits._
    val tiled = spark.read.parquet(tiledDir)
    // regional target window written to parquet so the dim side carries a
    // real selective filter (the DPP precondition), like a production query
    val tdir = java.nio.file.Files.createTempDirectory("graft_tgt").toString + "/tgt"
    // 60 targets inside the window (lon 6..50, lat 6..42 -> tiles
    // {1,2}x{6,7}) and 60 far outside it
    ((for (i <- 0 until 60) yield (i.toLong, 6.0 + (i % 12) * 4.0, 6.0 + (i / 12) * 9.0)) ++
      (for (i <- 0 until 60) yield (100L + i, -150.0 + (i % 10) * 8.0, -70.0 + (i / 10) * 10.0)))
      .toDF("dst_id", "lon", "lat").write.parquet(tdir)
    val tgts = spark.read.parquet(tdir)
      .filter(col("lon") >= 5.0 && col("lon") < 55.0 && col("lat") >= 5.0 && col("lat") < 55.0)
    val tiles = Tiled.withTiles(tgts, 30.0).select("tile_y", "tile_x").distinct()

    val joined = Tiled.prunedJoin(tiled, tiles)
      .groupBy("tile_y", "tile_x").agg(count(lit(1)).as("n"))

    // semantic check against the unpartitioned computation
    val expected = Tiled.withTiles(pts, 30.0)
      .join(tiles, Seq("tile_y", "tile_x"))
      .groupBy("tile_y", "tile_x").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val got = joined.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == expected && got.nonEmpty)

    // physical check: the runtime filter is in the plan and partitions
    // were actually pruned at execution
    val scan = scans(joined).find(_.relation.partitionSchema.nonEmpty).get
    val planStr = scan.toString
    assert(planStr.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning expression in:\n${planStr.take(2000)}")
    val nTiles = tiles.count()
    val read = scan.metrics("numPartitions").value
    assert(read == nTiles && read < 72,
      s"expected $nTiles of 72 partitions read, got $read")
  }
}
