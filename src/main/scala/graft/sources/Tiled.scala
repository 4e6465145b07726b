package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tile-partitioned swath layout — the Spark-native analog of the
  * reference's `resample_blocks` per-chunk cropping
  * (`pyresample/resampler.py:330-352`): instead of dask slicing each
  * source chunk to the target block's padded bbox, the swath is written
  * ONCE as parquet partitioned by coarse geographic tile
  * (`tile_y`, `tile_x`), and every downstream query that joins on the
  * tile columns gets the crop for free from Spark's partition pruning:
  *
  *   - a literal tile predicate prunes statically (listing-time —
  *     untouched tiles never even reach the file index);
  *   - a join against a filtered target tile set prunes dynamically
  *     (DPP: the broadcast side's tile ids become a runtime IN-filter
  *     on the partition columns, so only the tiles the targets touch
  *     are scanned).
  *
  * At 100 TB this is the difference between scanning the planet and
  * scanning the scene: the tile directory layout is the coarse spatial
  * index, and pruning happens before any row is read. Tile pitch is a
  * knob: larger tiles -> fewer partitions/files (listing cost), smaller
  * tiles -> tighter crops; 10-30 degrees keeps the file count in the
  * hundreds while cropping regional targets to a few percent of the
  * globe.
  *
  * Tile ids share the world-grid convention of `AreaDef` (x east from
  * -180, y south from +90) so a tile is a coarse super-cell of the
  * 1-degree world grid used across the query surface.
  */
object Tiled {

  /** Add `tile_y`/`tile_x` columns at `tileDeg` pitch. Pure floor
    * arithmetic on (lon, lat) — IEEE-exact, replayable by a SQL oracle. */
  def withTiles(df: DataFrame, tileDeg: Double,
      lonCol: String = "lon", latCol: String = "lat"): DataFrame =
    df.withColumn("tile_x", floor((col(lonCol) + 180.0) / tileDeg).cast("int"))
      .withColumn("tile_y", floor((lit(90.0) - col(latCol)) / tileDeg).cast("int"))

  /** Write `df` tile-partitioned (Hive-style `tile_y=…/tile_x=…`
    * directories). One shuffle-free pass: partitionBy fans rows into
    * per-tile files inside each task. */
  def writeTiled(df: DataFrame, path: String, tileDeg: Double,
      lonCol: String = "lon", latCol: String = "lat"): Unit =
    withTiles(df, tileDeg, lonCol, latCol)
      .write.mode("overwrite").partitionBy("tile_y", "tile_x").parquet(path)

  /** Write-once cache: materialize the tiled layout if absent (checked
    * via the writer's `_SUCCESS` marker), then return the partitioned
    * read. The write is a one-time indexing cost amortized across every
    * query that prunes on it — the same economics as the reference's
    * `cache_dir` LUTs. */
  def ensureTiled(spark: SparkSession, df: => DataFrame, path: String,
      tileDeg: Double): DataFrame = {
    val marker = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) writeTiled(df, path, tileDeg)
    spark.read.parquet(path)
  }

  /** Join a tiled source against a (small, already filtered) distinct
    * tile set. The broadcast makes the join a map-side hash probe AND
    * feeds dynamic partition pruning: Spark reuses the broadcast result
    * as a runtime filter on the scan's `tile_y`/`tile_x` partition
    * columns, so only matching tile directories are read. */
  def prunedJoin(tiled: DataFrame, tiles: DataFrame): DataFrame =
    tiled.join(broadcast(tiles), Seq("tile_y", "tile_x"))
}
