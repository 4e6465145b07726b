package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout — the co-located-join companion to [[Tiled]]'s
  * partition pruning. Writing both sides of a recurring equi-join
  * bucketed by the join key (same bucket count) makes the join
  * exchange-free: each task reads matching bucket files from both sides,
  * so at 100 TB the repeated cost of shuffling the fact table for every
  * query is paid ONCE at layout time. The same applies to `groupBy` on
  * the bucket key — the aggregation runs without an exchange because the
  * data is already hash-distributed by the key on disk.
  *
  * This is the Spark-native analog of the reference's precompute-and-
  * reuse economics (`resampler.py:80-141` LUT caching): an upfront
  * indexing pass amortized across every subsequent query. Use it for the
  * stable dimensions of a pipeline — (source id, geometry hash) LUTs,
  * document-id keyed stores joined on every incremental batch.
  */
object Bucketed {

  /** Write-once bucketed table: materialize `df` bucketed by
    * `bucketCols` into `buckets` buckets (optionally sorted in-bucket by
    * `sortCols`) unless the table already exists, then return it.
    * `path` makes it an external table (files survive the catalog). */
  def ensureBucketed(
      spark: SparkSession,
      df: => DataFrame,
      table: String,
      bucketCols: Seq[String],
      buckets: Int,
      sortCols: Seq[String] = Nil,
      path: Option[String] = None): DataFrame = {
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    if (!spark.catalog.tableExists(table)) {
      var w = df.write.mode("overwrite")
        .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
      path.foreach(p => w = w.option("path", p))
      w.format("parquet").saveAsTable(table)
    }
    spark.table(table)
  }
}
