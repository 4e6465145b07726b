package graft.streaming

import graft.core.AreaDef
import graft.operators.BucketResampler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming surface (SURVEY §2.10). The reference is
  * batch-only; these operators extend the engine to incremental swath
  * ingestion. Bucket statistics (A1-A7) and EWA accumulation (A8) are
  * associative + commutative, so they stream directly as windowed
  * aggregations with watermarks; the kd-NN join is not streamable without
  * rework (documented limitation, same as the reference's precompute
  * model).
  */
object StreamingOps {

  /** Streaming bucket count/sum/mean over event-time windows: each incoming
    * point lands in its (window, cell) bucket; late data beyond the
    * watermark is dropped. Works on any streaming DataFrame carrying
    * (ts TIMESTAMP, lon, lat, value). */
  def bucketStats(
      stream: DataFrame,
      area: AreaDef,
      windowDuration: String = "1 minute",
      watermark: String = "2 minutes",
      valueCol: String = "value"): DataFrame = {
    val withCell = BucketResampler(area).withCell(stream)
    withCell
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDuration), col("cell"))
      .agg(
        count(lit(1)).as("n"),
        sum(col(valueCol)).as("sum_v"),
        avg(col(valueCol)).as("avg_v"))
  }

  /** Streaming event-type counts (events-table shape): tumbling windows. */
  def eventCounts(
      stream: DataFrame,
      windowDuration: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDuration), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"))
}
