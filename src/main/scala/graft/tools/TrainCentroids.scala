package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession

/** Dev tool: run the distributed Lloyd trainer
  * ([[graft.operators.Similarity.kmeansCentroids]]) over an sf dir's
  * embeddings table and print the resulting centroids as Scala literal
  * source for `queries/TrainedCentroids.scala` (whose DuckDB `VALUES`
  * twin is DERIVED from the Scala literals — one definition). The
  * production shape at 100 TB is exactly this: train on a bounded sample
  * offline, bake/broadcast the model, assign the full set with the
  * map-only argmax.
  *
  * Usage: runMain graft.tools.TrainCentroids [sfDir] [k] [iters] [scale]
  * Centroids are rounded to `scale` decimals (default 6) so the literals
  * are engine-portable (same doubles parsed by the JVM and DuckDB).
  */
object TrainCentroids {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val k = args.lift(1).map(_.toInt).getOrElse(8)
    val iters = args.lift(2).map(_.toInt).getOrElse(3)
    val scale = args.lift(3).map(_.toInt).getOrElse(6)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cs = Similarity.kmeansCentroids(emb, k = k, iters = iters)
      .map(_.map(x => BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_EVEN).toDouble))
    // only the Scala Seq is an artifact: TrainedCentroids.sf001k8Sql is
    // DERIVED from it, so printing a SQL block here would invite pasting a
    // second copy and re-creating the dual-definition de-sync hazard
    println("// ---- Scala (Seq[Array[Double]]) — paste into TrainedCentroids ----")
    println(cs.map(c => c.mkString("Array(", ", ", ")")).mkString("Seq(\n  ", ",\n  ", ")"))
    spark.stop()
  }
}
