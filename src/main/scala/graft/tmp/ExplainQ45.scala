import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

object ExplainQ45 {
  def walk(p: SparkPlan, depth: Int): Unit = {
    val m = p.metrics.map { case (k, v) => s"$k=${v.value}" }.mkString(", ")
    println("  " * depth + p.nodeName + "  [" + m.take(300) + "]")
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _ => p.children
    }
    kids.foreach(walk(_, depth + 1))
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = sys.env.getOrElse("Q", "q45_bilinear_stere")
    val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.1")
    val t0 = System.nanoTime()
    val n = df.queryExecution.toRdd.count()
    println(f"ELAPSED ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$n")
    walk(df.queryExecution.executedPlan, 0)
    spark.stop()
  }
}
