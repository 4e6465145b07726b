package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Evidence for SCALING.md's co-located-join claim: with both sides
  * bucketed by the join key (same bucket count), the equi-join and the
  * bucket-key aggregation both plan WITHOUT any Exchange — the on-disk
  * bucket layout replaces the shuffle. */
class BucketedJoinSpec extends SparkSpec {

  private def executedPlanString(df: org.apache.spark.sql.DataFrame): String = {
    df.queryExecution.toRdd.count() // force execution so AQE finalizes
    df.queryExecution.executedPlan.toString
  }

  test("bucketed co-located join + bucket-key agg: zero exchanges") {
    val s = spark
    import s.implicits._
    val dir = "/tmp/graft_bucketed"
    val left = (0 until 10000).map(i => (i.toLong % 997, i.toLong, i * 0.5))
      .toDF("k", "id", "v")
    val right = (0 until 2000).map(i => (i.toLong % 997, s"n$i"))
      .toDF("k", "name")
    Bucketed.ensureBucketed(s, left, "b_left", Seq("k"), 8,
      sortCols = Seq("k"), path = Some(s"$dir/b_left"))
    Bucketed.ensureBucketed(s, right, "b_right", Seq("k"), 8,
      sortCols = Seq("k"), path = Some(s"$dir/b_right"))
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = s.table("b_left").join(s.table("b_right"), "k")
        .select(col("k"), col("v"), col("name"))
      val jplan = executedPlanString(joined)
      assert(!jplan.contains("Exchange"),
        s"bucketed join should not shuffle:\n${jplan.take(2000)}")
      assert(jplan.contains("SortMergeJoin"), jplan.take(500))
      // correctness of the exchange-free join vs driver-side key counts
      val lc = (0 until 10000).groupBy(_ % 997).view.mapValues(_.size.toLong)
      val rc = (0 until 2000).groupBy(_ % 997).view.mapValues(_.size.toLong)
      val expected = lc.map { case (k, n) => n * rc.getOrElse(k, 0L) }.sum
      assert(joined.count() == expected)

      val agg = s.table("b_left").groupBy("k").agg(sum("v").as("sv"))
      val aplan = executedPlanString(agg)
      assert(!aplan.contains("Exchange"),
        s"bucket-key aggregation should not shuffle:\n${aplan.take(2000)}")
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
