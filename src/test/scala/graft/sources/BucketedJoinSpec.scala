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

  test("quantized-ANN rerank against a vec_id-bucketed vector store: store side never shuffles") {
    val s = spark
    import s.implicits._
    // the Similarity.quantizedTopK scaladoc claims an id-bucketed layout
    // spares the full-precision store its rerank shuffle — demonstrate
    // exactly that join shape: tiny survivor set joined by id against a
    // bucketed store. Only the survivor side may exchange.
    val store = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("cid"), col("embedding"))
    Bucketed.ensureBucketed(s, store, "b_vecstore", Seq("cid"), 4,
      sortCols = Seq("cid"), path = Some("/tmp/graft_bucketed/b_vecstore"))
    val survivors = Seq((0L, 0L, 100L), (0L, 20L, 90L), (100L, 40L, 80L))
      .toDF("qid", "cid", "qdot")
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val rerank = survivors.join(s.table("b_vecstore"), "cid")
      // AdaptiveSparkPlan's toString appends the pre-AQE "Initial Plan";
      // count exchanges in the executed final section only
      val plan = executedPlanString(rerank).split("== Initial Plan ==")(0)
      val nEx = "Exchange".r.findAllIn(plan).length
      assert(nEx == 1, s"only the survivor side may shuffle, got $nEx exchanges:\n${plan.take(2000)}")
      assert(rerank.count() == 3)
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
