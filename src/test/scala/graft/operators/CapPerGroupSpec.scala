package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** capPerGroup / samplePerGroup: brute-force equivalence plus the plan
  * guarantee the op's scale story rests on — Spark's InferWindowGroupLimit
  * rewrite turning the row_number filter into a map-side bounded heap. */
class CapPerGroupSpec extends SparkSpec {

  private def mkRows: Seq[(Long, String, Long)] =
    (1L to 300L).map { i =>
      val grp = s"d${i % 7}"
      val score = if (i % 5 == 0) 10L else (i * 2654435761L) % 100L // tie mass
      (i, grp, score)
    }

  test("capPerGroup: matches per-group sort-take, ties broken by id") {
    val s = spark
    import s.implicits._
    val rows = mkRows
    val df = rows.toDF("doc_id", "grp", "score")
    for (n <- Seq(1, 4, 25, 1000)) {
      val got = Selection.capPerGroup(df, Seq("grp"), n,
          Seq(col("score").desc, col("doc_id").asc))
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("grp"),
          r.getAs[Long]("score"))).toSet
      val want = rows.groupBy(_._2).flatMap { case (_, g) =>
        g.sortBy(r => (-r._3, r._1)).take(n)
      }.toSet
      assert(got == want, s"mismatch at n=$n")
    }
  }

  test("capPerGroup: plan uses the WindowGroupLimit map-side heap") {
    val s = spark
    import s.implicits._
    val df = mkRows.toDF("doc_id", "grp", "score")
    val plan = Selection.capPerGroup(df, Seq("grp"), 8,
        Seq(col("score").desc, col("doc_id").asc))
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank-limit pushdown did not fire; plan:\n$plan")
  }

  test("samplePerGroup: exact k per group, repartition-invariant") {
    val s = spark
    import s.implicits._
    val df = mkRows.toDF("doc_id", "grp", "score")
    val a = Selection.samplePerGroup(df, Seq("grp"), 5)
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("doc_id"))).toSet
    assert(a.groupBy(_._1).forall(_._2.size == 5), "expected exactly 5 per group")
    val b = Selection.samplePerGroup(df.repartition(13).orderBy(col("doc_id").desc),
        Seq("grp"), 5)
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("doc_id"))).toSet
    assert(a == b, "sample changed under repartition/reorder")
    // k >= group size degrades to identity for that group
    val all = Selection.samplePerGroup(df, Seq("grp"), 10000).count()
    assert(all == df.count())
  }
}
