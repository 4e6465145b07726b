package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** `Profile.profile` and `Selection.trendByGroup` fixtures. */
class ProfileTrendSpec extends SparkSpec {
  import spark.implicits._

  test("profile: counts, nulls, distincts, min/max per column") {
    val df = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, None: Option[String]), (3L, Some("b"))
    ).toDF("k", "s")
    val out = Profile.profile(df, Seq("k", "s")).orderBy("column_name").collect()
    assert(out.toSeq == Seq(
      Row("k", 4L, 0L, 3L, "1", "3"),
      Row("s", 4L, 1L, 2L, "a", "b")))
  }

  test("trendByGroup: exact line recovered, degenerate x -> nulls") {
    val line = (1 to 5).map(i => (1L, i.toLong, 2L * i + 3)) ++
      Seq((2L, 7L, 1L), (2L, 7L, 9L)) // zero x-variance group
    val out = Selection.trendByGroup(line.toDF("g", "x", "y"), "g", col("x"), col("y"))
      .orderBy("g").collect()
    assert(out(0) == Row(1L, 5L, 2.0, 3.0, 1.0))
    assert(out(1).isNullAt(2) && out(1).isNullAt(3) && out(1).isNullAt(4))
  }

  test("trendByGroup is partition-order independent") {
    val df = spark.range(1000).selectExpr("id % 7 AS g", "id AS x", "(id * 3 + id % 13) AS y")
    val a = Selection.trendByGroup(df, "g", col("x"), col("y")).orderBy("g").collect()
    val b = Selection.trendByGroup(df.repartition(11), "g", col("x"), col("y")).orderBy("g").collect()
    assert(a.toSeq == b.toSeq)
  }
}
