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

  test("cdfPpmByGroup: ties share the <=-count, integer ppm") {
    val df = Seq((1L, "g", 10L), (2L, "g", 10L), (3L, "g", 20L), (4L, "g", 30L))
      .toDF("doc_id", "g", "x")
    val out = Selection.cdfPpmByGroup(df, "g", col("x")).orderBy("doc_id").collect()
    // <=-counts: 10 -> 2 (both ties), 20 -> 3, 30 -> 4; n = 4
    assert(out.map(_.getLong(4)).toSeq == Seq(500000L, 500000L, 750000L, 1000000L))
  }

  test("histogram: equi-width bins with clamped top edge, degenerate group") {
    val df = (Seq.fill(3)(("a", 0.0)) ++ Seq(("a", 5.0), ("a", 10.0)) ++
      Seq(("b", 7.0), ("b", 7.0))).toDF("g", "v")
    val out = Profile.histogram(df, "g", "v", bins = 10).orderBy("g", "bin").collect()
    val a = out.filter(_.getString(0) == "a").map(r => (r.getInt(1), r.getLong(4)))
    assert(a.toSeq == Seq((0, 3), (5, 1), (9, 1))) // max lands in the last bin
    val b = out.filter(_.getString(0) == "b")
    assert(b.length == 1 && b(0).getInt(1) == 0 && b(0).getLong(4) == 2L)
  }

  test("charClasses: hand-counted class profile") {
    val out = TextAnalysis.charClasses(
      Seq((1L, "Ab1 c,d!")).toDF("doc_id", "text")).head()
    // "Ab1 c,d!": 8 chars, 4 letters, 1 digit, 1 space, 2 punct (, !)
    assert(out.getLong(1) == 8L && out.getLong(2) == 4L && out.getLong(3) == 1L)
    assert(out.getLong(4) == 1L && out.getLong(5) == 2L)
    assert(out.getDouble(6) == 0.5 && out.getDouble(7) == 0.125)
  }

  test("benford: exact integer report on a hand distribution") {
    // 6x first-digit-1, 3x digit-2, 1x digit-9; zero/negative dropped
    val vals = Seq(1L, 10L, 123L, 15L, 1999L, 100L, 2L, 25L, 299L, 900L, 0L, -5L)
    val out = Profile.benford(vals.toDF("v"), "v").orderBy("digit").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 6L), (2L, 3L), (9L, 1L)))
    assert(out.forall(_.getLong(2) == 10L))
    assert(out(0).getLong(3) == 600000000L) // 6/10 in ppb
    assert(out(0).getLong(4) == 301029996L) // round(log10(2)*1e9)
    assert(out(0).getLong(5) == 298970004L)
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
