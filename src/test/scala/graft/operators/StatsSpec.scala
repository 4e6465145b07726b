package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exactness semantics of the corpus-statistics ops: decimal-moment
  * Pearson correlation and the micro-integer Zipf fit. */
class StatsSpec extends SparkSpec {

  test("corrByGroup: linear +1, anti-linear -1, zero-variance NULL") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("up", 1L, 2L), ("up", 2L, 4L), ("up", 3L, 6L),       // y = 2x
      ("down", 1L, 6L), ("down", 2L, 4L), ("down", 3L, 2L), // y = 8-2x
      ("flat", 1L, 5L), ("flat", 2L, 5L), ("flat", 3L, 5L)) // var(y)=0
      .toDF("g", "x", "y")
    val r = Selection.corrByGroup(df, "g", col("x"), col("y"))
      .collect().map(row => row.getString(0) ->
        (if (row.isNullAt(2)) None else Some(row.getDouble(2)))).toMap
    assert(r("up").contains(1.0))
    assert(r("down").contains(-1.0))
    assert(r("flat").isEmpty, "zero variance must yield NULL, not NaN")
  }

  test("zipfFit: an exact c = K/rank corpus fits slope -1") {
    val s = spark
    import s.implicits._
    // counts 12, 6, 4, 3 at ranks 1..4: c * r = 12 for every word, i.e.
    // ln c = ln 12 - 1 * ln r exactly -> slope -1, intercept ln 12
    val text = (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")).mkString(" ")
    val r = TextAnalysis.zipfFit(Seq((1L, text)).toDF("doc_id", "text"), topV = 10)
      .collect().head
    assert(r.getLong(0) == 4L)
    assert(approx(r.getDouble(1), -1.0, 1e-3), s"slope ${r.getDouble(1)}")
    assert(approx(r.getDouble(2), math.log(12.0), 1e-3), s"intercept ${r.getDouble(2)}")
  }
}
