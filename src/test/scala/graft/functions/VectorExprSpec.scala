package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native vector kernels ([[VectorExpr]]): bit-identical to the
  * higher-order-function folds they replaced (the embedding oracles
  * depend on the exact accumulation order), and the zip_with-compatible
  * null semantics. */
class VectorExprSpec extends SparkSpec {

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  private def hofNorm(a: org.apache.spark.sql.Column) =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  test("cosine + dot match the HOF folds bit-for-bit on random float vectors") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7L)
    val rows = (1 to 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1), Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
      .withColumn("native_cos", GeoFunctions.cosineSimilarity(col("a"), col("b")))
      .withColumn("hof_cos", hofDot(col("a"), col("b")) / (hofNorm(col("a")) * hofNorm(col("b"))))
      .withColumn("native_dot", GeoFunctions.dotProduct(col("a"), col("b")))
      .withColumn("hof_dot", hofDot(col("a"), col("b")))
    val bad = df.filter(
      col("native_cos") =!= col("hof_cos") || col("native_dot") =!= col("hof_dot")).count()
    assert(bad == 0, "native kernels must be bit-identical to the folds")
  }

  test("null semantics: length mismatch and null elements yield NULL") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Some(Seq[java.lang.Double](1.0, 2.0)), Some(Seq[java.lang.Double](3.0))),
      (2L, Some(Seq[java.lang.Double](1.0, null)), Some(Seq[java.lang.Double](3.0, 4.0))),
      (3L, None, Some(Seq[java.lang.Double](3.0, 4.0))),
      (4L, Some(Seq[java.lang.Double](1.0, 2.0)), Some(Seq[java.lang.Double](3.0, 4.0))))
      .toDF("id", "a", "b")
      .withColumn("c", GeoFunctions.cosineSimilarity(col("a"), col("b")))
      .withColumn("d", GeoFunctions.dotProduct(col("a"), col("b")))
    val got = df.collect().map(r => r.getLong(0) ->
      (Option(r.get(r.fieldIndex("c"))), Option(r.get(r.fieldIndex("d"))))).toMap
    assert(got(1L) == ((None, None)), "length mismatch")
    assert(got(2L) == ((None, None)), "null element")
    assert(got(3L) == ((None, None)), "null array")
    assert(got(4L)._2.contains(11.0), s"plain dot: ${got(4L)}")
  }
}
