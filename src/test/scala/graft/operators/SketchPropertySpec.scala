package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property-level net for the sketch wave's integer primitives — the
  * ceil-division identity is exactly the class of bug SketchSpec's
  * accuracy test caught, so pin it against BigDecimal on random inputs. */
class SketchPropertySpec extends SparkSpec {
  import spark.implicits._

  test("ddsketch bucket expr equals BigDecimal ceiling on random signed micro-logs") {
    val lnG = 19803L
    val rnd = new scala.util.Random(7L)
    val lnus = (Seq(0L, 1L, -1L, lnG, -lnG, lnG - 1, lnG + 1, 2 * lnG) ++
      (1 to 500).map(_ => rnd.nextLong() % 10000000L)).distinct
    val out = lnus.toDF("lnu")
      .withColumn("bucket",
        expr(s"(lnu div $lnG) + (CASE WHEN lnu % $lnG > 0 THEN 1 ELSE 0 END)"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    lnus.foreach { a =>
      val expected = BigDecimal(a)./(BigDecimal(lnG))
        .setScale(0, BigDecimal.RoundingMode.CEILING).toLong
      assert(out(a) === expected, s"ceilDiv($a, $lnG)")
    }
  }

  test("zValue is a bijection on the 6-bit grid and orders tiles contiguously") {
    val cells = for { x <- 0 until 64; y <- 0 until 64 } yield (x, y)
    val zs = cells.toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 6).as("z"))
      .collect().map(_.getLong(0))
    assert(zs.distinct.length === 64 * 64)
    assert(zs.min === 0L && zs.max === 64L * 64 - 1)
  }

  test("hll registers are invariant under repartitioning and duplication") {
    val df = (1 to 1000).map(i => (s"k-${i % 137}", "g")).toDF("k", "g")
    val a = Sketch.hllRegisters(df, col("k"), Seq("g"))
      .collect().map(_.toSeq).toSet
    val b = Sketch.hllRegisters(df.repartition(13).union(df.repartition(3)), col("k"), Seq("g"))
      .collect().map(_.toSeq).toSet
    assert(a === b, "registers must ignore partitioning and duplicates")
  }

  test("cusum s_t is non-negative and zero on a flat series") {
    val flat = (0 until 10).map(i => ("k", i.toLong, 100.0))
      .toDF("event_type", "day", "value")
    val out = Temporal.cusum(flat).collect()
    assert(out.forall(_.getAs[Long]("s_t") >= 0L))
    // flat series: daily == ref, drift = -slack <= 0, S stays 0
    assert(out.forall(_.getAs[Long]("s_t") === 0L))
  }
}
