package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of the r6-late temporal/stats operators on seeded random
  * event tables — the property-level net under the fixture specs. */
class TemporalPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(99L)
  private def events = {
    val rows = (1L to 400L).map { i =>
      (i, i % 23, (rnd.nextInt(5000) + 1).toLong, math.floor(rnd.nextDouble() * 1e4) / 16.0)
    }
    rows.toDF("event_id", "user_id", "tus", "value")
  }

  test("resampleFill: per key, grid is exactly span/interval+1 ticks and ffill is monotone") {
    val ev = events
    val iv = 100L
    val out = Temporal.resampleFill(ev, interval = iv)
    val perKey = out.groupBy("user_id")
      .agg(count(lit(1)).as("n_ticks"), min("grid_ts").as("g0"), max("grid_ts").as("g1"))
      .join(ev.groupBy("user_id").agg(min("tus").as("t0"), max("tus").as("t1")), "user_id")
      .collect()
    perKey.foreach { r =>
      val (n, g0, g1) = (r.getAs[Long]("n_ticks"), r.getAs[Long]("g0"), r.getAs[Long]("g1"))
      val (t0, t1) = (r.getAs[Long]("t0"), r.getAs[Long]("t1"))
      assert(g0 == (t0 / iv) * iv && g1 == (t1 / iv) * iv)
      assert(n == (t1 / iv) - (t0 / iv) + 1, s"grid must be dense: $r")
    }
    // the filled timestamp never exceeds the tick, and never decreases
    // along a key's grid (forward-fill is monotone)
    assert(out.filter(col("r_ts") > col("grid_ts")).count() == 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("grid_ts")
    assert(out.withColumn("_prev", lag(col("r_ts"), 1).over(w))
      .filter(col("_prev").isNotNull && col("r_ts").isNotNull && col("r_ts") < col("_prev"))
      .count() == 0)
  }

  test("winsorizedMeanByGroup: mean inside [q_lo, q_hi] and bounds are real quantile values") {
    val df = events.select(col("user_id").as("grp"), col("tus").as("x"))
    val out = Selection.winsorizedMeanByGroup(df, "grp", "x").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (lo, hi, m) = (r.getAs[Double]("q_lo"), r.getAs[Double]("q_hi"), r.getAs[Double]("wins_mean"))
      assert(lo <= hi && m >= lo && m <= hi, s"winsorized mean must sit in the clip range: $r")
    }
    // bounds are actual data values of the group (exact-rank semantics)
    val vals = df.collect().groupBy(_.getLong(0)).map { case (g, rs) => g -> rs.map(_.getLong(1).toDouble).toSet }
    out.foreach { r =>
      val g = r.getAs[Long]("grp")
      assert(vals(g).contains(r.getAs[Double]("q_lo")) && vals(g).contains(r.getAs[Double]("q_hi")))
    }
  }

  test("zscoreByGroup: group z-scores sum to ~0 and are scale-free") {
    val df = events.select(col("user_id").as("grp"), col("tus").as("x"), col("event_id"))
    val out = Selection.zscoreByGroup(df, "grp", col("x"))
    val sums = out.groupBy("grp").agg(sum("z").as("s"), count(lit(1)).as("n")).collect()
    sums.foreach { r =>
      assert(math.abs(r.getAs[Double]("s")) < 1e-3 * r.getAs[Long]("n"),
        s"z-scores must be centred: $r")
    }
    // shifting x by a constant changes nothing (location invariance)
    val shifted = Selection.zscoreByGroup(
      df.withColumn("x", col("x") + 1000000L), "grp", col("x"))
      .select("event_id", "z").collect().map(r => r.getLong(0) -> r.getAs[Any]("z")).toMap
    out.select("event_id", "z").collect().foreach { r =>
      assert(shifted(r.getLong(0)) == r.getAs[Any]("z"))
    }
  }
}
