package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

/** `Temporal.asOfJoin` semantics against a hand-computed fixture:
  * backward match, tie-at-equal-ts inclusion, right-side tiebreak by
  * orderCol, per-key isolation, and null fill when nothing precedes. */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  // (id, user, ts, value)
  private def left = Seq(
    (1L, 10L, 100L, 1.0), // before any click for user 10 -> null
    (2L, 10L, 200L, 2.0), // equal ts to a click -> match at 200
    (3L, 10L, 450L, 3.0), // between clicks 400 and 500 -> 400
    (4L, 20L, 999L, 4.0), // user 20 has no clicks -> null
    (5L, 30L, 300L, 5.0)  // duplicate right (30,250): larger order id wins
  ).toDF("event_id", "user_id", "tus", "value")

  private def right = Seq(
    (101L, 10L, 200L, 20.0),
    (102L, 10L, 400L, 40.0),
    (103L, 10L, 500L, 50.0),
    (104L, 30L, 250L, 25.0),
    (105L, 30L, 250L, 26.0) // same (key, ts): event_id 105 must win
  ).toDF("event_id", "user_id", "tus", "value")

  test("asOfJoin matches most recent at-or-before per key") {
    val out = Temporal.asOfJoin(left, right,
        keyCol = "user_id", tsCol = "tus", payloadCol = "value",
        orderCol = "event_id",
        leftCols = Seq("event_id", "user_id", "tus", "value"))
      .orderBy("event_id").collect()
    val expected = Seq(
      Row(1L, 10L, 100L, 1.0, null, null),
      Row(2L, 10L, 200L, 2.0, 200L, 20.0),
      Row(3L, 10L, 450L, 3.0, 400L, 40.0),
      Row(4L, 20L, 999L, 4.0, null, null),
      Row(5L, 30L, 300L, 5.0, 250L, 26.0))
    assert(out.toSeq == expected)
  }

  test("asOfJoin keeps every left row exactly once") {
    val out = Temporal.asOfJoin(left, right, "user_id", "tus", "value",
      "event_id", Seq("event_id", "user_id", "tus", "value"))
    assert(out.count() == left.count())
    assert(out.select("event_id").distinct().count() == left.count())
  }

  test("intervalJoin matches brute-force range join") {
    // 200 points x 300 refs over 3 keys, window 50: brute force is the
    // spec, the binned equi-join must reproduce it exactly (incl. both
    // inclusive endpoints and bin-boundary timestamps).
    val pts = spark.range(200).selectExpr("id AS event_id", "id % 3 AS user_id",
      "(id * 37) % 1000 AS tus", "CAST(id AS DOUBLE) AS value")
    val refs = spark.range(300).selectExpr("id + 1000 AS event_id", "id % 3 AS user_id",
      "(id * 53) % 1000 AS tus", "CAST(id AS DOUBLE) / 2 AS value")
    val got = Temporal.intervalJoin(pts, refs, "user_id", "tus", 50L, "value",
        Seq("event_id", "user_id", "tus"))
      .orderBy("event_id", "r_ts", "r_value").collect().toSeq
    val exp = pts.as("p").join(refs.as("r"),
        $"p.user_id" === $"r.user_id" &&
          $"r.tus" >= $"p.tus" - 50L && $"r.tus" <= $"p.tus")
      .select($"p.event_id", $"p.user_id", $"p.tus",
        $"r.tus".as("r_ts"), $"r.value".as("r_value"))
      .orderBy("event_id", "r_ts", "r_value").collect().toSeq
    assert(exp.nonEmpty && got == exp)
  }

  test("intervalJoin plan is an equi-join, not a nested loop") {
    val pts = spark.range(10).selectExpr("id AS event_id", "id % 3 AS user_id",
      "id * 7 AS tus", "CAST(id AS DOUBLE) AS value")
    val phys = Temporal.intervalJoin(pts, pts, "user_id", "tus", 50L, "value",
      Seq("event_id", "user_id", "tus")).queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct"))
    assert(!phys.contains("BroadcastNestedLoopJoin"))
  }

  test("asOfJoin plan has no range or cross join") {
    val out = Temporal.asOfJoin(left, right, "user_id", "tus", "value",
      "event_id", Seq("event_id", "user_id", "tus", "value"))
    val phys = out.queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct"))
    assert(!phys.contains("BroadcastNestedLoopJoin"))
  }

  test("decayedHistory folds bounded half-life lags exactly") {
    val ev = Seq(
      (1L, 1L, 1L, 4.0), (2L, 1L, 2L, 2.0), (3L, 1L, 3L, 8.0), (4L, 1L, 4L, 1.0),
      (5L, 2L, 1L, 7.0) // single-event key: no history
    ).toDF("event_id", "user_id", "tus", "value")
    val out = Temporal.decayedHistory(ev, k = 3).orderBy("event_id").collect()
    val expected = Seq(
      Row(1L, 1L, 1L, 4.0, 0L, 0.0, null, 0L),
      Row(2L, 1L, 2L, 2.0, 1L, 4.0, 4.0, 0L),
      // decayed = 2 + 4/2 = 4; v*wsum = 8*1.5 = 12 > 2*4 -> spike
      Row(3L, 1L, 3L, 8.0, 2L, 4.0, 4.0 / 1.5, 1L),
      // decayed = 8 + 2/2 + 4/4 = 10
      Row(4L, 1L, 4L, 1.0, 3L, 10.0, 10.0 / 1.75, 0L),
      Row(5L, 2L, 1L, 7.0, 0L, 0.0, null, 0L))
    assert(out.toSeq == expected)
  }

  test("resampleFill: fixed grid per key, forward-fill, leading nulls") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      // user 1: events at t=25 (v=1) and t=47 (v=2); grid interval 10
      (1L, 1L, 25L, 1.0), (2L, 1L, 47L, 2.0),
      // user 2: single event exactly on a tick
      (3L, 2L, 30L, 9.0)
    ).toDF("event_id", "user_id", "tus", "value")
    val out = Temporal.resampleFill(ev, interval = 10L)
      .orderBy("user_id", "grid_ts").collect()
    val expected = Seq(
      Row(1L, 20L, null, null),          // tick before first event
      Row(1L, 30L, 25L, 1.0),            // ffill from t=25
      Row(1L, 40L, 25L, 1.0),
      Row(2L, 30L, 30L, 9.0))            // tick == event ts: inclusive
    assert(out.toSeq == expected)
  }

  test("funnel: ordered reach times, nulls past a missed step") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      // user 1: click@5 precedes the first view -> ignored; purchase@15
      // precedes click-reach (20) -> ignored; full funnel 10/20/30
      (1L, 1L, 5L, "click"), (2L, 1L, 10L, "view"), (3L, 1L, 20L, "click"),
      (4L, 1L, 15L, "purchase"), (5L, 1L, 30L, "purchase"),
      // user 2: view only
      (6L, 2L, 10L, "view"),
      // user 3: no view -> every stage null even though later steps exist
      (7L, 3L, 5L, "click"), (8L, 3L, 6L, "purchase")
    ).toDF("event_id", "user_id", "tus", "event_type")
    val out = Temporal.funnel(ev, Seq("view", "click", "purchase"))
      .orderBy("user_id").collect()
    val expected = Seq(
      Row(1L, 10L, 20L, 30L),
      Row(2L, 10L, null, null),
      Row(3L, null, null, null))
    assert(out.toSeq == expected)
  }

  test("decayedHistory k beyond available history matches truncated k") {
    val ev = Seq(
      (1L, 1L, 1L, 4.0), (2L, 1L, 2L, 2.0), (3L, 1L, 3L, 8.0)
    ).toDF("event_id", "user_id", "tus", "value")
    val k3 = Temporal.decayedHistory(ev, k = 3).orderBy("event_id").collect().toSeq
    val k8 = Temporal.decayedHistory(ev, k = 8).orderBy("event_id").collect().toSeq
    assert(k3 == k8)
  }
}
