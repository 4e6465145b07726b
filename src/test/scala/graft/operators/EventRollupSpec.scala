package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Hand-computed fixtures for the event-rollup family: OHLC bars, TWAP,
  * exact rolling median, and the session-gap transition matrix. */
class EventRollupSpec extends SparkSpec {
  import spark.implicits._

  test("ohlcBars: open/close by (ts, id), high/low/count/sum per bar") {
    val e = Seq(
      // series "a", bar 0 (interval 100): ts ties broken by id
      (1L, "a", 10L, 5.0),
      (2L, "a", 10L, 7.0),  // same ts as id 1: open stays id 1's value
      (3L, "a", 90L, 2.0),  // close of bar 0
      // series "a", bar 1
      (4L, "a", 150L, 9.0),
      // series "b", bar 0
      (5L, "b", 40L, 4.0)
    ).toDF("event_id", "event_type", "tus", "value")
    val out = Temporal.ohlcBars(e, interval = 100L)
      .orderBy("event_type", "bar_ts").collect()
    assert(out.toSeq == Seq(
      Row("a", 0L, 5.0, 7.0, 2.0, 2.0, 3L, 14.0),
      Row("a", 100L, 9.0, 9.0, 9.0, 9.0, 1L, 9.0),
      Row("b", 0L, 4.0, 4.0, 4.0, 4.0, 1L, 4.0)))
  }

  test("twap: duration-weighted, last event weightless, null on zero span") {
    val e = Seq(
      (1L, 10L, 0L, 1.0),
      (2L, 10L, 10L, 3.0),
      (3L, 10L, 30L, 2.0),  // no duration (last)
      (4L, 20L, 99L, 8.0)   // single event: span 0 -> null twap
    ).toDF("event_id", "user_id", "tus", "value")
    val out = Temporal.twap(e).orderBy("user_id").collect()
    // user 10: (1.0*10 + 3.0*20) / 30 = 7/3
    assert(out(0) == Row(10L, 3L, 30L, 7.0 / 3.0))
    assert(out(1) == Row(20L, 1L, 0L, null))
  }

  test("rollingMedian: exact over the trailing k-frame") {
    val e = (1 to 5).map(i => (i.toLong, 1L, i * 10L, i.toDouble))
      .toDF("event_id", "user_id", "tus", "value")
    val out = Temporal.rollingMedian(e, k = 3).orderBy("event_id").collect()
    val med = out.map(r => (r.getLong(0), r.getLong(4), r.getDouble(5)))
    assert(med.toSeq == Seq((1L, 1L, 1.0), (2L, 2L, 1.5),
      (3L, 3L, 2.0), (4L, 3L, 3.0), (5L, 3L, 4.0)))
  }

  test("stateAt: latest value at-or-before the cut, (ts, id) tie-break") {
    val e = Seq(
      (1L, 1L, 10L, 1.0), (2L, 1L, 50L, 2.0), (3L, 1L, 50L, 3.0), // tie at 50: id 3 wins
      (4L, 1L, 90L, 4.0),                                          // after cut 60: excluded
      (5L, 2L, 70L, 5.0)                                           // user 2 starts after cut
    ).toDF("event_id", "user_id", "tus", "value")
    val out = Temporal.stateAt(e, t = 60L).orderBy("user_id").collect()
    assert(out.toSeq == Seq(Row(1L, 3L, 50L, 3.0)))
  }

  test("linearAttribution: equal micro-credit split, no-touch conversions absent") {
    val conv = Seq((100L, 1L, 1000L), (101L, 2L, 1000L)).toDF("event_id", "user_id", "tus")
    val touch = Seq(
      (1L, 1L, 900L), (2L, 1L, 950L), (3L, 1L, 1000L), // 3 touches for conv 100
      (4L, 1L, 400L),                                  // outside window 500
      (5L, 2L, 2000L)                                  // after conversion: excluded
    ).toDF("event_id", "user_id", "tus")
    val out = Temporal.linearAttribution(conv, touch, "user_id", "tus", window = 500L)
      .orderBy("touch_id").collect()
    assert(out.length == 3)
    assert(out.forall(r => r.getLong(0) == 100L && r.getLong(5) == 3L &&
      r.getLong(6) == 333333L))
  }

  test("topPaths: sessions split on gap, paths truncated and counted") {
    val e = Seq(
      (1L, 1L, 0L, "A"), (2L, 1L, 10L, "B"),           // session 1: A>B
      (3L, 1L, 5000L, "A"), (4L, 1L, 5010L, "B"),      // session 2 (gap): A>B
      (5L, 2L, 0L, "C")                                // session: C
    ).toDF("event_id", "user_id", "tus", "event_type")
    val out = Temporal.topPaths(e, gap = 100L, maxLen = 5, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("A>B", 2L), ("C", 1L)))
  }

  test("interArrival: periodic key hits B = -1, moments exact") {
    val e = Seq(
      (1L, 1L, 0L), (2L, 1L, 10L), (3L, 1L, 20L), (4L, 1L, 30L), // gaps 10,10,10
      (5L, 2L, 0L), (6L, 2L, 1L), (7L, 2L, 100L),                // gaps 1, 99
      (8L, 3L, 42L)                                              // no gaps -> absent
    ).toDF("event_id", "user_id", "tus")
    val out = Temporal.interArrival(e).orderBy("user_id").collect()
    assert(out.length == 2)
    assert(out(0) == Row(1L, 3L, 10.0, 0.0, -1.0))
    // gaps 1,99: mean 50, var = (2·9802 − 10000)/4 = 2401, sd = 49 exactly
    assert(out(1) == Row(2L, 2L, 50.0, 49.0, (49.0 - 50.0) / 99.0))
  }

  test("rollingActive: DAU/WAU over observed periods only") {
    // period 10, window 3; users 1,2 on day 0; user 1 on day 2; user 3 on day 5
    val e = Seq(
      (1L, 1L, 5L), (2L, 2L, 7L),   // day 0
      (3L, 1L, 25L),                // day 2
      (4L, 3L, 55L)                 // day 5
    ).toDF("event_id", "user_id", "tus")
    val out = Temporal.rollingActive(e, period = 10L, windowPeriods = 3)
      .orderBy("report_period").collect()
    // observed days: 0, 2, 5. day0: now {1,2} win {1,2}; day2: now {1},
    // win {1,2} (day0 within 3-window) ∪ {1} = {1,2}; day5: now {3}, win {3}
    assert(out.toSeq == Seq(
      Row(0L, 2L, 2L, 1.0),
      Row(2L, 1L, 2L, 0.5),
      Row(5L, 1L, 1L, 1.0)))
  }

  test("fuzzyPairs: blocked Levenshtein with prefix cap") {
    val docs = Seq(
      (1L, "kitten xyz", 1),
      (2L, "sitting xyz", 1),   // lev(kitten, sitting)=3 on 6-char prefix: lev("kitten","sittin")=2
      (3L, "kitten xyz", 2)     // different block: never paired
    ).toDF("doc_id", "text", "blk")
    val out = Dedup.fuzzyPairs(docs, Seq("blk"), maxDist = 2, prefixLen = 6)
      .orderBy("d1", "d2").collect()
    assert(out.toSeq == Seq(Row(1L, 2L, 2L)))
    // full-length distance exceeds the threshold
    val strict = Dedup.fuzzyPairs(docs, Seq("blk"), maxDist = 2, prefixLen = 64)
    assert(strict.count() == 0)
  }

  test("transitionMatrix: counts within gap, row-normalized") {
    val e = Seq(
      (1L, 1L, 0L, "A"),
      (2L, 1L, 10L, "B"),    // A->B (gap 10)
      (3L, 1L, 1000L, "C"),  // B->C exceeds gap 100: dropped
      (4L, 1L, 1050L, "A"),  // C->A (gap 50)
      (5L, 2L, 0L, "A"),
      (6L, 2L, 20L, "C")     // A->C (gap 20)
    ).toDF("event_id", "user_id", "tus", "event_type")
    val out = Temporal.transitionMatrix(e, gap = 100L)
      .orderBy("from_type", "to_type").collect()
    assert(out.toSeq == Seq(
      Row("A", "B", 1L, 2L, 0.5),
      Row("A", "C", 1L, 2L, 0.5),
      Row("C", "A", 1L, 1L, 1.0)))
  }
}
