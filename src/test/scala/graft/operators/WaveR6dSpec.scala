package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 session-4 wave: Hilbert layout, prefix-filtered set-similarity
  * join, dyadic EWMA, SCD2 intervals, 2-D skyline. Each operator is
  * checked against an independent brute-force or closed-form model. */
class WaveR6dSpec extends SparkSpec {

  // ------------------------------------------------------------- hilbert

  /** Reference xy2d (public-domain routine; same as Layout scaladoc). */
  private def xy2dRef(n: Int, x0: Int, y0: Int): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s.toLong * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  test("hilbertValue is the reference curve: bijective with unit-step adjacency") {
    val cells = spark.range(64).selectExpr("id % 8 as x", "id div 8 as y")
    val got = cells
      .select(col("x"), col("y"), Layout.hilbertValue("x", "y", 3).as("d"))
      .collect()
      .map(r => ((r.getLong(0).toInt, r.getLong(1).toInt), r.getLong(2)))
      .toMap
    // matches the reference routine everywhere
    for (((x, y), d) <- got) assert(d === xy2dRef(8, x, y), s"($x,$y)")
    // bijection 0..63
    assert(got.values.toSet === (0L until 64L).toSet)
    // consecutive indices are 4-neighbours — the Hilbert locality property
    val pos = got.map(_.swap)
    for (i <- 0L until 63L) {
      val (x1, y1) = pos(i); val (x2, y2) = pos(i + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1, s"step $i")
    }
  }

  // -------------------------------------------- prefix-filtered set-sim

  test("prefixFilteredJaccard finds EXACTLY the brute-force pairs (no false negatives)") {
    import spark.implicits._
    // small corpus with planted near-dups, chains, and disjoint docs
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g x"), // near-dup of 1
      (3L, "a b c d e f y x"), // near-dup of 2, weaker of 1
      (4L, "p q r s t u v w"), // disjoint
      (5L, "p q r s t u v w"), // exact dup of 4
      (6L, "m n o a b z z2 z3"),
      (7L, "c a t s and dogs run fast")
    ).toDF("doc_id", "text")
    val got = Dedup.prefixFilteredJaccard(docs, tNum = 2, tDen = 5)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    // brute force over bigram shingle sets
    def grams(t: String): Set[String] =
      t.split(" ").sliding(2).map(_.mkString(" ")).toSet
    val m = Seq(1L -> "a b c d e f g h", 2L -> "a b c d e f g x",
      3L -> "a b c d e f y x", 4L -> "p q r s t u v w",
      5L -> "p q r s t u v w", 6L -> "m n o a b z z2 z3",
      7L -> "c a t s and dogs run fast").toMap
    val want = (for {
      i <- m.keys; j <- m.keys if i < j
      gi = grams(m(i)); gj = grams(m(j))
      inter = (gi & gj).size
      if 5 * inter >= 2 * (gi.size + gj.size - inter)
    } yield (i, j)).toSet
    assert(want.nonEmpty && want.contains((4L, 5L)))
    assert(got === want)
  }

  // ------------------------------------------------------------ dyadic EWMA

  test("ewmaDyadic equals the recursive EWMA exactly (dyadic closed form)") {
    import spark.implicits._
    val events = Seq(
      (1L, 10L, 1.5), (1L, 20L, 2.5), (1L, 30L, 4.0), (1L, 40L, 0.25),
      (2L, 10L, 100.0)
    ).toDF("user_id", "ts", "value").withColumn("event_id", col("ts"))
    val got = Temporal.ewmaDyadic(events, window = 32)
      .select("user_id", "event_id", "ewma")
      .as[(Long, Long, Double)].collect()
      .map { case (u, e, v) => (u, e) -> v }.toMap
    // recursive S_1 = v_1; S_t = (S_{t-1} + v_t) / 2 — exact in doubles
    // for these dyadic inputs
    assert(got((1L, 10L)) === 1.5)
    assert(got((1L, 20L)) === (1.5 + 2.5) / 2)
    assert(got((1L, 30L)) === ((1.5 + 2.5) / 2 + 4.0) / 2)
    assert(got((1L, 40L)) === (((1.5 + 2.5) / 2 + 4.0) / 2 + 0.25) / 2)
    assert(got((2L, 10L)) === 100.0)
  }

  test("ewmaDyadic truncation: window w keeps the last w observations only") {
    import spark.implicits._
    val events = (1 to 6).map(i => (1L, i.toLong, i.toDouble))
      .toDF("user_id", "ts", "value").withColumn("event_id", col("ts"))
    val got = Temporal.ewmaDyadic(events, window = 3)
      .select("event_id", "n_window", "ewma")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(6L)._1 === 3L)
    // truncated: v4/4 + v5/4 + v6/2 (oldest two share residual weight)
    assert(got(6L)._2 === 4.0 / 4 + 5.0 / 4 + 6.0 / 2)
  }

  test("ewmaDyadic rejects values outside the dyadic integer budget at runtime") {
    import spark.implicits._
    // window 32 ⇒ |v_micro| must stay below 2^31; 5000 units = 5e9 micro
    // exceeds it and must raise instead of silently overflowing the BIGINT
    val events = Seq((1L, 10L, 5.0e3)).toDF("user_id", "ts", "value")
      .withColumn("event_id", col("ts"))
    val ex = intercept[Exception] {
      Temporal.ewmaDyadic(events, window = 32).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("dyadic")), s"unexpected error: $ex")
    // in-budget values still work at the same window
    val ok = Temporal.ewmaDyadic(
      Seq((1L, 10L, 100.0)).toDF("user_id", "ts", "value")
        .withColumn("event_id", col("ts")), window = 32).collect()
    assert(ok.length === 1)
  }

  // ------------------------------------------------------------------ SCD2

  test("scd2Intervals: runs collapse, intervals tile the timeline, counts add up") {
    import spark.implicits._
    val events = Seq(
      (1L, 100L, 1L, "view"), (1L, 200L, 2L, "view"), (1L, 300L, 3L, "cart"),
      (1L, 400L, 4L, "view"), (2L, 100L, 5L, "buy")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Temporal.scd2Intervals(events).orderBy("user_id", "version").collect()
    val u1 = got.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getString(2)).toSeq === Seq("view", "cart", "view"))
    assert(u1.map(_.getLong(5)).sum === 4L) // n_events
    // valid_to of run k == valid_from of run k+1; last open-ended + current
    assert(u1(0).getLong(4) === u1(1).getLong(3))
    assert(u1(1).getLong(4) === u1(2).getLong(3))
    assert(u1(2).isNullAt(4) && u1(2).getInt(6) === 1)
    assert(u1.take(2).forall(_.getInt(6) === 0))
  }

  // --------------------------------------------------------- phrase search

  test("phraseSearch counts overlapping occurrences and 1-based first position") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a c"),   // "a b a" at tokens 1 and 3 (overlapping)
      (2L, "x a b a y"),     // at token 2
      (3L, "a b c a b"),     // no "a b a"
      (4L, "b a a b")        // none
    ).toDF("doc_id", "text")
    val got = Retrieval.phraseSearch(docs, "a b a")
      .select("doc_id", "first_pos", "n_matches")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 1L, 2L), (2L, 2L, 1L)))
  }

  // -------------------------------------------------------- bitmap overlap

  test("segmentOverlap: exact sizes/intersections incl. empty pairs, matches brute force") {
    import spark.implicits._
    // ids straddle word boundaries (31/32/63/64) on purpose
    val ev = Seq(
      ("a", 1L), ("a", 31L), ("a", 32L), ("a", 64L), ("a", 64L),
      ("b", 31L), ("b", 33L), ("b", 64L),
      ("c", 1000L) // disjoint from a and b
    ).toDF("event_type", "user_id")
    val got = Bitmap.segmentOverlap(ev)
      .select("seg_a", "seg_b", "n_a", "n_b", "n_inter")
      .as[(String, String, Long, Long, Long)].collect().toSet
    val sets = Map("a" -> Set(1L, 31L, 32L, 64L), "b" -> Set(31L, 33L, 64L), "c" -> Set(1000L))
    val want = (for {
      x <- sets.keys; y <- sets.keys if x < y
    } yield (x, y, sets(x).size.toLong, sets(y).size.toLong,
      (sets(x) & sets(y)).size.toLong)).toSet
    assert(got === want)
    assert(got.exists { case (a, b, _, _, ni) => a == "a" && b == "c" && ni == 0L })
  }

  test("segmentOverlap: negative user ids pack injectively (floor-div + masked bit)") {
    import spark.implicits._
    // With truncating div/% the pairs (-5, 27) and (-37, -6) collide onto one
    // (word, bit) slot; arithmetic shiftright + &31 keeps them distinct.
    val ev = Seq(
      ("a", -5L), ("a", 27L), ("a", -37L),
      ("b", -5L), ("b", -6L), ("b", 27L)
    ).toDF("event_type", "user_id")
    val got = Bitmap.segmentOverlap(ev)
      .select("seg_a", "seg_b", "n_a", "n_b", "n_inter")
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(got === Set(("a", "b", 3L, 3L, 2L)))
  }

  // --------------------------------------------------------- interval merge

  test("mergeIntervals: overlap + touch merge, gaps split, coverage exact") {
    import spark.implicits._
    val iv = Seq(
      // user 1: [0,10) [5,12) touch [12,20) gap [30,35)
      (1L, 1L, 0L, 10L), (1L, 2L, 5L, 12L), (1L, 3L, 12L, 20L), (1L, 4L, 30L, 35L),
      // user 2: contained interval
      (2L, 5L, 0L, 100L), (2L, 6L, 10L, 20L)
    ).toDF("user_id", "event_id", "s", "e")
    val got = Temporal.mergeIntervals(iv)
      .select("user_id", "island", "start", "end", "n_merged")
      .as[(Long, Long, Long, Long, Long)].collect().sorted
    assert(got.toSeq === Seq(
      (1L, 1L, 0L, 20L, 3L), (1L, 2L, 30L, 35L, 1L),
      (2L, 1L, 0L, 100L, 2L)))
  }

  // -------------------------------------------------------------- HLL cube

  test("hllCube: merged coarse levels equal directly-built sketches; exact counts right") {
    import spark.implicits._
    val ev = (0 until 600).map { i =>
      (s"t${i % 3}", (i % 5).toLong, (i * 7919 % 211).toLong)
    }.toDF("event_type", "day", "user_id")
    val cube = Sketch.hllCube(ev, col("user_id"), "event_type", "day").collect()
    assert(cube.count(_.getInt(0) == 0) === 15) // 3 types × 5 days
    assert(cube.count(_.getInt(0) == 3) === 1)
    // grand total: exact must be the true distinct count
    val total = cube.find(_.getInt(0) == 3).get
    assert(total.getLong(3) === (0 until 600).map(i => i * 7919 % 211).distinct.size.toLong)
    // level (a): merged registers == sketch built directly at that grain
    val direct = Sketch.hllDistinct(ev, col("user_id"), Seq("event_type"))
      .select("event_type", "hll_est").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    for (r <- cube.filter(_.getInt(0) == 1))
      assert(r.getDouble(6) === direct(r.getString(1)), r.getString(1))
  }

  // ----------------------------------------------------------- abandonment

  test("abandonment: window-boundary semantics match brute force") {
    import spark.implicits._
    val H = 3600000000L
    val ev = Seq(
      (1L, 1L, "view", 1000L), (1L, 2L, "purchase", 1000L),      // same instant: NOT after
      (1L, 3L, "view", 2000L), (1L, 4L, "purchase", 2000L + H),  // exactly at window edge: counts
      (2L, 5L, "view", 0L), (2L, 6L, "purchase", H + 1L),        // just outside: abandoned
      (3L, 7L, "view", 0L)                                        // no purchase at all
    ).toDF("user_id", "event_id", "event_type", "tus")
    val got = Temporal.abandonment(ev, "view", "purchase", H)
      .select("event_id", "abandoned").as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 1, 3L -> 0, 5L -> 1, 7L -> 1))
  }

  // ------------------------------------------------------------------- IVM

  test("incrementalAggregate: delta-merged view equals recompute across change shapes") {
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    def mk(rows: Seq[(Long, String, String)]) =
      rows.toDF("k", "g", "v0").withColumn("v", col("v0").cast(DecimalType(18, 2))).drop("v0")
    val old = mk(Seq(
      (1L, "a", "10.00"), (2L, "a", "20.00"), (3L, "b", "5.00"), (4L, "c", "7.00")))
    val nw = mk(Seq(
      (1L, "a", "10.00"),  // unchanged
      (2L, "b", "20.00"),  // MOVED groups a -> b
      (3L, "b", "6.50"),   // value changed
      (5L, "d", "1.00")))  // added; key 4 removed -> group c VANISHES
    val r = Snapshot.incrementalAggregate(old, nw, "k", "g", "v")
      .select("g", "inc_sum", "inc_n", "direct_sum", "direct_n", "match_inc")
      .collect().map(x => x.getString(0) ->
        (x.getDecimal(1), x.getLong(2), x.getDecimal(3), x.getLong(4), x.getInt(5))).toMap
    assert(r.keySet === Set("a", "b", "d")) // c tombstoned, matching recompute
    assert(r.values.forall(_._5 == 1), s"mismatch rows: $r")
    assert(r("a")._2 === 1L && r("b")._2 === 2L && r("d")._2 === 1L)
    assert(r("b")._1 === new java.math.BigDecimal("26.50"))
  }

  // ------------------------------------------------------ dominant supplier

  test("dominant supplier arg-max breaks quantity ties toward the smallest suppkey") {
    import spark.implicits._
    val li = Seq(
      (1L, 10L, 5.0), (1L, 3L, 5.0), (1L, 7L, 1.0), (1L, 8L, 1.0), (1L, 9L, 1.0)
    ).toDF("l_partkey", "l_suppkey", "l_quantity")
    val sq = li.groupBy("l_partkey", "l_suppkey")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sq"))
    val top = sq.groupBy("l_partkey")
      .agg(max(struct(col("sq"), (-col("l_suppkey")).as("_ns"))).as("_top"))
      .select((-col("_top._ns")).as("suppkey")).as[Long].head()
    assert(top === 3L) // 3 and 10 tie at qty 5 -> smallest key wins
  }

  // ------------------------------------------------------------------ FIFO

  test("fifoMatch reproduces hand-computed first-in-first-out allocation") {
    import spark.implicits._
    // receipts: 10 then 5; issues: 7, 6, 4 (last issue partially unmatched)
    val rc = Seq((1L, 101L, 1L, 10L), (1L, 102L, 2L, 5L))
      .toDF("key", "id", "ord", "qty")
    val is = Seq((1L, 201L, 1L, 7L), (1L, 202L, 2L, 6L), (1L, 203L, 3L, 4L))
      .toDF("key", "id", "ord", "qty")
    val got = Temporal.fifoMatch(rc, is)
      .select("rcpt_id", "issue_id", "matched_qty")
      .as[(Long, Long, Long)].collect().toSet
    // FIFO: issue 7 <- rcpt1(7); issue 6 <- rcpt1(3) + rcpt2(3);
    // issue 4 <- rcpt2(2), 2 units unmatched
    assert(got === Set((101L, 201L, 7L), (101L, 202L, 3L),
      (102L, 202L, 3L), (102L, 203L, 2L)))
    // conservation: matched totals never exceed either side
    assert(got.toSeq.map(_._3).sum === 15L)
  }

  // ---------------------------------------------------------- weighted hops

  test("weightedHops: a cheap 2-hop path beats a pricey direct edge (what BFS cannot see)") {
    import spark.implicits._
    val edges = Seq(
      (1L, 2L, 10L),  // direct but expensive
      (1L, 3L, 1L), (3L, 2L, 1L), // cheap detour: cost 2
      (2L, 4L, 5L)
    ).toDF("d1", "d2", "w")
    val seeds = Seq(1L).toDF("id")
    val got = Graph.weightedHops(edges, seeds, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 2L, 3L -> 1L, 4L -> 7L))
    // unit weights reduce to BFS hop counts
    val unit = Graph.weightedHops(edges.withColumn("w", lit(1L)), seeds, rounds = 3)
      .as[(Long, Long)].collect().toMap
    val bfs = Graph.bfsHops(edges.select("d1", "d2"), seeds, maxDepth = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(unit === bfs)
  }

  // -------------------------------------------------------------------- SRM

  test("srmCheck: assignment is hash-stable and chi-square matches hand computation") {
    import spark.implicits._
    val ev = (1 to 40).map(u => (0L, u.toLong)) ++ (1 to 40).map(u => (1L, u.toLong))
    val got = Selection.srmCheck(ev.toDF("day", "user_id")).collect()
    assert(got.length === 2)
    // same users both days -> identical split both days (stability)
    assert(got(0).getLong(2) === got(1).getLong(2))
    val (n, na) = (got(0).getLong(1), got(0).getLong(2))
    val nb = n - na
    assert(got(0).getDouble(4) === ((na - nb) * (na - nb)).toDouble / n)
  }

  // ------------------------------------------------------------ mahalanobis

  test("mahalanobis score: zero at the mean, quadratic along an axis, nonnegative on data") {
    import spark.implicits._
    import graft.queries.TrainedMahalanobis.{mu, prec}
    val probes = Seq(
      (1L, mu.map(_.toFloat).toArray),                                   // the mean: score 0
      (2L, mu.zipWithIndex.map { case (m, i) =>
        (if (i == 0) m + 0.1 else m).toFloat }.toArray))                 // mean + 0.1*e0
    val got = Similarity.mahalanobisTopK(probes.toDF("vec_id", "embedding"),
        mu, prec, topK = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) === 0.0)
    // P_00 * 0.01 up to the float32 round of the probe itself
    assert(math.abs(got(2L) - prec.head.head * 0.01) < 1e-4, got(2L).toString)
    // positive semidefiniteness on real data
    val real = Similarity.mahalanobisTopK(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"),
      mu, prec, topK = 500)
    assert(real.collect().forall(_.getDouble(1) >= 0.0))
  }

  // --------------------------------------------------------------- skyline

  test("paretoFrontier2d equals brute-force dominance on deterministic pseudo-random points") {
    import spark.implicits._
    // deterministic LCG points with repeats and ties on both dims
    val pts = (0 until 500).map { i =>
      val a = (i * 1103515245L + 12345L) % 97
      val b = (i * 69069L + 1L) % 89
      (i.toLong, math.abs(a), math.abs(b))
    }
    val df = pts.toDF("id", "maxv", "minv")
    val got = Selection.paretoFrontier2d(df, "maxv", "minv", "id", bucketWidth = 16L)
      .select("maxv", "minv").as[(Long, Long)].collect().toSet
    val distinct = pts.map(p => (p._2, p._3)).toSet
    val want = distinct.filter { case (p, dt) =>
      !distinct.exists { case (p2, dt2) =>
        p2 >= p && dt2 <= dt && (p2 > p || dt2 < dt)
      }
    }
    assert(got === want)
    // counts carried: n_rows of each frontier point = multiplicity in input
    val gotN = Selection.paretoFrontier2d(df, "maxv", "minv", "id", bucketWidth = 16L)
      .select("maxv", "minv", "n_rows").as[(Long, Long, Long)].collect()
    for ((p, dt, n) <- gotN)
      assert(n === pts.count(q => q._2 == p && q._3 == dt).toLong)
  }

  test("paretoFrontier2d rejects non-positive bucketWidth") {
    import spark.implicits._
    val df = Seq((1L, 5L, 3L)).toDF("id", "maxv", "minv")
    for (bad <- Seq(0L, -16L)) {
      val ex = intercept[IllegalArgumentException] {
        Selection.paretoFrontier2d(df, "maxv", "minv", "id", bucketWidth = bad)
      }
      assert(ex.getMessage.contains("bucketWidth"))
    }
  }
}
