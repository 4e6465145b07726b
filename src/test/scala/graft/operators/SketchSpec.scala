package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Sketch family invariants, each checked against an independent plain-
  * Scala recomputation (the same oracle-replica discipline as KnnSpec's
  * brute-force equivalence). */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def md5h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("hllDistinct matches a plain-Scala HLL on the same hashes, within theory error") {
    val n = 5000
    val keys = (0 until n).map(i => s"user-$i")
    val df = keys.toDF("k").withColumn("g", lit("all"))
    val out = Sketch.hllDistinct(df, col("k"), Seq("g"), b = 8).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_exact") === n.toLong)
    // plain-Scala replica of the construction
    val m = 256
    val regs = new Array[Int](m)
    keys.foreach { k =>
      val h = md5h60(k)
      val bucket = (h % m).toInt
      val rem = h / m
      val rho = if (rem == 0) 53 else 53 - (64 - java.lang.Long.numberOfLeadingZeros(rem))
      if (rho > regs(bucket)) regs(bucket) = rho
    }
    val sInt = regs.map(mr => 1L << (53 - mr)).sum
    val vEmpty = regs.count(_ == 0)
    val rawE = Sketch.hllAlphaNum(8) / sInt.toDouble
    val expected = BigDecimal(
      if (rawE <= 2.5 * m && vEmpty > 0) m.toDouble * math.log(m.toDouble / vEmpty) else rawE)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Long]("s_int") === sInt)
    assert(r.getAs[Double]("hll_est") === expected)
    // HLL theoretical relative std error is 1.04/sqrt(m) ~ 6.5%; 4 sigma bound
    assert(math.abs(r.getAs[Double]("hll_est") - n) / n < 0.26)
  }

  test("countMinTopK never undercounts and is exact for unique-slot words") {
    val docs = Seq(
      (1L, "a a a b b c d e f g"),
      (2L, "a b c c h i j k"),
      (3L, "a d d l m n o p q r")).toDF("doc_id", "text")
    val out = Sketch.countMinTopK(docs, k = 10).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_est") >= r.getAs[Long]("n_exact"),
        s"CMS undercounted ${r.getAs[String]("word")}")
      assert(r.getAs[Long]("overcount") >= 0L)
    }
    // 'a' is the most frequent word (5) and the grid is near-empty at this
    // scale: its estimate must be exact unless another word collides on
    // ALL d rows, which the 4x1024 grid makes practically impossible here
    val top = out.head
    assert(top.getAs[String]("word") === "a")
    assert(top.getAs[Long]("n_exact") === 5L)
    assert(top.getAs[Long]("n_est") === 5L)
  }

  test("bloomContamination has zero false negatives; verbatim benchmark doc fully flagged") {
    val corpus = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8"), // shares nothing
      (2L, "b1 b2 b3 b4 b5 b6 b7"), // verbatim benchmark doc
      (3L, "x b1 b2 b3 b4 b5 b6 tail")) // contains benchmark 6-grams
      .toDF("doc_id", "text")
    val benchmark = Seq((99L, "b1 b2 b3 b4 b5 b6 b7")).toDF("doc_id", "text")
    val out = Sketch.bloomContamination(corpus, benchmark, n = 6)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    out.values.foreach { r =>
      assert(r.getAs[Long]("n_bloom_hits") >= r.getAs[Long]("n_true_hits"),
        "bloom dropped a true member (false negative)")
      assert(r.getAs[Long]("n_false_pos") >= 0L)
    }
    // doc 2 is the benchmark doc verbatim: every one of its grams is a true hit
    assert(out(2L).getAs[Long]("n_true_hits") === out(2L).getAs[Long]("n_grams"))
    assert(out(2L).getAs[Long]("n_bloom_hits") === out(2L).getAs[Long]("n_grams"))
    // doc 3's grams are [x b1..b5], [b1..b6], [b2..b6 tail]: exactly one
    // ([b1..b6]) is a benchmark gram; doc 1 has none
    assert(out(3L).getAs[Long]("n_true_hits") === 1L)
    assert(out(1L).getAs[Long]("n_true_hits") === 0L)
  }

  test("zValue interleaves bits; layoutReport prefers zorder on a square grid") {
    val z = Seq((3L, 5L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 3).as("z")).head.getLong(0)
    // x=011, y=101 -> bits x0,y0,x1,y1,x2,y2 = 1,1,1,0,0,1 -> 1+2+4+32 = 39
    assert(z === 39L)
    val cells = (for { x <- 0 until 32; y <- 0 until 32 } yield (x, y)).toDF("x", "y")
    val rep = Layout.layoutReport(cells, "x", "y", bits = 5, nFiles = 16, box = (4, 7, 8, 11))
      .collect().map(r => r.getAs[String]("layout") -> r).toMap
    val rm = rep("rowmajor"); val zo = rep("zorder")
    assert(rm.getAs[Long]("n_files") === 16L && zo.getAs[Long]("n_files") === 16L)
    // row-major files are 2-row full-width stripes (area 64 each);
    // z-order files are 8x8 tiles (area 64 each) — equal area on a perfect
    // square, but the 4x4 box intersects only ONE 8x8 tile vs 2 stripes
    assert(zo.getAs[Long]("files_touched") <= rm.getAs[Long]("files_touched"))
    assert(zo.getAs[Long]("files_touched") === 1L)
  }

  test("cusum closed form equals the sequential max(0, S + x) recurrence") {
    // one key, hand-run series: a long baseline then a sustained 6x level
    // shift — large enough that the cumulative drift clears the 4*ref
    // alarm threshold
    val vals = Seq.fill(12)(10.0) ++ Seq.fill(6)(60.0) ++ Seq(9.0, 11.0)
    val events = vals.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      .toDF("event_type", "day", "value")
    val out = Cusum.run(events)
    val daily = vals.map(v => math.round(v * 1e6))
    val tot = daily.sum; val ref = tot / daily.length
    val slack = ref / 20
    var s = 0L
    val expected = daily.map { x => s = math.max(0L, s + x - ref - slack); s }
    assert(out.map(_.getAs[Long]("s_t")).toSeq === expected)
    // the shifted plateau must alarm at least once
    assert(out.exists(_.getAs[Int]("alarm") == 1))
  }

  test("ddsketchQuantiles honours the relative-error guarantee and read-back rank") {
    // log-uniform-ish values spanning 4 decades
    val vals = (1 to 4000).map(i => math.exp(i / 400.0) / 10.0)
    val df = vals.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      .toDF("event_type", "id", "value")
    val out = Sketch.ddsketchQuantiles(df, "event_type", "value").collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n") === 4000L)
    val sorted = vals.sorted
    val alpha = 0.02 / 2.02 // (gamma-1)/(gamma+1)
    for ((q, cn) <- Seq(0.5 -> "p50_est", 0.95 -> "p95_est", 0.99 -> "p99_est")) {
      val exact = sorted(math.ceil(q * 4000).toInt - 1)
      val est = r.getAs[Double](cn)
      assert(math.abs(est - exact) <= alpha * exact * 1.001,
        s"$cn: est=$est exact=$exact exceeds ${alpha * 100}%% relative error")
    }
  }

  test("hllUnion of per-group registers equals the direct sketch over the union") {
    val rows = (1 to 800).map(i => (s"u-${i % 301}", if (i % 2 == 0) "a" else "b"))
    val df = rows.toDF("k", "g")
    val direct = Sketch.hllDistinct(df.withColumn("g", lit("all")), col("k"), Seq("g"))
      .select("v_empty", "s_int", "hll_est").head.toSeq
    val merged = Sketch.hllUnion(Sketch.hllRegisters(df, col("k"), Seq("g")))
      .select("v_empty", "s_int", "hll_est").head.toSeq
    assert(merged === direct)
  }

  test("kmvIntersect estimates a planted overlap and is exact below K") {
    // A = 0..4999, B = 3000..7999 -> |A|=|B|=5000, inter=2000, union=8000
    val rows = (0 until 5000).map(i => ("a", s"u$i")) ++
      (3000 until 8000).map(i => ("b", s"u$i"))
    val df = rows.toDF("g", "k")
    val r = Sketch.kmvIntersect(df, col("k"), "g", "a", "b", k = 256).head()
    assert(r.getAs[Long]("n_exact_a") === 5000L)
    assert(r.getAs[Long]("n_exact_inter") === 2000L)
    // KMV relative error ~ 1/sqrt(K-1) ~ 6.3%; allow 4 sigma on union,
    // and the jaccard binomial noise on the intersection
    assert(math.abs(r.getAs[Double]("union_est") - 8000) / 8000 < 0.25)
    assert(math.abs(r.getAs[Double]("inter_est") - 2000) / 2000 < 0.45)
    assert(r.getAs[Long]("j") <= r.getAs[Long]("k_eff"))

    // tiny sets: sketch holds everything -> exact mode
    val tiny = (Seq(("a", "x"), ("a", "y"), ("b", "y"), ("b", "z"))).toDF("g", "k")
    val t = Sketch.kmvIntersect(tiny, col("k"), "g", "a", "b", k = 64).head()
    assert(t.getAs[Long]("k_eff") === 3L)
    assert(t.getAs[Double]("union_est") === 3.0)
    // 3.0 * round(1/3, 6) = 0.999999 — rounding composition, not error
    assert(approx(t.getAs[Double]("inter_est"), 1.0, 1e-5))
    assert(t.getAs[Long]("n_exact_inter") === 1L)
  }

  test("hllRolling equals a direct per-window sketch, including across day gaps") {
    // days 1,2,3,10,11 — the 10/11 windows must NOT see days 1-3 (range
    // frame), but 11 must still see 10's registers via the grid carrier
    val rows = Seq(
      (1L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (3L, "a"),
      (10L, "x"), (10L, "y"), (11L, "z")).flatMap { case (d, u) =>
      Seq.fill(3)((d, u)) // duplicates must not matter
    }
    val df = rows.toDF("day", "k")
    val rolled = Sketch.hllRolling(df, col("k"), "day")
      .collect().map(r => r.getAs[Long]("day") -> r.getAs[Double]("hll_est")).toMap
    for (d <- Seq(1L, 2L, 3L, 10L, 11L)) {
      val windowKeys = rows.filter { case (dd, _) => dd > d - 7 && dd <= d }
      val direct = Sketch.hllDistinct(
          windowKeys.toDF("day", "k").withColumn("g", lit("w")), col("k"), Seq("g"))
        .head.getAs[Double]("hll_est")
      assert(rolled(d) === direct, s"day $d")
    }
  }

  test("rollingCorr matches direct Pearson per trailing window") {
    val xs = Seq(100L, 200L, 150L, 300L, 250L, 400L, 380L, 120L, 90L, 500L)
    val ys = Seq(110L, 190L, 160L, 310L, 240L, 390L, 400L, 100L, 95L, 520L)
    val df = xs.zip(ys).zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
      .toDF("day", "x_cents", "y_cents")
    val out = Temporal.rollingCorr(df, "x_cents", "y_cents").collect()
      .map(r => r.getAs[Long]("day") -> r).toMap
    for (t <- xs.indices) {
      val lo = math.max(0, t - 6)
      val wx = xs.slice(lo, t + 1).map(_.toDouble)
      val wy = ys.slice(lo, t + 1).map(_.toDouble)
      val n = wx.length
      assert(out(t.toLong).getAs[Long]("n_days") === n.toLong)
      if (n >= 2) {
        val (sx, sy) = (wx.sum, wy.sum)
        val num = n * wx.zip(wy).map { case (a, b) => a * b }.sum - sx * sy
        val a = n * wx.map(v => v * v).sum - sx * sx
        val b = n * wy.map(v => v * v).sum - sy * sy
        val expected = num / (math.sqrt(a) * math.sqrt(b))
        assert(approx(out(t.toLong).getAs[Double]("r"), expected, 1e-5), s"day $t")
      }
    }
  }

  test("streaks finds islands, longest run and last day") {
    val events = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L), (1L, 14L), (1L, 15L), (1L, 20L),
      (2L, 5L), (2L, 5L))
      .toDF("user_id", "day")
    val out = Temporal.streaks(events).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_active_days") === 6L)
    assert(out(1L).getAs[Long]("n_streaks") === 3L)
    assert(out(1L).getAs[Long]("longest_streak") === 3L)
    assert(out(1L).getAs[Long]("last_day") === 20L)
    assert(out(2L).getAs[Long]("n_active_days") === 1L)
    assert(out(2L).getAs[Long]("n_streaks") === 1L)
  }
}

/** Small helper so the spec can run cusum ordered deterministically. */
private object Cusum {
  def run(events: org.apache.spark.sql.DataFrame): Array[Row] =
    Temporal.cusum(events).orderBy("event_type", "day").collect()
}
