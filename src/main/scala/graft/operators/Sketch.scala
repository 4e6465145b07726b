package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic sketches with DETERMINISTIC, engine-portable
  * constructions — every hash is the library-wide 60-bit md5 prefix, so a
  * DuckDB oracle rebuilds the identical sketch bit-for-bit and the
  * correctness gate checks the ESTIMATES exactly, not just statistically.
  *
  * Why sketches at 100 TB: exact `COUNT(DISTINCT)` shuffles every key;
  * exact heavy-hitters shuffles every (key, count) pair; exact
  * decontamination joins the full gram table. The sketch versions ship a
  * CONSTANT-size summary per partition/group (an HLL register file, a
  * d×w counter grid, an m-bit Bloom filter) with map-side combine, so
  * the shuffle is O(sketch) per group instead of O(data). All three here
  * follow the published constructions:
  *   - HyperLogLog: Flajolet, Fusy, Gandouet, Meunier (AofA 2007).
  *   - Count-Min: Cormode & Muthukrishnan (J. Algorithms 2005).
  *   - Bloom: Bloom (CACM 1970); used as the broadcastable pre-filter in
  *     front of the exact q63-style anti-join.
  *
  * Reference context: pyresample has no sketch family; this extends the
  * curation surface (SURVEY "training-data pipeline" extras) the same way
  * `Dedup`/`TextAnalysis` do.
  */
object Sketch {

  /** The library-wide oracle-portable 60-bit hash: md5 hex prefix → long. */
  private def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  // ------------------------------------------------------------------ HLL

  /** HyperLogLog distinct-count estimate per group, plus the exact
    * distinct for calibration.
    *
    * Construction (all integer until the final division):
    * h = md5-60bit(key); bucket = h mod m (m = 2^b registers); the
    * remaining W = 60-b bits give rho = leading-zeros+1 = W+1-bitlen
    * (both engines agree on `length(bin(x))` — no leading zeros, and
    * bin(0)='0'). Register M_j = max rho per bucket. The harmonic
    * denominator is kept EXACT by scaling by 2^(W+1): s_int =
    * Σ_observed 2^(W+1-M_j) + v_empty·2^(W+1) (≤ m·2^(W+1) = 2^61 at
    * b=8 — no overflow). Estimate = alphaNum / s_int — ONE double
    * division of deterministic operands — with the standard
    * linear-counting fallback m·ln(m/V) when E ≤ 2.5m and V>0, rounded
    * to 6 decimals immediately (libm ulp discipline).
    *
    * Scale shape: one hash-aggregation to the register file (m rows per
    * group, map-side combined), one tiny per-group rollup. The exact
    * distinct (for the calibration column) is the expensive half — a
    * production pipeline drops it and keeps only the sketch.
    */
  def hllDistinct(
      df: DataFrame,
      keyCol: Column,
      groupCols: Seq[String],
      b: Int = 8): DataFrame = {
    val g = groupCols.map(col)
    val exact = df
      .groupBy(g: _*)
      .agg(countDistinct(keyCol).as("n_exact"))
    hllEstimate(hllRegisters(df, keyCol, groupCols, b), groupCols, b)
      .join(exact, groupCols)
      .select((g ++ Seq(col("n_exact"), col("v_empty"), col("s_int"), col("hll_est"))): _*)
  }

  /** Per-row (group, bucket, rho) — the map side of the sketch. Works on
    * batch AND streaming DataFrames (pure projection). */
  def hllPrep(df: DataFrame, keyCol: Column, groupCols: Seq[String], b: Int): DataFrame = {
    val m = 1 << b
    val w = 60 - b
    val h = h60(keyCol.cast("string"))
    df.select((groupCols.map(col) :+ (h % m).as("bucket") :+ (h / m).as("rem")): _*)
      .withColumn("rho",
        when(col("rem") === 0, lit(w + 1))
          .otherwise(lit(w + 1) - length(expr("bin(rem)"))))
      .drop("rem")
  }

  /** The register file: max(rho) per (group, bucket). `max` is a
    * DECLARATIVE aggregate — partial merges are order-independent, so
    * the same expression incrementally maintains the registers under
    * Structured Streaming (see `StreamingOps.hllStream`) and the merged
    * state equals the batch registers bit-for-bit. */
  def hllRegisters(df: DataFrame, keyCol: Column, groupCols: Seq[String], b: Int = 8): DataFrame =
    hllPrep(df, keyCol, groupCols, b)
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max("rho").as("m_reg"))

  /** Finalize: registers → (v_empty, s_int, hll_est) per group — a tiny
    * aggregate over ≤ m rows per group; shared by the batch operator and
    * any sink reading streamed registers. */
  def hllEstimate(regs: DataFrame, groupCols: Seq[String], b: Int = 8): DataFrame = {
    val m = 1 << b
    val w = 60 - b
    val alphaNum = hllAlphaNum(b)
    val g = groupCols.map(col)
    regs
      .groupBy(g: _*)
      .agg(
        count(lit(1)).as("observed"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${w + 1} - m_reg)")).as("s_obs"))
      .withColumn("v_empty", lit(m.toLong) - col("observed"))
      .withColumn("s_int",
        col("s_obs") + col("v_empty") * lit(1L << (w + 1)))
      .withColumn("raw_e", lit(alphaNum) / col("s_int").cast("double"))
      .withColumn("hll_est",
        round(when(col("raw_e") <= lit(2.5 * m) && col("v_empty") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("v_empty").cast("double")))
          .otherwise(col("raw_e")), 6))
      .select((g ++ Seq(col("v_empty"), col("s_int"), col("hll_est"))): _*)
  }

  /** HLL register MERGE: the whole point of the sketch at 100 TB — union
    * cardinality WITHOUT rescanning either side. max(m_reg) over the
    * stacked register files is the union sketch (max is the same
    * declarative aggregate that built them), then the standard finalize.
    * Merging per-group sketches built once equals building one sketch
    * over the unioned raw data bit-for-bit (same hashes → same
    * registers); SketchSpec asserts it. */
  def hllUnion(regs: DataFrame, b: Int = 8): DataFrame =
    hllEstimate(
      regs.groupBy("bucket").agg(max("m_reg").as("m_reg")), Nil, b)

  /** OLAP cardinality CUBE from one register pass: distinct-count
    * estimates for every grouping set of (dimA, dimB) — (a,b), (a),
    * (b), () — by MERGING the finest-grain register file upward
    * (max(m_reg) per coarser set), never rescanning the raw data. This
    * is the composition the sketch exists for at 100 TB: a cardinality
    * cube over N·M cells costs one corpus aggregate plus model-sized
    * register rollups, where exact GROUPING SETS countDistinct would
    * shuffle the corpus once per set. Exact calibration counts ride a
    * single distinct (a, b, key) reduction re-aggregated per set.
    *
    * Output: (grouping [0=(a,b) 1=(a) 2=(b) 3=()], dimA?, dimB?,
    * n_exact, v_empty, s_int, hll_est) with nulls for rolled-up dims —
    * the `grouping_id` convention. */
  private val cubeViewId = new java.util.concurrent.atomic.AtomicLong(0)

  def hllCube(
      df: DataFrame,
      keyCol: Column,
      dimA: String,
      dimB: String,
      b: Int = 8): DataFrame = {
    // All four register levels come from ONE GROUPING SETS pass over the
    // model-sized base register file, and all four exact counts from one
    // pass over the distinct reduction — a per-level groupBy+join design
    // would re-plan the raw scan under each consumer (the q171
    // aggregate-over-aggregate corollary measured 8 scans; a persist
    // fixes the scans but pays cache materialization every run). The
    // Expand operator multiplies only MODEL-SIZED rows. GROUPING SETS
    // routes through the SQL surface (the r6 rollup-detector lesson);
    // grouping_id(a, b) = 0 (a,b) / 1 (a) / 2 (b) / 3 () — rolled dims
    // come back NULL (dims are non-null by construction here).
    val spark = df.sparkSession
    val m = 1 << b
    val w = 60 - b
    val id = cubeViewId.incrementAndGet()
    val bv = s"_hll_cube_base_$id"
    val dv = s"_hll_cube_dk_$id"
    hllRegisters(df, keyCol, Seq(dimA, dimB), b).createOrReplaceTempView(bv)
    df.select(col(dimA), col(dimB), keyCol.as("_k")).distinct().createOrReplaceTempView(dv)
    // E-notation forces DOUBLE literals (Spark parses bare decimal
    // literals as DECIMAL — the Queries.scala slit discipline)
    def dlit(d: Double): String = {
      val s = d.toString
      if (s.contains('E') || s.contains('e')) s else s + "E0"
    }
    val alphaNum = dlit(hllAlphaNum(b))
    val out = spark.sql(s"""
      WITH lv AS (
        SELECT grouping($dimA) * 2 + grouping($dimB) AS gid, $dimA, $dimB, bucket,
          max(m_reg) AS m_reg
        FROM $bv
        GROUP BY GROUPING SETS (($dimA, $dimB, bucket), ($dimA, bucket),
          ($dimB, bucket), (bucket))),
      agg AS (
        SELECT gid, $dimA, $dimB,
          count(1) AS observed,
          sum(shiftleft(cast(1 as bigint), ${w + 1} - m_reg)) AS s_obs
        FROM lv GROUP BY gid, $dimA, $dimB),
      est AS (
        SELECT gid, $dimA, $dimB,
          cast($m as bigint) - observed AS v_empty,
          s_obs + (cast($m as bigint) - observed) * cast(${1L << (w + 1)} as bigint) AS s_int
        FROM agg),
      ex AS (
        SELECT grouping_id($dimA, $dimB) AS gid, $dimA, $dimB,
          count(DISTINCT _k) AS n_exact
        FROM $dv
        GROUP BY GROUPING SETS (($dimA, $dimB), ($dimA), ($dimB), ()))
      SELECT cast(est.gid as int) AS grouping, est.$dimA, est.$dimB, ex.n_exact,
        est.v_empty, est.s_int,
        round(CASE WHEN $alphaNum / cast(s_int as double) <= ${dlit(2.5 * m)}
            AND v_empty > 0
          THEN ${dlit(m.toDouble)} * ln(${dlit(m.toDouble)} / cast(v_empty as double))
          ELSE $alphaNum / cast(s_int as double) END, 6) AS hll_est
      FROM est JOIN ex ON est.gid = ex.gid
        AND est.$dimA <=> ex.$dimA AND est.$dimB <=> ex.$dimB""")
    // spark.sql resolves the views EAGERLY into the returned plan, so
    // dropping them immediately is safe and keeps the session catalog
    // from accumulating two entries per invocation
    spark.catalog.dropTempView(bv)
    spark.catalog.dropTempView(dv)
    out
  }

  /** Rolling-window cardinality: per day, the HLL estimate of distinct
    * keys over the trailing `window` days — the sketch twin of the exact
    * rolling-DAU explode (q138), at CONSTANT state per day instead of
    * state growing with the distinct-key universe.
    *
    * Per-day register files merge across the trailing window with a
    * RANGE-framed max per bucket (a row frame would be wrong: a bucket
    * absent on intermediate days would pull too-old rows into the
    * frame). The (day × observed-bucket) grid makes a carrier row exist
    * for every day so last-seen-3-days-ago registers still contribute;
    * nulls vanish under max and never-seen buckets are filtered before
    * the finalize, which counts them as empty.
    *
    * Scale shape: the raw log collapses to ≤ days×2^b register rows
    * first; the grid, window and finalize all run on that model-sized
    * table. */
  def hllRolling(
      df: DataFrame,
      keyCol: Column,
      dayCol: String,
      window: Int = 7,
      b: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // persist the model-sized register table (≤ days×2^b rows): its three
    // consumers (both grid axes + the fact join) plan DIFFERENT partial
    // aggregates below the shuffle, so without the cache each one
    // re-scans the raw log — the same broadcast-no-reuse trap as
    // bfsHops' edges
    val daily = hllRegisters(df, keyCol, Seq(dayCol), b).persist()
    val grid = daily.select(col(dayCol)).distinct()
      .crossJoin(daily.select("bucket").distinct())
    val win = Window.partitionBy("bucket").orderBy(dayCol)
      .rangeBetween(-(window - 1), Window.currentRow)
    val merged = grid
      .join(daily, Seq(dayCol, "bucket"), "left")
      .withColumn("_mm", max("m_reg").over(win))
      .filter(col("_mm").isNotNull)
      .select(col(dayCol), col("bucket"), col("_mm").as("m_reg"))
    hllEstimate(merged, Seq(dayCol), b)
  }

  /** alpha_m · m² · 2^(W+1) as ONE Scala double — interpolate the SAME
    * literal into the oracle SQL (CAST('…' AS DOUBLE)) so both engines
    * divide identical numerators. */
  def hllAlphaNum(b: Int): Double = {
    val m = 1 << b
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    alpha * m.toDouble * m.toDouble * math.pow(2.0, (60 - b + 1).toDouble)
  }

  // ----------------------------------------------------------------- KMV

  /** K-minimum-values (Theta-style) sketch intersection (Beyer et al.
    * SIGMOD 2007; the KMV core of Apache DataSketches' Theta sketch):
    * per set, keep the K smallest distinct 60-bit hashes; merging two
    * sketches and counting survivors below the merged threshold
    * estimates UNION (unbiased (K−1)·M/θ) and JACCARD (j/K), hence
    * INTERSECTION — the set operation HLL registers cannot answer.
    *
    * Fully deterministic: same md5 hashes on every engine, kth-smallest
    * on distinct values has no ties, j and θ are integers; the only
    * float is the final (K−1)·M/θ division and the j/K scale, round-6.
    * Exact intersection joined for calibration.
    *
    * Scale shape: per-set KMV via one distinct + a WindowGroupLimit-style
    * top-K (map-side heap, K rows per set survive); everything after
    * runs on ≤2K rows. */
  def kmvIntersect(
      df: DataFrame,
      keyCol: Column,
      groupCol: String,
      groupA: String,
      groupB: String,
      k: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = math.pow(2.0, 60.0) // hash space size as double (exact power of 2)
    val hashes = df
      .filter(col(groupCol) === groupA || col(groupCol) === groupB)
      .select(col(groupCol).as("g"), h60(keyCol.cast("string")).as("h"))
      .distinct()
    val wg = Window.partitionBy("g").orderBy("h")
    val kmv = hashes
      .withColumn("_rn", row_number().over(wg))
      .filter(col("_rn") <= k)
      .select("g", "h")
    val merged = kmv.groupBy("h")
      .agg(
        max(when(col("g") === groupA, 1L).otherwise(0L)).as("in_a"),
        max(when(col("g") === groupB, 1L).otherwise(0L)).as("in_b"))
      .orderBy("h")
      .limit(k)
    val stats = merged.agg(
      max("h").as("theta"),
      count(lit(1)).as("k_eff"),
      sum(col("in_a") * col("in_b")).as("j"))
    val exact = df
      .filter(col(groupCol) === groupA || col(groupCol) === groupB)
      .select(col(groupCol).as("g"), keyCol.cast("string").as("k"))
      .distinct()
      .groupBy("k")
      .agg(max(when(col("g") === groupA, 1L).otherwise(0L)).as("a"),
        max(when(col("g") === groupB, 1L).otherwise(0L)).as("b"))
      .agg(
        sum("a").as("n_exact_a"),
        sum("b").as("n_exact_b"),
        sum(col("a") * col("b")).as("n_exact_inter"))
    stats.crossJoin(exact)
      // fewer than k distinct hashes survive the merge => the sketch
      // holds the ENTIRE union: exact mode, no estimator
      .withColumn("union_est",
        when(col("k_eff") < k, col("k_eff").cast("double"))
          .otherwise(round(lit((k - 1).toDouble * m) / col("theta").cast("double"), 6)))
      .withColumn("jaccard_est",
        round(col("j").cast("double") / col("k_eff").cast("double"), 6))
      .withColumn("inter_est", round(col("union_est") * col("jaccard_est"), 6))
      .select("n_exact_a", "n_exact_b", "n_exact_inter",
        "theta", "k_eff", "j", "union_est", "jaccard_est", "inter_est")
  }

  // ------------------------------------------------------------ DDSketch

  /** DDSketch relative-error quantiles (Masson, Rim, Lee — VLDB 2019):
    * log-spaced integer buckets with a fixed relative accuracy
    * α = (γ−1)/(γ+1), per-key bucket counts as the (mergeable,
    * streaming-safe) sketch, quantiles read back by cumulative rank.
    *
    * Deterministic, engine-portable construction: the bucket index is
    * ceil(ln(x)/ln(γ)) computed on MICRO-LOGS — round(ln(x)·1e6) is the
    * library's established libm-ulp-killing idiom (q139) — with integer
    * ceil-division `(a div g) + (a % g > 0)`, correct for any sign under
    * both engines' truncate-toward-zero div/% (the naive −((−a) div g)
    * is an identity under truncation — SketchSpec's accuracy-guarantee
    * test caught exactly that). The read-back rank is
    * ⌈q·n⌉ = (q_ppm·n + 999999) div 1e6, all integer; the value estimate
    * 2γ^b/(γ+1) is rounded to 6 like every transcendental.
    *
    * Scale shape: ONE map-side-combined aggregate to (key, bucket) —
    * ≈ ln(max/min)/ln(γ) ≈ a few hundred buckets per key regardless of
    * row count — then windows/aggregates over the SKETCH. Completes the
    * sketch family: HLL = distinct, CMS = frequency, Bloom = membership,
    * DDSketch = quantiles. */
  def ddsketchQuantiles(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      gamma: Double = 1.02,
      qPpms: Seq[Long] = Seq(500000L, 950000L, 990000L)): DataFrame = {
    require(gamma > 1.0, "gamma must exceed 1")
    val sketch = ddsketchBuckets(df, keyCol, valueCol, gamma)
    import org.apache.spark.sql.expressions.Window
    val wCum = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keyCol)
    val cum = sketch
      .withColumn("_cum", sum("cnt").over(wCum))
      .withColumn("_n", sum("cnt").over(wAll))
    val qAggs = qPpms.flatMap { q =>
      val pct = q / 10000
      val rank = s"(${q}L * _n + 999999L) div 1000000L"
      Seq(min(when(expr(s"_cum >= $rank"), col("bucket"))).as(s"b_p$pct"))
    }
    val allAggs = max("_n").as("n") +: qAggs
    val base = cum.groupBy(col(keyCol))
      .agg(allAggs.head, allAggs.tail: _*)
    qPpms.foldLeft(base) { (acc, q) =>
      val pct = q / 10000
      acc.withColumn(s"p${pct}_est",
        round(lit(2.0) * pow(lit(gamma), col(s"b_p$pct")) / lit(gamma + 1.0), 6))
    }.orderBy(keyCol)
  }

  /** The sketch build alone: (key, bucket, cnt). `count` partials merge
    * order-independently, so the same expression maintains the sketch
    * under Structured Streaming (DdsketchStreamSpec: stream == batch) and
    * two sketches merge by summing counts per bucket. */
  def ddsketchBuckets(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      gamma: Double = 1.02): DataFrame = {
    val lnG = math.round(math.log(gamma) * 1e6)
    df.filter(col(valueCol) > 0)
      .withColumn("_lnu", round(log(col(valueCol)) * 1000000, 0).cast("long"))
      .withColumn("bucket",
        expr(s"(_lnu div $lnG) + (CASE WHEN _lnu % $lnG > 0 THEN 1 ELSE 0 END)"))
      .groupBy(col(keyCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  // ----------------------------------------------------------- Count-Min

  /** Count-Min heavy-hitter estimates: build a d×w counter grid over the
    * corpus word stream, then read back the top-`k` exact words through
    * the sketch. `n_est = min_i grid[i][h_i(word)]` NEVER undercounts
    * (the spec asserts it); `overcount` is the collision noise the
    * sketch trades for O(d·w) size.
    *
    * Scale shape: the grid build is ONE aggregation keyed by (row, slot)
    * — at most d·w = 4096 groups regardless of corpus size, fully
    * map-side combined: the shuffle is the GRID, not the words. The
    * exact top-k half exists only for calibration; production reads any
    * word's estimate with d lookups against the broadcast grid.
    */
  def countMinTopK(
      docs: DataFrame,
      d: Int = 4,
      w: Int = 1024,
      k: Int = 20,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val words = docs.select(explode(split(col(textCol), " ")).as("word"))
    val rows = (0 until d).map(lit(_))
    // one word-count aggregate feeds BOTH the grid and the exact top-k:
    // the d-way explode runs over distinct words, not the raw stream, and
    // the shared shuffled intermediate dedupes physically (ReuseExchange)
    val wc = words.groupBy("word").agg(count(lit(1)).as("c"))
    val grid = wc
      .select(col("word"), col("c"), explode(array(rows: _*)).as("row"))
      .withColumn("slot", h60(concat(col("row").cast("string"), lit("#"), col("word"))) % w)
      .groupBy("row", "slot")
      .agg(sum("c").as("cnt"))
    val topExact = wc
      .select(col("word"), col("c").as("n_exact"))
      .orderBy(col("n_exact").desc, col("word").asc)
      .limit(k)
    val est = topExact
      .select(col("word"), col("n_exact"), explode(array(rows: _*)).as("row"))
      .withColumn("slot", h60(concat(col("row").cast("string"), lit("#"), col("word"))) % w)
      .join(grid, Seq("row", "slot"))
      .groupBy("word", "n_exact")
      .agg(min("cnt").as("n_est"))
    est
      .withColumn("overcount", col("n_est") - col("n_exact"))
      .orderBy(col("n_exact").desc, col("word").asc)
  }

  // --------------------------------------------------------------- Bloom

  /** Bloom-filter contamination pre-filter: hash the benchmark's distinct
    * `n`-grams into an m-bit filter (k md5 positions per gram), then
    * probe every corpus gram. Reports, per doc: gram count, Bloom hits,
    * TRUE hits (exact semi-join), and false positives — the filter's
    * real FP behaviour on this corpus. No false negatives by
    * construction (`n_bloom_hits >= n_true_hits` always; spec asserts).
    *
    * Scale shape: this is the production front-end for q63-style exact
    * decontamination — the bit table is ≤ m rows ≈ KBs (broadcast to
    * every executor; at 100 TB the corpus-side gram table never
    * shuffles), and only Bloom-positive grams proceed to the exact
    * anti-join, cutting its input by the true-negative rate. Probing is
    * a k-way explode + broadcast-hash-join + all-k count per gram.
    */
  def bloomContamination(
      corpus: DataFrame,
      benchmark: DataFrame,
      n: Int = 6,
      mBits: Int = 65536,
      kHashes: Int = 3,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val hs = (0 until kHashes).map(lit(_))
    val benchGrams = benchmark
      .select(split(col(textCol), " ").as("w"))
      .select(explode(expr(TextAnalysis.gramsSql(n))).as("ngram"))
      .distinct()
    val bits = benchGrams
      .select(col("ngram"), explode(array(hs: _*)).as("j"))
      .withColumn("pos", h60(concat(col("j").cast("string"), lit("#"), col("ngram"))) % mBits)
      .select("pos").distinct()
    val corpusGrams = corpus
      .select(col(idCol), split(col(textCol), " ").as("w"))
      .select(col(idCol), explode(expr(TextAnalysis.gramsSql(n))).as("ngram"))
      .distinct()
    // probe per (doc, gram) row directly — the corpus subtree (the 100 TB
    // side) is evaluated ONCE; a gram-level distinct first would look
    // cheaper but its two consumers (probe + join-back) physically
    // re-evaluate the whole corpus explode (no ReuseExchange across
    // different join keys). bits and the benchmark gram set broadcast.
    val probed = corpusGrams
      .select(col(idCol), col("ngram"), explode(array(hs: _*)).as("j"))
      .withColumn("pos", h60(concat(col("j").cast("string"), lit("#"), col("ngram"))) % mBits)
      .join(broadcast(bits.withColumn("_hit", lit(1L))), Seq("pos"), "left")
      .groupBy(col(idCol), col("ngram"))
      .agg(sum(coalesce(col("_hit"), lit(0L))).as("n_set"))
    val perDoc = probed
      .join(broadcast(benchGrams.withColumn("_true", lit(1L))), Seq("ngram"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("n_set") === kHashes, 1L).otherwise(0L)).as("n_bloom_hits"),
        coalesce(sum("_true"), lit(0L)).as("n_true_hits"))
      .withColumn("n_false_pos", col("n_bloom_hits") - col("n_true_hits"))
    perDoc.orderBy(idCol)
  }
}
