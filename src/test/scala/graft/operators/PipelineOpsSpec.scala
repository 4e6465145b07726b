package graft.operators

import graft.SparkSpec
import graft.core.{AreaDef, Crs}

/** Extension-operator specs: dedup family, text analysis, similarity
  * search, data reduction, linesample. */
class PipelineOpsSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private lazy val docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en", 43L),
      (2L, "the quick brown fox jumps over the lazy dog", "en", 43L), // exact dup of 1
      (3L, "the quick brown fox leaps over the lazy dog", "en", 43L), // near dup of 1
      (4L, "der schnelle braune fuchs springt und ist gut", "de", 45L),
      (5L, "completely different text about spark engines and data", "en", 54L),
      (6L, "dog lazy the over jumps fox brown quick the", "en", 43L)) // permutation of 1
      .toDF("doc_id", "text", "lang", "n_chars")
  }

  test("exact dedup groups identical texts (hash-groupBy)") {
    val r = Dedup.exact(docs).collect()
    val dup = r.filter(_.getAs[Long]("n") == 2L)
    assert(dup.length == 1 && dup(0).getAs[Long]("keep_id") == 1L)
    assert(r.length == 5)
  }

  test("fingerprint is word-order-insensitive") {
    val r = Dedup.fingerprint(docs).collect()
    // 1, 2 and 6 share the same sorted word set
    val big = r.filter(_.getAs[Long]("n") == 3L)
    assert(big.length == 1 && big(0).getAs[Long]("keep_id") == 1L)
  }

  test("minhash LSH finds exact and near dups, not unrelated docs") {
    val pairs = Dedup.minhashLsh(docs, threshold = 0.3).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 5L || b == 5L })
  }

  test("minhash LSH hot-bucket cap: degenerate bucket pruned, others untouched") {
    val s = spark
    import s.implicits._
    // 8 identical docs (one degenerate band bucket per band) + a true
    // near-dup pair of distinct content
    val dd = ((1L to 8L).map(i => (i, "aaa bbb ccc ddd eee fff")) ++ Seq(
      (20L, "the quick brown fox jumps over the lazy dog"),
      (21L, "the quick brown fox leaps over the lazy dog")))
      .toDF("doc_id", "text")
    def pairs(cap: Int) = Dedup.minhashLsh(dd, threshold = 0.3, maxBandSize = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairs(Int.MaxValue)
    assert(uncapped.size >= 28 + 1, "8 identical docs alone give 28 pairs")
    // cap below the degenerate bucket's size: its 28 pairs vanish, the
    // honest near-dup pair survives (its buckets have occupancy 2)
    val capped = pairs(4)
    assert(capped.contains((20L, 21L)))
    assert(!capped.exists { case (a, b) => a <= 8L && b <= 8L })
    assert(capped.subsetOf(uncapped))
    // cap at/above the max occupancy is bit-compatible with no cap
    assert(pairs(8) === uncapped)
  }

  test("ngramJaccard hot-block cap mirrors the LSH band cap") {
    val s = spark
    import s.implicits._
    // one degenerate block of 6 docs (same lang + n_chars), one honest
    // block of 2 near-dups
    val dd = ((1L to 6L).map(i => (i, s"common shared words here $i", "en", 25L)) ++ Seq(
      (20L, "the quick brown fox jumps", "de", 25L),
      (21L, "the quick brown fox leaps", "de", 25L)))
      .toDF("doc_id", "text", "lang", "n_chars")
    def pairs(cap: Int) = Dedup.ngramJaccard(dd, Seq("lang", "n_chars"),
        threshold = 0.3, maxBlockSize = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairs(Int.MaxValue)
    assert(uncapped.contains((20L, 21L)) && uncapped.exists(p => p._1 <= 6L))
    val capped = pairs(4)
    assert(capped.contains((20L, 21L)))
    assert(!capped.exists { case (a, b) => a <= 6L && b <= 6L })
    assert(capped.subsetOf(uncapped))
    assert(pairs(6) === uncapped)
  }

  test("simhashNearDup hot-chunk cap: identical-doc bucket pruned, subset-monotone") {
    val s = spark
    import s.implicits._
    val dd = ((1L to 6L).map(i => (i, "aaa bbb ccc ddd eee fff")) ++ Seq(
      (20L, "the quick brown fox jumps over the lazy dog today"),
      (21L, "the quick brown fox jumps over the lazy dog tonight")))
      .toDF("doc_id", "text")
    def pairs(cap: Int) = Dedup.simhashNearDup(dd, maxBandSize = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairs(Int.MaxValue)
    assert(uncapped.exists { case (a, b) => a <= 6L && b <= 6L })
    val capped = pairs(4)
    assert(!capped.exists { case (a, b) => a <= 6L && b <= 6L })
    assert(capped.subsetOf(uncapped))
    assert(pairs(6) === uncapped)
  }

  test("dropExactDuplicates / dropNearDuplicates keep-first policy") {
    val kept = Dedup.dropExactDuplicates(docs).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L, 5L, 6L)) // doc 2 is the exact dup of 1
    val pairs = Dedup.minhashLsh(docs, threshold = 0.3)
    val near = Dedup.dropNearDuplicates(docs, pairs).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(near.contains(1L) && !near.contains(2L)) // 2 dropped as later member
    assert(near.contains(4L) && near.contains(5L)) // unrelated docs kept
  }

  test("ngram jaccard with blocking keys") {
    val pairs = Dedup.ngramJaccard(docs, Seq("lang", "n_chars"), threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"), r.getAs[Double]("jaccard")))
    val exact = pairs.find(p => p._1 == 1L && p._2 == 2L)
    assert(exact.exists(_._3 == 1.0))
    // 1 vs 3: 7 shared of 9 distinct words each, union 11 -> wait: jaccard = 7/9? compute: sets differ by jumps/leaps
    val near = pairs.find(p => p._1 == 1L && p._2 == 3L)
    assert(near.exists(p => p._3 > 0.7 && p._3 < 1.0))
  }

  test("simhash: identical docs identical hash; near dups within hamming 3") {
    val h = Dedup.simhash(docs).collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(h(1L) == h(2L))
    val pairs = Dedup.simhashNearDup(docs, maxHamming = 3).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("tokenStats + quality + langId") {
    val ts = TextAnalysis.tokenStats(docs).collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(ts(1L).getAs[Long]("n_words") == 9L)
    assert(ts(1L).getAs[Long]("n_chars") == 43L)

    val q = TextAnalysis.quality(docs).collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(q(1L).getAs[Double]("stop_ratio") == 2.0 / 9) // two "the"
    assert(q(5L).getAs[Long]("stop_hits") == 1L) // "and"
    assert(q(4L).getAs[Long]("stop_hits") == 0L)

    val l = TextAnalysis.langId(docs).collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    assert(l(1L) == "en" && l(4L) == "de")
  }

  test("similarity: brute-force top-k ranks identical vector first") {
    val s = spark
    import s.implicits._
    val base = Array.tabulate(8)(i => 1.0f / (i + 1))
    def rot(k: Int) = Array.tabulate(8)(i => base((i + k) % 8))
    val cands = (0 until 8).map(k => (k.toLong, rot(k))).toDF("cid", "embedding")
    val qs = Seq((100L, rot(3))).toDF("qid", "embedding")
    val top = Similarity.bruteForceTopK(qs, cands, k = 3).collect()
    assert(top.head.getAs[Long]("cid") == 3L)
    assert(approx(top.head.getAs[Double]("sim"), 1.0, 1e-9))
    assert(top.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3))
  }

  test("similarity: LSH top-k recalls the exact match") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val cands = (0 until 200).map(i => (i.toLong, Array.fill(16)(rnd.nextFloat() - 0.5f)))
    val candsDf = cands.toDF("cid", "embedding")
    val qs = Seq((999L, cands(42)._2)).toDF("qid", "embedding")
    val top = Similarity.lshTopK(qs, candsDf, dim = 16, k = 5)
    val first = top.orderBy(col("rank")).collect().head
    assert(first.getAs[Long]("cid") == 42L && approx(first.getAs[Double]("sim"), 1.0, 1e-6))
  }

  test("data reduction keeps in-bbox points incl. date-line wrap (P5)") {
    val s = spark
    import s.implicits._
    val pts = Seq((1L, 170.0, 0.0), (2L, -170.0, 0.0), (3L, 0.0, 0.0), (4L, 170.0, 60.0))
      .toDF("id", "lon", "lat")
    val kept = pts.filter(DataReduce.bboxPredicate(col("lon"), col("lat"), 150.0, -30.0, -150.0, 30.0))
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L))
  }

  test("reduceToArea prunes far-away swath points") {
    val s = spark
    import s.implicits._
    val area = AreaDef("eu", Crs.fromProj4("+proj=laea +lat_0=50 +lon_0=10 +a=6371000"),
      100, 100, -1000000, -1000000, 1000000, 1000000)
    val pts = Seq((1L, 10.0, 50.0), (2L, 11.0, 48.0), (3L, -120.0, -60.0), (4L, 140.0, 50.0))
      .toDF("id", "lon", "lat")
    val kept = DataReduce.reduceToArea(pts, area, 50000.0).collect().map(_.getLong(0)).toSet
    assert(kept.contains(1L) && kept.contains(2L) && !kept.contains(3L) && !kept.contains(4L))
  }

  test("dropFingerprintDuplicates keeps the lowest id per word set") {
    // docs 1, 2, 6 share the same word set (2 exact dup, 6 permutation)
    val kept = Dedup.dropFingerprintDuplicates(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L, 5L))
  }

  test("repetitionStats: modal n-gram share and duplicated-5-gram fraction") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "a b a b a b c"),            // 7 words; bigrams: ab,ba,ab,ba,ab,bc -> top2=3
      (2L, "x y z w v x y z w v x"),    // 11 words, 7 5-grams; positions 5,6 repeat 0,1 -> dup5_n=2
      (3L, "hi"))                       // 1 word: no n-grams at all
      .toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(d).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Long]("n_words") == 7L)
    assert(r(1L).getAs[Long]("top2_n") == 3L)
    assert(approx(r(1L).getAs[Double]("top2_frac"), 3.0 / 6.0))
    assert(r(1L).getAs[Long]("top3_n") == 2L) // "a b a" and "b a b" both twice, "a b c" once
    assert(approx(r(1L).getAs[Double]("top3_frac"), 2.0 / 5.0))
    assert(r(2L).getAs[Long]("dup5_n") == 2L)
    assert(approx(r(2L).getAs[Double]("dup5_frac"), 2.0 / 7.0))
    assert(r(3L).getAs[Long]("top2_n") == 0L && r(3L).isNullAt(r(3L).fieldIndex("top2_frac")))
    assert(r(3L).getAs[Long]("dup5_n") == 0L && r(3L).isNullAt(r(3L).fieldIndex("dup5_frac")))
  }

  test("repetitionStats modal count matches a relational groupBy recompute") {
    val s = spark
    import s.implicits._
    val d = docs // the shared 6-doc fixture
    val got = TextAnalysis.repetitionStats(d).select("doc_id", "top2_n").collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    // brute force: explode bigrams, group, max
    val w = d.select(col("doc_id"), split(col("text"), " ").as("w"))
    val big = w.select(col("doc_id"), expr(
      "explode(transform(sequence(0, size(w) - 2), i -> concat_ws(' ', w[i], w[i + 1])))").as("g"))
    val brute = big.groupBy("doc_id", "g").count()
      .groupBy("doc_id").agg(max("count").as("m")).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(got == brute)
  }

  test("repetition plan shapes: per-row fold is shuffle-free, ngram sweep shuffles exactly twice") {
    val p1 = TextAnalysis.repetitionStats(docs).queryExecution.executedPlan.toString
    assert(!p1.contains("Exchange"), s"repetitionStats must be a pure map stage:\n$p1")
    val p2 = TextAnalysis.repeatedNgrams(docs).queryExecution.executedPlan.toString
    val nEx = "(?m)Exchange hashpartitioning".r.findAllIn(p2).length
    assert(nEx == 2, s"expected the two keyed aggregations only, got $nEx exchanges:\n$p2")
  }

  test("repetitionStats property sweep: 300 seeded random docs vs Scala brute force") {
    val s = spark
    import s.implicits._
    // tiny vocab + short docs force heavy gram collisions, the regime
    // where a run-length fold bug would hide
    val rnd = new scala.util.Random(20260812L)
    val vocab = Array("a", "b", "c", "d")
    val fixture = (1L to 300L).map { id =>
      val n = 1 + rnd.nextInt(24)
      (id, Array.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    def brute(text: String): (Long, Long, Long, Long) = {
      val w = text.split(" ", -1)
      def top(n: Int): Long =
        if (w.length < n) 0L
        else w.sliding(n).toSeq.groupBy(_.toSeq).values.map(_.size).max.toLong
      val g5 = if (w.length < 5) Seq.empty else w.sliding(5).map(_.toSeq).toSeq
      (top(2), top(3), (g5.size - g5.distinct.size).toLong, g5.size.toLong)
    }
    val got = TextAnalysis.repetitionStats(fixture.toDF("doc_id", "text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("top2_n"), r.getAs[Long]("top3_n"), r.getAs[Long]("dup5_n"))).toMap
    fixture.foreach { case (id, text) =>
      val (t2, t3, d5, _) = brute(text)
      assert(got(id) == ((t2, t3, d5)), s"doc $id '$text'")
    }
  }

  test("repeatedNgrams flags cross-doc boilerplate at the minDocs threshold") {
    val s = spark
    import s.implicits._
    val boiler = "terms of service apply to all"
    val d = Seq(
      (1L, s"alpha beta $boiler gamma"),
      (2L, s"$boiler delta epsilon"),
      (3L, s"zeta $boiler"),
      (4L, "pair only here shared twice not thrice"),
      (5L, "pair only here shared twice not thrice zz"))
      .toDF("doc_id", "text")
    val r3 = TextAnalysis.repeatedNgrams(d, n = 6, minDocs = 3).collect()
    assert(r3.map(_.getAs[String]("ngram")).toSet == Set(boiler))
    assert(r3.head.getAs[Long]("n_docs") == 3L && r3.head.getAs[Long]("n_occ") == 3L)
    val r2 = TextAnalysis.repeatedNgrams(d, n = 6, minDocs = 2)
      .collect().map(_.getAs[String]("ngram")).toSet
    assert(r2.contains("pair only here shared twice not") && r2.contains(boiler))
  }

  test("removeBoilerplate excises covered spans, keeps the rest in order") {
    val s = spark
    import s.implicits._
    val boiler = "terms of service apply to all"
    val d = Seq(
      (1L, s"alpha beta $boiler gamma"),
      (2L, s"$boiler delta epsilon"),
      (3L, s"zeta $boiler"),
      (4L, "completely unrelated text with no shared grams at all"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.removeBoilerplate(d, n = 6, minDocs = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_removed"),
        r.getAs[String]("clean_text")))
    assert(out(0) == (1L, 6L, "alpha beta gamma"))
    assert(out(1) == (2L, 6L, "delta epsilon"))
    assert(out(2) == (3L, 6L, "zeta"))
    assert(out(3)._2 == 0L &&
      out(3)._3 == "completely unrelated text with no shared grams at all")

    // overlapping occurrences union their spans: "a b c d e f a b c d e f"
    // has the repeated gram "a b c d e f" at positions 0 and 6 (and no
    // other doc needed — force minDocs=1); everything is covered
    val rep = Seq((9L, "a b c d e f a b c d e f"), (10L, "x y z q w e r t"))
      .toDF("doc_id", "text")
    val covered = TextAnalysis.removeBoilerplate(rep, n = 6, minDocs = 1)
      .filter(col("doc_id") === 9L).head()
    assert(covered.getAs[Long]("n_removed") == 12L)
    assert(covered.getAs[String]("clean_text") == "")
  }

  test("decontaminate drops docs sharing a 6-gram with the benchmark, keeps the rest") {
    val s = spark
    import s.implicits._
    // benchmark = doc 1's text; docs 1 and 2 share it verbatim, doc 3
    // differs inside every 6-gram window ("leaps" vs "jumps"), doc 6 is a
    // permutation (no ordered 6-gram survives)
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val kept = TextAnalysis.decontaminate(docs, bench).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 4L, 5L, 6L), s"got $kept")
  }

  test("stratifiedSample: caps per stratum, deterministic under repartition") {
    val s = spark
    import s.implicits._
    val d = (1L to 100L).map(i => (i, if (i % 3 == 0) "a" else "b", s"text $i"))
      .toDF("doc_id", "lang", "text")
    val r1 = TextAnalysis.stratifiedSample(d, "lang", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(r1.size == 20) // 10 per stratum, both strata have >10 docs
    val r2 = TextAnalysis.stratifiedSample(d.repartition(7), "lang", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(r1 == r2, "hash-order draw must not depend on partitioning")
  }

  test("temperatureMixture: sqrt quotas upsample the small stratum, fills stop at the quota") {
    val s = spark
    import s.implicits._
    // stratum a: 90 docs x 10 tokens = 900; stratum b: 10 docs x 10 = 100
    val d = ((1L to 90L).map(i => (i, "a")) ++ (91L to 100L).map(i => (i, "b")))
      .map { case (i, l) => (i, l, Array.fill(10)("w").mkString(" ")) }
      .toDF("doc_id", "lang", "text")
    val out = TextAnalysis.temperatureMixture(d, budget = 400L).collect()
    val byLang = out.groupBy(_.getAs[String]("lang"))
    // weights: floor(sqrt(900))=30, floor(sqrt(100))=10 -> quotas 300/100:
    // proportional sampling would give b only 40 tokens; sqrt gives it 100
    val quota = byLang.view.mapValues(_.head.getAs[Long]("quota_tokens")).toMap
    assert(quota == Map("a" -> 300L, "b" -> 100L))
    // fills: 30 docs of a (300 tokens), all 10 of b
    assert(byLang("a").length == 30 && byLang("b").length == 10)
    // every kept doc's inclusive cumsum respects its quota
    assert(out.forall(r => r.getAs[Long]("cum_tokens") <= r.getAs[Long]("quota_tokens")))
    // deterministic under repartition (hash-order draw)
    val out2 = TextAnalysis.temperatureMixture(d.repartition(7), budget = 400L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out2 == out.map(_.getAs[Long]("doc_id")).toSet)
  }

  test("tfidfTopTerms: scores rank rare terms above ubiquitous ones") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "apple apple banana common"),
      (2L, "banana cherry common"),
      (3L, "cherry common common")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(d, k = 2).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rank")) ->
        (r.getAs[String]("term"), r.getAs[Long]("tf"), r.getAs[Long]("df"), r.getAs[Double]("score")))
      .toMap
    // doc 1: apple tf=2 df=1 idf=ln(3)≈1.098612 -> score 2.197224 beats banana (df=2)
    assert(out((1L, 1))._1 == "apple")
    assert(out((1L, 1))._2 == 2L && out((1L, 1))._3 == 1L)
    assert(approx(out((1L, 1))._4, 2 * 1.098612))
    // "common" is in every doc: idf = ln(3/3) = 0 -> never outranks a real term
    assert(out.values.count(_._1 == "common") <= 1) // only reachable as a 0-score filler
    out.values.filter(_._1 == "common").foreach(t => assert(t._4 == 0.0))
    // doc 2: banana and cherry tie (tf=1, df=2) -> term-asc tie-break
    assert(out((2L, 1))._1 == "banana" && out((2L, 2))._1 == "cherry")
  }

  test("tfidf/dedupAgainstReference plan shapes: hash aggs only, digest-keyed anti-join") {
    val s = spark
    import s.implicits._
    val d = (1L to 40L).map(i => (i, s"w${i % 5} w${i % 7} w${i % 11}")).toDF("doc_id", "text")
    val p1 = TextAnalysis.tfidfTopTerms(d).queryExecution.executedPlan.toString
    // both keyed counts must stay on HashAggregate; the 1-row N table must
    // ride a broadcast, not shuffle the tf table again
    assert(!p1.contains("SortAggregate"), s"tf/df counts degraded to SortAggregate:\n$p1")
    assert(p1.contains("BroadcastNestedLoopJoin") || p1.contains("BroadcastExchange"),
      s"the corpus-count join must broadcast the 1-row side:\n$p1")
    val p2 = Dedup.dedupAgainstReference(d.filter($"doc_id" % 3 === 0), d)
      .queryExecution.executedPlan.toString
    assert(p2.contains("LeftAnti"), s"expected a fingerprint anti-join:\n$p2")
    assert(!p2.contains("CartesianProduct"), s"anti-join must stay digest-keyed:\n$p2")
  }

  test("chunkDocuments: overlapping windows cover every token; short docs get one chunk") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b c")                                   // 3 tokens < chunk
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.chunkDocuments(d, chunkTokens = 4, overlap = 2)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("chunk_start"), r.getAs[Long]("n_chunk_tokens"), r.getAs[String]("chunk_text")))
    // doc 1: starts 0,2,4,6 (stride 2) — the window at 6 reaches the end,
    // so no further (zero-new-token) window is emitted
    val d1 = rows.filter(_._1 == 1L)
    assert(d1.map(t => (t._2, t._3)).toSeq == Seq((0L, 0L), (1L, 2L), (2L, 4L), (3L, 6L)))
    assert(d1.head._5 == "t1 t2 t3 t4")
    assert(d1(1)._5 == "t3 t4 t5 t6") // 2-token overlap
    assert(d1.last._4 == 4L && d1.last._5 == "t7 t8 t9 t10")
    // every token index is covered by at least one chunk
    val covered = d1.flatMap(t => t._3 until (t._3 + t._4)).toSet
    assert(covered == (0L until 10L).toSet)
    // doc 2: a single short chunk
    assert(rows.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 0L, 3L, "a b c")))
    // row-local: no exchange in the plan
    val plan = TextAnalysis.chunkDocuments(d, 4, 2).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must be a pure map stage:\n$plan")
  }

  test("contaminationReport: overlap fractions match the decontaminate drop set") {
    val s = spark
    import s.implicits._
    val mk = (i: Int) => (1 to 8).map(j => s"w${i}_$j").mkString(" ")
    val d = Seq(
      (1L, mk(1)),                          // benchmark member (1 % 1 == ...)
      (2L, mk(1)),                          // verbatim copy of the benchmark doc
      (3L, mk(3)),                          // clean
      (4L, "a b c")                         // too short for any 6-gram
    ).toDF("doc_id", "text")
    val bench = d.filter($"doc_id" === 1L)
    val r = TextAnalysis.contaminationReport(d, bench).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_grams"), x.getAs[Long]("n_contaminated"), Option(x.getAs[Any]("contamination"))))
      .toMap
    assert(r(1L)._1 == 3L && r(1L)._2 == 3L && r(1L)._3.contains(1.0)) // self-overlap
    assert(r(2L)._1 == 3L && r(2L)._2 == 3L && r(2L)._3.contains(1.0)) // copy fully contaminated
    assert(r(3L)._2 == 0L && r(3L)._3.contains(0.0))
    assert(r(4L)._1 == 0L && r(4L)._3.isEmpty) // no 6-grams -> NULL fraction
    // consistency with the drop variant: contaminated docs == dropped docs
    val dropped = d.select("doc_id").except(
      TextAnalysis.decontaminate(d, bench).select("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(dropped == r.filter(_._2._2 > 0).keySet)
  }

  test("lmScore: hand-computed unigram perplexity; repetitive docs score as more predictable") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (1L, "a a a b"),  // mostly the most frequent word
      (2L, "b c d e")   // one-off words -> lower logp, higher perplexity
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_scored"), r.getAs[Double]("avg_logp"), r.getAs[Double]("ppl")))
      .toMap
    // corpus: 8 tokens; p(a)=3/8, p(b)=2/8, p(c)=p(d)=p(e)=1/8
    def micro(p: Double): Long = math.round(BigDecimal(math.log(p))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble * 1e6)
    val exp1 = (3 * micro(3.0 / 8) + micro(2.0 / 8)).toDouble / (4 * 1e6)
    val exp2 = (micro(2.0 / 8) + 3 * micro(1.0 / 8)).toDouble / (4 * 1e6)
    assert(out(1L)._1 == 4L && math.abs(out(1L)._2 - exp1) < 1e-12)
    assert(out(2L)._1 == 4L && math.abs(out(2L)._2 - exp2) < 1e-12)
    assert(out(1L)._3 < out(2L)._3, "the repetitive doc must have lower perplexity")
    assert(math.abs(out(1L)._3 - math.exp(-exp1)) < 1e-5)

    // reference-model split (the CCNet shape): score a new batch under
    // the model trained above; OOV words are excluded and n_scored says so
    val lm = TextAnalysis.unigramLm(d)
    val batch = Seq((10L, "a b zzz")).toDF("doc_id", "text")
    val scored = TextAnalysis.lmScoreWith(batch, lm).collect()
      .map(r => (r.getAs[Long]("n_scored"), r.getAs[Double]("avg_logp")))
    assert(scored.length == 1 && scored(0)._1 == 2L, "zzz is OOV -> 2 scored words")
    val expRef = (micro(3.0 / 8) + micro(2.0 / 8)).toDouble / (2 * 1e6)
    assert(math.abs(scored(0)._2 - expRef) < 1e-12)
  }

  test("dedupAgainstReference drops fingerprint matches incl. word-order permutations") {
    val s = spark
    import s.implicits._
    val reference = Seq((10L, "the quick brown fox"), (11L, "hello world")).toDF("doc_id", "text")
    val incoming = Seq(
      (1L, "fox brown quick the"),   // permutation of ref 10 -> dropped
      (2L, "hello world"),           // exact ref 11 -> dropped
      (3L, "genuinely new content")  // kept
    ).toDF("doc_id", "text")
    val kept = Dedup.dedupAgainstReference(incoming, reference)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(3L))
  }

  test("packSequences: offsets chain within each shard stream, chunks cut at the budget") {
    val s = spark
    import s.implicits._
    val d = (1L to 60L).map(i => (i, "en", Array.fill((i % 7 + 1).toInt)("w").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val rows = TextAnalysis.packSequences(d, budget = 10L, nShards = 2)
      .orderBy("lang", "shard", "doc_id").collect()
    rows.groupBy(r => (r.getAs[String]("lang"), r.getAs[Int]("shard"))).foreach {
      case (_, rs) =>
        var expectedOffset = 0L
        rs.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
          assert(r.getAs[Long]("pack_offset") == expectedOffset, s"row $r")
          assert(r.getAs[Long]("chunk_id") == expectedOffset / 10L, s"row $r")
          expectedOffset += r.getAs[Long]("n_tokens")
        }
    }
    assert(rows.forall(r => r.getAs[Int]("shard") == (r.getAs[Long]("doc_id") % 2).toInt))
  }

  test("linesample gathers by projected cell; misses stay NULL (J9)") {
    val s = spark
    import s.implicits._
    val area = AreaDef("g", Crs.fromProj4("+proj=longlat"), 10, 10, 0, 0, 10, 10)
    val grid = Seq((area.cellOf(0.5, 0.5), 42.0)).toDF("cell", "v")
    val t = Seq((1L, 0.4, 0.6), (2L, 9.5, 9.5)).toDF("dst_id", "lon", "lat")
    val r = Linesample.sample(t, area, grid).collect().map(r => r.getAs[Long]("dst_id") -> Option(r.getAs[Any]("v"))).toMap
    assert(r(1L).contains(42.0) && r(2L).isEmpty)
  }

  test("projectEmbeddings: identity model returns rounded input; offsets shift") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Seq(0.25f, -0.5f)), (2L, Seq(1.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.projectEmbeddings(df,
        Seq(Array(1.0, 0.0), Array(0.0, 1.0)), Seq(0.0, 0.5))
      .collect().map(x => x.getAs[Long]("vec_id") ->
        (x.getAs[Double]("p0"), x.getAs[Double]("p1"))).toMap
    assert(r(1L) == ((0.25, -1.0)) && r(2L) == ((1.0, 1.5)))
  }

  test("TrainedProjection model: components are orthonormal after rounding") {
    val c = graft.queries.TrainedProjection.comps
    for (i <- c.indices; j <- i until c.size) {
      val dot = c(i).zip(c(j)).map { case (a, b) => a * b }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-4, s"comp $i . comp $j = $dot")
    }
  }

  test("tokenize: words map to vocab ranks, OOV to 0, 1-based positions") {
    val s = spark
    import s.implicits._
    val corpus = Seq((1L, "aa bb zz aa")).toDF("doc_id", "text")
    val vocab = Seq(("aa", 9L, 1), ("bb", 5L, 2)).toDF("word", "cnt", "rank")
    val r = TextAnalysis.tokenize(corpus, vocab)
      .orderBy("pos").collect()
      .map(x => (x.getAs[Int]("pos"), x.getAs[Int]("token_id"))).toSeq
    assert(r == Seq((1, 1), (2, 2), (3, 0), (4, 1)))
  }

  test("bigramLm + stupid backoff: seen, unigram-backoff, and UNK tiers") {
    val s = spark
    import s.implicits._
    val ref = Seq((0L, "a b c a b")).toDF("doc_id", "text")
    // ref bigrams: (a,b)x2 (b,c) (c,a); c1: a=2 b=2 c=1, T=5
    val bi = TextAnalysis.bigramLm(ref)
    val uni = TextAnalysis.unigramLm(ref)
    val li2 = bi.collect().map(r => (r.getAs[String]("w1"), r.getAs[String]("w2")) ->
      r.getAs[Long]("li2")).toMap
    assert(li2(("a", "b")) == 0L) // ln(2/2) = 0
    assert(li2(("b", "c")) == math.round(BigDecimal(math.log(0.5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble * 1e6))
    val scored = TextAnalysis.bigramScoreWith(
        Seq((1L, "a b x"), (2L, "a")).toDF("doc_id", "text"), bi, uni)
      .collect().map(_.getAs[Long]("doc_id"))
    // doc 2 has no bigrams -> absent; doc 1: (a,b) seen = 0, (b,x) -> UNK tier
    val m = TextAnalysis.bigramScoreWith(
        Seq((1L, "a b x")).toDF("doc_id", "text"), bi, uni)
      .collect()(0)
    assert(m.getAs[Long]("n_bigrams") == 2L && m.getAs[Long]("n_backoff") == 1L)
    val expected = 0L + (TextAnalysis.StupidBackoffMicro - 20000000L)
    assert(math.abs(m.getAs[Double]("avg_logp") - expected.toDouble / 2e6) < 1e-12)
    assert(scored.toSet == Set(1L))
  }

  test("hardNegativeTopK: same-label candidates (incl. self) are excluded") {
    val s = spark
    import s.implicits._
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f), 0),
      (2L, Seq(0.99f, 0.1f), 0),  // most similar to 1, same label -> excluded
      (3L, Seq(0.9f, 0.3f), 1),   // the true hard negative
      (4L, Seq(-1.0f, 0.0f), 1))
    val df = vecs.toDF("vec_id", "embedding", "label")
    val q = df.filter(col("vec_id") === 1L).select(col("vec_id").as("qid"),
      col("embedding"), col("label"))
    val c = df.select(col("vec_id").as("cid"), col("embedding"), col("label"))
    val r = Similarity.hardNegativeTopK(q, c, k = 5).orderBy("rank").collect()
    assert(r.map(_.getAs[Long]("cid")).toSeq == Seq(3L, 4L))
    assert(r.forall(_.getAs[Int]("neg_label") == 1))
  }

  test("sourceDrift: identical distributions give zero KL; skew is positive") {
    val s = spark
    import s.implicits._
    // identical per-source dists == corpus dist -> KL exactly 0
    val same = Seq((1L, "s1", "a a b"), (2L, "s2", "a a b"))
      .toDF("doc_id", "source", "text")
    val r0 = TextAnalysis.sourceDrift(same)
      .collect().map(x => x.getAs[String]("source") -> x.getAs[Double]("kl")).toMap
    assert(math.abs(r0("s1")) < 1e-9 && math.abs(r0("s2")) < 1e-9)
    // disjoint vocabularies -> strong positive drift on both sides
    val skew = Seq((1L, "s1", "a a b"), (3L, "s3", "z z z"))
      .toDF("doc_id", "source", "text")
    val r1 = TextAnalysis.sourceDrift(skew)
      .collect().map(x => x.getAs[String]("source") -> x.getAs[Double]("kl")).toMap
    assert(r1("s3") > 0.5 && r1("s1") > 0.4, s"expected drift, got $r1")
  }

  test("normalizeText: case/punct/whitespace collapse to one canonical form") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "Hello,  WORLD!! 42"),
      (2L, "hello world 42"),     // already canonical
      (3L, "  ---  ")).toDF("doc_id", "text")
    val r = TextAnalysis.normalizeText(corpus)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[String]("norm_text"), x.getAs[Int]("changed"))).toMap
    assert(r(1L) == (("hello world 42", 1)))
    assert(r(2L) == (("hello world 42", 0)))
    assert(r(3L) == (("", 1)))
    // cosmetic variants now share a fingerprint
    val fps = TextAnalysis.normalizeText(corpus)
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("norm_fp")).toMap
    assert(fps(1L) == fps(2L) && fps(1L) != fps(3L))
  }

  test("vocabulary: frequency ranks with alphabetical tie-break at the cut") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "aa aa aa bb bb cc"),
      (2L, "bb dd cc")).toDF("doc_id", "text")
    // counts: aa=3, bb=3, cc=2, dd=1; topV=3 cuts between cc and dd
    val v = TextAnalysis.vocabulary(corpus, topV = 3)
      .collect().map(r => (r.getAs[String]("word"), r.getAs[Long]("cnt"),
        r.getAs[Int]("rank")))
    assert(v.toSeq.sortBy(_._3) == Seq(("aa", 3L, 1), ("bb", 3L, 2), ("cc", 2L, 3)))
  }

  test("oovRate: per-doc coverage under the vocab model") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "aa aa bb zz"),   // 3/4 in vocab {aa,bb,cc}
      (2L, "zz yy"),         // fully OOV
      (3L, "aa")).toDF("doc_id", "text")
    val vocab = Seq(("aa", 10L, 1), ("bb", 5L, 2), ("cc", 2L, 3))
      .toDF("word", "cnt", "rank")
    val r = TextAnalysis.oovRate(corpus, vocab)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_words"), x.getAs[Long]("in_vocab"),
          x.getAs[Double]("oov_rate"))).toMap
    assert(r(1L) == ((4L, 3L, 0.25)) && r(2L) == ((2L, 0L, 1.0)) && r(3L) == ((1L, 1L, 0.0)))
  }

  test("stripHtml (r10): blocks dropped, tags spaced, entities decoded once, ws collapsed") {
    val s = spark
    import s.implicits._
    val cases = Seq(
      // script content (with a bare '<' inside) and comments vanish
      ("<p>a</p><script>if (1 < 2) alert('x')</script><b>b</b>" , "a b"),
      ("<div>x<!-- secret\nnote -->y</div>", "x y"),
      // style blocks too; attribute quotes don't confuse the tag regex
      ("<style type=\"css\">p { color: red }</style><p class=\"z\">ok</p>", "ok"),
      // entities decode exactly once: &amp;lt; is the LITERAL "&lt;"
      ("A&amp;B &lt;tag&gt; &amp;lt;not-decoded&amp;gt; &quot;q&quot; it&#39;s", """A&B <tag> &lt;not-decoded&gt; "q" it's"""),
      // nbsp and newlines collapse
      ("one&nbsp;&nbsp;two\n\n  three", "one two three"),
      // nested/unclosed tags degrade to spacing, never to lost text
      ("<ul><li>a<li>b</ul>", "a b"),
      // r11: quoted attributes containing '>' no longer truncate the tag
      ("""<div title="a>b">x</div>""", "x"),
      ("""<img alt='1 > 0'/>y""", "y"),
      ("""<script data-x="a>b">hidden()</script>z""", "z"),
      // r12: UNPAIRED quotes (legal-HTML5 unquoted attribute values,
      // mismatched quotes in crawl data) degrade to spacing via the
      // residual fallback instead of leaking raw tag text
      ("""<div data-name=O'Brien>w</div>""", "w"),
      ("""<a href="x onclick='>v</a>""", "v"))
    val got = cases.map(_._1).toDF("h")
      .select(TextAnalysis.stripHtml(col("h"))).collect().map(_.getString(0)).toSeq
    assert(got === cases.map(_._2), s"stripHtml drifted: $got")
  }

  test("canonicalizeUrl (r11): case/port/www/tracking/fragment/slash/param-sort rules") {
    val s = spark
    import s.implicits._
    val cases = Seq(
      ("HTTPS://WWW.Example.COM:443/Path/A/?utm_source=x&id=2&fbclid=z#f",
        "https://example.com/Path/A/?id=2"),
      // http default port; path CASE preserved; lone tracking param leaves no '?'
      ("http://Site.org:80/Dir/?gclid=abc", "http://site.org/Dir"),
      // non-default port survives; trailing slash dropped
      ("https://a.example.com:8443/x/", "https://a.example.com:8443/x"),
      // root URL: host keeps no trailing slash; no query
      ("HTTP://EXAMPLE.com/", "http://example.com"),
      // utm in the middle repairs separators
      ("https://e.com/p?a=1&utm_medium=m&b=2", "https://e.com/p?a=1&b=2"),
      // r11: surviving params SORT — ?b=2&a=1 and ?a=1&b=2 canonicalize equal
      ("https://e.com/p?b=2&a=1", "https://e.com/p?a=1&b=2"),
      ("https://e.com/p?z=9&utm_source=x&id=3&a=1", "https://e.com/p?a=1&id=3&z=9"))
    val got = cases.map(_._1).toDF("u")
      .select(TextAnalysis.canonicalizeUrl(col("u"))).collect().map(_.getString(0)).toSeq
    assert(got === cases.map(_._2), s"canonicalizeUrl drifted: $got")
    // the canonical pair actually collides (the dedup property the sort buys)
    val pair = Seq("https://e.com/p?b=2&a=1", "https://e.com/p?a=1&b=2").toDF("u")
      .select(TextAnalysis.canonicalizeUrl(col("u"))).distinct().count()
    assert(pair === 1L)
  }
}
