package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the data-selection / retrieval extension ops: BM25, DSIR
  * importance weights, hashed linear classifier, shard manifests. */
class SelectionSpec extends SparkSpec {

  private lazy val docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "spark spark spark engine"),            // high tf for 'spark'
      (2L, "spark engine"),                        // one 'spark', shorter
      (3L, "engine room with a very long tail of words padding the doc length out"),
      (4L, "nothing relevant here at all"),
      (5L, "rare gem"),                            // contains the rare term
      (6L, "spark gem engine"))
      .toDF("doc_id", "text")
  }

  test("bm25: tf raises score, rarity raises per-term weight, topK bounds rows") {
    val r = Retrieval.bm25(docs, Seq("spark", "gem"), topK = 10)
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[Double]("score")).toMap
    // docs without either term never appear
    assert(!r.contains(3L) && !r.contains(4L))
    // doc 1 (tf=3) outscores doc 2 (tf=1, same-ish length)
    assert(r(1L) > r(2L))
    // 'gem' (df=2) is rarer than 'spark' (df=3): doc 5 ('gem', 2 words)
    // outscores doc 2 ('spark', 2 words) at identical length
    assert(r(5L) > r(2L))
    // doc 6 has both terms: highest score of the single-term docs' peers
    assert(r(6L) > r(2L) && r(6L) > r(5L))
  }

  test("bm25 stats/score split: scoring a batch under a reference model") {
    val stats = Retrieval.bm25Stats(docs, Seq("spark"))
    val row = stats.collect()(0)
    assert(row.getAs[Long]("n_docs") == 6L && row.getAs[Long]("df0") == 3L)
    // score only a 2-doc batch under the full-corpus model: same scores
    // as the self-trained run restricted to those docs
    val batch = docs.filter(col("doc_id") <= 2)
    val scored = Retrieval.bm25ScoreWith(batch, stats, Seq("spark"))
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[Double]("score")).toMap
    val full = Retrieval.bm25(docs, Seq("spark"))
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[Double]("score")).toMap
    assert(scored.keySet == Set(1L, 2L))
    assert(scored(1L) == full(1L) && scored(2L) == full(2L))
  }

  test("bm25 batch (relational) agrees with the column variant") {
    val s = spark
    import s.implicits._
    val qs = Seq((1L, "spark gem")).toDF("qid", "text")
    val batch = Retrieval.bm25Batch(qs, docs, k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    val colVar = Retrieval.bm25(docs, Seq("spark", "gem"), topK = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    // same doc set; scores agree to the per-term micro rounding (the
    // batch form rounds each term before summing, the column form after)
    assert(batch.keySet == colVar.keySet)
    batch.foreach { case (id, sc) => assert(approx(sc, colVar(id), 3e-6)) }
    // same ranking
    val rankB = batch.toSeq.sortBy { case (id, sc) => (-sc, id) }.map(_._1)
    val rankC = colVar.toSeq.sortBy { case (id, sc) => (-sc, id) }.map(_._1)
    assert(rankB == rankC)
  }

  test("dsir: docs resembling the target slice get larger importance weights") {
    val s = spark
    import s.implicits._
    // target style: "alpha beta" bigrams; raw style: "gamma delta"
    val corpus = Seq(
      (1L, "alpha beta alpha beta alpha beta"),
      (2L, "gamma delta gamma delta gamma delta"),
      (3L, "alpha beta gamma delta"),
      (4L, "x")) // too short for a bigram -> weight 0
      .toDF("doc_id", "text")
    val target = Seq((10L, "alpha beta alpha beta")).toDF("doc_id", "text")
    val w = Selection.dsirWeights(corpus, target)
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[Double]("log_w")).toMap
    assert(w(1L) > w(3L) && w(3L) > w(2L)) // on-target > mixed > off-target
    assert(w(4L) == 0.0)
    // model is bucket-complete and carries round-6 micro-logs
    val m = Selection.dsirModel(corpus, target).collect()
    assert(m.length == 64)
    assert(m.map(_.getAs[Long]("raw_n")).sum == 13) // 5+5+3+0 bigrams
  }

  test("dsir resample: heavier docs win more seats; keys are finite and deterministic") {
    val s = spark
    import s.implicits._
    // 30 on-target docs + 30 off-target docs with distinct vocabularies
    val corpus = (
      (1L to 30L).map(i => (i, s"alpha beta alpha beta tag$i")) ++
      (31L to 60L).map(i => (i, s"gamma delta gamma delta tag$i"))).toDF("doc_id", "text")
    val target = Seq((100L, "alpha beta alpha beta alpha")).toDF("doc_id", "text")
    val model = Selection.dsirModel(corpus, target)
    val picked = Selection.dsirResample(corpus, model, k = 20)
      .collect().map(_.getAs[Long]("doc_id"))
    assert(picked.length == 20)
    val onTarget = picked.count(_ <= 30L)
    // exp(log_w) is orders of magnitude larger for alpha-beta docs: the
    // Gumbel race must seat mostly (not necessarily only) those
    assert(onTarget >= 15, s"expected on-target majority, got $onTarget/20")
    // deterministic: same call, same seats
    val again = Selection.dsirResample(corpus, model, k = 20)
      .collect().map(_.getAs[Long]("doc_id"))
    assert(picked.sameElements(again))
  }

  test("classifier: row-local scoring is deterministic and threshold-consistent") {
    val wts = Selection.defaultQualityWeights(64)
    assert(wts.size == 64 && wts.forall(w => w >= -1000000L && w <= 1000000L))
    val r = Selection.classifierScore(docs, wts).collect()
    assert(r.length == 6)
    r.foreach { row =>
      val prob = row.getAs[Double]("prob")
      val keep = row.getAs[Int]("keep")
      assert(prob >= 0.0 && prob <= 1.0)
      assert(keep == (if (prob >= 0.5) 1 else 0))
      // logit is the mean micro-weight: |logit| <= max |weight| / 1e6 <= 1
      assert(math.abs(row.getAs[Double]("logit")) <= 1.0)
    }
    // deterministic across runs
    val again = Selection.classifierScore(docs, wts).collect()
    assert(r.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("curate: classifier gate + fingerprint keep-first in one plan") {
    val s = spark
    import s.implicits._
    val wts = Selection.defaultQualityWeights(64)
    // pick words the deterministic model likes/dislikes, driver-side
    def wt(word: String): Long = wts((Selection.md5LongLocal(word) % 64).toInt)
    val cands = (1 to 50).map(i => s"word$i")
    val goodWord = cands.find(wt(_) >= 0).get
    val badWord = cands.find(wt(_) < 0).get
    val corpus = Seq(
      (10L, s"$goodWord $goodWord"),
      (11L, s"$goodWord $goodWord"), // exact word-set dup of 10 -> dropped
      (13L, badWord))                // negative weight -> gated out
      .toDF("doc_id", "text")
    val kept = Selection.curate(corpus, wts).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept == Set(10L), s"expected gate+keep-first to keep only doc 10, got $kept")
  }

  test("rrfFuse: both-list candidates outrank single-list; micro-exact sums") {
    val s = spark
    import s.implicits._
    val sparse = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("qid", "doc_id", "rank")
    val dense = Seq((1L, 10L, 2), (1L, 12L, 1)).toDF("qid", "doc_id", "rank")
    val r = Retrieval.rrfFuse(Seq(sparse, dense), k = 10).orderBy("rank").collect()
    assert(r.map(_.getAs[Long]("doc_id")).toSeq == Seq(10L, 12L, 11L))
    // doc 10: round(1e6/61) + round(1e6/62) = 16393 + 16129 = 32522 micro
    assert(r(0).getAs[Double]("score") == 0.032522 && r(0).getAs[Long]("n_lists") == 2L)
    // single-list docs tie-break on the micro contribution of their rank
    assert(r(1).getAs[Double]("score") == 0.016393 && r(2).getAs[Double]("score") == 0.016129)
  }

  /** Oracle twin of topFractionByGroup: full window sort per group. */
  private def topFracBrute(
      rows: Seq[(Long, String, Long)], fracPpm: Long): Set[(Long, String, Long)] =
    rows.groupBy(_._2).flatMap { case (_, g) =>
      val k = ((g.size * fracPpm + 999999L) / 1000000L).toInt
      g.sortBy(r => (-r._3, r._1)).take(k)
    }.toSet

  test("topFractionByGroup: matches the full-sort window formulation") {
    val s = spark
    import s.implicits._
    // deterministic pseudo-random scores with deliberate tie mass
    val rows = (1L to 400L).map { i =>
      val grp = s"g${i % 5}"
      val score = if (i % 7 == 0) 42L else (i * 2654435761L) % 1000L
      (i, grp, score)
    }
    val df = rows.toDF("doc_id", "grp", "score")
    for (ppm <- Seq(1000L, 100000L, 250000L, 500000L, 1000000L)) {
      val got = Selection.topFractionByGroup(df, "grp", "score", ppm, buckets = 8)
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("grp"),
          r.getAs[Long]("score"))).toSet
      assert(got == topFracBrute(rows, ppm), s"mismatch at fracPpm=$ppm")
    }
  }

  test("topFractionByGroup: degenerate single-tie group and tiny groups") {
    val s = spark
    import s.implicits._
    val rows =
      (1L to 60L).map(i => (i, "flat", 7L)) ++    // all-equal scores: one bin
        Seq((100L, "solo", 3L)) ++                 // n=1 -> k=1
        (200L to 202L).map(i => (i, "trio", i))
    val df = rows.toDF("doc_id", "grp", "score")
    val got = Selection.topFractionByGroup(df, "grp", "score", 100000L)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("grp"),
        r.getAs[Long]("score"))).toSet
    assert(got == topFracBrute(rows, 100000L))
    // flat group keeps ceil(60*0.1)=6 min-id docs; solo and trio keep 1 each
    assert(got.count(_._2 == "flat") == 6 && got.filter(_._2 == "flat").forall(_._1 <= 6L))
    assert(got.count(_._2 == "solo") == 1 && got.count(_._2 == "trio") == 1)
  }

  test("exactQuantileByGroup: matches the sorted order statistic incl. ties") {
    val s = spark
    import s.implicits._
    val rows = (1L to 333L).map { i =>
      val grp = s"g${i % 4}"
      val v = if (i % 6 == 0) 50L else (i * 2654435761L) % 200L
      (i, grp, v)
    }
    val df = rows.toDF("doc_id", "grp", "v")
    for (ppm <- Seq(100000L, 500000L, 900000L, 1000000L)) {
      val got = Selection.exactQuantileByGroup(df, "grp", "v", ppm, buckets = 8)
        .collect().map(r => r.getAs[String]("grp") ->
          (r.getAs[Long]("n"), r.getAs[Double]("quantile"))).toMap
      val want = rows.groupBy(_._2).map { case (g, rs) =>
        val sorted = rs.map(_._3).sorted
        val k = ((rs.size * ppm + 999999L) / 1000000L).toInt
        g -> ((rs.size.toLong, sorted(k - 1).toDouble))
      }
      assert(got == want, s"mismatch at qPpm=$ppm")
    }
    // all-equal degenerate group
    val flat = (1L to 40L).map(i => (i, "f", 9L)).toDF("doc_id", "grp", "v")
    val q = Selection.exactQuantileByGroup(flat, "grp", "v", 500000L).collect()
    assert(q.length == 1 && q(0).getAs[Double]("quantile") == 9.0)
  }

  test("weightedSamplePerGroup: matches driver-side Gumbel race, exact k") {
    val s = spark
    import s.implicits._
    val rows = (1L to 120L).map { i =>
      val grp = s"g${i % 3}"
      val w = (i % 10 + 1) * 100000L // micro log-weights
      (i, grp, w)
    }
    val df = rows.toDF("doc_id", "grp", "log_w_micro")
    val got = Selection.weightedSamplePerGroup(df, Seq("grp"), 7, "log_w_micro")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("grp"))).toSet
    val mant = 1L << 52
    def key(id: Long, w: Long): Long = {
      val u = ((Selection.md5LongLocal(id.toString) % mant) + 1).toDouble / (mant + 1).toDouble
      math.round(BigDecimal(math.log(-math.log(u)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble * 1e6) - w
    }
    val want = rows.groupBy(_._2).flatMap { case (_, g) =>
      g.sortBy(r => (key(r._1, r._3), r._1)).take(7)
    }.map(r => (r._1, r._2)).toSet
    assert(got == want)
    assert(got.groupBy(_._2).forall(_._2.size == 7))
  }

  test("shard manifest: shards partition the corpus; checksum is order-free") {
    val m = Selection.shardManifest(docs, nShards = 4).collect()
    assert(m.map(_.getAs[Long]("n_docs")).sum == 6L)
    assert(m.forall(r => r.getAs[Long]("shard") >= 0 && r.getAs[Long]("shard") < 4))
    // repartitioning/reordering the input changes nothing (bit_xor + md5
    // assignment are both order-free)
    val m2 = Selection.shardManifest(docs.repartition(7).orderBy(col("doc_id").desc), 4)
      .collect()
    assert(m.map(_.toString).sorted.sameElements(m2.map(_.toString).sorted))
  }

  test("splitByCluster: no near-dup pair straddles a split; chains land whole") {
    val s = spark
    import s.implicits._
    // a transitive chain 1~2, 2~3 (no 1~3 edge), a pair 10~11, singletons
    val dd = (1L to 20L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("d1", "d2")
    val out = Selection.splitByCluster(dd, pairs)
      .select("doc_id", "cluster_id", "split").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // whole chain shares the min-id cluster and ONE split (the leakage
    // guarantee) — including the 1~3 hop that has no direct edge
    assert(Seq(1L, 2L, 3L).map(out(_)._1).distinct == Seq(1L))
    assert(Seq(1L, 2L, 3L).map(out(_)._2).distinct.size == 1)
    assert(out(10L) == out(11L) && out(10L)._1 == 10L)
    // singletons cluster as themselves
    assert(out(5L)._1 == 5L && out(20L)._1 == 20L)
    // the draw is cluster-keyed: a member's split equals a SINGLETON's
    // split whenever their cluster ids coincide — doc 1 singleton in a
    // pair-free corpus draws the same split as the chain does here
    val solo = Selection.splitByCluster(dd, pairs.filter(lit(false)))
      .filter(col("doc_id") === 1L).select("split").head().getString(0)
    assert(out(1L)._2 == solo)
    // cuts cover all docs; all three splits representable
    assert(out.values.map(_._2).forall(Set("train", "valid", "test")))
  }

  test("zscoreByGroup: exact integer algebra, null on degenerate groups") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "a", 2L), (2L, "a", 4L), (3L, "a", 6L), // mean 4, sd sqrt(8/3)
      (4L, "b", 7L), (5L, "b", 7L)                 // constant -> z null
    ).toDF("id", "grp", "x")
    val out = Selection.zscoreByGroup(df, "grp", col("x"))
      .orderBy("id").collect()
    // z1 = (3*2 - 12)/sqrt(3*56 - 144) = -6/sqrt(24)
    val z1 = BigDecimal(-6.0 / math.sqrt(24.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0).getAs[Double]("z") == z1)
    assert(out(1).getAs[Any]("z") == 0.0)
    assert(out(2).getAs[Double]("z") == -z1)
    assert(out(3).isNullAt(out(3).fieldIndex("z")))
    assert(out(4).isNullAt(out(4).fieldIndex("z")))
  }
}
