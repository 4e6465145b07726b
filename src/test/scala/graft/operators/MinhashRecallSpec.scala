package graft.operators

import graft.SparkSpec

/** True banding recall, measured against EXACT ground truth: q175's
  * prefix-filtered join enumerates every bigram-Jaccard ≥ 2/5 pair with
  * no false negatives, so — unlike q127, whose "truth" is itself blocked
  * — this pins MinHash-LSH's real recall on real testdata. Precision is
  * structural: minhashLsh verifies candidates with exact Jaccard, so its
  * output MUST be a subset of the exact pair set (the spec's hard
  * assertion; a violation would mean the prefix filter dropped a pair —
  * i.e. the completeness theorem broke). */
class MinhashRecallSpec extends SparkSpec {

  test("minhashLsh verified pairs are a subset of exact ground truth; recall measured") {
    import spark.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").repartition(4)
    val truth = Dedup.prefixFilteredJaccard(docs)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val pred = Dedup.minhashLsh(docs)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "fixture has no exact pairs — threshold drifted?")
    // hard invariant: every LSH-verified pair is a true pair
    assert(pred.subsetOf(truth),
      s"LSH emitted pairs missing from exact truth: ${(pred -- truth).take(5)}")
    val recall = pred.size.toDouble / truth.size
    info(f"banding recall vs exact: $recall%.3f (${pred.size}/${truth.size})")
    // planted near-dups sit at J≈0.99 where 4x2 banding is near-certain;
    // assert a conservative floor, not the measured point value
    assert(recall >= 0.5, f"banding recall collapsed: $recall%.3f")
  }

  /** r12 (the r11 verdict's item 5): the PERSISTED index's decision
    * quality MEASURED, like the ANN plane's recall@10 — planted probe
    * docs at GRADED exact bigram Jaccard against their reference, and
    * the `dedupAgainstMinhashIndex` flag rate recorded per grade. Word
    * vocabularies are disjoint across pairs, so (md5 collisions aside)
    * cross-pair matches are impossible: precision is structural and
    * asserted exact; recall per grade gets conservative floors/ceilings
    * around the estimator's operating point (minMatches/numHashes =
    * 0.5: expected signature matches ≈ 8·J, banded candidacy
    * ≈ 1−(1−J²)⁴). The SURVEY §8 note carries the measured curve. */
  test("dedupAgainstMinhashIndex: planted pairs at graded Jaccard — measured decision recall, exact precision") {
    import spark.implicits._
    val nWords = 40
    val perGrade = 24
    // k trailing words replaced => bigram J = (39-k)/(39+k)
    val grades = Seq(0, 4, 10, 20, 30)
    def words(pair: Int, tag: String, k: Int): String =
      ((0 until nWords - k).map(i => s"p${pair}w$i") ++
        (0 until k).map(i => s"p$pair${tag}x$i")).mkString(" ")

    val refs = (for {
      (k, gi) <- grades.zipWithIndex; p <- 0 until perGrade
      pair = gi * perGrade + p
    } yield (pair.toLong, words(pair, "r", 0))).toDF("doc_id", "text")
    val probes = (for {
      (k, gi) <- grades.zipWithIndex; p <- 0 until perGrade
      pair = gi * perGrade + p
    } yield (10000L + pair, words(pair, "q", k), k)).toDF("doc_id", "text", "k")

    val dir = java.nio.file.Files.createTempDirectory("mh_graded").toString
    Dedup.writeMinhashIndex(refs, dir)
    val decided = Dedup.dedupAgainstMinhashIndex(probes, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("keep"),
        Option(r.getAs[Any]("dup_of")).map(_.toString.toLong), r.getAs[Int]("k")))

    // precision is exact: every flagged probe must cite ITS OWN pair's
    // reference (disjoint vocabularies make any other citation a bug)
    decided.filter(!_._2).foreach { case (id, _, dupOf, _) =>
      assert(dupOf.contains(id - 10000L),
        s"probe $id flagged against ${dupOf.orNull}, expected ${id - 10000L}")
    }

    val rate = grades.map { k =>
      val g = decided.filter(_._4 == k)
      k -> g.count(!_._2).toDouble / g.length
    }.toMap
    def j(k: Int) = (nWords - 1 - k).toDouble / (nWords - 1 + k)
    info(grades.map(k => f"J=${j(k)}%.2f -> flagged ${rate(k)}%.2f").mkString("  "))

    assert(rate(0) === 1.0, "identical text must always be flagged")
    assert(rate(4) >= 0.8, f"J=0.81 flag rate collapsed: ${rate(4)}%.2f")
    assert(rate(10) >= 0.3, f"J=0.59 flag rate collapsed: ${rate(10)}%.2f")
    assert(rate(30) <= 0.2, f"J=0.13 must rarely flag: ${rate(30)}%.2f")
    // the decision curve is monotone in Jaccard (within sampling noise)
    grades.sliding(2).foreach { case Seq(a, b) =>
      assert(rate(a) >= rate(b) - 0.15,
        f"flag rate must not rise as Jaccard falls: k=$a ${rate(a)}%.2f vs k=$b ${rate(b)}%.2f")
    }
  }
}
