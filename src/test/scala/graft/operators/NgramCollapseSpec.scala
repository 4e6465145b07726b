package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r13 exact-class collapse (`Dedup.ngramClusterLabels` and friends):
  * pins the verdict's "expanded clusters ≡ the uncollapsed form"
  * contract — the collapsed pipeline (classes → reps → pairs →
  * components → expand) must be BIT-IDENTICAL to
  * `nearDupClusters(docs, ngramJaccard(docs, ...))` under an uncapped
  * block guard, including every guard case: permuted word order (same
  * word set, different text), cross-class chains that merge only
  * transitively, null text, null block keys, empty shingle sets under
  * n=2, and same-content docs in different blocks. */
class NgramCollapseSpec extends SparkSpec {

  private lazy val docs: DataFrame = {
    val s = spark
    import s.implicits._
    Seq[(Long, String, String)](
      // class A: three identical docs + one word-order permutation
      (1L, "alpha beta gamma delta", "en"),
      (2L, "alpha beta gamma delta", "en"),
      (3L, "alpha beta gamma delta", "en"),
      (4L, "delta gamma beta alpha", "en"),
      // near-dup of class A (jaccard 3/5 = 0.6), chaining the component
      (5L, "alpha beta gamma epsilon", "en"),
      // chains to 5 (jaccard 2/6 = 0.33) but NOT directly to class A —
      // reaches the component only transitively through 5
      (6L, "alpha epsilon zeta eta", "en"),
      // class B: two identicals + one near-dup
      (10L, "one two three four", "en"),
      (11L, "one two three four", "en"),
      (12L, "one two three five", "en"),
      // singleton
      (20L, "zzz yyy xxx www", "en"),
      // null text: null class fingerprint, must stay a singleton
      (21L, null, "en"),
      // identical text but NULL block key: the pair join can never match
      // them, so the collapse must NOT merge them either
      (22L, "same words here", null),
      (23L, "same words here", null),
      // same word set as class A but a different block: never merged
      (30L, "alpha beta gamma delta", "de"),
      // single-word docs: empty bigram-shingle set under n=2 (must stay
      // singletons there), identical word set under n=1 (merged there)
      (40L, "solo", "en"),
      (41L, "solo", "en"))
      .toDF("doc_id", "text", "lang")
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  private def baselinePairs(shingleN: Int): DataFrame =
    Dedup.ngramJaccard(docs, Seq("lang"), threshold = 0.3, shingleN = shingleN,
      maxBlockSize = Dedup.Uncapped).select("d1", "d2")

  private def rows(df: DataFrame, cols: String*): Set[Seq[Any]] =
    df.select(cols.map(col): _*).collect().map(_.toSeq).toSet

  for (n <- Seq(1, 2)) {
    test(s"collapsed cluster labels == uncollapsed nearDupClusters (shingleN=$n)") {
      val base = Dedup.nearDupClusters(docs, baselinePairs(n))
      val collapsed = Dedup.ngramNearDupClusters(docs, Seq("lang"),
        threshold = 0.3, shingleN = n, maxBlockSize = Dedup.Uncapped)
      assert(rows(collapsed, "doc_id", "cluster_id", "keep") ===
        rows(base, "doc_id", "cluster_id", "keep"))
    }
  }

  test("collapsed labels: expected component structure (sanity, not just equivalence)") {
    val got = Dedup.ngramClusterLabels(docs, Seq("lang"),
        maxBlockSize = Dedup.Uncapped)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // A-chain merges 1,2,3,4 (class), 5 (direct near-dup), 6 (transitive)
    assert(Seq(1L, 2L, 3L, 4L, 5L, 6L).forall(got(_) == 1L))
    // B merges to its own min
    assert(Seq(10L, 11L, 12L).forall(got(_) == 10L))
    // singletons: plain, null text, null block keys, cross-block twin
    assert(Seq(20L, 21L, 22L, 23L, 30L).forall(id => got(id) == id))
    // identical single-word docs merge under n=1 (word-set class)
    assert(got(40L) == 40L && got(41L) == 40L)
  }

  test("collapsed canonical == uncollapsed nearDupCanonical (quality survivor)") {
    val base = Dedup.nearDupCanonical(docs, baselinePairs(1), "n_chars")
    val collapsed = Dedup.ngramNearDupCanonical(docs, Seq("lang"), "n_chars",
      threshold = 0.3, maxBlockSize = Dedup.Uncapped)
    assert(rows(collapsed, "doc_id", "cluster_id", "n_chars", "keep") ===
      rows(base, "doc_id", "cluster_id", "n_chars", "keep"))
  }

  test("splitWithClusterLabels over collapsed labels == splitByCluster over pairs") {
    val base = Selection.splitByCluster(docs, baselinePairs(1))
    val labels = Dedup.ngramClusterLabels(docs, Seq("lang"), maxBlockSize = Dedup.Uncapped)
    val collapsed = Selection.splitWithClusterLabels(docs, labels)
    assert(rows(collapsed, "doc_id", "cluster_id", "split") ===
      rows(base, "doc_id", "cluster_id", "split"))
    // the zero-join form draws the identical split per doc
    assert(rows(Selection.splitClusterLabels(labels), "doc_id", "cluster_id", "split") ===
      rows(base, "doc_id", "cluster_id", "split"))
  }

  test("threshold > 1 is rejected (would break the identical-docs-pair invariant)") {
    intercept[IllegalArgumentException] {
      Dedup.ngramClusterLabels(docs, Seq("lang"), threshold = 1.5)
    }
    intercept[IllegalArgumentException] {
      Dedup.minhashClusterLabels(docs, threshold = 1.5)
    }
  }

  test("all-singleton classes (zero exact dups): the skip path == uncollapsed form") {
    val s = spark
    import s.implicits._
    // every text distinct -> every class a singleton -> the r14 no-op
    // branch (corpus never shuffles through a class expansion) must
    // still produce the uncollapsed labels bit-exactly, chains included
    val distinctDocs = Seq[(Long, String, String)](
      (1L, "alpha beta gamma delta", "en"),
      (2L, "alpha beta gamma epsilon", "en"), // near-dup of 1
      (3L, "alpha epsilon zeta eta", "en"), // transitive via 2
      (10L, "one two three four", "en"),
      (11L, "one two three five", "en"),
      (20L, "zzz yyy xxx www", "en"),
      (21L, null, "en"),
      (22L, "same words here", null))
      .toDF("doc_id", "text", "lang")
    val base = Dedup.nearDupClusters(distinctDocs,
      Dedup.ngramJaccard(distinctDocs, Seq("lang"), threshold = 0.3, shingleN = 1,
        maxBlockSize = Dedup.Uncapped).select("d1", "d2"))
    val collapsed = Dedup.ngramNearDupClusters(distinctDocs, Seq("lang"),
      threshold = 0.3, shingleN = 1, maxBlockSize = Dedup.Uncapped)
    assert(rows(collapsed, "doc_id", "cluster_id", "keep") ===
      rows(base, "doc_id", "cluster_id", "keep"))
    val mhBase = Dedup.nearDupClusters(distinctDocs,
      Dedup.minhashLsh(distinctDocs, threshold = 0.3, maxBandSize = Dedup.Uncapped)
        .select("d1", "d2"))
    val mhCollapsed = Dedup.minhashNearDupClusters(distinctDocs, threshold = 0.3,
      maxBandSize = Dedup.Uncapped)
    assert(rows(mhCollapsed, "doc_id", "cluster_id", "keep") ===
      rows(mhBase, "doc_id", "cluster_id", "keep"))
  }

  test("class digest is injective: separator characters embedded in content cannot merge classes") {
    val s = spark
    import s.implicits._
    // r13's bare-separator encoding ('\u0000' after keys, '\u0001'
    // between shingles) collided the word SET {"y\u0001z"} with
    // {"y", "z"}: both joined to "y\u0001z", one md5, two docs with
    // ZERO Jaccard silently merged into one class. The length-prefixed
    // digest must keep them apart -- each stays its own singleton
    // cluster. Same trick through a block key: '\u0000' embedded in the
    // key value must not alias the key boundary.
    val tricky = Seq[(Long, String, String)](
      (1L, "y\u0001z", "en"),
      (2L, "y z", "en"),
      (3L, "w", "a\u0000b"),
      (4L, "b\u0000w", "a"))
      .toDF("doc_id", "text", "lang")
    val got = Dedup.ngramClusterLabels(tricky, Seq("lang"), shingleN = 1,
        maxBlockSize = Dedup.Uncapped)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
    // the minhash-plane digest (no block keys) shares the encoding
    val mh = Dedup.minhashClusterLabels(tricky, shingleN = 1, threshold = 0.9,
        maxBandSize = Dedup.Uncapped)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mh(1L) === 1L && mh(2L) === 2L)
  }

  test("minhash-plane collapse == uncollapsed nearDupClusters over minhashLsh pairs") {
    val base = Dedup.nearDupClusters(docs,
      Dedup.minhashLsh(docs, threshold = 0.3, maxBandSize = Dedup.Uncapped)
        .select("d1", "d2"))
    val collapsed = Dedup.minhashNearDupClusters(docs, threshold = 0.3,
      maxBandSize = Dedup.Uncapped)
    assert(rows(collapsed, "doc_id", "cluster_id", "keep") ===
      rows(base, "doc_id", "cluster_id", "keep"))
  }
}
