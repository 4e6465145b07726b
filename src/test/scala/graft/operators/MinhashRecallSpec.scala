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
}
