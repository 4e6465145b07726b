package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** API-contract pins for the Similarity heap paths (r11, from the r10
  * advice): (1) non-integral candidate ids throw at plan-build time
  * instead of silently casting to null/src_id 0; (2) NaN similarities
  * (cosine of a zero vector) never rank — the heap's all-false NaN
  * comparisons made their position formulation-dependent, so the policy
  * is pinned as NaN-never-ranks. */
class SimilarityContractSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Array[Double] = xs.toArray

  test("bruteForceTopK rejects a string candidate id column with a clear error") {
    val q = Seq((1L, vec(1.0, 0.0))).toDF("qid", "embedding")
    val c = Seq(("docA", vec(1.0, 0.0))).toDF("cid", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.bruteForceTopK(q, c, k = 1)
    }
    assert(e.getMessage.contains("integral"))
    assert(e.getMessage.contains("cid"))
  }

  test("quantizedTopK and ivfTopK reject non-integral ids too") {
    val q = Seq((1L, vec(1.0, 0.0))).toDF("qid", "embedding")
    val c = Seq(("docA", vec(1.0, 0.0))).toDF("cid", "embedding")
    intercept[IllegalArgumentException] { Similarity.quantizedTopK(q, c, k = 1) }
    intercept[IllegalArgumentException] { Similarity.ivfTopK(q, c, k = 1) }
  }

  test("bm25Batch rejects non-integral doc ids too (r11 heap rewrite)") {
    val q = Seq((1L, "spark")).toDF("qid", "text")
    val c = Seq(("docA", "spark engine")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Retrieval.bm25Batch(q, c)
    }
    assert(e.getMessage.contains("bm25Batch") && e.getMessage.contains("integral"))
  }

  test("integer (not just long) ids are accepted") {
    val q = Seq((1, vec(1.0, 0.0))).toDF("qid", "embedding")
    val c = Seq((7, vec(1.0, 0.0)), (8, vec(0.0, 1.0))).toDF("cid", "embedding")
    val out = Similarity.bruteForceTopK(q, c, k = 1).collect()
    assert(out.length === 1 && out.head.getLong(1) === 7L)
  }

  test("NaN similarity never ranks: a zero-vector candidate is absent from top-k") {
    val q = Seq((1L, vec(1.0, 0.0))).toDF("qid", "embedding")
    val c = Seq(
      (1L, vec(0.0, 0.0)), // zero vector -> cosine NaN; id 1 would win ties
      (2L, vec(1.0, 0.0)),
      (3L, vec(0.5, 0.5))).toDF("cid", "embedding")
    val out = Similarity.bruteForceTopK(q, c, k = 3)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(2L, 3L),
      "the NaN row is filtered, not ranked first (pre-r10 window put NaN at rank 1)")
    assert(out.forall(r => !r.getDouble(3).isNaN))
  }

  test("NaN similarity never ranks in range search either (NaN > tau under total ordering)") {
    val q = Seq((1L, vec(1.0, 0.0))).toDF("qid", "embedding")
    val c = Seq(
      (1L, vec(0.0, 0.0)), // zero vector -> cosine NaN; Spark orders NaN > 0.5
      (2L, vec(1.0, 0.0)),
      (3L, vec(0.0, 1.0))).toDF("cid", "embedding")
    val ctr = Seq(Array(1.0, 0.0))
    val out = Similarity.ivfRangeSearch(q, c, ctr, minSim = 0.5, nProbe = 1).collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(2L),
      "only the true in-range match; the NaN pair must not pass the threshold")
  }

  test("null ids still pass through untouched (only the TYPE is validated)") {
    val q = Seq((1L, vec(1.0, 0.0))).toDF("qid", "embedding")
    val c = Seq((java.lang.Long.valueOf(5L), vec(1.0, 0.0)))
      .toDF("cid", "embedding")
    assert(Similarity.bruteForceTopK(q, c, k = 1).count() === 1)
  }
}
