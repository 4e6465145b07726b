package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The r8 multimodal additions: integer-exact resize planning and the
  * payload feature-extraction stub, including the composition contract —
  * the fake embedding column feeds the real ANN operators unchanged. */
class MultimodalPipelineSpec extends SparkSpec {

  test("resizePlan: aspect-exact, round-half-up, never below 1, no-upscale pass-through") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, 640, 480),  // downscale: 224, round(480*224/640)=168
      (2L, 480, 640),  // portrait: 168, 224
      (3L, 100, 50),   // small: untouched under noUpscale
      (4L, 10000, 1),  // extreme aspect: thin side clamps to 1
      (5L, 224, 224)   // exact: untouched
    ).toDF("id", "width", "height")
    val out = Multimodal.resizePlan(df, maxDim = 224)
      .select("id", "out_w", "out_h").as[(Long, Int, Int)].collect()
      .map { case (k, w, h) => k -> ((w, h)) }.toMap
    assert(out(1L) === ((224, 168)))
    assert(out(2L) === ((168, 224)))
    assert(out(3L) === ((100, 50)))
    assert(out(4L) === ((224, 1)))
    assert(out(5L) === ((224, 224)))
    // with upscaling allowed the small image scales up exactly
    val up = Multimodal.resizePlan(df.filter($"id" === 3L), maxDim = 224, noUpscale = false)
      .select("out_w", "out_h").as[(Int, Int)].head()
    assert(up === ((224, 112)))
  }

  test("payloadEmbedding: deterministic, bounded, and composes with bruteForceTopK") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"), // identical payload -> identical vector
      (3L, "delta epsilon zeta"),
      (4L, "eta theta iota")
    ).toDF("doc_id", "text").withColumn("payload", encode($"text", "UTF-8"))
    val emb = Multimodal.payloadEmbedding(docs, dim = 8)
      .select($"doc_id", $"embedding")
    val vecs = emb.as[(Long, Seq[Double])].collect().toMap
    assert(vecs(1L) === vecs(2L), "same payload must embed identically")
    assert(vecs(1L) !== vecs(3L), "different payloads must diverge")
    assert(vecs.values.flatten.forall(v => v >= -1.0 && v <= 1.0))
    // composition: the fake embedding drives the real ANN operator; the
    // identical payload is each twin's top-1 with cosine exactly 1
    val top = Similarity.bruteForceTopK(
        emb.select($"doc_id".as("qid"), $"embedding"),
        emb.select($"doc_id".as("cid"), $"embedding"), k = 2)
      .filter($"qid" =!= $"cid") // drop the self-pair whatever its rank
      .orderBy($"qid", $"rank")
      .select($"qid", $"cid", $"sim")
      .as[(Long, Long, Double)].collect()
    val best = top.groupBy(_._1).map { case (q, rs) => q -> ((rs.head._2, rs.head._3)) }
    assert(best(1L) === ((2L, 1.0)) && best(2L) === ((1L, 1.0)),
      s"payload twins must be mutual top-1 at cosine 1.0; got ${top.mkString(", ")}")
  }
}
