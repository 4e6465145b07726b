package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Similarity.semanticDedup (SemDeDup) + quantizedTopK (flat SQ8). */
class SemanticDedupSpec extends SparkSpec {

  // two well-separated clusters around e1 and e2 in R^4
  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("semanticDedup drops smaller-id near-dups within a cluster only") {
    val s = spark
    import s.implicits._
    val items = Seq(
      (1L, vec(1, 0, 0, 0)),        // cluster A canonical
      (2L, vec(0.99, 0.01, 0, 0)),  // near-dup of 1 -> dropped
      (3L, vec(0.7, 0.7, 0, 0)),    // cluster A but not near-dup at 0.99
      (4L, vec(0, 0, 1, 0)),        // cluster B canonical
      (5L, vec(0, 0, 0.99, 0.01)),  // near-dup of 4 -> dropped
      (6L, vec(0.99, 0, 0.02, 0))   // near 1 in space, but if routed to A it dups 1
    ).toDF("vec_id", "embedding")
    val centroids = Seq(Array(1.0, 0.2, 0, 0), Array(0, 0, 1.0, 0.2))
    val out = Similarity.semanticDedup(items, centroids, threshold = 0.99)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L, 6L))
    val keep = out.map(t => t._1 -> t._3).toMap
    assert(keep(1L) && !keep(2L) && keep(3L) && keep(4L) && !keep(5L) && !keep(6L))
    // cluster assignment routed the two groups apart
    val byCluster = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byCluster.values.exists(_ == Set(1L, 2L, 3L, 6L)))
    assert(byCluster.values.exists(_ == Set(4L, 5L)))
  }

  test("semanticDedup never compares across clusters") {
    val s = spark
    import s.implicits._
    // 1 and 2 are identical vectors but centroids are chosen so each is
    // pulled to its own cluster via a tie-break-free margin component
    val items = Seq(
      (1L, vec(1, 0, 0.4, 0)),
      (2L, vec(1, 0, 0, 0.4))
    ).toDF("vec_id", "embedding")
    val centroids = Seq(Array(1.0, 0, 1.0, 0), Array(1.0, 0, 0, 1.0))
    val out = Similarity.semanticDedup(items, centroids, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // cosine(1,2) ~ 0.86 >= 0.5, but they live in different clusters: both kept
    assert(out(1L) && out(2L))
  }

  test("quantizeInt8 emits exact integer-valued components in [-127, 127]") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, vec(1, -1, 0.5, -0.0039))).toDF("id", "v")
      .select(Similarity.quantizeInt8(col("v")).as("q"))
    val q = df.collect()(0).getSeq[Double](0)
    // round(0.5*127) = round(63.5) = 64 (the one genuine half-way case:
    // x = m/2 makes 127x land on .5 — both engines round away from zero)
    val expected = Seq(127.0, -127.0, 64.0, 0.0)
    assert(q.size == 4 && q.zip(expected).forall { case (a, b) => a == b })
    assert(q.forall(x => x == math.rint(x)))
  }

  test("quantizedTopK matches brute-force exact top-k on separable data") {
    val s = spark
    import s.implicits._
    // 40 candidates on a smooth 1-parameter family: quantization error is
    // far below the inter-candidate spacing, so the quantized candidate
    // stage (3x overfetch) must contain the true top-10
    val cands = (0 until 40).map { i =>
      val t = i / 40.0 * math.Pi / 2
      (i.toLong, vec(math.cos(t), math.sin(t), 0.3, -0.2))
    }.toDF("cid", "embedding")
    val qs = Seq((100L, vec(1, 0.05, 0.3, -0.2))).toDF("qid", "embedding")
    val quant = Similarity.quantizedTopK(qs, cands, k = 10)
      .select("cid", "rank").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val exact = Similarity.bruteForceTopK(qs, cands, k = 10)
      .select("cid", "rank").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(quant == exact)
  }

  test("semanticDedupClusters closes chains transitively: one keeper per component") {
    val s = spark
    import s.implicits._
    // chain inside one cluster: unit vectors at 0, 1 and 2 degrees —
    // adjacent cosines ~0.99985 pass the 0.9996 threshold, the 1~3
    // cosine ~0.99939 does not: a strict chain. Pairwise keep-first and
    // CC agree on the keep set here (keep 1), but only the CC output
    // labels the whole chain as ONE cluster
    def deg(d: Double) = vec(math.cos(math.toRadians(d)), math.sin(math.toRadians(d)), 0, 0)
    val items = Seq(
      (1L, deg(0)), (2L, deg(1)), (3L, deg(2)),
      (4L, vec(0, 0, 1, 0)) // other cluster, untouched
    ).toDF("vec_id", "embedding")
    val centroids = Seq(Array(1.0, 0, 0, 0), Array(0, 0, 1.0, 0))
    val thr = 0.9996
    val pairs = Similarity.semanticDedupPairs(items, centroids, thr)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (2L, 3L)), s"fixture must form a strict chain, got $pairs")
    val out = Similarity.semanticDedupClusters(items, centroids, thr)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("cluster_id"), r.getAs[Boolean]("keep")))
    assert(out.toSeq == Seq((1L, 1L, true), (2L, 1L, false), (3L, 1L, false), (4L, 4L, true)))
  }

  test("semanticDedup plan shape: pair stage is an equi-join on centroid_id, never a cross product") {
    val s = spark
    import s.implicits._
    val items = (1L to 50L).map(i => (i, vec(i % 7, i % 5, i % 3, 1))).toDF("vec_id", "embedding")
    val centroids = Seq(Array(1.0, 0, 0, 0), Array(0, 1.0, 0, 0))
    val plan = Similarity.semanticDedup(items, centroids, 0.9)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"within-cluster pairing must not plan a cross product:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"within-cluster pairing must be a hash/merge equi-join:\n$plan")
  }

  test("quantizedTopK qdot is the exact integer dot of the quantized codes") {
    val s = spark
    import s.implicits._
    val cands = Seq((1L, vec(1, 0, 0, 0)), (2L, vec(0.5, 0.5, 0, 0))).toDF("cid", "embedding")
    val qs = Seq((9L, vec(1, 0, 0, 0))).toDF("qid", "embedding")
    val rows = Similarity.quantizedTopK(qs, cands, k = 2)
      .select("cid", "qdot").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(1L) == 127L * 127L)
    assert(rows(2L) == 127L * 64L) // round(0.5*127) = 64
  }
}
