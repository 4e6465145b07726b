package graft.operators

import graft.SparkSpec

/** Trained IVF: Lloyd k-means on a separable 3-cluster fixture recovers
  * the cluster means, and IVF with the trained centroids + full probe
  * returns exactly the brute-force top-k. */
class KmeansSpec extends SparkSpec {

  // three well-separated clusters on coordinate axes in 4-d, slightly
  // perturbed per point (deterministic)
  private def clusterPoint(axis: Int, j: Int): Array[Double] = {
    val v = Array.fill(4)(0.05 * ((j * 7 + axis * 3) % 5))
    v(axis) = 10.0 + 0.1 * (j % 3)
    v
  }

  private lazy val items = {
    val s = spark
    import s.implicits._
    (for { axis <- 0 until 3; j <- 0 until 20 } yield
      ((axis * 20 + j).toLong, clusterPoint(axis, j)))
      .toDF("vec_id", "embedding")
  }

  test("kmeans recovers the three separable cluster directions") {
    val got = Similarity.kmeansCentroids(items, k = 3, iters = 4)
    assert(got.length == 3)
    // each true cluster axis must dominate exactly one centroid
    val domAxes = got.map(c => c.indexOf(c.max)).sorted.toSeq
    assert(domAxes == Seq(0, 1, 2), s"dominant axes $domAxes of $got")
    // dominant component ~10, others small
    got.foreach { c =>
      assert(c.max > 9.0 && c.sorted.init.forall(_ < 1.0), c.mkString(","))
    }
    // deterministic model fit (r12, decimal re-centering): the same
    // sample under a different partitioning yields bit-identical
    // centroids
    val got2 = Similarity.kmeansCentroids(items.repartition(7), k = 3, iters = 4)
    assert(got.flatten.toSeq === got2.flatten.toSeq,
      "trained centroids must be partition-order invariant")
  }

  test("assignClusters routes each point to its dominant-axis centroid") {
    val trained = Similarity.kmeansCentroids(items, k = 3, iters = 4)
    val axisOfCentroid = trained.map(c => c.indexOf(c.max)).zipWithIndex
      .map { case (axis, cid) => cid.toLong -> axis }.toMap
    val got = Similarity.assignClusters(items, trained).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("centroid_id"))
    got.foreach { case (vid, cid) =>
      val trueAxis = (vid / 20).toInt // fixture: 20 points per axis cluster
      assert(axisOfCentroid(cid) == trueAxis, s"vec $vid -> centroid $cid")
    }
  }

  test("trained IVF with full probe == brute force top-k") {
    val s = spark
    import org.apache.spark.sql.functions.col
    val queries = items.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("qid"), col("embedding"))
    val cands = items.select(col("vec_id").as("cid"), col("embedding"))
    val trained = Similarity.kmeansCentroids(items, k = 3, iters = 4)
    val ivf = Similarity.ivfTopKWith(queries, cands, trained, k = 5, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(1))).toSet
    val bf = Similarity.bruteForceTopK(queries, cands, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(1))).toSet
    assert(ivf == bf, s"ivf ${ivf.size} vs bf ${bf.size}")
  }

  test("ivfRangeSearch: full probe == exact cosine filter; recall nProbe-monotone") {
    val s = spark
    import org.apache.spark.sql.functions._
    import graft.functions.GeoFunctions.cosineSimilarity
    val queries = items.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("qid"), col("embedding"))
    val cands = items.select(col("vec_id").as("cid"), col("embedding"))
    val trained = Similarity.kmeansCentroids(items, k = 3, iters = 4)
    def range(nProbe: Int) =
      Similarity.ivfRangeSearch(queries, cands, trained, minSim = 0.8, nProbe = nProbe)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // all cells probed == the exact range result (round-6 cosine >= tau)
    val exact = queries.crossJoin(cands.withColumnRenamed("embedding", "_ce"))
      .withColumn("sim", round(cosineSimilarity(col("embedding"), col("_ce")), 6))
      .filter(col("sim") >= 0.8)
      .select("qid", "cid", "sim")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = range(3)
    assert(full === exact, s"full-probe range ${full.size} vs exact ${exact.size}")
    assert(full.nonEmpty && full.exists(p => p._1 != p._2), "non-self matches exist")
    // fewer probes only lose matches, never invent them
    val one = range(1)
    assert(one.subsetOf(full) && one.nonEmpty)
  }
}
