package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product quantization (r9): code validity, ADC-vs-exact fidelity, and
  * measured recall against the exact brute-force ranking — the same
  * recall-is-measured discipline as AnnRecallSpec for LSH/IVF. */
class PqSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("pqEncode: codes are 1..ksub, deterministic, one per subspace") {
    val c = emb.select(col("vec_id").as("cid"), col("embedding"))
    val books = Similarity.pqCodebooks(c, m = 8, ksub = 16)
    assert(books.length === 8 && books(0).length === 16 && books(0)(0).length === 8)
    val codes = Similarity.pqEncode(c, books)
    assert(codes.columns.toSeq === ("cid" +: (0 until 8).map(i => s"code_$i")))
    val stats = codes.selectExpr(
      (0 until 8).flatMap(i => Seq(s"min(code_$i)", s"max(code_$i)")): _*).head()
    for (i <- 0 until 16) {
      val v = stats.getInt(i)
      assert(v >= 1 && v <= 16, s"code bound violated: $v")
    }
    // a donor row encodes to its own index in every subspace (distance 0)
    val donor5 = codes.filter(col("cid") === 5).head()
    for (i <- 0 until 8) assert(donor5.getInt(1 + i) === 6, s"donor code subspace $i")
  }

  test("pqTopK: recall@10 vs exact brute force is measured and material") {
    val c = emb.select(col("vec_id").as("cid"), col("embedding"))
    val q = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding"))
    val books = Similarity.pqCodebooks(c, m = 8, ksub = 16)
    val approx = Similarity.pqTopK(q, c, books, k = 10, rerankFactor = 3)
    val exact = Similarity.bruteForceTopK(q, c, k = 10)
    val hits = approx.select("qid", "cid").intersect(exact.select("qid", "cid")).count()
    val total = exact.count()
    val recall = hits.toDouble / total
    // sampled (untrained) codebooks with a 3x rerank: material recall is
    // the bar; production swaps in per-subspace k-means for higher
    assert(total === 100L, s"10 queries x k=10, got $total")
    assert(recall >= 0.5, s"recall@10 $recall below floor")
    info(f"PQ(8x16, sampled) recall@10 = $recall%.2f")
  }

  test("ADC score correlates with the exact dot product on survivors") {
    val c = emb.select(col("vec_id").as("cid"), col("embedding"))
    val q = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding"))
    val books = Similarity.pqCodebooks(c, m = 8, ksub = 16)
    val rows = Similarity.pqTopK(q, c, books, k = 10, rerankFactor = 3)
      .join(q.select(col("qid"), col("embedding").as("_q")), "qid")
      .join(c.select(col("cid"), col("embedding").as("_c")), "cid")
      .withColumn("dot", graft.functions.GeoFunctions.dotProduct(col("_q"), col("_c")))
      .select("adc", "dot").collect()
    // Pearson correlation between the quantized and exact inner products
    val n = rows.length.toDouble
    val (as, ds) = (rows.map(_.getDouble(0)), rows.map(_.getDouble(1)))
    val (ma, md) = (as.sum / n, ds.sum / n)
    val cov = as.zip(ds).map { case (a, b) => (a - ma) * (b - md) }.sum
    val r = cov / math.sqrt(as.map(a => (a - ma) * (a - ma)).sum * ds.map(b => (b - md) * (b - md)).sum)
    assert(r > 0.7, f"ADC/exact correlation $r%.3f too weak for a usable index")
    info(f"ADC vs exact dot: r = $r%.3f over ${rows.length} survivor pairs")
  }

  test("ivfPqTopK: probed-cell ADC with measured recall; stage 1 scans lists, not the corpus") {
    val c = emb.select(col("vec_id").as("cid"), col("embedding"))
    val q = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding"))
    val books = Similarity.pqCodebooks(c, m = 8, ksub = 16)
    val ctr = graft.queries.TrainedCentroids.sf001k8
    val approx = Similarity.ivfPqTopK(q, c, ctr, books, k = 10, nProbe = 2, rerankFactor = 3)
    val rows = approx.collect()
    assert(rows.nonEmpty && rows.forall(_.getInt(2) <= 10))
    // recall vs exact brute force: list pruning + code quantization both
    // cost recall; the composed index must still be material
    val exact = Similarity.bruteForceTopK(q, c, k = 10)
    val hits = approx.select("qid", "cid").intersect(exact.select("qid", "cid")).count()
    val recall = hits.toDouble / exact.count()
    assert(recall >= 0.3, s"IVF-PQ recall@10 $recall below floor")
    info(f"IVF-PQ(k=8 cells, nProbe=2, PQ 8x16) recall@10 = $recall%.2f")
    // the full-probe limit recovers flat PQ exactly (list pruning off)
    val full = Similarity.ivfPqTopK(q, c, ctr, books, k = 10, nProbe = ctr.length, rerankFactor = 3)
    val flat = Similarity.pqTopK(q, c, books, k = 10, rerankFactor = 3)
    assert(full.orderBy("qid", "rank").collect().toSeq ===
      flat.orderBy("qid", "rank").collect().toSeq,
      "nProbe = #cells must equal the flat-PQ scan bit-for-bit")
  }

  test("native PQ kernels == the literal Catalyst tree, including half-boundary rounding") {
    // r10: encode/LUT moved to graft.functions.PqExpr (the tree form blew
    // janino's method limit and ran interpreted). Pin the kernel against
    // the tree it replaced — same round-6 distances/dots (Spark Round
    // semantics: BigDecimal.valueOf canonical-string HALF_UP), same
    // lowest-donor-index tiebreak — on vectors engineered to land ON
    // .5e-6 rounding boundaries (components m/128: exact binary halves).
    import spark.implicits._
    val dim = 16
    val rows = (0L until 400L).map { id =>
      (id, Array.tabulate(dim)(d => (((id * 31 + d * 17) % 257) - 128).toDouble / 128.0))
    }
    val df = rows.toDF("cid", "embedding")
    val books = Array.tabulate(2, 8)((mi, j) =>
      Array.tabulate(8)(d => (((j * 13 + d * 7 + mi) % 65) - 32).toDouble / 64.0))
    val kernel = Similarity.pqEncode(df, books).orderBy("cid").collect().toSeq
    val tree = df.select(
      col("cid") +: (0 until 2).map { mi =>
        val cand = array(books(mi).zipWithIndex.map { case (c, j) =>
          struct(round(c.zipWithIndex.map { case (cv, di) =>
            val e = element_at(col("embedding"), lit(mi * 8 + di + 1)).cast("double") - lit(cv)
            e * e
          }.reduceLeft(_ + _), 6).as("d"), lit(j + 1).as("j"))
        }: _*)
        array_min(cand).getField("j").as(s"code_$mi")
      }: _*).orderBy("cid").collect().toSeq
    assert(kernel === tree, "kernel argmin must replicate the Catalyst tree bit-for-bit")
    // LUT parity on the same adversarial grid
    val kLut = df.select(col("cid"), graft.functions.PqExpr.subLut(col("embedding"), books(1), 8))
      .orderBy("cid").collect().map(_.getSeq[Double](1)).toSeq
    val tLut = df.select(col("cid"), array(books(1).map { c =>
      round(c.zipWithIndex.map { case (cv, di) =>
        element_at(col("embedding"), lit(8 + di + 1)).cast("double") * lit(cv)
      }.reduceLeft(_ + _), 6)
    }: _*)).orderBy("cid").collect().map(_.getSeq[Double](1)).toSeq
    assert(kLut === tLut, "kernel LUT must replicate Spark round-6 dot products bit-for-bit")
  }

  test("persisted IVF-PQ index: bit-equal to the in-memory path; probes prune partitions (r10)") {
    val c = emb.select(col("vec_id").as("cid"), col("embedding"))
    val q = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding"))
    val books = Similarity.pqCodebooks(c, m = 8, ksub = 16)
    val ctr = graft.queries.TrainedCentroids.sf001k8
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_idx").toString
    Similarity.writeIvfPqIndex(c, ctr, books, dir)
    // one directory per inverted list
    val parts = new java.io.File(dir).listFiles().filter(_.getName.startsWith("centroid_id="))
    assert(parts.length === ctr.length, s"expected ${ctr.length} list partitions, got ${parts.length}")
    val served = Similarity.ivfPqTopKIndexed(q, dir, c, ctr, books,
      k = 10, nProbe = 2, rerankFactor = 3)
    val inMem = Similarity.ivfPqTopK(q, c, ctr, books, k = 10, nProbe = 2, rerankFactor = 3)
    assert(served.orderBy("qid", "rank").collect().toSeq ===
      inMem.orderBy("qid", "rank").collect().toSeq,
      "the persisted index must serve bit-identical results")
    // the probe is FILE PRUNING, now STATIC (r12): the probed-cell set
    // becomes a literal IN on the partition column, pruning the listing
    // itself — deterministic, unlike the DPP heuristic (which never
    // fires for in-memory serving batches; see ivfPqTopKIndexed doc)
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("centroid_id#") && plan.contains(" IN ("),
      s"probed-cell scan must carry the static partition IN filter:\n${plan.take(1500)}")
  }

  test("persisted IVF range search: bit-equal to the in-memory path; tombstones honored; static prune (r12)") {
    val s = spark
    import s.implicits._
    val c = emb.select(col("vec_id").as("cid"), col("embedding"))
    val q = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding"))
    val books = Similarity.pqCodebooks(c, m = 8, ksub = 16)
    val ctr = graft.queries.TrainedCentroids.sf001k8
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_range_idx").toString
    Similarity.writeIvfPqIndex(c, ctr, books, dir)
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    val served = Similarity.ivfRangeSearchIndexed(q, dir, c, ctr, books,
      minSim = 0.2, nProbe = 2)
    val inMem = Similarity.ivfRangeSearch(q, c, ctr, minSim = 0.2, nProbe = 2)
    val servedSet = served.collect().map(key).toSet
    assert(servedSet === inMem.collect().map(key).toSet,
      "the persisted index must serve bit-identical range results")
    assert(servedSet.nonEmpty, "fixture must produce in-range pairs")
    // static probed-cell prune in-plan, like the top-k path
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("centroid_id#") && plan.contains(" IN ("),
      s"range probe must carry the static partition IN filter:\n${plan.take(1200)}")
    // tombstoned candidates drop out of range results
    val victim = servedSet.map(_._2).min
    Similarity.deleteFromIvfPqIndex(spark, dir, Seq(victim).toDF("cid"))
    val afterDel = Similarity.ivfRangeSearchIndexed(q, dir, c, ctr, books,
      minSim = 0.2, nProbe = 2).collect().map(key).toSet
    assert(afterDel === servedSet.filterNot(_._2 == victim),
      "a tombstoned candidate must vanish from range results, nothing else")
  }

  test("the code scan projects codes only (no full-vector bytes in stage 1)") {
    val c = emb.select(col("vec_id").as("cid"), col("embedding"))
    val books = Similarity.pqCodebooks(c, m = 8, ksub = 16)
    val codes = Similarity.pqEncode(c, books)
    // the encode stage reads the vector once and emits 8 ints; nothing
    // downstream of the codes DataFrame references the embedding column
    assert(!codes.schema.fieldNames.contains("embedding"))
    assert(codes.schema.fields.count(_.dataType.typeName == "integer") === 8)
  }
}
