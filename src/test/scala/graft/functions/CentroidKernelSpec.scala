package graft.functions

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** The r11 [[CentroidExpr]] kernel must select EXACTLY what the literal
  * struct tree (`Similarity.assignCellsTree`) selects — same round-6
  * cosine doubles, same (sim desc, cid asc) order, same tie and NaN
  * behavior — on adversarial inputs (the PqSpec discipline). */
class CentroidKernelSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int, dim: Int, seed: Int): Seq[(Long, Array[Double])] =
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(dim)(d =>
        (((seed + i * 31 + d * 17) % 97) - 48) / 7.0))
    }

  private def both(rows: Seq[(Long, Array[Double])],
      ctrs: Seq[Array[Double]], keep: Int): (Seq[(Long, Long)], Seq[(Long, Long)]) = {
    val df = rows.toDF("id", "v")
    def run(f: (org.apache.spark.sql.DataFrame, Seq[Array[Double]], String, Int) =>
        org.apache.spark.sql.DataFrame) =
      f(df, ctrs, "v", keep).select("id", "centroid_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    (run(Similarity.assignCells), run(Similarity.assignCellsTree))
  }

  test("kernel == tree: keep=1 and keep=3 over a 16x64 centroid set") {
    val ctrs = vecs(16, 64, 5).map(_._2)
    val rows = vecs(200, 64, 99)
    for (keep <- Seq(1, 3)) {
      val (kernel, tree) = both(rows, ctrs, keep)
      assert(kernel === tree, s"keep=$keep diverged")
    }
  }

  test("ties: duplicate centroids resolve to the lowest index, both forms") {
    val c = Array.fill(8)(0.5)
    val ctrs = Seq(c, c.clone(), Array.fill(8)(-0.5), c.clone())
    val rows = vecs(20, 8, 3)
    val (kernel, tree) = both(rows, ctrs, 2)
    assert(kernel === tree)
    // keep=1: every row must pick index 0 or 2, never the clones 1/3
    val (k1, t1) = both(rows, ctrs, 1)
    assert(k1 === t1)
    assert(k1.forall { case (_, cid) => cid == 0L || cid == 2L })
  }

  test("NaN rows (zero vector): kernel matches the tree's total-order placement") {
    val ctrs = vecs(4, 8, 5).map(_._2)
    val rows = Seq((0L, Array.fill(8)(0.0))) ++ vecs(5, 8, 11).map { case (i, v) => (i + 1, v) }
    for (keep <- Seq(1, 2)) {
      val (kernel, tree) = both(rows, ctrs, keep)
      assert(kernel === tree, s"keep=$keep diverged on the NaN row")
    }
  }

  test("q51-shape equivalence: ivfTopK output unchanged by the kernel swap") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding"))
    val c = emb.select(col("vec_id").as("cid"), col("embedding"))
    val out = Similarity.ivfTopK(q, c, k = 5, nCentroids = 16, nProbe = 4)
      .orderBy("qid", "rank").collect()
    assert(out.nonEmpty)
    // ranks are contiguous per query and sims non-increasing
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sims = rows.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }
}
