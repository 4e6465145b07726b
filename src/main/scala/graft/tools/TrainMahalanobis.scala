package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Offline trainer for the q194 Mahalanobis anomaly model (the
  * TrainCentroids/TrainPca pattern): the 8-dim mean vector and the
  * INVERSE of the exact covariance matrix, both rounded to 6 dp so the
  * identical doubles parse in the JVM and DuckDB, printed as the source
  * of `graft.queries.TrainedMahalanobis`. Moments come from
  * `Similarity.covarianceMatrix` (exact decimal arithmetic); the 8×8
  * inversion is driver-side Gauss-Jordan with partial pivoting — model-
  * sized, like the PCA Jacobi and k-means steps. */
object TrainMahalanobis {

  private[tools] def invert(a0: Array[Array[Double]]): Array[Array[Double]] = {
    val k = a0.length
    val a = a0.map(_.clone())
    val inv = Array.tabulate(k, k)((i, j) => if (i == j) 1.0 else 0.0)
    for (c <- 0 until k) {
      val piv = (c until k).maxBy(r => math.abs(a(r)(c)))
      val t = a(c); a(c) = a(piv); a(piv) = t
      val ti = inv(c); inv(c) = inv(piv); inv(piv) = ti
      val d = a(c)(c)
      require(math.abs(d) > 1e-12, "singular covariance")
      for (j <- 0 until k) { a(c)(j) /= d; inv(c)(j) /= d }
      for (r <- 0 until k if r != c) {
        val f = a(r)(c)
        for (j <- 0 until k) { a(r)(j) -= f * a(c)(j); inv(r)(j) -= f * inv(c)(j) }
      }
    }
    inv
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val k = 8
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cv = graft.operators.Similarity.covarianceMatrix(emb).collect()
    val c = Array.ofDim[Double](k, k)
    cv.foreach { r =>
      val (i, j) = (r.getAs[Int]("dim_i"), r.getAs[Int]("dim_j"))
      val v = r.getAs[Double]("cov")
      c(i)(j) = v; c(j)(i) = v
    }
    val mrow = emb.select(
      (0 until k).map(i => expr(
        s"sum(CAST(round(CAST(embedding[$i] AS DOUBLE) * 1000000) AS BIGINT))").as(s"s$i")) :+
        count(lit(1)).as("n"): _*).head()
    val n = mrow.getAs[Long]("n")
    val mu = (0 until k).map(i =>
      math.rint(mrow.getAs[Long](s"s$i").toDouble / (n * 1000000.0) * 1e6) / 1e6)
    val p = invert(c).map(_.map(v => math.rint(v * 1e6) / 1e6))
    println(s"// trained on $sfDir, n=$n")
    println("val mu: Seq[Double] = Seq(" + mu.mkString(", ") + ")")
    println("val prec: Seq[Seq[Double]] = Seq(")
    println(p.map(row => "  Seq(" + row.mkString(", ") + ")").mkString(",\n"))
    println(")")
    spark.stop()
  }
}
