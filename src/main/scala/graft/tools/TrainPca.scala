package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Offline PCA trainer for the embedding-projection model (the
  * TrainCentroids pattern: train once, bake the model as literals, the
  * query plan only ever sees constants).
  *
  * The data-sized work is DISTRIBUTED: the raw second-moment matrix
  * Σ x·xᵀ and the mean are one explode → position aggregate each (the
  * 64×64 moment is 4096 keys — map-side combined, skew-free). Only the
  * eigendecomposition of the RESULTING 64×64 covariance runs on the
  * driver (cyclic Jacobi — model-sized by construction, the same class
  * as the k-means k×dim collect). Components are sign-fixed
  * (largest-|component| positive) and rounded to 6 dp so the identical
  * IEEE doubles parse in the JVM and DuckDB; the per-component centering
  * offset c_j = V_j·μ folds the mean into one constant, so scoring needs
  * no mean vector.
  *
  * Usage: sbt "runMain graft.tools.TrainPca [sfDir] [k]" — prints the
  * TrainedProjection.scala body to stdout.
  */
object TrainPca {

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.01")
    val k = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = spark.read.parquet(s"$base/embeddings.parquet")
      .select(col("embedding").cast("array<double>").as("x"))
    val n = e.count().toDouble
    val d = e.select(size(col("x"))).first().getInt(0)

    val mean = e.select(posexplode(col("x")).as(Seq("i", "xi")))
      .groupBy("i").agg(sum("xi").as("s"))
      .collect().map(r => r.getAs[Int]("i") -> r.getAs[Double]("s") / n)
      .toMap
    val mu = Array.tabulate(d)(mean)

    val mom = e
      .select(posexplode(
        expr("flatten(transform(x, xi -> transform(x, xj -> xi * xj)))"))
        .as(Seq("p", "v")))
      .groupBy("p").agg(sum("v").as("s"))
      .collect().map(r => r.getAs[Int]("p") -> r.getAs[Double]("s") / n)
      .toMap
    val cov = Array.tabulate(d, d)((i, j) => mom(i * d + j) - mu(i) * mu(j))

    val (evals, evecs) = jacobiEigen(cov)
    val order = evals.indices.sortBy(i => -evals(i)).take(k)
    // validate: residual ||C v - λ v|| per kept component
    order.foreach { c =>
      val v = Array.tabulate(d)(i => evecs(i)(c))
      val cv = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v(j)).sum)
      val res = math.sqrt(Array.tabulate(d)(i => math.pow(cv(i) - evals(c) * v(i), 2)).sum)
      System.err.println(f"[pca] eval=${evals(c)}%12.8f residual=$res%.2e")
      require(res < 1e-9, s"Jacobi did not converge for component $c")
    }
    val comps = order.map { c =>
      val v = Array.tabulate(d)(i => evecs(i)(c))
      val amax = v.indices.maxBy(i => math.abs(v(i)))
      val sgn = if (v(amax) < 0) -1.0 else 1.0
      v.map(x => BigDecimal(x * sgn).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val offs = comps.map(v =>
      BigDecimal(v.indices.map(i => v(i) * mu(i)).sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)

    println(s"  // trained on $base (n=${n.toInt}, d=$d), top-$k of ${evals.length}")
    println(s"  val evalsTop: Seq[Double] = Seq(${order.map(c => f"${evals(c)}%.6f").mkString(", ")})")
    println(s"  val comps: Seq[Array[Double]] = Seq(")
    println(comps.map(v => s"    Array(${v.mkString(", ")})").mkString(",\n"))
    println("  )")
    println(s"  val offsets: Seq[Double] = Seq(${offs.mkString(", ")})")
    spark.stop()
  }

  /** Classic cyclic Jacobi eigendecomposition for a symmetric matrix:
    * returns (eigenvalues, eigenvector matrix with eigenvectors as
    * COLUMNS). O(d³) per sweep — driver-side, model-sized input only. */
  private[tools] def jacobiEigen(
      a0: Array[Array[Double]], sweeps: Int = 64): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (sweep < sweeps && off > 1e-14) {
      for (p <- 0 until d - 1; q <- p + 1 until d if math.abs(a(p)(q)) > 1e-16) {
        // rotation angle zeroing a[p][q]
        val theta = 0.5 * math.atan2(2.0 * a(p)(q), a(q)(q) - a(p)(p))
        val c = math.cos(theta); val s = math.sin(theta)
        // A <- Jt A J with J[p][p]=c, J[q][q]=c, J[p][q]=s, J[q][p]=-s
        for (i <- 0 until d) {
          val aip = a(i)(p); val aiq = a(i)(q)
          a(i)(p) = c * aip - s * aiq
          a(i)(q) = s * aip + c * aiq
        }
        for (j <- 0 until d) {
          val apj = a(p)(j); val aqj = a(q)(j)
          a(p)(j) = c * apj - s * aqj
          a(q)(j) = s * apj + c * aqj
        }
        for (i <- 0 until d) {
          val vip = v(i)(p); val viq = v(i)(q)
          v(i)(p) = c * vip - s * viq
          v(i)(q) = s * vip + c * viq
        }
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }
}
