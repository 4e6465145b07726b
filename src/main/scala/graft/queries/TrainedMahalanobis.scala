package graft.queries

/** Mahalanobis anomaly model trained OFFLINE by
  * `graft.tools.TrainMahalanobis` (exact-decimal moments via
  * `Similarity.covarianceMatrix` over the sf0.01 embeddings, driver-side
  * Gauss-Jordan inverse, everything rounded to 6 dp so the identical
  * doubles parse in the JVM and DuckDB). Baked as literals — the
  * production pattern: train on a sample offline, broadcast the fixed
  * model into the scoring plan (same discipline as [[TrainedCentroids]]).
  * Trained on n=500 vectors, first 8 dims; covariance condition number
  * ≈ 1.37, comfortably invertible. */
object TrainedMahalanobis {

  val mu: Seq[Double] = Seq(0.002165, -0.004548, 0.00393, -0.004793,
    0.009943, 0.007773, -0.018231, 0.009217)

  val prec: Seq[Seq[Double]] = Seq(
    Seq(62.796276, 0.302117, 1.039054, -0.703025, 0.750795, 1.736951, 2.285492, -2.625743),
    Seq(0.302117, 70.643976, -0.902853, 0.281734, 3.305554, -2.87242, -1.022997, -0.722912),
    Seq(1.039054, -0.902853, 66.820579, 2.411732, -0.915353, 5.978037, 1.630303, 1.363812),
    Seq(-0.703025, 0.281734, 2.411732, 68.563389, 1.525727, -0.275875, 2.406144, -0.133056),
    Seq(0.750795, 3.305554, -0.915353, 1.525727, 63.473036, -2.637326, 4.13898, -0.259924),
    Seq(1.736951, -2.87242, 5.978037, -0.275875, -2.637326, 60.985337, 2.361666, 1.790231),
    Seq(2.285492, -1.022997, 1.630303, 2.406144, 4.13898, 2.361666, 61.261768, -1.266287),
    Seq(-2.625743, -0.722912, 1.363812, -0.133056, -0.259924, 1.790231, -1.266287, 61.669326))
}
