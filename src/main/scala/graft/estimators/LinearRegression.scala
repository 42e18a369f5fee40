package graft.estimators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{ContractedOutputs, FeatureFrame, PredictOptions}

/** Ordinary least squares via DISTRIBUTED normal equations: one aggregate
  * pass over the training table accumulates X'X and X'y (map-side partial
  * sums — d(d+1)/2 + d·t scalars cross the wire, never rows), the
  * (d+1)×(d+1) system is solved on the driver, and predict is a pure
  * codegen'd dot-product `Column` — the reference's "any sklearn
  * estimator" path (`estimator.py:36`) specialized to LinearRegression
  * with a Spark-native fit instead of a collected one.
  */
final case class LinearRegression() extends FeatureEstimator[LinearRegressionModel] {

  def fit(train: DataFrame, featureCols: Seq[String], targetCols: Seq[String]): LinearRegressionModel = {
    val d = featureCols.length
    val t = targetCols.length
    val xs = featureCols.map(c => col(c).cast("double"))
    val ys = targetCols.map(c => col(c).cast("double"))
    // design vector z = (1, x_1..x_d); accumulate z z' (upper triangle) and z y'
    val z: Seq[Column] = lit(1.0) +: xs
    val zz = for (i <- 0 to d; j <- i to d) yield sum(z(i) * z(j))
    val zy = for (i <- 0 to d; k <- 0 until t) yield sum(z(i) * ys(k))
    val all = (zz ++ zy).zipWithIndex.map { case (c, i) => c.as(s"m$i") }
    val r = train.agg(all.head, all.tail: _*).collect()(0)

    val a = Array.ofDim[Double](d + 1, d + 1)
    var p = 0
    for (i <- 0 to d; j <- i to d) {
      a(i)(j) = r.getDouble(p); a(j)(i) = a(i)(j); p += 1
    }
    val b = Array.ofDim[Double](d + 1, t)
    for (i <- 0 to d; k <- 0 until t) { b(i)(k) = r.getDouble(p); p += 1 }

    // Gaussian elimination with partial pivoting on the (d+1)x(d+1) system
    val n = d + 1
    for (c0 <- 0 until n) {
      var piv = c0
      for (r0 <- c0 + 1 until n) if (math.abs(a(r0)(c0)) > math.abs(a(piv)(c0))) piv = r0
      if (piv != c0) { val tmp = a(piv); a(piv) = a(c0); a(c0) = tmp
                       val tb = b(piv); b(piv) = b(c0); b(c0) = tb }
      require(a(c0)(c0) != 0.0, "singular design matrix in LinearRegression.fit")
      for (r0 <- c0 + 1 until n) {
        val f = a(r0)(c0) / a(c0)(c0)
        for (j <- c0 until n) a(r0)(j) -= f * a(c0)(j)
        for (k <- 0 until t) b(r0)(k) -= f * b(c0)(k)
      }
    }
    val beta = Array.ofDim[Double](n, t)
    for (k <- 0 until t; r0 <- n - 1 to 0 by -1) {
      var s = b(r0)(k)
      for (j <- r0 + 1 until n) s -= a(r0)(j) * beta(j)(k)
      beta(r0)(k) = s / a(r0)(r0)
    }
    val intercepts = (0 until t).map(beta(0)(_))
    val coefs = (0 until t).map(k => featureCols.zipWithIndex.map { case (c, i) => c -> beta(i + 1)(k) }.toMap)
    LinearRegressionModel(featureCols, targetCols, intercepts, coefs)
  }
}

final case class LinearRegressionModel(
    featureNames: Seq[String],
    targetNames: Seq[String],
    intercepts: Seq[Double],
    coefficients: Seq[Map[String, Double]] // one map per target
) extends FittedModel with ContractedOutputs {

  def predict(frame: FeatureFrame, opts: PredictOptions = PredictOptions()): DataFrame = {
    val ff = frame.validated(featureNames)
    val out = outputContract(ff.df.sparkSession, opts)
    val mask = ff.noDataMask
    val preds = targetNames.zipWithIndex.map { case (tn, k) =>
      val dot = featureNames
        .map(c => col(c) * lit(coefficients(k)(c)))
        .foldLeft(lit(intercepts(k)): Column)(_ + _)
      out(dot, mask).as(tn)
    }
    ff.df.select(ff.idCols.map(col) ++ preds: _*)
  }
}

/** Ridge regression (L2-penalized OLS, intercept unpenalized), d = 2,
  * solved in CLOSED FORM so an external engine can replicate the fit
  * bit-for-bit: the fit aggregate accumulates the nine raw moments
  * n, Σx₁, Σx₂, Σy, Σx₁², Σx₁x₂, Σx₂², Σx₁y, Σx₂y — when the feature
  * and target encodings are integer-valued (the caller's contract,
  * e.g. counts / whole percents / cents), every partial sum is exact
  * and order-independent — then derives the weights with one fixed
  * float op sequence (centered Cramer) that the SQL oracle mirrors
  * verbatim:
  *   a11 = s11 − s1·s1/n + α     a12 = s12 − s1·s2/n
  *   a22 = s22 − s2·s2/n + α     b1 = s1y − s1·sy/n   b2 = s2y − s2·sy/n
  *   w1 = (b1·a22 − b2·a12)/(a11·a22 − a12·a12)
  *   w2 = (a11·b2 − a12·b1)/(a11·a22 − a12·a12)
  *   b0 = sy/n − w1·(s1/n) − w2·(s2/n)
  * Predict is the codegen'd dot product, as in LinearRegression.
  */
final case class RidgeRegression(alpha: Double) extends FeatureEstimator[LinearRegressionModel] {
  def fit(train: DataFrame, featureCols: Seq[String], targetCols: Seq[String]): LinearRegressionModel = {
    require(featureCols.length == 2 && targetCols.length == 1,
      "RidgeRegression ships the closed-form d=2, t=1 solve (the SQL-replicable path)")
    val Seq(x1, x2) = featureCols.map(c => col(c).cast("double"))
    val y = col(targetCols.head).cast("double")
    val r = train.agg(
      count(lit(1)).cast("double").as("n"),
      sum(x1).as("s1"), sum(x2).as("s2"), sum(y).as("sy"),
      sum(x1 * x1).as("s11"), sum(x1 * x2).as("s12"), sum(x2 * x2).as("s22"),
      sum(x1 * y).as("s1y"), sum(x2 * y).as("s2y")).collect()(0)
    val (n, s1, s2, sy) = (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    val (s11, s12, s22, s1y, s2y) =
      (r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7), r.getDouble(8))
    val a11 = s11 - s1 * s1 / n + alpha
    val a12 = s12 - s1 * s2 / n
    val a22 = s22 - s2 * s2 / n + alpha
    val b1 = s1y - s1 * sy / n
    val b2 = s2y - s2 * sy / n
    val w1 = (b1 * a22 - b2 * a12) / (a11 * a22 - a12 * a12)
    val w2 = (a11 * b2 - a12 * b1) / (a11 * a22 - a12 * a12)
    val b0 = sy / n - w1 * (s1 / n) - w2 * (s2 / n)
    LinearRegressionModel(featureCols, targetCols, Seq(b0),
      Seq(Map(featureCols(0) -> w1, featureCols(1) -> w2)))
  }
}
