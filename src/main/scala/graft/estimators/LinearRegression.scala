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
