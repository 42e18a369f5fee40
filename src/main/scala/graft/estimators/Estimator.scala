package graft.estimators

import org.apache.spark.sql.DataFrame

import graft.core.{FeatureFrame, PredictOptions}

/** The engine's estimator contract, mirroring the reference's wrap of any
  * sklearn estimator (`FeatureArrayEstimator`, `estimator.py:36`): fit on
  * a SMALL tabular DataFrame, then predict over an arbitrarily large
  * [[FeatureFrame]].
  *
  * Scale posture: `fit` may collect the training table to the driver
  * (it is small by construction — the reference fits on field plots, not
  * rasters); `predict` NEVER collects, never shuffles the big side — all
  * models broadcast their fitted state and stream the input partitions
  * through codegen'd Column expressions or a mapPartitions kernel.
  */
trait FeatureEstimator[M <: FittedModel] {
  /** Fit on a small tabular DataFrame. `featureCols` become the fit-time
    * feature names validated at predict time; `targetCols` drive output
    * naming (reference `generate_sequential_names` / target-name rules).
    */
  def fit(train: DataFrame, featureCols: Seq[String], targetCols: Seq[String]): M
}

trait FittedModel {
  /** Fit-time feature names, in order. */
  def featureNames: Seq[String]

  /** Predict over a large frame; input features are validated and
    * reordered against [[featureNames]]; masked rows (per the frame's
    * NoData config) are filled with `opts.noDataOutput`.
    */
  def predict(frame: FeatureFrame, opts: PredictOptions = PredictOptions()): DataFrame
}

private[estimators] object FitUtil {
  /** Collect a small training table and sort it into the canonical order
    * defined by `orderCols` (lexicographic on their double values).
    * Training-row ids are the 0-based positions in this order — the
    * engine's analogue of sklearn's training-set row indices, and the
    * deterministic distance tie-break. Guarded: the fit side must
    * actually be small (it is broadcast to every task).
    *
    * Returns the rows' `dataCols` values, sorted.
    */
  def collectSorted(
      train: DataFrame,
      orderCols: Seq[String],
      dataCols: Seq[String],
      maxRows: Int = 1 << 22
  ): Array[Array[Double]] = {
    import org.apache.spark.sql.functions.col
    val all = orderCols ++ dataCols
    val rows = train.select(all.map(c => col(c).cast("double")): _*).collect()
    require(
      rows.length <= maxRows,
      s"training table has ${rows.length} rows (> $maxRows); " +
        "fit data must be small — it is broadcast to every task")
    val n = orderCols.length
    implicit val lexicographic: Ordering[Array[Double]] =
      (a: Array[Double], b: Array[Double]) => {
        var i = 0
        while (i < n && a(i) == b(i)) i += 1
        if (i == n) 0 else java.lang.Double.compare(a(i), b(i))
      }
    rows
      .map(r => Array.tabulate(all.length)(i => r.getDouble(i)))
      .sorted
      .map(_.drop(n))
  }
}
