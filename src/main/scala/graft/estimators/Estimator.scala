package graft.estimators

import org.apache.spark.sql.DataFrame

import graft.core.{FeatureFrame, GridMeta, NoData, PredictOptions, RasterFrame}

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

  /** RasterFrame-in → RasterFrame-out predict — the reference's CRS-
    * preservation contract on ESTIMATOR outputs (tests/
    * test_estimator.py:280-296 `test_crs_preserved`: `estimator
    * .predict(X_image)` keeps `X_image.rio.crs`, parametrized over a
    * real CRS AND None), not just raster→raster ops. The grid's cells
    * are the samples (x, y ride through as the ids), its band columns
    * must carry the fit-time [[featureNames]], the input NoData
    * sentinel comes from the grid's fill attr (features.py:259
    * `_get_default_nodata_mapping` infers nodata from `_FillValue`),
    * and the output meta goes through `after("predict")` with the fill
    * replaced by `opts.noDataOutput` when that is representable as a
    * grid sentinel.
    */
  def predict(raster: RasterFrame, opts: PredictOptions): RasterFrame = {
    val nd = raster.meta.fillValue
      .map(v => NoData.all(v.toDouble)).getOrElse(NoData.none)
    val ff = FeatureFrame(raster.df, Seq("x", "y"), featureNames, nd)
    // the output's fill is ALWAYS opts.noDataOutput — REPLACE the fill
    // attr rather than after()'s carry-through (a NaN fill clears it:
    // the input's sentinel does not describe the prediction band)
    RasterFrame(predict(ff, opts), raster.width, raster.height,
      raster.meta.after("predict")
        .copy(fillValue = GridMeta.integralFill(opts.noDataOutput)))
  }
}

/** A fitted model whose output is itself a feature frame (scalers, PCA) —
  * the composable stage type for [[FeaturePipeline]] (the reference
  * supports sklearn `Pipeline` objects through the same estimator wrap,
  * `estimator.py:523`).
  */
trait FittedTransform extends FittedModel {
  /** Transform a frame; output carries the frame's id columns plus
    * [[outputFeatureNames]].
    */
  def transform(frame: FeatureFrame, opts: PredictOptions = PredictOptions()): DataFrame

  /** Names of the feature columns this transform emits, in order. */
  def outputFeatureNames: Seq[String]
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
  ): Array[Array[Double]] =
    collectSortedWithLabel(train, orderCols, dataCols, labelCol = None, maxRows)._1

  /** As [[collectSorted]], optionally carrying one string column (a
    * class label) through the same sort — classifier and regressor MUST
    * share this comparator so identical data gets identical training
    * ids (the (dist, id) tie-break contract).
    */
  def collectSortedWithLabel(
      train: DataFrame,
      orderCols: Seq[String],
      dataCols: Seq[String],
      labelCol: Option[String],
      maxRows: Int = 1 << 22
  ): (Array[Array[Double]], Array[String]) = {
    import org.apache.spark.sql.functions.col
    val numeric = orderCols ++ dataCols
    val cols = numeric.map(c => col(c).cast("double")) ++
      labelCol.map(c => col(c).cast("string"))
    val rows = train.select(cols: _*).collect()
    require(
      rows.length <= maxRows,
      s"training table has ${rows.length} rows (> $maxRows); " +
        "fit data must be small — it is broadcast to every task")
    val n = orderCols.length
    val collected = rows.map { r =>
      (Array.tabulate(numeric.length)(i => r.getDouble(i)),
       if (labelCol.isDefined) r.getString(numeric.length) else null)
    }
    // total order (Double.compare: NaN high, -0.0 < 0.0) so TimSort's
    // contract holds on any input
    val sorted = collected.sortWith { case ((a, _), (b, _)) =>
      var i = 0; var cmp = 0
      while (i < n && { cmp = java.lang.Double.compare(a(i), b(i)); cmp == 0 }) i += 1
      i < n && cmp < 0
    }
    (sorted.map(_._1.drop(n)), sorted.map(_._2))
  }
}
