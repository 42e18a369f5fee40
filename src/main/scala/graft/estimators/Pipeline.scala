package graft.estimators

import org.apache.spark.sql.DataFrame

import graft.core.{FeatureFrame, PredictOptions}

/** Chained-estimator composition — the reference's support for fitting
  * sklearn `Pipeline` objects through the estimator wrap
  * (`estimator.py:523`): zero or more [[FittedTransform]] stages
  * (scalers, PCA) feed one final predictor, fitted and applied as ONE
  * model.
  *
  * Fit: stage i fits on the training table as transformed by stages
  * 0..i−1 (all original columns are carried through each stage, so later
  * stages and the final predictor can still reference raw target /
  * order-by columns). Predict: the input frame flows through the same
  * fitted transforms (only id columns carried), then the predictor.
  *
  * Scale posture: each stage is itself shuffle-free on the big side
  * (affine codegen / projection / broadcast kNN scan), so the composed
  * predict plan is a single pass over the input with no materialization
  * between stages — Catalyst fuses the stage expressions into one
  * WholeStageCodegen span.
  */
final case class FeaturePipeline[M <: FittedModel](
    transformers: Seq[FeatureEstimator[_ <: FittedTransform]],
    predictor: FeatureEstimator[M]
) extends FeatureEstimator[PipelineModel[M]] {

  def fit(train: DataFrame, featureCols: Seq[String], targetCols: Seq[String]): PipelineModel[M] = {
    var df = train
    var feats = featureCols
    val fitted = transformers.map { t =>
      val m = t.fit(df, feats, Nil)
      // carry EVERY current column (raw features included) so order-by /
      // target columns survive to the final fit
      df = m.transform(FeatureFrame(df, df.columns.toSeq, feats))
      feats = m.outputFeatureNames
      m
    }
    PipelineModel(featureCols, fitted, predictor.fit(df, feats, targetCols))
  }
}

final case class PipelineModel[M <: FittedModel](
    featureNames: Seq[String],
    stages: Seq[FittedTransform],
    last: M
) extends FittedModel {

  def predict(frame: FeatureFrame, opts: PredictOptions = PredictOptions()): DataFrame = {
    var ff = frame.validated(featureNames)
    // intermediate stages ALWAYS fill masked rows with NaN: NaN is the
    // one fill the next stage's FeatureFrame re-masks automatically
    // (float NaN rule), so the mask propagates. Writing the caller's
    // noDataOutput here (e.g. -999) would make the sentinel look like
    // valid feature data downstream and masked rows would get a real
    // prediction computed from garbage. The caller's fill applies only
    // at the final predictor stage — as do outputType (a float/int cast
    // on INTERMEDIATE features would lose precision or reject the NaN
    // fill outright) and the collision check (NaN fills skip it anyway,
    // and the caller asked about the final output, not stage internals).
    val interOpts = opts.copy(noDataOutput = Double.NaN,
      outputType = scala.None, checkOutputForNoData = false)
    stages.foreach { m =>
      ff = FeatureFrame(m.transform(ff, interOpts), ff.idCols, m.outputFeatureNames)
    }
    last.predict(ff, opts)
  }
}
