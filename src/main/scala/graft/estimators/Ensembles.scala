package graft.estimators

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{RandomForestRegressionModel, RandomForestRegressor => MlRf}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{FeatureFrame, PredictOptions}

/** Arbitrary-estimator delegation (the reference wraps ANY sklearn
  * estimator, `estimator.py:36`): tree ensembles delegate to Spark
  * MLlib, wrapped in the same FeatureEstimator contract so NoData
  * masking, name validation, and output naming behave identically to
  * the native estimators.
  *
  * Scale posture: MLlib RandomForest trains distributed (the train side
  * here is small anyway); transform is a per-row model application with
  * the fitted forest broadcast by MLlib — no shuffle on the predict
  * side.
  */
final case class RandomForestRegression(
    numTrees: Int = 20,
    maxDepth: Int = 6,
    seed: Long = 42
) extends FeatureEstimator[RandomForestWrapModel] {

  def fit(train: DataFrame, featureCols: Seq[String], targetCols: Seq[String]): RandomForestWrapModel = {
    require(targetCols.length == 1, "MLlib RandomForestRegressor is single-target")
    val asm = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("__features")
    val assembled = asm.transform(
      train.withColumn("__label", col(targetCols.head).cast("double")))
    val model = new MlRf()
      .setFeaturesCol("__features").setLabelCol("__label")
      .setPredictionCol("__pred")
      .setNumTrees(numTrees).setMaxDepth(maxDepth).setSeed(seed)
      .fit(assembled)
    RandomForestWrapModel(featureCols, targetCols.head, model)
  }
}

final case class RandomForestWrapModel(
    featureNames: Seq[String],
    targetName: String,
    model: RandomForestRegressionModel
) extends FittedModel {

  def predict(frame: FeatureFrame, opts: PredictOptions = PredictOptions()): DataFrame = {
    val ff = frame.validated(featureNames)
    val mask = ff.noDataMask
    val asm = new VectorAssembler()
      .setInputCols(featureNames.toArray).setOutputCol("__features")
    // masked rows carry a zero vector through the model, then the
    // when(mask, ...) projection replaces their prediction with the fill
    val safe = ff.featureCols.foldLeft(ff.df.withColumn("__mask", mask)) {
      (d, c) => d.withColumn(c, when(col("__mask"), lit(0.0)).otherwise(col(c).cast("double")))
    }
    model.transform(asm.transform(safe))
      .select(ff.idCols.map(col) :+
        when(col("__mask"), lit(opts.noDataOutput)).otherwise(col("__pred")).as(targetName): _*)
  }
}
