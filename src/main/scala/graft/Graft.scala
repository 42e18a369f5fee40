package graft

import org.apache.spark.ml.{Estimator, Model, Transformer}
import org.apache.spark.sql.DataFrame

import graft.estimators.{FeatureEstimator, MLlibDelegate, MLlibWrapModel}

/** Top-level facade — the reference's public API is exactly
  * `wrap(estimator)` + the wrapped estimator class
  * (`sklearn_raster/__init__.py`); this is the Spark-native analogue:
  * wrap ANY Spark ML estimator exposing the standard
  * featuresCol/labelCol/predictionCol params into the
  * fit-small/predict-big [[graft.estimators.FeatureEstimator]] contract
  * (NoData masking, feature-name validation, output naming included).
  *
  * The native estimators (KNeighbors*, scalers, LinearRegression, PCA)
  * remain the preferred path — they fit with distributed aggregates and
  * predict in codegen/kernels — `wrap` is the escape hatch for
  * everything else, mirroring the reference's "any sklearn estimator"
  * promise.
  */
object Graft {

  def wrap(estimator: Estimator[_ <: Model[_]]): FeatureEstimator[MLlibWrapModel] =
    WrappedEstimator(estimator)

  private final case class WrappedEstimator(estimator: Estimator[_ <: Model[_]])
      extends FeatureEstimator[MLlibWrapModel] {

    def fit(train: DataFrame, featureCols: Seq[String], targetCols: Seq[String]): MLlibWrapModel = {
      require(targetCols.length == 1, "wrapped Spark ML estimators are single-target")
      MLlibDelegate.fitRegressor(train, featureCols, targetCols.head) { (f, l, p) => df =>
        val pm = org.apache.spark.ml.param.ParamMap(
          estimator.getParam("featuresCol") -> f,
          estimator.getParam("labelCol") -> l,
          estimator.getParam("predictionCol") -> p)
        estimator.fit(df, pm).asInstanceOf[Transformer]
      }
    }
  }
}
