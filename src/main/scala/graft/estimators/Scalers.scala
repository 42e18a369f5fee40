package graft.estimators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

import graft.core.{FeatureFrame, PredictOptions}

/** Feature scalers — the reference's `transform`/`inverse_transform`
  * surface (StandardScaler / MinMaxScaler through
  * `FeatureArrayEstimator.transform`, `estimator.py:633`).
  *
  * Spark realization: fit is ONE distributed aggregate over the training
  * table (avg/stddev_pop or min/max — map-side partial aggregation, no
  * raw-data collect beyond d scalars); transform is a pure codegen'd
  * `Column` affine per feature — stays inside WholeStageCodegen, no UDF,
  * no shuffle, scales linearly over input partitions.
  *
  * NoData parity: masked rows (any-feature rule) are filled with
  * `opts.noDataOutput` via a `when` predicate — zero extra cost in the
  * codegen'd path.
  */
sealed trait AffineScalerModel extends FittedTransform {
  def featureNames: Seq[String]
  def outputFeatureNames: Seq[String] = featureNames.map(c => s"$outPrefix$c")
  /** Per-feature (scale, offset): transform = (x - offset) / scale. */
  protected def params: Map[String, (Double, Double)]
  protected def outPrefix: String

  private def affine(ff: FeatureFrame, opts: PredictOptions): DataFrame = {
    val mask = ff.noDataMask
    def out(c: String): Column = {
      val (scale, offset) = params(c)
      val safeScale = if (scale == 0.0) 1.0 else scale
      (col(c) - offset) / safeScale
    }
    ff.df.select(
      ff.idCols.map(col) ++
        ff.featureCols.map(c =>
          when(mask, lit(opts.noDataOutput)).otherwise(out(c)).as(s"$outPrefix$c")): _*)
  }

  def predict(frame: FeatureFrame, opts: PredictOptions = PredictOptions()): DataFrame =
    transform(frame, opts)

  def transform(frame: FeatureFrame, opts: PredictOptions = PredictOptions()): DataFrame =
    affine(frame.validated(featureNames), opts)

  /** Inverse transform over a frame whose feature columns hold SCALED
    * values named `outPrefix + originalName` (reference
    * `inverse_transform`, `estimator.py:633`).
    */
  def inverseTransform(df: DataFrame, idCols: Seq[String]): DataFrame = {
    def in(c: String): Column = {
      val (scale, offset) = params(c)
      val safeScale = if (scale == 0.0) 1.0 else scale
      col(s"$outPrefix$c") * safeScale + offset
    }
    df.select(idCols.map(col) ++ featureNames.map(c => in(c).as(c)): _*)
  }
}

/** (x - mean) / stddev_pop, sklearn StandardScaler semantics. */
final case class StandardScaler(outPrefix: String = "scaled_")
    extends FeatureEstimator[StandardScalerModel] {
  def fit(train: DataFrame, featureCols: Seq[String], targetCols: Seq[String] = Nil): StandardScalerModel = {
    val aggs = featureCols.flatMap(c =>
      Seq(avg(col(c)).as(s"mean_$c"), stddev_pop(col(c)).as(s"std_$c")))
    val r = train.agg(aggs.head, aggs.tail: _*).collect()(0)
    val params = featureCols.zipWithIndex.map { case (c, i) =>
      c -> (r.getDouble(2 * i + 1), r.getDouble(2 * i)) // (scale=std, offset=mean)
    }.toMap
    StandardScalerModel(featureCols, params, outPrefix)
  }
}

final case class StandardScalerModel(
    featureNames: Seq[String],
    protected val params: Map[String, (Double, Double)],
    protected val outPrefix: String
) extends AffineScalerModel

/** (x - min) / (max - min), sklearn MinMaxScaler semantics. */
final case class MinMaxScaler(outPrefix: String = "scaled_")
    extends FeatureEstimator[MinMaxScalerModel] {
  def fit(train: DataFrame, featureCols: Seq[String], targetCols: Seq[String] = Nil): MinMaxScalerModel = {
    val aggs = featureCols.flatMap(c =>
      Seq(min(col(c)).cast("double").as(s"min_$c"), max(col(c)).cast("double").as(s"max_$c")))
    val r = train.agg(aggs.head, aggs.tail: _*).collect()(0)
    val params = featureCols.zipWithIndex.map { case (c, i) =>
      val lo = r.getDouble(2 * i); val hi = r.getDouble(2 * i + 1)
      c -> (hi - lo, lo) // (scale=max-min, offset=min)
    }.toMap
    MinMaxScalerModel(featureCols, params, outPrefix)
  }
}

final case class MinMaxScalerModel(
    featureNames: Seq[String],
    protected val params: Map[String, (Double, Double)],
    protected val outPrefix: String
) extends AffineScalerModel
