package graft.estimators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

import graft.core.{ContractedOutputs, FeatureFrame, PredictOptions}

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
sealed trait AffineScalerModel extends FittedTransform with ContractedOutputs {
  def featureNames: Seq[String]
  def outputFeatureNames: Seq[String] = featureNames.map(c => s"$outPrefix$c")
  /** Per-feature (scale, offset): transform = (x - offset) / scale. */
  protected def params: Map[String, (Double, Double)]
  protected def outPrefix: String

  private def affine(ff: FeatureFrame, opts: PredictOptions): DataFrame = {
    val contracted = outputContract(ff.df.sparkSession, opts)
    val mask = ff.noDataMask
    def out(c: String): Column = {
      val (scale, offset) = params(c)
      val safeScale = if (scale == 0.0) 1.0 else scale
      (col(c) - offset) / safeScale
    }
    ff.df.select(
      ff.idCols.map(col) ++
        ff.featureCols.map(c =>
          contracted(out(c), mask).as(s"$outPrefix$c")): _*)
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

/** (x - mean) / stddev_pop, sklearn StandardScaler semantics.
  *
  * `exactScales`: opt-in exact-integer fit — for each feature `c` with
  * multiplier m (x·m integral, e.g. 100.0 for currency cents), the fit
  * aggregates n, Σ(x·m), Σ(x·m)² as DECIMAL(38,0) (overflow-proof at
  * any row count) and derives mean/std from those exact integers with
  * a fixed float op sequence. Any engine aggregating the same integers
  * (DuckDB HUGEINT, Spark decimal) lands on bit-identical mean/std —
  * unlike avg/stddev_pop, whose partial-aggregation order drifts by
  * ulps run-to-run and engine-to-engine. Use when downstream consumers
  * (e.g. a kNN ranking in scaled space) are sensitive to last-ulp
  * differences in the fitted stats.
  */
final case class StandardScaler(outPrefix: String = "scaled_",
    exactScales: Map[String, Double] = Map.empty)
    extends FeatureEstimator[StandardScalerModel] {
  def fit(train: DataFrame, featureCols: Seq[String], targetCols: Seq[String] = Nil): StandardScalerModel = {
    if (exactScales.nonEmpty) return fitExact(train, featureCols)
    val aggs = featureCols.flatMap(c =>
      Seq(avg(col(c)).as(s"mean_$c"), stddev_pop(col(c)).as(s"std_$c")))
    val r = train.agg(aggs.head, aggs.tail: _*).collect()(0)
    val params = featureCols.zipWithIndex.map { case (c, i) =>
      c -> (r.getDouble(2 * i + 1), r.getDouble(2 * i)) // (scale=std, offset=mean)
    }.toMap
    StandardScalerModel(featureCols, params, outPrefix)
  }

  private def fitExact(train: DataFrame, featureCols: Seq[String]): StandardScalerModel = {
    val missing = featureCols.filterNot(exactScales.contains)
    require(missing.isEmpty, s"exactScales missing multipliers for: ${missing.mkString(", ")}")
    val aggs = featureCols.flatMap { c =>
      val xi = round(col(c) * exactScales(c), 0).cast("decimal(19,0)")
      Seq(sum(xi.cast("decimal(38,0)")).as(s"s_$c"), sum(xi * xi).as(s"s2_$c"))
    } :+ count(lit(1)).as("n")
    val r = train.agg(aggs.head, aggs.tail: _*).collect()(0)
    val nD = r.getLong(2 * featureCols.length).toDouble
    val params = featureCols.zipWithIndex.map { case (c, i) =>
      val m = exactScales(c)
      // fixed sequence — mirrored verbatim by the SQL oracles:
      // b = S/n; a = S2/n; std = sqrt(a - b*b)/m; mean = b/m
      val b = r.getDecimal(2 * i).doubleValue / nD
      val a = r.getDecimal(2 * i + 1).doubleValue / nD
      c -> (math.sqrt(a - b * b) / m, b / m)
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
