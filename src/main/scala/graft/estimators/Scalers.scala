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

/** (x - median) / IQR, sklearn RobustScaler semantics — the
  * outlier-resistant scaler. Fit is ONE distributed exact-percentile
  * aggregate (Spark's `percentile` — linear interpolation at
  * p·(n−1), the same type-7 rule DuckDB's quantile_cont and numpy use,
  * so fitted stats are engine-identical); at corpus-scale fit sizes,
  * swap in approx_percentile with a documented tolerance.
  */
final case class RobustScaler(outPrefix: String = "scaled_")
    extends FeatureEstimator[RobustScalerModel] {
  def fit(train: DataFrame, featureCols: Seq[String], targetCols: Seq[String] = Nil): RobustScalerModel = {
    val aggs = featureCols.flatMap(c => Seq(
      percentile(col(c), lit(0.5)).as(s"med_$c"),
      percentile(col(c), lit(0.75)).as(s"q3_$c"),
      percentile(col(c), lit(0.25)).as(s"q1_$c")))
    val r = train.agg(aggs.head, aggs.tail: _*).collect()(0)
    val params = featureCols.zipWithIndex.map { case (c, i) =>
      // IQR in the same op order as the oracle: q3 - q1
      c -> (r.getDouble(3 * i + 1) - r.getDouble(3 * i + 2), r.getDouble(3 * i))
    }.toMap
    RobustScalerModel(featureCols, params, outPrefix)
  }
}

final case class RobustScalerModel(
    featureNames: Seq[String],
    protected val params: Map[String, (Double, Double)],
    protected val outPrefix: String
) extends AffineScalerModel

/** Row-wise L2 normalization, sklearn Normalizer semantics: each row's
  * feature vector divides by its own norm (accumulated in declaration
  * order — bit-identical to a left-associated SQL sum). Stateless (no
  * fit), pure codegen, zero shuffle; all-zero rows pass through
  * unscaled (sklearn's rule).
  */
final case class RowNormalizer(
    featureNames: Seq[String],
    outPrefix: String = "norm_"
) extends FittedTransform with graft.core.ContractedOutputs {
  def outputFeatureNames: Seq[String] = featureNames.map(c => s"$outPrefix$c")

  def predict(frame: FeatureFrame, opts: PredictOptions = PredictOptions()): DataFrame =
    transform(frame, opts)

  def transform(frame: FeatureFrame, opts: PredictOptions = PredictOptions()): DataFrame = {
    val ff = frame.validated(featureNames)
    val contracted = outputContract(ff.df.sparkSession, opts)
    val mask = ff.noDataMask
    val norm = sqrt(featureNames.map(c => col(c) * col(c)).reduce(_ + _))
    val safe = when(norm === 0.0, 1.0).otherwise(norm)
    ff.df.select(
      ff.idCols.map(col) ++
        ff.featureCols.map(c =>
          contracted(col(c) / safe, mask).as(s"$outPrefix$c")): _*)
  }
}

/** Quantile-strategy discretizer, sklearn KBinsDiscretizer shape: fit
  * learns the (nBins−1) interior exact-percentile edges per feature;
  * transform assigns bin = count of edges strictly below x — the same
  * bucket rule the GK-sketch rank path uses, codegen'd as a comparison
  * chain (no UDF, no shuffle).
  */
final case class KBinsDiscretizer(nBins: Int = 5, outPrefix: String = "bin_")
    extends FeatureEstimator[KBinsModel] {
  def fit(train: DataFrame, featureCols: Seq[String], targetCols: Seq[String] = Nil): KBinsModel = {
    require(nBins >= 2, "nBins must be >= 2")
    val probs = (1 until nBins).map(_.toDouble / nBins)
    val aggs = featureCols.flatMap(c =>
      probs.zipWithIndex.map { case (p, j) => percentile(col(c), lit(p)).as(s"e${j}_$c") })
    val r = train.agg(aggs.head, aggs.tail: _*).collect()(0)
    val edges = featureCols.zipWithIndex.map { case (c, i) =>
      c -> probs.indices.map(j => r.getDouble(i * probs.length + j)).toArray
    }.toMap
    KBinsModel(featureCols, edges, outPrefix)
  }
}

final case class KBinsModel(
    featureNames: Seq[String],
    edges: Map[String, Array[Double]],
    outPrefix: String
) extends FittedModel {
  def predict(frame: FeatureFrame, opts: PredictOptions = PredictOptions()): DataFrame = {
    val ff = frame.validated(featureNames)
    val mask = ff.noDataMask
    ff.df.select(
      ff.idCols.map(col) ++
        ff.featureCols.map { c =>
          val bin = edges(c)
            .foldLeft(lit(0))((acc, e) => acc + (col(c) > lit(e)).cast("int"))
          when(mask, lit(null)).otherwise(bin).cast("long").as(s"$outPrefix$c")
        }: _*)
  }
}

/** x / max(|x|), sklearn MaxAbsScaler semantics — preserves sparsity
  * and sign; fit is one min/max aggregate (the max-abs derives from
  * the two exact column extremes, no abs() scan needed).
  */
final case class MaxAbsScaler(outPrefix: String = "scaled_")
    extends FeatureEstimator[MaxAbsScalerModel] {
  def fit(train: DataFrame, featureCols: Seq[String], targetCols: Seq[String] = Nil): MaxAbsScalerModel = {
    val aggs = featureCols.flatMap(c =>
      Seq(min(col(c)).cast("double").as(s"min_$c"), max(col(c)).cast("double").as(s"max_$c")))
    val r = train.agg(aggs.head, aggs.tail: _*).collect()(0)
    val params = featureCols.zipWithIndex.map { case (c, i) =>
      val lo = r.getDouble(2 * i); val hi = r.getDouble(2 * i + 1)
      // sklearn maps a zero scale to 1 so constant-zero columns pass
      // through unchanged instead of emitting NaN/Infinity
      val sc = math.max(math.abs(lo), math.abs(hi))
      c -> (if (sc == 0.0) 1.0 else sc, 0.0) // (scale=max|x|, offset=0)
    }.toMap
    MaxAbsScalerModel(featureCols, params, outPrefix)
  }
}

final case class MaxAbsScalerModel(
    featureNames: Seq[String],
    protected val params: Map[String, (Double, Double)],
    protected val outPrefix: String
) extends AffineScalerModel

/** Percentile clipping (winsorization) — values outside the fitted
  * [p_lo, p_hi] exact percentiles clamp to the boundary. Fit is one
  * distributed exact-percentile aggregate (same type-7 interpolation
  * contract as RobustScaler); transform is a codegen'd
  * greatest(lo, least(hi, x)) with no shuffle.
  */
final case class Winsorizer(pLo: Double = 0.05, pHi: Double = 0.95,
    outPrefix: String = "w_") extends FeatureEstimator[WinsorizerModel] {
  def fit(train: DataFrame, featureCols: Seq[String], targetCols: Seq[String] = Nil): WinsorizerModel = {
    require(pLo < pHi, "pLo must be < pHi")
    val aggs = featureCols.flatMap(c => Seq(
      percentile(col(c), lit(pLo)).as(s"lo_$c"),
      percentile(col(c), lit(pHi)).as(s"hi_$c")))
    val r = train.agg(aggs.head, aggs.tail: _*).collect()(0)
    val bounds = featureCols.zipWithIndex.map { case (c, i) =>
      c -> (r.getDouble(2 * i), r.getDouble(2 * i + 1))
    }.toMap
    WinsorizerModel(featureCols, bounds, outPrefix)
  }
}

final case class WinsorizerModel(
    featureNames: Seq[String],
    bounds: Map[String, (Double, Double)],
    outPrefix: String
) extends FittedTransform with graft.core.ContractedOutputs {
  def outputFeatureNames: Seq[String] = featureNames.map(c => s"$outPrefix$c")

  def predict(frame: FeatureFrame, opts: PredictOptions = PredictOptions()): DataFrame =
    transform(frame, opts)

  def transform(frame: FeatureFrame, opts: PredictOptions = PredictOptions()): DataFrame = {
    val ff = frame.validated(featureNames)
    val contracted = outputContract(ff.df.sparkSession, opts)
    val mask = ff.noDataMask
    ff.df.select(
      ff.idCols.map(col) ++
        ff.featureCols.map { c =>
          val (lo, hi) = bounds(c)
          contracted(greatest(lit(lo), least(lit(hi), col(c))), mask).as(s"$outPrefix$c")
        }: _*)
  }
}

/** Mean/median imputation, sklearn SimpleImputer semantics: fit learns
  * each feature's fill from the OBSERVED (non-null, non-NaN) training
  * values; transform replaces missing entries with the fill, leaving
  * observed values untouched. Mean fills are exact for integer-valued
  * features (sum/count of exact integers — the determinism contract);
  * median uses the same type-7 exact percentile as RobustScaler.
  */
final case class SimpleImputer(strategy: String = "mean",
    outPrefix: String = "imp_") extends FeatureEstimator[SimpleImputerModel] {
  require(strategy == "mean" || strategy == "median",
    s"unknown SimpleImputer strategy '$strategy'")
  def fit(train: DataFrame, featureCols: Seq[String], targetCols: Seq[String] = Nil): SimpleImputerModel = {
    val observed = featureCols.map(c =>
      when(col(c).isNotNull && !isnan(col(c).cast("double")), col(c).cast("double")))
    val aggs = featureCols.zip(observed).flatMap { case (c, o) =>
      if (strategy == "mean")
        Seq(sum(o).as(s"s_$c"), count(o).cast("double").as(s"n_$c"))
      else
        Seq(percentile(o, lit(0.5)).as(s"s_$c"), lit(1.0).as(s"n_$c"))
    }
    val r = train.agg(aggs.head, aggs.tail: _*).collect()(0)
    val fills = featureCols.zipWithIndex.map { case (c, i) =>
      c -> (if (strategy == "mean") r.getDouble(2 * i) / r.getDouble(2 * i + 1)
            else r.getDouble(2 * i))
    }.toMap
    SimpleImputerModel(featureCols, fills, outPrefix)
  }
}

final case class SimpleImputerModel(
    featureNames: Seq[String],
    fills: Map[String, Double],
    outPrefix: String
) extends FittedTransform {
  def outputFeatureNames: Seq[String] = featureNames.map(c => s"$outPrefix$c")
  def predict(frame: FeatureFrame, opts: PredictOptions = PredictOptions()): DataFrame =
    transform(frame, opts)
  def transform(frame: FeatureFrame, opts: PredictOptions = PredictOptions()): DataFrame = {
    val df = frame.df
    df.select(
      frame.idCols.map(col) ++
        featureNames.map { c =>
          val x = col(c).cast("double")
          when(x.isNull || isnan(x), lit(fills(c))).otherwise(x).as(s"$outPrefix$c")
        }: _*)
  }
}

/** Degree-2 polynomial feature expansion (sklearn PolynomialFeatures,
  * include_bias=false): x₁..x_d → all degree-1 and degree-2 monomials
  * in declaration order. Stateless, pure codegen, zero shuffle.
  */
final case class PolynomialFeatures(featureNames: Seq[String]) {
  /** Output columns: x_i as-is, then x_i*x_j for i <= j, named
    * `p_<i>`/`p_<i>_<j>` over the original names.
    */
  def transform(df: DataFrame, idCols: Seq[String]): DataFrame = {
    val linear = featureNames.map(c => col(c).cast("double").as(s"p_$c"))
    val quads = for {
      i <- featureNames.indices; j <- i until featureNames.length
    } yield (col(featureNames(i)).cast("double") * col(featureNames(j)).cast("double"))
      .as(s"p_${featureNames(i)}_${featureNames(j)}")
    df.select(idCols.map(col) ++ linear ++ quads: _*)
  }
}
