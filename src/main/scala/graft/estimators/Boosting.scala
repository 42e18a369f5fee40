package graft.estimators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{ContractedOutputs, FeatureFrame, PredictOptions}

/** One deterministic gradient-boosting stage for squared loss — the
  * closed-form core of GBT (Friedman 2001) made ENGINE-REPRODUCIBLE so
  * boosting has a fully value-oracled query next to the invariant-gated
  * MLlib ensemble (`q_gbt_reg`):
  *
  *   F0(x)  = mean(y)                       (the squared-loss base score)
  *   F1(x)  = F0 + lr · tree1(x)            (tree1 fits the residuals)
  *
  * For a depth-1 tree the residual fit is closed-form: variance
  * reduction is shift-invariant (substituting y−c for y leaves the gain
  * numerator n·S_L − n_L·S algebraically unchanged), so tree1's split
  * IS the best depth-1 split on y itself — found by [[CartModel]]'s
  * exact-BigInt search — and each leaf's residual mean is
  * leafMean(y) − mean(y). Hence
  *
  *   F1(x) = (1 − lr)·mean(y) + lr·leafMean(y)
  *
  * with every term a ratio of exact integers (cents), bit-reproducible
  * in SQL. Same determinism contract as [[CartRegression]] (integral
  * targets at `targetScale`, ties on (feature, threshold) asc); same
  * scale posture (tiny fit collect, codegen'd CASE predict — no UDF,
  * no shuffle on the big side).
  */
final case class GradientBoostStage1(
    learningRate: Double = 0.5,
    targetScale: Double = 1.0,
    orderBy: Seq[String]
) extends FeatureEstimator[GradientBoostStage1Model] {

  def fit(train: DataFrame, featureCols: Seq[String], targetCols: Seq[String]): GradientBoostStage1Model = {
    require(targetCols.length == 1, "GradientBoostStage1 is single-target")
    val cart = CartRegression(maxDepth = 1, targetScale, orderBy)
      .fit(train, featureCols, targetCols)
    cart.root match {
      case CartSplit(f, thr, CartLeaf(sl, nl), CartLeaf(sr, nr)) =>
        GradientBoostStage1Model(featureCols, targetCols.head, targetScale,
          learningRate, f, thr, sl, nl, sr, nr)
      case other => throw new IllegalStateException(
        s"stage-1 fit needs a full depth-1 tree, got $other")
    }
  }
}

final case class GradientBoostStage1Model(
    featureNames: Seq[String],
    targetName: String,
    targetScale: Double,
    learningRate: Double,
    fidx: Int,
    thr: Double,
    leftSum: Long, leftN: Int,
    rightSum: Long, rightN: Int
) extends FittedModel with ContractedOutputs {

  /** F1 leaf constants, computed with the SAME float op sequence the SQL
    * oracle uses: mean and leafMean are each (exact Long).toDouble / n /
    * scale, combined as (1−lr)·mean + lr·leaf.
    */
  private def stage(sum: Long, n: Int): Double = {
    val mean = (leftSum + rightSum).toDouble / (leftN + rightN) / targetScale
    val leaf = sum.toDouble / n / targetScale
    (1.0 - learningRate) * mean + learningRate * leaf
  }

  def predict(frame: FeatureFrame, opts: PredictOptions = PredictOptions()): DataFrame = {
    val ff = frame.validated(featureNames)
    val out = outputContract(ff.df.sparkSession, opts)
    val expr = when(col(featureNames(fidx)).cast("double") <= lit(thr),
      lit(stage(leftSum, leftN))).otherwise(lit(stage(rightSum, rightN)))
    ff.df.select(ff.idCols.map(col) :+ out(expr, ff.noDataMask).as(targetName): _*)
  }
}
