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

/** TWO exact gradient-boosting stages — the stage-2 residual fit stays
  * engine-reproducible by clearing denominators: with lr = 1/2,
  *
  *   F1 ∈ { (S/n + S_L/n_L)/2, (S/n + S_R/n_R)/2 }      (cents, rational)
  *   D  = 2·n·n_L·n_R
  *   t_i = D·(y_i − F1(side(i)))
  *       = D·y_i − (n_L·n_R·S + n·n_R·S_L)   [left side]
  *       = D·y_i − (n_L·n_R·S + n·n_L·S_R)   [right side]
  *
  * — every t_i an exact Long, and Σt = 0 identically (the boosting
  * residual-sum invariant), which also bounds the HUGEINT gain compare
  * in the SQL replica. Positive scaling doesn't move the variance-
  * reduction argmax, so the depth-1 tree on t IS the residual tree,
  * found by the same exact-BigInt search. The stage-2 leaf value in
  * dollars is lr·(mean t)/D/100, combined per row as
  * F2 = F1-CASE + stage2-CASE with one float op sequence both engines
  * share.
  */
final case class GradientBoostTwoStage(
    targetScale: Double = 1.0,
    orderBy: Seq[String]
) extends FeatureEstimator[GradientBoostTwoStageModel] {
  private val lr = 0.5

  def fit(train: DataFrame, featureCols: Seq[String], targetCols: Seq[String]): GradientBoostTwoStageModel = {
    require(targetCols.length == 1, "GradientBoostTwoStage is single-target")
    val d = featureCols.length
    val data = FitUtil.collectSorted(train, orderBy, featureCols :+ targetCols.head)
    val xs = data.map(_.take(d))
    val ys = data.map { r =>
      val y = r(d) * targetScale
      val yl = math.round(y)
      require(math.abs(y - yl) < 1e-6,
        s"target ${r(d)} is not integral at scale $targetScale")
      yl
    }
    val rows = xs.indices.toArray
    val (f1, t1, sl, nl, sr, nr) = CartModel.grow(xs, ys, rows, d, 1) match {
      case CartSplit(f, t, CartLeaf(a, b), CartLeaf(c, e)) => (f, t, a, b, c, e)
      case other => throw new IllegalStateException(s"stage-1 needs a full depth-1 tree, got $other")
    }
    val n = nl + nr
    val s = sl + sr
    // Cleared-denominator residuals are cubic in n (D = 2·n·n_L·n_R) and
    // multiply cent-scaled targets — past ~10^4 train rows plain Long
    // arithmetic would silently wrap while the HUGEINT oracle errors, a
    // divergent failure. Every product/sum below is *Exact so a scale-up
    // fails LOUDLY (ArithmeticException) instead of fitting a wrong tree;
    // the final require bounds the stage-2 leaf sums Σt the grow() leaves
    // accumulate in Long.
    import java.lang.Math.{addExact, multiplyExact, subtractExact}
    val dd = multiplyExact(multiplyExact(multiplyExact(2L, n.toLong), nl.toLong), nr.toLong)
    val kl = addExact(multiplyExact(multiplyExact(nl.toLong, nr.toLong), s),
      multiplyExact(multiplyExact(n.toLong, nr.toLong), sl))
    val kr = addExact(multiplyExact(multiplyExact(nl.toLong, nr.toLong), s),
      multiplyExact(multiplyExact(n.toLong, nl.toLong), sr))
    val ts = rows.map { i =>
      subtractExact(multiplyExact(dd, ys(i)), if (xs(i)(f1) <= t1) kl else kr)
    }
    val maxAbsT = ts.foldLeft(0L)((m, t) => math.max(m, math.abs(t)))
    require(maxAbsT <= Long.MaxValue / math.max(n, 1),
      s"stage-2 residual sums can exceed Long (n=$n, max|t|=$maxAbsT) — " +
        "reduce targetScale or train-set size")
    val (f2, t2, tl, nl2, tr, nr2) = CartModel.grow(xs, ts, rows, d, 1) match {
      case CartSplit(f, t, CartLeaf(a, b), CartLeaf(c, e)) => (f, t, a, b, c, e)
      case other => throw new IllegalStateException(s"stage-2 needs a full depth-1 tree, got $other")
    }
    GradientBoostTwoStageModel(featureCols, targetCols.head, targetScale, lr,
      f1, t1, sl, nl, sr, nr, dd, f2, t2, tl, nl2, tr, nr2)
  }
}

final case class GradientBoostTwoStageModel(
    featureNames: Seq[String],
    targetName: String,
    targetScale: Double,
    learningRate: Double,
    fidx1: Int, thr1: Double,
    leftSum: Long, leftN: Int, rightSum: Long, rightN: Int,
    dd: Long,
    fidx2: Int, thr2: Double,
    leftT: Long, leftN2: Int, rightT: Long, rightN2: Int
) extends FittedModel with ContractedOutputs {

  /** F1 leaf constants — IDENTICAL op sequence to GradientBoostStage1. */
  private def stage1(sum: Long, n: Int): Double = {
    val mean = (leftSum + rightSum).toDouble / (leftN + rightN) / targetScale
    val leaf = sum.toDouble / n / targetScale
    (1.0 - learningRate) * mean + learningRate * leaf
  }

  /** Stage-2 leaf constants: lr·(mean t)/D in target units. */
  private def stage2(t: Long, n: Int): Double =
    learningRate * (t.toDouble / n / dd.toDouble / targetScale)

  def predict(frame: FeatureFrame, opts: PredictOptions = PredictOptions()): DataFrame = {
    val ff = frame.validated(featureNames)
    val out = outputContract(ff.df.sparkSession, opts)
    val f1 = when(col(featureNames(fidx1)).cast("double") <= lit(thr1),
      lit(stage1(leftSum, leftN))).otherwise(lit(stage1(rightSum, rightN)))
    val f2 = when(col(featureNames(fidx2)).cast("double") <= lit(thr2),
      lit(stage2(leftT, leftN2))).otherwise(lit(stage2(rightT, rightN2)))
    ff.df.select(ff.idCols.map(col) :+ out(f1 + f2, ff.noDataMask).as(targetName): _*)
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
