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
  * engine-reproducible by QUANTIZING stage-1 predictions back to the
  * target's own integer scale: with lr = 1/2,
  *
  *   F1 ∈ { (1−lr)·S/n + lr·S_L/n_L, … S_R/n_R }   (target units, double)
  *   q_side = ⌊scale·F1_side + 1/2⌋                 (nearest integer unit)
  *   t_i    = y_i − q(side(i))                      (exact small Longs)
  *
  * The ≤½-unit quantization is part of the MODEL DEFINITION, computed
  * with one float op sequence both engines share (the SQL replica does
  * FLOOR(x·scale + 0.5) on the identical double), so the stage-2 split
  * search — the same exact-BigInt variance-reduction argmax — sees
  * bit-identical integer targets cross-engine. Crucially |t_i| is
  * bounded by the DATA RANGE (max|y − q| ≈ the target's spread in
  * integer units), independent of n: the earlier cleared-denominator
  * form (t = D·y − k with D = 2·n·n_L·n_R) is cubic in n and overflows
  * Long past ~10⁴ train rows — and its squared-gain compare overflows
  * even a 128-bit oracle past ~10³ — so this is the formulation that
  * survives any train-set size. The stage-2 leaf value in target units
  * is lr·(mean t)/scale, combined per row as F2 = F1-CASE + stage2-CASE.
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
    // Stage-1 leaf constants with the model's EXACT float op sequence
    // (see GradientBoostTwoStageModel.stage1), then quantized to the
    // nearest integer target unit. math.floor(x + 0.5) matches the SQL
    // oracle's FLOOR(x + 0.5) bit-for-bit on the shared double x; the
    // residuals below are then small exact Longs at ANY n. A final
    // *Exact guards the (astronomically unlikely) |y| near Long.MaxValue.
    import java.lang.Math.subtractExact
    def f1leaf(sum: Long, cnt: Int): Double = {
      val mean = s.toDouble / n / targetScale
      val leaf = sum.toDouble / cnt / targetScale
      (1.0 - lr) * mean + lr * leaf
    }
    val qL = math.floor(f1leaf(sl, nl) * targetScale + 0.5).toLong
    val qR = math.floor(f1leaf(sr, nr) * targetScale + 0.5).toLong
    val ts = rows.map { i =>
      subtractExact(ys(i), if (xs(i)(f1) <= t1) qL else qR)
    }
    val (f2, t2, tl, nl2, tr, nr2) = CartModel.grow(xs, ts, rows, d, 1) match {
      case CartSplit(f, t, CartLeaf(a, b), CartLeaf(c, e)) => (f, t, a, b, c, e)
      case other => throw new IllegalStateException(s"stage-2 needs a full depth-1 tree, got $other")
    }
    GradientBoostTwoStageModel(featureCols, targetCols.head, targetScale, lr,
      f1, t1, sl, nl, sr, nr, f2, t2, tl, nl2, tr, nr2)
  }
}

final case class GradientBoostTwoStageModel(
    featureNames: Seq[String],
    targetName: String,
    targetScale: Double,
    learningRate: Double,
    fidx1: Int, thr1: Double,
    leftSum: Long, leftN: Int, rightSum: Long, rightN: Int,
    fidx2: Int, thr2: Double,
    leftT: Long, leftN2: Int, rightT: Long, rightN2: Int
) extends FittedModel with ContractedOutputs {

  /** F1 leaf constants — IDENTICAL op sequence to GradientBoostStage1. */
  private def stage1(sum: Long, n: Int): Double = {
    val mean = (leftSum + rightSum).toDouble / (leftN + rightN) / targetScale
    val leaf = sum.toDouble / n / targetScale
    (1.0 - learningRate) * mean + learningRate * leaf
  }

  /** Stage-2 leaf constants: lr·(mean t)/scale in target units. */
  private def stage2(t: Long, n: Int): Double =
    learningRate * (t.toDouble / n / targetScale)

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
