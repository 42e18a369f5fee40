package graft.estimators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{ContractedOutputs, FeatureFrame, PredictOptions}

/** A deterministic CART regression tree with ENGINE-REPRODUCIBLE splits —
  * the reference's tree-estimator delegation (`estimator.py:36` wraps any
  * sklearn estimator, trees included) re-expressed so the fitted tree is
  * bit-identical across engines and therefore SQL-oracle-able, unlike the
  * MLlib forest (whose binning/threading make splits engine-specific).
  *
  * Determinism contract:
  *  - target values must be EXACT integers after `targetScale` (e.g.
  *    prices in cents) — split-gain comparisons are then exact rationals;
  *  - the split criterion is classic CART variance reduction, compared in
  *    exact BigInt arithmetic via the identity
  *      gain ∝ (n·S_L − n_L·S)² / (n_L·n_R)
  *    (n, S fixed per node), so no float argmax can flip cross-engine;
  *  - candidate thresholds are midpoints of consecutive DISTINCT feature
  *    values (both engines compute (v1+v2)/2 on identical doubles — the
  *    row partition is identical even though the midpoint is inexact);
  *  - ties break on (feature index asc, threshold asc).
  *
  * Scale posture: fit collects the SMALL training table (estimator
  * contract, `Estimator.scala`); predict is a codegen'd nested CASE —
  * no UDF, no shuffle, no driver involvement on the big side.
  */
final case class CartRegression(
    maxDepth: Int = 2,
    targetScale: Double = 1.0,
    orderBy: Seq[String]
) extends FeatureEstimator[CartModel] {

  def fit(train: DataFrame, featureCols: Seq[String], targetCols: Seq[String]): CartModel = {
    require(targetCols.length == 1, "CartRegression is single-target")
    val data = FitUtil.collectSorted(train, orderBy, featureCols :+ targetCols.head)
    val d = featureCols.length
    val xs = data.map(_.take(d))
    val ys = data.map { r =>
      val y = r(d) * targetScale
      val yl = math.round(y)
      require(math.abs(y - yl) < 1e-6,
        s"target ${r(d)} is not integral at scale $targetScale — exact split search needs integer targets")
      yl
    }
    CartModel(featureCols, targetCols.head, targetScale,
      CartModel.grow(xs, ys, xs.indices.toArray, d, maxDepth))
  }
}

/** Tree node: either a split (feature index, threshold, children) or a
  * leaf carrying the exact integer target sum and count (prediction =
  * sum/count, one double division — bit-identical cross-engine).
  */
sealed trait CartNode
final case class CartSplit(fidx: Int, thr: Double, left: CartNode, right: CartNode) extends CartNode
final case class CartLeaf(sum: Long, n: Int) extends CartNode

object CartModel {

  /** Best split of `rows` (indexes into xs/ys): maximize the exact
    * rational (n·S_L − n_L·S)² / (n_L·n_R); ties to (fidx, thr) asc.
    */
  private def bestSplit(xs: Array[Array[Double]], ys: Array[Long],
                        rows: Array[Int], d: Int): Option[(Int, Double)] = {
    val n = rows.length
    var s = BigInt(0); rows.foreach(r => s += ys(r))
    var best: Option[(Int, Double)] = None
    var bestA = BigInt(0) // gain numerator (n·S_L − n_L·S)²
    var bestB = BigInt(1) // gain denominator n_L·n_R
    for (f <- 0 until d) {
      val order = rows.sortBy(r => xs(r)(f))
      var sl = BigInt(0)
      var i = 0
      while (i < n - 1) {
        sl += ys(order(i))
        val v1 = xs(order(i))(f); val v2 = xs(order(i + 1))(f)
        if (v1 < v2) {
          val nl = i + 1
          val diff = BigInt(n) * sl - BigInt(nl) * s
          val a = diff * diff
          val b = BigInt(nl) * BigInt(n - nl)
          // a/b > bestA/bestB  <=>  a·bestB > bestA·b (exact integers)
          if (best.isEmpty || a * bestB > bestA * b) {
            best = Some((f, (v1 + v2) / 2)); bestA = a; bestB = b
          }
        }
        i += 1
      }
    }
    best
  }

  private[estimators] def grow(xs: Array[Array[Double]], ys: Array[Long],
                               rows: Array[Int], d: Int, depth: Int): CartNode = {
    val leaf = CartLeaf(rows.map(ys(_)).sum, rows.length)
    if (depth == 0) leaf
    else bestSplit(xs, ys, rows, d) match {
      case None => leaf // all features constant on this node
      case Some((f, thr)) =>
        val (l, r) = rows.partition(xs(_)(f) <= thr)
        CartSplit(f, thr, grow(xs, ys, l, d, depth - 1), grow(xs, ys, r, d, depth - 1))
    }
  }
}

final case class CartModel(
    featureNames: Seq[String],
    targetName: String,
    targetScale: Double,
    root: CartNode
) extends FittedModel with ContractedOutputs {

  /** The fitted tree as nested (fidx, thr) splits — exposed so specs and
    * the SQL oracle docs can assert the exact discovered structure.
    */
  def describe: String = {
    def go(nd: CartNode): String = nd match {
      case CartLeaf(s, n)          => s"leaf(sum=$s,n=$n)"
      case CartSplit(f, t, l, r)   => s"split(${featureNames(f)}<=$t, ${go(l)}, ${go(r)})"
    }
    go(root)
  }

  def predict(frame: FeatureFrame, opts: PredictOptions = PredictOptions()): DataFrame = {
    val ff = frame.validated(featureNames)
    val out = outputContract(ff.df.sparkSession, opts)
    def expr(nd: CartNode): Column = nd match {
      case CartLeaf(s, n) => lit(s.toDouble / n / targetScale)
      case CartSplit(f, t, l, r) =>
        when(col(featureNames(f)).cast("double") <= lit(t), expr(l)).otherwise(expr(r))
    }
    ff.df.select(ff.idCols.map(col) :+
      out(expr(root), ff.noDataMask).as(targetName): _*)
  }
}
