package graft.estimators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.FeatureFrame

/** Categorical Naive Bayes with Laplace (+1) smoothing — sklearn
  * CategoricalNB semantics over integer-valued categorical features.
  *
  * Determinism contract: every fitted statistic is an integer COUNT, so
  * the per-class score is a ratio of two exact integers
  *
  *   score(c) = n_c · Π_i (n_{f_i,c} + 1)   /   Π_i (n_c + V_i)
  *
  * (the shared 1/N prior denominator cancels). Both factors stay exact
  * in a LONG for any train slice where the products < 2^63 (the small
  * fitted-side contract; ~10^5 rows × 3 features is still safe), and
  * the DOUBLE quotient of two exact integers is bit-identical in every
  * IEEE engine — so the argmax (ties → class ascending) is replicable
  * in SQL with no log() libm dependence, unlike the usual log-prob sum.
  *
  * Scale shape: fit is one pass of three GROUP BY aggregates over the
  * small training table; the fitted counts embed in the predict Column
  * as CASE chains (same pattern as CartModel) — predict is pure
  * codegen, no join, no shuffle.
  */
final case class CategoricalNB() {

  /** @param featureCols integer-valued categorical feature columns
    * @param labelCol    string class column
    */
  def fit(train: DataFrame, featureCols: Seq[String], labelCol: String): CategoricalNBModel = {
    val classes = train.groupBy(col(labelCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val perFeature = featureCols.map { f =>
      val rows = train.groupBy(col(labelCol), col(f).cast("long").as("v"))
        .agg(count(lit(1)).as("n")).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val cardinality = rows.keySet.map(_._2).size.toLong
      (f, rows, cardinality)
    }
    CategoricalNBModel(featureCols, labelCol, classes, perFeature)
  }
}

final case class CategoricalNBModel(
    featureNames: Seq[String],
    labelName: String,
    classes: Array[(String, Long)],                          // (class, n_c), class-ascending
    counts: Seq[(String, Map[(String, Long), Long], Long)]   // (feature, (class, value) -> n, V_i)
) {

  /** Smoothed count lookup as a codegen'd CASE chain over the feature
    * value: (n_{f=v, c} + 1), unseen values fall to the +1 floor.
    */
  private def smoothed(f: String, byValue: Map[(String, Long), Long], cls: String): Column = {
    val hits = byValue.collect { case ((c, v), n) if c == cls => (v, n) }.toSeq.sortBy(_._1)
    hits.foldLeft(lit(1L)) { case (acc, (v, n)) =>
      when(col(f).cast("long") === v, lit(n + 1L)).otherwise(acc)
    }
  }

  def predict(frame: FeatureFrame, opts: graft.core.PredictOptions = graft.core.PredictOptions()): DataFrame = {
    val ff = frame.validated(featureNames)
    val mask = ff.noDataMask
    // per-class exact-integer score factors -> one DOUBLE quotient
    val scores = classes.map { case (cls, nC) =>
      val num = counts.map { case (f, byValue, _) => smoothed(f, byValue, cls) }
        .foldLeft(lit(nC): Column)(_ * _)
      val den = counts.map { case (_, _, v) => lit(nC + v): Column }
        .reduceLeft(_ * _)
      num.cast("double") / den.cast("double")
    }
    // argmax, ties -> class ascending (classes is sorted)
    val winner = classes.indices.init.foldRight(lit(classes.last._1): Column) { (i, rest) =>
      val beatsAll = classes.indices.drop(i + 1)
        .map(j => scores(i) >= scores(j)).reduce(_ && _)
      when(beatsAll, lit(classes(i)._1)).otherwise(rest)
    }
    ff.df.select(
      ff.idCols.map(col) :+
        when(mask, lit(null)).otherwise(winner).as("prediction"): _*)
  }
}
