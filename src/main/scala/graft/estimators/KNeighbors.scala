package graft.estimators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.core.{FeatureFrame, PredictOptions}

/** k-nearest-neighbor estimators — the reference's canonical workload
  * (KNeighborsRegressor/Classifier wrapped by `estimator.py:119`;
  * `predict_proba` `estimator.py:233`; `kneighbors` `estimator.py:387`).
  *
  * Spark realization: the training matrix is SMALL by construction (the
  * tabular fit side), so it is collected once and broadcast as primitive
  * row-major arrays; each input partition streams through a mapPartitions
  * kernel doing an O(m·d) scan per row into a bounded k-slot insertion
  * buffer. Zero shuffle, zero crossJoin — input partitions are processed
  * independently, so throughput scales linearly with executors at 100 TB.
  * (A crossJoin+window formulation would materialize n×m rows through a
  * shuffle; ruled out at scale.)
  *
  * Determinism: neighbors are ordered by (squaredDistance, trainId)
  * ascending — distance ties break on the training-row id, matching the
  * engine-portable oracle formulation (ROW_NUMBER OVER (ORDER BY dist,
  * tid)). Distance accumulates per-feature in declaration order, so IEEE
  * doubles are bit-identical to a left-associated SQL expression.
  */
private[estimators] final class KnnState(
    val ids: Array[Long],      // m training-row ids (tie-break + kneighbors output)
    val x: Array[Double],      // m*d row-major features
    val y: Array[Double],      // m*t row-major regression targets (empty for cls)
    val yCls: Array[Int],      // m class indices (empty for regression)
    val m: Int,
    val d: Int
) extends Serializable

private[estimators] object KnnKernel {

  /** Fill `outIdx` with the k training-row indices nearest to `q`,
    * ordered by (dist², id) ascending; `outD` gets the squared distances.
    * Returns the neighbor count (min(k, m)).
    */
  def topK(
      q: Array[Double],
      st: KnnState,
      k: Int,
      outIdx: Array[Int],
      outD: Array[Double]
  ): Int = {
    val m = st.m; val d = st.d
    val n = math.min(k, m)
    var filled = 0
    var i = 0
    while (i < m) {
      val base = i * d
      var d2 = 0.0
      var j = 0
      while (j < d) {
        val diff = q(j) - st.x(base + j)
        d2 += diff * diff
        j += 1
      }
      val id = st.ids(i)
      if (filled < n) {
        // insertion sort into the not-yet-full buffer
        var p = filled
        while (p > 0 && (outD(p - 1) > d2 ||
               (outD(p - 1) == d2 && st.ids(outIdx(p - 1)) > id))) {
          outD(p) = outD(p - 1); outIdx(p) = outIdx(p - 1); p -= 1
        }
        outD(p) = d2; outIdx(p) = i
        filled += 1
      } else {
        val lastD = outD(n - 1)
        if (d2 < lastD || (d2 == lastD && id < st.ids(outIdx(n - 1)))) {
          var p = n - 1
          while (p > 0 && (outD(p - 1) > d2 ||
                 (outD(p - 1) == d2 && st.ids(outIdx(p - 1)) > id))) {
            outD(p) = outD(p - 1); outIdx(p) = outIdx(p - 1); p -= 1
          }
          outD(p) = d2; outIdx(p) = i
        }
      }
      i += 1
    }
    n
  }

  /** Read the feature vector of `row` (columns [offset, offset+d)) into
    * `q`; returns true when the row is NoData-masked (NULL, NaN, or the
    * per-feature sentinel — `ufunc/_base.py:26` any-feature rule).
    */
  def readFeatures(
      row: Row,
      offset: Int,
      q: Array[Double],
      sentinels: Array[Double]
  ): Boolean = {
    var masked = false
    var j = 0
    while (j < q.length) {
      if (row.isNullAt(offset + j)) masked = true
      else {
        val v = row.getDouble(offset + j)
        if (java.lang.Double.isNaN(v)) masked = true
        else {
          val s = sentinels(j)
          if (!java.lang.Double.isNaN(s) && v == s) masked = true
        }
        q(j) = v
      }
      j += 1
    }
    masked
  }

  /** Project the frame to (idCols ++ features-as-double) and run the
    * row function built by `mkPart` per partition (so implementations
    * can allocate scratch buffers once per partition, not per row),
    * producing `outFields` appended to the id columns.
    */
  def run(
      frame: FeatureFrame,
      fitNames: Seq[String],
      outFields: Seq[StructField]
  )(mkPart: () => (Row, Int, Array[Double], Boolean) => Row): DataFrame = {
    val ff = frame.validated(fitNames)
    val nId = ff.idCols.length
    val in = graft.sources.Tables.fanOut(ff.df.select(
      (ff.idCols.map(col) ++ ff.featureCols.map(c => col(c).cast("double"))): _*))
    val sentinels = ff.sentinels
    val outSchema = StructType(
      ff.idCols.map(in.schema(_)) ++ outFields)
    val d = ff.featureCols.length
    in.mapPartitions { it =>
      val mkRow = mkPart()
      val q = new Array[Double](d)
      it.map { row =>
        val masked = readFeatures(row, nId, q, sentinels)
        mkRow(row, nId, q, masked)
      }
    }(Encoders.row(outSchema))
  }

  /** Copy id values + payload into one output array (one alloc per row). */
  def outRow(row: Row, nId: Int, payload: Array[Any]): Row = {
    val a = new Array[Any](nId + payload.length)
    var i = 0
    while (i < nId) { a(i) = row.get(i); i += 1 }
    System.arraycopy(payload, 0, a, nId, payload.length)
    Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(a))
  }
}

/** KNeighborsRegressor: multi-target mean-of-neighbors prediction.
  *
  * `orderBy` defines the canonical training-row order (must be a unique
  * key over the training table); row ids are 0-based positions in that
  * order — sklearn's training-index semantics, and the deterministic
  * distance tie-break. Defaults to the feature+target columns.
  *
  * `weighted = true` is sklearn's `weights="distance"`: targets average
  * with weight 1/distance; an exact-match neighbor (distance 0) takes
  * the whole prediction (sklearn's zero-distance rule).
  */
final case class KNeighborsRegressor(
    k: Int = 5, orderBy: Seq[String] = Nil, weighted: Boolean = false)
    extends FeatureEstimator[KnnRegressorModel] {

  def fit(train: DataFrame, featureCols: Seq[String], targetCols: Seq[String]): KnnRegressorModel = {
    val ord = if (orderBy.nonEmpty) orderBy else featureCols ++ targetCols
    val sorted = FitUtil.collectSorted(train, ord, featureCols ++ targetCols)
    val d = featureCols.length; val t = targetCols.length
    val st = new KnnState(
      ids = Array.tabulate(sorted.length)(_.toLong),
      x = sorted.flatMap(_.take(d)),
      y = sorted.flatMap(_.slice(d, d + t)),
      yCls = Array.empty,
      m = sorted.length,
      d = d)
    new KnnRegressorModel(featureCols, targetCols, st, k, weighted)
  }
}

final class KnnRegressorModel private[estimators] (
    val featureNames: Seq[String],
    val targetNames: Seq[String],
    st: KnnState,
    k: Int,
    weighted: Boolean = false
) extends FittedModel {

  def predict(frame: FeatureFrame, opts: PredictOptions = PredictOptions()): DataFrame = {
    val bc = frame.df.sparkSession.sparkContext.broadcast(st)
    val t = targetNames.length
    val outFields = targetNames.map(StructField(_, DoubleType, nullable = false))
    val kk = k
    val isWeighted = weighted // local copy: the closure must not capture `this`
    KnnKernel.run(frame, featureNames, outFields) { () =>
      val s = bc.value
      val idx = new Array[Int](math.min(kk, s.m))
      val d2 = new Array[Double](idx.length)
      val fillPayload: Array[Any] = Array.fill(t)(opts.noDataOutput)
      (row, nId, q, masked) =>
        if (masked) KnnKernel.outRow(row, nId, fillPayload)
        else {
          val n = KnnKernel.topK(q, s, kk, idx, d2)
          val preds = new Array[Any](t)
          // sklearn weights="distance": weight 1/dist; when any neighbor
          // is at distance 0, the prediction is the MEAN of all
          // zero-distance neighbors (they sort first in (dist, id) order)
          var nExact = 0
          if (isWeighted) while (nExact < n && d2(nExact) == 0.0) nExact += 1
          var ti = 0
          while (ti < t) {
            if (isWeighted) {
              if (nExact > 0) {
                var sum = 0.0; var i = 0
                while (i < nExact) { sum += s.y(idx(i) * t + ti); i += 1 }
                preds(ti) = sum / nExact
              } else {
                var num = 0.0; var den = 0.0; var i = 0
                while (i < n) {
                  val w = 1.0 / math.sqrt(d2(i))
                  num += w * s.y(idx(i) * t + ti); den += w
                  i += 1
                }
                preds(ti) = num / den
              }
            } else {
              var sum = 0.0; var i = 0
              while (i < n) { sum += s.y(idx(i) * t + ti); i += 1 }
              preds(ti) = sum / n
            }
            ti += 1
          }
          KnnKernel.outRow(row, nId, preds)
        }
    }
  }

  /** kneighbors (reference `estimator.py:387`): per input row, the k
    * nearest training ids and (optionally) Euclidean distances, as
    * sequentially-named columns (`generate_sequential_names`).
    */
  def kneighbors(frame: FeatureFrame, returnDistance: Boolean = true,
                 opts: PredictOptions = PredictOptions()): DataFrame = {
    val bc = frame.df.sparkSession.sparkContext.broadcast(st)
    val kk = k
    val idFields = FeatureFrame.sequentialNames(kk, "neighbor")
      .map(StructField(_, LongType, nullable = false))
    val dFields =
      if (returnDistance)
        FeatureFrame.sequentialNames(kk, "distance")
          .map(StructField(_, DoubleType, nullable = false))
      else Seq.empty
    val width = if (returnDistance) 2 * kk else kk
    KnnKernel.run(frame, featureNames, idFields ++ dFields) { () =>
      val s = bc.value
      val idx = new Array[Int](math.min(kk, s.m))
      val d2 = new Array[Double](idx.length)
      val fillPayload: Array[Any] = Array.tabulate(width)(i =>
        if (i < kk) -1L else opts.noDataOutput)
      (row, nId, q, masked) =>
        if (masked) KnnKernel.outRow(row, nId, fillPayload)
        else {
          val n = KnnKernel.topK(q, s, kk, idx, d2)
          val payload = new Array[Any](width)
          var i = 0
          while (i < kk) {
            payload(i) = if (i < n) s.ids(idx(i)) else -1L
            if (returnDistance)
              payload(kk + i) = if (i < n) math.sqrt(d2(i)) else opts.noDataOutput
            i += 1
          }
          KnnKernel.outRow(row, nId, payload)
        }
    }
  }
}

/** KNeighborsClassifier: majority vote with sklearn's tie rule
  * (highest count, then lowest class value).
  */
final case class KNeighborsClassifier(k: Int = 5, orderBy: Seq[String] = Nil)
    extends FeatureEstimator[KnnClassifierModel] {

  def fit(train: DataFrame, featureCols: Seq[String], targetCols: Seq[String]): KnnClassifierModel = {
    require(targetCols.length == 1, "classifier takes exactly one target column")
    val ord = if (orderBy.nonEmpty) orderBy else featureCols
    val (feats, labels) = FitUtil.collectSortedWithLabel(
      train, ord, featureCols, labelCol = Some(targetCols.head))
    val d = featureCols.length
    // sklearn's tie rule is "lowest class VALUE": order numerically when
    // every label parses as a number (string sort would put "10" < "2"),
    // lexicographically otherwise
    val distinct = labels.distinct.toSeq
    val asNumbers = distinct.map(c => c -> c.toDoubleOption)
    val classes =
      if (asNumbers.forall(_._2.isDefined)) distinct.sortBy(_.toDouble)
      else distinct.sorted
    val clsIdx = classes.zipWithIndex.toMap
    val st = new KnnState(
      ids = Array.tabulate(feats.length)(_.toLong),
      x = feats.flatten,
      y = Array.empty,
      yCls = labels.map(clsIdx),
      m = feats.length,
      d = d)
    new KnnClassifierModel(featureCols, classes, st, k)
  }
}

final class KnnClassifierModel private[estimators] (
    val featureNames: Seq[String],
    val classes: Seq[String],
    st: KnnState,
    k: Int
) extends FittedModel {

  /** Majority-vote class per row; masked rows get `noDataLabel`. */
  def predict(frame: FeatureFrame, opts: PredictOptions = PredictOptions()): DataFrame =
    predictLabeled(frame, noDataLabel = null)

  def predictLabeled(frame: FeatureFrame, noDataLabel: String): DataFrame = {
    val bc = frame.df.sparkSession.sparkContext.broadcast(st)
    val cls = classes.toArray
    val kk = k
    KnnKernel.run(frame, featureNames,
      Seq(StructField("prediction", StringType, nullable = true))) { () =>
      val s = bc.value
      val idx = new Array[Int](math.min(kk, s.m))
      val d2 = new Array[Double](idx.length)
      val counts = new Array[Int](cls.length)
      val fillPayload: Array[Any] = Array[Any](noDataLabel)
      (row, nId, q, masked) =>
        if (masked) KnnKernel.outRow(row, nId, fillPayload)
        else {
          val n = KnnKernel.topK(q, s, kk, idx, d2)
          java.util.Arrays.fill(counts, 0)
          var i = 0
          while (i < n) { counts(s.yCls(idx(i))) += 1; i += 1 }
          // highest count wins; ties go to the lowest class value (classes
          // are sorted ascending, so first max index wins)
          var best = 0; var c = 1
          while (c < counts.length) { if (counts(c) > counts(best)) best = c; c += 1 }
          KnnKernel.outRow(row, nId, Array[Any](cls(best)))
        }
    }
  }

  /** predict_proba (reference `estimator.py:233`): neighbor class
    * frequencies, one column per class value (classes-as-bands).
    */
  def predictProba(frame: FeatureFrame, opts: PredictOptions = PredictOptions()): DataFrame = {
    val bc = frame.df.sparkSession.sparkContext.broadcast(st)
    val cls = classes.toArray
    val kk = k
    val outFields = cls.map(c => StructField(s"p_$c", DoubleType, nullable = false)).toSeq
    KnnKernel.run(frame, featureNames, outFields) { () =>
      val s = bc.value
      val idx = new Array[Int](math.min(kk, s.m))
      val d2 = new Array[Double](idx.length)
      val counts = new Array[Int](cls.length)
      val fillPayload: Array[Any] = Array.fill(cls.length)(opts.noDataOutput)
      (row, nId, q, masked) =>
        if (masked) KnnKernel.outRow(row, nId, fillPayload)
        else {
          val n = KnnKernel.topK(q, s, kk, idx, d2)
          java.util.Arrays.fill(counts, 0)
          var i = 0
          while (i < n) { counts(s.yCls(idx(i))) += 1; i += 1 }
          val payload = new Array[Any](cls.length)
          var c = 0
          while (c < cls.length) { payload(c) = counts(c).toDouble / n; c += 1 }
          KnnKernel.outRow(row, nId, payload)
        }
    }
  }
}
