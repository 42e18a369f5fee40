package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{FeatureFrame, NoData, PredictOptions}
import graft.estimators.{KNeighborsClassifier, KNeighborsRegressor, StandardScaler}
import graft.operators.Windowed

/** Regressions pinned from the round-1 code review. */
class RegressionFixesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("scaler honors opts.noDataOutput for masked rows") {
    val train = Seq((1L, 0.0), (2L, 2.0), (3L, 4.0)).toDF("id", "a")
    val in = Seq((1L, 1.0), (2L, -5.0)).toDF("id", "a")
    val m = StandardScaler().fit(train, Seq("a"))
    val out = m.transform(
        FeatureFrame(in, Seq("id"), Seq("a"), NoData.all(-5.0)),
        PredictOptions(noDataOutput = -999.0))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(2L) == -999.0)
    assert(out(1L) != -999.0 && !out(1L).isNaN)
  }

  test("weighted kNN averages ALL zero-distance neighbors (sklearn rule)") {
    val tr = Seq((0L, 1.0, 10.0), (1L, 1.0, 20.0), (2L, 5.0, 99.0)).toDF("tid", "x", "y")
    val m = KNeighborsRegressor(k = 3, orderBy = Seq("tid"), weighted = true)
      .fit(tr, Seq("x"), Seq("y"))
    val out = m.predict(FeatureFrame(Seq((9L, 1.0)).toDF("id", "x"), Seq("id"), Seq("x")))
      .collect().head.getDouble(1)
    assert(out == 15.0, s"expected mean of duplicate-point targets, got $out")
  }

  test("classifier orders numeric class values numerically, not lexically") {
    // string sort would give classes ["10", "2"]; a 1-1 vote tie must
    // resolve to the numerically lowest class (2)
    val tr = Seq((0L, 0.0, 2), (1L, 1.0, 10)).toDF("tid", "x", "cls")
    val m = KNeighborsClassifier(k = 2, orderBy = Seq("tid")).fit(tr, Seq("x"), Seq("cls"))
    assert(m.classes == Seq("2", "10"))
    val out = m.predict(FeatureFrame(Seq((9L, 0.5)).toDF("id", "x"), Seq("id"), Seq("x")))
      .collect().head.getString(1)
    assert(out == "2")
  }

  test("asOfJoin keeps payload columns atomic when a field is legitimately NULL") {
    val left = Seq((1L, 12L)).toDF("k", "lts")
    val right = Seq(
      (1L, 1L, Some(7.0), Some(9.0)),
      (1L, 10L, Some(5.0), Option.empty[Double])
    ).toDF("k", "rts", "a", "b")
    val out = Windowed.asOfJoin(left, right, key = "k",
        leftTs = "lts", rightTs = "rts", payload = Seq("a", "b"))
      .collect().head
    // the match is the rts=10 row: a=5.0, b=NULL — b must NOT be
    // backfilled with 9.0 from the older row
    assert(out.getDouble(2) == 5.0)
    assert(out.isNullAt(3), s"payload mixed across rows: $out")
  }
}
