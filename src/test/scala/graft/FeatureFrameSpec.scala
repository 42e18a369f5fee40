package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{FeatureFrame, FeatureNameError, NoData}

/** A14/A17: feature-name validation and output naming rules
  * (reference `estimator.py:796`, `utils/estimator.py:30`).
  */
class FeatureFrameSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df = Seq(
    (1L, 1.0, 2.0, 9.0),
    (2L, Double.NaN, 3.0, 9.0),
    (3L, 4.0, -1.0, 9.0)
  ).toDF("id", "f1", "f2", "f3")

  test("missing feature at predict time raises") {
    val ff = FeatureFrame(df, Seq("id"), Seq("f1", "f2"))
    val e = intercept[FeatureNameError](ff.validated(Seq("f1", "f2", "fX")))
    assert(e.getMessage.contains("missing: fX"))
  }

  test("unexpected feature at predict time raises") {
    val ff = FeatureFrame(df, Seq("id"), Seq("f1", "f2", "f3"))
    val e = intercept[FeatureNameError](ff.validated(Seq("f1", "f2")))
    assert(e.getMessage.contains("unexpected: f3"))
  }

  test("same features in a different order are reordered to fit order") {
    val ff = FeatureFrame(df, Seq("id"), Seq("f2", "f1"))
    assert(ff.validated(Seq("f1", "f2")).featureCols == Seq("f1", "f2"))
  }

  test("unknown column raises at construction") {
    intercept[FeatureNameError](FeatureFrame(df, Seq("id"), Seq("nope")))
  }

  test("non-numeric feature raises at construction") {
    val d2 = Seq((1L, "x")).toDF("id", "s")
    intercept[FeatureNameError](FeatureFrame(d2, Seq("id"), Seq("s")))
  }

  test("noDataMask: NaN always masks floats; sentinel masks per feature") {
    val ff = FeatureFrame(df, Seq("id"), Seq("f1", "f2"),
      NoData.perFeature(Map("f2" -> -1.0)))
    val masked = ff.df.filter(ff.noDataMask).select("id")
      .collect().map(_.getLong(0)).sorted
    assert(masked.toSeq == Seq(2L, 3L)) // 2: NaN in f1, 3: sentinel in f2
  }

  test("NoData.all applies the sentinel to every feature") {
    val ff = FeatureFrame(df, Seq("id"), Seq("f2", "f3"), NoData.all(9.0))
    val masked = ff.df.filter(ff.noDataMask).count()
    assert(masked == 3) // f3 = 9.0 everywhere
  }

  test("NoData.none masks only NaN/NULL") {
    val ff = FeatureFrame(df, Seq("id"), Seq("f2", "f3"))
    assert(ff.df.filter(ff.noDataMask).count() == 0)
  }

  test("sequential naming matches generate_sequential_names") {
    assert(FeatureFrame.sequentialNames(3, "neighbor") ==
      Seq("neighbor0", "neighbor1", "neighbor2"))
  }
}
