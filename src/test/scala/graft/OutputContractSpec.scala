package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

import graft.core.{FeatureFrame, PredictOptions}
import graft.estimators.{CartRegression, KNeighborsClassifier, LinearRegression,
  PCA, RandomForestRegression}

/** A15 contract coverage across EVERY model type (not just kNN/scalers):
  * outputType narrowing, call-time fill rejection, loud rejection where
  * the contract cannot apply, and the Long-boundary representability fix.
  */
class OutputContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val train = Seq(
    (0L, 1.0, 2.0, 10.0), (1L, 2.0, 1.0, 20.0),
    (2L, 3.0, 4.0, 30.0), (3L, 4.0, 3.0, 40.0))
    .toDF("id", "f1", "f2", "y")
  private lazy val in = Seq((1L, 1.1, 2.1), (2L, Double.NaN, 0.0)).toDF("id", "f1", "f2")
  private def frame = FeatureFrame(in, Seq("id"), Seq("f1", "f2"))
  private val intOpts = PredictOptions(noDataOutput = -9.0, outputType = Some(IntegerType))

  test("CART, LinearRegression, PCA, and MLlib wraps honor outputType and fill") {
    val feats = Seq("f1", "f2")
    val cart = CartRegression(maxDepth = 1, orderBy = Seq("id")).fit(train, feats, Seq("y"))
    val lin  = LinearRegression().fit(train, feats, Seq("y"))
    val rf   = RandomForestRegression(numTrees = 3, maxDepth = 2).fit(train, feats, Seq("y"))
    for (m <- Seq(cart, lin, rf)) {
      val out = m.predict(frame, intOpts).orderBy("id").collect()
      val dt = m.predict(frame, intOpts).schema.fields.last.dataType
      assert(dt == IntegerType, s"${m.getClass.getSimpleName} ignored outputType")
      assert(out(1).getInt(1) == -9, s"${m.getClass.getSimpleName} ignored the fill")
      // unrepresentable fill rejected at CALL time on every model
      intercept[IllegalArgumentException] {
        m.predict(frame, PredictOptions(outputType = Some(IntegerType)))
      }
    }
    val pca = PCA(1).fit(train, feats)
    val pOut = pca.transform(frame, intOpts).orderBy("id").collect()
    assert(pca.transform(frame, intOpts).schema("pc1").dataType == IntegerType)
    assert(pOut(1).getInt(1) == -9)
  }

  test("classifier string prediction rejects numeric-contract options loudly") {
    val t = Seq((0L, 1.0, "a"), (1L, 2.0, "b")).toDF("id", "f1", "cls")
    val m = KNeighborsClassifier(k = 1).fit(t, Seq("f1"), Seq("cls"))
    val f = FeatureFrame(Seq((1L, 1.1)).toDF("id", "f1"), Seq("id"), Seq("f1"))
    intercept[IllegalArgumentException] {
      m.predict(f, PredictOptions(outputType = Some(IntegerType)))
    }
    intercept[IllegalArgumentException] {
      m.predict(f, PredictOptions(checkOutputForNoData = true))
    }
    // predictProba carries the contract instead
    val proba = m.predictProba(f, intOpts)
    assert(proba.schema("p_a").dataType == IntegerType)
  }

  test("2^63 is not LongType-representable (Spark cast would clamp it)") {
    val twoTo63 = 9.223372036854776e18
    assert(!PredictOptions.representable(twoTo63, LongType))
    assert(PredictOptions.representable(Long.MinValue.toDouble, LongType))
    assert(PredictOptions.representable(9.2233720368547738e18, LongType)) // 2^63 - 1024
    // the refusal surfaces through resolveOutputType
    intercept[IllegalArgumentException] {
      PredictOptions(noDataOutput = twoTo63, outputType = Some(LongType)).resolveOutputType()
    }
    assert(PredictOptions(noDataOutput = twoTo63, outputType = Some(LongType),
      allowCast = true).resolveOutputType() == DoubleType)
  }

  test("NaN fill skips the collision check (reference ufunc/_base.py:453)") {
    val m = LinearRegression().fit(train, Seq("f1", "f2"), Seq("y"))
    val out = m.predict(frame, PredictOptions(checkOutputForNoData = true))
    out.collect()
    assert(m.noDataCollisionCount == 0L)
  }
}
