package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.FeatureFrame
import graft.estimators.{LinearRegression, MinMaxScaler, StandardScaler}

/** Scaler + OLS semantics (reference transform/inverse_transform surface,
  * `estimator.py:633`; estimator delegation `estimator.py:36`).
  */
class ScalersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def train = Seq((1L, 0.0, 10.0), (2L, 2.0, 20.0), (3L, 4.0, 30.0))
    .toDF("id", "a", "b")

  test("standard scaler: (x - mean) / stddev_pop") {
    val m = StandardScaler().fit(train, Seq("a", "b"))
    val out = m.transform(FeatureFrame(train, Seq("id"), Seq("a", "b")))
    assert(out.columns.toSeq == Seq("id", "scaled_a", "scaled_b"))
    val r = out.orderBy("id").collect()
    val s = math.sqrt(8.0 / 3) // stddev_pop of {0,2,4}
    assert(math.abs(r(0).getDouble(1) - (-2.0 / s)) < 1e-12)
    assert(math.abs(r(1).getDouble(1)) < 1e-12)
  }

  test("minmax scaler maps min→0, max→1") {
    val m = MinMaxScaler().fit(train, Seq("a"))
    val r = m.transform(FeatureFrame(train, Seq("id"), Seq("a"))).orderBy("id").collect()
    assert(r.map(_.getDouble(1)).toSeq == Seq(0.0, 0.5, 1.0))
  }

  test("inverse_transform roundtrips to the original values") {
    val m = StandardScaler().fit(train, Seq("a", "b"))
    val scaled = m.transform(FeatureFrame(train, Seq("id"), Seq("a", "b")))
    val back = m.inverseTransform(scaled, Seq("id")).orderBy("id").collect()
    assert(math.abs(back(0).getDouble(1) - 0.0) < 1e-12)
    assert(math.abs(back(2).getDouble(2) - 30.0) < 1e-12)
  }

  test("NaN feature rows are masked to NaN output") {
    val in = Seq((1L, 1.0, 2.0), (2L, Double.NaN, 2.0)).toDF("id", "a", "b")
    val m = StandardScaler().fit(train, Seq("a", "b"))
    val r = m.transform(FeatureFrame(in, Seq("id"), Seq("a", "b"))).orderBy("id").collect()
    assert(!r(0).getDouble(1).isNaN)
    assert(r(1).getDouble(1).isNaN && r(1).getDouble(2).isNaN)
  }

  test("OLS recovers exact coefficients on noise-free data") {
    // y = 3 + 2*x1 - 0.5*x2
    val rnd = new scala.util.Random(11)
    val rows = (0 until 100).map { i =>
      val x1 = rnd.nextDouble() * 10; val x2 = rnd.nextDouble() * 5
      (i.toLong, x1, x2, 3.0 + 2.0 * x1 - 0.5 * x2)
    }
    val df = rows.toDF("id", "x1", "x2", "y")
    val m = LinearRegression().fit(df, Seq("x1", "x2"), Seq("y"))
    assert(math.abs(m.intercepts.head - 3.0) < 1e-8)
    assert(math.abs(m.coefficients.head("x1") - 2.0) < 1e-9)
    assert(math.abs(m.coefficients.head("x2") + 0.5) < 1e-9)
    val pred = m.predict(FeatureFrame(df, Seq("id"), Seq("x1", "x2")))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.take(5).foreach { case (id, _, _, y) => assert(math.abs(pred(id) - y) < 1e-8) }
  }

  test("multi-target OLS fits each target independently") {
    val rows = (0 until 50).map { i =>
      val x = i.toDouble
      (i.toLong, x, 1.0 + x, 10.0 - 2 * x)
    }
    val df = rows.toDF("id", "x", "y1", "y2")
    val m = LinearRegression().fit(df, Seq("x"), Seq("y1", "y2"))
    assert(math.abs(m.coefficients(0)("x") - 1.0) < 1e-9)
    assert(math.abs(m.coefficients(1)("x") + 2.0) < 1e-9)
  }
}
