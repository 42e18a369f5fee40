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
  test("maxabs scaler divides by max |x| and preserves sign") {
    val in = Seq((1L, -4.0, 1.0), (2L, 2.0, -5.0), (3L, 1.0, 2.5)).toDF("id", "a", "b")
    val m = graft.estimators.MaxAbsScaler().fit(in, Seq("a", "b"))
    val r = m.transform(FeatureFrame(in, Seq("id"), Seq("a", "b"))).orderBy("id").collect()
    assert(r.map(_.getDouble(1)).toSeq == Seq(-1.0, 0.5, 0.25))
    assert(r.map(_.getDouble(2)).toSeq == Seq(0.2, -1.0, 0.5))
  }

  test("maxabs scaler passes constant-zero columns through unchanged (no NaN)") {
    // sklearn MaxAbsScaler maps a zero scale to 1
    val in = Seq((1L, 0.0, 3.0), (2L, 0.0, -6.0)).toDF("id", "z", "b")
    val m = graft.estimators.MaxAbsScaler().fit(in, Seq("z", "b"))
    val r = m.transform(FeatureFrame(in, Seq("id"), Seq("z", "b"))).orderBy("id").collect()
    assert(r.map(_.getDouble(1)).toSeq == Seq(0.0, 0.0))
    assert(r.map(_.getDouble(2)).toSeq == Seq(0.5, -1.0))
  }

  test("winsorizer clamps outside the fitted percentiles and keeps the middle") {
    val in = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "a")
    val m = graft.estimators.Winsorizer(0.05, 0.95).fit(in, Seq("a"))
    val r = m.transform(FeatureFrame(in, Seq("id"), Seq("a"))).orderBy("id").collect()
    val lo = 1.0 + 0.05 * 99 // type-7 percentile of 1..100
    val hi = 1.0 + 0.95 * 99
    assert(r(0).getDouble(1) == lo)   // 1 clamps up
    assert(r(99).getDouble(1) == hi)  // 100 clamps down
    assert(r(49).getDouble(1) == 50.0) // middle untouched
  }

  test("ridge with alpha=0 matches OLS; alpha shrinks toward the mean") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      val x1 = (rnd.nextInt(50) + 1).toDouble; val x2 = (rnd.nextInt(10) + 1).toDouble
      (i.toLong, x1, x2, 5.0 + 3.0 * x1 - 2.0 * x2)
    }
    val df = rows.toDF("id", "x1", "x2", "y")
    val r0 = graft.estimators.RidgeRegression(alpha = 0.0).fit(df, Seq("x1", "x2"), Seq("y"))
    assert(math.abs(r0.coefficients.head("x1") - 3.0) < 1e-8)
    assert(math.abs(r0.coefficients.head("x2") + 2.0) < 1e-8)
    assert(math.abs(r0.intercepts.head - 5.0) < 1e-6)
    val r1 = graft.estimators.RidgeRegression(alpha = 1e6).fit(df, Seq("x1", "x2"), Seq("y"))
    assert(math.abs(r1.coefficients.head("x1")) < math.abs(r0.coefficients.head("x1")))
    assert(math.abs(r1.coefficients.head("x2")) < math.abs(r0.coefficients.head("x2")))
  }

  test("target encoder: seen keys blend toward the prior, unseen keys get it exactly") {
    val fit = Seq(("a", 100.0), ("a", 200.0), ("b", 1000.0)).toDF("k", "y")
    val m = graft.estimators.TargetEncoder("k", "y", smoothing = 1.0).fit(fit)
    val prior = math.floor((100.0 + 200.0 + 1000.0) / 3 + 0.5) // 433
    val apply = Seq((1L, "a"), (2L, "b"), (3L, "zzz")).toDF("id", "k")
    val r = m.transform(apply, Seq("id")).orderBy("id").collect()
    assert(r(0).getDouble(1) == (300.0 + prior) / 3.0)  // (sum + m*prior)/(n + m)
    assert(r(1).getDouble(1) == (1000.0 + prior) / 2.0)
    assert(r(2).getDouble(1) == prior)                  // unseen -> prior
  }
  test("categorical NB: hand-computed smoothed counts and class-ascending ties") {
    // train: f=0 -> mostly "a", f=1 -> mostly "b"
    val fit = Seq((0L, "a"), (0L, "a"), (1L, "a"), (1L, "b"), (1L, "b"))
      .toDF("f", "y")
    val m = graft.estimators.CategoricalNB().fit(fit, Seq("f"), "y")
    val in = Seq((1L, 0L), (2L, 1L), (3L, 99L)).toDF("id", "f")
    val r = m.predict(FeatureFrame(in, Seq("id"), Seq("f"))).orderBy("id").collect()
    // f=0: a -> 3*(2+1)/(3+2)=9/5; b -> 2*(0+1)/(2+2)=1/2  => "a"
    assert(r(0).getString(1) == "a")
    // f=1: a -> 3*(1+1)/5=6/5; b -> 2*(2+1)/4=3/2           => "b"
    assert(r(1).getString(1) == "b")
    // unseen f=99: both fall to the +1 floor: a -> 3/5, b -> 2/4 => "a"
    assert(r(2).getString(1) == "a")
  }

  test("one-hot encoder: fitted categories sorted, unseen encodes to all-zeros") {
    val fit = Seq("r", "g", "b").toDF("c")
    val m = graft.estimators.OneHotEncoder(Seq("c")).fit(fit)
    val in = Seq((1L, "g"), (2L, "zzz")).toDF("id", "c")
    val out = m.transform(in, Seq("id")).orderBy("id")
    assert(out.columns.toSeq == Seq("id", "c_b", "c_g", "c_r"))
    val r = out.collect()
    assert(r(0).getLong(1) == 0 && r(0).getLong(2) == 1 && r(0).getLong(3) == 0)
    assert(r(1).getLong(1) == 0 && r(1).getLong(2) == 0 && r(1).getLong(3) == 0)
  }

  test("one-hot encoder tolerates null categories in fit; nulls encode to all-zeros") {
    val fit = Seq(Some("r"), None, Some("g")).toDF("c")
    val m = graft.estimators.OneHotEncoder(Seq("c")).fit(fit) // must not NPE
    val in = Seq((1L, Some("r")), (2L, Option.empty[String])).toDF("id", "c")
    val out = m.transform(in, Seq("id")).orderBy("id")
    assert(out.columns.toSeq == Seq("id", "c_g", "c_r"))
    val r = out.collect()
    assert(r(0).getLong(1) == 0 && r(0).getLong(2) == 1)
    assert(r(1).getLong(1) == 0 && r(1).getLong(2) == 0)
  }

}
