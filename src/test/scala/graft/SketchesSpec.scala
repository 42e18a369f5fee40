package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Approximate aggregates: bounded error vs exact computations. */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("sketched quantiles and distincts stay within their error bounds") {
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    val df = (0 until 20000).map(i => (i.toLong % 4, rnd.nextDouble() * 1000, rnd.nextInt(500).toLong))
      .toDF("k", "x", "v")

    val Array(q50, q95) = Sketches.quantiles(df, "x", Array(0.5, 0.95), relErr = 0.01)
    assert(math.abs(q50 - 500) < 30 && math.abs(q95 - 950) < 30)

    val exact = df.groupBy("k").agg(countDistinct("v").as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val approx = Sketches.approxDistinctPerKey(df, Seq("k"), "v", rsd = 0.02)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, d) =>
      assert(math.abs(approx(k) - d).toDouble / d < 0.1, s"key $k: $d vs ${approx(k)}")
    }

    val p = Sketches.percentilePerKey(df, Seq("k"), "x", 0.5)
      .collect().map(_.getDouble(1))
    p.foreach(v => assert(math.abs(v - 500) < 40))
  }
}
