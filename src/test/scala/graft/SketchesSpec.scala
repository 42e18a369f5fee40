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

  test("graft_mg Misra-Gries: contract holds under every partition layout") {
    import spark.implicits._
    // 9 decoy keys × 1000 rows + one hot key with 6000 of 15000 rows:
    // hot count > N/(k+1) for k=8 (15000/9 = 1666) → guaranteed present
    val rows = (0 until 9).flatMap(k => Seq.fill(1000)(k.toLong + 100)) ++
      Seq.fill(6000)(7L)
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = rows.size
    for (parts <- Seq(1, 7, 32)) {
      val df = spark.sparkContext.parallelize(rows.map(Tuple1(_)), parts).toDF("k")
      val est = df.agg(expr("graft_mg(k, 8)")).collect()(0)
        .getMap[Long, Long](0).toMap
      assert(est.size <= 8)
      est.foreach { case (key, e) =>
        assert(e <= exact(key), s"parts=$parts key=$key overestimates") }
      exact.foreach { case (key, t) =>
        assert(t - est.getOrElse(key, 0L) <= n / 9,
          s"parts=$parts key=$key est too low") }
      assert(est.contains(7L), s"hot key missing at parts=$parts")
    }
  }

  test("Misra-Gries kernel bounds hold on random streams and under merge (property sweep)") {
    import graft.functions.expressions.MisraGries
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 20) {
      val k = 2 + rnd.nextInt(10)
      val n = 500 + rnd.nextInt(2000)
      // zipf-ish: low keys much more frequent than high keys
      val keys = Array.fill(n)((rnd.nextInt(30) * rnd.nextDouble()).toLong)
      val exact = keys.groupBy(identity).view.mapValues(_.length.toLong).toMap
      // sequential build
      var whole = scala.collection.mutable.LongMap.empty[Long]
      keys.foreach(key => whole = MisraGries.add(whole, key, k))
      // split build + merge (the distributed path)
      val (l, r) = keys.splitAt(rnd.nextInt(n))
      var a = scala.collection.mutable.LongMap.empty[Long]
      var b = scala.collection.mutable.LongMap.empty[Long]
      l.foreach(key => a = MisraGries.add(a, key, k))
      r.foreach(key => b = MisraGries.add(b, key, k))
      val merged = MisraGries.mergeMaps(a, b, k)
      for (m <- Seq(whole, merged)) {
        assert(m.size <= k)
        m.foreach { case (key, est) => assert(est <= exact(key)) }
        exact.foreach { case (key, t) =>
          assert(t - m.getOrElse(key, 0L) <= n / (k + 1), s"k=$k n=$n key=$key") }
      }
    }
  }

  test("graft_cms Count-Min: one-sided error under every partition layout; SQL probe hits the kernel's cells") {
    import spark.implicits._
    import graft.functions.expressions.CountMin
    val rnd = new scala.util.Random(7)
    val rows = Array.fill(12000)((rnd.nextInt(40) * rnd.nextDouble()).toLong)
    val exact = rows.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val depth = 4
    val width = 64
    def kernelEst(grid: Array[Long], key: Long): Long =
      (0 until depth).map(d => grid(d * width + CountMin.bucket(key, d, width))).min
    for (parts <- Seq(1, 7, 32)) {
      val df = spark.sparkContext.parallelize(rows.toSeq.map(Tuple1(_)), parts).toDF("k")
      val grid = df.agg(expr(s"graft_cms(k, $depth, $width)")).collect()(0)
        .getSeq[Long](0).toArray
      assert(grid.length == depth * width)
      // every row conserves total mass — the elementwise merge loses nothing
      for (d <- 0 until depth)
        assert(grid.slice(d * width, (d + 1) * width).sum == rows.length.toLong,
          s"parts=$parts row=$d mass")
      exact.foreach { case (key, t) =>
        assert(kernelEst(grid, key) >= t, s"parts=$parts key=$key underestimates") }
    }
    // the builtin-SQL probe (element_at + pmod(xxhash64)) reads the SAME
    // cells as the Scala kernel — the composability contract of B71
    val df = rows.toSeq.toDF("k")
    val grid = df.agg(expr(s"graft_cms(k, $depth, $width)")).collect()(0)
      .getSeq[Long](0).toArray
    val sk = df.agg(expr(s"graft_cms(k, $depth, $width)").as("cms"))
    val probed = df.distinct().crossJoin(broadcast(sk))
      .select(col("k"),
        least((0 until depth).map(d =>
          element_at(col("cms"),
            (lit(d * width) + pmod(xxhash64(col("k"), lit(d.toLong)), lit(width)) +
              lit(1)).cast("int"))): _*).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.keys.foreach { key =>
      assert(probed(key) == kernelEst(grid, key), s"SQL probe diverges at $key") }
  }

  test("graft_mg participates in partial aggregation (ObjectHashAggregate)") {
    // the scale contract: each task ships one ≤k-entry summary into the
    // exchange, never raw rows — that requires the partial/final
    // ObjectHashAggregate pair, not a single-node fallback
    val df = spark.range(1000).selectExpr("id % 10 AS k")
    val plan = df.agg(expr("graft_mg(k, 4)"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"no object agg in:\n$plan")
    assert(plan.contains("partial_graft_mg") || plan.toLowerCase.contains("partial"),
      s"no partial aggregation phase in:\n$plan")
  }

  test("graft_cms participates in partial aggregation (ObjectHashAggregate)") {
    val df = spark.range(1000).selectExpr("id % 10 AS k")
    val plan = df.agg(expr("graft_cms(k, 4, 32)"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"no object agg in:\n$plan")
    assert(plan.contains("partial_graft_cms") || plan.toLowerCase.contains("partial"),
      s"no partial aggregation phase in:\n$plan")
  }
}
