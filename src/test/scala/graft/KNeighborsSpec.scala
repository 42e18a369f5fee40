package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{FeatureFrame, NoData, PredictOptions}
import graft.estimators.{KNeighborsClassifier, KNeighborsRegressor, RadiusNeighborsRegressor}

/** kNN kernel semantics: neighbor order, tie rules, NoData handling —
  * the reference's estimator surface (`estimator.py:119/233/387`).
  */
class KNeighborsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // training set: ids 0..4 at x = 0, 1, 2, 10, 11; y = 10x
  private def train = Seq(
    (0L, 0.0, 0.0), (1L, 1.0, 10.0), (2L, 2.0, 20.0),
    (3L, 10.0, 100.0), (4L, 11.0, 110.0)
  ).toDF("tid", "x", "y")

  private def model(k: Int) =
    KNeighborsRegressor(k = k, orderBy = Seq("tid")).fit(train, Seq("x"), Seq("y"))

  test("predict averages the k nearest targets") {
    val in = Seq((100L, 0.9)).toDF("id", "x")
    val out = model(3).predict(FeatureFrame(in, Seq("id"), Seq("x"))).collect()
    // neighbors of 0.9: x=1 (d=.1), x=0 (d=.9), x=2 (d=1.1) → mean(10,0,20)
    assert(out.head.getDouble(1) == 10.0)
  }

  test("distance ties break on the lower training id") {
    // query at x=1.5 is equidistant from tid=1 (x=1) and tid=2 (x=2)
    val in = Seq((1L, 1.5)).toDF("id", "x")
    val nn = model(1).kneighbors(FeatureFrame(in, Seq("id"), Seq("x"))).collect()
    assert(nn.head.getLong(1) == 1L)
  }

  test("kneighbors returns ids and distances in (distance, id) order") {
    val in = Seq((1L, 10.4)).toDF("id", "x")
    val nn = model(3).kneighbors(FeatureFrame(in, Seq("id"), Seq("x"))).collect().head
    assert((nn.getLong(1), nn.getLong(2), nn.getLong(3)) == ((3L, 4L, 2L)))
    val dists = Seq(nn.getDouble(4), nn.getDouble(5), nn.getDouble(6))
    assert(dists == dists.sorted)
    assert(math.abs(dists.head - 0.4) < 1e-12)
  }

  test("multi-target predict emits one column per target, named by target") {
    val tr = Seq((0L, 0.0, 1.0, 2.0), (1L, 1.0, 3.0, 4.0)).toDF("tid", "x", "y1", "y2")
    val m = KNeighborsRegressor(k = 2, orderBy = Seq("tid")).fit(tr, Seq("x"), Seq("y1", "y2"))
    val out = m.predict(FeatureFrame(Seq((9L, 0.5)).toDF("id", "x"), Seq("id"), Seq("x")))
    assert(out.columns.toSeq == Seq("id", "y1", "y2"))
    val r = out.collect().head
    assert(r.getDouble(1) == 2.0 && r.getDouble(2) == 3.0)
  }

  test("NoData rows are skipped and filled with nodata_output") {
    val in = Seq((1L, 0.9), (2L, Double.NaN), (3L, -5.0)).toDF("id", "x")
    val ff = FeatureFrame(in, Seq("id"), Seq("x"), NoData.all(-5.0))
    val out = model(1).predict(ff, PredictOptions(noDataOutput = -999.0))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 10.0 && out(2L) == -999.0 && out(3L) == -999.0)
  }

  test("classifier majority vote with count-desc class-asc tie rule") {
    // 2 a's and 2 b's among k=4 → tie on count → 'a' (lowest class) wins
    val tr = Seq(
      (0L, 0.0, "b"), (1L, 1.0, "b"), (2L, 2.0, "a"), (3L, 3.0, "a"), (4L, 50.0, "c")
    ).toDF("tid", "x", "cls")
    val m = KNeighborsClassifier(k = 4, orderBy = Seq("tid")).fit(tr, Seq("x"), Seq("cls"))
    val out = m.predict(FeatureFrame(Seq((9L, 1.5)).toDF("id", "x"), Seq("id"), Seq("x")))
    assert(out.collect().head.getString(1) == "a")
  }

  test("predict_proba emits class frequencies as one column per class") {
    val tr = Seq(
      (0L, 0.0, "b"), (1L, 1.0, "b"), (2L, 2.0, "a"), (3L, 50.0, "c")
    ).toDF("tid", "x", "cls")
    val m = KNeighborsClassifier(k = 3, orderBy = Seq("tid")).fit(tr, Seq("x"), Seq("cls"))
    val out = m.predictProba(FeatureFrame(Seq((9L, 1.0)).toDF("id", "x"), Seq("id"), Seq("x")))
    assert(out.columns.toSeq == Seq("id", "p_a", "p_b", "p_c"))
    val r = out.collect().head
    // neighbors of 1.0 with k=3: x=1(b), x=0(b), x=2(a)
    assert(r.getDouble(1) == 1.0 / 3 && r.getDouble(2) == 2.0 / 3 && r.getDouble(3) == 0.0)
  }

  test("kneighbors honors a call-time n_neighbors override") {
    val in = Seq((1L, 10.4)).toDF("id", "x")
    val nn = model(3).kneighbors(FeatureFrame(in, Seq("id"), Seq("x")), nNeighbors = 2)
      .collect().head
    // columns: id, neighbor0, neighbor1, distance0, distance1
    assert(nn.length == 5)
    assert((nn.getLong(1), nn.getLong(2)) == ((3L, 4L)))
  }

  test("unsupervised fit (no targets) supports kneighbors") {
    val m = KNeighborsRegressor(k = 2, orderBy = Seq("tid")).fit(train, Seq("x"))
    val nn = m.kneighbors(FeatureFrame(Seq((1L, 0.2)).toDF("id", "x"), Seq("id"), Seq("x")))
      .collect().head
    assert((nn.getLong(1), nn.getLong(2)) == ((0L, 1L)))
  }

  test("kernel matches brute force on random data") {
    val rnd = new scala.util.Random(7)
    val tr = (0 until 200).map(i => (i.toLong, rnd.nextDouble() * 10, rnd.nextDouble() * 10, rnd.nextDouble()))
      .toDF("tid", "x1", "x2", "y")
    val m = KNeighborsRegressor(k = 5, orderBy = Seq("tid")).fit(tr, Seq("x1", "x2"), Seq("y"))
    val trLocal = tr.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val queries = (0 until 50).map(i => (i.toLong, rnd.nextDouble() * 10, rnd.nextDouble() * 10))
    val in = queries.toDF("id", "x1", "x2")
    val got = m.predict(FeatureFrame(in, Seq("id"), Seq("x1", "x2")))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    queries.foreach { case (qid, a, b) =>
      val expected = trLocal
        .map { case (tid, x1, x2, y) =>
          ((a - x1) * (a - x1) + (b - x2) * (b - x2), tid, y)
        }
        .sortBy(t => (t._1, t._2)).take(5).map(_._3).sum / 5
      assert(math.abs(got(qid) - expected) < 1e-12, s"query $qid")
    }
  }

  test("radius regressor averages the ball, counts it, and NaNs empty balls") {
    val train = Seq((0.0, 10.0), (1.0, 20.0), (2.0, 40.0), (100.0, 99.0))
      .toDF("f", "y")
    val model = RadiusNeighborsRegressor(radius = 1.5, orderBy = Seq("f"))
      .fit(train, Seq("f"), Seq("y"))
    val in = Seq((1L, 1.0), (2L, 50.0)).toDF("id", "f")
    val out = model.predict(FeatureFrame(in, Seq("id"), Seq("f")))
      .orderBy("id").collect()
    // id 1: ball {0,1,2} -> n=3, mean=(10+20+40)/3
    assert(out(0).getLong(1) == 3L)
    assert(math.abs(out(0).getDouble(2) - 70.0 / 3) < 1e-12)
    // id 2: empty ball -> n=0, NaN fill
    assert(out(1).getLong(1) == 0L)
    assert(out(1).getDouble(2).isNaN)
  }

  test("predictWithMissing skips NaN dims with d/n_obs scaling; all-missing rows fill") {
    val train = Seq((0.0, 0.0, 10.0), (10.0, 0.0, 20.0), (0.0, 10.0, 40.0))
      .toDF("f1", "f2", "y")
    val model = KNeighborsRegressor(k = 1, orderBy = Seq("f1", "f2"))
      .fit(train, Seq("f1", "f2"), Seq("y"))
    val in = Seq(
      (1L, Double.NaN, 0.5),     // f1 missing: nearest by f2 alone -> (0,0) or (10,0); tie d2, lower id
      (2L, 9.0, Double.NaN),     // f2 missing: nearest by f1 alone -> (10,0) -> 20
      (3L, Double.NaN, Double.NaN)) // all missing -> fill
      .toDF("id", "f1", "f2")
    val out = model.predictWithMissing(
        FeatureFrame(in, Seq("id"), Seq("f1", "f2")),
        PredictOptions(noDataOutput = -1.0))
      .orderBy("id").collect()
    assert(out(0).getDouble(1) == 10.0) // f2=0.5 closest to rows with f2=0; tie -> lowest id
    assert(out(1).getDouble(1) == 20.0)
    assert(out(2).getDouble(1) == -1.0)
  }

  test("A15 allowCast: integer outputType with a representable fill narrows the output") {
    import org.apache.spark.sql.types.IntegerType
    val in = Seq((1L, 0.9), (2L, Double.NaN)).toDF("id", "x")
    val out = model(1).predict(FeatureFrame(in, Seq("id"), Seq("x")),
        PredictOptions(noDataOutput = -999.0, outputType = Some(IntegerType)))
      .orderBy("id")
    assert(out.schema("y").dataType == IntegerType)
    val rows = out.collect()
    assert(rows(0).getInt(1) == 10 && rows(1).getInt(1) == -999)
  }

  test("A15 allowCast: unrepresentable fill is refused at call time, widened when allowed") {
    import org.apache.spark.sql.types.{DoubleType, IntegerType}
    val in = Seq((1L, 0.9)).toDF("id", "x")
    val frame = FeatureFrame(in, Seq("id"), Seq("x"))
    // default NaN fill does not fit an int output
    intercept[IllegalArgumentException] {
      model(1).predict(frame, PredictOptions(outputType = Some(IntegerType)))
    }
    // allowCast widens back to the natural double (the fill's dtype)
    val widened = model(1).predict(frame,
      PredictOptions(outputType = Some(IntegerType), allowCast = true))
    assert(widened.schema("y").dataType == DoubleType)
    // non-integral sentinel is just as unrepresentable
    intercept[IllegalArgumentException] {
      model(1).predict(frame,
        PredictOptions(noDataOutput = -999.5, outputType = Some(IntegerType)))
    }
  }

  test("A15 checkOutputForNoData counts valid outputs that collide with the fill") {
    // every target is -999, so every VALID prediction equals the fill
    val t = Seq((0L, 0.0, -999.0), (1L, 1.0, -999.0), (2L, 2.0, -999.0))
      .toDF("tid", "x", "y")
    val m = KNeighborsRegressor(k = 1, orderBy = Seq("tid")).fit(t, Seq("x"), Seq("y"))
    val in = Seq((1L, 0.1), (2L, 1.1), (3L, Double.NaN)).toDF("id", "x")
    val out = m.predict(FeatureFrame(in, Seq("id"), Seq("x")),
      PredictOptions(noDataOutput = -999.0, checkOutputForNoData = true))
    out.collect() // the accumulator fills on the action
    assert(m.noDataCollisionCount == 2L, s"got ${m.noDataCollisionCount}")
    // masked row (NaN input) was filled, not counted
    val silent = m.predict(FeatureFrame(in, Seq("id"), Seq("x")),
      PredictOptions(noDataOutput = -999.0))
    silent.collect()
    assert(m.noDataCollisionCount == 0L)
  }
}
