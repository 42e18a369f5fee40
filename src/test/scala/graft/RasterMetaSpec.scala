package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.{GridMeta, RasterFrame}

/** CRS / attrs / history propagation through the raster ops — the
  * reference contract (tests/test_estimator.py:280 test_crs_preserved,
  * parametrized over "EPSG:5070" AND None; features.py:277-284 retains
  * coordinate attrs, appends history, applies keep_attrs=False to
  * global attrs) re-expressed on the [[graft.core.RasterFrame]]
  * carrier.
  */
class RasterMetaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val epsg = GridMeta(
    crs = Some("EPSG:5070"),
    transform = Vector(30.0, 0.0, 1000.0, 0.0, -30.0, 2000.0),
    fillValue = Some(-9999L),
    attrs = Map("sensor" -> "fixture"))

  private def grid(meta: GridMeta) = RasterFrame.synthetic(spark, 24L, 16L, meta)

  test("CRS survives focal -> resample -> map-algebra round trips (EPSG and None)") {
    for (crs <- Seq(Some("EPSG:5070"), None)) {
      val g = grid(epsg.copy(crs = crs))
      val f = g.focalMean3x3()
      val r = f.resample2x()
      val m = r.mapAlgebra(r, "self_diff")((a, b) => a - b)
      assert(m.meta.crs == crs, s"CRS lost through the op chain: ${m.meta.crs}")
    }
  }

  test("history appends op names in order; attrs drop by default, survive keepAttrs") {
    val g = grid(epsg)
    val dropped = g.focalMean3x3().resample2x()
    assert(dropped.meta.history == List("focal_mean_3x3", "resample_2x2_mean"))
    assert(dropped.meta.attrs.isEmpty, "keep_attrs=False default must drop global attrs")
    val kept = g.focalMean3x3(keepAttrs = true).resample2x(keepAttrs = true)
    assert(kept.meta.attrs == Map("sensor" -> "fixture"))
  }

  test("resample scales the affine pixel terms and keeps the origin") {
    val r = grid(epsg).resample2x()
    assert(r.meta.transform.toSeq == Seq(60.0, 0.0, 1000.0, 0.0, -60.0, 2000.0))
    assert(r.width == 12L && r.height == 8L)
  }

  test("fill value: carried through, replaced when an op sets nodata_output") {
    val g = grid(epsg)
    assert(g.resample2x().meta.fillValue.contains(-9999L))
    val refilled = g.focalMean3x3(nodataOutput = Some(-1L))
    assert(refilled.meta.fillValue.contains(-1L))
    // and the fill really lands in the cells: no NULLs remain
    assert(refilled.df.filter(col("v").isNull).count() == 0L)
  }

  test("map algebra refuses misaligned grids (different CRS or transform)") {
    val a = grid(epsg)
    val otherCrs = grid(epsg.copy(crs = Some("EPSG:4326")))
    val otherTransform = grid(epsg.copy(transform = Vector(10.0, 0.0, 0.0, 0.0, -10.0, 0.0)))
    intercept[IllegalArgumentException] { a.mapAlgebra(otherCrs, "x")((p, q) => p + q) }
    intercept[IllegalArgumentException] { a.mapAlgebra(otherTransform, "x")((p, q) => p + q) }
  }

  test("values through the carrier match the bare-DataFrame op shapes") {
    // resample through the wrapper == the A30 gate computation on the same fixture
    val viaWrapper = grid(epsg).resample2x().df
      .select(col("x"), col("y"), round(col("v"), 6).as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
    val bare = graft.sources.Synthetic.rasterGrid(spark, 24L, 16L)
      .groupBy(expr("x div 2").as("x"), expr("y div 2").as("y"))
      .agg((sum(col("v")).cast("double") / count(col("v"))).as("v"))
      .select(col("x"), col("y"), round(col("v"), 6).as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
    assert(viaWrapper == bare)
  }

  test("predict over a RasterFrame keeps CRS/transform, appends 'predict', refits the fill (EPSG and None)") {
    // the reference's test_crs_preserved asserts CRS on ESTIMATOR
    // outputs (tests/test_estimator.py:280-296): y_pred keeps the
    // input grid's georeference, parametrized over a real CRS AND None
    import spark.implicits._
    val train = Seq((100.0, 17.0), (300.0, 42.0), (500.0, 8.0)).toDF("v", "t")
    val model = graft.estimators.KNeighborsRegressor(k = 1).fit(train, Seq("v"), Seq("t"))
    for (crs <- Seq(Some("EPSG:5070"), None)) {
      val g = grid(epsg.copy(crs = crs))
      val y = model.predict(g, graft.core.PredictOptions(noDataOutput = -1.0))
      assert(y.meta.crs == crs, s"predict dropped the CRS: ${y.meta.crs}")
      assert(y.meta.transform == epsg.transform, "predict must not touch the affine transform")
      assert(y.meta.history == List("predict"))
      assert(y.meta.fillValue.contains(-1L), "fill attr must come from nodata_output")
      assert(y.width == g.width && y.height == g.height)
      // values flow: every cell predicted or filled, none NULL
      assert(y.df.filter(col("t").isNull).count() == 0L)
    }
    // NaN nodata_output (the default) leaves no sentinel attr
    val yNaN = model.predict(grid(epsg), graft.core.PredictOptions())
    assert(yNaN.meta.fillValue.isEmpty)
  }

  test("kneighbors over a RasterFrame keeps CRS on the dist/nn bands (EPSG and None)") {
    import spark.implicits._
    val train = Seq((100.0, 17.0), (300.0, 42.0), (500.0, 8.0)).toDF("v", "t")
    val model = graft.estimators.KNeighborsRegressor(k = 2).fit(train, Seq("v"), Seq("t"))
    for (crs <- Seq(Some("EPSG:5070"), None)) {
      val g = grid(epsg.copy(crs = crs))
      val nn = model.kneighbors(g, true, graft.core.PredictOptions(noDataOutput = -1.0), 0)
      assert(nn.meta.crs == crs, s"kneighbors dropped the CRS: ${nn.meta.crs}")
      assert(nn.meta.history == List("kneighbors"))
      val cols = nn.df.columns.toSet
      assert(Set("neighbor0", "neighbor1", "distance0", "distance1").subsetOf(cols),
        s"kneighbors bands missing: $cols")
      // masked (NULL) cells take the -1 id marker; ids otherwise in range
      val bad = nn.df.filter(!col("neighbor0").isin(-1L, 0L, 1L, 2L)).count()
      assert(bad == 0L, s"$bad cells with out-of-range neighbor ids")
    }
  }

  test("predict masks the grid's fill-attr sentinel as input NoData") {
    import spark.implicits._
    // grid fill attr = -9999: a cell holding the sentinel must be
    // masked (features.py:259 infers nodata_input from _FillValue)
    val cells = Seq((0L, 0L, 150L), (1L, 0L, -9999L), (0L, 1L, 450L)).toDF("x", "y", "v")
    val g = graft.core.RasterFrame(cells, 2L, 2L, epsg)
    val train = Seq((100.0, 17.0), (300.0, 42.0), (500.0, 8.0)).toDF("v", "t")
    val model = graft.estimators.KNeighborsRegressor(k = 1).fit(train, Seq("v"), Seq("t"))
    val y = model.predict(g, graft.core.PredictOptions(noDataOutput = -7.0))
    val byCell = y.df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(byCell((0L, 0L)) == 17.0)
    assert(byCell((1L, 0L)) == -7.0, "sentinel cell must take the fill, not a prediction")
    assert(byCell((0L, 1L)) == 8.0)
  }

  test("V2-source-backed frame carries meta and reads the same cells") {
    val v2 = RasterFrame.fromV2(spark, 24L, 16L, epsg)
    assert(v2.meta.crs.contains("EPSG:5070"))
    val a = v2.df.orderBy(col("x"), col("y")).collect().toSeq
    val b = grid(epsg).df.orderBy(col("x"), col("y")).collect().toSeq
    assert(a == b, "V2 stripes and synthetic fixture disagree")
  }
}
