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

  test("V2-source-backed frame carries meta and reads the same cells") {
    val v2 = RasterFrame.fromV2(spark, 24L, 16L, epsg)
    assert(v2.meta.crs.contains("EPSG:5070"))
    val a = v2.df.orderBy(col("x"), col("y")).collect().toSeq
    val b = grid(epsg).df.orderBy(col("x"), col("y")).collect().toSeq
    assert(a == b, "V2 stripes and synthetic fixture disagree")
  }
}
