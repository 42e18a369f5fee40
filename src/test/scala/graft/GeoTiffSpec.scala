package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GeoTiff

/** E17/A59: real raster-FILE ingest — canonical GeoTIFF bytes on disk,
  * decoded back through the JDK ImageIO TIFF plugin (pixels) and the
  * javax.imageio.plugins.tiff tag walk (georeference). Mirrors the
  * reference's load-from-disk contract (datasets/_base.py:108
  * `_load_rasters_to_array`) and the dtype-promotion test
  * (tests/test_datasets.py:122 `test_load_rasters_promotes_dtype`).
  */
class GeoTiffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmpDir(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("geotiff_spec")

  test("uint8 roundtrip: encoded bytes decode to the formula pixels and tags") {
    val i = GeoTiff.decode(GeoTiff.encode(0L)) // band 0: uint8
    assert(i.width == 16 && i.height == 12)
    assert(i.bits == 8 && i.sampleFmt == 1 && i.dtype == "uint8")
    assert(i.epsg == 32601)
    assert(i.scaleX == 30.0 && i.scaleY == 30.0)
    assert(i.tieX == 500000.0 && i.tieY == 4200000.0)
    // stats vs the formula, computed independently here
    val vs = for (y <- 0 until 12; x <- 0 until 16)
      yield ((3 * x + 5 * y) % 256).toDouble
    assert(i.nPx == 192 && i.vsum == vs.sum && i.vmin == vs.min && i.vmax == vs.max)
  }

  test("float32 roundtrip: IEEE-float strip decodes exactly (quarter values)") {
    val b = 7L // odd: float32, w=16+7%9=23, h=12+7%7=12
    val i = GeoTiff.decode(GeoTiff.encode(b))
    assert(i.width == 23 && i.height == 12)
    assert(i.bits == 32 && i.sampleFmt == 3 && i.dtype == "float32")
    assert(i.epsg == 32601 + 7)
    val vs = for (y <- 0 until 12; x <- 0 until 23)
      yield ((11 * x + 13 * y + b) % 997).toDouble / 4.0
    assert(i.nPx == 23 * 12 && i.vsum == vs.sum)
    assert(i.vmin == vs.min && i.vmax == vs.max)
  }

  test("loadRaster returns a RasterFrame with file-derived GridMeta") {
    val d = tmpDir()
    val b = 4L
    java.nio.file.Files.write(d.resolve("band_004.tif"), GeoTiff.encode(b))
    val rf = GeoTiff.loadRaster(spark, d.resolve("band_004.tif").toString)
    assert(rf.meta.crs.contains(s"EPSG:${32601 + 4}"))
    assert(rf.meta.transform ==
      Vector(30.0, 0.0, 500000.0 + 960.0 * 4, 0.0, -30.0, 4200000.0 - 480.0 * 4))
    assert(rf.width == 16 + 4 % 9 && rf.height == 12 + 4 % 7)
    // cells come through the distributed binaryFile scan, not the
    // driver-side header probe
    val n = rf.df.count()
    assert(n == rf.width * rf.height)
    val got = rf.df.filter("x = 3 AND y = 2").collect().head.getDouble(2)
    assert(got == ((3 * 3 + 5 * 2 + 7 * 4) % 256).toDouble)
  }

  test("loadStack: aligned multi-file stack with NumPy dtype promotion") {
    // two aligned bands sharing grid + georeference but MIXED dtype:
    // hand-build them by reusing the canonical encoder's band 0 grid
    // (16x12, EPSG:32601) — band ids 0 (uint8) and a float twin can't
    // come from the gate formulas (those vary epsg per band), so write
    // band 0 twice won't promote; instead assert promotion on dtypes
    // directly and alignment on the real fixture
    assert(GeoTiff.promote(Seq("uint8", "uint8")) == "uint8")
    assert(GeoTiff.promote(Seq("uint8", "float32")) == "float32")
    assert(GeoTiff.promote(Seq("float32", "float32")) == "float32")
    val d = tmpDir()
    java.nio.file.Files.write(d.resolve("b0.tif"), GeoTiff.encode(0L))
    java.nio.file.Files.write(d.resolve("b1.tif"), GeoTiff.encode(0L))
    val (cells, meta, dtype) = GeoTiff.loadStack(spark, d.toString)
    assert(meta.crs.contains("EPSG:32601"))
    assert(dtype == "uint8")
    assert(cells.count() == 2L * 16 * 12)
    assert(cells.select("band_id").distinct().count() == 2)
  }

  test("loadStack refuses misaligned rasters loudly") {
    val d = tmpDir()
    java.nio.file.Files.write(d.resolve("b0.tif"), GeoTiff.encode(0L))
    java.nio.file.Files.write(d.resolve("b1.tif"), GeoTiff.encode(1L))
    val e = intercept[IllegalArgumentException] {
      GeoTiff.loadStack(spark, d.toString)
    }
    assert(e.getMessage.contains("misaligned"))
  }

  test("gate query matches the oracle formulas at sf0.001") {
    val df = GeoTiff.qRasterTiff(spark, "/root/testdata/sf0.001").collect()
    assert(df.length == 48)
    assert(df.forall(_.getAs[String]("promoted_dtype") == "float32"))
    val r9 = df.find(_.getLong(0) == 9L).get // odd → float32
    assert(r9.getAs[String]("dtype") == "float32")
    assert(r9.getAs[Long]("epsg") == 32601 + 9)
    val w = 16 + 9 % 9; val h = 12 + 9 % 7
    val vs = for (y <- 0 until h; x <- 0 until w)
      yield ((11 * x + 13 * y + 9) % 997).toDouble / 4.0
    assert(r9.getAs[Long]("n_px") == w * h)
    assert(r9.getAs[Double]("vsum") == vs.sum)
  }
}
