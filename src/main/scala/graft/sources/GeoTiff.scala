package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{GridMeta, RasterFrame}

/** E17/A59: REAL raster-FILE ingest — the reference's first user action
  * (`load_swo_ecoplot` reads 18 GeoTIFFs from disk via rasterio,
  * reference datasets/_base.py:108; dtype promotion across mixed-dtype
  * files is contract-tested in tests/test_datasets.py:122
  * `test_load_rasters_promotes_dtype`; CRS comes FROM the file, not
  * from user input). This module is the Spark-first counterpart under
  * the E2/E8/E9 real-codec discipline:
  *
  *  - WRITE canonical little-endian baseline GeoTIFFs with a
  *    hand-built encoder (single uncompressed strip; baseline tags
  *    256/257/258/259/262/273/277/278/279/339 plus the GeoTIFF tags
  *    33550 ModelPixelScale / 33922 ModelTiepoint / 34735
  *    GeoKeyDirectory) — deterministic integer/quarter pixel formulas
  *    so the oracle can rebuild every pixel AND every header field
  *    without ever seeing a TIFF byte;
  *  - READ the actual FILES back through two independent public JDK
  *    paths: pixel data via the JDK ImageIO TIFF plugin (ships since
  *    Java 9 — `ImageReader.read` into the decoded raster, a genuinely
  *    different byte path from the BMP/PNG/PPM codecs E2/E8/E14
  *    exercise: strip layout, per-sample-format decode, LE order), and the
  *    georeference via `javax.imageio.plugins.tiff.TIFFDirectory` over
  *    the reader's metadata (tag tree → GeoKey walk → EPSG code,
  *    pixel scale + tiepoint → the GDAL-order affine in [[GridMeta]]).
  *
  * Files cross a real filesystem boundary (written to a scratch dir,
  * read back via Spark's `binaryFile` source in executors), so the
  * gate proves write → bytes-on-disk → distributed scan → codec →
  * tag-walk end to end. Float pixels are exact quarters (k/4 with
  * k < 997), so double sums are order-independent and the DuckDB
  * oracle matches bit-for-bit.
  *
  * Scale shape: `binaryFile` plans one input split per file (the same
  * plan shape a 100 TB raster lake gets from a file listing), decode
  * runs inside `mapPartitions` with per-file stats accumulated in the
  * kernel — no per-pixel rows, no payload shuffle; the only exchange
  * is the 48-row stats frame plus one broadcast 1-row dtype-promotion
  * aggregate.
  */
object GeoTiff {

  /** Number of fixture files the gate writes/reads (doc_id < 48 exists
    * at every sf, so the oracle can enumerate the same ids).
    */
  private val GateFiles = 48

  // ---- deterministic fixture formulas (shared with the oracle) ----

  private[graft] def widthOf(b: Long): Int = (16 + b % 9).toInt
  private[graft] def heightOf(b: Long): Int = (12 + b % 7).toInt
  private[graft] def isFloat(b: Long): Boolean = b % 2 == 1
  private[graft] def epsgOf(b: Long): Int = (32601 + b % 60).toInt
  private[graft] def tieXOf(b: Long): Double = 500000.0 + 960.0 * b
  private[graft] def tieYOf(b: Long): Double = 4200000.0 - 480.0 * b
  private val PixelScale = 30.0

  /** uint8 band pixel: (3x + 5y + 7b) mod 256. */
  private def pxU8(b: Long, x: Int, y: Int): Int =
    ((3L * x + 5L * y + 7L * b) % 256).toInt

  /** float32 band pixel: ((11x + 13y + b) mod 997) / 4 — exact
    * quarters, so sums are order-independent in double.
    */
  private def pxF32(b: Long, x: Int, y: Int): Float =
    (((11L * x + 13L * y + b) % 997).toFloat) / 4.0f

  // ---- canonical little-endian GeoTIFF encoder ----

  private final val TShort = 3
  private final val TLong = 4
  private final val TDouble = 12

  /** Encode band `b` as a canonical classic little-endian GeoTIFF:
    * header, single uncompressed strip at offset 8, one IFD, then the
    * out-of-line DOUBLE/SHORT tag payloads. Every byte position is
    * deterministic — the fixture is bit-reproducible across runs.
    */
  private[graft] def encode(b: Long): Array[Byte] = {
    val w = widthOf(b); val h = heightOf(b)
    val flt = isFloat(b)
    val bps = if (flt) 4 else 1
    val stripLen = w * h * bps
    val nEntries = 13
    val ifdOff = 8 + stripLen
    val valOff = ifdOff + 2 + nEntries * 12 + 4
    val scaleOff = valOff
    val tieOff = scaleOff + 3 * 8
    val geoKeyOff = tieOff + 6 * 8
    val total = geoKeyOff + 12 * 2
    val bb = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOff)
    // strip: row-major samples, LE sample bytes (byte order II covers
    // sample data too)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (flt) bb.putFloat(pxF32(b, x, y))
        else bb.put(pxU8(b, x, y).toByte)
        x += 1
      }
      y += 1
    }
    // IFD: entry = tag(2) type(2) count(4) value-or-offset(4), tags
    // ascending; inline values are left-justified in the 4-byte field
    def entry(tag: Int, tpe: Int, count: Int, v: Int): Unit = {
      bb.putShort(tag.toShort).putShort(tpe.toShort).putInt(count)
      if (tpe == TShort && count == 1) { bb.putShort(v.toShort); bb.putShort(0) }
      else bb.putInt(v)
    }
    bb.putShort(nEntries.toShort)
    entry(256, TLong, 1, w)                       // ImageWidth
    entry(257, TLong, 1, h)                       // ImageLength
    entry(258, TShort, 1, bps * 8)                // BitsPerSample
    entry(259, TShort, 1, 1)                      // Compression = none
    entry(262, TShort, 1, 1)                      // Photometric = BlackIsZero
    entry(273, TLong, 1, 8)                       // StripOffsets
    entry(277, TShort, 1, 1)                      // SamplesPerPixel
    entry(278, TLong, 1, h)                       // RowsPerStrip
    entry(279, TLong, 1, stripLen)                // StripByteCounts
    entry(339, TShort, 1, if (flt) 3 else 1)      // SampleFormat
    entry(33550, TDouble, 3, scaleOff)            // ModelPixelScaleTag
    entry(33922, TDouble, 6, tieOff)              // ModelTiepointTag
    entry(34735, TShort, 12, geoKeyOff)           // GeoKeyDirectoryTag
    bb.putInt(0)                                  // next IFD: none
    bb.putDouble(PixelScale).putDouble(PixelScale).putDouble(0.0)
    bb.putDouble(0.0).putDouble(0.0).putDouble(0.0)
      .putDouble(tieXOf(b)).putDouble(tieYOf(b)).putDouble(0.0)
    // GeoKeyDirectory: header (version 1, rev 1.0, 2 keys) then
    // GTModelTypeGeoKey=1 (projected) and ProjectedCSTypeGeoKey=EPSG
    Seq(1, 1, 0, 2, 1024, 0, 1, 1, 3072, 0, 1, epsgOf(b))
      .foreach(v => bb.putShort((v & 0xFFFF).toShort))
    bb.array()
  }

  /** Write the `n`-file fixture into `dir` (band `b` →
    * `dir/band_<b>.tif`). Deterministic content, so overwriting an
    * existing fixture is idempotent.
    */
  private[graft] def writeFixture(dir: java.nio.file.Path, n: Int): Unit = {
    java.nio.file.Files.createDirectories(dir)
    var b = 0L
    while (b < n) {
      java.nio.file.Files.write(dir.resolve(f"band_$b%03d.tif"), encode(b))
      b += 1
    }
  }

  // ---- decode: JDK ImageIO TIFF plugin + TIFFDirectory tag walk ----

  /** Everything the gate publishes about one decoded file: the header
    * fields come from the TIFF tag walk, the pixel stats from the
    * ImageIO raster decode — both over the actual file bytes.
    */
  private[graft] final case class TiffInfo(
      width: Long, height: Long, bits: Long, sampleFmt: Long,
      epsg: Int, scaleX: Double, scaleY: Double, tieX: Double, tieY: Double,
      nPx: Long, vsum: Double, vmin: Double, vmax: Double) {
    def dtype: String = (bits, sampleFmt) match {
      case (8, 1)  => "uint8"
      case (32, 3) => "float32"
      case _       => s"b${bits}f$sampleFmt"
    }
    /** GDAL-order affine from the GeoTIFF scale + tiepoint model. */
    def transform: Vector[Double] =
      Vector(scaleX, 0.0, tieX, 0.0, -scaleY, tieY)
  }

  /** Decode one GeoTIFF payload through the REAL JDK codec: pixels via
    * `ImageReader.read` (the TIFF plugin's strip decoder), header
    * + georeference via `TIFFDirectory` over the reader's native
    * metadata. No formula is consulted — everything is read from the
    * bytes, which is what the oracle then cross-examines.
    */
  private[graft] def decode(payload: Array[Byte]): TiffInfo = {
    javax.imageio.ImageIO.setUseCache(false)
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      require(readers.hasNext, "no JDK TIFF reader available")
      val reader = readers.next()
      try {
        reader.setInput(iis, true, false)
        val dir = javax.imageio.plugins.tiff.TIFFDirectory
          .createFromMetadata(reader.getImageMetadata(0))
        def longTag(tag: Int): Long = {
          val f = dir.getTIFFField(tag)
          require(f != null, s"missing TIFF tag $tag")
          f.getAsLong(0)
        }
        val scaleF = dir.getTIFFField(33550)
        val tieF = dir.getTIFFField(33922)
        val geoF = dir.getTIFFField(34735)
        require(scaleF != null && tieF != null && geoF != null,
          "not a GeoTIFF: missing ModelPixelScale/ModelTiepoint/GeoKeyDirectory")
        // GeoKey walk: 4-short header then (keyId, location, count,
        // value) entries; ProjectedCSTypeGeoKey (3072) carries the EPSG
        val nKeys = geoF.getAsInt(3)
        var epsg = -1
        var k = 0
        while (k < nKeys) {
          val off = 4 + 4 * k
          if (geoF.getAsInt(off) == 3072 && geoF.getAsInt(off + 1) == 0)
            epsg = geoF.getAsInt(off + 3)
          k += 1
        }
        require(epsg > 0, "GeoKeyDirectory has no ProjectedCSTypeGeoKey")
        // read(0), not readRaster: the JDK TIFF plugin decodes to a
        // BufferedImage (gray uint8 / 32-bit float both land in a
        // single-band raster) and does not implement raster-only reads
        val raster = reader.read(0).getRaster
        val w = raster.getWidth; val h = raster.getHeight
        var sum = 0.0
        var mn = Double.PositiveInfinity; var mx = Double.NegativeInfinity
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = raster.getSampleDouble(x, y, 0)
            sum += v
            if (v < mn) mn = v
            if (v > mx) mx = v
            x += 1
          }
          y += 1
        }
        TiffInfo(longTag(256), longTag(257), longTag(258), longTag(339),
          epsg, scaleF.getAsDouble(0), scaleF.getAsDouble(1),
          tieF.getAsDouble(3), tieF.getAsDouble(4),
          w.toLong * h, sum, mn, mx)
      } finally reader.dispose()
    } finally iis.close()
  }

  /** NumPy-style dtype promotion across a file set
    * (`np.result_type`): all-uint8 stays uint8; any float32 in the mix
    * promotes the stack to float32 (the reference's
    * test_load_rasters_promotes_dtype contract).
    */
  private[graft] def promote(dtypes: Iterable[String]): String =
    if (dtypes.exists(_ == "float32")) "float32"
    else if (dtypes.nonEmpty) "uint8" else "empty"

  // ---- the public load path (reference load_swo_ecoplot shape) ----

  /** Load one GeoTIFF FILE from disk into a [[RasterFrame]] whose
    * [[GridMeta]] is entirely file-derived: CRS from the GeoKey
    * directory, affine from pixel scale + tiepoint, cells (x, y, v)
    * from the real codec decode. The reference's `rioxarray
    * .open_rasterio` analogue (datasets/_base.py:108).
    */
  def loadRaster(spark: SparkSession, path: String): RasterFrame = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val info = decode(bytes)
    val cellSchema = StructType(Seq(
      StructField("x", LongType, nullable = false),
      StructField("y", LongType, nullable = false),
      StructField("v", DoubleType, nullable = false)))
    val df = spark.read.format("binaryFile").load(path)
      .select(col("content"))
      .mapPartitions { it =>
        it.flatMap { row =>
          val inf = decode(row.getAs[Array[Byte]](0))
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(row.getAs[Array[Byte]](0)))
          val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
          reader.setInput(iis, true, true)
          val raster = reader.read(0).getRaster
          val out = for {
            y <- 0 until inf.height.toInt
            x <- 0 until inf.width.toInt
          } yield Row(x.toLong, y.toLong, raster.getSampleDouble(x, y, 0))
          reader.dispose(); iis.close()
          out
        }
      }(org.apache.spark.sql.Encoders.row(cellSchema))
    RasterFrame(df, info.width, info.height,
      GridMeta(Some(s"EPSG:${info.epsg}"), info.transform))
  }

  /** Load a DIRECTORY of aligned GeoTIFFs as one stacked band frame —
    * the reference's `_load_rasters_to_array` (datasets/_base.py:108):
    * every file must share shape, CRS, and affine (misalignment
    * refuses loudly), bands keyed by file order, dtype promoted across
    * the set. Returns (cells (band_id, x, y, v), file-derived meta,
    * promoted dtype).
    */
  def loadStack(spark: SparkSession, dir: String): (DataFrame, GridMeta, String) = {
    val listed = new java.io.File(dir).listFiles()
    require(listed != null, s"not a directory: $dir")
    val sorted = listed.toVector
      .filter(_.getName.endsWith(".tif"))
      .sortBy(_.getName)
      .map(_.toPath)
    require(sorted.nonEmpty, s"no .tif files under $dir")
    val infos = sorted.map(p =>
      decode(java.nio.file.Files.readAllBytes(p)))
    val head = infos.head
    infos.zip(sorted).foreach { case (i, p) =>
      require(i.width == head.width && i.height == head.height &&
              i.epsg == head.epsg && i.transform == head.transform,
        s"misaligned raster ${p.getFileName}: ${i.width}x${i.height} " +
          s"EPSG:${i.epsg} vs ${head.width}x${head.height} EPSG:${head.epsg}")
    }
    val dtype = promote(infos.map(_.dtype))
    val cellSchema = StructType(Seq(
      StructField("band_id", LongType, nullable = false),
      StructField("x", LongType, nullable = false),
      StructField("y", LongType, nullable = false),
      StructField("v", DoubleType, nullable = false)))
    val byName = sorted.map(_.getFileName.toString).zipWithIndex.toMap
    val cells = spark.read.format("binaryFile")
      .load(sorted.map(_.toString): _*)
      .select(col("path"), col("content"))
      .mapPartitions { it =>
        it.flatMap { row =>
          val name = row.getString(0).split('/').last
          val band = byName(name).toLong
          val bytes = row.getAs[Array[Byte]](1)
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
          reader.setInput(iis, true, true)
          val raster = reader.read(0).getRaster
          val w = raster.getWidth; val h = raster.getHeight
          val out = for (y <- 0 until h; x <- 0 until w)
            yield Row(band, x.toLong, y.toLong, raster.getSampleDouble(x, y, 0))
          reader.dispose(); iis.close()
          out
        }
      }(org.apache.spark.sql.Encoders.row(cellSchema))
    (cells, GridMeta(Some(s"EPSG:${head.epsg}"), head.transform), dtype)
  }

  // ---- the gate ----

  /** One scratch fixture dir per (JVM, sf): written once, reused by
    * every re-run of the gate in the same session (bench runs each
    * query 4×) — content is deterministic, so reuse is sound.
    */
  private val fixtureDirs =
    new java.util.concurrent.ConcurrentHashMap[String, java.nio.file.Path]()

  private def fixtureDir(dir: String): java.nio.file.Path =
    fixtureDirs.computeIfAbsent(dir, _ => {
      val d = java.nio.file.Files.createTempDirectory("graft_geotiff")
      writeFixture(d, GateFiles)
      d
    })

  /** E17 gate: write 48 real GeoTIFF FILES (mixed uint8/float32, one
    * per doc_id < 48), scan them back with Spark's `binaryFile` source,
    * decode pixels through the JDK TIFF codec and the georeference
    * through the TIFF tag walk, and publish per-file header fields +
    * exact pixel statistics + the NumPy-promoted stack dtype. The
    * oracle recomputes every column from the fixture formulas without
    * touching a TIFF byte — any strip-layout, sample-format, tag-walk,
    * GeoKey, or promotion bug hash-mismatches.
    */
  def qRasterTiff(s: SparkSession, dir: String): DataFrame = {
    val fx = fixtureDir(dir)
    // ids come off the documents table so the gate's row set is the
    // oracle's row set by construction
    val ids = s.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") < GateFiles).select(col("doc_id"))
    val outSchema = StructType(Seq(
      StructField("band_id", LongType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("bits", LongType, nullable = false),
      StructField("sample_fmt", LongType, nullable = false),
      StructField("dtype", StringType, nullable = false),
      StructField("epsg", LongType, nullable = false),
      StructField("scale_x", DoubleType, nullable = false),
      StructField("scale_y", DoubleType, nullable = false),
      StructField("tie_x", DoubleType, nullable = false),
      StructField("tie_y", DoubleType, nullable = false),
      StructField("n_px", LongType, nullable = false),
      StructField("vsum", DoubleType, nullable = false),
      StructField("vmin", DoubleType, nullable = false),
      StructField("vmax", DoubleType, nullable = false)))
    val perFile = s.read.format("binaryFile")
      .load(fx.toString + "/*.tif")
      .select(col("path"), col("content"))
      .mapPartitions { it =>
        it.map { row =>
          val name = row.getString(0).split('/').last
          val band = name.stripPrefix("band_").stripSuffix(".tif").toLong
          val i = decode(row.getAs[Array[Byte]](1))
          Row(band, i.width, i.height, i.bits, i.sampleFmt, i.dtype,
            i.epsg.toLong, i.scaleX, i.scaleY, i.tieX, i.tieY,
            i.nPx, i.vsum, i.vmin, i.vmax)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
    // promotion is COMPUTED from the dtypes read off disk (1-row
    // broadcast), not asserted
    val promoted = perFile
      .agg(max(when(col("dtype") === "float32", 2).otherwise(1)).as("r"))
      .select(when(col("r") === 2, "float32").otherwise("uint8")
        .as("promoted_dtype"))
    perFile
      .join(broadcast(ids), perFile("band_id") === ids("doc_id"))
      .drop("doc_id")
      .crossJoin(broadcast(promoted))
      .orderBy(col("band_id"))
  }

  val oracles: Map[String, String] = Map(
    "q_raster_tiff" ->
      """WITH f AS (SELECT doc_id AS band_id, 16 + doc_id % 9 AS w,
        |    12 + doc_id % 7 AS h FROM documents WHERE doc_id < 48),
        |px AS (SELECT band_id, w, h,
        |    CASE WHEN band_id % 2 = 0
        |      THEN CAST((3*x + 5*y + 7*band_id) % 256 AS DOUBLE)
        |      ELSE CAST((11*x + 13*y + band_id) % 997 AS DOUBLE) / 4.0
        |    END AS v
        |  FROM f, (SELECT unnest(range(25)) AS x), (SELECT unnest(range(19)) AS y)
        |  WHERE x < w AND y < h),
        |st AS (SELECT band_id, w, h, COUNT(*) AS n_px, SUM(v) AS vsum,
        |    MIN(v) AS vmin, MAX(v) AS vmax
        |  FROM px GROUP BY 1, 2, 3)
        |SELECT band_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(CASE WHEN band_id % 2 = 0 THEN 8 ELSE 32 END AS BIGINT) AS bits,
        |  CAST(CASE WHEN band_id % 2 = 0 THEN 1 ELSE 3 END AS BIGINT) AS sample_fmt,
        |  CASE WHEN band_id % 2 = 0 THEN 'uint8' ELSE 'float32' END AS dtype,
        |  'float32' AS promoted_dtype,
        |  CAST(32601 + band_id % 60 AS BIGINT) AS epsg,
        |  30.0 AS scale_x, 30.0 AS scale_y,
        |  CAST(500000 + 960*band_id AS DOUBLE) AS tie_x,
        |  CAST(4200000 - 480*band_id AS DOUBLE) AS tie_y,
        |  n_px, vsum, vmin, vmax
        |FROM st ORDER BY band_id""".stripMargin
  )
}
