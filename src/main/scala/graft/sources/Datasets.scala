package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.core.FeatureFrame

/** Dataset loaders — the reference's packaged-sample surface
  * (`datasets/_base.py` load_swo_ecoplot: a small plot table + a large
  * feature raster) plus generic format loaders, schema-first so column
  * pruning and predicate pushdown work from the scan.
  */
object Datasets {

  /** Generic CSV loader (header on, explicit schema — never inferSchema
    * at scale: inference is an extra full scan).
    */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** Generic JSON-lines loader, schema-first for the same reason. */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** The packaged-sample analogue: a deterministic (plots, pixels) pair
    * for the canonical fit-small/predict-big workflow. `plots` is a
    * small labelled sample of the feature space; `pixels` is the full
    * synthetic feature array wrapped as a FeatureFrame.
    */
  /** Feature columns of the packaged ecoplot sample, in fit order. */
  val EcoplotFeatures: Seq[String] = Seq("elev", "precip", "temp", "nbr", "ndvi", "slope")

  /** Tree-cover target columns of the packaged ecoplot sample. */
  val EcoplotTargets: Seq[String] = Seq("cov_psme", "cov_pila", "cov_abco")

  /** The PACKAGED sample-dataset loader — the reference's
    * `load_swo_ecoplot` analogue (`datasets/_base.py:108`): that loader
    * returns (X_image, X, y) — a feature raster plus plot-measurement
    * dataframes for the canonical kNN-imputation workflow. Here the
    * plot table ships INSIDE the jar (`graft/datasets/
    * ecoplot_sample.csv`, 240 deterministic md5-derived plots with 6
    * environmental/spectral features and 3 tree-cover targets — the
    * zero-egress stand-in for the reference's download-and-cache), and
    * the image side is the synthetic feature array with the same
    * feature columns, sized by `nPixels`.
    *
    * Returns (X, y, image): plot features, plot covers (both keyed by
    * plot_id, driver-parsed — the resource is KB-scale by packaging
    * contract), and the full feature frame to predict over.
    */
  /** The reference's `large_rasters=True` image shape
    * (datasets/_base.py:110 — a 2048×4096 raster variant of the same
    * sample, shipped for scale demos).
    */
  val EcoplotLargeRasterPixels: Long = 2048L * 4096L

  def loadEcoplotSample(
      spark: SparkSession,
      nPixels: Long = 10000,
      seed: Long = 42,
      large: Boolean = false
  ): (DataFrame, DataFrame, FeatureFrame) = {
    val px = if (large) EcoplotLargeRasterPixels else nPixels
    val in = getClass.getResourceAsStream("/graft/datasets/ecoplot_sample.csv")
    require(in != null, "packaged dataset graft/datasets/ecoplot_sample.csv missing from classpath")
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
      finally in.close()
    val header = lines.head.split(",").toSeq
    val rows = lines.tail.map { ln =>
      val p = ln.split(",")
      org.apache.spark.sql.Row.fromSeq(p.head.toLong +: p.tail.map(_.toDouble).toSeq)
    }
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("plot_id",
        org.apache.spark.sql.types.LongType, nullable = false) +:
        header.tail.map(c => org.apache.spark.sql.types.StructField(c,
          org.apache.spark.sql.types.DoubleType, nullable = false)))
    val plots = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
    val x = plots.select((col("plot_id") +: EcoplotFeatures.map(col)): _*)
    val y = plots.select((col("plot_id") +: EcoplotTargets.map(col)): _*)
    val pixels = Synthetic.featureArray(spark, px, EcoplotFeatures, seed = seed)
    (x, y, FeatureFrame(pixels, Seq("sample_id"), EcoplotFeatures))
  }

  /** Distinct feature profiles in [[ecoplotMosaic]] — the fixture's
    * oracle-tractability knob: the DuckDB replica computes the kNN once
    * per PROFILE (65,536 × 240 pairs) instead of once per pixel
    * (8.4M × 240 — a 2×10⁹-pair window no oracle should run), then
    * joins profiles back to pixels. The ENGINE path never exploits
    * this: the gate scans per-pixel, which is the honest 100 TB shape.
    */
  val EcoplotMosaicCells = 65536

  /** The canonical-workload pixel frame at the reference's
    * `large_rasters=True` scale (datasets/_base.py:110 — 2048×4096 =
    * 8,388,608 pixels), generated so a SQL oracle can rebuild every
    * row: pixel i draws one 52-bit md5 (`imp|i`) whose low 16 bits pick
    * one of [[EcoplotMosaicCells]] cell profiles and whose next bits
    * drive a ~1/37 NoData mask (elev → NaN, masking the row under the
    * A15 any-feature rule); each profile's six features unpack one
    * byte each from a second md5 (`impc|cell`), scaled onto the
    * packaged ecoplot ranges with EXACT dyadic factors (×8, ×6, /16,
    * /128, /256, /8) so every feature value is exactly representable
    * and cross-engine distance ties are mathematically well-defined.
    * Pure codegen over `spark.range` — nothing materializes on the
    * driver, the generator scales to any pixel count.
    */
  def ecoplotMosaic(spark: SparkSession, nPixels: Long = EcoplotLargeRasterPixels): DataFrame = {
    import graft.functions.TextFunctions.hexPrefix52
    def byte(i: Int): Column = {
      val div = math.pow(256.0, i).toLong
      expr(s"__g div $div") % 256
    }
    spark.range(nPixels).toDF("sample_id")
      .withColumn("__h", hexPrefix52(concat(lit("imp|"), col("sample_id").cast("string"))))
      .withColumn("cell", col("__h") % EcoplotMosaicCells)
      .withColumn("__masked", expr("__h div 65536") % 37 === 0)
      .withColumn("__g", hexPrefix52(concat(lit("impc|"), col("cell").cast("string"))))
      .select(
        col("sample_id"), col("cell"),
        when(col("__masked"), lit(Double.NaN))
          .otherwise(byte(0).cast("double") * 8.0).as("elev"),
        (lit(1000.0) + byte(1).cast("double") * 6.0).as("precip"),
        (byte(2).cast("double") / 16.0).as("temp"),
        ((byte(3).cast("double") - 128.0) / 128.0).as("nbr"),
        (byte(4).cast("double") / 256.0).as("ndvi"),
        (byte(5).cast("double") / 8.0).as("slope"))
  }

  def sampleImputationData(
      spark: SparkSession,
      nPixels: Long = 10000,
      plotEvery: Long = 97,
      seed: Long = 42
  ): (DataFrame, FeatureFrame) = {
    val features = Seq("elev", "precip", "temp")
    val pixels = Synthetic.featureArray(spark, nPixels, features, seed = seed)
    // plots: every `plotEvery`-th pixel, with a synthetic ground-truth
    // response derived deterministically from the features
    val plots = pixels
      .filter(col("sample_id") % plotEvery === 0)
      .withColumn("biomass",
        col("elev") * 2.0 + col("precip") * 5.0 - col("temp") * 1.5)
    (plots, FeatureFrame(pixels, Seq("sample_id"), features))
  }
}
