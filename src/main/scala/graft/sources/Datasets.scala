package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
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
