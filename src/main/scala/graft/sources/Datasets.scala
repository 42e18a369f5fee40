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
  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** The packaged-sample analogue: a deterministic (plots, pixels) pair
    * for the canonical fit-small/predict-big workflow. `plots` is a
    * small labelled sample of the feature space; `pixels` is the full
    * synthetic feature array wrapped as a FeatureFrame.
    */
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
