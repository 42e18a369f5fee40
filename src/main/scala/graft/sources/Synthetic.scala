package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic feature-array generator — the reference's
  * `datasets/synthetic.py` (fractal value-noise features + percentile
  * masking) re-expressed as a distributed `spark.range` + codegen'd
  * hash-noise columns: no data is ever materialized on the driver, so
  * the generator scales to arbitrarily many samples.
  *
  * Noise model: per feature, `octaves` layers of linearly-interpolated
  * lattice noise; layer o has amplitude 2^-o with anchors every
  * 4^(octaves-1-o) samples — largest amplitude on the longest
  * wavelength, the fractal convention (hash-based analogue of the
  * reference's fractal noise). Values land in [0, 1). Percentile masking NaNs all
  * features where a dedicated mask-noise band falls below the given
  * percentile — producing the contiguous NoData regions rasters have.
  */
object Synthetic {

  /** Deterministic raster-grid fixture for the focal (moving-window)
    * ops: a w×h band of integer cell values v = md5-52('ras|x,y') %
    * 1000, with NoData holes where the hash ≡ 0 (mod 19) (~5% of
    * cells, scattered). Pure codegen over `spark.range` — no driver
    * materialization, rebuildable row-by-row in SQL from the same
    * formulas (the zipfEvents convention), so focal results are
    * oracle-checkable without shipping the grid.
    */
  def rasterGrid(spark: SparkSession, w: Long, h: Long): DataFrame = {
    import graft.functions.TextFunctions.hexPrefix52
    val hx = hexPrefix52(concat(lit("ras|"), col("x").cast("string"),
                                lit(","), col("y").cast("string")))
    spark.range(w * h)
      .select((col("id") % w).as("x"), expr(s"id div $w").as("y"))
      .select(col("x"), col("y"),
        when(hx % 19 === 0, lit(null).cast("long")).otherwise(hx % 1000).as("v"))
  }

  private def unit(seed: Long, feat: String, o: Int, idx: Column): Column =
    (abs(xxhash64(lit(seed), lit(feat), lit(o), idx)) % lit(1L << 52)).cast("double") /
      lit((1L << 52).toDouble)

  private def octaveNoise(seed: Long, feat: String, octaves: Int): Column = {
    // fractal convention: largest amplitude at the longest wavelength
    // (anchor spacing 4^(octaves-1-o) for amplitude 2^-o), so the field
    // is smooth with fine detail layered on top
    val layers = (0 until octaves).map { o =>
      val step = 1L << (2 * (octaves - 1 - o))
      val base = floor(col("sample_id") / step).cast("long")
      val frac = (col("sample_id") % step).cast("double") / lit(step.toDouble)
      val n0 = unit(seed, feat, o, base)
      val n1 = unit(seed, feat, o, base + 1)
      (n0 * (lit(1.0) - frac) + n1 * frac) * lit(math.pow(0.5, o))
    }
    val ampSum = (0 until octaves).map(math.pow(0.5, _)).sum
    layers.reduce(_ + _) / lit(ampSum)
  }

  /** Zipf-skewed synthetic event stream — the skew fixture the parquet
    * testdata lacks (its `events.user_id` is uniform, so the salted
    * aggregation paths were never exercised against REAL skew). Pure
    * integer construction, so the DuckDB oracle rebuilds every row:
    *
    *   h       = 52-bit md5 prefix of "zu|<i>"   (uniform in [0, 2^52))
    *   user_id = min(2^52 div (h+1), nUsers)
    *   v       = 52-bit md5 prefix of "zv|<i>" mod nValues
    *
    * P(raw user ≥ k) = 1/k exactly, so P(user = k) ≈ 1/k² — a Zipf(2)
    * tail where user 1 absorbs ~50% of ALL rows and the clamp bucket
    * `nUsers` collects the ~1/nUsers tail. No floats anywhere (an
    * exp/ln-based Zipf map could round differently across engines at
    * bucket boundaries); distributed generation via spark.range, no
    * driver materialization.
    */
  def zipfEvents(
      spark: SparkSession,
      nRows: Long,
      nUsers: Int = 1000,
      nValues: Int = 100000
  ): DataFrame = {
    import graft.functions.TextFunctions.hexPrefix52
    spark.range(nRows).toDF("event_id")
      .withColumn("__hu", hexPrefix52(concat(lit("zu|"), col("event_id").cast("string"))))
      .withColumn("user_id",
        least(expr("4503599627370496 div (__hu + 1)"), lit(nUsers.toLong)))
      .withColumn("v",
        hexPrefix52(concat(lit("zv|"), col("event_id").cast("string"))) % nValues)
      .select(col("event_id"), col("user_id"), col("v"))
  }

  /** Session-memoized PINNED copy of [[zipfEvents]] — bench hygiene
    * (r9 finding): the fixture costs ~2 md5 evaluations per row to
    * generate, and inside the timed region that cost shadows the
    * operator under measurement (q_median_skew's round-over-round
    * variance was fixture, not plan). One materialization per
    * (session, shape) — ~12 MB at the 500k default — after which every
    * consumer reads the pinned blocks. Values are bit-identical to the
    * generator by construction (deterministic integer formulas), so
    * the DuckDB replay oracles are unaffected.
    */
  def zipfEventsPinned(
      spark: SparkSession,
      nRows: Long,
      nUsers: Int = 1000,
      nValues: Int = 100000
  ): DataFrame =
    zipfPins.getOrElseUpdate((spark, nRows, nUsers, nValues),
      graft.core.Materialize.pin(zipfEvents(spark, nRows, nUsers, nValues)))

  private val zipfPins = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, Long, Int, Int), DataFrame]

  /** Drop the session-lifetime pinned Zipf fixtures (bench hygiene:
    * Bench.reap unpersists ALL persistent RDDs between timed runs, and
    * a localCheckpoint'd frame cannot be recomputed after unpersist —
    * clearing the cache makes the next caller re-pin from the
    * deterministic generator instead of reading a dead RDD).
    */
  def clearZipfPins(): Unit = zipfPins.clear()

  /** Generate `nRows` samples of the named features. `maskPercentile`
    * in (0,1) NaNs that fraction of rows (by the mask band's empirical
    * percentile); 0 disables masking.
    */
  def featureArray(
      spark: SparkSession,
      nRows: Long,
      features: Seq[String],
      octaves: Int = 4,
      maskPercentile: Double = 0.0,
      seed: Long = 42
  ): DataFrame = {
    val base = spark.range(nRows).toDF("sample_id")
    val withFeatures = base.select(
      col("sample_id") +: features.map(f => octaveNoise(seed, f, octaves).as(f)): _*)
    if (maskPercentile <= 0) withFeatures
    else {
      val maskBand = octaveNoise(seed, "__mask__", octaves)
      val withMask = withFeatures.withColumn("__m", maskBand)
      // exact percentile over the mask band (deterministic across runs)
      val threshold = withMask.agg(
        expr(s"percentile(__m, $maskPercentile)")).collect()(0).getDouble(0)
      withMask.select(
        col("sample_id") +: features.map(f =>
          when(col("__m") < threshold, lit(Double.NaN)).otherwise(col(f)).as(f)): _*)
    }
  }
}
