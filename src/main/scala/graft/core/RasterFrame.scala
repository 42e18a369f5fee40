package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-level spatial metadata carried OUTSIDE the row data — the Spark
  * analogue of the reference's xarray coordinate attrs + global attrs
  * (features.py:277-284: "coordinate attributes are retained to
  * preserve spatial reference"; CRS preservation through estimator ops
  * is contract-tested in tests/test_estimator.py:280
  * `test_crs_preserved`, parametrized over a real CRS AND None). Rows
  * hold only (x, y, v): per-grid constants (CRS, affine transform,
  * fill value) would cost a column of identical values per CELL at
  * 100 TB, so they ride the frame wrapper, not the data — zero bytes
  * shuffled, zero scan width added.
  *
  * @param crs       spatial reference ("EPSG:5070"-style), or None for
  *                  an ungeoreferenced grid — both preserved verbatim
  * @param transform GDAL-order affine (a, b, c, d, e, f):
  *                  x_geo = a·col + b·row + c, y_geo = d·col + e·row + f
  * @param fillValue the reference's `_FillValue` global attr
  *                  (features.py:259 `_get_default_nodata_mapping`
  *                  infers per-feature NoData from it)
  * @param attrs     free-form global attrs; DROPPED by ops unless
  *                  keepAttrs (the reference's keep_attrs=False default,
  *                  features.py:269)
  * @param history   op provenance, oldest first (features.py:318-321
  *                  appends the applied func per op; entries here are
  *                  deterministic op names, no wall-clock, per the
  *                  engine's bit-reproducibility posture)
  */
final case class GridMeta(
    crs: Option[String],
    // Vector, not Array: case-class equals/hashCode on an Array field
    // compare by reference identity — two structurally identical metas
    // would be != and hash differently
    transform: Vector[Double],
    fillValue: Option[Long] = None,
    attrs: Map[String, String] = Map.empty,
    history: List[String] = Nil
) {
  require(transform.length == 6, s"affine transform needs 6 terms, got ${transform.length}")

  /** The reference's `_get_attrs` contract (features.py:289-334): CRS
    * always retained, history appended, fill value replaced when
    * given, free-form attrs dropped unless keepAttrs.
    */
  def after(op: String, fill: Option[Long] = None,
            keepAttrs: Boolean = false,
            newTransform: Vector[Double] = transform): GridMeta =
    GridMeta(crs, newTransform,
      fillValue = fill.orElse(fillValue),
      attrs = if (keepAttrs) attrs else Map.empty,
      history = history :+ op)

  /** Alignment identity: two grids combine cell-wise only when they
    * share a spatial reference AND an affine transform.
    */
  def alignedWith(other: GridMeta): Boolean =
    crs == other.crs && transform == other.transform
}

object GridMeta {
  /** The grid-sentinel attr a predict fill value can publish: only an
    * integral, Long-range fill is representable (NaN — the default
    * nodata_output — and fractional fills leave no sentinel, matching
    * a float raster whose _FillValue is unset).
    */
  def integralFill(v: Double): Option[Long] =
    if (!v.isNaN && !v.isInfinite && v == math.floor(v) &&
        v >= Long.MinValue.toDouble && v < 9.223372036854776e18) Some(v.toLong)
    else None
}

/** A raster grid as (x, y, v) cells plus [[GridMeta]] — the estimator-
  * contract wrapper (FeatureFrame's sibling) that gives the raster ops
  * A28–A35 the reference's attribute-propagation semantics: every
  * raster→raster op returns a RasterFrame whose meta went through
  * [[GridMeta.after]], reductions (zonal/global) return plain
  * DataFrames (the grid is consumed), and cell-wise combination
  * REFUSES misaligned grids — the error rioxarray users otherwise
  * discover as silently wrong overlays. The DataFrame bodies are the
  * same Spark-first shapes as the gate queries (shift-and-aggregate
  * focal, block-key resample, pure-codegen local algebra); this
  * wrapper adds provenance, not plans.
  */
final case class RasterFrame(df: DataFrame, width: Long, height: Long, meta: GridMeta) {

  /** A28 through the metadata carrier: 3×3 NoData-aware focal mean;
    * cells become DOUBLE means (NULL where no valid neighbor — or
    * `nodataOutput` when given, which also becomes the new fill attr).
    */
  def focalMean3x3(nodataOutput: Option[Long] = None,
                   keepAttrs: Boolean = false): RasterFrame = {
    val offs = array((for (dx <- -1 to 1; dy <- -1 to 1) yield
      struct(lit(dx).as("dx"), lit(dy).as("dy"))): _*)
    val mean = col("vsum").cast("double") / col("vcnt")
    val out = df.select(col("x"), col("y"), col("v"), explode(offs).as("o"))
      .select((col("x") + col("o.dx")).as("tx"),
              (col("y") + col("o.dy")).as("ty"), col("v"))
      .filter(col("tx") >= 0 && col("tx") < width &&
              col("ty") >= 0 && col("ty") < height)
      .groupBy(col("tx"), col("ty"))
      .agg(sum(col("v")).as("vsum"), count(col("v")).as("vcnt"))
      .select(col("tx").as("x"), col("ty").as("y"),
        nodataOutput match {
          case Some(f) => coalesce(mean, lit(f.toDouble)).as("v")
          case None    => mean.as("v")
        })
    RasterFrame(out, width, height,
      meta.after("focal_mean_3x3", fill = nodataOutput, keepAttrs = keepAttrs))
  }

  /** A30 through the metadata carrier: 2×2 block-mean downsample. The
    * affine transform SCALES — pixel-size terms (a, b, d, e) double,
    * the origin (c, f) stays — which is the assertion that catches a
    * meta carrier that merely photocopies attrs instead of tracking
    * what the op did to the grid geometry.
    */
  def resample2x(keepAttrs: Boolean = false): RasterFrame = {
    val t = meta.transform
    val scaled = Vector(t(0) * 2, t(1) * 2, t(2), t(3) * 2, t(4) * 2, t(5))
    val out = df.groupBy(expr("x div 2").as("x"), expr("y div 2").as("y"))
      .agg((sum(col("v")).cast("double") / count(col("v"))).as("v"))
    RasterFrame(out, (width + 1) / 2, (height + 1) / 2,
      meta.after("resample_2x2_mean", keepAttrs = keepAttrs,
        newTransform = scaled))
  }

  /** A34 through the metadata carrier: cell-wise combination of two
    * ALIGNED grids (local map algebra). Misaligned inputs — different
    * CRS or transform — REFUSE loudly instead of joining cells that
    * sit at different ground positions.
    */
  def mapAlgebra(other: RasterFrame, opName: String)
                (f: (Column, Column) => Column): RasterFrame = {
    require(meta.alignedWith(other.meta),
      s"map algebra needs aligned grids: ${meta.crs}/${meta.transform.toSeq} vs " +
        s"${other.meta.crs}/${other.meta.transform.toSeq}")
    require(width == other.width && height == other.height,
      s"map algebra needs equal grid shapes: ${width}x$height vs ${other.width}x${other.height}")
    val out = df.alias("a")
      .join(other.df.alias("b"), Seq("x", "y"))
      .select(col("x"), col("y"),
        f(col("a.v"), col("b.v")).as("v"))
    RasterFrame(out, width, height, meta.after(opName))
  }

  /** A29: zonal reduction — the grid is CONSUMED (a table of zone
    * statistics is not a raster), mirroring xarray reduce dropping the
    * spatial coordinates; callers wanting provenance read it off this
    * frame's meta before reducing.
    */
  def zonalStats(zone: Column): DataFrame =
    df.withColumn("zone", zone)
      .groupBy(col("zone"))
      .agg(count(lit(1)).as("n_cells"), count(col("v")).as("n_valid"),
           sum(col("v")).as("vsum"), min(col("v")).as("vmin"),
           max(col("v")).as("vmax"))

  /** A35: whole-grid reduction; grid consumed, one combiner pass. */
  def globalStats: DataFrame =
    df.agg(count(lit(1)).as("n_cells"), count(col("v")).as("n_valid"),
           sum(col("v")).as("vsum"), min(col("v")).as("vmin"),
           max(col("v")).as("vmax"))
}

object RasterFrame {

  /** The synthetic fixture grid with a declared georeference — entry
    * point for meta-carrying pipelines over the same cells the gate
    * queries read.
    */
  def synthetic(spark: org.apache.spark.sql.SparkSession, w: Long, h: Long,
                meta: GridMeta): RasterFrame =
    RasterFrame(graft.sources.Synthetic.rasterGrid(spark, w, h), w, h, meta)

  /** The DataSource V2 raster source wrapped with its georeference —
    * stripe planning / pushdown behavior identical to the bare
    * `spark.read.format(...)` path (the meta rides the wrapper).
    */
  def fromV2(spark: org.apache.spark.sql.SparkSession, w: Long, h: Long,
             meta: GridMeta): RasterFrame =
    RasterFrame(
      spark.read.format("graft.sources.v2.RasterSource")
        .option("w", w).option("h", h).load(),
      w, h, meta)
}
