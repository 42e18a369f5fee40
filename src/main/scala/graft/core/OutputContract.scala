package graft.core

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** A15 output post-processing shared by every predict/transform path:
  * masked-row fill, opt-in fill-collision counting, and the resolved
  * output-dtype cast (see [[PredictOptions]]).
  */
object OutputContract {

  /** `when(mask, fill).otherwise(value)` with the output contract
    * applied. The collision check wraps only the VALID branch (CaseWhen
    * branches evaluate lazily, so masked rows — whose raw value may be
    * garbage — are never counted); it costs codegen on that column,
    * which is why it is opt-in.
    */
  def applyTo(value: Column, mask: Column, opts: PredictOptions,
              acc: Option[LongAccumulator]): Column = {
    val valid = acc match {
      case scala.Some(a) =>
        val fill = opts.noDataOutput
        val check = udf { (x: java.lang.Double) =>
          if (x != null && (x.doubleValue == fill || (fill.isNaN && x.isNaN))) a.add(1L)
          x
        }
        check(value)
      case scala.None => value
    }
    when(mask, lit(opts.noDataOutput)).otherwise(valid).cast(opts.resolveOutputType())
  }

  /** One accumulator per predict call when the check is enabled; the
    * owning model exposes its running total (reference
    * `check_output_for_nodata` warning, `ufunc/_base.py:424` — counts
    * valid outputs indistinguishable from fills).
    */
  def collisionAccumulator(s: SparkSession, opts: PredictOptions): Option[LongAccumulator] =
    if (opts.checkOutputForNoData)
      scala.Some(s.sparkContext.longAccumulator("graft.nodata_collisions"))
    else scala.None
}
