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
        // side-effecting: declared nondeterministic so Catalyst never
        // duplicates or re-evaluates it (CSE, pushdown through
        // projections). The count is still APPROXIMATE under task
        // retries / speculation / a second action on the same frame —
        // accumulator semantics, documented on noDataCollisionCount.
        val check = udf { (x: java.lang.Double) =>
          if (x != null && x.doubleValue == fill) a.add(1L)
          x
        }.asNondeterministic()
        check(value)
      case scala.None => value
    }
    when(mask, lit(opts.noDataOutput)).otherwise(valid).cast(opts.resolveOutputType())
  }

  /** One accumulator per predict call when the check is enabled; the
    * owning model exposes its running total (reference
    * `check_output_for_nodata` warning, `ufunc/_base.py:424` — counts
    * valid outputs indistinguishable from fills). A NaN fill skips the
    * check entirely — NaN already only means NoData (reference
    * `ufunc/_base.py:453` skips the check when `nodata_output` is NaN).
    */
  def collisionAccumulator(s: SparkSession, opts: PredictOptions): Option[LongAccumulator] =
    if (opts.checkOutputForNoData && !opts.noDataOutput.isNaN)
      scala.Some(s.sparkContext.longAccumulator("graft.nodata_collisions"))
    else scala.None
}

/** Mixin giving a fitted model the full A15 contract on its double-typed
  * outputs: call-time fill/dtype validation, masked-row fill, opt-in
  * collision counting, and the output cast — so EVERY model honors
  * `PredictOptions` identically, not just the kNN regressor and scalers.
  */
trait ContractedOutputs {
  @transient @volatile private var collisionAcc: Option[LongAccumulator] = scala.None

  /** Fill-collision count from the LAST predict/transform issued with
    * `checkOutputForNoData = true` (read after an action on its result);
    * 0 when the check was off, the fill was NaN, or no collision
    * occurred. Approximate under task retries / re-executed plans.
    */
  def noDataCollisionCount: Long = collisionAcc.map(_.sum).getOrElse(0L)

  /** Resolve the contract at CALL time (rejecting an unrepresentable
    * fill, `ufunc/_base.py:148`) and return the per-column applier.
    */
  protected def outputContract(s: SparkSession, opts: PredictOptions): (Column, Column) => Column = {
    opts.resolveOutputType()
    val acc = OutputContract.collisionAccumulator(s, opts)
    collisionAcc = acc
    (value, mask) => OutputContract.applyTo(value, mask, opts, acc)
  }
}
