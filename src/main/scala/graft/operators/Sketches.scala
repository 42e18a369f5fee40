package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate aggregates for 100 TB interactive analytics, where exact
  * global sorts/distincts are off the table: quantiles via Greenwald-
  * Khanna sketches (mergeable partials, one reduction), distinct counts
  * via HyperLogLog++. Both are Spark-native mergeable sketches — error
  * is bounded and the shuffle carries sketch state, never rows.
  */
object Sketches {

  /** Approximate quantiles of `valueCol` with relative rank error ≤ `relErr`. */
  def quantiles(df: DataFrame, valueCol: String, probs: Array[Double],
                relErr: Double = 0.01): Array[Double] =
    df.stat.approxQuantile(valueCol, probs, relErr)

  /** Per-key approximate distinct count (HyperLogLog++, rsd ≤ `rsd`). */
  def approxDistinctPerKey(df: DataFrame, keys: Seq[String], valueCol: String,
                           rsd: Double = 0.02): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as(s"approx_distinct_$valueCol"))

  /** Per-key percentile via the mergeable approx_percentile aggregate. */
  def percentilePerKey(df: DataFrame, keys: Seq[String], valueCol: String,
                       p: Double, accuracy: Int = 10000): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(percentile_approx(col(valueCol), lit(p), lit(accuracy)).as(s"p_$valueCol"))
}
