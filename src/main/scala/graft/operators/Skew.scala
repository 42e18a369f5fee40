package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SURVEY.md §6): when a shuffle key is heavily
  * skewed (one user/tenant dominating events), a single reducer absorbs
  * the hot key. Salting splits each key into `salt` sub-keys for the
  * first (wide) aggregation, then reduces the tiny salted result — two
  * shuffles, but the big one is uniform.
  *
  * AQE's skew-join handling covers joins; this covers aggregations,
  * where AQE cannot split a hash-aggregate key.
  */
object Skew {

  /** groupBy(keys).agg(sum/count) with salted pre-aggregation.
    * Result is identical to the direct aggregation (sums and counts are
    * associative); only the shuffle layout differs.
    */
  def saltedSumCount(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      salt: Int = 16
  ): DataFrame = {
    // the salt must be DETERMINISTIC per row: with partition-id/row-order
    // salts, a fetch-failure retry recomputes map tasks with different
    // salt assignments and the combined partials double-count or drop
    // rows (the SPARK-23207 class of bug). Hash every column — spreads
    // the hot key unless rows are full duplicates.
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.map(col): _*), lit(salt)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"), sum(col("__pcnt")).as("n"))
  }

  /** Salted distinct-count: exact, via the (key, value) dedup shuffle
    * being salted on value hash — the hot key's distinct set spreads
    * over reducers, then per-key counts add up.
    */
  def saltedCountDistinct(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      salt: Int = 16
  ): DataFrame = {
    val bucket: Column = pmod(hash(col(valueCol)), lit(salt))
    df.filter(col(valueCol).isNotNull) // countDistinct excludes NULLs
      .select((keys.map(col) :+ col(valueCol) :+ bucket.as("__salt")): _*)
      .distinct() // shuffles on (keys, value, salt) — uniform even for hot keys
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__pd")) // rows are distinct values per bucket
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__pd")).as(s"n_distinct_$valueCol"))
  }
}
