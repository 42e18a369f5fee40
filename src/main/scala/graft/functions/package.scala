package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared column helpers.
  *
  * Cross-engine float policy: every floating-point output column is
  * rounded and cast to DECIMAL in both the Spark query and its DuckDB
  * oracle. Double aggregation order differs across engines (partial
  * aggregates vs sequential scan), so raw doubles are not hash-stable;
  * round-then-decimal absorbs the ulp noise. Sums of ~1e5-magnitude
  * values use 2 decimals, unit-magnitude ratios/means use 4.
  */
package object functions {
  def dec2(c: Column): Column = round(c, 2).cast(DecimalType(18, 2))
  def dec4(c: Column): Column = round(c, 4).cast(DecimalType(18, 4))
  def dec6(c: Column): Column = round(c, 6).cast(DecimalType(18, 6))
}
