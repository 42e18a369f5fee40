package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared column helpers.
  *
  * Cross-engine float policy: every floating-point output column is
  * rounded, cast to DECIMAL (absorbing cross-engine double-agg order
  * noise), then cast back to DOUBLE in both the Spark query and its
  * DuckDB oracle (`...AS DECIMAL(18,n))::DOUBLE`). The final DOUBLE
  * step matters for the driver's hash compare: a DECIMAL renders with
  * trailing zeros ("475328.30") on the Spark side but becomes float64
  * ("475328.3") when DuckDB results pass through pandas — same value,
  * different text, failed hash. decimal→double is correctly rounded in
  * both engines, so the doubles are bit-identical and render
  * identically. `+ 0.0` normalizes IEEE -0.0 (a Spark decimal -0.00
  * converts to -0.0; DuckDB's integer-scaled decimals cannot) so both
  * sides print "0.0".
  */
package object functions {
  private def decDouble(c: Column, n: Int): Column =
    round(c, n).cast(DecimalType(18, n)).cast("double") + lit(0.0)
  def dec2(c: Column): Column = decDouble(c, 2)
  def dec4(c: Column): Column = decDouble(c, 4)
  def dec6(c: Column): Column = decDouble(c, 6)
}
