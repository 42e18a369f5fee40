package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector primitives over `array<double>` columns — codegen'd
  * `zip_with`/`aggregate` expressions (no UDFs). Sums fold left in index
  * order, so results are IEEE-deterministic and match a same-order
  * sequential kernel bit-for-bit.
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column =
    aggregate(a, lit(0.0), (acc, v) => acc + v * v)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))
}
