package graft.sources.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{FunctionCatalog, Identifier}
import org.apache.spark.sql.connector.catalog.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 FUNCTION CATALOG (SURVEY §2 G12) — the third catalog
  * pillar next to the read (G1–G3, G5, G7–G10) and write (G4, G6,
  * G11) surfaces: engine kernels published as catalog functions that
  * ANY SQL user can call by name, resolved through Spark's
  * `FunctionCatalog` connector API rather than session-registered
  * UDFs. Two contract points, both spec-locked:
  *
  *  - `kernels.floor_div(a, b)`: a `ScalarFunction` with the MAGIC
  *    `invoke(long, long)` method — Spark binds it via `Invoke` into
  *    whole-stage codegen with NO boxing and NO InternalRow shuffling
  *    (the `produceResult` row path is the fallback, not the hot
  *    path). Semantics: Math.floorDiv — the floor division the
  *    engine's exact integer kernels use everywhere, which SQL's
  *    `div` (truncating IntegralDivide) does NOT provide on negatives.
  *  - `kernels.gcd_agg(v)`: an `AggregateFunction` whose state is one
  *    long and whose update/merge is gcd — associative AND
  *    commutative, so Spark runs it with map-side partials and a
  *    shuffle of 1-long states (the quantum-detection profiler: the
  *    gcd of a cents column reveals the price grid, e.g. "everything
  *    is a multiple of 25").
  *
  * Usage: `spark.sql.catalog.graft_fns = graft.sources.v2.GraftFunctionCatalog`
  * then `SELECT graft_fns.kernels.floor_div(-7, 2)`.
  */
class GraftFunctionCatalog extends FunctionCatalog {
  private var catName = "graft_fns"
  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catName = name
  override def name(): String = catName

  private val ns = Array("kernels")
  private val fns: Map[String, UnboundFunction] = Map(
    "floor_div" -> FloorDivFn,
    "gcd_agg"   -> GcdAggFn)

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(ns))
      fns.keys.toArray.sorted.map(Identifier.of(ns, _))
    else Array.empty

  override def loadFunction(ident: Identifier): UnboundFunction =
    fns.getOrElse(ident.name().toLowerCase(java.util.Locale.ROOT),
      throw new IllegalArgumentException(
        s"undefined function: ${ident.namespace().mkString(".")}.${ident.name()}"))

  override def functionExists(ident: Identifier): Boolean =
    ident.namespace().sameElements(ns) &&
      fns.contains(ident.name().toLowerCase(java.util.Locale.ROOT))
}

object FloorDivFn extends UnboundFunction {
  override def name(): String = "floor_div"
  override def description(): String =
    "floor_div(a BIGINT, b BIGINT) -> BIGINT: floor division (Math.floorDiv)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"floor_div takes 2 arguments, got ${inputType.fields.length}")
    FloorDivImpl
  }
}

object FloorDivImpl extends ScalarFunction[java.lang.Long] {
  override def name(): String = "floor_div"
  override def canonicalName(): String = "graft.kernels.floor_div"
  override def inputTypes(): Array[DataType] = Array(LongType, LongType)
  override def resultType(): DataType = LongType
  override def isResultNullable: Boolean = false
  /** Fallback row path — the magic `invoke` below is what actually
    * runs once Spark resolves it. */
  override def produceResult(input: InternalRow): java.lang.Long =
    Math.floorDiv(input.getLong(0), input.getLong(1))
  /** MAGIC_METHOD_NAME fast path: bound via `Invoke`, codegen'd, no
    * boxing. */
  def invoke(a: Long, b: Long): Long = Math.floorDiv(a, b)
}

object GcdAggFn extends UnboundFunction {
  override def name(): String = "gcd_agg"
  override def description(): String =
    "gcd_agg(v BIGINT) -> BIGINT: gcd of |values| (0 for empty) - the column-quantum profiler"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1,
      s"gcd_agg takes 1 argument, got ${inputType.fields.length}")
    GcdAggImpl
  }
}

object GcdAggImpl extends AggregateFunction[java.lang.Long, java.lang.Long] {
  override def name(): String = "gcd_agg"
  override def canonicalName(): String = "graft.kernels.gcd_agg"
  override def inputTypes(): Array[DataType] = Array(LongType)
  override def resultType(): DataType = LongType
  override def isResultNullable: Boolean = false

  @annotation.tailrec
  private def gcd(a: Long, b: Long): Long = if (b == 0L) a else gcd(b, a % b)

  override def newAggregationState(): java.lang.Long = 0L
  override def update(state: java.lang.Long, input: InternalRow): java.lang.Long =
    if (input.isNullAt(0)) state
    else gcd(state.longValue(), Math.abs(input.getLong(0)))
  override def merge(a: java.lang.Long, b: java.lang.Long): java.lang.Long =
    gcd(a.longValue(), b.longValue())
  override def produceResult(state: java.lang.Long): java.lang.Long = state
}
