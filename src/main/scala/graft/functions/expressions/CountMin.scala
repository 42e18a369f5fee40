package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a native
  * Catalyst aggregate — the mergeable-sketch tier for per-key
  * FREQUENCY estimation at 100 TB (the companion to `graft_mg`, which
  * answers "which keys are frequent"; CMS answers "how frequent is
  * THIS key" for any key, in constant memory):
  *
  *   - each task keeps a fixed depth×width grid of longs (d·w·8
  *     bytes, independent of input size); the shuffle carries one grid
  *     per task, never raw rows (ObjectHashAggregate partial merge);
  *   - partial grids merge by elementwise ADD — exactly associative,
  *     so executor-side combining is lossless;
  *   - for every key x: est(x) ≥ true(x) (one-sided error, a
  *     deterministic property of the structure), and the overshoot is
  *     bounded by the colliding mass in the sparsest row.
  *
  * The grid is exposed as a flat `array<bigint>` (row-major), and the
  * row hashes are DELIBERATELY Spark's own `xxhash64(x, d)` chain
  * (XXH64.hashLong(d, XXH64.hashLong(x, 42))) so a plain SQL
  * expression can probe the sketch with builtin functions:
  *
  *   est(x) = least over d of
  *     element_at(cms, d*width + pmod(xxhash64(x, CAST(d AS BIGINT)), width) + 1)
  *
  * — no UDF on the probe path, the whole estimate stays codegen'd.
  * Registered as `graft_cms(col, depth, width)` by
  * [[graft.GraftExtensions]].
  */
object CountMin {
  /** Row-d bucket of value v: the same chain SQL `xxhash64(v, d)`
    * computes, reduced to [0, width). Shared by the aggregate's update
    * and any streaming twin so both sides probe identical cells.
    */
  def bucket(v: Long, d: Int, width: Int): Int = {
    val h = XXH64.hashLong(d.toLong, XXH64.hashLong(v, 42L))
    (((h % width) + width) % width).toInt
  }
}

case class CountMin(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, s"graft_cms needs 1 <= depth <= 16, got $depth")
  require(width >= 2, s"graft_cms needs width >= 2, got $width")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cms requires a bigint column, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      // hoist the row hash: bucket(x, d) = f(hashLong(x, 42), d), and
      // the inner hash is d-independent — one call per row, not depth
      val inner = XXH64.hashLong(x, 42L)
      var d = 0
      while (d < depth) {
        val h = XXH64.hashLong(d.toLong, inner)
        b(d * width + (((h % width) + width) % width).toInt) += 1L
        d += 1
      }
    }
    b
  }

  override def merge(a: Array[Long], c: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += c(i); i += 1 }
    a
  }

  override def eval(b: Array[Long]): Any = new GenericArrayData(b)

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * b.length)
    bb.asLongBuffer().put(b)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms"
  override def children: Seq[Expression] = child :: Nil

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMin =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMin =
    copy(inputAggBufferOffset = newOffset)
}
