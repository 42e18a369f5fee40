package graft.functions.expressions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, LongType, MapType}

/** Misra–Gries heavy-hitters summary as a native Catalyst aggregate
  * (`TypedImperativeAggregate`) — the mergeable-sketch tier for
  * frequent-item detection at 100 TB: each task keeps at most `k`
  * counters (constant memory regardless of input size), partial
  * summaries merge associatively in the exchange, and the result map
  * obeys the classic deterministic CONTRACT for total stream length N:
  *
  *   true(x) − N/(k+1)  ≤  est(x)  ≤  true(x)        for every key x,
  *   and every key with true(x) > N/(k+1) is PRESENT in the summary.
  *
  * Merging preserves the bound (Agarwal et al., "Mergeable Summaries",
  * PODS 2012): combined maps whose size exceeds `k` subtract the
  * (k+1)-th largest counter from all entries, which charges each key at
  * most what decrement-all would have.
  *
  * This is the recommended preference order from SURVEY §3 — a custom
  * Catalyst aggregate (registered as `graft_mg(col, k)` by
  * [[graft.GraftExtensions]]), not a UDAF: it participates in
  * map-side partial aggregation (ObjectHashAggregate), so the shuffle
  * carries one ≤k-entry map per task, never the raw rows.
  */
object MisraGries {
  /** One MG step: count `key` into summary `b` holding ≤ `k` counters.
    * Returns the (possibly replaced) summary. Shared by the batch
    * aggregate below and the F17 streaming twin — same kernel, same
    * bounds.
    */
  def add(b: mutable.LongMap[Long], key: Long, k: Int): mutable.LongMap[Long] =
    if (b.contains(key)) { b(key) += 1L; b }
    else if (b.size < k) { b(key) = 1L; b }
    else {
      // classic MG step: a key with no counter at capacity decrements
      // every counter by one (zeros evicted)
      val out = mutable.LongMap.empty[Long]
      b.foreach { case (kk, c) => if (c > 1L) out(kk) = c - 1L }
      out
    }

  /** Merge two MG summaries into ≤ `k` counters (mergeable-summaries
    * rule: subtract the (k+1)-th largest combined counter).
    */
  def mergeMaps(
      a: mutable.LongMap[Long], c: mutable.LongMap[Long], k: Int): mutable.LongMap[Long] = {
    c.foreach { case (kk, v) => a(kk) = a.getOrElse(kk, 0L) + v }
    if (a.size <= k) a
    else {
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val m = counts(counts.length - 1 - k)
      val out = mutable.LongMap.empty[Long]
      a.foreach { case (kk, cnt) => if (cnt > m) out(kk) = cnt - m }
      out
    }
  }
}

case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  require(k >= 1, s"graft_mg needs k >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_mg requires a bigint column, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty

  override def update(
      b: mutable.LongMap[Long], input: InternalRow): mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v == null) b else MisraGries.add(b, v.asInstanceOf[Long], k)
  }

  override def merge(
      a: mutable.LongMap[Long], c: mutable.LongMap[Long]): mutable.LongMap[Long] =
    MisraGries.mergeMaps(a, c, k)

  override def eval(b: mutable.LongMap[Long]): Any = {
    // deterministic key order so the map renders stably
    val keys = b.keys.toArray
    java.util.Arrays.sort(keys)
    new ArrayBasedMapData(
      new GenericArrayData(keys), new GenericArrayData(keys.map(b.apply)))
  }

  override def serialize(b: mutable.LongMap[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * b.size)
    bb.putInt(b.size)
    b.foreach { case (kk, c) => bb.putLong(kk); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { b(bb.getLong) = bb.getLong; i += 1 }
    b
  }

  override def dataType: DataType = MapType(LongType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_mg"
  override def children: Seq[Expression] = child :: Nil

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
}
