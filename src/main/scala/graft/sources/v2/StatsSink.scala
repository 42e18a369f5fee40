package graft.sources.v2

import java.util

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 custom batch SINK (SURVEY §2 G4) — the WRITE half of
  * the engine-extension pillar (G1–G3 are read-side): a from-scratch
  * `SupportsWrite` table that reduces every task's rows to an exact
  * integer statistics partial (count/sum/min/max of the single long
  * column) carried in its `WriterCommitMessage`, and merges the
  * partials in `BatchWrite.commit` ON THE DRIVER. This is Spark's
  * two-phase commit contract end to end:
  *
  *  - task side: `DataWriter.commit()` emits the partial; a failed or
  *    speculative task's writer is `abort()`ed and its partial never
  *    reaches the driver — per-task exactly-once;
  *  - driver side: `commit(messages)` sees exactly one message per
  *    SUCCESSFUL task and publishes the merge atomically;
  *    `abort(messages)` publishes nothing — a failed job leaves no
  *    partial state behind (the property file-commit protocols buy
  *    with temp-dir renames, here bought by keeping partials out of
  *    the registry until the driver commit).
  *
  * At 100 TB the pattern is "write = aggregate-on-the-way-out": a
  * metrics/manifest sink that summarizes what a job wrote without a
  * second read pass — the posture of Delta/Iceberg per-file stats
  * collection at write time.
  *
  * Usage: `df.write.format("graft.sources.v2.StatsSink")
  * .option("key", k).mode("append").save()` then read
  * [[StatsSink.committed]]`(k)`.
  */
class StatsSink extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StatsSink.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new StatsSinkTable(Option(properties.get("key")).getOrElse("default"))
}

object StatsSink {
  // nullable: appends of computed (hence nullable-typed) columns must
  // pass Spark's write-side nullability check; the writer itself
  // requires non-null values at runtime
  val schema: StructType = StructType(Seq(
    StructField("v", LongType, nullable = true)))

  /** Exact integer write statistics: (rows, sum, min, max). */
  final case class Stats(n: Long, sum: Long, min: Long, max: Long)

  /** Driver-side registry of committed writes, keyed by the `key`
    * option. Only `BatchWrite.commit` writes here — task output that
    * was aborted or never driver-committed is invisible by
    * construction. */
  private val results = TrieMap.empty[String, Stats]

  def committed(key: String): Option[Stats] = results.get(key)

  private[v2] def publish(key: String, s: Stats): Unit = results.put(key, s)

  /** G6: per-epoch committed stats of a STREAMING write, keyed by the
    * `key` option. `StreamingWrite.commit(epoch, ...)` is the only
    * writer, and it is IDEMPOTENT per epoch (putIfAbsent): after a
    * failure Spark re-runs and re-commits the same epoch, and the
    * retry must not double-count — the exactly-once contract every
    * production streaming sink (Delta txn log, Kafka transactional
    * producer) implements with an epoch/txn dedup check exactly like
    * this one. Empty epochs are never recorded (their min/max
    * identity elements must not pollute the merge).
    */
  private val streamResults = TrieMap.empty[String, TrieMap[Long, Stats]]

  private[v2] def publishEpoch(key: String, epoch: Long, s: Stats): Unit =
    streamResults.getOrElseUpdate(key, TrieMap.empty).putIfAbsent(epoch, s)

  /** The cumulative merge over all committed epochs plus the epoch
    * count — what a metrics consumer reads after the stream drains. */
  def streamCommitted(key: String): Option[(Long, Stats)] =
    streamResults.get(key).filter(_.nonEmpty).map { m =>
      val ss = m.values.toSeq
      (m.size.toLong,
       Stats(ss.map(_.n).sum, ss.map(_.sum).sum,
             ss.map(_.min).min, ss.map(_.max).max))
    }
}

final class StatsSinkTable(key: String) extends Table with SupportsWrite {
  override def name(): String = s"graft_stats_sink($key)"
  override def schema(): StructType = StatsSink.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new StatsBatchWrite(key)
        override def toStreaming: streaming.StreamingWrite =
          new StatsStreamingWrite(key)
      }
    }
}

/** One exact partial per task, merged on the driver at commit. */
final case class StatsPartial(n: Long, sum: Long, min: Long, max: Long)
    extends WriterCommitMessage

/** The per-task reduction writer shared by the batch and streaming
  * (G4/G6) write paths — identical accumulation, identical partial. */
private[v2] object StatsWriters {
  def newWriter(): DataWriter[InternalRow] = new DataWriter[InternalRow] {
    private var n = 0L; private var sum = 0L
    private var mn = Long.MaxValue; private var mx = Long.MinValue
    override def write(record: InternalRow): Unit = {
      val v = record.getLong(0)
      n += 1; sum += v
      if (v < mn) mn = v
      if (v > mx) mx = v
    }
    override def commit(): WriterCommitMessage = StatsPartial(n, sum, mn, mx)
    override def abort(): Unit = () // partial dies with the task
    override def close(): Unit = ()
  }

  def merge(messages: Array[WriterCommitMessage]): StatsSink.Stats = {
    var n = 0L; var sum = 0L
    var mn = Long.MaxValue; var mx = Long.MinValue
    messages.foreach { case StatsPartial(pn, ps, pmn, pmx) =>
      n += pn; sum += ps
      if (pmn < mn) mn = pmn
      if (pmx > mx) mx = pmx
    }
    StatsSink.Stats(n, sum, mn, mx)
  }
}

final class StatsBatchWrite(key: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new DataWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
        StatsWriters.newWriter()
    }

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    StatsSink.publish(key, StatsWriters.merge(messages))

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

/** G6: the STREAMING write path (`StreamingWrite`) — the same two-phase
  * commit as G4 run once PER EPOCH: each micro-batch's task partials
  * merge in `commit(epochId, ...)` on the driver and publish under the
  * epoch id; `StatsSink.publishEpoch` is putIfAbsent so an epoch
  * RETRY after recovery merges exactly once (the idempotent-sink
  * contract). Empty epochs publish nothing — their identity
  * min/max must not pollute the cross-epoch merge.
  */
final class StatsStreamingWrite(key: String) extends streaming.StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): streaming.StreamingDataWriterFactory =
    new streaming.StreamingDataWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long,
                                epochId: Long): DataWriter[InternalRow] =
        StatsWriters.newWriter()
    }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val merged = StatsWriters.merge(messages)
    if (merged.n > 0) StatsSink.publishEpoch(key, epochId, merged)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}
