package graft.sources.v2

import java.util

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, NullOrdering, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 sink declaring a WRITE-SIDE data layout contract
  * (SURVEY §2 G11) — `RequiresDistributionAndOrdering`, the connector
  * API every table format with layout invariants implements (Iceberg's
  * write distribution modes, Delta's clustered writes): the `Write`
  * DEMANDS rows arrive clustered by `k` across tasks (each key's rows
  * land wholly in one task) and sorted by (k, v) within every task,
  * over exactly `numPartitions` write tasks. Spark plans the required
  * exchange + local sort in FRONT of the writer — the engine, not the
  * sink, pays for and owns the layout work, so the sink's writers can
  * e.g. roll one file per key run without any buffering.
  *
  * The contract is VERIFIED end to end, not trusted: each task writer
  * asserts its rows arrive (k, v)-sorted and reports its distinct key
  * set + exact integer stats in its commit message; the driver commit
  * asserts the key sets are PAIRWISE DISJOINT (the clustering
  * property no single task can see) and publishes the merged report.
  * A shuffled input would violate both with overwhelming probability,
  * so a green report proves Spark actually inserted the
  * exchange/sort — DataSourceV2Spec pins it.
  *
  * Usage: `df.write.format("graft.sources.v2.ClusteredSink")
  * .option("key", k).mode("append").save()` then read
  * [[ClusteredSink.committed]]`(k)`.
  */
class ClusteredSink extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ClusteredSink.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ClusteredSinkTable(Option(properties.get("key")).getOrElse("default"))
}

object ClusteredSink {
  val schema: StructType = StructType(Seq(
    StructField("k", LongType, nullable = true),
    StructField("v", LongType, nullable = true)))

  /** How many write tasks the contract demands — part of
    * `RequiresDistributionAndOrdering` (requiredNumPartitions). */
  val NumPartitions = 4

  /** Driver-merged verification report of one committed write. */
  final case class Report(nTasks: Long, nNonEmptyTasks: Long, nRows: Long,
                         nKeys: Long, allSorted: Boolean, disjoint: Boolean,
                         sumV: Long)

  private val results = TrieMap.empty[String, Report]
  def committed(key: String): Option[Report] = results.get(key)
  private[v2] def publish(key: String, r: Report): Unit = results.put(key, r)
}

final class ClusteredSinkTable(key: String) extends Table with SupportsWrite {
  override def name(): String = s"graft_clustered_sink($key)"
  override def schema(): StructType = ClusteredSink.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new ClusteredWrite(key)
    }
}

/** The layout demand: clustered by k across tasks, (k, v)-sorted within
  * each, exactly [[ClusteredSink.NumPartitions]] tasks. */
final class ClusteredWrite(key: String)
    extends Write with RequiresDistributionAndOrdering {
  override def requiredDistribution(): Distribution =
    Distributions.clustered(Array(Expressions.identity("k")))
  override def requiredNumPartitions(): Int = ClusteredSink.NumPartitions
  override def requiredOrdering(): Array[SortOrder] = Array(
    Expressions.sort(Expressions.identity("k"),
      SortDirection.ASCENDING, NullOrdering.NULLS_FIRST),
    Expressions.sort(Expressions.identity("v"),
      SortDirection.ASCENDING, NullOrdering.NULLS_FIRST))
  override def toBatch: BatchWrite = new ClusteredBatchWrite(key)
}

/** One verification partial per task: the distinct key set (bounded by
  * the key domain — this sink is for verification, keys are small),
  * row count, value sum, and whether rows arrived (k, v)-sorted. */
final case class ClusteredPartial(keys: Array[Long], n: Long, sumV: Long,
                                  sorted: Boolean) extends WriterCommitMessage

final class ClusteredBatchWrite(key: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new DataWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
        new DataWriter[InternalRow] {
          private val keys = scala.collection.mutable.LinkedHashSet.empty[Long]
          private var n = 0L; private var sumV = 0L
          private var lastK = Long.MinValue; private var lastV = Long.MinValue
          private var sorted = true
          override def write(record: InternalRow): Unit = {
            val k = record.getLong(0); val v = record.getLong(1)
            if (k < lastK || (k == lastK && v < lastV)) sorted = false
            lastK = k; lastV = v
            keys += k; n += 1; sumV += v
          }
          override def commit(): WriterCommitMessage =
            ClusteredPartial(keys.toArray, n, sumV, sorted)
          override def abort(): Unit = ()
          override def close(): Unit = ()
        }
    }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val ps = messages.collect { case p: ClusteredPartial => p }
    val nonEmpty = ps.filter(_.n > 0)
    val allKeys = nonEmpty.flatMap(_.keys)
    ClusteredSink.publish(key, ClusteredSink.Report(
      nTasks = ps.length.toLong,
      nNonEmptyTasks = nonEmpty.length.toLong,
      nRows = ps.map(_.n).sum,
      nKeys = allKeys.distinct.length.toLong,
      allSorted = ps.forall(_.sorted),
      disjoint = allKeys.length == allKeys.distinct.length,
      sumV = ps.map(_.sumV).sum))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}
