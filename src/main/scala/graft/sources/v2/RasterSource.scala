package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{MetadataColumn, SupportsMetadataColumns, SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 source for the deterministic raster fixture
  * (SURVEY §2 G1): the ENGINE-EXTENSION side of the sources pillar —
  * where Tables/Sinks exercise Spark's built-in file formats, this is
  * a from-scratch `TableProvider` with the three properties a custom
  * 100 TB source must have:
  *
  *  - **partition planning**: the grid splits into row-stripe
  *    `InputPartition`s (one reader task each, no driver materialization
  *    — each executor generates only its stripe);
  *  - **column pruning** (`SupportsPushDownRequiredColumns`): a
  *    projection reaches the reader, which emits only the requested
  *    fields — scan cost tracks the projection exactly as a parquet
  *    scan's ReadSchema does;
  *  - **filter pushdown** (`SupportsPushDownFilters`): y-range
  *    predicates tighten the planned stripe range BEFORE partitions
  *    are created (pruned stripes never run). Pushed filters are also
  *    returned as residuals, so Spark re-evaluates them — pushdown is
  *    an optimization, never a correctness dependency (the same
  *    contract file sources follow for parquet row-group stats).
  *
  * Cell values replicate `Synthetic.rasterGrid`'s md5 formula
  * bit-for-bit ([[graft.functions.TextKernels.md5Prefix52]] of
  * "ras|x,y"; NoData where hash % 19 == 0), so the V2 path is
  * value-checked against the DataFrame-built fixture in
  * DataSourceV2Spec.
  *
  * Usage: `spark.read.format("graft.sources.v2.RasterSource")
  * .option("w", 120).option("h", 80).load()`.
  */
class RasterSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RasterSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val w = Option(properties.get("w")).map(_.toLong).getOrElse(120L)
    val h = Option(properties.get("h")).map(_.toLong).getOrElse(80L)
    new RasterTable(w, h)
  }
}

object RasterSource {
  val schema: StructType = StructType(Seq(
    StructField("x", LongType, nullable = false),
    StructField("y", LongType, nullable = false),
    StructField("v", LongType, nullable = true)))
}

final class RasterTable(w: Long, h: Long) extends Table with SupportsRead
    with SupportsMetadataColumns {
  override def name(): String = s"graft_raster(${w}x$h)"
  override def schema(): StructType = RasterSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RasterScanBuilder(w, h,
      Option(options.get("rowsPerBatch")).map(_.toLong).getOrElse(16L))

  /** G10: `SupportsMetadataColumns` — the `_metadata` facility of file
    * sources (`_metadata.file_path`, Iceberg's `_file`/`_partition`)
    * on the custom source: `_stripe` exposes which planned stripe
    * produced a row. Hidden from `SELECT *` (metadata columns must be
    * asked for BY NAME — the Spark contract), emitted by the shared
    * reader when the projection requests it, and joins/filters on it
    * behave like any other column. The per-row provenance hook every
    * debugging/auditing session wants from a production connector.
    */
  override def metadataColumns(): Array[MetadataColumn] =
    Array(new MetadataColumn {
      override def name(): String = "_stripe"
      override def dataType(): org.apache.spark.sql.types.DataType = LongType
      override def isNullable: Boolean = false
      override def comment(): String =
        "start grid row of the planned stripe that produced this row"
    })
}

final class RasterScanBuilder(w: Long, h: Long, rowsPerBatch: Long = 16L)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownV2Filters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates
    with SupportsPushDownLimit with SupportsPushDownTopN {

  private var yMin = 0L
  private var yMax = h - 1
  private var accepted = Array.empty[Filter]
  private var acceptedV2 = Array.empty[org.apache.spark.sql.connector.expressions.filter.Predicate]
  private var required = RasterSource.schema
  private var pushedAggs = Array.empty[AggregateFunc]
  private var pushedLimit: Option[Int] = None
  private var topNYDesc: Option[Boolean] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    accepted = filters.filter {
      case GreaterThan("y", v: Long)        => yMin = math.max(yMin, v + 1); true
      case GreaterThanOrEqual("y", v: Long) => yMin = math.max(yMin, v); true
      case LessThan("y", v: Long)           => yMax = math.min(yMax, v - 1); true
      case LessThanOrEqual("y", v: Long)    => yMax = math.min(yMax, v); true
      case EqualTo("y", v: Long) =>
        yMin = math.max(yMin, v); yMax = math.min(yMax, v); true
      case _ => false
    }
    // everything (accepted included) stays a residual: Spark re-checks,
    // so range pruning can only skip work, never change results
    filters
  }

  override def pushedFilters(): Array[Filter] = accepted

  /** G15: `SupportsPushDownV2Filters` — the MODERN predicate face of
    * the same pushdown (once this trait is present, Spark routes
    * through `pushPredicates` INSTEAD of the V1 `pushFilters`, so the
    * translation below carries the whole G1/G3/G7 pruning surface;
    * the existing pushdown specs re-running green IS the migration
    * proof). Semantics identical to the V1 path: y-comparison
    * predicates clamp the planned range, EVERYTHING stays a residual
    * (the G1 contract — range pruning may skip work, never change
    * results), and unhandled predicates are simply not accepted.
    */
  override def pushPredicates(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] = {
    def yLit(p: org.apache.spark.sql.connector.expressions.filter.Predicate)
        : Option[Long] = p.children() match {
      case Array(r: NamedReference,
                 l: org.apache.spark.sql.connector.expressions.Literal[_])
          if r.fieldNames.sameElements(Array("y")) =>
        l.value() match {
          case v: java.lang.Long    => Some(v.longValue())
          case v: java.lang.Integer => Some(v.longValue())
          case _                    => None
        }
      case _ => None
    }
    acceptedV2 = predicates.filter { p =>
      (p.name(), yLit(p)) match {
        case (">", Some(v))  => yMin = math.max(yMin, v + 1); true
        case (">=", Some(v)) => yMin = math.max(yMin, v); true
        case ("<", Some(v))  => yMax = math.min(yMax, v - 1); true
        case ("<=", Some(v)) => yMax = math.min(yMax, v); true
        case ("=", Some(v))  =>
          yMin = math.max(yMin, v); yMax = math.min(yMax, v); true
        case _ => false
      }
    }
    predicates // all residual, exactly like the V1 path
  }

  override def pushedPredicates()
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    acceptedV2

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** G2: AGGREGATE pushdown (`SupportsPushDownAggregates`) — the
    * capability that lets a 100 TB statistics query finish without a
    * single cell row leaving the source: ungrouped COUNT(*)/COUNT(v)/
    * MIN(v)/MAX(v)/SUM(v) reduce to ONE row per stripe inside the
    * reader, and Spark's final aggregate merges the ≤8 stripe partials
    * (partial pushdown — `supportCompletePushDown` stays false, so
    * Spark still applies its count→sum merge rewrite and the result is
    * exact under any stripe layout). Note Spark only offers an
    * aggregation when NO post-scan filters remain; this source keeps
    * pushed filters as residuals (the G1 contract), so the pushed-agg
    * path engages on filterless statistics scans.
    */
  override def supportCompletePushDown(aggregation: Aggregation): Boolean = false

  override def pushAggregation(aggregation: Aggregation): Boolean = {
    if (aggregation.groupByExpressions.nonEmpty) return false
    def isV(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
      e match {
        case r: NamedReference => r.fieldNames.sameElements(Array("v"))
        case _                 => false
      }
    val ok = aggregation.aggregateExpressions.nonEmpty &&
      aggregation.aggregateExpressions.forall {
        case _: CountStar => true
        case c: Count     => !c.isDistinct && isV(c.column)
        case m: Min       => isV(m.column)
        case m: Max       => isV(m.column)
        case sm: Sum      => !sm.isDistinct && isV(sm.column)
        case _            => false
      }
    if (ok) pushedAggs = aggregation.aggregateExpressions
    ok
  }

  /** G3: LIMIT pushdown (`SupportsPushDownLimit`) — a plain
    * `.limit(n)` clamps the planned y-range to the FIRST
    * ceil(n/w) grid rows before partitions exist; partial pushdown
    * (`isPartiallyPushed` = true) keeps Spark's final Limit, so the
    * source only guarantees "at least n rows if n exist", never
    * correctness.
    */
  override def pushLimit(l: Int): Boolean = {
    pushedLimit = Some(l)
    true
  }

  override def isPartiallyPushed(): Boolean = true

  /** G3: TopN pushdown (`SupportsPushDownTopN`) — ORDER BY y
    * [ASC|DESC] LIMIT n plans only the ceil(n/w) grid rows at the
    * matching END of the (possibly filter-tightened) y-range. Sound
    * for ANY secondary sort keys because stripes always contain FULL
    * grid rows: the true top-n under (y dir, anything...) is a subset
    * of the last/first ceil(n/w) complete y-rows. Spark re-sorts and
    * re-limits (partial pushdown) — the source only prunes.
    */
  override def pushTopN(orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
                        l: Int): Boolean =
    orders.headOption match {
      case Some(o) =>
        val isY = o.expression() match {
          case r: NamedReference => r.fieldNames.sameElements(Array("y"))
          case _                 => false
        }
        if (!isY) false
        else {
          topNYDesc = Some(o.direction() ==
            org.apache.spark.sql.connector.expressions.SortDirection.DESCENDING)
          pushedLimit = Some(l)
          true
        }
      case None => false
    }

  /** The y-range after applying a pushed limit/top-N (no-op when the
    * filter-tightened range is already empty). */
  private def clampedRange: (Long, Long) = pushedLimit match {
    case Some(l) if yMax >= yMin =>
      val w0 = math.max(w, 1L)
      val needRows = math.min((l + w0 - 1) / w0, yMax - yMin + 1)
      if (topNYDesc.contains(true)) (math.max(yMin, yMax - needRows + 1), yMax)
      else (yMin, math.min(yMax, yMin + needRows - 1))
    case _ => (yMin, yMax)
  }

  override def build(): Scan =
    if (pushedAggs.nonEmpty) new RasterAggScan(w, yMin, yMax, pushedAggs)
    else {
      val (lo, hi) = clampedRange
      new RasterScan(w, lo, hi, required, rowsPerBatch)
    }
}

final case class RasterStripe(w: Long, yStart: Long, yEnd: Long,
                              fields: Seq[String]) extends InputPartition
    with HasPartitionKey {
  /** G9: the stripe's partition key — meaningful (and reported via
    * `SupportsReportPartitioning`) only when the stripe holds a single
    * grid row; multi-row stripes are never published as key-grouped. */
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](java.lang.Long.valueOf(yStart)))
}

/** G2 pushed-aggregate scan: each stripe reduces to ONE partial row in
  * the reader (count/valid/min/max/sum over its cells, NoData-aware);
  * the partial kinds ride the stripe as strings (AggregateFunc is not
  * Serializable). An empty y-range still plans ONE empty stripe so the
  * global aggregate sees a (0, 0, null, null, null) partial — a
  * zero-row source under a pushed ungrouped aggregate would otherwise
  * turn COUNT's merge-sum into NULL.
  */
final class RasterAggScan(w: Long, yMin: Long, yMax: Long,
                          aggs: Array[AggregateFunc]) extends Scan with Batch {
  private val aggKinds: Array[String] = aggs.map {
    case _: CountStar => "count_star"
    case _: Count     => "count_v"
    case _: Min       => "min_v"
    case _: Max       => "max_v"
    case _: Sum       => "sum_v"
    case other => throw new IllegalStateException(s"unexpected pushed agg $other")
  }

  override def readSchema(): StructType = StructType(aggKinds.zipWithIndex.map {
    case (k, i) =>
      StructField(s"agg_$i", LongType,
        nullable = k != "count_star" && k != "count_v")
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftRasterAggScan w=$w yRange=[$yMin,$yMax] aggs=${aggKinds.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    if (yMax < yMin) return Array(RasterStripe(w, 1L, 0L, aggKinds.toSeq))
    val rows = yMax - yMin + 1
    val stripes = math.min(8L, rows)
    (0L until stripes).map { i =>
      val s = yMin + i * rows / stripes
      val e = yMin + (i + 1) * rows / stripes - 1
      RasterStripe(w, s, e, aggKinds.toSeq): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[RasterStripe]
      new PartitionReader[InternalRow] {
        private var emitted = false
        override def next(): Boolean = !emitted && { emitted = true; true }
        override def get(): InternalRow = {
          val md = java.security.MessageDigest.getInstance("MD5")
          var nCells = 0L; var nValid = 0L; var sm = 0L
          var mn = Long.MaxValue; var mx = Long.MinValue
          var y = p.yStart
          while (y <= p.yEnd) {
            var x = 0L
            while (x < p.w) {
              val hx = graft.functions.TextKernels.md5Prefix52(md, s"ras|$x,$y")
              nCells += 1
              if (hx % 19 != 0) {
                val v = hx % 1000
                nValid += 1; sm += v
                if (v < mn) mn = v
                if (v > mx) mx = v
              }
              x += 1
            }
            y += 1
          }
          new GenericInternalRow(p.fields.map {
            case "count_star" => java.lang.Long.valueOf(nCells): Any
            case "count_v"    => java.lang.Long.valueOf(nValid): Any
            case "sum_v"      => if (nValid == 0) null else java.lang.Long.valueOf(sm): Any
            case "min_v"      => if (nValid == 0) null else java.lang.Long.valueOf(mn): Any
            case "max_v"      => if (nValid == 0) null else java.lang.Long.valueOf(mx): Any
          }.toArray)
        }
        override def close(): Unit = ()
      }
    }
}

final class RasterScan(w: Long, yMin: Long, yMax: Long, required: StructType,
                       rowsPerBatch: Long = 16L)
    extends Scan with Batch with SupportsRuntimeFiltering
    with SupportsReportStatistics with SupportsReportPartitioning
    with SupportsReportOrdering {

  /** G14: `SupportsReportOrdering` — the reader emits each stripe's
    * rows in (y, x) ascending order (see rowReaderFactory's loop), so
    * the scan REPORTS that per-partition ordering and Spark's
    * EnsureRequirements elides SortExec wherever the reported prefix
    * satisfies the required one (on a single-stripe scan even a global
    * ORDER BY y, x runs sort-free). Truthfulness rule: `x` is only
    * sorted UNDER `y` (it restarts every grid row), so the report is
    * the projected PREFIX of [y, x] — a projection without y reports
    * nothing rather than a false x-order; claiming an order the
    * layout lacks would be a wrong-results bug, the same honesty
    * contract as G9's UnknownPartitioning fallback.
    */
  override def outputOrdering(): Array[SortOrder] = {
    val f = required.fieldNames.toSet
    Seq("y", "x").takeWhile(f.contains)
      .map(c => Expressions.sort(Expressions.identity(c),
        SortDirection.ASCENDING))
      .toArray
  }

  /** G9: `SupportsReportPartitioning` — when every planned stripe
    * holds exactly ONE grid row (small grids, or a G7 runtime filter
    * that pruned to single rows), the scan reports
    * KeyGroupedPartitioning on y, and under
    * `spark.sql.sources.v2.bucketing.enabled` Spark can skip the
    * shuffle for y-clustered operations — the storage-partitioned
    * (Iceberg SPJ) posture. Multi-row stripes honestly report
    * UnknownPartitioning: claiming a grouping the layout doesn't have
    * would be a correctness bug, not an optimization.
    */
  override def outputPartitioning(): partitioning.Partitioning = {
    val parts = planInputPartitions()
    val singleRow = parts.nonEmpty &&
      required.fieldNames.contains("y") && parts.forall {
        case s: RasterStripe => s.yStart == s.yEnd
        case _               => false
      }
    if (singleRow)
      new partitioning.KeyGroupedPartitioning(
        Array(org.apache.spark.sql.connector.expressions.Expressions
          .identity("y")), parts.length)
    else new partitioning.UnknownPartitioning(parts.length)
  }
  // G7: runtime-tightened bounds — start at the planning-time range and
  // shrink when Spark delivers a join-derived filter at execution time
  private var rtMin = yMin
  private var rtMax = yMax
  private var rtSet: Option[Set[Long]] = None

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftRasterScan w=$w yRange=[$yMin,$yMax] cols=${required.fieldNames.mkString(",")}"

  /** G7: `SupportsRuntimeFiltering` — the DataSource V2 face of dynamic
    * partition pruning: when this scan sits under a join on `y` with a
    * selective build side, Spark re-plans the scan AT EXECUTION TIME
    * with an `In(y, <build-side values>)` filter, and the stripe
    * planner shrinks to the value range (plus an exact per-row y-set
    * check in the reader's stripe rows — runtime filters arrive after
    * the logical plan is fixed, so Spark does NOT re-check them; the
    * source must apply them exactly, the opposite of the G1 residual
    * contract). At 100 TB this is the "join to the dimension prunes
    * the fact scan" posture of partitioned parquet DPP.
    */
  /** G8: `SupportsReportStatistics` — accurate row/byte estimates from
    * the (filter-tightened) planned range, so Catalyst's join-strategy
    * choice works on this source exactly as it does on parquet with
    * footer stats: a scan pruned to a few grid rows reports a few KB
    * and gets BROADCAST; without this, a DSv2 scan defaults to
    * "unknown = huge" and every join degrades to sort-merge. The
    * per-row width is the projected fields only — pruning a column
    * shrinks the estimate like parquet's ReadSchema does.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    private val rows = math.max(0L, yMax - yMin + 1) * w
    // 8 bytes per projected long column + row overhead
    private val rowBytes = 8L * required.fields.length + 16L
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows * rowBytes)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows)
  }

  override def filterAttributes(): Array[NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("y"))

  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case In("y", vs) if vs.nonEmpty =>
      val set = vs.collect { case v: Long => v }.toSet
      if (set.nonEmpty) {
        rtSet = Some(rtSet.fold(set)(_ intersect set))
        rtMin = math.max(rtMin, set.min)
        rtMax = math.min(rtMax, set.max)
      }
    case _ => () // unhandled runtime filters are simply not applied
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val fields = required.fieldNames.toSeq
    rtSet match {
      case Some(set) =>
        // one stripe per surviving y row — pruning exact to the row set
        set.toSeq.sorted.filter(y => y >= rtMin && y <= rtMax)
          .map(y => RasterStripe(w, y, y, fields): InputPartition).toArray
      case None => RasterScan.stripes(w, rtMin, rtMax, fields)
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    RasterScan.rowReaderFactory

  /** G5: the MICRO-BATCH half of the read path (same pruned y-range,
    * same projected fields, same cell reader — streaming and batch
    * reads CANNOT diverge because they share every component below the
    * offset log). See [[RasterMicroBatchStream]].
    */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new RasterMicroBatchStream(w, yMin, yMax, required, rowsPerBatch)
}

object RasterScan {
  /** Shared stripe planner: split [yMin, yMax] grid rows into at most
    * 8 row-stripe InputPartitions carrying the projected fields. */
  def stripes(w: Long, yMin: Long, yMax: Long,
              fields: Seq[String]): Array[InputPartition] = {
    if (yMax < yMin) return Array.empty
    val rows = yMax - yMin + 1
    val n = math.min(8L, rows)
    (0L until n).map { i =>
      val s = yMin + i * rows / n
      val e = yMin + (i + 1) * rows / n - 1
      RasterStripe(w, s, e, fields): InputPartition
    }.toArray
  }

  /** Shared per-cell reader — the md5 formula evaluated lazily inside
    * the partition (no driver materialization), emitting only the
    * stripe's projected fields. Used verbatim by the batch scan AND
    * the G5 micro-batch stream. */
  val rowReaderFactory: PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[RasterStripe]
      new PartitionReader[InternalRow] {
        private val md = java.security.MessageDigest.getInstance("MD5")
        private var y = p.yStart
        private var x = -1L
        override def next(): Boolean = {
          x += 1
          if (x >= p.w) { x = 0; y += 1 }
          y <= p.yEnd
        }
        override def get(): InternalRow = {
          val hx = graft.functions.TextKernels.md5Prefix52(md, s"ras|$x,$y")
          val v: Any = if (hx % 19 == 0) null else java.lang.Long.valueOf(hx % 1000)
          new GenericInternalRow(p.fields.map {
            case "x"       => java.lang.Long.valueOf(x): Any
            case "y"       => java.lang.Long.valueOf(y): Any
            case "v"       => v
            case "_stripe" => java.lang.Long.valueOf(p.yStart): Any
          }.toArray)
        }
        override def close(): Unit = ()
      }
    }
}

/** G5: DataSource V2 MICRO-BATCH streaming read
  * (`MicroBatchStream` + `SupportsAdmissionControl` +
  * `SupportsTriggerAvailableNow`) — the STREAMING third of the
  * extension pillar's read path (G1 batch, G2/G3 pushdown, G4 write):
  * the offset is simply the next unread grid row, each micro-batch
  * admits at most `rowsPerBatch` rows (the source-side rate limiting
  * every production stream source does — Kafka's maxOffsetsPerTrigger,
  * file source's maxFilesPerTrigger), and Trigger.AvailableNow drains
  * the grid in bounded batches then stops. Restart-safe by
  * construction: offsets are pure row indices into a deterministic
  * grid, so re-planning [start, end) after a crash yields the
  * identical rows (the exactly-once contract a replayable source must
  * keep). Spark does NOT run filter pushdown against micro-batch V2
  * scans (unlike the batch path), so a filtered stream reads the full
  * y-range and relies on post-scan residual re-evaluation — correct by
  * the same "pushdown is never a correctness dependency" contract as
  * G1, with admission control (not range pruning) bounding per-batch
  * work; DataSourceV2Spec locks both behaviors.
  */
final class RasterMicroBatchStream(w: Long, yMin: Long, yMax: Long,
                                   required: StructType, rowsPerBatch: Long)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private val endRow = yMax + 1 // exclusive upper bound of the row domain
  private var availableNowTarget: Option[Long] = None

  private def off(row: Long): Offset = RasterRowOffset(math.min(row, endRow))

  override def initialOffset(): Offset = off(yMin)

  override def deserializeOffset(json: String): Offset =
    RasterRowOffset(json.toLong)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(rowsPerBatch)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[RasterRowOffset].row
    val cap = availableNowTarget.getOrElse(endRow)
    val step = limit match {
      case r: ReadMaxRows => r.maxRows()
      case _              => rowsPerBatch
    }
    off(math.min(s + math.max(step, 1L), cap))
  }

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(endRow)

  override def reportLatestOffset(): Offset = off(endRow)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[RasterRowOffset].row
    val e = end.asInstanceOf[RasterRowOffset].row - 1
    RasterScan.stripes(w, s, e, required.fieldNames.toSeq)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    RasterScan.rowReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** G5 offset: the next unread grid row (half-open row domain). */
final case class RasterRowOffset(row: Long) extends Offset {
  override def json(): String = row.toString
}
