package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
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

final class RasterTable(w: Long, h: Long) extends Table with SupportsRead {
  override def name(): String = s"graft_raster(${w}x$h)"
  override def schema(): StructType = RasterSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RasterScanBuilder(w, h)
}

final class RasterScanBuilder(w: Long, h: Long)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var yMin = 0L
  private var yMax = h - 1
  private var accepted = Array.empty[Filter]
  private var required = RasterSource.schema

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

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new RasterScan(w, yMin, yMax, required)
}

final case class RasterStripe(w: Long, yStart: Long, yEnd: Long,
                              fields: Seq[String]) extends InputPartition

final class RasterScan(w: Long, yMin: Long, yMax: Long, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftRasterScan w=$w yRange=[$yMin,$yMax] cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    if (yMax < yMin) return Array.empty
    val rows = yMax - yMin + 1
    val stripes = math.min(8L, rows)
    (0L until stripes).map { i =>
      val s = yMin + i * rows / stripes
      val e = yMin + (i + 1) * rows / stripes - 1
      RasterStripe(w, s, e, required.fieldNames.toSeq): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
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
            case "x" => java.lang.Long.valueOf(x): Any
            case "y" => java.lang.Long.valueOf(y): Any
            case "v" => v
          }.toArray)
        }
        override def close(): Unit = ()
      }
    }
}
