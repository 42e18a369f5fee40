package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.{Datasets, Sinks, Tables}

/** Source/sink format coverage beyond the parquet test tables: ORC
  * roundtrip and — the scale-critical one — Hive-style partition
  * PRUNING: a predicate on the partition column must become a
  * PartitionFilter (directory skip before any I/O), not a row filter.
  */
class FormatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("ORC roundtrips the events table bit-exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val src = Tables.events(spark, sfDir)
    Sinks.orc(src, dir)
    val back = Datasets.orc(spark, dir)
    assert(back.schema == src.schema)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("binaryFile ingest: on-disk media blobs decode identically to the in-memory frame") {
    // the real 100 TB ingest path for multimodal columns: one file per
    // blob, read as Spark's binaryFile source (path/length/content),
    // media_id recovered from the file name — then the SAME decode
    // kernel runs unchanged on the ingested frame
    import graft.operators.Multimodal
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toString
    val media = Multimodal.synthesizeMedia(spark, sfDir)
      .select(col("media_id"), col("payload")).collect()
    media.foreach { r =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, f"${r.getLong(0)}%08d.bin"),
        r.getAs[Array[Byte]](1))
    }
    val ingested = spark.read.format("binaryFile").load(dir)
      .select(regexp_extract(col("path"), "([0-9]+)\\.bin$", 1).cast("long").as("media_id"),
              col("content").as("payload"))
    val dec = Multimodal.decodeFeatures(ingested).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getSeq[Float](3))).toMap
    val expected = Multimodal.decodeFeatures(
        Multimodal.synthesizeMedia(spark, sfDir)).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getSeq[Float](3))).toMap
    assert(dec.size == media.length && dec == expected)
  }

  test("partitioned write + partition-pruned read: predicate becomes a PartitionFilter") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Sinks.parquet(Tables.events(spark, sfDir), dir, partitionBy = Seq("event_type"))
    val one = spark.read.parquet(dir).filter(col("event_type") === "click")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
           plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
             .contains("event_type"),
      s"event_type predicate did not become a partition filter:\n$plan")
    // pruning is also semantically right
    val expected = Tables.events(spark, sfDir).filter(col("event_type") === "click").count()
    assert(one.count() == expected)
  }
}
