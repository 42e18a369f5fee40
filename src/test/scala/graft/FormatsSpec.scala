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
