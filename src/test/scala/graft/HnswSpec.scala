package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** D29 sharded HNSW: the properties the gate's contract flags rest on,
  * pinned at unit level so a flag regression is diagnosable.
  */
class HnswSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("per-shard graph search is deterministic under input layout") {
    // shard assignment is vec_id mod S with FIXED S and inserts run in
    // vec_id order after an in-partition sort — so the merged top-k
    // must be bit-identical no matter how the scan splits the input
    val key = "spark.sql.files.maxPartitionBytes"
    val orig = spark.conf.get(key)
    val a = Similarity.annHnswTopK(spark, sfDir).collect().toSeq
    val b = try {
      spark.conf.set(key, "65536") // force many tiny scan splits
      Similarity.annHnswTopK(spark, sfDir).collect().toSeq
    } finally spark.conf.set(key, orig)
    assert(a == b && a.nonEmpty)
  }

  test("gate contract flags are all green at spec scale") {
    val r = Similarity.qAnnHnsw(spark, sfDir).collect().head
    val flags = (0 until 5).map(r.getInt)
    assert(flags == Seq(1, 1, 1, 1, 1), s"contract flags: $flags")
  }

  test("hnsw top-1 self-hit: a probe's own vector always comes back first") {
    // every probe IS a corpus vector (sim 1.0 with itself); greedy
    // descent plus the layer-0 beam must surface it at rank 1 — a
    // broken graph (unreachable node, bad entry point) fails this
    val top1 = Similarity.annHnswTopK(spark, sfDir)
      .filter(col("rank") === 1).collect()
    assert(top1.nonEmpty)
    top1.foreach { r =>
      assert(r.getLong(0) == r.getLong(1),
        s"probe ${r.getLong(0)} top-1 was ${r.getLong(1)}, not itself")
    }
  }
}
