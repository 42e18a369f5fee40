package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{KmvArrival, KmvOut}

/** F24 under the PRODUCTION state store: the KMV stream run with the
  * RocksDB state-store provider and a checkpoint RESTART mid-stream —
  * the exactly-once claim the changelog posture rests on. The query is
  * stopped between committed micro-batches, a NEW query restarts from
  * the same checkpoint (state rehydrated from RocksDB, offsets from the
  * commit log), the remaining batches (plus a re-delivered slice) play
  * in, and the final latest-version sketches must equal an
  * uninterrupted run EXACTLY — a state row lost in the restart, a
  * replayed batch double-applied, or a provider that silently fell
  * back to the in-memory store all fail (the last via the artifact
  * check: only RocksDBStateStoreProvider checkpoints state as zip
  * archives/changelogs; the HDFS-backed default writes .delta files).
  * The sink is foreachBatch keyed by batchId (the recovery-capable
  * sink shape — the memory sink refuses checkpoint recovery), so a
  * replayed epoch overwrites its own slot instead of double-counting:
  * exactly the idempotent-publish contract a production changelog
  * consumer implements.
  */
class RocksDbRestartSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("F24 kmvStream restarts from a RocksDB checkpoint with exact state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("rocksdb_ckpt").toString
    try {
      val k = 16
      // deterministic arrivals: 3 groups, values colliding across groups
      val arrivals = (0 until 3000).map { i =>
        KmvArrival(s"g${i % 3}", (i * 37L) % 997L)
      }
      // idempotent per-epoch publish: batchId -> rows (a replayed epoch
      // overwrites its slot, never double-counts)
      val epochs = scala.collection.concurrent.TrieMap.empty[Long, Seq[KmvOut]]
      // the SAME MemoryStream instance feeds both query incarnations —
      // its data lives on the driver; the restarted query resumes from
      // the committed offset in the checkpoint
      val input = MemoryStream[KmvArrival]
      def start() = EventStreams.kmvStream(input.toDS(), k)
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .foreachBatch { (ds: Dataset[KmvOut], id: Long) =>
          epochs.put(id, ds.collect().toSeq): Unit
        }
        .start()

      val q1 = start()
      input.addData(arrivals.take(1000))
      q1.processAllAvailable()
      q1.stop() // kill between committed micro-batches

      // state must now live ONLY in the RocksDB checkpoint
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
      val rocksArtifacts =
        try walk.filter(p => p.toString.endsWith(".zip") ||
                             p.toString.endsWith(".changelog")).count()
        finally walk.close()
      assert(rocksArtifacts > 0,
        "no RocksDB snapshot/changelog artifacts under the checkpoint")

      val q2 = start()
      try {
        input.addData(arrivals.slice(1000, 2000)); q2.processAllAvailable()
        // final batch includes a re-delivered slice: min-k SET semantics
        input.addData(arrivals.drop(2000) ++ arrivals.take(100))
        q2.processAllAvailable()
      } finally q2.stop()
      val latest = epochs.toSeq.sortBy(_._1).flatMap(_._2)
        .groupBy(_.grp).map { case (g, os) => g -> os.maxBy(_.ver) }

      // the uninterrupted twin: same arrivals, same splits, one query
      val refEpochs = scala.collection.concurrent.TrieMap.empty[Long, Seq[KmvOut]]
      val input2 = MemoryStream[KmvArrival]
      val qRef = EventStreams.kmvStream(input2.toDS(), k)
        .writeStream.outputMode("update")
        .foreachBatch { (ds: Dataset[KmvOut], id: Long) =>
          refEpochs.put(id, ds.collect().toSeq): Unit
        }
        .start()
      try {
        input2.addData(arrivals.take(1000)); qRef.processAllAvailable()
        input2.addData(arrivals.slice(1000, 2000)); qRef.processAllAvailable()
        input2.addData(arrivals.drop(2000) ++ arrivals.take(100))
        qRef.processAllAvailable()
      } finally qRef.stop()
      val ref = refEpochs.toSeq.sortBy(_._1).flatMap(_._2)
        .groupBy(_.grp).map { case (g, os) => g -> os.maxBy(_.ver) }

      assert(latest.keySet == Set("g0", "g1", "g2") && latest.keySet == ref.keySet)
      latest.keySet.foreach { g =>
        val a = latest(g); val b = ref(g)
        assert(a.n_kept == b.n_kept && a.est == b.est &&
          a.hs.toSeq == b.hs.toSeq && a.vs.toSeq == b.vs.toSeq,
          s"group $g diverged after the RocksDB restart")
        // version continuity: the restarted query kept counting batches
        // on top of the restored state rather than starting over
        assert(a.ver == b.ver,
          s"group $g version counter diverged (restart lost or replayed state)")
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
