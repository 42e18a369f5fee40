package graft
import org.apache.spark.sql.functions._
object QProf {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.local("32")
    def time(name: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $name%-28s ${(System.nanoTime()-t0)/1e9}%8.3f s  rows=$n")
    }
    import graft.sources.Tables._
    time("scan_documents") { documents(spark, dir).agg(sum(length(col("text")))).count() }
    time("fanout_count") { fanOut(documents(spark, dir).select(col("doc_id"), col("text"))).count() }
    time("q_minhash") { operators.TextOps.qMinHash(spark, dir).count() }
    time("q_lsh_pairs") { operators.TextOps.qLshPairs(spark, dir).count() }
    time("q_ngram_jaccard") { operators.TextOps.qNgramJaccard(spark, dir).count() }
    time("q1_pricing") { operators.Relational.q1Pricing(spark, dir).count() }
    time("scan_lineitem_full") { lineitem(spark, dir).agg(sum(col("l_quantity"))).count() }
    time("q3_shipping") { operators.Relational.q3Shipping(spark, dir).count() }
    time("q5_region") { operators.Relational.q5Region(spark, dir).count() }
    time("q_curate") { operators.TextOps.qCurate(spark, dir).count() }
    time("q_setops") { operators.Relational.qSetOps(spark, dir).count() }
    time("q_embed_neardup") { operators.Similarity.qEmbedNearDup(spark, dir).count() }
    time("q_knn_reg") { operators.Estimation.qKnnReg(spark, dir).count() }
    time("q_knn_proba") { operators.Estimation.qKnnProba(spark, dir).count() }
    spark.stop()
  }
}
