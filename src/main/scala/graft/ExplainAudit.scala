package graft
import org.apache.spark.sql.functions._
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local("8")
    for ((n, q) <- Seq(
      "q7" -> operators.Relational.q7NationVolume(spark, dir),
      "q_sample" -> operators.Relational.qSample(spark, dir),
      "q_tfidf" -> operators.TextOps.qTfidf(spark, dir),
      "q_percentile" -> operators.Relational.qPercentile(spark, dir))) {
      val plan = q.queryExecution.executedPlan.toString
      val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
      val smj = "SortMergeJoin".r.findAllIn(plan).length
      val pushed = "PushedFilters: \\[[^\\]]".r.findAllIn(plan).length
      println(s"AUDIT $n: broadcastJoins=$bhj sortMergeJoins=$smj nonEmptyPushedFilters=$pushed wholeStageCodegen=${plan.contains("WholeStageCodegen")}")
    }
    spark.stop()
  }
}
