package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** SURVEY §6: pre-bucketed tables make repeated key joins shuffle-free —
  * the co-location strategy for 100 TB fact-to-fact joins that are run
  * many times (broadcast covers dims; bucketing covers big-big).
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("join between co-bucketed tables plans without a shuffle exchange") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS b_facts")
    spark.sql("DROP TABLE IF EXISTS b_other")
    for (t <- Seq("b_facts", "b_other")) {
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    val n = 10000
    val facts = (0 until n).map(i => (i.toLong % 500, i.toLong, i * 1.5)).toDF("k", "id", "x")
    val other = (0 until n).map(i => (i.toLong % 500, i * 2.0)).toDF("k", "y")
    facts.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("b_facts")
    other.write.mode("overwrite").bucketBy(8, "k").saveAsTable("b_other")

    // disable auto-broadcast so the join strategy is the big-big path
    // bucketing exists for (broadcast would hide the co-location)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = spark.table("b_facts").join(spark.table("b_other"), "k")
      .groupBy("k").agg(sum(col("x") * col("y")).as("s"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    // the join itself must not shuffle either side: no Exchange between
    // the scans and the SortMergeJoin (the final agg reuses the join's
    // partitioning, so the whole plan is Exchange-free)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)

    // and the result is correct
    val direct = facts.join(other, "k").groupBy("k")
      .agg(sum(col("x") * col("y")).as("s"))
      .collect().map(r => r.getLong(0) -> math.round(r.getDouble(1))).toMap
    val bucketed = joined.collect().map(r => r.getLong(0) -> math.round(r.getDouble(1))).toMap
    assert(bucketed == direct)

    spark.sql("DROP TABLE IF EXISTS b_facts")
    spark.sql("DROP TABLE IF EXISTS b_other")
  }
}
