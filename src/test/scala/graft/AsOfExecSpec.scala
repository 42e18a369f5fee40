package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Windowed
import graft.sources.Tables

/** The custom physical as-of operator must match the windowed
  * formulation row-for-row on real data, and plan as a single
  * co-partitioned sort-merge (one exchange per side, no union/window).
  */
class AsOfExecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sfDir = "/root/testdata/sf0.001"

  private def sides = {
    val dedupW = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
      .orderBy(col("o_orderkey").desc)
    val ord = Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(dedupW))
      .filter(col("rn") === 1)
      .select(col("o_custkey").as("user_id"), col("o_orderdate"),
              col("o_orderkey"), col("o_totalprice"))
    val ev = Tables.events(spark, sfDir).select(col("event_id"), col("user_id"), col("ts"))
    (ev, ord)
  }

  test("custom exec matches the windowed as-of join on the events/orders data") {
    val (ev, ord) = sides
    def collect(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_id"), col("user_id"), col("o_orderkey"), col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else math.round(r.getDouble(3) * 100)))
      .sortBy(t => (t._1, t._2))
    val viaWindow = collect(Windowed.asOfJoin(ev, ord, "user_id", "ts", "o_orderdate",
      Seq("o_orderkey", "o_totalprice")))
    val viaExec = collect(Windowed.asOfJoinExec(ev, ord, "user_id", "ts", "o_orderdate",
      Seq("o_orderkey", "o_totalprice")))
    assert(viaExec.length == viaWindow.length && viaExec.length > 0)
    assert(viaExec.toSeq == viaWindow.toSeq)
  }

  test("custom exec plans as one exchange + sort per side, no window/union") {
    val (ev, ord) = sides
    val df = Windowed.asOfJoinExec(ev, ord, "user_id", "ts", "o_orderdate",
      Seq("o_orderkey", "o_totalprice"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("Union"), plan)
    // the join itself adds no window state (the right side's dedup
    // window is upstream input preparation, not part of the operator)
    val joinSection = plan.substring(plan.indexOf("AsOfJoin"))
    assert(joinSection.split("\n").take(6).forall(l => !l.contains("RunningWindow")), plan)
  }
}
