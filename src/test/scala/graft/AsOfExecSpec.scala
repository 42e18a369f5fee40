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

  test("G16: left-only filters push through the as-of node to the scan; payload filters stay") {
    val (ev, ord) = sides
    val joined = Windowed.asOfJoinExec(ev, ord, "user_id", "ts", "o_orderdate",
      Seq("o_orderkey", "o_totalprice"))

    // left-only predicate: must sink below AsOfJoinPlan and keep walking
    // to the left parquet scan as a pushed data filter
    val lf = joined.filter(col("user_id") < 50L)
    val opt = lf.queryExecution.optimizedPlan
    def filterAboveAsOf(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
      p.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter
            if f.child.isInstanceOf[graft.plans.AsOfJoinPlan] => f
      }.nonEmpty
    assert(!filterAboveAsOf(opt), s"left-only filter stuck above the node:\n$opt")
    val scans = lf.queryExecution.executedPlan.toString
    assert(scans.contains("PushedFilters: [IsNotNull(user_id), LessThan(user_id,50)]") ||
           scans.contains("LessThan(user_id,50)"),
      s"predicate did not reach the scan:\n$scans")

    // and semantics are unchanged: push-then-join == join-then-filter
    val expected = joined.collect()
      .filter(r => r.getLong(1) < 50L)
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
      .sortBy(identity)
    val got = lf.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
      .sortBy(identity)
    assert(got.length > 0 && got.toSeq == expected.toSeq)

    // payload predicate: NOT safe to move — must remain above the node
    val pf = joined.filter(col("o_totalprice") > 1000.0)
    assert(filterAboveAsOf(pf.queryExecution.optimizedPlan),
      "payload filter must stay above the as-of node")
    // mixed conjunction: the left half sinks, the payload half stays
    val mixed = joined.filter(col("user_id") < 50L && col("o_totalprice") > 1000.0)
    val mopt = mixed.queryExecution.optimizedPlan
    assert(filterAboveAsOf(mopt), "payload conjunct must stay above")
    assert(!mopt.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.child.isInstanceOf[graft.plans.AsOfJoinPlan] => f
    }.exists(_.condition.references.exists(_.name == "user_id")),
      "left conjunct must not remain above the node")
  }

  test("G17: unused payload columns prune through the as-of node down to the scan") {
    val (ev, ord) = sides
    val joined = Windowed.asOfJoinExec(ev, ord, "user_id", "ts", "o_orderdate",
      Seq("o_orderkey", "o_totalprice"))
    val narrow = joined.select(col("event_id"), col("o_orderkey"))
    // the node itself drops the unused payload column...
    val nodes = narrow.queryExecution.optimizedPlan.collect {
      case a: graft.plans.AsOfJoinPlan => a
    }
    assert(nodes.nonEmpty && nodes.head.payload.map(_.name) == Seq("o_orderkey"),
      s"payload not pruned:\n${narrow.queryExecution.optimizedPlan}")
    // ...and the stock rules walk the narrowed projection into the
    // orders scan: o_totalprice must not be read anywhere
    val physical = narrow.queryExecution.executedPlan.toString
    assert(!physical.contains("o_totalprice"),
      s"pruned column still read:\n$physical")
    // semantics unchanged vs projecting the full-width join
    val expected = joined.collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3)))
      .sortBy(identity)
    val got = narrow.collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .sortBy(identity)
    assert(got.length > 0 && got.toSeq == expected.toSeq)
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
