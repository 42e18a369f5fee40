package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Dev tool: the skew-rewrite crossover measurements behind SURVEY §6,
  * at an arbitrary Zipf-fixture size — `runMain graft.SkewBench
  * [nRows]` (default 64M ≈ the sf1 decade; the §6 r10 numbers were
  * taken at 8M and 500k). Each pair prints (direct, two-phase) seconds
  * plus an equality witness so the rewrites stay bit-equal while being
  * raced:
  *
  *   running  — B59/B60: per-key running sum, direct hot-reducer window
  *              vs Skew.rangePartitionedRunningSum (two-phase scan)
  *   median   — B61: exact per-key median, direct per-ROW rank window
  *              vs the (key, value)-histogram form (hot reducer bounded
  *              by |values|, not rows)
  *   topn     — §6 top-N: per-key top-5 by value, direct rank window
  *              (WindowGroupLimit applies map-side) vs two-level salted
  *   distinct — B57/B58: exact per-key distinct values, direct
  *              count_distinct vs Skew.saltedCountDistinct
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(64000000L)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS",
        Runtime.getRuntime.availableProcessors().toString))
    val e = graft.sources.Synthetic.zipfEventsPinned(spark, n)
    println(s"SKEWBENCH fixture rows=${e.count()} (pinned)") // pin outside timing

    def time(name: String)(f: => Seq[Any]): Unit = {
      f // warm
      System.gc(); Thread.sleep(200)
      val t0 = System.nanoTime()
      val r = f
      println(f"SKEWBENCH $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s  witness=${r.mkString(",")}")
    }
    def row1(df: DataFrame): Seq[Any] = df.collect()(0).toSeq

    // B59/B60 — running sum; witness: max running + row count
    time("running_direct") {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      row1(e.select(sum(col("v")).over(w).as("running"))
        .agg(max(col("running")), count(lit(1))))
    }
    time("running_twophase") {
      row1(Skew.rangePartitionedRunningSum(e, "user_id", "event_id", "v")
        .agg(max(col("running")), count(lit(1))))
    }

    // B61 — exact per-key median; witness: Σ median over keys
    time("median_direct_window") {
      val byV = Window.partitionBy(col("user_id")).orderBy(col("v"), col("event_id"))
      val whole = Window.partitionBy(col("user_id"))
      row1(e
        .withColumn("r", row_number().over(byV))
        .withColumn("n", count(lit(1)).over(whole))
        .filter(col("r") === expr("(n + 1) div 2"))
        .agg(sum(col("v")), count(lit(1))))
    }
    time("median_histogram") {
      val hist = e.groupBy(col("user_id"), col("v")).agg(count(lit(1)).as("cnt"))
      val byVal = Window.partitionBy(col("user_id")).orderBy(col("v"))
      val whole = Window.partitionBy(col("user_id"))
      val rank = expr("(n + 1) div 2")
      row1(hist
        .withColumn("cum", sum(col("cnt")).over(byVal))
        .withColumn("n", sum(col("cnt")).over(whole))
        .filter(col("cum") >= rank && col("cum") - col("cnt") < rank)
        .agg(sum(col("v")), count(lit(1))))
    }

    // §6 top-N — per-key top-5 values; witness: Σv over the kept rows
    time("topn_direct_window") {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("v").desc, col("event_id"))
      row1(e.withColumn("r", row_number().over(w)).filter(col("r") <= 5)
        .agg(sum(col("v")), count(lit(1))))
    }
    time("topn_two_level") {
      val salted = e.withColumn("__salt", pmod(col("event_id"), lit(32)))
      val wLocal = Window.partitionBy(col("user_id"), col("__salt"))
        .orderBy(col("v").desc, col("event_id"))
      val local = salted.withColumn("r", row_number().over(wLocal))
        .filter(col("r") <= 5).drop("r", "__salt")
      val wGlobal = Window.partitionBy(col("user_id"))
        .orderBy(col("v").desc, col("event_id"))
      row1(local.withColumn("r", row_number().over(wGlobal)).filter(col("r") <= 5)
        .agg(sum(col("v")), count(lit(1))))
    }

    // B57/B58 — exact distinct values per key; witness: Σ distinct
    time("distinct_direct") {
      row1(e.groupBy(col("user_id")).agg(countDistinct(col("v")).as("d"))
        .agg(sum(col("d")), count(lit(1))))
    }
    time("distinct_salted") {
      row1(Skew.saltedCountDistinct(e, Seq("user_id"), "v")
        .agg(sum(col("n_distinct_v")), count(lit(1))))
    }

    spark.stop()
  }
}
