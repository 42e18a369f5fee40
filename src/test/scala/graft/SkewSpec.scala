package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.sources.Synthetic

/** Salting under REAL skew: the parquet testdata's keys are uniform, so
  * until this fixture the salted aggregation paths were only ever
  * checked on data where salting is moot. `Synthetic.zipfEvents` has a
  * Zipf(2) hot key (user 1 ≈ 50% of all rows); every salted kernel must
  * return EXACTLY the direct aggregate's rows on it (integer values, so
  * no float-order escape hatch).
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val ev = Synthetic.zipfEvents(spark, 200000L).localCheckpoint()

  test("the Zipf fixture is actually skewed: hot key holds ~half of all rows") {
    val counts = ev.groupBy(col("user_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    assert(total == 200000L)
    val hot = counts(1L).toDouble / total
    assert(hot > 0.45 && hot < 0.55, s"user 1 holds $hot of rows, expected ~0.5")
    // and a heavy tail, not two hot keys: user 2 ~ 1/6
    val second = counts(2L).toDouble / total
    assert(second > 0.12 && second < 0.21, s"user 2 holds $second, expected ~1/6")
  }

  test("saltedSumCount == direct aggregate on the skewed key, row for row") {
    val salted = Skew.saltedSumCount(ev, Seq("user_id"), "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val direct = ev.groupBy(col("user_id"))
      .agg(sum(col("v")).as("sum_v"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("saltedCountDistinct == direct COUNT(DISTINCT) on the skewed key, row for row") {
    val salted = Skew.saltedCountDistinct(ev, Seq("user_id"), "v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = ev.groupBy(col("user_id"))
      .agg(countDistinct(col("v")).as("nd"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted == direct)
  }

  test("rangePartitionedRunningSum == direct per-key window, row for row") {
    // the genuinely skew-broken plan (§6): the direct window ships the
    // hot key to one reducer; the two-phase distributed scan must
    // reproduce every prefix value exactly (8.5x faster at 8M rows)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val direct = ev.select(col("user_id"), col("event_id"), col("v"),
        sum(col("v")).over(w).as("running"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val twoPhase = Skew.rangePartitionedRunningSum(ev, "user_id", "event_id", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(twoPhase == direct)
    assert(direct.size == 200000)
  }

  test("rangePartitionedRunningSum handles negative values and a single-key input") {
    import org.apache.spark.sql.expressions.Window
    // all rows one key (the degenerate total-skew case), signed values
    val one = spark.range(10000)
      .selectExpr("CAST(1 AS LONG) AS user_id", "id AS event_id",
                  "CAST(id % 7 - 3 AS LONG) AS v")
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val direct = one.select(col("user_id"), col("event_id"), col("v"),
        sum(col("v")).over(w).as("running"))
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSet
    val two = Skew.rangePartitionedRunningSum(one, "user_id", "event_id", "v")
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSet
    assert(two == direct && two.size == 10000)
  }

  test("AQE skew-join engages on the Zipf fixture (locks the §6 join-skew claim)") {
    // §6 claims non-broadcast join skew is AQE's job — prove AQE
    // actually detects and splits our hot key rather than trusting the
    // default thresholds to fire someday. Thresholds are lowered to
    // local-fixture scale and restored afterwards (shared session).
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.shuffle.partitions"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // the fixture's single projected column compresses to ~100 KB for
      // the hot partition — scale the byte thresholds to match
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // enough reducers that the MEDIAN partition is tiny next to the
      // hot key's (the skew detector needs > 5x median AND > threshold)
      conf.set("spark.sql.shuffle.partitions", "64")
      val dim = spark.range(1001).selectExpr("id AS user_id", "id * 7 AS weight")
      // GLOBAL aggregate after the join: a per-key aggregate would
      // REQUIRE the join's hash partitioning and AQE then (by default)
      // refuses to split skewed partitions rather than add a shuffle
      val joined = ev.join(dim, "user_id").agg(sum(col("weight")).as("w"))
      // execute THIS Dataset (a count() would plan a different query),
      // then read the AQE FINAL plan — it marks the split join skew=true
      assert(joined.collect().length == 1)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the hot-key join as skewed:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("salted dedup shuffle spreads the hot key over salt buckets") {
    // the property salting buys at scale: no single reducer key carries
    // the hot user's whole value set — every (user, salt) cell is
    // bounded by ~|values|/salt
    val salt = 16
    val cells = ev.select(col("user_id"), col("v"),
        pmod(hash(col("v")), lit(salt)).as("__salt"))
      .distinct()
      .groupBy(col("user_id"), col("__salt")).count()
      .filter(col("user_id") === 1L)
      .collect().map(_.getLong(2))
    assert(cells.length == salt)
    val (mn, mx) = (cells.min, cells.max)
    assert(mx < 2 * mn, s"hot key's salt cells are unbalanced: min=$mn max=$mx")
  }
}
