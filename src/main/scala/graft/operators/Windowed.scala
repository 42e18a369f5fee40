package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable windowed operators over arbitrary frames — the generic forms
  * behind the B-block queries. Each costs exactly one shuffle on its
  * natural key.
  */
object Windowed {

  /** Top-n rows per key by `order` (descending), deterministic ties via
    * `tieBreak` ascending. One shuffle on `keys`.
    */
  def topNPerKey(
      df: DataFrame,
      keys: Seq[String],
      order: Column,
      tieBreak: Column,
      n: Int
  ): DataFrame = {
    require(!df.columns.contains("rn"),
      "topNPerKey emits an 'rn' column; rename the input's existing one")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.desc, tieBreak)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= n)
  }

  /** Gaps-and-islands sessionization: events split into sessions when
    * the gap to the previous event (per `key`, ordered by `ts` then
    * `tieBreak`) exceeds `gapUs` microseconds. Emits the input rows with
    * a 1-based `session_seq` per key. One shuffle on `key`.
    */
  def sessionized(
      df: DataFrame,
      key: String,
      ts: String,
      tieBreak: String,
      gapUs: Long
  ): DataFrame = {
    require(!df.columns.contains("session_seq"),
      "sessionized emits a 'session_seq' column; rename the input's existing one")
    val byTime  = Window.partitionBy(col(key)).orderBy(col(ts), col(tieBreak))
    val running = byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__prev", lag(col(ts), 1).over(byTime))
      .withColumn("__new",
        when(col("__prev").isNull ||
             unix_micros(col(ts)) - unix_micros(col("__prev")) > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("__new")).over(running))
      .drop("__prev", "__new")
  }

  /** Range (interval) join: match each point row (`ts`) to the interval
    * rows `[start, end)` of the same `key`. Spark has no optimized range
    * join, and a bare inequality join plans as a nested loop — so the
    * intervals are exploded to the coarse time buckets they cover
    * (`sequence` on `bucketUs`-sized epochs) and the join runs as an
    * equi-join on (key, bucket) with the range predicate as a residual
    * filter. Shuffle volume is O(points + intervals × span/bucketUs),
    * never the cross product; pick `bucketUs` ≈ the typical span.
    *
    * Inner semantics; each matching (point, interval) pair appears
    * exactly once (a point lives in exactly one bucket).
    */
  def rangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      key: String,
      ts: String,
      start: String,
      end: String,
      bucketUs: Long
  ): DataFrame = {
    val p = points
      .withColumn("__bp", floor(unix_micros(col(ts)) / bucketUs))
    val i = intervals
      // degenerate intervals (end <= start) match nothing — and MUST be
      // dropped before sequence(), which would otherwise produce a
      // DESCENDING bucket range (step -1) and explode junk rows
      .filter(col(end) > col(start))
      .withColumnRenamed(key, "__k")
      .withColumn("__bi", explode(sequence(
        floor(unix_micros(col(start)) / bucketUs),
        // end is exclusive: the last covered bucket is for end - 1µs
        floor((unix_micros(col(end)) - 1) / bucketUs))))
    p.join(i,
        col(key) === col("__k") && col("__bp") === col("__bi") &&
          col(ts) >= col(start) && col(ts) < col(end))
      .drop("__bp", "__bi", "__k")
  }

  /** As-of join via the CUSTOM PHYSICAL OPERATOR (graft.plans
    * .AsOfJoinExec, registered through GraftExtensions): both sides
    * shuffle once on the key, sort within partitions, and a streaming
    * per-partition merge attaches the latest right payload — O(1) memory
    * per partition, no union row-blowup, no window state. Semantics are
    * identical to [[asOfJoin]] (spec-verified); restrictions: integral
    * key, timestamp/long ts columns, right side unique per (key, ts).
    */
  def asOfJoinExec(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String]
  ): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    require(payload.forall(c => !left.columns.contains(c)),
      "payload column names must not collide with left-side columns")
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, name: String) =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column '$name' not found"))
    GraftSqlBridge.ofRows(left.sparkSession,
      graft.plans.AsOfJoinPlan(lp, rp,
        leftKey = attr(lp, key), rightKey = attr(rp, key),
        leftTs = attr(lp, leftTs), rightTs = attr(rp, rightTs),
        payload = payload.map(attr(rp, _))))
  }

  /** As-of join: for each left row, attach the right row with the
    * greatest `rightTs` ≤ `leftTs` within the shared `key` — expressed
    * Spark-first as a tagged union + one window pass (`last(...,
    * ignoreNulls)` carries the latest right payload forward), so both
    * sides shuffle ONCE on the key and no row explosion ever happens
    * (a range-join formulation would be quadratic per key).
    *
    * The right side must be unique per (key, rightTs) — pre-dedup it if
    * not (see Relational.qAsOf for a deterministic dedup recipe).
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String]
  ): DataFrame = {
    val lCols = left.columns.toSeq
    val reserved = Seq("__t", "__tag", "__p", "__m")
    require(!(lCols ++ payload).exists(reserved.contains),
      s"asOfJoin reserves ${reserved.mkString(", ")} as internal column names")
    require(payload.forall(c => !lCols.contains(c)),
      "payload column names must not collide with left-side columns")
    // the payload travels as ONE struct so `last(..., ignoreNulls)`
    // picks all columns from the SAME right row atomically — per-column
    // lasts would backfill a legitimate NULL payload field from an older
    // right row, fabricating rows that never existed
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(c => right.schema(c)))
    val l = left
      .withColumn("__t", col(leftTs))
      .withColumn("__tag", lit(1))
      .withColumn("__p", lit(null).cast(payloadType))
      .select((lCols.map(col) ++ Seq(col("__p"), col("__t"), col("__tag"))): _*)
    val r = right
      .withColumn("__t", col(rightTs))
      .withColumn("__tag", lit(0))
      .withColumn("__p", struct(payload.map(col): _*))
      .select((lCols.map(c =>
        if (c == key) col(key)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("__p"), col("__t"), col("__tag"))): _*)
    val w = Window.partitionBy(col(key)).orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      // getField, not col("__m.<name>"): a payload name containing dots
      // would otherwise parse as a deeper path
      .select((lCols.map(col) ++ payload.map(c => col("__m").getField(c).as(c))): _*)
  }
}
