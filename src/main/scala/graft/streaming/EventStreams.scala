package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}

/** Structured Streaming operators over the events stream
  * (SURVEY.md §2 F1/F2) — the batch twins are Relational.qTumbling
  * (B11) and Relational.qSessionize (B10); StreamingSpec asserts
  * stream == batch on the same data.
  *
  * Scale posture: state is keyed by (window, type) / user_id — Spark
  * shards it across executors by key hash; watermarks bound state size
  * in production append mode.
  */
object EventStreams {

  /** F1: tumbling 1-hour aggregate. Works identically on a batch or
    * streaming DataFrame (`window(...)` ≡ B11's date_trunc bucketing).
    */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("sum_value"))

  /** Production streaming form: watermark bounds state for append mode. */
  def tumblingStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    tumblingAgg(events.withWatermark("ts", watermark))

  /** Event for the sessionizer: `ts` in epoch micros. */
  final case class Ev(user_id: Long, ts: Long, event_id: Long, value: Double)

  final case class SessionOut(
      user_id: Long,
      session_seq: Long,
      n_events: Long,
      session_start: Long, // epoch micros
      duration_us: Long,
      sum_value: Double)

  /** Carry-over state: sessions closed so far + the open session's events. */
  final case class SessionState(closedCount: Long, open: List[Ev])

  /** F2: session windows (30-minute inactivity gap) via
    * flatMapGroupsWithState in Update mode. Closed sessions are final on
    * first emission; the open session is re-emitted (same session_seq)
    * whenever new events extend it — readers keep the last row per
    * (user_id, session_seq). Requires per-user event-time order across
    * batches (guaranteed under a watermark-disciplined source).
    */
  def sessionize(events: Dataset[Ev], gapUs: Long = 1800L * 1000000L): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout)(
        (uid: Long, batch: Iterator[Ev], state: GroupState[SessionState]) => {
          val prev = state.getOption.getOrElse(SessionState(0L, Nil))
          val all = (prev.open ++ batch).sortBy(e => (e.ts, e.event_id))
          if (all.isEmpty) Iterator.empty
          else {
            // split into gap-delimited sessions
            val sessions = all.tail.foldLeft(List(List(all.head))) { (acc, e) =>
              if (e.ts - acc.head.head.ts > gapUs) List(e) :: acc
              else (e :: acc.head) :: acc.tail
            }.map(_.reverse).reverse
            state.update(SessionState(prev.closedCount + sessions.length - 1, sessions.last))
            sessions.iterator.zipWithIndex.map { case (evs, i) =>
              SessionOut(
                user_id = uid,
                session_seq = prev.closedCount + i + 1,
                n_events = evs.length,
                session_start = evs.head.ts,
                duration_us = evs.last.ts - evs.head.ts,
                sum_value = evs.map(_.value).sum)
            }
          }
        })
  }
}
