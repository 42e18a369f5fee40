package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared stateful-streaming partition scope (hoisted r16, ADVICE r15:
  * qRasterStream had inlined a private copy of StreamingGates'
  * withStreamPartitions — one definition, two users, and one place to
  * document the session-global conf mutation).
  *
  * Every stream gate runs its micro-batches under a SMALL stateful
  * shuffle-partition count: the arrival sets are count-bounded but each
  * micro-batch pays state-store open/commit/maintenance PER PARTITION —
  * at the session's 32 that overhead is a multiple of the useful work
  * (q_stream_session measured 17.3s at 32 partitions vs the gate
  * budget; the state itself is a few thousand keys). 8 partitions keep
  * the operators genuinely parallel while the state machinery stays
  * proportional to the state. Results are partition-count-independent
  * (keyed state semantics); the conf is restored afterwards.
  *
  * The set/restore mutates the SESSION conf, so two gates must not run
  * concurrently on the same session (the bench and Verify run queries
  * sequentially; a concurrent deployment should use separate sessions
  * or `SparkSession.newSession()` per stream).
  */
object StreamScope {
  def withStreamPartitions(s: SparkSession, n: Int = 8)(f: => DataFrame): DataFrame = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n.toString)
    try f finally s.conf.set(key, prev)
  }
}
