package graft.core

import org.apache.spark.sql.DataFrame

/** Lineage-truncating materialization for iterative / multi-consumer
  * frames (connected-components rounds, shingle sets read by both the
  * candidate and verify sides of a dedup join).
  *
  * Cluster posture: when the session has a checkpoint directory
  * configured (`sparkContext.setCheckpointDir`, backed by HDFS/object
  * storage on a real cluster), `pin` uses reliable `checkpoint()` —
  * blocks survive executor loss, so an iterative job degrades to a
  * re-read instead of aborting. Without one it falls back to
  * `localCheckpoint()` (blocks live in executor storage; single-node /
  * dev-only, an executor loss kills the lineage). The fallback keeps
  * `local[*]` tests and notebooks zero-config.
  */
object Materialize {

  /** Materialize `df` eagerly and truncate its lineage. */
  def pin(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()
}
