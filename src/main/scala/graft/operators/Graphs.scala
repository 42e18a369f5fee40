package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph helpers for the dedup pipeline (SURVEY.md §2 C16):
  * near-dup PAIRS only become actionable once they are grouped into
  * clusters with one canonical keeper per cluster.
  */
object Graphs {

  /** Connected components by iterative min-label propagation — the
    * standard large-graph formulation (each round: every node adopts
    * the smallest label among itself and its neighbors; converges in
    * O(diameter) rounds, each one join + one aggregate shuffle keyed
    * on node id). Near-dup graphs have tiny diameters (dup clusters
    * are cliques or near-cliques), so 2-3 rounds settle in practice;
    * the driver loop stops on a converged round (a count on the
    * propagated frame — one scalar per round, no data collected).
    *
    * Input: undirected edges (a, b). Output: (id, component) for every
    * endpoint, component = the smallest node id reachable.
    */
  def connectedComponents(edges: DataFrame, maxIters: Int = 20): DataFrame = {
    // materialize the edge set ONCE: the caller's edge pipeline (e.g.
    // the full MinHash-LSH candidate cascade) would otherwise re-execute
    // on every iteration AND every convergence count — observed 17x on
    // the dedup-clusters bench. Materialize.pin = reliable checkpoint()
    // when a checkpoint dir is configured (cluster mode — survives
    // executor loss), localCheckpoint() otherwise (single-node dev).
    val mat = graft.core.Materialize.pin(edges.select(col("a"), col("b")))
    val bidir = mat
      .union(mat.select(col("b").as("a"), col("a").as("b")))
    val nodes = bidir.select(col("a").as("id")).distinct()
    var labels = nodes.select(col("id"), col("id").as("component"))
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      // neighbor labels + own label, take the min per node; pin so the
      // round runs ONCE (the convergence count would otherwise
      // re-execute it, and each later round would replay all earlier
      // ones — O(rounds^2) plus a full replay at consumption)
      val prop = graft.core.Materialize.pin(bidir
        .join(labels.withColumnRenamed("id", "b").withColumnRenamed("component", "nbl"), "b")
        .select(col("a").as("id"), col("nbl").as("component"))
        .union(labels)
        .groupBy(col("id"))
        .agg(min(col("component")).as("component")))
      val changed = prop.alias("n")
        .join(labels.alias("o"), col("n.id") === col("o.id"))
        .filter(col("n.component") =!= col("o.component"))
        .count()
      labels = prop
      converged = changed == 0
      it += 1
    }
    // an unconverged result silently mislabels components — refuse it
    require(converged,
      s"connectedComponents did not converge in $maxIters rounds " +
        "(component diameter exceeds the iteration budget; raise maxIters)")
    labels
  }
}
