package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph helpers for the dedup pipeline (SURVEY.md §2 C16):
  * near-dup PAIRS only become actionable once they are grouped into
  * clusters with one canonical keeper per cluster.
  */
object Graphs {

  /** Triangle enumeration by DEGREE-ORDERED edge iteration (the
    * distributed standard — Suri & Vassilvitskii's "Counting triangles
    * and the curse of the last reducer"): orient every undirected edge
    * from its lower-(degree, id) endpoint to the higher, so each
    * wedge u→v, u→w is generated at its LOWEST-ordered vertex — hub
    * nodes never fan out (a node's oriented out-degree is O(√m)
    * regardless of its raw degree, which is exactly the skew bound
    * the naive node-centric join lacks), and every triangle is
    * produced exactly once. One broadcastable degree dim, one
    * self-join on the wedge center, one (v, w) semi-join against the
    * oriented edge set — no cartesian, no per-node windows.
    *
    * Input: distinct undirected edges (lo, hi), lo < hi.
    * Output: one row per triangle (u, v, w) in orientation order.
    */
  def orientedTriangles(edges: DataFrame): DataFrame = {
    // order key: the (degree, id) STRUCT — Spark orders structs
    // lexicographically, so the total order is exact for ANY id
    // domain (the earlier packed long d·100000 + id broke it for
    // ids ≥ 10⁵; GraphsSpec pins that boundary). Oracles that need
    // the same order on bounded fixtures may still pack.
    val deg = edges.select(col("lo").as("n"))
      .union(edges.select(col("hi").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
      .select(col("n"), struct(col("d"), col("n")).as("ordk"))
    val e = edges
      .join(broadcast(deg.withColumnRenamed("n", "lo").withColumnRenamed("ordk", "ord_lo")), "lo")
      .join(broadcast(deg.withColumnRenamed("n", "hi").withColumnRenamed("ordk", "ord_hi")), "hi")
    val oriented = e.select(
      when(col("ord_lo") < col("ord_hi"), col("lo")).otherwise(col("hi")).as("src"),
      when(col("ord_lo") < col("ord_hi"), col("hi")).otherwise(col("lo")).as("dst"),
      when(col("ord_lo") < col("ord_hi"), col("ord_hi")).otherwise(col("ord_lo")).as("dst_ord"))
    val o2 = oriented.select(col("src").as("src2"), col("dst").as("dst2"),
                             col("dst_ord").as("dst_ord2"))
    val wedges = oriented.join(o2, col("src") === col("src2") &&
                                   col("dst_ord") < col("dst_ord2"))
      .select(col("src").as("u"), col("dst").as("v"), col("dst2").as("w"))
    wedges.join(oriented.select(col("src").as("v"), col("dst").as("w")),
                Seq("v", "w"), "left_semi")
  }

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
    // round 1's labels derive from the edge pin (still needed every
    // round) — only release label frames this loop pinned itself
    var labelsPinned = false
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
      // the superseded round's pin is dead once the changed-count read
      // it — release, or storage grows linearly with rounds
      if (labelsPinned) graft.core.Materialize.release(labels)
      labels = prop
      labelsPinned = true
      converged = changed == 0
      it += 1
    }
    // an unconverged result silently mislabels components — refuse it
    require(converged,
      s"connectedComponents did not converge in $maxIters rounds " +
        "(component diameter exceeds the iteration budget; raise maxIters)")
    labels
  }

  /** FIXED-POINT PageRank over an undirected edge list (a, b) — ranks
    * in 10⁻⁹ units, damping 0.85 as the exact rational 17/20:
    *
    *   r₀ = 10⁹;  r_{k+1}(v) = 0.15·10⁹ + (17 · Σ_{u~v} (r_k(u) div deg u)) div 20
    *
    * Every operation is INTEGER (div = floor on positives), so partial
    * aggregation order cannot move a single bit — a float PageRank's
    * neighbor sums drift with Spark's partial-agg order and can never
    * be hash-compared across engines. The quantization error vs real
    * PageRank is ≤ deg·10⁻⁹ per step — noise for ranking, exactness
    * for the gate. Each iteration is one join + one aggregate keyed on
    * node id (the CC shuffle shape); iterations are FIXED (k=3), so no
    * convergence count and no checkpoint dependence — the plan is a
    * static 3-deep chain Catalyst pipelines end-to-end.
    */
  def pagerankFixedPoint(edgesAB: DataFrame, iters: Int = 3): DataFrame = {
    val mat = graft.core.Materialize.pin(edgesAB.select(col("a"), col("b")))
    val edges = mat
      .union(mat.select(col("b").as("a"), col("a").as("b")))
      .select(col("a").as("src"), col("b").as("dst"))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val e = graft.core.Materialize.pin(edges.join(deg, "src"))
    var ranks = e.select(col("src").as("id")).distinct()
      .select(col("id"), lit(1000000000L).as("r"))
    for (_ <- 1 to iters) {
      ranks = pagerankStep(e, ranks)
    }
    ranks
  }

  /** One integer fixed-point PageRank update (shared by the unrolled
    * and the converging forms — identical arithmetic by construction).
    */
  private def pagerankStep(e: DataFrame, ranks: DataFrame): DataFrame = {
    val contrib = e.join(ranks.withColumnRenamed("id", "src"), "src")
      .select(col("dst").as("id"), expr("r div deg").as("c"))
    contrib.groupBy(col("id"))
      .agg(sum(col("c")).as("sm"))
      .select(col("id"), expr("150000000 + (17 * sm) div 20").as("r"))
  }

  /** CONVERGING PageRank for real use (the oracled q_pagerank keeps the
    * fixed 3-iteration unrolled form as its declared contract): iterate
    * [[pagerankStep]] until the max per-node rank change is ≤ `tolE9`
    * (units of 10⁻⁹ rank) or `maxIters` rounds, with the C16 idiom —
    * every round's ranks pinned (reliable checkpoint when a dir is
    * configured, else localCheckpoint) so round k never replays rounds
    * 1..k−1, and the convergence check is ONE scalar aggregate per
    * round, no data collected. Integer arithmetic means the iteration
    * can oscillate by a few quanta around its fixed point instead of
    * reaching it exactly; a tolE9 of a few thousand (≈ 10⁻⁶ rank)
    * absorbs that while still being far below ranking resolution.
    *
    * Returns (ranks, iterations run). An unconverged result fails
    * loudly, mirroring connectedComponents.
    */
  def pagerankConverged(edgesAB: DataFrame, maxIters: Int = 20,
                        tolE9: Long = 1000L): (DataFrame, Int) = {
    val mat = graft.core.Materialize.pin(edgesAB.select(col("a"), col("b")))
    val edges = mat
      .union(mat.select(col("b").as("a"), col("a").as("b")))
      .select(col("a").as("src"), col("b").as("dst"))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val e = graft.core.Materialize.pin(edges.join(deg, "src"))
    // the raw edge pin only feeds e's build — release it now
    graft.core.Materialize.release(mat)
    var ranks = graft.core.Materialize.pin(
      e.select(col("src").as("id")).distinct()
        .select(col("id"), lit(1000000000L).as("r")))
    var it = 0
    var converged = false
    while (!converged && it < maxIters) {
      val next = graft.core.Materialize.pin(pagerankStep(e, ranks))
      // max over an empty frame (edgeless input) is null -> converged
      val row = next.withColumnRenamed("r", "rn")
        .join(ranks, "id")
        .agg(max(abs(col("rn") - col("r"))).as("d"))
        .collect()(0)
      val delta = if (row.isNullAt(0)) 0L else row.getLong(0)
      // round k's pin is no longer referenced once the delta check read
      // it — release, or storage grows linearly with iterations
      graft.core.Materialize.release(ranks)
      ranks = next
      it += 1
      converged = delta <= tolE9
    }
    require(converged,
      s"pagerank did not converge to tol=$tolE9 in $maxIters rounds")
    (ranks, it)
  }

  /** [[pagerankConverged]], ranks only. */
  def pagerank(edgesAB: DataFrame, maxIters: Int = 20, tolE9: Long = 1000L): DataFrame =
    pagerankConverged(edgesAB, maxIters, tolE9)._1
}
