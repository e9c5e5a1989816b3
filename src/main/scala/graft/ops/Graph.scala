package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Minimal distributed graph utilities for the dedup pipeline: near-dup
  * pair generation (SimHash / MinHash / embedding LSH) produces EDGES;
  * deduplication needs GROUPS — every document labeled with one canonical
  * representative per connected component, so "keep one per group" is a
  * simple filter.
  */
object Graph {

  /** Connected components by iterative min-label propagation:
    * rep(v) ← min(rep(v), min over neighbors rep(u)) until fixpoint.
    * Each round is one shuffle-join plus an aggregation — O(diameter)
    * rounds, and near-dup components are shallow (dup clusters, not long
    * chains). Labels are localCheckpoint'ed per round to truncate the
    * growing lineage (the standard Spark iterative-algorithm discipline —
    * state lives on executors, never the driver; only the convergence
    * count crosses to the driver).
    *
    * Output: (id, group_rep) for EVERY node — isolated nodes map to
    * themselves; group_rep is the component's minimum id.
    */
  def connectedComponents(nodes: DataFrame, idCol: String,
                          edges: DataFrame, aCol: String, bCol: String,
                          maxIters: Int = 20): DataFrame = {
    // Materialize the symmetric edge list ONCE: without this, every
    // propagation round re-evaluates the upstream edge pipeline (e.g. the
    // whole SimHash near-dup query) from scratch.
    val sym = edges.select(col(aCol).as("_src"), col(bCol).as("_dst"))
      .union(edges.select(col(bCol).as("_src"), col(aCol).as("_dst")))
      .localCheckpoint(true)
    def labelSum(l: DataFrame): BigDecimal = {
      val d = l.agg(sum(col("group_rep").cast("decimal(38,0)"))).head().getDecimal(0)
      if (d == null) BigDecimal(0) else BigDecimal(d) // null sum = empty node set
    }
    var labels = nodes.select(col(idCol).as("id"), col(idCol).as("group_rep"))
      .localCheckpoint(true)
    var prevSum = labelSum(labels)
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val nbrMin = sym.join(labels, col("_src") === col("id"))
        .groupBy(col("_dst"))
        .agg(min("group_rep").as("_nbr_rep"))
      val next = labels.join(nbrMin, labels("id") === nbrMin("_dst"), "left")
        .select(labels("id"),
          least(col("group_rep"), coalesce(col("_nbr_rep"), col("group_rep"))).as("group_rep"))
        .localCheckpoint(true)
      // labels are monotone non-increasing, so the (exact, decimal) label
      // sum strictly decreases until the fixpoint — a single lightweight
      // aggregation instead of a join-based change count per round.
      val nextSum = labelSum(next)
      labels = next
      converged = nextSum == prevSum
      prevSum = nextSum
      i += 1
    }
    labels
  }
}
