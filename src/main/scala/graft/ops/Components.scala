package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the near-dup
  * endgame: LSH/Jaccard emit duplicate PAIRS, but deduplication needs
  * duplicate CLUSTERS (keep one canonical doc per component, drop the
  * rest). The component label is the smallest reachable vertex id, so the
  * canonical choice is deterministic and oracle-reproducible.
  *
  * Algorithm: min-label propagation. Each round every vertex takes the
  * minimum of its own label and its neighbors' labels; fixpoint = each
  * component uniformly labeled by its minimum id. Per round: one join of
  * the (symmetrized, cached) edge list with the labels + one min-aggregate
  * — both shuffles keyed by vertex, volume O(edges). Rounds needed = graph
  * diameter; near-dup components are short chains (a few hops), so this
  * converges in a handful of rounds. For adversarial long-chain graphs at
  * 100 TB, swap the body for the alternating large-star/small-star
  * rewrite (Kiveris et al., "Connected Components in MapReduce"), which
  * converges in O(log n) rounds with the same per-round plan shape; the
  * propagation below is the right default for dedup workloads.
  *
  * Lineage is truncated with an eager localCheckpoint every round — an
  * iterative plan otherwise grows by two joins per round until the
  * optimizer chokes. localCheckpoint stores blocks on executors, so an
  * executor loss mid-computation fails the job unrecoverably (acceptable
  * for a bounded dedup pass; use reliable `checkpoint` if the cluster
  * preempts executors). The convergence probe is a driver-side count of
  * changed labels (one scalar per round, not a data collect).
  */
object Components {

  /** @param edges    undirected edges, one pair per row
    * @param aCol,bCol endpoint columns (any integral type)
    * @param maxRounds hard stop (propagation needs `diameter` rounds)
    * @return (id, component) for every vertex in `edges`, component =
    *         minimum id reachable from the vertex */
  def connectedComponents(
      edges: DataFrame, aCol: String, bCol: String,
      maxRounds: Int = 50): DataFrame = {
    val sym = edges
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .unionByName(edges
        .select(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst")))
      .distinct()
      .persist()
    try {
      var labels = sym.select(col("src").as("id")).distinct()
        .withColumn("comp", col("id"))
        .localCheckpoint()
      var round = 0
      var changed = 1L
      while (changed > 0 && round < maxRounds) {
        val nbrMin = sym
          .join(labels.select(col("id").as("dst"), col("comp").as("__nc")), "dst")
          .groupBy(col("src").as("id"))
          .agg(min(col("__nc")).as("__nbr_min"))
        val next = labels.join(nbrMin, Seq("id"), "left_outer")
          .select(col("id"),
            least(col("comp"), coalesce(col("__nbr_min"), col("comp"))).as("comp"),
            (col("__nbr_min") < col("comp")).as("__changed"))
          .localCheckpoint()
        changed = next.where(col("__changed")).count()
        labels = next.drop("__changed")
        round += 1
      }
      require(changed == 0,
        s"connected components did not converge in $maxRounds rounds — " +
          "graph diameter exceeds the bound; raise maxRounds or use the " +
          "log-round star rewrite for chain-heavy graphs")
      labels
    } finally { sym.unpersist(); () }
  }
}
