package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over a directed edge list — the graph-centrality sibling of
  * [[Components]]: dedup wants "which vertices are the same", corpus
  * curation wants "which vertices matter". The canonical use in an
  * LLM-data pipeline is link-graph quality weighting (Common-Crawl-style
  * harvests carry a page/host link graph; rank is a standard prior for
  * sampling weight), and the same kernel ranks any co-occurrence graph
  * (part↔supplier, user↔item).
  *
  * All arithmetic is FIXED-POINT INTEGER: ranks live in `q` units
  * (micro-units by default) as BIGINT, every division is floor division,
  * and every sum is an exact integer sum — so the result is bit-identical
  * across runs, partitionings, and engines (a DuckDB oracle reproduces it
  * value-for-value; float power iteration would differ in the last ulps
  * under shuffle reordering). The cost: each iteration floors away at most
  * 1 unit per edge and per damping multiply, an absolute rank error
  * bounded by `iters * (indegree + 1)` units — at q = 1e6 that is
  * noise-level for ranking purposes.
  *
  * Per iteration: one join of the (cached, degree-annotated) edge list
  * with the current ranks on `src` + one sum-aggregate keyed by `dst` +
  * one left join back to the vertex set — all shuffles keyed by vertex,
  * volume O(edges), map-side combinable. That is the Pregel cost shape
  * expressed as DataFrame joins, so Catalyst/AQE handle skew (hub
  * vertices) and partition sizing; iterations = caller-fixed (power
  * iteration converges geometrically; 10–20 suffices in practice).
  * Lineage is truncated with an eager localCheckpoint per round, freed as
  * soon as the next round materializes (same discipline as
  * [[Components.connectedComponents]]).
  *
  * Dangling vertices (appearing only as destinations) leak their mass —
  * the standard simplified formulation. Callers that need conservation
  * symmetrize the edge list (as the co-occurrence gate does) or add
  * self-loops.
  */
object Graph {

  /** Fixed-point PageRank.
    *
    * rank0(v)   = q / N
    * rank+1(v)  = ((dampDen-dampNum) * q) / (dampDen * N)
    *              + (dampNum * Σ_{u→v} rank(u) / outdeg(u)) / dampDen
    * (every `/` a floor division in BIGINT)
    *
    * @param edges   directed edges, one (src, dst) per row; duplicates
    *                are collapsed (unweighted graph)
    * @param iters   power-iteration count (fixed, no convergence probe —
    *                deterministic cost and a deterministic oracle)
    * @param q       fixed-point scale: ranks are in units of 1/q
    * @param dampNum,dampDen damping factor as a rational (default 85/100)
    * @return (node, rank_q) for every vertex, rank_q = rank * q as BIGINT */
  def pageRank(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, q: Long = 1000000L,
      dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(q > 0, s"q must be positive, got $q")
    require(dampDen > 0 && dampNum >= 0 && dampNum <= dampDen,
      s"damping must satisfy 0 <= dampNum <= dampDen, got $dampNum/$dampDen")
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .distinct().persist()
    // Degree-annotated edges, joined ONCE and cached — the loop body then
    // pays one join per round (ranks onto ed), not two.
    val ed = e
      .join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .persist()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct().persist()
    try {
      val n = nodes.count() // one driver scalar, like kmeans' seed
      require(n > 0, "pageRank needs a non-empty edge list")
      val telQ = ((dampDen - dampNum) * q) / (dampDen * n)
      val initQ = q / n
      var ckpt = nodes.withColumn("rank_q", lit(initQ)).localCheckpoint()
      var ranks = ckpt
      for (_ <- 0 until iters) {
        val contrib = ed
          .join(ranks.select(col("node").as("src"), col("rank_q")), "src")
          .select(col("dst").as("node"), expr("rank_q div outdeg").as("__c"))
          .groupBy("node").agg(sum(col("__c")).as("__acc"))
        val next = nodes.join(contrib, Seq("node"), "left_outer")
          .select(col("node"), expr(
            s"$telQ + ($dampNum * coalesce(__acc, CAST(0 AS BIGINT))) div $dampDen")
            .as("rank_q"))
          .localCheckpoint()
        org.apache.spark.sql.GraftSql.freeLocalCheckpoint(ckpt)
        ckpt = next
        ranks = next
      }
      ranks
    } finally { e.unpersist(); ed.unpersist(); nodes.unpersist(); () }
  }
}
