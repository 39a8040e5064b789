package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** Embedding similarity search: brute-force cosine as the exactness
  * baseline, random-hyperplane LSH bucketing as the scale path.
  *
  * Scale notes (100 TB / billions of vectors):
  *  - brute-force top-k broadcasts the (small) query set and scans the
  *    corpus once — shuffle is only the per-query top-k (rows × k), fine
  *    for offline eval, linear in corpus size per query batch.
  *  - hyperplane LSH assigns each vector a `planes`-bit bucket with
  *    row-local map work; search/join happens within buckets only, so the
  *    candidate set shrinks ~2^planes-fold. Buckets are also the natural
  *    repartition key: co-locate a bucket per task, no global shuffle of
  *    the corpus. (IVF with learned centroids is the next step; the
  *    plumbing — bucket column + within-bucket ranking — is identical.)
  *
  * Hyperplanes are deterministic ±1 vectors derived from an LCG-style hash
  * so the DuckDB oracle can re-derive them exactly; float dot products
  * fold left-to-right in both engines (same IEEE result).
  */
object Similarity {

  /** Σ v[j]*w[j], strict left-to-right — native codegen expression; the
    * `dotHof` fold below is the interpreted cross-check twin. */
  def dot(v: Column, w: Column): Column =
    org.apache.spark.sql.GraftSql.column(
      graft.functions.TextHashExprs.DotExpr(
        org.apache.spark.sql.GraftSql.expression(v),
        org.apache.spark.sql.GraftSql.expression(w)))

  def norm(v: Column): Column = sqrt(dot(v, v))

  /** LSH bucket id: bit i = sign of the dot with hyperplane i (native). */
  def hyperplaneBucket(v: Column, dim: Int, planes: Int): Column =
    org.apache.spark.sql.GraftSql.column(
      graft.functions.TextHashExprs.HyperplaneBucketExpr(
        org.apache.spark.sql.GraftSql.expression(v), dim, planes))

  /** Σ v[j]*w[j] as a strict left-to-right double fold (HOF twin). */
  def dotHof(v: Column, w: Column): Column =
    aggregate(zip_with(v, w, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** ±1 component j of hyperplane i (deterministic pseudo-random; stride
    * `dim` keeps planes independent for every dimension). */
  private def planeSign(i: Int, j: Column, dim: Int): Column = {
    val h = (j + lit(dim.toLong * i)) * 1103515245L % TextHash.P
    when(((h + 12345L) % TextHash.P) % 2L === 0L, lit(1.0)).otherwise(lit(-1.0))
  }

  /** HOF twin of hyperplaneBucket (cross-check + documentation). */
  def hyperplaneBucketHof(v: Column, dim: Int, planes: Int): Column =
    (0 until planes).map { i =>
      val proj = aggregate(
        zip_with(v, transform(sequence(lit(0), lit(dim - 1)), j => planeSign(i, j, dim)),
          (x, s) => x * s),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Rank candidate (query_id, neighbor, cos) rows to per-query top-k via
    * the engine's bounded TopK Aggregator: per-group state is k rows,
    * partially aggregated map-side, so shuffle volume is O(queries × k) —
    * a row_number window would shuffle AND sort every candidate row.
    * Ordering (cos DESC, id ASC) matches the Aggregator's (value DESC,
    * id ASC), keeping ranks bit-identical to the window form. */
  private def rankTopK(pairs: DataFrame, idCol: String, cos: Column, k: Int): DataFrame = {
    val topk = udaf(new graft.functions.Aggregators.TopK(k))
    pairs
      .groupBy(col("query_id"))
      .agg(topk(cos, col(idCol)).as("__top"))
      .select(col("query_id"), posexplode(col("__top")).as(Seq("pos", "row")))
      .select(col("query_id"), col("row.id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** Brute-force cosine top-k: for each query vector (from `queryPred`),
    * the k nearest others by cosine. Query side is broadcast. */
  def bruteForceTopK(
      emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int): DataFrame = {
    val e = emb.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
    val n = e.withColumn("nrm", norm(col("v")))
    val q = n.filter(queryPred).select(
      col(idCol).as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val pairs = n.join(broadcast(q), col(idCol) =!= col("query_id"))
    val cos = dot(col("v"), col("qv")) / (col("nrm") * col("qn"))
    rankTopK(pairs, idCol, cos, k)
  }

  /** LSH-bucketed top-k: identical ranking, but candidates are restricted
    * to the query's hyperplane bucket(s) — the scale path. Recall < 1 by
    * design; raise `planes` ↓bucket size, raise `probes` ↑recall.
    *
    * `probes` is the multi-probe knob: each query examines its own bucket
    * plus `probes - 1` Hamming-1 neighbors (bit j flipped, ascending j) —
    * cost scales linearly in probes ON THE QUERY SIDE ONLY (the corpus is
    * neither re-hashed nor re-shuffled; the broadcast query set just
    * carries `probes` bucket keys per query). */
  def lshTopK(
      emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, dim: Int, planes: Int,
      probes: Int = 1): DataFrame = {
    require(probes >= 1 && probes <= planes + 1,
      s"probes must be in [1, planes + 1], got $probes")
    val e = emb.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
    val n = e.withColumn("nrm", norm(col("v")))
      .withColumn("bucket", hyperplaneBucket(col("v"), dim, planes))
    val q = n.filter(queryPred).select(
      col(idCol).as("query_id"), col("v").as("qv"),
      col("nrm").as("qn"),
      explode(array((0 until probes).map {
        case 0 => col("bucket")
        case i => col("bucket").bitwiseXOR(lit(1L << (i - 1)))
      }: _*)).as("qbucket"))
    val pairs = n.join(broadcast(q),
      col("bucket") === col("qbucket") && col(idCol) =!= col("query_id"))
    val cos = dot(col("v"), col("qv")) / (col("nrm") * col("qn"))
    rankTopK(pairs, idCol, cos, k)
  }

  /** IVF (inverted-file) cell assignment: every vector joins the cell of
    * its max-cosine centroid. The centroid set here is deterministic (the
    * first `nCentroids` vectors by id — a stand-in for a kmeans training
    * job; production swaps in learned centroids, the plumbing is
    * identical).
    *
    * Scale shape: the centroids are gathered into ONE array-of-structs row
    * (sorted by cid) and broadcast-nested-loop-joined onto the corpus — a
    * 1-row broadcast, so the corpus keeps its scan partitioning with ZERO
    * exchanges between scan and cell assignment. The argmax is a per-row
    * left-to-right fold over that array; strict `>` keeps the first
    * (lowest-cid) maximum, the same order as a (cos desc, cid asc)
    * tie-break, so the assignment stays bit-deterministic and
    * oracle-reproducible. (The former implementation exploded n×C rows
    * through a row_number window — a corpus×C shuffle the fold avoids.)
    * Emits (idCol, v, nrm, cell). */
  def ivfCells(
      emb: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int): DataFrame = {
    val e = emb.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", norm(col("v")))
    val cents = e.filter(col(idCol) < nCentroids)
      .select(struct(col(idCol).as("cid"), col("v").as("cv"),
        col("nrm").as("cnrm")).as("c"))
      .agg(array_sort(collect_list(col("c"))).as("__cents"))
    // NaN cosine (zero-norm vector) must BEAT every real cosine — the
    // (cos desc, cid asc) window this fold replaced orders NaN first
    // (Spark's total order ranks NaN greatest), so a zero vector joins
    // the first centroid's cell, not a phantom cell -1.
    val best = aggregate(
      col("__cents"),
      struct(lit(-2.0).as("cos"), lit(-1L).as("cid")),
      (acc, c) => {
        val cos = dot(col("v"), c.getField("cv")) / (col("nrm") * c.getField("cnrm"))
        val wins = cos > acc.getField("cos") ||
          (isnan(cos) && !isnan(acc.getField("cos")))
        when(wins, struct(cos.as("cos"), c.getField("cid").as("cid")))
          .otherwise(acc)
      })
    e.join(broadcast(cents))
      .select(col(idCol), col("v"), col("nrm"), best.getField("cid").as("cell"))
  }

  /** IVF top-k: rank candidates within the query's `nprobe` closest cells —
    * the learned-partitioning sibling of lshTopK. `nprobe = 1` searches
    * each query's own cell (zero extra work: the cell is already assigned
    * row-locally); `nprobe > 1` ranks ALL centroids per query and probes
    * the top n — that ranking is a queries × nCentroids problem on the
    * (small, broadcast) query side only, so recall is bought without
    * touching the corpus layout. */
  def ivfTopK(
      emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, nCentroids: Int,
      nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1 && nprobe <= nCentroids,
      s"nprobe must be in [1, nCentroids], got $nprobe")
    val cells = ivfCells(emb, idCol, vecCol, nCentroids)
    val q =
      if (nprobe == 1)
        cells.filter(queryPred).select(
          col(idCol).as("query_id"), col("v").as("qv"),
          col("nrm").as("qn"), col("cell").as("qcell"))
      else {
        val e = emb.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
          .withColumn("nrm", norm(col("v")))
        val cents = e.filter(col(idCol) < nCentroids).select(
          col(idCol).as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
        val qXc = cells.filter(queryPred)
          .select(col(idCol).as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
          .join(broadcast(cents))
        val qcos = dot(col("qv"), col("cv")) / (col("qn") * col("cnrm"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id")).orderBy(qcos.desc, col("cid").asc)
        qXc.withColumn("__rn", row_number().over(w))
          .where(col("__rn") <= nprobe)
          .select(col("query_id"), col("qv"), col("qn"), col("cid").as("qcell"))
      }
    val pairs = cells.join(broadcast(q),
      col("cell") === col("qcell") && col(idCol) =!= col("query_id"))
    val cos = dot(col("v"), col("qv")) / (col("nrm") * col("qn"))
    rankTopK(pairs, idCol, cos, k)
  }

  /** Embedding near-duplicate pairs: same-bucket candidates verified by
    * exact cosine >= `minCos`. Shuffle is the bucket self-join — volume
    * per bucket is |bucket|², the whole point of bucketing first. */
  def cosineNearDupPairs(
      emb: DataFrame, idCol: String, vecCol: String,
      dim: Int, planes: Int, minCos: Double): DataFrame = {
    val e = emb.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
    val n = e.withColumn("nrm", norm(col("v")))
      .withColumn("bucket", hyperplaneBucket(col("v"), dim, planes))
    val a = n.select(col("bucket"), col(idCol).as("id_a"),
      col("v").as("v_a"), col("nrm").as("n_a"))
    val b = n.select(col("bucket"), col(idCol).as("id_b"),
      col("v").as("v_b"), col("nrm").as("n_b"))
    val cos = dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b"))
    a.join(b, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine", cos)
      .where(col("cosine") >= minCos)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
