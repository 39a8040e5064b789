package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Pack quantized integer-valued doubles in [-127, 127] into true int8
    * bytes (BinaryType) — native codegen kernel. */
  def packI8(v: Column): Column =
    org.apache.spark.sql.GraftSql.column(
      graft.functions.TextHashExprs.PackI8Expr(
        org.apache.spark.sql.GraftSql.expression(v)))

  /** Exact integer Σ a[j]·b[j] over packed int8 code columns (native). */
  def dotI8(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSql.column(
      graft.functions.TextHashExprs.DotI8Expr(
        org.apache.spark.sql.GraftSql.expression(a),
        org.apache.spark.sql.GraftSql.expression(b)))

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

  /** Deterministic random-projection dimensionality reduction — the
    * Johnson-Lindenstrauss sketch that precedes clustering/ANN when the
    * raw embedding is too wide: out[i] = Σ_j v[j] · sign(i, j) with the
    * SAME deterministic ±1 hyperplane family as the LSH bucketing, so
    * projections are reproducible across runs/engines (no RNG state) and
    * the oracle mirrors them bit-for-bit. Row-local map work, O(dim ×
    * outDim) per row, no shuffle; pairwise distances are preserved up to
    * the JL distortion bound in expectation. Emits (idCol, p0..p{k-1}). */
  def randomProject(
      emb: DataFrame, idCol: String, vecCol: String,
      dim: Int, outDim: Int): DataFrame = {
    require(outDim >= 1 && dim >= 1, s"need dim/outDim >= 1, got $dim/$outDim")
    val e = emb.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
    e.select(col(idCol) +: (0 until outDim).map { i =>
      aggregate(
        zip_with(col("v"),
          transform(sequence(lit(0), lit(dim - 1)), j => planeSign(i, j, dim)),
          (x, s) => x * s),
        lit(0.0), (acc, x) => acc + x).as(s"p$i")
    }: _*)
  }

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

  /** HUBNESS census — the high-dimensional ANN pathology diagnostic
    * (Radovanović 2010): the k-occurrence distribution N_k(x) = how
    * often x appears in other points' k-NN lists. In healthy spaces
    * N_k concentrates near k; in hubby spaces a few points dominate
    * every neighbor list (and near-dup/retrieval quality silently
    * degrades — the thing to MEASURE before trusting any ANN-based
    * dedup). Emits the exact histogram (k_occurrences, n_points),
    * zero-occurrence points included. Candidates come from the
    * hyperplane LSH bucket (the ann_lsh discipline — never all-pairs);
    * distances are exact integer quantized d², (d², id) tie-break, so
    * the census is bit-reproducible. */
  def hubnessCensus(
      emb: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int, planes: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val e = emb.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
      .withColumn("qv", transform(col("v"),
        x => floor(x * lit(1048576.0)).cast("long")))
      .withColumn("bucket", hyperplaneBucket(col("v"), dim, planes))
      .select(col("id"), col("qv"), col("bucket"))
      .persist()
    try {
      val pairs = e.select(col("id").as("src"), col("qv").as("vs"),
          col("bucket").as("bk"))
        .join(e.select(col("bucket").as("bk"), col("id").as("dst"),
          col("qv").as("vd")), Seq("bk"))
        .filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst"),
          TextHash.sqDist(col("vs"), col("vd")).as("d2"))
      val w = Window.partitionBy(col("src"))
        .orderBy(col("d2"), col("dst"))
      val knn = pairs.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= k)
      val occ = e.select(col("id"))
        .join(knn.groupBy(col("dst").as("id"))
          .agg(count(lit(1)).as("n_occ")), Seq("id"), "left")
        .select(coalesce(col("n_occ"), lit(0L)).as("k_occurrences"))
      occ.groupBy(col("k_occurrences"))
        .agg(count(lit(1)).as("n_points"))
        .localCheckpoint()
    } finally { e.unpersist(); () }
  }

  /** Semi-hard negative MINING for triplet/contrastive training — the
    * batch-prep operator an embedding-training pipeline runs over the
    * corpus before every epoch (Schroff 2015 FaceNet §3.2): for each
    * (anchor a, positive p = next id) pair, the negatives n satisfying
    * d²(a,p) < d²(a,n) ≤ 2·d²(a,p) — farther than the positive (not
    * trivially hard/collapsed) but within the margin (still
    * informative); margin = d²(a,p) itself, so the rule is
    * parameter-free and scale-equivariant. Emits per anchor:
    * (id_a, id_pos, d2_pos, n_semihard, id_neg, d2_neg) with the
    * HARDEST qualifying negative (min d², ties to smaller id) and
    * NULLs when none qualifies.
    *
    * Exactness: vectors quantize per-dim to floor(x·2²⁰) BIGINTs and
    * every distance is an exact integer Σ(Δq)² — no float comparisons
    * anywhere, so the mined set is bit-reproducible. Scale: candidates
    * come from the anchor's hyperplane LSH bucket ONLY (the ann_lsh
    * discipline — O(N²/2^planes) pairs, never all-pairs); the argmin
    * window is partitioned per anchor. Identical vectors (d²=0) mine
    * nothing — the strict lower bound excludes them by design. */
  def tripletMining(
      emb: DataFrame, idCol: String, vecCol: String,
      dim: Int, planes: Int): DataFrame = {
    val e = emb.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
      .withColumn("qv", transform(col("v"),
        x => floor(x * lit(1048576.0)).cast("long")))
      .withColumn("bucket", hyperplaneBucket(col("v"), dim, planes))
      .select(col("id"), col("qv"), col("bucket"))
      .persist()
    try {
      // native codegen kernel — a zip_with/aggregate HOF computes the
      // same exact integers but re-enters the interpreter per element
      // (measured ~2x on this gate's bucket join)
      def d2(a: Column, b: Column): Column = TextHash.sqDist(a, b)
      val ap = e.select(col("id").as("id_a"), col("qv").as("va"),
          col("bucket").as("ba"))
        .join(e.select((col("id") - 1L).as("id_a"), col("id").as("id_pos"),
          col("qv").as("vp")), "id_a")
        .select(col("id_a"), col("id_pos"), col("ba"), col("va"),
          d2(col("va"), col("vp")).as("d2_pos"))
      val neg = ap.join(
          e.select(col("bucket").as("ba"), col("id").as("id_neg"),
            col("qv").as("vn")), Seq("ba"))
        .filter(col("id_neg") =!= col("id_a") &&
          col("id_neg") =!= col("id_pos"))
        .withColumn("d2_neg", d2(col("va"), col("vn")))
        .filter(col("d2_neg") > col("d2_pos") &&
          col("d2_neg") <= lit(2L) * col("d2_pos"))
      val mined = neg.groupBy(col("id_a"))
        .agg(count(lit(1)).as("n_semihard"),
          min(struct(col("d2_neg"), col("id_neg"))).as("best"))
      ap.select(col("id_a"), col("id_pos"), col("d2_pos"))
        .join(mined, Seq("id_a"), "left")
        .select(col("id_a"), col("id_pos"), col("d2_pos"),
          coalesce(col("n_semihard"), lit(0L)).as("n_semihard"),
          col("best.id_neg").as("id_neg"),
          col("best.d2_neg").as("d2_neg"))
        .localCheckpoint()
    } finally { e.unpersist(); () }
  }

  /** Scalar-quantized (int8-range) ANN with exact rerank — the
    * memory-bandwidth scale path: embeddings are quantized to integers in
    * [-127, 127] with ONE corpus-wide symmetric scale (`q = clamp(floor(x
    * · 127/S + 0.5))`, S = max |component|), the coarse top-`rerank`
    * candidates per query are ranked on QUANTIZED cosine, and only that
    * tiny candidate set is re-scored with exact float cosine for the
    * final top-`k`. At 100 TB the coarse scan streams int8 codes — 8×
    * less bandwidth than float64 vectors (store the codes as packed
    * BinaryType at rest; this operator demonstrates the compute shape on
    * array columns) — and the exact vectors are fetched for
    * O(queries × rerank) rows only.
    *
    * Determinism: quantized components are exact small integers, so the
    * coarse dot products are EXACT integer arithmetic — the coarse
    * candidate cut is bit-reproducible across engines, no float-fuzz at
    * the rerank boundary. The scale S is a one-row broadcast aggregate;
    * the rerank stage mirrors [[bruteForceTopK]]'s math over candidates
    * only.
    *
    * The codes column is TRUE int8 (BinaryType, packed by the codegen
    * [[packI8]] kernel), and the coarse dot runs the native integer
    * kernel [[dotI8]] over it — the coarse scan touches dim bytes per
    * vector, not dim doubles. The oracle mirrors the LOGICAL values (int
    * lists); packing is a storage detail it cannot observe. */
  def sq8TopK(
      emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, rerank: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(rerank >= k, s"rerank ($rerank) must be >= k ($k)")
    // ONE source scan: the float vectors + norms persist, and every later
    // stage (scale aggregate, quantize/pack, coarse corpus side, query
    // sides, exact-rerank fetch) derives from the cached stages — Spark
    // does not share identical scan branches across a DAG (measured in
    // bm25TopK), so without the persists this operator would re-read and
    // re-quantize the corpus ~5×. The returned frame is materialized
    // eagerly (O(queries × k) rows) so the caches unpersist before return.
    val n = emb
      .select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", norm(col("v")))
      .persist()
    val quant = {
      val scale = n.agg(max(array_max(transform(col("v"), x => abs(x)))).as("s"))
      n.crossJoin(broadcast(scale))
        .withColumn("qv", transform(col("v"), x =>
          greatest(lit(-127.0), least(lit(127.0),
            floor(x * lit(127.0) / col("s") + lit(0.5)).cast("double")))))
        .withColumn("qb", packI8(col("qv")))
        .drop("qv", "v", "nrm", "s")
        .withColumn("qn", sqrt(dotI8(col("qb"), col("qb")).cast("double")))
        .persist()
    }
    try {
      val q = quant.filter(queryPred).select(
        col(idCol).as("query_id"), col("qb").as("qqb"), col("qn").as("qqn"))
      val coarsePairs = quant.join(broadcast(q), col(idCol) =!= col("query_id"))
      val coarse =
        dotI8(col("qb"), col("qqb")).cast("double") / (col("qn") * col("qqn"))
      val cand = rankTopK(coarsePairs, idCol, coarse, rerank)
        .select(col("query_id"), col("neighbor_id"))
      // Exact rerank: fetch true vectors for the candidate set only.
      val qx = n.filter(queryPred).select(
        col(idCol).as("query_id"), col("v").as("qv2"), col("nrm").as("qn2"))
      val exact = cand
        .join(n.select(col(idCol).as("neighbor_id"), col("v"), col("nrm")),
          "neighbor_id")
        .join(broadcast(qx), "query_id")
      val cosx = dot(col("v"), col("qv2")) / (col("nrm") * col("qn2"))
      rankTopK(exact, "neighbor_id", cosx, k).localCheckpoint()
    } finally { quant.unpersist(); n.unpersist(); () }
  }

  /** Binary-quantized ANN (1-bit embeddings): each vector compresses to
    * its 64 SIGN BITS — a 256× memory cut over float32 that keeps
    * enough angular information to shortlist neighbors (the
    * binary-quantization recipe production vector stores ship as their
    * cheapest tier) — coarse-ranked by HAMMING distance on two 32-bit
    * words (popcount, never a float op), then exactly cosine-reranked
    * on the true floats for the `rerank` shortlist only. Same two-stage
    * contract as [[sq8TopK]]; the memory/recall trade sits one notch
    * below SQ8.
    *
    * Packing puts bit j of dims 1-32 in word `lo`, dims 33-64 in `hi`
    * (no BIGINT sign bit anywhere); `v[i] > 0` maps to 1 — exact on
    * both engines. The sign arrays read a PERSISTED vector attribute,
    * so the interpreted HOFs evaluate once per row. */
  def bqTopK(
      emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, rerank: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(rerank >= k, s"rerank ($rerank) must be >= k ($k)")
    val n = emb
      .select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", norm(col("v")))
      .persist()
    val packed = n
      .withColumn("lo", expr(
        "aggregate(transform(sequence(0, 31), j -> " +
          "IF(element_at(v, j + 1) > 0D, shiftleft(1L, j), 0L)), " +
          "0L, (a, x) -> a + x)"))
      .withColumn("hi", expr(
        "aggregate(transform(sequence(32, 63), j -> " +
          "IF(element_at(v, j + 1) > 0D, shiftleft(1L, j - 32), 0L)), " +
          "0L, (a, x) -> a + x)"))
      .drop("v", "nrm")
      .persist()
    try {
      val q = packed.filter(queryPred).select(
        col(idCol).as("query_id"), col("lo").as("qlo"), col("hi").as("qhi"))
      val pairs = packed.join(broadcast(q), col(idCol) =!= col("query_id"))
      val coarse = -(expr("bit_count(lo ^ qlo) + bit_count(hi ^ qhi)")
        .cast("double"))
      val cand = rankTopK(pairs, idCol, coarse, rerank)
        .select(col("query_id"), col("neighbor_id"))
      val qx = n.filter(queryPred).select(
        col(idCol).as("query_id"), col("v").as("qv2"), col("nrm").as("qn2"))
      val exact = cand
        .join(n.select(col(idCol).as("neighbor_id"), col("v"), col("nrm")),
          "neighbor_id")
        .join(broadcast(qx), "query_id")
      val cosx = dot(col("v"), col("qv2")) / (col("nrm") * col("qn2"))
      rankTopK(exact, "neighbor_id", cosx, k).localCheckpoint()
    } finally { packed.unpersist(); n.unpersist(); () }
  }

  /** Fixed-point quantum for k-means mean accumulation: component sums
    * are `floor(x * 2^20)` BIGINTs, so the per-cell reduction is exact
    * integer addition — order-independent across partitions AND engines —
    * and the mean `Σq / (n * 2^20)` is one deterministic IEEE division.
    * A naive double sum would make the learned centroids depend on
    * partition merge order, breaking the hash-exact oracle gates. */
  private val MeanQ = 1048576L

  /** Per-group embedding centroids — the summarization primitive behind
    * SemDeDup-style semantic clustering, per-domain drift monitoring, and
    * class prototypes: the element-wise mean vector of every group.
    * Emits one row per (group, dimension): (groupCol, dim_idx, n_vecs,
    * centroid) — the long layout keeps the gate schema scalar and lets
    * callers pivot to arrays when needed.
    *
    * Determinism at scale: components accumulate in [[MeanQ]] fixed
    * point (exact integer sums, order-independent across partitions and
    * engines), and the mean is one IEEE division — same contract as
    * [[kmeansCentroids]]. Cost: one posexplode (rows × dim) into one
    * map-side-combined hash aggregate keyed by (group, dim); output is
    * O(groups × dim). */
  def groupCentroids(
      emb: DataFrame, groupCol: String, vecCol: String): DataFrame =
    emb
      .select(col(groupCol),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("j", "x")))
      .groupBy(col(groupCol), col("j"))
      .agg(
        sum(floor(col("x") * lit(MeanQ.toDouble)).cast("long")).as("__sq"),
        count(lit(1)).as("n_vecs"))
      .select(col(groupCol), col("j").cast("long").as("dim_idx"),
        col("n_vecs"),
        (col("__sq").cast("double") /
          (col("n_vecs").cast("double") * lit(MeanQ.toDouble)))
          .as("centroid"))

  /** Leading principal component by deterministic power iteration — the
    * drift DIRECTION of an embedding corpus (which axis explains the
    * most variance; project onto it for 1-D drift monitoring, use it to
    * seed whitening): v ← Xᵀ(Xv) over mean-centered vectors, `iters`
    * rounds from the fixed seed e₀, L2-normalized each round. Emits
    * (dim_idx, loading) — 64 rows for a 64-dim corpus.
    *
    * Cross-engine exactness, stage by stage (every float reduction is
    * either exact integers or a strict in-row fold):
    *  - the mean is the [[groupCentroids]] fixed-point mean;
    *  - centered values quantize to longs: cq = floor((x−μ)·2^20);
    *  - each row's projection is a strict fold Σⱼ cqⱼ·vⱼ, floored to a
    *    long q;
    *  - the new direction s_j = Σᵢ qᵢ·cqᵢⱼ accumulates as
    *    DECIMAL(38,0) — exact, order-independent (the linearRegression
    *    discipline);
    *  - the norm is one strict dim-sorted fold + IEEE sqrt (correctly
    *    rounded), the division IEEE. Degenerate zero-variance input
    *    yields NULL loadings (ANSI ÷0 guard), not a throw.
    *
    * Scale: one corpus pass for μ, one to build the persisted quantized
    * matrix, then TWO keyed passes per iteration (row projections +
    * per-dim sums — map-side combinable); v is a 1-row broadcast. No
    * driver data path; the d×1 direction localCheckpoints per round. */
  /** Mean-centered, MeanQ-quantized corpus: (keep..., c: array<long>). */
  private def centeredQuantized(
      emb: DataFrame, vecCol: String, keep: Seq[String]): DataFrame = {
    val q = MeanQ.toDouble
    val muRow = emb
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("j", "x")))
      .groupBy(col("j"))
      .agg(sum(floor(col("x") * lit(q)).cast("long")).as("__sq"),
        count(lit(1)).as("__n"))
      .select(col("j"),
        (col("__sq").cast("double") / (col("__n").cast("double") * lit(q)))
          .as("mu"))
      .agg(sort_array(collect_list(struct(col("j"), col("mu")))).as("__ms"))
      .select(transform(col("__ms"), m => m.getField("mu")).as("__mu"))
    emb.crossJoin(broadcast(muRow))
      .select(keep.map(col) :+
        zip_with(col(vecCol).cast("array<double>"), col("__mu"),
          (x, m) => floor((x - m) * lit(q)).cast("long")).as("c"): _*)
  }

  /** The power loop over a quantized matrix: one-row frame (__v). */
  private def powerDirection(cq: DataFrame, iters: Int): DataFrame = {
    val dec = "decimal(38,0)"
    val dim = cq.select(size(col("c")).as("d")).limit(1)
    var vRow = dim.select(transform(sequence(lit(0), col("d") - 1),
      i => when(i === 0, lit(1.0)).otherwise(lit(0.0))).as("__v"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val proj = cq.crossJoin(broadcast(vRow))
        .select(col("c"),
          floor(aggregate(
            zip_with(col("c"), col("__v"), (c, v) => c.cast("double") * v),
            lit(0.0), (acc, x) => acc + x)).cast("long").as("__q"))
      val s = proj
        .select(col("__q"), posexplode(col("c")).as(Seq("j", "cx")))
        .groupBy(col("j"))
        .agg(sum((col("__q") * col("cx")).cast(dec)).as("__s"))
      val sRow = s
        .agg(sort_array(collect_list(struct(col("j"), col("__s"))))
          .as("__ss"))
        .select(transform(col("__ss"),
          e => e.getField("__s").cast("double")).as("__sv"))
      val nrm = sqrt(aggregate(col("__sv"), lit(0.0),
        (acc, x) => acc + x * x))
      vRow = sRow
        .select(when(nrm =!= 0.0,
          transform(col("__sv"), x => x / nrm)).as("__v"))
        .localCheckpoint()
    }
    vRow
  }

  def pcaPowerIteration(
      emb: DataFrame, vecCol: String, iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val cq = centeredQuantized(emb, vecCol, Nil).persist()
    try {
      powerDirection(cq, iters)
        .select(posexplode(col("__v")).as(Seq("dim_idx", "loading")))
        .select(col("dim_idx").cast("long").as("dim_idx"), col("loading"))
    } finally { cq.unpersist(); () }
  }

  /** 1-D drift scores: each vector's projection onto the corpus's
    * leading principal component ([[pcaPowerIteration]]) — the scalar
    * that turns embedding drift into a plain time series the ts_*
    * operators can watch. Emits (idCol, score) in value units
    * (centered-x·v; the 2^-20 descale is an exact power-of-two
    * multiply). Same determinism as the direction itself: the
    * projection is a strict in-row fold of quantized longs against the
    * broadcast unit vector. Degenerate zero-variance corpora yield NULL
    * scores. */
  def pcaProjection(
      emb: DataFrame, idCol: String, vecCol: String,
      iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val cq = centeredQuantized(emb, vecCol, Seq(idCol)).persist()
    try {
      val v = powerDirection(cq.select(col("c")), iters)
      cq.crossJoin(broadcast(v))
        .select(col(idCol),
          (aggregate(
            zip_with(col("c"), col("__v"), (c, vv) => c.cast("double") * vv),
            lit(0.0), (acc, x) => acc + x) / lit(MeanQ.toDouble))
            .as("score"))
        .localCheckpoint()
    } finally { cq.unpersist(); () }
  }

  /** Embedding outlier audit — mislabel/garbage detection per group:
    * each vector's Euclidean distance to its OWN group centroid,
    * flagged against the group's sketch-p99 distance. Emits only the
    * outliers (idCol, groupCol, dist, p99_dist) — empty result IS the
    * pass, output bounded by the outlier count.
    *
    * Determinism: centroids are the exact fixed-point
    * [[groupCentroids]] means; each distance is a strict in-row fold of
    * squared diffs + IEEE sqrt; the threshold is the deterministic
    * decimal-bucket sketch estimate (Sketches.quantileFromSketch) — no
    * exact global sort of distances. Scale: one corpus pass for
    * centroids (O(groups·dim) broadcast back), one row-local distance
    * pass, one O(buckets) sketch per group. */
  def centroidOutliers(
      emb: DataFrame, idCol: String, groupCol: String, vecCol: String,
      pct: Int = 99): DataFrame = {
    require(pct >= 1 && pct <= 100, s"pct must be in [1,100], got $pct")
    val cent = groupCentroids(emb, groupCol, vecCol)
      .groupBy(col(groupCol))
      .agg(sort_array(collect_list(struct(col("dim_idx"), col("centroid"))))
        .as("__cs"))
      .select(col(groupCol),
        transform(col("__cs"), x => x.getField("centroid")).as("__cv"))
    val dist = emb.join(broadcast(cent), groupCol)
      .select(col(idCol), col(groupCol),
        sqrt(aggregate(
          zip_with(col(vecCol).cast("array<double>"), col("__cv"),
            (x, c) => (x - c) * (x - c)),
          lit(0.0), (acc, v) => acc + v)).as("dist"))
      .persist()
    try {
      val thr = Sketches.quantileFromSketch(
        Sketches.quantileSketch(dist, Seq(groupCol), "dist"),
        Seq(groupCol), Seq(pct))
        .select(col(groupCol), col("est").as("p99_dist"))
      dist.join(broadcast(thr), groupCol)
        .filter(col("dist") > col("p99_dist"))
        .select(col(idCol), col(groupCol), col("dist"), col("p99_dist"))
        .localCheckpoint()
    } finally { dist.unpersist(); () }
  }

  /** Pairwise cosine similarity between per-group centroids — the drift
    * matrix of an embedding corpus: which domains/labels/snapshots sit
    * close in embedding space (distribution drift monitoring, candidate
    * label-merge detection, per-shard sanity checks). Builds on
    * [[groupCentroids]] (exact fixed-point means, so the centroids are
    * engine-identical doubles) and emits one row per unordered group
    * pair (group_a < group_b): (group_a, group_b, cos_sim). A zero-norm
    * centroid yields NaN for its pairs — same contract as the ANN
    * kernels.
    *
    * Scale: centroid vectors number O(groups) — the pairwise join is a
    * broadcast self-join of a frame that is tiny by construction (the
    * corpus scan already happened inside groupCentroids); each cosine is
    * the strict-fold [[dot]], bit-identical to the oracle's
    * `list_reduce` fold. */
  def centroidDrift(
      emb: DataFrame, groupCol: String, vecCol: String): DataFrame = {
    val vecs = groupCentroids(emb, groupCol, vecCol)
      .groupBy(col(groupCol))
      .agg(sort_array(collect_list(struct(col("dim_idx"), col("centroid"))))
        .as("__cs"))
      .select(col(groupCol),
        transform(col("__cs"), x => x.getField("centroid")).as("cv"))
    val a = vecs.select(col(groupCol).as("group_a"), col("cv").as("__va"))
    val b = vecs.select(col(groupCol).as("group_b"), col("cv").as("__vb"))
    a.join(broadcast(b), col("group_a") < col("group_b"))
      .select(col("group_a"), col("group_b"),
        nanSafeCos(dot(col("__va"), col("__vb")),
          norm(col("__va")) * norm(col("__vb"))).as("cos_sim"))
  }

  /** Farthest-point (k-center greedy) coreset selection — the diversity
    * sampler of a curation pipeline: pick `k` vectors that spread over
    * the embedding space (each pick is the point LEAST similar to every
    * already-picked center), the classic 2-approximation to the k-center
    * objective. Use it to build an eval slice / seed set that covers the
    * corpus instead of oversampling its dense core.
    *
    * Deterministic end-to-end, so a DuckDB oracle reproduces it
    * row-for-row (`OracleSql.farthestPointCtes`): the seed is the
    * minimum-id vector, each round's scores are per-row cosine folds
    * (bit-identical across engines — no cross-row float accumulation
    * anywhere), and the argmin tie-breaks by ascending id. A zero-norm
    * vector's cosine is NaN, which both engines rank GREATEST — i.e.
    * maximally similar, never picked — consistent with [[bestCell]].
    *
    * Scale shape: k-1 rounds, each ONE corpus pass with the current
    * centers broadcast as a single array row (zero corpus-side
    * exchanges) feeding a global top-1 (TakeOrdered — no full sort);
    * only k (id, vector) rows ever reach the driver. Greedy selection is
    * inherently sequential in k — at corpus scale prefer
    * [[farthestPointSampleScalable]], which collapses the k serialized
    * scans into O(rounds) batched passes; this exact variant remains the
    * small-k / audit twin. */
  def farthestPointSample(
      emb: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = emb.sparkSession
    import spark.implicits._
    val e = emb
      .select(col(idCol).cast("long").as("__id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", norm(col("v")))
      .persist()
    try {
      val seed = e.orderBy(col("__id").asc).limit(1)
        .select(col("__id"), col("v"), col("nrm"))
        .as[(Long, Seq[Double], Double)].collect()
      require(seed.nonEmpty, "farthestPointSample needs a non-empty input")
      var picks = Vector((0L, seed(0)._1, seed(0)._2, seed(0)._3))
      var i = 1L
      var exhausted = false // fewer distinct points than k: stop the rounds
      while (i < k.toLong && !exhausted) {
        val cents = picks
          .map { case (_, id, v, nr) => (id, v, nr) }.toDF("cid", "cv", "cnrm")
        val chosen = picks.map(_._2)
        val next = e.filter(!col("__id").isInCollection(chosen))
          .join(broadcast(centroidArray(cents)))
          .select(col("__id"), col("v"), col("nrm"),
            maxCos(col("v"), col("nrm")).as("__mc"))
          .orderBy(col("__mc").asc, col("__id").asc).limit(1)
          .select(col("__id"), col("v"), col("nrm"))
          .as[(Long, Seq[Double], Double)].collect()
        if (next.isEmpty) exhausted = true
        else {
          picks :+= ((i, next(0)._1, next(0)._2, next(0)._3))
          i += 1L
        }
      }
      picks.map { case (p, id, _, _) => (p, id) }.toDF("pick", "picked_id")
    } finally { e.unpersist(); () }
  }

  /** Scalable k-center: batched farthest-point oversampling (the
    * k-means‖ recipe of Bahmani et al., VLDB 2012, with the
    * probabilistic draw replaced by a DETERMINISTIC farthest-top-ℓ so a
    * DuckDB oracle replays it) — the 100-TB path that retires greedy's
    * k serialized corpus scans.
    *
    * `rounds` batched passes each broadcast the current candidate set,
    * score every remaining point by max-cosine against it (same per-row
    * fold as greedy), and admit the ℓ FARTHEST points at once
    * (mc asc, id asc — ties deterministic). The candidate set —
    * 1 + ℓ·rounds vectors, bounded by construction — then feeds an
    * exact greedy k-center run ON THE CANDIDATES in driver memory,
    * bit-identical in fold order, comparison semantics (NaN greatest),
    * and tie-breaks to [[farthestPointSample]]'s distributed rounds.
    *
    * When ℓ·rounds ≥ n-1 the candidate set IS the corpus and the result
    * equals exact greedy (property-tested); otherwise it is the standard
    * oversample-then-refine approximation. Scale: O(rounds) full scans
    * (vs greedy's k), driver traffic = candidate vectors only. */
  def farthestPointSampleScalable(
      emb: DataFrame, idCol: String, vecCol: String, k: Int,
      ell: Int, rounds: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(ell > 0 && rounds > 0, s"need ell > 0 and rounds > 0")
    require(ell.toLong * rounds + 1 >= k,
      s"candidate budget 1 + $ell*$rounds cannot cover k=$k picks")
    val spark = emb.sparkSession
    import spark.implicits._
    val e = emb
      .select(col(idCol).cast("long").as("__id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", norm(col("v")))
      .persist()
    try {
      val seed = e.orderBy(col("__id").asc).limit(1)
        .select(col("__id"), col("v"), col("nrm"))
        .as[(Long, Seq[Double], Double)].collect()
      require(seed.nonEmpty, "farthestPointSampleScalable needs a non-empty input")
      var cands = Vector(seed(0))
      var r = 0
      var exhausted = false
      while (r < rounds && !exhausted) {
        val cents = cands.map { case (id, v, nr) => (id, v, nr) }
          .toDF("cid", "cv", "cnrm")
        val ids = cands.map(_._1)
        val batch = e.filter(!col("__id").isInCollection(ids))
          .join(broadcast(centroidArray(cents)))
          .select(col("__id"), col("v"), col("nrm"),
            maxCos(col("v"), col("nrm")).as("__mc"))
          .orderBy(col("__mc").asc, col("__id").asc).limit(ell)
          .select(col("__id"), col("v"), col("nrm"))
          .as[(Long, Seq[Double], Double)].collect()
        if (batch.isEmpty) exhausted = true else cands ++= batch
        r += 1
      }
      // exact greedy over the bounded candidate set, driver-local —
      // IDENTICAL semantics to the distributed greedy: strict
      // left-to-right dot fold, NaN-greatest comparisons, (mc asc,
      // id asc) argmin tie-break, seed = min id (cands(0) by
      // construction: the seed query took the global min id)
      def dotL(a: Seq[Double], b: Seq[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { s += a(i) * b(i); i += 1 }
        s
      }
      def cos(a: (Long, Seq[Double], Double), b: (Long, Seq[Double], Double)): Double = {
        val den = a._3 * b._3
        if (den == 0.0) Double.NaN else dotL(a._2, b._2) / den
      }
      var picks = Vector(cands(0))
      var remaining = cands.drop(1)
      while (picks.length < k && remaining.nonEmpty) {
        var best = -1
        var bestMc = 0.0
        var i = 0
        while (i < remaining.length) {
          // max cosine to picked centers; NaN beats every real value
          var mc = -2.0
          picks.foreach { p =>
            val c = cos(remaining(i), p)
            if (c > mc || (c.isNaN && !mc.isNaN)) mc = c
          }
          val cmp = java.lang.Double.compare(mc, bestMc) // NaN greatest
          if (best < 0 || cmp < 0 ||
            (cmp == 0 && remaining(i)._1 < remaining(best)._1)) {
            best = i; bestMc = mc
          }
          i += 1
        }
        picks :+= remaining(best)
        remaining = remaining.patch(best, Nil, 1)
      }
      picks.zipWithIndex
        .map { case ((id, _, _), p) => (p.toLong, id) }
        .toDF("pick", "picked_id")
    } finally { e.unpersist(); () }
  }

  /** TRUE k-means‖ initialization (Bahmani et al., VLDB 2012 §3) — the
    * probabilistic-draw form [[farthestPointSampleScalable]]'s
    * deterministic top-ℓ stands in for: per round every point flips an
    * INDEPENDENT coin with p = min(1, ℓ·d²(x,C)/Σd²) and the accepted
    * points join the candidate set. Independence is the scale property
    * — admission is a row-local predicate (one map-side pass, no
    * global TakeOrdered bottleneck), so the round is a scan + one
    * scalar aggregate regardless of cluster width.
    *
    * The coin is DERANDOMIZED the board's way: u(x, r) =
    * permute(r, id) mod 2²⁰ (the shared MinHash constants), and the
    * acceptance test u·Σd² < ℓ·2²⁰·d² is evaluated in EXACT integer
    * arithmetic — d² is the quantized-BIGINT [[graft.functions
    * .NativeKernels sqDist]] kernel, Σd² a DECIMAL(38,0) sum (HUGEINT
    * in the oracle), so acceptance is bit-reproducible across engines
    * and partitionings with zero float anywhere. Already-admitted
    * points have d² = 0 and can never re-enter (strict <).
    *
    * Output — the weighted coreset the k-means‖ finish clusters:
    * (picked_id, round admitted, weight = how many corpus points
    * assign to it by (d² asc, cid asc)); a duplicate-coordinate center
    * keeps weight 0 (its points tie to the lower cid). Feed it to
    * [[kmeansCentroids]]-style Lloyd's for the final k.
    *
    * Scale: `rounds` × (one corpus pass + one O(1) collect); driver
    * holds only the O(ℓ·rounds) expected candidates; the weight pass
    * is one more scan with the bounded center array broadcast. */
  def kmeansParallelInit(
      emb: DataFrame, idCol: String, vecCol: String,
      ell: Int, rounds: Int): DataFrame = {
    require(ell > 0 && rounds > 0, s"need ell > 0 and rounds > 0")
    val spark = emb.sparkSession
    import spark.implicits._
    val q = 1048576L // 2^20: the quantization AND the coin denominator
    val dec = "decimal(38,0)"
    val e = emb
      .select(col(idCol).cast("long").as("__id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("qv", transform(col("v"),
        x => floor(x * lit(q.toDouble)).cast("long")))
      .select(col("__id"), col("qv"))
      .persist()
    try {
      val seed = e.orderBy(col("__id").asc).limit(1)
        .as[(Long, Seq[Long])].collect()
      require(seed.nonEmpty, "kmeansParallelInit needs a non-empty input")
      var cands = Vector((seed(0)._1, seed(0)._2, 0L))
      def centArr = cands.map { case (id, qv, _) => (id, qv) }
        .toDF("cid", "cqv")
        .select(struct(col("cid"), col("cqv")).as("c"))
        .agg(array_sort(collect_list(col("c"))).as("__cents"))
      // min d² against the broadcast center array: per-row fold over a
      // cid-sorted array; min is order-free, the sort pins the WEIGHT
      // pass's tie-break below to (d² asc, cid asc)
      def minD2 = aggregate(col("__cents"), lit(Long.MaxValue),
        (acc, c) => least(acc,
          graft.functions.TextHash.sqDist(col("qv"), c.getField("cqv"))))
      (1 to rounds).foreach { r =>
        val scored = e.join(broadcast(centArr))
          .withColumn("d2", minD2)
        val s = scored.agg(sum(col("d2").cast(dec))).head().getDecimal(0)
        val u = graft.functions.TextHash.permute(r, col("__id")) % q
        val accepted = scored
          .filter(u.cast(dec) * lit(s).cast(dec) <
            lit(ell * q).cast(dec) * col("d2").cast(dec))
          .select(col("__id"), col("qv"))
          .as[(Long, Seq[Long])].collect()
        cands ++= accepted.map { case (id, qv) => (id, qv, r.toLong) }
      }
      // weight pass: first strict-min over the cid-sorted array keeps
      // the lowest-cid minimizer = (d² asc, cid asc)
      val bestCid = aggregate(col("__cents"),
        struct(lit(Long.MaxValue).as("d2"), lit(-1L).as("cid")),
        (acc, c) => {
          val d2 = graft.functions.TextHash.sqDist(col("qv"),
            c.getField("cqv"))
          when(d2 < acc.getField("d2"),
            struct(d2.as("d2"), c.getField("cid").as("cid")))
            .otherwise(acc)
        }).getField("cid")
      val weights = e.join(broadcast(centArr))
        .select(bestCid.as("picked_id"))
        .groupBy(col("picked_id")).agg(count(lit(1)).as("weight"))
      cands.map { case (id, _, r) => (id, r) }
        .toDF("picked_id", "round")
        .join(weights, Seq("picked_id"), "left")
        .select(col("picked_id"), col("round"),
          coalesce(col("weight"), lit(0L)).as("weight"))
    } finally { e.unpersist(); () }
  }

  /** ANISOTROPY census of an embedding space (Ethayarajh 2019 /
    * Mu & Viswanath 2018's diagnostic): the corpus-wide average
    * pairwise cosine of the UNIT vectors, computed WITHOUT any pair
    * enumeration via the resultant-vector identity
    * Σ_{i≠j} cos(i,j) = ‖Σ û‖² − Σ‖û‖² — one pass, two aggregates,
    * O(dim) driver rows. High avg-cos = the anisotropic cone where
    * cosine-based dedup/retrieval silently loses contrast (the thing
    * to measure BEFORE trusting emb_* similarity ops on a new
    * embedding model); R² = ‖Σ û‖²/n² is the mean-resultant-length
    * companion (→ 0 isotropic, → 1 collapsed).
    *
    * Exactness: unit vectors quantize per-dim to floor((x/‖v‖)·2²⁰)
    * BIGINTs, so the per-dim sums S_d, the self-term Σ‖uq‖², and
    * ‖Σuq‖² = Σ S_d² are exact integers (DECIMAL lane for the
    * squares — S_d² exceeds Long past ~9k rows); the two emitted
    * doubles are each ONE exact-integer→double cast pair and ONE
    * division, token-replayed by the oracle. Zero-norm vectors are
    * excluded (their direction is undefined). */
  def anisotropyCensus(emb: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val q = 1048576.0
    val dec = "decimal(38,0)"
    val e = emb
      .select(col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", norm(col("v")))
      .filter(col("nrm") > 0.0)
      .withColumn("uq", transform(col("v"),
        x => floor((x / col("nrm")) * lit(q)).cast("long")))
      .select(col("uq"))
    val rowAgg = e.agg(
      count(lit(1)).as("n"),
      sum(aggregate(col("uq"), lit(0L), (acc, x) => acc + x * x).cast(dec))
        .as("self_sq"))
    val dimSums = e.select(posexplode(col("uq")).as(Seq("d", "x")))
      .groupBy(col("d")).agg(sum(col("x")).as("s"))
      .agg(sum(col("s").cast(dec) * col("s").cast(dec)).as("sum_s2"))
    rowAgg.join(dimSums)
      .select(col("n"),
        ((col("sum_s2") - col("self_sq")).cast("double") /
          (col("n").cast(dec) * (col("n") - 1).cast(dec) *
            lit(q * q).cast(dec)).cast("double")).as("avg_cos"),
        (col("sum_s2").cast("double") /
          (col("n").cast(dec) * col("n").cast(dec) *
            lit(q * q).cast(dec)).cast("double")).as("r_sq"))
  }

  /** Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR'98) —
    * diversified top-k retrieval: greedily pick
    * argmax λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s), so each new result
    * is relevant to the query AND novel against what's already
    * selected — the standard rerank between ANN retrieval and a RAG
    * context window. Two stages: (1) DISTRIBUTED relevance scoring +
    * top-`poolSize` candidate cut (one corpus pass, a bounded
    * TakeOrdered); (2) the O(pool²·k) greedy rerank driver-local on
    * the bounded pool — the same split [[farthestPointSampleScalable]]
    * uses, and how production rerankers run (the pool is hundreds,
    * never the corpus). Output: (pick, picked_id).
    *
    * Determinism: relevance and pairwise sims are the strict-fold dot
    * (bit-identical to `list_inner_product`); the pool cut and every
    * argmax order by (score DESC, id ASC); λ defaults to 0.5 so both
    * λ and 1−λ are exact binary doubles and the score chain
    * `λ·rel − (1−λ)·maxSim` is reproduced operand-for-operand by the
    * oracle. Zero-norm vectors are excluded up front (their cosine is
    * undefined; a NaN would poison every max). */
  def mmrSelect(emb: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int = 8, poolSize: Int = 48,
      lambda: Double = 0.5): DataFrame = {
    require(k > 0 && poolSize >= k, s"need k <= poolSize, got $k/$poolSize")
    val spark = emb.sparkSession
    import spark.implicits._
    val e = emb.select(col(idCol).cast("long").as("__id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", norm(col("v")))
      .filter(col("nrm") > 0.0)
    val q = e.filter(col("__id") === queryId)
      .select(col("v").as("qv"), col("nrm").as("qn"))
    val rel = e.join(broadcast(q))
      .select(col("__id"), col("v"), col("nrm"),
        (dot(col("v"), col("qv")) / (col("nrm") * col("qn"))).as("rel"))
    val cand = rel.orderBy(col("rel").desc, col("__id").asc)
      .limit(poolSize)
      .as[(Long, Seq[Double], Double, Double)].collect()
    require(cand.nonEmpty, s"mmrSelect: query $queryId missing or corpus empty")
    def dotL(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val mu = 1.0 - lambda
    val chosen = scala.collection.mutable.HashSet.empty[Long]
    var selected = Vector.empty[(Long, Seq[Double], Double, Double)]
    var picks = Vector.empty[(Long, Long)]
    var i = 0
    while (i < math.min(k, cand.length)) {
      var best: (Long, Seq[Double], Double, Double) = null
      var bestScore = 0.0
      cand.foreach { c =>
        if (!chosen.contains(c._1)) {
          val ms =
            if (selected.isEmpty) 0.0
            else selected.iterator
              .map(s => dotL(c._2, s._2) / (c._3 * s._3)).max
          val score = lambda * c._4 - mu * ms
          if (best == null || score > bestScore ||
              (score == bestScore && c._1 < best._1)) {
            best = c; bestScore = score
          }
        }
      }
      picks :+= ((i.toLong, best._1))
      selected :+= best
      chosen += best._1
      i += 1
    }
    picks.toDF("pick", "picked_id")
  }

  /** Max cosine of (v, nrm) against the broadcast `__cents` array — the
    * farthest-point score. Same fold discipline as [[bestCell]]: strict
    * left-to-right, NaN beats every real cosine. */
  /** Cosine that yields NaN (not an ANSI divide-by-zero error) on a
    * zero denominator — the documented zero-norm contract of the
    * centroid folds. Under `spark.sql.ansi.enabled` (the Spark 4
    * default) a plain `/` THROWS on 0.0/0.0; the conditional restores
    * IEEE NaN semantics, which both engines then rank greatest. */
  private def nanSafeCos(num: Column, den: Column): Column =
    when(den === 0.0, lit(Double.NaN)).otherwise(num / den)

  private def maxCos(v: Column, nrm: Column): Column =
    aggregate(
      col("__cents"),
      lit(-2.0),
      (acc, c) => {
        val cos = nanSafeCos(dot(v, c.getField("cv")),
          nrm * c.getField("cnrm"))
        when(cos > acc || (isnan(cos) && !isnan(acc)), cos).otherwise(acc)
      })

  /** Centroid set (cid, cv, cnrm) gathered into ONE array-of-structs row
    * (sorted by cid) for broadcast-nested-loop joining onto a corpus: a
    * 1-row broadcast, so the corpus keeps its scan partitioning with ZERO
    * exchanges between scan and cell assignment. */
  private def centroidArray(centroids: DataFrame): DataFrame =
    centroids
      .select(struct(col("cid"), col("cv"), col("cnrm")).as("c"))
      .agg(array_sort(collect_list(col("c"))).as("__cents"))

  /** Argmax-cosine cell for (v, nrm) against the broadcast `__cents`
    * array: a per-row left-to-right fold; strict `>` keeps the first
    * (lowest-cid) maximum, the same order as a (cos desc, cid asc)
    * tie-break, so the assignment stays bit-deterministic and
    * oracle-reproducible. (A row_number window over exploded n×C rows
    * would shuffle corpus×C — the fold avoids that entirely.)
    *
    * NaN cosine (zero-norm vector) must BEAT every real cosine — the
    * (cos desc, cid asc) window this fold replaced orders NaN first
    * (Spark's total order ranks NaN greatest), so a zero vector joins
    * the first centroid's cell, not a phantom cell -1. */
  private def bestCell(v: Column, nrm: Column): Column =
    aggregate(
      col("__cents"),
      struct(lit(-2.0).as("cos"), lit(-1L).as("cid")),
      (acc, c) => {
        val cos = nanSafeCos(dot(v, c.getField("cv")),
          nrm * c.getField("cnrm"))
        val wins = cos > acc.getField("cos") ||
          (isnan(cos) && !isnan(acc.getField("cos")))
        when(wins, struct(cos.as("cos"), c.getField("cid").as("cid")))
          .otherwise(acc)
      }).getField("cid")

  /** The first `n` vectors by id as centroids (cid, cv, cnrm) — the
    * zero-training stand-in; [[kmeansCentroids]] is the learned set. */
  def firstNCentroids(
      emb: DataFrame, idCol: String, vecCol: String, n: Int): DataFrame =
    emb.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .filter(col(idCol) < n)
      .select(col(idCol).cast("long").as("cid"), col("v").as("cv"),
        norm(col("v")).as("cnrm"))

  /** Learned IVF centroids: `iters` Lloyd's iterations over a
    * deterministic hash sample of the corpus (see [[Sampling]];
    * `samplePercent = 100` trains on everything — right for test scale,
    * while a 100-TB corpus trains on a percent-scale sample, the standard
    * IVF recipe). Initial centroids are the k lowest-id sample vectors.
    *
    * Deterministic by construction, so the learned cells are
    * oracle-reproducible (mirrored CTE-for-stage by
    * `OracleSql.kmeansCtes`): assignment reuses the bit-deterministic
    * [[bestCell]] fold, and means accumulate in fixed point ([[MeanQ]])
    * so integer sums are partition-order independent. Cells that lose
    * all members keep their previous centroid.
    *
    * Scale shape: per iteration, one pass over the sample — centroids
    * broadcast as a 1-row array (no corpus shuffle), then one
    * (cell, component) hash aggregation of O(sample × dim) quantized
    * longs with map-side combine. Only the k × dim centroid sums land on
    * the driver (bounded by construction, the same contract as Spark
    * MLlib's KMeans driver loop).
    *
    * PRECONDITION: `idCol` must be unique within `emb` — the oracle mirror
    * (`OracleSql.kmeansCtes`) deduplicates assignment per id, so duplicate
    * ids would make the engines silently diverge (documented there). */
  def kmeansCentroids(
      emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, samplePercent: Int = 100): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val spark = emb.sparkSession
    import spark.implicits._
    val e = emb.select(col(idCol).cast("long").as("__id"),
      col(vecCol).cast("array<double>").as("v"))
    // Materialize the sample once: without this the seed collect plus every
    // Lloyd's iteration re-runs the upstream scan + cast + norm (+ hash
    // sampling) — at 100 TB that is `iters` extra reads of the source.
    val samp = (if (samplePercent >= 100) e
                else Sampling.sampleByHash(e, "__id", samplePercent))
      .withColumn("nrm", norm(col("v")))
      .persist()
    try {
    var cents: Array[(Long, Seq[Double])] = samp.orderBy(col("__id")).limit(k)
      .select(col("__id"), col("v")).as[(Long, Seq[Double])].collect()
      .sortBy(_._1).zipWithIndex.map { case ((_, v), i) => (i.toLong, v) }
    require(cents.length == k,
      s"sample holds only ${cents.length} vectors, need k=$k")
    def centsDf: DataFrame = cents.toSeq.toDF("cid", "cv")
      .select(col("cid"), col("cv"), norm(col("cv")).as("cnrm"))
    for (_ <- 0 until iters) {
      val assigned = samp.join(broadcast(centroidArray(centsDf)))
        .select(bestCell(col("v"), col("nrm")).as("cell"), col("v"))
      val sums = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("j", "x")))
        .groupBy(col("cell"), col("j"))
        .agg(sum(floor(col("x") * lit(MeanQ.toDouble)).cast("long")).as("sq"),
          count(lit(1)).as("cnt"))
        .collect() // k × dim rows, bounded by construction
      val byCell = sums.groupBy(_.getAs[Long]("cell"))
      cents = cents.map { case (cid, old) =>
        byCell.get(cid) match {
          case Some(rows) =>
            val m = old.toArray
            rows.foreach { r =>
              m(r.getAs[Int]("j")) =
                r.getAs[Long]("sq").toDouble /
                  (r.getAs[Long]("cnt") * MeanQ).toDouble
            }
            (cid, m.toSeq)
          case None => (cid, old) // empty cell: keep previous centroid
        }
      }
    }
    centsDf
    } finally { samp.unpersist(); () }
  }

  /** IVF (inverted-file) cell assignment: every vector joins the cell of
    * its max-cosine centroid from `centroids` (cid, cv, cnrm) — learned
    * ([[kmeansCentroids]]) or stand-in ([[firstNCentroids]]).
    * Emits (idCol, v, nrm, cell). */
  def ivfCells(
      emb: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame = {
    val e = emb.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", norm(col("v")))
    e.join(broadcast(centroidArray(centroids)))
      .select(col(idCol), col("v"), col("nrm"),
        bestCell(col("v"), col("nrm")).as("cell"))
  }

  /** First-N-centroid convenience overload. */
  def ivfCells(
      emb: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int): DataFrame =
    ivfCells(emb, idCol, vecCol,
      firstNCentroids(emb, idCol, vecCol, nCentroids))

  /** Run `mSub` independent, deterministic codebook trainings with at
    * most 3 in flight (guide §2.6 "overlap independent jobs"): each
    * training is a short chain of driver-blocking collects, so running
    * them sequentially leaves the executors idle through every chain's
    * driver-side tail. Each training is a pure function of its own input
    * slice (deterministic seed rows, fixed-point means — no shared
    * mutable state), and results are returned IN SUBSPACE ORDER, so the
    * outcome is bit-identical to the sequential loop; only the job
    * overlap changes. The pool is per-call and torn down on exit. */
  private def trainBooksConcurrently(
      mSub: Int, train: Int => DataFrame): IndexedSeq[DataFrame] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(3, math.max(1, mSub)))
    try {
      val futs = (0 until mSub).map { s =>
        pool.submit(new java.util.concurrent.Callable[DataFrame] {
          override def call(): DataFrame = train(s)
        })
      }
      futs.map(_.get())
    } finally { pool.shutdown(); () }
  }

  /** Product-quantized (PQ) ANN top-k — the codebook compression point of
    * the ANN family (Jégou et al., TPAMI 2011): split each vector into
    * `mSub` subvectors, learn a small spherical-k-means codebook per
    * subspace ([[kmeansCentroids]] on the subvectors — deterministic,
    * fixed-point), store only the `mSub` code ids per vector
    * (mSub·log2(kCodes) bits ≈ 64× compression at 4×16 over 64 floats),
    * and rank by the asymmetric score dot(query, reconstruction) — the
    * classic ADC, expressed here by reconstructing each corpus vector
    * from its codewords (a broadcast join per subspace; the concatenated
    * reconstruction IS the lookup-table sum) — then rerank the top
    * `rerank` candidates with exact cosine on true vectors.
    *
    * Scale shape: codebooks are tiny and BROADCAST (kCodes rows per
    * subspace); encoding is the row-local [[bestCell]] fold per subspace
    * (zero corpus-side exchanges); the coarse ranking shuffle is the
    * bounded TopK O(queries × rerank); only candidates fetch true
    * vectors. Deterministic end-to-end, so the DuckDB oracle replays
    * codebook training, encoding, reconstruction, and both rankings. */
  def pqTopK(
      emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, dim: Int,
      mSub: Int = 4, kCodes: Int = 16, iters: Int = 1,
      rerank: Int = 32): DataFrame = {
    require(dim % mSub == 0, s"dim $dim must divide into $mSub subspaces")
    require(rerank >= k, s"rerank ($rerank) must be >= k ($k)")
    val dsub = dim / mSub
    val e = emb.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", norm(col("v")))
      .persist()
    try {
      // per-subspace codebooks + row-local encoding. The mSub codebook
      // trainings are INDEPENDENT (each reads its own slice of the cached
      // vectors, each is deterministic in isolation — fixed seed rows,
      // fixed-point means), so they run from a small driver thread pool
      // (guide §2.6): each training is a short chain of driver-blocking
      // collects whose tail would otherwise leave the executors idle
      // while the next subspace waits. Result per subspace is identical
      // to the sequential run — only the job overlap changes.
      var coded: DataFrame = e
      val books = trainBooksConcurrently(mSub, s => {
        val sub = e.select(col(idCol),
          slice(col("v"), s * dsub + 1, dsub).as("sv"))
        kmeansCentroids(sub, idCol, "sv", kCodes, iters)
      })
      (0 until mSub).foreach { s =>
        val sub = e.select(col(idCol),
          slice(col("v"), s * dsub + 1, dsub).as("sv"))
        val cells = ivfCells(sub, idCol, "sv", books(s))
          .select(col(idCol), col("cell").as(s"__code_$s"))
        coded = coded.join(cells, idCol :: Nil)
      }
      // reconstruction: codes -> codewords (broadcast) -> concatenated
      var rec = coded
      for (s <- 0 until mSub)
        rec = rec.join(
          broadcast(books(s).select(col("cid").as(s"__code_$s"),
            col("cv").as(s"__cv_$s"))),
          s"__code_$s" :: Nil)
      val recon = concat((0 until mSub).map(s => col(s"__cv_$s")): _*)
      val q = e.filter(queryPred).select(
        col(idCol).as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
      val pairs = rec.select(col(idCol), recon.as("__rv"))
        .join(broadcast(q), col(idCol) =!= col("query_id"))
      val cand = rankTopK(pairs, idCol, dot(col("qv"), col("__rv")), rerank)
        .select(col("query_id"), col("neighbor_id"))
      // exact rerank on true vectors, candidates only
      val exact = cand
        .join(e.select(col(idCol).as("neighbor_id"), col("v"), col("nrm")),
          "neighbor_id")
        .join(broadcast(q), "query_id")
      // NaN-safe: a zero-norm vector reaching the candidate or query set
      // must rank (TopK's Double.compare totally orders NaN), not crash
      // with an ANSI divide-by-zero — same contract as the centroid folds.
      val cosx = nanSafeCos(dot(col("v"), col("qv")),
        col("nrm") * col("qn"))
      rankTopK(exact, "neighbor_id", cosx, k).localCheckpoint()
    } finally { e.unpersist(); () }
  }

  /** IVF-PQ ANN top-k — the COMPOSED billion-scale architecture
    * (FAISS's IndexIVFPQ shape, Jégou et al.): coarse k-means cells
    * route each vector to an inverted list, product quantization
    * compresses the RESIDUAL (v − cell centroid — residuals are
    * smaller and better-centered than raw vectors, the whole point of
    * composing), and a query probes only `nprobe` cells, ranks their
    * candidates by dot(q, centroid + residual reconstruction) — the
    * reconstructed full vector IS the ADC lookup sum — then reranks
    * the top `rerank` with exact cosine. Every stage reuses the
    * deterministic primitives the standalone IVF and PQ gates already
    * prove ([[kmeansCentroids]] fixed-point means, [[ivfCells]]'
    * bit-deterministic bestCell fold), so the DuckDB oracle replays
    * coarse training, residuals, per-subspace codebooks, probing, and
    * both rankings end to end.
    *
    * Scale shape: centroids and codebooks broadcast (k + mSub·kCodes
    * rows); encoding is row-local; the scan per query touches only
    * probed cells' code rows (nprobe/kCells of the corpus) at
    * mSub·log₂(kCodes) bits per vector; exact vectors fetched for
    * O(queries × rerank) candidates only. */
  def ivfPqTopK(
      emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, dim: Int,
      kCells: Int = 8, coarseIters: Int = 2, nprobe: Int = 2,
      mSub: Int = 4, kCodes: Int = 16, pqIters: Int = 1,
      rerank: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(dim % mSub == 0, s"dim $dim must divide into $mSub subspaces")
    require(rerank >= k, s"rerank ($rerank) must be >= k ($k)")
    require(nprobe >= 1 && nprobe <= kCells, s"bad nprobe $nprobe")
    val dsub = dim / mSub
    val cents = kmeansCentroids(emb, idCol, vecCol, kCells, coarseIters)
    val cells = ivfCells(emb, idCol, vecCol, cents)
    val withRes = cells
      .join(broadcast(cents.select(col("cid").as("cell"),
        col("cv").as("__ccv"))), "cell")
      .withColumn("__r", zip_with(col("v"), col("__ccv"), (a, b) => a - b))
      .persist()
    try {
      // concurrent per-subspace trainings — see pqTopK (guide §2.6)
      var coded = withRes
      val books = trainBooksConcurrently(mSub, s => {
        val sub = withRes.select(col(idCol),
          slice(col("__r"), s * dsub + 1, dsub).as("sv"))
        kmeansCentroids(sub, idCol, "sv", kCodes, pqIters)
      })
      (0 until mSub).foreach { s =>
        val sub = withRes.select(col(idCol),
          slice(col("__r"), s * dsub + 1, dsub).as("sv"))
        val enc = ivfCells(sub, idCol, "sv", books(s))
          .select(col(idCol), col("cell").as(s"__code_$s"))
        coded = coded.join(enc, idCol :: Nil)
      }
      var rec = coded
      for (s <- 0 until mSub)
        rec = rec.join(
          broadcast(books(s).select(col("cid").as(s"__code_$s"),
            col("cv").as(s"__rcv_$s"))),
          s"__code_$s" :: Nil)
      val reconRes = concat((0 until mSub).map(s => col(s"__rcv_$s")): _*)
      val reconFull = zip_with(col("__ccv"), reconRes, (a, b) => a + b)
      val q0 = cells.filter(queryPred).select(
        col(idCol).as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
      val qcos = dot(col("qv"), col("cv")) / (col("qn") * col("cnrm"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(qcos.desc, col("cid").asc)
      val probes = q0.join(broadcast(cents))
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") <= nprobe)
        .select(col("query_id"), col("qv"), col("qn"),
          col("cid").as("qcell"))
      val pairs = rec.select(col(idCol), col("cell"), reconFull.as("__fv"))
        .join(broadcast(probes),
          col("cell") === col("qcell") && col(idCol) =!= col("query_id"))
      val cand = rankTopK(pairs, idCol, dot(col("qv"), col("__fv")), rerank)
        .select(col("query_id"), col("neighbor_id"))
      val e = emb
        .select(col(idCol), col(vecCol).cast("array<double>").as("v"))
        .withColumn("nrm", norm(col("v")))
      val exact = cand
        .join(e.select(col(idCol).as("neighbor_id"), col("v"), col("nrm")),
          "neighbor_id")
        .join(broadcast(q0), "query_id")
      val cosx = nanSafeCos(dot(col("v"), col("qv")),
        col("nrm") * col("qn"))
      rankTopK(exact, "neighbor_id", cosx, k).localCheckpoint()
    } finally { withRes.unpersist(); () }
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023, arXiv
    * 2303.09540): cluster the embedding space (k-means cells), then
    * within each cell mark every vector that has a LOWER-ID in-cell
    * neighbor with cosine ≥ `threshold` as a duplicate — keeping exactly
    * one deterministic representative (the min id) per semantic
    * near-duplicate set, the embedding-space complement of the
    * MinHash/winnow lexical pipeline. Output: one row per vector
    * (idCol, cell, keep).
    *
    * Scale shape: cell assignment is the row-local broadcast-centroid
    * fold of [[ivfCells]] (zero corpus-side exchanges), and the only
    * join is the in-cell self-join — shuffle keyed by cell, cost
    * Σ|cell|², the SemDeDup design point: k grows with the corpus
    * (|corpus|/k vectors per cell ~ thousands) so cells stay
    * self-join-able; k is the caller's knob via `centroids`. Skewed
    * cells split under AQE like any keyed self-join.
    *
    * Deterministic: assignment reuses the bit-deterministic
    * [[bestCell]] fold, the pair predicate is one fixed-shape cosine
    * (no cross-row accumulation), and keep/drop depends only on the id
    * order — so a DuckDB oracle replays it row-for-row. Zero-norm
    * vectors are excluded from the pair predicate on BOTH sides (their
    * cosine is NaN, which compares greater-than-everything in Spark SQL
    * and DuckDB alike — unguarded, one zero vector would absorb its
    * whole cell); they always survive, and never absorb others. */
  def semanticDedup(
      emb: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, threshold: Double): DataFrame = {
    val cells = ivfCells(emb, idCol, vecCol, centroids).persist()
    try {
      val dup = cells.select(col(idCol).as("__ida"), col("v").as("__va"),
          col("nrm").as("__na"), col("cell"))
        .join(cells.select(col(idCol).as("__idb"), col("v").as("__vb"),
          col("nrm").as("__nb"), col("cell")), "cell")
        // Zero-norm guard: cosine against a zero vector is NaN, and NaN
        // compares GREATER than everything in Spark SQL — without the
        // norm predicates one all-zeros embedding with the cell's lowest
        // id would mark every other member a duplicate. Degenerate
        // vectors neither absorb nor get absorbed; dedupe them upstream
        // by exact hash if needed.
        // nanSafeCos (not plain `/`): the optimizer may split and
        // reorder filter conjuncts, so the norm guards below do NOT
        // guarantee the division never sees 0.0/0.0 — which THROWS
        // under ANSI. The norm predicates stay load-bearing regardless:
        // NaN >= threshold is TRUE in Spark's NaN-greatest ordering.
        .filter(col("__na") > 0 && col("__nb") > 0 &&
          col("__idb") < col("__ida") &&
          nanSafeCos(dot(col("__va"), col("__vb")),
            col("__na") * col("__nb")) >= threshold)
        .select(col("__ida")).distinct()
      cells.select(col(idCol), col("cell"))
        .join(dup, col(idCol) === col("__ida"), "left_outer")
        .select(col(idCol), col("cell"), col("__ida").isNull.as("keep"))
        .localCheckpoint()
    } finally { cells.unpersist(); () }
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
      queryPred: Column, k: Int, centroids: DataFrame,
      nprobe: Int): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val cells = ivfCells(emb, idCol, vecCol, centroids)
    val q =
      if (nprobe == 1)
        cells.filter(queryPred).select(
          col(idCol).as("query_id"), col("v").as("qv"),
          col("nrm").as("qn"), col("cell").as("qcell"))
      else {
        val cents = centroids.select(
          col("cid"), col("cv"), col("cnrm"))
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

  /** First-N-centroid convenience overload. */
  def ivfTopK(
      emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, nCentroids: Int,
      nprobe: Int): DataFrame = {
    require(nprobe <= nCentroids,
      s"nprobe must be in [1, nCentroids], got $nprobe")
    ivfTopK(emb, idCol, vecCol, queryPred, k,
      firstNCentroids(emb, idCol, vecCol, nCentroids), nprobe)
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

  /** Mutual k-nearest-neighbor graph over an embedding corpus — the
    * standard similarity-graph substrate for density clustering,
    * semantic-dup cluster seeds, and manifold methods: each vector keeps
    * its top-`k` in-bucket cosine neighbors, and an EDGE survives only
    * when both endpoints chose each other (mutuality prunes asymmetric
    * hub attraction — the classic fix for hubs swallowing the graph).
    * Emits (id_a, id_b, cosine), a < b.
    *
    * Scale: candidate pairs come from the LSH hyperplane bucket
    * ([[cosineNearDupPairs]]'s contract — add planes to shrink buckets
    * as the corpus grows; never an all-pairs join), the per-source
    * top-k is a (cos DESC, id) window INSIDE the bucket-join output,
    * and the mutuality check is a self-equi-join of the k·N directed
    * edge list — all keyed shuffles. Cosine determinism: the strict
    * dot-product kernel shared with every ANN operator.
    *
    * At 100 TB, feed the bucket stage more planes (e.g. 16–20 → ~64k–1M
    * buckets) so in-bucket joins stay bounded; mutual edges only ever
    * shrink the k·N list. */
  def mutualKnnGraph(
      emb: DataFrame, idCol: String, vecCol: String,
      dim: Int, planes: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1, got $k")
    val e = emb.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
    val n = e.withColumn("nrm", norm(col("v")))
      .withColumn("bucket", hyperplaneBucket(col("v"), dim, planes))
    val a = n.select(col("bucket"), col(idCol).as("src"),
      col("v").as("v_a"), col("nrm").as("n_a"))
    val b = n.select(col("bucket"), col(idCol).as("dst"),
      col("v").as("v_b"), col("nrm").as("n_b"))
    val knn = a.join(b, Seq("bucket"))
      .where(col("src") =!= col("dst"))
      .withColumn("cosine",
        dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      .withColumn("__rk", row_number().over(Window.partitionBy(col("src"))
        .orderBy(col("cosine").desc, col("dst").asc)))
      .filter(col("__rk") <= k)
      .select(col("src"), col("dst"), col("cosine"))
    knn.as("x").join(knn.as("y"),
        col("x.src") === col("y.dst") && col("x.dst") === col("y.src") &&
          col("x.src") < col("x.dst"))
      .select(col("x.src").as("id_a"), col("x.dst").as("id_b"),
        col("x.cosine").as("cosine"))
  }

  /** Margin-based BITEXT MINING (Artetxe & Schwenk 2019, ACL — the
    * LASER/CCMatrix recipe) — the parallel-corpus extraction step of a
    * multilingual training pipeline: a source-language vector pairs
    * with a target-language vector not by raw cosine (hubness and
    * per-language scale shifts corrupt absolute similarities) but by
    * the RATIO MARGIN — cosine divided by the mean of the two sides'
    * k-nearest-neighbor cosines — keeping only pairs whose margin
    * clears `minMargin`. Candidates come from the shared hyperplane
    * LSH bucket (the ann_lsh discipline — never the src × tgt cross
    * product), so mining is linear in corpus size with per-bucket
    * fan-out; forward/backward kNN are ranked over the SAME candidate
    * pairs.
    *
    * Determinism: kNN is (cos DESC, id ASC)-ranked; each side's
    * neighborhood mean folds its cosines IN RANK ORDER from 0.0 (the
    * pinned IEEE sum the oracle replays with `list_reduce` over
    * `list(cos ORDER BY rk)`), and margin = cos / ((avgS + avgT) /
    * 2.0) token-for-token in both engines. Degenerate neighborhoods
    * (avgS + avgT ≤ 0 — possible only on adversarial fixtures) are
    * excluded before ranking so the ratio's sign never flips an
    * ordering. Output: per source vector its best-margin target
    * (margin DESC, tgt ASC) above threshold:
    * (src_id, tgt_id, cosine, margin). */
  def bitextMarginMine(
      emb: DataFrame, idCol: String, vecCol: String,
      srcPred: Column, k: Int, dim: Int, planes: Int,
      minMargin: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1, got $k")
    val e = emb.select(col(idCol), col(vecCol).cast("array<double>").as("v"),
      srcPred.as("is_src"))
    val n = e.withColumn("nrm", norm(col("v")))
      .withColumn("bucket", hyperplaneBucket(col("v"), dim, planes))
    val s0 = n.filter(col("is_src")).select(col("bucket"),
      col(idCol).as("src"), col("v").as("vs"), col("nrm").as("ns"))
    val t0 = n.filter(!col("is_src")).select(col("bucket"),
      col(idCol).as("tgt"), col("v").as("vt"), col("nrm").as("nt"))
    val pairs = s0.join(t0, Seq("bucket"))
      .withColumn("cos", dot(col("vs"), col("vt")) / (col("ns") * col("nt")))
      .select(col("src"), col("tgt"), col("cos"))
    val fw = pairs.withColumn("rk", row_number().over(
        Window.partitionBy(col("src"))
          .orderBy(col("cos").desc, col("tgt").asc)))
      .filter(col("rk") <= k)
    val bw = pairs.withColumn("rk", row_number().over(
        Window.partitionBy(col("tgt"))
          .orderBy(col("cos").desc, col("src").asc)))
      .filter(col("rk") <= k)
    // Rank-ordered IEEE fold: sort by rk, fold from 0.0, divide by the
    // ACTUAL neighborhood size (sparse buckets may hold < k neighbors).
    def rankedMean(df: DataFrame, key: String): DataFrame =
      df.groupBy(col(key))
        .agg(sort_array(collect_list(struct(col("rk"), col("cos"))))
          .as("arr"))
        .select(col(key),
          (aggregate(col("arr"), lit(0.0),
            (acc, x) => acc + x.getField("cos")) /
            size(col("arr")).cast("double")).as(s"avg_$key"))
    val scored = fw.select(col("src"), col("tgt"), col("cos"))
      .join(rankedMean(fw, "src"), "src")
      .join(rankedMean(bw, "tgt"), "tgt")
      .filter(col("avg_src") + col("avg_tgt") > 0.0)
      .withColumn("margin",
        col("cos") / ((col("avg_src") + col("avg_tgt")) / lit(2.0)))
    scored.withColumn("__best", row_number().over(
        Window.partitionBy(col("src"))
          .orderBy(col("margin").desc, col("tgt").asc)))
      .filter(col("__best") === 1 && col("margin") > lit(minMargin))
      .select(col("src").as("src_id"), col("tgt").as("tgt_id"),
        col("cos").as("cosine"), col("margin"))
  }

  /** Linear-kernel MMD² distribution-shift readout between two
    * embedding groups — "did this batch drift?" for vector corpora:
    * with per-dim quantized sums Sa_d, Sb_d and group sizes na, nb,
    * ‖μa − μb‖² scaled by (na·nb)² is Σ_d (Sa_d·nb − Sb_d·na)² — all
    * EXACT integers (quantization multiplies by 64, a power of two, so
    * even the float→int step is rounding-free). Emits one row per
    * dimension (dim, sa, sb, na, nb, diff, diff_sq) — the per-dim
    * decomposition names WHICH directions drifted, and keeps every
    * value Long-safe at any corpus size (the consumer sums diff_sq
    * for the scalar MMD²). One (dim, group)-keyed aggregate over the
    * exploded vectors — the standard columnar shuffle. */
  def mmdShift(emb: DataFrame, idCol: String, vecCol: String,
      grp: Column): DataFrame = {
    val e = emb.select(grp.as("g"),
      posexplode(col(vecCol)).as(Seq("dim", "v")))
    val agg = e.groupBy(col("dim"), col("g"))
      .agg(sum(floor(col("v").cast("double") * 64.0).cast("long")).as("s"),
        count(lit(1)).as("n"))
    val a = agg.filter(col("g") === 0L).select(col("dim"),
      col("s").as("sa"), col("n").as("na"))
    val b = agg.filter(col("g") === 1L).select(col("dim"),
      col("s").as("sb"), col("n").as("nb"))
    a.join(b, "dim")
      .withColumn("diff", col("sa") * col("nb") - col("sb") * col("na"))
      .withColumn("diff_sq", col("diff") * col("diff"))
      .select(col("dim").cast("long").as("dim"), col("sa"), col("sb"),
        col("na"), col("nb"), col("diff"), col("diff_sq"))
  }

  /** One NN-DESCENT refinement round (Dong et al. 2011) over a
    * TWO-TABLE LSH-seeded kNN graph — the algorithm production systems
    * use to build the kNN graphs behind graph ANN indexes (HNSW/NSG
    * layers, kNN-graph dedup) at corpus scale: start from a cheap
    * approximate graph, then exploit "a neighbor of my neighbor is
    * likely my neighbor" — rescore the two-hop candidate set (through
    * the UNDIRECTED neighbor relation, i.e. forward ∪ reverse lists,
    * the detail that makes NN-descent converge) and keep the best k.
    *
    * The seed must span MORE THAN ONE partition of the corpus or the
    * descent is a provable no-op: a single-table seed already holds the
    * top-k of each node's whole bucket, and two-hop expansion can never
    * leave the bucket. Hence two independent hyperplane tables (the
    * second over the coordinate-reversed vector — different hyperplanes
    * from the same shared constants, so the oracle replays both); their
    * union gives the cross-partition edges a round then propagates.
    *
    * Per-node fan-out is bounded by (4k)² candidates, so the round is
    * one id-keyed join chain + one bounded rescore — O(n·k²) pairs
    * total, never the n² brute product; rounds stack (call again on
    * the output) with monotone recall. Output is ids + rank only (the
    * ann-family float-free gate discipline); cosine ties break to the
    * smaller neighbor id.
    *
    * @return (src, dst, rank) — the refined directed kNN lists */
  def nnDescentRound(
      emb: DataFrame, idCol: String, vecCol: String,
      dim: Int, planes: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1, got $k")
    val e = emb.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val n = e.withColumn("nrm", norm(col("v")))
      .withColumn("b1", hyperplaneBucket(col("v"), dim, planes))
      .withColumn("b2", hyperplaneBucket(reverse(col("v")), dim, planes))
    def tableKnn(bCol: String): DataFrame = {
      val a = n.select(col(bCol).as("bucket"), col("id").as("src"),
        col("v").as("v_a"), col("nrm").as("n_a"))
      val b = n.select(col(bCol).as("bucket"), col("id").as("dst"),
        col("v").as("v_b"), col("nrm").as("n_b"))
      a.join(b, Seq("bucket"))
        .where(col("src") =!= col("dst"))
        .withColumn("cos",
          dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
        .withColumn("__rk", row_number().over(Window.partitionBy(col("src"))
          .orderBy(col("cos").desc, col("dst").asc)))
        .filter(col("__rk") <= k)
        .select(col("src"), col("dst"))
    }
    val knn0 = tableKnn("b1").unionAll(tableKnn("b2")).distinct()
    val und = knn0.unionAll(
      knn0.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    val cand = und.as("p").join(und.as("q"), col("p.dst") === col("q.src"))
      .select(col("p.src").as("src"), col("q.dst").as("dst"))
      .where(col("src") =!= col("dst"))
      .unionAll(knn0)
      .distinct()
    val va = n.select(col("id").as("src"), col("v").as("v_a"),
      col("nrm").as("n_a"))
    val vb = n.select(col("id").as("dst"), col("v").as("v_b"),
      col("nrm").as("n_b"))
    cand.join(va, "src").join(vb, "dst")
      .withColumn("cos",
        dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      .withColumn("rank", row_number().over(Window.partitionBy(col("src"))
        .orderBy(col("cos").desc, col("dst").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select(col("src"), col("dst"), col("rank"))
  }

  /** Hard-example mining for contrastive/triplet training: for each
    * anchor, the hardest NEGATIVE (most-similar different-label vector —
    * the one a margin loss most needs to push away) and the hardest
    * POSITIVE (least-similar same-label vector — the one it most needs
    * to pull in). Emits (anchor_id, hard_neg_id, hard_pos_id); anchors
    * missing either side (single-label corpus) drop via the inner join.
    *
    * Determinism: both argmaxes ride the [[graft.functions.Aggregators
    * .TopK]] k=1 aggregator (Spark's SQL double total order, ties to the
    * smaller id — bit-compatible with the oracle's `row_number` over
    * (cos DESC, id) / (cos ASC, id); hardest-positive reuses the same
    * order on the NEGATED cosine). Only ids ship in the output — the
    * ann-family discipline that keeps the gate float-compare-free.
    *
    * Scale: anchors are broadcast (bounded by `anchorPred` — keep it
    * selective); ONE corpus scan fans out to |corpus|·|anchors| pairs
    * that immediately collapse in two map-side-combinable k=1
    * aggregates — no window shuffle of the pair set, no corpus
    * self-join. The pair fan-out is the brute-force baseline; at
    * index scale, feed `emb` through the IVF cell filter first. */
  def hardMining(
      emb: DataFrame, idCol: String, vecCol: String, labelCol: String,
      anchorPred: Column): DataFrame = {
    val n = emb.select(col(idCol), col(labelCol).as("__lbl"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", norm(col("v")))
    val q = n.filter(anchorPred).select(
      col(idCol).as("anchor_id"), col("__lbl").as("__albl"),
      col("v").as("qv"), col("nrm").as("qn"))
    val pairs = n.join(broadcast(q), col(idCol) =!= col("anchor_id"))
      .withColumn("__cos",
        dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
    val top1 = udaf(new graft.functions.Aggregators.TopK(1))
    val neg = pairs.filter(col("__lbl") =!= col("__albl"))
      .groupBy(col("anchor_id"))
      .agg(top1(col("__cos"), col(idCol)).as("__t"))
      .select(col("anchor_id"), col("__t")(0)("id").as("hard_neg_id"))
    val pos = pairs.filter(col("__lbl") === col("__albl"))
      .groupBy(col("anchor_id"))
      .agg(top1(-col("__cos"), col(idCol)).as("__t"))
      .select(col("anchor_id"), col("__t")(0)("id").as("hard_pos_id"))
    neg.join(pos, "anchor_id")
  }

  /** kNN label-consistency eval — "do the embeddings actually encode
    * the labels?": each query's label is predicted by majority vote of
    * its k nearest neighbors (the sanity check run on any new embedding
    * model before it ships). Ties break to the SMALLEST label —
    * deterministic, and the oracle replays (votes DESC, label ASC).
    *
    * Emits per query: (query_id, true_label, pred_label, votes,
    * correct). A high error rate here reads as embedding drift or a
    * broken encoder; per-label error clusters read as confusable
    * classes.
    *
    * Scale: neighbor lists come from [[bruteForceTopK]] (swap in the
    * LSH/IVF path at index scale — the vote logic is source-agnostic);
    * vote counting is one aggregate + one O(queries × labels) window
    * keyed by query. */
  def knnLabelAccuracy(
      emb: DataFrame, idCol: String, vecCol: String, labelCol: String,
      queryPred: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val topk = bruteForceTopK(emb, idCol, vecCol, queryPred, k)
    val nl = emb.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("__nl"))
    val ql = emb.select(col(idCol).as("query_id"),
      col(labelCol).as("__ql"))
    topk.join(nl, "neighbor_id")
      .groupBy(col("query_id"), col("__nl"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("__c").desc, col("__nl").asc)))
      .filter(col("__rn") === 1)
      .join(ql, "query_id")
      .select(col("query_id"), col("__ql").as("true_label"),
        col("__nl").as("pred_label"), col("__c").as("votes"),
        (col("__nl") === col("__ql")).as("correct"))
  }

  /** Nearest-centroid classification eval — [[knnLabelAccuracy]]'s
    * O(labels)-cost sibling (the Rocchio classifier): each vector is
    * assigned to the label whose FIXED-POINT centroid it is most
    * cosine-similar to, and per-label accuracy is reported. At 100 TB
    * this is the eval you can actually afford on the full corpus —
    * |labels| broadcast centroids and one scan, no neighbor search.
    *
    * Emits per true label: (label, n, n_correct, accuracy). Ties in the
    * argmax break to the smallest label (TopK k=1 over (cos, label) —
    * the oracle's (cos DESC, cl) row_number order).
    *
    * Scale: centroids come from [[groupCentroids]] (one map-side
    * combinable pass), assembled into O(labels) broadcast vectors; the
    * corpus fans out to |corpus|·|labels| pairs that collapse in a
    * map-side k=1 aggregate keyed by vector — no window over the fan-out
    * and no shuffle of the corpus itself beyond the per-vector combine. */
  def nearestCentroidAccuracy(
      emb: DataFrame, idCol: String, vecCol: String, labelCol: String)
      : DataFrame = {
    val cent = groupCentroids(emb, labelCol, vecCol)
      .groupBy(col(labelCol).cast("long").as("__cl"))
      .agg(transform(
        array_sort(collect_list(struct(col("dim_idx"), col("centroid")))),
        s => s("centroid")).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val n = emb.select(col(idCol),
        col(labelCol).cast("long").as("__tl"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", norm(col("v")))
    val top1 = udaf(new graft.functions.Aggregators.TopK(1))
    n.crossJoin(broadcast(cent))
      .withColumn("__cos",
        dot(col("v"), col("cv")) / (col("nrm") * col("cn")))
      .groupBy(col(idCol), col("__tl"))
      .agg(top1(col("__cos"), col("__cl")).as("__t"))
      .select(col("__tl"), col("__t")(0)("id").as("__pl"))
      .groupBy(col("__tl").as("label"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__pl") === col("__tl"), 1L).otherwise(0L))
          .as("n_correct"))
      .withColumn("accuracy",
        col("n_correct").cast("double") / col("n").cast("double"))
  }

  /** Coverage audit of a coreset/sample against the corpus — the
    * facility-location read on "does my k-center / random sample
    * actually represent the data?": for EVERY corpus vector, the best
    * cosine to any sample vector, rolled up as mean and worst-case
    * coverage. Sample members self-match at cos 1 (the standard
    * convention — they are covered by definition).
    *
    * Emits one row: (n_rows, n_sample, sum_cover_q, min_cover_q,
    * mean_cover) with per-row best-cosine QUANTIZED to 1e-8 units
    * (`floor(max_cos · 1e8)` — strict-fold cosines are bit-identical
    * cross-engine, so the floor is stable, and the SUM is then exact
    * integer arithmetic immune to shuffle order; the float-sum trap the
    * engine never takes). `mean_cover = sum_q / n / 1e8` is the one
    * final float.
    *
    * Scale: the sample is broadcast (keep `samplePred` selective); one
    * corpus scan fans out to |corpus|·|sample| pairs that collapse in a
    * map-side-combinable max per row, then one global rollup. At index
    * scale, pre-filter candidates through IVF cells. */
  def sampleCoverage(
      emb: DataFrame, idCol: String, vecCol: String,
      samplePred: Column): DataFrame = {
    val n = emb.select(col(idCol),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", norm(col("v")))
    val q = n.filter(samplePred).select(
      col(idCol).as("__sid"), col("v").as("qv"), col("nrm").as("qn"))
    val best = n.join(broadcast(q))
      .withColumn("__cos",
        dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
      .groupBy(col(idCol))
      .agg(max(col("__cos")).as("__best"))
      .select(floor(col("__best") * 1.0e8).cast("long").as("__bq"))
    val cnt = q.agg(count(lit(1)).as("n_sample"))
    best.agg(count(lit(1)).as("n_rows"),
        coalesce(sum(col("__bq")), lit(0L)).as("sum_cover_q"),
        min(col("__bq")).as("min_cover_q"))
      .crossJoin(broadcast(cnt))
      .select(col("n_rows"), col("n_sample"), col("sum_cover_q"),
        col("min_cover_q"),
        when(col("n_rows") === 0L, lit(null).cast("double"))
          .otherwise(col("sum_cover_q").cast("double") /
            col("n_rows").cast("double") / lit(1.0e8)).as("mean_cover"))
  }

  /** Label-centroid silhouette — the clustering-quality read on a
    * labeled embedding corpus (are the label clusters tight and
    * separated, or is the labeling noise?): per vector, cosine distance
    * a to its OWN label centroid and b to the NEAREST OTHER label
    * centroid, s = (b−a)/max(a,b) ∈ [−1,1]; rolled up per label. The
    * simplified (centroid-based) silhouette — O(rows·labels), not the
    * O(rows²) pairwise form, the standard trade at corpus scale. One
    * row per label: (label, n_vecs, sum_sil_q, mean_silhouette).
    *
    * Determinism: centroids are [[groupCentroids]] fixed-point means;
    * per-row cosines are strict folds over them (bit-identical
    * cross-engine); per-row s quantizes to `floor(s·1e8)` so the
    * label rollup is EXACT integer summation immune to shuffle order —
    * the [[sampleCoverage]] discipline. max(a,b) = 0 (vector equals
    * both centroids) defines s = 0.
    *
    * Scale: labels are a broadcast O(labels·dim) frame; one corpus scan
    * computes all cosines and collapses map-side. Single-label corpora
    * emit nothing (no "other" centroid exists). */
  def labelSilhouette(
      emb: DataFrame, idCol: String, vecCol: String, labelCol: String)
      : DataFrame = {
    val cent = groupCentroids(emb, labelCol, vecCol)
      .groupBy(col(labelCol).cast("long").as("__cl"))
      .agg(transform(
        array_sort(collect_list(struct(col("dim_idx"), col("centroid")))),
        s => s("centroid")).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val n = emb.select(col(idCol),
        col(labelCol).cast("long").as("__tl"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", norm(col("v")))
    val per = n.crossJoin(broadcast(cent))
      .withColumn("__cos",
        dot(col("v"), col("cv")) / (col("nrm") * col("cn")))
      .groupBy(col(idCol), col("__tl"))
      .agg(max(when(col("__cl") === col("__tl"), col("__cos"))).as("__co"),
        max(when(col("__cl") =!= col("__tl"), col("__cos"))).as("__cx"))
      .filter(col("__co").isNotNull && col("__cx").isNotNull)
    val a = lit(1.0) - col("__co")
    val b = lit(1.0) - col("__cx")
    per
      .withColumn("__s",
        when(greatest(a, b) === 0.0, lit(0.0))
          .otherwise((b - a) / greatest(a, b)))
      .select(col("__tl"),
        floor(col("__s") * lit(1.0e8)).cast("long").as("__sq"))
      .groupBy(col("__tl").as("label"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("__sq")).as("sum_sil_q"))
      .withColumn("mean_silhouette",
        col("sum_sil_q").cast("double") /
          (col("n_vecs").cast("double") * lit(1.0e8)))
  }
}
