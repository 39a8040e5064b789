package graft.gates

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkEntry._
import graft.engine.UpsertStream
import graft.functions.{OracleSql, TextHash}
import graft.ops.TextAnalysis.LangProfiles
import graft.model.{IngestConfig, TargetTable}
import graft.multimodal.Multimodal
import graft.ops.{BatchSplit, Dedup, Html, NearDup, Similarity, TextAnalysis}
import graft.sink.Merge
import graft.gates.GateOracleShared._

/** Dedup + vector gates: MinHash/SimHash/winnow near-dup, ANN tiers, sketches, sampling.
  *
  * Split from the monolithic SparkEntry registry (r10); see
  * [[graft.SparkEntry]] for the oracle-safety conventions and the
  * duplicate-refusing merge. Shared oracle CTEs live in
  * [[GateOracleShared]]. */
private[graft] object VectorGates {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- Sampling: deterministic Poisson bootstrap — per-row
    //      replication counts by inverse-CDF on the row hash (resamples
    //      reproducible across runs, partitionings, engines) ----
    "sample_bootstrap" -> ((s, dir) =>
      graft.ops.Sampling.poissonReplication(
        t(s, dir, "documents").select(col("doc_id")), "doc_id")),

    // ---- Stats: bootstrap CI for the mean — 40 deterministic Poisson
    //      resamples in ONE aggregate, element-picked 90% interval ----
    "sample_bootstrap_ci" -> ((s, dir) =>
      graft.ops.Sampling.bootstrapMeanCI(
        t(s, dir, "events").select(col("event_id"),
          floor(col("value") * 1024.0).cast("long").as("q")),
        "event_id", "q", scale = 1024.0)),

    // ---- Embeddings: nearest-centroid (Rocchio) classification eval —
    //      the O(labels) full-corpus accuracy read ----
    "emb_centroid_classify" -> ((s, dir) =>
      Similarity.nearestCentroidAccuracy(
        t(s, dir, "embeddings"), "vec_id", "embedding", "label")),

    // ---- ML features: hashing-trick buckets (stateless categorical ids
    //      + a crossed feature; engine-mirrored mod-P fold) ----
    "feature_hash" -> ((s, dir) =>
      t(s, dir, "events").select(col("event_id"),
        graft.ops.Features.hashBucket(
          concat(lit("et="), col("event_type")), 1024).as("f_et"),
        graft.ops.Features.hashBucket(
          concat(lit("et_x_ub="), col("event_type"), lit("_"),
            pmod(col("user_id"), lit(16L)).cast("string")), 1024)
          .as("f_cross"))),

    // ---- ML features: hashing-trick TF vectorizer — sparse
    //      (doc, bucket, tf) triplets over 64 hash buckets; stateless,
    //      no vocabulary, oracle replays bucket ids exactly ----
    "feature_hash_tf" -> ((s, dir) =>
      graft.ops.Features.hashingTfVectorizer(
        t(s, dir, "documents"), "doc_id", "text", dim = 64)),

    // ---- ML features: per-group equal-frequency (quantile) binning —
    //      ntile over the deterministic (value, id) order; NULLs pass
    //      through unbinned ----
    "feature_quantile_bin" -> ((s, dir) =>
      graft.ops.Features.quantileBin(
        t(s, dir, "events")
          .select(col("event_id"), col("event_type"), col("value")),
        "event_type", "value", "event_id", bins = 8)),

    // ---- ML features: leave-one-out target encoding (leakage-free
    //      categorical mean via exact quantized sums) ----
    "feature_target_encode" -> ((s, dir) =>
      graft.ops.Features.targetEncodeLoo(
        t(s, dir, "events")
          .select(col("event_id"), col("event_type"), col("value")),
        "event_type", "value")
        .select(col("event_id"), col("event_type"), col("value"),
          col("te"))),

    // ---- ML features: weight-of-evidence + information value per
    //      category (Laplace-smoothed, one pinned ln, exact counts) ----
    "feature_woe" -> ((s, dir) =>
      graft.ops.Features.woeEncode(
        t(s, dir, "documents"), "lang", col("n_chars") > 500L)),

    // ---- HLL set-overlap: distinct-user intersection of two event
    //      types by inclusion–exclusion over mergeable registers (the
    //      audience-overlap question answered in sketch space) ----
    "sketch_hll_intersect" -> ((s, dir) =>
      graft.ops.Sketches.hllIntersect(
        graft.ops.Sketches.hllSketchIds(
          t(s, dir, "events")
            .filter(col("event_type").isin("click", "purchase")),
          Seq("event_type"), "user_id"),
        "event_type", "click", "purchase")),

    // ---- LLM pipeline: exact dedup over documents ----
    "dedup_exact" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("n_copies"))),

    // ---- LLM pipeline: NEAR-exact dedup — exact dedup keyed on the
    //      NORMALIZED text (case/whitespace/control variants collapse
    //      onto one copy; the cheap first rung before MinHash) ----
    "dedup_exact_normalized" -> ((s, dir) =>
      TextAnalysis.normalize(t(s, dir, "documents"), "doc_id", "text")
        .groupBy(col("text_norm"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("n_copies"))),

    // ---- LLM pipeline: MinHash + LSH near-duplicate candidates ----
    "dedup_minhash_lsh" -> ((s, dir) =>
      NearDup.lshCandidatePairs(
        t(s, dir, "documents"), "doc_id", "text", m = 8, n = 3, r = 2)),

    // ---- Sketch accuracy eval: MinHash Jaccard estimate vs the exact
    //      shingle-set Jaccard over the SAME candidate pairs — the
    //      signature-size (m) tuning read ----
    "dedup_minhash_est_error" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = NearDup.lshCandidatePairs(docs, "doc_id", "text",
        m = 8, n = 3, r = 2)
      val sig = NearDup.minhashSignatures(docs, "doc_id", "text",
        m = 8, n = 3)
      val sh = docs
        .select(col("doc_id"), TextHash.wordHashes(col("text")).as("__wh"))
        .select(col("doc_id"),
          array_distinct(TextHash.shingleHashes(col("__wh"), 3)).as("__sh"))
      val sa = sig.select(col("doc_id").as("id_a") +:
        (0 until 8).map(j => col(s"mh$j").as(s"a$j")): _*)
      val sb = sig.select(col("doc_id").as("id_b") +:
        (0 until 8).map(j => col(s"mh$j").as(s"b$j")): _*)
      val nMatch = (0 until 8).map(j =>
        when(col(s"a$j") === col(s"b$j"), 1L).otherwise(0L))
        .reduce(_ + _)
      val inter = size(array_intersect(col("__sa"), col("__sb")))
      val union = size(array_union(col("__sa"), col("__sb")))
      pairs.join(sa, "id_a").join(sb, "id_b")
        .join(sh.select(col("doc_id").as("id_a"), col("__sh").as("__sa")),
          "id_a")
        .join(sh.select(col("doc_id").as("id_b"), col("__sh").as("__sb")),
          "id_b")
        .select(col("id_a"), col("id_b"), nMatch.as("n_match"),
          (nMatch.cast("double") / lit(8.0)).as("est_jaccard"),
          (inter.cast("double") / union.cast("double")).as("jaccard"))
        .withColumn("abs_err",
          abs(col("est_jaccard") - col("jaccard")))
    }),

    // ---- LLM pipeline: LSH blocking-quality pre-flight — block sizes,
    //      comparison count, skew hazard, reduction ratio vs all-pairs
    //      (tune m/r BEFORE paying for the candidate join) ----
    "dedup_blocking_stats" -> ((s, dir) =>
      NearDup.blockingStats(
        t(s, dir, "documents"), "doc_id", "text", m = 8, n = 3, r = 2)),

    // ---- Mergeable sketch: per-group MinHash signature via plain min ----
    // The union-set signature of a group IS the elementwise min of its
    // docs' signatures — sketch mergeability expressed declaratively, so
    // Catalyst gets map-side partial aggregation for free.
    "dedup_minhash_by_lang" -> ((s, dir) => {
      val sig = NearDup.minhashSignatures(
        t(s, dir, "documents"), "doc_id", "text", m = 8, n = 3)
      val lang = t(s, dir, "documents").select(col("doc_id"), col("lang"))
      sig.join(lang, "doc_id")
        .groupBy("lang")
        .agg(
          min(col("mh0")).as("mh0"), min(col("mh1")).as("mh1"),
          min(col("mh2")).as("mh2"), min(col("mh3")).as("mh3"),
          count(lit(1)).as("n_docs"))
    }),

    // ---- LLM pipeline: winnowing inverted-index candidate pairs
    //      (substring-overlap proposer; stop-fingerprints dropped).
    //      w=8 → a shared run of >= 10 tokens is guaranteed a shared
    //      fingerprint; this corpus reuses short phrases heavily, so the
    //      longer-run bar keeps the candidate set selective. ----
    "dedup_winnow_pairs" -> ((s, dir) =>
      NearDup.winnowCandidatePairs(
        t(s, dir, "documents"), "doc_id", "text", n = 3, w = 8,
        maxDocFreq = 10)),

    // ---- LLM pipeline: edit-distance verify over winnow candidates
    //      (sampled; prefixes bound the O(len²) DP per pair) ----
    "dedup_edit_distance" -> ((s, dir) => {
      val cand = NearDup.winnowCandidatePairs(
        t(s, dir, "documents"), "doc_id", "text", n = 3, w = 8,
        maxDocFreq = 10)
        .where(col("id_a") % 7 === 0)
      val d = t(s, dir, "documents")
        .select(col("doc_id"), substring(col("text"), 1, 120).as("t"))
      cand
        .join(d.select(col("doc_id").as("id_a"), col("t").as("t_a")), "id_a")
        .join(d.select(col("doc_id").as("id_b"), col("t").as("t_b")), "id_b")
        .select(col("id_a"), col("id_b"),
          levenshtein(col("t_a"), col("t_b")).cast("long").as("edit_dist"))
    }),

    // ---- LLM pipeline: content-defined chunking (rsync/LBFS lineage,
    //      the FILE-level dedup primitive): fixed-window Rabin
    //      boundaries — insertions shift only the chunks they touch,
    //      so shared content keeps shared chunk hashes. Oracle replays
    //      the position-local boundary test per byte. ----
    "dedup_cdc_chunks" -> ((s, dir) =>
      NearDup.cdcChunks(t(s, dir, "documents"), "doc_id", "text")),

    // ---- LLM pipeline: corpus-level CDC dedup accounting — the
    //      business readout of content-defined chunking: bytes stored
    //      once vs bytes referenced, dedup ratio in ppm. One
    //      md5-keyed aggregate over the chunk stream. ----
    "dedup_cdc_stats" -> ((s, dir) => {
      val chunks = NearDup.cdcChunks(t(s, dir, "documents"), "doc_id", "text")
      chunks.groupBy(col("chunk_md5"))
        .agg(count(lit(1)).as("__n"), first(col("len")).as("__len"))
        .agg(
          count(lit(1)).as("n_unique_chunks"),
          sum(col("__n")).as("n_chunk_refs"),
          sum(col("__len")).as("bytes_stored"),
          sum(col("__n") * col("__len")).as("bytes_referenced"))
        .select(col("n_unique_chunks"), col("n_chunk_refs"),
          col("bytes_stored"), col("bytes_referenced"),
          expr("(bytes_referenced - bytes_stored) * 1000000L " +
            "div bytes_referenced").as("saved_ppm"))
    }),

    // ---- LLM pipeline: TRUE Damerau-Levenshtein verify over blocked
    //      candidates — native codegen kernel (Lowrance-Wagner alphabet
    //      DP; Spark ships only plain Levenshtein) vs DuckDB's
    //      INDEPENDENT core damerau_levenshtein(); lev emitted beside
    //      dl so the transposition discount is visible in the gate ----
    "dedup_damerau" -> ((s, dir) => {
      val cand = NearDup.winnowCandidatePairs(
        t(s, dir, "documents"), "doc_id", "text", n = 3, w = 8,
        maxDocFreq = 10)
        .where(col("id_a") % 5 === 0)
      val d = t(s, dir, "documents")
        .select(col("doc_id"), substring(col("text"), 1, 80).as("t"))
      cand
        .join(d.select(col("doc_id").as("id_a"), col("t").as("t_a")), "id_a")
        .join(d.select(col("doc_id").as("id_b"), col("t").as("t_b")), "id_b")
        .select(col("id_a"), col("id_b"),
          TextHash.damerauLevenshtein(col("t_a"), col("t_b")).as("dl_dist"),
          levenshtein(col("t_a"), col("t_b")).cast("long").as("lev_dist"))
    }),

    // ---- LLM pipeline: duplicate CLUSTERS (connected components over
    //      LSH candidate pairs; canon_id = min doc in the component) ----
    "dedup_clusters" -> ((s, dir) => {
      val pairs = NearDup.lshCandidatePairs(
        t(s, dir, "documents"), "doc_id", "text", m = 8, n = 3, r = 2)
      graft.ops.Components.connectedComponents(pairs, "id_a", "id_b")
        .select(col("id").as("doc_id"), col("comp").as("canon_id"))
    }),

    // ---- LLM pipeline: INCREMENTAL dup clusters — a deterministic
    //      quarter of the candidate pairs arrives as the "new shard";
    //      stored labels merge through the contracted component graph
    //      (O(batch) solve + one relabel join). Oracle = FULL recompute
    //      over all pairs: min-id labels are merge-order independent,
    //      so incremental must equal from-scratch exactly ----
    "dedup_clusters_incremental" -> ((s, dir) => {
      val pairs = NearDup.lshCandidatePairs(
        t(s, dir, "documents"), "doc_id", "text", m = 8, n = 3, r = 2)
      val base = pairs.filter((col("id_a") + col("id_b")) % 4 =!= 0)
      val fresh = pairs.filter((col("id_a") + col("id_b")) % 4 === 0)
      val prior = graft.ops.Components.connectedComponents(
        base, "id_a", "id_b")
      graft.ops.Components.incrementalComponents(prior, fresh,
        "id_a", "id_b")
        .select(col("id").as("doc_id"), col("comp").as("canon_id"))
    }),

    // ---- LLM pipeline: SOFT dedup — keep every copy but weight each
    //      doc 1/cluster_size, so a 40-copy boilerplate page carries
    //      the same total training mass as a unique one (the gentler
    //      alternative to hard dedup; weight is ONE IEEE division) ----
    "sample_soft_dedup_weights" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val labels = graft.ops.Components.connectedComponents(
        NearDup.lshCandidatePairs(
          t(s, dir, "documents"), "doc_id", "text", m = 8, n = 3, r = 2),
        "id_a", "id_b")
      val canon = docs.join(
          labels.select(col("id").as("doc_id"), col("comp")),
          Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("comp"), col("doc_id")).as("canon_id"))
      canon
        .withColumn("cluster_size", count(lit(1)).over(
          Window.partitionBy(col("canon_id"))))
        .select(col("doc_id"), col("canon_id"), col("cluster_size"),
          (lit(1.0) / col("cluster_size").cast("double")).as("weight"))
    }),

    // ---- LLM pipeline: leakage-free split — split by the dup-cluster
    //      canonical id, so a doc and its near-copies can NEVER straddle
    //      the train/test boundary (the contamination a per-row split
    //      cannot prevent); singletons are their own cluster ----
    "sample_split_by_cluster" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val labels = graft.ops.Components.connectedComponents(
        NearDup.lshCandidatePairs(
          t(s, dir, "documents"), "doc_id", "text", m = 8, n = 3, r = 2),
        "id_a", "id_b")
      val canon = docs.join(
          labels.select(col("id").as("doc_id"), col("comp")),
          Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("comp"), col("doc_id")).as("canon_id"))
      graft.ops.Sampling.assignSplits(canon, "canon_id")
    }),

    // ---- LLM pipeline: k-center diversity sample over the embedding
    //      corpus. BOTH gates run the SCALABLE form (batched
    //      oversampling passes, then exact greedy on the small candidate
    //      set — O(rounds) corpus scans, not O(k)); the exact greedy
    //      k-scan form is spec-only (SimilaritySpec) since round 8 —
    //      its k serialized scans + per-round driver collect are the
    //      wrong plan at 100× (round-7 verdict item 5) ----
    "sample_kcenter" -> ((s, dir) =>
      Similarity.farthestPointSampleScalable(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 8, ell = 4, rounds = 3)),

    // ---- Same scalable k-center under a wider-batch config: fewer
    //      passes admitting more per pass (ell=8 × 2 rounds) ----
    "sample_kcenter_scalable" -> ((s, dir) =>
      Similarity.farthestPointSampleScalable(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 8, ell = 8, rounds = 2)),

    // ---- TRUE k-means‖ init (Bahmani 2012): per round each point
    //      flips an INDEPENDENT derandomized coin u·Σd² < ℓ·2²⁰·d² —
    //      row-local admission, no global TakeOrdered; exact integer
    //      lanes end-to-end; output = the weighted coreset ----
    "sample_kmeans_parallel" -> ((s, dir) =>
      Similarity.kmeansParallelInit(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        ell = 8, rounds = 2)),

    // ---- ML features: per-group median imputation + missing flag
    //      (nulls synthesized on a fixed key residue) ----
    "feature_impute_median" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        when(col("l_orderkey") % 13 === 0, lit(null).cast("double"))
          .otherwise(col("l_quantity")).as("q"))
      graft.ops.Features.imputeByGroupMedian(li, "l_returnflag", "q")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("was_missing"), col("q_imputed"))
    }),

    // ---- Sketches: mergeable decimal log-bucket quantile sketch —
    //      ONE map-side-combinable aggregate (≤ ~17k buckets/group, no
    //      full sort, no percentile state object), estimates within
    //      ~0.5% via integer rank arithmetic + bucket midpoints ----
    "sketch_quantile" -> ((s, dir) => {
      val sk = graft.ops.Sketches.quantileSketch(
        t(s, dir, "lineitem").select(
          col("l_returnflag").as("g"), col("l_extendedprice")),
        Seq("g"), "l_extendedprice")
      graft.ops.Sketches.quantileFromSketch(sk, Seq("g"), Seq(50, 90, 99))
    }),

    // ---- Sketches: shard-merge path — two half-corpus sketches
    //      unioned + re-summed estimate EXACTLY like the direct build
    //      (bucket counts are additive), proving store-and-merge ----
    "sketch_quantile_merge" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(
        col("l_returnflag").as("g"), col("l_orderkey"), col("l_extendedprice"))
      val a = graft.ops.Sketches.quantileSketch(
        li.filter(col("l_orderkey") % 2 === 0), Seq("g"), "l_extendedprice")
      val b = graft.ops.Sketches.quantileSketch(
        li.filter(col("l_orderkey") % 2 =!= 0), Seq("g"), "l_extendedprice")
      val merged = graft.ops.Sketches.quantileSketchMerge(
        a.unionByName(b), Seq("g"))
      graft.ops.Sketches.quantileFromSketch(merged, Seq("g"), Seq(50, 95))
    }),

    // ---- LLM pipeline: sorted-neighborhood blocking (sort by normalized
    //      prefix, pair within a window of 5, exact bigram-Jaccard
    //      verify) — the record-linkage complement to LSH buckets ----
    "dedup_sorted_neighborhood" -> ((s, dir) =>
      NearDup.sortedNeighborhoodPairs(
        t(s, dir, "documents"), "doc_id", "text", w = 5, minJaccard = 0.05)),

    // ---- LLM pipeline: SimHash fingerprints ----
    "dedup_simhash" -> ((s, dir) =>
      NearDup.simhashFingerprints(
        t(s, dir, "documents"), "doc_id", "text", bits = 16)),

    // ---- LLM pipeline: EXACT all-pairs Jaccard join via rarest-first
    //      prefix filtering (guaranteed recall, integer threshold test;
    //      the deterministic audit twin of the LSH path) ----
    "dedup_prefix_jaccard" -> ((s, dir) =>
      NearDup.prefixJaccardJoin(
        t(s, dir, "documents"), "doc_id", "text",
        n = 2, thetaNum = 3, thetaDen = 5)),

    // ---- LLM pipeline: n-gram Jaccard verify over LSH candidates ----
    // The production two-stage near-dup: banding proposes (linear), exact
    // Jaccard disposes — no block/cross self-join anywhere in the plan.
    "dedup_ngram_jaccard" -> ((s, dir) =>
      NearDup.ngramJaccardVerify(
        t(s, dir, "documents"), "doc_id", "text",
        m = 8, n = 3, r = 2, minJaccard = 0.01)),

    // ---- LLM pipeline: dedup threshold sweep — how many verified
    //      pairs survive each candidate Jaccard cut (the tuning curve
    //      read before committing to a dedup threshold) ----
    "dedup_threshold_sweep" -> ((s, dir) => {
      val pairs = NearDup.ngramJaccardVerify(
        t(s, dir, "documents"), "doc_id", "text",
        m = 8, n = 3, r = 2, minJaccard = 0.01)
      pairs
        .select(explode(array(Seq(10, 25, 50, 75, 90).map(lit): _*))
          .as("threshold_pct"), col("jaccard"))
        .filter(col("jaccard") * 100 >= col("threshold_pct"))
        .groupBy(col("threshold_pct"))
        .agg(count(lit(1)).as("n_pairs"))
    }),

    // ---- LLM pipeline: incremental dedup — the arriving shard (every
    //      10th doc) probes the stored band index of the rest of the
    //      corpus; the corpus is hashed once, the shard only hashes
    //      itself ----
    "dedup_incremental" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val index = NearDup.lshBandIndex(
        docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text",
        m = 8, n = 3, r = 2)
      NearDup.lshProbeIndex(
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text",
        index, m = 8, n = 3, r = 2)
    }),

    // ---- LLM pipeline: containment scoring on the same candidates —
    //      catches subset duplication Jaccard underweights ----
    "dedup_containment" -> ((s, dir) =>
      NearDup.containmentVerify(
        t(s, dir, "documents"), "doc_id", "text",
        m = 8, n = 3, r = 2, minContainment = 0.05)),

    // ---- LLM pipeline: eval-set decontamination (benchmark-leakage
    //      filter; eval = every 20th doc, broadcast hash-set semi-join) ----
    "dedup_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      NearDup.decontaminate(
        docs.where(col("doc_id") % 20 =!= 3), "doc_id", "text",
        docs.where(col("doc_id") % 20 === 3), "text",
        n = 5, minHits = 2)
    }),

    // ---- LLM pipeline: duplicated-span statistics (exact substring-level
    //      dedup signal: fraction of distinct 5-gram spans shared with
    //      any other doc; df via window, no join-back) ----
    "dedup_span_stats" -> ((s, dir) =>
      NearDup.duplicatedSpanStats(
        t(s, dir, "documents"), "doc_id", "text", n = 5)),

    // ---- LLM pipeline: MAXIMAL duplicated spans — variable-length
    //      exact cross-doc repeats ≥ 8 tokens with positions and exact
    //      length (suffix-group bucket join + row-local extension; the
    //      span-level truth dedup_span_stats only summarizes) ----
    "dedup_longest_span" -> ((s, dir) =>
      NearDup.maximalDupSpans(
        t(s, dir, "documents"), "doc_id", "text", k = 8, maxAnchorDf = 64)),

    // ---- LLM pipeline: cluster representative selection (keep the
    //      longest member of each near-dup cluster, singletons keep
    //      themselves; the keep-list stage after dedup_clusters) ----
    "dedup_keep_best" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      NearDup.clusterRepresentatives(
        docs.select(col("doc_id"), col("n_chars")), "doc_id", "n_chars",
        NearDup.lshCandidatePairs(docs, "doc_id", "text", m = 8, n = 3, r = 2))
    }),

    // ---- Crawl pipeline: canonical-URL dedup — the parse → canonical
    //      key → keep-best composition (scheme/www/query noise collapses
    //      onto one canonical page; best fetch = longest, id tie);
    //      synthesized URLs collide on doc_id % 50 by construction ----
    "dedup_url_canonical" -> ((s, dir) => {
      val url = concat(
        lit("https://"),
        when(col("doc_id") % 3 === 0, lit("www.")).otherwise(lit("")),
        col("source"), lit(".example.com/docs/"),
        (col("doc_id") % 50).cast("string"),
        when(col("doc_id") % 2 === 0,
          concat(lit("?utm_source=feed&id="), col("doc_id").cast("string")))
          .otherwise(lit("")))
      val docs = t(s, dir, "documents")
      val parsed = graft.ops.TextAnalysis.urlParse(
        docs.select(col("doc_id"), url.as("u")), "doc_id", "u")
      val keyed = parsed
        .select(col("doc_id"),
          concat(col("registered_domain"),
            regexp_replace(col("path"), "/$", "")).as("curl"))
        .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
        .withColumn("neg_id", -col("doc_id"))
      graft.ops.Dedup.latestWins(keyed, Seq("curl"), "n_chars",
          Seq("neg_id"))
        .select(col("curl"), col("doc_id").as("keep_doc_id"),
          col("n_chars"))
    }),

    // ---- LLM pipeline: duplicated-span SCRUB (ExactSubstr removal:
    //      drop token positions covered by any repeated 5-gram span,
    //      reassemble the surviving text; two linear shuffles) ----
    "dedup_span_scrub" -> ((s, dir) =>
      NearDup.scrubDuplicatedSpans(
        t(s, dir, "documents"), "doc_id", "text", n = 5)),

    // ---- LLM pipeline: embedding cosine near-dup (LSH-bucketed) ----
    "dedup_embedding_cosine" -> ((s, dir) =>
      Similarity.cosineNearDupPairs(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        dim = 64, planes = 4, minCos = 0.3)),

    // ---- Embeddings: mutual kNN graph (LSH-bucketed top-3 per vector,
    //      edge kept only when both endpoints chose each other) — the
    //      similarity-graph substrate for density clustering ----
    "emb_knn_graph" -> ((s, dir) =>
      Similarity.mutualKnnGraph(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        dim = 64, planes = 4, k = 3)),

    // ---- Embedding QA: anisotropy census — corpus-wide average
    //      pairwise cosine WITHOUT pair enumeration (resultant-vector
    //      identity, exact quantized integers) + mean resultant
    //      length; the run-before-trusting-cosine diagnostic ----
    "emb_anisotropy" -> ((s, dir) =>
      Similarity.anisotropyCensus(
        t(s, dir, "embeddings"), "vec_id", "embedding")),

    // ---- LLM pipeline: margin-based bitext mining (Artetxe & Schwenk
    //      2019) — en vectors paired to non-en vectors by RATIO MARGIN
    //      (cosine over the mean of both sides' kNN cosines), LSH-
    //      bucketed candidates, best target per source above margin 1 ----
    "emb_bitext_margin" -> ((s, dir) => {
      val lang = t(s, dir, "documents")
        .select(col("doc_id").as("vec_id"), col("lang"))
      Similarity.bitextMarginMine(
        t(s, dir, "embeddings").join(lang, "vec_id"),
        "vec_id", "embedding", col("lang") === "en",
        k = 4, dim = 64, planes = 4, minMargin = 1.0)
    }),

    // ---- Embedding QA: linear-kernel MMD² drift between the two id-
    //      parity halves, per-dimension exact integers (×64 power-of-
    //      two quantization is rounding-free) ----
    "emb_mmd_shift" -> ((s, dir) =>
      Similarity.mmdShift(t(s, dir, "embeddings"), "vec_id", "embedding",
        pmod(col("vec_id"), lit(2L)))),

    // ---- Dedup: b-bit minhash (Li & König 2011) — keep only the LOW
    //      BIT of each of the 8 minhash permutations; matching-bit
    //      counts on consecutive-id pairs are the storage-compressed
    //      similarity signal (8 bits vs 8×64-bit signature) ----
    "dedup_bbit_minhash" -> ((s, dir) => {
      val sig = t(s, dir, "documents").select(col("doc_id"),
        TextHash.minhashSignature(
          TextHash.shingleHashes(
            TextHash.wordHashes(col("text")), 3), 8).as("sig"))
      val a = sig.select(col("doc_id").as("id_a"), col("sig").as("sig_a"))
      val b = sig.select((col("doc_id") - 1L).as("id_a"),
        col("doc_id").as("id_b"), col("sig").as("sig_b"))
      a.join(b, "id_a")
        .select(col("id_a"), col("id_b"),
          (0 until 8).map(j =>
            when(pmod(element_at(col("sig_a"), j + 1), lit(2L)) ===
              pmod(element_at(col("sig_b"), j + 1), lit(2L)), 1L)
              .otherwise(0L)).reduce(_ + _).as("n_match_bits"))
    }),

    // ---- LLM pipeline: one NN-DESCENT round — the kNN-graph
    //      construction algorithm behind graph ANN indexes: LSH-seeded
    //      lists refined through the undirected two-hop candidate set
    //      (bounded (2k)² fan-out per node, never n²) ----
    "ann_nndescent" -> ((s, dir) =>
      Similarity.nnDescentRound(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        dim = 64, planes = 4, k = 4)),

    // ---- LLM pipeline: LSH-bucketed ANN top-k (the scale path) ----
    "ann_lsh_topk" -> ((s, dir) =>
      Similarity.lshTopK(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        col("vec_id") < 10, k = 10, dim = 64, planes = 4)),

    // ---- LLM pipeline: semi-hard negative mining for triplet /
    //      contrastive training (FaceNet rule, margin = d²(a,p)):
    //      LSH-bucketed candidates, exact integer quantized distances,
    //      hardest qualifying negative per anchor ----
    "emb_triplet_mining" -> ((s, dir) =>
      Similarity.tripletMining(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        dim = 64, planes = 4)),

    // ---- LLM pipeline: hubness census — the k-occurrence histogram
    //      (Radovanović 2010), the ANN-pathology diagnostic to run
    //      BEFORE trusting embedding-based dedup; exact bucketed kNN,
    //      zero-occurrence points included ----
    "emb_hubness" -> ((s, dir) =>
      Similarity.hubnessCensus(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 5, dim = 64, planes = 4)),

    // ---- LLM pipeline: IVF ANN top-k over LEARNED cells (2 Lloyd's
    //      iterations of deterministic fixed-point k-means) ----
    "ann_ivf_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(emb, "vec_id", "embedding",
        col("vec_id") < 10, k = 10,
        Similarity.kmeansCentroids(emb, "vec_id", "embedding",
          k = 8, iters = 2), nprobe = 1)
    }),

    // ---- Recall knobs: multi-probe LSH (own + 2 Hamming-1 buckets) ----
    "ann_lsh_multiprobe" -> ((s, dir) =>
      Similarity.lshTopK(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        col("vec_id") < 10, k = 10, dim = 64, planes = 4, probes = 3)),

    // ---- Recall knobs: IVF with nprobe=2 learned cells per query ----
    "ann_ivf_nprobe" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(emb, "vec_id", "embedding",
        col("vec_id") < 10, k = 10,
        Similarity.kmeansCentroids(emb, "vec_id", "embedding",
          k = 8, iters = 2), nprobe = 2)
    }),

    // ---- LLM pipeline: product-quantized ANN — 4×16 spherical
    //      codebooks (~64× compression), row-local encoding, ADC coarse
    //      rank via codeword reconstruction, exact top-10 rerank ----
    "ann_pq_topk" -> ((s, dir) =>
      Similarity.pqTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
        col("vec_id") < 10, k = 10, dim = 64)),

    // ---- LLM pipeline: IVF-PQ composed — the billion-scale ANN
    //      architecture (FAISS IndexIVFPQ shape): coarse cells route,
    //      PQ compresses the RESIDUAL v − centroid, queries probe
    //      nprobe cells and rank by dot(q, centroid + reconstruction),
    //      exact rerank last. Composes the two proven stages. ----
    "ann_ivfpq_topk" -> ((s, dir) =>
      Similarity.ivfPqTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
        col("vec_id") < 10, k = 10, dim = 64)),

    // ---- LLM pipeline: SemDeDup — k-means cells + in-cell cosine
    //      prune, min-id representative per semantic duplicate set ----
    "dedup_semantic" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.semanticDedup(emb, "vec_id", "embedding",
        Similarity.kmeansCentroids(emb, "vec_id", "embedding",
          k = 8, iters = 2), threshold = 0.2)
    }),

    // ---- LLM pipeline: HLL distinct-count sketch — NO distinct shuffle
    //      (max absorbs duplicates; ≤ m rows/group cross the wire), union
    //      = elementwise register max; registers pinned to the shared
    //      hash family so the oracle replays them exactly ----
    "sketch_hll_distinct" -> ((s, dir) =>
      graft.ops.Sketches.hllEstimate(
        graft.ops.Sketches.hllSketchTokens(
          t(s, dir, "documents"), Seq("lang"), "text"))),

    // ---- Sketch accuracy eval: HLL estimate vs exact distinct per
    //      group — the error read an m is tuned by (the ann_recall of
    //      the cardinality world) ----
    "sketch_hll_error" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val est = graft.ops.Sketches.hllEstimate(
        graft.ops.Sketches.hllSketchIds(ev, Seq("event_type"), "user_id"))
        .select(col("event_type"), col("est_distinct"))
      val exact = ev.filter(col("user_id").isNotNull)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_distinct"))
      exact.join(est, "event_type")
        .withColumn("rel_err",
          (col("est_distinct") - col("exact_distinct").cast("double")) /
            col("exact_distinct").cast("double"))
    }),

    // ---- LLM pipeline: HLL mergeability — per-(lang,source) registers
    //      rolled up to per-lang by elementwise max WITHOUT rescanning
    //      text must equal the direct per-lang sketch (oracle computes
    //      direct) ----
    "sketch_hll_merge" -> ((s, dir) =>
      graft.ops.Sketches.hllEstimate(
        graft.ops.Sketches.hllMerge(
          graft.ops.Sketches.hllSketchTokens(
            t(s, dir, "documents"), Seq("lang", "source"), "text"),
          Seq("lang")))),

    "sketch_bloom_contains" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Sketches.bloomContains(
        graft.ops.Sketches.bloomSketchTokens(
          t(s, dir, "documents"), Seq("lang"), "text"),
        Seq("lang"), bloomProbes.toDF("word"), "word")
    }),

    // ---- LLM pipeline: Bloom mergeability — per-(lang,source) bitmaps
    //      OR-merged to per-lang == direct per-lang build (gated via the
    //      popcount; the oracle counts distinct set positions) ----
    "sketch_bloom_merge" -> ((s, dir) =>
      graft.ops.Sketches.bloomBitsSet(
        graft.ops.Sketches.bloomMerge(
          graft.ops.Sketches.bloomSketchTokens(
            t(s, dir, "documents"), Seq("lang", "source"), "text"),
          Seq("lang")))),

    // ---- LLM pipeline: count-min sketch — approximate token frequencies
    //      in fixed memory (≤ depth·width rows/group cross the shuffle,
    //      no vocabulary state); min-over-depth point queries ----
    "sketch_cms_counts" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Sketches.cmsEstimate(
        graft.ops.Sketches.cmsSketchTokens(
          t(s, dir, "documents"), Seq("lang"), "text"),
        Seq("lang"), bloomProbes.toDF("word"), "word")
    }),

    // ---- Sketch accuracy eval: CMS estimate vs exact token count —
    //      the overestimate is gated ≥ 0 by construction ----
    "sketch_cms_error" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val est = graft.ops.Sketches.cmsEstimate(
        graft.ops.Sketches.cmsSketchTokens(docs, Seq("lang"), "text"),
        Seq("lang"), bloomProbes.toDF("word"), "word")
      val exact = docs
        .select(col("lang"),
          explode(filter(split(lower(col("text")), "\\s+"),
            w => w =!= "")).as("word"))
        .join(broadcast(bloomProbes.toDF("word")), "word")
        .groupBy(col("lang"), col("word"))
        .agg(count(lit(1)).as("exact_count"))
      est.join(exact, Seq("lang", "word"), "left_outer")
        .select(col("lang"), col("word"),
          coalesce(col("exact_count"), lit(0L)).as("exact_count"),
          col("est_count"),
          (col("est_count") - coalesce(col("exact_count"), lit(0L)))
            .as("overestimate"))
    }),

    // ---- Sketch accuracy eval: log-bucket quantile estimate vs the
    //      exact interpolated percentile (≤0.5% by bucket design) ----
    "sketch_quantile_error" -> ((s, dir) => {
      val base = t(s, dir, "lineitem").select(
        col("l_returnflag").as("g"),
        col("l_extendedprice").cast("double").as("x"))
      val est = graft.ops.Sketches.quantileFromSketch(
        graft.ops.Sketches.quantileSketch(base, Seq("g"), "x"),
        Seq("g"), Seq(50, 90, 99))
      val exw = base.groupBy("g").agg(
        expr("percentile(x, 0.5)").as("e50"),
        expr("percentile(x, 0.9)").as("e90"),
        expr("percentile(x, 0.99)").as("e99"))
      val ex = exw.select(col("g"), explode(map(
        lit(50), col("e50"), lit(90), col("e90"), lit(99), col("e99")))
        .as(Seq("pct", "exact")))
      est.join(ex, Seq("g", "pct"))
        .select(col("g"), col("pct").cast("long").as("pct"),
          col("n_rows"), col("est"), col("exact"),
          round(abs(col("est") - col("exact")) / col("exact"), 8)
            .as("rel_err"))
    }),

    // ---- LLM pipeline: CMS mergeability — per-(lang,source) sketches
    //      SUM-merged to per-lang == direct build (probed; oracle
    //      computes direct) ----
    "sketch_cms_merge" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Sketches.cmsEstimate(
        graft.ops.Sketches.cmsMerge(
          graft.ops.Sketches.cmsSketchTokens(
            t(s, dir, "documents"), Seq("lang", "source"), "text"),
          Seq("lang")),
        Seq("lang"), bloomProbes.toDF("word"), "word")
    }),

    // ---- LLM pipeline: KMV distinct-count sketch (mergeable, hash-exact
    //      cross-engine; doubles as a set-overlap estimator, which HLL
    //      registers cannot) ----
    "sketch_kmv_distinct" -> ((s, dir) =>
      graft.ops.Sketches.kmvDistinctTokens(
        t(s, dir, "documents"), "lang", "text", k = 64)),

    // ---- LLM pipeline: KMV mergeability — per-(lang,source) sketches
    //      rolled up to per-lang WITHOUT rescanning text must equal the
    //      direct per-lang sketch (the oracle computes direct) ----
    "sketch_kmv_merge" -> ((s, dir) => {
      val fine = graft.ops.Sketches.kmvSketchTokens(
        t(s, dir, "documents"), Seq("lang", "source"), "text", k = 64)
      graft.ops.Sketches.kmvEstimate(
        graft.ops.Sketches.kmvMerge(fine, Seq("lang"), k = 64), k = 64)
    }),

    // ---- LLM pipeline: pairwise vocabulary overlap between languages
    //      from KMV sketches alone (union by merge + inclusion-
    //      exclusion; #pairs × k cost, no corpus rescan) ----
    "sketch_kmv_jaccard" -> ((s, dir) =>
      graft.ops.Sketches.kmvJaccard(
        graft.ops.Sketches.kmvSketchTokens(
          t(s, dir, "documents"), Seq("lang"), "text", k = 64),
        "lang", k = 64)),

    // ---- LLM pipeline: per-label embedding centroids (class
    //      prototypes; fixed-point sums → hash-exact cross-engine) ----
    "emb_centroid_by_label" -> ((s, dir) =>
      Similarity.groupCentroids(
        t(s, dir, "embeddings"), "label", "embedding")),

    // ---- LLM pipeline: label-centroid drift matrix (pairwise cosine
    //      between per-label centroids; broadcast self-join of an
    //      O(groups) frame) ----
    "emb_centroid_drift" -> ((s, dir) =>
      Similarity.centroidDrift(
        t(s, dir, "embeddings"), "label", "embedding")),

    // ---- LLM pipeline: random-projection dim reduction (JL sketch,
    //      deterministic hyperplane family, row-local) ----
    "emb_random_project" -> ((s, dir) =>
      Similarity.randomProject(
        t(s, dir, "embeddings"), "vec_id", "embedding", dim = 64, outDim = 8)),

    // ---- LLM pipeline: brute-force cosine top-k (ANN baseline) ----
    "ann_topk" -> ((s, dir) =>
      Similarity.bruteForceTopK(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        col("vec_id") < 10, k = 10)),

    // ---- LLM pipeline: FILTERED vector search — top-k restricted to a
    //      metadata predicate (the real vector-DB workload: "nearest
    //      neighbors among label-even docs only") ----
    "ann_filtered_topk" -> ((s, dir) =>
      Similarity.bruteForceTopK(
        t(s, dir, "embeddings").filter(col("label") % 2 === 0),
        "vec_id", "embedding", col("vec_id") < 20, k = 10)),

    // ---- LLM pipeline: hard-example mining for contrastive training —
    //      per broadcast anchor, the most-similar different-label and
    //      least-similar same-label vectors via k=1 TopK aggregates
    //      (ids only — the ann-family float-free gate discipline) ----
    "emb_hard_mining" -> ((s, dir) =>
      Similarity.hardMining(
        t(s, dir, "embeddings"), "vec_id", "embedding", "label",
        pmod(col("vec_id"), lit(199L)) === 0L)),

    // ---- LLM pipeline: coreset coverage audit — per-corpus-row best
    //      cosine to the broadcast sample, quantized to exact integer
    //      units before summing (no float-sum order dependence) ----
    "emb_coverage" -> ((s, dir) =>
      Similarity.sampleCoverage(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        pmod(col("vec_id"), lit(97L)) === 0L)),

    // ---- LLM pipeline: Matryoshka truncation eval — recall@k of the
    //      16-dim prefix against the full-dim brute-force truth (can
    //      we serve from the cheap prefix index?) ----
    "ann_matryoshka_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
          col("vec_id") < 10, k = 10)
        .select(col("query_id"), col("neighbor_id"))
      val trunc = Similarity.bruteForceTopK(
          emb.select(col("vec_id"),
            slice(col("embedding"), 1, 16).as("embedding")),
          "vec_id", "embedding", col("vec_id") < 10, k = 10)
        .select(col("query_id"), col("neighbor_id"), lit(1L).as("__hit"))
      exact.join(trunc, Seq("query_id", "neighbor_id"), "left_outer")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("k"),
          coalesce(sum(col("__hit")), lit(0L)).as("n_hit"))
        .select(col("query_id"), col("k"), col("n_hit"),
          (col("n_hit").cast("double") / col("k").cast("double"))
            .as("recall"))
    }),

    // ---- LLM pipeline: ANN quality evaluation — recall@k of the LSH
    //      path against the brute-force truth, the number an index is
    //      tuned by (exact overlap counts, ONE division per query) ----
    "ann_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
          col("vec_id") < 10, k = 10)
        .select(col("query_id"), col("neighbor_id"))
      val approx = Similarity.lshTopK(emb, "vec_id", "embedding",
          col("vec_id") < 10, k = 10, dim = 64, planes = 4)
        .select(col("query_id"), col("neighbor_id"), lit(1L).as("__hit"))
      exact.join(approx, Seq("query_id", "neighbor_id"), "left_outer")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("k"),
          coalesce(sum(col("__hit")), lit(0L)).as("n_hit"))
        .select(col("query_id"), col("k"), col("n_hit"),
          (col("n_hit").cast("double") / col("k").cast("double"))
            .as("recall"))
    }),

    // ---- Record linkage: sorted-neighborhood blocking + native
    //      Jaro-Winkler verify (codegen kernel; oracle replays the
    //      greedy match scan decision-for-decision) ----
    "dedup_jaro_blocked" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, dir, "documents").select(col("doc_id"),
        lower(substring(col("text"), 1, 16)).as("title"), col("lang"))
      val ranked = docs.withColumn("rnk", row_number().over(Window
        .partitionBy(col("lang"))
        .orderBy(col("title").asc, col("doc_id").asc)))
      // neighbor ranks exploded -> pure equi-join on (lang, rank)
      val right = ranked.select(col("lang"),
        col("doc_id").as("doc_b"), col("title").as("tb"),
        col("rnk").as("rb"))
      val pairs = ranked
        .select(col("lang"), col("doc_id").as("doc_a"),
          col("title").as("ta"),
          explode(array((1 to 3).map(col("rnk") + _): _*)).as("rb"))
        .join(right, Seq("lang", "rb"))
      pairs
        .withColumn("jw", TextHash.jaroWinkler(col("ta"), col("tb")))
        .filter(col("jw") >= 0.8)
        .select(col("doc_a"), col("doc_b"), col("jw"))
    }),

    // ---- Entity resolution: PHONETIC blocking — the classic Soundex
    //      blocking key (pinned automaton, native codegen kernel; the
    //      oracle replays the same public algorithm as a DuckDB
    //      list_reduce): same-sounding leading tokens land in one
    //      block, per-block candidate stats bound the verify cost ----
    "dedup_soundex_blocked" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        regexp_extract(lower(col("text")), "([a-z]+)", 1).as("tok"))
      docs
        .withColumn("code", TextHash.soundexCode(col("tok")))
        .filter(col("code") =!= "")
        .groupBy(col("code"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("tok")).as("n_tokens"),
          min(col("tok")).as("min_tok"), max(col("tok")).as("max_tok"))
        .filter(col("n_docs") > 1)
    }),

    // ---- Entity resolution: NYSIIS phonetic blocking — the second
    //      phonetic key family (finer than Soundex on vowel-heavy
    //      names); ONE shared rewrite-step table drives both the Spark
    //      regexp chain and the DuckDB oracle, so they cannot drift ----
    "dedup_nysiis_blocked" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        regexp_extract(lower(col("text")), "([a-z]+)", 1).as("tok"))
      docs
        .withColumn("code", graft.functions.Nysiis.keyCol(col("tok")))
        .filter(col("code") =!= "")
        .groupBy(col("code"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("tok")).as("n_tokens"),
          min(col("tok")).as("min_tok"), max(col("tok")).as("max_tok"))
        .filter(col("n_docs") > 1)
    }),

    // ---- MDM: Fellegi-Sunter probabilistic linkage — log-likelihood-
    //      ratio field weights over sorted-neighborhood candidates;
    //      score = sum of injected-literal weights, match/possible split ----
    "dedup_fellegi_sunter" -> ((s, dir) =>
      Dedup.fellegiSunter(
        t(s, dir, "documents").select(col("doc_id"),
          lower(substring(col("text"), 1, 16)).as("title"),
          col("lang"), col("source"), col("n_chars")),
        "doc_id", "lang", "title", "source", "n_chars")),

    // ---- LLM pipeline: kNN label-consistency eval — majority-vote
    //      label prediction from the top-10 neighbors (does the
    //      embedding space encode the labels?) ----
    "emb_knn_accuracy" -> ((s, dir) =>
      Similarity.knnLabelAccuracy(
        t(s, dir, "embeddings"), "vec_id", "embedding", "label",
        col("vec_id") < 10, k = 10)),

    // ---- LLM pipeline: per-domain cap sampling (anti-domination) ----
    "sample_domain_cap" -> ((s, dir) =>
      graft.ops.Sampling.capPerDomain(
        t(s, dir, "documents").select(col("doc_id"), col("source"), col("lang")),
        "source", "doc_id", cap = 12)),

    // ---- LLM pipeline: proportional stratified sampling (every
    //      language survives at its true proportion) ----
    "sample_stratified" -> ((s, dir) =>
      graft.ops.Sampling.stratifiedSample(
        t(s, dir, "documents").select(col("doc_id"), col("source"), col("lang")),
        "lang", "doc_id", percent = 20)),

    // ---- LLM pipeline: leading principal component of the embedding
    //      corpus by deterministic power iteration (drift direction /
    //      whitening seed) — exact quantized matrix products, strict
    //      in-row folds, 3 rounds from the fixed e0 seed ----
    "emb_pca_power" -> ((s, dir) =>
      Similarity.pcaPowerIteration(
        t(s, dir, "embeddings").select(col("embedding")),
        "embedding", iters = 3)),

    // ---- LLM pipeline: embedding outlier audit — per-label distance
    //      to the exact centroid flagged against the sketch-p99
    //      (mislabel/garbage detection; empty result IS the pass) ----
    "emb_outliers" -> ((s, dir) =>
      Similarity.centroidOutliers(
        t(s, dir, "embeddings"), "vec_id", "label", "embedding")),

    // ---- LLM pipeline: 1-D drift scores — every vector projected onto
    //      the leading principal component (embedding drift as a plain
    //      time series) ----
    "emb_pca_project" -> ((s, dir) =>
      Similarity.pcaProjection(
        t(s, dir, "embeddings").select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", iters = 3)),

    // ---- LLM pipeline: int8 scalar-quantized ANN + exact rerank ----
    "ann_sq8_topk" -> ((s, dir) =>
      Similarity.sq8TopK(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        col("vec_id") < 10, k = 10, rerank = 50)),

    // ---- ANN: binary quantization (sign bits, 256× compression) —
    //      hamming coarse rank on two 32-bit words, exact cosine rerank ----
    "ann_bq_topk" -> ((s, dir) =>
      Similarity.bqTopK(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        col("vec_id") < 10, k = 10, rerank = 50)),

    // ---- LLM pipeline: per-domain mixture sampling (data mixing) ----
    "sample_mixture" -> ((s, dir) =>
      graft.ops.Sampling.sampleMixture(
        t(s, dir, "documents").select(col("doc_id"), col("source"), col("lang")),
        "source", "doc_id",
        Map("src0" -> 50, "src1" -> 25, "src2" -> 0), defaultPercent = 80)),

    // ---- LLM pipeline: temperature-scaled domain mixture (p_d ∝ n_d^α
    //      — mT5/ROOTS-style α-flattening of the source distribution;
    //      expected 60% of the corpus kept, tail sources up-weighted) ----
    "sample_temperature" -> ((s, dir) =>
      graft.ops.Sampling.sampleTemperature(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        "source", "doc_id", alpha = 0.6, targetFrac = 0.6)),

    // ---- LLM pipeline: curriculum binning + per-bin thinning (quality
    //      deciles per language; the two lowest deciles are thinned) ----
    "sample_curriculum" -> ((s, dir) => {
      val binned = graft.ops.Sampling.quantileBins(
        t(s, dir, "documents").select(col("doc_id"), col("lang"), col("n_chars")),
        "lang", "n_chars", "doc_id", bins = 10)
      graft.ops.Sampling.sampleByBin(
        binned, "bin", "doc_id", Map(1L -> 20, 2L -> 50), defaultPercent = 100)
    }),

    // ---- LLM pipeline: importance sampling by computed per-row rate
    //      (longer docs kept at higher probability, capped at 90%) ----
    "sample_importance" -> ((s, dir) =>
      graft.ops.Sampling.sampleByRateColumn(
        t(s, dir, "documents").select(col("doc_id"), col("lang"), col("n_chars")),
        "doc_id", least(lit(90L), expr("n_chars div 20")))),

    // ---- LLM pipeline: weighted sample WITHOUT replacement (exactly k
    //      per language, inclusion odds ∝ length) — deterministic
    //      Efraimidis–Sirivianos exponential keys off the shared hash ----
    "sample_weighted" -> ((s, dir) =>
      graft.ops.Sampling.sampleWeighted(
        t(s, dir, "documents"), "lang", "doc_id", "n_chars", k = 12)),

    // ---- Sampling: class-rebalancing negative downsampling (keep all
    //      positives, 10% hash sample of negatives, inverse-rate
    //      importance weights — row-local, shuffle-free) ----
    "sample_downsample_neg" -> ((s, dir) =>
      graft.ops.Sampling.downsampleNegatives(
        t(s, dir, "events"), "event_id",
        col("event_type") === "purchase", keepPct = 10)),

    // ---- RAG: maximal-marginal-relevance diversified top-k — one
    //      distributed relevance pass + bounded-pool greedy rerank;
    //      λ=0.5 so both weights are exact binary doubles ----
    "emb_mmr" -> ((s, dir) =>
      Similarity.mmrSelect(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        queryId = 0L, k = 8, poolSize = 48)),

    // ---- LLM pipeline: label-centroid silhouette — cluster-quality
    //      read over the labeled embeddings (O(rows·labels), quantized
    //      exact rollup) ----
    "emb_silhouette" -> ((s, dir) =>
      Similarity.labelSilhouette(
        t(s, dir, "embeddings"), "vec_id", "embedding", "label")),

    // ---- Sampling: Neyman-allocation stratified sample — the
    //      variance-optimal budget split (n_h ∝ N_h·σ_h over n_chars),
    //      largest-remainder rounding, shared permute-hash take ----
    "sample_neyman" -> ((s, dir) =>
      graft.ops.Sampling.neymanSample(
        t(s, dir, "documents"), "source", "doc_id", "n_chars", k = 200)),

    // ---- MDM: field-level survivorship — golden record per canonical-
    //      URL duplicate cluster (longest content donates the id, min id
    //      is provenance, langs union as sorted tags); ONE map-side-
    //      combinable aggregate after the keying join ----
    "dedup_survivorship" -> ((s, dir) => {
      val url = concat(
        lit("https://"),
        when(col("doc_id") % 3 === 0, lit("www.")).otherwise(lit("")),
        col("source"), lit(".example.com/docs/"),
        (col("doc_id") % 50).cast("string"),
        when(col("doc_id") % 2 === 0,
          concat(lit("?utm_source=feed&id="), col("doc_id").cast("string")))
          .otherwise(lit("")))
      val docs = t(s, dir, "documents")
      val parsed = graft.ops.TextAnalysis.urlParse(
        docs.select(col("doc_id"), url.as("u")), "doc_id", "u")
      val keyed = parsed
        .select(col("doc_id"),
          concat(col("registered_domain"),
            regexp_replace(col("path"), "/$", "")).as("curl"))
        .join(docs.select(col("doc_id"), col("n_chars"), col("lang")),
          "doc_id")
      Dedup.survivorship(keyed, "curl", "doc_id", "n_chars", "lang")
    }),

    // ---- Sampling: systematic PPS — every (W/k)-th point of the
    //      weight line, inclusion exactly proportional to size;
    //      columnar global cumsum (range partitions + broadcast
    //      prefix), the survey-sampling draw for size-skewed corpora ----
    "sample_pps" -> ((s, dir) =>
      graft.ops.Sampling.systematicPps(
        t(s, dir, "documents"), col("doc_id"), col("n_chars"), k = 50)),

    // ---- Sampling: PRIORITY sampling (Duffield–Lund–Thorup) — the
    //      weighted without-replacement scheme with near-optimal
    //      subset-sum variance; deterministic hash uniforms, top-k by
    //      w·P/h, one TakeOrdered ----
    "sample_priority" -> ((s, dir) =>
      graft.ops.Sampling.prioritySample(
        t(s, dir, "orders")
          .select(col("o_orderkey"),
            (floor(col("o_totalprice")).cast("long") + 1L).as("w")),
        "o_orderkey", "w", k = 40)),
  )

  def oracles: Map[String, String] = {
    // Independent DuckDB replay of the pinned Soundex automaton
    // (NativeKernels.soundex scaladoc) in CLOSED FORM: position i
    // emits its class digit iff the class is > 0 and differs from the
    // class of the nearest previous non-h/w letter (h/w invisible,
    // vowels present as class 0 so they break runs) — provably the
    // same emission set as the sequential automaton. Deliberately NOT
    // list_reduce: DuckDB 1.0.0 cross-contaminates accumulator rows
    // when a lambda branch returns the accumulator unchanged over
    // mixed-length lists (minimal repro in the round-10 notes).
    val soundexSql = {
      def cls(c: String) = s"CASE WHEN $c IN ('b','f','p','v') THEN 1 " +
        s"WHEN $c IN ('c','g','j','k','q','s','x','z') THEN 2 " +
        s"WHEN $c IN ('d','t') THEN 3 WHEN $c = 'l' THEN 4 " +
        s"WHEN $c IN ('m','n') THEN 5 WHEN $c = 'r' THEN 6 " +
        s"WHEN $c IN ('h','w') THEN -1 ELSE 0 END"
      "WITH d AS (SELECT doc_id, regexp_extract(lower(text), " +
        "'([a-z]+)', 1) AS tok FROM documents), " +
        "f AS (SELECT doc_id, tok, list_transform(" +
        "range(1, length(tok) + 1), i -> " +
        s"${cls("substr(tok, CAST(i AS INT), 1)")}" +
        ") AS codes FROM d WHERE tok <> ''), " +
        "r AS (SELECT doc_id, tok, upper(substr(tok, 1, 1)) || " +
        // coalesce: array_to_string of an EMPTY list is NULL in DuckDB
        "substr(coalesce(array_to_string(list_transform(" +
        "list_filter(range(2, len(codes) + 1), i -> " +
        "codes[i] > 0 AND codes[i] <> coalesce(" +
        "list_filter(codes[1:i-1], c -> c <> -1)[-1], -9)), " +
        "i -> CAST(codes[i] AS VARCHAR)), ''), '') || '000', 1, 3) AS code " +
        "FROM f) " +
        "SELECT code, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(count(DISTINCT tok) AS BIGINT) AS n_tokens, " +
        "min(tok) AS min_tok, max(tok) AS max_tok " +
        "FROM r GROUP BY code HAVING count(*) > 1"
    }
    val domainCapSql =
      "SELECT doc_id, source, lang FROM (" +
        "SELECT doc_id, source, lang, row_number() OVER (" +
        "PARTITION BY source ORDER BY " +
        s"(doc_id * ${TextHash.permuteA(0)} + ${TextHash.permuteB(0)}) " +
        s"% ${TextHash.P}, doc_id) AS rn FROM documents) WHERE rn <= 12"
    val stratifiedSql =
      "SELECT doc_id, source, lang FROM (" +
        "SELECT doc_id, source, lang, row_number() OVER (" +
        "PARTITION BY lang ORDER BY " +
        s"(doc_id * ${TextHash.permuteA(0)} + ${TextHash.permuteB(0)}) " +
        s"% ${TextHash.P}, doc_id) AS rn, " +
        "count(*) OVER (PARTITION BY lang) AS ng FROM documents) " +
        "WHERE rn * 100 <= ng * 20 + 99"

    // Sampling.hashBucket mirror: pmod keeps negative ids non-negative.
    val mixtureSql =
      s"SELECT doc_id, source, lang FROM documents WHERE $hashBucket < " +
        "CASE source WHEN 'src0' THEN 50 WHEN 'src1' THEN 25 " +
        "WHEN 'src2' THEN 0 ELSE 80 END"
    val curriculumSql =
      "WITH b AS (SELECT doc_id, lang, n_chars, ntile(10) OVER (" +
        "PARTITION BY lang ORDER BY n_chars, doc_id) AS bin FROM documents) " +
        s"SELECT doc_id, lang, n_chars, bin FROM b WHERE $hashBucket < " +
        "CASE bin WHEN 1 THEN 20 WHEN 2 THEN 50 ELSE 100 END"
    val importanceSql =
      s"SELECT doc_id, lang, n_chars FROM documents WHERE $hashBucket < " +
        "least(90, greatest(0, n_chars // 20))"
    val hllOracle = {
      val whl = OracleSql.wordHashes("lower(text)")
      val m = 64
      val rmax = graft.ops.Sketches.hllW(m) + 1
      val num = graft.ops.Sketches.hllAlpha(m) *
        m.toDouble * m.toDouble * math.pow(2.0, rmax)
      s"WITH t AS (SELECT lang, unnest($whl) AS h0 FROM documents), " +
        s"tp AS (SELECT lang, (h0 * ${TextHash.permuteA(0)} + " +
        s"${TextHash.permuteB(0)}) % ${TextHash.P} AS h FROM t), " +
        s"br AS (SELECT lang, h % $m AS b, CASE WHEN h // $m = 0 THEN $rmax " +
        s"ELSE $rmax - length(bin(h // $m)) END AS r FROM tp), " +
        s"mr AS (SELECT lang, b, max(r) AS r FROM br GROUP BY lang, b), " +
        s"g AS (SELECT lang, CAST($m - count(*) AS BIGINT) AS n_zero, " +
        s"CAST(sum((CAST(1 AS BIGINT) << $rmax) >> r) + " +
        s"($m - count(*)) * (CAST(1 AS BIGINT) << $rmax) AS BIGINT) " +
        "AS sum_q FROM mr GROUP BY lang) " +
        s"SELECT lang, n_zero, sum_q, $num / sum_q AS est_distinct FROM g"
    }
    val blockingStatsSql = {
      val sigCols = (0 until 8).map(j =>
        s"${OracleSql.minhash("sh", j)} AS mh$j").mkString(", ")
      s"WITH base AS (SELECT doc_id, $wh AS wh FROM documents), " +
        s"sh_t AS (SELECT doc_id, ${OracleSql.shingles("wh", 3)} AS sh FROM base), " +
        s"sig AS (SELECT doc_id, $sigCols FROM sh_t), " +
        s"banded AS (${OracleSql.lshBanded("doc_id", 8, 2)}), " +
        "blk AS (SELECT band, key, CAST(count(*) AS BIGINT) AS c " +
        "FROM banded GROUP BY 1, 2), " +
        "nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents), " +
        "m AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks, " +
        "CAST(coalesce(sum(c), 0) AS BIGINT) AS n_assignments, " +
        "CAST(coalesce(sum(c * (c - 1) // 2), 0) AS BIGINT) AS sum_pairs, " +
        "CAST(coalesce(max(c), 0) AS BIGINT) AS max_block FROM blk) " +
        "SELECT n_blocks, n_assignments, sum_pairs, max_block, " +
        "nd.n AS n_docs, CASE WHEN nd.n < 2 THEN NULL ELSE " +
        "1.0 - CAST(sum_pairs AS DOUBLE) / (CAST(nd.n AS DOUBLE) * " +
        "CAST(nd.n - 1 AS DOUBLE) / 2.0) END AS reduction_ratio " +
        "FROM m, nd"
    }
    val minhashByLang = {
      val sigCols = (0 until 4).map(j =>
        s"${OracleSql.minhash("sh", j)} AS mh$j").mkString(", ")
      s"WITH base AS (SELECT doc_id, $wh AS wh FROM documents), " +
        s"sh_t AS (SELECT doc_id, ${OracleSql.shingles("wh", 3)} AS sh FROM base), " +
        s"sig AS (SELECT doc_id, $sigCols FROM sh_t) " +
        "SELECT d.lang, min(mh0) AS mh0, min(mh1) AS mh1, min(mh2) AS mh2, " +
        "min(mh3) AS mh3, count(*) AS n_docs " +
        "FROM sig JOIN documents d USING (doc_id) GROUP BY d.lang"
    }
    val simhashSql =
      s"WITH base AS (SELECT doc_id, $wh AS wh FROM documents) " +
        s"SELECT doc_id, CAST(${OracleSql.simhash("wh", 16)} AS BIGINT) AS simhash FROM base"

    // Same CTE pipeline as minhashLsh up to the candidate pairs, then the
    // exact-Jaccard verify joins gram sets onto the candidates — mirrors
    // NearDup.ngramJaccardVerify stage for stage.
    // Sorted-neighborhood replay: DuckDB ranks the same (normalized
    // 24-char prefix, id) total order; the window pairing is a rank-range
    // join (nested loop is fine at oracle scale — the ENGINE uses the
    // block equi-join) and the verify is the shared bigram Jaccard.
    val sortedNeighborhoodSql = {
      s"WITH base AS (SELECT doc_id, text, $wh AS wh FROM documents), " +
        "k AS (SELECT doc_id, wh, substr(lower(regexp_replace(text, " +
        "'\\s+', ' ', 'g')), 1, 24) AS kk FROM base), " +
        "r AS (SELECT doc_id, wh, row_number() OVER (ORDER BY kk, doc_id) " +
        "- 1 AS rank FROM k), " +
        "cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM r a " +
        "JOIN r b ON b.rank > a.rank AND b.rank <= a.rank + 4), " +
        s"gr AS (SELECT doc_id, list_distinct(${OracleSql.shingles("wh", 2)}) " +
        "AS grams FROM base), " +
        "p AS (SELECT c.id_a, c.id_b, " +
        "CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE) / " +
        "CAST(len(list_distinct(list_concat(ga.grams, gb.grams))) AS DOUBLE) " +
        "AS jaccard FROM cand c JOIN gr ga ON ga.doc_id = c.id_a " +
        "JOIN gr gb ON gb.doc_id = c.id_b) " +
        "SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.05"
    }
    val jaccardSql = {
      val sigCols = (0 until 8).map(j =>
        s"${OracleSql.minhash("sh", j)} AS mh$j").mkString(", ")
      s"WITH base AS (SELECT doc_id, $wh AS wh FROM documents), " +
        s"sh_t AS (SELECT doc_id, ${OracleSql.shingles("wh", 3)} AS sh FROM base), " +
        s"sig AS (SELECT doc_id, $sigCols FROM sh_t), " +
        s"banded AS (${OracleSql.lshBanded("doc_id", 8, 2)}), " +
        "cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b " +
        "FROM banded a JOIN banded b " +
        "ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id), " +
        s"gr AS (SELECT doc_id, list_distinct(${OracleSql.shingles("wh", 2)}) AS grams FROM base), " +
        "p AS (SELECT c.id_a, c.id_b, " +
        "CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE) / " +
        "CAST(len(list_distinct(list_concat(ga.grams, gb.grams))) AS DOUBLE) AS jaccard " +
        "FROM cand c JOIN gr ga ON ga.doc_id = c.id_a JOIN gr gb ON gb.doc_id = c.id_b) " +
        "SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.01"
    }

    // same candidate chain, containment = |∩| / min(|A|, |B|)
    val containmentSql = {
      val sigCols = (0 until 8).map(j =>
        s"${OracleSql.minhash("sh", j)} AS mh$j").mkString(", ")
      s"WITH base AS (SELECT doc_id, $wh AS wh FROM documents), " +
        s"sh_t AS (SELECT doc_id, ${OracleSql.shingles("wh", 3)} AS sh FROM base), " +
        s"sig AS (SELECT doc_id, $sigCols FROM sh_t), " +
        s"banded AS (${OracleSql.lshBanded("doc_id", 8, 2)}), " +
        "cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b " +
        "FROM banded a JOIN banded b " +
        "ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id), " +
        s"gr AS (SELECT doc_id, list_distinct(${OracleSql.shingles("wh", 2)}) AS grams FROM base), " +
        "p AS (SELECT c.id_a, c.id_b, " +
        "CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE) / " +
        "CAST(least(len(ga.grams), len(gb.grams)) AS DOUBLE) AS containment " +
        "FROM cand c JOIN gr ga ON ga.doc_id = c.id_a JOIN gr gb ON gb.doc_id = c.id_b " +
        "WHERE least(len(ga.grams), len(gb.grams)) > 0) " +
        "SELECT id_a, id_b, containment FROM p WHERE containment >= 0.05"
    }

    // Mirrors scd2Dim + Scd2.applyChanges branch-for-branch.
    val prefixJaccardSql =
      s"WITH base AS (SELECT doc_id, $wh AS wh FROM documents), " +
        s"gr AS (SELECT doc_id, list_distinct(${OracleSql.shingles("wh", 2)}) AS g FROM base), " +
        "tt AS (SELECT doc_id, g, len(g) AS n FROM gr WHERE len(g) > 0) " +
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "CAST(len(list_intersect(a.g, b.g)) AS BIGINT) AS n_inter, " +
        "CAST(a.n + b.n - len(list_intersect(a.g, b.g)) AS BIGINT) AS n_union " +
        "FROM tt a JOIN tt b ON a.doc_id < b.doc_id " +
        "WHERE len(list_intersect(a.g, b.g)) * 5 >= " +
        "3 * (a.n + b.n - len(list_intersect(a.g, b.g)))"

    // Mirrors NearDup.decontaminate: distinct 5-gram shingles per side,
    // train rows hit when the shingle is in the eval distinct-hash set.
    val decontaminateSql =
      s"WITH base AS (SELECT doc_id, $wh AS wh FROM documents), " +
        s"sh_t AS (SELECT doc_id, list_distinct(${OracleSql.shingles("wh", 5)}) AS sh FROM base), " +
        "tr AS (SELECT doc_id, unnest(sh) AS h FROM sh_t WHERE doc_id % 20 != 3), " +
        "ev AS (SELECT DISTINCT unnest(sh) AS h FROM sh_t WHERE doc_id % 20 = 3), " +
        "hits AS (SELECT doc_id, count(*) AS n_hits FROM tr JOIN ev USING (h) GROUP BY doc_id) " +
        "SELECT s.doc_id, CAST(len(s.sh) AS BIGINT) AS n_shingles, " +
        "CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits, " +
        "coalesce(h.n_hits, 0) >= 2 AS contaminated " +
        "FROM sh_t s LEFT JOIN hits h USING (doc_id) WHERE s.doc_id % 20 != 3"

    // Mirrors NearDup.duplicatedSpanStats: df = COUNT window over the
    // exploded distinct (doc, shingle) rows; docs with no shingles drop.
    val spanStatsSql =
      s"WITH base AS (SELECT doc_id, $wh AS wh FROM documents), " +
        s"sh_t AS (SELECT doc_id, unnest(list_distinct(${OracleSql.shingles("wh", 5)})) AS h FROM base), " +
        "d AS (SELECT doc_id, count(*) OVER (PARTITION BY h) AS df FROM sh_t) " +
        "SELECT doc_id, count(*) AS n_shingles, " +
        "CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared, " +
        "CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS shared_frac, " +
        "CAST(max(df) AS BIGINT) AS max_df " +
        "FROM d GROUP BY doc_id"

    // Mirrors NearDup.maximalDupSpans: anchor k-grams with positions,
    // df-capped bucket join, left-maximal filter, row-local extension
    // to the first mismatch (IS DISTINCT FROM handles both-arrays-end:
    // null vs null is NOT distinct, so full overlap falls to the bound).
    val dupSpansSql = {
      val k = 8
      val cap = 64
      s"WITH sbase AS MATERIALIZED (SELECT doc_id, $wh AS wh FROM documents), " +
        "san AS MATERIALIZED (SELECT doc_id, g.pos AS pos, g.h AS h FROM (" +
        s"SELECT doc_id, unnest(${OracleSql.shingleStructs("wh", k)}) AS g " +
        "FROM sbase)), " +
        s"sdf AS (SELECT h FROM san GROUP BY h HAVING count(*) <= $cap), " +
        "scap AS MATERIALIZED (SELECT san.doc_id, san.pos, san.h " +
        "FROM san JOIN sdf USING (h)), " +
        "scand AS MATERIALIZED (SELECT a.doc_id AS id_a, a.pos AS pos_a, " +
        "b.doc_id AS id_b, b.pos AS pos_b " +
        "FROM scap a JOIN scap b ON a.h = b.h AND a.doc_id < b.doc_id), " +
        "sj AS MATERIALIZED (SELECT c.id_a, c.pos_a, c.id_b, c.pos_b, " +
        "ta.wh AS ta, tb.wh AS tb " +
        "FROM scand c JOIN sbase ta ON ta.doc_id = c.id_a " +
        "JOIN sbase tb ON tb.doc_id = c.id_b " +
        "WHERE (c.pos_a = 1 OR c.pos_b = 1 " +
        "OR ta.wh[c.pos_a - 1] IS DISTINCT FROM tb.wh[c.pos_b - 1])), " +
        "sext AS (SELECT id_a, id_b, pos_a, pos_b, CAST(coalesce(" +
        "list_filter(range(0, least(len(ta) - pos_a, len(tb) - pos_b) + 2), " +
        "i -> ta[pos_a + i] IS DISTINCT FROM tb[pos_b + i])[1], " +
        "least(len(ta) - pos_a, len(tb) - pos_b) + 1) AS BIGINT) AS match_len " +
        "FROM sj) " +
        "SELECT id_a, id_b, pos_a, pos_b, match_len FROM sext " +
        s"WHERE match_len >= $k"
    }

    // Mirrors NearDup.scrubDuplicatedSpans: one struct-unnest gives
    // (pos, tok, span-start hash); occurrence count windowed by hash,
    // coverage by a per-doc RANGE window, ordered string_agg rebuild.
    val spanScrubSql = {
      val words = OracleSql.words("text")
      val sh = OracleSql.shingles("wh", 5)
      s"WITH base AS (SELECT doc_id, $words AS toks, $wh AS wh FROM documents), " +
        s"b2 AS (SELECT doc_id, toks, $sh AS sh FROM base), " +
        "p AS (SELECT doc_id, unnest(list_transform(range(0, len(toks)), " +
        "i -> {'pos': i, 'tok': toks[i+1], " +
        "'h': CASE WHEN i < len(sh) THEN sh[i+1] END})) AS u FROM b2), " +
        "pos_t AS (SELECT doc_id, u.pos AS pos, u.tok AS tok, u.h AS h FROM p), " +
        "d AS (SELECT *, CASE WHEN h IS NOT NULL THEN " +
        "CASE WHEN count(*) OVER (PARTITION BY h) > 1 THEN 1 ELSE 0 END END AS dup " +
        "FROM pos_t), " +
        "c AS (SELECT doc_id, pos, tok, max(dup) OVER (PARTITION BY doc_id " +
        "ORDER BY pos RANGE BETWEEN 4 PRECEDING AND CURRENT ROW) AS cov FROM d) " +
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, " +
        "CAST(sum(CASE WHEN coalesce(cov, 0) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept, " +
        "coalesce(string_agg(CASE WHEN coalesce(cov, 0) = 0 THEN tok END, ' ' " +
        "ORDER BY pos), '') AS scrubbed " +
        "FROM c GROUP BY doc_id"
    }

    // Mirrors TextAnalysis.topNgrams (n=3, k=20): same tie-break.
    val embNorm =
      s"WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
        s"n AS (SELECT vec_id, v, sqrt(${OracleSql.dot("v", "v")}) AS nrm, " +
        s"${OracleSql.hyperplaneBucket("v", 64, 4)} AS bucket FROM e)"
    val cosineNearDup =
      s"$embNorm, p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
        s"${OracleSql.dot("a.v", "b.v")} / (a.nrm * b.nrm) AS cosine " +
        "FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id) " +
        "SELECT id_a, id_b, cosine FROM p WHERE cosine >= 0.3"
    val mutualKnn =
      s"$embNorm, p AS (SELECT a.vec_id AS src, b.vec_id AS dst, " +
        s"${OracleSql.dot("a.v", "b.v")} / (a.nrm * b.nrm) AS cos " +
        "FROM n a JOIN n b ON a.bucket = b.bucket " +
        "AND a.vec_id <> b.vec_id), " +
        "r AS (SELECT src, dst, cos, row_number() OVER (" +
        "PARTITION BY src ORDER BY cos DESC, dst) AS rk FROM p), " +
        "ke AS (SELECT src, dst, cos FROM r WHERE rk <= 3) " +
        "SELECT x.src AS id_a, x.dst AS id_b, x.cos AS cosine " +
        "FROM ke x JOIN ke y ON x.src = y.dst AND x.dst = y.src " +
        "AND x.src < x.dst"
    // Anisotropy replay: same unit-quantization, HUGEINT squares
    // mirroring Spark's DECIMAL(38,0) lane, identical cast+divide
    // token sequence for the two emitted doubles.
    val anisotropy =
      "WITH e0 AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
        s"e1 AS (SELECT v, sqrt(${OracleSql.dot("v", "v")}) AS nrm FROM e0), " +
        "q AS (SELECT list_transform(v, x -> CAST(floor((x / nrm) * " +
        "1048576.0) AS BIGINT)) AS uq FROM e1 WHERE nrm > 0.0), " +
        "ra AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(uq, x -> x * x)), (a, b) -> a + b) AS HUGEINT)) " +
        "AS HUGEINT) AS self_sq FROM q), " +
        "ds AS (SELECT CAST(s.d AS BIGINT) AS d, CAST(sum(s.x) AS BIGINT) " +
        "AS sm FROM (SELECT unnest(list_transform(range(1, len(uq) + 1), " +
        "i -> {'d': i, 'x': uq[i]})) AS s FROM q) GROUP BY 1), " +
        "s2 AS (SELECT CAST(sum(CAST(sm AS HUGEINT) * CAST(sm AS HUGEINT)) " +
        "AS HUGEINT) AS sum_s2 FROM ds) " +
        "SELECT n, CAST(sum_s2 - self_sq AS DOUBLE) / " +
        "CAST(CAST(n AS HUGEINT) * CAST(n - 1 AS HUGEINT) * " +
        "CAST(1099511627776 AS HUGEINT) AS DOUBLE) AS avg_cos, " +
        "CAST(sum_s2 AS DOUBLE) / " +
        "CAST(CAST(n AS HUGEINT) * CAST(n AS HUGEINT) * " +
        "CAST(1099511627776 AS HUGEINT) AS DOUBLE) AS r_sq " +
        "FROM ra CROSS JOIN s2"

    // Bitext ratio-margin replay: same bucket/dot constants; the kNN
    // means fold cosines in rank order from 0.0 (Spark's `aggregate`
    // over sort_array), margin token-for-token.
    val bitextMargin = {
      val fold = "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        "list(cos ORDER BY rk)), (a, b) -> a + b) / " +
        "CAST(count(*) AS DOUBLE)"
      "WITH e0 AS (SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v, " +
        "d.lang = 'en' AS is_src FROM embeddings e " +
        "JOIN documents d ON d.doc_id = e.vec_id), " +
        s"n AS (SELECT vec_id, v, is_src, sqrt(${OracleSql.dot("v", "v")}) " +
        s"AS nrm, ${OracleSql.hyperplaneBucket("v", 64, 4)} AS bucket " +
        "FROM e0), " +
        "p AS (SELECT s.vec_id AS src, t.vec_id AS tgt, " +
        s"${OracleSql.dot("s.v", "t.v")} / (s.nrm * t.nrm) AS cos " +
        "FROM n s JOIN n t ON s.bucket = t.bucket " +
        "AND s.is_src AND NOT t.is_src), " +
        "fw AS (SELECT * FROM (SELECT src, tgt, cos, row_number() OVER (" +
        "PARTITION BY src ORDER BY cos DESC, tgt) AS rk FROM p) " +
        "WHERE rk <= 4), " +
        "bw AS (SELECT * FROM (SELECT src, tgt, cos, row_number() OVER (" +
        "PARTITION BY tgt ORDER BY cos DESC, src) AS rk FROM p) " +
        "WHERE rk <= 4), " +
        s"ms AS (SELECT src, $fold AS avg_src FROM fw GROUP BY src), " +
        s"mt AS (SELECT tgt, $fold AS avg_tgt FROM bw GROUP BY tgt), " +
        "sc AS (SELECT fw.src, fw.tgt, fw.cos, " +
        "fw.cos / ((ms.avg_src + mt.avg_tgt) / 2.0) AS margin " +
        "FROM fw JOIN ms ON ms.src = fw.src JOIN mt ON mt.tgt = fw.tgt " +
        "WHERE ms.avg_src + mt.avg_tgt > 0.0) " +
        "SELECT src AS src_id, tgt AS tgt_id, cos AS cosine, margin FROM (" +
        "SELECT *, row_number() OVER (PARTITION BY src " +
        "ORDER BY margin DESC, tgt) AS best FROM sc) " +
        "WHERE best = 1 AND margin > 1.0"
    }
    val bruteTopK =
      ("WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, " +
        "sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), " +
        "CAST(embedding AS DOUBLE[]))) AS nrm FROM embeddings), " +
        "q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 10), " +
        "p AS (SELECT q.query_id, n.vec_id, " +
        "list_inner_product(n.v, q.qv) / (n.nrm * q.qn) AS cos " +
        "FROM n, q WHERE n.vec_id <> q.query_id) " +
        "SELECT query_id, vec_id AS neighbor_id, CAST(rank AS BIGINT) AS rank FROM " +
        "(SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id " +
        "ORDER BY cos DESC, vec_id) AS rank FROM p) WHERE rank <= 10")
    // Semi-hard mining replay: same bucket CTE, exact integer quantized
    // distances (floor(x*2^20) per dim, Σ Δq² as HUGEINT→BIGINT), the
    // FaceNet band (d2_pos, 2·d2_pos], hardest-negative window.
    def d2Sql(a: String, b: String): String =
      s"CAST(list_sum(list_transform(range(1, len($a)+1), " +
        s"i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))) AS BIGINT)"
    val tripletMining =
      s"$embNorm, q AS (SELECT vec_id AS id, bucket AS b, " +
        "list_transform(v, x -> CAST(floor(x * 1048576.0) AS BIGINT)) " +
        "AS qv FROM n), " +
        "ap AS (SELECT a.id AS id_a, p.id AS id_pos, a.b AS ba, " +
        s"a.qv AS va, ${d2Sql("a.qv", "p.qv")} AS d2_pos " +
        "FROM q a JOIN q p ON p.id = a.id + 1), " +
        "neg AS (SELECT ap.id_a, ap.d2_pos, c.id AS id_neg, " +
        s"${d2Sql("ap.va", "c.qv")} AS d2_neg FROM ap JOIN q c " +
        "ON c.b = ap.ba AND c.id <> ap.id_a AND c.id <> ap.id_pos), " +
        "sh AS (SELECT * FROM neg WHERE d2_neg > d2_pos " +
        "AND d2_neg <= 2 * d2_pos), " +
        "rk AS (SELECT id_a, id_neg, d2_neg, " +
        "row_number() OVER (PARTITION BY id_a ORDER BY d2_neg, id_neg) " +
        "AS rn, CAST(count(*) OVER (PARTITION BY id_a) AS BIGINT) AS cnt " +
        "FROM sh) " +
        "SELECT ap.id_a, ap.id_pos, ap.d2_pos, " +
        "CAST(coalesce(rk.cnt, 0) AS BIGINT) AS n_semihard, " +
        "rk.id_neg, rk.d2_neg " +
        "FROM ap LEFT JOIN rk ON rk.id_a = ap.id_a AND rk.rn = 1"
    // k-means‖ replay: same quantized d² kernel, same permute-mod-2²⁰
    // coin, HUGEINT acceptance test mirroring Spark's DECIMAL(38,0)
    // lane; weight pass = (d² asc, cid asc) argmin.
    val kmeansParallel = {
      import graft.functions.TextHash.{permuteA, permuteB}
      val P = 1000000007L
      def coin(r: Int) =
        s"CAST(((id * ${permuteA(r)} + ${permuteB(r)}) % $P) % 1048576 AS HUGEINT)"
      def round(r: Int) =
        s"d$r AS (SELECT e.id, e.qv, min(${d2Sql("e.qv", "c.cqv")}) AS d2 " +
          s"FROM e CROSS JOIN c${r - 1} c GROUP BY e.id, e.qv), " +
          s"s$r AS (SELECT CAST(sum(CAST(d2 AS HUGEINT)) AS HUGEINT) AS s " +
          s"FROM d$r), " +
          s"a$r AS (SELECT id, qv FROM d$r CROSS JOIN s$r " +
          s"WHERE ${coin(r)} * s < CAST(${8L * 1048576L} AS HUGEINT) * " +
          "CAST(d2 AS HUGEINT)), " +
          s"c$r AS (SELECT * FROM c${r - 1} UNION ALL " +
          s"SELECT id, qv, CAST($r AS BIGINT) FROM a$r)"
      "WITH e AS MATERIALIZED (SELECT vec_id AS id, " +
        "list_transform(CAST(embedding AS DOUBLE[]), " +
        "x -> CAST(floor(x * 1048576.0) AS BIGINT)) AS qv " +
        "FROM embeddings), " +
        "c0 AS (SELECT id AS cid, qv AS cqv, CAST(0 AS BIGINT) AS rnd " +
        "FROM e ORDER BY id LIMIT 1), " +
        s"${round(1)}, ${round(2)}, " +
        s"dz AS (SELECT e.id, c.cid, ${d2Sql("e.qv", "c.cqv")} AS d2 " +
        "FROM e CROSS JOIN c2 c), " +
        "bz AS (SELECT id, cid, row_number() OVER (PARTITION BY id " +
        "ORDER BY d2, cid) AS rn FROM dz), " +
        "w AS (SELECT cid, CAST(count(*) AS BIGINT) AS n FROM bz " +
        "WHERE rn = 1 GROUP BY cid) " +
        "SELECT c.cid AS picked_id, c.rnd AS round, " +
        "CAST(coalesce(w.n, 0) AS BIGINT) AS weight " +
        "FROM c2 c LEFT JOIN w ON w.cid = c.cid"
    }
    val lshTopK =
      s"$embNorm, q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, bucket AS qbucket " +
        "FROM n WHERE vec_id < 10), " +
        s"p AS (SELECT q.query_id, n.vec_id, ${OracleSql.dot("n.v", "q.qv")} / (n.nrm * q.qn) AS cos " +
        "FROM n JOIN q ON n.bucket = q.qbucket AND n.vec_id <> q.query_id) " +
        "SELECT query_id, vec_id AS neighbor_id, CAST(rank AS BIGINT) AS rank FROM " +
        "(SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id " +
        "ORDER BY cos DESC, vec_id) AS rank FROM p) WHERE rank <= 10"
    val lshMultiprobe =
      s"$embNorm, q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, bucket AS qbucket " +
        "FROM n WHERE vec_id < 10), " +
        "qp AS (SELECT query_id, qv, qn, " +
        "unnest([qbucket, xor(qbucket, 1), xor(qbucket, 2)]) AS pb FROM q), " +
        s"p AS (SELECT q.query_id, n.vec_id, ${OracleSql.dot("n.v", "q.qv")} / (n.nrm * q.qn) AS cos " +
        "FROM n JOIN qp q ON n.bucket = q.pb AND n.vec_id <> q.query_id) " +
        "SELECT query_id, vec_id AS neighbor_id, CAST(rank AS BIGINT) AS rank FROM " +
        "(SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id " +
        "ORDER BY cos DESC, vec_id) AS rank FROM p) WHERE rank <= 10"

    // Learned-cell IVF oracles: the kmeans CTE chain (2 Lloyd's
    // iterations, fixed-point means) replays Similarity.kmeansCentroids
    // exactly; `samp` = full corpus (samplePercent=100 at test scale).
    val annPq = {
      val mSub = 4; val dsub = 16; val kCodes = 16; val rerank = 32
      val subCtes = (0 until mSub).map { s =>
        val lo = s * dsub + 1
        val hi = (s + 1) * dsub
        val sv = s"v[$lo:$hi]"
        s"p${s}samp AS (SELECT vec_id, $sv AS v, " +
          s"sqrt(${OracleSql.dot(sv, sv)}) AS nrm FROM e), " +
          OracleSql.kmeansCtes("vec_id", kCodes, iters = 1, dim = dsub,
            prefix = s"p$s") + ", " +
          s"enc$s AS (SELECT vec_id, cid AS code FROM (" +
          s"SELECT s.vec_id, c.cid, row_number() OVER (PARTITION BY s.vec_id " +
          s"ORDER BY ${OracleSql.dot("s.v", "c.cv")} / (s.nrm * c.cnrm) DESC, " +
          s"c.cid ASC) AS rn FROM p${s}samp s CROSS JOIN p${s}c1 c) " +
          "WHERE rn = 1)"
      }.mkString(", ")
      val bookJoins = (0 until mSub).map { s =>
        s"JOIN enc$s ON enc$s.vec_id = e.vec_id " +
          s"JOIN p${s}c1 b$s ON b$s.cid = enc$s.code"
      }.mkString(" ")
      "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v " +
        "FROM embeddings), " +
        s"n AS (SELECT vec_id, v, sqrt(${OracleSql.dot("v", "v")}) AS nrm " +
        "FROM e), " +
        subCtes + ", " +
        "rec AS (SELECT e.vec_id, list_concat(list_concat(b0.cv, b1.cv), " +
        s"list_concat(b2.cv, b3.cv)) AS rv FROM e $bookJoins), " +
        "pq AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n " +
        "WHERE vec_id < 10), " +
        s"pr AS (SELECT q.query_id, r.vec_id, ${OracleSql.dot("q.qv", "r.rv")} " +
        "AS sc FROM rec r CROSS JOIN pq q WHERE r.vec_id <> q.query_id), " +
        "cand AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id, " +
        "row_number() OVER (PARTITION BY query_id ORDER BY sc DESC, " +
        s"vec_id ASC) AS rn FROM pr) WHERE rn <= $rerank), " +
        s"x AS (SELECT c.query_id, c.vec_id, ${OracleSql.dot("nn.v", "q.qv")} " +
        "/ (nn.nrm * q.qn) AS cos FROM cand c " +
        "JOIN n nn ON nn.vec_id = c.vec_id " +
        "JOIN pq q ON q.query_id = c.query_id) " +
        "SELECT query_id, vec_id AS neighbor_id, CAST(rank AS BIGINT) AS rank " +
        "FROM (SELECT query_id, vec_id, row_number() OVER (PARTITION BY " +
        "query_id ORDER BY cos DESC, vec_id) AS rank FROM x) WHERE rank <= 10"
    }

    // SemDeDup replay: the same learned cells as the IVF gates, then an
    // in-cell lower-id cosine-neighbor EXISTS decides keep/drop.
    val semanticDedup = {
      val dotVC = OracleSql.dot("n.v", "c.cv")
      val dotXY = OracleSql.dot("x.v", "y.v")
      ivfKmeans +
        s"a AS (SELECT n.vec_id, n.v, n.nrm, c.cid, $dotVC / (n.nrm * c.cnrm) AS cos " +
        "FROM n CROSS JOIN c), " +
        "cell AS (SELECT vec_id, v, nrm, cid AS cell FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY vec_id " +
        "ORDER BY cos DESC, cid ASC) AS rn FROM a) WHERE rn = 1), " +
        s"d AS (SELECT DISTINCT x.vec_id FROM cell x JOIN cell y " +
        s"ON x.cell = y.cell AND x.nrm > 0 AND y.nrm > 0 " +
        s"AND y.vec_id < x.vec_id " +
        s"AND $dotXY / (x.nrm * y.nrm) >= 0.2) " +
        "SELECT c.vec_id, c.cell, (d.vec_id IS NULL) AS keep " +
        "FROM cell c LEFT JOIN d ON c.vec_id = d.vec_id"
    }

    // Bloom replay: the k bit positions are the MinHash permutation
    // family mod mBits — pure integer arithmetic. The oracle keeps the
    // DISTINCT position set per group (bitmap == position set);
    // membership = all of a probe's positions present.
    val bloomPos = { (h: String) =>
      (0 until 3).map(j =>
        s"((($h) * ${TextHash.permuteA(j)} + ${TextHash.permuteB(j)}) % " +
          s"${TextHash.P}) % 65536").mkString("[", ", ", "]")
    }
    val bloomPosCte = {
      val whl = OracleSql.wordHashes("lower(text)")
      s"WITH t AS (SELECT lang, unnest($whl) AS h0 FROM documents), " +
        "pos AS (SELECT DISTINCT lang, p FROM " +
        s"(SELECT lang, unnest(${bloomPos("h0")}) AS p FROM t)), "
    }
    val bloomContainsOracle = {
      val words = bloomProbes.map(w => s"'$w'").mkString(", ")
      bloomPosCte +
        s"pw AS (SELECT unnest([$words]) AS word), " +
        s"ph AS (SELECT word, list_extract(${OracleSql.wordHashes("lower(word)")}, 1) " +
        "AS h0 FROM pw), " +
        s"pp AS (SELECT word, unnest(${bloomPos("h0")}) AS p FROM ph), " +
        "np AS (SELECT word, count(DISTINCT p) AS n_pos FROM pp GROUP BY word), " +
        "langs AS (SELECT DISTINCT lang FROM documents), " +
        "nh AS (SELECT c.lang, c.word, count(*) AS n_hit FROM " +
        "(SELECT DISTINCT l.lang, pp.word, pp.p FROM langs l CROSS JOIN pp) c " +
        "JOIN pos ON pos.lang = c.lang AND pos.p = c.p " +
        "GROUP BY c.lang, c.word) " +
        "SELECT l.lang, w.word, coalesce(nh.n_hit, 0) = w.n_pos " +
        "AS maybe_contains FROM langs l CROSS JOIN np w " +
        "LEFT JOIN nh ON nh.lang = l.lang AND nh.word = w.word"
    }
    val bloomMergeOracle = bloomPosCte +
      "g AS (SELECT lang, CAST(count(DISTINCT p) AS BIGINT) AS n_bits_set " +
      "FROM pos GROUP BY lang) SELECT lang, n_bits_set FROM g"

    // Count-min replay: cell j·width + (permute_j(h) mod width); per-cell
    // exact counts; point query = min over the depth cells (0 when a cell
    // was never touched). Shared by build and merge gates (sum-merge ==
    // direct build is the mergeability claim).
    val cmsOracle = {
      val whl = OracleSql.wordHashes("lower(text)")
      val width = 1024
      val cellsOf = { (h: String) =>
        (0 until 3).map(j =>
          s"${j.toLong * width} + ((($h) * ${TextHash.permuteA(j)} + " +
            s"${TextHash.permuteB(j)}) % ${TextHash.P}) % $width")
          .mkString("[", ", ", "]")
      }
      val words = bloomProbes.map(w => s"'$w'").mkString(", ")
      s"WITH t AS (SELECT lang, unnest($whl) AS h0 FROM documents), " +
        "c AS (SELECT lang, cell, count(*) AS n FROM " +
        s"(SELECT lang, unnest(${cellsOf("h0")}) AS cell FROM t) " +
        "GROUP BY lang, cell), " +
        s"pw AS (SELECT unnest([$words]) AS word), " +
        s"ph AS (SELECT word, list_extract(${OracleSql.wordHashes("lower(word)")}, 1) " +
        "AS h0 FROM pw), " +
        s"pc AS (SELECT word, unnest(${cellsOf("h0")}) AS cell FROM ph), " +
        "langs AS (SELECT DISTINCT lang FROM documents) " +
        "SELECT l.lang, p.word, CAST(min(coalesce(c.n, 0)) AS BIGINT) " +
        "AS est_count FROM langs l CROSS JOIN pc p " +
        "LEFT JOIN c ON c.lang = l.lang AND c.cell = p.cell " +
        "GROUP BY l.lang, p.word"
    }

    // Embedding-curation capstone replay: 16-way JL projection, the
    // kmeans CTE chain over the PROJECTED vectors (dim=16), the
    // semanticDedup cell/EXISTS stages, then per-cell keep counts.
    val ivfPq = {
      val mSub = 4; val dsub = 16; val kCodes = 16; val rerank = 32
      val dotVC = OracleSql.dot("n.v", "c.cv")
      val dotQC = OracleSql.dot("q.qv", "c.cv")
      val subCtes = (0 until mSub).map { s =>
        val lo = s * dsub + 1
        val hi = (s + 1) * dsub
        val sv = s"r[$lo:$hi]"
        s"r${s}samp AS (SELECT vec_id, $sv AS v, " +
          s"sqrt(${OracleSql.dot(sv, sv)}) AS nrm FROM res), " +
          OracleSql.kmeansCtes("vec_id", kCodes, iters = 1, dim = dsub,
            prefix = s"r$s") + ", " +
          s"enc$s AS (SELECT vec_id, cid AS code FROM (" +
          s"SELECT s.vec_id, c.cid, row_number() OVER (PARTITION BY s.vec_id " +
          s"ORDER BY ${OracleSql.dot("s.v", "c.cv")} / (s.nrm * c.cnrm) DESC, " +
          s"c.cid ASC) AS rn FROM r${s}samp s CROSS JOIN r${s}c1 c) " +
          "WHERE rn = 1)"
      }.mkString(", ")
      val bookJoins = (0 until mSub).map { s =>
        s"JOIN enc$s ON enc$s.vec_id = res.vec_id " +
          s"JOIN r${s}c1 b$s ON b$s.cid = enc$s.code"
      }.mkString(" ")
      ivfKmeans +
        s"a AS (SELECT n.vec_id, n.v, n.nrm, c.cid, $dotVC / (n.nrm * c.cnrm) AS cos " +
        "FROM n CROSS JOIN c), " +
        "cell AS (SELECT vec_id, v, nrm, cid AS cell FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY vec_id " +
        "ORDER BY cos DESC, cid ASC) AS rn FROM a) WHERE rn = 1), " +
        "res AS (SELECT cell.vec_id, cell.v, cell.nrm, cell.cell, " +
        "cc.cv AS ccv, list_transform(range(1, 65), i -> " +
        "cell.v[i] - cc.cv[i]) AS r " +
        "FROM cell JOIN c cc ON cc.cid = cell.cell), " +
        subCtes + ", " +
        "rrec AS (SELECT res.vec_id, res.cell, " +
        "list_transform(range(1, 65), i -> res.ccv[i] + " +
        "list_concat(list_concat(b0.cv, b1.cv), " +
        "list_concat(b2.cv, b3.cv))[i]) AS fv " +
        s"FROM res $bookJoins), " +
        "q0 AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn " +
        "FROM cell WHERE vec_id < 10), " +
        s"qc AS (SELECT q.query_id, q.qv, q.qn, c.cid, row_number() OVER " +
        s"(PARTITION BY q.query_id ORDER BY $dotQC / (q.qn * c.cnrm) DESC, " +
        "c.cid ASC) AS rn FROM q0 q CROSS JOIN c), " +
        "qp AS (SELECT query_id, qv, qn, cid AS qcell FROM qc WHERE rn <= 2), " +
        s"pr AS (SELECT q.query_id, s.vec_id, ${OracleSql.dot("q.qv", "s.fv")} " +
        "AS sc FROM rrec s JOIN qp q ON s.cell = q.qcell " +
        "AND s.vec_id <> q.query_id), " +
        "cand AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id, " +
        "row_number() OVER (PARTITION BY query_id ORDER BY sc DESC, " +
        s"vec_id ASC) AS rn FROM pr) WHERE rn <= $rerank), " +
        s"x AS (SELECT c.query_id, c.vec_id, ${OracleSql.dot("nn.v", "q.qv")} " +
        "/ (nn.nrm * q.qn) AS cos FROM cand c " +
        "JOIN n nn ON nn.vec_id = c.vec_id " +
        "JOIN q0 q ON q.query_id = c.query_id) " +
        "SELECT query_id, vec_id AS neighbor_id, CAST(rank AS BIGINT) AS rank " +
        "FROM (SELECT query_id, vec_id, row_number() OVER (PARTITION BY " +
        "query_id ORDER BY cos DESC, vec_id) AS rank FROM x) WHERE rank <= 10"
    }
    val ivfNprobe = {
      val dotVC = OracleSql.dot("n.v", "c.cv")
      val dotQC = OracleSql.dot("q.qv", "c.cv")
      val dotSQ = OracleSql.dot("s.v", "q.qv")
      ivfKmeans +
        s"a AS (SELECT n.vec_id, n.v, n.nrm, c.cid, $dotVC / (n.nrm * c.cnrm) AS cos " +
        "FROM n CROSS JOIN c), " +
        "cell AS (SELECT vec_id, v, nrm, cid AS cell FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY vec_id " +
        "ORDER BY cos DESC, cid ASC) AS rn FROM a) WHERE rn = 1), " +
        "q0 AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn " +
        "FROM cell WHERE vec_id < 10), " +
        s"qc AS (SELECT q.query_id, q.qv, q.qn, c.cid, row_number() OVER " +
        s"(PARTITION BY q.query_id ORDER BY $dotQC / (q.qn * c.cnrm) DESC, c.cid ASC) AS rn " +
        "FROM q0 q CROSS JOIN c), " +
        "qp AS (SELECT query_id, qv, qn, cid AS qcell FROM qc WHERE rn <= 2), " +
        s"p AS (SELECT q.query_id, s.vec_id, $dotSQ / (s.nrm * q.qn) AS cos " +
        "FROM cell s JOIN qp q ON s.cell = q.qcell AND s.vec_id <> q.query_id) " +
        "SELECT query_id, vec_id AS neighbor_id, CAST(rank AS BIGINT) AS rank FROM " +
        "(SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id " +
        "ORDER BY cos DESC, vec_id) AS rank FROM p) WHERE rank <= 10"
    }
    val ivfTopK = {
      val dotVC = OracleSql.dot("n.v", "c.cv")
      val dotSQ = OracleSql.dot("s.v", "q.qv")
      ivfKmeans +
        s"a AS (SELECT n.vec_id, n.v, n.nrm, c.cid, $dotVC / (n.nrm * c.cnrm) AS cos " +
        "FROM n CROSS JOIN c), " +
        "cell AS (SELECT vec_id, v, nrm, cid AS cell FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY vec_id " +
        "ORDER BY cos DESC, cid ASC) AS rn FROM a) WHERE rn = 1), " +
        "q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, cell AS qcell " +
        "FROM cell WHERE vec_id < 10), " +
        s"p AS (SELECT q.query_id, s.vec_id, $dotSQ / (s.nrm * q.qn) AS cos " +
        "FROM cell s JOIN q ON s.cell = q.qcell AND s.vec_id <> q.query_id) " +
        "SELECT query_id, vec_id AS neighbor_id, CAST(rank AS BIGINT) AS rank FROM " +
        "(SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id " +
        "ORDER BY cos DESC, vec_id) AS rank FROM p) WHERE rank <= 10"
    }

    // Components oracle: transitive min-reachability via a recursive CTE
    // over the SAME candidate pairs the Spark side clusters. The fixpoint
    // (min reachable id per vertex) is iteration-order independent, so
    // propagation (Spark) and closure (DuckDB) agree exactly.
    val keepBestSql =
      s"WITH clus AS ($clustersSql), " +
        "allc AS (SELECT d.doc_id, d.n_chars, " +
        "coalesce(c.canon_id, d.doc_id) AS canon_id " +
        "FROM documents d LEFT JOIN clus c USING (doc_id)), " +
        "rep AS (SELECT canon_id, doc_id AS rep_id FROM allc " +
        "QUALIFY row_number() OVER (PARTITION BY canon_id " +
        "ORDER BY n_chars DESC, doc_id) = 1) " +
        "SELECT a.doc_id, a.canon_id, rep.rep_id, " +
        "a.doc_id = rep.rep_id AS keep " +
        "FROM allc a JOIN rep USING (canon_id)"
    val winnowPairsSql =
      s"WITH base AS (SELECT doc_id, $wh AS wh FROM documents), " +
        s"sh_t AS (SELECT doc_id, ${OracleSql.shingles("wh", 3)} AS sh FROM base), " +
        "f AS (SELECT doc_id, CASE WHEN len(sh) = 0 THEN CAST([] AS BIGINT[]) " +
        "WHEN len(sh) < 8 THEN [list_min(sh)] " +
        "ELSE list_distinct(list_transform(range(0, len(sh) - 7), " +
        "i -> list_min(sh[i+1:i+8]))) END AS fp FROM sh_t), " +
        "x AS (SELECT doc_id, unnest(fp) AS f FROM f), " +
        "keep AS (SELECT f FROM x GROUP BY f HAVING count(*) <= 10), " +
        "xk AS (SELECT x.doc_id, x.f FROM x JOIN keep USING (f)) " +
        "SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b " +
        "FROM xk a JOIN xk b ON a.f = b.f AND a.doc_id < b.doc_id"
    Map(
      "sketch_hll_error" -> {
        val m = 64
        val rmax = graft.ops.Sketches.hllW(m) + 1
        val num = graft.ops.Sketches.hllAlpha(m) *
          m.toDouble * m.toDouble * math.pow(2.0, rmax)
        s"WITH tp AS (SELECT event_type, (user_id * " +
          s"${TextHash.permuteA(0)} + ${TextHash.permuteB(0)}) % " +
          s"${TextHash.P} AS h FROM events WHERE user_id IS NOT NULL), " +
          s"br AS (SELECT event_type, h % $m AS b, " +
          s"CASE WHEN h // $m = 0 THEN $rmax " +
          s"ELSE $rmax - length(bin(h // $m)) END AS r FROM tp), " +
          "mr AS (SELECT event_type, b, max(r) AS r FROM br " +
          "GROUP BY event_type, b), " +
          "e AS (SELECT event_type, " +
          s"$num / (sum((CAST(1 AS BIGINT) << $rmax) >> r) + " +
          s"($m - count(*)) * (CAST(1 AS BIGINT) << $rmax)) " +
          "AS est_distinct FROM mr GROUP BY event_type), " +
          "x AS (SELECT event_type, CAST(count(DISTINCT user_id) " +
          "AS BIGINT) AS exact_distinct FROM events " +
          "WHERE user_id IS NOT NULL GROUP BY event_type) " +
          "SELECT x.event_type, x.exact_distinct, e.est_distinct, " +
          "(e.est_distinct - CAST(x.exact_distinct AS DOUBLE)) / " +
          "CAST(x.exact_distinct AS DOUBLE) AS rel_err " +
          "FROM x JOIN e USING (event_type)"
      },
      "sketch_hll_intersect" -> {
        val m = 64
        val rmax = graft.ops.Sketches.hllW(m) + 1
        val num = graft.ops.Sketches.hllAlpha(m) *
          m.toDouble * m.toDouble * math.pow(2.0, rmax)
        val est = (alias: String, src: String) =>
          s"SELECT $num / (sum((CAST(1 AS BIGINT) << $rmax) >> r) + " +
            s"($m - count(*)) * (CAST(1 AS BIGINT) << $rmax)) " +
            s"AS $alias FROM $src"
        s"WITH tp AS (SELECT event_type, (user_id * " +
          s"${TextHash.permuteA(0)} + ${TextHash.permuteB(0)}) % " +
          s"${TextHash.P} AS h FROM events WHERE event_type IN " +
          "('click', 'purchase') AND user_id IS NOT NULL), " +
          s"br AS (SELECT event_type, h % $m AS b, " +
          s"CASE WHEN h // $m = 0 THEN $rmax " +
          s"ELSE $rmax - length(bin(h // $m)) END AS r FROM tp), " +
          "mr AS (SELECT event_type, b, max(r) AS r FROM br " +
          "GROUP BY event_type, b), " +
          "mu AS (SELECT b, max(r) AS r FROM mr GROUP BY b), " +
          s"ea AS (${est("est_a", "mr WHERE event_type = 'click'")}), " +
          s"eb AS (${est("est_b", "mr WHERE event_type = 'purchase'")}), " +
          s"eu AS (${est("est_union", "mu")}) " +
          "SELECT est_a, est_b, est_union, " +
          "est_a + est_b - est_union AS est_intersect FROM ea, eb, eu"
      },
      "dedup_exact" ->
        ("SELECT min(doc_id) AS keep_id, count(*) AS n_copies " +
          "FROM documents GROUP BY text"),
      "emb_silhouette" -> {
        // Mirrors Similarity.labelSilhouette: fixed-point centroids,
        // strict-fold cosines, per-row 1e-8 quantization, exact rollup.
        val cosXc = OracleSql.dot("e.v", "c.cv") +
          s" / (sqrt(${OracleSql.dot("e.v", "e.v")}) * " +
          s"sqrt(${OracleSql.dot("c.cv", "c.cv")}))"
        "WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) " +
          "AS v FROM embeddings), " +
          "x AS (SELECT label, unnest(list_transform(range(0, len(v)), " +
          "j -> {'j': j, 'x': v[j+1]})) AS u FROM e), " +
          "a AS (SELECT label, u.j AS j, " +
          "sum(CAST(floor(u.x * 1048576.0) AS BIGINT)) AS sq, " +
          "count(*) AS cnt FROM x GROUP BY label, u.j), " +
          "c AS (SELECT label AS cl, list(CAST(sq AS DOUBLE) / " +
          "(CAST(cnt AS DOUBLE) * 1048576.0) ORDER BY j) AS cv " +
          "FROM a GROUP BY label), " +
          s"p AS (SELECT e.vec_id, e.label, c.cl, $cosXc AS cs " +
          "FROM e CROSS JOIN c), " +
          "g AS (SELECT vec_id, label, " +
          "max(CASE WHEN cl = label THEN cs END) AS co, " +
          "max(CASE WHEN cl <> label THEN cs END) AS cx " +
          "FROM p GROUP BY 1, 2), " +
          "sl AS (SELECT label, CASE WHEN greatest(1.0 - co, 1.0 - cx) " +
          "= 0.0 THEN 0.0 ELSE ((1.0 - cx) - (1.0 - co)) / " +
          "greatest(1.0 - co, 1.0 - cx) END AS sil FROM g " +
          "WHERE co IS NOT NULL AND cx IS NOT NULL) " +
          "SELECT CAST(label AS BIGINT) AS label, " +
          "CAST(count(*) AS BIGINT) AS n_vecs, " +
          "CAST(sum(CAST(floor(sil * 100000000.0) AS BIGINT)) AS BIGINT) " +
          "AS sum_sil_q, " +
          "CAST(sum(CAST(floor(sil * 100000000.0) AS BIGINT)) AS DOUBLE) " +
          "/ (CAST(count(*) AS DOUBLE) * 100000000.0) " +
          "AS mean_silhouette FROM sl GROUP BY 1"
      },
      "sample_neyman" ->
        // Mirrors Sampling.neymanSample: exact HUGEINT radicand, one
        // sqrt per stratum, strata-sorted strict fold for W, largest-
        // remainder rounding, the shared permute-hash rank take.
        ("WITH m AS (SELECT source, CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(CAST(n_chars AS HUGEINT)) AS HUGEINT) AS s, " +
          "sum(CAST(n_chars AS HUGEINT) * CAST(n_chars AS HUGEINT)) " +
          "AS sxx FROM documents GROUP BY 1), " +
          "wh AS (SELECT source, n, sqrt(CAST(greatest(" +
          "CAST(n AS HUGEINT) * sxx - s * s, 0) AS DOUBLE)) AS wgt " +
          "FROM m), " +
          "tw AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
          "list(wgt ORDER BY source)), (acc, x) -> acc + x) AS wtot " +
          "FROM wh), " +
          "al AS (SELECT source, n, CASE WHEN wtot = 0.0 THEN 0.0 " +
          "ELSE (200.0 * wgt) / wtot END AS q FROM wh, tw), " +
          "b AS (SELECT *, CAST(floor(q) AS BIGINT) AS base, " +
          "q - floor(q) AS rem FROM al), " +
          "l AS (SELECT *, 200 - sum(base) OVER () AS leftover, " +
          "row_number() OVER (ORDER BY rem DESC, source ASC) AS rk " +
          "FROM b), " +
          "a2 AS (SELECT source, n AS n_stratum, " +
          "CAST(least(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END, " +
          "n) AS BIGINT) AS alloc FROM l), " +
          "r AS (SELECT source, doc_id, row_number() OVER (" +
          "PARTITION BY source ORDER BY " +
          s"(doc_id * ${TextHash.permuteA(0)} + ${TextHash.permuteB(0)}) " +
          s"% ${TextHash.P}, doc_id) AS rn FROM documents) " +
          "SELECT r.source, r.doc_id, a2.n_stratum, a2.alloc " +
          "FROM r JOIN a2 USING (source) WHERE rn <= alloc"),
      "emb_mmd_shift" ->
        ("WITH e AS (SELECT vec_id % 2 AS g, " +
          "unnest(list_transform(range(1, len(embedding) + 1), " +
          "i -> {'d': i, 'v': embedding[i]})) AS s FROM embeddings), " +
          "f AS (SELECT g, CAST(s.d - 1 AS BIGINT) AS dim, " +
          "CAST(floor(CAST(s.v AS DOUBLE) * 64.0) AS BIGINT) AS q FROM e), " +
          "agg AS (SELECT dim, g, CAST(sum(q) AS BIGINT) AS sm, " +
          "CAST(count(*) AS BIGINT) AS n FROM f GROUP BY 1, 2) " +
          "SELECT a.dim, a.sm AS sa, b.sm AS sb, a.n AS na, b.n AS nb, " +
          "CAST(a.sm * b.n - b.sm * a.n AS BIGINT) AS diff, " +
          "CAST((a.sm * b.n - b.sm * a.n) * (a.sm * b.n - b.sm * a.n) " +
          "AS BIGINT) AS diff_sq FROM agg a JOIN agg b " +
          "ON a.dim = b.dim AND a.g = 0 AND b.g = 1"),
      "dedup_bbit_minhash" -> {
        val wh = OracleSql.wordHashes("text")
        val sigCols = (0 until 8).map(j =>
          s"${OracleSql.minhash("sh", j)} AS mh$j").mkString(", ")
        val matches = (0 until 8).map(j =>
          s"CASE WHEN a.mh$j % 2 = b.mh$j % 2 THEN 1 ELSE 0 END")
          .mkString(" + ")
        s"WITH base AS (SELECT doc_id, $wh AS wh FROM documents), " +
          s"sh_t AS (SELECT doc_id, ${OracleSql.shingles("wh", 3)} AS sh " +
          "FROM base), " +
          s"sig AS (SELECT doc_id, $sigCols FROM sh_t) " +
          "SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
          s"CAST($matches AS BIGINT) AS n_match_bits " +
          "FROM sig a JOIN sig b ON b.doc_id = a.doc_id + 1"
      },
      "sample_priority" ->
        (s"WITH b AS (SELECT o_orderkey AS id, " +
          "CAST(floor(o_totalprice) AS BIGINT) + 1 AS weight, " +
          s"(o_orderkey * 1103515245 + 45567) % ${graft.functions.TextHash.P} " +
          "+ 1 AS h FROM orders) " +
          "SELECT id, weight, h, " +
          s"CAST(weight * ${graft.functions.TextHash.P} AS DOUBLE) / h " +
          "AS priority FROM b " +
          "ORDER BY priority DESC, id LIMIT 40"),
      "sample_pps" -> {
        val picks = "(cum * 50) // total - ((cum - w) * 50) // total"
        "WITH b AS (SELECT doc_id AS id, CAST(n_chars AS BIGINT) AS w " +
          "FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0), " +
          "c AS (SELECT id, w, sum(w) OVER (ORDER BY id " +
          "ROWS UNBOUNDED PRECEDING) AS cum FROM b), " +
          "t2 AS (SELECT CAST(sum(w) AS BIGINT) AS total FROM b) " +
          "SELECT id, w AS weight, CAST(cum AS BIGINT) AS cum, " +
          s"CAST($picks AS BIGINT) AS n_picks " +
          s"FROM c CROSS JOIN t2 WHERE $picks > 0"
      },
      "dedup_soundex_blocked" -> soundexSql,
      // The oracle folds the SAME shared step table (Nysiis.keySql)
      // over the leading token — equality proves nothing drifted
      // between the Spark chain and the RE2 chain.
      "dedup_nysiis_blocked" ->
        ("WITH d AS (SELECT doc_id, " +
          "regexp_extract(lower(text), '([a-z]+)', 1) AS tok " +
          "FROM documents), " +
          s"k AS (SELECT doc_id, tok, ${graft.functions.Nysiis.keySql("tok")} " +
          "AS code FROM d) " +
          "SELECT code, CAST(count(*) AS BIGINT) AS n_docs, " +
          "CAST(count(DISTINCT tok) AS BIGINT) AS n_tokens, " +
          "min(tok) AS min_tok, max(tok) AS max_tok FROM k " +
          "WHERE code <> '' GROUP BY code HAVING count(*) > 1"),
      "dedup_jaro_blocked" ->
        ("WITH d AS (SELECT doc_id, lower(substr(text, 1, 16)) AS title, " +
          "lang FROM documents), " +
          "r AS (SELECT doc_id, title, lang, row_number() OVER (" +
          "PARTITION BY lang ORDER BY title, doc_id) AS rnk FROM d), " +
          "prs AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, " +
          "x.title AS ta, y.title AS tb FROM r x JOIN r y " +
          "ON x.lang = y.lang AND y.rnk BETWEEN x.rnk + 1 AND x.rnk + 3), " +
          OracleSql.jaroWinklerCtes("prs", "ta", "tb") +
          " SELECT doc_a, doc_b, jw FROM jwout WHERE jw >= 0.8"),
      "dedup_fellegi_sunter" -> {
        // Same (m,u) priors as the engine; the six weights become
        // round-trip double literals so neither engine runs a log.
        val mU = Seq((0.9, 0.25), (0.85, 0.1), (0.95, 0.02))
        val w = mU.map { case (m, u) =>
          (math.log(m / u) / math.log(2.0),
            math.log((1.0 - m) / (1.0 - u)) / math.log(2.0))
        }
        val conds = Seq("srca = srcb", "abs(lena - lenb) <= 16",
          "jw >= 0.9")
        val score = conds.zip(w).foldLeft("0.0") {
          case (acc, (c, (aw, dw))) =>
            s"$acc + CASE WHEN $c THEN CAST($aw AS DOUBLE) " +
              s"ELSE CAST($dw AS DOUBLE) END"
        }
        "WITH d AS (SELECT doc_id, lower(substr(text, 1, 16)) AS title, " +
          "lang, source, n_chars FROM documents), " +
          "r AS (SELECT doc_id, title, lang, source, n_chars, " +
          "row_number() OVER (PARTITION BY lang ORDER BY title, doc_id) " +
          "AS rnk FROM d), " +
          "prs AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, " +
          "x.title AS ta, y.title AS tb, x.source AS srca, " +
          "y.source AS srcb, x.n_chars AS lena, y.n_chars AS lenb " +
          "FROM r x JOIN r y ON x.lang = y.lang " +
          "AND y.rnk BETWEEN x.rnk + 1 AND x.rnk + 3), " +
          OracleSql.jaroWinklerCtes("prs", "ta", "tb") + ", " +
          "sc AS (SELECT doc_a, doc_b, " +
          "CAST(CASE WHEN srca = srcb THEN 1 ELSE 0 END AS BIGINT) " +
          "AS agree_source, " +
          "CAST(CASE WHEN abs(lena - lenb) <= 16 THEN 1 ELSE 0 END " +
          "AS BIGINT) AS agree_len, " +
          "CAST(CASE WHEN jw >= 0.9 THEN 1 ELSE 0 END AS BIGINT) " +
          s"AS agree_title, $score AS score FROM jwout) " +
          "SELECT doc_a, doc_b, agree_source, agree_len, agree_title, " +
          "score, CASE WHEN score >= 4.0 THEN 'match' ELSE 'possible' " +
          "END AS decision FROM sc WHERE score >= 0.0"
      },
      "dedup_url_canonical" ->
        ("WITH u0 AS (SELECT doc_id, n_chars, 'https://' || " +
          "CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END || source || " +
          "'.example.com/docs/' || CAST(doc_id % 50 AS VARCHAR) || " +
          "CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&id=' || " +
          "CAST(doc_id AS VARCHAR) ELSE '' END AS url FROM documents), " +
          "p AS (SELECT doc_id, n_chars, lower(trim(url)) AS lu FROM u0), " +
          "h AS (SELECT doc_id, n_chars, " +
          "regexp_replace(regexp_extract(lu, " +
          "'^[a-z][a-z0-9+.-]*://([^/?#]+)', 1), ':[0-9]+$', '') AS host, " +
          "regexp_extract(lu, '^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)', 1) " +
          "AS path FROM p), " +
          "r AS (SELECT *, " +
          "regexp_extract(host, '([a-z0-9-]+\\.[a-z0-9-]+)$', 1) AS r2, " +
          "regexp_extract(host, " +
          "'([a-z0-9-]+\\.[a-z0-9-]+\\.[a-z0-9-]+)$', 1) AS r3 FROM h), " +
          "f AS (SELECT *, regexp_extract(r2, '^([a-z0-9-]+)\\.', 1) " +
          "AS sld FROM r), " +
          "k AS (SELECT doc_id, n_chars, " +
          "(CASE WHEN sld IN ('co','com','net','org','gov','ac','edu') " +
          "AND r3 <> '' THEN r3 ELSE r2 END) || " +
          "regexp_replace(path, '/$', '') AS curl FROM f) " +
          "SELECT curl, doc_id AS keep_doc_id, n_chars FROM (" +
          "SELECT *, row_number() OVER (PARTITION BY curl " +
          "ORDER BY n_chars DESC, doc_id ASC) AS rn FROM k) WHERE rn = 1"),
      "dedup_survivorship" ->
        // The dedup_url_canonical cluster key carrying lang; golden by
        // (n_chars DESC, doc_id ASC) rank, provenance min, sorted-
        // distinct tag union.
        ("WITH u0 AS (SELECT doc_id, n_chars, lang, 'https://' || " +
          "CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END || source || " +
          "'.example.com/docs/' || CAST(doc_id % 50 AS VARCHAR) || " +
          "CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&id=' || " +
          "CAST(doc_id AS VARCHAR) ELSE '' END AS url FROM documents), " +
          "p AS (SELECT doc_id, n_chars, lang, lower(trim(url)) AS lu " +
          "FROM u0), " +
          "h AS (SELECT doc_id, n_chars, lang, " +
          "regexp_replace(regexp_extract(lu, " +
          "'^[a-z][a-z0-9+.-]*://([^/?#]+)', 1), ':[0-9]+$', '') AS host, " +
          "regexp_extract(lu, '^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)', 1) " +
          "AS path FROM p), " +
          "r AS (SELECT *, " +
          "regexp_extract(host, '([a-z0-9-]+\\.[a-z0-9-]+)$', 1) AS r2, " +
          "regexp_extract(host, " +
          "'([a-z0-9-]+\\.[a-z0-9-]+\\.[a-z0-9-]+)$', 1) AS r3 FROM h), " +
          "f AS (SELECT *, regexp_extract(r2, '^([a-z0-9-]+)\\.', 1) " +
          "AS sld FROM r), " +
          "k AS (SELECT doc_id, n_chars, lang, " +
          "(CASE WHEN sld IN ('co','com','net','org','gov','ac','edu') " +
          "AND r3 <> '' THEN r3 ELSE r2 END) || " +
          "regexp_replace(path, '/$', '') AS curl FROM f), " +
          "g AS (SELECT curl, doc_id, n_chars, row_number() OVER (" +
          "PARTITION BY curl ORDER BY n_chars DESC, doc_id ASC) AS rn " +
          "FROM k), " +
          "a AS (SELECT curl, min(doc_id) AS first_id, " +
          "CAST(count(*) AS BIGINT) AS n_members, " +
          "CAST(sum(n_chars) AS BIGINT) AS total_len, " +
          "string_agg(DISTINCT lang, ',' ORDER BY lang) AS tags " +
          "FROM k GROUP BY 1) " +
          "SELECT a.curl, g.doc_id AS golden_id, g.n_chars AS golden_len, " +
          "a.first_id, a.n_members, a.total_len, a.tags " +
          "FROM a JOIN g ON a.curl = g.curl AND g.rn = 1"),
      "sample_domain_cap" -> domainCapSql,
      "sample_stratified" -> stratifiedSql,
      "sample_mixture" -> mixtureSql,
      "sample_curriculum" -> curriculumSql,
      "sample_importance" -> importanceSql,
      "sample_temperature" -> {
        val a0 = TextHash.permuteA(0); val b0 = TextHash.permuteB(0)
        val p = TextHash.P
        val alpha = 0.6; val frac = 0.6
        s"WITH c AS (SELECT source, count(*) AS nd FROM documents " +
          "GROUP BY 1), " +
          "z AS (SELECT CAST(sum(nd) AS BIGINT) AS n, " +
          "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
          "list_transform(list_sort(list(struct_pack(d := source, " +
          s"k := nd))), x -> pow(CAST(x.k AS DOUBLE), $alpha))), " +
          "(a, b) -> a + b) AS za FROM c), " +
          s"r AS (SELECT source, round(least(1.0, $frac * " +
          s"CAST(n AS DOUBLE) * pow(CAST(nd AS DOUBLE), ${alpha - 1.0}) " +
          "/ za), 8) AS keep_rate FROM c, z) " +
          "SELECT doc_id, source, keep_rate " +
          "FROM documents JOIN r USING (source) " +
          s"WHERE ((doc_id * $a0 + $b0) % $p + 1) / ($p + 1.0) < keep_rate"
      },
      "sample_weighted" -> {
        val a0 = TextHash.permuteA(0); val b0 = TextHash.permuteB(0)
        val p = TextHash.P
        s"WITH w AS (SELECT lang, doc_id, n_chars, " +
          s"round(-ln(((doc_id * $a0 + $b0) % $p + 1) / ($p + 1.0)) / " +
          "CAST(n_chars AS DOUBLE), 8) AS skey " +
          "FROM documents WHERE n_chars > 0), " +
          "r AS (SELECT lang, doc_id, n_chars, " +
          "CAST(row_number() OVER (PARTITION BY lang " +
          "ORDER BY skey ASC, doc_id ASC) AS INT) AS wrank FROM w) " +
          "SELECT lang, doc_id, n_chars, wrank FROM r WHERE wrank <= 12"
      },
      "sample_downsample_neg" -> {
        val a0 = TextHash.permuteA(0); val b0 = TextHash.permuteB(0)
        val p = TextHash.P
        s"SELECT event_id, CAST(CASE WHEN event_type = 'purchase' THEN 1 " +
          "ELSE 0 END AS BIGINT) AS y, " +
          "CASE WHEN event_type = 'purchase' THEN 1.0 " +
          "ELSE 100.0 / 10.0 END AS weight FROM events " +
          "WHERE event_type = 'purchase' OR " +
          s"((((event_id * $a0 + $b0) % $p) % 100) + 100) % 100 < 10"
      },
      "ann_bq_topk" -> {
        val dotX = OracleSql.dot("n.v", "q.qv2")
        val pack = { (fromBit: Int, toBit: Int, shift: Int) =>
          s"CAST(list_sum(list_transform(range($fromBit, $toBit), j -> " +
            s"CASE WHEN v[j + 1] > 0 THEN (CAST(1 AS BIGINT) << (j - $shift)) " +
            "ELSE 0 END)) AS BIGINT)"
        }
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v " +
          "FROM embeddings), " +
          s"pk AS (SELECT vec_id, ${pack(0, 32, 0)} AS lo, " +
          s"${pack(32, 64, 32)} AS hi FROM e), " +
          "q AS (SELECT vec_id AS query_id, lo AS qlo, hi AS qhi " +
          "FROM pk WHERE vec_id < 10), " +
          "cp AS (SELECT q.query_id, n.vec_id, " +
          "-CAST(bit_count(xor(n.lo, q.qlo)) + " +
          "bit_count(xor(n.hi, q.qhi)) AS DOUBLE) AS coarse " +
          "FROM pk n JOIN q ON n.vec_id <> q.query_id), " +
          "cand AS (SELECT query_id, vec_id FROM (SELECT query_id, " +
          "vec_id, row_number() OVER (PARTITION BY query_id " +
          "ORDER BY coarse DESC, vec_id) AS rn FROM cp) WHERE rn <= 50), " +
          s"nx AS (SELECT vec_id, v, sqrt(${OracleSql.dot("v", "v")}) " +
          "AS nrm FROM e), " +
          "qx AS (SELECT vec_id AS query_id, v AS qv2, nrm AS qn2 " +
          "FROM nx WHERE vec_id < 10), " +
          s"ex AS (SELECT c.query_id, c.vec_id, $dotX / (n.nrm * q.qn2) " +
          "AS cos FROM cand c JOIN nx n ON n.vec_id = c.vec_id " +
          "JOIN qx q ON q.query_id = c.query_id) " +
          "SELECT query_id, vec_id AS neighbor_id, CAST(rank AS BIGINT) " +
          "AS rank FROM (SELECT query_id, vec_id, row_number() OVER " +
          "(PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank " +
          "FROM ex) WHERE rank <= 10"
      },
      "ann_sq8_topk" -> {
        val dotQ = OracleSql.dot("n.qv", "q.qqv")
        val dotX = OracleSql.dot("n.v", "q.qv2")
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v " +
          "FROM embeddings), " +
          "sc AS (SELECT max(list_max(list_transform(v, x -> abs(x)))) AS s " +
          "FROM e), " +
          "qt AS (SELECT vec_id, list_transform(v, x -> " +
          "greatest(-127.0, least(127.0, floor(x * 127.0 / sc.s + 0.5)))) " +
          "AS qv FROM e, sc), " +
          s"qn AS (SELECT vec_id, qv, sqrt(${OracleSql.dot("qv", "qv")}) " +
          "AS qn FROM qt), " +
          "q AS (SELECT vec_id AS query_id, qv AS qqv, qn AS qqn FROM qn " +
          "WHERE vec_id < 10), " +
          s"cp AS (SELECT q.query_id, n.vec_id, $dotQ / (n.qn * q.qqn) " +
          "AS coarse FROM qn n JOIN q ON n.vec_id <> q.query_id), " +
          "cand AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id, " +
          "row_number() OVER (PARTITION BY query_id " +
          "ORDER BY coarse DESC, vec_id) AS rn FROM cp) WHERE rn <= 50), " +
          s"nx AS (SELECT vec_id, v, sqrt(${OracleSql.dot("v", "v")}) " +
          "AS nrm FROM e), " +
          "qx AS (SELECT vec_id AS query_id, v AS qv2, nrm AS qn2 FROM nx " +
          "WHERE vec_id < 10), " +
          s"ex AS (SELECT c.query_id, c.vec_id, $dotX / (n.nrm * q.qn2) " +
          "AS cos FROM cand c JOIN nx n ON n.vec_id = c.vec_id " +
          "JOIN qx q ON q.query_id = c.query_id) " +
          "SELECT query_id, vec_id AS neighbor_id, CAST(rank AS BIGINT) " +
          "AS rank FROM (SELECT query_id, vec_id, row_number() OVER " +
          "(PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank " +
          "FROM ex) WHERE rank <= 10"
      },
      "dedup_minhash_by_lang" -> minhashByLang,
      "dedup_minhash_lsh" -> minhashLsh,
      "dedup_blocking_stats" -> blockingStatsSql,
      "dedup_minhash_est_error" -> {
        val sigCols = (0 until 8).map(j =>
          s"${OracleSql.minhash("sh", j)} AS mh$j").mkString(", ")
        val nMatch = (0 until 8).map(j =>
          s"CASE WHEN a.mh$j = b.mh$j THEN 1 ELSE 0 END").mkString(" + ")
        s"WITH base AS (SELECT doc_id, $wh AS wh FROM documents), " +
          s"sh_t AS (SELECT doc_id, ${OracleSql.shingles("wh", 3)} AS sh " +
          "FROM base), " +
          s"sig AS (SELECT doc_id, $sigCols FROM sh_t), " +
          s"banded AS (${OracleSql.lshBanded("doc_id", 8, 2)}), " +
          "pr AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b " +
          "FROM banded a JOIN banded b ON a.band = b.band " +
          "AND a.key = b.key AND a.doc_id < b.doc_id), " +
          "ds AS (SELECT doc_id, list_distinct(sh) AS s FROM sh_t), " +
          s"m AS (SELECT pr.id_a, pr.id_b, CAST($nMatch AS BIGINT) " +
          "AS n_match FROM pr JOIN sig a ON a.doc_id = pr.id_a " +
          "JOIN sig b ON b.doc_id = pr.id_b), " +
          "j AS (SELECT m.id_a, m.id_b, m.n_match, " +
          "CAST(len(list_intersect(x.s, y.s)) AS DOUBLE) / " +
          "CAST(len(list_distinct(list_concat(x.s, y.s))) AS DOUBLE) " +
          "AS jaccard FROM m JOIN ds x ON x.doc_id = m.id_a " +
          "JOIN ds y ON y.doc_id = m.id_b) " +
          "SELECT id_a, id_b, n_match, " +
          "CAST(n_match AS DOUBLE) / 8.0 AS est_jaccard, jaccard, " +
          "abs(CAST(n_match AS DOUBLE) / 8.0 - jaccard) AS abs_err " +
          "FROM j"
      },
      "dedup_clusters" -> clustersSql,
      // incremental == full recompute (min-id labels are merge-order
      // independent), so the oracle IS the from-scratch cluster SQL
      "dedup_clusters_incremental" -> clustersSql,
      "sample_soft_dedup_weights" ->
        (s"WITH cl AS ($clustersSql), " +
          "cn AS (SELECT d.doc_id, " +
          "coalesce(cl.canon_id, d.doc_id) AS canon_id " +
          "FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id), " +
          "sz AS (SELECT canon_id, CAST(count(*) AS BIGINT) AS " +
          "cluster_size FROM cn GROUP BY 1) " +
          "SELECT doc_id, canon_id, cluster_size, " +
          "1.0 / CAST(cluster_size AS DOUBLE) AS weight " +
          "FROM cn JOIN sz USING (canon_id)"),
      "sample_split_by_cluster" -> {
        val a0 = TextHash.permuteA(0); val b0 = TextHash.permuteB(0)
        val p = TextHash.P
        val bkt = s"((((canon_id * $a0 + $b0) % $p) % 100) + 100) % 100"
        s"WITH cl AS ($clustersSql), " +
          "cn AS (SELECT d.doc_id, " +
          "coalesce(cl.canon_id, d.doc_id) AS canon_id " +
          "FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id) " +
          s"SELECT doc_id, canon_id, CASE WHEN $bkt < 80 THEN 'train' " +
          s"WHEN $bkt < 90 THEN 'val' ELSE 'test' END AS split FROM cn"
      },
      "feature_hash" -> {
        import graft.functions.OracleSql
        val et = OracleSql.wordHash("'et=' || event_type")
        val cross = OracleSql.wordHash(
          "'et_x_ub=' || event_type || '_' || " +
            "CAST(((user_id % 16) + 16) % 16 AS VARCHAR)")
        s"SELECT event_id, ($et) % 1024 AS f_et, " +
          s"($cross) % 1024 AS f_cross FROM events"
      },
      "feature_hash_tf" -> {
        import graft.functions.OracleSql
        s"WITH w AS (SELECT doc_id, " +
          s"unnest(${OracleSql.wordHashes("lower(text)")}) AS wh " +
          "FROM documents) " +
          "SELECT doc_id, wh % 64 AS bucket, " +
          "CAST(count(*) AS BIGINT) AS tf FROM w GROUP BY 1, 2"
      },
      "feature_target_encode" ->
        ("SELECT event_id, event_type, value, " +
          "CASE WHEN n = 1 THEN NULL ELSE " +
          "CAST(s - qx AS DOUBLE) / (CAST(n - 1 AS DOUBLE) * 1048576.0) " +
          "END AS te FROM (" +
          "SELECT event_id, event_type, value, qx, " +
          "CAST(sum(qx) OVER (PARTITION BY event_type) AS BIGINT) AS s, " +
          "count(*) OVER (PARTITION BY event_type) AS n FROM (" +
          "SELECT event_id, event_type, value, " +
          "CAST(floor(value * 1048576.0) AS BIGINT) AS qx FROM events))"),
      "feature_woe" ->
        // One pinned ln (engine-wide libm round(·,8) discipline); the
        // iv_term composes the PINNED woe, exactly as the engine does.
        ("WITH b AS (SELECT lang AS category, " +
          "CASE WHEN n_chars > 500 THEN 1 ELSE 0 END AS y FROM documents), " +
          "g AS (SELECT category, CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(y) AS BIGINT) AS n_pos, " +
          "CAST(count(*) - sum(y) AS BIGINT) AS n_neg FROM b GROUP BY 1), " +
          "t AS (SELECT CAST(sum(n_pos) AS BIGINT) AS tp, " +
          "CAST(sum(n_neg) AS BIGINT) AS tn FROM g), " +
          "w AS (SELECT category, n, n_pos, n_neg, tp, tn, " +
          "round(ln(((CAST(n_pos AS DOUBLE) + 0.5) / " +
          "(CAST(tp AS DOUBLE) + 0.5)) / " +
          "((CAST(n_neg AS DOUBLE) + 0.5) / " +
          "(CAST(tn AS DOUBLE) + 0.5))), 8) AS woe FROM g, t) " +
          "SELECT category, n, n_pos, n_neg, woe, " +
          "CASE WHEN tp = 0 OR tn = 0 THEN NULL ELSE " +
          "round((CAST(n_pos AS DOUBLE) / CAST(tp AS DOUBLE) - " +
          "CAST(n_neg AS DOUBLE) / CAST(tn AS DOUBLE)) * woe, 8) END " +
          "AS iv_term FROM w"),
      "emb_hard_mining" ->
        ("WITH n AS (SELECT vec_id, label, " +
          "CAST(embedding AS DOUBLE[]) AS v, " +
          "sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), " +
          "CAST(embedding AS DOUBLE[]))) AS nrm FROM embeddings), " +
          "a AS (SELECT vec_id AS anchor_id, label AS al, v AS av, " +
          "nrm AS an FROM n WHERE vec_id % 199 = 0), " +
          "p AS (SELECT a.anchor_id, a.al, n.vec_id, n.label, " +
          "list_inner_product(n.v, a.av) / (n.nrm * a.an) AS cos " +
          "FROM n, a WHERE n.vec_id <> a.anchor_id), " +
          "neg AS (SELECT anchor_id, vec_id, row_number() OVER " +
          "(PARTITION BY anchor_id ORDER BY cos DESC, vec_id) AS rn " +
          "FROM p WHERE label <> al), " +
          "pos AS (SELECT anchor_id, vec_id, row_number() OVER " +
          "(PARTITION BY anchor_id ORDER BY cos ASC, vec_id) AS rn " +
          "FROM p WHERE label = al) " +
          "SELECT neg.anchor_id, neg.vec_id AS hard_neg_id, " +
          "pos.vec_id AS hard_pos_id FROM neg " +
          "JOIN pos ON neg.anchor_id = pos.anchor_id " +
          "WHERE neg.rn = 1 AND pos.rn = 1"),
      "emb_coverage" ->
        // Per-row best cosine is a float MAX (exact, order-free); the
        // floor-quantized sum is then pure integer arithmetic.
        ("WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, " +
          "sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), " +
          "CAST(embedding AS DOUBLE[]))) AS nrm FROM embeddings), " +
          "q AS (SELECT vec_id AS sid, v AS qv, nrm AS qn FROM n " +
          "WHERE vec_id % 97 = 0), " +
          "b AS (SELECT n.vec_id, CAST(floor(max(" +
          "list_inner_product(n.v, q.qv) / (n.nrm * q.qn)) * 1.0e8) " +
          "AS BIGINT) AS bq FROM n, q GROUP BY n.vec_id), " +
          "c AS (SELECT CAST(count(*) AS BIGINT) AS ns FROM q) " +
          "SELECT CAST(count(*) AS BIGINT) AS n_rows, " +
          "(SELECT ns FROM c) AS n_sample, " +
          "CAST(coalesce(sum(bq), 0) AS BIGINT) AS sum_cover_q, " +
          "min(bq) AS min_cover_q, " +
          "CASE WHEN count(*) = 0 THEN NULL ELSE " +
          "CAST(coalesce(sum(bq), 0) AS DOUBLE) / " +
          "CAST(count(*) AS DOUBLE) / 1.0e8 END AS mean_cover FROM b"),
      "ann_matryoshka_recall" ->
        // Two brute-force chains (full-dim truth, 16-dim prefix) and a
        // per-query overlap count — ids and exact ints only.
        ("WITH nf AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v " +
          "FROM embeddings), " +
          "na AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) " +
          "AS nrm FROM nf), " +
          "qa AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM na " +
          "WHERE vec_id < 10), " +
          "pa AS (SELECT q.query_id, n.vec_id, " +
          "list_inner_product(n.v, q.qv) / (n.nrm * q.qn) AS cos " +
          "FROM na n, qa q WHERE n.vec_id <> q.query_id), " +
          "ex AS (SELECT query_id, vec_id AS neighbor_id FROM (" +
          "SELECT query_id, vec_id, row_number() OVER (" +
          "PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank " +
          "FROM pa) WHERE rank <= 10), " +
          "tf AS (SELECT vec_id, v[1:16] AS v FROM nf), " +
          "nb AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) " +
          "AS nrm FROM tf), " +
          "qb AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM nb " +
          "WHERE vec_id < 10), " +
          "pb AS (SELECT q.query_id, n.vec_id, " +
          "list_inner_product(n.v, q.qv) / (n.nrm * q.qn) AS cos " +
          "FROM nb n, qb q WHERE n.vec_id <> q.query_id), " +
          "ap AS (SELECT query_id, vec_id AS neighbor_id, 1 AS hit FROM (" +
          "SELECT query_id, vec_id, row_number() OVER (" +
          "PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank " +
          "FROM pb) WHERE rank <= 10) " +
          "SELECT ex.query_id, CAST(count(*) AS BIGINT) AS k, " +
          "CAST(coalesce(sum(ap.hit), 0) AS BIGINT) AS n_hit, " +
          "CAST(coalesce(sum(ap.hit), 0) AS DOUBLE) / " +
          "CAST(count(*) AS DOUBLE) AS recall FROM ex " +
          "LEFT JOIN ap ON ap.query_id = ex.query_id " +
          "AND ap.neighbor_id = ex.neighbor_id GROUP BY ex.query_id"),
      "sample_bootstrap" -> {
        import graft.functions.TextHash
        val cdf = graft.ops.Sampling.poissonCdf(1.0, 8)
        val u = s"(CAST(((doc_id * ${TextHash.permuteA(0)} + " +
          s"${TextHash.permuteB(0)}) % ${TextHash.P}) AS DOUBLE) / " +
          s"${TextHash.P.toDouble})"
        val ks = cdf.map(c => s"CASE WHEN $u >= $c THEN 1 ELSE 0 END")
          .mkString(" + ")
        s"SELECT doc_id, CAST($ks AS BIGINT) AS boot_k FROM documents"
      },
      "sample_bootstrap_ci" -> {
        // 40 hash-permuted Poisson replicates in one aggregate; the CI
        // is an element pick from the sorted replicate means.
        import graft.functions.TextHash
        val cdf = graft.ops.Sampling.poissonCdf(1.0, 8)
        val reps = 40
        def u(b: Int) = s"(CAST(((event_id * ${TextHash.permuteA(b)} + " +
          s"${TextHash.permuteB(b)}) % ${TextHash.P}) AS DOUBLE) / " +
          s"${TextHash.P.toDouble})"
        def k(b: Int) = cdf
          .map(c => s"CASE WHEN ${u(b)} >= $c THEN 1 ELSE 0 END")
          .mkString("(", " + ", ")")
        val kcols = (0 until reps).map(b => s"${k(b)} AS k$b")
          .mkString(", ")
        val aggs = (0 until reps).map(b =>
          s"CAST(coalesce(sum(k$b * q), 0) AS BIGINT) AS skx$b, " +
            s"CAST(coalesce(sum(k$b), 0) AS BIGINT) AS sk$b")
          .mkString(", ")
        val meanList = (0 until reps).map(b =>
          s"CASE WHEN sk$b = 0 THEN NULL ELSE CAST(skx$b AS DOUBLE) / " +
            s"CAST(sk$b AS DOUBLE) / 1024.0 END")
          .mkString("list_sort(list_value(", ", ", "))")
        // Ranks computed EXACTLY as the engine does (0.05*40 rounds up
        // past 2.0 in IEEE — never hardcode ceil(alpha*reps) by eye).
        val loRank = math.max(1, math.ceil(0.05 * reps).toInt)
        val hiRank = math.min(reps, math.ceil((1.0 - 0.05) * reps).toInt)
        s"WITH b AS (SELECT CAST(floor(value * 1024.0) AS BIGINT) AS q, " +
          s"event_id, $kcols FROM events), " +
          s"m AS (SELECT CAST(count(*) AS BIGINT) AS n0, " +
          s"CAST(coalesce(sum(q), 0) AS BIGINT) AS s0, $aggs FROM b) " +
          "SELECT n0 AS n_rows, CASE WHEN n0 = 0 THEN NULL ELSE " +
          "CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) / 1024.0 END " +
          s"AS mean_full, $meanList[$loRank] AS ci_lo, " +
          s"$meanList[$hiRank] AS ci_hi FROM m"
      },
      "emb_centroid_classify" ->
        // Fixed-point centroids (the centroid_by_label arithmetic),
        // strict-fold cosines, argmax ties to the smallest label.
        ("WITH e AS (SELECT vec_id, label, " +
          "CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
          "x AS (SELECT label, unnest(list_transform(range(0, len(v)), " +
          "j -> {'j': j, 'x': v[j+1]})) AS u FROM e), " +
          "a AS (SELECT label, u.j AS j, " +
          "sum(CAST(floor(u.x * 1048576.0) AS BIGINT)) AS sq, " +
          "count(*) AS cnt FROM x GROUP BY label, u.j), " +
          "c AS (SELECT CAST(label AS BIGINT) AS cl, " +
          "list(CAST(sq AS DOUBLE) / (CAST(cnt AS DOUBLE) * 1048576.0) " +
          "ORDER BY j) AS cv FROM a GROUP BY label), " +
          "n AS (SELECT vec_id, CAST(label AS BIGINT) AS tl, v, " +
          "sqrt(list_inner_product(v, v)) AS nrm FROM e), " +
          "p AS (SELECT n.vec_id, n.tl, c.cl, " +
          "list_inner_product(n.v, c.cv) / " +
          "(n.nrm * sqrt(list_inner_product(c.cv, c.cv))) AS cos " +
          "FROM n, c), " +
          "w AS (SELECT vec_id, tl, cl, row_number() OVER (" +
          "PARTITION BY vec_id ORDER BY cos DESC, cl) AS rn FROM p) " +
          "SELECT tl AS label, CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(CASE WHEN cl = tl THEN 1 ELSE 0 END) AS BIGINT) " +
          "AS n_correct, " +
          "CAST(sum(CASE WHEN cl = tl THEN 1 ELSE 0 END) AS DOUBLE) / " +
          "CAST(count(*) AS DOUBLE) AS accuracy " +
          "FROM w WHERE rn = 1 GROUP BY tl"),
      "feature_quantile_bin" ->
        ("WITH nn AS (SELECT event_id, event_type, value, " +
          "CAST(ntile(8) OVER (PARTITION BY event_type " +
          "ORDER BY value ASC, event_id ASC) AS BIGINT) AS bin " +
          "FROM events WHERE value IS NOT NULL) " +
          "SELECT * FROM nn UNION ALL " +
          "SELECT event_id, event_type, value, NULL AS bin " +
          "FROM events WHERE value IS NULL"),
      "feature_impute_median" ->
        ("WITH src AS (SELECT l_orderkey, l_linenumber, l_returnflag, " +
          "CASE WHEN l_orderkey % 13 = 0 THEN NULL ELSE l_quantity END AS q " +
          "FROM lineitem), " +
          "m AS (SELECT l_returnflag, quantile_cont(q, 0.5) AS med " +
          "FROM src GROUP BY 1) " +
          "SELECT s.l_orderkey, s.l_linenumber, s.l_returnflag, " +
          "s.q IS NULL AS was_missing, coalesce(s.q, m.med) AS q_imputed " +
          "FROM src s JOIN m USING (l_returnflag)"),
      "sketch_quantile" ->
        ("WITH qraw AS (SELECT l_returnflag AS g, " +
          "CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem), " +
          graft.functions.OracleSql.quantileSketchCtes(Seq(50, 90, 99)) +
          " SELECT g, pct, n_rows, est FROM qest"),
      "sketch_quantile_error" ->
        ("WITH qraw AS (SELECT l_returnflag AS g, " +
          "CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem), " +
          graft.functions.OracleSql.quantileSketchCtes(Seq(50, 90, 99)) +
          ", exw AS (SELECT g, quantile_cont(x, 0.5) AS e50, " +
          "quantile_cont(x, 0.9) AS e90, quantile_cont(x, 0.99) AS e99 " +
          "FROM qraw GROUP BY g), " +
          "ex AS (SELECT g, 50 AS pct, e50 AS exact FROM exw " +
          "UNION ALL SELECT g, 90, e90 FROM exw " +
          "UNION ALL SELECT g, 99, e99 FROM exw) " +
          "SELECT q.g, CAST(q.pct AS BIGINT) AS pct, q.n_rows, q.est, " +
          "ex.exact, round(abs(q.est - ex.exact) / ex.exact, 8) " +
          "AS rel_err FROM qest q " +
          "JOIN ex ON ex.g = q.g AND ex.pct = q.pct"),
      // bucket counts are additive, so the shard-merged estimate equals
      // the direct build — one oracle serves both paths
      "sketch_quantile_merge" ->
        ("WITH qraw AS (SELECT l_returnflag AS g, " +
          "CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem), " +
          graft.functions.OracleSql.quantileSketchCtes(Seq(50, 95)) +
          " SELECT g, pct, n_rows, est FROM qest"),
      "emb_mmr" ->
        ("WITH kc0 AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, " +
          "CAST(embedding AS DOUBLE[]) AS v, " +
          "sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), " +
          "CAST(embedding AS DOUBLE[]))) AS nrm FROM embeddings), " +
          "kc AS (SELECT * FROM kc0 WHERE nrm > 0), " +
          "q AS (SELECT v AS qv, nrm AS qn FROM kc WHERE vec_id = 0), " +
          graft.functions.OracleSql.mmrCtes(k = 8, pool = 48) +
          " SELECT pick, vec_id AS picked_id FROM msel7"),
      "sample_kcenter" ->
        ("WITH kc AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, " +
          "CAST(embedding AS DOUBLE[]) AS v, " +
          "sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), " +
          "CAST(embedding AS DOUBLE[]))) AS nrm FROM embeddings), " +
          graft.functions.OracleSql.farthestPointBatchCtes(
            k = 8, ell = 4, rounds = 3) +
          " SELECT pick, vec_id AS picked_id FROM gsel7"),
      "sample_kcenter_scalable" ->
        ("WITH kc AS (SELECT CAST(vec_id AS BIGINT) AS vec_id, " +
          "CAST(embedding AS DOUBLE[]) AS v, " +
          "sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), " +
          "CAST(embedding AS DOUBLE[]))) AS nrm FROM embeddings), " +
          graft.functions.OracleSql.farthestPointBatchCtes(
            k = 8, ell = 8, rounds = 2) +
          " SELECT pick, vec_id AS picked_id FROM gsel7"),
      "sample_kmeans_parallel" -> kmeansParallel,
      "dedup_simhash" -> simhashSql,
      "dedup_sorted_neighborhood" -> sortedNeighborhoodSql,
      "dedup_ngram_jaccard" -> jaccardSql,
      "dedup_threshold_sweep" ->
        (s"WITH j AS ($jaccardSql), " +
          "t AS (SELECT CAST(unnest([10, 25, 50, 75, 90]) AS INT) " +
          "AS threshold_pct) " +
          "SELECT threshold_pct, count(*) AS n_pairs FROM j, t " +
          "WHERE jaccard * 100 >= threshold_pct GROUP BY 1"),
      "dedup_containment" -> containmentSql,
      // shard (doc_id % 10 = 0) probes the index of the rest — same
      // banding chain, join constrained to shard × index
      "dedup_incremental" -> {
        val sigCols = (0 until 8).map(j =>
          s"${OracleSql.minhash("sh", j)} AS mh$j").mkString(", ")
        s"WITH base AS (SELECT doc_id, $wh AS wh FROM documents), " +
          s"sh_t AS (SELECT doc_id, ${OracleSql.shingles("wh", 3)} AS sh FROM base), " +
          s"sig AS (SELECT doc_id, $sigCols FROM sh_t), " +
          s"banded AS (${OracleSql.lshBanded("doc_id", 8, 2)}) " +
          "SELECT DISTINCT n.doc_id AS id_new, i.doc_id AS id_idx " +
          "FROM banded n JOIN banded i ON n.band = i.band AND n.key = i.key " +
          "WHERE n.doc_id % 10 = 0 AND i.doc_id % 10 <> 0"
      },
      "dedup_prefix_jaccard" -> prefixJaccardSql,
      "dedup_decontaminate" -> decontaminateSql,
      "dedup_span_stats" -> spanStatsSql,
      "dedup_longest_span" -> dupSpansSql,
      "dedup_span_scrub" -> spanScrubSql,
      "dedup_keep_best" -> keepBestSql,
      "dedup_embedding_cosine" -> cosineNearDup,
      "emb_knn_graph" -> mutualKnn,
      "emb_bitext_margin" -> bitextMargin,
      "emb_anisotropy" -> anisotropy,
      // NN-descent replay: the same TWO LSH seed tables (second over
      // the reversed vector), the same undirected two-hop candidate
      // expansion, the same (cos DESC, dst) rescore.
      "ann_nndescent" ->
        (s"$embNorm, n2 AS (SELECT vec_id, v, nrm, bucket, " +
          s"${OracleSql.hyperplaneBucket("list_reverse(v)", 64, 4)} " +
          "AS bucket2 FROM n), " +
          "p AS (SELECT a.vec_id AS src, b.vec_id AS dst, " +
          s"${OracleSql.dot("a.v", "b.v")} / (a.nrm * b.nrm) AS cos, " +
          "1 AS tbl FROM n2 a JOIN n2 b ON a.bucket = b.bucket " +
          "AND a.vec_id <> b.vec_id " +
          "UNION ALL SELECT a.vec_id AS src, b.vec_id AS dst, " +
          s"${OracleSql.dot("a.v", "b.v")} / (a.nrm * b.nrm) AS cos, " +
          "2 AS tbl FROM n2 a JOIN n2 b ON a.bucket2 = b.bucket2 " +
          "AND a.vec_id <> b.vec_id), " +
          "k0 AS (SELECT DISTINCT src, dst FROM (SELECT src, dst, " +
          "row_number() OVER (PARTITION BY src, tbl " +
          "ORDER BY cos DESC, dst) AS rk FROM p) WHERE rk <= 4), " +
          "und AS (SELECT src, dst FROM k0 " +
          "UNION SELECT dst AS src, src AS dst FROM k0), " +
          "cand AS (SELECT DISTINCT src, dst FROM (" +
          "SELECT p2.src, q2.dst FROM und p2 JOIN und q2 " +
          "ON p2.dst = q2.src WHERE p2.src <> q2.dst " +
          "UNION ALL SELECT src, dst FROM k0)), " +
          "rs AS (SELECT c.src, c.dst, " +
          s"${OracleSql.dot("x.v", "y.v")} / (x.nrm * y.nrm) AS cos " +
          "FROM cand c JOIN n x ON x.vec_id = c.src " +
          "JOIN n y ON y.vec_id = c.dst) " +
          "SELECT src, dst, CAST(rk AS BIGINT) AS rank FROM (" +
          "SELECT src, dst, row_number() OVER (" +
          "PARTITION BY src ORDER BY cos DESC, dst) AS rk FROM rs) " +
          "WHERE rk <= 4"),
      "sketch_bloom_contains" -> bloomContainsOracle,
      "sketch_bloom_merge" -> bloomMergeOracle,
      "sketch_cms_counts" -> cmsOracle,
      "sketch_cms_merge" -> cmsOracle,
      "sketch_cms_error" -> {
        // CMS estimate (the cmsOracle arithmetic) joined against the
        // exact per-(lang, word) token count; overestimate ≥ 0 always.
        val whl = OracleSql.wordHashes("lower(text)")
        val width = 1024
        val cellsOf = { (h: String) =>
          (0 until 3).map(j =>
            s"${j.toLong * width} + ((($h) * ${TextHash.permuteA(j)} + " +
              s"${TextHash.permuteB(j)}) % ${TextHash.P}) % $width")
            .mkString("[", ", ", "]")
        }
        val words = bloomProbes.map(w => s"'$w'").mkString(", ")
        s"WITH t AS (SELECT lang, unnest($whl) AS h0 FROM documents), " +
          "c AS (SELECT lang, cell, count(*) AS n FROM " +
          s"(SELECT lang, unnest(${cellsOf("h0")}) AS cell FROM t) " +
          "GROUP BY lang, cell), " +
          s"pw AS (SELECT unnest([$words]) AS word), " +
          "ph AS (SELECT word, " +
          s"list_extract(${OracleSql.wordHashes("lower(word)")}, 1) " +
          "AS h0 FROM pw), " +
          s"pc AS (SELECT word, unnest(${cellsOf("h0")}) AS cell FROM ph), " +
          "langs AS (SELECT DISTINCT lang FROM documents), " +
          "est AS (SELECT l.lang, p.word, " +
          "CAST(min(coalesce(c.n, 0)) AS BIGINT) AS est_count " +
          "FROM langs l CROSS JOIN pc p " +
          "LEFT JOIN c ON c.lang = l.lang AND c.cell = p.cell " +
          "GROUP BY l.lang, p.word), " +
          "tk AS (SELECT lang, unnest(list_filter(" +
          "regexp_split_to_array(lower(text), '\\s+'), " +
          "x -> len(x) > 0)) AS w FROM documents), " +
          "ex AS (SELECT lang, w AS word, CAST(count(*) AS BIGINT) " +
          "AS exact_count FROM tk GROUP BY 1, 2) " +
          "SELECT est.lang, est.word, " +
          "CAST(coalesce(ex.exact_count, 0) AS BIGINT) AS exact_count, " +
          "est.est_count, " +
          "est.est_count - coalesce(ex.exact_count, 0) AS overestimate " +
          "FROM est LEFT JOIN ex ON ex.lang = est.lang " +
          "AND ex.word = est.word"
      },
      "sketch_hll_distinct" -> hllOracle,
      // Mergeability IS the gate: the engine merges per-(lang,source)
      // registers by elementwise max; the oracle computes per-lang
      // directly. Equal output proves union(sketches) == sketch(union).
      "sketch_hll_merge" -> hllOracle,
      "sketch_kmv_distinct" -> {
        val wh = OracleSql.wordHashes("lower(text)")
        val kept = "sum(CASE WHEN rn <= 64 THEN 1 ELSE 0 END)"
        s"WITH t AS (SELECT lang, unnest($wh) AS h0 FROM documents), " +
          s"tp AS (SELECT lang, (h0 * ${TextHash.permuteA(0)} + " +
          s"${TextHash.permuteB(0)}) % ${TextHash.P} AS h FROM t), " +
          "d AS (SELECT DISTINCT lang, h FROM tp), " +
          "r AS (SELECT lang, h, row_number() OVER (" +
          "PARTITION BY lang ORDER BY h) AS rn FROM d) " +
          s"SELECT lang, count(*) AS n_exact, CAST($kept AS BIGINT) AS n_kept, " +
          s"CASE WHEN $kept < 64 THEN CAST($kept AS DOUBLE) " +
          s"ELSE ${63.0 * graft.functions.TextHash.P} / " +
          "max(CASE WHEN rn <= 64 THEN h END) END AS est_distinct " +
          "FROM r GROUP BY lang"
      },
      "sketch_kmv_merge" -> {
        val wh = OracleSql.wordHashes("lower(text)")
        val kept = "sum(CASE WHEN rn <= 64 THEN 1 ELSE 0 END)"
        s"WITH t AS (SELECT lang, unnest($wh) AS h0 FROM documents), " +
          s"tp AS (SELECT lang, (h0 * ${TextHash.permuteA(0)} + " +
          s"${TextHash.permuteB(0)}) % ${TextHash.P} AS h FROM t), " +
          "d AS (SELECT DISTINCT lang, h FROM tp), " +
          "r AS (SELECT lang, h, row_number() OVER (" +
          "PARTITION BY lang ORDER BY h) AS rn FROM d) " +
          s"SELECT lang, CAST($kept AS BIGINT) AS n_kept, " +
          s"CASE WHEN $kept < 64 THEN CAST($kept AS DOUBLE) " +
          s"ELSE ${63.0 * graft.functions.TextHash.P} / " +
          "max(CASE WHEN rn <= 64 THEN h END) END AS est_distinct " +
          "FROM r GROUP BY lang"
      },
      "sketch_kmv_jaccard" -> {
        val wh = OracleSql.wordHashes("lower(text)")
        def est(x: String) =
          s"CASE WHEN len($x) < 64 THEN CAST(len($x) AS DOUBLE) " +
            s"ELSE ${63.0 * graft.functions.TextHash.P} / $x[64] END"
        s"WITH t AS (SELECT lang, unnest($wh) AS h0 FROM documents), " +
          s"tp AS (SELECT lang, (h0 * ${TextHash.permuteA(0)} + " +
          s"${TextHash.permuteB(0)}) % ${TextHash.P} AS h FROM t), " +
          "d AS (SELECT DISTINCT lang, h FROM tp), " +
          "r AS (SELECT lang, h, row_number() OVER (" +
          "PARTITION BY lang ORDER BY h) AS rn FROM d), " +
          "s AS (SELECT lang, list(h ORDER BY h) AS minima FROM r " +
          "WHERE rn <= 64 GROUP BY lang), " +
          "p AS (SELECT a.lang AS g_a, b.lang AS g_b, a.minima AS ma, " +
          "b.minima AS mb, list_slice(list_sort(list_distinct(" +
          "list_concat(a.minima, b.minima))), 1, 64) AS u " +
          "FROM s a JOIN s b ON a.lang < b.lang), " +
          s"e AS (SELECT g_a, g_b, ${est("ma")} AS est_a, " +
          s"${est("mb")} AS est_b, ${est("u")} AS est_union FROM p) " +
          "SELECT g_a, g_b, est_a, est_b, est_union, " +
          "greatest(0.0, est_a + est_b - est_union) AS est_intersect, " +
          "CASE WHEN est_union > 0 THEN " +
          "greatest(0.0, est_a + est_b - est_union) / est_union " +
          "ELSE 0.0 END AS jaccard_est FROM e"
      },
      "emb_outliers" -> {
        val fold = (e: String) =>
          s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), $e), " +
            "(a, b) -> a + b)"
        "WITH e AS (SELECT vec_id, label, " +
          "CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
          "xj AS (SELECT label, unnest(list_transform(range(0, len(v)), " +
          "j -> {'j': j, 'x': v[j+1]})) AS u FROM e), " +
          "ag AS (SELECT label, u.j AS j, " +
          "sum(CAST(floor(u.x * 1048576.0) AS BIGINT)) AS sq, " +
          "count(*) AS cnt FROM xj GROUP BY label, u.j), " +
          "cv AS (SELECT label, list_transform(list_sort(list(" +
          "{'j': j, 'c': CAST(sq AS DOUBLE) / " +
          "(CAST(cnt AS DOUBLE) * 1048576.0)})), s -> s.c) AS cv " +
          "FROM ag GROUP BY label), " +
          s"di AS (SELECT vec_id, e.label, sqrt(${fold(
            "list_transform(range(0, len(v)), " +
              "j -> (v[j+1] - cv[j+1]) * (v[j+1] - cv[j+1]))")}) " +
          "AS dist FROM e JOIN cv ON e.label = cv.label), " +
          "qraw AS (SELECT label, dist AS x FROM di), " +
          OracleSql.quantileSketchCtes(Seq(99), Seq("label")) +
          ", thr AS (SELECT label, est AS p99_dist FROM qest " +
          "WHERE pct = 99) " +
          "SELECT vec_id, di.label, dist, p99_dist FROM di " +
          "JOIN thr ON di.label = thr.label WHERE dist > p99_dist"
      },
      "emb_pca_power" -> (pcaOracleCtes +
        " SELECT CAST(u.j AS BIGINT) AS dim_idx, u.l AS loading " +
        "FROM (SELECT unnest(list_transform(range(0, len(vv)), " +
        "j -> {'j': j, 'l': vv[j+1]})) AS u FROM v3)"),
      "emb_pca_project" -> (pcaOracleCtes +
        " SELECT vec_id, list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        "list_transform(range(0, len(c)), " +
        "j -> CAST(c[j+1] AS DOUBLE) * vv[j+1])), (a, b) -> a + b) " +
        "/ 1048576.0 AS score FROM cq, v3"),
      "emb_centroid_by_label" ->
        // Mirrors Similarity.groupCentroids: MeanQ fixed-point sums.
        ("WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v " +
          "FROM embeddings), " +
          "x AS (SELECT label, unnest(list_transform(range(0, len(v)), " +
          "j -> {'j': j, 'x': v[j+1]})) AS u FROM e), " +
          "a AS (SELECT label, u.j AS j, " +
          "sum(CAST(floor(u.x * 1048576.0) AS BIGINT)) AS sq, " +
          "count(*) AS cnt FROM x GROUP BY label, u.j) " +
          "SELECT label, CAST(j AS BIGINT) AS dim_idx, " +
          "CAST(cnt AS BIGINT) AS n_vecs, " +
          "CAST(sq AS DOUBLE) / (CAST(cnt AS DOUBLE) * 1048576.0) " +
          "AS centroid FROM a"),
      "emb_centroid_drift" -> {
        val cos = OracleSql.dot("x.cv", "y.cv") +
          s" / (sqrt(${OracleSql.dot("x.cv", "x.cv")}) * " +
          s"sqrt(${OracleSql.dot("y.cv", "y.cv")}))"
        "WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v " +
          "FROM embeddings), " +
          "x AS (SELECT label, unnest(list_transform(range(0, len(v)), " +
          "j -> {'j': j, 'x': v[j+1]})) AS u FROM e), " +
          "a AS (SELECT label, u.j AS j, " +
          "sum(CAST(floor(u.x * 1048576.0) AS BIGINT)) AS sq, " +
          "count(*) AS cnt FROM x GROUP BY label, u.j), " +
          "c AS (SELECT label, list(CAST(sq AS DOUBLE) / " +
          "(CAST(cnt AS DOUBLE) * 1048576.0) ORDER BY j) AS cv " +
          "FROM a GROUP BY label) " +
          "SELECT x.label AS group_a, y.label AS group_b, " +
          s"$cos AS cos_sim " +
          "FROM c x JOIN c y ON x.label < y.label"
      },
      "emb_random_project" -> {
        val proj = (0 until 8).map { i =>
          OracleSql.foldSum(s"list_transform(range(0, 64), j -> " +
            s"v[j+1] * ${OracleSql.planeSign(i, "j", 64)})") + s" AS p$i"
        }.mkString(", ")
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v " +
          s"FROM embeddings) SELECT vec_id, $proj FROM e"
      },
      "ann_lsh_topk" -> lshTopK,
      "emb_triplet_mining" -> tripletMining,
      // k-occurrence histogram over the same bucketed exact-integer kNN
      "emb_hubness" ->
        (s"$embNorm, q AS (SELECT vec_id AS id, bucket AS b, " +
          "list_transform(v, x -> CAST(floor(x * 1048576.0) AS BIGINT)) " +
          "AS qv FROM n), " +
          "pr AS (SELECT a.id AS src, c.id AS dst, " +
          s"${d2Sql("a.qv", "c.qv")} AS d2 FROM q a JOIN q c " +
          "ON c.b = a.b AND c.id <> a.id), " +
          "knn AS (SELECT dst FROM (SELECT dst, row_number() OVER " +
          "(PARTITION BY src ORDER BY d2, dst) AS rn FROM pr) " +
          "WHERE rn <= 5), " +
          "occ AS (SELECT q.id, CAST(coalesce(o.c, 0) AS BIGINT) " +
          "AS k_occurrences FROM q LEFT JOIN (SELECT dst, count(*) AS c " +
          "FROM knn GROUP BY dst) o ON o.dst = q.id) " +
          "SELECT k_occurrences, CAST(count(*) AS BIGINT) AS n_points " +
          "FROM occ GROUP BY k_occurrences"),
      "ann_topk" -> bruteTopK,
      // recall@k of the LSH path against the brute-force truth —
      // both full statements (CTEs included) compose as subqueries
      "ann_recall" ->
        (s"WITH ex AS (SELECT query_id, neighbor_id FROM ($bruteTopK)), " +
          s"ap AS (SELECT query_id, neighbor_id FROM ($lshTopK)) " +
          "SELECT ex.query_id, CAST(count(*) AS BIGINT) AS k, " +
          "CAST(count(ap.neighbor_id) AS BIGINT) AS n_hit, " +
          "CAST(count(ap.neighbor_id) AS DOUBLE) / " +
          "CAST(count(*) AS DOUBLE) AS recall " +
          "FROM ex LEFT JOIN ap USING (query_id, neighbor_id) " +
          "GROUP BY 1"),
      "emb_knn_accuracy" ->
        (s"WITH tk AS (SELECT query_id, neighbor_id FROM ($bruteTopK)), " +
          "v AS (SELECT tk.query_id, e.label AS nl, " +
          "CAST(count(*) AS BIGINT) AS c FROM tk " +
          "JOIN embeddings e ON e.vec_id = tk.neighbor_id " +
          "GROUP BY 1, 2), " +
          "m AS (SELECT query_id, nl, c, row_number() OVER (" +
          "PARTITION BY query_id ORDER BY c DESC, nl ASC) AS rn FROM v) " +
          "SELECT m.query_id, e.label AS true_label, m.nl AS pred_label, " +
          "m.c AS votes, (m.nl = e.label) AS correct FROM m " +
          "JOIN embeddings e ON e.vec_id = m.query_id WHERE m.rn = 1"),
      "ann_ivf_topk" -> ivfTopK,
      "ann_lsh_multiprobe" -> lshMultiprobe,
      "ann_ivf_nprobe" -> ivfNprobe,
      "dedup_semantic" -> semanticDedup,
      "ann_pq_topk" -> annPq,
      "ann_ivfpq_topk" -> ivfPq,
      "dedup_exact_normalized" ->
        (s"WITH nm AS ($normalizeSql) " +
          "SELECT min(doc_id) AS keep_id, count(*) AS n_copies " +
          "FROM nm GROUP BY text_norm"),
      "ann_filtered_topk" ->
        ("WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, " +
          "sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), " +
          "CAST(embedding AS DOUBLE[]))) AS nrm FROM embeddings " +
          "WHERE label % 2 = 0), " +
          "q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n " +
          "WHERE vec_id < 20), " +
          "p AS (SELECT q.query_id, n.vec_id, " +
          "list_inner_product(n.v, q.qv) / (n.nrm * q.qn) AS cos " +
          "FROM n, q WHERE n.vec_id <> q.query_id) " +
          "SELECT query_id, vec_id AS neighbor_id, " +
          "CAST(rank AS BIGINT) AS rank FROM " +
          "(SELECT query_id, vec_id, row_number() OVER (" +
          "PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank " +
          "FROM p) WHERE rank <= 10"),
      "dedup_winnow_pairs" -> winnowPairsSql,
      "dedup_edit_distance" ->
        (s"SELECT c.id_a, c.id_b, CAST(levenshtein(substr(da.text, 1, 120), " +
          "substr(db.text, 1, 120)) AS BIGINT) AS edit_dist " +
          s"FROM ($winnowPairsSql) c " +
          "JOIN documents da ON da.doc_id = c.id_a " +
          "JOIN documents db ON db.doc_id = c.id_b " +
          "WHERE c.id_a % 7 = 0"),
      "dedup_cdc_chunks" -> cdcChunksSql,
      "dedup_cdc_stats" ->
        // Group the replayed chunk stream by md5, then the storage
        // accounting identities.
        (s"WITH chunks AS ($cdcChunksSql), " +
          "u AS (SELECT chunk_md5, count(*) AS n, min(len) AS ln " +
          "FROM chunks GROUP BY 1) " +
          "SELECT CAST(count(*) AS BIGINT) AS n_unique_chunks, " +
          "CAST(sum(n) AS BIGINT) AS n_chunk_refs, " +
          "CAST(sum(ln) AS BIGINT) AS bytes_stored, " +
          "CAST(sum(n * ln) AS BIGINT) AS bytes_referenced, " +
          "CAST((sum(n * ln) - sum(ln)) * 1000000 // sum(n * ln) " +
          "AS BIGINT) AS saved_ppm FROM u"),
      "dedup_damerau" ->
        // DuckDB's damerau_levenshtein is a fully independent
        // implementation of the same unrestricted-transposition metric
        // (verified on the "ca"/"abc" = 2 discriminator) — the
        // strongest oracle shape: two codebases, one algorithm spec.
        (s"SELECT c.id_a, c.id_b, " +
          "CAST(damerau_levenshtein(substr(da.text, 1, 80), " +
          "substr(db.text, 1, 80)) AS BIGINT) AS dl_dist, " +
          "CAST(levenshtein(substr(da.text, 1, 80), " +
          "substr(db.text, 1, 80)) AS BIGINT) AS lev_dist " +
          s"FROM ($winnowPairsSql) c " +
          "JOIN documents da ON da.doc_id = c.id_a " +
          "JOIN documents db ON db.doc_id = c.id_b " +
          "WHERE c.id_a % 5 = 0"),
    )
  }
}
