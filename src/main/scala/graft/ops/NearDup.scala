package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** Near-duplicate detection for document corpora — the training-data
  * pipeline operators beyond the reference's exact latest-wins dedup
  * (SURVEY.md §2 O1). Three families, all shuffle-frugal by design:
  *
  *  - MinHash + LSH banding: per-doc signature is row-local map work; the
  *    only shuffle is the band-bucket self-join, whose volume is
  *    O(docs × bands), independent of pairwise candidates — the classic
  *    way to avoid the O(n²) blow-up at 100 TB.
  *  - SimHash: one 64-bit-ish fingerprint per doc, row-local; grouping by
  *    fingerprint (or banding its bits) finds near-identical docs with a
  *    single hash-aggregate shuffle.
  *  - n-gram Jaccard: the exact verifier, run only on bounded candidate
  *    sets (same-bucket or sampled pairs), never on the full cross join.
  *
  * Evaluation-shape note (matters enormously): every pipeline stage is
  * materialized as a real column in its own `select` before the next stage
  * references it. Spark's higher-order array functions are interpreted
  * (not whole-stage-codegen), and a lambda like `element_at(wh, i)`
  * re-evaluates its child expression on every call — so feeding the
  * word-hash EXPRESSION into the shingle transform would recompute the
  * entire per-doc hash pipeline once per shingle element (O(doc²) per
  * row; measured 100×+ slowdowns). With attributes, each stage runs once
  * per row. CollapseProject keeps the split because the aliases are
  * non-cheap and multiply referenced.
  */
object NearDup {

  /** Spread a compute-bound stage across the cluster when the source has
    * fewer partitions than cores (e.g. one small parquet file): the
    * hashing below costs far more than a round-robin shuffle of raw text.
    * No-op when upstream already provides enough partitions. */
  private def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** MinHash signature columns `mh0..mh{m-1}` over word-`n`-gram shingles.
    * Row-local: no shuffle beyond the parallelism spread; the native
    * signature expression computes all m permutation-minima in one pass
    * (no array_distinct needed — duplicates can't change a minimum). Docs
    * with fewer than `n` words get NULL signatures (no shingles to hash). */
  def minhashSignatures(
      docs: DataFrame, idCol: String, textCol: String,
      m: Int = 8, n: Int = 3): DataFrame =
    spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), TextHash.wordHashes(col(textCol)).as("__wh"))
      .select(col(idCol), TextHash.shingleHashes(col("__wh"), n).as("__sh"))
      .select(col(idCol), TextHash.minhashSignature(col("__sh"), m).as("__sig"))
      .select(col(idCol) +:
        (0 until m).map(j => element_at(col("__sig"), j + 1).as(s"mh$j")): _*)

  /** LSH banding over a MinHash signature: `bands` bands of `r` rows; two
    * docs are candidates iff some band agrees exactly. Emits distinct
    * candidate pairs (a < b). The self-join is on (band, key) — each side
    * is docs×bands rows, so shuffle volume scales linearly with the corpus
    * while recall follows 1-(1-J^r)^bands. */
  def lshCandidatePairs(
      docs: DataFrame, idCol: String, textCol: String,
      m: Int = 8, n: Int = 3, r: Int = 2): DataFrame = {
    require(m % r == 0, s"signature size $m must divide into bands of $r")
    // No isNotNull filter on the signatures: docs with < n words get NULL
    // minhashes → NULL band keys, and the equi-join below never matches
    // NULL keys, so they drop out for free. An explicit filter would be
    // predicate-pushed below the repartition with the whole minhash
    // expression substituted in — re-running the hash pipeline per row on
    // the unspread input (measured 60s+ at sf0.1 vs ~2s without).
    val banded = lshBandIndex(docs, idCol, textCol, m, n, r)
    val a = banded.select(col("band"), col("key"), col(idCol).as("id_a"))
    val b = banded.select(col("band"), col("key"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "key"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Persistent LSH band index — the (id, band, key) inverted index the
    * candidate join runs on, exposed so a pipeline can WRITE it once and
    * probe each arriving shard against it ([[lshProbeIndex]]) instead of
    * re-hashing the corpus per delivery. Band keys come from the shared
    * `TextHash.bandKeys` fold — the single source of the banding
    * constants, also used by the streaming twin — so an index written
    * yesterday matches signatures computed today. */
  def lshBandIndex(
      docs: DataFrame, idCol: String, textCol: String,
      m: Int = 8, n: Int = 3, r: Int = 2): DataFrame = {
    require(m % r == 0, s"signature size $m must divide into bands of $r")
    val sig = minhashSignatures(docs, idCol, textCol, m, n)
    sig.select(
      col(idCol),
      explode(TextHash.bandKeys((0 until m).map(j => col(s"mh$j")), r))
        .as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** Incremental near-dup: probe an arriving shard against a stored
    * [[lshBandIndex]] — the 100-TB delivery path, where the corpus is
    * indexed ONCE and each new batch only hashes itself (O(batch)) and
    * equi-joins the band index (broadcast when the batch is small after
    * banding). Emits distinct (id_new, id_idx) candidate pairs; verify
    * with the exact scorers ([[ngramJaccardVerify]]-style) on candidates
    * only, exactly like the self-join path.
    *
    * Docs present in BOTH frames pair with themselves on every band —
    * excluded by the `id_new =!= id_idx` guard, so re-delivered ids
    * don't self-report. */
  def lshProbeIndex(
      newDocs: DataFrame, idCol: String, textCol: String,
      index: DataFrame, m: Int = 8, n: Int = 3, r: Int = 2): DataFrame = {
    val probes = lshBandIndex(newDocs, idCol, textCol, m, n, r)
      .select(col("band"), col("key"), col(idCol).as("id_new"))
    val idx = index.select(col("band"), col("key"), col(idCol).as("id_idx"))
    probes.join(idx, Seq("band", "key"))
      .where(col("id_new") =!= col("id_idx"))
      .select(col("id_new"), col("id_idx"))
      .distinct()
  }

  /** Winnowing-based candidate pairs: docs sharing ANY winnow fingerprint
    * (guaranteed for any shared run of >= w+n-1 tokens) become candidates
    * via an inverted fingerprint index — explode fp, self-join on the
    * fingerprint value, distinct (a < b) pairs. Same linear shape as LSH
    * banding (shuffle = docs × selected fingerprints, ~2/(w+1) of the
    * shingles), but the guarantee is substring-overlap, not whole-doc
    * Jaccard — the right proposer for contained/quoted duplication.
    *
    * `maxDocFreq` drops STOP-FINGERPRINTS (boilerplate phrases shared by
    * more than that many docs) before the self-join: one fingerprint in
    * d docs yields d² pairs, so a single hot phrase would otherwise turn
    * the linear index quadratic — the same reason search engines drop
    * stopwords. The frequency filter is a count window over the exploded
    * index (one shuffle on f, no extra pass over the hash pipeline — a
    * groupBy + join-back would recompute the whole tokenize/winnow
    * pipeline a third time), and the surviving per-fingerprint pair count
    * is bounded by maxDocFreq². */
  def winnowCandidatePairs(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, w: Int = 4, maxDocFreq: Int = 100): DataFrame = {
    // fp arrays are distinct per doc, so (id, f) rows are unique
    val fp = TextAnalysis.winnowFingerprints(docs, idCol, textCol, n, w)
      .select(col(idCol), explode(col("fp")).as("f"))
    val wdw = org.apache.spark.sql.expressions.Window.partitionBy("f")
    val indexed = fp
      .withColumn("__df", count(lit(1)).over(wdw))
      .where(col("__df") <= maxDocFreq)
    val a = indexed.select(col("f"), col(idCol).as("id_a"))
    val b = indexed.select(col("f"), col(idCol).as("id_b"))
    a.join(b, Seq("f"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** SimHash fingerprints: (id, simhash) with a `bits`-bit fingerprint. */
  def simhashFingerprints(
      docs: DataFrame, idCol: String, textCol: String,
      bits: Int = 16): DataFrame =
    spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), TextHash.wordHashes(col(textCol)).as("__wh"))
      .select(col(idCol), TextHash.simhash(col("__wh"), bits).as("simhash"))

  /** Per-doc distinct word-bigram gram sets: (idCol, grams). */
  private def gramSets(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), TextHash.wordHashes(col(textCol)).as("__wh"))
      .select(col(idCol),
        array_distinct(TextHash.shingleHashes(col("__wh"), 2)).as("grams"))

  /** Eval-set decontamination — the benchmark-leakage filter every
    * training corpus needs: a train doc is CONTAMINATED when it shares at
    * least `minHits` distinct word-`n`-gram shingle hashes with ANY doc in
    * the eval set. Emits one row per train doc:
    * (idCol, n_shingles, n_hits, contaminated).
    *
    * Scale: the eval side (benchmarks: MBs, not TBs) collapses to a
    * distinct-hash set and is explicitly `broadcast` — the contamination
    * check on the 100-TB train side is then a map-side hash-semi-join on
    * the exploded shingles; the only corpus-keyed shuffle is the per-doc
    * hit aggregation (map-side combine, output O(docs)). Per-doc shingle
    * sets are `array_distinct`ed BEFORE the explode, so `count` after the
    * join counts distinct matched shingles with no count-distinct state. */
  def decontaminate(
      train: DataFrame, idCol: String, textCol: String,
      eval: DataFrame, evalTextCol: String,
      n: Int = 5, minHits: Int = 1): DataFrame = {
    require(minHits >= 1, s"minHits must be >= 1, got $minHits")
    val tsh = spread(train.select(col(idCol), col(textCol)))
      .select(col(idCol), TextHash.wordHashes(col(textCol)).as("__wh"))
      .select(col(idCol),
        array_distinct(TextHash.shingleHashes(col("__wh"), n)).as("__sh"))
    val esh = eval.select(TextHash.wordHashes(col(evalTextCol)).as("__wh"))
      .select(explode(TextHash.shingleHashes(col("__wh"), n)).as("h"))
      .distinct()
    // ONE corpus pass: explode_outer keeps zero-shingle docs (as a null
    // shingle row that count(h) then ignores); the broadcast left join
    // marks eval hits, and the per-doc rollup counts totals and hits
    // together. A separate n_shingles branch would re-run the whole
    // tokenize/shingle pipeline a second time (branches never share
    // scans).
    tsh.select(col(idCol), explode_outer(col("__sh")).as("h"))
      .join(broadcast(esh.withColumn("__hit", lit(1))), Seq("h"), "left_outer")
      .groupBy(col(idCol))
      .agg(
        count(col("h")).as("n_shingles"),
        count(col("__hit")).as("n_hits"))
      .select(col(idCol), col("n_shingles"), col("n_hits"),
        (col("n_hits") >= minHits).as("contaminated"))
  }

  /** Duplicated-span statistics — the substring-level dedup signal (the
    * exact-substring counterpart of whole-doc MinHash, after Lee et al.'s
    * "Deduplicating Training Data Makes Language Models Better"): for each
    * doc, what fraction of its DISTINCT word-`n`-gram shingles also occurs
    * in at least one OTHER doc. Emits (idCol, n_shingles, n_shared,
    * shared_frac, max_df) for every doc with at least one shingle (docs
    * shorter than `n` words have no spans to measure and are dropped —
    * document this to callers, the oracle mirrors it).
    *
    * Scale: per-doc shingle sets are distinct, so after the explode the
    * (doc, hash) rows are unique and a COUNT window partitioned by hash
    * IS the document frequency — one hash-keyed shuffle, no join-back,
    * no count-distinct. The per-doc rollup is the second and last
    * shuffle (map-side combine, output O(docs)). Both shuffles are
    * linear in corpus shingle volume; nothing is pairwise. */
  def duplicatedSpanStats(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int = 5): DataFrame = {
    val sh = spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), TextHash.wordHashes(col(textCol)).as("__wh"))
      .select(col(idCol),
        explode(array_distinct(TextHash.shingleHashes(col("__wh"), n))).as("h"))
    val wdw = org.apache.spark.sql.expressions.Window.partitionBy("h")
    sh.withColumn("__df", count(lit(1)).over(wdw))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("__df") > 1, 1L).otherwise(0L)).as("n_shared"),
        max(col("__df")).as("max_df"))
      .select(col(idCol),
        col("n_shingles"),
        col("n_shared"),
        (col("n_shared").cast("double") / col("n_shingles")).as("shared_frac"),
        col("max_df"))
  }

  /** Maximal duplicated SPANS — the variable-length exact-substring
    * dedup the fixed-width [[duplicatedSpanStats]] only approximates
    * (Lee et al. 2022's ExactSubstr at suffix-array fidelity): every
    * maximal cross-doc token-span match of length ≥ `k`, with positions
    * and exact length. Emitted once per maximal pair: (id_a, id_b,
    * pos_a, pos_b, match_len), ids ordered, positions 1-based.
    *
    * Algorithm (bucketed suffix groups, never all-pairs):
    *  1. anchor every suffix by its first-k-token-gram hash (the
    *     existing shingle kernel, order-preserving with positions);
    *  2. join anchors on the gram hash with id_a < id_b — the
    *     suffix-group bucket join; a `maxAnchorDf` stop-gram cap bounds
    *     any boilerplate gram's group (df ≤ cap keeps the fixture run
    *     EXACT — corpus max df is 4 — while capping the quadratic term
    *     at web scale, the [[winnowCandidatePairs]] discipline);
    *  3. keep only LEFT-MAXIMAL candidates (a span of length L would
    *     otherwise surface from all its L−k+1 interior anchors): pos=1
    *     on either side, or the preceding tokens differ;
    *  4. extend row-locally to the first mismatch — the exact match
    *     length. Hash collisions inside a bucket die here (match_len
    *     < k), so the output is exact, not probabilistic.
    *
    * Scale shape: one gram-keyed shuffle for the bucket join, one
    * id-keyed join-back of the two token arrays for surviving
    * candidates only, extension O(match) per row, nothing driver-side.
    */
  def maximalDupSpans(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, maxAnchorDf: Int = 64): DataFrame = {
    require(k >= 2, s"span anchor width must be >= 2, got $k")
    val base = spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol).as("__id"),
        TextHash.wordHashes(col(textCol)).as("__wh"))
      .localCheckpoint() // reused three times (anchors + both join-backs)
    val anchors = base
      .select(col("__id"),
        posexplode(TextHash.shingleHashes(col("__wh"), k)).as(Seq("__i", "h")))
      .select(col("__id"), (col("__i") + 1).cast("long").as("__pos"), col("h"))
    val wdw = org.apache.spark.sql.expressions.Window.partitionBy("h")
    val capped = anchors.withColumn("__df", count(lit(1)).over(wdw))
      .filter(col("__df") <= maxAnchorDf).drop("__df")
    val cand = capped.as("a").join(capped.as("b"),
        col("a.h") === col("b.h") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("a.__pos").as("pos_a"),
        col("b.__id").as("id_b"), col("b.__pos").as("pos_b"))
    val j = cand
      .join(base.select(col("__id").as("id_a"), col("__wh").as("__ta")), "id_a")
      .join(base.select(col("__id").as("id_b"), col("__wh").as("__tb")), "id_b")
      .filter(col("pos_a") === 1 || col("pos_b") === 1 ||
        !(try_element_at(col("__ta"), (col("pos_a") - 1).cast("int")) <=>
          try_element_at(col("__tb"), (col("pos_b") - 1).cast("int"))))
    // First mismatch offset = exact match length; when both arrays end
    // together no mismatch fires (null <=> null is true), so the bound
    // itself — full overlap — is the answer.
    val bound = least(size(col("__ta")) - col("pos_a"),
      size(col("__tb")) - col("pos_b")) + 1
    // try_element_at: the scan deliberately runs one step past the
    // shorter array (OOB -> null -> mismatch), and ANSI element_at throws.
    val firstMismatch = try_element_at(
      filter(sequence(lit(0), bound), i =>
        !(try_element_at(col("__ta"), (col("pos_a") + i).cast("int")) <=>
          try_element_at(col("__tb"), (col("pos_b") + i).cast("int")))), lit(1))
    val out = j
      .withColumn("match_len",
        coalesce(firstMismatch, bound).cast("long"))
      .filter(col("match_len") >= k)
      .select(col("id_a"), col("id_b"), col("pos_a"), col("pos_b"),
        col("match_len"))
      .localCheckpoint()
    org.apache.spark.sql.GraftSql.freeLocalCheckpoint(base)
    out
  }

  /** Cluster-representative selection — the decision stage that turns
    * near-dup CLUSTERS into a training-set keep-list: group every doc by
    * its duplicate cluster (connected components over `pairs`; docs in no
    * pair are singleton clusters of themselves) and keep the single
    * highest-`scoreCol` member (ties → smallest id, fully deterministic).
    * Emits (idCol, canon_id, rep_id, keep) for EVERY input doc, so the
    * caller can either filter `keep` or audit what was discarded and why.
    *
    * Scale: components cost is [[Components.connectedComponents]]
    * (edge-linear per round); the argmax is ONE `max_by` hash-aggregate
    * keyed by cluster (map-side combined, no sort, no window), and the
    * keep-flag join is cluster-keyed with the O(#clusters) rep table on
    * the build side — AQE broadcasts it when small. */
  def clusterRepresentatives(
      docs: DataFrame, idCol: String, scoreCol: String,
      pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b"): DataFrame = {
    val cc = Components.connectedComponents(pairs, aCol, bCol)
    val base = docs.select(col(idCol), col(scoreCol))
      .join(cc.withColumnRenamed("id", idCol), Seq(idCol), "left_outer")
      .withColumn("canon_id", coalesce(col("comp"), col(idCol)))
      .drop("comp")
    val reps = base.groupBy(col("canon_id"))
      .agg(max_by(col(idCol), struct(col(scoreCol), -col(idCol))).as("rep_id"))
    base.join(reps, "canon_id")
      .select(col(idCol), col("canon_id"), col("rep_id"),
        (col(idCol) === col("rep_id")).as("keep"))
  }

  /** Duplicated-span SCRUB — the removal counterpart of
    * [[duplicatedSpanStats]] (ExactSubstr dedup after Lee et al. 2022):
    * delete every token position covered by a word-`n`-gram span whose
    * hash occurs more than once in the corpus (cross-doc OR repeated
    * within one doc), and reassemble the surviving tokens in order.
    * Emits (idCol, n_tokens, n_kept, scrubbed) for every doc with at
    * least one token; a fully-duplicated doc survives as an empty
    * `scrubbed` string rather than disappearing, so the row count is
    * stable for downstream joins.
    *
    * Scale shape — two linear shuffles, no join-back:
    *  1. tokens + their span-start hashes come from ONE row-local pass
    *     (words / wordHashes / shingleHashes materialized stepwise, per
    *     the interpreted-HOF rule above), then explode to (doc, pos,
    *     tok, h) where `h` is the hash of the span STARTING at pos
    *     (null for the last n-1 positions).
    *  2. span frequency is a COUNT window keyed by hash — but tail
    *     positions (null h) must not pile into one global null
    *     partition, which at corpus scale is (n-1)·docs rows on a
    *     single task. The window key is therefore (h, tailKey) with
    *     tailKey = doc id when h is null: tail rows form per-doc
    *     micro-partitions and their count is never consulted.
    *  3. coverage is a per-doc RANGE window (a position is dropped iff
    *     ANY of the n spans containing it is duplicated), and the final
    *     per-doc rollup reuses the same doc-keyed partitioning.
    *
    * Tokenization is the engine-wide whitespace family ([[TextHash]]),
    * so positions of `words` and `wordHashes` align by construction. */
  def scrubDuplicatedSpans(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int = 5): DataFrame = {
    require(n >= 2, s"span length must be >= 2, got $n")
    import org.apache.spark.sql.expressions.Window
    val base = spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol),
        TextHash.words(col(textCol)).as("__toks"),
        TextHash.wordHashes(col(textCol)).as("__wh"))
      .select(col(idCol), col("__toks"),
        TextHash.shingleHashes(col("__wh"), n).as("__sh"))
    val pos = base
      .select(col(idCol), col("__sh"),
        posexplode(col("__toks")).as(Seq("pos", "tok")))
      .select(col(idCol), col("pos"), col("tok"),
        // try_: tail positions index past the shingle array → null span
        try_element_at(col("__sh"), col("pos") + 1).as("h"))
    val wDf = Window.partitionBy(col("h"),
      when(col("h").isNull, col(idCol)).otherwise(lit(0L)))
    val wCov = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rangeBetween(-(n - 1), Window.currentRow)
    val keep = coalesce(col("__cov"), lit(0)) === 0
    pos
      .withColumn("__dup",
        when(col("h").isNotNull,
          (count(lit(1)).over(wDf) > 1).cast("int")))
      .withColumn("__cov", max(col("__dup")).over(wCov))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(keep.cast("long")).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(keep,
              struct(col("pos"), col("tok"))))),
            x => x("tok")),
          " ").as("scrubbed"))
  }

  /** EXACT all-pairs Jaccard self-join via prefix filtering (the
    * PPJoin-family shape) — the deterministic complement to the LSH path:
    * `lshCandidatePairs` trades recall for speed, this one guarantees
    * EVERY pair with gram-set Jaccard >= thetaNum/thetaDen, no
    * probability involved, which is what a dedup audit or an oracle-grade
    * similarity join needs.
    *
    * Why it scales without an all-pairs product: each doc's distinct
    * `n`-gram hash set is ordered RAREST-FIRST (ascending global document
    * frequency, ties by hash), and only the first
    * `|g| - ceil(θ|g|) + 1` grams — the prefix — are indexed. Two sets
    * with J >= θ MUST share a prefix gram (dropping the prefix leaves
    * fewer than ceil(θ|g|) grams, too few to reach θ), so the candidate
    * join is keyed by prefix gram only; because prefixes hold the rarest
    * grams, bucket sizes track low document frequencies, not corpus
    * size. A size-compatibility bound (θ·max(|a|,|b|) <= min(|a|,|b|))
    * prunes before the distinct. Verification is exact set intersection
    * on candidates only, and the threshold test is integer
    * cross-multiplication — no floats anywhere.
    *
    * Cost: one corpus scan to gram sets, one gram-keyed df aggregate,
    * one prefix-keyed candidate self-join, one verify join — all keyed
    * shuffles. Degenerate corpora (every doc shares the same grams) push
    * prefix buckets toward O(docs); that is the data telling you it IS
    * all-pairs similar, not an algorithmic cliff.
    *
    * Output: (id_a, id_b, n_inter, n_union), id_a < id_b, exact counts. */
  def prefixJaccardJoin(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int = 2, thetaNum: Int = 3, thetaDen: Int = 5): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(thetaNum > 0 && thetaNum <= thetaDen,
      s"theta must be in (0, 1]: got $thetaNum/$thetaDen")
    // Persisted: `ex` feeds BOTH the df aggregate and the ordering join —
    // without the persist the tokenize+shingle subtree runs twice over
    // the corpus (Spark does not share identical scan branches).
    val ex = spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol).as("__id"), TextHash.wordHashes(col(textCol)).as("__wh"))
      .select(col("__id"),
        explode(array_distinct(TextHash.shingleHashes(col("__wh"), n))).as("h"))
      .persist()
    val dfr = ex.groupBy("h").agg(count(lit(1)).as("__df"))
    val ordered = ex.join(dfr, "h")
      .groupBy("__id")
      .agg(transform(array_sort(collect_list(struct(col("__df"), col("h")))),
        s => s.getField("h")).as("__g"))
      .withColumn("__n", size(col("__g")).cast("long"))
      .persist()
    try {
      val prefLen = (col("__n") -
        expr(s"(__n * $thetaNum + ${thetaDen - 1}) div $thetaDen") + 1)
        .cast("int")
      val pfx = ordered.select(col("__id"), col("__n"),
        explode(slice(col("__g"), lit(1), prefLen)).as("h"))
      val cand = pfx
        .select(col("h"), col("__id").as("id_a"), col("__n").as("__na"))
        .join(pfx.select(col("h"), col("__id").as("id_b"),
          col("__n").as("__nb")), "h")
        .filter(col("id_a") < col("id_b") &&
          lit(thetaNum) * greatest(col("__na"), col("__nb")) <=
            lit(thetaDen) * least(col("__na"), col("__nb")))
        .select("id_a", "id_b").distinct()
      val inter = size(array_intersect(col("__ga"), col("__gb"))).cast("long")
      cand
        .join(ordered.select(col("__id").as("id_a"), col("__g").as("__ga"),
          col("__n").as("__sa")), "id_a")
        .join(ordered.select(col("__id").as("id_b"), col("__g").as("__gb"),
          col("__n").as("__sb")), "id_b")
        .withColumn("n_inter", inter)
        .withColumn("n_union", col("__sa") + col("__sb") - col("n_inter"))
        .filter(col("n_inter") * lit(thetaDen) >=
          lit(thetaNum) * col("n_union"))
        .select(col("id_a"), col("id_b"), col("n_inter"), col("n_union"))
        .localCheckpoint()
    } finally { ordered.unpersist(); ex.unpersist(); () }
  }

  /** Exact word-bigram Jaccard VERIFY over the LSH candidate pairs — the
    * production two-stage near-dup: banding proposes (linear shuffle,
    * `lshCandidatePairs`), exact Jaccard disposes. Candidate volume is
    * O(docs × bands) bucket collisions, never a block/cross self-join, so
    * the whole pipeline stays linear in the corpus at 100 TB. The candidate
    * list equi-joins the gram sets on each id — shuffle volume is
    * candidates + grams (both linear); AQE picks broadcast when the
    * candidate side is small enough, plain shuffle-hash when it isn't, so
    * no hint is forced here. Emits (id_a, id_b, jaccard) for candidates
    * with jaccard >= minJaccard. */
  /** Sorted-neighborhood blocking + exact Jaccard verify — the classic
    * record-linkage alternative to LSH: sort the corpus by a normalized
    * key (whitespace-collapsed lowercase 24-char prefix + id tie-break),
    * pair each doc with the `w-1` docs that FOLLOW it in sort order, and
    * keep pairs whose word-bigram Jaccard ≥ `minJaccard`. Catches
    * prefix-sharing near-dups (boilerplate headers, template pages) that
    * hash-bucket methods only find probabilistically; misses dups whose
    * difference is inside the key — run it alongside LSH, not instead.
    *
    * Scale shape: the global rank stays COLUMNAR end to end —
    * `repartitionByRange` on the sort key spreads the corpus into
    * key-ordered partitions, a per-partition window (`partitionBy` the
    * materialized partition id — full parallelism, never a 1-partition
    * window) numbers rows locally, and a partition-count aggregate
    * (#partitions rows, the only driver traffic — the same bound
    * `zipWithIndex` had, without leaving Tungsten) turns local numbers
    * into global ranks via cumulative offsets joined back broadcast.
    * Candidate pairing is an EQUI-join: each row joins block
    * `rank div (w-1)` and its successor block, then filters to
    * `1 ≤ rank_b - rank_a ≤ w-1` — never a range/nested-loop join.
    * Output volume ≤ docs × (w-1); verify cost is candidates only. */
  def sortedNeighborhoodPairs(
      docs: DataFrame, idCol: String, textCol: String,
      w: Int = 5, minJaccard: Double = 0.05): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(w >= 2, s"window must be >= 2, got $w")
    val keyed = docs.select(col(idCol), col(textCol),
      substring(lower(regexp_replace(col(textCol), "\\s+", " ")), 1, 24)
        .as("__k"))
    // localCheckpoint BEFORE the two consumers: range boundaries come
    // from a sampling pass, so the counts job and the main job must
    // see the SAME partitioning — and a persist is only a HINT; an
    // evicted/recomputed cache re-samples different boundaries against
    // the already-collected offsets (see RankEval.averagePrecision,
    // found at the 10× probe). Checkpointing pins rows + partitioning.
    val parted = keyed
      .repartitionByRange(col("__k"), col(idCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val ranked = try {
      val counts = parted.groupBy(col("__pid"))
        .agg(count(lit(1)).as("__c"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      // exclusive prefix sum in ascending pid order (empty partitions
      // are absent from the aggregate and contribute 0 anyway)
      val offsets = counts.map(_._1)
        .zip(counts.map(_._2).scanLeft(0L)(_ + _).init).toSeq
      val offDf = parted.sparkSession
        .createDataFrame(offsets).toDF("__pid", "__off")
      // range partitions are key-ordered, so offset(pid) + local rank is
      // the global (__k, id) rank; the window exchange re-clusters by
      // __pid but re-sorts each group by the same key, preserving order
      parted.join(broadcast(offDf), "__pid")
        .withColumn("__rank",
          col("__off") + row_number().over(
            Window.partitionBy(col("__pid"))
              .orderBy(col("__k"), col(idCol))) - 1L)
        .drop("__pid", "__off")
    } catch {
      case e: Throwable =>
        org.apache.spark.sql.GraftSql.freeLocalCheckpoint(parted); throw e
    }
    try {
      val dist = w - 1
      val a = ranked.select(col(idCol).as("id_a"), col("__rank").as("__ra"),
          explode(array(expr(s"__rank div $dist"),
            expr(s"__rank div $dist + 1"))).as("__blk"))
      val b = ranked.select(col(idCol).as("id_b"), col("__rank").as("__rb"),
          expr(s"__rank div $dist").as("__blk"))
      val cand = a.join(b, "__blk")
        .filter(col("__rb") > col("__ra") && col("__rb") <= col("__ra") + dist)
        .select(col("id_a"), col("id_b"))
      val grams = gramSets(ranked.drop("__k", "__rank"), idCol, textCol)
      val ga = grams.select(col(idCol).as("id_a"), col("grams").as("g_a"))
      val gb = grams.select(col(idCol).as("id_b"), col("grams").as("g_b"))
      val inter = size(array_intersect(col("g_a"), col("g_b"))).cast("double")
      val union = size(array_union(col("g_a"), col("g_b"))).cast("double")
      cand.join(ga, "id_a").join(gb, "id_b")
        .withColumn("jaccard",
          when(union > 0, inter / union).otherwise(lit(0.0)))
        .where(col("jaccard") >= minJaccard)
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .localCheckpoint()
    } finally {
      org.apache.spark.sql.GraftSql.freeLocalCheckpoint(parted); ()
    }
  }

  /** Containment-scored near-dup verify — the asymmetric companion to
    * [[ngramJaccardVerify]] for SUBSET duplication (a short doc quoted
    * wholesale inside a long one scores near-zero Jaccard but
    * containment ≈ 1): scores each LSH candidate pair by
    * `|A∩B| / min(|A|,|B|)` over distinct word-bigram sets.
    *
    * Caveat by construction: candidates come from the same MinHash
    * banding, which recalls by JACCARD — a contained-but-tiny doc inside
    * a huge one may never become a candidate. This is the
    * verify-on-candidates trade every two-stage pipeline makes; pair it
    * with [[decontaminate]] (shingle-hit counting) when the contained
    * side is a known small set that can be broadcast.
    *
    * Scale: identical shape to the Jaccard verify — banding proposes
    * (linear), row-local set arithmetic disposes on candidates only. */
  def containmentVerify(
      docs: DataFrame, idCol: String, textCol: String,
      m: Int = 8, n: Int = 3, r: Int = 2,
      minContainment: Double = 0.05): DataFrame = {
    val cand = lshCandidatePairs(docs, idCol, textCol, m, n, r)
    val grams = gramSets(docs, idCol, textCol)
    val ga = grams.select(col(idCol).as("id_a"), col("grams").as("g_a"))
    val gb = grams.select(col(idCol).as("id_b"), col("grams").as("g_b"))
    val inter = size(array_intersect(col("g_a"), col("g_b"))).cast("double")
    val smaller = least(size(col("g_a")), size(col("g_b"))).cast("double")
    cand.join(ga, "id_a").join(gb, "id_b")
      .withColumn("containment",
        when(smaller > 0, inter / smaller).otherwise(lit(0.0)))
      .where(col("containment") >= minContainment)
      .select(col("id_a"), col("id_b"), col("containment"))
  }

  def ngramJaccardVerify(
      docs: DataFrame, idCol: String, textCol: String,
      m: Int = 8, n: Int = 3, r: Int = 2,
      minJaccard: Double = 0.01): DataFrame = {
    val cand = lshCandidatePairs(docs, idCol, textCol, m, n, r)
    val grams = gramSets(docs, idCol, textCol)
    val ga = grams.select(col(idCol).as("id_a"), col("grams").as("g_a"))
    val gb = grams.select(col(idCol).as("id_b"), col("grams").as("g_b"))
    val inter = size(array_intersect(col("g_a"), col("g_b"))).cast("double")
    val union = size(array_union(col("g_a"), col("g_b"))).cast("double")
    // LSH candidates always have >= n words, so gram sets are non-empty;
    // the zero guard keeps the expression total anyway.
    cand.join(ga, "id_a").join(gb, "id_b")
      .withColumn("jaccard", when(union > 0, inter / union).otherwise(lit(0.0)))
      .where(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Blocking-quality pre-flight over the LSH band index — the numbers
    * you tune (m, r) by BEFORE paying for a candidate join: how many
    * blocks, how many candidate COMPARISONS they will generate
    * (`Σ c·(c−1)/2` over block sizes — pairs sharing several bands count
    * once per band, because each one is a real comparison the verify
    * stage pays for), the biggest block (the skew hazard), and the
    * reduction ratio vs the all-pairs N·(N−1)/2 baseline.
    *
    * Emits one row: (n_blocks, n_assignments, sum_pairs, max_block,
    * n_docs, reduction_ratio). Counts exact BIGINTs off the block-size
    * aggregate; the ratio is the single final float (NULL under 2
    * docs). Scale: one hash aggregate over the band index to O(blocks)
    * rows, one O(blocks) rollup, one broadcast 1-row crossJoin —
    * strictly cheaper than the join it predicts. */
  def blockingStats(
      docs: DataFrame, idCol: String, textCol: String,
      m: Int = 8, n: Int = 3, r: Int = 2): DataFrame = {
    val blk = lshBandIndex(docs, idCol, textCol, m, n, r)
      .groupBy(col("band"), col("key")).agg(count(lit(1)).as("__c"))
    val mtr = blk.agg(count(lit(1)).as("n_blocks"),
      coalesce(sum(col("__c")), lit(0L)).as("n_assignments"),
      coalesce(sum(expr("__c * (__c - 1) div 2")), lit(0L)).as("sum_pairs"),
      coalesce(max(col("__c")), lit(0L)).as("max_block"))
    val nd = docs.agg(count(lit(1)).as("n_docs"))
    mtr.crossJoin(broadcast(nd))
      .select(col("n_blocks"), col("n_assignments"), col("sum_pairs"),
        col("max_block"), col("n_docs"),
        when(col("n_docs") < 2L, lit(null).cast("double"))
          .otherwise(lit(1.0) - col("sum_pairs").cast("double") /
            (col("n_docs").cast("double") *
              (col("n_docs") - 1L).cast("double") / lit(2.0)))
          .as("reduction_ratio"))
  }

  /** One content-defined chunk. */
  final case class CdcChunk(
      id: Long, chunk_idx: Long, start: Long, len: Long, chunk_md5: String)

  private val CdcMod = 4294967296L // 2^32

  /** Rabin-style gear value of an unsigned byte — a fixed multiplicative
    * mix, shared in closed form with the oracle. */
  private[graft] def cdcGear(b: Int): Long =
    (2654435761L * (b + 1)) % CdcMod

  /** Content-defined chunking — the FILE-level dedup primitive
    * (rsync/LBFS lineage): chunk boundaries fall where a rolling hash
    * of the LAST `window` bytes hits 0 mod `divisor`, so an insertion
    * shifts only the chunks it touches — byte-offset chunking would
    * shift every later chunk and defeat dedup entirely. Boundary test:
    * H_i = (Σ_{k<window} gear(b_{i−k})·2^k) mod 2³² ≡ 0 mod divisor —
    * position-LOCAL (a fixed-window Rabin fingerprint, the classic CDC
    * definition), so the oracle can replay it per position; expected
    * chunk length = divisor bytes. Emits per chunk
    * (id, chunk_idx, start, len, chunk_md5) over the UTF-8 bytes;
    * recurring chunk_md5 across the corpus = shared content.
    *
    * Scale: row-local kernel (one pass per doc), no shuffle; the
    * downstream dedup is one md5-keyed aggregate. */
  def cdcChunks(
      docs: DataFrame, idCol: String, textCol: String,
      window: Int = 8, divisor: Long = 64L,
      batchSize: Int = 64): DataFrame = {
    require(window >= 2 && window <= 64, s"bad window $window")
    require(divisor >= 2, s"bad divisor $divisor")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.grouped(batchSize).flatMap { g =>
        val md = java.security.MessageDigest.getInstance("MD5")
        g.flatMap { case (id, text) =>
          val b = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          if (b.length == 0) Nil
          else {
            val out = scala.collection.mutable.ArrayBuffer.empty[CdcChunk]
            var start = 0
            var idx = 0L
            def close(endExcl: Int): Unit = {
              md.reset()
              md.update(b, start, endExcl - start)
              out += CdcChunk(id, idx, start.toLong,
                (endExcl - start).toLong,
                md.digest().map("%02x".format(_)).mkString)
              idx += 1L
              start = endExcl
            }
            var i = 0
            while (i < b.length) {
              if (i >= window - 1) {
                var h = 0L
                var k = 0
                while (k < window) {
                  // reduce each term mod 2^32: Long ops are mod 2^64 and
                  // (x mod 2^64) mod 2^32 = x mod 2^32, so masking the
                  // shifted term keeps the documented H_i formula exact
                  // for every window <= 64 (unmasked, gear<<k overflows
                  // once k >= 32)
                  h = (h + ((cdcGear(b(i - k) & 0xff) << k) &
                    (CdcMod - 1L))) & (CdcMod - 1L)
                  k += 1
                }
                if (h % divisor == 0L) close(i + 1)
              }
              i += 1
            }
            if (start < b.length) close(b.length)
            out.toSeq
          }
        }
      })
      .toDF()
  }
}
