package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** Distinct-count sketching — bounded-memory cardinality estimation for
  * corpus statistics (distinct tokens per language, distinct urls per
  * domain) where the exact distinct set is too large to hold but a few
  * percent of error is fine.
  *
  * Two sketch families, same hash source, different trade-offs:
  *
  *  - KMV (k-minimum-values): keep the k smallest hash values of the
  *    distinct items; the k-th smallest hash `m` estimates cardinality as
  *    `(k-1) · P / m` (hashes uniform on [0, P)). Union = k smallest of
  *    the concatenation; error ~1/√k. Costs one distinct shuffle on
  *    (group, hash) — the per-group state after the distinct is the k
  *    minima, not the distinct set — and the sketch doubles as a
  *    set-overlap estimator ([[kmvJaccard]]), something HLL registers
  *    cannot do.
  *  - HyperLogLog ([[hllSketchTokens]]): m max-rank registers. NO
  *    distinct shuffle at all — `max` is duplicate-insensitive, so the
  *    whole build is one map-side-combinable aggregate whose
  *    post-shuffle volume is ≤ m rows per group regardless of corpus
  *    size; union = elementwise register max ([[hllMerge]]). The cheaper
  *    build at scale; intersections need inclusion-exclusion on
  *    estimates (noisier than KMV's union-sketch route).
  *
  * Both are deterministic functions of the item set through the engine's
  * shared `TextHash` family — reproducible across runs, partitionings,
  * AND engines, so the driver's DuckDB oracle hash-gates them exactly.
  * (Spark's own `approx_count_distinct` HLL++ is register-layout-private
  * and unverifiable cross-engine; pinning registers to the public hash
  * family is what makes this one oracle-checkable.) */
object Sketches {

  /** Raw per-group KMV sketch: (groupCols..., minima) where `minima` is
    * the ascending array of the k smallest distinct permuted token
    * hashes. This is the MERGEABLE form — the union sketch of several
    * groups is the k smallest of their concatenated minima
    * ([[kmvMerge]]), so rollups (per-day → per-month, per-source →
    * per-lang) never rescan the text. Sketch rows are O(k) each. */
  def kmvSketchTokens(
      docs: DataFrame, groupCols: Seq[String], textCol: String,
      k: Int = 64): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(groupCols.map(col) :+
        explode(TextHash.wordHashes(lower(col(textCol)))).as("__h0"): _*)
      .select(groupCols.map(col) :+ TextHash.permute(0, col("__h0")).as("h"): _*)
      .distinct()
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("h"))
    toks
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(col("h"))).as("minima"))
  }

  /** Merge sketches down to a coarser grouping: k smallest distinct
    * values of the concatenated minima — identical to sketching the
    * union directly (spec + gate prove it), at O(sketch rows × k) cost
    * with no text rescan. */
  def kmvMerge(
      sketches: DataFrame, groupCols: Seq[String], k: Int = 64): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("h"))
    sketches
      .select(groupCols.map(col) :+ explode(col("minima")).as("h"): _*)
      .distinct()
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(col("h"))).as("minima"))
  }

  /** Scalar estimator over a minima array: exact below k,
    * `(k-1)·P / kth-min` at k. Deterministic — one double division on
    * hash-exact inputs, so engines agree bit-for-bit. */
  private def estFromMinima(c: org.apache.spark.sql.Column, k: Int) =
    when(size(c) < k, size(c).cast("double"))
      .otherwise(lit((k - 1).toDouble * TextHash.P) / element_at(c, k))

  /** Pairwise set-overlap estimates between groups, from their KMV
    * sketches ALONE — no text rescan, no pairwise token join: the union
    * sketch of two groups is the k smallest of their concatenated minima
    * (the same property [[kmvMerge]] relies on), and
    * |A∩B| = |A| + |B| - |A∪B| by inclusion-exclusion. Emits one row per
    * unordered group pair: (g_a, g_b, est_a, est_b, est_union,
    * est_intersect, jaccard_est).
    *
    * Scale: the sketch table has one O(k) row per group, so the pair
    * join is over #groups rows (broadcast nested-loop on the `<`
    * condition) — cost is #pairs × k, independent of corpus size. Error
    * follows the KMV ~1/√k bound on each of the three estimates. */
  def kmvJaccard(sketches: DataFrame, groupCol: String,
      k: Int = 64): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val a = sketches.select(col(groupCol).as("g_a"), col("minima").as("m_a"))
    val b = sketches.select(col(groupCol).as("g_b"), col("minima").as("m_b"))
    a.join(b, col("g_a") < col("g_b"))
      .withColumn("__u",
        slice(array_sort(array_distinct(concat(col("m_a"), col("m_b")))),
          1, k))
      .select(col("g_a"), col("g_b"),
        estFromMinima(col("m_a"), k).as("est_a"),
        estFromMinima(col("m_b"), k).as("est_b"),
        estFromMinima(col("__u"), k).as("est_union"))
      .withColumn("est_intersect",
        greatest(lit(0.0), col("est_a") + col("est_b") - col("est_union")))
      .withColumn("jaccard_est",
        when(col("est_union") > 0, col("est_intersect") / col("est_union"))
          .otherwise(lit(0.0)))
  }

  /** Cardinality estimate columns from a sketch's `minima` array:
    * (n_kept, est_distinct) — exact below k, `(k-1)·P / kth-min` at k. */
  def kmvEstimate(df: DataFrame, k: Int = 64): DataFrame =
    df.select(df.columns.filter(_ != "minima").map(col).toSeq :+
      size(col("minima")).cast("long").as("n_kept") :+
      when(size(col("minima")) < k, size(col("minima")).cast("double"))
        .otherwise(lit((k - 1).toDouble * TextHash.P) /
          element_at(col("minima"), k))
        .as("est_distinct"): _*)

  /** Per-group distinct-token KMV sketch over whitespace tokens of
    * `lower(textCol)`. Emits one row per group:
    * (groupCol, n_exact, n_kept, est_distinct) — `n_exact` (the true
    * distinct count, a free byproduct of the same pass) lets callers and
    * specs measure the estimate's error directly. Groups with fewer than
    * `k` distinct tokens estimate exactly. */
  def kmvDistinctTokens(
      docs: DataFrame, groupCol: String, textCol: String,
      k: Int = 64): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    import org.apache.spark.sql.expressions.Window
    // The raw polynomial hash of SHORT tokens is range-bounded (a 5-char
    // token folds to < 31^5·7, far below P), which wrecks the uniformity
    // KMV's estimator assumes. The affine permutation (h·a + b mod P) —
    // the same mixing MinHash applies to shingle hashes — spreads the
    // clustered values across the full [0, P) range.
    val toks = docs
      .select(col(groupCol),
        explode(TextHash.wordHashes(lower(col(textCol)))).as("__h0"))
      .select(col(groupCol), TextHash.permute(0, col("__h0")).as("h"))
      .distinct()
    val w = Window.partitionBy(col(groupCol)).orderBy(col("h"))
    toks
      .withColumn("__rn", row_number().over(w))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_exact"),
        sum(when(col("__rn") <= k, 1L).otherwise(0L)).as("n_kept"),
        max(when(col("__rn") <= k, col("h"))).as("__kth"))
      .select(col(groupCol), col("n_exact"), col("n_kept"),
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble * TextHash.P) / col("__kth"))
          .as("est_distinct"))
  }

  // ---- HyperLogLog over the shared hash family ---------------------------

  /** Register-value width: the permuted hash is uniform on [0, P), the low
    * log2(m) bits pick the register, and the remaining `hllW(m)` bits feed
    * the leading-zero rank, so ranks live in [1, hllW(m)+1].
    *
    * Known small bias (accepted, like the omitted linear-counting
    * correction): P is prime, not a power of two, so the post-bucket
    * remainder `h div m` is uniform on [0, (P-1) div m] ≈ 0.93·2^hllW —
    * the top rank values are slightly over-likely (e.g. P(rank=1) ≈
    * 0.466 rather than 0.5 at m=64). This is a systematic few-percent
    * cardinality skew on TOP of the standard ±1.04/√m HLL error; both
    * engines compute the identical estimate, so the oracle gate is
    * unaffected. Folding the hash into a power-of-two range would
    * remove it at the cost of a second multiply-shift stage. */
  def hllW(m: Int): Int = 64 - java.lang.Long.numberOfLeadingZeros(
    (TextHash.P - 1) / m)

  /** Bias constant of the raw HLL estimator (Flajolet et al. 2007). */
  def hllAlpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** Rank of a post-bucket hash remainder `x` (a `hllW(m)`-bit value):
    * leading zeros + 1, computed with pure integer/string ops —
    * `length(bin(x))` is the bit length of a positive BIGINT in Spark AND
    * DuckDB, so the oracle mirrors this exactly (no float log2 anywhere
    * near a power-of-two boundary). */
  private def hllRank(x: org.apache.spark.sql.Column, m: Int) =
    when(x === 0, lit(hllW(m) + 1))
      .otherwise(lit(hllW(m) + 1) - length(bin(x)))

  private def hllAssemble(
      grouped: DataFrame, groupCols: Seq[String], m: Int): DataFrame =
    grouped
      .groupBy(groupCols.map(col): _*)
      .agg(map_from_entries(collect_list(struct(col("__b"), col("__r"))))
        .as("__mm"))
      .select(groupCols.map(col) :+
        transform(sequence(lit(0L), lit((m - 1).toLong)),
          b => coalesce(element_at(col("__mm"), b), lit(0)).cast("int"))
          .as("registers"): _*)

  /** Per-group HLL registers over whitespace tokens of `lower(textCol)`:
    * (groupCols..., registers) with `registers` the length-m array of
    * max leading-zero ranks (0 = register never touched).
    *
    * Scale shape — the reason to pick this over [[kmvSketchTokens]] at
    * 100 TB: no `distinct` materialization of the token universe. `max`
    * absorbs duplicates, so the build is ONE aggregate keyed by
    * (group, register) with map-side combine; at most m rows per group
    * cross the shuffle no matter how many tokens scanned. */
  def hllSketchTokens(
      docs: DataFrame, groupCols: Seq[String], textCol: String,
      m: Int = 64): DataFrame = {
    require(m >= 16 && (m & (m - 1)) == 0, s"m must be a power of two >= 16, got $m")
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val toks = docs
      .select(groupCols.map(col) :+
        explode(TextHash.wordHashes(lower(col(textCol)))).as("__h0"): _*)
      .select(groupCols.map(col) :+ TextHash.permute(0, col("__h0")).as("__h"): _*)
    hllAssemble(
      toks
        .select(groupCols.map(col) :+ (col("__h") % m).as("__b") :+
          hllRank(expr(s"__h div $m"), m).as("__rk"): _*)
        .groupBy(groupCols.map(col) :+ col("__b"): _*)
        .agg(max(col("__rk")).as("__r")),
      groupCols, m)
  }

  /** Streaming windowed HLL over an integral id column (distinct users
    * per window without DISTINCT state): per-(window, group, register)
    * max rank as ONE watermarked streaming aggregate — `max` is
    * duplicate-insensitive, so micro-batch increments need no distinct
    * tracking and state per window is ≤ m register rows per group.
    * Emits (window_start_us, groupCols..., hb, hr); upsert keyed by
    * (window, group, hb) with `hr` as the version (the max rank only
    * grows), then [[hllFromRegisterRows]] + [[hllEstimate]] on the
    * completed windows. */
  def hllSketchIdsWindowed(
      src: DataFrame, tsCol: String, groupCols: Seq[String],
      idColumn: String, windowDur: String, watermarkDelay: String,
      m: Int = 64): DataFrame = {
    require(m >= 16 && (m & (m - 1)) == 0, s"m must be a power of two >= 16, got $m")
    src.where(col(idColumn).isNotNull)
      .withColumn("__h", TextHash.permute(0, col(idColumn)))
      .withColumn("__b", col("__h") % m)
      .withColumn("__rk", hllRank(expr(s"__h div $m"), m))
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur).as("__w") +:
        (groupCols.map(col) :+ col("__b")): _*)
      .agg(max(col("__rk")).as("__r"))
      .select(unix_micros(col("__w.start")).as("window_start_us") +:
        (groupCols.map(col) :+ col("__b").as("hb") :+ col("__r").as("hr")): _*)
  }

  /** Batch HLL registers over an integral id column — the batch twin of
    * [[hllSketchIdsWindowed]] (distinct ids per group with NO distinct
    * shuffle): one map-side-combinable (group, register) max aggregate,
    * state ≤ m rows per group. */
  def hllSketchIds(
      df: DataFrame, groupCols: Seq[String], idColumn: String,
      m: Int = 64): DataFrame = {
    require(m >= 16 && (m & (m - 1)) == 0, s"m must be a power of two >= 16, got $m")
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    hllAssemble(
      df.where(col(idColumn).isNotNull)
        .withColumn("__h", TextHash.permute(0, col(idColumn)))
        .select(groupCols.map(col) :+ (col("__h") % m).as("__b") :+
          hllRank(expr(s"__h div $m"), m).as("__rk"): _*)
        .groupBy(groupCols.map(col) :+ col("__b"): _*)
        .agg(max(col("__rk")).as("__r")),
      groupCols, m)
  }

  /** Set-overlap estimates between two named sketch rows by
    * inclusion–exclusion: |A∩B| ≈ est(A) + est(B) − est(A∪B), with the
    * union sketch the elementwise register max (exactly the sketch of
    * the union — no rescan). ONE row out:
    * (est_a, est_b, est_union, est_intersect).
    *
    * The intersection estimate inherits HLL's relative error on each
    * term, so small overlaps between large sets can even go negative —
    * emitted raw (deterministic; clamp at the call site if a
    * non-negative display value is wanted). Both inputs are single
    * sketch rows (≤ m longs), so the crossJoins are trivially broadcast.
    * `m` must match the build (execution-time checked). */
  def hllIntersect(
      sketches: DataFrame, keyCol: String, a: String, b: String,
      m: Int = 64): DataFrame = {
    val checked = requireWidth(sketches, "registers", m,
      "hllIntersect", s"m=$m")
    val ra = checked.where(col(keyCol) === a)
      .select(col("registers").as("__ra"))
    val rb = checked.where(col(keyCol) === b)
      .select(col("registers").as("__rb"))
    val three = ra.crossJoin(rb).select(
      explode(array(
        struct(lit("a").as("__k"), col("__ra").as("registers")),
        struct(lit("b").as("__k"), col("__rb").as("registers")),
        struct(lit("u").as("__k"),
          zip_with(col("__ra"), col("__rb"),
            (x, y) => greatest(x, y)).as("registers")))).as("__s"))
      .select(col("__s.__k").as("__k"), col("__s.registers").as("registers"))
    hllEstimate(three, m)
      .groupBy()
      .agg(
        max(when(col("__k") === "a", col("est_distinct"))).as("est_a"),
        max(when(col("__k") === "b", col("est_distinct"))).as("est_b"),
        max(when(col("__k") === "u", col("est_distinct"))).as("est_union"))
      .withColumn("est_intersect",
        col("est_a") + col("est_b") - col("est_union"))
  }

  /** Assemble a registers array from stored (groupCols..., hb, hr) rows —
    * the read-back half of the streaming HLL path. */
  def hllFromRegisterRows(
      rows: DataFrame, groupCols: Seq[String], m: Int = 64): DataFrame =
    hllAssemble(
      rows.select(groupCols.map(col) :+ col("hb").as("__b") :+
        col("hr").as("__r"): _*),
      groupCols, m)

  /** Runtime width check on a sketch column: `m` is a caller-supplied
    * contract (deriving it with a `head()` would execute the whole build
    * lineage twice), so a mismatched sketch must fail loud at execution,
    * not silently truncate to the first m entries. `assert_true` returns
    * NULL on pass — the filter keeps every row — and raises on the first
    * violation. Cost: one `size()` per sketch row. */
  private def requireWidth(
      df: DataFrame, c: String, m: Int, fn: String, param: String) =
    df.filter(assert_true(size(col(c)) === m,
      lit(s"$fn: '$c' length differs from the $param this merge was " +
        "called with — pass the same parameters the sketch was built " +
        "with")).isNull)

  /** Merge sketches down to a coarser grouping: elementwise register max —
    * identical to sketching the union directly (spec-proven), at
    * O(sketch rows × m) cost with no text rescan. `m` must match the
    * build (execution-time checked; a mismatch fails loud). */
  def hllMerge(
      sketches: DataFrame, groupCols: Seq[String], m: Int = 64): DataFrame =
    hllAssemble(
      requireWidth(sketches, "registers", m, "hllMerge", s"m=$m")
        .select(groupCols.map(col) :+
          posexplode(col("registers")).as(Seq("__p", "__rk")): _*)
        .select(groupCols.map(col) :+ col("__p").cast("long").as("__b") :+
          col("__rk"): _*)
        .groupBy(groupCols.map(col) :+ col("__b"): _*)
        .agg(max(col("__rk")).as("__r")),
      groupCols, m)

  // ---- Bloom filter over the shared hash family --------------------------

  /** The `kHashes` bit positions of one raw token hash: the same affine
    * permutation family MinHash uses (`TextHash.permute(j, ·)`), reduced
    * mod `mBits` — pure integer ops, replayed exactly by the oracle. */
  private def bloomPositions(h: Column, mBits: Int, kHashes: Int): Column =
    array((0 until kHashes).map(j => TextHash.permute(j, h) % mBits): _*)

  private def bitsAssemble(
      grouped: DataFrame, groupCols: Seq[String], words: Int): DataFrame =
    grouped
      .groupBy(groupCols.map(col): _*)
      .agg(map_from_entries(collect_list(struct(col("__w"), col("__m"))))
        .as("__mm"))
      .select(groupCols.map(col) :+
        transform(sequence(lit(0L), lit((words - 1).toLong)),
          w => coalesce(element_at(col("__mm"), w), lit(0L)))
          .as("bits"): _*)

  /** Per-group Bloom-filter bitmap over whitespace tokens of
    * `lower(textCol)`: (groupCols..., bits) with `bits` an array of
    * mBits/64 BIGINT words. THE join-pruning sketch: ship a group's
    * membership structure (8 KiB at the default 2^16 bits) instead of its
    * token set, with zero false negatives and a tunable false-positive
    * rate (~(1-e^(-k·n/m))^k).
    *
    * Scale shape: like [[hllSketchTokens]], NO distinct shuffle — BIT_OR
    * absorbs duplicate positions in the map-side partial aggregate, so at
    * most mBits/64 rows per group cross the wire. Union = elementwise OR
    * ([[bloomMerge]]), so per-shard filters roll up without rescanning
    * text. */
  def bloomSketchTokens(
      docs: DataFrame, groupCols: Seq[String], textCol: String,
      mBits: Int = 65536, kHashes: Int = 3): DataFrame = {
    require(mBits >= 64 && mBits % 64 == 0, s"mBits must be a multiple of 64, got $mBits")
    require(kHashes >= 1, s"kHashes must be >= 1, got $kHashes")
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val toks = docs
      .select(groupCols.map(col) :+
        explode(TextHash.wordHashes(lower(col(textCol)))).as("__h0"): _*)
      .select(groupCols.map(col) :+
        explode(bloomPositions(col("__h0"), mBits, kHashes)).as("__p"): _*)
    bitsAssemble(
      toks
        .select(groupCols.map(col) :+ expr("__p div 64").as("__w") :+
          call_function("shiftleft", lit(1L),
            (col("__p") % 64).cast("int")).as("__m0"): _*)
        .groupBy(groupCols.map(col) :+ col("__w"): _*)
        .agg(expr("bit_or(__m0)").as("__m")),
      groupCols, mBits / 64)
  }

  /** Streaming windowed Bloom-filter build over integral ids — the
    * membership sibling of [[hllSketchIdsWindowed]] (distinct counts)
    * and [[cmsSketchIdsWindowed]] (frequencies): per (window,
    * groupCols), which ids APPEARED, in fixed memory, probeable after
    * the window closes ("was this user active on day D?" without
    * storing the id set). Emits (window_start_us, groupCols..., bw, bm,
    * bn): word index, word mask, and the mask's popcount.
    *
    * BIT_OR is the streaming aggregate — commutative AND idempotent, so
    * late or duplicate arrivals within the watermark only re-set the
    * same bits. `bn` (bit_count of the word) is the MONOTONE version
    * column for the latest-wins sink: the raw mask is unusable as a
    * version because setting bit 63 flips its sign, while popcount only
    * grows as bits accumulate — and equal popcounts imply equal masks
    * along one word's accumulation history, so no tie-break is needed.
    * State per group-window is ≤ mBits/64 word rows. */
  def bloomSketchIdsWindowed(
      src: DataFrame, tsCol: String, groupCols: Seq[String],
      idColumn: String, windowDur: String, watermarkDelay: String,
      mBits: Int = 4096, kHashes: Int = 3): DataFrame = {
    require(mBits >= 64 && mBits % 64 == 0,
      s"mBits must be a multiple of 64, got $mBits")
    require(kHashes >= 1, s"kHashes must be >= 1, got $kHashes")
    src.where(col(idColumn).isNotNull)
      .withColumn("__h0", col(idColumn).cast("long"))
      .withColumn("__p", explode(bloomPositions(col("__h0"), mBits, kHashes)))
      .withColumn("__wd", expr("__p div 64"))
      .withColumn("__m0", call_function("shiftleft", lit(1L),
        (col("__p") % 64).cast("int")))
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur).as("__w") +:
        (groupCols.map(col) :+ col("__wd")): _*)
      .agg(expr("bit_or(__m0)").as("bm"))
      .select(unix_micros(col("__w.start")).as("window_start_us") +:
        (groupCols.map(col) :+ col("__wd").as("bw") :+ col("bm") :+
          bit_count(col("bm")).cast("long").as("bn")): _*)
  }

  /** Assemble a bits array from stored (groupCols..., bw, bm) word rows —
    * the read-back half of the streaming Bloom path. */
  def bloomFromWordRows(
      rows: DataFrame, groupCols: Seq[String],
      mBits: Int = 4096): DataFrame = {
    require(mBits >= 64 && mBits % 64 == 0,
      s"mBits must be a multiple of 64, got $mBits")
    bitsAssemble(
      rows.select(groupCols.map(col) :+ col("bw").as("__w") :+
        col("bm").as("__m"): _*),
      groupCols, mBits / 64)
  }

  /** Probe integral ids against every group's bitmap — the id twin of
    * [[bloomContains]]: (groupCols..., probe_id, maybe_contains), true
    * iff ALL k bit positions are set (zero false negatives). */
  def bloomContainsIds(
      sketches: DataFrame, groupCols: Seq[String], probeIds: Seq[Long],
      mBits: Int = 4096, kHashes: Int = 3): DataFrame = {
    require(probeIds.nonEmpty, "need at least one probe id")
    val pp = sketches.sparkSession
      .createDataFrame(probeIds.map(Tuple1(_))).toDF("probe_id")
      .withColumn("__h0", col("probe_id"))
      .select(col("probe_id"),
        bloomPositions(col("__h0"), mBits, kHashes).as("__ps"))
    sketches.crossJoin(broadcast(pp))
      .select(groupCols.map(col) :+ col("probe_id") :+
        forall(col("__ps"), p =>
          call_function("shiftright",
            element_at(col("bits"), (shiftright(p, 6) + 1).cast("int")),
            (p % 64).cast("int")).bitwiseAND(lit(1L)) === 1L)
          .as("maybe_contains"): _*)
  }

  /** Merge bloom bitmaps to a coarser grouping: elementwise OR —
    * identical to sketching the union directly (spec + gate prove it).
    * `mBits` must match the build (execution-time checked — deriving the
    * width with a `head()` would run the whole build lineage twice). */
  def bloomMerge(
      sketches: DataFrame, groupCols: Seq[String],
      mBits: Int = 65536): DataFrame = {
    require(mBits >= 64 && mBits % 64 == 0, s"mBits must be a multiple of 64, got $mBits")
    bitsAssemble(
      requireWidth(sketches, "bits", mBits / 64, "bloomMerge", s"mBits=$mBits")
        .select(groupCols.map(col) :+
          posexplode(col("bits")).as(Seq("__pw", "__b")): _*)
        .select(groupCols.map(col) :+ col("__pw").cast("long").as("__w") :+
          col("__b"): _*)
        .groupBy(groupCols.map(col) :+ col("__w"): _*)
        .agg(expr("bit_or(__b)").as("__m")),
      groupCols, mBits / 64)
  }

  /** Popcount summary of a bitmap sketch: (…, n_bits_set) — the merge
    * gate's scalar form, and the input to the standard fill-ratio
    * false-positive estimate. */
  def bloomBitsSet(df: DataFrame): DataFrame =
    df.select(df.columns.filter(_ != "bits").map(col).toSeq :+
      aggregate(col("bits"), lit(0L),
        (a, x) => a + bit_count(x).cast("long")).as("n_bits_set"): _*)

  /** Probe every `probes` word against every group's bitmap:
    * (groupCols..., word, maybe_contains). `maybe_contains` is true iff
    * ALL k bit positions of the word are set — never a false negative for
    * tokens that entered the sketch. Cost: |probes| × |groups| row-local
    * bit tests on the (tiny) sketch table; the corpus is never touched. */
  def bloomContains(
      sketches: DataFrame, groupCols: Seq[String], probes: DataFrame,
      wordCol: String, mBits: Int = 65536, kHashes: Int = 3): DataFrame = {
    val ph = probes.select(col(wordCol).as("word"),
      TextHash.wordHash(lower(col(wordCol))).as("__h0"))
    val pp = ph.select(col("word"),
      bloomPositions(col("__h0"), mBits, kHashes).as("__ps"))
    sketches.crossJoin(broadcast(pp))
      .select(groupCols.map(col) :+ col("word") :+
        forall(col("__ps"), p =>
          call_function("shiftright",
            element_at(col("bits"), (shiftright(p, 6) + 1).cast("int")),
            (p % 64).cast("int")).bitwiseAND(lit(1L)) === 1L)
          .as("maybe_contains"): _*)
  }

  // ---- Count-min sketch over the shared hash family ----------------------

  /** Per-group count-min sketch over whitespace tokens of
    * `lower(textCol)`: (groupCols..., counts) with `counts` a flat
    * depth×width array of BIGINT cell counts (cell `j·width + pos_j`).
    * THE approximate-frequency sketch: point-queryable occurrence counts
    * in fixed memory, one-sided error (never undercounts; overcount
    * bounded by ~2·N/width at depth 3 with high probability).
    *
    * Scale shape: one (group, cell)-keyed SUM aggregate with map-side
    * combine — ≤ depth·width rows per group cross the shuffle, no
    * distinct, no vocabulary table (the difference from
    * [[kmvDistinctTokens]]/top-k: no per-token state at all). Union =
    * elementwise SUM ([[cmsMerge]]) — per-shard sketches roll up without
    * rescanning text. Positions reuse the MinHash permutation family, so
    * a DuckDB oracle replays every cell exactly. */
  def cmsSketchTokens(
      docs: DataFrame, groupCols: Seq[String], textCol: String,
      width: Int = 1024, depth: Int = 3): DataFrame = {
    require(width >= 16, s"width must be >= 16, got $width")
    require(depth >= 1, s"depth must be >= 1, got $depth")
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val cells = array((0 until depth).map(j =>
      lit(j.toLong * width) + TextHash.permute(j, col("__h0")) % width): _*)
    val toks = docs
      .select(groupCols.map(col) :+
        explode(TextHash.wordHashes(lower(col(textCol)))).as("__h0"): _*)
      .select(groupCols.map(col) :+ explode(cells).as("__c"): _*)
    cellsAssemble(
      toks.groupBy(groupCols.map(col) :+ col("__c"): _*)
        .agg(count(lit(1)).as("__n")),
      groupCols, depth * width)
  }

  private def cellsAssemble(
      grouped: DataFrame, groupCols: Seq[String], len: Int): DataFrame =
    grouped
      .groupBy(groupCols.map(col): _*)
      .agg(map_from_entries(collect_list(struct(col("__c"), col("__n"))))
        .as("__mm"))
      .select(groupCols.map(col) :+
        transform(sequence(lit(0L), lit((len - 1).toLong)),
          c => coalesce(element_at(col("__mm"), c), lit(0L)))
          .as("counts"): _*)

  /** Merge count-min sketches to a coarser grouping: elementwise sum —
    * identical to sketching the union directly (spec + gate prove it).
    * `width`/`depth` must match the build (execution-time checked — a
    * `head()`-derived length would run the build lineage twice). */
  def cmsMerge(sketches: DataFrame, groupCols: Seq[String],
      width: Int = 1024, depth: Int = 3): DataFrame =
    cellsAssemble(
      requireWidth(sketches, "counts", depth * width, "cmsMerge", s"width=$width, depth=$depth")
        .select(groupCols.map(col) :+
          posexplode(col("counts")).as(Seq("__p", "__v")): _*)
        .select(groupCols.map(col) :+ col("__p").cast("long").as("__c") :+
          col("__v"): _*)
        .groupBy(groupCols.map(col) :+ col("__c"): _*)
        .agg(sum(col("__v")).as("__n")),
      groupCols, depth * width)

  /** Point-query every probe word against every group's sketch:
    * (groupCols..., word, est_count) with `est_count` the min over the
    * depth cells — the count-min estimator, never below the true count.
    * Row-local bit of arithmetic on the (tiny) sketch table only. */
  /** Streaming windowed CMS over an integral id column (per-key event
    * frequencies per window in fixed memory): per-(window, group, cell)
    * counts as ONE watermarked streaming aggregate — counts are
    * additive and update-mode emissions are cumulative, so an upsert
    * versioned by the count keeps the latest total per cell. Emits
    * (window_start_us, groupCols..., cc, cn); reassemble completed
    * windows with [[cmsFromCellRows]] and probe with
    * [[cmsEstimateIds]]. */
  def cmsSketchIdsWindowed(
      src: DataFrame, tsCol: String, groupCols: Seq[String],
      idColumn: String, windowDur: String, watermarkDelay: String,
      width: Int = 1024, depth: Int = 3): DataFrame = {
    require(width >= 16, s"width must be >= 16, got $width")
    require(depth >= 1, s"depth must be >= 1, got $depth")
    val cells = array((0 until depth).map(j =>
      lit(j.toLong * width) + TextHash.permute(j, col("__h0")) % width): _*)
    src.where(col(idColumn).isNotNull)
      .withColumn("__h0", col(idColumn).cast("long"))
      .withColumn("__c", explode(cells))
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur).as("__w") +:
        (groupCols.map(col) :+ col("__c")): _*)
      .agg(count(lit(1)).as("__n"))
      .select(unix_micros(col("__w.start")).as("window_start_us") +:
        (groupCols.map(col) :+ col("__c").as("cc") :+ col("__n").as("cn")): _*)
  }

  /** Assemble a counts array from stored (groupCols..., cc, cn) rows —
    * the read-back half of the streaming CMS path. */
  def cmsFromCellRows(
      rows: DataFrame, groupCols: Seq[String],
      width: Int = 1024, depth: Int = 3): DataFrame =
    cellsAssemble(
      rows.select(groupCols.map(col) :+ col("cc").as("__c") :+
        col("cn").as("__n"): _*),
      groupCols, depth * width)

  /** Point-frequency estimates for integral probe ids: min over the
    * depth cells, the standard CMS upper-bound estimate. */
  def cmsEstimateIds(
      sketches: DataFrame, groupCols: Seq[String], probeIds: Seq[Long],
      width: Int = 1024, depth: Int = 3): DataFrame = {
    require(probeIds.nonEmpty, "need at least one probe id")
    val cells = array((0 until depth).map(j =>
      lit(j.toLong * width) + TextHash.permute(j, col("__h0")) % width): _*)
    val pp = sketches.sparkSession
      .createDataFrame(probeIds.map(Tuple1(_))).toDF("probe_id")
      .withColumn("__h0", col("probe_id"))
      .select(col("probe_id"), cells.as("__cs"))
    sketches.crossJoin(broadcast(pp))
      .select(groupCols.map(col) :+ col("probe_id") :+
        array_min(transform(col("__cs"),
          c => element_at(col("counts"), (c + 1L).cast("int"))))
          .as("est_count"): _*)
  }

  def cmsEstimate(
      sketches: DataFrame, groupCols: Seq[String], probes: DataFrame,
      wordCol: String, width: Int = 1024, depth: Int = 3): DataFrame = {
    val cells = array((0 until depth).map(j =>
      lit(j.toLong * width) + TextHash.permute(j, col("__h0")) % width): _*)
    val pp = probes
      .select(col(wordCol).as("word"),
        TextHash.wordHash(lower(col(wordCol))).as("__h0"))
      .select(col("word"), cells.as("__cs"))
    sketches.crossJoin(broadcast(pp))
      .select(groupCols.map(col) :+ col("word") :+
        array_min(transform(col("__cs"),
          c => element_at(col("counts"), (c + 1L).cast("int"))))
          .as("est_count"): _*)
  }

  /** Estimator columns from a `registers` array: (…, n_zero, sum_q,
    * est_distinct) where `sum_q = Σ_j 2^(W+1-M_j)` is the harmonic-mean
    * denominator held EXACTLY as a BIGINT (every term is a power of two;
    * W+1 ≤ 25 for m=64 over P≈2^30, so the sum is far below 2^63) and the
    * raw estimate `α·m²·2^(W+1) / sum_q` is ONE double division of exact
    * integers — bit-identical across partitionings and engines. The
    * small-range linear-counting branch is deliberately omitted: it needs
    * `ln`, whose last-ulp behavior is libm-specific, and the KMV sketch
    * already covers exact-below-k small cardinalities. */
  def hllEstimate(df: DataFrame, m: Int = 64): DataFrame = {
    val rmax = hllW(m) + 1
    val num = hllAlpha(m) * m.toDouble * m.toDouble * math.pow(2.0, rmax)
    df.select(df.columns.filter(_ != "registers").map(col).toSeq :+
      size(filter(col("registers"), r => r === 0)).cast("long").as("n_zero") :+
      aggregate(col("registers"), lit(0L),
        (a, r) => a + call_function("shiftright",
          lit(1L << rmax), r.cast("int"))).as("sum_q"): _*)
      .withColumn("est_distinct", lit(num) / col("sum_q"))
  }

  // ---- Mergeable quantile sketch (decimal log buckets) -------------------

  /** Power-of-ten double literals 10^0..10^19 — every one exactly
    * representable (10^i = 2^i·5^i, and 5^19 < 2^53), so scaling by them
    * is pure IEEE multiply/divide with NO libm anywhere. The same
    * literals are rendered into the DuckDB mirror via Double.toString. */
  private[graft] val Pow10: IndexedSeq[Double] =
    (0 to 19).map(i => ("1" + "0" * i).toDouble)

  /** Decimal log-bucket index of a positive value — the DDSketch idea
    * (Masson et al., VLDB 2019) with deterministic decimal buckets in
    * place of γ-log ones: `d` = integer-digit count of floor(x), `m` =
    * first three significant digits (∈ [100, 999], computed by one IEEE
    * multiply-or-divide by an exact power of ten and a floor — never
    * `log`, whose last-ulp behavior is libm-specific), bucket id =
    * d·1000 + m. Relative bucket width ≤ 1/100 → midpoint estimates are
    * within ~0.5 % of the true quantile value. Values in [0, 1) collapse
    * to bucket 0 (they still count toward ranks); negatives are the
    * caller's contract to exclude. */
  private def decBucket(x: Column): Column = {
    val d = length(floor(x).cast("long").cast("string"))
    val m = (3 to 19).foldLeft(
      when(d === 1, floor(x * Pow10(2)))
        .when(d === 2, floor(x * Pow10(1)))) {
      case (acc, dd) => acc.when(d === dd, floor(x / Pow10(dd - 3)))
    }
    // Non-finite guard FIRST: under ANSI, casting NaN/Inf (or a double
    // past Long.MaxValue ≈ 9.22e18) to BIGINT throws, and the otherwise
    // branch would evaluate it. Such values bucket to NULL (excluded
    // from the sketch) — out of the positive-magnitude contract.
    when(isnan(x) || x >= 9.0e18 || x === Double.NegativeInfinity,
      lit(null).cast("long"))
      .when(x < 1.0, lit(0L))
      .otherwise(d.cast("long") * 1000L + m.cast("long"))
  }

  /** Bucket midpoint: (m + 0.5) · 10^(d-3) via the same exact literals. */
  private def decBucketMid(bucket: Column): Column = {
    val d = (bucket / 1000L).cast("int")
    val m = (bucket % 1000L).cast("double") + 0.5
    (3 to 19).foldLeft(
      when(d === 1, m / Pow10(2))
        .when(d === 2, m / Pow10(1))) {
      case (acc, dd) => acc.when(d === dd, m * Pow10(dd - 3))
    }.otherwise(lit(0.5)) // bucket 0: the [0, 1) underflow bucket
  }

  /** Per-group quantile sketch: (groupCols..., qbucket, qcnt) — ONE
    * map-side-combinable aggregate, post-shuffle volume ≤ ~17k rows per
    * group no matter the corpus size (19 digit classes × 900 mantissas),
    * and trivially mergeable: union sketch rows and [[quantileSketchMerge]]
    * re-sums. The distributed-quantile path that needs no full sort and
    * no percentile state object — the sketch IS rows, so it stores,
    * unions, and oracle-checks like any other table. */
  def quantileSketch(
      df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    df.select(groupCols.map(col) :+
      decBucket(col(valueCol).cast("double")).as("qbucket"): _*)
      .where(col("qbucket").isNotNull)
      .groupBy(groupCols.map(col) :+ col("qbucket"): _*)
      .agg(count(lit(1)).as("qcnt"))

  /** Streaming sibling of [[quantileSketch]]: event-time-windowed
    * per-group bucket counts as ONE watermarked streaming aggregate —
    * state per (window, group) is the bounded bucket map, counts merge
    * incrementally across micro-batches exactly like the batch shard
    * merge (they are the same addition). Emits
    * (window_start_us, groupCols..., qbucket, qcnt); feed the completed
    * windows to [[quantileFromSketch]] with window_start_us in the
    * group key for per-window percentile estimates. */
  def quantileSketchWindowed(
      src: DataFrame, tsCol: String, groupCols: Seq[String],
      valueCol: String, windowDur: String, watermarkDelay: String): DataFrame =
    src.where(col(valueCol).isNotNull)
      .withColumn("qbucket", decBucket(col(valueCol).cast("double")))
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur).as("__w") +:
        (groupCols.map(col) :+ col("qbucket")): _*)
      .agg(count(lit(1)).as("qcnt"))
      .select(unix_micros(col("__w.start")).as("window_start_us") +:
        (groupCols.map(col) :+ col("qbucket") :+ col("qcnt")): _*)

  /** Merge sketches built on shards: sum counts per (group, bucket). */
  def quantileSketchMerge(
      sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.groupBy(groupCols.map(col) :+ col("qbucket"): _*)
      .agg(sum(col("qcnt")).as("qcnt"))

  /** Quantile estimates from a sketch: one row per (group, percent) —
    * (groupCols..., pct, n_rows, est). Rank arithmetic is EXACT integers
    * (target rank = ceil(pct·n/100) = (pct·n + 99) div 100), the chosen
    * bucket is the min bucket whose running count reaches the rank (the
    * running sum is BIGINT — order-independent), and only the final
    * midpoint touches doubles. Cost: one bucket-ordered window over
    * sketch rows (≤ ~17k per group), not over data rows. */
  def quantileFromSketch(
      sketch: DataFrame, groupCols: Seq[String],
      percents: Seq[Int]): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      s"percents must be in [1, 100], got $percents")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("qbucket").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = sketch
      .withColumn("__cum", sum(col("qcnt")).over(w))
      .withColumn("__n", sum(col("qcnt")).over(
        Window.partitionBy(groupCols.map(col): _*)))
    val pctDf = sketch.sparkSession
      .createDataFrame(percents.map(Tuple1(_))).toDF("pct")
    cum.join(broadcast(pctDf))
      // ceil(pct·n/100) in INTEGER arithmetic — `/` on longs is double
      // division in Spark, `div` is the exact one
      .where(col("__cum") >= expr("(pct * __n + 99) div 100"))
      .groupBy(groupCols.map(col) :+ col("pct"): _*)
      .agg(max(col("__n")).as("n_rows"), min(col("qbucket")).as("__qb"))
      .withColumn("est", decBucketMid(col("__qb")))
      .drop("__qb")
  }

  /** Bloom-prefiltered join audit — the explicit form of the runtime
    * bloom filter Spark injects implicitly: build one bitmap over the
    * (filtered) dim keys, probe EVERY fact row against the broadcast
    * bitmap, and measure what the prefilter would do to the join —
    * rows passed, true matches, false positives, and the realized
    * false-positive rate against the non-matching population. The
    * sizing read for "ship an mBits bitmap instead of the key set":
    * zero false negatives by construction (`n_false_neg` is emitted
    * and GATED at 0), fp-rate is the tunable cost.
    *
    * Emits one row: (n_fact, n_pass, n_match, n_false_pos,
    * n_false_neg, fp_rate). Counts exact; fp_rate is one final float
    * over the exact non-match count (NULL when everything matches).
    *
    * Scale: the bitmap is mBits/8 bytes broadcast once; the probe is a
    * row-local bit test (no shuffle of the fact side); the truth flag
    * is a broadcast left join on the distinct dim keys — the audit
    * costs one fact scan, strictly less than the join it sizes. */
  def bloomPrefilterJoinStats(
      fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
      mBits: Int = 4096, kHashes: Int = 3): DataFrame = {
    require(mBits >= 64 && mBits % 64 == 0,
      s"mBits must be a multiple of 64, got $mBits")
    require(kHashes >= 1, s"kHashes must be >= 1, got $kHashes")
    val dk = dim.select(col(dimKey).cast("long").as("__k"))
      .where(col("__k").isNotNull).distinct()
    val bits = bitsAssemble(
      dk.select(explode(bloomPositions(col("__k"), mBits, kHashes))
          .as("__p"))
        .select(lit(1L).as("__g"), expr("__p div 64").as("__w"),
          call_function("shiftleft", lit(1L),
            (col("__p") % 64).cast("int")).as("__m0"))
        .groupBy(col("__g"), col("__w"))
        .agg(expr("bit_or(__m0)").as("__m")),
      Seq("__g"), mBits / 64).drop("__g")
    val pass = forall(col("__ps"), p =>
      call_function("shiftright",
        element_at(col("bits"), (shiftright(p, 6) + 1).cast("int")),
        (p % 64).cast("int")).bitwiseAND(lit(1L)) === 1L)
    val probed = fact.select(col(factKey).cast("long").as("__k"))
      .withColumn("__ps", bloomPositions(col("__k"), mBits, kHashes))
      .crossJoin(broadcast(bits))
      .withColumn("__pass", pass)
      .join(broadcast(dk.withColumn("__true", lit(1L))),
        Seq("__k"), "left_outer")
    probed.agg(
        count(lit(1)).as("n_fact"),
        coalesce(sum(when(col("__pass"), 1L).otherwise(0L)), lit(0L))
          .as("n_pass"),
        coalesce(sum(when(col("__true").isNotNull, 1L).otherwise(0L)),
          lit(0L)).as("n_match"),
        coalesce(sum(when(col("__pass") && col("__true").isNull, 1L)
          .otherwise(0L)), lit(0L)).as("n_false_pos"),
        coalesce(sum(when(!col("__pass") && col("__true").isNotNull, 1L)
          .otherwise(0L)), lit(0L)).as("n_false_neg"))
      .withColumn("fp_rate",
        when(col("n_fact") - col("n_match") === 0L,
          lit(null).cast("double"))
          .otherwise(col("n_false_pos").cast("double") /
            (col("n_fact") - col("n_match")).cast("double")))
  }
}
