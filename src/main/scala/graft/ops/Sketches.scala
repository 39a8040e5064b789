package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** Distinct-count sketching — bounded-memory cardinality estimation for
  * corpus statistics (distinct tokens per language, distinct urls per
  * domain) where the exact distinct set is too large to hold but a few
  * percent of error is fine.
  *
  * The sketch here is KMV (k-minimum-values): keep the k smallest hash
  * values of the distinct items; the k-th smallest hash `m` estimates
  * cardinality as `(k-1) · P / m` (hashes uniform on [0, P)). Chosen over
  * HyperLogLog deliberately: same mergeability (union = k smallest of the
  * concatenation) and error ~1/√k, but the sketch is a deterministic
  * function of the item set through the engine's shared `TextHash`
  * family — reproducible across runs, partitionings, AND engines, so the
  * driver's DuckDB oracle hash-gates it exactly (an HLL's register layout
  * is engine-private and unverifiable cross-engine).
  *
  * Scale: one distinct shuffle on (group, hash) — the inherent cost of
  * distinctness — then a per-group window+aggregate keyed by group. The
  * per-group state after the distinct is the k minima, not the distinct
  * set. */
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
}
