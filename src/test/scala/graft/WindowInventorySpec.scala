package graft

import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}

/** Invariant: no gate ships a corpus-sized unpartitioned window.
  *
  * `Window.partitionBy()` with an empty partition spec moves ALL input
  * rows to a single task — fine over a bounded input (a top-k already
  * cut by `limit`, a quantile-bin grid, a k-row sketch table), a
  * scale-killer over corpus-sized input (round 8's `text_zipf_fit`
  * ranked the entire vocabulary in one reducer before it was caught).
  *
  * This spec walks every gate's ANALYZED logical plan, counts Window
  * nodes with an empty partitionSpec, and asserts the per-gate count
  * against a whitelist of sites audited as bounded (each entry names
  * the bound). A future gate that introduces a new unpartitioned
  * window — or an existing gate that grows one — fails here with the
  * gate name, forcing the author to either partition it or document
  * the bound by whitelisting it.
  *
  * Caveat: `localCheckpoint()` truncates the logical plan, so windows
  * computed before a checkpoint boundary are invisible here; those
  * sites are covered by their operators' own scaladoc bounds. Walking
  * the analyzed plan is lazy for most gates; gates that materialize
  * during construction run at sf0.001.
  */
class WindowInventorySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** gate name -> (allowed unpartitioned-window count, documented bound).
    * Every entry must name WHY the window input is bounded. */
  private val whitelist: Map[String, (Int, String)] = Map(
    // top-k gates: the window ranks rows AFTER an orderBy().limit(k)
    // (TakeOrdered) — k rows, never the corpus
    "text_zipf_fit" -> (1, "rank over orderBy().limit(100) output"),
    "text_top_ngrams" -> (1, "rank over orderBy().limit(k) output"),
    "text_collocations" -> (1, "rank over orderBy().limit(k) output"),
    "text_keyness" -> (1, "rank over orderBy().limit(k) output"),
    "mm_phash" -> (1, "rank over orderBy().limit(k) output"),
    "text_bm25_search" -> (1, "rank over orderBy().limit(k) output"),
    "text_textrank_keywords" -> (1, "rank over orderBy().limit(k) output"),
    "text_novelty_curve" -> (1,
      "cumulative over per-batch novelty totals: O(#batches) rows"),
    "q_pareto_coverage" -> (2, "rank + cumulative post-limit(k): k rows"),
    "q_rank_fusion" -> (4,
      "both fused lists cut to Bm25K rows before their rank windows"),
    "q_top_paths" -> (1,
      "rank over the aggregated path-type table with rank<=k filter " +
        "(WindowGroupLimit prunes per partition)"),
    // grid / bin-table windows: input is an aggregated value grid whose
    // cardinality is the #distinct bins/strata/days, not the corpus
    "q_gini" -> (2,
      "cumulative + total over per-(group,mass) aggregated bins"),
    "ts_cross_correlation" -> (2,
      "lag grid: one row per (lag, series pair) — hundreds of rows"),
    "q_calibration" -> (2, "score-bin grid: one row per calibration bin"),
    "q_auc" -> (2, "score-bin grid"),
    "q_ks_stat" -> (4, "score-bin grid cumulative passes"),
    "q_ks_test" -> (2, "score-bin grid CDF pass (binned contract)"),
    "q_spearman" -> (2, "per-axis bin-grid rank tables (binned contract)"),
    "q_kruskal_wallis" -> (1, "bin-grid average-rank pass"),
    "q_mann_whitney" -> (2, "score-bin grid"),
    "q_cliffs_delta" -> (1,
      "score-bin grid cumulative (same MW grid, quantization-bounded)"),
    "q_hodges_lehmann" -> (1,
      "pairwise-diff grid cumulative: O(V_a x V_b) distinct bins, " +
        "quantization-bounded (floor(value) keeps V in the hundreds)"),
    "q_benjamini_hochberg" -> (2,
      "BH step-up over O(m) per-group z rows — m = segment count"),
    "q_survival_km" -> (2,
      "at-risk suffix + ln-sum prefix over O(distinct durations) rows"),
    "q_user_growth" -> (1, "cumulative over the O(days) grid"),
    "sample_neyman" -> (2,
      "largest-remainder quota windows over the O(strata) alloc table"),
    "q_sprt" -> (4,
      "sequential-test contract: input is a monitoring stream of " +
        "trials, not a corpus; scaladoc names the 2-pass/streaming " +
        "alternative at scale"),
    "q_lift_deciles" -> (2, "k-row slice table (k=10) + cumulative"),
    "q_lorenz" -> (1, "cumulative over O(groups*buckets) bin table")
  ).withDefaultValue((0, ""))

  test("every unpartitioned window in a gate plan is whitelisted") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan: LogicalPlan = fn(spark, sfDir).queryExecution.analyzed
        val bare = plan.collect {
          case w: Window if w.partitionSpec.isEmpty => w
        }.size
        val (allowed, _) = whitelist(name)
        if (bare > allowed)
          Some(s"$name: $bare unpartitioned windows (allowed $allowed)")
        else None
    }
    assert(offenders.isEmpty,
      "unpartitioned windows beyond the audited whitelist — partition " +
        "them or document the bound here:\n" + offenders.mkString("\n"))
  }
}
