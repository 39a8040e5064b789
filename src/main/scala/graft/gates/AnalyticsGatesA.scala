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

/** Analytics gates, first half (q1/q3/q_a..q_h).
  *
  * Split from the monolithic SparkEntry registry (r10); see
  * [[graft.SparkEntry]] for the oracle-safety conventions and the
  * duplicate-refusing merge. Shared oracle CTEs live in
  * [[GateOracleShared]]. */
private[graft] object AnalyticsGatesA {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- Arbitrary GROUPING SETS (beyond cube/rollup): two single-dim
    //      sets + the pair, with grouping() indicators disambiguating
    //      the subtotal nulls ----
    "q_grouping_sets" -> ((s, dir) => {
      t(s, dir, "events").createOrReplaceTempView("ev_gsets")
      s.sql(
        "SELECT event_type, cohort, " +
          "CAST(grouping(event_type) AS BIGINT) AS g_type, " +
          "CAST(grouping(cohort) AS BIGINT) AS g_cohort, " +
          "count(*) AS n, " +
          "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value " +
          "FROM (SELECT event_type, user_id % 10 AS cohort, value FROM ev_gsets) " +
          "GROUP BY GROUPING SETS ((event_type, cohort), (event_type), (cohort))")
    }),

    // ---- Correlated subqueries: EXISTS + NOT EXISTS + scalar-IN in one
    //      predicate (Catalyst rewrites to semi/anti joins — spec-checked
    //      in ExtensionsSpec territory; here the answers are gated) ----
    "q_exists" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("cust_ex")
      t(s, dir, "orders").createOrReplaceTempView("ord_ex")
      s.sql(
        "SELECT c_custkey, c_name FROM cust_ex c " +
          "WHERE EXISTS (SELECT 1 FROM ord_ex o " +
          "WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000) " +
          "AND NOT EXISTS (SELECT 1 FROM ord_ex o " +
          "WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F' " +
          "AND o.o_totalprice < 50000) " +
          "AND c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')")
    }),

    // ---- Warehouse: BITEMPORAL query — valid time × transaction time:
    //      the SCD2 dim lives in a versioned target (tx time = commit
    //      version via time travel), and the same valid-time as-of
    //      filter is answered AS KNOWN AT each transaction version ----
    "q_bitemporal" -> ((s, dir) => {
      val tmp = Files.createTempDirectory("graft_bt_").toString
      val tbl = graft.model.TargetTable("dim_bt", s"$tmp/t",
        keyCols = Seq("c_custkey", "valid_from_us"), versionCol = "txn",
        buckets = 4, retainVersions = 2)
      val cfg = IngestConfig(name = s"bt-${System.nanoTime()}",
        maxWriterPartitions = 4)
      val pt = new graft.sink.ParquetTarget(s, tbl)
      pt.mergeUpsert(scd2Baseline(s, dir).withColumn("txn", lit(1L)), cfg)
      val v1 = pt.versions().last
      pt.mergeUpsert(scd2Dim(s, dir).withColumn("txn", lit(2L)), cfg)
      val v2 = pt.versions().last
      val tAt = 1500L
      def asKnownAt(v: Long, tx: Long) = pt.readVersion(v).get
        .filter(col("valid_from_us") <= tAt &&
          (col("valid_to_us").isNull || col("valid_to_us") > tAt))
        .filter(col("c_custkey") % 10 === 0)
        .select(lit(tx).as("tx"), col("c_custkey"),
          col("c_mktsegment"), col("c_acctbal"))
      asKnownAt(v1, 1L).unionByName(asKnownAt(v2, 2L))
    }),

    // ---- Data ops: keyed snapshot diff (insert/delete/update + changed
    //      column names; ONE full-outer join, null-safe compares) ----
    "q_diff" -> ((s, dir) => {
      val base = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val right = base.filter(col("o_orderkey") % 97 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 13 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
        .unionByName(base.filter(col("o_orderkey") % 101 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 100000000L))
      // changed_cols is array<string> in the operator API; the gate
      // flattens it to a CSV string so every gate output stays scalar
      // (the driver's pandas compare cannot sort array cells).
      graft.ops.Diff.keyedDiff(base, right, Seq("o_orderkey"))
        .withColumn("changed_cols", array_join(col("changed_cols"), ","))
    }),

    // ---- Product analytics: ordered funnel (view -> click -> purchase,
    //      strictly-after min-ts semantics; k user-keyed aggregates) ----
    "q_funnel" -> ((s, dir) =>
      graft.ops.Funnel.funnelStages(
        t(s, dir, "events").select(col("user_id"),
          expr("ts div 1000").as("ts_us"), col("event_type")),
        "user_id", "ts_us", "event_type",
        Seq("view", "click", "purchase"))),

    // ---- Composition capstone: funnel completion BY EXPERIMENT ARM —
    //      the ordered funnel feeding the two-proportion z-test (does
    //      the even-user arm complete view→click→purchase differently?) ----
    "q_funnel_by_arm" -> ((s, dir) => {
      val f = graft.ops.Funnel.funnelStages(
        t(s, dir, "events").select(col("user_id"),
          expr("ts div 1000").as("ts_us"), col("event_type")),
        "user_id", "ts_us", "event_type",
        Seq("view", "click", "purchase"))
      graft.ops.Profile.twoProportionZ(f,
        pmod(col("user_id"), lit(2L)) === 0L,
        col("stages_completed") === 3L)
    }),

    // ---- Time series: per-user EWMA smoothing (strict prefix folds,
    //      bit-identical to the DuckDB list_reduce mirror; bounded key
    //      subset keeps the O(n^2) prefix work test-sized) ----
    "q_ewma" -> ((s, dir) =>
      graft.ops.TimeSeries.ewma(
        t(s, dir, "events").filter(col("user_id") < 20)
          .select(col("user_id"), expr("ts div 1000").as("ts_us"),
            col("event_id"), col("value")),
        "user_id", "ts_us", "event_id", "value", alpha = 0.25)
        .select(col("user_id"), col("ts").as("ts_us"),
          col("id").as("event_id"), col("x").as("value"), col("ewma"))),

    // ---- Data contracts: declarative expectations audit — every rule
    //      rides ONE aggregate over ONE scan; referential rules via
    //      anti-join, same output shape ----
    "q_expectations" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      graft.ops.Profile.expect(li, Seq(
          "quantity_range" -> col("l_quantity").between(1, 50),
          "quantity_le_45" -> (col("l_quantity") <= 45),
          "discount_le_005" -> (col("l_discount") <= 0.05),
          "positive_price" -> (col("l_extendedprice") > 0),
          "flag_domain" -> col("l_returnflag").isin("A", "N", "R")))
        .unionByName(graft.ops.Profile.orphanRule("orderkey_fk",
          li, "l_orderkey", t(s, dir, "orders"), "o_orderkey"))
        .unionByName(graft.ops.Profile.orphanRule("custkey_fk",
          t(s, dir, "orders"), "o_custkey", t(s, dir, "customer"),
          "c_custkey"))
    }),

    // ---- Profiling: chi-square independence (event_type × epoch-day
    //      mod 7) — full grid incl. empty cells, strict sorted fold ----
    "q_chi2" -> ((s, dir) =>
      graft.ops.Profile.chiSquare(
        t(s, dir, "events").select(col("event_type"),
          expr("(ts div 86400000000000) % 7").as("dow")),
        "event_type", "dow")),

    // ---- Profiling: per-cell chi² residuals — WHERE the dependence
    //      lives (adjusted residuals, |adj| ≳ 2 = driving cells) ----
    "q_chi2_residuals" -> ((s, dir) =>
      graft.ops.Profile.chiSquareResiduals(
        t(s, dir, "events").select(col("event_type"),
          expr("(ts div 86400000000000) % 7").as("dow")),
        "event_type", "dow")),

    // ---- Profiling: Cramér's V — the effect-SIZE companion to q_chi2
    //      (same grid): is the dependence large, not just n-significant? ----
    "q_cramers_v" -> ((s, dir) =>
      graft.ops.Profile.cramersV(
        t(s, dir, "events").select(col("event_type"),
          expr("(ts div 86400000000000) % 7").as("dow")),
        "event_type", "dow")),

    // ---- Warehouse/recsys: market-basket association rules (support /
    //      confidence / lift over co-purchased parts) — per-basket pair
    //      self-join, prune-then-annotate, exact integer counts ----
    "q_assoc_rules" -> ((s, dir) =>
      graft.ops.Associations.associationRules(
        t(s, dir, "lineitem").filter(col("l_partkey") % 4 === 0)
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p")),
        "o", "p", minPairCount = 2)),

    // ---- Ranking quality: binned ROC AUC (tie-corrected Mann-Whitney
    //      U) — does `value` rank purchase events above the rest? All
    //      integer until ONE final division ----
    "q_auc" -> ((s, dir) =>
      graft.ops.Profile.aucBinned(
        t(s, dir, "events"),
        col("event_type") === "purchase",
        floor(col("value") * 16.0))),

    // ---- A/B readout: two-proportion z-test (does the even-user arm
    //      purchase at a different rate?) — four exact counts in ONE
    //      scan, fixed-shape float statistic, no libm ----
    "q_abtest" -> ((s, dir) =>
      graft.ops.Profile.twoProportionZ(
        t(s, dir, "events"),
        pmod(col("user_id"), lit(2L)) === 0L,
        col("event_type") === "purchase")),

    // ---- A/B guardrail: sample-ratio mismatch over distinct units —
    //      the validity check that must pass before any readout ----
    "q_abtest_srm" -> ((s, dir) =>
      graft.ops.Profile.srmCheck(
        t(s, dir, "events").select(col("user_id")).distinct(),
        pmod(col("user_id"), lit(2L)) === 0L)),

    // ---- Quasi-experimental: difference-in-differences — treated vs
    //      control pre→post change with pooled SE (exact cent moments) ----
    "q_diff_in_diff" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("user_id"),
        expr("ts div 1000").as("us"),
        coalesce(floor(col("value") * 100.0).cast("long"), lit(0L))
          .as("__c"))
      val bounds = ev.agg(min(col("us")).as("__mn"), max(col("us")).as("__mx"))
      val obs = ev.crossJoin(broadcast(bounds))
        .withColumn("__mid", expr("(__mn + __mx) div 2"))
        .groupBy(col("user_id"), (col("us") > col("__mid")).as("post"))
        .agg(sum(col("__c")).as("y"))
      graft.ops.Profile.diffInDiff(obs,
        pmod(col("user_id"), lit(2L)) === 0L, col("post"), "y",
        scale = 100L)
    }),

    // ---- A/B variance reduction: CUPED-adjusted per-arm means using
    //      the pre-period spend as covariate (exact cent moments,
    //      fixed-shape θ and adjusted means) ----
    "q_abtest_cuped" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("user_id"),
        expr("ts div 1000").as("us"),
        coalesce(floor(col("value") * 100.0).cast("long"), lit(0L))
          .as("__c"))
      val bounds = ev.agg(min(col("us")).as("__mn"), max(col("us")).as("__mx"))
      val units = ev.crossJoin(broadcast(bounds))
        .withColumn("__mid", expr("(__mn + __mx) div 2"))
        .groupBy(col("user_id"))
        .agg(
          coalesce(sum(when(col("us") <= col("__mid"), col("__c"))),
            lit(0L)).as("x"),
          coalesce(sum(when(col("us") > col("__mid"), col("__c"))),
            lit(0L)).as("y"))
        .withColumn("arm",
          when(pmod(col("user_id"), lit(2L)) === 0L, "A").otherwise("B"))
      graft.ops.Profile.cupedAdjust(units, "arm", "x", "y", scale = 100L)
    }),

    // ---- Profiling: one-way ANOVA F (does event_type shift the mean
    //      value?) — exact quantized moments, strict sorted folds ----
    "q_anova" -> ((s, dir) =>
      graft.ops.Normalize.anovaF(
        t(s, dir, "events").select(col("event_type"), col("value")),
        "event_type", "value")),

    // ---- Profiling: Benford first-digit audit (string-extracted
    //      leading digit, driver-computed expectations) ----
    "q_benford" -> ((s, dir) =>
      graft.ops.Profile.benford(t(s, dir, "orders"), "o_totalprice")),

    // ---- Profiling: per-language source entropy (corpus balance;
    //      strict sorted fold, pinned at 8 decimals for libm ln) ----
    "q_entropy" -> ((s, dir) =>
      graft.ops.Profile.entropy(t(s, dir, "documents"), "lang", "source")
        .withColumn("entropy", round(col("entropy"), 8))),

    // ---- Events: cohort lifetime-value curves — retention's revenue
    //      companion; DECIMAL-exact daily and cumulative sums ----
    "q_cohort_ltv" -> ((s, dir) =>
      graft.ops.Funnel.cohortLtv(
        t(s, dir, "events").select(col("user_id"),
          expr("ts div 86400000000000").as("day"),
          when(col("event_type") === "purchase", col("value"))
            .otherwise(lit(0.0)).as("rev")),
        "user_id", "day", "rev")),

    // ---- Profiling: 2-D equi-width histogram (joint-distribution grid
    //      for drift heatmaps) over lineitem quantity × price ----
    "q_histogram2d" -> ((s, dir) =>
      graft.ops.Profile.histogram2d(
        t(s, dir, "lineitem"), "l_quantity", "l_extendedprice",
        bins = 8)),

    // ---- Profiling: per-group Gini concentration (how dominated is a
    //      group by its heaviest members) — exact BIGINT moments over
    //      the fixed (value, id) rank order, ONE division ----
    "q_gini" -> ((s, dir) =>
      graft.ops.Normalize.gini(
        t(s, dir, "events").select(col("event_type"),
          floor(col("value") * 1024.0).cast("long").as("qx"),
          col("event_id")),
        "event_type", "qx", "event_id")),

    // ---- Profiling: Herfindahl concentration of value mass by USER
    //      within each event type — "is one producer dominating this
    //      stream?" (exact DECIMAL cross-moments, fixed IEEE readout) ----
    "q_herfindahl" -> ((s, dir) =>
      graft.ops.Normalize.herfindahl(
        t(s, dir, "events").select(col("event_type"), col("user_id"),
          floor(col("value") * 1024.0).cast("long").as("qx")),
        "event_type", "user_id", "qx")),

    // ---- Profiling: pairwise Pearson correlations from EXACT moments,
    //      ONE corpus pass for all pairs ----
    "q_corr_matrix" -> ((s, dir) =>
      graft.ops.Normalize.correlationMatrix(
        t(s, dir, "lineitem")
          .select(col("l_quantity"), col("l_extendedprice"),
            col("l_discount")),
        Seq("l_quantity", "l_extendedprice", "l_discount"))),

    // ---- Profiling: per-type equi-width value histogram ----
    "q_histogram" -> ((s, dir) =>
      graft.ops.Profile.histogram(
        t(s, dir, "events"), "event_type", "value", bins = 10)),

    // ---- As-of join: point-in-time lookup (union+window, single shuffle) ----
    "q_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val errors = ev.filter(col("event_type") === "error").select(
        col("event_id"), col("user_id"), expr("ts div 1000").as("err_us"))
      val purchases = ev.filter(col("event_type") === "purchase").select(
        col("user_id"), expr("ts div 1000").as("purchase_us"),
        col("value").as("purchase_value"), col("event_id"))
      // event_id tie-break: two purchases sharing (user_id, purchase_us)
      // must resolve deterministically on both engines, or the hash gate
      // flakes the day the generator emits such a collision.
      graft.ops.AsOf.joinAsOf(errors, purchases,
        Seq("user_id"), "err_us", "purchase_us",
        Seq("purchase_us", "purchase_value"),
        rightTieBreakCols = Seq("event_id"))
        .select(col("event_id"), col("user_id"), col("err_us"),
          col("asof_purchase_us").as("purchase_us"),
          col("asof_purchase_value").as("purchase_value"))
    }),

    // ---- FORWARD as-of: the NEXT purchase at or after each error
    //      (next-action attribution / time-to-event labels) ----
    "q_asof_forward" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val errors = ev.filter(col("event_type") === "error").select(
        col("event_id"), col("user_id"), expr("ts div 1000").as("err_us"))
      val purchases = ev.filter(col("event_type") === "purchase").select(
        col("user_id"), expr("ts div 1000").as("purchase_us"),
        col("value").as("purchase_value"), col("event_id"))
      graft.ops.AsOf.joinAsOfForward(errors, purchases,
        Seq("user_id"), "err_us", "purchase_us",
        Seq("purchase_us", "purchase_value"),
        rightTieBreakCols = Seq("event_id"))
        .select(col("event_id"), col("user_id"), col("err_us"),
          col("asof_purchase_us").as("purchase_us"),
          col("asof_purchase_value").as("purchase_value"))
    }),

    // ---- Last-touch attribution: each purchase credited to the same
    //      user's latest prior click/view (as-of back join — single
    //      keyed shuffle), per-channel rollup with the DECIMAL(18,2)
    //      exact-sum discipline; orphan purchases → 'direct' ----
    "q_attribution" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val touches = ev.filter(col("event_type").isin("click", "view"))
        .select(col("user_id"), expr("ts div 1000").as("touch_us"),
          col("event_type").as("channel"), col("event_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), expr("ts div 1000").as("purchase_us"),
          col("value"))
      graft.ops.Attribution.lastTouch(purchases, touches,
        Seq("user_id"), "purchase_us", "touch_us", "channel", "value",
        tieBreakCols = Seq("event_id"))
    }),

    // ---- Linear multi-touch attribution: value split equally over
    //      all in-window touches (7-day lookback); exact micro-cent
    //      floor shares, no-touch conversions credit 'direct' ----
    "q_attribution_linear" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val touches = ev.filter(col("event_type").isin("click", "view"))
        .select(col("user_id"), expr("ts div 1000").as("touch_us"),
          col("event_type").as("channel"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          expr("ts div 1000").as("purchase_us"), col("value"))
      graft.ops.Attribution.linear(purchases, touches,
        Seq("user_id"), "event_id", "purchase_us", "touch_us",
        "channel", "value", windowUs = 604800000000L)
    }),

    // ---- Position-based (U-shaped 40/20/40) attribution: first and
    //      last in-window touches carry the weight; exact integer
    //      credit schedule, same micro-cent discipline as linear ----
    "q_attribution_position" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val touches = ev.filter(col("event_type").isin("click", "view"))
        .select(col("user_id"), expr("ts div 1000").as("touch_us"),
          col("event_id").as("touch_id"), col("event_type").as("channel"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          expr("ts div 1000").as("purchase_us"), col("value"))
      graft.ops.Attribution.positionBased(purchases, touches,
        Seq("user_id"), "event_id", "purchase_us", "touch_us",
        "touch_id", "channel", "value", windowUs = 604800000000L)
    }),

    // ---- Model calibration curve: does a high score MEAN a high
    //      purchase rate? Quantized-score buckets, observed positive
    //      rate vs mean claimed score — AUC's honest companion ----
    "q_calibration" -> ((s, dir) =>
      graft.ops.Profile.calibrationBins(
        t(s, dir, "events"),
        col("event_type") === "purchase",
        floor(col("value") * 1000.0), binDiv = 100L)),

    // ---- Time-series gap-fill: dense daily grid + LOCF per user ----
    "q_gapfill" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(
        col("user_id"),
        to_date(timestamp_micros(expr("ts div 1000"))).as("d"),
        col("value"))
      graft.ops.TimeSeries.gapFillDaily(ev, "user_id", "d", "value")
    }),

    // ---- Cube aggregation (all grouping-set combinations) ----
    "q_cube" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"))),

    // ---- Analytics: aggregation (TPC-H Q1 shape) ----
    "q1_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            .as("sum_base_price"),
          sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount")).cast("decimal(18,4)")))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))),

    // ---- Analytics: 3-way join + agg + top-k (TPC-H Q3 shape) ----
    "q3_join_topk" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(o("o_orderkey").as("orderkey"))
        .agg(
          sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount")).cast("decimal(18,4)")))
            .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("orderkey").asc)
        .limit(10)
    }),

    // ---- LLM pipeline: dup-inflation histogram — how duplicated is
    //      this corpus? (cluster_size, n_clusters, n_docs rows) ----
    "q_dup_inflation" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val labels = graft.ops.Components.connectedComponents(
        NearDup.lshCandidatePairs(
          t(s, dir, "documents"), "doc_id", "text", m = 8, n = 3, r = 2),
        "id_a", "id_b")
      docs.join(
          labels.select(col("id").as("doc_id"), col("comp")),
          Seq("doc_id"), "left_outer")
        .select(coalesce(col("comp"), col("doc_id")).as("canon_id"))
        .groupBy(col("canon_id")).agg(count(lit(1)).as("cluster_size"))
        .groupBy(col("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"),
          sum(col("cluster_size")).as("n_docs"))
    }),

    // ---- Growth: daily growth accounting — DAU decomposed into
    //      new / retained / resurrected, churn attributed to the next
    //      day (one lag/lead window over per-user active days) ----
    "q_growth_accounting" -> ((s, dir) =>
      graft.ops.Funnel.growthAccounting(
        t(s, dir, "events").select(col("user_id"),
          expr("ts div 86400000000000").as("day")),
        "user_id", "day")),

    // ---- Heavy hitters: exact top-20 keys by frequency via a
    //      Misra-Gries candidate pass + exact recount (shuffle bounded
    //      by slots×partitions, not distinct keys) ----
    "q_heavy_hitters" -> ((s, dir) =>
      graft.ops.HeavyHitters.topKByFrequency(
        t(s, dir, "events"), "user_id", k = 20)),

    // ---- Product analytics: funnel time-to-convert (view→purchase
    //      gap distribution: exact mean + lower-median element pick) ----
    "q_funnel_ttc" -> ((s, dir) =>
      graft.ops.Funnel.timeToConvert(
        graft.ops.Funnel.funnelStages(
          t(s, dir, "events").select(col("user_id"),
            expr("ts div 1000").as("ts_us"), col("event_type")),
          "user_id", "ts_us", "event_type",
          Seq("view", "click", "purchase")),
        "t1", "t3")),

    // ---- LLM pipeline: Bloom membership sketch — 8 KiB bitmap per
    //      group, zero false negatives; the join-pruning primitive
    //      (probe a filter instead of shipping a token set) ----
    // ---- Join pre-filter audit: explicit bloom prefilter over the
    //      dim keys — rows passed / true matches / false positives and
    //      the realized fp-rate; false negatives gated at ZERO ----
    "q_bloom_prefilter" -> ((s, dir) =>
      graft.ops.Sketches.bloomPrefilterJoinStats(
        t(s, dir, "lineitem"), "l_suppkey",
        t(s, dir, "supplier").filter(col("s_nationkey") < 5L),
        "s_suppkey", mBits = 256, kHashes = 3)),

    // ---- As-of join with staleness tolerance (feature-store freshness
    //      contract; carried columns null out together) ----
    "q_asof_tolerance" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val errors = ev.filter(col("event_type") === "error").select(
        col("event_id"), col("user_id"), expr("ts div 1000").as("err_us"))
      val purchases = ev.filter(col("event_type") === "purchase").select(
        col("user_id"), expr("ts div 1000").as("purchase_us"),
        col("value").as("purchase_value"), col("event_id"))
      graft.ops.AsOf.joinAsOfTolerance(errors, purchases,
        Seq("user_id"), "err_us", "purchase_us",
        Seq("purchase_us", "purchase_value"),
        toleranceUs = 1800000000L,
        rightTieBreakCols = Seq("event_id"))
        .select(col("event_id"), col("user_id"), col("err_us"),
          col("asof_purchase_us").as("purchase_us"),
          col("asof_purchase_value").as("purchase_value"),
          col("asof_matched").as("matched"))
    }),

    // ---- Sources: bucketed tables — the pre-shuffled co-location layout;
    //      the orders⋈customer join below runs with ZERO exchanges on the
    //      fact side (bucket metadata from the catalog; spec-proven) ----
    "q_bucketed_join" -> ((s, dir) => {
      val tmp = Files.createTempDirectory("graft_bjoin_").toString
      val suf = java.lang.Long.toHexString(System.nanoTime())
      graft.sources.Formats.writeBucketedTable(
        t(s, dir, "orders").select(col("o_custkey"), col("o_totalprice")),
        s"orders_bkt_$suf", s"$tmp/orders", Seq("o_custkey"), buckets = 8)
      graft.sources.Formats.writeBucketedTable(
        t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment")),
        s"customer_bkt_$suf", s"$tmp/customer", Seq("c_custkey"), buckets = 8)
      s.table(s"orders_bkt_$suf")
        .join(s.table(s"customer_bkt_$suf"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("revenue"))
    }),

    // ---- Stats: Cochran's Q — k-treatment paired binary test (did the
    //      same users respond differently across purchase/error/signup?);
    //      all-integer aggregates, ONE division ----
    "q_cochran_q" -> ((s, dir) =>
      graft.ops.Profile.cochranQ(
        t(s, dir, "events"), col("user_id"),
        Seq(col("event_type") === "purchase",
          col("event_type") === "error",
          col("event_type") === "signup"))),

    // ---- ML eval: split-conformal prediction intervals — per-type
    //      mean model on train, exact residual-rank pick on calibration,
    //      distribution-free coverage audit on test ----
    "q_conformal_interval" -> ((s, dir) =>
      graft.ops.Profile.conformalInterval(
        t(s, dir, "events"), col("event_type"), col("event_id"),
        floor(col("value") * 1024.0),
        when(pmod(col("event_id"), lit(4L)) <= 1L, 0L)
          .when(pmod(col("event_id"), lit(4L)) === 2L, 1L)
          .otherwise(2L))),

    // ---- Stats: Friedman test — within-user ranks of spend across
    //      purchase/click/view; closed-form k=3 doubled ranks, exact
    //      tie case split, two final divisions ----
    "q_friedman" -> ((s, dir) => {
      val qx = floor(col("value") * 1024.0)
      graft.ops.Profile.friedman(
        t(s, dir, "events"), col("user_id"),
        Seq((col("event_type") === "purchase", qx),
          (col("event_type") === "click", qx),
          (col("event_type") === "view", qx)))
    }),

    // ---- Clustering: grid DBSCAN over (value, hour-of-day) — density
    //      cells ≥ minPts, 8-adjacent cores union via connected
    //      components; O(core cells) graph, never per-point ε-balls ----
    "q_dbscan_grid" -> ((s, dir) =>
      graft.ops.Components.gridDbscan(
        t(s, dir, "events"),
        floor(col("value")),
        expr("ts div 3600000000000 % 24"),
        minPts = 8L)),

    // ---- OLAP: recursive-CTE-class subtree rollup WITHOUT recursion —
    //      ancestors-or-self chains are pure arithmetic on the implicit
    //      heap hierarchy (parent = n>>1), one explode + one aggregate ----
    "q_hierarchy_rollup" -> ((s, dir) =>
      graft.ops.Graph.subtreeRollup(
        t(s, dir, "documents")
          .select((col("doc_id") + 1L).as("node"), col("n_chars")),
        "node", "n_chars")),

    // ---- Experimentation: Benjamini-Hochberg FDR over per-nation
    //      two-proportion z-tests — the multiple-comparisons guard for
    //      segment-level A/B readouts (m=25 nations, alpha=0.05) ----
    "q_benjamini_hochberg" -> ((s, dir) =>
      graft.ops.Profile.benjaminiHochbergZ(
        t(s, dir, "orders").join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey")),
        "c_nationkey",
        pmod(col("o_custkey"), lit(2L)) === 0L,
        col("o_totalprice") > 250000.0)),

    // ---- Ranking eval: average precision (PR-AUC, step form) — the
    //      global rank is columnar (range partitions + broadcast prefix
    //      offsets), precision@k accumulates as exact scaled longs ----
    "q_avg_precision" -> ((s, dir) =>
      graft.ops.RankEval.averagePrecision(
        t(s, dir, "events"), col("value"), col("event_id"),
        col("event_type") === "purchase")),

    // ---- Classifier eval: 2×2 confusion + accuracy/precision/recall/
    //      F1/kappa/MCC in ONE scan — exact counts, fixed-shape IEEE
    //      derivations shared verbatim with the oracle ----
    "q_classifier_eval" -> ((s, dir) =>
      graft.ops.RankEval.classifierEval(
        t(s, dir, "events").filter(col("value").isNotNull),
        col("value") >= 50.0,
        col("event_type") === "purchase")),

    // ---- Experimentation: delta-method ratio readout — revenue per
    //      event with USER-clustered variance (the per-event z-test is
    //      anticonservative when events correlate within users) ----
    "q_delta_ratio" -> ((s, dir) =>
      graft.ops.Profile.deltaMethodRatio(
        t(s, dir, "events"), col("user_id"),
        pmod(col("user_id"), lit(2L)) === 0L,
        floor(col("value") * 100.0), scale = 100.0)),

    // ---- Calibration ECE: per-bin weighted |observed − claimed| gaps
    //      collapse to exact integers (micro-unit probabilities), so
    //      the headline number is ONE division — q_calibration's
    //      single-number companion ----
    "q_ece" -> ((s, dir) =>
      graft.ops.RankEval.expectedCalibrationError(
        t(s, dir, "events"),
        least(floor(col("value") * 2000.0).cast("long"), lit(1000000L)),
        col("event_type") === "purchase", nBins = 20)),
  )

  def oracles: Map[String, String] = {
    Map(
      // The right side is deduped to the max-event_id row per (user_id, ts)
      // BEFORE the ASOF join — mirrors rightTieBreakCols = event_id on the
      // Spark side (DuckDB's ASOF picks an arbitrary row on ts ties).
      "q_attribution" ->
        ("WITH t1 AS (SELECT user_id, ts, event_type AS channel FROM (" +
          "SELECT user_id, ts, event_type, row_number() OVER (" +
          "PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn " +
          "FROM events WHERE event_type IN ('click', 'view')) " +
          "WHERE rn = 1), " +
          "j AS (SELECT coalesce(r.channel, 'direct') AS channel, " +
          "l.value FROM (SELECT user_id, ts, value FROM events " +
          "WHERE event_type = 'purchase') l " +
          "ASOF LEFT JOIN t1 r " +
          "ON l.user_id = r.user_id AND l.ts >= r.ts) " +
          "SELECT channel, count(*) AS n_conversions, " +
          "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) " +
          "AS sum_value FROM j GROUP BY 1"),
      "q_attribution_linear" ->
        // Equal-split micro-cent credit; // is floor division (the
        // engine's (a - pmod)/n), BIGINT throughout, one final float.
        ("WITH c AS (SELECT user_id, event_id AS cid, epoch_us(ts) AS cts, " +
          "CAST(floor(value * 100.0) AS BIGINT) * 1000000 AS micro " +
          "FROM events WHERE event_type = 'purchase'), " +
          "t2 AS (SELECT user_id, epoch_us(ts) AS tts, " +
          "event_type AS channel FROM events " +
          "WHERE event_type IN ('click', 'view')), " +
          "j AS (SELECT c.cid, c.micro, t2.channel FROM c " +
          "LEFT JOIN t2 ON t2.user_id = c.user_id " +
          "AND t2.tts <= c.cts AND t2.tts > c.cts - 604800000000), " +
          "n AS (SELECT cid, micro, channel, " +
          "count(channel) OVER (PARTITION BY cid) AS nn FROM j), " +
          "r AS (SELECT CASE WHEN nn = 0 THEN 'direct' ELSE channel END " +
          "AS channel, CASE WHEN nn = 0 THEN micro ELSE micro // nn END " +
          "AS credit FROM n) " +
          "SELECT channel, CAST(count(*) AS BIGINT) AS n_credits, " +
          "CAST(coalesce(sum(credit), 0) AS BIGINT) AS credit_micro, " +
          "CAST(coalesce(sum(credit), 0) AS DOUBLE) / 1.0e8 " +
          "AS credit_value FROM r GROUP BY channel"),
      "q_attribution_position" ->
        // U-shaped 40/20/40; // replays the engine's sign-safe
        // (a - pmod)/n floor division; n=2 conserves via remainder.
        ("WITH c AS (SELECT user_id, event_id AS cid, epoch_us(ts) AS cts, " +
          "CAST(floor(value * 100.0) AS BIGINT) * 1000000 AS micro " +
          "FROM events WHERE event_type = 'purchase'), " +
          "t2 AS (SELECT user_id, epoch_us(ts) AS tts, event_id AS tid, " +
          "event_type AS channel FROM events " +
          "WHERE event_type IN ('click', 'view')), " +
          "j AS (SELECT c.cid, c.micro, t2.channel, t2.tts, t2.tid FROM c " +
          "LEFT JOIN t2 ON t2.user_id = c.user_id " +
          "AND t2.tts <= c.cts AND t2.tts > c.cts - 604800000000), " +
          "w AS (SELECT cid, micro, channel, " +
          "count(channel) OVER (PARTITION BY cid) AS nn, " +
          "row_number() OVER (PARTITION BY cid ORDER BY tts, tid) AS rn " +
          "FROM j), " +
          "r AS (SELECT CASE WHEN nn = 0 THEN 'direct' ELSE channel END " +
          "AS channel, CASE WHEN nn = 0 THEN micro " +
          "WHEN nn = 1 THEN micro " +
          "WHEN nn = 2 AND rn = 1 THEN micro // 2 " +
          "WHEN nn = 2 THEN micro - micro // 2 " +
          "WHEN rn = 1 OR rn = nn THEN (micro * 40) // 100 " +
          "ELSE (micro - 2 * ((micro * 40) // 100)) // (nn - 2) END " +
          "AS credit FROM w) " +
          "SELECT channel, CAST(count(*) AS BIGINT) AS n_credits, " +
          "CAST(coalesce(sum(credit), 0) AS BIGINT) AS credit_micro, " +
          "CAST(coalesce(sum(credit), 0) AS DOUBLE) / 1.0e8 " +
          "AS credit_value FROM r GROUP BY channel"),
      "q_calibration" ->
        ("WITH b AS (SELECT CASE WHEN event_type = 'purchase' THEN 1 " +
          "ELSE 0 END AS y, CAST(floor(value * 1000.0) AS BIGINT) AS q " +
          "FROM events WHERE value IS NOT NULL) " +
          "SELECT q // 100 AS bin, CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(y) AS BIGINT) AS n_pos, " +
          "CAST(sum(q) AS BIGINT) AS sum_q, " +
          "CAST(sum(y) AS DOUBLE) / count(*) AS pos_rate, " +
          "CAST(sum(q) AS DOUBLE) / count(*) AS mean_q " +
          "FROM b GROUP BY 1"),
      "q_asof_join" ->
        ("SELECT l.event_id, l.user_id, epoch_us(l.ts) AS err_us, " +
          "epoch_us(r.ts) AS purchase_us, r.value AS purchase_value " +
          "FROM (SELECT * FROM events WHERE event_type = 'error') l " +
          "ASOF LEFT JOIN (SELECT user_id, ts, value FROM " +
          "(SELECT user_id, ts, event_id, value, row_number() OVER " +
          "(PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn " +
          "FROM events WHERE event_type = 'purchase') WHERE rn = 1) r " +
          "ON l.user_id = r.user_id AND l.ts >= r.ts"),
      // forward direction: DuckDB ASOF with the inequality flipped
      "q_asof_forward" ->
        ("SELECT l.event_id, l.user_id, epoch_us(l.ts) AS err_us, " +
          "epoch_us(r.ts) AS purchase_us, r.value AS purchase_value " +
          "FROM (SELECT * FROM events WHERE event_type = 'error') l " +
          "ASOF LEFT JOIN (SELECT user_id, ts, value FROM " +
          "(SELECT user_id, ts, event_id, value, row_number() OVER " +
          "(PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn " +
          "FROM events WHERE event_type = 'purchase') WHERE rn = 1) r " +
          "ON l.user_id = r.user_id AND l.ts <= r.ts"),
      "q_asof_tolerance" ->
        ("SELECT event_id, user_id, err_us, " +
          "CASE WHEN fresh THEN p_us END AS purchase_us, " +
          "CASE WHEN fresh THEN p_val END AS purchase_value, " +
          "fresh AS matched FROM (" +
          "SELECT l.event_id, l.user_id, epoch_us(l.ts) AS err_us, " +
          "epoch_us(r.ts) AS p_us, r.value AS p_val, " +
          "coalesce(epoch_us(l.ts) - epoch_us(r.ts) <= 1800000000, FALSE) " +
          "AS fresh " +
          "FROM (SELECT * FROM events WHERE event_type = 'error') l " +
          "ASOF LEFT JOIN (SELECT user_id, ts, value FROM " +
          "(SELECT user_id, ts, event_id, value, row_number() OVER " +
          "(PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn " +
          "FROM events WHERE event_type = 'purchase') WHERE rn = 1) r " +
          "ON l.user_id = r.user_id AND l.ts >= r.ts)"),
      "q_gapfill" ->
        ("WITH daily AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, " +
          "count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value " +
          "FROM events GROUP BY 1, 2), " +
          "spans AS (SELECT user_id, min(day) AS mn, max(day) AS mx FROM daily GROUP BY 1), " +
          "grid AS (SELECT user_id, CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS day " +
          "FROM spans) " +
          "SELECT g.user_id, g.day, coalesce(d.n, 0) AS n_events, d.day_value, " +
          "last_value(d.day_value IGNORE NULLS) OVER " +
          "(PARTITION BY g.user_id ORDER BY g.day ROWS UNBOUNDED PRECEDING) AS locf_value " +
          "FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day"),
      "q_grouping_sets" ->
        ("SELECT event_type, cohort, " +
          "CAST(grouping(event_type) AS BIGINT) AS g_type, " +
          "CAST(grouping(cohort) AS BIGINT) AS g_cohort, " +
          "count(*) AS n, " +
          "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value " +
          "FROM (SELECT event_type, user_id % 10 AS cohort, value FROM events) " +
          "GROUP BY GROUPING SETS ((event_type, cohort), (event_type), (cohort))"),
      "q_histogram" ->
        ("WITH b AS (SELECT event_type, min(value) AS mn, max(value) AS mx " +
          "FROM events WHERE value IS NOT NULL GROUP BY 1), " +
          "q AS (SELECT e.event_type, CASE WHEN mx = mn THEN 0 " +
          "ELSE least(9, CAST(floor((value - mn) * 10 / (mx - mn)) AS BIGINT)) " +
          "END AS bin, mn, mx FROM events e JOIN b USING (event_type) " +
          "WHERE value IS NOT NULL) " +
          "SELECT event_type, bin, mn + bin * (mx - mn) / 10 AS bin_lo, " +
          "mn + (bin + 1) * (mx - mn) / 10 AS bin_hi, count(*) AS n " +
          "FROM q GROUP BY event_type, bin, mn, mx"),
      "q_cube" ->
        ("SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, " +
          "count(*) AS n FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)"),
      "q1_agg" ->
        ("SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, " +
          "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price, " +
          "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
          "CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price, " +
          "count(*) AS count_order " +
          "FROM lineitem GROUP BY l_returnflag, l_linestatus"),
      "q3_join_topk" ->
        ("SELECT o.o_orderkey AS orderkey, " +
          "CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * " +
          "CAST(1 - l.l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue " +
          "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey " +
          "JOIN customer c ON o.o_custkey = c.c_custkey " +
          "WHERE c.c_mktsegment = 'BUILDING' " +
          "GROUP BY o.o_orderkey ORDER BY revenue DESC, orderkey LIMIT 10"),
      "q_cochran_q" ->
        // Per-subject max-of-indicator flags; exact BIGINT aggregates,
        // one division (constant rows cancel in the denominator).
        ("WITH per AS (SELECT user_id, " +
          "max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) " +
          "AS x0, " +
          "max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS x1, " +
          "max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS x2 " +
          "FROM events GROUP BY 1), " +
          "t AS (SELECT CAST(sum(x0) AS BIGINT) AS c0, " +
          "CAST(sum(x1) AS BIGINT) AS c1, " +
          "CAST(sum(x2) AS BIGINT) AS c2, " +
          "CAST(sum(x0 + x1 + x2) AS BIGINT) AS sr, " +
          "CAST(sum((x0 + x1 + x2) * (x0 + x1 + x2)) AS BIGINT) AS srr, " +
          "CAST(count(*) AS BIGINT) AS n_subjects FROM per) " +
          "SELECT n_subjects, CAST(3 AS BIGINT) AS k, " +
          "CASE WHEN 3 * sr - srr = 0 THEN NULL ELSE " +
          "CAST(2 * (3 * (c0 * c0 + c1 * c1 + c2 * c2) - " +
          "(c0 + c1 + c2) * (c0 + c1 + c2)) AS DOUBLE) / " +
          "CAST(3 * sr - srr AS DOUBLE) END AS q_stat, " +
          "CAST(2 AS BIGINT) AS df FROM t"),
      "q_conformal_interval" ->
        // Same split arithmetic; q-hat is an exact element pick at rank
        // least(n, ceil((n+1)*0.9)); 1.0-0.1 and the 0.9 literal are the
        // same IEEE double, so both engines pick identical ranks.
        ("WITH b AS (SELECT event_type AS g, event_id AS i, " +
          "CAST(floor(value * 1024.0) AS BIGINT) AS v, " +
          "CASE WHEN event_id % 4 <= 1 THEN 0 " +
          "WHEN event_id % 4 = 2 THEN 1 ELSE 2 END AS s FROM events " +
          "WHERE event_type IS NOT NULL AND value IS NOT NULL), " +
          "m AS (SELECT g, CAST(sum(CAST(v AS HUGEINT)) AS DOUBLE) / " +
          "CAST(count(*) AS DOUBLE) AS mu FROM b WHERE s = 0 " +
          "GROUP BY 1), " +
          "r AS (SELECT b.g AS g, b.i AS i, " +
          "abs(CAST(b.v AS DOUBLE) - m.mu) AS r FROM b " +
          "JOIN m ON b.g = m.g WHERE b.s = 1), " +
          "rk AS (SELECT g, r, row_number() OVER (PARTITION BY g " +
          "ORDER BY r, i) AS rn, count(*) OVER (PARTITION BY g) AS n " +
          "FROM r), " +
          "q AS (SELECT g, CAST(n AS BIGINT) AS n_cal, r AS qhat " +
          "FROM rk WHERE rn = least(n, CAST(ceil(" +
          "CAST(n + 1 AS DOUBLE) * 0.9) AS BIGINT))), " +
          "tt AS (SELECT b.g AS g, q.n_cal, q.qhat, " +
          "CAST(count(*) AS BIGINT) AS n_test, " +
          "CAST(sum(CASE WHEN abs(CAST(b.v AS DOUBLE) - m.mu) <= " +
          "q.qhat THEN 1 ELSE 0 END) AS BIGINT) AS cov FROM b " +
          "JOIN m ON b.g = m.g JOIN q ON b.g = q.g WHERE b.s = 2 " +
          "GROUP BY 1, 2, 3) " +
          "SELECT g AS grp, n_cal, qhat, n_test, " +
          "CAST(cov AS DOUBLE) / CAST(n_test AS DOUBLE) AS coverage " +
          "FROM tt"),
      "q_friedman" -> {
        def lt(a: String, b: String) =
          s"(CASE WHEN $a < $b THEN 1 ELSE 0 END)"
        def eq(a: String, b: String) =
          s"(CASE WHEN $a = $b THEN 1 ELSE 0 END)"
        def r2(j: Int) = {
          val o = Seq(0, 1, 2).filter(_ != j).map(l => s"x$l")
          s"CAST(2 * (${lt(o(0), s"x$j")} + ${lt(o(1), s"x$j")}) + " +
            s"(1 + ${eq(o(0), s"x$j")} + ${eq(o(1), s"x$j")}) + 1 " +
            "AS HUGEINT)"
        }
        val qExpr = "CAST(s0 * s0 + s1 * s1 + s2x * s2x AS DOUBLE) / " +
          "(4.0 * CAST(n AS DOUBLE)) - 12.0 * CAST(n AS DOUBLE)"
        "WITH per AS (SELECT user_id, " +
          "coalesce(sum(CASE WHEN event_type = 'purchase' THEN " +
          "CAST(floor(value * 1024.0) AS BIGINT) ELSE 0 END), 0) AS x0, " +
          "coalesce(sum(CASE WHEN event_type = 'click' THEN " +
          "CAST(floor(value * 1024.0) AS BIGINT) ELSE 0 END), 0) AS x1, " +
          "coalesce(sum(CASE WHEN event_type = 'view' THEN " +
          "CAST(floor(value * 1024.0) AS BIGINT) ELSE 0 END), 0) AS x2 " +
          "FROM events GROUP BY 1), " +
          s"r AS (SELECT ${r2(0)} AS r0, ${r2(1)} AS r1, " +
          s"${r2(2)} AS r2v, " +
          "CAST(CASE WHEN eqp = 3 THEN 24 WHEN eqp = 1 THEN 6 ELSE 0 " +
          "END AS HUGEINT) AS t FROM (SELECT x0, x1, x2, " +
          s"${eq("x0", "x1")} + ${eq("x0", "x2")} + ${eq("x1", "x2")} " +
          "AS eqp FROM per)), " +
          "tot AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
          "sum(r0) AS s0, sum(r1) AS s1, sum(r2v) AS s2x, " +
          "coalesce(sum(t), 0) AS ts FROM r) " +
          "SELECT n, CAST(3 AS BIGINT) AS k, " +
          s"CASE WHEN n = 0 THEN NULL ELSE $qExpr END AS q_stat, " +
          "CASE WHEN n = 0 OR CAST(n AS HUGEINT) * 24 - ts <= 0 " +
          s"THEN NULL ELSE ($qExpr) * " +
          "CAST(CAST(n AS HUGEINT) * 24 AS DOUBLE) / " +
          "CAST(CAST(n AS HUGEINT) * 24 - ts AS DOUBLE) END AS q_tie " +
          "FROM tot"
      },
      "q_dbscan_grid" ->
        // Same grid; adjacency via |dx|<=1 ∧ |dy|<=1 (y < 24 so the
        // engine's packed-key arithmetic can never wrap), min-id
        // closure via recursive reach.
        ("WITH RECURSIVE c AS (SELECT CAST(floor(value) AS BIGINT) AS x, " +
          "epoch_us(ts) // 3600000000 % 24 AS y, " +
          "CAST(count(*) AS BIGINT) AS n FROM events " +
          "WHERE value IS NOT NULL AND ts IS NOT NULL GROUP BY 1, 2), " +
          "core AS (SELECT x, y, n, x * 100000 + y AS cell FROM c " +
          "WHERE n >= 8), " +
          "e0 AS (SELECT a.cell AS ca, b.cell AS cb FROM core a " +
          "JOIN core b ON abs(a.x - b.x) <= 1 AND abs(a.y - b.y) <= 1 " +
          "AND a.cell < b.cell), " +
          "edges AS (SELECT ca AS src, cb AS dst FROM e0 " +
          "UNION SELECT cb, ca FROM e0), " +
          "reach(id, r) AS (SELECT DISTINCT src, src FROM edges " +
          "UNION SELECT e.src, reach.r FROM edges e " +
          "JOIN reach ON e.dst = reach.id), " +
          "lab AS (SELECT id AS cell, min(r) AS comp FROM reach " +
          "GROUP BY 1) " +
          "SELECT coalesce(lab.comp, core.cell) AS cluster_id, " +
          "CAST(count(*) AS BIGINT) AS n_cells, " +
          "CAST(sum(core.n) AS BIGINT) AS n_points, " +
          "min(core.x) AS min_x, max(core.x) AS max_x, " +
          "min(core.y) AS min_y, max(core.y) AS max_y " +
          "FROM core LEFT JOIN lab ON core.cell = lab.cell GROUP BY 1"),
      "q_hierarchy_rollup" ->
        // Ancestor chains by integer division by powers of two — the
        // same arithmetic as the engine, no WITH RECURSIVE needed.
        ("WITH b AS (SELECT doc_id + 1 AS node, n_chars FROM documents " +
          "WHERE doc_id + 1 >= 1), " +
          "e AS (SELECT unnest(list_filter(list_transform(range(0, 32), " +
          "k -> node // CAST(pow(2, k) AS BIGINT)), a -> a >= 1)) " +
          "AS node_id, n_chars FROM b), " +
          "g AS (SELECT node_id, CAST(count(*) AS BIGINT) AS n_subtree, " +
          "CAST(sum(n_chars) AS BIGINT) AS sum_val FROM e GROUP BY 1) " +
          "SELECT CAST(node_id AS BIGINT) AS node_id, " +
          "CAST(len(list_filter(list_transform(range(0, 32), " +
          "k -> node_id // CAST(pow(2, k) AS BIGINT)), a -> a >= 1)) - 1 " +
          "AS BIGINT) AS depth, n_subtree, sum_val FROM g " +
          "WHERE node_id < 64"),
      "q_benjamini_hochberg" ->
        // Per-nation z mirrors q_abtest's shape; p via the A&S 7.1.26
        // erfc Horner chain (verbatim the engine's operation order);
        // step-up kstar over the O(m) ranked rows.
        ("WITH g AS (SELECT c_nationkey AS grp, " +
          "CAST(coalesce(sum(CASE WHEN o_custkey % 2 = 0 THEN 1 ELSE 0 " +
          "END), 0) AS BIGINT) AS n_a, " +
          "CAST(coalesce(sum(CASE WHEN o_custkey % 2 = 0 AND " +
          "o_totalprice > 250000.0 THEN 1 ELSE 0 END), 0) AS BIGINT) " +
          "AS x_a, " +
          "CAST(coalesce(sum(CASE WHEN o_custkey % 2 <> 0 THEN 1 ELSE 0 " +
          "END), 0) AS BIGINT) AS n_b, " +
          "CAST(coalesce(sum(CASE WHEN o_custkey % 2 <> 0 AND " +
          "o_totalprice > 250000.0 THEN 1 ELSE 0 END), 0) AS BIGINT) " +
          "AS x_b FROM orders JOIN customer ON o_custkey = c_custkey " +
          "GROUP BY 1), " +
          "zc AS (SELECT grp, n_a, x_a, n_b, x_b, " +
          "CASE WHEN n_a = 0 OR n_b = 0 OR den <= 0.0 THEN NULL " +
          "ELSE (pa - pb) / den END AS z FROM (" +
          "SELECT *, CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS pa, " +
          "CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS pb, " +
          "sqrt((CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)) " +
          "* (1.0 - CAST(x_a + x_b AS DOUBLE) / " +
          "CAST(n_a + n_b AS DOUBLE)) * (1.0 / CAST(n_a AS DOUBLE) " +
          "+ 1.0 / CAST(n_b AS DOUBLE))) AS den FROM g)), " +
          "pc AS (SELECT *, CASE WHEN z IS NULL THEN NULL ELSE " +
          "(1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0)))) * " +
          "(0.254829592 + (1.0 / (1.0 + 0.3275911 * (abs(z) / " +
          "sqrt(2.0)))) * (-0.284496736 + (1.0 / (1.0 + 0.3275911 * " +
          "(abs(z) / sqrt(2.0)))) * (1.421413741 + (1.0 / (1.0 + " +
          "0.3275911 * (abs(z) / sqrt(2.0)))) * (-1.453152027 + (1.0 / " +
          "(1.0 + 0.3275911 * (abs(z) / sqrt(2.0)))) * 1.061405429))))" +
          " * exp(-((abs(z) / sqrt(2.0)) * (abs(z) / sqrt(2.0)))) " +
          "END AS p FROM zc), " +
          "r AS (SELECT *, CASE WHEN p IS NULL THEN NULL ELSE " +
          "CAST(row_number() OVER (PARTITION BY (p IS NOT NULL) " +
          "ORDER BY p ASC, grp ASC) AS BIGINT) END AS k, " +
          "CAST(sum(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END) " +
          "OVER () AS BIGINT) AS m FROM pc), " +
          "ks AS (SELECT *, max(CASE WHEN p <= CAST(k AS DOUBLE) * 0.05 " +
          "/ CAST(m AS DOUBLE) THEN k END) OVER () AS kstar FROM r) " +
          "SELECT grp, n_a, x_a, n_b, x_b, z, p, k, m, " +
          "(k IS NOT NULL AND kstar IS NOT NULL AND k <= kstar) " +
          "AS rejected FROM ks"),
      "q_avg_precision" ->
        ("WITH b AS (SELECT CASE WHEN event_type = 'purchase' THEN 1 " +
          "ELSE 0 END AS y, value AS s, event_id AS id FROM events " +
          "WHERE value IS NOT NULL), " +
          "r AS (SELECT y, row_number() OVER (ORDER BY s DESC, id) " +
          "AS rk, sum(y) OVER (ORDER BY s DESC, id " +
          "ROWS UNBOUNDED PRECEDING) AS cp FROM b) " +
          "SELECT CAST(count(*) AS BIGINT) AS n_pos, " +
          "CAST(coalesce(sum((1000000 * cp) // rk), 0) AS BIGINT) " +
          "AS sum_prec_scaled, " +
          "CASE WHEN count(*) > 0 THEN " +
          "CAST(coalesce(sum((1000000 * cp) // rk), 0) AS DOUBLE) / " +
          "(CAST(count(*) AS DOUBLE) * 1e6) END AS avg_precision " +
          "FROM r WHERE y = 1"),
      "q_classifier_eval" -> {
        val n = "CAST(n AS DOUBLE)"
        val pe = s"(CAST(tp + fp AS DOUBLE) / $n) * " +
          s"(CAST(tp + fn AS DOUBLE) / $n) + " +
          s"(CAST(fn + tn AS DOUBLE) / $n) * " +
          s"(CAST(fp + tn AS DOUBLE) / $n)"
        "WITH c AS (SELECT " +
          "CAST(coalesce(sum(CASE WHEN value >= 50.0 AND " +
          "event_type = 'purchase' THEN 1 ELSE 0 END), 0) AS BIGINT) " +
          "AS tp, " +
          "CAST(coalesce(sum(CASE WHEN value >= 50.0 AND " +
          "NOT event_type = 'purchase' THEN 1 ELSE 0 END), 0) AS BIGINT) " +
          "AS fp, " +
          "CAST(coalesce(sum(CASE WHEN NOT value >= 50.0 AND " +
          "event_type = 'purchase' THEN 1 ELSE 0 END), 0) AS BIGINT) " +
          "AS fn, " +
          "CAST(coalesce(sum(CASE WHEN NOT value >= 50.0 AND " +
          "NOT event_type = 'purchase' THEN 1 ELSE 0 END), 0) AS BIGINT) " +
          "AS tn FROM events WHERE value IS NOT NULL), " +
          "m AS (SELECT *, tp + fp + fn + tn AS n FROM c) " +
          "SELECT tp, fp, fn, tn, CAST(n AS BIGINT) AS n, " +
          s"CASE WHEN n > 0 THEN CAST(tp + tn AS DOUBLE) / $n END " +
          "AS accuracy, " +
          "CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / " +
          "CAST(tp + fp AS DOUBLE) END AS precision, " +
          "CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / " +
          "CAST(tp + fn AS DOUBLE) END AS recall, " +
          "CASE WHEN 2 * tp + fp + fn > 0 THEN " +
          "(2.0 * CAST(tp AS DOUBLE)) / " +
          "CAST(2 * tp + fp + fn AS DOUBLE) END AS f1, " +
          s"CASE WHEN n > 0 THEN CASE WHEN $pe < 1.0 THEN " +
          s"((CAST(tp + tn AS DOUBLE) / $n) - ($pe)) / (1.0 - ($pe)) " +
          "END END AS kappa, " +
          "CASE WHEN sqrt(CAST(tp + fp AS DOUBLE)) * " +
          "sqrt(CAST(tp + fn AS DOUBLE)) * " +
          "sqrt(CAST(tn + fp AS DOUBLE)) * " +
          "sqrt(CAST(tn + fn AS DOUBLE)) > 0.0 THEN " +
          "(CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE) - " +
          "CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE)) / " +
          "(sqrt(CAST(tp + fp AS DOUBLE)) * " +
          "sqrt(CAST(tp + fn AS DOUBLE)) * " +
          "sqrt(CAST(tn + fp AS DOUBLE)) * " +
          "sqrt(CAST(tn + fn AS DOUBLE))) END AS mcc FROM m"
      },
      "q_delta_ratio" -> {
        // Mirrors Profile.deltaMethodRatio float-for-float: exact
        // HUGEINT moment sums, n·Σm − S·S subtracted exactly, one cast,
        // the same associativity in every derived expression.
        def varOf(s: String) = {
          def v(m: String, p: String, q2: String) =
            s"CAST(CAST(n_$s AS HUGEINT) * ${m}_$s - " +
              s"CAST(${p}_$s AS HUGEINT) * ${q2}_$s AS DOUBLE) / " +
              s"(CAST(n_$s AS DOUBLE) * CAST(n_$s - 1 AS DOUBLE))"
          val vxx = v("sxx", "sx", s"sx")
          val vyy = v("syy", "sy", s"sy")
          val vxy = v("sxy", "sx", s"sy")
          val rq = s"(CAST(sx_$s AS DOUBLE) / CAST(sy_$s AS DOUBLE))"
          val ybar = s"(CAST(sy_$s AS DOUBLE) / CAST(n_$s AS DOUBLE))"
          s"(($vxx) - 2.0 * $rq * ($vxy) + $rq * $rq * ($vyy)) / " +
            s"(CAST(n_$s AS DOUBLE) * $ybar * $ybar)"
        }
        def ratioOf(s: String) =
          s"(CAST(sx_$s AS DOUBLE) / CAST(sy_$s AS DOUBLE) / 100.0)"
        def seOf(s: String) =
          s"(CASE WHEN ${varOf(s)} >= 0.0 THEN sqrt(${varOf(s)}) / 100.0 " +
            "END)"
        def okOf(s: String) = s"(n_$s >= 2 AND sy_$s > 0)"
        def pick(c: String, a: Int, as: String) =
          s"max(CASE WHEN a = $a THEN $c END) AS ${as}"
        "WITH u AS (SELECT user_id AS uu, " +
          "CASE WHEN ((user_id % 2) + 2) % 2 = 0 THEN 1 ELSE 0 END AS a, " +
          "coalesce(CAST(floor(value * 100.0) AS BIGINT), 0) AS q " +
          "FROM events), " +
          "g AS (SELECT uu, a, CAST(sum(q) AS BIGINT) AS x, " +
          "CAST(count(*) AS BIGINT) AS y FROM u GROUP BY uu, a), " +
          "m AS (SELECT a, CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, " +
          "sum(CAST(x AS HUGEINT) * x) AS sxx, " +
          "sum(CAST(y AS HUGEINT) * y) AS syy, " +
          "sum(CAST(x AS HUGEINT) * y) AS sxy FROM g GROUP BY a), " +
          "w AS (SELECT " +
          Seq(pick("n", 1, "n_a"), pick("n", 0, "n_b"),
            pick("sx", 1, "sx_a"), pick("sx", 0, "sx_b"),
            pick("sy", 1, "sy_a"), pick("sy", 0, "sy_b"),
            pick("sxx", 1, "sxx_a"), pick("sxx", 0, "sxx_b"),
            pick("syy", 1, "syy_a"), pick("syy", 0, "syy_b"),
            pick("sxy", 1, "sxy_a"), pick("sxy", 0, "sxy_b"))
            .mkString(", ") +
          " FROM m) " +
          "SELECT n_a, n_b, " +
          s"CASE WHEN ${okOf("a")} THEN ${ratioOf("a")} END AS ratio_a, " +
          s"CASE WHEN ${okOf("b")} THEN ${ratioOf("b")} END AS ratio_b, " +
          s"CASE WHEN ${okOf("a")} THEN ${seOf("a")} END AS se_a, " +
          s"CASE WHEN ${okOf("b")} THEN ${seOf("b")} END AS se_b, " +
          s"CASE WHEN ${okOf("a")} AND ${okOf("b")} THEN " +
          s"CASE WHEN ${seOf("a")} * ${seOf("a")} + " +
          s"${seOf("b")} * ${seOf("b")} > 0.0 THEN " +
          s"(${ratioOf("a")} - ${ratioOf("b")}) / " +
          s"sqrt(${seOf("a")} * ${seOf("a")} + ${seOf("b")} * ${seOf("b")}) " +
          "END END AS z FROM w"
      },
      "q_ece" ->
        ("WITH b AS (SELECT least(CAST(floor(value * 2000.0) AS BIGINT), " +
          "1000000) AS pm, CASE WHEN event_type = 'purchase' THEN 1 " +
          "ELSE 0 END AS y FROM events WHERE value IS NOT NULL), " +
          "g AS (SELECT least((pm * 20) // 1000000, 19) AS bin, " +
          "count(*) AS nb, sum(y) AS np, sum(pm) AS sp FROM b " +
          "GROUP BY 1) " +
          "SELECT CAST(coalesce(sum(nb), 0) AS BIGINT) AS n, " +
          "CAST(count(*) AS BIGINT) AS n_bins_used, " +
          "CAST(coalesce(sum(abs(np * 1000000 - sp)), 0) AS BIGINT) " +
          "AS ece_num, " +
          "CASE WHEN coalesce(sum(nb), 0) > 0 THEN " +
          "CAST(coalesce(sum(abs(np * 1000000 - sp)), 0) AS DOUBLE) / " +
          "(CAST(sum(nb) AS DOUBLE) * 1e6) END AS ece FROM g"),
      "q_bucketed_join" ->
        ("SELECT c.c_mktsegment, count(*) AS n_orders, " +
          "CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue " +
          "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey " +
          "GROUP BY c.c_mktsegment"),
      "q_cohort_ltv" ->
        ("WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day, " +
          "CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END " +
          "AS rev FROM events), " +
          "c AS (SELECT user_id, min(day) AS cohort_day FROM e " +
          "GROUP BY 1), " +
          "d AS (SELECT cohort_day, day - cohort_day AS age_day, " +
          "count(DISTINCT e.user_id) AS n_active, " +
          "sum(CAST(rev AS DECIMAL(18,2))) AS rev " +
          "FROM e JOIN c USING (user_id) GROUP BY 1, 2) " +
          "SELECT cohort_day, age_day, n_active, " +
          "CAST(rev AS DOUBLE) AS day_revenue, " +
          "CAST(sum(rev) OVER (PARTITION BY cohort_day ORDER BY age_day " +
          "ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_revenue FROM d"),
      "q_histogram2d" ->
        ("WITH r AS (SELECT CAST(l_quantity AS DOUBLE) AS x, " +
          "CAST(l_extendedprice AS DOUBLE) AS y FROM lineitem " +
          "WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL), " +
          "b AS (SELECT min(x) AS xmn, max(x) AS xmx, min(y) AS ymn, " +
          "max(y) AS ymx FROM r), " +
          "g AS (SELECT CASE WHEN xmx = xmn THEN 0 ELSE least(7, " +
          "CAST(floor((x - xmn) * 8 / (xmx - xmn)) AS BIGINT)) END " +
          "AS bin_x, CASE WHEN ymx = ymn THEN 0 ELSE least(7, " +
          "CAST(floor((y - ymn) * 8 / (ymx - ymn)) AS BIGINT)) END " +
          "AS bin_y, xmn, xmx, ymn, ymx FROM r, b) " +
          "SELECT bin_x, bin_y, " +
          "xmn + bin_x * (xmx - xmn) / 8 AS x_lo, " +
          "xmn + (bin_x + 1) * (xmx - xmn) / 8 AS x_hi, " +
          "ymn + bin_y * (ymx - ymn) / 8 AS y_lo, " +
          "ymn + (bin_y + 1) * (ymx - ymn) / 8 AS y_hi, " +
          "count(*) AS n FROM g " +
          "GROUP BY bin_x, bin_y, xmn, xmx, ymn, ymx"),
      "q_dup_inflation" ->
        (s"WITH cl AS ($clustersSql), " +
          "cn AS (SELECT d.doc_id, " +
          "coalesce(cl.canon_id, d.doc_id) AS canon_id " +
          "FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id), " +
          "sz AS (SELECT canon_id, count(*) AS cluster_size FROM cn " +
          "GROUP BY 1) " +
          "SELECT cluster_size, count(*) AS n_clusters, " +
          "CAST(sum(cluster_size) AS BIGINT) AS n_docs FROM sz " +
          "GROUP BY 1"),
      "q_bitemporal" ->
        // tx1 = the pre-change baseline, tx2 = the applied-changes dim;
        // identical valid-time as-of filter on both transaction views.
        (s"WITH s2 AS ($scd2Sql), " +
          "tx1 AS (SELECT c_custkey, 'OLDSEG' AS c_mktsegment, " +
          "c_acctbal - 5.0 AS c_acctbal, " +
          "CAST(-1000000 AS BIGINT) AS valid_from_us, " +
          "CAST(0 AS BIGINT) AS valid_to_us FROM customer " +
          "WHERE c_custkey % 5 = 0 " +
          "UNION ALL SELECT c_custkey, c_mktsegment, c_acctbal, " +
          "CAST(0 AS BIGINT), CAST(NULL AS BIGINT) FROM customer) " +
          "SELECT CAST(1 AS BIGINT) AS tx, c_custkey, c_mktsegment, " +
          "c_acctbal FROM tx1 WHERE valid_from_us <= 1500 AND " +
          "(valid_to_us IS NULL OR valid_to_us > 1500) " +
          "AND c_custkey % 10 = 0 " +
          "UNION ALL SELECT CAST(2 AS BIGINT), c_custkey, c_mktsegment, " +
          "c_acctbal FROM s2 WHERE valid_from_us <= 1500 AND " +
          "(valid_to_us IS NULL OR valid_to_us > 1500) " +
          "AND c_custkey % 10 = 0"),
      "q_diff" ->
        ("WITH l AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders), " +
          "r AS (SELECT o_orderkey, o_orderstatus, " +
          "CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.0 " +
          "ELSE o_totalprice END AS o_totalprice FROM orders " +
          "WHERE o_orderkey % 97 <> 0 " +
          "UNION ALL SELECT o_orderkey + 100000000, o_orderstatus, " +
          "o_totalprice FROM orders WHERE o_orderkey % 101 = 0), " +
          "j AS (SELECT coalesce(l.o_orderkey, r.o_orderkey) AS o_orderkey, " +
          "l.o_orderkey IS NOT NULL AS lp, r.o_orderkey IS NOT NULL AS rp, " +
          "list_sort(list_filter([" +
          "CASE WHEN l.o_orderstatus IS DISTINCT FROM r.o_orderstatus " +
          "THEN 'o_orderstatus' END, " +
          "CASE WHEN l.o_totalprice IS DISTINCT FROM r.o_totalprice " +
          "THEN 'o_totalprice' END], v -> v IS NOT NULL)) AS ch " +
          "FROM l FULL JOIN r ON l.o_orderkey = r.o_orderkey) " +
          "SELECT o_orderkey, CASE WHEN NOT rp THEN 'delete' " +
          "WHEN NOT lp THEN 'insert' " +
          "WHEN len(ch) > 0 THEN 'update' END AS change_type, " +
          // array_to_string is string_agg under the hood: NULL on an
          // empty list, where Spark's array_join yields '' — coalesce.
          "coalesce(array_to_string(CASE WHEN lp AND rp THEN ch " +
          "ELSE CAST([] AS VARCHAR[]) END, ','), '') " +
          "AS changed_cols FROM j " +
          "WHERE (NOT rp) OR (NOT lp) OR len(ch) > 0"),
      "q_funnel_ttc" ->
        ("WITH s1 AS (SELECT user_id, min(epoch_us(ts)) AS t1 " +
          "FROM events WHERE event_type = 'view' GROUP BY user_id), " +
          "s2 AS (SELECT s1.user_id, s1.t1, " +
          "min(CASE WHEN epoch_us(e.ts) > s1.t1 THEN epoch_us(e.ts) END) AS t2 " +
          "FROM s1 LEFT JOIN events e ON e.user_id = s1.user_id " +
          "AND e.event_type = 'click' GROUP BY s1.user_id, s1.t1), " +
          "s3 AS (SELECT s2.user_id, s2.t1, s2.t2, " +
          "min(CASE WHEN epoch_us(e.ts) > s2.t2 THEN epoch_us(e.ts) END) AS t3 " +
          "FROM s2 LEFT JOIN events e ON e.user_id = s2.user_id " +
          "AND e.event_type = 'purchase' GROUP BY s2.user_id, s2.t1, s2.t2), " +
          "g AS (SELECT t3 - t1 AS d FROM s3 " +
          "WHERE t1 IS NOT NULL AND t3 IS NOT NULL), " +
          "t AS (SELECT count(*) AS n_converted, " +
          "CAST(sum(d) AS BIGINT) AS s, min(d) AS min_gap, " +
          "max(d) AS max_gap FROM g), " +
          "cm AS (SELECT d, CAST(sum(count(*)) OVER (ORDER BY d " +
          "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM g GROUP BY d), " +
          "md AS (SELECT min(CASE WHEN cum >= (n_converted + 1) // 2 " +
          "THEN d END) AS median_gap FROM cm, t) " +
          "SELECT n_converted, min_gap, max_gap, " +
          "CAST(s AS DOUBLE) / CAST(n_converted AS DOUBLE) AS mean_gap, " +
          "median_gap FROM t, md"),
      "q_funnel" ->
        ("WITH s1 AS (SELECT user_id, min(epoch_us(ts)) AS t1 " +
          "FROM events WHERE event_type = 'view' GROUP BY user_id), " +
          "s2 AS (SELECT s1.user_id, s1.t1, " +
          "min(CASE WHEN epoch_us(e.ts) > s1.t1 THEN epoch_us(e.ts) END) AS t2 " +
          "FROM s1 LEFT JOIN events e ON e.user_id = s1.user_id " +
          "AND e.event_type = 'click' GROUP BY s1.user_id, s1.t1), " +
          "s3 AS (SELECT s2.user_id, s2.t1, s2.t2, " +
          "min(CASE WHEN epoch_us(e.ts) > s2.t2 THEN epoch_us(e.ts) END) AS t3 " +
          "FROM s2 LEFT JOIN events e ON e.user_id = s2.user_id " +
          "AND e.event_type = 'purchase' GROUP BY s2.user_id, s2.t1, s2.t2) " +
          "SELECT user_id, t1, t2, t3, CAST(1 + " +
          "CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END + " +
          "CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) " +
          "AS stages_completed FROM s3"),
      "q_funnel_by_arm" -> {
        val pa = "(CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE))"
        val pb = "(CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE))"
        val pp = "(CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))"
        val den = s"sqrt($pp * (1.0 - $pp) * " +
          "(1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))"
        val arm = "((user_id % 2) + 2) % 2 = 0"
        val conv = "t2 IS NOT NULL AND t3 IS NOT NULL"
        "WITH s1 AS (SELECT user_id, min(epoch_us(ts)) AS t1 " +
          "FROM events WHERE event_type = 'view' GROUP BY user_id), " +
          "s2 AS (SELECT s1.user_id, s1.t1, " +
          "min(CASE WHEN epoch_us(e.ts) > s1.t1 THEN epoch_us(e.ts) END) " +
          "AS t2 FROM s1 LEFT JOIN events e ON e.user_id = s1.user_id " +
          "AND e.event_type = 'click' GROUP BY s1.user_id, s1.t1), " +
          "s3 AS (SELECT s2.user_id, s2.t1, s2.t2, " +
          "min(CASE WHEN epoch_us(e.ts) > s2.t2 THEN epoch_us(e.ts) END) " +
          "AS t3 FROM s2 LEFT JOIN events e ON e.user_id = s2.user_id " +
          "AND e.event_type = 'purchase' GROUP BY s2.user_id, s2.t1, " +
          "s2.t2), " +
          "c AS (SELECT " +
          s"CAST(coalesce(sum(CASE WHEN $arm THEN 1 ELSE 0 END), 0) " +
          "AS BIGINT) AS n_a, " +
          s"CAST(coalesce(sum(CASE WHEN $arm AND $conv THEN 1 ELSE 0 " +
          "END), 0) AS BIGINT) AS x_a, " +
          s"CAST(coalesce(sum(CASE WHEN NOT ($arm) THEN 1 ELSE 0 END), " +
          "0) AS BIGINT) AS n_b, " +
          s"CAST(coalesce(sum(CASE WHEN NOT ($arm) AND $conv THEN 1 " +
          "ELSE 0 END), 0) AS BIGINT) AS x_b FROM s3) " +
          "SELECT n_a, x_a, n_b, x_b, " +
          s"CASE WHEN n_a = 0 THEN NULL ELSE $pa END AS p_a, " +
          s"CASE WHEN n_b = 0 THEN NULL ELSE $pb END AS p_b, " +
          s"CASE WHEN n_a = 0 OR n_b = 0 OR $den <= 0.0 THEN NULL " +
          s"ELSE ($pa - $pb) / $den END AS z FROM c"
      },
      "q_ewma" ->
        ("WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, value " +
          "FROM events WHERE user_id < 20), " +
          "g AS (SELECT user_id, list(struct_pack(ts := ts_us, " +
          "id := event_id, x := value) ORDER BY ts_us, event_id, value) AS s " +
          "FROM e GROUP BY user_id) " +
          "SELECT user_id, r.ts AS ts_us, r.id AS event_id, r.x AS value, " +
          "r.ew AS ewma FROM (SELECT user_id, " +
          "unnest(list_transform(range(1, len(s) + 1), j -> struct_pack(" +
          "ts := s[j].ts, id := s[j].id, x := s[j].x, " +
          "ew := list_reduce(list_transform(list_slice(s, 1, j), t -> t.x), " +
          "(p, x) -> 0.25 * x + 0.75 * p)))) AS r FROM g)"),
      "q_expectations" -> {
        val ruleSqls = Seq(
          "quantity_range" -> "l_quantity BETWEEN 1 AND 50",
          "quantity_le_45" -> "l_quantity <= 45",
          "discount_le_005" -> "l_discount <= 0.05",
          "positive_price" -> "l_extendedprice > 0",
          "flag_domain" -> "l_returnflag IN ('A', 'N', 'R')")
        val vs = ruleSqls.zipWithIndex.map { case ((_, p), i) =>
          s"sum(CASE WHEN coalesce($p, FALSE) THEN 0 ELSE 1 END) AS v$i"
        }.mkString(", ")
        val rows = ruleSqls.zipWithIndex.map { case ((name, _), i) =>
          s"SELECT '$name' AS rule, n AS n_checked, " +
            s"CAST(v$i AS BIGINT) AS n_violations, v$i = 0 AS pass FROM a"
        }
        val fk1 = "SELECT 'orderkey_fk', (SELECT count(*) FROM lineitem), " +
          "(SELECT count(*) FROM lineitem l WHERE NOT EXISTS (SELECT 1 " +
          "FROM orders o WHERE o.o_orderkey = l.l_orderkey)), " +
          "(SELECT count(*) FROM lineitem l WHERE NOT EXISTS (SELECT 1 " +
          "FROM orders o WHERE o.o_orderkey = l.l_orderkey)) = 0"
        val fk2 = "SELECT 'custkey_fk', (SELECT count(*) FROM orders), " +
          "(SELECT count(*) FROM orders r WHERE NOT EXISTS (SELECT 1 " +
          "FROM customer c WHERE c.c_custkey = r.o_custkey)), " +
          "(SELECT count(*) FROM orders r WHERE NOT EXISTS (SELECT 1 " +
          "FROM customer c WHERE c.c_custkey = r.o_custkey)) = 0"
        s"WITH a AS (SELECT count(*) AS n, $vs FROM lineitem) " +
          (rows :+ fk1 :+ fk2).mkString(" UNION ALL ")
      },
      "q_benford" -> {
        // SAME driver-computed double literals as the Spark plan —
        // Double.toString round-trips, so DuckDB parses the same value
        val cases = (1 to 9).map(d =>
          s"WHEN digit = $d THEN ${math.log10(1.0 + 1.0 / d)}")
          .mkString(" ")
        "WITH d AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) " +
          "AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit " +
          "FROM orders WHERE o_totalprice >= 1.0), " +
          "o AS (SELECT digit, count(*) AS n_obs FROM d GROUP BY digit), " +
          // full 1..9 spine — absent digits contribute (0-e)^2/e,
          // mirroring the Spark-side empty-cell grid
          "g AS (SELECT CAST(s.range AS BIGINT) AS digit, " +
          "CAST(coalesce(o.n_obs, 0) AS BIGINT) AS n_obs " +
          "FROM range(1,10) s LEFT JOIN o ON s.range = o.digit), " +
          "t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM g) " +
          s"SELECT digit, n_obs, CAST(n AS DOUBLE) * (CASE $cases END) " +
          "AS expected, " +
          "(CAST(n_obs AS DOUBLE) - expected) * " +
          "(CAST(n_obs AS DOUBLE) - expected) / expected AS chi2_term " +
          "FROM g CROSS JOIN t"
      },
      "q_entropy" ->
        ("WITH c AS (SELECT lang, source AS cc, count(*) AS k " +
          "FROM documents GROUP BY 1, 2), " +
          "p AS (SELECT lang, " +
          "list_sort(list(struct_pack(c := cc, k := k))) AS cs, " +
          "CAST(sum(k) AS BIGINT) AS n_rows, " +
          "CAST(count(*) AS BIGINT) AS n_categories FROM c GROUP BY lang) " +
          "SELECT lang, n_rows, n_categories, " +
          "round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
          "list_transform(cs, x -> " +
          "-(CAST(x.k AS DOUBLE) / CAST(n_rows AS DOUBLE)) * " +
          "ln(CAST(x.k AS DOUBLE) / CAST(n_rows AS DOUBLE)))), " +
          "(a, b) -> a + b), 8) AS entropy FROM p"),
      "q_anova" -> {
        val q = "1048576.0"
        val qx = s"CAST(floor(value * $q) AS HUGEINT)"
        val ssb = "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
          "list_transform(cs, x -> x.sd * x.sd / CAST(x.ng AS DOUBLE))), " +
          "(a, b) -> a + b) - std * std / CAST(n AS DOUBLE)"
        val ssw = "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
          "list_transform(cs, x -> x.ssd - x.sd * x.sd / " +
          "CAST(x.ng AS DOUBLE))), (a, b) -> a + b)"
        s"WITH c AS (SELECT event_type AS g, count(*) AS ng, sum($qx) AS s, " +
          s"sum($qx * $qx) AS ss FROM events WHERE event_type IS NOT NULL " +
          "AND value IS NOT NULL GROUP BY event_type), " +
          "p AS (SELECT list(struct_pack(ng := ng, " +
          "sd := CAST(s AS DOUBLE), ssd := CAST(ss AS DOUBLE)) " +
          "ORDER BY g) AS cs, CAST(count(*) AS BIGINT) AS k, " +
          "CAST(sum(ng) AS BIGINT) AS n, CAST(sum(s) AS DOUBLE) AS std " +
          "FROM c), " +
          s"r AS (SELECT k, n AS n_rows, $ssb AS ssb, $ssw AS ssw FROM p) " +
          "SELECT k, n_rows, ssb, ssw, CASE WHEN k < 2 OR n_rows <= k " +
          "OR ssw <= 0 THEN NULL ELSE (ssb / CAST(k - 1 AS DOUBLE)) / " +
          "(ssw / CAST(n_rows - k AS DOUBLE)) END AS f_stat FROM r"
      },
      "q_chi2_residuals" -> {
        val e = "(CAST(rt * ct AS DOUBLE) / nn.n)"
        val d = s"(CAST(o AS DOUBLE) - $e)"
        val shrink = "((1.0 - CAST(rt AS DOUBLE) / nn.n) * " +
          "(1.0 - CAST(ct AS DOUBLE) / nn.n))"
        "WITH base AS (SELECT event_type AS a, " +
          "(epoch_us(ts) // 86400000000) % 7 AS b FROM events), " +
          "cc AS (SELECT a, b, count(*) AS o FROM base GROUP BY a, b), " +
          "ra AS (SELECT a, CAST(sum(o) AS BIGINT) AS rt FROM cc GROUP BY a), " +
          "cb AS (SELECT b, CAST(sum(o) AS BIGINT) AS ct FROM cc GROUP BY b), " +
          "nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cc), " +
          "grid AS (SELECT ra.a, cb.b, ra.rt, cb.ct, " +
          "CAST(coalesce(cc.o, 0) AS BIGINT) AS o " +
          "FROM ra CROSS JOIN cb LEFT JOIN cc ON cc.a = ra.a AND cc.b = cb.b) " +
          "SELECT a, b, o, rt, ct, " +
          s"$e AS expected, " +
          s"CASE WHEN $e > 0.0 THEN $d / sqrt($e) END AS pearson_resid, " +
          s"CASE WHEN $e > 0.0 THEN CASE WHEN $shrink > 0.0 THEN " +
          s"$d / sqrt($e * $shrink) END END AS adj_resid " +
          "FROM grid CROSS JOIN nn"
      },
      "q_chi2" -> {
        // e and d repeated inline (DuckDB lambdas have no let-binding);
        // every repetition is the identical float expression, so the
        // fold replays Spark's term-for-term.
        val e = "(CAST(x.rt * x.ct AS DOUBLE) / nn.n)"
        val d = s"(CAST(x.o AS DOUBLE) - $e)"
        "WITH base AS (SELECT event_type AS a, " +
          "(epoch_us(ts) // 86400000000) % 7 AS b FROM events), " +
          "cc AS (SELECT a, b, count(*) AS o FROM base GROUP BY a, b), " +
          "ra AS (SELECT a, CAST(sum(o) AS BIGINT) AS rt FROM cc GROUP BY a), " +
          "cb AS (SELECT b, CAST(sum(o) AS BIGINT) AS ct FROM cc GROUP BY b), " +
          "nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cc), " +
          "grid AS (SELECT ra.a, cb.b, ra.rt, cb.ct, coalesce(cc.o, 0) AS o " +
          "FROM ra CROSS JOIN cb LEFT JOIN cc ON cc.a = ra.a AND cc.b = cb.b), " +
          "lst AS (SELECT list(struct_pack(rt := rt, ct := ct, o := o) " +
          "ORDER BY a, b) AS cs, CAST(count(DISTINCT a) AS BIGINT) AS r, " +
          "CAST(count(DISTINCT b) AS BIGINT) AS c2 FROM grid) " +
          "SELECT nn.n AS n_rows, l.r, l.c2 AS c, " +
          "(l.r - 1) * (l.c2 - 1) AS dof, " +
          "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
          s"list_transform(l.cs, x -> $d * $d / $e)), " +
          "(p, x) -> p + x) AS chi2 FROM lst l CROSS JOIN nn"
      },
      "q_cramers_v" -> {
        // Same grid + fold as q_chi2, then one division + IEEE sqrt.
        val e = "(CAST(x.rt * x.ct AS DOUBLE) / nn.n)"
        val d = s"(CAST(x.o AS DOUBLE) - $e)"
        "WITH base AS (SELECT event_type AS a, " +
          "(epoch_us(ts) // 86400000000) % 7 AS b FROM events), " +
          "cc AS (SELECT a, b, count(*) AS o FROM base GROUP BY a, b), " +
          "ra AS (SELECT a, CAST(sum(o) AS BIGINT) AS rt FROM cc GROUP BY a), " +
          "cb AS (SELECT b, CAST(sum(o) AS BIGINT) AS ct FROM cc GROUP BY b), " +
          "nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cc), " +
          "grid AS (SELECT ra.a, cb.b, ra.rt, cb.ct, coalesce(cc.o, 0) AS o " +
          "FROM ra CROSS JOIN cb LEFT JOIN cc ON cc.a = ra.a AND cc.b = cb.b), " +
          "lst AS (SELECT list(struct_pack(rt := rt, ct := ct, o := o) " +
          "ORDER BY a, b) AS cs, CAST(count(DISTINCT a) AS BIGINT) AS r, " +
          "CAST(count(DISTINCT b) AS BIGINT) AS c2 FROM grid), " +
          "f AS (SELECT nn.n AS n_rows, l.r, l.c2 AS c, " +
          "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
          s"list_transform(l.cs, x -> $d * $d / $e)), " +
          "(p, x) -> p + x) AS chi2 FROM lst l CROSS JOIN nn) " +
          "SELECT n_rows, r, c, chi2, " +
          "CASE WHEN least(r - 1, c - 1) <= 0 THEN NULL " +
          "ELSE sqrt(chi2 / CAST(n_rows * least(r - 1, c - 1) AS DOUBLE)) " +
          "END AS cramers_v FROM f"
      },
      "q_assoc_rules" ->
        ("WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it " +
          "FROM lineitem WHERE l_partkey % 4 = 0), " +
          "n AS (SELECT CAST(count(DISTINCT bk) AS BIGINT) AS n FROM b), " +
          "si AS (SELECT it, CAST(count(*) AS BIGINT) AS s FROM b " +
          "GROUP BY it), " +
          "pr AS (SELECT x.it AS a, y.it AS b2, " +
          "CAST(count(*) AS BIGINT) AS s_ab FROM b x JOIN b y " +
          "ON x.bk = y.bk AND x.it < y.it GROUP BY 1, 2 " +
          "HAVING count(*) >= 2), " +
          "d AS (SELECT a, b2, s_ab FROM pr " +
          "UNION ALL SELECT b2, a, s_ab FROM pr) " +
          "SELECT d.a AS antecedent, d.b2 AS consequent, d.s_ab, " +
          "sa.s AS s_a, sb.s AS s_b, " +
          "CAST(d.s_ab AS DOUBLE) / CAST(n.n AS DOUBLE) AS support, " +
          "CAST(d.s_ab AS DOUBLE) / CAST(sa.s AS DOUBLE) AS confidence, " +
          "CAST(n.n * d.s_ab AS DOUBLE) / CAST(sa.s * sb.s AS DOUBLE) " +
          "AS lift FROM d JOIN si sa ON sa.it = d.a " +
          "JOIN si sb ON sb.it = d.b2 CROSS JOIN n"),
      "q_auc" ->
        ("WITH b AS (SELECT CASE WHEN event_type = 'purchase' THEN 1 " +
          "ELSE 0 END AS y, CAST(floor(value * 16.0) AS BIGINT) AS q " +
          "FROM events WHERE value IS NOT NULL), " +
          "g AS (SELECT q, CAST(sum(y) AS BIGINT) AS p, " +
          "CAST(count(*) - sum(y) AS BIGINT) AS gg FROM b GROUP BY q), " +
          "c AS (SELECT q, p, gg, CAST(coalesce(sum(gg) OVER (ORDER BY q " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) " +
          "AS BIGINT) AS gb FROM g), " +
          "o AS (SELECT CAST(coalesce(sum(p), 0) AS BIGINT) AS n_pos, " +
          "CAST(coalesce(sum(gg), 0) AS BIGINT) AS n_neg, " +
          "CAST(coalesce(sum(p * (2 * gb + gg)), 0) AS BIGINT) AS u2 " +
          "FROM c) " +
          "SELECT n_pos, n_neg, u2, CASE WHEN n_pos = 0 OR n_neg = 0 " +
          "THEN NULL ELSE CAST(u2 AS DOUBLE) / " +
          "(2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) END " +
          "AS auc FROM o"),
      "q_abtest" -> {
        val pa = "(CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE))"
        val pb = "(CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE))"
        val pp = "(CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))"
        val den = s"sqrt($pp * (1.0 - $pp) * " +
          "(1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))"
        "WITH c AS (SELECT " +
          "CAST(coalesce(sum(CASE WHEN ((user_id % 2) + 2) % 2 = 0 " +
          "THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_a, " +
          "CAST(coalesce(sum(CASE WHEN ((user_id % 2) + 2) % 2 = 0 " +
          "AND event_type = 'purchase' THEN 1 ELSE 0 END), 0) AS BIGINT) " +
          "AS x_a, " +
          "CAST(coalesce(sum(CASE WHEN NOT (((user_id % 2) + 2) % 2 = 0) " +
          "THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_b, " +
          "CAST(coalesce(sum(CASE WHEN NOT (((user_id % 2) + 2) % 2 = 0) " +
          "AND event_type = 'purchase' THEN 1 ELSE 0 END), 0) AS BIGINT) " +
          "AS x_b FROM events) " +
          "SELECT n_a, x_a, n_b, x_b, " +
          s"CASE WHEN n_a = 0 THEN NULL ELSE $pa END AS p_a, " +
          s"CASE WHEN n_b = 0 THEN NULL ELSE $pb END AS p_b, " +
          s"CASE WHEN n_a = 0 OR n_b = 0 OR $den <= 0.0 THEN NULL " +
          s"ELSE ($pa - $pb) / $den END AS z FROM c"
      },
      "q_abtest_srm" ->
        ("WITH u AS (SELECT DISTINCT user_id FROM events), " +
          "c AS (SELECT CAST(coalesce(sum(CASE WHEN ((user_id % 2) + 2) " +
          "% 2 = 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_a, " +
          "CAST(coalesce(sum(CASE WHEN ((user_id % 2) + 2) % 2 = 0 " +
          "THEN 0 ELSE 1 END), 0) AS BIGINT) AS n_b FROM u) " +
          "SELECT n_a, n_b, CASE WHEN n_a + n_b = 0 THEN NULL ELSE " +
          "CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / " +
          "CAST(n_a + n_b AS DOUBLE) END AS chi2 FROM c"),
      "q_diff_in_diff" -> {
        val mean = (g: String) =>
          s"CAST(s_$g AS DOUBLE) / CAST(n_$g AS DOUBLE) / 100.0"
        val vr = (g: String) =>
          s"CAST(CAST(n_$g AS HUGEINT) * q_$g - " +
            s"CAST(s_$g AS HUGEINT) * s_$g AS DOUBLE) / " +
            s"(CAST(n_$g * (n_$g - 1) AS DOUBLE) * 10000.0)"
        val seSq = Seq("c0", "c1", "t0", "t1")
          .map(g => s"${vr(g)} / CAST(n_$g AS DOUBLE)").mkString(" + ")
        val did = s"((${mean("t1")}) - (${mean("t0")})) - " +
          s"((${mean("c1")}) - (${mean("c0")}))"
        val small = "n_c0 < 2 OR n_c1 < 2 OR n_t0 < 2 OR n_t1 < 2"
        val cellAgg = Seq(("c0", "NOT t AND NOT post"),
          ("c1", "NOT t AND post"), ("t0", "t AND NOT post"),
          ("t1", "t AND post")).map { case (g, cond) =>
          s"CAST(coalesce(sum(CASE WHEN $cond THEN 1 ELSE 0 END), 0) " +
            s"AS BIGINT) AS n_$g, " +
            s"CAST(coalesce(sum(CASE WHEN $cond THEN y END), 0) " +
            s"AS BIGINT) AS s_$g, " +
            s"coalesce(sum(CASE WHEN $cond THEN CAST(y AS HUGEINT) * y " +
            s"END), 0) AS q_$g"
        }.mkString(", ")
        "WITH ev AS (SELECT user_id, epoch_us(ts) AS us, " +
          "coalesce(CAST(floor(value * 100.0) AS BIGINT), 0) AS c " +
          "FROM events), " +
          "bd AS (SELECT (min(us) + max(us)) // 2 AS mid FROM ev), " +
          "obs AS (SELECT user_id, us > (SELECT mid FROM bd) AS post, " +
          "CAST(sum(c) AS BIGINT) AS y FROM ev GROUP BY 1, 2), " +
          "a AS (SELECT ((user_id % 2) + 2) % 2 = 0 AS t, post, y " +
          "FROM obs), " +
          s"m AS (SELECT $cellAgg FROM a) " +
          "SELECT n_c0, n_c1, n_t0, n_t1, " +
          s"CASE WHEN n_c0 = 0 THEN NULL ELSE ${mean("c0")} END " +
          "AS mean_c0, " +
          s"CASE WHEN n_c1 = 0 THEN NULL ELSE ${mean("c1")} END " +
          "AS mean_c1, " +
          s"CASE WHEN n_t0 = 0 THEN NULL ELSE ${mean("t0")} END " +
          "AS mean_t0, " +
          s"CASE WHEN n_t1 = 0 THEN NULL ELSE ${mean("t1")} END " +
          "AS mean_t1, " +
          s"CASE WHEN $small THEN NULL ELSE $did END AS did, " +
          s"CASE WHEN $small OR ($seSq) <= 0.0 THEN NULL ELSE " +
          s"sqrt($seSq) END AS se, " +
          s"CASE WHEN $small OR ($seSq) <= 0.0 THEN NULL ELSE " +
          s"($did) / sqrt($seSq) END AS t_stat FROM m"
      },
      "q_abtest_cuped" -> {
        val my = "CAST(sya AS DOUBLE) / CAST(na AS DOUBLE) / 100.0"
        val mxx = "CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE) / 100.0"
        val gx = "CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 100.0"
        val den = "CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx"
        val num = "CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy"
        "WITH ev AS (SELECT user_id, epoch_us(ts) AS us, " +
          "coalesce(CAST(floor(value * 100.0) AS BIGINT), 0) AS c " +
          "FROM events), " +
          "bd AS (SELECT (min(us) + max(us)) // 2 AS mid FROM ev), " +
          "un AS (SELECT user_id, " +
          "CAST(coalesce(sum(CASE WHEN us <= (SELECT mid FROM bd) " +
          "THEN c END), 0) AS BIGINT) AS x, " +
          "CAST(coalesce(sum(CASE WHEN us > (SELECT mid FROM bd) " +
          "THEN c END), 0) AS BIGINT) AS y FROM ev GROUP BY user_id), " +
          "ar AS (SELECT CASE WHEN ((user_id % 2) + 2) % 2 = 0 THEN 'A' " +
          "ELSE 'B' END AS arm, x, y FROM un), " +
          "m AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, " +
          "sum(CAST(x AS HUGEINT) * y) AS sxy, " +
          "sum(CAST(x AS HUGEINT) * x) AS sxx FROM ar), " +
          "g AS (SELECT arm, CAST(count(*) AS BIGINT) AS na, " +
          "CAST(sum(x) AS BIGINT) AS sxa, CAST(sum(y) AS BIGINT) AS sya " +
          "FROM ar GROUP BY arm), " +
          s"t2 AS (SELECT arm, na, sxa, sya, sx, n, CASE WHEN $den = 0 " +
          s"THEN NULL ELSE CAST($num AS DOUBLE) / CAST($den AS DOUBLE) " +
          "END AS theta FROM g, m) " +
          s"SELECT arm, na AS n, $mxx AS mean_x, $my AS mean_y, theta, " +
          s"CASE WHEN theta IS NULL THEN $my ELSE $my - theta * " +
          s"($mxx - $gx) END AS adj_mean FROM t2"
      },
      "q_gini" ->
        ("WITH b AS (SELECT event_type, " +
          "CAST(floor(value * 1024.0) AS BIGINT) AS x, event_id " +
          "FROM events WHERE value IS NOT NULL), " +
          "r AS (SELECT event_type, x, CAST(row_number() OVER (" +
          "PARTITION BY event_type ORDER BY x ASC, event_id ASC) " +
          "AS BIGINT) AS rn FROM b), " +
          "a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows, " +
          "CAST(sum(x) AS BIGINT) AS s, " +
          "CAST(sum(rn * x) AS BIGINT) AS tt FROM r GROUP BY 1) " +
          "SELECT event_type, n_rows, CASE WHEN s <= 0 THEN NULL ELSE " +
          "CAST(2 * tt - (n_rows + 1) * s AS DOUBLE) / " +
          "CAST(n_rows * s AS DOUBLE) END AS gini FROM a"),
      "q_growth_accounting" ->
        ("WITH ud AS (SELECT DISTINCT user_id AS u, " +
          "epoch_us(ts) // 86400000000 AS d FROM events), " +
          "m AS (SELECT u, d, " +
          "lag(d) OVER (PARTITION BY u ORDER BY d) AS pv, " +
          "lead(d) OVER (PARTITION BY u ORDER BY d) AS nx FROM ud), " +
          "a AS (SELECT d AS day, " +
          "CAST(sum(CASE WHEN pv IS NULL THEN 1 ELSE 0 END) AS BIGINT) " +
          "AS n_new, " +
          "CAST(sum(CASE WHEN pv = d - 1 THEN 1 ELSE 0 END) AS BIGINT) " +
          "AS n_retained, " +
          "CAST(sum(CASE WHEN pv IS NOT NULL AND pv < d - 1 THEN 1 " +
          "ELSE 0 END) AS BIGINT) AS n_resurrected FROM m GROUP BY 1), " +
          "c AS (SELECT d + 1 AS day, CAST(count(*) AS BIGINT) " +
          "AS n_churned FROM m WHERE nx IS NULL OR nx <> d + 1 " +
          "GROUP BY 1) " +
          "SELECT coalesce(a.day, c.day) AS day, " +
          "CAST(coalesce(n_new, 0) AS BIGINT) AS n_new, " +
          "CAST(coalesce(n_retained, 0) AS BIGINT) AS n_retained, " +
          "CAST(coalesce(n_resurrected, 0) AS BIGINT) AS n_resurrected, " +
          "CAST(coalesce(n_churned, 0) AS BIGINT) AS n_churned " +
          "FROM a FULL OUTER JOIN c ON a.day = c.day"),
      "q_herfindahl" ->
        ("WITH u AS (SELECT event_type, user_id, " +
          "CAST(sum(CAST(floor(value * 1024.0) AS BIGINT)) AS BIGINT) AS x " +
          "FROM events WHERE value IS NOT NULL GROUP BY 1, 2), " +
          "up AS (SELECT * FROM u WHERE x > 0), " +
          "g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_units, " +
          "sum(CAST(x AS HUGEINT)) AS s, " +
          "sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS ss " +
          "FROM up GROUP BY 1) " +
          "SELECT event_type, n_units, " +
          "CAST(ss AS DOUBLE) / (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) " +
          "AS hhi, CASE WHEN n_units = 1 THEN NULL ELSE " +
          "(CAST(n_units AS DOUBLE) * CAST(ss AS DOUBLE) - " +
          "CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) / " +
          "((CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) * " +
          "(CAST(n_units AS DOUBLE) - 1.0)) END AS hhi_norm FROM g"),
      "q_corr_matrix" ->
        ("WITH q AS (SELECT CAST(floor(l_quantity * 1048576.0) AS HUGEINT) AS a, " +
          "CAST(floor(l_extendedprice * 1048576.0) AS HUGEINT) AS b, " +
          "CAST(floor(l_discount * 1048576.0) AS HUGEINT) AS c FROM lineitem " +
          "WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL " +
          "AND l_discount IS NOT NULL), " +
          "m AS (SELECT count(*) AS n, sum(a) AS sa, sum(a*a) AS ssa, " +
          "sum(b) AS sb, sum(b*b) AS ssb, sum(c) AS sc, sum(c*c) AS ssc, " +
          "sum(a*b) AS sab, sum(a*c) AS sac, sum(b*c) AS sbc FROM q) " +
          Seq(("l_quantity", "l_extendedprice", "sa", "ssa", "sb", "ssb", "sab"),
            ("l_quantity", "l_discount", "sa", "ssa", "sc", "ssc", "sac"),
            ("l_extendedprice", "l_discount", "sb", "ssb", "sc", "ssc", "sbc"))
            .map { case (cx, cy, sx, ssx, sy, ssy, sp) =>
              s"SELECT '$cx' AS col_x, '$cy' AS col_y, " +
                "CAST(n AS BIGINT) AS n_rows, " +
                s"CASE WHEN n*$ssx - $sx*$sx <= 0 OR n*$ssy - $sy*$sy <= 0 " +
                s"THEN NULL ELSE CAST(n*$sp - $sx*$sy AS DOUBLE) / " +
                s"sqrt(CAST(n*$ssx - $sx*$sx AS DOUBLE) * " +
                s"CAST(n*$ssy - $sy*$sy AS DOUBLE)) END AS corr FROM m"
            }.mkString(" UNION ALL ")),
      "q_exists" ->
        ("SELECT c_custkey, c_name FROM customer c " +
          "WHERE EXISTS (SELECT 1 FROM orders o " +
          "WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000) " +
          "AND NOT EXISTS (SELECT 1 FROM orders o " +
          "WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F' " +
          "AND o.o_totalprice < 50000) " +
          "AND c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')"),
      "q_heavy_hitters" ->
        ("SELECT CAST(user_id AS VARCHAR) AS key, cnt FROM " +
          "(SELECT user_id, count(*) AS cnt FROM events " +
          "WHERE user_id IS NOT NULL GROUP BY user_id) " +
          "ORDER BY cnt DESC, key ASC LIMIT 20"),
      "q_bloom_prefilter" -> {
        val bp = (h: String) =>
          (0 until 3).map(j =>
            s"((($h) * ${TextHash.permuteA(j)} + ${TextHash.permuteB(j)}) " +
              s"% ${TextHash.P}) % 256").mkString("[", ", ", "]")
        "WITH dk AS (SELECT DISTINCT CAST(s_suppkey AS BIGINT) AS k " +
          "FROM supplier WHERE s_nationkey < 5), " +
          "pos AS (SELECT DISTINCT p FROM (SELECT " +
          s"unnest(${bp("k")}) AS p FROM dk)), " +
          "fkd AS (SELECT CAST(l_suppkey AS BIGINT) AS k, " +
          "CAST(count(*) AS BIGINT) AS c FROM lineitem GROUP BY 1), " +
          "kp AS (SELECT DISTINCT k, p FROM (SELECT k, " +
          s"unnest(${bp("k")}) AS p FROM fkd)), " +
          "np AS (SELECT k, CAST(count(*) AS BIGINT) AS np FROM kp " +
          "GROUP BY k), " +
          "hit AS (SELECT kp.k, CAST(count(*) AS BIGINT) AS nh FROM kp " +
          "JOIN pos ON pos.p = kp.p GROUP BY kp.k), " +
          "pk AS (SELECT n.k FROM np n LEFT JOIN hit h ON h.k = n.k " +
          "WHERE coalesce(h.nh, 0) = n.np), " +
          "base AS (SELECT f.k, f.c, (t.k IS NOT NULL) AS m, " +
          "(p2.k IS NOT NULL) AS pass FROM fkd f " +
          "LEFT JOIN dk t ON t.k = f.k LEFT JOIN pk p2 ON p2.k = f.k) " +
          "SELECT CAST(sum(c) AS BIGINT) AS n_fact, " +
          "CAST(sum(CASE WHEN pass THEN c ELSE 0 END) AS BIGINT) " +
          "AS n_pass, " +
          "CAST(sum(CASE WHEN m THEN c ELSE 0 END) AS BIGINT) " +
          "AS n_match, " +
          "CAST(sum(CASE WHEN pass AND NOT m THEN c ELSE 0 END) " +
          "AS BIGINT) AS n_false_pos, " +
          "CAST(sum(CASE WHEN m AND NOT pass THEN c ELSE 0 END) " +
          "AS BIGINT) AS n_false_neg, " +
          "CASE WHEN sum(c) - sum(CASE WHEN m THEN c ELSE 0 END) = 0 " +
          "THEN NULL ELSE " +
          "CAST(sum(CASE WHEN pass AND NOT m THEN c ELSE 0 END) " +
          "AS DOUBLE) / CAST(sum(c) - " +
          "sum(CASE WHEN m THEN c ELSE 0 END) AS DOUBLE) END " +
          "AS fp_rate FROM base"
      },
    )
  }
}
