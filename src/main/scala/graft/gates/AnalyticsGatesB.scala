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

/** Analytics gates, second half (q_i..q_z).
  *
  * Split from the monolithic SparkEntry registry (r10); see
  * [[graft.SparkEntry]] for the oracle-safety conventions and the
  * duplicate-refusing merge. Shared oracle CTEs live in
  * [[GateOracleShared]]. */
private[graft] object AnalyticsGatesB {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- Scalar functions: JSON + string + date + math over events ----
    // ---- Semi-structured: Spark 4 VARIANT — parse_json into the binary
    //      variant encoding, typed variant_get extraction, grouped
    //      rollup; the open-schema path get_json_object can't optimize ----
    "q_variant_extract" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"),
          expr("variant_get(parse_json(props), '$.k', 'long')").as("k"))
        .groupBy("event_type")
        .agg(count(col("k")).as("n_with_k"),
          sum(col("k")).as("sum_k"), min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))),

    "q_scalar_json" -> ((s, dir) => {
      val ts = timestamp_micros(expr("ts div 1000"))
      t(s, dir, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("prop_k"),
        upper(col("event_type")).as("type_uc"),
        length(col("event_type")).cast("long").as("type_len"),
        concat_ws("#", col("event_type"), col("user_id").cast("string")).as("tag"),
        year(ts).cast("long").as("y"),
        month(ts).cast("long").as("m"),
        dayofmonth(ts).cast("long").as("d"),
        hour(ts).cast("long").as("h"),
        floor(col("value") * 100).cast("long").as("value_cents"))
    }),

    // ---- LATERAL correlated subquery: top-2 orders per customer,
    //      decorrelated by Catalyst into a ranked join (no driver loop,
    //      no O(customers) subquery executions) ----
    "q_lateral" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("cust_lat")
      t(s, dir, "orders").createOrReplaceTempView("ord_lat")
      s.sql(
        "SELECT c.c_custkey, t.o_orderkey, t.o_totalprice " +
          "FROM cust_lat c JOIN LATERAL (" +
          "SELECT o_orderkey, o_totalprice FROM ord_lat o " +
          "WHERE o.o_custkey = c.c_custkey " +
          "ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t")
    }),

    // ---- Warehouse: SCD Type-2 dimension maintenance — close + open
    //      versions in one full-outer join; no-op and out-of-order
    //      changes leave the current version untouched ----
    "q_scd2" -> ((s, dir) => scd2Dim(s, dir)),

    // ---- Warehouse: point-in-time (temporal) join — each fact row joins
    //      the dim VERSION valid at its timestamp (equality on key +
    //      validity-range predicate; the consumer side of SCD2) ----
    "q_temporal_join" -> ((s, dir) => {
      val dim = scd2Dim(s, dir)
      val facts = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"),
        (col("o_orderkey") % 4000).cast("long").as("ts"))
      facts.join(dim,
        facts("o_custkey") === dim("c_custkey") &&
          col("ts") >= col("valid_from_us") &&
          (col("valid_to_us").isNull || col("ts") < col("valid_to_us")))
        .select(col("o_orderkey"), col("o_custkey"), col("ts"),
          col("c_mktsegment"), col("c_acctbal"), col("valid_from_us"))
    }),

    // ---- Data ops: schema-drift companion to q_diff — added/removed/
    //      type-changed columns, detected from metadata alone (no scan)
    "q_schema_diff" -> ((s, dir) => {
      val left = t(s, dir, "orders")
      val right = left.drop("o_orderpriority")
        .withColumn("o_totalprice", col("o_totalprice").cast("string"))
        .withColumn("o_priority_rank", lit(1).cast("int"))
      graft.ops.Diff.schemaDiff(left, right)
    }),

    // ---- Product analytics: sequence-pattern match (MATCH_RECOGNIZE-
    //      lite) — each user's journey becomes an ordered symbol string,
    //      patterns become regexes: count of view→click→purchase runs
    //      (with other events between stages allowed) per user, rolled
    //      into a matches-per-user histogram ----
    "q_seq_pattern" -> ((s, dir) => {
      val ini = when(col("event_type") === "view", "v")
        .when(col("event_type") === "click", "c")
        .when(col("event_type") === "purchase", "p")
        .when(col("event_type") === "signup", "s")
        .otherwise("e")
      val perUser = t(s, dir, "events")
        .select(col("user_id"), expr("ts div 1000").as("us"),
          col("event_id"), ini.as("ini"))
        .groupBy("user_id")
        .agg(expr("array_join(transform(sort_array(collect_list(" +
          "struct(us, event_id, ini))), x -> x.ini), '')").as("journey"))
      perUser
        .select(expr("regexp_count(journey, 'v[^p]*c[^p]*p')")
          .cast("long").as("n_matches"))
        .groupBy("n_matches").agg(count(lit(1)).as("n_users"))
    }),

    // ---- Product analytics: sliding-window funnel (windowFunnel) —
    //      deepest view→click→purchase chain whose span fits in 72 h;
    //      per-user latest-chain-start fold, depth histogram ----
    "q_window_funnel" -> ((s, dir) =>
      graft.ops.Funnel.windowFunnel(
        t(s, dir, "events").select(col("user_id"),
          expr("ts div 1000").as("ts_us"), col("event_type")),
        "user_id", "ts_us", "event_type",
        Seq("view", "click", "purchase"),
        windowUs = 259200000000L)),

    // ---- Product analytics: retention triangle (cohort by first-active
    //      date, exact distinct actives per day offset) ----
    "q_retention" -> ((s, dir) =>
      graft.ops.Funnel.retentionCohorts(
        t(s, dir, "events").select(col("user_id"),
          to_date(timestamp_micros(expr("ts div 1000"))).as("day")),
        "user_id", "day")),

    // ---- Data cleaning: per-group IQR (Tukey-fence) outlier flags from
    //      exact-interpolation quartiles ----
    "q_iqr_outliers" -> ((s, dir) =>
      graft.ops.Normalize.iqrOutliers(
        t(s, dir, "events")
          .select(col("event_id"), col("event_type"), col("value")),
        "event_type", "value")
        .select(col("event_id"), col("event_type"), col("value"),
          col("lo_bound"), col("hi_bound"), col("is_outlier"))),

    // ---- Causal: caliper nearest-neighbor matching ATT — clickers vs
    //      non-clickers matched on activity volume; the observational
    //      estimate with its overlap diagnostic ----
    "q_psm_att" -> ((s, dir) => {
      val users = t(s, dir, "events").groupBy(col("user_id")).agg(
        count(lit(1)).as("n_ev"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("n_click"),
        coalesce(sum(when(col("event_type") === "purchase",
          floor(col("value") * 100.0).cast("long"))), lit(0L))
          .as("cents"))
      graft.ops.Profile.caliperMatchAtt(users,
        col("n_click") >= 3L, col("n_ev"), col("cents"),
        caliper = 2L, col("user_id"))
    }),

    // ---- Causal: sharp regression discontinuity at value = 50 —
    //      local linear fits both sides, effect = limit gap at the
    //      cutoff (the causal trio's continuity-identified third) ----
    "q_rdd" -> ((s, dir) =>
      graft.ops.Profile.regressionDiscontinuity(
        t(s, dir, "events").filter(col("value").isNotNull),
        floor(col("value") * 100.0),
        col("event_type") === "purchase",
        cutoffQ = 5000L, bandwidthQ = 2000L)),

    // ---- Profiling: Tukey median polish — robust two-way split of
    //      the (event_type × weekday) revenue grid into row + column
    //      effects and an interaction residual ----
    "q_median_polish" -> ((s, dir) =>
      graft.ops.Profile.medianPolish(
        t(s, dir, "events").select(col("event_type"),
          expr("(ts div 86400000000000) % 7").as("dow"),
          col("value")),
        "event_type", "dow", floor(col("value") * 100.0))),

    // ---- Stats: Spearman rank correlation — do users who click more
    //      also spend more? Binned ranks, exact BIGINT moments,
    //      DECIMAL(38,0) combination, one float at the end ----
    "q_spearman" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val per = ev.groupBy("user_id").agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("n_clicks"),
        coalesce(sum(when(col("event_type") === "purchase",
          floor(col("value") * 16.0).cast("long"))), lit(0L))
          .as("spend_q"))
      graft.ops.Profile.spearman(per, col("n_clicks"), col("spend_q"))
    }),

    // ---- Stats: Kendall τ-b from the binned 2-D grid (value-bin ×
    //      day-of-week) — concordance counted exactly from cells ----
    "q_kendall_tau" -> ((s, dir) =>
      graft.ops.Profile.kendallTauB(
        t(s, dir, "events"),
        floor(col("value") * 16.0),
        expr("(ts div 86400000000000) % 7"))),

    // ---- Stats: Welch's unequal-variance t-test (click vs view mean
    //      value) — exact quantized moments, fixed-shape t and dof ----
    "q_welch_ttest" -> ((s, dir) =>
      graft.ops.Profile.welchT(
        t(s, dir, "events")
          .filter(col("event_type").isin("click", "view")),
        col("event_type") === "click",
        floor(col("value") * 1024.0), 1024.0)),

    // ---- Stats: TOST equivalence test — is click vs view mean value
    //      provably WITHIN ±5? (two one-sided z's from the same exact
    //      quantized moments as Welch) ----
    "q_tost" -> ((s, dir) =>
      graft.ops.Profile.tostEquivalence(
        t(s, dir, "events")
          .filter(col("event_type").isin("click", "view")),
        col("event_type") === "click",
        floor(col("value") * 1024.0), 1024.0, margin = 5.0)),

    // ---- Profiling: mutual information (event_type × day-of-week) —
    //      dependence STRENGTH companion to q_chi2's significance test;
    //      observed-cells-only strict sorted fold, pinned at 8 ----
    "q_mutual_info" -> ((s, dir) =>
      graft.ops.Profile.mutualInformation(
        t(s, dir, "events").select(col("event_type"),
          expr("(ts div 86400000000000) % 7").as("dow")),
        "event_type", "dow")),

    // ---- Experiment sizing: minimum detectable effect at 80% power
    //      from the population's observed variance — run BEFORE the
    //      test, not after it fails ----
    "q_power_mde" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("user_id"),
        coalesce(floor(col("value") * 100.0).cast("long"), lit(0L))
          .as("__c"))
      val units = ev.groupBy(col("user_id")).agg(sum(col("__c")).as("y"))
      graft.ops.Profile.powerMde(units, "y", scale = 100L)
    }),

    // ---- Distribution shift: binned two-sample KS statistic (click vs
    //      view value distributions) — exact integer numerator, ONE
    //      division, earliest-bin tie-break ----
    "q_ks_test" -> ((s, dir) =>
      graft.ops.Profile.ksTestBinned(
        t(s, dir, "events")
          .filter(col("event_type").isin("click", "view")),
        col("event_type") === "click",
        floor(col("value") * 16.0))),

    // ---- Profiling: PSI distribution drift between two snapshots
    //      (B thins 1-URGENT by 20% → a real shift signal); per-bucket
    //      terms, caller sums — never a float SUM aggregate ----
    "q_psi_drift" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val a = o.filter(col("o_orderkey") % 2 === 0)
      val b = o.filter(col("o_orderkey") % 2 === 1 &&
        !(col("o_orderpriority") === "1-URGENT" && col("o_orderkey") % 5 === 0))
      graft.ops.Profile.psi(a, b, "o_orderpriority")
    }),

    // ---- Privacy: k-anonymity audit over quasi-identifiers (violating
    //      equivalence classes only; empty result == fully k-anonymous) ----
    "q_k_anonymity" -> ((s, dir) =>
      graft.ops.Profile.kAnonymityViolations(
        t(s, dir, "customer"), Seq("c_nationkey", "c_mktsegment"), k = 8)),

    // ---- Privacy: l-diversity audit (k-anonymity's companion — classes
    //      whose sensitive attribute lacks diversity) ----
    "q_l_diversity" -> ((s, dir) =>
      graft.ops.Profile.lDiversityViolations(
        t(s, dir, "events").select(col("event_type"),
          pmod(col("user_id"), lit(200L)).as("uid_bucket"),
          floor(col("value")).cast("long").as("sens")),
        Seq("event_type", "uid_bucket"), "sens", l = 10)),

    // ---- Privacy: t-closeness audit (the trio's third — per-class
    //      sensitive-distribution leak as total-variation distance,
    //      exact integer numerator, one division per class) ----
    "q_t_closeness" -> ((s, dir) =>
      graft.ops.Profile.tCloseness(
        t(s, dir, "events").filter(col("value").isNotNull)
          .select(col("event_type"),
            pmod(col("user_id"), lit(200L)).as("uid_bucket"),
            floor(col("value")).cast("long").as("sens")),
        Seq("event_type", "uid_bucket"), "sens")),

    // ---- Profiling: deterministic per-group mode (count-desc,
    //      value-asc tie-break — no engine-dependent mode() ties) ----
    "q_mode" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      t(s, dir, "events")
        .select(col("event_type"),
          floor(col("value") / 10.0).cast("long").as("v"))
        .groupBy(col("event_type"), col("v"))
        .agg(count(lit(1)).as("n_occurrences"))
        .withColumn("__rn", row_number().over(Window
          .partitionBy(col("event_type"))
          .orderBy(col("n_occurrences").desc, col("v").asc)))
        .filter(col("__rn") === 1)
        .select(col("event_type"), col("v").as("mode_v"),
          col("n_occurrences"))
    }),

    // ---- Reshaping: unpivot/melt wide measures to long (id, measure,
    //      value) — row-local generator, no shuffle ----
    "q_unpivot" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 97 === 0)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "measure", "m_value")),

    // ---- Interval algebra: merge value-scaled overlapping spans per
    //      user into islands (running-max merge, one keyed shuffle) ----
    "q_interval_merge" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val durUs = when(col("value").isNull || isnan(col("value")), 1L)
        .otherwise(greatest(lit(1L), floor(col("value") * 3600.0)
          .cast("long"))) * 1000000L
      graft.ops.Intervals.mergeIntervals(
        ev.select(col("user_id"), expr("ts div 1000").as("s_us"),
          (expr("ts div 1000") + durUs).as("e_us"), col("event_id")),
        Seq("user_id"), "s_us", "e_us", "event_id")
    }),

    // ---- Interval coverage rollup: per-user union length and
    //      fragmentation over the merged islands ----
    "q_interval_coverage" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val durUs = when(col("value").isNull || isnan(col("value")), 1L)
        .otherwise(greatest(lit(1L), floor(col("value") * 3600.0)
          .cast("long"))) * 1000000L
      graft.ops.Intervals.coverage(
        ev.select(col("user_id"), expr("ts div 1000").as("s_us"),
          (expr("ts div 1000") + durUs).as("e_us"), col("event_id")),
        Seq("user_id"), "s_us", "e_us", "event_id")
    }),

    // ---- Interval algebra: coverage gaps — the dark windows between
    //      merged spans per user (exact BIGINT extents; the longest-gap
    //      SLA readout) ----
    "q_interval_gaps" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val durUs = when(col("value").isNull || isnan(col("value")), 1L)
        .otherwise(greatest(lit(1L), floor(col("value") * 3600.0)
          .cast("long"))) * 1000000L
      graft.ops.Intervals.gaps(
        ev.select(col("user_id"), expr("ts div 1000").as("s_us"),
          (expr("ts div 1000") + durUs).as("e_us"), col("event_id")),
        Seq("user_id"), "s_us", "e_us", "event_id")
    }),

    // ---- Profiling: Lorenz decile table of per-user value mass within
    //      each event type — "the top decile produces X%" (exact BIGINT
    //      bin sums, ONE division per share) ----
    "q_lorenz" -> ((s, dir) =>
      graft.ops.Normalize.lorenz(
        t(s, dir, "events").select(col("event_type"), col("user_id"),
          floor(col("value") * 1024.0).cast("long").as("qx")),
        "event_type", "user_id", "qx", buckets = 10)),

    // ---- Interval algebra: peak concurrency per event type — max
    //      simultaneously-open value-scaled spans and the first instant
    //      of that load (half-open boundary sweep, exact BIGINTs) ----
    "q_peak_concurrency" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val durUs = when(col("value").isNull || isnan(col("value")), 1L)
        .otherwise(greatest(lit(1L), floor(col("value") * 3600.0)
          .cast("long"))) * 1000000L
      graft.ops.Intervals.peakConcurrency(
        ev.select(col("event_type"), expr("ts div 1000").as("s_us"),
          (expr("ts div 1000") + durUs).as("e_us")),
        Seq("event_type"), "s_us", "e_us")
    }),

    // ---- Data cleaning: per-group winsorization (clip to p05/p95
    //      exact-interpolation percentiles — tame tails, don't drop) ----
    "q_winsorize" -> ((s, dir) =>
      graft.ops.Normalize.winsorize(
        t(s, dir, "events")
          .select(col("event_id"), col("event_type"), col("value")),
        "event_type", "value")),

    // ---- Survival analysis: Kaplan–Meier over per-user lifetimes
    //      (right-censored at the 7-day activity horizon; pinned-ln
    //      product replay, O(distinct durations) windows) ----
    "q_survival_km" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), expr("ts div 1000").as("us"))
      val perUser = ev.groupBy(col("user_id"))
        .agg(min(col("us")).as("fts"), max(col("us")).as("lts"))
      val cutoff = ev.agg(max(col("us")).as("__m"))
      val subj = perUser.crossJoin(broadcast(cutoff))
        .select(expr("(lts - fts) div 86400000000").as("duration"),
          (col("lts") <= col("__m") - 604800000000L).as("ev"))
      graft.ops.TimeSeries.kaplanMeier(subj, "duration", "ev")
    }),

    // ---- Customer analytics: RFM quintile scores with boundaries from
    //      the mergeable quantile sketch (no global user sort) ----
    "q_rfm" -> ((s, dir) =>
      graft.ops.Funnel.rfmScores(
        t(s, dir, "events").filter(col("event_type") === "purchase")
          .select(col("user_id"),
            expr("ts div 86400000000000").as("day"), col("value")),
        "user_id", "day", "value")),

    // ---- Events: top user journeys — most common 3-step event-type
    //      paths (the sequence-mining read one order above Markov) ----
    "q_top_paths" -> ((s, dir) =>
      graft.ops.Funnel.topPaths(
        t(s, dir, "events").select(col("user_id"),
          expr("ts div 1000").as("us"), col("event_id"),
          col("event_type")),
        "user_id", "us", "event_id", "event_type", n = 3, k = 20)),

    // ---- Events: first-order Markov transition matrix of user
    //      behavior (what users do next, with exact-integer counts and
    //      one IEEE division for P(to|from)) ----
    "q_markov_transitions" -> ((s, dir) =>
      graft.ops.Funnel.markovTransitions(
        t(s, dir, "events").select(col("user_id"),
          expr("ts div 1000").as("us"), col("event_id"),
          col("event_type")),
        "user_id", "us", "event_id", "event_type")),

    // ---- Feature normalization: per-group quantile ranks (rank-based,
    //      outlier-immune; deterministic id tie-break, ONE division) ----
    "q_quantile_norm" -> ((s, dir) =>
      graft.ops.Normalize.quantileNormalize(
        t(s, dir, "events")
          .select(col("event_id"), col("event_type"), col("value")),
        "event_type", "value", "event_id")),

    // ---- Profiling: Theil T inequality of per-user value mass within
    //      each event type (gini's decomposable complement; quantized-ln
    //      fixed point, exact integer sum, ONE division) ----
    "q_theil_index" -> ((s, dir) =>
      graft.ops.Normalize.theil(
        t(s, dir, "events").select(col("event_type"), col("user_id"),
          floor(col("value") * 1024.0).cast("long").as("qx")),
        "event_type", "user_id", "qx")),

    // ---- Time series: rolling 24h correlation of each event type's
    //      hourly mass against the corpus-wide series — the decoupling
    //      monitor (exact BIGINT window moments, one IEEE readout) ----
    "q_moving_corr" -> ((s, dir) => {
      val hourly = t(s, dir, "events")
        .select(col("event_type"),
          expr("ts div 3600000000000").as("hr"),
          floor(col("value")).cast("long").as("qx"))
        .groupBy(col("event_type"), col("hr"))
        .agg(sum(col("qx")).as("hx"))
        .where(col("hx").isNotNull)
      val global = hourly.groupBy(col("hr")).agg(sum(col("hx")).as("gx"))
      graft.ops.TimeSeries.rollingCorr(
        hourly.join(global, "hr"), "event_type", "hr", "hx", "gx",
        win = 24)
    }),

    // ---- Growth: rolling 7-day active users (WAU) per activity day —
    //      each (user, day) contributes to its next 7 report days, then
    //      ONE exact distinct count per day ----
    "q_rolling_active" -> ((s, dir) => {
      val ud = t(s, dir, "events")
        .select(expr("ts div 86400000000000").as("day"), col("user_id"))
        .distinct()
      ud.select(explode(sequence(col("day"), col("day") + 6L)).as("rday"),
          col("user_id"))
        .groupBy(col("rday"))
        .agg(countDistinct(col("user_id")).as("wau"))
        .join(ud.select(col("day").as("rday")).distinct(), "rday")
        .select(col("rday"), col("wau"))
    }),

    // ---- Time series: fixed-interval OHLC downsampling (hourly bars
    //      per user; single (key,bucket)-keyed exchange) ----
    "q_resample_ohlc" -> ((s, dir) =>
      graft.ops.TimeSeries.resampleOhlc(
        t(s, dir, "events").select(col("user_id"),
          expr("ts div 1000").as("ts_us"), col("event_id"), col("value")),
        "user_id", "ts_us", "event_id", "value", bucketUs = 3600000000L)),

    // ---- Data cleaning: per-group robust z-score (median/MAD — the
    //      outlier-resistant twin of q_zscore) ----
    "q_robust_z" -> ((s, dir) =>
      graft.ops.Normalize.robustZ(
        t(s, dir, "events")
          .select(col("event_id"), col("event_type"), col("value")),
        "event_type", "value")
        .select(col("event_id"), col("event_type"), col("value"),
          col("med"), col("mad"), col("robust_z"))),

    // ---- Feature normalization: per-group z-score from EXACT decimal
    //      moments (bit-identical across partitionings and engines) ----
    "q_zscore" -> ((s, dir) =>
      graft.ops.Normalize.zscore(
        t(s, dir, "events")
          .select(col("event_id"), col("event_type"), col("value")),
        "event_type", "value")
        .select(col("event_id"), col("event_type"), col("value"),
          col("n_group"), col("z"))),

    // ---- Data layout: Z-order (Morton) clustering key over two bounded
    //      dims — the multi-dim scan-pruning layout (see ops/Layout) ----
    "q_zorder_key" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"),
          pmod(col("user_id"), lit(1024L)).as("da"),
          pmod(floor(col("value") * 100).cast("long"), lit(1024L)).as("db"))
        .withColumn("zkey",
          graft.ops.Layout.mortonKey(col("da"), col("db"), bits = 10))),

    // ---- Sessionization: native session windows (6h inactivity gap) ----
    "q_sessionize" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("user_id"), timestamp_micros(expr("ts div 1000")).as("ts_t"))
        .groupBy(col("user_id"), session_window(col("ts_t"), "6 hours"))
        .agg(
          count(lit(1)).as("n_events"),
          unix_micros(min(col("ts_t"))).as("session_start_us"),
          unix_micros(max(col("ts_t"))).as("session_end_us"))
        .select(col("user_id"), col("session_start_us"),
          col("session_end_us"), col("n_events"))),

    // ---- Set operations: INTERSECT / EXCEPT over per-type user sets ----
    "q_setops" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      def users(tpe: String) =
        ev.filter(col("event_type") === tpe).select(col("user_id"))
      users("click").intersect(users("error"))
        .select(lit("click_and_error").as("cohort"), col("user_id"))
        .unionAll(
          users("click").except(users("purchase"))
            .select(lit("click_not_purchase").as("cohort"), col("user_id")))
    }),

    // ---- Decile lift & cumulative gain: rank by score (columnar
    //      global rank — range partitions + local windows + broadcast
    //      offsets, never a 1-partition sort), slice by rank·k // n ----
    "q_lift_gain" -> ((s, dir) =>
      graft.ops.Profile.liftDeciles(
        t(s, dir, "events")
          .filter(col("value").isNotNull && !isnan(col("value"))),
        col("event_type") === "purchase",
        col("value"), col("event_id"))),

    // ---- Time-series linear interpolation (gapFill's smooth sibling) ----
    "q_interpolate" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(
        col("user_id"),
        to_date(timestamp_micros(expr("ts div 1000"))).as("d"),
        col("value"))
      graft.ops.TimeSeries.interpolateDaily(ev, "user_id", "d", "value")
    }),

    // ---- Exact percentiles (interpolated) per group ----
    "q_percentiles" -> ((s, dir) =>
      t(s, dir, "events").groupBy("event_type").agg(
        percentile(col("value"), lit(0.5)).as("p50"),
        percentile(col("value"), lit(0.9)).as("p90"),
        percentile(col("value"), lit(0.99)).as("p99"),
        count(lit(1)).as("n"))),

    // ---- Skew-salted join: hot event_type keys spread over 8 salts;
    //      row-identical to the plain join (the oracle) by construction ----
    "q_salted_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val dim = ev.groupBy("event_type")
        .agg(count(lit(1)).as("type_n"))
      graft.ops.Skew.saltedJoin(
        ev.select(col("event_id"), col("event_type")), dim,
        Seq("event_type"), saltSource = col("event_id"), salts = 8)
        .select(col("event_id"), col("event_type"), col("type_n"))
    }),

    // ---- Semi/anti joins: EXISTS / NOT EXISTS cohorts ----
    "q_semi_anti" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val high = o.filter(col("o_totalprice") > 100000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .join(high, c("c_custkey") === high("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // ---- Pivot: per-user event-type counts as columns ----
    "q_pivot" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)),

    // ---- Rollup aggregation (subtotals + grand total) ----
    "q_rollup" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"))),

    // ---- Analytics: window function (rank per group) ----
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rank_in_cust", row_number().over(w))
        .filter(col("rank_in_cust") <= 3)
        .select(
          col("o_custkey").as("custkey"),
          col("o_orderkey").as("orderkey"),
          col("o_totalprice").as("totalprice"),
          col("rank_in_cust").cast("long").as("rank_in_cust"))
    }),

    // ---- Custom UDAF: bounded top-k aggregator (O(groups*k) shuffle) ----
    "q_topk_agg" -> ((s, dir) => {
      val topk = udaf(new graft.functions.Aggregators.TopK(3))
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(topk(col("value"), col("event_id")).as("top"))
        .select(col("event_type"), posexplode(col("top")).as(Seq("pos", "row")))
        .select(col("event_type"), (col("pos") + 1).cast("long").as("rank"),
          col("row.value").as("value"), col("row.id").as("event_id"))
    }),

    // ---- ML-ops audit: split balance — chi² independence between the
    //      assigned train/val/test split and the language label (a
    //      skewed split leaks distribution shift into eval) ----
    "q_split_balance" -> ((s, dir) =>
      graft.ops.Profile.chiSquare(
        graft.ops.Sampling.assignSplits(
          t(s, dir, "documents").select(col("doc_id"), col("lang")),
          "doc_id"),
        "split", "lang")),

    // ---- Profiling: join-fanout pre-flight — exact output cardinality
    //      and worst single-key fanout of orders⋈lineitem, computed on
    //      the O(keys) grids before paying for the join ----
    "q_join_fanout" -> ((s, dir) =>
      graft.ops.Profile.joinFanout(
        t(s, dir, "orders"), "o_orderkey",
        t(s, dir, "lineitem"), "l_orderkey")),

    // ---- Profiling: Pareto coverage curve — "how many keys make 90%
    //      of the rows" (concentration read for mixture weights) ----
    "q_pareto_coverage" -> ((s, dir) =>
      graft.ops.Profile.paretoCoverage(
        t(s, dir, "lineitem").select(col("l_partkey")),
        "l_partkey", k = 100)),

    // ---- Product analytics: user-growth curve (first-seen per day +
    //      running total) ----
    "q_user_growth" -> ((s, dir) =>
      graft.ops.Funnel.userGrowth(
        t(s, dir, "events").select(col("user_id"),
          expr("ts div 86400000000000").as("day")),
        "user_id", "day")),

    // ---- Audiences: pairwise Jaccard overlap between event-type user
    //      sets — exact distinct-pair set algebra (|A∩B| via one
    //      user-keyed self-join of the deduped pairs, union by
    //      inclusion-exclusion, ONE division) ----
    "q_jaccard_sets" -> ((s, dir) => {
      val ud = t(s, dir, "events")
        .select(col("event_type").as("et"), col("user_id")).distinct()
      val sizes = ud.groupBy(col("et")).agg(count(lit(1)).as("n"))
      val common = ud.select(col("et").as("type_a"), col("user_id"))
        .join(ud.select(col("et").as("type_b"), col("user_id")), "user_id")
        .where(col("type_a") < col("type_b"))
        .groupBy(col("type_a"), col("type_b"))
        .agg(count(lit(1)).as("n_common"))
      common
        .join(broadcast(sizes.select(col("et").as("type_a"),
          col("n").as("n_a"))), "type_a")
        .join(broadcast(sizes.select(col("et").as("type_b"),
          col("n").as("n_b"))), "type_b")
        .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
          col("n_common"),
          (col("n_common").cast("double") /
            (col("n_a") + col("n_b") - col("n_common")).cast("double"))
            .as("jaccard"))
    }),

    // ---- Profiling: join-key skew pre-flight — one row deciding
    //      shuffle vs broadcast vs salt before paying for the plan ----
    "q_skew_profile" -> ((s, dir) =>
      graft.ops.Profile.keySkewProfile(
        t(s, dir, "events"), "user_id")),

    // ---- Streaming ops: event-lateness profile — the measurement that
    //      SIZES a watermark (inversion rate + p99/max backward jump
    //      over per-user arrival order) ----
    "q_lateness_profile" -> ((s, dir) =>
      graft.ops.Profile.latenessProfile(
        t(s, dir, "events").select(col("user_id"), col("event_id"),
          expr("ts div 1000").as("us")),
        "user_id", "event_id", "us")),

    // ---- LLM pipeline: deterministic train/val/test split ----
    "q_train_split" -> ((s, dir) =>
      graft.ops.Sampling.assignSplits(
        t(s, dir, "documents").select(col("doc_id"), col("lang")), "doc_id")),

    // ---- LLM pipeline: sequence packing (concat-and-split-at-boundary),
    //      per-language packing domains = the parallel scale path ----
    "q_pack_sequences" -> ((s, dir) => {
      val toks = t(s, dir, "documents").select(
        col("doc_id"), col("lang"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tokens"))
      graft.ops.Packing.packContiguous(toks, "doc_id", "n_tokens",
        capacity = 256, partitionCols = Seq("lang"))
    }),

    // ---- Window-function suite: lead/lag/ntile/cume_dist/running sum ----
    "q_window_suite" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders").select(
        col("o_custkey").as("custkey"),
        col("o_orderkey").as("orderkey"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        ntile(4).over(w).cast("long").as("quartile"),
        cume_dist().over(w).as("cd"),
        // decimal accumulation: running double sums are association-order
        // sensitive and the two engines frame differently
        sum(col("o_totalprice").cast("decimal(18,2)")).over(run)
          .cast("double").as("running_spend"))
    }),

    // ---- Sessionization with DYNAMIC per-event gaps (high-intent
    //      events time out faster) — session_window(col, gapExpr),
    //      transitive interval merge, oracle replays via running-max ----
    "q_session_dynamic" -> ((s, dir) =>
      graft.streaming.EventTime.sessionAggDynamicGap(
        t(s, dir, "events").select(col("user_id"),
          timestamp_micros(expr("ts div 1000")).as("tsm"),
          col("event_type")),
        "tsm",
        expr("CASE WHEN event_type = 'purchase' " +
          "THEN make_interval(0,0,0,0,1,0,0) " +
          "ELSE make_interval(0,0,0,0,3,0,0) END"),
        Seq("user_id"))),

    // ---- Windowing: time-RANGE rolling aggregate (trailing 1 h per
    //      user at every event) — RANGE frames make equal-timestamp ties
    //      frame-identical, so the result is tie-order independent ----
    "q_rolling_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
        .rangeBetween(-3600000000L, Window.currentRow)
      t(s, dir, "events")
        .select(col("user_id"), expr("ts div 1000").as("ts_us"),
          col("event_id"), col("value"))
        .select(col("user_id"), col("ts_us"), col("event_id"),
          count(lit(1)).over(w).as("n_1h"),
          sum(col("value").cast("decimal(18,2)")).over(w)
            .cast("double").as("sum_1h"))
    }),

    // ---- Retrieval: reciprocal-rank fusion of a lexical BM25 list and
    //      a length-prior list (hybrid-search combiner; bounded lists,
    //      broadcast joins, fixed-shape float sum) ----
    "q_rank_fusion" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, dir, "documents")
      val bm = graft.ops.TextRank.bm25TopK(
        docs, "doc_id", "text", Bm25Terms, k = Bm25K)
      // single-partition windows: both lists are <= Bm25K rows.
      // Rank by round(score, 8) — the SAME key the DuckDB oracle orders
      // by — so two docs whose raw scores differ only below 1e-8 get the
      // identical doc_id tie-break in both engines.
      val bmRanked = bm.select(col("doc_id"), row_number().over(
        Window.orderBy(round(col("score"), 8).desc, col("doc_id").asc))
        .as("rank"))
      val prior = docs
        .orderBy(col("n_chars").desc, col("doc_id").asc).limit(Bm25K)
        .select(col("doc_id"), row_number().over(
          Window.orderBy(col("n_chars").desc, col("doc_id").asc)).as("rank"))
      graft.ops.TextRank.rrfFuse(Seq(bmRanked, prior), "doc_id", "rank")
    }),

    // ---- Data quality: ANALYZE-style column profile ----
    "q_profile" -> ((s, dir) =>
      graft.ops.Profile.profile(t(s, dir, "documents"))),

    // ---- Events: stationary distribution of the behavior Markov chain
    //      (fixed-point power iteration — the pageRank integer
    //      discipline over the transition matrix) ----
    "q_markov_stationary" -> ((s, dir) =>
      graft.ops.Funnel.markovStationary(
        t(s, dir, "events").select(col("user_id"),
          expr("ts div 1000").as("us"), col("event_id"),
          col("event_type")),
        "user_id", "us", "event_id", "event_type")),

    // ---- Range join: purchase windows × error windows, overlap pairs.
    //      Bucketed equi-join restatement — the naive inequality join is
    //      a nested loop (RangeJoinSpec proves both halves) ----
    "q_range_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val l = ev
        .filter(col("event_type") === "purchase" && col("user_id") % 50 === 0)
        .select(col("event_id").as("l_id"), expr("ts div 1000").as("ls"),
          (expr("ts div 1000") + lit(1800000000L)).as("le"))
      val r = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("r_id"), expr("ts div 1000").as("rs"),
          (expr("ts div 1000") + lit(300000000L)).as("re"))
      graft.ops.RangeJoin.intervalOverlapJoin(
        l, r, "ls", "le", "rs", "re", bucketWidth = 1800000000L)
        .select(col("l_id"), col("r_id"), col("ls"), col("rs"))
    }),

    // ---- Stats: Mann-Whitney rank-sum z (click vs view values) — the
    //      significance companion to q_auc's ranking readout; exact
    //      integer 2U and tie-corrected variance, ONE sqrt ----
    "q_mann_whitney" -> ((s, dir) =>
      graft.ops.Profile.mannWhitneyZ(
        t(s, dir, "events").filter(col("event_type").isin("click", "view")),
        col("event_type") === "click",
        floor(col("value") * 1024.0))),

    // ---- Spatial: bounded kNN — the 3 nearest suppliers within the
    //      cell-join radius per customer, deterministic (d2, id) rank;
    //      the honest scalable kNN (radius-bounded, never global) ----
    "q_spatial_knn" -> ((s, dir) => {
      val cust = t(s, dir, "customer").select(col("c_custkey").as("id"),
        pmod(col("c_custkey") * 37L, lit(1000L)).as("x"),
        pmod(col("c_custkey") * 73L + 11L, lit(1000L)).as("y"))
      val supp = t(s, dir, "supplier").select(col("s_suppkey").as("id"),
        pmod(col("s_suppkey") * 41L + 5L, lit(1000L)).as("x"),
        pmod(col("s_suppkey") * 59L + 7L, lit(1000L)).as("y"))
      val pairs = graft.ops.Spatial.neighborJoin(cust, "id", "x", "y",
        supp, "id", "x", "y", r = 16L)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("a_id")).orderBy(col("d2"), col("b_id"))
      pairs.withColumn("knn_rank", row_number().over(w).cast("long"))
        .filter(col("knn_rank") <= 3L)
    }),

    // ---- Spatial: geohash-style base32 cell keys on the integer grid
    //      — Morton interleave rendered MSB-first in the public geohash
    //      alphabet; prefixes name coarser enclosing cells (geo2 ⊂
    //      geo4), pure codegen bit arithmetic ----
    "q_geohash_encode" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_custkey").as("id"),
          pmod(col("c_custkey") * 37L, lit(1000L)).as("x"),
          pmod(col("c_custkey") * 73L + 11L, lit(1000L)).as("y"))
        .withColumn("geo4",
          graft.ops.Spatial.geohashCell(col("x"), col("y"), bits = 10))
        .withColumn("geo2", substring(col("geo4"), 1, 2))),

    // ---- Spatial: local-density hotspots — per occupied cell the
    //      3x3-neighborhood mass and the quantized concentration
    //      ratio; grid-bounded, no per-point pair work ----
    "q_spatial_hotspot" -> ((s, dir) => {
      val cust = t(s, dir, "customer").select(
        pmod(col("c_custkey") * 37L, lit(1000L)).as("x"),
        pmod(col("c_custkey") * 73L + 11L, lit(1000L)).as("y"))
      graft.ops.Spatial.hotspotCells(cust, "x", "y", cell = 50L)
    }),

    // ---- Spatial: grid-cell radius join — customers vs suppliers on
    //      an integer grid; engine runs the cell-bucketed 3x3 plan, the
    //      oracle brute-forces the same radius predicate ----
    "q_spatial_join" -> ((s, dir) => {
      val cust = t(s, dir, "customer").select(col("c_custkey").as("id"),
        pmod(col("c_custkey") * 37L, lit(1000L)).as("x"),
        pmod(col("c_custkey") * 73L + 11L, lit(1000L)).as("y"))
      val supp = t(s, dir, "supplier").select(col("s_suppkey").as("id"),
        pmod(col("s_suppkey") * 41L + 5L, lit(1000L)).as("x"),
        pmod(col("s_suppkey") * 59L + 7L, lit(1000L)).as("y"))
      graft.ops.Spatial.neighborJoin(cust, "id", "x", "y",
          supp, "id", "x", "y", r = 8L)
        .groupBy(col("a_id"))
        .agg(count(lit(1)).as("n_near"), min(col("d2")).as("min_d2"))
    }),

    // ---- Causal: event-study leads/lags — per-relative-period gap
    //      minus the pooled pre-period baseline; pre rows ARE the
    //      parallel-trends diagnostic ----
    "q_event_study" -> ((s, dir) =>
      graft.ops.Profile.eventStudy(
        t(s, dir, "events"),
        pmod(col("user_id"), lit(2L)) === 0,
        floor(col("value")),
        expr("ts div 86400000000000 - 15"))),

    // ---- Causal: stratified IPW ATE — empirical per-stratum
    //      propensity, Hajek means with integer weight denominators,
    //      positivity-violating strata excluded and counted ----
    "q_ipw_ate" -> ((s, dir) =>
      graft.ops.Profile.ipwAte(
        t(s, dir, "events").filter(col("event_type").isin("click", "view")),
        col("event_type") === "click",
        floor(col("value")),
        pmod(col("user_id"), lit(8L)))),

    // ---- LLM pipeline: fixed-k deterministic RESERVOIR per stratum —
    //      bottom-k by hash tag (mergeable by the KMV property: the
    //      distributed/streaming reservoir) ----
    "sample_reservoir" -> ((s, dir) =>
      graft.ops.Sampling.reservoirPerStratum(
        t(s, dir, "documents").select(col("doc_id"), col("lang"),
          col("source")),
        "lang", "doc_id", k = 7)),

    // ---- Stats: Hodges-Lehmann shift — lower median of all pairwise
    //      differences as an ELEMENT PICK over the binned-grid diff
    //      distribution; exact BIGINT in bin units ----
    "q_hodges_lehmann" -> ((s, dir) =>
      graft.ops.Profile.hodgesLehmann(
        t(s, dir, "events").filter(col("event_type").isin("click", "view")),
        col("event_type") === "click",
        floor(col("value")))),

    // ---- Stats: Cliff's delta effect size — dominance counts off the
    //      same binned grid as Mann-Whitney; one division total ----
    "q_cliffs_delta" -> ((s, dir) =>
      graft.ops.Profile.cliffsDelta(
        t(s, dir, "events").filter(col("event_type").isin("click", "view")),
        col("event_type") === "click",
        floor(col("value") * 1024.0))),

    // ---- Stats: Jonckheere-Terpstra ordered trend — per-month-pair
    //      doubled Mann-Whitney counts over the dense price-bin grid
    //      (grid-bounded cross join, exact BIGINTs end to end) ----
    "q_jonckheere" -> ((s, dir) =>
      graft.ops.Profile.jonckheereTerpstra(
        t(s, dir, "orders"),
        month(col("o_orderdate")),
        floor(col("o_totalprice") / 5000.0))),

    // ---- Stats: Wald-Wolfowitz runs test per event type — streakiness
    //      of the daily series vs its own lower median; pinned IEEE z
    //      shape mirrored by the oracle ----
    "q_runs_test" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .select(col("event_type"),
          expr("ts div 86400000000000").as("d"),
          floor(col("value") * 1024.0).cast("long").as("qx"))
        .groupBy(col("event_type"), col("d"))
        .agg(sum(col("qx")).as("hx"))
      graft.ops.Profile.runsTest(daily, "event_type", "d", "hx")
    }),

    // ---- Stats: Kruskal-Wallis H across ALL event types — the k-group
    //      rank test ANOVA can't give on heavy tails; doubled-rank
    //      integers, one division per group, tie-corrected twin ----
    "q_kruskal_wallis" -> ((s, dir) =>
      graft.ops.Profile.kruskalWallis(
        t(s, dir, "events"),
        col("event_type"),
        floor(col("value") * 1024.0))),

    // ---- Stats: McNemar paired flip test — per-user purchase vs error
    //      incidence; discordant cells only, exact ints, one division ----
    "q_mcnemar" -> ((s, dir) =>
      graft.ops.Profile.mcnemar(
        t(s, dir, "events"), col("user_id"),
        col("event_type") === "purchase",
        col("event_type") === "error")),

    // ---- Stats: Brown-Forsythe spread test — median-centered Levene
    //      over event types; exact |x−med| integers, kruskal-style
    //      group fold, fixed F chain ----
    "q_levene_bf" -> ((s, dir) =>
      graft.ops.Profile.brownForsythe(
        t(s, dir, "events"), col("event_type"),
        floor(col("value") * 1024.0))),

    // ---- Experimentation: Wald SPRT monitor — is the purchase rate
    //      0.2 or 0.25? exact per-row LLR (no float running sum),
    //      injected log constants, first boundary crossing ----
    "q_sprt" -> ((s, dir) =>
      graft.ops.Profile.sprt(
        t(s, dir, "events"),
        Seq(col("ts"), col("event_id")),
        col("event_type") === "purchase",
        p0 = 0.2, p1 = 0.25)),

    // ---- Survey weighting: IPF raking to uniform marginals — fixed-
    //      point integer rescaling rounds over the contingency table,
    //      order-free exact sums, floor-quantized convergence ----
    "q_ipf_raking" -> ((s, dir) =>
      graft.ops.Sampling.ipfRake(
        t(s, dir, "customer"),
        col("c_mktsegment"), pmod(col("c_nationkey"), lit(5L)),
        rounds = 3)),

    // ---- Marketing: EXACT Shapley attribution (k=3 closed form) —
    //      coalition-fair conversion credit for view/click/signup
    //      exposure toward purchase; 8-cell pivot, fixed weight chain ----
    "q_shapley_attribution" -> ((s, dir) =>
      graft.ops.Attribution.shapley3(
        t(s, dir, "events"), col("user_id"),
        Seq(col("event_type") === "view", col("event_type") === "click",
          col("event_type") === "signup"),
        col("event_type") === "purchase")),

    // ---- Stats: deterministic permutation test — purchasers vs not on
    //      mean event value; 64 affine label scrambles from the shared
    //      permute-hash family, add-one p-value ----
    "q_permutation_test" -> ((s, dir) =>
      graft.ops.Profile.permutationTest(
        t(s, dir, "events"), col("user_id"),
        col("event_type") === "purchase",
        floor(col("value") * 1024.0))),

    // ---- OLAP: gaps-and-islands — longest consecutive-active-day
    //      streak per user via the day − dense_rank island key, rolled
    //      into a streak-length histogram ----
    "q_streaks" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("day"))
      val days = t(s, dir, "events")
        .select(col("user_id"), expr("ts div 86400000000000").as("day"))
        .distinct()
      val streaks = days
        .withColumn("__grp", col("day") - dense_rank().over(w))
        .groupBy(col("user_id"), col("__grp"))
        .agg(count(lit(1)).as("__len"))
        .groupBy(col("user_id"))
        .agg(max(col("__len")).as("longest_streak"))
      streaks.groupBy("longest_streak")
        .agg(count(lit(1)).as("n_users"))
    }),

    // ---- Stats: top-50 bivariate Mahalanobis outliers (value ×
    //      day-of-week) — correlation-aware anomaly rank, exact-integer
    //      numerator ordering, ONE division per emitted row ----
    "q_mahalanobis_2d" -> ((s, dir) =>
      graft.ops.Profile.mahalanobis2d(
        t(s, dir, "events"), "event_id",
        floor(col("value") * 1024.0),
        expr("(ts div 86400000000000) % 7"), k = 50)),

    // ---- Product analytics: DAU/MAU stickiness per 30-day bucket —
    //      the engagement ratio; exact distinct counts, two divisions ----
    "q_stickiness" -> ((s, dir) =>
      t(s, dir, "events")
        .select(expr("ts div 2592000000000000").as("m"),
          expr("ts div 86400000000000").as("day"), col("user_id"))
        .groupBy("m")
        .agg(countDistinct(col("user_id"), col("day")).as("user_days"),
          countDistinct(col("day")).as("n_days"),
          countDistinct(col("user_id")).as("mau"))
        .select(col("m"), col("n_days"), col("user_days"), col("mau"),
          (col("user_days").cast("double") / col("n_days").cast("double"))
            .as("avg_dau"),
          (col("user_days").cast("double") / col("n_days").cast("double") /
            col("mau").cast("double")).as("stickiness"))),

    // ---- Ranking eval: NDCG@10 per query cohort — exact scaled-long
    //      DCG (driver-literal log2 discounts, the benford precedent)
    //      over per-cohort rank windows, ideal-DCG by prefix lookup ----
    "q_ndcg" -> ((s, dir) =>
      graft.ops.RankEval.ndcgAtK(
        t(s, dir, "events"), pmod(col("user_id"), lit(100L)),
        col("value"), col("event_id"),
        col("event_type") === "purchase", k = 10)),

    // ---- Ranking eval: mean reciprocal rank — first-relevant rank per
    //      cohort, floor-scaled exact reciprocal sum, ONE division ----
    "q_mrr" -> ((s, dir) =>
      graft.ops.RankEval.meanReciprocalRank(
        t(s, dir, "events"), pmod(col("user_id"), lit(100L)),
        col("value"), col("event_id"),
        col("event_type") === "purchase")),

    // ---- Experimentation: quantile treatment effect — per-arm exact
    //      interpolated quantiles and their gaps; the distributional
    //      readout a mean-diff z-test can't see ----
    "q_qte" -> ((s, dir) => {
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
        .select((pmod(col("user_id"), lit(2L)) === 0L).as("__arm"),
          col("value"))
      val byArm = ev.groupBy(col("__arm")).agg(
        percentile(col("value"), lit(0.25)).as("p25"),
        percentile(col("value"), lit(0.5)).as("p50"),
        percentile(col("value"), lit(0.75)).as("p75"),
        percentile(col("value"), lit(0.9)).as("p90"),
        count(lit(1)).as("n"))
      def arm(c: String, a: Boolean) =
        max(when(col("__arm") === a, col(c)))
      byArm.agg(
        arm("n", true).as("n_a"), arm("n", false).as("n_b"),
        arm("p25", true).as("p25_a"), arm("p25", false).as("p25_b"),
        arm("p50", true).as("p50_a"), arm("p50", false).as("p50_b"),
        arm("p75", true).as("p75_a"), arm("p75", false).as("p75_b"),
        arm("p90", true).as("p90_a"), arm("p90", false).as("p90_b"))
        .withColumn("d25", col("p25_a") - col("p25_b"))
        .withColumn("d50", col("p50_a") - col("p50_b"))
        .withColumn("d75", col("p75_a") - col("p75_b"))
        .withColumn("d90", col("p90_a") - col("p90_b"))
    }),

    // ---- Skyline (Pareto front): highest-value-earliest frontier per
    //      event type — distributive two-level fronts, so no full-group
    //      window ever sees raw rows ----
    "q_skyline" -> ((s, dir) =>
      graft.ops.Skyline.skyline2d(
        t(s, dir, "events"), col("event_type"), col("value"), col("ts"))
        .select(col("g").as("event_type"), col("x").as("value"),
          col("y").as("ts_ns"))),

    // ---- Isotonic calibration (PAV by its exact minimax form): the
    //      monotone recalibration map, nested exact-rational folds
    //      over the bounded nonempty-bin profile ----
    "q_isotonic" -> ((s, dir) =>
      graft.ops.RankEval.isotonicCalibration(
        t(s, dir, "events").filter(col("value").isNotNull),
        floor(col("value") / 8.0),
        col("event_type") === "purchase")),
  )

  def oracles: Map[String, String] = {
    val prefix = graft.ops.RankEval.idcgPrefixScaled(10).mkString(", ")
    val scoredEvents =
      "SELECT (((user_id % 100) + 100) % 100) AS q, value AS s, " +
        "event_id AS id, CASE WHEN event_type = 'purchase' THEN 1 " +
        "ELSE 0 END AS y FROM events WHERE value IS NOT NULL"
    val rankFusionSql =
      s"WITH $bm25Ctes, " +
        "bmr AS (SELECT doc_id, row_number() OVER (" +
        "ORDER BY round(score, 8) DESC, doc_id) AS rank_0 FROM top), " +
        "pr AS (SELECT doc_id, row_number() OVER (" +
        "ORDER BY n_chars DESC, doc_id) AS rank_1 FROM (" +
        "SELECT doc_id, n_chars FROM documents " +
        s"ORDER BY n_chars DESC, doc_id LIMIT $Bm25K)), " +
        "ids AS (SELECT doc_id FROM bmr UNION SELECT doc_id FROM pr) " +
        "SELECT i.doc_id, CAST(b.rank_0 AS BIGINT) AS rank_0, " +
        "CAST(p.rank_1 AS BIGINT) AS rank_1, " +
        "CAST(CASE WHEN b.rank_0 IS NOT NULL THEN 1 ELSE 0 END + " +
        "CASE WHEN p.rank_1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) " +
        "AS n_lists, " +
        "coalesce(1.0 / (60.0 + CAST(b.rank_0 AS DOUBLE)), 0.0) + " +
        "coalesce(1.0 / (60.0 + CAST(p.rank_1 AS DOUBLE)), 0.0) AS rrf " +
        "FROM ids i LEFT JOIN bmr b USING (doc_id) " +
        "LEFT JOIN pr p USING (doc_id)"
    val topkAggSql =
      "SELECT event_type, CAST(rn AS BIGINT) AS rank, value, event_id FROM " +
        "(SELECT event_type, value, event_id, row_number() OVER " +
        "(PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rn " +
        "FROM events) WHERE rn <= 3"
    val trainSplitSql = {
      // pmod mirror (non-negative bucket even for negative ids), matching
      // Sampling.hashBucket exactly
      val bucket = s"((((doc_id * ${TextHash.permuteA(0)} + " +
        s"${TextHash.permuteB(0)}) % ${TextHash.P}) % 100) + 100) % 100"
      s"SELECT doc_id, lang, CASE WHEN $bucket < 80 THEN 'train' " +
        s"WHEN $bucket < 90 THEN 'val' ELSE 'test' END AS split FROM documents"
    }

    // Capstone oracle: the same composition in one SQL statement —
    // clusters (recursive closure), normalization, quality window, split.
    Map(
      "q_lift_gain" ->
        // Global rank replay: row_number(score DESC, id) - 1, slice
        // id = rank*k // n — no reliance on ntile remainder rules.
        ("WITH b AS (SELECT CASE WHEN event_type = 'purchase' THEN 1 " +
          "ELSE 0 END AS y, value AS s, event_id AS id FROM events " +
          "WHERE value IS NOT NULL AND NOT isnan(value)), " +
          "tot AS (SELECT count(*) AS nn FROM b), " +
          "r AS (SELECT y, row_number() OVER (ORDER BY s DESC, id) - 1 " +
          "AS rk FROM b), " +
          "d AS (SELECT (rk * 10) // (SELECT nn FROM tot) AS decile, " +
          "CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS n_pos " +
          "FROM r GROUP BY 1), " +
          "c AS (SELECT *, CAST(sum(n_pos) OVER (ORDER BY decile " +
          "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos, " +
          "CAST(sum(n_pos) OVER () AS BIGINT) AS tot_pos FROM d) " +
          "SELECT decile, n, n_pos, " +
          "CASE WHEN tot_pos = 0 THEN NULL ELSE " +
          "(CAST(n_pos AS DOUBLE) * (SELECT CAST(nn AS DOUBLE) FROM tot)) " +
          "/ (CAST(n AS DOUBLE) * CAST(tot_pos AS DOUBLE)) END AS lift, " +
          "cum_pos, CASE WHEN tot_pos = 0 THEN NULL ELSE " +
          "CAST(cum_pos AS DOUBLE) / CAST(tot_pos AS DOUBLE) END " +
          "AS cum_capture FROM c"),
      "q_session_dynamic" ->
        ("WITH e AS (SELECT user_id, epoch_us(ts) AS us, " +
          "CASE WHEN event_type = 'purchase' THEN 3600000000 " +
          "ELSE 10800000000 END AS gap FROM events), " +
          "m AS (SELECT user_id, us, us + gap AS en, " +
          "max(us + gap) OVER (PARTITION BY user_id ORDER BY us, us + gap " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS runend " +
          "FROM e), " +
          // Spark merges TOUCHING intervals (event start == session end
          // joins the session), so a break needs strictly-after.
          "f AS (SELECT user_id, us, en, CASE WHEN runend IS NULL " +
          "OR us > runend THEN 1 ELSE 0 END AS brk FROM m), " +
          "s AS (SELECT user_id, us, en, sum(brk) OVER (PARTITION BY " +
          "user_id ORDER BY us, en ROWS UNBOUNDED PRECEDING) AS sid FROM f) " +
          "SELECT user_id, min(us) AS session_start_us, " +
          "CAST(max(en) AS BIGINT) AS session_end_us, " +
          "count(*) AS n_events FROM s GROUP BY user_id, sid"),
      "q_rolling_window" ->
        ("SELECT user_id, ts_us, event_id, count(*) OVER w AS n_1h, " +
          "CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) " +
          "AS sum_1h FROM (SELECT user_id, epoch_us(ts) AS ts_us, " +
          "event_id, value FROM events) " +
          "WINDOW w AS (PARTITION BY user_id ORDER BY ts_us " +
          "RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)"),
      "q_interpolate" -> {
        val wb = "(PARTITION BY user_id ORDER BY day ROWS UNBOUNDED PRECEDING)"
        val wf = "(PARTITION BY user_id ORDER BY day " +
          "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)"
        "WITH daily AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, " +
          "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value " +
          "FROM events GROUP BY 1, 2), " +
          "spans AS (SELECT user_id, min(day) AS mn, max(day) AS mx FROM daily GROUP BY 1), " +
          "grid AS (SELECT user_id, CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS day " +
          "FROM spans), " +
          "j AS (SELECT g.user_id, g.day, d.day_value FROM grid g " +
          "LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day), " +
          "w AS (SELECT user_id, day, day_value, " +
          "last_value(CASE WHEN day_value IS NOT NULL THEN day END IGNORE NULLS) " +
          s"OVER $wb AS pd, " +
          s"last_value(day_value IGNORE NULLS) OVER $wb AS pv, " +
          "first_value(CASE WHEN day_value IS NOT NULL THEN day END IGNORE NULLS) " +
          s"OVER $wf AS nd, " +
          s"first_value(day_value IGNORE NULLS) OVER $wf AS nv FROM j) " +
          "SELECT user_id, day, day_value, " +
          "CASE WHEN pd IS NULL THEN nv WHEN nd IS NULL THEN pv " +
          "WHEN pd = nd THEN pv " +
          "ELSE pv + (nv - pv) * CAST(date_diff('day', pd, day) AS DOUBLE) / " +
          "CAST(date_diff('day', pd, nd) AS DOUBLE) END AS interp_value FROM w"
      },
      "q_percentiles" ->
        ("SELECT event_type, quantile_cont(value, 0.5) AS p50, " +
          "quantile_cont(value, 0.9) AS p90, quantile_cont(value, 0.99) AS p99, " +
          "count(*) AS n FROM events GROUP BY event_type"),
      "q_variant_extract" ->
        ("SELECT event_type, " +
          "CAST(count(CAST(props ->> '$.k' AS BIGINT)) AS BIGINT) " +
          "AS n_with_k, " +
          "CAST(sum(CAST(props ->> '$.k' AS BIGINT)) AS BIGINT) " +
          "AS sum_k, " +
          "min(CAST(props ->> '$.k' AS BIGINT)) AS min_k, " +
          "max(CAST(props ->> '$.k' AS BIGINT)) AS max_k " +
          "FROM events GROUP BY 1"),
      "q_scalar_json" ->
        ("SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k, " +
          "upper(event_type) AS type_uc, CAST(length(event_type) AS BIGINT) AS type_len, " +
          "concat_ws('#', event_type, CAST(user_id AS VARCHAR)) AS tag, " +
          "CAST(year(ts) AS BIGINT) AS y, CAST(month(ts) AS BIGINT) AS m, " +
          "CAST(day(ts) AS BIGINT) AS d, CAST(hour(ts) AS BIGINT) AS h, " +
          "CAST(floor(value * 100) AS BIGINT) AS value_cents FROM events"),
      "q_zorder_key" -> {
        val zterms = (0 until 10).flatMap(i => Seq(
          s"(((da >> $i) & 1) << ${2 * i})",
          s"(((db >> $i) & 1) << ${2 * i + 1})")).mkString(" | ")
        s"SELECT event_id, da, db, $zterms AS zkey FROM (SELECT event_id, " +
          "((user_id % 1024) + 1024) % 1024 AS da, " +
          "((CAST(floor(value * 100) AS BIGINT) % 1024) + 1024) % 1024 AS db " +
          "FROM events)"
      },
      "q_sessionize" -> sessionizeSql,
      "q_setops" ->
        ("SELECT 'click_and_error' AS cohort, user_id FROM " +
          "(SELECT user_id FROM events WHERE event_type = 'click' " +
          "INTERSECT SELECT user_id FROM events WHERE event_type = 'error') " +
          "UNION ALL " +
          "SELECT 'click_not_purchase' AS cohort, user_id FROM " +
          "(SELECT user_id FROM events WHERE event_type = 'click' " +
          "EXCEPT SELECT user_id FROM events WHERE event_type = 'purchase')"),
      "q_salted_join" ->
        ("SELECT e.event_id, e.event_type, d.type_n FROM events e JOIN " +
          "(SELECT event_type, count(*) AS type_n FROM events GROUP BY event_type) d " +
          "ON e.event_type = d.event_type"),
      "q_semi_anti" ->
        ("SELECT c_custkey, c_name FROM customer c " +
          "WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) " +
          "AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey " +
          "AND o.o_totalprice > 100000.0)"),
      "q_pivot" ->
        ("SELECT user_id, " +
          "count(*) FILTER (WHERE event_type = 'click') AS click, " +
          "count(*) FILTER (WHERE event_type = 'error') AS error, " +
          "count(*) FILTER (WHERE event_type = 'purchase') AS purchase, " +
          "count(*) FILTER (WHERE event_type = 'signup') AS signup, " +
          "count(*) FILTER (WHERE event_type = 'view') AS view " +
          "FROM events GROUP BY user_id"),
      "q_rollup" ->
        ("SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, " +
          "count(*) AS n FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)"),
      "q_window_suite" ->
        ("SELECT o_custkey AS custkey, o_orderkey AS orderkey, " +
          "lag(o_totalprice, 1) OVER w AS prev_price, " +
          "lead(o_totalprice, 1) OVER w AS next_price, " +
          "CAST(ntile(4) OVER w AS BIGINT) AS quartile, " +
          "cume_dist() OVER w AS cd, " +
          "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER " +
          "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
          "ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend " +
          "FROM orders " +
          "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"),
      "q_window_rank" ->
        ("SELECT o_custkey AS custkey, o_orderkey AS orderkey, " +
          "o_totalprice AS totalprice, rank_in_cust FROM " +
          "(SELECT o_custkey, o_orderkey, o_totalprice, " +
          "row_number() OVER (PARTITION BY o_custkey " +
          "ORDER BY o_totalprice DESC, o_orderkey) AS rank_in_cust FROM orders) " +
          "WHERE rank_in_cust <= 3"),
      "q_pack_sequences" ->
        ("WITH tk AS (SELECT doc_id, lang, " +
          "CAST(array_length(regexp_split_to_array(text, '\\s+')) AS BIGINT) " +
          "AS n_tokens FROM documents), " +
          "s AS (SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id " +
          "ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS tok_start FROM tk) " +
          "SELECT doc_id, lang, n_tokens, tok_start, " +
          "CAST(tok_start // 256 AS BIGINT) AS first_block, " +
          "CAST((tok_start + greatest(n_tokens - 1, 0)) // 256 AS BIGINT) AS last_block, " +
          "CAST(tok_start % 256 AS BIGINT) AS offset_in_block, " +
          "CAST((tok_start + greatest(n_tokens - 1, 0)) // 256 - tok_start // 256 + 1 " +
          "AS BIGINT) AS n_blocks FROM s"),
      // Bounded-kNN replay: brute radius pairs + (d2, id) rank.
      "q_spatial_knn" ->
        ("WITH a AS (SELECT c_custkey AS id, (c_custkey * 37) % 1000 " +
          "AS x, (c_custkey * 73 + 11) % 1000 AS y FROM customer), " +
          "b AS (SELECT s_suppkey AS id, (s_suppkey * 41 + 5) % 1000 " +
          "AS x, (s_suppkey * 59 + 7) % 1000 AS y FROM supplier), " +
          "p AS (SELECT a.id AS a_id, b.id AS b_id, " +
          "(a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2 " +
          "FROM a JOIN b ON abs(a.x - b.x) <= 16 " +
          "AND abs(a.y - b.y) <= 16) " +
          "SELECT a_id, b_id, CAST(d2 AS BIGINT) AS d2, " +
          "CAST(rn AS BIGINT) AS knn_rank FROM (" +
          "SELECT a_id, b_id, d2, row_number() OVER (PARTITION BY a_id " +
          "ORDER BY d2, b_id) AS rn FROM p) WHERE rn <= 3"),
      // Geohash replay: the Morton bit-sum expanded term-by-term, then
      // MSB-first base32 digits via substr over the shared alphabet.
      "q_geohash_encode" -> {
        val code = (0 until 10).flatMap(i => Seq(
          s"(((x >> $i) & 1) << ${2 * i})",
          s"(((y >> $i) & 1) << ${2 * i + 1})")).mkString(" + ")
        val alpha = graft.ops.Spatial.GeohashAlphabet
        val chars = Seq(15, 10, 5, 0).map(sh =>
          s"substr('$alpha', CAST((code >> $sh) & 31 AS INT) + 1, 1)")
          .mkString(" || ")
        "WITH a AS (SELECT c_custkey AS id, (c_custkey * 37) % 1000 AS x, " +
          "(c_custkey * 73 + 11) % 1000 AS y FROM customer), " +
          s"m AS (SELECT id, x, y, $code AS code FROM a) " +
          s"SELECT id, x, y, $chars AS geo4, " +
          s"substr($chars, 1, 2) AS geo2 FROM m"
      },
      // Hotspot replay: same cell counts, 3x3 neighborhood via a 9-row
      // offset cross join, integer ratio.
      "q_spatial_hotspot" ->
        ("WITH pt AS (SELECT (c_custkey * 37) % 1000 AS x, " +
          "(c_custkey * 73 + 11) % 1000 AS y FROM customer), " +
          "g AS (SELECT x // 50 AS cell_x, y // 50 AS cell_y, " +
          "CAST(count(*) AS BIGINT) AS n FROM pt GROUP BY 1, 2), " +
          "dd AS (SELECT dx.d AS dx, dy.d AS dy FROM " +
          "(SELECT unnest([-1, 0, 1]) AS d) dx CROSS JOIN " +
          "(SELECT unnest([-1, 0, 1]) AS d) dy), " +
          "sp AS (SELECT g.cell_x + dd.dx AS cell_x, " +
          "g.cell_y + dd.dy AS cell_y, " +
          "CAST(sum(g.n) AS BIGINT) AS neigh_n FROM g CROSS JOIN dd " +
          "GROUP BY 1, 2) " +
          "SELECT g.cell_x, g.cell_y, g.n, sp.neigh_n, " +
          "CAST(g.n * 1000 // sp.neigh_n AS BIGINT) AS ratio_q " +
          "FROM g JOIN sp ON g.cell_x = sp.cell_x " +
          "AND g.cell_y = sp.cell_y"),
      // Brute-force radius replay: the audit twin of the engine's
      // cell-bucketed plan (DuckDB's IEJoin handles the range pair).
      "q_spatial_join" ->
        ("WITH a AS (SELECT c_custkey AS id, (c_custkey * 37) % 1000 " +
          "AS x, (c_custkey * 73 + 11) % 1000 AS y FROM customer), " +
          "b AS (SELECT s_suppkey AS id, (s_suppkey * 41 + 5) % 1000 " +
          "AS x, (s_suppkey * 59 + 7) % 1000 AS y FROM supplier), " +
          "p AS (SELECT a.id AS aid, " +
          "(a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2 " +
          "FROM a JOIN b ON abs(a.x - b.x) <= 8 AND abs(a.y - b.y) <= 8) " +
          "SELECT aid AS a_id, CAST(count(*) AS BIGINT) AS n_near, " +
          "CAST(min(d2) AS BIGINT) AS min_d2 FROM p GROUP BY 1"),
      // Event-study replay: identical per-(period, arm) integer
      // moments; diff and baseline as pinned a/b - c/d shapes.
      "q_event_study" -> {
        val diff = "CAST(sum_treat AS DOUBLE) / CAST(n_treat AS DOUBLE) " +
          "- CAST(sum_ctrl AS DOUBLE) / CAST(n_ctrl AS DOUBLE)"
        val base = "CAST(pst AS DOUBLE) / CAST(pnt AS DOUBLE) - " +
          "CAST(psc AS DOUBLE) / CAST(pnc AS DOUBLE)"
        "WITH b AS (SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END " +
          "AS t, CAST(floor(value) AS BIGINT) AS y, " +
          "epoch_us(ts) // 86400000000 - 15 AS k FROM events " +
          "WHERE value IS NOT NULL), " +
          "g AS (SELECT k, CAST(sum(t) AS BIGINT) AS n_treat, " +
          "CAST(count(*) - sum(t) AS BIGINT) AS n_ctrl, " +
          "CAST(sum(CASE WHEN t = 1 THEN y ELSE 0 END) AS BIGINT) " +
          "AS sum_treat, " +
          "CAST(sum(CASE WHEN t = 0 THEN y ELSE 0 END) AS BIGINT) " +
          "AS sum_ctrl FROM b GROUP BY 1), " +
          "pre AS (SELECT CAST(coalesce(sum(n_treat), 0) AS BIGINT) " +
          "AS pnt, CAST(coalesce(sum(n_ctrl), 0) AS BIGINT) AS pnc, " +
          "CAST(coalesce(sum(sum_treat), 0) AS BIGINT) AS pst, " +
          "CAST(coalesce(sum(sum_ctrl), 0) AS BIGINT) AS psc " +
          "FROM g WHERE k < 0) " +
          "SELECT k AS rel_period, n_treat, n_ctrl, sum_treat, sum_ctrl, " +
          s"CASE WHEN n_treat = 0 OR n_ctrl = 0 THEN NULL ELSE $diff END " +
          "AS diff, " +
          "CASE WHEN n_treat = 0 OR n_ctrl = 0 OR pnt = 0 OR pnc = 0 " +
          s"THEN NULL ELSE ($diff) - ($base) END AS effect FROM g, pre"
      },
      // IPW replay: identical per-stratum integer moments, the float
      // numerators folded left-to-right over the stratum-ordered list
      // (0.0 prepended so the fold init matches Spark's aggregate).
      "q_ipw_ate" -> {
        def fold(numer: String) =
          "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
            s"list_transform(a, e -> $numer)), (acc, x) -> acc + x)"
        val numT = fold("CAST(e.syt AS DOUBLE) * CAST(e.n AS DOUBLE) / " +
          "CAST(e.nt AS DOUBLE)")
        val numC = fold("CAST(e.syc AS DOUBLE) * CAST(e.n AS DOUBLE) / " +
          "CAST(e.n - e.nt AS DOUBLE)")
        "WITH b AS (SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 " +
          "END AS t, CAST(floor(value) AS BIGINT) AS y, user_id % 8 AS s " +
          "FROM events WHERE event_type IN ('click', 'view') " +
          "AND value IS NOT NULL AND user_id IS NOT NULL), " +
          "g AS (SELECT s, CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(t) AS BIGINT) AS nt, " +
          "CAST(sum(CASE WHEN t = 1 THEN y ELSE 0 END) AS BIGINT) AS syt, " +
          "CAST(sum(CASE WHEN t = 0 THEN y ELSE 0 END) AS BIGINT) AS syc " +
          "FROM b GROUP BY 1), " +
          "inc AS (SELECT * FROM g WHERE nt > 0 AND nt < n), " +
          "pk AS (SELECT CAST(count(*) AS BIGINT) AS n_inc, " +
          "CAST(coalesce(sum(n), 0) AS BIGINT) AS nn, " +
          "list(struct_pack(n := n, nt := nt, syt := syt, syc := syc) " +
          "ORDER BY s) AS a FROM inc), " +
          "tt AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM g) " +
          "SELECT pk.n_inc AS n_strata_included, " +
          "tt.n_all - pk.n_inc AS n_strata_excluded, " +
          "pk.nn AS n_rows_included, " +
          s"CASE WHEN pk.nn = 0 THEN NULL ELSE $numT / " +
          "CAST(pk.nn AS DOUBLE) END AS treated_mean, " +
          s"CASE WHEN pk.nn = 0 THEN NULL ELSE $numC / " +
          "CAST(pk.nn AS DOUBLE) END AS control_mean, " +
          s"CASE WHEN pk.nn = 0 THEN NULL ELSE $numT / " +
          s"CAST(pk.nn AS DOUBLE) - $numC / CAST(pk.nn AS DOUBLE) " +
          "END AS ate FROM pk, tt"
      },
      // Bottom-k-by-hash replay: same permutation-1 tag, same
      // (hash, id) rank, k = 7 per language.
      "sample_reservoir" -> {
        val a1 = graft.functions.TextHash.permuteA(1)
        val b1 = graft.functions.TextHash.permuteB(1)
        val p = graft.functions.TextHash.P
        "SELECT doc_id, lang, source, CAST(rn AS BIGINT) AS sample_rank " +
          "FROM (SELECT doc_id, lang, source, row_number() OVER (" +
          s"PARTITION BY lang ORDER BY (doc_id * $a1 + $b1) % $p, doc_id) " +
          "AS rn FROM documents) WHERE rn <= 7"
      },
      // Weighted-median replay: same binned diff grid, same cumulative
      // rank pick at (T+1) div 2, smallest qualifying diff wins.
      "q_hodges_lehmann" ->
        ("WITH b AS (SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 " +
          "END AS a, CAST(floor(value) AS BIGINT) AS q FROM events " +
          "WHERE event_type IN ('click', 'view') AND value IS NOT NULL), " +
          "g AS (SELECT q, CAST(sum(a) AS BIGINT) AS ca, " +
          "CAST(count(*) - sum(a) AS BIGINT) AS cb FROM b GROUP BY q), " +
          "ga AS (SELECT q AS qa, ca FROM g WHERE ca > 0), " +
          "gb AS (SELECT q AS qb, cb FROM g WHERE cb > 0), " +
          "dd AS (SELECT qa - qb AS d, CAST(sum(ca * cb) AS BIGINT) AS w " +
          "FROM ga CROSS JOIN gb GROUP BY 1), " +
          "cm AS (SELECT d, sum(w) OVER (ORDER BY d " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum " +
          "FROM dd), " +
          "tt AS (SELECT CAST(coalesce(sum(ca), 0) AS BIGINT) AS n_a, " +
          "CAST(coalesce(sum(cb), 0) AS BIGINT) AS n_b FROM g) " +
          "SELECT tt.n_a, tt.n_b, tt.n_a * tt.n_b AS n_pairs, " +
          "(SELECT min(d) FROM cm, tt " +
          "WHERE cum >= (tt.n_a * tt.n_b + 1) // 2) AS hl_shift FROM tt"),
      // Same binned grid as the MW oracle; n_gt = A-mass times the
      // strictly-below B cumulative, n_lt via the strictly-above
      // complement, one division.
      "q_cliffs_delta" ->
        ("WITH b AS (SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 " +
          "END AS a, CAST(floor(value * 1024.0) AS BIGINT) AS q " +
          "FROM events WHERE event_type IN ('click', 'view') " +
          "AND value IS NOT NULL), " +
          "g AS (SELECT q, CAST(sum(a) AS BIGINT) AS ca, " +
          "CAST(count(*) - sum(a) AS BIGINT) AS cb FROM b GROUP BY q), " +
          "c AS (SELECT q, ca, cb, CAST(coalesce(sum(cb) OVER (" +
          "ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), " +
          "0) AS BIGINT) AS bl, CAST(sum(cb) OVER () AS BIGINT) AS tb " +
          "FROM g), " +
          "agg AS (SELECT CAST(coalesce(sum(ca), 0) AS BIGINT) AS n_a, " +
          "CAST(coalesce(sum(cb), 0) AS BIGINT) AS n_b, " +
          "CAST(coalesce(sum(ca * bl), 0) AS BIGINT) AS n_gt, " +
          "CAST(coalesce(sum(ca * (tb - bl - cb)), 0) AS BIGINT) AS n_lt " +
          "FROM c) " +
          "SELECT n_a, n_b, n_gt, n_lt, " +
          "CASE WHEN n_a = 0 OR n_b = 0 THEN NULL " +
          "ELSE CAST(n_gt - n_lt AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) " +
          "END AS delta FROM agg"),
      // Dense-grid replay of the per-pair doubled U: same 0-filled
      // groups x bins cross join, same strictly-below cumulative, same
      // pair equi-join on the bin — exact BIGINTs, no floats at all.
      "q_jonckheere" ->
        ("WITH b AS (SELECT CAST(month(o_orderdate) AS BIGINT) AS g, " +
          "CAST(floor(o_totalprice / 5000.0) AS BIGINT) AS q FROM orders " +
          "WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL), " +
          "g1 AS (SELECT g, q, CAST(count(*) AS BIGINT) AS c FROM b " +
          "GROUP BY 1, 2), " +
          "gs AS (SELECT DISTINCT g FROM g1), " +
          "vs AS (SELECT DISTINCT q FROM g1), " +
          "dense AS (SELECT gs.g, vs.q, coalesce(g1.c, 0) AS c " +
          "FROM gs CROSS JOIN vs " +
          "LEFT JOIN g1 ON g1.g = gs.g AND g1.q = vs.q), " +
          "cum AS (SELECT g, q, c, coalesce(sum(c) OVER (PARTITION BY g " +
          "ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), " +
          "0) AS bl, sum(c) OVER (PARTITION BY g) AS n FROM dense) " +
          "SELECT x.g AS g_lo, y.g AS g_hi, " +
          "CAST(max(x.n) AS BIGINT) AS n_lo, " +
          "CAST(max(y.n) AS BIGINT) AS n_hi, " +
          "CAST(sum(y.c * (2 * x.bl + x.c)) AS BIGINT) AS u2 " +
          "FROM cum x JOIN cum y ON x.g < y.g AND x.q = y.q " +
          "GROUP BY 1, 2"),
      // Runs-test replay: same lower-median element pick, same tie
      // drop, same run-boundary lag flag, and the z formula spelled in
      // the engine's exact IEEE shape (p, nn, mu, s2 subexpressions
      // duplicated textually).
      "q_runs_test" -> {
        val p = "(2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))"
        val nn = "CAST(n1 + n2 AS DOUBLE)"
        val mu = s"($p / $nn + 1.0)"
        val s2 = s"(($p * ($p - $nn)) / ($nn * $nn * ($nn - 1.0)))"
        "WITH h AS (SELECT event_type, epoch_us(ts) // 86400000000 AS d, " +
          "CAST(sum(CAST(floor(value * 1024.0) AS BIGINT)) AS BIGINT) " +
          "AS hx FROM events GROUP BY 1, 2), " +
          "b AS (SELECT event_type AS k, d AS o, hx AS v FROM h " +
          "WHERE hx IS NOT NULL), " +
          "r AS (SELECT k, o, v, row_number() OVER (PARTITION BY k " +
          "ORDER BY v, o) AS rn, count(*) OVER (PARTITION BY k) AS n " +
          "FROM b), " +
          "md AS (SELECT k, v AS med FROM r WHERE rn = (n + 1) // 2), " +
          "sg AS (SELECT b.k, b.o, CASE WHEN b.v > md.med THEN 1 " +
          "ELSE -1 END AS s FROM b JOIN md ON b.k = md.k " +
          "WHERE b.v <> md.med), " +
          "fl AS (SELECT k, s, CASE WHEN lag(s) OVER (PARTITION BY k " +
          "ORDER BY o) IS NULL OR lag(s) OVER (PARTITION BY k " +
          "ORDER BY o) <> s THEN 1 ELSE 0 END AS nw FROM sg), " +
          "ag AS (SELECT k AS event_type, " +
          "CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1, " +
          "CAST(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n2, " +
          "CAST(sum(nw) AS BIGINT) AS runs FROM fl GROUP BY 1) " +
          "SELECT event_type, n1, n2, runs, " +
          s"CASE WHEN n1 = 0 OR n2 = 0 OR $s2 <= 0.0 THEN NULL " +
          s"ELSE (CAST(runs AS DOUBLE) - $mu) / sqrt($s2) END AS z " +
          "FROM ag"
      },
      "q_mann_whitney" ->
        // Exact-integer 2U over the binned grid; the tie bracket and the
        // variance numerator ride HUGEINT (Spark: DECIMAL(38,0)); one
        // division, one sqrt, identical float shape to the engine.
        ("WITH b AS (SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 " +
          "END AS a, CAST(floor(value * 1024.0) AS BIGINT) AS q " +
          "FROM events WHERE event_type IN ('click', 'view') " +
          "AND value IS NOT NULL), " +
          "g AS (SELECT q, CAST(sum(a) AS BIGINT) AS ca, " +
          "CAST(count(*) - sum(a) AS BIGINT) AS cb FROM b GROUP BY q), " +
          "c AS (SELECT q, ca, cb, CAST(coalesce(sum(cb) OVER (" +
          "ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), " +
          "0) AS BIGINT) AS bl FROM g), " +
          "agg AS (SELECT CAST(coalesce(sum(ca), 0) AS BIGINT) AS n_a, " +
          "CAST(coalesce(sum(cb), 0) AS BIGINT) AS n_b, " +
          "CAST(coalesce(sum(ca * (2 * bl + cb)), 0) AS BIGINT) AS u2, " +
          "coalesce(sum(CAST(ca + cb AS HUGEINT) * (ca + cb) * (ca + cb) " +
          "- (ca + cb)), 0) AS tb FROM c), " +
          "v AS (SELECT n_a, n_b, u2, " +
          "CAST(n_a AS HUGEINT) * n_b * ((CAST(n_a + n_b AS HUGEINT) + 1) " +
          "* (n_a + n_b) * (CAST(n_a + n_b AS HUGEINT) - 1) - tb) AS vn, " +
          "12 * CAST(n_a + n_b AS HUGEINT) * " +
          "(CAST(n_a + n_b AS HUGEINT) - 1) AS vd FROM agg) " +
          "SELECT n_a, n_b, u2, " +
          "CASE WHEN n_a = 0 OR n_b = 0 OR vn <= 0 THEN NULL ELSE " +
          "(CAST(u2 AS DOUBLE) - CAST(n_a * n_b AS DOUBLE)) / " +
          "(2.0 * sqrt(CAST(vn AS DOUBLE) / CAST(vd AS DOUBLE))) END AS z " +
          "FROM v"),
      "q_kruskal_wallis" ->
        // Doubled average ranks (2R = 2*below + equal + 1) stay exact
        // integers; per-group S_i^2/(4 n_i) is one division; the group
        // fold and the H / tie chains mirror the engine verbatim.
        ("WITH b AS (SELECT event_type AS g, " +
          "CAST(floor(value * 1024.0) AS BIGINT) AS q FROM events " +
          "WHERE event_type IS NOT NULL AND value IS NOT NULL), " +
          "pq AS (SELECT q, CAST(count(*) AS BIGINT) AS cq FROM b " +
          "GROUP BY 1), " +
          "r AS (SELECT q, cq, CAST(coalesce(sum(cq) OVER (" +
          "ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), " +
          "0) AS BIGINT) AS lt FROM pq), " +
          "r2 AS (SELECT q, 2 * lt + cq + 1 AS s2 FROM r), " +
          "grp AS (SELECT g, CAST(sum(cgq) AS BIGINT) AS ni, " +
          "sum(CAST(cgq AS HUGEINT) * CAST(s2 AS HUGEINT)) AS si " +
          "FROM (SELECT g, q, CAST(count(*) AS BIGINT) AS cgq FROM b " +
          "GROUP BY 1, 2) JOIN r2 USING (q) GROUP BY 1), " +
          "tm AS (SELECT g, CAST(si * si AS DOUBLE) / " +
          "(4.0 * CAST(ni AS DOUBLE)) AS term FROM grp), " +
          "tt AS (SELECT CAST(coalesce(sum(cq), 0) AS BIGINT) AS n, " +
          "coalesce(sum(CAST(cq AS HUGEINT) * cq * cq - cq), 0) " +
          "AS tiesum FROM pq), " +
          "f AS (SELECT CAST(count(*) AS BIGINT) AS k_groups, " +
          "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
          "list(term ORDER BY g)), (a, x) -> a + x) AS t FROM tm) " +
          "SELECT n, k_groups, " +
          "CASE WHEN n < 2 OR k_groups < 2 THEN NULL ELSE h END AS h, " +
          "CASE WHEN n < 2 OR k_groups < 2 OR cden <= 0 THEN NULL ELSE " +
          "h * CAST(nn AS DOUBLE) / CAST(cden AS DOUBLE) END AS h_tie " +
          "FROM (SELECT tt.n, f.k_groups, " +
          "12.0 * f.t / (CAST(tt.n AS DOUBLE) * " +
          "(CAST(tt.n AS DOUBLE) + 1.0)) - " +
          "3.0 * (CAST(tt.n AS DOUBLE) + 1.0) AS h, " +
          "CAST(tt.n AS HUGEINT) * tt.n * tt.n - tt.n AS nn, " +
          "CAST(tt.n AS HUGEINT) * tt.n * tt.n - tt.n - tiesum AS cden " +
          "FROM tt CROSS JOIN f)"),
      "q_mcnemar" ->
        // Discordant cells from per-user max-of-indicator flags; both
        // statistics are ONE division of exact integers.
        ("WITH per AS (SELECT user_id, " +
          "max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS x, " +
          "max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS y " +
          "FROM events GROUP BY 1), " +
          "ct AS (SELECT CAST(coalesce(sum(CASE WHEN x = 1 AND y = 0 " +
          "THEN 1 ELSE 0 END), 0) AS BIGINT) AS b, " +
          "CAST(coalesce(sum(CASE WHEN x = 0 AND y = 1 THEN 1 ELSE 0 " +
          "END), 0) AS BIGINT) AS c FROM per) " +
          "SELECT b, c, " +
          "CASE WHEN b + c = 0 THEN NULL ELSE " +
          "CAST((b - c) * (b - c) AS DOUBLE) / CAST(b + c AS DOUBLE) " +
          "END AS chi2, " +
          "CASE WHEN b + c = 0 THEN NULL ELSE " +
          "CAST(greatest(abs(b - c) - 1, 0) * " +
          "greatest(abs(b - c) - 1, 0) AS DOUBLE) / " +
          "CAST(b + c AS DOUBLE) END AS chi2_cc FROM ct"),
      "q_levene_bf" ->
        // Lower-median element pick per group, exact |x-med| integers,
        // the kruskal-style ordered group fold, fixed F chain.
        ("WITH b AS (SELECT event_type AS g, " +
          "CAST(floor(value * 1024.0) AS BIGINT) AS q FROM events " +
          "WHERE event_type IS NOT NULL AND value IS NOT NULL), " +
          "medr AS (SELECT g, q, row_number() OVER (" +
          "PARTITION BY g ORDER BY q) AS rn, " +
          "count(*) OVER (PARTITION BY g) AS n FROM b), " +
          "med AS (SELECT g, q AS med FROM medr WHERE rn = (n + 1) // 2), " +
          "z AS (SELECT b.g AS g, abs(b.q - med.med) AS z FROM b " +
          "JOIN med ON b.g = med.g), " +
          "grp AS (SELECT g, CAST(count(*) AS BIGINT) AS ni, " +
          "CAST(sum(z) AS HUGEINT) AS zi, " +
          "sum(CAST(z AS HUGEINT) * CAST(z AS HUGEINT)) AS zz " +
          "FROM z GROUP BY 1), " +
          "tm AS (SELECT g, ni, zi, zz, CAST(zi * zi AS DOUBLE) / " +
          "CAST(ni AS DOUBLE) AS term FROM grp), " +
          "f AS (SELECT CAST(count(*) AS BIGINT) AS k_groups, " +
          "CAST(coalesce(sum(ni), 0) AS BIGINT) AS n, " +
          "coalesce(sum(zi), 0) AS ztot, coalesce(sum(zz), 0) AS zzt, " +
          "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
          "list(term ORDER BY g)), (a, x) -> a + x) AS a FROM tm) " +
          "SELECT n, k_groups, " +
          "CASE WHEN k_groups < 2 OR n <= k_groups OR " +
          "CAST(zzt AS DOUBLE) - a = 0.0 THEN NULL ELSE " +
          "(CAST(n AS DOUBLE) - CAST(k_groups AS DOUBLE)) * " +
          "(a - CAST(ztot * ztot AS DOUBLE) / CAST(n AS DOUBLE)) / " +
          "((CAST(k_groups AS DOUBLE) - 1.0) * " +
          "(CAST(zzt AS DOUBLE) - a)) END AS f_stat FROM f"),
      "q_seq_pattern" ->
        // Identical symbolization, ordering, and regex; greedy and lazy
        // quantifiers end every match at the same first terminal 'p',
        // so non-overlapping counts agree across engines.
        ("WITH j AS (SELECT user_id, string_agg(" +
          "CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c' " +
          "WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's' ELSE 'e' " +
          "END, '' ORDER BY epoch_us(ts), event_id) AS journey " +
          "FROM events GROUP BY 1) " +
          "SELECT n_matches, CAST(count(*) AS BIGINT) AS n_users FROM (" +
          "SELECT CAST(len(regexp_extract_all(journey, " +
          "'v[^p]*c[^p]*p')) AS BIGINT) AS n_matches FROM j) GROUP BY 1"),
      "q_window_funnel" -> {
        // Same cascaded running maxes as the engine (the latest-chain-
        // start invariant makes max-so-far optimal for every later
        // window check). Pure window functions — exact integers only.
        val w = 259200000000L
        "WITH e AS (SELECT user_id AS u, epoch_us(ts) AS us, " +
          "CAST(CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2 " +
          "WHEN 'purchase' THEN 3 ELSE 0 END AS BIGINT) AS st " +
          "FROM events), " +
          "r1 AS (SELECT u, us, st, max(CASE WHEN st = 1 THEN us END) " +
          "OVER (PARTITION BY u ORDER BY us, st " +
          "ROWS UNBOUNDED PRECEDING) AS s1run FROM e WHERE st >= 1), " +
          "r2 AS (SELECT u, us, st, s1run, " +
          "CASE WHEN st = 2 AND s1run IS NOT NULL AND " +
          s"us - s1run <= $w THEN s1run END AS c2 FROM r1), " +
          "r3 AS (SELECT u, us, st, c2, max(c2) OVER (" +
          "PARTITION BY u ORDER BY us, st ROWS UNBOUNDED PRECEDING) " +
          "AS s2run FROM r2), " +
          "r4 AS (SELECT u, st, c2, " +
          "CASE WHEN st = 3 AND s2run IS NOT NULL AND " +
          s"us - s2run <= $w THEN s2run END AS c3 FROM r3), " +
          "d AS (SELECT u, " +
          "max(CASE WHEN st = 1 THEN 1 ELSE 0 END) AS d1, " +
          "max(CASE WHEN c2 IS NOT NULL THEN 1 ELSE 0 END) AS d2, " +
          "max(CASE WHEN c3 IS NOT NULL THEN 1 ELSE 0 END) AS d3 " +
          "FROM r4 GROUP BY 1) " +
          "SELECT CAST(depth AS BIGINT) AS depth, " +
          "CAST(count(*) AS BIGINT) AS n_users FROM (" +
          "SELECT CASE WHEN d3 = 1 THEN 3 WHEN d2 = 1 THEN 2 " +
          "WHEN d1 = 1 THEN 1 ELSE 0 END AS depth FROM d) GROUP BY 1"
      },
      "q_sprt" -> {
        // Same injected log constants as the engine; per-row LLR from
        // exact (t, k) — no float accumulation anywhere.
        val la = math.log((1.0 - 0.25) / (1.0 - 0.2))
        val lb = math.log(0.25 / 0.2)
        val logA = math.log((1.0 - 0.05) / 0.05)
        val logB = math.log(0.05 / (1.0 - 0.05))
        "WITH e AS (SELECT epoch_us(ts) AS us, event_id, " +
          "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS s " +
          "FROM events), " +
          "o AS (SELECT row_number() OVER (ORDER BY us, event_id) AS t, " +
          "sum(s) OVER (ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) " +
          "AS k FROM e), " +
          s"l AS (SELECT t, k, CAST(k AS DOUBLE) * CAST($lb AS DOUBLE) " +
          s"+ CAST(t - k AS DOUBLE) * CAST($la AS DOUBLE) AS llr " +
          "FROM o), " +
          "c AS (SELECT CAST(t AS BIGINT) AS first_cross, " +
          s"CASE WHEN llr >= CAST($logA AS DOUBLE) THEN 'accept_h1' " +
          "ELSE 'accept_h0' END AS decision FROM l " +
          s"WHERE llr >= CAST($logA AS DOUBLE) " +
          s"OR llr <= CAST($logB AS DOUBLE) ORDER BY t LIMIT 1), " +
          "f AS (SELECT CAST(coalesce(max(t), 0) AS BIGINT) AS n_trials, " +
          "CAST(coalesce(max(k), 0) AS BIGINT) AS n_success FROM l) " +
          "SELECT f.n_trials, f.n_success, " +
          s"CAST(f.n_success AS DOUBLE) * CAST($lb AS DOUBLE) + " +
          "CAST(f.n_trials - f.n_success AS DOUBLE) * " +
          s"CAST($la AS DOUBLE) AS llr_final, " +
          "c.first_cross, c.decision FROM f LEFT JOIN c ON true"
      },
      "q_ipf_raking" -> {
        // Same fixed-point rescaling rounds; HUGEINT intermediates cast
        // back to BIGINT (no overflow inside the documented bound).
        val chain = (1 to 3).map { k =>
          val prev = if (k == 1) "c0" else s"cc${k - 1}"
          s"rr$k AS (SELECT p.r, p.c, p.n, " +
            "CAST(p.w * t.rowt // s.rsum AS BIGINT) AS w " +
            s"FROM $prev p JOIN (SELECT r, sum(w) AS rsum FROM $prev " +
            "GROUP BY 1) s ON p.r = s.r CROSS JOIN t), " +
            s"cc$k AS (SELECT p.r, p.c, p.n, " +
            "CAST(p.w * t.colt // s.csum AS BIGINT) AS w " +
            s"FROM rr$k p JOIN (SELECT c AS c2, sum(w) AS csum " +
            s"FROM rr$k GROUP BY 1) s ON p.c = s.c2 CROSS JOIN t)"
        }.mkString(", ")
        "WITH c0 AS (SELECT CAST(c_mktsegment AS VARCHAR) AS r, " +
          "CAST(c_nationkey % 5 AS VARCHAR) AS c, " +
          "CAST(count(*) AS BIGINT) AS n, " +
          "CAST(count(*) AS BIGINT) * 1000 AS w FROM customer " +
          "WHERE c_mktsegment IS NOT NULL AND c_nationkey IS NOT NULL " +
          "GROUP BY 1, 2), " +
          "t AS (SELECT CAST(CAST(sum(n) AS HUGEINT) * 1000 // " +
          "count(DISTINCT r) AS BIGINT) AS rowt, " +
          "CAST(CAST(sum(n) AS HUGEINT) * 1000 // " +
          "count(DISTINCT c) AS BIGINT) AS colt FROM c0), " +
          chain + " " +
          "SELECT r AS row_key, c AS col_key, n, w AS w_milli, " +
          "CAST(w AS DOUBLE) / 1000.0 AS w FROM cc3"
      },
      "q_shapley_attribution" -> {
        val w0 = 1.0 / 3.0
        val w1 = 1.0 / 6.0
        val nTot = (0 until 8).map(t => s"n$t").mkString(" + ")
        def v(s: Int) = {
          val cov = (0 until 8).filter(t => (t & ~s) == 0)
            .map(t => s"c$t").mkString(" + ")
          s"CAST($cov AS DOUBLE) / CAST($nTot AS DOUBLE)"
        }
        def phi(bit: Int) = {
          val others = Seq(1, 2, 4).filter(_ != (1 << bit))
          val (a, b) = (others(0), others(1))
          val i = 1 << bit
          s"CAST($w0 AS DOUBLE) * (${v(i)} - ${v(0)}) + " +
            s"CAST($w1 AS DOUBLE) * (${v(i + a)} - ${v(a)}) + " +
            s"CAST($w1 AS DOUBLE) * (${v(i + b)} - ${v(b)}) + " +
            s"CAST($w0 AS DOUBLE) * (${v(7)} - ${v(a + b)})"
        }
        val cells = (0 until 8).map(sid =>
          "CAST(coalesce(sum(CASE WHEN t0 + 2 * t1 + 4 * t2 = " +
            s"$sid THEN 1 ELSE 0 END), 0) AS BIGINT) AS n$sid, " +
            "CAST(coalesce(sum(CASE WHEN t0 + 2 * t1 + 4 * t2 = " +
            s"$sid THEN y ELSE 0 END), 0) AS BIGINT) AS c$sid")
          .mkString(", ")
        "WITH per AS (SELECT user_id, " +
          "max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS t0, " +
          "max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS t1, " +
          "max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) " +
          "AS t2, " +
          "max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) " +
          "AS y FROM events GROUP BY 1), " +
          s"a AS (SELECT $cells FROM per) " +
          s"SELECT $nTot AS n_subjects, " +
          s"CASE WHEN $nTot = 0 THEN NULL ELSE ${phi(0)} END AS phi_1, " +
          s"CASE WHEN $nTot = 0 THEN NULL ELSE ${phi(1)} END AS phi_2, " +
          s"CASE WHEN $nTot = 0 THEN NULL ELSE ${phi(2)} END AS phi_3 " +
          "FROM a"
      },
      "q_permutation_test" -> {
        // The engine's 64 affine label scrambles, constants shared from
        // TextHash.permute; every mean is one division of exact sums.
        val permVals = (1 to 64).map(p =>
          s"(${p}, ${graft.functions.TextHash.permuteA(p)}, " +
            s"${graft.functions.TextHash.permuteB(p)})").mkString(", ")
        val hp = graft.functions.TextHash.P
        "WITH per AS (SELECT user_id AS id, " +
          "max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) " +
          "AS tr, sum(CAST(CAST(floor(value * 1024.0) AS BIGINT) " +
          "AS HUGEINT)) AS s, CAST(count(*) AS BIGINT) AS c FROM events " +
          "WHERE user_id IS NOT NULL AND value IS NOT NULL GROUP BY 1), " +
          "obs AS (SELECT CAST(count(*) AS BIGINT) AS n_subjects, " +
          "sum(CASE WHEN tr = 1 THEN s END) AS sa, " +
          "sum(CASE WHEN tr = 1 THEN c END) AS ca, " +
          "sum(CASE WHEN tr = 0 THEN s END) AS sb, " +
          "sum(CASE WHEN tr = 0 THEN c END) AS cb FROM per), " +
          "o AS (SELECT n_subjects, CASE WHEN ca IS NULL OR cb IS NULL " +
          "THEN NULL ELSE CAST(sa AS DOUBLE) / CAST(ca AS DOUBLE) - " +
          "CAST(sb AS DOUBLE) / CAST(cb AS DOUBLE) END AS dobs " +
          "FROM obs), " +
          s"prm AS (SELECT * FROM (VALUES $permVals) v(p, pa, pb)), " +
          "byp AS (SELECT p, sum(CASE WHEN side = 1 THEN s END) AS sa, " +
          "sum(CASE WHEN side = 1 THEN c END) AS ca, " +
          "sum(CASE WHEN side = 0 THEN s END) AS sb, " +
          "sum(CASE WHEN side = 0 THEN c END) AS cb FROM (" +
          s"SELECT per.*, prm.p, ((id % $hp) * pa + pb) % $hp % 2 " +
          "AS side FROM per CROSS JOIN prm) GROUP BY 1), " +
          "d AS (SELECT p, CASE WHEN ca IS NULL OR cb IS NULL THEN NULL " +
          "ELSE CAST(sa AS DOUBLE) / CAST(ca AS DOUBLE) - " +
          "CAST(sb AS DOUBLE) / CAST(cb AS DOUBLE) END AS dp FROM byp) " +
          "SELECT o.n_subjects, CAST(64 AS BIGINT) AS n_perms, " +
          "o.dobs AS obs_diff, " +
          "CAST(coalesce(sum(CASE WHEN abs(dp) >= abs(o.dobs) THEN 1 " +
          "ELSE 0 END), 0) AS BIGINT) AS n_ge, " +
          "CASE WHEN o.dobs IS NULL THEN NULL ELSE " +
          "(1.0 + CAST(coalesce(sum(CASE WHEN abs(dp) >= abs(o.dobs) " +
          "THEN 1 ELSE 0 END), 0) AS DOUBLE)) / 65.0 END AS p_value " +
          "FROM d CROSS JOIN o GROUP BY o.n_subjects, o.dobs"
      },
      "q_streaks" ->
        ("WITH d AS (SELECT DISTINCT user_id, " +
          "epoch_us(ts) // 86400000000 AS day FROM events), " +
          "g AS (SELECT user_id, day - dense_rank() OVER (" +
          "PARTITION BY user_id ORDER BY day) AS grp FROM d), " +
          "s AS (SELECT user_id, CAST(count(*) AS BIGINT) AS len " +
          "FROM g GROUP BY user_id, grp), " +
          "m AS (SELECT user_id, max(len) AS longest_streak FROM s " +
          "GROUP BY 1) " +
          "SELECT longest_streak, CAST(count(*) AS BIGINT) AS n_users " +
          "FROM m GROUP BY 1"),
      "q_mahalanobis_2d" ->
        // Mirrors Profile.mahalanobis2d: exact HUGEINT A/B/C/det and
        // per-row numerator, integer-ordered rank, ONE final division.
        ("WITH b AS (SELECT event_id, " +
          "CAST(floor(value * 1024.0) AS BIGINT) AS x, " +
          "(epoch_us(ts) // 86400000000) % 7 AS y FROM events " +
          "WHERE value IS NOT NULL), " +
          "mo AS (SELECT CAST(count(*) AS HUGEINT) AS n, " +
          "CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy, " +
          "sum(CAST(x AS HUGEINT) * x) AS sxx, " +
          "sum(CAST(x AS HUGEINT) * y) AS sxy, " +
          "sum(CAST(y AS HUGEINT) * y) AS syy FROM b), " +
          "abc AS (SELECT n, sx, sy, n * sxx - sx * sx AS a, " +
          "n * sxy - sx * sy AS bb, n * syy - sy * sy AS c FROM mo), " +
          "d AS (SELECT *, a * c - bb * bb AS det FROM abc " +
          "WHERE a * c - bb * bb > 0), " +
          "sc AS (SELECT event_id, " +
          "(n * x - sx) * (n * x - sx) * c - " +
          "2 * (n * x - sx) * (n * y - sy) * bb + " +
          "(n * y - sy) * (n * y - sy) * a AS num, det " +
          "FROM b, d) " +
          "SELECT event_id, CAST(num AS DOUBLE) / CAST(det AS DOUBLE) " +
          "AS md2 FROM sc ORDER BY num DESC, event_id ASC LIMIT 50"),
      "q_stickiness" ->
        ("WITH e AS (SELECT epoch_us(ts) // 2592000000000 AS m, " +
          "epoch_us(ts) // 86400000000 AS day, user_id FROM events), " +
          "ud AS (SELECT DISTINCT m, day, user_id FROM e), " +
          "agg AS (SELECT m, CAST(count(*) AS BIGINT) AS user_days, " +
          "CAST(count(DISTINCT day) AS BIGINT) AS n_days, " +
          "CAST(count(DISTINCT user_id) AS BIGINT) AS mau FROM ud " +
          "GROUP BY 1) " +
          "SELECT m, n_days, user_days, mau, " +
          "CAST(user_days AS DOUBLE) / CAST(n_days AS DOUBLE) AS avg_dau, " +
          "CAST(user_days AS DOUBLE) / CAST(n_days AS DOUBLE) / " +
          "CAST(mau AS DOUBLE) AS stickiness FROM agg"),
      "q_ndcg" ->
        (s"WITH b AS ($scoredEvents), " +
          "r AS (SELECT *, row_number() OVER (PARTITION BY q " +
          "ORDER BY s DESC, id) AS rn FROM b), " +
          "g AS (SELECT CAST(q AS BIGINT) AS query, " +
          "CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(y) AS BIGINT) AS n_pos, " +
          "CAST(coalesce(sum(CASE WHEN rn <= 10 AND y = 1 THEN " +
          s"list_extract([$w], CAST(rn AS INT)) END), 0) AS BIGINT) " +
          "AS dcg_scaled FROM r GROUP BY q) " +
          "SELECT query, n, n_pos, dcg_scaled, " +
          "CASE WHEN n_pos > 0 THEN CAST(list_extract(" +
          s"[$prefix], CAST(least(n_pos, 10) AS INT)) AS BIGINT) END " +
          "AS idcg_scaled, " +
          "CASE WHEN n_pos > 0 THEN CAST(dcg_scaled AS DOUBLE) / " +
          s"CAST(list_extract([$prefix], CAST(least(n_pos, 10) AS INT)) " +
          "AS DOUBLE) END AS ndcg FROM g"),
      "q_mrr" ->
        (s"WITH b AS ($scoredEvents), " +
          "r AS (SELECT *, row_number() OVER (PARTITION BY q " +
          "ORDER BY s DESC, id) AS rn FROM b), " +
          "f AS (SELECT q, min(rn) AS fr FROM r WHERE y = 1 GROUP BY q) " +
          "SELECT CAST(count(*) AS BIGINT) AS n_queries, " +
          "CAST(coalesce(sum(1000000 // fr), 0) AS BIGINT) " +
          "AS sum_recip_scaled, " +
          "CASE WHEN count(*) > 0 THEN " +
          "CAST(coalesce(sum(1000000 // fr), 0) AS DOUBLE) / " +
          "(CAST(count(*) AS DOUBLE) * 1e6) END AS mrr FROM f"),
      "q_qte" -> {
        def arm(c: String, a: String) =
          s"max(CASE WHEN arm = $a THEN $c END)"
        "WITH g AS (SELECT ((user_id % 2) + 2) % 2 = 0 AS arm, value " +
          "FROM events WHERE value IS NOT NULL), " +
          "a AS (SELECT arm, quantile_cont(value, 0.25) AS p25, " +
          "quantile_cont(value, 0.5) AS p50, " +
          "quantile_cont(value, 0.75) AS p75, " +
          "quantile_cont(value, 0.9) AS p90, " +
          "CAST(count(*) AS BIGINT) AS n FROM g GROUP BY arm) " +
          "SELECT " +
          s"${arm("n", "true")} AS n_a, ${arm("n", "false")} AS n_b, " +
          s"${arm("p25", "true")} AS p25_a, ${arm("p25", "false")} AS p25_b, " +
          s"${arm("p50", "true")} AS p50_a, ${arm("p50", "false")} AS p50_b, " +
          s"${arm("p75", "true")} AS p75_a, ${arm("p75", "false")} AS p75_b, " +
          s"${arm("p90", "true")} AS p90_a, ${arm("p90", "false")} AS p90_b, " +
          s"${arm("p25", "true")} - ${arm("p25", "false")} AS d25, " +
          s"${arm("p50", "true")} - ${arm("p50", "false")} AS d50, " +
          s"${arm("p75", "true")} - ${arm("p75", "false")} AS d75, " +
          s"${arm("p90", "true")} - ${arm("p90", "false")} AS d90 FROM a"
      },
      "q_skyline" ->
        ("WITH b AS (SELECT DISTINCT event_type AS g, value AS x, " +
          "epoch_us(ts) * 1000 AS y FROM events " +
          "WHERE value IS NOT NULL AND ts IS NOT NULL), " +
          "w AS (SELECT g, x, y, min(y) OVER (PARTITION BY g " +
          "ORDER BY x DESC, y ASC ROWS BETWEEN UNBOUNDED PRECEDING " +
          "AND 1 PRECEDING) AS my FROM b) " +
          "SELECT g AS event_type, x AS value, CAST(y AS BIGINT) AS ts_ns " +
          "FROM w WHERE my IS NULL OR y < my"),
      "q_t_closeness" ->
        ("WITH b AS (SELECT event_type, " +
          "((user_id % 200) + 200) % 200 AS uid_bucket, " +
          "CAST(floor(value) AS BIGINT) AS v FROM events " +
          "WHERE value IS NOT NULL), " +
          "cell AS (SELECT event_type, uid_bucket, v, count(*) AS c " +
          "FROM b GROUP BY 1, 2, 3), " +
          "gcnt AS (SELECT v, count(*) AS cv FROM b GROUP BY 1), " +
          "tot AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM b), " +
          "grp AS (SELECT event_type, uid_bucket, count(*) AS ng " +
          "FROM b GROUP BY 1, 2), " +
          "terms AS (SELECT cell.event_type, cell.uid_bucket, grp.ng, " +
          "abs(CAST(cell.c AS HUGEINT) * nn - " +
          "CAST(gcnt.cv AS HUGEINT) * grp.ng) - " +
          "CAST(gcnt.cv AS HUGEINT) * grp.ng AS trm " +
          "FROM cell JOIN gcnt USING (v) " +
          "JOIN grp USING (event_type, uid_bucket) CROSS JOIN tot), " +
          "part AS (SELECT event_type, uid_bucket, ng, sum(trm) AS p " +
          "FROM terms GROUP BY 1, 2, 3) " +
          "SELECT event_type, uid_bucket, CAST(ng AS BIGINT) AS n, " +
          "CAST(p + CAST(ng AS HUGEINT) * nn AS DOUBLE) / " +
          "(2.0 * CAST(ng AS DOUBLE) * CAST(nn AS DOUBLE)) AS tv " +
          "FROM part CROSS JOIN tot"),
      "q_isotonic" ->
        // PAV via the exact minimax characterization, FLAT relational
        // form (k×j×i grid + two argmin/argmax windows) — DuckDB's
        // nested lambdas corrupt tail entries at 3-deep nesting over
        // ~50-element outers (observed on this exact query; the
        // struct-fold hazard's sibling), so no lambda nests here. The
        // double-ratio ORDER BY is exact at these magnitudes (distinct
        // rationals with den ≤ 1e6 differ by ≥ 1e-12 ≫ double eps) and
        // ties break to the same (smallest i / smallest j) pair the
        // Spark fold keeps.
        ("WITH b AS (SELECT least(CAST(floor(value / 8.0) AS BIGINT), " +
          "63) AS bin, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 " +
          "END AS y FROM events WHERE value IS NOT NULL), " +
          "g AS (SELECT bin, CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(y) AS BIGINT) AS pos FROM b GROUP BY bin), " +
          "pk AS (SELECT list_sort(list(struct_pack(bin := bin, " +
          "n := n, pos := pos))) AS bs FROM g), " +
          "ar AS (SELECT list_transform(bs, x -> x.bin) AS bins, " +
          "list_transform(bs, x -> x.n) AS ns, " +
          "list_transform(bs, x -> x.pos) AS ps, len(bs) AS kk FROM pk), " +
          "pf AS (SELECT bins, ns, ps, kk, " +
          "list_transform(range(1, kk + 1), j -> list_reduce(" +
          "list_prepend(CAST(0 AS BIGINT), ns[1:j]), (a, x) -> a + x)) " +
          "AS cw, " +
          "list_transform(range(1, kk + 1), j -> list_reduce(" +
          "list_prepend(CAST(0 AS BIGINT), ps[1:j]), (a, x) -> a + x)) " +
          "AS cp FROM ar), " +
          "rats AS (SELECT kx.k, jx.j, ix.i, " +
          "cp[jx.j] - CASE WHEN ix.i > 1 THEN cp[ix.i - 1] ELSE 0 END " +
          "AS num, " +
          "cw[jx.j] - CASE WHEN ix.i > 1 THEN cw[ix.i - 1] ELSE 0 END " +
          "AS den " +
          "FROM pf, unnest(range(1, kk + 1)) AS kx(k), " +
          "unnest(range(1, kk + 1)) AS jx(j), " +
          "unnest(range(1, kk + 1)) AS ix(i) " +
          "WHERE jx.j >= kx.k AND ix.i <= kx.k), " +
          "mx AS (SELECT k, j, num, den FROM (SELECT *, row_number() " +
          "OVER (PARTITION BY k, j ORDER BY CAST(num AS DOUBLE) / " +
          "CAST(den AS DOUBLE) DESC, i) AS rn FROM rats) WHERE rn = 1), " +
          "fitt AS (SELECT k, num, den FROM (SELECT *, row_number() " +
          "OVER (PARTITION BY k ORDER BY CAST(num AS DOUBLE) / " +
          "CAST(den AS DOUBLE) ASC, j) AS rn FROM mx) WHERE rn = 1) " +
          "SELECT bins[f.k] AS bin, ns[f.k] AS n, ps[f.k] AS n_pos, " +
          "CAST(f.num AS BIGINT) AS iso_num, " +
          "CAST(f.den AS BIGINT) AS iso_den, " +
          "CAST(f.num AS DOUBLE) / CAST(f.den AS DOUBLE) AS iso_rate " +
          "FROM fitt f CROSS JOIN pf"),
      "q_rank_fusion" -> rankFusionSql,
      "q_rfm" -> {
        val cases = (for (g <- Seq("r", "f", "m"); p <- Seq(20, 40, 60, 80))
          yield s"max(CASE WHEN g = '$g' AND pct = $p THEN est END) " +
            s"AS b$g$p").mkString(", ")
        val sc = (x: String, g: String) => Seq(20, 40, 60, 80)
          .map(p => s"CAST($x > b$g$p AS INT)").mkString(" + ")
        "WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day, " +
          "value FROM events WHERE event_type = 'purchase'), " +
          "mx AS (SELECT max(day) AS mxd FROM e), " +
          "per AS (SELECT user_id, mxd - max(day) AS recency, " +
          "count(*) AS frequency, " +
          "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS monetary " +
          "FROM e, mx GROUP BY user_id, mxd), " +
          "qraw AS (SELECT 'r' AS g, CAST(recency AS DOUBLE) AS x " +
          "FROM per UNION ALL SELECT 'f' AS g, " +
          "CAST(frequency AS DOUBLE) AS x FROM per " +
          "UNION ALL SELECT 'm' AS g, monetary AS x FROM per), " +
          OracleSql.quantileSketchCtes(Seq(20, 40, 60, 80)) +
          s", b AS (SELECT $cases FROM qest) " +
          "SELECT user_id, recency, frequency, monetary, " +
          s"CAST(5 - (${sc("CAST(recency AS DOUBLE)", "r")}) AS BIGINT) " +
          "AS r_score, " +
          s"CAST(1 + (${sc("CAST(frequency AS DOUBLE)", "f")}) AS BIGINT) " +
          "AS f_score, " +
          s"CAST(1 + (${sc("monetary", "m")}) AS BIGINT) AS m_score " +
          "FROM per, b"
      },
      "q_markov_transitions" ->
        ("WITH e AS (SELECT event_type, lead(event_type) OVER (" +
          "PARTITION BY user_id ORDER BY ts, event_id) AS next_type " +
          "FROM events), " +
          "pr AS (SELECT event_type AS from_type, next_type AS to_type, " +
          "count(*) AS n FROM e WHERE next_type IS NOT NULL " +
          "GROUP BY 1, 2), " +
          "f AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from " +
          "FROM pr GROUP BY 1) " +
          "SELECT from_type, to_type, n, n_from, " +
          "CAST(n AS DOUBLE) / CAST(n_from AS DOUBLE) AS p " +
          "FROM pr JOIN f USING (from_type)"),
      "q_markov_stationary" -> {
        // 5 unrolled power-iteration CTEs, all BIGINT fixed-point in
        // units of 1/1e9 — replays the engine's (pi·n) // nf exactly.
        val iters = 5
        val steps = (1 to iters).map { i =>
          s"p$i AS (SELECT st.s, CAST(coalesce(sum((p.pi * ef.n) // " +
            "ef.nf), 0) AS BIGINT) AS pi FROM st " +
            "LEFT JOIN ef ON ef.t = st.s " +
            s"LEFT JOIN p${i - 1} p ON p.s = ef.f GROUP BY st.s)"
        }.mkString(", ")
        "WITH pr AS (SELECT event_type AS f, lead(event_type) OVER (" +
          "PARTITION BY user_id ORDER BY ts, event_id) AS t FROM events), " +
          "e AS (SELECT f, t, CAST(count(*) AS BIGINT) AS n FROM pr " +
          "WHERE t IS NOT NULL GROUP BY 1, 2), " +
          "ef AS (SELECT f, t, n, CAST(sum(n) OVER (PARTITION BY f) " +
          "AS BIGINT) AS nf FROM e), " +
          "st AS (SELECT f AS s FROM e UNION SELECT t FROM e), " +
          "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM st), " +
          "p0 AS (SELECT s, CAST(1000000000 // (SELECT n FROM nn) " +
          "AS BIGINT) AS pi FROM st), " +
          steps +
          s" SELECT s AS state, pi AS pi_q FROM p$iters"
      },
      "q_top_paths" ->
        ("WITH e AS (SELECT event_type AS n0, " +
          "lead(event_type, 1) OVER w AS n1, " +
          "lead(event_type, 2) OVER w AS n2 FROM events " +
          "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
          "p AS (SELECT n0 || '>' || n1 || '>' || n2 AS path, " +
          "count(*) AS n FROM e WHERE n1 IS NOT NULL AND n2 IS NOT NULL " +
          "GROUP BY 1), " +
          "r AS (SELECT path, n, CAST(row_number() OVER (" +
          "ORDER BY n DESC, path ASC) AS BIGINT) AS rank FROM p) " +
          "SELECT path, n, rank FROM r WHERE rank <= 20"),
      "q_profile" ->
        Seq("doc_id", "text", "lang", "source", "n_chars").map(c =>
          s"SELECT '$c' AS col_name, count(*) AS n_rows, " +
            s"count(*) - count($c) AS n_nulls, " +
            s"count(DISTINCT $c) AS n_distinct, " +
            s"CAST(min($c) AS VARCHAR) AS min_val, " +
            s"CAST(max($c) AS VARCHAR) AS max_val FROM documents")
          .mkString(" UNION ALL "),
      "q_range_join" ->
        ("WITH l AS (SELECT event_id AS l_id, epoch_us(ts) AS ls, " +
          "epoch_us(ts) + 1800000000 AS le FROM events " +
          "WHERE event_type = 'purchase' AND user_id % 50 = 0), " +
          "r AS (SELECT event_id AS r_id, epoch_us(ts) AS rs, " +
          "epoch_us(ts) + 300000000 AS re FROM events " +
          "WHERE event_type = 'error') " +
          "SELECT l_id, r_id, ls, rs FROM l JOIN r " +
          "ON l.ls <= r.re AND r.rs <= l.le"),
      "q_topk_agg" -> topkAggSql,
      "q_join_fanout" ->
        ("WITH ca AS (SELECT o_orderkey AS k, count(*) AS ca " +
          "FROM orders GROUP BY 1), " +
          "cb AS (SELECT l_orderkey AS k, count(*) AS cb " +
          "FROM lineitem GROUP BY 1), " +
          "g AS (SELECT CAST(ca AS HUGEINT) * CAST(cb AS HUGEINT) AS p " +
          "FROM ca JOIN cb USING (k)), " +
          "t AS (SELECT CAST(count(*) AS BIGINT) AS n_keys_both, " +
          "sum(p) AS est, max(p) AS mx FROM g), " +
          "nl AS (SELECT CAST(count(*) AS BIGINT) AS n_left FROM orders), " +
          "nr AS (SELECT CAST(count(*) AS BIGINT) AS n_right " +
          "FROM lineitem) " +
          "SELECT n_left, n_right, n_keys_both, " +
          "coalesce(CAST(est AS DOUBLE), 0.0) AS est_rows, " +
          "coalesce(CAST(mx AS BIGINT), 0) AS max_key_fanout " +
          "FROM t, nl, nr"),
      "q_pareto_coverage" ->
        ("WITH c AS (SELECT l_partkey, count(*) AS n FROM lineitem " +
          "GROUP BY 1), " +
          "t AS (SELECT CAST(count(*) AS BIGINT) AS tot FROM lineitem), " +
          "r AS (SELECT l_partkey, n, " +
          "CAST(row_number() OVER (ORDER BY n DESC, l_partkey ASC) " +
          "AS BIGINT) AS rank, " +
          "CAST(sum(n) OVER (ORDER BY n DESC, l_partkey ASC " +
          "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n FROM c) " +
          "SELECT rank, l_partkey, n, cum_n, " +
          "CAST(cum_n AS DOUBLE) / CAST(tot AS DOUBLE) AS cum_frac " +
          "FROM r, t WHERE rank <= 100"),
      "q_user_growth" ->
        ("WITH f AS (SELECT user_id, " +
          "min(epoch_us(ts) // 86400000000) AS day FROM events " +
          "GROUP BY 1), " +
          "d AS (SELECT day, count(*) AS n_new FROM f GROUP BY 1) " +
          "SELECT day, n_new, CAST(sum(n_new) OVER (ORDER BY day " +
          "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users FROM d"),
      "q_scd2" -> scd2Sql,
      "q_temporal_join" ->
        (s"WITH scd AS ($scd2Sql), " +
          "f AS (SELECT o_orderkey, o_custkey, " +
          "CAST(o_orderkey % 4000 AS BIGINT) AS ts FROM orders) " +
          "SELECT f.o_orderkey, f.o_custkey, f.ts, scd.c_mktsegment, " +
          "scd.c_acctbal, scd.valid_from_us " +
          "FROM f JOIN scd ON f.o_custkey = scd.c_custkey " +
          "AND f.ts >= scd.valid_from_us " +
          "AND (scd.valid_to_us IS NULL OR f.ts < scd.valid_to_us)"),
      // metadata-level expectation: the drift of the gate's fixed
      // projection is statically known, so the oracle states it
      "q_schema_diff" ->
        ("SELECT * FROM (VALUES " +
          "('o_orderpriority', 'removed', 'string', CAST(NULL AS VARCHAR)), " +
          "('o_totalprice', 'type_changed', 'double', 'string'), " +
          "('o_priority_rank', 'added', CAST(NULL AS VARCHAR), 'int')) " +
          "t(column_name, change_type, left_type, right_type)"),
      "q_lateness_profile" ->
        ("WITH p AS (SELECT lag(epoch_us(ts)) OVER (" +
          "PARTITION BY user_id ORDER BY event_id) - epoch_us(ts) " +
          "AS reg FROM events), " +
          "pp AS (SELECT reg FROM p WHERE reg IS NOT NULL), " +
          "t AS (SELECT count(*) AS n_pairs, " +
          "CAST(sum(CASE WHEN reg > 0 THEN 1 ELSE 0 END) AS BIGINT) " +
          "AS n_inversions FROM pp), " +
          "cm AS (SELECT reg, CAST(sum(count(*)) OVER (ORDER BY reg " +
          "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum " +
          "FROM pp WHERE reg > 0 GROUP BY reg), " +
          "pk AS (SELECT max(reg) AS max_regression, " +
          "min(CASE WHEN cum >= ceil(n_inversions * 0.99) THEN reg END) " +
          "AS p99_regression FROM cm, t) " +
          "SELECT n_pairs, n_inversions, " +
          "CAST(n_inversions AS DOUBLE) / CAST(n_pairs AS DOUBLE) " +
          "AS inversion_frac, " +
          "coalesce(max_regression, 0) AS max_regression, " +
          "coalesce(p99_regression, 0) AS p99_regression FROM t, pk"),
      "q_retention" ->
        ("WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events), " +
          "c AS (SELECT user_id, min(day) AS cohort_date FROM d GROUP BY user_id), " +
          "a AS (SELECT DISTINCT user_id, day FROM d), " +
          "s AS (SELECT cohort_date, count(*) AS n_cohort FROM c " +
          "GROUP BY cohort_date), " +
          "r AS (SELECT c.cohort_date, CAST(a.day - c.cohort_date AS BIGINT) " +
          "AS day_offset, count(*) AS n_active " +
          "FROM a JOIN c USING (user_id) GROUP BY 1, 2) " +
          "SELECT r.cohort_date, r.day_offset, r.n_active, s.n_cohort " +
          "FROM r JOIN s USING (cohort_date)"),
      "q_iqr_outliers" ->
        ("WITH b AS (SELECT event_type, quantile_cont(value, 0.25) AS q1, " +
          "quantile_cont(value, 0.75) AS q3 FROM events GROUP BY event_type), " +
          "bb AS (SELECT event_type, q1 - 1.5 * (q3 - q1) AS lo_bound, " +
          "q3 + 1.5 * (q3 - q1) AS hi_bound FROM b) " +
          "SELECT e.event_id, e.event_type, e.value, bb.lo_bound, " +
          "bb.hi_bound, (e.value < bb.lo_bound OR e.value > bb.hi_bound) " +
          "AS is_outlier FROM events e JOIN bb USING (event_type)"),
      "q_k_anonymity" ->
        ("SELECT c_nationkey, c_mktsegment, count(*) AS class_size " +
          "FROM customer GROUP BY c_nationkey, c_mktsegment " +
          "HAVING count(*) < 8"),
      "q_psi_drift" ->
        ("WITH a AS (SELECT o_orderpriority AS bk, count(*) AS n_a " +
          "FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1), " +
          "b AS (SELECT o_orderpriority AS bk, count(*) AS n_b " +
          "FROM orders WHERE o_orderkey % 2 = 1 " +
          "AND NOT (o_orderpriority = '1-URGENT' AND o_orderkey % 5 = 0) " +
          "GROUP BY 1), " +
          "g AS (SELECT coalesce(a.bk, b.bk) AS o_orderpriority, " +
          "CAST(coalesce(n_a, 0) AS BIGINT) AS n_a, " +
          "CAST(coalesce(n_b, 0) AS BIGINT) AS n_b " +
          "FROM a FULL JOIN b ON a.bk = b.bk), " +
          "t AS (SELECT CAST(sum(n_a) AS BIGINT) AS ta, " +
          "CAST(sum(n_b) AS BIGINT) AS tb, count(*) AS k FROM g) " +
          "SELECT o_orderpriority, n_a, n_b, " +
          "round((CAST(n_a + 1 AS DOUBLE) / (ta + k) - " +
          "CAST(n_b + 1 AS DOUBLE) / (tb + k)) * " +
          "ln((CAST(n_a + 1 AS DOUBLE) / (ta + k)) / " +
          "(CAST(n_b + 1 AS DOUBLE) / (tb + k))), 8) AS psi_term " +
          "FROM g CROSS JOIN t"),
      "q_l_diversity" ->
        ("SELECT event_type, ((user_id % 200) + 200) % 200 AS uid_bucket, " +
          "count(*) AS class_size, " +
          "count(DISTINCT CAST(floor(value) AS BIGINT)) " +
          "AS n_distinct_sensitive FROM events " +
          "GROUP BY 1, 2 " +
          "HAVING count(DISTINCT CAST(floor(value) AS BIGINT)) < 10"),
      "q_mode" ->
        ("SELECT event_type, v AS mode_v, n_occurrences FROM (" +
          "SELECT event_type, v, n_occurrences, row_number() OVER (" +
          "PARTITION BY event_type " +
          "ORDER BY n_occurrences DESC, v ASC) AS rn FROM (" +
          "SELECT event_type, CAST(floor(value / 10.0) AS BIGINT) AS v, " +
          "count(*) AS n_occurrences FROM events GROUP BY 1, 2)) " +
          "WHERE rn = 1"),
      "q_unpivot" -> {
        val ids = "l_orderkey, l_linenumber"
        val ms = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        ms.map(m => s"SELECT $ids, '$m' AS measure, $m AS m_value " +
            "FROM lineitem WHERE l_orderkey % 97 = 0")
          .mkString(" UNION ALL ")
      },
      "q_interval_merge" ->
        // Running-max island merge; identical (s, e, id) total order in
        // every window, durations value-scaled exactly as the engine.
        ("WITH iv AS (SELECT user_id, epoch_us(ts) AS s, " +
          "epoch_us(ts) + (CASE WHEN value IS NULL OR isnan(value) THEN 1 " +
          "ELSE greatest(1, CAST(floor(value * 3600.0) AS BIGINT)) END) " +
          "* 1000000 AS e, event_id AS id FROM events), " +
          "w AS (SELECT user_id, s, e, id, max(e) OVER " +
          "(PARTITION BY user_id ORDER BY s, e, id " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm FROM iv), " +
          "f AS (SELECT user_id, s, e, id, " +
          "CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS nf FROM w), " +
          "g AS (SELECT user_id, s, e, CAST(sum(nf) OVER " +
          "(PARTITION BY user_id ORDER BY s, e, id " +
          "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island FROM f) " +
          "SELECT user_id, island, min(s) AS island_start, " +
          "max(e) AS island_end, CAST(count(*) AS BIGINT) AS n_intervals, " +
          "max(e) - min(s) AS span_us FROM g GROUP BY user_id, island"),
      "q_interval_coverage" ->
        ("WITH iv AS (SELECT user_id, epoch_us(ts) AS s, " +
          "epoch_us(ts) + (CASE WHEN value IS NULL OR isnan(value) THEN 1 " +
          "ELSE greatest(1, CAST(floor(value * 3600.0) AS BIGINT)) END) " +
          "* 1000000 AS e, event_id AS id FROM events), " +
          "w AS (SELECT user_id, s, e, id, max(e) OVER " +
          "(PARTITION BY user_id ORDER BY s, e, id " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm FROM iv), " +
          "f AS (SELECT user_id, s, e, id, " +
          "CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS nf FROM w), " +
          "g AS (SELECT user_id, s, e, CAST(sum(nf) OVER " +
          "(PARTITION BY user_id ORDER BY s, e, id " +
          "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island FROM f), " +
          "m AS (SELECT user_id, island, min(s) AS st, max(e) AS en, " +
          "count(*) AS ni FROM g GROUP BY 1, 2) " +
          "SELECT user_id, CAST(sum(ni) AS BIGINT) AS n_intervals, " +
          "CAST(count(*) AS BIGINT) AS n_islands, " +
          "CAST(sum(en - st) AS BIGINT) AS covered_us, " +
          "CAST(max(en - st) AS BIGINT) AS max_island_us " +
          "FROM m GROUP BY user_id"),
      "q_interval_gaps" ->
        // Island replay (as q_interval_coverage), then lag between
        // consecutive islands — merged islands never touch, so every
        // step is a real gap.
        ("WITH iv AS (SELECT user_id, epoch_us(ts) AS s, " +
          "epoch_us(ts) + (CASE WHEN value IS NULL OR isnan(value) THEN 1 " +
          "ELSE greatest(1, CAST(floor(value * 3600.0) AS BIGINT)) END) " +
          "* 1000000 AS e, event_id AS id FROM events), " +
          "w AS (SELECT user_id, s, e, id, max(e) OVER " +
          "(PARTITION BY user_id ORDER BY s, e, id " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm FROM iv), " +
          "f AS (SELECT user_id, s, e, id, " +
          "CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS nf FROM w), " +
          "g AS (SELECT user_id, s, e, CAST(sum(nf) OVER " +
          "(PARTITION BY user_id ORDER BY s, e, id " +
          "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island FROM f), " +
          "m AS (SELECT user_id, island, min(s) AS st, max(e) AS en " +
          "FROM g GROUP BY 1, 2), " +
          "lg AS (SELECT user_id, st, " +
          "lag(en) OVER (PARTITION BY user_id ORDER BY st) AS pe FROM m) " +
          "SELECT user_id, pe AS gap_start, st AS gap_end, " +
          "st - pe AS gap_us FROM lg WHERE pe IS NOT NULL"),
      "q_lorenz" ->
        ("WITH u AS (SELECT event_type, user_id, " +
          "CAST(sum(CAST(floor(value * 1024.0) AS BIGINT)) AS BIGINT) AS x " +
          "FROM events WHERE value IS NOT NULL GROUP BY 1, 2), " +
          "b AS (SELECT event_type, " +
          "CAST(ntile(10) OVER (PARTITION BY event_type " +
          "ORDER BY x ASC, user_id ASC) AS BIGINT) AS bucket, x FROM u), " +
          "g AS (SELECT event_type, bucket, " +
          "CAST(count(*) AS BIGINT) AS n_units, " +
          "CAST(sum(x) AS BIGINT) AS bucket_sum FROM b GROUP BY 1, 2), " +
          "c AS (SELECT event_type, bucket, n_units, bucket_sum, " +
          "CAST(sum(bucket_sum) OVER (PARTITION BY event_type) " +
          "AS BIGINT) AS t, " +
          "CAST(sum(bucket_sum) OVER (PARTITION BY event_type " +
          "ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cx " +
          "FROM g) " +
          "SELECT event_type, bucket, n_units, bucket_sum, " +
          "CASE WHEN t = 0 THEN NULL ELSE " +
          "CAST(bucket_sum AS DOUBLE) / CAST(t AS DOUBLE) END AS share, " +
          "CASE WHEN t = 0 THEN NULL ELSE " +
          "CAST(cx AS DOUBLE) / CAST(t AS DOUBLE) END AS cum_share FROM c"),
      "q_peak_concurrency" ->
        ("WITH iv AS (SELECT event_type, epoch_us(ts) AS s, " +
          "epoch_us(ts) + (CASE WHEN value IS NULL OR isnan(value) THEN 1 " +
          "ELSE greatest(1, CAST(floor(value * 3600.0) AS BIGINT)) END) " +
          "* 1000000 AS e FROM events), " +
          "ne AS (SELECT * FROM iv WHERE e > s), " +
          "b AS (SELECT event_type, s AS t, 1 AS d FROM ne " +
          "UNION ALL SELECT event_type, e AS t, -1 AS d FROM ne), " +
          "g AS (SELECT event_type, t, CAST(sum(d) AS BIGINT) AS dd, " +
          "CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) " +
          "AS opens FROM b GROUP BY 1, 2), " +
          "r AS (SELECT event_type, t, dd, opens, " +
          "CAST(sum(dd) OVER (PARTITION BY event_type ORDER BY t " +
          "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c FROM g), " +
          "p AS (SELECT event_type, t, opens, c, " +
          "max(c) OVER (PARTITION BY event_type) AS pk FROM r) " +
          "SELECT event_type, CAST(sum(opens) AS BIGINT) AS n_intervals, " +
          "CAST(max(c) AS BIGINT) AS peak, " +
          "CAST(min(CASE WHEN c = pk THEN t END) AS BIGINT) AS peak_at_us " +
          "FROM p GROUP BY event_type"),
      "q_survival_km" ->
        // KM product as exp(Σ pinned-ln); the prefix sum is a STRICT
        // list fold in duration order (never a float window sum — the
        // engine's running frame is sequential, so both engines add in
        // identical order); all-die duration → survival 0 exactly.
        ("WITH s AS (SELECT user_id, min(epoch_us(ts)) AS fts, " +
          "max(epoch_us(ts)) AS lts FROM events GROUP BY user_id), " +
          "mx AS (SELECT max(epoch_us(ts)) AS m FROM events), " +
          "subj AS (SELECT (lts - fts) // 86400000000 AS duration, " +
          "CASE WHEN lts <= m - 604800000000 THEN 1 ELSE 0 END AS e " +
          "FROM s, mx), " +
          "g AS (SELECT duration, CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(e) AS BIGINT) AS n_events FROM subj GROUP BY 1), " +
          "w AS (SELECT duration, n, n_events, " +
          "CAST(sum(n) OVER () - coalesce(sum(n) OVER (ORDER BY duration " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) " +
          "AS BIGINT) AS n_at_risk FROM g), " +
          "t AS (SELECT *, CASE WHEN n_events = n_at_risk THEN NULL " +
          "ELSE round(ln(1.0 - CAST(n_events AS DOUBLE) / " +
          "CAST(n_at_risk AS DOUBLE)), 8) END AS term FROM w), " +
          "l AS (SELECT list(struct_pack(d := duration, t := term) " +
          "ORDER BY duration) AS ts FROM t) " +
          "SELECT t.duration, t.n_at_risk, t.n_events, " +
          "t.n - t.n_events AS n_censored, " +
          "CASE WHEN t.term IS NULL THEN 0.0 ELSE " +
          "round(exp(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
          "list_transform(list_filter(l.ts, x -> x.d <= t.duration), " +
          "x -> x.t)), (a, b) -> a + b)), 8) END AS survival " +
          "FROM t, l"),
      "q_split_balance" -> {
        val e = "(CAST(x.rt * x.ct AS DOUBLE) / nn.n)"
        val d = s"(CAST(x.o AS DOUBLE) - $e)"
        val a0 = TextHash.permuteA(0); val b0 = TextHash.permuteB(0)
        val p = TextHash.P
        val bkt = s"((((doc_id * $a0 + $b0) % $p) % 100) + 100) % 100"
        s"WITH base AS (SELECT CASE WHEN $bkt < 80 THEN 'train' " +
          s"WHEN $bkt < 90 THEN 'val' ELSE 'test' END AS a, " +
          "lang AS b FROM documents), " +
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
      "q_psm_att" ->
        // The oracle affords the direct |x_t − x_c| ≤ caliper join (the
        // engine's bucket join finds the identical candidate set).
        ("WITH u AS (SELECT user_id AS id, " +
          "CAST(count(*) AS BIGINT) AS x, " +
          "CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN 1 " +
          "ELSE 0 END), 0) AS BIGINT) AS nc, " +
          "CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN " +
          "CAST(floor(value * 100.0) AS BIGINT) ELSE 0 END), 0) " +
          "AS BIGINT) AS y FROM events GROUP BY user_id), " +
          "tr AS (SELECT * FROM u WHERE nc >= 3), " +
          "co AS (SELECT * FROM u WHERE nc < 3), " +
          "pairs AS (SELECT tr.id, tr.y AS yt, co.id AS cid, " +
          "co.y AS yc, abs(tr.x - co.x) AS dist FROM tr JOIN co " +
          "ON abs(tr.x - co.x) <= 2), " +
          "best AS (SELECT id, yt, yc FROM (SELECT *, row_number() " +
          "OVER (PARTITION BY id ORDER BY dist, cid) AS rn FROM pairs) " +
          "WHERE rn = 1), " +
          "agg AS (SELECT CAST(count(*) AS BIGINT) AS n_matched, " +
          "CAST(coalesce(sum(yt), 0) AS BIGINT) AS syt, " +
          "CAST(coalesce(sum(yc), 0) AS BIGINT) AS syc FROM best), " +
          "nt AS (SELECT CAST(count(*) AS BIGINT) AS n_treated FROM tr) " +
          "SELECT n_treated, n_matched, syt - syc AS sum_dy, " +
          "CASE WHEN n_matched > 0 THEN CAST(syt - syc AS DOUBLE) / " +
          "CAST(n_matched AS DOUBLE) END AS att, " +
          "CASE WHEN n_matched > 0 THEN CAST(syt AS DOUBLE) / " +
          "CAST(n_matched AS DOUBLE) END AS mean_y_treated, " +
          "CASE WHEN n_matched > 0 THEN CAST(syc AS DOUBLE) / " +
          "CAST(n_matched AS DOUBLE) END AS mean_y_control " +
          "FROM agg CROSS JOIN nt"),
      "q_rdd" -> {
        def fit(s: String) = {
          val den = s"CAST(CAST(n_$s AS HUGEINT) * sxx_$s - " +
            s"CAST(sx_$s AS HUGEINT) * sx_$s AS DOUBLE)"
          val num = s"CAST(CAST(n_$s AS HUGEINT) * sxy_$s - " +
            s"CAST(sx_$s AS HUGEINT) * sy_$s AS DOUBLE)"
          val b = s"(($num) / ($den))"
          val a = s"(CAST(sy_$s AS DOUBLE) / CAST(n_$s AS DOUBLE) - " +
            s"$b * (CAST(sx_$s AS DOUBLE) / CAST(n_$s AS DOUBLE)))"
          (den, b, s"($a + $b * 5000.0)")
        }
        val (denl, bl, predl) = fit("l")
        val (denr, br, predr) = fit("r")
        def okOf(s: String, den: String) = s"(n_$s >= 2 AND $den <> 0.0)"
        val okL = okOf("l", denl); val okR = okOf("r", denr)
        "WITH b AS (SELECT CAST(floor(value * 100.0) AS BIGINT) AS x, " +
          "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y " +
          "FROM events WHERE value IS NOT NULL " +
          "AND CAST(floor(value * 100.0) AS BIGINT) >= 3000 " +
          "AND CAST(floor(value * 100.0) AS BIGINT) < 7000), " +
          "s2 AS (SELECT CASE WHEN x >= 5000 THEN 1 ELSE 0 END AS r, " +
          "x, y FROM b), " +
          "m AS (SELECT " +
          Seq("l" -> 0, "r" -> 1).map { case (s, r) =>
            s"CAST(coalesce(sum(CASE WHEN r = $r THEN 1 ELSE 0 END), 0) " +
              s"AS BIGINT) AS n_$s, " +
              s"CAST(coalesce(sum(CASE WHEN r = $r THEN x ELSE 0 END), 0) " +
              s"AS BIGINT) AS sx_$s, " +
              s"CAST(coalesce(sum(CASE WHEN r = $r THEN y ELSE 0 END), 0) " +
              s"AS BIGINT) AS sy_$s, " +
              s"coalesce(sum(CASE WHEN r = $r THEN CAST(x AS HUGEINT) * x " +
              s"ELSE 0 END), 0) AS sxx_$s, " +
              s"coalesce(sum(CASE WHEN r = $r THEN CAST(x AS HUGEINT) * y " +
              s"ELSE 0 END), 0) AS sxy_$s"
          }.mkString(", ") +
          " FROM s2) " +
          "SELECT n_l, n_r, " +
          s"CASE WHEN $okL THEN $bl END AS slope_l, " +
          s"CASE WHEN $okR THEN $br END AS slope_r, " +
          s"CASE WHEN $okL THEN $predl END AS pred_l, " +
          s"CASE WHEN $okR THEN $predr END AS pred_r, " +
          s"CASE WHEN $okL AND $okR THEN ($predr) - ($predl) END " +
          "AS rdd_effect FROM m"
      },
      "q_median_polish" -> {
        val med = "list_sort(list(r))[CAST((count(r) + 1) // 2 AS INT)]"
        "WITH base AS (SELECT event_type AS a, " +
          "(epoch_us(ts) // 86400000000) % 7 AS b, " +
          "coalesce(CAST(floor(value * 100.0) AS BIGINT), 0) AS qv " +
          "FROM events), " +
          "g0 AS (SELECT a, b, CAST(sum(qv) AS BIGINT) AS cell, " +
          "CAST(sum(qv) AS BIGINT) AS r FROM base GROUP BY a, b), " +
          s"rm1 AS (SELECT a, $med AS m FROM g0 GROUP BY a), " +
          "g1 AS (SELECT g0.a, g0.b, cell, r - m AS r, m AS ae " +
          "FROM g0 JOIN rm1 USING (a)), " +
          s"cm1 AS (SELECT b, $med AS m FROM g1 GROUP BY b), " +
          "g2 AS (SELECT a, g1.b, cell, r - m AS r, ae, m AS be " +
          "FROM g1 JOIN cm1 USING (b)), " +
          s"rm2 AS (SELECT a, $med AS m FROM g2 GROUP BY a), " +
          "g3 AS (SELECT g2.a, b, cell, r - m AS r, ae + m AS ae, be " +
          "FROM g2 JOIN rm2 USING (a)), " +
          s"cm2 AS (SELECT b, $med AS m FROM g3 GROUP BY b), " +
          "g4 AS (SELECT a, g3.b, cell, r - m AS r, ae, be + m AS be " +
          "FROM g3 JOIN cm2 USING (b)) " +
          "SELECT a AS event_type, b AS dow, cell, r AS resid, " +
          "ae AS row_eff, be AS col_eff FROM g4"
      },
      "q_spearman" ->
        // Doubled average ranks 2L+c+1 per bin; exact BIGINT moments;
        // HUGEINT combination (Spark: DECIMAL(38,0)); one float + round 8.
        ("WITH per AS (SELECT user_id, " +
          "CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) " +
          "AS BIGINT) AS x, " +
          "CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN " +
          "CAST(floor(value * 16.0) AS BIGINT) END), 0) AS BIGINT) AS y " +
          "FROM events GROUP BY user_id), " +
          "gx AS (SELECT x, CAST(count(*) AS BIGINT) AS c FROM per " +
          "GROUP BY x), " +
          "rx AS (SELECT x, 2 * coalesce(sum(c) OVER (ORDER BY x " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1 " +
          "AS r2x FROM gx), " +
          "gy AS (SELECT y, CAST(count(*) AS BIGINT) AS c FROM per " +
          "GROUP BY y), " +
          "ry AS (SELECT y, 2 * coalesce(sum(c) OVER (ORDER BY y " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1 " +
          "AS r2y FROM gy), " +
          "j AS (SELECT rx.r2x, ry.r2y FROM per " +
          "JOIN rx ON per.x = rx.x JOIN ry ON per.y = ry.y), " +
          "m AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(r2x) AS BIGINT) AS sx, CAST(sum(r2y) AS BIGINT) AS sy, " +
          "CAST(sum(r2x * r2x) AS BIGINT) AS sxx, " +
          "CAST(sum(r2y * r2y) AS BIGINT) AS syy, " +
          "CAST(sum(r2x * r2y) AS BIGINT) AS sxy FROM j), " +
          "k AS (SELECT n, " +
          "CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num, " +
          "CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS dx, " +
          "CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS dy " +
          "FROM m) " +
          "SELECT n AS n_rows, CASE WHEN n < 2 OR dx <= 0 OR dy <= 0 " +
          "THEN NULL ELSE round(CAST(num AS DOUBLE) / " +
          "(sqrt(CAST(dx AS DOUBLE)) * sqrt(CAST(dy AS DOUBLE))), 8) " +
          "END AS rho FROM k"),
      "q_kendall_tau" ->
        // Concordance from the bounded cell grid; every count BIGINT;
        // tie terms kept doubled (n(n-1), t(t-1)) so nothing halves.
        ("WITH b AS (SELECT CAST(floor(value * 16.0) AS BIGINT) AS x, " +
          "(epoch_us(ts) // 86400000000) % 7 AS y FROM events " +
          "WHERE value IS NOT NULL AND ts IS NOT NULL), " +
          "cells AS (SELECT x, y, CAST(count(*) AS BIGINT) AS o FROM b " +
          "GROUP BY 1, 2), " +
          "p AS (SELECT CAST(coalesce(sum(CASE WHEN i.y < j.y " +
          "THEN i.o * j.o ELSE 0 END), 0) AS BIGINT) AS nc, " +
          "CAST(coalesce(sum(CASE WHEN i.y > j.y THEN i.o * j.o " +
          "ELSE 0 END), 0) AS BIGINT) AS nd " +
          "FROM cells i JOIN cells j ON i.x < j.x), " +
          "xt AS (SELECT CAST(coalesce(sum(t * (t - 1)), 0) AS BIGINT) " +
          "AS tx2, CAST(coalesce(sum(t), 0) AS BIGINT) AS n FROM " +
          "(SELECT CAST(sum(o) AS BIGINT) AS t FROM cells GROUP BY x)), " +
          "yt AS (SELECT CAST(coalesce(sum(t * (t - 1)), 0) AS BIGINT) " +
          "AS ty2 FROM " +
          "(SELECT CAST(sum(o) AS BIGINT) AS t FROM cells GROUP BY y)) " +
          "SELECT n AS n_rows, nc, nd, " +
          "CASE WHEN n * (n - 1) - tx2 <= 0 OR n * (n - 1) - ty2 <= 0 " +
          "THEN NULL ELSE 2.0 * CAST(nc - nd AS DOUBLE) / " +
          "(sqrt(CAST(n * (n - 1) - tx2 AS DOUBLE)) * " +
          "sqrt(CAST(n * (n - 1) - ty2 AS DOUBLE))) END AS tau_b " +
          "FROM p, xt, yt"),
      "q_welch_ttest" ->
        // Exact quantized moments; n·Σq²−S² through HUGEINT (Spark:
        // DECIMAL(38,0)); fixed-shape t and Welch–Satterthwaite dof.
        ("WITH b AS (SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 " +
          "END AS a, CAST(floor(value * 1024.0) AS BIGINT) AS q " +
          "FROM events WHERE event_type IN ('click', 'view') " +
          "AND value IS NOT NULL), " +
          "m AS (SELECT CAST(coalesce(sum(a), 0) AS BIGINT) AS na, " +
          "CAST(coalesce(sum(1 - a), 0) AS BIGINT) AS nb, " +
          "CAST(coalesce(sum(CASE WHEN a = 1 THEN q END), 0) AS BIGINT) " +
          "AS sa, " +
          "CAST(coalesce(sum(CASE WHEN a = 0 THEN q END), 0) AS BIGINT) " +
          "AS sb, " +
          "CAST(coalesce(sum(CASE WHEN a = 1 THEN q * q END), 0) " +
          "AS BIGINT) AS qa, " +
          "CAST(coalesce(sum(CASE WHEN a = 0 THEN q * q END), 0) " +
          "AS BIGINT) AS qb FROM b), " +
          "v AS (SELECT na, nb, sa, sb, " +
          "CAST(CAST(na AS HUGEINT) * qa - CAST(sa AS HUGEINT) * sa " +
          "AS DOUBLE) / (CAST(na * (na - 1) AS DOUBLE) * 1048576.0) AS va, " +
          "CAST(CAST(nb AS HUGEINT) * qb - CAST(sb AS HUGEINT) * sb " +
          "AS DOUBLE) / (CAST(nb * (nb - 1) AS DOUBLE) * 1048576.0) AS vb " +
          "FROM m), " +
          "w AS (SELECT na, nb, sa, sb, " +
          "va / CAST(na AS DOUBLE) AS sea, vb / CAST(nb AS DOUBLE) AS seb " +
          "FROM v) " +
          "SELECT na AS n_a, nb AS n_b, " +
          "CASE WHEN na = 0 THEN NULL ELSE " +
          "CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) / 1024.0 END AS mean_a, " +
          "CASE WHEN nb = 0 THEN NULL ELSE " +
          "CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) / 1024.0 END AS mean_b, " +
          "CASE WHEN na < 2 OR nb < 2 OR sea + seb <= 0.0 THEN NULL ELSE " +
          "(CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) / 1024.0 - " +
          "CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) / 1024.0) / " +
          "sqrt(sea + seb) END AS t, " +
          "CASE WHEN na < 2 OR nb < 2 OR sea + seb <= 0.0 THEN NULL ELSE " +
          "(sea + seb) * (sea + seb) / " +
          "(sea * sea / CAST(na - 1 AS DOUBLE) + " +
          "seb * seb / CAST(nb - 1 AS DOUBLE)) END AS dof FROM w"),
      "q_tost" ->
        // Same quantized-moment pipeline as q_welch_ttest; two one-sided
        // z's against the shared z₀.₉₅ literal.
        ("WITH b AS (SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 " +
          "END AS a, CAST(floor(value * 1024.0) AS BIGINT) AS q " +
          "FROM events WHERE event_type IN ('click', 'view') " +
          "AND value IS NOT NULL), " +
          "m AS (SELECT CAST(coalesce(sum(a), 0) AS BIGINT) AS na, " +
          "CAST(coalesce(sum(1 - a), 0) AS BIGINT) AS nb, " +
          "CAST(coalesce(sum(CASE WHEN a = 1 THEN q END), 0) AS BIGINT) " +
          "AS sa, " +
          "CAST(coalesce(sum(CASE WHEN a = 0 THEN q END), 0) AS BIGINT) " +
          "AS sb, " +
          "CAST(coalesce(sum(CASE WHEN a = 1 THEN q * q END), 0) " +
          "AS BIGINT) AS qa, " +
          "CAST(coalesce(sum(CASE WHEN a = 0 THEN q * q END), 0) " +
          "AS BIGINT) AS qb FROM b), " +
          "v AS (SELECT na, nb, sa, sb, " +
          "CAST(CAST(na AS HUGEINT) * qa - CAST(sa AS HUGEINT) * sa " +
          "AS DOUBLE) / (CAST(na * (na - 1) AS DOUBLE) * 1048576.0) " +
          "/ CAST(na AS DOUBLE) AS sea, " +
          "CAST(CAST(nb AS HUGEINT) * qb - CAST(sb AS HUGEINT) * sb " +
          "AS DOUBLE) / (CAST(nb * (nb - 1) AS DOUBLE) * 1048576.0) " +
          "/ CAST(nb AS DOUBLE) AS seb FROM m), " +
          "w AS (SELECT na, nb, " +
          "CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) / 1024.0 - " +
          "CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) / 1024.0 AS df, " +
          "sqrt(sea + seb) AS se, " +
          "(na < 2 OR nb < 2 OR sea + seb <= 0.0) AS bad FROM v) " +
          "SELECT na AS n_a, nb AS n_b, " +
          "CASE WHEN bad THEN NULL ELSE df END AS diff, " +
          "CASE WHEN bad THEN NULL ELSE se END AS se, " +
          "CASE WHEN bad THEN NULL ELSE (df + 5.0) / se END AS t_lower, " +
          "CASE WHEN bad THEN NULL ELSE (df - 5.0) / se END AS t_upper, " +
          "CASE WHEN bad THEN false ELSE " +
          "(df + 5.0) / se > 1.6448536269514722 AND " +
          "(df - 5.0) / se < -1.6448536269514722 END AS equivalent " +
          "FROM w"),
      "q_mutual_info" -> {
        // p and the log argument repeated inline (DuckDB lambdas have no
        // let-binding); identical float shape to the engine's fold.
        val p = "(CAST(x.o AS DOUBLE) / CAST(n AS DOUBLE))"
        val lg = "ln(CAST(n * x.o AS DOUBLE) / CAST(x.rt * x.ct AS DOUBLE))"
        "WITH base AS (SELECT event_type AS a, " +
          "(epoch_us(ts) // 86400000000) % 7 AS b FROM events), " +
          "cc AS (SELECT a, b, count(*) AS o FROM base GROUP BY a, b), " +
          "ra AS (SELECT a, CAST(sum(o) AS BIGINT) AS rt FROM cc GROUP BY a), " +
          "cb AS (SELECT b, CAST(sum(o) AS BIGINT) AS ct FROM cc GROUP BY b), " +
          "ann AS (SELECT cc.a, cc.b, ra.rt, cb.ct, cc.o " +
          "FROM cc JOIN ra USING (a) JOIN cb USING (b)), " +
          "lst AS (SELECT list(struct_pack(rt := rt, ct := ct, o := o) " +
          "ORDER BY a, b) AS cs, " +
          "CAST(count(DISTINCT a) AS BIGINT) AS r, " +
          "CAST(count(DISTINCT b) AS BIGINT) AS c2, " +
          "CAST(sum(o) AS BIGINT) AS n FROM ann) " +
          "SELECT n AS n_rows, r, c2 AS c, " +
          "round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
          s"list_transform(cs, x -> $p * $lg)), " +
          "(p, x) -> p + x), 8) AS mi FROM lst"
      },
      "q_power_mde" -> {
        val zs = (1.959963984540054 + 0.8416212335729143).toString
        val vr = "CAST(CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s " +
          "AS DOUBLE) / (CAST(n * (n - 1) AS DOUBLE) * 10000.0)"
        val mean = "CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0"
        val mde = s"$zs * sqrt(2.0 * ($vr) / CAST(n_arm AS DOUBLE))"
        "WITH ev AS (SELECT user_id, " +
          "coalesce(CAST(floor(value * 100.0) AS BIGINT), 0) AS c " +
          "FROM events), " +
          "u AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS y FROM ev " +
          "GROUP BY 1), " +
          "m AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(y) AS BIGINT) AS s, " +
          "sum(CAST(y AS HUGEINT) * y) AS q FROM u), " +
          "m2 AS (SELECT n, s, q, n // 2 AS n_arm FROM m) " +
          "SELECT n AS n_units, CAST(n_arm AS BIGINT) AS n_per_arm, " +
          s"CASE WHEN n = 0 THEN NULL ELSE $mean END AS mean_y, " +
          s"CASE WHEN n < 2 THEN NULL ELSE $vr END AS var_y, " +
          s"CASE WHEN n_arm < 2 THEN NULL ELSE $mde END AS mde_abs, " +
          s"CASE WHEN n_arm < 2 OR s = 0 THEN NULL ELSE ($mde) / " +
          s"($mean) END AS mde_rel FROM m2"
      },
      "q_ks_test" ->
        ("WITH b AS (SELECT CASE WHEN event_type = 'click' THEN 1 " +
          "ELSE 0 END AS a, CAST(floor(value * 16.0) AS BIGINT) AS q " +
          "FROM events WHERE event_type IN ('click', 'view') " +
          "AND value IS NOT NULL), " +
          "g AS (SELECT q, CAST(sum(a) AS BIGINT) AS ca, " +
          "CAST(count(*) - sum(a) AS BIGINT) AS cb FROM b GROUP BY q), " +
          "c AS (SELECT q, CAST(sum(ca) OVER (ORDER BY q " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
          "AS BIGINT) AS fa, CAST(sum(cb) OVER (ORDER BY q " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
          "AS BIGINT) AS fb FROM g), " +
          "t AS (SELECT CAST(coalesce(sum(ca), 0) AS BIGINT) AS n_a, " +
          "CAST(coalesce(sum(cb), 0) AS BIGINT) AS n_b FROM g), " +
          "s AS (SELECT q, abs(fa * t.n_b - fb * t.n_a) AS d, " +
          "t.n_a, t.n_b FROM c CROSS JOIN t) " +
          "SELECT n_a, n_b, d AS ks_num, q AS at_bin, " +
          "CASE WHEN n_a = 0 OR n_b = 0 THEN NULL ELSE " +
          "CAST(d AS DOUBLE) / (CAST(n_a AS DOUBLE) * " +
          "CAST(n_b AS DOUBLE)) END AS ks FROM (" +
          "SELECT *, row_number() OVER (ORDER BY d DESC, q ASC) AS rn " +
          "FROM s) WHERE rn = 1"),
      "q_winsorize" ->
        ("WITH b AS (SELECT event_type, quantile_cont(value, 0.05) AS clip_lo, " +
          "quantile_cont(value, 0.95) AS clip_hi FROM events GROUP BY event_type) " +
          "SELECT e.event_id, e.event_type, e.value, b.clip_lo, b.clip_hi, " +
          "CASE WHEN e.value < b.clip_lo THEN b.clip_lo " +
          "WHEN e.value > b.clip_hi THEN b.clip_hi ELSE e.value END " +
          "AS winsorized FROM events e JOIN b USING (event_type)"),
      "q_quantile_norm" ->
        ("SELECT event_id, event_type, value, CASE WHEN n = 1 THEN NULL " +
          "ELSE CAST(rn - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE) END AS qn " +
          "FROM (SELECT event_id, event_type, value, " +
          "row_number() OVER (PARTITION BY event_type " +
          "ORDER BY value ASC, event_id ASC) AS rn, " +
          "count(*) OVER (PARTITION BY event_type) AS n FROM events " +
          "WHERE value IS NOT NULL)"),
      "q_moving_corr" ->
        ("WITH h AS (SELECT event_type, " +
          "epoch_us(ts) // 3600000000 AS hr, " +
          "CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS hx " +
          "FROM events GROUP BY 1, 2), " +
          "hn AS (SELECT * FROM h WHERE hx IS NOT NULL), " +
          "g AS (SELECT hr, CAST(sum(hx) AS BIGINT) AS gx " +
          "FROM hn GROUP BY 1), " +
          "j AS (SELECT hn.event_type, hn.hr, hn.hx, g.gx " +
          "FROM hn JOIN g USING (hr)), " +
          "w AS (SELECT event_type, hr, " +
          "CAST(count(*) OVER fr AS BIGINT) AS n, " +
          "CAST(sum(hx) OVER fr AS BIGINT) AS sx, " +
          "CAST(sum(gx) OVER fr AS BIGINT) AS sy, " +
          "CAST(sum(hx * gx) OVER fr AS BIGINT) AS sxy, " +
          "CAST(sum(hx * hx) OVER fr AS BIGINT) AS sxx, " +
          "CAST(sum(gx * gx) OVER fr AS BIGINT) AS syy FROM j " +
          "WINDOW fr AS (PARTITION BY event_type ORDER BY hr " +
          "ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)) " +
          "SELECT event_type, hr, n AS n_window, " +
          "CASE WHEN n < 24 OR n * sxx - sx * sx <= 0 " +
          "OR n * syy - sy * sy <= 0 THEN NULL ELSE " +
          "CAST(n * sxy - sx * sy AS DOUBLE) / " +
          "(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * " +
          "sqrt(CAST(n * syy - sy * sy AS DOUBLE))) END AS corr FROM w"),
      "q_jaccard_sets" ->
        ("WITH ud AS (SELECT DISTINCT event_type AS et, user_id " +
          "FROM events), " +
          "s AS (SELECT et, CAST(count(*) AS BIGINT) AS n " +
          "FROM ud GROUP BY 1), " +
          "c AS (SELECT a.et AS type_a, b.et AS type_b, " +
          "CAST(count(*) AS BIGINT) AS n_common " +
          "FROM ud a JOIN ud b USING (user_id) WHERE a.et < b.et " +
          "GROUP BY 1, 2) " +
          "SELECT c.type_a, c.type_b, sa.n AS n_a, sb.n AS n_b, " +
          "c.n_common, CAST(c.n_common AS DOUBLE) / " +
          "CAST(sa.n + sb.n - c.n_common AS DOUBLE) AS jaccard " +
          "FROM c JOIN s sa ON c.type_a = sa.et " +
          "JOIN s sb ON c.type_b = sb.et"),
      "q_rolling_active" ->
        ("WITH ud AS (SELECT DISTINCT epoch_us(ts) // 86400000000 " +
          "AS day, user_id FROM events), " +
          "e AS (SELECT day + t.range AS rday, user_id " +
          "FROM ud, range(7) t), " +
          "d AS (SELECT DISTINCT day AS rday FROM ud) " +
          "SELECT e.rday, CAST(count(DISTINCT e.user_id) AS BIGINT) " +
          "AS wau FROM e JOIN d USING (rday) GROUP BY 1"),
      "q_theil_index" ->
        ("WITH u AS (SELECT event_type, user_id, " +
          "CAST(sum(CAST(floor(value * 1024.0) AS BIGINT)) AS BIGINT) AS x " +
          "FROM events WHERE value IS NOT NULL GROUP BY 1, 2), " +
          "up AS (SELECT * FROM u WHERE x > 0), " +
          "g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_units, " +
          "sum(CAST(x AS HUGEINT)) AS s FROM up GROUP BY 1), " +
          "q AS (SELECT up.event_type, up.x, " +
          "CAST(floor(ln(CAST(up.x AS DOUBLE) * " +
          "CAST(g.n_units AS DOUBLE) / CAST(g.s AS DOUBLE)) * 1048576.0) " +
          "AS BIGINT) AS lq FROM up JOIN g USING (event_type)), " +
          "tt AS (SELECT event_type, " +
          "sum(CAST(x AS HUGEINT) * CAST(lq AS HUGEINT)) AS num " +
          "FROM q GROUP BY 1) " +
          "SELECT g.event_type, g.n_units, CAST(tt.num AS DOUBLE) / " +
          "(CAST(g.s AS DOUBLE) * 1048576.0) AS theil_t " +
          "FROM tt JOIN g USING (event_type)"),
      "q_resample_ohlc" ->
        ("WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id, value " +
          "FROM events), " +
          "b AS (SELECT user_id, (ts_us // 3600000000) * 3600000000 " +
          "AS bucket_start_us, value, " +
          "row_number() OVER (PARTITION BY user_id, ts_us // 3600000000 " +
          "ORDER BY ts_us, event_id) AS rf, " +
          "row_number() OVER (PARTITION BY user_id, ts_us // 3600000000 " +
          "ORDER BY ts_us DESC, event_id DESC) AS rl FROM e) " +
          "SELECT user_id, bucket_start_us, " +
          "max(CASE WHEN rf = 1 THEN value END) AS open, " +
          "max(value) AS high, min(value) AS low, " +
          "max(CASE WHEN rl = 1 THEN value END) AS close, " +
          "count(*) AS n_events, " +
          "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value " +
          "FROM b GROUP BY user_id, bucket_start_us"),
      "q_robust_z" ->
        ("WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med " +
          "FROM events GROUP BY event_type), " +
          "d AS (SELECT e.event_type, e.value, m.med FROM events e " +
          "JOIN m USING (event_type)), " +
          "s AS (SELECT event_type, med, " +
          "quantile_cont(abs(value - med), 0.5) AS mad FROM d " +
          "GROUP BY event_type, med) " +
          "SELECT e.event_id, e.event_type, e.value, s.med, s.mad, " +
          "CASE WHEN s.mad <= 0 THEN NULL " +
          "ELSE (e.value - s.med) / (1.4826 * s.mad) END AS robust_z " +
          "FROM events e JOIN s USING (event_type)"),
      "q_zscore" -> graft.ops.Normalize.zscoreSql(
        "events", "event_type", "value",
        "event_id, event_type, value, n_group"),
      "q_lateral" ->
        ("SELECT c.c_custkey, t.o_orderkey, t.o_totalprice " +
          "FROM customer c JOIN LATERAL (" +
          "SELECT o_orderkey, o_totalprice FROM orders o " +
          "WHERE o.o_custkey = c.c_custkey " +
          "ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t ON true"),
      "q_skew_profile" ->
        ("WITH c AS (SELECT CAST(user_id AS VARCHAR) AS k, count(*) AS cnt " +
          "FROM events WHERE user_id IS NOT NULL GROUP BY 1), " +
          "top AS (SELECT k, cnt FROM c ORDER BY cnt DESC, k DESC LIMIT 1) " +
          "SELECT CAST(sum(c.cnt) AS BIGINT) AS n_rows, " +
          "count(*) AS n_keys, CAST(max(c.cnt) AS BIGINT) AS max_cnt, " +
          "quantile_cont(c.cnt, 0.5) AS p50_cnt, " +
          "quantile_cont(c.cnt, 0.99) AS p99_cnt, " +
          "CAST(max(c.cnt) AS DOUBLE) * count(*) / " +
          "CAST(sum(c.cnt) AS DOUBLE) AS skew_ratio, " +
          "top.k AS top_key, CAST(top.cnt AS BIGINT) AS top_cnt " +
          "FROM c CROSS JOIN top GROUP BY top.k, top.cnt"),
      "q_train_split" -> trainSplitSql,
    )
  }
}
