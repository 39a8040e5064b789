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

/** Graph fixed-point and time-series gates (graph_*, ts_*).
  *
  * Split from the monolithic SparkEntry registry (r10); see
  * [[graft.SparkEntry]] for the oracle-safety conventions and the
  * duplicate-refusing merge. Shared oracle CTEs live in
  * [[GateOracleShared]]. */
private[graft] object GraphTsGates {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- Time series: rolling 24h Bollinger bands over the hourly
    //      mass per event type (exact BIGINT window moments, breach
    //      flag against engine-identical band doubles) ----
    "ts_bollinger" -> ((s, dir) => {
      val hourly = t(s, dir, "events")
        .select(col("event_type"),
          expr("ts div 3600000000000").as("hr"),
          floor(col("value")).cast("long").as("qx"))
        .groupBy(col("event_type"), col("hr"))
        .agg(sum(col("qx")).as("hx"))
        .where(col("hx").isNotNull)
      graft.ops.TimeSeries.rollingBands(
        hourly, "event_type", "hr", "hx", win = 24, k = 2.0)
    }),

    // ---- Time series: permutation entropy (ordinal 3-patterns of the
    //      hourly series — regularity vs noise, outlier-robust) ----
    "ts_perm_entropy" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val hourly = t(s, dir, "events")
        .select(col("event_type"),
          expr("ts div 3600000000000").as("hr"),
          floor(col("value") * 1024.0).cast("long").as("qx"))
        .groupBy(col("event_type"), col("hr"))
        .agg(sum(col("qx")).as("hx"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
      val pat = hourly
        .withColumn("__x1", lag(col("hx"), 2).over(w))
        .withColumn("__x2", lag(col("hx"), 1).over(w))
        .filter(col("__x1").isNotNull)
        .select(col("event_type"),
          (when(col("__x1") <= col("__x2"), 4L).otherwise(0L) +
            when(col("__x2") <= col("hx"), 2L).otherwise(0L) +
            when(col("__x1") <= col("hx"), 1L).otherwise(0L)).as("pat"))
      graft.ops.Profile.entropy(pat, "event_type", "pat")
        .withColumn("entropy", round(col("entropy"), 8))
    }),

    // ---- Time series: CUSUM change-point scan (integer cumulative
    //      deviations over hourly quantized sums — exact argmax) ----
    "ts_cusum" -> ((s, dir) => {
      val hourly = t(s, dir, "events")
        .select(col("event_type"),
          expr("ts div 3600000000000").as("hr"),
          floor(col("value") * 1024.0).cast("long").as("qx"))
        .groupBy(col("event_type"), col("hr"))
        .agg(sum(col("qx")).as("hx"))
      graft.ops.TimeSeries.cusumChangePoint(hourly, "event_type", "hr", "hx")
    }),

    // ---- Time series: robust MEDIAN+MAD outlier census over the
    //      hourly quantized sums — the loss-spike detector a mean±kσ
    //      rule cannot give (50% breakdown point); every decision a
    //      BIGINT comparison via the ×2/×4 carry (see
    //      TimeSeries.madOutliers) ----
    "ts_mad_outliers" -> ((s, dir) => {
      val hourly = t(s, dir, "events")
        .select(col("event_type"),
          expr("ts div 3600000000000").as("hr"),
          floor(col("value") * 1024.0).cast("long").as("qx"))
        .groupBy(col("event_type"), col("hr"))
        .agg(sum(col("qx")).as("hx"))
      graft.ops.TimeSeries.madOutliers(hourly, "event_type", "hx", k = 3L)
    }),

    // ---- Time series: classical additive decomposition of the hourly
    //      quantized series (trend = centered 25-point MA, seasonal =
    //      hour-of-day mean of detrended, residual) — exact numerators
    //      end-to-end ----
    "ts_decompose" -> ((s, dir) => {
      val hourly = t(s, dir, "events")
        .select(col("event_type"),
          expr("ts div 3600000000000").as("hr"),
          floor(col("value") * 1024.0).cast("long").as("qx"))
        .groupBy(col("event_type"), col("hr"))
        .agg(sum(col("qx")).as("hx"))
      graft.ops.TimeSeries.decompose(
        hourly, "event_type", "hr", "hx", window = 25, period = 24)
    }),

    // ---- Time series: trend/seasonal strength (Hyndman F_T, F_S) —
    //      the "any structure worth forecasting?" health read off the
    //      same decomposition, quantized-exact variance ratios ----
    "ts_strength" -> ((s, dir) => {
      val hourly = t(s, dir, "events")
        .select(col("event_type"),
          expr("ts div 3600000000000").as("hr"),
          floor(col("value") * 1024.0).cast("long").as("qx"))
        .groupBy(col("event_type"), col("hr"))
        .agg(sum(col("qx")).as("hx"))
      graft.ops.TimeSeries.decompositionStrength(
        hourly, "event_type", "hr", "hx", window = 25, period = 24)
    }),

    // ---- Time series: seasonal-adjusted anomalies — |residual| of the
    //      decomposition beyond the per-type sketch-p99 (a daily rhythm
    //      can no longer masquerade as an anomaly) ----
    "ts_resid_anomaly" -> ((s, dir) => {
      val hourly = t(s, dir, "events")
        .select(col("event_type"),
          expr("ts div 3600000000000").as("hr"),
          floor(col("value") * 1024.0).cast("long").as("qx"))
        .groupBy(col("event_type"), col("hr"))
        .agg(sum(col("qx")).as("hx"))
      val dc = graft.ops.TimeSeries.decompose(
        hourly, "event_type", "hr", "hx", window = 25, period = 24)
        .select(col("event_type"), col("hr"), col("resid"),
          abs(col("resid")).as("__ar"))
      val thr = graft.ops.Sketches.quantileFromSketch(
        graft.ops.Sketches.quantileSketch(dc, Seq("event_type"), "__ar"),
        Seq("event_type"), Seq(99))
        .select(col("event_type"), col("est").as("p99_abs_resid"))
      dc.join(broadcast(thr), "event_type")
        .filter(col("__ar") > col("p99_abs_resid"))
        .select(col("event_type"), col("hr"), col("resid"),
          col("p99_abs_resid"))
    }),

    // ---- Time series: rolling robust (median/MAD) anomaly flags over
    //      the hourly quantized series — all-integer element picks, the
    //      outlier detector a rolling mean/σ can't be ----
    "ts_rolling_mad" -> ((s, dir) => {
      val hourly = t(s, dir, "events")
        .select(col("event_type"),
          expr("ts div 3600000000000").as("hr"),
          floor(col("value") * 1024.0).cast("long").as("qx"))
        .groupBy(col("event_type"), col("hr"))
        .agg(sum(col("qx")).as("hx"))
      graft.ops.TimeSeries.rollingMadAnomaly(
        hourly, "event_type", "hr", "hx", window = 7, k = 3L)
    }),

    // ---- Time series: lagged cross-correlation — do clicks lead
    //      purchases? Exact paired moments per lag, one float each ----
    "ts_crosscorr" -> ((s, dir) => {
      val hourly = t(s, dir, "events")
        .select(expr("ts div 3600000000000").as("h"), col("event_type"))
        .groupBy(col("h"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("x"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("y"))
      graft.ops.TimeSeries.crossCorrelation(hourly, "h", "x", "y",
        maxLag = 6)
    }),

    // ---- Time series: seasonal-naive backtest with MASE — the
    //      baseline every forecast must beat (exact integer MAEs,
    //      one fixed-shape division chain) ----
    "ts_snaive_mase" -> ((s, dir) => {
      val hourly = t(s, dir, "events")
        .select(col("event_type"), expr("ts div 3600000000000").as("h"),
          coalesce(floor(col("value") * 100.0).cast("long"), lit(0L))
            .as("__c"))
        .groupBy(col("event_type"), col("h"))
        .agg(sum(col("__c")).as("vq"))
      graft.ops.TimeSeries.seasonalNaiveBacktest(hourly,
        "event_type", "h", "vq", seasonLag = 168L, testLen = 24L)
    }),

    // ---- Time series: Holt linear-trend smoothing over the hourly
    //      series (level + trend state, 3-step forecast) — ONE strict
    //      fold per key; dyadic α=0.5, β=0.25 keep the mirror bit-safe ----
    "ts_holt" -> ((s, dir) => {
      val hourly = t(s, dir, "events")
        .select(col("event_type"),
          expr("ts div 3600000000000").as("hr"),
          floor(col("value") * 1024.0).cast("long").as("qx"))
        .groupBy(col("event_type"), col("hr"))
        .agg(sum(col("qx")).as("hx"))
      graft.ops.TimeSeries.holt(hourly, "event_type", "hr", "hx",
        alpha = 0.5, beta = 0.25, horizon = 3)
    }),

    // ---- Time series: 1-D Kalman filter (local-level model) over the
    //      hourly series — variance-adaptive smoothing; final level,
    //      posterior variance, and steady-state gain ----
    "ts_kalman_level" -> ((s, dir) => {
      val hourly = t(s, dir, "events")
        .select(col("event_type"),
          expr("ts div 3600000000000").as("hr"),
          floor(col("value") * 1024.0).cast("long").as("qx"))
        .groupBy(col("event_type"), col("hr"))
        .agg(sum(col("qx")).as("hx"))
      graft.ops.TimeSeries.kalmanLevel(hourly, "event_type", "hr", "hx",
        q = 0.25, r = 2.0)
    }),

    // ---- Time series: Holt–Winters additive triple smoothing over the
    //      daily series (m=7 weekly seasonality, online-learned season
    //      state, exact-binary smoothing constants) ----
    "ts_holt_winters" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .select(col("event_type"),
          expr("ts div 86400000000000").as("d"),
          floor(col("value") * 1024.0).cast("long").as("qx"))
        .groupBy(col("event_type"), col("d"))
        .agg(sum(col("qx")).as("hx"))
      graft.ops.TimeSeries.holtWinters(daily, "event_type", "d", "hx",
        alpha = 0.5, beta = 0.25, gamma = 0.25, m = 7)
    }),

    // ---- Time series: hour-of-day seasonal index (multiplicative
    //      profile vs the key's own mean) — exact integer cross
    //      products, ONE division per bucket ----
    "ts_seasonal" -> ((s, dir) =>
      graft.ops.TimeSeries.seasonalIndex(
        t(s, dir, "events").select(col("event_type"),
          expr("(ts div 3600000000000) % 24").as("hod"),
          floor(col("value") * 1024.0).cast("long").as("qx")),
        "event_type", "hod", "qx")),

    // ---- Time series: lag-k autocorrelation (exact n²-scaled integer
    //      moments, one final division per lag) ----
    "ts_acf" -> ((s, dir) => {
      val hourly = t(s, dir, "events")
        .select(col("event_type"),
          expr("ts div 3600000000000").as("hr"),
          floor(col("value") * 1024.0).cast("long").as("qx"))
        .groupBy(col("event_type"), col("hr"))
        .agg(sum(col("qx")).as("hx"))
      graft.ops.TimeSeries.autocorr(
        hourly, "event_type", "hr", "hx", maxLag = 6)
    }),

    // ---- Time series: SAX symbolization — PAA segment means over the
    //      hourly series, z-bucketed into alphabet-4 symbols (exact
    //      integer sign test at the dense z=0 breakpoint) ----
    // ---- Time series: pairwise DTW via the NATIVE codegen DP kernel
    //      over variable-length daily count series — the exact-length
    //      twin of ts_dtw's fixed-k bucketed HOF min-plus (two
    //      implementations, two oracle shapes: this one's oracle is an
    //      INDEPENDENT anti-diagonal recursive-CTE DP) ----
    "ts_dtw_kernel" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .select(col("event_type"), expr("ts div 86400000000000").as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("x"))
      graft.ops.TimeSeries.dtwPairs(daily, "event_type", "day", "x")
    }),

    "ts_sax" -> ((s, dir) => {
      val hourly = t(s, dir, "events")
        .select(col("event_type"),
          expr("ts div 3600000000000").as("hr"),
          floor(col("value") * 1024.0).cast("long").as("qx"))
        .groupBy(col("event_type"), col("hr"))
        .agg(sum(col("qx")).as("hx"))
        .where(col("hx").isNotNull)
      graft.ops.TimeSeries.sax(hourly, "event_type", "hr", "hx", w = 4)
    }),

    // ---- Time series: Theil-Sen robust slope (median of pairwise
    //      slopes over the hourly series — element pick, no float
    //      averaging) ----
    "ts_theil_sen" -> ((s, dir) => {
      val hourly = t(s, dir, "events")
        .select(col("event_type"),
          expr("ts div 3600000000000").as("hr"),
          floor(col("value") * 1024.0).cast("long").as("qx"))
        .groupBy(col("event_type"), col("hr"))
        .agg(sum(col("qx")).as("hx"))
      graft.ops.TimeSeries.theilSen(hourly, "event_type", "hr", "hx")
    }),

    // ---- Time series: Mann-Kendall monotone-trend test (exact integer
    //      S and tie-corrected variance, fixed-shape z) ----
    "ts_mann_kendall" -> ((s, dir) => {
      val hourly = t(s, dir, "events")
        .select(col("event_type"),
          expr("ts div 3600000000000").as("hr"),
          floor(col("value") * 1024.0).cast("long").as("qx"))
        .groupBy(col("event_type"), col("hr"))
        .agg(sum(col("qx")).as("hx"))
      graft.ops.TimeSeries.mannKendall(hourly, "event_type", "hr", "hx")
    }),

    // ---- Time series: MACD with signal-line crossover counting —
    //      two-EWMA momentum, strict-sign-flip events, exact-binary
    //      constants, kalman-style pinned fold ----
    "ts_macd" -> ((s, dir) => {
      val hourly = t(s, dir, "events")
        .select(col("event_type"),
          expr("ts div 3600000000000").as("hr"),
          floor(col("value") * 1024.0).cast("long").as("qx"))
        .groupBy(col("event_type"), col("hr"))
        .agg(sum(col("qx")).as("hx"))
      graft.ops.TimeSeries.macd(hourly, "event_type", "hr", "hx")
    }),

    // ---- Time series: SEASONAL Mann-Kendall — same-season-only pair
    //      trend test (Hirsch-Slack) over the daily series with a
    //      day-of-week season; per-season exact S and tie-corrected
    //      variance, summed, pinned continuity-corrected z ----
    "ts_mk_seasonal" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .select(col("event_type"),
          expr("ts div 86400000000000").as("d"),
          floor(col("value") * 1024.0).cast("long").as("qx"))
        .groupBy(col("event_type"), col("d"))
        .agg(sum(col("qx")).as("hx"))
        .withColumn("dow", pmod(col("d"), lit(7L)))
      graft.ops.TimeSeries.seasonalMannKendall(
        daily, "event_type", "d", "hx", "dow")
    }),

    // ---- Graph: directed-edge reciprocity (follows-back share) over
    //      a deterministic two-family digraph (a rotation family plus
    //      an all-mutual half-shift family) ----
    "graph_reciprocity" -> ((s, dir) => {
      val n = t(s, dir, "documents")
        .select(pmod(col("doc_id"), lit(1024L)).as("a")).distinct()
      val edges = n.select(col("a"),
          pmod(col("a") * 7L + 3L, lit(1024L)).as("b"))
        .unionByName(n.select(col("a"),
          pmod(col("a") + 512L, lit(1024L)).as("b")))
      graft.ops.Graph.reciprocity(edges, "a", "b")
    }),

    // ---- Graph: DAG longest-path layering (topological levels) —
    //      Bellman relaxation to the order-free fixpoint; deterministic
    //      intra-block dependency DAG over doc ids ----
    "graph_dag_layers" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select(col("doc_id").as("i"))
      val e1 = ids.select(col("i").as("a"),
        (col("i") + pmod(col("i"), lit(3L)) + 1L).as("b"))
      val e2 = ids.filter(pmod(col("i"), lit(2L)) === 0)
        .select(col("i").as("a"), (col("i") + 5L).as("b"))
      val edges = e1.unionByName(e2)
        .filter(expr("a div 12") === expr("b div 12"))
      graft.ops.Graph.dagLayers(edges, "a", "b")
    }),

    // ---- Time series: dominant period (ACF argmax over lags 2..12 on
    //      the hourly series) — the pre-flight that SIZES a seasonal
    //      decomposition's period instead of hard-coding it ----
    "ts_dominant_period" -> ((s, dir) => {
      val hourly = t(s, dir, "events")
        .select(col("event_type"),
          expr("ts div 3600000000000").as("hr"),
          floor(col("value") * 1024.0).cast("long").as("qx"))
        .groupBy(col("event_type"), col("hr"))
        .agg(sum(col("qx")).as("hx"))
      graft.ops.TimeSeries.dominantPeriod(
        hourly, "event_type", "hr", "hx", minLag = 2, maxLag = 12)
    }),

    // ---- Graph centrality: fixed-point PageRank over the symmetrized
    //      part↔supplier co-occurrence graph (3 power iterations; every
    //      op BIGINT floor arithmetic, so the oracle is hash-exact) ----
    // ---- Graph: STRONGLY connected components of a DIRECTED graph
    //      (Orzan coloring: forward min-label fixpoint, backward root
    //      marking within color classes, phase-wise extraction). The
    //      fixture derives intra-group ring edges from orders — wrap
    //      edges (even orderkeys) close cycles, non-wrap edges stay a
    //      DAG — so whole-group SCCs, partial SCCs, self-loop and
    //      orderless singletons all occur; groups of 8 bound the
    //      oracle's closure. ----
    "graph_scc" -> ((s, dir) => {
      val m = col("o_custkey") % 8
      val delta = col("o_orderkey") % 3 + 1
      val dstm = when(col("o_orderkey") % 2 === 0, (m + delta) % 8)
        .otherwise(least(m + delta, lit(7)))
      val edges = t(s, dir, "orders").select(
        col("o_custkey").cast("long").as("src"),
        (col("o_custkey") - m + dstm).cast("long").as("dst"))
      graft.ops.Components.stronglyConnectedComponents(edges, "src", "dst")
    }),

    "graph_pagerank" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(
        (col("l_partkey") * 2).cast("long").as("a"),
        (col("l_suppkey") * 2 + 1).cast("long").as("b"))
      val edges = li.unionByName(li.select(col("b").as("a"), col("a").as("b")))
      graft.ops.Graph.pageRank(edges, "a", "b", iters = 3)
    }),

    // ---- Graph: personalized PageRank — teleport concentrated on a
    //      trusted seed set (suppliers of nation%5=0), ranks measure
    //      proximity to the seeds on the part↔supplier graph ----
    "graph_ppr" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(
        (col("l_partkey") * 2).cast("long").as("a"),
        (col("l_suppkey") * 2 + 1).cast("long").as("b"))
      val edges = li.unionByName(li.select(col("b").as("a"), col("a").as("b")))
      val seeds = t(s, dir, "supplier")
        .filter(col("s_nationkey") % 5 === 0)
        .select((col("s_suppkey") * 2 + 1).cast("long").as("node"))
      graft.ops.Graph.personalizedPageRank(edges, "a", "b", seeds, iters = 3)
    }),

    // ---- Graph: HITS hubs/authorities on the BIPARTITE supply graph
    //      (supplier→part, where PageRank's single score conflates the
    //      two roles) — fixed-point L1-normalized half-rounds, 3 iters;
    //      part-subsampled like the market-basket gates ----
    "graph_hits" -> ((s, dir) => {
      val supply = t(s, dir, "lineitem")
        .filter(col("l_partkey") % 4 === 0)
        .select(col("l_suppkey").as("s"), col("l_partkey").as("p"))
      graft.ops.Graph.hits(supply, "s", "p", iters = 3)
    }),

    // ---- Graph: per-node triangle counts on the market-basket graph
    //      (parts co-purchased in one order; part-subsampled so the
    //      graph stays sparse — the co-SUPPLY graph is complete at
    //      every SF, a degenerate input) — degree-ordered
    //      node-iterator, O(E^1.5) wedge bound, hub-proof ----
    "graph_triangles" -> ((s, dir) => {
      val pp = t(s, dir, "lineitem")
        .filter(col("l_partkey") % 4 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val pairs = pp.as("x").join(pp.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      graft.ops.Graph.triangleCount(pairs, "a", "b")
    }),

    // ---- Graph: global transitivity — 3·triangles/wedges in one row
    //      (the corpus-level closure health number) ----
    "graph_transitivity" -> ((s, dir) => {
      val pp = t(s, dir, "lineitem")
        .filter(col("l_partkey") % 4 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val pairs = pp.as("x").join(pp.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      graft.ops.Graph.transitivity(pairs, "a", "b")
    }),

    // ---- Graph: per-node local clustering coefficient — the
    //      normalized triangle readout (neighbor-pair closure rate) ----
    "graph_clustering_coeff" -> ((s, dir) => {
      val pp = t(s, dir, "lineitem")
        .filter(col("l_partkey") % 4 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val pairs = pp.as("x").join(pp.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      graft.ops.Graph.localClustering(pairs, "a", "b")
    }),

    // ---- Graph: common-neighbor link prediction — Jaccard-scored
    //      2-hop pairs not already connected (missing-edge repair /
    //      related-entity suggestion) on the part co-occurrence graph ----
    // ---- Graph: rich-club profile — per degree threshold k the
    //      hubs-only induced subgraph's node/edge counts and
    //      φ(k) = 2E_k/(N_k(N_k−1)) as exact rationals; rising φ is
    //      the hub-interlinking signal degree histograms miss ----
    "graph_rich_club" -> ((s, dir) => {
      val pp = t(s, dir, "lineitem")
        .filter(col("l_partkey") % 4 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val pairs = pp.as("x").join(pp.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      graft.ops.Graph.richClub(pairs, "a", "b", maxK = 8)
    }),

    "graph_jaccard_links" -> ((s, dir) => {
      val pp = t(s, dir, "lineitem")
        .filter(col("l_partkey") % 4 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val pairs = pp.as("x").join(pp.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      graft.ops.Graph.commonNeighborLinks(pairs, "a", "b",
        minCommon = 3L)
    }),

    // ---- Graph: Adamic-Adar link prediction — shared neighbors
    //      weighted 1/ln(deg) (rare neighbors count, hubs don't);
    //      sorted-fold score pinned at 8 for libm ln ----
    "graph_adamic_adar" -> ((s, dir) => {
      val pp = t(s, dir, "lineitem")
        .filter(col("l_partkey") % 4 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val pairs = pp.as("x").join(pp.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      graft.ops.Graph.adamicAdarLinks(pairs, "a", "b", minCommon = 3L)
    }),

    // ---- Graph: link-prediction panel — common neighbors AND
    //      preferential attachment on identical unlinked 2-hop
    //      candidates (the adamic-adar siblings), exact integers ----
    "graph_link_pred" -> ((s, dir) => {
      val pp = t(s, dir, "lineitem")
        .filter(col("l_partkey") % 4 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val pairs = pp.as("x").join(pp.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      graft.ops.Graph.linkPredPanel(pairs, "a", "b", minCommon = 3L)
    }),

    // ---- Graph: community detection via synchronous label propagation
    //      (3 rounds, deterministic min-label tie-break) on the same
    //      market-basket graph as graph_triangles ----
    "graph_label_prop" -> ((s, dir) => {
      val pp = t(s, dir, "lineitem")
        .filter(col("l_partkey") % 4 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val pairs = pp.as("x").join(pp.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      graft.ops.Graph.labelPropagation(pairs, "a", "b", iters = 3)
    }),

    // ---- Graph: shape profile (degree extremes, power-law MLE α) —
    //      the pre-flight that picks hub-capped vs plain plans ----
    "graph_degree_stats" -> ((s, dir) => {
      val pp = t(s, dir, "lineitem")
        .filter(col("l_partkey") % 4 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val pairs = pp.as("x").join(pp.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      graft.ops.Graph.degreeStats(pairs, "a", "b")
    }),

    // ---- Graph: degree assortativity — do hubs link to hubs? Exact
    //      integer edge moments, divisions last ----
    "graph_assortativity" -> ((s, dir) => {
      val pp = t(s, dir, "lineitem")
        .filter(col("l_partkey") % 4 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val pairs = pp.as("x").join(pp.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      graft.ops.Graph.assortativity(pairs, "a", "b")
    }),

    // ---- Graph: Newman modularity of the label-prop partition — did
    //      the communities actually find structure? Exact-integer
    //      4m·e_c − D_c² terms, one final division ----
    "graph_modularity" -> ((s, dir) => {
      val pp = t(s, dir, "lineitem")
        .filter(col("l_partkey") % 4 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val pairs = pp.as("x").join(pp.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      graft.ops.Graph.modularity(pairs, "a", "b",
        graft.ops.Graph.labelPropagation(pairs, "a", "b", iters = 3),
        "node", "lbl")
    }),

    // ---- Time series: per-type OLS trend of the daily quantized
    //      totals (slope/intercept/R² from exact decimal moments) ----
    "ts_linregress" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .select(col("event_type"),
          expr("ts div 86400000000000").as("day"),
          floor(col("value") * 1024.0).cast("long").as("qx"))
        .groupBy(col("event_type"), col("day"))
        .agg(sum(col("qx")).as("dx"))
      graft.ops.TimeSeries.linearRegression(
        daily, "event_type", "day", "dx")
    }),

    // ---- Graph: k-core density filter (iterative peeling to the unique
    //      fixpoint) on the same market-basket graph ----
    "graph_kcore" -> ((s, dir) => {
      val pp = t(s, dir, "lineitem")
        .filter(col("l_partkey") % 4 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val pairs = pp.as("x").join(pp.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      graft.ops.Graph.kCore(pairs, "a", "b", k = 20)
    }),

    // ---- Graph: bounded-depth multi-source BFS (hop distance to the
    //      nearest trusted seed) on the same market-basket graph ----
    "graph_bfs" -> ((s, dir) => {
      val pp = t(s, dir, "lineitem")
        .filter(col("l_partkey") % 4 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val pairs = pp.as("x").join(pp.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      val edges = pairs.unionByName(
        pairs.select(col("b").as("a"), col("a").as("b")))
      val seeds = pp.select(col("p")).distinct()
        .filter(col("p") % 40 === 0)
      graft.ops.Graph.bfsHops(edges, "a", "b", seeds, depth = 3)
    }),

    // ---- Graph: BIPARTITENESS per component — BFS-parity 2-coloring
    //      plus odd-edge witnesses over a deterministic RING fixture
    //      (8-rings bipartite, 7-rings odd cycles); the engine runs the
    //      real CC + BFS fixpoints, the oracle replays parity closed-
    //      form from ring positions — fully independent derivations ----
    "graph_bipartite" -> ((s, dir) => {
      val nodes = t(s, dir, "documents")
        .select(col("doc_id").as("n"), expr("doc_id div 8").as("g"))
        .filter(!(pmod(col("n"), lit(8)) === 7 &&
          pmod(col("g"), lit(2)) === 0))
      val rings = nodes.groupBy(col("g"))
        .agg(sort_array(collect_list(col("n"))).as("ns"))
        .filter(size(col("ns")) >= 2)
      val edges = rings
        .select(col("ns"), posexplode(col("ns")).as(Seq("i", "a")))
        .select(col("a"), element_at(col("ns"),
          pmod(col("i") + 1, size(col("ns"))) + 1).as("b"))
      graft.ops.Graph.bipartiteCheck(edges, "a", "b", maxDepth = 6)
    }),

    // ---- Graph: double-sweep diameter — two multi-seed BFS waves
    //      bound every component's diameter at O(E)-per-round cost
    //      (exact all-pairs is quadratic); ring fixture's closed form:
    //      ecc(root) = diameter = floor(L/2), peripheral node = the
    //      antipode (ties to the smaller id) ----
    "graph_diameter" -> ((s, dir) => {
      val nodes = t(s, dir, "documents")
        .select(col("doc_id").as("n"), expr("doc_id div 8").as("g"))
        .filter(!(pmod(col("n"), lit(8)) === 7 &&
          pmod(col("g"), lit(2)) === 0))
      val rings = nodes.groupBy(col("g"))
        .agg(sort_array(collect_list(col("n"))).as("ns"))
        .filter(size(col("ns")) >= 2)
      val edges = rings
        .select(col("ns"), posexplode(col("ns")).as(Seq("i", "a")))
        .select(col("a"), element_at(col("ns"),
          pmod(col("i") + 1, size(col("ns"))) + 1).as("b"))
      graft.ops.Graph.doubleSweepDiameter(edges, "a", "b", maxDepth = 6)
    }),

    // ---- Graph: k-TRUSS by simultaneous edge peeling — the triangle-
    //      density community kernel (stricter than k-core); order-free
    //      peel fixpoint, so the fixed-depth oracle replay of the
    //      adaptive engine loop is exact ----
    "graph_ktruss" -> ((s, dir) => {
      val pp = t(s, dir, "lineitem")
        .filter(col("l_partkey") % 8 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val pairs = pp.as("x").join(pp.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      graft.ops.Graph.kTruss(pairs, "a", "b", k = 4)
    }),

    // ---- Graph: Luby's maximal independent set (derandomized) — the
    //      distributed MIS classic with a deterministic hash priority,
    //      so the adaptive engine loop and the fixed-unroll oracle
    //      replay the SAME run; O(E) shuffle per round ----
    "graph_mis" -> ((s, dir) => {
      val pp = t(s, dir, "lineitem")
        .filter(col("l_partkey") % 4 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val pairs = pp.as("x").join(pp.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      graft.ops.Graph.lubyMis(pairs, "a", "b")
    }),

    // ---- Graph: truncated HARMONIC centrality of a landmark set —
    //      the disconnected-safe closeness (Σ 1/d over the depth-3
    //      ball); exact per-ring integer counts, harmonic as ONE
    //      fixed-order double expression ----
    "graph_harmonic" -> ((s, dir) => {
      val pp = t(s, dir, "lineitem")
        .filter(col("l_partkey") % 4 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val pairs = pp.as("x").join(pp.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      val edges = pairs.unionByName(
        pairs.select(col("b").as("a"), col("a").as("b")))
      val seeds = pp.select(col("p")).distinct()
        .filter(col("p") % 100 === 0)
      graft.ops.Graph.harmonicLandmarks(edges, "a", "b", seeds, depth = 3)
    }),

    // ---- Graph: deterministic hash-guided random walks (the
    //      node2vec/DeepWalk sampling primitive made replayable) —
    //      argmin-hash next-hop choice precomputed as one window,
    //      then six O(|walkers|) position joins ----
    "graph_random_walks" -> ((s, dir) => {
      val pp = t(s, dir, "lineitem")
        .filter(col("l_partkey") % 4 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val pairs = pp.as("x").join(pp.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      val edges = pairs.unionByName(
        pairs.select(col("b").as("a"), col("a").as("b")))
      val seeds = pp.select(col("p")).distinct()
        .filter(col("p") % 400 === 0)
      graft.ops.Graph.deterministicWalks(edges, "a", "b", seeds,
        steps = 6)
    }),

    // ---- Graph: minimum spanning forest by distributed BORUVKA —
    //      per-round lightest-outgoing-edge contraction (THE parallel
    //      MST); ring fixture whose MST is closed-form (cycle minus
    //      its max edge under the (w,a,b) total order) ----
    "graph_mst" -> ((s, dir) => {
      val nodes = t(s, dir, "documents")
        .select(col("doc_id").as("n"), expr("doc_id div 8").as("g"))
        .filter(!(pmod(col("n"), lit(8)) === 7 &&
          pmod(col("g"), lit(2)) === 0))
      val rings = nodes.groupBy(col("g"))
        .agg(sort_array(collect_list(col("n"))).as("ns"))
        .filter(size(col("ns")) >= 2)
      val edges = rings
        .select(col("ns"), posexplode(col("ns")).as(Seq("i", "ea")))
        .select(col("ea"), element_at(col("ns"),
          pmod(col("i") + 1, size(col("ns"))) + 1).as("eb"))
        .select(least(col("ea"), col("eb")).as("a"),
          greatest(col("ea"), col("eb")).as("b"))
        .distinct()
        .withColumn("w",
          lit(1L) + pmod(col("a") * 31 + col("b") * 17, lit(97L)))
      graft.ops.Graph.boruvkaMst(edges, "a", "b", "w")
    }),

    // ---- Graph: landmark betweenness (Brandes on the depth-3 ball) —
    //      σ forward / quantized δ backward over the BFS DAG; the
    //      broker-node read completing the centrality family ----
    "graph_betweenness" -> ((s, dir) => {
      val pp = t(s, dir, "lineitem")
        .filter(col("l_partkey") % 4 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val pairs = pp.as("x").join(pp.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      val edges = pairs.unionByName(
        pairs.select(col("b").as("a"), col("a").as("b")))
      val seeds = pp.select(col("p")).distinct()
        .filter(col("p") % 500 === 0)
      graft.ops.Graph.betweennessLandmarks(edges, "a", "b", seeds,
        depth = 3)
    }),

    // ---- Graph: truncated closeness centrality of a landmark set —
    //      ONE multi-source BFS wave carries every landmark's frontier;
    //      closeness = reached / Σdist over the depth-3 ball ----
    "graph_closeness" -> ((s, dir) => {
      val pp = t(s, dir, "lineitem")
        .filter(col("l_partkey") % 4 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val pairs = pp.as("x").join(pp.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
      val edges = pairs.unionByName(
        pairs.select(col("b").as("a"), col("a").as("b")))
      val seeds = pp.select(col("p")).distinct()
        .filter(col("p") % 40 === 0)
      graft.ops.Graph.closenessLandmarks(edges, "a", "b", seeds, depth = 3)
    }),

    // ---- Time series: binary-segmentation changepoint (where did the
    //      daily level break?) — exact DECIMAL(38,0) CUSUM argmax,
    //      smallest-t ties; ts_cusum's retro segmentation twin ----
    "ts_changepoint" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .filter(col("value").isNotNull)
        .select(col("event_type"),
          expr("ts div 86400000000000").as("day"),
          floor(col("value") * 1024.0).cast("long").as("qx"))
        .groupBy(col("event_type"), col("day"))
        .agg(sum(col("qx")).as("dx"))
      graft.ops.TimeSeries.changepointBinary(
        daily, "event_type", "day", "dx", scale = 1024.0)
    }),

    // ---- Time series: PACF lags 1-3 (Durbin-Levinson closed form over
    //      the exact-form ACF) — the AR-order read ts_acf can't give ----
    "ts_pacf" -> ((s, dir) => {
      val hourly = t(s, dir, "events")
        .select(col("event_type"),
          expr("ts div 3600000000000").as("hr"),
          floor(col("value") * 1024.0).cast("long").as("qx"))
        .groupBy(col("event_type"), col("hr"))
        .agg(sum(col("qx")).as("hx"))
      graft.ops.TimeSeries.pacf(hourly, "event_type", "hr", "hx")
    }),

    // ---- Time series: peak detection — strict local maxima of the
    //      hourly load with integer prominence over both neighbors ----
    "ts_peaks" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("hr"))
      t(s, dir, "events")
        .select(col("event_type"),
          expr("ts div 3600000000000").as("hr"),
          floor(col("value") * 1024.0).cast("long").as("qx"))
        .groupBy(col("event_type"), col("hr"))
        .agg(sum(col("qx")).as("hx"))
        .withColumn("__prev", lag(col("hx"), 1).over(w))
        .withColumn("__next", lead(col("hx"), 1).over(w))
        .filter(col("__prev").isNotNull && col("__next").isNotNull &&
          col("hx") > col("__prev") && col("hx") > col("__next"))
        .select(col("event_type"), col("hr"), col("hx"),
          (col("hx") - greatest(col("__prev"), col("__next")))
            .as("prominence"))
        .filter(col("prominence") >= 2048L)
    }),

    // ---- Time series: Ljung-Box portmanteau Q at h=6 over the exact-
    //      form ACF — "any serial correlation left?" on the hourly
    //      series; strict lag-order term chain ----
    "ts_ljung_box" -> ((s, dir) => {
      val hourly = t(s, dir, "events")
        .select(col("event_type"),
          expr("ts div 3600000000000").as("hr"),
          floor(col("value") * 1024.0).cast("long").as("qx"))
        .groupBy(col("event_type"), col("hr"))
        .agg(sum(col("qx")).as("hx"))
      graft.ops.TimeSeries.ljungBox(
        hourly, "event_type", "hr", "hx", maxLag = 6)
    }),

    // ---- Time series: AR(2) Yule-Walker closed-form fit + one-step
    //      forecast over the hourly series — the autoregressive
    //      baseline beneath Holt ----
    "ts_ar2_forecast" -> ((s, dir) => {
      val hourly = t(s, dir, "events")
        .select(col("event_type"),
          expr("ts div 3600000000000").as("hr"),
          floor(col("value") * 1024.0).cast("long").as("qx"))
        .groupBy(col("event_type"), col("hr"))
        .agg(sum(col("qx")).as("hx"))
      graft.ops.TimeSeries.ar2YuleWalker(hourly, "event_type", "hr", "hx")
    }),

    // ---- Time series: Hurst exponent by rescaled-range analysis at
    //      block sizes 8/16/32 over the hourly series — exact-integer
    //      block deviations, one sqrt per block, 3-point log-log slope ----
    "ts_hurst" -> ((s, dir) => {
      val hourly = t(s, dir, "events")
        .select(col("event_type"),
          expr("ts div 3600000000000").as("hr"),
          floor(col("value") * 1024.0).cast("long").as("qx"))
        .groupBy(col("event_type"), col("hr"))
        .agg(sum(col("qx")).as("hx"))
      graft.ops.TimeSeries.hurstRS(hourly, "event_type", "hr", "hx")
    }),

    // ---- Graph: Katz centrality — in-degree-weighted reachability with
    //      exact quantized α-damping (no out-degree normalization, the
    //      PageRank contrast); 3 fixed-point rounds, Pregel joins ----
    "graph_katz" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(
        (col("l_partkey") * 2).cast("long").as("a"),
        (col("l_suppkey") * 2 + 1).cast("long").as("b"))
      val edges = li.unionByName(li.select(col("b").as("a"), col("a").as("b")))
      graft.ops.Graph.katz(edges, "a", "b", iters = 3)
    }),

    // ---- Time series: pairwise Granger causality (lag-1) — does one
    //      metric's past improve another's forecast? Exact decimal
    //      moments, Cramer-solved incremental F ----
    "ts_granger" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("event_type"),
        expr("ts div 86400000000000").as("d"),
        coalesce(floor(col("value")).cast("long"), lit(0L)).as("q"))
      graft.ops.TimeSeries.grangerPairs(ev, "event_type", "d", "q")
    }),

    // ---- Time series: pairwise DTW distance — alignment-tolerant
    //      co-movement between event-type series; k-bucket collapse
    //      first, then a row-local exact-integer min-plus DP ----
    "ts_dtw" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("event_type"),
        expr("ts div 86400000000000").as("d"),
        coalesce(floor(col("value") * 1024.0).cast("long"), lit(0L))
          .as("q"))
      graft.ops.TimeSeries.dtwPairwise(ev, "event_type", "d", "q")
    }),

    // ---- Time series: MATRIX PROFILE over the daily series — each
    //      7-day window's nearest non-trivial neighbor (|i-j| >= 7);
    //      minima = motifs, maxima = discords; exact integers ----
    "ts_matrix_profile" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .select(col("event_type"),
          expr("ts div 86400000000000").as("d"),
          coalesce(floor(col("value") * 1024.0).cast("long"), lit(0L))
            .as("q"))
        .groupBy(col("event_type"), col("d"))
        .agg(sum(col("q")).as("x"))
      graft.ops.TimeSeries.matrixProfile(
        daily, "event_type", "d", "x", window = 7, exclusion = 7)
    }),

    // ---- Time series: Croston's intermittent-demand method — split
    //      SES over demand sizes and inter-demand intervals (α = 1/2,
    //      dyadic-exact doubles), forecast = z/q; rare-event daily
    //      demand (value > 300) is the intermittent series ----
    "ts_croston" -> ((s, dir) => {
      val demand = t(s, dir, "events").filter(col("value") > 300)
        .select(col("event_type"), expr("ts div 86400000000000").as("d"))
        .groupBy(col("event_type"), col("d"))
        .agg(count(lit(1)).as("dem"))
      graft.ops.TimeSeries.croston(demand, "event_type", "d", "dem")
    }),

    // ---- Time series: Chatterjee's ξ (2020) between time order and
    //      the daily value series — the modern rank-based dependence
    //      coefficient, exact integer rational; two grid-bounded
    //      windows ----
    "ts_chatterjee_xi" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .select(col("event_type"),
          expr("ts div 86400000000000").as("d"),
          floor(col("value")).cast("long").as("q"))
        .groupBy(col("event_type"), col("d"))
        .agg(sum(col("q")).as("y"))
      graft.ops.TimeSeries.chatterjeeXi(daily, "event_type", "d", "y")
    }),

    // ---- Time series: Durbin–Watson of the daily series around its
    //      mean — serial-correlation readout as an exact rational (the
    //      scaled identity folds the mean pass away) ----
    "ts_durbin_watson" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .select(col("event_type"),
          expr("ts div 86400000000000").as("d"),
          floor(col("value")).cast("long").as("q"))
        .groupBy(col("event_type"), col("d"))
        .agg(sum(col("q")).as("y"))
      graft.ops.TimeSeries.durbinWatson(daily, "event_type", "d", "y")
    }),

    // ---- Time series: sample-entropy template counts (m=2, Chebyshev
    //      r = range div 6) over the daily count series — regularity /
    //      complexity readout; per-key grid self-join, integer-exact ----
    "ts_sample_entropy" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .select(col("event_type"), expr("ts div 86400000000000").as("d"))
        .groupBy(col("event_type"), col("d"))
        .agg(count(lit(1)).as("x"))
      graft.ops.TimeSeries.sampleEntropyCounts(
        daily, "event_type", "d", "x", rDiv = 6L)
    }),
  )

  def oracles: Map[String, String] = {
    val tsDecomposeSql =
      "WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr, " +
        "CAST(sum(CAST(floor(value * 1024.0) AS BIGINT)) AS BIGINT) " +
        "AS hx FROM events GROUP BY 1, 2), " +
        "wn AS (SELECT event_type, hr, hx, " +
        "CAST(sum(hx) OVER (PARTITION BY event_type ORDER BY hr " +
        "ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS BIGINT) AS s, " +
        "count(*) OVER (PARTITION BY event_type ORDER BY hr " +
        "ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS nw FROM h), " +
        "fw AS (SELECT event_type, hr, hx, s, hx * 25 - s AS dnum, " +
        "hr % 24 AS ph FROM wn WHERE nw = 25), " +
        "se AS (SELECT event_type, ph, " +
        "CAST(sum(dnum) AS BIGINT) AS snum, " +
        "CAST(count(*) AS BIGINT) AS scnt FROM fw GROUP BY 1, 2) " +
        "SELECT fw.event_type, hr, hx, " +
        "CAST(s AS DOUBLE) / 25 AS trend, " +
        "CAST(snum AS DOUBLE) / CAST(scnt * 25 AS DOUBLE) AS seasonal, " +
        "CAST(dnum AS DOUBLE) / 25 - CAST(snum AS DOUBLE) / " +
        "CAST(scnt * 25 AS DOUBLE) AS resid " +
        "FROM fw JOIN se ON fw.event_type = se.event_type " +
        "AND fw.ph = se.ph"

    // Shared by the batch gzip-ingest gate and its stateless streaming
    // twin: the oracle never sees the gzip bytes — it reads the source
    // text; only an engine that really inflates matches the md5.
    Map(
      "ts_changepoint" ->
        // Exact HUGEINT prefix/total sums (Spark: DECIMAL(38,0));
        // g(t) is ONE division of exact operands; argmax ties on
        // smallest t via the rank's (g DESC, i ASC).
        ("WITH h AS (SELECT event_type, epoch_us(ts) // 86400000000 " +
          "AS day, CAST(sum(CAST(floor(value * 1024.0) AS BIGINT)) " +
          "AS BIGINT) AS dx FROM events WHERE value IS NOT NULL " +
          "GROUP BY 1, 2), " +
          "b AS (SELECT event_type, day, " +
          "CAST(row_number() OVER w AS HUGEINT) AS i, " +
          "CAST(sum(dx) OVER (PARTITION BY event_type ORDER BY day " +
          "ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS p, " +
          "CAST(count(*) OVER (PARTITION BY event_type) AS HUGEINT) AS n, " +
          "CAST(sum(dx) OVER (PARTITION BY event_type) AS HUGEINT) AS s " +
          "FROM h WINDOW w AS (PARTITION BY event_type ORDER BY day)), " +
          "c AS (SELECT *, CAST((p * n - s * i) * (p * n - s * i) " +
          "AS DOUBLE) / CAST(i * (n - i) AS DOUBLE) AS g FROM b " +
          "WHERE i < n), " +
          "r AS (SELECT *, row_number() OVER (PARTITION BY event_type " +
          "ORDER BY g DESC, i ASC) AS rk FROM c) " +
          "SELECT event_type, CAST(n AS BIGINT) AS n_points, " +
          "CAST(i AS BIGINT) AS cp_index, day AS cp_ord, " +
          "CAST(p AS DOUBLE) / (CAST(i AS DOUBLE) * 1024.0) AS mean_left, " +
          "CAST(s - p AS DOUBLE) / (CAST(n - i AS DOUBLE) * 1024.0) " +
          "AS mean_right, g AS g_stat FROM r WHERE rk = 1"),
      "ts_pacf" ->
        // The ts_acf exact-form rho CTEs at maxLag=3, pivoted, then the
        // Durbin-Levinson chain in the engine's verbatim operand order.
        ("WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr, " +
          "CAST(sum(CAST(floor(value * 1024.0) AS BIGINT)) AS BIGINT) AS hx " +
          "FROM events GROUP BY 1, 2), " +
          "b AS (SELECT event_type, hr, hx, row_number() OVER (" +
          "PARTITION BY event_type ORDER BY hr) AS i FROM h), " +
          "st AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n, " +
          "CAST(sum(hx) AS HUGEINT) AS s, " +
          "sum(CAST(hx AS HUGEINT) * CAST(hx AS HUGEINT)) AS sxx " +
          "FROM b GROUP BY 1), " +
          "pp AS (SELECT hh.event_type, t.lag, " +
          "sum(CAST(hh.hx AS HUGEINT) * CAST(tt.hx AS HUGEINT)) AS sxy, " +
          "CAST(sum(hh.hx) AS HUGEINT) AS sh, " +
          "CAST(sum(tt.hx) AS HUGEINT) AS st2, " +
          "CAST(count(*) AS HUGEINT) AS m " +
          "FROM b hh CROSS JOIN range(1, 4) t(lag) JOIN b tt " +
          "ON tt.event_type = hh.event_type AND tt.i = hh.i + t.lag " +
          "GROUP BY 1, 2), " +
          "acf AS (SELECT event_type, lag, n, " +
          "CASE WHEN den <= 0 THEN NULL " +
          "ELSE CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END AS acf " +
          "FROM (SELECT pp.event_type, pp.lag, st.n, " +
          "st.n * st.n * pp.sxy - st.n * st.s * (pp.sh + pp.st2) " +
          "+ pp.m * st.s * st.s AS num, " +
          "st.n * st.n * st.sxx - st.n * st.s * st.s AS den " +
          "FROM pp JOIN st USING (event_type))), " +
          "piv AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n_points, " +
          "max(CASE WHEN lag = 1 THEN acf END) AS r1, " +
          "max(CASE WHEN lag = 2 THEN acf END) AS r2, " +
          "max(CASE WHEN lag = 3 THEN acf END) AS r3 FROM acf " +
          "GROUP BY 1), " +
          "p2 AS (SELECT *, CASE WHEN r1 IS NULL OR r2 IS NULL OR " +
          "1.0 - r1 * r1 = 0.0 THEN NULL ELSE " +
          "(r2 - r1 * r1) / (1.0 - r1 * r1) END AS pacf2 FROM piv), " +
          "p21 AS (SELECT *, r1 - pacf2 * r1 AS p21 FROM p2) " +
          "SELECT event_type, n_points, r1 AS pacf1, pacf2, " +
          "CASE WHEN pacf2 IS NULL OR r3 IS NULL OR " +
          "1.0 - p21 * r1 - pacf2 * r2 = 0.0 THEN NULL ELSE " +
          "(r3 - p21 * r2 - pacf2 * r1) / " +
          "(1.0 - p21 * r1 - pacf2 * r2) END AS pacf3 FROM p21"),
      "ts_peaks" ->
        ("WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr, " +
          "CAST(sum(CAST(floor(value * 1024.0) AS BIGINT)) AS BIGINT) " +
          "AS hx FROM events GROUP BY 1, 2), " +
          "n AS (SELECT event_type, hr, hx, " +
          "lag(hx) OVER (PARTITION BY event_type ORDER BY hr) AS p, " +
          "lead(hx) OVER (PARTITION BY event_type ORDER BY hr) AS nx " +
          "FROM h) " +
          "SELECT event_type, hr, hx, hx - greatest(p, nx) AS prominence " +
          "FROM n WHERE p IS NOT NULL AND nx IS NOT NULL " +
          "AND hx > p AND hx > nx AND hx - greatest(p, nx) >= 2048"),
      "ts_ljung_box" ->
        // ts_acf's exact-form rho CTEs at h=6, pivoted; Q via the
        // engine's strict left-to-right lag-order term chain.
        ("WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr, " +
          "CAST(sum(CAST(floor(value * 1024.0) AS BIGINT)) AS BIGINT) AS hx " +
          "FROM events GROUP BY 1, 2), " +
          "b AS (SELECT event_type, hr, hx, row_number() OVER (" +
          "PARTITION BY event_type ORDER BY hr) AS i FROM h), " +
          "st AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n, " +
          "CAST(sum(hx) AS HUGEINT) AS s, " +
          "sum(CAST(hx AS HUGEINT) * CAST(hx AS HUGEINT)) AS sxx " +
          "FROM b GROUP BY 1), " +
          "pp AS (SELECT hh.event_type, t.lag, " +
          "sum(CAST(hh.hx AS HUGEINT) * CAST(tt.hx AS HUGEINT)) AS sxy, " +
          "CAST(sum(hh.hx) AS HUGEINT) AS sh, " +
          "CAST(sum(tt.hx) AS HUGEINT) AS st2, " +
          "CAST(count(*) AS HUGEINT) AS m " +
          "FROM b hh CROSS JOIN range(1, 7) t(lag) JOIN b tt " +
          "ON tt.event_type = hh.event_type AND tt.i = hh.i + t.lag " +
          "GROUP BY 1, 2), " +
          "acf AS (SELECT event_type, lag, n, " +
          "CASE WHEN den <= 0 THEN NULL " +
          "ELSE CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END AS acf " +
          "FROM (SELECT pp.event_type, pp.lag, st.n, " +
          "st.n * st.n * pp.sxy - st.n * st.s * (pp.sh + pp.st2) " +
          "+ pp.m * st.s * st.s AS num, " +
          "st.n * st.n * st.sxx - st.n * st.s * st.s AS den " +
          "FROM pp JOIN st USING (event_type))), " +
          "piv AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n_points, " +
          "max(CASE WHEN lag = 1 THEN acf END) AS r1, " +
          "max(CASE WHEN lag = 2 THEN acf END) AS r2, " +
          "max(CASE WHEN lag = 3 THEN acf END) AS r3, " +
          "max(CASE WHEN lag = 4 THEN acf END) AS r4, " +
          "max(CASE WHEN lag = 5 THEN acf END) AS r5, " +
          "max(CASE WHEN lag = 6 THEN acf END) AS r6 FROM acf " +
          "GROUP BY 1) " +
          "SELECT event_type, n_points, CAST(6 AS BIGINT) AS df, " +
          "CASE WHEN n_points <= 6 THEN NULL ELSE " +
          "CAST(n_points AS DOUBLE) * (CAST(n_points AS DOUBLE) + 2.0) * " +
          "(0.0 + COALESCE(r1 * r1 / (CAST(n_points AS DOUBLE) - 1.0), 0.0) " +
          "+ COALESCE(r2 * r2 / (CAST(n_points AS DOUBLE) - 2.0), 0.0) " +
          "+ COALESCE(r3 * r3 / (CAST(n_points AS DOUBLE) - 3.0), 0.0) " +
          "+ COALESCE(r4 * r4 / (CAST(n_points AS DOUBLE) - 4.0), 0.0) " +
          "+ COALESCE(r5 * r5 / (CAST(n_points AS DOUBLE) - 5.0), 0.0) " +
          "+ COALESCE(r6 * r6 / (CAST(n_points AS DOUBLE) - 6.0), 0.0)) " +
          "END AS q_stat FROM piv"),
      "ts_ar2_forecast" ->
        // ts_acf's rho CTEs at maxLag=2; Yule-Walker closed form and
        // the one-step forecast in the engine's verbatim operand order.
        ("WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr, " +
          "CAST(sum(CAST(floor(value * 1024.0) AS BIGINT)) AS BIGINT) AS hx " +
          "FROM events GROUP BY 1, 2), " +
          "b AS (SELECT event_type, hr, hx, row_number() OVER (" +
          "PARTITION BY event_type ORDER BY hr) AS i FROM h), " +
          "st AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n, " +
          "CAST(sum(hx) AS HUGEINT) AS s, " +
          "sum(CAST(hx AS HUGEINT) * CAST(hx AS HUGEINT)) AS sxx " +
          "FROM b GROUP BY 1), " +
          "pp AS (SELECT hh.event_type, t.lag, " +
          "sum(CAST(hh.hx AS HUGEINT) * CAST(tt.hx AS HUGEINT)) AS sxy, " +
          "CAST(sum(hh.hx) AS HUGEINT) AS sh, " +
          "CAST(sum(tt.hx) AS HUGEINT) AS st2, " +
          "CAST(count(*) AS HUGEINT) AS m " +
          "FROM b hh CROSS JOIN range(1, 3) t(lag) JOIN b tt " +
          "ON tt.event_type = hh.event_type AND tt.i = hh.i + t.lag " +
          "GROUP BY 1, 2), " +
          "acf AS (SELECT event_type, lag, n, " +
          "CASE WHEN den <= 0 THEN NULL " +
          "ELSE CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END AS acf " +
          "FROM (SELECT pp.event_type, pp.lag, st.n, " +
          "st.n * st.n * pp.sxy - st.n * st.s * (pp.sh + pp.st2) " +
          "+ pp.m * st.s * st.s AS num, " +
          "st.n * st.n * st.sxx - st.n * st.s * st.s AS den " +
          "FROM pp JOIN st USING (event_type))), " +
          "piv AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n_points, " +
          "max(CASE WHEN lag = 1 THEN acf END) AS r1, " +
          "max(CASE WHEN lag = 2 THEN acf END) AS r2 FROM acf " +
          "GROUP BY 1), " +
          "tl AS (SELECT event_type, " +
          "max(CASE WHEN rn = 1 THEN hx END) AS xn, " +
          "max(CASE WHEN rn = 2 THEN hx END) AS xn1 FROM (" +
          "SELECT event_type, hx, row_number() OVER (" +
          "PARTITION BY event_type ORDER BY hr DESC) AS rn FROM h) " +
          "WHERE rn <= 2 GROUP BY 1), " +
          "stx AS (SELECT event_type, CAST(s AS DOUBLE) / " +
          "CAST(n AS DOUBLE) AS mu FROM st) " +
          "SELECT event_type, n_points, " +
          "CASE WHEN r1 IS NULL OR r2 IS NULL OR 1.0 - r1 * r1 = 0.0 " +
          "THEN NULL ELSE r1 * (1.0 - r2) / (1.0 - r1 * r1) END AS phi1, " +
          "CASE WHEN r1 IS NULL OR r2 IS NULL OR 1.0 - r1 * r1 = 0.0 " +
          "THEN NULL ELSE (r2 - r1 * r1) / (1.0 - r1 * r1) END AS phi2, " +
          "CASE WHEN r1 IS NULL OR r2 IS NULL OR 1.0 - r1 * r1 = 0.0 " +
          "OR xn1 IS NULL THEN NULL ELSE " +
          "mu + r1 * (1.0 - r2) / (1.0 - r1 * r1) * " +
          "(CAST(xn AS DOUBLE) - mu) + " +
          "(r2 - r1 * r1) / (1.0 - r1 * r1) * " +
          "(CAST(xn1 AS DOUBLE) - mu) END AS forecast " +
          "FROM piv JOIN tl USING (event_type) JOIN stx USING (event_type)"),
      "ts_hurst" ->
        // Mirrors TimeSeries.hurstRS: exact HUGEINT block deviations
        // and radicands, one sqrt+division per block, grp-sorted strict
        // fold per (key, w), the collapsed 3-point slope.
        ("WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr, " +
          "CAST(sum(CAST(floor(value * 1024.0) AS BIGINT)) AS BIGINT) " +
          "AS hx FROM events GROUP BY 1, 2), " +
          "b AS (SELECT event_type, hx, row_number() OVER (" +
          "PARTITION BY event_type ORDER BY hr) AS i FROM h), " +
          "e AS (SELECT event_type, i, hx, w FROM b CROSS JOIN " +
          "(SELECT unnest([8, 16, 32]) AS w)), " +
          "g AS (SELECT *, (i - 1) // w AS grp, (i - 1) % w + 1 AS j " +
          "FROM e), " +
          "f AS (SELECT *, count(*) OVER (PARTITION BY event_type, w, " +
          "grp) AS cnt FROM g), " +
          "s AS (SELECT *, CAST(sum(hx) OVER pb AS HUGEINT) AS sb, " +
          "sum(CAST(hx AS HUGEINT) * hx) OVER pb AS sxx, " +
          "CAST(sum(hx) OVER (PARTITION BY event_type, w, grp " +
          "ORDER BY j ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS p " +
          "FROM f WHERE cnt = w " +
          "WINDOW pb AS (PARTITION BY event_type, w, grp)), " +
          "d AS (SELECT event_type, w, grp, " +
          "max(CAST(w AS HUGEINT) * p - CAST(j AS HUGEINT) * sb) AS dmax, " +
          "min(CAST(w AS HUGEINT) * p - CAST(j AS HUGEINT) * sb) AS dmin, " +
          "max(CAST(w AS HUGEINT) * sxx - sb * sb) AS rad " +
          "FROM s GROUP BY 1, 2, 3), " +
          "rs AS (SELECT event_type, w, grp, " +
          "CAST(dmax - dmin AS DOUBLE) / sqrt(CAST(rad AS DOUBLE)) AS rs " +
          "FROM d WHERE rad > 0), " +
          "aw AS (SELECT event_type, w, " +
          "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
          "list(rs ORDER BY grp)), (acc, x) -> acc + x) / " +
          "CAST(count(*) AS DOUBLE) AS avg_rs FROM rs GROUP BY 1, 2), " +
          "np AS (SELECT event_type, CAST(count(*) AS BIGINT) " +
          "AS n_points FROM h GROUP BY 1), " +
          "piv AS (SELECT event_type, " +
          "max(CASE WHEN w = 8 THEN avg_rs END) AS rs8, " +
          "max(CASE WHEN w = 16 THEN avg_rs END) AS rs16, " +
          "max(CASE WHEN w = 32 THEN avg_rs END) AS rs32 FROM aw " +
          "GROUP BY 1) " +
          "SELECT np.event_type, n_points, rs8, rs16, rs32, " +
          "CASE WHEN rs8 IS NULL OR rs32 IS NULL OR rs8 <= 0.0 OR " +
          "rs32 <= 0.0 THEN NULL ELSE (ln(rs32) - ln(rs8)) / " +
          "(2.0 * ln(2.0)) END AS hurst " +
          "FROM np LEFT JOIN piv USING (event_type)"),
      "graph_katz" ->
        ("WITH le AS (SELECT DISTINCT CAST(l_partkey * 2 AS BIGINT) AS src, " +
          "CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst FROM lineitem), " +
          "e AS (SELECT src, dst FROM le UNION SELECT dst, src FROM le), " +
          graft.functions.OracleSql.katzCtes(iters = 3) +
          " SELECT node, katz_q FROM kz3"),
      "ts_perm_entropy" ->
        ("WITH h AS (SELECT event_type, " +
          "epoch_us(ts) // 3600000000 AS hr, " +
          "sum(CAST(floor(value * 1024.0) AS BIGINT)) AS hx " +
          "FROM events GROUP BY 1, 2), " +
          "l AS (SELECT event_type, hx, " +
          "lag(hx, 2) OVER w AS x1, lag(hx, 1) OVER w AS x2 FROM h " +
          "WINDOW w AS (PARTITION BY event_type ORDER BY hr)), " +
          "p AS (SELECT event_type, " +
          "(CASE WHEN x1 <= x2 THEN 4 ELSE 0 END + " +
          "CASE WHEN x2 <= hx THEN 2 ELSE 0 END + " +
          "CASE WHEN x1 <= hx THEN 1 ELSE 0 END) AS cc " +
          "FROM l WHERE x1 IS NOT NULL), " +
          "c AS (SELECT event_type, cc, count(*) AS k FROM p " +
          "GROUP BY 1, 2), " +
          "pk AS (SELECT event_type, " +
          "list_sort(list(struct_pack(c := CAST(cc AS BIGINT), " +
          "k := k))) AS cs, " +
          "CAST(sum(k) AS BIGINT) AS n_rows, " +
          "CAST(count(*) AS BIGINT) AS n_categories FROM c " +
          "GROUP BY event_type) " +
          "SELECT event_type, n_rows, n_categories, " +
          "round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
          "list_transform(cs, x -> " +
          "-(CAST(x.k AS DOUBLE) / CAST(n_rows AS DOUBLE)) * " +
          "ln(CAST(x.k AS DOUBLE) / CAST(n_rows AS DOUBLE)))), " +
          "(a, b) -> a + b), 8) AS entropy FROM pk"),
      "ts_granger" -> {
        // Mirrors TimeSeries.grangerPairs term-for-term: exact HUGEINT
        // moments, then the identical IEEE tree for the Cramer solve,
        // both RSS values, and the incremental F.
        val nn = "CAST(n AS DOUBLE)"
        def dv(c: String) = s"CAST($c AS DOUBLE)"
        val (sy, sl, sx) = (dv("sy"), dv("sl"), dv("sx"))
        val (syy, sll, sxx) = (dv("syy"), dv("sll"), dv("sxx"))
        val (syl, syx, slx) = (dv("syl"), dv("syx"), dv("slx"))
        val denR = s"($nn * $sll - $sl * $sl)"
        val aR = s"(($nn * $syl - $sl * $sy) / $denR)"
        val cR = s"(($sy - $aR * $sl) / $nn)"
        val rssR = s"($syy - ($cR * $sy + $aR * $syl))"
        val det = s"($nn * ($sll * $sxx - $slx * $slx) - " +
          s"$sl * ($sl * $sxx - $slx * $sx) + " +
          s"$sx * ($sl * $slx - $sll * $sx))"
        val detC = s"($sy * ($sll * $sxx - $slx * $slx) - " +
          s"$sl * ($syl * $sxx - $slx * $syx) + " +
          s"$sx * ($syl * $slx - $sll * $syx))"
        val detA = s"($nn * ($syl * $sxx - $syx * $slx) - " +
          s"$sy * ($sl * $sxx - $slx * $sx) + " +
          s"$sx * ($sl * $syx - $syl * $sx))"
        val detB = s"($nn * ($sll * $syx - $slx * $syl) - " +
          s"$sl * ($sl * $syx - $sx * $syl) + " +
          s"$sy * ($sl * $slx - $sll * $sx))"
        val rssU = s"($syy - ($detC * $sy + $detA * $syl + " +
          s"$detB * $syx) / $det)"
        val f = s"((($rssR - $rssU) * ($nn - 3.0)) / $rssU)"
        "WITH q AS (SELECT event_type AS g, " +
          "epoch_us(ts) // 86400000000 AS d, " +
          "coalesce(CAST(floor(value) AS BIGINT), 0) AS qv FROM events), " +
          "daily AS (SELECT g, d, CAST(sum(qv) AS BIGINT) AS dq " +
          "FROM q GROUP BY 1, 2), " +
          "p AS (SELECT a.g AS cause, b.g AS effect, a.d, " +
          "a.dq AS qx, b.dq AS qy FROM daily a JOIN daily b USING (d) " +
          "WHERE a.g <> b.g), " +
          "r AS (SELECT cause, effect, qy AS y, lag(qy) OVER w AS yl, " +
          "lag(qx) OVER w AS xl FROM p " +
          "WINDOW w AS (PARTITION BY cause, effect ORDER BY d)), " +
          "rr AS (SELECT * FROM r WHERE yl IS NOT NULL), " +
          "m AS (SELECT cause, effect, CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(y) AS BIGINT) AS sy, CAST(sum(yl) AS BIGINT) AS sl, " +
          "CAST(sum(xl) AS BIGINT) AS sx, " +
          "sum(CAST(y AS HUGEINT) * y) AS syy, " +
          "sum(CAST(yl AS HUGEINT) * yl) AS sll, " +
          "sum(CAST(xl AS HUGEINT) * xl) AS sxx, " +
          "sum(CAST(y AS HUGEINT) * yl) AS syl, " +
          "sum(CAST(y AS HUGEINT) * xl) AS syx, " +
          "sum(CAST(yl AS HUGEINT) * xl) AS slx FROM rr GROUP BY 1, 2) " +
          "SELECT cause, effect, n, " +
          "CASE WHEN n >= 4 THEN " +
          s"CASE WHEN $denR <> 0.0 AND $det <> 0.0 THEN " +
          s"CASE WHEN $rssU > 0.0 THEN $f END END END AS f_stat FROM m"
      },
      "ts_dtw" -> {
        // Same fixed 32-bucket series, same exact min-plus DP — DuckDB
        // folds row-wise (list accumulator; the STRUCT-accumulator
        // vectorization hazard does not apply) while Spark folds the
        // identical integers, so the results agree exactly.
        val k = 32
        val inf = 1152921504606846976L
        val init = (0L +: Seq.fill(k)(inf)).mkString("[", ", ", "]")
        val dp =
          s"list_extract(list_reduce(list_prepend(CAST($init AS BIGINT[]), " +
            "list_transform(a, x -> [x])), " +
            s"(p, ax) -> list_reduce(list_prepend(CAST([$inf] AS BIGINT[]), " +
            s"list_transform(range(1, ${k + 1}), j -> [CAST(j AS BIGINT)])), " +
            "(c, jx) -> list_append(c, " +
            "abs(list_extract(ax, 1) - list_extract(b, list_extract(jx, 1))) + " +
            "least(list_extract(p, list_extract(jx, 1)), " +
            "list_extract(p, list_extract(jx, 1) + 1), " +
            s"list_extract(c, list_extract(jx, 1)))))), ${k + 1})"
        "WITH q AS (SELECT event_type AS g, " +
          "epoch_us(ts) // 86400000000 AS d, " +
          "coalesce(CAST(floor(value * 1024.0) AS BIGINT), 0) AS qv " +
          "FROM events), " +
          "mn AS (SELECT min(d) AS mind FROM q), " +
          s"s AS (SELECT g, least(d - mind, ${k - 1}) AS bkt, " +
          "CAST(sum(qv) AS BIGINT) AS sv FROM q, mn GROUP BY 1, 2), " +
          "gs AS (SELECT DISTINCT g FROM q), " +
          s"grid AS (SELECT gs.g, ii.i FROM gs CROSS JOIN " +
          s"(SELECT unnest(range(0, $k)) AS i) ii), " +
          "filled AS (SELECT grid.g, grid.i, coalesce(s.sv, 0) AS v " +
          "FROM grid LEFT JOIN s ON s.g = grid.g AND s.bkt = grid.i), " +
          "ser AS (SELECT g, list(v ORDER BY i) AS arr FROM filled " +
          "GROUP BY g), " +
          "pr AS (SELECT x.g AS type_a, y.g AS type_b, x.arr AS a, " +
          "y.arr AS b FROM ser x JOIN ser y ON x.g < y.g) " +
          s"SELECT type_a, type_b, CAST($dp AS BIGINT) AS dtw_q, " +
          s"CAST($dp AS DOUBLE) / 1024.0 AS dtw FROM pr"
      },

      // Closed-form ring geometry: ecc(root) = diameter = floor(L/2);
      // the peripheral node is the antipode at sorted position
      // floor(L/2) (for odd L the two antipodes tie at (L-1)/2 hops
      // and the smaller id — the lower position — wins).
      "graph_diameter" ->
        ("WITH k AS (SELECT doc_id AS n, doc_id // 8 AS g " +
          "FROM documents WHERE NOT (doc_id % 8 = 7 " +
          "AND (doc_id // 8) % 2 = 0)), " +
          "r AS (SELECT n, g, CAST(row_number() OVER (PARTITION BY g " +
          "ORDER BY n) - 1 AS BIGINT) AS pos, " +
          "CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS l, " +
          "min(n) OVER (PARTITION BY g) AS root FROM k) " +
          "SELECT root AS component, l // 2 AS ecc_root, " +
          "n AS peripheral_node, l // 2 AS diameter_lb " +
          "FROM r WHERE l >= 2 AND pos = l // 2"),

      // Closed-form MST of each ring: a cycle's unique MST under the
      // (w, a, b) total order is ALL edges minus the maximum one; a
      // 2-node ring is a single edge (nothing excluded). Derived
      // without running Boruvka — the engine's contraction fixpoint is
      // cross-checked edge-for-edge.
      "graph_mst" ->
        ("WITH k AS (SELECT doc_id AS n, doc_id // 8 AS g " +
          "FROM documents WHERE NOT (doc_id % 8 = 7 " +
          "AND (doc_id // 8) % 2 = 0)), " +
          "r AS (SELECT n, g, CAST(row_number() OVER (PARTITION BY g " +
          "ORDER BY n) - 1 AS BIGINT) AS pos, " +
          "CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS l FROM k), " +
          "p2 AS (SELECT * FROM r WHERE l >= 2), " +
          "ed0 AS (SELECT a.g, a.l, least(a.n, b.n) AS a, " +
          "greatest(a.n, b.n) AS b FROM p2 a JOIN p2 b " +
          "ON a.g = b.g AND b.pos = a.pos + 1 " +
          "UNION ALL SELECT a.g, a.l, least(a.n, b.n), " +
          "greatest(a.n, b.n) FROM p2 a JOIN p2 b " +
          "ON a.g = b.g AND a.pos = a.l - 1 AND b.pos = 0 AND a.l > 2), " +
          "ed AS (SELECT DISTINCT g, l, a, b, " +
          "1 + (31 * a + 17 * b) % 97 AS w FROM ed0), " +
          "x AS (SELECT g, l, a, b, w, row_number() OVER (" +
          "PARTITION BY g ORDER BY w DESC, a DESC, b DESC) AS rn " +
          "FROM ed) " +
          "SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b, " +
          "CAST(w AS BIGINT) AS w FROM x WHERE l = 2 OR rn > 1"),

      // Closed-form ring replay: dist from the ring's min node is
      // least(pos, L - pos) (pos = sorted rank), parity mod 2, the
      // single possible odd edge surfaces where consecutive-or-wrap
      // positions share parity — derived WITHOUT running CC or BFS,
      // so it cross-checks the engine's two fixpoints end-to-end.
      "graph_bipartite" ->
        ("WITH k AS (SELECT doc_id AS n, doc_id // 8 AS g " +
          "FROM documents WHERE NOT (doc_id % 8 = 7 " +
          "AND (doc_id // 8) % 2 = 0)), " +
          "r AS (SELECT n, g, CAST(row_number() OVER (PARTITION BY g " +
          "ORDER BY n) - 1 AS BIGINT) AS pos, " +
          "CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS l, " +
          "min(n) OVER (PARTITION BY g) AS root FROM k), " +
          "p AS (SELECT g, root, l, n, pos, " +
          "least(pos, l - pos) % 2 AS par FROM r WHERE l >= 2), " +
          "ed AS (SELECT a.g, a.par AS pa, b.par AS pb FROM p a " +
          "JOIN p b ON a.g = b.g AND b.pos = a.pos + 1 " +
          "UNION ALL SELECT a.g, a.par, b.par FROM p a JOIN p b " +
          "ON a.g = b.g AND a.pos = a.l - 1 AND b.pos = 0 AND a.l > 2), " +
          "oe AS (SELECT g, CAST(count(*) FILTER (WHERE pa = pb) " +
          "AS BIGINT) AS odd_edges FROM ed GROUP BY g), " +
          "agg AS (SELECT g, root AS component, l AS n_nodes, " +
          "CAST(count(*) FILTER (WHERE par = 0) AS BIGINT) AS n_even, " +
          "CAST(count(*) FILTER (WHERE par = 1) AS BIGINT) AS n_odd, " +
          "CAST(0 AS BIGINT) AS n_unreached FROM p " +
          "GROUP BY g, root, l) " +
          "SELECT component, n_nodes, n_even, n_odd, n_unreached, " +
          "coalesce(oe.odd_edges, 0) AS odd_edges, " +
          "coalesce(oe.odd_edges, 0) = 0 AS is_bipartite " +
          "FROM agg LEFT JOIN oe USING (g)"),

      // Independent replay of the all-pairs subsequence scan: same
      // daily integer series, windows via list_slice, per-pair squared
      // Euclidean over a positional list_transform, deterministic
      // rank-1 pick (ORDER BY dist, j) — no struct-accumulator fold.
      "ts_matrix_profile" -> {
        val m = 7
        val dist = s"list_sum(list_transform(range(1, ${m + 1}), t -> " +
          "(a.v[CAST(t AS INT)] - b.v[CAST(t AS INT)]) * " +
          "(a.v[CAST(t AS INT)] - b.v[CAST(t AS INT)])))"
        "WITH q AS (SELECT event_type AS g, " +
          "epoch_us(ts) // 86400000000 AS d, " +
          "coalesce(CAST(floor(value * 1024.0) AS BIGINT), 0) AS qv " +
          "FROM events), " +
          "s AS (SELECT g, d, CAST(sum(qv) AS BIGINT) AS x FROM q " +
          "GROUP BY 1, 2), " +
          "ser AS (SELECT g, list(x ORDER BY d) AS xs FROM s GROUP BY g), " +
          s"w AS (SELECT g, unnest(range(0, len(xs) - $m + 1)) AS i, " +
          "xs FROM ser), " +
          s"v AS (SELECT g, i, list_slice(xs, CAST(i + 1 AS INT), " +
          s"CAST(i + $m AS INT)) AS v FROM w), " +
          "p AS (SELECT a.g AS g, a.i AS i, b.i AS j, " +
          s"CAST($dist AS BIGINT) AS dist " +
          s"FROM v a JOIN v b ON a.g = b.g AND abs(a.i - b.i) >= $m), " +
          "r AS (SELECT g, i, j, dist, row_number() OVER (" +
          "PARTITION BY g, i ORDER BY dist, j) AS rn FROM p) " +
          "SELECT g AS event_type, CAST(i AS BIGINT) AS i, " +
          "CAST(j AS BIGINT) AS nn_j, dist AS mp_dist FROM r WHERE rn = 1"
      },
      "ts_croston" ->
        // Recursive-CTE replay of the dyadic fold: same /2.0 halving
        // order, q born at the second demand's gap (kalman discipline:
        // state expressions duplicated textually).
        ("WITH RECURSIVE g AS (SELECT event_type, " +
          "epoch_us(ts) // 86400000000 AS day, " +
          "CAST(count(*) AS DOUBLE) AS d FROM events " +
          "WHERE value > 300 GROUP BY 1, 2), " +
          "s AS (SELECT event_type, day, d, row_number() OVER (" +
          "PARTITION BY event_type ORDER BY day) AS i FROM g), " +
          "nn AS (SELECT event_type, CAST(count(*) AS BIGINT) " +
          "AS n_nonzero FROM g GROUP BY 1), " +
          "mx AS (SELECT event_type, max(i) AS mi FROM s GROUP BY 1), " +
          "rec AS (SELECT event_type, i, d AS z, " +
          "CAST(NULL AS DOUBLE) AS q, day AS last FROM s WHERE i = 1 " +
          "UNION ALL " +
          "SELECT s.event_type, s.i, r.z / 2.0 + s.d / 2.0 AS z, " +
          "CASE WHEN r.q IS NULL THEN CAST(s.day - r.last AS DOUBLE) " +
          "ELSE r.q / 2.0 + CAST(s.day - r.last AS DOUBLE) / 2.0 END AS q, " +
          "s.day AS last FROM rec r JOIN s " +
          "ON s.event_type = r.event_type AND s.i = r.i + 1) " +
          "SELECT r.event_type, nn.n_nonzero, r.z AS z_final, " +
          "r.q AS q_final, r.z / r.q AS croston_forecast " +
          "FROM rec r JOIN nn ON nn.event_type = r.event_type " +
          "JOIN mx ON mx.event_type = r.event_type AND r.i = mx.mi"),
      "ts_chatterjee_xi" ->
        ("WITH g AS (SELECT event_type, epoch_us(ts) // 86400000000 AS d, " +
          "CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS y " +
          "FROM events GROUP BY 1, 2), " +
          "r AS (SELECT event_type, d, row_number() OVER (" +
          "PARTITION BY event_type ORDER BY y, d) AS rk FROM g), " +
          "dd AS (SELECT event_type, abs(rk - lag(rk) OVER (" +
          "PARTITION BY event_type ORDER BY d)) AS dr FROM r) " +
          "SELECT event_type, CAST(count(*) AS BIGINT) AS n_points, " +
          "CAST(count(*) * count(*) - 1 - 3 * sum(dr) AS BIGINT) AS xi_num, " +
          "CAST(count(*) * count(*) - 1 AS BIGINT) AS xi_den " +
          "FROM dd GROUP BY event_type"),
      "ts_durbin_watson" ->
        ("WITH g AS (SELECT event_type, epoch_us(ts) // 86400000000 AS d, " +
          "CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS y " +
          "FROM events GROUP BY 1, 2), " +
          "dd AS (SELECT event_type, y, y - lag(y) OVER (" +
          "PARTITION BY event_type ORDER BY d) AS dy FROM g) " +
          "SELECT event_type, CAST(count(*) AS BIGINT) AS n_points, " +
          "CAST(count(*) * count(*) * sum(dy * dy) AS BIGINT) AS dw_num, " +
          "CAST(count(*) * count(*) * sum(y * y) - " +
          "count(*) * sum(y) * sum(y) AS BIGINT) AS dw_den " +
          "FROM dd GROUP BY event_type"),
      "ts_sample_entropy" ->
        ("WITH g AS (SELECT event_type, epoch_us(ts) // 86400000000 AS d, " +
          "CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1, 2), " +
          "tol AS (SELECT event_type, (max(x) - min(x)) // 6 AS r " +
          "FROM g GROUP BY 1), " +
          "s AS (SELECT event_type, row_number() OVER (" +
          "PARTITION BY event_type ORDER BY d) AS i, x AS x0, " +
          "lead(x, 1) OVER (PARTITION BY event_type ORDER BY d) AS x1, " +
          "lead(x, 2) OVER (PARTITION BY event_type ORDER BY d) AS x2 " +
          "FROM g), " +
          "tm AS (SELECT * FROM s WHERE x2 IS NOT NULL), " +
          "p AS (SELECT a.event_type AS et, " +
          "CASE WHEN greatest(abs(a.x0 - b.x0), abs(a.x1 - b.x1)) <= t.r " +
          "THEN 1 ELSE 0 END AS bm, " +
          "CASE WHEN greatest(abs(a.x0 - b.x0), abs(a.x1 - b.x1), " +
          "abs(a.x2 - b.x2)) <= t.r THEN 1 ELSE 0 END AS am " +
          "FROM tm a JOIN tm b ON a.event_type = b.event_type " +
          "AND b.i > a.i JOIN tol t ON t.event_type = a.event_type) " +
          "SELECT et AS event_type, CAST(sum(bm) AS BIGINT) AS b_count, " +
          "CAST(sum(am) AS BIGINT) AS a_count, " +
          "CAST(count(*) AS BIGINT) AS n_pairs FROM p GROUP BY et"),
      "ts_decompose" -> tsDecomposeSql,
      "ts_strength" ->
        // Quantize the fixed-shape decomposition doubles, then the
        // variance ratios are exact-integer (scale cancels).
        (s"WITH dc AS ($tsDecomposeSql), " +
          "qz AS (SELECT event_type, " +
          "CAST(floor(resid * 1048576.0) AS BIGINT) AS r, " +
          "CAST(floor((trend + resid) * 1048576.0) AS BIGINT) AS tr, " +
          "CAST(floor((seasonal + resid) * 1048576.0) AS BIGINT) AS sr " +
          "FROM dc), " +
          "m AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n, " +
          "CAST(sum(r) AS HUGEINT) AS s_r, " +
          "sum(CAST(r AS HUGEINT) * r) AS q_r, " +
          "CAST(sum(tr) AS HUGEINT) AS s_tr, " +
          "sum(CAST(tr AS HUGEINT) * tr) AS q_tr, " +
          "CAST(sum(sr) AS HUGEINT) AS s_sr, " +
          "sum(CAST(sr AS HUGEINT) * sr) AS q_sr FROM qz " +
          "GROUP BY event_type) " +
          "SELECT event_type, CAST(n AS BIGINT) AS n, " +
          "CASE WHEN n * q_tr - s_tr * s_tr <= 0 THEN NULL ELSE " +
          "greatest(0.0, 1.0 - CAST(n * q_r - s_r * s_r AS DOUBLE) / " +
          "CAST(n * q_tr - s_tr * s_tr AS DOUBLE)) END AS f_trend, " +
          "CASE WHEN n * q_sr - s_sr * s_sr <= 0 THEN NULL ELSE " +
          "greatest(0.0, 1.0 - CAST(n * q_r - s_r * s_r AS DOUBLE) / " +
          "CAST(n * q_sr - s_sr * s_sr AS DOUBLE)) END AS f_seasonal " +
          "FROM m"),
      "ts_resid_anomaly" ->
        (s"WITH dc AS ($tsDecomposeSql), " +
          "qraw AS (SELECT event_type, abs(resid) AS x FROM dc), " +
          OracleSql.quantileSketchCtes(Seq(99), Seq("event_type")) +
          ", thr AS (SELECT event_type, est AS p99_abs_resid FROM qest " +
          "WHERE pct = 99) " +
          "SELECT dc.event_type, hr, resid, p99_abs_resid " +
          "FROM dc JOIN thr ON dc.event_type = thr.event_type " +
          "WHERE abs(resid) > p99_abs_resid"),
      "ts_rolling_mad" ->
        ("WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr, " +
          "CAST(sum(CAST(floor(value * 1024.0) AS BIGINT)) AS BIGINT) " +
          "AS hx FROM events GROUP BY 1, 2), " +
          "l AS (SELECT event_type, hr, hx, list(hx) OVER (" +
          "PARTITION BY event_type ORDER BY hr " +
          "ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS lw FROM h), " +
          "m AS (SELECT event_type, hr, hx, " +
          "CAST(len(lw) AS BIGINT) AS n_win, " +
          "list_sort(lw)[(len(lw) + 1) // 2] AS med, lw FROM l), " +
          "md AS (SELECT event_type, hr, hx, n_win, med, " +
          "list_sort(list_transform(lw, x -> abs(x - med)))" +
          "[(len(lw) + 1) // 2] AS mad FROM m) " +
          "SELECT event_type, hr, hx, n_win, med, mad, " +
          "abs(hx - med) > 3 * mad AS is_anomaly FROM md"),
      "graph_rich_club" ->
        ("WITH pp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p " +
          "FROM lineitem WHERE l_partkey % 4 = 0), " +
          "e0 AS (SELECT x.p AS a, y.p AS b FROM pp x JOIN pp y " +
          "ON x.o = y.o AND x.p < y.p), " +
          "und AS (SELECT DISTINCT a, b FROM e0), " +
          "adj AS (SELECT a AS m FROM und UNION ALL SELECT b FROM und), " +
          "deg AS (SELECT m, CAST(count(*) AS BIGINT) AS d " +
          "FROM adj GROUP BY 1), " +
          "ks AS (SELECT unnest(range(1, 9)) AS k), " +
          "nk AS (SELECT k, CAST(sum(CASE WHEN d > k THEN 1 ELSE 0 END) " +
          "AS BIGINT) AS n_nodes FROM ks CROSS JOIN deg GROUP BY k), " +
          "wd AS (SELECT und.a, und.b, da.d AS da, db.d AS db FROM und " +
          "JOIN deg da ON da.m = und.a JOIN deg db ON db.m = und.b), " +
          "ek AS (SELECT k, CAST(sum(CASE WHEN da > k AND db > k " +
          "THEN 1 ELSE 0 END) AS BIGINT) AS n_edges " +
          "FROM ks CROSS JOIN wd GROUP BY k) " +
          "SELECT CAST(nk.k AS BIGINT) AS k, nk.n_nodes, ek.n_edges, " +
          "CAST(2 * ek.n_edges AS BIGINT) AS phi_num, " +
          "CAST(nk.n_nodes * (nk.n_nodes - 1) AS BIGINT) AS phi_den " +
          "FROM nk JOIN ek ON nk.k = ek.k"),
      "graph_jaccard_links" ->
        ("WITH pp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p " +
          "FROM lineitem WHERE l_partkey % 4 = 0), " +
          "e0 AS (SELECT x.p AS a, y.p AS b FROM pp x JOIN pp y " +
          "ON x.o = y.o AND x.p < y.p), " +
          "und AS (SELECT DISTINCT a, b FROM (SELECT a, b FROM e0 " +
          "UNION ALL SELECT b AS a, a AS b FROM e0) WHERE a < b), " +
          "adj AS (SELECT a AS m, b AS n FROM und " +
          "UNION ALL SELECT b AS m, a AS n FROM und), " +
          "deg AS (SELECT m, count(*) AS d FROM adj GROUP BY 1), " +
          "w AS (SELECT x.n AS na, y.n AS nb FROM adj x JOIN adj y " +
          "ON x.m = y.m AND x.n < y.n), " +
          "cn AS (SELECT na, nb, count(*) AS n_common FROM w " +
          "GROUP BY 1, 2 HAVING count(*) >= 3), " +
          "ne AS (SELECT cn.na, cn.nb, cn.n_common FROM cn " +
          "LEFT JOIN und ON cn.na = und.a AND cn.nb = und.b " +
          "WHERE und.a IS NULL) " +
          "SELECT ne.na AS node_a, ne.nb AS node_b, ne.n_common, " +
          "da.d AS deg_a, db.d AS deg_b, " +
          "CAST(ne.n_common AS DOUBLE) / " +
          "CAST(da.d + db.d - ne.n_common AS DOUBLE) AS jaccard " +
          "FROM ne JOIN deg da ON ne.na = da.m " +
          "JOIN deg db ON ne.nb = db.m"),
      "graph_adamic_adar" ->
        // Same graph as graph_jaccard_links; per-pair SORTED common-
        // neighbor degree list folded 1/ln(d), round 8 (libm ln).
        ("WITH pp AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p " +
          "FROM lineitem WHERE l_partkey % 4 = 0), " +
          "e0 AS (SELECT x.p AS a, y.p AS b FROM pp x JOIN pp y " +
          "ON x.o = y.o AND x.p < y.p), " +
          "und AS (SELECT DISTINCT a, b FROM (SELECT a, b FROM e0 " +
          "UNION ALL SELECT b AS a, a AS b FROM e0) WHERE a < b), " +
          "adj AS (SELECT a AS m, b AS n FROM und " +
          "UNION ALL SELECT b AS m, a AS n FROM und), " +
          "deg AS (SELECT m, CAST(count(*) AS BIGINT) AS d FROM adj " +
          "GROUP BY 1), " +
          "w AS (SELECT x.n AS na, y.n AS nb, dg.d AS dm " +
          "FROM adj x JOIN adj y ON x.m = y.m AND x.n < y.n " +
          "JOIN deg dg ON dg.m = x.m), " +
          "cn AS (SELECT na, nb, CAST(count(*) AS BIGINT) AS n_common, " +
          "list(dm ORDER BY dm) AS ds FROM w GROUP BY 1, 2 " +
          "HAVING count(*) >= 3), " +
          "ne AS (SELECT cn.na, cn.nb, cn.n_common, cn.ds FROM cn " +
          "LEFT JOIN und ON cn.na = und.a AND cn.nb = und.b " +
          "WHERE und.a IS NULL) " +
          "SELECT na AS node_a, nb AS node_b, n_common, " +
          "round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
          "list_transform(ds, d -> 1.0 / ln(CAST(d AS DOUBLE)))), " +
          "(p, x) -> p + x), 8) AS aa FROM ne"),
      "ts_bollinger" ->
        ("WITH h AS (SELECT event_type, " +
          "epoch_us(ts) // 3600000000 AS hr, " +
          "CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS hx " +
          "FROM events GROUP BY 1, 2), " +
          "hn AS (SELECT * FROM h WHERE hx IS NOT NULL), " +
          "w AS (SELECT event_type, hr, hx, " +
          "CAST(count(*) OVER fr AS BIGINT) AS n, " +
          "CAST(sum(hx) OVER fr AS BIGINT) AS sx, " +
          "CAST(sum(hx * hx) OVER fr AS BIGINT) AS sxx FROM hn " +
          "WINDOW fr AS (PARTITION BY event_type ORDER BY hr " +
          "ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)), " +
          "c AS (SELECT event_type, hr, hx, n, " +
          "CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mid, " +
          "sqrt(CAST(n * sxx - sx * sx AS DOUBLE) / " +
          "(CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS sig FROM w) " +
          "SELECT event_type, hr, hx AS x, n AS n_window, " +
          "CASE WHEN n < 24 THEN NULL ELSE mid END AS mid, " +
          "CASE WHEN n < 24 THEN NULL ELSE mid - 2.0 * sig END AS lo, " +
          "CASE WHEN n < 24 THEN NULL ELSE mid + 2.0 * sig END AS hi, " +
          "CASE WHEN n < 24 THEN NULL ELSE " +
          "CAST(hx AS DOUBLE) < mid - 2.0 * sig OR " +
          "CAST(hx AS DOUBLE) > mid + 2.0 * sig END AS breach FROM c"),
      "ts_crosscorr" ->
        ("WITH hr AS (SELECT epoch_us(ts) // 3600000000 AS h, " +
          "CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) " +
          "AS BIGINT) AS x, " +
          "CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) " +
          "AS BIGINT) AS y FROM events GROUP BY 1), " +
          "b AS (SELECT x, y, row_number() OVER (ORDER BY h) AS i FROM hr), " +
          "lg AS (SELECT unnest(range(0, 7)) AS lag), " +
          "p AS (SELECT lg.lag, CAST(h2.x AS HUGEINT) AS xd, " +
          "CAST(t2.y AS HUGEINT) AS yd FROM b h2 CROSS JOIN lg " +
          "JOIN b t2 ON t2.i = h2.i + lg.lag), " +
          "m AS (SELECT lag, CAST(count(*) AS HUGEINT) AS m, " +
          "sum(xd) AS sx, sum(yd) AS sy, sum(xd * yd) AS sxy, " +
          "sum(xd * xd) AS sxx, sum(yd * yd) AS syy FROM p GROUP BY 1) " +
          "SELECT CAST(lag AS BIGINT) AS lag, CAST(m AS BIGINT) " +
          "AS n_pairs, CASE WHEN m * sxx - sx * sx <= 0 " +
          "OR m * syy - sy * sy <= 0 THEN NULL ELSE " +
          "CAST(m * sxy - sx * sy AS DOUBLE) / " +
          "sqrt(CAST(m * sxx - sx * sx AS DOUBLE) * " +
          "CAST(m * syy - sy * sy AS DOUBLE)) END AS xcorr FROM m"),
      "ts_snaive_mase" ->
        ("WITH hr AS (SELECT event_type, epoch_us(ts) // 3600000000 AS h, " +
          "coalesce(CAST(floor(value * 100.0) AS BIGINT), 0) AS c " +
          "FROM events), " +
          "g AS (SELECT event_type, h, CAST(sum(c) AS BIGINT) AS vq " +
          "FROM hr GROUP BY 1, 2), " +
          "mx AS (SELECT max(h) AS m FROM g), " +
          "b AS (SELECT g.*, (h > (SELECT m FROM mx) - 24) AS ist FROM g), " +
          "tst AS (SELECT event_type, h, vq FROM b WHERE ist), " +
          "hist AS (SELECT event_type, h, vq FROM b WHERE NOT ist), " +
          "fc AS (SELECT t2.event_type, abs(t2.vq - f.vq) AS e " +
          "FROM tst t2 JOIN hist f ON f.event_type = t2.event_type " +
          "AND f.h + 168 = t2.h), " +
          "er AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_test, " +
          "CAST(sum(e) AS BIGINT) AS sum_abs_err_q FROM fc GROUP BY 1), " +
          "nv AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_naive, " +
          "CAST(sum(d) AS BIGINT) AS sum_naive_q FROM (" +
          "SELECT event_type, abs(vq - lag(vq) OVER (" +
          "PARTITION BY event_type ORDER BY h)) AS d FROM hist) " +
          "WHERE d IS NOT NULL GROUP BY 1) " +
          "SELECT er.event_type, n_test, sum_abs_err_q, n_naive, " +
          "sum_naive_q, CASE WHEN n_test = 0 OR n_naive = 0 " +
          "OR sum_naive_q = 0 THEN NULL ELSE " +
          "(CAST(sum_abs_err_q AS DOUBLE) / CAST(n_test AS DOUBLE)) / " +
          "(CAST(sum_naive_q AS DOUBLE) / CAST(n_naive AS DOUBLE)) END " +
          "AS mase FROM er JOIN nv USING (event_type)"),
      "ts_mad_outliers" ->
        ("WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr, " +
          "CAST(sum(CAST(floor(value * 1024.0) AS BIGINT)) AS BIGINT) AS hx " +
          "FROM events GROUP BY 1, 2), " +
          "m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_points, " +
          "CAST(quantile_cont(hx, 0.5) * 2 AS BIGINT) AS med_x2 " +
          "FROM h GROUP BY event_type), " +
          "d AS (SELECT h.event_type, abs(2 * hx - med_x2) AS dev_x2, " +
          "n_points, med_x2 FROM h JOIN m ON h.event_type = m.event_type), " +
          "mads AS (SELECT event_type, " +
          "CAST(quantile_cont(dev_x2, 0.5) * 2 AS BIGINT) AS mad_x4 " +
          "FROM d GROUP BY event_type) " +
          "SELECT d.event_type, CAST(max(n_points) AS BIGINT) AS n_points, " +
          "CAST(max(med_x2) AS BIGINT) AS med_x2, " +
          "CAST(max(mad_x4) AS BIGINT) AS mad_x4, " +
          "CAST(sum(CASE WHEN 2 * dev_x2 > mad_x4 * 3 " +
          "THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers, " +
          "CAST(max(dev_x2) AS BIGINT) AS max_dev_x2 " +
          "FROM d JOIN mads ON d.event_type = mads.event_type " +
          "GROUP BY d.event_type"),

      "ts_cusum" ->
        ("WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr, " +
          "CAST(sum(CAST(floor(value * 1024.0) AS BIGINT)) AS BIGINT) AS hx " +
          "FROM events GROUP BY 1, 2), " +
          "sc AS (SELECT event_type, hr, " +
          "CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n, " +
          "CAST(sum(hx) OVER (PARTITION BY event_type) AS BIGINT) AS s, " +
          "CAST(row_number() OVER (PARTITION BY event_type ORDER BY hr) " +
          "AS BIGINT) AS i, " +
          "CAST(sum(hx) OVER (PARTITION BY event_type ORDER BY hr " +
          "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pfx FROM h), " +
          "c AS (SELECT event_type, hr, n, " +
          "n * pfx - i * s AS cusum FROM sc) " +
          "SELECT event_type, n AS n_points, hr AS cp_ord, " +
          "cusum AS cusum_at_cp, " +
          "CAST(abs(cusum) AS DOUBLE) / CAST(n AS DOUBLE) " +
          "AS mean_shift_score FROM (" +
          "SELECT *, row_number() OVER (PARTITION BY event_type " +
          "ORDER BY abs(cusum) DESC, hr ASC) AS rn FROM c) WHERE rn = 1"),
      "ts_holt" ->
        // Replayed as a RECURSIVE CTE, one lockstep step per series
        // position, NOT list_reduce: DuckDB's list_reduce mis-evaluates
        // a multi-field struct accumulator whose later fields
        // re-reference earlier accumulator fields once the fold is ≥ 2
        // steps deep (observed empirically: step-1 result and
        // single-field folds are fine; the packed-BIGINT jaro fold never
        // hit it because its fields only reference themselves). The
        // repeated new-level subexpression inside the trend term is
        // duplicated identically to the engine's fold.
        ("WITH RECURSIVE sr AS (" +
          "SELECT event_type, CAST(hx AS DOUBLE) AS x, " +
          "row_number() OVER (PARTITION BY event_type ORDER BY hr) AS i " +
          "FROM (SELECT event_type, epoch_us(ts) // 3600000000 AS hr, " +
          "CAST(sum(CAST(floor(value * 1024.0) AS BIGINT)) AS BIGINT) " +
          "AS hx FROM events GROUP BY 1, 2)), " +
          "rec AS (" +
          "SELECT event_type, i, x AS l, CAST(0.0 AS DOUBLE) AS tr " +
          "FROM sr WHERE i = 1 " +
          "UNION ALL " +
          "SELECT s.event_type, s.i, " +
          "0.5 * s.x + 0.5 * (r.l + r.tr) AS l, " +
          "0.25 * ((0.5 * s.x + 0.5 * (r.l + r.tr)) - r.l) + " +
          "0.75 * r.tr AS tr " +
          "FROM rec r JOIN sr s ON s.event_type = r.event_type " +
          "AND s.i = r.i + 1), " +
          "fin AS (SELECT event_type, i, l, tr, " +
          "row_number() OVER (PARTITION BY event_type ORDER BY i DESC) " +
          "AS rn FROM rec) " +
          "SELECT f.event_type, CAST(f.i AS BIGINT) AS n_points, " +
          "f.l AS level, f.tr AS trend, f.l + 3.0 * f.tr AS forecast " +
          "FROM fin f WHERE rn = 1"),
      // Kalman local-level replay: lockstep recursive CTE, the gain
      // subexpression (p + q)/((p + q) + r) duplicated textually at
      // every use site exactly as the engine's fold spells it, so the
      // IEEE results match bit-for-bit.
      "ts_kalman_level" ->
        ("WITH RECURSIVE sr AS (" +
          "SELECT event_type, CAST(hx AS DOUBLE) AS x, " +
          "row_number() OVER (PARTITION BY event_type ORDER BY hr) AS i " +
          "FROM (SELECT event_type, epoch_us(ts) // 3600000000 AS hr, " +
          "CAST(sum(CAST(floor(value * 1024.0) AS BIGINT)) AS BIGINT) " +
          "AS hx FROM events GROUP BY 1, 2) WHERE hx IS NOT NULL), " +
          "rec AS (" +
          "SELECT event_type, i, x AS l, CAST(1.0 AS DOUBLE) AS p " +
          "FROM sr WHERE i = 1 " +
          "UNION ALL " +
          "SELECT s.event_type, s.i, " +
          "r.l + ((r.p + 0.25) / ((r.p + 0.25) + 2.0)) * (s.x - r.l) " +
          "AS l, " +
          "(1.0 - ((r.p + 0.25) / ((r.p + 0.25) + 2.0))) * (r.p + 0.25) " +
          "AS p " +
          "FROM rec r JOIN sr s ON s.event_type = r.event_type " +
          "AND s.i = r.i + 1), " +
          "fin AS (SELECT event_type, i, l, p, " +
          "row_number() OVER (PARTITION BY event_type ORDER BY i DESC) " +
          "AS rn FROM rec) " +
          "SELECT event_type, CAST(i AS BIGINT) AS n_points, " +
          "l AS level, p AS p_var, " +
          "(p + 0.25) / ((p + 0.25) + 2.0) AS gain FROM fin WHERE rn = 1"),
      // Holt-Winters additive replay: the 7-slot seasonal list carried
      // through the recursion, the new-level subexpression duplicated
      // at its three use sites (trend, season, level) exactly like the
      // engine's fold; smoothing constants (0.5, 0.25) chosen so the
      // complements (0.5, 0.75) are exact binary doubles on both sides.
      "ts_holt_winters" -> {
        val sOld = "r.s[CAST((s.i - 1) % 7 AS INT) + 1]"
        val newl = s"0.5 * (s.x - $sOld) + 0.5 * (r.l + r.b)"
        "WITH RECURSIVE sr AS (" +
          "SELECT event_type, CAST(hx AS DOUBLE) AS x, " +
          "row_number() OVER (PARTITION BY event_type ORDER BY d) AS i " +
          "FROM (SELECT event_type, epoch_us(ts) // 86400000000 AS d, " +
          "CAST(sum(CAST(floor(value * 1024.0) AS BIGINT)) AS BIGINT) " +
          "AS hx FROM events GROUP BY 1, 2) WHERE hx IS NOT NULL), " +
          "rec AS (" +
          "SELECT event_type, i, x AS l, CAST(0.0 AS DOUBLE) AS b, " +
          "list_transform(range(0, 7), j -> CAST(0.0 AS DOUBLE)) AS s " +
          "FROM sr WHERE i = 1 " +
          "UNION ALL " +
          s"SELECT s.event_type, s.i, $newl AS l, " +
          s"0.25 * (($newl) - r.l) + 0.75 * r.b AS b, " +
          "list_transform(range(0, 7), j -> " +
          "CASE WHEN j = (s.i - 1) % 7 " +
          s"THEN 0.25 * (s.x - ($newl)) + 0.75 * $sOld " +
          "ELSE r.s[CAST(j AS INT) + 1] END) AS s " +
          "FROM rec r JOIN sr s ON s.event_type = r.event_type " +
          "AND s.i = r.i + 1), " +
          "fin AS (SELECT event_type, i, l, b, s, " +
          "row_number() OVER (PARTITION BY event_type ORDER BY i DESC) " +
          "AS rn FROM rec) " +
          "SELECT event_type, CAST(i AS BIGINT) AS n_points, " +
          "l AS level, b AS trend, " +
          "s[CAST(i % 7 AS INT) + 1] AS s_next, " +
          "(l + b) + s[CAST(i % 7 AS INT) + 1] AS forecast " +
          "FROM fin WHERE rn = 1"
      },
      "ts_seasonal" ->
        ("WITH b AS (SELECT event_type, " +
          "(epoch_us(ts) // 3600000000) % 24 AS hod, " +
          "CAST(floor(value * 1024.0) AS BIGINT) AS qx FROM events " +
          "WHERE value IS NOT NULL), " +
          "p AS (SELECT event_type, hod, CAST(count(*) AS BIGINT) AS n_obs, " +
          "CAST(sum(qx) AS BIGINT) AS sb FROM b GROUP BY 1, 2), " +
          "t2 AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(qx) AS BIGINT) AS s FROM b GROUP BY 1) " +
          "SELECT p.event_type, p.hod, p.n_obs, " +
          "CASE WHEN t2.s <= 0 THEN NULL ELSE " +
          "CAST(p.sb * t2.n AS DOUBLE) / CAST(p.n_obs * t2.s AS DOUBLE) " +
          "END AS seasonal_idx FROM p JOIN t2 USING (event_type)"),
      "ts_dtw_kernel" ->
        // Independent DP: anti-diagonal recursive CTE carrying two
        // diagonals (cells on diagonal d depend only on d-1 and d-2 —
        // the one DP order a previous-iteration-only recursion can
        // express); out-of-range neighbors go NULL and least() skips
        // them, which IS the infinite-border DTW boundary rule.
        ("WITH RECURSIVE s AS (SELECT event_type, " +
          "epoch_us(ts) // 86400000000 AS day, count(*) AS x " +
          "FROM events GROUP BY 1, 2), " +
          "l AS (SELECT event_type AS k, " +
          "list(x ORDER BY day) AS xs FROM s GROUP BY 1), " +
          "p AS (SELECT a.k AS ka, b.k AS kb, a.xs AS la, b.xs AS lb, " +
          "len(a.xs) AS n, len(b.xs) AS m FROM l a JOIN l b ON a.k < b.k), " +
          "rec AS (SELECT ka, kb, n, m, la, lb, 2 AS d, " +
          "[abs(la[1] - lb[1])] AS diag, " +
          "CAST([] AS BIGINT[]) AS prevdiag FROM p " +
          "UNION ALL " +
          "SELECT ka, kb, n, m, la, lb, d + 1, " +
          "list_transform(range(greatest(1, d + 1 - m), least(n, d) + 1), " +
          "i -> abs(la[i] - lb[d + 1 - i]) + least(" +
          "CASE WHEN i - greatest(1, d - m) >= 1 " +
          "THEN diag[CAST(i - greatest(1, d - m) AS INT)] END, " +
          "diag[CAST(i - greatest(1, d - m) + 1 AS INT)], " +
          "CASE WHEN i - greatest(1, d - 1 - m) >= 1 " +
          "THEN prevdiag[CAST(i - greatest(1, d - 1 - m) AS INT)] END)), " +
          "diag FROM rec WHERE d < n + m) " +
          "SELECT ka AS key_a, kb AS key_b, CAST(n AS BIGINT) AS n_a, " +
          "CAST(m AS BIGINT) AS n_b, CAST(diag[1] AS BIGINT) AS dtw_cost, " +
          "CAST(diag[1] * 1000000 // (n + m) AS BIGINT) AS dtw_per_step_q " +
          "FROM rec WHERE d = n + m"),
      "ts_sax" ->
        ("WITH h AS (SELECT event_type, " +
          "epoch_us(ts) // 3600000000 AS hr, " +
          "CAST(sum(CAST(floor(value * 1024.0) AS BIGINT)) AS BIGINT) " +
          "AS hx FROM events GROUP BY 1, 2), " +
          "hn AS (SELECT * FROM h WHERE hx IS NOT NULL), " +
          "m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n, " +
          "sum(CAST(hx AS HUGEINT)) AS s, " +
          "sum(CAST(hx AS HUGEINT) * CAST(hx AS HUGEINT)) AS ss " +
          "FROM hn GROUP BY 1), " +
          "r AS (SELECT event_type, hx, row_number() OVER (" +
          "PARTITION BY event_type ORDER BY hr) - 1 AS i FROM hn), " +
          "g AS (SELECT event_type, i // 4 AS segment, " +
          "CAST(sum(hx) AS BIGINT) AS seg_sum, " +
          "CAST(count(*) AS BIGINT) AS seg_n FROM r GROUP BY 1, 2), " +
          "j AS (SELECT g.event_type, g.segment, g.seg_sum, g.seg_n, " +
          "m.n, m.s, " +
          "sqrt(CAST(m.n * m.ss - m.s * m.s AS DOUBLE) / " +
          "(CAST(m.n AS DOUBLE) * CAST(m.n AS DOUBLE))) AS sigma " +
          "FROM g JOIN m USING (event_type)) " +
          "SELECT event_type, CAST(segment AS BIGINT) AS segment, " +
          "seg_n, seg_sum, CAST(CASE " +
          "WHEN sigma = 0 THEN (CASE WHEN CAST(seg_sum AS HUGEINT) * n " +
          "<= s * seg_n THEN 1 ELSE 2 END) " +
          "WHEN CAST(seg_sum AS HUGEINT) * n < s * seg_n AND " +
          "((CAST(seg_sum AS DOUBLE) / CAST(seg_n AS DOUBLE)) - " +
          "CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) / sigma < -0.6745 " +
          "THEN 0 " +
          "WHEN CAST(seg_sum AS HUGEINT) * n <= s * seg_n THEN 1 " +
          "WHEN ((CAST(seg_sum AS DOUBLE) / CAST(seg_n AS DOUBLE)) - " +
          "CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) / sigma < 0.6745 " +
          "THEN 2 ELSE 3 END AS BIGINT) AS symbol FROM j"),
      "ts_acf" ->
        ("WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr, " +
          "CAST(sum(CAST(floor(value * 1024.0) AS BIGINT)) AS BIGINT) AS hx " +
          "FROM events GROUP BY 1, 2), " +
          "b AS (SELECT event_type, hr, hx, row_number() OVER (" +
          "PARTITION BY event_type ORDER BY hr) AS i FROM h), " +
          "st AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n, " +
          "CAST(sum(hx) AS HUGEINT) AS s, " +
          "sum(CAST(hx AS HUGEINT) * CAST(hx AS HUGEINT)) AS sxx " +
          "FROM b GROUP BY 1), " +
          "p AS (SELECT hh.event_type, t.lag, " +
          "sum(CAST(hh.hx AS HUGEINT) * CAST(tt.hx AS HUGEINT)) AS sxy, " +
          "CAST(sum(hh.hx) AS HUGEINT) AS sh, " +
          "CAST(sum(tt.hx) AS HUGEINT) AS st2, " +
          "CAST(count(*) AS HUGEINT) AS m " +
          "FROM b hh CROSS JOIN range(1, 7) t(lag) JOIN b tt " +
          "ON tt.event_type = hh.event_type AND tt.i = hh.i + t.lag " +
          "GROUP BY 1, 2) " +
          "SELECT event_type, CAST(lag AS BIGINT) AS lag, " +
          "CAST(n AS BIGINT) AS n_points, " +
          "CASE WHEN den <= 0 THEN NULL " +
          "ELSE CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END AS acf " +
          "FROM (SELECT p.event_type, p.lag, st.n, " +
          "st.n * st.n * p.sxy - st.n * st.s * (p.sh + p.st2) " +
          "+ p.m * st.s * st.s AS num, " +
          "st.n * st.n * st.sxx - st.n * st.s * st.s AS den " +
          "FROM p JOIN st USING (event_type))"),
      "ts_theil_sen" ->
        // Exact-long pairwise slopes; lower-median ELEMENT pick ranked
        // (slope, oi, oj) — no float averaging anywhere.
        ("WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr, " +
          "CAST(sum(CAST(floor(value * 1024.0) AS BIGINT)) AS BIGINT) AS hx " +
          "FROM events GROUP BY 1, 2), " +
          "p AS (SELECT a.event_type, a.hr AS oi, b.hr AS oj, " +
          "CAST(b.hx - a.hx AS DOUBLE) / CAST(b.hr - a.hr AS DOUBLE) " +
          "AS slope FROM h a JOIN h b ON a.event_type = b.event_type " +
          "AND a.hr < b.hr), " +
          "r AS (SELECT event_type, slope, row_number() OVER (" +
          "PARTITION BY event_type ORDER BY slope, oi, oj) AS rn, " +
          "CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS cnt " +
          "FROM p) " +
          "SELECT event_type, cnt AS n_pairs, slope AS slope_per_x " +
          "FROM r WHERE rn = (cnt + 1) // 2"),
      "ts_mann_kendall" ->
        // S and the tie-corrected variance numerator stay BIGINT; one
        // /18.0, one sqrt, one division; S=0 -> z=0, zero var -> NULL.
        ("WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr, " +
          "CAST(sum(CAST(floor(value * 1024.0) AS BIGINT)) AS BIGINT) AS hx " +
          "FROM events GROUP BY 1, 2), " +
          "s AS (SELECT a.event_type, CAST(coalesce(sum(CASE " +
          "WHEN b.hx > a.hx THEN 1 WHEN b.hx < a.hx THEN -1 ELSE 0 END), " +
          "0) AS BIGINT) AS s_stat FROM h a JOIN h b " +
          "ON a.event_type = b.event_type AND a.hr < b.hr GROUP BY 1), " +
          "n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nn " +
          "FROM h GROUP BY 1), " +
          "tt AS (SELECT event_type, CAST(coalesce(sum(t * (t - 1) * " +
          "(2 * t + 5)), 0) AS BIGINT) AS tts FROM (SELECT event_type, " +
          "hx, CAST(count(*) AS BIGINT) AS t FROM h GROUP BY 1, 2) " +
          "GROUP BY 1) " +
          "SELECT s.event_type, n.nn AS n_points, s.s_stat, " +
          "CASE WHEN n.nn * (n.nn - 1) * (2 * n.nn + 5) - tt.tts <= 0 " +
          "THEN NULL WHEN s.s_stat > 0 THEN " +
          "CAST(s.s_stat - 1 AS DOUBLE) / " +
          "sqrt(CAST(n.nn * (n.nn - 1) * (2 * n.nn + 5) - tt.tts " +
          "AS DOUBLE) / 18.0) WHEN s.s_stat < 0 THEN " +
          "CAST(s.s_stat + 1 AS DOUBLE) / " +
          "sqrt(CAST(n.nn * (n.nn - 1) * (2 * n.nn + 5) - tt.tts " +
          "AS DOUBLE) / 18.0) ELSE 0.0 END AS z " +
          "FROM s JOIN n USING (event_type) JOIN tt USING (event_type)"),
      "ts_dominant_period" ->
        // ts_acf's CTE chain over lags 2..12, then the per-key argmax
        // ranked by round(acf,8) DESC, smallest lag on ties.
        ("WITH h AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hr, " +
          "CAST(sum(CAST(floor(value * 1024.0) AS BIGINT)) AS BIGINT) AS hx " +
          "FROM events GROUP BY 1, 2), " +
          "b AS (SELECT event_type, hr, hx, row_number() OVER (" +
          "PARTITION BY event_type ORDER BY hr) AS i FROM h), " +
          "st AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n, " +
          "CAST(sum(hx) AS HUGEINT) AS s, " +
          "sum(CAST(hx AS HUGEINT) * CAST(hx AS HUGEINT)) AS sxx " +
          "FROM b GROUP BY 1), " +
          "p AS (SELECT hh.event_type, t.lag, " +
          "sum(CAST(hh.hx AS HUGEINT) * CAST(tt.hx AS HUGEINT)) AS sxy, " +
          "CAST(sum(hh.hx) AS HUGEINT) AS sh, " +
          "CAST(sum(tt.hx) AS HUGEINT) AS st2, " +
          "CAST(count(*) AS HUGEINT) AS m " +
          "FROM b hh CROSS JOIN range(2, 13) t(lag) JOIN b tt " +
          "ON tt.event_type = hh.event_type AND tt.i = hh.i + t.lag " +
          "GROUP BY 1, 2), " +
          "a AS (SELECT event_type, CAST(lag AS BIGINT) AS lag, " +
          "CAST(n AS BIGINT) AS n_points, " +
          "CASE WHEN den <= 0 THEN NULL " +
          "ELSE CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END AS acf " +
          "FROM (SELECT p.event_type, p.lag, st.n, " +
          "st.n * st.n * p.sxy - st.n * st.s * (p.sh + p.st2) " +
          "+ p.m * st.s * st.s AS num, " +
          "st.n * st.n * st.sxx - st.n * st.s * st.s AS den " +
          "FROM p JOIN st USING (event_type))) " +
          "SELECT event_type, n_points, lag AS period, " +
          "round(acf, 8) AS acf_peak FROM a " +
          "QUALIFY row_number() OVER (PARTITION BY event_type " +
          "ORDER BY round(acf, 8) DESC NULLS LAST, lag ASC) = 1"),
      "graph_scc" ->
        // Independent definition: scc_id(v) = min over {v} ∪ {w : v→*w
        // AND w→*v} via recursive transitive closure — bounded because
        // the fixture's edges never leave their 8-node group.
        ("WITH RECURSIVE e0 AS (SELECT DISTINCT o_custkey AS src, " +
          "o_custkey - o_custkey % 8 + " +
          "CASE WHEN o_orderkey % 2 = 0 " +
          "THEN (o_custkey % 8 + o_orderkey % 3 + 1) % 8 " +
          "ELSE least(o_custkey % 8 + o_orderkey % 3 + 1, 7) END " +
          "AS dst FROM orders), " +
          // explicit DISTINCT: inside a WITH RECURSIVE list DuckDB does
          // not apply set-UNION dedup to non-recursive CTEs
          "n AS (SELECT DISTINCT v FROM (SELECT src AS v FROM e0 " +
          "UNION ALL SELECT dst FROM e0)), " +
          "r AS (SELECT src AS u, dst AS w FROM e0 " +
          "UNION SELECT r.u, e0.dst FROM r JOIN e0 ON r.w = e0.src), " +
          "mut AS (SELECT r1.u AS v, min(r1.w) AS mn FROM r r1 " +
          "JOIN r r2 ON r1.w = r2.u AND r2.w = r1.u GROUP BY r1.u) " +
          "SELECT CAST(v AS BIGINT) AS id, " +
          "CAST(least(v, coalesce(mn, v)) AS BIGINT) AS scc_id " +
          "FROM n LEFT JOIN mut USING (v)"),
      "graph_pagerank" ->
        ("WITH le AS (SELECT DISTINCT CAST(l_partkey * 2 AS BIGINT) AS src, " +
          "CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst FROM lineitem), " +
          "e AS (SELECT src, dst FROM le UNION SELECT dst, src FROM le), " +
          graft.functions.OracleSql.pageRankCtes(iters = 3) +
          " SELECT node, rank_q FROM it3"),
      "graph_ppr" ->
        ("WITH le AS MATERIALIZED (SELECT DISTINCT CAST(l_partkey * 2 AS BIGINT) AS src, " +
          "CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst FROM lineitem), " +
          "e AS MATERIALIZED (SELECT src, dst FROM le UNION SELECT dst, src FROM le), " +
          "seeds AS (SELECT CAST(s_suppkey * 2 + 1 AS BIGINT) AS node " +
          "FROM supplier WHERE s_nationkey % 5 = 0), " +
          graft.functions.OracleSql.pprCtes(iters = 3) +
          " SELECT node, rank_q FROM it3"),
      // Luby MIS replay: the engine's adaptive loop unrolled to a fixed
      // 10 rounds (measured max is ~5 at both SFs; extra rounds are
      // no-ops on the empty active set) — same deterministic priority
      // pr(v) = hash(v)·2^32 + v, same select/remove algebra per round.
      "graph_mis" -> {
        def pr(c: String) =
          s"((($c) * 2654435761 + 12345) % 1000000007) * 4294967296 + ($c)"
        val rounds = 10
        // MATERIALIZED: DuckDB inlines plain CTEs, so each of the ~60
        // round-CTE references would re-scan the parquet (observed as
        // fd exhaustion); materializing pins one computation per round.
        val base = "ps AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, " +
          "l_partkey AS p FROM lineitem WHERE l_partkey % 4 = 0), " +
          "ce AS MATERIALIZED (SELECT DISTINCT CAST(x.p AS BIGINT) AS a, " +
          "CAST(y.p AS BIGINT) AS b FROM ps x JOIN ps y " +
          "ON x.o = y.o AND x.p < y.p), " +
          "e1 AS MATERIALIZED (SELECT a, b FROM ce UNION " +
          "SELECT b AS a, a AS b FROM ce), " +
          "n1 AS MATERIALIZED (SELECT DISTINCT a AS n FROM e1)"
        val roundCtes = (1 to rounds).map { r =>
          s"m$r AS MATERIALIZED (SELECT a AS n, min(${pr("b")}) AS mn " +
            s"FROM e$r GROUP BY a), " +
            s"sel$r AS MATERIALIZED (SELECT x.n FROM n$r x LEFT JOIN m$r y " +
            s"ON x.n = y.n WHERE y.mn IS NULL OR ${pr("x.n")} < y.mn), " +
            s"rem$r AS MATERIALIZED (SELECT DISTINCT e.b AS n FROM e$r e " +
            s"JOIN sel$r s ON e.a = s.n), " +
            s"n${r + 1} AS MATERIALIZED (SELECT n FROM n$r WHERE n NOT IN " +
            s"(SELECT n FROM sel$r) AND n NOT IN (SELECT n FROM rem$r)), " +
            s"e${r + 1} AS MATERIALIZED (SELECT a, b FROM e$r WHERE a IN " +
            s"(SELECT n FROM n${r + 1}) AND b IN (SELECT n FROM n${r + 1}))"
        }.mkString(", ")
        val unions = (1 to rounds).map { r =>
          s"SELECT n, 1 AS in_mis, $r AS rr FROM sel$r " +
            s"UNION ALL SELECT n, 0 AS in_mis, $r AS rr FROM rem$r"
        }.mkString(" UNION ALL ")
        s"WITH $base, $roundCtes " +
          "SELECT CAST(n AS BIGINT) AS n, CAST(in_mis AS INT) AS in_mis, " +
          s"CAST(rr AS BIGINT) AS round FROM ($unions)"
      },
      "graph_link_pred" ->
        ("WITH ps AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p " +
          "FROM lineitem WHERE l_partkey % 4 = 0), " +
          "ce AS (SELECT DISTINCT CAST(x.p AS BIGINT) AS a, " +
          "CAST(y.p AS BIGINT) AS b FROM ps x JOIN ps y " +
          "ON x.o = y.o AND x.p < y.p), " +
          "adj AS (SELECT a AS m, b AS n FROM ce " +
          "UNION ALL SELECT b AS m, a AS n FROM ce), " +
          "deg AS (SELECT m, CAST(count(*) AS BIGINT) AS d " +
          "FROM adj GROUP BY m), " +
          "w AS (SELECT x.n AS na, y.n AS nb FROM adj x JOIN adj y " +
          "ON x.m = y.m AND x.n < y.n), " +
          "cn AS (SELECT na, nb, CAST(count(*) AS BIGINT) AS n_common " +
          "FROM w GROUP BY na, nb HAVING count(*) >= 3), " +
          "ul AS (SELECT cn.* FROM cn LEFT JOIN ce " +
          "ON ce.a = cn.na AND ce.b = cn.nb WHERE ce.a IS NULL) " +
          "SELECT ul.na AS node_a, ul.nb AS node_b, ul.n_common, " +
          "da.d AS deg_a, db.d AS deg_b, " +
          "CAST(da.d * db.d AS BIGINT) AS pref_attach " +
          "FROM ul JOIN deg da ON da.m = ul.na " +
          "JOIN deg db ON db.m = ul.nb"),
      // MATERIALIZED on the multi-referenced base CTEs here and in
      // graph_ppr/graph_modularity below: DuckDB inlines CTEs by
      // default, and an ITERATIVE chain referencing its predecessor
      // (and the edge set) more than once re-expands the whole tree
      // per level — exponential; measured live at sf1.0 as a 55 GB
      // spill vs 6.6 s materialized. Results are byte-identical.
      "graph_hits" ->
        ("WITH e AS MATERIALIZED (SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src, " +
          "CAST(l_partkey AS BIGINT) AS dst FROM lineitem " +
          "WHERE l_partkey % 4 = 0), " +
          graft.functions.OracleSql.hitsCtes(iters = 3) +
          " SELECT node, 'hub' AS kind, h AS score_q FROM h3 " +
          "UNION ALL " +
          "SELECT node, 'authority' AS kind, a AS score_q FROM a3"),
      // Id-ordered 3-way self-join: same triangle SET as the engine's
      // degree-ordered enumeration (orientation reorders the search, not
      // the membership), tractable at oracle scale.
      "graph_triangles" ->
        ("WITH ps AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p " +
          "FROM lineitem WHERE l_partkey % 4 = 0), " +
          "ce AS (SELECT DISTINCT CAST(x.p AS BIGINT) AS a, " +
          "CAST(y.p AS BIGINT) AS b FROM ps x JOIN ps y " +
          "ON x.o = y.o AND x.p < y.p), " +
          "tri AS (SELECT e1.a AS u, e1.b AS x, e2.b AS y FROM ce e1 " +
          "JOIN ce e2 ON e2.a = e1.a AND e1.b < e2.b " +
          "JOIN ce e3 ON e3.a = e1.b AND e3.b = e2.b) " +
          "SELECT node, CAST(count(*) AS BIGINT) AS tri_cnt FROM (" +
          "SELECT u AS node FROM tri UNION ALL SELECT x FROM tri " +
          "UNION ALL SELECT y FROM tri) GROUP BY node"),
      "graph_transitivity" ->
        ("WITH ps AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p " +
          "FROM lineitem WHERE l_partkey % 4 = 0), " +
          "ce AS (SELECT DISTINCT CAST(x.p AS BIGINT) AS a, " +
          "CAST(y.p AS BIGINT) AS b FROM ps x JOIN ps y " +
          "ON x.o = y.o AND x.p < y.p), " +
          "tri AS (SELECT e1.a AS u, e1.b AS x, e2.b AS y FROM ce e1 " +
          "JOIN ce e2 ON e2.a = e1.a AND e1.b < e2.b " +
          "JOIN ce e3 ON e3.a = e1.b AND e3.b = e2.b), " +
          "t3 AS (SELECT CAST(count(*) * 3 AS BIGINT) AS t3 FROM tri), " +
          "e AS (SELECT a AS src FROM ce UNION ALL SELECT b FROM ce), " +
          "deg AS (SELECT src, count(*) AS d FROM e GROUP BY 1), " +
          "w AS (SELECT CAST(coalesce(sum(d * (d - 1) // 2), 0) " +
          "AS BIGINT) AS n_wedges FROM deg) " +
          "SELECT CAST(t3.t3 // 3 AS BIGINT) AS n_triangles, " +
          "w.n_wedges, CASE WHEN n_wedges = 0 THEN NULL ELSE " +
          "CAST(t3.t3 AS DOUBLE) / CAST(n_wedges AS DOUBLE) END " +
          "AS transitivity FROM t3, w"),
      "graph_clustering_coeff" ->
        ("WITH ps AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p " +
          "FROM lineitem WHERE l_partkey % 4 = 0), " +
          "ce AS (SELECT DISTINCT CAST(x.p AS BIGINT) AS a, " +
          "CAST(y.p AS BIGINT) AS b FROM ps x JOIN ps y " +
          "ON x.o = y.o AND x.p < y.p), " +
          "e AS (SELECT a AS src FROM ce UNION ALL SELECT b FROM ce), " +
          "deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) " +
          "AS degree FROM e GROUP BY 1), " +
          "tri AS (SELECT e1.a AS u, e1.b AS x, e2.b AS y FROM ce e1 " +
          "JOIN ce e2 ON e2.a = e1.a AND e1.b < e2.b " +
          "JOIN ce e3 ON e3.a = e1.b AND e3.b = e2.b), " +
          "tc AS (SELECT node, CAST(count(*) AS BIGINT) AS tri_cnt FROM (" +
          "SELECT u AS node FROM tri UNION ALL SELECT x FROM tri " +
          "UNION ALL SELECT y FROM tri) GROUP BY node) " +
          "SELECT d.node, d.degree, " +
          "CAST(coalesce(tc.tri_cnt, 0) AS BIGINT) AS tri_cnt, " +
          "CASE WHEN d.degree < 2 THEN NULL ELSE " +
          "CAST(2 * coalesce(tc.tri_cnt, 0) AS DOUBLE) / " +
          "CAST(d.degree * (d.degree - 1) AS DOUBLE) END AS lcc " +
          "FROM deg d LEFT JOIN tc ON tc.node = d.node"),
      "graph_assortativity" ->
        ("WITH ps AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p " +
          "FROM lineitem WHERE l_partkey % 4 = 0), " +
          "ce AS (SELECT DISTINCT CAST(x.p AS BIGINT) AS a, " +
          "CAST(y.p AS BIGINT) AS b FROM ps x JOIN ps y " +
          "ON x.o = y.o AND x.p < y.p), " +
          "e AS (SELECT a AS src FROM ce UNION ALL SELECT b FROM ce), " +
          "deg AS (SELECT src, CAST(count(*) AS HUGEINT) AS d " +
          "FROM e GROUP BY 1), " +
          "jd AS (SELECT da.d AS dj, db.d AS dk FROM ce " +
          "JOIN deg da ON ce.a = da.src JOIN deg db ON ce.b = db.src), " +
          "m AS (SELECT CAST(count(*) AS BIGINT) AS n_edges, " +
          "sum(dj * dk) AS sjk, sum(dj + dk) AS sj, " +
          "sum(dj * dj + dk * dk) AS sj2 FROM jd) " +
          "SELECT n_edges, round(CASE WHEN " +
          "CAST(2 * n_edges * sj2 - sj * sj AS DOUBLE) <> 0 THEN " +
          "CAST(4 * n_edges * sjk - sj * sj AS DOUBLE) / " +
          "CAST(2 * n_edges * sj2 - sj * sj AS DOUBLE) END, 8) " +
          "AS assortativity FROM m"),
      "graph_degree_stats" ->
        ("WITH ps AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p " +
          "FROM lineitem WHERE l_partkey % 4 = 0), " +
          "ce AS (SELECT DISTINCT CAST(x.p AS BIGINT) AS a, " +
          "CAST(y.p AS BIGINT) AS b FROM ps x JOIN ps y " +
          "ON x.o = y.o AND x.p < y.p), " +
          "e AS (SELECT a AS src FROM ce UNION ALL SELECT b FROM ce), " +
          "deg AS (SELECT src, count(*) AS d FROM e GROUP BY 1), " +
          "grid AS (SELECT d, count(*) AS c FROM deg GROUP BY 1), " +
          "pk AS (SELECT list_sort(list({'d': d, 'c': c})) AS dc, " +
          "CAST(sum(c) AS BIGINT) AS n_nodes, max(d) AS max_degree " +
          "FROM grid), " +
          "me AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM ce), " +
          "ln AS (SELECT n_nodes, max_degree, " +
          "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
          "list_transform(dc, x -> CAST(x.c AS DOUBLE) * " +
          "ln(CAST(x.d AS DOUBLE)))), (a, b) -> a + b) AS lnsum " +
          "FROM pk) " +
          "SELECT n_nodes, n_edges, max_degree, " +
          "2.0 * CAST(n_edges AS DOUBLE) / CAST(n_nodes AS DOUBLE) " +
          "AS mean_degree, " +
          "round(CASE WHEN lnsum <> 0 THEN " +
          "1.0 + CAST(n_nodes AS DOUBLE) / lnsum END, 8) AS alpha_mle " +
          "FROM ln, me"),
      "graph_modularity" ->
        ("WITH ps AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p " +
          "FROM lineitem WHERE l_partkey % 4 = 0), " +
          "ce AS MATERIALIZED (SELECT DISTINCT CAST(x.p AS BIGINT) AS a, " +
          "CAST(y.p AS BIGINT) AS b FROM ps x JOIN ps y " +
          "ON x.o = y.o AND x.p < y.p), " +
          "e AS MATERIALIZED (SELECT a AS src, b AS dst FROM ce " +
          "UNION ALL SELECT b, a FROM ce), " +
          "nodes AS (SELECT DISTINCT src AS node FROM e), " +
          graft.functions.OracleSql.labelPropCtes(iters = 3) +
          ", lab AS (SELECT node, lbl FROM lp3), " +
          "mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM ce), " +
          "ecx AS (SELECT la.lbl AS c, CAST(count(*) AS BIGINT) AS ec " +
          "FROM ce JOIN lab la ON ce.a = la.node " +
          "JOIN lab lb ON ce.b = lb.node WHERE la.lbl = lb.lbl " +
          "GROUP BY 1), " +
          "deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d " +
          "FROM e GROUP BY 1), " +
          "dcx AS (SELECT lbl AS c, CAST(sum(d) AS BIGINT) AS dc " +
          "FROM deg JOIN lab USING (node) GROUP BY 1) " +
          "SELECT m, CAST(count(*) AS BIGINT) AS n_communities, " +
          "CAST(CAST(sum(4 * m * coalesce(ec, 0) - dc * dc) AS BIGINT) " +
          "AS DOUBLE) / CAST(4 * m * m AS DOUBLE) AS modularity " +
          "FROM dcx LEFT JOIN ecx USING (c), mm GROUP BY m"),
      "ts_linregress" ->
        ("WITH d AS (SELECT event_type, " +
          "epoch_us(ts) // 86400000000 AS day, " +
          "CAST(sum(CAST(floor(value * 1024.0) AS BIGINT)) AS BIGINT) " +
          "AS dx FROM events GROUP BY 1, 2), " +
          "mo AS (SELECT event_type, " +
          "CAST(count(*) AS HUGEINT) AS n, " +
          "CAST(sum(CAST(day AS HUGEINT)) AS HUGEINT) AS sx, " +
          "CAST(sum(CAST(dx AS HUGEINT)) AS HUGEINT) AS sy, " +
          "CAST(sum(CAST(day AS HUGEINT) * CAST(dx AS HUGEINT)) " +
          "AS HUGEINT) AS sxy, " +
          "CAST(sum(CAST(day AS HUGEINT) * CAST(day AS HUGEINT)) " +
          "AS HUGEINT) AS sxx, " +
          "CAST(sum(CAST(dx AS HUGEINT) * CAST(dx AS HUGEINT)) " +
          "AS HUGEINT) AS syy FROM d GROUP BY 1), " +
          "nm AS (SELECT event_type, CAST(n AS BIGINT) AS n_points, " +
          "CAST(n * sxy - sx * sy AS DOUBLE) AS sxyn, " +
          "CAST(n * sxx - sx * sx AS DOUBLE) AS sxxn, " +
          "CAST(n * syy - sy * sy AS DOUBLE) AS syyn, " +
          "CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd, " +
          "CAST(n AS DOUBLE) AS nd FROM mo), " +
          "sl AS (SELECT event_type, n_points, " +
          "CASE WHEN sxxn <> 0 THEN sxyn / sxxn END AS slope, " +
          "sxd, syd, nd, sxyn, sxxn, syyn FROM nm) " +
          "SELECT event_type, n_points, slope, " +
          "(syd - slope * sxd) / nd AS intercept, " +
          "CASE WHEN sxxn <> 0 AND syyn <> 0 THEN " +
          "sxyn * sxyn / (sxxn * syyn) END AS r2 FROM sl"),
      "graph_label_prop" ->
        ("WITH ps AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p " +
          "FROM lineitem WHERE l_partkey % 4 = 0), " +
          "ce AS (SELECT DISTINCT CAST(x.p AS BIGINT) AS a, " +
          "CAST(y.p AS BIGINT) AS b FROM ps x JOIN ps y " +
          "ON x.o = y.o AND x.p < y.p), " +
          "e AS (SELECT a AS src, b AS dst FROM ce " +
          "UNION ALL SELECT b, a FROM ce), " +
          "nodes AS (SELECT DISTINCT src AS node FROM e), " +
          graft.functions.OracleSql.labelPropCtes(iters = 3) +
          " SELECT node, lbl FROM lp3"),
      // Fixed 12 peel rounds: >= the measured convergence round count at
      // both verify SFs (9 at sf0.01, 7 at sf0.1 for k=20); extra rounds
      // are no-ops at the fixpoint.
      "graph_kcore" ->
        ("WITH ps AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p " +
          "FROM lineitem WHERE l_partkey % 4 = 0), " +
          "ce AS (SELECT DISTINCT CAST(x.p AS BIGINT) AS a, " +
          "CAST(y.p AS BIGINT) AS b FROM ps x JOIN ps y " +
          "ON x.o = y.o AND x.p < y.p), " +
          "e AS (SELECT a AS src, b AS dst FROM ce " +
          "UNION ALL SELECT b, a FROM ce), " +
          graft.functions.OracleSql.kCoreCtes(k = 20, rounds = 12) +
          " SELECT node, core_deg FROM s12"),
      "graph_bfs" ->
        ("WITH ps AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p " +
          "FROM lineitem WHERE l_partkey % 4 = 0), " +
          "ce AS (SELECT DISTINCT CAST(x.p AS BIGINT) AS a, " +
          "CAST(y.p AS BIGINT) AS b FROM ps x JOIN ps y " +
          "ON x.o = y.o AND x.p < y.p), " +
          "e AS (SELECT a AS src, b AS dst FROM ce " +
          "UNION ALL SELECT b, a FROM ce), " +
          "seeds AS (SELECT DISTINCT CAST(p AS BIGINT) AS node FROM ps " +
          "WHERE p % 40 = 0), " +
          graft.functions.OracleSql.bfsCtes(depth = 3) +
          " SELECT node, dist FROM d3"),
      "graph_betweenness" ->
        ("WITH ps AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p " +
          "FROM lineitem WHERE l_partkey % 4 = 0), " +
          "ce AS (SELECT DISTINCT CAST(x.p AS BIGINT) AS a, " +
          "CAST(y.p AS BIGINT) AS b FROM ps x JOIN ps y " +
          "ON x.o = y.o AND x.p < y.p), " +
          "e AS (SELECT a AS src, b AS dst FROM ce " +
          "UNION ALL SELECT b, a FROM ce), " +
          "seeds AS (SELECT DISTINCT CAST(p AS BIGINT) AS node FROM ps " +
          "WHERE p % 500 = 0), " +
          graft.functions.OracleSql.bfsMultiCtes(depth = 3) + ", " +
          graft.functions.OracleSql.betweennessCtes(depth = 3) +
          " SELECT node, betweenness_q FROM bq"),
      "graph_closeness" ->
        ("WITH ps AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p " +
          "FROM lineitem WHERE l_partkey % 4 = 0), " +
          "ce AS (SELECT DISTINCT CAST(x.p AS BIGINT) AS a, " +
          "CAST(y.p AS BIGINT) AS b FROM ps x JOIN ps y " +
          "ON x.o = y.o AND x.p < y.p), " +
          "e AS (SELECT a AS src, b AS dst FROM ce " +
          "UNION ALL SELECT b, a FROM ce), " +
          "seeds AS (SELECT DISTINCT CAST(p AS BIGINT) AS node FROM ps " +
          "WHERE p % 40 = 0), " +
          graft.functions.OracleSql.bfsMultiCtes(depth = 3) +
          " SELECT seed, CAST(count(*) - 1 AS BIGINT) AS n_reached, " +
          "CAST(sum(dist) AS BIGINT) AS sum_dist, " +
          "CASE WHEN sum(dist) > 0 THEN CAST(count(*) - 1 AS DOUBLE) / " +
          "CAST(sum(dist) AS DOUBLE) END AS closeness " +
          "FROM md3 GROUP BY seed"),
      // MACD replay: the fast/slow/macd/signal/diff subexpressions
      // duplicated textually per the kalman discipline; strict sign
      // flips only.
      "ts_macd" -> {
        val f = "(0.5 * s.x + 0.5 * r.f)"
        val sl = "(0.25 * s.x + 0.75 * r.sl)"
        val m = s"($f - $sl)"
        val sg = s"(0.5 * $m + 0.5 * r.sg)"
        val d = s"($m - $sg)"
        "WITH RECURSIVE sr AS (" +
          "SELECT event_type, CAST(hx AS DOUBLE) AS x, " +
          "row_number() OVER (PARTITION BY event_type ORDER BY hr) AS i " +
          "FROM (SELECT event_type, epoch_us(ts) // 3600000000 AS hr, " +
          "CAST(sum(CAST(floor(value * 1024.0) AS BIGINT)) AS BIGINT) " +
          "AS hx FROM events GROUP BY 1, 2) WHERE hx IS NOT NULL), " +
          "rec AS (" +
          "SELECT event_type, i, x AS f, x AS sl, CAST(0.0 AS DOUBLE) " +
          "AS sg, CAST(0.0 AS DOUBLE) AS pd, CAST(0 AS BIGINT) AS cx " +
          "FROM sr WHERE i = 1 " +
          "UNION ALL " +
          s"SELECT s.event_type, s.i, $f AS f, $sl AS sl, $sg AS sg, " +
          s"$d AS pd, r.cx + (CASE WHEN (r.pd > 0.0 AND $d < 0.0) OR " +
          s"(r.pd < 0.0 AND $d > 0.0) THEN 1 ELSE 0 END) AS cx " +
          "FROM rec r JOIN sr s ON s.event_type = r.event_type " +
          "AND s.i = r.i + 1), " +
          "fin AS (SELECT event_type, i, f, sl, sg, pd, cx, " +
          "row_number() OVER (PARTITION BY event_type ORDER BY i DESC) " +
          "AS rn FROM rec) " +
          "SELECT event_type, CAST(i AS BIGINT) AS n_points, " +
          "f - sl AS macd, sg AS signal, pd AS histogram, " +
          "cx AS n_crossovers FROM fin WHERE rn = 1"
      },
      // Per-season replay of the MK machinery: same-season pair signs,
      // per-season tie bracket, integer variance sum, and the plain-MK
      // continuity-corrected z shape.
      "ts_mk_seasonal" -> {
        val vr = "(CAST(vn.varnum AS DOUBLE) / 18.0)"
        "WITH h AS (SELECT event_type, epoch_us(ts) // 86400000000 AS d, " +
          "CAST(sum(CAST(floor(value * 1024.0) AS BIGINT)) AS BIGINT) " +
          "AS hx FROM events GROUP BY 1, 2), " +
          "b AS (SELECT event_type AS k, d % 7 AS m, d AS o, hx AS x " +
          "FROM h), " +
          "s AS (SELECT x.k, CAST(coalesce(sum(CASE WHEN y.x > x.x THEN 1 " +
          "WHEN y.x < x.x THEN -1 ELSE 0 END), 0) AS BIGINT) AS s_stat " +
          "FROM b x JOIN b y ON x.k = y.k AND x.m = y.m AND x.o < y.o " +
          "GROUP BY 1), " +
          "n AS (SELECT k, CAST(count(*) AS BIGINT) AS n_points, " +
          "CAST(count(DISTINCT m) AS BIGINT) AS n_seasons FROM b " +
          "GROUP BY 1), " +
          "ns AS (SELECT k, m, CAST(count(*) AS BIGINT) AS nsz FROM b " +
          "GROUP BY 1, 2), " +
          "tt AS (SELECT k, m, CAST(coalesce(sum(t * (t - 1) * " +
          "(2 * t + 5)), 0) AS BIGINT) AS tt FROM (SELECT k, m, x, " +
          "count(*) AS t FROM b GROUP BY 1, 2, 3) GROUP BY 1, 2), " +
          "vn AS (SELECT ns.k, CAST(sum(ns.nsz * (ns.nsz - 1) * " +
          "(2 * ns.nsz + 5) - tt.tt) AS BIGINT) AS varnum FROM ns " +
          "JOIN tt ON ns.k = tt.k AND ns.m = tt.m GROUP BY 1) " +
          "SELECT s.k AS event_type, n.n_points, n.n_seasons, s.s_stat, " +
          "CASE WHEN vn.varnum <= 0 THEN NULL " +
          s"WHEN s.s_stat > 0 THEN CAST(s.s_stat - 1 AS DOUBLE) / sqrt($vr) " +
          s"WHEN s.s_stat < 0 THEN CAST(s.s_stat + 1 AS DOUBLE) / sqrt($vr) " +
          "ELSE 0.0 END AS z " +
          "FROM s JOIN n ON s.k = n.k JOIN vn ON s.k = vn.k"
      },
      // Reciprocity replay: same two edge families, mutual pairs via
      // EXISTS on the reversed edge.
      "graph_reciprocity" ->
        ("WITH n AS (SELECT DISTINCT doc_id % 1024 AS a FROM documents), " +
          "e AS (SELECT DISTINCT CAST(a AS BIGINT) AS a, " +
          "CAST(b AS BIGINT) AS b FROM (" +
          "SELECT a, (a * 7 + 3) % 1024 AS b FROM n " +
          "UNION ALL SELECT a, (a + 512) % 1024 FROM n) WHERE a <> b), " +
          "r AS (SELECT CAST(count(*) AS BIGINT) AS n_reciprocal FROM e x " +
          "WHERE EXISTS (SELECT 1 FROM e y WHERE y.a = x.b " +
          "AND y.b = x.a)), " +
          "t AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e) " +
          "SELECT t.n_edges, r.n_reciprocal, " +
          "CAST(r.n_reciprocal AS DOUBLE) / CAST(t.n_edges AS DOUBLE) " +
          "AS reciprocity FROM t, r"),
      // Fourteen unrolled Bellman relaxation rounds (longest chain in a
      // 12-wide block is <= 11 edges; extra rounds idempotent), every
      // CTE MATERIALIZED to keep the chain linear.
      "graph_dag_layers" -> {
        def round(i: Int): String =
          s"l${i + 1} AS MATERIALIZED (SELECT v, max(layer) AS layer " +
            s"FROM (SELECT v, layer FROM l$i " +
            s"UNION ALL SELECT e.b AS v, l.layer + 1 AS layer " +
            s"FROM e JOIN l$i l ON l.v = e.a) GROUP BY v)"
        "WITH ids AS (SELECT doc_id AS i FROM documents), " +
          "e0 AS (SELECT i AS a, i + (i % 3) + 1 AS b FROM ids " +
          "UNION ALL SELECT i, i + 5 FROM ids WHERE i % 2 = 0), " +
          "e AS MATERIALIZED (SELECT DISTINCT CAST(a AS BIGINT) AS a, " +
          "CAST(b AS BIGINT) AS b FROM e0 " +
          "WHERE a // 12 = b // 12 AND a <> b), " +
          "l0 AS MATERIALIZED (SELECT DISTINCT v, CAST(0 AS BIGINT) " +
          "AS layer FROM (SELECT a AS v FROM e " +
          "UNION ALL SELECT b FROM e)), " +
          (0 until 14).map(round).mkString(", ") +
          " SELECT v, layer FROM l14"
      },
      // Eight unrolled simultaneous-peel rounds (fixpoint reached in <=6
      // at both SFs; extra rounds are idempotent because the peel is
      // order-free), every CTE MATERIALIZED so the chain stays linear,
      // final support recomputed on the surviving edge set exactly like
      // the engine's fixpoint round.
      "graph_ktruss" -> {
        def round(i: Int): String =
          s"t$i AS MATERIALIZED (SELECT xy.a AS ta, xy.b AS tb, " +
            s"xz.b AS tc FROM e$i xy " +
            s"JOIN e$i xz ON xz.a = xy.a AND xz.b > xy.b " +
            s"JOIN e$i yz ON yz.a = xy.b AND yz.b = xz.b), " +
            s"r$i AS MATERIALIZED (SELECT ta AS a, tb AS b FROM t$i " +
            s"UNION ALL SELECT ta, tc FROM t$i " +
            s"UNION ALL SELECT tb, tc FROM t$i), " +
            s"s$i AS MATERIALIZED (SELECT e.a, e.b, " +
            s"coalesce(c.c, 0) AS sup FROM e$i e LEFT JOIN " +
            s"(SELECT a, b, count(*) AS c FROM r$i GROUP BY 1, 2) c " +
            s"ON c.a = e.a AND c.b = e.b)"
        val rounds = (0 to 8).map { i =>
          if (i < 8)
            round(i) + ", " +
              s"e${i + 1} AS MATERIALIZED (SELECT a, b FROM s$i " +
              "WHERE sup >= 2)"
          else round(i)
        }.mkString(", ")
        "WITH ps AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p " +
          "FROM lineitem WHERE l_partkey % 8 = 0), " +
          "e0 AS MATERIALIZED (SELECT DISTINCT CAST(x.p AS BIGINT) AS a, " +
          "CAST(y.p AS BIGINT) AS b FROM ps x JOIN ps y " +
          "ON x.o = y.o AND x.p < y.p), " +
          rounds +
          " SELECT a, b, CAST(sup AS BIGINT) AS support FROM s8"
      },
      // Same BFS-ball CTEs as closeness; harmonic is the fixed-order
      // ((n1/1 + n2/2) + n3/3) double expression over exact per-ring
      // counts — one division per ring, never a per-row 1/d sum.
      "graph_harmonic" ->
        ("WITH ps AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p " +
          "FROM lineitem WHERE l_partkey % 4 = 0), " +
          "ce AS (SELECT DISTINCT CAST(x.p AS BIGINT) AS a, " +
          "CAST(y.p AS BIGINT) AS b FROM ps x JOIN ps y " +
          "ON x.o = y.o AND x.p < y.p), " +
          "e AS (SELECT a AS src, b AS dst FROM ce " +
          "UNION ALL SELECT b, a FROM ce), " +
          "seeds AS (SELECT DISTINCT CAST(p AS BIGINT) AS node FROM ps " +
          "WHERE p % 100 = 0), " +
          graft.functions.OracleSql.bfsMultiCtes(depth = 3) + ", " +
          "hb AS (SELECT seed, " +
          "CAST(sum(CASE WHEN dist = 1 THEN 1 ELSE 0 END) AS BIGINT) " +
          "AS n_1, " +
          "CAST(sum(CASE WHEN dist = 2 THEN 1 ELSE 0 END) AS BIGINT) " +
          "AS n_2, " +
          "CAST(sum(CASE WHEN dist = 3 THEN 1 ELSE 0 END) AS BIGINT) " +
          "AS n_3 FROM md3 GROUP BY seed) " +
          "SELECT seed, n_1, n_2, n_3, " +
          "(CAST(n_1 AS DOUBLE) / 1.0 + CAST(n_2 AS DOUBLE) / 2.0) + " +
          "CAST(n_3 AS DOUBLE) / 3.0 AS harmonic FROM hb"),
      // Walk replay: the per-(node, step) argmin-hash transition table
      // is computed NON-recursively (one window over edges x steps),
      // then a recursive CTE replays the six position hops — the same
      // factoring that makes the engine's plan cheap, and it sidesteps
      // the no-aggregates-in-recursive-term SQL restriction.
      "graph_random_walks" ->
        ("WITH RECURSIVE ps AS (SELECT DISTINCT l_orderkey AS o, " +
          "l_partkey AS p FROM lineitem WHERE l_partkey % 4 = 0), " +
          "ce AS (SELECT DISTINCT CAST(x.p AS BIGINT) AS a, " +
          "CAST(y.p AS BIGINT) AS b FROM ps x JOIN ps y " +
          "ON x.o = y.o AND x.p < y.p), " +
          "e AS (SELECT a AS src, b AS dst FROM ce " +
          "UNION ALL SELECT b, a FROM ce), " +
          "seeds AS (SELECT DISTINCT CAST(p AS BIGINT) AS node FROM ps " +
          "WHERE p % 400 = 0), " +
          "st AS (SELECT unnest(range(0, 6)) AS step), " +
          "sc AS (SELECT e.src, st.step, e.dst, " +
          "(7919 * (st.step + 1) + 104729 * e.src + 130363 * e.dst) " +
          "% 999983 AS score FROM e CROSS JOIN st), " +
          "ch AS (SELECT src, step, dst FROM (SELECT src, step, dst, " +
          "row_number() OVER (PARTITION BY src, step " +
          "ORDER BY score, dst) AS rn FROM sc) WHERE rn = 1), " +
          "walk AS (SELECT node AS walker, CAST(0 AS BIGINT) AS step, " +
          "node FROM seeds " +
          "UNION ALL SELECT w.walker, w.step + 1, c.dst " +
          "FROM walk w JOIN ch c ON c.src = w.node " +
          "AND c.step = w.step) " +
          "SELECT walker, step, node FROM walk"),
    )
  }
}
