package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an event stream onto a dense
  * per-key daily grid (every day between each key's first and last
  * activity), filling gaps with zero counts and last-observation-carried-
  * forward values — what feature pipelines need before windowed models
  * (ragged event times make rolling features silently wrong).
  *
  * Scale shape: the dense grid is built by exploding a per-key date
  * `sequence` (grid size = Σ key spans, generated — never a calendar
  * cross join), the fill join is keyed on (key, day) like any keyed
  * equi-join, and LOCF is one running window per key — a single shuffle,
  * AQE-skew-splittable, no driver-side loops.
  */
object TimeSeries {

  /** @return one row per (key, day) in the key's [min, max] activity
    *         span: `n_events` (0 on gap days), `day_value` (that day's
    *         decimal-exact sum, NULL on gaps), `locf_value` (most recent
    *         non-NULL day_value at or before the day). */
  def gapFillDaily(
      df: DataFrame, keyCol: String, dateCol: String,
      valueCol: String): DataFrame = {
    val daily = df
      .groupBy(col(keyCol), col(dateCol).as("day"))
      .agg(
        count(lit(1)).as("__n"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("day_value"))
    val spans = daily.groupBy(col(keyCol))
      .agg(min(col("day")).as("__mn"), max(col("day")).as("__mx"))
    val grid = spans.select(
      col(keyCol), explode(sequence(col("__mn"), col("__mx"))).as("day"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq(keyCol, "day"), "left_outer")
      .select(
        col(keyCol), col("day"),
        coalesce(col("__n"), lit(0L)).as("n_events"),
        col("day_value"),
        last(col("day_value"), ignoreNulls = true).over(w).as("locf_value"))
  }

  /** Linear-interpolation resampling — [[gapFillDaily]]'s smooth sibling:
    * gap days get the value linearly interpolated between the NEAREST
    * observed days on each side; days outside the observed range on
    * either end clamp to the nearest observation (an end has only one
    * neighbor — extrapolating invents trend). Observed days keep their
    * exact value: the interpolation formula degenerates to it when
    * prev = next = the day itself.
    *
    * Determinism: day distances are exact integers; the one formula
    * `prev + (next - prev) · d/span` is a fixed-shape IEEE expression,
    * bit-identical across engines. Scale shape identical to
    * [[gapFillDaily]]: generated grid, keyed join, two running windows
    * per key (backward + forward), one shuffle. */
  def interpolateDaily(
      df: DataFrame, keyCol: String, dateCol: String,
      valueCol: String): DataFrame = {
    val daily = df
      .groupBy(col(keyCol), col(dateCol).as("day"))
      .agg(sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("day_value"))
    val spans = daily.groupBy(col(keyCol))
      .agg(min(col("day")).as("__mn"), max(col("day")).as("__mx"))
    val grid = spans.select(
      col(keyCol), explode(sequence(col("__mn"), col("__mx"))).as("day"))
    val wPrev = Window.partitionBy(col(keyCol)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col(keyCol)).orderBy(col("day"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsDay = when(col("day_value").isNotNull, col("day"))
    val joined = grid.join(daily, Seq(keyCol, "day"), "left_outer")
      .select(col(keyCol), col("day"), col("day_value"),
        last(obsDay, ignoreNulls = true).over(wPrev).as("__pd"),
        last(col("day_value"), ignoreNulls = true).over(wPrev).as("__pv"),
        first(obsDay, ignoreNulls = true).over(wNext).as("__nd"),
        first(col("day_value"), ignoreNulls = true).over(wNext).as("__nv"))
    joined.select(
      col(keyCol), col("day"), col("day_value"),
      when(col("__pd").isNull, col("__nv"))         // before first obs
        .when(col("__nd").isNull, col("__pv"))      // after last obs
        .when(col("__pd") === col("__nd"), col("__pv")) // observed day
        .otherwise(col("__pv") + (col("__nv") - col("__pv")) *
          datediff(col("day"), col("__pd")).cast("double") /
          datediff(col("__nd"), col("__pd")).cast("double"))
        .as("interp_value"))
  }

  /** Per-key exponentially weighted moving average over event order —
    * the standard smoothing feature (trend lines, rate estimates,
    * anomaly baselines): s_1 = x_1, s_t = α·x_t + (1-α)·s_{t-1} in
    * (tsCol, idCol) order within each key.
    *
    * Determinism: each key's series is gathered once
    * (`collect_list` + `array_sort`, total order (ts, id, x)) and every
    * output is a strict left-to-right prefix fold with a fixed float
    * shape — bit-identical across partitionings and engines (DuckDB
    * mirrors it with `list_reduce` over `list_slice` prefixes). Prefer α
    * values exact in binary (0.25, 0.5, 0.125…) when hash-comparing
    * across engines: then 1-α is exact too and the mirror is trivially
    * bit-safe.
    *
    * Scale/cost: one shuffle keyed by `keyCol`; each key's FULL series
    * must fit in one task row (the same bound as any sessionize /
    * reassembly op — fine for per-entity series, wrong for one global
    * key), and the prefix folds make a key's work O(n²) in its series
    * length — bound series per key (window the input by time period)
    * before smoothing at corpus scale. Output: (keyCol, ts, id, x,
    * ewma), one row per input row.
    *
    * Rows with a NULL value are EXCLUDED from the series (they would
    * otherwise poison the recurrence; a NULL is "no observation", not a
    * zero) — mirror the same `WHERE x IS NOT NULL` in any oracle. */
  def ewma(
      df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valCol: String, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    val series = array_sort(collect_list(struct(
      col(tsCol).cast("long").as("ts"), col(idCol).cast("long").as("id"),
      col(valCol).cast("double").as("x"))))
    val prefixFold = (i: Column) =>
      aggregate(
        slice(col("__s"), lit(1), i + lit(1)),
        lit(null).cast("double"),
        (acc, el) => when(acc.isNull, el.getField("x"))
          .otherwise(lit(alpha) * el.getField("x") +
            (lit(1.0) - lit(alpha)) * acc))
    df.filter(col(valCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(series.as("__s"))
      .select(col(keyCol), explode(transform(col("__s"),
        (e, i) => struct(e.getField("ts").as("ts"), e.getField("id").as("id"),
          e.getField("x").as("x"), prefixFold(i).as("ewma")))).as("__r"))
      .select(col(keyCol), col("__r.ts").as("ts"), col("__r.id").as("id"),
        col("__r.x").as("x"), col("__r.ewma").as("ewma"))
  }

  /** Fixed-interval downsampling to OHLC bars — the standard reduction
    * from a raw event stream to per-key, per-bucket open/high/low/close
    * summaries (metrics dashboards, rate monitoring, financial bars).
    *
    * Determinism: open/close pick the value at the (ts, id)-first/last
    * event of the bucket — `id` breaks timestamp ties, so the answer is
    * unique however the data arrives (the same tie-break discipline as
    * latest-wins dedup); high/low are exact max/min; `sum_value`
    * accumulates in DECIMAL(18,2) (order-independent) per the corpus
    * convention.
    *
    * Scale shape: ONE shuffle keyed by (key, bucket) — the two
    * row_number windows and the final aggregate share that partitioning,
    * so Catalyst plans a single exchange; no per-key series
    * materialization (unlike [[ewma]], a bucket's events never meet in
    * one row). Bucket count grows with the time span, not the event
    * rate. */
  def resampleOhlc(
      df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valCol: String, bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    // FLOOR-division bucketing via pmod (`div` truncates toward zero, so
    // a pre-epoch timestamp would land in a bucket that doesn't contain
    // it — and disagree with DuckDB's `//`, which floors).
    val bucket = col(tsCol) - pmod(col(tsCol), lit(bucketUs))
    val asc = Window.partitionBy(col(keyCol), col("__bk"))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val desc = Window.partitionBy(col(keyCol), col("__bk"))
      .orderBy(col(tsCol).desc, col(idCol).desc)
    df.select(col(keyCol), col(tsCol), col(idCol),
        col(valCol).cast("double").as("__v"), bucket.as("__bk"))
      .withColumn("__rf", row_number().over(asc))
      .withColumn("__rl", row_number().over(desc))
      .groupBy(col(keyCol), col("__bk").as("bucket_start_us"))
      .agg(
        max(when(col("__rf") === 1, col("__v"))).as("open"),
        max(col("__v")).as("high"),
        min(col("__v")).as("low"),
        max(when(col("__rl") === 1, col("__v"))).as("close"),
        count(lit(1)).as("n_events"),
        sum(col("__v").cast("decimal(18,2)")).cast("double").as("sum_value"))
  }

  /** CUSUM change-point scan per key: over an ordered series of BIGINT
    * values (quantize floats FIRST — the gate feeds daily sums of
    * `floor(value * 1024)`), the cumulative-deviation statistic
    *
    *   cusum_i = Σ_{j<=i} (n·x_j - S)   (= n·prefix_i - i·S, exact)
    *
    * peaks where the series' mean shifts; the argmax of |cusum| is the
    * classic single-change-point estimate. Multiplying the deviation
    * through by `n` keeps EVERYTHING in integer arithmetic — no mean
    * division, no float accumulation — so the scan is bit-identical
    * across partitionings and engines (the oracle mirrors it with
    * window sums CAST to BIGINT).
    *
    * Output per key: (keyCol, n_points, cp_ord, cusum_at_cp,
    * mean_shift_score) where cp_ord is the argmax ordinate (earliest on
    * ties) and mean_shift_score = |cusum| / n in original quantized
    * units — ONE final division.
    *
    * Scale shape: one (key)-keyed window prefix sum over the
    * pre-aggregated series (O(points-per-key), NOT raw events — callers
    * bucket first, so a key's series fits a partition by construction),
    * then one argmax row_number in the SAME partitioning — Catalyst
    * plans a single exchange. Headroom: |n·prefix| <= n²·max|x| must fit
    * BIGINT — 1e5 daily points of 1e8-scale sums is safe. */
  def cusumChangePoint(
      series: DataFrame, keyCol: String, ordCol: String,
      valCol: String): DataFrame = {
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col("__o").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wKey = Window.partitionBy(col(keyCol))
    val base = series.select(col(keyCol), col(ordCol).cast("long").as("__o"),
      col(valCol).cast("long").as("__x"))
    val scanned = base
      .withColumn("__n", count(lit(1)).over(wKey))
      .withColumn("__s", sum(col("__x")).over(wKey))
      .withColumn("__i", row_number().over(
        Window.partitionBy(col(keyCol)).orderBy(col("__o").asc)))
      .withColumn("__pfx", sum(col("__x")).over(wOrd))
      .withColumn("__cusum",
        col("__n") * col("__pfx") - col("__i") * col("__s"))
    scanned
      .withColumn("__rn", row_number().over(Window.partitionBy(col(keyCol))
        .orderBy(abs(col("__cusum")).desc, col("__o").asc)))
      .filter(col("__rn") === 1)
      .select(col(keyCol), col("__n").as("n_points"),
        col("__o").as("cp_ord"), col("__cusum").as("cusum_at_cp"),
        (abs(col("__cusum")).cast("double") / col("__n").cast("double"))
          .as("mean_shift_score"))
  }

  /** Lag-k autocorrelation per key over an ordered series of BIGINT
    * values (quantize floats first, as in [[cusumChangePoint]]): for
    * each lag in 1..maxLag,
    *
    *   r_k = Σ_{i<=n-k} (x_i - x̄)(x_{i+k} - x̄) / Σ_i (x_i - x̄)²
    *
    * computed with every term multiplied through by n² so numerator and
    * denominator are EXACT integer aggregates (DECIMAL(38,0) — the
    * [[Normalize.zscore]] moment discipline):
    *
    *   n²·num_k = n²·Σx_i·x_{i+k} - n·S·(Σ_head + Σ_tail) + (n-k)·S²
    *   n²·den   = n²·Σx²          - n·S²
    *
    * and ONE final double division. Bit-identical across engines;
    * the oracle mirrors term-for-term in HUGEINT.
    *
    * Scale shape: ranks come from one (key)-keyed window, the lag pairs
    * from one self-join keyed by (key, rank+lag) — series are
    * pre-bucketed and bounded per key, so both sides co-partition on the
    * key; output is O(keys × maxLag). Headroom: n²·Σx² must fit 38
    * digits — 1e5 points of 1e9-scale values is safe.
    *
    * Output: (keyCol, lag, n_points, acf); zero-variance keys emit NULL
    * acf, and a (key, lag) with no pairs (series shorter than lag+1) is
    * absent from the output entirely. */
  def autocorr(
      series: DataFrame, keyCol: String, ordCol: String, valCol: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val dec = "decimal(38,0)"
    // The ranked series feeds THREE consumers (both self-join sides and
    // the per-key moments); materialize it once — it is the pre-bucketed
    // series (bounded per key by construction), not the raw corpus, so
    // the checkpoint is small while the saved re-aggregations are not.
    val base = series.select(col(keyCol), col(ordCol).cast("long").as("__o"),
      col(valCol).cast("long").as("__x"))
      .withColumn("__i", row_number().over(
        Window.partitionBy(col(keyCol)).orderBy(col("__o").asc)))
      .localCheckpoint()
    val stats = base.groupBy(col(keyCol)).agg(
      count(lit(1)).cast(dec).as("__n"),
      sum(col("__x").cast(dec)).as("__s"),
      sum(col("__x").cast(dec) * col("__x").cast(dec)).as("__sxx"))
    val lags = (1 to maxLag).map(lit(_)).toArray
    val pairs = base.select(col(keyCol), col("__i"), col("__x"),
        explode(array(lags: _*)).as("lag"))
      .withColumn("__j", col("__i") + col("lag"))
      .as("h")
      .join(base.as("t"),
        col(s"h.$keyCol") === col(s"t.$keyCol") &&
          col("h.__j") === col("t.__i"))
      .select(col(s"h.$keyCol").as(keyCol), col("h.lag").as("lag"),
        col("h.__x").cast(dec).as("__xh"), col("t.__x").cast(dec).as("__xt"))
    val perLag = pairs.groupBy(col(keyCol), col("lag")).agg(
      sum(col("__xh") * col("__xt")).as("__sxy"),
      sum(col("__xh")).as("__sh"),
      sum(col("__xt")).as("__st"),
      count(lit(1)).cast(dec).as("__m"))
    perLag.join(stats, keyCol)
      .withColumn("__num",
        col("__n") * col("__n") * col("__sxy")
          - col("__n") * col("__s") * (col("__sh") + col("__st"))
          + col("__m") * col("__s") * col("__s"))
      .withColumn("__den",
        col("__n") * col("__n") * col("__sxx")
          - col("__n") * col("__s") * col("__s"))
      .select(col(keyCol), col("lag").cast("long").as("lag"),
        col("__n").cast("long").as("n_points"),
        when(col("__den") <= 0, lit(null).cast("double"))
          .otherwise(col("__num").cast("double") / col("__den").cast("double"))
          .as("acf"))
  }

  /** Dominant period detection — the ACF argmax: the lag in
    * [minLag, maxLag] with the highest autocorrelation is the series'
    * strongest cycle (24 for hourly data with a daily rhythm, 7 for
    * daily data with a weekly one). The pre-flight that picks the
    * `period` argument for [[seasonalIndex]]/[[decompose]] instead of
    * hard-coding it. Emits one row per key:
    * (keyCol, n_points, period, acf_peak).
    *
    * Determinism: [[autocorr]]'s values are ONE division of exact
    * DECIMAL(38,0) integers — bit-identical cross-engine — and the
    * argmax ranks by round(acf,8) DESC with the SMALLEST lag breaking
    * ties, so the picked period is stable even when two lags round to
    * the same peak. `minLag` ≥ 2 by default: lag 1 is trivially high
    * for any smooth series and is not a "period".
    *
    * Scale: [[autocorr]]'s shape (lag-exploded self-join over the
    * pre-bucketed series) plus one O(keys·lags) window — nothing new
    * touches the corpus. */
  def dominantPeriod(
      series: DataFrame, keyCol: String, ordCol: String, valCol: String,
      minLag: Int = 2, maxLag: Int = 12): DataFrame = {
    require(minLag >= 1 && maxLag >= minLag,
      s"need 1 <= minLag <= maxLag, got [$minLag, $maxLag]")
    val acf = autocorr(series, keyCol, ordCol, valCol, maxLag)
      .filter(col("lag") >= minLag)
    acf.withColumn("__rn", row_number().over(
        Window.partitionBy(col(keyCol))
          .orderBy(round(col("acf"), 8).desc_nulls_last, col("lag").asc)))
      .filter(col("__rn") === 1)
      .select(col(keyCol), col("n_points"), col("lag").as("period"),
        round(col("acf"), 8).as("acf_peak"))
  }

  /** Holt's linear-trend smoothing (double exponential smoothing) — the
    * step up from [[ewma]] when the series has a drift: a level AND a
    * trend state evolve together, and `level + h·trend` is the h-step
    * forecast (capacity planning, rate forecasting, data-volume
    * projection per source). Emits one row per key:
    * (keyCol, n_points, level, trend, forecast), with `forecast` the
    * `horizon`-step-ahead projection from the series end.
    *
    * Recurrence (standard init: l₁ = x₁, b₁ = 0):
    *   lₜ = α·xₜ + (1−α)·(lₜ₋₁ + bₜ₋₁)
    *   bₜ = β·(lₜ − lₜ₋₁) + (1−β)·bₜ₋₁
    *
    * Determinism: ONE strict left fold over the order-sorted series per
    * key carrying a (level, trend) struct accumulator — the [[ewma]]
    * discipline — so the floats are bit-identical across partitionings
    * and engines (DuckDB `list_reduce` over `struct_pack` replays it;
    * the lₜ subexpression is repeated inside the bₜ term IDENTICALLY on
    * both sides — DuckDB lambdas have no let-binding). Prefer dyadic α,
    * β (0.5, 0.25) so 1−α, 1−β are exact and the mirror is bit-safe.
    *
    * Scale: one shuffle keyed by `keyCol`; a key's full series must fit
    * in one task row (pre-aggregate to a bounded grid — e.g. hourly —
    * first), but unlike [[ewma]]'s per-prefix output the fold here is
    * O(n) per key. Rows with a NULL value are excluded (no observation,
    * not zero). */
  /** Per-key seasonal index over a caller-supplied period bucket
    * (hour-of-day, day-of-week): `mean(x in bucket) / mean(x overall)`
    * — the multiplicative seasonality profile that turns raw rates into
    * "1.4× the daily average at 9am" (load shaping, anomaly baselines,
    * the seasonal half of a decomposition whose trend half is [[holt]]).
    * Emits (keyCol, periodCol, n_obs, seasonal_idx).
    *
    * Exactness: with integral values, the index is
    * `(S_bucket·n)/(n_bucket·S)` — both products exact BIGINT, ONE
    * division. A zero or negative total yields NULL (an index against
    * no baseline). Scale: two map-side-combinable aggregates; the
    * per-key totals (O(keys)) broadcast back onto the O(keys × periods)
    * bucket rows. */
  def seasonalIndex(
      df: DataFrame, keyCol: String, periodCol: String, valCol: String)
      : DataFrame = {
    val base = df.where(col(valCol).isNotNull)
      .select(col(keyCol), col(periodCol),
        col(valCol).cast("long").as("__x"))
    val byPeriod = base.groupBy(col(keyCol), col(periodCol))
      .agg(count(lit(1)).as("n_obs"), sum(col("__x")).as("__sb"))
    val tot = base.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__s"))
    byPeriod.join(broadcast(tot), keyCol)
      .select(col(keyCol), col(periodCol), col("n_obs"),
        when(col("__s") <= 0L, lit(null).cast("double"))
          .otherwise((col("__sb") * col("__n")).cast("double") /
            (col("n_obs") * col("__s")).cast("double"))
          .as("seasonal_idx"))
  }

  def holt(
      df: DataFrame, keyCol: String, ordCol: String, valCol: String,
      alpha: Double, beta: Double, horizon: Int): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    require(beta >= 0.0 && beta <= 1.0, s"beta must be in [0, 1], got $beta")
    require(horizon >= 0, s"horizon must be >= 0, got $horizon")
    val series = array_sort(collect_list(struct(
      col(ordCol).cast("long").as("o"), col(valCol).cast("double").as("x"))))
    val zero = struct(lit(null).cast("double").as("l"),
      lit(null).cast("double").as("b"))
    val step = (acc: Column, e: Column) => {
      val newl = lit(alpha) * e.getField("l") +
        (lit(1.0) - lit(alpha)) * (acc.getField("l") + acc.getField("b"))
      when(acc.getField("l").isNull, e)
        .otherwise(struct(newl.as("l"),
          (lit(beta) * (newl - acc.getField("l")) +
            (lit(1.0) - lit(beta)) * acc.getField("b")).as("b")))
    }
    df.filter(col(valCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(series.as("__s"), count(lit(1)).as("n_points"))
      .select(col(keyCol), col("n_points"),
        aggregate(
          transform(col("__s"),
            e => struct(e.getField("x").as("l"), lit(0.0).as("b"))),
          zero, step).as("__f"))
      .select(col(keyCol), col("n_points"),
        col("__f.l").as("level"), col("__f.b").as("trend"),
        (col("__f.l") + lit(horizon.toDouble) * col("__f.b"))
          .as("forecast"))
  }

  /** 1-D Kalman filter, local-level model — the probabilistic sibling of
    * [[ewma]]: the smoothing weight (gain) is not a fixed α but adapts to
    * the tracked state variance. Per observation:
    * {{{
    *   p_pred = p + q                    // process noise inflates variance
    *   k      = p_pred / (p_pred + r)    // gain: trust data vs model
    *   l'     = l + k·(x − l)            // update level toward observation
    *   p'     = (1 − k)·p_pred           // posterior variance shrinks
    * }}}
    * Initialization: l = x_1, p = 1.0. Steady state: p converges to the
    * positive root of p² + pq − qr = 0, so the gate's final gain is a
    * stable regression target.
    *
    * Determinism: the fold runs over the `array_sort`-collected per-key
    * series (one aggregate, no windows); every step is a FIXED double
    * expression shape — `p_pred` is spelled `(p + q)` at each use site so
    * an oracle replaying the same text gets bit-identical IEEE results.
    * Scale: per-key state is 2 doubles; series must be pre-bucketed (the
    * [[autocorr]] contract). Output:
    * (keyCol, n_points, level, p_var, gain) — gain recomputed from the
    * final p in the same shape, forecast_1 = level (local-level model). */
  def kalmanLevel(
      df: DataFrame, keyCol: String, ordCol: String, valCol: String,
      q: Double, r: Double): DataFrame = {
    require(q > 0.0 && r > 0.0, s"noise variances must be > 0: q=$q r=$r")
    val series = array_sort(collect_list(struct(
      col(ordCol).cast("long").as("o"), col(valCol).cast("double").as("x"))))
    val zero = struct(lit(null).cast("double").as("l"),
      lit(null).cast("double").as("p"))
    val step = (acc: Column, e: Column) => {
      val x = e.getField("l")
      val gain = (acc.getField("p") + lit(q)) /
        ((acc.getField("p") + lit(q)) + lit(r))
      when(acc.getField("l").isNull,
        struct(x.as("l"), lit(1.0).as("p")))
        .otherwise(struct(
          (acc.getField("l") + gain * (x - acc.getField("l"))).as("l"),
          ((lit(1.0) - gain) * (acc.getField("p") + lit(q))).as("p")))
    }
    df.filter(col(valCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(series.as("__s"), count(lit(1)).as("n_points"))
      .select(col(keyCol), col("n_points"),
        aggregate(
          transform(col("__s"),
            e => struct(e.getField("x").as("l"), lit(0.0).as("p"))),
          zero, step).as("__f"))
      .select(col(keyCol), col("n_points"),
        col("__f.l").as("level"), col("__f.p").as("p_var"),
        ((col("__f.p") + lit(q)) / ((col("__f.p") + lit(q)) + lit(r)))
          .as("gain"))
  }

  /** Holt–Winters ADDITIVE triple exponential smoothing — [[holt]] plus a
    * length-`m` seasonal state vector:
    * {{{
    *   l_t = α·(x_t − s_{t−m}) + (1−α)·(l_{t−1} + b_{t−1})
    *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
    *   s_t = γ·(x_t − l_t)     + (1−γ)·s_{t−m}
    * }}}
    * Deterministic initialization (both engine and oracle replay it):
    * l = x_1, b = 0, s = 0⃗ — the seasonal profile is learned online, so
    * early forecasts are Holt-like and season emerges after one period.
    * Observation i (0-based) updates seasonal slot `i mod m`.
    *
    * IEEE discipline: pick α/β/γ whose complements are EXACT binary
    * doubles (0.5, 0.25, …) — the engine computes `1−α` by constant
    * folding and an oracle writes the literal; for non-exact α the two
    * differ in the last ulp. The updated-level subexpression inside the
    * trend and season terms is duplicated textually, same as [[holt]].
    *
    * Scale: one collect-per-key aggregate, state = m+2 doubles. Output:
    * (keyCol, n_points, level, trend, s_next, forecast) where s_next is
    * the seasonal slot the NEXT observation would hit (index n mod m)
    * and forecast = level + trend + s_next (horizon 1). */
  def holtWinters(
      df: DataFrame, keyCol: String, ordCol: String, valCol: String,
      alpha: Double, beta: Double, gamma: Double, m: Int): DataFrame = {
    require(m >= 2, s"season length must be >= 2, got $m")
    require(alpha > 0.0 && alpha <= 1.0, s"alpha out of (0,1]: $alpha")
    val series = array_sort(collect_list(struct(
      col(ordCol).cast("long").as("o"), col(valCol).cast("double").as("x"))))
    val zero = struct(lit(null).cast("double").as("l"),
      lit(0.0).as("b"),
      array_repeat(lit(0.0), m).as("s"),
      lit(0L).as("i"))
    val step = (acc: Column, x: Column) => {
      val i = acc.getField("i") // 0-based index of THIS observation
      val pos = pmod(i, lit(m.toLong))
      val sOld = element_at(acc.getField("s"), pos.cast("int") + 1)
      val newl = lit(alpha) * (x - sOld) +
        (lit(1.0) - lit(alpha)) * (acc.getField("l") + acc.getField("b"))
      val newb = lit(beta) * (newl - acc.getField("l")) +
        (lit(1.0) - lit(beta)) * acc.getField("b")
      val news = lit(gamma) * (x - newl) + (lit(1.0) - lit(gamma)) * sOld
      val sUpd = zip_with(acc.getField("s"),
        sequence(lit(0L), lit(m.toLong - 1L)),
        (v, j) => when(j === pos, news).otherwise(v))
      when(acc.getField("l").isNull,
        struct(x.as("l"), lit(0.0).as("b"), acc.getField("s").as("s"),
          lit(1L).as("i")))
        .otherwise(struct(newl.as("l"), newb.as("b"), sUpd.as("s"),
          (i + 1L).as("i")))
    }
    df.filter(col(valCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(series.as("__s"), count(lit(1)).as("n_points"))
      .select(col(keyCol), col("n_points"),
        aggregate(transform(col("__s"), _.getField("x")), zero, step)
          .as("__f"))
      .select(col(keyCol), col("n_points"),
        col("__f.l").as("level"), col("__f.b").as("trend"),
        element_at(col("__f.s"),
          pmod(col("n_points"), lit(m.toLong)).cast("int") + 1)
          .as("s_next"))
      .withColumn("forecast",
        col("level") + col("trend") + col("s_next"))
  }

  /** Per-group ordinary least squares — the trend line behind "is this
    * metric growing and how fast": slope, intercept, and R² of y over x
    * for each key. Emits (keyCol, n_points, slope, intercept, r2).
    *
    * Determinism: both columns must be exact LONGS (quantize doubles
    * first — the ts_cusum `floor(·1024)` discipline); all five moments
    * (n, Σx, Σy, Σxy, Σx², Σy²) accumulate as DECIMAL(38,0) — exact and
    * order-independent, the [[autocorr]] pattern — and the normal-
    * equation numerators (nΣxy − ΣxΣy etc.) are exact decimal products.
    * Only the final slope/intercept/R² divisions run in IEEE doubles,
    * in a fixed shape mirrored by the oracle. Groups with zero x-spread
    * emit NaN slope/r2 (0/0) rather than failing.
    *
    * Bound: decimal(38,0) holds nΣx² for |x|,|y| ≤ ~1e12 at ~1e12 rows —
    * beyond that, pre-center x per group before quantizing.
    * Scale: ONE map-side-combinable aggregate per group; no windows, no
    * joins. */
  /** Theil-Sen robust trend — the median of all pairwise slopes
    * `(y_j − y_i)/(x_j − x_i)`, i < j in x: one wild hour can drag an
    * OLS slope ([[linearRegression]]) arbitrarily; the pairwise median
    * shrugs off up to ~29% contamination (the estimator's breakdown
    * point). Emits (keyCol, n_pairs, slope_per_x).
    *
    * Determinism: with integral inputs every slope is ONE division of
    * exact longs (bit-identical cross-engine); the median is an ELEMENT
    * PICK — rows ranked by (slope, x_i, x_j), take rank ⌈n/2⌉ (lower
    * median) — never an average of floats. Scale: the pair join is
    * per-key O(n²) over the PRE-BUCKETED series (the [[autocorr]]
    * contract: bucket to hours/days first — 720 hourly points is 259k
    * pairs, not a corpus join); ranking is a per-key window over those
    * pairs. */
  def theilSen(
      series: DataFrame, keyCol: String, ordCol: String,
      valCol: String): DataFrame = {
    val base = series.select(col(keyCol), col(ordCol).cast("long").as("__o"),
      col(valCol).cast("long").as("__x"))
    val pairs = base.as("a").join(base.as("b"),
        col(s"a.$keyCol") === col(s"b.$keyCol") &&
          col("a.__o") < col("b.__o"))
      .select(col(s"a.$keyCol").as(keyCol),
        col("a.__o").as("__oi"), col("b.__o").as("__oj"),
        ((col("b.__x") - col("a.__x")).cast("double") /
          (col("b.__o") - col("a.__o")).cast("double")).as("__slope"))
    pairs
      .withColumn("__rn", row_number().over(Window.partitionBy(col(keyCol))
        .orderBy(col("__slope").asc, col("__oi").asc, col("__oj").asc)))
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy(col(keyCol))))
      .filter(col("__rn") === expr("(__cnt + 1) div 2"))
      .select(col(keyCol), col("__cnt").as("n_pairs"),
        col("__slope").as("slope_per_x"))
  }

  /** Mann-Kendall trend test — Theil-Sen's significance companion: is
    * there ANY monotone trend? `S = Σ_{i<j} sign(y_j − y_i)` over the
    * x-ordered series, tie-corrected variance
    * `var = (n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)) / 18`, and the
    * continuity-corrected `z = (S ∓ 1)/√var`. Emits
    * (keyCol, n_points, s_stat, z).
    *
    * Exactness: S and the variance numerator are exact BIGINTs (n = 10⁴
    * points keeps n³ < 10¹³); z is a fixed-shape float — one division
    * by 18, one IEEE sqrt, one division. Zero variance (all values
    * tied) yields z = NULL; S = 0 yields z = 0 (no-trend center, no
    * correction). Scale: same per-key O(n²) pair join as [[theilSen]]
    * over the pre-bucketed series, plus two O(n)-group aggregates. */
  def mannKendall(
      series: DataFrame, keyCol: String, ordCol: String,
      valCol: String): DataFrame = {
    val base = series.select(col(keyCol), col(ordCol).cast("long").as("__o"),
      col(valCol).cast("long").as("__x"))
    val s = base.as("a").join(base.as("b"),
        col(s"a.$keyCol") === col(s"b.$keyCol") &&
          col("a.__o") < col("b.__o"))
      .groupBy(col(s"a.$keyCol").as(keyCol))
      .agg(coalesce(sum(when(col("b.__x") > col("a.__x"), 1L)
        .when(col("b.__x") < col("a.__x"), -1L).otherwise(0L)), lit(0L))
        .as("s_stat"))
    val n = base.groupBy(col(keyCol)).agg(count(lit(1)).as("__n"))
    val ties = base.groupBy(col(keyCol), col("__x"))
      .agg(count(lit(1)).as("__t"))
      .groupBy(col(keyCol))
      .agg(coalesce(sum(col("__t") * (col("__t") - 1L) *
        (lit(2L) * col("__t") + 5L)), lit(0L)).as("__tt"))
    val varNum = col("__n") * (col("__n") - 1L) *
      (lit(2L) * col("__n") + 5L) - col("__tt")
    val vr = varNum.cast("double") / lit(18.0)
    s.join(n, keyCol).join(ties, keyCol)
      .select(col(keyCol), col("__n").as("n_points"), col("s_stat"),
        when(varNum <= 0L, lit(null).cast("double"))
          .otherwise(when(col("s_stat") > 0L,
              (col("s_stat") - 1L).cast("double") / sqrt(vr))
            .when(col("s_stat") < 0L,
              (col("s_stat") + 1L).cast("double") / sqrt(vr))
            .otherwise(lit(0.0))).as("z"))
  }

  /** MACD (moving-average convergence/divergence) with signal-line
    * crossover counting — the classic two-EWMA momentum detector, made
    * oracle-exact: fast (α=1/2) and slow (α=1/4) EWMAs, macd = fast −
    * slow, signal = EWMA(α=1/2) of macd, histogram = macd − signal;
    * a CROSSOVER is a strict sign flip of the histogram between
    * consecutive points (zero does not flip — the pinned convention).
    * All smoothing constants exact binary, every sub-expression
    * duplicated textually in the oracle's recursive CTE (the
    * [[kalmanLevel]] discipline), init f=s=x₁ ⇒ macd/signal/hist = 0.
    * One fold per key over the collected pre-bucketed series. Output:
    * (key, n_points, macd, signal, histogram, n_crossovers). */
  def macd(
      df: DataFrame, keyCol: String, ordCol: String, valCol: String)
      : DataFrame = {
    val series = array_sort(collect_list(struct(
      col(ordCol).cast("long").as("o"), col(valCol).cast("double").as("x"))))
    val zero = struct(lit(null).cast("double").as("f"),
      lit(0.0).as("sl"), lit(0.0).as("sg"), lit(0.0).as("pd"),
      lit(0L).as("cx"))
    val step = (acc: Column, x: Column) => {
      val f = lit(0.5) * x + lit(0.5) * acc.getField("f")
      val sl = lit(0.25) * x + lit(0.75) * acc.getField("sl")
      val m = f - sl
      val sg = lit(0.5) * m + lit(0.5) * acc.getField("sg")
      val d = m - sg
      val flip = (acc.getField("pd") > 0.0 && d < 0.0) ||
        (acc.getField("pd") < 0.0 && d > 0.0)
      when(acc.getField("f").isNull,
        struct(x.as("f"), x.as("sl"), lit(0.0).as("sg"), lit(0.0).as("pd"),
          lit(0L).as("cx")))
        .otherwise(struct(f.as("f"), sl.as("sl"), sg.as("sg"), d.as("pd"),
          (acc.getField("cx") + when(flip, 1L).otherwise(0L)).as("cx")))
    }
    df.filter(col(valCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(series.as("__s"), count(lit(1)).as("n_points"))
      .select(col(keyCol), col("n_points"),
        aggregate(transform(col("__s"), _.getField("x")), zero, step)
          .as("__f"))
      .select(col(keyCol), col("n_points"),
        (col("__f.f") - col("__f.sl")).as("macd"),
        col("__f.sg").as("signal"),
        col("__f.pd").as("histogram"),
        col("__f.cx").as("n_crossovers"))
  }

  /** SEASONAL Mann-Kendall — [[mannKendall]] restricted to same-season
    * pairs (Hirsch–Slack): a daily series with a weekly cycle shows a
    * spurious plain-MK "trend" inside every week; comparing day-k only
    * with other day-k observations removes the cycle from the test.
    * S and the tie-corrected variance accumulate PER SEASON as exact
    * integers, then sum (the seasons are independent under H0); the
    * continuity-corrected z runs in the same pinned float shape as
    * plain MK. Output: (key, n_points, n_seasons, s_stat, z).
    *
    * Scale: the pair join is per-(key, season) O(n_s²) over the
    * PRE-BUCKETED series ([[autocorr]] contract) — seasons split the
    * quadratic term m ways. */
  def seasonalMannKendall(
      series: DataFrame, keyCol: String, ordCol: String, valCol: String,
      seasonCol: String): DataFrame = {
    val base = series.select(col(keyCol),
      col(seasonCol).cast("long").as("__m"),
      col(ordCol).cast("long").as("__o"), col(valCol).cast("long").as("__x"))
    val s = base.as("a").join(base.as("b"),
        col(s"a.$keyCol") === col(s"b.$keyCol") &&
          col("a.__m") === col("b.__m") && col("a.__o") < col("b.__o"))
      .groupBy(col(s"a.$keyCol").as(keyCol))
      .agg(coalesce(sum(when(col("b.__x") > col("a.__x"), 1L)
        .when(col("b.__x") < col("a.__x"), -1L).otherwise(0L)), lit(0L))
        .as("s_stat"))
    val n = base.groupBy(col(keyCol)).agg(count(lit(1)).as("n_points"),
      countDistinct(col("__m")).as("n_seasons"))
    val perSeason = base.groupBy(col(keyCol), col("__m"))
      .agg(count(lit(1)).as("__ns"))
    val ties = base.groupBy(col(keyCol), col("__m"), col("__x"))
      .agg(count(lit(1)).as("__t"))
      .groupBy(col(keyCol), col("__m"))
      .agg(coalesce(sum(col("__t") * (col("__t") - 1L) *
        (lit(2L) * col("__t") + 5L)), lit(0L)).as("__tt"))
    val varNumSeason = perSeason.join(ties, Seq(keyCol, "__m"))
      .select(col(keyCol),
        (col("__ns") * (col("__ns") - 1L) * (lit(2L) * col("__ns") + 5L) -
          col("__tt")).as("__vn"))
      .groupBy(col(keyCol)).agg(sum(col("__vn")).as("__varnum"))
    val vr = col("__varnum").cast("double") / lit(18.0)
    s.join(n, keyCol).join(varNumSeason, keyCol)
      .select(col(keyCol), col("n_points"), col("n_seasons"), col("s_stat"),
        when(col("__varnum") <= 0L, lit(null).cast("double"))
          .otherwise(when(col("s_stat") > 0L,
              (col("s_stat") - 1L).cast("double") / sqrt(vr))
            .when(col("s_stat") < 0L,
              (col("s_stat") + 1L).cast("double") / sqrt(vr))
            .otherwise(lit(0.0))).as("z"))
  }

  def linearRegression(
      series: DataFrame, keyCol: String, xCol: String,
      yCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val x = col(xCol).cast("long").cast(dec)
    val y = col(yCol).cast("long").cast(dec)
    val m = series.groupBy(col(keyCol)).agg(
      count(lit(1)).cast(dec).as("__n"),
      sum(x).as("__sx"), sum(y).as("__sy"),
      sum(x * y).as("__sxy"), sum(x * x).as("__sxx"),
      sum(y * y).as("__syy"))
    val sxyN = (col("__n") * col("__sxy") - col("__sx") * col("__sy"))
      .cast("double")
    val sxxN = (col("__n") * col("__sxx") - col("__sx") * col("__sx"))
      .cast("double")
    val syyN = (col("__n") * col("__syy") - col("__sy") * col("__sy"))
      .cast("double")
    // NULL (not NaN/Inf) on zero spread: ANSI double division THROWS on
    // a zero divisor (the nanSafeCos lesson), and NULL is the honest
    // "no trend defined" answer for a single-x or constant-y group.
    m.withColumn("slope",
        when(sxxN =!= 0.0, sxyN / sxxN))
      .select(col(keyCol), col("__n").cast("long").as("n_points"),
        col("slope"),
        ((col("__sy").cast("double") -
          col("slope") * col("__sx").cast("double")) /
          col("__n").cast("double")).as("intercept"),
        when(sxxN =!= 0.0 && syyN =!= 0.0,
          sxyN * sxyN / (sxxN * syyN)).as("r2"))
  }

  /** Classical additive decomposition — x = trend + seasonal + residual
    * over a regular integer-valued series: trend is the centered
    * `window`-point moving average, the seasonal profile is the
    * per-phase (t mod `period`) mean of the detrended values, and the
    * residual is what's left — the ts-anomaly preprocessor that stops a
    * daily rhythm from masquerading as drift. Emits one row per
    * FULL-WINDOW point: (keyCol, tCol, xCol, trend, seasonal, resid);
    * the `window/2` edge points have no centered average and are
    * dropped (documented; the oracle mirrors).
    *
    * ALL-EXACT-NUMERATOR determinism (`xCol` must be an exact long —
    * the ts_cusum quantization discipline): the window sum S is an
    * exact long, the detrended numerator `x·window − S` is an exact
    * long, the seasonal numerator Σ(x·window − S) per phase is an exact
    * long sum — so trend = S/window, seasonal = Σ/(count·window) and
    * the residual chain are fixed IEEE expressions over exact integers,
    * bit-identical across engines and partitionings (a float detrended
    * MEAN would be shuffle-order dependent).
    *
    * Scale: one key-shuffled rows-bounded window, one (key, phase)
    * aggregate broadcast back — both map-side-friendly; no global
    * state. */
  def decompose(
      series: DataFrame, keyCol: String, tCol: String, xCol: String,
      window: Int, period: Int): DataFrame = {
    require(window >= 3 && window % 2 == 1,
      s"window must be odd >= 3, got $window")
    require(period >= 2, s"period must be >= 2, got $period")
    val half = window / 2
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tCol))
      .rowsBetween(-half, half)
    val full = series
      .withColumn("__s", sum(col(xCol)).over(w))
      .withColumn("__nw", count(lit(1)).over(w))
      .filter(col("__nw") === window)
      .withColumn("__dnum", col(xCol) * window - col("__s"))
      .withColumn("__ph", pmod(col(tCol), lit(period)))
    val seasonal = full.groupBy(col(keyCol), col("__ph"))
      .agg(sum(col("__dnum")).as("__snum"), count(lit(1)).as("__scnt"))
    full.join(seasonal, Seq(keyCol, "__ph"))
      .select(col(keyCol), col(tCol), col(xCol),
        (col("__s").cast("double") / window).as("trend"),
        (col("__snum").cast("double") /
          (col("__scnt") * window).cast("double")).as("seasonal"),
        ((col("__dnum").cast("double") / window) -
          col("__snum").cast("double") /
            (col("__scnt") * window).cast("double")).as("resid"))
  }

  /** Rolling robust anomaly flags over a regular integer-valued series —
    * the outlier detector that survives the outliers it hunts (a rolling
    * MEAN/σ is dragged by the very spike it should flag; median/MAD are
    * not): for each (key, t) point, the LOWER median and MAD of the
    * trailing `window` points (inclusive), and
    * `|x − med| > k·mad` as the anomaly flag.
    *
    * ALL-INTEGER determinism contract: `xCol` must be an exact LONG
    * (quantize doubles first — the `floor(value·1024)` ts_cusum
    * discipline); medians are ELEMENT PICKS (lower median at position
    * (n+1) div 2 of the sorted window — never the averaged middle pair,
    * which would reintroduce float arithmetic), so med, mad, and the
    * flag comparison are pure integer ops, bit-identical across engines
    * and partitionings. Warm-up rows (fewer than `window` points yet)
    * still emit over their shorter prefix — callers filter on `n_win` if
    * they want full windows only.
    *
    * Scale: one shuffle on the key; per-row state is the `window`-sized
    * list inside a rows-bounded frame (tiny, constant). The series is
    * the DOWNSTREAM of an aggregation (hourly/daily rollup), so rows per
    * key = time buckets, not raw events. */
  def rollingMadAnomaly(
      series: DataFrame, keyCol: String, tCol: String, xCol: String,
      window: Int = 7, k: Long = 3L): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    require(k >= 1L, s"k must be >= 1, got $k")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tCol))
      .rowsBetween(-(window - 1), Window.currentRow)
    val lowerMedian = (xs: Column) =>
      element_at(sort_array(xs), ((size(xs) + 1) / 2).cast("int"))
    series
      .withColumn("__l", collect_list(col(xCol)).over(w))
      .withColumn("med", lowerMedian(col("__l")))
      .withColumn("mad",
        lowerMedian(transform(col("__l"), x => abs(x - col("med")))))
      .select(col(keyCol), col(tCol), col(xCol),
        size(col("__l")).cast("long").as("n_win"), col("med"), col("mad"),
        (abs(col(xCol) - col("med")) > lit(k) * col("mad")).as("is_anomaly"))
  }

  /** Trend/seasonal strength of a decomposed series — Hyndman's
    * scale-free series-health numbers on top of [[decompose]]:
    * `F_T = max(0, 1 − Var(R)/Var(T+R))` and
    * `F_S = max(0, 1 − Var(R)/Var(S+R))`, both in [0, 1] — the
    * one-glance read of "is there any structure worth forecasting".
    *
    * Determinism: the decomposition's doubles are fixed-shape (bit
    * reproducible cross-engine), so each component is floor-QUANTIZED
    * to 2⁻²⁰ units and the variances become exact integer forms
    * `n·Σq² − S²` (DECIMAL(38,0) products); the strengths are ratios of
    * those exact integers — the quantization scale cancels — with one
    * division and a `greatest(0, ·)` each. Degenerate variance → NULL.
    *
    * Scale: [[decompose]]'s cost plus one map-side-combinable moment
    * aggregate; output O(keys). */
  def decompositionStrength(
      series: DataFrame, keyCol: String, tCol: String, xCol: String,
      window: Int, period: Int): DataFrame = {
    val dec = "decimal(38,0)"
    val q = 1048576.0
    val d = decompose(series, keyCol, tCol, xCol, window, period)
      .select(col(keyCol),
        floor(col("resid") * q).cast("long").as("__r"),
        floor((col("trend") + col("resid")) * q).cast("long").as("__tr"),
        floor((col("seasonal") + col("resid")) * q).cast("long").as("__sr"))
    def mom(c: String) = Seq(
      sum(col(c).cast(dec)).as(s"s$c"),
      sum(col(c).cast(dec) * col(c).cast(dec)).as(s"q$c"))
    val m = d.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        (mom("__r") ++ mom("__tr") ++ mom("__sr")): _*)
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    def num(c: String) =
      d38(col("n")) * col(s"q$c") - col(s"s$c") * col(s"s$c")
    def strength(c: String) =
      when(num(c) <= d38(lit(0L)), lit(null).cast("double"))
        .otherwise(greatest(lit(0.0),
          lit(1.0) - num("__r").cast("double") / num(c).cast("double")))
    m.select(col(keyCol), col("n"),
      strength("__tr").as("f_trend"),
      strength("__sr").as("f_seasonal"))
  }

  /** Lagged cross-correlation between two aligned integer series —
    * [[autocorr]]'s two-signal sibling, the "does X lead Y?" readout
    * (do clicks at hour t predict purchases at t+ℓ?): for each lag
    * ℓ ∈ [0, maxLag], Pearson r over the pairs (x_i, y_{i+ℓ}) on the
    * shared index grid.
    *
    * Determinism: all six paired moments (m, Σx, Σy, Σxy, Σx², Σy²)
    * are exact DECIMAL(38,0) integers;
    * `r = (m·Σxy − Σx·Σy) / √((m·Σxx − Σx²)·(m·Σyy − Σy²))` is one
    * fixed-shape float (IEEE-correct sqrt, no libm transcendentals),
    * NULL when either paired variance vanishes.
    *
    * Scale: the input is a pre-bucketed series (hundreds of rows, not
    * the corpus), so the one unpartitioned row_number window is
    * O(series); the lag pairing is an equi-join on the index, per-lag
    * moments are one map-side-combinable aggregate. */
  def crossCorrelation(
      series: DataFrame, ordCol: String, xCol: String, yCol: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 0, s"maxLag must be >= 0, got $maxLag")
    val dec = "decimal(38,0)"
    val base = series.select(col(ordCol).cast("long").as("__o"),
        col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
      .withColumn("__i", row_number().over(Window.orderBy(col("__o").asc)))
      .localCheckpoint()
    val lags = (0 to maxLag).map(lit(_)).toArray
    val pairs = base.select(col("__i"), col("__x"),
        explode(array(lags: _*)).as("lag"))
      .withColumn("__j", col("__i") + col("lag")).as("h")
      .join(base.select(col("__i").as("__j"), col("__y")).as("t2"), "__j")
      .select(col("lag"), col("__x").cast(dec).as("__xd"),
        col("__y").cast(dec).as("__yd"))
    val m = pairs.groupBy(col("lag")).agg(
      count(lit(1)).cast(dec).as("__m"),
      sum(col("__xd")).as("__sx"), sum(col("__yd")).as("__sy"),
      sum(col("__xd") * col("__yd")).as("__sxy"),
      sum(col("__xd") * col("__xd")).as("__sxx"),
      sum(col("__yd") * col("__yd")).as("__syy"))
    val num = col("__m") * col("__sxy") - col("__sx") * col("__sy")
    val dx = col("__m") * col("__sxx") - col("__sx") * col("__sx")
    val dy = col("__m") * col("__syy") - col("__sy") * col("__sy")
    m.select(col("lag").cast("long").as("lag"),
      col("__m").cast("long").as("n_pairs"),
      when(dx <= 0 || dy <= 0, lit(null).cast("double"))
        .otherwise(num.cast("double") /
          sqrt(dx.cast("double") * dy.cast("double"))).as("xcorr"))
  }

  /** Seasonal-naive forecast backtest with MASE — the honest first
    * baseline every forecasting pipeline must beat: predict each test
    * bucket by the value one season earlier (`t − seasonLag`), score
    * MAE against actuals, and normalize by the in-sample one-step naive
    * MAE (MASE, Hyndman's scale-free standard — MASE < 1 beats naive).
    *
    * Input: a keyed integer series (key, t, vq) with quantized values
    * on an integer time grid. The last `testLen` buckets (by the GLOBAL
    * max t — one broadcast scalar) are the test window; a test bucket
    * scores only if `t − seasonLag` exists (inner join — gappy grids
    * drop, counted by `n_test`). The naive denominator is
    * |vq − lag(vq)| over the train window's EXISTING buckets in t-order
    * (the gap-tolerant convention, deterministic and documented).
    *
    * Emits per key: (key, n_test, sum_abs_err_q, n_naive,
    * sum_naive_q, mase) — sums exact BIGINTs, `mase =
    * (sum_err/n_test)/(sum_naive/n_naive)` one fixed-shape float, NULL
    * when either side is empty or the naive MAE is 0.
    *
    * Scale: one hash aggregate to the bucket grid, one keyed equi-join
    * (t → t − seasonLag, never a range join), one keyed window, two
    * rollups — all shuffles on the series key. */
  def seasonalNaiveBacktest(
      series: DataFrame, keyCol: String, tCol: String, vCol: String,
      seasonLag: Long, testLen: Long): DataFrame = {
    require(seasonLag > 0L, s"seasonLag must be > 0, got $seasonLag")
    require(testLen > 0L, s"testLen must be > 0, got $testLen")
    val base = series.select(col(keyCol).as("__k"),
      col(tCol).cast("long").as("__t"), col(vCol).cast("long").as("__v"))
    val mx = base.agg(max(col("__t")).as("__mx"))
    val b = base.crossJoin(broadcast(mx))
      .withColumn("__isTest", col("__t") > col("__mx") - testLen)
    val test = b.filter(col("__isTest"))
      .select(col("__k"), col("__t"), col("__v"))
    val hist = b.filter(!col("__isTest"))
    val fc = test.as("a").join(
      hist.select(col("__k"), (col("__t") + seasonLag).as("__t"),
        col("__v").as("__f")).as("f"),
      Seq("__k", "__t"))
    val errs = fc.groupBy(col("__k"))
      .agg(count(lit(1)).as("n_test"),
        sum(abs(col("__v") - col("__f"))).as("sum_abs_err_q"))
    val seq = Window.partitionBy(col("__k")).orderBy(col("__t"))
    val naive = hist
      .withColumn("__p", lag(col("__v"), 1).over(seq))
      .filter(col("__p").isNotNull)
      .groupBy(col("__k"))
      .agg(count(lit(1)).as("n_naive"),
        sum(abs(col("__v") - col("__p"))).as("sum_naive_q"))
    errs.join(naive, Seq("__k"))
      .select(col("__k").as(keyCol), col("n_test"), col("sum_abs_err_q"),
        col("n_naive"), col("sum_naive_q"),
        when(col("n_test") === 0L || col("n_naive") === 0L ||
          col("sum_naive_q") === 0L, lit(null).cast("double"))
          .otherwise(
            (col("sum_abs_err_q").cast("double") /
              col("n_test").cast("double")) /
              (col("sum_naive_q").cast("double") /
                col("n_naive").cast("double"))).as("mase"))
  }

  /** Kaplan–Meier survival estimator over right-censored durations —
    * the churn/retention readout that handles "still active" users
    * honestly: a subject contributes risk up to its observed duration,
    * and only EVENTS (not censorings) step the curve down.
    * `S(d) = Π_{d' ≤ d} (1 − events(d') / at_risk(d'))`.
    *
    * Input: one row per subject with an integer duration and an event
    * flag (true = terminal event observed, false = censored). Emits one
    * row per distinct duration: (duration, n_at_risk, n_events,
    * n_censored, survival).
    *
    * Determinism: at-risk and event counts are exact BIGINTs (suffix
    * window sums over the distinct-duration rows); the product is
    * replayed as `exp(Σ ln(1 − d/n))` with each ln term pinned
    * `round(·, 8)` (the engine libm discipline), summed in ascending
    * duration order (a sequential running frame — the oracle replays
    * with a strict list fold), and the final value pinned at 8. A
    * duration where everyone at risk dies yields survival 0 exactly
    * (the ln-term NULL guard, never a `ln(0)` engine discrepancy);
    * later durations cannot exist by construction.
    *
    * Scale: one aggregate to O(distinct durations) rows, then windows
    * OVER THAT AGGREGATE only (hundreds of rows — never a corpus-wide
    * unpartitioned window); subject-level work is one map-side
    * combinable groupBy. */
  def kaplanMeier(
      subjects: DataFrame, durationCol: String, eventCol: String)
      : DataFrame = {
    val perDur = subjects
      .select(col(durationCol).cast("long").as("duration"),
        when(col(eventCol), 1L).otherwise(0L).as("__e"))
      .where(col("duration").isNotNull)
      .groupBy(col("duration"))
      .agg(count(lit(1)).as("__n"), sum(col("__e")).as("n_events"))
    val asc = Window.orderBy(col("duration"))
    val atRisk = sum(col("__n")).over(
      Window.orderBy(col("duration"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    val term = when(col("n_events") === col("n_at_risk"),
      lit(null).cast("double"))
      .otherwise(round(log(lit(1.0) -
        col("n_events").cast("double") / col("n_at_risk").cast("double")),
        8))
    perDur
      .withColumn("n_at_risk", atRisk)
      .withColumn("__t", term)
      .withColumn("survival",
        when(col("__t").isNull, lit(0.0)).otherwise(
          round(exp(sum(col("__t")).over(
            asc.rowsBetween(Window.unboundedPreceding, Window.currentRow))),
            8)))
      .select(col("duration"), col("n_at_risk"), col("n_events"),
        (col("__n") - col("n_events")).as("n_censored"), col("survival"))
  }

  /** Single-changepoint detection by binary segmentation (the CUSUM
    * mean-shift argmax — Scott & Knott / binary-seg's first split):
    * across each key's ordered series, the split index t maximizing the
    * between-segment separation `g(t) = (P_t·n − S·t)² / (t·(n−t))`
    * (∝ the squared two-sample mean gap, weight t(n−t)/n). Where
    * [[cusum]] ANSWERS "did the level drift past a threshold while
    * streaming?", this answers "where exactly did the level break?" —
    * the retro segmentation read. One row per key:
    * (key, n_points, cp_index, cp_ord, mean_left, mean_right, g_stat).
    *
    * Exactness: values are caller-quantized longs; prefix sums, the
    * squared numerator, and the denominator ride DECIMAL(38,0), so
    * g(t)'s operands are exact and the double is ONE division —
    * bit-identical cross-engine; the argmax ties break on SMALLEST t.
    * Means are exact-integer ratios divided once by `scale`. Series
    * with n < 2 emit nothing (no split exists).
    *
    * Scale: one shuffle keyed by `keyCol` for the rank/prefix windows
    * over the PRE-AGGREGATED series (bounded per key by the caller's
    * grid, not the raw corpus), then one grouped argmax. */
  def changepointBinary(
      series: DataFrame, keyCol: String, ordCol: String, valCol: String,
      scale: Double): DataFrame = {
    val dec = "decimal(38,0)"
    val perKey = Window.partitionBy(col(keyCol))
    val base = series.select(col(keyCol), col(ordCol).cast("long").as("__o"),
        col(valCol).cast("long").as("__x"))
      .withColumn("__i",
        row_number().over(perKey.orderBy(col("__o").asc)).cast(dec))
      .withColumn("__p",
        sum(col("__x").cast(dec)).over(perKey.orderBy(col("__o").asc)
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__n", count(lit(1)).over(perKey).cast(dec))
      .withColumn("__s", sum(col("__x").cast(dec)).over(perKey))
    val cand = base.filter(col("__i") < col("__n"))
      .withColumn("__d", col("__p") * col("__n") - col("__s") * col("__i"))
      .withColumn("__g",
        (col("__d") * col("__d")).cast("double") /
          (col("__i") * (col("__n") - col("__i"))).cast("double"))
    cand.groupBy(col(keyCol))
      .agg(max(struct(col("__g"), (-col("__i").cast("long")).as("__ni"),
        col("__o"), col("__p"), col("__n"), col("__s"))).as("__t"))
      .select(col(keyCol),
        col("__t.__n").cast("long").as("n_points"),
        (-col("__t.__ni")).as("cp_index"),
        col("__t.__o").as("cp_ord"),
        (col("__t.__p").cast("double") /
          ((-col("__t.__ni")).cast("double") * lit(scale)))
          .as("mean_left"),
        ((col("__t.__s") - col("__t.__p")).cast("double") /
          ((col("__t.__n").cast("long") + col("__t.__ni")).cast("double") *
            lit(scale))).as("mean_right"),
        col("__t.__g").as("g_stat"))
  }

  /** Partial autocorrelation at lags 1–3 via the Durbin-Levinson
    * recursion unrolled in closed form over [[autocorr]]'s exact-form
    * ACF: φ₁₁ = ρ₁, φ₂₂ = (ρ₂−ρ₁²)/(1−ρ₁²),
    * φ₃₃ = (ρ₃−φ₂₁ρ₂−φ₂₂ρ₁)/(1−φ₂₁ρ₁−φ₂₂ρ₂) with φ₂₁ = ρ₁−φ₂₂ρ₁ —
    * the AR-order read the ACF alone can't give (an AR(1)'s ACF decays
    * forever; its PACF cuts off at 1). One row per key:
    * (key, n_points, pacf1, pacf2, pacf3).
    *
    * Determinism: each ρ is [[autocorr]]'s single exact-integer
    * division; every φ is a fixed chain of IEEE ·/−// on those doubles,
    * written in one canonical operand order mirrored verbatim by the
    * oracle. Degenerate denominators (|1−ρ₁²| = 0 etc.) yield NULL at
    * that level and below. Scale: [[autocorr]] does the corpus work;
    * the pivot+arithmetic runs on O(keys) rows. */
  def pacf(series: DataFrame, keyCol: String, ordCol: String,
      valCol: String): DataFrame = {
    val acf = autocorr(series, keyCol, ordCol, valCol, maxLag = 3)
    val piv = acf.groupBy(col(keyCol)).agg(
      max(col("n_points")).as("n_points"),
      max(when(col("lag") === 1L, col("acf"))).as("__r1"),
      max(when(col("lag") === 2L, col("acf"))).as("__r2"),
      max(when(col("lag") === 3L, col("acf"))).as("__r3"))
    val p2den = lit(1.0) - col("__r1") * col("__r1")
    val withP2 = piv
      .withColumn("pacf1", col("__r1"))
      .withColumn("pacf2",
        when(col("__r1").isNull || col("__r2").isNull || p2den === 0.0,
          lit(null).cast("double"))
          .otherwise((col("__r2") - col("__r1") * col("__r1")) / p2den))
      .withColumn("__p21",
        col("__r1") - col("pacf2") * col("__r1"))
    val p3den = lit(1.0) - col("__p21") * col("__r1") -
      col("pacf2") * col("__r2")
    withP2
      .withColumn("pacf3",
        when(col("pacf2").isNull || col("__r3").isNull || p3den === 0.0,
          lit(null).cast("double"))
          .otherwise((col("__r3") - col("__p21") * col("__r2") -
            col("pacf2") * col("__r1")) / p3den))
      .select(col(keyCol), col("n_points"), col("pacf1"), col("pacf2"),
        col("pacf3"))
  }

  /** Ljung-Box portmanteau statistic over [[autocorr]]'s exact-form
    * ACF: Q = n(n+2)·Σ_{k=1..h} ρ_k²/(n−k) — the "is there ANY serial
    * correlation left" test run on model residuals before trusting a
    * forecast. One row per key: (key, n_points, df, q_stat); q_stat is
    * NULL when the series is shorter than h+1 points.
    *
    * Determinism: each ρ_k is one exact-integer division (see
    * [[autocorr]]); the per-lag terms are summed in a strict
    * left-to-right lag-order chain ((((t₁+t₂)+t₃)+…)) mirrored
    * verbatim by the oracle, and a lag whose ACF is NULL (degenerate
    * variance) contributes 0. Scale: [[autocorr]] does the corpus
    * work; the pivot runs on O(keys·h) rows. */
  def ljungBox(series: DataFrame, keyCol: String, ordCol: String,
      valCol: String, maxLag: Int = 6): DataFrame = {
    val acf = autocorr(series, keyCol, ordCol, valCol, maxLag)
    val rCols = (1 to maxLag).map(k =>
      max(when(col("lag") === k.toLong, col("acf"))).as(s"__r$k"))
    val piv = acf.groupBy(col(keyCol))
      .agg(max(col("n_points")).as("n_points"), rCols: _*)
    val n = col("n_points").cast("double")
    val terms = (1 to maxLag).foldLeft(lit(0.0)) { (acc, k) =>
      acc + coalesce(
        col(s"__r$k") * col(s"__r$k") / (n - lit(k.toDouble)), lit(0.0))
    }
    piv.select(col(keyCol), col("n_points"),
      lit(maxLag.toLong).as("df"),
      when(col("n_points") <= maxLag, lit(null).cast("double"))
        .otherwise(n * (n + lit(2.0)) * terms).as("q_stat"))
  }

  /** AR(2) fit by the Yule-Walker equations in closed form over
    * [[autocorr]]'s exact ACF — φ₁ = ρ₁(1−ρ₂)/(1−ρ₁²),
    * φ₂ = (ρ₂−ρ₁²)/(1−ρ₁²) — plus the one-step-ahead forecast
    * x̂ₙ₊₁ = μ + φ₁(xₙ−μ) + φ₂(xₙ₋₁−μ), the minimal autoregressive
    * baseline a capacity forecaster reaches for before Holt. One row
    * per key: (key, n_points, phi1, phi2, forecast).
    *
    * Determinism: ρ₁/ρ₂ are exact-integer divisions; μ = S/n is one
    * division of exact DECIMAL sums; xₙ/xₙ₋₁ are integer element
    * picks (row_number over the ord column); every float op is a
    * fixed chain mirrored verbatim by the oracle. |1−ρ₁²| = 0 or a
    * sub-2-point series yields NULL fit. Scale: [[autocorr]] plus one
    * O(series) window over the PRE-AGGREGATED series. */
  def ar2YuleWalker(series: DataFrame, keyCol: String, ordCol: String,
      valCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val acf = autocorr(series, keyCol, ordCol, valCol, maxLag = 2)
    val piv = acf.groupBy(col(keyCol)).agg(
      max(col("n_points")).as("n_points"),
      max(when(col("lag") === 1L, col("acf"))).as("__r1"),
      max(when(col("lag") === 2L, col("acf"))).as("__r2"))
    val base = series.select(col(keyCol),
      col(ordCol).cast("long").as("__o"), col(valCol).cast("long").as("__x"))
    val tail2 = base
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(keyCol)).orderBy(col("__o").desc)))
      .filter(col("__rn") <= 2)
      .groupBy(col(keyCol)).agg(
        max(when(col("__rn") === 1, col("__x"))).as("__xn"),
        max(when(col("__rn") === 2, col("__x"))).as("__xn1"))
    val stats = base.groupBy(col(keyCol)).agg(
      sum(col("__x").cast(dec)).as("__s"),
      count(lit(1)).cast(dec).as("__n"))
    val den = lit(1.0) - col("__r1") * col("__r1")
    val mu = col("__s").cast("double") / col("__n").cast("double")
    val phi1 = col("__r1") * (lit(1.0) - col("__r2")) / den
    val phi2 = (col("__r2") - col("__r1") * col("__r1")) / den
    val bad = col("__r1").isNull || col("__r2").isNull || den === 0.0
    piv.join(tail2, keyCol).join(stats, keyCol)
      .select(col(keyCol), col("n_points"),
        when(bad, lit(null).cast("double")).otherwise(phi1).as("phi1"),
        when(bad, lit(null).cast("double")).otherwise(phi2).as("phi2"),
        when(bad || col("__xn1").isNull, lit(null).cast("double"))
          .otherwise(mu + phi1 * (col("__xn").cast("double") - mu) +
            phi2 * (col("__xn1").cast("double") - mu)).as("forecast"))
  }

  /** Hurst exponent by rescaled-range (R/S) analysis at block sizes
    * 8/16/32 — the long-range-dependence read: H ≈ 0.5 for a memoryless
    * series, H > 0.5 for persistent (trending) load, H < 0.5 for
    * mean-reverting — the number capacity planners fit burst models
    * with. Per key: split the ordered series into full blocks of w,
    * per block R/S = range(cumulative deviations)/σ, average per w,
    * then the log-log OLS slope; with w geometrically spaced the
    * 3-point slope collapses to `(ln r̄₃₂ − ln r̄₈)/(2·ln 2)`. One row
    * per key: (key, n_points, rs8, rs16, rs32, hurst).
    *
    * Exactness: per block the scaled deviation `d_j = w·P_j − j·S` and
    * the σ radicand `w·Σx² − S²` are exact DECIMAL(38,0), so each
    * block's R/S is `(max d − min d)/√radicand` — one sqrt, one
    * division, bit-identical cross-engine. Zero-variance blocks are
    * skipped (R/S undefined). Per-w means fold strictly over blocks
    * sorted by block id; the final slope is a fixed float chain.
    * Missing or non-positive means (series shorter than the window, or
    * all-constant) yield NULL hurst.
    *
    * Scale: the block machinery is windows keyed by (key, w, block)
    * over the PRE-AGGREGATED series; the per-(key,w) fold array is
    * O(n/8) — bounded by the time-grid span, not the corpus. */
  def hurstRS(series: DataFrame, keyCol: String, ordCol: String,
      valCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val base = series.select(col(keyCol),
        col(ordCol).cast("long").as("__o"), col(valCol).cast("long").as("__x"))
      .withColumn("__i", row_number().over(
        Window.partitionBy(col(keyCol)).orderBy(col("__o").asc)).cast("long"))
      .select(col(keyCol), col("__i"), col("__x"),
        explode(array(lit(8L), lit(16L), lit(32L))).as("__w"))
      .withColumn("__g", expr("(__i - 1) div __w"))
      .withColumn("__j", (col("__i") - 1L) % col("__w") + 1L)
    val blk = Window.partitionBy(col(keyCol), col("__w"), col("__g"))
    val withS = base
      .withColumn("__cnt", count(lit(1)).over(blk))
      .filter(col("__cnt") === col("__w"))
      .withColumn("__s", sum(col("__x").cast(dec)).over(blk))
      .withColumn("__sxx",
        sum((col("__x").cast(dec)) * col("__x").cast(dec)).over(blk))
      .withColumn("__p", sum(col("__x").cast(dec)).over(
        blk.orderBy(col("__j").asc)
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__d",
        col("__w").cast(dec) * col("__p") - col("__j").cast(dec) * col("__s"))
    val perBlock = withS
      .groupBy(col(keyCol), col("__w"), col("__g"))
      .agg(max(col("__d")).as("__dmax"), min(col("__d")).as("__dmin"),
        max(col("__w").cast(dec) * col("__sxx") - col("__s") * col("__s"))
          .as("__rad"))
      .filter(col("__rad") > lit(0).cast(dec))
      .withColumn("__rs",
        (col("__dmax") - col("__dmin")).cast("double") /
          sqrt(col("__rad").cast("double")))
    val perW = perBlock
      .groupBy(col(keyCol), col("__w"))
      .agg(sort_array(collect_list(struct(col("__g"), col("__rs"))))
        .as("__l"))
      .select(col(keyCol), col("__w"),
        (aggregate(col("__l"), lit(0.0),
          (acc, x) => acc + x.getField("__rs")) /
          size(col("__l")).cast("double")).as("__avg"))
    val nPts = series.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_points"))
    val piv = perW.groupBy(col(keyCol)).agg(
      max(when(col("__w") === 8L, col("__avg"))).as("rs8"),
      max(when(col("__w") === 16L, col("__avg"))).as("rs16"),
      max(when(col("__w") === 32L, col("__avg"))).as("rs32"))
    nPts.join(piv, Seq(keyCol), "left")
      .withColumn("hurst",
        when(col("rs8").isNull || col("rs32").isNull ||
            col("rs8") <= 0.0 || col("rs32") <= 0.0,
          lit(null).cast("double"))
          .otherwise((log(col("rs32")) - log(col("rs8"))) /
            (lit(2.0) * log(lit(2.0)))))
      .select(col(keyCol), col("n_points"), col("rs8"), col("rs16"),
        col("rs32"), col("hurst"))
  }

  /** Pairwise Granger causality (lag-1): does series a's past improve
    * the 1-step forecast of series b beyond b's own past? For each
    * ordered pair, OLS of y_t on (1, y_{t−1}) — restricted — and on
    * (1, y_{t−1}, x_{t−1}) — unrestricted — and the incremental F:
    * F = (RSS_r − RSS_u)·(n−3)/RSS_u. The classic lead–lag screen
    * (metric A's moves foreshadow metric B's), [[crossCorr]]'s
    * regression-grade sibling.
    *
    * Determinism: all nine cross-moments accumulate EXACTLY in
    * DECIMAL(38,0) (the shuffle never sees a float); the 3×3
    * Cramer solve and both RSS values are fixed-shape IEEE trees the
    * oracle mirrors term-for-term (one double cast per moment).
    * Aligned on observed days (inner day join per pair); the first row
    * of each pair drops (no lag).
    *
    * Scale: one grouped day-collapse of the corpus, then a pair×day
    * join and a single-row-per-pair moment aggregate — no state beyond
    * the day grid. Output: (cause, effect, n, f_stat). */
  def grangerPairs(df: DataFrame, groupCol: String, dayCol: String,
      qCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = df.groupBy(col(groupCol).as("__g"), col(dayCol).as("__d"))
      .agg(sum(col(qCol)).as("__q"))
    val pairs = daily.select(col("__g").as("cause"), col("__d"),
        col("__q").as("__qx"))
      .join(daily.select(col("__g").as("effect"), col("__d"),
        col("__q").as("__qy")), "__d")
      .where(col("cause") =!= col("effect"))
    val w = Window.partitionBy(col("cause"), col("effect"))
      .orderBy(col("__d"))
    val rows = pairs
      .withColumn("__yl", lag(col("__qy"), 1).over(w))
      .withColumn("__xl", lag(col("__qx"), 1).over(w))
      .where(col("__yl").isNotNull)
      .select(col("cause"), col("effect"), col("__qy").as("__y"),
        col("__yl"), col("__xl"))
    val dd = (c: Column) => c.cast("decimal(38,0)")
    val m = rows.groupBy(col("cause"), col("effect")).agg(
      count(lit(1)).as("n"),
      sum(col("__y")).as("sy"), sum(col("__yl")).as("sl"),
      sum(col("__xl")).as("sx"),
      sum(dd(col("__y")) * dd(col("__y"))).as("syy"),
      sum(dd(col("__yl")) * dd(col("__yl"))).as("sll"),
      sum(dd(col("__xl")) * dd(col("__xl"))).as("sxx"),
      sum(dd(col("__y")) * dd(col("__yl"))).as("syl"),
      sum(dd(col("__y")) * dd(col("__xl"))).as("syx"),
      sum(dd(col("__yl")) * dd(col("__xl"))).as("slx"))
    val d = (c: Column) => c.cast("double")
    val (nn, sy, sl, sx) = (d(col("n")), d(col("sy")), d(col("sl")),
      d(col("sx")))
    val (syy, sll, sxx) = (d(col("syy")), d(col("sll")), d(col("sxx")))
    val (syl, syx, slx) = (d(col("syl")), d(col("syx")), d(col("slx")))
    // restricted: y ~ 1 + yl ; RSS_r = Syy − (c·Sy + a·Syl)
    val denR = nn * sll - sl * sl
    val aR = (nn * syl - sl * sy) / denR
    val cR = (sy - aR * sl) / nn
    val rssR = syy - (cR * sy + aR * syl)
    // unrestricted: y ~ 1 + yl + xl via Cramer on the 3×3 Gram matrix
    val det = nn * (sll * sxx - slx * slx) -
      sl * (sl * sxx - slx * sx) + sx * (sl * slx - sll * sx)
    val detC = sy * (sll * sxx - slx * slx) -
      sl * (syl * sxx - slx * syx) + sx * (syl * slx - sll * syx)
    val detA = nn * (syl * sxx - syx * slx) -
      sy * (sl * sxx - slx * sx) + sx * (sl * syx - syl * sx)
    val detB = nn * (sll * syx - slx * syl) -
      sl * (sl * syx - sx * syl) + sy * (sl * slx - sll * sx)
    val rssU = syy -
      (detC * sy + detA * syl + detB * syx) / det
    val f = ((rssR - rssU) * (nn - lit(3.0))) / rssU
    m.select(col("cause"), col("effect"), col("n"),
      when(col("n") >= 4L,
        when(denR =!= 0.0 && det =!= 0.0,
          when(rssU > 0.0, f))).as("f_stat"))
  }

  /** Pairwise dynamic-time-warping distance between per-group series —
    * "which metrics move together, allowing for lag/stretch?", the
    * alignment-tolerant complement of [[crossCorr]]'s fixed-lag scan.
    *
    * Scale shape: the raw table collapses FIRST to k fixed buckets per
    * group (one shuffle, map-side combinable), so however many rows a
    * group holds, the DP input is a bounded k-vector; the O(k²) Warping
    * recurrence then runs as a nested higher-order `aggregate` on
    * g(g−1)/2 pair rows — row-local, no further shuffle, exact integer
    * min-plus algebra (quantized values, BIGINT costs, INF = 2⁶⁰ keeps
    * k·INF far from overflow). Buckets are aligned on a SHARED origin
    * (global min of `dayCol`, broadcast — never a driver collect) and
    * the tail past bucket k−1 folds into the last bucket, so series
    * length is exactly k for every group and the DuckDB replay is a
    * fixed nested list-fold.
    *
    * Output per unordered pair (a < b): (type_a, type_b, dtw_q, dtw). */
  def dtwPairwise(df: DataFrame, groupCol: String, dayCol: String,
      qCol: String, k: Int = 32, scale: Double = 1024.0): DataFrame = {
    require(k >= 2 && k <= 128, s"k must be in [2,128], got $k")
    val inf = 1152921504606846976L // 2^60
    val mins = df.agg(min(col(dayCol)).as("__mind"))
    val sums = df.crossJoin(broadcast(mins))
      .groupBy(col(groupCol).as("__g"),
        least(col(dayCol) - col("__mind"), lit(k - 1L)).as("__bkt"))
      .agg(sum(col(qCol)).as("__s"))
    val series = sums.groupBy(col("__g"))
      .agg(map_from_arrays(collect_list(col("__bkt")),
        collect_list(col("__s"))).as("__m"))
      .select(col("__g"), expr(
        s"transform(sequence(0, ${k - 1}), " +
          "i -> coalesce(element_at(__m, cast(i as bigint)), 0L))")
        .as("__arr"))
    val pairs = series.select(col("__g").as("type_a"), col("__arr").as("__a"))
      .join(series.select(col("__g").as("type_b"), col("__arr").as("__b")),
        col("type_a") < col("type_b"))
    val start = (0L +: Seq.fill(k)(inf)).mkString("array(", "L, ", "L)")
    val dp =
      s"aggregate(__a, $start, " +
        s"(p, ai) -> aggregate(sequence(1, $k), array(${inf}L), " +
        "(c, j) -> concat(c, array(abs(ai - element_at(__b, j)) + " +
        "least(element_at(p, j), element_at(p, j + 1), " +
        "element_at(c, j))))), " +
        s"r -> element_at(r, ${k + 1}))"
    pairs.withColumn("dtw_q", expr(dp))
      .withColumn("dtw", col("dtw_q").cast("double") / lit(scale))
      .select(col("type_a"), col("type_b"), col("dtw_q"), col("dtw"))
  }

  /** Rolling Bollinger bands over a keyed integral series: trailing
    * `win`-row mean ± `k`·σ (population σ over the window) and a breach
    * flag — the classic volatility envelope for "is this hour's volume
    * outside its own recent regime?". Emits every row with
    * (n_window, mid, lo, hi, breach); warm-up rows (n < win) carry NULL
    * bands and NULL breach.
    *
    * Determinism: window sums (n, Σx, Σx²) are exact BIGINTs; mid/σ/
    * bands are ONE fixed IEEE tree over them (σ via
    * `sqrt((n·Σx²−Σx²̂)/n²)`), and the breach comparison pits the exact
    * x against engine-identical band doubles. Same overflow bound as
    * [[rollingCorr]].
    *
    * Scale: ONE shuffle on the key, frames share the (key, ord) sort,
    * output O(rows). */
  def rollingBands(
      series: DataFrame, keyCol: String, ordCol: String, xCol: String,
      win: Int, k: Double): DataFrame = {
    require(win > 1, s"window must exceed 1, got $win")
    require(k > 0.0, s"band width must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(ordCol))
      .rowsBetween(-(win - 1), Window.currentRow)
    val x = col(xCol).cast("long")
    val out = series
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__sx", sum(x).over(w))
      .withColumn("__sxx", sum(x * x).over(w))
    val nD = col("__n").cast("double")
    val mid = col("__sx").cast("double") / nD
    val sig = sqrt(
      (col("__n") * col("__sxx") - col("__sx") * col("__sx"))
        .cast("double") / (nD * nD))
    val short = col("__n") < win
    val dn = lit(null).cast("double")
    out.select(col(keyCol), col(ordCol), x.as("x"),
        col("__n").as("n_window"),
        when(short, dn).otherwise(mid).as("mid"),
        when(short, dn).otherwise(mid - lit(k) * sig).as("lo"),
        when(short, dn).otherwise(mid + lit(k) * sig).as("hi"),
        when(short, lit(null).cast("boolean"))
          .otherwise(x.cast("double") < mid - lit(k) * sig ||
            x.cast("double") > mid + lit(k) * sig).as("breach"))
  }

  /** Rolling Pearson correlation between a keyed series and a paired
    * reference series over a trailing `win`-row window — the co-movement
    * monitor ("is this event type still tracking the corpus, or has it
    * decoupled?"). Input: one row per (key, ord) carrying BOTH integral
    * series x and y; emits every full window's corr plus the moments.
    *
    * Determinism: the five window sums (n, Σx, Σy, Σxy, Σx², Σy²) are
    * exact BIGINTs (running frames add integers — order is the frame
    * order, exact regardless); corr is ONE fixed IEEE tree over them:
    * `(n·Σxy − ΣxΣy) / (sqrt(n·Σx²−Σx²̂) · sqrt(n·Σy²−Σy²̂))`, NULL
    * when either variance is zero. Short (warm-up) windows emit NULL
    * corr, keeping the row count oracle-stable.
    *
    * Overflow bound: n·Σxy needs |x·y|·win² within BIGINT — quantize
    * inputs so |x|, |y| < ~3e8/win.
    *
    * Scale: ONE shuffle on the key; all frames share the (key, ord)
    * sort. Output O(rows). */
  def rollingCorr(
      series: DataFrame, keyCol: String, ordCol: String, xCol: String,
      yCol: String, win: Int): DataFrame = {
    require(win > 1, s"window must exceed 1, got $win")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(ordCol))
      .rowsBetween(-(win - 1), Window.currentRow)
    val x = col(xCol).cast("long"); val y = col(yCol).cast("long")
    val out = series
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__sx", sum(x).over(w))
      .withColumn("__sy", sum(y).over(w))
      .withColumn("__sxy", sum(x * y).over(w))
      .withColumn("__sxx", sum(x * x).over(w))
      .withColumn("__syy", sum(y * y).over(w))
    val vx = out("__n") * out("__sxx") - out("__sx") * out("__sx")
    val vy = out("__n") * out("__syy") - out("__sy") * out("__sy")
    val cov = out("__n") * out("__sxy") - out("__sx") * out("__sy")
    out.select(col(keyCol), col(ordCol), col("__n").as("n_window"),
      when(col("__n") < win || vx <= 0L || vy <= 0L,
        lit(null).cast("double"))
        .otherwise(cov.cast("double") /
          (sqrt(vx.cast("double")) * sqrt(vy.cast("double"))))
        .as("corr"))
  }

  /** SAX (Symbolic Aggregate approXimation) over a keyed series —
    * Lin/Keogh's classic: rank the points, average each `w`-point
    * segment (PAA), z-score the segment means against the KEY's own
    * moments, and bucket them with the alphabet-4 Gaussian breakpoints
    * (−0.6745, 0, +0.6745) into symbols 0..3. The resulting short
    * string is the shape fingerprint motif/discord mining joins on.
    *
    * Determinism: segment sums, counts, and the key moments (n, S, SS)
    * are exact integers; μ, σ, and each PAA mean are ONE fixed IEEE
    * expression from them, shared verbatim with the oracle — and the
    * `z < 0` breakpoint is decided by the EXACT integer comparison
    * `seg_sum·n < S·seg_n` (no float at the densest boundary). σ = 0
    * keys emit symbol 1 for low/equal, 2 for high (z sign only).
    *
    * Scale: one shuffle on the key (rank + segment windows share it),
    * one map-side-combinable segment aggregate, one broadcast join of
    * O(keys) moments. Output O(segments) = O(points/w). */
  def sax(
      series: DataFrame, keyCol: String, ordCol: String, valCol: String,
      w: Int): DataFrame = {
    require(w > 0, s"segment width must be positive, got $w")
    import org.apache.spark.sql.expressions.Window
    val rk = Window.partitionBy(col(keyCol)).orderBy(col(ordCol))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val moments = series.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__n"), sum(dec(col(valCol))).as("__s"),
        sum(dec(col(valCol)) * dec(col(valCol))).as("__ss"))
    val segs = series
      .withColumn("__i", row_number().over(rk) - 1)
      .groupBy(col(keyCol), (col("__i") / w).cast("long").as("segment"))
      .agg(sum(col(valCol)).as("seg_sum"), count(lit(1)).as("seg_n"))
    val nD = col("__n").cast("double")
    val sD = col("__s").cast("double")
    val sigma = sqrt(
      (col("__n").cast("decimal(38,0)") * col("__ss") -
        col("__s") * col("__s")).cast("double") / (nD * nD))
    val paa = col("seg_sum").cast("double") / col("seg_n").cast("double")
    val z = (paa - sD / nD) / col("__sigma")
    // exact-integer sign test: paa < μ ⟺ seg_sum·n < S·seg_n
    val below = dec(col("seg_sum")) * col("__n") <
      col("__s") * dec(col("seg_n"))
    val eq = dec(col("seg_sum")) * col("__n") ===
      col("__s") * dec(col("seg_n"))
    segs.join(broadcast(moments), keyCol)
      .withColumn("__sigma", sigma)
      .withColumn("symbol",
        when(col("__sigma") === 0.0,
          when(below || eq, 1L).otherwise(2L))
          .when(below && z < -0.6745, 0L)
          .when(below || eq, 1L)
          .when(z < 0.6745, 2L)
          .otherwise(3L))
      .select(col(keyCol), col("segment"), col("seg_n"), col("seg_sum"),
        col("symbol"))
  }

  /** Pairwise dynamic-time-warping distance between the per-key series
    * of an already-bucketed table (key, bucket, x): the shape-similarity
    * matrix over a bounded key set — which metrics move together under
    * phase shift/local stretch that plain correlation misses. Emits
    * (key_a, key_b, n_a, n_b, dtw_cost, dtw_per_step_q) for key_a <
    * key_b, where per-step is cost·10⁶ div (n_a + n_b) — the
    * length-normalized readout.
    *
    * Scale: series materialize with ONE per-key sort_array(collect_list)
    * aggregate (bounded by the bucket grid — O(days), never raw events);
    * the pair join is over the AGGREGATED table (O(keys²) pairs of a
    * bounded categorical key set — document the bound at the call site);
    * the DP kernel is a native codegen expression, exact integers. */
  /** MATRIX PROFILE (non-normalized, exact-integer variant) of each
    * key's bucketed series: for every length-`window` subsequence
    * starting at i, the squared-Euclidean distance to its NEAREST
    * non-trivial neighbor subsequence (|i−j| ≥ `exclusion`, the
    * standard trivial-match zone) and that neighbor's start. The
    * profile's minima are the series' MOTIFS (repeated shapes), its
    * maxima the DISCORDS (anomalous windows) — the classic all-pairs
    * subsequence-similarity readout (Yeh et al., ICDM 2016), here on
    * integer-quantized values so both engines replay exactly; the
    * z-normalized variant trades exactness for amplitude invariance
    * and is deliberately not the gated path.
    *
    * Emits (key, i, nn_j, mp_dist) for every i with at least one
    * admissible j; ties break to the smallest j (deterministic).
    *
    * Scale: series materialize with ONE per-key sort_array aggregate
    * (bounded by the bucket grid — O(buckets), never raw events); the
    * self-join emits O(grid²) pairs per key over the AGGREGATED table
    * — a DESIGNED quadratic (the Yeh 2016 profile is all-pairs by
    * definition), safe ONLY because the grid is an aggregated daily/
    * bucket axis, so the bound is enforced, not assumed: any key whose
    * grid exceeds `maxGridLen` fails the job loudly (`raise_error` in
    * the plan, negligible cost) instead of silently exploding to
    * grid² pairs on raw-resolution input. Callers with genuinely long
    * series must re-bucket coarser or raise the bound DELIBERATELY
    * (grid² · 8·window bytes per key is the shuffle they are signing
    * up for). The distance is a zip_with/aggregate over two
    * MATERIALIZED array columns (no lambda-captured recompute); the
    * rank-1 pick is a window partitioned by (key, i) — never
    * corpus-wide. */
  def matrixProfile(
      buckets: DataFrame, keyCol: String, bucketCol: String,
      xCol: String, window: Int, exclusion: Int,
      maxGridLen: Int = 1024): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(exclusion >= 1, s"exclusion must be >= 1, got $exclusion")
    require(maxGridLen >= window,
      s"maxGridLen ($maxGridLen) must be >= window ($window)")
    val series = buckets
      .groupBy(col(keyCol).as("__k"))
      .agg(transform(
        array_sort(collect_list(struct(col(bucketCol).as("b"),
          col(xCol).cast("long").as("x")))),
        s => s.getField("x")).as("__xs"))
      .withColumn("__xs",
        when(size(col("__xs")) <= maxGridLen, col("__xs"))
          .otherwise(raise_error(concat(
            lit("matrixProfile: per-key grid length "),
            size(col("__xs")).cast("string"),
            lit(s" exceeds maxGridLen=$maxGridLen; the profile " +
              "self-join is O(grid²) per key by design - " +
              "re-bucket to a coarser grid or raise maxGridLen " +
              "deliberately")))))
    val wins = series
      .select(col("__k"),
        explode(sequence(lit(0), size(col("__xs")) - window)).as("i"),
        col("__xs"))
      .select(col("__k"), col("i"),
        slice(col("__xs"), col("i") + 1, lit(window)).as("__v"))
    val a = wins.select(col("__k"), col("i"), col("__v").as("__va"))
    val b = wins.select(col("__k").as("__kb"), col("i").as("j"),
      col("__v").as("__vb"))
    val pairs = a.join(b,
        col("__k") === col("__kb") &&
          abs(col("i") - col("j")) >= exclusion)
      .select(col("__k").as(keyCol), col("i"), col("j"),
        aggregate(zip_with(col("__va"), col("__vb"),
            (p, q) => (p - q) * (p - q)),
          lit(0L), (acc, x) => acc + x).as("dist"))
    val w = Window.partitionBy(col(keyCol), col("i"))
      .orderBy(col("dist"), col("j"))
    pairs.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col(keyCol), col("i").cast("long").as("i"),
        col("j").cast("long").as("nn_j"), col("dist").as("mp_dist"))
  }

  def dtwPairs(
      buckets: DataFrame, keyCol: String, bucketCol: String,
      xCol: String): DataFrame = {
    val series = buckets
      .groupBy(col(keyCol).as("__k"))
      .agg(transform(
        array_sort(collect_list(struct(col(bucketCol).as("b"),
          col(xCol).cast("long").as("x")))),
        s => s.getField("x")).as("__xs"))
    val a = series.select(col("__k").as("key_a"), col("__xs").as("__xa"))
    val b = series.select(col("__k").as("key_b"), col("__xs").as("__xb"))
    a.join(b, col("key_a") < col("key_b"))
      .select(col("key_a"), col("key_b"),
        size(col("__xa")).cast("long").as("n_a"),
        size(col("__xb")).cast("long").as("n_b"),
        graft.functions.TextHash.dtw(col("__xa"), col("__xb"))
          .as("dtw_cost"))
      .withColumn("dtw_per_step_q",
        expr("dtw_cost * 1000000L div (n_a + n_b)"))
  }

  /** Robust outlier census via MEDIAN + MAD (median absolute
    * deviation) — the loss-spike / corrupt-day detector that, unlike a
    * mean±kσ rule, a single extreme value cannot poison (breakdown
    * point 50%). Exactness discipline: medians of BIGINTs are either
    * integers or exact halves, so EVERYTHING is carried ×2 —
    * med_x2 = 2·median(x), dev_x2_i = |2·x_i − med_x2| (integer),
    * mad_x2 = 2·median(dev_x2)/... specifically median(dev_x2) again
    * ×1 stays possibly half-integral, so the flag
    * |x_i − med| > k·mad is evaluated as 2·dev_x2_i > k·mad_x4 with
    * mad_x4 = 2·median(dev_x2) — every comparison pure BIGINT, zero
    * float decisions. Emits per key: (n_points, med_x2, mad_x4,
    * n_outliers, max_dev_x2). Two grouped aggregates over the bucket
    * grid + one broadcast-size join back — O(grid) rows, scale-safe. */
  def madOutliers(grid: DataFrame, keyCol: String, xCol: String,
      k: Long = 3L): DataFrame = {
    require(k >= 1L, s"k must be >= 1, got $k")
    val med = grid.groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_points"),
        (expr(s"percentile($xCol, 0.5D)") * 2.0).cast("long").as("med_x2"))
    val dev = grid.join(broadcast(med), keyCol)
      .withColumn("__dev_x2", abs(lit(2L) * col(xCol) - col("med_x2")))
    dev.groupBy(col(keyCol))
      .agg(
        first(col("n_points")).as("n_points"),
        first(col("med_x2")).as("med_x2"),
        (expr("percentile(__dev_x2, 0.5D)") * 2.0).cast("long").as("mad_x4"),
        max(col("__dev_x2")).as("max_dev_x2"),
        collect_list(col("__dev_x2")).as("__devs"))
      .select(col(keyCol), col("n_points"), col("med_x2"), col("mad_x4"),
        size(filter(col("__devs"),
          d => d * 2L > col("mad_x4") * k)).cast("long").as("n_outliers"),
        col("max_dev_x2"))
  }

  /** Croston's method (1972) for INTERMITTENT demand — the forecasting
    * standard when most periods are zero (spare parts, rare events,
    * long-tail SKUs), where plain exponential smoothing biases toward
    * zero: smooth the nonzero demand SIZES z and the INTERVALS q
    * between them separately, forecast z/q per period. α = 1/2 keeps
    * every state dyadic (halves of integers), so the recursive-CTE
    * oracle replays the doubles bit-exactly — the kalman/holt
    * discipline. Contract: z starts at the first demand; q starts at
    * the SECOND demand's gap; both update z' = z/2 + d/2,
    * q' = q/2 + gap/2 from then on. Keys with < 2 demands emit NULL
    * q/forecast. Only NONZERO demand rows are consumed (gaps come from
    * the ord column differences — no dense grid materialization).
    * One collect_list fold per key over the aggregated grid. */
  def croston(grid: DataFrame, keyCol: String, ordCol: String,
      demandCol: String): DataFrame = {
    val series = array_sort(collect_list(struct(
      col(ordCol).cast("long").as("o"),
      col(demandCol).cast("double").as("d"))))
    val zero = struct(
      lit(null).cast("double").as("z"), lit(null).cast("double").as("q"),
      lit(null).cast("long").as("last"))
    val step = (acc: Column, e: Column) => {
      val gap = (e.getField("o") - acc.getField("last")).cast("double")
      when(acc.getField("z").isNull,
        struct(e.getField("d").as("z"), lit(null).cast("double").as("q"),
          e.getField("o").as("last")))
        .otherwise(struct(
          (acc.getField("z") / 2.0 + e.getField("d") / 2.0).as("z"),
          when(acc.getField("q").isNull, gap)
            .otherwise(acc.getField("q") / 2.0 + gap / 2.0).as("q"),
          e.getField("o").as("last")))
    }
    grid.filter(col(demandCol) > 0)
      .groupBy(col(keyCol))
      .agg(series.as("__s"), count(lit(1)).as("n_nonzero"))
      .select(col(keyCol), col("n_nonzero"),
        aggregate(col("__s"), zero, step).as("__f"))
      .select(col(keyCol), col("n_nonzero"),
        col("__f.z").as("z_final"), col("__f.q").as("q_final"),
        (col("__f.z") / col("__f.q")).as("croston_forecast"))
  }

  /** Chatterjee's ξ rank correlation (Chatterjee 2020) between time
    * order and value per key: with unique y-ranks r_i (ties broken by
    * the time column) read off in time order,
    * ξ = 1 − 3·Σ|r_{i+1} − r_i| / (n² − 1) — emitted as the exact
    * integer rational (xi_num = n²−1−3Σ|Δr|, xi_den = n²−1). ξ ≈ 0 for
    * independence, → 1 when y is a (noisy) function of time. Two
    * key-partitioned windows over the aggregated per-key grid —
    * grid-bounded, never corpus-sized. */
  def chatterjeeXi(grid: DataFrame, keyCol: String, tCol: String,
      yCol: String): DataFrame = {
    val wy = Window.partitionBy(col(keyCol)).orderBy(col(yCol), col(tCol))
    val wt = Window.partitionBy(col(keyCol)).orderBy(col(tCol))
    grid
      .withColumn("__r", row_number().over(wy).cast("long"))
      .withColumn("__dr", abs(col("__r") - lag(col("__r"), 1).over(wt)))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_points"), sum(col("__dr")).as("__sdr"))
      .select(col(keyCol), col("n_points"),
        (col("n_points") * col("n_points") - 1L - lit(3L) * col("__sdr"))
          .as("xi_num"),
        (col("n_points") * col("n_points") - 1L).as("xi_den"))
  }

  /** Durbin–Watson statistic of the per-key series around its mean, as
    * an exact integer rational: with e_t·n = n·y_t − S (mean-centering
    * scaled by n so everything stays integral),
    * DW = n²·Σ(Δy)² / (n²·Σy² − n·S²). One lag window over the per-key
    * grid + one aggregate — no second pass for the mean (the scaled
    * identity Σ(n·y−S)² = n²Σy² − n·S² folds it away). */
  def durbinWatson(grid: DataFrame, keyCol: String, tCol: String,
      yCol: String): DataFrame = {
    val wt = Window.partitionBy(col(keyCol)).orderBy(col(tCol))
    grid
      .withColumn("__dy", col(yCol) - lag(col(yCol), 1).over(wt))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_points"),
        sum(col(yCol)).as("__s"),
        sum(col(yCol) * col(yCol)).as("__sq"),
        sum(col("__dy") * col("__dy")).as("__sdq"))
      .select(col(keyCol), col("n_points"),
        (col("n_points") * col("n_points") * col("__sdq")).as("dw_num"),
        (col("n_points") * col("n_points") * col("__sq") -
          col("n_points") * col("__s") * col("__s")).as("dw_den"))
  }

  /** Sample-entropy template counts (Richman & Moorman 2000) per key:
    * B = #pairs of length-m templates within Chebyshev tolerance r,
    * A = same at length m+1; SampEn = −ln(A/B) is left to the consumer
    * — the counts are the exact, oracle-comparable part. Tolerance is
    * per-key data-driven: r = (max−min) div rDiv (integer, replayable).
    * Fixed m = 2. The template self-join is per-key over the aggregated
    * grid (O(grid²) pairs per key — the grid is days, not events). */
  def sampleEntropyCounts(grid: DataFrame, keyCol: String, tCol: String,
      yCol: String, rDiv: Long = 6L): DataFrame = {
    val wt = Window.partitionBy(col(keyCol)).orderBy(col(tCol))
    val tol = grid.groupBy(col(keyCol).as("__k"))
      .agg((((max(col(yCol)) - min(col(yCol))) -
        pmod(max(col(yCol)) - min(col(yCol)), lit(rDiv))) / rDiv)
        .cast("long").as("__r"))
    val tmpl = grid
      .withColumn("__i", row_number().over(wt).cast("long"))
      .withColumn("__x0", col(yCol).cast("long"))
      .withColumn("__x1", lead(col(yCol), 1).over(wt).cast("long"))
      .withColumn("__x2", lead(col(yCol), 2).over(wt).cast("long"))
      .filter(col("__x2").isNotNull)
      .select(col(keyCol).as("__k"), col("__i"), col("__x0"), col("__x1"),
        col("__x2"))
      .join(tol, "__k")
    val a = tmpl.select(col("__k"), col("__i").as("ia"),
      col("__x0").as("a0"), col("__x1").as("a1"), col("__x2").as("a2"),
      col("__r"))
    val b = tmpl.select(col("__k"), col("__i").as("ib"),
      col("__x0").as("b0"), col("__x1").as("b1"), col("__x2").as("b2"))
    val pairs = a.join(b, Seq("__k")).filter(col("ib") > col("ia"))
      .select(col("__k"),
        (greatest(abs(col("a0") - col("b0")), abs(col("a1") - col("b1")))
          <= col("__r")).cast("long").as("bm"),
        (greatest(abs(col("a0") - col("b0")), abs(col("a1") - col("b1")),
          abs(col("a2") - col("b2"))) <= col("__r")).cast("long").as("am"))
    pairs.groupBy(col("__k"))
      .agg(sum(col("bm")).as("b_count"), sum(col("am")).as("a_count"),
        count(lit(1)).as("n_pairs"))
      .withColumnRenamed("__k", keyCol)
  }
}
