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
}
