package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra over keyed spans — the variable-length sibling of
  * gap-based sessionization: each row carries its OWN [start, end]
  * extent, and overlapping-or-touching extents within a key coalesce
  * into islands (the classic running-max merge). Sessionize can't
  * express this: a short event inside a long event's span belongs to
  * the long one's island regardless of gap-to-predecessor.
  *
  * Reference has no interval operator; this is part of the engine's
  * beyond-reference events surface (SURVEY.md §2.8) — span coverage /
  * availability / on-air merging for training-data time windows.
  */
object Intervals {

  /** Merge overlapping intervals per key. Rows are ordered by
    * (start, end, id) inside each key; a row OPENS a new island iff its
    * start exceeds the running max end of all previous rows (strictly —
    * touching intervals [1,5],[5,9] merge). Emits one row per island:
    * (keyCols…, island, island_start, island_end, n_intervals,
    * span_us = island_end − island_start).
    *
    * Determinism: the total (start, end, id) order (pass a unique
    * `idCol`) makes the running max, the island flags, and the island
    * numbering reproducible in any engine; all values stay exact
    * BIGINTs.
    *
    * Scale: ONE shuffle on the key — both windows and the final
    * aggregate share the (key) partitioning and (start, end, id) sort,
    * so Catalyst plans a single exchange+sort; state per key is one
    * running max. Output is O(islands). */
  def mergeIntervals(
      df: DataFrame, keyCols: Seq[String], startCol: String,
      endCol: String, idCol: String): DataFrame = {
    require(keyCols.nonEmpty, "mergeIntervals needs at least one key column")
    val key = keyCols.map(col)
    df.select(key :+ col(startCol).cast("long").as("__s") :+
        col(endCol).cast("long").as("__e") :+ col(idCol).as("__id"): _*)
      .withColumn("__pm", max(col("__e")).over(
        Window.partitionBy(key: _*)
          .orderBy(col("__s"), col("__e"), col("__id"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__nf",
        when(col("__pm").isNull || col("__s") > col("__pm"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("__nf")).over(
        Window.partitionBy(key: _*)
          .orderBy(col("__s"), col("__e"), col("__id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(key :+ col("island"): _*)
      .agg(min(col("__s")).as("island_start"),
        max(col("__e")).as("island_end"),
        count(lit(1)).as("n_intervals"))
      .withColumn("span_us", col("island_end") - col("island_start"))
  }

  /** Per-key coverage rollup over [[mergeIntervals]] output: how much of
    * the timeline does the key's merged span set actually cover, and how
    * fragmented is it? Emits per key: (keyCols…, n_intervals, n_islands,
    * covered_us, max_island_us) — `covered_us` is the union length
    * (overlap-free by construction). One extra map-side-combinable
    * aggregate; output O(keys). */
  def coverage(
      df: DataFrame, keyCols: Seq[String], startCol: String,
      endCol: String, idCol: String): DataFrame =
    mergeIntervals(df, keyCols, startCol, endCol, idCol)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("n_intervals")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("span_us")).as("covered_us"),
        max(col("span_us")).as("max_island_us"))

  /** Per-key COVERAGE GAPS — the complement of [[coverage]]: the dark
    * windows BETWEEN merged islands, one row per gap with its exact
    * extent (the "when were we blind / down / silent" question an
    * availability rollup can't answer). A key with one island emits
    * nothing.
    *
    * Built on [[mergeIntervals]] output: islands are disjoint per key by
    * construction, so ordering by island_start is total and
    * `gap = next.island_start − prev.island_end` (touching islands never
    * exist post-merge, so every lag step is a real gap). Exact BIGINTs
    * end to end.
    *
    * Scale: the merge's one keyed shuffle + one lag window sharing the
    * same partitioning; output O(islands). */
  def gaps(
      df: DataFrame, keyCols: Seq[String], startCol: String,
      endCol: String, idCol: String): DataFrame = {
    val key = keyCols.map(col)
    val w = Window.partitionBy(key: _*).orderBy(col("island_start"))
    mergeIntervals(df, keyCols, startCol, endCol, idCol)
      .withColumn("gap_start", lag(col("island_end"), 1).over(w))
      .where(col("gap_start").isNotNull)
      .select(key :+ col("gap_start") :+
        col("island_start").as("gap_end") :+
        (col("island_start") - col("gap_start")).as("gap_us"): _*)
  }

  /** Per-key PEAK CONCURRENCY — the capacity question islands can't
    * answer: at the busiest instant, how many intervals are open at
    * once, and when does that load first occur? (Concurrent sessions
    * per shard, simultaneous streams per tenant — the number that sizes
    * state stores and connection pools.)
    *
    * Classic boundary sweep: each interval emits (+1 at start, −1 at
    * end) under HALF-OPEN [start, end) semantics — an interval ending
    * exactly when another starts does NOT overlap it (unlike
    * [[mergeIntervals]], where touching spans coalesce); zero-length
    * intervals contribute nothing. Boundaries collapse to one net
    * delta per (key, instant) BEFORE the running sum, so the
    * concurrency profile is a function of time and every value is an
    * exact BIGINT — no tie-order ambiguity, engine-exact. `peak_at_us`
    * is the earliest instant attaining the peak (always a net-opening
    * instant).
    *
    * Scale: one map-side-combinable boundary aggregate, then windows
    * that all share the (key) partitioning and (t) sort — one
    * exchange; state per key is one running counter. Output O(keys). */
  def peakConcurrency(
      df: DataFrame, keyCols: Seq[String], startCol: String,
      endCol: String): DataFrame = {
    require(keyCols.nonEmpty,
      "peakConcurrency needs at least one key column")
    val key = keyCols.map(col)
    val nonEmpty = df.where(
      col(endCol).cast("long") > col(startCol).cast("long"))
    val bounds = nonEmpty
      .select(key :+ col(startCol).cast("long").as("__t") :+
        lit(1L).as("__d"): _*)
      .unionByName(nonEmpty
        .select(key :+ col(endCol).cast("long").as("__t") :+
          lit(-1L).as("__d"): _*))
      .groupBy(key :+ col("__t"): _*)
      .agg(sum(col("__d")).as("__dd"),
        sum(when(col("__d") > 0L, 1L).otherwise(0L)).as("__opens"))
    val run = Window.partitionBy(key: _*).orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(key: _*)
    bounds
      .withColumn("__c", sum(col("__dd")).over(run))
      .withColumn("__pk", max(col("__c")).over(whole))
      .groupBy(key: _*)
      .agg(sum(col("__opens")).as("n_intervals"),
        max(col("__c")).as("peak"),
        min(when(col("__c") === col("__pk"), col("__t")))
          .as("peak_at_us"))
  }
}
