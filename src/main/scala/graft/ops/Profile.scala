package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling — the `ANALYZE`-style data-quality pass a pipeline
  * runs before trusting a new corpus drop: per column, row/null/distinct
  * counts and min/max. One row out per column, one scan over the data
  * (all per-column aggregates ride a single aggregation; the row-stats
  * never leave the executors until the final handful of rows).
  *
  * Exact `countDistinct` over several columns expands the scan N-fold
  * (Spark's Expand for multi-distinct aggregation) — fine for a handful
  * of columns; at 100 TB over wide tables swap in
  * `approx_count_distinct` (HyperLogLog++, one pass, mergeable) — kept
  * exact here so the result stays oracle-checkable.
  *
  * min/max are computed in the column's native type and cast to string
  * only for the uniform output schema (casting first would compare
  * lexicographically — wrong for numerics).
  */
object Profile {

  /** Profile `cols` (default: every column) of `df`. Output:
    * (col_name, n_rows, n_nulls, n_distinct, min_val, max_val). */
  def profile(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val target = if (cols.nonEmpty) cols else df.columns.toSeq
    require(target.nonEmpty, "nothing to profile")
    val aggs = target.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"),
        countDistinct(col(c)).as(s"__dst_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val perCol = target.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__dst_$c").as("n_distinct"),
        col(s"__min_$c").as("min_val"),
        col(s"__max_$c").as("max_val"))
    }
    one.select(explode(array(perCol: _*)).as("p")).select(col("p.*"))
  }

  /** Declarative data-contract audit — the expectations pass
    * (Great-Expectations / dbt-test shape) a pipeline runs per corpus
    * drop: each rule is a boolean Column; a row VIOLATES when the
    * predicate is false OR null (a null check result is a failure, not a
    * free pass — three-valued logic would otherwise silently skip dirty
    * rows). Emits (rule, n_checked, n_violations, pass).
    *
    * Scale: every rule rides ONE aggregation over ONE scan (no per-rule
    * passes); output is O(rules). */
  def expect(df: DataFrame, rules: Seq[(String, org.apache.spark.sql.Column)])
      : DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    // Internal columns are indexed POSITIONALLY (__v_0, __v_1, ...): a
    // caller-supplied rule name containing a dot or backtick would break
    // col() resolution; the display name only ever appears as a literal
    // in the output struct.
    val aggs = rules.zipWithIndex.map { case ((_, pred), i) =>
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L))
        .as(s"__v_$i")
    } :+ count(lit(1)).as("__n")
    // coalesce: sum over ZERO rows is NULL, and `NULL === 0` is NULL —
    // an empty input would make `pass` three-valued-logic-invisible to
    // downstream filters, the exact silent skip this audit exists to
    // prevent. Empty input = nothing violated = pass.
    val one = df.agg(aggs.head, aggs.tail: _*)
    val perRule = rules.zipWithIndex.map { case ((name, _), i) =>
      val v = coalesce(col(s"__v_$i"), lit(0L))
      struct(lit(name).as("rule"), col("__n").as("n_checked"),
        v.as("n_violations"), (v === 0L).as("pass"))
    }
    one.select(explode(array(perRule: _*)).as("r")).select(col("r.*"))
  }

  /** Referential-integrity audit in the same output shape as [[expect]]:
    * child rows whose key has no parent. ONE lazy plan — a left outer
    * join of the child keys onto the distinct parent keys feeding a
    * single aggregate (no eager driver actions, one scan per side);
    * broadcast when the parent is a dim, shuffle otherwise, and Spark's
    * runtime bloom filter prunes the child scan when selective. */
  def orphanRule(
      name: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.select(col(childKey))
      .join(
        parent.select(col(parentKey).as(childKey)).distinct()
          .withColumn("__hit", lit(1)),
        Seq(childKey), "left_outer")
      .agg(count(lit(1)).as("__n"),
        coalesce(sum(when(col("__hit").isNull, 1L).otherwise(0L)), lit(0L))
          .as("__v"))
      .select(lit(name).as("rule"), col("__n").as("n_checked"),
        col("__v").as("n_violations"), (col("__v") === 0L).as("pass"))

  /** k-anonymity audit over quasi-identifier columns: every equivalence
    * class (distinct QI combination) with fewer than `k` members is a
    * re-identification risk. Emits ONLY violating classes
    * (qiCols..., class_size) — output is bounded by the violation count,
    * and an empty result IS the pass. One hash aggregate keyed by the
    * QI tuple. */
  def kAnonymityViolations(
      df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .filter(col("class_size") < k)
  }

  /** l-diversity audit — the companion to [[kAnonymityViolations]]: a
    * k-anonymous class is still disclosive if everyone in it shares the
    * same sensitive value, so every equivalence class whose sensitive
    * attribute takes fewer than `l` DISTINCT values is flagged. Emits
    * only violating classes (qiCols..., class_size, n_distinct_sensitive)
    * — empty result IS the pass.
    *
    * One aggregate keyed by the QI tuple with an exact COUNT(DISTINCT)
    * (Spark plans it as a two-phase expand+aggregate, still
    * shuffle-keyed by QI — no all-pairs anything). */
  def lDiversityViolations(
      df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
      l: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 2, s"l must be >= 2, got $l")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("n_distinct_sensitive"))
      .filter(col("n_distinct_sensitive") < l)
  }

  /** Chi-square independence statistic between two categorical columns —
    * the profiling step behind "is this feature informative?" and "did
    * the label distribution drift per shard?". Emits one row:
    * (n_rows, r, c, dof, chi2). The p-value lookup (incomplete gamma) is
    * deliberately out of scope — compare `chi2` against critical values.
    *
    * Determinism contract: all counts are exact integers off ONE
    * aggregate scan; the full r×c grid (INCLUDING empty cells — their
    * expected counts still contribute) is generated from the marginals,
    * each cell term `(o-e)²/e` is a fixed-shape float expression over
    * exact integers, and the final sum is a STRICT LEFT FOLD over the
    * (a,b)-sorted cell list — the [[graft.ops.TimeSeries.ewma]]
    * discipline — so the statistic is bit-identical across partitionings
    * and engines (a parallel float SUM would not be). Categorical
    * cardinalities are small by definition, so the fold list is tiny. */
  def chiSquare(df: DataFrame, colA: String, colB: String): DataFrame = {
    val cells = df.groupBy(col(colA).as("a"), col(colB).as("b"))
      .agg(count(lit(1)).as("o"))
    val ra = cells.groupBy("a").agg(sum(col("o")).as("rt"))
    val cb = cells.groupBy("b").agg(sum(col("o")).as("ct"))
    val grid = ra.crossJoin(cb)
      .join(cells, Seq("a", "b"), "left_outer")
      .select(col("a"), col("b"), col("rt"), col("ct"),
        coalesce(col("o"), lit(0L)).as("o"))
    val packed = grid
      .agg(sort_array(collect_list(struct(col("a"), col("b"), col("rt"),
        col("ct"), col("o")))).as("cs"),
        countDistinct(col("a")).as("r"), countDistinct(col("b")).as("c"))
      .crossJoin(broadcast(cells.agg(sum(col("o")).as("n"))))
    val term = (x: Column) => {
      val e = (x.getField("rt") * x.getField("ct")).cast("double") / col("n")
      val d = x.getField("o").cast("double") - e
      d * d / e
    }
    packed.select(
      col("n").as("n_rows"), col("r"), col("c"),
      ((col("r") - 1) * (col("c") - 1)).as("dof"),
      aggregate(col("cs"), lit(0.0), (acc, x) => acc + term(x)).as("chi2"))
  }

  /** Per-cell residuals for the [[chiSquare]] grid — WHERE the
    * dependence lives, not just whether it exists: Pearson residual
    * (o−e)/√e and the adjusted (standardized) residual
    * (o−e)/√(e·(1−rt/n)·(1−ct/n)), |adj| ≳ 2 flagging the driving
    * cells. Same empty-cell-completed grid, one fixed-shape IEEE
    * expression per row, no cross-cell float accumulation at all. */
  def chiSquareResiduals(
      df: DataFrame, colA: String, colB: String): DataFrame = {
    val cells = df.groupBy(col(colA).as("a"), col(colB).as("b"))
      .agg(count(lit(1)).as("o"))
    val ra = cells.groupBy("a").agg(sum(col("o")).as("rt"))
    val cb = cells.groupBy("b").agg(sum(col("o")).as("ct"))
    val grid = ra.crossJoin(cb)
      .join(cells, Seq("a", "b"), "left_outer")
      .select(col("a"), col("b"), col("rt"), col("ct"),
        coalesce(col("o"), lit(0L)).as("o"))
      .crossJoin(broadcast(cells.agg(sum(col("o")).as("n"))))
    val e = (col("rt") * col("ct")).cast("double") / col("n")
    val d = col("o").cast("double") - e
    val shrink = (lit(1.0) - col("rt").cast("double") / col("n")) *
      (lit(1.0) - col("ct").cast("double") / col("n"))
    grid.select(col("a"), col("b"), col("o"), col("rt"), col("ct"),
      e.as("expected"),
      when(e > 0.0, d / sqrt(e)).as("pearson_resid"),
      when(e > 0.0, when(shrink > 0.0, d / sqrt(e * shrink)))
        .as("adj_resid"))
  }

  /** Benford first-digit audit — fraud/synthetic-data detection for
    * naturally wide-ranging positive columns (prices, populations, file
    * sizes): observed leading-digit counts vs the Benford expectation
    * `n · log10(1 + 1/d)`. Emits one row per digit 1..9:
    * (digit, n_obs, expected, chi2_term) — Σ chi2_term against a χ²(8)
    * critical value is the test.
    *
    * Determinism: the leading digit comes from the DECIMAL STRING of
    * `floor(x)` (never `log10` — libm rounding could flip a power-of-10
    * boundary between engines); expected values are one multiply of an
    * exact count by a driver-computed double literal, and each chi2 term
    * is a fixed-shape row expression. Rows with x < 1 are dropped (no
    * leading digit in [1,9]).
    *
    * Scale: one map-side-combinable 9-group aggregate; output is 9 rows. */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val observed = df
      .select(col(valueCol).cast("double").as("__x"))
      .where(col("__x") >= 1.0)
      .select(substring(floor(col("__x")).cast("long").cast("string"), 1, 1)
        .cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    // Full 1..9 spine: an absent digit must contribute its (0-e)²/e
    // term, else the summed statistic understates on small/skewed
    // inputs (mirrors chiSquare's empty-cell grid).
    val spine = df.sparkSession.range(1, 10).select(col("id").as("digit"))
    val digits = spine.join(broadcast(observed), Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n_obs"), lit(0L)).as("n_obs"))
    val total = digits.agg(sum(col("n_obs")).as("__n"))
    val probs = (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d))
    val expected = probs.tail.foldLeft(
      when(col("digit") === probs.head._1, lit(probs.head._2))) {
      case (acc, (d, p)) => acc.when(col("digit") === d, lit(p))
    }
    digits.crossJoin(broadcast(total))
      .withColumn("expected", col("__n").cast("double") * expected)
      .withColumn("chi2_term", {
        val dd = col("n_obs").cast("double") - col("expected")
        dd * dd / col("expected")
      })
      .select(col("digit"), col("n_obs"), col("expected"), col("chi2_term"))
  }

  /** Join-key skew profile — the pre-flight diagnostic for any keyed
    * shuffle at 100 TB: ONE row summarizing the key-frequency
    * distribution so a pipeline can decide between a plain shuffle
    * join, broadcast, or salting BEFORE paying for the wrong plan.
    * Emits (n_rows, n_keys, max_cnt, p50_cnt, p99_cnt, skew_ratio,
    * top_key, top_cnt); `skew_ratio` = max over mean frequency — > ~20
    * and the hottest key dominates a task (salt or isolate it).
    *
    * Determinism: counts exact; percentiles are Spark `percentile`
    * (== DuckDB `quantile_cont`); skew_ratio is one double expression
    * over exact integers; top key is max(struct(cnt, key)) — count
    * first, key as the deterministic tie-break.
    *
    * Scale: one map-side-combinable count per key + one aggregate over
    * the (already reduced) key-count frame. Output is exactly 1 row. */
  def keySkewProfile(df: DataFrame, keyCol: String): DataFrame =
    df.where(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
      .agg(
        sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("cnt")).as("max_cnt"),
        expr("percentile(cnt, 0.5)").as("p50_cnt"),
        expr("percentile(cnt, 0.99)").as("p99_cnt"),
        max(struct(col("cnt"), col(keyCol).cast("string").as("k"))).as("__top"))
      .withColumn("skew_ratio",
        col("max_cnt").cast("double") * col("n_keys").cast("double") /
          col("n_rows").cast("double"))
      .select(col("n_rows"), col("n_keys"), col("max_cnt"),
        col("p50_cnt"), col("p99_cnt"), col("skew_ratio"),
        col("__top.k").as("top_key"), col("__top.cnt").as("top_cnt"))

  /** Population stability index between two snapshots of a bucketed
    * feature — the standard distribution-drift monitor (banking
    * scorecard lineage; Σ psi_term < 0.1 stable, > 0.25 shifted): one
    * row per bucket with `psi_term = (p_a - p_b)·ln(p_a/p_b)`.
    * Laplace-smoothed proportions `p = (n+1)/(N+K)` keep empty buckets
    * finite, and the bucket grid is the FULL OUTER union of both sides
    * (the benford/chiSquare empty-cell discipline — a bucket that
    * vanished is exactly the drift you're looking for).
    *
    * Determinism: counts exact, proportions one division of exact
    * integers, `round(psi_term, 8)` absorbs libm ln differences. The
    * caller sums psi_term over the (bounded, fixed-shape) bucket rows —
    * no float SUM aggregate inside the operator.
    *
    * Scale: two map-side-combinable counts + a bucket-grid join that is
    * O(buckets), then row-local arithmetic. */
  def psi(left: DataFrame, right: DataFrame, bucketCol: String): DataFrame = {
    val a = left.groupBy(col(bucketCol)).agg(count(lit(1)).as("n_a"))
    val b = right.groupBy(col(bucketCol)).agg(count(lit(1)).as("n_b"))
    val grid = a.join(b, Seq(bucketCol), "full_outer")
      .select(col(bucketCol),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    val tot = grid.agg(sum(col("n_a")).as("__ta"),
      sum(col("n_b")).as("__tb"), count(lit(1)).as("__k"))
    val pa = (col("n_a") + 1L).cast("double") /
      (col("__ta") + col("__k")).cast("double")
    val pb = (col("n_b") + 1L).cast("double") /
      (col("__tb") + col("__k")).cast("double")
    grid.crossJoin(broadcast(tot))
      .withColumn("psi_term", round((pa - pb) * log(pa / pb), 8))
      .select(col(bucketCol), col("n_a"), col("n_b"), col("psi_term"))
  }

  /** Per-group Shannon entropy of a categorical column (nats) — the
    * balance metric of a corpus: low entropy of `source` within a
    * language means one domain dominates it. Emits
    * (groupCol, n_rows, n_categories, entropy).
    *
    * Determinism: category counts are exact; the entropy sum is a STRICT
    * LEFT FOLD over the category-sorted (cat, count) list — the
    * [[chiSquare]] discipline — so the float result is bit-identical
    * across partitionings and engines. Category cardinality per group is
    * small by definition (the packed list is bounded); the groupwise
    * aggregate is map-side combinable. */
  def entropy(
      df: DataFrame, groupCol: String, catCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol), col(catCol).as("__c"))
      .agg(count(lit(1)).as("__k"))
    val packed = counts.groupBy(col(groupCol))
      .agg(sort_array(collect_list(struct(col("__c"), col("__k")))).as("cs"),
        sum(col("__k")).as("n_rows"),
        count(lit(1)).as("n_categories"))
    val term = (x: Column) => {
      val p = x.getField("__k").cast("double") / col("n_rows").cast("double")
      -p * log(p)
    }
    packed.select(col(groupCol), col("n_rows"), col("n_categories"),
      aggregate(col("cs"), lit(0.0), (acc, x) => acc + term(x)).as("entropy"))
  }

  /** Per-group equi-width histogram of a numeric column: `bins` buckets
    * spanning the group's [min, max], max closing into the last bin;
    * null values are dropped. Deterministic across engines: the bin is
    * `least(bins-1, floor((x - min) · bins / (max - min)))` evaluated in
    * the same IEEE order on both sides, so the oracle hash-gates it.
    * Groups with min == max put every row in bin 0.
    *
    * Scale: two aggregations keyed by group — the bounds pass emits
    * O(groups) rows broadcast back onto the scan, the binning pass
    * combines map-side; no corpus-wide state, no sort. Emits
    * (groupCol, bin, bin_lo, bin_hi, n). */
  def histogram(
      df: DataFrame, groupCol: String, valueCol: String,
      bins: Int): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    val v = col(valueCol).cast("double")
    val bounds = df.where(v.isNotNull)
      .groupBy(col(groupCol)).agg(min(v).as("__mn"), max(v).as("__mx"))
    val width = col("__mx") - col("__mn")
    val bin = when(col("__mx") === col("__mn"), lit(0L))
      .otherwise(least(lit((bins - 1).toLong),
        floor((v - col("__mn")) * bins / width)))
    df.where(v.isNotNull)
      .join(broadcast(bounds), groupCol)
      .groupBy(col(groupCol), bin.as("bin"), col("__mn"), col("__mx"))
      .agg(count(lit(1)).as("n"))
      .select(col(groupCol), col("bin"),
        (col("__mn") + col("bin") * (col("__mx") - col("__mn")) / bins)
          .as("bin_lo"),
        (col("__mn") + (col("bin") + 1) * (col("__mx") - col("__mn")) / bins)
          .as("bin_hi"),
        col("n"))
  }

  /** Join-fanout pre-flight — the COST of an equi-join before paying
    * for it: exact output cardinality `Σ_k c_a(k)·c_b(k)` plus the
    * worst single-key fanout (the skew hotspot a salted join would
    * split). ONE row: (n_left, n_right, n_keys_both, est_rows,
    * max_key_fanout). `est_rows` is EXACT, not an estimate — two
    * per-side key aggregates (map-side combinable) joined on the
    * O(keys) grids, never the data rows; products accumulate as
    * DECIMAL(38,0) so a hot key cannot overflow. */
  def joinFanout(
      left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String): DataFrame = {
    val dec = "decimal(38,0)"
    val ca = left.groupBy(col(leftKey).as("__k"))
      .agg(count(lit(1)).as("__ca"))
    val cb = right.groupBy(col(rightKey).as("__k"))
      .agg(count(lit(1)).as("__cb"))
    val grid = ca.join(cb, "__k")
      .select((col("__ca") * col("__cb")).cast(dec).as("__p"))
    grid.agg(count(lit(1)).as("n_keys_both"),
        sum(col("__p")).as("__est"), max(col("__p")).as("__mx"))
      .crossJoin(broadcast(left.agg(count(lit(1)).as("n_left"))))
      .crossJoin(broadcast(right.agg(count(lit(1)).as("n_right"))))
      .select(col("n_left"), col("n_right"), col("n_keys_both"),
        coalesce(col("__est").cast("double"), lit(0.0)).as("est_rows"),
        coalesce(col("__mx").cast("long"), lit(0L)).as("max_key_fanout"))
  }

  /** Pareto coverage curve — "how concentrated is this corpus": keys
    * ranked by descending exact count (key ASC tie-break), each with its
    * cumulative row share. The first rank whose `cum_frac` crosses 0.9
    * answers "how many domains make 90% of the data" — the
    * concentration read behind mixture weights and domain caps. Emits
    * the top `k` ranks: (rank, key, n, cum_n, cum_frac).
    *
    * Determinism: counts and cumulative sums are exact longs in a total
    * (n DESC, key ASC) order; `cum_frac` is one IEEE division per row.
    * Scale: one map-side-combinable count aggregate, then the top-k cut
    * is TakeOrdered (`orderBy().limit(k)` — per-partition top-k, never
    * a full sort of the distinct-key table, which at corpus scale is
    * itself corpus-sized for high-cardinality keys); the rank and
    * cumulative windows run over those k rows only. The cumulative at
    * rank r needs exactly the ranks ≤ r, all inside the cut. */
  def paretoCoverage(
      df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val ord = Window.orderBy(col("n").desc, col(keyCol).asc)
    counts
      .orderBy(col("n").desc, col(keyCol).asc).limit(k)
      .withColumn("rank", row_number().over(ord).cast("long"))
      .withColumn("cum_n", sum(col("n")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(df.agg(count(lit(1)).as("__t"))))
      .select(col("rank"), col(keyCol), col("n"), col("cum_n"),
        (col("cum_n").cast("double") / col("__t").cast("double"))
          .as("cum_frac"))
  }

  /** Event-lateness profile — the measurement that SIZES a watermark:
    * over each key's arrival order (`seqCol`, e.g. an ingestion id),
    * how often does event time run BACKWARD, and by how much? Emits one
    * row: (n_pairs, n_inversions, inversion_frac, max_regression,
    * p99_regression) — n_pairs the adjacent-arrival pairs, an inversion
    * a pair whose event time decreased, regressions in `tsCol` units.
    * A watermark delay at ~max (or p99, tolerating rare drops) of
    * regression bounds state without dropping live data.
    *
    * Determinism: counts/extremes are exact longs off one lag window +
    * one aggregate; the p99 is an exact ceil-rank ELEMENT PICK (the
    * smallest magnitude whose cumulative count reaches ⌈0.99·c⌉ — no
    * interpolation); the fraction is ONE IEEE division. Scale: one
    * key-shuffled lag window (frame = 1 row), one global aggregate;
    * the quantile's cumulative pass runs over the DISTINCT regression
    * magnitudes (the aucBinned grid-not-data discipline), never the
    * inversion rows. */
  def latenessProfile(
      df: DataFrame, keyCol: String, seqCol: String,
      tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(seqCol))
    val pairs = df
      .withColumn("__prev", lag(col(tsCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .select((col("__prev") - col(tsCol)).as("__reg"))
      .persist()
    try {
      val totals = pairs
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("__reg") > 0, 1L).otherwise(0L)).as("n_inversions"))
      val cum = pairs.filter(col("__reg") > 0)
        .groupBy(col("__reg")).agg(count(lit(1)).as("__c"))
        .withColumn("__cum", sum(col("__c")).over(
          Window.orderBy(col("__reg"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val picks = cum.crossJoin(broadcast(
          totals.select(col("n_inversions").as("__ni"))))
        .agg(
          max(col("__reg")).as("max_regression"),
          min(when(col("__cum") >= ceil(col("__ni") * lit(0.99)),
            col("__reg"))).as("p99_regression"))
      totals.crossJoin(broadcast(picks))
        .select(col("n_pairs"), col("n_inversions"),
          (col("n_inversions").cast("double") /
            col("n_pairs").cast("double")).as("inversion_frac"),
          coalesce(col("max_regression"), lit(0L)).as("max_regression"),
          coalesce(col("p99_regression"), lit(0L)).as("p99_regression"))
        .localCheckpoint()
    } finally { pairs.unpersist(); () }
  }

  /** 2-D equi-width histogram — the joint-distribution grid behind drift
    * heatmaps and bivariate profiling ("did the (price, quantity) shape
    * move between snapshots?"): `bins × bins` buckets spanning the GLOBAL
    * [min, max] of each axis, max closing into the last bin, rows with a
    * null on either axis dropped. Emits only OCCUPIED cells
    * (bin_x, bin_y, x_lo, x_hi, y_lo, y_hi, n) — downstream PSI/chi²
    * style comparisons regenerate the empty cells from the grid bounds,
    * exactly as [[chiSquare]] does.
    *
    * Determinism: the bin is the same fixed IEEE expression as
    * [[histogram]] evaluated per axis; bounds are exact min/max.
    * Scale: one bounds aggregate (one ROW out, broadcast back) + one
    * (bin_x, bin_y) hash aggregate with map-side combine; output ≤
    * bins². */
  def histogram2d(
      df: DataFrame, xCol: String, yCol: String, bins: Int): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val rows = df.where(x.isNotNull && y.isNotNull)
    val bounds = rows.agg(
      min(x).as("__xmn"), max(x).as("__xmx"),
      min(y).as("__ymn"), max(y).as("__ymx"))
    val bin = (v: Column, mn: Column, mx: Column) =>
      when(mx === mn, lit(0L))
        .otherwise(least(lit((bins - 1).toLong),
          floor((v - mn) * bins / (mx - mn))))
    val edge = (mn: Column, mx: Column, b: Column) =>
      mn + b * (mx - mn) / bins
    rows.crossJoin(broadcast(bounds))
      .groupBy(
        bin(x, col("__xmn"), col("__xmx")).as("bin_x"),
        bin(y, col("__ymn"), col("__ymx")).as("bin_y"),
        col("__xmn"), col("__xmx"), col("__ymn"), col("__ymx"))
      .agg(count(lit(1)).as("n"))
      .select(col("bin_x"), col("bin_y"),
        edge(col("__xmn"), col("__xmx"), col("bin_x")).as("x_lo"),
        edge(col("__xmn"), col("__xmx"), col("bin_x") + 1).as("x_hi"),
        edge(col("__ymn"), col("__ymx"), col("bin_y")).as("y_lo"),
        edge(col("__ymn"), col("__ymx"), col("bin_y") + 1).as("y_hi"),
        col("n"))
  }

  /** Mutual information (nats) between two categorical columns — the
    * dependence STRENGTH companion to [[chiSquare]]'s significance test
    * (feature selection, leakage audits: a near-deterministic mapping
    * between a feature and the label shows up as MI ≈ H(label)). Emits
    * one row: (n_rows, r, c, mi).
    *
    * Only OBSERVED cells contribute — an empty cell's term is
    * `0·ln(0·…) = 0` by the usual convention, so unlike chi-square no
    * marginal grid is needed. Cell/marginal counts are exact integers;
    * each term `(o/n)·ln(n·o/(rt·ct))` is a fixed-shape float expression
    * over them, summed by a STRICT LEFT FOLD over the (a,b)-sorted cell
    * list and pinned at `round(·, 8)` for libm `ln` (the [[entropy]]
    * discipline).
    *
    * Scale: one (a,b)-keyed aggregate over the scan (map-side
    * combinable), two O(cells) marginal aggregates joined back onto the
    * cells (broadcast — categorical cardinalities are small), one
    * bounded fold. */
  def mutualInformation(df: DataFrame, colA: String, colB: String)
      : DataFrame = {
    val cells = df.groupBy(col(colA).as("a"), col(colB).as("b"))
      .agg(count(lit(1)).as("o"))
    val ra = cells.groupBy("a").agg(sum(col("o")).as("rt"))
    val cb = cells.groupBy("b").agg(sum(col("o")).as("ct"))
    val annotated = cells
      .join(broadcast(ra), "a").join(broadcast(cb), "b")
    val packed = annotated
      .agg(sort_array(collect_list(struct(col("a"), col("b"), col("rt"),
        col("ct"), col("o")))).as("cs"),
        countDistinct(col("a")).as("r"), countDistinct(col("b")).as("c"),
        sum(col("o")).as("n"))
    val term = (x: Column) => {
      val p = x.getField("o").cast("double") / col("n").cast("double")
      p * log((col("n") * x.getField("o")).cast("double") /
        (x.getField("rt") * x.getField("ct")).cast("double"))
    }
    packed.select(col("n").as("n_rows"), col("r"), col("c"),
      round(aggregate(col("cs"), lit(0.0), (acc, x) => acc + term(x)), 8)
        .as("mi"))
  }

  /** Binned two-class ROC AUC via the tie-corrected Mann-Whitney U —
    * the ranking-quality number every scored filter (quality classifier,
    * toxicity model, dedup verifier) is judged by. `labelPred` marks the
    * positive class; `scoreBin` is an INTEGER bin of the score (callers
    * quantize, e.g. `floor(score·16)` — AUC over the bins equals AUC
    * over the raw scores whenever the binning is order-preserving at
    * the achieved resolution; ties inside a bin get the standard ½
    * credit). Emits one row: (n_pos, n_neg, u2, auc).
    *
    * Exactness: per-bin positive/negative counts are exact; with
    * `G_<` = negatives in strictly-lower bins,
    * `2U = Σ_bins p·(2·G_< + g)` stays in BIGINT (2U ≤ 2·n_pos·n_neg),
    * and `auc = 2U / (2·n_pos·n_neg)` is ONE division of exact integers
    * — bit-identical across engines, no float accumulation anywhere.
    *
    * Scale: the corpus-sized work is one map-side-combinable aggregate
    * keyed by bin; the cumulative pass is a single-partition window over
    * O(bins) rows — bins are bounded by the quantization grid (the data
    * RANGE, not the data size), the deliberate contract of binned AUC.
    * Empty-class inputs yield auc = NULL. */
  def aucBinned(df: DataFrame, labelPred: Column, scoreBin: Column)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = df.select(when(labelPred, 1L).otherwise(0L).as("__y"),
      scoreBin.cast("long").as("__q"))
      .where(col("__q").isNotNull)
    val g = b.groupBy("__q").agg(sum(col("__y")).as("__p"),
      (count(lit(1)) - sum(col("__y"))).as("__g"))
    val below = Window.orderBy(col("__q"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val one = g
      .withColumn("__gb", coalesce(sum(col("__g")).over(below), lit(0L)))
      .agg(coalesce(sum(col("__p")), lit(0L)).as("n_pos"),
        coalesce(sum(col("__g")), lit(0L)).as("n_neg"),
        coalesce(sum(col("__p") * (lit(2L) * col("__gb") + col("__g"))),
          lit(0L)).as("u2"))
    one.select(col("n_pos"), col("n_neg"), col("u2"),
      when(col("n_pos") === 0L || col("n_neg") === 0L,
        lit(null).cast("double"))
        .otherwise(col("u2").cast("double") /
          (lit(2.0) * col("n_pos").cast("double") *
            col("n_neg").cast("double"))).as("auc"))
  }

  /** Two-proportion z-test — the A/B-test readout: did variant A
    * convert at a different rate than variant B? Emits one row:
    * (n_a, x_a, n_b, x_b, p_a, p_b, z) with the pooled-variance
    * statistic `z = (p_a − p_b) / √(p̄(1−p̄)(1/n_a + 1/n_b))`.
    *
    * Determinism: all four counts ride ONE aggregate over ONE scan and
    * are exact; the statistic is a fixed-shape float expression over
    * them (divisions and an IEEE-correctly-rounded sqrt — no libm
    * transcendentals), so it hash-gates bit-exactly cross-engine.
    * NULL-converted rows count as not-converted; a degenerate arm
    * (n=0) or an all-or-nothing pooled rate yields z = NULL. */
  def twoProportionZ(
      df: DataFrame, variantA: Column, converted: Column): DataFrame = {
    val conv = coalesce(converted, lit(false))
    val one = df.agg(
      coalesce(sum(when(variantA, 1L).otherwise(0L)), lit(0L)).as("n_a"),
      coalesce(sum(when(variantA && conv, 1L).otherwise(0L)), lit(0L))
        .as("x_a"),
      coalesce(sum(when(!variantA, 1L).otherwise(0L)), lit(0L)).as("n_b"),
      coalesce(sum(when(!variantA && conv, 1L).otherwise(0L)), lit(0L))
        .as("x_b"))
    val pa = col("x_a").cast("double") / col("n_a").cast("double")
    val pb = col("x_b").cast("double") / col("n_b").cast("double")
    val pp = (col("x_a") + col("x_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val den = sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / col("n_a").cast("double") +
        lit(1.0) / col("n_b").cast("double")))
    one.select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
      when(col("n_a") === 0L, lit(null).cast("double")).otherwise(pa)
        .as("p_a"),
      when(col("n_b") === 0L, lit(null).cast("double")).otherwise(pb)
        .as("p_b"),
      when(col("n_a") === 0L || col("n_b") === 0L || den <= 0.0,
        lit(null).cast("double"))
        .otherwise((pa - pb) / den).as("z"))
  }

  /** Binned two-sample Kolmogorov-Smirnov statistic — "did this
    * distribution shift?" with a metric, where [[psi]] gives a monitor
    * score: D = max over bins of |F_a − F_b| between the two empirical
    * CDFs. `inA` tags sample membership; `scoreBin` is an integer bin
    * (the [[aucBinned]] quantization contract — D over bins lower-bounds
    * raw D and equals it at the achieved resolution). Emits one row:
    * (n_a, n_b, ks_num, at_bin, ks).
    *
    * Exactness: with cumulative counts c_a, c_b, the numerator
    * `|c_a·n_b − c_b·n_a|` is exact BIGINT; D = ks_num/(n_a·n_b) is ONE
    * division. `at_bin` is the SMALLEST bin achieving the max (earliest
    * tie-break — deterministic). Both samples ride one scan.
    *
    * Scale: one bin-keyed map-side-combinable aggregate over the union
    * scan; the CDF pass is a single-partition window over O(bins) rows
    * (bounded by the grid, not the data — the binned contract). */
  def ksTestBinned(df: DataFrame, inA: Column, scoreBin: Column)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = df.select(when(inA, 1L).otherwise(0L).as("__a"),
      scoreBin.cast("long").as("__q"))
      .where(col("__q").isNotNull)
    val g = b.groupBy("__q").agg(sum(col("__a")).as("__ca"),
      (count(lit(1)) - sum(col("__a"))).as("__cb"))
    val upTo = Window.orderBy(col("__q"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = g
      .withColumn("__fa", sum(col("__ca")).over(upTo))
      .withColumn("__fb", sum(col("__cb")).over(upTo))
    val tot = g.agg(coalesce(sum(col("__ca")), lit(0L)).as("n_a"),
      coalesce(sum(col("__cb")), lit(0L)).as("n_b"))
    val scored = cum.crossJoin(broadcast(tot))
      .withColumn("__d",
        abs(col("__fa") * col("n_b") - col("__fb") * col("n_a")))
    scored
      .agg(max(struct(col("__d"), (-col("__q")).as("__nq"),
        col("n_a"), col("n_b"))).as("__top"))
      .select(col("__top.n_a").as("n_a"), col("__top.n_b").as("n_b"),
        col("__top.__d").as("ks_num"),
        (-col("__top.__nq")).as("at_bin"),
        when(col("__top.n_a") === 0L || col("__top.n_b") === 0L,
          lit(null).cast("double"))
          .otherwise(col("__top.__d").cast("double") /
            (col("__top.n_a").cast("double") *
              col("__top.n_b").cast("double"))).as("ks"))
  }

  /** Cramér's V — the [0,1] effect-size companion to [[chiSquare]]'s
    * significance test: `V = √(χ² / (n · min(r−1, c−1)))`. A huge corpus
    * makes ANY dependence "significant"; V says whether it is LARGE —
    * the number a pipeline thresholds on before acting (e.g. "is quality
    * actually associated with source, or just n-significant?").
    *
    * Determinism rides [[chiSquare]]'s: the statistic is a strict sorted
    * fold, and V adds one division and one IEEE sqrt of it — fixed
    * shape, bit-identical cross-engine. Degenerate grids (r or c = 1)
    * yield V = NULL. Scale: identical to chiSquare (one cell aggregate;
    * the grid is O(r·c), bounded by the category spaces). */
  def cramersV(df: DataFrame, colA: String, colB: String): DataFrame = {
    val chi = chiSquare(df, colA, colB)
    val mind = least(col("r") - 1, col("c") - 1)
    chi.select(col("n_rows"), col("r"), col("c"), col("chi2"),
      when(mind <= 0L, lit(null).cast("double"))
        .otherwise(sqrt(col("chi2") /
          (col("n_rows") * mind).cast("double"))).as("cramers_v"))
  }

  /** Spearman rank correlation over two INTEGER-quantized metrics —
    * "do users who click more also spend more?" asked monotonically,
    * robust to outliers that wreck Pearson. Callers quantize each metric
    * to a bounded integer grid (the [[aucBinned]] binned contract:
    * Spearman over order-preserving bins equals Spearman over the raw
    * values at the achieved resolution; in-bin ties get the standard
    * averaged rank).
    *
    * Exactness: doubled average ranks `r2 = 2·L + c + 1` (L = rows in
    * strictly-lower bins, c = rows in this bin) are exact BIGINTs from
    * one bin-keyed aggregate + an O(bins) cumulative window; every
    * moment (Σr2x, Σr2y, Σr2x², Σr2y², Σr2x·r2y) is an exact BIGINT
    * (r2 ≤ 2n keeps Σr2x·r2y ≤ 4n³ in range to n ≈ 10⁶ — beyond that,
    * widen the moment columns to DECIMAL first), the n-scaled
    * combinations go through DECIMAL(38,0) (DuckDB: HUGEINT), and
    * `rho = num / (√dx · √dy)` is one fixed-shape float expression.
    * The doubling cancels exactly (powers of two divide out even in
    * IEEE terms — both engines compute the identical shape anyway).
    *
    * Scale: two bin-keyed aggregates + two O(bins) windows + two
    * broadcast joins back onto the one corpus scan — no global
    * row-numbering, no data-sized windows. Output one row:
    * (n_rows, rho). */
  def spearman(df: DataFrame, xBin: Column, yBin: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = df.select(xBin.cast("long").as("__x"),
      yBin.cast("long").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
    def rank2(c: String): DataFrame = {
      val g = b.groupBy(col(c)).agg(count(lit(1)).as("__c"))
      val below = Window.orderBy(col(c))
        .rowsBetween(Window.unboundedPreceding, -1)
      g.withColumn("__l", coalesce(sum(col("__c")).over(below), lit(0L)))
        .select(col(c), (lit(2L) * col("__l") + col("__c") + 1L)
          .as(s"__r2$c"))
    }
    val ranked = b
      .join(broadcast(rank2("__x")), "__x")
      .join(broadcast(rank2("__y")), "__y")
    val m = ranked.agg(count(lit(1)).as("n"),
      sum(col("__r2__x")).as("sx"), sum(col("__r2__y")).as("sy"),
      sum(col("__r2__x") * col("__r2__x")).as("sxx"),
      sum(col("__r2__y") * col("__r2__y")).as("syy"),
      sum(col("__r2__x") * col("__r2__y")).as("sxy"))
    val d = (c: Column) => c.cast("decimal(38,0)")
    val num = d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))
    val dx = d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))
    val dy = d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy"))
    m.select(col("n").as("n_rows"),
      when(col("n") < 2L || dx <= 0 || dy <= 0, lit(null).cast("double"))
        .otherwise(round(num.cast("double") /
          (sqrt(dx.cast("double")) * sqrt(dy.cast("double"))), 8))
        .as("rho"))
  }

  /** Kendall's τ-b over the binned 2-D grid — Spearman's
    * concordance-counting sibling, exact from the contingency cells:
    * `nc`/`nd` count concordant/discordant PAIRS as Σ over cell pairs
    * (x₁<x₂, y₁<y₂ / y₁>y₂) of o₁·o₂, and the tie terms come from the
    * marginal counts. τ-b = (nc − nd) / (√(n0−n1) · √(n0−n2)) with
    * n0 = n(n−1)/2, n1/n2 = Σ t(t−1)/2 over x/y marginals.
    *
    * Exactness: every count is BIGINT (nc ≤ n²/2 — in range to
    * n ≈ 10⁹ pairs-of-rows); the two sqrt factors are taken separately
    * so nothing exceeds double range, one fixed-shape float at the end.
    *
    * Scale: ONE corpus aggregate to the O(r·c) cell grid; the pair
    * enumeration is a broadcast self-join of the GRID (bounded by the
    * bin spaces, e.g. 16×16 → ~32k cell pairs), never of the data. */
  def kendallTauB(df: DataFrame, xBin: Column, yBin: Column): DataFrame = {
    val cells = df.select(xBin.cast("long").as("__x"),
      yBin.cast("long").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
      .groupBy(col("__x"), col("__y")).agg(count(lit(1)).as("o"))
      .localCheckpoint()
    val pairs = cells.as("i").join(broadcast(cells.as("j")),
        col("i.__x") < col("j.__x"))
      .agg(
        coalesce(sum(when(col("i.__y") < col("j.__y"),
          col("i.o") * col("j.o")).otherwise(0L)), lit(0L)).as("nc"),
        coalesce(sum(when(col("i.__y") > col("j.__y"),
          col("i.o") * col("j.o")).otherwise(0L)), lit(0L)).as("nd"))
    val xt = cells.groupBy("__x").agg(sum(col("o")).as("t"))
      .agg(coalesce(sum(col("t") * (col("t") - 1L)), lit(0L)).as("tx2"),
        coalesce(sum(col("t")), lit(0L)).as("n"))
    val yt = cells.groupBy("__y").agg(sum(col("o")).as("t"))
      .agg(coalesce(sum(col("t") * (col("t") - 1L)), lit(0L)).as("ty2"))
    val j = pairs.crossJoin(broadcast(xt)).crossJoin(broadcast(yt))
    val n0x2 = col("n") * (col("n") - 1L) // 2·n0, kept doubled: exact
    j.select(col("n").as("n_rows"), col("nc"), col("nd"),
      when(n0x2 - col("tx2") <= 0L || n0x2 - col("ty2") <= 0L,
        lit(null).cast("double"))
        .otherwise(lit(2.0) * (col("nc") - col("nd")).cast("double") /
          (sqrt((n0x2 - col("tx2")).cast("double")) *
            sqrt((n0x2 - col("ty2")).cast("double")))).as("tau_b"))
  }

  /** Welch's unequal-variance t-test over a quantized measure — the
    * two-sample mean comparison that does NOT assume equal variances
    * (the realistic case for "did the new source shift mean quality?").
    * Emits one row: (n_a, n_b, mean_a, mean_b, t, dof) with
    * Welch–Satterthwaite degrees of freedom.
    *
    * Exactness: callers quantize (`floor(x·scale)` — the fixed-point
    * discipline), so each arm's moments (n, Σq, Σq²) are exact BIGINTs
    * riding ONE aggregate over ONE scan; n·Σq² − S² goes through
    * DECIMAL(38,0) (DuckDB: HUGEINT), and mean/variance/t/dof are one
    * fixed-shape float expression over the exact integers — divisions
    * and IEEE sqrt only, no libm, bit-identical cross-engine. Arms with
    * n < 2 or zero variance yield t = dof = NULL. */
  def welchT(
      df: DataFrame, inA: Column, q: Column, scale: Double): DataFrame = {
    val b = df.select(when(inA, 1L).otherwise(0L).as("__a"),
      q.cast("long").as("__q")).where(col("__q").isNotNull)
    val m = b.agg(
      coalesce(sum(col("__a")), lit(0L)).as("na"),
      coalesce(sum(lit(1L) - col("__a")), lit(0L)).as("nb"),
      coalesce(sum(when(col("__a") === 1L, col("__q"))), lit(0L)).as("sa"),
      coalesce(sum(when(col("__a") === 0L, col("__q"))), lit(0L)).as("sb"),
      coalesce(sum(when(col("__a") === 1L, col("__q") * col("__q"))),
        lit(0L)).as("qa"),
      coalesce(sum(when(col("__a") === 0L, col("__q") * col("__q"))),
        lit(0L)).as("qb"))
    val d = (c: Column) => c.cast("decimal(38,0)")
    val s2 = lit(scale * scale)
    val mean = (s: Column, n: Column) =>
      s.cast("double") / n.cast("double") / lit(scale)
    // Sample variance of q/scale: (n·Σq² − S²) / (n·(n−1)·scale²).
    val vr = (n: Column, s: Column, qq: Column) =>
      (d(n) * d(qq) - d(s) * d(s)).cast("double") /
        ((n * (n - 1L)).cast("double") * s2)
    val va = vr(col("na"), col("sa"), col("qa"))
    val vb = vr(col("nb"), col("sb"), col("qb"))
    val sea = va / col("na").cast("double")
    val seb = vb / col("nb").cast("double")
    val se = sea + seb
    val bad = col("na") < 2L || col("nb") < 2L
    m.select(col("na").as("n_a"), col("nb").as("n_b"),
      when(col("na") === 0L, lit(null).cast("double"))
        .otherwise(mean(col("sa"), col("na"))).as("mean_a"),
      when(col("nb") === 0L, lit(null).cast("double"))
        .otherwise(mean(col("sb"), col("nb"))).as("mean_b"),
      when(bad || se <= 0.0, lit(null).cast("double"))
        .otherwise((mean(col("sa"), col("na")) -
          mean(col("sb"), col("nb"))) / sqrt(se)).as("t"),
      when(bad || se <= 0.0, lit(null).cast("double"))
        .otherwise(se * se / (sea * sea / (col("na") - 1L).cast("double") +
          seb * seb / (col("nb") - 1L).cast("double"))).as("dof"))
  }

  /** TOST equivalence test (two one-sided tests) — the question a plain
    * t-test cannot answer: is the A−B mean difference provably WITHIN
    * ±`margin`? (Did the cheaper pipeline variant leave quality
    * unchanged, not merely "not significantly different"?) Declares
    * equivalence when BOTH one-sided large-sample z statistics clear
    * z₀.₉₅: `t_lower = (Δ+margin)/se > 1.645` and
    * `t_upper = (Δ−margin)/se < −1.645`.
    *
    * Same exact-moment discipline as [[welchT]] (quantized inputs, one
    * aggregate, DECIMAL(38,0) cross-moments, one fixed IEEE readout);
    * the boolean verdict compares two engine-identical doubles against
    * a shared literal. Emits one row: (n_a, n_b, diff, se, t_lower,
    * t_upper, equivalent) — NULL stats (and false) when either arm has
    * n < 2 or pooled variance is zero. */
  def tostEquivalence(
      df: DataFrame, inA: Column, q: Column, scale: Double,
      margin: Double): DataFrame = {
    require(margin > 0.0, s"margin must be positive, got $margin")
    val z95 = 1.6448536269514722 // Φ⁻¹(0.95), shared with the oracle
    val b = df.select(when(inA, 1L).otherwise(0L).as("__a"),
      q.cast("long").as("__q")).where(col("__q").isNotNull)
    val m = b.agg(
      coalesce(sum(col("__a")), lit(0L)).as("na"),
      coalesce(sum(lit(1L) - col("__a")), lit(0L)).as("nb"),
      coalesce(sum(when(col("__a") === 1L, col("__q"))), lit(0L)).as("sa"),
      coalesce(sum(when(col("__a") === 0L, col("__q"))), lit(0L)).as("sb"),
      coalesce(sum(when(col("__a") === 1L, col("__q") * col("__q"))),
        lit(0L)).as("qa"),
      coalesce(sum(when(col("__a") === 0L, col("__q") * col("__q"))),
        lit(0L)).as("qb"))
    val d = (c: Column) => c.cast("decimal(38,0)")
    val s2 = lit(scale * scale)
    val mean = (s: Column, n: Column) =>
      s.cast("double") / n.cast("double") / lit(scale)
    val vr = (n: Column, s: Column, qq: Column) =>
      (d(n) * d(qq) - d(s) * d(s)).cast("double") /
        ((n * (n - 1L)).cast("double") * s2)
    val sea = vr(col("na"), col("sa"), col("qa")) / col("na").cast("double")
    val seb = vr(col("nb"), col("sb"), col("qb")) / col("nb").cast("double")
    val se2 = sea + seb
    val bad = col("na") < 2L || col("nb") < 2L || se2 <= 0.0
    val diff = mean(col("sa"), col("na")) - mean(col("sb"), col("nb"))
    val seC = sqrt(se2)
    val tl = (diff + lit(margin)) / seC
    val tu = (diff - lit(margin)) / seC
    m.select(col("na").as("n_a"), col("nb").as("n_b"),
      when(bad, lit(null).cast("double")).otherwise(diff).as("diff"),
      when(bad, lit(null).cast("double")).otherwise(seC).as("se"),
      when(bad, lit(null).cast("double")).otherwise(tl).as("t_lower"),
      when(bad, lit(null).cast("double")).otherwise(tu).as("t_upper"),
      when(bad, lit(false))
        .otherwise(tl > z95 && tu < -z95).as("equivalent"))
  }

  /** CUPED variance reduction for A/B readouts — the standard
    * experimentation trick: shrink each arm's metric by the part a
    * PRE-experiment covariate already explains,
    * `adj = mean(Y) − θ·(mean(X) − mean(X_all))` with
    * `θ = cov(X,Y)/var(X)`, cutting variance by the squared X–Y
    * correlation without biasing the contrast.
    *
    * Input: one row per experimental unit with a string arm label and
    * INTEGER-QUANTIZED covariate/metric columns (e.g. cents — the
    * engine's money discipline). Emits per arm: (arm, n, mean_x,
    * mean_y, theta, adj_mean); `theta` (shared by all arms) is NULL
    * when var(X) = 0, in which case `adj_mean` falls back to the plain
    * mean.
    *
    * Determinism: all five moments (n, Σx, Σy, Σxy, Σx²) are exact —
    * per-row products stay in BIGINT (quantized inputs keep them far
    * from overflow; at 10⁷-unit per-unit totals the product is 10¹⁴ of
    * 9.2·10¹⁸), accumulated as DECIMAL(38,0); θ and the adjusted means
    * are final fixed-shape float expressions over them (the Welch-t
    * discipline). Scale: two map-side-combinable aggregates (global
    * moments, per-arm sums) + a broadcast 1-row crossJoin. */
  def cupedAdjust(
      units: DataFrame, armCol: String, xCol: String, yCol: String,
      scale: Long): DataFrame = {
    require(scale > 0L, s"scale must be positive, got $scale")
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val dd = (c: Column) => c.cast("double")
    val u = units.select(col(armCol).as("arm"),
      col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
    val m = u.agg(count(lit(1)).as("__n"),
      coalesce(sum(col("__x")), lit(0L)).as("__sx"),
      coalesce(sum(col("__y")), lit(0L)).as("__sy"),
      coalesce(sum(d38(col("__x") * col("__y"))), d38(lit(0L))).as("__sxy"),
      coalesce(sum(d38(col("__x") * col("__x"))), d38(lit(0L))).as("__sxx"))
    val num = d38(col("__n")) * col("__sxy") - d38(col("__sx")) * d38(col("__sy"))
    val den = d38(col("__n")) * col("__sxx") - d38(col("__sx")) * d38(col("__sx"))
    val theta = when(den === d38(lit(0L)), lit(null).cast("double"))
      .otherwise(dd(num) / dd(den))
    val s = lit(scale.toDouble)
    val meanY = dd(col("__sya")) / dd(col("__na")) / s
    val meanX = dd(col("__sxa")) / dd(col("__na")) / s
    val gx = dd(col("__sx")) / dd(col("__n")) / s
    u.groupBy(col("arm"))
      .agg(count(lit(1)).as("__na"),
        coalesce(sum(col("__x")), lit(0L)).as("__sxa"),
        coalesce(sum(col("__y")), lit(0L)).as("__sya"))
      .crossJoin(broadcast(m))
      .withColumn("theta", theta)
      .select(col("arm"), col("__na").as("n"),
        meanX.as("mean_x"), meanY.as("mean_y"), col("theta"),
        when(col("theta").isNull, meanY)
          .otherwise(meanY - col("theta") * (meanX - gx)).as("adj_mean"))
  }

  /** Experiment power sizing — the pre-registration readout: with the
    * metric variance this population actually exhibits, what's the
    * smallest true effect a 50/50 split would detect at α=5% (two-sided)
    * with 80% power? `MDE = (z_{α/2} + z_β) · √(2σ²/n_arm)`. Run BEFORE
    * launching: an MDE far above the plausible effect means the test is
    * theater.
    *
    * Input: one row per unit with an INTEGER-QUANTIZED metric. Emits one
    * row: (n_units, n_per_arm, mean_y, var_y, mde_abs, mde_rel);
    * `mde_rel` is NULL on a zero mean, everything NULL under 2 units
    * per arm.
    *
    * Determinism: (n, Σy, Σy²) exact (the Welch discipline); the z-sum
    * is ONE double literal shared verbatim with the oracle
    * (`Double.toString` round-trips); mde is a fixed-shape float with an
    * IEEE sqrt. Scale: one map-side-combinable aggregate. */
  def powerMde(
      units: DataFrame, yCol: String, scale: Long,
      zSum: Double = 1.959963984540054 + 0.8416212335729143): DataFrame = {
    require(scale > 0L, s"scale must be positive, got $scale")
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val dd = (c: Column) => c.cast("double")
    val y = col(yCol).cast("long")
    val m = units.agg(count(lit(1)).as("n"),
      coalesce(sum(y), lit(0L)).as("s"),
      coalesce(sum(d38(y * y)), d38(lit(0L))).as("q"))
      .withColumn("n_arm", expr("n div 2"))
    val s2 = lit(scale.toDouble * scale.toDouble)
    val mean = dd(col("s")) / dd(col("n")) / lit(scale.toDouble)
    val vr = (d38(col("n")) * col("q") - d38(col("s")) * d38(col("s")))
      .cast("double") / ((col("n") * (col("n") - 1L)).cast("double") * s2)
    val small = col("n_arm") < 2L
    val mde = lit(zSum) * sqrt(lit(2.0) * vr / dd(col("n_arm")))
    m.select(col("n").as("n_units"), col("n_arm").as("n_per_arm"),
      when(col("n") === 0L, lit(null).cast("double")).otherwise(mean)
        .as("mean_y"),
      when(col("n") < 2L, lit(null).cast("double")).otherwise(vr)
        .as("var_y"),
      when(small, lit(null).cast("double")).otherwise(mde).as("mde_abs"),
      // integer zero-test on Σy, not a float compare against a division
      // that would be 0/0 on an empty frame (ANSI throws)
      when(small || col("s") === 0L, lit(null).cast("double"))
        .otherwise(mde / mean).as("mde_rel"))
  }

  /** Difference-in-differences — the quasi-experimental readout when
    * you could not randomize: the treatment effect is the TREATED
    * group's pre→post change minus the CONTROL group's
    * (`did = (μ_t1 − μ_t0) − (μ_c1 − μ_c0)`), which cancels both the
    * group-level baseline difference and the common time trend.
    *
    * Input: one row per (unit, period) observation with boolean
    * treated/post markers and an INTEGER-QUANTIZED outcome. Emits one
    * row: per-cell ns and means, `did`, its pooled standard error
    * `se = √(Σ s²_g/n_g)` over the four cells, and `t_stat = did/se`
    * (NULL when any cell has n < 2 or the variance degenerates).
    *
    * Determinism: per-cell (n, Σy, Σy²) are exact — products BIGINT,
    * accumulation DECIMAL(38,0) (the Welch discipline); means, did, se,
    * t are final fixed-shape floats. Scale: ONE map-side-combinable
    * aggregate over four cells. */
  def diffInDiff(
      obs: DataFrame, treatedCol: Column, postCol: Column, yCol: String,
      scale: Long): DataFrame = {
    require(scale > 0L, s"scale must be positive, got $scale")
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val dd = (c: Column) => c.cast("double")
    val y = col(yCol).cast("long")
    def cell(t: Boolean, p: Boolean, what: String): Column = {
      val in = (if (t) treatedCol else !treatedCol) &&
        (if (p) postCol else !postCol)
      what match {
        case "n" => coalesce(sum(when(in, 1L).otherwise(0L)), lit(0L))
        case "s" => coalesce(sum(when(in, y)), lit(0L))
        case "q" => coalesce(sum(when(in, d38(y * y))), d38(lit(0L)))
      }
    }
    val cells = Seq(("c0", false, false), ("c1", false, true),
      ("t0", true, false), ("t1", true, true))
    val m = obs.agg(
      cell(false, false, "n").as("n_c0"),
      cells.flatMap { case (tag, t, p) =>
        (if (tag == "c0") Nil
         else Seq(cell(t, p, "n").as(s"n_$tag"))) ++
          Seq(cell(t, p, "s").as(s"s_$tag"), cell(t, p, "q").as(s"q_$tag"))
      }: _*)
    val mean = (tag: String) =>
      dd(col(s"s_$tag")) / dd(col(s"n_$tag")) / lit(scale.toDouble)
    // sample variance of y/scale: (n·Σy² − S²) / (n·(n−1)·scale²)
    val vr = (tag: String) =>
      (d38(col(s"n_$tag")) * col(s"q_$tag") -
        d38(col(s"s_$tag")) * d38(col(s"s_$tag"))).cast("double") /
        ((col(s"n_$tag") * (col(s"n_$tag") - 1L)).cast("double") *
          lit(scale.toDouble * scale.toDouble))
    val anySmall = cells.map(c => col(s"n_${c._1}") < 2L).reduce(_ || _)
    val seSq = cells.map(c => vr(c._1) / dd(col(s"n_${c._1}"))).reduce(_ + _)
    val did = (mean("t1") - mean("t0")) - (mean("c1") - mean("c0"))
    m.select(
      col("n_c0"), col("n_c1"), col("n_t0"), col("n_t1"),
      when(col("n_c0") === 0L, lit(null).cast("double"))
        .otherwise(mean("c0")).as("mean_c0"),
      when(col("n_c1") === 0L, lit(null).cast("double"))
        .otherwise(mean("c1")).as("mean_c1"),
      when(col("n_t0") === 0L, lit(null).cast("double"))
        .otherwise(mean("t0")).as("mean_t0"),
      when(col("n_t1") === 0L, lit(null).cast("double"))
        .otherwise(mean("t1")).as("mean_t1"),
      when(anySmall, lit(null).cast("double")).otherwise(did).as("did"),
      when(anySmall || seSq <= 0.0, lit(null).cast("double"))
        .otherwise(sqrt(seSq)).as("se"),
      when(anySmall || seSq <= 0.0, lit(null).cast("double"))
        .otherwise(did / sqrt(seSq)).as("t_stat"))
  }

  /** Sample-ratio-mismatch guardrail — the first thing to check before
    * reading ANY experiment: does the realized arm split match the
    * design? Emits one row: (n_a, n_b, chi2) for an expected 50/50
    * split, `chi2 = (n_a − n_b)² / (n_a + n_b)` (the 1-dof identity —
    * exact integer numerator, ONE division). An SRM chi2 over ~3.84
    * means the assignment itself is broken and the readout is void. */
  /** Caliper nearest-neighbor matching ATT — the observational-causal
    * estimate when treatment is NOT randomized: each treated unit
    * matches its nearest control on the quantized covariate within
    * `caliper` (with replacement; ties break to the smaller control
    * id), ATT = mean(y_treated − y_matched-control) over exact integer
    * sums. Treated units with no in-caliper control drop (reported via
    * n_treated vs n_matched — the honest overlap diagnostic).
    *
    * Scale: candidates come from a BUCKET equi-join (bucket width =
    * caliper, each treated probes its own and both adjacent buckets),
    * never a cross join or global sort; the per-treated argmin is a
    * bucket-bounded window. */
  def caliperMatchAtt(units: DataFrame, treated: Column, xQ: Column,
      yQ: Column, caliper: Long, idCol: Column): DataFrame = {
    require(caliper > 0, s"caliper must be positive, got $caliper")
    import org.apache.spark.sql.expressions.Window
    val base = units.select(idCol.as("__id"), treated.as("__t"),
        xQ.cast("long").as("__x"), coalesce(yQ.cast("long"), lit(0L))
          .as("__y"))
      .where(col("__x").isNotNull)
    // FLOOR division (not `div`'s truncation toward zero) keeps every
    // bucket exactly `caliper` wide for negative covariates too — `div`
    // would make bucket 0 span (−caliper, caliper), doubling the
    // candidate set near zero (results were still correct; the ±1 probe
    // covers any ≥caliper-wide bucket)
    val floorBucket =
      expr(s"__x div ${caliper}L - (CASE WHEN __x % ${caliper}L < 0 " +
        "THEN 1 ELSE 0 END)")
    val controls = base.where(!col("__t"))
      .select(floorBucket.as("__b"),
        col("__id").as("__cid"), col("__x").as("__cx"),
        col("__y").as("__cy"))
    val treatedRows = base.where(col("__t"))
    val probes = treatedRows
      .select(col("__id"), col("__x"), col("__y"),
        explode(array(lit(-1L), lit(0L), lit(1L))).as("__d"))
      .withColumn("__b", floorBucket + col("__d"))
    val pairs = probes.join(controls, "__b")
      .where(abs(col("__x") - col("__cx")) <= caliper)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__id"))
          .orderBy(abs(col("__x") - col("__cx")).asc, col("__cid").asc)))
      .where(col("__rn") === 1)
    val nT = treatedRows.agg(count(lit(1)).as("n_treated"))
    pairs.agg(count(lit(1)).as("n_matched"),
        coalesce(sum(col("__y")), lit(0L)).as("__syt"),
        coalesce(sum(col("__cy")), lit(0L)).as("__syc"))
      .crossJoin(broadcast(nT))
      .select(col("n_treated"), col("n_matched"),
        (col("__syt") - col("__syc")).as("sum_dy"),
        when(col("n_matched") > 0L,
          (col("__syt") - col("__syc")).cast("double") /
            col("n_matched").cast("double")).as("att"),
        when(col("n_matched") > 0L,
          col("__syt").cast("double") / col("n_matched").cast("double"))
          .as("mean_y_treated"),
        when(col("n_matched") > 0L,
          col("__syc").cast("double") / col("n_matched").cast("double"))
          .as("mean_y_control"))
  }

  /** Sharp regression discontinuity: local linear fits on both sides
    * of a cutoff in the quantized running variable, treatment effect =
    * right-limit minus left-limit of the fitted outcome at the cutoff.
    * The causal trio's third read beside diff-in-diff (parallel-trends
    * id) and the A/B z-test (randomized id): here identification comes
    * from continuity at the threshold.
    *
    * Exactness: per-side OLS from five exact sums (BIGINT +
    * DECIMAL(38,0) products; slope numerator/denominator subtracted in
    * decimal before ONE double cast — no cancellation), predictions
    * and the effect as fixed-shape IEEE trees the oracle mirrors.
    * One scan, one single-row aggregate. */
  def regressionDiscontinuity(df: DataFrame, xQ: Column, y: Column,
      cutoffQ: Long, bandwidthQ: Long): DataFrame = {
    require(bandwidthQ > 0, s"bandwidthQ must be positive, got $bandwidthQ")
    val base = df.select(xQ.cast("long").as("__x"),
        when(y, 1L).otherwise(0L).as("__y"))
      .where(col("__x").isNotNull &&
        col("__x") >= cutoffQ - bandwidthQ &&
        col("__x") < cutoffQ + bandwidthQ)
      .withColumn("__r", (col("__x") >= cutoffQ).cast("int"))
    val dd = (c: Column) => c.cast("decimal(38,0)")
    def side(s: String, r: Int) = Seq(
      sum(when(col("__r") === r, 1L).otherwise(0L)).as(s"n_$s"),
      sum(when(col("__r") === r, col("__x")).otherwise(0L)).as(s"sx_$s"),
      sum(when(col("__r") === r, col("__y")).otherwise(0L)).as(s"sy_$s"),
      sum(when(col("__r") === r, dd(col("__x")) * dd(col("__x")))
        .otherwise(dd(lit(0L)))).as(s"sxx_$s"),
      sum(when(col("__r") === r, dd(col("__x")) * dd(col("__y")))
        .otherwise(dd(lit(0L)))).as(s"sxy_$s"))
    val cols = side("l", 0) ++ side("r", 1)
    val agged = base.agg(cols.head, cols.tail: _*)
    val d = (c: Column) => c.cast("double")
    def fit(s: String) = {
      val n = col(s"n_$s"); val sx = col(s"sx_$s"); val sy = col(s"sy_$s")
      val den = (dd(n) * col(s"sxx_$s") - dd(sx) * dd(sx)).cast("double")
      val num = (dd(n) * col(s"sxy_$s") - dd(sx) * dd(sy)).cast("double")
      val b = num / den
      val a = d(sy) / d(n) - b * (d(sx) / d(n))
      (n, den, b, a + b * lit(cutoffQ.toDouble))
    }
    val (nl, denl, bl, predl) = fit("l")
    val (nr, denr, br, predr) = fit("r")
    val okL = nl >= 2L && denl =!= 0.0
    val okR = nr >= 2L && denr =!= 0.0
    agged.select(col("n_l"), col("n_r"),
      when(okL, bl).as("slope_l"), when(okR, br).as("slope_r"),
      when(okL, predl).as("pred_l"), when(okR, predr).as("pred_r"),
      when(okL && okR, predr - predl).as("rdd_effect"))
  }

  /** Tukey median polish — the robust two-way decomposition
    * cell = row_eff + col_eff + residual, fit by alternately sweeping
    * out row and column medians (`sweeps` full passes, fixed — a
    * deterministic budget like the label-prop/PageRank loops). Means
    * would be dragged by a few huge cells; medians give the resistant
    * fit, and what's LEFT (the residual) is the interaction — the
    * robust anomaly read on a contingency-style grid.
    *
    * Exactness: cell values are pre-quantized longs; each median is an
    * exact order statistic (sorted-list pick, lower median on even
    * counts) and every update is integer subtraction, so the DuckDB
    * replay is sweep-for-sweep identical. Cost: the grid is O(rows ×
    * cols) CELLS (the corpus collapses in the first aggregate);
    * each sweep is two grouped aggregates + broadcast joins on cells. */
  def medianPolish(df: DataFrame, rowCol: String, colCol: String,
      q: Column, sweeps: Int = 2): DataFrame = {
    require(sweeps >= 1, s"sweeps must be >= 1, got $sweeps")
    val medExpr = "element_at(array_sort(collect_list(__r)), " +
      "cast((count(__r) + 1) div 2 as int))"
    var grid = df
      .select(col(rowCol).as("__a"), col(colCol).as("__b"),
        coalesce(q.cast("long"), lit(0L)).as("__q"))
      .groupBy(col("__a"), col("__b"))
      .agg(sum(col("__q")).as("__cell"))
      .withColumn("__r", col("__cell"))
      .withColumn("__ae", lit(0L))
      .withColumn("__be", lit(0L))
    for (_ <- 1 to sweeps) {
      val rm = grid.groupBy(col("__a")).agg(expr(medExpr).as("__m"))
      grid = grid.join(broadcast(rm), "__a")
        .withColumn("__r", col("__r") - col("__m"))
        .withColumn("__ae", col("__ae") + col("__m"))
        .drop("__m")
      val cm = grid.groupBy(col("__b")).agg(expr(medExpr).as("__m"))
      grid = grid.join(broadcast(cm), "__b")
        .withColumn("__r", col("__r") - col("__m"))
        .withColumn("__be", col("__be") + col("__m"))
        .drop("__m")
    }
    grid.select(col("__a").as(rowCol), col("__b").as(colCol),
      col("__cell").as("cell"), col("__r").as("resid"),
      col("__ae").as("row_eff"), col("__be").as("col_eff"))
  }

  /** t-closeness audit — the third of the privacy trio (k-anonymity:
    * "is the class big enough?", l-diversity: "are the sensitive values
    * varied?", t-closeness: "does the class's sensitive DISTRIBUTION
    * give away more than the global one?"). For categorical sensitive
    * values the earth-mover distance reduces to total variation:
    * tv(g) = ½·Σ_v |c_gv/n_g − C_v/N|. Values absent from a class
    * contribute C_v·n_g, so over the common denominator
    * tv = (Σ_{v∈g}(|c_gv·N − C_v·n_g| − C_v·n_g) + N·n_g) / (2·n_g·N)
    * — an exact DECIMAL(38,0)/HUGEINT numerator (products reach ~1e25
    * past BIGINT at corpus scale), ONE double division per class.
    *
    * Plan shape: three aggregates keyed by (class, value), value, and
    * class; the per-value global counts broadcast onto the cell counts.
    * Output per class: (qiCols…, n, tv). */
  def tCloseness(
      df: DataFrame, qiCols: Seq[String], sensCol: String): DataFrame = {
    require(qiCols.nonEmpty, "tCloseness needs at least one QI column")
    val qi = qiCols.map(col)
    val base = df.where(col(sensCol).isNotNull)
    val cell = base.groupBy(qi :+ col(sensCol).as("__v"): _*)
      .agg(count(lit(1)).as("__c"))
    val glob = base.groupBy(col(sensCol).as("__v"))
      .agg(count(lit(1)).as("__cv"))
    val tot = base.agg(count(lit(1)).as("__nn"))
    val grp = base.groupBy(qi: _*).agg(count(lit(1)).as("__ng"))
    val dd = (c: Column) => c.cast("decimal(38,0)")
    val terms = cell
      .join(broadcast(glob), "__v")
      .join(grp, qiCols)
      .crossJoin(broadcast(tot))
      .select(qi ++ Seq(col("__ng"),
        (abs(dd(col("__c")) * dd(col("__nn")) -
          dd(col("__cv")) * dd(col("__ng"))) -
          dd(col("__cv")) * dd(col("__ng"))).as("__trm")): _*)
    val part = terms.groupBy((qiCols :+ "__ng").map(col): _*)
      .agg(sum(col("__trm")).as("__p"))
    part.crossJoin(broadcast(tot))
      .select(qi ++ Seq(col("__ng").cast("long").as("n"),
        ((col("__p") + dd(col("__ng")) * dd(col("__nn"))).cast("double") /
          (lit(2.0) * col("__ng").cast("double") *
            col("__nn").cast("double"))).as("tv")): _*)
  }

  /** Cluster-robust A/B readout for a RATIO metric (e.g. revenue per
    * event) via the delta method: the randomization unit is the cluster
    * (user), events inside a unit are correlated, so the naive per-event
    * variance is wrong — the correct one treats each unit's
    * (x_i = Σ quantized value, y_i = event count) as the iid draw and
    * linearizes R = ΣX/ΣY:
    * var(R) ≈ (s_xx − 2R·s_xy + R²·s_yy) / (n·ȳ²).
    *
    * Accumulation discipline: per-unit x, y are exact BIGINTs; the
    * cross-moment sums Σx², Σy², Σxy ride DECIMAL(38,0) (n·Σ − S·S
    * stays exact far past BIGINT at 1e12 units); every derived float is
    * a fixed-shape IEEE tree the oracle mirrors token-for-token. One
    * shuffle (unit groupBy), then a single-row aggregate. */
  def deltaMethodRatio(
      df: DataFrame, unitCol: Column, inA: Column, q: Column,
      scale: Double): DataFrame = {
    val units = df
      .select(unitCol.as("__u"), when(inA, 1L).otherwise(0L).as("__a"),
        coalesce(q.cast("long"), lit(0L)).as("__q"))
      .groupBy(col("__u"), col("__a"))
      .agg(sum(col("__q")).as("__x"), count(lit(1)).as("__y"))
    val dd = (c: Column) => c.cast("decimal(38,0)")
    val m = units.groupBy(col("__a")).agg(
      count(lit(1)).as("n"),
      sum(col("__x")).as("sx"), sum(col("__y")).as("sy"),
      sum(dd(col("__x")) * dd(col("__x"))).as("sxx"),
      sum(dd(col("__y")) * dd(col("__y"))).as("syy"),
      sum(dd(col("__x")) * dd(col("__y"))).as("sxy"))
    def armCol(c: String, a: Int) = max(when(col("__a") === a, col(c)))
    val w = m.agg(
      armCol("n", 1).as("n_a"), armCol("n", 0).as("n_b"),
      armCol("sx", 1).as("sx_a"), armCol("sx", 0).as("sx_b"),
      armCol("sy", 1).as("sy_a"), armCol("sy", 0).as("sy_b"),
      armCol("sxx", 1).as("sxx_a"), armCol("sxx", 0).as("sxx_b"),
      armCol("syy", 1).as("syy_a"), armCol("syy", 0).as("syy_b"),
      armCol("sxy", 1).as("sxy_a"), armCol("sxy", 0).as("sxy_b"))
    val d = (c: Column) => c.cast("double")
    def varOf(s: String) = {
      val n = col(s"n_$s"); val sx = col(s"sx_$s"); val sy = col(s"sy_$s")
      // n·Σm − S·S subtracted IN DECIMAL (exact), ONE cast to double —
      // a double-side subtraction would cancel catastrophically
      val vxx = (dd(n) * col(s"sxx_$s") - dd(sx) * dd(sx)).cast("double") /
        (d(n) * d(n - 1L))
      val vyy = (dd(n) * col(s"syy_$s") - dd(sy) * dd(sy)).cast("double") /
        (d(n) * d(n - 1L))
      val vxy = (dd(n) * col(s"sxy_$s") - dd(sx) * dd(sy)).cast("double") /
        (d(n) * d(n - 1L))
      val rq = d(sx) / d(sy)
      val ybar = d(sy) / d(n)
      (vxx - lit(2.0) * rq * vxy + rq * rq * vyy) / (d(n) * ybar * ybar)
    }
    def ratioOf(s: String) =
      d(col(s"sx_$s")) / d(col(s"sy_$s")) / lit(scale)
    def seOf(s: String) = {
      val v = varOf(s)
      when(v >= 0.0, sqrt(v) / lit(scale))
    }
    val ok = (s: String) => col(s"n_$s") >= 2L && col(s"sy_$s") > 0L
    w.select(
      col("n_a"), col("n_b"),
      when(ok("a"), ratioOf("a")).as("ratio_a"),
      when(ok("b"), ratioOf("b")).as("ratio_b"),
      when(ok("a"), seOf("a")).as("se_a"),
      when(ok("b"), seOf("b")).as("se_b"),
      when(ok("a") && ok("b"),
        when(seOf("a") * seOf("a") + seOf("b") * seOf("b") > 0.0,
          (ratioOf("a") - ratioOf("b")) /
            sqrt(seOf("a") * seOf("a") + seOf("b") * seOf("b"))))
        .as("z"))
  }

  def srmCheck(df: DataFrame, variantA: Column): DataFrame = {
    val one = df.agg(
      coalesce(sum(when(variantA, 1L).otherwise(0L)), lit(0L)).as("n_a"),
      coalesce(sum(when(variantA, 0L).otherwise(1L)), lit(0L)).as("n_b"))
    val diff = col("n_a") - col("n_b")
    one.select(col("n_a"), col("n_b"),
      when(col("n_a") + col("n_b") === 0L, lit(null).cast("double"))
        .otherwise((diff * diff).cast("double") /
          (col("n_a") + col("n_b")).cast("double")).as("chi2"))
  }

  /** Model-calibration curve — [[aucBinned]]'s companion readout: AUC
    * says the score RANKS well; calibration says the score MEANS what it
    * claims. Rows are bucketed by quantized score (`scoreQ // binDiv`),
    * and each bucket reports observed positive rate next to the mean
    * claimed score — a calibrated model's buckets sit on the diagonal.
    *
    * Emits per bucket: (bin, n, n_pos, sum_q, pos_rate, mean_q) where
    * `mean_q = sum_q / n` is on the quantized-score scale (caller maps
    * back to the raw scale by dividing by their quantization factor).
    *
    * Determinism: counts and the quantized-score sum are exact BIGINTs
    * off ONE map-side-combinable aggregate; the two divisions are final
    * fixed-shape floats. Scale: one hash aggregate, output O(bins). */
  def calibrationBins(
      df: DataFrame, labelPred: Column, scoreQ: Column,
      binDiv: Long): DataFrame = {
    require(binDiv > 0L, s"binDiv must be > 0, got $binDiv")
    val q = scoreQ.cast("long")
    df.select(when(labelPred, 1L).otherwise(0L).as("__y"), q.as("__q"))
      .where(col("__q").isNotNull)
      .groupBy(((col("__q") - pmod(col("__q"), lit(binDiv))) / binDiv)
        .cast("long").as("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"),
        sum(col("__q")).as("sum_q"))
      .select(col("bin"), col("n"), col("n_pos"), col("sum_q"),
        (col("n_pos").cast("double") / col("n").cast("double"))
          .as("pos_rate"),
        (col("sum_q").cast("double") / col("n").cast("double"))
          .as("mean_q"))
  }

  /** Decile lift & cumulative-gain table — the campaign-targeting
    * readout: sort the population by model score (best first), cut into
    * `k` equal ranks, and ask of each slice "how much richer in
    * positives is it than random?" (lift) and "ranked this deep, what
    * fraction of all positives have I captured?" (cum_capture).
    *
    * Rank is the GLOBAL (score DESC, id ASC) position computed columnar
    * — `repartitionByRange` on the sort key, per-partition window
    * numbering (full parallelism, never a 1-partition global window),
    * and an exclusive prefix sum of per-partition counts broadcast back
    * (#partitions rows of driver traffic, same shape as the
    * sorted-neighborhood rank). The slice id is `rank·k // n` — pure
    * arithmetic on the rank, replayable in any engine, no reliance on
    * `ntile`'s remainder convention.
    *
    * Emits per slice: (decile 0-based, n, n_pos, lift, cum_pos,
    * cum_capture); all counts exact BIGINTs, floats are final
    * fixed-shape divisions. Requires a unique `idCol` (total order →
    * deterministic slice membership under score ties).
    *
    * Scale: one range shuffle + one small aggregate + one O(k)-row
    * window; never a global single-partition sort. */
  def liftDeciles(
      df: DataFrame, labelPred: Column, scoreCol: Column, idCol: Column,
      k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, s"k must be >= 2, got $k")
    val base = df.select(when(labelPred, 1L).otherwise(0L).as("__y"),
        scoreCol.cast("double").as("__s"), idCol.as("__id"))
      .where(col("__s").isNotNull)
    // negate the score so ascending range order = score DESC, id ASC
    // localCheckpoint, not persist: the counts collect and the decile
    // materialization must see the SAME sampled range boundaries (see
    // RankEval.averagePrecision, found at the 10× probe).
    val parted = base.withColumn("__ns", -col("__s"))
      .repartitionByRange(col("__ns"), col("__id"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    try {
      val counts = parted.groupBy(col("__pid"))
        .agg(count(lit(1)).as("__c"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      val n = counts.map(_._2).sum
      val offsets = counts.map(_._1)
        .zip(counts.map(_._2).scanLeft(0L)(_ + _).init).toSeq
      val offDf = parted.sparkSession
        .createDataFrame(offsets).toDF("__pid", "__off")
      val ranked = parted.join(broadcast(offDf), "__pid")
        .withColumn("__rank",
          col("__off") + row_number().over(
            Window.partitionBy(col("__pid"))
              .orderBy(col("__ns"), col("__id"))) - 1L)
      val slices = ranked
        .groupBy(((col("__rank") * k) - pmod(col("__rank") * k, lit(n)))
          .cast("long").divide(lit(n)).cast("long").as("decile"))
        .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"))
      val cum = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      slices
        .withColumn("cum_pos", sum(col("n_pos")).over(cum))
        .withColumn("__tot_pos", sum(col("n_pos")).over(
          Window.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
        .select(col("decile"), col("n"), col("n_pos"),
          when(col("__tot_pos") === 0L, lit(null).cast("double"))
            .otherwise((col("n_pos").cast("double") * lit(n.toDouble)) /
              (col("n").cast("double") * col("__tot_pos").cast("double")))
            .as("lift"),
          col("cum_pos"),
          when(col("__tot_pos") === 0L, lit(null).cast("double"))
            .otherwise(col("cum_pos").cast("double") /
              col("__tot_pos").cast("double")).as("cum_capture"))
        .localCheckpoint()
    } finally {
      org.apache.spark.sql.GraftSql.freeLocalCheckpoint(parted); ()
    }
  }

  /** Mann-Whitney rank-sum z — the SIGNIFICANCE companion to
    * [[aucBinned]]'s ranking-quality readout, over the same binned-score
    * contract: does sample A stochastically dominate sample B, and is
    * the shift larger than chance? `inA` tags membership, `scoreBin` is
    * the caller-quantized integer bin. Emits one row:
    * (n_a, n_b, u2, z).
    *
    * Exactness: per-bin counts are exact; `2U = Σ_bins a·(2·B_< + b)`
    * stays BIGINT (the [[aucBinned]] identity). The tie-corrected
    * variance rides exact integers to the last step:
    * `σ² = n_a·n_b·[(n+1)·n·(n−1) − Σ(t³−t)] / (12·n·(n−1))` with the
    * bracket in DECIMAL(38,0) (n³·n_a·n_b overflows BIGINT well below
    * 100-TB row counts), then ONE division and ONE sqrt — fixed shape,
    * bit-identical cross-engine. z = (2U − n_a·n_b) / (2σ).
    *
    * Scale: one bin-keyed map-side-combinable aggregate over the scan;
    * the cumulative pass is a single-partition window over O(bins) rows
    * (bounded by the quantization grid, not the data). Degenerate
    * inputs (either sample empty, zero variance) yield z = NULL. */
  def mannWhitneyZ(df: DataFrame, inA: Column, scoreBin: Column)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val b = df.select(when(inA, 1L).otherwise(0L).as("__a"),
      scoreBin.cast("long").as("__q"))
      .where(col("__q").isNotNull)
    val g = b.groupBy("__q").agg(sum(col("__a")).as("__ca"),
      (count(lit(1)) - sum(col("__a"))).as("__cb"))
    val below = Window.orderBy(col("__q"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = g.withColumn("__bl",
      coalesce(sum(col("__cb")).over(below), lit(0L)))
    val t3 = (col("__ca") + col("__cb")).cast(dec)
    cum.agg(
      coalesce(sum(col("__ca")), lit(0L)).as("n_a"),
      coalesce(sum(col("__cb")), lit(0L)).as("n_b"),
      coalesce(sum(col("__ca") * (lit(2L) * col("__bl") + col("__cb"))),
        lit(0L)).as("u2"),
      coalesce(sum(t3 * t3 * t3 - t3), lit(0L).cast(dec)).as("__t"))
      .select(col("n_a"), col("n_b"), col("u2"),
        {
          val n = (col("n_a") + col("n_b")).cast(dec)
          val varNum = col("n_a").cast(dec) * col("n_b").cast(dec) *
            ((n + lit(1)) * n * (n - lit(1)) - col("__t"))
          val varDen = lit(12).cast(dec) * n * (n - lit(1))
          val variance = varNum.cast("double") / varDen.cast("double")
          when(col("n_a") === 0L || col("n_b") === 0L ||
              varNum <= lit(0).cast(dec), lit(null).cast("double"))
            .otherwise(
              (col("u2").cast("double") -
                (col("n_a") * col("n_b")).cast("double")) /
                (lit(2.0) * sqrt(variance)))
            .as("z")
        })
  }

  /** Benjamini-Hochberg step-up FDR over per-group two-proportion
    * z-tests — the multiple-comparisons guard every per-segment A/B
    * readout needs: with m segments tested at once, raw p < 0.05 fires
    * spuriously ~m/20 times; BH controls the expected false-discovery
    * rate at `alpha` instead. One row per group:
    * (group, n_a, x_a, n_b, x_b, z, p, k, m, rejected).
    *
    * p is the two-sided normal tail `erfc(|z|/√2)` via the
    * Abramowitz-Stegun 7.1.26 polynomial (|err| < 1.5e-7 — far inside
    * the 12-significant-digit compare window only if both engines run
    * the SAME operation sequence, so the Horner chain here is mirrored
    * verbatim in the oracle SQL). Step-up: rank p ascending (group id
    * tie-break), k* = max{k: p_(k) ≤ k·alpha/m}, reject ranks ≤ k*.
    * Groups too small or degenerate for a z (NULL) are excluded from m
    * and never rejected.
    *
    * Scale: one grouped aggregate over the scan; the rank/step-up pass
    * is a single-partition window over O(m) rows — m is the segment
    * count (tens), not the data. */
  def benjaminiHochbergZ(
      df: DataFrame, groupCol: String, variantA: Column, converted: Column,
      alpha: Double = 0.05): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val conv = coalesce(converted, lit(false))
    val g = df.groupBy(col(groupCol).as("grp")).agg(
      coalesce(sum(when(variantA, 1L).otherwise(0L)), lit(0L)).as("n_a"),
      coalesce(sum(when(variantA && conv, 1L).otherwise(0L)), lit(0L))
        .as("x_a"),
      coalesce(sum(when(!variantA, 1L).otherwise(0L)), lit(0L)).as("n_b"),
      coalesce(sum(when(!variantA && conv, 1L).otherwise(0L)), lit(0L))
        .as("x_b"))
    val pa = col("x_a").cast("double") / col("n_a").cast("double")
    val pb = col("x_b").cast("double") / col("n_b").cast("double")
    val pp = (col("x_a") + col("x_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val den = sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / col("n_a").cast("double") +
        lit(1.0) / col("n_b").cast("double")))
    val zed = g.withColumn("z",
      when(col("n_a") === 0L || col("n_b") === 0L || den <= 0.0,
        lit(null).cast("double")).otherwise((pa - pb) / den))
    // A&S 7.1.26 erfc: y = |z|/√2, t = 1/(1 + 0.3275911·y),
    // erfc(y) = t·(a1 + t·(a2 + t·(a3 + t·(a4 + t·a5))))·exp(−y·y).
    val y = abs(col("z")) / sqrt(lit(2.0))
    val tt = lit(1.0) / (lit(1.0) + lit(0.3275911) * y)
    val poly = tt * (lit(0.254829592) + tt * (lit(-0.284496736) +
      tt * (lit(1.421413741) + tt * (lit(-1.453152027) +
        tt * lit(1.061405429)))))
    val withP = zed.withColumn("p",
      when(col("z").isNull, lit(null).cast("double"))
        .otherwise(poly * exp(-(y * y))))
    val tested = Window.partitionBy(col("__t"))
    val ranked = withP
      .withColumn("__t", col("p").isNotNull)
      .withColumn("k",
        when(col("p").isNull, lit(null).cast("long")).otherwise(
          row_number().over(tested.orderBy(col("p").asc, col("grp").asc))
            .cast("long")))
      .withColumn("m", coalesce(sum(when(col("p").isNotNull, 1L)
          .otherwise(0L)).over(
          Window.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)), lit(0L)))
    val kStar = ranked.withColumn("__ks",
      max(when(col("p") <= col("k").cast("double") * lit(alpha) /
          col("m").cast("double"), col("k"))).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    kStar.select(col("grp"), col("n_a"), col("x_a"), col("n_b"),
      col("x_b"), col("z"), col("p"), col("k"), col("m"),
      (col("k").isNotNull && col("__ks").isNotNull &&
        col("k") <= col("__ks")).as("rejected"))
  }

  /** Top-k bivariate Mahalanobis outliers — [[iqrOutliers]]'s
    * correlation-aware upgrade: a point far from the (x, y) cloud ALONG
    * ITS CORRELATION STRUCTURE scores high even when each marginal
    * looks normal (the "tall AND heavy but never both" anomaly a
    * per-column z-score misses). Emits the k most outlying rows:
    * (id, md2).
    *
    * Exactness: with quantized integer (x, y), both the per-row
    * numerator `Dx²C − 2DxDyB + Dy²A` (Dx = n·x−Sx, A = nΣx²−Sx²,
    * B = nΣxy−SxSy, C = nΣy²−Sy²) and the denominator `AC − B²` are
    * EXACT DECIMAL(38,0) — the n-scalings cancel so md2 is their ONE
    * exact-integer division (the pooled-moment discipline; derivation:
    * md2 = d'Σ⁻¹d with the closed-form 2×2 inverse). Ranking compares
    * the exact integer numerators (same denominator) — no float
    * ordering anywhere; ties break on id ASC.
    *
    * Scale: one moments aggregate + one broadcast of 6 scalars + one
    * row-local score pass + TakeOrdered(k). The 38-digit headroom
    * bounds n·x to ~1e19 (n·Σx² ≤ 1e38); past that re-quantize x
    * coarser. Degenerate clouds (det ≤ 0: constant or perfectly
    * collinear) emit nothing — md2 is undefined there. */
  def mahalanobis2d(
      df: DataFrame, idCol: String, xBin: Column, yBin: Column, k: Int)
      : DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val dec = "decimal(38,0)"
    val b = df.select(col(idCol).as("__id"),
        xBin.cast("long").as("__x"), yBin.cast("long").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
    val xc = col("__x").cast(dec); val yc = col("__y").cast(dec)
    val mom = b.agg(count(lit(1)).cast(dec).as("__n"),
        sum(xc).as("__sx"), sum(yc).as("__sy"),
        sum(xc * xc).as("__sxx"), sum(xc * yc).as("__sxy"),
        sum(yc * yc).as("__syy"))
      .select(col("__n"), col("__sx"), col("__sy"),
        (col("__n") * col("__sxx") - col("__sx") * col("__sx")).as("__a"),
        (col("__n") * col("__sxy") - col("__sx") * col("__sy")).as("__b"),
        (col("__n") * col("__syy") - col("__sy") * col("__sy")).as("__c"))
      .withColumn("__det",
        col("__a") * col("__c") - col("__b") * col("__b"))
      .filter(col("__det") > lit(0).cast(dec))
    val dx = col("__n") * xc - col("__sx")
    val dy = col("__n") * yc - col("__sy")
    b.crossJoin(broadcast(mom))
      .withColumn("__num",
        dx * dx * col("__c") - lit(2).cast(dec) * dx * dy * col("__b") +
          dy * dy * col("__a"))
      .orderBy(col("__num").desc, col("__id").asc)
      .limit(k)
      .select(col("__id").as(idCol),
        (col("__num").cast("double") / col("__det").cast("double"))
          .as("md2"))
  }

  /** Jonckheere–Terpstra ordered-alternative test, per ordered group
    * pair: the trend-aware sibling of [[kruskalWallis]] (KW asks "any
    * group differs", JT asks "do the groups INCREASE in their given
    * order" — the right question for dose/month/cohort-ordered data).
    * For each pair g_lo < g_hi the doubled Mann-Whitney count
    * u2 = 2·#{x∈lo, y∈hi : x < y} + #{x = y} stays an exact BIGINT
    * (the JT statistic is Σ u2/2 over pairs; per-pair rows are emitted
    * so the trend's SOURCE is visible, not just its sum).
    *
    * Scale: everything happens on the DENSE COUNT GRID (groups ×
    * distinct quantized values, 0-filled): one grouped count over the
    * scan, a cross join bounded by the quantization (not the data), a
    * per-group cumulative window over grid rows, and a pair equi-join
    * on the value — O(G²·V) grid work for G groups and V bins, zero
    * per-row pair comparisons. Output:
    * (g_lo, g_hi, n_lo, n_hi, u2). */
  def jonckheereTerpstra(
      df: DataFrame, groupCol: Column, scoreBin: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = df.select(groupCol.cast("long").as("__g"),
        scoreBin.cast("long").as("__q"))
      .where(col("__g").isNotNull && col("__q").isNotNull)
    val g = b.groupBy("__g", "__q").agg(count(lit(1)).as("__c"))
    val groups = g.select(col("__g")).distinct()
    val vals = g.select(col("__q")).distinct()
    val dense = groups.crossJoin(vals)
      .join(g, Seq("__g", "__q"), "left")
      .select(col("__g"), col("__q"), coalesce(col("__c"), lit(0L)).as("__c"))
    val below = Window.partitionBy(col("__g")).orderBy(col("__q"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = dense
      .withColumn("__bl", coalesce(sum(col("__c")).over(below), lit(0L)))
      .withColumn("__n",
        sum(col("__c")).over(Window.partitionBy(col("__g"))))
    cum.as("x").join(cum.as("y"),
        col("x.__g") < col("y.__g") && col("x.__q") === col("y.__q"))
      .groupBy(col("x.__g").as("g_lo"), col("y.__g").as("g_hi"))
      .agg(max(col("x.__n")).as("n_lo"), max(col("y.__n")).as("n_hi"),
        sum(col("y.__c") * (lit(2L) * col("x.__bl") + col("x.__c")))
          .as("u2"))
  }

  /** Cliff's delta — the nonparametric EFFECT SIZE companion to
    * [[mannWhitneyZ]] (the z says "different", delta says "by how
    * much"): δ = (#{x>y} − #{x<y}) / (n_a·n_b) over cross-group pairs,
    * in [−1, 1]. Dominance counts come off the same binned count grid
    * as MW (one cumulative window over distinct bins, zero per-row pair
    * work); the single division is the only float. Output:
    * (n_a, n_b, n_gt, n_lt, delta). */
  def cliffsDelta(df: DataFrame, inA: Column, scoreBin: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = df.select(when(inA, 1L).otherwise(0L).as("__a"),
      scoreBin.cast("long").as("__q"))
      .where(col("__q").isNotNull)
    val g = b.groupBy("__q").agg(sum(col("__a")).as("__ca"),
      (count(lit(1)) - sum(col("__a"))).as("__cb"))
    val below = Window.orderBy(col("__q"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = g
      .withColumn("__bl", coalesce(sum(col("__cb")).over(below), lit(0L)))
      .withColumn("__tb",
        sum(col("__cb")).over(Window.partitionBy(lit(1))))
    cum.agg(
      coalesce(sum(col("__ca")), lit(0L)).as("n_a"),
      coalesce(sum(col("__cb")), lit(0L)).as("n_b"),
      coalesce(sum(col("__ca") * col("__bl")), lit(0L)).as("n_gt"),
      coalesce(sum(col("__ca") *
        (col("__tb") - col("__bl") - col("__cb"))), lit(0L)).as("n_lt"))
      .withColumn("delta",
        when(col("n_a") === 0L || col("n_b") === 0L,
          lit(null).cast("double"))
          .otherwise((col("n_gt") - col("n_lt")).cast("double") /
            (col("n_a") * col("n_b")).cast("double")))
  }

  /** Event-study (leads-and-lags) estimator — the dynamic extension of
    * the 2×2 diff-in-diff: per RELATIVE period k the treated-vs-control
    * outcome gap, minus the POOLED PRE-PERIOD gap (the parallel-trends
    * baseline), so pre-treatment rows hovering near zero ARE the
    * parallel-trends diagnostic and post rows trace the effect's
    * dynamics. Per (period, arm): exact integer (n, Σy); each mean is
    * ONE pinned division; effect_k = (ȳ_t,k − ȳ_c,k) − (ȳ_t,pre −
    * ȳ_c,pre) in a fixed float shape the oracle mirrors. Periods where
    * either arm is empty emit NULL diff/effect. Output per period:
    * (rel_period, n_treat, n_ctrl, sum_treat, sum_ctrl, diff, effect).
    *
    * Scale: one grouped aggregate over the scan + one O(periods)
    * baseline cross join — no windows, no per-row float work. */
  def eventStudy(
      df: DataFrame, treated: Column, outcomeBin: Column,
      relPeriod: Column): DataFrame = {
    val b = df.select(when(treated, 1L).otherwise(0L).as("__t"),
      outcomeBin.cast("long").as("__y"), relPeriod.cast("long").as("__k"))
      .where(col("__y").isNotNull && col("__k").isNotNull)
    val g = b.groupBy(col("__k")).agg(
      sum(col("__t")).as("n_treat"),
      (count(lit(1)) - sum(col("__t"))).as("n_ctrl"),
      sum(when(col("__t") === 1L, col("__y")).otherwise(0L)).as("sum_treat"),
      sum(when(col("__t") === 0L, col("__y")).otherwise(0L)).as("sum_ctrl"))
    val pre = g.filter(col("__k") < 0L).agg(
      coalesce(sum(col("n_treat")), lit(0L)).as("__pnt"),
      coalesce(sum(col("n_ctrl")), lit(0L)).as("__pnc"),
      coalesce(sum(col("sum_treat")), lit(0L)).as("__pst"),
      coalesce(sum(col("sum_ctrl")), lit(0L)).as("__psc"))
    val diff = col("sum_treat").cast("double") / col("n_treat").cast("double") -
      col("sum_ctrl").cast("double") / col("n_ctrl").cast("double")
    val base = col("__pst").cast("double") / col("__pnt").cast("double") -
      col("__psc").cast("double") / col("__pnc").cast("double")
    g.crossJoin(pre)
      .select(col("__k").as("rel_period"), col("n_treat"), col("n_ctrl"),
        col("sum_treat"), col("sum_ctrl"),
        when(col("n_treat") === 0L || col("n_ctrl") === 0L,
          lit(null).cast("double")).otherwise(diff).as("diff"),
        when(col("n_treat") === 0L || col("n_ctrl") === 0L ||
          col("__pnt") === 0L || col("__pnc") === 0L,
          lit(null).cast("double")).otherwise(diff - base).as("effect"))
  }

  /** Stratified inverse-propensity-weighted ATE — the causal-inference
    * companion to [[benjaminiHochbergZ]]'s A/B family when treatment
    * was NOT randomized: within stratum s the empirical propensity is
    * p_s = n_t/n, treated rows weight 1/p_s, controls 1/(1−p_s), and
    * the Hajek means reduce to Σ_s syt_s·n_s/nt_s over N (exactly: the
    * weight DENOMINATORS are integers — Σ over treated of n/nt is
    * Σ n_s — so only the numerators are floats). No-overlap strata
    * (all-treated or all-control) are EXCLUDED and counted — the
    * positivity check made visible instead of an Inf weight.
    *
    * Determinism: per-stratum moments are exact BIGINTs; the two float
    * numerator sums fold over the stratum list SORTED BY STRATUM ID
    * (the [[kruskalWallis]] pinned-fold discipline), one division per
    * stratum, so the oracle's left-to-right list_reduce is
    * bit-identical. Output: (n_strata_included, n_strata_excluded,
    * n_rows_included, treated_mean, control_mean, ate). */
  def ipwAte(
      df: DataFrame, treated: Column, outcomeBin: Column,
      stratum: Column): DataFrame = {
    val b = df.select(when(treated, 1L).otherwise(0L).as("__t"),
      outcomeBin.cast("long").as("__y"), stratum.cast("long").as("__s"))
      .where(col("__y").isNotNull && col("__s").isNotNull)
    val g = b.groupBy("__s").agg(count(lit(1)).as("__n"),
      sum(col("__t")).as("__nt"),
      sum(when(col("__t") === 1L, col("__y")).otherwise(0L)).as("__syt"),
      sum(when(col("__t") === 0L, col("__y")).otherwise(0L)).as("__syc"))
    val inc = g.filter(col("__nt") > 0L && col("__nt") < col("__n"))
    val packed = inc.agg(
      count(lit(1)).as("n_strata_included"),
      coalesce(sum(col("__n")), lit(0L)).as("__N"),
      array_sort(collect_list(struct(col("__s").as("s"),
        col("__n").as("n"), col("__nt").as("nt"),
        col("__syt").as("syt"), col("__syc").as("syc")))).as("__arr"))
    val tot = g.agg(count(lit(1)).as("__all"))
    def foldNum(num: Column => Column): Column =
      aggregate(transform(col("__arr"), num), lit(0.0), (a, x) => a + x)
    val numT = foldNum(e => e.getField("syt").cast("double") *
      e.getField("n").cast("double") / e.getField("nt").cast("double"))
    val numC = foldNum(e => e.getField("syc").cast("double") *
      e.getField("n").cast("double") /
      (e.getField("n") - e.getField("nt")).cast("double"))
    packed.crossJoin(tot)
      .select(col("n_strata_included"),
        (col("__all") - col("n_strata_included")).as("n_strata_excluded"),
        col("__N").as("n_rows_included"),
        when(col("__N") === 0L, lit(null).cast("double"))
          .otherwise(numT / col("__N").cast("double")).as("treated_mean"),
        when(col("__N") === 0L, lit(null).cast("double"))
          .otherwise(numC / col("__N").cast("double")).as("control_mean"),
        when(col("__N") === 0L, lit(null).cast("double"))
          .otherwise(numT / col("__N").cast("double") -
            numC / col("__N").cast("double")).as("ate"))
  }

  /** Hodges–Lehmann shift estimator between two groups — the robust
    * "HOW FAR apart" companion to [[cliffsDelta]]'s "how often": the
    * LOWER MEDIAN of the multiset of all n_a·n_b pairwise differences
    * x − y, an ELEMENT PICK (rank (T+1) div 2 of the weighted diff
    * distribution), never an average — so with binned integer inputs
    * the estimate is an exact BIGINT in bin units.
    *
    * Scale: pairwise diffs are materialized on the BINNED GRID — the
    * cross join is V_a × V_b distinct bins (quantization-bounded, not
    * data-bounded), each diff carrying multiplicity ca·cb; the median
    * pick is one cumulative window over O(V²) grid rows. Output:
    * (n_a, n_b, n_pairs, hl_shift). */
  def hodgesLehmann(df: DataFrame, inA: Column, scoreBin: Column)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = df.select(when(inA, 1L).otherwise(0L).as("__a"),
      scoreBin.cast("long").as("__q"))
      .where(col("__q").isNotNull)
    val g = b.groupBy("__q").agg(sum(col("__a")).as("__ca"),
      (count(lit(1)) - sum(col("__a"))).as("__cb"))
    val ga = g.filter(col("__ca") > 0L).select(col("__q").as("__qa"),
      col("__ca"))
    val gb = g.filter(col("__cb") > 0L).select(col("__q").as("__qb"),
      col("__cb"))
    val dd = ga.crossJoin(gb)
      .groupBy((col("__qa") - col("__qb")).as("__d"))
      .agg(sum(col("__ca") * col("__cb")).as("__w"))
    val cum = dd.withColumn("__cum",
      sum(col("__w")).over(Window.orderBy(col("__d"))
        .rowsBetween(Window.unboundedPreceding, 0)))
    val tot = g.agg(coalesce(sum(col("__ca")), lit(0L)).as("n_a"),
      coalesce(sum(col("__cb")), lit(0L)).as("n_b"))
      .withColumn("n_pairs", col("n_a") * col("n_b"))
    val pick = cum.crossJoin(tot)
      .filter(col("__cum") >= expr("(n_pairs + 1) div 2"))
      .orderBy(col("__d")).limit(1)
      .select(col("__d").as("hl_shift"))
    tot.crossJoin(pick)
      .select(col("n_a"), col("n_b"), col("n_pairs"), col("hl_shift"))
  }

  /** Wald–Wolfowitz runs test per key — "is this sequence random or
    * does it streak": signs vs the key's own LOWER MEDIAN (element
    * pick at rank (n+1) div 2 under (value, ord) order — never an
    * average), ties to the median DROPPED (the standard treatment),
    * R = number of maximal same-sign runs in `ord` order. The normal
    * approximation is emitted in a PINNED IEEE shape mirrored by the
    * oracle (every op correctly rounded, so bit-identical):
    * {{{
    *   p  = 2.0·n1·n2          nn = n1 + n2
    *   mu = p / nn + 1.0
    *   s2 = (p·(p − nn)) / (nn·nn·(nn − 1.0))
    *   z  = (R − mu) / sqrt(s2)
    * }}}
    * NULL z when either sign class is empty or s2 ≤ 0. Output:
    * (key, n1, n2, runs, z).
    *
    * Scale: series must be pre-bucketed per the [[TimeSeries.autocorr]]
    * contract; two windows and one aggregate, all partitioned by key. */
  def runsTest(
      df: DataFrame, keyCol: String, ordCol: String, valCol: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = df.select(col(keyCol).as("__k"),
        col(ordCol).cast("long").as("__o"),
        col(valCol).cast("long").as("__v"))
      .where(col("__v").isNotNull)
    val wRank = Window.partitionBy(col("__k")).orderBy(col("__v"), col("__o"))
    val wAll = Window.partitionBy(col("__k"))
    val med = b
      .withColumn("__rn", row_number().over(wRank))
      .withColumn("__n", count(lit(1)).over(wAll))
      // integer div, not Column./ (which is DOUBLE division and would
      // make the rank comparison silently never match for even n)
      .filter(col("__rn") === expr("(__n + 1) div 2"))
      .select(col("__k"), col("__v").as("__med"))
    val wOrd = Window.partitionBy(col("__k")).orderBy(col("__o"))
    val signs = b.join(med, "__k")
      .filter(col("__v") =!= col("__med"))
      .withColumn("__sg", when(col("__v") > col("__med"), 1L).otherwise(-1L))
      .withColumn("__new",
        when(lag(col("__sg"), 1).over(wOrd).isNull ||
          lag(col("__sg"), 1).over(wOrd) =!= col("__sg"), 1L).otherwise(0L))
    val agg = signs.groupBy(col("__k").as(keyCol)).agg(
      sum(when(col("__sg") === 1L, 1L).otherwise(0L)).as("n1"),
      sum(when(col("__sg") === -1L, 1L).otherwise(0L)).as("n2"),
      sum(col("__new")).as("runs"))
    val p = lit(2.0) * col("n1").cast("double") * col("n2").cast("double")
    val nn = (col("n1") + col("n2")).cast("double")
    val mu = p / nn + lit(1.0)
    val s2 = (p * (p - nn)) / (nn * nn * (nn - lit(1.0)))
    agg.withColumn("z",
      when(col("n1") === 0L || col("n2") === 0L || s2 <= 0.0,
        lit(null).cast("double"))
        .otherwise((col("runs").cast("double") - mu) / sqrt(s2)))
  }

  /** Kruskal-Wallis H — the k-group generalization of Mann-Whitney:
    * "do any of these segments' value distributions differ?" asked
    * rank-wise, so it survives the heavy-tailed metrics (latency,
    * spend) that break ANOVA's normality assumption. One row out:
    * (n, k_groups, h, h_tie) with h_tie the tie-corrected statistic
    * (≈ chi²(k−1) under H0).
    *
    * Exactness: average ranks are kept as exact integers via the
    * doubled form 2·rank = 2·cnt_below + cnt_equal + 1 (the same
    * device as [[mannWhitneyZ]]); per-group rank sums S_i and the tie
    * term Σ(t³−t) accumulate in DECIMAL(38,0); each group's
    * R_i²/n_i = S_i²/(4n_i) is ONE division of an exact square, and
    * the cross-group sum folds strictly in group-name order. H and the
    * tie scaling are a fixed float chain mirrored verbatim by the
    * oracle.
    *
    * Scale: two grouped aggregates over the scan (per-bin, per
    * group×bin) plus a single-partition window over O(distinct bins)
    * rows — the bin grid, not the corpus. The group fold is O(k). */
  def kruskalWallis(df: DataFrame, groupCol: Column, scoreBin: Column)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val b = df.select(groupCol.cast("string").as("__g"),
        scoreBin.cast("long").as("__q"))
      .where(col("__g").isNotNull && col("__q").isNotNull)
    val perQ = b.groupBy("__q").agg(count(lit(1)).as("__cq"))
    val below = Window.orderBy(col("__q"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = perQ
      .withColumn("__lt", coalesce(sum(col("__cq")).over(below), lit(0L)))
      .withColumn("__s2", lit(2L) * col("__lt") + col("__cq") + lit(1L))
    val grp = b.groupBy("__g", "__q").agg(count(lit(1)).as("__cgq"))
      .join(ranked.select(col("__q"), col("__s2")), "__q")
      .groupBy("__g").agg(
        sum(col("__cgq")).as("__ni"),
        sum(col("__cgq").cast(dec) * col("__s2").cast(dec)).as("__si"))
      .withColumn("__term",
        (col("__si") * col("__si")).cast("double") /
          (lit(4.0) * col("__ni").cast("double")))
    val cq = col("__cq").cast(dec)
    val ties = perQ.agg(
      coalesce(sum(col("__cq")), lit(0L)).as("__n"),
      coalesce(sum(cq * cq * cq - cq), lit(0).cast(dec)).as("__tiesum"))
    val folded = grp.agg(
      count(lit(1)).as("k_groups"),
      aggregate(
        sort_array(collect_list(struct(col("__g"), col("__term")))),
        lit(0.0), (acc, x) => acc + x.getField("__term")).as("__t"))
    val nd = col("__n").cast("double")
    val nc = col("__n").cast(dec)
    val nn = nc * nc * nc - nc
    val cden = nn - col("__tiesum")
    val h = lit(12.0) * col("__t") / (nd * (nd + lit(1.0))) -
      lit(3.0) * (nd + lit(1.0))
    folded.crossJoin(ties).select(
      col("__n").as("n"), col("k_groups"),
      when(col("__n") < 2L || col("k_groups") < 2L,
        lit(null).cast("double")).otherwise(h).as("h"),
      when(col("__n") < 2L || col("k_groups") < 2L ||
          cden <= lit(0).cast(dec), lit(null).cast("double"))
        .otherwise(h * nn.cast("double") / cden.cast("double"))
        .as("h_tie"))
  }

  /** McNemar's test on paired binary outcomes — "did the same subjects
    * flip?" The 2×2 cell counts share subjects, so a two-proportion z
    * is wrong; only the discordant cells b (A yes, B no) and c (A no,
    * B yes) carry information: χ² = (b−c)²/(b+c), plus the
    * continuity-corrected (max(|b−c|−1,0))²/(b+c) twin. One row out:
    * (b, c, chi2, chi2_cc); NULL when no discordant pairs exist.
    *
    * Exactness: per-subject flags are max-of-indicator aggregates,
    * cell counts exact integers, each statistic ONE division. Scale:
    * one shuffle keyed on the subject id, then a scalar rollup. */
  def mcnemar(df: DataFrame, idCol: Column, condA: Column, condB: Column)
      : DataFrame = {
    val per = df.groupBy(idCol.as("__id")).agg(
      max(when(condA, 1L).otherwise(0L)).as("__x"),
      max(when(condB, 1L).otherwise(0L)).as("__y"))
    val bMc = col("b"); val cMc = col("c")
    val disc = (bMc + cMc).cast("double")
    val cc = greatest(abs(bMc - cMc) - lit(1L), lit(0L))
    per.agg(
      coalesce(sum(when(col("__x") === 1L && col("__y") === 0L, 1L)
        .otherwise(0L)), lit(0L)).as("b"),
      coalesce(sum(when(col("__x") === 0L && col("__y") === 1L, 1L)
        .otherwise(0L)), lit(0L)).as("c"))
      .select(bMc, cMc,
        when(bMc + cMc === 0L, lit(null).cast("double"))
          .otherwise(((bMc - cMc) * (bMc - cMc)).cast("double") / disc)
          .as("chi2"),
        when(bMc + cMc === 0L, lit(null).cast("double"))
          .otherwise((cc * cc).cast("double") / disc).as("chi2_cc"))
  }

  /** Cochran's Q — McNemar's k-treatment generalization: did the same
    * subjects respond differently across k binary treatments? Q =
    * (k−1)·(k·ΣC_j² − (ΣC_j)²) / (k·ΣR_i − ΣR_i²) with C_j the
    * per-treatment success counts and R_i the per-subject success
    * counts; ≈ chi²(k−1) under H0. All-zero and all-success subjects
    * contribute nothing to either side (their R_i terms cancel), so no
    * filtering is needed. One row out: (n_subjects, k, q_stat, df).
    *
    * Exactness: every quantity is an exact BIGINT aggregate; Q is ONE
    * division. Scale: one shuffle keyed on the subject id, then a
    * scalar rollup. */
  def cochranQ(df: DataFrame, idCol: Column,
      treatments: Seq[Column]): DataFrame = {
    require(treatments.size >= 2, "cochranQ needs >= 2 treatments")
    val k = treatments.size
    val flags = treatments.zipWithIndex.map { case (c, j) =>
      max(when(c, 1L).otherwise(0L)).as(s"__x$j")
    }
    val per = df.groupBy(idCol.as("__id"))
      .agg(flags.head, flags.tail: _*)
      .withColumn("__r",
        (0 until k).map(j => col(s"__x$j")).reduce(_ + _))
    val aggs =
      (0 until k).map(j => sum(col(s"__x$j")).as(s"__c$j")) ++ Seq(
        sum(col("__r")).as("__sr"),
        sum(col("__r") * col("__r")).as("__srr"),
        count(lit(1)).as("n_subjects"))
    val tot = per.agg(aggs.head, aggs.tail: _*)
    val sumC = (0 until k).map(j => col(s"__c$j")).reduce(_ + _)
    val sumC2 = (0 until k).map(j => col(s"__c$j") * col(s"__c$j"))
      .reduce(_ + _)
    val num = lit((k - 1).toLong) * (lit(k.toLong) * sumC2 - sumC * sumC)
    val den = lit(k.toLong) * col("__sr") - col("__srr")
    tot.select(col("n_subjects"), lit(k.toLong).as("k"),
      when(den === 0L, lit(null).cast("double"))
        .otherwise(num.cast("double") / den.cast("double")).as("q_stat"),
      lit((k - 1).toLong).as("df"))
  }

  /** Brown-Forsythe (median-centered Levene) test — "do these groups
    * have the same spread?", robust to the heavy tails that invalidate
    * the classic F-ratio: one-way ANOVA run on z_ij = |x_ij − med_i|
    * with med_i the group's lower-median ELEMENT (an exact integer
    * pick, not an interpolation). One row out: (n, k_groups, f_stat).
    *
    * Exactness: z values are exact integers, so Σz² and per-group sums
    * Z_i are exact; the F numerator/denominator reuse the one-division-
    * per-group fold of [[kruskalWallis]] (group-name order) and the
    * final F is a fixed float chain. Scale: one window per group for
    * the median pick, two grouped aggregates, O(k) fold. */
  def brownForsythe(df: DataFrame, groupCol: Column, scoreBin: Column)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val b = df.select(groupCol.cast("string").as("__g"),
        scoreBin.cast("long").as("__q"))
      .where(col("__g").isNotNull && col("__q").isNotNull)
    val w = Window.partitionBy(col("__g")).orderBy(col("__q"))
    val med = b
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("__g"))))
      .filter(col("__rn") === expr("(__n + 1) div 2"))
      .select(col("__g"), col("__q").as("__med"))
    val z = b.join(med, "__g")
      .select(col("__g"), abs(col("__q") - col("__med")).as("__z"))
    val grp = z.groupBy("__g").agg(
      count(lit(1)).as("__ni"),
      sum(col("__z").cast(dec)).as("__zi"),
      sum(col("__z").cast(dec) * col("__z").cast(dec)).as("__zz"))
      .withColumn("__term",
        (col("__zi") * col("__zi")).cast("double") /
          col("__ni").cast("double"))
    val folded = grp.agg(
      count(lit(1)).as("k_groups"),
      coalesce(sum(col("__ni")), lit(0L)).as("n"),
      coalesce(sum(col("__zi")), lit(0).cast(dec)).as("__ztot"),
      coalesce(sum(col("__zz")), lit(0).cast(dec)).as("__zzt"),
      aggregate(
        sort_array(collect_list(struct(col("__g"), col("__term")))),
        lit(0.0), (acc, x) => acc + x.getField("__term")).as("__a"))
    val nd = col("n").cast("double")
    val kd = col("k_groups").cast("double")
    val bTerm = (col("__ztot") * col("__ztot")).cast("double") / nd
    val cTerm = col("__zzt").cast("double")
    val f = (nd - kd) * (col("__a") - bTerm) /
      ((kd - lit(1.0)) * (cTerm - col("__a")))
    folded.select(col("n"), col("k_groups"),
      when(col("k_groups") < 2L || col("n") <= col("k_groups") ||
          cTerm - col("__a") === 0.0, lit(null).cast("double"))
        .otherwise(f).as("f_stat"))
  }

  /** Friedman test — the rank-based repeated-measures companion to
    * [[cochranQ]]: each SUBJECT ranks the k=3 treatments among
    * themselves (so between-subject scale differences cancel), and
    * Q = 12/(nk(k+1))·ΣR_j² − 3n(k+1) — which at k=3 with doubled rank
    * sums S_j collapses to ΣS_j²/(4n) − 12n — asks whether any
    * treatment consistently outranks the others. Doubled within-block average
    * ranks (2r = 2·below + equal-incl-self + 1) stay exact integers —
    * for k=3 they are closed-form comparisons, no window needed — and
    * the per-block tie term Σ(t³−t) is a 3-value case split (24 for a
    * triple tie, 6 for one pair, 0 otherwise). One row out:
    * (n, k, q_stat, q_tie) with q_tie the tie-corrected statistic
    * (NULL when every block is a triple tie).
    *
    * Exactness: all sums are DECIMAL(38,0); q is one division plus one
    * exact subtraction; the tie scaling is one more division. Scale:
    * one shuffle keyed on the subject, then row-local arithmetic and a
    * scalar rollup. */
  def friedman(df: DataFrame, idCol: Column,
      treatments: Seq[(Column, Column)]): DataFrame = {
    require(treatments.size == 3, "friedman: exactly 3 treatments")
    val dec = "decimal(38,0)"
    val xs = treatments.zipWithIndex.map { case ((cond, v), j) =>
      coalesce(sum(when(cond, v.cast("long")).otherwise(0L)), lit(0L))
        .as(s"__x$j")
    }
    val per = df.groupBy(idCol.as("__id")).agg(xs.head, xs.tail: _*)
    def x(j: Int) = col(s"__x$j")
    def r2(j: Int): Column = {
      val others = (0 until 3).filter(_ != j)
      lit(2L) * others.map(l =>
        when(x(l) < x(j), 1L).otherwise(0L)).reduce(_ + _) +
        (lit(1L) + others.map(l =>
          when(x(l) === x(j), 1L).otherwise(0L)).reduce(_ + _)) + lit(1L)
    }
    val pairsEq = Seq((0, 1), (0, 2), (1, 2)).map { case (a, b) =>
      when(x(a) === x(b), 1L).otherwise(0L) }.reduce(_ + _)
    val tieT = when(pairsEq === 3L, 24L)
      .when(pairsEq === 1L, 6L).otherwise(0L)
    val ranked = per.select(
      r2(0).cast(dec).as("__r0"), r2(1).cast(dec).as("__r1"),
      r2(2).cast(dec).as("__r2"), tieT.cast(dec).as("__t"))
    val tot = ranked.agg(
      count(lit(1)).as("n"),
      sum(col("__r0")).as("__s0"), sum(col("__r1")).as("__s1"),
      sum(col("__r2")).as("__s2"),
      coalesce(sum(col("__t")), lit(0).cast(dec)).as("__ts"))
    val s2 = col("__s0") * col("__s0") + col("__s1") * col("__s1") +
      col("__s2") * col("__s2")
    val nC = col("n").cast(dec)
    // Q = 12/(nk(k+1))·ΣR² − 3n(k+1) with R = S/2, k = 3 collapses to
    // ΣS²/(4n) − 12n.
    val q = s2.cast("double") / (lit(4.0) * nC.cast("double")) -
      lit(12.0) * nC.cast("double")
    val tieDen = nC * lit(24L).cast(dec) - col("__ts") // nk(k²−1)=24n
    tot.select(col("n"), lit(3L).as("k"),
      when(col("n") === 0L, lit(null).cast("double")).otherwise(q)
        .as("q_stat"),
      when(col("n") === 0L || tieDen <= lit(0).cast(dec),
        lit(null).cast("double"))
        .otherwise(q * (nC * lit(24L).cast(dec)).cast("double") /
          tieDen.cast("double")).as("q_tie"))
  }

  /** Split-conformal prediction intervals — the distribution-free
    * calibration recipe modern ML eval leans on: fit any point model on
    * a TRAIN split (here the per-group mean), take the
    * ⌈(n+1)(1−α)⌉-th smallest absolute residual on a held-out
    * CALIBRATION split as the interval half-width q̂, and the interval
    * mean ± q̂ covers a fresh point with probability ≥ 1−α by exchange-
    * ability alone — no normality, no variance model. Emits per group:
    * (group, n_cal, qhat, n_test, coverage) with coverage measured on
    * the TEST split (expect ≈ 1−α).
    *
    * Determinism: the model is one exact-sum division per group; q̂ is
    * an exact ELEMENT pick (rank over (residual, id) — residuals are
    * identical doubles in both engines, ids break ties); coverage is
    * one division. Scale: two grouped aggregates and one per-group
    * rank window over the CALIBRATION split only (the small split —
    * the corpus-sized splits only feed cheap aggregates). */
  def conformalInterval(df: DataFrame, groupCol: Column, idCol: Column,
      valueBin: Column, split: Column, alpha: Double = 0.1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(alpha > 0 && alpha < 1, s"alpha in (0,1), got $alpha")
    val dec = "decimal(38,0)"
    val b = df.select(groupCol.cast("string").as("__g"),
        idCol.cast("long").as("__i"), valueBin.cast("long").as("__v"),
        split.cast("long").as("__s"))
      .where(col("__g").isNotNull && col("__v").isNotNull)
    val model = b.filter(col("__s") === 0L).groupBy("__g").agg(
      (sum(col("__v").cast(dec)).cast("double") /
        count(lit(1)).cast("double")).as("__mu"))
    val resid = b.filter(col("__s") === 1L).join(model, "__g")
      .withColumn("__r", abs(col("__v").cast("double") - col("__mu")))
    val w = Window.partitionBy(col("__g"))
      .orderBy(col("__r").asc, col("__i").asc)
    val ranked = resid
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("__g"))))
    val qhat = ranked
      .filter(col("__rn") === least(col("__n"),
        ceil((col("__n") + 1L).cast("double") * lit(1.0 - alpha))
          .cast("long")))
      .select(col("__g"), col("__n").as("n_cal"), col("__r").as("qhat"))
    val test = b.filter(col("__s") === 2L).join(model, "__g")
      .join(qhat, "__g")
      .groupBy(col("__g"), col("n_cal"), col("qhat"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(abs(col("__v").cast("double") - col("__mu")) <=
          col("qhat"), 1L).otherwise(0L)).as("__cov"))
    test.select(col("__g").as("grp"), col("n_cal"), col("qhat"),
      col("n_test"),
      (col("__cov").cast("double") / col("n_test").cast("double"))
        .as("coverage"))
  }

  /** Wald's Sequential Probability Ratio Test over an ordered Bernoulli
    * stream — the "stop the experiment as soon as the data decides"
    * monitor: after trial t with k successes the log-likelihood ratio
    * is EXACTLY k·log(p1/p0) + (t−k)·log((1−p1)/(1−p0)) (no running
    * float sum — each row's LLR is two multiplies on exact integers),
    * and the first t where it exits [log B, log A] is the decision
    * point (A = (1−β)/α, B = β/(1−α)). One row out: (n_trials,
    * n_success, llr_final, first_cross, decision) — the last two NULL
    * when the stream never decides.
    *
    * Determinism: the four log constants are computed ONCE in Scala
    * and injected as round-trip literals into both engines; trial
    * order is (ord columns, all exact) so t and k are exact integers.
    *
    * Scale note: the cumulative success count is a prefix sum over a
    * total order — here one ordered window (fine for a monitoring
    * stream); at corpus scale compute per-partition subtotals first
    * and offset (two passes), or run it as the streaming gate does,
    * incrementally. */
  def sprt(df: DataFrame, ordCols: Seq[Column], success: Column,
      p0: Double, p1: Double, alpha: Double = 0.05, beta: Double = 0.05)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p0 != p1,
      s"need distinct p0, p1 in (0,1), got $p0/$p1")
    val la = math.log((1.0 - p1) / (1.0 - p0))
    val lb = math.log(p1 / p0)
    val logA = math.log((1.0 - beta) / alpha)
    val logB = math.log(beta / (1.0 - alpha))
    val b = df.select(when(success, 1L).otherwise(0L).as("__s") +:
      ordCols.zipWithIndex.map { case (c, i) => c.as(s"__o$i") }: _*)
    val w = Window.orderBy(ordCols.indices.map(i => col(s"__o$i").asc): _*)
    val llr = b
      .withColumn("__t", row_number().over(w))
      .withColumn("__k", sum(col("__s")).over(w))
      .select(col("__t"), col("__k"),
        (col("__k").cast("double") * lit(lb) +
          (col("__t") - col("__k")).cast("double") * lit(la)).as("__llr"))
    val firstCross = llr
      .filter(col("__llr") >= logA || col("__llr") <= logB)
      .orderBy(col("__t").asc).limit(1)
      .select(col("__t").cast("long").as("first_cross"),
        when(col("__llr") >= logA, lit("accept_h1"))
          .otherwise(lit("accept_h0")).as("decision"))
    llr.agg(coalesce(max(col("__t")), lit(0L)).as("n_trials"),
        coalesce(max(col("__k")), lit(0L)).as("n_success"))
      .join(firstCross, lit(true), "left_outer")
      .select(col("n_trials"), col("n_success"),
        (col("n_success").cast("double") * lit(lb) +
          (col("n_trials") - col("n_success")).cast("double") * lit(la))
          .as("llr_final"),
        col("first_cross"), col("decision"))
  }

  /** Exact-style permutation test on a difference of per-group means —
    * the assumption-free significance read: how often does a random
    * relabeling of SUBJECTS produce a gap at least as large as the
    * observed one? Instead of RNG draws (irreproducible across engines
    * and replays), the label shuffles are the deterministic
    * [[graft.functions.TextHash.permute]] family: permutation p assigns
    * subject id to side `((id % P)·A_p + B_p) % P % 2` — 64 independent
    * affine scrambles shared bit-for-bit with the oracle. One row out:
    * (n_subjects, n_perms, obs_diff, n_ge, p_value) with the add-one
    * p = (1 + #{p: |d_p| ≥ |d_obs|}) / (1 + nPerms).
    *
    * Exactness: per-subject sums are DECIMAL(38,0); every mean is one
    * division; each permuted diff is the same fixed float chain as the
    * observed one, so the ≥ comparison sees bit-identical doubles in
    * both engines.
    *
    * Scale: ONE pre-aggregation to subject grain, then the nPerms-way
    * explode runs over subjects (not events) against a broadcast
    * constants table — O(subjects·nPerms) map-side work, one grouped
    * aggregate of 2·nPerms cells, no extra corpus scan. */
  def permutationTest(df: DataFrame, idCol: Column, treated: Column,
      valueBin: Column, nPerms: Int = 64): DataFrame = {
    import graft.functions.TextHash
    val dec = "decimal(38,0)"
    val per = df.select(idCol.cast("long").as("__id"),
        when(treated, 1L).otherwise(0L).as("__tr"),
        valueBin.cast("long").as("__v"))
      .where(col("__id").isNotNull && col("__v").isNotNull)
      .groupBy("__id").agg(max(col("__tr")).as("__tr"),
        sum(col("__v").cast(dec)).as("__s"), count(lit(1)).as("__c"))
      .localCheckpoint()
    def meanDiff(side: Column): Seq[Column] = Seq(
      sum(when(side === 1L, col("__s"))).as("__sa"),
      sum(when(side === 1L, col("__c"))).as("__ca"),
      sum(when(side === 0L, col("__s"))).as("__sb"),
      sum(when(side === 0L, col("__c"))).as("__cb"))
    def d: Column =
      col("__sa").cast("double") / col("__ca").cast("double") -
        col("__sb").cast("double") / col("__cb").cast("double")
    val obs = per.agg(count(lit(1)).as("n_subjects"),
        meanDiff(col("__tr")): _*)
      .select(col("n_subjects"),
        when(col("__ca").isNull || col("__cb").isNull,
          lit(null).cast("double")).otherwise(d).as("__dobs"))
    val sp = df.sparkSession
    val perms = sp.createDataFrame((1 to nPerms).map(p =>
        (p.toLong, TextHash.permuteA(p), TextHash.permuteB(p))))
      .toDF("__p", "__pa", "__pb")
    val side = pmod(
      pmod(col("__id"), lit(TextHash.P)) * col("__pa") + col("__pb"),
      lit(TextHash.P)) % lit(2L)
    val byP = per.crossJoin(broadcast(perms))
      .withColumn("__side", side)
      .groupBy("__p").agg(meanDiff(col("__side")).head,
        meanDiff(col("__side")).tail: _*)
      .select(col("__p"),
        when(col("__ca").isNull || col("__cb").isNull,
          lit(null).cast("double")).otherwise(d).as("__dp"))
    byP.crossJoin(broadcast(obs))
      .agg(max(col("n_subjects")).as("n_subjects"),
        coalesce(sum(when(abs(col("__dp")) >= abs(col("__dobs")), 1L)
          .otherwise(0L)), lit(0L)).as("__nge"),
        max(col("__dobs")).as("__dobs"))
      .select(col("n_subjects"), lit(nPerms.toLong).as("n_perms"),
        col("__dobs").as("obs_diff"), col("__nge").as("n_ge"),
        when(col("__dobs").isNull, lit(null).cast("double")).otherwise(
          (lit(1.0) + col("__nge").cast("double")) /
            lit((1 + nPerms).toDouble)).as("p_value"))
  }

  /** Mantel–Haenszel common odds ratio across strata — the stratified
    * 2×2 estimator (epidemiology / segmented A-B tests): with per-
    * stratum cells (a = treated-success, b, c, d; n = a+b+c+d),
    *
    *   OR_MH = Σᵢ aᵢdᵢ/nᵢ  /  Σᵢ bᵢcᵢ/nᵢ
    *
    * Determinism: per-stratum terms are one exact-integer product +
    * one division each, folded in STRATUM ORDER (the chi2 sorted-fold
    * discipline) — the doubles are bit-identical across engines, not
    * merely close. One strata-keyed count aggregate, then a fold over
    * the O(strata) grid. Emits (n_strata, mh_num, mh_den, mh_or). */
  def mantelHaenszel(df: DataFrame, strataCol: Column, treated: Column,
      outcome: Column): DataFrame = {
    val cells = df.groupBy(strataCol.as("s")).agg(
      sum(when(treated && outcome, 1L).otherwise(0L)).as("a"),
      sum(when(treated && !outcome, 1L).otherwise(0L)).as("b"),
      sum(when(!treated && outcome, 1L).otherwise(0L)).as("c"),
      sum(when(!treated && !outcome, 1L).otherwise(0L)).as("d"))
    val series = array_sort(collect_list(struct(col("s"), col("a"),
      col("b"), col("c"), col("d"))))
    val zero = struct(lit(0.0).as("num"), lit(0.0).as("den"))
    val step = (acc: Column, e: Column) => {
      val n = (e.getField("a") + e.getField("b") + e.getField("c") +
        e.getField("d")).cast("double")
      struct(
        (acc.getField("num") +
          (e.getField("a") * e.getField("d")).cast("double") / n).as("num"),
        (acc.getField("den") +
          (e.getField("b") * e.getField("c")).cast("double") / n).as("den"))
    }
    cells.agg(series.as("__s"), count(lit(1)).as("n_strata"))
      .select(col("n_strata"), aggregate(col("__s"), zero, step).as("__f"))
      .select(col("n_strata"),
        col("__f.num").as("mh_num"), col("__f.den").as("mh_den"),
        (col("__f.num") / col("__f.den")).as("mh_or"))
  }

  /** Cochran–Armitage trend-test components for ordered binomial
    * groups (dose–response over graded exposures): with score sᵢ,
    * successes aᵢ, totals nᵢ, A = Σa, N = Σn, the statistic
    * T = Σsᵢ(aᵢ·N − nᵢ·A)/N has the exact-integer numerator
    * t_num = N·Σsᵢaᵢ − A·Σsᵢnᵢ, and its variance needs only
    * (A, N, Σsᵢnᵢ, Σsᵢ²nᵢ) — all emitted as exact BIGINTs so the
    * z² assembly is consumer-side, nothing floating here. One
    * group-keyed aggregate over the graded grid. */
  def cochranArmitage(df: DataFrame, scoreCol: Column,
      success: Column): DataFrame = {
    val g = df.groupBy(scoreCol.as("s")).agg(
      sum(when(success, 1L).otherwise(0L)).as("a"),
      count(lit(1)).as("n"))
    g.agg(
      sum(col("a")).as("__A"), sum(col("n")).as("__N"),
      sum(col("s") * col("a")).as("__sa"),
      sum(col("s") * col("n")).as("__sn"),
      sum(col("s") * col("s") * col("n")).as("__s2n"),
      count(lit(1)).as("n_groups"))
      .select(col("n_groups"),
        col("__A").cast("long").as("total_success"),
        col("__N").cast("long").as("total_n"),
        (col("__N") * col("__sa") - col("__A") * col("__sn")).cast("long")
          .as("t_num"),
        col("__sn").cast("long").as("sum_sn"),
        col("__s2n").cast("long").as("sum_s2n"))
  }
}
