package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product-analytics aggregates over an event stream: ordered funnels and
  * cohort retention — the two queries every event warehouse serves daily,
  * here as deterministic, oracle-gateable plans.
  *
  * Both are pure aggregation pipelines: no windows over the full stream,
  * no per-user UDFs, no driver loops — each stage is a hash-aggregate or
  * keyed join Catalyst can reorder/broadcast, and every output is an
  * integer count or an event-time instant (no float accumulation, so
  * results hash-match across engines bit-for-bit).
  */
object Funnel {

  /** Ordered funnel: for each user who performed `steps.head`, the time
    * they FIRST completed each successive step strictly after the
    * previous one (min-ts semantics; a tie on the boundary does not
    * advance the funnel). Output: (userCol, t1 .. t<k> — epoch-micro
    * BIGINTs, NULL once the funnel stalls — and `stages_completed`).
    *
    * Scale shape: one filtered hash-aggregate per step (k is small and
    * fixed), each keyed by user and joined back onto the funnel frame —
    * k passes over the (pre-filtered) event scan, zero shuffles beyond
    * the user-keyed aggregates. The monotone NULL chain means
    * `stages_completed` needs no re-sort: it is 1 + the count of
    * non-null later stages.
    *
    * @param tsCol event-time epoch MICROS as a long column */
  def funnelStages(
      df: DataFrame, userCol: String, tsCol: String, typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    var cur = df.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).cast("long").as("t1"))
    for (k <- 2 to steps.size) {
      val prior = (1 until k).map(i => col(s"t$i"))
      cur = df.filter(col(typeCol) === steps(k - 1))
        .select(col(userCol), col(tsCol).cast("long").as("__ts"))
        .join(cur, Seq(userCol), "right_outer")
        .groupBy(col(userCol) +: prior: _*)
        .agg(min(when(col("__ts") > col(s"t${k - 1}"), col("__ts")))
          .as(s"t$k"))
    }
    val stages = (2 to steps.size)
      .map(k => when(col(s"t$k").isNotNull, 1L).otherwise(0L))
      .foldLeft(lit(1L))(_ + _)
    cur.withColumn("stages_completed", stages)
  }

  /** Classic retention triangle: users grouped by their first-activity
    * date (cohort), activity counted per (cohort, day offset). Output:
    * (cohort_date, day_offset, n_active, n_cohort) — one row per
    * (cohort, offset) with at least one active user.
    *
    * Scale shape: a user-keyed min-aggregate (cohort assignment), a
    * distinct over (user, day) — both map-side combinable — then one
    * aggregate keyed by (cohort, offset) whose distinct-count is exact
    * because each (user, day) row arrives once. Cohort sizes join on the
    * (small) cohort dimension. */
  def retentionCohorts(
      df: DataFrame, userCol: String, dateCol: String): DataFrame = {
    val cohorts = df.groupBy(col(userCol))
      .agg(min(col(dateCol)).as("cohort_date"))
    val active = df.select(col(userCol), col(dateCol).as("__day")).distinct()
    val sizes = cohorts.groupBy(col("cohort_date"))
      .agg(count(lit(1)).as("n_cohort"))
    active.join(cohorts, userCol)
      .groupBy(col("cohort_date"),
        datediff(col("__day"), col("cohort_date")).cast("long")
          .as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, "cohort_date")
  }

  /** RFM customer scoring — recency / frequency / monetary quintile
    * scores, built the way it survives 100 TB: per-user metrics are one
    * keyed aggregate; the quintile BOUNDARIES come from the engine's
    * mergeable decimal-bucket quantile sketch (p20/40/60/80 per metric,
    * one O(buckets) pass — never a global sort of users); scoring is a
    * row-local compare against the 12 broadcast boundary values.
    * Emits (userCol, recency, frequency, monetary, r_score, f_score,
    * m_score), scores 1–5, recency inverted (recent = 5).
    *
    * Determinism: metrics are exact (day diffs, counts, DECIMAL sums);
    * boundary estimates are the sketch's deterministic midpoints; each
    * score is a fixed-shape comparison chain — no rank windows, no
    * ntile. Treats every input row as one transaction. */
  def rfmScores(
      df: DataFrame, userCol: String, dayCol: String,
      valueCol: String): DataFrame = {
    val mx = df.agg(max(col(dayCol)).as("__mx"))
    val per = df.groupBy(col(userCol))
      .agg(max(col(dayCol)).as("__last"),
        count(lit(1)).as("frequency"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double")
          .as("monetary"))
      .crossJoin(broadcast(mx))
      .select(col(userCol), (col("__mx") - col("__last")).as("recency"),
        col("frequency"), col("monetary"))
    val stacked = per.select(explode(array(
        struct(lit("r").as("g"), col("recency").cast("double").as("x")),
        struct(lit("f").as("g"), col("frequency").cast("double").as("x")),
        struct(lit("m").as("g"), col("monetary").as("x")))).as("s"))
      .select(col("s.g").as("g"), col("s.x").as("x"))
    val est = Sketches.quantileFromSketch(
      Sketches.quantileSketch(stacked, Seq("g"), "x"),
      Seq("g"), Seq(20, 40, 60, 80))
    val aggs = for (g <- Seq("r", "f", "m"); p <- Seq(20, 40, 60, 80))
      yield max(when(col("g") === g && col("pct") === p, col("est")))
        .as(s"__$g$p")
    val one = est.groupBy().agg(aggs.head, aggs.tail: _*)
    val sc = (x: Column, g: String) =>
      Seq(20, 40, 60, 80)
        .map(p => (x > col(s"__$g$p")).cast("int")).reduce(_ + _)
    per.crossJoin(broadcast(one))
      .select(col(userCol), col("recency"), col("frequency"),
        col("monetary"),
        (lit(5) - sc(col("recency").cast("double"), "r")).cast("long")
          .as("r_score"),
        (lit(1) + sc(col("frequency").cast("double"), "f")).cast("long")
          .as("f_score"),
        (lit(1) + sc(col("monetary"), "m")).cast("long").as("m_score"))
  }

  /** User-growth curve: per day, the count of FIRST-SEEN users and the
    * running total — the acquisition read behind every growth dashboard,
    * and the denominator feed for retention ratios. Emits
    * (day, n_new, cum_users), days with at least one new user.
    *
    * Determinism: first-seen is a user-keyed min; both counts are exact
    * longs; the cumulative sum runs in day order. Scale: one user-keyed
    * aggregate, one day-keyed aggregate (both map-side combinable); the
    * cumulative window runs over the O(days) grid, not events. */
  def userGrowth(
      df: DataFrame, userCol: String, dayCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.groupBy(col(userCol)).agg(min(col(dayCol)).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n_new"))
      .withColumn("cum_users", sum(col("n_new")).over(
        Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Stage-transition timing over a [[funnelStages]] frame — "how long
    * does conversion take": exact distribution summary of
    * `toCol − fromCol` over users who completed both stages. ONE row:
    * (n_converted, min_gap, max_gap, mean_gap, median_gap) in the
    * funnel's time unit.
    *
    * Determinism: gaps are exact longs; mean is ONE IEEE division of an
    * exact sum; the median is the exact LOWER-median element pick via a
    * cumulative count over the DISTINCT gap values (the grid-not-data
    * discipline — no global sort of users, no interpolated quantile).
    * Scale: two aggregates + an O(distinct gaps) cumulative window. */
  def timeToConvert(
      funnel: DataFrame, fromCol: String, toCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gaps = funnel
      .filter(col(fromCol).isNotNull && col(toCol).isNotNull)
      .select((col(toCol) - col(fromCol)).as("__d")).persist()
    try {
      val tot = gaps.agg(count(lit(1)).as("n_converted"),
        sum(col("__d")).as("__s"),
        min(col("__d")).as("min_gap"), max(col("__d")).as("max_gap"))
      val cum = gaps.groupBy(col("__d")).agg(count(lit(1)).as("__c"))
        .withColumn("__cum", sum(col("__c")).over(
          Window.orderBy(col("__d"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val med = cum.crossJoin(broadcast(
          tot.select(col("n_converted").as("__n"))))
        .agg(min(when(col("__cum") >= expr("(__n + 1) div 2"),
          col("__d"))).as("median_gap"))
      tot.crossJoin(broadcast(med))
        .select(col("n_converted"), col("min_gap"), col("max_gap"),
          (col("__s").cast("double") / col("n_converted").cast("double"))
            .as("mean_gap"),
          col("median_gap"))
        .localCheckpoint()
    } finally { gaps.unpersist(); () }
  }

  /** Cohort lifetime-value curves — [[retentionCohorts]]' revenue
    * companion: users cohorted by first-activity day, each later day
    * contributing that day's conversion revenue at its cohort age, plus
    * the running cumulative ("day-N LTV"). Emits one row per
    * (cohort_day, age_day) with activity:
    * (cohort_day, age_day, n_active, day_revenue, cum_revenue).
    *
    * Determinism: revenue accumulates as DECIMAL(18,2) — exact and
    * order-independent — through BOTH the daily aggregate and the
    * running-cumulative window; only the final values cast to DOUBLE
    * (a float running sum would be frame-order-fragile across engines).
    *
    * Scale: one user-keyed aggregate for cohorts (broadcast-joinable
    * back — O(users) rows), one (cohort, age) hash aggregate with
    * map-side combine, and the cumulative window runs over the
    * aggregated O(days²/2) grid, never the event stream. */
  def cohortLtv(
      df: DataFrame, userCol: String, dayCol: String,
      revenueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cohorts = df.groupBy(col(userCol))
      .agg(min(col(dayCol)).as("cohort_day"))
    val daily = df.join(cohorts, userCol)
      .groupBy(col("cohort_day"),
        (col(dayCol) - col("cohort_day")).as("age_day"))
      .agg(
        countDistinct(col(userCol)).as("n_active"),
        sum(col(revenueCol).cast("decimal(18,2)")).as("__rev"))
    val w = Window.partitionBy(col("cohort_day")).orderBy(col("age_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.select(col("cohort_day"), col("age_day"), col("n_active"),
      col("__rev").cast("double").as("day_revenue"),
      sum(col("__rev")).over(w).cast("double").as("cum_revenue"))
  }

  /** Top event-type paths — journey mining one order above
    * [[markovTransitions]]: the most common length-`n` consecutive
    * event-type sequences across users, ranked by exact count with the
    * path string as the tie-break. Emits the top `k`:
    * (path, n, rank) — `path` the '>'-joined type sequence.
    *
    * Determinism: consecutive-ness is (tsCol ASC, tieCol ASC) within
    * the user (pass a unique tieCol); counts exact; the rank is a
    * window over the aggregated O(types^n) path table. Scale: one
    * user-keyed window producing n-1 lead columns (frame = n-1 rows),
    * one map-side-combinable path aggregate, top-k over the small
    * aggregate. */
  def topPaths(
      df: DataFrame, userCol: String, tsCol: String, tieCol: String,
      typeCol: String, n: Int, k: Int): DataFrame = {
    require(n >= 2 && n <= 6, s"path length must be in [2,6], got $n")
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val seq = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val leads = (1 until n).map(i =>
      lead(col(typeCol), i).over(seq).as(s"__n$i"))
    val withLeads = df.select((col(typeCol).as("__n0") +: leads): _*)
      .filter((1 until n).map(i => col(s"__n$i").isNotNull)
        .reduce(_ && _))
    withLeads
      .select(concat_ws(">", (0 until n).map(i => col(s"__n$i")): _*)
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n").desc, col("path").asc)).cast("long"))
      .filter(col("rank") <= k)
  }

  /** First-order Markov transition matrix of user behavior: for each
    * ordered pair of consecutive events by the same user, count the
    * (from_type → to_type) transition and its conditional probability
    * P(to|from) = n / n_from — the "what do users do next" table feeding
    * next-action prediction and journey analysis.
    *
    * Determinism: consecutive-ness is defined by (tsCol ASC, tieCol ASC)
    * within the user — pass a unique `tieCol` (event id) or equal
    * timestamps make the sequence shuffle-order dependent. Counts are
    * exact longs; the probability is ONE IEEE division of exact integers
    * (bit-identical across engines, no rounding pin needed).
    *
    * Scale: one shuffle on the user for the lead() window (frame is one
    * row — constant state), then one map-side-combinable aggregate on
    * the (from, to) pair; the n_from normalizer is a window over the
    * aggregated O(types²) table, not the stream. */
  def markovTransitions(
      df: DataFrame, userCol: String, tsCol: String, tieCol: String,
      typeCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val seq = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val pairs = df
      .withColumn("__next", lead(col(typeCol), 1).over(seq))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    pairs
      .withColumn("n_from",
        sum(col("n")).over(Window.partitionBy(col("from_type"))))
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        (col("n").cast("double") / col("n_from").cast("double")).as("p"))
  }

  /** Stationary distribution of the [[markovTransitions]] chain by
    * fixed-point power iteration — "where does user behavior settle?":
    * π₊₁(j) = Σᵢ (π(i) · n(i,j)) div n_from(i), all BIGINT in units of
    * 1/q (the [[Graph.pageRank]] fixed-point discipline — float-sum
    * order can't matter because there are no float sums). Terminal
    * states (inflow but no outflow) leak mass exactly as pageRank's
    * dangling nodes do — the simplified formulation, documented;
    * `iters` is caller-fixed so cost and oracle are deterministic.
    *
    * Emits (state, pi_q) for every state. Scale: the transition matrix
    * aggregate is one windowed pass over O(states²) rows; each round is
    * one join + one map-side-combinable sum keyed by state —
    * Pregel-shaped, localCheckpoint per round, no driver data path
    * beyond the one state count. */
  def markovStationary(
      df: DataFrame, userCol: String, tsCol: String, tieCol: String,
      typeCol: String, iters: Int = 5, q: Long = 1000000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(q > 0, s"q must be positive, got $q")
    val seq = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val ef = df
      .withColumn("__next", lead(col(typeCol), 1).over(seq))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("__f"), col("__next").as("__t"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__nf",
        sum(col("__n")).over(Window.partitionBy(col("__f"))))
      .persist()
    val states = ef.select(col("__f").as("state"))
      .unionByName(ef.select(col("__t").as("state"))).distinct().persist()
    try {
      val n = states.count()
      require(n > 0, "markovStationary needs at least one transition")
      var ckpt = states.withColumn("pi_q", lit(q / n)).localCheckpoint()
      var pi = ckpt
      for (_ <- 0 until iters) {
        val contrib = ef
          .join(pi.select(col("state").as("__f"), col("pi_q")), "__f")
          .select(col("__t").as("state"),
            expr("(pi_q * __n) div __nf").as("__c"))
          .groupBy("state").agg(sum(col("__c")).as("__acc"))
        val next = states.join(contrib, Seq("state"), "left_outer")
          .select(col("state"),
            coalesce(col("__acc"), lit(0L)).as("pi_q"))
          .localCheckpoint()
        org.apache.spark.sql.GraftSql.freeLocalCheckpoint(ckpt)
        ckpt = next
        pi = next
      }
      pi
    } finally { ef.unpersist(); states.unpersist(); () }
  }

  /** Sliding-window funnel (the ClickHouse `windowFunnel` semantic,
    * 3 fixed steps): a user's depth is the longest ordered prefix
    * step1→step2→step3 completed by a chain of events whose TOTAL span
    * fits in `windowUs` — the "did they sign up, click, AND buy within
    * 72 h" ask [[funnelStages]]' unbounded min-ts chain can't answer.
    * Per user, one strict left-to-right fold over the time-ordered step
    * events keeping, per level j, the LATEST chain-start time s_j that
    * completes levels 1..j (a step-j event promotes s_{j-1} when its
    * own time is within the window of that start). Output: one row per
    * depth 0..3 — (depth, n_users) — with every funnel-eligible user
    * counted exactly once.
    *
    * Implementation: cascaded RUNNING MAXES, not a per-user fold — the
    * greedy chain-start invariant ("keep the LATEST start reaching each
    * level") makes the max-so-far chain start optimal for every later
    * window check (a larger start can only shrink t − start), so three
    * ordered window maxes compute exactly the fold's final state:
    * s1run = running max step-1 time; chain2 = s1run admitted by a
    * step-2 event within the window; s2run = running max chain2;
    * chain3 likewise. Windows are per-user (the natural partition),
    * events pre-filtered to the three step types — no global-stream
    * window, no arrays, no interpreted folds. */
  def windowFunnel(
      df: DataFrame, userCol: String, tsCol: String, typeCol: String,
      steps: Seq[String], windowUs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(steps.size == 3, s"windowFunnel is fixed at 3 steps, got ${steps.size}")
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    val st = steps.zipWithIndex.foldLeft(lit(0L)) { case (acc, (s, i)) =>
      when(col(typeCol) === s, (i + 1).toLong).otherwise(acc)
    }
    val w = Window.partitionBy(col("__u"))
      .orderBy(col("__us").asc, col("__st").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = df
      .select(col(userCol).as("__u"), col(tsCol).cast("long").as("__us"),
        st.as("__st"))
      .filter(col("__st") >= 1L)
      .withColumn("__s1run", max(when(col("__st") === 1L, col("__us"))).over(w))
      .withColumn("__c2",
        when(col("__st") === 2L && col("__s1run").isNotNull &&
          col("__us") - col("__s1run") <= windowUs, col("__s1run")))
      .withColumn("__s2run", max(col("__c2")).over(w))
      .withColumn("__c3",
        when(col("__st") === 3L && col("__s2run").isNotNull &&
          col("__us") - col("__s2run") <= windowUs, col("__s2run")))
    base.groupBy("__u").agg(
        max(when(col("__st") === 1L, 1L).otherwise(0L)).as("__d1"),
        max(when(col("__c2").isNotNull, 1L).otherwise(0L)).as("__d2"),
        max(when(col("__c3").isNotNull, 1L).otherwise(0L)).as("__d3"))
      .select(when(col("__d3") === 1L, 3L)
        .when(col("__d2") === 1L, 2L)
        .when(col("__d1") === 1L, 1L)
        .otherwise(0L).as("depth"))
      .groupBy("depth").agg(count(lit(1)).as("n_users"))
  }

  /** Daily growth accounting — the standard DAU decomposition
    * `new + retained + resurrected − churned`: for every activity day,
    * how many users were brand new, carried over from the previous day,
    * returned after a lapse, or (attributed to the FOLLOWING day)
    * dropped out. Identity: `n_new + n_retained + n_resurrected` =
    * that day's DAU, and day d's DAU − day d+1's retained = day d+1's
    * churn from d — the bookkeeping growth teams reconcile against.
    *
    * Classification is one lag/lead window over each user's distinct
    * active days: new (no prior day), retained (prior day = d−1),
    * resurrected (prior day < d−1); a user churns AT day d+1 when day d
    * has no successor at d+1 (including their final activity day, so
    * the last day's cohort churns past the observation window — the
    * convention that keeps the identity exact without a horizon
    * parameter). Exact integer counts only.
    *
    * Scale: one (user, day) dedup aggregate, one user-keyed window, one
    * day-keyed count — all map-side-combinable or sharing the user
    * shuffle. Output O(days). */
  def growthAccounting(
      df: DataFrame, userCol: String, dayCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ud = df.select(col(userCol).as("__u"),
      col(dayCol).cast("long").as("__d")).distinct()
    val w = Window.partitionBy(col("__u")).orderBy(col("__d"))
    val marked = ud
      .withColumn("__prev", lag(col("__d"), 1).over(w))
      .withColumn("__next", lead(col("__d"), 1).over(w))
    val act = marked.groupBy(col("__d").as("day"))
      .agg(
        sum(when(col("__prev").isNull, 1L).otherwise(0L)).as("n_new"),
        sum(when(col("__prev") === col("__d") - 1L, 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("__prev").isNotNull &&
          col("__prev") < col("__d") - 1L, 1L).otherwise(0L))
          .as("n_resurrected"))
    val churn = marked
      .where(col("__next").isNull || col("__next") =!= col("__d") + 1L)
      .groupBy((col("__d") + 1L).as("day"))
      .agg(count(lit(1)).as("n_churned"))
    act.join(churn, Seq("day"), "full_outer")
      .select(col("day"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
  }
}
