package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** Deterministic hash-based sampling and dataset splitting — the
  * train/val/test assignment a training-data pipeline runs over every
  * corpus. Both are pure row-local map work (zero shuffle, no RNG state):
  * the assignment is a function of the id alone, so it is reproducible
  * across runs/engines/cluster sizes, stable under repartitioning, and
  * new data joins the same split it would always have gotten — none of
  * which holds for `df.sample` or `rand()`-based splits.
  *
  * The hash is the engine's MinHash permutation family (`TextHash
  * .permute`), already mirrored value-for-value by the DuckDB oracle, so
  * split assignments are hash-gateable like every other operator.
  */
object Sampling {

  /** Uniform pseudo-random bucket in [0, buckets) from an integral id.
    * pmod, not %: Scala/Spark `%` keeps the dividend's sign, so a
    * negative id would land in a NEGATIVE bucket — below every split
    * cut (always 'train') and inside every sample fraction, 0% included. */
  def hashBucket(id: Column, buckets: Int = 100): Column =
    pmod(TextHash.permute(0, id), lit(buckets))

  /** Deterministic fractional sample: keeps ids hashing below
    * `percent` % of the bucket space. */
  def sampleByHash(df: DataFrame, idCol: String, percent: Int): DataFrame = {
    require(percent >= 0 && percent <= 100, "percent must be in [0, 100]")
    df.where(hashBucket(col(idCol)) < percent)
  }

  /** Split assignment column: `weights` are (name, percent) summing to
    * 100; ids land in splits by hash-bucket range, so the split is exact
    * in expectation and deterministic per id. */
  def splitColumn(id: Column, weights: Seq[(String, Int)]): Column = {
    require(weights.nonEmpty && weights.map(_._2).sum == 100,
      s"split weights must sum to 100, got $weights")
    val bucket = hashBucket(id)
    val cuts = weights.scanLeft(0)(_ + _._2).tail
    weights.zip(cuts).init.foldRight(lit(weights.last._1)) {
      case (((name, _), cut), els) => when(bucket < cut, name).otherwise(els)
    }
  }

  /** (df + `split` column) per `weights` — train/val/test in one pass. */
  def assignSplits(
      df: DataFrame, idCol: String,
      weights: Seq[(String, Int)] = Seq("train" -> 80, "val" -> 10, "test" -> 10),
      splitCol: String = "split"): DataFrame =
    df.withColumn(splitCol, splitColumn(col(idCol), weights))

  /** Per-domain cap: keep at most `cap` rows per value of `domainCol`,
    * chosen in deterministic hash order `(permute(id), id)` — the
    * standard anti-domination guard for web corpora, where a handful of
    * sites would otherwise contribute most of the training tokens. The
    * hash order makes the kept subset a uniform pseudo-random sample of
    * each domain (NOT its first/lowest ids) while staying reproducible
    * across runs and engines.
    *
    * Scale: one window keyed by domain. Domains are many and the cap is
    * small, so partitions stay bounded; a pathological mega-domain skews
    * one partition — pre-filter with a cheap `count per domain` + salt
    * if a single domain approaches executor memory. */
  def capPerDomain(
      df: DataFrame, domainCol: String, idCol: String, cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    require(!df.columns.contains("__rn"),
      "capPerDomain reserves the column name __rn; rename it upstream")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(domainCol))
      .orderBy(TextHash.permute(0, col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }

  /** Proportional stratified sample: keep `percent`% of EVERY stratum —
    * exactly ceil(n_g · percent / 100) rows, chosen in deterministic hash
    * order `(permute(id), id)` — so small strata survive at their true
    * proportion instead of vanishing by chance (the failure mode of a
    * global [[sampleByHash]] on skewed strata: a 0.1% language can lose
    * every row). The hash order makes each stratum's kept subset a
    * uniform pseudo-random slice, reproducible across runs and engines.
    *
    * Scale: one window keyed by stratum (rank + count share the
    * partitioning — a single exchange), same bounded-strata caveat as
    * [[quantileBins]]. */
  def stratifiedSample(
      df: DataFrame, strataCol: String, idCol: String,
      percent: Int): DataFrame = {
    require(percent >= 0 && percent <= 100,
      s"percent must be in [0, 100], got $percent")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(strataCol))
      .orderBy(TextHash.permute(0, col(idCol)), col(idCol))
    val wAll = Window.partitionBy(col(strataCol))
    // rn <= ceil(n_g·p/100)  ⇔  100·rn <= n_g·p + 99 (integer-exact;
    // ceil keeps every nonempty stratum alive at any positive percent)
    df.withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__ng", count(lit(1)).over(wAll))
      .filter(col("__rn") * 100 <= col("__ng") * percent + 99)
      .drop("__rn", "__ng")
  }

  /** Fixed-k-per-stratum RESERVOIR sample, deterministic: keep each
    * stratum's k rows with the smallest (hash, id) tag — the
    * distributed equivalent of Algorithm R with the min-hash rank
    * playing the random tag (a "bottom-k sample"). Bottom-k by a fixed
    * hash is MERGEABLE by construction: the bottom-k of a union is the
    * bottom-k of the per-part bottom-k's (the KMV property), which is
    * what makes this the streaming/partition-parallel reservoir — no
    * sequential scan, no RNG state. Emits the surviving rows plus
    * `sample_rank` (1..k in tag order).
    *
    * Scale: one window per stratum (the [[stratifiedSample]] contract:
    * bounded strata); for a single giant stratum run the mergeable
    * form — per-partition bottom-k then re-rank — which this hash
    * construction makes semantically identical. */
  def reservoirPerStratum(
      df: DataFrame, strataCol: String, idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(strataCol))
      .orderBy(TextHash.permute(1, col(idCol)), col(idCol))
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k.toLong)
  }

  /** Per-stratum quantile bins — curriculum/quality binning: rank rows
    * within each stratum (e.g. language) by `scoreCol` and cut into
    * `bins` equal-frequency bins via `ntile`. Ties break on `idCol`, so
    * the assignment is total and deterministic (plain ntile over a
    * non-unique score is engine-dependent). Bin ids are 1..bins as LONG.
    *
    * Scale: one shuffle keyed by stratum; window execution needs each
    * stratum in ONE task, so this is for bounded strata (languages,
    * sources — dozens to thousands of rows-per-stratum times what fits
    * an executor). For a single giant stratum, pre-thin with
    * [[sampleByHash]] or bin on broadcast percentile cut points instead
    * of a global rank. */
  def quantileBins(
      df: DataFrame, strataCol: String, scoreCol: String, idCol: String,
      bins: Int, binCol: String = "bin"): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col(scoreCol), col(idCol))
    df.withColumn(binCol, ntile(bins).over(w).cast("long"))
  }

  /** Per-bin deterministic sampling — the curriculum-mixing companion of
    * [[quantileBins]]: each bin keeps its own percent of rows (absent
    * bins keep `defaultPercent`), so e.g. low-quality deciles are thinned
    * while high-quality deciles are kept whole. Row-local like
    * [[sampleMixture]] and in the same hash family, so kept sets nest
    * across rates and are stable across runs/engines. */
  def sampleByBin(
      df: DataFrame, binCol: String, idCol: String,
      rates: Map[Long, Int], defaultPercent: Int = 100): DataFrame =
    sampleByRate(df, binCol, idCol,
      rates.map { case (k, v) => lit(k) -> v }, defaultPercent)

  /** Per-row importance sampling — the continuous generalization of
    * [[sampleMixture]]/[[sampleByBin]]: keep each row with probability
    * `ratePercent`/100 where the rate is ANY computed column (quality
    * score, domain weight, recency decay), clamped to [0, 100]. Still
    * row-local and deterministic per id: a row's fate depends only on
    * (id, its own rate), so re-runs and engines agree, and raising a
    * row's rate can only ADD it to the kept set (monotone). */
  def sampleByRateColumn(
      df: DataFrame, idCol: String, ratePercent: Column): DataFrame =
    df.where(hashBucket(col(idCol)) <
      least(lit(100), greatest(lit(0), ratePercent)))

  /** Shared keyed-rate filter behind [[sampleMixture]] / [[sampleByBin]]:
    * validates the percents and keeps rows whose hash bucket falls below
    * the rate of their key (a when-chain over literal keys). */
  private def sampleByRate(
      df: DataFrame, keyCol: String, idCol: String,
      rates: Map[Column, Int], defaultPercent: Int): DataFrame = {
    (rates.values.toSeq :+ defaultPercent).foreach(p =>
      require(p >= 0 && p <= 100, s"percent must be in [0, 100], got $p"))
    val rate = rates.foldLeft(lit(defaultPercent)) { case (els, (k, p)) =>
      when(col(keyCol) === k, lit(p)).otherwise(els)
    }
    df.where(hashBucket(col(idCol)) < rate)
  }

  /** Weighted sample WITHOUT replacement, exactly k per group — the
    * Efraimidis–Sirivianos reservoir scheme in its exponential-key
    * form: each row gets key `-ln(u)/w` with `u ∈ (0, 1]` drawn from
    * the deterministic hash of its id, and the k SMALLEST keys per
    * group are a weighted sample without replacement (inclusion odds
    * proportional to weight, no row twice). The pseudo-random draw is
    * the engine's shared permutation hash, so the sample is stable
    * across runs, partitionings, and engines — and `round(key, 8)`
    * absorbs last-ulp `ln` differences between libms, with the id as
    * the deterministic tie-break (the bm25 discipline).
    *
    * Emits (groupCol, idCol, weightCol, wrank), wrank 1..k by
    * ascending key. Rows with weight <= 0 are excluded (zero weight =
    * never sampled; the ln form would divide by zero).
    *
    * Scale: one row-local key computation + one k-bounded per-group
    * window — the shuffle is by group only, state per group is the
    * top-k heap. The classic one-pass distributed weighted sampler. */
  def sampleWeighted(
      df: DataFrame, groupCol: String, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val u = (TextHash.permute(0, col(idCol)) + 1L).cast("double") /
      (TextHash.P + 1L).toDouble
    val key = round(-log(u) / col(weightCol).cast("double"), 8)
    df.where(col(weightCol) > 0)
      .withColumn("__wkey", key)
      .withColumn("wrank", row_number().over(
        Window.partitionBy(col(groupCol))
          .orderBy(col("__wkey").asc, col(idCol).asc)))
      .where(col("wrank") <= k)
      .select(col(groupCol), col(idCol), col(weightCol), col("wrank"))
  }

  /** Per-domain mixture sampling — the data-mixing step of corpus
    * assembly: each domain keeps a different deterministic fraction
    * (percent in [0, 100]) of its rows, so over-represented sources are
    * thinned to a target mixture in ONE row-local pass (no shuffle, no
    * window, no per-domain jobs). Domains absent from `rates` keep
    * `defaultPercent`. Same hash family as [[sampleByHash]], so the kept
    * subset is stable across runs/engines and nests: a domain sampled at
    * 20% is a superset of the same domain at 10%. */
  def sampleMixture(
      df: DataFrame, domainCol: String, idCol: String,
      rates: Map[String, Int], defaultPercent: Int = 100): DataFrame =
    sampleByRate(df, domainCol, idCol,
      rates.map { case (k, v) => lit(k) -> v }, defaultPercent)

  /** Temperature-scaled domain mixture — the α-weighting step of
    * multi-source corpus assembly (mT5/ROOTS-style): target domain
    * probabilities p_d ∝ n_d^α with α ∈ (0, 1] flatten the natural
    * distribution (α=1 keeps it; α→0 approaches uniform over domains),
    * so tail domains are up-weighted relative to head domains without
    * hand-tuned per-domain rates. For a THINNING pass keeping an
    * expected `targetFrac` of the corpus, the per-domain keep rate is
    *   r_d = min(1, targetFrac · N · n_d^(α−1) / Σ_e n_e^α)
    * (expected kept per domain ∝ n_d^α; head domains hit the cap first).
    *
    * Determinism: domain counts are exact longs off one aggregate;
    * Σ n^α is a STRICT domain-sorted fold (the chiSquare/entropy
    * discipline — a parallel float sum would be order-dependent); the
    * rate is pinned at round(·, 8) to absorb last-ulp `pow` differences
    * between libms; the per-row draw u = (permute(id)+1)/(P+1) is exact
    * rational arithmetic off the shared hash family, so the kept set is
    * identical across runs, partitionings, and engines.
    *
    * Scale: one map-side-combinable count aggregate (O(domains) rows),
    * one broadcast join of the rates back onto the scan, one row-local
    * filter — no corpus-keyed shuffle anywhere. Emits
    * (idCol, domainCol, keep_rate) for kept rows. */
  def sampleTemperature(
      df: DataFrame, domainCol: String, idCol: String,
      alpha: Double, targetFrac: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    require(targetFrac > 0.0 && targetFrac <= 1.0,
      s"targetFrac must be in (0,1], got $targetFrac")
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("__nd"))
    val z = counts
      .agg(
        sort_array(collect_list(struct(col(domainCol).as("__d"),
          col("__nd")))).as("cs"),
        sum(col("__nd")).as("__n"))
      .select(col("__n"),
        aggregate(col("cs"), lit(0.0), (acc, x) =>
          acc + pow(x.getField("__nd").cast("double"), lit(alpha)))
          .as("__za"))
    val rates = counts.crossJoin(broadcast(z))
      .select(col(domainCol),
        round(least(lit(1.0),
          lit(targetFrac) * col("__n").cast("double") *
            pow(col("__nd").cast("double"), lit(alpha - 1.0)) / col("__za")),
          8).as("keep_rate"))
    val u = (TextHash.permute(0, col(idCol)) + 1L).cast("double") /
      lit((TextHash.P + 1L).toDouble)
    df.join(broadcast(rates), Seq(domainCol))
      .where(u < col("keep_rate"))
      .select(col(idCol), col(domainCol), col("keep_rate"))
  }

  /** Cumulative Poisson(λ) thresholds P(X ≤ k), k = 0..maxK−1 —
    * driver-computed double literals shared VERBATIM with any oracle
    * (`Double.toString` round-trips, the benford precedent). */
  def poissonCdf(lambda: Double, maxK: Int): Seq[Double] = {
    require(lambda > 0.0, s"lambda must be positive, got $lambda")
    require(maxK >= 1, s"maxK must be >= 1, got $maxK")
    val pmf = (0 until maxK).scanLeft(math.exp(-lambda)) {
      case (p, k) => p * lambda / (k + 1)
    }
    pmf.take(maxK).scanLeft(0.0)(_ + _).tail
  }

  /** Deterministic Poisson bootstrap — per-row replication counts
    * k ~ Poisson(λ) drawn by inverse-CDF on the row's hash uniform:
    * the standard distributed bootstrap (each resample re-weights rows
    * by an independent Poisson(1) count; no global sampling pass, no
    * shared state). Deterministic: the same row always draws the same
    * k for a given `round`, so resamples are reproducible across runs,
    * partitionings, and engines, and different `round` values give
    * independent draws from the same hash family.
    *
    * Emits (idCol, boot_k). `boot_k` saturates at `maxK` (cdf tail
    * truncation — P(X ≥ 8) < 1e-6 at λ=1, documented rather than
    * looped). Row-local: one hash + maxK literal comparisons inside
    * whole-stage codegen; `explode`-free (callers replicate with
    * `explode(sequence(1, boot_k))` when materialization is wanted). */
  def poissonReplication(
      df: DataFrame, idCol: String, lambda: Double = 1.0,
      maxK: Int = 8, round: Int = 0): DataFrame = {
    val cdf = poissonCdf(lambda, maxK)
    val u = (graft.functions.TextHash.permute(round, col(idCol))
      .cast("double") / lit(graft.functions.TextHash.P.toDouble))
    val k = cdf.map(c => when(u >= lit(c), 1L).otherwise(0L))
      .reduce(_ + _)
    df.select(col(idCol), k.as("boot_k"))
  }

  /** Bootstrap confidence interval for a mean — [[poissonReplication]]
    * run to its conclusion: `reps` independent deterministic Poisson
    * resamples ride ONE aggregate (per replicate b, the pair
    * Σ k_b·q / Σ k_b from the row-hash replication counts), each
    * replicate mean is one exact-integer division, and the interval is
    * an ELEMENT PICK from the sorted replicate means (ranks
    * ⌈α·reps⌉ / ⌈(1−α)·reps⌉) — never a float quantile interpolation.
    * Emits one row: (n_rows, mean_full, ci_lo, ci_hi).
    *
    * Determinism: replicate b's counts come from hash permutation b
    * (reproducible across runs, partitionings, engines — the
    * [[poissonReplication]] contract); every accumulator is an exact
    * BIGINT; the 2·reps aggregate columns are map-side combinable. The
    * astronomically-improbable all-zero replicate (P ≈ e^−n) yields a
    * NULL mean, which sorts first and would surface as a NULL bound —
    * loud, not wrong.
    *
    * Scale: ONE scan, 2·reps + 2 agg columns, O(1) output — the whole
    * point of the Poisson bootstrap at 100 TB (no per-replicate pass,
    * no resampled copies of the corpus). */
  def bootstrapMeanCI(
      df: DataFrame, idCol: String, qCol: String, scale: Double,
      reps: Int = 40, alpha: Double = 0.05, lambda: Double = 1.0,
      maxK: Int = 8): DataFrame = {
    require(reps >= 2, s"reps must be >= 2, got $reps")
    require(alpha > 0.0 && alpha < 0.5, s"alpha must be in (0, 0.5), got $alpha")
    val cdf = poissonCdf(lambda, maxK)
    def kExpr(b: Int): Column = {
      val u = (graft.functions.TextHash.permute(b, col(idCol))
        .cast("double") / lit(graft.functions.TextHash.P.toDouble))
      cdf.map(c => when(u >= lit(c), 1L).otherwise(0L)).reduce(_ + _)
    }
    // Materialize each replicate count once (the HOF lesson: never let
    // the optimizer re-evaluate the hash chain per consumer).
    val withK = df.select(
      col(qCol).cast("long").as("__q") +:
        (0 until reps).map(b => kExpr(b).as(s"__k$b")): _*)
    val aggs =
      Seq(count(lit(1)).as("__n0"),
        coalesce(sum(col("__q")), lit(0L)).as("__s0")) ++
        (0 until reps).flatMap(b => Seq(
          coalesce(sum(col(s"__k$b") * col("__q")), lit(0L)).as(s"__skx$b"),
          coalesce(sum(col(s"__k$b")), lit(0L)).as(s"__sk$b")))
    val m = withK.agg(aggs.head, aggs.tail: _*)
    val mean = (sx: Column, n: Column) =>
      when(n === 0L, lit(null).cast("double"))
        .otherwise(sx.cast("double") / n.cast("double") / lit(scale))
    val means = array((0 until reps).map(b =>
      mean(col(s"__skx$b"), col(s"__sk$b"))): _*)
    val loRank = math.max(1, math.ceil(alpha * reps).toInt)
    val hiRank = math.min(reps, math.ceil((1.0 - alpha) * reps).toInt)
    m.select(col("__n0").as("n_rows"),
      mean(col("__s0"), col("__n0")).as("mean_full"),
      element_at(sort_array(means), loRank).as("ci_lo"),
      element_at(sort_array(means), hiRank).as("ci_hi"))
  }

  /** Class-rebalancing negative downsampling — the classic trick for
    * training on wildly imbalanced labels (CTR, abuse, conversion):
    * keep EVERY positive, keep a deterministic `keepPct`% hash sample
    * of the negatives, and attach the importance weight that makes the
    * downsampled set unbiased (positives weigh 1, survivors weigh
    * `100/keepPct` — the inverse of their sampling rate).
    *
    * Emits the surviving rows as (idCol, y, weight). Determinism: the
    * same [[hashBucket]] spine as every sampling gate — membership is a
    * pure function of the id, invariant to partitioning and re-runs;
    * the weight is ONE fixed-shape division of two integer literals.
    *
    * Scale: a row-local filter — no shuffle at all; the scan prunes to
    * (id, label) columns. */
  def downsampleNegatives(
      df: DataFrame, idCol: String, labelPred: Column,
      keepPct: Int): DataFrame = {
    require(keepPct >= 1 && keepPct <= 100,
      s"keepPct must be in [1, 100], got $keepPct")
    df.select(col(idCol), when(labelPred, 1L).otherwise(0L).as("y"))
      .where(col("y") === 1L || hashBucket(col(idCol)) < keepPct)
      .withColumn("weight",
        when(col("y") === 1L, lit(1.0))
          .otherwise(lit(100.0) / lit(keepPct.toDouble)))
  }

  /** Neyman-allocation stratified sample — the variance-optimal budget
    * split survey statistics prescribes: stratum h receives
    * n_h ∝ N_h·σ_h of the total budget k (high-variance strata get
    * proportionally MORE than proportional allocation gives them; a
    * zero-variance stratum needs almost none). [[stratifiedSample]]
    * takes the same percent everywhere; this is the
    * metric-variance-aware upgrade. Emits the selected rows as
    * (strataCol, idCol, n_stratum, alloc).
    *
    * Allocation arithmetic, exactly: the weight
    * w_h = N_h·σ_h = √(N_h·Σx² − S_h²) has an EXACT DECIMAL(38,0)
    * radicand (negative-rounding guard clamps at 0), one IEEE sqrt;
    * W = Σ w_h folds strictly over the strata sorted by key (O(strata)
    * array); quotas k·w_h/W round by largest remainder (ties on
    * stratum key ASC) so Σ n_h = k exactly, each capped at N_h.
    * Row selection is the [[stratifiedSample]] spine: rank by the
    * shared permute hash (id tie-break), keep rn ≤ n_h — deterministic
    * across runs, partitionings, and engines.
    *
    * Scale: one grouped-moments pass over the scan, O(strata) driver-
    * bounded fold + windows, then one rank window per stratum (the
    * stratifiedSample shape). W = 0 (every stratum constant) yields an
    * empty sample by Neyman's own logic. */
  def neymanSample(
      df: DataFrame, strataCol: String, idCol: String, valCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val x = col(valCol).cast(dec)
    val m = df.groupBy(col(strataCol)).agg(
      count(lit(1)).as("__n"),
      sum(x).as("__s"),
      sum(x * x).as("__sxx"))
    val w = m.withColumn("__vn",
        greatest(col("__n").cast(dec) * col("__sxx") -
          col("__s") * col("__s"), lit(0).cast(dec)))
      .withColumn("__w", sqrt(col("__vn").cast("double")))
    val tot = w
      .agg(sort_array(collect_list(struct(col(strataCol), col("__w"))))
        .as("__g"))
      .select(aggregate(col("__g"), lit(0.0),
        (acc, s) => acc + s.getField("__w")).as("__tw"))
    val whole = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val alloc = w.crossJoin(broadcast(tot))
      .withColumn("__q",
        when(col("__tw") === 0.0, lit(0.0))
          .otherwise(lit(k.toDouble) * col("__w") / col("__tw")))
      .withColumn("__base", floor(col("__q")).cast("long"))
      .withColumn("__rem", col("__q") - floor(col("__q")))
      .withColumn("__left", lit(k.toLong) - sum(col("__base")).over(whole))
      .withColumn("__rk", row_number().over(
        Window.orderBy(col("__rem").desc, col(strataCol).asc)).cast("long"))
      .withColumn("alloc",
        least(col("__base") +
          when(col("__rk") <= col("__left"), 1L).otherwise(0L),
          col("__n")))
      .select(col(strataCol), col("__n").as("n_stratum"), col("alloc"))
    val rank = Window.partitionBy(col(strataCol))
      .orderBy(TextHash.permute(0, col(idCol)), col(idCol))
    df.select(col(strataCol), col(idCol))
      .withColumn("__rn", row_number().over(rank).cast("long"))
      .join(broadcast(alloc), strataCol)
      .filter(col("__rn") <= col("alloc"))
      .select(col(strataCol), col(idCol), col("n_stratum"), col("alloc"))
  }

  /** Survey raking (iterative proportional fitting) to UNIFORM row and
    * column marginals — the post-stratification weighting that makes a
    * skewed sample speak for a balanced population: cell weights are
    * alternately rescaled so each row's mass, then each column's,
    * matches its target share, `rounds` times. Output one row per
    * observed cell: (rowCol, colCol, n, w_milli, w).
    *
    * Determinism via FIXED-POINT arithmetic (the PageRank discipline):
    * weights live in 1/1000 units as BIGINTs, every rescale is one
    * integer multiply + floor division, and marginal sums are exact
    * integer additions — order-free across partitions AND engines, so
    * no float fold anywhere. Floor rounding makes this converge to
    * within q-quantization of real IPF (the tolerance a weighting
    * pipeline already accepts). Magnitude bound: w·target must fit a
    * BIGINT — totals up to ~3·10⁹ rows at q=1000; rescale upstream
    * counts beyond that.
    *
    * Scale: per round, two grouped integer aggregates over O(cells)
    * (the CONTINGENCY TABLE, not the corpus) and two broadcast joins
    * back. The corpus is touched once, in the initial count. */
  def ipfRake(df: DataFrame, rowCol: Column, colCol: Column,
      rounds: Int = 3): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val q = 1000L
    // Materialize the contingency table ONCE. The loop below references
    // `cells` twice per marginal step (as the aggregate side of the
    // broadcast and as the join's probe side), so an unmaterialized plan
    // doubles per step — 2^(2·rounds) copies of the base scan+groupBy by
    // the final action, and the broadcast subplans re-aggregate the base
    // table each time. Checkpointing the (tiny: nR·nC rows) cell table
    // per step keeps the plan flat; the integer arithmetic is
    // partitioning-independent, so results are bit-identical.
    var cells = df
      .select(rowCol.cast("string").as("__r"), colCol.cast("string").as("__c"))
      .where(col("__r").isNotNull && col("__c").isNotNull)
      .groupBy("__r", "__c").agg(count(lit(1)).as("n"))
      .withColumn("__w", col("n") * q)
      .localCheckpoint()
    val t0 = cells.agg(
      sum(col("n")).as("t"),
      countDistinct(col("__r")).as("nr"),
      countDistinct(col("__c")).as("nc")).collect().head
    val (total, nR, nC) = (t0.getLong(0), t0.getLong(1), t0.getLong(2))
    val rowT = total * q / nR
    val colT = total * q / nC
    (1 to rounds).foreach { _ =>
      val rs = cells.groupBy("__r").agg(sum(col("__w")).as("__rsum"))
      val rowScaled = cells.join(broadcast(rs), "__r")
        .withColumn("__w", expr(s"__w * ${rowT}L div __rsum"))
        .drop("__rsum")
      val cs = rowScaled.groupBy("__c").agg(sum(col("__w")).as("__csum"))
      val next = rowScaled.join(broadcast(cs), "__c")
        .withColumn("__w", expr(s"__w * ${colT}L div __csum"))
        .drop("__csum")
        .localCheckpoint()
      org.apache.spark.sql.GraftSql.freeLocalCheckpoint(cells)
      cells = next
    }
    cells.select(col("__r").as("row_key"), col("__c").as("col_key"),
      col("n"), col("__w").as("w_milli"),
      (col("__w").cast("double") / lit(q.toDouble)).as("w"))
  }

  /** Systematic probability-proportional-to-size (PPS) sampling — the
    * survey-sampling workhorse for size-skewed corpora: lay the items
    * out on a line in id order, each occupying its weight, and take
    * every (W/k)-th point; an item is drawn floor(cum·k/W) −
    * floor((cum−w)·k/W) times, so items longer than the stride draw
    * multiply and expected inclusion is exactly proportional to
    * weight. Deterministic (no random start — the driver compare needs
    * a reproducible draw; add a fixed offset upstream if rotation is
    * wanted).
    *
    * Scale: the global cumulative sum is COLUMNAR — range partitions
    * on the id, per-partition window sums, one broadcast exclusive
    * prefix of partition totals — never a 1-partition window. Output:
    * (id, weight, cum, n_picks > 0 rows only). Weights must be
    * positive; w·k must fit BIGINT. */
  def systematicPps(df: DataFrame, idCol: Column, weightCol: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val base = df.select(idCol.as("__id"),
        weightCol.cast("long").as("__w"))
      .where(col("__w").isNotNull && col("__w") > 0L)
    // localCheckpoint, not persist: the totals collect and the final
    // plan must see the SAME sampled range boundaries — a cache is a
    // hint, and the old finally-unpersist freed it before the caller
    // ran the returned plan, re-sampling boundaries against stale
    // offsets (see RankEval.averagePrecision, found at the 10× probe).
    val parted = base.repartitionByRange(col("__id"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    try {
      val totals = parted.groupBy(col("__pid"))
        .agg(sum(col("__w")).as("__t"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      val offsets = totals.map(_._1)
        .zip(totals.map(_._2).scanLeft(0L)(_ + _).init)
      val total = totals.map(_._2).sum
      val offDf = parted.sparkSession.createDataFrame(offsets.toSeq)
        .toDF("__pid", "__off")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__pid")).orderBy(col("__id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      parted.join(broadcast(offDf), "__pid")
        .withColumn("__cum", col("__off") + sum(col("__w")).over(w))
        .withColumn("__picks",
          expr(s"(__cum * $k) div ${total}L - " +
            s"((__cum - __w) * $k) div ${total}L"))
        .where(col("__picks") > 0L)
        .select(col("__id").as("id"), col("__w").as("weight"),
          col("__cum").as("cum"), col("__picks").as("n_picks"))
        .localCheckpoint() // ≤ k picked rows: force while parted lives
    } finally {
      org.apache.spark.sql.GraftSql.freeLocalCheckpoint(parted); ()
    }
  }

  /** PRIORITY sampling (Duffield–Lund–Thorup 2007) — the weighted
    * without-replacement scheme with near-optimal subset-sum variance:
    * each row draws u_i ∈ (0,1] (here the DETERMINISTIC hash
    * u = h/P, so the sample is reproducible and oracle-replayable) and
    * gets priority q_i = w_i/u_i = w_i·P/h_i; the sample is the top-k
    * by priority. w·P stays under 2⁵³ for the weights this corpus
    * carries, so the one double division is the only float op — bit-
    * exact in both engines. Emits (id, weight, h, priority) for the k
    * winners (ties to the smaller id). Top-k is an orderBy().limit()
    * — TakeOrdered, never a corpus window. */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val h = pmod(col(idCol) * 1103515245L + 45567L, lit(TextHash.P)) + 1L
    df.select(col(idCol).as("id"),
        col(weightCol).cast("long").as("weight"), h.as("h"))
      .withColumn("priority",
        (col("weight") * TextHash.P).cast("double") / col("h"))
      .orderBy(col("priority").desc, col("id"))
      .limit(k)
  }
}
