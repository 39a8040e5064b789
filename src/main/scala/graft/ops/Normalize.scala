package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group feature normalization — the numeric-cleaning counterpart of
  * the text-quality stack: before a column feeds a model (sampling rate,
  * quality weight, reward), it usually wants centering/scaling WITHIN its
  * group (per domain, per event type), not globally.
  *
  * Determinism contract (the hard part at scale): mean and variance come
  * from EXACT integer moments — each value quantizes to
  * `floor(x * 2^20)`, and Σq and Σq² accumulate as DECIMAL(38,0), which
  * Spark sums exactly (128-bit) in any partition order and DuckDB mirrors
  * in HUGEINT. The float mean/std are then ONE division / ONE sqrt from
  * those exact integers, so z-scores are bit-identical across runs,
  * partitionings, and engines — a naive double `avg`/`stddev` differs in
  * the last ulps under shuffle reordering and breaks hash-exact gates.
  *
  * Headroom: Σq² needs ~2·(digits(x)+6)+digits(n) < 38 decimal digits —
  * |x| < 1e9 with a trillion rows per group fits. For wider values drop
  * the quantization scale (the `q` parameter) accordingly.
  *
  * Cost shape: one hash-aggregate per group (map-side combinable — the
  * moments are sums), one broadcast-or-shuffle join back, one row-local
  * expression. The join side holds one row per group — broadcast it
  * unless groups number in the millions.
  */
object Normalize {

  private val Q = 1048576L // 2^20, same fixed-point scale as Similarity

  /** Attach `z` = (x - mean_g) / std_g (population std) to every row.
    * Zero-variance groups emit NULL z (no meaningful scale). Output: the
    * input columns + (n_group, z).
    *
    * @param broadcastMoments broadcast the one-row-per-group moments
    *        (default); set false when groups number in the millions and
    *        the join-back should shuffle instead */
  def zscore(
      df: DataFrame, groupCol: String, valCol: String,
      broadcastMoments: Boolean = true): DataFrame = {
    val qx = floor(col(valCol) * lit(Q.toDouble)).cast("decimal(38,0)")
    val moments = df
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_group"),
        sum(qx).as("__s1"),
        sum(qx * qx).as("__s2"))
    // num = n*s2 - s1^2 = n^2 * (population variance) * Q^2, exactly.
    val joined = df.join(
      if (broadcastMoments) broadcast(moments) else moments, groupCol)
    val n = col("n_group").cast("decimal(38,0)")
    val num = (n * col("__s2") - col("__s1") * col("__s1"))
    val mean = col("__s1").cast("double") /
      (col("n_group").cast("double") * lit(Q.toDouble))
    val std = sqrt(num.cast("double") /
      (col("n_group").cast("double") * col("n_group").cast("double") *
        lit((Q * Q).toDouble)))
    joined
      .withColumn("__num", num)
      .withColumn("z",
        when(col("__num") <= 0, lit(null).cast("double"))
          .otherwise((col(valCol) - mean) / std))
      .drop("__s1", "__s2", "__num")
  }

  /** Per-group IQR (Tukey-fence) outlier flags — the robust companion to
    * [[zscore]]: bounds from exact-interpolation quartiles
    * (`percentile`, which matches DuckDB's `quantile_cont` bit-for-bit —
    * proven by the percentile gates), so flags are engine-exact. Output:
    * input columns + (lo_bound, hi_bound, is_outlier) where
    * lo = q1 - factor·(q3-q1), hi = q3 + factor·(q3-q1).
    *
    * Cost: one per-group sort-based percentile aggregate (bounded by
    * group size), one join back (broadcast by default — same caveat and
    * knob as [[zscore]]). */
  def iqrOutliers(
      df: DataFrame, groupCol: String, valCol: String,
      factor: Double = 1.5, broadcastBounds: Boolean = true): DataFrame = {
    require(factor > 0.0, s"factor must be positive, got $factor")
    val b = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($valCol, 0.25)").as("__q1"),
        expr(s"percentile($valCol, 0.75)").as("__q3"))
      .select(col(groupCol),
        (col("__q1") - lit(factor) * (col("__q3") - col("__q1")))
          .as("lo_bound"),
        (col("__q3") + lit(factor) * (col("__q3") - col("__q1")))
          .as("hi_bound"))
    df.join(if (broadcastBounds) broadcast(b) else b, groupCol)
      .withColumn("is_outlier",
        col(valCol) < col("lo_bound") || col(valCol) > col("hi_bound"))
  }

  /** Per-group winsorization — clip values to the [pLo, pHi]
    * exact-interpolation percentiles of their group: the standard tail
    * treatment when outliers should be TAMED, not dropped
    * ([[iqrOutliers]] flags; this repairs). Output: input columns +
    * (clip_lo, clip_hi, winsorized).
    *
    * Engine-exact for the same reason as [[iqrOutliers]] (`percentile`
    * == DuckDB `quantile_cont` bit-for-bit; the clip itself is pure
    * comparison, no arithmetic on the value at all). Cost: one grouped
    * percentile aggregate + one broadcast join back (knob as
    * [[zscore]]). */
  def winsorize(
      df: DataFrame, groupCol: String, valCol: String,
      pLo: Double = 0.05, pHi: Double = 0.95,
      broadcastBounds: Boolean = true): DataFrame = {
    require(pLo >= 0.0 && pHi <= 1.0 && pLo < pHi,
      s"need 0 <= pLo < pHi <= 1, got ($pLo, $pHi)")
    val b = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($valCol, $pLo)").as("clip_lo"),
        expr(s"percentile($valCol, $pHi)").as("clip_hi"))
    df.join(if (broadcastBounds) broadcast(b) else b, groupCol)
      .withColumn("winsorized",
        when(col(valCol) < col("clip_lo"), col("clip_lo"))
          .when(col(valCol) > col("clip_hi"), col("clip_hi"))
          .otherwise(col(valCol)))
  }

  /** Per-group ROBUST z-score via median absolute deviation —
    * [[zscore]]'s outlier-resistant twin: mean/std move with the very
    * outliers being hunted, median/MAD do not.
    * robust_z = (x - median) / (scale · MAD), scale = 1.4826 (the
    * normal-consistency constant); zero-MAD groups emit NULL.
    *
    * Determinism: both medians are exact-interpolation percentiles
    * (`percentile` == DuckDB `quantile_cont` bit-for-bit) and the final
    * score is one fixed-shape float expression — engine-exact like
    * [[iqrOutliers]]. Cost: two grouped percentile aggregates (the MAD
    * needs the median first) + two joins back; same broadcast default
    * and knob as [[zscore]]. Output: input columns + (med, mad,
    * robust_z). */
  def robustZ(
      df: DataFrame, groupCol: String, valCol: String,
      scale: Double = 1.4826, broadcastStats: Boolean = true): DataFrame = {
    require(scale > 0.0, s"scale must be positive, got $scale")
    def bc(d: DataFrame) = if (broadcastStats) broadcast(d) else d
    val med = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($valCol, 0.5)").as("med"))
    val stats = df.join(bc(med), groupCol)
      .groupBy(col(groupCol), col("med"))
      .agg(expr(s"percentile(abs($valCol - med), 0.5)").as("mad"))
    df.join(bc(stats), groupCol)
      .withColumn("robust_z",
        when(col("mad") <= 0, lit(null).cast("double"))
          .otherwise((col(valCol) - col("med")) /
            (lit(scale) * col("mad"))))
  }

  /** Pairwise Pearson correlations over `cols`, long format
    * (col_x, col_y, n_rows, corr) for every i<j pair — the profiling
    * step before feature selection / redundancy pruning.
    *
    * Determinism contract (same discipline as [[zscore]]): every moment
    * (Σx, Σx², Σxy) accumulates EXACTLY — values quantize to
    * `floor(x·2^20)` and sum as DECIMAL(38,0) (HUGEINT in the DuckDB
    * mirror) — and each correlation is one fixed-shape float expression
    * over those exact integers, so results are bit-identical across
    * partitionings and engines. Note corr is computed on the QUANTIZED
    * values; quantization shifts Pearson r by O(2^-20/σ) — negligible
    * unless a column's spread is near the quantization step.
    *
    * Cost: ONE pass — a single aggregate row carries all m + m(m-1)/2
    * moment sums (map-side combinable); the per-pair projection reads
    * that localCheckpointed row, never the corpus. Rows with a NULL in
    * any of `cols` are dropped (pairwise-complete would need per-pair
    * counts; this is the simpler listwise contract). Headroom: needs
    * n·(max|x|·2^20)² < 10^38 — fine for |x| < 10^7 at a billion rows;
    * lower the quantization scale for wider values. */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need >= 2 columns, got ${cols.size}")
    require(cols.distinct.size == cols.size, "columns must be distinct")
    def qz(c: String) = floor(col(c) * lit(Q.toDouble)).cast("decimal(38,0)")
    val pairs = for {
      i <- cols.indices; j <- i + 1 until cols.size
    } yield (cols(i), cols(j))
    val aggs = Seq(count(lit(1)).as("n")) ++
      cols.flatMap(c => Seq(sum(qz(c)).as(s"__s_$c"),
        sum(qz(c) * qz(c)).as(s"__ss_$c"))) ++
      pairs.map { case (a, b) => sum(qz(a) * qz(b)).as(s"__sp_${a}__$b") }
    val m = df.na.drop(cols).agg(aggs.head, aggs.tail: _*).localCheckpoint()
    pairs.map { case (a, b) =>
      val n = col("n").cast("decimal(38,0)")
      val num = n * col(s"__sp_${a}__$b") - col(s"__s_$a") * col(s"__s_$b")
      val dx = n * col(s"__ss_$a") - col(s"__s_$a") * col(s"__s_$a")
      val dy = n * col(s"__ss_$b") - col(s"__s_$b") * col(s"__s_$b")
      m.select(lit(a).as("col_x"), lit(b).as("col_y"),
        col("n").as("n_rows"),
        when(dx <= 0 || dy <= 0, lit(null).cast("double"))
          .otherwise(num.cast("double") /
            sqrt(dx.cast("double") * dy.cast("double"))).as("corr"))
    }.reduce(_ unionByName _)
  }

  /** One-way ANOVA F-statistic of `valCol` across `groupCol` levels —
    * "does the group affect the mean at all?", the continuous-outcome
    * companion to [[graft.ops.Profile.chiSquare]]. Emits one row:
    * (k, n_rows, ssb, ssw, f_stat); `f_stat` is NULL for degenerate
    * designs (k < 2, n <= k, or zero within-group variance).
    *
    * Determinism: per-group moments (n_g, Σq, Σq²) are EXACT (the
    * [[zscore]] quantization — values scale by 2^20 and sum as
    * DECIMAL(38,0)/HUGEINT; F is scale-invariant so quantization only
    * shifts the statistic by O(2^-20/σ)); each group's SSB/SSW terms are
    * fixed-shape floats over those exact integers; and the cross-group
    * totals are STRICT SORTED FOLDS (the [[graft.ops.Profile.chiSquare]]
    * discipline) — bit-identical across partitionings and engines.
    * Cost: one grouped aggregate + an O(k) fold; nulls drop. */
  def anovaF(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val qz = floor(col(valCol) * lit(Q.toDouble)).cast("decimal(38,0)")
    val cells = df.na.drop(Seq(groupCol, valCol))
      .groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("ng"), sum(qz).as("s"), sum(qz * qz).as("ss"))
    val packed = cells.agg(
      sort_array(collect_list(struct(col("g"), col("ng"),
        col("s").cast("double").as("sd"),
        col("ss").cast("double").as("ssd")))).as("cs"),
      count(lit(1)).as("k"), sum(col("ng")).as("n"),
      sum(col("s")).as("st"))
    val ssb = aggregate(col("cs"), lit(0.0), (acc, x) =>
      acc + x.getField("sd") * x.getField("sd") /
        x.getField("ng").cast("double")) -
      col("st").cast("double") * col("st").cast("double") /
        col("n").cast("double")
    val ssw = aggregate(col("cs"), lit(0.0), (acc, x) =>
      acc + (x.getField("ssd") - x.getField("sd") * x.getField("sd") /
        x.getField("ng").cast("double")))
    packed.select(col("k"), col("n").as("n_rows"),
        ssb.as("ssb"), ssw.as("ssw"))
      .withColumn("f_stat",
        when(col("k") < 2 || col("n_rows") <= col("k") || col("ssw") <= 0,
          lit(null).cast("double"))
          .otherwise((col("ssb") / (col("k") - 1).cast("double")) /
            (col("ssw") / (col("n_rows") - col("k")).cast("double"))))
  }

  /** The DuckDB mirror of [[zscore]]'s arithmetic, for oracle authoring:
    * identical quantization, exact HUGEINT moments, identical float
    * expression shape. `table` must expose `$groupCol` and `$valCol`. */
  def zscoreSql(
      table: String, groupCol: String, valCol: String,
      outCols: String): String = {
    val qx = s"CAST(floor($valCol * $Q.0) AS HUGEINT)"
    s"WITH mo AS (SELECT $groupCol, count(*) AS n_group, " +
      s"sum($qx) AS s1, sum($qx * $qx) AS s2 FROM $table GROUP BY $groupCol), " +
      s"j AS (SELECT t.*, mo.n_group, " +
      "mo.n_group * mo.s2 - mo.s1 * mo.s1 AS num, " +
      s"CAST(mo.s1 AS DOUBLE) / (CAST(mo.n_group AS DOUBLE) * $Q.0) AS mean, " +
      "sqrt(CAST(mo.n_group * mo.s2 - mo.s1 * mo.s1 AS DOUBLE) / " +
      s"(CAST(mo.n_group AS DOUBLE) * CAST(mo.n_group AS DOUBLE) * ${Q * Q}.0)) " +
      s"AS std FROM $table t JOIN mo USING ($groupCol)) " +
      s"SELECT $outCols, CASE WHEN num <= 0 THEN NULL " +
      s"ELSE ($valCol - mean) / std END AS z FROM j"
  }

  /** Per-group quantile normalization: map each value to its empirical
    * quantile rank `(rn − 1)/(n − 1)` ∈ [0, 1] — the rank-based feature
    * transform that is immune to outliers and monotone re-scalings
    * (the [[zscore]] alternative when the distribution is unknown).
    * Ties break by `idCol`, so the output is unique however the data
    * arrives; a 1-row group maps to NULL (no rank span). Only ORDER
    * matters, so no quantization is needed and the result is exact:
    * integers until one final division.
    *
    * Scale: one window partitioned by group (per-group sort — the
    * distribution across groups is Spark's shuffle; no global sort).
    * Output: one row per input row. */
  def quantileNormalize(
      df: DataFrame, groupCol: String, valueCol: String, idCol: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol).asc, col(idCol).asc)
    df.where(col(valueCol).isNotNull)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n",
        count(lit(1)).over(Window.partitionBy(col(groupCol))))
      .select(col(idCol), col(groupCol), col(valueCol),
        when(col("__n") === 1L, lit(null).cast("double"))
          .otherwise((col("__rn") - 1L).cast("double") /
            (col("__n") - 1L).cast("double")).as("qn"))
  }

  /** Per-group Gini concentration of a NON-NEGATIVE integral value —
    * "how dominated is this group by its heaviest members?" (corpus
    * concentration per language, revenue concentration per segment;
    * 0 = perfectly even, → 1 = one member holds everything). The
    * gateable form: ranks are assigned in the fixed (value, id) order,
    * so the statistic is the classic `(2·Σ i·xᵢ − (n+1)·Σx)/(n·Σx)`
    * evaluated on a unique permutation — identical to the standard
    * definition (which is tie-order-invariant) and deterministic.
    *
    * Exactness: every moment (n, Σx, Σ i·xᵢ) is an exact BIGINT — ONE
    * final division. Overflow bound: `n·Σx` and `2·Σ i·xᵢ` must fit
    * BIGINT (n·max(x) < ~3e9 per group at BIGINT scale — quantize
    * coarser for larger groups; ANSI mode fails loud, never silently
    * wraps). Zero-sum or empty groups yield NULL.
    *
    * Scale: one per-group sort window + one map-side-combinable
    * aggregate; output is O(groups). */
  def gini(
      df: DataFrame, groupCol: String, valueCol: String, idCol: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__x").asc, col(idCol).asc)
    df.where(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol).cast("long").as("__x"),
        col(idCol))
      .withColumn("__rn", row_number().over(w).cast("long"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"), sum(col("__x")).as("__s"),
        sum(col("__rn") * col("__x")).as("__t"))
      .select(col(groupCol), col("n_rows"),
        when(col("__s") <= 0L, lit(null).cast("double"))
          .otherwise(
            (lit(2L) * col("__t") - (col("n_rows") + 1L) * col("__s"))
              .cast("double") /
              (col("n_rows") * col("__s")).cast("double")).as("gini"))
  }

  /** Per-group Lorenz decile table over unit masses — [[gini]]'s
    * readable companion: units (users, domains) rank into `buckets`
    * equal-count bins by total mass, and each bin reports its exact
    * mass, share, and cumulative share ("the top decile of users
    * produces X% of this event type's volume"). SQL-standard ntile over
    * the deterministic (mass, unit) order pins every boundary.
    *
    * Exactness: unit totals, bin sums, the group total, and the running
    * cumulative are all exact BIGINTs (window sums of longs); share and
    * cum_share are ONE division each. Output:
    * (groupCol, bucket, n_units, bucket_sum, share, cum_share).
    *
    * Scale: NO per-group window over the units. The bucket id is exact
    * SQL-`ntile` semantics reproduced arithmetically from an exact
    * per-group rank: range-partition on (group, mass, unit) → per-
    * partition row_number at full parallelism → broadcast exclusive
    * prefix offsets (#partitions driver rows) → global rank; the
    * group-start rank and group size come from one O(groups) aggregate
    * broadcast back, and `bucket = ntile(rank, n, b)` is pure row-local
    * arithmetic (first `n mod b` bins take the extra row — the SQL
    * remainder convention). A skewed group spreads across range
    * partitions instead of funnelling one reducer (the liftDeciles
    * discipline, [[graft.ops.Profile.liftDeciles]]). */
  def lorenz(
      df: DataFrame, groupCol: String, unitCol: String, valueCol: String,
      buckets: Int): DataFrame = {
    require(buckets > 1, s"buckets must exceed 1, got $buckets")
    import org.apache.spark.sql.expressions.Window
    val units = df.where(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(unitCol))
      .agg(sum(col(valueCol).cast("long")).as("__x"))
    // localCheckpoint, not persist: the counts collect and the binned
    // materialization must see the SAME sampled range boundaries — a
    // cache can evict between the two jobs and re-sample (see
    // RankEval.averagePrecision, found at the 10× probe).
    val parted = units
      .repartitionByRange(col(groupCol), col("__x"), col(unitCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val binned = try {
      val counts = parted.groupBy(col("__pid"))
        .agg(count(lit(1)).as("__c"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      val offsets = counts.map(_._1)
        .zip(counts.map(_._2).scanLeft(0L)(_ + _).init).toSeq
      val offDf = parted.sparkSession
        .createDataFrame(offsets).toDF("__pid", "__off")
      val ranked = parted.join(broadcast(offDf), "__pid")
        .withColumn("__g", col("__off") + row_number().over(
          Window.partitionBy(col("__pid"))
            .orderBy(col(groupCol), col("__x"), col(unitCol))))
      val starts = ranked.groupBy(col(groupCol))
        .agg(min(col("__g")).as("__g0"), count(lit(1)).as("__n"))
      // per-group 1-based rank, then SQL ntile's remainder convention:
      // sizes are q+1 for the first (n mod b) buckets, q for the rest
      // (integral `div` keeps every step exact BIGINT — `/` on longs
      // would detour through IEEE doubles)
      ranked.join(broadcast(starts), groupCol)
        .withColumn("__r", col("__g") - col("__g0") + 1L)
        .withColumn("bucket", expr(
          s"""CAST(CASE
             |  WHEN __r <= (__n % $buckets) * ((__n div $buckets) + 1)
             |  THEN (__r - 1) div ((__n div $buckets) + 1) + 1
             |  ELSE (__n % $buckets) +
             |    (__r - (__n % $buckets) * ((__n div $buckets) + 1) - 1)
             |      div (__n div $buckets) + 1
             |END AS BIGINT)""".stripMargin))
        .groupBy(col(groupCol), col("bucket"))
        .agg(count(lit(1)).as("n_units"), sum(col("__x")).as("bucket_sum"))
        .localCheckpoint()
    } finally {
      org.apache.spark.sql.GraftSql.freeLocalCheckpoint(parted); ()
    }
    val whole = Window.partitionBy(col(groupCol))
    val cum = Window.partitionBy(col(groupCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    binned
      .withColumn("__t", sum(col("bucket_sum")).over(whole))
      .withColumn("__c", sum(col("bucket_sum")).over(cum))
      .select(col(groupCol), col("bucket"), col("n_units"),
        col("bucket_sum"),
        when(col("__t") === 0L, lit(null).cast("double"))
          .otherwise(col("bucket_sum").cast("double") /
            col("__t").cast("double")).as("share"),
        when(col("__t") === 0L, lit(null).cast("double"))
          .otherwise(col("__c").cast("double") / col("__t").cast("double"))
          .as("cum_share"))
  }

  /** Per-group Herfindahl–Hirschman concentration of a POSITIVE integral
    * mass over units — the antitrust-style "how concentrated is this
    * market" statistic, applied to data-pipeline questions like "is one
    * user/domain producing most of this event type's volume?".
    * `HHI = Σ_u (x_u/S)² = Σx²/S²` (1/n = even, 1 = monopolized) plus
    * the n-corrected `hhi_norm = (n·Σx² − S²)/(S²·(n−1))` in [0,1].
    *
    * Exactness: unit totals and the cross-moments (n, S=Σx, SS=Σx²)
    * accumulate as DECIMAL(38,0) (Spark 128-bit exact sums, DuckDB
    * HUGEINT) in any partition order; the statistics are then fixed
    * IEEE expression trees over those exact integers, identical in both
    * engines. Units with non-positive total mass are dropped (shares
    * are undefined); single-unit groups emit NULL hhi_norm.
    *
    * Scale: two map-side-combinable hash aggregates (unit totals, then
    * group moments); no sort, no window, output O(groups). */
  def herfindahl(
      df: DataFrame, groupCol: String, unitCol: String, valueCol: String)
      : DataFrame = {
    val units = df.where(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(unitCol))
      .agg(sum(col(valueCol).cast("long")).as("__x"))
      .where(col("__x") > 0L)
    val qx = col("__x").cast("decimal(38,0)")
    val g = units.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_units"),
        sum(qx).as("__s"), sum(qx * qx).as("__ss"))
    val nD = col("n_units").cast("double")
    val sD = col("__s").cast("double")
    val ssD = col("__ss").cast("double")
    g.select(col(groupCol), col("n_units"),
      (ssD / (sD * sD)).as("hhi"),
      when(col("n_units") === 1L, lit(null).cast("double"))
        .otherwise((nD * ssD - sD * sD) / ((sD * sD) * (nD - lit(1.0))))
        .as("hhi_norm"))
  }

  /** Per-group Theil T inequality index of a POSITIVE integral mass over
    * units: `T = (1/n)·Σ (x/μ)·ln(x/μ)` (0 = perfectly even,
    * ln n = maximal). The between/within-decomposable complement of
    * [[gini]] — the index a mixture-balancing pipeline monitors per
    * domain.
    *
    * Determinism (the libm hazard): the per-unit log quantizes FIRST —
    * `lq = floor(ln(x·n/S) · 2^20)` evaluated on one fixed IEEE
    * expression shape — and only then enters the sum, which is the
    * EXACT integer `Σ x·lq` in DECIMAL(38,0)/HUGEINT, so the total is
    * partition-order-independent and `T = Σx·lq / (S·2^20)` is ONE
    * final division. This is the [[graft.ops.TextAnalysis.unigramLogProb]]
    * fixed-point discipline; quantization bias is ≤ 2⁻²⁰ per unit,
    * uniform across engines.
    *
    * Scale: two hash aggregates plus one broadcast join of the O(groups)
    * stats row back onto unit totals; no sort, no collect. */
  def theil(
      df: DataFrame, groupCol: String, unitCol: String, valueCol: String)
      : DataFrame = {
    val units = df.where(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(unitCol))
      .agg(sum(col(valueCol).cast("long")).as("__x"))
      .where(col("__x") > 0L)
    val g = units.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_units"),
        sum(col("__x").cast("decimal(38,0)")).as("__s"))
    val lq = floor(
      log(col("__x").cast("double") * col("n_units").cast("double") /
        col("__s").cast("double")) * lit(1048576.0)).cast("long")
    units.join(broadcast(g), groupCol)
      .withColumn("__lq", lq)
      .groupBy(col(groupCol))
      .agg(first(col("n_units")).as("n_units"),
        first(col("__s")).as("__s2"),
        sum(col("__x").cast("decimal(38,0)") *
          col("__lq").cast("decimal(38,0)")).as("__num"))
      .select(col(groupCol), col("n_units"),
        (col("__num").cast("double") /
          (col("__s2").cast("double") * lit(1048576.0))).as("theil_t"))
  }
}
