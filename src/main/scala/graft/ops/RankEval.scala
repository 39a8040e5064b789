package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking / classifier evaluation metrics over a scored corpus — the
  * offline-eval reads a training-data pipeline runs after building a
  * retrieval index or scoring model (reference scope: quick-stream feeds
  * scored event streams into relational sinks; these are the standard
  * quality reads over such a table).
  *
  * Determinism discipline (the driver hash-compares against DuckDB):
  * every metric accumulates in EXACT integer space — log-discount weights
  * are driver-computed scaled-long literals shared verbatim with the
  * oracle (the benford precedent), reciprocal ranks and precision@k are
  * floor-scaled integer divisions — and only the final metric performs
  * one double division. No float sum ever crosses a shuffle.
  */
object RankEval {

  /** 1e8-scaled DCG discount weights 1/log2(i+1) for ranks 1..k —
    * computed once on the driver, embedded as literals in BOTH engines
    * (libm log2 is not guaranteed correctly rounded across engines, a
    * driver literal is). */
  def dcgWeightsScaled(k: Int): Seq[Long] =
    (1 to k).map(i => math.round(1e8 / (math.log(i + 1.0) / math.log(2.0))))

  /** Prefix sums of [[dcgWeightsScaled]] — the ideal-DCG lookup table:
    * idcg(p) = prefix(min(p, k)) when the query holds p relevant rows. */
  def idcgPrefixScaled(k: Int): Seq[Long] =
    dcgWeightsScaled(k).scanLeft(0L)(_ + _).tail

  /** NDCG@k per query group, binary gain. One shuffle on the query key
    * (the rank window and the aggregate share the partitioning): rank
    * within query by (score DESC, tie ASC), DCG = Σ w(rank)·y over the
    * top k as an exact scaled-long sum, IDCG = prefix-sum lookup on
    * min(n_pos, k). Scales: per-query windows, no global sort, no
    * driver data path. */
  def ndcgAtK(df: DataFrame, queryCol: Column, scoreCol: Column,
      tieCol: Column, relevantCol: Column, k: Int = 10): DataFrame = {
    require(k >= 1 && k <= 100, s"k must be in [1,100], got $k")
    val w = dcgWeightsScaled(k)
    val prefix = idcgPrefixScaled(k)
    val base = df.select(queryCol.as("__q"),
        scoreCol.cast("double").as("__s"), tieCol.as("__id"),
        when(relevantCol, 1L).otherwise(0L).as("__y"))
      .where(col("__s").isNotNull)
    val rn = row_number().over(
      Window.partitionBy(col("__q")).orderBy(col("__s").desc, col("__id")))
    base.withColumn("__rn", rn)
      .groupBy(col("__q").as("query"))
      .agg(count(lit(1)).as("n"),
        sum(col("__y")).as("n_pos"),
        coalesce(sum(when(col("__rn") <= k && col("__y") === 1L,
          element_at(array(w.map(lit): _*), col("__rn").cast("int")))),
          lit(0L)).as("dcg_scaled"))
      .withColumn("idcg_scaled",
        when(col("n_pos") > 0L,
          element_at(array(prefix.map(lit): _*),
            least(col("n_pos"), lit(k.toLong)).cast("int"))))
      .withColumn("ndcg",
        when(col("n_pos") > 0L,
          col("dcg_scaled").cast("double") /
            col("idcg_scaled").cast("double")))
  }

  /** Mean reciprocal rank over query groups: rank within query by
    * (score DESC, tie ASC), take the first relevant row's rank, sum
    * floor(1e6 / rank) exactly, divide once (1e6 scale keeps the sum
    * inside BIGINT even at 1e12 queries). Queries with no relevant
    * row are excluded (standard MRR). One row out. */
  def meanReciprocalRank(df: DataFrame, queryCol: Column, scoreCol: Column,
      tieCol: Column, relevantCol: Column): DataFrame = {
    val base = df.select(queryCol.as("__q"),
        scoreCol.cast("double").as("__s"), tieCol.as("__id"),
        when(relevantCol, 1L).otherwise(0L).as("__y"))
      .where(col("__s").isNotNull)
    val rn = row_number().over(
      Window.partitionBy(col("__q")).orderBy(col("__s").desc, col("__id")))
    base.withColumn("__rn", rn)
      .where(col("__y") === 1L)
      .groupBy(col("__q"))
      .agg(min(col("__rn").cast("long")).as("__first"))
      .agg(count(lit(1)).as("n_queries"),
        coalesce(sum(expr("1000000 div __first")), lit(0L))
          .as("sum_recip_scaled"))
      .withColumn("mrr",
        when(col("n_queries") > 0L,
          col("sum_recip_scaled").cast("double") /
            (col("n_queries").cast("double") * 1e6)))
  }

  /** Average precision (area under the precision–recall curve, step
    * interpolation): global rank by (score DESC, tie ASC) — built
    * COLUMNARLY (range partitions + per-partition windows + a broadcast
    * exclusive prefix of partition counts, never a 1-partition sort) —
    * then AP = Σ_{relevant k} floor(1e6·cum_pos(k)/k) / (1e6·n_pos)
    * (1e6 scale: 1e6·cum_pos stays inside BIGINT at 1e12 rows).
    * One row out; the only driver traffic is one count per partition. */
  def averagePrecision(df: DataFrame, scoreCol: Column, tieCol: Column,
      relevantCol: Column): DataFrame = {
    val base = df.select(when(relevantCol, 1L).otherwise(0L).as("__y"),
        scoreCol.cast("double").as("__s"), tieCol.as("__id"))
      .where(col("__s").isNotNull)
    // negate the score so ascending range order = score DESC, id ASC.
    // localCheckpoint, NOT persist, and the result MATERIALIZES before
    // the checkpoint is freed: the range boundaries come from a
    // sampling pass whose seed changes per recompute, so any consumer
    // that re-evaluates `parted` (the old finally-unpersist freed the
    // cache BEFORE the caller ran the returned lazy plan — every
    // caller re-sampled!) pairs fresh boundaries with the previously
    // collected offsets and the reconstructed global ranks are
    // silently wrong. Seen live at the 10× scale probe: per-call
    // nondeterminism in the final AP. Checkpointing pins the rows AND
    // the partitioning for every downstream consumer.
    val parted = base.withColumn("__ns", -col("__s"))
      .repartitionByRange(col("__ns"), col("__id"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    try {
      val counts = parted.groupBy(col("__pid"))
        .agg(count(lit(1)).as("__c"), sum(col("__y")).as("__p"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      val offsets = counts.map(_._1)
        .lazyZip(counts.map(_._2).scanLeft(0L)(_ + _).init)
        .lazyZip(counts.map(_._3).scanLeft(0L)(_ + _).init)
        .map((pid, off, posOff) => (pid, off, posOff))
      val offDf = parted.sparkSession.createDataFrame(offsets.toSeq)
        .toDF("__pid", "__off", "__posOff")
      val w = Window.partitionBy(col("__pid"))
        .orderBy(col("__ns"), col("__id"))
      val ranked = parted.join(broadcast(offDf), "__pid")
        .withColumn("__rank", col("__off") + row_number().over(w))
        .withColumn("__cumpos", col("__posOff") +
          sum(col("__y")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      ranked.where(col("__y") === 1L)
        .agg(count(lit(1)).as("n_pos"),
          coalesce(sum(expr("(1000000 * __cumpos) div __rank")), lit(0L))
            .as("sum_prec_scaled"))
        .withColumn("avg_precision",
          when(col("n_pos") > 0L,
            col("sum_prec_scaled").cast("double") /
              (col("n_pos").cast("double") * 1e6)))
        .localCheckpoint() // one row: force NOW, while parted is alive
    } finally org.apache.spark.sql.GraftSql.freeLocalCheckpoint(parted)
  }

  /** Full binary-classifier readout in ONE scan: the 2×2 confusion
    * counts plus accuracy, precision, recall, F1, Cohen's kappa and MCC
    * — each a fixed-shape IEEE expression over the exact BIGINT counts
    * (kappa and MCC stay in doubles: the integer n² form would overflow
    * BIGINT past ~3e9 rows; a fixed expression tree of correctly-rounded
    * IEEE ops is deterministic across engines). */
  def classifierEval(df: DataFrame, predCol: Column, actualCol: Column)
      : DataFrame = {
    val d = (c: Column) => c.cast("double")
    df.agg(
        coalesce(sum(when(predCol && actualCol, 1L).otherwise(0L)), lit(0L))
          .as("tp"),
        coalesce(sum(when(predCol && !actualCol, 1L).otherwise(0L)), lit(0L))
          .as("fp"),
        coalesce(sum(when(!predCol && actualCol, 1L).otherwise(0L)), lit(0L))
          .as("fn"),
        coalesce(sum(when(!predCol && !actualCol, 1L).otherwise(0L)), lit(0L))
          .as("tn"))
      .withColumn("n", col("tp") + col("fp") + col("fn") + col("tn"))
      .withColumn("accuracy",
        when(col("n") > 0L, d(col("tp") + col("tn")) / d(col("n"))))
      .withColumn("precision",
        when(col("tp") + col("fp") > 0L,
          d(col("tp")) / d(col("tp") + col("fp"))))
      .withColumn("recall",
        when(col("tp") + col("fn") > 0L,
          d(col("tp")) / d(col("tp") + col("fn"))))
      .withColumn("f1",
        when(lit(2L) * col("tp") + col("fp") + col("fn") > 0L,
          (lit(2.0) * d(col("tp"))) /
            d(lit(2L) * col("tp") + col("fp") + col("fn"))))
      .withColumn("kappa", {
        val po = d(col("tp") + col("tn")) / d(col("n"))
        val pe = (d(col("tp") + col("fp")) / d(col("n"))) *
          (d(col("tp") + col("fn")) / d(col("n"))) +
          (d(col("fn") + col("tn")) / d(col("n"))) *
          (d(col("fp") + col("tn")) / d(col("n")))
        when(col("n") > 0L, when(pe < 1.0, (po - pe) / (lit(1.0) - pe)))
      })
      .withColumn("mcc", {
        val den = sqrt(d(col("tp") + col("fp"))) *
          sqrt(d(col("tp") + col("fn"))) *
          sqrt(d(col("tn") + col("fp"))) *
          sqrt(d(col("tn") + col("fn")))
        when(den > 0.0,
          (d(col("tp")) * d(col("tn")) - d(col("fp")) * d(col("fn"))) / den)
      })
  }

  /** Isotonic calibration (PAV) over score bins — the nonparametric
    * monotone fit of positive-rate against score, THE standard
    * recalibration map when q_calibration shows a miscalibrated model.
    *
    * Algorithm: the pool-adjacent-violators solution is computed by its
    * exact minimax characterization
    * fit(k) = min_{j≥k} max_{i≤k} (pos(i..j) / n(i..j)) — no stack, no
    * sequential merge cascade, so it runs as nested higher-order folds
    * over the ≤`binCap` NONEMPTY score bins after one grouped
    * aggregate. All comparisons are exact cross-multiplications in
    * DECIMAL(38,0) (the rationals never touch a double until the final
    * rate), so the DuckDB replay (HUGEINT) agrees bit-for-bit.
    *
    * Scale: the corpus collapses to one bounded bin profile (map-side
    * combinable shuffle, one output row per nonempty bin); the O(K³)
    * minimax runs on a single packed row. Output per nonempty bin:
    * (bin, n, n_pos, iso_num, iso_den, iso_rate), iso_rate
    * non-decreasing in bin. */
  def isotonicCalibration(df: DataFrame, scoreBin: Column,
      relevantCol: Column, binCap: Int = 64): DataFrame = {
    val bins = df
      .select(scoreBin.cast("long").as("__b"),
        when(relevantCol, 1L).otherwise(0L).as("__y"))
      .where(col("__b").isNotNull)
      .groupBy(least(col("__b"), lit(binCap.toLong - 1L)).as("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("pos"))
    val packed = bins
      .agg(sort_array(collect_list(struct(col("bin"), col("n"),
        col("pos")))).as("bs"))
      .withColumn("bins", expr("transform(bs, x -> x.bin)"))
      .withColumn("ns", expr("transform(bs, x -> x.n)"))
      .withColumn("ps", expr("transform(bs, x -> x.pos)"))
      .withColumn("kk", expr("size(bs)"))
      // Spark sequence(1, 0) DESCENDS instead of being empty — an empty
      // profile must drop out before any sequence(1, kk) is built
      .where(col("kk") > 0)
      .localCheckpoint()
    val prefixed = packed
      .withColumn("cw", expr("transform(sequence(1, kk), " +
        "j -> aggregate(slice(ns, 1, j), 0L, (a, x) -> a + x))"))
      .withColumn("cp", expr("transform(sequence(1, kk), " +
        "j -> aggregate(slice(ps, 1, j), 0L, (a, x) -> a + x))"))
      .localCheckpoint()
    val dd = (s: String) => s"CAST($s AS DECIMAL(38,0))"
    val num = "(element_at(cp, j) - IF(i > 1, element_at(cp, i - 1), 0L))"
    val den = "(element_at(cw, j) - IF(i > 1, element_at(cw, i - 1), 0L))"
    // max over i ≤ k of the rational (num/den) for a fixed j; sentinel
    // (-1, 1) loses to every candidate (num ≥ 0, den ≥ 1)
    val ratMax =
      s"aggregate(sequence(1, k), array(-1L, 1L), (m, i) -> " +
        s"IF(${dd(num)} * ${dd("element_at(m, 2)")} > " +
        s"${dd("element_at(m, 1)")} * ${dd(den)}, array($num, $den), m))"
    // min over j ≥ k of those maxima; sentinel den = 0 marks empty
    val fit =
      s"transform(sequence(1, kk), k -> " +
        s"aggregate(sequence(k, kk), array(-1L, 0L), (mm, j) -> " +
        s"IF(element_at(mm, 2) = 0L, $ratMax, " +
        s"IF(${dd(s"element_at($ratMax, 1)")} * " +
        s"${dd("element_at(mm, 2)")} < " +
        s"${dd("element_at(mm, 1)")} * " +
        s"${dd(s"element_at($ratMax, 2)")}, $ratMax, mm))))"
    prefixed
      .withColumn("fit", expr(fit))
      .localCheckpoint()
      .select(col("bins"), col("ns"), col("ps"),
        posexplode(col("fit")).as(Seq("__i", "__f")))
      .select(
        expr("element_at(bins, __i + 1)").as("bin"),
        expr("element_at(ns, __i + 1)").as("n"),
        expr("element_at(ps, __i + 1)").as("n_pos"),
        expr("element_at(__f, 1)").as("iso_num"),
        expr("element_at(__f, 2)").as("iso_den"))
      .withColumn("iso_rate",
        col("iso_num").cast("double") / col("iso_den").cast("double"))
  }

  /** Expected calibration error over equal-width probability bins.
    * `probMicroCol` is the claimed probability in exact micro-units
    * (0..1e6 BIGINT). Per bin the weighted |observed − claimed| gap
    * reduces to |n_pos·1e6 − Σ p_micro| — an exact integer — so
    * ECE = Σ_bins |…| / (N·1e6) is one final division. */
  def expectedCalibrationError(df: DataFrame, probMicroCol: Column,
      relevantCol: Column, nBins: Int = 20): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val base = df.select(probMicroCol.cast("long").as("__pm"),
        when(relevantCol, 1L).otherwise(0L).as("__y"))
      .where(col("__pm").isNotNull)
    base
      .groupBy(least(expr(s"(__pm * $nBins) div 1000000"),
        lit(nBins - 1L)).as("__bin"))
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__np"),
        sum(col("__pm")).as("__sp"))
      .agg(coalesce(sum(col("__n")), lit(0L)).as("n"),
        count(lit(1)).as("n_bins_used"),
        coalesce(sum(abs(col("__np") * lit(1000000L) - col("__sp"))),
          lit(0L)).as("ece_num"))
      .withColumn("ece",
        when(col("n") > 0L,
          col("ece_num").cast("double") /
            (col("n").cast("double") * 1e6)))
  }
}
