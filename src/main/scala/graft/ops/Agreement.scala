package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inter-annotator agreement and preference-aggregation operators — the
  * QA layer of a labeling/RLHF data pipeline. A corpus labeled by N
  * annotators (human or LLM judges) needs: chance-corrected agreement
  * (Cohen's κ for two raters, Fleiss' κ for fixed panels, Krippendorff's
  * α when raters abstain), majority-vote gold derivation with a
  * deterministic tie posture, per-rater quality against the consensus,
  * and pairwise-preference aggregation (Copeland / Borda — the voting
  * rules behind preference-data leaderboards).
  *
  * All statistics are computed as EXACT INTEGER rationals (numerator /
  * denominator BIGINT columns) from contingency counts, so a DuckDB
  * oracle replays them bit-for-bit — no float aggregation order
  * sensitivity anywhere. Long-capacity audit (worst factor is Fleiss'
  * κ numerator A·D ≤ N·m²·(N·m)²): safe through sf1 panels of 5×10⁶
  * ratings; beyond that the same plans lift to DECIMAL(38,0)/HUGEINT
  * unchanged.
  *
  * Scale shape: every operator is one contingency aggregate (item- or
  * label-keyed shuffle) followed by arithmetic over a ≤ k² grid — the
  * corpus is touched once, the statistics cost O(labels²) driver-free
  * rows. Reference scope: the reference engine (quick-stream) has no
  * annotation layer; this family is part of the mandated
  * beyond-parity LLM-pipeline surface.
  */
object Agreement {

  /** The synthetic annotation panel: label universe (sorted), hash
    * constants, and per-rater accuracy ramp — shared verbatim by the
    * Spark fixture expressions and the DuckDB oracle generators below
    * so the two sides cannot drift. */
  val Labels: Seq[String] = Seq("click", "error", "purchase", "signup", "view")
  val HashA = 1103515245L
  val HashB = 784588716L
  val HashC = 45567L
  val HashP = 1000000007L
  /** rater r is correct when h%100 < AccBase + AccStep*r. */
  val AccBase = 60L
  val AccStep = 5L
  /** rater abstains (Krippendorff fixture only) when (h div 10000) % AbstainMod == 0. */
  val AbstainMod = 11L

  private def labelIdx(c: Column): Column =
    Labels.zipWithIndex.tail.foldLeft(when(c === Labels.head, 0L)) {
      case (acc, (l, i)) => acc.when(c === l, i.toLong)
    }

  /** Exact integer division for non-negative Longs < 2^52 (the quotient
    * numerator is made exactly divisible, so the one double division is
    * exact). */
  private def ldiv(c: Column, d: Long): Column =
    ((c - pmod(c, lit(d))) / lit(d)).cast("long")

  /** Deterministic per-(item, rater) hash over `event_id`. */
  def raterHash(r: Int): Column =
    pmod(col("event_id") * lit(HashA) + lit(r.toLong * HashB + HashC), lit(HashP))

  /** Synthetic rater r's label for an events row: correct with
    * probability (AccBase + AccStep·r)%, else a deterministically
    * chosen different label. */
  def raterLabel(r: Int): Column = {
    val h = raterHash(r)
    val ti = labelIdx(col("event_type"))
    val wi = pmod(ti + lit(1L) + pmod(ldiv(h, 100L), lit(4L)), lit(5L))
    when(pmod(h, lit(100L)) < lit(AccBase + AccStep * r),
      col("event_type"))
      .otherwise(element_at(array(Labels.map(lit): _*), (wi + 1L).cast("int")))
  }

  /** `raterLabel` with abstentions — NULL when the rater skipped the
    * item (the Krippendorff missing-data regime). */
  def raterLabelOrNull(r: Int): Column = {
    val h = raterHash(r)
    when(pmod(ldiv(h, 10000L), lit(AbstainMod)) === 0L, lit(null).cast("string"))
      .otherwise(raterLabel(r))
  }

  // ---- DuckDB twins of the fixture expressions --------------------------

  /** SQL for raterHash(r) over `event_id`. */
  def raterHashSql(r: Int): String =
    s"((event_id * $HashA + ${r.toLong * HashB + HashC}) % $HashP)"

  /** SQL for raterLabel(r) (DuckDB `//` is Spark's `div` here: operands
    * are non-negative). */
  def raterLabelSql(r: Int): String = {
    val h = raterHashSql(r)
    val labelList = Labels.map(l => s"'$l'").mkString("[", ", ", "]")
    val ti = Labels.zipWithIndex
      .map { case (l, i) => s"WHEN event_type = '$l' THEN $i" }
      .mkString("CASE ", " ", " END")
    s"CASE WHEN $h % 100 < ${AccBase} + ${AccStep} * $r THEN event_type " +
      s"ELSE list_extract($labelList, " +
      s"CAST((($ti) + 1 + ($h // 100) % 4) % 5 + 1 AS INT)) END"
  }

  /** SQL for raterLabelOrNull(r). */
  def raterLabelOrNullSql(r: Int): String =
    s"CASE WHEN (${raterHashSql(r)} // 10000) % $AbstainMod = 0 THEN NULL " +
      s"ELSE ${raterLabelSql(r)} END"

  // ---- Agreement statistics ---------------------------------------------

  /** Cohen's κ between two raters as an exact rational:
    * κ = (n·Σn_ii − Σᵢ rᵢcᵢ) / (n² − Σᵢ rᵢcᵢ) over the k×k confusion
    * grid. One count aggregate over the corpus (≤ k² cells), then
    * grid-local arithmetic. Emits (n, n_agree, kappa_num, kappa_den). */
  def cohensKappa(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val conf = pairs.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("cnt"))
    val marg = conf.groupBy(col("a")).agg(sum(col("cnt")).as("ra"))
      .join(conf.groupBy(col("b")).agg(sum(col("cnt")).as("cb")),
        col("a") === col("b"))
      .agg(sum(col("ra") * col("cb")).as("sum_rc"))
    val tot = conf.agg(sum(col("cnt")).as("n"),
      sum(when(col("a") === col("b"), col("cnt")).otherwise(0L)).as("n_agree"))
    tot.crossJoin(marg).select(
      col("n").cast("long").as("n"),
      col("n_agree").cast("long").as("n_agree"),
      (col("n") * col("n_agree") - col("sum_rc")).cast("long").as("kappa_num"),
      (col("n") * col("n") - col("sum_rc")).cast("long").as("kappa_den"))
  }

  /** Kuder–Richardson 20 (KR-20) — Cronbach's α for BINARY items: the
    * internal-consistency reliability of a rater PANEL when each
    * rater's per-item correctness is the item score. With K raters,
    * c_i = rater i's correct count, t_j = item j's total correct:
    *   KR20 = K/(K−1) · (1 − Σ c_i(n−c_i)/n / σ²·n)   — equivalently
    *   num = K·(n·Σt² − (Σt)² − Σ c_i(n−c_i))
    *   den = (K−1)·(n·Σt² − (Σt)²)
    * — exact BIGINTs (n·Σt² ≤ n·K² stays far under 2⁶³ for n ≤ 10⁸).
    * High KR-20 = the panel measures ONE consistent thing; low = raters
    * disagree on what the task is — the screening statistic before any
    * majority vote is trusted. `flagCols` are 0/1 LongType columns, one
    * per rater; ONE corpus aggregate, constant-width. */
  def kr20(flags: DataFrame, flagCols: Seq[String]): DataFrame = {
    val k = flagCols.size
    require(k >= 2, s"KR-20 needs >= 2 items, got $k")
    val t = flagCols.map(col).reduce(_ + _)
    val aggCols = Seq(sum(t).as("st"), sum(t * t).as("st2")) ++
      flagCols.map(c => sum(col(c)).as(s"c_$c"))
    val agg = flags.agg(count(lit(1)).as("n"), aggCols: _*)
    val sumCiNci = flagCols.map(c =>
      col(s"c_$c") * (col("n") - col(s"c_$c"))).reduce(_ + _)
    val sigmaN2 = col("n") * col("st2") - col("st") * col("st")
    agg.select(
      col("n").cast("long").as("n"),
      lit(k.toLong).as("k_raters"),
      sigmaN2.cast("long").as("var_n2"),
      (lit(k.toLong) * (sigmaN2 - sumCiNci)).cast("long").as("kr20_num"),
      (lit(k.toLong - 1L) * sigmaN2).cast("long").as("kr20_den"))
  }

  /** Gwet's AC1 (2008) between two raters — the chance-corrected
    * agreement coefficient the annotation-QA literature prefers over
    * Cohen's κ under skewed label prevalence (κ collapses toward 0
    * when one label dominates even at high raw agreement — the "kappa
    * paradox"; AC1's chance term π_q(1−π_q)/(K−1) stays calibrated).
    * With marginals r_q, c_q over the k×k confusion grid and
    * K = observed category count:
    *   po = A/n,  pe = Σ_q (r_q+c_q)(2n−r_q−c_q) / (4n²(K−1))
    *   AC1 = (po − pe)/(1 − pe) = (A·D − n·P) / (n·(D − P))
    * with P = Σ(r_q+c_q)(2n−r_q−c_q), D = 4n²(K−1). The n³-order
    * products overflow BIGINT past n ≈ 10⁶, so the INTERMEDIATES ride
    * a DECIMAL(38,0) lane (the DECIMAL(18,2) money-sum discipline,
    * wider) — but the EMITTED rational is the canonical gcd-reduced
    * form as BIGINT (`TextHash.ratNum`/`ratDen`): gate output schemas
    * may not contain DECIMAL columns (round-11 lesson — the driver's
    * hash canonicalization of decimal outputs diverges from the local
    * oracle compare; GateSchemaSpec enforces the ban). Both num and den
    * share the factor n, so the reduced pair is O(n²·k) — exact BIGINT
    * through n = 10⁹, fail-loud past it. Overflow bound of the LANE
    * itself: under Spark's non-ANSI decimal arithmetic a DECIMAL(38,0)
    * product that outgrows 38 digits returns NULL rather than raising;
    * `RatReduceExpr` therefore treats a null operand as overflow and
    * throws (both eval paths — r12 advice item). The n³-order terms
    * stay inside 38 digits through n ≈ 4.6·10¹² rows; past that the
    * gate fails loud, it does not emit silent nulls. ONE contingency
    * aggregate; grid-local arithmetic. */
  def gwetAc1(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val dec38 = "decimal(38,0)"
    val conf = pairs.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("cnt"))
    val cats = conf.select(col("a").as("q"))
      .unionByName(conf.select(col("b").as("q")))
      .distinct().agg(count(lit(1)).as("k_cats"))
    val ra = conf.groupBy(col("a").as("q")).agg(sum(col("cnt")).as("r"))
    val cb = conf.groupBy(col("b").as("q")).agg(sum(col("cnt")).as("c"))
    val tot = conf.agg(sum(col("cnt")).as("n"),
      sum(when(col("a") === col("b"), col("cnt")).otherwise(0L)).as("n_agree"))
    val marg = ra.join(cb, Seq("q"), "full")
      .select(coalesce(col("r"), lit(0L)).as("r"),
        coalesce(col("c"), lit(0L)).as("c"))
      .crossJoin(tot.select(col("n").as("__n")))
      .agg(sum((col("r") + col("c")).cast(dec38) *
        (lit(2L) * col("__n") - col("r") - col("c")).cast(dec38)).as("p"))
    val dD = lit(4L).cast(dec38) * col("n").cast(dec38) *
      col("n").cast(dec38) * (col("k_cats") - 1L).cast(dec38)
    val numD = (col("n_agree").cast(dec38) * dD -
      col("n").cast(dec38) * col("p")).cast(dec38)
    val denD = (col("n").cast(dec38) * (dD - col("p"))).cast(dec38)
    tot.crossJoin(cats).crossJoin(marg)
      .select(
        col("n").cast("long").as("n"),
        col("n_agree").cast("long").as("n_agree"),
        col("k_cats").cast("long").as("n_categories"),
        graft.functions.TextHash.ratNum(numD, denD).as("ac1_num"),
        graft.functions.TextHash.ratDen(numD, denD).as("ac1_den"))
  }

  /** McNemar's paired test core for two raters/models judged against a
    * shared truth — THE significance question of paired eval ("did B
    * beat A on the same items?"): only the DISCORDANT pairs carry
    * information (n_a_only = A correct ∧ B wrong, n_b_only = the
    * reverse); the test statistic is (b−c)²/(b+c), emitted as the
    * exact integer rational (mcnemar_num, mcnemar_den) per truth
    * stratum (den 0 when the raters never disagree — the caller's
    * NULL-division surface, like every stat in this family). ONE
    * contingency aggregate over the corpus; grid-local arithmetic —
    * scale-safe by construction. */
  def mcnemar(pairs: DataFrame, truthCol: String,
      aCol: String, bCol: String): DataFrame =
    pairs.groupBy(col(truthCol))
      .agg(
        count(lit(1)).as("n_items"),
        sum(when(col(aCol) === col(truthCol) &&
          col(bCol) =!= col(truthCol), 1L).otherwise(0L)).as("n_a_only"),
        sum(when(col(bCol) === col(truthCol) &&
          col(aCol) =!= col(truthCol), 1L).otherwise(0L)).as("n_b_only"))
      .select(col(truthCol), col("n_items").cast("long").as("n_items"),
        col("n_a_only").cast("long").as("n_a_only"),
        col("n_b_only").cast("long").as("n_b_only"),
        ((col("n_a_only") - col("n_b_only")) *
          (col("n_a_only") - col("n_b_only")))
          .cast("long").as("mcnemar_num"),
        (col("n_a_only") + col("n_b_only")).cast("long").as("mcnemar_den"))

  /** WEIGHTED Cohen's κ (quadratic weights) for ORDINAL labels — the
    * agreement coefficient when disagreeing by one grade is better
    * than by four (quality scores, Likert annotations). With
    * w_ij = (score_i − score_j)² over the k×k confusion grid:
    * κ_w = 1 − n·Σ w_ij·n_ij / Σ w_ij·rᵢ·cⱼ — exact integers. Emits
    * (n, obs_w, exp_w, kappa_num = exp_w − n·obs_w... both scaled by
    * the same Σ, kappa_den). Label → score via the caller's ordered
    * label list. */
  def weightedKappa(pairs: DataFrame, aCol: String, bCol: String,
      order: Seq[String]): DataFrame = {
    val scoreOf: Column => Column = c =>
      order.zipWithIndex.tail.foldLeft(when(c === order.head, 0L)) {
        case (acc, (l, i)) => acc.when(c === l, i.toLong)
      }
    val conf = pairs.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("w",
        (scoreOf(col("a")) - scoreOf(col("b"))) *
          (scoreOf(col("a")) - scoreOf(col("b"))))
    val obs = conf.agg(sum(col("cnt")).as("n"),
      sum(col("w") * col("cnt")).as("obs_w"))
    val marg = conf.groupBy(col("a")).agg(sum(col("cnt")).as("ra"))
      .crossJoin(conf.groupBy(col("b")).agg(sum(col("cnt")).as("cb"))
        .withColumnRenamed("b", "b2"))
      .withColumn("w",
        (scoreOf(col("a")) - scoreOf(col("b2"))) *
          (scoreOf(col("a")) - scoreOf(col("b2"))))
      .agg(sum(col("w") * col("ra") * col("cb")).as("exp_w"))
    obs.crossJoin(marg).select(
      col("n").cast("long").as("n"),
      col("obs_w").cast("long").as("obs_w"),
      col("exp_w").cast("long").as("exp_w"),
      (col("exp_w") - col("n") * col("obs_w")).cast("long").as("kappa_num"),
      col("exp_w").cast("long").as("kappa_den"))
  }

  /** Fleiss' κ for a fixed m-rater panel as an exact rational. With
    * A = Σᵢⱼ n_ij² − N·m, B = N·m(m−1), C = Σⱼ cⱼ², D = (N·m)²:
    * κ = (A·D − C·B) / (B·(D − C)). One (item,label) count aggregate,
    * then scalar arithmetic. Emits (n_items, m, kappa_num, kappa_den)
    * GCD-REDUCED (the `q_gwet_ac1` lane): the raw A·D products are
    * O(N³m⁴) and outgrow BIGINT past N ≈ 50k items — at the 10×
    * scale probe a Long lane silently WRAPPED where DuckDB failed
    * loud, so the products live in DECIMAL(38,0) (exact through
    * N ≈ 10⁹) and the emitted pair is canonical. Both num and den
    * share the factor N·m, so the reduced pair is O(N²m³) —
    * BIGINT-exact through N ≈ 2.7·10⁸ items; RatReduceExpr fails
    * loud past either bound, never silently. */
  def fleissKappa(ratings: DataFrame, itemCol: String, labelCol: String,
      m: Int): DataFrame = {
    val dec = "decimal(38,0)"
    val nij = ratings.groupBy(col(itemCol).as("item"), col(labelCol).as("lbl"))
      .agg(count(lit(1)).as("cnt"))
    val core = nij.agg(
      sum(col("cnt") * col("cnt")).as("sum_sq"),
      sum(col("cnt")).as("nm"),
      countDistinct(col("item")).as("n_items"))
    val cj = nij.groupBy(col("lbl")).agg(sum(col("cnt")).as("c"))
      .agg(sum(col("c") * col("c")).as("sum_c2"))
    val a = (col("sum_sq") - col("n_items") * m).cast(dec)
    val nm2 = col("nm").cast(dec) * col("nm").cast(dec)
    val b = col("n_items").cast(dec) * lit(m.toLong * (m - 1)).cast(dec)
    val num = a * nm2 - col("sum_c2").cast(dec) * b
    val den = b * (nm2 - col("sum_c2").cast(dec))
    core.crossJoin(cj).select(
      col("n_items").cast("long").as("n_items"),
      lit(m.toLong).as("m"),
      graft.functions.TextHash.ratNum(num, den).as("kappa_num"),
      graft.functions.TextHash.ratDen(num, den).as("kappa_den"))
  }

  /** Krippendorff's α (nominal metric) with missing ratings: units with
    * m_u ≥ 2 ratings kept; per-unit disagreement Σ_c n_uc(m_u−n_uc)/(m_u−1)
    * made integer by a ×12 scale (12 = lcm(1,2,3,4) covers panels up to
    * 5); α = 1 − Do/De emitted as (alpha_num, alpha_den) with
    * alpha_num = 12·De_num − Do12·(n−1), alpha_den = 12·De_num where
    * De_num = Σ_c c(n−c). Emits (n_ratings, n_units, do12, de_num,
    * alpha_num, alpha_den). */
  def krippendorffAlpha(ratings: DataFrame, itemCol: String,
      labelCol: String): DataFrame = {
    val nuc = ratings.filter(col(labelCol).isNotNull)
      .groupBy(col(itemCol).as("item"), col(labelCol).as("lbl"))
      .agg(count(lit(1)).as("cnt"))
    val mu = nuc.groupBy(col("item")).agg(sum(col("cnt")).as("m_u"))
      .filter(col("m_u") >= 2L)
    val kept = nuc.join(mu, "item")
    // 12/(m_u−1) is exact for m_u ∈ {2..5}: compute 12·n_uc(m_u−n_uc)/(m_u−1)
    // per row as an integer, then sum.
    val do12Col = (col("cnt") * (col("m_u") - col("cnt")) * 12L) / (col("m_u") - 1L)
    val core = kept.agg(
      sum(do12Col.cast("long")).as("do12"),
      sum(col("cnt")).as("n_ratings"),
      countDistinct(col("item")).as("n_units"))
    val de = kept.groupBy(col("lbl")).agg(sum(col("cnt")).as("c"))
      .crossJoin(kept.agg(sum(col("cnt")).as("n_tot")))
      .agg(sum(col("c") * (col("n_tot") - col("c"))).as("de_num"))
    core.crossJoin(de).select(
      col("n_ratings").cast("long").as("n_ratings"),
      col("n_units").cast("long").as("n_units"),
      col("do12").cast("long").as("do12"),
      col("de_num").cast("long").as("de_num"),
      (lit(12L) * col("de_num") - col("do12") * (col("n_ratings") - 1L))
        .cast("long").as("alpha_num"),
      (lit(12L) * col("de_num")).cast("long").as("alpha_den"))
  }

  /** Majority-vote consensus per item with the deterministic tie
    * posture (max votes, then lexicographically smallest label).
    * Emits one row per item: (item, maj_label, n_votes, m_raters). */
  def majorityVote(ratings: DataFrame, itemCol: String,
      labelCol: String): DataFrame = {
    val cnts = ratings.filter(col(labelCol).isNotNull)
      .groupBy(col(itemCol).as("item"), col(labelCol).as("maj_label"))
      .agg(count(lit(1)).as("n_votes"))
    val w = Window.partitionBy(col("item"))
      .orderBy(col("n_votes").desc, col("maj_label"))
    cnts
      .withColumn("m_raters",
        sum(col("n_votes")).over(Window.partitionBy(col("item"))))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("item"), col("maj_label"), col("n_votes"),
        col("m_raters").cast("long").as("m_raters"))
  }

  /** Per-rater quality against the majority consensus: n rated, n
    * matching the majority label, and a ×10000 integer accuracy.
    * Emits (rater, n_rated, n_match, acc_q). */
  def raterQuality(ratings: DataFrame, itemCol: String, raterCol: String,
      labelCol: String): DataFrame = {
    val maj = majorityVote(ratings, itemCol, labelCol)
      .select(col("item"), col("maj_label"))
    ratings.filter(col(labelCol).isNotNull)
      .select(col(itemCol).as("item"), col(raterCol).as("rater"),
        col(labelCol).as("lbl"))
      .join(maj, "item")
      .groupBy(col("rater"))
      .agg(count(lit(1)).as("n_rated"),
        sum(when(col("lbl") === col("maj_label"), 1L).otherwise(0L))
          .as("n_match"))
      .withColumn("acc_q",
        ((col("n_match") * 10000L - pmod(col("n_match") * 10000L,
          col("n_rated"))) / col("n_rated")).cast("long"))
  }

  /** Copeland scores from pairwise duels: per unordered pair the
    * majority winner (ties stand), then per item wins/losses/ties and
    * the ×2-scaled Copeland score 2·wins + ties. Duel volume is
    * corpus-sized; the pair grid is O(items²) — items are models, a
    * small set by construction. Emits (model, wins, losses, ties,
    * copeland_x2). */
  def copelandScores(duels: DataFrame, aCol: String, bCol: String,
      winnerCol: String): DataFrame = {
    val norm = duels.select(
      least(col(aCol), col(bCol)).as("lo"),
      greatest(col(aCol), col(bCol)).as("hi"),
      col(winnerCol).as("w"))
    val pair = norm.groupBy(col("lo"), col("hi")).agg(
      sum(when(col("w") === col("lo"), 1L).otherwise(0L)).as("w_lo"),
      sum(when(col("w") === col("hi"), 1L).otherwise(0L)).as("w_hi"))
    val res = pair.withColumn("r",
      when(col("w_lo") > col("w_hi"), 1L)
        .when(col("w_hi") > col("w_lo"), -1L).otherwise(0L))
    val sides = res.select(col("lo").as("model"), col("r")).unionAll(
      res.select(col("hi").as("model"), (-col("r")).as("r")))
    sides.groupBy(col("model")).agg(
      sum(when(col("r") === 1L, 1L).otherwise(0L)).as("wins"),
      sum(when(col("r") === -1L, 1L).otherwise(0L)).as("losses"),
      sum(when(col("r") === 0L, 1L).otherwise(0L)).as("ties"))
      .withColumn("copeland_x2", lit(2L) * col("wins") + col("ties"))
  }

  /** Bradley–Terry strength fit by MM iteration (Hunter 2004) — the
    * model behind RLHF preference scores and chess-style leaderboards:
    * pairwise win counts → latent strengths p with
    * P(i beats j) = pᵢ/(pᵢ+pⱼ). Two MM rounds from p⁰ = 1:
    *
    *   pᵢ' = Wᵢ / Σ_{j≠i} m_ij/(pᵢ+pⱼ)
    *
    * (Wᵢ = total wins, m_ij = comparisons of the pair). Determinism:
    * the duel corpus collapses to a models²-bounded count table (the
    * ONE collect, documented), and each denominator is a LEFT FOLD in
    * ascending-j order — the oracle replays the identical IEEE op
    * sequence with an ORDER BY j list_reduce, so the doubles are
    * bit-exact, not merely close. Requires every model to have ≥ 1 win
    * (loud failure otherwise — a zero-strength model would divide by
    * zero in round 2). Emits (model, wins, n_duels, p1, p2). */
  def bradleyTerryMM(duels: DataFrame, aCol: String, bCol: String,
      winnerCol: String): DataFrame = {
    val spark = duels.sparkSession
    val d = duels.select(col(aCol).cast("long").as("a"),
      col(bCol).cast("long").as("b"), col(winnerCol).cast("long").as("w"))
    val winRows = d.groupBy(col("w")).agg(count(lit(1)).as("wins"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairRows = d.select(least(col("a"), col("b")).as("lo"),
        greatest(col("a"), col("b")).as("hi"))
      .groupBy(col("lo"), col("hi")).agg(count(lit(1)).as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // bounded driver state: models + models² pair counts
    val models = (pairRows.flatMap(p => Seq(p._1, p._2)) ++ winRows.keys)
      .distinct.sorted
    require(models.forall(m => winRows.getOrElse(m, 0L) > 0L),
      "Bradley-Terry MM needs every model to win at least once")
    val adj: Map[Long, Seq[(Long, Long)]] = pairRows
      .flatMap { case (lo, hi, m) => Seq(lo -> (hi, m), hi -> (lo, m)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
    def round(p: Map[Long, Double]): Map[Long, Double] =
      models.map { i =>
        val den = adj.getOrElse(i, Nil).foldLeft(0.0) { case (acc, (j, m)) =>
          acc + m.toDouble / (p(i) + p(j))
        }
        i -> winRows(i).toDouble / den
      }.toMap
    val p0 = models.map(_ -> 1.0).toMap
    val p1 = round(p0)
    val p2 = round(p1)
    val out = models.map(i => (i, winRows(i),
      adj.getOrElse(i, Nil).map(_._2).sum, p1(i), p2(i)))
    spark.createDataFrame(out)
      .toDF("model", "wins", "n_duels", "p1", "p2")
  }

  /** Borda aggregation of per-voter rankings: each voter ranks their
    * PRESENT candidates (metric desc, label asc tie-break) and awards
    * n_present − rank points. Emits (candidate, borda_points,
    * n_voters). Voter-keyed window over ≤ k rows per voter. */
  def bordaScores(prefs: DataFrame, voterCol: String, candidateCol: String,
      metricCol: String): DataFrame = {
    val w = Window.partitionBy(col(voterCol))
      .orderBy(col(metricCol).desc, col(candidateCol))
    prefs
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("n_present",
        count(lit(1)).over(Window.partitionBy(col(voterCol))).cast("long"))
      .groupBy(col(candidateCol).as("candidate"))
      .agg(sum(col("n_present") - col("rnk")).as("borda_points"),
        count(lit(1)).as("n_voters"))
  }

  /** The shared blocks×treatments average-rank grid (×2-scaled so ties
    * stay integer): rank2 = 2·rank_min + (t − 1). Input must be the
    * COMPLETE grid (every block × treatment, zeros included). Emits
    * (block, treatment, rank2). */
  def rank2Grid(grid: DataFrame, blockCol: String, treatCol: String,
      metricCol: String): DataFrame = {
    grid.select(col(blockCol).as("block"), col(treatCol).as("treatment"),
        col(metricCol).as("metric"))
      .withColumn("rank_min", rank().over(
        Window.partitionBy(col("block")).orderBy(col("metric"))))
      .withColumn("t", count(lit(1)).over(
        Window.partitionBy(col("block"), col("metric"))))
      .select(col("block"), col("treatment"),
        (lit(2L) * col("rank_min") + col("t") - 1L).cast("long").as("rank2"))
  }

  /** Page's trend test statistic (×2-scaled for tie-average ranks):
    * L2 = Σⱼ j·R2ⱼ with treatments in a fixed hypothesis order and
    * R2ⱼ the column sums of the ×2 rank grid. Emits one row
    * (l2, n_blocks, k_treatments). */
  def pageTrendL(grid: DataFrame, blockCol: String, treatCol: String,
      metricCol: String, order: Seq[String]): DataFrame = {
    val jIdx = order.zipWithIndex.tail.foldLeft(
      when(col("treatment") === order.head, 1L)) {
      case (acc, (t, i)) => acc.when(col("treatment") === t, (i + 1).toLong)
    }
    val r2 = rank2Grid(grid, blockCol, treatCol, metricCol)
      .groupBy(col("treatment")).agg(sum(col("rank2")).as("r2"),
        countDistinct(col("block")).as("m"))
    r2.agg(
      sum(jIdx * col("r2")).cast("long").as("l2"),
      max(col("m")).cast("long").as("n_blocks"),
      count(lit(1)).cast("long").as("k_treatments"))
  }

  /** Kendall's coefficient of concordance W as an exact rational (tie-
    * corrected): with rank2 column sums R2ⱼ, S4 = Σⱼ(R2ⱼ − m(n+1))²
    * (= 4S) and tie term ΣT = Σ_blocks Σ_groups(t³−t):
    * W = 3·S4 / (m²(n³−n) − m·ΣT). Emits (w_num, w_den, s4, tie_sum,
    * n_blocks, k_treatments). */
  def kendallW(grid: DataFrame, blockCol: String, treatCol: String,
      metricCol: String): DataFrame = {
    val r2g = rank2Grid(grid, blockCol, treatCol, metricCol)
    val r2 = r2g.groupBy(col("treatment")).agg(sum(col("rank2")).as("r2"))
    val dims = r2g.agg(countDistinct(col("block")).as("m"),
      countDistinct(col("treatment")).as("n"))
    val ties = grid.select(col(blockCol).as("block"),
        col(metricCol).as("metric"))
      .groupBy(col("block"), col("metric")).agg(count(lit(1)).as("t"))
      .agg(sum(col("t") * col("t") * col("t") - col("t")).as("tie_sum"))
    val s4 = r2.crossJoin(dims)
      .agg(sum((col("r2") - col("m") * (col("n") + 1L)) *
        (col("r2") - col("m") * (col("n") + 1L))).as("s4"))
    dims.crossJoin(ties).crossJoin(s4).select(
      (lit(3L) * col("s4")).cast("long").as("w_num"),
      (col("m") * col("m") *
        (col("n") * col("n") * col("n") - col("n")) -
        col("m") * col("tie_sum")).cast("long").as("w_den"),
      col("s4").cast("long").as("s4"),
      col("tie_sum").cast("long").as("tie_sum"),
      col("m").cast("long").as("n_blocks"),
      col("n").cast("long").as("k_treatments"))
  }
}
