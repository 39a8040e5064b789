package graft.gates

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry.t
import graft.ops.{Agreement, CorpusFilters}

/** Annotation-QA and preference-aggregation gates — the labeling /
  * RLHF-data layer: chance-corrected inter-annotator agreement (Cohen,
  * Fleiss, Krippendorff), majority-vote consensus with per-rater
  * quality, and pairwise-preference voting rules (Copeland, Borda) plus
  * the rank-concordance statistics (Kendall's W, Page's L). The rater
  * panel is a deterministic hash fixture over `events` (5 raters with
  * an accuracy ramp, abstentions for the missing-data regime), shared
  * constant-for-constant with the oracles via `Agreement.raterLabelSql`.
  * Every statistic is an exact integer rational — no float aggregation
  * anywhere in the family. */
private[graft] object QualityGates {

  /** The 5-rater panel over events: (item, rater, lbl). */
  private def ratings(s: SparkSession, dir: String,
      withAbstain: Boolean): DataFrame = {
    val ev = t(s, dir, "events").select(col("event_id"), col("event_type"))
    val arr = array((0 until 5).map(r =>
      if (withAbstain) Agreement.raterLabelOrNull(r)
      else Agreement.raterLabel(r)): _*)
    ev.select(col("event_id").as("item"), posexplode(arr).as(Seq("rater", "lbl")))
      .select(col("item"), col("rater").cast("long").as("rater"), col("lbl"))
  }

  /** Oracle CTE body for the same panel. */
  private def ratingsSql(withAbstain: Boolean): String =
    (0 until 5).map { r =>
      val lbl = if (withAbstain) Agreement.raterLabelOrNullSql(r)
        else Agreement.raterLabelSql(r)
      s"SELECT event_id AS item, CAST($r AS BIGINT) AS rater, $lbl AS lbl " +
        "FROM events"
    }.mkString(" UNION ALL ")

  /** Complete blocks×treatments count grid: every (user, label) cell,
    * zeros included — Page/Kendall ranks are over the full slate. */
  private def userLabelGrid(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val users = ev.select(col("user_id")).distinct()
    val labels = Agreement.Labels
      .foldLeft(Seq.empty[(String, Int)])((a, l) => a :+ (l, a.size))
    val labelDf = s.createDataFrame(labels).toDF("lbl", "_i").select(col("lbl"))
    val cnts = ev.groupBy(col("user_id").as("u"), col("event_type").as("e"))
      .agg(count(lit(1)).as("m"))
    users.crossJoin(labelDf)
      .join(cnts, col("user_id") === col("u") && col("lbl") === col("e"),
        "left")
      .select(col("user_id"), col("lbl"),
        coalesce(col("m"), lit(0L)).as("metric"))
  }

  private val gridSql =
    "u AS (SELECT DISTINCT user_id FROM events), " +
      "lbls AS (SELECT unnest(['click','error','purchase','signup','view']) AS lbl), " +
      "c AS (SELECT user_id, event_type, count(*) AS m FROM events GROUP BY 1, 2), " +
      "g AS (SELECT u.user_id, lbls.lbl, coalesce(c.m, 0) AS metric " +
      "FROM u CROSS JOIN lbls " +
      "LEFT JOIN c ON c.user_id = u.user_id AND c.event_type = lbls.lbl), " +
      "r2 AS (SELECT user_id, lbl, metric, " +
      "2 * rank() OVER (PARTITION BY user_id ORDER BY metric) + " +
      "count(*) OVER (PARTITION BY user_id, metric) - 1 AS rank2 FROM g)"

  /** Pairwise model duels (8 pseudo-models) derived per event from the
    * rater-hash stream 9: challenger pair + deterministic
    * strength-weighted winner. */
  private def duels(s: SparkSession, dir: String): DataFrame = {
    val h = Agreement.raterHash(9)
    val hi = ((h - pmod(h, lit(8L))) / lit(8L)).cast("long")
    val hw = ((h - pmod(h, lit(56L))) / lit(56L)).cast("long")
    val i = pmod(h, lit(8L))
    val j = pmod(i + lit(1L) + pmod(hi, lit(7L)), lit(8L))
    t(s, dir, "events").select(
      i.as("a"), j.as("b"),
      when(pmod(hw, i + j + lit(2L)) < i + 1L, i).otherwise(j).as("w"))
  }

  private val duelsSql = {
    val h = Agreement.raterHashSql(9)
    s"d AS (SELECT ($h) % 8 AS a, " +
      s"(($h) % 8 + 1 + (($h) // 8) % 7) % 8 AS b, " +
      s"CASE WHEN (($h) // 56) % (($h) % 8 + (($h) % 8 + 1 + (($h) // 8) % 7) % 8 + 2) " +
      s"< ($h) % 8 + 1 THEN ($h) % 8 " +
      s"ELSE (($h) % 8 + 1 + (($h) // 8) % 7) % 8 END AS w FROM events)"
  }

  /** Deterministic "web page" fixture: the word-soup corpus rebuilt as
    * a multi-line pseudo page (bullet line, conditional sentence /
    * boilerplate / lorem-ipsum / ellipsis lines, a symbol run) so the
    * published filter rules have real pass AND fail paths. Shared
    * constant-for-constant with [[webFixtureSql]]. */
  private def webFixture(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    def on(m: Long, frag: String) =
      when(pmod(id, lit(m)) === 0L, lit("\n" + frag)).otherwise(lit(""))
    t(s, dir, "documents").select(id, concat(
      col("text"),
      lit("\n- bullet "), pmod(id, lit(5L)).cast("string"),
      on(3L, "The data of the run is good. It has to be checked. " +
        "We have that and more with it."),
      on(4L, "tiny line"),
      on(7L, "please enable javascript to view this page."),
      on(11L, "lorem ipsum dolor sit amet."),
      on(6L, "the story continues and trails off..."),
      lit("\nsym "),
      substr(lit("# # # # # # # # "), lit(1),
        (pmod(id, lit(9L)) * 2L).cast("int"))).as("page"))
  }

  private val webFixtureSql: String = {
    def on(m: Long, frag: String) =
      s"CASE WHEN doc_id % $m = 0 THEN chr(10) || '$frag' ELSE '' END"
    "text || chr(10) || '- bullet ' || CAST(doc_id % 5 AS VARCHAR) || " +
      on(3L, "The data of the run is good. It has to be checked. " +
        "We have that and more with it.") + " || " +
      on(4L, "tiny line") + " || " +
      on(7L, "please enable javascript to view this page.") + " || " +
      on(11L, "lorem ipsum dolor sit amet.") + " || " +
      on(6L, "the story continues and trails off...") + " || " +
      "chr(10) || 'sym ' || " +
      "substr('# # # # # # # # ', 1, CAST(doc_id % 9 * 2 AS INT))"
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- Quality classifier TRAINING: logistic regression by IRLS
    //      over surface features (intercept, alpha-ratio, capped token
    //      count), label = lang-is-en — the fastText-style quality-
    //      filter loop, exact-integer moments per round ----
    "feature_logreg_train" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(length(col("text")) > 0)
      val feats = d.select(
        (length(regexp_replace(col("text"), "[^a-z]", "")).cast("double") /
          length(col("text"))).as("x1"),
        (least(size(split(col("text"), "\\s+")), lit(500)).cast("double") /
          lit(100.0)).as("x2"),
        when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))
      graft.ops.Features.irlsLogreg(feats, "x1", "x2", "y", rounds = 2)
    }),

    // ---- Eval harness: unbiased pass@k (Chen et al. 2021, HumanEval
    //      §2.1) — per task with n samples / c correct, pass@k =
    //      1 − C(n−c,k)/C(n,k), computed as falling-factorial BIGINT
    //      products and emitted as a gcd-reduced exact rational (the
    //      q_gwet_ac1 lane; DECIMAL stays internal). Task fixture:
    //      customer = task, orders = samples, status 'F' = pass.
    //      One grouped aggregate + row-local arithmetic — no joins.
    //      Magnitude: products of k≤10 terms ≤ n each fit DECIMAL(38,0)
    //      through n ≈ 6000 samples/task; past that RatReduceExpr
    //      fails loud (never silently-null output) ----
    "q_pass_at_k" -> ((s, dir) => {
      val byTask = t(s, dir, "orders")
        .groupBy(col("o_custkey").as("task"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("c"))
      Seq(1, 5, 10).map { k =>
        val dec = "decimal(38,0)"
        val numRaw = when(col("n") - col("c") < k, lit(0L).cast(dec))
          .otherwise((0 until k).map(i =>
            (col("n") - col("c") - lit(i.toLong)).cast(dec)).reduce(_ * _))
        val denRaw = (0 until k).map(i =>
          (col("n") - lit(i.toLong)).cast(dec)).reduce(_ * _)
        byTask.filter(col("n") >= k)
          .select(col("task"), lit(k.toLong).as("k"), col("n"), col("c"),
            graft.functions.TextHash.ratNum(denRaw - numRaw, denRaw)
              .as("pass_num"),
            graft.functions.TextHash.ratDen(denRaw - numRaw, denRaw)
              .as("pass_den"))
      }.reduce(_ unionByName _)
    }),

    // ---- Corpus filters: the Gopher quality rule set (Rae et al.
    //      2021) per document, every ratio cross-multiplied to integer
    //      comparisons; row-local, no shuffle ----
    "text_gopher_filters" -> ((s, dir) =>
      CorpusFilters.gopherQuality(webFixture(s, dir), "doc_id", "page")),

    // ---- Corpus filters: C4 line-level cleaning (Raffel et al. 2020)
    //      — terminal-punctuation / ≥5-token / javascript line rules +
    //      lorem-ipsum/brace/3-sentence document rules ----
    "text_c4_filters" -> ((s, dir) =>
      CorpusFilters.c4LineFilter(webFixture(s, dir), "doc_id", "page")),

    // ---- Agreement: Cohen's κ between raters 0 and 1 — the two-rater
    //      chance-corrected agreement, exact rational from the k×k
    //      confusion grid (one corpus aggregate → 25 cells) ----
    "q_cohens_kappa" -> ((s, dir) =>
      Agreement.cohensKappa(
        t(s, dir, "events").select(
          Agreement.raterLabel(0).as("a"), Agreement.raterLabel(1).as("b")),
        "a", "b")),

    // ---- CAPSTONE: the composed annotation-ops pipeline — score the
    //      panel against its own consensus, DROP the noisiest rater
    //      (min majority-match, deterministic tie), and re-measure
    //      Fleiss' κ on the pruned panel: the operators CHAIN
    //      (majorityVote → raterQuality → argmin → fleissKappa ×2),
    //      and the emitted before/after rationals show the labeling-ops
    //      workflow's payoff exactly ----
    "pipeline_annotation" -> ((s, dir) => {
      val panel = ratings(s, dir, withAbstain = false)
      val rq = Agreement.raterQuality(panel, "item", "rater", "lbl")
      val worst = rq.orderBy(col("n_match").asc, col("rater").asc).limit(1)
        .select(col("rater").as("worst_rater"))
      val before = Agreement.fleissKappa(panel, "item", "lbl", m = 5)
        .select(col("n_items"),
          col("kappa_num").as("kappa_before_num"),
          col("kappa_den").as("kappa_before_den"))
      val pruned = panel.join(broadcast(worst),
        col("rater") === col("worst_rater"), "left_anti")
      val after = Agreement.fleissKappa(pruned, "item", "lbl", m = 4)
        .select(col("kappa_num").as("kappa_after_num"),
          col("kappa_den").as("kappa_after_den"))
      before.crossJoin(worst).crossJoin(after)
    }),

    // ---- Agreement: KR-20 panel reliability (Cronbach's α for binary
    //      items) over the 5 raters' correctness indicators — the
    //      screening statistic before any majority vote is trusted ----
    "q_kr20" -> ((s, dir) =>
      Agreement.kr20(
        t(s, dir, "events").select((0 until 5).map(r =>
          when(Agreement.raterLabel(r) === col("event_type"), 1L)
            .otherwise(0L).as(s"ok$r")): _*),
        (0 until 5).map(r => s"ok$r"))),

    // ---- Agreement: Gwet's AC1 between raters 0 and 1 — the
    //      prevalence-robust alternative to κ (no kappa paradox);
    //      DECIMAL(38,0) INTERNALLY (n³ products outgrow BIGINT past
    //      n ≈ 10⁶), emitted as the gcd-reduced BIGINT rational ----
    "q_gwet_ac1" -> ((s, dir) =>
      Agreement.gwetAc1(
        t(s, dir, "events").select(
          Agreement.raterLabel(0).as("a"), Agreement.raterLabel(1).as("b")),
        "a", "b")),

    // ---- Agreement: McNemar's paired test between raters 0 and 1
    //      judged against the item's true label — the paired-eval
    //      significance core (discordant counts b, c; statistic
    //      (b−c)²/(b+c) as an exact rational per truth stratum) ----
    "q_mcnemar_raters" -> ((s, dir) =>
      Agreement.mcnemar(
        t(s, dir, "events").select(col("event_type").as("truth"),
          Agreement.raterLabel(0).as("a"), Agreement.raterLabel(1).as("b")),
        "truth", "a", "b")),

    // ---- Agreement: WEIGHTED Cohen's κ (quadratic weights, labels as
    //      ordinal scores) between raters 0 and 2 — near-misses cost
    //      less than far misses; exact integers off the same grid ----
    "q_weighted_kappa" -> ((s, dir) =>
      Agreement.weightedKappa(
        t(s, dir, "events").select(
          Agreement.raterLabel(0).as("a"), Agreement.raterLabel(2).as("b")),
        "a", "b", Agreement.Labels)),

    // ---- Agreement: Fleiss' κ over the full 5-rater panel — exact
    //      rational from per-item label counts; one (item,label)
    //      aggregate, grid-local arithmetic after ----
    "q_fleiss_kappa" -> ((s, dir) =>
      Agreement.fleissKappa(ratings(s, dir, withAbstain = false),
        "item", "lbl", m = 5)),

    // ---- Agreement: Krippendorff's α (nominal) with abstentions —
    //      the missing-data agreement coefficient; per-unit
    //      disagreement made integer by the ×12 lcm scale ----
    "q_krippendorff_alpha" -> ((s, dir) =>
      Agreement.krippendorffAlpha(ratings(s, dir, withAbstain = true),
        "item", "lbl")),

    // ---- Consensus: majority vote with the deterministic tie posture
    //      (max votes, then smallest label), read out as the
    //      truth×consensus confusion summary ----
    "q_majority_label" -> ((s, dir) => {
      val maj = Agreement.majorityVote(ratings(s, dir, withAbstain = false),
        "item", "lbl")
      maj.join(t(s, dir, "events")
          .select(col("event_id").as("item"), col("event_type").as("truth")),
          "item")
        .groupBy(col("truth"), col("maj_label"))
        .agg(count(lit(1)).as("n_items"), sum(col("n_votes")).as("sum_votes"))
    }),

    // ---- Consensus: per-rater quality vs the majority label — the
    //      annotator leaderboard (n, matches, ×10000 accuracy) ----
    "q_rater_quality" -> ((s, dir) =>
      Agreement.raterQuality(ratings(s, dir, withAbstain = false),
        "item", "rater", "lbl")),

    // ---- Preference: Copeland scores over pairwise duels — majority
    //      winner per unordered model pair, then wins/losses/ties and
    //      the ×2-scaled Copeland score ----
    "q_copeland_rank" -> ((s, dir) =>
      Agreement.copelandScores(duels(s, dir), "a", "b", "w")),

    // ---- Preference: Bradley–Terry strengths by two MM rounds — the
    //      RLHF preference-model fit; bounded models² collect, fold-
    //      order-pinned doubles bit-exact against the oracle ----
    "q_bradley_terry" -> ((s, dir) =>
      Agreement.bradleyTerryMM(duels(s, dir), "a", "b", "w")),

    // ---- Preference: Borda aggregation of per-user rankings of the
    //      event types (present candidates, count-desc ranking) ----
    "q_borda_rank" -> ((s, dir) =>
      Agreement.bordaScores(
        t(s, dir, "events")
          .groupBy(col("user_id"), col("event_type").as("candidate"))
          .agg(count(lit(1)).as("m")),
        "user_id", "candidate", "m")),

    // ---- Policy replay: deterministic epsilon-greedy bandit over the
    //      daily per-arm reward grid — off-policy counterfactual
    //      evaluation (Li et al. 2011 replay method); exact-integer
    //      state, cross-multiplied argmax, hash exploration ----
    "q_bandit_replay" -> ((s, dir) => {
      val rewards = t(s, dir, "events")
        .select(expr("ts div 86400000000000").as("period"),
          col("event_type").as("arm"),
          floor(col("value")).cast("long").as("r"))
        .groupBy(col("period"), col("arm"))
        .agg(sum(col("r")).as("reward"))
      graft.ops.Bandit.epsilonGreedyReplay(
        rewards, "period", "arm", "reward", Agreement.Labels)
    }),

    // ---- Stratified causal readout: Mantel–Haenszel common odds
    //      ratio (treatment = user parity, outcome = click vs view,
    //      strata = day of week); stratum-ordered fold, bit-exact ----
    "q_mantel_haenszel" -> ((s, dir) =>
      graft.ops.Profile.mantelHaenszel(
        t(s, dir, "events")
          .filter(col("event_type").isin("click", "view")),
        pmod(expr("ts div 86400000000000"), lit(7L)),
        pmod(col("user_id"), lit(2L)) === 0L,
        col("event_type") === "click")),

    // ---- Dose–response: Cochran–Armitage trend components over
    //      graded value buckets — exact BIGINTs only ----
    "q_cochran_armitage" -> ((s, dir) =>
      graft.ops.Profile.cochranArmitage(
        t(s, dir, "events")
          .filter(col("event_type").isin("click", "purchase")),
        expr("cast(floor(value) as bigint) div 100"),
        col("event_type") === "purchase")),

    // ---- Concordance: Kendall's W across users ranking the 5 types —
    //      tie-corrected exact rational over the ×2 rank grid ----
    "q_kendall_w" -> ((s, dir) =>
      Agreement.kendallW(userLabelGrid(s, dir), "user_id", "lbl", "metric")),

    // ---- Concordance: Page's trend L (×2-scaled) with alphabetical
    //      hypothesis order — the ordered-alternative sibling of the
    //      Friedman family ----
    "q_page_trend" -> ((s, dir) =>
      Agreement.pageTrendL(userLabelGrid(s, dir), "user_id", "lbl", "metric",
        Agreement.Labels)))

  val oracles: Map[String, String] = Map(

    // Replays the IRLS run: per round one quantized-moment aggregate
    // (floor to BIGINT before summing — exact), then the SAME Cramer
    // token sequence Features.irlsLogreg runs on the driver.
    "feature_logreg_train" -> {
      val det = "(a00*(a11*a22 - a12*a12) - a01*(a01*a22 - a12*a02) + " +
        "a02*(a01*a12 - a11*a02))"
      val d0 = "(b0*(a11*a22 - a12*a12) - a01*(b1*a22 - a12*b2) + " +
        "a02*(b1*a12 - a11*b2))"
      val d1 = "(a00*(b1*a22 - a12*b2) - b0*(a01*a22 - a12*a02) + " +
        "a02*(a01*b2 - b1*a02))"
      val d2 = "(a00*(a11*b2 - b1*a12) - a01*(a01*b2 - b1*a02) + " +
        "b0*(a01*a12 - a11*a02))"
      def roundCtes(r: Int): String = {
        val prevW = s"wr${r - 1}"
        def m(e: String) = s"CAST(sum(CAST(floor(($e)*1048576.0) AS BIGINT)) AS BIGINT)"
        s"p$r AS (SELECT x1, x2, y, " +
          s"1.0/(1.0 + exp(-(w0 + w1*x1 + w2*x2))) AS mu FROM lrf, $prevW), " +
          s"pr$r AS (SELECT x1, x2, y, mu, mu*(1.0 - mu) AS rr FROM p$r), " +
          s"m$r AS (SELECT ${m("rr")} AS h00, ${m("x1*rr")} AS h01, " +
          s"${m("x2*rr")} AS h02, ${m("(x1*x1)*rr")} AS h11, " +
          s"${m("(x1*x2)*rr")} AS h12, ${m("(x2*x2)*rr")} AS h22, " +
          s"${m("y - mu")} AS g0, ${m("x1*(y - mu)")} AS g1, " +
          s"${m("x2*(y - mu)")} AS g2 FROM pr$r), " +
          s"a$r AS (SELECT CAST(h00 AS DOUBLE)/1048576.0 AS a00, " +
          "CAST(h01 AS DOUBLE)/1048576.0 AS a01, " +
          "CAST(h02 AS DOUBLE)/1048576.0 AS a02, " +
          "CAST(h11 AS DOUBLE)/1048576.0 AS a11, " +
          "CAST(h12 AS DOUBLE)/1048576.0 AS a12, " +
          "CAST(h22 AS DOUBLE)/1048576.0 AS a22, " +
          "CAST(g0 AS DOUBLE)/1048576.0 AS b0, " +
          "CAST(g1 AS DOUBLE)/1048576.0 AS b1, " +
          s"CAST(g2 AS DOUBLE)/1048576.0 AS b2 FROM m$r), " +
          s"wr$r AS (SELECT w0 + $d0/$det AS w0, w1 + $d1/$det AS w1, " +
          s"w2 + $d2/$det AS w2 FROM a$r, $prevW)"
      }
      "WITH lrf AS MATERIALIZED (SELECT " +
        "CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) / " +
        "length(text) AS x1, " +
        "least(len(string_split_regex(text, '\\s+')), 500) / 100.0 AS x2, " +
        "CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y " +
        "FROM documents WHERE length(text) > 0), " +
        "wr0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2), " +
        roundCtes(1) + ", " + roundCtes(2) + " " +
        "SELECT CAST(1 AS BIGINT) AS round, w0, w1, w2 FROM wr1 " +
        "UNION ALL SELECT CAST(2 AS BIGINT) AS round, w0, w1, w2 FROM wr2"
    },

    // pass@k as exact HUGEINT falling-factorial products, gcd-reduced
    // — mirrors the Spark DECIMAL(38,0)+RatReduceExpr lane term-for-term.
    "q_pass_at_k" -> {
      def perK(k: Int): String = {
        val num = (0 until k).map(i => s"CAST(n - c - $i AS HUGEINT)")
          .mkString(" * ")
        val den = (0 until k).map(i => s"CAST(n - $i AS HUGEINT)")
          .mkString(" * ")
        s"SELECT task, CAST($k AS BIGINT) AS k, n, c, " +
          s"(CASE WHEN n - c < $k THEN $den ELSE $den - ($num) END) AS num, " +
          s"($den) AS den FROM bt WHERE n >= $k"
      }
      "WITH bt AS (SELECT o_custkey AS task, " +
        "CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)" +
        " AS c FROM orders GROUP BY 1), " +
        s"raw AS (${perK(1)} UNION ALL ${perK(5)} UNION ALL ${perK(10)}) " +
        "SELECT task, k, n, c, " +
        "CAST(num // greatest(gcd(num, den), 1) AS BIGINT) AS pass_num, " +
        "CAST(den // greatest(gcd(num, den), 1) AS BIGINT) AS pass_den " +
        "FROM raw"
    },

    "text_gopher_filters" -> {
      val stopSum = CorpusFilters.Stopwords.map(sw =>
        s"(CASE WHEN list_contains(words, '$sw') THEN 1 ELSE 0 END)")
        .mkString("(", " + ", ")")
      s"WITH d AS (SELECT doc_id, $webFixtureSql AS txt FROM documents), " +
        "w AS (SELECT doc_id, txt, " +
        "list_filter(regexp_split_to_array(txt, '[ \n]'), x -> len(x) > 0) " +
        "AS words, string_split(txt, chr(10)) AS lines FROM d), " +
        "m AS (SELECT doc_id, CAST(len(words) AS BIGINT) AS n_words, " +
        "CAST(length(replace(replace(txt, ' ', ''), chr(10), '')) AS BIGINT) " +
        "AS swc, CAST(len(lines) AS BIGINT) AS n_lines, " +
        "CAST(length(txt) - length(replace(txt, '#', '')) AS BIGINT) AS n_hash, " +
        "CAST((length(txt) - length(replace(txt, '...', ''))) // 3 AS BIGINT) " +
        "AS n_ell, " +
        "CAST(len(list_filter(lines, l -> starts_with(l, '- '))) AS BIGINT) " +
        "AS n_bl, " +
        "CAST(len(list_filter(lines, l -> ends_with(l, '...'))) AS BIGINT) " +
        "AS n_el, " +
        "CAST(len(list_filter(words, x -> regexp_matches(x, '[a-zA-Z]'))) " +
        "AS BIGINT) AS n_aw, " +
        s"CAST($stopSum AS BIGINT) AS n_sw FROM w), " +
        "f AS (SELECT doc_id, n_words, n_lines, " +
        "CASE WHEN n_words >= 50 AND n_words <= 100000 THEN 1 ELSE 0 END " +
        "AS r_word_count, " +
        "CASE WHEN swc >= 3 * n_words AND swc <= 10 * n_words THEN 1 ELSE 0 " +
        "END AS r_mean_wlen, " +
        "CASE WHEN 10 * (n_hash + n_ell) <= n_words THEN 1 ELSE 0 END " +
        "AS r_symbol_ratio, " +
        "CASE WHEN 10 * n_bl <= 9 * n_lines THEN 1 ELSE 0 END AS r_bullet, " +
        "CASE WHEN 10 * n_el <= 3 * n_lines THEN 1 ELSE 0 END AS r_ellipsis, " +
        "CASE WHEN 10 * n_aw >= 8 * n_words THEN 1 ELSE 0 END " +
        "AS r_alpha_words, " +
        s"CASE WHEN n_sw >= ${CorpusFilters.MinStopwords} THEN 1 ELSE 0 END " +
        "AS r_stopwords FROM m) " +
        "SELECT doc_id, n_words, n_lines, r_word_count, r_mean_wlen, " +
        "r_symbol_ratio, r_bullet, r_ellipsis, r_alpha_words, r_stopwords, " +
        "CAST(CASE WHEN r_word_count + r_mean_wlen + r_symbol_ratio + " +
        "r_bullet + r_ellipsis + r_alpha_words + r_stopwords = 7 " +
        "THEN 1 ELSE 0 END AS INT) AS gopher_keep FROM f"
    },

    "text_c4_filters" ->
      (s"WITH d AS (SELECT doc_id, $webFixtureSql AS txt FROM documents), " +
        "l AS (SELECT doc_id, CAST(length(txt) - length(replace(replace(" +
        "replace(txt, '.', ''), '!', ''), '?', '')) AS BIGINT) " +
        "AS n_sentences, " +
        "(contains(txt, 'lorem ipsum') OR contains(txt, '{')) AS banned, " +
        "unnest(string_split(txt, chr(10))) AS line FROM d), " +
        "f AS (SELECT doc_id, n_sentences, banned, line, " +
        "(ends_with(line, '.') OR ends_with(line, '!') OR " +
        "ends_with(line, '?') OR ends_with(line, '\"')) AND " +
        "len(list_filter(string_split(line, ' '), x -> len(x) > 0)) >= 5 " +
        "AND NOT contains(lower(line), 'javascript') AS kept FROM l) " +
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines, " +
        "CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_lines_kept, " +
        "CAST(max(n_sentences) AS BIGINT) AS n_sentences, " +
        "CAST(coalesce(sum(CASE WHEN kept THEN length(line) END), 0) " +
        "AS BIGINT) AS kept_chars, " +
        "CAST(CASE WHEN max(n_sentences) >= 3 AND NOT bool_or(banned) " +
        "THEN 1 ELSE 0 END AS INT) AS c4_keep FROM f GROUP BY doc_id"),

    "pipeline_annotation" -> {
      def fleiss(src: String, m: Int, tag: String): String =
        s"nij$tag AS (SELECT item, lbl, count(*) AS cnt FROM $src " +
          "GROUP BY 1, 2), " +
          s"core$tag AS (SELECT CAST(sum(cnt * cnt) AS BIGINT) AS sum_sq, " +
          "CAST(sum(cnt) AS BIGINT) AS nm, " +
          s"CAST(count(DISTINCT item) AS BIGINT) AS n_items FROM nij$tag), " +
          s"cj$tag AS (SELECT CAST(sum(c * c) AS BIGINT) AS sum_c2 FROM " +
          s"(SELECT lbl, sum(cnt) AS c FROM nij$tag GROUP BY lbl)), " +
          s"kraw$tag AS (SELECT core$tag.n_items, " +
          s"CAST(sum_sq - n_items * $m AS HUGEINT) * CAST(nm AS HUGEINT) * " +
          "CAST(nm AS HUGEINT) - CAST(sum_c2 AS HUGEINT) * " +
          s"CAST(n_items * ${m * (m - 1)} AS HUGEINT) AS knum, " +
          s"CAST(n_items * ${m * (m - 1)} AS HUGEINT) * " +
          "(CAST(nm AS HUGEINT) * CAST(nm AS HUGEINT) - " +
          s"CAST(sum_c2 AS HUGEINT)) AS kden FROM core$tag, cj$tag), " +
          s"k$tag AS (SELECT n_items, " +
          "CAST(knum // greatest(gcd(knum, kden), 1) AS BIGINT) AS knum, " +
          "CAST(kden // greatest(gcd(knum, kden), 1) AS BIGINT) AS kden " +
          s"FROM kraw$tag)"
      s"WITH r AS (${ratingsSql(withAbstain = false)}), " +
        "cnts AS (SELECT item, lbl, count(*) AS n FROM r GROUP BY 1, 2), " +
        "maj AS (SELECT item, lbl AS maj_label FROM (SELECT item, lbl, " +
        "row_number() OVER (PARTITION BY item ORDER BY n DESC, lbl) AS rn " +
        "FROM cnts) WHERE rn = 1), " +
        "rq AS (SELECT rater, sum(CASE WHEN r.lbl = maj.maj_label " +
        "THEN 1 ELSE 0 END) AS n_match FROM r JOIN maj USING (item) " +
        "GROUP BY rater), " +
        "worst AS (SELECT rater AS worst_rater FROM (SELECT rater, " +
        "row_number() OVER (ORDER BY n_match ASC, rater ASC) AS rn " +
        "FROM rq) WHERE rn = 1), " +
        "rp AS (SELECT r.* FROM r CROSS JOIN worst " +
        "WHERE r.rater <> worst.worst_rater), " +
        fleiss("r", 5, "b") + ", " + fleiss("rp", 4, "a") + " " +
        "SELECT kb.n_items, kb.knum AS kappa_before_num, " +
        "kb.kden AS kappa_before_den, " +
        "CAST(worst.worst_rater AS BIGINT) AS worst_rater, " +
        "ka.knum AS kappa_after_num, ka.kden AS kappa_after_den " +
        "FROM kb, worst, ka"
    },

    "q_kr20" -> {
      val oks = (0 until 5).map(r =>
        s"CASE WHEN ${Agreement.raterLabelSql(r)} = event_type " +
          s"THEN 1 ELSE 0 END AS ok$r").mkString(", ")
      val tSum = (0 until 5).map(r => s"ok$r").mkString(" + ")
      val cSums = (0 until 5).map(r =>
        s"CAST(sum(ok$r) AS BIGINT) AS c$r").mkString(", ")
      val ciNci = (0 until 5).map(r => s"c$r * (n - c$r)").mkString(" + ")
      s"WITH f AS (SELECT $oks FROM events), " +
        s"a AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        s"CAST(sum($tSum) AS BIGINT) AS st, " +
        s"CAST(sum(($tSum) * ($tSum)) AS BIGINT) AS st2, $cSums FROM f) " +
        "SELECT n, CAST(5 AS BIGINT) AS k_raters, " +
        "CAST(n * st2 - st * st AS BIGINT) AS var_n2, " +
        s"CAST(5 * (n * st2 - st * st - ($ciNci)) AS BIGINT) AS kr20_num, " +
        "CAST(4 * (n * st2 - st * st) AS BIGINT) AS kr20_den FROM a"
    },

    "q_gwet_ac1" ->
      (s"WITH p AS (SELECT ${Agreement.raterLabelSql(0)} AS a, " +
        s"${Agreement.raterLabelSql(1)} AS b FROM events), " +
        "conf AS (SELECT a, b, CAST(count(*) AS BIGINT) AS cnt " +
        "FROM p GROUP BY a, b), " +
        "tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n, " +
        "CAST(sum(CASE WHEN a = b THEN cnt ELSE 0 END) AS BIGINT) " +
        "AS n_agree FROM conf), " +
        "cats AS (SELECT CAST(count(DISTINCT q) AS BIGINT) AS k_cats " +
        "FROM (SELECT a AS q FROM conf UNION ALL SELECT b FROM conf)), " +
        "ra AS (SELECT a AS q, sum(cnt) AS r FROM conf GROUP BY a), " +
        "cb AS (SELECT b AS q, sum(cnt) AS c FROM conf GROUP BY b), " +
        "marg AS (SELECT CAST(sum(CAST(coalesce(r, 0) + coalesce(c, 0) " +
        "AS HUGEINT) * (2 * tot.n - coalesce(r, 0) - coalesce(c, 0))) " +
        "AS HUGEINT) AS p FROM ra FULL JOIN cb USING (q) CROSS JOIN tot), " +
        // HUGEINT rational kept internal; emitted gcd-reduced as BIGINT
        // (gate outputs may not be DECIMAL — GateSchemaSpec; `//` is
        // exact here so truncating == floor == BigInteger.divide)
        "rat AS (SELECT tot.n, tot.n_agree, cats.k_cats, " +
        "CAST(tot.n_agree AS HUGEINT) * (CAST(4 AS HUGEINT) * " +
        "tot.n * tot.n * (cats.k_cats - 1)) - " +
        "CAST(tot.n AS HUGEINT) * marg.p AS num, " +
        "CAST(tot.n AS HUGEINT) * (CAST(4 AS HUGEINT) * tot.n * " +
        "tot.n * (cats.k_cats - 1) - marg.p) AS den " +
        "FROM tot CROSS JOIN cats CROSS JOIN marg) " +
        "SELECT n, n_agree, k_cats AS n_categories, " +
        "CAST(num // greatest(gcd(num, den), 1) AS BIGINT) AS ac1_num, " +
        "CAST(den // greatest(gcd(num, den), 1) AS BIGINT) AS ac1_den " +
        "FROM rat"),

    "q_mcnemar_raters" ->
      (s"WITH p AS (SELECT event_type AS truth, " +
        s"${Agreement.raterLabelSql(0)} AS a, " +
        s"${Agreement.raterLabelSql(1)} AS b FROM events), " +
        "g AS (SELECT truth, CAST(count(*) AS BIGINT) AS n_items, " +
        "CAST(sum(CASE WHEN a = truth AND b <> truth THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_a_only, " +
        "CAST(sum(CASE WHEN b = truth AND a <> truth THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_b_only FROM p GROUP BY truth) " +
        "SELECT truth, n_items, n_a_only, n_b_only, " +
        "CAST((n_a_only - n_b_only) * (n_a_only - n_b_only) AS BIGINT) " +
        "AS mcnemar_num, " +
        "CAST(n_a_only + n_b_only AS BIGINT) AS mcnemar_den FROM g"),

    "q_cohens_kappa" ->
      (s"WITH p AS (SELECT ${Agreement.raterLabelSql(0)} AS a, " +
        s"${Agreement.raterLabelSql(1)} AS b FROM events), " +
        "conf AS (SELECT a, b, count(*) AS cnt FROM p GROUP BY a, b), " +
        "tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n, " +
        "CAST(sum(CASE WHEN a = b THEN cnt ELSE 0 END) AS BIGINT) AS n_agree " +
        "FROM conf), " +
        "ra AS (SELECT a, CAST(sum(cnt) AS BIGINT) AS r FROM conf GROUP BY a), " +
        "cb AS (SELECT b, CAST(sum(cnt) AS BIGINT) AS c FROM conf GROUP BY b), " +
        "rc AS (SELECT CAST(sum(r * c) AS BIGINT) AS sum_rc " +
        "FROM ra JOIN cb ON ra.a = cb.b) " +
        "SELECT n, n_agree, " +
        "CAST(n * n_agree - sum_rc AS BIGINT) AS kappa_num, " +
        "CAST(n * n - sum_rc AS BIGINT) AS kappa_den FROM tot, rc"),

    "q_weighted_kappa" -> {
      def sc(c: String) = Agreement.Labels.zipWithIndex
        .map { case (l, i) => s"WHEN $c = '$l' THEN $i" }
        .mkString("CASE ", " ", " END")
      s"WITH p AS (SELECT ${Agreement.raterLabelSql(0)} AS a, " +
        s"${Agreement.raterLabelSql(2)} AS b FROM events), " +
        "conf AS (SELECT a, b, count(*) AS cnt FROM p GROUP BY a, b), " +
        s"w AS (SELECT a, b, cnt, (${sc("a")} - ${sc("b")}) * " +
        s"(${sc("a")} - ${sc("b")}) AS ww FROM conf), " +
        "obs AS (SELECT CAST(sum(cnt) AS BIGINT) AS n, " +
        "CAST(sum(ww * cnt) AS BIGINT) AS obs_w FROM w), " +
        "ra AS (SELECT a, CAST(sum(cnt) AS BIGINT) AS r FROM conf " +
        "GROUP BY a), " +
        "cb AS (SELECT b, CAST(sum(cnt) AS BIGINT) AS c FROM conf " +
        "GROUP BY b), " +
        s"ex AS (SELECT CAST(sum((${sc("ra.a")} - ${sc("cb.b")}) * " +
        s"(${sc("ra.a")} - ${sc("cb.b")}) * ra.r * cb.c) AS BIGINT) " +
        "AS exp_w FROM ra CROSS JOIN cb) " +
        "SELECT n, obs_w, exp_w, " +
        "CAST(exp_w - n * obs_w AS BIGINT) AS kappa_num, " +
        "exp_w AS kappa_den FROM obs, ex"
    },

    "q_fleiss_kappa" ->
      (s"WITH r AS (${ratingsSql(withAbstain = false)}), " +
        "nij AS (SELECT item, lbl, count(*) AS cnt FROM r GROUP BY 1, 2), " +
        "core AS (SELECT CAST(sum(cnt * cnt) AS BIGINT) AS sum_sq, " +
        "CAST(sum(cnt) AS BIGINT) AS nm, " +
        "CAST(count(DISTINCT item) AS BIGINT) AS n_items FROM nij), " +
        "cj AS (SELECT CAST(sum(c * c) AS BIGINT) AS sum_c2 FROM " +
        "(SELECT lbl, sum(cnt) AS c FROM nij GROUP BY lbl)), " +
        // HUGEINT products + gcd-reduce, mirroring the Scala
        // DECIMAL(38,0) + RatReduceExpr lane (N³m⁴ outgrows BIGINT)
        "raw AS (SELECT n_items, " +
        "CAST(sum_sq - n_items * 5 AS HUGEINT) * CAST(nm AS HUGEINT) * " +
        "CAST(nm AS HUGEINT) - CAST(sum_c2 AS HUGEINT) * " +
        "CAST(n_items * 20 AS HUGEINT) AS knum, " +
        "CAST(n_items * 20 AS HUGEINT) * (CAST(nm AS HUGEINT) * " +
        "CAST(nm AS HUGEINT) - CAST(sum_c2 AS HUGEINT)) AS kden " +
        "FROM core, cj) " +
        "SELECT n_items, CAST(5 AS BIGINT) AS m, " +
        "CAST(knum // greatest(gcd(knum, kden), 1) AS BIGINT) AS kappa_num, " +
        "CAST(kden // greatest(gcd(knum, kden), 1) AS BIGINT) AS kappa_den " +
        "FROM raw"),

    "q_krippendorff_alpha" ->
      (s"WITH r AS (${ratingsSql(withAbstain = true)}), " +
        "nuc AS (SELECT item, lbl, count(*) AS cnt FROM r " +
        "WHERE lbl IS NOT NULL GROUP BY 1, 2), " +
        "mu AS (SELECT item, sum(cnt) AS m_u FROM nuc GROUP BY item " +
        "HAVING sum(cnt) >= 2), " +
        "kept AS (SELECT nuc.item, nuc.lbl, nuc.cnt, mu.m_u " +
        "FROM nuc JOIN mu USING (item)), " +
        "core AS (SELECT CAST(sum(cnt * (m_u - cnt) * 12 // (m_u - 1)) " +
        "AS BIGINT) AS do12, CAST(sum(cnt) AS BIGINT) AS n_ratings, " +
        "CAST(count(DISTINCT item) AS BIGINT) AS n_units FROM kept), " +
        "de AS (SELECT CAST(sum(c * (n_tot - c)) AS BIGINT) AS de_num FROM " +
        "(SELECT lbl, sum(cnt) AS c FROM kept GROUP BY lbl), " +
        "(SELECT sum(cnt) AS n_tot FROM kept)) " +
        "SELECT n_ratings, n_units, do12, de_num, " +
        "CAST(12 * de_num - do12 * (n_ratings - 1) AS BIGINT) AS alpha_num, " +
        "CAST(12 * de_num AS BIGINT) AS alpha_den FROM core, de"),

    "q_majority_label" ->
      (s"WITH r AS (${ratingsSql(withAbstain = false)}), " +
        "cnts AS (SELECT item, lbl, count(*) AS n FROM r GROUP BY 1, 2), " +
        "tot AS (SELECT item, CAST(sum(n) AS BIGINT) AS m_raters " +
        "FROM cnts GROUP BY item), " +
        "maj AS (SELECT item, lbl AS maj_label, n AS n_votes FROM " +
        "(SELECT item, lbl, n, row_number() OVER " +
        "(PARTITION BY item ORDER BY n DESC, lbl) AS rn FROM cnts) " +
        "WHERE rn = 1) " +
        "SELECT e.event_type AS truth, m.maj_label, " +
        "CAST(count(*) AS BIGINT) AS n_items, " +
        "CAST(sum(m.n_votes) AS BIGINT) AS sum_votes " +
        "FROM maj m JOIN events e ON m.item = e.event_id GROUP BY 1, 2"),

    "q_rater_quality" ->
      (s"WITH r AS (${ratingsSql(withAbstain = false)}), " +
        "cnts AS (SELECT item, lbl, count(*) AS n FROM r GROUP BY 1, 2), " +
        "maj AS (SELECT item, lbl AS maj_label FROM " +
        "(SELECT item, lbl, row_number() OVER " +
        "(PARTITION BY item ORDER BY n DESC, lbl) AS rn FROM cnts) " +
        "WHERE rn = 1) " +
        "SELECT r.rater, CAST(count(*) AS BIGINT) AS n_rated, " +
        "CAST(sum(CASE WHEN r.lbl = maj.maj_label THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_match, " +
        "CAST(sum(CASE WHEN r.lbl = maj.maj_label THEN 1 ELSE 0 END) " +
        "* 10000 // count(*) AS BIGINT) AS acc_q " +
        "FROM r JOIN maj USING (item) GROUP BY r.rater"),

    "q_copeland_rank" ->
      (s"WITH $duelsSql, " +
        "norm AS (SELECT least(a, b) AS lo, greatest(a, b) AS hi, w FROM d), " +
        "pair AS (SELECT lo, hi, " +
        "sum(CASE WHEN w = lo THEN 1 ELSE 0 END) AS w_lo, " +
        "sum(CASE WHEN w = hi THEN 1 ELSE 0 END) AS w_hi " +
        "FROM norm GROUP BY lo, hi), " +
        "res AS (SELECT lo, hi, CASE WHEN w_lo > w_hi THEN 1 " +
        "WHEN w_hi > w_lo THEN -1 ELSE 0 END AS r FROM pair), " +
        "sides AS (SELECT lo AS model, r FROM res " +
        "UNION ALL SELECT hi AS model, -r AS r FROM res) " +
        "SELECT CAST(model AS BIGINT) AS model, " +
        "CAST(sum(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT) AS wins, " +
        "CAST(sum(CASE WHEN r = -1 THEN 1 ELSE 0 END) AS BIGINT) AS losses, " +
        "CAST(sum(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ties, " +
        "CAST(2 * sum(CASE WHEN r = 1 THEN 1 ELSE 0 END) + " +
        "sum(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS BIGINT) AS copeland_x2 " +
        "FROM sides GROUP BY model"),

    "q_bradley_terry" ->
      (s"WITH $duelsSql, " +
        "wn AS (SELECT w AS i, CAST(count(*) AS BIGINT) AS wins " +
        "FROM d GROUP BY w), " +
        "pm AS (SELECT least(a, b) AS lo, greatest(a, b) AS hi, " +
        "CAST(count(*) AS BIGINT) AS m FROM d GROUP BY 1, 2), " +
        "adj AS (SELECT lo AS i, hi AS j, m FROM pm " +
        "UNION ALL SELECT hi AS i, lo AS j, m FROM pm), " +
        "nd AS (SELECT i, CAST(sum(m) AS BIGINT) AS n_duels " +
        "FROM adj GROUP BY i), " +
        // round 1 from p0 = 1: denominator folded in ascending-j order
        "p1 AS (SELECT wn.i, wn.wins, CAST(wn.wins AS DOUBLE) / " +
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
        "list(CAST(adj.m AS DOUBLE) / (1.0 + 1.0) ORDER BY adj.j)), " +
        "(acc, x) -> acc + x) AS p " +
        "FROM wn JOIN adj ON adj.i = wn.i GROUP BY wn.i, wn.wins), " +
        "p2 AS (SELECT w2.i, CAST(w2.wins AS DOUBLE) / " +
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
        "list(CAST(a2.m AS DOUBLE) / (pi.p + pj.p) ORDER BY a2.j)), " +
        "(acc, x) -> acc + x) AS p " +
        "FROM wn w2 JOIN adj a2 ON a2.i = w2.i " +
        "JOIN p1 pi ON pi.i = a2.i JOIN p1 pj ON pj.i = a2.j " +
        "GROUP BY w2.i, w2.wins) " +
        "SELECT p1.i AS model, p1.wins, nd.n_duels, p1.p AS p1, " +
        "p2.p AS p2 FROM p1 JOIN p2 ON p2.i = p1.i " +
        "JOIN nd ON nd.i = p1.i"),

    "q_borda_rank" ->
      ("WITH c AS (SELECT user_id, event_type AS candidate, count(*) AS m " +
        "FROM events GROUP BY 1, 2), " +
        "rk AS (SELECT user_id, candidate, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY m DESC, candidate) " +
        "AS rnk, count(*) OVER (PARTITION BY user_id) AS np FROM c) " +
        "SELECT candidate, CAST(sum(np - rnk) AS BIGINT) AS borda_points, " +
        "CAST(count(*) AS BIGINT) AS n_voters FROM rk GROUP BY candidate"),

    "q_bandit_replay" -> {
      // Recursive replay of the deterministic policy walk: the inner
      // nesting binds the chosen arm (cold-start first-unplayed, else
      // cross-multiplied argmax with earliest-max ties), the next binds
      // its reward, the outer updates the 5x(sum,count) integer state.
      val arms = Agreement.Labels
      val idx = arms.indices
      val rcols = idx.map(i =>
        s"CAST(sum(CASE WHEN arm = '${arms(i)}' THEN r ELSE 0 END) " +
          s"AS BIGINT) AS r$i").mkString(", ")
      val h = s"((sq.period * ${graft.ops.Bandit.HashA} + " +
        s"${graft.ops.Bandit.HashC}) % ${graft.ops.Bandit.HashP})"
      val cold = idx.map(i => s"WHEN pr.c$i = 0 THEN $i").mkString(" ")
      val argmax = idx.map { i =>
        val conds = idx.filter(_ != i)
          .map(j => s"pr.s$i * pr.c$j >= pr.s$j * pr.c$i")
        s"WHEN ${conds.mkString(" AND ")} THEN $i"
      }.mkString(" ")
      val chosen = s"CASE WHEN $h % 4 = 0 THEN ($h // 4) % ${arms.size} " +
        s"ELSE (CASE $cold $argmax END) END"
      val rw = s"CASE ch ${idx.map(i => s"WHEN $i THEN r$i").mkString(" ")} END"
      val armName =
        s"CASE ch ${idx.map(i => s"WHEN $i THEN '${arms(i)}'").mkString(" ")} END"
      val stateInit = idx.map(i =>
        s"CAST(0 AS BIGINT) AS s$i, CAST(0 AS BIGINT) AS c$i").mkString(", ")
      val stateStep = idx.map(i =>
        s"s$i + CASE WHEN ch = $i THEN rw ELSE 0 END AS s$i, " +
          s"c$i + CASE WHEN ch = $i THEN 1 ELSE 0 END AS c$i").mkString(", ")
      val passState = idx.map(i => s"pr.s$i, pr.c$i").mkString(", ")
      "WITH RECURSIVE base AS (SELECT epoch_us(ts) // 86400000000 " +
        "AS period, event_type AS arm, CAST(floor(value) AS BIGINT) AS r " +
        "FROM events), " +
        s"g AS (SELECT period, $rcols FROM base GROUP BY period), " +
        "seq AS (SELECT *, row_number() OVER (ORDER BY period) AS t " +
        "FROM g), " +
        "rec AS (SELECT CAST(0 AS BIGINT) AS t, " +
        "CAST(NULL AS BIGINT) AS period, CAST(NULL AS INT) AS explored, " +
        "CAST(NULL AS VARCHAR) AS chosen_arm, " +
        "CAST(NULL AS BIGINT) AS reward, CAST(0 AS BIGINT) AS cum_reward, " +
        s"$stateInit " +
        "UNION ALL " +
        "SELECT t, period, explored, " +
        s"$armName AS chosen_arm, rw AS reward, " +
        s"cum_reward + rw AS cum_reward, $stateStep FROM (" +
        s"SELECT i1.*, $rw AS rw FROM (" +
        "SELECT sq.t, sq.period, " +
        s"CAST(CASE WHEN $h % 4 = 0 THEN 1 ELSE 0 END AS INT) AS explored, " +
        s"$chosen AS ch, " +
        idx.map(i => s"sq.r$i").mkString(", ") + ", " +
        s"pr.cum_reward, $passState " +
        "FROM rec pr JOIN seq sq ON sq.t = pr.t + 1) i1)) " +
        "SELECT period, t, explored, chosen_arm, reward, cum_reward " +
        "FROM rec WHERE t >= 1"
    },

    "q_mantel_haenszel" ->
      ("WITH e AS (SELECT epoch_us(ts) // 86400000000 % 7 AS s, " +
        "(user_id % 2 = 0) AS tr, (event_type = 'click') AS oc " +
        "FROM events WHERE event_type IN ('click', 'view')), " +
        "c AS (SELECT s, " +
        "CAST(sum(CASE WHEN tr AND oc THEN 1 ELSE 0 END) AS BIGINT) AS a, " +
        "CAST(sum(CASE WHEN tr AND NOT oc THEN 1 ELSE 0 END) AS BIGINT) AS b, " +
        "CAST(sum(CASE WHEN NOT tr AND oc THEN 1 ELSE 0 END) AS BIGINT) AS c, " +
        "CAST(sum(CASE WHEN NOT tr AND NOT oc THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS d FROM e GROUP BY s), " +
        "f AS (SELECT CAST(count(*) AS BIGINT) AS n_strata, " +
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
        "list(CAST(a * d AS DOUBLE) / (a + b + c + d) ORDER BY s)), " +
        "(x, y) -> x + y) AS mh_num, " +
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
        "list(CAST(b * c AS DOUBLE) / (a + b + c + d) ORDER BY s)), " +
        "(x, y) -> x + y) AS mh_den FROM c) " +
        "SELECT n_strata, mh_num, mh_den, mh_num / mh_den AS mh_or FROM f"),

    "q_cochran_armitage" ->
      ("WITH e AS (SELECT CAST(floor(value) AS BIGINT) // 100 AS s, " +
        "(event_type = 'purchase') AS oc FROM events " +
        "WHERE event_type IN ('click', 'purchase')), " +
        "g AS (SELECT s, " +
        "CAST(sum(CASE WHEN oc THEN 1 ELSE 0 END) AS BIGINT) AS a, " +
        "CAST(count(*) AS BIGINT) AS n FROM e GROUP BY s) " +
        "SELECT CAST(count(*) AS BIGINT) AS n_groups, " +
        "CAST(sum(a) AS BIGINT) AS total_success, " +
        "CAST(sum(n) AS BIGINT) AS total_n, " +
        "CAST(sum(n) * sum(s * a) - sum(a) * sum(s * n) AS BIGINT) " +
        "AS t_num, CAST(sum(s * n) AS BIGINT) AS sum_sn, " +
        "CAST(sum(s * s * n) AS BIGINT) AS sum_s2n FROM g"),

    "q_kendall_w" ->
      (s"WITH $gridSql, " +
        "rj AS (SELECT lbl, CAST(sum(rank2) AS BIGINT) AS r2 FROM r2 GROUP BY lbl), " +
        "dims AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS m, " +
        "CAST(count(DISTINCT lbl) AS BIGINT) AS n FROM r2), " +
        "ties AS (SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tie_sum FROM " +
        "(SELECT user_id, metric, count(*) AS t FROM g GROUP BY 1, 2)), " +
        "s4 AS (SELECT CAST(sum((r2 - m * (n + 1)) * (r2 - m * (n + 1))) " +
        "AS BIGINT) AS s4 FROM rj, dims) " +
        "SELECT CAST(3 * s4 AS BIGINT) AS w_num, " +
        "CAST(m * m * (n * n * n - n) - m * tie_sum AS BIGINT) AS w_den, " +
        "s4, tie_sum, m AS n_blocks, n AS k_treatments " +
        "FROM dims, ties, s4"),

    "q_page_trend" ->
      (s"WITH $gridSql, " +
        "rj AS (SELECT lbl, CAST(sum(rank2) AS BIGINT) AS r2, " +
        "CAST(count(DISTINCT user_id) AS BIGINT) AS m FROM r2 GROUP BY lbl), " +
        "j AS (SELECT lbl, r2, m, CASE lbl WHEN 'click' THEN 1 " +
        "WHEN 'error' THEN 2 WHEN 'purchase' THEN 3 WHEN 'signup' THEN 4 " +
        "WHEN 'view' THEN 5 END AS jj FROM rj) " +
        "SELECT CAST(sum(jj * r2) AS BIGINT) AS l2, " +
        "CAST(max(m) AS BIGINT) AS n_blocks, " +
        "CAST(count(*) AS BIGINT) AS k_treatments FROM j"))
}
