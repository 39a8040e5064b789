package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops.Agreement

/** Agreement statistics against hand-computed textbook cases — the
  * integer rationals must hit the published values exactly, not
  * approximately. */
class AgreementSpec extends SparkSpec {

  import spark.implicits._

  test("Cohen's kappa: textbook 2x2 grid (Wikipedia example)") {
    // 20a/5b | 10a/15b readers: a=25, b=25; diag 20+15=35, n=50.
    // po=0.7, pe=0.5 -> kappa = 0.4 = 10/25 -> num/den reduce equal.
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val out = Agreement.cohensKappa(rows.toDF("a", "b"), "a", "b").head()
    assert(out.getAs[Long]("n") == 50L)
    assert(out.getAs[Long]("n_agree") == 35L)
    val (num, den) =
      (out.getAs[Long]("kappa_num"), out.getAs[Long]("kappa_den"))
    // kappa = 0.4 exactly
    assert(num * 5 == den * 2, s"kappa $num/$den is not 0.4")
  }

  test("Cohen's kappa: perfect agreement has num == den (kappa = 1)") {
    val rows = Seq(("x", "x"), ("y", "y"), ("z", "z"), ("x", "x"))
    val out = Agreement.cohensKappa(rows.toDF("a", "b"), "a", "b").head()
    assert(out.getAs[Long]("kappa_num") == out.getAs[Long]("kappa_den"))
  }

  test("KR-20: hand-computed 3-rater/4-item panel (Guttman ladder) " +
      "gives exactly 30/40; a random-flag panel drives it toward 0") {
    // t = (3,2,1,0), c = (3,2,1): var_n2 = 4*14-36 = 20,
    // sum c(n-c) = 10 -> num = 3*(20-10) = 30, den = 2*20 = 40
    val rows = Seq((1L, 1L, 1L), (1L, 1L, 0L), (1L, 0L, 0L), (0L, 0L, 0L))
    val r = Agreement.kr20(rows.toDF("a", "b", "c"), Seq("a", "b", "c"))
      .head()
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("k_raters") == 3L)
    assert(r.getAs[Long]("var_n2") == 20L)
    assert(r.getAs[Long]("kr20_num") == 30L)
    assert(r.getAs[Long]("kr20_den") == 40L)
    // independent-looking flags: reliability far below the ladder's 3/4
    val noisy = (0 until 64).map(i =>
      ((i & 1).toLong, ((i >> 1) & 1).toLong, ((i >> 2) & 1).toLong))
    val nr = Agreement.kr20(noisy.toDF("a", "b", "c"), Seq("a", "b", "c"))
      .head()
    // exact zero for fully balanced independent items
    assert(nr.getAs[Long]("kr20_num") == 0L)
  }

  test("Gwet AC1: hand-computed prevalence-skewed grid — AC1 stays " +
      "calibrated where kappa collapses (the kappa paradox)") {
    // 80 yy / 10 yn / 5 ny / 5 nn: po=0.85; AC1 pe = 8750/40000 ->
    // AC1 = 2525000/3125000 = 101/125 = 0.808 (emitted gcd-reduced,
    // gcd = 25000); kappa = 0.07/0.22 ~ 0.318.
    val rows = Seq.fill(80)(("y", "y")) ++ Seq.fill(10)(("y", "n")) ++
      Seq.fill(5)(("n", "y")) ++ Seq.fill(5)(("n", "n"))
    val r = Agreement.gwetAc1(rows.toDF("a", "b"), "a", "b").head()
    assert(r.getAs[Long]("n") == 100L)
    assert(r.getAs[Long]("n_agree") == 85L)
    assert(r.getAs[Long]("n_categories") == 2L)
    val num = r.getAs[Long]("ac1_num")
    val den = r.getAs[Long]("ac1_den")
    assert(num == 101L && den == 125L)
    // the paradox: on the same grid AC1 > kappa (cross-multiplied)
    val k = Agreement.cohensKappa(rows.toDF("a", "b"), "a", "b").head()
    val kNum = k.getAs[Long]("kappa_num")
    val kDen = k.getAs[Long]("kappa_den")
    assert(BigInt(num) * BigInt(kDen) > BigInt(kNum) * BigInt(den))
  }

  test("McNemar: hand-counted discordant pairs per truth stratum; " +
      "concordant pairs carry no information") {
    // truth "x": A-only correct 3x, B-only 1x, both 1x, neither 2x
    //  -> b=3, c=1, num=(3-1)^2=4, den=4
    // truth "y": raters never disagree -> den=0 (caller's NULL surface)
    val rows =
      Seq.fill(3)(("x", "x", "w")) ++ Seq(("x", "w", "x")) ++
        Seq(("x", "x", "x")) ++ Seq.fill(2)(("x", "w", "w")) ++
        Seq.fill(4)(("y", "y", "y"))
    val out = Agreement.mcnemar(rows.toDF("truth", "a", "b"),
      "truth", "a", "b")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))).toMap
    assert(out("x") == ((7L, 3L, 1L, 4L, 4L)))
    assert(out("y") == ((4L, 0L, 0L, 0L, 0L)))
  }

  test("Fleiss' kappa: unanimous panel gives kappa = 1, split panel < 1") {
    val unan = (0L until 10L).flatMap(i =>
      Seq.fill(3)((i, if (i % 2 == 0) "a" else "b")))
    val u = Agreement.fleissKappa(unan.toDF("item", "lbl"), "item", "lbl", 3)
      .head()
    assert(u.getAs[Long]("kappa_num") == u.getAs[Long]("kappa_den"))
    val split = (0L until 10L).flatMap(i => Seq((i, "a"), (i, "b"), (i, "a")))
    val sp = Agreement.fleissKappa(split.toDF("item", "lbl"), "item", "lbl", 3)
      .head()
    assert(sp.getAs[Long]("kappa_num") < sp.getAs[Long]("kappa_den"))
  }

  test("Krippendorff alpha: unanimous units -> alpha = 1 (Do = 0); " +
      "units with < 2 ratings are dropped") {
    val df = Seq(
      (1L, "a"), (1L, "a"), (1L, "a"), // unanimous triple
      (2L, "b"), (2L, "b"), // unanimous pair
      (3L, "c") // single rating: dropped
    ).toDF("item", "lbl")
    val out = Agreement.krippendorffAlpha(df, "item", "lbl").head()
    assert(out.getAs[Long]("n_units") == 2L)
    assert(out.getAs[Long]("n_ratings") == 5L)
    assert(out.getAs[Long]("do12") == 0L)
    assert(out.getAs[Long]("alpha_num") == out.getAs[Long]("alpha_den"))
  }

  test("Krippendorff alpha: hand-computed mixed-panel example is " +
      "exactly 0.2") {
    // Units with m_u in {2,3}: values chosen so Do12 and De_num are
    // hand-checkable (comments below walk the arithmetic).
    val df = Seq(
      (1L, "a"), (1L, "a"),
      (2L, "b"), (2L, "b"),
      (3L, "a"), (3L, "b"),
      (4L, "a"), (4L, "a"), (4L, "b")
    ).toDF("item", "lbl")
    val out = Agreement.krippendorffAlpha(df, "item", "lbl").head()
    // n=9, c_a=5, c_b=4 -> De_num = 5*4 + 4*5 = 40
    assert(out.getAs[Long]("de_num") == 40L)
    // Do12: units 1,2 contribute 0; unit 3: 12*(1*1)/1 * 2 terms = 24;
    // unit 4: per label a: 2*(3-2)=2, b: 1*(3-1)=2 -> 12*(2+2)/2 = 24.
    assert(out.getAs[Long]("do12") == 48L)
    // alpha = 1 - 48*8/(12*40) = 1 - 0.8 = 0.2
    val (num, den) =
      (out.getAs[Long]("alpha_num"), out.getAs[Long]("alpha_den"))
    assert(num * 5 == den * 1, s"alpha $num/$den is not 0.2")
  }

  test("majority vote ties break to the lexicographically smallest label") {
    val df = Seq((1L, "b"), (1L, "a"), (1L, "c"), (1L, "a"), (1L, "b"))
      .toDF("item", "lbl")
    val out = Agreement.majorityVote(df, "item", "lbl").head()
    assert(out.getAs[String]("maj_label") == "a")
    assert(out.getAs[Long]("n_votes") == 2L)
    assert(out.getAs[Long]("m_raters") == 5L)
  }

  test("Copeland: a model winning every pair majority gets score 2*(k-1)") {
    // model 2 beats 0 and 1; models 0 and 1 tie each other.
    val duels = Seq(
      (2L, 0L, 2L), (2L, 0L, 2L), (0L, 2L, 0L),
      (2L, 1L, 2L), (1L, 2L, 2L),
      (0L, 1L, 0L), (1L, 0L, 1L)
    ).toDF("a", "b", "w")
    val rows = Agreement.copelandScores(duels, "a", "b", "w")
      .collect().map(r => r.getAs[Long]("model") ->
        (r.getAs[Long]("wins"), r.getAs[Long]("losses"),
          r.getAs[Long]("ties"), r.getAs[Long]("copeland_x2"))).toMap
    assert(rows(2L) == ((2L, 0L, 0L, 4L)))
    assert(rows(0L) == ((0L, 1L, 1L, 1L)))
    assert(rows(1L) == ((0L, 1L, 1L, 1L)))
  }

  test("Borda: points are n_present - rank with (metric desc, label asc) " +
      "tie-break") {
    val prefs = Seq(
      ("v1", "x", 5L), ("v1", "y", 5L), ("v1", "z", 1L),
      ("v2", "y", 9L), ("v2", "z", 3L)
    ).toDF("voter", "cand", "m")
    val rows = Agreement.bordaScores(prefs, "voter", "cand", "m")
      .collect().map(r => r.getAs[String]("candidate") ->
        r.getAs[Long]("borda_points")).toMap
    // v1: x rank1 (2pt), y rank2 (1pt), z rank3 (0); v2: y rank1 (1), z 0.
    assert(rows("x") == 2L && rows("y") == 2L && rows("z") == 0L)
  }

  test("Kendall's W: identical rankings across blocks -> W = 1; " +
      "includes the tie-corrected denominator") {
    val grid = for (b <- 1L to 4L; t <- Seq(("a", 3L), ("b", 2L), ("c", 1L)))
      yield (b, t._1, t._2)
    val out = Agreement.kendallW(grid.toDF("block", "treat", "metric"),
      "block", "treat", "metric").head()
    assert(out.getAs[Long]("w_num") == out.getAs[Long]("w_den"),
      "perfect concordance must give W = 1")
    assert(out.getAs[Long]("tie_sum") == 0L)
  }

  test("Page's L: monotone metric in hypothesis order hits the maximum " +
      "m * sum(2*j*j)") {
    // metric increases along the order a < b < c, every block agrees.
    val grid = for (b <- 1L to 3L; t <- Seq(("a", 1L), ("b", 2L), ("c", 3L)))
      yield (b, t._1, t._2)
    val out = Agreement.pageTrendL(grid.toDF("block", "treat", "metric"),
      "block", "treat", "metric", Seq("a", "b", "c")).head()
    // rank2 of j-th treatment = 2j; L2 = m * sum j*2j = 3 * (2+8+18) = 84
    assert(out.getAs[Long]("l2") == 84L)
    assert(out.getAs[Long]("n_blocks") == 3L)
    assert(out.getAs[Long]("k_treatments") == 3L)
  }

  test("weighted kappa: perfect agreement gives num == den; adjacent " +
      "disagreements hurt less than distant ones") {
    val order = Seq("a", "b", "c")
    val perfect = Seq(("a", "a"), ("b", "b"), ("c", "c"), ("a", "a"))
      .toDF("x", "y")
    val p = Agreement.weightedKappa(perfect, "x", "y", order).head()
    assert(p.getAs[Long]("obs_w") == 0L)
    assert(p.getAs[Long]("kappa_num") == p.getAs[Long]("kappa_den"))
    // same marginals, one near-miss vs one far-miss: far-miss has the
    // larger observed weight, so the smaller kappa numerator
    val near = Seq(("a", "b"), ("b", "b"), ("c", "c")).toDF("x", "y")
    val far = Seq(("a", "c"), ("b", "b"), ("c", "c")).toDF("x", "y")
    val kn = Agreement.weightedKappa(near, "x", "y", order).head()
    val kf = Agreement.weightedKappa(far, "x", "y", order).head()
    assert(kn.getAs[Long]("obs_w") == 1L && kf.getAs[Long]("obs_w") == 4L)
  }

  test("Bradley-Terry MM: strengths order by true dominance, and the " +
      "two-model closed form is exact") {
    // two models, A beats B 3 of 4 -> after round 1:
    // pA = 3 / (4/2) = 1.5, pB = 1 / (4/2) = 0.5
    // round 2: pA = 3 / (4/(1.5+0.5)) = 1.5, pB = 1/(4/2) = 0.5 (fixed point)
    val duels = Seq((0L, 1L, 0L), (0L, 1L, 0L), (1L, 0L, 0L), (1L, 0L, 1L))
      .toDF("a", "b", "w")
    val rows = Agreement.bradleyTerryMM(duels, "a", "b", "w")
      .collect().map(r => r.getAs[Long]("model") ->
        (r.getAs[Long]("wins"), r.getAs[Double]("p1"),
          r.getAs[Double]("p2"))).toMap
    assert(rows(0L) == ((3L, 1.5, 1.5)))
    assert(rows(1L) == ((1L, 0.5, 0.5)))
    // three models with transitive dominance: strengths must order
    val tri = Seq(
      (0L, 1L, 0L), (0L, 1L, 0L), (0L, 1L, 1L),
      (1L, 2L, 1L), (1L, 2L, 1L), (1L, 2L, 2L),
      (0L, 2L, 0L), (0L, 2L, 0L), (0L, 2L, 0L), (0L, 2L, 2L))
      .toDF("a", "b", "w")
    val p2 = Agreement.bradleyTerryMM(tri, "a", "b", "w")
      .collect().map(r => r.getAs[Long]("model") -> r.getAs[Double]("p2"))
      .toMap
    assert(p2(0L) > p2(1L) && p2(1L) > p2(2L),
      s"dominance order must survive the fit: $p2")
    // a model with zero wins fails loud
    val zero = Seq((0L, 1L, 0L), (0L, 1L, 0L)).toDF("a", "b", "w")
    intercept[IllegalArgumentException](
      Agreement.bradleyTerryMM(zero, "a", "b", "w").collect())
  }

  test("fixture: rater accuracy ramps with rater index (the hash panel " +
      "really encodes skill)") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_id"), col("event_type"))
    val accs = (0 until 5).map { r =>
      val m = ev.select(
        sum(when(Agreement.raterLabel(r) === col("event_type"), 1L)
          .otherwise(0L)).as("ok"), count(lit(1)).as("n")).head()
      m.getAs[Long]("ok").toDouble / m.getAs[Long]("n")
    }
    assert(accs.zip(accs.tail).forall { case (a, b) => a < b },
      s"accuracy ramp not monotone: $accs")
    assert(accs.head > 0.5 && accs.last < 0.9)
  }
}
