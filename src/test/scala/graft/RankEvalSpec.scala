package graft

import org.apache.spark.sql.functions._

import graft.ops.RankEval

/** Hand-computed fixtures for the ranking/classifier eval metrics — the
  * scaled-integer accumulation must reproduce the textbook values. */
class RankEvalSpec extends SparkSpec {

  import spark.implicits._

  private val w = RankEval.dcgWeightsScaled(10)
  private val prefix = RankEval.idcgPrefixScaled(10)

  test("dcg weights: rank 1 is exactly 1e8, monotone decreasing, prefix sums align") {
    assert(w.head == 100000000L)
    assert(w == w.sorted.reverse)
    assert(prefix == w.scanLeft(0L)(_ + _).tail)
  }

  test("ndcg: single relevant doc at rank 2 of 3 scores w2/w1") {
    val df = Seq((1L, 30.0, 1L, false), (1L, 20.0, 2L, true),
      (1L, 10.0, 3L, false))
      .toDF("q", "s", "id", "rel")
    val r = RankEval.ndcgAtK(df, col("q"), col("s"), col("id"),
      col("rel"), k = 10).collect().head
    assert(r.getAs[Long]("dcg_scaled") == w(1))
    assert(r.getAs[Long]("idcg_scaled") == w(0))
    assert(math.abs(r.getAs[Double]("ndcg") - w(1).toDouble / w(0)) < 1e-12)
  }

  test("ndcg: perfect ranking is exactly 1.0; no-relevant query is null") {
    val df = Seq((1L, 3.0, 1L, true), (1L, 2.0, 2L, true),
      (1L, 1.0, 3L, false), (2L, 9.0, 4L, false))
      .toDF("q", "s", "id", "rel")
    val rows = RankEval.ndcgAtK(df, col("q"), col("s"), col("id"),
      col("rel"), k = 10).collect().map(r => r.getAs[Long]("query") -> r)
      .toMap
    assert(rows(1L).getAs[Double]("ndcg") == 1.0)
    assert(rows(2L).isNullAt(rows(2L).fieldIndex("ndcg")))
  }

  test("mrr: first-relevant ranks 1 and 4 average to 0.625") {
    val df = Seq(
      (1L, 9.0, 1L, true), (1L, 8.0, 2L, false),
      (2L, 9.0, 3L, false), (2L, 8.0, 4L, false), (2L, 7.0, 5L, false),
      (2L, 6.0, 6L, true), (2L, 5.0, 7L, true),
      (3L, 4.0, 8L, false))
      .toDF("q", "s", "id", "rel")
    val r = RankEval.meanReciprocalRank(df, col("q"), col("s"),
      col("id"), col("rel")).collect().head
    assert(r.getAs[Long]("n_queries") == 2L)
    assert(r.getAs[Long]("sum_recip_scaled") == 1000000L + 250000L)
    assert(math.abs(r.getAs[Double]("mrr") - 0.625) < 1e-12)
  }

  test("average precision: ranking [+,-,+] gives (1 + 2/3)/2 floored at 1e-6") {
    val df = Seq((3.0, 1L, true), (2.0, 2L, false), (1.0, 3L, true))
      .toDF("s", "id", "rel")
    val r = RankEval.averagePrecision(df, col("s"), col("id"),
      col("rel")).collect().head
    assert(r.getAs[Long]("n_pos") == 2L)
    assert(r.getAs[Long]("sum_prec_scaled") == 1000000L + 666666L)
    assert(math.abs(r.getAs[Double]("avg_precision") - 0.833333) < 1e-6)
  }

  test("average precision matches the single-partition window replay on a corpus") {
    val df = spark.range(2000).select(
      (col("id") * 2654435761L % 1000L).cast("double").as("s"),
      col("id"), (col("id") % 7L === 0L).as("rel"))
    val fast = RankEval.averagePrecision(df.repartition(13), col("s"),
      col("id"), col("rel")).collect().head
    import org.apache.spark.sql.expressions.Window
    val w0 = Window.orderBy(col("s").desc, col("id"))
    val slow = df.select(when(col("rel"), 1L).otherwise(0L).as("y"),
        col("s"), col("id"))
      .withColumn("rk", row_number().over(w0).cast("long"))
      .withColumn("cp", sum(col("y")).over(
        w0.rowsBetween(Window.unboundedPreceding, 0)))
      .where(col("y") === 1L)
      .agg(sum(expr("(1000000 * cp) div rk")).as("sp")).collect().head
    assert(fast.getAs[Long]("sum_prec_scaled") == slow.getAs[Long]("sp"))
  }

  test("classifier eval: textbook 2x2 (tp=2 fp=1 fn=1 tn=6)") {
    val df = (Seq((true, true), (true, true), (true, false),
      (false, true)) ++ Seq.fill(6)((false, false)))
      .toDF("pred", "actual")
    val r = RankEval.classifierEval(df, col("pred"), col("actual"))
      .collect().head
    assert(r.getAs[Long]("tp") == 2 && r.getAs[Long]("fp") == 1 &&
      r.getAs[Long]("fn") == 1 && r.getAs[Long]("tn") == 6)
    assert(r.getAs[Double]("accuracy") == 0.8)
    assert(math.abs(r.getAs[Double]("precision") - 2.0 / 3.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("recall") - 2.0 / 3.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("f1") - 2.0 / 3.0) < 1e-12)
    // po=.8, pe=.58 -> kappa = .22/.42; mcc = 11/21 (same here)
    assert(math.abs(r.getAs[Double]("kappa") - 0.22 / 0.42) < 1e-12)
    assert(math.abs(r.getAs[Double]("mcc") - 11.0 / 21.0) < 1e-12)
  }

  test("isotonic: [0, 1, 1/2] pools the violating tail to 3/4, exact rationals") {
    // bins 0/1/2 with one row each at rates 0, 1, 0.5 -> PAV gives
    // [0, 3/4, 3/4] (two rows per pooled bin here: use n=2 per bin)
    val df = Seq((0L, false), (0L, false), (1L, true), (1L, true),
      (2L, true), (2L, false))
      .toDF("b", "y")
    val r = RankEval.isotonicCalibration(df, col("b"), col("y"))
      .collect().map(x => x.getAs[Long]("bin") ->
        (x.getAs[Long]("iso_num"), x.getAs[Long]("iso_den"))).toMap
    assert(r(0L) == (0L, 2L))
    assert(r(1L) == (3L, 4L))
    assert(r(2L) == (3L, 4L))
  }

  test("isotonic: monotone input is unchanged; output is always non-decreasing") {
    val mono = Seq((0L, 1, 10), (1L, 3, 10), (2L, 7, 10))
      .flatMap { case (b, p, n) =>
        (0 until n).map(i => (b, i < p)) }
      .toDF("b", "y")
    val rows = RankEval.isotonicCalibration(mono, col("b"), col("y"))
      .orderBy("bin").collect()
    assert(rows.map(_.getAs[Double]("iso_rate")).toSeq ==
      Seq(0.1, 0.3, 0.7))
    // random-ish profile: monotone + weighted-mean-preserving
    val noisy = (0 until 400).map { i =>
      (((i * 37) % 16).toLong, (i * 2654435761L % 100) < 40 + (i % 16))
    }.toDF("b", "y")
    val out = RankEval.isotonicCalibration(noisy, col("b"), col("y"))
      .orderBy("bin").collect()
    val rates = out.map(_.getAs[Double]("iso_rate"))
    assert(rates.zip(rates.tail).forall { case (a, b) => a <= b + 1e-15 })
    val fitMass = out.map(r =>
      r.getAs[Long]("n") * r.getAs[Double]("iso_rate")).sum
    val posMass = out.map(_.getAs[Long]("n_pos").toDouble).sum
    assert(math.abs(fitMass - posMass) < 1e-6)
  }

  test("ece: two clean bins, exact integer numerator") {
    // bin 0: two rows pm=100000 (claim .1), one positive -> |1e6*1 - 2e5| = 8e5
    // bin 19: one row pm=980000 (claim .98), positive -> |1e6 - 98e4| = 2e4
    val df = Seq((100000L, true), (100000L, false), (980000L, true))
      .toDF("pm", "y")
    val r = RankEval.expectedCalibrationError(df, col("pm"), col("y"),
      nBins = 20).collect().head
    assert(r.getAs[Long]("n") == 3L)
    assert(r.getAs[Long]("n_bins_used") == 2L)
    assert(r.getAs[Long]("ece_num") == 800000L + 20000L)
    assert(math.abs(r.getAs[Double]("ece") - 820000.0 / 3e6) < 1e-12)
  }

  test("q_pass_at_k gate: every emitted rational equals the BigInt " +
      "binomial form 1 - C(n-c,k)/C(n,k), reduced to lowest terms") {
    // Independent re-derivation: the gate computes falling-factorial
    // DECIMAL products + RatReduceExpr; this check uses BigInt
    // binomial coefficients — a different algorithm on a different
    // number lane.
    def choose(n: Long, k: Long): BigInt =
      if (k < 0 || k > n) BigInt(0)
      else (0L until k).foldLeft(BigInt(1))((a, i) => a * (n - i) / (i + 1))
    val rows = SparkEntry.queries("q_pass_at_k")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val ks = rows.map(_.getAs[Long]("k")).toSet
    assert(ks == Set(1L, 5L, 10L))
    rows.foreach { r =>
      val (k, n, c) = (r.getAs[Long]("k"), r.getAs[Long]("n"),
        r.getAs[Long]("c"))
      val (pn, pd) = (r.getAs[Long]("pass_num"), r.getAs[Long]("pass_den"))
      assert(n >= k && c >= 0 && c <= n)
      val miss = choose(n - c, k)
      val tot = choose(n, k)
      val g = (tot - miss).gcd(tot)
      assert(BigInt(pn) == (tot - miss) / g && BigInt(pd) == tot / g,
        s"task n=$n c=$c k=$k: got $pn/$pd, want ${tot - miss}/$tot reduced")
      assert(BigInt(pn).gcd(BigInt(pd)) == 1, s"not in lowest terms: $pn/$pd")
    }
    // sanity anchors: c = n → pass@k = 1/1; c = 0 → 0/1
    rows.filter(r => r.getAs[Long]("c") == r.getAs[Long]("n")).foreach { r =>
      assert(r.getAs[Long]("pass_num") == 1L &&
        r.getAs[Long]("pass_den") == 1L)
    }
    rows.filter(_.getAs[Long]("c") == 0L).foreach { r =>
      assert(r.getAs[Long]("pass_num") == 0L &&
        r.getAs[Long]("pass_den") == 1L)
    }
  }
}
