package graft

import graft.ops.Normalize

/** Per-group z-score: exact-moment arithmetic, null on zero variance,
  * partitioning invariance down to the bit. */
class NormalizeSpec extends SparkSpec {

  import spark.implicits._

  private val Q = 1048576.0

  test("z-scores match the fixed-point model on integer values") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 5.0), ("b", 9.0))
      .toDF("g", "x")
    val got = Normalize.zscore(df, "g", "x")
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // group a: s1=6Q, s2=14Q^2, num=3*14Q^2-36Q^2=6Q^2
    val stdA = math.sqrt(6.0 * Q * Q / (3.0 * 3.0 * (Q * Q)))
    assert(got(("a", 1.0)) == ((3L, (1.0 - 2.0) / stdA)))
    assert(got(("a", 3.0)) == ((3L, (3.0 - 2.0) / stdA)))
    val stdB = math.sqrt((2.0 * 106.0 * Q * Q - 196.0 * Q * Q) /
      (2.0 * 2.0 * (Q * Q)))
    val meanB = 14.0 * Q / (2.0 * Q)
    assert(got(("b", 9.0)) == ((2L, (9.0 - meanB) / stdB)))
  }

  test("zero-variance group emits NULL z") {
    val df = Seq(("c", 7.5), ("c", 7.5), ("d", 1.0), ("d", 2.0)).toDF("g", "x")
    val rows = Normalize.zscore(df, "g", "x").collect()
    assert(rows.filter(_.getString(0) == "c").forall(_.isNullAt(3)))
    assert(rows.filter(_.getString(0) == "d").forall(!_.isNullAt(3)))
  }

  test("iqrOutliers: Tukey fences flag exactly the extreme points") {
    // group g: values 1..11 plus a wild 100. q1=3.75, q3=9.25 over the 12
    // values; iqr=5.5 → fences [-4.5, 17.5] → only 100 is out.
    val df = ((1 to 11).map(i => ("g", i.toDouble)) :+ ("g", 100.0))
      .toDF("g", "x")
    val got = graft.ops.Normalize.iqrOutliers(df, "g", "x")
      .collect().map(r => r.getDouble(1) -> r.getBoolean(4)).toMap
    assert(got(100.0))
    assert((1 to 11).forall(i => !got(i.toDouble)))
  }

  test("correlationMatrix: exact +1/-1/0 structure and listwise drop") {
    val df = Seq(
      (1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0),
      (4.0, 8.0, -4.0))
      .toDF("a", "b", "c")
    val got = graft.ops.Normalize.correlationMatrix(df, Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got(("a", "b")) == ((4L, 1.0)))   // b = 2a exactly
    assert(got(("a", "c")) == ((4L, -1.0)))  // c = -a exactly
    assert(got(("b", "c")) == ((4L, -1.0)))
    // zero variance → NULL corr
    val z = Seq((1.0, 5.0), (2.0, 5.0)).toDF("a", "b")
    val zr = graft.ops.Normalize.correlationMatrix(z, Seq("a", "b"))
      .collect()
    assert(zr.length == 1 && zr(0).isNullAt(3))
  }

  test("robustZ: median/MAD scores, outlier-resistant, null on zero MAD") {
    // values 1..5 (med 3, |dev| = 2,1,0,1,2 → mad 1) plus outlier 1000:
    // med of 6 values = 3.5, devs = 2.5,1.5,.5,.5,1.5,996.5 → mad = 1.5
    val df = ((1 to 5).map(i => ("g", i.toDouble)) :+ ("g", 1000.0))
      .toDF("g", "x")
    val got = graft.ops.Normalize.robustZ(df, "g", "x")
      .collect().map(r => r.getDouble(1) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got(1000.0)._1 == 3.5 && got(1000.0)._2 == 1.5)
    assert(got(1000.0)._3 == (1000.0 - 3.5) / (1.4826 * 1.5))
    assert(math.abs(got(3.0)._3) < 1.0) // inliers stay small
    // constant group → MAD 0 → NULL
    val z = graft.ops.Normalize.robustZ(
      Seq(("c", 2.0), ("c", 2.0)).toDF("g", "x"), "g", "x").collect()
    assert(z.forall(_.isNullAt(4)))
  }

  test("winsorize clips to exact-interpolation percentiles, inliers pass") {
    // group of 0..100: p05 = 5.0, p95 = 95.0 under linear interpolation
    val rows = (0 to 100).map(i => ("g", i.toDouble)) :+ ("h", 7.0)
    val got = graft.ops.Normalize.winsorize(
      rows.toDF("g", "x"), "g", "x", pLo = 0.05, pHi = 0.95)
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got(("g", 0.0)) == (5.0, 95.0, 5.0))    // clipped up
    assert(got(("g", 100.0)) == (5.0, 95.0, 95.0)) // clipped down
    assert(got(("g", 50.0)) == (5.0, 95.0, 50.0))  // inlier untouched
    // singleton group: both bounds collapse to the value, nothing clips
    assert(got(("h", 7.0)) == (7.0, 7.0, 7.0))
  }

  test("anovaF: hand-checked F, null on degenerate designs") {
    // groups: a = {0, 2} (mean 1), b = {4, 6} (mean 5); grand mean 3
    // SSB = 2*(1-3)^2 + 2*(5-3)^2 = 16; SSW = 2 + 2 = 4
    // F = (16/1) / (4/2) = 8
    val df = Seq(("a", 0.0), ("a", 2.0), ("b", 4.0), ("b", 6.0)).toDF("g", "x")
    val r = graft.ops.Normalize.anovaF(df, "g", "x").head()
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("n_rows") == 4L)
    assert(math.abs(r.getAs[Double]("ssb") / (1L << 40).toDouble - 16.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("f_stat") - 8.0) < 1e-9)
    // one group → k < 2 → NULL F
    val one = graft.ops.Normalize.anovaF(
      Seq(("a", 1.0), ("a", 2.0)).toDF("g", "x"), "g", "x").head()
    assert(one.isNullAt(one.fieldIndex("f_stat")))
    // zero within-group variance → NULL F
    val z = graft.ops.Normalize.anovaF(
      Seq(("a", 1.0), ("a", 1.0), ("b", 5.0), ("b", 5.0)).toDF("g", "x"),
      "g", "x").head()
    assert(z.isNullAt(z.fieldIndex("f_stat")))
  }

  test("anovaF is partitioning-invariant") {
    val rng = new scala.util.Random(37)
    val rows = Seq.fill(4000)((s"g${rng.nextInt(5)}", rng.nextDouble() * 100))
    val run = (p: Int) =>
      graft.ops.Normalize.anovaF(rows.toDF("g", "x").repartition(p), "g", "x")
        .head().getAs[Double]("f_stat")
    assert(run(1) == run(13))
  }

  test("bit-identical across partitionings") {
    val rng = new scala.util.Random(5)
    val rows = Seq.fill(2000)((s"g${rng.nextInt(7)}", rng.nextDouble() * 500))
    val a = Normalize.zscore(rows.toDF("g", "x").repartition(1), "g", "x")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val b = Normalize.zscore(rows.toDF("g", "x").repartition(19), "g", "x")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(a == b)
    // sanity: per-group z has mean ~0 (up to the 2^-20 quantization bias)
    val zs = a.filter(_._1 == "g0").map(_._3)
    assert(math.abs(zs.sum / zs.size) < 1e-6)
  }

  test("quantileNormalize: min 0, max 1, id tie-break, singleton NULL") {
    val df = Seq((1L, "a", 5.0), (2L, "a", 1.0), (3L, "a", 9.0),
      (4L, "a", 5.0), (5L, "b", 7.0)).toDF("id", "g", "x")
    val got = Normalize.quantileNormalize(df, "g", "x", "id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got(2L).contains(0.0) && got(3L).contains(1.0))
    // tied 5.0s: id 1 ranks before id 4 → 1/3 and 2/3
    assert(got(1L).contains(1.0 / 3.0) && got(4L).contains(2.0 / 3.0))
    assert(got(5L).isEmpty)
  }

  test("gini: 0 on uniform, (n-1)/n on a single holder, brute-force " +
    "match on random data across partitionings") {
    val uni = (1L to 8L).map((_, "u", 10L)).map(t => (t._1, t._2, t._3))
      .toDF("id", "g", "x")
    assert(Normalize.gini(uni, "g", "x", "id").head().getDouble(2) == 0.0)
    val one = ((1L to 7L).map((_, "o", 0L)) :+ ((8L, "o", 100L)))
      .toDF("id", "g", "x")
    assert(Normalize.gini(one, "g", "x", "id").head().getDouble(2)
      == 7.0 / 8.0)
    val rng = new scala.util.Random(73)
    val rows = (1L to 500L).map(i =>
      (i, s"g${i % 3}", rng.nextInt(1000).toLong))
    val expected = rows.groupBy(_._2).view.mapValues { xs =>
      val sorted = xs.sortBy(t => (t._3, t._1)).map(_._3)
      val n = sorted.size.toLong
      val s = sorted.sum
      val t = sorted.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      (2.0 * t - (n + 1) * s).toDouble / (n * s).toDouble
    }.toMap
    val got = Normalize.gini(rows.toDF("id", "g", "x").repartition(7),
      "g", "x", "id").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got == expected)
  }

  test("herfindahl: 1 on a monopoly, 1/n on even shares, norm in [0,1], " +
    "partitioning-invariant on random data") {
    val mono = Seq(("m", 1L, 50L), ("m", 2L, 0L)).toDF("g", "u", "x")
    val mRow = Normalize.herfindahl(mono, "g", "u", "x").head()
    assert(mRow.getLong(1) == 1L && mRow.getDouble(2) == 1.0 &&
      mRow.isNullAt(3))
    val even = (1L to 4L).map(u => ("e", u, 25L)).toDF("g", "u", "x")
    val eRow = Normalize.herfindahl(even, "g", "u", "x").head()
    assert(eRow.getDouble(2) == 0.25 && eRow.getDouble(3) == 0.0)
    val rng = new scala.util.Random(41)
    val rows = (1L to 800L).map(i =>
      (s"g${i % 3}", i % 37, rng.nextInt(500).toLong + 1L))
    val run = (p: Int) =>
      Normalize.herfindahl(rows.toDF("g", "u", "x").repartition(p),
        "g", "u", "x").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
          r.getDouble(3))).toMap
    val a = run(1)
    assert(a == run(17))
    a.values.foreach { case (_, hhi, norm) =>
      assert(hhi > 0.0 && hhi <= 1.0 && norm >= 0.0 && norm <= 1.0)
    }
  }

  test("lorenz: bin sizes follow ntile, shares sum to 1, cum_share is " +
    "monotone and ends at 1, concentrated mass lands in the top bucket") {
    // 25 units, one whale: unit 25 holds 760 of 1000 total
    val rows = (1L to 24L).map(u => ("g", u, 10L)) :+ (("g", 25L, 760L))
    val got = Normalize.lorenz(rows.toDF("g", "u", "x").repartition(7),
      "g", "u", "x", buckets = 5)
      .collect().sortBy(_.getLong(1))
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.map(_._1).toSeq == (1L to 5L))
    assert(got.map(_._2).toSeq == Seq(5L, 5L, 5L, 5L, 5L))
    assert(got.map(_._3).sum == 1000L)
    assert(got.last._3 == 800L && got.last._4 == 0.8)
    val cums = got.map(_._5)
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    assert(cums.last == 1.0)
  }

  test("theil: ~0 on even shares, ~ln(n) on a monopoly, matches the " +
    "quantized brute force, partitioning-invariant") {
    val even = (1L to 8L).map(u => ("e", u, 10L)).toDF("g", "u", "x")
    val eT = Normalize.theil(even, "g", "u", "x").head().getDouble(2)
    assert(math.abs(eT) < 1e-6)
    // one unit holds all positive mass → n=1 after the x>0 filter → T=0
    val mono = Seq(("m", 1L, 80L), ("m", 2L, 0L)).toDF("g", "u", "x")
    assert(Normalize.theil(mono, "g", "u", "x").head().getDouble(2) == 0.0)
    val rng = new scala.util.Random(29)
    val rows = (1L to 600L).map(i =>
      (s"g${i % 2}", i % 23, rng.nextInt(400).toLong + 1L))
    val expected = rows.groupBy(_._1).view.mapValues { xs =>
      val tot = xs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      val n = tot.size.toLong
      val s = tot.values.sum
      val num = tot.values.map(x =>
        x * math.floor(math.log(x.toDouble * n / s) * Q).toLong).sum
      num.toDouble / (s.toDouble * Q)
    }.toMap
    val run = (p: Int) =>
      Normalize.theil(rows.toDF("g", "u", "x").repartition(p),
        "g", "u", "x").collect()
        .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val a = run(1)
    assert(a == run(13) && a == expected)
    // monopoly-ish upper bound sanity: T ≤ ln(n)
    a.foreach { case (g, t) =>
      val n = rows.filter(_._1 == g).map(_._2).distinct.size
      assert(t >= -1e-6 && t <= math.log(n.toDouble) + 1e-6)
    }
  }
}
