package graft

import java.sql.Date

import graft.ops.TimeSeries

/** Gap-fill: dense per-key daily grid, zero counts on gaps, LOCF. */
class TimeSeriesSpec extends SparkSpec {

  import spark.implicits._

  test("gapFillDaily densifies spans, zero-fills gaps, carries values forward") {
    val ev = Seq(
      (1L, Date.valueOf("2024-01-01"), 10.0),
      (1L, Date.valueOf("2024-01-01"), 5.0),  // same day aggregates
      (1L, Date.valueOf("2024-01-04"), 2.0),  // 2-day gap before this
      (2L, Date.valueOf("2024-03-10"), 7.0))  // single-day span
      .toDF("k", "d", "v")
    val got = TimeSeries.gapFillDaily(ev, "k", "d", "v")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) ->
        ((r.getLong(2), Option(r.get(3)), r.getDouble(4))))
      .toMap
    assert(got.size == 5) // user 1: 4 days, user 2: 1 day
    assert(got((1L, "2024-01-01")) == ((2L, Some(15.0), 15.0)))
    assert(got((1L, "2024-01-02")) == ((0L, None, 15.0))) // gap, LOCF
    assert(got((1L, "2024-01-03")) == ((0L, None, 15.0)))
    assert(got((1L, "2024-01-04")) == ((1L, Some(2.0), 2.0)))
    assert(got((2L, "2024-03-10")) == ((1L, Some(7.0), 7.0)))
  }

  test("interpolateDaily: linear between observations, clamped ends") {
    val ev = Seq(
      (1L, Date.valueOf("2024-01-01"), 10.0),
      (1L, Date.valueOf("2024-01-04"), 4.0),   // 2 gap days between
      (1L, Date.valueOf("2024-01-04"), 12.0),  // same-day agg → 16.0
      (2L, Date.valueOf("2024-03-10"), 7.0))
      .toDF("k", "d", "v")
    val got = TimeSeries.interpolateDaily(ev, "k", "d", "v")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) ->
        ((Option(r.get(2)), r.getDouble(3))))
      .toMap
    assert(got.size == 5)
    assert(got((1L, "2024-01-01")) == ((Some(10.0), 10.0)))
    // 10 → 16 over 3 days: 12.0 and 14.0 on the gap days
    assert(got((1L, "2024-01-02")) == ((None, 12.0)))
    assert(got((1L, "2024-01-03")) == ((None, 14.0)))
    assert(got((1L, "2024-01-04")) == ((Some(16.0), 16.0)))
    assert(got((2L, "2024-03-10")) == ((Some(7.0), 7.0)))
  }

  test("ewma: recursive smoothing in (ts, id) order, seeded at x_1") {
    val ev = Seq(
      (1L, 10L, 100L, 4.0), (1L, 20L, 101L, 8.0), (1L, 30L, 102L, 2.0),
      (2L, 10L, 200L, 6.0))
      .toDF("k", "ts", "id", "x")
    val got = TimeSeries.ewma(ev, "k", "ts", "id", "x", alpha = 0.25)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4))
      .toMap
    assert(got((1L, 10L)) == 4.0)
    assert(got((1L, 20L)) == 0.25 * 8.0 + 0.75 * 4.0)              // 5.0
    assert(got((1L, 30L)) == 0.25 * 2.0 + 0.75 * 5.0)              // 4.25
    assert(got((2L, 10L)) == 6.0)
  }

  test("ewma: NULL values are excluded, not series-restarting") {
    val ev = Seq(
      (1L, 10L, 100L, Some(4.0)), (1L, 20L, 101L, None),
      (1L, 30L, 102L, Some(8.0)))
      .toDF("k", "ts", "id", "x")
    val got = TimeSeries.ewma(ev, "k", "ts", "id", "x", alpha = 0.25)
      .collect().map(r => r.getLong(1) -> r.getDouble(4)).toMap
    // the null row is absent and does NOT reset the recurrence
    assert(got == Map(10L -> 4.0, 30L -> (0.25 * 8.0 + 0.75 * 4.0)))
  }

  test("resampleOhlc: first/last by (ts, id) tie-break, exact extremes") {
    val ev = Seq(
      // key 1, bucket [0, 100): ties on ts=10 broken by id
      (1L, 10L, 2L, 5.0), (1L, 10L, 1L, 3.0), (1L, 50L, 3L, 9.0),
      (1L, 99L, 4L, 1.0),
      // key 1, bucket [100, 200): single event
      (1L, 150L, 5L, 7.0),
      // key 2, bucket [0, 100)
      (2L, 20L, 6L, 2.0), (2L, 80L, 7L, 4.0))
      .toDF("k", "ts", "id", "x")
    val got = TimeSeries.resampleOhlc(ev, "k", "ts", "id", "x", bucketUs = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6))).toMap
    // open = value at (10, id=1) = 3.0; close = value at (99, id=4) = 1.0
    assert(got((1L, 0L)) == (3.0, 9.0, 1.0, 1.0, 4L))
    assert(got((1L, 100L)) == (7.0, 7.0, 7.0, 7.0, 1L))
    assert(got((2L, 0L)) == (2.0, 4.0, 2.0, 4.0, 2L))
  }

  test("resampleOhlc: pre-epoch timestamps bucket by FLOOR division") {
    // ts = -100 with bucket 100 must land in [-100, 0), not [0, 100)
    val ev = Seq((1L, -100L, 1L, 2.0), (1L, -1L, 2L, 4.0), (1L, 0L, 3L, 8.0))
      .toDF("k", "ts", "id", "x")
    val got = TimeSeries.resampleOhlc(ev, "k", "ts", "id", "x", bucketUs = 100L)
      .collect().map(r => r.getLong(1) -> (r.getDouble(2), r.getDouble(5),
        r.getLong(6))).toMap
    assert(got(-100L) == ((2.0, 4.0, 2L))) // open=-100's, close=-1's
    assert(got(0L) == ((8.0, 8.0, 1L)))
  }

  test("resampleOhlc: partitioning-invariant") {
    val rng = new scala.util.Random(11)
    val rows = (0 until 1000).map(i =>
      ((i % 7).toLong, rng.nextInt(5000).toLong, i.toLong,
        math.floor(rng.nextDouble() * 10000) / 100))
    val run = (parts: Int) =>
      TimeSeries.resampleOhlc(
        rows.toDF("k", "ts", "id", "x").repartition(parts),
        "k", "ts", "id", "x", bucketUs = 500L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6),
          r.getDouble(7))).sortBy(t => (t._1, t._2)).toSeq
    assert(run(1) == run(13))
  }

  test("cusumChangePoint: level shift found at the last pre-shift point") {
    // 0,0,0,10,10,10: cusum_i = 6*pfx_i - i*30 peaks (|-90|) at ord 3
    val s = Seq(("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 0L),
      ("a", 4L, 10L), ("a", 5L, 10L), ("a", 6L, 10L))
      .toDF("k", "o", "x")
    val r = TimeSeries.cusumChangePoint(s, "k", "o", "x").head()
    assert(r.getString(0) == "a" && r.getLong(1) == 6L &&
      r.getLong(2) == 3L && r.getLong(3) == -90L &&
      r.getDouble(4) == 15.0)
  }

  test("cusumChangePoint: constant series ties break to the earliest ord") {
    val s = Seq(("c", 5L, 7L), ("c", 6L, 7L), ("c", 7L, 7L)).toDF("k", "o", "x")
    val r = TimeSeries.cusumChangePoint(s, "k", "o", "x").head()
    assert(r.getLong(2) == 5L && r.getLong(3) == 0L && r.getDouble(4) == 0.0)
  }

  test("autocorr: alternating series gives the exact textbook estimates") {
    // x = 1,-1,1,-1,1,-1 (n=6, S=0): r_k = (n-k pairs of ±1)·n² / n²·Σx²
    val s = (1 to 6).map(i => ("a", i.toLong, if (i % 2 == 1) 1L else -1L))
      .toDF("k", "o", "x")
    val got = TimeSeries.autocorr(s, "k", "o", "x", maxLag = 2)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(got(1L) == -5.0 / 6.0) // 36·(-5) / 36·6
    assert(got(2L) == 4.0 / 6.0)  // 36·4 / 36·6
  }

  test("autocorr: zero variance -> NULL; short series lag absent; " +
    "partitioning-invariant") {
    val flat = Seq(("f", 1L, 3L), ("f", 2L, 3L), ("f", 3L, 3L)).toDF("k", "o", "x")
    val gotFlat = TimeSeries.autocorr(flat, "k", "o", "x", maxLag = 4)
      .collect().map(r => r.getLong(1) -> Option(r.get(3))).toMap
    assert(gotFlat == Map(1L -> None, 2L -> None)) // lags 3,4: no pairs
    val rng = new scala.util.Random(17)
    val big = (0 until 400).map(i =>
      (s"k${i % 3}", i.toLong, rng.nextInt(1000).toLong))
    val run = (p: Int) =>
      TimeSeries.autocorr(big.toDF("k", "o", "x").repartition(p),
        "k", "o", "x", maxLag = 5)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).sortBy(t => (t._1, t._2)).toSeq
    assert(run(1) == run(11))
  }

  test("ewma: bit-identical across partitionings") {
    val rng = new scala.util.Random(21)
    val rows = (0 until 800).map(i =>
      ((i % 5).toLong, rng.nextInt(1000).toLong, i.toLong,
        rng.nextDouble() * 100))
    val run = (parts: Int) =>
      TimeSeries.ewma(rows.toDF("k", "ts", "id", "x").repartition(parts),
        "k", "ts", "id", "x", alpha = 0.25)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(4))).sortBy(t => (t._1, t._2, t._3)).toSeq
    assert(run(1) == run(17))
  }

  /** Driver-side replay of holt()'s exact recurrence. */
  private def holtModel(xs: Seq[Double], alpha: Double, beta: Double)
      : (Double, Double) = {
    var l = xs.head
    var b = 0.0
    for (x <- xs.tail) {
      val nl = alpha * x + (1.0 - alpha) * (l + b)
      b = beta * (nl - l) + (1.0 - beta) * b
      l = nl
    }
    (l, b)
  }

  test("holt matches the driver replay bit-for-bit, across partitionings") {
    val rng = new scala.util.Random(67)
    val rows = for (k <- 0 until 4; i <- 0 until 300)
      yield (k.toLong, i.toLong, rng.nextDouble() * 500 + k * 50)
    val byKey = rows.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3)).toMap
    val run = (parts: Int) =>
      TimeSeries.holt(rows.toDF("k", "o", "x").repartition(parts),
        "k", "o", "x", alpha = 0.5, beta = 0.25, horizon = 3)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
        .toMap
    val got = run(1)
    assert(got == run(13))
    for ((k, xs) <- byKey) {
      val (l, b) = holtModel(xs, 0.5, 0.25)
      assert(got(k) == ((xs.size.toLong, l, b, l + 3.0 * b)))
    }
  }

  test("seasonalIndex: hand-checked two-bucket profile, NULL on zero " +
    "total, weighted mean of indices is 1") {
    // key k: bucket 0 has 2 obs summing 30, bucket 1 has 1 obs of 30
    // → means 15 vs 30, overall 20 → indices 0.75 and 1.5
    val df = Seq(("k", 0L, 10L), ("k", 0L, 20L), ("k", 1L, 30L),
      ("z", 0L, 0L)).toDF("g", "p", "x")
    val got = TimeSeries.seasonalIndex(df, "g", "p", "x")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got(("k", 0L)).contains(0.75) && got(("k", 1L)).contains(1.5))
    assert(got(("z", 0L)).isEmpty) // zero total → no baseline
    val rng = new scala.util.Random(79)
    val rows = (0 until 600).map(i =>
      ("g", (i % 24).toLong, rng.nextInt(500).toLong))
    val r = TimeSeries.seasonalIndex(rows.toDF("g", "p", "x"), "g", "p", "x")
      .collect().map(x => (x.getLong(2), x.getDouble(3)))
    val n = rows.size.toDouble
    val wmean = r.map { case (nb, idx) => nb * idx }.sum / n
    assert(math.abs(wmean - 1.0) < 1e-12)
  }

  test("holt locks onto an exact linear series: trend -> slope, " +
    "forecast extrapolates the line; nulls are excluded") {
    // x_t = 40 + 7t: after enough steps level ~ current point, trend ~ 7
    val line = (0 until 200).map(i => (1L, i.toLong, Some(40.0 + 7.0 * i)))
    val r = TimeSeries.holt(line.toDF("k", "o", "x"), "k", "o", "x",
      alpha = 0.5, beta = 0.25, horizon = 2).head()
    assert(math.abs(r.getDouble(3) - 7.0) < 1e-6)
    assert(math.abs(r.getDouble(2) - (40.0 + 7.0 * 199)) < 1e-4)
    assert(math.abs(r.getDouble(4) - (40.0 + 7.0 * 201)) < 1e-3)
    // a null mid-series is "no observation": same as the compacted series
    val withNull = line :+ ((1L, 500L, None: Option[Double]))
    val a = TimeSeries.holt(withNull.toDF("k", "o", "x"), "k", "o", "x",
      alpha = 0.5, beta = 0.25, horizon = 2).head()
    assert(a.getLong(1) == 200L && a.getDouble(2) == r.getDouble(2))
  }

  test("decompose: recovers a planted daily rhythm over a linear " +
    "trend — residuals vanish, edges drop, partitioning-invariant") {
    // x_t = 100*t + 1000*sin-ish daily pattern (integer, period 4)
    val pattern = Seq(0L, 1000L, 0L, -1000L)
    val rows = (0L until 40L).map(t =>
      ("g", t, 100L * t + pattern((t % 4).toInt)))
    val df = rows.toDF("g", "t", "x")
    val r = TimeSeries.decompose(df, "g", "t", "x",
      window = 5, period = 4)
    val got = r.collect().map(x => x.getLong(1) ->
      ((x.getDouble(3), x.getDouble(4), x.getDouble(5)))).toMap
    // 40 points minus 2 edges each side
    assert(got.size == 36)
    // the 5-point centered MA of a linear trend is exact; the pattern
    // sums to 0 over any 4 consecutive, but a 5-window double-counts
    // one phase — trend wobbles by ±200; seasonal absorbs the rest and
    // residuals stay small relative to the 1000-amplitude pattern
    got.foreach { case (t, (trend, seasonal, resid)) =>
      assert(math.abs(trend - 100.0 * t) <= 200.0, s"t=$t trend=$trend")
      assert(math.abs(resid) <= 300.0, s"t=$t resid=$resid")
    }
    // seasonal profile has the planted shape (phase 1 high, 3 low)
    val s1 = got.collect { case (t, (_, s, _)) if t % 4 == 1 => s }.head
    val s3 = got.collect { case (t, (_, s, _)) if t % 4 == 3 => s }.head
    assert(s1 > 700.0 && s3 < -700.0)
    val again = TimeSeries.decompose(df.repartition(7), "g", "t", "x",
      window = 5, period = 4)
    assertSameRows(r, again)
  }

  test("linearRegression recovers an exact line (slope, intercept, " +
    "r2 = 1) and is partitioning-invariant") {
    // y = 7x + 40 exactly
    val line = (0L until 50L).map(i => ("g", i, 7L * i + 40L))
    val df = line.toDF("g", "x", "y")
    val r = TimeSeries.linearRegression(df, "g", "x", "y").head()
    assert(r.getLong(1) == 50L)
    assert(r.getDouble(2) == 7.0)
    assert(r.getDouble(3) == 40.0)
    assert(r.getDouble(4) == 1.0)
    val again = TimeSeries.linearRegression(
      df.repartition(11), "g", "x", "y").head()
    assert(again.getDouble(2) == 7.0 && again.getDouble(4) == 1.0)
  }

  test("linearRegression: flat series has slope 0 and NULL r2; a " +
    "single point has NULL slope (no spread — not an ANSI throw)") {
    val flat = (0L until 10L).map(i => ("g", i, 5L)).toDF("g", "x", "y")
    val r = TimeSeries.linearRegression(flat, "g", "x", "y").head()
    assert(r.getDouble(2) == 0.0) //         Sxy = 0, Sxx > 0
    assert(r.isNullAt(4)) //                 r2: Syy = 0 -> undefined
    val single = Seq(("g", 3L, 5L)).toDF("g", "x", "y")
    val s = TimeSeries.linearRegression(single, "g", "x", "y").head()
    assert(s.isNullAt(2) && s.isNullAt(3) && s.isNullAt(4))
  }

  test("rollingMadAnomaly flags the spike a rolling mean would smear, " +
    "warm-up rows emit short windows, partitioning-invariant") {
    // flat series of 10s with one 1000 spike at t=10
    val rows = (0L until 20L).map(t =>
      ("g", t, if (t == 10L) 1000L else 10L))
    val r = TimeSeries.rollingMadAnomaly(
      rows.toDF("g", "t", "x"), "g", "t", "x", window = 7, k = 3L)
    val byT = r.collect().map(x =>
      x.getLong(1) -> ((x.getLong(3), x.getLong(4), x.getLong(5),
        x.getBoolean(6)))).toMap
    // spike: window median stays 10, mad 0 -> |1000-10| > 0 flagged
    assert(byT(10L) == ((7L, 10L, 0L, true)))
    // flat rows: mad 0 and |x-med| = 0 -> NOT flagged (strict >)
    assert(byT(5L) == ((6L, 10L, 0L, false)))
    assert(byT(0L)._1 == 1L) //                         warm-up size
    // trailing rows still see the spike in-window but median holds
    assert(!byT(12L)._4 && byT(12L)._2 == 10L)
    val again = TimeSeries.rollingMadAnomaly(
      rows.toDF("g", "t", "x").repartition(7), "g", "t", "x", 7, 3L)
    assertSameRows(r, again)
  }

  test("rollingMadAnomaly: lower-median element pick on even windows") {
    // window=4 over [2,4,6,8]: sorted prefix medians pick (n+1) div 2
    val rows = Seq(("g", 0L, 2L), ("g", 1L, 4L), ("g", 2L, 6L),
      ("g", 3L, 8L))
    val med = TimeSeries.rollingMadAnomaly(
      rows.toDF("g", "t", "x"), "g", "t", "x", window = 4, k = 3L)
      .collect().map(r => r.getLong(1) -> r.getLong(4)).toMap
    assert(med == Map(0L -> 2L, 1L -> 2L, 2L -> 4L, 3L -> 4L))
  }

  test("kaplanMeier: textbook risk table with censoring") {
    import org.apache.spark.sql.functions._
    // durations: 2(event), 2(event), 3(censored), 5(event), 5(censored)
    val df = Seq((2L, true), (2L, true), (3L, false), (5L, true),
      (5L, false)).toDF("dur", "ev")
    val got = TimeSeries.kaplanMeier(df, "dur", "ev")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // d=2: 5 at risk, 2 events → S = 3/5
    assert(got(2L)._1 == 5L && got(2L)._2 == 2L)
    val pin = (x: Double) => java.math.BigDecimal.valueOf(x)
      .setScale(8, java.math.RoundingMode.HALF_UP).doubleValue()
    val t2 = pin(math.log(1.0 - 2.0 / 5.0))
    assert(got(2L)._4 == pin(math.exp(t2)))
    // d=3: 3 at risk, 0 events, 1 censored → curve flat
    assert(got(3L) == ((3L, 0L, 1L, got(2L)._4)))
    // d=5: 2 at risk, 1 event, 1 censored → S drops by factor 1/2
    val t5 = pin(math.log(1.0 - 1.0 / 2.0))
    assert(got(5L)._1 == 2L && got(5L)._2 == 1L && got(5L)._3 == 1L)
    assert(got(5L)._4 == pin(math.exp(t2 + 0.0 + t5)))
  }

  test("decompositionStrength: pure trend scores F_T = 1, no seasonal " +
    "signal -> NULL") {
    import spark.implicits._
    val rows = (0L until 40L).map(t => ("g", t, 10L * t))
    val got = TimeSeries.decompositionStrength(
      rows.toDF("k", "t", "x"), "k", "t", "x", window = 3, period = 4)
      .collect().head
    // residuals are exactly zero on a line → full trend strength
    assert(got.getDouble(2) == 1.0)
    // seasonal+resid is identically 0 → degenerate variance → NULL
    assert(got.isNullAt(3))
  }

  test("decompositionStrength: partitioning-invariant, bounded in [0,1]") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val rows = (0L until 200L).map(t =>
      ("g", t, (100.0 * math.sin(t / 7.0)).toLong + rng.nextInt(20)))
    val run = (p: Int) => TimeSeries.decompositionStrength(
      rows.toDF("k", "t", "x").repartition(p), "k", "t", "x",
      window = 7, period = 5)
      .collect().map(r => (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    val a = run(1)
    assert(a == run(13))
    a.foreach { case (_, ft, fs) =>
      ft.foreach(v => assert(v >= 0.0 && v <= 1.0))
      fs.foreach(v => assert(v >= 0.0 && v <= 1.0))
    }
  }

  test("crossCorrelation: perfect lead-lag shows up at its lag") {
    import spark.implicits._
    // y is x shifted one step later: r(1) = 1 exactly
    val x = Seq(1L, 5L, 2L, 8L, 3L, 9L, 4L)
    val rows = x.indices.map(i =>
      (i.toLong, x(i), if (i == 0) 7L else x(i - 1)))
    val got = TimeSeries.crossCorrelation(
      rows.toDF("t", "x", "y"), "t", "x", "y", maxLag = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
      .toMap
    assert(got(1L)._1 == 6L && got(1L)._2 == Some(1.0))
    assert(got(0L)._1 == 7L && got(0L)._2.exists(v => v < 1.0))
  }

  test("crossCorrelation: zero-variance side yields NULL, not a crash") {
    import spark.implicits._
    val rows = (0L until 5L).map(i => (i, 3L, i))
    val got = TimeSeries.crossCorrelation(
      rows.toDF("t", "x", "y"), "t", "x", "y", maxLag = 1)
      .collect()
    assert(got.forall(_.isNullAt(2)))
  }

  test("seasonalNaiveBacktest: exact MAEs and the MASE ratio") {
    import spark.implicits._
    // season = 2, test = last 2 buckets; forecast(7)=v(5), forecast(8)=v(6)
    val s = Seq(("g", 1L, 10L), ("g", 2L, 20L), ("g", 3L, 10L),
      ("g", 4L, 20L), ("g", 5L, 10L), ("g", 6L, 20L),
      ("g", 7L, 12L), ("g", 8L, 25L)).toDF("k", "t", "v")
    val r = TimeSeries.seasonalNaiveBacktest(s, "k", "t", "v",
      seasonLag = 2L, testLen = 2L).collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 7L)   // |12-10| + |25-20|
    assert(r.getLong(3) == 5L && r.getLong(4) == 50L)  // five |±10| steps
    assert(r.getDouble(5) == (7.0 / 2.0) / (50.0 / 5.0)) // 0.35
  }

  test("seasonalNaiveBacktest: gappy grids drop unmatched test buckets") {
    import spark.implicits._
    // t=9 has no t=7 ancestor (7 missing) → only t=8 scores
    val s = Seq(("g", 1L, 5L), ("g", 2L, 6L), ("g", 4L, 8L),
      ("g", 6L, 9L), ("g", 8L, 7L), ("g", 9L, 1L)).toDF("k", "t", "v")
    val r = TimeSeries.seasonalNaiveBacktest(s, "k", "t", "v",
      seasonLag = 2L, testLen = 2L).collect().head
    assert(r.getLong(1) == 1L && r.getLong(2) == 2L) // |7 - v(6)=9| = 2
  }

  test("kaplanMeier: everyone-dies terminal step hits exactly zero") {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, true), (4L, true), (4L, true)).toDF("dur", "ev")
    val got = TimeSeries.kaplanMeier(df, "dur", "ev")
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(got(4L) == 0.0)
    assert(got(1L) > 0.0 && got(1L) < 1.0)
  }

  test("changepointBinary: level break found, exact means, g argmax") {
    import spark.implicits._
    // [0,0,0,10,10]: g(3) = (0·5−20·3)²/(3·2) = 600 dominates.
    val df = Seq(("k", 1L, 0L), ("k", 2L, 0L), ("k", 3L, 0L),
      ("k", 4L, 10L), ("k", 5L, 10L)).toDF("key", "o", "x")
    val r = TimeSeries.changepointBinary(df, "key", "o", "x", scale = 1.0)
      .collect().head
    assert(r.getLong(1) == 5L && r.getLong(2) == 3L && r.getLong(3) == 3L)
    assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 10.0)
    assert(r.getDouble(6) == 600.0)
    // Symmetric break lands mid-series: [1,1,5,5] → t = 2.
    val sym = Seq(("k", 1L, 1L), ("k", 2L, 1L), ("k", 3L, 5L),
      ("k", 4L, 5L)).toDF("key", "o", "x")
    val r2 = TimeSeries.changepointBinary(sym, "key", "o", "x", 1.0)
      .collect().head
    assert(r2.getLong(2) == 2L &&
      r2.getDouble(4) == 1.0 && r2.getDouble(5) == 5.0)
    // n < 2 → no split exists → no row.
    val one = Seq(("k", 1L, 7L)).toDF("key", "o", "x")
    assert(TimeSeries.changepointBinary(one, "key", "o", "x", 1.0)
      .count() == 0L)
  }

  test("pacf: lag-1 equals acf, AR cutoff shape, constant-series NULL") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val rows = (1 to 40).map(i => ("k", i.toLong,
      (math.sin(i * 0.7) * 100).toLong))
    val df = rows.toDF("key", "o", "x")
    val acf1 = TimeSeries.autocorr(df, "key", "o", "x", maxLag = 3)
      .filter(col("lag") === 1L).collect().head.getDouble(3)
    val p = TimeSeries.pacf(df, "key", "o", "x").collect().head
    assert(p.getDouble(2) == acf1) // pacf(1) IS rho_1
    // Durbin-Levinson closed form replayed on the acf values.
    val accAll = TimeSeries.autocorr(df, "key", "o", "x", maxLag = 3)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    val (r1, r2, r3) = (accAll(1L), accAll(2L), accAll(3L))
    val phi22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    val phi21 = r1 - phi22 * r1
    val phi33 = (r3 - phi21 * r2 - phi22 * r1) /
      (1.0 - phi21 * r1 - phi22 * r2)
    assert(p.getDouble(3) == phi22 && p.getDouble(4) == phi33)
    // Constant series: zero variance → acf NULL → every pacf NULL.
    val const = (1 to 10).map(i => ("c", i.toLong, 5L)).toDF("key", "o", "x")
    val pc = TimeSeries.pacf(const, "key", "o", "x").collect().head
    assert(pc.isNullAt(2) && pc.isNullAt(3) && pc.isNullAt(4))
  }

  test("hurstRS: trending beats mean-reverting, degenerate NULLs") {
    import spark.implicits._
    val n = 96
    // A pure trend is maximally persistent; a +1/-1 alternation is
    // maximally anti-persistent. Their Hurst estimates must separate
    // around 1/2 in the right order.
    val trend = (1 to n).map(i => ("t", i.toLong, i.toLong * 10))
    val alt = (1 to n).map(i => ("a", i.toLong, if (i % 2 == 0) 10L else 0L))
    val df = (trend ++ alt).toDF("key", "o", "x")
    val got = TimeSeries.hurstRS(df, "key", "o", "x")
      .collect().map(r => r.getString(0) -> r).toMap
    val ht = got("t").getDouble(5); val ha = got("a").getDouble(5)
    assert(got("t").getLong(1) == n.toLong)
    assert(ht > 0.8 && ha < 0.2 && ht > ha)
    assert(Seq(2, 3, 4).forall(i => got("t").getDouble(i) > 0.0))
    // Constant series: every block radicand 0 → no R/S → NULL hurst.
    val const = (1 to 40).map(i => ("c", i.toLong, 5L)).toDF("key", "o", "x")
    val c = TimeSeries.hurstRS(const, "key", "o", "x").collect().head
    assert(c.isNullAt(5) && c.isNullAt(2))
    // Series shorter than the smallest window: no full block → NULLs.
    val tiny = (1 to 5).map(i => ("s", i.toLong, i.toLong))
      .toDF("key", "o", "x")
    assert(TimeSeries.hurstRS(tiny, "key", "o", "x")
      .collect().head.isNullAt(5))
  }

  test("ljungBox: white noise small, strong AR large, short-series NULL") {
    import spark.implicits._
    // A hash scramble is serially uncorrelated → Q near its df; a slow
    // sine is heavily autocorrelated → Q near the h-lag ceiling
    // n(n+2)·Σ 1/(n−k).
    val noise = (1 to 120).map { i =>
      val h = i.toLong * 0x9E3779B97F4A7C15L
      ("n", i.toLong, ((h ^ (h >>> 31)) & 0x7FFFFFFFL) % 997L)
    }
    val sine = (1 to 120).map(i =>
      ("s", i.toLong, (math.sin(i * 0.1) * 1000).toLong))
    val df = (noise ++ sine).toDF("key", "o", "x")
    val got = TimeSeries.ljungBox(df, "key", "o", "x")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("n").getLong(2) == 6L)
    assert(got("s").getDouble(3) > 10.0 * got("n").getDouble(3))
    assert(got("n").getDouble(3) < 30.0) // white noise: Q ~ chi2(6)
    // Replay the Q formula on the acf values (strict lag-order chain).
    val acc = TimeSeries.autocorr(df.filter($"key" === "s"),
      "key", "o", "x", maxLag = 6)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    val n = 120.0
    val terms = (1 to 6).foldLeft(0.0)((a, k) =>
      a + acc(k.toLong) * acc(k.toLong) / (n - k))
    assert(got("s").getDouble(3) == n * (n + 2.0) * terms)
    // Series no longer than maxLag → NULL Q.
    val tiny = (1 to 5).map(i => ("t", i.toLong, i.toLong))
      .toDF("key", "o", "x")
    assert(TimeSeries.ljungBox(tiny, "key", "o", "x").collect()
      .head.isNullAt(3))
  }

  test("ar2YuleWalker: recovers AR structure, forecast replay, NULLs") {
    import spark.implicits._
    // Deterministic AR(2)-ish series x_t = x_{t-1} - 0.5 x_{t-2} + pulse.
    var (a, b) = (100.0, 100.0)
    val rows = (1 to 80).map { i =>
      val nxt = a - 0.5 * b + (if (i % 7 == 0) 40.0 else 0.0)
      b = a; a = nxt
      ("k", i.toLong, nxt.toLong)
    }
    val df = rows.toDF("key", "o", "x")
    val r = TimeSeries.ar2YuleWalker(df, "key", "o", "x").collect().head
    val (phi1, phi2) = (r.getDouble(2), r.getDouble(3))
    // Yule-Walker replay from the exact acf values.
    val acc = TimeSeries.autocorr(df, "key", "o", "x", maxLag = 2)
      .collect().map(x => x.getLong(1) -> x.getDouble(3)).toMap
    val (r1, r2) = (acc(1L), acc(2L))
    assert(phi1 == r1 * (1.0 - r2) / (1.0 - r1 * r1))
    assert(phi2 == (r2 - r1 * r1) / (1.0 - r1 * r1))
    // Forecast replay: mu + phi1 (x_n - mu) + phi2 (x_{n-1} - mu).
    val xs = rows.map(_._3)
    val mu = xs.map(_.toDouble).sum / xs.size // integer-exact sum
    val want = mu + phi1 * (xs.last - mu) + phi2 * (xs(xs.size - 2) - mu)
    assert(math.abs(r.getDouble(4) - want) < 1e-9)
    // Constant series: zero variance → NULL acf → NULL fit.
    val const = (1 to 10).map(i => ("c", i.toLong, 5L)).toDF("key", "o", "x")
    val c = TimeSeries.ar2YuleWalker(const, "key", "o", "x").collect().head
    assert(c.isNullAt(2) && c.isNullAt(3) && c.isNullAt(4))
  }

  test("dtw: identical series are distance 0; hand-worked 2x2 grid; tail folds") {
    // A=[1,5], B=[2,4] at k=2: D11=1, D12=4, D21=4, D22=1+min(4,4,1)=2
    val ev = Seq(("A", 0L, 1L), ("A", 1L, 5L),
      ("B", 0L, 2L), ("B", 1L, 4L),
      ("C", 0L, 1L), ("C", 1L, 5L))
      .toDF("g", "d", "q")
    val r = TimeSeries.dtwPairwise(ev, "g", "d", "q", k = 2, scale = 1.0)
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        x.getAs[Long]("dtw_q")).toMap
    assert(r(("A", "B")) == 2L)
    assert(r(("A", "C")) == 0L) // identical series
    assert(r(("B", "C")) == 2L) // symmetry of the grid
    // days past bucket k-1 fold into the last bucket on BOTH series
    val fold = Seq(("A", 0L, 1L), ("A", 5L, 2L), ("A", 9L, 3L),
      ("B", 0L, 1L), ("B", 7L, 5L))
      .toDF("g", "d", "q")
    val rf = TimeSeries.dtwPairwise(fold, "g", "d", "q", k = 2, scale = 1.0)
      .collect().head
    // series A=[1, 2+3], B=[1, 5]: identical after folding
    assert(rf.getAs[Long]("dtw_q") == 0L)
  }

  test("rollingBands: scalar replay of mean±2σ, warm-up NULLs, breach " +
    "flags only true outliers") {
    val rng = new scala.util.Random(47)
    val rows = (0L until 30L).map(t =>
      ("g", t, rng.nextInt(50).toLong + (if (t == 20L) 500L else 0L)))
    val byT = rows.map(r => r._2 -> r._3).toMap
    val got = TimeSeries.rollingBands(
      rows.toDF("g", "t", "x").repartition(5), "g", "t", "x", 8, 2.0)
      .collect().map { r =>
        r.getLong(1) -> (if (r.isNullAt(4)) None
          else Some((r.getDouble(4), r.getDouble(5), r.getDouble(6),
            r.getBoolean(7))))
      }.toMap
    assert((0L until 7L).forall(got(_).isEmpty))
    (7L until 30L).foreach { t =>
      val w = (t - 7 to t).map(byT)
      val n = 8L
      val sx = w.sum; val sxx = w.map(x => x * x).sum
      val mid = sx.toDouble / n
      val sig = math.sqrt((n * sxx - sx * sx).toDouble / (n.toDouble * n))
      val (gm, gl, gh, gb) = got(t).get
      assert(gm == mid && gl == mid - 2.0 * sig && gh == mid + 2.0 * sig)
      assert(gb == (byT(t).toDouble < gl || byT(t).toDouble > gh))
    }
    // the spike at t=20 must breach its own window
    assert(got(20L).get._4)
  }

  test("rollingCorr: matches a scalar Pearson replay on full windows, " +
    "NULL on warm-up and zero variance, partitioning-invariant") {
    // y = 2x + 1 on a full window → corr exactly 1.0
    val lin = (0L until 6L).map(t => ("l", t, t, 2 * t + 1))
      .toDF("g", "t", "x", "y")
    val got = TimeSeries.rollingCorr(lin, "g", "t", "x", "y", win = 4)
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got(0L).isEmpty && got(2L).isEmpty) // warm-up
    // sqrt(vx)·sqrt(vy) rounds twice, so "exactly 1" can land 1 ulp shy
    assert(Seq(3L, 5L).forall(t => math.abs(got(t).get - 1.0) < 1e-12))
    // constant y → zero variance → NULL even on full windows
    val flat = (0L until 5L).map(t => ("f", t, t, 7L))
      .toDF("g", "t", "x", "y")
    assert(TimeSeries.rollingCorr(flat, "g", "t", "x", "y", 4)
      .collect().forall(_.isNullAt(3)))
    // random: scalar replay with the same integer moments
    val rng = new scala.util.Random(83)
    val rows = (0L until 40L).map(t =>
      ("r", t, rng.nextInt(100).toLong, rng.nextInt(100).toLong))
    val byT = rows.map(r => r._2 -> (r._3, r._4)).toMap
    val expected = (0L until 40L).map { t =>
      if (t < 3) t -> None
      else {
        val w = (t - 3 to t).map(byT)
        val n = 4L
        val sx = w.map(_._1).sum; val sy = w.map(_._2).sum
        val sxy = w.map(p => p._1 * p._2).sum
        val sxx = w.map(p => p._1 * p._1).sum
        val syy = w.map(p => p._2 * p._2).sum
        val vx = n * sxx - sx * sx; val vy = n * syy - sy * sy
        if (vx <= 0 || vy <= 0) t -> None
        else t -> Some((n * sxy - sx * sy).toDouble /
          (math.sqrt(vx.toDouble) * math.sqrt(vy.toDouble)))
      }
    }.toMap
    val run = (p: Int) =>
      TimeSeries.rollingCorr(rows.toDF("g", "t", "x", "y").repartition(p),
        "g", "t", "x", "y", win = 4).collect()
        .map(r => r.getLong(1) ->
          (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    val a = run(1)
    assert(a == expected && a == run(7))
  }

  test("sax: symbols match a scalar replay, constant series emits 1s, " +
    "exact z=0 boundary is integer-decided, partitioning-invariant") {
    // constant series: σ=0 → every segment symbol 1
    val const = (0L to 7L).map(t => ("c", t, 5L)).toDF("g", "t", "x")
    val cGot = TimeSeries.sax(const, "g", "t", "x", w = 4).collect()
    assert(cGot.length == 2 && cGot.forall(_.getAs[Long]("symbol") == 1L))
    // alternating ±1 around 0 with w=2 segments of (−1,+1): each PAA
    // mean equals μ=0 exactly → symbol 1 via the integer sign test
    val alt = (0L to 7L).map(t =>
      ("a", t, if (t % 2 == 0) -1L else 1L)).toDF("g", "t", "x")
    val aGot = TimeSeries.sax(alt, "g", "t", "x", w = 2).collect()
    assert(aGot.length == 4 && aGot.forall(_.getAs[Long]("symbol") == 1L))
    // random series: replay symbols in Scala with the same arithmetic
    val rng = new scala.util.Random(17)
    val rows = (0L until 64L).map(t =>
      ("r", t, rng.nextInt(1000).toLong))
    val xs = rows.map(_._3)
    val n = xs.size.toLong
    val s = xs.sum
    val ss = xs.map(x => x * x).sum
    val sigma = math.sqrt((n * ss - s * s).toDouble / (n.toDouble * n))
    val expected = xs.grouped(4).zipWithIndex.map { case (seg, i) =>
      val segSum = seg.sum; val segN = seg.size.toLong
      val below = segSum * n < s * segN
      val eqm = segSum * n == s * segN
      val z = (segSum.toDouble / segN - s.toDouble / n) / sigma
      val sym =
        if (below && z < -0.6745) 0L
        else if (below || eqm) 1L
        else if (z < 0.6745) 2L else 3L
      i.toLong -> sym
    }.toMap
    val run = (p: Int) =>
      TimeSeries.sax(rows.toDF("g", "t", "x").repartition(p),
        "g", "t", "x", w = 4).collect()
        .map(r => r.getLong(1) -> r.getAs[Long]("symbol")).toMap
    val got = run(1)
    assert(got == expected && got == run(9))
  }

  test("matrixProfile finds the planted motif (distance 0, mutual " +
    "pointers) and ranks the spiked window as the discord") {
    // 20-point series: the shape [5,1,4,1,5] planted at i=0 and i=10
    // (gap >= exclusion 5); a huge spike at position 17
    val base = Array.fill(20)(2L)
    val motif = Array(5L, 1L, 4L, 1L, 5L)
    motif.zipWithIndex.foreach { case (v, t) => base(t) = v; base(10 + t) = v }
    base(17) = 1000L
    val df = base.zipWithIndex
      .map { case (v, d) => ("k", d.toLong, v) }.toSeq
      .toDF("k", "d", "x")
    val got = TimeSeries.matrixProfile(df, "k", "d", "x",
      window = 5, exclusion = 5)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.size == 16) // starts 0..15, every i has an admissible j
    assert(got(0L) == ((10L, 0L)), "motif copy 1 -> copy 2 at distance 0")
    assert(got(10L) == ((0L, 0L)), "motif copy 2 -> copy 1 at distance 0")
    // the discord: every window covering the spike is far from all
    // neighbors; the max profile value must belong to one of them
    val discordI = got.maxBy { case (_, (_, dist)) => dist }._1
    assert(discordI >= 13L && discordI <= 15L,
      s"discord window should cover the spike at 17, got i=$discordI")
    // the flat window i=5 has NO exact admissible match (all j with
    // |5-j| >= 5 overlap a motif or the spike); its nearest neighbor
    // is the hand-computed j=12 at distance (2-4)^2+(2-1)^2+(2-5)^2=14
    assert(got(5L) == ((12L, 14L)))
  }

  test("matrixProfile refuses a grid longer than maxGridLen loudly — " +
    "the designed O(grid²) self-join must never run on raw-resolution " +
    "input by accident") {
    val df = (0 until 40).map(d => ("k", d.toLong, (d % 7).toLong))
      .toDF("k", "d", "x")
    val e = intercept[Exception] {
      TimeSeries.matrixProfile(df, "k", "d", "x",
        window = 3, exclusion = 2, maxGridLen = 16).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        String.valueOf(x.getMessage) +: msgs(x.getCause))
    assert(msgs(e).exists(_.contains("exceeds maxGridLen")),
      s"expected the designed-cost refusal, got: ${msgs(e)}")
    // at or under the bound the same input profiles normally
    assert(TimeSeries.matrixProfile(df, "k", "d", "x",
      window = 3, exclusion = 2, maxGridLen = 40).count() > 0)
    // and the bound must admit the window itself
    intercept[IllegalArgumentException] {
      TimeSeries.matrixProfile(df, "k", "d", "x",
        window = 8, exclusion = 2, maxGridLen = 4)
    }
  }

  test("madOutliers: hand-computed x2/x4 medians; one spike cannot " +
    "poison the threshold (the 50% breakdown point a mean±kσ rule " +
    "lacks)") {
    // {1..9, 1000}: median = 5.5 -> med_x2 = 11;
    // dev_x2 = |2x-11| = {9,7,5,3,1,1,3,5,7,1989}; median(dev)=5 ->
    // mad_x4 = 10; flag 2*dev > 3*10 -> only the spike. A mean±3σ rule
    // on the same data flags NOTHING (σ inflated by the spike itself).
    val df = ((1L to 9L) :+ 1000L).zipWithIndex
      .map { case (v, i) => ("k", i.toLong, v) }.toDF("k", "d", "x")
    val r = TimeSeries.madOutliers(df, "k", "x", k = 3L).head()
    assert(r.getAs[Long]("n_points") == 10L)
    assert(r.getAs[Long]("med_x2") == 11L)
    assert(r.getAs[Long]("mad_x4") == 10L)
    assert(r.getAs[Long]("n_outliers") == 1L)
    assert(r.getAs[Long]("max_dev_x2") == 1989L)
    // mean = 104.5, σ ≈ 298 -> spike z ≈ 3.0 NOT > 3: the classical
    // rule misses what MAD catches
    val xs = (1L to 9L) :+ 1000L
    val mean = xs.sum.toDouble / xs.size
    val sd = math.sqrt(xs.map(v => (v - mean) * (v - mean)).sum / xs.size)
    assert((1000.0 - mean) / sd < 3.05)
  }

  test("macd: driver-exact fold replay, and a step change produces at " +
    "least one signal crossover") {
    val xs = (0 until 15).map(_ => 10.0) ++ (0 until 15).map(_ => 100.0)
    val df = xs.zipWithIndex.map { case (x, i) => ("k", i.toLong, x) }
      .toDF("k", "o", "x")
    val r = TimeSeries.macd(df, "k", "o", "x").collect().head
    var f = xs.head; var sl = xs.head; var sg = 0.0; var pd = 0.0
    var cx = 0L
    for (x <- xs.tail) {
      val nf = 0.5 * x + 0.5 * f
      val nsl = 0.25 * x + 0.75 * sl
      val m = nf - nsl
      val nsg = 0.5 * m + 0.5 * sg
      val d = m - nsg
      if ((pd > 0 && d < 0) || (pd < 0 && d > 0)) cx += 1
      f = nf; sl = nsl; sg = nsg; pd = d
    }
    assert(r.getAs[Double]("macd") == f - sl, "bit-exact replay")
    assert(r.getAs[Double]("signal") == sg)
    assert(r.getAs[Double]("histogram") == pd)
    assert(r.getAs[Long]("n_crossovers") == cx && cx >= 1L,
      s"step change must cross the signal line at least once (got $cx)")
  }

  test("seasonalMannKendall removes a pure weekly cycle (S=0) but " +
    "keeps a real cross-week trend (S = max positive)") {
    // 21 days, value = day-of-week: every same-season pair ties -> S=0
    val cyc = (0 until 21).map(d => ("k", d.toLong, (d % 7).toLong))
      .toDF("k", "d", "x").withColumn("m",
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.col("d"),
          org.apache.spark.sql.functions.lit(7L)))
    val r0 = TimeSeries.seasonalMannKendall(cyc, "k", "d", "x", "m")
      .collect().head
    assert(r0.getAs[Long]("s_stat") == 0L)
    assert(r0.getAs[Long]("n_seasons") == 7L)
    assert(r0.getAs[Double]("z") == 0.0)
    // cycle + strictly increasing week level: every same-season pair
    // increases -> S = 7 seasons x C(3,2) pairs = 21
    val trend = (0 until 21).map(d =>
      ("k", d.toLong, (d % 7).toLong + 100L * (d / 7)))
      .toDF("k", "d", "x").withColumn("m",
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.col("d"),
          org.apache.spark.sql.functions.lit(7L)))
    val r1 = TimeSeries.seasonalMannKendall(trend, "k", "d", "x", "m")
      .collect().head
    assert(r1.getAs[Long]("s_stat") == 21L)
    assert(r1.getAs[Double]("z") > 3.0)
  }

  test("kalmanLevel: constant series converges level to the constant " +
    "and variance to the steady-state Riccati root") {
    val df = (0 until 40).map(i => ("k", i.toLong, 10.0))
      .toDF("k", "o", "x")
    val r = TimeSeries.kalmanLevel(df, "k", "o", "x", q = 0.25, r = 2.0)
      .collect().head
    assert(r.getLong(1) == 40L)
    assert(math.abs(r.getDouble(2) - 10.0) < 1e-9, "level locks on")
    // steady state: p = (-q + sqrt(q^2 + 4qr)) / 2 with q=.25 r=2
    val pStar = (-0.25 + math.sqrt(0.25 * 0.25 + 4 * 0.25 * 2.0)) / 2
    assert(math.abs(r.getDouble(3) - pStar) < 1e-6,
      s"p_var ${r.getDouble(3)} vs riccati $pStar")
    val gain = (r.getDouble(3) + 0.25) / ((r.getDouble(3) + 0.25) + 2.0)
    assert(math.abs(r.getDouble(4) - gain) < 1e-12)
  }

  test("kalmanLevel follows a step change faster than its steady gain " +
    "would and matches a driver-side replay exactly") {
    val xs = (0 until 10).map(_ => 0.0) ++ (0 until 10).map(_ => 100.0)
    val df = xs.zipWithIndex.map { case (x, i) => ("k", i.toLong, x) }
      .toDF("k", "o", "x")
    val r = TimeSeries.kalmanLevel(df, "k", "o", "x", q = 0.25, r = 2.0)
      .collect().head
    var (l, p) = (xs.head, 1.0)
    for (x <- xs.tail) {
      val k = (p + 0.25) / ((p + 0.25) + 2.0)
      l = l + k * (x - l); p = (1.0 - k) * (p + 0.25)
    }
    assert(r.getDouble(2) == l, "bit-exact driver replay (level)")
    assert(r.getDouble(3) == p, "bit-exact driver replay (p)")
    assert(r.getDouble(2) > 90.0, "level has tracked the step")
  }

  test("holtWinters learns a pure additive season: trend ~ 0, seasonal " +
    "slots ordered like the true profile, and a driver replay is exact") {
    val season = Array(0.0, 10.0, 20.0, 5.0, 15.0, 25.0, 2.0)
    val xs = (0 until 35).map(i => 50.0 + season(i % 7))
    val df = xs.zipWithIndex.map { case (x, i) => ("k", i.toLong, x) }
      .toDF("k", "o", "x")
    val r = TimeSeries.holtWinters(df, "k", "o", "x",
      alpha = 0.5, beta = 0.25, gamma = 0.25, m = 7)
      .collect().head
    // driver-side replay of the documented recursion
    var l = xs.head; var b = 0.0; val s = Array.fill(7)(0.0)
    for (i <- 1 until xs.length) {
      val sOld = s(i % 7)
      val nl = 0.5 * (xs(i) - sOld) + 0.5 * (l + b)
      val nb = 0.25 * (nl - l) + 0.75 * b
      s(i % 7) = 0.25 * (xs(i) - nl) + 0.75 * sOld
      l = nl; b = nb
    }
    assert(r.getLong(1) == 35L)
    assert(r.getDouble(2) == l && r.getDouble(3) == b,
      "bit-exact driver replay (level, trend)")
    assert(r.getDouble(4) == s(35 % 7), "s_next is slot n mod m")
    assert(r.getDouble(5) == (l + b) + s(35 % 7))
    assert(math.abs(b) < 1.0, "no spurious trend on a stationary season")
  }

  test("chatterjeeXi: strictly increasing series gives xi_num = " +
      "(n-1)(n-2), i.e. the finite-n maximum 1 - 3/(n+1)") {
    val inc = (1L to 20L).map(i => ("k", i, i * 10L)).toDF("k", "t", "y")
    val r = TimeSeries.chatterjeeXi(inc, "k", "t", "y").head()
    // Sum|Δr| = n-1 -> num = n²-1-3(n-1) = (n-1)(n-2)
    assert(r.getAs[Long]("xi_num") == 19L * 18L)
    assert(r.getAs[Long]("xi_den") == 399L)
  }

  test("chatterjeeXi: a maximally alternating series drives xi negative") {
    val alt = (1L to 20L).map(i =>
      ("k", i, if (i % 2 == 0) 100L + i else i)).toDF("k", "t", "y")
    val r = TimeSeries.chatterjeeXi(alt, "k", "t", "y").head()
    assert(r.getAs[Long]("xi_num") < 0L,
      s"alternating series should give negative xi, got ${r}")
  }

  test("durbinWatson: hand case y = (1,2,4) -> DW = 10n²/(14n² - 49n)") {
    val df = Seq(("k", 1L, 1L), ("k", 2L, 2L), ("k", 3L, 4L))
      .toDF("k", "t", "y")
    val r = TimeSeries.durbinWatson(df, "k", "t", "y").head()
    // S=7, Σy²=21, Σdy²=1+4=5; num=9*5=45, den=9*21-3*49=42
    assert(r.getAs[Long]("dw_num") == 45L)
    assert(r.getAs[Long]("dw_den") == 42L)
  }

  test("durbinWatson: slow drift gives DW well below 2 (positive serial " +
      "correlation), alternation well above 2") {
    val drift = (1L to 30L).map(i => ("k", i, i)).toDF("k", "t", "y")
    val rd = TimeSeries.durbinWatson(drift, "k", "t", "y").head()
    assert(rd.getAs[Long]("dw_num") * 2 < rd.getAs[Long]("dw_den"),
      "drift should give DW < 0.5")
    val alt = (1L to 30L).map(i =>
      ("k", i, if (i % 2 == 0) 10L else -10L)).toDF("k", "t", "y")
    val ra = TimeSeries.durbinWatson(alt, "k", "t", "y").head()
    assert(ra.getAs[Long]("dw_num") > 3 * ra.getAs[Long]("dw_den"),
      "alternation should give DW > 3")
  }

  test("croston: hand-walked intermittent series — z and q are exact " +
      "dyadic folds, forecast z/q; single-demand keys have NULL q") {
    // demands at days 2 (d=4), 5 (d=2), 11 (d=6):
    // init: z=4, q=null, last=2
    // day 5: z=4/2+2/2=3, q=gap=3, last=5
    // day 11: z=3/2+6/2=4.5, q=3/2+6/2=4.5 -> forecast 1.0
    val df = Seq(("k", 2L, 4L), ("k", 5L, 2L), ("k", 11L, 6L),
      ("solo", 7L, 9L)).toDF("k", "t", "d")
    val rows = TimeSeries.croston(df, "k", "t", "d")
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    val k = rows("k")
    assert(k.getAs[Long]("n_nonzero") == 3L)
    assert(k.getAs[Double]("z_final") == 4.5)
    assert(k.getAs[Double]("q_final") == 4.5)
    assert(k.getAs[Double]("croston_forecast") == 1.0)
    val solo = rows("solo")
    assert(solo.getAs[Double]("z_final") == 9.0)
    assert(solo.isNullAt(solo.fieldIndex("q_final")))
    assert(solo.isNullAt(solo.fieldIndex("croston_forecast")))
  }

  test("sampleEntropyCounts: a constant series matches every template " +
      "(A = B = n_pairs); a one-spike series loses the spike templates") {
    val const = (1L to 10L).map(i => ("k", i, 5L)).toDF("k", "t", "y")
    val rc = TimeSeries.sampleEntropyCounts(const, "k", "t", "y").head()
    // 8 templates of length 3 -> 28 pairs, all within r=0
    assert(rc.getAs[Long]("n_pairs") == 28L)
    assert(rc.getAs[Long]("b_count") == 28L)
    assert(rc.getAs[Long]("a_count") == 28L)
    val spike = (1L to 10L).map(i =>
      ("k", i, if (i == 5) 600L else 5L)).toDF("k", "t", "y")
    val rs = TimeSeries.sampleEntropyCounts(spike, "k", "t", "y").head()
    // r = 595/6 = 99; templates covering t=5 (i=3,4,5) miss all others
    assert(rs.getAs[Long]("a_count") < rs.getAs[Long]("n_pairs"))
    assert(rs.getAs[Long]("a_count") <= rs.getAs[Long]("b_count"),
      "A (longer template) can never exceed B")
    // the 5 spike-free templates still all match each other
    assert(rs.getAs[Long]("a_count") == 10L,
      s"expected C(5,2)=10 clean matches, got $rs")
  }
}
