package graft

import org.apache.spark.sql.functions._

import graft.ops.Attribution

/** Multi-touch attribution: exact micro-cent credit schedules. */
class AttributionSpec extends SparkSpec {

  import spark.implicits._

  test("positionBased: U-shaped 40/20/40 with exact floor credits") {
    val conv = Seq(
      (1L, 10L, 100L, 1.23), // four touches
      (2L, 11L, 100L, 2.00), // one touch
      (3L, 12L, 100L, 1.00), // two touches
      (4L, 13L, 100L, 5.00)) // no touches
      .toDF("user_id", "cid", "cts", "value")
    val touches = Seq(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"),
      (1L, 3L, 3L, "c"), (1L, 4L, 4L, "d"),
      (2L, 5L, 5L, "x"),
      (3L, 6L, 6L, "p"), (3L, 7L, 7L, "q"))
      .toDF("user_id", "tts", "tid", "channel")
    val got = Attribution.positionBased(conv, touches, Seq("user_id"),
      "cid", "cts", "tts", "tid", "channel", "value", windowUs = 1000L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // n=4, micro=123e6: first=last=(123e6·40)//100=49.2e6,
    // middle pool 24.6e6 over 2 → 12.3e6 each
    assert(got("a") == 49200000L && got("d") == 49200000L)
    assert(got("b") == 12300000L && got("c") == 12300000L)
    // n=1: full amount; n=2: floor half / remainder (conserving)
    assert(got("x") == 200000000L)
    assert(got("p") == 50000000L && got("q") == 50000000L)
    // n=0: defaultChannel carries the full amount
    assert(got("direct") == 500000000L)
  }

  test("positionBased: middle-pool floor loss is bounded and deterministic") {
    // micro = 10e6 (value 0.10): first=last=4e6, pool 2e6 over 3 middles
    // → 666_666 each, 2 micro-cents round down (documented floor loss)
    val conv = Seq((1L, 1L, 100L, 0.10)).toDF("user_id", "cid", "cts", "value")
    val touches = (1 to 5).map(i => (1L, i.toLong, i.toLong, s"ch$i"))
      .toDF("user_id", "tts", "tid", "channel")
    val got = Attribution.positionBased(conv, touches, Seq("user_id"),
      "cid", "cts", "tts", "tid", "channel", "value", windowUs = 1000L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got("ch1") == 4000000L && got("ch5") == 4000000L)
    assert(got("ch2") == 666666L && got("ch3") == 666666L &&
      got("ch4") == 666666L)
    assert(got.values.sum == 10000000L - 2L)
  }

  test("lastTouch: latest at-or-before touch wins; orphans go direct") {
    val conv = Seq((1L, 100L, 3.0), (2L, 100L, 1.0))
      .toDF("user_id", "cts", "value")
    val touches = Seq((1L, 50L, 1L, "early"), (1L, 90L, 2L, "late"))
      .toDF("user_id", "tts", "tid", "channel")
    val got = Attribution.lastTouch(conv, touches, Seq("user_id"),
      "cts", "tts", "channel", "value", tieBreakCols = Seq("tid"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("late") == 1L && got("direct") == 1L && !got.contains("early"))
  }

  test("shapley3: symmetry, dummy-channel zero, efficiency") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    def run(rows: Seq[(Long, String)]) = Attribution.shapley3(
      rows.toDF("u", "t"), col("u"),
      Seq(col("t") === "a", col("t") === "b", col("t") === "c"),
      col("t") === "buy").collect().head
    // Channels a and b behave identically (same users, same
    // conversions) → symmetric Shapley credit; c is a dummy no one
    // touches → exactly zero.
    val sym = Seq(
      (1L, "a"), (1L, "b"), (1L, "buy"),
      (2L, "a"), (2L, "b"),
      (3L, "buy"), (4L, "x"))
    val r = run(sym)
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == r.getDouble(2)) // symmetry
    assert(r.getDouble(3) == 0.0) // dummy
    // Driver replay of the cumulative-coverage game
    // v(S) = conversions of users with touchset ⊆ S, over n.
    val cells = sym.groupBy(_._1).toSeq.map { case (_, es) =>
      val ts = es.map(_._2).toSet
      val sid = (if (ts("a")) 1 else 0) + (if (ts("b")) 2 else 0) +
        (if (ts("c")) 4 else 0)
      (sid, if (ts("buy")) 1 else 0)
    }
    val n = cells.size.toDouble
    def v(s: Int) =
      cells.filter(c => (c._1 & ~s) == 0).map(_._2).sum.toDouble / n
    val w0 = 1.0 / 3.0; val w1 = 1.0 / 6.0
    def phi(i: Int, a: Int, b: Int) =
      w0 * (v(i) - v(0)) + w1 * (v(i + a) - v(a)) +
        w1 * (v(i + b) - v(b)) + w0 * (v(7) - v(a + b))
    assert(r.getDouble(1) == phi(1, 2, 4))
    assert(r.getDouble(2) == phi(2, 1, 4))
    assert(r.getDouble(3) == phi(4, 1, 2))
    // Efficiency: credits sum to v(full) - v(empty).
    val total = r.getDouble(1) + r.getDouble(2) + r.getDouble(3)
    assert(math.abs(total - (v(7) - v(0))) < 1e-12)
  }
}
