package graft

import graft.ops.Funnel

/** Funnel + retention: strictly-after semantics, stall chains, cohort
  * math. */
class FunnelSpec extends SparkSpec {

  import spark.implicits._

  private val Steps = Seq("view", "click", "buy")

  private def funnel(rows: (Long, Long, String)*) =
    Funnel.funnelStages(rows.toSeq.toDF("u", "ts", "et"),
      "u", "ts", "et", Steps)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
          r.getLong(4)))).toMap

  test("completes in order, takes the FIRST qualifying event per step") {
    val got = funnel(
      (1L, 10L, "view"), (1L, 5L, "click"),  // click before view: no
      (1L, 20L, "click"), (1L, 30L, "click"),
      (1L, 40L, "buy"))
    assert(got(1L) == ((Some(10L), Some(20L), Some(40L), 3L)))
  }

  test("a tie on the boundary does not advance (strictly after)") {
    val got = funnel((2L, 10L, "view"), (2L, 10L, "click"), (2L, 15L, "buy"))
    assert(got(2L) == ((Some(10L), None, None, 1L)))
  }

  test("stall propagates: no click means buy can never count") {
    val got = funnel((3L, 10L, "view"), (3L, 50L, "buy"))
    assert(got(3L) == ((Some(10L), None, None, 1L)))
  }

  test("users who never enter the funnel are absent") {
    val got = funnel((4L, 10L, "click"), (4L, 20L, "buy"),
      (5L, 10L, "view"))
    assert(got.keySet == Set(5L))
  }

  test("retention: cohorts by first day, exact actives per offset") {
    val df = Seq(
      (1L, "2024-01-01"), (1L, "2024-01-01"), (1L, "2024-01-03"),
      (2L, "2024-01-01"), (2L, "2024-01-02"),
      (3L, "2024-01-02"))
      .toDF("u", "d").select($"u", $"d".cast("date").as("d"))
    val got = Funnel.retentionCohorts(df, "u", "d")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got(("2024-01-01", 0L)) == ((2L, 2L))) // users 1,2 day 0
    assert(got(("2024-01-01", 1L)) == ((1L, 2L))) // user 2 on day 1
    assert(got(("2024-01-01", 2L)) == ((1L, 2L))) // user 1 on day 3
    assert(got(("2024-01-02", 0L)) == ((1L, 1L))) // user 3
    assert(got.size == 4)
  }

  test("topPaths: counts length-3 type sequences per user, ranks by " +
    "count with path tie-break, cross-user sequences never join") {
    val df = Seq(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (1L, 3L, 3L, "c"),
      (1L, 4L, 4L, "a"), //                      a>b>c, b>c>a
      (2L, 1L, 5L, "a"), (2L, 2L, 6L, "b"), (2L, 3L, 7L, "c"),
      (3L, 1L, 8L, "x"), (3L, 2L, 9L, "y")) //   too short for n=3
      .toDF("u", "ts", "id", "et")
    val got = Funnel.topPaths(df, "u", "ts", "id", "et", n = 3, k = 5)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got("a>b>c") == ((2L, 1L)))
    assert(got("b>c>a") == ((1L, 2L)))
    assert(got.size == 2) //  user 3's pair contributes nothing
  }

  test("rfmScores: quintile scores in 1..5, recency inverted, heavy " +
    "spenders outrank light ones") {
    // 100 users: user i buys (i % 10 + 1) times of value 10*i on day i
    val rows = (1L to 100L).flatMap(i =>
      (0L until (i % 10) + 1).map(_ => (i, i, i * 10.0)))
    val df = rows.toDF("u", "day", "v")
    val rows2 = Funnel.rfmScores(df, "u", "day", "v").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    assert(rows2.size == 100)
    assert(rows2.values.forall { case (_, _, rs, fs, ms) =>
      Seq(rs, fs, ms).forall(s => s >= 1L && s <= 5L) })
    // most recent buyer (u=100, recency 0) maxes recency score;
    // earliest (u=1) bottoms it
    assert(rows2(100L)._1 == 0L && rows2(100L)._3 == 5L)
    assert(rows2(1L)._3 == 1L)
    // monetary quintiles follow total spend: the max spender scores 5,
    // the min spender 1 (spend = value x n_purchases, NOT value alone)
    val maxU = rows2.maxBy(_._2._2)._1
    val minU = rows2.minBy(_._2._2)._1
    assert(rows2(maxU)._5 == 5L && rows2(minU)._5 == 1L)
  }

  test("userGrowth: first-seen day per user, running total") {
    val df = Seq(
      (1L, 0L), (1L, 5L), (2L, 0L), (3L, 2L), (3L, 0L), (4L, 5L))
      .toDF("u", "day")
    val got = Funnel.userGrowth(df, "u", "day")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // u3's first day is 0 (min over its rows), so day 2 has no entry
    assert(got == Map(0L -> ((3L, 3L)), 5L -> ((1L, 4L))))
  }

  test("timeToConvert: gap distribution over completed stages only — " +
    "exact mean, lower-median element pick") {
    // funnel frame directly: gaps 10, 20, 40; one non-converter
    val f = Seq(
      (1L, 0L, Some(10L)), (2L, 100L, Some(120L)),
      (3L, 0L, Some(40L)), (4L, 0L, None))
      .toDF("u", "t1", "t3")
    val r = Funnel.timeToConvert(f, "t1", "t3").head()
    assert(r.getLong(0) == 3L)
    assert(r.getLong(1) == 10L && r.getLong(2) == 40L)
    assert(r.getDouble(3) == 70.0 / 3.0)
    assert(r.getLong(4) == 20L) //   lower median of {10, 20, 40}
  }

  test("cohortLtv: first-day cohorting, decimal-exact daily and " +
    "cumulative revenue, active counts per age") {
    // u1 joins day 0 (buys 10.50), active day 2 (buys 2.25)
    // u2 joins day 0 (no revenue), active day 2 (nothing)
    // u3 joins day 1 (buys 5.00)
    val df = Seq(
      (1L, 0L, 10.50), (1L, 2L, 2.25),
      (2L, 0L, 0.0), (2L, 2L, 0.0),
      (3L, 1L, 5.00))
      .toDF("u", "day", "rev")
    val got = Funnel.cohortLtv(df, "u", "day", "rev")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got((0L, 0L)) == ((2L, 10.50, 10.50)))
    assert(got((0L, 2L)) == ((2L, 2.25, 12.75))) // cumulative carries
    assert(got((1L, 0L)) == ((1L, 5.00, 5.00)))
    assert(got.size == 3)
  }

  test("markovTransitions counts consecutive pairs per user, " +
    "normalizes per from-state, tie-breaks equal timestamps") {
    // user 1: a->b->a->b ; user 2: a->b ; user 3 single event (no pair)
    val df = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "a"),
      (1L, 40L, 4L, "b"),
      (2L, 10L, 5L, "a"), (2L, 15L, 6L, "c"),
      (3L, 10L, 7L, "a"))
      .toDF("u", "ts", "id", "et")
    val got = Funnel.markovTransitions(df, "u", "ts", "id", "et")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // transitions leaving 'a': a->b x2 (u1), a->c x1 (u2); each user's
    // final event departs nowhere
    assert(got(("a", "b")) == ((2L, 3L, 2.0 / 3.0)))
    assert(got(("a", "c")) == ((1L, 3L, 1.0 / 3.0)))
    assert(got(("b", "a")) == ((1L, 1L, 1.0)))
    assert(got.size == 3) //    user 3 contributes nothing
    // equal ts: sequence resolves by id -> a(id1)->b(id2) not reversed
    val tied = Seq((1L, 10L, 1L, "a"), (1L, 10L, 2L, "b"))
      .toDF("u", "ts", "id", "et")
    val t2 = Funnel.markovTransitions(tied, "u", "ts", "id", "et")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(t2 == Set(("a", "b")))
  }

  test("markovStationary: two-state chain converges to the exact " +
    "fixed-point mass ratio") {
    // chain: a→b always, b→a always → stationary (1/2, 1/2); uniform
    // init IS the fixed point, so every iterate equals q/2 exactly
    val ev = Seq((1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (1L, 3L, 3L, "a"),
      (1L, 4L, 4L, "b"))
      .toDF("u", "ts", "id", "et")
    val got = Funnel.markovStationary(ev, "u", "ts", "id", "et",
      iters = 5, q = 1000000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 500000L, "b" -> 500000L))
  }

  test("markovStationary: absorbing state accumulates the mass") {
    // a→b, b→b: everything flows into b; a keeps only leaked floor dust
    val ev = Seq((1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (1L, 3L, 3L, "b"),
      (1L, 4L, 4L, "b"),
      (2L, 1L, 5L, "a"), (2L, 2L, 6L, "b"))
      .toDF("u", "ts", "id", "et")
    val got = Funnel.markovStationary(ev, "u", "ts", "id", "et",
      iters = 5, q = 1000000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("a") == 0L)       // no inflow to a after round 1
    assert(got("b") == 1000000L) // a's initial half arrived intact
  }

  test("markovStationary: partitioning-invariant (integer fixed point)") {
    val rng = new scala.util.Random(11)
    val types = Array("v", "c", "p", "x")
    val rows = (0 until 400).map(i =>
      ((i % 23).toLong, i.toLong, i.toLong, types(rng.nextInt(4))))
    val run = (p: Int) =>
      Funnel.markovStationary(
        rows.toDF("u", "ts", "id", "et").repartition(p),
        "u", "ts", "id", "et")
        .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1).toSeq
    assert(run(1) == run(13))
  }

  test("windowFunnel: depth needs order AND window fit; latest chain " +
      "start rescues a late conversion") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val steps = Seq("a", "b", "c")
    def depths(rows: Seq[(Long, Long, String)]): Map[Long, Long] =
      Funnel.windowFunnel(rows.toDF("u", "ts", "et"), "u", "ts", "et",
        steps, windowUs = 100L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val d = depths(Seq(
      // u1: a@0 b@50 c@90 — all within 100 → depth 3
      (1L, 0L, "a"), (1L, 50L, "b"), (1L, 90L, "c"),
      // u2: a@0 b@50 c@150 — c misses the window of start 0 → depth 2
      (2L, 0L, "a"), (2L, 50L, "b"), (2L, 150L, "c"),
      // u3: c@0 b@10 a@20 — wrong order → depth 1
      (3L, 0L, "c"), (3L, 10L, "b"), (3L, 20L, "a"),
      // u4: an early stale chain a@0 b@50, then a FRESH a@200 b@250
      // rescues c@290 (within 100 of start 200) → depth 3: the
      // latest-chain-start invariant at work
      (4L, 0L, "a"), (4L, 50L, "b"), (4L, 200L, "a"),
      (4L, 250L, "b"), (4L, 290L, "c"),
      // u5: b-only → depth 0 (never started)
      (5L, 10L, "b")))
    assert(d == Map(3L -> 2L, 2L -> 1L, 1L -> 1L, 0L -> 1L))
    // Brute-force cross-check on a scrambled corpus: depth 3 iff some
    // ordered triple fits the window; depth 2 iff some ordered pair.
    val rng = new scala.util.Random(7)
    val rnd = (1L to 30L).flatMap { u =>
      (1 to 12).map(_ => (u, rng.nextInt(400).toLong,
        steps(rng.nextInt(3))))
    }
    val got = Funnel.windowFunnel(rnd.toDF("u", "ts", "et"),
      "u", "ts", "et", steps, windowUs = 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byU = rnd.groupBy(_._1)
    val want = byU.values.map { es =>
      val ts = steps.map(s =>
        es.filter(_._3 == s).map(_._2).sorted).toIndexedSeq
      val d3 = ts(0).exists(t1 => ts(1).exists(t2 => ts(2).exists(t3 =>
        t1 <= t2 && t2 <= t3 && t2 - t1 <= 100L && t3 - t1 <= 100L)))
      val d2 = ts(0).exists(t1 => ts(1).exists(t2 =>
        t1 <= t2 && t2 - t1 <= 100L))
      if (d3) 3L else if (d2) 2L else if (ts(0).nonEmpty) 1L else 0L
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got == want)
  }

  test("growthAccounting: hand-worked decomposition, DAU identity, " +
    "churn attributed to the following day") {
    import spark.implicits._
    // u1: days 1,2,4 (new@1, retained@2, churn@3, resurrected@4, churn@5)
    // u2: days 2,3   (new@2, retained@3, churn@4)
    // u3: day 4      (new@4, churn@5)
    val df = Seq((1L, 1L), (1L, 2L), (1L, 4L), (2L, 2L), (2L, 3L),
      (3L, 4L), (3L, 4L)).toDF("u", "day") // dup row: dedup is part of op
    val got = graft.ops.Funnel.growthAccounting(df, "u", "day")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) == ((1L, 0L, 0L, 0L)))
    assert(got(2L) == ((1L, 1L, 0L, 0L)))
    assert(got(3L) == ((0L, 1L, 0L, 1L)))
    assert(got(4L) == ((1L, 0L, 1L, 1L)))
    assert(got(5L) == ((0L, 0L, 0L, 2L)))
    // identity: new+retained+resurrected == distinct actives per day
    val dau = Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 2L)
    dau.foreach { case (d, n) =>
      val (nw, rt, rs, _) = got(d); assert(nw + rt + rs == n)
    }
  }
}
