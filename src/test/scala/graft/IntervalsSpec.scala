package graft

import graft.ops.Intervals

/** Interval merge: running-max island semantics. */
class IntervalsSpec extends SparkSpec {

  import spark.implicits._

  test("mergeIntervals: overlap, containment, touch, and gap") {
    // key a: [0,10] ∪ [5,20] ∪ [20,25] merge (touching merges);
    //        [2,3] is CONTAINED in the first island;
    //        [30,40] opens a second island.
    // key b: single interval.
    val df = Seq(
      ("a", 0L, 10L, 1L), ("a", 5L, 20L, 2L), ("a", 20L, 25L, 3L),
      ("a", 2L, 3L, 4L), ("a", 30L, 40L, 5L),
      ("b", 7L, 9L, 6L))
      .toDF("k", "s", "e", "id")
    val got = Intervals.mergeIntervals(df, Seq("k"), "s", "e", "id")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got(("a", 1L)) == ((0L, 25L, 4L, 25L)))
    assert(got(("a", 2L)) == ((30L, 40L, 1L, 10L)))
    assert(got(("b", 1L)) == ((7L, 9L, 1L, 2L)))
    assert(got.size == 3)
  }

  test("mergeIntervals: short event inside a long span joins its island") {
    // the case plain gap-sessionize gets wrong: [0,100] then [50,51] —
    // a 50-tick "gap" from start to start, but fully covered
    val df = Seq(("u", 0L, 100L, 1L), ("u", 50L, 51L, 2L),
      ("u", 99L, 120L, 3L)).toDF("k", "s", "e", "id")
    val got = Intervals.mergeIntervals(df, Seq("k"), "s", "e", "id")
      .collect()
    assert(got.length == 1)
    assert(got.head.getLong(2) == 0L && got.head.getLong(3) == 120L)
  }

  test("coverage: union length, fragmentation, max island") {
    val df = Seq(
      ("a", 0L, 10L, 1L), ("a", 5L, 12L, 2L), ("a", 100L, 101L, 3L),
      ("b", 0L, 1L, 4L))
      .toDF("k", "s", "e", "id")
    val got = Intervals.coverage(df, Seq("k"), "s", "e", "id")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("a") == ((3L, 2L, 13L, 12L))) // 12 + 1 covered
    assert(got("b") == ((1L, 1L, 1L, 1L)))
  }

  test("gaps: one row per dark window between islands, single-island " +
    "keys emit nothing, extents exact") {
    val df = Seq(
      ("a", 0L, 10L, 1L), ("a", 5L, 12L, 2L),   // island [0,12]
      ("a", 100L, 101L, 3L),                     // island [100,101]
      ("a", 200L, 210L, 4L),                     // island [200,210]
      ("b", 0L, 5L, 5L))                         // single island
      .toDF("k", "s", "e", "id")
    val got = Intervals.gaps(df, Seq("k"), "s", "e", "id")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got.size == 2)
    assert(got(("a", 12L)) == ((100L, 88L)))
    assert(got(("a", 101L)) == ((200L, 99L)))
  }

  test("peakConcurrency: half-open touch does not overlap, earliest " +
    "peak instant, zero-length dropped, brute-force random match") {
    val df = Seq(
      ("a", 0L, 10L), ("a", 10L, 20L), // touching: never concurrent
      ("a", 15L, 30L), ("a", 16L, 17L), // 3 open in [16,17)
      ("a", 25L, 25L), // zero-length: ignored
      ("b", 5L, 6L))
      .toDF("k", "s", "e")
    val got = Intervals.peakConcurrency(df, Seq("k"), "s", "e")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("a") == ((4L, 3L, 16L)))
    assert(got("b") == ((1L, 1L, 5L)))

    val rng = new scala.util.Random(61)
    val rows = (1 to 400).map { _ =>
      val s = rng.nextInt(200).toLong
      (s"g${rng.nextInt(3)}", s, s + rng.nextInt(30).toLong)
    }
    val expected = rows.filter(t => t._3 > t._2).groupBy(_._1)
      .view.mapValues { iv =>
        val profile = (0L to 240L).map(t =>
          t -> iv.count(x => x._2 <= t && t < x._3).toLong)
        val pk = profile.map(_._2).max
        (iv.size.toLong, pk, profile.find(_._2 == pk).get._1)
      }.toMap
    val run = (p: Int) =>
      Intervals.peakConcurrency(rows.toDF("k", "s", "e").repartition(p),
        Seq("k"), "s", "e").collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val a = run(1)
    assert(a == run(11) && a == expected)
  }
}
