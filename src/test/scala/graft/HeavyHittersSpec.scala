package graft

import graft.ops.HeavyHitters

/** Heavy hitters: exact top-k on both the sketch-guaranteed fast path and
  * the fallback, across partitionings, with deterministic tie-breaks. */
class HeavyHittersSpec extends SparkSpec {

  import spark.implicits._

  private def exact(rows: Seq[String], k: Int): Seq[(String, Long)] =
    rows.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (key, c) => (-c, key) }.take(k)

  private def run(rows: Seq[String], k: Int, slots: Int, parts: Int) =
    HeavyHitters.topKByFrequency(
      rows.toDF("k").repartition(parts), "k", k, slots)
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (key, c) => (-c, key) }.toSeq

  test("skewed input (fast path): matches exact top-k") {
    // Zipf-ish: key i appears 1000/i times — strong heavy hitters, so
    // the k-th count clears N/(slots+1) and the candidate path is taken.
    val rows = (1 to 50).flatMap(i => Seq.fill(1000 / i)(f"k$i%03d"))
    assert(run(rows, k = 10, slots = 64, parts = 7) == exact(rows, 10))
  }

  test("uniform input with tiny sketch (fallback path): still exact") {
    // 200 keys × 5 occurrences, 8 slots: N/(slots+1) = 1000/9 >> 5, the
    // guarantee cannot hold, the full aggregation must kick in.
    val rows = (1 to 200).flatMap(i => Seq.fill(5)(f"u$i%03d"))
    assert(run(rows, k = 15, slots = 15, parts = 5) == exact(rows, 15))
  }

  test("ties at the boundary break by ascending key") {
    val rows = Seq.fill(4)("b") ++ Seq.fill(4)("a") ++ Seq.fill(4)("c") ++
      Seq.fill(9)("hot")
    val got = run(rows, k = 2, slots = 8, parts = 3)
    assert(got == Seq(("hot", 9L), ("a", 4L)))
  }

  test("result is identical across partitionings") {
    val rng = new scala.util.Random(11)
    val rows = Seq.fill(5000)(s"k${(rng.nextGaussian().abs * 30).toInt}")
    val a = run(rows, k = 12, slots = 96, parts = 1)
    val b = run(rows, k = 12, slots = 96, parts = 23)
    assert(a == b && a == exact(rows, 12))
  }

  test("fewer distinct keys than k returns them all") {
    val rows = Seq("x", "x", "y")
    assert(run(rows, k = 10, slots = 16, parts = 2) ==
      Seq(("x", 2L), ("y", 1L)))
  }

  test("nulls are excluded") {
    val df = Seq(Some("a"), None, Some("a"), None, Some("b"))
      .toDF("k")
    val got = HeavyHitters.topKByFrequency(df, "k", 5, 16)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("a", 2L), ("b", 1L)))
  }
}
