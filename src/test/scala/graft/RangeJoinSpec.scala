package graft

import org.apache.spark.sql.functions.{abs => cAbs, col => cCol}

/** Grid-cell spatial neighbor join: the cell-bucketed plan must equal
  * the brute-force radius join exactly, including boundary distances. */
class SpatialSpec extends SparkSpec {
  import spark.implicits._

  test("neighborJoin equals the brute-force radius join on a random " +
    "point set, including exact boundary pairs") {
    val rng = new scala.util.Random(11)
    val a = (1L to 200L).map(i => (i, rng.nextInt(300).toLong,
      rng.nextInt(300).toLong)).toDF("id", "x", "y")
    val b = (1L to 150L).map(i => (i, rng.nextInt(300).toLong,
      rng.nextInt(300).toLong)).toDF("id", "x", "y")
    val r = 9L
    val got = graft.ops.Spatial.neighborJoin(a, "id", "x", "y",
        b, "id", "x", "y", r)
      .collect().map(q => (q.getLong(0), q.getLong(1), q.getLong(2))).toSet
    val brute = a.as("p").crossJoin(b.as("q"))
      .filter(cAbs(cCol("p.x") - cCol("q.x")) <= r &&
        cAbs(cCol("p.y") - cCol("q.y")) <= r)
      .select(cCol("p.id"), cCol("q.id"),
        (cCol("p.x") - cCol("q.x")) * (cCol("p.x") - cCol("q.x")) +
          (cCol("p.y") - cCol("q.y")) * (cCol("p.y") - cCol("q.y")))
      .collect().map(q => (q.getLong(0), q.getLong(1), q.getLong(2))).toSet
    assert(got == brute)
    assert(brute.nonEmpty, "fixture must produce pairs")
    // a pair at EXACTLY Chebyshev distance r must be present
    val aa = Seq((1L, 0L, 0L)).toDF("id", "x", "y")
    val bb = Seq((2L, r, r)).toDF("id", "x", "y")
    val edge = graft.ops.Spatial.neighborJoin(aa, "id", "x", "y",
      bb, "id", "x", "y", r).collect()
    assert(edge.length == 1 && edge.head.getLong(2) == 2 * r * r)
  }

  test("hotspotCells: an isolated dense cell scores ratio 1000; a cell " +
    "among equal neighbors scores its fair share") {
    // 5 points in cell (0,0); 1 point each in every cell of the 3x3
    // block around (10,10)
    val dense = Seq.fill(5)((2L, 3L))
    val block = for (dx <- 0L to 2L; dy <- 0L to 2L)
      yield (500L + 50 * dx + 5, 500L + 50 * dy + 5)
    val df = (dense ++ block).toDF("x", "y")
    val got = graft.ops.Spatial.hotspotCells(df, "x", "y", cell = 50L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got((0L, 0L)) == ((5L, 5L, 1000L)), "isolated cell owns 100%")
    assert(got((11L, 11L)) == ((1L, 9L, 111L)), "center of the block " +
      "sees all 9 neighbors")
    assert(got((10L, 10L)) == ((1L, 4L, 250L)), "corner sees 4")
  }
}

import org.apache.spark.sql.functions._

import graft.ops.RangeJoin

/** Bucketed interval-overlap join: identical rows to the naive
  * nested-loop predicate, exactly once per pair, with NO nested-loop or
  * cartesian operator in the plan. */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  private def naive(
      l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
    l.crossJoin(r)
      .where(col("ls") <= col("re") && col("rs") <= col("le"))

  test("matches the naive nested-loop result across bucket widths") {
    val rng = new scala.util.Random(42)
    val l = Seq.tabulate(80) { i =>
      val s = rng.nextInt(1000).toLong; (i.toLong, s, s + rng.nextInt(120))
    }.toDF("l_id", "ls", "le")
    val r = Seq.tabulate(80) { i =>
      val s = rng.nextInt(1000).toLong; (i.toLong, s, s + rng.nextInt(40))
    }.toDF("r_id", "rs", "re")
    for (w <- Seq(7L, 50L, 1000L, 5000L)) {
      val got = RangeJoin.intervalOverlapJoin(l, r, "ls", "le", "rs", "re", w)
      assertSameRows(got, naive(l, r))
    }
  }

  test("pairs spanning many shared buckets are emitted exactly once") {
    val l = Seq((1L, 0L, 1000L)).toDF("l_id", "ls", "le")
    val r = Seq((2L, 10L, 990L)).toDF("r_id", "rs", "re")
    // width 10 → ~99 shared buckets; ownership must dedup to one row
    val got = RangeJoin.intervalOverlapJoin(l, r, "ls", "le", "rs", "re", 10L)
    assert(got.count() == 1L)
  }

  test("negative coordinates still match exactly once (trunc-div buckets)") {
    val l = Seq((1L, -25L, -5L), (2L, -100L, -80L)).toDF("l_id", "ls", "le")
    val r = Seq((3L, -10L, 15L)).toDF("r_id", "rs", "re")
    val got = RangeJoin.intervalOverlapJoin(l, r, "ls", "le", "rs", "re", 10L)
    assert(got.collect().map(r => (r.getAs[Long]("l_id"), r.getAs[Long]("r_id")))
      .toSet == Set((1L, 3L)))
  }

  test("equiKeys restrict matches and merge in the output") {
    val l = Seq((1L, "a", 0L, 100L), (2L, "b", 0L, 100L))
      .toDF("l_id", "k", "ls", "le")
    val r = Seq((7L, "a", 50L, 60L), (8L, "c", 50L, 60L))
      .toDF("r_id", "k", "rs", "re")
    val got = RangeJoin.intervalOverlapJoin(
      l, r, "ls", "le", "rs", "re", 10L, equiKeys = Seq("k"))
    assert(got.collect().map(r =>
      (r.getAs[Long]("l_id"), r.getAs[Long]("r_id"))).toSeq == Seq((1L, 7L)))
    assert(got.columns.count(_ == "k") == 1)
  }

  test("the plan is an equi-join — no nested loop, no cartesian product") {
    val l = Seq((1L, 0L, 10L)).toDF("l_id", "ls", "le")
    val r = Seq((2L, 5L, 15L)).toDF("r_id", "rs", "re")
    val plan = RangeJoin.intervalOverlapJoin(l, r, "ls", "le", "rs", "re", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // while the naive predicate join IS the nested loop
    val naivePlan = naive(l, r).queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin") ||
      naivePlan.contains("CartesianProduct"), naivePlan)
  }

  test("touching endpoints match; disjoint intervals do not") {
    val l = Seq((1L, 0L, 10L)).toDF("l_id", "ls", "le")
    val r = Seq((2L, 10L, 20L), (3L, 11L, 20L)).toDF("r_id", "rs", "re")
    val got = RangeJoin.intervalOverlapJoin(l, r, "ls", "le", "rs", "re", 5L)
    assert(got.collect().map(_.getAs[Long]("r_id")).toSeq == Seq(2L))
  }
}
