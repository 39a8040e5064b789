package graft

import graft.ops.Components

/** Connected components: clusters labeled by their minimum id, chains
  * converge, separate components stay separate. */
class ComponentsSpec extends SparkSpec {

  import spark.implicits._

  private def cc(edges: (Long, Long)*): Map[Long, Long] =
    Components.connectedComponents(edges.toSeq.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("comp")).toMap

  test("two separate components get their own min labels") {
    val got = cc((5L, 3L), (3L, 9L), (20L, 30L))
    assert(got == Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 30L -> 20L))
  }

  test("a long chain converges to the global minimum") {
    // 0-1-2-...-12 as a path: diameter forces multiple propagation rounds
    val path = (0L until 12L).map(i => (i, i + 1))
    val got = cc(path: _*)
    assert(got.size == 13)
    assert(got.values.toSet == Set(0L))
  }

  test("edge direction and duplication don't matter") {
    val a = cc((1L, 2L), (3L, 2L))
    val b = cc((2L, 1L), (2L, 3L), (1L, 2L), (3L, 2L))
    assert(a == b)
    assert(a.values.toSet == Set(1L))
  }

  test("a 2000-edge random graph converges and matches a union-find model") {
    val rng = new scala.util.Random(99)
    val edges = List.fill(2000)(
      (rng.nextInt(800).toLong, rng.nextInt(800).toLong))
      .filter(e => e._1 != e._2)
    // driver-side union-find model
    val parent = collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val model = parent.keys.map(v => v -> find(v)).toMap
    // union-find roots are not necessarily component minima; normalize
    val minOfComp = model.groupBy(_._2).map { case (r, m) => r -> m.keys.min }
    val expected = model.map { case (v, r) => v -> minOfComp(r) }
    val got = cc(edges: _*)
    assert(got == expected)
  }

  test("non-convergence within maxRounds fails loud, not silently wrong") {
    val path = (0L until 12L).map(i => (i, i + 1))
    val err = intercept[IllegalArgumentException] {
      Components.connectedComponents(
        path.toDF("a", "b"), "a", "b", maxRounds = 2).collect()
    }
    assert(err.getMessage.contains("converge"))
  }

  // ---- large-star/small-star (log-round) --------------------------------

  private def ccStar(edges: (Long, Long)*): Map[Long, Long] =
    Components.connectedComponentsStar(edges.toSeq.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("comp")).toMap

  test("star rewrite matches propagation on random graphs") {
    val rng = new scala.util.Random(7)
    for (trial <- 0 until 4) {
      val n = 60 + trial * 40
      val edges = List.fill(3 * n)(
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      val prop = cc(edges: _*)
      val star = ccStar(edges: _*)
      assert(star == prop, s"trial $trial diverged")
    }
  }

  test("star rewrite keeps self-loop-only vertices as their own component") {
    val got = ccStar((4L, 4L), (1L, 2L))
    assert(got == Map(4L -> 4L, 1L -> 1L, 2L -> 1L))
  }

  test("clusterRepresentatives keeps the best-scored member, singletons themselves") {
    import org.apache.spark.sql.functions.col
    // cluster {1,2,3} (chain), cluster {7,8}, singleton 9
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    // scores: 2 wins its cluster; 7 and 8 TIE → smaller id (7) wins
    val docs = Seq((1L, 10L), (2L, 50L), (3L, 20L), (7L, 5L), (8L, 5L),
      (9L, 1L)).toDF("doc_id", "score")
    val got = graft.ops.NearDup.clusterRepresentatives(
      docs, "doc_id", "score", pairs)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(got(1L) == (1L, 2L, false))
    assert(got(2L) == (1L, 2L, true))
    assert(got(3L) == (1L, 2L, false))
    assert(got(7L) == (7L, 7L, true))
    assert(got(8L) == (7L, 7L, false))
    assert(got(9L) == (9L, 9L, true)) // no pair → its own cluster, kept
    assert(got.values.count(_._3) == 3)
  }

  test("freeLocalCheckpoint releases per-round checkpoint blocks") {
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val df = Seq(1, 2, 3).toDF("x").localCheckpoint()
    val added = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    assert(added.nonEmpty, "localCheckpoint should persist an RDD")
    org.apache.spark.sql.GraftSql.freeLocalCheckpoint(df)
    val deadline = System.currentTimeMillis() + 10000
    def stillThere: Set[Int] =
      spark.sparkContext.getPersistentRDDs.keySet.toSet.intersect(added)
    while (stillThere.nonEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    assert(stillThere.isEmpty,
      "checkpointed RDD blocks must be released (async unpersist)")
  }

  test("star rewrite solves a 5000-edge chain propagation's bound cannot") {
    // Diameter 5000: propagation would need 5000 rounds (its default bound
    // is 50); the star rewrite needs O(log n).
    val path = (0L until 5000L).map(i => (i, i + 1))
    val got = Components.connectedComponentsStar(
      path.toDF("a", "b"), "a", "b", maxRounds = 30)
    val rows = got.collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("comp"))
    assert(rows.length == 5001)
    assert(rows.forall(_._2 == 0L))
  }

  test("incrementalComponents equals full recompute on the union: " +
    "merges across stored components, relabels below the old min, " +
    "fresh vertices, untouched components stable") {
    import spark.implicits._
    // stored graph: {10,11,12} (comp 10), {20,21} (comp 20), {30,31}
    val base = Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L))
      .toDF("a", "b")
    val prior = Components.connectedComponents(base, "a", "b")
    // new batch: bridge 12-20 (merges comps 10+20), edge 5-11 (NEW
    // vertex BELOW the old min -> whole merged comp relabels to 5),
    // and an isolated fresh pair 40-41; {30,31} untouched
    val fresh = Seq((12L, 20L), (5L, 11L), (40L, 41L)).toDF("a", "b")
    val inc = Components.incrementalComponents(prior, fresh, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Components.connectedComponents(
      base.unionByName(fresh), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == full)
    assert(inc(12L) == 5L && inc(21L) == 5L && inc(5L) == 5L)
    assert(inc(30L) == 30L && inc(31L) == 30L)
    assert(inc(40L) == 40L && inc(41L) == 40L)
  }

  test("incrementalComponents equals full recompute on random batches") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val all = (1 to 250).map(_ =>
      (rng.nextInt(120).toLong, rng.nextInt(120).toLong))
      .filter(e => e._1 != e._2)
    val (base, fresh) = all.partition(e => (e._1 + e._2) % 3 != 0)
    val prior = Components.connectedComponents(base.toDF("a", "b"), "a", "b")
    val inc = Components.incrementalComponents(
      prior, fresh.toDF("a", "b"), "a", "b")
    val full = Components.connectedComponents(all.toDF("a", "b"), "a", "b")
    assertSameRows(inc.select("id", "comp"), full.select("id", "comp"))
  }

  test("gridDbscan: dense blobs cluster, sparse cells drop, diagonal " +
      "adjacency unions, singleton core stands alone") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Blob A: cells (0,0),(1,1) diagonal neighbors, 3 points each.
    // Blob B: cell (5,5), 4 points. Noise: (9,9) with 1 point.
    def fill(x: Long, y: Long, n: Int) = Seq.fill(n)((x, y))
    val pts = (fill(0, 0, 3) ++ fill(1, 1, 3) ++ fill(5, 5, 4) ++
      fill(9, 9, 1)).toDF("x", "y")
    val got = Components.gridDbscan(pts, col("x"), col("y"), minPts = 3L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    // Cluster A: min cell key 0*100000+0 = 0; 2 cells, 6 points,
    // bbox (0..1, 0..1). Cluster B: key 500005, 1 cell, 4 points.
    assert(got.keySet == Set(0L, 500005L))
    assert(got(0L) == ((2L, 6L, 0L, 1L, 0L, 1L)))
    assert(got(500005L) == ((1L, 4L, 5L, 5L, 5L, 5L)))
    // Lower minPts: the noise cell becomes its own singleton cluster.
    val loose = Components.gridDbscan(pts, col("x"), col("y"), minPts = 1L)
      .collect().map(_.getLong(0)).toSet
    assert(loose.contains(900009L))
    // Non-adjacent cores never merge even at distance 2.
    val far = (fill(0, 0, 3) ++ fill(0, 2, 3)).toDF("x", "y")
    assert(Components.gridDbscan(far, col("x"), col("y"), 3L)
      .count() == 2L)
  }

  test("stronglyConnectedComponents: cycles collapse, DAG edges don't, " +
      "a smaller non-mutual ancestor defers extraction to a later " +
      "phase (multi-phase coloring), self-loop and sink singletons") {
    import spark.implicits._
    // 0 -> 1 -> 2 -> 3 -> 1 (SCC {1,2,3} shadowed by ancestor 0),
    // 3 -> 4 <-> 5 (SCC {4,5}), 5 -> 6 (sink), 7 -> 7 (self loop)
    val edges = Seq(
      (0L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (3L, 4L), (4L, 5L), (5L, 4L), (5L, 6L), (7L, 7L))
      .toDF("src", "dst")
    val got = Components.stronglyConnectedComponents(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 6L, 7L -> 7L))
    // partitioning invariance
    val got2 = Components.stronglyConnectedComponents(
      edges.repartition(7), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == got)
  }
}
