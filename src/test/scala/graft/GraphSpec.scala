package graft

import graft.ops.Graph

/** PageRank: fixed-point integer power iteration — checked against a
  * driver-side double-precision model, plus structure and determinism. */
class GraphSpec extends SparkSpec {

  import spark.implicits._

  private val Q = 1000000L

  private def pr(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pageRank(edges.toDF("s", "d"), "s", "d", iters, Q)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("rank_q"))
      .toMap

  /** Driver-side double model of the same simplified PageRank (no
    * dangling redistribution), for tolerance comparison. */
  private def model(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] = {
    val e = edges.distinct
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct
    val out = e.groupBy(_._1).view.mapValues(_.size).toMap
    val in = e.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    var r = nodes.map(_ -> 1.0 / nodes.size).toMap
    for (_ <- 0 until iters)
      r = nodes.map { v =>
        v -> (0.15 / nodes.size +
          0.85 * in.getOrElse(v, Nil).map(u => r(u) / out(u)).sum)
      }.toMap
    r
  }

  test("matches the double-precision model within fixed-point tolerance") {
    val rng = new scala.util.Random(7)
    val edges = List.fill(300)(
      (rng.nextInt(40).toLong, rng.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
    // Symmetrize so every node has outdegree >= 1 (no mass leak, which
    // would loosen the bound without invalidating either side).
    val sym = (edges ++ edges.map(_.swap)).distinct
    val got = pr(sym, iters = 5)
    val want = model(sym, iters = 5)
    assert(got.keySet == want.keySet)
    // Floors lose at most ~1 unit per in-edge per iteration; with <=40
    // in-edges and 5 iterations, 300 units is a generous envelope.
    for ((v, w) <- want)
      assert(math.abs(got(v) - (w * Q)) <= 300.0,
        s"node $v: got ${got(v)}, model ${(w * Q).toLong}")
  }

  test("hub of a star ranks strictly above the leaves, leaves tie") {
    val leaves = (1L to 6L)
    val edges = leaves.flatMap(l => Seq((0L, l), (l, 0L)))
    val got = pr(edges, iters = 4)
    val leafRanks = leaves.map(got).toSet
    assert(leafRanks.size == 1, s"leaves should tie, got $leafRanks")
    assert(got(0L) > leafRanks.head)
  }

  test("duplicate edges collapse: multiplicity does not change ranks") {
    val base = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
    assert(pr(base, 3) == pr(base ++ base ++ base, 3))
  }

  test("iters = 0 returns the uniform init") {
    val got = pr(Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)), iters = 0)
    assert(got.values.toSet == Set(Q / 3))
  }

  test("result is identical across input partitionings (exact integers)") {
    val rng = new scala.util.Random(13)
    val edges = List.fill(500)(
      (rng.nextInt(60).toLong, rng.nextInt(60).toLong))
      .filter(e => e._1 != e._2)
    val df1 = edges.toDF("s", "d").repartition(1)
    val df17 = edges.toDF("s", "d").repartition(17)
    val a = Graph.pageRank(df1, "s", "d", 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = Graph.pageRank(df17, "s", "d", 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }

  private def lp(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.labelPropagation(edges.toDF("s", "d"), "s", "d", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("labelPropagation: cliques converge to their min label") {
    // two triangles bridged by one edge: each triangle's majority is
    // internal, so labels settle to each clique's minimum id
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L),
      (3L, 10L))
    val got = lp(edges, 4)
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L)
    assert(Set(10L, 11L, 12L).map(got).size == 1)
    assert(got(10L) <= 10L) // the bridge can pull 10 toward 1's community
  }

  test("labelPropagation: iters=0 is the identity; isolated nodes keep labels") {
    val got = lp(Seq((5L, 5L), (1L, 2L)), 0)
    assert(got == Map(5L -> 5L, 1L -> 1L, 2L -> 2L))
    // a self-loop-only node never changes even after rounds
    assert(lp(Seq((5L, 5L), (1L, 2L)), 3)(5L) == 5L)
  }

  test("labelPropagation: identical across partitionings") {
    val rng = new scala.util.Random(23)
    val edges = List.fill(600)(
      (rng.nextInt(80).toLong, rng.nextInt(80).toLong))
      .filter(e => e._1 != e._2)
    val run = (p: Int) =>
      Graph.labelPropagation(edges.toDF("s", "d").repartition(p), "s", "d", 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(run(1) == run(19))
  }

  private def tc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.triangleCount(edges.toDF("s", "d"), "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangles: K4 has 4 triangles, 3 per node; paths/stars have none") {
    val k4 = for {
      a <- 0L to 3L; b <- 0L to 3L if a < b
    } yield (a, b)
    assert(tc(k4) == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    assert(tc(Seq((1L, 2L), (2L, 3L), (3L, 4L))).isEmpty) // path
    assert(tc((1L to 9L).map((0L, _))).isEmpty)           // star
  }

  test("triangles: direction, duplicates, and self-loops are immaterial") {
    val base = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val noisy = base ++ base.map(_.swap) ++ base ++ Seq((1L, 1L), (2L, 2L))
    assert(tc(noisy) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("kCore: clique survives, appendages peel, k above max empties") {
    // K5 clique (internal degree 4) with a pendant chain hanging off it
    val clique = for { a <- 1L to 5L; b <- 1L to 5L if a < b } yield (a, b)
    val chain = Seq((5L, 6L), (6L, 7L), (7L, 8L))
    val df = (clique ++ chain).toDF("a", "b")
    val core3 = graft.ops.Graph.kCore(df, "a", "b", k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core3 == Map(1L -> 4L, 2L -> 4L, 3L -> 4L, 4L -> 4L, 5L -> 4L))
    assert(graft.ops.Graph.kCore(df, "a", "b", k = 5).collect().isEmpty)
  }

  test("kCore matches reference peeling on a random graph") {
    val rng = new scala.util.Random(11)
    val edges = List.fill(300)(
      (rng.nextInt(60).toLong, rng.nextInt(60).toLong))
      .filter(e => e._1 != e._2)
    def refPeel(k: Int): Map[Long, Long] = {
      var e = edges.flatMap(p => Seq(p, p.swap)).distinct
      var stable = false
      while (!stable) {
        val deg = e.groupBy(_._1).map { case (n, xs) => n -> xs.size }
        val surv = deg.filter(_._2 >= k).keySet
        val next = e.filter(p => surv(p._1) && surv(p._2))
        stable = next == e
        e = next
      }
      e.groupBy(_._1).map { case (n, xs) => n -> xs.size.toLong }
    }
    for (k <- Seq(3, 6, 9)) {
      val got = graft.ops.Graph.kCore(edges.toDF("a", "b"), "a", "b", k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == refPeel(k), s"k=$k")
    }
  }

  test("bfsHops: nearest-seed hop counts, depth bound, unreachable absent") {
    //   0 -> 1 -> 2 -> 3 -> 4      10 (isolated), seeds {0, 3}
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (10L, 10L))
      .toDF("s", "d")
    val seeds = Seq(0L, 3L).toDF("node")
    val got = graft.ops.Graph.bfsHops(e, "s", "d", seeds, depth = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 2 is one hop from... 1->2 (dist 2 via 0); 4 is one hop from seed 3
    assert(got == Map(0L -> 0L, 3L -> 0L, 1L -> 1L, 4L -> 1L, 2L -> 2L))
    val d0 = graft.ops.Graph.bfsHops(e, "s", "d", seeds, depth = 0)
      .collect().map(_.getLong(0)).toSet
    assert(d0 == Set(0L, 3L))
  }

  test("triangles: degree-ordered enumeration matches brute force") {
    val rng = new scala.util.Random(7)
    val edges = List.fill(400)(
      (rng.nextInt(40).toLong, rng.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
    val und = edges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
      .distinct.toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val brute = (for {
      a <- nodes; b <- nodes if a < b && und((a, b))
      c <- nodes if b < c && und((b, c)) && und((a, c))
    } yield Seq(a, b, c)).flatten
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    assert(tc(edges) == brute)
  }

  /** Driver-side replay of personalizedPageRank()'s exact arithmetic. */
  private def pprModel(edges: Seq[(Long, Long)], seeds: Set[Long],
      iters: Int): Map[Long, Long] = {
    val e = edges.distinct
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct
    val out = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val in = e.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val sd = seeds.intersect(nodes.toSet)
    val telQ = (15L * Q) / (100L * sd.size)
    var r = nodes.map(n =>
      n -> (if (sd(n)) Q / sd.size else 0L)).toMap
    for (_ <- 0 until iters) {
      r = nodes.map { n =>
        val acc = in.getOrElse(n, Nil).map(u => r(u) / out(u)).sum
        n -> ((if (sd(n)) telQ else 0L) + (85L * acc) / 100L)
      }.toMap
    }
    r
  }

  test("personalized PageRank: mass concentrates near seeds, ghost " +
    "seeds are dropped, exact replay matches across partitionings") {
    // chain 1-2-3-4-5 (symmetric) with seed {1}: rank decays with hops
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .flatMap(p => Seq(p, p.swap))
    val sdf = Seq(1L, 99L).toDF("node") // 99 is not in the graph
    val got = Graph.personalizedPageRank(chain.toDF("s", "d"), "s", "d",
      sdf, iters = 3, Q).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == pprModel(chain, Set(1L, 99L), 3))
    // mass ALTERNATES by parity on a path (odd iterations push it to
    // the seed's neighbors), so compare within a parity class: each
    // node outranks the node two more hops from the seed
    assert(got(2L) > got(4L) && got(1L) > got(3L) && got(3L) > got(5L))
    // random graph, multiple seeds, repartitioned input
    val rng = new scala.util.Random(71)
    val edges = Seq.fill(500)(
      (rng.nextInt(40).toLong, rng.nextInt(40).toLong))
      .filter(p => p._1 != p._2)
    val seeds = Set(0L, 5L, 11L)
    val big = Graph.personalizedPageRank(
      edges.toDF("s", "d").repartition(9), "s", "d",
      seeds.toSeq.toDF("node"), iters = 4, Q).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(big == pprModel(edges, seeds, 4))
  }

  /** Driver-side replay of hits()'s exact fixed-point arithmetic. */
  private def hitsModel(edges: Seq[(Long, Long)], iters: Int)
      : (Map[Long, Long], Map[Long, Long]) = {
    val e = edges.distinct
    var h = e.map(_._1).distinct.map(_ -> Q).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 0 until iters) {
      val ra = e.groupBy(_._2).view.mapValues(_.map(p => h(p._1)).sum).toMap
      val ta = ra.values.sum
      a = ra.view.mapValues(r => r * Q / ta).toMap
      val rh = e.groupBy(_._1).view.mapValues(_.map(p => a(p._2)).sum).toMap
      val th = rh.values.sum
      h = rh.view.mapValues(r => r * Q / th).toMap
    }
    (h, a)
  }

  private def hitsRun(edges: Seq[(Long, Long)], iters: Int)
      : (Map[Long, Long], Map[Long, Long]) = {
    val rows = Graph.hits(edges.toDF("s", "d"), "s", "d", iters, Q)
      .collect()
      .map(r => (r.getAs[String]("kind"), r.getAs[Long]("node"),
        r.getAs[Long]("score_q")))
    (rows.collect { case ("hub", n, s) => n -> s }.toMap,
      rows.collect { case ("authority", n, s) => n -> s }.toMap)
  }

  test("hits: popular authority outranks niche; its stocker is the top hub") {
    // suppliers 1,2,3 → parts 10,11: part 10 stocked by all three,
    // part 11 only by supplier 1; supplier 1 stocks both.
    val e = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 11L))
    val (h, a) = hitsRun(e, iters = 3)
    assert(a(10L) > a(11L))
    assert(h(1L) > h(2L) && h(2L) == h(3L))
    assert(hitsModel(e, 3) == ((h, a)))
  }

  test("hits matches the exact fixed-point replay on a random bipartite " +
    "graph, across partitionings") {
    val rng = new scala.util.Random(61)
    val edges = Seq.fill(600)(
      (rng.nextInt(25).toLong, 100L + rng.nextInt(60).toLong))
    val expected = hitsModel(edges, 3)
    assert(hitsRun(edges, 3) == expected)
    val repart = Graph.hits(edges.toDF("s", "d").repartition(11),
      "s", "d", 3, Q).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
    val got = (repart.collect { case ("hub", n, s) => n -> s }.toMap,
      repart.collect { case ("authority", n, s) => n -> s }.toMap)
    assert(got == expected)
  }

  test("commonNeighborLinks: scores unlinked 2-hop pairs, excludes " +
    "existing edges, hub cap prunes wedges but keeps true degrees") {
    import spark.implicits._
    // path 1-2, 1-3, 4-2, 4-3 (square without diagonals) plus edge 2-3:
    // pair (1,4) shares {2,3} and is unlinked; (2,3) shares {1,4} but IS
    // an edge -> excluded
    val edges = Seq((1L, 2L), (1L, 3L), (4L, 2L), (4L, 3L), (2L, 3L))
      .toDF("s", "d")
    val r = graft.ops.Graph.commonNeighborLinks(edges, "s", "d",
      minCommon = 2L)
    val got = r.collect().map(x => (x.getLong(0), x.getLong(1)) ->
      ((x.getLong(2), x.getLong(3), x.getLong(4), x.getDouble(5)))).toMap
    // deg(1)=2, deg(4)=2, cn=2 -> jaccard 2/(2+2-2)=1.0
    assert(got((1L, 4L)) == ((2L, 2L, 2L, 1.0)))
    assert(!got.contains((2L, 3L)))
    // hub cap: excluding node 1 (degree 2) as a middle with maxDegree=1
    // kills the (2,3)-through-1 wedges AND the (1,4) pair's 2-count
    val capped = graft.ops.Graph.commonNeighborLinks(edges, "s", "d",
      minCommon = 1L, maxDegree = 1L)
    assert(capped.count() == 0L)
  }

  test("assortativity: star graph is perfectly disassortative (-1), " +
    "regular graph (zero variance) yields NULL") {
    import spark.implicits._
    val star = (1L to 5L).map(i => (0L, i)).toDF("a", "b")
    val r = graft.ops.Graph.assortativity(star, "a", "b").head()
    assert(r.getLong(0) == 5L)
    assert(r.getDouble(1) == -1.0)
    // a cycle: every degree 2 -> zero degree variance -> NULL
    val cycle = (0L until 6L).map(i => (i, (i + 1) % 6)).toDF("a", "b")
    val c = graft.ops.Graph.assortativity(cycle, "a", "b").head()
    assert(c.isNullAt(1))
  }

  test("degreeStats: exact counts and extremes; star graph alpha; " +
    "all-degree-1 graph yields NULL alpha, not a throw") {
    import spark.implicits._
    // star: center 0 connected to 1..5 -> degrees [5,1,1,1,1,1]
    val star = (1L to 5L).map(i => (0L, i)).toDF("a", "b")
    val r = graft.ops.Graph.degreeStats(star, "a", "b").head()
    assert(r.getLong(0) == 6L && r.getLong(1) == 5L && r.getLong(2) == 5L)
    assert(r.getDouble(3) == 10.0 / 6.0)
    // alpha = 1 + 6 / (5*ln1 + 1*ln5) = 1 + 6/ln5
    assert(math.abs(r.getDouble(4) -
      (1.0 + 6.0 / math.log(5.0))) < 1e-7)
    // a single edge: both degrees 1 -> ln sum 0 -> NULL alpha
    val pair = Seq((1L, 2L)).toDF("a", "b")
    val p = graft.ops.Graph.degreeStats(pair, "a", "b").head()
    assert(p.isNullAt(4))
  }

  test("modularity: two clean cliques score high, random labels score " +
    "~0, exact-integer arithmetic") {
    import spark.implicits._
    // two 4-cliques joined by one bridge edge: 13 edges total
    val cl = (g: Long) => for {
      i <- 0L until 4L; j <- (i + 1) until 4L
    } yield (g * 10 + i, g * 10 + j)
    val edges = (cl(0) ++ cl(1) :+ ((3L, 10L))).toDF("a", "b")
    val goodLabels = (0L until 4L).map(i => (i, 0L)) ++
      (10L until 14L).map(i => (i, 10L))
    val q = graft.ops.Graph.modularity(edges, "a", "b",
      goodLabels.toDF("n", "c"), "n", "c").head()
    assert(q.getLong(0) == 13L && q.getLong(1) == 2L)
    // e_c = 6 each, D_0 = D_1 = 13, m = 13:
    // Q = (4*13*6 - 169)*2 / (4*169)
    assert(q.getDouble(2) == (2.0 * (4 * 13 * 6 - 169)) / (4 * 169))
    assert(q.getDouble(2) > 0.3)
    // everyone in ONE community: Q = e/m - 1 = 0 (13/13 - (26/26)^2)
    val one = (0L until 14L).map(i => (i, 0L)).toDF("n", "c")
    val q1 = graft.ops.Graph.modularity(edges, "a", "b", one, "n", "c")
      .head()
    assert(q1.getDouble(2) == 0.0)
  }

  test("commonNeighborLinks plans with equi-joins only — no cartesian " +
    "product anywhere (the wedge join is keyed on the middle node)") {
    import spark.implicits._
    val edges = (1 to 60).map(i => (i.toLong % 12, (i * 7).toLong % 12))
      .filter(e => e._1 != e._2).toDF("s", "d")
    val plan = graft.ops.Graph.commonNeighborLinks(edges, "s", "d", 2L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("commonNeighborLinks is partitioning-invariant") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val edges = (1 to 300).map(_ =>
      (rng.nextInt(40).toLong, rng.nextInt(40).toLong))
      .filter(e => e._1 != e._2).toDF("s", "d")
    val a = graft.ops.Graph.commonNeighborLinks(edges, "s", "d", 2L)
    val b = graft.ops.Graph.commonNeighborLinks(
      edges.repartition(13), "s", "d", 2L)
    assertSameRows(a, b)
  }

  test("transitivity: 3T/W on a known graph; NULL on a matching") {
    import spark.implicits._
    // triangle 1-2-3 with pendant 4 on node 3:
    // T = 1; wedges: deg (2,2,3,1) → 1+1+3+0 = 5 → C = 3/5
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("s", "d")
    val r = graft.ops.Graph.transitivity(edges, "s", "d").collect().head
    assert(r.getLong(0) == 1L && r.getLong(1) == 5L)
    assert(r.getDouble(2) == 3.0 / 5.0)
    // perfect matching: no wedges at all → NULL, not a crash
    val m = Seq((1L, 2L), (3L, 4L)).toDF("s", "d")
    val r2 = graft.ops.Graph.transitivity(m, "s", "d").collect().head
    assert(r2.getLong(1) == 0L && r2.isNullAt(2))
  }

  test("localClustering: closure rate per node, NULL under degree 2") {
    import spark.implicits._
    // triangle 1-2-3 plus pendant 4 hanging off 3, isolated pair 5-6
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (5L, 6L))
      .toDF("s", "d")
    val got = graft.ops.Graph.localClustering(edges, "s", "d")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(got(1L) == ((2L, 1L, Some(1.0))))
    assert(got(2L) == ((2L, 1L, Some(1.0))))
    // node 3: degree 3, one closed pair of three → 2·1/(3·2) = 1/3
    assert(got(3L) == ((3L, 1L, Some(1.0 / 3.0))))
    assert(got(4L) == ((1L, 0L, None)))
    assert(got(5L) == ((1L, 0L, None)) && got(6L) == ((1L, 0L, None)))
  }

  test("subtreeRollup: heap-hierarchy counts, depths, and value sums") {
    import spark.implicits._
    // Full heap on nodes 1..7, value = node*10. Subtree of 2 = {2,4,5},
    // of 3 = {3,6,7}, of 1 = all.
    val df = (1L to 7L).map(n => (n, n * 10L)).toDF("node", "v")
    val got = graft.ops.Graph.subtreeRollup(df, "node", "v")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((0L, 7L, 280L)))
    assert(got(2L) == ((1L, 3L, 110L)))
    assert(got(3L) == ((1L, 3L, 160L)))
    assert(got(4L) == ((2L, 1L, 40L)))
    assert(got(7L) == ((2L, 1L, 70L)))
    // emitBelow bounds the readout; node 0 (invalid heap id) is dropped.
    val withZero = (0L to 7L).map(n => (n, 1L)).toDF("node", "v")
    val small = graft.ops.Graph.subtreeRollup(withZero, "node", "v",
      emitBelow = 4L).collect()
    assert(small.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(small.find(_.getLong(0) == 1L).get.getLong(2) == 7L)
  }

  test("bipartiteCheck: even cycle passes, odd cycle fails with a " +
    "witness edge, a path is bipartite, depth exhaustion refuses") {
    // component A: square 0-1-2-3-0 (bipartite)
    // component B: triangle 10-11-12 (one odd edge)
    // component C: path 20-21-22 (bipartite)
    val edges = Seq(
      (0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L),
      (10L, 11L), (11L, 12L), (12L, 10L),
      (20L, 21L), (21L, 22L)).toDF("a", "b")
    val got = Graph.bipartiteCheck(edges, "a", "b", maxDepth = 4)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getBoolean(6))))
      .toMap
    assert(got.keySet == Set(0L, 10L, 20L))
    assert(got(0L) == ((4L, 2L, 2L, 0L, 0L, true)))
    assert(got(10L) == ((3L, 1L, 2L, 0L, 1L, false)))
    assert(got(20L) == ((3L, 2L, 1L, 0L, 0L, true)))

    // a 9-path from node 30 with maxDepth 3: tail nodes unreached ->
    // parity unknown -> the component must REFUSE certification
    val path = (30L until 39L).sliding(2)
      .map(p => (p(0), p(1))).toSeq.toDF("a", "b")
    val shallow = Graph.bipartiteCheck(path, "a", "b", maxDepth = 3)
      .collect().head
    assert(shallow.getLong(0) == 30L)
    assert(shallow.getLong(4) > 0L, "tail must be unreached at depth 3")
    assert(!shallow.getBoolean(6), "unknown parity must not certify")
  }

  test("boruvkaMst: hand-computed forest over two components, ties " +
    "broken by the (w, a, b) total order, duplicate edges collapse " +
    "to their min weight") {
    // component 1: square 1-2-3-4 with a heavy diagonal
    //   (1,2,w5) (2,3,w3) (3,4,w4) (1,4,w6) (1,3,w9)
    //   MST: 2-3(3), 3-4(4), 1-2(5)  [drops 1-4(6) and the diagonal]
    // component 2: triangle 10-11-12 with a WEIGHT TIE:
    //   (10,11,w7) (11,12,w7) (10,12,w8)
    //   total order keeps (10,11) over (11,12) at w7? both kept? a
    //   triangle MST keeps 2 of 3 edges: drops the max = (10,12,w8)
    // plus a duplicate (2,3) row at a WORSE weight that must collapse
    val edges = Seq(
      (1L, 2L, 5L), (2L, 3L, 3L), (3L, 4L, 4L), (1L, 4L, 6L),
      (1L, 3L, 9L), (3L, 2L, 11L),
      (10L, 11L, 7L), (11L, 12L, 7L), (10L, 12L, 8L)).toDF("a", "b", "w")
    val got = Graph.boruvkaMst(edges, "a", "b", "w")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == Set(
      (1L, 2L, 5L), (2L, 3L, 3L), (3L, 4L, 4L),
      (10L, 11L, 7L), (11L, 12L, 7L)))
  }

  test("doubleSweepDiameter: exact on a path (tree), a lower bound " +
    "that equals the true diameter on an even ring; ties break to the " +
    "smaller peripheral id") {
    // path 0-1-2-3-4: root 0, ecc(0)=4, u=4, diameter 4 (exact on trees)
    val path = (0L until 4L).map(i => (i, i + 1)).toDF("a", "b")
    val p = Graph.doubleSweepDiameter(path, "a", "b", maxDepth = 6)
      .collect().head
    assert(p.getLong(0) == 0L && p.getLong(1) == 4L &&
      p.getLong(2) == 4L && p.getLong(3) == 4L)
    // 6-ring 10..15: ecc(10)=3, antipode 13, diameter 3
    val ring = (0L until 6L).map(i => (10L + i, 10L + (i + 1) % 6))
      .toDF("a", "b")
    val r = Graph.doubleSweepDiameter(ring, "a", "b", maxDepth = 6)
      .collect().head
    assert(r.getLong(0) == 10L && r.getLong(1) == 3L &&
      r.getLong(2) == 13L && r.getLong(3) == 3L)
    // 5-ring 20..24: two antipodes (22, 23) tie at 2 hops -> 22 wins
    val odd = (0L until 5L).map(i => (20L + i, 20L + (i + 1) % 5))
      .toDF("a", "b")
    val o = Graph.doubleSweepDiameter(odd, "a", "b", maxDepth = 6)
      .collect().head
    assert(o.getLong(2) == 22L && o.getLong(3) == 2L)
  }

  test("boruvkaMst on a weighted ring equals ring-minus-max-edge, and " +
    "the forest always has n_nodes - n_components edges") {
    val n = 12L
    val ring = (0L until n)
      .map(i => (i, (i + 1) % n))
      .map { case (x, y) => (math.min(x, y), math.max(x, y)) }
      .map { case (x, y) => (x, y, 1L + (31L * x + 17L * y) % 97L) }
      .toDF("a", "b", "w")
    val got = Graph.boruvkaMst(ring, "a", "b", "w").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val all = ring.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val dropped = all.maxBy { case (a, b, w) => (w, a, b) }
    assert(got == all - dropped)
    assert(got.size == n.toInt - 1)
  }

  test("reciprocity counts mutual directed pairs exactly") {
    // mutual: (1,2),(2,1); one-way: (1,3),(3,4); self-loop dropped
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 4L), (5L, 5L))
      .toDF("a", "b")
    val r = Graph.reciprocity(e, "a", "b").collect().head
    assert(r.getAs[Long]("n_edges") == 4L)
    assert(r.getAs[Long]("n_reciprocal") == 2L)
    assert(r.getAs[Double]("reciprocity") == 0.5)
  }

  test("dagLayers assigns longest-path levels: diamond + long tail, " +
    "and a cycle fails loud") {
    // diamond 0->{1,2}->3 plus tail 3->4->5: layers 0,1,1,2,3,4
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L), (3L, 4L),
      (4L, 5L), (0L, 5L)) //     shortcut 0->5 must NOT shorten layer(5)
      .toDF("a", "b")
    val got = Graph.dagLayers(edges, "a", "b").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 2L,
      4L -> 3L, 5L -> 4L))
    val cyc = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      Graph.dagLayers(cyc, "a", "b", maxRounds = 6).collect()
    }
  }

  test("kTruss peels cascades: a triangle chain collapses while the " +
    "clique core survives with exact supports") {
    // K5 on 0..4 (every edge in 3 triangles) plus a pendant triangle
    // chain 4-5-6, 5-6-7: edge supports in the chain are 1, so a
    // 4-truss (support >= 2) peels the whole chain, including the
    // cascade onto (4,5)/(4,6) after (5,6) loses its second triangle.
    val k5 = for (a <- 0L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val chain = Seq((4L, 5L), (4L, 6L), (5L, 6L), (5L, 7L), (6L, 7L))
    val edges = (k5 ++ chain).toDF("a", "b")
    val got = Graph.kTruss(edges, "a", "b", k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.keySet == k5.toSet, s"only K5 survives, got ${got.keySet}")
    assert(got.values.forall(_ == 3L), "every K5 edge sits in 3 triangles")
    // k=5 on K5: support >= 3 everywhere -> survives whole
    assert(Graph.kTruss(edges, "a", "b", k = 5).count() == 10L)
    // k=6 needs support 4: nothing survives
    assert(Graph.kTruss(edges, "a", "b", k = 6).count() == 0L)
  }

  test("harmonicLandmarks on a path graph matches hand-computed " +
    "ring counts and fixed-order harmonic") {
    // path 0-1-2-3-4-5, seed 0: n1=1, n2=1, n3=1 -> 1 + 1/2 + 1/3
    val path = (0L until 5L).map(i => (i, i + 1))
    val edges = (path ++ path.map(_.swap)).toDF("a", "b")
    val seeds = Seq(0L, 2L).toDF("n")
    val got = Graph.harmonicLandmarks(edges, "a", "b", seeds, depth = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got(0L) == ((1L, 1L, 1L, (1.0 / 1.0 + 1.0 / 2.0) + 1.0 / 3.0)))
    // seed 2: dist1 = {1,3}, dist2 = {0,4}, dist3 = {5}
    assert(got(2L) == ((2L, 2L, 1L, (2.0 / 1.0 + 2.0 / 2.0) + 1.0 / 3.0)))
  }

  test("deterministicWalks replays the argmin-hash choice and stops " +
    "at sinks") {
    // directed: 0->1, 0->2, 1->3 (3 is a sink); walker from 0
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 3L)).toDF("a", "b")
    val seeds = Seq(0L).toDF("n")
    val got = Graph.deterministicWalks(edges, "a", "b", seeds, steps = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    // step-0 hash from node 0: h(v) = (7919*1 + 104729*0 + 130363*v) % p
    val p = 999983L
    def h(step: Long, u: Long, v: Long) =
      (7919L * (step + 1) + 104729L * u + 130363L * v) % p
    val first = Seq(1L, 2L).minBy(v => (h(0, 0, v), v))
    assert(got.head == ((0L, 0L)))
    assert(got(1) == ((1L, first)))
    if (first == 1L) {
      // 1 -> 3, then 3 is a sink: walk ends after step 2
      assert(got.toSeq == Seq((0L, 0L), (1L, 1L), (2L, 3L)))
    } else {
      // 2 is a sink: walk ends after step 1
      assert(got.toSeq == Seq((0L, 0L), (1L, 2L)))
    }
  }

  test("deterministicWalks on a complete digraph visits steps+1 nodes " +
    "per walker and every hop is an edge") {
    val nodes = 0L until 6L
    val edges = (for (a <- nodes; b <- nodes if a != b) yield (a, b))
      .toDF("a", "b")
    val seeds = Seq(0L, 3L).toDF("n")
    val rows = Graph.deterministicWalks(edges, "a", "b", seeds, steps = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 2 * 6) // 2 walkers x (5 steps + seed)
    for (w <- Seq(0L, 3L)) {
      val walk = rows.filter(_._1 == w).sortBy(_._2).map(_._3)
      assert(walk.head == w)
      walk.sliding(2).foreach { case Array(u, v) =>
        assert(u != v, s"self-hop $u in walker $w")
      }
    }
  }

  test("lubyMis: independence, maximality, and equality with the " +
      "sequential greedy-by-priority MIS on random graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 30 + trial * 10
      val edges = (for (_ <- 1 to n * 3) yield
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2).distinct
      val out = Graph.lubyMis(edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getAs[Long]("n") ->
          (r.getAs[Int]("in_mis"), r.getAs[Long]("round"))).toMap
      val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val nodes = edges.flatMap(p => Seq(p._1, p._2)).distinct
      assert(out.keySet == nodes.toSet, "every edge-incident node decided")
      assert(nodes.forall(v => out(v)._1 == 1 ||
        adj(v).exists(u => out(u)._1 == 1)),
        "maximality: every non-MIS node has a MIS neighbor")
      val mis = nodes.filter(v => out(v)._1 == 1).toSet
      assert(mis.forall(v => adj(v).intersect(mis).isEmpty),
        "independence: no two MIS nodes adjacent")
      // greedy by deterministic priority == derandomized Luby
      def prio(v: Long) =
        (((v * 2654435761L + 12345L) % 1000000007L) << 32) + v
      val greedy = scala.collection.mutable.Set.empty[Long]
      for (v <- nodes.sortBy(prio))
        if (adj(v).intersect(greedy.toSet).isEmpty) greedy += v
      assert(mis == greedy.toSet,
        s"trial $trial: Luby MIS differs from greedy-by-priority")
    }
  }

  test("richClub: K4 plus a pendant — hand-computed N_k/E_k/phi per " +
      "threshold; empty club gives the zero-denominator rational") {
    import spark.implicits._
    // K4 on {1,2,3,4} (all deg 3) + pendant edge (1,5): deg1=4, deg5=1
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L)).toDF("a", "b")
    val got = graft.ops.Graph.richClub(edges, "a", "b", maxK = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.size == 5)
    // k=1,2: club = {1,2,3,4}, all 6 K4 edges inside -> phi = 12/12
    assert(got(1L) == ((4L, 6L, 12L, 12L)))
    assert(got(2L) == ((4L, 6L, 12L, 12L)))
    // k=3: only node 1 (deg 4) qualifies -> no edges, den = 0
    assert(got(3L) == ((1L, 0L, 0L, 0L)))
    assert(got(4L) == ((0L, 0L, 0L, 0L)))
    assert(got(5L) == ((0L, 0L, 0L, 0L)))
  }
}
