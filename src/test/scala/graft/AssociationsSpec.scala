package graft

import graft.ops.Associations

/** Market-basket rules: exact counts, both rule directions, pruning. */
class AssociationsSpec extends SparkSpec {

  import spark.implicits._

  test("hand-checked rules: counts, support, confidence, lift, " +
    "direction asymmetry") {
    // baskets: {m,b}, {m,b}, {m}, {b,e}  (m=milk, b=bread, e=eggs)
    val rows = Seq((1L, "m"), (1L, "b"), (2L, "m"), (2L, "b"),
      (3L, "m"), (4L, "b"), (4L, "e"))
    val got = Associations.associationRules(
      rows.toDF("bk", "it"), "bk", "it", minPairCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6), r.getDouble(7)))).toMap
    // s(m)=3, s(b)=3, s(e)=1, s(m,b)=2, s(b,e)=1, n=4
    assert(got(("m", "b")) == ((2L, 3L, 3L, 0.5, 2.0 / 3.0, 8.0 / 9.0)))
    assert(got(("b", "m")) == ((2L, 3L, 3L, 0.5, 2.0 / 3.0, 8.0 / 9.0)))
    assert(got(("e", "b")) == ((1L, 1L, 3L, 0.25, 1.0, 4.0 / 3.0)))
    // confidence is direction-sensitive: b→e is 1/3, e→b is 1
    assert(got(("b", "e"))._5 == 1.0 / 3.0)
    assert(!got.contains(("m", "e")))
  }

  test("minPairCount prunes; duplicate basket lines don't inflate " +
    "counts; partitioning-invariant") {
    val rng = new scala.util.Random(83)
    val rows = Seq.fill(600)(
      (rng.nextInt(60).toLong, s"i${rng.nextInt(12)}"))
    val dup = rows ++ rows.take(100) // duplicates must collapse
    val run = (p: Int) =>
      Associations.associationRules(
        dup.toDF("bk", "it").repartition(p), "bk", "it", minPairCount = 4)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getDouble(7))).sortBy(t => (t._1, t._2)).toSeq
    val a = run(1)
    assert(a == run(13))
    assert(a.forall(_._3 >= 4))
    // brute-force the pair counts on the driver
    val baskets = dup.distinct.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).values.toSeq
    val expected = baskets.flatMap(s =>
      s.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 4).toMap
    val gotPairs = a.filter(t => t._1 < t._2)
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(gotPairs == expected)
  }
}
