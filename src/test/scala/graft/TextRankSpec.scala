package graft

import graft.ops.TextRank

/** BM25 ranking semantics: term frequency saturates, rare terms weigh
  * more, longer docs are normalized down, ties break by id, k caps. */
class TextRankSpec extends SparkSpec {

  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private def rank(df: org.apache.spark.sql.DataFrame,
      terms: Seq[String], k: Int = 10): Seq[(Long, Double)] =
    TextRank.bm25TopK(df, "doc_id", "text", terms, k)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("doc with more query-term hits ranks first; non-matching docs absent") {
    val d = docs(
      1L -> "cat cat cat dog",
      2L -> "cat fish fish fish",
      3L -> "bird bird bird bird")
    val got = rank(d, Seq("cat"))
    assert(got.map(_._1) == Seq(1L, 2L)) // doc 3 has no hits → absent
    assert(got.forall(_._2 > 0.0))
  }

  test("rarer term carries higher idf at equal tf and length") {
    val d = docs(
      1L -> "common rare pad1 pad2",
      2L -> "common word pad1 pad2",
      3L -> "common term pad1 pad2")
    // 'rare' appears in 1 doc, 'common' in 3 — same tf=1, same dl.
    val byRare = rank(d, Seq("rare")).head._2
    val byCommon = rank(d, Seq("common")).head._2
    assert(byRare > byCommon)
  }

  test("length normalization: same tf in a shorter doc scores higher") {
    val d = docs(
      1L -> "hit filler",
      2L -> "hit filler filler filler filler filler filler filler")
    val got = rank(d, Seq("hit"))
    assert(got.map(_._1) == Seq(1L, 2L))
  }

  test("identical docs tie and break by ascending id; k caps the output") {
    val d = docs(
      5L -> "same text here",
      3L -> "same text here",
      9L -> "same text here",
      1L -> "other words entirely")
    val got = rank(d, Seq("same"), k = 2)
    assert(got.map(_._1) == Seq(3L, 5L))
    assert(got(0)._2 == got(1)._2)
  }

  test("multi-term scores sum per-term contributions in fixed order") {
    val d = docs(
      1L -> "alpha beta",
      2L -> "alpha alpha",
      3L -> "beta beta")
    val both = rank(d, Seq("alpha", "beta")).toMap
    val a = rank(d, Seq("alpha")).toMap
    val b = rank(d, Seq("beta")).toMap
    // doc 1 matches both terms; its combined score is the sum of the
    // single-term scores (same df/dl/avgdl in this fixed corpus).
    assert(math.abs(both(1L) - (a(1L) + b(1L))) < 1e-6)
  }

  test("duplicate or empty query terms fail loud") {
    val d = docs(1L -> "x")
    intercept[IllegalArgumentException] {
      TextRank.bm25TopK(d, "doc_id", "text", Seq("a", "A"), 5)
    }
    intercept[IllegalArgumentException] {
      TextRank.bm25TopK(d, "doc_id", "text", Nil, 5)
    }
  }

  /** Driver-side lift model with the engine's exact float shape. */
  private def liftModel(
      texts: Seq[String], minPair: Long): Map[(String, String), Double] = {
    val toks = texts.map(_.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq)
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong)
    val pairs = toks.flatMap(t => t.zip(t.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong)
    val n1 = toks.map(_.size.toLong).sum
    val nb = toks.map(t => math.max(t.size - 1, 0).toLong).sum
    pairs.filter(_._2 >= minPair).map { case ((x, y), c) =>
      (x, y) -> (c.toDouble * n1.toDouble * n1.toDouble) /
        (nb.toDouble * uni(x).toDouble * uni(y).toDouble)
    }.toMap
  }

  test("topCollocations: lift ranks the glued pair first, exact scores") {
    val texts =
      Seq.fill(6)("new york is big and busy") ++
        Seq.fill(6)("the cat and the dog and the bird") ++
        Seq.fill(3)("york new nothing here")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = TextRank.topCollocations(df, "text", k = 30, minPairCount = 5)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3))))
    val want = liftModel(texts, 5)
    assert(got.nonEmpty)
    got.foreach { case (pq, (_, score)) =>
      assert(want.contains(pq), s"unexpected pair $pq")
      assert(score == want(pq), s"$pq: $score != ${want(pq)}")
    }
    // "new york" (6 pairs, both words rare) must outrank "and the"
    val scores = got.toMap
    assert(scores(("new", "york"))._2 > scores(("and", "the"))._2)
    // ranked by descending score in the returned order
    val ss = got.map(_._2._2)
    assert(ss.sameElements(ss.sortBy(-(_: Double))))
  }

  test("topCollocations: minPairCount filters rare pairs") {
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, "c d")).toDF("doc_id", "text")
    val got = TextRank.topCollocations(df, "text", k = 10, minPairCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "b")))
  }

  test("rrfFuse: overlap sums both lists, singles keep one term, " +
    "exact reciprocal arithmetic") {
    val a = Seq((10L, 1L), (20L, 2L)).toDF("id", "rank")
    val b = Seq((20L, 1L), (30L, 2L)).toDF("id", "rank")
    val got = TextRank.rrfFuse(Seq(a, b), "id", "rank", kRrf = 60)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got(10L) == ((Some(1L), None, 1L, 1.0 / 61.0)))
    assert(got(20L) == ((Some(2L), Some(1L), 2L, 1.0 / 62.0 + 1.0 / 61.0)))
    assert(got(30L) == ((None, Some(2L), 1L, 1.0 / 62.0)))
    intercept[IllegalArgumentException] {
      TextRank.rrfFuse(Seq(a), "id", "rank")
    }
  }
}
