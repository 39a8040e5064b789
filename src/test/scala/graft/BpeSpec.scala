package graft

import graft.ops.Bpe

/** BPE merge training: equals a driver-side reference implementation,
  * greedy non-overlapping fold semantics, deterministic ties. */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  /** Reference BPE on the word-frequency dict (Sennrich et al.). */
  private def model(
      texts: Seq[String], merges: Int): Seq[(Long, String, String, Long)] = {
    var dict = texts.flatMap(_.toLowerCase.split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) =>
        (w.map(_.toString).toVector, ws.size.toLong) }.toVector
    val out = Vector.newBuilder[(Long, String, String, Long)]
    for (r <- 1 to merges) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- dict; i <- 0 until syms.size - 1)
        pc((syms(i), syms(i + 1))) = pc.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (pc.nonEmpty) {
        val ((a, b), c) = pc.toSeq
          .sortBy { case ((x, y), n) => (-n, x, y) }.head
        out += ((r.toLong, a, b, c))
        dict = dict.map { case (syms, f) =>
          val nb = Vector.newBuilder[String]
          var acc = List.empty[String]
          syms.foreach { s =>
            if (acc.headOption.contains(a) && s == b) acc = (a + b) :: acc.tail
            else acc = s :: acc
          }
          (acc.reverse.toVector, f)
        }
      }
    }
    out.result()
  }

  private def learn(texts: Seq[String], merges: Int) =
    Bpe.learnMerges(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), "text", merges)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq

  test("matches the reference implementation, including merged-symbol pairs") {
    val texts = Seq.fill(5)("lower lower newest newest newest widest") ++
      Seq.fill(3)("low low new wide wider")
    assert(learn(texts, 8) == model(texts, 8))
  }

  test("greedy non-overlapping: 'aaaa' folds to [aa, aa], not [aa, a, a]") {
    // pair counting is positional (3 adjacent (a,a) in 'aaaa' — standard
    // BPE stats), but the MERGE is greedy non-overlapping: round 2 must
    // see exactly one (aa, aa) pair.
    val got = learn(Seq("aaaa"), 2)
    assert(got == Seq((1L, "a", "a", 3L), (2L, "aa", "aa", 1L)))
  }

  test("ties break by (a, b) ascending") {
    // "ab" and "cd" each appear twice: (a,b) must win over (c,d)
    val got = learn(Seq("ab ab cd cd"), 1)
    assert(got == Seq((1L, "a", "b", 2L)))
  }

  test("stops early when no adjacent pairs remain") {
    val got = learn(Seq("ab ab"), 5)
    assert(got.size == 1) // after merging (a,b) every word is one symbol
  }

  test("encodeTokenCounts: tokens-per-word under the learned merges") {
    // merge 1 = (a,b): 'ab'→1 token, 'cd'→2, 'abc'→2 ('ab'+'c')
    val df = Seq((1L, "ab ab cd"), (2L, "abc")).toDF("doc_id", "text")
    val got = Bpe.encodeTokenCounts(df, "doc_id", "text", merges = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == Map(1L -> ((3L, 4L)), 2L -> ((1L, 2L))))
  }
}
