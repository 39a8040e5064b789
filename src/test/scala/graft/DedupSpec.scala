package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame

import graft.ops.Dedup

/** Latest-wins dedup invariants. Mirrors the reference's dedup unit test
  * (quick_stream `src/upsert.rs:589-601`: 3 rows / 2 keys → the later
  * `modified_date` row survives per key) plus the property checks from
  * SURVEY.md §5: idempotent, input-order-insensitive, keeps max version.
  */
class DedupSpec extends SparkSpec {

  import spark.implicits._

  private def df(rows: Seq[(Long, Long, Long, String)]): DataFrame =
    rows.toDF("pkey", "modified_date_us", "event_id", "payload")

  test("reference fixture: keeps the later modified_date per key") {
    // quick_stream src/upsert.rs:589-601 shape: keys {1,2}, key 1 twice.
    val in = df(Seq(
      (1L, 100L, 1L, "old"),
      (2L, 150L, 2L, "only"),
      (1L, 200L, 3L, "new")))
    val out = Dedup.latestWins(in, Seq("pkey"), "modified_date_us", Seq("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(3))).toSet
    assert(out == Set((1L, "new"), (2L, "only")))
  }

  test("equal version: tie-break column decides deterministically") {
    val in = df(Seq(
      (1L, 100L, 7L, "high-tie"),
      (1L, 100L, 3L, "low-tie")))
    val out = Dedup.latestWins(in, Seq("pkey"), "modified_date_us", Seq("event_id"))
    assert(out.collect().map(_.getString(3)).toSeq == Seq("high-tie"))
  }

  test("agg form and window form agree on random data") {
    val rnd = new Random(42)
    val rows = Seq.fill(500)(
      (rnd.nextInt(40).toLong, rnd.nextInt(50).toLong, rnd.nextInt(100000).toLong, rnd.nextInt(5).toString))
      // unique tie-break per (key, version) so both forms are deterministic
      .groupBy(r => (r._1, r._2, r._3)).map(_._2.head).toSeq
    val in = df(rows)
    assertSameRows(
      Dedup.latestWins(in, Seq("pkey"), "modified_date_us", Seq("event_id")),
      Dedup.latestWinsWindow(in, Seq("pkey"), "modified_date_us", Seq("event_id")))
  }

  test("idempotent: dedup(dedup(x)) == dedup(x)") {
    val rnd = new Random(7)
    val in = df(Seq.fill(300)(
      (rnd.nextInt(20).toLong, rnd.nextInt(30).toLong, rnd.nextLong(), "p")))
    val once = Dedup.latestWins(in, Seq("pkey"), "modified_date_us", Seq("event_id"))
    val twice = Dedup.latestWins(once, Seq("pkey"), "modified_date_us", Seq("event_id"))
    assertSameRows(once, twice)
  }

  test("input-order-insensitive") {
    val rnd = new Random(11)
    val rows = Seq.fill(200)(
      (rnd.nextInt(15).toLong, rnd.nextInt(25).toLong, rnd.nextLong(), "p"))
    val a = Dedup.latestWins(df(rows), Seq("pkey"), "modified_date_us", Seq("event_id"))
    val b = Dedup.latestWins(df(rnd.shuffle(rows)), Seq("pkey"), "modified_date_us", Seq("event_id"))
    assertSameRows(a, b)
  }

  test("sortedNeighborhoodPairs: window bounds pairs, Jaccard filters") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaa common prefix text one two three"),
      (2L, "aaa common prefix text one two four"),
      (3L, "aaa common prefix text one two three"), // dup of 1
      (9L, "mmm unrelated middle document here now"),
      (4L, "zzz totally different content words entirely")).toDF("doc_id", "text")
    val got = graft.ops.NearDup.sortedNeighborhoodPairs(
        docs, "doc_id", "text", w = 3, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // sort order: 1,2,3 (prefix aaa), 9, 4 — window 3 pairs each doc
    // with the 2 following; only the aaa-cluster pairs survive J >= 0.5
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("lshProbeIndex: shard-vs-index candidates equal the cross-side " +
    "subset of the self-join; re-delivered ids don't self-report") {
    val mk = (i: Long, txt: String) => (i, txt)
    val near = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      mk(1L, near), mk(2L, near + " iota"), //   near-dups across the split
      mk(10L, near + " kappa"), //               shard member, near both
      mk(3L, "completely different words here entirely unrelated")
    ).toDF("doc_id", "text")
    val index = graft.ops.NearDup.lshBandIndex(
      docs.filter("doc_id < 10"), "doc_id", "text")
    val probed = graft.ops.NearDup.lshProbeIndex(
      docs.filter("doc_id >= 10"), "doc_id", "text", index)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val self = graft.ops.NearDup.lshCandidatePairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every probed pair is a self-join pair crossing the split
    assert(probed.nonEmpty)
    assert(probed.forall { case (n, i) => i < 10 && n >= 10 &&
      self.contains((math.min(n, i), math.max(n, i))) })
    // the cross-split self-join pairs are exactly the probed ones
    val cross = self.filter { case (a, b) => (a < 10) != (b < 10) }
      .map { case (a, b) => if (a >= 10) (a, b) else (b, a) }
    assert(probed == cross)
    // re-delivery: probing a doc already in the index must not self-pair
    val redelivered = graft.ops.NearDup.lshProbeIndex(
      docs.filter("doc_id = 1"), "doc_id", "text", index)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!redelivered.contains((1L, 1L)))
  }

  test("containmentVerify: a quoted subset scores ~1 containment " +
    "where Jaccard stays low") {
    val small = (1 to 12).map(i => s"tok$i").mkString(" ")
    val big = small + " " + (13 to 120).map(i => s"pad$i").mkString(" ")
    val other = (200 to 260).map(i => s"z$i").mkString(" ")
    val docs = Seq((1L, small), (2L, big), (3L, other)).toDF("doc_id", "text")
    val cont = graft.ops.NearDup.containmentVerify(
      docs, "doc_id", "text", m = 8, n = 3, r = 2, minContainment = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val jac = graft.ops.NearDup.ngramJaccardVerify(
      docs, "doc_id", "text", m = 8, n = 3, r = 2, minJaccard = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // the (1,2) pair: every bigram of doc 1 is in doc 2 except across
    // the splice point → containment near 1, Jaccard near |A|/|B|
    assert(cont.contains((1L, 2L)), s"candidates: ${cont.keySet}")
    assert(cont((1L, 2L)) >= 0.9)
    assert(jac.get((1L, 2L)).forall(_ < 0.2))
    assert(!cont.contains((1L, 3L)) && !cont.contains((2L, 3L)))
  }

  test("sortedNeighborhoodPairs: w=2 pairs only adjacent ranks") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaa same text here"), (2L, "aaa same text here"),
      (3L, "aaa same text here")).toDF("doc_id", "text")
    val got = graft.ops.NearDup.sortedNeighborhoodPairs(
        docs, "doc_id", "text", w = 2, minJaccard = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (1,3) is distance 2 — outside a w=2 window
    assert(got == Set((1L, 2L), (2L, 3L)))
  }

  test("keeps exactly one row per key, and it is the max ordering tuple") {
    val rnd = new Random(3)
    val rows = Seq.fill(400)(
      (rnd.nextInt(25).toLong, rnd.nextInt(40).toLong, rnd.nextLong(), "p"))
    val out = Dedup.latestWins(df(rows), Seq("pkey"), "modified_date_us", Seq("event_id"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val expect = rows.groupBy(_._1).map { case (k, g) =>
      k -> g.map(r => (r._2, r._3)).max
    }
    assert(out == expect)
  }

  test("blockingStats: comparison count and reduction vs all-pairs") {
    import spark.implicits._
    // two exact-duplicate trios → every band agrees inside each trio
    val txt = "alpha beta gamma delta epsilon zeta"
    val docs = ((1L to 3L).map(i => (i, txt)) ++
      (4L to 6L).map(i => (i, txt + " extra tail words here")))
      .toDF("doc_id", "text")
    val r = graft.ops.NearDup.blockingStats(docs, "doc_id", "text")
      .collect().head
    val sumPairs = r.getLong(2)
    // identical docs share all 4 bands: each trio contributes ≥ 4·3
    // comparisons; all-pairs baseline is 15
    assert(sumPairs >= 24L)
    assert(r.getLong(4) == 6L)
    assert(!r.isNullAt(5))
    // consistency: n_assignments = Σ block sizes ≥ n_blocks
    assert(r.getLong(1) >= r.getLong(0))
  }

  test("survivorship: fields compose from DIFFERENT cluster members") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // Cluster c1: id 5 is earliest, id 9 is longest, langs {en, de}.
    val df = Seq(
      ("c1", 9L, 500L, "en"), ("c1", 5L, 100L, "de"), ("c1", 7L, 300L, "en"),
      ("c2", 2L, 50L, "fr"))
      .toDF("curl", "doc_id", "n_chars", "lang")
    val got = graft.ops.Dedup.survivorship(df, "curl", "doc_id",
      "n_chars", "lang").collect().map(r => r.getString(0) -> r).toMap
    val c1 = got("c1")
    assert(c1.getLong(1) == 9L && c1.getLong(2) == 500L) // longest wins id
    assert(c1.getLong(3) == 5L)                          // earliest is provenance
    assert(c1.getLong(4) == 3L && c1.getLong(5) == 900L)
    assert(c1.getString(6) == "de,en")                   // sorted tag union
    val c2 = got("c2")
    assert(c2.getLong(1) == 2L && c2.getString(6) == "fr")
    // Length tie resolves to the SMALLEST id, deterministically.
    val tied = Seq(("c", 4L, 10L, "en"), ("c", 2L, 10L, "en"))
      .toDF("curl", "doc_id", "n_chars", "lang")
    assert(graft.ops.Dedup.survivorship(tied, "curl", "doc_id",
      "n_chars", "lang").filter(col("curl") === "c")
      .collect().head.getLong(1) == 2L)
  }

  test("fellegiSunter: additive field weights, decisions, score gate") {
    import spark.implicits._
    // Same block; ids 1/2 agree on everything (identical title, same
    // source, same length) → all three weights positive → match. Ids
    // 3/4 share only the title neighborhood sort position but disagree
    // on every field → negative score → filtered out.
    val rows = Seq(
      (1L, "b", "alpha document xx", "web", 100L),
      (2L, "b", "alpha document xx", "web", 104L),
      (3L, "b", "miss aaaaaaaaaaaa", "web", 100L),
      (4L, "b", "zzzz zzzzzzzzzzzz", "api", 900L))
      .toDF("id", "blk", "title", "src", "len")
    val got = graft.ops.Dedup.fellegiSunter(
      rows, "id", "blk", "title", "src", "len")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    val m = got((1L, 2L))
    assert(m.getLong(2) == 1L && m.getLong(3) == 1L && m.getLong(4) == 1L)
    // Score replay: sum of the three agreement weights.
    val w = Seq((0.9, 0.25), (0.85, 0.1), (0.95, 0.02)).map { case (mm, u) =>
      math.log(mm / u) / math.log(2.0) }
    assert(m.getDouble(5) == 0.0 + w(0) + w(1) + w(2))
    assert(m.getString(6) == "match")
    // The all-disagree neighbor pair never clears score >= 0.
    assert(!got.contains((3L, 4L)))
    // Source+length agreement alone (title differs) lands in
    // "possible": positive but under the cutoff.
    val p = got.get((2L, 3L)).orElse(got.get((3L, 2L)))
    p.foreach { r =>
      assert(r.getString(6) == "possible" || r.getString(6) == "match")
    }
  }

  test("cdcChunks: the content-defined property — a prefix insertion " +
      "shifts only the chunks it touches; shared suffix content keeps " +
      "identical chunk hashes (byte-offset chunking would lose ALL)") {
    import spark.implicits._
    val rnd = new Random(17)
    val body = Seq.fill(600)(('a' + rnd.nextInt(26)).toChar).mkString
    val docs = Seq(
      (1L, body),
      (2L, "INSERTED PREFIX >> " + body)) //  same content, shifted bytes
      .toDF("doc_id", "text")
    val chunks = graft.ops.NearDup
      .cdcChunks(docs, "doc_id", "text")
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getString(4)).toSet).toMap
    val shared = chunks(1L) intersect chunks(2L)
    assert(shared.size >= chunks(1L).size - 2,
      s"CDC must preserve suffix chunks: shared ${shared.size} of " +
        s"${chunks(1L).size}")
    assert(chunks(2L).size >= chunks(1L).size,
      "the shifted doc gains at most prefix chunks, never loses suffix ones")
    // chunk framing is exact: starts/lengths tile the doc
    val rows = graft.ops.NearDup.cdcChunks(docs, "doc_id", "text")
      .where($"id" === 1L).orderBy("chunk_idx").collect()
    assert(rows.head.getLong(2) == 0L)
    assert(rows.map(_.getLong(3)).sum == body.length)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(2) == a.getLong(2) + a.getLong(3), "gapless tiling")
      case _ => ()
    }
  }

  test("cdcChunks window > 32 with a non-power-of-two divisor: chunk " +
      "boundaries follow the EXACT documented mod-2^32 formula " +
      "(independent BigInt replay) — no Long-overflow divergence") {
    import spark.implicits._
    val rnd = new Random(23)
    val body = Seq.fill(900)(('a' + rnd.nextInt(26)).toChar).mkString
    val docs = Seq((1L, body)).toDF("doc_id", "text")
    val window = 40
    val divisor = 48L // NOT a power of two: high bits of H matter
    val rows = graft.ops.NearDup
      .cdcChunks(docs, "doc_id", "text", window, divisor)
      .orderBy("chunk_idx").collect()
    val b = body.getBytes("UTF-8")
    val mod = BigInt(1) << 32
    def gear(x: Int): BigInt = BigInt((2654435761L * (x + 1)) % 4294967296L)
    val cuts = (window - 1 until b.length).filter { i =>
      val h = (0 until window)
        .map(k => gear(b(i - k) & 0xff) * (BigInt(1) << k)).sum.mod(mod)
      h % divisor == 0
    }.map(_ + 1)
    val expectedStarts = (0 +: cuts.filter(_ < b.length)).map(_.toLong)
    assert(rows.map(_.getLong(2)).toSeq == expectedStarts,
      "kernel boundaries must equal the BigInt formula replay")
    assert(rows.map(_.getLong(3)).sum == b.length)
  }
}
