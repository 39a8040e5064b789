package graft

import org.apache.spark.sql.functions._

import graft.ops.Sketches

/** HyperLogLog sketch: register construction, mergeability (elementwise
  * max == direct build on the union), estimator accuracy, and the
  * partitioning-invariance the oracle gate depends on. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = {
    // 3 groups with known distinct-token universes: X ~ 2000 distinct,
    // Y ~ 500, Z tiny; duplication both within and across rows.
    val x = (0 until 2000).grouped(50)
      .map(ws => ("X", "s1", ws.map(i => s"tok$i").mkString(" "))).toSeq
    val y = (0 until 500).grouped(25)
      .map(ws => ("Y", "s1", ws.map(i => s"w$i").mkString(" "))).toSeq ++
      (0 until 500).grouped(25)
        .map(ws => ("Y", "s2", ws.map(i => s"w$i").mkString(" "))).toSeq
    val z = Seq(("Z", "s1", "a b c a b c"), ("Z", "s2", "c d"))
    (x ++ y ++ z).toDF("g", "src", "text")
  }

  test("hll registers: ranks bounded, zero only for untouched registers") {
    val regs = Sketches.hllSketchTokens(corpus, Seq("g"), "text")
      .select(col("g"), col("registers")).as[(String, Seq[Int])]
      .collect().toMap
    val w = Sketches.hllW(64)
    assert(w == 24)
    regs.values.foreach { rs =>
      assert(rs.length == 64)
      assert(rs.forall(r => r >= 0 && r <= w + 1))
    }
    // Z has 4 distinct tokens → at most 4 registers touched
    assert(regs("Z").count(_ > 0) <= 4)
    // X has 2000 distinct tokens → every register should be touched
    assert(regs("X").count(_ == 0) == 0)
  }

  test("hllMerge of fine groups == direct build on the coarse group") {
    val fine = Sketches.hllSketchTokens(corpus, Seq("g", "src"), "text")
    val merged = Sketches.hllMerge(fine, Seq("g"))
    val direct = Sketches.hllSketchTokens(corpus, Seq("g"), "text")
    assertSameRows(merged, direct)
  }

  test("hll estimate within the ~1.04/sqrt(m) error envelope") {
    val est = Sketches.hllEstimate(
      Sketches.hllSketchTokens(corpus, Seq("g"), "text"))
      .select(col("g"), col("est_distinct")).as[(String, Double)]
      .collect().toMap
    // m=64 → ~13% stddev; assert 3 sigma
    assert(math.abs(est("X") - 2000.0) / 2000.0 < 0.4)
    assert(math.abs(est("Y") - 500.0) / 500.0 < 0.4)
  }

  test("registers and estimate are partitioning-invariant") {
    val a = Sketches.hllEstimate(
      Sketches.hllSketchTokens(corpus.repartition(1), Seq("g"), "text"))
    val b = Sketches.hllEstimate(
      Sketches.hllSketchTokens(corpus.repartition(7), Seq("g"), "text"))
    assertSameRows(a, b)
  }

  test("duplicates never change the sketch (max is idempotent)") {
    val doubled = corpus.unionAll(corpus)
    assertSameRows(
      Sketches.hllSketchTokens(doubled, Seq("g"), "text"),
      Sketches.hllSketchTokens(corpus, Seq("g"), "text"))
  }

  test("bloom: zero false negatives; planted misses stay misses") {
    val sk = Sketches.bloomSketchTokens(corpus, Seq("g"), "text",
      mBits = 1 << 20)
    // every token that entered group Y must probe true there
    val present = (0 until 500 by 50).map(i => s"w$i")
    val absent = Seq("nope1", "nope2", "tok5")  // tok5 is X-only
    val probes = (present ++ absent).toDF("word")
    val got = Sketches.bloomContains(sk, Seq("g"), probes, "word",
        mBits = 1 << 20)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(2))
      .toMap
    present.foreach(w => assert(got(("Y", w)), s"false negative on $w"))
    // at 2^20 bits / ~500 tokens the planted misses must stay false
    absent.foreach(w => assert(!got(("Y", w)), s"unexpected hit on $w"))
    assert(got(("X", "tok5")))
  }

  test("bloomMerge of fine groups == direct build on the coarse group") {
    val fine = Sketches.bloomSketchTokens(corpus, Seq("g", "src"), "text")
    assertSameRows(
      Sketches.bloomMerge(fine, Seq("g")),
      Sketches.bloomSketchTokens(corpus, Seq("g"), "text"))
  }

  test("cms: never undercounts; exact when cells don't collide") {
    // tiny vocab vs width 1024 → collisions essentially impossible, so
    // the estimate equals the true occurrence count
    val docs = Seq(
      ("G", "s", "alpha beta alpha"), ("G", "s", "alpha gamma"),
      ("H", "s", "beta")).toDF("g", "src", "text")
    val sk = Sketches.cmsSketchTokens(docs, Seq("g"), "text")
    val probes = Seq("alpha", "beta", "gamma", "absent").toDF("word")
    val got = Sketches.cmsEstimate(sk, Seq("g"), probes, "word")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got(("G", "alpha")) == 3L)
    assert(got(("G", "beta")) == 1L)
    assert(got(("G", "gamma")) == 1L)
    assert(got(("G", "absent")) == 0L)
    assert(got(("H", "beta")) == 1L && got(("H", "alpha")) == 0L)
  }

  test("cmsMerge of fine groups == direct build on the coarse group") {
    val fine = Sketches.cmsSketchTokens(corpus, Seq("g", "src"), "text")
    assertSameRows(
      Sketches.cmsMerge(fine, Seq("g")),
      Sketches.cmsSketchTokens(corpus, Seq("g"), "text"))
  }

  test("cms counts are partitioning-invariant") {
    assertSameRows(
      Sketches.cmsSketchTokens(corpus.repartition(1), Seq("g"), "text"),
      Sketches.cmsSketchTokens(corpus.repartition(8), Seq("g"), "text"))
  }

  test("merges fail loud on a width mismatch instead of truncating") {
    val sk = Sketches.hllSketchTokens(corpus, Seq("g"), "text", m = 256)
    val e = intercept[Exception] {
      Sketches.hllMerge(sk, Seq("g"), m = 64).collect() // wrong m
    }
    assert(e.getMessage.contains("hllMerge") ||
      e.getCause != null && e.getCause.getMessage.contains("hllMerge"))
    val bl = Sketches.bloomSketchTokens(corpus, Seq("g"), "text",
      mBits = 128)
    val e2 = intercept[Exception] {
      Sketches.bloomMerge(bl, Seq("g"), mBits = 65536).collect()
    }
    assert(e2.getMessage.contains("bloomMerge") ||
      e2.getCause != null && e2.getCause.getMessage.contains("bloomMerge"))
  }

  test("bloom bitmap is partitioning-invariant; popcount sane") {
    val a = Sketches.bloomSketchTokens(corpus.repartition(1), Seq("g"), "text")
    val b = Sketches.bloomSketchTokens(corpus.repartition(9), Seq("g"), "text")
    assertSameRows(a, b)
    val pops = Sketches.bloomBitsSet(a)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // Z has 4 distinct tokens × 3 hashes = at most 12 set bits
    assert(pops("Z") > 0 && pops("Z") <= 12)
    // X: 2000 distinct tokens × 3 hashes, minus collisions
    assert(pops("X") > 4000 && pops("X") <= 6000)
  }

  test("quantile sketch: estimates within the bucket-width bound of " +
    "exact percentiles; shard merge equals direct build") {
    val rnd = new scala.util.Random(11)
    val vals = Seq.fill(5000)(math.exp(rnd.nextGaussian() * 2.0 + 5.0))
    val df = vals.zipWithIndex
      .map { case (v, i) => (i.toLong, if (i % 2 == 0) "a" else "b", v) }
      .toDF("id", "g", "x")
    val sk = Sketches.quantileSketch(df, Seq("g"), "x")
    val est = Sketches.quantileFromSketch(sk, Seq("g"), Seq(50, 90, 99))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(3))
      .toMap
    for (g <- Seq("a", "b"); p <- Seq(50, 90, 99)) {
      val gv = vals.zipWithIndex
        .filter { case (_, i) => (if (i % 2 == 0) "a" else "b") == g }
        .map(_._1).sorted
      val exact = gv(math.ceil(p / 100.0 * gv.size).toInt - 1)
      // bucket relative width ≤ 1/100 → midpoint within ~0.5% + 1 bucket
      assert(math.abs(est((g, p)) - exact) / exact <= 0.02,
        s"($g, $p): est ${est((g, p))} vs exact $exact")
    }
    // shard merge: bucket counts are additive → EXACTLY the direct build
    val h1 = Sketches.quantileSketch(df.filter(col("id") % 3 === 0), Seq("g"), "x")
    val h2 = Sketches.quantileSketch(df.filter(col("id") % 3 =!= 0), Seq("g"), "x")
    assertSameRows(
      Sketches.quantileSketchMerge(h1.unionByName(h2), Seq("g")), sk)
  }

  test("windowed quantile sketch groups by event-time day and matches " +
    "the batch sketch per window") {
    val day = 86400000000L
    val df = (0 until 200).map { i =>
      (new java.sql.Timestamp((i % 3) * 86400000L + 1000L * i),
        if (i % 2 == 0) "a" else "b", (i + 1).toDouble)
    }.toDF("ts_t", "g", "x")
    val win = Sketches.quantileSketchWindowed(
      df, "ts_t", Seq("g"), "x", "1 day", "48 hours")
    val direct = Sketches.quantileSketch(
      df.withColumn("window_start_us",
        expr(s"(unix_micros(ts_t) div $day) * $day")),
      Seq("window_start_us", "g"), "x")
    assertSameRows(win, direct)
  }

  test("windowed HLL register rows assemble to the batch registers and " +
    "survive a duplicate-insensitive split") {
    val df = (0 until 300).map { i =>
      (new java.sql.Timestamp((i % 2) * 86400000L), "g", (i % 97).toLong)
    }.toDF("ts_t", "g", "uid")
    val win = Sketches.hllSketchIdsWindowed(
      df, "ts_t", Seq("g"), "uid", "1 day", "48 hours")
    // duplicate ids (i % 97 repeats) must not change any register:
    // re-streaming the same data and max-merging is a no-op
    val doubled = Sketches.hllSketchIdsWindowed(
      df.unionByName(df), "ts_t", Seq("g"), "uid", "1 day", "48 hours")
    assertSameRows(win, doubled)
    val est = Sketches.hllEstimate(
      Sketches.hllFromRegisterRows(win, Seq("window_start_us", "g")))
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    // 97 distinct ids per day; HLL at m=64 is within ~2x here
    est.values.foreach(e => assert(e > 40 && e < 250, s"est $e"))
    assert(est.size == 2)
  }

  test("windowed CMS cell rows assemble to exact probe counts when " +
    "collision-free; doubling the stream doubles every count") {
    val df = (0 until 240).map { i =>
      (new java.sql.Timestamp((i % 2) * 86400000L), "g", (i % 6 + 1).toLong)
    }.toDF("ts_t", "g", "uid") // uids 1..6, 20 events each per day
    val win = Sketches.cmsSketchIdsWindowed(
      df, "ts_t", Seq("g"), "uid", "1 day", "48 hours")
    val est = Sketches.cmsEstimateIds(
      Sketches.cmsFromCellRows(win, Seq("window_start_us", "g")),
      Seq("window_start_us", "g"), (1L to 8L))
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    // CMS estimates are upper bounds, exact absent collisions: 6 ids in
    // 3×1024 cells collide with nothing here. Even i lands on day 0
    // with odd uid (i%6+1 ∈ {1,3,5}), odd i on day 1 with even uid —
    // each present (day, uid) sees exactly 40 events.
    val day = 86400000000L
    est.foreach { case ((w, u), c) =>
      val present = u <= 6 && (u % 2 == 1) == (w == 0L)
      assert(c == (if (present) 40L else 0L), s"($w, $u) -> $c")
    }
    assert(est.keySet.map(_._1) == Set(0L, day))
    val doubled = Sketches.cmsEstimateIds(
      Sketches.cmsFromCellRows(
        Sketches.cmsSketchIdsWindowed(
          df.unionByName(df), "ts_t", Seq("g"), "uid", "1 day", "48 hours"),
        Seq("window_start_us", "g")),
      Seq("window_start_us", "g"), (1L to 6L))
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    doubled.foreach { case (k, v) => assert(v == 2 * est(k)) }
  }

  test("windowed Bloom: no false negatives per window, duplicate " +
    "arrivals are a bitwise no-op, absent ids mostly reject") {
    val df = (0 until 300).map { i =>
      // day 0 sees uids 0..49, day 1 sees uids 50..99
      (new java.sql.Timestamp((i % 2) * 86400000L), "g",
        ((i % 2) * 50 + (i / 2 % 50)).toLong)
    }.toDF("ts_t", "g", "uid")
    val win = Sketches.bloomSketchIdsWindowed(
      df, "ts_t", Seq("g"), "uid", "1 day", "48 hours")
    // OR is idempotent: re-streaming the same data changes no word
    val doubled = Sketches.bloomSketchIdsWindowed(
      df.unionByName(df), "ts_t", Seq("g"), "uid", "1 day", "48 hours")
    assertSameRows(win.drop("bn"), doubled.drop("bn"))
    val got = Sketches.bloomContainsIds(
      Sketches.bloomFromWordRows(win, Seq("window_start_us", "g")),
      Seq("window_start_us", "g"), (0L until 100L) ++ (5000L until 5100L))
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getBoolean(3))
      .toMap
    val day = 86400000000L
    // present ids: NEVER a false negative
    for (u <- 0L until 50L) assert(got((0L, u)), s"fn day0 uid $u")
    for (u <- 50L until 100L) assert(got((day, u)), s"fn day1 uid $u")
    // far-away ids: overwhelmingly rejected (50 ids × k=3 in 4096 bits
    // → fp rate ~0.1%; allow a little slack)
    val fps = (5000L until 5100L).flatMap(u =>
      Seq(got((0L, u)), got((day, u)))).count(identity)
    assert(fps <= 4, s"implausible false-positive count $fps")
  }

  test("quantile sketch: sub-1 values go to the underflow bucket and " +
    "still count toward ranks") {
    val df = (Seq.fill(50)(0.25) ++ Seq.fill(50)(123.0)).zipWithIndex
      .map { case (v, i) => (i.toLong, "g", v) }.toDF("id", "g", "x")
    val est = Sketches.quantileFromSketch(
      Sketches.quantileSketch(df, Seq("g"), "x"), Seq("g"), Seq(25, 75))
      .collect().map(r => r.getInt(1) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(est(25) == ((100L, 0.5))) //   underflow bucket midpoint
    assert(est(75)._2 > 122 && est(75)._2 < 124)
  }

  test("bloomPrefilterJoinStats: zero false negatives, exact accounting") {
    import spark.implicits._
    val dim = (1L to 20L).map(k => (k, "d")).toDF("k", "pad")
    val fact = (1L to 400L).map(i => (i % 100L + 1L, i)).toDF("fk", "row")
    val r = Sketches.bloomPrefilterJoinStats(fact, "fk", dim, "k",
      mBits = 64, kHashes = 3).collect().head
    val (nFact, nPass, nMatch, nFp, nFn) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nFact == 400L)
    assert(nFn == 0L)                      // blooms never miss a member
    assert(nMatch == 80L)                  // keys 1..20, 4 rows each
    assert(nPass == nMatch + nFp)          // pass partitions exactly
    assert(nFp >= 0L && nFp <= nFact - nMatch)
    if (nFact - nMatch > 0)
      assert(r.getDouble(5) == nFp.toDouble / (nFact - nMatch).toDouble)
  }
}
