package graft

import org.apache.spark.sql.functions._

import graft.ops.Sampling

/** Deterministic hash splits: reproducible, partition-independent, and
  * close to the requested proportions on a uniform id range. */
class SamplingSpec extends SparkSpec {

  import spark.implicits._

  test("split weights must sum to 100") {
    intercept[IllegalArgumentException] {
      Sampling.splitColumn(lit(1L), Seq("a" -> 50, "b" -> 40))
    }
  }

  test("assignment is a pure function of the id: stable across runs and layouts") {
    val ids = spark.range(1000).toDF("id")
    val a = Sampling.assignSplits(ids, "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.assignSplits(ids.repartition(7), "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
  }

  test("proportions approach the weights on a uniform range") {
    val n = 20000L
    val counts = Sampling.assignSplits(spark.range(n).toDF("id"), "id")
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == n)
    assert(math.abs(counts("train") - 0.80 * n) < 0.02 * n, counts)
    assert(math.abs(counts("val") - 0.10 * n) < 0.02 * n, counts)
    assert(math.abs(counts("test") - 0.10 * n) < 0.02 * n, counts)
  }

  test("negative ids get non-negative buckets (no always-train leak)") {
    val ids = spark.range(-500, 500).toDF("id")
    val buckets = ids.select(Sampling.hashBucket(col("id")).as("b"))
      .agg(org.apache.spark.sql.functions.min("b"),
        org.apache.spark.sql.functions.max("b"))
      .head()
    assert(buckets.getLong(0) >= 0 && buckets.getLong(1) < 100)
    assert(Sampling.sampleByHash(ids, "id", 0).count() == 0)
  }

  test("sampleByHash keeps exactly the ids below the bucket cut") {
    val df = spark.range(500).toDF("id")
    val kept = Sampling.sampleByHash(df, "id", 20)
    val expected = df.where(Sampling.hashBucket(col("id")) < 20)
    assertSameRows(kept, expected)
    // 0% and 100% are the empty set and the identity
    assert(Sampling.sampleByHash(df, "id", 0).count() == 0)
    assert(Sampling.sampleByHash(df, "id", 100).count() == 500)
  }

  test("sampleMixture thins per-domain, nests across rates, 0/100 exact") {
    val df = (0L until 600L).map(i => (i, s"d${i % 3}")).toDF("id", "domain")
    val kept = Sampling.sampleMixture(df, "domain", "id",
      Map("d0" -> 0, "d1" -> 30), defaultPercent = 100)
    val byDomain = kept.collect().groupBy(_.getString(1))
      .map { case (d, rs) => d -> rs.map(_.getLong(0)).toSet }
    assert(!byDomain.contains("d0"))           // 0% = empty
    assert(byDomain("d2").size == 200)         // default 100% = all
    // nesting: d1 at 30% is a superset of d1 at 15%
    val tighter = Sampling.sampleMixture(df, "domain", "id",
      Map("d0" -> 0, "d1" -> 15), defaultPercent = 100)
      .collect().filter(_.getString(1) == "d1").map(_.getLong(0)).toSet
    assert(tighter.subsetOf(byDomain("d1")))
    // per-domain keep matches the global hash sample restricted to it
    val global = Sampling.sampleByHash(df, "id", 30)
      .collect().filter(_.getString(1) == "d1").map(_.getLong(0)).toSet
    assert(byDomain("d1") == global)
  }

  test("quantileBins cuts equal-frequency bins per stratum, ties on id") {
    // 20 rows per stratum, scores 0..19 → 4 bins of 5
    val df = (0L until 40L).map(i => (i, s"s${i % 2}", (i / 2) % 20)).toDF("id", "lang", "score")
    val binned = Sampling.quantileBins(df, "lang", "score", "id", bins = 4)
    val sizes = binned.groupBy("lang", "bin").count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(sizes.size == 8 && sizes.values.forall(_ == 5L))
    // monotone: higher score → same or higher bin within a stratum
    val byScore = binned.filter(col("lang") === "s0")
      .orderBy("score", "id").collect().map(_.getAs[Long]("bin"))
    assert(byScore.sameElements(byScore.sorted))
    // all-tied scores: assignment still total and deterministic via id
    val tied = (0L until 8L).map(i => (i, "x", 1L)).toDF("id", "lang", "score")
    val t1 = Sampling.quantileBins(tied, "lang", "score", "id", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(t1 == (0L until 8L).map(i => i -> (i / 2 + 1)).toMap)
  }

  test("sampleByBin thins listed bins, keeps others whole, nests with hash") {
    val df = (0L until 300L).map(i => (i, i % 3 + 1)).toDF("id", "bin")
    val kept = Sampling.sampleByBin(df, "bin", "id", Map(1L -> 0), defaultPercent = 100)
    val byBin = kept.collect().groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    assert(!byBin.contains(1L))
    assert(byBin(2L) == 100 && byBin(3L) == 100)
    // per-bin keep equals the global hash sample restricted to that bin
    val half = Sampling.sampleByBin(df, "bin", "id", Map(2L -> 40), 100)
      .collect().filter(_.getLong(1) == 2L).map(_.getLong(0)).toSet
    val global = Sampling.sampleByHash(df, "id", 40)
      .collect().filter(_.getLong(1) == 2L).map(_.getLong(0)).toSet
    assert(half == global)
  }

  test("sampleByRateColumn: per-row rates, clamped, monotone in the rate") {
    val df = (0L until 400L).map(i => (i, (i % 4) * 50 - 50)).toDF("id", "r")
    // rates -50/0/50/100 clamp to 0/0/50/100
    val kept = Sampling.sampleByRateColumn(df, "id", col("r")).collect()
      .map(r => r.getLong(0)).toSet
    assert(!kept.exists(_ % 4 <= 1))                  // rate <= 0: nothing
    assert((3L until 400L by 4).forall(kept.contains)) // rate 100: everything
    // rate-50 rows match the global 50% hash sample restricted to them
    val expect50 = Sampling.sampleByHash(df, "id", 50).collect()
      .map(_.getLong(0)).filter(_ % 4 == 2).toSet
    assert(kept.filter(_ % 4 == 2) == expect50)
    // monotone: doubling every rate can only grow the kept set
    val more = Sampling.sampleByRateColumn(df, "id", col("r") * 2).collect()
      .map(r => r.getLong(0)).toSet
    assert(kept.subsetOf(more))
  }

  test("capPerDomain keeps min(cap, size) rows per domain, deterministically") {
    val df = Seq.tabulate(7)(i => (i.toLong, "big")) ++
      Seq((100L, "small"), (101L, "small"))
    val in = df.toDF("id", "domain")
    val kept = Sampling.capPerDomain(in, "domain", "id", cap = 3)
    val byDomain = kept.collect().groupBy(_.getString(1))
      .map { case (d, rs) => d -> rs.map(_.getLong(0)).sorted.toSeq }
    assert(byDomain("big").size == 3)
    assert(byDomain("small") == Seq(100L, 101L)) // under cap: all kept
    // deterministic: a second evaluation keeps the same ids
    val again = Sampling.capPerDomain(in, "domain", "id", cap = 3)
    assertSameRows(kept, again)
    // the kept set is hash-ordered, not the first ids
    assert(byDomain("big") != Seq(0L, 1L, 2L))
  }

  test("stratifiedSample keeps ceil(n·p/100) per stratum; tiny strata " +
    "survive; 0% empties; deterministic") {
    val in = ((0L until 200L).map(i => (i, "big")) ++
      Seq((900L, "tiny"))).toDF("id", "stratum")
    val kept = Sampling.stratifiedSample(in, "stratum", "id", percent = 10)
    val byStratum = kept.collect().groupBy(_.getString(1))
      .map { case (s, rs) => s -> rs.map(_.getLong(0)).sorted.toSeq }
    assert(byStratum("big").size == 20) //  ceil(200·10/100)
    assert(byStratum("tiny") == Seq(900L)) // ceil(1·10/100) = 1: survives
    assert(Sampling.stratifiedSample(in, "stratum", "id", 0).count() == 0L)
    assert(Sampling.stratifiedSample(in, "stratum", "id", 100).count() == 201L)
    assertSameRows(kept,
      Sampling.stratifiedSample(in.repartition(7), "stratum", "id", 10))
  }

  test("sampleWeighted: exactly k per group, no repeats, zero-weight " +
    "excluded, deterministic under repartitioning") {
    val in = ((1L to 300L).map(i => (i, "g1", i % 7 + 1)) ++
      (301L to 320L).map(i => (i, "g2", 5L)) ++
      Seq((999L, "g1", 0L))).toDF("id", "g", "w")
    val got = Sampling.sampleWeighted(in, "g", "id", "w", k = 10)
    val rows = got.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getInt(3)))
    assert(rows.count(_._1 == "g1") == 10)
    assert(rows.count(_._1 == "g2") == 10)
    assert(rows.map(_._2).distinct.length == rows.length) // no repeats
    assert(!rows.exists(_._2 == 999L)) //                zero weight: never
    assert(rows.filter(_._1 == "g1").map(_._3).sorted.toSeq == (1 to 10))
    assertSameRows(got,
      Sampling.sampleWeighted(in.repartition(13), "g", "id", "w", k = 10))
  }

  test("sampleWeighted: inclusion odds scale with weight") {
    // two weight classes, 500 ids each; heavy rows weigh 20x more —
    // the sampled set should be dominated by the heavy class (the
    // deterministic hash makes this exact, not flaky)
    val in = (1L to 1000L)
      .map(i => (i, "g", if (i <= 500) 200L else 10L)).toDF("id", "g", "w")
    val heavy = Sampling.sampleWeighted(in, "g", "id", "w", k = 50)
      .collect().count(_.getLong(1) <= 500L)
    assert(heavy >= 35, s"expected heavy-class dominance, got $heavy/50")
  }

  test("splitting on a cluster key keeps whole clusters in one split " +
    "(the near-dup leakage guard)") {
    import spark.implicits._
    // 100 clusters of 5 members each, split on the cluster key
    val rows = (0L until 100L).flatMap(c =>
      (0L until 5L).map(m => (c * 1000L + m, c))).toDF("doc", "canon")
    val split = Sampling.assignSplits(rows, "canon")
    val perCluster = split.groupBy("canon")
      .agg(countDistinct(col("split")).as("k")).collect()
    assert(perCluster.forall(_.getLong(1) == 1L),
      "a cluster straddled a split boundary")
    // and the cuts still roughly respect 80/10/10 at the cluster level
    val byName = split.select("canon", "split").distinct()
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName("train") > 60L && byName("train") < 95L, s"$byName")
  }

  test("sampleTemperature: α-flattening up-weights tail domains, " +
    "hits the target fraction, deterministic across partitionings") {
    import spark.implicits._
    // head domain 800 rows, tail domain 200 rows
    val df = ((1L to 800L).map(i => (i, "head")) ++
      (801L to 1000L).map(i => (i, "tail"))).toDF("id", "d")
    val kept = Sampling.sampleTemperature(df, "d", "id",
      alpha = 0.5, targetFrac = 0.5)
    val byDomain = kept.groupBy("d").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = byDomain.values.sum.toDouble
    // expected keep ∝ n^0.5: head √800 ≈ 28.3, tail √200 ≈ 14.1 —
    // head keeps 2× the ROWS of tail (not 4×), i.e. the tail's keep
    // RATE is 2× the head's. Generous bounds around 500 total.
    assert(total > 420 && total < 580, s"total kept $total")
    val headRate = byDomain("head") / 800.0
    val tailRate = byDomain("tail") / 200.0
    assert(tailRate > headRate * 1.6,
      s"tail rate $tailRate not up-weighted vs head $headRate")
    // deterministic + partitioning-invariant
    val again = Sampling.sampleTemperature(df.repartition(13), "d", "id",
      alpha = 0.5, targetFrac = 0.5)
    assertSameRows(kept, again)
    // α=1 degenerates to a flat targetFrac thinning: equal rates
    val flat = Sampling.sampleTemperature(df, "d", "id",
      alpha = 1.0, targetFrac = 0.5)
    val rates = flat.select("keep_rate").distinct().collect()
      .map(_.getDouble(0)).toSet
    assert(rates == Set(0.5), s"α=1 rates should all be 0.5: $rates")
  }

  test("poissonReplication: deterministic, Poisson(1)-shaped, rounds " +
    "are independent draws") {
    val ids = (1L to 20000L).toDF("id")
    val run = (p: Int) => Sampling.poissonReplication(
      ids.repartition(p), "id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = run(1)
    assert(a == run(11)) //                      partitioning-invariant
    val ks = a.values.toSeq
    assert(ks.forall(k => k >= 0 && k <= 8))
    // mean ~ 1 and P(0) ~ 1/e for Poisson(1); generous bounds
    val mean = ks.sum.toDouble / ks.size
    assert(mean > 0.95 && mean < 1.05, s"mean $mean")
    val p0 = ks.count(_ == 0L).toDouble / ks.size
    assert(p0 > 0.33 && p0 < 0.41, s"p0 $p0")
    // a different round draws a different (but still deterministic) set
    val b = Sampling.poissonReplication(ids, "id", round = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b != a)
    val agree = a.keys.count(k => a(k) == b(k)).toDouble / a.size
    assert(agree < 0.6, s"rounds implausibly correlated: $agree")
  }

  test("downsampleNegatives: all positives kept, negatives hash-sampled " +
    "with inverse-rate weights") {
    import org.apache.spark.sql.functions._
    val df = (0L until 1000L).map(i => (i, i % 50L == 0L))
      .toDF("id", "pos")
    val got = Sampling.downsampleNegatives(df, "id", col("pos"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val (pos, neg) = got.partition(_._2 == 1L)
    assert(pos.length == 20)                      // every positive kept
    assert(pos.forall(_._3 == 1.0))
    assert(neg.forall(_._3 == 10.0))              // 100/10
    assert(neg.length > 50 && neg.length < 150,   // ~10% of 980
      s"negative survivor count ${neg.length} implausible for 10%")
    // membership is the hash spine: survivors match sampleByHash exactly
    val spine = Sampling.sampleByHash(
      df.filter(!col("pos")), "id", 10).collect().map(_.getLong(0)).toSet
    assert(neg.map(_._1).toSet == spine)
  }

  test("neymanSample: variance-driven allocation, exact budget, caps") {
    import spark.implicits._
    // Stratum a is CONSTANT (sigma = 0) → Neyman gives it nothing;
    // b varies → the whole k = 4 budget lands there.
    val rows = (1L to 10L).map(i => ("a", i, 5L)) ++
      (11L to 20L).map(i => ("b", i, (i % 7) * 100L))
    val df = rows.toDF("s", "id", "x")
    val got = Sampling.neymanSample(df, "s", "id", "x", k = 4).collect()
    assert(got.length == 4 && got.forall(_.getString(0) == "b"))
    assert(got.forall(r => r.getLong(2) == 10L && r.getLong(3) == 4L))
    // Identical strata → even split (largest remainder, no leftover).
    val even = ((1L to 10L).map(i => ("a", i, i * 10L)) ++
      (1L to 10L).map(i => ("b", i + 100L, i * 10L))).toDF("s", "id", "x")
    val e = Sampling.neymanSample(even, "s", "id", "x", k = 6).collect()
    assert(e.count(_.getString(0) == "a") == 3 &&
      e.count(_.getString(0) == "b") == 3)
    // Budget past the population: allocation caps at N_h.
    val capped = Sampling.neymanSample(even, "s", "id", "x", k = 30)
      .collect()
    assert(capped.length == 20)
    // Determinism: same membership on re-run.
    val again = Sampling.neymanSample(df, "s", "id", "x", k = 4)
      .collect().map(_.getLong(1)).toSet
    assert(again == got.map(_.getLong(1)).toSet)
  }

  test("ipfRake: marginals converge toward uniform targets, mass is " +
      "preserved within quantization, partitioning-invariant") {
    import org.apache.spark.sql.functions.col
    // Skewed 2x2: row a has 3x the mass of row b; columns skewed too.
    val rows = Seq.fill(60)(("a", "x")) ++ Seq.fill(30)(("a", "y")) ++
      Seq.fill(20)(("b", "x")) ++ Seq.fill(10)(("b", "y"))
    val df = rows.toDF("r", "c")
    val got = Sampling.ipfRake(df, col("r"), col("c"), rounds = 5)
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        x.getLong(3)).toMap
    val total = 120000L // 120 rows in milli-units
    // Row marginals after raking: each within quantization of total/2.
    val rowA = got(("a", "x")) + got(("a", "y"))
    val rowB = got(("b", "x")) + got(("b", "y"))
    assert(math.abs(rowA - total / 2) <= 200, s"rowA=$rowA")
    assert(math.abs(rowB - total / 2) <= 200, s"rowB=$rowB")
    val colX = got(("a", "x")) + got(("b", "x"))
    assert(math.abs(colX - total / 2) <= 200, s"colX=$colX")
    // Floor rounding only ever loses sub-milli mass.
    val mass = got.values.sum
    assert(mass <= total && mass >= total - 400)
    // Partitioning-invariant: fixed-point sums are order-free.
    val re = Sampling.ipfRake(df.repartition(13), col("r"), col("c"),
      rounds = 5).collect().map(x =>
        (x.getString(0), x.getString(1)) -> x.getLong(3)).toMap
    assert(re == got)
  }

  test("reservoirPerStratum: exact k per stratum, deterministic, " +
    "small strata survive whole, and bottom-k is mergeable") {
    val df = (1L to 100L).map(i => (i, if (i <= 90) "big" else "small"))
      .toDF("id", "g")
    val got = Sampling.reservoirPerStratum(df, "g", "id", k = 10)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("id"),
        r.getAs[Long]("sample_rank")))
    assert(got.count(_._1 == "big") == 10)
    assert(got.count(_._1 == "small") == 10, "k > |stratum| keeps all")
    assert(got.filter(_._1 == "big").map(_._3).sorted.toSeq ==
      (1L to 10L), "ranks are 1..k")
    // determinism + partitioning invariance
    val re = Sampling.reservoirPerStratum(df.repartition(7), "g", "id", 10)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("id"),
        r.getAs[Long]("sample_rank"))).toSet
    assert(re == got.toSet)
    // mergeability (the KMV property): bottom-10 of the union equals
    // bottom-10 over the concatenation of two per-half bottom-10s
    val h1 = df.filter(col("id") <= 50L)
    val h2 = df.filter(col("id") > 50L)
    val merged = Sampling.reservoirPerStratum(
      Sampling.reservoirPerStratum(h1, "g", "id", 10).drop("sample_rank")
        .unionByName(Sampling.reservoirPerStratum(h2, "g", "id", 10)
          .drop("sample_rank")),
      "g", "id", 10)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("id"),
        r.getAs[Long]("sample_rank"))).toSet
    assert(merged == got.toSet)
  }
}
