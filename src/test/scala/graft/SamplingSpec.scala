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
}
