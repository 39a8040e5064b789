package graft

import java.nio.file.Files

/** Posture check: Spark's runtime bloom-filter injection (the 100-TB
  * fact-scan pruner) fires on the engine's session for a selective
  * dim→fact shuffle join. Local thresholds are lowered to make the
  * optimizer see "scale"; production inherits the defaults, where the
  * rule targets exactly the big-fact-small-dim joins this engine plans. */
class RuntimeFilterSpec extends SparkSpec {

  import spark.implicits._

  test("selective dim join injects bloom_filter onto the fact scan") {
    val dir = Files.createTempDirectory("graft_rtf_").toString
    (0L until 200000L).map(i => (i, i % 1000, s"p$i"))
      .toDF("id", "fk", "payload").write.parquet(s"$dir/fact")
    (0L until 1000L).map(i => (i, i % 7)).toDF("dk", "cat")
      .write.parquet(s"$dir/dim")
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter($"cat" === 3)
      val joined = fact.join(dim, $"fk" === $"dk")
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("BloomFilter"),
        s"no runtime bloom filter injected:\n$plan")
      // and it still computes the right thing
      assert(joined.count() ==
        (0L until 200000L).count(i => (i % 1000) % 7 == 3))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
