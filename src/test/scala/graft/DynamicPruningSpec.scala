package graft

import java.nio.file.Files

/** Posture check: dynamic partition pruning (DPP) fires on the engine's
  * session — the other 100-TB fact-scan pruner next to the runtime bloom
  * filter (`RuntimeFilterSpec`). A hive-partitioned fact joined to a
  * selectively-filtered dim must read ONLY the partitions the dim
  * selects, discovered at runtime from the dim side — the difference
  * between scanning 3 partitions and 1000 on a production lake. */
class DynamicPruningSpec extends SparkSpec {

  import spark.implicits._

  test("dim filter prunes fact partitions at runtime (dynamicpruning)") {
    val dir = Files.createTempDirectory("graft_dpp_").toString
    (0L until 50000L).map(i => (i, i % 20, s"p$i"))
      .toDF("id", "part_k", "payload")
      .write.partitionBy("part_k").parquet(s"$dir/fact")
    (0L until 20L).map(i => (i, i % 5)).toDF("dk", "cat")
      .write.parquet(s"$dir/dim")
    val confs = Seq(
      // force the non-broadcast-reuse path too: pruning must still pay off
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly" -> "false",
      "spark.sql.exchange.reuse" -> "true")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter($"cat" === 2)
      val joined = fact.join(dim, $"part_k" === $"dk")
      val plan = joined.queryExecution.sparkPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"no dynamic partition pruning in the fact scan:\n$plan")
      // dims with cat==2: dk ∈ {2, 7, 12, 17} → a quarter of the rows
      assert(joined.count() == 50000L / 20 * 4)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
