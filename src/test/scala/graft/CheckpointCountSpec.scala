package graft

import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.functions._

/** GraftSql.checkpointCount — the fused materialize-and-count every
  * iterative operator's convergence probe rides (r13 wave 1). The counts
  * gate fixpoint exits and kTruss's exact `kn == n` test, so they must be
  * EXACT, not merely monotone-safe: both come from per-partition results
  * of the materialization job itself (a retried task REPLACES its
  * partition's pair — the r13-advice accumulator overcount class cannot
  * occur by construction). These specs pin the exactness contract and the
  * checkpoint-twin semantics. */
class CheckpointCountSpec extends SparkSpec {

  import spark.implicits._

  test("total and flag counts equal the recomputed ground truth") {
    val df = (1L to 1000L).toDF("id")
      .withColumn("flag",
        when(col("id") % 7 === 0, lit(true))
          .when(col("id") % 11 === 0, lit(false))
          .otherwise(lit(null).cast("boolean")))
      .repartition(7) // multiple partitions: the counts must merge
    val (out, total, flagged) = GraftSql.checkpointCount(df, Some("flag"))
    try {
      assert(total == 1000L)
      // NULL flags count as false — only id % 7 == 0 rows flag
      assert(flagged == (1L to 1000L).count(_ % 7 == 0))
      // the returned frame is the same rows (the checkpointed twin)
      assert(out.count() == 1000L)
      assert(out.agg(sum(col("id"))).head.getLong(0) == 500500L)
    } finally GraftSql.freeLocalCheckpoint(out)
  }

  test("counts stay exact when the checkpointed twin is re-read") {
    // Re-reading the twin (as every fixpoint round does) must not change
    // or re-fire anything: the counts were computed once, in the
    // materialization job.
    val df = (1L to 64L).toDF("id")
      .withColumn("flag", (col("id") % 2 === 0).as("flag"))
    val (out, total, flagged) = GraftSql.checkpointCount(df, Some("flag"))
    try {
      (1 to 3).foreach { _ => assert(out.count() == 64L) }
      assert(total == 64L && flagged == 32L)
    } finally GraftSql.freeLocalCheckpoint(out)
  }

  test("no flag column: flagged is zero, total exact, empty frame safe") {
    val (out, total, flagged) =
      GraftSql.checkpointCount((1L to 10L).toDF("id"))
    try { assert(total == 10L && flagged == 0L) }
    finally GraftSql.freeLocalCheckpoint(out)
    val (outE, totalE, flaggedE) =
      GraftSql.checkpointCount(spark.range(0).toDF("id")
        .withColumn("f", lit(true)), Some("f"))
    try { assert(totalE == 0L && flaggedE == 0L && outE.count() == 0L) }
    finally GraftSql.freeLocalCheckpoint(outE)
  }

  test("partition-level recomputation cannot inflate the counts") {
    // The retry model: a partition's (rows, flags) pair REPLACES any
    // earlier attempt. Simulate by re-running the counting function over
    // every partition of the checkpointed twin — each pass returns the
    // SAME per-partition pairs, so any retry interleaving sums to the
    // same totals (an accumulator would have doubled here).
    val df = (1L to 500L).toDF("id")
      .withColumn("flag", (col("id") % 3 === 0).as("flag"))
      .repartition(5)
    val (out, total, flagged) = GraftSql.checkpointCount(df, Some("flag"))
    try {
      def pairs(): Seq[(Long, Long)] = out.rdd
        .mapPartitions { it =>
          var n = 0L; var f = 0L
          it.foreach { r => n += 1; if (r.getBoolean(1)) f += 1 }
          Iterator.single((n, f))
        }.collect().toSeq
      val first = pairs()
      val retried = pairs() // "every task retried once"
      assert(first == retried)
      assert(first.map(_._1).sum == total)
      assert(first.map(_._2).sum == flagged)
      assert(flagged == (1L to 500L).count(_ % 3 == 0))
    } finally GraftSql.freeLocalCheckpoint(out)
  }
}
