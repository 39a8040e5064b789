package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timing harness (dev tool; Bench is the driver's). */
object TimeNew {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Same session posture as Bench/Verify so timings measure the same plans.
    val spark = graft.engine.GraftSession.local("graft-time",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    // GRAFT_EXPLAIN=1: pre-execution formatted plan.
    // GRAFT_EXPLAIN=2: execute, then print the FINAL adaptive plan —
    // shows what AQE actually ran (reused stages, runtime join picks).
    val explain = sys.env.getOrElse("GRAFT_EXPLAIN", "0")
    args.toSeq.foreach { n =>
      if (explain == "1") {
        println(s"==== PLAN $n ====")
        SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      } else if (explain == "2") {
        val df = SparkEntry.queries(n)(spark, sfDir)
        // Execute df's OWN QueryExecution: df.count() would run a derived
        // plan (groupBy().count()), leaving this one un-executed and its
        // AdaptiveSparkPlan non-final.
        df.queryExecution.toRdd.count()
        println(s"==== FINAL PLAN $n ====")
        println(df.queryExecution.executedPlan.toString)
      } else {
        val t0 = System.nanoTime()
        val c = SparkEntry.queries(n)(spark, sfDir).count()
        println(f"TIMED $n%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$c")
      }
    }
    spark.stop()
  }
}
