package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-decade empirical scaling probe (r11 verdict item 3): the 100-TB
  * design arguments (bucketed candidates, O(edges)-per-round fixpoints,
  * O(metadata) commits) were design-audited but never MEASURED past
  * sf0.1. This main synthesizes a 10× replica of the sf0.1 fixture —
  * entity keys shifted per replica (nation/region dims kept fixed, like
  * real dims), document text passed through a per-replica letter
  * translation and embeddings through a per-id gain so the near-dup /
  * ANN structure grows like a real 10× corpus instead of 10 exact
  * copies (exact copies would inflate candidate cliques quadratically
  * BY CONSTRUCTION and measure the fixture, not the plan) — then times
  * the heaviest gate families at both scales and prints one JSON line
  * of per-gate (sf0.1 s, sf1.0 s, log10 exponent). An exponent near 1
  * is linear scaling; graph fixpoints may exceed 1 by their documented
  * O(E·rounds) factor.
  *
  * Usage: `runMain graft.ScaleProbe <sf01Dir> <bigDir>` (bigDir is
  * created; `_READY` marks a completed generation for reuse). */
object ScaleProbe {

  /** The TIMED heavy families: graph fixpoints, storage commit
    * machinery, the prefix-filter audit twin, IVF probing, NN-descent,
    * manifest replay, and the pagerank-family text gate. */
  val Gates: Seq[String] = Seq(
    "graph_closeness", "graph_scc", "graph_transitivity", "graph_katz",
    "graph_mis", "graph_harmonic",
    "dedup_prefix_jaccard", "ann_ivf_nprobe", "ann_nndescent",
    "q_bitemporal", "text_keywords_pagerank",
    "o33_branch_merge_back", "o36_rollback", "o37_wap")

  /** The sf1.0 VERIFICATION set (r12 verdict item 6): every dedup_*,
    * ann_*, graph_* gate — the three families whose 100-TB safety the
    * probe exists to prove — plus the timed set above. Derived from
    * the live board so a new family gate is scale-verified
    * automatically. All 75 r12-board family oracles were measured
    * feasible over the 10× replica (73 under 240 s on 8 threads;
    * ann_ivfpq_topk needs the compare step's explicit DuckDB
    * memory_limit+spill, 464 s; dedup_prefix_jaccard runs through its
    * PPJoin twin below). */
  def VerifyGates: Set[String] =
    SparkEntry.queries.keySet.filter(k =>
      k.startsWith("dedup_") || k.startsWith("ann_") ||
        k.startsWith("graph_")) ++ Gates

  /** sf1.0-feasible oracle substitutions for the verify mode. The
    * DRIVER oracle for `dedup_prefix_jaccard` is the intentionally
    * quadratic all-pairs audit (plan-independent — it proves the
    * prefix filter loses nothing, and stays the driver gate at
    * sf0.01); at the replica's 50k docs that is 1.25e9
    * list_intersects — infeasible in DuckDB. This twin replays the
    * SAME rarest-first prefix-filter candidate step in SQL (PPJoin
    * theorem: identical verified output), so it checks the full
    * hash/shingle/df/verify pipeline at sf1.0 in near-linear time
    * (measured 21 s vs 181 s at sf0.1; equal rows at sf0.01 AND
    * sf0.1 against the all-pairs form). Constants come from the same
    * OracleSql generators as every other text oracle. */
  private[graft] def Sf1OracleTwins: Map[String, String] = {
    import graft.functions.OracleSql
    val wh = OracleSql.wordHashes("text")
    val sh2 = OracleSql.shingles("wh", 2)
    Map("dedup_prefix_jaccard" ->
      (s"WITH base AS (SELECT doc_id, $wh AS wh FROM documents), " +
        s"gr AS (SELECT doc_id, list_distinct($sh2) AS g0 FROM base), " +
        "tt AS (SELECT doc_id, g0 FROM gr WHERE len(g0) > 0), " +
        "ex AS (SELECT doc_id, unnest(g0) AS h FROM tt), " +
        "dfr AS (SELECT h, CAST(count(*) AS BIGINT) AS df FROM ex GROUP BY h), " +
        "ordg AS (SELECT e.doc_id, list(e.h ORDER BY d.df, e.h) AS g, " +
        "CAST(count(*) AS BIGINT) AS n " +
        "FROM ex e JOIN dfr d ON e.h = d.h GROUP BY e.doc_id), " +
        // prefix length n - ceil(3n/5) + 1, the Spark plan's formula
        "pfx AS (SELECT doc_id, n, " +
        "unnest(g[1:CAST(n - ((3*n + 4) // 5) + 1 AS INT)]) AS h FROM ordg), " +
        "cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b " +
        "FROM pfx a JOIN pfx b ON a.h = b.h AND a.doc_id < b.doc_id " +
        "WHERE 3 * greatest(a.n, b.n) <= 5 * least(a.n, b.n)), " +
        "v AS (SELECT c.id_a, c.id_b, " +
        "CAST(len(list_intersect(ga.g, gb.g)) AS BIGINT) AS n_inter, " +
        "CAST(ga.n + gb.n - len(list_intersect(ga.g, gb.g)) AS BIGINT) AS n_union " +
        "FROM cand c JOIN ordg ga ON ga.doc_id = c.id_a " +
        "JOIN ordg gb ON gb.doc_id = c.id_b) " +
        "SELECT id_a, id_b, n_inter, n_union FROM v " +
        "WHERE n_inter * 5 >= 3 * n_union"))
  }

  /** The sf1.0 BENCH LANE (r13 verdict item 1): the heavy families —
    * every graph gate, the storage-merge machinery gates, the dedup
    * cluster/audit gates, the composed ANN gates, and the three heavy
    * mixed gates — timed over the 10× replica, where executor-side work
    * is visible (the sf0.1 board is driver-bound: the r13 8-core run
    * BEAT the 32-core run). Streaming s* gates are omitted on purpose:
    * their merge path is the same ParquetTarget/Merge code the o* gates
    * time, and their micro-batch bootstrap would only add noise.
    * `filter(queries.keySet)` keeps the list robust to board growth. */
  def LaneGates: Seq[String] = {
    val board = SparkEntry.queries.keySet
    val graphs = board.filter(_.startsWith("graph_")).toSeq.sorted
    val named = Seq(
      "o23_value_index", "o25_join_view", "o13_cdc_changes",
      "o13b_cdc_incremental_agg", "o33_branch_merge_back", "o35_rebucket",
      "o28_delete_vectors", "o37_wap", "o31_bloom_index", "o21_clone_branch",
      "o17_compact", "o34_snapshot_expire", "o36_rollback",
      "dedup_clusters_incremental", "dedup_prefix_jaccard",
      "dedup_clusters", "dedup_incremental",
      "ann_ivfpq_topk", "ann_pq_topk", "ann_nndescent", "ann_ivf_nprobe",
      "q_bitemporal", "text_keywords_pagerank", "q_ipf_raking")
    graphs ++ named.filter(board)
  }

  /** Per-gate job count and per-stage task-skew capture for the lane
    * (r13 verdict items 7 and 8): max/median task duration per stage
    * answers the wedge-join skew question; the job count per gate
    * answers the commit-machinery profile question. */
  private final class LaneListener
      extends org.apache.spark.scheduler.SparkListener {
    import scala.collection.mutable
    private var jobs = 0L
    private val taskMs = mutable.Map.empty[Int, mutable.ArrayBuffer[Long]]
    private val shuffleRead = mutable.Map.empty[Int, Long]
    override def onJobStart(
        j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
      synchronized { jobs += 1 }
    override def onTaskEnd(
        t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
      synchronized {
        taskMs.getOrElseUpdate(t.stageId, mutable.ArrayBuffer.empty) +=
          t.taskInfo.duration
        val sr = Option(t.taskMetrics)
          .map(_.shuffleReadMetrics.totalBytesRead).getOrElse(0L)
        shuffleRead(t.stageId) = shuffleRead.getOrElse(t.stageId, 0L) + sr
      }
    def reset(): Unit = synchronized {
      jobs = 0L; taskMs.clear(); shuffleRead.clear()
    }
    /** (jobs, top-`top` stages by max task ms as JSON fragments). */
    def report(top: Int): (Long, Seq[String]) = synchronized {
      val rows = taskMs.toSeq.map { case (sid, ds) =>
        val sorted = ds.toSeq.sorted
        (sid, ds.size, sorted(sorted.size / 2), sorted.last,
          shuffleRead.getOrElse(sid, 0L))
      }.sortBy(-_._4).take(top)
      (jobs, rows.map { case (sid, n, med, mx, sr) =>
        s"""{"stage":$sid,"tasks":$n,"med_ms":$med,"max_ms":$mx,""" +
          s""""shuffle_read_mb":${sr / 1048576}}"""
      })
    }
  }

  private val Replicas = 10
  // Above every sf0.1 id (max ~600k) but small enough that downstream
  // id·2³² pair/priority encodings (graph_mis, edge keys) stay in Long:
  // max shifted id ≈ 1.7e8 → ·2³² ≈ 7e17 < 2⁶³. 1e9 overflowed them.
  private val KeyShift = 1L << 24

  /** Entity-id columns shifted per replica; nation/region keys are NOT
    * here — dimension domains stay fixed as they would in production. */
  private val ShiftCols = Set(
    "c_custkey", "s_suppkey", "p_partkey", "o_orderkey", "o_custkey",
    "l_orderkey", "l_partkey", "l_suppkey",
    "doc_id", "vec_id", "user_id", "event_id")

  private def replicate(df: DataFrame, i: Int): DataFrame = {
    val shifted = df.columns.foldLeft(df) { (d, c) =>
      if (ShiftCols(c)) d.withColumn(c, col(c) + lit(i * KeyShift)) else d
    }
    val vowels = "aeiou"
    val rot = vowels.drop(i % 5) + vowels.take(i % 5)
    val trans = if (i % 2 == 0) rot else rot.reverse
    val texted =
      if (i > 0 && shifted.columns.contains("text"))
        shifted.withColumn("text", translate(col("text"), vowels, trans))
      else shifted
    if (i > 0 && texted.columns.contains("embedding"))
      texted.withColumn("embedding",
        transform(col("embedding"),
          x => x * (lit(1.0f) +
            (pmod(col("vec_id"), lit(89L)).cast("float") - 44.0f) / 1000.0f)))
    else texted
  }

  private def generate(spark: SparkSession, src: String, dst: String): Unit = {
    Files.createDirectories(Paths.get(dst))
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { name =>
      val base = SparkEntry.t(spark, src, name)
      val rep =
        if (name == "region" || name == "nation") base
        else (0 until Replicas).map(i => replicate(base, i))
          .reduce(_ unionByName _)
      // `t()` surfaces events.ts as epoch-nanos BIGINT; write the
      // replica back as TIMESTAMP(µs) — the r7 driver-fixture shape —
      // so the DuckDB oracle's `epoch_us(ts)` works over the replica
      // too (all fixture values are whole µs: lossless round-trip, and
      // `t()` converts it right back on read).
      val out =
        if (name == "events") {
          // The µs rewrite below is lossless ONLY under the fixture
          // contract that every ts value is whole microseconds; enforce
          // it so a future fixture with true nanos fails generation loud
          // instead of silently diverging replica from source.
          require(rep.filter(expr("ts % 1000 != 0")).limit(1).count() == 0L,
            "events.ts carries sub-microsecond nanos; the timestamp_micros" +
              " replica rewrite would be lossy")
          rep.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        } else rep
      out.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleprobe] generated $name: ${out.count()} rows")
    }
    Files.writeString(Paths.get(dst, "_READY"), "ok")
  }

  private def time(spark: SparkSession, gate: String, dir: String,
      reps: Int = 2): Double = {
    val fn = SparkEntry.queries(gate)
    var best = Double.MaxValue
    (1 to reps).foreach { _ =>
      val t0 = System.nanoTime()
      fn(spark, dir).write.mode("overwrite").format("noop").save()
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
    }
    best
  }

  def main(args: Array[String]): Unit = {
    val (srcDir, bigDir, mode) = args match {
      case Array(s, b)    => (s, b, "time")
      case Array(s, b, m) => (s, b, m)
    }
    // A typo'd mode must not silently burn a full timing pass.
    require(mode == "time" || mode == "verify" || mode == "lane",
      s"unknown mode '$mode' (expected 'time', 'verify' or 'lane')")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.engine.GraftSession.local("graft-scaleprobe", cpus)
    if (!Files.exists(Paths.get(bigDir, "_READY")))
      generate(spark, srcDir, bigDir)
    if (mode == "verify") {
      // r11 verdict item 4 (widened per r12 item 6): hash-verify the
      // FULL dedup/ann/graph families at sf1.0, not just the timed
      // subset. Dump over the replica for `DUCKDB_MEMORY_LIMIT=60GB
      // tools/compare_oracle.py <bigDir> <bigDir>/_verify` —
      // converting the timing claim into a correctness claim at one
      // decade up.
      Verify.dump(spark, bigDir, s"$bigDir/_verify", Some(VerifyGates),
        oracleOverrides = Sf1OracleTwins)
      println(s"[scaleprobe] verify dump at $bigDir/_verify")
      spark.stop()
      return
    }
    if (mode == "lane") {
      // r13 verdict item 1: the heavy-family bench lane at sf1.0, with
      // per-gate seconds, job counts, and per-stage task-skew evidence.
      val laneGates = sys.env.get("GRAFT_LANE_GATES")
        .map(_.split(",").toSeq).getOrElse(LaneGates)
      val reps = sys.env.getOrElse("GRAFT_LANE_REPS", "2").toInt
      val listener = new LaneListener
      spark.sparkContext.addSparkListener(listener)
      val rows = laneGates.map { g =>
        try {
          var best = Double.MaxValue
          var bestReport: (Long, Seq[String]) = (0L, Nil)
          (1 to reps).foreach { _ =>
            listener.reset()
            spark.sparkContext.setJobDescription(s"lane:$g")
            val t0 = System.nanoTime()
            SparkEntry.queries(g)(spark, bigDir)
              .write.mode("overwrite").format("noop").save()
            val t = (System.nanoTime() - t0) / 1e9
            // listener events drain asynchronously; settle before reading
            // (dev tool: a fixed pause is fine — event delivery for
            // already-completed stages is millisecond-scale)
            Thread.sleep(500L)
            if (t < best) { best = t; bestReport = listener.report(3) }
          }
          val (jobs, stages) = bestReport
          val line = s""""$g":{"sec":${f"$best%.3f"},"jobs":$jobs,""" +
            s""""stages":[${stages.mkString(",")}]}"""
          println(f"[lane] $g%-28s ${best}%8.2f s  jobs=$jobs")
          line
        } catch {
          case e: Exception =>
            println(s"[lane] $g ERR ${e.getMessage.take(120)}")
            s""""$g":{"err":true}"""
        }
      }
      val json =
        s"""{"metric":"sf1lane","cpus":$cpus,"dir":"$bigDir",${rows.mkString(",")}}"""
      println(json)
      val out = sys.env.getOrElse("GRAFT_LANE_OUT", "sf1_lane.json")
      Files.writeString(Paths.get(out), json)
      spark.stop()
      return
    }
    val rows = Gates.map { g =>
      try {
        val t01 = time(spark, g, srcDir)
        val t10 = time(spark, g, bigDir)
        val exp = math.log10(t10 / t01) // per decade of data
        println(f"[scaleprobe] $g%-24s sf0.1 $t01%7.2fs  sf1.0 $t10%7.2fs  exp $exp%5.2f")
        s""""$g":{"t01":${f"$t01%.3f"},"t10":${f"$t10%.3f"},"exp":${f"$exp%.3f"}}"""
      } catch {
        case e: Exception =>
          println(s"[scaleprobe] $g ERR ${e.getMessage.take(120)}")
          s""""$g":{"err":true}"""
      }
    }
    println(s"""{"metric":"scaleprobe","cpus":$cpus,${rows.mkString(",")}}""")
    spark.stop()
  }
}
