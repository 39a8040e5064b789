package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact frequency top-k with a Misra–Gries candidate pass — the
  * heavy-hitter shape for key domains too large to shuffle in full
  * (URLs, user ids, n-grams at corpus scale). A plain
  * `groupBy(key).count().orderBy(...)` shuffles one record per DISTINCT
  * key; this instead shuffles at most `slots` candidate keys per input
  * partition, then recounts ONLY the candidates exactly.
  *
  * Correctness is unconditional, not sketch-approximate:
  *  - Misra–Gries with `slots` counters undercounts any key by at most
  *    n_p/(slots+1) within a partition, so every key with global count
  *    > N/(slots+1) survives in at least one partition (pigeonhole over
  *    the partial sums) — candidates are a SUPERSET of all such keys.
  *  - After the exact recount, if the k-th candidate count exceeds
  *    N/(slots+1), the global top-k provably all cleared the candidate
  *    bar, so the candidate top-k IS the global top-k. Otherwise the
  *    operator falls back to the full exact aggregation. The branch
  *    condition is partitioning-independent (the k-th max over any
  *    candidate superset equals the global k-th max exactly when that
  *    max clears the threshold), so the result — and the plan choice —
  *    is deterministic.
  *
  * Cost: two scans of the input (sketch pass + recount pass) instead of
  * one, in exchange for shuffle volume dropping from O(distinct keys) to
  * O(slots × partitions) + O(candidate-matched rows post-combine). The
  * candidate list is broadcast (≤ slots × partitions entries); size
  * `slots` so that stays driver-safe — 256 slots × 10k partitions is
  * 2.6M keys, the practical ceiling. Ties break by ascending key, so the
  * result is stable across engines.
  */
object HeavyHitters {

  /** Exact top-`k` keys by frequency. Null keys are excluded. Output:
    * (key STRING, cnt BIGINT), the k most frequent keys, ties broken by
    * ascending key string.
    *
    * @param slots Misra–Gries counters per partition; the fast path needs
    *              the k-th count > N/(slots+1), so size well above k. */
  def topKByFrequency(
      df: DataFrame, keyCol: String, k: Int, slots: Int = 256): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(slots >= k, s"slots ($slots) must be >= k ($k)")
    val spark = df.sparkSession
    import spark.implicits._
    val keys = df.select(col(keyCol).cast("string").as("__key"))
      .filter(col("__key").isNotNull)
    // Sketch pass: per-partition Misra–Gries; one (null, rowCount) marker
    // row per partition carries N without a separate count scan.
    val sketch = keys.as[String].mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      var n = 0L
      it.foreach { key =>
        n += 1L
        counters.get(key) match {
          case Some(c) => counters(key) = c + 1L
          case None if counters.size < slots => counters(key) = 1L
          case None => // decrement-all; amortized O(1) per input row
            val dead = List.newBuilder[String]
            counters.foreach { case (kk, c) =>
              if (c == 1L) dead += kk else counters(kk) = c - 1L
            }
            dead.result().foreach(counters.remove)
        }
      }
      Iterator.single((Option.empty[String], n)) ++
        counters.keysIterator.map(kk => (Option(kk), 0L))
    }.toDF("__key", "__n").persist()
    try {
      val total = sketch.filter(col("__key").isNull)
        .agg(sum(col("__n"))).as[Option[Long]].head().getOrElse(0L)
      if (total == 0L) return keys.groupBy(col("__key").as("key"))
        .agg(count(lit(1)).as("cnt")).limit(0)
      val cand = sketch.filter(col("__key").isNotNull)
        .select(col("__key")).distinct()
      // Recount pass: exact counts for candidates only — the broadcast
      // semi-join keeps non-candidate rows out of the shuffle entirely.
      val counts = keys.join(broadcast(cand), "__key")
        .groupBy(col("__key")).agg(count(lit(1)).as("cnt"))
      val top = counts
        .orderBy(col("cnt").desc, col("__key").asc).limit(k)
        .select(col("__key").as("key"), col("cnt"))
        .localCheckpoint() // ≤ k rows; also the guarantee probe below
      val kth = top.agg(min(col("cnt"))).as[Option[Long]].head()
      val exactGuaranteed =
        top.count() == k.toLong && kth.exists(_ > total / (slots + 1L))
      if (exactGuaranteed) top
      else // the sketch can't prove the tail; fall back to the full agg
        keys.groupBy(col("__key")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("__key").asc).limit(k)
          .select(col("__key").as("key"), col("cnt"))
    } finally { sketch.unpersist(); () }
  }
}
