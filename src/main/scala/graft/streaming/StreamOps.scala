package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream-stream relational operators — the remaining Structured-Streaming
  * surface beyond windows (EventTime) and custom state (Stateful). The
  * reference has no cross-stream operators at all (SURVEY.md §2.9: joins
  * absent; its only per-stream state is the per-flush DataHolder buffer),
  * so these are engine-first capabilities, built directly on Spark's
  * streaming symmetric hash join and streaming-dedup state stores.
  */
object StreamJoins {

  /** Stream-stream INNER interval join: pair each left row with the right
    * rows sharing its key whose event time falls in
    * `[leftTs - lookback, leftTs + lookahead]`.
    *
    * Design for scale: the time-range predicate plus per-side watermarks
    * is exactly the shape Spark's streaming join planner needs to derive
    * state watermarks for BOTH sides — each side's join state is evicted
    * once it can no longer match any future row, so state is
    * O(key cardinality × (watermark + interval) window), independent of
    * stream length. Without the range condition the state would grow
    * unboundedly. Execution is a symmetric hash join: one shuffle per
    * side, keyed by the join key — the same partitioning a batch shuffle
    * join would use, amortized across micro-batches.
    *
    * Column names must be disjoint between the sides (rename before the
    * call) — the join condition is built by bare name, and disjoint names
    * keep the output unambiguous for downstream merges.
    *
    * @param keyPairs  (leftCol, rightCol) equality pairs
    * @param leftTsCol,rightTsCol event-time TimestampType columns
    * @param lookback  interval string: how far BEFORE leftTs a right row
    *                  may be (e.g. "0 seconds" = right not earlier)
    * @param lookahead interval string: how far AFTER leftTs
    * @param watermark disorder bound applied to both sides; rows later
    *                  than it may be dropped from state before matching
    * @param joinType  inner (default) or left_outer / right_outer /
    *                  full_outer: outer rows null-extend ON STATE EXPIRY —
    *                  an unmatched row emits only once the watermark
    *                  proves no future partner can arrive, so outer
    *                  results trail the watermark by the interval bound */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      keyPairs: Seq[(String, String)],
      leftTsCol: String, rightTsCol: String,
      lookback: String, lookahead: String,
      watermark: String, joinType: String = "inner"): DataFrame = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"intervalJoin requires disjoint column names; shared: ${overlap.mkString(", ")}")
    require(keyPairs.nonEmpty, "intervalJoin requires at least one key pair")
    require(Seq("inner", "left_outer", "right_outer", "full_outer")
      .contains(joinType),
      s"intervalJoin supports inner/left_outer/right_outer/full_outer, got $joinType")
    val l = left.withWatermark(leftTsCol, watermark)
    val r = right.withWatermark(rightTsCol, watermark)
    val keyCond = keyPairs.map { case (a, b) => col(a) === col(b) }.reduce(_ && _)
    val rangeCond =
      col(rightTsCol) >= col(leftTsCol) - expr(s"INTERVAL '$lookback'") &&
        col(rightTsCol) <= col(leftTsCol) + expr(s"INTERVAL '$lookahead'")
    l.join(r, keyCond && rangeCond, joinType)
  }

  /** Stream-static enrichment join: attach dimension attributes to a
    * stream (user → account, doc → source metadata) — the workhorse
    * lookup every ingest pipeline needs before it aggregates or routes.
    *
    * Design for scale: the dimension side is BROADCAST (the default), so
    * the stream keeps its source partitioning — no shuffle of the stream,
    * and, unlike a stream-stream join, NO state store at all: the static
    * side RE-EXECUTES each micro-batch. Freshness caveat: re-execution is
    * not re-discovery — a file-based dimension (parquet/csv/orc read)
    * pins its file listing in the DataFrame's file index at creation, so
    * rows appended or rewritten after that are NOT picked up (an
    * overwrite can even fail the stream on deleted files). For a
    * dimension that must refresh in-flight, read it through a catalog
    * table whose metadata refreshes (or a transactional table format) —
    * or restart the stream, which re-creates the frame. Inner or
    * left_outer only — those are the types Spark supports with the
    * stream on the left, and left_outer keeps unmatched stream rows
    * flowing (nulls) instead of silently dropping them. A dimension too
    * big to broadcast: set `broadcastDim = false` and the planner falls
    * back to a shuffled join of each micro-batch.
    *
    * @param keyPairs (streamCol, dimCol) equality pairs; names must be
    *                 disjoint between the sides like [[intervalJoin]] */
  def enrichWithDim(
      stream: DataFrame, dim: DataFrame,
      keyPairs: Seq[(String, String)],
      joinType: String = "left_outer",
      broadcastDim: Boolean = true): DataFrame = {
    require(Seq("inner", "left_outer").contains(joinType),
      s"stream-static enrichment supports inner/left_outer, got $joinType")
    require(keyPairs.nonEmpty, "enrichWithDim requires at least one key pair")
    val overlap = stream.columns.toSet.intersect(dim.columns.toSet)
    require(overlap.isEmpty,
      s"enrichWithDim requires disjoint column names; shared: ${overlap.mkString(", ")}")
    val cond = keyPairs.map { case (a, b) => col(a) === col(b) }.reduce(_ && _)
    stream.join(if (broadcastDim) broadcast(dim) else dim, cond, joinType)
  }
}

/** Streaming set-similarity self-join — near-duplicate detection ON the
  * ingest stream (the Structured-Streaming form of distributed streaming
  * set-similarity joins, cf. "Distributed Streaming Set Similarity
  * Join", ICDE 2020): each arriving doc is banded by its MinHash
  * signature (row-local, the SAME constants as the batch
  * `NearDup.lshCandidatePairs`, so candidates match the batch operator
  * exactly), and candidate pairs surface from a watermarked stream-stream
  * equi-join on (band, key) bounded to |ts_a - ts_b| <= window.
  *
  * Scale shape: banding multiplies the stream by `m/r` rows (row-local,
  * no shuffle); the join state is the watermark+window-bounded slice of
  * banded rows per (band, key) bucket — the streaming analog of the
  * batch band join's linear shuffle, NEVER an all-pairs buffer. The
  * final exact `dropDuplicates` collapses multi-band hits; its state is
  * one row per DISTINCT emitted pair (output-sized — the minimum any
  * exact pair-dedup can hold; swap for dropDuplicatesWithinWatermark to
  * TTL it when re-emission after the window is acceptable). */
object StreamSimilarity {
  import graft.functions.TextHash

  /** Candidate near-dup pairs (id_a < id_b, ts_a, ts_b) among stream docs
    * whose event times lie within `window` of each other. */
  def lshSelfJoinPairs(
      docs: DataFrame, idCol: String, textCol: String, tsCol: String,
      m: Int = 8, n: Int = 3, r: Int = 2,
      window: String = "1 hour", watermark: String = "1 hour"): DataFrame = {
    require(m % r == 0, s"signature size $m must divide into bands of $r")
    // Banding inline (the batch helper's parallelism `spread` touches
    // df.rdd, which streaming plans forbid), but the band keys come from
    // the SHARED fold (TextHash.bandKeys) so batch/stream candidates
    // cannot drift. Docs with < n words get NULL signatures -> NULL band
    // keys -> never equi-join, as in batch.
    def banded(suffix: String): DataFrame =
      docs.select(col(idCol).as(s"id$suffix"), col(tsCol).as(s"ts$suffix"),
          TextHash.wordHashes(col(textCol)).as("__wh"))
        .select(col(s"id$suffix"), col(s"ts$suffix"),
          TextHash.shingleHashes(col("__wh"), n).as("__sh"))
        .select(col(s"id$suffix"), col(s"ts$suffix"),
          TextHash.minhashSignature(col("__sh"), m).as("__sig"))
        .select(col(s"id$suffix"), col(s"ts$suffix"),
          explode(TextHash.bandKeys(
            (0 until m).map(j => element_at(col("__sig"), j + 1)), r))
            .as("__bk"))
        .select(col(s"id$suffix"), col(s"ts$suffix"),
          col("__bk.band").as(s"band$suffix"),
          col("__bk.key").as(s"key$suffix"))
    val a = banded("_a").withWatermark("ts_a", watermark)
    val b = banded("_b").withWatermark("ts_b", watermark)
    // Planner note: Spark's state-constraint extractor attempts a state
    // watermark from EVERY inequality conjunct and logs a scary (but
    // caught) internal-error stack for the non-time `id_a < id_b` pair
    // predicate before deriving the real state bound from the ts
    // conjuncts — verified benign: state eviction comes from the time
    // range. Writing the predicate as a post-join filter doesn't help;
    // PushPredicateThroughJoin folds it straight back in.
    a.join(b,
        col("band_a") === col("band_b") && col("key_a") === col("key_b") &&
          col("id_a") < col("id_b") &&
          col("ts_b") >= col("ts_a") - expr(s"INTERVAL '$window'") &&
          col("ts_b") <= col("ts_a") + expr(s"INTERVAL '$window'"))
      .select(col("id_a"), col("id_b"),
        unix_micros(col("ts_a")).as("ts_a_us"),
        unix_micros(col("ts_b")).as("ts_b_us"))
      .dropDuplicates("id_a", "id_b")
  }
}

/** Streaming deduplication: emit each key once across the whole stream (or
  * once per watermark window), the streaming twin of the batch latest-wins
  * dedup (ops/Dedup) — the reference dedups only WITHIN one accumulated
  * batch (`remove_upsert_duplicates`, src/lib.rs:12-16) and relies on the
  * Postgres upsert for cross-batch identity; here the engine offers true
  * cross-batch first-wins emission as a source-side filter.
  */
object StreamDedup {

  /** Exact cross-stream dedup: the first row seen per key is emitted,
    * every later row is dropped. State holds one entry PER DISTINCT KEY
    * forever — correct and bounded for key domains that are themselves
    * bounded (entity ids, routing tables); for unbounded domains use
    * [[withinWatermark]]. Downstream should project the key columns (or
    * treat the payload as arbitrary-witness): which duplicate arrives
    * first is scheduling-dependent. */
  def exact(src: DataFrame, keyCols: Seq[String]): DataFrame =
    src.dropDuplicates(keyCols)

  /** Watermark-bounded dedup: duplicates arriving within the watermark of
    * the first occurrence are dropped; state for a key is evicted once
    * the watermark passes it, so state is O(keys active inside one
    * watermark window) — the 100-TB shape for unbounded key domains
    * (e.g. URL dedup on a crawl stream). A key CAN re-emit after its
    * state expires: at-least-once per key, exactly-once within the
    * window — pair with a latest-wins merge sink for global identity. */
  def withinWatermark(
      src: DataFrame, keyCols: Seq[String],
      tsCol: String, watermark: String): DataFrame =
    src.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)
}

/** Per-key event-time admission quota — the per-SOURCE backpressure the
  * reference applies globally (bounded mpsc, `src/lib.rs:158`), made
  * per-key and per-window: admit at most `maxPerWindow` events for each
  * (key, tumbling window), drop the rest. The shape of API rate limiting,
  * per-user sampling caps, and abuse throttling on an ingest stream.
  */
object StreamQuota {

  import org.apache.spark.sql.Encoders
  import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

  /** Event projected onto the quota key space. `ts` stays TimestampType
    * so the upstream watermark column flows into the state operator
    * (EventTimeTimeout requires it); `winEndUs` rides along so the
    * timeout needs no driver-side interval parsing. */
  final case class QEvent(
      key: Long, winStartUs: Long, winEndUs: Long,
      ts: java.sql.Timestamp, eventId: Long)

  /** Event-time micros of a Timestamp (getTime alone truncates to ms). */
  private def micros(t: java.sql.Timestamp): Long =
    t.getTime / 1000L * 1000000L + t.getNanos / 1000L

  /** State per (key, window): how many events were already admitted. */
  final case class QState(admitted: Long)

  /** An admitted event with its 1-based admission rank in the window. */
  final case class QAdmit(
      user_id: Long, window_start_us: Long, event_id: Long, ts_us: Long,
      admitted_rank: Long)

  /** Admit the first `maxPerWindow` events per (keyCol, tumbling
    * `windowDuration` window of `tsCol`), ordered by (event time, idCol)
    * WITHIN each micro-batch; later batches consume whatever quota
    * remains (state carries the admitted count). With all data in one
    * batch the admitted set is exactly the global (ts, id)-first rows —
    * the deterministic contract the oracle checks; across batches the
    * count-based guarantee ("never more than N per key-window") holds
    * regardless of arrival order.
    *
    * Scale: state is ONE counter per active (key, window), partitioned
    * by the group key; event-time timeouts remove a window's counter
    * once the watermark passes its end, so state is O(keys active
    * within one watermark horizon), independent of stream length. */
  def perKeyWindowQuota(
      src: DataFrame, keyCol: String, tsCol: String, idCol: String,
      windowDuration: String, watermark: String,
      maxPerWindow: Int): DataFrame = {
    require(maxPerWindow >= 1,
      s"maxPerWindow must be >= 1, got $maxPerWindow")
    implicit val eventEnc = Encoders.product[QEvent]
    implicit val keyEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    implicit val stateEnc = Encoders.product[QState]
    implicit val outEnc = Encoders.product[QAdmit]
    src
      .withWatermark(tsCol, watermark)
      .select(col(keyCol).cast("long").as("key"),
        unix_micros(window(col(tsCol), windowDuration).getField("start"))
          .as("winStartUs"),
        unix_micros(window(col(tsCol), windowDuration).getField("end"))
          .as("winEndUs"),
        col(tsCol).as("ts"),
        col(idCol).cast("long").as("eventId"))
      .as[QEvent]
      .groupByKey(e => (e.key, e.winStartUs))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (k: (Long, Long), rows: Iterator[QEvent], state: GroupState[QState]) =>
          if (state.hasTimedOut) {
            state.remove() // watermark passed the window end: free the counter
            Iterator.empty
          } else {
            val already = state.getOption.map(_.admitted).getOrElse(0L)
            val room = maxPerWindow - already
            val batch = rows.toSeq
            val admitted =
              if (room <= 0) Seq.empty[QEvent]
              else batch.sortBy(e => (micros(e.ts), e.eventId)).take(room.toInt)
            state.update(QState(already + admitted.length))
            // Evict once the watermark proves the window can't refill.
            // CLAMPED above the current watermark: at one-batch volume
            // the watermark is still 0 here, but when AvailableNow
            // splits the backlog (seen live at the 10× scale probe) a
            // later batch can process a group whose window end the
            // watermark has already passed — a raw winEndUs timeout
            // then throws "timeout earlier than watermark". The clamp
            // fires the eviction on the very next batch instead.
            state.setTimeoutTimestamp(
              math.max(batch.head.winEndUs / 1000L,
                state.getCurrentWatermarkMs() + 1L))
            admitted.iterator.zipWithIndex.map { case (e, i) =>
              QAdmit(k._1, k._2, e.eventId, micros(e.ts), already + i + 1L)
            }
          }
      }
      .toDF()
  }
}
