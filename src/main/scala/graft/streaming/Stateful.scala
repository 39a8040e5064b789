package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom per-key streaming state via `flatMapGroupsWithState` — the
  * KeyValueGroupedDataset path for semantics the built-in aggregates can't
  * express (here: a running count PLUS the payload of the latest-version
  * row, tracked together).
  *
  * Scale notes: state is one small struct per key, partitioned by the
  * grouping key across executors and checkpointed incrementally; emission
  * is per-changed-key per-batch (update mode), so downstream volume tracks
  * activity, not keyspace size. At 100 TB keyspaces the state store (HDFS/
  * RocksDB-backed) shards with the shuffle partitioning.
  */
object Stateful {

  /** Input record: the ingestion contract projected to the tracked fields. */
  final case class KeyedEvent(pkey: Long, ver: Long, tie: Long, value: Double)

  /** Running state per key: event count + the latest (ver, tie) payload —
    * latest-wins tracking with an explicit tie-break, same ordering rule as
    * the merge sink (reference dedup semantics, quick_stream src/lib.rs:12-16). */
  final case class KeyState(n: Long, ver: Long, tie: Long, value: Double)

  /** Output row: current state per key, emitted whenever the key changes. */
  final case class KeyUpdate(
      pkey: Long, n_events: Long, last_us: Long, last_event_id: Long,
      last_value: Double)

  /** Fold a batch of events into the running state. */
  private def fold(state: Option[KeyState], rows: Iterator[KeyedEvent]): KeyState =
    rows.foldLeft(state.getOrElse(KeyState(0L, Long.MinValue, Long.MinValue, 0.0))) {
      (s, e) =>
        val newer = e.ver > s.ver || (e.ver == s.ver && e.tie > s.tie)
        KeyState(s.n + 1L,
          if (newer) e.ver else s.ver,
          if (newer) e.tie else s.tie,
          if (newer) e.value else s.value)
    }

  /** Running per-key counts + latest payload over a stream with columns
    * (pkey, ver, tie, value). Emits one update row per changed key per
    * micro-batch; `n_events` is monotone per key, so merging updates with
    * versionCol = n_events converges to the global answer. */
  def runningPerKey(src: DataFrame): DataFrame = {
    implicit val eventEnc = Encoders.product[KeyedEvent]
    implicit val keyEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[KeyState]
    implicit val outEnc = Encoders.product[KeyUpdate]
    src
      .select(
        col("pkey").cast("long").as("pkey"),
        col("ver").cast("long").as("ver"),
        col("tie").cast("long").as("tie"),
        col("value").cast("double").as("value"))
      .as[KeyedEvent]
      .groupByKey(_.pkey)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[KeyedEvent], state: GroupState[KeyState]) =>
          val next = fold(state.getOption, rows)
          state.update(next)
          Iterator.single(KeyUpdate(key, next.n, next.ver, next.tie, next.value))
      }
      .toDF()
  }

  /** Vote record for the streaming consensus fold: (item, label). */
  final case class VoteEvent(item: Long, lbl: String)

  /** Per-item vote tallies — bounded by the label universe. */
  final case class VoteState(counts: Map[String, Long])

  /** Current consensus per item: majority label (ties to the
    * lexicographically smallest — the batch majorityVote posture),
    * its votes, and total raters seen. */
  final case class VoteUpdate(
      item: Long, maj_label: String, n_votes: Long, m_raters: Long)

  /** Streaming MAJORITY-VOTE consensus per item — the incremental twin
    * of [[graft.ops.Agreement.majorityVote]]: per-item label tallies in
    * flatMapGroupsWithState, emitting the current majority whenever an
    * item gains votes. `m_raters` is monotone per item, so a latest-wins
    * upsert keyed on it converges to the batch consensus exactly —
    * annotation pipelines get live consensus rows without re-reading
    * the vote log. State is one |labels|-entry map per item. */
  def runningMajority(src: DataFrame): DataFrame = {
    implicit val voteEnc = Encoders.product[VoteEvent]
    implicit val keyEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[VoteState]
    implicit val outEnc = Encoders.product[VoteUpdate]
    src
      .select(col("item").cast("long").as("item"),
        col("lbl").cast("string").as("lbl"))
      .as[VoteEvent]
      .groupByKey(_.item)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[VoteEvent], state: GroupState[VoteState]) =>
          val counts = rows.foldLeft(
            state.getOption.map(_.counts).getOrElse(Map.empty[String, Long])) {
            (m, e) => m + (e.lbl -> (m.getOrElse(e.lbl, 0L) + 1L))
          }
          state.update(VoteState(counts))
          val (maj, n) = counts.toSeq.sortBy { case (l, c) => (-c, l) }.head
          Iterator.single(VoteUpdate(key, maj, n, counts.values.sum))
      }
      .toDF()
  }

  /** Event for the transition fold: (key, version, tie, type). */
  final case class TransEvent(pkey: Long, ver: Long, tie: Long, etype: String)

  /** Last event seen per key + running (from→to) counts. The count map
    * is bounded by |types|² — small by the categorical contract. */
  final case class TransState(
      lastVer: Long, lastTie: Long, lastType: String,
      counts: Map[String, Long])

  /** One output row per (key, transition) touched in the batch. */
  final case class TransRow(
      user_id: Long, from_type: String, to_type: String, n: Long)

  /** Streaming first-order transition counts — the stateful twin of
    * `ops/Funnel.markovTransitions`: per key, remember the LAST event
    * (by (ver, tie), not arrival) and count each consecutive
    * (from → to) pair as it happens; emit the keys' UPDATED transition
    * counts each batch (monotone — upsert-safe with `n` as the
    * version). Global probabilities fall out downstream:
    * Σ_keys n per (from, to) equals the batch pair counts exactly.
    *
    * In-batch rows fold in (ver, tie) order, so a single-load replay
    * reproduces the batch operator bit-for-bit; ACROSS batches the fold
    * is arrival-ordered per key (state keeps only the last event) — the
    * documented micro-batch caveat shared by every stateful gate here.
    * State per key: one event + a |types|²-bounded count map. */
  def transitionsPerKey(src: DataFrame): DataFrame = {
    implicit val eventEnc = Encoders.product[TransEvent]
    implicit val keyEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[TransState]
    implicit val outEnc = Encoders.product[TransRow]
    val Sep = "\u0000" // cannot appear in a categorical value
    src
      .select(
        col("pkey").cast("long").as("pkey"),
        col("ver").cast("long").as("ver"),
        col("tie").cast("long").as("tie"),
        col("etype").cast("string").as("etype"))
      .as[TransEvent]
      .groupByKey(_.pkey)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[TransEvent], state: GroupState[TransState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ver, e.tie))
          var st = state.getOption
            .getOrElse(TransState(Long.MinValue, Long.MinValue, null, Map.empty))
          val touched = scala.collection.mutable.LinkedHashSet.empty[String]
          sorted.foreach { e =>
            if (st.lastType != null) {
              val k = st.lastType + Sep + e.etype
              st = st.copy(counts =
                st.counts.updated(k, st.counts.getOrElse(k, 0L) + 1L))
              touched += k
            }
            st = st.copy(lastVer = e.ver, lastTie = e.tie, lastType = e.etype)
          }
          state.update(st)
          touched.iterator.map { k =>
            val Array(f, t) = k.split(Sep, 2)
            TransRow(key, f, t, st.counts(k))
          }
      }
      .toDF()
  }

  /** Event for the funnel fold: (key, event-time µs, stage name). */
  final case class FunnelEvent(pkey: Long, ver: Long, etype: String)

  /** First-ever timestamp per funnel stage (Long.MaxValue = not seen)
    * plus the event count (the monotone upsert version). */
  final case class FunnelState(
      n: Long, tView: Long, tClick: Long, tPurchase: Long)

  /** Per-key funnel row; stage times are NULL until the stage is seen. */
  final case class FunnelRow(
      user_id: Long, n_events: Long, t_view_us: Option[Long],
      t_click_us: Option[Long], t_purchase_us: Option[Long])

  /** Streaming first-touch funnel — per key, the FIRST-ever timestamp of
    * each stage (view / click / purchase); a key "converts" when those
    * firsts are strictly ordered (decided downstream at read time, where
    * the final state is visible). The loose-ordering variant of
    * `ops/Funnel.funnelStages`'s strict stage chaining — chosen for
    * streaming because per-stage MIN is commutative, so unlike the
    * transition fold this state is EXACTLY insensitive to arrival order
    * AND micro-batch boundaries: any interleaving folds to the same
    * final state. `n` counts stage events (additive → monotone), making
    * updates upsert-safe with versionCol = n_events.
    *
    * State per key: three longs + a counter. At 100 TB keyspaces this
    * shards with the state store like every stateful op here. */
  def funnelPerKey(src: DataFrame): DataFrame = {
    implicit val eventEnc = Encoders.product[FunnelEvent]
    implicit val keyEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[FunnelState]
    implicit val outEnc = Encoders.product[FunnelRow]
    val Absent = Long.MaxValue
    src
      .select(
        col("pkey").cast("long").as("pkey"),
        col("ver").cast("long").as("ver"),
        col("etype").cast("string").as("etype"))
      .as[FunnelEvent]
      .groupByKey(_.pkey)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[FunnelEvent],
            state: GroupState[FunnelState]) =>
          val next = rows.foldLeft(state.getOption
            .getOrElse(FunnelState(0L, Absent, Absent, Absent))) { (s, e) =>
            e.etype match {
              case "view" => s.copy(n = s.n + 1L, tView = s.tView.min(e.ver))
              case "click" =>
                s.copy(n = s.n + 1L, tClick = s.tClick.min(e.ver))
              case "purchase" =>
                s.copy(n = s.n + 1L, tPurchase = s.tPurchase.min(e.ver))
              case _ => s // not a funnel stage; don't bump the version
            }
          }
          state.update(next)
          def opt(v: Long): Option[Long] = if (v == Absent) None else Some(v)
          Iterator.single(FunnelRow(key, next.n, opt(next.tView),
            opt(next.tClick), opt(next.tPurchase)))
      }
      .toDF()
  }

  /** Event projected onto (key, tumbling-window start). */
  final case class RateEvent(key: Long, winStartUs: Long)

  /** EWMA carried across windows + the last folded window start. */
  final case class RateState(ewma: Double, lastWin: Long)

  /** One output row per (key, window) observed in the batch. */
  final case class RateOut(
      user_id: Long, window_start_us: Long, n_events: Long,
      rate_ewma: Double)

  /** Per-key event-RATE baseline: count events per tumbling window, then
    * smooth across the key's windows with an EWMA
    * (s_1 = n_1, s_t = α·n_t + (1-α)·s_{t-1}) — the streaming anomaly
    * baseline ("is this key suddenly 10× its usual rate?") kept as ONE
    * small state struct per key.
    *
    * Ordering contract: windows fold in event-time order WITHIN a batch
    * (exact global order under a single AvailableNow batch — what the
    * gate checks), and in arrival order across batches; a window split
    * across batches folds once per batch with its partial counts. Size
    * the watermark/trigger so windows close within a batch when exact
    * cross-batch order matters. State is one (double, long) per key —
    * bounded by key cardinality like [[runningPerKey]] (NoTimeout);
    * bounded-entity domains only. */
  def perKeyRateEwma(
      src: DataFrame, keyCol: String, tsCol: String,
      windowDuration: String, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    implicit val eventEnc = Encoders.product[RateEvent]
    implicit val keyEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[RateState]
    implicit val outEnc = Encoders.product[RateOut]
    src
      .select(col(keyCol).cast("long").as("key"),
        unix_micros(window(col(tsCol), windowDuration).getField("start"))
          .as("winStartUs"))
      .as[RateEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[RateEvent], state: GroupState[RateState]) =>
          val counts = rows.foldLeft(Map.empty[Long, Long]) { (m, e) =>
            m.updated(e.winStartUs, m.getOrElse(e.winStartUs, 0L) + 1L)
          }
          var st = state.getOption
          val out = counts.toSeq.sortBy(_._1).map { case (w, n) =>
            val e = st match {
              case Some(RateState(prev, _)) => alpha * n + (1 - alpha) * prev
              case None => n.toDouble
            }
            st = Some(RateState(e, w))
            RateOut(key, w, n, e)
          }
          st.foreach(state.update)
          out.iterator
      }
      .toDF()
  }

  /** One candidate for the per-key leaderboard. */
  final case class Scored(gkey: String, id: Long, score: Double)

  /** Bounded leaderboard state: update counter + the current top list. */
  final case class TopState(seq: Long, top: Seq[(Long, Double)])

  /** Leaderboard row: rank is 1-based; `upd_seq` is the key's monotone
    * state version, which makes latest-wins merging converge. */
  final case class TopRow(
      gkey: String, rank: Long, id: Long, score: Double, upd_seq: Long)

  /** Streaming global top-k per key — the leaderboard operator: each key
    * keeps its k best entries by (score desc, id desc ties), re-emitting
    * the full k-row slate whenever it changes. Scores are MAX-aggregated
    * per id — a re-delivered or re-scored id occupies ONE slot at its
    * best score ever seen (an improvement moves it up; a lower re-score
    * is ignored, the bounded state can't know whether the old high score
    * should stand — document upstream if decay semantics are needed).
    * Pairs with a (gkey, rank)-keyed latest-wins merge sink (version =
    * `upd_seq`) so the target always holds exactly the current slate —
    * set-replacement semantics built from the engine's own upsert
    * primitive, no special sink needed.
    *
    * State AND working memory per key are O(k): the batch iterator is
    * consumed by a strict fold that keeps a k-bounded candidate slate —
    * a hub key that sees a billion rows in one micro-batch never
    * materializes them (no collect-then-sort). The fold is
    * order-insensitive: per-id max is commutative, and the k-th score is
    * monotone non-decreasing, so an entry evicted earlier can never be
    * beaten by a lower later score for the same id — batch iterator
    * order and micro-batch partitioning cannot change the converged
    * slate. */
  def topKPerKey(src: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    implicit val eventEnc = Encoders.product[Scored]
    implicit val keyEnc = Encoders.STRING
    implicit val stateEnc = Encoders.product[TopState]
    implicit val outEnc = Encoders.product[TopRow]
    // slate is kept sorted by (score desc, id desc), length <= k.
    // ALL comparisons go through Double.compare — the same total order
    // the batch TopK Aggregator uses — so NaN scores rank consistently
    // (greatest) instead of corrupting sortWith with an inconsistent
    // comparator or defeating the as-good check.
    def cmp(a: (Long, Double), b: (Long, Double)): Int = {
      val c = java.lang.Double.compare(b._2, a._2) // score desc
      if (c != 0) c else java.lang.Long.compare(b._1, a._1) // id desc
    }
    def wins(a: (Long, Double), b: (Long, Double)): Boolean = cmp(a, b) < 0
    def insert(top: Seq[(Long, Double)], e: (Long, Double)): Seq[(Long, Double)] =
      top.indexWhere(_._1 == e._1) match {
        case i if i >= 0 =>
          if (java.lang.Double.compare(top(i)._2, e._2) >= 0) top
          else ((top.take(i) ++ top.drop(i + 1)) :+ e)
            .sortWith(wins) // improvement: re-rank the one moved entry
        case _ =>
          if (top.size < k) (top :+ e).sortWith(wins)
          else if (wins(e, top.last)) (top.init :+ e).sortWith(wins)
          else top
      }
    // Heal state written by any earlier slate representation that could
    // hold one id in several slots: keep each id's best entry. Bitwise
    // slate equality (doubleToLongBits) so a NaN score can't force a
    // rewrite + full re-emission on every batch (NaN != NaN under ==).
    def healed(top: Seq[(Long, Double)]): Seq[(Long, Double)] =
      top.groupBy(_._1).values.map(_.sortWith(wins).head)
        .toSeq.sortWith(wins).take(k)
    def sameSlate(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Boolean =
      a.corresponds(b) { (x, y) =>
        x._1 == y._1 && java.lang.Double.doubleToLongBits(x._2) ==
          java.lang.Double.doubleToLongBits(y._2)
      }
    src
      .select(col("gkey").cast("string").as("gkey"),
        col("id").cast("long").as("id"),
        col("score").cast("double").as("score"))
      .as[Scored]
      .groupByKey(_.gkey)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Scored], state: GroupState[TopState]) =>
          val prev = state.getOption.getOrElse(TopState(0L, Nil))
          val merged = rows.foldLeft(healed(prev.top)) { (top, r) =>
            insert(top, (r.id, r.score))
          }
          if (sameSlate(merged, prev.top)) Iterator.empty
          else {
            val next = TopState(prev.seq + 1L, merged)
            state.update(next)
            merged.iterator.zipWithIndex.map { case ((id, s), i) =>
              TopRow(key, i + 1L, id, s, next.seq)
            }
          }
      }
      .toDF()
  }

  /** Per-key exact moments + latest-event payload. Every field is
    * COMMUTATIVE (integer moment sums) or an argmax (latest by
    * (ver, tie)), so the state — and everything derived from it — is
    * independent of arrival order within and across micro-batches: the
    * determinism contract of [[runningPerKey]] extended with second
    * moments. */
  final case class MomentState(
      n: Long, s: Long, s2: Long,
      ver: Long, tie: Long, lastQ: Long, lastV: Double)

  /** One update row per (key, batch): the key's history size and the
    * z-score of its LATEST value against its full history. */
  final case class AnomalyRow(
      pkey: Long, n_events: Long, last_value: Double,
      zscore: Option[Double])

  /** Streaming anomaly scoring: per key, carry EXACT integer moments
    * (n, Σq, Σq² with q = floor(value·1024) — 1024 is a power of two, so
    * the quantization itself is exact IEEE) plus the latest event, and
    * emit the latest value's z-score against the key's entire history:
    *
    *   z = (n·x_q − S) / sqrt(n·Σq² − S²)
    *
    * — algebraically (x − μ)/σ_pop with every intermediate an exact
    * BIGINT, so ONE division and ONE sqrt produce a bit-deterministic
    * score regardless of arrival order, micro-batching, or engine (the
    * oracle recomputes the same integers in SQL). Zero-variance or
    * single-event keys emit NULL.
    *
    * State is one 7-field struct per key (NoTimeout — bounded-entity
    * key domains, same contract as [[runningPerKey]]); merging updates
    * with versionCol = n_events converges to the global answer.
    * Headroom: Σq² needs n·(max|x|·1024)² < 2^63 — |x| ≤ 490 leaves
    * room for ~3.5e7 events per key; wider values drop the quantum. */
  def momentAnomalyPerKey(src: DataFrame): DataFrame = {
    implicit val eventEnc = Encoders.product[KeyedEvent]
    implicit val keyEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[MomentState]
    implicit val outEnc = Encoders.product[AnomalyRow]
    val q = 1024.0
    src
      .select(
        col("pkey").cast("long").as("pkey"),
        col("ver").cast("long").as("ver"),
        col("tie").cast("long").as("tie"),
        col("value").cast("double").as("value"))
      .as[KeyedEvent]
      .groupByKey(_.pkey)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[KeyedEvent], state: GroupState[MomentState]) =>
          val next = rows.foldLeft(state.getOption.getOrElse(
            MomentState(0L, 0L, 0L, Long.MinValue, Long.MinValue, 0L, 0.0))) {
            (st, e) =>
              val qx = math.floor(e.value * q).toLong
              val newer = e.ver > st.ver || (e.ver == st.ver && e.tie > st.tie)
              MomentState(st.n + 1L, st.s + qx, st.s2 + qx * qx,
                if (newer) e.ver else st.ver,
                if (newer) e.tie else st.tie,
                if (newer) qx else st.lastQ,
                if (newer) e.value else st.lastV)
          }
          state.update(next)
          val num = next.n * next.s2 - next.s * next.s
          val z =
            if (num <= 0L) None
            else Some((next.n * next.lastQ - next.s).toDouble /
              math.sqrt(num.toDouble))
          Iterator.single(AnomalyRow(key, next.n, next.lastV, z))
      }
      .toDF()
  }
}
