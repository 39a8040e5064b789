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
}
