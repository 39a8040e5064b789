package graft.sink

import org.apache.spark.sql.DataFrame

import graft.model.IngestConfig

/** The sink seam every processor writes through — the engine-side analog
  * of the reference's `Upsert<T>`/`Delete<T>` traits (quick_stream
  * `src/upsert.rs:19-33`, `src/delete.rs:18-32`): the reference hands the
  * user a `Vec<T>` + prepared statement and lets the impl bind and
  * execute; here the engine hands the sink a micro-batch DataFrame and the
  * sink owns the merge. Implementations: [[ParquetTarget]] (bucketed
  * storage-layer tables) and [[JdbcSink]] (real database targets, the
  * reference's actual destination). */
trait MergeSink {
  /** Latest-wins keyed upsert of one micro-batch. */
  def mergeUpsert(batch: DataFrame, config: IngestConfig): Unit
  /** Tombstone-flag soft delete (reference "data soft deleter"). */
  def mergeSoftDelete(batch: DataFrame, config: IngestConfig): Unit
  /** Physical row removal. */
  def mergeHardDelete(batch: DataFrame, config: IngestConfig): Unit
}
