package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit

import graft.model.{IngestConfig, TargetTable}
import graft.ops.Dedup

/** A parquet-path-backed mutable table — the engine's stand-in for the
  * reference's Postgres target tables. Each merge rewrites the table
  * (read current → join-merge with the batch → write new version → swap).
  *
  * Scale notes: the rewrite is the simple, format-agnostic strategy; the
  * directory swap is atomic on HDFS-like filesystems (rename) — on object
  * stores a transactional table format (v2 `MERGE INTO` target) is the
  * production path, and the merge planning here carries over unchanged.
  * Writer parallelism is bounded by `IngestConfig.maxWriterPartitions`,
  * the analog of the reference's DB-connection cap
  * (`max_con_count`, quick_stream `src/builder.rs:14-33`).
  */
final class ParquetTarget(spark: SparkSession, val table: TargetTable) {

  private def fs = new Path(table.path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists: Boolean = fs.exists(new Path(table.path))

  def read(): Option[DataFrame] =
    if (exists) Some(spark.read.parquet(table.path)) else None

  /** Latest-wins merge of one micro-batch into the target — the analog of
    * the sender task executing `INSERT … ON CONFLICT DO UPDATE`
    * (quick_stream `src/upsert.rs:283-295`). Idempotent: replaying the same
    * batch yields the same table (deterministic latest-wins), which is the
    * exactly-once story the reference lacks (SURVEY.md §7 "what's hard"). */
  def mergeUpsert(batch: DataFrame, config: IngestConfig): Unit = {
    val merged = read() match {
      case Some(current) =>
        Merge.upsertBroadcast(current, batch,
          table.keyCols, table.versionCol, table.tieBreakCols)
      case None =>
        Dedup.latestWins(batch, table.keyCols, table.versionCol, table.tieBreakCols)
    }
    swapIn(merged, config)
  }

  /** Soft delete a batch of tombstones (sets `table.softDeleteCol` false). */
  def mergeSoftDelete(batch: DataFrame, config: IngestConfig): Unit =
    read().foreach { current =>
      swapIn(Merge.softDelete(current, batch, table.keyCols, table.versionCol,
        table.tieBreakCols, table.softDeleteCol), config)
    }

  /** Hard delete a batch of tombstones (drops the rows). */
  def mergeHardDelete(batch: DataFrame, config: IngestConfig): Unit =
    read().foreach { current =>
      swapIn(Merge.hardDelete(current, batch, table.keyCols, table.versionCol,
        table.tieBreakCols), config)
    }

  /** Write `df` next to the live table, then swap directories. The write
    * must fully materialize before the old version is dropped (we are
    * reading the path we're replacing). */
  private def swapIn(df: DataFrame, config: IngestConfig): Unit = {
    val live = new Path(table.path)
    val tmp = new Path(table.path + ".staging")
    val old = new Path(table.path + ".old")
    df.repartition(config.maxWriterPartitions)
      .write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(live)) fs.rename(live, old)
    fs.rename(tmp, live)
    fs.delete(old, true)
  }
}
