package graft.sink

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit

import graft.model.{IngestConfig, TargetTable}
import graft.ops.Dedup

/** A parquet-backed mutable table — the engine's stand-in for the
  * reference's Postgres target tables. Each merge writes a NEW immutable
  * version directory under `table.path` and then atomically repoints a
  * manifest file (`_LATEST`) at it:
  *
  * {{{
  *   table.path/
  *     _LATEST          <- single line: name of the current version dir
  *     v0000000001/     <- immutable parquet snapshot (has _SUCCESS)
  *     v0000000002/
  * }}}
  *
  * Crash safety (there is NO window where committed state can be lost,
  * unlike a live/old/staging double-rename):
  *  - crash while writing a version dir: the dir lacks `_SUCCESS`; the
  *    manifest still points at the previous complete version.
  *  - crash between manifest delete and manifest rename: recovery scans for
  *    the highest version dir containing `_SUCCESS` — which is the version
  *    just written — so the merge result survives. Combined with the
  *    checkpointed source and the deterministic latest-wins merge, a
  *    replayed micro-batch re-merges idempotently (exactly-once state).
  *
  * Scale notes: version dirs are the simple format-agnostic strategy; on
  * object stores a transactional table format (v2 `MERGE INTO` target) is
  * the production path and the merge planning here carries over unchanged.
  * Writer parallelism is bounded by `IngestConfig.maxWriterPartitions`,
  * the analog of the reference's DB-connection cap
  * (`max_con_count`, quick_stream `src/builder.rs:14-33`).
  */
final class ParquetTarget(spark: SparkSession, val table: TargetTable) {

  private val root = new Path(table.path)
  private val manifest = new Path(root, "_LATEST")
  private val manifestTmp = new Path(root, "_LATEST.tmp")

  private def fs: FileSystem =
    root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versionOf(name: String): Long =
    if (name.length == 11 && name.startsWith("v") && name.drop(1).forall(_.isDigit))
      name.drop(1).toLong
    else -1L

  private def dirName(v: Long): String = f"v$v%010d"

  private def isComplete(name: String): Boolean =
    fs.exists(new Path(new Path(root, name), "_SUCCESS"))

  /** The current version: what the manifest names if that dir is complete,
    * else (recovery) the highest complete version dir on disk. */
  private def currentVersion(): Option[Long] = {
    if (!fs.exists(root)) return None
    val pointed =
      if (fs.exists(manifest)) {
        val in = fs.open(manifest)
        val name =
          try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
            StandardCharsets.UTF_8).trim
          finally in.close()
        Some(name).filter(n => versionOf(n) >= 0 && isComplete(n)).map(versionOf)
      } else None
    pointed.orElse {
      // Manifest missing or stale: a crash hit the repoint window. The
      // highest complete version is the most recent committed merge.
      val vs = fs.listStatus(root).toSeq
        .map(_.getPath.getName)
        .filter(n => versionOf(n) >= 0 && isComplete(n))
        .map(versionOf)
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  def exists: Boolean = currentVersion().isDefined

  /** Resolved path of the current snapshot, if any. */
  def currentPath: Option[String] =
    currentVersion().map(v => new Path(root, dirName(v)).toString)

  def read(): Option[DataFrame] = currentPath.map(spark.read.parquet(_))

  /** Latest-wins merge of one micro-batch into the target — the analog of
    * the sender task executing `INSERT … ON CONFLICT DO UPDATE`
    * (quick_stream `src/upsert.rs:283-295`). Idempotent: replaying the same
    * batch yields the same table (deterministic latest-wins), which is the
    * exactly-once story the reference lacks (SURVEY.md §7 "what's hard"). */
  def mergeUpsert(batch: DataFrame, config: IngestConfig): Unit = {
    val merged = read() match {
      case Some(current) =>
        Merge.upsertBroadcast(current, batch,
          table.keyCols, table.versionCol, table.tieBreakCols,
          defaults = Map(table.softDeleteCol -> lit(true)))
      case None =>
        Dedup.latestWins(batch, table.keyCols, table.versionCol, table.tieBreakCols)
    }
    commit(merged, config)
  }

  /** Soft delete a batch of tombstones (sets `table.softDeleteCol` false). */
  def mergeSoftDelete(batch: DataFrame, config: IngestConfig): Unit =
    read().foreach { current =>
      commit(Merge.softDelete(current, batch, table.keyCols, table.versionCol,
        table.tieBreakCols, table.softDeleteCol), config)
    }

  /** Hard delete a batch of tombstones (drops the rows). */
  def mergeHardDelete(batch: DataFrame, config: IngestConfig): Unit =
    read().foreach { current =>
      commit(Merge.hardDelete(current, batch, table.keyCols, table.versionCol,
        table.tieBreakCols), config)
    }

  /** Write `df` as the next version dir, repoint the manifest, then drop
    * superseded versions. The write fully materializes before any existing
    * state is touched (we may be reading the version we're replacing). */
  private def commit(df: DataFrame, config: IngestConfig): Unit = {
    val next = currentVersion().getOrElse(0L) + 1L
    val dest = new Path(root, dirName(next))
    df.repartition(config.maxWriterPartitions)
      .write.mode("overwrite").parquet(dest.toString)

    // Atomic repoint: write tmp, swap in. If we die between delete and
    // rename, recovery (currentVersion) resolves to `next` anyway because
    // it is now the highest complete version.
    val out = fs.create(manifestTmp, true)
    try out.write(dirName(next).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(manifest)) fs.delete(manifest, false)
    fs.rename(manifestTmp, manifest)

    // GC: everything below the committed version is unreachable.
    fs.listStatus(root).toSeq.map(_.getPath).foreach { p =>
      val v = versionOf(p.getName)
      if (v >= 0 && v < next) fs.delete(p, true)
    }
  }
}
