package graft.sink

import java.sql.{Connection, DriverManager}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.model.IngestConfig
import graft.ops.Dedup

/** A real database merge target — the reference's ACTUAL destination: a
  * Postgres table written through prepared upsert/delete statements over a
  * capped connection pool (quick_stream connection establishment
  * `src/upsert.rs:209-269`, prepared-once-per-sender statements
  * `src/upsert.rs:279`, executor loop `src/upsert.rs:283-295`, per-row
  * binding `src/upsert/multi_table_upsert.rs:603-626`).
  *
  * Spark-first restatement of that pool:
  *  - reference sender task with its own DB connection → one
  *    `foreachPartition` task per partition, one connection per task;
  *    `repartition(maxWriterPartitions, keyCols)` caps open connections at
  *    the reference's `max_con_count` AND gives each key a single writer,
  *    so guarded update-then-insert can't race with itself.
  *  - reference 100/10/1 arity chunking (a workaround for fixed-arity
  *    prepared SQL, `src/lib.rs:49-58`) → JDBC `addBatch`/`executeBatch`
  *    in [[JdbcTarget.batchSize]] chunks on ONE prepared statement —
  *    dynamic batching makes the arity pools unnecessary.
  *  - reference latest-wins dedup before write (`src/lib.rs:12-16`) →
  *    `Dedup.latestWins` on the micro-batch; at ~constant distinct keys
  *    this shrinks a 100k-row batch to the key count before any SQL runs.
  *  - reference TLS knob (`src/upsert.rs:213-244`) → driver properties
  *    (`sslmode`, truststore options) in [[JdbcTarget.properties]].
  *
  * Merge semantics are identical to [[Merge]] (same guards, specs compare
  * the two): incoming wins when its `(versionCol, tieBreakCols...)` tuple
  * is >= the stored row's (ties go to the incoming row, matching
  * `ON CONFLICT DO UPDATE`); a stale tombstone never kills a newer row.
  */
final case class JdbcTarget(
    url: String,
    table: String,
    keyCols: Seq[String],
    versionCol: String,
    tieBreakCols: Seq[String] = Nil,
    softDeleteCol: String = "row_active",
    hasSoftDelete: Boolean = false,
    properties: Map[String, String] = Map.empty,
    batchSize: Int = 100) {
  require(url.nonEmpty, "JdbcTarget.url must not be empty")
  require(table.nonEmpty, "JdbcTarget.table must not be empty")
  require(keyCols.nonEmpty, "JdbcTarget.keyCols must not be empty")
  require(batchSize > 0, "JdbcTarget.batchSize must be > 0")
  def orderingCols: Seq[String] = versionCol +: tieBreakCols
  /** Upserts must RESURRECT soft-deleted rows (set `softDeleteCol` back
    * to TRUE when a newer upsert wins), matching Merge's defaults —
    * applies when the table declares the flag (`hasSoftDelete`) and the
    * batch doesn't carry it explicitly. */
  private[sink] def resurrectCol(batchCols: Seq[String]): Option[String] =
    if (hasSoftDelete && !batchCols.contains(softDeleteCol)) Some(softDeleteCol)
    else None
}

/** One prepared statement of a merge: SQL text plus the batch column names
  * in placeholder order (a column may repeat — lexicographic guards bind
  * the same value several times, like the reference's binding loop pushing
  * `&d.id` per placeholder). */
final case class JdbcPhase(sql: String, binds: Seq[String])

/** Vendor dialects differ only in how "insert-or-update" is spelled; the
  * guarded delete statements are ANSI everywhere. */
sealed trait JdbcDialect extends Serializable {
  def upsertPhases(t: JdbcTarget, cols: Seq[String]): Seq[JdbcPhase]
}

object JdbcDialect {

  /** `stored <= incoming` lexicographically over the ordering columns,
    * with a `?` per comparison — the latest-wins guard. */
  private[sink] def storedLe(cols: Seq[String]): (String, Seq[String]) =
    cols match {
      case Seq(c) => (s"$c <= ?", Seq(c))
      case c +: rest =>
        val (restSql, restBinds) = storedLe(rest)
        (s"($c < ? OR ($c = ? AND $restSql))", Seq(c, c) ++ restBinds)
    }

  /** Same guard with `EXCLUDED.col` references instead of placeholders
    * (Postgres `ON CONFLICT` conditional update). */
  private def storedLeExcluded(table: String, cols: Seq[String]): String =
    cols match {
      case Seq(c) => s"$table.$c <= EXCLUDED.$c"
      case c +: rest =>
        s"($table.$c < EXCLUDED.$c OR ($table.$c = EXCLUDED.$c AND " +
          s"${storedLeExcluded(table, rest)}))"
    }

  private[sink] def keyEq(keys: Seq[String]): (String, Seq[String]) =
    (keys.map(k => s"$k = ?").mkString(" AND "), keys)

  /** The canonical Postgres statement — the exact shape the reference
    * prepares per sender (`INSERT … ON CONFLICT (pk) DO UPDATE SET …`,
    * example SQL at quick_stream `src/upsert/multi_table_upsert.rs:651`),
    * plus the version guard the reference leaves to arrival order. One
    * round trip per batch, one bind per column. */
  case object Postgres extends JdbcDialect {
    override def upsertPhases(t: JdbcTarget, cols: Seq[String]): Seq[JdbcPhase] = {
      val nonKey = cols.diff(t.keyCols)
      val sets = nonKey.map(c => s"$c = EXCLUDED.$c") ++
        t.resurrectCol(cols).map(c => s"$c = TRUE")
      val sql =
        s"INSERT INTO ${t.table} (${cols.mkString(", ")}) " +
          s"VALUES (${cols.map(_ => "?").mkString(", ")}) " +
          s"ON CONFLICT (${t.keyCols.mkString(", ")}) DO UPDATE SET " +
          sets.mkString(", ") +
          s" WHERE ${storedLeExcluded(t.table, t.orderingCols)}"
      Seq(JdbcPhase(sql, cols))
    }
  }

  /** Portable two-phase upsert for engines without `ON CONFLICT`: a
    * guarded UPDATE, then INSERT-where-absent. Keys are deduped and
    * partition-pinned upstream, so the two phases cannot race. `dual` is
    * the vendor's one-row table for FROM-less selects (Derby/DB2:
    * `SYSIBM.SYSDUMMY1`; engines allowing bare SELECT: None). */
  final case class TwoPhase(dual: Option[String]) extends JdbcDialect {
    override def upsertPhases(t: JdbcTarget, cols: Seq[String]): Seq[JdbcPhase] = {
      val nonKey = cols.diff(t.keyCols)
      val (guard, guardBinds) = storedLe(t.orderingCols)
      val (kEq, kBinds) = keyEq(t.keyCols)
      val sets = nonKey.map(c => s"$c = ?") ++
        t.resurrectCol(cols).map(c => s"$c = TRUE")
      val update = JdbcPhase(
        s"UPDATE ${t.table} SET ${sets.mkString(", ")} " +
          s"WHERE $kEq AND $guard",
        nonKey ++ kBinds ++ guardBinds)
      val from = dual.map(d => s" FROM $d").getOrElse("")
      val insert = JdbcPhase(
        s"INSERT INTO ${t.table} (${cols.mkString(", ")}) " +
          s"SELECT ${cols.map(_ => "?").mkString(", ")}$from " +
          s"WHERE NOT EXISTS (SELECT 1 FROM ${t.table} WHERE " +
          t.keyCols.map(k => s"$k = ?").mkString(" AND ") + ")",
        cols ++ t.keyCols)
      Seq(update, insert)
    }
  }

  val Derby: TwoPhase = TwoPhase(Some("SYSIBM.SYSDUMMY1"))
}

final class JdbcSink(target: JdbcTarget, dialect: JdbcDialect = JdbcDialect.Derby)
    extends MergeSink {

  /** Fail-fast connection probe at stream start (reference
    * `src/upsert.rs:80-83`: create + drop a client before looping). */
  def probe(): Unit = JdbcExec.withConnection(target)(_ => ())

  override def mergeUpsert(batch: DataFrame, config: IngestConfig): Unit =
    execute(batch, config, dialect.upsertPhases(target, batch.columns.toSeq))

  override def mergeSoftDelete(batch: DataFrame, config: IngestConfig): Unit = {
    val (guard, guardBinds) = JdbcDialect.storedLe(target.orderingCols)
    val (kEq, kBinds) = JdbcDialect.keyEq(target.keyCols)
    execute(batch, config, Seq(JdbcPhase(
      s"UPDATE ${target.table} SET ${target.softDeleteCol} = FALSE " +
        s"WHERE $kEq AND $guard",
      kBinds ++ guardBinds)))
  }

  override def mergeHardDelete(batch: DataFrame, config: IngestConfig): Unit = {
    val (guard, guardBinds) = JdbcDialect.storedLe(target.orderingCols)
    val (kEq, kBinds) = JdbcDialect.keyEq(target.keyCols)
    execute(batch, config, Seq(JdbcPhase(
      s"DELETE FROM ${target.table} WHERE $kEq AND $guard",
      kBinds ++ guardBinds)))
  }

  /** Dedup latest-wins, pin each key to one writer partition (connection
    * count = partition count <= maxWriterPartitions = the reference's
    * `max_con_count`), then run the phases per partition. */
  private def execute(
      batch: DataFrame, config: IngestConfig, phases: Seq[JdbcPhase]): Unit = {
    val deduped = Dedup.latestWins(
      batch, target.keyCols, target.versionCol, target.tieBreakCols)
    val placed = deduped.repartition(
      config.maxWriterPartitions,
      target.keyCols.map(deduped.col): _*)
    val schema = placed.schema
    val t = target
    val ph = phases
    placed.foreachPartition { (rows: Iterator[Row]) =>
      JdbcExec.runPhases(t, ph, schema, rows)
    }
  }
}

/** Executor-side JDBC plumbing (kept in an object so the closure captures
  * only serializable config). */
private[sink] object JdbcExec {

  def withConnection[A](t: JdbcTarget)(f: Connection => A): A = {
    // Explicit TLS establishment before the driver sees the endpoint —
    // the reference's TlsConnector construction (src/upsert.rs:213-244)
    // made executable: a real JSSE handshake per connection attempt when
    // `graft.tls.preflight=true`. Engine-owned graft.tls.* keys never
    // reach the driver.
    TlsPreflight.preflight(t.properties)
    val props = new Properties()
    TlsPreflight.driverProperties(t.properties)
      .foreach { case (k, v) => props.setProperty(k, v) }
    val conn = DriverManager.getConnection(t.url, props)
    try f(conn) finally conn.close()
  }

  private def sqlType(dt: DataType): Int = dt match {
    case LongType => java.sql.Types.BIGINT
    case IntegerType => java.sql.Types.INTEGER
    case ShortType => java.sql.Types.SMALLINT
    case DoubleType => java.sql.Types.DOUBLE
    case FloatType => java.sql.Types.FLOAT
    case BooleanType => java.sql.Types.BOOLEAN
    case StringType => java.sql.Types.VARCHAR
    case TimestampType => java.sql.Types.TIMESTAMP
    case DateType => java.sql.Types.DATE
    case _: DecimalType => java.sql.Types.DECIMAL
    case BinaryType => java.sql.Types.BINARY
    case other =>
      throw new IllegalArgumentException(s"unsupported JDBC column type: $other")
  }

  /** One partition's work: one connection, statements prepared once
    * (reference: per-sender prepare, `src/upsert.rs:279`), rows bound and
    * executed in `batchSize` chunks, committed per chunk. Keys are unique
    * within the partition (global dedup + key repartition), so phase
    * ordering within a chunk is the only ordering that matters. */
  def runPhases(
      t: JdbcTarget,
      phases: Seq[JdbcPhase],
      schema: StructType,
      rows: Iterator[Row]): Unit = {
    if (!rows.hasNext) return
    withConnection(t) { conn =>
      conn.setAutoCommit(false)
      val idx = schema.fieldNames.zipWithIndex.toMap
      val types = schema.fields.map(f => f.name -> sqlType(f.dataType)).toMap
      val stmts = phases.map(p => p -> conn.prepareStatement(p.sql))
      try {
        rows.grouped(t.batchSize).foreach { chunk =>
          stmts.foreach { case (phase, st) =>
            chunk.foreach { row =>
              phase.binds.zipWithIndex.foreach { case (c, i) =>
                val v = row.get(idx(c))
                if (v == null) st.setNull(i + 1, types(c))
                else st.setObject(i + 1, v)
              }
              st.addBatch()
            }
            st.executeBatch()
            ()
          }
          conn.commit()
        }
      } finally stmts.foreach(_._2.close())
    }
  }
}
