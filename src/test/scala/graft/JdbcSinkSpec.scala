package graft

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.engine.{QuickStreamBuilder, UpsertStream}
import graft.model.IngestConfig
import graft.ops.Dedup
import graft.sink.{JdbcDialect, JdbcSink, JdbcTarget}

/** The JDBC sink against embedded Derby — the testable stand-in for the
  * reference's Postgres target. Semantics must equal Merge's (same guards),
  * and the generated Postgres statement must be the reference's canonical
  * `INSERT … ON CONFLICT (pk) DO UPDATE` shape. */
class JdbcSinkSpec extends SparkSpec {

  import spark.implicits._

  private val cfg = IngestConfig(name = "jdbc-spec", maxWriterPartitions = 2)

  private def freshDb(ddl: String): String = {
    val url = s"jdbc:derby:memory:spec${System.nanoTime()};create=true"
    val conn = DriverManager.getConnection(url)
    try { conn.createStatement().executeUpdate(ddl); () } finally conn.close()
    url
  }

  private def stateDdl(extra: String = "") =
    "CREATE TABLE st (pkey BIGINT NOT NULL PRIMARY KEY, ver BIGINT, " +
      s"seq BIGINT, payload VARCHAR(64)$extra)"

  private def target(url: String) = JdbcTarget(url, "st",
    keyCols = Seq("pkey"), versionCol = "ver", tieBreakCols = Seq("seq"))

  private def readState(url: String) =
    spark.read.jdbc(url, "st", new java.util.Properties())

  test("upsert: insert, guarded update, stale skip, tie goes to incoming") {
    val url = freshDb(stateDdl())
    val sink = new JdbcSink(target(url))
    sink.mergeUpsert(Seq(
      Ev(1, 10, 1, "a0"), Ev(2, 20, 2, "b0")).toDF(), cfg)
    sink.mergeUpsert(Seq(
      Ev(1, 12, 3, "a1"),      // newer version -> update
      Ev(2, 19, 4, "stale"),   // older -> skipped
      Ev(3, 1, 5, "c0")).toDF(), cfg) // new key -> insert
    val got = readState(url).collect()
      .map(r => r.getAs[Long]("PKEY") -> r.getAs[String]("PAYLOAD")).toMap
    assert(got == Map(1L -> "a1", 2L -> "b0", 3L -> "c0"))
  }

  test("upsert tie on (ver, seq): incoming wins exact ties like ON CONFLICT") {
    val url = freshDb(stateDdl())
    val sink = new JdbcSink(target(url))
    sink.mergeUpsert(Seq(Ev(1, 10, 1, "old")).toDF(), cfg)
    sink.mergeUpsert(Seq(Ev(1, 10, 1, "retry")).toDF(), cfg)
    val got = readState(url).collect().map(_.getAs[String]("PAYLOAD")).toSeq
    assert(got == Seq("retry"))
  }

  test("intra-batch dedup: one write per key, latest wins") {
    val url = freshDb(stateDdl())
    val sink = new JdbcSink(target(url))
    val batch = Seq(
      Ev(1, 5, 1, "x1"), Ev(1, 9, 2, "x2"), Ev(2, 3, 3, "y1"),
      Ev(2, 2, 4, "stale"), Ev(1, 9, 6, "tie-hi"))
    sink.mergeUpsert(batch.toDF(), cfg)
    val expected = Dedup.latestWins(batch.toDF(), Seq("pkey"), "ver", Seq("seq"))
      .collect().map(r => r.getAs[Long]("pkey") -> r.getAs[String]("payload")).toMap
    val got = readState(url).collect()
      .map(r => r.getAs[Long]("PKEY") -> r.getAs[String]("PAYLOAD")).toMap
    assert(got == expected)
  }

  test("soft delete flips the flag only for tombstones at least as new") {
    val url = freshDb(stateDdl(", row_active BOOLEAN DEFAULT TRUE NOT NULL"))
    val sink = new JdbcSink(target(url))
    sink.mergeUpsert(Seq(Ev(1, 10, 1, "a"), Ev(2, 20, 2, "b")).toDF(), cfg)
    sink.mergeSoftDelete(Seq(
      (1L, 10L, 1L),  // equal ordering -> deletes
      (2L, 19L, 9L)   // stale tombstone -> must NOT delete
    ).toDF("pkey", "ver", "seq"), cfg)
    val got = readState(url).collect()
      .map(r => r.getAs[Long]("PKEY") -> r.getAs[Boolean]("ROW_ACTIVE")).toMap
    assert(got == Map(1L -> false, 2L -> true))
  }

  test("a newer upsert resurrects a soft-deleted row (Merge parity)") {
    val url = freshDb(stateDdl(", row_active BOOLEAN DEFAULT TRUE NOT NULL"))
    val sink = new JdbcSink(target(url).copy(hasSoftDelete = true))
    sink.mergeUpsert(Seq(Ev(1, 10, 1, "a")).toDF(), cfg)
    sink.mergeSoftDelete(Seq((1L, 11L, 2L)).toDF("pkey", "ver", "seq"), cfg)
    def active = readState(url).collect()
      .map(r => r.getAs[Long]("PKEY") ->
        ((r.getAs[Boolean]("ROW_ACTIVE"), r.getAs[String]("PAYLOAD")))).toMap
    assert(active(1L) == ((false, "a")))
    // a stale upsert (older than the stored row) must NOT resurrect
    sink.mergeUpsert(Seq(Ev(1, 5, 0, "stale")).toDF(), cfg)
    assert(active(1L) == ((false, "a")))
    // a winning upsert flips the flag back on, like Merge's defaults
    sink.mergeUpsert(Seq(Ev(1, 12, 3, "a2")).toDF(), cfg)
    assert(active(1L) == ((true, "a2")))
  }

  test("hard delete removes only rows with a tombstone at least as new") {
    val url = freshDb(stateDdl())
    val sink = new JdbcSink(target(url))
    sink.mergeUpsert(Seq(Ev(1, 10, 1, "a"), Ev(2, 20, 2, "b")).toDF(), cfg)
    sink.mergeHardDelete(Seq(
      (1L, 11L, 1L), (2L, 19L, 9L)).toDF("pkey", "ver", "seq"), cfg)
    val got = readState(url).collect().map(_.getAs[Long]("PKEY")).toSeq
    assert(got == Seq(2L))
  }

  test("Postgres dialect emits the canonical guarded ON CONFLICT statement") {
    val phases = JdbcDialect.Postgres.upsertPhases(
      target("jdbc:postgresql://example/db"),
      Seq("pkey", "ver", "seq", "payload"))
    assert(phases.map(_.sql) == Seq(
      "INSERT INTO st (pkey, ver, seq, payload) VALUES (?, ?, ?, ?) " +
        "ON CONFLICT (pkey) DO UPDATE SET ver = EXCLUDED.ver, " +
        "seq = EXCLUDED.seq, payload = EXCLUDED.payload " +
        "WHERE (st.ver < EXCLUDED.ver OR (st.ver = EXCLUDED.ver AND " +
        "st.seq <= EXCLUDED.seq))"))
    assert(phases.head.binds == Seq("pkey", "ver", "seq", "payload"))
  }

  test("UpsertStream drives micro-batches into the JDBC sink end-to-end") {
    implicit val sql = spark.sqlContext
    val url = freshDb(stateDdl())
    val events = MemoryStream[Ev]
    val ckpt = Files.createTempDirectory("graft_jdbc_ckpt_").toString
    val q = new QuickStreamBuilder(spark)
      .withName(s"jdbc-e2e-${System.nanoTime()}")
      .withMaxConCount(2)
      .withMaxRecordsPerCycleBatch(1000)
      .withCheckpointDir(ckpt)
      .withDbConfig(target(url))
      .withDbDialect(JdbcDialect.Derby)
      .buildJdbcUpsert()
      .run(events.toDF())
    events.addData(Ev(1, 10, 1, "a0"), Ev(2, 20, 2, "b0"), Ev(1, 12, 3, "a1"))
    q.processAllAvailable()
    events.addData(Ev(1, 11, 4, "late-stale"), Ev(2, 25, 5, "b1"), Ev(3, 1, 6, "c0"))
    q.processAllAvailable()
    q.stop()
    val got = readState(url).collect()
      .map(r => r.getAs[Long]("PKEY") -> r.getAs[String]("PAYLOAD")).toMap
    assert(got == Map(1L -> "a1", 2L -> "b1", 3L -> "c0"))
  }

  test("replayed micro-batch is idempotent: same state after a duplicate merge") {
    // Checkpoint replay re-delivers a whole batch; the guarded
    // update+insert must converge to the same state, not double-apply.
    val url = freshDb(stateDdl())
    val sink = new JdbcSink(target(url))
    val batch = Seq(Ev(1, 10, 1, "a"), Ev(2, 20, 2, "b"))
    sink.mergeUpsert(batch.toDF(), cfg)
    val first = readState(url).collect().map(_.toString).sorted.toSeq
    sink.mergeUpsert(batch.toDF(), cfg) // replay
    val second = readState(url).collect().map(_.toString).sorted.toSeq
    assert(first == second)
    assert(first.size == 2)
  }

  test("multi-table fan-out routes micro-batches to two Derby tables") {
    // Mirrors the reference's two-table integration test shape
    // (quick_stream src/upsert/multi_table_upsert.rs:710-816): one stream,
    // a routing column, per-table latest-wins state.
    implicit val sql = spark.sqlContext
    val url = s"jdbc:derby:memory:spec${System.nanoTime()};create=true"
    val conn = DriverManager.getConnection(url)
    try {
      Seq("ta", "tb").foreach { tn =>
        conn.createStatement().executeUpdate(
          s"CREATE TABLE $tn (pkey BIGINT NOT NULL PRIMARY KEY, ver BIGINT, " +
            "seq BIGINT, payload VARCHAR(64))")
      }
    } finally conn.close()
    def jt(tn: String) = JdbcTarget(url, tn,
      keyCols = Seq("pkey"), versionCol = "ver", tieBreakCols = Seq("seq"))
    val events = MemoryStream[(String, Long, Long, Long, String)]
    val ckpt = Files.createTempDirectory("graft_jdbc_multi_").toString
    val q = new QuickStreamBuilder(spark)
      .withName(s"jdbc-multi-${System.nanoTime()}")
      .withMaxConCount(2)
      .withMaxRecordsPerCycleBatch(1000)
      .withCheckpointDir(ckpt)
      .withJdbcCatalog(Map("a" -> jt("ta"), "b" -> jt("tb")))
      .withDbDialect(JdbcDialect.Derby)
      .withTableColumn("route")
      .buildMultiTableJdbcUpsert()
      .run(events.toDF().toDF("route", "pkey", "ver", "seq", "payload"))
    events.addData(
      ("a", 1L, 10L, 1L, "a-old"), ("b", 1L, 30L, 2L, "b-1"),
      ("a", 1L, 20L, 3L, "a-new"), ("unknown", 9L, 1L, 4L, "dropped"))
    q.processAllAvailable()
    q.stop()
    val ta = spark.read.jdbc(url, "ta", new java.util.Properties()).collect()
      .map(r => r.getAs[Long]("PKEY") -> r.getAs[String]("PAYLOAD")).toMap
    val tb = spark.read.jdbc(url, "tb", new java.util.Properties()).collect()
      .map(r => r.getAs[Long]("PKEY") -> r.getAs[String]("PAYLOAD")).toMap
    assert(ta == Map(1L -> "a-new")) // same key, higher ver wins within route a
    assert(tb == Map(1L -> "b-1"))   // same pkey in route b is independent
  }

  test("8 concurrent writer partitions ingest disjoint keys without deadlock") {
    val url = freshDb(stateDdl())
    val sink = new JdbcSink(target(url))
    val wide = IngestConfig(name = "jdbc-wide", maxWriterPartitions = 8)
    val rows = (0L until 2000L).map(k => Ev(k, 1L, k, s"p$k"))
    sink.mergeUpsert(rows.toDF(), wide)
    val n = readState(url).count()
    assert(n == 2000L)
    // second round updates all keys concurrently (pure update path)
    sink.mergeUpsert(rows.map(e => e.copy(ver = 2L, payload = "v2")).toDF(), wide)
    val v2 = readState(url).where("PAYLOAD = 'v2'").count()
    assert(v2 == 2000L)
  }

  test("probe fails fast on an unreachable database") {
    val sink = new JdbcSink(JdbcTarget("jdbc:derby:memory:absent_db",
      "st", keyCols = Seq("pkey"), versionCol = "ver"))
    intercept[java.sql.SQLException] { sink.probe() }
  }

  test("TLS contract (reference src/upsert.rs:213-244): EVERY ssl-" +
      "relevant Postgres property passes VERBATIM into the driver's " +
      "Properties and the URL is untouched — pinned via a capturing " +
      "mock java.sql.Driver so the first live TLS run has a contract") {
    val captured = new java.util.concurrent.atomic.AtomicReference[
      (String, java.util.Properties)]()
    val drv = new java.sql.Driver {
      override def acceptsURL(u: String): Boolean =
        u.startsWith("jdbc:graftmock:")
      override def connect(
          u: String, p: java.util.Properties): java.sql.Connection =
        if (!acceptsURL(u)) null
        else {
          captured.set((u, p))
          throw new java.sql.SQLException("mock: captured handshake")
        }
      override def getMajorVersion: Int = 1
      override def getMinorVersion: Int = 0
      override def getParentLogger: java.util.logging.Logger =
        throw new java.sql.SQLFeatureNotSupportedException()
      override def getPropertyInfo(u: String, p: java.util.Properties)
          : Array[java.sql.DriverPropertyInfo] = Array.empty
      override def jdbcCompliant(): Boolean = false
    }
    java.sql.DriverManager.registerDriver(drv)
    try {
      // the full PgJDBC TLS surface the reference's native-TLS connector
      // maps onto: mode, root CA, client cert/key (+ key passphrase),
      // custom factory and hostname verifier, plus credentials
      val tls = Map(
        "user" -> "svc", "password" -> "pw",
        "ssl" -> "true", "sslmode" -> "verify-full",
        "sslrootcert" -> "/etc/certs/root.crt",
        "sslcert" -> "/etc/certs/client.crt",
        "sslkey" -> "/etc/certs/client.pk8",
        "sslpassword" -> "keypw",
        "sslfactory" -> "org.postgresql.ssl.DefaultJavaSSLFactory",
        "sslhostnameverifier" -> "org.postgresql.ssl.PGjdbcHostnameVerifier")
      val url = "jdbc:graftmock://db.example:5432/app"
      val sink = new JdbcSink(JdbcTarget(url, "st",
        keyCols = Seq("pkey"), versionCol = "ver", properties = tls))
      intercept[java.sql.SQLException] { sink.probe() }
      val (gotUrl, gotProps) = captured.get()
      assert(gotUrl == url, "connection string must pass through unchanged")
      tls.foreach { case (k, v) =>
        assert(gotProps.getProperty(k) == v, s"property $k must pass verbatim")
      }
      assert(gotProps.stringPropertyNames().size == tls.size,
        "no extra properties invented by the sink")
    } finally java.sql.DriverManager.deregisterDriver(drv)
  }
}
