package graft

import java.io.FileInputStream
import java.nio.file.{Files, Path}
import java.security.KeyStore
import java.sql.DriverManager

import javax.net.ssl.{KeyManagerFactory, SSLContext, SSLServerSocket, SSLSocket}

import scala.sys.process.Process

import graft.model.IngestConfig
import graft.sink.{JdbcSink, JdbcTarget, TlsPreflight}

/** A LIVE TLS handshake through the JDBC sink path — the executable form
  * of the reference's native-TLS connector construction (quick_stream
  * `src/upsert.rs:213-244`). Until round 11 the TLS story was a pinned
  * property-passthrough contract (JdbcSinkSpec) driven only over
  * plaintext embedded Derby, because no TLS-capable JDBC *server* ships
  * in this environment. The preflight closes that gap with what the
  * environment DOES allow: an in-JVM `SSLServerSocket` keyed by a
  * self-signed cert (keytool-generated per run), against which
  * [[TlsPreflight]] performs a real JSSE handshake — trust verification,
  * protocol negotiation, failure on a wrong trust anchor — wired into
  * every `JdbcExec.withConnection`, i.e. the exact code path every
  * merge partition takes. */
class TlsHandshakeSpec extends SparkSpec {

  import spark.implicits._

  private val storePass = "changeit"

  /** keytool-generate a PKCS12 keystore (self-signed RSA cert) and the
    * matching single-cert truststore. */
  private def genStores(dir: Path, name: String): (Path, Path) = {
    val ks = dir.resolve(s"$name.p12")
    val cert = dir.resolve(s"$name.cer")
    val ts = dir.resolve(s"$name-trust.p12")
    def run(args: Seq[String]): Unit = {
      val rc = Process(args).!
      assert(rc == 0, s"keytool failed (${args.take(2).mkString(" ")})")
    }
    run(Seq("keytool", "-genkeypair", "-alias", "srv", "-keyalg", "RSA",
      "-keysize", "2048", "-dname", s"CN=$name", "-validity", "1",
      "-storetype", "PKCS12", "-keystore", ks.toString,
      "-storepass", storePass, "-keypass", storePass))
    run(Seq("keytool", "-exportcert", "-alias", "srv",
      "-keystore", ks.toString, "-storepass", storePass,
      "-file", cert.toString))
    run(Seq("keytool", "-importcert", "-noprompt", "-alias", "srv",
      "-storetype", "PKCS12", "-keystore", ts.toString,
      "-storepass", storePass, "-file", cert.toString))
    (ks, ts)
  }

  /** TLS server on an ephemeral port: accept loop on a daemon thread,
    * server-side handshake per client, failures swallowed so a rejected
    * client never kills the listener. */
  private def startTlsServer(keystore: Path): (Int, java.io.Closeable) = {
    val ks = KeyStore.getInstance("PKCS12")
    val in = new FileInputStream(keystore.toFile)
    try ks.load(in, storePass.toCharArray) finally in.close()
    val kmf = KeyManagerFactory.getInstance(
      KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, storePass.toCharArray)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    val server = ctx.getServerSocketFactory.createServerSocket(0)
      .asInstanceOf[SSLServerSocket]
    val t = new Thread(() => {
      try while (true) {
        val s = server.accept().asInstanceOf[SSLSocket]
        try s.startHandshake()
        catch { case _: Exception => () }
        finally s.close()
      } catch { case _: Exception => () } // server closed
    }, "tls-spec-server")
    t.setDaemon(true)
    t.start()
    (server.getLocalPort, server)
  }

  test("a real handshake negotiates TLS against the matching trust " +
      "anchor and REJECTS a wrong one") {
    val dir = Files.createTempDirectory("graft_tls_")
    val (ks, ts) = genStores(dir, "goodhost")
    val (_, wrongTs) = genStores(dir, "otherhost") // different self-signed CA
    val (port, server) = startTlsServer(ks)
    try {
      val (protocol, cipher) =
        TlsPreflight.handshake("localhost", port, Some(ts.toString),
          Some(storePass))
      assert(protocol.startsWith("TLS"), s"negotiated $protocol")
      assert(cipher.nonEmpty)
      val e = intercept[javax.net.ssl.SSLException] {
        TlsPreflight.handshake("localhost", port, Some(wrongTs.toString),
          Some(storePass))
      }
      assert(e.getMessage.contains("TLS preflight"))
    } finally server.close()
  }

  test("JdbcSink runs the preflight on its real connection path: merge " +
      "succeeds with the right truststore, fails loudly with the wrong " +
      "one, and graft.tls.* keys never reach the driver") {
    val dir = Files.createTempDirectory("graft_tls_sink_")
    val (ks, ts) = genStores(dir, "dbhost")
    val (_, wrongTs) = genStores(dir, "nothost")
    val (port, server) = startTlsServer(ks)
    val url = s"jdbc:derby:memory:tls${System.nanoTime()};create=true"
    val conn = DriverManager.getConnection(url)
    try conn.createStatement().executeUpdate(
      "CREATE TABLE st (pkey BIGINT NOT NULL PRIMARY KEY, ver BIGINT, " +
        "seq BIGINT, payload VARCHAR(64))")
    finally conn.close()
    def props(trust: Path) = Map(
      TlsPreflight.PreflightKey -> "true",
      TlsPreflight.HostKey -> "localhost",
      TlsPreflight.PortKey -> port.toString,
      TlsPreflight.TruststoreKey -> trust.toString,
      TlsPreflight.TruststorePasswordKey -> storePass)
    try {
      // engine-owned keys are consumed, not forwarded
      assert(TlsPreflight.driverProperties(props(ts)).isEmpty)

      val good = new JdbcSink(JdbcTarget(url, "st",
        keyCols = Seq("pkey"), versionCol = "ver",
        tieBreakCols = Seq("seq"), properties = props(ts)))
      val cfg = IngestConfig(name = "tls-spec", maxWriterPartitions = 2)
      good.mergeUpsert(
        Seq((1L, 10L, 1L, "a"), (2L, 20L, 2L, "b"))
          .toDF("pkey", "ver", "seq", "payload"), cfg)
      val state = spark.read.jdbc(url, "st", new java.util.Properties())
        .collect().map(r => r.getAs[Long]("PKEY") ->
          r.getAs[String]("PAYLOAD")).toMap // Derby uppercases identifiers
      assert(state == Map(1L -> "a", 2L -> "b"),
        "merge must land after a successful preflight")

      val bad = new JdbcSink(JdbcTarget(url, "st",
        keyCols = Seq("pkey"), versionCol = "ver",
        tieBreakCols = Seq("seq"), properties = props(wrongTs)))
      val e = intercept[Exception] { bad.probe() }
      def chain(t: Throwable): Seq[Throwable] =
        Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
      assert(chain(e).exists(_.isInstanceOf[javax.net.ssl.SSLException]),
        s"expected an SSL failure, got $e")
    } finally server.close()
  }
}
