package graft

import org.apache.spark.sql.functions._

import graft.engine.Sources
import graft.model.IngestConfig

/** The first-real-broker checklist for `Sources.kafka`, runnable in the
  * broker-free sandbox: the option CONTRACT is a pure function
  * (`kafkaOptions`), its admission bound is the same number the
  * spec-checked `rate-micro-batch` twin enforces per trigger, and the
  * environment block is pinned as the EXPECTED failure mode (a missing
  * connector must fail loud at source resolution, not half-start). The
  * end-to-end soak against a real broker remains env-blocked and is
  * documented on `Sources.kafka` itself. */
class KafkaReadinessSpec extends SparkSpec {

  private val cfg =
    IngestConfig(name = "kafka-ready", maxRecordsPerTrigger = 1234L)

  test("option contract: engine owns the three core keys, admission " +
      "maps maxRecordsPerTrigger onto maxOffsetsPerTrigger, TLS/auth " +
      "options pass through") {
    val opts = Sources.kafkaOptions(cfg, "broker-a:9093,broker-b:9093",
      "events.topic", Map(
        "kafka.security.protocol" -> "SSL",
        "kafka.ssl.truststore.location" -> "/etc/tls/trust.jks",
        "startingOffsets" -> "earliest",
        // a hostile/buggy caller must NOT clobber engine-owned keys
        "maxOffsetsPerTrigger" -> "999999999",
        "subscribe" -> "other.topic"))
    assert(opts("kafka.bootstrap.servers") == "broker-a:9093,broker-b:9093")
    assert(opts("subscribe") == "events.topic")
    assert(opts("maxOffsetsPerTrigger") == "1234")
    assert(opts("kafka.security.protocol") == "SSL")
    assert(opts("kafka.ssl.truststore.location") == "/etc/tls/trust.jks")
    assert(opts("startingOffsets") == "earliest")
  }

  test("admission equivalence: the rate-micro-batch twin admits exactly " +
      "the same per-trigger bound the kafka options request") {
    val small = cfg.copy(maxRecordsPerTrigger = 7L)
    assert(Sources.kafkaOptions(small, "b:9092", "t")("maxOffsetsPerTrigger")
      == "7")
    val src = Sources.rateMicroBatch(spark, small)
    val sinkDir = java.nio.file.Files
      .createTempDirectory("graft_kready_").toString
    val q = src.writeStream
      .format("parquet")
      .option("path", s"$sinkDir/data")
      .option("checkpointLocation", s"$sinkDir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val counts = spark.read.parquet(s"$sinkDir/data")
      .groupBy(expr("value div 7")).count()
      .select("count").collect().map(_.getLong(0))
    assert(counts.nonEmpty && counts.forall(_ <= 7L))
  }

  test("consumer-group and data-loss posture: kafka.group.id / " +
      "groupIdPrefix / failOnDataLoss / kafkaConsumer.pollTimeoutMs are " +
      "CALLER-owned and pass through verbatim; the engine owns only the " +
      "three core keys and invents no defaults for the rest") {
    val callerOwned = Map(
      "kafka.group.id" -> "graft-ingest",
      "groupIdPrefix" -> "graft-",
      "failOnDataLoss" -> "false",
      "startingOffsets" -> """{"t":{"0":1234}}""",
      "kafkaConsumer.pollTimeoutMs" -> "60000")
    val opts = Sources.kafkaOptions(cfg, "b:9092", "t", callerOwned)
    callerOwned.foreach { case (k, v) =>
      assert(opts(k) == v, s"caller option $k must pass through verbatim")
    }
    // no invented defaults: exactly core + caller options
    assert(opts.keySet == callerOwned.keySet ++
      Set("kafka.bootstrap.servers", "subscribe", "maxOffsetsPerTrigger"),
      "the engine must not inject options the caller did not ask for — " +
        "startingOffsets/failOnDataLoss defaults are the CONNECTOR's " +
        "documented ones (latest / true), not engine overrides")
  }

  test("mid-stream restart: the rate-micro-batch twin resumes from the " +
      "checkpoint with NO gaps and NO duplicates while every batch " +
      "honors the admission bound — the offset/checkpoint story a " +
      "real-broker kafka run must reproduce (its superset of the " +
      "reference, which has no restart recovery at all)") {
    val small = cfg.copy(maxRecordsPerTrigger = 5L)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_krestart_").toString
    def committedRows(): Long =
      try spark.read.parquet(s"$dir/data").count()
      catch { case _: Throwable => 0L }
    def runUntil(minRows: Long): Unit = {
      val q = Sources.rateMicroBatch(spark, small).writeStream
        .format("parquet")
        .option("path", s"$dir/data")
        .option("checkpointLocation", s"$dir/ckpt")
        .start()
      try {
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        while (System.nanoTime() < deadline && committedRows() < minRows)
          Thread.sleep(50)
        assert(committedRows() >= minRows, "stream made no progress")
      } finally { q.stop(); q.awaitTermination() }
    }
    runUntil(10L) //        >= 2 committed batches, then STOPPED mid-stream
    val firstRun = committedRows()
    runUntil(firstRun + 10L) //      resume from checkpoint, >= 2 more
    val vals = spark.read.parquet(s"$dir/data")
      .select("value").collect().map(_.getLong(0)).sorted.toSeq
    assert(vals.distinct.size == vals.size,
      "restart must not re-emit committed offsets (no duplicates)")
    assert(vals == (vals.head to vals.last),
      "restart must not skip offsets (no gaps)")
    assert(vals.head == 0L, "the stream starts at offset 0")
    val perBatch = spark.read.parquet(s"$dir/data")
      .groupBy(expr("value div 5")).count()
      .select("count").collect().map(_.getLong(0))
    assert(perBatch.forall(_ <= 5L),
      "the per-trigger admission bound holds across the restart")
  }

  test("replay determinism across a CRASHED restart: the batch whose " +
      "offsets reached the WAL but not the commit log replays with " +
      "IDENTICAL content, and committed batches never re-run — the " +
      "exactly-once precondition a real-broker run must satisfy (kafka " +
      "pins each batch's offset range in the WAL exactly like this twin; " +
      "startingOffsets only ever applies to a FRESH checkpoint, so a " +
      "restart consults the WAL, never the option)") {
    val small = cfg.copy(maxRecordsPerTrigger = 5L)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_kreplay_").toString
    val run1 = new java.util.concurrent.ConcurrentHashMap[Long, Seq[Long]]()
    val run2 = new java.util.concurrent.ConcurrentHashMap[Long, Seq[Long]]()
    def start(record: java.util.concurrent.ConcurrentHashMap[Long, Seq[Long]],
        crashAt: Option[Long]) =
      Sources.rateMicroBatch(spark, small).writeStream
        .option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch { (df: org.apache.spark.sql.Dataset[
            org.apache.spark.sql.Row], id: Long) =>
          record.put(id, df.collect().map(_.getAs[Long]("value")).sorted.toSeq)
          if (crashAt.contains(id))
            throw new RuntimeException("injected crash before offset commit")
        }
        .start()
    // Run 1: batches 0 and 1 commit; batch 2's data is SEEN (WAL written,
    // foreachBatch entered) but its commit never lands — the query dies.
    val q1 = start(run1, crashAt = Some(2L))
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }
    assert(run1.containsKey(2L), "the crash batch must have been delivered")
    // Run 2: resume from the same checkpoint; wait until the replayed
    // batch and one successor have run.
    val q2 = start(run2, crashAt = None)
    try {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (System.nanoTime() < deadline &&
          !(run2.containsKey(2L) && run2.containsKey(3L))) Thread.sleep(50)
    } finally { q2.stop(); q2.awaitTermination() }
    assert(!run2.containsKey(0L) && !run2.containsKey(1L),
      "committed batches must never re-run after a restart")
    assert(run2.get(2L) == run1.get(2L),
      "the WAL-pinned batch must replay with IDENTICAL content")
    val all = (run1.get(0L) ++ run1.get(1L) ++ run2.get(2L) ++ run2.get(3L))
    assert(all.sorted == (0L until all.size.toLong),
      "across crash + restart the delivered offsets are gap-free")
  }

  test("environment block fails loud: resolving the kafka format without " +
      "the connector jar raises at source lookup, never a half-started " +
      "stream") {
    val e = intercept[Exception] {
      Sources.kafka(spark, cfg, "localhost:9092", "t").schema
    }
    val msg = Option(e.getMessage).getOrElse("") .toLowerCase
    assert(msg.contains("kafka"),
      s"expected a source-resolution failure naming kafka, got: $msg")
  }
}
