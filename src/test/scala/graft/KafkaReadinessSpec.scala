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
