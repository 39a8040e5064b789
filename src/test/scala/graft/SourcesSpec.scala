package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.streaming.Trigger

import graft.engine.{MetricsListener, Sources}
import graft.model.IngestConfig

/** Admission-control contract of the offset-based sources: every
  * micro-batch admits at most (here: exactly) `maxRecordsPerTrigger`
  * rows — the reference's bounded-channel backpressure (quick_stream
  * `src/upsert.rs:313`) expressed as source rate limiting. */
class SourcesSpec extends SparkSpec {

  test("rate-micro-batch source admits exactly maxRecordsPerTrigger per batch") {
    val cfg = IngestConfig(name = s"src-rate-${System.nanoTime()}",
      maxRecordsPerTrigger = 37L)
    val sizes = TrieMap.empty[Long, Long]
    val q = Sources.rateMicroBatch(spark, cfg)
      .writeStream
      .trigger(Trigger.ProcessingTime(10))
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        sizes.put(id, b.count()); ()
      }
      .start()
    try {
      val deadline = System.currentTimeMillis() + 60000
      while (sizes.size < 3 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
    } finally q.stop()
    assert(sizes.size >= 3, s"expected >=3 micro-batches, got ${sizes.size}")
    assert(sizes.values.forall(_ == 37L),
      s"every batch must admit exactly the bound; got $sizes")
  }

  test("jsonWithQuarantine routes malformed lines instead of dropping them") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_quarantine_").toString
    Files.writeString(Paths.get(s"$dir/a.json"),
      """{"pkey": 1, "ver": 10, "payload": "ok"}
        |this line is not json
        |{"pkey": 2, "ver": 20, "payload": "also ok"}
        |{"pkey": "not-a-number", "ver": 30}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("pkey", LongType), StructField("ver", LongType),
      StructField("payload", StringType)))
    val cfg = IngestConfig(name = s"src-q-${System.nanoTime()}")
    val out = Sources.jsonWithQuarantine(spark, cfg, schema, s"$dir/*.json")
    val q = out.writeStream
      .format("memory").queryName(s"quar${System.nanoTime()}")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table(q.name)
    val good = rows.where(col("_corrupt_record").isNull)
    val bad = rows.where(col("_corrupt_record").isNotNull)
    assert(good.count() == 2)
    assert(good.select("pkey").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    // both the non-JSON line and the type-mismatched record are captured verbatim
    assert(bad.count() == 2)
    assert(bad.collect().map(_.getAs[String]("_corrupt_record"))
      .exists(_.contains("not json")))
  }

  test("MetricsListener records per-batch progress queryable as a DataFrame") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val metrics = new MetricsListener()
    spark.streams.addListener(metrics)
    try {
      val events = MemoryStream[Long]
      val name = s"metrics${System.nanoTime()}"
      val q = events.toDF().writeStream
        .format("memory").queryName(name).start()
      events.addData(1L, 2L, 3L)
      q.processAllAvailable()
      events.addData(4L)
      q.processAllAvailable()
      q.stop()
      // listener events post asynchronously — poll until they land
      val deadline = System.currentTimeMillis() + 30000
      def rows() = metrics.snapshot(spark)
        .where(col("query") === name && col("numInputRows") > 0)
      while (rows().count() < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      val got = rows().collect()
        .map(r => r.getAs[Long]("batchId") -> r.getAs[Long]("numInputRows")).toMap
      assert(got.values.sum == 4, s"expected 4 input rows total, got $got")
      assert(got.size >= 2, "expected at least two non-empty batches")
    } finally spark.streams.removeListener(metrics)
  }

  test("kafka constructor reaches Spark's provider resolution (no jar here)") {
    val cfg = IngestConfig(name = "src-kafka", maxRecordsPerTrigger = 100L)
    val e = intercept[Exception] {
      Sources.kafka(spark, cfg, "localhost:9092", "events")
    }
    // In this sandbox the connector jar is absent; the failure must be the
    // missing-provider error (i.e. our option wiring got as far as data
    // source lookup), not an option/validation error.
    assert(e.getMessage.toLowerCase.contains("kafka"))
  }
}
