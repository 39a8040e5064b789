package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.engine.{MultiTableUpsertStream, QuickStreamBuilder, UpsertStream}
import graft.model.{IngestConfig, TargetTable}
import graft.ops.Dedup

/** End-to-end Structured Streaming behavior of the processors (reference
  * lifecycle §3): micro-batched latest-wins ingestion converges to the
  * global per-key arg-max regardless of batch boundaries and arrival
  * order — late/out-of-order data is overwritten-or-ignored exactly as
  * quick_stream's dedup-then-ON-CONFLICT pipeline does. */
case class Ev(pkey: Long, ver: Long, seq: Long, payload: String)

class StreamsSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("UpsertStream converges to global latest-wins across micro-batches") {
    implicit val sql = spark.sqlContext
    val events = MemoryStream[Ev]
    val dir = tmp("graft_stream_up_")
    val target = TargetTable("t", s"$dir/target",
      keyCols = Seq("pkey"), versionCol = "ver", tieBreakCols = Seq("seq"))
    val cfg = IngestConfig(name = s"spec-up-${System.nanoTime()}",
      maxWriterPartitions = 2, checkpointDir = Some(s"$dir/ckpt"))

    val q = new UpsertStream(spark, cfg, target)
      .run(events.toDF())
    // batch 1: initial versions; batch 2: one newer, one stale (late), one new key
    events.addData(Ev(1, 10, 1, "a0"), Ev(2, 20, 2, "b0"), Ev(1, 12, 3, "a1"))
    q.processAllAvailable()
    events.addData(Ev(1, 11, 4, "late-stale"), Ev(2, 25, 5, "b1"), Ev(3, 1, 6, "c0"))
    q.processAllAvailable()
    q.stop()

    val state = spark.read.parquet(target.path)
      .collect().map(r => r.getAs[Long]("pkey") -> r.getAs[String]("payload")).toMap
    assert(state == Map(1L -> "a1", 2L -> "b1", 3L -> "c0"))
  }

  test("batch boundaries don't matter: one batch vs many, same final state") {
    implicit val sql = spark.sqlContext
    val all = Seq(
      Ev(1, 5, 1, "x1"), Ev(1, 9, 2, "x2"), Ev(2, 3, 3, "y1"),
      Ev(2, 2, 4, "stale"), Ev(3, 7, 5, "z1"), Ev(1, 9, 6, "tie-hi"))

    def runWith(batches: Seq[Seq[Ev]], tag: String): Map[Long, String] = {
      val events = MemoryStream[Ev]
      val dir = tmp(s"graft_stream_$tag")
      val target = TargetTable("t", s"$dir/target",
        keyCols = Seq("pkey"), versionCol = "ver", tieBreakCols = Seq("seq"))
      val cfg = IngestConfig(name = s"spec-$tag-${System.nanoTime()}",
        maxWriterPartitions = 2, checkpointDir = Some(s"$dir/ckpt"))
      val q = new UpsertStream(spark, cfg, target).run(events.toDF())
      batches.foreach { b => events.addData(b); q.processAllAvailable() }
      q.stop()
      spark.read.parquet(target.path)
        .collect().map(r => r.getAs[Long]("pkey") -> r.getAs[String]("payload")).toMap
    }

    val oneShot = runWith(Seq(all), "one")
    val perRow = runWith(all.map(Seq(_)), "many")
    val expected = Dedup.latestWins(all.toDF(), Seq("pkey"), "ver", Seq("seq"))
      .collect().map(r => r.getAs[Long]("pkey") -> r.getAs[String]("payload")).toMap
    assert(oneShot == expected)
    assert(perRow == expected)
  }

  test("MultiTableUpsertStream routes by table column; unknown tables dropped") {
    implicit val sql = spark.sqlContext
    val events = MemoryStream[(String, Long, Long, Long, String)]
    val dir = tmp("graft_stream_multi_")
    def tt(n: String) = TargetTable(n, s"$dir/$n",
      keyCols = Seq("pkey"), versionCol = "ver", tieBreakCols = Seq("seq"))
    val catalog = Map("alpha" -> tt("alpha"), "beta" -> tt("beta"))
    val cfg = IngestConfig(name = s"spec-multi-${System.nanoTime()}",
      maxWriterPartitions = 2, checkpointDir = Some(s"$dir/ckpt"))

    val src = events.toDF().toDF("table", "pkey", "ver", "seq", "payload")
    val q = new MultiTableUpsertStream(spark, cfg, catalog).run(src)
    events.addData(
      ("alpha", 1L, 10L, 1L, "a"), ("beta", 1L, 10L, 2L, "b"),
      ("alpha", 1L, 12L, 3L, "a2"), ("ghost", 9L, 1L, 4L, "dropped"))
    q.processAllAvailable()
    q.stop()

    val alpha = spark.read.parquet(catalog("alpha").path)
      .collect().map(r => (r.getAs[Long]("pkey"), r.getAs[String]("payload")))
    val beta = spark.read.parquet(catalog("beta").path)
      .collect().map(r => (r.getAs[Long]("pkey"), r.getAs[String]("payload")))
    assert(alpha.toSeq == Seq((1L, "a2")))
    assert(beta.toSeq == Seq((1L, "b")))
    // routing column is dropped before merge, like the reference's
    // per-table statement dispatch (multi_table_upsert.rs:288-293)
    assert(!spark.read.parquet(catalog("alpha").path).columns.contains("table"))
  }

  test("builder-constructed soft DeleteStream tombstones via streaming") {
    implicit val sql = spark.sqlContext
    val dir = tmp("graft_stream_del_")
    val target = TargetTable("t", s"$dir/target",
      keyCols = Seq("pkey"), versionCol = "ver", tieBreakCols = Seq("seq"))

    // Seed the target with an initial upsert run.
    val up = MemoryStream[Ev]
    val upQ = new QuickStreamBuilder(spark)
      .withName(s"spec-del-seed-${System.nanoTime()}")
      .withMaxConCount(2).withMaxRecordsPerCycleBatch(100L)
      .withCheckpointDir(s"$dir/ckpt_up").withTarget(target)
      .buildUpsert().run(up.toDF())
    up.addData(Ev(1, 10, 1, "a"), Ev(2, 20, 2, "b"))
    upQ.processAllAvailable(); upQ.stop()

    val del = MemoryStream[Ev]
    val delQ = new QuickStreamBuilder(spark)
      .withName(s"spec-del-${System.nanoTime()}")
      .withMaxConCount(2).withMaxRecordsPerCycleBatch(100L)
      .withCheckpointDir(s"$dir/ckpt_del").withTarget(target)
      .withSoftDelete(true)
      .buildDelete().run(del.toDF())
    del.addData(Ev(1, 15, 3, "tomb"), Ev(2, 19, 4, "stale-tomb"))
    delQ.processAllAvailable(); delQ.stop()

    val state = spark.read.parquet(target.path)
      .collect().map(r => r.getAs[Long]("pkey") -> r.getAs[Boolean]("row_active")).toMap
    assert(state == Map(1L -> false, 2L -> true))
  }
}
