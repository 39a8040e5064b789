package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.model.{IngestConfig, TargetTable}
import graft.sink.ParquetTarget
import graft.streaming.{AggUpsertStream, EventTime, Stateful}

/** Event-time streaming ops: windowed aggregation merged through the
  * upsert sink, and flatMapGroupsWithState running state — both must
  * converge to the batch answer regardless of micro-batch boundaries. */
case class TEv(ts: Timestamp, kind: String, value: Double)
case class SEv(pkey: Long, ver: Long, tie: Long, value: Double)

class EventTimeSpec extends SparkSpec {

  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-03-01 10:$minute%02d:00")

  test("tumblingAgg on a batch frame: epoch-aligned windows, count + sum") {
    val df = Seq(
      TEv(ts(1), "a", 1.0), TEv(ts(2), "a", 2.0),
      TEv(ts(16), "a", 4.0), TEv(ts(2), "b", 8.0)).toDF()
    val got = EventTime.tumblingAgg(df, "ts", "value", "15 minutes", "1 hour", Seq("kind"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val w0 = Timestamp.valueOf("2024-03-01 10:00:00").getTime * 1000L
    val w1 = Timestamp.valueOf("2024-03-01 10:15:00").getTime * 1000L
    assert(got == Set(
      (w0, "a", 2L, 3.0), (w1, "a", 1L, 4.0), (w0, "b", 1L, 8.0)))
  }

  test("streamed windowed agg equals the batch aggregate across batch splits") {
    implicit val sql = spark.sqlContext
    val all = Seq(
      TEv(ts(1), "a", 1.5), TEv(ts(3), "a", 2.0), TEv(ts(17), "b", 3.0),
      TEv(ts(5), "b", 0.5), TEv(ts(20), "a", 7.0), TEv(ts(21), "a", 1.0))
    val batch = EventTime
      .tumblingAgg(all.toDF(), "ts", "value", "15 minutes", "1 hour", Seq("kind"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap

    val events = MemoryStream[TEv]
    val dir = Files.createTempDirectory("graft_et_").toString
    val target = TargetTable("w", s"$dir/target",
      keyCols = Seq("window_start_us", "kind"), versionCol = "n_events")
    val cfg = IngestConfig(name = s"et-${System.nanoTime()}",
      checkpointDir = Some(s"$dir/ckpt"))
    val agg = EventTime.tumblingAgg(
      events.toDF(), "ts", "value", "15 minutes", "1 hour", Seq("kind"))
    val q = new AggUpsertStream(spark, cfg, target).run(agg, Trigger.ProcessingTime(0))
    // deliberately awkward split: windows update across several batches
    all.grouped(2).foreach { b => events.addData(b); q.processAllAvailable() }
    q.stop()

    val merged = new ParquetTarget(spark, target).read().get
      .collect().map(r => (r.getAs[Long]("window_start_us"), r.getAs[String]("kind")) ->
        ((r.getAs[Long]("n_events"), r.getAs[Double]("sum_value")))).toMap
    assert(merged == batch)
  }

  test("slidingAgg: each event lands in window/slide overlapping windows") {
    val df = Seq(TEv(ts(16), "a", 2.0), TEv(ts(2), "a", 1.0)).toDF()
    val got = EventTime
      .slidingAgg(df, "ts", "value", "30 minutes", "15 minutes", "1 hour", Seq("kind"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    def us(t: String) = Timestamp.valueOf(t).getTime * 1000L
    // ts(2) ∈ [09:45, 10:15), [10:00, 10:30); ts(16) ∈ [10:00,10:30), [10:15,10:45)
    assert(got == Set(
      (us("2024-03-01 09:45:00"), "a", 1L, 1.0),
      (us("2024-03-01 10:00:00"), "a", 2L, 3.0),
      (us("2024-03-01 10:15:00"), "a", 1L, 2.0)))
  }

  test("sessionAgg on a batch frame: gap splits sessions, min/max bounds") {
    val df = Seq(
      TEv(ts(1), "a", 1.0), TEv(ts(3), "a", 1.0), // session 1 (gap < 10m)
      TEv(ts(20), "a", 1.0),                      // session 2 (17m > 10m gap)
      TEv(ts(5), "b", 1.0)).toDF()
    val got = EventTime.sessionAgg(df, "ts", "10 minutes", "1 hour", Seq("kind"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    def us(m: Int) = ts(m).getTime * 1000L
    assert(got == Set(
      ("a", us(1), us(3), 2L), ("a", us(20), us(20), 1L), ("b", us(5), us(5), 1L)))
  }

  test("dynamic-gap sessions: per-event gaps merge transitively") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      ("2024-03-01 10:00:00", "a"),  // end 10:10
      ("2024-03-01 10:05:00", "b"),  // merges (10:05 < 10:10), end 10:35
      ("2024-03-01 10:20:00", "a"),  // merges (10:20 < 10:35), end stays 10:35
      ("2024-03-01 10:35:00", "a"),  // TOUCHING start==end merges, end 10:45
      ("2024-03-01 10:46:00", "a"),  // 10:46 > 10:45 → NEW session, end 10:56
      ("2024-03-01 09:00:00", "a"))  // isolated earlier session, end 09:10
      .toDF("t", "kind")
      .select(to_timestamp(col("t")).as("ts"), col("kind"), lit(7L).as("u"))
    val got = EventTime.sessionAggDynamicGap(df, "ts",
        expr("CASE WHEN kind = 'a' THEN make_interval(0,0,0,0,0,10,0) " +
          "ELSE make_interval(0,0,0,0,0,30,0) END"), Seq("u"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    def us(t: String) = java.sql.Timestamp.valueOf(t).getTime * 1000L
    assert(got == Set(
      (us("2024-03-01 09:00:00"), us("2024-03-01 09:10:00"), 1L),
      (us("2024-03-01 10:00:00"), us("2024-03-01 10:45:00"), 4L),
      (us("2024-03-01 10:46:00"), us("2024-03-01 10:56:00"), 1L)))
  }

  test("streamed session agg (append) emits watermark-closed sessions") {
    implicit val sql = spark.sqlContext
    val all = Seq(
      TEv(ts(1), "a", 0), TEv(ts(4), "a", 0), TEv(ts(30), "a", 0),
      TEv(ts(2), "b", 0), TEv(ts(59), "b", 0))
    val batch = EventTime
      .sessionAgg(all.toDF(), "ts", "10 minutes", "0 seconds", Seq("kind"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    val events = MemoryStream[TEv]
    val agg = EventTime.sessionAgg(
      events.toDF(), "ts", "10 minutes", "0 seconds", Seq("kind"))
    val q = agg.writeStream.format("memory").queryName("sess_append")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    // batch 1 sets the watermark to ts(59); the sentinel a day later
    // advances it past every session's close, and the no-new-data flush
    // batch emits them all — only the sentinel's own session stays open
    events.addData(all); q.processAllAvailable()
    events.addData(Seq(TEv(Timestamp.valueOf("2024-03-02 10:00:00"), "c", 0)))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sess_append")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(batch.nonEmpty && got == batch)
  }

  test("perKeyRateEwma: windows fold in order, EWMA carries across batches") {
    implicit val sql = spark.sqlContext
    def t2(day: Int, h: Int) = Timestamp.valueOf(f"2024-03-$day%02d $h%02d:00:00")
    val events = MemoryStream[TEv]
    val out = Stateful.perKeyRateEwma(
      events.toDF().select(lit(7L).as("u"), col("ts")),
      "u", "ts", "1 day", alpha = 0.25)
    val q = out.writeStream.format("memory").queryName("rate_ewma")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    // batch 1: day1 x2 events, day2 x4 events (one batch: in-order fold)
    events.addData(Seq(
      TEv(t2(1, 1), "a", 0), TEv(t2(1, 2), "a", 0),
      TEv(t2(2, 1), "a", 0), TEv(t2(2, 2), "a", 0),
      TEv(t2(2, 3), "a", 0), TEv(t2(2, 4), "a", 0)))
    q.processAllAvailable()
    // batch 2: day3 x1 event — state must carry the day2 EWMA forward
    events.addData(Seq(TEv(t2(3, 1), "a", 0)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("rate_ewma")
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    def d(day: Int) = Timestamp.valueOf(f"2024-03-$day%02d 00:00:00")
      .getTime * 1000L
    val e1 = 2.0                          // seed = first window's count
    val e2 = 0.25 * 4.0 + 0.75 * e1       // 2.5
    val e3 = 0.25 * 1.0 + 0.75 * e2       // cross-batch carry
    assert(got == Map(
      d(1) -> ((2L, e1)), d(2) -> ((4L, e2)), d(3) -> ((1L, e3))))
  }

  test("momentAnomalyPerKey: moments carry across batches; degenerate " +
    "keys emit NULL; state is arrival-order-insensitive") {
    implicit val sql = spark.sqlContext
    val events = MemoryStream[SEv]
    val dir = Files.createTempDirectory("graft_an_").toString
    val target = TargetTable("anom", s"$dir/target",
      keyCols = Seq("pkey"), versionCol = "n_events")
    val cfg = IngestConfig(name = s"an-${System.nanoTime()}",
      checkpointDir = Some(s"$dir/ckpt"))
    val q = new AggUpsertStream(spark, cfg, target)
      .run(graft.streaming.Stateful.momentAnomalyPerKey(events.toDF()),
        Trigger.ProcessingTime(0))
    // key 1 builds history across TWO batches (state must carry Σq, Σq²);
    // key 2 is a singleton (NULL z); key 3 has zero variance (NULL z).
    // Key 1's batch-2 rows arrive ver-DESCENDING — latest must win by
    // (ver, tie), not by arrival position.
    events.addData(Seq(SEv(1, 1, 1, 2.0), SEv(1, 2, 2, 4.0),
      SEv(2, 1, 1, 7.0), SEv(3, 1, 1, 5.0), SEv(3, 2, 2, 5.0)))
    q.processAllAvailable()
    events.addData(Seq(SEv(1, 3, 3, 9.0), SEv(1, 2, 9, 1.0)))
    q.processAllAvailable()
    q.stop()
    val got = new ParquetTarget(spark, target).read().get
      .collect().map(r => r.getAs[Long]("pkey") ->
        ((r.getAs[Long]("n_events"), r.getAs[Double]("last_value"),
          Option(r.get(r.fieldIndex("zscore")))))).toMap
    // key 1: q = 2048, 4096, 9216, 1024 (n=4); latest = ver 3 → 9.0
    val s = 2048L + 4096L + 9216L + 1024L
    val s2 = 2048L * 2048 + 4096L * 4096 + 9216L * 9216 + 1024L * 1024
    val num = 4L * s2 - s * s
    val z1 = (4L * 9216L - s).toDouble / math.sqrt(num.toDouble)
    assert(got(1L) == ((4L, 9.0, Some(z1))))
    assert(got(2L) == ((1L, 7.0, None)))
    assert(got(3L) == ((2L, 5.0, None)))
  }

  test("topKPerKey: slate converges across batches, displaced rows leave") {
    implicit val sql = spark.sqlContext
    val events = MemoryStream[SEv] // (pkey → gkey proxy, ver → id, value)
    val dir = Files.createTempDirectory("graft_tk_").toString
    val target = TargetTable("lb", s"$dir/target",
      keyCols = Seq("gkey", "rank"), versionCol = "upd_seq")
    val cfg = IngestConfig(name = s"tk-${System.nanoTime()}",
      checkpointDir = Some(s"$dir/ckpt"))
    val src = events.toDF().select(
      concat(lit("k"), col("pkey")).as("gkey"),
      col("tie").as("id"), col("value").as("score"))
    val q = new AggUpsertStream(spark, cfg, target)
      .run(graft.streaming.Stateful.topKPerKey(src, k = 2),
        Trigger.ProcessingTime(0))
    // batch 1: key k1 sees scores 5, 1 → slate (5, 1)
    events.addData(Seq(SEv(1, 0, 10, 5.0), SEv(1, 0, 11, 1.0)))
    q.processAllAvailable()
    // batch 2: 9 and 7 arrive → slate must become (9, 7); 5 and 1 leave.
    // Also a no-change batch for k2 after its first slate.
    events.addData(Seq(SEv(1, 0, 12, 9.0), SEv(1, 0, 13, 7.0),
      SEv(2, 0, 20, 4.0)))
    q.processAllAvailable()
    events.addData(Seq(SEv(2, 0, 21, 3.0), SEv(2, 0, 22, 3.5)))
    q.processAllAvailable()
    q.stop()
    val got = new ParquetTarget(spark, target).read().get
      .collect().map(r => (r.getAs[String]("gkey"), r.getAs[Long]("rank")) ->
        ((r.getAs[Long]("id"), r.getAs[Double]("score")))).toMap
    assert(got == Map(
      ("k1", 1L) -> ((12L, 9.0)), ("k1", 2L) -> ((13L, 7.0)),
      ("k2", 1L) -> ((20L, 4.0)), ("k2", 2L) -> ((22L, 3.5))))
  }

  test("topKPerKey: a re-scored id keeps ONE slot at its max score") {
    implicit val sql = spark.sqlContext
    val events = MemoryStream[SEv]
    val dir = Files.createTempDirectory("graft_tk2_").toString
    val target = TargetTable("lb2", s"$dir/target",
      keyCols = Seq("gkey", "rank"), versionCol = "upd_seq")
    val cfg = IngestConfig(name = s"tk2-${System.nanoTime()}",
      checkpointDir = Some(s"$dir/ckpt"))
    val src = events.toDF().select(
      concat(lit("k"), col("pkey")).as("gkey"),
      col("tie").as("id"), col("value").as("score"))
    val q = new AggUpsertStream(spark, cfg, target)
      .run(graft.streaming.Stateful.topKPerKey(src, k = 2),
        Trigger.ProcessingTime(0))
    // id 10 arrives at 5.0, then re-scores to 8.0 in a later batch; a
    // tuple-distinct slate would seat it at BOTH rank 1 and rank 2
    events.addData(Seq(SEv(1, 0, 10, 5.0), SEv(1, 0, 11, 3.0)))
    q.processAllAvailable()
    events.addData(Seq(SEv(1, 0, 10, 8.0)))
    q.processAllAvailable()
    // and a lower re-score for an in-slate id is ignored
    events.addData(Seq(SEv(1, 0, 11, 1.0)))
    q.processAllAvailable()
    q.stop()
    val got = new ParquetTarget(spark, target).read().get
      .collect().map(r => (r.getAs[String]("gkey"), r.getAs[Long]("rank")) ->
        ((r.getAs[Long]("id"), r.getAs[Double]("score")))).toMap
    assert(got == Map(
      ("k1", 1L) -> ((10L, 8.0)), ("k1", 2L) -> ((11L, 3.0))))
  }

  test("stateful running counts + latest payload converge across splits") {
    implicit val sql = spark.sqlContext
    val all = Seq(
      SEv(1, 10, 1, 1.0), SEv(1, 30, 2, 3.0), SEv(1, 20, 3, 2.0), // late row
      SEv(2, 5, 4, 9.0), SEv(2, 5, 5, 8.0))                       // tie on ver
    val events = MemoryStream[SEv]
    val dir = Files.createTempDirectory("graft_st_").toString
    val target = TargetTable("s", s"$dir/target",
      keyCols = Seq("pkey"), versionCol = "n_events")
    val cfg = IngestConfig(name = s"st-${System.nanoTime()}",
      checkpointDir = Some(s"$dir/ckpt"))
    val q = new AggUpsertStream(spark, cfg, target)
      .run(Stateful.runningPerKey(events.toDF().toDF("pkey", "ver", "tie", "value")),
        Trigger.ProcessingTime(0))
    all.grouped(2).foreach { b => events.addData(b); q.processAllAvailable() }
    q.stop()

    val got = new ParquetTarget(spark, target).read().get
      .collect().map(r => r.getAs[Long]("pkey") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("last_us"),
          r.getAs[Long]("last_event_id"), r.getAs[Double]("last_value")))).toMap
    assert(got == Map(
      1L -> ((3L, 30L, 2L, 3.0)),  // count 3; late ver=20 did not displace ver=30
      2L -> ((2L, 5L, 5L, 8.0)))) // ver tie resolved by higher tie column
  }
}
