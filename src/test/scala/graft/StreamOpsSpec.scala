package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{StreamDedup, StreamJoins}

/** Stream-stream join + streaming dedup semantics under MULTI-batch
  * execution with real (tight) watermarks — the s3/s4 gates prove batch
  * equivalence with an unbounded watermark; these specs prove the state
  * machinery: matches across batch boundaries, watermark-bounded state,
  * and within-watermark re-emission. */
case class LEv(k: Long, lid: Long, lts: Timestamp)
case class REv(rk: Long, rid: Long, rts: Timestamp)
case class DEv(dk: Long, dts: Timestamp, tag: String)

class StreamOpsSpec extends SparkSpec {

  import spark.implicits._

  // offset from a sane epoch: event times AT the initial watermark (epoch
  // 0) hit late-row/eviction edge cases that no real stream sees
  private def ts(min: Long): Timestamp =
    new Timestamp(1600000000000L + min * 60000L)

  test("intervalJoin matches across micro-batch boundaries") {
    implicit val sql = spark.sqlContext
    val left = MemoryStream[LEv]
    val right = MemoryStream[REv]
    val out = StreamJoins.intervalJoin(
      left.toDF(), right.toDF(), Seq("k" -> "rk"),
      "lts", "rts", "0 seconds", "10 minutes", "1 hour")
      .select($"lid", $"rid")
    val dir = Files.createTempDirectory("graft_sj_").toString
    val q = out.writeStream.format("memory").queryName("sj_out")
      .option("checkpointLocation", s"$dir/ckpt").start()
    // batch 1: left arrives first, its match comes in a LATER batch
    left.addData(LEv(1, 100, ts(0)), LEv(2, 200, ts(0)))
    q.processAllAvailable()
    right.addData(REv(1, 900, ts(5)))   // in-range for lid=100
    right.addData(REv(2, 901, ts(20)))  // out of range for lid=200
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sj_out").as[(Long, Long)].collect().toSet
    assert(rows == Set((100L, 900L)))
  }

  test("left-outer intervalJoin null-extends once state expires") {
    implicit val sql = spark.sqlContext
    val left = MemoryStream[LEv]
    val right = MemoryStream[REv]
    val out = StreamJoins.intervalJoin(
      left.toDF(), right.toDF(), Seq("k" -> "rk"),
      "lts", "rts", "0 seconds", "10 minutes", "0 seconds",
      joinType = "left_outer")
      .select($"lid", $"rid")
    val dir = Files.createTempDirectory("graft_slj_").toString
    val q = out.writeStream.format("memory").queryName("slj_out")
      .option("checkpointLocation", s"$dir/ckpt").start()
    left.addData(LEv(1, 100, ts(0)), LEv(2, 200, ts(0)))
    right.addData(REv(1, 900, ts(5))) // matches lid=100; lid=200 unmatched
    q.processAllAvailable()
    // sentinel a day later: watermark passes ts(0)+10m, lid=200 expires
    left.addData(LEv(9, 999, ts(1440)))
    right.addData(REv(9, 998, ts(1440)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("slj_out").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(rows.contains((100L, 900L)))  // matched pair, emitted inner
    assert(rows.contains((200L, -1L)))   // unmatched left, null-extended
  }

  test("intervalJoin requires disjoint column names") {
    val df = Seq((1L, ts(0))).toDF("k", "ts")
    val e = intercept[IllegalArgumentException] {
      StreamJoins.intervalJoin(df, df, Seq("k" -> "k"),
        "ts", "ts", "0 seconds", "1 hour", "1 hour")
    }
    assert(e.getMessage.contains("disjoint"))
  }

  test("StreamDedup.exact emits each key once across batches") {
    implicit val sql = spark.sqlContext
    val src = MemoryStream[DEv]
    val out = StreamDedup.exact(src.toDF(), Seq("dk")).select($"dk")
    val dir = Files.createTempDirectory("graft_sd_").toString
    val q = out.writeStream.format("memory").queryName("sd_out")
      .option("checkpointLocation", s"$dir/ckpt").start()
    src.addData(DEv(1, ts(0), "a"), DEv(1, ts(1), "dup-in-batch"))
    q.processAllAvailable()
    src.addData(DEv(1, ts(2), "dup-later-batch"), DEv(2, ts(2), "b"))
    q.processAllAvailable()
    q.stop()
    val keys = spark.table("sd_out").as[Long].collect().toList
    assert(keys.sorted == List(1L, 2L))
  }

  test("StreamDedup.withinWatermark drops dups inside the window and can " +
    "re-emit after state expiry") {
    implicit val sql = spark.sqlContext
    val src = MemoryStream[DEv]
    val out = StreamDedup.withinWatermark(
      src.toDF(), Seq("dk"), "dts", "10 minutes").select($"dk", $"tag")
    val dir = Files.createTempDirectory("graft_sdw_").toString
    val q = out.writeStream.format("memory").queryName("sdw_out")
      .option("checkpointLocation", s"$dir/ckpt").start()
    // which same-batch duplicate is the emitted witness is unspecified →
    // same tag for both
    src.addData(DEv(1, ts(0), "early"), DEv(1, ts(5), "early"))
    q.processAllAvailable()
    // advance event time far past the watermark so key 1's state expires
    src.addData(DEv(2, ts(60), "advance"))
    q.processAllAvailable()
    src.addData(DEv(1, ts(61), "re-emit"))
    q.processAllAvailable()
    q.stop()
    val tags = spark.table("sdw_out").as[(Long, String)].collect().toSet
    assert(tags == Set((1L, "early"), (2L, "advance"), (1L, "re-emit")))
  }

  test("transitionsPerKey: counts continue across batches from the " +
    "remembered last event; in-batch rows fold by (ver, tie)") {
    implicit val sql = spark.sqlContext
    val src = MemoryStream[(Long, Long, Long, String)]
    val out = graft.streaming.Stateful.transitionsPerKey(
      src.toDF().toDF("pkey", "ver", "tie", "etype"))
    val dir = Files.createTempDirectory("graft_s17_").toString
    val q = out.writeStream.format("memory").queryName("tr_out")
      .outputMode("update")
      .option("checkpointLocation", s"$dir/ckpt").start()
    // batch 1 delivered out of ver order: folds as a(1) -> b(2) -> a(3)
    src.addData((1L, 3L, 1L, "a"), (1L, 1L, 1L, "a"), (1L, 2L, 1L, "b"))
    q.processAllAvailable()
    // batch 2: last event was a(ver 3) -> c continues the chain
    src.addData((1L, 4L, 1L, "c"))
    q.processAllAvailable()
    q.stop()
    // latest-wins per (user, from, to): take the max n seen
    val rows = spark.table("tr_out")
      .groupBy("user_id", "from_type", "to_type")
      .agg(max("n").as("n")).collect()
      .map(r => (r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    assert(rows == Map(("a", "b") -> 1L, ("b", "a") -> 1L,
      ("a", "c") -> 1L))
  }

  test("funnelPerKey: per-stage first timestamps are order- and " +
    "batch-boundary-insensitive; conversion readable from final state") {
    implicit val sql = spark.sqlContext
    val src = MemoryStream[(Long, Long, String)]
    val out = graft.streaming.Stateful.funnelPerKey(
      src.toDF().toDF("pkey", "ver", "etype"))
    val dir = Files.createTempDirectory("graft_s18_").toString
    val q = out.writeStream.format("memory").queryName("fn_out")
      .outputMode("update")
      .option("checkpointLocation", s"$dir/ckpt").start()
    // worst-case arrival: purchase first, then click, view arrives LAST
    // and in a later batch — the mins must still land on 10 < 20 < 30
    src.addData((1L, 30L, "purchase"), (1L, 20L, "click"))
    q.processAllAvailable()
    src.addData((1L, 10L, "view"), (1L, 25L, "view"), (2L, 5L, "click"))
    q.processAllAvailable()
    q.stop()
    val fin = spark.table("fn_out")
      .groupBy("user_id")
      .agg(max(struct($"n_events", $"t_view_us", $"t_click_us",
        $"t_purchase_us")).as("s"))
      .select($"user_id", $"s.t_view_us", $"s.t_click_us",
        $"s.t_purchase_us")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(fin(1L) == ((Some(10L), Some(20L), Some(30L))))
    assert(fin(2L) == ((None, Some(5L), None)))
  }

  test("StreamQuota: admits first N per key-window, state carries across batches") {
    implicit val sql = spark.sqlContext
    val src = MemoryStream[DEv]
    // key = dk, window 1 hour, quota 2; tag is unused by the op
    val out = graft.streaming.StreamQuota.perKeyWindowQuota(
      src.toDF().withColumn("eid", $"dts".cast("long")),
      "dk", "dts", "eid", "1 hour", "10 minutes", maxPerWindow = 2)
    val dir = Files.createTempDirectory("graft_sq_").toString
    val q = out.writeStream.format("memory").queryName("sq_out")
      .option("checkpointLocation", s"$dir/ckpt").start()
    // batch 1: 3 events for key 1 in one hour-window → admit earliest 2
    src.addData(DEv(1, ts(5), "c"), DEv(1, ts(1), "a"), DEv(1, ts(3), "b"))
    q.processAllAvailable()
    // batch 2: same key+window → quota already consumed, admit none;
    // key 2 admits; key 1 in the NEXT window admits again
    src.addData(DEv(1, ts(7), "late"), DEv(2, ts(8), "other"),
      DEv(1, ts(90), "next-window"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sq_out")
      .select($"user_id", $"ts_us", $"admitted_rank")
      .as[(Long, Long, Long)].collect().toSet
    def us(min: Long): Long = ts(min).getTime * 1000L
    assert(got == Set(
      (1L, us(1), 1L), (1L, us(3), 2L),   // earliest two of batch 1
      (2L, us(8), 1L),                     // other key unaffected
      (1L, us(90), 1L)))                   // fresh window, fresh quota
  }

  test("enrichWithDim: broadcast left_outer keeps unmatched stream rows") {
    implicit val sql = spark.sqlContext
    val src = MemoryStream[LEv]
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("dk2", "tier")
    val out = StreamJoins.enrichWithDim(
      src.toDF(), dim, Seq("k" -> "dk2"))
      .select($"lid", $"tier")
    val dir = Files.createTempDirectory("graft_se_").toString
    val q = out.writeStream.format("memory").queryName("se_out")
      .option("checkpointLocation", s"$dir/ckpt").start()
    src.addData(LEv(1, 100, ts(0)), LEv(9, 900, ts(0))) // 9: no dim row
    q.processAllAvailable()
    src.addData(LEv(2, 200, ts(1))) // later batch re-resolves the dim
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("se_out").as[(Long, Option[String])].collect().toSet
    assert(rows == Set((100L, Some("gold")), (900L, None), (200L, Some("silver"))))
  }

  test("streaming LSH self-join: batch-identical pairs, window bounds, " +
      "cross-band dedup") {
    implicit val sql = spark.sqlContext
    val docs = MemoryStream[DEv] // (dk = doc id, dts = event time, tag = text)
    val near = "the quick brown fox jumps over the lazy dog again today"
    val src = docs.toDF().select(col("dk").as("doc_id"),
      col("tag").as("text"), col("dts").as("ts"))
    val out = graft.streaming.StreamSimilarity.lshSelfJoinPairs(
      src, "doc_id", "text", "ts", window = "30 minutes", watermark = "1 day")
      .select(col("id_a"), col("id_b"))
    val dir = Files.createTempDirectory("graft_ssj_").toString
    val q = out.writeStream.format("memory").queryName("ssj_out")
      .option("checkpointLocation", s"$dir/ckpt").start()
    // 1 and 2: near-identical, 5 min apart → pair. 3: same text but 2 h
    // later → outside the window. 4: unrelated text.
    docs.addData(DEv(1, ts(0), near), DEv(2, ts(5), near + " x"))
    q.processAllAvailable()
    docs.addData(DEv(3, ts(120), near), DEv(4, ts(6),
      "completely different words about entirely other topics here"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssj_out").as[(Long, Long)].collect().toSeq
    assert(got.toSet == Set((1L, 2L)))
    assert(got.size == 1) // multi-band agreement emits the pair ONCE
    // and the candidates equal the batch operator on the in-window slice
    val batch = graft.ops.NearDup.lshCandidatePairs(
      Seq((1L, near), (2L, near + " x"), (4L,
        "completely different words about entirely other topics here"))
        .toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch == got.toSet)
  }

  test("enrichWithDim rejects unsupported join types and shared names") {
    val dim = Seq((1L, "x")).toDF("dk2", "tier")
    val st = Seq(LEv(1, 1, ts(0))).toDF()
    intercept[IllegalArgumentException] {
      StreamJoins.enrichWithDim(st, dim, Seq("k" -> "dk2"), joinType = "full")
    }
    intercept[IllegalArgumentException] {
      StreamJoins.enrichWithDim(st, st, Seq("k" -> "k"))
    }
  }
}
