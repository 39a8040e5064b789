package graft

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger, AtomicLong}

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.engine.UpsertStream
import graft.model.{IngestConfig, TargetTable}
import graft.ops.Dedup
import graft.sink.{MergeSink, ParquetTarget}

/** Restart-from-checkpoint exactly-once semantics — the engine's claimed
  * SUPERSET over the reference's shutdown story. The reference can only
  * cancel in-flight work and drain (quick_stream
  * `src/shutdown_service.rs:5-52`, cancellation at `src/upsert.rs:111-132`);
  * there is no resume: whatever the channel held is gone. Here the claim
  * is stronger — a stopped or CRASHED query restarted on the SAME
  * checkpoint directory resumes the offset log and converges to the exact
  * state an uninterrupted run produces — and until round 11 no test ever
  * exercised it (every StreamsSpec query used a fresh checkpoint). These
  * specs close that gap deterministically:
  *
  *  1. graceful mid-stream stop: batch 0 committed, MORE FILES PENDING
  *     (ProcessingTime(60s) guarantees trigger 2 never fires before the
  *     stop), restart on the same checkpoint + new late data;
  *  2. injected crash in the at-least-once window: the sink wrapper
  *     merges the batch (DATA committed) and then throws before Spark can
  *     write the commit log entry (OFFSET not committed) — the exact
  *     failure point between foreachBatch return and offset commit;
  *     restart must replay that batch and the latest-wins merge must
  *     absorb the replay idempotently.
  *
  * Both final states are compared against the batch oracle
  * ([[Dedup.latestWins]] over all rows) AND an uninterrupted control run,
  * and the sink-side row/call counters prove the resume path processed
  * only the un-committed remainder (offsets really resumed) while total
  * delivery stayed at-least-once. */
class RestartResumeSpec extends SparkSpec {

  import spark.implicits._

  private val evSchema = Encoders.product[Ev].schema

  /** Write `rows` as ONE parquet part-file named `name` inside `srcDir` —
    * the unit of admission for a maxFilesPerTrigger=1 file stream. */
  private def writeOneFile(rows: Seq[Ev], srcDir: Path, name: String): Unit = {
    import scala.jdk.CollectionConverters._
    val stage = Files.createTempDirectory("graft_restart_stage_")
    rows.toDF().coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val part = Files.list(stage).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.createDirectories(srcDir)
    Files.move(part, srcDir.resolve(name))
  }

  private def fileStream(srcDir: Path): DataFrame =
    spark.readStream.schema(evSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.toString)

  /** Block until the query has committed at least one non-empty batch. */
  private def awaitFirstBatch(q: StreamingQuery): Unit = {
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (!q.recentProgress.exists(_.numInputRows > 0) &&
        q.isActive && System.nanoTime() < deadline) Thread.sleep(25)
    assert(q.recentProgress.exists(_.numInputRows > 0),
      "first micro-batch never committed")
  }

  /** Sink decorator counting merges — proves what the resume re-sent. */
  private final class CountingSink(inner: MergeSink) extends MergeSink {
    val calls = new AtomicInteger(0)
    val rows = new AtomicLong(0L)
    override def mergeUpsert(b: DataFrame, c: IngestConfig): Unit = {
      calls.incrementAndGet(); rows.addAndGet(b.count())
      inner.mergeUpsert(b, c)
    }
    override def mergeSoftDelete(b: DataFrame, c: IngestConfig): Unit =
      inner.mergeSoftDelete(b, c)
    override def mergeHardDelete(b: DataFrame, c: IngestConfig): Unit =
      inner.mergeHardDelete(b, c)
  }

  // NOTE: blocking inside `mergeUpsert` to pin the stop point is NOT an
  // option — the stream execution thread is Spark's UninterruptibleThread
  // and defers interrupts across the batch-execution section, so a sink
  // parked on a latch deadlocks `stop()` (observed via jstack). The
  // mid-stream stop below instead races `stop()` against trigger 2 and
  // keeps the assertions sound on BOTH outcomes, crisp on the common one.

  /** Sink decorator that merges batch `crashOnCall` COMPLETELY and then
    * throws — landing the failure in the window after the data commit
    * and before Spark's offset/commit-log write. One-shot: the restarted
    * query replays through the same instance without re-crashing. */
  private final class CrashAfterMergeSink(inner: MergeSink, crashOnCall: Int)
      extends MergeSink {
    val calls = new AtomicInteger(0)
    val rows = new AtomicLong(0L)
    private val crashed = new AtomicBoolean(false)
    override def mergeUpsert(b: DataFrame, c: IngestConfig): Unit = {
      val n = calls.incrementAndGet(); rows.addAndGet(b.count())
      inner.mergeUpsert(b, c)
      if (n == crashOnCall && crashed.compareAndSet(false, true))
        throw new RuntimeException(
          "injected crash: data committed, offset not")
    }
    override def mergeSoftDelete(b: DataFrame, c: IngestConfig): Unit =
      inner.mergeSoftDelete(b, c)
    override def mergeHardDelete(b: DataFrame, c: IngestConfig): Unit =
      inner.mergeHardDelete(b, c)
  }

  private def stateOf(t: TargetTable): Map[Long, (Long, String)] =
    new ParquetTarget(spark, t).read().get
      .collect()
      .map(r => r.getAs[Long]("pkey") ->
        ((r.getAs[Long]("ver"), r.getAs[String]("payload")))).toMap

  /** Uninterrupted control: one query, fresh checkpoint, all data. */
  private def controlState(all: Seq[Ev], dir: Path): Map[Long, (Long, String)] = {
    val src = dir.resolve("control_src")
    writeOneFile(all, src, "all.parquet")
    val target = TargetTable("ctl", dir.resolve("control_target").toString,
      keyCols = Seq("pkey"), versionCol = "ver", tieBreakCols = Seq("seq"))
    val cfg = IngestConfig(name = s"ctl-${System.nanoTime()}",
      maxWriterPartitions = 2,
      checkpointDir = Some(dir.resolve("control_ckpt").toString))
    val q = new UpsertStream(spark, cfg, target)
      .run(fileStream(src), Trigger.AvailableNow())
    q.awaitTermination()
    stateOf(target)
  }

  // Three files of distinct sizes so the counters pin which batches each
  // run processed; keys overlap across files so the merge is exercised.
  private val f1 = Seq(Ev(1, 10, 1, "a0"), Ev(2, 20, 2, "b0"), Ev(3, 5, 3, "c0"))
  private val f2 = Seq(Ev(1, 12, 4, "a1"), Ev(4, 1, 5, "d0"))
  private val f3 = Seq(Ev(2, 25, 6, "b1"), Ev(3, 4, 7, "stale-c"),
    Ev(5, 9, 8, "e0"), Ev(1, 11, 9, "late-stale-a"))
  private val all = f1 ++ f2 ++ f3

  private def oracle(rows: Seq[Ev]): Map[Long, (Long, String)] =
    Dedup.latestWins(rows.toDF(), Seq("pkey"), "ver", Seq("seq"))
      .collect()
      .map(r => r.getAs[Long]("pkey") ->
        ((r.getAs[Long]("ver"), r.getAs[String]("payload")))).toMap

  test("graceful mid-stream stop + restart on the SAME checkpoint " +
      "resumes offsets and converges to the uninterrupted state") {
    val dir = Files.createTempDirectory("graft_restart_stop_")
    val src = dir.resolve("src")
    val ckpt = dir.resolve("ckpt").toString
    val target = TargetTable("t", dir.resolve("target").toString,
      keyCols = Seq("pkey"), versionCol = "ver", tieBreakCols = Seq("seq"))

    // Run 1: two files visible, one file per trigger — `stop()` is
    // issued the moment batch 0's commit is visible, so it lands
    // MID-STREAM (trigger 2 in-flight or still pending) on the common
    // path. Whichever way the race resolves, the invariants below hold.
    writeOneFile(f1, src, "f1.parquet")
    writeOneFile(f2, src, "f2.parquet")
    val sink1 = new CountingSink(new ParquetTarget(spark, target))
    val cfg1 = IngestConfig(name = s"restart-a-${System.nanoTime()}",
      maxWriterPartitions = 2, checkpointDir = Some(ckpt))
    val q1 = new UpsertStream(cfg1, sink1, ckpt)
      .run(fileStream(src), Trigger.ProcessingTime(10L))
    awaitFirstBatch(q1)
    q1.stop()
    val run1Calls = sink1.calls.get()
    val run1Rows = sink1.rows.get()
    assert(run1Calls >= 1 && run1Rows >= math.min(f1.size, f2.size),
      "at least batch 0 must have merged before the stop")

    // Late data arrives while the engine is down.
    writeOneFile(f3, src, "f3.parquet")

    // Run 2: NEW query, SAME checkpoint, drain everything.
    val sink2 = new CountingSink(new ParquetTarget(spark, target))
    val cfg2 = IngestConfig(name = s"restart-b-${System.nanoTime()}",
      maxWriterPartitions = 2, checkpointDir = Some(ckpt))
    val q2 = new UpsertStream(cfg2, sink2, ckpt)
      .run(fileStream(src), Trigger.AvailableNow())
    q2.awaitTermination()

    if (run1Calls == 1) {
      // Common path: the stop landed after exactly batch 0 — the resume
      // must process EXACTLY the pending remainder (offsets resumed; the
      // committed batch is never re-read, the pending files never lost).
      assert(sink2.rows.get() == all.size - run1Rows,
        "resume must process exactly the pending remainder")
      assert(sink2.calls.get() == 2)
    } else {
      // Rare path: trigger 2 squeezed in before the stop (its offset may
      // or may not have committed). Batch 0 is still never replayed, and
      // at-least-once delivery still covers every row.
      assert(sink2.rows.get() <= all.size - math.min(f1.size, f2.size),
        "resume must never replay the committed batch 0")
      assert(run1Rows + sink2.rows.get() >= all.size,
        "no row may be lost across the restart")
    }

    val finalState = stateOf(target)
    assert(finalState == oracle(all))
    assert(finalState == controlState(all, dir))
  }

  test("crash BETWEEN data commit and offset commit: restart replays the " +
      "batch and the latest-wins merge absorbs it exactly-once") {
    val dir = Files.createTempDirectory("graft_restart_crash_")
    val src = dir.resolve("src")
    val ckpt = dir.resolve("ckpt").toString
    val target = TargetTable("t", dir.resolve("target").toString,
      keyCols = Seq("pkey"), versionCol = "ver", tieBreakCols = Seq("seq"))
    writeOneFile(f1, src, "f1.parquet")
    writeOneFile(f2, src, "f2.parquet")
    writeOneFile(f3, src, "f3.parquet")

    // Crash on the SECOND merge: batch 0 fully committed, batch 1's data
    // merged but its offset never committed — the at-least-once window.
    val sink = new CrashAfterMergeSink(new ParquetTarget(spark, target), 2)
    val cfg1 = IngestConfig(name = s"crash-a-${System.nanoTime()}",
      maxWriterPartitions = 2, checkpointDir = Some(ckpt))
    val q1 = new UpsertStream(cfg1, sink, ckpt)
      .run(fileStream(src), Trigger.AvailableNow())
    val failure = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }
    assert(failure.getMessage.contains("injected crash") ||
      Option(failure.getCause).exists(_.getMessage.contains("injected crash")))
    assert(sink.calls.get() == 2, "query must die on batch 1")

    // Restart on the SAME checkpoint through the SAME sink instance:
    // Spark replays batch 1 from the offset log (its data was already
    // merged once), then continues with batch 2.
    val cfg2 = IngestConfig(name = s"crash-b-${System.nanoTime()}",
      maxWriterPartitions = 2, checkpointDir = Some(ckpt))
    val q2 = new UpsertStream(cfg2, sink, ckpt)
      .run(fileStream(src), Trigger.AvailableNow())
    q2.awaitTermination()

    // 3 files + exactly one replayed batch = 4 merges; delivery was
    // at-least-once (one batch's rows counted twice), effect exactly-once.
    assert(sink.calls.get() == 4, "exactly one batch may be replayed")
    assert(sink.rows.get() > all.size, "the replayed batch re-delivered rows")

    val finalState = stateOf(target)
    assert(finalState == oracle(all))
    assert(finalState == controlState(all, dir))
  }
}
