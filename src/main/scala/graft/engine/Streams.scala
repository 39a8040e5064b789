package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, Trigger}
import org.apache.spark.sql.types.StructType

import graft.model.{IngestConfig, IngestContract, TargetTable}
import graft.sink.{MergeSink, ParquetTarget}

/** The four public processors of the reference, re-expressed as Structured
  * Streaming pipelines (quick_stream entry points: `UpsertQuickStream::run`
  * `src/upsert.rs:77`, `DeleteQuickStream::run` `src/delete.rs:71`,
  * `MultiTableUpsertQuickStream::run` `src/upsert/multi_table_upsert.rs:72`,
  * `MultiTableDeleteQuickStream::run` `src/delete/multi_table_delete.rs:386`).
  *
  * What the reference hand-rolls and Spark owns natively (SURVEY.md §2):
  *  - lag-cycle accumulation (O4)  → micro-batch trigger interval
  *    (`IngestConfig.triggerMillis`, applied as the default trigger here)
  *  - sender pools / scaling (O8,O9) → task scheduler + dynamic allocation
  *  - bounded-channel backpressure (O10) → next trigger waits for
  *    `foreachBatch` to return; `Sources` applies the per-trigger volume
  *    bound (`IngestConfig.maxRecordsPerTrigger`) at the source
  *  - graceful shutdown (O11) → shutdown hook + `query.stop()`, plus
  *    checkpointed restart the reference entirely lacks
  */
object Streams {

  /** Wire a streaming source into a per-batch merge action with the
    * config's trigger applied. ALL processors start through here, so the
    * builder knobs (`withIntroducedLag*` → `triggerMillis`) are live. */
  private[graft] def start(
      source: DataFrame,
      config: IngestConfig,
      defaultCheckpoint: String,
      trigger: Option[Trigger],
      outputMode: Option[String] = None)(
      action: (Dataset[Row], Long) => Unit): StreamingQuery = {
    if (config.printConfig) {
      // Reference: print_connection_configuration / pool-status table
      // (src/upsert.rs:515-549). Here: one structured line at start.
      println(s"[graft:${config.name}] trigger=${config.triggerMillis}ms " +
        s"writers=${config.maxWriterPartitions} " +
        s"rateLimit=${config.maxRecordsPerTrigger}")
    }
    val w = source.writeStream
      .queryName(config.name)
      .option("checkpointLocation", config.checkpointDir.getOrElse(defaultCheckpoint))
      .trigger(trigger.getOrElse(Trigger.ProcessingTime(config.triggerMillis)))
    outputMode.foreach(w.outputMode)
    w.foreachBatch(action).start()
  }

  /** Deterministic default checkpoint for a multi-table processor: derived
    * from the lexicographically smallest table name, so it cannot drift
    * with Map iteration order between runs (which would silently abandon
    * stream progress and replay from scratch). */
  private[engine] def multiCheckpoint(
      catalog: Map[String, TargetTable], suffix: String): String =
    catalog(catalog.keys.min).path + suffix
}

/** Source constructors that apply `IngestConfig`'s admission-control knobs
  * to the source — the reference's `max_records_per_cycle_batch` +
  * `buffer_size` backpressure bound (quick_stream `src/upsert.rs:313`,
  * `:433-440`). Spark's file source admits whole files per trigger, so the
  * per-record bound maps to `maxFilesPerTrigger` via a caller-supplied
  * records-per-file hint; a Kafka source would use `maxOffsetsPerTrigger`
  * directly. */
object Sources {

  private def rated(
      spark: SparkSession,
      config: IngestConfig,
      schema: StructType,
      recordsPerFileHint: Long): org.apache.spark.sql.streaming.DataStreamReader = {
    val files = math.max(1L, config.maxRecordsPerTrigger / math.max(1L, recordsPerFileHint))
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", files.toString)
  }

  /** Parquet file stream with the rate limit applied. */
  def parquet(
      spark: SparkSession,
      config: IngestConfig,
      schema: StructType,
      path: String,
      recordsPerFileHint: Long = 100000L): DataFrame =
    rated(spark, config, schema, recordsPerFileHint).parquet(path)

  /** CSV file stream (header assumed) with the rate limit applied. */
  def csv(
      spark: SparkSession,
      config: IngestConfig,
      schema: StructType,
      path: String,
      recordsPerFileHint: Long = 100000L): DataFrame =
    rated(spark, config, schema, recordsPerFileHint)
      .option("header", "true").csv(path)

  /** JSON-lines file stream with the rate limit applied. */
  def json(
      spark: SparkSession,
      config: IngestConfig,
      schema: StructType,
      path: String,
      recordsPerFileHint: Long = 100000L): DataFrame =
    rated(spark, config, schema, recordsPerFileHint).json(path)

  /** JSON-lines stream that ROUTES malformed records instead of dropping
    * or dying on them (the reference logs per-record failures and moves
    * on, `src/upsert.rs:286-294`; silently losing bad rows corrupts
    * ingestion accounting at scale). PERMISSIVE parsing captures each
    * unparseable line verbatim in `quarantineCol`; callers split on
    * `IS NULL` — parsed rows to the merge, quarantined lines to a
    * dead-letter target for replay after a schema fix. Caveat: Spark
    * refuses a query over raw JSON that references ONLY the internal
    * corrupt-record column (AnalysisException), so the dead-letter
    * projection must include at least one data column, or the micro-batch
    * must be cached/persisted before splitting. */
  def jsonWithQuarantine(
      spark: SparkSession,
      config: IngestConfig,
      schema: StructType,
      path: String,
      quarantineCol: String = "_corrupt_record",
      recordsPerFileHint: Long = 100000L): DataFrame =
    rated(spark, config,
      schema.add(quarantineCol, org.apache.spark.sql.types.StringType),
      recordsPerFileHint)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", quarantineCol)
      .json(path)

  /** Kafka source with the per-record admission bound applied DIRECTLY:
    * `maxOffsetsPerTrigger = maxRecordsPerTrigger` (offsets are records,
    * so no per-file hint is needed). This is the closest analog of the
    * reference's bounded mpsc channel (`src/lib.rs:158`,
    * `src/upsert.rs:313`): an unbounded ordered queue the engine drains
    * at most `maxRecordsPerTrigger` per micro-batch, with backpressure
    * for free (the next admission waits for the merge to finish).
    * Requires the spark-sql-kafka connector on the classpath; options
    * (auth, TLS) pass through `extraOptions`.
    *
    * TESTING CAVEAT: this path has never executed end-to-end — the
    * development environment ships no Kafka connector jar and no broker,
    * so coverage is (a) the option mapping asserted here and (b) the
    * broker-free twin [[rateMicroBatch]], which exercises the same
    * direct-offset admission contract per trigger (`SourcesSpec`). Before
    * first production use, run one end-to-end soak against a real broker:
    * verify offsets commit through the checkpoint, admission matches
    * `maxRecordsPerTrigger`, and restart resumes without gaps. */
  def kafka(
      spark: SparkSession,
      config: IngestConfig,
      bootstrapServers: String,
      subscribe: String,
      extraOptions: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.readStream.format("kafka")
    kafkaOptions(config, bootstrapServers, subscribe, extraOptions)
      .foreach { case (k, v) => r.option(k, v) }
    r.load()
  }

  /** The exact option map [[kafka]] hands the connector — exposed as a
    * pure function so the contract is assertable WITHOUT a broker or
    * connector jar (`KafkaReadinessSpec`): admission control maps
    * `IngestConfig.maxRecordsPerTrigger` onto `maxOffsetsPerTrigger`
    * verbatim (the [[rateMicroBatch]] twin admits the same bound via
    * `rowsPerBatch`), and caller options (auth/TLS `kafka.ssl.*`,
    * `startingOffsets`, group prefixes) pass through UNLESS they would
    * clobber the three core keys, which the engine owns. */
  def kafkaOptions(
      config: IngestConfig,
      bootstrapServers: String,
      subscribe: String,
      extraOptions: Map[String, String] = Map.empty): Map[String, String] = {
    val core = Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> subscribe,
      "maxOffsetsPerTrigger" -> config.maxRecordsPerTrigger.toString)
    (extraOptions -- core.keySet) ++ core
  }

  /** Built-in offset-based source that admits EXACTLY
    * `maxRecordsPerTrigger` rows per micro-batch — the in-process,
    * deterministic stand-in for [[kafka]]'s `maxOffsetsPerTrigger`
    * (same admission-control contract, testable without a broker).
    * Emits (timestamp, value) rows; value is a monotone Long offset. */
  def rateMicroBatch(spark: SparkSession, config: IngestConfig): DataFrame =
    spark.readStream
      .format("rate-micro-batch")
      .option("rowsPerBatch", config.maxRecordsPerTrigger.toString)
      .load()
}

/** Single-table latest-wins upsert ingestion (reference §3.1) into any
  * [[MergeSink]] — bucketed parquet by default, a JDBC database for true
  * reference parity (`new UpsertStream(cfg, new JdbcSink(jt), ckpt)`;
  * JDBC sinks have no storage path, so the checkpoint seed is explicit). */
final class UpsertStream(
    config: IngestConfig,
    sink: MergeSink,
    defaultCheckpoint: String) {

  def this(spark: SparkSession, config: IngestConfig, target: TargetTable) =
    this(config, new ParquetTarget(spark, target, config.leaseSettleMillis),
      target.path + "_ckpt")

  def run(source: DataFrame): StreamingQuery = runWith(source, None)
  def run(source: DataFrame, trigger: Trigger): StreamingQuery =
    runWith(source, Some(trigger))

  private def runWith(source: DataFrame, trigger: Option[Trigger]): StreamingQuery =
    Streams.start(source, config, defaultCheckpoint, trigger) {
      (batch: Dataset[Row], _: Long) => sink.mergeUpsert(batch, config)
    }
}

/** Single-table delete ingestion; `soft = true` flips the tombstone flag
  * (reference §3.2 "data soft deleter"), else rows are removed. Takes any
  * [[MergeSink]] like [[UpsertStream]]. */
final class DeleteStream(
    config: IngestConfig,
    sink: MergeSink,
    defaultCheckpoint: String,
    soft: Boolean) {

  def this(spark: SparkSession, config: IngestConfig, target: TargetTable,
      soft: Boolean = true) =
    this(config, new ParquetTarget(spark, target, config.leaseSettleMillis),
      target.path + "_del_ckpt", soft)

  def run(source: DataFrame): StreamingQuery = runWith(source, None)
  def run(source: DataFrame, trigger: Trigger): StreamingQuery =
    runWith(source, Some(trigger))

  private def runWith(source: DataFrame, trigger: Option[Trigger]): StreamingQuery =
    Streams.start(source, config, defaultCheckpoint, trigger) {
      (batch: Dataset[Row], _: Long) =>
        if (soft) sink.mergeSoftDelete(batch, config)
        else sink.mergeHardDelete(batch, config)
    }
}

/** Merge-on-read DELETE stream: each micro-batch's keys mark positions
  * in the target's deletion-vector sidecar
  * ([[graft.sink.ParquetTarget.deleteVectoredKeys]]) — the
  * zero-rewrite third deletion mode beside [[DeleteStream]]'s soft
  * (tombstone flag) and hard (bucket rewrite) paths: delete throughput
  * is decoupled from row width and bucket size, the right trade when
  * deletes are frequent and reads can absorb a small anti-join until
  * the next compaction materializes the vector. */
final class VectoredDeleteStream(
    config: IngestConfig,
    target: ParquetTarget,
    defaultCheckpoint: String) {

  def this(spark: SparkSession, config: IngestConfig, table: TargetTable) =
    this(config, new ParquetTarget(spark, table, config.leaseSettleMillis),
      table.path + "_vdel_ckpt")

  def run(source: DataFrame): StreamingQuery = runWith(source, None)
  def run(source: DataFrame, trigger: Trigger): StreamingQuery =
    runWith(source, Some(trigger))

  private def runWith(
      source: DataFrame, trigger: Option[Trigger]): StreamingQuery =
    Streams.start(source, config, defaultCheckpoint, trigger) {
      (batch: Dataset[Row], _: Long) =>
        target.deleteVectoredKeys(batch, config)
    }
}

/** Multi-table fan-out (reference §3.3): records carry a routing column;
  * each batch is cached once and filtered per table — N cheap scans of one
  * in-memory batch, not N source scans (SURVEY.md §7 "what's hard" (b)).
  * Records routed to unknown tables are dropped, mirroring the reference's
  * static `tables()` routing domain. The catalog maps routing keys to ANY
  * [[MergeSink]] — parquet targets or JDBC tables (the reference's
  * MultiTableUpsertQuickStream routes to multiple Postgres tables,
  * `src/upsert/multi_table_upsert.rs:72`); sinks may be mixed. */
final class MultiTableUpsertStream(
    config: IngestConfig,
    sinks: Map[String, MergeSink],
    defaultCheckpoint: String,
    tableCol: String) {
  require(sinks.nonEmpty, "catalog must not be empty")

  def this(spark: SparkSession, config: IngestConfig,
      catalog: Map[String, TargetTable],
      tableCol: String = IngestContract.TableCol) =
    this(config,
      catalog.map { case (n, t) =>
        (n, new ParquetTarget(spark, t, config.leaseSettleMillis): MergeSink) },
      Streams.multiCheckpoint(catalog, "_multi_ckpt"), tableCol)

  def run(source: DataFrame): StreamingQuery = runWith(source, None)
  def run(source: DataFrame, trigger: Trigger): StreamingQuery =
    runWith(source, Some(trigger))

  private def runWith(source: DataFrame, trigger: Option[Trigger]): StreamingQuery =
    Streams.start(source, config, defaultCheckpoint, trigger) {
      (batch: Dataset[Row], _: Long) =>
        val cached = batch.persist()
        try {
          sinks.foreach { case (name, sink) =>
            val slice = cached.filter(col(tableCol) === name).drop(tableCol)
            if (!slice.isEmpty) sink.mergeUpsert(slice, config)
          }
        } finally { cached.unpersist(); () }
    }
}

/** Multi-table delete fan-out. NOTE: the reference has NO public builder
  * for its multi-table delete processor (gap documented in SURVEY.md §2.2,
  * verifiable at quick_stream `src/builder.rs:161-222`); this engine fixes
  * that — `QuickStreamBuilder.buildMultiTableDelete` is first-class.
  * Catalog semantics as in [[MultiTableUpsertStream]] (any MergeSink). */
final class MultiTableDeleteStream(
    config: IngestConfig,
    sinks: Map[String, MergeSink],
    defaultCheckpoint: String,
    tableCol: String,
    soft: Boolean) {
  require(sinks.nonEmpty, "catalog must not be empty")

  def this(spark: SparkSession, config: IngestConfig,
      catalog: Map[String, TargetTable],
      tableCol: String = IngestContract.TableCol,
      soft: Boolean = true) =
    this(config,
      catalog.map { case (n, t) =>
        (n, new ParquetTarget(spark, t, config.leaseSettleMillis): MergeSink) },
      Streams.multiCheckpoint(catalog, "_multi_del_ckpt"), tableCol, soft)

  def run(source: DataFrame): StreamingQuery = runWith(source, None)
  def run(source: DataFrame, trigger: Trigger): StreamingQuery =
    runWith(source, Some(trigger))

  private def runWith(source: DataFrame, trigger: Option[Trigger]): StreamingQuery =
    Streams.start(source, config, defaultCheckpoint, trigger) {
      (batch: Dataset[Row], _: Long) =>
        val cached = batch.persist()
        try {
          sinks.foreach { case (name, sink) =>
            val slice = cached.filter(col(tableCol) === name).drop(tableCol)
            if (!slice.isEmpty) {
              if (soft) sink.mergeSoftDelete(slice, config)
              else sink.mergeHardDelete(slice, config)
            }
          }
        } finally { cached.unpersist(); () }
    }
}

/** Queryable per-batch progress metrics — the reference's pool-status
  * printer (`src/upsert.rs:515-549`) upgraded from log lines to a bounded
  * in-memory table: every micro-batch records (query, batchId, input
  * rows, batch duration, rows/sec), oldest entries evicted past
  * `maxBatches`. `snapshot(spark)` exposes it as a DataFrame so
  * operational dashboards query metrics with the same API as data. */
final class MetricsListener(maxBatches: Int = 1000)
    extends StreamingQueryListener {

  private val buf =
    new java.util.concurrent.ConcurrentLinkedDeque[MetricsListener.Batch]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    buf.addLast(MetricsListener.Batch(
      String.valueOf(p.name), p.batchId, p.numInputRows,
      p.durationMs.getOrDefault("triggerExecution", 0L),
      p.processedRowsPerSecond))
    while (buf.size() > maxBatches) buf.pollFirst()
  }

  def snapshot(spark: SparkSession): DataFrame = {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    buf.iterator().asScala.toSeq.toDF()
  }
}

object MetricsListener {
  final case class Batch(
      query: String, batchId: Long, numInputRows: Long,
      triggerMillis: Long, processedRowsPerSecond: Double)
}

/** Graceful shutdown + observability (reference O11 `shutdown_service.rs`
  * and the pool-status printer `src/upsert.rs:515-549`). Registers a JVM
  * shutdown hook that stops the query, and a [[MetricsListener]] that
  * records per-batch progress (returned for querying). Restart-exactly-
  * once comes free from checkpointing. */
object GracefulShutdown {
  def install(spark: SparkSession, query: StreamingQuery): MetricsListener = {
    sys.addShutdownHook {
      try query.stop()
      catch { case _: Throwable => () }
    }
    val metrics = new MetricsListener()
    spark.streams.addListener(metrics)
    metrics
  }
}
