package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride through the
  * engine as opaque `binary` columns plus a typed metadata struct, and
  * decode / feature-extraction runs as BATCHED partition-local work — the
  * Spark-side shape a real decoder (JNI image lib, ffmpeg bridge, ONNX
  * featurizer) plugs into.
  *
  * The decode kernel here is a clearly-marked deterministic STUB (media
  * codecs aren't available in this environment): it derives pseudo-metadata
  * from a byte checksum. Everything around it — the schema, the typed
  * Dataset API, the `mapPartitions` batching (amortize per-batch model/
  * codec init, exactly like an Arrow-batched UDF), the binary column
  * transport — is the real production plumbing and is tested end-to-end.
  *
  * Scale notes: decode is row-local map work after an optional
  * `repartition(n)` to right-size batches per executor; binary payloads
  * stay columnar in parquet (no row-group explosion) and the metadata
  * projection prunes the binary column away for downstream consumers that
  * only need dimensions.
  */
object Multimodal {

  /** A record carrying an opaque media payload. */
  final case class MediaRecord(id: Long, mediaType: String, content: Array[Byte])

  /** Typed decode output: metadata only — the binary column is dropped so
    * downstream scans never touch payload bytes. */
  final case class MediaMeta(
      id: Long, mediaType: String, nBytes: Long, checksum: Long,
      width: Int, height: Int, nFrames: Int)

  /** Shared modulus — the oracle-equality contract depends on every
    * pipeline using the one constant. */
  private val P = graft.functions.TextHash.P

  /** STUB decode kernel — deterministic fake standing in for a real codec.
    * A production build replaces ONLY this function (same signature:
    * one batch in, metadata out; per-batch init happens once per call). */
  private def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaMeta] = {
    // real codec init would happen here, once per batch
    batch.map { r =>
      var a = 7L
      var i = 0
      while (i < r.content.length) { a = (a * 31L + (r.content(i) & 0xff)) % P; i += 1 }
      val frames = r.mediaType match {
        case "video" => (a % 240L + 1L).toInt
        case "audio" => (a % 48000L + 1L).toInt // samples, abusing the field
        case _ => 1
      }
      MediaMeta(r.id, r.mediaType, r.content.length.toLong, a,
        (a % 640L + 1L).toInt, (a / 640L % 480L + 1L).toInt, frames)
    }
  }

  /** Batched decode over a typed Dataset: partitions stream through in
    * `batchSize` groups (the Arrow-batch shape), each handed to the
    * kernel. */
  def decode(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(batchSize).flatMap(g => decodeBatch(g.toSeq)))
  }

  /** Lift a DataFrame with a binary column into the media contract and
    * decode it. `typeCol` tags the payload kind (image/audio/video). */
  def decodeFrame(
      df: DataFrame, idCol: String, binCol: String, typeCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    val ds = df.select(
      col(idCol).cast("long").as("id"),
      col(typeCol).cast("string").as("mediaType"),
      col(binCol).cast("binary").as("content")).as[MediaRecord]
    decode(ds, batchSize).toDF()
  }

  // ---- metadata-stage transforms (post-decode, pure column arithmetic —
  // codegen'd, no UDF; a real pixel/audio kernel would slot into the same
  // batched-partition shape as decodeBatch) ------------------------------

  /** Aspect-preserving resize plan: integer math in per-mille scale so the
    * result is exact and oracle-expressible. Emits out_w/out_h alongside
    * the input metadata. All quotients are small rationals, so the
    * double-division floor equals exact integer division (the oracle's
    * `//`): the quotient's distance to an integer is >= 1/divisor, far
    * above double rounding error at these magnitudes. */
  def resizePlan(meta: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    def idiv(a: Column, b: Column): Column = floor(a / b).cast("long")
    val sw = idiv(lit(maxW.toLong * 1000L), col("width"))
    val sh = idiv(lit(maxH.toLong * 1000L), col("height"))
    val scale = least(sw, sh, lit(1000L)) // never upscale
    meta
      .withColumn("out_w",
        greatest(lit(1L), idiv(col("width") * scale, lit(1000L))).cast("int"))
      .withColumn("out_h",
        greatest(lit(1L), idiv(col("height") * scale, lit(1000L))).cast("int"))
  }

  /** Evenly-spaced frame-sampling plan: k indices over [0, nFrames-1]
    * (fewer when the clip is shorter). Exact integer spacing —
    * idx_i = i*(n-1) div (k-1) — so the DuckDB oracle re-derives it. */
  def frameSamplePlan(meta: DataFrame, k: Int): DataFrame = {
    require(k >= 2, "frame sampling needs k >= 2")
    val n = col("nFrames").cast("long")
    val idx = when(n <= k,
      sequence(lit(0L), n - 1L))
      .otherwise(transform(sequence(lit(0), lit(k - 1)),
        i => floor(i.cast("long") * (n - 1L) / lit((k - 1).toLong)).cast("long")))
    meta.withColumn("frame_idx", idx)
  }

  /** Deterministic pseudo-feature vector from the decode checksum — the
    * stub standing in for a real featurizer (ONNX/CLIP-style), keeping the
    * schema/batching contract: `dim` doubles in [0, 1). */
  def featurePlan(meta: DataFrame, dim: Int): DataFrame = {
    val feats = (0 until dim).map { j =>
      (((col("checksum") * (2L * j + 1L) + 12345L * (j + 1L)) % P) .cast("double") / P)
        .as(s"f$j")
    }
    meta.select((meta.columns.map(col).toSeq ++ feats): _*)
  }
}
