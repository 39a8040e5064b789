package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride through the
  * engine as opaque `binary` columns plus a typed metadata struct, and
  * decode / feature-extraction runs as BATCHED partition-local work — the
  * Spark-side shape a real decoder (JNI image lib, ffmpeg bridge, ONNX
  * featurizer) plugs into.
  *
  * The decode kernels are REAL pure-JVM byte decoders — container
  * headers for PNG (IHDR), JPEG (SOFn scan), GIF (logical screen
  * descriptor + image-descriptor block walk for the frame count), and
  * RIFF/WAVE (fmt + data chunks); full PIXEL decode for 8-bit
  * non-interlaced PNG ([[pngPixels]]: zlib inflate, the five scanline
  * filters, gray/RGB/palette/alpha channel collapse to integer luma)
  * for GIF87a/89a ([[gifPixels]]/[[gifFrames]]: variable-width LZW with
  * table growth and CLEAR/KwKwK handling, four-pass de-interlace,
  * local-over-global palette, multi-frame walk with stride sampling
  * that never LZW-decodes skipped frames), AND for uncompressed BMP
  * ([[bmpPixels]]: 8-bit paletted / 24-bit BGR, bottom-up or top-down,
  * row padding) — all collapsing to the same BT.601 luma, so one
  * [[decodePixels]] sniff-dispatch point feeds every raster operator;
  * full SAMPLE decode for 16-bit PCM WAV ([[wavWindowEnergy]],
  * [[wavWindowZcr]]) — all
  * public file-format knowledge, no codec libraries. Payloads in none
  * of those containers fall back to deterministic checksum-derived
  * pseudo-metadata (the documented unknown-codec path — e.g. JPEG
  * entropy decode stays out of scope). Everything around the kernels —
  * the schema, the typed Dataset API, the `mapPartitions` batching
  * (amortize per-batch model/codec init, exactly like an Arrow-batched
  * UDF), the binary column transport — is the real production plumbing
  * and is tested end-to-end.
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

  // ---- header parsers (public file-format structure; byte offsets cited
  // against the format specs: PNG (RFC 2083 §3), JPEG (ITU T.81 B.2.2),
  // GIF89a spec §§18-20, RIFF/WAVE (Microsoft multimedia formats)) -------

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)

  /** PNG: 8-byte signature, then the IHDR chunk is REQUIRED first —
    * width/height are the big-endian u32s at offsets 16 and 20. */
  private def pngDims(b: Array[Byte]): Option[(Int, Int, Int)] =
    if (b.length >= 24 &&
      u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      u8(b, 4) == 0x0d && u8(b, 5) == 0x0a && u8(b, 6) == 0x1a && u8(b, 7) == 0x0a &&
      b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some((be32(b, 16).toInt, be32(b, 20).toInt, 1))
    else None

  /** JPEG: walk FF-prefixed segments from SOI until a frame header
    * (SOF0-SOF15 minus DHT/JPG/DAC): height is the be16 at seg+5,
    * width at seg+7. Segment length includes its own two bytes. */
  private def jpegDims(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    var i = 2
    while (i + 8 < b.length && u8(b, i) == 0xff) {
      val m = u8(b, i + 1)
      if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
        return Some((be16(b, i + 7), be16(b, i + 5), 1))
      else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) i += 2 // bare markers
      else {
        val seglen = be16(b, i + 2)
        if (seglen < 2) return None // corrupt length: would loop forever
        i += 2 + seglen
      }
    }
    None
  }

  /** GIF: width/height are the le16s of the logical screen descriptor
    * (offsets 6/8); the frame count WALKS the block structure — skip the
    * global color table if flagged, then 0x21 extensions and 0x2C image
    * descriptors (each descriptor + optional local color table + LZW
    * sub-blocks) until the 0x3B trailer. Truncated/corrupt block chains
    * return None rather than a half-parsed frame count. */
  private def gifDims(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 13 || b(0) != 'G' || b(1) != 'I' || b(2) != 'F' || b(3) != '8' ||
      (b(4) != '7' && b(4) != '9') || b(5) != 'a') return None
    val w = le16(b, 6); val h = le16(b, 8)
    val packed = u8(b, 10)
    var i = 13 + (if ((packed & 0x80) != 0) 3 * (1 << ((packed & 7) + 1)) else 0)
    var frames = 0
    def skipSubBlocks(from: Int): Int = { // returns index past the 0 terminator
      var j = from
      while (j < b.length && u8(b, j) != 0) j += 1 + u8(b, j)
      j + 1
    }
    while (i < b.length) {
      u8(b, i) match {
        case 0x3b => return Some((w, h, frames)) //                    trailer
        case 0x21 => //                                 extension: label + subs
          if (i + 2 > b.length) return None
          i = skipSubBlocks(i + 2)
        case 0x2c => //  image descriptor: 9 bytes + LCT? + min-code + blocks
          if (i + 10 >= b.length) return None //                     truncated
          val lct = u8(b, i + 9)
          i = i + 10 + (if ((lct & 0x80) != 0) 3 * (1 << ((lct & 7) + 1)) else 0)
          if (i + 1 > b.length) return None
          i = skipSubBlocks(i + 1)
          frames += 1
        case _ => return None //                          corrupt block chain
      }
    }
    None //                                            ran off the end: truncated
  }

  /** RIFF/WAVE: chunk-walk from offset 12 for `fmt ` (channels le16 at
    * data+2, sample rate le32 at +4, block align le16 at +12) and `data`
    * (payload byte count). Audio maps onto the fixed meta schema as
    * (width, height, nFrames) = (channels, sampleRate, samples-per-channel). */
  private def wavDims(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 44 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
      b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
    var i = 12
    var channels = 0; var rate = 0L; var align = 0; var dataLen = -1L
    var corrupt = false
    while (!corrupt && i + 8 <= b.length) {
      val id = new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val len = le32(b, i + 4)
      if (len > b.length) corrupt = true // corrupt chunk length: stop walking
      else {
        if (id == "fmt " && len >= 16 && i + 8 + 16 <= b.length) {
          channels = le16(b, i + 10); rate = le32(b, i + 12); align = le16(b, i + 20)
        } else if (id == "data") dataLen = len
        i += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
      }
    }
    if (corrupt) return None
    if (channels > 0 && align > 0 && dataLen >= 0)
      Some((channels, rate.toInt, (dataLen / align).toInt))
    else None
  }

  /** BMP header dims (single-frame): delegates validation to the
    * [[bmpPixels]] header rules without decoding the pixel array. */
  private def bmpDims(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    if (le32(b, 14) < 40) return None
    val w = le32(b, 18).toInt; val h = math.abs(le32(b, 22).toInt)
    if (w <= 0 || h <= 0) None else Some((w, h, 1))
  }

  /** TIFF header dims (single-frame): ImageWidth/ImageLength from the
    * [[tiffMeta]] IFD walk. */
  private def tiffDims(b: Array[Byte]): Option[(Int, Int, Int)] =
    tiffMeta(b).flatMap { case (_, tags, _) =>
      for {
        w <- tags.get(0x0100).collect { case Left(v) => v.toInt }
        h <- tags.get(0x0101).collect { case Left(v) => v.toInt }
        if w > 0 && h > 0
      } yield (w, h, 1)
    }

  /** MP4 dims for the header-meta chain: presentation width/height from
    * the [[mp4Meta]] box walk, integer milliseconds in the frames slot
    * (the [[wavDims]] convention of mapping the container's native
    * duration unit onto the fixed meta schema). */
  private def mp4Dims(b: Array[Byte]): Option[(Int, Int, Int)] =
    mp4Meta(b).collect { case (_, ts, dur, w, h, _) if w > 0 && h > 0 =>
      (w, h, (dur * 1000L / ts).toInt)
    }

  /** Decode kernel: real header parse first (PNG/JPEG/GIF/WAV/BMP/TIFF),
    * checksum
    * always (it feeds [[featurePlan]]), deterministic checksum-derived
    * pseudo-metadata as the unknown-codec fallback. A production build
    * replaces ONLY the fallback with a full codec (same signature: one
    * batch in, metadata out; per-batch init happens once per call). */
  private def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaMeta] = {
    // real codec init would happen here, once per batch
    batch.map { r =>
      var a = 7L
      var i = 0
      while (i < r.content.length) { a = (a * 31L + (r.content(i) & 0xff)) % P; i += 1 }
      val parsed = pngDims(r.content).orElse(jpegDims(r.content))
        .orElse(gifDims(r.content)).orElse(wavDims(r.content))
        .orElse(bmpDims(r.content)).orElse(tiffDims(r.content))
        .orElse(mp4Dims(r.content))
      parsed match {
        case Some((w, h, f)) =>
          MediaMeta(r.id, r.mediaType, r.content.length.toLong, a, w, h, f)
        case None =>
          val frames = r.mediaType match {
            case "video" => (a % 240L + 1L).toInt
            case "audio" => (a % 48000L + 1L).toInt // samples, abusing the field
            case _ => 1
          }
          MediaMeta(r.id, r.mediaType, r.content.length.toLong, a,
            (a % 640L + 1L).toInt, (a / 640L % 480L + 1L).toInt, frames)
      }
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

  /** One exact per-window PCM energy row. */
  final case class AudioWindow(
      id: Long, win: Long, n_samples: Long, sum_sq: Long)

  /** Windowed PCM energy from a RIFF/WAVE payload — the first multimodal
    * op that reads SAMPLE DATA, not just headers: walks the chunk list to
    * the `data` chunk, decodes the flat 16-bit LE sample stream, and
    * emits one row per `window`-sample block with the EXACT integer
    * energy Σv² (and `rms = sqrt(sum_sq/n)`, one IEEE division + sqrt —
    * both correctly-rounded, so engine-exact given exact integers).
    * Rows that are not valid 16-bit PCM WAV emit nothing.
    *
    * This is real byte-level audio decode (public RIFF/WAVE structure —
    * no codec library needed for uncompressed PCM), in the same batched
    * `mapPartitions` shape as [[decode]]; a resampler or filterbank
    * featurizer slots in behind the same sample iterator.
    *
    * Scale: row-local flatMap — no shuffle; output is
    * ⌈samples·channels / window⌉ rows per payload and the binary column
    * never survives past the operator. */
  def wavWindowEnergy(
      df: DataFrame, idCol: String, binCol: String, window: Int,
      batchSize: Int = 64): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    val ds = df.select(
      col(idCol).cast("long").as("id"),
      lit("audio").as("mediaType"),
      col(binCol).cast("binary").as("content")).as[MediaRecord]
    ds.mapPartitions(_.grouped(batchSize).flatMap(
        _.flatMap(r => pcmWindows(r.id, r.content, window))))
      .toDF()
      .withColumn("rms",
        sqrt(col("sum_sq").cast("double") / col("n_samples").cast("double")))
  }

  /** RIFF chunk-walk to the 16-bit PCM sample stream: (data offset,
    * flat sample count), or None when the container is not valid
    * 16-bit PCM WAV. Sample j reads as
    * `le16(b, off + 2j).toShort` (sign-extended). */
  private def pcm16Data(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 44 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
      b(3) != 'F' || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' ||
      b(11) != 'E') return None
    var i = 12
    var bits = 0; var dataOff = -1; var dataLen = -1L; var corrupt = false
    while (!corrupt && i + 8 <= b.length) {
      val cid = new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val len = le32(b, i + 4)
      if (len > b.length) corrupt = true
      else {
        if (cid == "fmt " && len >= 16 && i + 8 + 16 <= b.length)
          bits = le16(b, i + 22)
        else if (cid == "data") { dataOff = i + 8; dataLen = len }
        i += 8 + len.toInt + (len.toInt & 1)
      }
    }
    if (corrupt || dataOff < 0 || bits != 16) None
    else Some((dataOff,
      (math.min(dataLen, (b.length - dataOff).toLong) / 2L).toInt))
  }

  private def pcmWindows(
      id: Long, b: Array[Byte], window: Int): Seq[AudioWindow] = {
    val (dataOff, n) = pcm16Data(b).getOrElse(return Nil)
    val out = scala.collection.mutable.ArrayBuffer.empty[AudioWindow]
    var w = 0
    while (w.toLong * window < n) {
      val from = w * window
      val until = math.min(n, from + window)
      var s = 0L
      var j = from
      while (j < until) {
        val v = le16(b, dataOff + 2 * j).toShort.toLong // sign-extend
        s += v * v
        j += 1
      }
      out += AudioWindow(id, w.toLong, (until - from).toLong, s)
      w += 1
    }
    out.toSeq
  }

  /** One exact per-window PCM envelope/crossing row. */
  final case class AudioZcrWindow(
      id: Long, win: Long, n_samples: Long, zc_count: Long,
      peak_abs: Long, sum_abs: Long)

  /** Windowed zero-crossing count + amplitude envelope from 16-bit PCM —
    * the classic cheap voiced/unvoiced/silence discriminator beside
    * [[wavWindowEnergy]]'s energy: per `window`-sample block, the number
    * of consecutive-sample sign flips WITHIN the window (`v<0` vs
    * `v≥0`; boundary pairs belong to no window, so windows are
    * independently recomputable), the peak |v|, and Σ|v| — all exact
    * integers. A silence-trimmer keys on (zc, peak) jointly; a clipping
    * detector on peak≈32768. Same row-local batched-kernel shape and
    * scale posture as [[wavWindowEnergy]]. */
  def wavWindowZcr(
      df: DataFrame, idCol: String, binCol: String, window: Int,
      batchSize: Int = 64): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    val ds = df.select(
      col(idCol).cast("long").as("id"),
      lit("audio").as("mediaType"),
      col(binCol).cast("binary").as("content")).as[MediaRecord]
    ds.mapPartitions(_.grouped(batchSize).flatMap(_.flatMap { r =>
        pcm16Data(r.content) match {
          case None => Nil
          case Some((dataOff, n)) =>
            val out =
              scala.collection.mutable.ArrayBuffer.empty[AudioZcrWindow]
            var w = 0
            while (w.toLong * window < n) {
              val from = w * window
              val until = math.min(n, from + window)
              var zc = 0L; var peak = 0L; var sAbs = 0L
              var prevNeg = false
              var j = from
              while (j < until) {
                val v = le16(r.content, dataOff + 2 * j).toShort.toLong
                val a = math.abs(v)
                if (j > from && (v < 0L) != prevNeg) zc += 1L
                prevNeg = v < 0L
                if (a > peak) peak = a
                sAbs += a
                j += 1
              }
              out += AudioZcrWindow(r.id, w.toLong, (until - from).toLong,
                zc, peak, sAbs)
              w += 1
            }
            out.toSeq
        }
      }))
      .toDF()
  }

  /** One μ-law row: exact integer stats over the decoded linear PCM. */
  final case class MulawRow(
      id: Long, n_samples: Option[Long], sum_abs: Option[Long],
      peak_abs: Option[Long], energy: Option[Long])

  /** G.711 μ-law decode + stats — the telephony/callcenter audio shape
    * (8 kHz log-companded bytes, one sample per byte, no container):
    * decode each byte with the public closed form
    * ([[graft.functions.NativeKernels.mulawToPcm]]) and emit exact
    * integer (n_samples, Σ|pcm|, max|pcm|, Σpcm²) per row — the
    * silence/clipping/energy signals a speech-corpus filter keys on.
    * |pcm| ≤ 8159 so Σpcm² stays far inside BIGINT at any real clip
    * length. NULL/empty payloads surface as NULL rows (the 1:1 decoder
    * posture). Row-local batched kernel, no shuffle. */
  def mulawStats(
      df: DataFrame, idCol: String, binCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { case (id, b) =>
        if (b == null || b.length == 0) MulawRow(id, None, None, None, None)
        else {
          var i = 0
          var sAbs = 0L
          var peak = 0L
          var energy = 0L
          while (i < b.length) {
            val v = graft.functions.NativeKernels.mulawToPcm(b(i) & 0xff)
            val a = math.abs(v).toLong
            sAbs += a
            if (a > peak) peak = a
            energy += a * a
            i += 1
          }
          MulawRow(id, Some(b.length.toLong), Some(sAbs), Some(peak),
            Some(energy))
        }
      }))
      .toDF()
  }

  /** G.711 A-law decode + stats — μ-law's European twin (same one-byte-
    * per-sample telephony shape, different companding law): decode each
    * byte with the public ITU closed form
    * ([[graft.functions.NativeKernels.alawToPcm]]; note the post-XOR
    * sign-bit-set-means-POSITIVE trap) and emit the same exact integer
    * (n_samples, Σ|pcm|, max|pcm|, Σpcm²) row. |pcm| ≤ 32256 keeps
    * Σpcm² inside BIGINT at any real clip length. NULL/empty payloads
    * surface as NULL rows. Row-local batched kernel, no shuffle. */
  def alawStats(
      df: DataFrame, idCol: String, binCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { case (id, b) =>
        if (b == null || b.length == 0) MulawRow(id, None, None, None, None)
        else {
          var i = 0
          var sAbs = 0L
          var peak = 0L
          var energy = 0L
          while (i < b.length) {
            val v = graft.functions.NativeKernels.alawToPcm(b(i) & 0xff)
            val a = math.abs(v).toLong
            sAbs += a
            if (a > peak) peak = a
            energy += a * a
            i += 1
          }
          MulawRow(id, Some(b.length.toLong), Some(sAbs), Some(peak),
            Some(energy))
        }
      }))
      .toDF()
  }

  /** One Sun AU row: container header fields plus exact integer stats
    * over the decoded linear PCM. */
  final case class AuRow(
      id: Long, encoding: Option[Long], sample_rate: Option[Long],
      channels: Option[Long], n_samples: Option[Long],
      sum_abs: Option[Long], peak_abs: Option[Long], energy: Option[Long])

  /** Sun AU (.au/.snd) container decode + stats — the THIRD audio
    * container shape (after raw G.711 and WAV): a big-endian header
    * (magic ".snd", data offset ≥ 24 — annotation bytes between header
    * and data are skipped — data size or 0xffffffff for "unknown",
    * encoding, rate, channels) wrapping one of the three classic
    * encodings: 1 = 8-bit G.711 μ-law (decoded via the same
    * [[graft.functions.NativeKernels.mulawToPcm]] closed form as the
    * raw gate), 2 = 8-bit SIGNED linear PCM, 3 = 16-bit big-endian
    * linear PCM. Emits exact integer (Σ|pcm|, max|pcm|, Σpcm²) plus
    * the header fields. Bad magic, short header, offset past the
    * payload, unsupported encoding, or a half sample (odd byte count at
    * encoding 3) → NULL row, never a task failure. Row-local, no
    * shuffle. */
  def auStats(
      df: DataFrame, idCol: String, binCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { case (id, b) =>
        val bad = AuRow(id, None, None, None, None, None, None, None)
        if (b == null || b.length < 24 || b(0) != '.' || b(1) != 's' ||
          b(2) != 'n' || b(3) != 'd') bad
        else {
          def be32(o: Int): Long =
            ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
              ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
          val off = be32(4); val size = be32(8)
          val enc = be32(12); val rate = be32(16); val ch = be32(20)
          val end =
            if (size == 0xffffffffL) b.length.toLong
            else math.min(b.length.toLong, off + size)
          if (off < 24L || off > b.length.toLong || end < off ||
            enc < 1L || enc > 3L) bad
          else if (enc == 3L && ((end - off) & 1L) != 0L) bad
          else {
            val n =
              if (enc == 3L) ((end - off) / 2L).toInt else (end - off).toInt
            var sAbs = 0L; var peak = 0L; var energy = 0L
            var i = 0
            var p = off.toInt
            while (i < n) {
              val v = enc match {
                case 1L => graft.functions.NativeKernels.mulawToPcm(b(p) & 0xff)
                case 2L => b(p).toInt //              8-bit SIGNED linear
                case _ => (b(p) << 8) | (b(p + 1) & 0xff) //     16-bit BE
              }
              p += (if (enc == 3L) 2 else 1)
              val a = math.abs(v).toLong
              sAbs += a
              if (a > peak) peak = a
              energy += a * a
              i += 1
            }
            AuRow(id, Some(enc), Some(rate), Some(ch), Some(n.toLong),
              Some(sAbs), Some(peak), Some(energy))
          }
        }
      }))
      .toDF()
  }

  /** One Sobel row: exact integer gradient-energy stats over the
    * interior of the decoded luma raster. */
  final case class SobelRow(
      id: Long, width: Option[Int], height: Option[Int],
      n_interior: Option[Long], sobel_energy: Option[Long],
      strong_edges: Option[Long], energy_mean_q: Option[Long])

  /** Sobel gradient energy over the decoded luma raster — the classic
    * 3×3 edge operator as an exact integer aggregate: per interior
    * pixel gx/gy are the standard Sobel convolutions, the per-pixel
    * energy is |gx| + |gy| (L1 — stays integral, unlike the L2 norm),
    * and the row reports Σ energy, the count of strong edges
    * (energy > threshold), and the ×1000 mean. The sharpness /
    * structure readout used to filter blank or degenerate images in a
    * multimodal ingest pipeline. Any [[decodePixels]] codec feeds it;
    * degenerate rasters (w or h < 3) and undecodable bytes emit NULL
    * stats, never a task failure. Row-local, no shuffle. */
  def sobelEnergy(
      df: DataFrame, idCol: String, binCol: String,
      strongThreshold: Int = 160, batchSize: Int = 64): DataFrame = {
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { case (id, b) =>
        decodePixels(b) match {
          case Some((w, h, lum)) if w >= 3 && h >= 3 =>
            var energy = 0L
            var strong = 0L
            var y = 1
            while (y < h - 1) {
              val rm = (y - 1) * w; val r0 = y * w; val rp = (y + 1) * w
              var x = 1
              while (x < w - 1) {
                val gx = (lum(rm + x + 1) + 2 * lum(r0 + x + 1) +
                  lum(rp + x + 1)) -
                  (lum(rm + x - 1) + 2 * lum(r0 + x - 1) + lum(rp + x - 1))
                val gy = (lum(rp + x - 1) + 2 * lum(rp + x) +
                  lum(rp + x + 1)) -
                  (lum(rm + x - 1) + 2 * lum(rm + x) + lum(rm + x + 1))
                val e = math.abs(gx) + math.abs(gy)
                energy += e
                if (e > strongThreshold) strong += 1L
                x += 1
              }
              y += 1
            }
            val nInt = (w - 2).toLong * (h - 2)
            SobelRow(id, Some(w), Some(h), Some(nInt), Some(energy),
              Some(strong), Some(energy * 1000L / nInt))
          case _ =>
            SobelRow(id, None, None, None, None, None, None)
        }
      }))
      .toDF()
  }

  /** One AIFF row: container fields (channel count, the 80-bit extended
    * sample rate decoded to an integer, declared frame count) plus
    * exact integer stats over the 16-bit big-endian PCM. */
  final case class AiffRow(
      id: Long, channels: Option[Long], sample_rate: Option[Long],
      n_frames_declared: Option[Long], n_samples: Option[Long],
      sum_abs: Option[Long], peak_abs: Option[Long], energy: Option[Long])

  /** AIFF (Audio IFF) container decode + stats — the FOURTH audio
    * container shape, and the big-endian sibling of WAV: an IFF FORM
    * walk (4-byte chunk ids, BE32 sizes, odd sizes padded) finding COMM
    * (channels BE16, frame count BE32, 16-bit sample size required,
    * and the sample rate as an 80-bit IEEE 754 EXTENDED float — the
    * format's famous quirk, decoded exactly for integer rates via
    * mant · 2^(exp−16383−63)) and SSND (offset/blockSize preamble, then
    * interleaved PCM16 BE). Emits exact integer (Σ|pcm|, max|pcm|,
    * Σpcm²). Bad magic, missing chunks, non-16-bit, fractional or
    * out-of-range rates, or a half sample → NULL row, never a task
    * failure. Row-local, no shuffle. */
  def aiffStats(
      df: DataFrame, idCol: String, binCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { case (id, b) =>
        val bad = AiffRow(id, None, None, None, None, None, None, None)
        if (b == null || b.length < 12 || b(0) != 'F' || b(1) != 'O' ||
          b(2) != 'R' || b(3) != 'M' ||
          b(8) != 'A' || b(9) != 'I' || b(10) != 'F' || b(11) != 'F') bad
        else try {
          def be16(o: Int): Int = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
          def be32(o: Int): Long =
            ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
              ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
          var p = 12
          var comm = -1; var ssnd = -1; var ssndSize = 0L
          while (p + 8 <= b.length) {
            val size = be32(p + 4)
            val tag = new String(b, p, 4, "US-ASCII")
            if (tag == "COMM") comm = p + 8
            else if (tag == "SSND") { ssnd = p + 8; ssndSize = size }
            p += 8 + size.toInt + (size.toInt & 1) //   odd sizes padded
          }
          if (comm < 0 || ssnd < 0 || be16(comm + 6) != 16) bad
          else {
            val ch = be16(comm).toLong
            val frames = be32(comm + 2)
            // 80-bit extended float: 15-bit biased exponent + explicit
            // 64-bit mantissa; exact for the integer rates audio uses
            val exp = be16(comm + 8) & 0x7fff
            var mant = 0L
            var i = 0
            while (i < 8) { mant = (mant << 8) | (b(comm + 10 + i) & 0xffL); i += 1 }
            val shift = 16383 + 63 - exp
            val rate =
              if (shift < 0 || shift > 63 ||
                (shift > 0 && (mant & ((1L << shift) - 1)) != 0L)) -1L
              else mant >>> shift
            val dataOff = be32(ssnd) //   offset into the sound data
            val dataStart = ssnd + 8 + dataOff.toInt
            val dataLen = ssndSize - 8 - dataOff
            if (rate < 0L || ch < 1L || dataLen < 0L || (dataLen & 1L) != 0L ||
              dataStart + dataLen > b.length) bad
            else {
              val n = (dataLen / 2L).toInt
              var sAbs = 0L; var peak = 0L; var energy = 0L
              var q = dataStart
              var k = 0
              while (k < n) {
                val v = (b(q) << 8) | (b(q + 1) & 0xff)
                q += 2
                val a = math.abs(v).toLong
                sAbs += a
                if (a > peak) peak = a
                energy += a * a
                k += 1
              }
              AiffRow(id, Some(ch), Some(rate), Some(frames),
                Some(n.toLong), Some(sAbs), Some(peak), Some(energy))
            }
          }
        } catch {
          case scala.util.control.NonFatal(_) => bad
        }
      }))
      .toDF()
  }

  /** One ID3 row: tag header fields plus the classic text frames. */
  final case class Id3Row(
      id: Long, version: Option[Long], tag_size: Option[Long],
      title: Option[String], artist: Option[String], album: Option[String],
      track: Option[Long])

  /** ID3v2 metadata extraction (the MP3 tag container — the metadata
    * sidecar audio ingest pipelines mine before any sample decode):
    * "ID3" magic, version 2.3/2.4, SYNCHSAFE 28-bit tag size (7 bits
    * per byte — the format's signature quirk, so a size byte can never
    * alias an MPEG sync pattern), then a frame walk — 4-char frame id,
    * frame size (plain BE32 in v2.3, synchsafe again in v2.4), 2 flag
    * bytes, payload. Text frames (T***) carry an encoding byte:
    * 0 = ISO-8859-1, 3 = UTF-8 (others → NULL field). The walk stops at
    * the first padding zero byte. Extracts TIT2/TPE1/TALB/TRCK. Bad
    * magic, truncation, extended headers, or an overrunning frame →
    * NULL row, never a task failure. Row-local, no shuffle. */
  def id3Tags(
      df: DataFrame, idCol: String, binCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { case (id, b) =>
        val bad = Id3Row(id, None, None, None, None, None, None)
        try {
          if (b == null || b.length < 10 || b(0) != 'I' || b(1) != 'D' ||
            b(2) != '3') bad
          else {
            val ver = b(3) & 0xff
            val flags = b(5) & 0xff
            def ss(o: Int): Int =
              ((b(o) & 0x7f) << 21) | ((b(o + 1) & 0x7f) << 14) |
                ((b(o + 2) & 0x7f) << 7) | (b(o + 3) & 0x7f)
            def be32(o: Int): Int =
              ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
                ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
            val size = ss(6)
            if ((ver != 3 && ver != 4) || (flags & 0x40) != 0 ||
              10 + size > b.length) bad
            else {
              var p = 10
              val end = 10 + size
              var title: Option[String] = None
              var artist: Option[String] = None
              var album: Option[String] = None
              var track: Option[Long] = None
              var ok = true
              while (ok && p + 10 <= end && b(p) != 0) {
                val fid = new String(b, p, 4, "US-ASCII")
                val fsz = if (ver == 4) ss(p + 4) else be32(p + 4)
                if (fsz < 0 || p + 10 + fsz > end) ok = false
                else {
                  if (fid.startsWith("T") && fsz >= 1) {
                    val enc = b(p + 10) & 0xff
                    val txt =
                      if (enc == 0)
                        Some(new String(b, p + 11, fsz - 1, "ISO-8859-1"))
                      else if (enc == 3)
                        Some(new String(b, p + 11, fsz - 1, "UTF-8"))
                      else None
                    fid match {
                      case "TIT2" => title = txt
                      case "TPE1" => artist = txt
                      case "TALB" => album = txt
                      case "TRCK" => track = txt.flatMap(t =>
                        scala.util.Try(t.takeWhile(_.isDigit).toLong).toOption)
                      case _ => ()
                    }
                  }
                  p += 10 + fsz
                }
              }
              if (!ok) bad
              else Id3Row(id, Some(ver.toLong), Some(size.toLong),
                title, artist, album, track)
            }
          }
        } catch {
          case scala.util.control.NonFatal(_) => bad
        }
      }))
      .toDF()
  }

  /** One dual-tone detection row: the winning low/high periods, the
    * decoded keypad digit, and the quadrature scores that won. */
  final case class ToneRow(
      id: Long, n_samples: Option[Long], low_period: Option[Long],
      high_period: Option[Long], digit: Option[Long],
      score_low: Option[Long], score_high: Option[Long])

  /** Dual-tone (DTMF-shaped) keypad detection over raw PCM16LE audio by
    * QUADRATURE SQUARE-WAVE CORRELATION — the exact-integer stand-in
    * for the Goertzel bank (same argmax on clean tones, but every
    * quantity is an integer, so a DuckDB oracle replays it
    * bit-for-bit; a true Goertzel needs cos() coefficients whose last
    * ulp differs across libm builds). For each candidate period p:
    * I = Σ sᵢ·sq(i mod p), Q = Σ sᵢ·sq((i + p/4) mod p) with
    * sq = ±1 by half-period, score = I² + Q²; the detected row/column
    * is the FIRST period attaining the maximal score in its group
    * (ties → lower index), digit = 4·rowIdx + colIdx. Periods must be
    * multiples of 4 (integer quarter-phase shift). Empty/odd-length
    * payloads → NULL row. Row-local, no shuffle; cost O(n·|periods|)
    * per clip. */
  def toneDetect(
      df: DataFrame, idCol: String, binCol: String,
      lowPeriods: Array[Int], highPeriods: Array[Int],
      batchSize: Int = 64): DataFrame = {
    require((lowPeriods ++ highPeriods).forall(p => p >= 4 && p % 4 == 0),
      "periods must be multiples of 4")
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { case (id, b) =>
        if (b == null || b.length < 2 || b.length % 2 != 0)
          ToneRow(id, None, None, None, None, None, None)
        else {
          val n = b.length / 2
          val s = new Array[Int](n)
          var i = 0
          while (i < n) {
            s(i) = ((b(2 * i + 1) << 8) | (b(2 * i) & 0xff)).toShort.toInt
            i += 1
          }
          def score(p: Int): Long = {
            var iq = 0L; var qq = 0L
            var k = 0
            while (k < n) {
              val v = s(k).toLong
              iq += (if (k % p < p / 2) v else -v)
              qq += (if ((k + p / 4) % p < p / 2) v else -v)
              k += 1
            }
            iq * iq + qq * qq
          }
          def argmax(ps: Array[Int]): (Int, Long) = {
            var best = 0; var bestScore = score(ps(0))
            var j = 1
            while (j < ps.length) {
              val sc = score(ps(j))
              if (sc > bestScore) { best = j; bestScore = sc }
              j += 1
            }
            (best, bestScore)
          }
          val (li, ls) = argmax(lowPeriods)
          val (hi, hs) = argmax(highPeriods)
          ToneRow(id, Some(n.toLong), Some(lowPeriods(li).toLong),
            Some(highPeriods(hi).toLong), Some(li.toLong * 4L + hi),
            Some(ls), Some(hs))
        }
      }))
      .toDF()
  }

  /** One stereo WAV row: per-channel exact integer stats plus the
    * cross-channel product sum. */
  final case class StereoWavRow(
      id: Long, n_frames: Option[Long], sample_rate: Option[Long],
      l_sum_abs: Option[Long], l_energy: Option[Long],
      r_sum_abs: Option[Long], r_energy: Option[Long],
      cross: Option[Long])

  /** STEREO PCM16 WAV decode — the interleaving test the mono gates
    * can't give: frames are [L, R] sample pairs, and a decoder that
    * walks them mono (or swaps channels) corrupts every per-channel
    * stat while leaving the pooled stats intact — which is why this
    * gate emits PER-CHANNEL moments plus the cross-channel product sum
    * Σ Lⱼ·Rⱼ (the stereo-correlation numerator; |L·R| ≤ 2¹²·2¹² per
    * frame keeps it far inside BIGINT). RIFF walk: fmt must be PCM
    * tag 1, 2 channels, 16-bit; odd frame counts, wrong tags, or a
    * torn data chunk → NULL row. Row-local, no shuffle. */
  def wavStereoStats(
      df: DataFrame, idCol: String, binCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { case (id, b) =>
        val bad = StereoWavRow(id, None, None, None, None, None, None, None)
        def fcc(o: Int): String =
          if (o + 4 > b.length) "" else new String(b.slice(o, o + 4), "US-ASCII")
        def le32(o: Int): Long =
          (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
            ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
        def le16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
        if (b == null || b.length < 44 || fcc(0) != "RIFF" ||
          fcc(8) != "WAVE") bad
        else {
          var p = 12
          var rate = -1L
          var dataOff = -1; var dataLen = -1L
          var ok = true
          while (ok && p + 8 <= b.length) {
            val id4 = fcc(p); val sz = le32(p + 4)
            val body = p + 8
            if (body + sz > b.length) ok = false
            else {
              if (id4 == "fmt " && sz >= 16) {
                if (le16(body) != 1 || le16(body + 2) != 2 ||
                  le16(body + 14) != 16) ok = false //  PCM stereo 16 only
                else rate = le32(body + 4)
              }
              if (id4 == "data") { dataOff = body; dataLen = sz }
              p = (body + sz + (sz & 1L)).toInt
            }
          }
          if (!ok || rate < 0 || dataOff < 0 || dataLen % 4 != 0) bad
          else {
            val n = (dataLen / 4).toInt
            var la = 0L; var le = 0L; var ra = 0L; var re = 0L; var cx = 0L
            var j = 0
            while (j < n) {
              val o = dataOff + 4 * j
              val l = ((b(o + 1) << 8) | (b(o) & 0xff)).toShort.toInt
              val r = ((b(o + 3) << 8) | (b(o + 2) & 0xff)).toShort.toInt
              la += math.abs(l); le += l.toLong * l
              ra += math.abs(r); re += r.toLong * r
              cx += l.toLong * r
              j += 1
            }
            StereoWavRow(id, Some(n.toLong), Some(rate), Some(la), Some(le),
              Some(ra), Some(re), Some(cx))
          }
        }
      }))
      .toDF()
  }

  /** One ICO directory image (or one NULL row for an unparseable
    * container): the entry's declared dims, the decoded payload kind,
    * and exact luma stats. */
  final case class IcoImageRow(
      id: Long, image: Option[Long], width: Option[Int],
      height: Option[Int], is_png: Option[Boolean], n_px: Option[Long],
      luma_sum: Option[Long])

  /** ICO container decode — the Windows icon directory, and the only
    * format here whose payloads are TWO DIFFERENT codecs behind one
    * directory: each ICONDIRENTRY points at either a complete PNG
    * (dispatched to [[pngPixels]]) or a HEADERLESS BMP — a raw
    * BITMAPINFOHEADER whose biHeight is DOUBLED (XOR pixel data plus a
    * 1-bpp AND transparency mask, rows 32-bit padded) and no 'BM' file
    * header, the part naive "just call the BMP decoder" ports get
    * wrong. Supported BMP payloads: 8-bit paletted, bottom-up (the
    * classic icon shape); the AND mask is length-checked then ignored
    * (luma comes from the XOR plane). Per-image quarantine: a broken
    * entry keeps its row with NULL stats. Bad magic / truncated
    * directory → one NULL row. Row-local, no shuffle. */
  def icoPixelStats(
      df: DataFrame, idCol: String, binCol: String,
      maxImages: Int = 8, batchSize: Int = 32): DataFrame = {
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.flatMap { case (id, b) =>
        val bad = Seq(IcoImageRow(id, None, None, None, None, None, None))
        def u16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
        def u32(o: Int): Long =
          (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
            ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
        if (b == null || b.length < 6 || u16(0) != 0 || u16(2) != 1) bad
        else {
          val count = math.min(u16(4), maxImages)
          if (count == 0 || 6 + 16 * count > b.length) bad
          else (0 until count).map { i =>
            val e = 6 + 16 * i
            val size = u32(e + 8); val off = u32(e + 12)
            if (off < 0 || size < 8 || off + size > b.length)
              IcoImageRow(id, Some(i.toLong), None, None, None, None, None)
            else {
              val payload = b.slice(off.toInt, (off + size).toInt)
              val isPng = payload.length >= 8 &&
                (payload(0) & 0xff) == 0x89 && payload(1) == 'P'
              val decoded =
                if (isPng) pngPixels(payload)
                else icoBmpPixels(payload)
              decoded match {
                case Some((w, h, lum)) =>
                  var s = 0L; var j = 0
                  while (j < lum.length) { s += lum(j); j += 1 }
                  IcoImageRow(id, Some(i.toLong), Some(w), Some(h),
                    Some(isPng), Some(w.toLong * h), Some(s))
                case None =>
                  IcoImageRow(id, Some(i.toLong), None, None,
                    Some(isPng), None, None)
              }
            }
          }
        }
      }))
      .toDF()
  }

  /** The ICO-embedded headerless BMP: BITMAPINFOHEADER with DOUBLED
    * height, 8-bit palette, bottom-up XOR rows (4-byte padded), then
    * the 1-bpp AND mask (rows padded to 32 bits) whose length is
    * verified. Luma = gray palette entry (BT.601 of (g,g,g) is g). */
  private[graft] def icoBmpPixels(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (b.length < 40) return None
    def le32(o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    def le16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    if (le32(0) != 40L) return None //                 BITMAPINFOHEADER
    val w = le32(4).toInt
    val h2 = le32(8).toInt
    if (w <= 0 || h2 <= 0 || (h2 & 1) != 0) return None //  XOR+AND pair
    val h = h2 / 2
    if (w.toLong * h > (1L << 26)) return None
    if (le16(12) != 1 || le16(14) != 8) return None //   8-bit paletted
    if (le32(16) != 0L) return None //                      BI_RGB only
    val palEntries = { val c = le32(32); if (c == 0L) 256 else c.toInt }
    val palOff = 40
    val xorOff = palOff + 4 * palEntries
    val xorRow = (w + 3) / 4 * 4
    val andRow = (w + 31) / 32 * 4
    val need = xorOff.toLong + h.toLong * xorRow + h.toLong * andRow
    if (need != b.length) return None //     exact payload, no slack
    val lum = new Array[Int](w * h)
    var r = 0
    while (r < h) {
      val y = h - 1 - r //                                   bottom-up
      var x = 0
      val base = xorOff + r * xorRow
      while (x < w) {
        val pi = b(base + x) & 0xff
        lum(y * w + x) =
          if (pi < palEntries) {
            val p = palOff + 4 * pi //                          BGRX
            (77 * (b(p + 2) & 0xff) + 150 * (b(p + 1) & 0xff) +
              29 * (b(p) & 0xff)) >> 8
          } else 0
        x += 1
      }
      r += 1
    }
    Some((w, h, lum))
  }

  /** One decoded AVI frame (or one NULL row for an unparseable
    * container): stream header fields plus exact luma stats of the
    * frame the embedded JPEG decoder recovered. */
  final case class AviFrameRow(
      id: Long, frame: Option[Long], width: Option[Int],
      height: Option[Int], us_per_frame: Option[Long],
      n_frames_declared: Option[Long], n_px: Option[Long],
      luma_sum: Option[Long])

  /** Motion-JPEG-in-AVI decode — the first VIDEO container whose FRAMES
    * are actually decoded (the MP4 gate walks boxes; this one walks the
    * RIFF tree AND runs the baseline-JPEG decoder on every `00dc`
    * chunk): parse `RIFF/AVI ` → `LIST hdrl` → `avih` (µs/frame, total
    * frames, dims) → `LIST movi` → word-aligned `00dc` frame chunks →
    * [[jpegPixels]] per frame, emitting one row per decoded frame with
    * exact integer luma moments. This is the video-corpus ingestion
    * shape: per-frame features without ever materializing the video as
    * one object. Bad magic / truncated header → single NULL row; an
    * undecodable FRAME keeps its row with NULL stats (frame-level
    * quarantine — one corrupt frame must not sink the clip); frames
    * past `maxFrames` are not decoded (bounded work per row).
    * Row-local, no shuffle. */
  def aviFrameStats(
      df: DataFrame, idCol: String, binCol: String,
      maxFrames: Int = 8, batchSize: Int = 16): DataFrame = {
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.flatMap { case (id, b) =>
        val bad =
          Seq(AviFrameRow(id, None, None, None, None, None, None, None))
        def fcc(o: Int): String =
          if (o + 4 > b.length) ""
          else new String(b.slice(o, o + 4), "US-ASCII")
        def le32(o: Int): Long =
          (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
            ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
        if (b == null || b.length < 24 || fcc(0) != "RIFF" ||
          fcc(8) != "AVI ") bad
        else {
          var usPerFrame = -1L; var totalFrames = -1L
          var aw = -1; var ah = -1
          val frames = collection.mutable.ArrayBuffer.empty[Array[Byte]]
          var p = 12
          val end = math.min(b.length.toLong, 8L + le32(4)).toInt
          var ok = true
          while (ok && p + 8 <= end) {
            val id4 = fcc(p); val sz = le32(p + 4)
            val body = p + 8
            if (body + sz > end) { ok = false }
            else {
              if (id4 == "LIST" && sz >= 4) {
                val lt = fcc(body)
                var q = body + 4
                val lend = (body + sz).toInt
                while (q + 8 <= lend) {
                  val c4 = fcc(q); val csz = le32(q + 4)
                  val cb = q + 8
                  if (cb + csz > lend) { q = lend }
                  else {
                    if (lt == "hdrl" && c4 == "avih" && csz >= 40) {
                      usPerFrame = le32(cb)
                      totalFrames = le32(cb + 16)
                      aw = le32(cb + 32).toInt; ah = le32(cb + 36).toInt
                    }
                    if (lt == "movi" && c4 == "00dc" &&
                      frames.length < maxFrames)
                      frames += b.slice(cb, (cb + csz).toInt)
                    q = (cb + csz + (csz & 1L)).toInt
                  }
                }
              }
              p = (body + sz + (sz & 1L)).toInt
            }
          }
          if (usPerFrame < 0) bad //                      no avih header
          else if (frames.isEmpty) bad
          else frames.zipWithIndex.map { case (fb, i) =>
            jpegPixels(fb) match {
              case Some((w, h, lum)) =>
                var s = 0L; var j = 0
                while (j < lum.length) { s += lum(j); j += 1 }
                AviFrameRow(id, Some(i.toLong), Some(w), Some(h),
                  Some(usPerFrame), Some(totalFrames),
                  Some(w.toLong * h), Some(s))
              case None => //     frame-level quarantine, clip survives
                AviFrameRow(id, Some(i.toLong), None, None,
                  Some(usPerFrame), Some(totalFrames), None, None)
            }
          }.toSeq
        }
      }))
      .toDF()
  }

  /** One Otsu row: the chosen threshold, the class split it induces,
    * and the (floored) between-class-variance score that won. */
  final case class OtsuRow(
      id: Long, width: Option[Int], height: Option[Int],
      threshold: Option[Long], n_below: Option[Long],
      n_above: Option[Long], score: Option[Long])

  /** Otsu's automatic threshold over a decoded luma raster — the
    * classic histogram-based binarization (document-scan cleanup, mask
    * extraction) in EXACT integer arithmetic: for each candidate
    * threshold t the between-class variance is proportional to
    * num(t)/den(t) with num = (sumB·w − sumT·wB)² and
    * den = wB·(w − wB) (wB, sumB = count/sum of luma ≤ t; w, sumT =
    * totals). num can exceed 64 bits already at ~2.4k px, so the
    * intermediates run in BigInt — the mirror of DuckDB's HUGEINT — and
    * only the QUOTIENT (≤ (255/2)²·w², inside BIGINT up to ~1e6 px) is
    * emitted; the comparison key is the floored quotient num div den
    * and ties break toward the smaller t, so engine and oracle agree
    * exactly. Any
    * [[decodePixels]] format is accepted; undecodable → NULL row.
    * Row-local, no shuffle. */
  def otsuThreshold(
      df: DataFrame, idCol: String, binCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { case (id, b) =>
        decodePixels(b) match {
          case None => OtsuRow(id, None, None, None, None, None, None)
          case Some((w, h, lum)) =>
            val hist = new Array[Long](256)
            lum.foreach(v => hist(v) += 1L)
            val n = lum.length.toLong
            var sumT = 0L
            var v = 0
            while (v < 256) { sumT += v.toLong * hist(v); v += 1 }
            var wB = 0L; var sumB = 0L
            var bestT = -1L; var bestScore = -1L
            var bestWb = 0L
            var t = 0
            while (t <= 254) {
              wB += hist(t); sumB += t.toLong * hist(t)
              if (wB > 0L && wB < n) {
                val d = BigInt(sumB) * n - BigInt(sumT) * wB
                val sc = ((d * d) / (BigInt(wB) * (n - wB))).toLong
                if (sc > bestScore) {
                  bestScore = sc; bestT = t.toLong; bestWb = wB
                }
              }
              t += 1
            }
            if (bestT < 0L) // constant image: no valid split
              OtsuRow(id, Some(w), Some(h), None, Some(n), Some(0L), None)
            else OtsuRow(id, Some(w), Some(h), Some(bestT), Some(bestWb),
              Some(n - bestWb), Some(bestScore))
        }
      }))
      .toDF()
  }

  /** One IMA ADPCM row: exact integer stats over the decoded PCM plus
    * the decoder's final (predictor, index) state — the state pair
    * pins the WHOLE sequential walk, not just its aggregates. */
  final case class AdpcmRow(
      id: Long, n_samples: Option[Long], sum_abs: Option[Long],
      peak_abs: Option[Long], energy: Option[Long],
      final_pred: Option[Long], final_index: Option[Long])

  /** IMA/DVI ADPCM decode + stats — the 4-bit compressed-telephony/
    * game-audio shape: each byte carries TWO nibbles (low first, the
    * WAV/IMA convention), decoded through the public predictor/step-
    * index state machine ([[graft.functions.NativeKernels.adpcmStep]]
    * + the 89-entry step and 16-entry index tables) from the zero
    * initial state. Emits exact integer (n_samples, Σ|pcm|, max|pcm|,
    * Σpcm², final predictor, final index) per row; the oracle replays
    * the state machine as a recursive walk. NULL/empty payloads
    * surface as NULL rows. Row-local batched kernel, no shuffle. */
  def adpcmStats(
      df: DataFrame, idCol: String, binCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { case (id, b) =>
        if (b == null || b.length == 0)
          AdpcmRow(id, None, None, None, None, None, None)
        else {
          var pred = 0
          var index = 0
          var sAbs = 0L
          var peak = 0L
          var energy = 0L
          var k = 0
          val n = 2 * b.length
          while (k < n) {
            val byte = b(k >> 1) & 0xff
            val nib = if ((k & 1) == 0) byte & 0x0f else byte >> 4
            pred = graft.functions.NativeKernels.adpcmStep(pred, index, nib)
            index = math.max(0, math.min(88,
              index + graft.functions.NativeKernels.AdpcmIndexTable(nib)))
            val a = math.abs(pred).toLong
            sAbs += a
            if (a > peak) peak = a
            energy += a * a
            k += 1
          }
          AdpcmRow(id, Some(n.toLong), Some(sAbs), Some(peak),
            Some(energy), Some(pred.toLong), Some(index.toLong))
        }
      }))
      .toDF()
  }

  /** One WAV-ADPCM row: stats plus block count and the final
    * predictor — the block-seeded walk's end state. */
  final case class AdpcmWavRow(
      id: Long, n_samples: Option[Long], sum_abs: Option[Long],
      peak_abs: Option[Long], energy: Option[Long],
      n_blocks: Option[Long], final_pred: Option[Long])

  /** IMA ADPCM inside its REAL container — RIFF/WAVE with format tag
    * 0x0011 (the shape actual .wav files carry, unlike
    * [[adpcmStats]]'s raw nibble stream): the fmt chunk declares
    * blockAlign, and the data chunk is a sequence of independent
    * blocks, each reseeding the decoder from its own 4-byte header
    * (initial predictor i16 LE — which IS the block's first output
    * sample — initial step index u8, reserved u8) followed by
    * blockAlign−4 nibble bytes, low nibble first. Block independence
    * is the format's seek/robustness feature; it also means the oracle
    * can replay blocks in parallel. Mono 4-bit only; anything else —
    * wrong tag, bad index seed (> 88), partial trailing block,
    * non-mono — quarantines the row as NULL (the decoder posture).
    * Emits exact integer (n_samples, Σ|pcm|, max|pcm|, Σpcm²,
    * n_blocks, final predictor). Row-local batched kernel. */
  def adpcmWavStats(
      df: DataFrame, idCol: String, binCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(
        _.map { case (id, b) => decodeAdpcmWav(id, b) }))
      .toDF()
  }

  private def decodeAdpcmWav(id: Long, b: Array[Byte]): AdpcmWavRow = {
    def nullRow(id: Long): AdpcmWavRow =
      AdpcmWavRow(id, None, None, None, None, None, None)
    locally {
      if (b == null || b.length < 48 || b(0) != 'R' || b(1) != 'I' ||
        b(2) != 'F' || b(3) != 'F' || b(8) != 'W' || b(9) != 'A' ||
        b(10) != 'V' || b(11) != 'E') return nullRow(id)
      var i = 12
      var tag = 0; var channels = 0; var blockAlign = 0; var bits = 0
      var dataOff = -1; var dataLen = -1L; var corrupt = false
      while (!corrupt && i + 8 <= b.length) {
        val cid = new String(b, i, 4,
          java.nio.charset.StandardCharsets.US_ASCII)
        val len = le32(b, i + 4)
        if (len > b.length) corrupt = true
        else {
          if (cid == "fmt " && len >= 16 && i + 8 + 16 <= b.length) {
            tag = le16(b, i + 8)
            channels = le16(b, i + 10)
            blockAlign = le16(b, i + 20)
            bits = le16(b, i + 22)
          } else if (cid == "data") { dataOff = i + 8; dataLen = len }
          i += 8 + len.toInt + (len.toInt & 1)
        }
      }
      if (corrupt || dataOff < 0 || tag != 0x11 || channels != 1 ||
        bits != 4 || blockAlign < 5) return nullRow(id)
      val avail = math.min(dataLen, (b.length - dataOff).toLong)
      if (avail % blockAlign != 0) return nullRow(id) // partial block
      val nBlocks = (avail / blockAlign).toInt
      var sAbs = 0L; var peak = 0L; var energy = 0L; var nSamp = 0L
      var finalPred = 0
      var blk = 0
      while (blk < nBlocks) {
        val base = dataOff + blk * blockAlign
        var pred = le16(b, base).toShort.toInt // sign-extended seed
        val idx0 = b(base + 2) & 0xff
        if (idx0 > 88) return nullRow(id) //            bad index seed
        var index = idx0
        // the header predictor IS the block's first output sample
        def emit(v: Int): Unit = {
          val a = math.abs(v).toLong
          sAbs += a; if (a > peak) peak = a; energy += a * a
          nSamp += 1
        }
        emit(pred)
        var k = 0
        val nNib = 2 * (blockAlign - 4)
        while (k < nNib) {
          val byte = b(base + 4 + (k >> 1)) & 0xff
          val nib = if ((k & 1) == 0) byte & 0x0f else byte >> 4
          pred = graft.functions.NativeKernels.adpcmStep(pred, index, nib)
          index = math.max(0, math.min(88,
            index + graft.functions.NativeKernels.AdpcmIndexTable(nib)))
          emit(pred)
          k += 1
        }
        finalPred = pred
        blk += 1
      }
      AdpcmWavRow(id, Some(nSamp), Some(sAbs), Some(peak), Some(energy),
        Some(nBlocks.toLong), Some(finalPred.toLong))
    }
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

  // ---- real PNG pixel decode (pure JVM: zlib Inflater + the five PNG
  // scanline filters — public format structure, RFC 2083 §§4.1.3, 6) ---

  /** Inflate a zlib stream to exactly `outLen` bytes. Reads only the
    * payload (a streaming decoder's posture — the trailing Adler-32 is
    * transport integrity, parquet's job here), so both fully-valid
    * streams and truncated-trailer streams decode. */
  private def inflateZlib(data: Array[Byte], outLen: Int): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new Array[Byte](outLen)
    var off = 0
    try {
      var stuck = false
      while (off < outLen && !inf.finished() && !stuck) {
        val n = inf.inflate(out, off, outLen - off)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) stuck = true
        off += n
      }
      if (off == outLen) Some(out) else None
    } catch { case _: java.util.zip.DataFormatException => None }
    finally inf.end()
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Decode a non-interlaced 8-bit PNG to a per-pixel integer LUMA
    * raster: chunk-walk to IHDR/PLTE/IDAT, inflate the concatenated
    * IDAT zlib stream, undo the per-scanline filter (None/Sub/Up/
    * Average/Paeth — the complete public filter set), then collapse
    * channels to luma — grayscale passes through, RGB/RGBA and palette
    * entries take the BT.601 integer weighting `(299R+587G+114B) div
    * 1000`, alpha is ignored. Chunk CRCs are NOT verified (lenient
    * decoder; corrupt streams fail at inflate/length checks instead).
    * Returns (width, height, luma row-major) or None for anything that
    * is not an 8-bit non-interlaced PNG of color type 0/2/3/4/6. */
  private[graft] def pngPixels(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (pngDims(b).isEmpty) return None
    if (b.length < 29) return None // full IHDR data incl. interlace byte
    val w = be32(b, 16).toInt; val h = be32(b, 20).toInt
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None
    val bitDepth = u8(b, 24); val colorType = u8(b, 25)
    val interlace = u8(b, 28)
    if (bitDepth != 8 || interlace != 0) return None
    val channels = colorType match {
      case 0 => 1 case 2 => 3 case 3 => 1 case 4 => 2 case 6 => 4
      case _ => return None
    }
    // chunk walk: collect concatenated IDAT payloads + the palette
    var i = 8
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var end = false
    while (!end && i + 8 <= b.length) {
      val len = be32(b, i).toInt
      if (len < 0 || i + 12 + len > b.length) return None
      val ct = new String(b, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      ct match {
        case "IDAT" => idat.write(b, i + 8, len)
        case "PLTE" => palette = java.util.Arrays.copyOfRange(b, i + 8, i + 8 + len)
        case "IEND" => end = true
        case _ => ()
      }
      i += 12 + len // length + type + data + CRC (not verified)
    }
    if (colorType == 3 && palette == null) return None
    val stride = w * channels
    val raw = inflateZlib(idat.toByteArray, h * (stride + 1)).getOrElse(return None)
    // unfilter in place, scanline by scanline (recon needs the previous
    // reconstructed row, so the pass is inherently sequential per image
    // — parallelism lives across images, one task decodes many)
    val bpp = channels
    var y = 0
    while (y < h) {
      val rowOff = y * (stride + 1)
      val ft = raw(rowOff) & 0xff
      if (ft > 4) return None
      var x = 0
      while (x < stride) {
        val p = rowOff + 1 + x
        val left = if (x >= bpp) raw(p - bpp) & 0xff else 0
        val up = if (y > 0) raw(p - stride - 1) & 0xff else 0
        val ul = if (y > 0 && x >= bpp) raw(p - stride - 1 - bpp) & 0xff else 0
        val rec = ft match {
          case 0 => raw(p) & 0xff
          case 1 => ((raw(p) & 0xff) + left) & 0xff
          case 2 => ((raw(p) & 0xff) + up) & 0xff
          case 3 => ((raw(p) & 0xff) + ((left + up) >> 1)) & 0xff
          case 4 => ((raw(p) & 0xff) + paeth(left, up, ul)) & 0xff
        }
        raw(p) = rec.toByte
        x += 1
      }
      y += 1
    }
    // channels -> integer luma
    val lum = new Array[Int](w * h)
    var j = 0
    while (j < w * h) {
      val yy = j / w; val xx = j % w
      val p = yy * (stride + 1) + 1 + xx * channels
      lum(j) = colorType match {
        case 0 | 4 => raw(p) & 0xff
        case 2 | 6 =>
          (299 * (raw(p) & 0xff) + 587 * (raw(p + 1) & 0xff) +
            114 * (raw(p + 2) & 0xff)) / 1000
        case 3 =>
          val pi = (raw(p) & 0xff) * 3
          if (pi + 2 >= palette.length) 0
          else (299 * (palette(pi) & 0xff) + 587 * (palette(pi + 1) & 0xff) +
            114 * (palette(pi + 2) & 0xff)) / 1000
      }
      j += 1
    }
    Some((w, h, lum))
  }

  /** Full variable-width GIF LZW decode of an image data stream (the
    * min-code-size byte already stripped, data sub-blocks already
    * concatenated) to exactly `nPixels` palette indices. The complete
    * public algorithm: code width grows from minCode+1 as the table
    * fills (12-bit ceiling with deferred-clear behavior — at 4096
    * entries the table freezes until a CLEAR), CLEAR resets
    * width/table, the KwKwK self-reference case emits prev+first(prev),
    * strings materialize by walking the prefix chain (no recursion).
    * Lenient termination: a missing EOI after the full raster is
    * accepted (common in the wild); short output, codes past the table
    * head, or a literal ≥ clear right after reset return None. Output
    * past `nPixels` is discarded (encoder padding). */
  private def lzwDecode(
      data: Array[Byte], minCode: Int, nPixels: Int): Option[Array[Int]] = {
    if (minCode < 2 || minCode > 11) return None
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    val stack = new Array[Int](4097)
    val out = new Array[Int](nPixels)
    var outN = 0
    var next = clear + 2
    var width = minCode + 1
    var prev = -1
    var bitPos = 0
    val nBits = data.length * 8
    while (bitPos + width <= nBits) {
      var code = 0
      var k = 0
      while (k < width) {
        val t = bitPos + k
        if (((data(t >> 3) >> (t & 7)) & 1) != 0) code |= 1 << k
        k += 1
      }
      bitPos += width
      if (code == clear) { next = clear + 2; width = minCode + 1; prev = -1 }
      else if (code == eoi) {
        return if (outN == nPixels) Some(out) else None
      } else if (prev == -1) {
        if (code >= clear) return None // first code after reset: literal only
        if (outN < nPixels) { out(outN) = code; outN += 1 }
        prev = code
      } else {
        if (code > next || code == eoi || code == clear) return None
        // materialize string(code) — for KwKwK (code == next) it is
        // string(prev) + first(prev)
        var sp = 0
        var c = if (code == next) prev else code
        if (code == next) { stack(sp) = firstChar(prefix, c, clear); sp += 1 }
        while (c >= clear + 2) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
        stack(sp) = c; sp += 1
        val first = c
        while (sp > 0) {
          sp -= 1
          if (outN < nPixels) { out(outN) = stack(sp); outN += 1 }
        }
        if (next < 4096) {
          prefix(next) = prev; suffix(next) = first
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
      if (outN == nPixels && prev != -1) {
        // raster complete; accept with or without a trailing EOI
        return Some(out)
      }
    }
    if (outN == nPixels) Some(out) else None
  }

  private def firstChar(prefix: Array[Int], code: Int, clear: Int): Int = {
    var c = code
    while (c >= clear + 2) c = prefix(c)
    c
  }

  /** Decode ONE image-descriptor block (offset `i` points at 0x2C) to
    * its LUMA raster: concatenate the LZW data sub-blocks, [[lzwDecode]]
    * the palette indices (full variable-width decode — table growth,
    * width bumps, CLEAR resets, KwKwK), undo four-pass interlacing when
    * flagged, and map the active palette (local over global) to BT.601
    * integer luma `(299R+587G+114B) div 1000` — the same weighting as
    * the PNG path, so every downstream pixel operator is
    * format-agnostic. Frame dims are the DESCRIPTOR's (the raster that
    * actually decodes); out-of-palette indices clamp to luma 0. Returns
    * (w, h, luma, offset-past-this-frame), or None for missing
    * palettes, truncated chains, or an LZW stream that does not cover
    * the raster. */
  private def gifFrameAt(b: Array[Byte], i: Int, gctSize: Int)
      : Option[(Int, Int, Array[Int], Int)] = {
    if (i + 10 > b.length || u8(b, i) != 0x2c) return None
    val iw = le16(b, i + 5); val ih = le16(b, i + 7)
    val ipacked = u8(b, i + 9)
    val interlaced = (ipacked & 0x40) != 0
    val lctSize = if ((ipacked & 0x80) != 0) 1 << ((ipacked & 7) + 1) else 0
    val (palOff, palSize) =
      if (lctSize > 0) (i + 10, lctSize) else (13, gctSize)
    if (palSize == 0) return None
    if (iw <= 0 || ih <= 0 || iw.toLong * ih > (1L << 26)) return None
    var j = i + 10 + 3 * lctSize
    if (j >= b.length) return None
    val minCode = u8(b, j); j += 1
    val dat = new java.io.ByteArrayOutputStream()
    while (j < b.length && u8(b, j) != 0) {
      val len = u8(b, j)
      if (j + 1 + len > b.length) return None
      dat.write(b, j + 1, len)
      j += 1 + len
    }
    if (j >= b.length) return None // missing sub-block terminator
    val after = j + 1
    val idx = lzwDecode(dat.toByteArray, minCode, iw * ih)
      .getOrElse(return None)
    // interlace pass schedule (row of decode order -> raster row)
    val rowMap = new Array[Int](ih)
    if (interlaced) {
      var r = 0
      for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
        var y = start
        while (y < ih) { rowMap(r) = y; r += 1; y += step }
      }
    } else {
      var y = 0
      while (y < ih) { rowMap(y) = y; y += 1 }
    }
    val lum = new Array[Int](iw * ih)
    var r = 0
    while (r < ih) {
      val dest = rowMap(r) * iw
      val src = r * iw
      var x = 0
      while (x < iw) {
        val pi = idx(src + x)
        lum(dest + x) =
          if (pi >= palSize) 0
          else {
            val p = palOff + pi * 3
            (299 * (b(p) & 0xff) + 587 * (b(p + 1) & 0xff) +
              114 * (b(p + 2) & 0xff)) / 1000
          }
        x += 1
      }
      r += 1
    }
    Some((iw, ih, lum, after))
  }

  private def gifSkipSubBlocks(b: Array[Byte], from: Int): Int = {
    var j = from
    while (j < b.length && u8(b, j) != 0) j += 1 + u8(b, j)
    j + 1
  }

  /** Decode every `stride`-th frame of a GIF87a/89a (frames 0, stride,
    * 2·stride, …, up to `maxFrames` kept — the scale guard for hostile
    * frame counts) as independent LUMA rasters via [[gifFrameAt]],
    * returning (original frame index, w, h, luma). UNSAMPLED frames are
    * never LZW-decoded — only their sub-block chain is walked
    * (length-prefix hops, O(bytes/255)), which is what makes stride
    * sampling a real cost saver on long animations, not a decode-then-
    * discard. Contract: each frame is decoded AT ITS DESCRIPTOR DIMS
    * with no canvas compositing or disposal — the right semantics for
    * fingerprint/sampling pipelines (every stored raster is hashed as
    * the encoder wrote it), documented in lieu of GIF's animation
    * render model. Extensions (graphic control, comments, app blocks)
    * between frames are walked and skipped. Returns None for a
    * non-GIF / truncated / block-corrupt container or any SAMPLED frame
    * whose LZW stream fails — partial decodes do not masquerade as
    * short animations. */
  private[graft] def gifFrames(
      b: Array[Byte], maxFrames: Int, stride: Int = 1)
      : Option[Vector[(Int, Int, Int, Array[Int])]] = {
    require(stride >= 1, s"bad frame stride $stride")
    if (gifDims(b).forall(_._3 < 1)) return None // also rejects non-GIF
    val packed = u8(b, 10)
    val gctSize = if ((packed & 0x80) != 0) 1 << ((packed & 7) + 1) else 0
    var i = 13 + 3 * gctSize
    val out = Vector.newBuilder[(Int, Int, Int, Array[Int])]
    var frame = 0
    var kept = 0
    while (i < b.length) {
      u8(b, i) match {
        case 0x3b => return Some(out.result())
        case 0x21 =>
          if (i + 2 > b.length) return None
          i = gifSkipSubBlocks(b, i + 2)
        case 0x2c =>
          if (kept == maxFrames) return Some(out.result()) // cap: stop early
          if (frame % stride == 0) {
            gifFrameAt(b, i, gctSize) match {
              case Some((w, h, lum, after)) =>
                out += ((frame, w, h, lum)); kept += 1; i = after
              case None => return None
            }
          } else {
            // skip without decoding: descriptor + optional LCT +
            // min-code byte + sub-block walk
            if (i + 10 >= b.length) return None
            val lct = u8(b, i + 9)
            val lctSize =
              if ((lct & 0x80) != 0) 3 * (1 << ((lct & 7) + 1)) else 0
            i = gifSkipSubBlocks(b, i + 10 + lctSize + 1)
          }
          frame += 1
        case _ => return None
      }
    }
    None // ran off the end: truncated
  }

  /** Decode the FIRST frame of a GIF87a/89a to a per-pixel integer LUMA
    * raster (the [[gifFrames]] walk stopped at one frame). */
  private[graft] def gifPixels(b: Array[Byte]): Option[(Int, Int, Array[Int])] =
    gifFrames(b, 1).flatMap(_.headOption).map { case (_, w, h, l) => (w, h, l) }

  /** Full uncompressed-BMP (BI_RGB) decode to integer LUMA: 14-byte
    * file header (data offset at 10), BITMAPINFOHEADER-or-later DIB
    * (size ≥ 40 — V4/V5 headers just extend it; the palette starts at
    * 14+dibSize), signed height (negative = top-down row order, the
    * documented Windows convention; positive = bottom-up), 4-byte row
    * padding, and either 8-bit paletted (BGRA quads, biClrUsed or 256)
    * or 24-bit BGR pixels — all public file-format knowledge. Same
    * BT.601 luma as PNG/GIF. Returns None for compressed BMPs
    * (RLE or bitfields), other depths, truncated pixel arrays, or a
    * palette that overruns the data offset. */
  /** Netpbm binary decode (P5 grayscale / P6 RGB, the public spec) —
    * the SIXTH codec, and the only one with a free-form ASCII header:
    * whitespace-separated magic, width, height, maxval tokens with
    * `#`-comment lines legal ANYWHERE between them (the part naive
    * parsers get wrong), then exactly ONE whitespace byte, then raw
    * big-endian samples. maxval must be in [1, 255] (16-bit Netpbm is
    * rejected, documented); luma = sample for P5, BT.601 integer form
    * for P6 (exact on gray). Truncation, bomb dims, trailing garbage,
    * bad maxval → None — the shared exploder posture. */
  private[graft] def pnmPixels(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (b.length < 10 || b(0) != 'P' || (b(1) != '5' && b(1) != '6'))
      return None
    val rgb = b(1) == '6'
    var p = 2
    def isWs(c: Int) = c == ' ' || c == '\t' || c == '\n' || c == '\r'
    // read the next decimal token, skipping whitespace and # comments
    def token(): Long = {
      var inComment = false
      while (p < b.length && (inComment || isWs(b(p)) || b(p) == '#')) {
        if (b(p) == '#') inComment = true
        else if (b(p) == '\n') inComment = false
        p += 1
      }
      if (p >= b.length || b(p) < '0' || b(p) > '9') return -1L
      var v = 0L
      while (p < b.length && b(p) >= '0' && b(p) <= '9') {
        v = v * 10 + (b(p) - '0')
        if (v > Int.MaxValue) return -1L
        p += 1
      }
      v
    }
    val w = token(); val h = token(); val maxval = token()
    if (w <= 0 || h <= 0 || w * h > (1L << 26)) return None
    if (maxval < 1 || maxval > 255) return None
    // exactly one whitespace byte separates the header from the raster
    if (p >= b.length || !isWs(b(p))) return None
    p += 1
    val n = (w * h).toInt
    val stride = if (rgb) 3 else 1
    if (p + n.toLong * stride != b.length) return None // truncated/trailing
    val lum = new Array[Int](n)
    var i = 0
    while (i < n) {
      lum(i) =
        if (rgb) {
          val r = b(p) & 0xff; val g = b(p + 1) & 0xff; val bl = b(p + 2) & 0xff
          p += 3
          (77 * r + 150 * g + 29 * bl) >> 8
        } else { val v = b(p) & 0xff; p += 1; v }
      i += 1
    }
    Some((w.toInt, h.toInt, lum))
  }

  /** QOI (Quite OK Image, the public one-page spec) pixel decode —
    * the FIFTH codec, and the first with a running-palette op set:
    * every chunk is one of RGB/RGBA (literal), INDEX (64-slot hash
    * array of previously seen pixels, hash = (3r+5g+7b+11a) mod 64),
    * DIFF (2-bit channel deltas, bias 2, byte wraparound), LUMA
    * (6-bit green delta ± 4-bit red/blue-vs-green deltas), RUN
    * (1..62 repeats of the previous pixel); decode state is
    * (prev pixel, 64-slot index) updated after every chunk exactly as
    * the reference decoder does. Luma out is the BT.601 integer form
    * (77r + 150g + 29b) >> 8 — exactly v on gray pixels, so gray
    * fixtures replay closed-form. Rejections (bad magic/header, bomb
    * dims, truncation, missing end marker, over-long stream) → None,
    * the exploder posture shared by every codec here. */
  private[graft] def qoiPixels(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (b.length < 22 || b(0) != 'q' || b(1) != 'o' || b(2) != 'i' ||
      b(3) != 'f') return None
    def be32(off: Int): Long =
      ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
        ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
    val w = be32(4)
    val h = be32(8)
    val channels = b(12) & 0xff
    val colorspace = b(13) & 0xff
    if (w <= 0 || h <= 0 || w * h > (1L << 26)) return None
    if ((channels != 3 && channels != 4) || colorspace > 1) return None
    val n = (w * h).toInt
    val lum = new Array[Int](n)
    // packed RGBA ints in the 64-slot running index; start pixel a=255
    val index = new Array[Int](64)
    var pr = 0; var pg = 0; var pb = 0; var pa = 255
    var p = 14
    var out = 0
    while (out < n) {
      if (p >= b.length - 8) return None // ran into the end marker
      val b1 = b(p) & 0xff; p += 1
      if (b1 == 0xfe) { //                                     QOI_OP_RGB
        if (p + 3 > b.length - 8) return None
        pr = b(p) & 0xff; pg = b(p + 1) & 0xff; pb = b(p + 2) & 0xff
        p += 3
      } else if (b1 == 0xff) { //                             QOI_OP_RGBA
        if (p + 4 > b.length - 8) return None
        pr = b(p) & 0xff; pg = b(p + 1) & 0xff; pb = b(p + 2) & 0xff
        pa = b(p + 3) & 0xff
        p += 4
      } else (b1 >> 6) match {
        case 0 => //                                          QOI_OP_INDEX
          val v = index(b1 & 0x3f)
          pr = (v >>> 24) & 0xff; pg = (v >>> 16) & 0xff
          pb = (v >>> 8) & 0xff; pa = v & 0xff
        case 1 => //                                           QOI_OP_DIFF
          pr = (pr + ((b1 >> 4) & 0x03) - 2) & 0xff
          pg = (pg + ((b1 >> 2) & 0x03) - 2) & 0xff
          pb = (pb + (b1 & 0x03) - 2) & 0xff
        case 2 => //                                           QOI_OP_LUMA
          if (p + 1 > b.length - 8) return None
          val dg = (b1 & 0x3f) - 32
          val b2 = b(p) & 0xff; p += 1
          pr = (pr + dg + ((b2 >> 4) & 0x0f) - 8) & 0xff
          pg = (pg + dg) & 0xff
          pb = (pb + dg + (b2 & 0x0f) - 8) & 0xff
        case _ => //                                            QOI_OP_RUN
          val run = (b1 & 0x3f) + 1
          if (run > n - out) return None // over-long run
          val lv = (77 * pr + 150 * pg + 29 * pb) >> 8
          var k = 0
          while (k < run) { lum(out) = lv; out += 1; k += 1 }
      }
      if ((b1 >> 6) != 3 || b1 == 0xfe || b1 == 0xff) {
        index((3 * pr + 5 * pg + 7 * pb + 11 * pa) % 64) =
          (pr << 24) | (pg << 16) | (pb << 8) | pa
        lum(out) = (77 * pr + 150 * pg + 29 * pb) >> 8
        out += 1
      }
    }
    // strict end: exactly the 7×0x00 + 0x01 marker, nothing else
    if (p + 8 != b.length) return None
    var k = 0
    while (k < 7) { if (b(p + k) != 0) return None; k += 1 }
    if (b(p + 7) != 1) return None
    Some((w.toInt, h.toInt, lum))
  }

  private[graft] def bmpPixels(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val dataOff = le32(b, 10)
    val dibSize = le32(b, 14)
    // < 40: BITMAPCOREHEADER unsupported; upper bound rejects corrupt
    // sizes whose Int truncation would go negative (found by fuzzing)
    if (dibSize < 40 || dibSize > 65536) return None
    val w = le32(b, 18).toInt
    val hRaw = le32(b, 22).toInt
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    if (le16(b, 26) != 1) return None // planes
    val bpp = le16(b, 28)
    if (le32(b, 30) != 0L) return None // BI_RGB only
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None
    if (bpp != 8 && bpp != 24) return None
    val rowBytes = ((w.toLong * bpp + 31L) / 32L) * 4L
    if (dataOff < 0 || dataOff + rowBytes * h > b.length) return None
    val palOff = 14 + dibSize.toInt
    val palSize =
      if (bpp != 8) 0
      else {
        val used = le32(b, 46).toInt
        val n = if (used == 0) 256 else used
        if (palOff + 4L * n > dataOff) return None // palette must fit
        n
      }
    val lum = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val r = if (topDown) y else h - 1 - y
      val rowOff = dataOff + r * rowBytes
      var x = 0
      while (x < w) {
        val (bb, gg, rr) =
          if (bpp == 24) {
            val p = (rowOff + 3L * x).toInt
            (u8(b, p), u8(b, p + 1), u8(b, p + 2))
          } else {
            val pi = u8(b, (rowOff + x).toInt)
            if (pi >= palSize) (0, 0, 0)
            else {
              val p = palOff + 4 * pi // BGRA quad
              (u8(b, p), u8(b, p + 1), u8(b, p + 2))
            }
          }
        lum(y * w + x) = (299 * rr + 587 * gg + 114 * bb) / 1000
        x += 1
      }
      y += 1
    }
    Some((w, h, lum))
  }

  // ---- real baseline JPEG pixel decode (pure JVM: canonical huffman +
  // dequant + deterministic separable IDCT — public format structure,
  // ITU-T T.81 §§B.2 (syntax), F.2 (sequential decode)) ----

  /** Zigzag scan position -> raster position in the 8×8 block
    * (T.81 Figure 5). */
  private val jpegZigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Separable IDCT basis M(x)(u) = ½·a(u)·cos((2x+1)uπ/16), a(0)=1/√2.
    * StrictMath keeps the table bit-identical on every JVM, so decode is
    * deterministic (and EXACT for DC-only blocks: the output F₀₀·Q₀₀/8
    * is an integer whenever 8 | F₀₀·Q₀₀ — the fixture contract). */
  private val jpegIdctM: Array[Double] = {
    val m = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) {
        val a = if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0
        m(x * 8 + u) =
          0.5 * a * StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0)
        u += 1
      }
      x += 1
    }
    m
  }

  /** Canonical huffman decode tables (T.81 §C.2: mincode/maxcode/valptr
    * per code length 1..16). `build` returns None for over-subscribed
    * length counts (more codes at a length than the tree has slots). */
  private final class JpegHuff(
      val mincode: Array[Int], val maxcode: Array[Int],
      val valptr: Array[Int], val vals: Array[Int])

  private def jpegHuffBuild(
      bits: Array[Int], vals: Array[Int]): Option[JpegHuff] = {
    val mincode = new Array[Int](17)
    val maxcode = Array.fill(17)(-1)
    val valptr = new Array[Int](17)
    var code = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      val n = bits(l - 1)
      if (n > 0) {
        valptr(l) = k
        mincode(l) = code
        code += n
        k += n
        maxcode(l) = code - 1
        if (code > (1 << l)) return None // over-subscribed
      }
      code <<= 1
      l += 1
    }
    Some(new JpegHuff(mincode, maxcode, valptr, vals))
  }

  /** Entropy-segment bit reader with FF00 byte unstuffing; hitting any
    * real marker (FF xx, xx≠00) flags `markerHit` and pins `pos` AT the
    * FF so restart handling can consume the marker bytes directly. */
  private final class JpegBits(b: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nbits = 0
    var markerHit = false
    def readBit(): Int = {
      if (nbits == 0) {
        if (markerHit || pos >= b.length) { markerHit = true; return -1 }
        val byte = b(pos) & 0xff
        pos += 1
        if (byte == 0xff) {
          if (pos >= b.length) { markerHit = true; return -1 }
          if ((b(pos) & 0xff) == 0) pos += 1
          else { markerHit = true; pos -= 1; return -1 }
        }
        cur = byte
        nbits = 8
      }
      nbits -= 1
      (cur >> nbits) & 1
    }
    /** n extra amplitude bits, MSB first; Int.MinValue on starvation. */
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val bit = readBit()
        if (bit < 0) return Int.MinValue
        v = (v << 1) | bit
        i += 1
      }
      v
    }
    /** Byte-align (drop partial-byte padding bits) and consume the
      * expected RSTn marker, tolerating optional FF fill bytes. */
    def consumeRst(n: Int): Boolean = {
      nbits = 0
      markerHit = false
      while (pos + 1 < b.length && (b(pos) & 0xff) == 0xff &&
        (b(pos + 1) & 0xff) == 0xff) pos += 1 // fill bytes
      if (pos + 2 > b.length || (b(pos) & 0xff) != 0xff ||
        (b(pos + 1) & 0xff) != (0xd0 + n)) return false
      pos += 2
      true
    }
  }

  private def jpegDecodeHuff(h: JpegHuff, r: JpegBits): Int = {
    var code = 0
    var l = 1
    while (l <= 16) {
      val bit = r.readBit()
      if (bit < 0) return -1
      code = (code << 1) | bit
      if (h.maxcode(l) >= 0 && code <= h.maxcode(l) && code >= h.mincode(l))
        return h.vals(h.valptr(l) + code - h.mincode(l))
      l += 1
    }
    -1
  }

  /** T.81 F.2.2.1 EXTEND: map `v` (s magnitude bits) to its signed
    * coefficient value. */
  private def jpegExtend(v: Int, s: Int): Int =
    if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Decode a baseline sequential JPEG (SOF0/SOF1, huffman, 8-bit) to a
    * per-pixel integer LUMA raster: marker walk for DQT/DHT/SOF/DRI,
    * then the SOS entropy scan — canonical huffman DC+AC per block,
    * dequantize, deterministic separable double IDCT (level shift +128,
    * clamp 0..255), restart markers reset the DC predictions. Only the
    * Y component's pixels are kept (JFIF Y IS the BT.601 luma — the
    * same weighting the other codecs compute from RGB), but chroma
    * blocks are still fully huffman-decoded to advance the bitstream.
    * Subsampled Y (a component with smaller factors than the frame max,
    * rare) upsamples by integral pixel replication; the MCU-padded
    * plane is cropped to the declared w×h. Returns None — never throws
    * — for progressive (SOF2), arithmetic-coded, 12-bit, >4:1 factors,
    * non-integral upsampling, or any truncated/corrupt structure. */
  private[graft] def jpegPixels(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    val qt = Array.ofDim[Int](4, 64) // raster order after de-zigzag
    val qtSet = new Array[Boolean](4)
    val dcTab = new Array[JpegHuff](4)
    val acTab = new Array[JpegHuff](4)
    var w = 0; var h = 0; var nComp = 0
    var compId: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var compQ: Array[Int] = null
    var ri = 0 // restart interval in MCUs (0 = none)
    var sofSeen = false
    var i = 2
    while (i + 2 <= b.length) {
      if (u8(b, i) != 0xff) return None
      val m = u8(b, i + 1)
      if (m == 0xff) i += 1 // fill byte
      else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) i += 2 // bare markers
      else if (m == 0xd9) return None // EOI before a decodable scan
      else {
        if (i + 4 > b.length) return None
        val len = be16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return None
        val segEnd = i + 2 + len
        m match {
          case 0xdb => // DQT: one or more (precision|id, 64/128 bytes)
            var p = i + 4
            while (p < segEnd) {
              val pq = u8(b, p) >> 4
              val tq = u8(b, p) & 15
              if (tq > 3) return None
              if (pq == 0) {
                if (p + 65 > segEnd) return None
                var k = 0
                while (k < 64) { qt(tq)(jpegZigzag(k)) = u8(b, p + 1 + k); k += 1 }
                p += 65
              } else if (pq == 1) {
                if (p + 129 > segEnd) return None
                var k = 0
                while (k < 64) { qt(tq)(jpegZigzag(k)) = be16(b, p + 1 + 2 * k); k += 1 }
                p += 129
              } else return None
              qtSet(tq) = true
            }
          case 0xc4 => // DHT: one or more (class|id, 16 counts, symbols)
            var p = i + 4
            while (p < segEnd) {
              val tc = u8(b, p) >> 4
              val th = u8(b, p) & 15
              if (tc > 1 || th > 3 || p + 17 > segEnd) return None
              val bits = Array.tabulate(16)(l => u8(b, p + 1 + l))
              val total = bits.sum
              if (total > 256 || p + 17 + total > segEnd) return None
              val vals = Array.tabulate(total)(k => u8(b, p + 17 + k))
              val huff = jpegHuffBuild(bits, vals).getOrElse(return None)
              if (tc == 0) dcTab(th) = huff else acTab(th) = huff
              p += 17 + total
            }
          case 0xc0 | 0xc1 => // SOF0 baseline / SOF1 extended sequential
            if (sofSeen || u8(b, i + 4) != 8) return None
            h = be16(b, i + 5); w = be16(b, i + 7)
            nComp = u8(b, i + 9)
            if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None
            if ((nComp != 1 && nComp != 3) || len != 8 + 3 * nComp) return None
            compId = new Array[Int](nComp)
            compH = new Array[Int](nComp)
            compV = new Array[Int](nComp)
            compQ = new Array[Int](nComp)
            var c = 0
            while (c < nComp) {
              compId(c) = u8(b, i + 10 + 3 * c)
              val hv = u8(b, i + 11 + 3 * c)
              compH(c) = hv >> 4; compV(c) = hv & 15
              compQ(c) = u8(b, i + 12 + 3 * c)
              if (compH(c) < 1 || compH(c) > 4 || compV(c) < 1 ||
                compV(c) > 4 || compQ(c) > 3) return None
              c += 1
            }
            sofSeen = true
          case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
              0xcd | 0xce | 0xcf =>
            return None // progressive / lossless / arithmetic / hierarchical
          case 0xdd => // DRI
            if (len != 4) return None
            ri = be16(b, i + 4)
          case 0xda => // SOS: the one interleaved scan this decoder reads
            if (!sofSeen) return None
            val ns = u8(b, i + 4)
            if (ns != nComp || len != 6 + 2 * ns) return None
            val dcSel = new Array[Int](nComp)
            val acSel = new Array[Int](nComp)
            var c = 0
            while (c < ns) {
              val cs = u8(b, i + 5 + 2 * c)
              val fi = compId.indexOf(cs)
              if (fi < 0 || fi != c) return None // frame order required
              dcSel(c) = u8(b, i + 6 + 2 * c) >> 4
              acSel(c) = u8(b, i + 6 + 2 * c) & 15
              if (dcSel(c) > 3 || acSel(c) > 3 || dcTab(dcSel(c)) == null ||
                acTab(acSel(c)) == null || !qtSet(compQ(c))) return None
              c += 1
            }
            // Ss=0, Se=63, AhAl=0 for sequential
            if (u8(b, segEnd - 3) != 0 || u8(b, segEnd - 2) != 63 ||
              u8(b, segEnd - 1) != 0) return None
            return jpegScan(b, segEnd, w, h, nComp, compH, compV, compQ,
              dcSel.map(i => dcTab(i)), acSel.map(i => acTab(i)), qt, ri)
          case _ => () // APPn / COM / DNL / others: skipped
        }
        i = segEnd
      }
    }
    None
  }

  /** The SOS entropy scan of [[jpegPixels]]: MCU loop, per-component
    * block decode + IDCT, Y-plane assembly, restart handling. */
  private def jpegScan(
      b: Array[Byte], start: Int, w: Int, h: Int, nComp: Int,
      compH: Array[Int], compV: Array[Int], compQ: Array[Int],
      dc: Array[JpegHuff], ac: Array[JpegHuff], qt: Array[Array[Int]],
      ri: Int): Option[(Int, Int, Array[Int])] = {
    var maxH = 1; var maxV = 1
    var c = 0
    while (c < nComp) {
      if (compH(c) > maxH) maxH = compH(c)
      if (compV(c) > maxV) maxV = compV(c)
      c += 1
    }
    // integral Y upsampling only (universal in practice: Y carries max)
    if (maxH % compH(0) != 0 || maxV % compV(0) != 0) return None
    val mcusX = (w + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (h + 8 * maxV - 1) / (8 * maxV)
    val planeW = mcusX * compH(0) * 8
    val planeH = mcusY * compV(0) * 8
    if (planeW.toLong * planeH > (1L << 27)) return None
    val plane = new Array[Int](planeW * planeH)
    val r = new JpegBits(b, start)
    val pred = new Array[Int](nComp)
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64)
    // decode one block of component c; place = top-left in the Y plane
    // (negative = chroma / discard: decoded only to advance the stream)
    def block(c: Int, px: Int, py: Int): Boolean = {
      val q = qt(compQ(c))
      java.util.Arrays.fill(coef, 0)
      val t = jpegDecodeHuff(dc(c), r)
      if (t < 0 || t > 15) return false
      if (t > 0) {
        val v = r.receive(t)
        if (v == Int.MinValue) return false
        pred(c) += jpegExtend(v, t)
      }
      coef(0) = pred(c) * q(0)
      var k = 1
      var eob = false
      while (k < 64 && !eob) {
        val rs = jpegDecodeHuff(ac(c), r)
        if (rs < 0) return false
        val run = rs >> 4
        val size = rs & 15
        if (size == 0) {
          if (run == 15) k += 16 else eob = true // ZRL / EOB
        } else {
          k += run
          if (k > 63) return false
          val v = r.receive(size)
          if (v == Int.MinValue) return false
          val rp = jpegZigzag(k)
          coef(rp) = jpegExtend(v, size) * q(rp)
          k += 1
        }
      }
      if (px < 0) return true // chroma: bitstream advanced, nothing kept
      // separable IDCT: rows over u, then columns over v
      var v = 0
      while (v < 8) {
        var x = 0
        while (x < 8) {
          var s = 0.0
          var u = 0
          while (u < 8) { s += jpegIdctM(x * 8 + u) * coef(v * 8 + u); u += 1 }
          tmp(v * 8 + x) = s
          x += 1
        }
        v += 1
      }
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          var s = 0.0
          var vv = 0
          while (vv < 8) { s += jpegIdctM(y * 8 + vv) * tmp(vv * 8 + x); vv += 1 }
          val pix = math.rint(s).toInt + 128
          plane((py + y) * planeW + px + x) =
            if (pix < 0) 0 else if (pix > 255) 255 else pix
          x += 1
        }
        y += 1
      }
      true
    }
    val totalMcus = mcusX.toLong * mcusY
    var mcu = 0L
    while (mcu < totalMcus) {
      if (ri > 0 && mcu > 0 && mcu % ri == 0) {
        if (!r.consumeRst(((mcu / ri - 1) % 8).toInt)) return None
        java.util.Arrays.fill(pred, 0)
      }
      val mx = (mcu % mcusX).toInt
      val my = (mcu / mcusX).toInt
      var c = 0
      while (c < nComp) {
        var bv = 0
        while (bv < compV(c)) {
          var bh = 0
          while (bh < compH(c)) {
            val keep = c == 0
            val ok = block(c,
              if (keep) (mx * compH(0) + bh) * 8 else -1,
              if (keep) (my * compV(0) + bv) * 8 else -1)
            if (!ok) return None
            bh += 1
          }
          bv += 1
        }
        c += 1
      }
      mcu += 1
    }
    // crop + integral upsample to the declared raster
    val fx = maxH / compH(0)
    val fy = maxV / compV(0)
    val lum = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val srcRow = (y / fy) * planeW
      val dstRow = y * w
      var x = 0
      while (x < w) {
        lum(dstRow + x) = plane(srcRow + x / fx)
        x += 1
      }
      y += 1
    }
    Some((w, h, lum))
  }

  /** Format-agnostic pixel decode: PNG ([[pngPixels]]), GIF
    * ([[gifPixels]]), BMP ([[bmpPixels]]), or baseline JPEG
    * ([[jpegPixels]]) by magic-byte sniff — every luma-raster operator
    * (perceptual hashes, pixel stats, entropy, resize) accepts any of
    * them through this one dispatch point; a new codec lands here once. */
  private[graft] def decodePixels(b: Array[Byte]): Option[(Int, Int, Array[Int])] =
    if (b == null) None // NULL cell — a NULL-hash row, never an NPE
    else if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P') pngPixels(b)
    else if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') gifPixels(b)
    else if (b.length >= 54 && b(0) == 'B' && b(1) == 'M') bmpPixels(b)
    else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8)
      jpegPixels(b)
    else if (b.length >= 14 && b(0) == 'q' && b(1) == 'o' && b(2) == 'i' &&
      b(3) == 'f') qoiPixels(b)
    else if (b.length >= 10 && b(0) == 'P' && (b(1) == '5' || b(1) == '6'))
      pnmPixels(b)
    else if (b.length >= 128 && (b(0) & 0xff) == 0x0a && b(2) == 1 &&
      b(3) == 8) pcxPixels(b)
    else if (b.length >= 44 && b(b.length - 2) == '.' &&
      b(b.length - 3) == 'E' && b(b.length - 18) == 'T') tgaPixels(b)
    else None

  /** Targa (TGA) truecolor decode — the SEVENTH codec, and the only one
    * identified by a TRAILER (the TGA 2.0 26-byte footer ending in
    * "TRUEVISION-XFILE.\0" — headerless TGA 1.0 is undetectable among
    * arbitrary bytes, so this engine requires the footer; documented
    * posture). Supports image types 2 (uncompressed truecolor) and 10
    * (run-length encoded): packet header high bit selects a RUN packet
    * (one BGR pixel repeated count times) vs a RAW packet (count literal
    * pixels), count = low 7 bits + 1; runs MAY cross scanline
    * boundaries (the liberal reading most encoders rely on). Pixels are
    * stored B,G,R (the classic channel-order trap — the fixture's three
    * channels carry DIFFERENT formulas so a swap cannot cancel);
    * `imageDescriptor` bit 5 selects top-down row order, otherwise rows
    * are bottom-up and the decoder reverses them. 24-bit only, color
    * maps rejected, exact payload length enforced (trailing slack
    * before the footer → None, the exploder posture). Luma is the same
    * BT.601 integer form as P6/QOI: (77R + 150G + 29B) >> 8. */
  private[graft] def tgaPixels(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (b.length < 18 + 26) return None
    val sig = "TRUEVISION-XFILE."
    val off = b.length - 18
    var i = 0
    while (i < 17) {
      if (b(off + i) != sig.charAt(i).toByte) return None
      i += 1
    }
    if (b(b.length - 1) != 0) return None
    val idLen = b(0) & 0xff
    if ((b(1) & 0xff) != 0) return None //        color-mapped: rejected
    val itype = b(2) & 0xff
    if (itype != 2 && itype != 10) return None
    val w = (b(12) & 0xff) | ((b(13) & 0xff) << 8)
    val h = (b(14) & 0xff) | ((b(15) & 0xff) << 8)
    if ((b(16) & 0xff) != 24) return None //            24-bit BGR only
    val topDown = ((b(17) & 0xff) & 0x20) != 0
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None
    var p = 18 + idLen
    val end = b.length - 26
    val n = w * h
    if (p > end) return None
    val lum = new Array[Int](n)
    @inline def luma(pos: Int): Int = {
      val bl = b(pos) & 0xff; val g = b(pos + 1) & 0xff
      val r = b(pos + 2) & 0xff
      (77 * r + 150 * g + 29 * bl) >> 8
    }
    var idx = 0
    if (itype == 2) {
      if (end - p != n.toLong * 3) return None
      while (idx < n) { lum(idx) = luma(p); p += 3; idx += 1 }
    } else {
      while (idx < n) {
        if (p >= end) return None
        val hd = b(p) & 0xff; p += 1
        val cnt = (hd & 0x7f) + 1
        if (idx + cnt > n) return None
        if ((hd & 0x80) != 0) {
          if (p + 3 > end) return None
          val v = luma(p); p += 3
          var k = 0
          while (k < cnt) { lum(idx) = v; idx += 1; k += 1 }
        } else {
          if (p + 3L * cnt > end) return None
          var k = 0
          while (k < cnt) { lum(idx) = luma(p); p += 3; idx += 1; k += 1 }
        }
      }
      if (p != end) return None
    }
    if (topDown) Some((w, h, lum))
    else {
      val out = new Array[Int](n)
      var y = 0
      while (y < h) {
        System.arraycopy(lum, y * w, out, (h - 1 - y) * w, w)
        y += 1
      }
      Some((w, h, out))
    }
  }

  /** ZSoft PCX 8-bpp decode — the EIGHTH codec, and the only one whose
    * palette TRAILS the image data (the 0x0C-marked 768-byte VGA
    * palette block PCX version 5 appends). Header: manufacturer 0x0A,
    * encoding 1 (PCX is always RLE), window (xmin..xmax, ymin..ymax)
    * little-endian, one plane, `bytesPerLine` ≥ width (even padding is
    * the norm — the decoder must DROP the pad columns, the classic PCX
    * trap). RLE: a byte with both top bits set is a run header (count =
    * low 6 bits, next byte repeated); any other byte is a literal —
    * which is why literal values ≥ 0xC0 must be written as runs of 1.
    * Runs may cross scanline boundaries (liberal posture, like the TGA
    * reader); the stream must produce exactly bytesPerLine·h bytes and
    * be followed by exactly marker+palette (trailing slack → None, the
    * exploder posture). Luma: BT.601 integer (77R+150G+29B) >> 8
    * through the palette. */
  private[graft] def pcxPixels(b: Array[Byte]): Option[(Int, Int, Array[Int])] =
    pcxDecode(b).map { case (w, h, idxRaster, palOff) =>
      val lum = new Array[Int](w * h)
      var i = 0
      while (i < idxRaster.length) {
        val ci = idxRaster(i)
        val r = b(palOff + 3 * ci) & 0xff
        val g = b(palOff + 3 * ci + 1) & 0xff
        val bl = b(palOff + 3 * ci + 2) & 0xff
        lum(i) = (77 * r + 150 * g + 29 * bl) >> 8
        i += 1
      }
      (w, h, lum)
    }

  /** Shared PCX walk: header/RLE/palette validation, returning the
    * de-padded INDEX raster and the palette offset (so both the luma
    * path and the color-stats path share one decode). */
  private[graft] def pcxDecode(
      b: Array[Byte]): Option[(Int, Int, Array[Int], Int)] = {
    if (b.length < 128 + 769) return None
    if ((b(0) & 0xff) != 0x0a || (b(2) & 0xff) != 1 ||
      (b(3) & 0xff) != 8) return None
    @inline def le16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    val xmin = le16(4); val ymin = le16(6)
    val xmax = le16(8); val ymax = le16(10)
    val w = xmax - xmin + 1
    val h = ymax - ymin + 1
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None
    if ((b(65) & 0xff) != 1) return None //      multi-plane: rejected
    val bpl = le16(66)
    if (bpl < w) return None
    val total = bpl * h
    val plane = new Array[Int](total)
    var p = 128
    var idx = 0
    val dataEnd = b.length - 769
    while (idx < total) {
      if (p >= dataEnd) return None
      val v = b(p) & 0xff; p += 1
      if ((v & 0xc0) == 0xc0) {
        val cnt = v & 0x3f
        if (p >= dataEnd || idx + cnt > total) return None
        val pv = b(p) & 0xff; p += 1
        var k = 0
        while (k < cnt) { plane(idx) = pv; idx += 1; k += 1 }
      } else {
        plane(idx) = v; idx += 1
      }
    }
    if (p != dataEnd) return None //    trailing slack before the palette
    if ((b(p) & 0xff) != 0x0c) return None
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      System.arraycopy(plane, y * bpl, out, y * w, w)
      y += 1
    }
    Some((w, h, out, p + 1))
  }

  /** One PCX color row: palette-space statistics. */
  final case class PcxColorRow(
      id: Long, width: Option[Int], height: Option[Int],
      n_px: Option[Long], n_distinct_colors: Option[Long],
      dominant_index: Option[Long], dominant_count: Option[Long],
      sum_r: Option[Long], sum_g: Option[Long], sum_b: Option[Long])

  /** PCX COLOR statistics — the first color-space readout (every other
    * image operator works on luma): per image the distinct palette
    * indices used, the dominant index (max count, ties to the smaller
    * index — the "background color" detector), and the exact per-
    * channel sums through the palette. Same [[pcxDecode]] walk as the
    * luma path; undecodable bytes → NULL row. Row-local, no shuffle. */
  def pcxColorStats(
      df: DataFrame, idCol: String, binCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { case (id, b) =>
        pcxDecode(if (b == null) Array.emptyByteArray else b) match {
          case None => PcxColorRow(id, None, None, None, None, None,
            None, None, None, None)
          case Some((w, h, idxRaster, palOff)) =>
            val counts = new Array[Long](256)
            var i = 0
            while (i < idxRaster.length) {
              counts(idxRaster(i)) += 1L; i += 1
            }
            var distinct = 0L
            var domIdx = -1
            var domCnt = -1L
            var sr = 0L; var sg = 0L; var sb = 0L
            var ci = 0
            while (ci < 256) {
              val c = counts(ci)
              if (c > 0L) {
                distinct += 1L
                if (c > domCnt) { domCnt = c; domIdx = ci }
                sr += c * (b(palOff + 3 * ci) & 0xff)
                sg += c * (b(palOff + 3 * ci + 1) & 0xff)
                sb += c * (b(palOff + 3 * ci + 2) & 0xff)
              }
              ci += 1
            }
            PcxColorRow(id, Some(w), Some(h), Some(w.toLong * h),
              Some(distinct), Some(domIdx.toLong), Some(domCnt),
              Some(sr), Some(sg), Some(sb))
        }
      }))
      .toDF()
  }

  /** Exact area-average downsample of a luma raster to a gw×gh grid:
    * cell (gx,gy) floors the mean over pixel block
    * [gx·w div gw, (gx+1)·w div gw) × [gy·h div gh, (gy+1)·h div gh)
    * (nearest-pixel fallback when the image is narrower than the grid).
    * Pure integer arithmetic — oracle-replayable from a closed-form
    * raster. */
  private[graft] def areaGrid(
      lum: Array[Int], w: Int, h: Int, gw: Int, gh: Int): Array[Long] = {
    val out = new Array[Long](gw * gh)
    var gy = 0
    while (gy < gh) {
      var y0 = gy * h / gh; var y1 = (gy + 1) * h / gh
      if (y1 <= y0) { y0 = math.min(y0, h - 1); y1 = y0 + 1 }
      var gx = 0
      while (gx < gw) {
        var x0 = gx * w / gw; var x1 = (gx + 1) * w / gw
        if (x1 <= x0) { x0 = math.min(x0, w - 1); x1 = x0 + 1 }
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          val base = y * w
          while (x < x1) { s += lum(base + x); x += 1 }
          y += 1
        }
        out(gy * gw + gx) = s / ((x1 - x0).toLong * (y1 - y0))
        gx += 1
      }
      gy += 1
    }
    out
  }

  /** Perceptual-hash row: decoded dims plus the three classic
    * fingerprints as 32-bit word pairs (no BIGINT sign-bit shifts).
    * Null hash words = the payload did not pixel-decode (the row
    * SURFACES rather than disappearing — undecodable inputs are data,
    * not absences). */
  final case class MediaHashes(
      id: Long, width: Option[Int], height: Option[Int],
      ahash_lo: Option[Long], ahash_hi: Option[Long],
      dhash_lo: Option[Long], dhash_hi: Option[Long],
      phash_lo: Option[Long], phash_hi: Option[Long])

  private def packBits(bit: Int => Boolean): (Long, Long) = {
    var lo = 0L; var hi = 0L
    var k = 0
    while (k < 32) { if (bit(k)) lo |= 1L << k; k += 1 }
    while (k < 64) { if (bit(k)) hi |= 1L << (k - 32); k += 1 }
    (lo, hi)
  }

  private def hashOne(id: Long, content: Array[Byte]): MediaHashes =
    decodePixels(content) match {
      case None => MediaHashes(id, None, None, None, None, None, None, None, None)
      case Some((w, h, lum)) =>
        // aHash: 8×8 area grid, threshold vs the floored grid mean
        val g8 = areaGrid(lum, w, h, 8, 8)
        val mean = g8.sum / 64L
        val (alo, ahi) = packBits(k => g8(k) > mean)
        // dHash: 9×8 grid, bit k = right neighbour brighter
        val g9 = areaGrid(lum, w, h, 9, 8)
        val (dlo, dhi) = packBits { k =>
          val i = (k / 8) * 9 + (k % 8); g9(i + 1) > g9(i)
        }
        // pHash: exact integer 8×8 DCT-II over g8 with the quantized
        // basis dctTableQ (shared verbatim with the oracle), each
        // coefficient thresholded against the lower median of the 63
        // AC coefficients. |coef| <= 64·255·3536² ≈ 2.1e11 — long-exact.
        val tq = dctTableQ.toArray
        val coef = new Array[Long](64)
        var k = 0
        while (k < 64) {
          var s = 0L
          var g = 0
          while (g < 64) {
            s += g8(g) * tq((k / 8) * 8 + g % 8) * tq((k % 8) * 8 + g / 8)
            g += 1
          }
          coef(k) = s
          k += 1
        }
        val ac = java.util.Arrays.copyOfRange(coef, 1, 64)
        java.util.Arrays.sort(ac)
        val med = ac(31)
        val (plo, phi) = packBits(k => coef(k) > med)
        MediaHashes(id, Some(w), Some(h), Some(alo), Some(ahi),
          Some(dlo), Some(dhi), Some(plo), Some(phi))
    }

  /** All three perceptual fingerprints (aHash / dHash / pHash) from
    * REAL decoded pixels, one batched partition-local pass: inflate +
    * unfilter each PNG once ([[pngPixels]]), area-average to the 8×8
    * and 9×8 luma grids, pack bits in the kernel. Emits
    * (id, width, height, ahash_lo/hi, dhash_lo/hi, phash_lo/hi);
    * payloads that do not pixel-decode emit NULL hash words (never
    * dropped). Row-local map work — no shuffle, binary column pruned
    * away after the kernel; the [[decode]] batching shape, so a codec
    * with per-batch init slots in unchanged. */
  def perceptualHashes(
      df: DataFrame, idCol: String, binCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    val ds = df.select(
      col(idCol).cast("long").as("id"),
      lit("image").as("mediaType"),
      col(binCol).cast("binary").as("content")).as[MediaRecord]
    ds.mapPartitions(_.grouped(batchSize).flatMap(
        _.map(r => hashOne(r.id, r.content))))
      .toDF()
  }

  /** Decoded-pixel quality statistics: exact luma moments plus EDGE
    * DENSITY — the blur / flat-image / synthetic-gradient signal an
    * image-corpus quality filter keys on (a near-constant or heavily
    * blurred image has almost no pixel whose L1 gradient
    * `|L(x+1,y)−L(x,y)| + |L(x,y+1)−L(x,y)|` clears the threshold).
    * Per row: (id, width, height, n_px, luma_sum, luma_mean_q
    * = sum·1000 div n, luma_min, luma_max, edge_count,
    * edge_density_q = count·1000000 div interior) — all exact integers;
    * 1-pixel-wide/tall images have no interior and emit NULL edge
    * fields; undecodable payloads surface with NULL stats. */
  final case class MediaPixelStats(
      id: Long, width: Option[Int], height: Option[Int],
      n_px: Option[Long], luma_sum: Option[Long], luma_mean_q: Option[Long],
      luma_min: Option[Long], luma_max: Option[Long],
      edge_count: Option[Long], edge_density_q: Option[Long])

  def pixelStats(
      df: DataFrame, idCol: String, binCol: String,
      edgeThreshold: Int = 24, batchSize: Int = 64): DataFrame = {
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    val ds = df.select(
      col(idCol).cast("long").as("id"),
      lit("image").as("mediaType"),
      col(binCol).cast("binary").as("content")).as[MediaRecord]
    ds.mapPartitions(_.grouped(batchSize).flatMap(_.map { r =>
        decodePixels(r.content) match {
          case None => MediaPixelStats(r.id, None, None, None, None,
            None, None, None, None, None)
          case Some((w, h, lum)) =>
            val n = w.toLong * h
            var s = 0L; var mn = 255L; var mx = 0L
            var i = 0
            while (i < lum.length) {
              val v = lum(i)
              s += v
              if (v < mn) mn = v
              if (v > mx) mx = v
              i += 1
            }
            val interior = (w - 1).toLong * (h - 1)
            val edges =
              if (interior <= 0) None
              else {
                var c = 0L
                var y = 0
                while (y < h - 1) {
                  var x = 0
                  val row = y * w
                  while (x < w - 1) {
                    val g = math.abs(lum(row + x + 1) - lum(row + x)) +
                      math.abs(lum(row + w + x) - lum(row + x))
                    if (g > edgeThreshold) c += 1
                    x += 1
                  }
                  y += 1
                }
                Some(c)
              }
            MediaPixelStats(r.id, Some(w), Some(h), Some(n), Some(s),
              Some(s * 1000L / n), Some(mn), Some(mx), edges,
              edges.map(_ * 1000000L / interior))
        }
      }))
      .toDF()
  }

  /** Shannon entropy of the 16-bin luma histogram over REAL decoded
    * pixels — the information-content quality signal (a flat color
    * card or synthetic gradient scores near 0; natural photos sit
    * high), complementing [[pixelStats]]'s edge density. Exact-integer
    * discipline end to end: with bin counts c_i and n pixels,
    * `H = ln n − (Σ c_i·ln c_i)/n`; each ln is quantized ONCE at 1e-8
    * (`rint(ln·1e8)` — the engine libm rule, replayed by the oracle as
    * `round(ln(x)·1e8)`), the weighted sum is an exact BIGINT, and
    * `entropy_q = (n·lnq(n) − Σ c_i·lnq(c_i)) div n` emits in 1e-8
    * nats. Per row: (id, width, height, n_px, n_bins_nonzero,
    * entropy_q); NULLs when undecodable. */
  final case class MediaEntropy(
      id: Long, width: Option[Int], height: Option[Int],
      n_px: Option[Long], n_bins_nonzero: Option[Long],
      entropy_q: Option[Long])

  def lumaEntropy(
      df: DataFrame, idCol: String, binCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    val ds = df.select(
      col(idCol).cast("long").as("id"),
      lit("image").as("mediaType"),
      col(binCol).cast("binary").as("content")).as[MediaRecord]
    def lnq(x: Long): Long = math.rint(math.log(x.toDouble) * 1e8).toLong
    ds.mapPartitions(_.grouped(batchSize).flatMap(_.map { r =>
        decodePixels(r.content) match {
          case None => MediaEntropy(r.id, None, None, None, None, None)
          case Some((w, h, lum)) =>
            val hist = new Array[Long](16)
            var i = 0
            while (i < lum.length) { hist(lum(i) / 16) += 1L; i += 1 }
            val n = lum.length.toLong
            var sq = 0L; var nz = 0L
            var b = 0
            while (b < 16) {
              val c = hist(b)
              if (c > 0L) { sq += c * lnq(c); nz += 1L }
              b += 1
            }
            MediaEntropy(r.id, Some(w), Some(h), Some(n), Some(nz),
              Some((n * lnq(n) - sq) / n))
        }
      }))
      .toDF()
  }

  /** REAL area-average thumbnail: decode pixels, downsample to
    * `outW`×`outH` with [[areaGrid]]'s exact integer box means, and
    * fingerprint the resized raster with the rolling polynomial hash
    * `fp = fold (acc·31 + v) mod P` in row-major order — the verifiable
    * stand-in for shipping the thumbnail bytes (an oracle replays fp
    * from the closed-form raster; a production sink would emit the grid
    * as a binary column from the SAME kernel). Per row: (id, width,
    * height, out_w, out_h, resized_fp); NULL fp when undecodable. */
  final case class MediaResize(
      id: Long, width: Option[Int], height: Option[Int],
      out_w: Int, out_h: Int, resized_fp: Option[Long])

  def resizePixels(
      df: DataFrame, idCol: String, binCol: String, outW: Int, outH: Int,
      batchSize: Int = 64): DataFrame = {
    require(outW >= 1 && outH >= 1, s"bad thumbnail dims ${outW}x$outH")
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    val ds = df.select(
      col(idCol).cast("long").as("id"),
      lit("image").as("mediaType"),
      col(binCol).cast("binary").as("content")).as[MediaRecord]
    ds.mapPartitions(_.grouped(batchSize).flatMap(_.map { r =>
        decodePixels(r.content) match {
          case None => MediaResize(r.id, None, None, outW, outH, None)
          case Some((w, h, lum)) =>
            val g = areaGrid(lum, w, h, outW, outH)
            var fp = 0L
            var i = 0
            while (i < g.length) { fp = (fp * 31L + g(i)) % P; i += 1 }
            MediaResize(r.id, Some(w), Some(h), outW, outH, Some(fp))
        }
      }))
      .toDF()
  }

  /** One resample summary row; NULLs when not valid 16-bit PCM. */
  final case class AudioResample(
      id: Long, n_in: Option[Long], n_out: Option[Long],
      sum_abs_out: Option[Long], resampled_fp: Option[Long])

  /** Rational L/M resampling of the flat 16-bit PCM stream by exact
    * integer linear interpolation: output j sits at source position
    * p = j·M/L; with num = j·M, k = num div L, r = num mod L, the
    * sample is s(k) when r = 0 and
    * `(s(k)·(L−r) + s(k+1)·r) / L` otherwise — TRUNCATING division
    * (toward zero), the SQL `div` / DuckDB `//` convention, so
    * negative samples round the same way the oracle does.
    * n_out = (n−1)·L/M + 1 output
    * positions land inside the stream. The resampled stream is
    * summarized as Σ|v| plus the rolling fingerprint
    * `fold (a·31 + v + 32768) mod P` (shifted non-negative) — the
    * verifiable stand-in for shipping resampled bytes, as with
    * [[resizePixels]]. Row-local kernel, no shuffle. */
  def wavResample(
      df: DataFrame, idCol: String, binCol: String, upL: Int, downM: Int,
      batchSize: Int = 64): DataFrame = {
    require(upL >= 1 && downM >= 1, s"bad resample ratio $upL/$downM")
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    val ds = df.select(
      col(idCol).cast("long").as("id"),
      lit("audio").as("mediaType"),
      col(binCol).cast("binary").as("content")).as[MediaRecord]
    ds.mapPartitions(_.grouped(batchSize).flatMap(_.map { r =>
        pcm16Data(r.content) match {
          case None => AudioResample(r.id, None, None, None, None)
          case Some((dataOff, n)) if n > 0 =>
            def s(i: Int): Long =
              le16(r.content, dataOff + 2 * i).toShort.toLong
            val nOut = ((n - 1).toLong * upL / downM + 1L).toInt
            var fp = 0L
            var sumAbs = 0L
            var j = 0
            while (j < nOut) {
              val num = j.toLong * downM
              val k = (num / upL).toInt // num >= 0: trunc == floor
              val rr = (num - k.toLong * upL).toInt
              val v =
                if (rr == 0) s(k)
                else (s(k) * (upL - rr) + s(k + 1) * rr) / upL
              sumAbs += math.abs(v)
              fp = (fp * 31L + v + 32768L) % P
              j += 1
            }
            AudioResample(r.id, Some(n.toLong), Some(nOut.toLong),
              Some(sumAbs), Some(fp))
          case Some(_) =>
            AudioResample(r.id, Some(0L), Some(0L), Some(0L), Some(0L))
        }
      }))
      .toDF()
  }

  /** Quantized DFT basis for bin k over a `window`-point frame:
    * (cosq, sinq) with cosq(i) = round(1e4·cos(2πki/window)), sinq(i) =
    * round(1e4·sin(2πki/window)) — driver-computed longs shared
    * VERBATIM with the DuckDB oracle (the [[dctTableQ]] discipline), so
    * the per-window correlations Σv·cosq / Σv·sinq stay exact integer
    * arithmetic end to end. */
  def dftTableQ(window: Int, k: Int): (Seq[Long], Seq[Long]) = (
    (0 until window).map(i =>
      math.round(1e4 * math.cos(2.0 * math.Pi * k * i / window))),
    (0 until window).map(i =>
      math.round(1e4 * math.sin(2.0 * math.Pi * k * i / window))))

  /** One exact per-(window, bin) spectral row: the quantized-basis DFT
    * correlations re = Σv·cosq, im = Σv·sinq (EXACT BIGINTs — |re| ≤
    * window·32768·10⁴ ≈ 2·10¹³ even at full scale) and the bin power
    * re² + im² as ONE fixed-shape IEEE readout (the squares exceed
    * BIGINT at full scale, so power is the documented float surface;
    * re/im carry the exactness). */
  final case class AudioSpectrumRow(
      id: Long, win: Long, n_samples: Long, bin: Int,
      re: Long, im: Long, power: Double)

  /** Windowed quantized-DFT filterbank over 16-bit PCM — the tone /
    * band-energy featurizer beside [[wavWindowEnergy]] (broadband) and
    * [[wavWindowZcr]] (crossings): per `window`-sample block and
    * requested bin k, the exact integer correlations against the
    * quantized k-cycles-per-window basis and their power. A hum
    * detector keys on one bin; a crude voiced-pitch estimate on the
    * argmax; a band filterbank on a handful — all from ONE pass over
    * the samples (bins iterate inside the kernel, samples stream once
    * per window). Tail windows correlate against the basis PREFIX
    * (i indexes within-window position). Row-local batched kernel, no
    * shuffle; output O(windows · bins). */
  def wavWindowSpectrum(
      df: DataFrame, idCol: String, binCol: String, window: Int = 64,
      bins: Seq[Int] = Seq(1, 2, 4, 8), batchSize: Int = 64): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    require(bins.nonEmpty && bins.forall(k => k >= 0 && k <= window / 2),
      s"bins must lie in [0, window/2], got $bins")
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    val tables = bins.map { k =>
      val (c, s) = dftTableQ(window, k); (k, (c.toArray, s.toArray))
    }.toArray
    val ds = df.select(
      col(idCol).cast("long").as("id"),
      lit("audio").as("mediaType"),
      col(binCol).cast("binary").as("content")).as[MediaRecord]
    ds.mapPartitions(_.grouped(batchSize).flatMap(_.flatMap { r =>
        pcm16Data(r.content) match {
          case None => Nil
          case Some((dataOff, n)) =>
            val out =
              scala.collection.mutable.ArrayBuffer.empty[AudioSpectrumRow]
            var w = 0
            while (w.toLong * window < n) {
              val from = w * window
              val until = math.min(n, from + window)
              var b = 0
              while (b < tables.length) {
                val (k, (cosq, sinq)) = tables(b)
                var re = 0L; var im = 0L
                var j = from
                while (j < until) {
                  val v = le16(r.content, dataOff + 2 * j).toShort.toLong
                  re += v * cosq(j - from)
                  im += v * sinq(j - from)
                  j += 1
                }
                out += AudioSpectrumRow(r.id, w.toLong,
                  (until - from).toLong, k, re, im,
                  re.toDouble * re.toDouble + im.toDouble * im.toDouble)
                b += 1
              }
              w += 1
            }
            out.toSeq
        }
      }))
      .toDF()
  }

  /** One per-document silence-trim row: window count, voiced-window
    * count, and the first/last voiced window indices (NULL when the
    * whole payload is silent) — the crop plan for trimming lead-in /
    * tail silence before featurization. */
  final case class AudioTrim(
      id: Long, n_windows: Long, n_voiced: Long,
      first_voiced: Option[Long], last_voiced: Option[Long])

  /** Silence trimming over 16-bit PCM: a `window`-sample block is
    * VOICED when its mean |v| exceeds `meanAbsThreshold` (integer test
    * `Σ|v| > threshold·n` — exact); emits the first/last voiced window
    * per payload, the crop plan a resampler applies before spending
    * decode/featurize work on lead-in silence. Same row-local batched
    * kernel shape as [[wavWindowEnergy]]; non-WAV rows emit nothing. */
  def wavTrimSilence(
      df: DataFrame, idCol: String, binCol: String, window: Int = 64,
      meanAbsThreshold: Long = 16L, batchSize: Int = 64): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    val ds = df.select(
      col(idCol).cast("long").as("id"),
      lit("audio").as("mediaType"),
      col(binCol).cast("binary").as("content")).as[MediaRecord]
    ds.mapPartitions(_.grouped(batchSize).flatMap(_.flatMap { r =>
        pcm16Data(r.content) match {
          case None => Nil
          case Some((dataOff, n)) =>
            var nWin = 0L; var nVoiced = 0L
            var first: Option[Long] = None; var last: Option[Long] = None
            var w = 0
            while (w.toLong * window < n) {
              val from = w * window
              val until = math.min(n, from + window)
              var sAbs = 0L
              var j = from
              while (j < until) {
                sAbs += math.abs(
                  le16(r.content, dataOff + 2 * j).toShort.toLong)
                j += 1
              }
              if (sAbs > meanAbsThreshold * (until - from)) {
                nVoiced += 1L
                if (first.isEmpty) first = Some(w.toLong)
                last = Some(w.toLong)
              }
              nWin += 1L
              w += 1
            }
            Seq(AudioTrim(r.id, nWin, nVoiced, first, last))
        }
      }))
      .toDF()
  }

  /** One fixed-size image patch row: tile coordinates, the exact
    * floored mean luma (×1000), and the rolling-polynomial fingerprint
    * of the tile's pixels in row-major order. Undecodable payloads
    * surface as one (px, py) = (−1, −1) row with NULL stats. */
  final case class MediaPatch(
      id: Long, px: Int, py: Int, patch_mean_q: Option[Long],
      patch_fp: Option[Long])

  /** Patch extraction (the ViT "patchify" stage): split each decoded
    * raster into non-overlapping `patch`×`patch` tiles (partial edge
    * tiles are DROPPED — the fixed-geometry contract vision models
    * want; resize first if edges matter) and emit per-tile exact mean
    * and fingerprint. The fingerprint lets a trainer dedup identical
    * tiles corpus-wide (sky, letterbox bars, watermarks) with the same
    * banded machinery as [[aHashNearDup]]. Row-local batched kernel —
    * no shuffle; output O(tiles). */
  def patchify(
      df: DataFrame, idCol: String, binCol: String, patch: Int = 4,
      batchSize: Int = 64): DataFrame = {
    require(patch >= 1, s"bad patch size $patch")
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    val ds = df.select(
      col(idCol).cast("long").as("id"),
      lit("image").as("mediaType"),
      col(binCol).cast("binary").as("content")).as[MediaRecord]
    ds.mapPartitions(_.grouped(batchSize).flatMap(_.flatMap { r =>
        decodePixels(r.content) match {
          case None => Seq(MediaPatch(r.id, -1, -1, None, None))
          case Some((w, h, lum)) =>
            val nx = w / patch; val ny = h / patch
            val out = new scala.collection.mutable.ArrayBuffer[MediaPatch](
              nx * ny)
            var py = 0
            while (py < ny) {
              var px = 0
              while (px < nx) {
                var s = 0L; var fp = 0L
                var y = py * patch
                while (y < (py + 1) * patch) {
                  var x = px * patch
                  val base = y * w
                  while (x < (px + 1) * patch) {
                    val v = lum(base + x)
                    s += v
                    fp = (fp * 31L + v) % P
                    x += 1
                  }
                  y += 1
                }
                out += MediaPatch(r.id, px, py,
                  Some(s * 1000L / (patch.toLong * patch)), Some(fp))
                px += 1
              }
              py += 1
            }
            out.toSeq
        }
      }))
      .toDF()
  }

  /** One animated-GIF timing row: frame count, total animation
    * duration in centiseconds (Σ per-frame GCE delays — the number a
    * frame-sampling policy divides by), and the mean per-frame delay
    * ×1000 (exact). NULLs for non-GIF / truncated containers. */
  final case class GifTiming(
      id: Long, n_frames: Option[Int], total_delay_cs: Option[Long],
      mean_delay_mcs: Option[Long])

  /** Animation timing walk: count image descriptors and sum each
    * graphic-control extension's delay field (le16 centiseconds at GCE
    * data offset 1) — header-level only, no LZW decode, so it prices a
    * metadata scan, not a decode. The sampling planner runs THIS first
    * to size `stride` for [[frameSceneChange]]. Invalid containers
    * surface as NULL rows. */
  def gifTiming(df: DataFrame, idCol: String, binCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    val ds = df.select(
      col(idCol).cast("long").as("id"),
      lit("video").as("mediaType"),
      col(binCol).cast("binary").as("content")).as[MediaRecord]
    ds.mapPartitions(_.grouped(batchSize).flatMap(_.map { r =>
        gifAnimTiming(r.content) match {
          case None => GifTiming(r.id, None, None, None)
          case Some((frames, delay)) =>
            GifTiming(r.id, Some(frames), Some(delay),
              if (frames == 0) None else Some(delay * 1000L / frames))
        }
      }))
      .toDF()
  }

  private[graft] def gifAnimTiming(b: Array[Byte]): Option[(Int, Long)] = {
    if (gifDims(b).isEmpty) return None // full-chain validation
    val packed = u8(b, 10)
    val gctSize = if ((packed & 0x80) != 0) 1 << ((packed & 7) + 1) else 0
    var i = 13 + 3 * gctSize
    var frames = 0
    var delay = 0L
    while (i < b.length) {
      u8(b, i) match {
        case 0x3b => return Some((frames, delay))
        case 0x21 =>
          if (i + 2 > b.length) return None
          // GCE (label 0xF9, size ≥ 4): delay le16 at data offset 1
          if (u8(b, i + 1) == 0xf9 && i + 5 < b.length && u8(b, i + 2) >= 4)
            delay += le16(b, i + 4).toLong
          i = gifSkipSubBlocks(b, i + 2)
        case 0x2c =>
          if (i + 10 >= b.length) return None
          val lct = u8(b, i + 9)
          val lctSize =
            if ((lct & 0x80) != 0) 3 * (1 << ((lct & 7) + 1)) else 0
          i = gifSkipSubBlocks(b, i + 10 + lctSize + 1)
          frames += 1
        case _ => return None
      }
    }
    None
  }

  /** One TIFF/EXIF metadata row: byte order, the baseline tags an image
    * pipeline routes on (dimensions, ORIENTATION — the tag whose
    * mishandling silently rotates a training corpus), the Make string,
    * and the IFD0 entry count. NULLs where a tag is absent. */
  final case class TiffMeta(
      id: Long, byte_order: String, width: Option[Long],
      height: Option[Long], orientation: Option[Int], make: Option[String],
      n_entries: Option[Int])

  /** Parse TIFF (the container EXIF rides in): 'II'/'MM' endian mark,
    * magic 42, IFD0 walk — u16 entry count, 12-byte entries
    * (tag, type, count, value-or-offset; values ≤ 4 bytes inline,
    * LEFT-JUSTIFIED in the big-endian case per the spec), reading
    * BYTE/SHORT/LONG scalars and ASCII strings (inline or offset, NUL
    * terminated). Tags: 0x0100 ImageWidth, 0x0101 ImageLength, 0x0112
    * Orientation, 0x010F Make. Both byte orders are first-class — a
    * corpus has both. Truncated structures return None; unknown tags
    * are skipped, not errors. */
  private[graft] def tiffMeta(b: Array[Byte]): Option[(String, Map[Int, Either[Long, String]], Int)] = {
    if (b.length < 8) return None
    val little =
      if (b(0) == 'I' && b(1) == 'I') true
      else if (b(0) == 'M' && b(1) == 'M') false
      else return None
    def u16(i: Int): Int =
      if (i + 2 > b.length) -1
      else if (little) le16(b, i) else be16(b, i)
    def u32(i: Int): Long =
      if (i + 4 > b.length) -1L
      else if (little) le32(b, i) else be32(b, i)
    if (u16(2) != 42) return None
    val ifd = u32(4)
    if (ifd < 8 || ifd + 2 > b.length) return None
    val n = u16(ifd.toInt)
    if (n < 0 || ifd + 2 + 12L * n + 4 > b.length) return None
    val tags = Map.newBuilder[Int, Either[Long, String]]
    var e = 0
    while (e < n) {
      val off = ifd.toInt + 2 + 12 * e
      val tag = u16(off)
      val typ = u16(off + 2)
      val cnt = u32(off + 4)
      typ match {
        case 1 | 3 | 4 if cnt == 1L =>
          // inline scalar; big-endian inlines are left-justified
          val v = typ match {
            case 1 => (b(off + 8) & 0xff).toLong
            case 3 => u16(off + 8).toLong
            case _ => u32(off + 8)
          }
          tags += tag -> Left(v)
        case 2 if cnt >= 1L && cnt <= 4096L =>
          val at = if (cnt <= 4L) off + 8 else u32(off + 8).toInt
          if (at >= 0 && at + cnt <= b.length) {
            val raw = new String(b, at, cnt.toInt - 1,
              java.nio.charset.StandardCharsets.US_ASCII)
            tags += tag -> Right(raw)
          }
        case _ => () // rationals/arrays: not needed for the routed tags
      }
      e += 1
    }
    Some((if (little) "II" else "MM", tags.result(), n))
  }

  /** EXIF/TIFF metadata extraction over a binary column — the routing
    * pass before any pixel work (orientation-normalize, reject
    * degenerate dims). Same batched row-local kernel shape as
    * [[decode]]; non-TIFF payloads surface as all-NULL rows. */
  def exifMeta(df: DataFrame, idCol: String, binCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    val ds = df.select(
      col(idCol).cast("long").as("id"),
      lit("image").as("mediaType"),
      col(binCol).cast("binary").as("content")).as[MediaRecord]
    ds.mapPartitions(_.grouped(batchSize).flatMap(_.map { r =>
        tiffMeta(r.content) match {
          case None => TiffMeta(r.id, null, None, None, None, None, None)
          case Some((order, tags, n)) =>
            def num(t: Int): Option[Long] =
              tags.get(t).collect { case Left(v) => v }
            TiffMeta(r.id, order,
              num(0x0100), num(0x0101), num(0x0112).map(_.toInt),
              tags.get(0x010f).collect { case Right(s) => s }, Some(n))
        }
      }))
      .toDF()
  }

  /** One sampled animation frame's fingerprint row: original frame
    * index, that frame's dims, its 8×8 aHash words, and the hamming
    * distance to the PREVIOUS SAMPLED frame's aHash (NULL on the first
    * sampled frame) — the scene-change signal (a cut spikes the
    * distance; a hold/slow pan stays near 0). Undecodable payloads
    * surface as one all-NULL row at frame 0. */
  final case class MediaFrameHash(
      id: Long, frame: Int, width: Option[Int], height: Option[Int],
      ahash_lo: Option[Long], ahash_hi: Option[Long],
      hamming_prev: Option[Long])

  /** Frame sampling + scene-change detection over animated GIFs: decode
    * every `stride`-th frame ([[gifFrames]] — skipped frames are block-
    * walked, never LZW-decoded), aHash each sampled raster (8×8 area
    * grid vs floored mean, the [[perceptualHashes]] kernel), and emit
    * per-frame rows with the hamming distance between consecutive
    * sampled fingerprints. Row-local map work (one task decodes one
    * blob's frames — no shuffle, no state); the per-blob frame cap
    * `maxFrames` bounds memory against hostile containers. Downstream,
    * `hamming_prev > threshold` marks cut points for per-scene
    * sampling, and the per-frame hashes feed [[aHashNearDup]]'s banded
    * join for cross-video near-dup at corpus scale. */
  def frameSceneChange(
      df: DataFrame, idCol: String, binCol: String,
      maxFrames: Int = 64, stride: Int = 1, batchSize: Int = 16): DataFrame = {
    require(maxFrames >= 1, s"bad frame cap $maxFrames")
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    val ds = df.select(
      col(idCol).cast("long").as("id"),
      lit("video").as("mediaType"),
      col(binCol).cast("binary").as("content")).as[MediaRecord]
    ds.mapPartitions(_.grouped(batchSize).flatMap(_.flatMap { r =>
        gifFrames(r.content, maxFrames, stride) match {
          case None =>
            Seq(MediaFrameHash(r.id, 0, None, None, None, None, None))
          case Some(frames) =>
            var prev: Option[(Long, Long)] = None
            frames.map { case (f, w, h, lum) =>
              val g8 = areaGrid(lum, w, h, 8, 8)
              val mean = g8.sum / 64L
              val (alo, ahi) = packBits(k => g8(k) > mean)
              val ham = prev.map { case (plo, phi) =>
                (java.lang.Long.bitCount(alo ^ plo) +
                  java.lang.Long.bitCount(ahi ^ phi)).toLong
              }
              prev = Some((alo, ahi))
              MediaFrameHash(r.id, f, Some(w), Some(h),
                Some(alo), Some(ahi), ham)
            }
        }
      }))
      .toDF()
  }

  /** Quantized 8×8 DCT-II basis, flat `u*8+x` layout: T_q[u][x] =
    * round(1e4 · c(u) · cos(π(2x+1)u/16)), c(0)=1/√8, c(u>0)=1/2 —
    * driver-computed longs shared verbatim with the DuckDB oracle, so
    * the whole pHash pipeline stays exact integer arithmetic. */
  def dctTableQ: Seq[Long] =
    for (u <- 0 until 8; x <- 0 until 8) yield math.round(
      1e4 * (if (u == 0) 1.0 / math.sqrt(8.0) else 0.5) *
        math.cos(math.Pi * (2 * x + 1) * u / 16.0))

  /** Banded hamming near-dup over [[perceptualHashes]] fingerprints, in the
    * two-tier shape a dense corpus needs: first collapse EXACT hash
    * duplicates to one representative per distinct fingerprint (a
    * linear hash aggregate — identical images never meet pairwise), then
    * find near pairs (1 ≤ hamming ≤ `maxHamming`) among the
    * REPRESENTATIVES via a 16-bit-band equi-join — any pair within
    * hamming ≤ 48 shares an intact band by pigeonhole — verified with
    * the exact popcount distance. Output: (doc_a, doc_b, hamming) over
    * representative ids (min id per fingerprint), a < b.
    *
    * Scale: pair output and join cost are bounded by DISTINCT
    * fingerprints, not corpus rows — a million copies of one image cost
    * one aggregate row, where a single-tier pair join would emit ~10¹²
    * pairs. The only shuffles are the group-by and the band equi-join.
    * This is MinHash-LSH's shape applied to perceptual hashes. */
  def aHashNearDup(hashes: DataFrame, idCol: String,
      maxHamming: Int = 6): DataFrame = {
    val reps = hashes.groupBy(col("ahash_lo"), col("ahash_hi"))
      .agg(min(col(idCol)).as("__id"))
    val bands = reps.select(col("__id"),
        col("ahash_lo"), col("ahash_hi"),
        explode(array(
          struct(lit(0L).as("bi"), (col("ahash_lo") % 65536L).as("bv")),
          struct(lit(1L).as("bi"),
            expr("ahash_lo div 65536").as("bv")),
          struct(lit(2L).as("bi"), (col("ahash_hi") % 65536L).as("bv")),
          struct(lit(3L).as("bi"),
            expr("ahash_hi div 65536").as("bv")))).as("__u"))
      .select(col("__id"), col("ahash_lo"), col("ahash_hi"),
        col("__u.bi").as("__bi"), col("__u.bv").as("__bv"))
    bands.as("x").join(bands.as("y"),
        col("x.__bi") === col("y.__bi") && col("x.__bv") === col("y.__bv") &&
          col("x.__id") < col("y.__id"))
      .select(col("x.__id").as("doc_a"), col("y.__id").as("doc_b"),
        (expr("bit_count(x.ahash_lo ^ y.ahash_lo)") +
          expr("bit_count(x.ahash_hi ^ y.ahash_hi)")).cast("long")
          .as("hamming"))
      .filter(col("hamming") >= 1L && col("hamming") <= maxHamming)
      .distinct()
  }

  // ---- MP4 / ISO BMFF box walk (ISO/IEC 14496-12 public structure):
  // the VIDEO container parser — ftyp brand, mvhd timescale/duration,
  // per-trak tkhd dims ----

  /** Parse the ISO-BMFF box tree of an MP4/MOV payload:
    * (major brand, timescale, duration, width, height, n_tracks).
    * Handles 32-bit sizes, 64-bit `largesize` (size = 1), run-to-EOF
    * (size = 0), and version-0 AND version-1 mvhd/tkhd layouts. Width/
    * height are the 16.16 fixed-point tkhd values' integer parts,
    * MAXed over tracks (audio tracks carry 0×0 — first-match would
    * read the wrong track). Containers walked: moov, trak; depth
    * capped; any malformed size/bound returns None, never throws. */
  private[graft] def mp4Meta(
      b: Array[Byte]): Option[(String, Long, Long, Int, Int, Int)] = {
    if (b.length < 16) return None
    // an MP4 must LEAD with a box whose type is well-known, else this
    // is not BMFF at all (the dispatch guard: ftyp/moov/free/mdat/wide)
    val first = new String(b, 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (first != "ftyp" && first != "moov") return None
    var brand: String = null
    var timescale = -1L
    var duration = -1L
    var width = 0
    var height = 0
    var nTracks = 0
    def walk(from: Long, to: Long, depth: Int): Boolean = {
      var i = from
      while (i + 8 <= to) {
        val ii = i.toInt
        val sz0 = be32(b, ii)
        val tp = new String(b, ii + 4, 4,
          java.nio.charset.StandardCharsets.US_ASCII)
        var hdr = 8L
        var sz = sz0
        if (sz0 == 1L) {
          if (i + 16 > to) return false
          sz = (be32(b, ii + 8) << 32) | be32(b, ii + 12)
          hdr = 16L
        } else if (sz0 == 0L) sz = to - i
        if (sz < hdr || sz > to - i) return false
        val p = (i + hdr).toInt
        val end = i + sz
        tp match {
          case "ftyp" =>
            if (sz < hdr + 8) return false
            brand = new String(b, p, 4,
              java.nio.charset.StandardCharsets.US_ASCII)
          case "moov" =>
            if (depth < 4 && !walk(i + hdr, end, depth + 1)) return false
          case "trak" =>
            nTracks += 1
            if (depth < 4 && !walk(i + hdr, end, depth + 1)) return false
          case "mvhd" =>
            val v = u8(b, p)
            if (v == 0) {
              if (hdr + 20 > sz) return false
              timescale = be32(b, p + 12)
              duration = be32(b, p + 16)
            } else if (v == 1) {
              if (hdr + 32 > sz) return false
              timescale = be32(b, p + 20)
              duration = (be32(b, p + 24) << 32) | be32(b, p + 28)
            } else return false
          case "tkhd" =>
            val v = u8(b, p)
            val off = if (v == 0) 76 else if (v == 1) 88 else return false
            if (hdr + off + 8 > sz) return false
            val tw = (be32(b, p + off) >> 16).toInt
            val th = (be32(b, p + off + 4) >> 16).toInt
            if (tw > width) width = tw
            if (th > height) height = th
          case _ => () // mdat / free / udta / …: skipped by size
        }
        i = end
      }
      i == to // trailing sub-8-byte garbage in a container: corrupt
    }
    if (!walk(0L, b.length.toLong, 0)) return None
    if (brand == null || timescale <= 0 || duration < 0) return None
    Some((brand, timescale, duration, width, height, nTracks))
  }

  /** One parsed MP4 row; NULLs when the payload is not valid BMFF. */
  final case class Mp4Meta(
      id: Long, brand: Option[String], timescale: Option[Long],
      duration: Option[Long], duration_ms: Option[Long],
      width: Option[Int], height: Option[Int], n_tracks: Option[Int])

  /** Batched MP4 metadata extraction over a binary column — the video
    * twin of [[exifMeta]]: brand, clock (timescale/duration +
    * integer-ms), presentation dims, track count. Row-local kernel, no
    * shuffle; unparseable payloads surface as NULL rows. */
  def mp4MetaPlan(
      df: DataFrame, idCol: String, binCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    val ds = df.select(
      col(idCol).cast("long").as("id"),
      lit("video").as("mediaType"),
      col(binCol).cast("binary").as("content")).as[MediaRecord]
    ds.mapPartitions(_.grouped(batchSize).flatMap(_.map { r =>
        mp4Meta(r.content) match {
          case None =>
            Mp4Meta(r.id, None, None, None, None, None, None, None)
          case Some((brand, ts, dur, w, h, nt)) =>
            Mp4Meta(r.id, Some(brand), Some(ts), Some(dur),
              Some(dur * 1000L / ts), Some(w), Some(h), Some(nt))
        }
      }))
      .toDF()
  }
}

/** Column-expression builders for REAL container bytes (valid headers,
  * minimal bodies) — the fixture side of the codec gate: dimensions are
  * spliced into the correct header offsets as hex, `unhex` materializes
  * the binary, and the decode kernel must parse back the exact values an
  * arithmetic oracle predicts. Codegen'd string ops end to end. */
object MediaFixtures {

  private def be16h(c: Column): Column = lpad(hex(c), 4, "0")
  private def be32h(c: Column): Column = lpad(hex(c), 8, "0")
  private def swapBytes(h: Column, nBytes: Int): Column =
    concat((nBytes - 1 to 0 by -1).map(i => substring(h, i * 2 + 1, 2)): _*)
  private def le16h(c: Column): Column = swapBytes(be16h(c), 2)
  private def le32h(c: Column): Column = swapBytes(be32h(c), 4)

  /** PNG signature + IHDR (width/height be32 at offsets 16/20); 29 bytes. */
  def pngHex(w: Column, h: Column): Column =
    concat(lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
      be32h(w), be32h(h), lit("0806000000"))

  /** RIFF/WAVE with a 16-byte PCM `fmt ` chunk and a zeroed `data` chunk
    * of `samples` frames at 16-bit × `channels`; 44 + data bytes. */
  def wavHex(channels: Column, sampleRate: Column, samples: Column): Column = {
    val align = channels * 2
    val dataSize = samples * align
    concat(lit("52494646"), le32h(dataSize + 36L), lit("57415645"),
      lit("666D7420" + "10000000" + "0100"), le16h(channels),
      le32h(sampleRate), le32h(sampleRate * align), le16h(align), lit("1000"),
      lit("64617461"), le32h(dataSize), repeatHex(lit("00"), dataSize))
  }

  /** RIFF/WAVE like [[wavHex]] but with REAL nonzero PCM: flat sample
    * `i` (i = 0 .. samples·channels−1) carries the deterministic
    * sawtooth `v(i) = ((i·2477 + seed) mod 4096) − 2048` as 16-bit LE —
    * a parser must actually walk the data chunk to reproduce the
    * windowed energy an arithmetic oracle predicts from the closed
    * form. */
  def wavPcmHex(
      channels: Column, sampleRate: Column, samples: Column,
      seed: Column): Column = {
    val align = channels * 2
    val dataSize = samples * align
    val total = (samples * channels).cast("long")
    val data = concat_ws("",
      transform(sequence(lit(0L), total - lit(1L)), { i =>
        val u = ((i * lit(2477L) + seed.cast("long")) % lit(4096L) -
          lit(2048L) + lit(65536L)) % lit(65536L)
        val hx = lpad(hex(u), 4, "0")
        concat(substring(hx, 3, 2), substring(hx, 1, 2))
      }))
    concat(lit("52494646"), le32h(dataSize + 36L), lit("57415645"),
      lit("666D7420" + "10000000" + "0100"), le16h(channels),
      le32h(sampleRate), le32h(sampleRate * align), le16h(align), lit("1000"),
      lit("64617461"), le32h(dataSize), data)
  }

  /** GIF89a logical screen descriptor (w/h le16) + `frames` minimal
    * image descriptors (1×1, one LZW sub-block) + trailer; 14 + 14·k bytes. */
  def gifHex(w: Column, h: Column, frames: Column): Column = {
    val frame = "2C" + "0000" + "0000" + "0100" + "0100" + "00" + "02" + "01" + "44" + "00"
    concat(lit("474946383961"), le16h(w), le16h(h), lit("000000"),
      repeatHex(lit(frame), frames), lit("3B"))
  }

  /** JPEG SOI + APP0/JFIF + SOF0 (height be16 at seg+5, width at seg+7)
    * + EOI; 41 bytes. */
  def jpegHex(w: Column, h: Column): Column =
    concat(lit("FFD8" + "FFE0" + "0010" + "4A46494600" + "0101" + "00" +
      "0001" + "0001" + "0000" + "FFC0" + "0011" + "08"),
      be16h(h), be16h(w), lit("03" + "011100" + "021101" + "031101" + "FFD9"))

  /** `repeat` with a Column count (the functions-API overload takes a
    * literal Int only). */
  private def repeatHex(s: Column, n: Column): Column =
    org.apache.spark.sql.functions.call_function("repeat", s, n)

  /** The closed-form grayscale raster behind [[pngPixelHex]] — shared
    * with the DuckDB oracle, which replays the luma grids from this
    * formula while the engine must reproduce them from the BYTES:
    * inflate the zlib stream, undo the cycling scanline filters, then
    * area-average. Both sides matching proves the decode is real. */
  def pixelFormula(x: Column, y: Column, seed: Column): Column =
    pmod(lit(31L) * x + lit(47L) * y + lit(7L) * x * y + lit(101L) * seed,
      lit(256L))

  /** A COMPLETE valid grayscale 8-bit PNG carrying the [[pixelFormula]]
    * raster as real pixel data: per-scanline filters cycle
    * None/Sub/Up/Average/Paeth (y mod 5 — every public filter type is
    * exercised, and rows depend on PRIOR reconstructed rows, so only a
    * full sequential unfilter recovers the raster), the filtered stream
    * rides a stored-block zlib stream with a genuine Adler-32 computed
    * by column fold, and proper chunk framing (IHDR/IDAT/IEND; chunk
    * CRCs zeroed — the decoder is CRC-lenient by contract). Raw size
    * h·(w+1) must stay ≤ 65535 (one stored block) — fixture dims are
    * small by construction. Codegen'd column arithmetic end to end. */
  def pngPixelHex(w: Column, h: Column, seed: Column): Column = {
    def idiv(a: Column, b: Column): Column = floor(a / b).cast("long")
    val wl = w.cast("long"); val hl = h.cast("long")
    val sl = seed.cast("long")
    val rowLen = wl + 1L
    val lenF = hl * rowLen
    // off-raster neighbours (x or y < 0) predict as 0, per the PNG spec
    def pix(x: Column, y: Column): Column =
      when(x < 0L || y < 0L, lit(0L)).otherwise(pixelFormula(x, y, sl))
    // filtered byte at stream position pos
    val f = transform(sequence(lit(0L), lenF - 1L), { pos =>
      val y = idiv(pos, rowLen)
      val k = pos % rowLen
      val x = k - 1L
      val ft = y % 5L
      val cur = pix(x, y)
      val left = pix(x - 1L, y)
      val up = pix(x, y - 1L)
      val ul = pix(x - 1L, y - 1L)
      val p = left + up - ul
      val pa = abs(p - left); val pb = abs(p - up); val pc = abs(p - ul)
      val paethPred = when(pa <= pb && pa <= pc, left)
        .when(pb <= pc, up).otherwise(ul)
      when(k === 0L, ft) // leading filter-type byte of each scanline
        .otherwise(
          when(ft === 0L, cur)
            .when(ft === 1L, pmod(cur - left, lit(256L)))
            .when(ft === 2L, pmod(cur - up, lit(256L)))
            .when(ft === 3L, pmod(cur - idiv(left + up, lit(2L)), lit(256L)))
            .otherwise(pmod(cur - paethPred, lit(256L))))
    })
    // genuine Adler-32 over the filtered stream: a = 1 + Σd (mod 65521),
    // b = n + Σ_i (n - i)·d_i with i 0-based (mod 65521) — the closed
    // form of the running b = Σ a_i. Bounded: n ≤ 65535, terms ≤ n²·255.
    val aSum = aggregate(f, lit(0L), (acc, x) => acc + x)
    val bSum = aggregate(
      zip_with(f, sequence(lit(0L), lenF - 1L), (d, i) => d * (lenF - i)),
      lit(0L), (acc, x) => acc + x)
    val adler = pmod(bSum + lenF, lit(65521L)) * 65536L +
      pmod(aSum + 1L, lit(65521L))
    val fHex = concat_ws("", transform(f, b => lpad(hex(b), 2, "0")))
    val zlibLen = lenF + 11L // 2 hdr + 5 stored-block hdr + data + 4 adler
    concat(
      lit("89504E470D0A1A0A"), //                                 signature
      lit("0000000D" + "49484452"), be32h(wl), be32h(hl), //           IHDR
      lit("0800000000"), //    bit depth 8, color type 0 (gray), no interlace
      lit("00000000"), //                            IHDR CRC (decoder-lenient)
      be32h(zlibLen), lit("49444154"), //                    IDAT len + type
      lit("7801" + "01"), le16h(lenF), le16h(lit(65535L) - lenF), //   zlib +
      fHex, be32h(adler), //                  stored block + real Adler-32
      lit("00000000"), //                                          IDAT CRC
      lit("00000000" + "49454E44" + "AE426082")) //                    IEND
  }

  /** A COMPLETE valid GIF89a carrying the [[pixelFormula]] raster as
    * REAL LZW-compressed pixel data. The palette is the 256-entry gray
    * ramp (entry i = (i,i,i), so decoded BT.601 luma == the palette
    * index == the formula value), and the code stream interleaves a
    * CLEAR before every literal — [CLEAR, p₀, CLEAR, p₁, …, EOI] — the
    * one LZW stream a column expression can emit: the dictionary never
    * grows past its base, so every code is exactly 9 bits and byte i of
    * the LSB-first packing closes over at most two codes
    * (`(c(⌊8i/9⌋) >> 8i mod 9 | c(⌊8i/9⌋+1) << 9−8i mod 9) & 255`).
    * A DECODER cannot shortcut it: each literal still round-trips the
    * full variable-width machinery (reset → literal → reset), and the
    * spec separately covers growing-table streams via an independent
    * javax.imageio encoder. Data rides proper ≤255-byte sub-blocks;
    * image descriptor at (0,0), no local table, non-interlaced. */
  def gifPixelHex(w: Column, h: Column, seed: Column): Column = {
    val wl = w.cast("long"); val hl = h.cast("long")
    concat(
      lit("474946383961"), le16h(wl), le16h(hl), //   GIF89a + screen w/h
      lit("F70000"), //   GCT present, 256 entries, bg 0, no aspect ratio
      lit(gifGrayGctHex), //                              gray-ramp table
      gifFrameHex(wl, hl, seed.cast("long")), //  one full-canvas frame
      lit("3B")) //                                               trailer
  }

  /** 256-entry gray global color table (entry i = (i,i,i)): constant,
    * a driver literal shared by the single-frame and animated GIF
    * fixtures. */
  private val gifGrayGctHex: String =
    (0 until 256).map(i => f"$i%02X" * 3).mkString

  /** Evaluate `x` ONCE and reference it as a bound lambda variable
    * inside `f` — Spark's interpreted higher-order functions re-evaluate
    * lambda-CAPTURED child expressions per element (the ops/NearDup
    * hazard), but a lambda PARAMETER is a materialized value, so
    * element_at/substr reads on it are O(1). `array(x)` evaluates x
    * exactly once; the single-element transform applies f to it. */
  private def bindOnce(x: Column)(f: Column => Column): Column =
    element_at(transform(array(x), f), 1)

  /** One image-descriptor block (descriptor at (0,0), no local table,
    * non-interlaced) whose LZW data encodes [[pixelFormula]] at `seed`
    * via the clear-per-pixel stream — the per-frame unit behind
    * [[gifPixelHex]] and [[gifAnimHex]]. Staged through [[bindOnce]]:
    * the code stream materializes once as an array, the packed hex
    * once as a string — without the binding, every packed byte
    * re-evaluated two full code-expression trees and every sub-block
    * re-built the whole hex string (measured 30×+ on the gates). */
  private def gifFrameHex(wl: Column, hl: Column, sl: Column): Column = {
    def idiv(a: Column, b: Column): Column = floor(a / b).cast("long")
    val n = wl * hl
    val m = n * 2L + 1L // total codes: n CLEARs + n literals + EOI
    def pow2(e: Column): Column = // e in 0..9, column-side 2^e
      when(e === 0L, 1L).when(e === 1L, 2L).when(e === 2L, 4L)
        .when(e === 3L, 8L).when(e === 4L, 16L).when(e === 5L, 32L)
        .when(e === 6L, 64L).when(e === 7L, 128L).when(e === 8L, 256L)
        .otherwise(512L)
    val nBytes = idiv(m * 9L + 7L, lit(8L))
    // the full 9-bit code stream, zero-padded one code past EOI so the
    // byte packer's j0+1 lookup never runs off the end
    val codesArr = transform(sequence(lit(0L), m), { j =>
      val pi = idiv(j - 1L, lit(2L))
      when(j >= m, lit(0L)) //               zero-pad past the final code
        .when(j === m - 1L, lit(257L)) //                             EOI
        .when(j % 2L === 0L, lit(256L)) //                          CLEAR
        .otherwise(pixelFormula(pi % wl, idiv(pi, wl), sl))
    })
    bindOnce(codesArr) { codes =>
      val fHexE = concat_ws("",
        transform(sequence(lit(0L), nBytes - 1L), { i =>
          val t0 = i * 8L
          val j0 = idiv(t0, lit(9L))
          val off = t0 % 9L
          val b = pmod(
            idiv(element_at(codes, (j0 + 1L).cast("int")), pow2(off)) +
              element_at(codes, (j0 + 2L).cast("int")) * pow2(lit(9L) - off),
            lit(256L))
          lpad(hex(b), 2, "0")
        }))
      bindOnce(fHexE) { fHex =>
        val nb = idiv(nBytes + 254L, lit(255L))
        val framed = concat_ws("",
          transform(sequence(lit(0L), nb - 1L), { k =>
            val sz = least(lit(255L), nBytes - k * 255L)
            concat(lpad(hex(sz), 2, "0"), fHex.substr(k * 510L + 1L, sz * 2L))
          }))
        concat(
          lit("2C" + "0000" + "0000"), le16h(wl), le16h(hl), // frame at 0,0
          lit("00"), //                      no local table, no interlace
          lit("08"), //                                 LZW min code size
          framed, lit("00")) //              data sub-blocks + terminator
      }
    }
  }

  // ---- Kernel twins of the column fixture builders --------------------
  //
  // The hex-column builders above are the spec-verified contract (pure
  // column arithmetic, no driver loop), but Spark's higher-order
  // functions are interpreted — at gate scale (5000 docs × ~600 bytes)
  // they price seconds of pure harness work per query. These Scala
  // builders emit BYTE-IDENTICAL payloads (FixtureParitySpec pins
  // kernel == unhex(column) across a dims grid, multi-sub-block streams
  // included); the gates use them through one mapPartitions so the
  // timed path measures the DECODER, not fixture generation.

  /** [[pixelFormula]] in kernel form. */
  def pixelFormulaV(x: Long, y: Long, seed: Long): Int =
    (((31L * x + 47L * y + 7L * x * y + 101L * seed) % 256L + 256L) % 256L)
      .toInt

  /** Byte twin of [[pngPixelHex]]: same cycling filters, stored-block
    * zlib, real Adler-32, zeroed chunk CRCs. */
  def pngPixelBytes(w: Int, h: Int, seed: Long): Array[Byte] = {
    val rowLen = w + 1
    val lenF = h * rowLen
    require(lenF <= 65535, s"raster too large for one stored block: $lenF")
    val f = new Array[Int](lenF)
    def pix(x: Int, y: Int): Int =
      if (x < 0 || y < 0) 0 else pixelFormulaV(x, y, seed)
    var pos = 0
    while (pos < lenF) {
      val y = pos / rowLen
      val k = pos % rowLen
      val x = k - 1
      val ft = y % 5
      f(pos) =
        if (k == 0) ft
        else {
          val cur = pix(x, y); val left = pix(x - 1, y)
          val up = pix(x, y - 1); val ul = pix(x - 1, y - 1)
          val p = left + up - ul
          val pa = math.abs(p - left); val pb = math.abs(p - up)
          val pc = math.abs(p - ul)
          val paeth =
            if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
          ft match {
            case 0 => cur
            case 1 => ((cur - left) % 256 + 256) % 256
            case 2 => ((cur - up) % 256 + 256) % 256
            case 3 => ((cur - (left + up) / 2) % 256 + 256) % 256
            case _ => ((cur - paeth) % 256 + 256) % 256
          }
        }
      pos += 1
    }
    var a = 1L; var b = 0L
    f.foreach { d => a = (a + d) % 65521L; b = (b + a) % 65521L }
    val adler = b * 65536L + a
    val bb = new java.io.ByteArrayOutputStream()
    def be32(v: Long): Unit = {
      bb.write(((v >> 24) & 0xff).toInt); bb.write(((v >> 16) & 0xff).toInt)
      bb.write(((v >> 8) & 0xff).toInt); bb.write((v & 0xff).toInt)
    }
    def le16(v: Int): Unit = { bb.write(v & 0xff); bb.write((v >> 8) & 0xff) }
    bb.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    be32(13); bb.write("IHDR".getBytes); be32(w.toLong); be32(h.toLong)
    bb.write(8); bb.write(0); bb.write(0); bb.write(0); bb.write(0)
    be32(0) // IHDR CRC (decoder-lenient)
    be32(lenF + 11L); bb.write("IDAT".getBytes)
    bb.write(0x78); bb.write(0x01); bb.write(0x01) // zlib + stored final
    le16(lenF); le16(65535 - lenF)
    f.foreach(bb.write)
    be32(adler); be32(0) // real Adler-32, zeroed IDAT CRC
    be32(0); bb.write("IEND".getBytes)
    bb.write(Array(0xae, 0x42, 0x60, 0x82).map(_.toByte))
    bb.toByteArray
  }

  /** Byte-real Adam7-INTERLACED PNG: [[pngPixelBytes]] with the IHDR
    * interlace method set to 1 (offset 28 of the signature+IHDR
    * layout). Structurally a complete PNG; the decoder's documented
    * posture is to REJECT interlaced streams with a NULL row, never a
    * task failure — this fixture exists to gate that path. */
  def interlacedPngBytes(w: Int, h: Int, seed: Long): Array[Byte] = {
    val b = pngPixelBytes(w, h, seed)
    b(28) = 1 // IHDR interlace: Adam7
    b
  }

  /** Byte-real PROGRESSIVE-marked JPEG: [[jpegPixelBytes]] with the
    * frame marker switched SOF0 (FFC0) -> SOF2 (FFC2). The header walk
    * reaches a genuine progressive frame header; the decoder's
    * documented posture is to reject it (NULL row, never a task
    * failure) before touching scan data. */
  def progressiveJpegBytes(w: Int, h: Int, seed: Long): Array[Byte] = {
    val b = jpegPixelBytes(w, h, seed)
    var i = 2
    var done = false
    while (i + 1 < b.length && !done) {
      if ((b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0xc0) {
        b(i + 1) = 0xc2.toByte; done = true
      }
      i += 1
    }
    require(done, "fixture JPEG had no SOF0 marker to patch")
    b
  }

  private def gifFrameBytesInto(
      bb: java.io.ByteArrayOutputStream, w: Int, h: Int, seed: Long): Unit = {
    def le16(v: Int): Unit = { bb.write(v & 0xff); bb.write((v >> 8) & 0xff) }
    bb.write(0x2c); le16(0); le16(0); le16(w); le16(h); bb.write(0)
    bb.write(8) // LZW min code size
    val n = w * h
    val m = 2 * n + 1
    val nBytes = (m * 9 + 7) / 8
    val data = new Array[Byte](nBytes)
    var j = 0
    var t = 0
    while (j < m) {
      val code =
        if (j == m - 1) 257
        else if (j % 2 == 0) 256
        else {
          val pi = (j - 1) / 2
          pixelFormulaV(pi % w, pi / w, seed)
        }
      var k = 0
      while (k < 9) {
        if (((code >> k) & 1) != 0)
          data(t >> 3) = (data(t >> 3) | (1 << (t & 7))).toByte
        t += 1; k += 1
      }
      j += 1
    }
    var off = 0
    while (off < nBytes) {
      val sz = math.min(255, nBytes - off)
      bb.write(sz); bb.write(data, off, sz); off += sz
    }
    bb.write(0)
  }

  private def gifHeaderInto(
      bb: java.io.ByteArrayOutputStream, w: Int, h: Int): Unit = {
    def le16(v: Int): Unit = { bb.write(v & 0xff); bb.write((v >> 8) & 0xff) }
    bb.write("GIF89a".getBytes); le16(w); le16(h)
    bb.write(0xf7); bb.write(0); bb.write(0)
    var i = 0
    while (i < 256) { bb.write(i); bb.write(i); bb.write(i); i += 1 }
  }

  /** Byte twin of [[gifPixelHex]]. */
  def gifPixelBytes(w: Int, h: Int, seed: Long): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    gifHeaderInto(bb, w, h)
    gifFrameBytesInto(bb, w, h, seed)
    bb.write(0x3b)
    bb.toByteArray
  }

  /** Byte twin of [[gifAnimHex]] (GCE + frame per f, seed steps 17
    * every second frame). */
  def gifAnimBytes(w: Int, h: Int, nFrames: Int, seed: Long): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    gifHeaderInto(bb, w, h)
    var f = 0
    while (f < nFrames) {
      bb.write(Array[Byte](0x21, 0xf9.toByte, 4, 0,
        ((f + 3) & 0xff).toByte, ((f + 3) >> 8).toByte, 0, 0))
      gifFrameBytesInto(bb, w, h, seed + (f / 2).toLong * 17L)
      f += 1
    }
    bb.write(0x3b)
    bb.toByteArray
  }

  /** Byte twin of [[bmpPixelHex]]. */
  def bmpPixelBytes(w: Int, h: Int, seed: Long): Array[Byte] = {
    val rowBytes = (w + 3) / 4 * 4
    val imgSize = h * rowBytes
    val bb = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bb.write(v & 0xff); bb.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    bb.write('B'); bb.write('M'); le32(imgSize + 1078)
    le32(0); le32(1078)
    le32(40); le32(w); le32(h); le16(1); le16(8); le32(0); le32(imgSize)
    le32(0); le32(0); le32(256); le32(0)
    var i = 0
    while (i < 256) { bb.write(i); bb.write(i); bb.write(i); bb.write(0); i += 1 }
    var r = 0
    while (r < h) {
      var x = 0
      while (x < rowBytes) {
        bb.write(if (x < w) pixelFormulaV(x, h - 1 - r, seed) else 0)
        x += 1
      }
      r += 1
    }
    bb.toByteArray
  }

  /** TGA truecolor fixture: a COMPLETE Targa file (18-byte header, an
    * id field of junk bytes the decoder must skip, BGR pixel data
    * uncompressed or greedily run-length encoded, and the TGA 2.0
    * footer the engine keys its dispatch on). The three channels carry
    * THREE DIFFERENT formulas so a BGR/RGB swap cannot cancel in the
    * luma; `rle` quantizes x by 3 so horizontal runs actually exist
    * (same trick as the QOI fixture); `topDown` toggles descriptor
    * bit 5 vs bottom-up row storage. */
  def tgaPixelBytes(
      w: Int, h: Int, seed: Long, rle: Boolean, topDown: Boolean): Array[Byte] = {
    def chB(x: Long, y: Long): Int = pixelFormulaV(x, y, seed)
    def chG(x: Long, y: Long): Int =
      (((53L * x + 29L * y + 11L * x * y + 97L * seed) % 256L + 256L) % 256L).toInt
    def chR(x: Long, y: Long): Int =
      (((17L * x + 71L * y + 3L * x * y + 59L * seed) % 256L + 256L) % 256L).toInt
    val bb = new java.io.ByteArrayOutputStream()
    val idLen = (seed % 5).toInt
    bb.write(idLen); bb.write(0); bb.write(if (rle) 10 else 2)
    (0 until 5).foreach(_ => bb.write(0)) //         color-map spec: none
    bb.write(0); bb.write(0); bb.write(0); bb.write(0) //       x/y origin
    bb.write(w & 0xff); bb.write((w >> 8) & 0xff)
    bb.write(h & 0xff); bb.write((h >> 8) & 0xff)
    bb.write(24); bb.write(if (topDown) 0x20 else 0x00)
    (0 until idLen).foreach(i => bb.write(0x55 + i))
    // pixels in file order: file row r is image row r (top-down) or
    // h-1-r (bottom-up)
    val px = new Array[(Int, Int, Int)](w * h)
    var r = 0
    while (r < h) {
      val y = if (topDown) r else h - 1 - r
      var x = 0
      while (x < w) {
        val xq = if (rle) x / 3 else x
        px(r * w + x) = (chB(xq, y), chG(xq, y), chR(xq, y))
        x += 1
      }
      r += 1
    }
    if (!rle) px.foreach { case (bl, g, rr) =>
      bb.write(bl); bb.write(g); bb.write(rr)
    }
    else {
      var i = 0
      while (i < px.length) {
        var run = 1
        while (i + run < px.length && run < 128 && px(i + run) == px(i))
          run += 1
        if (run >= 2) {
          bb.write(0x80 | (run - 1))
          val (bl, g, rr) = px(i); bb.write(bl); bb.write(g); bb.write(rr)
          i += run
        } else {
          // raw packet: literals up to the next run of >= 2 (max 128)
          var lit = 1
          while (i + lit < px.length && lit < 128 &&
            !(i + lit + 1 < px.length && px(i + lit + 1) == px(i + lit)))
            lit += 1
          bb.write(lit - 1)
          var k = 0
          while (k < lit) {
            val (bl, g, rr) = px(i + k)
            bb.write(bl); bb.write(g); bb.write(rr)
            k += 1
          }
          i += lit
        }
      }
    }
    // TGA 2.0 footer: no extension/developer areas, the literal tag
    (0 until 8).foreach(_ => bb.write(0))
    "TRUEVISION-XFILE.".getBytes("US-ASCII").foreach(bb.write(_))
    bb.write(0)
    bb.toByteArray
  }

  /** PCX version-5 8-bpp fixture: index raster from the x-quantized
    * formula (so RLE runs exist), even `bytesPerLine` padding, greedy
    * per-scanline RLE (runs ≤ 63; literals ≥ 0xC0 forced into runs of
    * 1), and a trailing 0x0C-marked VGA palette whose three channels
    * carry DIFFERENT formulas so a channel-order bug cannot cancel.
    * Nonzero window origin exercises the xmin/ymin subtraction. */
  def pcxPixelBytes(w: Int, h: Int, seed: Long): Array[Byte] = {
    def idxAt(x: Long, y: Long): Int =
      (((13L * (x / 3) + 29L * y + 7L * (x / 3) * y + seed) % 256L + 256L)
        % 256L).toInt
    val bpl = w + (w & 1)
    val xmin = (seed % 3).toInt; val ymin = (seed % 2).toInt
    val bb = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bb.write(v & 0xff); bb.write((v >> 8) & 0xff) }
    bb.write(0x0a); bb.write(5); bb.write(1); bb.write(8)
    le16(xmin); le16(ymin); le16(xmin + w - 1); le16(ymin + h - 1)
    le16(72); le16(72) //                                        dpi
    (0 until 48).foreach(_ => bb.write(0)) //            EGA palette
    bb.write(0) //                                          reserved
    bb.write(1) //                                          nPlanes
    le16(bpl)
    le16(1) //                                     paletteInfo: color
    (0 until 58).foreach(_ => bb.write(0)) //        header pad to 128
    val row = new Array[Int](bpl)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { row(x) = idxAt(x, y); x += 1 }
      while (x < bpl) { row(x) = 0; x += 1 } //        even-pad column
      var i = 0
      while (i < bpl) {
        var run = 1
        while (i + run < bpl && run < 63 && row(i + run) == row(i)) run += 1
        if (run >= 2 || row(i) >= 0xc0) {
          bb.write(0xc0 | run); bb.write(row(i)); i += run
        } else { bb.write(row(i)); i += 1 }
      }
      y += 1
    }
    bb.write(0x0c)
    var ci = 0
    while (ci < 256) {
      bb.write(((37 * ci + 11 * seed) % 256).toInt)
      bb.write(((23 * ci + 5 * seed) % 256).toInt)
      bb.write(((53 * ci + 3 * seed) % 256).toInt)
      ci += 1
    }
    bb.toByteArray
  }

  /** ID3v2 fixture: v2.3 for even ids (plain BE32 frame sizes), v2.4
    * for odd (synchsafe frame sizes), four text frames from closed-form
    * strings, then non-tag trailing bytes the walk must ignore. */
  def id3Bytes(id: Long): Array[Byte] = {
    val ver = if (id % 2 == 0) 3 else 4
    val title = s"Title ${id % 100}"
    val artist = s"Artist ${id % 10}"
    val album = s"Album ${id % 7}"
    val track = s"${id % 20 + 1}"
    val frames = Seq("TIT2" -> title, "TPE1" -> artist,
      "TALB" -> album, "TRCK" -> track)
    val bb = new java.io.ByteArrayOutputStream()
    def ss(v: Int): Unit = {
      bb.write((v >> 21) & 0x7f); bb.write((v >> 14) & 0x7f)
      bb.write((v >> 7) & 0x7f); bb.write(v & 0x7f)
    }
    def be32(v: Int): Unit = {
      bb.write((v >> 24) & 0xff); bb.write((v >> 16) & 0xff)
      bb.write((v >> 8) & 0xff); bb.write(v & 0xff)
    }
    val tagSize = frames.map(f => 10 + 1 + f._2.length).sum
    bb.write('I'); bb.write('D'); bb.write('3')
    bb.write(ver); bb.write(0); bb.write(0)
    ss(tagSize)
    frames.foreach { case (fid, txt) =>
      fid.getBytes("US-ASCII").foreach(bb.write(_))
      if (ver == 4) ss(1 + txt.length) else be32(1 + txt.length)
      bb.write(0); bb.write(0)
      bb.write(0) //                      encoding 0 = ISO-8859-1
      txt.getBytes("ISO-8859-1").foreach(bb.write(_))
    }
    "AUDIOFOLLOWS".getBytes("US-ASCII").foreach(bb.write(_))
    bb.toByteArray
  }

  /** AIFF fixture: FORM/AIFF walk with an odd-sized ANNO chunk (pad
    * byte exercised), COMM carrying the rate as a real 80-bit extended
    * float, SSND with PCM16 BE samples from the shared byte formula. */
  def aiffBytes(id: Long): Array[Byte] = {
    val ch = (id % 2 + 1).toInt
    val rate = Seq(8000L, 11025L, 22050L, 44100L)((id % 4).toInt)
    val frames = (id % 40 + 20).toInt
    val n = frames * ch
    val bb = new java.io.ByteArrayOutputStream()
    def be16(v: Int): Unit = { bb.write((v >> 8) & 0xff); bb.write(v & 0xff) }
    def be32(v: Long): Unit = {
      bb.write(((v >> 24) & 0xff).toInt); bb.write(((v >> 16) & 0xff).toInt)
      bb.write(((v >> 8) & 0xff).toInt); bb.write((v & 0xff).toInt)
    }
    def tag(t: String): Unit = t.getBytes("US-ASCII").foreach(bb.write(_))
    val annoLen = (id % 3).toInt * 2 + 1 //              always odd
    val commLen = 18
    val ssndLen = 8 + 2 * n
    val formLen = 4 + (8 + annoLen + 1) + (8 + commLen) + (8 + ssndLen)
    tag("FORM"); be32(formLen.toLong); tag("AIFF")
    tag("ANNO"); be32(annoLen.toLong)
    (0 until annoLen).foreach(i => bb.write('a' + (i % 3)))
    bb.write(0) //                             odd-size pad byte
    tag("COMM"); be32(commLen.toLong)
    be16(ch); be32(frames.toLong); be16(16)
    // 80-bit extended: normalize rate into a top-bit-set mantissa
    val bl = 64 - java.lang.Long.numberOfLeadingZeros(rate)
    val k = 63 - (bl - 1)
    val mant = rate << k
    val exp = 16383 + 63 - k
    be16(exp)
    (7 to 0 by -1).foreach(i => bb.write(((mant >>> (8 * i)) & 0xffL).toInt))
    tag("SSND"); be32(ssndLen.toLong); be32(0L); be32(0L)
    var i = 0
    while (i < n) {
      val raw = ((7L * i + 13L * id + i.toLong * i) % 65536L).toInt
      bb.write((raw >> 8) & 0xff); bb.write(raw & 0xff)
      i += 1
    }
    bb.toByteArray
  }

  /** Sun AU (.au/.snd) fixture: big-endian header (magic, data offset
    * with optional annotation padding the decoder must skip, size —
    * exact or the spec's 0xffffffff "unknown" — encoding, rate,
    * channels) followed by sample data in the chosen encoding, all from
    * the shared byte formula. */
  def auBytes(id: Long): Array[Byte] = {
    val enc = (id % 3 + 1).toInt //      1 mu-law, 2 linear-8, 3 linear-16
    val pad = (id % 2).toInt * 4
    val nSamp = (id % 50 + 20).toInt
    val dataLen = if (enc == 3) nSamp * 2 else nSamp
    val bb = new java.io.ByteArrayOutputStream()
    def be32(v: Long): Unit = {
      bb.write(((v >> 24) & 0xff).toInt); bb.write(((v >> 16) & 0xff).toInt)
      bb.write(((v >> 8) & 0xff).toInt); bb.write((v & 0xff).toInt)
    }
    bb.write('.'); bb.write('s'); bb.write('n'); bb.write('d')
    be32(24L + pad)
    be32(if (id % 5 == 0) 0xffffffffL else dataLen.toLong)
    be32(enc.toLong); be32(8000L); be32(1L)
    (0 until pad).foreach(_ => bb.write(0))
    var i = 0
    while (i < nSamp) {
      val hi = ((7L * i + 13L * id + i.toLong * i) % 256L).toInt
      bb.write(hi)
      if (enc == 3) bb.write(((11L * i + 17L * id) % 256L).toInt)
      i += 1
    }
    bb.toByteArray
  }

  /** Dual-tone keypad fixture: raw PCM16LE samples of the SUM of two
    * square waves whose periods come from a 4x4 keypad table (rows =
    * low group, columns = high group, digit = id mod 16) — the
    * DTMF-shaped signal with every quantity an exact integer, so the
    * oracle regenerates the identical samples closed-form. */
  def toneBytes(id: Long, lowPeriods: Array[Int], highPeriods: Array[Int]): Array[Byte] = {
    val digit = (id % 16).toInt
    val pl = lowPeriods(digit / 4)
    val ph = highPeriods(digit % 4)
    val n = 200 + (id % 7).toInt * 40
    val bb = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < n) {
      val s = (if (i % pl < pl / 2) 100 else -100) +
        (if (i % ph < ph / 2) 100 else -100)
      bb.write(s & 0xff); bb.write((s >> 8) & 0xff)
      i += 1
    }
    bb.toByteArray
  }

  /** Stereo PCM16 WAV fixture: left channel and right channel carry
    * DIFFERENT closed-form sawtooths (a channel swap or mono misread
    * cannot cancel), interleaved [L, R] frames. */
  def stereoWavBytes(samples: Int, seed: Long): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bb.write(v & 0xff); bb.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = {
      le16((v & 0xffff).toInt); le16(((v >> 16) & 0xffff).toInt)
    }
    val dataSize = samples * 4
    bb.write("RIFF".getBytes); le32(dataSize + 36L); bb.write("WAVE".getBytes)
    bb.write("fmt ".getBytes); le32(16L); le16(1); le16(2)
    le32(8000L); le32(8000L * 4); le16(4); le16(16)
    bb.write("data".getBytes); le32(dataSize.toLong)
    var j = 0
    while (j < samples) {
      val l = (((j.toLong * 2477L + seed) % 4096L) - 2048L).toInt
      val r = (((j.toLong * 1931L + 7L * seed) % 4096L) - 2048L).toInt
      le16(l & 0xffff); le16(r & 0xffff)
      j += 1
    }
    bb.toByteArray
  }

  /** A COMPLETE two-image ICO: image 0 a real PNG ([[pngPixelBytes]]),
    * image 1 the ICO-style HEADERLESS BMP (doubled-height
    * BITMAPINFOHEADER, gray palette so luma == formula index, bottom-up
    * XOR rows, zeroed 1-bpp AND mask at 32-bit row padding). */
  def icoBytes(wp: Int, hp: Int, sp: Long,
      wb: Int, hb: Int, sb: Long): Array[Byte] = {
    val png = pngPixelBytes(wp, hp, sp)
    val bb = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bb.write(v & 0xff); bb.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = {
      bb.write((v & 0xff).toInt); bb.write(((v >> 8) & 0xff).toInt)
      bb.write(((v >> 16) & 0xff).toInt); bb.write(((v >> 24) & 0xff).toInt)
    }
    val xorRow = (wb + 3) / 4 * 4
    val andRow = (wb + 31) / 32 * 4
    le32(40L); le32(wb.toLong); le32(2L * hb); le16(1); le16(8)
    le32(0L); le32((hb * (xorRow + andRow)).toLong)
    le32(0L); le32(0L); le32(256L); le32(0L)
    var i = 0
    while (i < 256) { bb.write(i); bb.write(i); bb.write(i); bb.write(0); i += 1 }
    var r = 0
    while (r < hb) {
      val y = hb - 1 - r
      var x = 0
      while (x < xorRow) {
        bb.write(if (x < wb) pixelFormulaV(x, y, sb) else 0)
        x += 1
      }
      r += 1
    }
    (0 until hb * andRow).foreach(_ => bb.write(0))
    val bmp = bb.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    def ole16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def ole32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    ole16(0); ole16(1); ole16(2)
    def entry(w: Int, h: Int, bpp: Int, size: Int, off: Long): Unit = {
      out.write(w & 0xff); out.write(h & 0xff); out.write(0); out.write(0)
      ole16(1); ole16(bpp); ole32(size.toLong); ole32(off)
    }
    val off0 = 6L + 32L
    entry(wp, hp, 32, png.length, off0)
    entry(wb, hb, 8, bmp.length, off0 + png.length)
    out.write(png, 0, png.length)
    out.write(bmp, 0, bmp.length)
    out.toByteArray
  }

  /** A COMPLETE Motion-JPEG AVI: RIFF/AVI tree with a real `avih`
    * header, a `strl` stream-list (vids/MJPG, BITMAPINFOHEADER), the
    * `movi` list carrying one REAL baseline-JPEG ([[jpegPixelBytes]])
    * per frame in word-aligned `00dc` chunks (frame f's raster is the
    * DC-only formula at seed+f, so per-frame stats are closed-form),
    * and a trailing `idx1` index the parser must skip cleanly. */
  def aviMjpegBytes(w: Int, h: Int, nFrames: Int, seed: Long,
      usPerFrame: Long): Array[Byte] = {
    val frames = (0 until nFrames).map(f => jpegPixelBytes(w, h, seed + f))
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val bb = new java.io.ByteArrayOutputStream()
      id.getBytes("US-ASCII").foreach(bb.write(_))
      val sz = body.length
      bb.write(sz & 0xff); bb.write((sz >> 8) & 0xff)
      bb.write((sz >> 16) & 0xff); bb.write((sz >> 24) & 0xff)
      bb.write(body, 0, body.length)
      if ((sz & 1) == 1) bb.write(0) //                  word alignment
      bb.toByteArray
    }
    def list(lt: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", lt.getBytes("US-ASCII") ++ body)
    def le32a(vs: Long*): Array[Byte] = vs.flatMap(v => Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)).toArray
    val avih = chunk("avih", le32a(usPerFrame, 0L, 0L, 0x10L,
      nFrames.toLong, 0L, 1L, (w.toLong * h * 3), w.toLong, h.toLong,
      0L, 0L, 0L, 0L))
    val strh = chunk("strh",
      "vids".getBytes("US-ASCII") ++ "MJPG".getBytes("US-ASCII") ++
        le32a(0L, 0L, 0L, 1L, 25L, 0L, nFrames.toLong,
          (w.toLong * h * 3), 0L, 0L) ++
        Array[Byte](0, 0, 0, 0, (w & 0xff).toByte, ((w >> 8) & 0xff).toByte,
          (h & 0xff).toByte, ((h >> 8) & 0xff).toByte))
    val strf = chunk("strf", le32a(40L, w.toLong, h.toLong) ++
      Array[Byte](1, 0, 24, 0) ++ "MJPG".getBytes("US-ASCII") ++
      le32a((w.toLong * h * 3), 0L, 0L, 0L, 0L))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val moviBody = frames.map(fb => chunk("00dc", fb))
      .foldLeft(Array.empty[Byte])(_ ++ _)
    val movi = list("movi", moviBody)
    // idx1: offsets relative to the 'movi' fourcc position + 4
    var off = 4L
    val idxBody = frames.map { fb =>
      val e = "00dc".getBytes("US-ASCII") ++
        le32a(0x10L, off, fb.length.toLong)
      off += 8L + fb.length + (fb.length & 1)
      e
    }.foldLeft(Array.empty[Byte])(_ ++ _)
    val idx1 = chunk("idx1", idxBody)
    val riffBody = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi ++ idx1
    chunk("RIFF", riffBody)
  }

  /** Netpbm P5 (binary graymap) fixture of the formula raster, with a
    * `#` comment INSIDE the header token stream — the part naive
    * parsers break on — and the spec's single separator byte. */
  def pgmPixelBytes(w: Int, h: Int, seed: Long): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    val header = s"P5\n# graft fixture seed=$seed\n$w # width\n $h\n255\n"
    header.getBytes("US-ASCII").foreach(bb.write(_))
    var i = 0
    while (i < w * h) { bb.write(pixelFormulaV(i % w, i / w, seed)); i += 1 }
    bb.toByteArray
  }

  /** Netpbm P6 (binary pixmap) twin: the same raster as GRAY RGB
    * triplets, so the decoder's BT.601 luma is exact. */
  def ppmPixelBytes(w: Int, h: Int, seed: Long): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    s"P6 $w $h 255\n".getBytes("US-ASCII").foreach(bb.write(_))
    var i = 0
    while (i < w * h) {
      val v = pixelFormulaV(i % w, i / w, seed)
      bb.write(v); bb.write(v); bb.write(v)
      i += 1
    }
    bb.toByteArray
  }

  /** Real greedy QOI encoding (reference encoder's op preference:
    * RUN > INDEX > DIFF > LUMA > RGB) of the GRAY raster
    * v = pixelFormulaV(x div 3, y, seed) — the div-3 quantization
    * manufactures horizontal runs so every op class appears in real
    * streams. Gray pixels make the decoder's BT.601 luma exact
    * ((77+150+29) = 256 → luma = v), so the oracle replays the formula
    * without a QOI decoder. channels=3, colorspace=0, correct BE dims,
    * 7×0x00+0x01 end marker — a conformant stream for any reader. */
  def qoiPixelBytes(w: Int, h: Int, seed: Long): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    def be32(v: Int): Unit = {
      bb.write((v >>> 24) & 0xff); bb.write((v >>> 16) & 0xff)
      bb.write((v >>> 8) & 0xff); bb.write(v & 0xff)
    }
    bb.write('q'); bb.write('o'); bb.write('i'); bb.write('f')
    be32(w); be32(h); bb.write(3); bb.write(0)
    val index = new Array[Int](64) // packed rgba, zero-initialized
    var pr = 0; var pg = 0; var pb = 0; val pa = 255
    var run = 0
    var i = 0
    val n = w * h
    while (i < n) {
      val v = pixelFormulaV((i % w) / 3, i / w, seed)
      if (v == pr && v == pg && v == pb) {
        run += 1
        if (run == 62) { bb.write(0xc0 | (run - 1)); run = 0 }
      } else {
        if (run > 0) { bb.write(0xc0 | (run - 1)); run = 0 }
        val packed = (v << 24) | (v << 16) | (v << 8) | pa
        val slot = (3 * v + 5 * v + 7 * v + 11 * pa) % 64
        if (index(slot) == packed) bb.write(slot) //        QOI_OP_INDEX
        else {
          index(slot) = packed
          // wrapped signed deltas, matching the decoder's & 0xff
          def wrap(d: Int): Int = ((d + 128) & 0xff) - 128
          val dr = wrap(v - pr); val dg = wrap(v - pg); val db = wrap(v - pb)
          if (dr >= -2 && dr <= 1 && dg >= -2 && dg <= 1 &&
            db >= -2 && db <= 1)
            bb.write(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
          else if (dg >= -32 && dg <= 31 && dr - dg >= -8 && dr - dg <= 7 &&
            db - dg >= -8 && db - dg <= 7) { //              QOI_OP_LUMA
            bb.write(0x80 | (dg + 32))
            bb.write(((dr - dg + 8) << 4) | (db - dg + 8))
          } else { //                                         QOI_OP_RGB
            bb.write(0xfe); bb.write(v); bb.write(v); bb.write(v)
          }
        }
        pr = v; pg = v; pb = v
      }
      i += 1
    }
    if (run > 0) bb.write(0xc0 | (run - 1))
    var k = 0
    while (k < 7) { bb.write(0); k += 1 }
    bb.write(1)
    bb.toByteArray
  }

  /** RIFF/WAVE IMA-ADPCM fixture (format tag 0x0011, mono, 4-bit):
    * `nBlocks` independent blocks of `blockAlign` bytes, each seeded
    * by its 4-byte header — predictor ((7·seed + 13·k) mod 4096) −
    * 2048, index (seed + 3·k) mod 89 — followed by formula nibble
    * bytes (11·i + 17·seed + 5·k) mod 256. Conformant fmt chunk with
    * cbSize=2 and samplesPerBlock, so external readers parse it. */
  def wavAdpcmBytes(nBlocks: Int, blockAlign: Int, seed: Long): Array[Byte] = {
    require(blockAlign >= 5, s"blockAlign must be >= 5, got $blockAlign")
    val bb = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bb.write(v & 0xff); bb.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = {
      le16((v & 0xffffL).toInt); le16(((v >> 16) & 0xffffL).toInt)
    }
    val dataSize = nBlocks.toLong * blockAlign
    val samplesPerBlock = 2 * (blockAlign - 4) + 1
    bb.write("RIFF".getBytes); le32(40L + dataSize); bb.write("WAVE".getBytes)
    bb.write("fmt ".getBytes); le32(20L)
    le16(0x11); le16(1); le32(8000L)
    le32(8000L * blockAlign / samplesPerBlock) //   nominal byte rate
    le16(blockAlign); le16(4); le16(2); le16(samplesPerBlock)
    bb.write("data".getBytes); le32(dataSize)
    var k = 0
    while (k < nBlocks) {
      val pred0 = ((7L * seed + 13L * k) % 4096L - 2048L).toInt
      le16(pred0 & 0xffff)
      bb.write(((seed + 3L * k) % 89L).toInt); bb.write(0)
      var i = 0
      while (i < blockAlign - 4) {
        bb.write(((11L * i + 17L * seed + 5L * k) % 256L).toInt)
        i += 1
      }
      k += 1
    }
    bb.toByteArray
  }

  /** Kernel-built RIFF/WAVE fixture with GATED PCM: flat sample i is
    * SILENT (0) when `(i div 64) mod 3 == 0` and otherwise carries the
    * [[wavPcmHex]] sawtooth `((i·2477 + seed) mod 4096) − 2048` — every
    * third 64-sample window is silence, so a trim/VAD operator has real
    * structure to find and the oracle can replay the gating in closed
    * form. */
  def wavPcmGatedBytes(
      channels: Int, sampleRate: Long, samples: Int,
      seed: Long): Array[Byte] = {
    val total = samples * channels
    val dataSize = total * 2
    val bb = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bb.write(v & 0xff); bb.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = {
      le16((v & 0xffff).toInt); le16(((v >> 16) & 0xffff).toInt)
    }
    bb.write("RIFF".getBytes); le32(dataSize + 36L); bb.write("WAVE".getBytes)
    bb.write("fmt ".getBytes); le32(16L); le16(1); le16(channels)
    le32(sampleRate); le32(sampleRate * channels * 2); le16(channels * 2)
    le16(16)
    bb.write("data".getBytes); le32(dataSize.toLong)
    var i = 0
    while (i < total) {
      val v =
        if ((i / 64) % 3 == 0) 0
        else (((i.toLong * 2477L + seed) % 4096L) - 2048L).toInt
      le16(v & 0xffff)
      i += 1
    }
    bb.toByteArray
  }

  /** Block formula for the DC-only JPEG fixtures: block (bx,by) decodes
    * to the EXACT flat value `2·coef + 128` with Q₀₀ = 16, where
    * `coef = ((17bx + 29by + 13·bx·by + seed) mod 120) − 60` — the IDCT
    * of a DC-only block is F₀₀·Q₀₀/8, an integer here, so decode output
    * is immune to IDCT rounding conventions and the DuckDB oracle can
    * replay it in closed form while the engine must huffman-decode real
    * entropy-coded data. coef ∈ [−60, 59] keeps pixels in [8, 246]:
    * the clamp never engages. */
  def jpegBlockCoef(bx: Long, by: Long, seed: Long): Int =
    (((17L * bx + 29L * by + 13L * bx * by + seed) % 120L + 120L) % 120L)
      .toInt - 60

  /** MSB-first entropy bit packer with FF00 byte stuffing and the
    * T.81 1-bit padding rule. */
  private final class JpegBitWriter {
    private val bb = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        cur = (cur << 1) | ((code >> i) & 1)
        n += 1
        if (n == 8) {
          bb.write(cur)
          if (cur == 0xff) bb.write(0) // byte stuffing
          cur = 0; n = 0
        }
        i -= 1
      }
    }
    def flushOnes(): Unit = while (n != 0) put(1, 1)
    def drain(): Array[Byte] = { val a = bb.toByteArray; bb.reset(); a }
  }

  private def jpegDcEncode(bw: JpegBitWriter, diff: Int): Unit = {
    val t =
      if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
    bw.put(t, 4) // fixture DC table: code for category c IS c, 4 bits
    if (t > 0) bw.put(if (diff >= 0) diff else diff + (1 << t) - 1, t)
    bw.put(0, 2) // EOB (fixture AC table: single symbol 0x00, code "00")
  }

  /** Shared table/frame segments for the fixture JPEGs: DQT (id 0, all
    * 16s), SOF0, minimal DHTs — DC table 0 = categories 0..7 at length
    * 4 (code ≡ category), AC table 0 = EOB alone at length 2. */
  private def jpegHeaderInto(
      bb: java.io.ByteArrayOutputStream, w: Int, h: Int,
      comps: Seq[(Int, Int)]): Unit = { // (id, HV-packed) per component
    def be16(v: Int): Unit = { bb.write((v >> 8) & 0xff); bb.write(v & 0xff) }
    def marker(m: Int): Unit = { bb.write(0xff); bb.write(m) }
    marker(0xd8)
    marker(0xdb); be16(2 + 65); bb.write(0x00)
    var k = 0
    while (k < 64) { bb.write(16); k += 1 }
    marker(0xc0); be16(8 + 3 * comps.size); bb.write(8); be16(h); be16(w)
    bb.write(comps.size)
    comps.foreach { case (id, hv) => bb.write(id); bb.write(hv); bb.write(0) }
    marker(0xc4); be16(2 + 17 + 8 + 17 + 1)
    bb.write(0x00)
    val dcBits = Array(0, 0, 0, 8, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    dcBits.foreach(bb.write)
    var c = 0
    while (c < 8) { bb.write(c); c += 1 }
    bb.write(0x10)
    val acBits = Array(0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    acBits.foreach(bb.write)
    bb.write(0x00)
  }

  private def jpegSosInto(
      bb: java.io.ByteArrayOutputStream, compIds: Seq[Int]): Unit = {
    def be16(v: Int): Unit = { bb.write((v >> 8) & 0xff); bb.write(v & 0xff) }
    bb.write(0xff); bb.write(0xda); be16(6 + 2 * compIds.size)
    bb.write(compIds.size)
    compIds.foreach { id => bb.write(id); bb.write(0x00) }
    bb.write(0); bb.write(63); bb.write(0)
  }

  /** A COMPLETE valid grayscale baseline JPEG carrying the
    * [[jpegBlockCoef]] DC-only raster: real huffman-coded entropy data
    * (DC category + amplitude bits + EOB per block, FF00 stuffing,
    * 1-bit padding), one 8×8 block per MCU, optional restart markers
    * every `restartInterval` MCUs (DC prediction resets — a decoder
    * that does not reset mismatches every block after the first RST). */
  def jpegPixelBytes(
      w: Int, h: Int, seed: Long, restartInterval: Int = 0): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    jpegHeaderInto(bb, w, h, Seq((1, 0x11)))
    if (restartInterval > 0) {
      bb.write(0xff); bb.write(0xdd); bb.write(0); bb.write(4)
      bb.write((restartInterval >> 8) & 0xff); bb.write(restartInterval & 0xff)
    }
    jpegSosInto(bb, Seq(1))
    val mcusX = (w + 7) / 8
    val mcusY = (h + 7) / 8
    val bw = new JpegBitWriter
    var pred = 0
    var mcu = 0
    while (mcu < mcusX * mcusY) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.flushOnes()
        bb.write(bw.drain())
        bb.write(0xff); bb.write(0xd0 + ((mcu / restartInterval - 1) % 8))
        pred = 0
      }
      val coef = jpegBlockCoef(mcu % mcusX, mcu / mcusX, seed)
      jpegDcEncode(bw, coef - pred)
      pred = coef
      mcu += 1
    }
    bw.flushOnes()
    bb.write(bw.drain())
    bb.write(0xff); bb.write(0xd9)
    bb.toByteArray
  }

  /** A COMPLETE valid 4:2:0 color baseline JPEG, same DC-only luma
    * raster: each MCU interleaves FOUR Y blocks (2×2, row-major within
    * the MCU — the T.81 ordering a decoder must honor or scramble every
    * multi-MCU image) plus one Cb and one Cr block (flat 128: DC diff
    * 0). Luma output is identical in closed form to the grayscale twin,
    * so one oracle serves both; only an engine that walks the
    * interleave and crops the MCU padding can match. */
  def jpeg420PixelBytes(w: Int, h: Int, seed: Long): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    jpegHeaderInto(bb, w, h, Seq((1, 0x22), (2, 0x11), (3, 0x11)))
    jpegSosInto(bb, Seq(1, 2, 3))
    val mcusX = (w + 15) / 16
    val mcusY = (h + 15) / 16
    val bw = new JpegBitWriter
    var predY = 0
    var mcu = 0
    while (mcu < mcusX * mcusY) {
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var bv = 0
      while (bv < 2) {
        var bh = 0
        while (bh < 2) {
          val coef = jpegBlockCoef(2L * mx + bh, 2L * my + bv, seed)
          jpegDcEncode(bw, coef - predY)
          predY = coef
          bh += 1
        }
        bv += 1
      }
      jpegDcEncode(bw, 0) // Cb
      jpegDcEncode(bw, 0) // Cr
      mcu += 1
    }
    bw.flushOnes()
    bb.write(bw.drain())
    bb.write(0xff); bb.write(0xd9)
    bb.toByteArray
  }

  /** Kernel-built TIFF fixture (the EXIF container): header + IFD0 with
    * four baseline entries — ImageWidth (LONG), ImageLength (LONG),
    * Make (ASCII — inline when ≤ 4 bytes, else stored past the IFD at
    * an offset, so BOTH value paths are exercised), Orientation
    * (SHORT, left-justified inline in big-endian order per spec) —
    * next-IFD 0. `little` picks the byte order; a corpus has both. */
  def tiffBytes(little: Boolean, w: Long, h: Long, orientation: Int,
      make: String): Array[Byte] = {
    val makeBytes = make.getBytes(
      java.nio.charset.StandardCharsets.US_ASCII) :+ 0.toByte // NUL-term
    val bb = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit =
      if (little) { bb.write(v & 0xff); bb.write((v >> 8) & 0xff) }
      else { bb.write((v >> 8) & 0xff); bb.write(v & 0xff) }
    def u32(v: Long): Unit =
      if (little) {
        bb.write((v & 0xff).toInt); bb.write(((v >> 8) & 0xff).toInt)
        bb.write(((v >> 16) & 0xff).toInt); bb.write(((v >> 24) & 0xff).toInt)
      } else {
        bb.write(((v >> 24) & 0xff).toInt); bb.write(((v >> 16) & 0xff).toInt)
        bb.write(((v >> 8) & 0xff).toInt); bb.write((v & 0xff).toInt)
      }
    bb.write(if (little) 'I' else 'M'); bb.write(if (little) 'I' else 'M')
    u16(42); u32(8L)
    u16(4) // entry count
    // entries in ascending tag order (TIFF requirement)
    u16(0x0100); u16(4); u32(1L); u32(w) //                    ImageWidth
    u16(0x0101); u16(4); u32(1L); u32(h) //                   ImageLength
    u16(0x010f); u16(2); u32(makeBytes.length.toLong) //             Make
    val makeOff = 8 + 2 + 4 * 12 + 4
    if (makeBytes.length <= 4) { //      inline, left-justified, 0-padded
      bb.write(makeBytes, 0, makeBytes.length)
      var p = makeBytes.length
      while (p < 4) { bb.write(0); p += 1 }
    } else u32(makeOff.toLong)
    u16(0x0112); u16(3); u32(1L) //                           Orientation
    u16(orientation); u16(0) // SHORT inline: first 2 value bytes, 0 pad
    u32(0L) // next IFD
    if (makeBytes.length > 4) bb.write(makeBytes)
    bb.toByteArray
  }

  /** Kernel-built minimal-but-valid MP4 (ISO BMFF, ISO/IEC 14496-12):
    * ftyp (major brand isom + compat list), moov[ mvhd v0 (full
    * 100-byte payload) + one video trak[tkhd v0, 16.16 fixed dims] +
    * optionally one audio trak (0×0 dims — the real-world shape a
    * dims-reader must max over, not first-match) ], free, empty mdat. */
  def mp4Bytes(w: Int, h: Int, timescale: Long, duration: Long,
      audioTrack: Boolean): Array[Byte] = {
    def box(tp: String, payload: Array[Byte]): Array[Byte] = {
      val bb = new java.io.ByteArrayOutputStream()
      val sz = payload.length + 8
      bb.write((sz >> 24) & 0xff); bb.write((sz >> 16) & 0xff)
      bb.write((sz >> 8) & 0xff); bb.write(sz & 0xff)
      bb.write(tp.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      bb.write(payload)
      bb.toByteArray
    }
    def be32a(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val ftyp = box("ftyp",
      "isom".getBytes ++ be32a(0L) ++ "isom".getBytes ++ "mp42".getBytes)
    // identity matrix: 0x00010000, 0, 0 / 0, 0x00010000, 0 / 0, 0, 0x40000000
    val matrix = be32a(0x10000L) ++ be32a(0L) ++ be32a(0L) ++
      be32a(0L) ++ be32a(0x10000L) ++ be32a(0L) ++
      be32a(0L) ++ be32a(0L) ++ be32a(0x40000000L)
    val mvhd = box("mvhd",
      be32a(0L) ++ //                                    version 0 + flags
        be32a(3600L) ++ be32a(3600L) ++ //          creation/modification
        be32a(timescale) ++ be32a(duration) ++
        be32a(0x10000L) ++ //                                    rate 1.0
        // volume 1.0 (2) + reserved (2) + reserved (8) = 12 bytes, the
        // spec layout that lands matrix/pre_defined/next_track_ID at
        // their conformant offsets (payload is exactly 100 bytes)
        Array[Byte](1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) ++
        matrix ++
        Array.fill[Byte](24)(0) ++ //                         pre_defined
        be32a(3L)) //                                       next_track_ID
    def tkhd(trackId: Long, tw: Int, th: Int): Array[Byte] = box("tkhd",
      be32a(7L) ++ //                version 0 + flags (enabled|in movie)
        be32a(3600L) ++ be32a(3600L) ++ //          creation/modification
        be32a(trackId) ++ be32a(0L) ++ be32a(duration) ++
        Array.fill[Byte](8)(0) ++ //                             reserved
        Array[Byte](0, 0, 0, 0, 1, 0, 0, 0) ++ // layer/alt/volume/resv
        matrix ++
        be32a(tw.toLong << 16) ++ be32a(th.toLong << 16)) //  16.16 fixed
    val traks = box("trak", tkhd(1L, w, h)) ++
      (if (audioTrack) box("trak", tkhd(2L, 0, 0)) else Array.empty[Byte])
    val moov = box("moov", mvhd ++ traks)
    val free = box("free", Array.fill[Byte](4)(0))
    val mdat = box("mdat", Array.empty[Byte])
    ftyp ++ moov ++ free ++ mdat
  }

  /** Gate harness: attach a kernel-built binary fixture column to a
    * Dataset of ids — one mapPartitions, no shuffle, fixture cost
    * negligible beside the decoder under test. */
  def withFixtureBytes(df: DataFrame, idCol: String,
      build: Long => Array[Byte]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id => (id, build(id))))
      .toDF(idCol, "content")
  }

  /** A COMPLETE valid 8-bit paletted BMP (BI_RGB, BITMAPINFOHEADER)
    * carrying the [[pixelFormula]] raster: gray-ramp BGRA palette
    * (entry i = (i,i,i,0), so decoded luma == index == formula), rows
    * stored BOTTOM-UP (positive height — the decoder must reverse row
    * order; a top-down misread flips the raster and every
    * row-order-sensitive stat) with 4-byte row padding zeroed. Pure
    * column arithmetic; the uncompressed format needs no stream
    * machinery at all, which is exactly why it earns its keep as the
    * third codec: byte layout, not entropy coding, is what it proves. */
  def bmpPixelHex(w: Column, h: Column, seed: Column): Column = {
    def idiv(a: Column, b: Column): Column = floor(a / b).cast("long")
    val wl = w.cast("long"); val hl = h.cast("long")
    val sl = seed.cast("long")
    val rowBytes = idiv(wl + 3L, lit(4L)) * 4L
    val imgSize = hl * rowBytes
    val dataHex = concat_ws("", transform(sequence(lit(0L), imgSize - 1L), { i =>
      val r = idiv(i, rowBytes)
      val x = i % rowBytes
      val v = when(x >= wl, lit(0L))
        .otherwise(pixelFormula(x, hl - 1L - r, sl))
      lpad(hex(v), 2, "0")
    }))
    // 256-entry gray BGRA palette: constant, a driver literal
    val palHex = (0 until 256).map(i => f"$i%02X" * 3 + "00").mkString
    concat(
      lit("424D"), le32h(imgSize + 1078L), //       "BM" + file size
      lit("00000000"), le32h(lit(1078L)), //   reserved + data offset
      lit("28000000"), le32h(wl), le32h(hl), //  DIB 40, w, h bottom-up
      lit("0100" + "0800"), lit("00000000"), //  planes 1, 8 bpp, BI_RGB
      le32h(imgSize), lit("00000000" + "00000000"), //  size, ppm x/y
      le32h(lit(256L)), le32h(lit(0L)), //   colors used / important
      lit(palHex), dataHex)
  }

  /** An ANIMATED GIF89a: `nFrames` full-canvas frames, frame f carrying
    * the [[pixelFormula]] raster at seed `seed + 17·(f div 2)` — frames
    * come in identical PAIRS separated by cuts, so a scene-change
    * detector must report BOTH holds (hamming 0) and cuts (large
    * hamming), and the oracle can replay any frame in closed form.
    * Each frame is preceded by a graphic-control extension (delay 5 cs,
    * no disposal/transparency) — the extension is there so a frame
    * walker that cannot skip extension blocks between descriptors fails
    * loudly. Same gray-ramp GCT and clear-per-pixel LZW streams as
    * [[gifPixelHex]]. */
  def gifAnimHex(
      w: Column, h: Column, nFrames: Column, seed: Column): Column = {
    val wl = w.cast("long"); val hl = h.cast("long")
    val sl = seed.cast("long")
    val frames = concat_ws("",
      transform(sequence(lit(0L), nFrames.cast("long") - 1L), { f =>
        concat(
          // GCE: size 4, packed 0, per-frame delay 3+f centiseconds
          // (varying, so a duration op cannot shortcut), no transparency
          lit("21F90400"), le16h(f + 3L), lit("0000"),
          gifFrameHex(wl, hl, sl + floor(f / 2L).cast("long") * 17L))
      }))
    concat(
      lit("474946383961"), le16h(wl), le16h(hl), //   GIF89a + screen w/h
      lit("F70000"), lit(gifGrayGctHex), //        GCT header + gray ramp
      frames, lit("3B"))
  }
}
