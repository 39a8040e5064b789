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
object Multimodal extends AudioCodecs {

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

  // byte readers shared with the split codec traits: ByteIO (r11)
  import ByteIO.{u8, be16, le16, be32, le32}

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
    val comp = le32(b, 30)
    // BI_RGB everywhere; BI_RLE8 (comp=1) only with 8-bpp paletted
    // data, per the format (RLE8 is defined for 8-bit only, and the
    // spec requires bottom-up storage — hRaw < 0 with RLE rejects).
    if (comp != 0L && !(comp == 1L && bpp == 8 && !topDown)) return None
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None
    if (bpp != 8 && bpp != 24) return None
    val rowBytes = ((w.toLong * bpp + 31L) / 32L) * 4L
    if (dataOff < 0) return None
    if (comp == 0L && dataOff + rowBytes * h > b.length) return None
    if (comp == 1L && dataOff + 2L > b.length) return None
    val palOff = 14 + dibSize.toInt
    val palSize =
      if (bpp != 8) 0
      else {
        val used = le32(b, 46).toInt
        val n = if (used == 0) 256 else used
        if (palOff + 4L * n > dataOff) return None // palette must fit
        n
      }
    if (comp == 1L) {
      // RLE8 stream walk (Windows BMP spec): (n>0, v) = run of n
      // copies of v; (0,0) end of line; (0,1) end of bitmap; (0,2)
      // delta dx,dy (skipped cells stay index 0); (0, n>=3) absolute
      // run of n literal bytes padded to a word boundary. Rows are
      // bottom-up; any overrun of the buffer or the raster rejects.
      val idx = new Array[Int](w * h) // file order: row 0 = bottom
      var p = dataOff.toInt
      var xf = 0
      var yf = 0
      var done = false
      while (!done) {
        if (p + 2 > b.length) return None
        val c = u8(b, p); val v = u8(b, p + 1); p += 2
        if (c > 0) {
          if (yf >= h || xf + c > w) return None
          var i = 0
          while (i < c) { idx(yf * w + xf) = v; xf += 1; i += 1 }
        } else v match {
          case 0 => yf += 1; xf = 0; if (yf > h) return None
          case 1 => done = true
          case 2 =>
            if (p + 2 > b.length) return None
            xf += u8(b, p); yf += u8(b, p + 1); p += 2
            if (xf > w || yf > h) return None
          case n =>
            if (p + n + (n & 1) > b.length) return None
            if (yf >= h || xf + n > w) return None
            var i = 0
            while (i < n) { idx(yf * w + xf) = u8(b, p + i); xf += 1; i += 1 }
            p += n + (n & 1)
        }
      }
      val lum = new Array[Int](w * h)
      var yT = 0
      while (yT < h) {
        var x = 0
        while (x < w) {
          val pi = idx((h - 1 - yT) * w + x)
          val (bb, gg, rr) =
            if (pi >= palSize) (0, 0, 0)
            else {
              val q = palOff + 4 * pi
              (u8(b, q), u8(b, q + 1), u8(b, q + 2))
            }
          lum(yT * w + x) = (299 * rr + 587 * gg + 114 * bb) / 1000
          x += 1
        }
        yT += 1
      }
      return Some((w, h, lum))
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

  /** One WebP row: container variant and the parsed frame dimensions. */
  final case class WebpRow(
      id: Long, codec: Option[String],
      width: Option[Long], height: Option[Long])

  /** WebP container dims — the NINTH image container shape: a RIFF
    * form (like WAV, but big-media): "RIFF" + le32 size + "WEBP", then
    * either a lossy "VP8 " chunk (3-byte frame tag, the mandatory
    * 0x9D 0x01 0x2A start code, then 14-bit little-endian width and
    * height — VP8 spec RFC 6386 §9.1) or a lossless "VP8L" chunk
    * (0x2F signature byte, then width−1 and height−1 as consecutive
    * 14-bit fields of a little-endian bit stream — WebP lossless
    * spec §3). Header-only parse, the [[mp4Meta]] discipline: bad
    * magic, wrong start code, or truncation → NULL row, never a task
    * failure. Row-local, no shuffle. */
  private[graft] def webpDims(b: Array[Byte]): Option[(String, Long, Long)] = {
    if (b == null || b.length < 25 || // VP8L min; the VP8 arm re-checks 30
      b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
      b(8) != 'W' || b(9) != 'E' || b(10) != 'B' || b(11) != 'P') None
    else {
      val fourcc = new String(b, 12, 4, java.nio.charset.StandardCharsets.US_ASCII)
      fourcc match {
        case "VP8 " =>
          // 3-byte frame tag at 20, start code at 23, dims at 26/28
          if (b.length < 30 || u8(b, 23) != 0x9d || u8(b, 24) != 0x01 ||
            u8(b, 25) != 0x2a) None
          else Some(("VP8",
            (le16(b, 26) & 0x3fff).toLong, (le16(b, 28) & 0x3fff).toLong))
        case "VP8L" =>
          if (b.length < 25 || u8(b, 20) != 0x2f) None
          else {
            val bits = le32(b, 21)
            Some(("VP8L",
              (bits & 0x3fff) + 1L, ((bits >> 14) & 0x3fff) + 1L))
          }
        case _ => None
      }
    }
  }

  def webpMeta(
      df: DataFrame, idCol: String, binCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { case (id, b) =>
        webpDims(b) match {
          case None => WebpRow(id, None, None, None)
          case Some((c, w, h)) => WebpRow(id, Some(c), Some(w), Some(h))
        }
      }))
      .toDF()
  }

  /** One SRT row: cue census over a SubRip subtitle payload. */
  final case class SrtRow(
      id: Long, n_cues: Option[Long], total_dur_ms: Option[Long],
      n_overlaps: Option[Long], span_ms: Option[Long],
      max_cue_ms: Option[Long])

  /** SubRip (SRT) subtitle cue census — the text-track side of a video
    * ingest pipeline (caption alignment, speech-span statistics,
    * audio/text contrastive pairs all start from the cue list): parse
    * `index / HH:MM:SS,mmm --> HH:MM:SS,mmm / text...` blocks separated
    * by blank lines and emit exact integer cue statistics — cue count,
    * Σ duration, consecutive-overlap count (cue starts before its
    * predecessor ends — the caption-collision signal), first-start to
    * last-end span, and the longest cue. Malformed blocks (bad
    * timestamp shape, non-numeric index, end before start) → NULL row,
    * never a task failure. Row-local, no shuffle. */
  def srtCues(
      df: DataFrame, idCol: String, binCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    val TsPat = """(\d{2}):(\d{2}):(\d{2}),(\d{3}) --> (\d{2}):(\d{2}):(\d{2}),(\d{3})""".r
    df.select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map { case (id, b) =>
        val bad = SrtRow(id, None, None, None, None, None)
        try {
          if (b == null || b.length == 0) bad
          else {
            val txt = new String(b, java.nio.charset.StandardCharsets.UTF_8)
            val blocks = txt.split("\n\n").map(_.trim).filter(_.nonEmpty)
            if (blocks.isEmpty) bad
            else {
              val cues = blocks.map { blk =>
                val lines = blk.split("\n")
                if (lines.length < 2 || lines(0).exists(!_.isDigit)) None
                else lines(1) match {
                  case TsPat(h1, m1, s1, ms1, h2, m2, s2, ms2) =>
                    def ms(h: String, m: String, s: String, f: String): Long =
                      ((h.toLong * 60 + m.toLong) * 60 + s.toLong) * 1000 +
                        f.toLong
                    val st = ms(h1, m1, s1, ms1)
                    val en = ms(h2, m2, s2, ms2)
                    if (en <= st) None else Some((st, en))
                  case _ => None
                }
              }
              if (cues.exists(_.isEmpty)) bad
              else {
                val cs = cues.flatten
                val overlaps = cs.sliding(2).count {
                  case Array((_, e0), (s1b, _)) => s1b < e0
                  case _ => false
                }
                SrtRow(id, Some(cs.length.toLong),
                  Some(cs.map(c => c._2 - c._1).sum),
                  Some(overlaps.toLong),
                  Some(cs.last._2 - cs.head._1),
                  Some(cs.map(c => c._2 - c._1).max))
              }
            }
          }
        } catch { case scala.util.control.NonFatal(_) => bad }
      }))
      .toDF()
  }
}

