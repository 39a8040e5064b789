package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal.MediaRecord
import graft.multimodal.ByteIO._

/** One exact per-window PCM energy row. */
final case class AudioWindow(
    id: Long, win: Long, n_samples: Long, sum_sq: Long)

/** One exact per-window PCM envelope/crossing row. */
final case class AudioZcrWindow(
    id: Long, win: Long, n_samples: Long, zc_count: Long,
    peak_abs: Long, sum_abs: Long)

/** One μ-law row: exact integer stats over the decoded linear PCM. */
final case class MulawRow(
    id: Long, n_samples: Option[Long], sum_abs: Option[Long],
    peak_abs: Option[Long], energy: Option[Long])

/** One Sun AU row: container header fields plus exact integer stats
  * over the decoded linear PCM. */
final case class AuRow(
    id: Long, encoding: Option[Long], sample_rate: Option[Long],
    channels: Option[Long], n_samples: Option[Long],
    sum_abs: Option[Long], peak_abs: Option[Long], energy: Option[Long])

/** One AIFF row: container fields (channel count, the 80-bit extended
  * sample rate decoded to an integer, declared frame count) plus
  * exact integer stats over the 16-bit big-endian PCM. */
final case class AiffRow(
    id: Long, channels: Option[Long], sample_rate: Option[Long],
    n_frames_declared: Option[Long], n_samples: Option[Long],
    sum_abs: Option[Long], peak_abs: Option[Long], energy: Option[Long])

/** One ID3 row: tag header fields plus the classic text frames. */
final case class Id3Row(
    id: Long, version: Option[Long], tag_size: Option[Long],
    title: Option[String], artist: Option[String], album: Option[String],
    track: Option[Long])

/** One dual-tone detection row: the winning low/high periods, the
  * decoded keypad digit, and the quadrature scores that won. */
final case class ToneRow(
    id: Long, n_samples: Option[Long], low_period: Option[Long],
    high_period: Option[Long], digit: Option[Long],
    score_low: Option[Long], score_high: Option[Long])

/** One stereo WAV row: per-channel exact integer stats plus the
  * cross-channel product sum. */
final case class StereoWavRow(
    id: Long, n_frames: Option[Long], sample_rate: Option[Long],
    l_sum_abs: Option[Long], l_energy: Option[Long],
    r_sum_abs: Option[Long], r_energy: Option[Long],
    cross: Option[Long])

/** One IMA ADPCM row: exact integer stats over the decoded PCM plus
  * the decoder's final (predictor, index) state — the state pair
  * pins the WHOLE sequential walk, not just its aggregates. */
final case class AdpcmRow(
    id: Long, n_samples: Option[Long], sum_abs: Option[Long],
    peak_abs: Option[Long], energy: Option[Long],
    final_pred: Option[Long], final_index: Option[Long])

/** One WAV-ADPCM row: stats plus block count and the final
  * predictor — the block-seeded walk's end state. */
final case class AdpcmWavRow(
    id: Long, n_samples: Option[Long], sum_abs: Option[Long],
    peak_abs: Option[Long], energy: Option[Long],
    n_blocks: Option[Long], final_pred: Option[Long])

/** One resample summary row; NULLs when not valid 16-bit PCM. */
final case class AudioResample(
    id: Long, n_in: Option[Long], n_out: Option[Long],
    sum_abs_out: Option[Long], resampled_fp: Option[Long])

/** One exact per-(window, bin) spectral row: the quantized-basis DFT
  * correlations re = Σv·cosq, im = Σv·sinq (EXACT BIGINTs — |re| ≤
  * window·32768·10⁴ ≈ 2·10¹³ even at full scale) and the bin power
  * re² + im² as ONE fixed-shape IEEE readout (the squares exceed
  * BIGINT at full scale, so power is the documented float surface;
  * re/im carry the exactness). */
final case class AudioSpectrumRow(
    id: Long, win: Long, n_samples: Long, bin: Int,
    re: Long, im: Long, power: Double)

/** One per-document silence-trim row: window count, voiced-window
  * count, and the first/last voiced window indices (NULL when the
  * whole payload is silent) — the crop plan for trimming lead-in /
  * tail silence before featurization. */
final case class AudioTrim(
    id: Long, n_windows: Long, n_voiced: Long,
    first_voiced: Option[Long], last_voiced: Option[Long])

/** One fixed-size image patch row: tile coordinates, the exact
  * floored mean luma (×1000), and the rolling-polynomial fingerprint
  * of the tile's pixels in row-major order. Undecodable payloads
  * surface as one (px, py) = (−1, −1) row with NULL stats. */
final case class MediaPatch(
    id: Long, px: Int, py: Int, patch_mean_q: Option[Long],
    patch_fp: Option[Long])

/** Audio codec & container surface of [[Multimodal]], split out in r11
  * (the monolith hit 4.7k lines): PCM WAV window energy/ZCR/spectrum/
  * trim/resample/stereo, G.711 mu/A-law, Sun AU, AIFF (80-bit extended
  * rates), IMA ADPCM, dual-tone detection, and ID3v2 tags. Everything
  * remains addressed as `Multimodal.xxx` — the object extends this
  * trait — and every kernel keeps the row-local batched mapPartitions
  * shape documented on each member. Row case classes are top-level
  * (an encoder cannot see through a trait's inner class). Serializable
  * because trait-defined mapPartitions lambdas capture `this` (the
  * object's module instance — stateless, so the capture is a tag, but
  * the closure cleaner must still be able to write it). */
private[graft] trait AudioCodecs extends Serializable {

  /** Shared modulus (same constant as [[Multimodal.P]] — the
    * oracle-equality contract depends on every pipeline using it). */
  private val P = graft.functions.TextHash.P

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
}
