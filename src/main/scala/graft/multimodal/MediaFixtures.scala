package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  /** BI_RLE8 twin of [[bmpPixelBytes]]: the same gray-palette
    * [[pixelFormulaV]] raster, stored RUN-LENGTH ENCODED (Windows RLE8:
    * (count,value) runs, end-of-line after every row, end-of-bitmap
    * terminator) with every third file row's first three pixels in
    * ABSOLUTE mode (0x00, n, literals + word pad) so the decoder's
    * literal path and its padding rule are exercised by the gate, not
    * just by hand specs. Delta escapes stay spec-only — a skipped cell
    * decodes to palette 0, which would break raster == formula. */
  def bmpRlePixelBytes(w: Int, h: Int, seed: Long): Array[Byte] = {
    val data = new java.io.ByteArrayOutputStream()
    var r = 0
    while (r < h) { // file order: row 0 = bottom of the image
      val y = h - 1 - r
      var x = 0
      if (r % 3 == 2 && w >= 3) { // absolute-mode run of 3 + pad
        data.write(0); data.write(3)
        data.write(pixelFormulaV(0, y, seed))
        data.write(pixelFormulaV(1, y, seed))
        data.write(pixelFormulaV(2, y, seed))
        data.write(0) // word-align pad for odd literal count
        x = 3
      }
      while (x < w) { // greedy literal runs (<= 255)
        val v = pixelFormulaV(x, y, seed)
        var n = 1
        while (x + n < w && n < 255 && pixelFormulaV(x + n, y, seed) == v)
          n += 1
        data.write(n); data.write(v)
        x += n
      }
      data.write(0); data.write(0) // end of line
      r += 1
    }
    data.write(0); data.write(1) // end of bitmap
    val enc = data.toByteArray
    val bb = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bb.write(v & 0xff); bb.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    bb.write('B'); bb.write('M'); le32(enc.length + 1078)
    le32(0); le32(1078)
    le32(40); le32(w); le32(h); le16(1); le16(8); le32(1) // BI_RLE8
    le32(enc.length)
    le32(0); le32(0); le32(256); le32(0)
    var i = 0
    while (i < 256) { bb.write(i); bb.write(i); bb.write(i); bb.write(0); i += 1 }
    bb.write(enc, 0, enc.length)
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
  /** WebP container fixture: id%3==0 → lossy "VP8 " (frame tag + the
    * mandatory 9D 01 2A start code + 14-bit LE dims), id%3==1 →
    * lossless "VP8L" (0x2F signature + packed w−1/h−1 bit fields),
    * id%3==2 → a lossy stream with a CORRUPTED start code (the
    * documented rejection path). Dims mirror the PNG fixture
    * (w = id%24+9, h = id%16+8). */
  def webpBytes(id: Long): Array[Byte] = {
    val w = (id % 24 + 9).toInt
    val h = (id % 16 + 8).toInt
    val bb = new java.io.ByteArrayOutputStream()
    def le32(v: Long): Unit = {
      bb.write((v & 0xff).toInt); bb.write(((v >> 8) & 0xff).toInt)
      bb.write(((v >> 16) & 0xff).toInt); bb.write(((v >> 24) & 0xff).toInt)
    }
    def ascii(s: String): Unit = s.foreach(c => bb.write(c.toInt))
    if (id % 3 == 1) {
      ascii("RIFF"); le32(4 + 8 + 5); ascii("WEBP")
      ascii("VP8L"); le32(5)
      bb.write(0x2f)
      le32((w - 1).toLong | ((h - 1).toLong << 14))
    } else {
      ascii("RIFF"); le32(4 + 8 + 10); ascii("WEBP")
      ascii("VP8 "); le32(10)
      bb.write(0x00); bb.write(0x00); bb.write(0x00) // frame tag
      bb.write(0x9d); bb.write(0x01)
      bb.write(if (id % 3 == 2) 0x2b else 0x2a) // corrupt start code path
      bb.write(w & 0xff); bb.write((w >> 8) & 0x3f)
      bb.write(h & 0xff); bb.write((h >> 8) & 0x3f)
    }
    bb.toByteArray
  }

  /** SubRip (SRT) fixture: n = id%5+2 cues, first start id%997 ms,
    * cue i lasts 800 + 137·((id+i)%9) ms, and cue i starts 200 ms
    * BEFORE its predecessor ends when (id+i−1)%4==0 (the overlap
    * path) else 300 ms after; ids ≡ 0 (mod 7) carry one cue with
    * end < start — the documented malformed-block rejection. The
    * oracle replays the same arithmetic from doc_id without parsing. */
  def srtBytes(id: Long): Array[Byte] = {
    val n = (id % 5 + 2).toInt
    val sb = new StringBuilder
    def ts(ms: Long): String =
      f"${ms / 3600000}%02d:${ms / 60000 % 60}%02d:" +
        f"${ms / 1000 % 60}%02d,${ms % 1000}%03d"
    var s = id % 997
    (0 until n).foreach { i =>
      val dur = 800L + 137L * ((id + i) % 9)
      val e = s + dur
      sb.append(i + 1).append('\n')
      if (id % 7 == 0 && i == 1)
        sb.append(ts(e)).append(" --> ").append(ts(s)) // end before start
      else
        sb.append(ts(s)).append(" --> ").append(ts(e))
      sb.append('\n').append(s"cue $id $i").append("\n\n")
      s = e + (if ((id + i) % 4 == 0) -200L else 300L)
    }
    sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

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
