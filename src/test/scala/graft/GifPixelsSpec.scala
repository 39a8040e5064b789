package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{MediaFixtures, Multimodal}

/** The GIF pixel decoder against INDEPENDENT encoders: javax.imageio's
  * GIF writer (a genuinely compressing LZW — growing dictionary, width
  * bumps, KwKwK self-references — none of which the column fixture's
  * clear-per-pixel stream exercises), a hand-built interlaced stream
  * (spec-side bit packer, independent of the MediaFixtures SQL
  * construction), the Spark-built [[MediaFixtures.gifPixelHex]] fixture
  * itself, and the malformed-input refusals. Luma expectations always
  * derive from the SOURCE raster's RGB (`getRGB`), so a palette
  * remap/quantization by the external writer cannot vacuously pass. */
class GifPixelsSpec extends SparkSpec {

  import spark.implicits._

  private def lumaOf(rgb: Int): Int =
    (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
      114 * (rgb & 0xff)) / 1000

  private def grayIndexed(w: Int, h: Int, pix: (Int, Int) => Int) = {
    val ramp = Array.tabulate(256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, pix(x, y))
    img
  }

  private def toGif(img: java.awt.image.BufferedImage): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", baos),
      "no GIF writer available")
    baos.toByteArray
  }

  private def expectLuma(img: java.awt.image.BufferedImage): Array[Int] =
    Array.tabulate(img.getWidth * img.getHeight)(i =>
      lumaOf(img.getRGB(i % img.getWidth, i / img.getWidth)))

  test("gifPixels: ImageIO-encoded GIFs (real compressing LZW — table " +
      "growth past width bumps, KwKwK runs) decode pixel-exact") {
    // long horizontal runs: the encoder builds multi-char strings and
    // the dictionary grows well past 511 (width 9 -> 10+)
    val runs = grayIndexed(64, 48, (x, y) => ((x / 7 + y / 5) * 16) % 256)
    val rDec = Multimodal.gifPixels(toGif(runs))
    assert(rDec.exists { case (w, h, l) =>
      w == 64 && h == 48 && l.sameElements(expectLuma(runs)) })
    // constant color: the canonical KwKwK stream (code == next on the
    // second emitted code and repeatedly after)
    val flat = grayIndexed(33, 21, (_, _) => 137)
    val fDec = Multimodal.gifPixels(toGif(flat))
    assert(fDec.exists { case (w, h, l) =>
      w == 33 && h == 21 && l.forall(_ == 137) })
    // high-frequency raster: mostly literals, different table shape
    val noise = grayIndexed(31, 17, (x, y) => (x * 7 + y * 11 + x * y) % 256)
    val nDec = Multimodal.gifPixels(toGif(noise))
    assert(nDec.exists { case (_, _, l) => l.sameElements(expectLuma(noise)) })
  }

  // spec-side 9-bit LSB-first packer for the clear-per-pixel stream —
  // independent of the MediaFixtures column construction
  private def packCodes(codes: Seq[Int], width: Int): Array[Byte] = {
    val bits = codes.length * width
    val out = new Array[Byte]((bits + 7) / 8)
    var t = 0
    for (c <- codes; k <- 0 until width) {
      if (((c >> k) & 1) != 0)
        out(t >> 3) = (out(t >> 3) | (1 << (t & 7))).toByte
      t += 1
    }
    out
  }

  private def handGif(w: Int, h: Int, idxRows: Seq[Array[Int]],
      interlaced: Boolean): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bb.write(v & 0xff); bb.write((v >> 8) & 0xff) }
    bb.write("GIF89a".getBytes); le16(w); le16(h)
    bb.write(0xf7); bb.write(0); bb.write(0) //       256-entry gray GCT
    for (i <- 0 until 256; _ <- 0 until 3) bb.write(i)
    bb.write(0x2c); le16(0); le16(0); le16(w); le16(h)
    bb.write(if (interlaced) 0x40 else 0x00)
    bb.write(8) //                                        min code size
    val codes = idxRows.flatten.flatMap(p => Seq(256, p)) :+ 257
    val data = packCodes(codes, 9)
    var off = 0
    while (off < data.length) {
      val n = math.min(255, data.length - off)
      bb.write(n); bb.write(data, off, n); off += n
    }
    bb.write(0); bb.write(0x3b)
    bb.toByteArray
  }

  test("gifPixels: interlaced streams de-interlace through the four-pass " +
      "schedule (rows stored 0,8..,4,12..,2,6..,1,3..)") {
    val w = 5; val h = 11
    def v(x: Int, y: Int) = (x * 13 + y * 29) % 256
    val passOrder = Seq(0, 8, 4, 2, 6, 10, 1, 3, 5, 7, 9)
    assert(passOrder.sorted == (0 until h))
    val stored = passOrder.map(y => Array.tabulate(w)(x => v(x, y)))
    val dec = Multimodal.gifPixels(handGif(w, h, stored, interlaced = true))
    assert(dec.exists { case (gw, gh, l) =>
      gw == w && gh == h &&
        l.sameElements(Array.tabulate(w * h)(i => v(i % w, i / w))) })
    // same rows non-interlaced, stored in natural order
    val natural = (0 until h).map(y => Array.tabulate(w)(x => v(x, y)))
    val dec2 = Multimodal.gifPixels(handGif(w, h, natural, interlaced = false))
    assert(dec2.exists { case (_, _, l) =>
      l.sameElements(Array.tabulate(w * h)(i => v(i % w, i / w))) })
  }

  test("gifPixelHex fixture: the column-built LZW stream decodes to the " +
      "closed-form raster, and decodePixels dispatches GIF bytes") {
    // dims up to 22x14 = 308 px -> 693 packed bytes -> the stream spans
    // three <=255-byte sub-blocks, so the framing path is exercised too
    val rows = spark.range(0, 12).select(
      col("id"),
      (col("id") % 5 * 4 + 6L).as("w"), (col("id") % 4 * 3 + 5L).as("h"),
      (col("id") % 17L).as("s"))
    val got = rows.select(col("id"), col("w"), col("h"), col("s"),
        unhex(MediaFixtures.gifPixelHex(col("w"), col("h"), col("s")))
          .as("content"))
      .collect()
    for (r <- got) {
      val w = r.getLong(1).toInt; val h = r.getLong(2).toInt
      val s = r.getLong(3)
      val bytes = r.getAs[Array[Byte]]("content")
      val dec = Multimodal.gifPixels(bytes)
      assert(dec.isDefined, s"row ${r.getLong(0)} did not decode")
      val (gw, gh, l) = dec.get
      assert(gw == w && gh == h)
      val want = Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        ((31L * x + 47L * y + 7L * x * y + 101L * s) % 256L).toInt
      }
      assert(l.sameElements(want), s"raster mismatch at ${w}x$h seed $s")
      // the dispatcher routes GIF sniff bytes to the GIF path
      assert(Multimodal.decodePixels(bytes).exists(_._3.sameElements(want)))
    }
  }

  private def handAnimGif(w: Int, h: Int,
      frames: Seq[Seq[Array[Int]]]): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bb.write(v & 0xff); bb.write((v >> 8) & 0xff) }
    bb.write("GIF89a".getBytes); le16(w); le16(h)
    bb.write(0xf7); bb.write(0); bb.write(0)
    for (i <- 0 until 256; _ <- 0 until 3) bb.write(i)
    for (idxRows <- frames) {
      // graphic-control extension between frames (the walker must skip)
      bb.write(Array[Byte](0x21, 0xf9.toByte, 4, 0, 5, 0, 0, 0))
      bb.write(0x2c); le16(0); le16(0); le16(w); le16(h); bb.write(0)
      bb.write(8)
      val data = packCodes(idxRows.flatten.flatMap(p => Seq(256, p)) :+ 257, 9)
      var off = 0
      while (off < data.length) {
        val n = math.min(255, data.length - off)
        bb.write(n); bb.write(data, off, n); off += n
      }
      bb.write(0)
    }
    bb.write(0x3b)
    bb.toByteArray
  }

  test("gifFrames: multi-frame walk decodes every frame at its index, " +
      "honors the cap, and stride sampling SKIPS undecoded frames " +
      "(a corrupt skipped frame is never touched)") {
    val w = 6; val h = 4
    def raster(s: Int) =
      (0 until h).map(y => Array.tabulate(w)(x => (x * 3 + y * 5 + s) % 256))
    def flat(s: Int): Array[Int] =
      Array.tabulate(w * h)(i => (i % w * 3 + i / w * 5 + s) % 256)
    val anim = handAnimGif(w, h, Seq(raster(0), raster(40), raster(80)))
    val all = Multimodal.gifFrames(anim, maxFrames = 8)
    assert(all.exists(fs => fs.map(_._1) == Vector(0, 1, 2) &&
      fs.zipWithIndex.forall { case ((_, gw, gh, l), i) =>
        gw == w && gh == h && l.sameElements(flat(i * 40)) }))
    // cap stops early
    assert(Multimodal.gifFrames(anim, maxFrames = 2)
      .exists(_.map(_._1) == Vector(0, 1)))
    // stride=2 keeps frames 0 and 2
    assert(Multimodal.gifFrames(anim, maxFrames = 8, stride = 2)
      .exists(fs => fs.map(_._1) == Vector(0, 2) &&
        fs(1)._4.sameElements(flat(80))))
    // corrupt the MIDDLE frame's first LZW code (CLEAR -> 300): full
    // decode refuses, stride=2 decode never reads those bits and passes
    val gctEnd = 6 + 7 + 768
    val frame0Len = 8 + 10 + 1 + {
      val codes = w * h * 2 + 1
      val bytes = (codes * 9 + 7) / 8
      bytes + (bytes + 254) / 255 + 1
    }
    val f1DataOff = gctEnd + frame0Len + 8 + 10 + 1 + 1
    val bad = anim.clone()
    bad(f1DataOff) = 0x2c.toByte; bad(f1DataOff + 1) = 0x01.toByte
    assert(Multimodal.gifFrames(bad, maxFrames = 8).isEmpty)
    assert(Multimodal.gifFrames(bad, maxFrames = 8, stride = 2)
      .exists(_.map(_._1) == Vector(0, 2)))
  }

  test("gifAnimHex fixture + frameSceneChange: holds score hamming 0, " +
      "cuts score large, first frame NULL") {
    val rows = spark.range(0, 8).select(
      col("id"),
      (col("id") % 3 * 2 + 8L).as("w"), (col("id") % 2 * 3 + 8L).as("h"),
      (col("id") % 3 + 3L).as("nf"), (col("id") % 11L).as("s"))
    val d = rows.select(col("id"), col("nf"),
      unhex(MediaFixtures.gifAnimHex(
        col("w"), col("h"), col("nf"), col("s"))).as("content"))
    val out = Multimodal.frameSceneChange(d, "id", "content", maxFrames = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        Option(r.get(6)).map(_.asInstanceOf[Long]))).sorted
    val nfOf = rows.collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out.groupBy(_._1).forall { case (id, fr) =>
      fr.length == nfOf(id).toInt })
    for ((_, f, ham) <- out) {
      if (f == 0) assert(ham.isEmpty)
      else if (f % 2 == 1) assert(ham.contains(0L), s"frame $f: hold expected")
      else assert(ham.exists(_ > 0L), s"frame $f: cut expected")
    }
    // stride=2 samples only the first frame of each scene pair: every
    // hamming is then a cut (scene boundary) — and > 0 by construction
    val strided = Multimodal
      .frameSceneChange(d, "id", "content", maxFrames = 8, stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        Option(r.get(6)).map(_.asInstanceOf[Long])))
    assert(strided.forall { case (_, f, ham) =>
      f % 2 == 0 && (f == 0 && ham.isEmpty || f > 0 && ham.exists(_ > 0L)) })
  }

  test("gifPixels: malformed inputs refuse — truncation, missing palette, " +
      "short LZW stream, out-of-range codes") {
    val img = grayIndexed(16, 12, (x, y) => (x * 5 + y) % 256)
    val good = toGif(img)
    assert(Multimodal.gifPixels(good).isDefined)
    assert(Multimodal.gifPixels(good.take(good.length / 2)).isEmpty)
    assert(Multimodal.gifPixels(good.take(good.length - 1)).isEmpty)
    // no GCT and no LCT: nothing to resolve indices through
    val noPal = handGif(4, 3, Seq.fill(3)(Array.fill(4)(7)), interlaced = false)
    noPal(10) = 0x07 //    clear the GCT flag; table bytes become garbage
    assert(Multimodal.gifPixels(noPal).isEmpty)
    // stream ends before the raster fills (drop the last sub-block tail)
    val short = handGif(8, 8, (0 until 8).map(y =>
      Array.tabulate(8)(x => (x + y) % 256)), interlaced = false)
    val cut = short.dropRight(12) //   inside the data blocks, no trailer
    assert(Multimodal.gifPixels(cut).isEmpty)
    // a code pointing past the table head is corrupt, not a crash
    val bad = handGif(2, 2,
      Seq(Array(1, 2), Array(3, 4)), interlaced = false)
    // first data sub-block starts after 6+7+768+10+1 header bytes; its
    // first code is CLEAR(256) — overwrite the packed bits so the
    // decoder reads 300 (0x12C) instead: LSB-first 9-bit code
    val dataOff = 6 + 7 + 768 + 10 + 1 + 1
    bad(dataOff) = 0x2c.toByte; bad(dataOff + 1) = 0x01.toByte
    assert(Multimodal.gifPixels(bad).isEmpty)
  }
}
