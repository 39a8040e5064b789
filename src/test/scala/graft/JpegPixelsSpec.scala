package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{MediaFixtures, Multimodal}

/** The baseline JPEG decoder against an INDEPENDENT encoder
  * (javax.imageio's libjpeg-derived writer — its own huffman tables,
  * quantization, forward DCT, and 4:2:0 chroma subsampling for color)
  * and against the hand-built DC-only fixtures whose decode output is
  * closed-form exact. Lossy-codec discipline: both decoders decode the
  * SAME compressed bytes, so the comparison is our IDCT/huffman against
  * ImageIO's — never against the pre-compression source — with a small
  * tolerance for IDCT rounding-convention differences (gray) plus the
  * YCbCr→RGB→luma round trip (color). */
class JpegPixelsSpec extends AnyFunSuite {

  private def encode(
      img: java.awt.image.BufferedImage, quality: Float,
      progressive: Boolean = false): Array[Byte] = {
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    if (progressive)
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close()
    writer.dispose()
    baos.toByteArray
  }

  private def imageIoDecodeLuma(b: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    assert(img != null, "ImageIO failed to decode its own output")
    val w = img.getWidth
    val h = img.getHeight
    val gray = img.getRaster.getNumBands == 1
    (w, h, Array.tabulate(w * h) { i =>
      if (gray)
        // raw Y sample — getRGB on TYPE_BYTE_GRAY applies a
        // linear->sRGB gamma conversion that neither codec performs
        img.getRaster.getSample(i % w, i / w, 0)
      else {
        val rgb = img.getRGB(i % w, i / w)
        (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
          114 * (rgb & 0xff)) / 1000
      }
    })
  }

  private def diffStats(a: Array[Int], b: Array[Int]): (Int, Double) = {
    require(a.length == b.length)
    var mx = 0
    var sum = 0L
    for (i <- a.indices) {
      val d = math.abs(a(i) - b(i))
      if (d > mx) mx = d
      sum += d
    }
    (mx, sum.toDouble / a.length)
  }

  test("grayscale: ImageIO-encoded JPEGs decode within IDCT rounding " +
      "tolerance of ImageIO's own decode (odd dims, three qualities)") {
    for ((w, h) <- Seq((16, 16), (17, 13), (40, 23));
        q <- Seq(0.95f, 0.75f, 0.5f)) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w) {
        val v = 128 + (80 * StrictMath.sin(x * 0.4) *
          StrictMath.cos(y * 0.3)).toInt
        img.getRaster.setSample(x, y, 0, v)
      }
      val bytes = encode(img, q)
      val dec = Multimodal.jpegPixels(bytes)
      assert(dec.isDefined, s"gray ${w}x$h q=$q did not decode")
      val (gw, gh, got) = dec.get
      assert(gw == w && gh == h, s"dims ${gw}x$gh != ${w}x$h")
      val (_, _, want) = imageIoDecodeLuma(bytes)
      val (mx, mean) = diffStats(got, want)
      assert(mx <= 2 && mean <= 0.6,
        s"gray ${w}x$h q=$q: max diff $mx mean $mean")
    }
  }

  test("color 4:2:0: ImageIO-encoded JPEGs decode — our Y channel vs " +
      "the BT.601 luma of ImageIO's RGB round trip") {
    for ((w, h) <- Seq((32, 32), (35, 19)); q <- Seq(0.9f, 0.6f)) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w) {
        val r = 128 + (60 * StrictMath.sin(x * 0.3)).toInt
        val g = 128 + (60 * StrictMath.cos(y * 0.25)).toInt
        val bl = 128 + (50 * StrictMath.sin((x + y) * 0.2)).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | bl)
      }
      val bytes = encode(img, q)
      val dec = Multimodal.jpegPixels(bytes)
      assert(dec.isDefined, s"color ${w}x$h q=$q did not decode")
      val (gw, gh, got) = dec.get
      assert(gw == w && gh == h)
      val (_, _, want) = imageIoDecodeLuma(bytes)
      val (mx, mean) = diffStats(got, want)
      // Y vs (YCbCr->RGB->BT.601 luma): conversion round trip adds a
      // few counts on top of IDCT differences
      assert(mx <= 8 && mean <= 2.0,
        s"color ${w}x$h q=$q: max diff $mx mean $mean")
    }
  }

  private def fixtureWant(w: Int, h: Int, seed: Long): Array[Int] =
    Array.tabulate(w * h) { i =>
      2 * MediaFixtures.jpegBlockCoef(i % w / 8, i / w / 8, seed) + 128
    }

  test("DC-only grayscale fixture decodes EXACTLY to the closed form " +
      "(block crop at non-multiple-of-8 dims) and decodePixels " +
      "dispatches FFD8 bytes") {
    for ((w, h, s) <- Seq((8, 8, 0L), (13, 10, 29L), (35, 24, 96L),
        (9, 17, 61L))) {
      val bytes = MediaFixtures.jpegPixelBytes(w, h, s)
      val want = fixtureWant(w, h, s)
      assert(Multimodal.jpegPixels(bytes).exists { case (gw, gh, l) =>
        gw == w && gh == h && l.sameElements(want) }, s"${w}x$h seed $s")
      assert(Multimodal.decodePixels(bytes).exists(_._3.sameElements(want)))
    }
  }

  test("restart markers: RSTn every 2 MCUs, DC prediction resets — " +
      "exact decode across multiple restart boundaries") {
    for ((w, h, s) <- Seq((31, 18, 5L), (18, 11, 41L), (12, 10, 66L))) {
      val bytes = MediaFixtures.jpegPixelBytes(w, h, s, restartInterval = 2)
      val want = fixtureWant(w, h, s)
      assert(Multimodal.jpegPixels(bytes).exists { case (gw, gh, l) =>
        gw == w && gh == h && l.sameElements(want) },
        s"restart ${w}x$h seed $s")
    }
  }

  test("4:2:0 color fixture: MCU interleave (2x2 Y + Cb + Cr) and " +
      "16-pixel MCU crop decode exactly to the luma closed form") {
    for ((w, h, s) <- Seq((16, 16, 3L), (19, 17, 7L), (39, 28, 55L),
        (17, 16, 70L))) {
      val bytes = MediaFixtures.jpeg420PixelBytes(w, h, s)
      val want = fixtureWant(w, h, s)
      assert(Multimodal.jpegPixels(bytes).exists { case (gw, gh, l) =>
        gw == w && gh == h && l.sameElements(want) }, s"420 ${w}x$h seed $s")
    }
  }

  test("refusals: progressive (SOF2), truncation, EOI-before-SOS, and " +
      "a DHT with over-subscribed lengths all return None") {
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 16; x <- 0 until 16)
      img.getRaster.setSample(x, y, 0, (x * 16 + y) % 256)
    val prog = encode(img, 0.8f, progressive = true)
    assert(Multimodal.jpegPixels(prog).isEmpty, "progressive must refuse")
    val good = MediaFixtures.jpegPixelBytes(13, 10, 29L)
    assert(Multimodal.jpegPixels(good).isDefined)
    assert(Multimodal.jpegPixels(good.take(good.length - 4)).isEmpty,
      "entropy truncation must refuse (scan starved)")
    assert(Multimodal.jpegPixels(good.take(20)).isEmpty)
    assert(Multimodal.jpegPixels(
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xd9.toByte))
      .isEmpty, "empty SOI/EOI must refuse")
    // over-subscribed DHT: 3 codes of length 1
    val bb = new java.io.ByteArrayOutputStream()
    bb.write(Array[Byte](0xff.toByte, 0xd8.toByte))
    bb.write(Array[Byte](0xff.toByte, 0xc4.toByte, 0, 22))
    bb.write(0x00)
    bb.write(3)
    for (_ <- 0 until 15) bb.write(0)
    bb.write(1); bb.write(2); bb.write(3)
    bb.write(Array[Byte](0xff.toByte, 0xd9.toByte))
    assert(Multimodal.jpegPixels(bb.toByteArray).isEmpty)
  }
}
