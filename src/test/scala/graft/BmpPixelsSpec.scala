package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{MediaFixtures, Multimodal}

/** The BMP decoder against INDEPENDENT encoders: javax.imageio's BMP
  * writer (24-bit BGR and 8-bit paletted, both bottom-up BI_RGB), a
  * hand-built TOP-DOWN (negative height) stream the JDK writer never
  * emits, the Spark-built [[MediaFixtures.bmpPixelHex]] fixture, and
  * malformed-input refusals. Luma expectations always derive from the
  * SOURCE raster's RGB (`getRGB`), so the writer's palette layout
  * cannot vacuously pass. */
class BmpPixelsSpec extends SparkSpec {

  import spark.implicits._

  private def lumaOf(rgb: Int): Int =
    (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
      114 * (rgb & 0xff)) / 1000

  private def toBmp(img: java.awt.image.BufferedImage): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", baos),
      "no BMP writer available")
    baos.toByteArray
  }

  private def expectLuma(img: java.awt.image.BufferedImage): Array[Int] =
    Array.tabulate(img.getWidth * img.getHeight)(i =>
      lumaOf(img.getRGB(i % img.getWidth, i / img.getWidth)))

  test("bmpPixels: ImageIO 24-bit BGR and 8-bit paletted BMPs decode " +
      "pixel-exact (row padding across widths 5..8)") {
    for (w <- 5 to 8) { // every padding residue 0..3
      val rgb = new java.awt.image.BufferedImage(
        w, 6, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until 6; x <- 0 until w)
        rgb.setRGB(x, y, ((x * 37 + y) % 256 << 16) |
          ((y * 53 + x) % 256 << 8) | (x * y * 11 % 256))
      val dec = Multimodal.bmpPixels(toBmp(rgb))
      assert(dec.exists { case (gw, gh, l) =>
        gw == w && gh == 6 && l.sameElements(expectLuma(rgb)) },
        s"24-bit width $w")
    }
    val ramp = Array.tabulate(256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
    val idx = new java.awt.image.BufferedImage(
      13, 9, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until 9; x <- 0 until 13)
      idx.getRaster.setSample(x, y, 0, (x * 19 + y * 7) % 256)
    val dec8 = Multimodal.bmpPixels(toBmp(idx))
    assert(dec8.exists { case (gw, gh, l) =>
      gw == 13 && gh == 9 && l.sameElements(expectLuma(idx)) }, "8-bit")
  }

  // hand-built 8-bit BMP, gray palette; height sign picks row order
  private def handBmp(w: Int, h: Int, topDown: Boolean,
      pix: (Int, Int) => Int): Array[Byte] = {
    val rowBytes = (w + 3) / 4 * 4
    val bb = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bb.write(v & 0xff); bb.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    bb.write('B'); bb.write('M'); le32(1078 + h * rowBytes)
    le32(0); le32(1078)
    le32(40); le32(w); le32(if (topDown) -h else h)
    le16(1); le16(8); le32(0); le32(h * rowBytes)
    le32(0); le32(0); le32(256); le32(0)
    for (i <- 0 until 256) { bb.write(i); bb.write(i); bb.write(i); bb.write(0) }
    for (r <- 0 until h; c <- 0 until rowBytes) {
      val y = if (topDown) r else h - 1 - r
      bb.write(if (c < w) pix(c, y) else 0)
    }
    bb.toByteArray
  }

  test("bmpPixels: TOP-DOWN (negative height) decodes in natural row " +
      "order, bottom-up reverses — same bytes, flipped sign, flipped " +
      "raster") {
    def v(x: Int, y: Int) = (x * 11 + y * 31) % 256
    val want = Array.tabulate(6 * 5)(i => v(i % 6, i / 6))
    assert(Multimodal.bmpPixels(handBmp(6, 5, topDown = true, v))
      .exists(_._3.sameElements(want)))
    assert(Multimodal.bmpPixels(handBmp(6, 5, topDown = false, v))
      .exists(_._3.sameElements(want)))
  }

  test("bmpPixelHex fixture: column-built BMPs decode to the closed-form " +
      "raster and decodePixels dispatches 'BM' bytes") {
    val rows = spark.range(0, 10).select(
      col("id"),
      (col("id") % 4 * 3 + 5L).as("w"), (col("id") % 3 * 2 + 4L).as("h"),
      (col("id") % 13L).as("s"))
    val got = rows.select(col("id"), col("w"), col("h"), col("s"),
        unhex(MediaFixtures.bmpPixelHex(col("w"), col("h"), col("s")))
          .as("content"))
      .collect()
    for (r <- got) {
      val w = r.getLong(1).toInt; val h = r.getLong(2).toInt
      val s = r.getLong(3)
      val bytes = r.getAs[Array[Byte]]("content")
      val want = Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        ((31L * x + 47L * y + 7L * x * y + 101L * s) % 256L).toInt
      }
      assert(Multimodal.bmpPixels(bytes).exists { case (gw, gh, l) =>
        gw == w && gh == h && l.sameElements(want) }, s"${w}x$h seed $s")
      assert(Multimodal.decodePixels(bytes).exists(_._3.sameElements(want)))
    }
  }

  test("bmpPixels: malformed inputs refuse — truncation, compressed, " +
      "unsupported depth, palette overrunning the data offset") {
    def v(x: Int, y: Int) = (x + y * 3) % 256
    val good = handBmp(8, 4, topDown = false, v)
    assert(Multimodal.bmpPixels(good).isDefined)
    assert(Multimodal.bmpPixels(good.take(good.length - 1)).isEmpty)
    assert(Multimodal.bmpPixels(good.take(40)).isEmpty)
    val rle = good.clone(); rle(30) = 1 // biCompression = BI_RLE8
    assert(Multimodal.bmpPixels(rle).isEmpty)
    val depth = good.clone(); depth(28) = 4 // 4-bit: unsupported
    assert(Multimodal.bmpPixels(depth).isEmpty)
    // dataOff 1078 (0x436) -> 54 (0x36): zero the high byte so the
    // palette (14 + 40 + 1024 bytes) overruns the pixel-data offset
    val overrun = good.clone(); overrun(11) = 0
    assert(Multimodal.bmpPixels(overrun).isEmpty)
  }
}
