package graft

import graft.multimodal.{MediaFixtures, Multimodal}

/** PCX decode against HAND-ASSEMBLED spec-derived streams — the
  * QoiPixelsSpec discipline: the decoder is proven on bytes written
  * from the format spec, not from the repo's own encoder, so an
  * encoder/decoder bug pair cannot cancel. */
class PcxPixelsSpec extends SparkSpec {

  /** Minimal v5 header. */
  private def header(xmin: Int, ymin: Int, w: Int, h: Int, bpl: Int,
      planes: Int = 1): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bb.write(v & 0xff); bb.write((v >> 8) & 0xff) }
    bb.write(0x0a); bb.write(5); bb.write(1); bb.write(8)
    le16(xmin); le16(ymin); le16(xmin + w - 1); le16(ymin + h - 1)
    le16(72); le16(72)
    (0 until 48).foreach(_ => bb.write(0))
    bb.write(0); bb.write(planes); le16(bpl); le16(1)
    (0 until 58).foreach(_ => bb.write(0))
    bb.toByteArray
  }

  /** Identity gray palette: luma(index i) == i exactly
    * ((77+150+29)·i >> 8 = 256i >> 8). */
  private val grayPal: Array[Byte] =
    Array(0x0c.toByte) ++ (0 until 256).flatMap(i =>
      Seq(i.toByte, i.toByte, i.toByte))

  test("hand stream: runs, literals, and the >=0xC0 run-of-1 rule") {
    // row0 = [5,5,5,200]; row1 = [7,7,9,9]; 200 >= 0xC0 must be a run
    val data = Array(0xc3, 0x05, 0xc1, 0xc8, 0xc2, 0x07, 0xc2, 0x09)
      .map(_.toByte)
    val b = header(1, 1, 4, 2, 4) ++ data ++ grayPal
    val Some((w, h, lum)) = Multimodal.pcxPixels(b)
    assert((w, h) == ((4, 2)))
    assert(lum.toSeq == Seq(5, 5, 5, 200, 7, 7, 9, 9))
  }

  test("a run crossing the scanline boundary decodes (liberal posture)") {
    val b = header(0, 0, 2, 2, 2) ++ Array(0xc4, 9).map(_.toByte) ++ grayPal
    val Some((_, _, lum)) = Multimodal.pcxPixels(b)
    assert(lum.toSeq == Seq(9, 9, 9, 9))
  }

  test("even bytesPerLine padding columns are dropped") {
    // w=3, bpl=4: each row carries one pad byte (value 0xEE) that must
    // NOT surface as a pixel
    val row = Array(1, 2, 3, 0xc1, 0xee).map(_.toByte) // 3 literals + pad run
    val b = header(0, 0, 3, 1, 4) ++ row ++ grayPal
    val Some((w, h, lum)) = Multimodal.pcxPixels(b)
    assert((w, h) == ((3, 1)))
    assert(lum.toSeq == Seq(1, 2, 3))
  }

  test("palette channels are applied in R,G,B file order") {
    // palette entry 1 = (255, 0, 0): luma = 77*255 >> 8 = 76 — a G/B
    // swap would give 149 or 28 instead
    val pal = Array(0x0c.toByte) ++ (0 until 256).flatMap(i =>
      if (i == 1) Seq(255.toByte, 0.toByte, 0.toByte)
      else Seq(0.toByte, 0.toByte, 0.toByte))
    val b = header(0, 0, 1, 1, 2) ++ Array(0xc1, 1, 0xc1, 0).map(_.toByte) ++ pal
    val Some((_, _, lum)) = Multimodal.pcxPixels(b)
    assert(lum.toSeq == Seq(76))
  }

  test("rejections: trailing slack, missing palette marker, multi-plane, " +
      "truncated RLE all yield None (never a throw)") {
    val good = header(0, 0, 2, 1, 2) ++ Array(0xc2, 5).map(_.toByte) ++ grayPal
    assert(Multimodal.pcxPixels(good).isDefined)
    val slack = header(0, 0, 2, 1, 2) ++
      Array(0xc2, 5, 0x11).map(_.toByte) ++ grayPal
    assert(Multimodal.pcxPixels(slack).isEmpty, "trailing slack")
    val badMarker = good.clone()
    badMarker(good.length - 769) = 0x0b
    assert(Multimodal.pcxPixels(badMarker).isEmpty, "palette marker")
    val planes = header(0, 0, 2, 1, 2, planes = 3) ++
      Array(0xc2, 5).map(_.toByte) ++ grayPal
    assert(Multimodal.pcxPixels(planes).isEmpty, "multi-plane")
    val trunc = header(0, 0, 8, 4, 8) ++ Array(0xc2, 5).map(_.toByte) ++ grayPal
    assert(Multimodal.pcxPixels(trunc).isEmpty, "truncated RLE")
  }

  test("fixture parity: pcxPixelBytes decodes to the closed-form raster " +
      "the oracle replays, through the generic dispatch") {
    for (id <- Seq(0L, 7L, 31L, 88L)) {
      val w = (id % 19 + 7).toInt; val h = (id % 13 + 6).toInt
      val s = id % 89
      val bytes = MediaFixtures.pcxPixelBytes(w, h, s)
      val Some((dw, dh, lum)) = Multimodal.decodePixels(bytes)
      assert((dw, dh) == ((w, h)))
      for (y <- 0 until h; x <- 0 until w) {
        val q = x / 3
        val ix = (13L * q + 29L * y + 7L * q * y + s) % 256L
        val r = (37L * ix + 11L * s) % 256L
        val g = (23L * ix + 5L * s) % 256L
        val bl = (53L * ix + 3L * s) % 256L
        assert(lum(y * w + x) == ((77L * r + 150L * g + 29L * bl) >> 8).toInt,
          s"id=$id pixel ($x,$y)")
      }
    }
  }
}
