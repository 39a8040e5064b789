package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{MediaFixtures, Multimodal}

/** QOI decode pinned to HAND-ASSEMBLED streams derived from the public
  * one-page spec (not to this repo's encoder — the bytes below were
  * written chunk by chunk from the spec text, so an encoder/decoder
  * bug pair cannot cancel), plus encoder op coverage, the formula
  * roundtrip, and the exploder rejection paths. */
class QoiPixelsSpec extends AnyFunSuite {

  private def header(w: Int, h: Int, ch: Int = 4): Array[Int] =
    Array('q'.toInt, 'o'.toInt, 'i'.toInt, 'f'.toInt,
      w >>> 24, (w >>> 16) & 0xff, (w >>> 8) & 0xff, w & 0xff,
      h >>> 24, (h >>> 16) & 0xff, (h >>> 8) & 0xff, h & 0xff, ch, 0)

  private val endMarker = Array(0, 0, 0, 0, 0, 0, 0, 1)

  private def bytes(xs: Array[Int]*): Array[Byte] =
    xs.flatten.map(_.toByte).toArray

  private def luma(r: Int, g: Int, b: Int): Int = (77 * r + 150 * g + 29 * b) >> 8

  test("hand-assembled RGB + DIFF + RUN + INDEX stream decodes exactly " +
    "(index slot of (10,20,30,255) is 9 per the spec's hash)") {
    // p1 RGB(10,20,30); p2 DIFF(+1,+1,+1); p3 RUN 1; p4 INDEX[9] = p1
    val img = bytes(header(4, 1),
      Array(0xfe, 10, 20, 30),
      Array(0x40 | (3 << 4) | (3 << 2) | 3),
      Array(0xc0),
      Array(0x09),
      endMarker)
    val Some((w, h, lum)) = Multimodal.qoiPixels(img)
    assert(w == 4 && h == 1)
    assert(lum.toSeq == Seq(
      luma(10, 20, 30), luma(11, 21, 31), luma(11, 21, 31), luma(10, 20, 30)))
  }

  test("hand-assembled LUMA and RGBA chunks decode per the spec's " +
    "bias/wrap arithmetic") {
    // p1 RGB(100,100,100); p2 LUMA dg=+10, dr-dg=-2, db-dg=+3
    //   -> (108, 110, 113); p3 RGBA(1,2,3,128)
    val img = bytes(header(3, 1),
      Array(0xfe, 100, 100, 100),
      Array(0x80 | (10 + 32), ((-2 + 8) << 4) | (3 + 8)),
      Array(0xff, 1, 2, 3, 128),
      endMarker)
    val Some((_, _, lum)) = Multimodal.qoiPixels(img)
    assert(lum.toSeq == Seq(100, luma(108, 110, 113), luma(1, 2, 3)))
  }

  test("DIFF wraps around the byte per the spec (0 - 2 = 254)") {
    // start pixel is (0,0,0,255); DIFF(-2,-2,-2) -> (254,254,254)
    val img = bytes(header(1, 1), Array(0x40), endMarker)
    val Some((_, _, lum)) = Multimodal.qoiPixels(img)
    assert(lum.toSeq == Seq(254))
  }

  test("rejections: truncation, bad end marker, trailing garbage, " +
    "over-long run, bomb dims, bad channels") {
    val good = bytes(header(4, 1), Array(0xfe, 10, 20, 30),
      Array(0x40 | 0x3f), Array(0xc0), Array(0x09), endMarker)
    assert(Multimodal.qoiPixels(good).isDefined)
    assert(Multimodal.qoiPixels(good.dropRight(1)).isEmpty, "truncated")
    val badEnd = good.clone(); badEnd(badEnd.length - 1) = 2
    assert(Multimodal.qoiPixels(badEnd).isEmpty, "bad marker")
    assert(Multimodal.qoiPixels(
      bytes(header(4, 1), Array(0xfe, 10, 20, 30), Array(0x40 | 0x3f),
        Array(0xc0), Array(0x09), Array(0x00), endMarker)).isEmpty,
      "trailing garbage")
    assert(Multimodal.qoiPixels(
      bytes(header(2, 1), Array(0xfd), endMarker)).isEmpty,
      "62-run into a 2-pixel image")
    assert(Multimodal.qoiPixels(
      bytes(header(20000, 20000), Array(0xc0), endMarker)).isEmpty, "bomb")
    assert(Multimodal.qoiPixels(
      bytes(header(1, 1, ch = 5), Array(0xc0), endMarker)).isEmpty,
      "bad channels")
  }

  test("Netpbm: comment-laden P5 header parses, P6 gray RGB lumas are " +
    "exact, and the strict rejections hold") {
    // hand-written P5 with comments BETWEEN every token (after maxval
    // the spec demands exactly ONE separator byte — no comment there)
    val p5 = ("P5 # magic\n# full comment line\n 3 # w\n\t2\n" +
      "# before maxval\n255\n").getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 40, 50, 60)
    val Some((w5, h5, l5)) = Multimodal.pnmPixels(p5)
    assert(w5 == 3 && h5 == 2 && l5.toSeq == Seq(10, 20, 30, 40, 50, 60))
    // P6: gray triplets give exact luma; a colored pixel uses BT.601
    val p6 = "P6 2 1 255\n".getBytes("US-ASCII") ++
      Array[Byte](9, 9, 9, 100, (200 & 0xff).toByte, 50)
    val Some((_, _, l6)) = Multimodal.pnmPixels(p6)
    assert(l6.toSeq == Seq(9, (77 * 100 + 150 * 200 + 29 * 50) >> 8))
    // rejections: truncated raster, trailing garbage, 16-bit maxval,
    // zero dims, bomb dims
    assert(Multimodal.pnmPixels(p5.dropRight(1)).isEmpty)
    assert(Multimodal.pnmPixels(p5 :+ 0.toByte).isEmpty)
    assert(Multimodal.pnmPixels(
      "P5 2 1 65535\n".getBytes("US-ASCII") ++ Array[Byte](1, 2)).isEmpty)
    assert(Multimodal.pnmPixels(
      "P5 0 4 255\n".getBytes("US-ASCII") ++ Array[Byte]()).isEmpty)
    assert(Multimodal.pnmPixels(
      "P5 99999 99999 255\n".getBytes("US-ASCII")).isEmpty)
    // fixture builders roundtrip through the dispatch
    for (seed <- 0L until 4L) {
      val Some((gw, gh, lum)) =
        Multimodal.pnmPixels(MediaFixtures.pgmPixelBytes(7, 5, seed))
      assert(gw == 7 && gh == 5)
      assert(lum.toSeq == (0 until 35).map(i =>
        MediaFixtures.pixelFormulaV(i % 7, i / 7, seed)))
      val Some((_, _, lum6)) =
        Multimodal.pnmPixels(MediaFixtures.ppmPixelBytes(7, 5, seed))
      assert(lum6.toSeq == lum.toSeq)
    }
  }

  test("fuzz: random and mutated streams never throw — they decode or " +
    "reject (the exploder posture the other codecs pin)") {
    val rnd = new scala.util.Random(42)
    // pure-random payloads behind a valid-looking header
    (0 until 300).foreach { _ =>
      val w = 1 + rnd.nextInt(16); val h = 1 + rnd.nextInt(16)
      val body = Array.fill(rnd.nextInt(80))(rnd.nextInt(256))
      val img = bytes(header(w, h), body, endMarker)
      Multimodal.qoiPixels(img) match {
        case Some((gw, gh, lum)) =>
          assert(gw == w && gh == h && lum.length == w * h)
        case None => // rejected — fine
      }
    }
    // single-byte mutations of a VALID stream
    val good = MediaFixtures.qoiPixelBytes(9, 7, seed = 3)
    (0 until good.length).foreach { i =>
      val m = good.clone()
      m(i) = (m(i) ^ 0x5a).toByte
      Multimodal.qoiPixels(m) match {
        case Some((gw, gh, lum)) => assert(lum.length == gw * gh)
        case None => // rejected
      }
    }
  }

  test("fixture encoder exercises every op class and roundtrips to the " +
    "formula raster through the real decoder") {
    // count op tags in the encoded stream of one representative fixture
    val enc = MediaFixtures.qoiPixelBytes(33, 19, seed = 5)
    var p = 14
    var nRgb = 0; var nIdx = 0; var nDiff = 0; var nLuma = 0; var nRun = 0
    while (p < enc.length - 8) {
      val b1 = enc(p) & 0xff
      if (b1 == 0xfe) { nRgb += 1; p += 4 }
      else (b1 >> 6) match {
        case 0 => nIdx += 1; p += 1
        case 1 => nDiff += 1; p += 1
        case 2 => nLuma += 1; p += 2
        case _ => nRun += 1; p += 1
      }
    }
    assert(nRgb > 0 && nIdx > 0 && nLuma > 0 && nRun > 0,
      s"ops rgb=$nRgb idx=$nIdx diff=$nDiff luma=$nLuma run=$nRun")
    // full roundtrip against the closed-form raster for several shapes
    for (seed <- 0L until 8L; (w, h) <- Seq((33, 19), (10, 7), (3, 3))) {
      val Some((gw, gh, lum)) =
        Multimodal.qoiPixels(MediaFixtures.qoiPixelBytes(w, h, seed))
      assert(gw == w && gh == h)
      var i = 0
      while (i < w * h) {
        assert(lum(i) == MediaFixtures.pixelFormulaV((i % w) / 3, i / w, seed),
          s"pixel $i of ${w}x$h seed $seed")
        i += 1
      }
    }
  }
}
