package graft

import graft.multimodal.{MediaFixtures, Multimodal}

/** TGA decode, Sun AU container, dual-tone detection, Otsu threshold —
  * the round-10 media additions. The TGA tests decode HAND-ASSEMBLED
  * byte streams (not the fixture encoder) so an encoder/decoder bug
  * pair cannot cancel. */
class TgaAuToneSpec extends SparkSpec {

  import spark.implicits._

  private val footer: Array[Byte] =
    Array.fill[Byte](8)(0) ++
      "TRUEVISION-XFILE.".getBytes("US-ASCII") ++ Array[Byte](0)

  /** Hand-built 18-byte header; no id field. */
  private def tgaHeader(w: Int, h: Int, itype: Int, desc: Int): Array[Byte] =
    Array[Byte](0, 0, itype.toByte, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      (w & 0xff).toByte, ((w >> 8) & 0xff).toByte,
      (h & 0xff).toByte, ((h >> 8) & 0xff).toByte, 24, desc.toByte)

  private def luma(r: Int, g: Int, b: Int) = (77 * r + 150 * g + 29 * b) >> 8

  test("tgaPixels: hand-assembled 2x2 uncompressed bottom-up decodes " +
    "BGR in the right row order") {
    // image rows (top to bottom): [(R=10,G=20,B=30), (40,50,60)]
    //                             [(70,80,90), (100,110,120)]
    // bottom-up file order: bottom row first, pixels as B,G,R
    val pix = tgaHeader(2, 2, 2, 0x00) ++ Array[Byte](
      90, 80, 70, 120, 110, 100, //  bottom image row (file row 0)
      30, 20, 10, 60, 50, 40 //         top image row (file row 1)
    ) ++ footer
    val Some((w, h, lum)) = Multimodal.tgaPixels(pix)
    assert(w == 2 && h == 2)
    assert(lum.toSeq == Seq(
      luma(10, 20, 30), luma(40, 50, 60),
      luma(70, 80, 90), luma(100, 110, 120)))
  }

  test("tgaPixels: top-down descriptor bit skips the row flip, and a " +
    "BGR->RGB swap would change the luma (channels really distinct)") {
    val td = tgaHeader(2, 1, 2, 0x20) ++ Array[Byte](
      30, 20, 10, 60, 50, 40) ++ footer
    val Some((_, _, lum)) = Multimodal.tgaPixels(td)
    assert(lum.toSeq == Seq(luma(10, 20, 30), luma(40, 50, 60)))
    assert(luma(10, 20, 30) != luma(30, 20, 10),
      "channel-order test pixel must not be swap-symmetric")
  }

  test("tgaPixels: RLE run + raw packets decode to the same raster as " +
    "their uncompressed equivalent; runs may cross scanlines") {
    // 3x2 top-down: run of 4x (1,2,3) crossing the row boundary, then
    // a raw packet of 2 literal pixels
    val rle = tgaHeader(3, 2, 10, 0x20) ++ Array[Byte](
      (0x80 | 3).toByte, 3, 2, 1, //            run: 4 pixels B=3,G=2,R=1
      1, 9, 8, 7, 12, 11, 10 //          raw: 2 pixels (7,8,9),(10,11,12)
    ) ++ footer
    val flat = tgaHeader(3, 2, 2, 0x20) ++ Array[Byte](
      3, 2, 1, 3, 2, 1, 3, 2, 1,
      3, 2, 1, 9, 8, 7, 12, 11, 10) ++ footer
    val Some((rw, rh, rl)) = Multimodal.tgaPixels(rle)
    val Some((fw, fh, fl)) = Multimodal.tgaPixels(flat)
    assert((rw, rh) == ((fw, fh)) && rl.toSeq == fl.toSeq)
  }

  test("tgaPixels: exploder posture — truncated RLE, trailing slack, " +
    "missing footer, wrong depth, color-mapped all reject as None") {
    val good = tgaHeader(2, 1, 2, 0x20) ++ Array[Byte](
      30, 20, 10, 60, 50, 40) ++ footer
    assert(Multimodal.tgaPixels(good).isDefined)
    val noFooter = good.dropRight(26)
    assert(Multimodal.tgaPixels(noFooter).isEmpty)
    val truncated = tgaHeader(2, 1, 10, 0x20) ++
      Array[Byte]((0x80 | 3).toByte, 3, 2) ++ footer //    run cut short
    assert(Multimodal.tgaPixels(truncated).isEmpty)
    val slack = tgaHeader(2, 1, 2, 0x20) ++ Array[Byte](
      30, 20, 10, 60, 50, 40, 99) ++ footer //     extra byte before tail
    assert(Multimodal.tgaPixels(slack).isEmpty)
    val depth = good.clone(); depth(16) = 32
    assert(Multimodal.tgaPixels(depth).isEmpty)
    val cmap = good.clone(); cmap(1) = 1
    assert(Multimodal.tgaPixels(cmap).isEmpty)
  }

  test("tga fixture encoder round-trips through the decoder for both " +
    "image types and both row orders") {
    for (rle <- Seq(false, true); td <- Seq(false, true)) {
      val bytes = MediaFixtures.tgaPixelBytes(9, 5, 37L, rle, td)
      val Some((w, h, lum)) = Multimodal.tgaPixels(bytes)
      assert(w == 9 && h == 5)
      // spot-check pixel (2, 3) against the three channel formulas
      val x = 2L; val y = 3L; val xq = if (rle) x / 3 else x
      def m(v: Long) = (((v % 256) + 256) % 256).toInt
      val bC = m(31 * xq + 47 * y + 7 * xq * y + 101 * 37)
      val gC = m(53 * xq + 29 * y + 11 * xq * y + 97 * 37)
      val rC = m(17 * xq + 71 * y + 3 * xq * y + 59 * 37)
      assert(lum(3 * 9 + 2) == luma(rC, gC, bC),
        s"rle=$rle topDown=$td")
    }
  }

  test("auStats: all three encodings, annotation pad, and the unknown-" +
    "size sentinel decode; malformed headers surface as NULL rows") {
    val ids = Seq(0L, 1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val d = MediaFixtures.withFixtureBytes(ids, "doc_id",
      MediaFixtures.auBytes)
    val rows = Multimodal.auStats(d, "doc_id", "content").collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    for (id <- 0L to 5L) {
      val r = rows(id)
      assert(r.getAs[Long]("encoding") == id % 3 + 1)
      assert(r.getAs[Long]("sample_rate") == 8000L)
      assert(r.getAs[Long]("n_samples") == id % 50 + 20)
    }
    // driver-side replay of id=0 (mu-law, unknown-size sentinel)
    val pcm0 = (0 until 20).map { i =>
      graft.functions.NativeKernels.mulawToPcm(((7 * i + i * i) % 256))
    }
    assert(rows(0L).getAs[Long]("sum_abs") == pcm0.map(v => math.abs(v).toLong).sum)
    // id=2: 16-bit BE: hi = (7i+26+i*i)%256 signed, lo = (11i+34)%256
    val pcm2 = (0 until 22).map { i =>
      val hi = ((7 * i + 13 * 2 + i * i) % 256)
      val lo = ((11 * i + 17 * 2) % 256)
      val raw = hi * 256 + lo
      if (raw >= 32768) raw - 65536 else raw
    }
    assert(rows(2L).getAs[Long]("energy") ==
      pcm2.map(v => v.toLong * v).sum)
    // malformed: bad magic and offset beyond payload
    val bad = MediaFixtures.withFixtureBytes(Seq(7L).toDF("doc_id"),
      "doc_id", _ => "nope".getBytes)
    val nr = Multimodal.auStats(bad, "doc_id", "content").collect().head
    assert(nr.isNullAt(nr.fieldIndex("encoding")))
  }

  test("wavStereoStats de-interleaves [L, R] frames: per-channel stats " +
    "match a driver replay; a swapped fixture swaps them") {
    val wav = MediaFixtures.stereoWavBytes(50, 13L)
    val d = MediaFixtures.withFixtureBytes(Seq(0L).toDF("doc_id"),
      "doc_id", _ => wav)
    val r = Multimodal.wavStereoStats(d, "doc_id", "content")
      .collect().head
    val ls = (0 until 50).map(j => ((j.toLong * 2477 + 13) % 4096 - 2048))
    val rs = (0 until 50).map(j => ((j.toLong * 1931 + 91) % 4096 - 2048))
    assert(r.getAs[Long]("n_frames") == 50L)
    assert(r.getAs[Long]("l_sum_abs") == ls.map(math.abs).sum)
    assert(r.getAs[Long]("r_sum_abs") == rs.map(math.abs).sum)
    assert(r.getAs[Long]("cross") == ls.zip(rs).map(p => p._1 * p._2).sum)
    assert(r.getAs[Long]("l_energy") != r.getAs[Long]("r_energy"),
      "channels must be distinguishable or a swap would cancel")
    // torn data chunk (odd frame) -> NULL row
    val torn = wav.dropRight(2)
    // fix the RIFF/data sizes? no - a torn tail makes chunk sizes lie,
    // which is exactly the reject path
    val d2 = MediaFixtures.withFixtureBytes(Seq(0L).toDF("doc_id"),
      "doc_id", _ => torn)
    val nr = Multimodal.wavStereoStats(d2, "doc_id", "content")
      .collect().head
    assert(nr.isNullAt(nr.fieldIndex("n_frames")))
  }

  test("icoPixelStats: PNG and headerless-BMP payloads behind one " +
    "directory; AND-mask accounting strict; per-image quarantine") {
    val ico = MediaFixtures.icoBytes(9, 7, 11L, 13, 6, 23L)
    val d = MediaFixtures.withFixtureBytes(Seq(0L).toDF("doc_id"),
      "doc_id", _ => ico)
    val rows = Multimodal.icoPixelStats(d, "doc_id", "content").collect()
      .sortBy(_.getAs[Long]("image"))
    assert(rows.length == 2)
    assert(rows(0).getAs[Boolean]("is_png") &&
      rows(0).getAs[Int]("width") == 9 && rows(0).getAs[Int]("height") == 7)
    assert(!rows(1).getAs[Boolean]("is_png") &&
      rows(1).getAs[Int]("width") == 13 && rows(1).getAs[Int]("height") == 6)
    // BMP luma spot check: formula raster through the gray palette
    def m(v: Long) = (((v % 256) + 256) % 256)
    val want = (for (y <- 0L until 6L; x <- 0L until 13L)
      yield m(31 * x + 47 * y + 7 * x * y + 101 * 23)).sum
    assert(rows(1).getAs[Long]("luma_sum") == want)
    // truncated AND mask must reject THAT image, not the container
    val cut = ico.dropRight(2)
    val d2 = MediaFixtures.withFixtureBytes(Seq(0L).toDF("doc_id"),
      "doc_id", _ => cut)
    val r2 = Multimodal.icoPixelStats(d2, "doc_id", "content").collect()
      .sortBy(_.getAs[Long]("image"))
    assert(r2.length == 2)
    assert(!r2(0).isNullAt(r2(0).fieldIndex("luma_sum")), "png intact")
    assert(r2(1).isNullAt(r2(1).fieldIndex("luma_sum")), "bmp rejected")
    // junk container -> single NULL row
    val j = Multimodal.icoPixelStats(
      MediaFixtures.withFixtureBytes(Seq(0L).toDF("doc_id"), "doc_id",
        _ => "nope".getBytes), "doc_id", "content").collect()
    assert(j.length == 1 && j.head.isNullAt(j.head.fieldIndex("image")))
  }

  test("aviFrameStats walks the RIFF tree, decodes every 00dc JPEG, " +
    "quarantines corrupt frames, rejects junk") {
    val good = MediaFixtures.aviMjpegBytes(17, 11, 3, 7L, 40000L)
    // corrupt ONE frame's entropy data in a copy: find the 2nd SOS
    // marker and trash bytes after it
    val bad = good.clone()
    var sos = 0; var hits = 0
    for (i <- 0 until bad.length - 1
         if (bad(i) & 0xff) == 0xff && (bad(i + 1) & 0xff) == 0xd9) {
      hits += 1; if (hits == 2) sos = i
    }
    bad(sos - 3) = 0x00; bad(sos - 2) = 0x7f //       break the padding
    val d = MediaFixtures.withFixtureBytes(
      Seq(0L, 1L, 2L).toDF("doc_id"), "doc_id",
      id => if (id == 0L) good
      else if (id == 1L) bad else "not an avi".getBytes)
    val rows = Multimodal.aviFrameStats(d, "doc_id", "content").collect()
    val byId = rows.groupBy(_.getAs[Long]("id"))
    assert(byId(0L).length == 3, "three frames decoded")
    byId(0L).foreach { r =>
      assert(r.getAs[Int]("width") == 17 && r.getAs[Int]("height") == 11)
      assert(r.getAs[Long]("us_per_frame") == 40000L)
      assert(r.getAs[Long]("n_frames_declared") == 3L)
      assert(r.getAs[Long]("n_px") == 187L)
    }
    // frame luma sums differ across frames (seed advances per frame)
    assert(byId(0L).map(_.getAs[Long]("luma_sum")).distinct.length == 3)
    // the junk id yields one NULL row
    val j = byId(2L)
    assert(j.length == 1 && j.head.isNullAt(j.head.fieldIndex("frame")))
    // the corrupted clip keeps 3 rows; at most one lost its stats, and
    // the OTHER frames still decoded (frame-level quarantine)
    val c = byId(1L)
    assert(c.length == 3)
    assert(c.count(r => !r.isNullAt(r.fieldIndex("luma_sum"))) >= 2)
  }

  test("toneDetect decodes every keypad digit from its own tone") {
    val low = Array(40, 36, 32, 28); val high = Array(20, 16, 12, 8)
    val ids = (0L until 16L).toDF("doc_id")
    val d = MediaFixtures.withFixtureBytes(ids, "doc_id",
      id => MediaFixtures.toneBytes(id, low, high))
    val got = Multimodal.toneDetect(d, "doc_id", "content", low, high)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("digit"))
      .toMap
    for (id <- 0L until 16L)
      assert(got(id) == id % 16, s"digit mismatch for id=$id")
  }

  test("otsuThreshold separates a bimodal raster at the gap and " +
    "refuses a constant raster") {
    // 4x4 bimodal: half pixels at 40, half at 200 -> threshold in the
    // gap; with equal masses the variance-max is flat across the gap
    // and the tie rule picks its smallest value, 40.
    def pgm(vals: Seq[Int], w: Int, h: Int): Array[Byte] =
      s"P5\n$w $h\n255\n".getBytes("US-ASCII") ++ vals.map(_.toByte)
    val bimodal = pgm(Seq.fill(8)(40) ++ Seq.fill(8)(200), 4, 4)
    val flat = pgm(Seq.fill(16)(77), 4, 4)
    val d = MediaFixtures.withFixtureBytes(
      Seq(0L, 1L).toDF("doc_id"), "doc_id",
      id => if (id == 0L) bimodal else flat)
    val rows = Multimodal.otsuThreshold(d, "doc_id", "content")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    val b = rows(0L)
    assert(b.getAs[Long]("threshold") == 40L)
    assert(b.getAs[Long]("n_below") == 8L &&
      b.getAs[Long]("n_above") == 8L)
    val f = rows(1L)
    assert(f.isNullAt(f.fieldIndex("threshold")), "constant image")
    assert(f.getAs[Long]("n_below") == 16L)
  }
}
