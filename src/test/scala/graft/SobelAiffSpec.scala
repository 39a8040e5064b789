package graft

import org.apache.spark.sql.functions.col

import graft.multimodal.{MediaFixtures, Multimodal}

/** Sobel energy against a hand raster; AIFF against hand-built chunks
  * (80-bit rate decode proven for all fixture rates plus a fractional
  * rejection). */
class SobelAiffSpec extends SparkSpec {

  import spark.implicits._

  test("sobel: a vertical step edge gives the closed-form gradient") {
    // 4x3 raster: columns [0,0,100,100] each row -> for the two interior
    // pixels gx = (sum of right col) - (sum of left col) = 400 or 0... at
    // (1,1): gx = (100+200+100) - 0 = 400, gy = 0; at (2,1): gx =
    // (100+200+100) - (0+0+0)? left col x=1 is 0 -> 400? No: x=2 left
    // neighbors are col 1 (=0), right col 3 (=100): gx = 400 - 0 = 400.
    // Wait col2=100: (2,1) right = col3 = 400, left = col1 = 0 -> 400.
    // Energy = 400 + 400 = 800, both strong at threshold 160.
    val w = 4; val h = 3
    val lum = Array(0, 0, 100, 100, 0, 0, 100, 100, 0, 0, 100, 100)
    // wrap in a BMP? simpler: feed through a PNG fixture is formula-bound;
    // use the internal decode path via a hand PCX with identity palette
    val row0 = lum.take(4); val bb = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bb.write(v & 0xff); bb.write((v >> 8) & 0xff) }
    bb.write(0x0a); bb.write(5); bb.write(1); bb.write(8)
    le16(0); le16(0); le16(w - 1); le16(h - 1); le16(72); le16(72)
    (0 until 48).foreach(_ => bb.write(0)); bb.write(0); bb.write(1)
    le16(w); le16(1); (0 until 58).foreach(_ => bb.write(0))
    lum.foreach(v => if (v >= 0xc0) { bb.write(0xc1); bb.write(v) }
      else bb.write(v))
    bb.write(0x0c)
    (0 until 256).foreach(i => { bb.write(i); bb.write(i); bb.write(i) })
    val bytes = bb.toByteArray
    val out = Multimodal.sobelEnergy(
      Seq((1L, bytes)).toDF("doc_id", "content"), "doc_id", "content",
      strongThreshold = 160).head()
    assert(out.getAs[Long]("n_interior") == 2L)
    assert(out.getAs[Long]("sobel_energy") == 800L)
    assert(out.getAs[Long]("strong_edges") == 2L)
    assert(out.getAs[Long]("energy_mean_q") == 400000L)
  }

  test("sobel: a constant raster has zero energy; degenerate dims give " +
      "NULL stats") {
    val flat = MediaFixtures.pcxPixelBytes(5, 4, 0)
    // seed 0, formula constant? not constant — use bmp of one value via
    // hand PCX: all pixels 9
    val bb = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bb.write(v & 0xff); bb.write((v >> 8) & 0xff) }
    bb.write(0x0a); bb.write(5); bb.write(1); bb.write(8)
    le16(0); le16(0); le16(4); le16(3); le16(72); le16(72)
    (0 until 48).foreach(_ => bb.write(0)); bb.write(0); bb.write(1)
    le16(6); le16(1); (0 until 58).foreach(_ => bb.write(0))
    (0 until 4).foreach(_ => { bb.write(0xc6); bb.write(9) })
    bb.write(0x0c)
    (0 until 256).foreach(i => { bb.write(i); bb.write(i); bb.write(i) })
    val out = Multimodal.sobelEnergy(
      Seq((1L, bb.toByteArray)).toDF("doc_id", "content"),
      "doc_id", "content").head()
    assert(out.getAs[Long]("sobel_energy") == 0L)
    assert(out.getAs[Long]("strong_edges") == 0L)
    val tiny = Multimodal.sobelEnergy(
      Seq((1L, MediaFixtures.pcxPixelBytes(8, 2, 3))).toDF("doc_id", "content"),
      "doc_id", "content").head()
    assert(tiny.isNullAt(tiny.fieldIndex("sobel_energy")),
      "h < 3 must yield NULL stats")
    assert(flat.nonEmpty)
  }

  test("aiff: the 80-bit extended rate decodes exactly for every " +
      "fixture rate, and the chunk walk survives the odd ANNO pad") {
    for (id <- Seq(0L, 1L, 2L, 3L, 10L, 21L)) {
      val out = Multimodal.aiffStats(
        Seq((id, MediaFixtures.aiffBytes(id))).toDF("doc_id", "content"),
        "doc_id", "content").head()
      val expRate = Seq(8000L, 11025L, 22050L, 44100L)((id % 4).toInt)
      assert(out.getAs[Long]("sample_rate") == expRate, s"id=$id")
      assert(out.getAs[Long]("channels") == id % 2 + 1)
      val n = (id % 40 + 20) * (id % 2 + 1)
      assert(out.getAs[Long]("n_samples") == n)
      // driver replay of the sample formula
      val pcm = (0 until n.toInt).map { i =>
        val raw = ((7L * i + 13L * id + i.toLong * i) % 65536L).toInt
        if (raw >= 32768) raw - 65536 else raw
      }
      assert(out.getAs[Long]("sum_abs") == pcm.map(v => math.abs(v).toLong).sum)
      assert(out.getAs[Long]("energy") ==
        pcm.map(v => v.toLong * v.toLong).sum)
    }
  }

  test("id3: hand-built v2.3 and v2.4 tags parse; padding stops the " +
      "walk; overruns and bad magic reject") {
    import graft.multimodal.MediaFixtures
    // fixture parity, both versions
    for (id <- Seq(0L, 1L, 42L, 99L)) {
      val out = Multimodal.id3Tags(
        Seq((id, MediaFixtures.id3Bytes(id))).toDF("doc_id", "content"),
        "doc_id", "content").head()
      assert(out.getAs[Long]("version") == (if (id % 2 == 0) 3L else 4L))
      assert(out.getAs[String]("title") == s"Title ${id % 100}")
      assert(out.getAs[Long]("track") == id % 20 + 1)
    }
    // padding: a tag whose declared size extends past the frames stops
    // at the zero byte instead of misreading padding as a frame
    val base = MediaFixtures.id3Bytes(4L)
    val padded = {
      val bb = new java.io.ByteArrayOutputStream()
      bb.write(base, 0, 6)
      val tagSize = ((base(6) & 0x7f) << 21) | ((base(7) & 0x7f) << 14) |
        ((base(8) & 0x7f) << 7) | (base(9) & 0x7f)
      val np = tagSize + 8
      bb.write((np >> 21) & 0x7f); bb.write((np >> 14) & 0x7f)
      bb.write((np >> 7) & 0x7f); bb.write(np & 0x7f)
      bb.write(base, 10, base.length - 10 - 12) // frames, minus trailer
      (0 until 8).foreach(_ => bb.write(0)) //    padding
      bb.toByteArray
    }
    val pr = Multimodal.id3Tags(
      Seq((4L, padded)).toDF("doc_id", "content"), "doc_id", "content")
      .head()
    assert(pr.getAs[String]("album") == "Album 4")
    // overrunning frame size rejects as a NULL row
    val broken = base.clone()
    broken(14) = 0x7f // TIT2 frame size high byte -> huge
    val br = Multimodal.id3Tags(
      Seq((4L, broken)).toDF("doc_id", "content"), "doc_id", "content")
      .head()
    assert(br.isNullAt(br.fieldIndex("title")))
    val bad = base.clone(); bad(0) = 'X'
    val bm = Multimodal.id3Tags(
      Seq((4L, bad)).toDF("doc_id", "content"), "doc_id", "content").head()
    assert(bm.isNullAt(bm.fieldIndex("version")))
  }

  test("aiff: fractional 80-bit rates and bad magic reject as NULL rows") {
    val good = MediaFixtures.aiffBytes(5L)
    // corrupt the mantissa low byte: rate becomes fractional
    val fra = good.clone()
    val commOff = (0 until good.length - 4).find(i =>
      good(i) == 'C' && good(i + 1) == 'O' && good(i + 2) == 'M' &&
        good(i + 3) == 'M').get + 8
    fra(commOff + 10 + 7) = 1 // low mantissa byte
    val out = Multimodal.aiffStats(
      Seq((5L, fra)).toDF("doc_id", "content"), "doc_id", "content").head()
    assert(out.isNullAt(out.fieldIndex("sample_rate")),
      "fractional rate must reject")
    val bad = good.clone(); bad(9) = 'X'
    val out2 = Multimodal.aiffStats(
      Seq((5L, bad)).toDF("doc_id", "content"), "doc_id", "content").head()
    assert(out2.isNullAt(out2.fieldIndex("channels")))
  }
}
