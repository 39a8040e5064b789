package graft

import org.apache.spark.sql.functions._

import graft.multimodal.MediaFixtures

/** The kernel fixture builders (pngPixelBytes / gifPixelBytes /
  * gifAnimBytes / bmpPixelBytes) must emit BYTE-IDENTICAL payloads to
  * the spec-verified column hex builders — the gates ride the kernels
  * for speed, so this parity is what keeps them honest. The dims grid
  * crosses padding residues, multi-sub-block LZW streams (>255 packed
  * bytes), and multi-frame animations. */
class FixtureParitySpec extends SparkSpec {

  private def columnBytes(c: org.apache.spark.sql.Column): Array[Byte] =
    spark.range(1).select(unhex(c).as("b")).collect()
      .head.getAs[Array[Byte]]("b")

  test("pngPixelBytes == unhex(pngPixelHex) across a dims/seed grid") {
    for (w <- Seq(1, 3, 9, 24, 32); h <- Seq(1, 2, 8, 23); s <- Seq(0L, 41L)) {
      val col = columnBytes(MediaFixtures.pngPixelHex(lit(w), lit(h), lit(s)))
      val ker = MediaFixtures.pngPixelBytes(w, h, s)
      assert(ker.sameElements(col), s"png ${w}x$h seed $s")
    }
  }

  test("gifPixelBytes == unhex(gifPixelHex), including multi-sub-block " +
      "streams") {
    // 27x18 = 486 px -> 973 codes -> 1095 packed bytes -> 5 sub-blocks
    for (w <- Seq(1, 7, 21, 27); h <- Seq(1, 6, 18); s <- Seq(0L, 88L)) {
      val col = columnBytes(MediaFixtures.gifPixelHex(lit(w), lit(h), lit(s)))
      val ker = MediaFixtures.gifPixelBytes(w, h, s)
      assert(ker.sameElements(col), s"gif ${w}x$h seed $s")
    }
  }

  test("gifAnimBytes == unhex(gifAnimHex) across frame counts") {
    for (nf <- 1 to 5; s <- Seq(3L, 72L)) {
      val col = columnBytes(
        MediaFixtures.gifAnimHex(lit(12), lit(9), lit(nf), lit(s)))
      val ker = MediaFixtures.gifAnimBytes(12, 9, nf, s)
      assert(ker.sameElements(col), s"anim nf=$nf seed $s")
    }
  }

  test("bmpPixelBytes == unhex(bmpPixelHex) across padding residues") {
    for (w <- Seq(1, 5, 6, 7, 8, 26); h <- Seq(1, 6, 12); s <- Seq(0L, 78L)) {
      val col = columnBytes(MediaFixtures.bmpPixelHex(lit(w), lit(h), lit(s)))
      val ker = MediaFixtures.bmpPixelBytes(w, h, s)
      assert(ker.sameElements(col), s"bmp ${w}x$h seed $s")
    }
  }
}
