package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{MediaFixtures, Multimodal}

/** The MP4/ISO-BMFF box walk against the kernel fixture AND hand-built
  * streams the fixture never emits: version-1 mvhd/tkhd (64-bit
  * times), `largesize` (size = 1) headers, a run-to-EOF (size = 0)
  * tail box, and malformed-structure refusals. */
class Mp4MetaSpec extends AnyFunSuite {

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)

  private def box(tp: String, payload: Array[Byte]): Array[Byte] =
    be32(payload.length + 8L) ++ tp.getBytes ++ payload

  private def largeBox(tp: String, payload: Array[Byte]): Array[Byte] =
    be32(1L) ++ tp.getBytes ++ be64(payload.length + 16L) ++ payload

  private val matrix = be32(0x10000L) ++ be32(0L) ++ be32(0L) ++
    be32(0L) ++ be32(0x10000L) ++ be32(0L) ++
    be32(0L) ++ be32(0L) ++ be32(0x40000000L)

  test("kernel fixture parses exactly; audio trak's 0x0 dims lose the " +
      "max; duration_ms is integer-exact") {
    for ((w, h, ts, dur, audio) <- Seq(
        (48, 31, 1000L, 4100L, false),
        (16, 12, 3000L, 100L, true),
        (33, 19, 2000L, 8999L, true))) {
      val b = MediaFixtures.mp4Bytes(w, h, ts, dur, audio)
      val got = Multimodal.mp4Meta(b)
      assert(got.contains(("isom", ts, dur, w, h, if (audio) 2 else 1)),
        s"${w}x$h ts=$ts dur=$dur audio=$audio -> $got")
    }
  }

  test("version-1 mvhd and tkhd (64-bit times) parse; largesize header " +
      "and a run-to-EOF mdat are walked") {
    val mvhd1 = box("mvhd",
      Array[Byte](1, 0, 0, 0) ++ be64(3600L) ++ be64(3600L) ++
        be32(90000L) ++ be64(123456789L) ++
        be32(0x10000L) ++ Array[Byte](1, 0, 0, 0, 0, 0, 0, 0, 0, 0) ++
        matrix ++ Array.fill[Byte](24)(0) ++ be32(2L))
    val tkhd1 = box("tkhd",
      Array[Byte](1, 0, 0, 7) ++ be64(3600L) ++ be64(3600L) ++
        be32(1L) ++ be32(0L) ++ be64(123456789L) ++
        Array.fill[Byte](8)(0) ++
        Array[Byte](0, 0, 0, 0, 1, 0, 0, 0) ++ matrix ++
        be32(1920L << 16) ++ be32(1080L << 16))
    val ftyp = box("ftyp", "mp42".getBytes ++ be32(0L) ++ "mp42".getBytes)
    // moov wrapped in a LARGESIZE header; mdat runs to EOF (size 0)
    val moov = largeBox("moov", mvhd1 ++ box("trak", tkhd1))
    val mdat = be32(0L) ++ "mdat".getBytes ++ Array.fill[Byte](9)(0x55)
    val got = Multimodal.mp4Meta(ftyp ++ moov ++ mdat)
    assert(got.contains(("mp42", 90000L, 123456789L, 1920, 1080, 1)), got.toString)
  }

  test("refusals: non-BMFF lead box, oversize child, trailing garbage " +
      "in a container, bad version, truncation") {
    val good = MediaFixtures.mp4Bytes(20, 14, 1000L, 500L, audioTrack = false)
    assert(Multimodal.mp4Meta(good).isDefined)
    // every-prefix truncation refuses or parses — never throws; the
    // full payload minus one byte must refuse (mdat box overruns)
    assert(Multimodal.mp4Meta(good.take(good.length - 1)).isEmpty)
    // first box not ftyp/moov
    val junk = box("abcd", Array.fill[Byte](4)(0)) ++ good
    assert(Multimodal.mp4Meta(junk).isEmpty)
    // child size overruns its container
    val bad = good.clone()
    // ftyp is first: inflate its size field beyond EOF
    System.arraycopy(be32(1 << 30), 0, bad, 0, 4)
    assert(Multimodal.mp4Meta(bad).isEmpty)
    // mvhd version 2 refuses
    val v2 = good.clone()
    val mvhdAt = {
      var i = -1
      for (j <- 0 until v2.length - 4)
        if (i < 0 && v2(j) == 'm' && v2(j + 1) == 'v' && v2(j + 2) == 'h' &&
          v2(j + 3) == 'd') i = j
      i
    }
    v2(mvhdAt + 4) = 2
    assert(Multimodal.mp4Meta(v2).isEmpty)
  }
}
