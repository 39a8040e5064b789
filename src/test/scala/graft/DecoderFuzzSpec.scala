package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{MediaFixtures, Multimodal}

/** Adversarial-byte hardening for every byte-level decoder: at corpus
  * scale corrupt payloads are a certainty, and the decode contract is
  * None/empty — NEVER an exception (one throw in a mapPartitions kernel
  * fails the task and, retried, the stage). Three attack surfaces per
  * decoder: seeded-random byte soup, every-prefix truncation of a valid
  * payload, and single-byte corruption at every offset of a valid
  * payload. No Spark session needed — kernels are plain functions. */
class DecoderFuzzSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(0x60d5eed)

  private def decoders: Seq[(String, Array[Byte] => Any)] = Seq(
    "pngPixels" -> (b => Multimodal.pngPixels(b)),
    "gifPixels" -> (b => Multimodal.gifPixels(b)),
    "gifFrames" -> (b => Multimodal.gifFrames(b, maxFrames = 8, stride = 2)),
    "bmpPixels" -> (b => Multimodal.bmpPixels(b)),
    "jpegPixels" -> (b => Multimodal.jpegPixels(b)),
    "mp4Meta" -> (b => Multimodal.mp4Meta(b)),
    "warcParse" -> (b => graft.sources.Warc.parseRecord(b)),
    "tarEntries" -> (b => graft.sources.Formats.tarEntries(b)),
    "tiffMeta" -> (b => Multimodal.tiffMeta(b)),
    "decodePixels" -> (b => Multimodal.decodePixels(b)))

  private def validPayloads: Seq[(String, Array[Byte])] = Seq(
    "png" -> MediaFixtures.pngPixelBytes(11, 9, 37L),
    "gif" -> MediaFixtures.gifPixelBytes(10, 8, 21L),
    "anim" -> MediaFixtures.gifAnimBytes(9, 8, 3, 5L),
    "bmp" -> MediaFixtures.bmpPixelBytes(10, 7, 11L),
    "tiffII" -> MediaFixtures.tiffBytes(little = true, 77L, 55L, 3, "camX"),
    "tiffMM" -> MediaFixtures.tiffBytes(little = false, 77L, 55L, 3, "c1"),
    "jpeg" -> MediaFixtures.jpegPixelBytes(13, 10, 29L),
    "jpegRst" -> MediaFixtures.jpegPixelBytes(18, 11, 41L, restartInterval = 2),
    "jpeg420" -> MediaFixtures.jpeg420PixelBytes(19, 17, 7L),
    "mp4" -> MediaFixtures.mp4Bytes(33, 21, 1000L, 777L, audioTrack = true),
    "warc" -> ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u\r\n" +
      "Content-Length: 57\r\n\r\nHTTP/1.1 200 OK\r\nContent-Length: 2\r\n" +
      "Content-Type: t\r\n\r\nok").getBytes,
    "tar" -> graft.sources.Formats.tarBytes(Seq(
      "a.txt" -> "hello tar".getBytes,
      "b/c.json" -> """{"k":1}""".getBytes)))

  test("random byte soup never throws (300 arrays, lengths 0..4096, " +
      "plus magic-byte-prefixed soup per codec)") {
    val magics = Seq[Array[Byte]](
      Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a),
      "GIF89a".getBytes, "BM".getBytes,
      Array[Byte]('I', 'I', 42, 0), Array[Byte]('M', 'M', 0, 42),
      "RIFF".getBytes, Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte))
    for (i <- 0 until 300) {
      val len = rnd.nextInt(4097)
      val b = new Array[Byte](len)
      rnd.nextBytes(b)
      for ((name, d) <- decoders)
        try d(b) catch {
          case e: Throwable => fail(s"$name threw on soup #$i: $e")
        }
      val m = magics(i % magics.length)
      val withMagic = m ++ b
      for ((name, d) <- decoders)
        try d(withMagic) catch {
          case e: Throwable => fail(s"$name threw on magic-soup #$i: $e")
        }
    }
  }

  test("every-prefix truncation of valid payloads never throws") {
    for ((pname, payload) <- validPayloads; cut <- 0 to payload.length) {
      val b = payload.take(cut)
      for ((name, d) <- decoders)
        try d(b) catch {
          case e: Throwable =>
            fail(s"$name threw on $pname truncated at $cut: $e")
        }
    }
  }

  test("single-byte corruption at every offset never throws") {
    for ((pname, payload) <- validPayloads; off <- payload.indices) {
      val b = payload.clone()
      b(off) = (b(off) ^ 0xff).toByte
      for ((name, d) <- decoders)
        try d(b) catch {
          case e: Throwable =>
            fail(s"$name threw on $pname flipped at $off: $e")
        }
    }
  }
}
