package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{MediaFixtures, Multimodal}

/** WAV-contained IMA ADPCM: header-seeded block decode, quarantine
  * posture for malformed containers, and block independence. */
class AdpcmWavSpec extends SparkSpec {

  import spark.implicits._

  private def statsOf(rows: Seq[(Long, Array[Byte])]) =
    Multimodal.adpcmWavStats(rows.toDF("id", "content"), "id", "content")
      .collect().map(r => r.getLong(0) -> r).toMap

  test("fixture decodes; header predictor is the first sample; " +
    "n_samples = blocks * (2*(blockAlign-4) + 1)") {
    val b = MediaFixtures.wavAdpcmBytes(nBlocks = 3, blockAlign = 12, seed = 7)
    val got = statsOf(Seq((1L, b)))(1L)
    assert(got.getLong(5) == 3L) // n_blocks
    assert(got.getLong(1) == 3L * (2 * 8 + 1)) // n_samples
    // block 0's header predictor (7*7 % 4096 - 2048 = -1999) bounds peak
    assert(got.getLong(3) >= 1999L)
  }

  test("block independence: stats of a 2-block file equal the merged " +
    "stats of the two 1-block files with the same per-block seeds") {
    // wavAdpcmBytes seeds block k by (seed, k), so a 2-block file's
    // blocks match one-block files reconstructed by shifting k into
    // the header by hand
    val two = MediaFixtures.wavAdpcmBytes(2, 16, seed = 11)
    val gotTwo = statsOf(Seq((1L, two)))(1L)
    // rebuild each block as its own container by slicing the data
    // chunk (header layout is fixed: 12 RIFF + 28 fmt + 8 data head)
    val dataOff = 12 + 8 + 20 + 8
    val one = MediaFixtures.wavAdpcmBytes(1, 16, seed = 11)
    val blockB = one.take(dataOff) ++ two.slice(dataOff + 16, dataOff + 32)
    val gotA = statsOf(Seq((1L, one)))(1L)
    val gotB = statsOf(Seq((1L, blockB)))(1L)
    assert(gotTwo.getLong(1) == gotA.getLong(1) + gotB.getLong(1))
    assert(gotTwo.getLong(2) == gotA.getLong(2) + gotB.getLong(2))
    assert(gotTwo.getLong(4) == gotA.getLong(4) + gotB.getLong(4))
    assert(gotTwo.getLong(3) == math.max(gotA.getLong(3), gotB.getLong(3)))
    assert(gotTwo.getLong(6) == gotB.getLong(6)) // final pred = block B's
  }

  test("quarantines: PCM tag, partial trailing block, bad index seed, " +
    "NULL payload — all NULL rows, never task failures") {
    val good = MediaFixtures.wavAdpcmBytes(2, 12, seed = 3)
    val pcmTag = good.clone(); pcmTag(20) = 1 // fmt tag 0x11 -> 0x01
    val partial = good.dropRight(5) // tears the last block
    val badIdx = good.clone()
    badIdx(12 + 8 + 20 + 8 + 2) = 90.toByte // index seed > 88
    val got = statsOf(Seq(
      (1L, good), (2L, pcmTag), (3L, partial), (4L, badIdx),
      (5L, null: Array[Byte])))
    assert(!got(1L).isNullAt(1))
    Seq(2L, 3L, 4L, 5L).foreach { id =>
      assert(got(id).isNullAt(1), s"row $id must quarantine")
    }
  }
}
