package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.NativeKernels

/** Pins the one-byte-per-sample telephony decoders (G.711 μ-law /
  * A-law) and the IMA ADPCM state machine to hand-derived values of
  * the public closed forms, plus their structural symmetries — the
  * gate oracles replay the same arithmetic in DuckDB, so these specs
  * anchor BOTH engines to the algorithm, not to each other. */
class AudioCodecSpec extends AnyFunSuite {

  test("A-law closed form: segment-0 and segment-7 extremes, " +
    "post-XOR sign convention (bit set = positive)") {
    // 0x55 ^ 0x55 = 0x00: seg 0, mantissa 0 -> mag 8; sign clear -> -8
    assert(NativeKernels.alawToPcm(0x55) == -8)
    // 0xD5 ^ 0x55 = 0x80: same magnitude, sign set -> +8
    assert(NativeKernels.alawToPcm(0xD5) == 8)
    // 0x2A ^ 0x55 = 0x7F: seg 7, mantissa 15 -> (240+264)<<6 = 32256
    assert(NativeKernels.alawToPcm(0x2A) == -32256)
    assert(NativeKernels.alawToPcm(0xAA) == 32256)
  }

  test("A-law is odd-symmetric: b and b^0x80 decode to opposite " +
    "values, so the full byte table sums to zero") {
    (0 until 128).foreach { b =>
      assert(NativeKernels.alawToPcm(b) == -NativeKernels.alawToPcm(b | 0x80))
    }
    assert((0 until 256).map(NativeKernels.alawToPcm).sum == 0)
    // every magnitude is positive and bounded by the seg-7 extreme
    (0 until 256).foreach { b =>
      assert(math.abs(NativeKernels.alawToPcm(b)) >= 8)
      assert(math.abs(NativeKernels.alawToPcm(b)) <= 32256)
    }
  }

  test("mu-law closed form: 0xFF is zero, 0x7F is negative zero, " +
    "0x00 is the -8031 extreme") {
    assert(NativeKernels.mulawToPcm(0xFF) == 0)
    assert(NativeKernels.mulawToPcm(0x7F) == 0)
    assert(NativeKernels.mulawToPcm(0x00) == -8031)
    assert(NativeKernels.mulawToPcm(0x80) == 8031)
  }

  test("IMA ADPCM walk: byte 0x77 from the zero state decodes to " +
    "[11, 41] with final index 16 (hand-traced: step 7 then step 16)") {
    // nibble 7 at (pred 0, idx 0): step 7, diff 0+7+3+1 = 11
    var pred = NativeKernels.adpcmStep(0, 0, 7)
    assert(pred == 11)
    var idx = math.max(0, math.min(88, 0 + NativeKernels.AdpcmIndexTable(7)))
    assert(idx == 8)
    // nibble 7 at (pred 11, idx 8): step 16, diff 2+16+8+4 = 30
    pred = NativeKernels.adpcmStep(pred, idx, 7)
    assert(pred == 41)
    idx = math.max(0, math.min(88, idx + NativeKernels.AdpcmIndexTable(7)))
    assert(idx == 16)
  }

  test("IMA ADPCM clamps: a long all-0x77 run saturates the predictor " +
    "at 32767 and the index at 88; all-0xFF then drives it back down " +
    "to -32768 without overflow") {
    var pred = 0
    var idx = 0
    def feed(nib: Int, times: Int): Unit = (1 to times).foreach { _ =>
      pred = NativeKernels.adpcmStep(pred, idx, nib)
      idx = math.max(0, math.min(88, idx + NativeKernels.AdpcmIndexTable(nib)))
    }
    feed(7, 60)
    assert(pred == 32767 && idx == 88)
    feed(15, 60)
    assert(pred == -32768 && idx == 88)
  }

  test("ADPCM tables match the public spec shape: 89 monotonically " +
    "increasing steps from 7 to 32767, 16 index deltas") {
    val st = NativeKernels.AdpcmStepTable
    assert(st.length == 89 && st.head == 7 && st.last == 32767)
    assert(st.sliding(2).forall(p => p(0) < p(1)))
    assert(NativeKernels.AdpcmIndexTable.length == 16)
  }
}
