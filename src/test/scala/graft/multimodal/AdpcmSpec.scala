package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** IMA-ADPCM codec pins: reference arithmetic, block re-sync, container
  * robustness. */
class AdpcmSpec extends AnyFunSuite {

  private def wav(blocks: Int, nBytes: Int,
                  hdr: Int => (Int, Int),
                  nib: (Int, Int) => Int): Array[Byte] =
    Adpcm.buildWav(8000, blocks, nBytes, hdr, nib)

  test("state machine matches the IMA reference arithmetic step by step") {
    // pred=100, idx=0 (step 7):
    //  nib 0 -> diff = 7>>3 = 0, pred 100, idx max(0, -1) = 0
    //  nib 7 -> diff = 0 + 1 + 3 + 7 = 11, pred 111, idx 0+8 = 8
    //  (step 16) nib 15 -> diff = 2+4+8+16 = 30, pred 81, idx 8+8 = 16
    val d = Adpcm.decode(wav(1, 2, _ => (100, 0),
      (_, i) => Seq(0, 7, 15, 0)(i))).get
    // step 4: idx 16 (step 34), nib 0 -> diff 34>>3 = 4, pred 85, idx 15
    assert(d.samples.toSeq == Seq(100, 100, 111, 81, 85))
  }

  test("clamping: int16 ceiling and step-index floor both bind") {
    // start at the predictor ceiling with positive nibbles: stays 32767
    val hi = Adpcm.decode(wav(1, 1, _ => (32767, 88),
      (_, _) => 7)).get
    assert(hi.samples.toSeq == Seq(32767, 32767, 32767))
    // start at the floor with negative (sign-bit) nibbles: stays -32768
    val lo = Adpcm.decode(wav(1, 1, _ => (-32768, 88),
      (_, _) => 15)).get
    assert(lo.samples.toSeq == Seq(-32768, -32768, -32768))
  }

  test("per-block headers re-sync state (block 2 ignores block 1's end)") {
    val two = Adpcm.decode(wav(2, 2, b => (b * 1000, b * 10),
      (_, i) => (i * 5) % 16)).get
    val oneShifted = Adpcm.decode(wav(1, 2, _ => (1000, 10),
      (_, i) => (i * 5) % 16)).get
    // second block's samples = a fresh run from ITS header, not a
    // continuation of block 1's final (pred, idx)
    assert(two.samples.drop(5).toSeq == oneShifted.samples.toSeq)
    assert(two.nBlocks == 2 && two.samples.length == 10)
  }

  test("nibble order is low-before-high") {
    // byte 0x?1 with hi=0: low nibble 1 applies first. At idx 88
    // (step 32767) nib 1 adds 32767>>3 + 32767>>2 = 4095 + 8191; nib 0
    // then adds 32767>>3 only (idx clamped at 88 after -1... idx 87
    // step 29794 >> 3 = 3724). Assert against stepOne composition.
    val d = Adpcm.decode(wav(1, 1, _ => (0, 88), (_, i) => Seq(1, 0)(i))).get
    val (p1, i1) = Adpcm.stepOne(0, 88, 1)
    val (p2, _) = Adpcm.stepOne(p1, i1, 0)
    assert(d.samples.toSeq == Seq(0, p1, p2))
  }

  test("container: unknown chunks skip; truncated data drops the file") {
    val base = wav(1, 4, _ => (5, 3), (_, i) => i % 16)
    // splice a 'fact' chunk between fmt and data (u32 LE length 4)
    val dataIdx = {
      var i = 12
      var found = -1
      while (found < 0) {
        val id = new String(base, i, 4, "US-ASCII")
        val len = (base(i + 4) & 0xFF) | ((base(i + 5) & 0xFF) << 8)
        if (id == "data") found = i else i += 8 + len
      }
      found
    }
    val fact = Array[Byte]('f', 'a', 'c', 't', 4, 0, 0, 0, 9, 0, 0, 0)
    val spliced = base.take(dataIdx) ++ fact ++ base.drop(dataIdx)
    // fix the RIFF size field (+12)
    val riffLen = ((spliced(4) & 0xFF) | ((spliced(5) & 0xFF) << 8) |
      ((spliced(6) & 0xFF) << 16) | ((spliced(7) & 0xFF) << 24)) + 12
    spliced(4) = (riffLen & 0xFF).toByte
    spliced(5) = ((riffLen >> 8) & 0xFF).toByte
    spliced(6) = ((riffLen >> 16) & 0xFF).toByte
    spliced(7) = ((riffLen >> 24) & 0xFF).toByte
    assert(Adpcm.decode(spliced).map(_.samples.toSeq) ==
      Adpcm.decode(base).map(_.samples.toSeq))
    // truncation mid-block: declared data length no longer fits
    assert(Adpcm.decode(base.dropRight(3)).isEmpty)
    // a non-ADPCM WAVE (format tag 1) is not ours
    val pcm = base.clone()
    pcm(20) = 1 // wFormatTag -> PCM
    assert(Adpcm.decode(pcm).isEmpty)
  }
}
