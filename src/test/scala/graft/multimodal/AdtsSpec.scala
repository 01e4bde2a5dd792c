package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** ADTS transport walker: header round-trip across the parameter
  * space, frame-boundary exactness, and structural rejection of
  * truncated / desynced / parameter-shifting streams. */
class AdtsSpec extends AnyFunSuite {

  test("round-trip: every (profile, sfi, channels, frame sizes) combo " +
    "walks back exactly") {
    val r = new scala.util.Random(11L)
    for (trial <- 1 to 300) {
      val profile = r.nextInt(3)
      val sfi = r.nextInt(12)
      val channels = 1 + r.nextInt(6)
      val n = 1 + r.nextInt(9)
      val payloads = Seq.fill(n)(Array.fill(r.nextInt(800))(
        r.nextInt(256).toByte))
      val bytes = Multimodal.buildAdts(profile, sfi, channels, payloads)
      val m = Multimodal.parseAdts(bytes)
      assert(m.isDefined, s"trial $trial")
      assert(m.get == Multimodal.AdtsMeta(n, profile,
        Array(96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
          16000, 12000, 11025, 8000)(sfi),
        channels, payloads.map(_.length.toLong).sum))
    }
  }

  test("frame boundaries are exact: an off-by-one frame length desyncs " +
    "and the walker reports None instead of inventing frames") {
    val bytes = Multimodal.buildAdts(1, 4, 2,
      Seq(Array.fill(30)(7.toByte), Array.fill(40)(9.toByte)))
    // corrupt the first frame's 13-bit length (byte 4 holds bits 10-3)
    val mut = bytes.clone()
    mut(4) = (mut(4) + 1).toByte
    assert(Multimodal.parseAdts(mut).isEmpty)
  }

  test("hostile input: truncations, desyncs, and mid-stream parameter " +
    "changes return None, never throw") {
    val bytes = Multimodal.buildAdts(2, 7, 1,
      Seq.fill(4)(Array.fill(25)(1.toByte)))
    // each frame is 7 + 25 = 32 bytes; a whole-frame prefix is a VALID
    // shorter stream, every other truncation must reject
    for (len <- 0 until bytes.length) {
      val m = Multimodal.parseAdts(bytes.take(len))
      if (len % 32 == 0 && len > 0)
        assert(m.contains(Multimodal.AdtsMeta(len / 32, 2, 22050, 1,
          (len / 32) * 25L)), s"whole-frame prefix $len")
      else assert(m.isEmpty, s"truncation at $len must fail")
    }
    // bad sync
    val mut = bytes.clone(); mut(0) = 0x12
    assert(Multimodal.parseAdts(mut).isEmpty)
    // parameter change mid-stream: splice a frame with another profile
    val spliced = Multimodal.buildAdts(0, 7, 1,
      Seq(Array.fill(25)(1.toByte))) ++
      Multimodal.buildAdts(1, 7, 1, Seq(Array.fill(25)(1.toByte)))
    assert(Multimodal.parseAdts(spliced).isEmpty)
    // random garbage never throws
    val r = new scala.util.Random(12L)
    for (_ <- 1 to 200)
      Multimodal.parseAdts(Array.fill(r.nextInt(64))(
        r.nextInt(256).toByte))
  }
}
