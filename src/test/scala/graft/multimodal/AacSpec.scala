package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** AAC-LC spectral layer: lossless integer round-trip across all
  * twelve codebooks (section RLE, DPCM scalefactors, quad/pair tuples,
  * sign-bit and escape rules), plus hostile-input rejection. */
class AacSpec extends AnyFunSuite {

  private val lavs = Array(0, 1, 1, 2, 2, 4, 4, 7, 7, 12, 12, 16)

  private def randomFrame(r: scala.util.Random) = {
    val maxSfb = 4 + r.nextInt(10)
    val cbs = Array.fill(maxSfb)(r.nextInt(12))
    val sfs = cbs.map(cb => if (cb == 0) 0 else 60 + r.nextInt(120))
    val total = Aac.bandOffset(maxSfb)
    val coeffs = new Array[Int](total)
    for (k <- 0 until maxSfb if cbs(k) != 0) {
      val base = Aac.bandOffset(k)
      val w = Aac.swbWidth(k)
      for (p <- 0 until w) {
        val mag =
          if (cbs(k) == 11 && r.nextInt(4) == 0) 16 + r.nextInt(4000)
          else r.nextInt(lavs(cbs(k)) + 1)
        coeffs(base + p) = if (r.nextBoolean()) mag else -mag
      }
    }
    (r.nextInt(256), maxSfb, cbs, sfs, coeffs)
  }

  test("encode/decode round-trips exactly: codebooks, scalefactors, " +
    "and every quantized coefficient, incl. cb-11 escapes") {
    val r = new scala.util.Random(21L)
    for (trial <- 1 to 400) {
      val (gg, maxSfb, cbs, sfs, coeffs) = randomFrame(r)
      val bw = new H264.BitWriter
      Aac.encodeFrame(bw, gg, maxSfb, cbs, sfs, coeffs)
      val f = Aac.decodeFrame(bw.bytes())
      assert(f.isDefined, s"trial $trial")
      val fr = f.get
      assert(fr.globalGain == gg && fr.maxSfb == maxSfb)
      assert(fr.codebooks.toSeq == cbs.toSeq, s"trial $trial: sections")
      for (k <- 0 until maxSfb if cbs(k) != 0)
        assert(fr.scaleFactors(k) == sfs(k), s"trial $trial: sf($k)")
      assert(fr.coeffs.toSeq == coeffs.toSeq, s"trial $trial: coeffs")
    }
  }

  test("long section runs cross the 31-unit escape correctly") {
    val maxSfb = 40
    val cbs = Array.fill(maxSfb)(5) // one 40-band section: 31-esc + 9
    val sfs = Array.fill(maxSfb)(100)
    val coeffs = new Array[Int](Aac.bandOffset(maxSfb))
    coeffs(0) = 3; coeffs(Aac.bandOffset(39)) = -4
    val bw = new H264.BitWriter
    Aac.encodeFrame(bw, 100, maxSfb, cbs, sfs, coeffs)
    val f = Aac.decodeFrame(bw.bytes()).get
    assert(f.codebooks.forall(_ == 5))
    assert(f.coeffs.toSeq == coeffs.toSeq)
  }

  test("hostile input returns None, never throws") {
    val r = new scala.util.Random(22L)
    val (gg, maxSfb, cbs, sfs, coeffs) = randomFrame(r)
    val bw = new H264.BitWriter
    Aac.encodeFrame(bw, gg, maxSfb, cbs, sfs, coeffs)
    val bytes = bw.bytes()
    for (len <- 0 until bytes.length) Aac.decodeFrame(bytes.take(len))
    for (_ <- 1 to 300) {
      val mut = bytes.clone()
      mut(r.nextInt(mut.length)) =
        (mut(r.nextInt(mut.length)) ^ (1 << r.nextInt(8))).toByte
      Aac.decodeFrame(mut)
    }
    Aac.decodeFrame(Array.fill(40)(r.nextInt(256).toByte))
  }
}
