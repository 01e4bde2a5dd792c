package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Round-trip + integrity contract for the pure-JVM FLAC codec pair.
  * Every stream decode verifies CRC-8 per frame header, CRC-16 per
  * frame, and the STREAMINFO MD5 of the decoded samples — so "decode
  * returned Some" already means "bit-exact", and the round-trip tests
  * double-check sample-for-sample anyway. */
class FlacSpec extends AnyFunSuite {

  private def rt(samples: Array[Int], blockSize: Int, lpc: Boolean): Unit = {
    val bytes = Flac.encode(samples, blockSize, lpc)
    val d = Flac.decode(bytes).getOrElse(
      fail(s"decode failed: n=${samples.length} bs=$blockSize lpc=$lpc"))
    assert(d.md5Ok)
    assert(d.sampleRate == 8000)
    assert(d.nSamples == samples.length.toLong)
    assert(d.nFrames == (samples.length + blockSize - 1) / blockSize)
    assert(java.util.Arrays.equals(d.samples, samples),
      s"sample mismatch: n=${samples.length} bs=$blockSize lpc=$lpc")
  }

  test("round-trip: sawtooth, multi-frame, partial tail, both predictor paths") {
    for (lpc <- Seq(false, true); n <- Seq(600, 256, 257, 1499, 31)) {
      val s = Array.tabulate(n)(i => Multimodal.flacSample(i.toLong, 42L))
      rt(s, 256, lpc)
    }
  }

  test("a lying STREAMINFO total-samples field is rejected by the " +
    "capacity guard without allocating (fuzz-found heap-pressure OOM)") {
    val samples = Array.tabulate(600)(i => Multimodal.flacSample(i.toLong, 7L))
    val good = Flac.encode(samples, 256, useLpc = false)
    // the 36-bit total starts at bit 108 of STREAMINFO data (byte 21's
    // low nibble): raising its high bits claims ~2^36 samples — an
    // upfront allocation of that claim is a 256 GB array
    val bad = good.clone()
    bad(21) = (bad(21) | 0x0F).toByte
    assert(Flac.decode(bad).isEmpty)
  }

  test("round-trip: noise (rice-heavy), constants (CONSTANT subframe), edges") {
    val rnd = Array.tabulate(1024) { i =>
      (((i * 2654435761L + 99L) % 65536L) - 32768L).toInt // full 16-bit swing
    }
    rt(rnd, 256, lpc = false)
    rt(rnd, 256, lpc = true)
    rt(Array.fill(700)(1234), 256, lpc = false) // constant blocks
    rt(Array.fill(700)(-1234), 256, lpc = true)
    rt(Array.tabulate(300)(i => if (i % 2 == 0) 32767 else -32768), 256,
      lpc = false) // max-amplitude alternation forces the raw escape
    rt(Array(5, -5, 17), 16, lpc = false) // shorter than any order
  }

  test("a predictable signal genuinely compresses; noise does not") {
    val saw = Array.tabulate(4096)(i => Multimodal.flacSample(i.toLong, 7L))
    val enc = Flac.encode(saw, 256, useLpc = false)
    // order-2 residuals are 0 on the linear runs, ±4096 at wrap points
    // (~1 in 12 samples) — comfortably under raw 16-bit, not under 50%
    assert(enc.length < saw.length * 2 * 85 / 100,
      s"sawtooth should beat raw 16-bit: ${enc.length} vs ${saw.length * 2}")
    val noise = Array.tabulate(4096) { i =>
      (((i * 2654435761L + 3L) % 65536L) - 32768L).toInt
    }
    val encN = Flac.encode(noise, 256, useLpc = false)
    assert(encN.length > enc.length,
      "white noise must not compress better than the sawtooth")
  }

  test("corruption anywhere is rejected: frame payload, header, MD5") {
    val s = Array.tabulate(900)(i => Multimodal.flacSample(i.toLong, 11L))
    val good = Flac.encode(s, 256, useLpc = false)
    assert(Flac.decode(good).isDefined)
    // flip a bit deep in the first frame's residuals (CRC-16 must catch)
    val b1 = good.clone(); b1(80) = (b1(80) ^ 0x10).toByte
    assert(Flac.decode(b1).isEmpty, "payload corruption must fail CRC/MD5")
    // corrupt the stored MD5 itself
    val b2 = good.clone(); b2(30) = (b2(30) ^ 0x01).toByte // inside MD5 field
    assert(Flac.decode(b2).isEmpty, "MD5 corruption must fail verification")
    // truncate mid-stream
    assert(Flac.decode(good.take(good.length / 2).toArray).isEmpty)
  }

  test("byte-flip fuzz: decode never throws, never returns wrong samples") {
    val samples = Array.tabulate(700)(i => Multimodal.flacSample(i.toLong, 3L))
    val good = Flac.encode(samples, 256, useLpc = false)
    var x = 987654321L
    var rejected = 0
    for (_ <- 0 until 2000) {
      x = x * 6364136223846793005L + 1442695040888963407L
      val pos = math.abs(x % good.length).toInt
      x = x * 6364136223846793005L + 1442695040888963407L
      val mask = math.max(1, (x & 0xFF).toInt) // always a real flip
      val bad = good.clone()
      bad(pos) = (bad(pos) ^ mask).toByte
      Flac.decode(bad) match {
        case None => rejected += 1
        case Some(d) =>
          // a flip the decode doesn't depend on (ignored STREAMINFO
          // fields: min/max frame size, sample-rate bits) may still
          // decode — but NEVER to wrong samples: everything that feeds
          // sample reconstruction is CRC/MD5-covered
          assert(java.util.Arrays.equals(d.samples, samples),
            s"flip at $pos decoded to WRONG samples")
      }
    }
    // the audio payload itself is fully covered: most flips reject
    assert(rejected > 1800, s"only $rejected/2000 flips rejected")
    for (len <- good.length - 1 to 0 by -23)
      Flac.decode(java.util.Arrays.copyOf(good, len))
  }

  test("non-FLAC bytes are rejected, including real WAV") {
    assert(Flac.decode("not a flac stream at all".getBytes("UTF-8")).isEmpty)
    assert(Flac.decode(Multimodal.tinyWav(400, 8000, 1L)).isEmpty)
    assert(Flac.decode(Array.emptyByteArray).isEmpty)
  }

  test("fixture arithmetic: decoded moments match the closed form") {
    val id = 57L
    val nf = 600 + (id % 900).toInt
    val samples = Array.tabulate(nf)(i => Multimodal.flacSample(i.toLong, id))
    val d = Flac.decode(Flac.encode(samples, 256, useLpc = true)).get
    var sa = 0L; var sp = 0L
    for (i <- 0 until nf) {
      val v = (((i.toLong * 331L + id * 7919L) % 4096L) - 2048L)
      sa += math.abs(v); sp += v * (i + 1)
    }
    assert(d.samples.map(v => math.abs(v.toLong)).sum == sa)
    assert(d.samples.zipWithIndex.map { case (v, i) => v.toLong * (i + 1) }.sum == sp)
    assert(d.nFrames == (nf + 255) / 256)
  }
}
