package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Pins the two contracts `multimodal_mjpeg` rests on: (1) solid-gray
  * JPEGs survive the lossy codec bit-exact for every gray value at
  * non-8-aligned dims (what lets the oracle predict pixel sums in closed
  * form), and (2) the sample-table walk recovers exactly the muxed frame
  * bytes, including the multi-chunk stsc run layout. */
class MjpegSpec extends AnyFunSuite {

  test("solid-gray JPEG round-trips bit-exact for all 256 grays, odd dims") {
    for (g <- 0 until 256) {
      val w = 24 + g % 17
      val h = 16 + g % 11
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.jpegGray(w, h, g)))
      assert(img.getWidth == w && img.getHeight == h)
      val r = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          assert(r.getSample(x, y, 0) == g, s"g=$g at ($x,$y)")
          x += 1
        }
        y += 1
      }
    }
  }

  test("parseMjpeg recovers exactly the muxed frame bytes (even count)") {
    val grays = Array(10, 200, 77, 145)
    val frames = grays.map(g => Multimodal.jpegGray(32, 20, g))
    val info = Multimodal.parseMjpeg(Multimodal.tinyMjpeg(32, 20, grays)).get
    assert(info.codec == "jpeg" && info.width == 32 && info.height == 20)
    assert(info.frames.length == 4)
    for (i <- frames.indices)
      assert(java.util.Arrays.equals(info.frames(i), frames(i)), s"frame $i")
  }

  test("odd frame count exercises the two-entry stsc run (trailing chunk of 1)") {
    val grays = Array(1, 2, 3, 4, 5)
    val frames = grays.map(g => Multimodal.jpegGray(25, 17, g))
    val info = Multimodal.parseMjpeg(Multimodal.tinyMjpeg(25, 17, grays)).get
    assert(info.frames.length == 5)
    for (i <- frames.indices)
      assert(java.util.Arrays.equals(info.frames(i), frames(i)), s"frame $i")
    // single frame: one chunk of one sample via the odd-count path
    val one = Multimodal.parseMjpeg(Multimodal.tinyMjpeg(25, 17, Array(9))).get
    assert(one.frames.length == 1)
  }

  test("structural inconsistencies are rejected, not mis-walked") {
    val good = Multimodal.tinyMjpeg(32, 20, Array(10, 20))
    assert(Multimodal.parseMjpeg("RIFFnot a movie".getBytes("US-ASCII")).isEmpty)
    // cut before moov: no sample table
    assert(Multimodal.parseMjpeg(good.take(200).toArray).isEmpty)
    // corrupt a chunk offset to point past EOF: the walk must bail
    val bad = good.clone()
    val stcoAt = {
      // find 'stco' fourcc
      val pat = "stco".getBytes("US-ASCII")
      (0 until bad.length - 4).find(p => pat.indices.forall(i => bad(p + i) == pat(i))).get
    }
    val offPos = stcoAt + 4 + 8 // ver/flags + count, first offset
    bad(offPos) = 0x7F
    assert(Multimodal.parseMjpeg(bad).isEmpty)
  }

  test("byte-flip fuzz: parseMjpeg never throws, only None or a valid walk") {
    val good = Multimodal.tinyMjpeg(32, 20, Array(10, 200, 77))
    // deterministic LCG positions/masks — every region of the file gets hit
    var x = 123456789L
    for (_ <- 0 until 2000) {
      x = x * 6364136223846793005L + 1442695040888963407L
      val pos = math.abs(x % good.length).toInt
      x = x * 6364136223846793005L + 1442695040888963407L
      val mask = (x & 0xFF).toInt
      val bad = good.clone()
      bad(pos) = (bad(pos) ^ mask).toByte
      Multimodal.parseMjpeg(bad) match {
        case None => () // rejected — fine
        case Some(info) => // a flip the walk doesn't depend on — fine,
          assert(info.frames.forall(_ ne null)) // but the result must be sane
      }
    }
    // truncation at every length from the tail inward (sampled)
    for (len <- good.length - 1 to 0 by -37)
      Multimodal.parseMjpeg(java.util.Arrays.copyOf(good, len))
  }

  test("decoded frame features match the closed-form oracle arithmetic") {
    val id = 123L
    val w = 24 + (id % 17).toInt
    val h = 16 + (id % 11).toInt
    val nf = 2 + (id % 4).toInt
    val grays = Array.tabulate(nf)(f => ((id * 37 + f * 101) % 256).toInt)
    val info = Multimodal.parseMjpeg(Multimodal.tinyMjpeg(w, h, grays)).get
    for ((fb, fi) <- info.frames.zipWithIndex) {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(fb))
      var sum = 0L
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        sum += img.getRaster.getSample(x, y, 0)
      assert(sum == grays(fi).toLong * w * h, s"frame $fi")
    }
  }
}
