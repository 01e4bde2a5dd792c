package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{Multimodal, Vp8l}

/** Differential round-trip proof for the pure-JVM VP8L codec pair: for
  * random ARGB images across every feature combination the encoder can
  * emit (subtract-green on/off × color cache off/2..8 bits × last-row
  * LZ77 backref on/off), decode(encode(img)) must reproduce every pixel
  * bit-exactly — the entropy layer (normal + simple prefix codes,
  * code-length codes with 16/17/18, prefix-coded lengths/distances,
  * cache insertion order) has no tolerance for drift. Plus negative
  * cases: truncated streams and unsupported features must refuse, not
  * throw or mis-decode. */
class Vp8lSpec extends AnyFunSuite {

  private def randImg(rnd: scala.util.Random, w: Int, h: Int,
                      palette: Int): Array[Int] = {
    // palette-limited channels make realistic prefix trees (varied
    // lengths, runs) without degenerating to single-symbol codes
    Array.fill(w * h) {
      val g = rnd.nextInt(palette)
      val r = rnd.nextInt(palette)
      val b = rnd.nextInt(palette)
      val a = 0xFF - rnd.nextInt(2)
      (a << 24) | (r << 16) | (g << 8) | b
    }
  }

  test("encode→decode round-trips bit-exactly across all feature combos") {
    val rnd = new scala.util.Random(20260814L)
    var cases = 0
    for {
      trial <- 1 to 6
      sg <- Seq(false, true)
      cacheBits <- Seq(0, 2, 5, 8)
      lz <- Seq(false, true)
    } {
      val w = 2 + rnd.nextInt(40)
      val h = (if (lz) 2 else 1) + rnd.nextInt(24)
      val img = randImg(rnd, w, h, 1 << (1 + rnd.nextInt(5)))
      if (lz) // encoder contract: last row equals the row above
        for (x <- 0 until w) img((h - 1) * w + x) = img((h - 2) * w + x)
      val payload = Vp8l.encode(img, w, h, sg, cacheBits, lz)
      val (dw, dh, px) = Vp8l.decode(payload).getOrElse(
        fail(s"decode refused (trial=$trial sg=$sg cache=$cacheBits lz=$lz)"))
      assert(dw == w && dh == h)
      assert(px.sameElements(img),
        s"pixel drift at trial=$trial sg=$sg cache=$cacheBits lz=$lz")
      cases += 1
    }
    info(s"$cases genuine VP8L streams round-tripped bit-exactly")
  }

  test("transform envelope round-trips bit-exactly: predictor (all 14 " +
    "modes), cross-color, palette (packed + unpacked), meta groups") {
    val rnd = new scala.util.Random(99L)
    var cases = 0
    // predictor: 4-px blocks sweep every mode across a big-enough image
    for (sg <- Seq(false, true); cacheBits <- Seq(0, 4)) {
      val (w, h) = (37, 29)
      val img = randImg(rnd, w, h, 16)
      val payload = Vp8l.encode(img, w, h, Vp8l.EncodeOpts(
        subtractGreen = sg, cacheBits = cacheBits, predictorBits = 2))
      val (dw, dh, px) = Vp8l.decode(payload).get
      assert(dw == w && dh == h && px.sameElements(img),
        s"predictor drift sg=$sg cache=$cacheBits")
      cases += 1
    }
    // cross-color: per-block signed multipliers
    for (sg <- Seq(false, true); bits <- Seq(2, 3)) {
      val (w, h) = (21, 17)
      val img = randImg(rnd, w, h, 32)
      val payload = Vp8l.encode(img, w, h, Vp8l.EncodeOpts(
        subtractGreen = sg, crossColorBits = bits))
      assert(Vp8l.decode(payload).get._3.sameElements(img),
        s"cross-color drift sg=$sg bits=$bits")
      cases += 1
    }
    // palette: 3 colors (8 px/byte), 9 colors (2 px/byte), 40 colors
    // (no packing)
    for (colors <- Seq(3, 9, 40)) {
      val (w, h) = (26, 11)
      val pal = Array.fill(colors)(0xFF000000 | rnd.nextInt(1 << 24))
        .distinct
      val img = Array.fill(w * h)(pal(rnd.nextInt(pal.length)))
      val payload = Vp8l.encode(img, w, h, Vp8l.EncodeOpts(palette = true))
      assert(Vp8l.decode(payload).get._3.sameElements(img),
        s"palette drift colors=$colors")
      cases += 1
    }
    // meta partition: two checkerboard prefix-code groups
    for (cacheBits <- Seq(0, 3); metaBits <- Seq(2, 3)) {
      val (w, h) = (33, 19)
      val img = randImg(rnd, w, h, 8)
      val payload = Vp8l.encode(img, w, h, Vp8l.EncodeOpts(
        cacheBits = cacheBits, metaBits = metaBits))
      assert(Vp8l.decode(payload).get._3.sameElements(img),
        s"meta drift cache=$cacheBits bits=$metaBits")
      cases += 1
    }
    info(s"$cases transform streams round-tripped bit-exactly")
  }

  test("container wrap/extract round-trips and pads odd chunks") {
    val img = randImg(new scala.util.Random(7L), 5, 3, 8)
    val payload = Vp8l.encode(img, 5, 3, subtractGreen = true,
      cacheBits = 3, lastRowLz77 = false)
    val webp = Vp8l.container(payload)
    val back = Vp8l.vp8lPayload(webp).get
    assert(back.sameElements(payload))
    // the existing header-only walker agrees on the variant
    assert(Multimodal.parseWebp(webp).exists(m =>
      m.variant == "VP8L" && m.width == 5 && m.height == 3))
  }

  test("malformed and unsupported streams refuse instead of throwing") {
    val img = randImg(new scala.util.Random(9L), 8, 8, 16)
    val payload = Vp8l.encode(img, 8, 8, subtractGreen = false,
      cacheBits = 0, lastRowLz77 = false)
    for (cut <- Seq(1, 3, payload.length / 2, payload.length - 1))
      assert(Vp8l.decode(java.util.Arrays.copyOf(payload, cut)).isEmpty
        || cut == payload.length - 1, // final byte may be pure padding
        s"truncation at $cut must refuse")
    assert(Vp8l.decode("nope".getBytes("UTF-8")).isEmpty)
    assert(Vp8l.decode(Array[Byte]()).isEmpty)
    // a transform header cut off mid-stream refuses (EOF), not throws
    val bw = Array[Byte](0x2F, 0, 0, 0, 0, 1)
    assert(Vp8l.decode(bw).isEmpty)
  }
}
