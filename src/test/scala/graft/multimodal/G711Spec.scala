package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Pins the contract `multimodal_g711`'s oracle depends on: the JDK's
  * G.711 expander is bit-exact with the classic closed forms for every
  * code of both laws — which is what lets DuckDB replay the decode. */
class G711Spec extends AnyFunSuite {

  /** WAVE file whose 8-bit payload is exactly codes 0..255 in `law`. */
  private def wavAllCodes(aLaw: Boolean): Array[Byte] = {
    val codes = Array.tabulate[Byte](256)(_.toByte)
    val enc =
      if (aLaw) javax.sound.sampled.AudioFormat.Encoding.ALAW
      else javax.sound.sampled.AudioFormat.Encoding.ULAW
    val fmt = new javax.sound.sampled.AudioFormat(enc, 8000f, 8, 1, 1, 8000f, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(codes), fmt, 256L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def ulawExpand(c: Int): Int = {
    val u = (~c) & 0xFF
    val exp = (u >> 4) & 7
    val mant = u & 0xF
    val mag = (((mant << 3) + 0x84) << exp) - 0x84
    if ((u & 0x80) != 0) -mag else mag
  }

  private def alawExpand(c: Int): Int = {
    val u = c ^ 0x55
    val exp = (u >> 4) & 7
    val mant = u & 0xF
    val mag = if (exp == 0) (mant << 4) + 8 else ((mant << 4) + 0x108) << (exp - 1)
    if ((u & 0x80) != 0) mag else -mag
  }

  test("JDK mu-law expand is bit-exact with the closed form, all 256 codes") {
    val d = Multimodal.decodeG711(wavAllCodes(aLaw = false)).get
    assert(d.law == "ulaw" && d.sampleRate == 8000)
    assert(d.samples.length == 256)
    for (c <- 0 until 256)
      assert(d.samples(c) == ulawExpand(c), s"code $c")
  }

  test("JDK A-law expand is bit-exact with the closed form, all 256 codes") {
    val d = Multimodal.decodeG711(wavAllCodes(aLaw = true)).get
    assert(d.law == "alaw")
    assert(d.samples.length == 256)
    for (c <- 0 until 256)
      assert(d.samples(c) == alawExpand(c), s"code $c")
  }

  test("fixture walks every code and decodeG711 refuses non-companded input") {
    // i*31 mod 256 cycles all residues (gcd(31,256)=1): any nf >= 256
    // fixture exercises the full expand table
    val seen = (0 until 256).map(i => Multimodal.g711Code(i.toLong, 7L)).toSet
    assert(seen.size == 256)
    // linear PCM is real audio but NOT companded — must be rejected, so
    // the entry can never silently skip the decompression step
    assert(Multimodal.decodeG711(Multimodal.tinyWav(400, 8000, 1L)).isEmpty)
    assert(Multimodal.decodeG711("not audio".getBytes("UTF-8")).isEmpty)
  }

  test("tinyG711 writes a genuine companded WAVE the JDK re-reads") {
    val bytes = Multimodal.tinyG711(300, 8000, 5L, aLaw = false)
    val d = Multimodal.decodeG711(bytes).get
    assert(d.samples.length == 300)
    for (i <- 0 until 300)
      assert(d.samples(i) == ulawExpand(Multimodal.g711Code(i.toLong, 5L)))
    val a = Multimodal.decodeG711(Multimodal.tinyG711(300, 8000, 5L, aLaw = true)).get
    for (i <- 0 until 300)
      assert(a.samples(i) == alawExpand(Multimodal.g711Code(i.toLong, 5L)))
  }
}
