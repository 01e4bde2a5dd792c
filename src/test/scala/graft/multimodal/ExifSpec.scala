package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Exif writer/parser pins: endianness equivalence, the TIFF in-line
  * value rule, GPS IFD chaining, marker skipping, truncation. */
class ExifSpec extends AnyFunSuite {

  private val gps = Some(((51, 30, 26), "N", (0, 7, 39), "W"))

  test("endianness: II and MM streams carry identical logical values") {
    val le = Exif.parse(Exif.buildJpeg(littleEndian = true,
      "Acme", "M-3", 6, gps)).get
    val be = Exif.parse(Exif.buildJpeg(littleEndian = false,
      "Acme", "M-3", 6, gps)).get
    assert(le.endian == "II" && be.endian == "MM")
    assert(le.copy(endian = "") == be.copy(endian = ""))
    assert(le.make == "Acme" && le.model == "M-3" && le.orientation == 6)
    assert(le.lat.contains((51L, 30L, 26L, "N")))
    assert(le.lon.contains((0L, 7L, 39L, "W")))
  }

  test("in-line vs out-of-line ASCII both resolve (the <=4-byte rule)") {
    // "M-3" + NUL = 4 bytes -> in-line; "M-4567" + NUL = 7 -> offset
    val short = Exif.parse(Exif.buildJpeg(littleEndian = true,
      "Pixelon", "M-3", 1, None)).get
    val long = Exif.parse(Exif.buildJpeg(littleEndian = true,
      "Pixelon", "M-4567", 1, None)).get
    assert(short.model == "M-3" && long.model == "M-4567")
    assert(short.make == "Pixelon")
  }

  test("no GPS tag -> no coordinates, has_gps decision false") {
    val m = Exif.parse(Exif.buildJpeg(littleEndian = false,
      "Fotomax", "M-9", 8, None)).get
    assert(m.lat.isEmpty && m.lon.isEmpty)
  }

  test("parser skips unrelated segments to find APP1") {
    val base = Exif.buildJpeg(littleEndian = true, "Acme", "M-1", 2, gps)
    // splice an APP0/JFIF segment right after SOI
    val jfif = Array[Byte](0xFF.toByte, 0xE0.toByte, 0, 9,
      'J', 'F', 'I', 'F', 0, 1, 2)
    val spliced = base.take(2) ++ jfif ++ base.drop(2)
    assert(Exif.parse(spliced).map(_.copy(endian = "")) ==
      Exif.parse(base).map(_.copy(endian = "")))
  }

  test("truncation and non-JPEG bytes return None") {
    val base = Exif.buildJpeg(littleEndian = true, "Acme", "M-1", 2, gps)
    assert(Exif.parse(base.take(6)).isEmpty)
    assert(Exif.parse("not a jpeg".getBytes).isEmpty)
    assert(Exif.parse(Array[Byte](0xFF.toByte, 0xD8.toByte,
      0xFF.toByte, 0xD9.toByte)).isEmpty) // SOI+EOI, no APP1
  }

  test("adversarial APP1 degrades instead of throwing: hostile entry " +
    "counts, out-of-range offsets, truncated value areas") {
    val base = Exif.buildJpeg(littleEndian = true, "Acme", "M-1", 2, gps)
    // TIFF starts at SOI(2) + APP1 marker+len(4) + "Exif\0\0"(6) = 12;
    // IFD0 entry count lives at TIFF+8 (LE)
    val tiff = 12
    // 1) huge entry count: claims 0xFFFF entries in a tiny segment
    val hostileCount = base.clone()
    hostileCount(tiff + 8) = 0xFF.toByte
    hostileCount(tiff + 9) = 0xFF.toByte
    assert(Exif.parse(hostileCount).nonEmpty) // IFD rejected, not thrown
    // 2) first entry's out-of-line offset pointing far past the segment
    //    (entry 0 value field = TIFF + 8 + 2 + 8): also must not throw
    val hostileOff = base.clone()
    hostileOff(tiff + 18) = 0xFF.toByte
    hostileOff(tiff + 19) = 0xFF.toByte
    hostileOff(tiff + 20) = 0xFF.toByte
    hostileOff(tiff + 21) = 0x7F.toByte
    val m = Exif.parse(hostileOff)
    assert(m.nonEmpty && m.get.make == "") // unreadable value -> absent
    // 3) every prefix truncation of the full fixture parses or degrades
    //    (the segment-length check bounds the walk; nothing throws)
    (0 until base.length).foreach(k => Exif.parse(base.take(k)))
    // 4) random byte corruption inside the TIFF body never throws
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val c = base.clone()
      (1 to 6).foreach { _ =>
        c(tiff + rnd.nextInt(c.length - tiff - 2)) = rnd.nextInt(256).toByte
      }
      Exif.parse(c)
    }
  }
}
