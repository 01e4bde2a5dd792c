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
}
