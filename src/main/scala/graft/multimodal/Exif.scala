package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** EXIF metadata extraction — REAL TIFF-IFD parsing of genuine JPEG
  * APP1 segments, pure JVM. The training-data task this serves is
  * image-metadata PII scrubbing: camera GPS tags are the classic
  * privacy leak a multimodal ingest must detect (and strip) BEFORE the
  * bytes enter a corpus, and doing that requires actually walking the
  * Exif structure, not pattern-matching bytes.
  *
  * The writer emits the real thing — SOI, APP1 "Exif\0\0", a TIFF
  * header in EITHER byte order (II little / MM big, alternating by
  * fixture id so a parser that ignores endianness mismatches half the
  * corpus), IFD0 with in-line SHORT values and OUT-OF-LINE ASCII
  * values addressed by offset, a GPSInfo pointer tag (0x8825) to a
  * second IFD holding RATIONAL×3 coordinates, and EOI. The parser
  * walks it the way the spec says: endianness from the header, 12-byte
  * entries, type-aware value-vs-offset resolution, IFD chaining
  * through the GPS pointer. */
object Exif extends Serializable {

  // ------------------------------------------------------------- writer

  /** Author one genuine JPEG-with-Exif byte stream. `gps` carries
    * ((latDeg, latMin, latSec), latRef, (lonDeg, lonMin, lonSec),
    * lonRef) — rationals with denominator 1. */
  def buildJpeg(littleEndian: Boolean, make: String, model: String,
                orientation: Int,
                gps: Option[((Int, Int, Int), String, (Int, Int, Int),
                  String)]): Array[Byte] = {
    val tiff = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = tiff.write(v & 0xFF)
    def w16(v: Int): Unit =
      if (littleEndian) { w8(v); w8(v >> 8) } else { w8(v >> 8); w8(v) }
    def w32(v: Long): Unit =
      if (littleEndian) { w8(v.toInt); w8((v >> 8).toInt)
        w8((v >> 16).toInt); w8((v >> 24).toInt) }
      else { w8((v >> 24).toInt); w8((v >> 16).toInt)
        w8((v >> 8).toInt); w8(v.toInt) }
    // TIFF header
    if (littleEndian) { w8('I'); w8('I') } else { w8('M'); w8('M') }
    w16(42); w32(8L) // magic + IFD0 offset
    // IFD0 entries: Make(0x010F ASCII), Model(0x0110 ASCII),
    // Orientation(0x0112 SHORT), [GPSInfo(0x8825 LONG)]
    val makeB = (make + "\u0000").getBytes("US-ASCII")
    val modelB = (model + "\u0000").getBytes("US-ASCII")
    val n0 = if (gps.isDefined) 4 else 3
    val ifd0Size = 2 + n0 * 12 + 4
    // the spec's in-line rule: a value of <= 4 bytes lives IN the
    // entry's value field (zero-padded); only longer values go
    // out-of-line
    var tail = 8 + ifd0Size
    def reserve(b: Array[Byte]): Int =
      if (b.length <= 4) -1 else { val o = tail; tail += b.length; o }
    val makeOff = reserve(makeB)
    val modelOff = reserve(modelB)
    val gpsIfdOff = tail
    def entry(tag: Int, typ: Int, count: Int)(value: => Unit): Unit = {
      w16(tag); w16(typ); w32(count.toLong); value
    }
    def asciiValue(b: Array[Byte], off: Int): Unit =
      if (off < 0) { tiff.write(b, 0, b.length)
        (b.length until 4).foreach(_ => w8(0)) }
      else w32(off.toLong)
    w16(n0)
    entry(0x010F, 2, makeB.length)(asciiValue(makeB, makeOff))
    entry(0x0110, 2, modelB.length)(asciiValue(modelB, modelOff))
    // SHORT value is stored IN the 4-byte field, left-justified in the
    // file byte order (the spec's padding rule)
    entry(0x0112, 3, 1) { w16(orientation); w16(0) }
    if (gps.isDefined) entry(0x8825, 4, 1)(w32(gpsIfdOff.toLong))
    w32(0L) // next-IFD pointer: none
    if (makeOff >= 0) tiff.write(makeB, 0, makeB.length)
    if (modelOff >= 0) tiff.write(modelB, 0, modelB.length)
    gps.foreach { case ((laD, laM, laS), laRef, (loD, loM, loS), loRef) =>
      // GPS IFD: LatRef(0x1 ASCII2), Lat(0x2 RATIONAL×3),
      // LonRef(0x3 ASCII2), Lon(0x4 RATIONAL×3)
      val nG = 4
      val gIfdSize = 2 + nG * 12 + 4
      val latOff = gpsIfdOff + gIfdSize
      val lonOff = latOff + 24
      w16(nG)
      entry(0x0001, 2, 2) { w8(laRef.charAt(0)); w8(0); w16(0) }
      entry(0x0002, 5, 3)(w32(latOff.toLong))
      entry(0x0003, 2, 2) { w8(loRef.charAt(0)); w8(0); w16(0) }
      entry(0x0004, 5, 3)(w32(lonOff.toLong))
      w32(0L)
      Seq(laD, laM, laS).foreach { v => w32(v.toLong); w32(1L) }
      Seq(loD, loM, loS).foreach { v => w32(v.toLong); w32(1L) }
    }
    val tiffB = tiff.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    def o8(v: Int): Unit = out.write(v & 0xFF)
    o8(0xFF); o8(0xD8) // SOI
    val app1Payload = "Exif\u0000\u0000".getBytes("US-ASCII") ++ tiffB
    o8(0xFF); o8(0xE1) // APP1
    val segLen = app1Payload.length + 2
    o8(segLen >> 8); o8(segLen)
    out.write(app1Payload)
    o8(0xFF); o8(0xD9) // EOI
    out.toByteArray
  }

  final case class ExifMeta(endian: String, make: String, model: String,
                            orientation: Int,
                            lat: Option[(Long, Long, Long, String)],
                            lon: Option[(Long, Long, Long, String)])

  // ------------------------------------------------------------- parser

  /** REAL Exif walk: locate the APP1 Exif segment among JPEG markers
    * (skipping others by declared length), read the TIFF byte order,
    * walk IFD0's 12-byte entries resolving in-line vs offset values by
    * type/count, and follow the GPSInfo pointer IFD for RATIONAL
    * coordinates. None when no well-formed Exif APP1 exists. */
  def parse(content: Array[Byte]): Option[ExifMeta] = {
    if (content.length < 4 || (content(0) & 0xFF) != 0xFF ||
      (content(1) & 0xFF) != 0xD8) return None
    // find APP1/Exif
    var p = 2
    var tiffOff = -1
    var tiffLen = -1
    while (tiffOff < 0 && p + 4 <= content.length) {
      if ((content(p) & 0xFF) != 0xFF) return None
      val marker = content(p + 1) & 0xFF
      if (marker == 0xD9) return None // EOI before APP1
      val len = ((content(p + 2) & 0xFF) << 8) | (content(p + 3) & 0xFF)
      if (p + 2 + len > content.length) return None
      if (marker == 0xE1 && len >= 8 &&
        new String(content, p + 4, 4, "US-ASCII") == "Exif") {
        tiffOff = p + 10; tiffLen = len - 8
      } else p += 2 + len
    }
    if (tiffOff < 0 || tiffLen < 8) return None
    val le = content(tiffOff) == 'I'.toByte &&
      content(tiffOff + 1) == 'I'.toByte
    val be = content(tiffOff) == 'M'.toByte &&
      content(tiffOff + 1) == 'M'.toByte
    if (!le && !be) return None
    def u16(o: Int): Int = {
      val a = content(tiffOff + o) & 0xFF
      val b = content(tiffOff + o + 1) & 0xFF
      if (le) a | (b << 8) else (a << 8) | b
    }
    def u32(o: Int): Long = {
      if (le) u16(o).toLong | (u16(o + 2).toLong << 16)
      else (u16(o).toLong << 16) | u16(o + 2).toLong
    }
    if (u16(2) != 42) return None
    // every structured read below is validated against tiffLen BEFORE
    // touching the array: parse() is documented to return None (or a
    // field default) on malformed input, and a PII-scrub pass runs it
    // over untrusted bytes — a hostile entry count or out-of-line offset
    // must degrade, never throw
    def ascii(off: Int, count: Int): String = {
      if (off < 0 || count < 0 || count > tiffLen - off) return ""
      val raw = new String(content, tiffOff + off, count, "US-ASCII")
      raw.takeWhile(_ != '\u0000')
    }
    // entry value resolution: ASCII ≤4 and SHORT×1 are in-line
    final case class Entry(tag: Int, typ: Int, count: Long, at: Int)
    def readIfd(off: Int): Seq[Entry] = {
      if (off < 0 || off + 2 > tiffLen) return Nil
      val n = u16(off)
      if (off + 2 + n * 12 > tiffLen) return Nil
      (0 until n).map { i =>
        val e = off + 2 + i * 12
        Entry(u16(e), u16(e + 2), u32(e + 4), e + 8)
      }
    }
    // -1 = unreadable (unknown type, or an out-of-line offset pointing
    // past the segment); every consumer treats it as absent
    def valueOff(e: Entry): Int = {
      val byteLen = e.typ match {
        case 1 | 2 => e.count
        case 3 => e.count * 2
        case 4 => e.count * 4
        case 5 => e.count * 8
        case _ => return -1
      }
      val o = if (byteLen <= 4) e.at else u32(e.at).toInt
      if (o < 0 || byteLen > tiffLen - o) -1 else o
    }
    val ifd0 = readIfd(u32(4).toInt)
    def find(es: Seq[Entry], tag: Int): Option[Entry] =
      es.find(_.tag == tag)
    val make = find(ifd0, 0x010F)
      .map(e => ascii(valueOff(e), e.count.toInt)).getOrElse("")
    val model = find(ifd0, 0x0110)
      .map(e => ascii(valueOff(e), e.count.toInt)).getOrElse("")
    val orient = find(ifd0, 0x0112)
      .filter(_.typ == 3).map(valueOff)
      .filter(o => o >= 0 && o + 2 <= tiffLen).map(u16).getOrElse(0)
    def rational3(e: Entry): Option[(Long, Long, Long)] = {
      if (e.typ != 5 || e.count != 3) return None
      val o = valueOff(e)
      if (o < 0 || o + 24 > tiffLen) return None
      def num(i: Int): Long = {
        val n = u32(o + i * 8); val d = u32(o + i * 8 + 4)
        if (d == 0) -1L else n / d
      }
      Some((num(0), num(1), num(2)))
    }
    val gps = find(ifd0, 0x8825).map(e => readIfd(u32(e.at).toInt))
    def coord(es: Seq[Entry], refTag: Int, valTag: Int)
        : Option[(Long, Long, Long, String)] = for {
      rv <- find(es, valTag).flatMap(rational3)
      rr <- find(es, refTag).map(e => ascii(valueOff(e), e.count.toInt))
    } yield (rv._1, rv._2, rv._3, rr)
    val lat = gps.flatMap(coord(_, 0x0001, 0x0002))
    val lon = gps.flatMap(coord(_, 0x0003, 0x0004))
    Some(ExifMeta(if (le) "II" else "MM", make, model, orient, lat, lon))
  }

  // ------------------------------------------------------------ fixture

  private val makes = Array("Acme", "Pixelon", "Fotomax", "Lensworth")

  def fixtureBytes(id: Long): Array[Byte] = {
    val gps =
      if (id % 3 == 0)
        Some(((
          (id % 90).toInt, (id % 60).toInt, (id * 7 % 60).toInt),
          if (id % 6 == 0) "N" else "S",
          ((id % 180).toInt, (id * 3 % 60).toInt, (id * 11 % 60).toInt),
          if (id % 2 == 0) "E" else "W"))
      else None
    buildJpeg(littleEndian = id % 2 == 0,
      make = makes((id % 4).toInt),
      model = s"M-${id % 97}",
      orientation = (1 + id % 8).toInt,
      gps = gps)
  }

  final case class ExifRow(media_id: Long, endian: String, make: String,
                           model: String, orientation: Int,
                           has_gps: Boolean, lat_dms: Option[Long],
                           lat_ref: Option[String], lon_dms: Option[Long],
                           lon_ref: Option[String])

  /** One genuine Exif JPEG per document, parsed by [[parse]]; GPS
    * coordinates folded to integer DMS-seconds (deg·3600 + min·60 +
    * sec — exact). The has_gps flag IS the scrub decision a privacy
    * pass acts on. Narrow map over core-split ids — no shuffle. */
  def fromDocuments(s: SparkSession, docs: DataFrame): Dataset[ExifRow] = {
    import s.implicits._
    docs.select(col("doc_id")).as[Long]
      .repartition(s.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        it.flatMap { id =>
          parse(fixtureBytes(id)).iterator.map { m =>
            def dms(t: Option[(Long, Long, Long, String)]): Option[Long] =
              t.map { case (d, mi, se, _) => d * 3600 + mi * 60 + se }
            ExifRow(id, m.endian, m.make, m.model, m.orientation,
              m.lat.isDefined && m.lon.isDefined,
              dms(m.lat), m.lat.map(_._4), dms(m.lon), m.lon.map(_._4))
          }
        }
      }
  }
}
