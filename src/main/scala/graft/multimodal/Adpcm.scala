package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** IMA / DVI ADPCM (WAVE format tag 0x0011) — REAL compressed-audio
  * decode, pure JVM. The JDK's `javax.sound.sampled` ships NO converter
  * for ADPCM (unlike G.711), so this is a from-scratch codec of the
  * public IMA spec (the "DVI4" algorithm; Microsoft's WAVE registration
  * documents the identical block layout): 4 bits/sample against 16-bit
  * PCM, the adaptive step-size state machine
  *
  *   step = stepTable(idx)
  *   diff = step>>3 (+ step>>2 if b0) (+ step>>1 if b1) (+ step if b2)
  *   pred ± diff (b3 = sign), clamped to int16
  *   idx += indexTable(nibble), clamped to [0, 88]
  *
  * with per-block re-sync headers (predictor int16 LE + step index),
  * low nibble first — the actual bitstream every IMA-ADPCM WAV player
  * decodes.
  *
  * Fixture protocol (the MJPEG/G.711 pattern): the nibble stream and
  * block headers are authored deterministically from the doc id, so the
  * "true" decoded samples are decoder-defined — and the DuckDB oracle
  * REPLAYS THE DECODER STATE MACHINE itself (a struct-accumulator
  * list_reduce over the same nibble sequence). A stub, a wrong step
  * table, a missed clamp, swapped nibble order, or ignoring the
  * per-block header mismatches every row.
  */
object Adpcm extends Serializable {

  private[graft] val stepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  private[graft] val indexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** One nibble through the state machine: (pred, idx) -> (pred', idx').
    * Exactly the IMA reference arithmetic (all values non-negative in
    * the shifts, so >> matches the oracle's integer division). */
  @inline private[multimodal] def stepOne(pred: Int, idx: Int, nib: Int)
      : (Int, Int) = {
    val step = stepTable(idx)
    var diff = step >> 3
    if ((nib & 1) != 0) diff += step >> 2
    if ((nib & 2) != 0) diff += step >> 1
    if ((nib & 4) != 0) diff += step
    val p0 = if ((nib & 8) != 0) pred - diff else pred + diff
    val p = math.max(-32768, math.min(32767, p0))
    val i = math.max(0, math.min(88, idx + indexTable(nib)))
    (p, i)
  }

  // ------------------------------------------------------------ container

  /** Build one GENUINE IMA-ADPCM WAVE file: RIFF/WAVE with a format-tag
    * 0x0011 fmt chunk (incl. the wSamplesPerBlock extension the spec
    * requires), `blocks` data blocks of `nBytes` nibble-pair bytes each,
    * every block led by its 4-byte re-sync header. Nibbles and headers
    * come from `nib`/`hdr` so the fixture is deterministic. */
  def buildWav(sampleRate: Int, blocks: Int, nBytes: Int,
               hdr: Int => (Int, Int), nib: (Int, Int) => Int)
      : Array[Byte] = {
    val blockAlign = 4 + nBytes
    val samplesPerBlock = 1 + 2 * nBytes
    val dataLen = blocks * blockAlign
    val bos = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = bos.write(v & 0xFF)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    def w32(v: Int): Unit = { w16(v); w16(v >> 16) }
    def tag(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    tag("RIFF"); w32(4 + 8 + 20 + 8 + dataLen); tag("WAVE")
    tag("fmt "); w32(20)
    w16(0x0011) // wFormatTag: IMA ADPCM
    w16(1) // mono
    w32(sampleRate)
    // nAvgBytesPerSec: blockAlign bytes per samplesPerBlock samples
    w32((sampleRate.toLong * blockAlign / samplesPerBlock).toInt)
    w16(blockAlign)
    w16(4) // wBitsPerSample
    w16(2) // cbSize
    w16(samplesPerBlock)
    tag("data"); w32(dataLen)
    var b = 0
    while (b < blocks) {
      val (p0, i0) = hdr(b)
      w16(p0); w8(i0); w8(0)
      var j = 0
      while (j < nBytes) {
        val lo = nib(b, 2 * j) & 0xF
        val hi = nib(b, 2 * j + 1) & 0xF
        w8(lo | (hi << 4))
        j += 1
      }
      b += 1
    }
    bos.toByteArray
  }

  final case class AdpcmDecoded(sampleRate: Int, nBlocks: Int,
                                samples: Array[Int])

  /** REAL IMA-ADPCM WAVE decode: walk the RIFF chunks (skipping unknown
    * ones by declared size — real files carry fact/LIST chunks), demand
    * format tag 0x0011 mono 4-bit, then decode every data block through
    * the state machine — per-block header sample first, then one sample
    * per nibble, LOW nibble before high. None when the bytes are not an
    * IMA-ADPCM WAVE; a block truncated mid-stream drops the file (the
    * samples-no-reader-accepts rule). */
  def decode(content: Array[Byte]): Option[AdpcmDecoded] = {
    if (content.length < 12) return None
    def u16(o: Int): Int =
      (content(o) & 0xFF) | ((content(o + 1) & 0xFF) << 8)
    def u32(o: Int): Long =
      (u16(o).toLong) | (u16(o + 2).toLong << 16)
    def fourcc(o: Int): String =
      new String(content, o, 4, "US-ASCII")
    if (fourcc(0) != "RIFF" || fourcc(8) != "WAVE") return None
    var off = 12
    var blockAlign = -1
    var sampleRate = -1
    var samplesPerBlock = -1
    var dataOff = -1
    var dataLen = -1
    while (off + 8 <= content.length) {
      val id = fourcc(off)
      val len = u32(off + 4).toInt
      if (len < 0 || off + 8 + len > content.length) return None
      if (id == "fmt ") {
        if (len < 16) return None
        val tagV = u16(off + 8)
        val channels = u16(off + 10)
        if (tagV != 0x0011 || channels != 1) return None
        sampleRate = u32(off + 12).toInt
        blockAlign = u16(off + 20)
        if (u16(off + 22) != 4) return None // bits per sample
        samplesPerBlock =
          if (len >= 20) u16(off + 26) else 1 + 2 * (blockAlign - 4)
      } else if (id == "data") {
        dataOff = off + 8; dataLen = len
      }
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    if (blockAlign < 5 || dataOff < 0 || sampleRate <= 0) return None
    if (samplesPerBlock != 1 + 2 * (blockAlign - 4)) return None
    if (dataLen % blockAlign != 0) return None
    val nBlocks = dataLen / blockAlign
    val out = new Array[Int](nBlocks * samplesPerBlock)
    var w = 0
    var b = 0
    while (b < nBlocks) {
      val base = dataOff + b * blockAlign
      var pred = (u16(base) << 16) >> 16 // sign-extend int16
      var idx = content(base + 2) & 0xFF
      if (idx > 88) return None
      out(w) = pred; w += 1
      var j = 0
      while (j < blockAlign - 4) {
        val byte = content(base + 4 + j) & 0xFF
        val (p1, i1) = stepOne(pred, idx, byte & 0xF)
        pred = p1; idx = i1; out(w) = pred; w += 1
        val (p2, i2) = stepOne(pred, idx, byte >> 4)
        pred = p2; idx = i2; out(w) = pred; w += 1
        j += 1
      }
      b += 1
    }
    Some(AdpcmDecoded(sampleRate, nBlocks, out))
  }

  // ------------------------------------------------------------- fixture

  /** Deterministic fixture parameters for doc `id` — mirrored verbatim
    * by the oracle SQL. */
  def fixtureBytes(id: Long): Array[Byte] = {
    val nBytes = (128 + id % 128).toInt
    buildWav(8000, blocks = 2, nBytes = nBytes,
      hdr = b => (((id * 97 + b * 31) % 4001 - 2000).toInt,
        ((id * 11 + b * 5) % 89).toInt),
      nib = (b, i) => ((i * 13 + id * 7 + b * 3) % 16).toInt)
  }

  final case class AdpcmRow(media_id: Long, sample_rate: Int,
                            n_blocks: Long, n_samples: Long,
                            sum_abs: Long, sum_pos: Long)

  /** One genuine IMA-ADPCM WAVE per document, decoded by [[decode]];
    * integer sample moments over the actually-decoded stream. Narrow
    * map over core-split ids — no data shuffle. */
  def fromDocuments(s: SparkSession, docs: DataFrame): Dataset[AdpcmRow] = {
    import s.implicits._
    docs.select(col("doc_id")).as[Long]
      .repartition(s.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        it.flatMap { id =>
          decode(fixtureBytes(id)).iterator.map { d =>
            var sa = 0L; var sp = 0L
            var i = 0
            while (i < d.samples.length) {
              val v = d.samples(i).toLong
              sa += math.abs(v)
              sp += v * (i + 1)
              i += 1
            }
            AdpcmRow(id, d.sampleRate, d.nBlocks.toLong,
              d.samples.length.toLong, sa, sp)
          }
        }
      }
  }
}
