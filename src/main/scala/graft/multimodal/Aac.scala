package graft.multimodal

/** AAC-LC SPECTRAL ENTROPY LAYER, pure JVM — the integer half of an
  * AAC decoder, carried inside genuine [[Multimodal.buildAdts]]
  * transport: everything from the raw_data_block down to the exact
  * QUANTIZED spectral coefficients and scalefactors. The remaining
  * float half (scalefactor dequantisation, TNS, the IMDCT filterbank)
  * stays honestly out of scope — those are real-valued and cannot
  * carry a cross-engine hash oracle; the INTEGER layer here is where
  * all of AAC's entropy machinery lives.
  *
  * REAL structure (ISO/IEC 14496-3 syntax):
  *  - single_channel_element framing: id_syn_ele / instance tag,
  *    8-bit global_gain, ics_info (window sequence/shape, max_sfb).
  *  - section_data: run-length sections, each a 4-bit codebook id plus
  *    length units with the all-ones ESCAPE continuation rule.
  *  - scale_factor_data: DPCM from global_gain, one delta per
  *    non-zero-codebook band.
  *  - spectral_data: 4-tuples for codebooks 1–4, 2-tuples for 5–11,
  *    codebook ZERO bands carrying nothing; SIGNED codebooks
  *    (1,3,5,7,9) pack the sign into the codeword, UNSIGNED ones
  *    (2,4,6,8,10,11) code magnitudes then append one sign bit per
  *    non-zero value; codebook 11 magnitudes of 16 are followed by the
  *    REAL escape sequence (N ones, a zero, then an (N+4)-bit word,
  *    value 2^(N+4) + word).
  *  - The codebook largest-absolute-value ladder (LAV 1,1,2,2,4,4,
  *    7,7,12,12,16) deciding tuple width and sign handling.
  *
  * PINNED PLACEHOLDER DATA (the [[Vp8]]/[[H264]] table policy):
  *  - The Huffman CODE ASSIGNMENTS for the eleven spectral codebooks
  *    and the scalefactor book — coded here as order-0 Exp-Golomb of
  *    the packed tuple index (the alphabets, tuple shapes, sign rules,
  *    and escapes are the real ones above).
  *  - The per-sample-rate scalefactor-band width tables — pinned to a
  *    documented widening formula.
  * The encoder emits against the same forms, so streams round-trip
  * bit-exactly, and the layer is LOSSLESS over integers — the DuckDB
  * oracle replays the fixture coefficients in closed form.
  */
object Aac {

  /** Scalefactor-band widths — PINNED PLACEHOLDER (per-rate tables are
    * data): bands widen every 4 sfbs: 4,4,4,4, 8,8,8,8, 12,... */
  def swbWidth(k: Int): Int = 4 * (k / 4 + 1)

  def bandOffset(k: Int): Int = {
    var o = 0; var i = 0
    while (i < k) { o += swbWidth(i); i += 1 }
    o
  }

  /** Codebook largest absolute values (index 1..11; 11 escapes). */
  private val lav = Array(0, 1, 1, 2, 2, 4, 4, 7, 7, 12, 12, 16)
  private def isSigned(cb: Int): Boolean = (cb & 1) == 1 && cb <= 9
  private def tupleSize(cb: Int): Int = if (cb <= 4) 4 else 2

  /** One decoded frame of the integer layer. */
  final case class SpectralFrame(globalGain: Int, maxSfb: Int,
                                 codebooks: Array[Int],
                                 scaleFactors: Array[Int],
                                 coeffs: Array[Int])

  // ---- placeholder scalar code: Exp-Golomb-0 over a bit cursor

  private def egWrite(bw: H264.BitWriter, v: Int): Unit = bw.ue(v)
  private def egRead(br: H264.BitReader): Int = br.ue()

  // --------------------------------------------------------- encode

  /** Encode one raw_data_block (SCE, long windows). `codebooks(k)` in
    * 0..11 per band; `coeffs` hold every band's values (codebook-0
    * bands must be all zero; magnitudes must fit the band's LAV, with
    * 16..8191 legal for codebook 11 via the escape). */
  def encodeFrame(bw: H264.BitWriter, globalGain: Int, maxSfb: Int,
                  codebooks: Array[Int], scaleFactors: Array[Int],
                  coeffs: Array[Int]): Unit = {
    bw.bits(0, 3) // id_syn_ele: SCE
    bw.bits(0, 4) // element_instance_tag
    bw.bits(globalGain & 0xFF, 8)
    // ics_info: reserved, window_sequence=ONLY_LONG, window_shape
    bw.bit(0); bw.bits(0, 2); bw.bit(0)
    bw.bits(maxSfb, 6)
    bw.bit(0) // predictor_data_present
    // section_data: RLE over equal consecutive codebooks, 5-bit len
    // units with the 31-escape continuation (the real long-window rule)
    var k = 0
    while (k < maxSfb) {
      val cb = codebooks(k)
      var run = 1
      while (k + run < maxSfb && codebooks(k + run) == cb) run += 1
      bw.bits(cb, 4)
      var rem = run
      while (rem >= 31) { bw.bits(31, 5); rem -= 31 }
      bw.bits(rem, 5)
      k += run
    }
    // scale_factor_data: DPCM from global_gain over non-zero bands,
    // zigzag-mapped deltas through the placeholder scalar code
    var prev = globalGain
    k = 0
    while (k < maxSfb) {
      if (codebooks(k) != 0) {
        val d = scaleFactors(k) - prev
        egWrite(bw, if (d >= 0) 2 * d else -2 * d - 1)
        prev = scaleFactors(k)
      }
      k += 1
    }
    // spectral_data
    k = 0
    while (k < maxSfb) {
      val cb = codebooks(k)
      if (cb != 0) {
        val ts = tupleSize(cb)
        val base = bandOffset(k)
        val width = swbWidth(k)
        val l = lav(cb)
        var t = 0
        while (t < width) {
          if (isSigned(cb)) {
            // signed: pack each value v∈[-l,l] as v+l, base (2l+1)
            var idx = 0
            var e = 0
            while (e < ts) {
              val v = coeffs(base + t + e)
              require(math.abs(v) <= l, s"cb $cb value $v exceeds LAV $l")
              idx = idx * (2 * l + 1) + (v + l)
              e += 1
            }
            egWrite(bw, idx)
          } else {
            // unsigned: magnitudes (capped at LAV; cb 11 caps at 16
            // with the escape), then one sign bit per non-zero
            var idx = 0
            var e = 0
            while (e < ts) {
              val v = math.abs(coeffs(base + t + e))
              val m = if (cb == 11) math.min(v, 16) else v
              require(m <= l, s"cb $cb magnitude $v exceeds LAV $l")
              require(cb == 11 || v <= l, s"cb $cb value $v needs cb 11")
              idx = idx * (l + 1) + m
              e += 1
            }
            egWrite(bw, idx)
            e = 0
            while (e < ts) {
              val v = coeffs(base + t + e)
              val m = if (cb == 11) math.min(math.abs(v), 16)
                      else math.abs(v)
              if (m != 0) bw.bit(if (v < 0) 1 else 0)
              e += 1
            }
            if (cb == 11) {
              e = 0
              while (e < ts) {
                val v = math.abs(coeffs(base + t + e))
                if (v >= 16) {
                  // REAL escape: N ones, 0, (N+4)-bit word; v = 2^(N+4)+word
                  require(v >= 16 && v < 8192, s"escape value $v")
                  var n = 0
                  while ((1 << (n + 4 + 1)) <= v) n += 1
                  var i = 0
                  while (i < n) { bw.bit(1); i += 1 }
                  bw.bit(0)
                  bw.bits(v - (1 << (n + 4)), n + 4)
                }
                e += 1
              }
            }
          }
          t += ts
        }
      }
      k += 1
    }
    // byte-align the raw_data_block tail (ADTS frames are byte-sized)
    bw.bit(1)
    while (bw.byteAlignedBits != 0) bw.bit(0)
  }

  // --------------------------------------------------------- decode

  /** Decode one raw_data_block. None on structural breaks. */
  def decodeFrame(bytes: Array[Byte]): Option[SpectralFrame] =
    scala.util.Try {
      val br = new H264.BitReader(bytes)
      if (br.bits(3) != 0) return None // SCE only
      br.bits(4)
      val globalGain = br.bits(8)
      br.bit()
      if (br.bits(2) != 0) return None // long windows only
      br.bit()
      val maxSfb = br.bits(6)
      if (maxSfb > 40) return None
      if (br.bit() != 0) return None
      val codebooks = new Array[Int](maxSfb)
      var k = 0
      while (k < maxSfb) {
        val cb = br.bits(4)
        if (cb > 11) return None
        var run = 0
        var unit = br.bits(5)
        while (unit == 31) { run += 31; unit = br.bits(5) }
        run += unit
        if (run == 0 || k + run > maxSfb) return None
        var i = 0
        while (i < run) { codebooks(k + i) = cb; i += 1 }
        k += run
      }
      val scaleFactors = new Array[Int](maxSfb)
      var prev = globalGain
      k = 0
      while (k < maxSfb) {
        if (codebooks(k) != 0) {
          val z = egRead(br)
          val d = if ((z & 1) == 0) z / 2 else -(z + 1) / 2
          prev += d
          scaleFactors(k) = prev
        }
        k += 1
      }
      val total = bandOffset(maxSfb)
      val coeffs = new Array[Int](total)
      k = 0
      while (k < maxSfb) {
        val cb = codebooks(k)
        if (cb != 0) {
          val ts = tupleSize(cb)
          val base = bandOffset(k)
          val width = swbWidth(k)
          val l = lav(cb)
          var t = 0
          while (t < width) {
            if (isSigned(cb)) {
              var idx = egRead(br)
              var e = ts - 1
              while (e >= 0) {
                coeffs(base + t + e) = idx % (2 * l + 1) - l
                idx /= (2 * l + 1)
                e -= 1
              }
              if (idx != 0) return None
            } else {
              var idx = egRead(br)
              val mags = new Array[Int](ts)
              var e = ts - 1
              while (e >= 0) {
                mags(e) = idx % (l + 1)
                idx /= (l + 1)
                e -= 1
              }
              if (idx != 0) return None
              e = 0
              while (e < ts) {
                val neg = if (mags(e) != 0) br.bit() == 1 else false
                coeffs(base + t + e) = if (neg) -mags(e) else mags(e)
                e += 1
              }
              if (cb == 11) {
                e = 0
                while (e < ts) {
                  if (math.abs(coeffs(base + t + e)) == 16) {
                    var n = 0
                    while (br.bit() == 1 && n < 9) n += 1
                    val word = br.bits(n + 4)
                    val v = (1 << (n + 4)) + word
                    coeffs(base + t + e) =
                      if (coeffs(base + t + e) < 0) -v else v
                  }
                  e += 1
                }
              }
            }
            t += ts
          }
        }
        k += 1
      }
      Some(SpectralFrame(globalGain, maxSfb, codebooks, scaleFactors,
        coeffs))
    }.toOption.flatten
}
