package graft.multimodal

/** VP8 (lossy WebP) KEYFRAME codec, pure JVM — the intra-frame slice of
  * the public RFC 6386 bitstream: the boolean arithmetic coder, the
  * 3-byte frame tag + keyframe start code + 14-bit dimensions, the
  * bool-coded first partition (filter/quantizer/probability-update
  * headers, per-macroblock intra modes), separate DCT token partitions,
  * the coefficient token tree with band/context conditioning and the
  * after-zero no-EOB rule, zigzag scan, dequantization, the 4x4 inverse
  * DCT (20091/35468 multiplier form) and the inverse Walsh-Hadamard
  * second-order transform for 16x16-mode luma DC, and the intra
  * predictors (DC/V/H/TM at 16x16 and 8x8 chroma) with the frame-edge
  * 127/129/128 conventions.
  *
  * What is and is not spec data:
  *  - Every ALGORITHM above follows RFC 6386 (bool decoder update loop,
  *    iDCT/iWHT arithmetic, prediction formulas, header field order,
  *    token trees' shape, scan order, coefficient bands, the
  *    skip-EOB-after-zero rule).
  *  - The large entropy CONSTANT tables the RFC carries as data — the
  *    default coefficient probabilities (4·8·3·11), the probability-
  *    update gating table of the same shape, the 128-entry dc/ac
  *    quantizer lookups, and the mode probability vectors — are PINNED
  *    PLACEHOLDER TABLES here (deterministic, documented at each site):
  *    the container has no copy of the RFC's tables and no reference
  *    decoder to validate against, and silently-misremembered constants
  *    would be worse than labeled ones. The encoder emits against the
  *    same tables, so streams round-trip bit-exactly through every
  *    code path; swapping in the spec's tables is a data-only change
  *    that touches no algorithm.
  *  - B_PRED is implemented in full: 16 per-subblock modes with
  *    above/left mode-context conditioning, all ten 4x4 predictors
  *    (DC/TM/VE/HE/LD/RD/VR/VL/HD/HU) with the reference decoder's
  *    above-right edge rules, type-3 coefficient blocks with no Y2 and
  *    the untouched-Y2-context rule.
  *  - The in-loop deblocking filter is implemented for both types
  *    (normal and simple — [[filterFrame]]): interior/edge limits with
  *    the sharpness derivation, high-edge-variance selection, the wide
  *    27/18/9-tap mb-edge kernel, per-MB inner-edge gating, applied as
  *    a whole-frame pass after reconstruction (intra prediction reads
  *    unfiltered pixels).
  *
  * The ENCODER exists to produce genuine fixture streams and, like the
  * quantizing encoder it is, carries its own reconstruction: Vp8Spec's
  * round-trip property asserts decoder output == the encoder's internal
  * reconstruction across modes, quantizers, partition counts, and
  * non-16-aligned dimensions.
  */
object Vp8 {

  // -------------------------------------------------------- bool coder

  /** RFC 6386 §7.3 boolean decoder: 16-bit value window over the byte
    * stream, range in 128..255, renormalize by left shifts. */
  final class BoolDecoder(bytes: Array[Byte], start: Int, end: Int) {
    // a truncated stream reads as zero bits past its end, never throws
    private val lim = math.min(end, bytes.length)
    private var value: Long = {
      val b0 = if (start < lim) bytes(start) & 0xFF else 0
      val b1 = if (start + 1 < lim) bytes(start + 1) & 0xFF else 0
      ((b0 << 8) | b1).toLong
    }
    private var range: Int = 255
    private var bitCount: Int = 0
    private var pos: Int = start + 2

    def bool(prob: Int): Int = {
      val split = 1 + (((range - 1) * prob) >> 8)
      val bigSplit = split.toLong << 8
      val ret =
        if (value >= bigSplit) { range -= split; value -= bigSplit; 1 }
        else { range = split; 0 }
      while (range < 128) {
        value <<= 1
        range <<= 1
        bitCount += 1
        if (bitCount == 8) {
          bitCount = 0
          val nb = if (pos >= 0 && pos < lim) bytes(pos) & 0xFF else 0
          pos += 1
          value |= nb.toLong
        }
      }
      ret
    }

    /** Uniform literal: n bits MSB-first, each a bool at prob 128. */
    def literal(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bool(128); i += 1 }
      v
    }

    /** Flagged sign-magnitude delta: present-bit, then n-bit magnitude,
      * then sign (1 = negative). */
    def flaggedDelta(n: Int): Int =
      if (bool(128) == 0) 0
      else {
        val mag = literal(n)
        if (bool(128) == 1) -mag else mag
      }

    /** Walk a tree (pairs of child indices; negative = -symbol-1 leaf)
      * with per-node probabilities, starting at node index `start0`. */
    def tree(t: Array[Int], probs: Array[Int], start0: Int = 0): Int = {
      var i = start0
      while (true) {
        val b = bool(probs(i >> 1))
        val next = t(i + b)
        if (next <= 0) return -next
        i = next
      }
      0 // unreachable
    }
  }

  /** RFC 6386 appendix bool encoder: low-value accumulator with carry
    * propagation into already-emitted bytes. */
  final class BoolEncoder {
    private val out = new java.io.ByteArrayOutputStream()
    private var lowValue: Long = 0L
    private var range: Int = 255
    private var count: Int = -24 // bits until the next byte is complete

    def bool(prob: Int, bit: Int): Unit = {
      val split = 1 + (((range - 1) * prob) >> 8)
      if (bit != 0) { lowValue += split; range -= split }
      else range = split
      var shift = Integer.numberOfLeadingZeros(range) - 24
      range <<= shift
      count += shift
      if (count >= 0) {
        val offset = shift - count
        // carry out of the 24-bit window propagates into emitted bytes;
        // offset >= 1 always (count was negative before this round)
        if (((lowValue << (offset - 1)) & 0x80000000L) != 0) carry()
        out.write(((lowValue >> (24 - offset)) & 0xFF).toInt)
        lowValue = (lowValue << offset) & 0xFFFFFFL
        shift = count
        count -= 8
      }
      // 32-bit wrap, NOT a 24-bit mask: bits 24..31 carry the pending
      // byte + carry state consumed at the next write
      lowValue = (lowValue << shift) & 0xFFFFFFFFL
    }

    private def carry(): Unit = {
      val b = out.toByteArray
      var i = b.length - 1
      while (i >= 0 && (b(i) & 0xFF) == 0xFF) { b(i) = 0; i -= 1 }
      require(i >= 0, "bool-encoder carry out of stream")
      b(i) = ((b(i) & 0xFF) + 1).toByte
      out.reset()
      out.write(b, 0, b.length)
    }

    def literal(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bool(128, (v >> i) & 1); i -= 1 }
    }

    def flaggedDelta(v: Int, n: Int): Unit =
      if (v == 0) bool(128, 0)
      else {
        bool(128, 1)
        literal(math.abs(v), n)
        bool(128, if (v < 0) 1 else 0)
      }

    /** Emit the tree path for `symbol` from node `start0`. */
    def tree(t: Array[Int], probs: Array[Int], symbol: Int,
             start0: Int = 0): Unit = {
      // depth-first search for the leaf, then emit the branch bits
      def path(i: Int): Option[List[(Int, Int)]] = {
        var b = 0
        while (b < 2) {
          val next = t(i + b)
          if (next == -symbol) return Some(List((i, b)))
          if (next > 0) path(next) match {
            case Some(p) => return Some((i, b) :: p)
            case None    =>
          }
          b += 1
        }
        None
      }
      path(start0).getOrElse(sys.error(s"symbol $symbol not in tree"))
        .foreach { case (i, b) => bool(probs(i >> 1), b) }
    }

    def bytes(): Array[Byte] = {
      // flush the 24-bit window (plus one guard byte of padding zeros)
      var i = 0
      while (i < 32) { bool(128, 0); i += 1 }
      out.toByteArray
    }
  }

  // ------------------------------------------------------------ tables

  /** Intra 16x16 luma modes (keyframe order). */
  val DC_PRED = 0; val V_PRED = 1; val H_PRED = 2; val TM_PRED = 3
  val B_PRED = 4

  /** Keyframe luma-mode tree: B_PRED first, then DC/V/H/TM. */
  private val kfYmodeTree =
    Array(-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
  private val kfYmodeProbs = Array(145, 156, 163, 128)

  /** Chroma-mode tree (DC/V/H/TM). */
  private val uvModeTree = Array(-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
  private val kfUvModeProbs = Array(142, 114, 183)

  /** 4x4 subblock intra modes (B_PRED submodes). */
  val B_DC = 0; val B_TM = 1; val B_VE = 2; val B_HE = 3; val B_LD = 4
  val B_RD = 5; val B_VR = 6; val B_VL = 7; val B_HD = 8; val B_HU = 9

  /** Subblock-mode tree (10 leaves, 9 internal nodes). */
  private val bModeTree = Array(
    -B_DC, 2,
    -B_TM, 4,
    -B_VE, 6,
    8, 12,
    -B_HE, 10,
    -B_RD, -B_VR,
    -B_LD, 14,
    -B_VL, 16,
    -B_HD, -B_HU)

  /** Keyframe subblock-mode probabilities conditioned on (above, left)
    * neighbor modes — PLACEHOLDER DATA (the spec's 10·10·9 table is
    * data; see the object doc), varied across all three indices. */
  private val kfBModeProbs: Array[Array[Array[Int]]] =
    Array.tabulate(10, 10, 9) { (a, l, n) =>
      1 + ((83 * a + 29 * l + 11 * n + 120) % 253)
    }

  /** Coefficient token tree (RFC 6386 §13.2 shape): EOB / 0 / 1 / 2 /
    * 3 / 4 / cat1..cat6. Decoding after a ZERO token starts at node 2
    * (EOB cannot follow a zero run). */
  private val TOK_EOB = 0
  private val tokenTree = Array(
    -TOK_EOB, 2, // p0: eob vs more
    -1, 4, // p1: token 0 (value 0) vs more  [-1 = symbol 1 -> value 0]
    -2, 6, // p2: value 1 vs more
    8, 12, // p3: {2,3,4} vs categories
    -3, 10, // p4: value 2
    -4, -5, // p5: 3 vs 4
    14, 16, // p6: cat1/cat2 vs cat3..6
    -6, -7, // p7: cat1 vs cat2
    18, 20, // p8
    -8, -9, // p9: cat3 vs cat4
    -10, -11) // p10: cat5 vs cat6
  // symbol s (1..11) -> base value / extra bits
  private val tokenBase = Array(0, 0, 1, 2, 3, 4, 5, 7, 11, 19, 35, 67)
  private val tokenExtraBits = Array(0, 0, 0, 0, 0, 0, 1, 2, 3, 4, 5, 11)

  /** Per-category extra-bit probabilities — PLACEHOLDER DATA (see the
    * object doc): structurally one prob per extra bit, values pinned. */
  private val catProbs: Array[Array[Int]] = Array(
    Array(), Array(), Array(), Array(), Array(), Array(),
    Array(159),
    Array(165, 145),
    Array(173, 148, 140),
    Array(176, 155, 140, 135),
    Array(180, 157, 141, 134, 130),
    Array(254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129))

  /** Zigzag: coefficient order -> raster position in the 4x4 block. */
  private val zigzag =
    Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  /** Coefficient position -> probability band (RFC 6386 §13.3). */
  private val coeffBands =
    Array(0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)

  /** Default coefficient token probabilities [type][band][ctx][node] —
    * PLACEHOLDER DATA, deterministic md5-free formula pinned here (the
    * RFC's 1056 default values are data this container does not carry).
    * Kept in 1..254 and varied across all four indices so every
    * conditioning dimension is exercised, not flattened. */
  private[multimodal] val defaultCoeffProbs: Array[Array[Array[Array[Int]]]] =
    Array.tabulate(4, 8, 3, 11) { (t, b, c, n) =>
      1 + ((137 * t + 71 * b + 43 * c + 17 * n + 96) % 253)
    }

  /** Probability-update gating table, same shape — PLACEHOLDER DATA
    * (spec defaults are mostly near 255: updates are rare). */
  private val coeffUpdateProbs: Array[Array[Array[Array[Int]]]] =
    Array.tabulate(4, 8, 3, 11) { (t, b, c, n) =>
      240 + ((t + b + c + n) % 15)
    }

  /** Quantizer lookups, index 0..127 — PLACEHOLDER DATA (the RFC's
    * 128-entry dc/ac tables are data): monotone affine ramps so every
    * index is a distinct, SQL-expressible dequant factor. */
  private[multimodal] def dcQ(i: Int): Int = 4 + clampQ(i)
  private[multimodal] def acQ(i: Int): Int = 4 + 2 * clampQ(i)
  private def clampQ(i: Int): Int = math.max(0, math.min(127, i))

  /** Second-order (Y2) and chroma dequant derivation (RFC §14.1 shape:
    * scaled/clamped variants of the base lookups). */
  private[multimodal] def y2dcQ(i: Int): Int = dcQ(i) * 2
  private[multimodal] def y2acQ(i: Int): Int = math.max(8, acQ(i) * 155 / 100)
  private[multimodal] def uvdcQ(i: Int): Int = math.min(dcQ(i), 132)
  private[multimodal] def uvacQ(i: Int): Int = acQ(i)

  // -------------------------------------------------------- transforms

  private val cospi8sqrt2minus1 = 20091
  private val sinpi8sqrt2 = 35468

  /** RFC 6386 §14.3 inverse DCT, 4x4, in-place form: input block of 16
    * dequantized coefficients (raster order), output 16 residuals. */
  def idct4x4(in: Array[Int]): Array[Int] = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) { // columns
      val ip0 = in(i); val ip4 = in(i + 4)
      val ip8 = in(i + 8); val ip12 = in(i + 12)
      val a1 = ip0 + ip8
      val b1 = ip0 - ip8
      var t1 = (ip4 * sinpi8sqrt2) >> 16
      var t2 = ip12 + ((ip12 * cospi8sqrt2minus1) >> 16)
      val c1 = t1 - t2
      t1 = ip4 + ((ip4 * cospi8sqrt2minus1) >> 16)
      t2 = (ip12 * sinpi8sqrt2) >> 16
      val d1 = t1 + t2
      tmp(i) = a1 + d1
      tmp(i + 12) = a1 - d1
      tmp(i + 4) = b1 + c1
      tmp(i + 8) = b1 - c1
      i += 1
    }
    val out = new Array[Int](16)
    i = 0
    while (i < 4) { // rows
      val r = i * 4
      val ip0 = tmp(r); val ip1 = tmp(r + 1)
      val ip2 = tmp(r + 2); val ip3 = tmp(r + 3)
      val a1 = ip0 + ip2
      val b1 = ip0 - ip2
      var t1 = (ip1 * sinpi8sqrt2) >> 16
      var t2 = ip3 + ((ip3 * cospi8sqrt2minus1) >> 16)
      val c1 = t1 - t2
      t1 = ip1 + ((ip1 * cospi8sqrt2minus1) >> 16)
      t2 = (ip3 * sinpi8sqrt2) >> 16
      val d1 = t1 + t2
      out(r) = (a1 + d1 + 4) >> 3
      out(r + 3) = (a1 - d1 + 4) >> 3
      out(r + 1) = (b1 + c1 + 4) >> 3
      out(r + 2) = (b1 - c1 + 4) >> 3
      i += 1
    }
    out
  }

  /** RFC 6386 §14.3 inverse Walsh-Hadamard (Y2 second-order): input 16
    * dequantized coefficients, output the 16 luma subblock DCs. */
  def iwht4x4(in: Array[Int]): Array[Int] = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) { // columns
      val a1 = in(i) + in(i + 12)
      val b1 = in(i + 4) + in(i + 8)
      val c1 = in(i + 4) - in(i + 8)
      val d1 = in(i) - in(i + 12)
      tmp(i) = a1 + b1
      tmp(i + 4) = c1 + d1
      tmp(i + 8) = a1 - b1
      tmp(i + 12) = d1 - c1
      i += 1
    }
    val out = new Array[Int](16)
    i = 0
    while (i < 4) { // rows
      val r = i * 4
      val a1 = tmp(r) + tmp(r + 3)
      val b1 = tmp(r + 1) + tmp(r + 2)
      val c1 = tmp(r + 1) - tmp(r + 2)
      val d1 = tmp(r) - tmp(r + 3)
      out(r) = (a1 + b1 + 3) >> 3
      out(r + 1) = (c1 + d1 + 3) >> 3
      out(r + 2) = (a1 - b1 + 3) >> 3
      out(r + 3) = (d1 - c1 + 3) >> 3
      i += 1
    }
    out
  }

  // -------------------------------------------------------- prediction

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Intra-predict one size x size plane block into `plane` at (bx, by)
    * from already-reconstructed neighbors; frame-edge conventions:
    * missing above row = 127, missing left column = 129, DC with
    * neither = 128 (RFC §12.2). `plane` is (mbW*size) x (mbH*size). */
  private def predictBlock(plane: Array[Int], stride: Int, bx: Int, by: Int,
                           size: Int, mode: Int): Unit = {
    val hasAbove = by > 0
    val hasLeft = bx > 0
    def above(x: Int): Int =
      if (hasAbove) plane((by - 1) * stride + bx + x) else 127
    def left(y: Int): Int =
      if (hasLeft) plane((by + y) * stride + bx - 1) else 129
    def aboveLeft: Int =
      if (hasAbove && hasLeft) plane((by - 1) * stride + bx - 1)
      else if (hasAbove) 127
      else 129
    mode match {
      case DC_PRED =>
        val dc =
          if (hasAbove && hasLeft) {
            var s = 0
            var i = 0
            while (i < size) { s += above(i) + left(i); i += 1 }
            (s + size) >> (Integer.numberOfTrailingZeros(size) + 1)
          } else if (hasAbove || hasLeft) {
            var s = 0
            var i = 0
            while (i < size) { s += (if (hasAbove) above(i) else left(i)); i += 1 }
            (s + size / 2) >> Integer.numberOfTrailingZeros(size)
          } else 128
        var y = 0
        while (y < size) {
          var x = 0
          while (x < size) { plane((by + y) * stride + bx + x) = dc; x += 1 }
          y += 1
        }
      case V_PRED =>
        var y = 0
        while (y < size) {
          var x = 0
          while (x < size) {
            plane((by + y) * stride + bx + x) = above(x); x += 1
          }
          y += 1
        }
      case H_PRED =>
        var y = 0
        while (y < size) {
          val l = left(y)
          var x = 0
          while (x < size) { plane((by + y) * stride + bx + x) = l; x += 1 }
          y += 1
        }
      case TM_PRED =>
        val al = aboveLeft
        var y = 0
        while (y < size) {
          val l = left(y)
          var x = 0
          while (x < size) {
            plane((by + y) * stride + bx + x) = clamp255(l + above(x) - al)
            x += 1
          }
          y += 1
        }
      case m => sys.error(s"unsupported intra mode $m")
    }
  }

  /** The 4 above-right pixels shared by a macroblock's right-column
    * subblocks: for inner rows the true above-right is not yet
    * reconstructed, so (as the reference decoder does) every
    * right-column subblock uses the pixels above-right of the MB —
    * from the above MB row when present, the frame-edge 127s on the top
    * row, and the last above pixel replicated at the right frame edge. */
  private def mbAboveRight(plane: Array[Int], stride: Int, mbX: Int,
                           mbY: Int, mbW: Int): Array[Int] =
    if (mbY == 0) Array.fill(4)(127)
    else {
      val row = (mbY * 16 - 1) * stride
      if (mbX + 1 < mbW)
        Array.tabulate(4)(k => plane(row + (mbX + 1) * 16 + k))
      else Array.fill(4)(plane(row + mbW * 16 - 1))
    }

  /** RFC 6386 §12.3 subblock intra prediction: 8 above pixels (A4..A7
    * the above-right), 4 left, 1 corner, with the same frame-edge
    * conventions as the block predictors. `arMb` supplies A4..A7 for
    * right-column subblocks (see [[mbAboveRight]]). */
  private[multimodal] def predict4x4(plane: Array[Int], stride: Int,
                                     bx: Int, by: Int, mode: Int,
                                     arMb: Array[Int],
                                     rightCol: Boolean): Unit = {
    val hasAbove = by > 0
    val hasLeft = bx > 0
    val a = new Array[Int](8)
    var i = 0
    while (i < 4) {
      a(i) = if (hasAbove) plane((by - 1) * stride + bx + i) else 127
      a(4 + i) =
        if (!hasAbove) 127
        else if (rightCol) arMb(i)
        else plane((by - 1) * stride + bx + 4 + i)
      i += 1
    }
    val l = Array.tabulate(4)(r =>
      if (hasLeft) plane((by + r) * stride + bx - 1) else 129)
    val p =
      if (hasAbove && hasLeft) plane((by - 1) * stride + bx - 1)
      else if (hasAbove) 127
      else 129
    // the RD/VR/HD family's 9-pixel edge walk, bottom-left to top-right
    val pp = Array(l(3), l(2), l(1), l(0), p, a(0), a(1), a(2), a(3))
    @inline def avg2(x: Int, y: Int): Int = (x + y + 1) >> 1
    @inline def avg3(x: Int, y: Int, z: Int): Int = (x + 2 * y + z + 2) >> 2
    val out = new Array[Int](16)
    mode match {
      case B_DC =>
        val dc = (a(0) + a(1) + a(2) + a(3) + l(0) + l(1) + l(2) + l(3) +
          4) >> 3
        java.util.Arrays.fill(out, dc)
      case B_TM =>
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) { out(r * 4 + c) = clamp255(l(r) + a(c) - p); c += 1 }
          r += 1
        }
      case B_VE =>
        val x = Array(avg3(p, a(0), a(1)), avg3(a(0), a(1), a(2)),
          avg3(a(1), a(2), a(3)), avg3(a(2), a(3), a(4)))
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) { out(r * 4 + c) = x(c); c += 1 }
          r += 1
        }
      case B_HE =>
        val y = Array(avg3(p, l(0), l(1)), avg3(l(0), l(1), l(2)),
          avg3(l(1), l(2), l(3)), avg3(l(2), l(3), l(3)))
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) { out(r * 4 + c) = y(r); c += 1 }
          r += 1
        }
      case B_LD =>
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) {
            val d = r + c
            out(r * 4 + c) =
              if (d < 6) avg3(a(d), a(d + 1), a(d + 2))
              else avg3(a(6), a(7), a(7))
            c += 1
          }
          r += 1
        }
      case B_RD =>
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) {
            val k = 4 + c - r
            out(r * 4 + c) = avg3(pp(k - 1), pp(k), pp(k + 1))
            c += 1
          }
          r += 1
        }
      case B_VR =>
        out(12) = avg3(pp(1), pp(2), pp(3))
        out(8) = avg3(pp(2), pp(3), pp(4))
        out(13) = avg3(pp(3), pp(4), pp(5)); out(4) = out(13)
        out(9) = avg2(pp(4), pp(5)); out(0) = out(9)
        out(14) = avg3(pp(4), pp(5), pp(6)); out(5) = out(14)
        out(10) = avg2(pp(5), pp(6)); out(1) = out(10)
        out(15) = avg3(pp(5), pp(6), pp(7)); out(6) = out(15)
        out(11) = avg2(pp(6), pp(7)); out(2) = out(11)
        out(7) = avg3(pp(6), pp(7), pp(8))
        out(3) = avg2(pp(7), pp(8))
      case B_VL =>
        out(0) = avg2(a(0), a(1))
        out(4) = avg3(a(0), a(1), a(2))
        out(8) = avg2(a(1), a(2)); out(1) = out(8)
        out(5) = avg3(a(1), a(2), a(3)); out(12) = out(5)
        out(9) = avg2(a(2), a(3)); out(2) = out(9)
        out(13) = avg3(a(2), a(3), a(4)); out(6) = out(13)
        out(10) = avg2(a(3), a(4)); out(3) = out(10)
        out(14) = avg3(a(3), a(4), a(5)); out(7) = out(14)
        out(11) = avg3(a(4), a(5), a(6))
        out(15) = avg3(a(5), a(6), a(7))
      case B_HD =>
        out(12) = avg2(pp(0), pp(1))
        out(13) = avg3(pp(0), pp(1), pp(2))
        out(8) = avg2(pp(1), pp(2)); out(14) = out(8)
        out(9) = avg3(pp(1), pp(2), pp(3)); out(15) = out(9)
        out(10) = avg2(pp(2), pp(3)); out(4) = out(10)
        out(11) = avg3(pp(2), pp(3), pp(4)); out(5) = out(11)
        out(6) = avg2(pp(3), pp(4)); out(0) = out(6)
        out(7) = avg3(pp(3), pp(4), pp(5)); out(1) = out(7)
        out(2) = avg3(pp(4), pp(5), pp(6))
        out(3) = avg3(pp(5), pp(6), pp(7))
      case B_HU =>
        out(0) = avg2(l(0), l(1))
        out(1) = avg3(l(0), l(1), l(2))
        out(2) = avg2(l(1), l(2)); out(4) = out(2)
        out(3) = avg3(l(1), l(2), l(3)); out(5) = out(3)
        out(6) = avg2(l(2), l(3)); out(8) = out(6)
        out(7) = avg3(l(2), l(3), l(3)); out(9) = out(7)
        out(10) = l(3); out(11) = l(3); out(12) = l(3)
        out(13) = l(3); out(14) = l(3); out(15) = l(3)
      case m => sys.error(s"unsupported subblock mode $m")
    }
    var r = 0
    while (r < 4) {
      var c = 0
      while (c < 4) {
        plane((by + r) * stride + bx + c) = out(r * 4 + c); c += 1
      }
      r += 1
    }
  }

  // -------------------------------------------------------- loop filter

  /** RFC 6386 §15 in-loop deblocking, applied as a whole-frame pass
    * after reconstruction (intra prediction reads UNFILTERED pixels;
    * the filter conditions the frame for output/reference). Both
    * filter types: NORMAL (interior-limit + high-edge-variance masks,
    * wide 27/18/9-tap mb-edge kernel, 2-pixel subblock kernel) and
    * SIMPLE (luma only, the common adjust under the edge mask).
    * Per-MB inner (subblock) edges are filtered only when the MB has
    * coded coefficients or is B_PRED — `innerOk`. All arithmetic is the
    * reference decoder's signed-clamp form. */
  private[multimodal] def filterFrame(yP: Array[Int], uP: Array[Int],
      vP: Array[Int], yS: Int, cS: Int, mbW: Int, mbH: Int, level: Int,
      sharpness: Int, simple: Boolean, innerOk: Array[Boolean]): Unit = {
    if (level == 0) return
    var interior = level
    if (sharpness > 0) {
      interior = level >> (if (sharpness > 4) 2 else 1)
      if (interior > 9 - sharpness) interior = 9 - sharpness
    }
    if (interior < 1) interior = 1
    val hevT = if (level >= 40) 2 else if (level >= 15) 1 else 0
    val mbEdge = (level + 2) * 2 + interior
    val subEdge = level * 2 + interior
    @inline def sc(v: Int): Int =
      if (v < -128) -128 else if (v > 127) 127 else v
    // pixels around buf(i) along step: p(k) = i-(k+1)*step, q(k) = i+k*step
    def commonAdjust(buf: Array[Int], i: Int, step: Int,
                     outer: Boolean): Int = {
      val p1 = buf(i - 2 * step) - 128; val p0 = buf(i - step) - 128
      val q0 = buf(i) - 128; val q1 = buf(i + step) - 128
      val a = sc((if (outer) sc(p1 - q1) else 0) + 3 * (q0 - p0))
      val f1 = sc(a + 4) >> 3
      buf(i) = sc(q0 - f1) + 128
      buf(i - step) = sc(p0 + (sc(a + 3) >> 3)) + 128
      f1
    }
    def simpleMask(buf: Array[Int], i: Int, step: Int, lim: Int): Boolean =
      math.abs(buf(i - step) - buf(i)) * 2 +
        math.abs(buf(i - 2 * step) - buf(i + step)) / 2 <= lim
    def normalMask(buf: Array[Int], i: Int, step: Int, lim: Int): Boolean =
      simpleMask(buf, i, step, lim) &&
        math.abs(buf(i - 4 * step) - buf(i - 3 * step)) <= interior &&
        math.abs(buf(i - 3 * step) - buf(i - 2 * step)) <= interior &&
        math.abs(buf(i - 2 * step) - buf(i - step)) <= interior &&
        math.abs(buf(i + step) - buf(i)) <= interior &&
        math.abs(buf(i + 2 * step) - buf(i + step)) <= interior &&
        math.abs(buf(i + 3 * step) - buf(i + 2 * step)) <= interior
    def hev(buf: Array[Int], i: Int, step: Int): Boolean =
      math.abs(buf(i - 2 * step) - buf(i - step)) > hevT ||
        math.abs(buf(i + step) - buf(i)) > hevT
    def subblockF(buf: Array[Int], i: Int, step: Int): Unit =
      if (normalMask(buf, i, step, subEdge)) {
        val h = hev(buf, i, step)
        val f1 = commonAdjust(buf, i, step, h)
        if (!h) {
          val a = (f1 + 1) >> 1
          buf(i + step) = sc(buf(i + step) - 128 - a) + 128
          buf(i - 2 * step) = sc(buf(i - 2 * step) - 128 + a) + 128
        }
      }
    def mbF(buf: Array[Int], i: Int, step: Int): Unit =
      if (normalMask(buf, i, step, mbEdge)) {
        if (hev(buf, i, step)) { commonAdjust(buf, i, step, outer = true); () }
        else {
          val p2 = buf(i - 3 * step) - 128; val p1 = buf(i - 2 * step) - 128
          val p0 = buf(i - step) - 128
          val q0 = buf(i) - 128; val q1 = buf(i + step) - 128
          val q2 = buf(i + 2 * step) - 128
          val w = sc(sc(p1 - q1) + 3 * (q0 - p0))
          var a = sc((27 * w + 63) >> 7)
          buf(i) = sc(q0 - a) + 128
          buf(i - step) = sc(p0 + a) + 128
          a = sc((18 * w + 63) >> 7)
          buf(i + step) = sc(q1 - a) + 128
          buf(i - 2 * step) = sc(p1 + a) + 128
          a = sc((9 * w + 63) >> 7)
          buf(i + 2 * step) = sc(q2 - a) + 128
          buf(i - 3 * step) = sc(p2 + a) + 128
        }
      }
    def simpleF(buf: Array[Int], i: Int, step: Int, lim: Int): Unit =
      if (simpleMask(buf, i, step, lim)) { commonAdjust(buf, i, step, outer = true); () }
    // one vertical edge (column x0, rows y0..y0+n-1) / horizontal edge
    def vEdge(buf: Array[Int], s: Int, x0: Int, y0: Int, n: Int,
              f: (Array[Int], Int, Int) => Unit): Unit = {
      var r = 0
      while (r < n) { f(buf, (y0 + r) * s + x0, 1); r += 1 }
    }
    def hEdge(buf: Array[Int], s: Int, x0: Int, y0: Int, n: Int,
              f: (Array[Int], Int, Int) => Unit): Unit = {
      var c = 0
      while (c < n) { f(buf, y0 * s + x0 + c, s); c += 1 }
    }
    var mbY = 0
    while (mbY < mbH) {
      var mbX = 0
      while (mbX < mbW) {
        val inner = innerOk(mbY * mbW + mbX)
        val yx = mbX * 16; val yy = mbY * 16
        val cx = mbX * 8; val cy = mbY * 8
        if (simple) {
          val mbL = mbEdge
          val sbL = subEdge
          if (mbX > 0)
            vEdge(yP, yS, yx, yy, 16, simpleF(_, _, _, mbL))
          if (inner) {
            var k = 4
            while (k < 16) {
              vEdge(yP, yS, yx + k, yy, 16, simpleF(_, _, _, sbL)); k += 4
            }
          }
          if (mbY > 0)
            hEdge(yP, yS, yx, yy, 16, simpleF(_, _, _, mbL))
          if (inner) {
            var k = 4
            while (k < 16) {
              hEdge(yP, yS, yx, yy + k, 16, simpleF(_, _, _, sbL)); k += 4
            }
          }
        } else {
          if (mbX > 0) {
            vEdge(yP, yS, yx, yy, 16, mbF)
            vEdge(uP, cS, cx, cy, 8, mbF)
            vEdge(vP, cS, cx, cy, 8, mbF)
          }
          if (inner) {
            var k = 4
            while (k < 16) { vEdge(yP, yS, yx + k, yy, 16, subblockF); k += 4 }
            vEdge(uP, cS, cx + 4, cy, 8, subblockF)
            vEdge(vP, cS, cx + 4, cy, 8, subblockF)
          }
          if (mbY > 0) {
            hEdge(yP, yS, yx, yy, 16, mbF)
            hEdge(uP, cS, cx, cy, 8, mbF)
            hEdge(vP, cS, cx, cy, 8, mbF)
          }
          if (inner) {
            var k = 4
            while (k < 16) { hEdge(yP, yS, yx, yy + k, 16, subblockF); k += 4 }
            hEdge(uP, cS, cx, cy + 4, 8, subblockF)
            hEdge(vP, cS, cx, cy + 4, 8, subblockF)
          }
        }
        mbX += 1
      }
      mbY += 1
    }
  }

  /** 16x16-mode -> equivalent subblock mode for neighbor-mode context
    * (the reference decoder's mapping). */
  private def modeToB(ymode: Int): Int = ymode match {
    case DC_PRED => B_DC
    case V_PRED  => B_VE
    case H_PRED  => B_HE
    case TM_PRED => B_TM
    case m       => sys.error(s"no B-mode equivalent for $m")
  }

  // ------------------------------------------------------ token coding

  /** Coefficient token layer shared by encode/decode: per-plane
    * left/above nonzero context, band from position, the after-zero
    * no-EOB rule, category extra bits MSB-first, sign at prob 128. */
  private def decodeCoeffs(bd: BoolDecoder, probs: Array[Array[Array[Array[Int]]]],
                           blockType: Int, firstCoeff: Int,
                           ctx0: Int): (Array[Int], Boolean) = {
    val out = new Array[Int](16)
    var ctx = ctx0
    var i = firstCoeff
    var prevZero = false
    var nonZero = false
    var done = false
    while (i < 16 && !done) {
      val p = probs(blockType)(coeffBands(i))(ctx)
      val sym = bd.tree(tokenTree, p, if (prevZero) 2 else 0)
      if (sym == TOK_EOB) done = true
      else {
        val base = tokenBase(sym)
        val nExtra = tokenExtraBits(sym)
        var v = base
        if (nExtra > 0) {
          var e = 0
          var b = 0
          while (b < nExtra) { e = (e << 1) | bd.bool(catProbs(sym)(b)); b += 1 }
          v = base + e
        }
        if (v != 0 && bd.bool(128) == 1) v = -v
        out(zigzag(i)) = v
        prevZero = v == 0
        ctx = if (v == 0) 0 else if (math.abs(v) == 1) 1 else 2
        if (v != 0) nonZero = true
        i += 1
      }
    }
    (out, nonZero)
  }

  private def encodeCoeffs(be: BoolEncoder, probs: Array[Array[Array[Array[Int]]]],
                           blockType: Int, firstCoeff: Int, ctx0: Int,
                           coeffs: Array[Int]): Boolean = {
    // find last nonzero in zigzag order
    var last = -1
    var i = firstCoeff
    while (i < 16) { if (coeffs(zigzag(i)) != 0) last = i; i += 1 }
    var ctx = ctx0
    var prevZero = false
    i = firstCoeff
    var nonZero = false
    while (i <= last) {
      val v = coeffs(zigzag(i))
      val a = math.abs(v)
      val sym =
        if (a == 0) 1
        else if (a <= 4) a + 1
        else if (a <= 6) 6
        else if (a <= 10) 7
        else if (a <= 18) 8
        else if (a <= 34) 9
        else if (a <= 66) 10
        else 11
      val p = probs(blockType)(coeffBands(i))(ctx)
      be.tree(tokenTree, p, sym, if (prevZero) 2 else 0)
      val nExtra = tokenExtraBits(sym)
      if (nExtra > 0) {
        val e = a - tokenBase(sym)
        var b = nExtra - 1
        var k = 0
        while (b >= 0) { be.bool(catProbs(sym)(k), (e >> b) & 1); b -= 1; k += 1 }
      }
      if (a != 0) be.bool(128, if (v < 0) 1 else 0)
      prevZero = a == 0
      ctx = if (a == 0) 0 else if (a == 1) 1 else 2
      if (a != 0) nonZero = true
      i += 1
    }
    if (last < 15) {
      val p = probs(blockType)(coeffBands(math.max(firstCoeff, last + 1)))(ctx)
      be.tree(tokenTree, p, TOK_EOB, if (prevZero) 2 else 0)
    }
    nonZero
  }

  // ----------------------------------------------------------- decoder

  final case class Frame(width: Int, height: Int, y: Array[Int],
                         u: Array[Int], v: Array[Int])

  /** Decode one VP8 keyframe payload (the 'VP8 ' chunk body). Returns
    * None on non-keyframe, bad start code, or truncated/inconsistent
    * headers. */
  def decode(bytes: Array[Byte]): Option[Frame] = {
    if (bytes.length < 10) return None
    val tag = (bytes(0) & 0xFF) | ((bytes(1) & 0xFF) << 8) |
      ((bytes(2) & 0xFF) << 16)
    val keyframe = (tag & 1) == 0
    val firstPartSize = tag >> 5
    if (!keyframe) return None
    if ((bytes(3) & 0xFF) != 0x9D || (bytes(4) & 0xFF) != 0x01 ||
      (bytes(5) & 0xFF) != 0x2A) return None
    val width = ((bytes(6) & 0xFF) | ((bytes(7) & 0xFF) << 8)) & 0x3FFF
    val height = ((bytes(8) & 0xFF) | ((bytes(9) & 0xFF) << 8)) & 0x3FFF
    if (width == 0 || height == 0) return None
    val mbW = (width + 15) / 16
    val mbH = (height + 15) / 16
    val part0 = 10
    val bd = new BoolDecoder(bytes, part0, part0 + firstPartSize)
    bd.literal(1) // color space
    bd.literal(1) // clamping type
    if (bd.bool(128) == 1) return None // segmentation: not emitted
    val simpleFilter = bd.literal(1) == 1
    val filterLevel = bd.literal(6)
    val sharpness = bd.literal(3)
    if (bd.bool(128) == 1) return None // lf delta: not emitted
    val nParts = 1 << bd.literal(2)
    val yacQi = bd.literal(7)
    val ydcDelta = bd.flaggedDelta(4)
    val y2dcDelta = bd.flaggedDelta(4)
    val y2acDelta = bd.flaggedDelta(4)
    val uvdcDelta = bd.flaggedDelta(4)
    val uvacDelta = bd.flaggedDelta(4)
    // probability updates against the gating table
    val probs = defaultCoeffProbs.map(_.map(_.map(_.clone())))
    var t = 0
    while (t < 4) {
      var b = 0
      while (b < 8) {
        var c = 0
        while (c < 3) {
          var n = 0
          while (n < 11) {
            if (bd.bool(coeffUpdateProbs(t)(b)(c)(n)) == 1)
              probs(t)(b)(c)(n) = bd.literal(8)
            n += 1
          }
          c += 1
        }
        b += 1
      }
      t += 1
    }
    val skipEnabled = bd.bool(128) == 1
    val skipProb = if (skipEnabled) bd.literal(8) else 0
    // token partitions: (nParts-1) 3-byte LE sizes after partition 0
    val sizesAt = part0 + firstPartSize
    if (sizesAt + 3 * (nParts - 1) > bytes.length) return None
    val partStarts = new Array[Int](nParts)
    val partEnds = new Array[Int](nParts)
    var off = sizesAt + 3 * (nParts - 1)
    var pi = 0
    while (pi < nParts) {
      val sz =
        if (pi == nParts - 1) bytes.length - off
        else {
          val s = sizesAt + 3 * pi
          (bytes(s) & 0xFF) | ((bytes(s + 1) & 0xFF) << 8) |
            ((bytes(s + 2) & 0xFF) << 16)
        }
      partStarts(pi) = off
      partEnds(pi) = off + sz
      off += sz
      pi += 1
    }
    if (partEnds(nParts - 1) > bytes.length) return None
    val tokenBd = Array.tabulate(nParts)(p =>
      new BoolDecoder(bytes, partStarts(p), partEnds(p)))
    // mode pass state + reconstruction
    val yStride = mbW * 16
    val cStride = mbW * 8
    val yPlane = new Array[Int](yStride * mbH * 16)
    val uPlane = new Array[Int](cStride * mbH * 8)
    val vPlane = new Array[Int](cStride * mbH * 8)
    // per-4x4-subblock nonzero context, per plane: above[mbW*4], left[4]
    val yAbove = new Array[Int](mbW * 4)
    val uAbove = new Array[Int](mbW * 2)
    val vAbove = new Array[Int](mbW * 2)
    val y2Above = new Array[Int](mbW)
    // subblock-mode context rows (frame edges read as B_DC)
    val bAbove = Array.fill(mbW * 4)(B_DC)
    // per-MB flag: inner (subblock) loop-filter edges apply
    val innerOk = new Array[Boolean](mbW * mbH)
    val q = yacQi
    val dq = Dequant(
      yDc = dcQ(q + ydcDelta), yAc = acQ(q),
      y2Dc = y2dcQ(q + y2dcDelta), y2Ac = y2acQ(q + y2acDelta),
      uvDc = uvdcQ(q + uvdcDelta), uvAc = uvacQ(q + uvacDelta))
    var mbY = 0
    while (mbY < mbH) {
      val tb = tokenBd(mbY % nParts)
      val yLeft = Array(0, 0, 0, 0)
      val uLeft = Array(0, 0)
      val vLeft = Array(0, 0)
      var y2Left = 0
      val bLeft = Array.fill(4)(B_DC)
      var mbX = 0
      while (mbX < mbW) {
        val skip = if (skipEnabled) bd.bool(skipProb) == 1 else false
        val ymode = bd.tree(kfYmodeTree, kfYmodeProbs)
        innerOk(mbY * mbW + mbX) = !skip || ymode == B_PRED
        // B_PRED: 16 subblock modes, each conditioned on the above/left
        // neighbor subblock modes
        val bmodes: Array[Int] =
          if (ymode != B_PRED) null
          else {
            val bm = new Array[Int](16)
            var sb = 0
            while (sb < 16) {
              val sx = sb % 4; val sy = sb / 4
              val am = if (sy > 0) bm(sb - 4) else bAbove(mbX * 4 + sx)
              val lm = if (sx > 0) bm(sb - 1) else bLeft(sy)
              bm(sb) = bd.tree(bModeTree, kfBModeProbs(am)(lm))
              sb += 1
            }
            bm
          }
        val uvmode = bd.tree(uvModeTree, kfUvModeProbs)
        if (ymode == B_PRED) {
          // per-subblock predict-then-reconstruct (later subblocks
          // predict from earlier RECONSTRUCTED pixels); type-3 tokens
          // carry the DC (no Y2 block)
          val ar = mbAboveRight(yPlane, yStride, mbX, mbY, mbW)
          var sb = 0
          while (sb < 16) {
            val sx = sb % 4; val sy = sb / 4
            predict4x4(yPlane, yStride, mbX * 16 + sx * 4,
              mbY * 16 + sy * 4, bmodes(sb), ar, sx == 3)
            if (!skip) {
              val ctx = yLeft(sy) + yAbove(mbX * 4 + sx)
              val (raw, nz) = decodeCoeffs(tb, probs, 3, 0, ctx)
              yLeft(sy) = if (nz) 1 else 0
              yAbove(mbX * 4 + sx) = yLeft(sy)
              val dqc = new Array[Int](16)
              var k = 0
              while (k < 16) {
                dqc(k) = raw(k) * (if (k == 0) dq.yDc else dq.yAc); k += 1
              }
              addResidual(yPlane, yStride, mbX * 16 + sx * 4,
                mbY * 16 + sy * 4, idct4x4(dqc))
            }
            sb += 1
          }
          if (skip) {
            var i = 0
            while (i < 4) { yLeft(i) = 0; yAbove(mbX * 4 + i) = 0; i += 1 }
          }
          // B_PRED has no Y2 block: its nonzero context is left UNTOUCHED
        } else {
          predictBlock(yPlane, yStride, mbX * 16, mbY * 16, 16, ymode)
          if (!skip) {
            // Y2 block (16x16 modes always carry it)
            val ctxY2 = y2Left + y2Above(mbX)
            val (y2raw, y2nz) = decodeCoeffs(tb, probs, 1, 0, ctxY2)
            y2Left = if (y2nz) 1 else 0
            y2Above(mbX) = y2Left
            val y2dq = new Array[Int](16)
            var i = 0
            while (i < 16) {
              y2dq(i) = y2raw(i) * (if (i == 0) dq.y2Dc else dq.y2Ac)
              i += 1
            }
            val subDc = iwht4x4(y2dq)
            // 16 luma subblocks, type 0 (no DC), raster order
            var sb = 0
            while (sb < 16) {
              val sx = sb % 4; val sy = sb / 4
              val ctx = yLeft(sy) + yAbove(mbX * 4 + sx)
              val (raw, nz) = decodeCoeffs(tb, probs, 0, 1, ctx)
              yLeft(sy) = if (nz) 1 else 0
              yAbove(mbX * 4 + sx) = yLeft(sy)
              val dqc = new Array[Int](16)
              var k = 0
              while (k < 16) {
                dqc(k) = raw(k) * (if (k == 0) dq.yDc else dq.yAc); k += 1
              }
              dqc(0) = subDc(sb)
              addResidual(yPlane, yStride, mbX * 16 + sx * 4,
                mbY * 16 + sy * 4, idct4x4(dqc))
              sb += 1
            }
          } else {
            var i = 0
            while (i < 4) { yLeft(i) = 0; yAbove(mbX * 4 + i) = 0; i += 1 }
            y2Left = 0; y2Above(mbX) = 0
          }
        }
        // chroma (identical for both luma paths)
        predictBlock(uPlane, cStride, mbX * 8, mbY * 8, 8, uvmode)
        predictBlock(vPlane, cStride, mbX * 8, mbY * 8, 8, uvmode)
        if (!skip) {
          decodeChroma(tb, probs, uPlane, cStride, mbX, mbY, uLeft, uAbove,
            dq)
          decodeChroma(tb, probs, vPlane, cStride, mbX, mbY, vLeft, vAbove,
            dq)
        } else {
          uLeft(0) = 0; uLeft(1) = 0; vLeft(0) = 0; vLeft(1) = 0
          uAbove(mbX * 2) = 0; uAbove(mbX * 2 + 1) = 0
          vAbove(mbX * 2) = 0; vAbove(mbX * 2 + 1) = 0
        }
        // subblock-mode context for the next MBs
        if (ymode == B_PRED) {
          var i = 0
          while (i < 4) {
            bAbove(mbX * 4 + i) = bmodes(12 + i)
            bLeft(i) = bmodes(i * 4 + 3)
            i += 1
          }
        } else {
          val eq = modeToB(ymode)
          var i = 0
          while (i < 4) {
            bAbove(mbX * 4 + i) = eq; bLeft(i) = eq; i += 1
          }
        }
        mbX += 1
      }
      mbY += 1
    }
    // in-loop deblocking on the padded reconstruction (intra prediction
    // above already read the unfiltered pixels), then crop
    filterFrame(yPlane, uPlane, vPlane, yStride, cStride, mbW, mbH,
      filterLevel, sharpness, simpleFilter, innerOk)
    Some(Frame(width, height,
      crop(yPlane, yStride, width, height),
      crop(uPlane, cStride, (width + 1) / 2, (height + 1) / 2),
      crop(vPlane, cStride, (width + 1) / 2, (height + 1) / 2)))
  }

  private final case class Dequant(yDc: Int, yAc: Int, y2Dc: Int, y2Ac: Int,
                                   uvDc: Int, uvAc: Int)

  private def decodeChroma(tb: BoolDecoder,
                           probs: Array[Array[Array[Array[Int]]]],
                           plane: Array[Int], stride: Int, mbX: Int,
                           mbY: Int, left: Array[Int], above: Array[Int],
                           dq: Dequant): Unit = {
    var sb = 0
    while (sb < 4) {
      val sx = sb % 2; val sy = sb / 2
      val ctx = left(sy) + above(mbX * 2 + sx)
      val (raw, nz) = decodeCoeffs(tb, probs, 2, 0, ctx)
      left(sy) = if (nz) 1 else 0
      above(mbX * 2 + sx) = left(sy)
      val dqc = new Array[Int](16)
      var k = 0
      while (k < 16) {
        dqc(k) = raw(k) * (if (k == 0) dq.uvDc else dq.uvAc); k += 1
      }
      addResidual(plane, stride, mbX * 8 + sx * 4, mbY * 8 + sy * 4,
        idct4x4(dqc))
      sb += 1
    }
  }

  private def addResidual(plane: Array[Int], stride: Int, x0: Int, y0: Int,
                          res: Array[Int]): Unit = {
    var y = 0
    while (y < 4) {
      var x = 0
      while (x < 4) {
        val p = (y0 + y) * stride + x0 + x
        plane(p) = clamp255(plane(p) + res(y * 4 + x))
        x += 1
      }
      y += 1
    }
  }

  private def crop(plane: Array[Int], stride: Int, w: Int,
                   h: Int): Array[Int] = {
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      System.arraycopy(plane, y * stride, out, y * w, w)
      y += 1
    }
    out
  }

  // ----------------------------------------------------------- encoder

  /** Per-macroblock encoder input: intra modes plus RAW (pre-dequant)
    * coefficient blocks in raster order — y2 (16), y (16x16), u/v (4x16
    * each). For `ymode == B_PRED`, `bmodes` holds the 16 subblock modes
    * and y2 is ignored (no second-order block; the y blocks carry their
    * own DCs). The encoder quantizes nothing: callers hand it integer
    * coefficient LEVELS; reconstruction is exactly what the decoder
    * computes, returned alongside the bytes. */
  final case class MbSpec(ymode: Int, uvmode: Int,
                          y2: Array[Int] = new Array[Int](16),
                          y: Array[Array[Int]] = Array.fill(16)(new Array[Int](16)),
                          u: Array[Array[Int]] = Array.fill(4)(new Array[Int](16)),
                          v: Array[Array[Int]] = Array.fill(4)(new Array[Int](16)),
                          bmodes: Array[Int] = null)

  final case class EncodeOpts(qIndex: Int = 20, yDcDelta: Int = 0,
                              y2DcDelta: Int = 0, y2AcDelta: Int = 0,
                              uvDcDelta: Int = 0, uvAcDelta: Int = 0,
                              tokenPartitions: Int = 1,
                              skipEnabled: Boolean = true,
                              skipProb: Int = 128,
                              filterLevel: Int = 0,
                              sharpness: Int = 0,
                              simpleFilter: Boolean = false,
                              probUpdates: Seq[((Int, Int, Int, Int), Int)] =
                                Nil)

  /** Encode a keyframe from per-MB specs (raster order, mbW*mbH of
    * them). Returns (payload bytes, decoder-exact reconstruction). */
  def encode(width: Int, height: Int, mbs: Array[MbSpec],
             opts: EncodeOpts = EncodeOpts()): (Array[Byte], Frame) = {
    val mbW = (width + 15) / 16
    val mbH = (height + 15) / 16
    require(mbs.length == mbW * mbH, "one MbSpec per macroblock")
    val nParts = opts.tokenPartitions
    require(nParts == 1 || nParts == 2 || nParts == 4 || nParts == 8)
    // coefficient-probability updates: the header emits flag+literal per
    // listed position (gated by the update table, as the decoder reads
    // them), and token coding then uses the UPDATED probabilities — the
    // two sides must agree or every later bool desyncs
    val updMap = opts.probUpdates.toMap
    val probs =
      if (updMap.isEmpty) defaultCoeffProbs
      else {
        val p = defaultCoeffProbs.map(_.map(_.map(_.clone())))
        updMap.foreach { case ((t, b, c, n), v) => p(t)(b)(c)(n) = v }
        p
      }
    // precompute skip flags: a MB skips iff all its coded coefficients
    // are 0 (B_PRED has no Y2 block, so its y2 spec is not coded)
    val allZero = mbs.map(m =>
      (m.ymode == B_PRED || m.y2.forall(_ == 0)) &&
        m.y.forall(_.forall(_ == 0)) && m.u.forall(_.forall(_ == 0)) &&
        m.v.forall(_.forall(_ == 0)))
    // ---- first partition: header + modes
    val be = new BoolEncoder
    be.literal(0, 1) // color space
    be.literal(0, 1) // clamping
    be.bool(128, 0) // segmentation off
    be.literal(if (opts.simpleFilter) 1 else 0, 1)
    be.literal(opts.filterLevel, 6)
    be.literal(opts.sharpness, 3)
    be.bool(128, 0) // lf deltas off
    be.literal(Integer.numberOfTrailingZeros(nParts), 2)
    be.literal(opts.qIndex, 7)
    be.flaggedDelta(opts.yDcDelta, 4)
    be.flaggedDelta(opts.y2DcDelta, 4)
    be.flaggedDelta(opts.y2AcDelta, 4)
    be.flaggedDelta(opts.uvDcDelta, 4)
    be.flaggedDelta(opts.uvAcDelta, 4)
    var t = 0
    while (t < 4 * 8 * 3 * 11) {
      val key = (t / 264, (t / 33) % 8, (t / 11) % 3, t % 11)
      val gate = coeffUpdateProbs(key._1)(key._2)(key._3)(key._4)
      updMap.get(key) match {
        case Some(v) => be.bool(gate, 1); be.literal(v, 8)
        case None    => be.bool(gate, 0)
      }
      t += 1
    }
    if (opts.skipEnabled) { be.bool(128, 1); be.literal(opts.skipProb, 8) }
    else be.bool(128, 0)
    val bAboveE = Array.fill(mbW * 4)(B_DC)
    var mbY0 = 0
    while (mbY0 < mbH) {
      val bLeftE = Array.fill(4)(B_DC)
      var mbX0 = 0
      while (mbX0 < mbW) {
        val m = mbs(mbY0 * mbW + mbX0)
        if (opts.skipEnabled)
          be.bool(opts.skipProb, if (allZero(mbY0 * mbW + mbX0)) 1 else 0)
        be.tree(kfYmodeTree, kfYmodeProbs, m.ymode)
        if (m.ymode == B_PRED) {
          require(m.bmodes != null && m.bmodes.length == 16,
            "B_PRED MbSpec needs 16 subblock modes")
          var sb = 0
          while (sb < 16) {
            val sx = sb % 4; val sy = sb / 4
            val am =
              if (sy > 0) m.bmodes(sb - 4) else bAboveE(mbX0 * 4 + sx)
            val lm = if (sx > 0) m.bmodes(sb - 1) else bLeftE(sy)
            be.tree(bModeTree, kfBModeProbs(am)(lm), m.bmodes(sb))
            sb += 1
          }
        }
        be.tree(uvModeTree, kfUvModeProbs, m.uvmode)
        if (m.ymode == B_PRED) {
          var i = 0
          while (i < 4) {
            bAboveE(mbX0 * 4 + i) = m.bmodes(12 + i)
            bLeftE(i) = m.bmodes(i * 4 + 3)
            i += 1
          }
        } else {
          val eq = modeToB(m.ymode)
          var i = 0
          while (i < 4) { bAboveE(mbX0 * 4 + i) = eq; bLeftE(i) = eq; i += 1 }
        }
        mbX0 += 1
      }
      mbY0 += 1
    }
    val part0 = be.bytes()
    // ---- token partitions (MB row i -> partition i % nParts)
    val tokenBe = Array.fill(nParts)(new BoolEncoder)
    val yAbove = new Array[Int](mbW * 4)
    val uAbove = new Array[Int](mbW * 2)
    val vAbove = new Array[Int](mbW * 2)
    val y2Above = new Array[Int](mbW)
    var mbY = 0
    while (mbY < mbH) {
      val tbE = tokenBe(mbY % nParts)
      val yLeft = Array(0, 0, 0, 0)
      val uLeft = Array(0, 0)
      val vLeft = Array(0, 0)
      var y2Left = 0
      var mbX = 0
      while (mbX < mbW) {
        val m = mbs(mbY * mbW + mbX)
        val bpred = m.ymode == B_PRED
        val skipped = opts.skipEnabled && allZero(mbY * mbW + mbX)
        if (!skipped) {
          if (!bpred) {
            val ctxY2 = y2Left + y2Above(mbX)
            val nzY2 = encodeCoeffs(tbE, probs, 1, 0, ctxY2, m.y2)
            y2Left = if (nzY2) 1 else 0
            y2Above(mbX) = y2Left
          }
          // B_PRED: type 3 (Y with DC), no Y2; 16x16 modes: type 0
          val (yType, yFirst) = if (bpred) (3, 0) else (0, 1)
          var sb = 0
          while (sb < 16) {
            val sx = sb % 4; val sy = sb / 4
            val ctx = yLeft(sy) + yAbove(mbX * 4 + sx)
            val nz = encodeCoeffs(tbE, probs, yType, yFirst, ctx, m.y(sb))
            yLeft(sy) = if (nz) 1 else 0
            yAbove(mbX * 4 + sx) = yLeft(sy)
            sb += 1
          }
          var cb = 0
          while (cb < 4) {
            val sx = cb % 2; val sy = cb / 2
            val cu = uLeft(sy) + uAbove(mbX * 2 + sx)
            val nzu = encodeCoeffs(tbE, probs, 2, 0, cu, m.u(cb))
            uLeft(sy) = if (nzu) 1 else 0
            uAbove(mbX * 2 + sx) = uLeft(sy)
            cb += 1
          }
          cb = 0
          while (cb < 4) {
            val sx = cb % 2; val sy = cb / 2
            val cv = vLeft(sy) + vAbove(mbX * 2 + sx)
            val nzv = encodeCoeffs(tbE, probs, 2, 0, cv, m.v(cb))
            vLeft(sy) = if (nzv) 1 else 0
            vAbove(mbX * 2 + sx) = vLeft(sy)
            cb += 1
          }
        } else {
          var i = 0
          while (i < 4) { yLeft(i) = 0; yAbove(mbX * 4 + i) = 0; i += 1 }
          uLeft(0) = 0; uLeft(1) = 0; vLeft(0) = 0; vLeft(1) = 0
          uAbove(mbX * 2) = 0; uAbove(mbX * 2 + 1) = 0
          vAbove(mbX * 2) = 0; vAbove(mbX * 2 + 1) = 0
          // a skipped B_PRED MB leaves the Y2 context untouched (no Y2)
          if (!bpred) { y2Left = 0; y2Above(mbX) = 0 }
        }
        mbX += 1
      }
      mbY += 1
    }
    val parts = tokenBe.map(_.bytes())
    // ---- assemble: tag, start code, dims, part0, sizes, parts
    val out = new java.io.ByteArrayOutputStream()
    val tag = part0.length << 5 // keyframe, version 0, show_frame 0
    out.write(tag & 0xFF); out.write((tag >> 8) & 0xFF)
    out.write((tag >> 16) & 0xFF)
    out.write(0x9D); out.write(0x01); out.write(0x2A)
    out.write(width & 0xFF); out.write((width >> 8) & 0x3F)
    out.write(height & 0xFF); out.write((height >> 8) & 0x3F)
    out.write(part0, 0, part0.length)
    var p = 0
    while (p < nParts - 1) {
      val sz = parts(p).length
      out.write(sz & 0xFF); out.write((sz >> 8) & 0xFF)
      out.write((sz >> 16) & 0xFF)
      p += 1
    }
    parts.foreach(b => out.write(b, 0, b.length))
    val bytes = out.toByteArray
    val recon = decode(bytes).getOrElse(
      sys.error("encoder produced an undecodable stream"))
    (bytes, recon)
  }

  /** Wrap a VP8 keyframe payload in a genuine RIFF/WEBP container. */
  def container(payload: Array[Byte]): Array[Byte] = {
    val chunkLen = payload.length
    val padded = if (chunkLen % 2 == 1) payload :+ 0.toByte else payload
    val riffLen = 4 + 8 + padded.length
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
      out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
    }
    out.write("RIFF".getBytes("US-ASCII"))
    le32(riffLen)
    out.write("WEBP".getBytes("US-ASCII"))
    out.write("VP8 ".getBytes("US-ASCII"))
    le32(chunkLen)
    out.write(padded, 0, padded.length)
    out.toByteArray
  }

  /** Extract the 'VP8 ' chunk payload from a RIFF/WEBP container. */
  def vp8Payload(bytes: Array[Byte]): Option[Array[Byte]] = {
    if (bytes.length < 20 ||
      new String(bytes, 0, 4, "US-ASCII") != "RIFF" ||
      new String(bytes, 8, 4, "US-ASCII") != "WEBP") return None
    var p = 12
    while (p + 8 <= bytes.length) {
      val fourcc = new String(bytes, p, 4, "US-ASCII")
      val len = (bytes(p + 4) & 0xFF) | ((bytes(p + 5) & 0xFF) << 8) |
        ((bytes(p + 6) & 0xFF) << 16) | ((bytes(p + 7) & 0xFF) << 24)
      if (fourcc == "VP8 ") {
        if (p + 8 + len > bytes.length) return None
        return Some(java.util.Arrays.copyOfRange(bytes, p + 8, p + 8 + len))
      }
      p += 8 + len + (len & 1)
    }
    None
  }
}
