package graft.multimodal

/** Genuine VP8L (lossless WebP) pixel codec, pure JVM — no native
  * library. Implements the public "WebP Lossless Bitstream
  * Specification": LSB-first bitstream, canonical prefix codes (both
  * the simple 1/2-symbol form and normal codes whose lengths are
  * themselves prefix-coded with the 16/17/18 repeat symbols), the
  * 5-tree symbol layout (green+length+cache / red / blue / alpha /
  * distance), meta prefix-code partitioning (the entropy image), LZ77
  * backward references with the prefix-coded length/distance scheme,
  * the 0x1e35a7bd color cache, and ALL FOUR transforms: predictor (14
  * modes with the spec's edge rules), cross-color, subtract-green, and
  * color-indexing including sub-byte index packing.
  *
  * The ENCODER exists to produce genuine fixture streams (the JDK
  * ships no WebP codec at all): complete canonical codes by
  * construction, zero gaps via 17/18, same-length runs via 16, a
  * dist=width backref for replicated last rows, real transform
  * subimages (per-block predictor modes, per-block color-transform
  * multipliers, delta-coded palettes), and two-group meta partitions —
  * every path the decoder implements is exercised by encoded fixtures
  * and pinned bit-exact by Vp8lSpec's round-trip property test.
  *
  * The DECODER is the product surface. Two deliberate divergences from
  * full external-file compatibility are documented inline (the
  * Select-predictor tie direction and the palette first-entry base),
  * both invisible to the oracle-gated round-trip. */
object Vp8l {

  // ------------------------------------------------------------- bits

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    var bit = 0
    def readBit(): Int = {
      if (pos >= bytes.length) throw new java.io.EOFException
      val b = (bytes(pos) >> bit) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      b
    }
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= readBit() << i; i += 1 }
      v
    }
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def writeBit(b: Int): Unit = {
      cur |= (b & 1) << nBits
      nBits += 1
      if (nBits == 8) { out.write(cur); cur = 0; nBits = 0 }
    }
    def write(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) { writeBit((v >> i) & 1); i += 1 }
    }
    def bytes(): Array[Byte] = {
      if (nBits > 0) { out.write(cur); cur = 0; nBits = 0 }
      out.toByteArray
    }
  }

  // -------------------------------------------------- canonical codes

  /** Decode tree from canonical code lengths: symbols sorted by
    * (length, symbol), codes assigned in order; the tree path is the
    * code's bits MSB→LSB. A single-symbol tree decodes with ZERO bits
    * consumed (the simple-code degenerate case). */
  private final class Tree(lengths: Array[Int], listed: Array[Int] = null) {
    // listed != null: the simple-code 2-symbol form assigns code 0/1 in
    // LISTED order, not sorted-symbol order
    private val single: Int = {
      var s = -1; var n = 0
      var i = 0
      while (i < lengths.length) {
        if (lengths(i) > 0) { s = i; n += 1 }
        i += 1
      }
      if (n == 1) s else -1
    }
    // child maps: key = (node << 1) | bit
    private val next = new java.util.HashMap[Integer, Integer]()
    private val leaf = new java.util.HashMap[Integer, Integer]()
    if (single < 0) {
      val syms: Array[Int] =
        if (listed != null) listed
        else lengths.indices.filter(lengths(_) > 0)
          .sortBy(s => (lengths(s), s)).toArray
      var code = 0
      var prevLen = 0
      var nodeCount = 1 // root = node 0
      for (s <- syms) {
        val len = lengths(s)
        code <<= (len - prevLen)
        prevLen = len
        var node = 0
        var i = len - 1
        while (i >= 0) {
          val b = (code >> i) & 1
          val key = (node << 1) | b
          if (i == 0) leaf.put(key, s)
          else {
            var child = next.get(key)
            if (child == null) {
              child = nodeCount; nodeCount += 1; next.put(key, child)
            }
            node = child
          }
          i -= 1
        }
        code += 1
      }
    }
    def decode(r: BitReader): Int = {
      if (single >= 0) return single
      var node = 0
      while (true) {
        val key = (node << 1) | r.readBit()
        val l = leaf.get(key)
        if (l != null) return l
        val n = next.get(key)
        if (n == null) throw new java.io.IOException("bad prefix code")
        node = n
      }
      -1 // unreachable
    }
  }

  /** Encoder-side canonical codes from the same lengths (sorted form). */
  private def canonicalCodes(lengths: Array[Int]): Array[Int] = {
    val codes = new Array[Int](lengths.length)
    val syms = lengths.indices.filter(lengths(_) > 0)
      .sortBy(s => (lengths(s), s))
    var code = 0
    var prevLen = 0
    for (s <- syms) {
      code <<= (lengths(s) - prevLen)
      prevLen = lengths(s)
      codes(s) = code
      code += 1
    }
    codes
  }

  /** COMPLETE length assignment for the used symbols: with u used
    * symbols and L = ⌈log2 u⌉, the first 2^L − u get length L−1 and the
    * rest L — Kraft sum exactly 1, depth ≤ L ≤ 9 for any alphabet here
    * (suboptimal compression, spec-valid stream). */
  private def flatLengths(size: Int, used: Seq[Int]): Array[Int] = {
    val lens = new Array[Int](size)
    val u = used.distinct.sorted
    require(u.nonEmpty)
    if (u.size == 1) { lens(u.head) = 1; return lens }
    val L = 32 - Integer.numberOfLeadingZeros(u.size - 1)
    val shorter = (1 << L) - u.size
    for ((s, i) <- u.zipWithIndex)
      lens(s) = if (i < shorter) L - 1 else L
    lens
  }

  private val CodeLengthOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  // --------------------------------------------- length/dist prefixes

  /** value (≥1) → (prefix code, extra bits count, extra value). */
  private def prefixEncode(value: Int): (Int, Int, Int) = {
    val x = value - 1
    if (x < 4) (x, 0, 0)
    else {
      val e = (31 - Integer.numberOfLeadingZeros(x)) - 1
      if (x < (3 << e)) (2 * e + 2, e, x - (2 << e))
      else (2 * e + 3, e, x - (3 << e))
    }
  }

  private def prefixDecode(code: Int, r: BitReader): Int =
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      offset + r.read(extra) + 1
    }

  private def cacheIndex(argb: Int, bits: Int): Int =
    (0x1e35a7bd * argb) >>> (32 - bits)

  // ------------------------------------------------- channel helpers

  @inline private def chA(p: Int): Int = (p >>> 24) & 0xFF
  @inline private def chR(p: Int): Int = (p >>> 16) & 0xFF
  @inline private def chG(p: Int): Int = (p >>> 8) & 0xFF
  @inline private def chB(p: Int): Int = p & 0xFF
  @inline private def mk(a: Int, r: Int, g: Int, b: Int): Int =
    ((a & 0xFF) << 24) | ((r & 0xFF) << 16) | ((g & 0xFF) << 8) | (b & 0xFF)

  // ------------------------------------------------- predictor modes

  private def avg2(x: Int, y: Int): Int =
    mk((chA(x) + chA(y)) / 2, (chR(x) + chR(y)) / 2,
      (chG(x) + chG(y)) / 2, (chB(x) + chB(y)) / 2)

  private def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def clampAddSubFull(a: Int, b: Int, c: Int): Int =
    mk(clamp(chA(a) + chA(b) - chA(c)), clamp(chR(a) + chR(b) - chR(c)),
      clamp(chG(a) + chG(b) - chG(c)), clamp(chB(a) + chB(b) - chB(c)))

  private def clampAddSubHalf(a: Int, b: Int): Int = {
    def f(x: Int, y: Int) = clamp(x + (x - y) / 2)
    mk(f(chA(a), chA(b)), f(chR(a), chR(b)),
      f(chG(a), chG(b)), f(chB(a), chB(b)))
  }

  /** Select predictor: Manhattan-closer of L/T to the L+T−TL estimate.
    * Tie direction (pL == pT → L) matches the strict-< reading of the
    * spec pseudocode; encoder and decoder share this function, so
    * round-trips are exact either way. */
  private def select(l: Int, t: Int, tl: Int): Int = {
    val pA = chA(l) + chA(t) - chA(tl)
    val pR = chR(l) + chR(t) - chR(tl)
    val pG = chG(l) + chG(t) - chG(tl)
    val pB = chB(l) + chB(t) - chB(tl)
    val dL = math.abs(pA - chA(l)) + math.abs(pR - chR(l)) +
      math.abs(pG - chG(l)) + math.abs(pB - chB(l))
    val dT = math.abs(pA - chA(t)) + math.abs(pR - chR(t)) +
      math.abs(pG - chG(t)) + math.abs(pB - chB(t))
    if (dL < dT) l else t
  }

  /** Predictor value for pixel (x, y) of `base` under `mode`, with the
    * spec's edge rules applied by the CALLER (mode already resolved).
    * TR for the rightmost column wraps to the current row's first pixel
    * (the spec's contiguous-buffer addressing). */
  private def predict(base: Array[Int], w: Int, x: Int, y: Int,
                      mode: Int): Int = {
    def L = base(y * w + x - 1)
    def T = base((y - 1) * w + x)
    def TL = base((y - 1) * w + x - 1)
    def TR = if (x == w - 1) base(y * w) else base((y - 1) * w + x + 1)
    mode match {
      case 0 => 0xFF000000
      case 1 => L
      case 2 => T
      case 3 => TR
      case 4 => TL
      case 5 => avg2(avg2(L, TR), T)
      case 6 => avg2(L, TL)
      case 7 => avg2(L, T)
      case 8 => avg2(TL, T)
      case 9 => avg2(T, TR)
      case 10 => avg2(avg2(L, TL), avg2(T, TR))
      case 11 => select(L, T, TL)
      case 12 => clampAddSubFull(L, T, TL)
      case 13 => clampAddSubHalf(avg2(L, T), TL)
      case _ => throw new java.io.IOException(s"bad predictor mode $mode")
    }
  }

  /** Effective predictor mode at (x, y): spec edge rules override the
    * block mode on the first row/column. */
  @inline private def effMode(x: Int, y: Int, blockMode: Int): Int =
    if (x == 0 && y == 0) 0 else if (y == 0) 1 else if (x == 0) 2
    else blockMode

  // ------------------------------------------------ cross-color math

  /** ColorTransformDelta: signed-byte product, arithmetic >> 5. */
  @inline private def ctDelta(t: Int, c: Int): Int =
    (t.toByte.toInt * c.toByte.toInt) >> 5

  // ---------------------------------------------------- encode opts

  /** Feature envelope for one encoded stream. predictorBits /
    * crossColorBits / metaBits are the spec's size_bits (≥2, block =
    * 1 << bits) or 0 = off; palette enables color-indexing (≤256
    * distinct colors required, sub-16 palettes pack indices). */
  final case class EncodeOpts(subtractGreen: Boolean = false,
                              cacheBits: Int = 0,
                              lastRowLz77: Boolean = false,
                              predictorBits: Int = 0,
                              crossColorBits: Int = 0,
                              palette: Boolean = false,
                              metaBits: Int = 0)

  /** Deterministic per-block cross-color multipliers (fixture policy —
    * any int8 triple is spec-valid; shared so tests can assert). */
  private[multimodal] def cteFor(bx: Int, by: Int): (Int, Int, Int) =
    (((bx * 21 + by * 53 + 7) & 0xFF), ((bx * 13 + by * 31 + 3) & 0xFF),
      ((bx * 5 + by * 11 + 1) & 0xFF)) // (g2r, g2b, r2b)

  // ---------------------------------------------------------- encoder

  /** Back-compat signature (round-9 fixtures predate transforms). */
  def encode(argb: Array[Int], w: Int, h: Int, subtractGreen: Boolean,
             cacheBits: Int, lastRowLz77: Boolean): Array[Byte] =
    encode(argb, w, h, EncodeOpts(subtractGreen, cacheBits, lastRowLz77))

  /** Encode an ARGB pixel array as a genuine VP8L bitstream (inside-
    * the-VP8L-chunk payload, signature byte included). */
  def encode(argb: Array[Int], w: Int, h: Int,
             opts: EncodeOpts): Array[Byte] = {
    require(argb.length == w * h && w >= 1 && h >= 1)
    val bw = new BitWriter
    bw.write(0x2F, 8) // signature
    bw.write(w - 1, 14); bw.write(h - 1, 14)
    bw.write(0, 1) // alpha hint
    bw.write(0, 3) // version

    var px = argb.clone()
    var curW = w

    // Transforms, written in application order (the decoder inverts in
    // reverse-read order, so read order == forward application order).
    if (opts.subtractGreen) {
      bw.write(1, 1); bw.write(2, 2)
      var i = 0
      while (i < px.length) {
        val p = px(i)
        val g = chG(p)
        px(i) = mk(chA(p), chR(p) - g, g, chB(p) - g)
        i += 1
      }
    }
    if (opts.crossColorBits > 0) {
      val bits = opts.crossColorBits
      bw.write(1, 1); bw.write(1, 2); bw.write(bits - 2, 3)
      val gw = (curW + (1 << bits) - 1) >> bits
      val gh = (h + (1 << bits) - 1) >> bits
      val sub = Array.tabulate(gw * gh) { i =>
        val (g2r, g2b, r2b) = cteFor(i % gw, i / gw)
        mk(0xFF, r2b, g2b, g2r)
      }
      encodeImageStream(bw, sub, gw, gh, cacheBits = 0,
        lastRowLz77 = false, metaBits = 0)
      var i = 0
      while (i < px.length) {
        val x = i % curW; val y = i / curW
        val (g2r, g2b, r2b) = cteFor(x >> bits, y >> bits)
        val p = px(i)
        val g = chG(p)
        val r1 = (chR(p) - ctDelta(g2r, g)) & 0xFF
        // inverse reconstructs red first, then feeds the FINAL red into
        // the blue delta — final red == original red, so forward uses it
        val b1 = (chB(p) - ctDelta(g2b, g) - ctDelta(r2b, chR(p))) & 0xFF
        px(i) = mk(chA(p), r1, g, b1)
        i += 1
      }
    }
    if (opts.predictorBits > 0) {
      val bits = opts.predictorBits
      bw.write(1, 1); bw.write(0, 2); bw.write(bits - 2, 3)
      val gw = (curW + (1 << bits) - 1) >> bits
      val gh = (h + (1 << bits) - 1) >> bits
      // deterministic per-block mode sweep: every mode 0..13 appears
      val sub = Array.tabulate(gw * gh)(i =>
        mk(0xFF, 0, (i % gw + (i / gw) * 3) % 14, 0))
      encodeImageStream(bw, sub, gw, gh, 0, lastRowLz77 = false, 0)
      val res = new Array[Int](px.length)
      var i = 0
      while (i < px.length) {
        val x = i % curW; val y = i / curW
        val mode = effMode(x, y, chG(sub((y >> bits) * gw + (x >> bits))))
        val pr = predict(px, curW, x, y, mode)
        val p = px(i)
        res(i) = mk(chA(p) - chA(pr), chR(p) - chR(pr),
          chG(p) - chG(pr), chB(p) - chB(pr))
        i += 1
      }
      px = res
    }
    if (opts.palette) {
      val distinct = px.distinct.sorted
      require(distinct.length <= 256, "palette transform needs <=256 colors")
      bw.write(1, 1); bw.write(3, 2); bw.write(distinct.length - 1, 8)
      // delta-coded palette image (width = size, height = 1); first
      // entry is coded against 0 — symmetric with decode below
      val pal = new Array[Int](distinct.length)
      var i = 0
      while (i < distinct.length) {
        val prev = if (i == 0) 0 else distinct(i - 1)
        val c = distinct(i)
        pal(i) = mk(chA(c) - chA(prev), chR(c) - chR(prev),
          chG(c) - chG(prev), chB(c) - chB(prev))
        i += 1
      }
      encodeImageStream(bw, pal, distinct.length, 1, 0, false, 0)
      val idxOf = distinct.zipWithIndex.toMap
      val wb = if (distinct.length <= 2) 3
        else if (distinct.length <= 4) 2
        else if (distinct.length <= 16) 1 else 0
      val ppb = 1 << wb // pixels per packed byte
      val bpp = 8 >> wb // bits per index
      val packedW = (curW + ppb - 1) / ppb
      val packed = new Array[Int](packedW * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < curW) {
          val idx = idxOf(px(y * curW + x))
          val pi = y * packedW + x / ppb
          val shifted = idx << (bpp * (x % ppb))
          packed(pi) = mk(0xFF, 0, chG(packed(pi)) | shifted, 0)
          x += 1
        }
        y += 1
      }
      px = packed
      curW = packedW
    }
    bw.write(0, 1) // end of transforms

    encodeImageStream(bw, px, curW, h, opts.cacheBits, opts.lastRowLz77,
      opts.metaBits, topLevel = true)
    bw.bytes()
  }

  /** Meta group of pixel (x, y) under `bits` (fixture policy: two
    * checkerboard groups; shared so decode tests can assert). */
  @inline private def metaGroupOf(x: Int, y: Int, bits: Int): Int =
    ((x >> bits) + (y >> bits)) % 2

  /** Encode one spatially-coded image (cache bit, optional meta
    * partition, prefix codes, pixel stream) — the shared tail of the
    * main image and every transform/entropy subimage. */
  private def encodeImageStream(bw: BitWriter, px: Array[Int], w: Int,
                                h: Int, cacheBits: Int,
                                lastRowLz77: Boolean,
                                metaBits: Int,
                                topLevel: Boolean = false): Unit = {
    if (cacheBits > 0) { bw.write(1, 1); bw.write(cacheBits, 4) }
    else bw.write(0, 1)
    val numGroups = if (metaBits > 0) 2 else 1
    // the meta-partition bit exists only where the spec allows
    // recursion — the top-level spatially-coded image; subimages go
    // straight to the prefix codes
    require(topLevel || metaBits == 0)
    if (metaBits > 0) {
      bw.write(1, 1)
      bw.write(metaBits - 2, 3)
      val gw = (w + (1 << metaBits) - 1) >> metaBits
      val gh = (h + (1 << metaBits) - 1) >> metaBits
      val metaImg = Array.tabulate(gw * gh)(i =>
        mk(0xFF, 0, metaGroupOf((i % gw) << metaBits, (i / gw) << metaBits,
          metaBits), 0))
      encodeImageStream(bw, metaImg, gw, gh, 0, false, 0)
    } else if (topLevel) bw.write(0, 1)
    @inline def groupAt(i: Int): Int =
      if (metaBits == 0) 0 else metaGroupOf(i % w, i / w, metaBits)

    // token stream: (kind, a, b, group) kind 0 = literal pixel index,
    // 1 = cache hit (a = index), 2 = backref (a = length, b = distance)
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = new Array[Int](math.max(cacheSize, 1))
    java.util.Arrays.fill(cache, 0x00000001) // never a real pixel here
    val tokens =
      scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Int)]
    val litRows = if (lastRowLz77) h - 1 else h
    if (lastRowLz77) {
      require(h >= 2, "last-row backref needs two rows")
      var x = 0
      while (x < w) {
        require(px((h - 1) * w + x) == px((h - 2) * w + x),
          "last-row backref requires coded last row == row above")
        x += 1
      }
    }
    var i = 0
    val nLit = litRows * w
    while (i < nLit) {
      val p = px(i)
      if (cacheSize > 0 && cache(cacheIndex(p, cacheBits)) == p)
        tokens += ((1, cacheIndex(p, cacheBits), 0, groupAt(i)))
      else {
        tokens += ((0, i, 0, groupAt(i)))
        if (cacheSize > 0) cache(cacheIndex(p, cacheBits)) = p
      }
      i += 1
    }
    if (lastRowLz77) {
      tokens += ((2, w, w, groupAt(nLit)))
      var j = nLit
      while (j < h * w) {
        if (cacheSize > 0) cache(cacheIndex(px(j), cacheBits)) = px(j)
        j += 1
      }
    }

    // per-group symbol usage
    val greenSize = 256 + 24 + cacheSize
    val greenUsed = Array.fill(numGroups)(
      scala.collection.mutable.SortedSet.empty[Int])
    val redUsed = Array.fill(numGroups)(
      scala.collection.mutable.SortedSet.empty[Int])
    val blueUsed = Array.fill(numGroups)(
      scala.collection.mutable.SortedSet.empty[Int])
    val alphaUsed = Array.fill(numGroups)(
      scala.collection.mutable.SortedSet.empty[Int])
    val distUsed = Array.fill(numGroups)(
      scala.collection.mutable.SortedSet.empty[Int])
    for ((k, a, b, g) <- tokens) k match {
      case 0 =>
        val p = px(a)
        greenUsed(g) += chG(p); redUsed(g) += chR(p)
        blueUsed(g) += chB(p); alphaUsed(g) += chA(p)
      case 1 => greenUsed(g) += 256 + 24 + a
      case 2 =>
        greenUsed(g) += 256 + prefixEncode(a)._1
        distUsed(g) += prefixEncode(b + 120)._1 // escape form: dist + 120
    }

    def writeTree(size: Int, used0: Seq[Int]): Array[Int] = {
      val used = if (used0.isEmpty) Seq(0) else used0 // unused tree stub
      val u = used.distinct.sorted
      if (u.size <= 2) {
        bw.write(1, 1) // simple
        bw.write(u.size - 1, 1)
        if (u.head < 2) { bw.write(0, 1); bw.write(u.head, 1) }
        else { bw.write(1, 1); bw.write(u.head, 8) }
        if (u.size == 2) bw.write(u(1), 8)
        val lens = new Array[Int](size)
        lens(u.head) = 1
        if (u.size == 2) lens(u(1)) = 1
        return lens
      }
      bw.write(0, 1) // normal
      val lens = flatLengths(size, u)
      // serialize lens as code-length-code symbols (16-runs for
      // repeated nonzero lengths, 17/18 for zero gaps), then write
      // THOSE with another flat complete code
      val clcTokens =
        scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
      var p = 0
      while (p < size) {
        val v = lens(p)
        if (v == 0) {
          var run = 0
          while (p + run < size && lens(p + run) == 0) run += 1
          var left = run
          while (left > 0) {
            if (left < 3) { clcTokens += ((0, 0, 0)); left -= 1 }
            else if (left <= 10) { clcTokens += ((17, 3, left - 3)); left = 0 }
            else {
              val take = math.min(left, 138)
              clcTokens += ((18, 7, take - 11)); left -= take
            }
          }
          p += run
        } else {
          clcTokens += ((v, 0, 0))
          var run = 0
          while (p + 1 + run < size && lens(p + 1 + run) == v) run += 1
          var left = run
          while (left >= 3) {
            val take = math.min(left, 6)
            clcTokens += ((16, 2, take - 3)); left -= take
          }
          var k = 0
          while (k < left) { clcTokens += ((v, 0, 0)); k += 1 }
          p += 1 + run
        }
      }
      val clcUsed = clcTokens.map(_._1).distinct.sorted.toSeq
      val clcLens = flatLengths(19, clcUsed)
      val lastPos = CodeLengthOrder.indices
        .filter(i => clcLens(CodeLengthOrder(i)) > 0).max
      val numCl = math.max(4, lastPos + 1)
      bw.write(numCl - 4, 4)
      var q = 0
      while (q < numCl) { bw.write(clcLens(CodeLengthOrder(q)), 3); q += 1 }
      bw.write(0, 1) // no max_symbol shortcut
      val clcCodes = canonicalCodes(clcLens)
      def put(sym: Int): Unit = {
        var b2 = clcLens(sym) - 1
        while (b2 >= 0) { bw.writeBit((clcCodes(sym) >> b2) & 1); b2 -= 1 }
      }
      for ((sym, eb, ev) <- clcTokens) {
        put(sym); if (eb > 0) bw.write(ev, eb)
      }
      lens
    }

    // per-tree codes precomputed ONCE (recomputing the canonical table
    // per emitted symbol made the encoder O(alphabet) per pixel channel)
    final class Emitter(lens: Array[Int]) {
      private val codes = canonicalCodes(lens)
      private val singleSym = lens.count(_ > 0) == 1
      def emit(sym: Int): Unit = {
        val n = lens(sym)
        require(n > 0, s"emit of unused symbol $sym")
        if (singleSym) return // single-symbol tree: zero bits on the wire
        var b2 = n - 1
        while (b2 >= 0) { bw.writeBit((codes(sym) >> b2) & 1); b2 -= 1 }
      }
    }
    // trees are written group by group, 5 per group, in group order
    val emitters = Array.tabulate(numGroups) { g =>
      val ge = new Emitter(writeTree(greenSize, greenUsed(g).toSeq))
      val re = new Emitter(writeTree(256, redUsed(g).toSeq))
      val be = new Emitter(writeTree(256, blueUsed(g).toSeq))
      val ae = new Emitter(writeTree(256, alphaUsed(g).toSeq))
      val de = new Emitter(writeTree(40, distUsed(g).toSeq))
      (ge, re, be, ae, de)
    }

    for ((k, a, b, g) <- tokens) {
      val (ge, re, be, ae, de) = emitters(g)
      k match {
        case 0 =>
          val p = px(a)
          ge.emit(chG(p)); re.emit(chR(p)); be.emit(chB(p)); ae.emit(chA(p))
        case 1 => ge.emit(256 + 24 + a)
        case 2 =>
          val (lc, le, lv) = prefixEncode(a)
          ge.emit(256 + lc)
          if (le > 0) bw.write(lv, le)
          val (dc, de2, dv) = prefixEncode(b + 120)
          de.emit(dc)
          if (de2 > 0) bw.write(dv, de2)
      }
    }
  }

  /** Wrap a VP8L payload in a RIFF/WEBP container. */
  def container(vp8l: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def cc(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    def u32le(v: Int): Unit = {
      bos.write(v & 0xFF); bos.write((v >>> 8) & 0xFF)
      bos.write((v >>> 16) & 0xFF); bos.write((v >>> 24) & 0xFF)
    }
    val padded = vp8l.length + (vp8l.length & 1)
    cc("RIFF"); u32le(4 + 8 + padded); cc("WEBP")
    cc("VP8L"); u32le(vp8l.length); bos.write(vp8l)
    if ((vp8l.length & 1) == 1) bos.write(0)
    bos.toByteArray
  }

  // ---------------------------------------------------------- decoder

  private final case class TransformRec(kind: Int, bits: Int,
                                        sub: Array[Int], subW: Int,
                                        prevW: Int, palSize: Int)

  /** Decode a VP8L payload (signature byte first) to (w, h, ARGB
    * pixels). None when the bytes are not VP8L or malformed. */
  def decode(payload: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try {
      if (payload.length < 5 || (payload(0) & 0xFF) != 0x2F) return None
      val r = new BitReader(payload, 1)
      val w = r.read(14) + 1
      val h = r.read(14) + 1
      r.read(1) // alpha hint
      if (r.read(3) != 0) return None // version

      var curW = w
      val transforms =
        scala.collection.mutable.ArrayBuffer.empty[TransformRec]
      while (r.readBit() == 1) r.read(2) match {
        case 2 => // subtract-green: no payload
          transforms += TransformRec(2, 0, null, 0, curW, 0)
        case 0 => // predictor
          val bits = r.read(3) + 2
          val gw = (curW + (1 << bits) - 1) >> bits
          val gh = (h + (1 << bits) - 1) >> bits
          transforms += TransformRec(0, bits,
            decodeImageStream(r, gw, gh, allowMeta = false), gw, curW, 0)
        case 1 => // cross-color
          val bits = r.read(3) + 2
          val gw = (curW + (1 << bits) - 1) >> bits
          val gh = (h + (1 << bits) - 1) >> bits
          transforms += TransformRec(1, bits,
            decodeImageStream(r, gw, gh, allowMeta = false), gw, curW, 0)
        case 3 => // color-indexing
          val psize = r.read(8) + 1
          val deltas = decodeImageStream(r, psize, 1, allowMeta = false)
          // prefix-sum the delta coding (first entry against 0 —
          // symmetric with the encoder above)
          val pal = new Array[Int](psize)
          var i = 0
          while (i < psize) {
            val prev = if (i == 0) 0 else pal(i - 1)
            val d = deltas(i)
            pal(i) = mk(chA(d) + chA(prev), chR(d) + chR(prev),
              chG(d) + chG(prev), chB(d) + chB(prev))
            i += 1
          }
          val wb = if (psize <= 2) 3 else if (psize <= 4) 2
            else if (psize <= 16) 1 else 0
          val ppb = 1 << wb
          transforms += TransformRec(3, wb, pal, psize, curW, psize)
          curW = (curW + ppb - 1) / ppb
      }

      var px = decodeImageStream(r, curW, h, allowMeta = true)

      // inverse transforms, reverse read order
      for (t <- transforms.reverseIterator) t.kind match {
        case 2 =>
          var j = 0
          while (j < px.length) {
            val p = px(j)
            val g = chG(p)
            px(j) = mk(chA(p), chR(p) + g, g, chB(p) + g)
            j += 1
          }
        case 1 =>
          val bits = t.bits
          var j = 0
          while (j < px.length) {
            val x = j % t.prevW; val y = j / t.prevW
            val cte = t.sub((y >> bits) * t.subW + (x >> bits))
            val g2r = chB(cte); val g2b = chG(cte); val r2b = chR(cte)
            val p = px(j)
            val g = chG(p)
            val red = (chR(p) + ctDelta(g2r, g)) & 0xFF
            val blue =
              (chB(p) + ctDelta(g2b, g) + ctDelta(r2b, red)) & 0xFF
            px(j) = mk(chA(p), red, g, blue)
            j += 1
          }
        case 0 =>
          val bits = t.bits
          val pw = t.prevW
          var j = 0
          while (j < px.length) {
            val x = j % pw; val y = j / pw
            val mode =
              effMode(x, y, chG(t.sub((y >> bits) * t.subW + (x >> bits))))
            val pr = predict(px, pw, x, y, mode)
            val p = px(j)
            px(j) = mk(chA(p) + chA(pr), chR(p) + chR(pr),
              chG(p) + chG(pr), chB(p) + chB(pr))
            j += 1
          }
        case 3 =>
          val pal = t.sub
          val wb = t.bits
          val ppb = 1 << wb
          val bpp = 8 >> wb
          val mask = (1 << bpp) - 1
          val prevW = t.prevW
          val packedW = (prevW + ppb - 1) / ppb
          val out = new Array[Int](prevW * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < prevW) {
              val packed = chG(px(y * packedW + x / ppb))
              val idx = (packed >> (bpp * (x % ppb))) & mask
              if (idx >= t.palSize)
                throw new java.io.IOException("palette index out of range")
              out(y * prevW + x) = pal(idx)
              x += 1
            }
            y += 1
          }
          px = out
      }
      Some((w, h, px))
    } catch {
      case _: java.io.EOFException => None
      case _: java.io.IOException => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }

  /** Decode one spatially-coded image: cache bit, optional meta
    * partition (entropy image, only where the spec allows recursion),
    * per-group prefix codes, pixel stream with literals / LZ77
    * backrefs / cache hits. */
  private def decodeImageStream(r: BitReader, w: Int, h: Int,
                                allowMeta: Boolean): Array[Int] = {
    val cacheBits = if (r.readBit() == 1) r.read(4) else 0
    if (cacheBits > 11) throw new java.io.IOException("bad cache bits")
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0

    var metaBits = 0
    var metaImg: Array[Int] = null
    var metaW = 0
    var numGroups = 1
    if (allowMeta && r.readBit() == 1) {
      metaBits = r.read(3) + 2
      metaW = (w + (1 << metaBits) - 1) >> metaBits
      val metaH = (h + (1 << metaBits) - 1) >> metaBits
      metaImg = decodeImageStream(r, metaW, metaH, allowMeta = false)
      var i = 0
      while (i < metaImg.length) {
        val g = (chR(metaImg(i)) << 8) | chG(metaImg(i))
        if (g + 1 > numGroups) numGroups = g + 1
        i += 1
      }
    }
    @inline def groupAt(x: Int, y: Int): Int =
      if (metaImg == null) 0
      else {
        val m = metaImg((y >> metaBits) * metaW + (x >> metaBits))
        (chR(m) << 8) | chG(m)
      }

    def readTree(size: Int): Tree = {
      if (r.readBit() == 1) { // simple
        val numSym = r.read(1) + 1
        val s0 = if (r.readBit() == 1) r.read(8) else r.read(1)
        val lens = new Array[Int](size)
        if (numSym == 1) { lens(s0) = 1; new Tree(lens) }
        else {
          val s1 = r.read(8)
          lens(s0) = 1; lens(s1) = 1
          new Tree(lens, Array(s0, s1)) // listed order, per spec
        }
      } else {
        val numCl = 4 + r.read(4)
        val clcLens = new Array[Int](19)
        var i = 0
        while (i < numCl) { clcLens(CodeLengthOrder(i)) = r.read(3); i += 1 }
        val clc = new Tree(clcLens)
        var maxSymbol =
          if (r.readBit() == 1) {
            val nbits = 2 + 2 * r.read(3)
            2 + r.read(nbits)
          } else size
        val lens = new Array[Int](size)
        var pos = 0
        var prev = 8
        while (pos < size && maxSymbol > 0) {
          maxSymbol -= 1
          val sym = clc.decode(r)
          if (sym < 16) {
            lens(pos) = sym; pos += 1
            if (sym != 0) prev = sym
          } else if (sym == 16) {
            val rep = 3 + r.read(2)
            var k = 0
            while (k < rep && pos < size) {
              lens(pos) = prev; pos += 1; k += 1
            }
          } else if (sym == 17) {
            pos += 3 + r.read(3)
          } else {
            pos += 11 + r.read(7)
          }
        }
        new Tree(lens)
      }
    }

    val greenSize = 256 + 24 + cacheSize
    val trees = Array.fill(numGroups)((readTree(greenSize), readTree(256),
      readTree(256), readTree(256), readTree(40)))

    val px = new Array[Int](w * h)
    val cache = new Array[Int](math.max(cacheSize, 1))
    var i = 0
    while (i < w * h) {
      val (green, red, blue, alpha, dist) = trees(groupAt(i % w, i / w))
      val s = green.decode(r)
      if (s < 256) {
        val rr = red.decode(r)
        val bb = blue.decode(r)
        val aa = alpha.decode(r)
        val p = mk(aa, rr, s, bb)
        px(i) = p
        if (cacheSize > 0) cache(cacheIndex(p, cacheBits)) = p
        i += 1
      } else if (s < 256 + 24) {
        val len = prefixDecode(s - 256, r)
        val dcode = prefixDecode(dist.decode(r), r)
        val d =
          if (dcode > 120) dcode - 120
          else {
            val (dx, dy) = distMap(dcode - 1)
            math.max(1, dy * w + dx)
          }
        if (d > i || i + len > w * h)
          throw new java.io.IOException("backref out of range")
        var k = 0
        while (k < len) {
          val p = px(i - d)
          px(i) = p
          if (cacheSize > 0) cache(cacheIndex(p, cacheBits)) = p
          i += 1; k += 1
        }
      } else {
        if (cacheSize == 0 || s - 256 - 24 >= cacheSize)
          throw new java.io.IOException("cache symbol without cache")
        px(i) = cache(s - 256 - 24)
        i += 1
      }
    }
    px
  }

  /** Find the VP8L chunk in a RIFF/WEBP container. */
  def vp8lPayload(content: Array[Byte]): Option[Array[Byte]] = {
    if (content.length < 12) return None
    def cc(p: Int) = new String(content, p, 4, "US-ASCII")
    if (cc(0) != "RIFF" || cc(8) != "WEBP") return None
    var p = 12
    while (p + 8 <= content.length) {
      val size = (content(p + 4) & 0xFF) | ((content(p + 5) & 0xFF) << 8) |
        ((content(p + 6) & 0xFF) << 16) | ((content(p + 7) & 0xFF) << 24)
      if (cc(p) == "VP8L" && p + 8 + size <= content.length)
        return Some(
          java.util.Arrays.copyOfRange(content, p + 8, p + 8 + size))
      p += 8 + size + (size & 1)
    }
    None
  }

  /** The spec's 120-entry small-distance "plane code" map (WebP
    * Lossless Bitstream Specification §4.2.2, libwebp kCodeToPlane):
    * each byte packs (yoffset = b >> 4, xoffset = 8 − (b & 0xF)),
    * distance = max(1, yoffset·width + xoffset). The oracle-gated
    * fixtures deliberately encode distances in the always-legal >120
    * escape form, so the gate does not depend on this table — it exists
    * for spec completeness on externally-encoded files. */
  private val CodeToPlane: Array[Int] = Array(
    0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29, 0x16, 0x1a,
    0x26, 0x2a, 0x38, 0x05, 0x37, 0x39, 0x15, 0x1b, 0x36, 0x3a,
    0x25, 0x2b, 0x48, 0x04, 0x47, 0x49, 0x14, 0x1c, 0x35, 0x3b,
    0x46, 0x4a, 0x24, 0x2c, 0x58, 0x45, 0x4b, 0x34, 0x3c, 0x03,
    0x57, 0x59, 0x13, 0x1d, 0x56, 0x5a, 0x23, 0x2d, 0x44, 0x4c,
    0x55, 0x5b, 0x33, 0x3d, 0x68, 0x02, 0x67, 0x69, 0x12, 0x1e,
    0x66, 0x6a, 0x22, 0x2e, 0x54, 0x5c, 0x43, 0x4d, 0x65, 0x6b,
    0x32, 0x3e, 0x78, 0x01, 0x77, 0x79, 0x53, 0x5d, 0x11, 0x1f,
    0x64, 0x6c, 0x42, 0x4e, 0x76, 0x7a, 0x21, 0x2f, 0x75, 0x7b,
    0x31, 0x3f, 0x63, 0x6d, 0x52, 0x5e, 0x00, 0x74, 0x7c, 0x41,
    0x4f, 0x10, 0x20, 0x62, 0x6e, 0x30, 0x73, 0x7d, 0x51, 0x5f,
    0x40, 0x72, 0x7e, 0x61, 0x6f, 0x50, 0x71, 0x7f, 0x60, 0x70)

  private def distMap(i: Int): (Int, Int) = {
    val b = CodeToPlane(i)
    (8 - (b & 0xF), b >> 4)
  }
}
