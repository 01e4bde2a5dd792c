package graft.multimodal

/** Genuine VP8L (lossless WebP) pixel codec, pure JVM — no native
  * library. Implements the public "WebP Lossless Bitstream
  * Specification": LSB-first bitstream, canonical prefix codes (both
  * the simple 1/2-symbol form and normal codes whose lengths are
  * themselves prefix-coded with the 16/17/18 repeat symbols), the
  * 5-tree symbol layout (green+length+cache / red / blue / alpha /
  * distance), LZ77 backward references with the prefix-coded
  * length/distance scheme, the 0x1e35a7bd color cache, and the
  * subtract-green transform.
  *
  * The ENCODER exists to produce genuine fixture streams (the JDK ships
  * no WebP codec at all): complete canonical codes by construction
  * (used symbols get lengths L-1/L with Kraft sum exactly 1), zero gaps
  * via symbols 17/18, same-length runs via symbol 16, a dist=width
  * backref for the replicated last row, and the color cache in coded
  * space. Every byte it emits is a spec-valid VP8L stream a compliant
  * decoder accepts.
  *
  * The DECODER is the product surface. Deliberately unsupported (return
  * None → callers fall back to the labeled stub, like decodeImage): the
  * predictor / cross-color / color-indexing transforms and the meta
  * (entropy-image) prefix-code partitioning — the entropy layer itself
  * is complete. */
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
    * consumed (the simple-code degenerate case). Array-encoded binary
    * tree: node i has children 2i+1 / 2i+2 … kept as two flat maps. */
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
        else lengths.indices.filter(lengths(_) > 0).sortBy(s => (lengths(s), s)).toArray
      // canonical code assignment in (length, order) sequence
      var code = 0
      var prevLen = 0
      var nodeCount = 1 // root = node 0
      for (s <- syms) {
        val len = lengths(s)
        code <<= (len - prevLen)
        prevLen = len
        // walk/insert path for code bits MSB→LSB
        var node = 0
        var i = len - 1
        while (i >= 0) {
          val b = (code >> i) & 1
          val key = (node << 1) | b
          if (i == 0) leaf.put(key, s)
          else {
            var child = next.get(key)
            if (child == null) { child = nodeCount; nodeCount += 1; next.put(key, child) }
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
    if (u.size == 1) { lens(u.head) = 1; return lens } // handled as 1-sym
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

  // ---------------------------------------------------------- encoder

  /** Encode an ARGB pixel array as a genuine VP8L bitstream (inside-
    * the-VP8L-chunk payload, signature byte included).
    * subtractGreen applies the transform; cacheBits 0 disables the
    * color cache; lastRowLz77 encodes the final row as one dist=width
    * backref (caller guarantees it equals the row above). */
  def encode(argb: Array[Int], w: Int, h: Int, subtractGreen: Boolean,
             cacheBits: Int, lastRowLz77: Boolean): Array[Byte] = {
    require(argb.length == w * h && w >= 1 && h >= 1)
    val bw = new BitWriter
    bw.write(0x2F, 8) // signature
    bw.write(w - 1, 14); bw.write(h - 1, 14)
    bw.write(0, 1) // alpha hint
    bw.write(0, 3) // version
    // transforms
    if (subtractGreen) { bw.write(1, 1); bw.write(2, 2) }
    bw.write(0, 1) // end of transforms
    // color cache
    if (cacheBits > 0) { bw.write(1, 1); bw.write(cacheBits, 4) }
    else bw.write(0, 1)
    bw.write(0, 1) // no meta (entropy image)

    // coded-domain pixels
    val px = new Array[Int](argb.length)
    var i = 0
    while (i < argb.length) {
      val p = argb(i)
      px(i) =
        if (!subtractGreen) p
        else {
          val a = (p >>> 24) & 0xFF; val r = (p >>> 16) & 0xFF
          val g = (p >>> 8) & 0xFF; val b = p & 0xFF
          (a << 24) | (((r - g) & 0xFF) << 16) | (g << 8) | ((b - g) & 0xFF)
        }
      i += 1
    }

    // token stream: (kind, a, b) kind 0 = literal pixel index, 1 =
    // cache hit (a = index), 2 = backref (a = length, b = distance)
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = new Array[Int](math.max(cacheSize, 1))
    java.util.Arrays.fill(cache, 0x00000001) // never a real pixel here
    val tokens = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    val litRows = if (lastRowLz77) h - 1 else h
    i = 0
    val nLit = litRows * w
    while (i < nLit) {
      val p = px(i)
      if (cacheSize > 0 && cache(cacheIndex(p, cacheBits)) == p)
        tokens += ((1, cacheIndex(p, cacheBits), 0))
      else {
        tokens += ((0, i, 0))
        if (cacheSize > 0) cache(cacheIndex(p, cacheBits)) = p
      }
      i += 1
    }
    if (lastRowLz77) {
      tokens += ((2, w, w)) // copy the whole previous row
      // backref-copied pixels enter the cache too
      var j = nLit
      while (j < h * w) {
        if (cacheSize > 0) cache(cacheIndex(px(j), cacheBits)) = px(j)
        j += 1
      }
    }

    // symbol usage per tree
    val greenUsed = scala.collection.mutable.SortedSet.empty[Int]
    val redUsed = scala.collection.mutable.SortedSet.empty[Int]
    val blueUsed = scala.collection.mutable.SortedSet.empty[Int]
    val alphaUsed = scala.collection.mutable.SortedSet.empty[Int]
    var distCode = -1
    for ((k, a, b) <- tokens) k match {
      case 0 =>
        val p = px(a)
        greenUsed += (p >>> 8) & 0xFF
        redUsed += (p >>> 16) & 0xFF
        blueUsed += p & 0xFF
        alphaUsed += (p >>> 24) & 0xFF
      case 1 => greenUsed += 256 + 24 + a
      case 2 =>
        greenUsed += 256 + prefixEncode(a)._1
        distCode = prefixEncode(b + 120)._1 // escape form: dist + 120
    }

    val greenSize = 256 + 24 + cacheSize
    def writeTree(size: Int, used: Seq[Int]): Array[Int] = {
      val u = used.distinct.sorted
      if (u.size <= 2) {
        // simple code
        bw.write(1, 1) // simple
        bw.write(u.size - 1, 1)
        if (u.head < 2) { bw.write(0, 1); bw.write(u.head, 1) }
        else { bw.write(1, 1); bw.write(u.head, 8) }
        if (u.size == 2) bw.write(u(1), 8)
        val lens = new Array[Int](size)
        if (u.size == 1) lens(u.head) = 1
        else { lens(u.head) = 1; lens(u(1)) = 1 }
        return lens
      }
      bw.write(0, 1) // normal
      val lens = flatLengths(size, u)
      // code-length-code: serialize lens as CLC symbols (with 16-runs
      // for repeated nonzero lengths and 17/18 for zero gaps), then
      // huffman-code THOSE symbols with another flat complete code
      val clcTokens = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
      // (symbol, extraBits, extraVal)
      var p = 0
      var prevNz = 8
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
          prevNz = v
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
      if (clcUsed.size == 1) clcLens(clcUsed.head) = 1 // degenerate ok? avoid
      // num_code_lengths covers every used CLC symbol in order position
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
      for ((sym, eb, ev) <- clcTokens) { put(sym); if (eb > 0) bw.write(ev, eb) }
      lens
    }

    val greenLens = writeTree(greenSize, greenUsed.toSeq)
    val redLens = writeTree(256, redUsed.toSeq)
    val blueLens = writeTree(256, blueUsed.toSeq)
    val alphaLens = writeTree(256, alphaUsed.toSeq)
    val distLens = writeTree(40, if (distCode >= 0) Seq(distCode) else Seq(0))

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
    val greenE = new Emitter(greenLens)
    val redE = new Emitter(redLens)
    val blueE = new Emitter(blueLens)
    val alphaE = new Emitter(alphaLens)
    val distE = new Emitter(distLens)

    for ((k, a, b) <- tokens) k match {
      case 0 =>
        val p = px(a)
        greenE.emit((p >>> 8) & 0xFF)
        redE.emit((p >>> 16) & 0xFF)
        blueE.emit(p & 0xFF)
        alphaE.emit((p >>> 24) & 0xFF)
      case 1 => greenE.emit(256 + 24 + a)
      case 2 =>
        val (lc, le, lv) = prefixEncode(a)
        greenE.emit(256 + lc)
        if (le > 0) bw.write(lv, le)
        val (dc, de, dv) = prefixEncode(b + 120)
        distE.emit(dc)
        if (de > 0) bw.write(dv, de)
    }
    bw.bytes()
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

  /** Decode a VP8L payload (signature byte first) to (w, h, ARGB
    * pixels). None when the bytes are not VP8L or use a feature outside
    * the supported envelope (predictor/color/indexing transforms, meta
    * prefix-code partitioning) — the caller falls back to the labeled
    * stub, exactly like decodeImage on unreadable bytes. */
  def decode(payload: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try {
      if (payload.length < 5 || (payload(0) & 0xFF) != 0x2F) return None
      val r = new BitReader(payload, 1)
      val w = r.read(14) + 1
      val h = r.read(14) + 1
      r.read(1) // alpha hint
      if (r.read(3) != 0) return None // version
      var subtractGreen = false
      while (r.readBit() == 1) r.read(2) match {
        case 2 => subtractGreen = true
        case _ => return None // predictor/color/indexing unsupported
      }
      val cacheBits = if (r.readBit() == 1) r.read(4) else 0
      if (cacheBits > 11) return None
      if (r.readBit() == 1) return None // meta prefix codes unsupported
      val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0

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
              while (k < rep && pos < size) { lens(pos) = prev; pos += 1; k += 1 }
            } else if (sym == 17) {
              pos += 3 + r.read(3)
            } else {
              pos += 11 + r.read(7)
            }
          }
          new Tree(lens)
        }
      }

      val green = readTree(256 + 24 + cacheSize)
      val red = readTree(256)
      val blue = readTree(256)
      val alpha = readTree(256)
      val dist = readTree(40)

      val px = new Array[Int](w * h)
      val cache = new Array[Int](math.max(cacheSize, 1))
      var i = 0
      while (i < w * h) {
        val s = green.decode(r)
        if (s < 256) {
          val rr = red.decode(r)
          val bb = blue.decode(r)
          val aa = alpha.decode(r)
          val p = (aa << 24) | (rr << 16) | (s << 8) | bb
          px(i) = p
          if (cacheSize > 0) cache(cacheIndex(p, cacheBits)) = p
          i += 1
        } else if (s < 256 + 24) {
          val len = prefixDecode(s - 256, r)
          val dcode = prefixDecode(dist.decode(r), r)
          val d =
            if (dcode > 120) dcode - 120
            else {
              val (dx, dy) = DistMap(dcode - 1)
              math.max(1, dy * w + dx)
            }
          if (d > i || i + len > w * h) return None
          var k = 0
          while (k < len) {
            val p = px(i - d)
            px(i) = p
            if (cacheSize > 0) cache(cacheIndex(p, cacheBits)) = p
            i += 1; k += 1
          }
        } else {
          if (cacheSize == 0) return None
          px(i) = cache(s - 256 - 24)
          i += 1
        }
      }
      if (subtractGreen) {
        var j = 0
        while (j < px.length) {
          val p = px(j)
          val g = (p >>> 8) & 0xFF
          val rr = (((p >>> 16) & 0xFF) + g) & 0xFF
          val bb = ((p & 0xFF) + g) & 0xFF
          px(j) = (p & 0xFF00FF00) | (rr << 16) | bb
          j += 1
        }
      }
      Some((w, h, px))
    } catch {
      case _: java.io.EOFException => None
      case _: java.io.IOException => None
      case _: ArrayIndexOutOfBoundsException => None
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
        return Some(java.util.Arrays.copyOfRange(content, p + 8, p + 8 + size))
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

  private def DistMap(i: Int): (Int, Int) = {
    val b = CodeToPlane(i)
    (8 - (b & 0xF), b >> 4)
  }
}
