package graft.multimodal

/** CABAC — the H.264 standard's second entropy mode
  * (`entropy_coding_mode_flag` = 1), for the I-slice syntax this
  * library's [[H264]] codec covers.
  *
  * REAL algorithms (clause 9.3 of the published standard):
  *  - The binary arithmetic ENGINE: 9-bit range/offset initialisation,
  *    range subdivision by a state-indexed LPS estimate, MPS/LPS
  *    64-state probability machine with the MPS flip at state 0,
  *    decoder renormalisation (doubling range/offset below 256),
  *    encoder renormalisation with carry via bits-outstanding, the
  *    BYPASS path for near-uniform bins, and the TERMINATE decision
  *    (range −2, no state) used by end_of_slice_flag.
  *  - Binarizations: the I-slice mb_type tree (I_4x4 bin, then the
  *    terminate-coded I_PCM bin, then cbpLuma/cbpChroma/predMode
  *    suffix bins), TU (truncated unary), UEG0 for
  *    coeff_abs_level_minus1 (TU prefix capped at 14, Exp-Golomb-0
  *    bypass suffix), the unary signed map for mb_qp_delta, and the
  *    significance + last-significant coefficient maps in scan order
  *    with levels decoded in reverse scan order.
  *  - Context MODELLING structure: per-element context sets, neighbour
  *    increments (left/above MB type, coded-block flags from the
  *    neighbour coefficient grids, cbp quadrant bits, previous
  *    mb_qp_delta), per-scan-position significance contexts, and the
  *    c1/c2 level-context scheme (bin 0 of a level keyed by how many
  *    1-levels preceded, greater-bins keyed by how many >1 levels).
  *
  * PINNED PLACEHOLDER DATA (same policy as [[H264]]/[[Vp8]]): the
  * 64×4 rangeTabLPS probability table, the two 64-entry state
  * transition tables, and the per-context initialisation values are
  * pinned deterministic formulas with the published tables' envelope
  * and monotonicity (LPS estimates in [2,239] decaying geometrically
  * with state; MPS transitions stepping toward 62, LPS transitions
  * dropping ~s/4). The encoder codes against the same tables, so
  * streams round-trip bit-exactly; swapping in the spec's tables is a
  * data-only change.
  */
object H264Cabac {

  // ------------------------------------------------ probability tables

  /** rangeTabLPS — PINNED PLACEHOLDER (see object doc): integer
    * geometric decay 240→2 over 64 states, 4 quantised range bands. */
  private val rangeTab: Array[Array[Int]] = {
    val t = Array.ofDim[Int](64, 4)
    var q = 0
    while (q < 4) {
      var v = 128 + 37 * q
      var s = 0
      while (s < 64) {
        t(s)(q) = math.max(2, v)
        v = v * 607 / 640 // ≈ the published table's per-state decay
        s += 1
      }
      q += 1
    }
    t
  }

  /** State transitions — PINNED PLACEHOLDER: MPS toward 62, LPS
    * dropping about a quarter of the state. */
  private def transMps(s: Int): Int = math.min(62, s + 1)
  private def transLps(s: Int): Int = math.max(0, s - 1 - s / 4)

  /** One adaptive context: probability state + most-probable symbol. */
  private final class Ctx(var state: Int, var mps: Int)

  /** Context pool with PINNED PLACEHOLDER initialisation (the spec
    * derives per-context (m,n) init values from data tables): a
    * deterministic spread over states/MPS so contexts start distinct. */
  private def freshCtxPool(n: Int): Array[Ctx] =
    Array.tabulate(n)(i => new Ctx((i * 7) % 24, i & 1))

  // context index layout (structure real, offsets ours)
  private val CTX_MBTYPE = 0 // 3: neighbour inc
  private val CTX_MBTYPE_SUF = 3 // 5: cbpL, cbpC0, cbpC1, pm0, pm1
  private val CTX_PREV4x4 = 8 // 1
  private val CTX_REM4x4 = 9 // 1 (shared by the 3 FL bins, as the spec)
  private val CTX_CHROMA = 10 // 3 neighbour inc + 1 continuation
  private val CTX_CBP_L = 14 // 4: condA + 2*condB
  private val CTX_CBP_C0 = 18 // 4
  private val CTX_CBP_C1 = 22 // 4
  private val CTX_QPD = 26 // 3: bin0 (prev delta == 0 / ≠ 0), rest
  private val CTX_CBF = 29 // 5 categories × 4 neighbour inc = 20
  private val CTX_SIG = 49 // 5 categories × 15 positions
  private val CTX_LAST = 124 // 5 categories × 15 positions
  private val CTX_LVL = 199 // 5 categories × 10 (c1: 5, gtx: 5)
  private[multimodal] val N_CTX = 249

  // residual block categories (the spec's ctxBlockCat)
  val CAT_LUMA_DC = 0
  val CAT_LUMA_AC = 1
  val CAT_LUMA_4x4 = 2
  val CAT_CHROMA_DC = 3
  val CAT_CHROMA_AC = 4

  // ------------------------------------------------------- decoder

  /** Arithmetic decoder over a bit source (9.3.3.2). */
  final class Reader(nextBit: () => Int) {
    private val ctxs = freshCtxPool(N_CTX)
    private var range = 510
    private var offset = {
      var v = 0; var i = 0
      while (i < 9) { v = (v << 1) | nextBit(); i += 1 }
      v
    }

    def decision(ctxIdx: Int): Int = {
      val c = ctxs(ctxIdx)
      val lps = rangeTab(c.state)((range >> 6) & 3)
      range -= lps
      val bin =
        if (offset >= range) {
          val b = 1 - c.mps
          offset -= range
          range = lps
          if (c.state == 0) c.mps = 1 - c.mps
          c.state = transLps(c.state)
          b
        } else {
          c.state = transMps(c.state)
          c.mps
        }
      while (range < 256) {
        range <<= 1
        offset = (offset << 1) | nextBit()
      }
      bin
    }

    def bypass(): Int = {
      offset = (offset << 1) | nextBit()
      if (offset >= range) { offset -= range; 1 } else 0
    }

    /** end_of_slice / PCM-escape decision: range −2, no adaptation. */
    def terminate(): Int = {
      range -= 2
      if (offset >= range) 1
      else {
        while (range < 256) {
          range <<= 1
          offset = (offset << 1) | nextBit()
        }
        0
      }
    }

    def tu(ctx0: Int, ctxRest: Int, cMax: Int): Int = {
      var v = 0
      while (v < cMax && decision(if (v == 0) ctx0 else ctxRest) == 1)
        v += 1
      v
    }

    /** Exp-Golomb order 0 in bypass bins. */
    def eg0Bypass(): Int = {
      var k = 0
      while (bypass() == 1 && k < 30) k += 1
      var v = 0; var i = 0
      while (i < k) { v = (v << 1) | bypass(); i += 1 }
      (1 << k) - 1 + v
    }
  }

  // ------------------------------------------------------- encoder

  /** Arithmetic encoder emitting bits to `putRaw` (9.3.4). */
  final class Writer(putRaw: Int => Unit) {
    private val ctxs = freshCtxPool(N_CTX)
    private var low = 0
    private var range = 510
    private var outstanding = 0
    private var first = true

    private def putBit(b: Int): Unit = {
      if (first) first = false else putRaw(b)
      while (outstanding > 0) { putRaw(1 - b); outstanding -= 1 }
    }

    private def renorm(): Unit = {
      while (range < 256) {
        if (low < 256) putBit(0)
        else if (low >= 512) { low -= 512; putBit(1) }
        else { low -= 256; outstanding += 1 }
        range <<= 1
        low <<= 1
      }
    }

    def decision(ctxIdx: Int, bin: Int): Unit = {
      val c = ctxs(ctxIdx)
      val lps = rangeTab(c.state)((range >> 6) & 3)
      range -= lps
      if (bin != c.mps) {
        low += range
        range = lps
        if (c.state == 0) c.mps = 1 - c.mps
        c.state = transLps(c.state)
      } else c.state = transMps(c.state)
      renorm()
    }

    def bypass(bin: Int): Unit = {
      low <<= 1
      if (bin == 1) low += range
      if (low >= 1024) { low -= 1024; putBit(1) }
      else if (low < 512) putBit(0)
      else { low -= 512; outstanding += 1 }
    }

    def terminate(bin: Int): Unit = {
      range -= 2
      if (bin == 1) { low += range; flush() } else renorm()
    }

    private def flush(): Unit = {
      range = 2
      renorm()
      putBit((low >> 9) & 1)
      putRaw((low >> 8) & 1)
      putRaw(1) // rbsp stop bit inside the arithmetic tail
    }

    def tu(ctx0: Int, ctxRest: Int, cMax: Int, v: Int): Unit = {
      var i = 0
      while (i < v) { decision(if (i == 0) ctx0 else ctxRest, 1); i += 1 }
      if (v < cMax) decision(if (v == 0) ctx0 else ctxRest, 0)
    }

    def eg0Bypass(v: Int): Unit = {
      val k = 31 - Integer.numberOfLeadingZeros(v + 1)
      var i = 0
      while (i < k) { bypass(1); i += 1 }
      bypass(0)
      i = k - 1
      while (i >= 0) { bypass(((v + 1) >> i) & 1); i -= 1 }
    }
  }

  // --------------------------------------- shared context derivations

  private[multimodal] def ctxMbType(inc: Int): Int = CTX_MBTYPE + inc
  private[multimodal] def ctxMbTypeSuf(k: Int): Int = CTX_MBTYPE_SUF + k
  private[multimodal] def ctxPrev4x4: Int = CTX_PREV4x4
  private[multimodal] def ctxRem4x4: Int = CTX_REM4x4
  private[multimodal] def ctxChroma(inc: Int): Int = CTX_CHROMA + inc
  private[multimodal] def ctxChromaRest: Int = CTX_CHROMA + 3
  private[multimodal] def ctxCbpL(inc: Int): Int = CTX_CBP_L + inc
  private[multimodal] def ctxCbpC0(inc: Int): Int = CTX_CBP_C0 + inc
  private[multimodal] def ctxCbpC1(inc: Int): Int = CTX_CBP_C1 + inc
  private[multimodal] def ctxQpd0(prevNonzero: Boolean): Int =
    CTX_QPD + (if (prevNonzero) 1 else 0)
  private[multimodal] def ctxQpdRest: Int = CTX_QPD + 2
  private[multimodal] def ctxCbf(cat: Int, inc: Int): Int =
    CTX_CBF + cat * 4 + inc
  private[multimodal] def ctxSig(cat: Int, pos: Int): Int =
    CTX_SIG + cat * 15 + math.min(14, pos)
  private[multimodal] def ctxLast(cat: Int, pos: Int): Int =
    CTX_LAST + cat * 15 + math.min(14, pos)
  /** c1/c2 level contexts: bin 0 keyed by preceding 1-levels (unless a
    * >1 level already appeared), greater bins by preceding >1 levels —
    * the REAL scheme. */
  private[multimodal] def ctxLvlBin0(cat: Int, numEq1: Int,
                                     numGt1: Int): Int =
    CTX_LVL + cat * 10 +
      (if (numGt1 > 0) 0 else math.min(4, 1 + numEq1))
  private[multimodal] def ctxLvlRest(cat: Int, numGt1: Int): Int =
    CTX_LVL + cat * 10 + 5 + math.min(4, numGt1)
}
