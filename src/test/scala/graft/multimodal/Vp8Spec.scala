package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** VP8 keyframe codec properties. The decoder is validated against an
  * INDEPENDENT reference reconstruction computed here from the raw
  * MbSpecs (own predictor implementation + the shared transforms), so
  * the whole entropy layer — bool coder, trees, token contexts,
  * partitions, header — must round-trip exactly for the test to pass
  * (encode() returning its own decode would otherwise be tautological).
  */
class Vp8Spec extends AnyFunSuite {

  // ----------------------------------------------------- bool coder

  test("bool coder round-trips random (prob, bit) sequences, including " +
    "carry chains") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 50) {
      val n = 1 + rnd.nextInt(2000)
      val seq = Array.fill(n)((1 + rnd.nextInt(254), rnd.nextInt(2)))
      val be = new Vp8.BoolEncoder
      seq.foreach { case (p, b) => be.bool(p, b) }
      val bytes = be.bytes()
      val bd = new Vp8.BoolDecoder(bytes, 0, bytes.length)
      seq.zipWithIndex.foreach { case ((p, b), i) =>
        assert(bd.bool(p) == b, s"trial $trial bit $i")
      }
    }
    // skewed probabilities maximize carry pressure (long runs of the
    // likely branch keep range high and lowvalue near overflow)
    for (trial <- 1 to 20) {
      val n = 3000
      val seq = Array.fill(n)((254, if (rnd.nextInt(50) == 0) 1 else 0))
      val be = new Vp8.BoolEncoder
      seq.foreach { case (p, b) => be.bool(p, b) }
      val bytes = be.bytes()
      val bd = new Vp8.BoolDecoder(bytes, 0, bytes.length)
      seq.foreach { case (p, b) => assert(bd.bool(p) == b) }
    }
  }

  test("literals and flagged deltas round-trip") {
    val rnd = new scala.util.Random(7L)
    val lits = Array.fill(200)((rnd.nextInt(8) + 1, 0)).map { case (n, _) =>
      (n, rnd.nextInt(1 << n))
    }
    val deltas = Array.fill(100)(rnd.nextInt(31) - 15)
    val be = new Vp8.BoolEncoder
    lits.foreach { case (n, v) => be.literal(v, n) }
    deltas.foreach(d => be.flaggedDelta(d, 4))
    val bytes = be.bytes()
    val bd = new Vp8.BoolDecoder(bytes, 0, bytes.length)
    lits.foreach { case (n, v) => assert(bd.literal(n) == v) }
    deltas.foreach(d => assert(bd.flaggedDelta(4) == d))
  }

  // ----------------------------------------------------- transforms

  test("inverse DCT: DC-only block yields the constant (dc + 4) >> 3") {
    for (dc <- Seq(-512, -100, -8, 0, 8, 100, 513)) {
      val in = new Array[Int](16)
      in(0) = dc
      val out = Vp8.idct4x4(in)
      assert(out.forall(_ == ((dc + 4) >> 3)), s"dc=$dc -> ${out.toSeq}")
    }
  }

  test("inverse WHT: DC-only block spreads (dc + 3) >> 3 to all 16 " +
    "subblock DCs") {
    for (dc <- Seq(-256, -16, 0, 16, 40, 257)) {
      val in = new Array[Int](16)
      in(0) = dc
      val out = Vp8.iwht4x4(in)
      assert(out.forall(_ == ((dc + 3) >> 3)), s"dc=$dc -> ${out.toSeq}")
    }
  }

  // ------------------------------------- independent reconstruction

  /** Reference decode of (width, height, MbSpecs, opts) without touching
    * any bitstream: predict (own implementation), dequant, iWHT/iDCT
    * (shared transforms), add, clamp, crop. */
  private def referenceRecon(width: Int, height: Int,
                             mbs: Array[Vp8.MbSpec],
                             o: Vp8.EncodeOpts): Vp8.Frame = {
    val mbW = (width + 15) / 16
    val mbH = (height + 15) / 16
    val q = o.qIndex
    val yDc = Vp8.dcQ(q + o.yDcDelta); val yAc = Vp8.acQ(q)
    val y2Dc = Vp8.y2dcQ(q + o.y2DcDelta)
    val y2Ac = Vp8.y2acQ(q + o.y2AcDelta)
    val uvDc = Vp8.uvdcQ(q + o.uvDcDelta)
    val uvAc = Vp8.uvacQ(q + o.uvAcDelta)
    def clamp(v: Int) = math.max(0, math.min(255, v))
    def predict(plane: Array[Int], stride: Int, bx: Int, by: Int, size: Int,
                mode: Int): Unit = {
      val hasA = by > 0; val hasL = bx > 0
      def a(x: Int) = if (hasA) plane((by - 1) * stride + bx + x) else 127
      def l(y: Int) = if (hasL) plane((by + y) * stride + bx - 1) else 129
      val al =
        if (hasA && hasL) plane((by - 1) * stride + bx - 1)
        else if (hasA) 127 else 129
      for (y <- 0 until size; x <- 0 until size) {
        plane((by + y) * stride + bx + x) = mode match {
          case Vp8.DC_PRED =>
            if (hasA && hasL)
              ((0 until size).map(i => a(i) + l(i)).sum + size) /
                (2 * size)
            else if (hasA) ((0 until size).map(a).sum + size / 2) / size
            else if (hasL) ((0 until size).map(l).sum + size / 2) / size
            else 128
          case Vp8.V_PRED => a(x)
          case Vp8.H_PRED => l(y)
          case Vp8.TM_PRED => clamp(l(y) + a(x) - al)
        }
      }
    }
    val yS = mbW * 16; val cS = mbW * 8
    val yP = new Array[Int](yS * mbH * 16)
    val uP = new Array[Int](cS * mbH * 8)
    val vP = new Array[Int](cS * mbH * 8)
    for (mbY <- 0 until mbH; mbX <- 0 until mbW) {
      val m = mbs(mbY * mbW + mbX)
      if (m.ymode == Vp8.B_PRED) {
        // independent WIRING of the B_PRED path (subblock order, type-3
        // DC-carrying residuals, above-right selection); the ten pixel
        // formulas themselves are shared with the decoder — duplicating
        // them here would only re-assert the same derivation, while this
        // path exists to catch mode-coding/context/entropy slips
        val ar =
          if (mbY == 0) Array.fill(4)(127)
          else if (mbX + 1 < mbW)
            Array.tabulate(4)(k =>
              yP((mbY * 16 - 1) * yS + (mbX + 1) * 16 + k))
          else Array.fill(4)(yP((mbY * 16 - 1) * yS + mbW * 16 - 1))
        for (sb <- 0 until 16) {
          val sx = sb % 4; val sy = sb / 4
          val x0 = mbX * 16 + sx * 4; val y0 = mbY * 16 + sy * 4
          Vp8.predict4x4(yP, yS, x0, y0, m.bmodes(sb), ar, sx == 3)
          val dqc = Array.tabulate(16)(k =>
            m.y(sb)(k) * (if (k == 0) yDc else yAc))
          val res = Vp8.idct4x4(dqc)
          for (y <- 0 until 4; x <- 0 until 4) {
            val p = (y0 + y) * yS + x0 + x
            yP(p) = clamp(yP(p) + res(y * 4 + x))
          }
        }
      } else {
        predict(yP, yS, mbX * 16, mbY * 16, 16, m.ymode)
        val y2dq =
          Array.tabulate(16)(i => m.y2(i) * (if (i == 0) y2Dc else y2Ac))
        val subDc = Vp8.iwht4x4(y2dq)
        for (sb <- 0 until 16) {
          val dqc = Array.tabulate(16)(k =>
            m.y(sb)(k) * (if (k == 0) yDc else yAc))
          dqc(0) = subDc(sb)
          val res = Vp8.idct4x4(dqc)
          val x0 = mbX * 16 + (sb % 4) * 4
          val y0 = mbY * 16 + (sb / 4) * 4
          for (y <- 0 until 4; x <- 0 until 4) {
            val p = (y0 + y) * yS + x0 + x
            yP(p) = clamp(yP(p) + res(y * 4 + x))
          }
        }
      }
      predict(uP, cS, mbX * 8, mbY * 8, 8, m.uvmode)
      predict(vP, cS, mbX * 8, mbY * 8, 8, m.uvmode)
      for ((plane, blocks) <- Seq((uP, m.u), (vP, m.v)); cb <- 0 until 4) {
        val dqc = Array.tabulate(16)(k =>
          blocks(cb)(k) * (if (k == 0) uvDc else uvAc))
        val res = Vp8.idct4x4(dqc)
        val x0 = mbX * 8 + (cb % 2) * 4; val y0 = mbY * 8 + (cb / 2) * 4
        for (y <- 0 until 4; x <- 0 until 4) {
          val p = (y0 + y) * cS + x0 + x
          plane(p) = clamp(plane(p) + res(y * 4 + x))
        }
      }
    }
    // the loop-filter pass (kernels shared with the decoder, like the
    // 4x4 predictors — this reference independently derives the per-MB
    // inner-edge flags and the filter's position in the pipeline)
    val innerOk = Array.tabulate(mbW * mbH) { i =>
      val m = mbs(i)
      val allZero = (m.ymode == Vp8.B_PRED || m.y2.forall(_ == 0)) &&
        m.y.forall(_.forall(_ == 0)) && m.u.forall(_.forall(_ == 0)) &&
        m.v.forall(_.forall(_ == 0))
      !(o.skipEnabled && allZero) || m.ymode == Vp8.B_PRED
    }
    Vp8.filterFrame(yP, uP, vP, yS, cS, mbW, mbH, o.filterLevel,
      o.sharpness, o.simpleFilter, innerOk)
    def crop(p: Array[Int], s: Int, w: Int, h: Int) =
      Array.tabulate(w * h)(i => p((i / w) * s + i % w))
    Vp8.Frame(width, height, crop(yP, yS, width, height),
      crop(uP, cS, (width + 1) / 2, (height + 1) / 2),
      crop(vP, cS, (width + 1) / 2, (height + 1) / 2))
  }

  private def randomMbs(rnd: scala.util.Random, mbW: Int, mbH: Int,
                        dense: Boolean): Array[Vp8.MbSpec] =
    Array.tabulate(mbW * mbH) { i =>
      val bpred = i % 3 == 1 // every 3rd MB: per-subblock modes
      val ymode = if (bpred) Vp8.B_PRED else rnd.nextInt(4)
      val uvmode = rnd.nextInt(4)
      val m = Vp8.MbSpec(ymode, uvmode,
        bmodes = if (bpred) Array.fill(16)(rnd.nextInt(10)) else null)
      def fill(a: Array[Int], pNonzero: Int, amp: Int): Unit = {
        var k = 0
        while (k < 16) {
          if (rnd.nextInt(100) < pNonzero)
            a(k) = rnd.nextInt(2 * amp + 1) - amp
          k += 1
        }
      }
      if (i % 5 != 4) { // every 5th MB is all-zero -> exercises skip
        if (!bpred) fill(m.y2, if (dense) 60 else 25, if (dense) 80 else 3)
        m.y.foreach(fill(_, if (dense) 40 else 10, if (dense) 70 else 2))
        m.u.foreach(fill(_, 20, 2))
        m.v.foreach(fill(_, 20, 2))
      }
      m
    }

  test("encode/decode round-trip == independent reference recon across " +
    "modes, quantizers, partitions, skip, and non-16-aligned dims") {
    val rnd = new scala.util.Random(20260814L)
    val cases = Seq(
      (32, 32, Vp8.EncodeOpts()),
      (48, 16, Vp8.EncodeOpts(qIndex = 5, tokenPartitions = 2)),
      (16, 64, Vp8.EncodeOpts(qIndex = 90, tokenPartitions = 4)),
      (80, 48, Vp8.EncodeOpts(qIndex = 40, yDcDelta = 3, y2DcDelta = -2,
        y2AcDelta = 5, uvDcDelta = -4, uvAcDelta = 2)),
      (40, 24, Vp8.EncodeOpts(qIndex = 17)), // cropped (not MB-aligned)
      (33, 17, Vp8.EncodeOpts(qIndex = 63, tokenPartitions = 2)),
      (64, 64, Vp8.EncodeOpts(qIndex = 10, skipEnabled = false)),
      (48, 48, Vp8.EncodeOpts(qIndex = 28, skipProb = 30)),
      // in-loop deblocking: normal filter at low/high levels (hev
      // thresholds 0/1/2), sharpness variants, and the simple filter
      (48, 32, Vp8.EncodeOpts(qIndex = 35, filterLevel = 10)),
      (48, 32, Vp8.EncodeOpts(qIndex = 80, filterLevel = 44,
        sharpness = 3)),
      (32, 48, Vp8.EncodeOpts(qIndex = 50, filterLevel = 20,
        sharpness = 6, tokenPartitions = 2)),
      (48, 32, Vp8.EncodeOpts(qIndex = 35, filterLevel = 25,
        simpleFilter = true)),
      (40, 24, Vp8.EncodeOpts(qIndex = 63, filterLevel = 63)))
    for (((w, h, opts), ci) <- cases.zipWithIndex) {
      val mbW = (w + 15) / 16; val mbH = (h + 15) / 16
      val mbs = randomMbs(rnd, mbW, mbH, dense = ci % 2 == 0)
      val (bytes, recon) = Vp8.encode(w, h, mbs, opts)
      val ref = referenceRecon(w, h, mbs, opts)
      assert(recon.width == w && recon.height == h)
      assert(recon.y.toSeq == ref.y.toSeq, s"case $ci luma")
      assert(recon.u.toSeq == ref.u.toSeq, s"case $ci U")
      assert(recon.v.toSeq == ref.v.toSeq, s"case $ci V")
      // container round-trip
      val wrapped = Vp8.container(bytes)
      val payload = Vp8.vp8Payload(wrapped)
      assert(payload.exists(_.sameElements(bytes)), s"case $ci container")
    }
  }

  test("large-coefficient categories (cat3..cat6 extra bits) round-trip") {
    val rnd = new scala.util.Random(99L)
    val mbs = Array.tabulate(4) { _ =>
      val m = Vp8.MbSpec(Vp8.DC_PRED, Vp8.DC_PRED)
      // hit every token category incl. cat6's 11 extra bits
      val vals = Array(1, -2, 4, -6, 9, -15, 25, -50, 100, -500, 1000,
        -2047, 67, 0, 3, -1)
      Array.copy(vals, 0, m.y2, 0, 16)
      m.y.foreach(b => (0 until 16).foreach(k =>
        b(k) = rnd.nextInt(200) - 100))
      m
    }
    val (_, recon) = Vp8.encode(32, 32, mbs, Vp8.EncodeOpts(qIndex = 0))
    val ref = referenceRecon(32, 32, mbs, Vp8.EncodeOpts(qIndex = 0))
    assert(recon.y.toSeq == ref.y.toSeq)
  }

  test("every B_PRED subblock mode round-trips in every subblock " +
    "position, including skipped B_PRED MBs and cross-MB mode context") {
    val rnd = new scala.util.Random(4242L)
    // 3x3 MBs, all B_PRED: each MB cycles all 10 modes across its 16
    // subblocks with a different phase, so every (mode, position,
    // above-ctx, left-ctx) combination gets coverage; MB 4 is all-zero
    // (skipped) to pin the untouched-Y2-context + predict-only path
    val mbs = Array.tabulate(9) { i =>
      val m = Vp8.MbSpec(Vp8.B_PRED, rnd.nextInt(4),
        bmodes = Array.tabulate(16)(sb => (sb + i) % 10))
      if (i != 4)
        m.y.foreach(b => (0 until 16).foreach(k =>
          if (rnd.nextInt(3) == 0) b(k) = rnd.nextInt(9) - 4))
      m
    }
    val opts = Vp8.EncodeOpts(qIndex = 12)
    val (_, recon) = Vp8.encode(48, 48, mbs, opts)
    val ref = referenceRecon(48, 48, mbs, opts)
    assert(recon.y.toSeq == ref.y.toSeq)
    assert(recon.u.toSeq == ref.u.toSeq)
  }

  test("header coefficient-probability updates round-trip: token coding " +
    "on both sides must switch to the updated table") {
    val rnd = new scala.util.Random(31337L)
    val updates = Seq.fill(40)(
      ((rnd.nextInt(4), rnd.nextInt(8), rnd.nextInt(3), rnd.nextInt(11)),
        1 + rnd.nextInt(254))).distinctBy(_._1)
    val opts = Vp8.EncodeOpts(qIndex = 22, probUpdates = updates)
    val mbs = randomMbs(rnd, 3, 3, dense = true)
    val (_, recon) = Vp8.encode(48, 48, mbs, opts)
    val ref = referenceRecon(48, 48, mbs, opts)
    assert(recon.y.toSeq == ref.y.toSeq)
    assert(recon.u.toSeq == ref.u.toSeq)
    assert(recon.v.toSeq == ref.v.toSeq)
  }

  test("decoder rejects non-keyframe, bad start code, and truncated " +
    "streams without throwing") {
    val mbs = Array.fill(1)(Vp8.MbSpec(Vp8.DC_PRED, Vp8.DC_PRED))
    val (bytes, _) = Vp8.encode(16, 16, mbs)
    val nonKey = bytes.clone(); nonKey(0) = (nonKey(0) | 1).toByte
    assert(Vp8.decode(nonKey).isEmpty)
    val badStart = bytes.clone(); badStart(3) = 0x00
    assert(Vp8.decode(badStart).isEmpty)
    (0 until bytes.length).foreach(k => Vp8.decode(bytes.take(k)))
  }
}
