package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** H.264 baseline I-slice codec: entropy-layer exactness (exp-Golomb,
  * emulation prevention, CAVLC block coding under every nC context),
  * transform identities, and the whole-frame round-trip property —
  * decoder output == the encoder's internal reconstruction across MB
  * types, prediction modes, QPs, CAVLC level ranges, and cropped
  * dimensions. */
class H264Spec extends AnyFunSuite {

  private def rnd(seed: Long) = new scala.util.Random(seed)

  test("exp-Golomb ue/se round-trip, first values bit-exact") {
    val bw = new H264.BitWriter
    // spec examples: ue(0)=1, ue(1)=010, ue(2)=011, ue(3)=00100
    bw.ue(0); bw.ue(1); bw.ue(2); bw.ue(3)
    bw.trailing()
    val br = new H264.BitReader(bw.bytes())
    assert(br.bits(1) == 1)
    assert(br.bits(3) == Integer.parseInt("010", 2))
    assert(br.bits(3) == Integer.parseInt("011", 2))
    assert(br.bits(5) == Integer.parseInt("00100", 2))
    val r = rnd(1L)
    val vs = Seq.fill(500)(r.nextInt(100000))
    val ss = Seq.fill(500)(r.nextInt(20001) - 10000)
    val bw2 = new H264.BitWriter
    vs.foreach(bw2.ue)
    ss.foreach(bw2.se)
    bw2.trailing()
    val br2 = new H264.BitReader(bw2.bytes())
    vs.foreach(v => assert(br2.ue() == v))
    ss.foreach(v => assert(br2.se() == v))
  }

  test("emulation prevention: 0x000003 inserted before 00/01/02/03 and " +
    "round-trips, including adversarial zero runs") {
    val cases = Seq(
      Array[Byte](0, 0, 0),
      Array[Byte](0, 0, 1),
      Array[Byte](0, 0, 2),
      Array[Byte](0, 0, 3),
      Array[Byte](0, 0, 4), // no insertion needed
      Array[Byte](0, 0, 0, 0, 0, 0),
      Array[Byte](1, 0, 0, 3, 0, 0, 1, 0))
    for (c <- cases) {
      val e = H264.ebsp(c)
      // no 00 00 0[0-2] pattern may survive in the EBSP (00 00 03 IS
      // the escape and is legal)
      (0 until e.length - 2).foreach { i =>
        assert(!(e(i) == 0 && e(i + 1) == 0 && (e(i + 2) & 0xFF) <= 2),
          s"raw start-code-prone pattern at $i in ${e.mkString(",")}")
      }
      assert(H264.unEbsp(e).toSeq == c.toSeq)
    }
    val r = rnd(2L)
    for (_ <- 1 to 200) {
      val c = Array.fill(r.nextInt(40))(r.nextInt(4).toByte)
      assert(H264.unEbsp(H264.ebsp(c)).toSeq == c.toSeq)
    }
  }

  test("CAVLC block coding round-trips exactly for every nC context, " +
    "block kind, sparsity, and level range") {
    val r = rnd(3L)
    val nCs = Seq(-1, 0, 1, 2, 3, 4, 5, 6, 7, 8, 12, 16)
    for (trial <- 1 to 3000) {
      val maxCoeffs = Seq(16, 15, 4)(trial % 3)
      val nC = if (maxCoeffs == 4) -1 else nCs(r.nextInt(nCs.length - 1) + 1)
      val nNz = r.nextInt(maxCoeffs + 1)
      val coeffs = new Array[Int](maxCoeffs)
      val positions = r.shuffle((0 until maxCoeffs).toList).take(nNz)
      positions.foreach { p =>
        val mag = r.nextInt(3) match {
          case 0 => 1
          case 1 => 1 + r.nextInt(8)
          case _ => 1 + r.nextInt(1800) // exercises the 12-bit escapes
        }
        coeffs(p) = if (r.nextBoolean()) mag else -mag
      }
      val bw = new H264.BitWriter
      val tcW = H264.cavlcWrite(bw, nC, coeffs, maxCoeffs)
      bw.trailing()
      val (got, tcR) = H264.cavlcRead(new H264.BitReader(bw.bytes()),
        nC, maxCoeffs)
      assert(got.toSeq == coeffs.toSeq,
        s"nC=$nC maxCoeffs=$maxCoeffs coeffs=${coeffs.mkString(",")}")
      assert(tcW == tcR && tcW == coeffs.count(_ != 0))
    }
  }

  test("a WRONG nC context mis-decodes (the context machinery is " +
    "load-bearing, not decorative)") {
    val coeffs = Array(3, 0, -1, 2, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    val bw = new H264.BitWriter
    H264.cavlcWrite(bw, 0, coeffs, 16)
    bw.trailing()
    val (wrong, _) = H264.cavlcRead(new H264.BitReader(bw.bytes()), 5, 16)
    assert(wrong.toSeq != coeffs.toSeq)
  }

  test("inverse core transform: DC-only block reconstructs to the " +
    "constant (dequantised DC + 32) >> 6") {
    for (dc <- Seq(-400, -64, 0, 1, 17, 640)) {
      val d = new Array[Int](16)
      d(0) = dc
      val out = H264.icore4x4(d).map(v => (v + 32) >> 6)
      assert(out.forall(_ == ((dc + 32) >> 6)), s"dc=$dc → ${out.toSeq}")
    }
  }

  test("inverse Hadamard of a DC-only second-order block spreads the " +
    "value uniformly") {
    val c = new Array[Int](16)
    c(0) = 7
    assert(H264.ihadamard4x4(c).forall(_ == 7))
  }

  test("whole-frame round-trip: decode(encode(specs)) == the encoder's " +
    "internal reconstruction across MB types, modes, QPs, and crops") {
    val r = rnd(4L)
    for (trial <- 1 to 60) {
      val mbW = 1 + r.nextInt(3)
      val mbH = 1 + r.nextInt(3)
      // even crops, including non-16-multiples
      val width = mbW * 16 - 2 * r.nextInt(3)
      val height = mbH * 16 - 2 * r.nextInt(3)
      val qp = 8 + r.nextInt(44)
      def sparse(n: Int, from: Int, density: Double, mag: Int): Array[Int] = {
        val a = new Array[Int](n)
        (from until n).foreach { i =>
          if (r.nextDouble() < density)
            a(i) = (1 + r.nextInt(mag)) * (if (r.nextBoolean()) 1 else -1)
        }
        a
      }
      val mbs = Array.tabulate(mbW * mbH) { k =>
        val mbX = k % mbW; val mbY = k / mbW
        val hasA = mbY > 0; val hasL = mbX > 0
        def chroma = {
          val cands = Seq(H264.CH_DC) ++
            (if (hasL) Seq(H264.CH_H) else Nil) ++
            (if (hasA) Seq(H264.CH_V) else Nil) ++
            (if (hasA && hasL) Seq(H264.CH_PLANE) else Nil)
          cands(r.nextInt(cands.length))
        }
        if (r.nextInt(5) == 0) {
          // I_PCM: raw byte-aligned samples, lossless — and its
          // neighbours must still predict/nC correctly off it
          H264.MbSpec(mbType = H264.MB_PCM,
            pcmY = Array.fill(256)(r.nextInt(256)),
            pcmCb = Array.fill(64)(r.nextInt(256)),
            pcmCr = Array.fill(64)(r.nextInt(256)))
        } else if (r.nextBoolean()) {
          // I_16x16
          val cands = Seq(H264.I16_DC) ++
            (if (hasA) Seq(H264.I16_V) else Nil) ++
            (if (hasL) Seq(H264.I16_H) else Nil) ++
            (if (hasA && hasL) Seq(H264.I16_PLANE) else Nil)
          H264.MbSpec(mbType = 1,
            i16Mode = cands(r.nextInt(cands.length)),
            chromaMode = chroma,
            lumaDc = sparse(16, 0, 0.4, 40),
            lumaAc = Array.fill(16)(sparse(16, 1, 0.15, 12)),
            cbDc = sparse(4, 0, 0.5, 20), crDc = sparse(4, 0, 0.5, 20),
            cbAc = Array.fill(4)(sparse(16, 1, 0.1, 8)),
            crAc = Array.fill(4)(sparse(16, 1, 0.1, 8)))
        } else {
          // I_4x4: availability-aware per-block mode choice
          val modes = Array.tabulate(16) { b =>
            val (x4, y4) = (2 * ((b >> 2) & 1) + (b & 1),
              2 * (b >> 3) + ((b >> 1) & 1))
            val bA = hasA || y4 > 0
            val bL = hasL || x4 > 0
            val cands = Seq(H264.B_DC) ++
              (if (bA) Seq(H264.B_V, H264.B_DDL, H264.B_VL) else Nil) ++
              (if (bL) Seq(H264.B_H, H264.B_HU) else Nil) ++
              (if (bA && bL) Seq(H264.B_DDR, H264.B_VR, H264.B_HD) else Nil)
            cands(r.nextInt(cands.length))
          }
          H264.MbSpec(mbType = 0, b4Modes = modes, chromaMode = chroma,
            lumaAc = Array.fill(16)(sparse(16, 0, 0.2, 25)),
            cbDc = sparse(4, 0, 0.5, 20), crDc = sparse(4, 0, 0.5, 20),
            cbAc = Array.fill(4)(sparse(16, 1, 0.1, 8)),
            crAc = Array.fill(4)(sparse(16, 1, 0.1, 8)))
        }
      }
      val (stream, recon) = H264.encode(width, height, mbs,
        H264.EncodeOpts(qp = qp))
      val dec = H264.decode(stream)
      assert(dec.isDefined, s"trial $trial: decode failed " +
        s"(${mbW}x$mbH qp=$qp ${width}x$height)")
      val f = dec.get
      assert(f.width == width && f.height == height)
      assert(f.y.toSeq == recon.y.toSeq, s"trial $trial: luma mismatch")
      assert(f.u.toSeq == recon.u.toSeq, s"trial $trial: Cb mismatch")
      assert(f.v.toSeq == recon.v.toSeq, s"trial $trial: Cr mismatch")
    }
  }

  test("DC-chain fixture reconstructs to hand-computed constants: a " +
    "lone I_16x16 DC-pred MB with a pure-DC residual is uniformly " +
    "128 + (scaleLumaDc(dc·16·heuristic…) …) — computed independently") {
    // dcScan(0) = L → after inverse Hadamard every block DC f = L (the
    // other 15 second-order coefficients are zero), scaled by the
    // 8.5.10 branch; prediction with no neighbours is flat 128.
    for (qp <- Seq(0, 10, 20, 26, 35, 36, 44, 51); lvl <- Seq(-3, 1, 4)) {
      val m = H264.MbSpec(mbType = 1)
      m.lumaDc(0) = lvl
      val (stream, _) = H264.encode(16, 16, Array(m),
        H264.EncodeOpts(qp = qp))
      val f = H264.decode(stream).get
      val v = H264.vTab(qp % 6, 0)
      val dc =
        if (qp >= 36) (lvl * v) << (qp / 6 - 6)
        else (lvl * v + (1 << (5 - qp / 6))) >> (6 - qp / 6)
      val expect = math.max(0, math.min(255, 128 + ((dc + 32) >> 6)))
      assert(f.y.forall(_ == expect), s"qp=$qp lvl=$lvl: expected " +
        s"$expect, got ${f.y.take(4).toSeq}")
      assert(f.u.forall(_ == 128) && f.v.forall(_ == 128))
    }
  }

  test("I_PCM is bit-exact lossless: a PCM frame decodes to exactly the " +
    "raw samples, at any qp") {
    val r = rnd(7L)
    val py = Array.fill(256)(r.nextInt(256))
    val pcb = Array.fill(64)(r.nextInt(256))
    val pcr = Array.fill(64)(r.nextInt(256))
    for (qp <- Seq(0, 26, 51)) {
      val (s, _) = H264.encode(16, 16,
        Array(H264.MbSpec(mbType = H264.MB_PCM, pcmY = py, pcmCb = pcb,
          pcmCr = pcr)), H264.EncodeOpts(qp = qp))
      val f = H264.decode(s).get
      assert(f.y.toSeq == py.toSeq, "PCM luma must be lossless")
      assert(f.u.toSeq == pcb.toSeq && f.v.toSeq == pcr.toSeq)
    }
  }

  test("deblocking round-trip: decode(encode(deblock=true)) == the " +
    "encoder's filtered reconstruction, and the filter actually fires") {
    val r = rnd(6L)
    var everDiffered = false
    for (trial <- 1 to 40) {
      val mbW = 2 + r.nextInt(3)
      val mbH = 1 + r.nextInt(2)
      val qp = 18 + r.nextInt(34) // thresholds nonzero from ~16
      val mbs = Array.tabulate(mbW * mbH) { k =>
        val m = H264.MbSpec(mbType = 1)
        m.lumaDc(0) = r.nextInt(9) - 4
        m.lumaDc(1) = r.nextInt(5) - 2
        m.cbDc(0) = r.nextInt(5) - 2
        m.crDc(0) = r.nextInt(5) - 2
        m
      }
      val (onS, onR) = H264.encode(mbW * 16, mbH * 16, mbs,
        H264.EncodeOpts(qp = qp, deblock = true))
      val (offS, offR) = H264.encode(mbW * 16, mbH * 16, mbs,
        H264.EncodeOpts(qp = qp, deblock = false))
      val dOn = H264.decode(onS).get
      val dOff = H264.decode(offS).get
      assert(dOn.y.toSeq == onR.y.toSeq && dOn.u.toSeq == onR.u.toSeq &&
        dOn.v.toSeq == onR.v.toSeq, s"trial $trial: filtered mismatch")
      assert(dOff.y.toSeq == offR.y.toSeq, s"trial $trial: unfiltered")
      if (dOn.y.toSeq != dOff.y.toSeq) everDiffered = true
    }
    assert(everDiffered, "the deblocking filter never changed a pixel — " +
      "it cannot be exercised by these fixtures")
  }

  test("strong-filter hand check: two flat MBs differing by one step " +
    "get the published 3-tap boundary smoothing, column for column") {
    // two I_16x16 DC MBs: left reconstructs to a = 128, right to b via
    // an H-pred + DC delta; qp high enough that alpha/beta/strongOk all
    // pass, |a-b| small enough that second-order edges stay no-ops
    val qp = 40
    val m0 = H264.MbSpec(mbType = 1)
    val m1 = H264.MbSpec(mbType = 1, i16Mode = H264.I16_H,
      chromaMode = H264.CH_H)
    m1.lumaDc(0) = 2
    val (s, _) = H264.encode(32, 16, Array(m0, m1),
      H264.EncodeOpts(qp = qp, deblock = true))
    val f = H264.decode(s).get
    val a = 128
    val dc = {
      val v = H264.vTab(qp % 6, 0)
      (2 * v) << (qp / 6 - 6)
    }
    val b = 128 + ((dc + 32) >> 6)
    assert(b > a, "fixture needs a real step")
    // row 0 columns: 13,14,15 are p2',p1',p0'; 16,17,18 are q0',q1',q2'
    val y = f.y
    def col(c: Int) = y(0 * 32 + c)
    assert(col(12) == a && col(19) == b, "untouched columns moved")
    assert(col(15) == (a + 2 * a + 2 * a + 2 * b + b + 4) >> 3) // p0'
    assert(col(14) == (a + a + a + b + 2) >> 2) // p1'
    assert(col(13) == (2 * a + 3 * a + a + a + b + 4) >> 3) // p2'
    assert(col(16) == (b + 2 * b + 2 * b + 2 * a + a + 4) >> 3) // q0'
    assert(col(17) == (b + b + b + a + 2) >> 2) // q1'
    assert(col(18) == (2 * b + 3 * b + b + b + a + 4) >> 3) // q2'
    // every row identical (column bands)
    for (row <- 1 until 16; c <- 0 until 32)
      assert(y(row * 32 + c) == y(c), s"row $row col $c")
  }

  test("CABAC engine: decision/bypass/terminate round-trip through the " +
    "arithmetic coder for random bin sequences") {
    val r = rnd(8L)
    for (trial <- 1 to 200) {
      // a random schedule of (kind, ctx, bin): 0=decision, 1=bypass
      val schedule = Seq.fill(30 + r.nextInt(200))(
        (r.nextInt(2), r.nextInt(H264Cabac.N_CTX), r.nextInt(2)))
      val bw = new H264.BitWriter
      val wr = new H264Cabac.Writer(b => bw.bit(b))
      schedule.foreach {
        case (0, c, b) => wr.decision(c, b)
        case (_, _, b) => wr.bypass(b)
      }
      wr.terminate(1) // flush
      while (bw.byteAlignedBits != 0) bw.bit(0)
      val br = new H264.BitReader(bw.bytes())
      val rd = new H264Cabac.Reader(() => br.bit())
      schedule.foreach {
        case (0, c, b) => assert(rd.decision(c) == b, s"trial $trial")
        case (_, _, b) => assert(rd.bypass() == b, s"trial $trial")
      }
      assert(rd.terminate() == 1, s"trial $trial: terminate")
    }
  }

  test("CABAC whole-frame round-trip AND cross-entropy equivalence: the " +
    "same MB specs through CABAC and CAVLC reconstruct identically") {
    val r = rnd(9L)
    for (trial <- 1 to 40) {
      val mbW = 1 + r.nextInt(3)
      val mbH = 1 + r.nextInt(3)
      val width = mbW * 16 - 2 * r.nextInt(3)
      val height = mbH * 16 - 2 * r.nextInt(3)
      val qp = 8 + r.nextInt(44)
      def sparse(n: Int, from: Int, density: Double, mag: Int): Array[Int] = {
        val a = new Array[Int](n)
        (from until n).foreach { i =>
          if (r.nextDouble() < density)
            a(i) = (1 + r.nextInt(mag)) * (if (r.nextBoolean()) 1 else -1)
        }
        a
      }
      val mbs = Array.tabulate(mbW * mbH) { k =>
        val mbX = k % mbW; val mbY = k / mbW
        val hasA = mbY > 0; val hasL = mbX > 0
        val chromaCands = Seq(H264.CH_DC) ++
          (if (hasL) Seq(H264.CH_H) else Nil) ++
          (if (hasA) Seq(H264.CH_V) else Nil) ++
          (if (hasA && hasL) Seq(H264.CH_PLANE) else Nil)
        if (r.nextBoolean()) {
          val cands = Seq(H264.I16_DC) ++
            (if (hasA) Seq(H264.I16_V) else Nil) ++
            (if (hasL) Seq(H264.I16_H) else Nil) ++
            (if (hasA && hasL) Seq(H264.I16_PLANE) else Nil)
          H264.MbSpec(mbType = 1,
            i16Mode = cands(r.nextInt(cands.length)),
            chromaMode = chromaCands(r.nextInt(chromaCands.length)),
            lumaDc = sparse(16, 0, 0.4, 40),
            lumaAc = Array.fill(16)(sparse(16, 1, 0.15, 900)),
            cbDc = sparse(4, 0, 0.5, 20), crDc = sparse(4, 0, 0.5, 20),
            cbAc = Array.fill(4)(sparse(16, 1, 0.1, 8)),
            crAc = Array.fill(4)(sparse(16, 1, 0.1, 8)))
        } else {
          val modes = Array.tabulate(16) { b =>
            val (x4, y4) = (2 * ((b >> 2) & 1) + (b & 1),
              2 * (b >> 3) + ((b >> 1) & 1))
            val bA = hasA || y4 > 0
            val bL = hasL || x4 > 0
            val cands = Seq(H264.B_DC) ++
              (if (bA) Seq(H264.B_V, H264.B_DDL, H264.B_VL) else Nil) ++
              (if (bL) Seq(H264.B_H, H264.B_HU) else Nil) ++
              (if (bA && bL) Seq(H264.B_DDR, H264.B_VR, H264.B_HD) else Nil)
            cands(r.nextInt(cands.length))
          }
          H264.MbSpec(mbType = 0, b4Modes = modes,
            chromaMode = chromaCands(r.nextInt(chromaCands.length)),
            lumaAc = Array.fill(16)(sparse(16, 0, 0.2, 25)),
            cbDc = sparse(4, 0, 0.5, 20), crDc = sparse(4, 0, 0.5, 20),
            cbAc = Array.fill(4)(sparse(16, 1, 0.1, 8)),
            crAc = Array.fill(4)(sparse(16, 1, 0.1, 8)))
        }
      }
      val (sCab, rCab) = H264.encode(width, height, mbs,
        H264.EncodeOpts(qp = qp, cabac = true))
      val (sCav, rCav) = H264.encode(width, height, mbs,
        H264.EncodeOpts(qp = qp, cabac = false))
      val dCab = H264.decode(sCab)
      assert(dCab.isDefined, s"trial $trial: CABAC decode failed")
      assert(dCab.get.y.toSeq == rCab.y.toSeq &&
        dCab.get.u.toSeq == rCab.u.toSeq &&
        dCab.get.v.toSeq == rCab.v.toSeq,
        s"trial $trial: CABAC round-trip mismatch")
      // the two entropy modes carry the SAME quantised coefficients, so
      // their reconstructions must be pixel-identical
      assert(rCab.y.toSeq == rCav.y.toSeq &&
        rCab.u.toSeq == rCav.u.toSeq && rCab.v.toSeq == rCav.v.toSeq,
        s"trial $trial: CABAC vs CAVLC reconstruction diverged")
      assert(H264.decode(sCav).get.y.toSeq == rCav.y.toSeq)
    }
  }

  test("CABAC composes with the deblocking filter: " +
    "decode(encode(cabac=true, deblock=true)) == filtered recon") {
    val r = rnd(10L)
    for (trial <- 1 to 10) {
      val mbW = 2 + r.nextInt(2)
      val qp = 20 + r.nextInt(30)
      val mbs = Array.tabulate(mbW) { _ =>
        val m = H264.MbSpec(mbType = 1)
        m.lumaDc(0) = r.nextInt(7) - 3
        m.cbDc(0) = r.nextInt(5) - 2
        m
      }
      val (s, recon) = H264.encode(mbW * 16, 16, mbs,
        H264.EncodeOpts(qp = qp, deblock = true, cabac = true))
      val f = H264.decode(s)
      assert(f.isDefined, s"trial $trial")
      assert(f.get.y.toSeq == recon.y.toSeq &&
        f.get.u.toSeq == recon.u.toSeq && f.get.v.toSeq == recon.v.toSeq,
        s"trial $trial: cabac+deblock mismatch")
    }
  }

  test("hostile input degrades to None, never throws: truncations, bit " +
    "flips, and garbage never crash the task") {
    val m = H264.MbSpec(mbType = 1)
    m.lumaDc(0) = 5
    val (stream, _) = H264.encode(32, 32,
      Array(m, H264.MbSpec(mbType = 1), H264.MbSpec(mbType = 0),
        H264.MbSpec(mbType = 1)), H264.EncodeOpts(qp = 26))
    val r = rnd(5L)
    for (len <- 0 until stream.length by 3)
      H264.decode(stream.take(len)) // must not throw
    for (_ <- 1 to 300) {
      val mut = stream.clone()
      val i = r.nextInt(mut.length)
      mut(i) = (mut(i) ^ (1 << r.nextInt(8))).toByte
      H264.decode(mut) // may decode differently or None, never throw
    }
    H264.decode(Array.fill(64)(r.nextInt(256).toByte))
  }

  test("hostile input, CABAC path: truncations, bit flips, and garbage " +
    "never crash or spin the arithmetic decoder") {
    // the round-10 verdict's gap: the mutation loop covered CAVLC only,
    // and the CABAC renormalisation loop is exactly the kind of stateful
    // bit-consumer a crafted stream could spin or overread
    val m = H264.MbSpec(mbType = 1)
    m.lumaDc(0) = 5
    val mbs = Array(m, H264.MbSpec(mbType = 1), H264.MbSpec(mbType = 0),
      H264.MbSpec(mbType = 1))
    for (deblock <- Seq(false, true)) {
      val (stream, recon) = H264.encode(32, 32, mbs,
        H264.EncodeOpts(qp = 26, cabac = true, deblock = deblock))
      // sanity: the unmutated stream still decodes to the reconstruction
      val ok = H264.decode(stream)
      assert(ok.exists(_.y.toSeq == recon.y.toSeq))
      val r = rnd(7L)
      for (len <- 0 until stream.length by 3)
        H264.decode(stream.take(len)) // must not throw
      for (_ <- 1 to 300) {
        val mut = stream.clone()
        val i = r.nextInt(mut.length)
        mut(i) = (mut(i) ^ (1 << r.nextInt(8))).toByte
        H264.decode(mut) // may decode differently or None, never throw/spin
      }
      H264.decode(Array.fill(64)(r.nextInt(256).toByte))
    }
  }

  test("hostile input, MP4/avcC ingest path: mutated and truncated " +
    "containers never crash the demux -> avcC -> AVCC -> decode chain") {
    import graft.multimodal.Multimodal._
    val m = H264.MbSpec(mbType = 1)
    m.lumaDc(0) = 3
    val mbs = Array(m, H264.MbSpec(mbType = 0))
    for (cabac <- Seq(false, true)) {
      val (sps, pps, idr, _) = H264.encodeNals(32, 16, mbs,
        H264.EncodeOpts(qp = 24, cabac = cabac))
      val len = idr.length
      val sample = Array[Byte]((len >> 24).toByte, (len >> 16).toByte,
        (len >> 8).toByte, len.toByte) ++ idr
      val file = muxMp4Video(32, 16, Array(sample), "avc1",
        buildAvcc(sps, pps))
      def ingest(bytes: Array[Byte]): Unit =
        for {
          info <- parseMjpeg(bytes)
          if info.codec == "avc1"
          (s, p) <- parseAvcc(info.entryExt)
        } info.frames.foreach(sm =>
          avccSampleToAnnexB(s, p, sm).foreach(H264.decode))
      ingest(file) // sanity: the clean chain runs
      assert(parseMjpeg(file).exists(_.frames.length == 1))
      val r = rnd(13L)
      for (cut <- 0 until file.length by 7)
        ingest(file.take(cut)) // truncation sweep, must not throw
      for (_ <- 1 to 300) {
        val mut = file.clone()
        val i = r.nextInt(mut.length)
        mut(i) = (mut(i) ^ (1 << r.nextInt(8))).toByte
        ingest(mut) // box sizes, avcC lengths, NAL prefixes all mutable
      }
      ingest(Array.fill(128)(r.nextInt(256).toByte))
    }
  }
}
