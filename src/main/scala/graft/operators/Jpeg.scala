package graft.operators

/** Baseline-sequential JPEG decoder with the JDK alone — no codec
  * library: marker parse (DQT/DHT/SOF0/SOS/DRI), canonical Huffman
  * entropy decode with byte unstuffing and restart markers,
  * dequantize + de-zigzag, the libjpeg `jidctint` fixed-point IDCT,
  * libjpeg "fancy" (triangle) chroma upsampling for 4:2:0 / 4:2:2,
  * and the libjpeg fixed-point YCbCr→RGB conversion. Matching
  * libjpeg's exact integer arithmetic matters: the fixture JPEGs are
  * written by `javax.imageio` (libjpeg-based), so this decoder's
  * output can be spec-checked pixel-for-pixel against `ImageIO.read`
  * (MultimodalSpec) — the strongest oracle a lossy format admits.
  *
  * Supported: 8-bit baseline (SOF0), extended-sequential (SOF1) and
  * PROGRESSIVE (SOF2) huffman scans, 1 or 3 components, chroma
  * sampling 1x1 / 2x1 / 2x2. Progressive decode accumulates
  * unquantized coefficients across scans (DC first/refine with
  * successive approximation, AC first/refine with EOB runs and the
  * correction-bit walk of ITU T.81 §G.2), then runs the same
  * dequantize + IDCT + upsample + convert tail as baseline — the
  * entropy stages are lossless, so a progressive re-encode of the
  * same coefficients reconstructs bit-identically. Anything else —
  * arithmetic coding, 12-bit, hierarchical, exotic sampling, corrupt
  * bytes — degrades to (0, 0, empty), never throws: at 100 TB a bad
  * record must be a filterable row, not a dead stage.
  *
  * Scale shape: pure per-record byte kernel (no allocation beyond
  * the component planes), driven from `mapPartitions` like the PNG
  * path — decoding an image corpus never shuffles.
  */
object Jpeg {

  /** Stream order -> natural (row-major) coefficient position. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    // canonical code tables per Annex C: mincode/maxcode/valptr by length
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l)
        k += bits(l)
        maxCode(l) = if (bits(l) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    def value(l: Int, code: Int): Int = vals(valPtr(l) + code - minCode(l))
  }

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0
    var hitMarker = false
    def nextBit(): Int = {
      if (cnt == 0) {
        if (pos >= data.length) { hitMarker = true; return 0 }
        var b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= data.length) { hitMarker = true; return 0 }
          val b2 = data(pos) & 0xff
          if (b2 == 0x00) pos += 1 // stuffed byte
          else { hitMarker = true; b = 0xff } // real marker: stop soon
        }
        buf = b; cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    def align(): Unit = cnt = 0
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  // ------------------------------------------------- libjpeg jidctint
  // CONST_BITS = 13, PASS1_BITS = 2 — the exact fixed-point constants
  private final val F_0_298631336 = 2446
  private final val F_0_390180644 = 3196
  private final val F_0_541196100 = 4433
  private final val F_0_765366865 = 6270
  private final val F_0_899976223 = 7373
  private final val F_1_175875602 = 9633
  private final val F_1_501321110 = 12299
  private final val F_1_847759065 = 15137
  private final val F_1_961570560 = 16069
  private final val F_2_053119869 = 16819
  private final val F_2_562915447 = 20995
  private final val F_3_072711026 = 25172

  private def descale(x: Long, n: Int): Int = ((x + (1L << (n - 1))) >> n).toInt

  /** In-place 8x8 IDCT of natural-order dequantized coefficients,
    * emitting level-shifted clamped samples — bit-compatible with
    * libjpeg's `jpeg_idct_islow`.
    */
  private def idct8x8(coef: Array[Int], out: Array[Int]): Unit = {
    val ws = new Array[Int](64)
    // pass 1: columns
    var c = 0
    while (c < 8) {
      if (coef(8 + c) == 0 && coef(16 + c) == 0 && coef(24 + c) == 0 &&
        coef(32 + c) == 0 && coef(40 + c) == 0 && coef(48 + c) == 0 && coef(56 + c) == 0) {
        val dc = coef(c) << 2 // PASS1_BITS
        var i = 0
        while (i < 8) { ws(i * 8 + c) = dc; i += 1 }
      } else {
        val z2 = coef(16 + c).toLong; val z3 = coef(48 + c).toLong
        var z1 = (z2 + z3) * F_0_541196100
        val tmp2 = z1 + z3 * (-F_1_847759065)
        val tmp3 = z1 + z2 * F_0_765366865
        var tmp0 = (coef(c).toLong + coef(32 + c).toLong) << 13
        var tmp1 = (coef(c).toLong - coef(32 + c).toLong) << 13
        val t10 = tmp0 + tmp3; val t13 = tmp0 - tmp3
        val t11 = tmp1 + tmp2; val t12 = tmp1 - tmp2
        val o0 = coef(56 + c).toLong; val o1 = coef(40 + c).toLong
        val o2 = coef(24 + c).toLong; val o3 = coef(8 + c).toLong
        z1 = o0 + o3; var z2b = o1 + o2
        var z3b = o0 + o2; var z4 = o1 + o3
        val z5 = (z3b + z4) * F_1_175875602
        var t0 = o0 * F_0_298631336
        var t1 = o1 * F_2_053119869
        var t2 = o2 * F_3_072711026
        var t3 = o3 * F_1_501321110
        z1 *= -F_0_899976223
        z2b *= -F_2_562915447
        z3b = z3b * (-F_1_961570560) + z5
        z4 = z4 * (-F_0_390180644) + z5
        t0 += z1 + z3b; t1 += z2b + z4
        t2 += z2b + z3b; t3 += z1 + z4
        ws(c) = descale(t10 + t3, 13 - 2)
        ws(56 + c) = descale(t10 - t3, 13 - 2)
        ws(8 + c) = descale(t11 + t2, 13 - 2)
        ws(48 + c) = descale(t11 - t2, 13 - 2)
        ws(16 + c) = descale(t12 + t1, 13 - 2)
        ws(40 + c) = descale(t12 - t1, 13 - 2)
        ws(24 + c) = descale(t13 + t0, 13 - 2)
        ws(32 + c) = descale(t13 - t0, 13 - 2)
      }
      c += 1
    }
    // pass 2: rows; final descale by CONST_BITS+PASS1_BITS+3 = 18
    var r = 0
    while (r < 8) {
      val o = r * 8
      val z2 = ws(o + 2).toLong; val z3 = ws(o + 6).toLong
      var z1 = (z2 + z3) * F_0_541196100
      val tmp2 = z1 + z3 * (-F_1_847759065)
      val tmp3 = z1 + z2 * F_0_765366865
      var tmp0 = (ws(o).toLong + ws(o + 4).toLong) << 13
      var tmp1 = (ws(o).toLong - ws(o + 4).toLong) << 13
      val t10 = tmp0 + tmp3; val t13 = tmp0 - tmp3
      val t11 = tmp1 + tmp2; val t12 = tmp1 - tmp2
      val o0 = ws(o + 7).toLong; val o1 = ws(o + 5).toLong
      val o2 = ws(o + 3).toLong; val o3 = ws(o + 1).toLong
      z1 = o0 + o3; var z2b = o1 + o2
      var z3b = o0 + o2; var z4 = o1 + o3
      val z5 = (z3b + z4) * F_1_175875602
      var t0 = o0 * F_0_298631336
      var t1 = o1 * F_2_053119869
      var t2 = o2 * F_3_072711026
      var t3 = o3 * F_1_501321110
      z1 *= -F_0_899976223
      z2b *= -F_2_562915447
      z3b = z3b * (-F_1_961570560) + z5
      z4 = z4 * (-F_0_390180644) + z5
      t0 += z1 + z3b; t1 += z2b + z4
      t2 += z2b + z3b; t3 += z1 + z4
      def clampShift(x: Long): Int = {
        val v = descale(x, 18) + 128
        if (v < 0) 0 else if (v > 255) 255 else v
      }
      out(o) = clampShift(t10 + t3)
      out(o + 7) = clampShift(t10 - t3)
      out(o + 1) = clampShift(t11 + t2)
      out(o + 6) = clampShift(t11 - t2)
      out(o + 2) = clampShift(t12 + t1)
      out(o + 5) = clampShift(t12 - t1)
      out(o + 3) = clampShift(t13 + t0)
      out(o + 4) = clampShift(t13 - t0)
      r += 1
    }
  }

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTab = 0
    var acTab = 0
    var pred = 0
  }

  /** Natural position for zigzag index `k`, tolerant of the corrupt
    * over-run positions libjpeg pads its natural-order table for
    * (k > 63 clamps to 63 instead of crashing the record).
    */
  private def zigzagAt(k: Int): Int = if (k < 64) Zigzag(k) else 63

  /** Parse one DQT segment into `qt` (zigzag order, as stored).
    * Returns false on malformed table ids.
    */
  private def parseDqt(bytes: Array[Byte], seg: Int, len: Int,
      qt: Array[Array[Int]]): Boolean = {
    def u8(i: Int) = bytes(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    var p = seg
    while (p < seg + len - 2) {
      val pq = u8(p) >> 4; val tq = u8(p) & 15
      if (tq > 3) return false
      var k = 0
      if (pq == 0) { while (k < 64) { qt(tq)(k) = u8(p + 1 + k); k += 1 }; p += 65 }
      else { while (k < 64) { qt(tq)(k) = be16(p + 1 + 2 * k); k += 1 }; p += 129 }
    }
    true
  }

  /** Parse one DHT segment into the DC/AC table slots. Returns false
    * on malformed table ids.
    */
  private def parseDht(bytes: Array[Byte], seg: Int, len: Int,
      dcHuff: Array[Huff], acHuff: Array[Huff]): Boolean = {
    def u8(i: Int) = bytes(i) & 0xff
    var p = seg
    while (p < seg + len - 2) {
      val tc = u8(p) >> 4; val th = u8(p) & 15
      if (th > 3 || tc > 1) return false
      val bits = new Array[Int](17)
      var n = 0
      var l = 1
      while (l <= 16) { bits(l) = u8(p + l); n += bits(l); l += 1 }
      val vals = new Array[Int](n)
      var k = 0
      while (k < n) { vals(k) = u8(p + 17 + k); k += 1 }
      val tab = new Huff(bits, vals)
      if (tc == 0) dcHuff(th) = tab else acHuff(th) = tab
      p += 17 + n
    }
    true
  }

  /** Decode to (width, height, row-major packed 0xRRGGBB). */
  def decodePixels(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val zero = (0, 0, Array.empty[Int])
    try decode0(bytes).getOrElse(zero)
    catch { case _: Exception => zero }
  }

  private def decode0(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    def u8(i: Int) = bytes(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    if (bytes.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) return None

    val qt = Array.ofDim[Int](4, 64) // zigzag order, as stored
    val dcHuff = new Array[Huff](4)
    val acHuff = new Array[Huff](4)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var i = 2
    var sosAt = -1
    while (sosAt < 0 && i + 4 <= bytes.length) {
      if (u8(i) != 0xff) return None
      val m = u8(i + 1)
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) { i += 2 }
      else {
        val len = be16(i + 2)
        val seg = i + 4
        m match {
          case 0xdb => // DQT
            if (!parseDqt(bytes, seg, len, qt)) return None
          case 0xc4 => // DHT
            if (!parseDht(bytes, seg, len, dcHuff, acHuff)) return None
          case 0xc0 | 0xc1 => // SOF0/1 baseline & extended sequential
            if (u8(seg) != 8) return None // 8-bit only
            h = be16(seg + 1); w = be16(seg + 3)
            val nc = u8(seg + 5)
            if (w <= 0 || h <= 0 || (nc != 1 && nc != 3)) return None
            comps = (0 until nc).map { c =>
              val o = seg + 6 + 3 * c
              Component(u8(o), u8(o + 1) >> 4, u8(o + 1) & 15, u8(o + 2))
            }.toArray
          case 0xc2 => // SOF2: progressive — its own multi-scan walk
            return decodeProg0(bytes)
          case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            return None // arithmetic / hierarchical / lossless
          case 0xdd => restartInterval = be16(seg) // DRI
          case 0xda => // SOS
            if (comps == null) return None
            val ns = u8(seg)
            if (ns != comps.length) return None
            var c = 0
            while (c < ns) {
              val cs = u8(seg + 1 + 2 * c); val tt = u8(seg + 2 + 2 * c)
              comps.find(_.id == cs) match {
                case Some(comp) => comp.dcTab = tt >> 4; comp.acTab = tt & 15
                case None       => return None
              }
              c += 1
            }
            sosAt = seg + 1 + 2 * ns + 3 // skip Ss/Se/AhAl
          case _ => () // APPn/COM/...: skip
        }
        if (sosAt < 0) i += 2 + len
      }
    }
    if (sosAt < 0 || comps == null) return None
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    if (hmax < 1 || hmax > 2 || vmax < 1 || vmax > 2) return None
    comps.foreach { cmp =>
      // supported chroma shapes: full-res, h2v1, h2v2
      if (cmp.h < 1 || cmp.v < 1 || hmax % cmp.h != 0 || vmax % cmp.v != 0) return None
    }

    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    // per-component padded planes (block coverage)
    val planeW = comps.map(cmp => mcusX * cmp.h * 8)
    val planeH = comps.map(cmp => mcusY * cmp.v * 8)
    val planes = comps.indices.map(ci => new Array[Int](planeW(ci) * planeH(ci))).toArray

    val br = new BitReader(bytes, sosAt)
    val coef = new Array[Int](64)
    val blk = new Array[Int](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    var sinceRestart = 0
    while (mcu < nMcus) {
      if (restartInterval > 0 && sinceRestart == restartInterval) {
        // byte-align, expect RSTn, reset predictors
        br.align()
        var p = br.pos
        while (p + 1 < bytes.length && !((bytes(p) & 0xff) == 0xff &&
          (bytes(p + 1) & 0xff) >= 0xd0 && (bytes(p + 1) & 0xff) <= 0xd7)) p += 1
        if (p + 1 >= bytes.length) return None
        br.pos = p + 2
        br.hitMarker = false
        comps.foreach(_.pred = 0)
        sinceRestart = 0
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val cmp = comps(ci)
        val q = qt(cmp.tq)
        val dc = dcHuff(cmp.dcTab); val ac = acHuff(cmp.acTab)
        if (dc == null || ac == null) return None
        var by = 0
        while (by < cmp.v) {
          var bx = 0
          while (bx < cmp.h) {
            java.util.Arrays.fill(coef, 0)
            // DC
            val t = huffDecode(br, dc)
            if (t < 0) return None
            cmp.pred += extend(br.receive(t), t)
            coef(0) = cmp.pred * q(0)
            // AC
            var k = 1
            var open = true
            while (open && k < 64) {
              val rs = huffDecode(br, ac)
              if (rs < 0) return None
              val r = rs >> 4; val s = rs & 15
              if (s == 0) { if (r == 15) k += 16 else open = false }
              else {
                k += r
                if (k > 63) return None
                coef(Zigzag(k)) = extend(br.receive(s), s) * q(k)
                k += 1
              }
            }
            if (br.hitMarker && mcu < nMcus - 1) return None
            idct8x8(coef, blk)
            val px0 = (mx * cmp.h + bx) * 8
            val py0 = (my * cmp.v + by) * 8
            var yy = 0
            while (yy < 8) {
              System.arraycopy(blk, yy * 8, planes(ci), (py0 + yy) * planeW(ci) + px0, 8)
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      sinceRestart += 1
      mcu += 1
    }

    planesToRgb(comps, planes, planeW, w, h, hmax, vmax)
  }

  /** Shared decode tail: chroma upsample to full resolution + color
    * convert (grayscale passthrough for 1-component images).
    */
  private def planesToRgb(comps: Array[Component], planes: Array[Array[Int]],
      planeW: Array[Int], w: Int, h: Int, hmax: Int, vmax: Int): Option[(Int, Int, Array[Int])] = {
    val out = new Array[Int](w * h)
    if (comps.length == 1) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = planes(0)(y * planeW(0) + x)
          out(y * w + x) = (v << 16) | (v << 8) | v
          x += 1
        }
        y += 1
      }
      return Some((w, h, out))
    }
    val full = comps.indices.map { ci =>
      val cmp = comps(ci)
      if (cmp.h == hmax && cmp.v == vmax) (planes(ci), planeW(ci))
      else {
        val dw = (w * cmp.h + hmax - 1) / hmax
        val dh = (h * cmp.v + vmax - 1) / vmax
        val up =
          if (cmp.h * 2 == hmax && cmp.v * 2 == vmax)
            fancyH2V2(planes(ci), planeW(ci), dw, dh)
          else if (cmp.h * 2 == hmax && cmp.v == vmax)
            fancyH2V1(planes(ci), planeW(ci), dw, dh)
          else return None
        up
      }
    }.toArray
    yccToRgb(full, w, h, out)
    Some((w, h, out))
  }

  /** Progressive (SOF2) decode: its own marker walk because scans
    * repeat — DHT/DQT/DRI segments may appear between any two SOS
    * segments, and every SOS carries its own spectral band (Ss..Se)
    * and successive-approximation position (Ah, Al). Coefficients
    * accumulate unquantized (natural order, scaled by `<< Al`) in
    * per-component whole-image buffers across scans — the same
    * d_coef_controller shape libjpeg uses — then dequantize + IDCT +
    * upsample + convert through the shared baseline tail. The entropy
    * stages are lossless, so the reconstruction is bit-identical to a
    * sequential encode of the same quantized coefficients.
    */
  private def decodeProg0(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    def u8(i: Int) = bytes(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)

    val qt = Array.ofDim[Int](4, 64) // zigzag order, as stored
    val dcHuff = new Array[Huff](4)
    val acHuff = new Array[Huff](4)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var hmax = 0; var vmax = 0
    var mcusX = 0; var mcusY = 0
    var restartInterval = 0
    var coefs: Array[Array[Int]] = null // per comp: blocks-raster x 64, natural order
    var blocksW: Array[Int] = null // MCU-padded block stride per comp
    var blocksH: Array[Int] = null

    var i = 2
    var done = false
    while (!done && i + 2 <= bytes.length) {
      if (u8(i) != 0xff) return None
      val m = u8(i + 1)
      if (m == 0xd9) done = true // EOI
      else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) i += 2
      else {
        if (i + 4 > bytes.length) return None
        val len = be16(i + 2)
        val seg = i + 4
        var nextI = i + 2 + len
        m match {
          case 0xdb => if (!parseDqt(bytes, seg, len, qt)) return None
          case 0xc4 => if (!parseDht(bytes, seg, len, dcHuff, acHuff)) return None
          case 0xdd => restartInterval = be16(seg)
          case 0xc2 =>
            if (u8(seg) != 8) return None // 8-bit only
            h = be16(seg + 1); w = be16(seg + 3)
            val nc = u8(seg + 5)
            if (w <= 0 || h <= 0 || (nc != 1 && nc != 3)) return None
            comps = (0 until nc).map { c =>
              val o = seg + 6 + 3 * c
              Component(u8(o), u8(o + 1) >> 4, u8(o + 1) & 15, u8(o + 2))
            }.toArray
            hmax = comps.map(_.h).max; vmax = comps.map(_.v).max
            if (hmax < 1 || hmax > 2 || vmax < 1 || vmax > 2) return None
            comps.foreach { cmp =>
              if (cmp.h < 1 || cmp.v < 1 || hmax % cmp.h != 0 || vmax % cmp.v != 0) return None
            }
            mcusX = (w + 8 * hmax - 1) / (8 * hmax)
            mcusY = (h + 8 * vmax - 1) / (8 * vmax)
            blocksW = comps.map(c => mcusX * c.h)
            blocksH = comps.map(c => mcusY * c.v)
            coefs = comps.indices.map(ci => new Array[Int](blocksW(ci) * blocksH(ci) * 64)).toArray
          case 0xc0 | 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            return None // second frame / arithmetic / hierarchical
          case 0xda => // one scan
            if (comps == null) return None
            val ns = u8(seg)
            if (ns < 1 || ns > comps.length) return None
            val scanCis = new Array[Int](ns)
            var c = 0
            while (c < ns) {
              val cs = u8(seg + 1 + 2 * c); val tt = u8(seg + 2 + 2 * c)
              val ci = comps.indexWhere(_.id == cs)
              if (ci < 0) return None
              comps(ci).dcTab = tt >> 4
              comps(ci).acTab = tt & 15
              scanCis(c) = ci
              c += 1
            }
            val ss = u8(seg + 1 + 2 * ns)
            val se = u8(seg + 2 + 2 * ns)
            val ahal = u8(seg + 3 + 2 * ns)
            val pos = decodeProgScan(bytes, seg + 4 + 2 * ns, scanCis,
              ss, se, ahal >> 4, ahal & 15, comps, coefs, blocksW,
              mcusX, mcusY, hmax, vmax, dcHuff, acHuff, restartInterval, w, h)
            if (pos < 0) return None
            nextI = pos
          case _ => () // APPn/COM/...: skip
        }
        i = nextI
      }
    }
    if (comps == null || coefs == null) return None

    // dequantize + IDCT every (MCU-padded) block into sample planes,
    // then the shared upsample/convert tail
    val planeW = comps.indices.map(ci => blocksW(ci) * 8).toArray
    val planes = comps.indices.map(ci => new Array[Int](planeW(ci) * blocksH(ci) * 8)).toArray
    val deq = new Array[Int](64)
    val blk = new Array[Int](64)
    var ci = 0
    while (ci < comps.length) {
      // quant table de-zigzagged to natural positions once per comp
      val q = qt(comps(ci).tq)
      val qNat = new Array[Int](64)
      var k = 0
      while (k < 64) { qNat(Zigzag(k)) = q(k); k += 1 }
      val cArr = coefs(ci)
      val bW = blocksW(ci)
      val nB = bW * blocksH(ci)
      var b = 0
      while (b < nB) {
        val base = b * 64
        k = 0
        while (k < 64) { deq(k) = cArr(base + k) * qNat(k); k += 1 }
        idct8x8(deq, blk)
        val px0 = (b % bW) * 8
        val py0 = (b / bW) * 8
        var yy = 0
        while (yy < 8) {
          System.arraycopy(blk, yy * 8, planes(ci), (py0 + yy) * planeW(ci) + px0, 8)
          yy += 1
        }
        b += 1
      }
      ci += 1
    }
    planesToRgb(comps, planes, planeW, w, h, hmax, vmax)
  }

  /** Decode one progressive scan's entropy data into the coefficient
    * buffers (ITU T.81 §G.2; control flow mirrors libjpeg's jdphuff
    * decode_mcu_DC/AC_first/refine). Returns the offset of the next
    * marker after the scan, or -1 on corrupt data.
    */
  private def decodeProgScan(bytes: Array[Byte], start: Int,
      scanCis: Array[Int], ss: Int, se: Int, ah: Int, al: Int,
      comps: Array[Component], coefs: Array[Array[Int]], blocksW: Array[Int],
      mcusX: Int, mcusY: Int, hmax: Int, vmax: Int,
      dcHuff: Array[Huff], acHuff: Array[Huff],
      restartInterval: Int, w: Int, h: Int): Int = {
    // scan-header validity: DC scans are Ss=Se=0 (only they may
    // interleave); AC scans are single-component bands within 1..63
    if (ss == 0) { if (se != 0) return -1 }
    else if (scanCis.length != 1 || se < ss || se > 63) return -1

    val br = new BitReader(bytes, start)
    comps.foreach(_.pred = 0)
    var eobrun = 0
    val p1 = 1 << al
    val m1 = -1 << al

    def skipRestart(): Boolean = {
      br.align()
      var p = br.pos
      while (p + 1 < bytes.length && !((bytes(p) & 0xff) == 0xff &&
        (bytes(p + 1) & 0xff) >= 0xd0 && (bytes(p + 1) & 0xff) <= 0xd7)) p += 1
      if (p + 1 >= bytes.length) false
      else {
        br.pos = p + 2
        br.hitMarker = false
        comps.foreach(_.pred = 0)
        eobrun = 0
        true
      }
    }

    def decodeDcBlock(cmp: Component, cArr: Array[Int], base: Int): Boolean = {
      if (ah == 0) {
        val dc = dcHuff(cmp.dcTab)
        if (dc == null) return false
        val t = huffDecode(br, dc)
        if (t < 0) return false
        cmp.pred += extend(br.receive(t), t)
        cArr(base) = cmp.pred << al
      } else if (br.nextBit() != 0) cArr(base) |= p1
      true
    }

    def decodeAcFirst(cmp: Component, cArr: Array[Int], base: Int): Boolean = {
      if (eobrun > 0) { eobrun -= 1; return true }
      val ac = acHuff(cmp.acTab)
      if (ac == null) return false
      var k = ss
      while (k <= se) {
        val rs = huffDecode(br, ac)
        if (rs < 0) return false
        val r = rs >> 4; val s = rs & 15
        if (s != 0) {
          k += r
          if (k > 63) return false
          cArr(base + zigzagAt(k)) = extend(br.receive(s), s) << al
          k += 1
        } else if (r != 15) { // EOBn: this block joins the run
          eobrun = (1 << r) - 1
          if (r > 0) eobrun += br.receive(r)
          k = se + 1
        } else k += 16 // ZRL
      }
      true
    }

    def refineBit(cArr: Array[Int], idx: Int): Unit = {
      if (br.nextBit() != 0 && (cArr(idx) & p1) == 0)
        cArr(idx) += (if (cArr(idx) >= 0) p1 else m1)
    }

    def decodeAcRefine(cmp: Component, cArr: Array[Int], base: Int): Boolean = {
      val ac = acHuff(cmp.acTab)
      if (ac == null) return false
      var k = ss
      if (eobrun == 0) {
        var ended = false
        while (k <= se && !ended) {
          val rs = huffDecode(br, ac)
          if (rs < 0) return false
          var r = rs >> 4
          var s = 0
          if ((rs & 15) != 0) {
            // newly nonzero coefficient: magnitude 1 at this Al
            s = if (br.nextBit() != 0) p1 else m1
          } else if (r != 15) { // EOBn: rest of band is EOB logic below
            eobrun = 1 << r
            if (r > 0) eobrun += br.receive(r)
            ended = true
          } // else ZRL: s stays 0, advance over 16 zero-history coefs
          if (!ended) {
            // advance over r still-zero coefs, appending correction
            // bits to every already-nonzero coefficient passed over
            var advancing = true
            while (advancing && k <= se) {
              val idx = base + zigzagAt(k)
              if (cArr(idx) != 0) refineBit(cArr, idx)
              else if (r == 0) advancing = false // target zero slot: k stays
              else r -= 1
              if (advancing) k += 1
            }
            if (s != 0 && k <= 63) cArr(base + zigzagAt(k)) = s
            k += 1
          }
        }
      }
      if (eobrun > 0) {
        // correction bits for the remaining nonzero coefs in the band
        while (k <= se) {
          val idx = base + zigzagAt(k)
          if (cArr(idx) != 0) refineBit(cArr, idx)
          k += 1
        }
        eobrun -= 1
      }
      true
    }

    var ok = true
    if (scanCis.length > 1) {
      // interleaved DC scan: MCU order, h x v blocks per component
      var mcu = 0
      val nMcus = mcusX * mcusY
      var sinceRestart = 0
      while (ok && mcu < nMcus) {
        if (restartInterval > 0 && sinceRestart == restartInterval) {
          if (!skipRestart()) return -1
          sinceRestart = 0
        }
        val mx = mcu % mcusX
        val my = mcu / mcusX
        var c = 0
        while (ok && c < scanCis.length) {
          val ci = scanCis(c)
          val cmp = comps(ci)
          var by = 0
          while (ok && by < cmp.v) {
            var bx = 0
            while (ok && bx < cmp.h) {
              val base = ((my * cmp.v + by) * blocksW(ci) + mx * cmp.h + bx) * 64
              ok = decodeDcBlock(cmp, coefs(ci), base)
              bx += 1
            }
            by += 1
          }
          c += 1
        }
        sinceRestart += 1
        mcu += 1
      }
    } else {
      // non-interleaved: the component's own block raster over its
      // ceil(sample-dims / 8) grid (NOT the MCU-padded grid)
      val ci = scanCis(0)
      val cmp = comps(ci)
      val bW = (((w * cmp.h + hmax - 1) / hmax) + 7) / 8
      val bH = (((h * cmp.v + vmax - 1) / vmax) + 7) / 8
      var b = 0
      val nB = bW * bH
      var sinceRestart = 0
      while (ok && b < nB) {
        if (restartInterval > 0 && sinceRestart == restartInterval) {
          if (!skipRestart()) return -1
          sinceRestart = 0
        }
        val base = ((b / bW) * blocksW(ci) + (b % bW)) * 64
        ok =
          if (ss == 0) decodeDcBlock(cmp, coefs(ci), base)
          else if (ah == 0) decodeAcFirst(cmp, coefs(ci), base)
          else decodeAcRefine(cmp, coefs(ci), base)
        sinceRestart += 1
        b += 1
      }
    }
    // bits may only run out AFTER the last block's last request
    if (!ok || br.hitMarker) return -1

    // locate the marker that terminates this scan's entropy data
    var p = math.max(start, br.pos - 2)
    while (p + 1 < bytes.length) {
      if ((bytes(p) & 0xff) == 0xff) {
        val m2 = bytes(p + 1) & 0xff
        if (m2 != 0x00 && !(m2 >= 0xd0 && m2 <= 0xd7)) return p
      }
      p += 1
    }
    bytes.length // no trailing marker: tolerate a truncated epilogue
  }

  private def huffDecode(br: BitReader, t: Huff): Int = {
    var code = 0
    var l = 1
    while (l <= 16) {
      code = (code << 1) | br.nextBit()
      if (t.maxCode(l) >= 0 && code <= t.maxCode(l)) return t.value(l, code)
      l += 1
    }
    -1
  }

  /** libjpeg `h2v1_fancy_upsample`: 3:1 triangle filter, edge-held. */
  private def fancyH2V1(p: Array[Int], pw: Int, dw: Int, dh: Int): (Array[Int], Int) = {
    val ow = dw * 2
    val out = new Array[Int](ow * dh)
    var y = 0
    while (y < dh) {
      val in = y * pw
      val o = y * ow
      if (dw == 1) { out(o) = p(in); out(o + 1) = p(in) }
      else {
        out(o) = p(in)
        out(o + 1) = (p(in) * 3 + p(in + 1) + 2) >> 2
        var x = 1
        while (x < dw - 1) {
          val v3 = p(in + x) * 3
          out(o + 2 * x) = (v3 + p(in + x - 1) + 1) >> 2
          out(o + 2 * x + 1) = (v3 + p(in + x + 1) + 2) >> 2
          x += 1
        }
        val v3 = p(in + dw - 1) * 3
        out(o + 2 * dw - 2) = (v3 + p(in + dw - 2) + 1) >> 2
        out(o + 2 * dw - 1) = p(in + dw - 1)
      }
      y += 1
    }
    (out, ow)
  }

  /** libjpeg `h2v2_fancy_upsample`: vertical 3:1 column sums, then
    * horizontal 3:1 over the sums — edge rows/columns held.
    */
  private def fancyH2V2(p: Array[Int], pw: Int, dw: Int, dh: Int): (Array[Int], Int) = {
    val ow = dw * 2
    val out = new Array[Int](ow * dh * 2)
    var oy = 0
    while (oy < dh * 2) {
      val vThis = oy >> 1
      val vNear = if ((oy & 1) == 0) math.max(vThis - 1, 0) else math.min(vThis + 1, dh - 1)
      val rThis = vThis * pw
      val rNear = vNear * pw
      val o = oy * ow
      def colsum(x: Int): Int = p(rThis + x) * 3 + p(rNear + x)
      if (dw == 1) {
        val t = colsum(0)
        out(o) = (t * 4 + 8) >> 4
        out(o + 1) = (t * 4 + 7) >> 4
      } else {
        var last = colsum(0)
        var cur = colsum(1)
        out(o) = (last * 4 + 8) >> 4
        out(o + 1) = (last * 3 + cur + 7) >> 4
        var x = 1
        while (x < dw - 1) {
          val next = colsum(x + 1)
          out(o + 2 * x) = (cur * 3 + last + 8) >> 4
          out(o + 2 * x + 1) = (cur * 3 + next + 7) >> 4
          last = cur; cur = next
          x += 1
        }
        out(o + 2 * dw - 2) = (cur * 3 + last + 8) >> 4
        out(o + 2 * dw - 1) = (cur * 4 + 7) >> 4
      }
      oy += 1
    }
    (out, ow)
  }

  /** libjpeg `ycc_rgb_convert` fixed-point tables (SCALEBITS=16). */
  private def fix(x: Double): Int = (x * 65536 + 0.5).toInt
  private val crR = Array.tabulate(256)(i => (fix(1.40200) * (i - 128) + 32768) >> 16)
  private val cbB = Array.tabulate(256)(i => (fix(1.77200) * (i - 128) + 32768) >> 16)
  private val crG = Array.tabulate(256)(i => -fix(0.71414) * (i - 128))
  private val cbG = Array.tabulate(256)(i => -fix(0.34414) * (i - 128) + 32768)

  private def yccToRgb(full: Array[(Array[Int], Int)], w: Int, h: Int,
      out: Array[Int]): Unit = {
    val (py, wy) = full(0)
    val (pcb, wcb) = full(1)
    val (pcr, wcr) = full(2)
    def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val lum = py(y * wy + x)
        val cb = pcb(y * wcb + x)
        val cr = pcr(y * wcr + x)
        val r = clamp(lum + crR(cr))
        val g = clamp(lum + ((cbG(cb) + crG(cr)) >> 16))
        val b = clamp(lum + cbB(cb))
        out(y * w + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
  }
}
