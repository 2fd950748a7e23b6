package graft.operators

/** In-repo baseline-profile JPEG codec with exact-integer arithmetic.
  *
  * Why it exists: the other image formats (BMP/PNG/GIF) are lossless, so
  * their decode queries carry closed-form DuckDB oracles. JPEG through
  * ImageIO is reader-dependent (the JDK's IDCT/upsampling choices are
  * not pinned by the spec), so until this codec the JPEG decode path was
  * sbt-only. This decoder is deterministic — Huffman decode, dequantize,
  * fixed-point integer IDCT, fixed-point BT.601 color convert — so the
  * decoded bytes are a pure function of the file bytes, replayable by
  * any engine that runs the same integer algorithm. Combined with
  * block-flat synth content (every 8×8 block a single value) and unit
  * quantization tables, encode→decode is EXACT (a flat block has only a
  * DC coefficient; with quant=1 the fixed-point IDCT reconstructs it
  * bit-exactly), which makes the decode oracle closed-form in SQL.
  *
  * Scope: baseline DCT sequential (SOF0/SOF1), 8-bit samples, Huffman
  * entropy coding, 1–4 components, sampling factors 1–2 (4:4:4, 4:2:2,
  * 4:2:0), restart intervals. Progressive (SOF2) and arithmetic coding
  * are rejected (caller falls back to ImageIO).
  *
  * All table constants (zig-zag order, the Annex K "typical" Huffman
  * tables) and the decode procedures (F.2.2) are from the public ITU
  * T.81 spec. The IDCT is the fixed-point Loeffler–Ligtenberg–Moshovitz
  * factorization (the algorithm published in their 1989 ICASSP paper;
  * 13-bit constants, two passes, descale-with-rounding).
  *
  * Reference parity note: the reference engine has no multimodal
  * support at all — this is part of graft's training-data-pipeline
  * surface, not a ported operator.
  */
object JpegBaseline {

  private[operators] val CONST_BITS = 13
  private[operators] val PASS1_BITS = 2

  // zig-zag index -> natural (row-major) index, ITU T.81 Figure 5
  val ZigzagToNatural: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // ITU T.81 Annex K.3 "typical" Huffman tables
  private val DcLumBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = (0 to 11).toArray
  private val DcChrBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChrVals = (0 to 11).toArray
  private val AcLumBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
  private val AcChrBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChrVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Huffman table: canonical codes generated from (bits, vals) per
    * T.81 C.2 — codes of each length assigned in increasing order. */
  private[operators] final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // encoder view: value -> (code, length)
    val encCode = new Array[Int](256)
    val encLen = new Array[Int](256)
    // decoder view (T.81 F.2.2.3): per code length l (1-based),
    // smallest/largest code of that length and index of first value
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    val values: Array[Int] = vals
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        var i = 0
        while (i < bits(l - 1)) {
          encCode(vals(k)) = code
          encLen(vals(k)) = l
          code += 1; k += 1; i += 1
        }
        maxCode(l) = code - 1
        code <<= 1
        l += 1
      }
    }
  }
  private[operators] val StdDcLum = new HuffTable(DcLumBits, DcLumVals)
  private[operators] val StdDcChr = new HuffTable(DcChrBits, DcChrVals)
  private[operators] val StdAcLum = new HuffTable(AcLumBits, AcLumVals)
  private[operators] val StdAcChr = new HuffTable(AcChrBits, AcChrVals)

  // ---------------------------------------------------------------- IDCT

  // 13-bit fixed-point constants: round(c * 2^13) for the LLM'89 plan
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

  @inline private def descale(x: Long, n: Int): Int = ((x + (1L << (n - 1))) >> n).toInt

  /** Fixed-point 2-D inverse DCT over one dequantized 8×8 block in
    * natural order; output = level-shifted (+128) clamped samples.
    * For a DC-only block with dequantized DC = 8k the output is exactly
    * k+128 in every position (the descale rounding cancels), which is
    * what makes flat-block JPEGs bit-exact through this decoder. */
  def idct8x8(coef: Array[Int], out: Array[Int]): Unit = {
    val ws = new Array[Long](64)
    // pass 1: columns
    var c = 0
    while (c < 8) {
      if (coef(8 + c) == 0 && coef(16 + c) == 0 && coef(24 + c) == 0 &&
          coef(32 + c) == 0 && coef(40 + c) == 0 && coef(48 + c) == 0 && coef(56 + c) == 0) {
        val dc = (coef(c).toLong << PASS1_BITS)
        var r = 0
        while (r < 8) { ws(r * 8 + c) = dc; r += 1 }
      } else {
        val z2e = coef(16 + c).toLong; val z3e = coef(48 + c).toLong
        val z1e = (z2e + z3e) * F_0_541196100
        val t2 = z1e - z3e * F_1_847759065
        val t3 = z1e + z2e * F_0_765366865
        val z2 = coef(c).toLong; val z3 = coef(32 + c).toLong
        val t0 = (z2 + z3) << CONST_BITS
        val t1 = (z2 - z3) << CONST_BITS
        val t10 = t0 + t3; val t13 = t0 - t3
        val t11 = t1 + t2; val t12 = t1 - t2
        var o0 = coef(56 + c).toLong; var o1 = coef(40 + c).toLong
        var o2 = coef(24 + c).toLong; var o3 = coef(8 + c).toLong
        var z1 = o0 + o3; var zz2 = o1 + o2
        var zz3 = o0 + o2; var z4 = o1 + o3
        val z5 = (zz3 + z4) * F_1_175875602
        o0 *= F_0_298631336; o1 *= F_2_053119869; o2 *= F_3_072711026; o3 *= F_1_501321110
        z1 *= -F_0_899976223; zz2 *= -F_2_562915447; zz3 *= -F_1_961570560; z4 *= -F_0_390180644
        zz3 += z5; z4 += z5
        o0 += z1 + zz3; o1 += zz2 + z4; o2 += zz2 + zz3; o3 += z1 + z4
        ws(c) = descale(t10 + o3, CONST_BITS - PASS1_BITS).toLong
        ws(56 + c) = descale(t10 - o3, CONST_BITS - PASS1_BITS).toLong
        ws(8 + c) = descale(t11 + o2, CONST_BITS - PASS1_BITS).toLong
        ws(48 + c) = descale(t11 - o2, CONST_BITS - PASS1_BITS).toLong
        ws(16 + c) = descale(t12 + o1, CONST_BITS - PASS1_BITS).toLong
        ws(40 + c) = descale(t12 - o1, CONST_BITS - PASS1_BITS).toLong
        ws(24 + c) = descale(t13 + o0, CONST_BITS - PASS1_BITS).toLong
        ws(32 + c) = descale(t13 - o0, CONST_BITS - PASS1_BITS).toLong
      }
      c += 1
    }
    // pass 2: rows
    var r = 0
    while (r < 8) {
      val b = r * 8
      if (ws(b + 1) == 0 && ws(b + 2) == 0 && ws(b + 3) == 0 && ws(b + 4) == 0 &&
          ws(b + 5) == 0 && ws(b + 6) == 0 && ws(b + 7) == 0) {
        val v = clamp255(descale(ws(b), PASS1_BITS + 3) + 128)
        var x = 0
        while (x < 8) { out(b + x) = v; x += 1 }
      } else {
        val z2e = ws(b + 2); val z3e = ws(b + 6)
        val z1e = (z2e + z3e) * F_0_541196100
        val t2 = z1e - z3e * F_1_847759065
        val t3 = z1e + z2e * F_0_765366865
        val t0 = (ws(b) + ws(b + 4)) << CONST_BITS
        val t1 = (ws(b) - ws(b + 4)) << CONST_BITS
        val t10 = t0 + t3; val t13 = t0 - t3
        val t11 = t1 + t2; val t12 = t1 - t2
        var o0 = ws(b + 7); var o1 = ws(b + 5); var o2 = ws(b + 3); var o3 = ws(b + 1)
        var z1 = o0 + o3; var zz2 = o1 + o2
        var zz3 = o0 + o2; var z4 = o1 + o3
        val z5 = (zz3 + z4) * F_1_175875602
        o0 *= F_0_298631336; o1 *= F_2_053119869; o2 *= F_3_072711026; o3 *= F_1_501321110
        z1 *= -F_0_899976223; zz2 *= -F_2_562915447; zz3 *= -F_1_961570560; z4 *= -F_0_390180644
        zz3 += z5; z4 += z5
        o0 += z1 + zz3; o1 += zz2 + z4; o2 += zz2 + zz3; o3 += z1 + z4
        out(b) = clamp255(descale(t10 + o3, CONST_BITS + PASS1_BITS + 3) + 128)
        out(b + 7) = clamp255(descale(t10 - o3, CONST_BITS + PASS1_BITS + 3) + 128)
        out(b + 1) = clamp255(descale(t11 + o2, CONST_BITS + PASS1_BITS + 3) + 128)
        out(b + 6) = clamp255(descale(t11 - o2, CONST_BITS + PASS1_BITS + 3) + 128)
        out(b + 2) = clamp255(descale(t12 + o1, CONST_BITS + PASS1_BITS + 3) + 128)
        out(b + 5) = clamp255(descale(t12 - o1, CONST_BITS + PASS1_BITS + 3) + 128)
        out(b + 3) = clamp255(descale(t13 + o0, CONST_BITS + PASS1_BITS + 3) + 128)
        out(b + 4) = clamp255(descale(t13 - o0, CONST_BITS + PASS1_BITS + 3) + 128)
      }
      r += 1
    }
  }

  @inline private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Fixed-point BT.601 YCbCr→RGB, SQL-replayable: every term is
    * integer, the shift is applied to a positive-biased numerator so
    * `>> 16` here and `// 65536` in DuckDB agree (both floor).
    *   r = clamp((y·65536 + 91881·(cr−128) + 32768 + 2^26) >> 16 − 1024) */
  @inline def yccToR(y: Int, cr: Int): Int =
    clamp255((((y.toLong << 16) + 91881L * (cr - 128) + 32768L + (1L << 26)) >> 16).toInt - 1024)
  @inline def yccToG(y: Int, cb: Int, cr: Int): Int =
    clamp255((((y.toLong << 16) - 22554L * (cb - 128) - 46802L * (cr - 128) + 32768L + (1L << 26)) >> 16).toInt - 1024)
  @inline def yccToB(y: Int, cb: Int): Int =
    clamp255((((y.toLong << 16) + 116130L * (cb - 128) + 32768L + (1L << 26)) >> 16).toInt - 1024)

  // ------------------------------------------------------------- encoder

  /** One image component for the coefficient-level encoder. */
  final case class EncComp(id: Int, h: Int, v: Int, qIdx: Int, dcTabIdx: Int, acTabIdx: Int)

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0L
    private var nBits = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1))
      nBits += len
      while (nBits >= 8) {
        val b = ((acc >> (nBits - 8)) & 0xFF).toInt
        out.write(b)
        if (b == 0xFF) out.write(0x00) // byte stuffing
        nBits -= 8
      }
    }
    def flushWithOnes(): Unit = if (nBits > 0) { put(0x7F, 8 - nBits) } // pad to byte with 1s
  }

  /** Encode a baseline JPEG from QUANTIZED coefficient blocks (zig-zag
    * order, DC first). No FDCT runs here — callers that want exact
    * round-trips (flat blocks, synthetic coefficient patterns) supply
    * coefficients directly. Dimensions must be whole MCUs
    * (wPx % (8·hMax) == 0, hPx % (8·vMax) == 0): this encoder exists
    * for synthesis and tests, the DECODER handles partial-MCU images.
    *
    * @param quantZig quantization tables in zig-zag order (1–4 of 64)
    * @param coefZig  (compIdx, blockY, blockX) -> 64 zig-zag coefficients
    *                 on the component's own (subsampled) block grid */
  def encode(wPx: Int, hPx: Int, quantZig: Array[Array[Int]], comps: Seq[EncComp],
             coefZig: (Int, Int, Int) => Array[Int], restartInterval: Int = 0): Array[Byte] = {
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    require(wPx % (8 * hMax) == 0 && hPx % (8 * vMax) == 0,
      s"encoder needs whole MCUs: ${wPx}x$hPx with hMax=$hMax vMax=$vMax")
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xFF); u8(m) }
    marker(0xD8) // SOI
    // DQT (one segment per table; Pq=0 → 8-bit entries)
    quantZig.zipWithIndex.foreach { case (q, i) =>
      require(q.forall(v => v >= 1 && v <= 255), "8-bit quant entries")
      marker(0xDB); u16(2 + 1 + 64); u8(i)
      q.foreach(u8)
    }
    // SOF0
    marker(0xC0); u16(8 + 3 * comps.size); u8(8); u16(hPx); u16(wPx); u8(comps.size)
    comps.foreach { cc => u8(cc.id); u8((cc.h << 4) | cc.v); u8(cc.qIdx) }
    // DHT: the four Annex K tables (classes 0/1, ids 0/1)
    def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xC4); u16(2 + 1 + 16 + vals.length); u8((cls << 4) | id)
      bits.foreach(u8); vals.foreach(u8)
    }
    dht(0, 0, DcLumBits, DcLumVals); dht(0, 1, DcChrBits, DcChrVals)
    dht(1, 0, AcLumBits, AcLumVals); dht(1, 1, AcChrBits, AcChrVals)
    if (restartInterval > 0) { marker(0xDD); u16(4); u16(restartInterval) }
    // SOS
    marker(0xDA); u16(6 + 2 * comps.size); u8(comps.size)
    comps.foreach { cc => u8(cc.id); u8((cc.dcTabIdx << 4) | cc.acTabIdx) }
    u8(0); u8(63); u8(0) // Ss/Se/AhAl (full spectral, no approximation)
    // entropy-coded MCU scan
    val bw = new BitWriter(out)
    val dcTabs = Array(StdDcLum, StdDcChr)
    val acTabs = Array(StdAcLum, StdAcChr)
    val pred = new Array[Int](comps.size)
    def magnitude(v: Int): Int = { var s = 0; var a = math.abs(v); while (a != 0) { s += 1; a >>= 1 }; s }
    def putBits(v: Int, s: Int): Unit = if (s > 0) bw.put(if (v < 0) v + (1 << s) - 1 else v, s)
    val mcusX = wPx / (8 * hMax)
    val mcusY = hPx / (8 * vMax)
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        val mcuIdx = my * mcusX + mx
        if (restartInterval > 0 && mcuIdx > 0 && mcuIdx % restartInterval == 0) {
          bw.flushWithOnes()
          u8(0xFF); u8(0xD0 + ((mcuIdx / restartInterval - 1) % 8))
          java.util.Arrays.fill(pred, 0)
        }
        var ci = 0
        while (ci < comps.size) {
          val cc = comps(ci)
          var bv = 0
          while (bv < cc.v) {
            var bh = 0
            while (bh < cc.h) {
              val blk = coefZig(ci, my * cc.v + bv, mx * cc.h + bh)
              require(blk.length == 64)
              val dct = dcTabs(cc.dcTabIdx); val act = acTabs(cc.acTabIdx)
              val diff = blk(0) - pred(ci)
              pred(ci) = blk(0)
              val s = magnitude(diff)
              bw.put(dct.encCode(s), dct.encLen(s))
              putBits(diff, s)
              var k = 1
              var run = 0
              while (k < 64) {
                val v = blk(k)
                if (v == 0) run += 1
                else {
                  while (run > 15) { bw.put(act.encCode(0xF0), act.encLen(0xF0)); run -= 16 }
                  val sz = magnitude(v)
                  val rs = (run << 4) | sz
                  bw.put(act.encCode(rs), act.encLen(rs))
                  putBits(v, sz)
                  run = 0
                }
                k += 1
              }
              if (run > 0) bw.put(act.encCode(0x00), act.encLen(0x00)) // EOB
              bh += 1
            }
            bv += 1
          }
          ci += 1
        }
        mx += 1
      }
      my += 1
    }
    bw.flushWithOnes()
    marker(0xD9) // EOI
    out.toByteArray
  }

  // ------------------------------------------------------------- decoder

  /** Decoded image: per-component planes on the component's own
    * (subsampled) grid, plus the frame geometry to upsample from. */
  final case class Decoded(width: Int, height: Int,
                           compW: Array[Int], compH: Array[Int],
                           planes: Array[Array[Int]],
                           sampH: Array[Int], sampV: Array[Int]) {
    def nComps: Int = planes.length
    /** Full-resolution plane for component `ci` by pixel replication
      * (nearest-neighbor upsample — deterministic, SQL-replayable). */
    def fullPlane(ci: Int): Array[Int] = {
      val hMax = sampH.max; val vMax = sampV.max
      if (sampH(ci) == hMax && sampV(ci) == vMax) {
        // plane may still be MCU-padded wider than width; crop
        val p = planes(ci); val cw = compW(ci)
        if (cw == width && compH(ci) == height) p
        else {
          val o = new Array[Int](width * height)
          var y = 0
          while (y < height) {
            System.arraycopy(p, y * cw, o, y * width, width); y += 1
          }
          o
        }
      } else {
        val fx = hMax / sampH(ci); val fy = vMax / sampV(ci)
        val p = planes(ci); val cw = compW(ci)
        val o = new Array[Int](width * height)
        var y = 0
        while (y < height) {
          val sy = y / fy
          var x = 0
          while (x < width) { o(y * width + x) = p(sy * cw + x / fx); x += 1 }
          y += 1
        }
        o
      }
    }
    /** R,G,B planes: 3-component frames are YCbCr (JFIF convention),
      * 1-component is grayscale replicated. */
    def rgb: Option[Array[Array[Double]]] = nComps match {
      case 1 =>
        val g = fullPlane(0).map(_.toDouble)
        Some(Array(g, g.clone(), g.clone()))
      case 3 =>
        val y = fullPlane(0); val cb = fullPlane(1); val cr = fullPlane(2)
        val n = y.length
        val r = new Array[Double](n); val g = new Array[Double](n); val b = new Array[Double](n)
        var i = 0
        while (i < n) {
          r(i) = yccToR(y(i), cr(i)).toDouble
          g(i) = yccToG(y(i), cb(i), cr(i)).toDouble
          b(i) = yccToB(y(i), cb(i)).toDouble
          i += 1
        }
        Some(Array(r, g, b))
      case _ => None
    }
  }

  /** Entropy-segment bit reader with 0xFF00 unstuffing; stops (feeds
    * zeros) at any real marker so truncated streams fail soft. */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0L
    private var nBits = 0
    var hitMarker = false
    /** true iff a decode consumed bits past the end of the segment —
      * prefetch means hitMarker alone is NOT starvation. */
    var starved = false
    def align(): Unit = { acc = 0L; nBits = 0 }
    private def fill(): Unit = {
      while (nBits <= 56 && !hitMarker) {
        if (pos >= b.length) { hitMarker = true }
        else {
          val v = b(pos) & 0xFF
          if (v == 0xFF) {
            if (pos + 1 < b.length && (b(pos + 1) & 0xFF) == 0x00) {
              acc = (acc << 8) | 0xFF; nBits += 8; pos += 2
            } else hitMarker = true // real marker: stop consuming
          } else { acc = (acc << 8) | v; nBits += 8; pos += 1 }
        }
      }
    }
    def bit(): Int = {
      if (nBits == 0) fill()
      if (nBits == 0) { starved = true; return 0 }
      nBits -= 1
      ((acc >> nBits) & 1L).toInt
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
  }

  private def decodeHuff(br: BitReader, t: HuffTable): Int = {
    // T.81 F.2.2.3 DECODE
    var code = br.bit()
    var l = 1
    while (l <= 16 && code > t.maxCode(l)) { code = (code << 1) | br.bit(); l += 1 }
    if (l > 16) throw new JpegFormatException("bad Huffman code")
    t.values(t.valPtr(l) + code - t.minCode(l))
  }

  @inline private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  final class JpegFormatException(msg: String) extends RuntimeException(msg)

  /** Decode a baseline JPEG. Throws [[JpegFormatException]] on anything
    * outside baseline scope (progressive, arithmetic, 12-bit, sampling
    * factors > 2). */
  def decode(b: Array[Byte]): Decoded = {
    if (b.length < 4 || (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8)
      throw new JpegFormatException("no SOI")
    val quant = new Array[Array[Int]](4) // natural order, per table id
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var restartInterval = 0
    var width = 0; var height = 0
    var compIds: Array[Int] = null
    var sampH: Array[Int] = null; var sampV: Array[Int] = null
    var compQ: Array[Int] = null
    var i = 2
    def be16at(p: Int): Int = ((b(p) & 0xFF) << 8) | (b(p + 1) & 0xFF)
    while (i + 1 < b.length) {
      if ((b(i) & 0xFF) != 0xFF) throw new JpegFormatException(f"marker sync lost at $i")
      val m = b(i + 1) & 0xFF
      if (m == 0xD9) return throwEnd() // EOI before SOS
      else if (m == 0xFF) { i += 1 } // fill byte
      else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) { i += 2 } // standalone
      else {
        val len = be16at(i + 2)
        val c = i + 4 // content start
        m match {
          case 0xDB => // DQT: one or more tables
            var p = c
            while (p < i + 2 + len) {
              val pq = (b(p) & 0xFF) >> 4; val tq = b(p) & 0x0F
              if (pq != 0) throw new JpegFormatException("16-bit quant tables unsupported")
              val t = new Array[Int](64)
              var k = 0
              while (k < 64) { t(ZigzagToNatural(k)) = b(p + 1 + k) & 0xFF; k += 1 }
              quant(tq) = t
              p += 65
            }
          case 0xC4 => // DHT: one or more tables
            var p = c
            while (p < i + 2 + len) {
              val tc = (b(p) & 0xFF) >> 4; val th = b(p) & 0x0F
              val bits = Array.tabulate(16)(j => b(p + 1 + j) & 0xFF)
              val n = bits.sum
              val vals = Array.tabulate(n)(j => b(p + 17 + j) & 0xFF)
              val t = new HuffTable(bits, vals)
              if (tc == 0) dcTabs(th) = t else acTabs(th) = t
              p += 17 + n
            }
          case 0xC0 | 0xC1 => // baseline / extended-sequential Huffman
            if ((b(c) & 0xFF) != 8) throw new JpegFormatException("only 8-bit samples")
            height = be16at(c + 1); width = be16at(c + 3)
            val n = b(c + 5) & 0xFF
            if (n < 1 || n > 4) throw new JpegFormatException(s"$n components")
            compIds = new Array[Int](n); sampH = new Array[Int](n)
            sampV = new Array[Int](n); compQ = new Array[Int](n)
            var j = 0
            while (j < n) {
              compIds(j) = b(c + 6 + 3 * j) & 0xFF
              val hv = b(c + 7 + 3 * j) & 0xFF
              sampH(j) = hv >> 4; sampV(j) = hv & 0x0F
              if (sampH(j) < 1 || sampH(j) > 2 || sampV(j) < 1 || sampV(j) > 2)
                throw new JpegFormatException("sampling factors beyond 2 unsupported")
              compQ(j) = b(c + 8 + 3 * j) & 0xFF
              j += 1
            }
          case 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF =>
            throw new JpegFormatException(f"SOF$m%02X outside baseline scope")
          case 0xDD =>
            restartInterval = be16at(c)
          case 0xDA => // SOS: decode the scan, then done (single-scan baseline)
            if (compIds == null) throw new JpegFormatException("SOS before SOF")
            val ns = b(c) & 0xFF
            if (ns != compIds.length)
              throw new JpegFormatException("partial-component scans unsupported")
            val scanDc = new Array[Int](ns); val scanAc = new Array[Int](ns)
            var j = 0
            while (j < ns) {
              val id = b(c + 1 + 2 * j) & 0xFF
              val ti = compIds.indexOf(id)
              if (ti != j) throw new JpegFormatException("scan order != frame order")
              scanDc(j) = (b(c + 2 + 2 * j) & 0xFF) >> 4
              scanAc(j) = b(c + 2 + 2 * j) & 0x0F
              j += 1
            }
            return decodeScan(b, i + 2 + len, width, height, sampH, sampV,
              compQ, quant, scanDc, scanAc, dcTabs, acTabs, restartInterval)
          case _ => () // APPn, COM, others: skip
        }
        i += 2 + len
      }
    }
    throwEnd()
  }

  private def throwEnd(): Nothing = throw new JpegFormatException("no scan data")

  private def decodeScan(b: Array[Byte], scanStart: Int, width: Int, height: Int,
                         sampH: Array[Int], sampV: Array[Int], compQ: Array[Int],
                         quant: Array[Array[Int]], scanDc: Array[Int], scanAc: Array[Int],
                         dcTabs: Array[HuffTable], acTabs: Array[HuffTable],
                         restartInterval: Int): Decoded = {
    val n = sampH.length
    val hMax = sampH.max; val vMax = sampV.max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    // MCU-padded plane per component
    val compW = Array.tabulate(n)(ci => mcusX * 8 * sampH(ci))
    val compH = Array.tabulate(n)(ci => mcusY * 8 * sampV(ci))
    val planes = Array.tabulate(n)(ci => new Array[Int](compW(ci) * compH(ci)))
    val q = Array.tabulate(n) { ci =>
      val t = quant(compQ(ci))
      if (t == null) throw new JpegFormatException(s"missing quant table ${compQ(ci)}")
      t
    }
    val dct = Array.tabulate(n) { ci =>
      val t = dcTabs(scanDc(ci))
      if (t == null) throw new JpegFormatException(s"missing DC table ${scanDc(ci)}")
      t
    }
    val act = Array.tabulate(n) { ci =>
      val t = acTabs(scanAc(ci))
      if (t == null) throw new JpegFormatException(s"missing AC table ${scanAc(ci)}")
      t
    }
    val br = new BitReader(b, scanStart)
    val pred = new Array[Int](n)
    val coefZ = new Array[Int](64)
    val coefN = new Array[Int](64)
    val px = new Array[Int](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        // expect RSTn at the byte the reader stopped on
        br.align(); br.hitMarker = false
        var p = br.pos
        while (p + 1 < b.length && !((b(p) & 0xFF) == 0xFF && (b(p + 1) & 0xFF) >= 0xD0 && (b(p + 1) & 0xFF) <= 0xD7))
          p += 1
        if (p + 1 >= b.length) throw new JpegFormatException("missing restart marker")
        br.pos = p + 2
        java.util.Arrays.fill(pred, 0)
      }
      val my = mcu / mcusX; val mx = mcu % mcusX
      var ci = 0
      while (ci < n) {
        var bv = 0
        while (bv < sampV(ci)) {
          var bh = 0
          while (bh < sampH(ci)) {
            // one block
            java.util.Arrays.fill(coefZ, 0)
            val s = decodeHuff(br, dct(ci))
            if (s > 11) throw new JpegFormatException("DC category > 11")
            val diff = extend(br.bits(s), s)
            pred(ci) += diff
            coefZ(0) = pred(ci)
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = decodeHuff(br, act(ci))
              val r = rs >> 4; val sz = rs & 0x0F
              if (sz == 0) {
                if (r == 15) k += 16 else eob = true
              } else {
                k += r
                if (k > 63) throw new JpegFormatException("AC index overflow")
                coefZ(k) = extend(br.bits(sz), sz)
                k += 1
              }
            }
            // dequant + de-zigzag
            var z = 0
            while (z < 64) {
              val nat = ZigzagToNatural(z)
              coefN(nat) = coefZ(z) * q(ci)(nat)
              z += 1
            }
            idct8x8(coefN, px)
            // store into the padded plane
            val ox = (mx * sampH(ci) + bh) * 8
            val oy = (my * sampV(ci) + bv) * 8
            val cw = compW(ci)
            val plane = planes(ci)
            var ry = 0
            while (ry < 8) {
              var rx = 0
              val base = (oy + ry) * cw + ox
              while (rx < 8) { plane(base + rx) = px(ry * 8 + rx); rx += 1 }
              ry += 1
            }
            bh += 1
          }
          bv += 1
        }
        ci += 1
      }
      mcu += 1
    }
    if (br.starved) throw new JpegFormatException("entropy stream truncated")
    Decoded(width, height, compW, compH, planes, sampH, sampV)
  }
}
