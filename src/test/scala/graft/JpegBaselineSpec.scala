package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{JpegBaseline, Multimodal, JpegCodec, MediaCodecs}
import graft.operators.JpegBaseline.{EncComp, ZigzagToNatural}

/** The in-repo exact-integer baseline JPEG codec: flat-block exactness
  * (what makes multimodal_jpeg_decode oracle-able), general coefficient
  * round-trips through the Huffman/scan machinery, the fixed-point IDCT
  * against a double-precision reference, subsampled frames, restart
  * intervals, and the ImageIO interop fallback. */
class JpegBaselineSpec extends AnyFunSuite {

  private def mod256(v: Long): Int = (((v % 256) + 256) % 256).toInt

  test("flat-block 4:4:4 synth decodes bit-exactly (the oracle contract)") {
    for (seed <- Seq(0L, 7L, 123L, 99999L); (w, h) <- Seq((8, 8), (24, 16), (40, 32))) {
      val bytes = Multimodal.synthJpeg(seed, w, h)
      val d = JpegBaseline.decode(bytes)
      assert(d.width == w && d.height == h && d.nComps == 3)
      for (ci <- 0 until 3; y <- 0 until h; x <- 0 until w) {
        val base = seed * 31 + (y / 8) * 7 + (x / 8) * 3
        val expect = mod256(base + Array(0, 11, 22)(ci))
        assert(d.fullPlane(ci)(y * w + x) == expect, s"seed=$seed comp=$ci ($x,$y)")
      }
      // and the RGB view is the fixed-point BT.601 of those planes
      val rgb = d.rgb.get
      for (y <- 0 until h; x <- 0 until w) {
        val yv = mod256(seed * 31 + (y / 8) * 7 + (x / 8) * 3)
        val cb = mod256(seed * 31 + (y / 8) * 7 + (x / 8) * 3 + 11)
        val cr = mod256(seed * 31 + (y / 8) * 7 + (x / 8) * 3 + 22)
        assert(rgb(0)(y * w + x) == JpegBaseline.yccToR(yv, cr).toDouble)
        assert(rgb(1)(y * w + x) == JpegBaseline.yccToG(yv, cb, cr).toDouble)
        assert(rgb(2)(y * w + x) == JpegBaseline.yccToB(yv, cb).toDouble)
      }
    }
  }

  /** Deterministic pseudo-random coefficient generator (splitmix-ish). */
  private def prng(seed: Long): () => Long = {
    var s = seed
    () => {
      s += 0x9E3779B97F4A7C15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
  }

  private def randBlock(rnd: () => Long, density: Int): Array[Int] = {
    val c = new Array[Int](64)
    c(0) = (rnd() % 1024).toInt // DC in [-1023, 1023]: diffs stay in category <= 11
    for (_ <- 0 until density) {
      val k = 1 + math.abs(rnd() % 63).toInt
      c(k) = (rnd() % 200).toInt // |AC| <= 199: category <= 8, inside Annex K sizes
    }
    c
  }

  test("general coefficients survive encode->decode: scan machinery is exact") {
    // random quantized coefficients, non-trivial quant table; the decoded
    // plane must equal idct8x8 of the dequantized coefficients computed
    // directly — pins Huffman codes, byte stuffing, run-lengths, ZRL,
    // EOB, DC prediction and de-zigzag all at once
    val rnd = prng(42L)
    val quant = Array.tabulate(64)(i => 1 + (i % 7)) // zig-zag order
    val w = 32; val h = 24 // 4x3 blocks
    val blocks = Array.fill(h / 8, w / 8)(randBlock(rnd, 12))
    val bytes = JpegBaseline.encode(w, h, Array(quant),
      Seq(EncComp(1, 1, 1, 0, 0, 0)), (_, by, bx) => blocks(by)(bx))
    val d = JpegBaseline.decode(bytes)
    assert(d.width == w && d.height == h && d.nComps == 1)
    val out = new Array[Int](64)
    val coefN = new Array[Int](64)
    for (by <- 0 until h / 8; bx <- 0 until w / 8) {
      java.util.Arrays.fill(coefN, 0)
      for (z <- 0 until 64)
        coefN(ZigzagToNatural(z)) = blocks(by)(bx)(z) * quant(z)
      JpegBaseline.idct8x8(coefN, out)
      for (ry <- 0 until 8; rx <- 0 until 8)
        assert(d.fullPlane(0)((by * 8 + ry) * w + bx * 8 + rx) == out(ry * 8 + rx),
          s"block ($bx,$by) px ($rx,$ry)")
    }
  }

  test("fixed-point IDCT tracks the double-precision reference within 1") {
    val rnd = prng(7L)
    val out = new Array[Int](64)
    for (_ <- 0 until 50) {
      val coefN = new Array[Int](64)
      for (k <- 0 until 64) if (rnd() % 3 == 0) coefN(k) = (rnd() % 256).toInt
      JpegBaseline.idct8x8(coefN, out)
      // naive orthonormal inverse DCT (T.81 A.3.3) in doubles
      for (y <- 0 until 8; x <- 0 until 8) {
        var s = 0.0
        for (u <- 0 until 8; v <- 0 until 8) {
          val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
          val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
          s += cu * cv * coefN(u * 8 + v) *
            math.cos((2 * y + 1) * u * math.Pi / 16) *
            math.cos((2 * x + 1) * v * math.Pi / 16)
        }
        val ref = math.max(0, math.min(255, math.round(s / 4 + 128).toInt))
        assert(math.abs(out(y * 8 + x) - ref) <= 1, s"($x,$y): got ${out(y * 8 + x)} ref $ref")
      }
    }
  }

  test("4:2:0 subsampled frame: flat blocks decode exactly, replicated upsample") {
    // luma on a 4x2-block grid, chroma on 2x1: one value per block each
    val w = 32; val h = 16
    val unit = Array.fill(64)(1)
    def flat(v: Int): Array[Int] = { val c = new Array[Int](64); c(0) = 8 * (v - 128); c }
    val lum = Array(Array(10, 20, 30, 40), Array(50, 60, 70, 80))
    val cbv = Array(Array(90, 100)); val crv = Array(Array(110, 120))
    val bytes = JpegBaseline.encode(w, h, Array(unit),
      Seq(EncComp(1, 2, 2, 0, 0, 0), EncComp(2, 1, 1, 0, 1, 1), EncComp(3, 1, 1, 0, 1, 1)),
      (ci, by, bx) => ci match {
        case 0 => flat(lum(by)(bx))
        case 1 => flat(cbv(by)(bx))
        case _ => flat(crv(by)(bx))
      })
    val d = JpegBaseline.decode(bytes)
    assert(d.sampH.toSeq == Seq(2, 1, 1) && d.sampV.toSeq == Seq(2, 1, 1))
    for (y <- 0 until h; x <- 0 until w) {
      assert(d.fullPlane(0)(y * w + x) == lum(y / 8)(x / 8))
      assert(d.fullPlane(1)(y * w + x) == cbv(y / 16)(x / 16), s"cb ($x,$y)")
      assert(d.fullPlane(2)(y * w + x) == crv(y / 16)(x / 16), s"cr ($x,$y)")
    }
  }

  test("restart intervals: RST markers + predictor resets round-trip") {
    val rnd = prng(11L)
    val quant = Array.tabulate(64)(i => 1 + (i % 5))
    val w = 64; val h = 8 // 8 MCUs in a row, DRI=3 -> RST0, RST1 inside
    val blocks = Array.fill(8)(randBlock(rnd, 8))
    val bytes = JpegBaseline.encode(w, h, Array(quant),
      Seq(EncComp(1, 1, 1, 0, 0, 0)), (_, _, bx) => blocks(bx), restartInterval = 3)
    // the stream really contains restart markers
    assert((0 until bytes.length - 1).exists(i =>
      (bytes(i) & 0xFF) == 0xFF && (bytes(i + 1) & 0xFF) == 0xD0))
    val d = JpegBaseline.decode(bytes)
    val out = new Array[Int](64); val coefN = new Array[Int](64)
    for (bx <- 0 until 8) {
      java.util.Arrays.fill(coefN, 0)
      for (z <- 0 until 64) coefN(ZigzagToNatural(z)) = blocks(bx)(z) * quant(z)
      JpegBaseline.idct8x8(coefN, out)
      for (ry <- 0 until 8; rx <- 0 until 8)
        assert(d.fullPlane(0)(ry * w + bx * 8 + rx) == out(ry * 8 + rx), s"block $bx")
    }
  }

  test("JDK-encoded JPEG decodes through the in-repo baseline path") {
    if (System.getProperty("java.awt.headless") == null)
      System.setProperty("java.awt.headless", "true")
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, 0x808080)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", bos)
    val b = bos.toByteArray
    // decodes natively (no JpegFormatException -> no ImageIO fallback)
    val d = JpegBaseline.decode(b)
    assert(d.width == 16 && d.height == 16)
    val rgb = d.rgb.get
    for (c <- 0 until 3)
      assert(math.abs(rgb(c).sum / rgb(c).length - 128.0) < 4.0)
    // and the codec registry serves the same bytes
    assert(MediaCodecs.find(b).contains(JpegCodec))
    assert(JpegCodec.samples(b).isDefined)
  }

  test("progressive/truncated streams are rejected, not mis-decoded") {
    val good = Multimodal.synthJpeg(5L, 16, 8)
    // truncate inside the entropy segment
    val cut = good.take(good.length - 4)
    intercept[JpegBaseline.JpegFormatException](JpegBaseline.decode(cut))
    // flip SOF0 -> SOF2 (progressive)
    val prog = good.clone()
    val sofAt = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xFF) == 0xFF && (prog(i + 1) & 0xFF) == 0xC0).get
    prog(sofAt + 1) = 0xC2.toByte
    intercept[JpegBaseline.JpegFormatException](JpegBaseline.decode(prog))
  }
}
