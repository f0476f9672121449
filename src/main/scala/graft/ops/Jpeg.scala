package graft.ops

/** Pure-JVM baseline JPEG codec — grayscale AND 3-component YCbCr
  * color (4:4:4 / 4:2:2 / 4:2:0 chroma subsampling), the
  * encoder/decoder pair that makes the most common image container
  * genuinely decodable in a codec-less environment. Everything here
  * is from the public JPEG spec (ITU-T T.81): baseline sequential
  * DCT, MCU-interleaved scans, per-component quant/Huffman table
  * selection, the Annex K.3 typical luminance Huffman tables, byte
  * stuffing, marker structure. Progressive (SOF2) and hierarchical
  * streams are still refused, disclosed in README.
  *
  * The decoder implements the FULL baseline path (DC prediction per
  * component, AC run-length incl. ZRL and EOB, arbitrary DQT/DHT/
  * restart-free streams, APPn/COM skipping, replication chroma
  * upsample); the fixture generator emits MCU-grid-flat blocks,
  * whose quantized spectrum (DC only) reconstructs EXACTLY under a
  * uniform quant step that divides the scaled DC — that exactness,
  * plus INTEGER fixed-point color conversion (millionth-scale JFIF
  * constants, truncating division on offset-positive numerators), is
  * what lets a DuckDB oracle recompute decoded RGB channel sums in
  * closed form without a DCT in SQL.
  */
object Jpeg {

  // Annex K.3.3.1 — typical luminance DC table (code counts by length
  // 1..16, then symbol values = coefficient categories 0..11)
  private val DcBits =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = Array.tabulate(12)(identity)

  // Annex K.3.3.2 — typical luminance AC table
  private val AcBits =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Zigzag scan order: position k in the scan → raster index. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Uniform quantization step used by [[encodeJpegGray]]. 8 divides
    * the flat-block DC scale (FDCT S00 = 8·(v−128)), so flat blocks
    * round-trip bit-exact — the closed-form-oracle property. */
  val QStep = 8

  // ------------------------------------------------------------ tables

  /** Canonical Huffman codes from (counts-by-length, values):
    * (code, length) per symbol — T.81 C.2. */
  private def canonical(bits: Array[Int],
      vals: Array[Int]): Array[(Int, Int)] = {
    val out = new Array[(Int, Int)](vals.length)
    var code = 0; var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        out(k) = (code, len); code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    out
  }

  /** Decode table: (length, code) → symbol. */
  private def decodeTable(bits: Array[Int],
      vals: Array[Int]): Map[(Int, Int), Int] =
    canonical(bits, vals).zip(vals).map { case ((c, l), v) =>
      (l, c) -> v
    }.toMap

  private val DcEnc = canonical(DcBits, DcVals)
  private val AcEnc: Map[Int, (Int, Int)] =
    canonical(AcBits, AcVals).zip(AcVals).map { case (cl, v) => v -> cl }.toMap

  // --------------------------------------------------------- bit I/O

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0L; private var n = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1)); n += len
      while (n >= 8) {
        val b = ((acc >> (n - 8)) & 0xff).toInt
        out.write(b)
        if (b == 0xff) out.write(0x00) // byte stuffing
        n -= 8
      }
    }
    /** Pad the final partial byte with 1-bits (T.81 F.1.2.3). */
    def flush(): Unit = if (n > 0) put(0xff, 8 - n)
  }

  private final class BitReader(b: Array[Byte], private var pos: Int) {
    private var acc = 0L; private var n = 0
    var truncated = false
    def bit(): Int = {
      if (n == 0) {
        if (pos >= b.length) { truncated = true; return 0 }
        var v = b(pos) & 0xff; pos += 1
        if (v == 0xff) {
          // stuffed zero follows a literal FF; a marker here ends scan
          if (pos < b.length && b(pos) == 0x00) pos += 1
          else { truncated = true; v = 0 }
        }
        acc = v; n = 8
      }
      n -= 1
      ((acc >> n) & 1).toInt
    }
    def bits(k: Int): Int = {
      var v = 0; var i = 0
      while (i < k) { v = (v << 1) | bit(); i += 1 }
      v
    }
  }

  /** DC/AC coefficient magnitude category (T.81 F.1.2.1.2). */
  private def category(v: Int): Int = {
    var a = math.abs(v); var c = 0
    while (a != 0) { a >>= 1; c += 1 }
    c
  }

  /** EXTEND (T.81 F.2.2.1): low `t` bits back to a signed value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0
    else if (v < (1 << (t - 1))) v - (1 << t) + 1
    else v

  // ---------------------------------------------------------- encoder

  /** Precomputed basis: Cos(u)(x) = cos((2x+1)·u·π/16); C(u) = the
    * DC normalization. Both DCTs run separably off these tables —
    * 8·8·8 multiply-adds per pass instead of 64·64 trig calls (the
    * trig-in-inner-loop version measured 9 s warm for the sf0.1
    * fixture query; this one is sub-second). */
  private val Cos: Array[Array[Double]] =
    Array.tabulate(8, 8)((u, x) => math.cos((2 * x + 1) * u * math.Pi / 16))
  private val Cn: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1 / math.sqrt(2) else 1.0)

  private def fdct(block: Array[Double]): Array[Double] = {
    // rows first: tmp(y,u) = Σx s(y,x)·Cos(u)(x)
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0; var x = 0
        while (x < 8) { s += block(y * 8 + x) * Cos(u)(x); x += 1 }
        tmp(y * 8 + u) = s
        u += 1
      }
      y += 1
    }
    val out = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0; var yy = 0
        while (yy < 8) { s += tmp(yy * 8 + u) * Cos(v)(yy); yy += 1 }
        out(v * 8 + u) = 0.25 * Cn(u) * Cn(v) * s
        u += 1
      }
      v += 1
    }
    out
  }

  private def idct(coef: Array[Double]): Array[Double] = {
    // columns first: tmp(y,u) = Σv Cv·S(v,u)·Cos(v)(y)
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0; var v = 0
        while (v < 8) { s += Cn(v) * coef(v * 8 + u) * Cos(v)(y); v += 1 }
        tmp(y * 8 + u) = s
        u += 1
      }
      y += 1
    }
    val out = new Array[Double](64)
    y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0; var u = 0
        while (u < 8) { s += Cn(u) * tmp(y * 8 + u) * Cos(u)(x); u += 1 }
        out(y * 8 + x) = 0.25 * s
        x += 1
      }
      y += 1
    }
    out
  }

  /** Encode an 8-bit grayscale image as a baseline sequential JPEG
    * (SOI, DQT, SOF0, DHT×2, SOS, entropy data, EOI). Dimensions need
    * not be block-aligned — edge pixels replicate into the padding. */
  def encodeJpegGray(w: Int, h: Int, pix: (Int, Int) => Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, payload: Array[Int]): Unit = {
      marker(m)
      val len = payload.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      payload.foreach(out.write)
    }
    marker(0xd8) // SOI
    // DQT: precision 0, table id 0, uniform QStep in zigzag order
    seg(0xdb, Array(0x00) ++ Array.fill(64)(QStep))
    // SOF0: 8-bit, h×w, 1 component (id 1, sampling 1×1, quant table 0)
    seg(0xc0, Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, 1, 1, 0x11, 0))
    // DHT: DC class 0 id 0, then AC class 1 id 0
    seg(0xc4, Array(0x00) ++ DcBits ++ DcVals)
    seg(0xc4, Array(0x10) ++ AcBits ++ AcVals)
    // SOS: 1 component, DC table 0 / AC table 0, spectral 0..63
    seg(0xda, Array(1, 1, 0x00, 0, 63, 0))

    val bw = new BitWriter(out)
    val bx = (w + 7) / 8; val by = (h + 7) / 8
    var prevDc = 0
    var byI = 0
    while (byI < by) {
      var bxI = 0
      while (bxI < bx) {
        val block = new Array[Double](64)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val sx = math.min(bxI * 8 + x, w - 1)
            val sy = math.min(byI * 8 + y, h - 1)
            block(y * 8 + x) = (pix(sx, sy) & 0xff) - 128.0
            x += 1
          }
          y += 1
        }
        val coef = fdct(block)
        val q = new Array[Int](64)
        var k = 0
        while (k < 64) {
          q(k) = math.round(coef(Zigzag(k)) / QStep).toInt
          k += 1
        }
        // DC difference
        val diff = q(0) - prevDc; prevDc = q(0)
        val dcat = category(diff)
        val (dcode, dlen) = DcEnc(dcat)
        bw.put(dcode, dlen)
        if (dcat > 0)
          bw.put(if (diff < 0) diff + (1 << dcat) - 1 else diff, dcat)
        // AC run-length
        var run = 0
        k = 1
        while (k < 64) {
          if (q(k) == 0) run += 1
          else {
            while (run >= 16) {
              val (zc, zl) = AcEnc(0xf0) // ZRL
              bw.put(zc, zl); run -= 16
            }
            val acat = category(q(k))
            val (c, l) = AcEnc((run << 4) | acat)
            bw.put(c, l)
            bw.put(if (q(k) < 0) q(k) + (1 << acat) - 1 else q(k), acat)
            run = 0
          }
          k += 1
        }
        if (run > 0) { val (c, l) = AcEnc(0x00); bw.put(c, l) } // EOB
        bxI += 1
      }
      byI += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  // ------------------------------------------- fixed-point color math

  /** RGB → YCbCr, integer fixed point (JFIF constants in thousandths
    * / millionths; +half then TRUNCATING division on numerators kept
    * positive by construction — identical arithmetic is expressible
    * in any engine with integer division, which is what the color
    * oracle does). Returns each in 0..255. */
  def rgbToY(r: Int, g: Int, b: Int): Int =
    (299 * r + 587 * g + 114 * b + 500) / 1000
  def rgbToCb(r: Int, g: Int, b: Int): Int =
    (-168736 * r - 331264 * g + 500000 * b + 128500000) / 1000000
  def rgbToCr(r: Int, g: Int, b: Int): Int =
    (500000 * r - 418688 * g - 81312 * b + 128500000) / 1000000

  /** YCbCr → RGB, the inverse fixed point: numerators offset by
    * +256·scale so truncating division is floor, then −256 and clamp
    * to 0..255. */
  private def clamp8(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
  def yccToR(y: Int, cr: Int): Int =
    clamp8((1000 * y + 1402 * (cr - 128) + 500 + 256000) / 1000 - 256)
  def yccToG(y: Int, cb: Int, cr: Int): Int =
    clamp8((1000000 * y - 344136 * (cb - 128) - 714136 * (cr - 128)
      + 500000 + 256000000) / 1000000 - 256)
  def yccToB(y: Int, cb: Int): Int =
    clamp8((1000 * y + 1772 * (cb - 128) + 500 + 256000) / 1000 - 256)

  // ---------------------------------------------------- color encoder

  /** Encode 24-bit RGB (`rgb(x, y)` = packed 0xRRGGBB) as a baseline
    * 3-component YCbCr JPEG. `sampling`: "444" (no subsampling),
    * "422" (chroma halved horizontally), or "420" (halved both ways)
    * — Y carries the max sampling factors, chroma is 1×1, the
    * standard layout. Chroma planes are box-averaged (+half,
    * truncating) over each Hmax×Vmax pixel group with edge
    * replication; both quant tables are the uniform [[QStep]] and all
    * components share the Annex K luminance Huffman pair, so
    * MCU-grid-flat fixtures round-trip bit-exact per plane. */
  def encodeJpegColor(w: Int, h: Int, rgb: (Int, Int) => Int,
      sampling: String = "420"): Array[Byte] = {
    val (hy, vy) = sampling match {
      case "444" => (1, 1)
      case "422" => (2, 1)
      case "420" => (2, 2)
      case other => throw new IllegalArgumentException(
        s"unsupported sampling '$other' (444|422|420)")
    }
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, payload: Array[Int]): Unit = {
      marker(m)
      val len = payload.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      payload.foreach(out.write)
    }
    marker(0xd8) // SOI
    // DQT: luma table 0, chroma table 1, both uniform QStep
    seg(0xdb, Array(0x00) ++ Array.fill(64)(QStep))
    seg(0xdb, Array(0x01) ++ Array.fill(64)(QStep))
    // SOF0: 3 components — Y id 1 (hy×vy, quant 0), Cb id 2, Cr id 3
    // (1×1, quant 1)
    seg(0xc0, Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, 3,
      1, (hy << 4) | vy, 0, 2, 0x11, 1, 3, 0x11, 1))
    seg(0xc4, Array(0x00) ++ DcBits ++ DcVals)
    seg(0xc4, Array(0x10) ++ AcBits ++ AcVals)
    // SOS: all three components on DC table 0 / AC table 0
    seg(0xda, Array(3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0))

    // full-res YCbCr planes (edge coordinates clamp-replicate)
    def att(x: Int, y: Int): Int = rgb(math.min(x, w - 1), math.min(y, h - 1))
    def yAt(x: Int, y: Int): Int = {
      val p = att(x, y)
      rgbToY((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
    }
    def chromaAt(x: Int, y: Int, cr: Boolean): Int = {
      // box average over the hy×vy group anchored at (x·hy, y·vy)
      var s = 0; var j = 0
      while (j < vy) {
        var i = 0
        while (i < hy) {
          val p = att(x * hy + i, y * vy + j)
          val (r, g, b) = ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
          s += (if (cr) rgbToCr(r, g, b) else rgbToCb(r, g, b))
          i += 1
        }
        j += 1
      }
      (s + hy * vy / 2) / (hy * vy)
    }

    val bw = new BitWriter(out)
    val mcusX = (w + 8 * hy - 1) / (8 * hy)
    val mcusY = (h + 8 * vy - 1) / (8 * vy)
    val prevDc = new Array[Int](3)
    def writeBlock(ci: Int, sample: (Int, Int) => Int, ox: Int, oy: Int): Unit = {
      val block = new Array[Double](64)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          block(y * 8 + x) = sample(ox + x, oy + y) - 128.0
          x += 1
        }
        y += 1
      }
      val coef = fdct(block)
      val q = new Array[Int](64)
      var k = 0
      while (k < 64) { q(k) = math.round(coef(Zigzag(k)) / QStep).toInt; k += 1 }
      val diff = q(0) - prevDc(ci); prevDc(ci) = q(0)
      val dcat = category(diff)
      val (dcode, dlen) = DcEnc(dcat)
      bw.put(dcode, dlen)
      if (dcat > 0)
        bw.put(if (diff < 0) diff + (1 << dcat) - 1 else diff, dcat)
      var run = 0
      k = 1
      while (k < 64) {
        if (q(k) == 0) run += 1
        else {
          while (run >= 16) {
            val (zc, zl) = AcEnc(0xf0); bw.put(zc, zl); run -= 16
          }
          val acat = category(q(k))
          val (c, l) = AcEnc((run << 4) | acat)
          bw.put(c, l)
          bw.put(if (q(k) < 0) q(k) + (1 << acat) - 1 else q(k), acat)
          run = 0
        }
        k += 1
      }
      if (run > 0) { val (c, l) = AcEnc(0x00); bw.put(c, l) }
    }
    // chroma planes run at mcusX·8 × mcusY·8 resolution, so a chroma
    // sample (cx, cy) covers source pixels (cx·hy.., cy·vy..)
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        // Y blocks: vy×hy in raster order, then one Cb, one Cr
        var bv = 0
        while (bv < vy) {
          var bh = 0
          while (bh < hy) {
            writeBlock(0, yAt, (mx * hy + bh) * 8, (my * vy + bv) * 8)
            bh += 1
          }
          bv += 1
        }
        writeBlock(1, chromaAt(_, _, cr = false), mx * 8, my * 8)
        writeBlock(2, chromaAt(_, _, cr = true), mx * 8, my * 8)
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  // ---------------------------------------------------------- decoder

  /** One scan component: sampling factors, quant table, and the
    * Huffman pair the SOS selected for it. */
  private final case class Comp(h: Int, v: Int, quant: Array[Int],
    dcTable: Map[(Int, Int), Int], acTable: Map[(Int, Int), Int])

  /** Parsed stream state up to SOS — 1 (gray), 3 (YCbCr), or 4
    * (CMYK/YCCK) components, MCU-interleaved baseline scan.
    * `adobeTransform` is the APP14 color-transform flag (0 = none /
    * CMYK-as-stored, 1 = YCbCr, 2 = YCCK; -1 when the marker is
    * absent — 3-comp streams then default to YCbCr, 4-comp to plain
    * CMYK, the libjpeg convention). */
  private final case class ScanInfo(w: Int, h: Int, comps: Array[Comp],
    dataOff: Int, adobeTransform: Int = -1)

  private def parseToScan(b: Array[Byte]): Option[ScanInfo] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    var w = -1; var h = -1
    val quants = new Array[Array[Int]](4)
    val dcs = new Array[Map[(Int, Int), Int]](4)
    val acs = new Array[Map[(Int, Int), Int]](4)
    // SOF per-component: id → (h, v, tq), in frame order
    var frameIds: Array[Int] = null
    var frameHv: Array[(Int, Int, Int)] = null
    var adobe = -1 // APP14 color-transform flag (absent = -1)
    var i = 2
    while (i + 4 <= b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      val m = b(i + 1) & 0xff
      if (m == 0xd9) return None // EOI before SOS
      val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
      val p = i + 4
      if (p + len - 2 > b.length) return None
      m match {
        case 0xdb => // DQT (possibly several tables per segment)
          var o = p
          while (o < p + len - 2) {
            val pq = (b(o) & 0xff) >> 4; val tq = b(o) & 0x0f
            val n = if (pq == 0) 64 else 128
            if (pq == 0)
              quants(tq) = Array.tabulate(64)(k => b(o + 1 + k) & 0xff)
            else
              quants(tq) = Array.tabulate(64)(k =>
                ((b(o + 1 + 2 * k) & 0xff) << 8) | (b(o + 2 + 2 * k) & 0xff))
            o += 1 + n
          }
        case 0xc0 => // SOF0 baseline
          if ((b(p) & 0xff) != 8) return None // 8-bit only
          h = ((b(p + 1) & 0xff) << 8) | (b(p + 2) & 0xff)
          w = ((b(p + 3) & 0xff) << 8) | (b(p + 4) & 0xff)
          val nComp = b(p + 5) & 0xff
          if (nComp != 1 && nComp != 3 && nComp != 4) return None
          frameIds = new Array[Int](nComp)
          frameHv = new Array[(Int, Int, Int)](nComp)
          var c = 0
          while (c < nComp) {
            frameIds(c) = b(p + 6 + 3 * c) & 0xff
            val hv = b(p + 7 + 3 * c) & 0xff
            frameHv(c) = (hv >> 4, hv & 0x0f, b(p + 8 + 3 * c) & 0x0f)
            c += 1
          }
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
            0xcb | 0xcd | 0xce | 0xcf =>
          return None // non-baseline SOF (progressive etc.)
        case 0xc4 => // DHT (possibly several tables per segment)
          var o = p
          while (o < p + len - 2) {
            val tc = (b(o) & 0xff) >> 4; val th = b(o) & 0x0f
            val bits = Array.tabulate(16)(k => b(o + 1 + k) & 0xff)
            val nv = bits.sum
            val vals = Array.tabulate(nv)(k => b(o + 17 + k) & 0xff)
            if (tc == 0) dcs(th) = decodeTable(bits, vals)
            else acs(th) = decodeTable(bits, vals)
            o += 17 + nv
          }
        case 0xda => // SOS
          val nComp = b(p) & 0xff
          if (frameIds == null || nComp != frameIds.length) return None
          val comps = new Array[Comp](nComp)
          var c = 0
          while (c < nComp) {
            val cid = b(p + 1 + 2 * c) & 0xff
            val fi = frameIds.indexOf(cid)
            if (fi < 0) return None
            val (ch, cv, tq) = frameHv(fi)
            val td = (b(p + 2 + 2 * c) & 0xff) >> 4
            val ta = b(p + 2 + 2 * c) & 0x0f
            if (quants(tq) == null || dcs(td) == null || acs(ta) == null)
              return None
            if (ch < 1 || ch > 2 || cv < 1 || cv > 2) return None
            comps(fi) = Comp(ch, cv, quants(tq), dcs(td), acs(ta))
            c += 1
          }
          if (w <= 0 || h <= 0) return None
          // bound total pixels BEFORE any plane allocation: 16-bit
          // dims can still multiply past Int range once channel and
          // MCU-padding factors stack (lying headers are data)
          if (w.toLong * h.toLong > (1L << 26)) return None
          // single-component scans are 1×1 by the baseline MCU rule
          if (nComp == 1 && (comps(0).h != 1 || comps(0).v != 1))
            return None
          return Some(ScanInfo(w, h, comps, p + len - 2, adobe))
        case 0xee => // APP14: Adobe color-transform flag (last byte)
          if (len - 2 >= 12 && b(p) == 'A' && b(p + 1) == 'd' &&
              b(p + 2) == 'o' && b(p + 3) == 'b' && b(p + 4) == 'e')
            adobe = b(p + 11) & 0xff
        case _ => // APPn, COM, DRI (restarts unsupported but len-skipped)
      }
      i = p + len - 2
    }
    None
  }

  /** Decode quarantine: segment handlers trust each segment's declared
    * length for their fixed-size fields, so a truncated or lying `len`
    * at the end of the buffer indexes past it — and lying DIMENSIONS
    * can push plane/buffer allocation into negative or overflowing
    * sizes (NegativeArraySizeException, ArithmeticException on
    * overflow math). Malformed bytes are DATA, not exceptions — every
    * public decode entry point funnels through this guard and returns
    * None instead of escaping any of those into the quarantined
    * caller. OutOfMemoryError stays fatal by design: an Error, not a
    * data-shaped exception. */
  private def guarded[T](f: => Option[T]): Option[T] =
    try f catch {
      case _: IndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
      case _: ArithmeticException => None
    }

  /** (width, height, components) from the SOF0 header (magic +
    * marker walk). */
  def decodeJpegHeader(b: Array[Byte]): Option[(Int, Int, Int)] =
    guarded(parseToScan(b).map(s => (s.w, s.h, s.comps.length)))

  private def huffDecode(br: BitReader,
      table: Map[(Int, Int), Int]): Option[Int] = {
    var code = 0; var len = 0
    while (len < 16) {
      code = (code << 1) | br.bit()
      len += 1
      table.get((len, code)) match {
        case Some(v) => return Some(v)
        case None    =>
      }
    }
    None
  }

  /** Decode one entropy-coded block into 8-bit samples via the
    * component's tables; returns false on stream corruption. */
  private def decodeBlock(br: BitReader, c: Comp, prevDc: Array[Int],
      ci: Int, px: Array[Double]): Boolean = {
    val coef = new Array[Double](64)
    huffDecode(br, c.dcTable) match {
      case None => return false
      case Some(t) =>
        prevDc(ci) += extend(br.bits(t), t)
        coef(0) = prevDc(ci).toDouble * c.quant(0)
    }
    var k = 1
    var eob = false
    while (k < 64 && !eob) {
      huffDecode(br, c.acTable) match {
        case None => return false
        case Some(rs) =>
          val run = rs >> 4; val size = rs & 0x0f
          if (size == 0) {
            if (run == 15) k += 16 // ZRL
            else eob = true
          } else {
            k += run
            if (k > 63) return false
            coef(Zigzag(k)) = extend(br.bits(size), size).toDouble * c.quant(k)
            k += 1
          }
      }
    }
    if (br.truncated) return false
    val d = idct(coef)
    System.arraycopy(d, 0, px, 0, 64)
    true
  }

  /** Full baseline decode to per-component FULL-RESOLUTION planes
    * (top-left origin; chroma upsampled by replication). One plane
    * for grayscale streams, three (Y, Cb, Cr) for color. */
  def decodeJpegPlanes(b: Array[Byte]): Option[(Int, Int, Array[Array[Byte]])] =
    guarded(decodeJpegPlanesImpl(b))

  private def decodeJpegPlanesImpl(b: Array[Byte]): Option[(Int, Int, Array[Array[Byte]])] =
    parseToScan(b).flatMap { s =>
      val n = s.comps.length
      val hmax = s.comps.map(_.h).max; val vmax = s.comps.map(_.v).max
      val mcusX = (s.w + 8 * hmax - 1) / (8 * hmax)
      val mcusY = (s.h + 8 * vmax - 1) / (8 * vmax)
      // per-component padded plane (whole MCUs)
      val planeW = Array.tabulate(n)(i => mcusX * 8 * s.comps(i).h)
      val planeH = Array.tabulate(n)(i => mcusY * 8 * s.comps(i).v)
      val planes = Array.tabulate(n)(i => new Array[Byte](planeW(i) * planeH(i)))
      val br = new BitReader(b, s.dataOff)
      val prevDc = new Array[Int](n)
      val px = new Array[Double](64)
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          var ci = 0
          while (ci < n) {
            val c = s.comps(ci)
            var bv = 0
            while (bv < c.v) {
              var bh = 0
              while (bh < c.h) {
                if (!decodeBlock(br, c, prevDc, ci, px)) return None
                val ox = (mx * c.h + bh) * 8; val oy = (my * c.v + bv) * 8
                var y = 0
                while (y < 8) {
                  var x = 0
                  while (x < 8) {
                    val v = math.round(px(y * 8 + x) + 128).toInt
                    planes(ci)((oy + y) * planeW(ci) + ox + x) =
                      (if (v < 0) 0 else if (v > 255) 255 else v).toByte
                    x += 1
                  }
                  y += 1
                }
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
      // crop to image size and upsample to full resolution
      val out = Array.tabulate(n) { i =>
        val c = s.comps(i)
        val o = new Array[Byte](s.w * s.h)
        var y = 0
        while (y < s.h) {
          val sy = y * c.v / vmax
          var x = 0
          while (x < s.w) {
            o(y * s.w + x) = planes(i)(sy * planeW(i) + x * c.h / hmax)
            x += 1
          }
          y += 1
        }
        o
      }
      Some((s.w, s.h, out))
    }

  /** Baseline decode to 8-bit luma (top-left origin): the single
    * plane for grayscale streams, the full-resolution Y plane for
    * color — bit-identical to the historical grayscale path on
    * 1-component streams. */
  def decodeJpegGray(b: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    decodeJpegPlanes(b).map { case (w, h, planes) => (w, h, planes(0)) }

  /** Baseline decode to interleaved 8-bit RGB (3 bytes per pixel,
    * top-left origin): fixed-point YCbCr→RGB for color streams, gray
    * replicated across channels for 1-component streams. */
  def decodeJpegColor(b: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    decodeJpegPlanes(b).map { case (w, h, planes) =>
      val out = new Array[Byte](w * h * 3)
      if (planes.length == 1) {
        var i = 0
        while (i < w * h) {
          val g = planes(0)(i)
          out(3 * i) = g; out(3 * i + 1) = g; out(3 * i + 2) = g
          i += 1
        }
      } else {
        var i = 0
        while (i < w * h) {
          val y = planes(0)(i) & 0xff
          val cb = planes(1)(i) & 0xff
          val cr = planes(2)(i) & 0xff
          out(3 * i) = yccToR(y, cr).toByte
          out(3 * i + 1) = yccToG(y, cb, cr).toByte
          out(3 * i + 2) = yccToB(y, cb).toByte
          i += 1
        }
      }
      (w, h, out)
    }

  /** 4-component (CMYK / YCCK) baseline decode to interleaved 8-bit
    * RGB. Adobe print-pipeline streams store INVERTED ink values
    * (255 = no ink), so plain CMYK converts as r = c·k/255 on the
    * stored bytes directly (truncating — the arithmetic any engine
    * reproduces); YCCK (APP14 transform 2) first runs the standard
    * fixed-point YCbCr→RGB on the leading three components (whose
    * result IS the inverted CMY triple) and then applies the same
    * ·k/255. The libjpeg jdcolor convention, spelled out here because
    * the DuckDB oracle mirrors every division. */
  def decodeJpegRgb4(b: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    guarded(parseToScan(b)).filter(_.comps.length == 4).flatMap { s =>
      decodeJpegPlanes(b).map { case (w, h, pl) =>
        (w, h, cmyk4ToRgb(pl, w, h, s.adobeTransform == 2))
      }
    }

  /** The shared Adobe un-ink chain over four decoded component planes
    * (baseline and progressive alike). */
  private def cmyk4ToRgb(pl: Array[Array[Byte]], w: Int, h: Int,
      ycck: Boolean): Array[Byte] = {
    val out = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      val k = pl(3)(i) & 0xff
      val (c, m, yv) =
        if (ycck)
          (yccToR(pl(0)(i) & 0xff, pl(2)(i) & 0xff),
            yccToG(pl(0)(i) & 0xff, pl(1)(i) & 0xff, pl(2)(i) & 0xff),
            yccToB(pl(0)(i) & 0xff, pl(1)(i) & 0xff))
        else (pl(0)(i) & 0xff, pl(1)(i) & 0xff, pl(2)(i) & 0xff)
      out(3 * i) = ((c * k) / 255).toByte
      out(3 * i + 1) = ((m * k) / 255).toByte
      out(3 * i + 2) = ((yv * k) / 255).toByte
      i += 1
    }
    out
  }

  private def rgbToLuma(rgb: Array[Byte], n: Int): Array[Byte] = {
    val g = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val o = 3 * i
      g(i) = ((299 * (rgb(o) & 0xff) + 587 * (rgb(o + 1) & 0xff) +
        114 * (rgb(o + 2) & 0xff)) / 1000).toByte
      i += 1
    }
    g
  }

  /** 4-component decode to 8-bit luma: BT.601 integer luma of
    * [[decodeJpegRgb4]]'s RGB. */
  def decodeJpegLuma4(b: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    decodeJpegRgb4(b).map { case (w, h, rgb) =>
      (w, h, rgbToLuma(rgb, w * h))
    }

  /** Encode four flat-per-block component planes as a baseline
    * 4-component JPEG with an Adobe APP14 marker (`transform` 0 =
    * plain CMYK, 2 = YCCK) — the CMYK fixture twin of
    * [[encodeJpegGray]]: all components 1×1-sampled and sharing the
    * uniform [[QStep]] table and Annex K Huffman pair, so each flat
    * 8×8 block survives the quantization round-trip exactly and a SQL
    * oracle recomputes decoded pixels from `comp(ci, bx, by)` with no
    * DCT. */
  def encodeJpegCmyk(w: Int, h: Int, comp: (Int, Int, Int) => Int,
      transform: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, payload: Array[Int]): Unit = {
      marker(m)
      val len = payload.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      payload.foreach(out.write)
    }
    marker(0xd8) // SOI
    // APP14 "Adobe": version 100, flags 0, color transform
    seg(0xee, Array('A', 'd', 'o', 'b', 'e', 0, 100, 0, 0, 0, 0, transform))
    seg(0xdb, Array(0x00) ++ Array.fill(64)(QStep))
    // SOF0: 8-bit, 4 components (ids 1..4), all 1×1, quant table 0
    seg(0xc0, Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, 4) ++
      (1 to 4).flatMap(id => Seq(id, 0x11, 0)))
    seg(0xc4, Array(0x00) ++ DcBits ++ DcVals)
    seg(0xc4, Array(0x10) ++ AcBits ++ AcVals)
    // SOS: 4 components, all on DC table 0 / AC table 0
    seg(0xda, Array(4) ++ (1 to 4).flatMap(id => Seq(id, 0x00)) ++
      Seq(0, 63, 0))
    val bw = new BitWriter(out)
    val bx = (w + 7) / 8; val by = (h + 7) / 8
    val prevDc = new Array[Int](4)
    var byI = 0
    while (byI < by) {
      var bxI = 0
      while (bxI < bx) {
        var ci = 0
        while (ci < 4) {
          val v = comp(ci, bxI, byI) & 0xff
          val block = Array.fill(64)(v - 128.0)
          val coef = fdct(block)
          val dc = math.round(coef(0) / QStep).toInt
          val diff = dc - prevDc(ci); prevDc(ci) = dc
          val dcat = category(diff)
          val (dcode, dlen) = DcEnc(dcat)
          bw.put(dcode, dlen)
          if (dcat > 0)
            bw.put(if (diff < 0) diff + (1 << dcat) - 1 else diff, dcat)
          val (ec, el) = AcEnc(0x00) // flat block: EOB right after DC
          bw.put(ec, el)
          ci += 1
        }
        bxI += 1
      }
      byI += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Four flat-per-block component planes as a PROGRESSIVE (SOF2)
    * 4-component JPEG with an Adobe APP14 marker — the CMYK twin of
    * [[encodeJpegProgressiveGray]] with a DC-only scan script: DC
    * first at Al=1 interleaved over all four components (the 4-way
    * MCU walk the gray fixture cannot exercise), then the DC
    * refinement. Flat blocks carry no AC energy, so two scans
    * reconstruct the fixture exactly and the SAME closed-form oracle
    * covers baseline and progressive containers. */
  def encodeJpegProgressiveCmyk(w: Int, h: Int,
      comp: (Int, Int, Int) => Int, transform: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, payload: Array[Int]): Unit = {
      marker(m)
      val len = payload.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      payload.foreach(out.write)
    }
    marker(0xd8)
    seg(0xee, Array('A', 'd', 'o', 'b', 'e', 0, 100, 0, 0, 0, 0, transform))
    seg(0xdb, Array(0x00) ++ Array.fill(64)(QStep))
    seg(0xc2, Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, 4) ++
      (1 to 4).flatMap(id => Seq(id, 0x11, 0)))
    seg(0xc4, Array(0x00) ++ DcBits ++ DcVals)
    val bx = (w + 7) / 8; val by = (h + 7) / 8
    // quantized DC per (block, comp) — flat blocks, same fdct/QStep
    // round-trip as the baseline twin
    val dcq = Array.ofDim[Int](bx * by, 4)
    var bi = 0
    while (bi < bx * by) {
      var ci = 0
      while (ci < 4) {
        val v = comp(ci, bi % bx, bi / bx) & 0xff
        dcq(bi)(ci) = math.round(fdct(Array.fill(64)(v - 128.0))(0) / QStep).toInt
        ci += 1
      }
      bi += 1
    }
    // scan 1: DC first (Al=1), interleaved over all four components
    seg(0xda, Array(4) ++ (1 to 4).flatMap(id => Seq(id, 0x00)) ++
      Seq(0, 0, 0x01))
    var bw = new BitWriter(out)
    val prevDc = new Array[Int](4)
    bi = 0
    while (bi < bx * by) {
      var ci = 0
      while (ci < 4) {
        val v = dcq(bi)(ci) >> 1 // arithmetic: magnitude toward -inf pairs
        val diff = v - prevDc(ci); prevDc(ci) = v // with the |= refinement
        val t = category(diff)
        val (dc, dl) = DcEnc(t); bw.put(dc, dl)
        if (t > 0) bw.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
        ci += 1
      }
      bi += 1
    }
    bw.flush()
    // scan 2: DC refinement (Ah=1, Al=0) — one raw bit per block/comp
    seg(0xda, Array(4) ++ (1 to 4).flatMap(id => Seq(id, 0x00)) ++
      Seq(0, 0, 0x10))
    bw = new BitWriter(out)
    bi = 0
    while (bi < bx * by) {
      var ci = 0
      while (ci < 4) { bw.put(dcq(bi)(ci) & 1, 1); ci += 1 }
      bi += 1
    }
    bw.flush()
    marker(0xd9)
    out.toByteArray
  }

  // ----------------------------------------- progressive (SOF2) decoder

  /** First index at/after `from` holding a real marker (FF followed by
    * neither a stuffed 00 nor an RSTn) — the end of an entropy-coded
    * segment. */
  private def scanEnd(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length) {
      if ((b(i) & 0xff) == 0xff) {
        val m = b(i + 1) & 0xff
        if (m != 0x00 && !(m >= 0xd0 && m <= 0xd7)) return i
      }
      i += 1
    }
    b.length
  }

  /** Test-only instrumentation: called after each decoded scan with
    * (scan#, per-component zigzag coefficient buffers). */
  private[ops] var debugScanHook: (Int, Array[Array[Int]]) => Unit = null

  /** Progressive (SOF2) decode to per-component full-resolution planes
    * — the multi-scan successive-approximation stream every big crawl
    * is full of. Coefficients accumulate across scans in a per-block
    * zigzag-order buffer: DC-first scans code point-transformed diffs
    * (`pred << Al`), DC refinements OR in one raw bit per block, AC
    * firsts run the EOB-run Huffman stream at `<< Al`, AC refinements
    * run the T.81 G.1.2.3 correction-bit walk. Interleaved (multi-
    * component) scans traverse the MCU grid; single-component scans
    * traverse the component's own ceil(dim/8) grid. After EOI every
    * block is dequantized and IDCT'd exactly like the baseline path.
    * Restart intervals are refused (None), like the baseline decoder:
    * fall back to metadata-only handling rather than risk desync. */
  def decodeProgressivePlanes(b: Array[Byte]): Option[(Int, Int, Array[Array[Byte]])] =
    guarded(decodeProgressivePlanesImpl(b)).map {
      case (w, h, pl, _) => (w, h, pl)
    }

  /** 4-component progressive (SOF2) decode to interleaved RGB: the
    * coefficient reassembly above plus the SAME Adobe un-ink chain as
    * the baseline path ([[decodeJpegRgb4]] — plain CMYK vs YCCK by
    * the APP14 transform flag). */
  def decodeProgressiveRgb4(b: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    guarded(decodeProgressivePlanesImpl(b)).collect {
      case (w, h, pl, adobe) if pl.length == 4 =>
        (w, h, cmyk4ToRgb(pl, w, h, adobe == 2))
    }

  /** 4-component progressive decode to 8-bit luma: BT.601 of
    * [[decodeProgressiveRgb4]]. */
  def decodeProgressiveLuma4(b: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    decodeProgressiveRgb4(b).map { case (w, h, rgb) =>
      (w, h, rgbToLuma(rgb, w * h))
    }

  private def decodeProgressivePlanesImpl(
      b: Array[Byte]): Option[(Int, Int, Array[Array[Byte]], Int)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    var w = -1; var h = -1
    var adobe = -1 // APP14 color-transform flag (2 = YCCK)
    val quants = new Array[Array[Int]](4)
    val dcs = new Array[Map[(Int, Int), Int]](4)
    val acs = new Array[Map[(Int, Int), Int]](4)
    var frameIds: Array[Int] = null
    var frameHv: Array[(Int, Int, Int)] = null // (h, v, tq)
    var hmax = 0; var vmax = 0; var mcusX = 0; var mcusY = 0
    var coefs: Array[Array[Int]] = null // per comp: blocks × 64, zigzag order
    var strideB: Array[Int] = null      // padded block-row stride (MCU grid)
    var compBW: Array[Int] = null       // ceil grid (non-interleaved coverage)
    var compBH: Array[Int] = null
    var nScans = 0

    def decodeScan(dataOff: Int, sComps: Array[Int], tds: Array[Int],
        tas: Array[Int], ss: Int, se: Int, ah: Int, al: Int): Boolean = {
      val br = new BitReader(b, dataOff)
      var eobrun = 0
      val prevDc = new Array[Int](sComps.length)

      def dcBlock(si: Int, off: Int): Boolean = {
        val ci = sComps(si)
        if (ah == 0) {
          val tab = dcs(tds(si)); if (tab == null) return false
          huffDecode(br, tab) match {
            case None => return false
            case Some(t) =>
              prevDc(si) += extend(br.bits(t), t)
              coefs(ci)(off) = prevDc(si) << al
          }
        } else if (br.bit() == 1) coefs(ci)(off) |= 1 << al
        !br.truncated
      }

      def acFirst(ci: Int, off: Int): Boolean = {
        if (eobrun > 0) { eobrun -= 1; return true }
        val tab = acs(tas(0)); if (tab == null) return false
        var k = ss
        while (k <= se) {
          huffDecode(br, tab) match {
            case None => return false
            case Some(rs) =>
              val r = rs >> 4; val s = rs & 0x0f
              if (s == 0) {
                if (r == 15) k += 16 // ZRL
                else {
                  eobrun = (1 << r) - 1
                  if (r > 0) eobrun += br.bits(r)
                  return !br.truncated
                }
              } else {
                k += r
                if (k > se) return false
                coefs(ci)(off + k) = extend(br.bits(s), s) << al
                k += 1
              }
          }
        }
        !br.truncated
      }

      def acRefine(ci: Int, off: Int): Boolean = {
        val p1 = 1 << al; val m1 = -1 << al
        val buf = coefs(ci)
        def correct(k: Int): Unit = {
          val c = buf(off + k)
          if (br.bit() == 1 && (c & p1) == 0)
            buf(off + k) = c + (if (c >= 0) p1 else m1)
        }
        var k = ss
        if (eobrun == 0) {
          val tab = acs(tas(0)); if (tab == null) return false
          var break = false
          while (k <= se && !break) {
            huffDecode(br, tab) match {
              case None => return false
              case Some(rs) =>
                var r = rs >> 4; val s = rs & 0x0f
                var newval = 0
                if (s == 0) {
                  if (r != 15) { // EOBn
                    eobrun = (1 << r)
                    if (r > 0) eobrun += br.bits(r)
                    break = true
                  }
                  // r == 15: ZRL — skip 16 zero-history positions below
                } else {
                  if (s != 1) return false
                  newval = if (br.bit() == 1) p1 else m1
                }
                if (!break) {
                  var placed = false
                  while (k <= se && !placed) {
                    if (buf(off + k) != 0) { correct(k); k += 1 }
                    else if (r == 0) placed = true
                    else { r -= 1; k += 1 }
                  }
                  if (newval != 0 && k <= se) buf(off + k) = newval
                  k += 1
                }
            }
          }
        }
        if (eobrun > 0) {
          while (k <= se) {
            if (buf(off + k) != 0) correct(k)
            k += 1
          }
          eobrun -= 1
        }
        !br.truncated
      }

      if (ss == 0) { // DC scan (interleaved over scan comps, or raster)
        if (se != 0) return false
        if (sComps.length == 1) {
          val ci = sComps(0)
          var by = 0
          while (by < compBH(ci)) {
            var bx = 0
            while (bx < compBW(ci)) {
              if (!dcBlock(0, (by * strideB(ci) + bx) * 64)) return false
              bx += 1
            }
            by += 1
          }
        } else {
          var my = 0
          while (my < mcusY) {
            var mx = 0
            while (mx < mcusX) {
              var si = 0
              while (si < sComps.length) {
                val ci = sComps(si)
                val (ch, cv, _) = frameHv(ci)
                var bv = 0
                while (bv < cv) {
                  var bh = 0
                  while (bh < ch) {
                    val off =
                      ((my * cv + bv) * strideB(ci) + mx * ch + bh) * 64
                    if (!dcBlock(si, off)) return false
                    bh += 1
                  }
                  bv += 1
                }
                si += 1
              }
              mx += 1
            }
            my += 1
          }
        }
      } else { // AC scan: single component, non-interleaved
        if (sComps.length != 1 || se > 63 || ss > se) return false
        val ci = sComps(0)
        var by = 0
        while (by < compBH(ci)) {
          var bx = 0
          while (bx < compBW(ci)) {
            val off = (by * strideB(ci) + bx) * 64
            val ok = if (ah == 0) acFirst(ci, off) else acRefine(ci, off)
            if (!ok) return false
            bx += 1
          }
          by += 1
        }
      }
      true
    }

    var i = 2
    var sawEoi = false
    while (i + 2 <= b.length && !sawEoi) {
      if ((b(i) & 0xff) != 0xff) return None
      val m = b(i + 1) & 0xff
      if (m == 0xd9) { sawEoi = true; i += 2 }
      else {
        if (i + 4 > b.length) return None
        val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
        val p = i + 4
        if (p + len - 2 > b.length) return None
        m match {
          case 0xdb =>
            var o = p
            while (o < p + len - 2) {
              val pq = (b(o) & 0xff) >> 4; val tq = b(o) & 0x0f
              if (pq == 0)
                quants(tq) = Array.tabulate(64)(k => b(o + 1 + k) & 0xff)
              else
                quants(tq) = Array.tabulate(64)(k =>
                  ((b(o + 1 + 2 * k) & 0xff) << 8) | (b(o + 2 + 2 * k) & 0xff))
              o += 1 + (if (pq == 0) 64 else 128)
            }
          case 0xc4 =>
            var o = p
            while (o < p + len - 2) {
              val tc = (b(o) & 0xff) >> 4; val th = b(o) & 0x0f
              val bits = Array.tabulate(16)(k => b(o + 1 + k) & 0xff)
              val nv = bits.sum
              val vals = Array.tabulate(nv)(k => b(o + 17 + k) & 0xff)
              if (tc == 0) dcs(th) = decodeTable(bits, vals)
              else acs(th) = decodeTable(bits, vals)
              o += 17 + nv
            }
          case 0xdd =>
            if ((((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)) != 0) return None
          case 0xee => // APP14 "Adobe": transform byte at offset 11
            if (len >= 14 && b(p) == 'A' && b(p + 1) == 'd' &&
              b(p + 2) == 'o' && b(p + 3) == 'b' && b(p + 4) == 'e')
              adobe = b(p + 11) & 0xff
          case 0xc2 =>
            if ((b(p) & 0xff) != 8) return None
            h = ((b(p + 1) & 0xff) << 8) | (b(p + 2) & 0xff)
            w = ((b(p + 3) & 0xff) << 8) | (b(p + 4) & 0xff)
            val nComp = b(p + 5) & 0xff
            if (nComp != 1 && nComp != 3 && nComp != 4) return None
            if (w <= 0 || h <= 0) return None
            // bound total pixels BEFORE any plane allocation: 16-bit
            // dims can still multiply past Int range once channel and
            // MCU-padding factors stack (lying headers are data)
            if (w.toLong * h.toLong > (1L << 26)) return None
            frameIds = new Array[Int](nComp)
            frameHv = new Array[(Int, Int, Int)](nComp)
            var c = 0
            while (c < nComp) {
              frameIds(c) = b(p + 6 + 3 * c) & 0xff
              val hv = b(p + 7 + 3 * c) & 0xff
              frameHv(c) = (hv >> 4, hv & 0x0f, b(p + 8 + 3 * c) & 0x0f)
              if (frameHv(c)._1 < 1 || frameHv(c)._1 > 2 ||
                frameHv(c)._2 < 1 || frameHv(c)._2 > 2) return None
              c += 1
            }
            hmax = frameHv.map(_._1).max; vmax = frameHv.map(_._2).max
            mcusX = (w + 8 * hmax - 1) / (8 * hmax)
            mcusY = (h + 8 * vmax - 1) / (8 * vmax)
            strideB = Array.tabulate(nComp)(ci => mcusX * frameHv(ci)._1)
            compBW = Array.tabulate(nComp) { ci =>
              val cw = (w * frameHv(ci)._1 + hmax - 1) / hmax
              (cw + 7) / 8
            }
            compBH = Array.tabulate(nComp) { ci =>
              val chh = (h * frameHv(ci)._2 + vmax - 1) / vmax
              (chh + 7) / 8
            }
            coefs = Array.tabulate(nComp)(ci =>
              new Array[Int](strideB(ci) * mcusY * frameHv(ci)._2 * 64))
          case 0xc0 | 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
              0xcb | 0xcd | 0xce | 0xcf =>
            return None // this path decodes SOF2 only
          case 0xda =>
            if (coefs == null) return None
            val nS = b(p) & 0xff
            if (nS < 1 || nS > frameIds.length) return None
            val sComps = new Array[Int](nS)
            val tds = new Array[Int](nS); val tas = new Array[Int](nS)
            var c = 0
            while (c < nS) {
              val fi = frameIds.indexOf(b(p + 1 + 2 * c) & 0xff)
              if (fi < 0) return None
              sComps(c) = fi
              tds(c) = (b(p + 2 + 2 * c) & 0xff) >> 4
              tas(c) = b(p + 2 + 2 * c) & 0x0f
              c += 1
            }
            val ss = b(p + 1 + 2 * nS) & 0xff
            val se = b(p + 2 + 2 * nS) & 0xff
            val aa = b(p + 3 + 2 * nS) & 0xff
            val dataOff = p + len - 2
            if (!decodeScan(dataOff, sComps, tds, tas, ss, se,
              aa >> 4, aa & 0x0f)) return None
            nScans += 1
            if (debugScanHook != null) debugScanHook(nScans, coefs)
            i = scanEnd(b, dataOff)
          case _ => ()
        }
        if (m != 0xda && m != 0xd9) i = p + len - 2
      }
    }
    if (coefs == null || nScans == 0) return None
    // dequantize + IDCT every (padded-grid) block, then crop/upsample
    val n = frameIds.length
    val planeW = Array.tabulate(n)(ci => strideB(ci) * 8)
    val planeH = Array.tabulate(n)(ci => mcusY * frameHv(ci)._2 * 8)
    val planes = Array.tabulate(n)(ci => new Array[Byte](planeW(ci) * planeH(ci)))
    var ci = 0
    while (ci < n) {
      val q = quants(frameHv(ci)._3)
      if (q == null) return None
      val bw = strideB(ci); val bh = planeH(ci) / 8
      val natural = new Array[Double](64)
      var bi = 0
      while (bi < bw * bh) {
        java.util.Arrays.fill(natural, 0.0)
        var k = 0
        while (k < 64) {
          val v = coefs(ci)(bi * 64 + k)
          if (v != 0) natural(Zigzag(k)) = v.toDouble * q(k)
          k += 1
        }
        val d = idct(natural)
        val ox = (bi % bw) * 8; val oy = (bi / bw) * 8
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val v = math.round(d(y * 8 + x) + 128).toInt
            planes(ci)((oy + y) * planeW(ci) + ox + x) =
              (if (v < 0) 0 else if (v > 255) 255 else v).toByte
            x += 1
          }
          y += 1
        }
        bi += 1
      }
      ci += 1
    }
    val out = Array.tabulate(n) { ci2 =>
      val (chh, cv, _) = frameHv(ci2)
      val o = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        val sy = y * cv / vmax
        var x = 0
        while (x < w) {
          o(y * w + x) = planes(ci2)(sy * planeW(ci2) + x * chh / hmax)
          x += 1
        }
        y += 1
      }
      o
    }
    Some((w, h, out, adobe))
  }

  /** (width, height, components) from a progressive (SOF2) header. */
  def decodeProgressiveHeader(b: Array[Byte]): Option[(Int, Int, Int)] =
    guarded(decodeProgressiveHeaderImpl(b))

  private def decodeProgressiveHeaderImpl(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    var i = 2
    while (i + 4 <= b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      val m = b(i + 1) & 0xff
      if (m == 0xd9 || m == 0xda) return None
      val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
      val p = i + 4
      if (p + len - 2 > b.length) return None
      if (m == 0xc2) {
        val hh = ((b(p + 1) & 0xff) << 8) | (b(p + 2) & 0xff)
        val ww = ((b(p + 3) & 0xff) << 8) | (b(p + 4) & 0xff)
        return Some((ww, hh, b(p + 5) & 0xff))
      }
      if ((m >= 0xc0 && m <= 0xcf) && m != 0xc4 && m != 0xc8 && m != 0xcc)
        return None // some other frame type
      i = p + len - 2
    }
    None
  }

  // ---------------------------------------- progressive (SOF2) encoder

  /** Progressive grayscale encoder for fixtures: a 5-scan successive-
    * approximation script (DC first at Al=1 → AC 1–5 first at Al=1 →
    * AC 6–63 first at Al=1 → DC refinement → AC 1–63 refinement) so a
    * round-trip exercises every scan kind the decoder supports. Same
    * uniform QStep and std tables as [[encodeJpegGray]] — flat 8×8
    * blocks therefore stay closed-form exact (only the DC coefficient
    * survives quantization, and QStep·8 divides the DCT's flat-block
    * DC exactly). Each scan ends with its own EOB code (no cross-
    * block EOB runs — an encoder's choice the spec allows). */
  def encodeJpegProgressiveGray(w: Int, h: Int, pix: (Int, Int) => Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, payload: Array[Int]): Unit = {
      marker(m)
      val len = payload.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      payload.foreach(out.write)
    }
    marker(0xd8)
    seg(0xdb, Array(0x00) ++ Array.fill(64)(QStep))
    // SOF2 (progressive), 1 component
    seg(0xc2, Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, 1, 1, 0x11, 0))
    seg(0xc4, Array(0x00) ++ DcBits ++ DcVals)
    seg(0xc4, Array(0x10) ++ AcBits ++ AcVals)

    // quantized coefficients for every block, zigzag order
    val bx = (w + 7) / 8; val by = (h + 7) / 8
    val qblocks = new Array[Array[Int]](bx * by)
    var bi = 0
    while (bi < bx * by) {
      val block = new Array[Double](64)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          val sx = math.min((bi % bx) * 8 + x, w - 1)
          val sy = math.min((bi / bx) * 8 + y, h - 1)
          block(y * 8 + x) = (pix(sx, sy) & 0xff) - 128.0
          x += 1
        }
        y += 1
      }
      val coef = fdct(block)
      qblocks(bi) = Array.tabulate(64)(k =>
        math.round(coef(Zigzag(k)) / QStep).toInt)
      bi += 1
    }

    def sosHeader(ss: Int, se: Int, ah: Int, al: Int): Unit =
      seg(0xda, Array(1, 1, 0x00, ss, se, (ah << 4) | al))

    // scan 1: DC first, Al=1 (diffs over the point-transformed values)
    sosHeader(0, 0, 0, 1)
    var bw = new BitWriter(out)
    var prevDc = 0
    bi = 0
    while (bi < bx * by) {
      val v = qblocks(bi)(0) >> 1
      val diff = v - prevDc; prevDc = v
      val t = category(diff)
      val (dc, dl) = DcEnc(t); bw.put(dc, dl)
      if (t > 0) bw.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
      bi += 1
    }
    bw.flush()

    // scans 2-3: AC first at Al=1, bands 1-5 then 6-63
    for ((ss, se) <- Seq((1, 5), (6, 63))) {
      sosHeader(ss, se, 0, 1)
      bw = new BitWriter(out)
      bi = 0
      while (bi < bx * by) {
        val q = qblocks(bi)
        var run = 0
        var k = ss
        var lastCoded = ss - 1 // band position of the last coded coef
        while (k <= se) {
          // point transform divides MAGNITUDE by 2^Al (shift toward 0)
          val pv = if (q(k) >= 0) q(k) >> 1 else -((-q(k)) >> 1)
          if (pv == 0) run += 1
          else {
            while (run >= 16) {
              val (zc, zl) = AcEnc(0xf0); bw.put(zc, zl); run -= 16
            }
            val t = category(pv)
            val (c, l) = AcEnc((run << 4) | t)
            bw.put(c, l)
            bw.put(if (pv < 0) pv + (1 << t) - 1 else pv, t)
            run = 0; lastCoded = k
          }
          k += 1
        }
        // EOB0 unless the band's last coefficient itself was coded
        if (lastCoded < se) { val (c, l) = AcEnc(0x00); bw.put(c, l) }
        bi += 1
      }
      bw.flush()
    }

    // scan 4: DC refinement (Ah=1, Al=0) — one raw bit per block
    sosHeader(0, 0, 1, 0)
    bw = new BitWriter(out)
    bi = 0
    while (bi < bx * by) {
      bw.put(qblocks(bi)(0) & 1, 1)
      bi += 1
    }
    bw.flush()

    // scan 5: AC refinement 1-63 (Ah=1, Al=0). Bits must appear in the
    // exact span order the decoder's G.1.2.3 walk consumes them: each
    // ZRL covers positions up to and including its 16th zero-HISTORY
    // coefficient, with correction bits for nonzero-history positions
    // interleaved positionally inside that span; a run-size code's
    // sign bit precedes its span's correction bits.
    sosHeader(1, 63, 1, 0)
    bw = new BitWriter(out)
    bi = 0
    while (bi < bx * by) {
      val q = qblocks(bi)
      // per-position event over the band: 0 zero-history zero,
      // 1/2 correction bit 0/1, 3/4 newly nonzero +1/−1
      val ev = Array.tabulate(63) { j =>
        val k = j + 1
        val prev = if (q(k) >= 0) q(k) >> 1 else -((-q(k)) >> 1)
        if (prev != 0) 1 + (math.abs(q(k)) & 1)
        else if (q(k) > 0) 3
        else if (q(k) < 0) 4
        else 0
      }
      var i2 = 0
      var done = false
      while (!done) {
        var j = i2
        while (j < 63 && ev(j) < 3) j += 1
        if (j == 63) {
          // no further newly-nonzero coef: EOB unless nothing remains
          if (i2 < 63) {
            val (c, l) = AcEnc(0x00); bw.put(c, l)
            while (i2 < 63) {
              if (ev(i2) == 1 || ev(i2) == 2) bw.put(ev(i2) - 1, 1)
              i2 += 1
            }
          }
          done = true
        } else {
          var z = 0
          var t = i2
          while (t < j) { if (ev(t) == 0) z += 1; t += 1 }
          while (z > 15) {
            val (zc, zl) = AcEnc(0xf0); bw.put(zc, zl)
            var zc2 = 0
            while (zc2 < 16) {
              if (ev(i2) == 0) zc2 += 1
              else bw.put(ev(i2) - 1, 1)
              i2 += 1
            }
            z -= 16
          }
          val (c, l) = AcEnc((z << 4) | 1)
          bw.put(c, l)
          bw.put(if (ev(j) == 3) 1 else 0, 1)
          while (i2 < j) {
            if (ev(i2) == 1 || ev(i2) == 2) bw.put(ev(i2) - 1, 1)
            i2 += 1
          }
          i2 = j + 1
        }
      }
      bi += 1
    }
    bw.flush()
    marker(0xd9)
    out.toByteArray
  }

}
