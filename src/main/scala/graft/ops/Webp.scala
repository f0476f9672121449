package graft.ops

import scala.collection.mutable.ArrayBuffer

/** WebP lossless (VP8L) — a pure-JVM decoder for the one common crawl
  * image format that was still on the stub path (r13 verdict item 8).
  * Written against the public "WebP Lossless Bitstream Specification"
  * (Google, also draft-zern-webp): RIFF container walk, LSB-first
  * bitstream, canonical prefix codes in both the simple (1-2 symbol)
  * and code-length-coded forms (incl. the 16/17/18 repeat symbols),
  * color cache, LZ77 backward references with the 120-entry distance
  * neighborhood map, meta prefix-code groups (entropy image), and all
  * four transforms (predictor / color / subtract-green /
  * color-indexing incl. sub-byte pixel bundling), inverted in reverse
  * read order.
  *
  * Honesty note on validation: unlike the PNG/BMP decoders there is
  * no in-JVM reference implementation to cross-check against (ImageIO
  * has no WebP plugin), so correctness rests on (a) spec-pinned unit
  * vectors (canonical code construction, the distance map's published
  * prefix, prefix-code value ranges, cache hashing) and (b) encoder/
  * decoder round-trips where [[encodeWebpLossless]] — written as the
  * forward form of the same spec text — exercises every decode path.
  * A shared misreading of the spec would survive (b); the vectors in
  * (a) pin the parts most likely to be misread.
  *
  * Lossy WebP ("VP8 " chunks) is OUT of the pure-JVM codec set (a
  * full DCT predictor/loop-filter decoder); its frame header is
  * parsed for honest metadata (dims) and the payload stays on the
  * disclosed fingerprint path, now visibly counted by the decode
  * ledger. */
object Webp {

  private final class Malformed extends Exception("malformed vp8l")
  private def bad(): Nothing = throw new Malformed

  // ------------------------------------------------------------ bits

  /** LSB-first bit reader over the VP8L payload. */
  private final class BitReader(b: Array[Byte]) {
    private var pos = 0
    def bit(): Int = {
      val i = pos
      if ((i >> 3) >= b.length) bad()
      pos += 1
      (b(i >> 3) >> (i & 7)) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var k = 0
      while (k < n) { v |= bit() << k; k += 1 }
      v
    }
  }

  /** LSB-first bit writer (fixture encoder side). */
  private final class BitWriter {
    private val out = ArrayBuffer.empty[Byte]
    private var cur = 0
    private var n = 0
    def writeBits(v: Int, nb: Int): Unit = {
      var k = 0
      while (k < nb) {
        cur |= ((v >> k) & 1) << n
        n += 1
        if (n == 8) { out += cur.toByte; cur = 0; n = 0 }
        k += 1
      }
    }
    /** Prefix-code bits are consumed MSB-first by the canonical
      * decoder (DEFLATE convention), so they are written that way. */
    def writeCode(code: Int, len: Int): Unit = {
      var k = len - 1
      while (k >= 0) { writeBits((code >> k) & 1, 1); k -= 1 }
    }
    def toBytes: Array[Byte] = {
      val t = out.clone()
      if (n > 0) t += cur.toByte
      t.toArray
    }
  }

  // --------------------------------------------------- canonical code

  /** Canonical prefix code (RFC 1951 construction, as VP8L mandates):
    * symbols ordered by (length, index); a single-symbol code reads
    * zero bits. Complete-code (Kraft) check on construction — an
    * over- or under-subscribed code is a malformed stream. */
  private final class Huff(val single: Int, counts: Array[Int],
      syms: Array[Int]) {
    def next(br: BitReader): Int = {
      if (single >= 0) return single
      var code = 0; var first = 0; var index = 0; var len = 1
      while (len <= 15) {
        code = (code << 1) | br.bit()
        val c = counts(len)
        if (code - first < c) return syms(index + code - first)
        index += c
        first = (first + c) << 1
        len += 1
      }
      bad()
    }
  }

  private def huff(lengths: Array[Int]): Huff = {
    var nz = 0; var lastSym = -1
    var i = 0
    while (i < lengths.length) {
      if (lengths(i) > 0) { nz += 1; lastSym = i }
      if (lengths(i) > 15) bad()
      i += 1
    }
    if (nz == 0) bad()
    if (nz == 1) return new Huff(lastSym, null, null)
    val counts = new Array[Int](16)
    lengths.foreach(l => if (l > 0) counts(l) += 1)
    var kraft = 0L
    var l = 1
    while (l <= 15) { kraft += counts(l).toLong << (15 - l); l += 1 }
    if (kraft != (1L << 15)) bad()
    val syms = new Array[Int](nz)
    val offs = new Array[Int](16)
    var acc = 0
    l = 1
    while (l <= 15) { offs(l) = acc; acc += counts(l); l += 1 }
    i = 0
    while (i < lengths.length) {
      val len = lengths(i)
      if (len > 0) { syms(offs(len)) = i; offs(len) += 1 }
      i += 1
    }
    new Huff(-1, counts, syms)
  }

  /** Canonical code VALUES from lengths (encoder side; RFC 1951). */
  private def canonicalCodes(lengths: Array[Int]): Array[Int] = {
    val counts = new Array[Int](16)
    lengths.foreach(l => if (l > 0) counts(l) += 1)
    val next = new Array[Int](16)
    var code = 0
    var l = 1
    while (l <= 15) { code = (code + counts(l - 1)) << 1; next(l) = code; l += 1 }
    lengths.map { len =>
      if (len == 0) 0
      else { val c = next(len); next(len) += 1; c }
    }
  }

  /** Spec order in which the code-length code's own lengths appear. */
  private[ops] val ClOrder: Array[Int] =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** One prefix code from the stream: simple (1-2 symbols) or
    * code-length-coded normal form. */
  private def readCode(br: BitReader, alphabetSize: Int): Huff = {
    if (br.bit() == 1) { // simple
      val numSym = br.bit() + 1
      val lengths = new Array[Int](alphabetSize)
      val sym0 = if (br.bit() == 1) br.bits(8) else br.bits(1)
      if (sym0 >= alphabetSize) bad()
      if (numSym == 1) lengths(sym0) = 1 // single-symbol sentinel path
      else {
        val sym1 = br.bits(8)
        if (sym1 >= alphabetSize || sym1 == sym0) bad()
        lengths(sym0) = 1; lengths(sym1) = 1
      }
      if (numSym == 1) new Huff(sym0, null, null) else huff(lengths)
    } else {
      val numCl = 4 + br.bits(4)
      val clLengths = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLengths(ClOrder(i)) = br.bits(3); i += 1 }
      val clCode = huff(clLengths)
      val lengths = new Array[Int](alphabetSize)
      var maxSymbol =
        if (br.bit() == 1) {
          val lenNBits = 2 + 2 * br.bits(3)
          2 + br.bits(lenNBits)
        } else alphabetSize
      var symbol = 0
      var prev = 8
      while (symbol < alphabetSize && maxSymbol > 0) {
        maxSymbol -= 1
        val s = clCode.next(br)
        if (s < 16) {
          lengths(symbol) = s; symbol += 1
          if (s != 0) prev = s
        } else {
          val (repeat, value) = s match {
            case 16 => (3 + br.bits(2), prev)
            case 17 => (3 + br.bits(3), 0)
            case 18 => (11 + br.bits(7), 0)
            case _  => bad()
          }
          if (symbol + repeat > alphabetSize) bad()
          var r = 0
          while (r < repeat) { lengths(symbol) = value; symbol += 1; r += 1 }
        }
      }
      huff(lengths)
    }
  }

  // ----------------------------------------------------------- LZ77

  /** Prefix symbol → value (lengths and distance plane codes share
    * this): symbols 0-3 are literal 1-4; above that, (2+(s&1))«extra
    * + extra_bits + 1. */
  private def lz77Value(prefix: Int, br: BitReader): Int =
    if (prefix < 4) prefix + 1
    else {
      val extra = (prefix - 2) >> 1
      val offset = (2 + (prefix & 1)) << extra
      offset + br.bits(extra) + 1
    }

  /** Encoder inverse of [[lz77Value]]: (prefix, extraBits, extraVal). */
  private def lz77Prefix(v: Int): (Int, Int, Int) = {
    if (v <= 4) (v - 1, 0, 0)
    else {
      var prefix = 4
      while ({
        val extra = (prefix - 2) >> 1
        val offset = (2 + (prefix & 1)) << extra
        v > offset + (1 << extra)
      }) prefix += 1
      val extra = (prefix - 2) >> 1
      val offset = (2 + (prefix & 1)) << extra
      (prefix, extra, v - offset - 1)
    }
  }

  /** The 120 short-distance plane codes: all (dx, dy) neighborhood
    * offsets with dy in 0..7 (dx 1..8 when dy = 0, else −8..8),
    * ordered by (dx²+dy², |dx|, sign) and truncated to 120 — the
    * generation rule reproduces the spec's published table verbatim
    * (its prefix is spec-pinned in WebpSpec). */
  private[ops] lazy val DistMap: Array[(Int, Int)] = {
    val cand = for {
      dy <- 0 to 7
      dx <- -8 to 8
      if dy > 0 || dx > 0
    } yield (dx, dy)
    cand.sortBy { case (dx, dy) =>
      (dx * dx + dy * dy, math.abs(dx), if (dx < 0) 1 else 0)
    }.take(120).toArray
  }

  private def planeToDist(plane: Int, xsize: Int): Int =
    if (plane > 120) plane - 120
    else {
      val (dx, dy) = DistMap(plane - 1)
      val d = dy * xsize + dx
      if (d < 1) 1 else d
    }

  // ------------------------------------------------------ transforms

  private def sub(size: Int, bits: Int): Int =
    (size + (1 << bits) - 1) >> bits

  private final case class Transform(kind: Int, bits: Int,
      data: Array[Int], xsizeAtRead: Int, xbits: Int)

  private def avg2(a: Int, b: Int): Int = {
    // per-channel (a+b)/2 without cross-lane carry
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)
  }

  private def addPixels(a: Int, b: Int): Int = {
    // per-channel (a+b) mod 256
    val lo = ((a & 0x00ff00ff) + (b & 0x00ff00ff)) & 0x00ff00ff
    val hi = ((a & 0xff00ff00) + (b & 0xff00ff00)) & 0xff00ff00
    lo | hi
  }

  private def subPixels(a: Int, b: Int): Int = {
    val lo = ((a | 0x01000100) - (b & 0x00ff00ff)) & 0x00ff00ff
    val hi = (((a >>> 8) | 0x01000100) - ((b >>> 8) & 0x00ff00ff)) & 0x00ff00ff
    lo | (hi << 8)
  }

  private def clip255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def clampAddSubtractFull(a: Int, b: Int, c: Int): Int = {
    var out = 0
    var sh = 0
    while (sh < 32) {
      val v = ((a >>> sh) & 0xff) + ((b >>> sh) & 0xff) - ((c >>> sh) & 0xff)
      out |= clip255(v) << sh
      sh += 8
    }
    out
  }

  private def clampAddSubtractHalf(p: Int, c: Int): Int = {
    var out = 0
    var sh = 0
    while (sh < 32) {
      val m = (p >>> sh) & 0xff
      val v = m + (m - ((c >>> sh) & 0xff)) / 2
      out |= clip255(v) << sh
      sh += 8
    }
    out
  }

  private def select(top: Int, left: Int, topLeft: Int): Int = {
    // choose the neighbor closer to the gradient p = L + T − TL:
    // Σ|p−T| ≤ Σ|p−L| → top, else left (p−T = L−TL, p−L = T−TL)
    var paMinusPb = 0
    var sh = 0
    while (sh < 32) {
      val t = (top >>> sh) & 0xff
      val l = (left >>> sh) & 0xff
      val tl = (topLeft >>> sh) & 0xff
      paMinusPb += math.abs(l - tl) - math.abs(t - tl)
      sh += 8
    }
    if (paMinusPb <= 0) top else left
  }

  /** Predictor `mode` for the pixel at (x, y) given the decoded
    * buffer. Callers guarantee x>0, y>0 for modes that need
    * neighbors; the rightmost column's top-right wraps to the first
    * pixel of the CURRENT row (the contiguous-buffer convention the
    * format is defined against). */
  private def predict(mode: Int, px: Array[Int], w: Int, x: Int,
      y: Int): Int = {
    val i = y * w + x
    def l = px(i - 1)
    def t = px(i - w)
    def tl = px(i - w - 1)
    def tr = if (x + 1 < w) px(i - w + 1) else px(y * w)
    mode match {
      case 0  => 0xff000000
      case 1  => l
      case 2  => t
      case 3  => tr
      case 4  => tl
      case 5  => avg2(avg2(l, tr), t)
      case 6  => avg2(l, tl)
      case 7  => avg2(l, t)
      case 8  => avg2(tl, t)
      case 9  => avg2(t, tr)
      case 10 => avg2(avg2(l, tl), avg2(t, tr))
      case 11 => select(t, l, tl)
      case 12 => clampAddSubtractFull(l, t, tl)
      case 13 => clampAddSubtractHalf(avg2(l, t), tl)
      case _  => bad()
    }
  }

  /** In-place predictor inverse: raster order, residual + prediction
    * per channel mod 256. (0,0) predicts black; row 0 forces L;
    * column 0 forces T. */
  private def applyPredictorInverse(px: Array[Int], w: Int, h: Int,
      bits: Int, timg: Array[Int]): Unit = {
    val tw = sub(w, bits)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val mode =
          if (x == 0 && y == 0) 0
          else if (y == 0) 1
          else if (x == 0) 2
          else (timg((y >> bits) * tw + (x >> bits)) >>> 8) & 0xff
        val i = y * w + x
        px(i) = addPixels(px(i), predict(mode, px, w, x, y))
        x += 1
      }
      y += 1
    }
  }

  private def cDelta(t: Int, c: Int): Int = ((t.toByte * c.toByte) >> 5)

  /** Color-transform inverse: red += δ(g2r, green); blue += δ(g2b,
    * green) + δ(r2b, red′). Element packing per spec: g2r in BLUE,
    * g2b in GREEN, r2b in RED of the transform image pixel. */
  private def applyColorInverse(px: Array[Int], w: Int, h: Int,
      bits: Int, timg: Array[Int]): Unit = {
    val tw = sub(w, bits)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val cte = timg((y >> bits) * tw + (x >> bits))
        val g2r = cte & 0xff
        val g2b = (cte >>> 8) & 0xff
        val r2b = (cte >>> 16) & 0xff
        val i = y * w + x
        val v = px(i)
        val green = (v >>> 8) & 0xff
        val red = ((v >>> 16) & 0xff) + cDelta(g2r, green)
        val blue0 = (v & 0xff) + cDelta(g2b, green)
        val blue = (blue0 + cDelta(r2b, red & 0xff)) & 0xff
        px(i) = (v & 0xff00ff00) | ((red & 0xff) << 16) | blue
        x += 1
      }
      y += 1
    }
  }

  private def applySubtractGreenInverse(px: Array[Int]): Unit = {
    var i = 0
    while (i < px.length) {
      val v = px(i)
      val g = (v >>> 8) & 0xff
      val r = (((v >>> 16) & 0xff) + g) & 0xff
      val b = ((v & 0xff) + g) & 0xff
      px(i) = (v & 0xff00ff00) | (r << 16) | b
      i += 1
    }
  }

  /** Palette inverse incl. sub-byte bundling: packed green bytes hold
    * (8 >> xbits)-bit indices for 2^xbits consecutive x pixels. */
  private def applyPaletteInverse(packed: Array[Int], w: Int, h: Int,
      palette: Array[Int], xbits: Int): Array[Int] = {
    val pw = sub(w, xbits)
    val out = new Array[Int](w * h)
    val bpp = 8 >> xbits
    val mask = (1 << bpp) - 1
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = (packed(y * pw + (x >> xbits)) >>> 8) & 0xff
        val idx = (g >> ((x & ((1 << xbits) - 1)) * bpp)) & mask
        if (idx >= palette.length) bad()
        out(y * w + x) = palette(idx)
        x += 1
      }
      y += 1
    }
    out
  }

  // ---------------------------------------------------------- decode

  private def cacheHash(argb: Int, bits: Int): Int =
    (0x1e35a7bd * argb) >>> (32 - bits)

  /** One spatially-coded + optionally transformed image from the
    * stream — the recursive core of the format (entropy / transform /
    * palette sub-images are level0=false). */
  private def readImage(br: BitReader, xsize0: Int, ysize: Int,
      level0: Boolean): Array[Int] = {
    var xsize = xsize0
    val transforms = ArrayBuffer.empty[Transform]
    if (level0) {
      val seen = scala.collection.mutable.Set.empty[Int]
      while (br.bit() == 1) {
        val t = br.bits(2)
        if (seen(t)) bad()
        seen += t
        t match {
          case 0 | 1 =>
            val bits = br.bits(3) + 2
            val timg = readImage(br, sub(xsize, bits), sub(ysize, bits),
              level0 = false)
            transforms += Transform(t, bits, timg, xsize, 0)
          case 2 =>
            transforms += Transform(2, 0, null, xsize, 0)
          case 3 =>
            val n = br.bits(8) + 1
            val raw = readImage(br, n, 1, level0 = false)
            // palette entries are component-delta coded
            val pal = new Array[Int](n)
            var i = 0
            var prev = 0
            while (i < n) {
              prev = addPixels(prev, raw(i)); pal(i) = prev; i += 1
            }
            val xbits =
              if (n <= 2) 3 else if (n <= 4) 2 else if (n <= 16) 1 else 0
            transforms += Transform(3, 0, pal, xsize, xbits)
            xsize = sub(xsize, xbits)
        }
      }
    }
    val cacheBits = if (br.bit() == 1) {
      val cb = br.bits(4)
      if (cb < 1 || cb > 11) bad()
      cb
    } else 0
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheBits > 0) new Array[Int](cacheSize) else null

    // meta prefix groups (level0 only)
    var hbits = 0
    var himg: Array[Int] = null
    var numGroups = 1
    if (level0 && br.bit() == 1) {
      hbits = br.bits(3) + 2
      himg = readImage(br, sub(xsize, hbits), sub(ysize, hbits),
        level0 = false)
      var m = 0
      himg.foreach(p => m = math.max(m, (p >>> 8) & 0xffff))
      numGroups = m + 1
    }
    val greenAlphabet = 256 + 24 + cacheSize
    val groups = Array.fill(numGroups) {
      Array(readCode(br, greenAlphabet), readCode(br, 256),
        readCode(br, 256), readCode(br, 256), readCode(br, 40))
    }
    def groupAt(x: Int, y: Int): Array[Huff] =
      if (himg == null) groups(0)
      else {
        val hw = sub(xsize, hbits)
        val meta = (himg((y >> hbits) * hw + (x >> hbits)) >>> 8) & 0xffff
        if (meta >= numGroups) bad()
        groups(meta)
      }

    val n = xsize * ysize
    val px = new Array[Int](n)
    var idx = 0
    var x = 0
    var y = 0
    def emit(argb: Int): Unit = {
      px(idx) = argb
      if (cache != null) cache(cacheHash(argb, cacheBits)) = argb
      idx += 1
      x += 1
      if (x == xsize) { x = 0; y += 1 }
    }
    while (idx < n) {
      val g = groupAt(x, y)
      val s = g(0).next(br)
      if (s < 256) {
        val red = g(1).next(br)
        val blue = g(2).next(br)
        val alpha = g(3).next(br)
        emit((alpha << 24) | (red << 16) | (s << 8) | blue)
      } else if (s < 280) {
        val length = lz77Value(s - 256, br)
        val plane = lz77Value(g(4).next(br), br)
        val dist = planeToDist(plane, xsize)
        if (dist > idx || idx + length > n) bad()
        var k = 0
        while (k < length) { emit(px(idx - dist)); k += 1 }
      } else {
        if (cache == null || s - 280 >= cacheSize) bad()
        emit(cache(s - 280))
      }
    }

    // inverse transforms, reverse read order
    var out = px
    var w = xsize
    transforms.reverseIterator.foreach { tr =>
      tr.kind match {
        case 0 => applyPredictorInverse(out, w, ysize, tr.bits, tr.data)
        case 1 => applyColorInverse(out, w, ysize, tr.bits, tr.data)
        case 2 => applySubtractGreenInverse(out)
        case 3 =>
          out = applyPaletteInverse(out, tr.xsizeAtRead, ysize, tr.data,
            tr.xbits)
          w = tr.xsizeAtRead
      }
    }
    out
  }

  /** Decode a raw VP8L payload (the bytes of the VP8L chunk) to
    * (width, height, ARGB pixels). None = malformed (quarantine
    * contract, not an exception) OR over the 64M-pixel decode bound —
    * a deliberate DoS guard, not a spec limit (legal VP8L dims reach
    * 16383×16383 = 268M px): one such image is a 1 GiB+ int buffer
    * per task. Callers that must distinguish the two check the header
    * dims against the bound first ([[graft.ops.Codecs.grayOutcome]]
    * classifies over-bound images as the disclosed `fallback`, never
    * `quarantined`). */
  def decodeVp8l(b: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try {
      if (b.length < 5 || (b(0) & 0xff) != 0x2f) return None
      val br = new BitReader(java.util.Arrays.copyOfRange(b, 1, b.length))
      val w = br.bits(14) + 1
      val h = br.bits(14) + 1
      br.bit() // alpha hint
      if (br.bits(3) != 0) return None // version
      if (w.toLong * h > 64L * 1024 * 1024) return None
      Some((w, h, readImage(br, w, h, level0 = true)))
    } catch {
      case _: Malformed | _: ArrayIndexOutOfBoundsException |
          _: NegativeArraySizeException => None
    }

  // ------------------------------------------------------- container

  /** Walk a RIFF/WEBP container to the named chunk's payload. All
    * offset arithmetic in Long: a crafted chunk size near 2^31 would
    * otherwise overflow the bound check and escape the quarantine
    * contract as an uncaught copyOfRange/String exception crashing
    * the task (r14 self-review finding). */
  private def chunk(b: Array[Byte], tag: String): Option[Array[Byte]] = {
    if (b.length < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
        b(3) != 'F' || b(8) != 'W' || b(9) != 'E' || b(10) != 'B' ||
        b(11) != 'P') return None
    var off = 12L
    while (off + 8 <= b.length) {
      val o = off.toInt
      val t = new String(b, o, 4, "ISO-8859-1")
      val size = ((b(o + 4) & 0xff) | ((b(o + 5) & 0xff) << 8) |
        ((b(o + 6) & 0xff) << 16) | ((b(o + 7) & 0xff) << 24)) & 0xFFFFFFFFL
      if (off + 8 + size > b.length) return None
      if (t == tag)
        return Some(java.util.Arrays.copyOfRange(b, o + 8, o + 8 + size.toInt))
      off += 8 + size + (size & 1)
    }
    None
  }

  /** Container-level header: ("webp-l", w, h, 4) for lossless
    * (fully decodable here), ("webp", w, h, 3|4) for lossy VP8 (4
    * when a lossy-alpha ALPH chunk rides alongside in a VP8X still
    * container) with honest frame-header dims, and ("webp-anim", canvasW, canvasH,
    * 3|4) for an extended (VP8X) ANIMATION container — frame count
    * via [[animFrameCount]], frame pixels out of scope like lossy. A
    * VP8X STILL container falls through to its top-level VP8L/VP8
    * image chunk (the walk is linear over all chunks), keeping the
    * exact still dims. */
  def decodeWebpHeader(b: Array[Byte]): Option[(String, Int, Int, Int)] =
    chunk(b, "VP8L") match {
      case Some(p) if p.length >= 5 && (p(0) & 0xff) == 0x2f =>
        val v = (p(1) & 0xff) | ((p(2) & 0xff) << 8) |
          ((p(3) & 0xff) << 16) | ((p(4) & 0xff) << 24)
        val w = (v & 0x3fff) + 1
        val h = ((v >> 14) & 0x3fff) + 1
        if (((v >> 29) & 0x7) != 0) None else Some(("webp-l", w, h, 4))
      case _ =>
        chunk(b, "VP8 ").flatMap { p =>
          // simple lossy frame header: 3-byte frame tag, start code
          // 9d 01 2a, then 14-bit width / height
          if (p.length >= 10 && (p(3) & 0xff) == 0x9d &&
              (p(4) & 0xff) == 0x01 && (p(5) & 0xff) == 0x2a) {
            val w = ((p(6) & 0xff) | ((p(7) & 0xff) << 8)) & 0x3fff
            val h = ((p(8) & 0xff) | ((p(9) & 0xff) << 8)) & 0x3fff
            // a VP8X still container carries lossy alpha as a separate
            // ALPH chunk (the VP8 stream itself is always 3-channel):
            // honor it in the channel count like the animation path
            // honors the VP8X alpha flag
            val ch = if (chunk(b, "ALPH").isDefined) 4 else 3
            if (w > 0 && h > 0) Some(("webp", w, h, ch)) else None
          } else None
        }.orElse(chunk(b, "VP8X").flatMap { p =>
          // extended header: 1B flags (bit1 animation, bit4 alpha in
          // the spec's MSB-first drawing = 0x02 / 0x10 as stored),
          // 3B reserved, 24-bit LE canvas width-1 / height-1
          if (p.length >= 10) {
            val flags = p(0) & 0xff
            val w = ((p(4) & 0xff) | ((p(5) & 0xff) << 8) |
              ((p(6) & 0xff) << 16)) + 1
            val h = ((p(7) & 0xff) | ((p(8) & 0xff) << 8) |
              ((p(9) & 0xff) << 16)) + 1
            val ch = if ((flags & 0x10) != 0) 4 else 3
            if ((flags & 0x02) != 0) Some(("webp-anim", w, h, ch))
            else None // still VP8X without an image chunk we know
          } else None
        })
    }

  /** One decoded animation frame: its canvas offset/duration from the
    * ANMF header and the decoded LUMA of the frame's own subrect.
    * Frames are decoded STANDALONE (each ANMF carries a complete
    * VP8/VP8L image of its subrect) — no canvas compositing: the
    * blend/dispose state machine is a presentation concern, while the
    * training-data pipeline wants per-frame pixels, the same contract
    * as [[Codecs.y4mFrameLuma]] and the GIF path. */
  final case class AnimFrame(index: Int, x: Int, y: Int, w: Int, h: Int,
      durationMs: Int, luma: Array[Byte])

  /** Decode every `stride`-th ANMF frame's luma from an animated WebP
    * container — VP8 sub-frames via [[Vp8.decodeVp8]] (Y plane), VP8L
    * sub-frames via [[decodeVp8l]] (BT.601 integer luma), both now in
    * the pure-JVM set. Malformed sub-frames are skipped (quarantine
    * granularity is per frame, matching the per-record WARC
    * contract); a container with no decodable sampled frame yields an
    * empty list. */
  def animFrameLumas(b: Array[Byte], stride: Int): Seq[AnimFrame] = {
    if (stride < 1 || b.length < 12 || b(0) != 'R' || b(8) != 'W')
      return Nil
    val out = ArrayBuffer.empty[AnimFrame]
    var off = 12L
    var idx = 0
    while (off + 8 <= b.length) {
      val o = off.toInt
      val t = new String(b, o, 4, "ISO-8859-1")
      val size = ((b(o + 4) & 0xff) | ((b(o + 5) & 0xff) << 8) |
        ((b(o + 6) & 0xff) << 16) | ((b(o + 7) & 0xff) << 24)) & 0xFFFFFFFFL
      if (off + 8 + size > b.length) return out.toSeq
      if (t == "ANMF" && size >= 16) {
        if (idx % stride == 0) {
          val p = o + 8
          def u24(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
            ((b(i + 2) & 0xff) << 16)
          val fx = u24(p) * 2
          val fy = u24(p + 3) * 2
          val fw = u24(p + 6) + 1
          val fh = u24(p + 9) + 1
          val dur = u24(p + 12)
          // frame image data: chunks (optional ALPH, then VP8/VP8L)
          // inside the ANMF payload after the 16-byte header
          var so = p + 16L
          val end = p + size
          var done = false
          while (!done && so + 8 <= end) {
            val si = so.toInt
            val st = new String(b, si, 4, "ISO-8859-1")
            val ss = ((b(si + 4) & 0xff) | ((b(si + 5) & 0xff) << 8) |
              ((b(si + 6) & 0xff) << 16) |
              ((b(si + 7) & 0xff) << 24)) & 0xFFFFFFFFL
            if (so + 8 + ss > end) done = true
            else {
              val payload = java.util.Arrays.copyOfRange(b, si + 8,
                si + 8 + ss.toInt)
              st match {
                case "VP8 " =>
                  Vp8.decodeVp8(payload).foreach { pl =>
                    out += AnimFrame(idx, fx, fy, pl.w, pl.h, dur, pl.y)
                  }
                  done = true
                case "VP8L" =>
                  decodeVp8l(payload).foreach { case (w, h, px) =>
                    val g = new Array[Byte](w * h)
                    var i = 0
                    while (i < g.length) {
                      val v = px(i)
                      g(i) = ((299 * ((v >>> 16) & 0xff) +
                        587 * ((v >>> 8) & 0xff) +
                        114 * (v & 0xff)) / 1000).toByte
                      i += 1
                    }
                    out += AnimFrame(idx, fx, fy, w, h, dur, g)
                  }
                  done = true
                case _ => so += 8 + ss + (ss & 1) // ALPH etc.: skip
              }
            }
          }
        }
        idx += 1
      }
      off += 8 + size + (size & 1)
    }
    out.toSeq
  }

  /** COMPOSITED animated-WebP decode: every `stride`-th PRESENTED
    * canvas as (frameIdx, canvasW, canvasH, luma) — the opt-in
    * alternative to [[animFrameLumas]]' per-frame-pixels contract,
    * applying the ANMF disposal/blend state machine ([[Anim]]): the
    * canvas initializes to the ANIM chunk's background color (BT.601
    * luma of its RGB; the BGRA alpha byte is ignored — luma canvases
    * have no transparency), each frame alpha-blends (B=0) or
    * overwrites (B=1) its subrect, and D=1 restores the rect to
    * background after presentation. VP8 sub-frames are opaque
    * (ANMF-side ALPH chunks stay undecoded, same bound as the still
    * path); VP8L alpha comes per-pixel from the ARGB plane. A
    * sub-frame whose body fails to decode presents an UNCHANGED
    * canvas at its index (per-frame quarantine, same contract as
    * [[animFrameLumas]]); frame numbering counts all ANMF chunks. */
  def animCompositedLumas(b: Array[Byte],
      stride: Int): Seq[(Int, Int, Int, Array[Byte])] =
    animCompositeCore(b, stride, Int.MaxValue)

  /** POSTER frame for the gray pipeline: the canvas after the FIRST
    * decodable ANMF frame is composited onto the background — the
    * single-image representative a thumbnail pipeline wants, at
    * honest canvas dimensions. None when no frame body decodes
    * (malformed container, not a capability bound). */
  def animPosterLuma(b: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    // maxEmit = 1 stops the walk after the first DECODABLE frame, so
    // the last emitted canvas is the poster (earlier indices are
    // quarantined placeholders presenting the bare background)
    animCompositeCore(b, 1, 1).lastOption.map { case (_, w, h, g) => (w, h, g) }

  /** Shared core: walk EVERY ANMF chunk (the disposal state machine
    * needs all frames, unlike the per-frame path's lazy stride), stop
    * after `maxEmit` DECODABLE frames have been composited. */
  private def animCompositeCore(b: Array[Byte], stride: Int,
      maxEmit: Int): Seq[(Int, Int, Int, Array[Byte])] = {
    if (stride < 1 || b.length < 12 || b(0) != 'R' || b(8) != 'W') return Nil
    val (cw, chh, bgLuma) = chunk(b, "VP8X") match {
      case Some(p) if p.length >= 10 =>
        val w = ((p(4) & 0xff) | ((p(5) & 0xff) << 8) |
          ((p(6) & 0xff) << 16)) + 1
        val h = ((p(7) & 0xff) | ((p(8) & 0xff) << 8) |
          ((p(9) & 0xff) << 16)) + 1
        val bg = chunk(b, "ANIM") match {
          case Some(a) if a.length >= 4 => // BGRA byte order per spec
            (299 * (a(2) & 0xff) + 587 * (a(1) & 0xff) +
              114 * (a(0) & 0xff)) / 1000
          case _ => 0
        }
        (w, h, bg)
      case _ => return Nil
    }
    if (cw.toLong * chh > Vp8.MaxPixels) return Nil
    val frames = ArrayBuffer.empty[Anim.Frame]
    var decodable = 0
    var off = 12L
    while (off + 8 <= b.length && decodable < maxEmit) {
      val o = off.toInt
      val t = new String(b, o, 4, "ISO-8859-1")
      val size = ((b(o + 4) & 0xff) | ((b(o + 5) & 0xff) << 8) |
        ((b(o + 6) & 0xff) << 16) | ((b(o + 7) & 0xff) << 24)) & 0xFFFFFFFFL
      if (off + 8 + size > b.length)
        return compositeOut(cw, chh, bgLuma, frames, stride, decodable)
      if (t == "ANMF" && size >= 16) {
        val p = o + 8
        def u24(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
          ((b(i + 2) & 0xff) << 16)
        val fx = u24(p) * 2; val fy = u24(p + 3) * 2
        val dur = u24(p + 12)
        val flags = b(p + 15) & 0xff // bit0 = D (dispose to bg), bit1 = B (no blend)
        var so = p + 16L
        val end = p + size
        var frame: Option[Anim.Frame] = None
        var done = false
        while (!done && so + 8 <= end) {
          val si = so.toInt
          val st = new String(b, si, 4, "ISO-8859-1")
          val ss = ((b(si + 4) & 0xff) | ((b(si + 5) & 0xff) << 8) |
            ((b(si + 6) & 0xff) << 16) |
            ((b(si + 7) & 0xff) << 24)) & 0xFFFFFFFFL
          if (so + 8 + ss > end) done = true
          else {
            val payload = java.util.Arrays.copyOfRange(b, si + 8,
              si + 8 + ss.toInt)
            st match {
              case "VP8 " =>
                frame = Vp8.decodeVp8(payload).map(pl =>
                  Anim.Frame(fx, fy, pl.w, pl.h, pl.y, null,
                    (flags & 2) != 0, flags & 1, dur))
                done = true
              case "VP8L" =>
                frame = decodeVp8l(payload).map { case (w, h, px) =>
                  val g = new Array[Byte](w * h)
                  val a = new Array[Byte](w * h)
                  var opaque = true
                  var i = 0
                  while (i < g.length) {
                    val v = px(i)
                    g(i) = ((299 * ((v >>> 16) & 0xff) +
                      587 * ((v >>> 8) & 0xff) +
                      114 * (v & 0xff)) / 1000).toByte
                    val av = (v >>> 24) & 0xff
                    a(i) = av.toByte
                    if (av != 255) opaque = false
                    i += 1
                  }
                  Anim.Frame(fx, fy, w, h, g, if (opaque) null else a,
                    (flags & 2) != 0, flags & 1, dur)
                }
                done = true
              case _ => so += 8 + ss + (ss & 1) // ALPH etc.: skip
            }
          }
        }
        frame match {
          case Some(f) => frames += f; decodable += 1
          case None    => // quarantined sub-frame: unchanged canvas
            frames += Anim.Frame(0, 0, 0, 0, Array.emptyByteArray, null,
              noBlend = false, dispose = 0, durationMs = dur)
        }
      }
      off += 8 + size + (size & 1)
    }
    compositeOut(cw, chh, bgLuma, frames, stride, decodable)
  }

  /** A container with ZERO decodable sub-frames yields Nil (the
    * malformed verdict), not a parade of bare-background canvases. */
  private def compositeOut(cw: Int, ch: Int, bg: Int,
      frames: ArrayBuffer[Anim.Frame], stride: Int,
      decodable: Int): Seq[(Int, Int, Int, Array[Byte])] =
    if (decodable == 0) Nil
    else Anim.composite(cw, ch, bg, frames.toSeq, stride)
      .map { case (i, g) => (i, cw, ch, g) }

  /** Fixture: an animated (VP8X/ANIM/ANMF) container whose frames are
    * caller-supplied raw VP8/VP8L payloads with per-frame subrect
    * offsets, durations, and B/D flag bits. */
  private[ops] def wrapAnim(canvasW: Int, canvasH: Int,
      frames: Seq[(String, Array[Byte], Int, Int, Int)]): Array[Byte] =
    wrapAnimFlagged(canvasW, canvasH,
      frames.map { case (t, p, x, y, d) => (t, p, x, y, d, 0) })

  private[ops] def wrapAnimFlagged(canvasW: Int, canvasH: Int,
      frames: Seq[(String, Array[Byte], Int, Int, Int, Int)]): Array[Byte] = {
    // (tag, payload, x, y, durationMs, flags); x/y must be even (stored /2)
    val vp8x = new Array[Byte](10)
    vp8x(0) = 0x02 // animation flag
    def le24(a: Array[Byte], o: Int, v: Int): Unit = {
      a(o) = (v & 0xff).toByte; a(o + 1) = ((v >> 8) & 0xff).toByte
      a(o + 2) = ((v >> 16) & 0xff).toByte
    }
    le24(vp8x, 4, canvasW - 1); le24(vp8x, 7, canvasH - 1)
    val anim = Array[Byte](0, 0, 0, 0xff.toByte, 0, 0) // bg RGBA + loops
    val anmfs = frames.map { case (tag, payload, x, y, dur, fl) =>
      val hdr = new Array[Byte](16)
      le24(hdr, 0, x / 2); le24(hdr, 3, y / 2)
      val (w, h) = tag match {
        case _ if payload.length < 10 => (16, 16) // torn-body fixtures
        case "VP8 " =>
          (((payload(6) & 0xff) | ((payload(7) & 0xff) << 8)) & 0x3fff,
            ((payload(8) & 0xff) | ((payload(9) & 0xff) << 8)) & 0x3fff)
        case _ =>
          val v = (payload(1) & 0xff) | ((payload(2) & 0xff) << 8) |
            ((payload(3) & 0xff) << 16) | ((payload(4) & 0xff) << 24)
          ((v & 0x3fff) + 1, ((v >> 14) & 0x3fff) + 1)
      }
      le24(hdr, 6, w - 1); le24(hdr, 9, h - 1); le24(hdr, 12, dur)
      hdr(15) = fl.toByte // bit0 = D (dispose to bg), bit1 = B (no blend)
      val sub = new ArrayBuffer[Byte]()
      tag.foreach(c => sub += c.toByte)
      sub += (payload.length & 0xff).toByte
      sub += ((payload.length >> 8) & 0xff).toByte
      sub += ((payload.length >> 16) & 0xff).toByte
      sub += ((payload.length >> 24) & 0xff).toByte
      sub ++= payload
      if ((payload.length & 1) == 1) sub += 0
      "ANMF" -> (hdr ++ sub.toArray)
    }
    wrapRiffChunks(Seq("VP8X" -> vp8x, "ANIM" -> anim) ++ anmfs)
  }

  /** ANMF frame count of an animated (VP8X) container — the honest
    * n_frames for decode metadata, the same role GIF's descriptor
    * walk plays. None when the container has no ANMF chunks. */
  def animFrameCount(b: Array[Byte]): Option[Int] = {
    if (b.length < 12 || b(0) != 'R' || b(8) != 'W') return None
    var off = 12L
    var n = 0
    while (off + 8 <= b.length) {
      val o = off.toInt
      val t = new String(b, o, 4, "ISO-8859-1")
      val size = ((b(o + 4) & 0xff) | ((b(o + 5) & 0xff) << 8) |
        ((b(o + 6) & 0xff) << 16) | ((b(o + 7) & 0xff) << 24)) & 0xFFFFFFFFL
      if (off + 8 + size > b.length) return None
      if (t == "ANMF") n += 1
      off += 8 + size + (size & 1)
    }
    if (n > 0) Some(n) else None
  }

  /** Full container decode to ARGB (lossless only). */
  def decodeWebp(b: Array[Byte]): Option[(Int, Int, Array[Int])] =
    chunk(b, "VP8L").flatMap(decodeVp8l)

  /** Lossy (VP8 key-frame) container decode to YUV planes — the
    * pure-JVM [[Vp8]] decoder behind the same RIFF walk. The Y plane
    * IS the luma the gray pipeline wants (the same convention as the
    * color-JPEG path, which also surfaces its Y channel). */
  def decodeWebpLossy(b: Array[Byte]): Option[Vp8.Planes] =
    chunk(b, "VP8 ").flatMap(Vp8.decodeVp8)

  // --------------------------------------------------------- encoder

  /** Balanced canonical code lengths over the USED symbols of a
    * histogram: with k symbols and L = ⌈log₂k⌉, the first 2^L − k
    * get length L−1 and the rest L — Kraft-complete by construction
    * (compression quality is irrelevant for fixtures; validity and
    * determinism are what matter). */
  private def balancedLengths(alphabetSize: Int,
      used: Seq[Int]): Array[Int] = {
    val lengths = new Array[Int](alphabetSize)
    val k = used.size
    if (k == 1) { lengths(used.head) = 1; return lengths }
    var bigL = 1
    while ((1 << bigL) < k) bigL += 1
    val short = (1 << bigL) - k
    used.sorted.zipWithIndex.foreach { case (s, i) =>
      lengths(s) = if (i < short) bigL - 1 else bigL
    }
    lengths
  }

  /** Write one prefix code (simple form when possible, else normal
    * form with 16/17/18 run-length coding of the length table — so a
    * round-trip exercises every decoder path). Returns the canonical
    * code values for the writer. */
  private def writeCodeTable(bw: BitWriter,
      lengths: Array[Int]): Array[Int] = {
    val used = lengths.zipWithIndex.filter(_._1 > 0).map(_._2)
    if (used.length <= 2 && used.forall(_ <= 255)) {
      bw.writeBits(1, 1) // simple
      bw.writeBits(used.length - 1, 1)
      if (used(0) > 1) { bw.writeBits(1, 1); bw.writeBits(used(0), 8) }
      else { bw.writeBits(0, 1); bw.writeBits(used(0), 1) }
      if (used.length == 2) bw.writeBits(used(1), 8)
      return canonicalCodes(lengths)
    }
    bw.writeBits(0, 1) // normal form
    // run-length encode the length table into CL symbols
    val clStream = ArrayBuffer.empty[(Int, Int, Int)] // (sym, extraVal, extraBits)
    var i = 0
    var prevNz = 8
    while (i < lengths.length) {
      val v = lengths(i)
      var run = 1
      while (i + run < lengths.length && lengths(i + run) == v) run += 1
      if (v == 0) {
        var left = run
        while (left >= 11) {
          val take = math.min(left, 138)
          clStream += ((18, take - 11, 7)); left -= take
        }
        while (left >= 3) {
          val take = math.min(left, 10)
          clStream += ((17, take - 3, 3)); left -= take
        }
        var r = 0
        while (r < left) { clStream += ((0, 0, 0)); r += 1 }
      } else {
        clStream += ((v, 0, 0))
        var left = run - 1
        if (v == prevNz) { clStream.remove(clStream.length - 1); left = run }
        while (left >= 3) {
          val take = math.min(left, 6)
          clStream += ((16, take - 3, 2)); left -= take
        }
        var r = 0
        while (r < left) { clStream += ((v, 0, 0)); r += 1 }
        prevNz = v
      }
      i += run
    }
    val clUsed = clStream.map(_._1).distinct.sorted
    val clLengths = balancedLengths(19, clUsed.toSeq)
    val clCodes = canonicalCodes(clLengths)
    // cover every used CL symbol with a prefix of the spec order
    var numCl = 4
    val need = clUsed.toSet
    while (numCl < 19 && !need.subsetOf(ClOrder.take(numCl).toSet)) numCl += 1
    bw.writeBits(numCl - 4, 4)
    var j = 0
    while (j < numCl) { bw.writeBits(clLengths(ClOrder(j)), 3); j += 1 }
    // max-symbol shortcut: the decoder stops after max_symbol CL-code
    // READS and zero-fills the rest, so a trailing zero run can be
    // dropped from the stream entirely instead of spelled out with
    // 17/18 repeats — used when the tail run is long enough to pay
    // for the count field, so round-trips exercise BOTH decoder
    // paths. max_symbol is stored as 2 + a (2+2k)-bit count.
    val tail = clStream.reverseIterator
      .takeWhile(e => e._1 == 0 || e._1 == 17 || e._1 == 18).length
    val emit =
      if (tail >= 2 && clStream.length - tail >= 2) {
        val kept = clStream.length - tail
        var lenNBits = 2
        while ((1 << lenNBits) - 1 < kept - 2) lenNBits += 2
        bw.writeBits(1, 1)
        bw.writeBits((lenNBits - 2) / 2, 3)
        bw.writeBits(kept - 2, lenNBits)
        clStream.take(kept)
      } else {
        bw.writeBits(0, 1)
        clStream
      }
    // single-symbol CL code reads zero bits per symbol — legal
    val singleCl = clUsed.length == 1
    emit.foreach { case (s, extraVal, extraBits) =>
      if (!singleCl) bw.writeCode(clCodes(s), clLengths(s))
      if (extraBits > 0) bw.writeBits(extraVal, extraBits)
    }
    canonicalCodes(lengths)
  }

  /** Encode-side symbol stream element. */
  private sealed trait Tok
  private final case class Lit(a: Int, r: Int, g: Int, b: Int) extends Tok
  private final case class Copy(len: Int, plane: Int) extends Tok
  private final case class CacheRef(idx: Int) extends Tok

  /** Fixture encoder: a valid VP8L stream (inside a RIFF/WEBP
    * container) for an arbitrary RGB image. Options select transform
    * and coding paths so WebpSpec round-trips exercise the decoder's
    * full surface: subtract-green, a uniform color transform, any
    * single predictor mode, palette indexing (with bundling when the
    * color count allows), LZ77 left-runs, a color cache, and a 2-group
    * meta split. Normal-form codes are balanced (valid, suboptimal —
    * fixtures optimize for coverage, not bytes). */
  def encodeWebpLossless(w: Int, h: Int,
      pix: (Int, Int) => (Int, Int, Int),
      subtractGreen: Boolean = false,
      predictorMode: Option[Int] = None,
      colorTransform: Option[(Int, Int, Int)] = None,
      palette: Boolean = false,
      cacheBits: Int = 0,
      lz77Runs: Boolean = false,
      metaSplit: Boolean = false): Array[Byte] = {
    require(w >= 1 && h >= 1 && w <= 16383 && h <= 16383)
    require(!(palette && (subtractGreen || predictorMode.isDefined ||
      colorTransform.isDefined)), "fixture keeps palette standalone")
    // ---- forward transforms over ARGB
    var px = Array.tabulate(w * h) { i =>
      val (r, g, b) = pix(i % w, i / w)
      0xff000000 | (r << 16) | (g << 8) | b
    }
    var xsize = w
    // read order written to the stream; forward application is the
    // reverse of the decoder's inverse-application order, i.e. the
    // LIST order reversed twice = list order applied backwards
    val transformsInReadOrder = ArrayBuffer.empty[Transform]
    predictorMode.foreach { mode =>
      require(mode >= 0 && mode <= 13)
      transformsInReadOrder += Transform(0, 9, Array((mode & 0xff) << 8),
        xsize, 0)
    }
    colorTransform.foreach { case (g2r, g2b, r2b) =>
      transformsInReadOrder += Transform(1, 9,
        Array(((r2b & 0xff) << 16) | ((g2b & 0xff) << 8) | (g2r & 0xff)),
        xsize, 0)
    }
    if (subtractGreen) transformsInReadOrder += Transform(2, 0, null, xsize, 0)
    var paletteArr: Array[Int] = null
    var paletteXbits = 0
    if (palette) {
      val colors = px.distinct
      require(colors.length <= 256, "palette fixture needs <= 256 colors")
      paletteArr = colors.sorted
      val n = paletteArr.length
      paletteXbits = if (n <= 2) 3 else if (n <= 4) 2 else if (n <= 16) 1 else 0
      transformsInReadOrder += Transform(3, 0, paletteArr, xsize, paletteXbits)
    }
    // apply forward: reverse of inverse order = iterate in read order
    // backwards... the decoder inverts in reverse read order, so the
    // forward pipeline applies them in read order, LAST listed first?
    // No: decoder does inv(T1) after inv(T2) for read order [T1, T2]
    // (reverse), so the data stored = T2(T1(image)) — forward applies
    // in read order.
    transformsInReadOrder.foreach { tr =>
      tr.kind match {
        case 2 => // subtract green forward
          px = px.map { v =>
            val g = (v >>> 8) & 0xff
            val r = (((v >>> 16) & 0xff) - g) & 0xff
            val b = ((v & 0xff) - g) & 0xff
            (v & 0xff00ff00) | (r << 16) | b
          }
        case 1 => // color transform forward (inverse of applyColorInverse)
          val cte = tr.data(0)
          val g2r = cte & 0xff; val g2b = (cte >>> 8) & 0xff
          val r2b = (cte >>> 16) & 0xff
          px = px.map { v =>
            val green = (v >>> 8) & 0xff
            val red = (v >>> 16) & 0xff
            val blue = v & 0xff
            val newRed = (red - cDelta(g2r, green)) & 0xff
            val newBlue = (blue - cDelta(g2b, green) - cDelta(r2b, red)) & 0xff
            (v & 0xff00ff00) | (newRed << 16) | newBlue
          }
        case 0 => // predictor forward: residual = pixel − prediction,
          // computed against the RECONSTRUCTED (original) neighbors
          val mode = (tr.data(0) >>> 8) & 0xff
          val res = new Array[Int](px.length)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val m =
                if (x == 0 && y == 0) 0
                else if (y == 0) 1
                else if (x == 0) 2
                else mode
              res(y * w + x) =
                subPixels(px(y * w + x), predict(m, px, w, x, y))
              x += 1
            }
            y += 1
          }
          px = res
        case 3 => // palette forward: indices, then bundle
          val lookup = paletteArr.zipWithIndex.toMap
          val bpp = 8 >> paletteXbits
          val pw = sub(w, paletteXbits)
          val packed = new Array[Int](pw * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val idx = lookup(px(y * w + x))
              val slot = y * pw + (x >> paletteXbits)
              val sh = (x & ((1 << paletteXbits) - 1)) * bpp
              packed(slot) |= (idx << sh) << 8 // green channel
              x += 1
            }
            y += 1
          }
          px = packed.map(_ | 0xff000000)
          xsize = pw
      }
    }

    // ---- tokenize (LZ77 left-runs + color cache, both optional)
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheBits > 0) new Array[Int](cacheSize) else null
    val cacheValid =
      if (cacheBits > 0) new Array[Boolean](cacheSize) else null
    val toks = ArrayBuffer.empty[(Tok, Int)] // (token, pixel index)
    var i = 0
    val n = px.length
    def insert(v: Int): Unit = if (cache != null) {
      val hsh = cacheHash(v, cacheBits)
      cache(hsh) = v; cacheValid(hsh) = true
    }
    while (i < n) {
      val v = px(i)
      // left-run (dist 1) — never across the first pixel
      var run = 0
      if (lz77Runs && i > 0 && px(i - 1) == v) {
        while (i + run < n && px(i + run) == v) run += 1
        run = math.min(run, 4096) // 24 length prefixes cap at 4096
      }
      if (run >= 4) {
        toks += ((Copy(run, 2), i)) // plane 2 = (1,0) = distance 1
        var k = 0
        while (k < run) { insert(px(i + k)); k += 1 }
        i += run
      } else {
        val hsh = if (cache != null) cacheHash(v, cacheBits) else -1
        if (cache != null && cacheValid(hsh) && cache(hsh) == v) {
          toks += ((CacheRef(hsh), i))
          i += 1
        } else {
          toks += ((Lit((v >>> 24) & 0xff, (v >>> 16) & 0xff,
            (v >>> 8) & 0xff, v & 0xff), i))
          insert(v)
          i += 1
        }
      }
    }

    // ---- group assignment (optional 2-way meta split on x-blocks).
    // The decoder infers the group COUNT from the entropy image (max
    // meta index + 1), so the encoder must emit exactly that many
    // code sets: an image narrower than two blocks collapses to one
    // group even with the split requested (property-test catch).
    val hbits = 2
    val hw = sub(xsize, hbits)
    def groupOf(pixelIdx: Int): Int =
      if (!metaSplit) 0 else ((pixelIdx % xsize) >> hbits) % 2
    val numGroups = if (metaSplit) math.min(2, hw) else 1

    // ---- histograms per group
    val greenAlphabet = 256 + 24 + cacheSize
    val hist = Array.fill(numGroups)(Array(
      new Array[Long](greenAlphabet), new Array[Long](256),
      new Array[Long](256), new Array[Long](256), new Array[Long](40)))
    toks.foreach { case (tok, pi) =>
      val g = hist(groupOf(pi))
      tok match {
        case Lit(a, r, gg, b) =>
          g(0)(gg) += 1; g(1)(r) += 1; g(2)(b) += 1; g(3)(a) += 1
        case Copy(len, plane) =>
          g(0)(256 + lz77Prefix(len)._1) += 1
          g(4)(lz77Prefix(plane)._1) += 1
        case CacheRef(idx) => g(0)(280 + idx) += 1
      }
    }

    // ---- emit
    val bw = new BitWriter()
    bw.writeBits(w - 1, 14)
    bw.writeBits(h - 1, 14)
    bw.writeBits(0, 1) // alpha hint
    bw.writeBits(0, 3) // version
    // transforms in read order
    transformsInReadOrder.foreach { tr =>
      bw.writeBits(1, 1)
      bw.writeBits(tr.kind, 2)
      tr.kind match {
        case 0 | 1 =>
          bw.writeBits(tr.bits - 2, 3) // 9 → single block
          writeSubImage(bw, tr.data)
        case 2 => ()
        case 3 =>
          bw.writeBits(tr.data.length - 1, 8)
          // palette stored component-delta coded
          val deltas = tr.data.zipWithIndex.map { case (p, k) =>
            if (k == 0) p else subPixels(p, tr.data(k - 1))
          }
          writeSubImage(bw, deltas)
      }
    }
    bw.writeBits(0, 1) // no transform terminator handled by loop above
    // ^ the loop wrote a 1-bit before each transform; this 0 ends it
    if (cacheBits > 0) { bw.writeBits(1, 1); bw.writeBits(cacheBits, 4) }
    else bw.writeBits(0, 1)
    if (metaSplit) {
      bw.writeBits(1, 1)
      bw.writeBits(hbits - 2, 3)
      // entropy image: group index in (red<<8)|green
      writeSubImage(bw, Array.tabulate(hw * sub(h, hbits)) { k =>
        val bx = k % hw
        0xff000000 | ((bx % 2) << 8)
      })
    } else bw.writeBits(0, 1)
    val codes = Array.tabulate(numGroups) { gi =>
      hist(gi).map { hg =>
        val used = hg.zipWithIndex.filter(_._1 > 0).map(_._2).toSeq
        // a code must exist even for channels never coded (e.g. all
        // pixels via cache): give them a trivial single-symbol code
        val u = if (used.isEmpty) Seq(0) else used
        val lengths = balancedLengths(hg.length, u)
        (lengths, writeCodeTable(bw, lengths))
      }
    }
    toks.foreach { case (tok, pi) =>
      val (gl, gc) = (codes(groupOf(pi)).map(_._1), codes(groupOf(pi)).map(_._2))
      def put(ch: Int, sym: Int): Unit =
        if (gl(ch).count(_ > 0) > 1) bw.writeCode(gc(ch)(sym), gl(ch)(sym))
      tok match {
        case Lit(a, r, g, b) =>
          put(0, g); put(1, r); put(2, b); put(3, a)
        case Copy(len, plane) =>
          val (lp, leb, lev) = lz77Prefix(len)
          put(0, 256 + lp)
          if (leb > 0) bw.writeBits(lev, leb)
          val (dp, deb, dev) = lz77Prefix(plane)
          put(4, dp)
          if (deb > 0) bw.writeBits(dev, deb)
        case CacheRef(idx) => put(0, 280 + idx)
      }
    }
    wrapRiff("VP8L", Array[Byte](0x2f) ++ bw.toBytes)
  }

  /** A level0=false sub-image (transform data / palette / entropy
    * image): no transforms, no cache, no meta — literal pixels under
    * per-channel codes. */
  private def writeSubImage(bw: BitWriter, data: Array[Int]): Unit = {
    bw.writeBits(0, 1) // no color cache
    val channels = Seq[Int => Int](v => (v >>> 8) & 0xff,
      v => (v >>> 16) & 0xff, v => v & 0xff, v => (v >>> 24) & 0xff)
    // order in the stream: green, red, blue, alpha, distance
    val greenLengths = balancedLengths(256 + 24,
      data.map(channels(0)).distinct.toSeq)
    val greenCodes = writeCodeTable(bw, greenLengths)
    val others = Seq(1, 2, 3).map { ci =>
      val lens = balancedLengths(256, data.map(channels(ci)).distinct.toSeq)
      (lens, writeCodeTable(bw, lens))
    }
    val distLengths = balancedLengths(40, Seq(0))
    writeCodeTable(bw, distLengths)
    data.foreach { v =>
      if (greenLengths.count(_ > 0) > 1)
        bw.writeCode(greenCodes(channels(0)(v)), greenLengths(channels(0)(v)))
      others.zip(Seq(1, 2, 3)).foreach { case ((lens, cods), ci) =>
        val s = channels(ci)(v)
        if (lens.count(_ > 0) > 1) bw.writeCode(cods(s), lens(s))
      }
    }
  }

  /** RIFF/WEBP container around one or more (tag, payload) chunks,
    * odd payloads padded per RIFF. */
  private[ops] def wrapRiffChunks(chunks: Seq[(String, Array[Byte])]): Array[Byte] = {
    val body = chunks.map { case (_, p) => 8 + p.length + (p.length & 1) }.sum
    val out = new ArrayBuffer[Byte](12 + body)
    def tag(s: String): Unit = s.foreach(c => out += c.toByte)
    def u32(v: Int): Unit = {
      out += (v & 0xff).toByte; out += ((v >> 8) & 0xff).toByte
      out += ((v >> 16) & 0xff).toByte; out += ((v >> 24) & 0xff).toByte
    }
    tag("RIFF"); u32(4 + body); tag("WEBP")
    chunks.foreach { case (t, p) =>
      tag(t); u32(p.length)
      out ++= p
      if ((p.length & 1) == 1) out += 0
    }
    out.toArray
  }

  private def wrapRiff(tag: String, payload: Array[Byte]): Array[Byte] =
    wrapRiffChunks(Seq(tag -> payload))

  /** Fixture-side: pad a RIFF container to EXACTLY `target` bytes
    * with a trailing JUNK chunk (the standard RIFF filler tag: 8-byte
    * header + zero fill), patching the RIFF size field — gives the
    * WebP fixtures closed-form byte lengths the metadata oracle can
    * recompute in SQL despite the bool/prefix encoders' variable
    * output. Every chunk walk here skips unknown tags, so decode
    * behavior is unchanged. Both lengths must be even (RIFF chunk
    * alignment keeps real containers even). */
  private[ops] def padRiffTo(b: Array[Byte], target: Int): Array[Byte] = {
    require((b.length & 1) == 0 && (target & 1) == 0 &&
      target >= b.length + 8, s"cannot pad ${b.length} to $target")
    val out = java.util.Arrays.copyOf(b, target)
    val junk = target - b.length - 8
    out(b.length) = 'J'; out(b.length + 1) = 'U'
    out(b.length + 2) = 'N'; out(b.length + 3) = 'K'
    out(b.length + 4) = (junk & 0xff).toByte
    out(b.length + 5) = ((junk >> 8) & 0xff).toByte
    out(b.length + 6) = ((junk >> 16) & 0xff).toByte
    out(b.length + 7) = ((junk >> 24) & 0xff).toByte
    val sz = target - 8
    out(4) = (sz & 0xff).toByte; out(5) = ((sz >> 8) & 0xff).toByte
    out(6) = ((sz >> 16) & 0xff).toByte; out(7) = ((sz >> 24) & 0xff).toByte
    out
  }
}
