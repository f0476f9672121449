package graft.ops

/** Pure-JVM GIF87a/89a decode (and a fixture encoder) — the last of
  * the common raster containers. Everything from the public GIF
  * specification: logical screen descriptor, global/local color
  * tables, extension-block skipping, sub-block framing, and full LZW
  * decompression with variable-width codes, CLEAR/EOI handling, and
  * the KwKwK case; interlaced images are de-interlaced by the
  * standard 4-pass row order.
  *
  * The encoder emits literal-coded LZW (a CLEAR before the dictionary
  * would outgrow the initial width — the classic "uncompressed GIF"
  * technique): maximally simple, bit-for-bit valid input for ANY
  * conforming decoder, which keeps the fixture side trivially
  * closed-form while the decoder exercises the real bit-unpacking
  * path.
  */
object Gif {

  /** Encode an 8-bit indexed image with a 256-entry grayscale global
    * color table (palette[i] = (i,i,i)) as a non-interlaced GIF89a. */
  def encodeGifGray(w: Int, h: Int, pix: (Int, Int) => Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(w); u16(h)
    out.write(0xf7) // GCT present, 8 bpp, 256 entries
    out.write(0); out.write(0) // background, aspect
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    out.write(0x2c) // image descriptor
    u16(0); u16(0); u16(w); u16(h)
    out.write(0) // no LCT, not interlaced
    val minCode = 8
    out.write(minCode)
    // literal LZW: CLEAR, then pixel codes at width 9, re-CLEAR before
    // the dictionary reaches width 10 (i.e. every 254 literals)
    val clear = 1 << minCode; val eoi = clear + 1
    val bits = new scala.collection.mutable.ArrayBuffer[Byte]()
    var acc = 0L; var nAcc = 0
    def put(code: Int): Unit = {
      acc |= code.toLong << nAcc; nAcc += 9
      while (nAcc >= 8) { bits += (acc & 0xff).toByte; acc >>= 8; nAcc -= 8 }
    }
    put(clear)
    var since = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (since == 254) { put(clear); since = 0 }
        put(pix(x, y) & 0xff); since += 1
        x += 1
      }
      y += 1
    }
    put(eoi)
    if (nAcc > 0) bits += (acc & 0xff).toByte
    // sub-block framing: ≤255-byte chunks, zero terminator
    var o = 0
    while (o < bits.length) {
      val n = math.min(255, bits.length - o)
      out.write(n)
      out.write(bits.slice(o, o + n).toArray)
      o += n
    }
    out.write(0)
    out.write(0x3b) // trailer
    out.toByteArray
  }

  private def u16le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  /** (width, height, n_frames) from the screen descriptor + a walk
    * counting image descriptors (animation frames). */
  def decodeGifHeader(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 13) return None
    val magic = new String(b, 0, 6, "US-ASCII")
    if (magic != "GIF87a" && magic != "GIF89a") return None
    val w = u16le(b, 6); val h = u16le(b, 8)
    if (w <= 0 || h <= 0) return None
    val flags = b(10) & 0xff
    var i = 13 + (if ((flags & 0x80) != 0) 3 * (2 << (flags & 7)) else 0)
    var frames = 0
    def skipSubBlocks(): Boolean = {
      while (i < b.length && (b(i) & 0xff) != 0) {
        i += 1 + (b(i) & 0xff)
        if (i > b.length) return false
      }
      i += 1 // terminator
      i <= b.length
    }
    while (i < b.length) {
      (b(i) & 0xff) match {
        case 0x3b => return Some((w, h, frames))
        case 0x21 => // extension: label + sub-blocks
          i += 2
          if (!skipSubBlocks()) return None
        case 0x2c =>
          if (i + 10 > b.length) return None
          val lf = b(i + 9) & 0xff
          frames += 1
          i += 10 + (if ((lf & 0x80) != 0) 3 * (2 << (lf & 7)) else 0)
          i += 1 // LZW min code size
          if (!skipSubBlocks()) return None
        case _ => return None
      }
    }
    None // missing trailer
  }

  /** Decode the FIRST frame to 8-bit luma (BT.601 over its palette),
    * full LZW with variable-width codes; interlace unwoven. Frames
    * beyond the first would decode identically per-descriptor (with
    * disposal composition up to the caller). */
  def decodeGifGray(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (decodeGifHeader(b).isEmpty) return None
    val flags = b(10) & 0xff
    var gct: Array[Byte] = null
    var i = 13
    if ((flags & 0x80) != 0) {
      val n = 3 * (2 << (flags & 7))
      gct = java.util.Arrays.copyOfRange(b, i, i + n)
      i += n
    }
    // walk to the first image descriptor
    while (i < b.length && (b(i) & 0xff) != 0x2c) {
      if ((b(i) & 0xff) == 0x21) {
        i += 2
        while (i < b.length && (b(i) & 0xff) != 0) i += 1 + (b(i) & 0xff)
        i += 1
      } else return None
    }
    if (i >= b.length) return None
    val iw = u16le(b, i + 5); val ih = u16le(b, i + 7)
    val lf = b(i + 9) & 0xff
    val interlaced = (lf & 0x40) != 0
    i += 10
    var pal = gct
    if ((lf & 0x80) != 0) {
      val n = 3 * (2 << (lf & 7))
      pal = java.util.Arrays.copyOfRange(b, i, i + n)
      i += n
    }
    if (pal == null || iw <= 0 || ih <= 0) return None
    val minCode = b(i) & 0xff; i += 1
    if (minCode < 2 || minCode > 11) return None
    // concatenate sub-blocks
    val data = new java.io.ByteArrayOutputStream()
    while (i < b.length && (b(i) & 0xff) != 0) {
      val n = b(i) & 0xff
      if (i + 1 + n > b.length) return None
      data.write(b, i + 1, n)
      i += 1 + n
    }
    val d = data.toByteArray

    // LZW decompress
    val clear = 1 << minCode; val eoi = clear + 1
    val maxDict = 4096
    val prefix = new Array[Int](maxDict)
    val suffix = new Array[Byte](maxDict)
    val stack = new Array[Byte](maxDict + 1)
    val out = new Array[Byte](iw * ih)
    var outN = 0
    var dictN = eoi + 1
    var width = minCode + 1
    var prev = -1
    var acc = 0L; var nAcc = 0; var pos = 0
    def next(): Int = {
      while (nAcc < width) {
        if (pos >= d.length) return -1
        acc |= (d(pos) & 0xffL) << nAcc; nAcc += 8; pos += 1
      }
      val c = (acc & ((1 << width) - 1)).toInt
      acc >>= width; nAcc -= width
      c
    }
    var done = false
    while (!done && outN < out.length) {
      val code = next()
      if (code < 0 || code == eoi) done = true
      else if (code == clear) {
        dictN = eoi + 1; width = minCode + 1; prev = -1
      } else {
        if (code > dictN || (code == dictN && prev < 0)) return None
        // expand: either a known code, or the KwKwK case (code == dictN)
        var sp = 0
        var c = code
        if (c == dictN) { // KwKwK: prev string + its first char
          c = prev
          var t = c
          while (t >= clear + 2) t = prefix(t)
          stack(sp) = (if (t >= clear) 0 else t).toByte; sp += 1
        }
        while (c >= clear + 2) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
        val first = (if (c >= clear) 0 else c).toByte
        stack(sp) = first; sp += 1
        // pop to output
        while (sp > 0 && outN < out.length) {
          sp -= 1; out(outN) = stack(sp); outN += 1
        }
        if (prev >= 0 && dictN < maxDict) {
          prefix(dictN) = prev; suffix(dictN) = first
          dictN += 1
          if (dictN == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    if (outN < out.length) return None
    // palette → luma, with interlace unwoven
    val gray = new Array[Byte](iw * ih)
    val rowOf: Int => Int =
      if (!interlaced) identity
      else {
        val order = new Array[Int](ih)
        var k = 0
        for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
          var r = start
          while (r < ih) { order(k) = r; k += 1; r += step }
        }
        order
      }
    var y = 0
    while (y < ih) {
      val dy = rowOf(y)
      var x = 0
      while (x < iw) {
        val idx = (out(y * iw + x) & 0xff) * 3
        val lum =
          if (idx + 2 < pal.length)
            (299 * (pal(idx) & 0xff) + 587 * (pal(idx + 1) & 0xff) +
              114 * (pal(idx + 2) & 0xff)) / 1000
          else 0
        gray(dy * iw + x) = lum.toByte
        x += 1
      }
      y += 1
    }
    Some((iw, ih, gray))
  }
}
