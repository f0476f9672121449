package graft.ops

/** Pure-JVM GIF87a/89a decode (and fixture encoders) — the last of
  * the common raster containers. Everything from the public GIF
  * specification: logical screen descriptor, global/local color
  * tables, extension-block framing (incl. the Graphic Control
  * Extension's disposal method and transparent index), sub-block
  * framing, and full LZW decompression with variable-width codes,
  * CLEAR/EOI handling, and the KwKwK case; interlaced images are
  * de-interlaced by the standard 4-pass row order.
  *
  * Two decode contracts, same as animated WebP: per-frame pixels
  * (first frame via [[decodeGifGray]], the gray pipeline's default)
  * and the opt-in composited canvas ([[gifCompositedLumas]] — the
  * GCE dispose state machine + binary transparency applied through
  * the shared [[Anim]] compositor).
  *
  * The encoders emit literal-coded LZW (a CLEAR before the dictionary
  * would outgrow the initial width — the classic "uncompressed GIF"
  * technique): maximally simple, bit-for-bit valid input for ANY
  * conforming decoder, which keeps the fixture side trivially
  * closed-form while the decoder exercises the real bit-unpacking
  * path.
  */
object Gif {

  // --------------------------------------------------------- encode

  /** Literal-coded LZW image data for an iw×ih index raster: CLEAR,
    * 9-bit literals with a re-CLEAR every 254 codes, EOI, sub-block
    * framing. Shared by the still and animated fixture encoders. */
  private def writeImageData(out: java.io.ByteArrayOutputStream,
      iw: Int, ih: Int, pix: (Int, Int) => Int): Unit = {
    val minCode = 8
    out.write(minCode)
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
    while (y < ih) {
      var x = 0
      while (x < iw) {
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
  }

  private def writeHeader(out: java.io.ByteArrayOutputStream,
      w: Int, h: Int): Unit = {
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(w); u16(h)
    out.write(0xf7) // GCT present, 8 bpp, 256 entries
    out.write(0); out.write(0) // background index, aspect
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
  }

  /** Encode an 8-bit indexed image with a 256-entry grayscale global
    * color table (palette[i] = (i,i,i)) as a non-interlaced GIF89a. */
  def encodeGifGray(w: Int, h: Int, pix: (Int, Int) => Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeHeader(out, w, h)
    out.write(0x2c) // image descriptor
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    u16(0); u16(0); u16(w); u16(h)
    out.write(0) // no LCT, not interlaced
    writeImageData(out, w, h, pix)
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Fixture: ANIMATED GIF89a — grayscale GCT, each frame an
    * (x, y, fw, fh, pix, dispose, transparentIdx) subrect with its
    * own Graphic Control Extension. `dispose` uses the GIF codes
    * (1 = none, 2 = restore to background, 3 = restore to previous);
    * `transparentIdx` < 0 means opaque. */
  private[ops] def encodeGifAnim(w: Int, h: Int,
      frames: Seq[(Int, Int, Int, Int, (Int, Int) => Int, Int, Int)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeHeader(out, w, h)
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    frames.foreach { case (x, y, fw, fh, pix, dispose, transIdx) =>
      out.write(0x21); out.write(0xf9); out.write(4) // GCE
      out.write(((dispose & 7) << 2) | (if (transIdx >= 0) 1 else 0))
      u16(5) // delay (centiseconds) — arbitrary fixed value
      out.write(if (transIdx >= 0) transIdx else 0)
      out.write(0) // GCE terminator
      out.write(0x2c)
      u16(x); u16(y); u16(fw); u16(fh)
      out.write(0) // no LCT, not interlaced
      writeImageData(out, fw, fh, pix)
    }
    out.write(0x3b)
    out.toByteArray
  }

  // --------------------------------------------------------- decode

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

  /** Concatenated image-data sub-blocks starting at `i0`; returns the
    * data and the offset just past the zero terminator. */
  private def subBlocks(b: Array[Byte], i0: Int): Option[(Array[Byte], Int)] = {
    val data = new java.io.ByteArrayOutputStream()
    var i = i0
    while (i < b.length && (b(i) & 0xff) != 0) {
      val n = b(i) & 0xff
      if (i + 1 + n > b.length) return None
      data.write(b, i + 1, n)
      i += 1 + n
    }
    if (i >= b.length) return None
    Some((data.toByteArray, i + 1))
  }

  /** Full LZW decompression with variable-width codes, CLEAR/EOI, and
    * the KwKwK case — exactly `n` output indices or None. */
  private def lzwDecode(d: Array[Byte], minCode: Int, n: Int): Option[Array[Byte]] = {
    if (minCode < 2 || minCode > 11) return None
    val clear = 1 << minCode; val eoi = clear + 1
    val maxDict = 4096
    val prefix = new Array[Int](maxDict)
    val suffix = new Array[Byte](maxDict)
    val stack = new Array[Byte](maxDict + 1)
    val out = new Array[Byte](n)
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
    if (outN < out.length) None else Some(out)
  }

  /** BT.601 integer luma of palette entry `idx` (0 when the palette
    * is missing or too short — same convention as the first-frame
    * path). */
  private def palLuma(pal: Array[Byte], idx: Int): Int = {
    val o = idx * 3
    if (pal == null || o + 2 >= pal.length) 0
    else (299 * (pal(o) & 0xff) + 587 * (pal(o + 1) & 0xff) +
      114 * (pal(o + 2) & 0xff)) / 1000
  }

  /** The standard 4-pass de-interlace row order (identity when not
    * interlaced). */
  private def rowOrder(ih: Int, interlaced: Boolean): Int => Int =
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

  /** Every frame of the stream as a compositor [[Anim.Frame]]:
    * subrect offsets from the image descriptors; disposal and binary
    * transparency from the preceding Graphic Control Extension
    * (dispose codes 0/1 → none, 2 → restore-to-background,
    * 3 → restore-to-previous; transparent-index pixels get alpha 0).
    * Luma through the local-else-global palette, interlace unwoven.
    * A malformed frame body stops the walk (GIF's sequential framing
    * has no resync point), returning the frames before it. */
  private[ops] def gifFrames(b: Array[Byte]): Seq[Anim.Frame] = {
    if (decodeGifHeader(b).isEmpty) return Nil
    val flags = b(10) & 0xff
    var gct: Array[Byte] = null
    var i = 13
    if ((flags & 0x80) != 0) {
      val n = 3 * (2 << (flags & 7))
      gct = java.util.Arrays.copyOfRange(b, i, i + n)
      i += n
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Anim.Frame]
    var dispose = 0; var transIdx = -1; var delayCs = 0 // pending GCE
    while (i < b.length) {
      (b(i) & 0xff) match {
        case 0x3b => return out.toSeq
        case 0x21 =>
          val label = if (i + 1 < b.length) b(i + 1) & 0xff else -1
          if (label == 0xf9 && i + 7 < b.length && (b(i + 2) & 0xff) >= 4) {
            val gf = b(i + 3) & 0xff
            dispose = ((gf >> 2) & 7) match {
              case 2 => 1 // restore to background
              case 3 => 2 // restore to previous
              case _ => 0
            }
            delayCs = u16le(b, i + 4)
            transIdx = if ((gf & 1) != 0) b(i + 6) & 0xff else -1
          }
          i += 2
          subBlocks(b, i) match {
            case Some((_, ni)) => i = ni
            case None          => return out.toSeq
          }
        case 0x2c =>
          if (i + 10 > b.length) return out.toSeq
          val fx = u16le(b, i + 1); val fy = u16le(b, i + 3)
          val iw = u16le(b, i + 5); val ih = u16le(b, i + 7)
          val lf = b(i + 9) & 0xff
          val interlaced = (lf & 0x40) != 0
          i += 10
          var pal = gct
          if ((lf & 0x80) != 0) {
            val n = 3 * (2 << (lf & 7))
            if (i + n > b.length) return out.toSeq
            pal = java.util.Arrays.copyOfRange(b, i, i + n)
            i += n
          }
          if (pal == null || iw <= 0 || ih <= 0 || i >= b.length)
            return out.toSeq
          val minCode = b(i) & 0xff; i += 1
          subBlocks(b, i) match {
            case None => return out.toSeq
            case Some((d, ni)) =>
              i = ni
              lzwDecode(d, minCode, iw * ih) match {
                case None => return out.toSeq
                case Some(idxs) =>
                  val luma = new Array[Byte](iw * ih)
                  val alpha =
                    if (transIdx >= 0) new Array[Byte](iw * ih) else null
                  val rowOf = rowOrder(ih, interlaced)
                  var y = 0
                  while (y < ih) {
                    val dy = rowOf(y)
                    var x = 0
                    while (x < iw) {
                      val idx = idxs(y * iw + x) & 0xff
                      luma(dy * iw + x) = palLuma(pal, idx).toByte
                      if (alpha != null)
                        alpha(dy * iw + x) =
                          (if (idx == transIdx) 0 else 255).toByte
                      x += 1
                    }
                    y += 1
                  }
                  out += Anim.Frame(fx, fy, iw, ih, luma, alpha,
                    noBlend = false, dispose = dispose,
                    durationMs = delayCs * 10)
              }
          }
          dispose = 0; transIdx = -1; delayCs = 0 // GCE scope: one image
        case _ => return out.toSeq
      }
    }
    out.toSeq
  }

  /** COMPOSITED animated-GIF decode: every `stride`-th PRESENTED
    * canvas as (frameIdx, canvasW, canvasH, luma) — logical-screen
    * canvas initialized to the background-index luma through the GCT
    * (0 without a GCT: the spec leaves GCT-less backgrounds
    * undefined), GCE disposal + binary transparency applied through
    * the shared [[Anim]] compositor. The per-frame twin of
    * [[Webp.animCompositedLumas]]. */
  def gifCompositedLumas(b: Array[Byte],
      stride: Int): Seq[(Int, Int, Int, Array[Byte])] =
    decodeGifHeader(b) match {
      case None => Nil
      case Some((w, h, _)) =>
        val frames = gifFrames(b)
        if (frames.isEmpty || stride < 1) Nil
        else {
          val flags = b(10) & 0xff
          val bg =
            if ((flags & 0x80) == 0) 0
            else {
              val gct = java.util.Arrays.copyOfRange(b, 13,
                13 + 3 * (2 << (flags & 7)))
              palLuma(gct, b(11) & 0xff)
            }
          Anim.composite(w, h, bg, frames, stride)
            .map { case (fi, g) => (fi, w, h, g) }
        }
    }

  /** Decode the FIRST frame to 8-bit luma (BT.601 over its palette),
    * full LZW with variable-width codes; interlace unwoven. Frames
    * beyond the first decode per-descriptor via [[gifFrames]], with
    * disposal composition in [[gifCompositedLumas]]. */
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
    subBlocks(b, i) match {
      case None => None
      case Some((d, _)) =>
        lzwDecode(d, minCode, iw * ih).map { idxs =>
          val gray = new Array[Byte](iw * ih)
          val rowOf = rowOrder(ih, interlaced)
          var y = 0
          while (y < ih) {
            val dy = rowOf(y)
            var x = 0
            while (x < iw) {
              gray(dy * iw + x) = palLuma(pal, idxs(y * iw + x) & 0xff).toByte
              x += 1
            }
            y += 1
          }
          (iw, ih, gray)
        }
    }
  }
}
