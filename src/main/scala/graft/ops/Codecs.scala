package graft.ops

/** Pure-JVM media codecs (r6 verdict item 5): real byte-level parsers
  * for the uncompressed raster formats a codec-less container can
  * still decode honestly — BMP (24bpp BI_RGB), binary PPM/PGM (P6/P5),
  * and PNG header metadata (IHDR only; pixel data is DEFLATE and out
  * of scope here). Everything is deterministic byte math: no native
  * libraries, no JNI, no ImageIO.
  *
  * [[Multimodal.decodeMetaAuto]] tries these first and falls back to
  * the stub for undecodable payloads, surfacing which path ran in a
  * `decoded` flag; [[decodeGray]] produces REAL luma pixels for the
  * phash kernel, making one media family end-to-end genuine.
  */
object Codecs {

  /** Decoded header metadata: (format, width, height, channels). */
  final case class MediaHeader(format: String, width: Int, height: Int,
    channels: Int)

  private def u16le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def i32le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def i32be(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  // ---------------------------------------------------------------- BMP

  /** BMP row stride: 24bpp rows pad to 4-byte boundaries. */
  def bmpStride(w: Int): Int = (3 * w + 3) / 4 * 4

  /** Build a real 24bpp bottom-up BI_RGB BMP. `pix(x, y)` returns
    * (r, g, b) for the TOP-LEFT-origin pixel grid. */
  def encodeBmp(w: Int, h: Int, pix: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val stride = bmpStride(w)
    val size = 54 + h * stride
    val b = new Array[Byte](size)
    def putLe(o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
      b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
    }
    b(0) = 'B'; b(1) = 'M'; putLe(2, size); putLe(10, 54)
    putLe(14, 40); putLe(18, w); putLe(22, h)
    b(26) = 1; b(28) = 24
    putLe(34, h * stride)
    var y = 0
    while (y < h) {
      val rowOff = 54 + (h - 1 - y) * stride // bottom-up storage
      var x = 0
      while (x < w) {
        val (r, g, bl) = pix(x, y)
        val o = rowOff + 3 * x
        b(o) = bl.toByte; b(o + 1) = g.toByte; b(o + 2) = r.toByte // BGR
        x += 1
      }
      y += 1
    }
    b
  }

  /** 8-bit PALETTE BMP (BI_RGB): caller-supplied (r,g,b) palette
    * stored as BGRA quads after the 40-byte info header (biClrUsed
    * set), one index byte per pixel, 4-byte-aligned rows, bottom-up —
    * the fixture twin of the palette decode path. */
  private[ops] def encodeBmp8(w: Int, h: Int, pal: Seq[(Int, Int, Int)],
      pix: (Int, Int) => Int): Array[Byte] = {
    val stride = (w + 3) / 4 * 4
    val off = 54 + 4 * pal.length
    val size = off + h * stride
    val b = new Array[Byte](size)
    def putLe(o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
      b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
    }
    b(0) = 'B'; b(1) = 'M'; putLe(2, size); putLe(10, off)
    putLe(14, 40); putLe(18, w); putLe(22, h)
    b(26) = 1; b(28) = 8
    putLe(34, h * stride); putLe(46, pal.length)
    var i = 0
    while (i < pal.length) {
      val (r, g, bl) = pal(i)
      b(54 + 4 * i) = bl.toByte; b(54 + 4 * i + 1) = g.toByte
      b(54 + 4 * i + 2) = r.toByte // quad alpha byte stays 0
      i += 1
    }
    var y = 0
    while (y < h) {
      val rowOff = off + (h - 1 - y) * stride
      var x = 0
      while (x < w) { b(rowOff + x) = pix(x, y).toByte; x += 1 }
      y += 1
    }
    b
  }

  /** 32-bpp BGRA BMP (BI_RGB, alpha plane ignored by the decoders) —
    * the fixture twin of the 32-bit decode path. */
  private[ops] def encodeBmp32(w: Int, h: Int,
      pix: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val stride = 4 * w
    val size = 54 + h * stride
    val b = new Array[Byte](size)
    def putLe(o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
      b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
    }
    b(0) = 'B'; b(1) = 'M'; putLe(2, size); putLe(10, 54)
    putLe(14, 40); putLe(18, w); putLe(22, h)
    b(26) = 1; b(28) = 32
    putLe(34, h * stride)
    var y = 0
    while (y < h) {
      val rowOff = 54 + (h - 1 - y) * stride
      var x = 0
      while (x < w) {
        val (r, g, bl) = pix(x, y)
        val o = rowOff + 4 * x
        b(o) = bl.toByte; b(o + 1) = g.toByte; b(o + 2) = r.toByte
        b(o + 3) = 0xff.toByte
        x += 1
      }
      y += 1
    }
    b
  }

  /** Build a real binary PPM (P6) with header `P6\nW H\n255\n`. */
  def encodePpm(w: Int, h: Int, pix: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val b = new Array[Byte](header.length + 3 * w * h)
    System.arraycopy(header, 0, b, 0, header.length)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, bl) = pix(x, y)
        val o = header.length + 3 * (y * w + x)
        b(o) = r.toByte; b(o + 1) = g.toByte; b(o + 2) = bl.toByte
        x += 1
      }
      y += 1
    }
    b
  }

  /** Build a real binary PGM (P5) with header `P5\nW H\n255\n`. */
  def encodePgm(w: Int, h: Int, pix: (Int, Int) => Int): Array[Byte] = {
    val header = s"P5\n$w $h\n255\n".getBytes("US-ASCII")
    val b = new Array[Byte](header.length + w * h)
    System.arraycopy(header, 0, b, 0, header.length)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        b(header.length + y * w + x) = pix(x, y).toByte
        x += 1
      }
      y += 1
    }
    b
  }

  /** Parse a netpbm header: magic, then whitespace/comment-separated
    * width, height, maxval; returns (w, h, pixel data offset). */
  private def pnmHeader(b: Array[Byte]): Option[(Int, Int, Int)] = {
    var i = 2
    val vals = new Array[Int](3)
    var nv = 0
    while (nv < 3 && i < b.length) {
      val c = b(i) & 0xff
      if (c == '#') { while (i < b.length && b(i) != '\n') i += 1 }
      else if (Character.isWhitespace(c)) i += 1
      else if (c >= '0' && c <= '9') {
        var v = 0
        while (i < b.length && b(i) >= '0' && b(i) <= '9') {
          v = v * 10 + (b(i) - '0'); i += 1
        }
        vals(nv) = v; nv += 1
      } else return None
    }
    // exactly one whitespace byte separates maxval from pixel data
    if (nv == 3 && i < b.length && Character.isWhitespace(b(i) & 0xff))
      Some((vals(0), vals(1), i + 1))
    else None
  }

  /** Parse real header metadata from payload bytes, format detected by
    * magic. BMP height may be negative (top-down) — reported absolute. */
  def decodeHeader(b: Array[Byte]): Option[MediaHeader] = {
    if (b.length >= 54 && b(0) == 'B' && b(1) == 'M') {
      val w = i32le(b, 18); val h = math.abs(i32le(b, 22))
      val bpp = u16le(b, 28)
      if (w > 0 && h > 0 && bpp % 8 == 0 && bpp > 0)
        Some(MediaHeader("bmp", w, h, bpp / 8))
      else None
    } else if (b.length > 2 && b(0) == 'P' && (b(1) == '5' || b(1) == '6')) {
      val ch = if (b(1) == '6') 3 else 1
      pnmHeader(b).map { case (w, h, _) =>
        MediaHeader(if (ch == 3) "ppm" else "pgm", w, h, ch)
      }
    } else if (b.length >= 33 && (b(0) & 0xff) == 0x89 && b(1) == 'P' &&
        b(2) == 'N' && b(3) == 'G' && b(12) == 'I' && b(13) == 'H' &&
        b(14) == 'D' && b(15) == 'R') {
      val colorType = b(25) & 0xff
      val ch = colorType match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
        case _ => return None
      }
      Some(MediaHeader("png", i32be(b, 16), i32be(b, 20), ch))
    } else if (b.length >= 4 && (b(0) & 0xff) == 0xff &&
        (b(1) & 0xff) == 0xd8) {
      // JPEG (graft.ops.Jpeg): dims + component count from the frame
      // header — baseline (SOF0) as "jpeg", progressive (SOF2) as
      // "jpeg-prog"; 1 channel for grayscale, 3 for YCbCr color
      Jpeg.decodeJpegHeader(b).map { case (w, h, nc) =>
        MediaHeader("jpeg", w, h, nc)
      }.orElse(Jpeg.decodeProgressiveHeader(b).map { case (w, h, nc) =>
        MediaHeader("jpeg-prog", w, h, nc)
      })
    } else if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') {
      // GIF87a/89a (graft.ops.Gif): palette images are 3-channel
      Gif.decodeGifHeader(b).map { case (w, h, _) =>
        MediaHeader("gif", w, h, 3)
      }
    } else if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'E' && b(10) == 'B' &&
        b(11) == 'P') {
      // WebP (graft.ops.Webp): lossless "webp-l" decodes fully; lossy
      // "webp" yields honest header dims but stays on the fingerprint
      // path (pixel decode is out of the pure-JVM codec set)
      Webp.decodeWebpHeader(b).map { case (fmt, w, h, ch) =>
        MediaHeader(fmt, w, h, ch)
      }
    } else None
  }

  /** Build a real non-interlaced 8-bit truecolor PNG: signature,
    * IHDR, one IDAT (java.util.zip.Deflater), IEND — correct CRC32s
    * and row filter byte 0. A fixture generator whose output any
    * standards-compliant reader accepts. */
  def encodePng(w: Int, h: Int, pix: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val raw = new Array[Byte](h * (1 + 3 * w))
    var y = 0
    while (y < h) {
      val off = y * (1 + 3 * w)
      raw(off) = 0 // filter: None
      var x = 0
      while (x < w) {
        val (r, g, b) = pix(x, y)
        raw(off + 1 + 3 * x) = r.toByte
        raw(off + 2 + 3 * x) = g.toByte
        raw(off + 3 + 3 * x) = b.toByte
        x += 1
      }
      y += 1
    }
    wrapPng(w, h, colorType = 2, raw)
  }

  /** Deflate filtered scanlines and wrap them as a complete PNG
    * (signature + IHDR + IDAT + IEND, correct CRC32s). Exposed to the
    * spec so filter-reversal can be tested on hand-filtered rows. */
  private[ops] def wrapPng(w: Int, h: Int, colorType: Int,
      scanlines: Array[Byte], plte: Array[Byte] = null,
      bitDepth: Int = 8, interlace: Int = 0): Array[Byte] = {
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(scanlines); deflater.finish()
    val buf = new Array[Byte](scanlines.length + 64)
    val n = deflater.deflate(buf)
    deflater.end()
    val idat = java.util.Arrays.copyOf(buf, n)
    val ihdr = new Array[Byte](13)
    def be(a: Array[Byte], o: Int, v: Int): Unit = {
      a(o) = (v >> 24).toByte; a(o + 1) = (v >> 16).toByte
      a(o + 2) = (v >> 8).toByte; a(o + 3) = v.toByte
    }
    be(ihdr, 0, w); be(ihdr, 4, h)
    ihdr(8) = bitDepth.toByte; ihdr(9) = colorType.toByte
    ihdr(12) = interlace.toByte
    def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](12 + data.length)
      be(out, 0, data.length)
      val t = tag.getBytes("US-ASCII")
      System.arraycopy(t, 0, out, 4, 4)
      System.arraycopy(data, 0, out, 8, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(out, 4, 4 + data.length)
      be(out, 8 + data.length, crc.getValue.toInt)
      out
    }
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++
      (if (plte != null) chunk("PLTE", plte) else Array.empty[Byte]) ++
      chunk("IDAT", idat) ++
      chunk("IEND", Array.empty[Byte])
  }

  /** 16-bit grayscale PNG (big-endian samples, filter-0 rows) — the
    * fixture-side encoder for the 16-bit decode path. `pix` returns
    * the full 16-bit sample. */
  private[ops] def encodePngGray16(w: Int, h: Int,
      pix: (Int, Int) => Int): Array[Byte] = {
    val raw = new Array[Byte](h * (1 + 2 * w))
    var y = 0
    while (y < h) {
      val row = y * (1 + 2 * w) + 1
      var x = 0
      while (x < w) {
        val v = pix(x, y) & 0xffff
        raw(row + 2 * x) = (v >> 8).toByte
        raw(row + 2 * x + 1) = v.toByte
        x += 1
      }
      y += 1
    }
    wrapPng(w, h, colorType = 0, raw, bitDepth = 16)
  }

  /** Adam7-interlaced 8-bit grayscale PNG (filter-0 rows per pass) —
    * the fixture-side encoder for the interlaced decode path. */
  private[ops] def encodePngGrayAdam7(w: Int, h: Int,
      pix: (Int, Int) => Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    for ((x0, y0, dx, dy) <- Adam7) {
      val pw = math.max(0, (w - x0 + dx - 1) / dx)
      val ph = math.max(0, (h - y0 + dy - 1) / dy)
      if (pw > 0 && ph > 0) {
        var j = 0
        while (j < ph) {
          bos.write(0) // filter: None
          var i = 0
          while (i < pw) {
            bos.write(pix(x0 + i * dx, y0 + j * dy) & 0xff)
            i += 1
          }
          j += 1
        }
      }
    }
    wrapPng(w, h, colorType = 0, bos.toByteArray, interlace = 1)
  }

  /** Sub-8-bit PNG (depth 1/2/4) with MSB-first packed scanlines,
    * filter-0 rows, gray (color type 0) or palette (type 3, `plte`
    * non-null) — the fixture-side encoder for the packed decode
    * path. `pix` returns a raw sample in [0, 2^depth). `adam7`
    * emits pass-ordered packed rows (each pass scanline
    * byte-aligned, per the spec). */
  private[ops] def encodePngPacked(w: Int, h: Int, depth: Int,
      pix: (Int, Int) => Int, plte: Array[Byte] = null,
      adam7: Boolean = false): Array[Byte] = {
    require(depth == 1 || depth == 2 || depth == 4, s"depth $depth")
    val bos = new java.io.ByteArrayOutputStream()
    val passes = if (adam7) Adam7 else Seq((0, 0, 1, 1))
    for ((x0, y0, dx, dy) <- passes) {
      val pw = math.max(0, (w - x0 + dx - 1) / dx)
      val ph = math.max(0, (h - y0 + dy - 1) / dy)
      if (pw > 0 && ph > 0) {
        val stride = (pw * depth + 7) / 8
        var j = 0
        while (j < ph) {
          val row = new Array[Byte](stride)
          var i = 0
          while (i < pw) {
            val bit = i * depth
            val v = pix(x0 + i * dx, y0 + j * dy) & ((1 << depth) - 1)
            row(bit >> 3) = (row(bit >> 3) |
              (v << (8 - depth - (bit & 7)))).toByte
            i += 1
          }
          bos.write(0) // filter: None
          bos.write(row)
          j += 1
        }
      }
    }
    wrapPng(w, h, if (plte == null) 0 else 3, bos.toByteArray, plte,
      bitDepth = depth, interlace = if (adam7) 1 else 0)
  }

  /** Palette (color type 3) PNG from explicit PLTE bytes and one
    * index byte per pixel, filter-0 rows — the fixture-side encoder
    * for the palette decode path. */
  private[ops] def encodePalettePng(w: Int, h: Int, plte: Array[Byte],
      indices: Array[Byte]): Array[Byte] = {
    require(indices.length == w * h, "one index byte per pixel")
    val raw = new Array[Byte](h * (1 + w))
    var y = 0
    while (y < h) {
      System.arraycopy(indices, y * w, raw, y * (1 + w) + 1, w)
      y += 1
    }
    wrapPng(w, h, colorType = 3, raw, plte)
  }

  /** Adam7 pass geometry: (x0, y0, dx, dy) per pass. */
  private val Adam7: Seq[(Int, Int, Int, Int)] = Seq(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** Inflate-and-unfilter a PNG's scanlines: IDAT chunks concatenated
    * → Inflater → per-row reversal of the five standard filters
    * (None/Sub/Up/Average/Paeth), for non-interlaced AND Adam7-
    * interlaced streams over the FULL legal depth envelope — 8 or 16
    * (16-bit samples reduce to their high byte, the standard 16→8
    * projection; filtering runs at the full per-sample byte stride),
    * and packed sub-8-bit rows (depth 1/2/4, gray or palette:
    * MSB-first bit packing, each scanline byte-aligned, filter
    * distance one byte per the spec; gray samples scale by
    * 255/(2^d−1), palette indices pass through). Returns per-pixel
    * channel bytes, top-left origin, `ch` channels; palette images
    * (color type 3) expand through their PLTE to 3-channel RGB, with
    * out-of-range indices and missing/ragged palettes rejected.
    * Spec-invalid depth/type combinations return None (malformed
    * header, not a capability bound). */
  private def pngPixels(b: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    val w = i32be(b, 16); val h = i32be(b, 20)
    val bitDepth = b(24) & 0xff; val colorType = b(25) & 0xff
    val interlace = b(28) & 0xff
    // filter-pass channel width: palette rows carry 1 index per
    // pixel; the PLTE expansion to RGB happens after unfiltering
    val ch = colorType match {
      case 0 | 3 => 1; case 2 => 3; case 4 => 2; case 6 => 4
      case _ => return None
    }
    val legalDepth = bitDepth match {
      case 8      => true
      case 16     => colorType != 3
      case 1 | 2 | 4 => colorType == 0 || colorType == 3
      case _      => false
    }
    if (!legalDepth ||
      (interlace != 0 && interlace != 1) || w <= 0 || h <= 0) return None
    val bitsPP = ch * bitDepth          // bits per pixel in the stream
    val bpp = math.max(1, bitsPP / 8)   // filter distance: >= 1 byte
    def rowBytes(pw: Int): Int = (pw * bitsPP + 7) / 8
    // concatenate IDAT payloads; pick up the palette on the way
    val idat = new java.io.ByteArrayOutputStream()
    var plte: Array[Byte] = null
    var o = 8
    var ok = true
    while (ok && o + 8 <= b.length) {
      val len = i32be(b, o)
      val tag = new String(b, o + 4, 4, "US-ASCII")
      if (len < 0 || o + 12 + len > b.length) ok = false
      else {
        if (tag == "IDAT") idat.write(b, o + 8, len)
        if (tag == "PLTE")
          plte = java.util.Arrays.copyOfRange(b, o + 8, o + 8 + len)
        if (tag == "IEND") ok = false
        o += 12 + len
      }
    }
    val passes =
      if (interlace == 0) Seq((0, 0, 1, 1)) else Adam7
    val passDims = passes.map { case (x0, y0, dx, dy) =>
      (math.max(0, (w - x0 + dx - 1) / dx),
        math.max(0, (h - y0 + dy - 1) / dy))
    }
    val total = passDims.map { case (pw, ph) =>
      if (pw == 0 || ph == 0) 0 else ph * (1 + rowBytes(pw))
    }.sum
    val raw = new Array[Byte](total)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    val got = try inf.inflate(raw) finally inf.end()
    if (got < total) return None
    val out = new Array[Byte](h * w * ch) // 8-bit (16-bit high bytes)
    var off = 0
    var pi = 0
    while (pi < passes.length) {
      val (x0, y0, dx, dy) = passes(pi)
      val (pw, ph) = passDims(pi)
      if (pw > 0 && ph > 0) {
        val stride = rowBytes(pw)
        val un = new Array[Byte](ph * stride)
        var y = 0
        while (y < ph) {
          val f = raw(off + y * (1 + stride)) & 0xff
          val row = off + y * (1 + stride) + 1
          var i = 0
          while (i < stride) {
            val x = raw(row + i) & 0xff
            val a = if (i >= bpp) un(y * stride + i - bpp) & 0xff else 0
            val u = if (y > 0) un((y - 1) * stride + i) & 0xff else 0
            val ul = if (y > 0 && i >= bpp) un((y - 1) * stride + i - bpp) & 0xff
              else 0
            val v = f match {
              case 0 => x
              case 1 => x + a
              case 2 => x + u
              case 3 => x + (a + u) / 2
              case 4 =>
                val p = a + u - ul
                val pa = math.abs(p - a); val pb = math.abs(p - u)
                val pc = math.abs(p - ul)
                x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) u else ul)
              case _ => return None
            }
            un(y * stride + i) = v.toByte
            i += 1
          }
          y += 1
        }
        // scatter pass pixels onto the output grid (high byte per
        // sample at depth >= 8; MSB-first bit extraction below 8,
        // gray scaled to full range, palette indices kept raw)
        var j = 0
        if (bitDepth >= 8) {
          val sb = bitDepth / 8
          while (j < ph) {
            var i = 0
            while (i < pw) {
              var c = 0
              while (c < ch) {
                out(((y0 + j * dy) * w + (x0 + i * dx)) * ch + c) =
                  un(j * stride + i * bpp + c * sb)
                c += 1
              }
              i += 1
            }
            j += 1
          }
        } else {
          val mask = (1 << bitDepth) - 1
          val scale = if (colorType == 0) 255 / mask else 1
          while (j < ph) {
            var i = 0
            while (i < pw) {
              val bit = i * bitDepth
              val v = (un(j * stride + (bit >> 3)) >> (8 - bitDepth - (bit & 7))) & mask
              out((y0 + j * dy) * w + (x0 + i * dx)) = (v * scale).toByte
              i += 1
            }
            j += 1
          }
        }
        off += ph * (1 + stride)
      }
      pi += 1
    }
    if (colorType == 3) {
      if (plte == null || plte.length % 3 != 0 || plte.isEmpty) return None
      val n = plte.length / 3
      val rgb = new Array[Byte](w * h * 3)
      var i = 0
      while (i < w * h) {
        val idx = out(i) & 0xff
        if (idx >= n) return None
        rgb(3 * i) = plte(3 * idx)
        rgb(3 * i + 1) = plte(3 * idx + 1)
        rgb(3 * i + 2) = plte(3 * idx + 2)
        i += 1
      }
      Some((w, h, 3, rgb))
    } else Some((w, h, ch, out))
  }

  /** Full pixel decode to TOP-LEFT-origin luma (BT.601 integer:
    * (299r + 587g + 114b) / 1000) — BMP 24bpp, binary P6/P5, and
    * non-interlaced 8-bit PNG (gray / truecolor / +alpha, alpha
    * ignored; DEFLATE via java.util.zip.Inflater, all five row
    * filters reversed). */
  def decodeGray(b: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    decodeHeader(b).flatMap(h => decodeGrayWithHeader(b, h))

  /** Three-way gray-decode verdict, so the decode LEDGER can tell
    * corpus damage from disclosed capability bounds (r14 advisor
    * finding: a format whitelist misfiled valid-but-out-of-set
    * variants — 16-bpp BMP, sub-8-bit PNG, lossy WebP — as
    * `quarantined`). Each codec path declares its own capability
    * envelope here, next to the decode call it guards. */
  private[ops] sealed trait GrayOutcome
  private[ops] object GrayOutcome {
    /** Decoded luma plane — the `real` ledger outcome. */
    final case class Real(w: Int, h: Int, gray: Array[Byte]) extends GrayOutcome
    /** Valid container, variant outside the pure-JVM decode set (or
      * over a documented resource bound) — the `fallback` outcome. */
    case object Unsupported extends GrayOutcome
    /** Supported variant whose body fails to parse — the
      * `quarantined` outcome (data damage, not an engine gap). */
    case object Malformed extends GrayOutcome
  }

  /** Classify + decode in one pass (header already parsed — the
    * fallback path at 100 TB must not pay a second magic dispatch).
    * Capability envelope per format:
    *  - bmp: BI_RGB 8-bit palette / 24-bit / 32-bit (alpha ignored);
    *    16bpp and compressed (RLE/bitfields/embedded) → Unsupported
    *  - png: the full legal envelope — depth 1/2/4 (gray + palette,
    *    packed rows), 8 (all types), 16 (non-palette), interlace 0/1;
    *    spec-invalid depth/type combos → Malformed
    *  - jpeg / jpeg-prog: 1-, 3-, or 4-component, baseline AND
    *    progressive (CMYK / YCCK via the Adobe APP14 transform flag —
    *    [[Jpeg.decodeJpegLuma4]] / [[Jpeg.decodeProgressiveLuma4]]);
    *    2-component streams → Unsupported
    *  - webp-l: ≤64M pixels (a DoS bound, not a spec bound — legal
    *    VP8L dims reach 16383², 268M px → Unsupported, disclosed)
    *  - webp (lossy VP8): key frames fully decoded ([[Vp8]], RFC 6386
    *    incl. loop filter; luma = the Y plane, same convention as
    *    color JPEG), same ≤64M-pixel bound; an interframe payload
    *    (impossible as a still container's image chunk) or malformed
    *    body → Malformed
    *  - webp-anim: POSTER frame (first decodable ANMF frame
    *    composited onto the ANIM background at canvas dims), same
    *    pixel bound; no decodable frame → Malformed
    *  - gif / ppm / pgm: fully inside the decode set */
  private[ops] def grayOutcome(b: Array[Byte],
      header: MediaHeader): GrayOutcome = {
    import GrayOutcome._
    def done(r: Option[(Int, Int, Array[Byte])]): GrayOutcome = r match {
      case Some((w, h, g)) => Real(w, h, g)
      case None            => Malformed
    }
    header match {
      case MediaHeader("bmp", _, _, ch)
          if ch == 2 || (b.length >= 34 && i32le(b, 30) != 0) =>
        // 16bpp, or any non-BI_RGB compression (RLE4/8, bitfields,
        // embedded PNG/JPEG): valid container, outside the decode set
        Unsupported
      case MediaHeader("png", _, _, _) =>
        // full legal depth envelope (1/2/4 gray+palette, 8 all
        // types, 16 non-palette) decodes; spec-invalid depth/type
        // combinations fail the body parse → Malformed
        done(decodeGrayImpl(b, header))
      case MediaHeader("jpeg" | "jpeg-prog", _, _, 4) =>
        // CMYK / YCCK (Adobe APP14), baseline and progressive alike
        done(decodeGrayImpl(b, header))
      case MediaHeader("jpeg" | "jpeg-prog", _, _, nc)
          if nc != 1 && nc != 3 => Unsupported
      case MediaHeader("webp-l", w, h, _) =>
        if (w.toLong * h > 64L * 1024 * 1024) Unsupported
        else done(decodeGrayImpl(b, header))
      case MediaHeader("webp", w, h, _) =>
        if (w.toLong * h > Vp8.MaxPixels) Unsupported
        else done(decodeGrayImpl(b, header))
      case MediaHeader("webp-anim", w, h, _) =>
        // poster frame: the canvas after the first decodable ANMF
        // frame composites onto the ANIM background — the thumbnail
        // representative at honest canvas dims ([[Webp.animPosterLuma]];
        // full per-frame and composited walks are separate stages)
        if (w.toLong * h > Vp8.MaxPixels) Unsupported
        else done(Webp.animPosterLuma(b))
      case MediaHeader("bmp" | "ppm" | "pgm" | "jpeg" | "jpeg-prog" |
          "gif", _, _, _) =>
        done(decodeGrayImpl(b, header))
      case _ => Unsupported
    }
  }

  /** [[decodeGray]] with the header already parsed; Option shape for
    * callers that only need pixels ([[grayOutcome]] carries the
    * three-way ledger verdict). */
  private[ops] def decodeGrayWithHeader(b: Array[Byte],
      header: MediaHeader): Option[(Int, Int, Array[Byte])] =
    grayOutcome(b, header) match {
      case GrayOutcome.Real(w, h, g) => Some((w, h, g))
      case _                         => None
    }

  /** BMP per-pixel luma for the BI_RGB depths in the decode set —
    * 8-bit palette (BGRA quads after the info header, biClrUsed or
    * 2^8 entries, out-of-range indices rejected), 24-bit BGR, 32-bit
    * BGRA (alpha ignored) — handling bottom-up vs top-down storage
    * and 4-byte row alignment at every depth. */
  private def bmpGray(b: Array[Byte], w: Int, h: Int,
      bypp: Int): Option[(Int, Int, Array[Byte])] = {
    val stride = (bypp * w + 3) / 4 * 4
    val off = i32le(b, 10)
    if (off < 0 || b.length < off + h.toLong * stride) return None
    val pal: Array[Byte] =
      if (bypp != 1) null
      else {
        val palOff = 14 + i32le(b, 14) // after the info header
        val used = if (b.length >= 50) i32le(b, 46) else 0
        val n = if (used > 0) used else 256
        if (palOff < 0 || palOff + 4L * n > b.length) return None
        java.util.Arrays.copyOfRange(b, palOff, palOff + 4 * n)
      }
    val topDown = i32le(b, 22) < 0
    val g = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      val srcRow = off + (if (topDown) y else h - 1 - y) * stride
      var x = 0
      while (x < w) {
        val o = srcRow + bypp * x
        val lum =
          if (bypp == 1) {
            val idx = 4 * (b(o) & 0xff)
            if (idx + 2 >= pal.length) return None
            (299 * (pal(idx + 2) & 0xff) + 587 * (pal(idx + 1) & 0xff) +
              114 * (pal(idx) & 0xff)) / 1000
          } else // BGR(A): alpha byte at o+3 ignored for 32bpp
            (299 * (b(o + 2) & 0xff) + 587 * (b(o + 1) & 0xff) +
              114 * (b(o) & 0xff)) / 1000
        g(y * w + x) = lum.toByte
        x += 1
      }
      y += 1
    }
    Some((w, h, g))
  }

  private def decodeGrayImpl(b: Array[Byte],
      header: MediaHeader): Option[(Int, Int, Array[Byte])] =
    Some(header).flatMap {
      case MediaHeader("bmp", w, h, ch) if ch == 1 || ch == 3 || ch == 4 =>
        bmpGray(b, w, h, ch)
      case MediaHeader("ppm", w, h, 3) =>
        pnmHeader(b).flatMap { case (_, _, off) =>
          if (b.length < off + 3L * w * h) None
          else {
            val g = new Array[Byte](w * h)
            var i = 0
            while (i < w * h) {
              val o = off + 3 * i
              val lum = (299 * (b(o) & 0xff) + 587 * (b(o + 1) & 0xff) +
                114 * (b(o + 2) & 0xff)) / 1000
              g(i) = lum.toByte
              i += 1
            }
            Some((w, h, g))
          }
        }
      case MediaHeader("pgm", w, h, 1) =>
        pnmHeader(b).flatMap { case (_, _, off) =>
          if (b.length < off + w.toLong * h) None
          else Some((w, h, java.util.Arrays.copyOfRange(b, off, off + w * h)))
        }
      case MediaHeader("jpeg", _, _, 4) => // CMYK/YCCK → BT.601 luma
        Jpeg.decodeJpegLuma4(b)
      case MediaHeader("jpeg", _, _, _) =>
        Jpeg.decodeJpegGray(b).map { case (w, h, px) => (w, h, px) }
      case MediaHeader("jpeg-prog", _, _, 4) => // progressive CMYK/YCCK
        Jpeg.decodeProgressiveLuma4(b)
      case MediaHeader("jpeg-prog", _, _, _) =>
        Jpeg.decodeProgressivePlanes(b).map { case (w, h, pl) => (w, h, pl(0)) }
      case MediaHeader("gif", _, _, _) =>
        Gif.decodeGifGray(b)
      case MediaHeader("png", _, _, _) =>
        pngPixels(b).map { case (w, h, ch, px) =>
          val g = new Array[Byte](w * h)
          var i = 0
          while (i < w * h) {
            val o = ch * i
            val lum = ch match {
              case 1 | 2 => px(o) & 0xff // gray (+alpha ignored)
              case _ => (299 * (px(o) & 0xff) + 587 * (px(o + 1) & 0xff) +
                114 * (px(o + 2) & 0xff)) / 1000
            }
            g(i) = lum.toByte
            i += 1
          }
          (w, h, g)
        }
      case MediaHeader("webp-l", _, _, _) =>
        Webp.decodeWebp(b).map { case (w, h, px) =>
          val g = new Array[Byte](w * h)
          var i = 0
          while (i < w * h) {
            val v = px(i)
            g(i) = ((299 * ((v >>> 16) & 0xff) + 587 * ((v >>> 8) & 0xff) +
              114 * (v & 0xff)) / 1000).toByte
            i += 1
          }
          (w, h, g)
        }
      case MediaHeader("webp", _, _, _) =>
        // lossy VP8 still: the decoded Y plane IS the luma (the same
        // convention as the color-JPEG path, which surfaces its Y
        // channel rather than converting to RGB and back)
        Webp.decodeWebpLossy(b).map(p => (p.w, p.h, p.y))
      case _ => None
    }

  /** Full pixel decode to TOP-LEFT-origin interleaved RGB (3 bytes
    * per pixel): native channels for BMP (BI_RGB 8-bit palette /
    * 24-bit / 32-bit, alpha ignored), binary P6, PNG
    * truecolor(+alpha, alpha ignored) and 3-component baseline JPEG
    * (fixed-point YCbCr→RGB, [[Jpeg.decodeJpegColor]]); single-
    * channel formats (P5/PGM, gray PNG/JPEG, GIF luma) replicate
    * luma across channels. */
  /** [[bmpGray]]'s RGB twin: same depth set and geometry, palette
    * indices expanded to their BGRA quad's RGB. */
  private def bmpRgb(b: Array[Byte], w: Int, h: Int,
      bypp: Int): Option[(Int, Int, Array[Byte])] = {
    val stride = (bypp * w + 3) / 4 * 4
    val off = i32le(b, 10)
    if (off < 0 || b.length < off + h.toLong * stride) return None
    val pal: Array[Byte] =
      if (bypp != 1) null
      else {
        val palOff = 14 + i32le(b, 14)
        val used = if (b.length >= 50) i32le(b, 46) else 0
        val n = if (used > 0) used else 256
        if (palOff < 0 || palOff + 4L * n > b.length) return None
        java.util.Arrays.copyOfRange(b, palOff, palOff + 4 * n)
      }
    val topDown = i32le(b, 22) < 0
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = off + (if (topDown) y else h - 1 - y) * stride
      var x = 0
      while (x < w) {
        val o = srcRow + bypp * x; val d = 3 * (y * w + x)
        if (bypp == 1) {
          val idx = 4 * (b(o) & 0xff)
          if (idx + 2 >= pal.length) return None
          rgb(d) = pal(idx + 2); rgb(d + 1) = pal(idx + 1)
          rgb(d + 2) = pal(idx)
        } else { // BGR(A): alpha ignored
          rgb(d) = b(o + 2); rgb(d + 1) = b(o + 1); rgb(d + 2) = b(o)
        }
        x += 1
      }
      y += 1
    }
    Some((w, h, rgb))
  }

  def decodeRgb(b: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    decodeHeader(b).flatMap {
      case MediaHeader("bmp", w, h, ch) if ch == 1 || ch == 3 || ch == 4 =>
        bmpRgb(b, w, h, ch)
      case MediaHeader("ppm", w, h, 3) =>
        pnmHeader(b).flatMap { case (_, _, off) =>
          if (b.length < off + 3L * w * h) None
          else Some((w, h,
            java.util.Arrays.copyOfRange(b, off, off + 3 * w * h)))
        }
      case MediaHeader("jpeg", _, _, 4) => // CMYK/YCCK via Adobe APP14
        Jpeg.decodeJpegRgb4(b)
      case MediaHeader("jpeg", _, _, _) =>
        Jpeg.decodeJpegColor(b)
      case MediaHeader("jpeg-prog", _, _, 4) => // progressive CMYK/YCCK
        Jpeg.decodeProgressiveRgb4(b)
      case MediaHeader("jpeg-prog", _, _, _) =>
        Jpeg.decodeProgressivePlanes(b).map { case (w, h, pl) =>
          val rgb = new Array[Byte](w * h * 3)
          if (pl.length == 1) {
            var i = 0
            while (i < w * h) {
              rgb(3 * i) = pl(0)(i); rgb(3 * i + 1) = pl(0)(i)
              rgb(3 * i + 2) = pl(0)(i); i += 1
            }
          } else {
            var i = 0
            while (i < w * h) {
              val y = pl(0)(i) & 0xff
              val cb = pl(1)(i) & 0xff; val cr = pl(2)(i) & 0xff
              rgb(3 * i) = Jpeg.yccToR(y, cr).toByte
              rgb(3 * i + 1) = Jpeg.yccToG(y, cb, cr).toByte
              rgb(3 * i + 2) = Jpeg.yccToB(y, cb).toByte
              i += 1
            }
          }
          (w, h, rgb)
        }
      case MediaHeader("png", _, _, _) =>
        pngPixels(b).map { case (w, h, ch, px) =>
          val rgb = new Array[Byte](w * h * 3)
          var i = 0
          while (i < w * h) {
            val o = ch * i
            ch match {
              case 1 | 2 =>
                rgb(3 * i) = px(o); rgb(3 * i + 1) = px(o); rgb(3 * i + 2) = px(o)
              case _ =>
                rgb(3 * i) = px(o); rgb(3 * i + 1) = px(o + 1)
                rgb(3 * i + 2) = px(o + 2)
            }
            i += 1
          }
          (w, h, rgb)
        }
      case MediaHeader("webp-l", _, _, _) =>
        Webp.decodeWebp(b).map { case (w, h, px) =>
          val rgb = new Array[Byte](w * h * 3)
          var i = 0
          while (i < w * h) {
            val v = px(i)
            rgb(3 * i) = ((v >>> 16) & 0xff).toByte
            rgb(3 * i + 1) = ((v >>> 8) & 0xff).toByte
            rgb(3 * i + 2) = (v & 0xff).toByte
            i += 1
          }
          (w, h, rgb)
        }
      case _ =>
        // luma-only formats (PGM, GIF): replicate across channels
        decodeGray(b).map { case (w, h, g) =>
          val rgb = new Array[Byte](w * h * 3)
          var i = 0
          while (i < w * h) {
            rgb(3 * i) = g(i); rgb(3 * i + 1) = g(i); rgb(3 * i + 2) = g(i)
            i += 1
          }
          (w, h, rgb)
        }
    }

  // ---------------------------------------------------------------- WAV

  /** Decoded audio container metadata: per-channel sample count in
    * `nSamples` (audio "frames"). */
  final case class AudioHeader(format: String, sampleRate: Int,
    channels: Int, bitsPerSample: Int, nSamples: Int)

  /** Build a real RIFF/WAVE container, PCM 16-bit little-endian.
    * `sample(ch, i)` returns the signed 16-bit value of channel `ch`
    * at frame `i`; channels interleave per the spec. */
  def encodeWav(sampleRate: Int, channels: Int, nSamples: Int,
      sample: (Int, Int) => Int): Array[Byte] = {
    val dataLen = 2 * channels * nSamples
    val b = new Array[Byte](44 + dataLen)
    def putLe32(o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
      b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
    }
    def putLe16(o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
    }
    def tag(o: Int, s: String): Unit = {
      val t = s.getBytes("US-ASCII"); System.arraycopy(t, 0, b, o, 4)
    }
    tag(0, "RIFF"); putLe32(4, 36 + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); putLe32(16, 16)
    putLe16(20, 1) // PCM
    putLe16(22, channels); putLe32(24, sampleRate)
    putLe32(28, sampleRate * 2 * channels) // byte rate
    putLe16(32, 2 * channels) // block align
    putLe16(34, 16) // bits per sample
    tag(36, "data"); putLe32(40, dataLen)
    var i = 0
    while (i < nSamples) {
      var c = 0
      while (c < channels) {
        putLe16(44 + 2 * (i * channels + c), sample(c, i))
        c += 1
      }
      i += 1
    }
    b
  }

  /** Walk RIFF chunks to the named one; skips unknown chunks (LIST,
    * fact, …) honoring the spec's even-byte chunk padding. Returns
    * (payload offset, declared length) clamped to the buffer. */
  private def riffChunk(b: Array[Byte], name: String): Option[(Int, Int)] = {
    var o = 12
    while (o + 8 <= b.length) {
      val tag = new String(b, o, 4, "US-ASCII")
      val len = i32le(b, o + 4)
      if (len < 0) return None
      if (tag == name)
        return Some((o + 8, math.min(len, b.length - o - 8)))
      o += 8 + len + (len & 1)
    }
    None
  }

  /** Parse a RIFF/WAVE header: PCM (tag 1, 8/16-bit), G.711 A-law
    * (tag 6) / µ-law (tag 7, 8-bit), or IMA ADPCM (tag 0x11, 4-bit).
    * nSamples derives from the data chunk length / block align; for
    * ADPCM the `fact` chunk's sample-frame count wins when present
    * (the spec's contract for compressed formats), else full blocks
    * × samplesPerBlock. */
  def decodeWavHeader(b: Array[Byte]): Option[AudioHeader] = {
    if (b.length < 44 || new String(b, 0, 4, "US-ASCII") != "RIFF" ||
        new String(b, 8, 4, "US-ASCII") != "WAVE") return None
    riffChunk(b, "fmt ").flatMap { case (fo, fl) =>
      val tag = if (fl >= 16) u16le(b, fo) else -1
      val ch = u16le(b, fo + 2)
      val sr = i32le(b, fo + 4)
      val bits = u16le(b, fo + 14)
      if (fl < 16 || ch <= 0) None
      else tag match {
        case 1 if bits == 8 || bits == 16 =>
          riffChunk(b, "data").map { case (_, dl) =>
            AudioHeader("wav", sr, ch, bits, dl / (ch * bits / 8))
          }
        case 6 | 7 if bits == 8 =>
          riffChunk(b, "data").map { case (_, dl) =>
            AudioHeader(if (tag == 6) "wav-alaw" else "wav-mulaw",
              sr, ch, 8, dl / ch)
          }
        case 0x11 if bits == 4 && fl >= 20 =>
          val blockAlign = u16le(b, fo + 12)
          val spb = u16le(b, fo + 18)
          // A block must hold the 4-byte per-channel state header plus
          // the nibble payload in the spec's 4-byte-per-channel word
          // interleave (ceil((spb-1)/8) groups of 4*ch bytes). A header
          // advertising less would send decodeWavMix's nibble reads past
          // the data chunk — reject it like any other malformed header.
          val minAlign = 4 * ch + ((spb - 1 + 7) / 8) * 4 * ch
          if (blockAlign <= 0 || spb <= 0 || blockAlign < minAlign) None
          else riffChunk(b, "data").map { case (_, dl) =>
            val fromBlocks = (dl / blockAlign) * spb
            val n = riffChunk(b, "fact")
              .filter(_._2 >= 4).map { case (o, _) => i32le(b, o) }
              .getOrElse(fromBlocks)
            AudioHeader("wav-adpcm", sr, ch, 4, math.min(n, fromBlocks))
          }
        case _ => None
      }
    }
  }

  // ------------------------------------------------- G.711 + IMA ADPCM

  private val MulawBias = 0x84

  /** G.711 µ-law decode, the CCITT reference arithmetic (public
    * g711.c shape): complement, mantissa/exponent expand, re-bias. */
  def mulawDecode(code: Int): Int = {
    val u = ~code & 0xff
    val t = (((u & 0x0f) << 3) + MulawBias) << ((u & 0x70) >> 4)
    if ((u & 0x80) != 0) MulawBias - t else t - MulawBias
  }

  /** G.711 µ-law encode (clip 32635, bias, priority-encode the
    * exponent, complement). `mulawEncode(mulawDecode(c)) == c` for
    * every code EXCEPT 0x7f: µ-law has two zeros (0x7f and 0xff both
    * decode to 0) and encode canonicalizes 0 to 0xff, so 0x7f
    * collapses. The decode-side identity
    * `mulawDecode(mulawEncode(s))` quantizes per the segment table. */
  def mulawEncode(sample: Int): Int = {
    var s = sample
    val sign = if (s < 0) { s = -s; 0x80 } else 0
    if (s > 32635) s = 32635
    s += MulawBias
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (s & mask) == 0) { exp -= 1; mask >>= 1 }
    ~(sign | (exp << 4) | ((s >> (exp + 3)) & 0x0f)) & 0xff
  }

  /** G.711 A-law decode (even-bit inversion, segment expand; segment
    * 0 is linear with half-step offset 8). */
  def alawDecode(code: Int): Int = {
    val a = code ^ 0x55
    val mant = a & 0x0f
    val seg = (a & 0x70) >> 4
    val t =
      if (seg == 0) (mant << 4) + 8
      else ((mant << 4) + 0x108) << (seg - 1)
    if ((a & 0x80) != 0) t else -t
  }

  /** G.711 A-law encode (13-bit domain per the spec; sign convention:
    * bit 7 SET = non-negative). Round-trips [[alawDecode]]. */
  def alawEncode(sample: Int): Int = {
    var p = sample >> 3
    val mask = if (p >= 0) 0xd5 else { p = -p - 1; 0x55 }
    var seg = 0
    while (seg < 8 && p > ((0x1f << seg) | ((1 << seg) - 1))) seg += 1
    if (seg >= 8) 0x7f ^ mask
    else {
      val mant = if (seg < 2) (p >> 1) & 0x0f else (p >> seg) & 0x0f
      ((seg << 4) | mant) ^ mask
    }
  }

  /** IMA ADPCM step-size table (89 entries) and index-advance table —
    * the public IMA/DVI4 constants. */
  val imaStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767)
  val imaIndexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** One IMA ADPCM nibble through the predictor: returns the new
    * (clamped) predicted sample and step index. The `(step>>3) +
    * conditional halves` form is the bit-exact integer recurrence —
    * NOT the `(2·mag+1)·step/8` approximation. */
  def imaDecodeNibble(nib: Int, pred: Int, idx: Int): (Int, Int) = {
    val step = imaStepTable(idx)
    var diff = step >> 3
    if ((nib & 4) != 0) diff += step
    if ((nib & 2) != 0) diff += step >> 1
    if ((nib & 1) != 0) diff += step >> 2
    val p = if ((nib & 8) != 0) pred - diff else pred + diff
    (math.max(-32768, math.min(32767, p)),
      math.max(0, math.min(88, idx + imaIndexTable(nib))))
  }

  /** Encode one sample against the predictor state: returns (nibble,
    * new predictor, new index) with the predictor advanced through
    * [[imaDecodeNibble]] so encoder and decoder states never drift. */
  def imaEncodeSample(s: Int, pred: Int, idx: Int): (Int, Int, Int) = {
    val step = imaStepTable(idx)
    var delta = s - pred
    var nib = 0
    if (delta < 0) { nib = 8; delta = -delta }
    if (delta >= step) { nib |= 4; delta -= step }
    if (delta >= (step >> 1)) { nib |= 2; delta -= step >> 1 }
    if (delta >= (step >> 2)) nib |= 1
    val (p, ni) = imaDecodeNibble(nib, pred, idx)
    (nib, p, ni)
  }

  /** Build a RIFF/WAVE container with G.711-compressed payload:
    * format tag 6 (A-law) or 7 (µ-law), 8 bits/sample, one code byte
    * per channel-sample. `code(ch, i)` returns the RAW 0..255 G.711
    * code — callers encoding linear audio compose with
    * [[mulawEncode]]/[[alawEncode]]; fixture mints hand the codes
    * directly so an oracle can restate them in closed form. */
  def encodeWavG711(sampleRate: Int, channels: Int, nSamples: Int,
      alaw: Boolean, code: (Int, Int) => Int): Array[Byte] = {
    val dataLen = channels * nSamples
    val b = new Array[Byte](46 + dataLen)
    def putLe32(o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
      b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
    }
    def putLe16(o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
    }
    def tag(o: Int, s: String): Unit = {
      val t = s.getBytes("US-ASCII"); System.arraycopy(t, 0, b, o, 4)
    }
    tag(0, "RIFF"); putLe32(4, 38 + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); putLe32(16, 18)
    putLe16(20, if (alaw) 6 else 7)
    putLe16(22, channels); putLe32(24, sampleRate)
    putLe32(28, sampleRate * channels) // byte rate: 1 B/sample
    putLe16(32, channels) // block align
    putLe16(34, 8) // bits per sample
    putLe16(36, 0) // cbSize
    tag(38, "data"); putLe32(42, dataLen)
    var i = 0
    while (i < nSamples) {
      var c = 0
      while (c < channels) {
        b(46 + i * channels + c) = (code(c, i) & 0xff).toByte
        c += 1
      }
      i += 1
    }
    b
  }

  /** Build a RIFF/WAVE IMA ADPCM container (format tag 0x11): blocks
    * of `spb` samples per channel — a 4-byte per-channel header
    * (predictor = the block's first sample, step index, reserved)
    * then nibble data in the spec's 4-byte-per-channel interleave
    * (8 samples per group). Requires `(spb-1) % 8 == 0` and
    * `nSamples % spb == 0` (whole blocks — the fixture contract; a
    * general encoder would pad the tail). `sample(ch, i)` is signed
    * 16-bit linear; `index0` seeds the first block's step index
    * (clamped), later blocks carry the running index. A `fact` chunk
    * records the true frame count per the spec. */
  def encodeWavImaAdpcm(sampleRate: Int, channels: Int, nSamples: Int,
      spb: Int, index0: Int, sample: (Int, Int) => Int): Array[Byte] = {
    require(spb >= 9 && (spb - 1) % 8 == 0, s"spb 1+8k required: $spb")
    require(nSamples % spb == 0, s"whole blocks required: $nSamples/$spb")
    val blockAlign = 4 * channels + (spb - 1) / 2 * channels
    val nBlocks = nSamples / spb
    val dataLen = nBlocks * blockAlign
    val b = new Array[Byte](60 + dataLen)
    def putLe32(o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
      b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
    }
    def putLe16(o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
    }
    def tag(o: Int, s: String): Unit = {
      val t = s.getBytes("US-ASCII"); System.arraycopy(t, 0, b, o, 4)
    }
    tag(0, "RIFF"); putLe32(4, 52 + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); putLe32(16, 20)
    putLe16(20, 0x11)
    putLe16(22, channels); putLe32(24, sampleRate)
    putLe32(28, sampleRate * blockAlign / spb) // nominal byte rate
    putLe16(32, blockAlign)
    putLe16(34, 4) // bits per sample
    putLe16(36, 2) // cbSize
    putLe16(38, spb)
    tag(40, "fact"); putLe32(44, 4); putLe32(48, nSamples)
    tag(52, "data"); putLe32(56, dataLen)
    val pred = new Array[Int](channels)
    val idx = Array.fill(channels)(math.max(0, math.min(88, index0)))
    var blk = 0
    while (blk < nBlocks) {
      val base = blk * spb
      val bo = 60 + blk * blockAlign
      var c = 0
      while (c < channels) {
        pred(c) = sample(c, base)
        putLe16(bo + 4 * c, pred(c))
        b(bo + 4 * c + 2) = idx(c).toByte
        b(bo + 4 * c + 3) = 0
        c += 1
      }
      var g = 0
      while (g < (spb - 1) / 8) {
        c = 0
        while (c < channels) {
          val wo = bo + 4 * channels + (g * channels + c) * 4
          var j = 0
          while (j < 8) {
            val (nib, p, ni) =
              imaEncodeSample(sample(c, base + 1 + g * 8 + j), pred(c), idx(c))
            pred(c) = p; idx(c) = ni
            val o = wo + j / 2
            if ((j & 1) == 0) b(o) = nib.toByte // low nibble first
            else b(o) = (b(o) | (nib << 4)).toByte
            j += 1
          }
          c += 1
        }
        g += 1
      }
      blk += 1
    }
    b
  }

  /** Decode frames to per-frame CHANNEL-SUM values (the integer mono
    * mixdown: Σ over channels, no division so the math is exact in
    * any reimplementation). PCM 16-bit LE signed / 8-bit unsigned
    * (rebased around 128 per the WAV convention), G.711 µ-law/A-law
    * expanded through the CCITT tables, IMA ADPCM through the
    * per-block predictor recurrence. */
  def decodeWavMix(b: Array[Byte]): Option[(AudioHeader, Array[Int])] =
    decodeWavHeader(b).flatMap { h =>
      riffChunk(b, "data").map { case (off, dl) =>
        val out = new Array[Int](h.nSamples)
        h.format match {
          case "wav" =>
            var i = 0
            while (i < h.nSamples) {
              var s = 0; var c = 0
              while (c < h.channels) {
                if (h.bitsPerSample == 16) {
                  val o = off + 2 * (i * h.channels + c)
                  s += (u16le(b, o) << 16) >> 16 // sign-extend
                } else
                  s += (b(off + i * h.channels + c) & 0xff) - 128
                c += 1
              }
              out(i) = s
              i += 1
            }
          case "wav-mulaw" | "wav-alaw" =>
            val alaw = h.format == "wav-alaw"
            var i = 0
            while (i < h.nSamples) {
              var s = 0; var c = 0
              while (c < h.channels) {
                val code = b(off + i * h.channels + c) & 0xff
                s += (if (alaw) alawDecode(code) else mulawDecode(code))
                c += 1
              }
              out(i) = s
              i += 1
            }
          case "wav-adpcm" =>
            val (fo, _) = riffChunk(b, "fmt ").get
            val blockAlign = u16le(b, fo + 12)
            val spb = u16le(b, fo + 18)
            val ch = h.channels
            val pred = new Array[Int](ch)
            val idx = new Array[Int](ch)
            var filled = 0
            var bo = off
            while (filled < h.nSamples && bo + blockAlign <= off + dl) {
              var c = 0
              var s0 = 0
              while (c < ch) {
                pred(c) = (u16le(b, bo + 4 * c) << 16) >> 16
                idx(c) = math.max(0, math.min(88, b(bo + 4 * c + 2) & 0xff))
                s0 += pred(c)
                c += 1
              }
              out(filled) = s0 // block sample 0 IS the header predictor
              filled += 1
              var g = 0
              while (g < (spb - 1 + 7) / 8 && filled < h.nSamples) {
                val frames = math.min(8, spb - 1 - g * 8)
                c = 0
                while (c < ch) {
                  val wo = bo + 4 * ch + (g * ch + c) * 4
                  var j = 0
                  while (j < frames) {
                    val byte = b(wo + j / 2) & 0xff
                    val nib = if ((j & 1) == 0) byte & 0x0f else byte >> 4
                    val (p, ni) = imaDecodeNibble(nib, pred(c), idx(c))
                    pred(c) = p; idx(c) = ni
                    if (filled + j < h.nSamples) out(filled + j) += p
                    j += 1
                  }
                  c += 1
                }
                filled = math.min(h.nSamples, filled + frames)
                g += 1
              }
              bo += blockAlign
            }
        }
        (h, out)
      }
    }

  /** MONO IMA ADPCM container with caller-supplied RAW block contents:
    * per block `b`, header predictor `pred0(b)`, step index
    * `index0(b)`, and nibble stream `nib(b, j)` for `j ∈ [0, spb-1)`.
    * The closed-form-fixture twin of [[encodeWavImaAdpcm]]: an oracle
    * can restate the exact bytes and replay only the DECODE
    * recurrence, never the encoder's argmin. */
  def encodeWavImaAdpcmRaw(sampleRate: Int, nSamples: Int, spb: Int,
      pred0: Int => Int, index0: Int => Int,
      nib: (Int, Int) => Int): Array[Byte] = {
    require(spb >= 9 && (spb - 1) % 8 == 0, s"spb 1+8k required: $spb")
    require(nSamples % spb == 0, s"whole blocks required: $nSamples/$spb")
    val nBlocks = nSamples / spb
    val shaped = encodeWavImaAdpcm(sampleRate, 1, nSamples, spb, 0,
      (_, i) => pred0(i / spb))
    // overwrite each block's index byte + nibble payload with the raw
    // closed-form streams (the shape pass above wrote headers/sizes)
    val blockAlign = 4 + (spb - 1) / 2
    var b2 = 0
    while (b2 < nBlocks) {
      val bo = 60 + b2 * blockAlign
      shaped(bo + 2) = math.max(0, math.min(88, index0(b2))).toByte
      var j = 0
      while (j < spb - 1) {
        val o = bo + 4 + j / 2
        val v = nib(b2, j) & 0x0f
        if ((j & 1) == 0) shaped(o) = v.toByte
        else shaped(o) = ((shaped(o) & 0x0f) | (v << 4)).toByte
        j += 1
      }
      b2 += 1
    }
    shaped
  }

  // ---------------------------------------------------------------- Y4M

  /** Decoded video container metadata (YUV4MPEG2). */
  final case class VideoHeader(format: String, width: Int, height: Int,
    fpsNum: Int, fpsDen: Int, colorspace: String, nFrames: Int,
    firstFrameOff: Int, frameBytes: Int)

  /** Chroma plane bytes per frame for a Y4M colorspace tag. */
  private def chromaBytes(cs: String, w: Int, h: Int): Option[Int] =
    if (cs.startsWith("420")) Some(2 * ((w / 2) * (h / 2)))
    else if (cs.startsWith("422")) Some(2 * ((w / 2) * h))
    else if (cs.startsWith("444")) Some(2 * (w * h))
    else if (cs == "mono") Some(0)
    else None

  /** Build a real YUV4MPEG2 stream: ASCII stream header with W/H/F
    * tags, then per frame a `FRAME\n` marker + planar Y, U, V
    * (C420jpeg chroma siting; w and h must be even). `y(f, x, yy)`,
    * `u(f, x, yy)`, `v(f, x, yy)` give plane bytes (chroma planes
    * indexed over the w/2 × h/2 grid). */
  def encodeY4m(w: Int, h: Int, fpsNum: Int, fpsDen: Int, frames: Int,
      y: (Int, Int, Int) => Int, u: (Int, Int, Int) => Int,
      v: (Int, Int, Int) => Int): Array[Byte] = {
    val header =
      s"YUV4MPEG2 W$w H$h F$fpsNum:$fpsDen Ip A1:1 C420jpeg\n"
        .getBytes("US-ASCII")
    val cw = w / 2; val chh = h / 2
    val frameBytes = 6 + w * h + 2 * cw * chh
    val b = new Array[Byte](header.length + frames * frameBytes)
    System.arraycopy(header, 0, b, 0, header.length)
    var f = 0
    while (f < frames) {
      var o = header.length + f * frameBytes
      val marker = "FRAME\n".getBytes("US-ASCII")
      System.arraycopy(marker, 0, b, o, 6); o += 6
      var yy = 0
      while (yy < h) {
        var x = 0
        while (x < w) { b(o) = y(f, x, yy).toByte; o += 1; x += 1 }
        yy += 1
      }
      yy = 0
      while (yy < chh) {
        var x = 0
        while (x < cw) { b(o) = u(f, x, yy).toByte; o += 1; x += 1 }
        yy += 1
      }
      yy = 0
      while (yy < chh) {
        var x = 0
        while (x < cw) { b(o) = v(f, x, yy).toByte; o += 1; x += 1 }
        yy += 1
      }
      f += 1
    }
    b
  }

  /** Parse a YUV4MPEG2 stream header and count its frames. Tolerant
    * tag walk (order-free, unknown tags skipped); frame count comes
    * from the byte length against the per-frame plane size, with each
    * FRAME marker's presence verified (a stride bug would desync the
    * markers and fail the parse, not silently misread). */
  def decodeY4mHeader(b: Array[Byte]): Option[VideoHeader] = {
    val magic = "YUV4MPEG2"
    if (b.length < magic.length ||
        new String(b, 0, magic.length, "US-ASCII") != magic) return None
    var eol = magic.length
    while (eol < b.length && b(eol) != '\n') eol += 1
    if (eol >= b.length) return None
    val tags = new String(b, magic.length, eol - magic.length, "US-ASCII")
      .trim.split("\\s+").filter(_.nonEmpty)
    var w = -1; var h = -1; var fn = 30; var fd = 1; var cs = "420jpeg"
    tags.foreach { t =>
      t.charAt(0) match {
        case 'W' => w = t.drop(1).toInt
        case 'H' => h = t.drop(1).toInt
        case 'F' =>
          val p = t.drop(1).split(":")
          if (p.length == 2) { fn = p(0).toInt; fd = p(1).toInt }
        case 'C' => cs = t.drop(1)
        case _   => // Ip, A1:1, Xmeta — irrelevant here
      }
    }
    if (w <= 0 || h <= 0) return None
    chromaBytes(cs, w, h).flatMap { cb =>
      val frameBytes = 6 + w * h + cb
      val avail = b.length - (eol + 1)
      val n = avail / frameBytes
      // verify every FRAME marker lines up
      var f = 0
      while (f < n) {
        val o = eol + 1 + f * frameBytes
        if (new String(b, o, 5, "US-ASCII") != "FRAME") return None
        f += 1
      }
      Some(VideoHeader("y4m", w, h, fn, fd, cs, n, eol + 1, frameBytes))
    }
  }

  /** Extract one frame's REAL luma plane (w×h bytes, top-left
    * origin). */
  def y4mFrameLuma(b: Array[Byte], hdr: VideoHeader,
      frame: Int): Option[Array[Byte]] =
    if (frame < 0 || frame >= hdr.nFrames) None
    else {
      val o = hdr.firstFrameOff + frame * hdr.frameBytes + 6
      Some(java.util.Arrays.copyOfRange(b, o, o + hdr.width * hdr.height))
    }

  /** Nearest-neighbor resample of a gray plane to outW×outH: source
    * coordinate = floor(dst * src / out) — exact integer math in both
    * directions (up- and downscale), so any reimplementation lands on
    * identical bytes. */
  def resizeNearest(g: Array[Byte], w: Int, h: Int, outW: Int,
      outH: Int): Array[Byte] = {
    val out = new Array[Byte](outW * outH)
    var y = 0
    while (y < outH) {
      val sy = y * h / outH
      var x = 0
      while (x < outW) {
        out(y * outW + x) = g(sy * w + x * w / outW)
        x += 1
      }
      y += 1
    }
    out
  }
  /** One parsed WARC record: type, target URI (null where the record
    * type carries none, e.g. warcinfo), declared content length, and
    * the exact payload bytes. */
  final case class WarcRecord(warcType: String, targetUri: String,
    contentLength: Long, payload: Array[Byte])

  /** Decompress a (possibly multi-member) gzip stream — the
    * `.warc.gz` wire format is one gzip member PER RECORD,
    * concatenated, and java.util.zip.GZIPInputStream consumes
    * concatenated members natively. None on corrupt/truncated
    * streams (quarantine contract, not an exception). */
  def gunzipAll(b: Array[Byte]): Option[Array[Byte]] =
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      in.close()
      Some(out.toByteArray)
    } catch { case _: java.io.IOException => None }

  /** True when the payload starts with the gzip magic (1f 8b). */
  def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** Gzip one byte array as a single member (fixture-side helper for
    * building per-record-member `.warc.gz` containers). */
  def gzipBytes(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(b); gz.close()
    bos.toByteArray
  }

  /** Encode records as a WARC/1.0 container (ISO 28500, public):
    * version line, CRLF header block, Content-Length-delimited
    * payload, double-CRLF record terminator. The fixture-side
    * encoder, like the PNG/BMP/WAV encoders above. */
  def encodeWarc(records: Seq[(Map[String, String], Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { case (headers, payload) =>
      val sb = new StringBuilder("WARC/1.0\r\n")
      headers.foreach { case (k, v) => sb.append(s"$k: $v\r\n") }
      sb.append(s"Content-Length: ${payload.length}\r\n\r\n")
      out.write(sb.toString.getBytes("UTF-8"))
      out.write(payload)
      out.write("\r\n\r\n".getBytes("UTF-8"))
    }
    out.toByteArray
  }

  /** Parse a WARC/1.0 container. Length-delimited by contract: the
    * payload is read as exactly Content-Length bytes, so payloads
    * containing "WARC/1.0" text can never desynchronize the walk
    * (spec-pinned). Header names are case-insensitive per ISO 28500;
    * unknown headers are skipped. Returns None on a malformed
    * container (bad version line, missing Content-Length, truncated
    * payload) — the quarantine contract, not an exception. */
  def parseWarc(b: Array[Byte]): Option[Seq[WarcRecord]] = {
    val recs = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var p = 0
    def line(): String = {
      val start = p
      while (p + 1 < b.length && !(b(p) == '\r' && b(p + 1) == '\n')) p += 1
      if (p + 1 >= b.length) return null
      val s = new String(b, start, p - start, "UTF-8")
      p += 2
      s
    }
    while (p < b.length) {
      val v = line()
      if (v == null || !v.startsWith("WARC/")) return None
      var wtype: String = null; var uri: String = null; var clen = -1L
      var h = line()
      while (h != null && h.nonEmpty) {
        val i = h.indexOf(':')
        if (i > 0) {
          val k = h.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT)
          val value = h.substring(i + 1).trim
          k match {
            case "warc-type" => wtype = value
            case "warc-target-uri" => uri = value
            case "content-length" =>
              clen = try value.toLong catch { case _: NumberFormatException => -1L }
            case _ => ()
          }
        }
        h = line()
      }
      if (h == null || clen < 0 || p + clen > b.length) return None
      val payload = java.util.Arrays.copyOfRange(b, p, p + clen.toInt)
      p += clen.toInt
      // record terminator CRLF CRLF
      if (p + 4 > b.length || b(p) != '\r' || b(p + 1) != '\n' ||
          b(p + 2) != '\r' || b(p + 3) != '\n') return None
      p += 4
      recs += WarcRecord(if (wtype == null) "unknown" else wtype, uri,
        clen, payload)
    }
    Some(recs.toSeq)
  }
}
