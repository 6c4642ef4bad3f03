package graft.functions

/** Lib-free image-container header codec: parse (and, for fixtures,
  * emit) the self-describing headers of PNG, GIF and BMP — the three
  * common raster formats whose dimensions live in a fixed-offset header
  * that pure byte arithmetic can read without any media library. This is
  * the real decode step behind q_mm_decode (the container ships no image
  * codecs, so pixel decoding stays out of scope; width/height/format
  * extraction — the metadata a training-data pipeline filters on — is
  * genuine).
  *
  * Formats (public specs):
  *  - PNG: 8-byte signature `89 50 4E 47 0D 0A 1A 0A`, then the IHDR
  *    chunk: 4-byte big-endian length (13), "IHDR", width/height as
  *    big-endian u32 at offsets 16/20, then bit depth etc + CRC32.
  *  - GIF: "GIF87a"/"GIF89a", logical-screen width/height as
  *    little-endian u16 at offsets 6/8.
  *  - BMP: "BM", BITMAPINFOHEADER width at offset 18 / height at 22 as
  *    little-endian i32 (height may be negative for top-down rows).
  */
object ImageHeader {

  final case class Meta(format: String, width: Int, height: Int)

  private val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  /** Parse the header; None when the bytes are not a recognizable
    * PNG/GIF/BMP (callers surface those rows as format `raw`). */
  def parse(b: Array[Byte]): Option[Meta] = {
    if (b.length >= 24 && b.take(8).sameElements(pngSig) &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some(Meta("png", beU32(b, 16), beU32(b, 20)))
    else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      Some(Meta("gif", leU16(b, 6), leU16(b, 8)))
    else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
      Some(Meta("bmp", leI32(b, 18), math.abs(leI32(b, 22))))
    else None
  }

  private def beU32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  private def leU16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def leI32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  // ------------------------------------------------------------ encoders
  // Spec-correct header emitters (PNG includes the real IHDR CRC32) used
  // to synthesize payloads in q_mm_decode and the golden fixtures.

  /** PNG signature + complete IHDR chunk (33 bytes): 8-bit RGB. */
  def png(w: Int, h: Int): Array[Byte] = {
    val ihdr = new Array[Byte](17) // "IHDR" + 13 data bytes
    "IHDR".getBytes("US-ASCII").copyToArray(ihdr)
    putBeU32(ihdr, 4, w); putBeU32(ihdr, 8, h)
    ihdr(12) = 8; ihdr(13) = 2 // bit depth 8, color type truecolor
    val crc = new java.util.zip.CRC32()
    crc.update(ihdr)
    val out = new Array[Byte](8 + 4 + 17 + 4)
    pngSig.copyToArray(out)
    putBeU32(out, 8, 13) // IHDR data length
    ihdr.copyToArray(out, 12)
    putBeU32(out, 29, crc.getValue.toInt)
    out
  }

  /** GIF89a header + logical screen descriptor (13 bytes). */
  def gif(w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](13)
    "GIF89a".getBytes("US-ASCII").copyToArray(out)
    putLeU16(out, 6, w); putLeU16(out, 8, h)
    out
  }

  /** BMP file header + BITMAPINFOHEADER (54 bytes), 24-bit. */
  def bmp(w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](54)
    out(0) = 'B'; out(1) = 'M'
    putLeU32(out, 2, 54) // file size: header-only payload
    putLeU32(out, 10, 54) // pixel-data offset
    putLeU32(out, 14, 40) // info-header size
    putLeU32(out, 18, w); putLeU32(out, 22, h)
    putLeU16(out, 26, 1) // planes
    putLeU16(out, 28, 24) // bpp
    out
  }

  // ------------------------------------------------- GIF frame walking
  // An animated GIF is a block stream after the 13-byte header: `0x2C`
  // image descriptors (frame left/top/width/height as LE u16), `0x21`
  // extensions (label + length-prefixed sub-blocks), `0x3B` trailer.
  // Walking it needs only the spec — the real frame-sampling primitive.

  final case class Frame(index: Int, width: Int, height: Int)

  /** Walk a GIF's block stream and return every frame's descriptor
    * (empty for non-GIF bytes or a truncated stream). */
  def gifFrames(b: Array[Byte]): Seq[Frame] = {
    if (b.length < 13 || !(b(0) == 'G' && b(1) == 'I' && b(2) == 'F'))
      return Nil
    val frames = Seq.newBuilder[Frame]
    var pos = 13 // header + logical screen descriptor, no global color table
    var idx = 0
    def skipSubBlocks(from: Int): Int = {
      var p = from
      while (p < b.length && b(p) != 0) p += (b(p) & 0xff) + 1
      p + 1 // past the 0 terminator
    }
    while (pos < b.length) {
      (b(pos) & 0xff) match {
        case 0x2c => // image descriptor: sep + left/top/w/h + flags
          if (pos + 10 > b.length) return frames.result()
          frames += Frame(idx, leU16(b, pos + 5), leU16(b, pos + 7))
          idx += 1
          pos = skipSubBlocks(pos + 10 + 1) // + LZW min-code byte
        case 0x21 => // extension: introducer + label, then sub-blocks
          pos = skipSubBlocks(pos + 2)
        case 0x3b => return frames.result() // trailer
        case _ => return frames.result() // unknown block: stop cleanly
      }
    }
    frames.result()
  }

  /** Spec-correct animated GIF: header + one image descriptor per frame
    * (each with a 1-sub-block LZW payload whose bytes derive from the
    * frame index) + trailer. */
  def animatedGif(w: Int, h: Int, frames: Seq[(Int, Int)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(gif(w, h))
    frames.zipWithIndex.foreach { case ((fw, fh), i) =>
      val d = new Array[Byte](10)
      d(0) = 0x2c
      putLeU16(d, 5, fw); putLeU16(d, 7, fh)
      out.write(d)
      out.write(2) // LZW minimum code size
      out.write(4) // one sub-block of 4 data bytes
      out.write(Array[Byte](i.toByte, (fw & 0xff).toByte,
        (fh & 0xff).toByte, 0x01))
      out.write(0) // sub-block terminator
    }
    out.write(0x3b)
    out.toByteArray
  }

  // ------------------------------------------------- BMP pixel codec
  // 24-bpp uncompressed BMP is the one raster format whose PIXELS are
  // decodable with pure byte arithmetic (no entropy coding): rows are
  // stored bottom-up (top-down when height is negative) with each row
  // padded to a 4-byte boundary, pixel order B,G,R. This is the real
  // pixel-level decode behind q_mm_phash.

  /** Emit a complete grayscale 24-bpp BMP; `gray(x, y)` gives the level
    * (0-255) at top-down coordinates. */
  def bmpPixels(w: Int, h: Int, gray: (Int, Int) => Int): Array[Byte] = {
    val stride = (w * 3 + 3) & ~3
    val out = new Array[Byte](54 + stride * h)
    bmp(w, h).copyToArray(out)
    putLeU32(out, 2, out.length) // real file size
    var y = 0
    while (y < h) {
      val rowOff = 54 + (h - 1 - y) * stride // bottom-up on disk
      var x = 0
      while (x < w) {
        val g = (math.max(0, math.min(255, gray(x, y)))).toByte
        val o = rowOff + x * 3
        out(o) = g; out(o + 1) = g; out(o + 2) = g
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode a 24-bpp BMP to a top-down grayscale matrix [y][x],
    * honoring bfOffBits, row direction, and the 4-byte row stride.
    * None for non-BMP/unsupported-bpp/truncated payloads. */
  def bmpGray(b: Array[Byte]): Option[Array[Array[Int]]] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val off = leI32(b, 10)
    val w = leI32(b, 18)
    val hRaw = leI32(b, 22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    if (leU16(b, 28) != 24 || w <= 0 || h == 0) return None
    // Stride in LONG: a crafted width near Int.MaxValue/3 overflows
    // w*3 in Int to a tiny positive stride, sneaking past the bounds
    // check into a huge tabulate + wild offsets. A valid pixel array
    // can never be smaller than one unpadded row, so reject first.
    if (w.toLong * 3 > b.length) return None
    val strideL = (w.toLong * 3 + 3) & ~3L
    if (off < 54 || off.toLong + strideL * h > b.length) return None
    val stride = strideL.toInt // ≤ b.length - off after the check above
    Some(Array.tabulate(h, w) { (y, x) =>
      val row = if (topDown) y else h - 1 - y
      val o = off + row * stride + x * 3
      ((b(o) & 0xff) + (b(o + 1) & 0xff) + (b(o + 2) & 0xff)) / 3
    })
  }

  /** 64-bit difference hash (dHash): block-average the grayscale image
    * to a 9×8 grid, bit (row*8+col) set iff cell(col) > cell(col+1) in
    * that row. Gradient-based, so it is invariant to uniform brightness
    * shifts and robust to small local edits — hamming distance between
    * dhashes is the standard image near-dup signal. */
  def dhash64(g: Array[Array[Int]]): Long = {
    val h = g.length
    val w = g(0).length
    def cell(cx: Int, cy: Int): Double = {
      val x0 = cx * w / 9; val x1 = math.max((cx + 1) * w / 9, x0 + 1)
      val y0 = cy * h / 8; val y1 = math.max((cy + 1) * h / 8, y0 + 1)
      var s = 0.0; var n = 0
      var y = y0
      while (y < y1 && y < h) {
        var x = x0
        while (x < x1 && x < w) { s += g(y)(x); n += 1; x += 1 }
        y += 1
      }
      s / n
    }
    var bits = 0L
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        if (cell(cx, cy) > cell(cx + 1, cy)) bits |= 1L << (cy * 8 + cx)
        cx += 1
      }
      cy += 1
    }
    bits
  }

  private def putBeU32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v >>> 24).toByte; b(o + 1) = (v >>> 16).toByte
    b(o + 2) = (v >>> 8).toByte; b(o + 3) = v.toByte
  }

  private def putLeU16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = v.toByte; b(o + 1) = (v >>> 8).toByte
  }

  private[graft] def putLeU32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = v.toByte; b(o + 1) = (v >>> 8).toByte
    b(o + 2) = (v >>> 16).toByte; b(o + 3) = (v >>> 24).toByte
  }
}
