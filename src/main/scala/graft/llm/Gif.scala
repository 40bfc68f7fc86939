package graft.llm

import scala.collection.mutable.ArrayBuffer

/** GIF (GIF89a) encode/decode from scratch — the LZW compression family
  * under the hash-exact gate, beside zlib/DEFLATE (PNG), DCT (JPEG), and
  * ADPCM (audio). GIF is LOSSLESS (palette-indexed rasters), so unlike
  * JPEG the full decode∘encode identity sits under the DuckDB oracle.
  *
  * Structures per GIF89a (public spec, CompuServe 1990): header + logical
  * screen descriptor + global color table, image descriptor, LZW-compressed
  * index stream in ≤255-byte sub-blocks, trailer. The LZW variant is the
  * GIF one: variable code width starting at minCodeSize+1, LSB-first bit
  * packing, CLEAR/EOI codes, dictionary reset at 4096 entries.
  *
  * The encoder is pinned to the REAL standard by a JDK `ImageIO` parity
  * spec (javax.imageio ships a GIF reader); the decoder is then pinned
  * against both the encoder and ImageIO on rasters that cross every code
  * width (9→12 bits) and the dictionary-reset boundary.
  */
object Gif {

  /** Decoded GIF: palette-indexed raster + RGB palette (0xRRGGBB). */
  final case class GifImage(width: Int, height: Int,
                            indices: Array[Byte], palette: Array[Int]) {
    def rgb(p: Int): Int = palette(indices(p) & 0xFF)
  }

  // ---- encoder ----------------------------------------------------------

  /** Encode a 256-color palette-indexed raster as a real GIF89a stream. */
  def encode(width: Int, height: Int, palette: Array[Int],
             idx: (Int, Int) => Int): Array[Byte] =
    encodeAnimated(width, height, 1, palette, _ => idx)

  /** Encode an ANIMATED GIF89a: `nFrames` full frames over one global
    * palette (each with its own image descriptor + LZW stream — the
    * frame-table shape the clip gates sample).
    */
  def encodeAnimated(width: Int, height: Int, nFrames: Int,
                     palette: Array[Int],
                     idx: Int => (Int, Int) => Int): Array[Byte] = {
    require(palette.length == 256, "encoder emits a 256-entry global table")
    require(nFrames >= 1, s"nFrames must be >= 1, got $nFrames")
    val out = new ArrayBuffer[Byte](nFrames * width * height / 2 + 800)
    def u8(v: Int): Unit = out += (v & 0xFF).toByte
    def le16(v: Int): Unit = { u8(v); u8(v >> 8) }
    "GIF89a".foreach(c => out += c.toByte)
    le16(width); le16(height)
    u8(0xF7) // global color table, 8-bit color resolution, 256 entries
    u8(0); u8(0) // background index, aspect
    palette.foreach { c => u8(c >> 16); u8(c >> 8); u8(c) }
    var f = 0
    while (f < nFrames) {
      u8(0x2C) // image descriptor
      le16(0); le16(0); le16(width); le16(height)
      u8(0) // no local table, no interlace
      u8(8) // LZW minimum code size
      val pat = idx(f)
      val pixels = new Array[Byte](width * height)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          pixels(y * width + x) = (pat(x, y) & 0xFF).toByte; x += 1
        }
        y += 1
      }
      val data = lzwEncode(pixels)
      var off = 0
      while (off < data.length) {
        val n = math.min(255, data.length - off)
        u8(n)
        var i = 0
        while (i < n) { out += data(off + i); i += 1 }
        off += n
      }
      u8(0) // block terminator
      f += 1
    }
    u8(0x3B) // trailer
    out.toArray
  }

  private final val Clear = 256
  private final val Eoi = 257

  private def lzwEncode(pixels: Array[Byte]): Array[Byte] = {
    val data = new ArrayBuffer[Byte](pixels.length / 2 + 64)
    var cur = 0L; var nbits = 0
    var codeWidth = 9; var maxCode = (1 << 9) - 1
    def put(code: Int): Unit = {
      cur |= code.toLong << nbits; nbits += codeWidth
      while (nbits >= 8) {
        data += (cur & 0xFF).toByte; cur >>= 8; nbits -= 8
      }
    }
    var table = new java.util.HashMap[Integer, Integer]()
    var free = Eoi + 1
    def reset(): Unit = {
      table = new java.util.HashMap[Integer, Integer]()
      free = Eoi + 1; codeWidth = 9; maxCode = 511
    }
    put(Clear)
    if (pixels.isEmpty) { put(Eoi); if (nbits > 0) data += (cur & 0xFF).toByte
      return data.toArray }
    var prefix: Int = pixels(0) & 0xFF
    var i = 1
    while (i < pixels.length) {
      val k = pixels(i) & 0xFF
      val key = Integer.valueOf((prefix << 8) | k)
      val hit = table.get(key)
      if (hit != null) prefix = hit.intValue()
      else {
        put(prefix)
        table.put(key, Integer.valueOf(free)); free += 1
        // grow AFTER emitting, when the next free code would not fit —
        // the compress/GIFLIB convention the decoder mirrors
        if (free > maxCode + 1 && codeWidth < 12) {
          codeWidth += 1; maxCode = (1 << codeWidth) - 1
        }
        if (free == 4096) { put(Clear); reset() }
        prefix = k
      }
      i += 1
    }
    put(prefix); put(Eoi)
    if (nbits > 0) data += (cur & 0xFF).toByte
    data.toArray
  }

  // ---- decoder ----------------------------------------------------------

  /** Decode a GIF89a/87a stream's FIRST image (extensions skipped), or
    * None when the bytes are not a well-formed GIF.
    */
  def decode(bytes: Array[Byte]): Option[GifImage] =
    decodeFrames(bytes).flatMap(_.headOption)

  /** Decode every image of a (possibly animated) GIF — each frame must
    * be a FULL frame (the shape our encoder writes; partial-update
    * animations are out of scope for the frame-sampling gates).
    */
  def decodeFrames(bytes: Array[Byte]): Option[Seq[GifImage]] = {
    try decodeFramesOrThrow(bytes) catch { case _: Exception => None }
  }

  private def decodeFramesOrThrow(
      bytes: Array[Byte]): Option[Seq[GifImage]] = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    if (bytes.length < 13) return None
    val sig = new String(bytes, 0, 6, "US-ASCII")
    if (sig != "GIF89a" && sig != "GIF87a") return None
    var p = 6
    p += 4 // logical screen w/h (each image descriptor carries its own)
    val packed = u8(p); p += 3 // packed, background, aspect
    var globalPal: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      globalPal = readPalette(bytes, p, n); p += 3 * n
    }
    val frames = new ArrayBuffer[GifImage]()
    var done = false
    while (!done && p < bytes.length) {
      u8(p) match {
        case 0x21 => // extension: label + sub-blocks
          p += 2
          while (u8(p) != 0) p += 1 + u8(p)
          p += 1
        case 0x3B => done = true // trailer
        case 0x2C =>
          val width = le16(p + 5); val height = le16(p + 7)
          val ipacked = u8(p + 9); p += 10
          var pal = globalPal
          if ((ipacked & 0x80) != 0) {
            val n = 2 << (ipacked & 7)
            pal = readPalette(bytes, p, n); p += 3 * n
          }
          if (pal == null) return None // no palette in scope
          val interlaced = (ipacked & 0x40) != 0
          val mcs = u8(p); p += 1
          if (mcs < 2 || mcs > 8) return None
          // concatenate the data sub-blocks
          val data = new ArrayBuffer[Byte](bytes.length - p)
          while (u8(p) != 0) {
            val n = u8(p); p += 1
            var i = 0
            while (i < n) { data += bytes(p + i); i += 1 }
            p += n
          }
          p += 1 // block terminator
          val sequential = lzwDecode(data.toArray, mcs, width * height)
          if (sequential == null) return None
          // interlaced streams carry rows in the four GIF passes
          // (every 8th from 0, every 8th from 4, every 4th from 2, odd
          // rows) — scatter them back to natural order
          val indices =
            if (!interlaced) sequential
            else {
              val outRows = new Array[Byte](width * height)
              var src = 0
              for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
                   y <- start until height by step) {
                System.arraycopy(sequential, src * width, outRows,
                  y * width, width)
                src += 1
              }
              outRows
            }
          // a palette smaller than 256 still decodes: widen for rgb()
          val pal256 =
            if (pal.length == 256) pal else java.util.Arrays.copyOf(pal, 256)
          frames += GifImage(width, height, indices, pal256)
        case _ => return None
      }
    }
    if (frames.isEmpty) None else Some(frames.toSeq)
  }

  private def readPalette(bytes: Array[Byte], off: Int, n: Int): Array[Int] = {
    val pal = new Array[Int](n)
    var i = 0
    while (i < n) {
      pal(i) = ((bytes(off + 3 * i) & 0xFF) << 16) |
        ((bytes(off + 3 * i + 1) & 0xFF) << 8) |
        (bytes(off + 3 * i + 2) & 0xFF)
      i += 1
    }
    pal
  }

  private def lzwDecode(data: Array[Byte], mcs: Int,
                        nPixels: Int): Array[Byte] = {
    val clear = 1 << mcs; val eoi = clear + 1
    val out = new Array[Byte](nPixels)
    var outPos = 0
    // dictionary as (prefix, tail-byte) chains
    val prefixOf = new Array[Int](4096)
    val tailOf = new Array[Byte](4096)
    var free = eoi + 1; var codeWidth = mcs + 1
    var cur = 0L; var nbits = 0; var pos = 0
    def next(): Int = {
      while (nbits < codeWidth) {
        if (pos >= data.length) return -1
        cur |= (data(pos) & 0xFFL) << nbits; nbits += 8; pos += 1
      }
      val c = (cur & ((1L << codeWidth) - 1)).toInt
      cur >>= codeWidth; nbits -= codeWidth
      c
    }
    def firstByte(code: Int): Byte = {
      var c = code
      while (c >= clear + 2) c = prefixOf(c)
      c.toByte
    }
    def emit(code: Int): Unit = {
      // write the chain back-to-front
      var len = 0; var c = code
      while (c >= clear + 2) { len += 1; c = prefixOf(c) }
      len += 1
      if (outPos + len > nPixels) throw new IllegalStateException("overflow")
      var w = outPos + len - 1; c = code
      while (c >= clear + 2) { out(w) = tailOf(c); w -= 1; c = prefixOf(c) }
      out(w) = c.toByte
      outPos += len
    }
    var prev = -1
    var done = false
    while (!done && outPos < nPixels) {
      val c = next()
      if (c < 0 || c == eoi) done = true
      else if (c == clear) {
        free = eoi + 1; codeWidth = mcs + 1; prev = -1
      } else {
        if (prev < 0) { emit(c); prev = c }
        else {
          if (c > free) return null // invalid stream
          if (c == free) {
            // the KwKwK case: string(prev) + first(prev)
            if (free < 4096) {
              prefixOf(free) = prev; tailOf(free) = firstByte(prev)
              free += 1
            }
            emit(c); prev = c
          } else {
            if (free < 4096) {
              prefixOf(free) = prev; tailOf(free) = firstByte(c)
              free += 1
            }
            emit(c); prev = c
          }
        }
        if (free > (1 << codeWidth) - 1 && codeWidth < 12) codeWidth += 1
      }
    }
    if (outPos != nPixels) null else out
  }
}
