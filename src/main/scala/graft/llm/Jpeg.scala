package graft.llm

/** REAL baseline JPEG decoder (ITU T.81 sequential DCT, Huffman entropy
  * coding) — pure public format knowledge, pure JVM: marker walk, DQT /
  * DHT / SOF0 / SOS parsing, canonical Huffman table construction, the
  * stuffed-byte entropy bit reader with restart-marker support, DC
  * prediction + AC run-length block decode, dequantization, de-zigzag,
  * a double-precision reference IDCT, level shift, and YCbCr → RGB with
  * replicate chroma upsampling for subsampled scans.
  *
  * Supported: baseline sequential (SOF0), 8-bit, 1 (grayscale) or 3
  * (YCbCr) components, sampling factors 1-2, restart intervals. Returns
  * None (never guesses) for progressive (SOF2), arithmetic coding,
  * 12-bit, or malformed streams.
  *
  * Exactness contract: the JPEG standard does not mandate a bit-exact
  * IDCT, so two conforming decoders may differ by ±1 per sample (more on
  * subsampled chroma, where upsampling filters are also unspecified).
  * The specs therefore pin parity against the JDK's own ImageIO decoder
  * WITHIN THAT TOLERANCE rather than hash-exactly — which is also why
  * JPEG pixel content stays out of the cross-engine oracle gate (PNG,
  * being lossless and filter-exact, carries that gate instead).
  */
object Jpeg {

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var bitBuf = 0
    private var bitCnt = 0
    var sawMarker = false // hit a non-RST marker (e.g. EOI): stop decoding

    /** next entropy-coded byte, undoing 0xFF00 stuffing; RST markers are
      * consumed by [[reset]], anything else marks end-of-scan */
    private def nextByte(): Int = {
      if (pos >= bytes.length) { sawMarker = true; return 0 }
      val b = bytes(pos) & 0xFF
      pos += 1
      if (b == 0xFF) {
        val b2 = if (pos < bytes.length) bytes(pos) & 0xFF else 0xD9
        if (b2 == 0x00) { pos += 1; 0xFF }
        else { pos -= 1; sawMarker = true; 0 } // leave the marker unread
      } else b
    }

    def readBit(): Int = {
      if (bitCnt == 0) { bitBuf = nextByte(); bitCnt = 8 }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }

    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    /** consume an expected RSTn marker and clear the bit buffer */
    def reset(): Boolean = {
      bitCnt = 0
      sawMarker = false
      // skip fill bytes then the marker
      while (pos + 1 < bytes.length && (bytes(pos) & 0xFF) == 0xFF &&
             (bytes(pos + 1) & 0xFF) == 0xFF) pos += 1
      if (pos + 1 < bytes.length && (bytes(pos) & 0xFF) == 0xFF) {
        val m = bytes(pos + 1) & 0xFF
        if (m >= 0xD0 && m <= 0xD7) { pos += 2; true } else false
      } else false
    }
  }

  /** canonical Huffman table: (maxLen, firstCode/firstIndex per length,
    * values) — decoded bit-by-bit (tables are tiny; clarity over LUTs) */
  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    // code range bookkeeping per length 1..16
    private val firstCode = new Array[Int](17)
    private val firstIdx = new Array[Int](17)
    private val countAt = new Array[Int](17)
    locally {
      var code = 0
      var idx = 0
      var l = 1
      while (l <= 16) {
        firstCode(l) = code
        firstIdx(l) = idx
        countAt(l) = bits(l - 1)
        code = (code + bits(l - 1)) << 1
        idx += bits(l - 1)
        l += 1
      }
    }
    def decode(r: BitReader): Int = {
      var code = 0
      var l = 1
      while (l <= 16) {
        code = (code << 1) | r.readBit()
        if (countAt(l) > 0 && code - firstCode(l) < countAt(l))
          return vals(firstIdx(l) + (code - firstCode(l)))
        l += 1
      }
      -1 // invalid stream
    }
  }

  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** T.81 F.2.2.1 EXTEND: map magnitude bits to the signed value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** cos((2·x + 1)·v·π/16) for x, v in [0, 8) — the 64 distinct basis
    * values the reference IDCT uses. Precomputed with the IDENTICAL
    * expression the inline form evaluated, so every sum is bit-for-bit
    * the same; the inline form called math.cos 1024 times per 8×8 block
    * (the measured hot spot of the decode path).
    */
  private val CosBasis: Array[Double] = {
    val t = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        t(v * 8 + x) = math.cos((2 * x + 1) * v * math.Pi / 16)
        x += 1
      }
      v += 1
    }
    t
  }

  /** double-precision reference IDCT (separable, exact basis). */
  private def idct8x8(in: Array[Int], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    var u = 0
    // rows of the coefficient block are frequencies; do 1-D IDCT on rows
    // then columns of the spatial result
    while (u < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          val cv = if (v == 0) 0.70710678118654752440 else 1.0
          s += cv * in(u * 8 + v) * CosBasis(v * 8 + x)
          v += 1
        }
        tmp(u * 8 + x) = s / 2
        x += 1
      }
      u += 1
    }
    var x = 0
    while (x < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0
        var u2 = 0
        while (u2 < 8) {
          val cu = if (u2 == 0) 0.70710678118654752440 else 1.0
          s += cu * tmp(u2 * 8 + x) * CosBasis(u2 * 8 + y)
          u2 += 1
        }
        out(y * 8 + x) = s / 2
        y += 1
      }
      x += 1
    }
  }

  private def clamp(x: Double): Int = {
    val v = math.round(x).toInt
    if (v < 0) 0 else if (v > 255) 255 else v
  }

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTable = 0; var acTable = 0; var dcPred = 0
    var data: Array[Int] = null // per-component plane at its own sampling
    var bw = 0; var bh = 0 // plane dims in samples
  }

  /** Decode to an interleaved 8-bit raster ([[Multimodal.PngImage]]
    * container: channels = 1 for grayscale, 3 for color).
    *
    * Corpus bytes are untrusted: every segment's declared length is
    * validated against what the parser reads before reading it, raster
    * dimensions are capped (a few-hundred-byte stream must not demand a
    * multi-GB allocation — the same `1<<30` bomb guard as the PNG path),
    * and a final NonFatal catch pins the None-on-malformed contract even
    * for shapes the explicit checks miss.
    */
  def decode(bytes: Array[Byte]): Option[Multimodal.PngImage] =
    try decodeUnsafe(bytes)
    catch { case scala.util.control.NonFatal(_) => None }

  private def decodeUnsafe(bytes: Array[Byte]): Option[Multimodal.PngImage] = {
    def u8(i: Int) = bytes(i) & 0xFF
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    if (bytes.length < 4 || u8(0) != 0xFF || u8(1) != 0xD8) return None
    val qt = Array.ofDim[Int](4, 64)
    val dcH = new Array[Huff](4); val acH = new Array[Huff](4)
    var comps: Array[Component] = null
    var scanComps: Array[Component] = null // components in SOS order
    var width = 0; var height = 0
    var restartInterval = 0
    var pos = 2
    var scanStart = -1
    while (scanStart < 0) {
      if (pos + 4 > bytes.length) return None
      if (u8(pos) != 0xFF) return None
      val marker = u8(pos + 1)
      if (marker == 0xFF) { pos += 1 }
      else if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7)) pos += 2
      else if (marker == 0xD9) return None // EOI before any scan
      else {
        val len = be16(pos + 2)
        if (len < 2 || pos + 2 + len > bytes.length) return None
        val seg = pos + 4
        marker match {
          case 0xDB => // DQT (possibly several tables)
            var p = seg
            while (p < pos + 2 + len) {
              val pq = u8(p) >> 4; val tq = u8(p) & 0x0F
              if (tq > 3 || pq > 1) return None
              // the table id byte plus 64 8- or 16-bit quantizers must fit
              // inside the declared segment length
              if (p + 1 + (if (pq == 0) 64 else 128) > pos + 2 + len) return None
              var k = 0
              p += 1
              while (k < 64) {
                qt(tq)(k) = if (pq == 0) u8(p) else be16(p)
                p += (if (pq == 0) 1 else 2)
                k += 1
              }
            }
          case 0xC4 => // DHT (possibly several tables)
            var p = seg
            while (p < pos + 2 + len) {
              val tc = u8(p) >> 4; val th = u8(p) & 0x0F
              if (th > 3 || tc > 1) return None
              if (p + 17 > pos + 2 + len) return None // id + 16 count bytes
              val bits = Array.tabulate(16)(i => u8(p + 1 + i))
              val n = bits.sum
              if (p + 17 + n > pos + 2 + len) return None
              val vals = Array.tabulate(n)(i => u8(p + 17 + i))
              val h = new Huff(bits, vals)
              if (tc == 0) dcH(th) = h else acH(th) = h
              p += 17 + n
            }
          case 0xC0 => // SOF0 baseline
            if (len < 8) return None // precision + dims + component count
            if (u8(seg) != 8) return None // 8-bit only
            height = be16(seg + 1); width = be16(seg + 3)
            val nc = u8(seg + 5)
            if (width <= 0 || height <= 0 || (nc != 1 && nc != 3)) return None
            if (len < 8 + 3 * nc) return None // 3 bytes per component
            comps = Array.tabulate(nc) { i =>
              val o = seg + 6 + 3 * i
              val c = Component(u8(o), u8(o + 1) >> 4, u8(o + 1) & 0x0F, u8(o + 2))
              if (c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2 || c.tq > 3) return None
              c
            }
          case 0xC1 | 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA |
               0xCB | 0xCD | 0xCE | 0xCF =>
            return None // non-baseline frame types
          case 0xDD =>
            if (len < 4) return None
            restartInterval = be16(seg)
          case 0xDA => // SOS
            if (comps == null || len < 3) return None
            val ns = u8(seg)
            if (ns != comps.length) return None // single interleaved scan only
            if (len < 6 + 2 * ns) return None // per-comp ids + Ss/Se/AhAl
            // data units within an MCU interleave in SCAN-header order
            // (T.81 A.2.3), which JFIF files keep equal to frame order but
            // T.81 does not require — decode in SOS order, not SOF order
            scanComps = Array.tabulate(ns) { i =>
              val cid = u8(seg + 1 + 2 * i)
              val c = comps.find(_.id == cid).getOrElse(return None)
              c.dcTable = u8(seg + 2 + 2 * i) >> 4
              c.acTable = u8(seg + 2 + 2 * i) & 0x0F
              c
            }
            if (scanComps.map(_.id).distinct.length != ns) return None
            scanStart = pos + 2 + len
          case _ => () // APPn/COM/etc: skip
        }
        if (scanStart < 0) pos += 2 + len
      }
    }

    val hMax = comps.map(_.h).max; val vMax = comps.map(_.v).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    // decompression-bomb guard (mirrors decodePng): the output raster and
    // every padded component plane must stay under 1 GiB of samples —
    // header fields are 16-bit, so a crafted few-hundred-byte stream could
    // otherwise demand multi-GB allocations (or overflow bw*bh to a
    // negative array size). Sizes computed in Long BEFORE any allocation.
    val outCells = width.toLong * height * (if (comps.length == 1) 1 else 3)
    val maxPlane = comps.map(c =>
      (mcusX.toLong * c.h * 8) * (mcusY.toLong * c.v * 8)).max
    if (outCells > (1L << 30) || maxPlane > (1L << 30)) return None
    comps.foreach { c =>
      c.bw = mcusX * c.h * 8; c.bh = mcusY * c.v * 8
      c.data = new Array[Int](c.bw * c.bh)
    }

    val r = new BitReader(bytes, scanStart)
    val coef = new Array[Int](64)
    val px = new Array[Double](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!r.reset()) return None
        comps.foreach(_.dcPred = 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      var ci = 0
      while (ci < scanComps.length) {
        val c = scanComps(ci)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            java.util.Arrays.fill(coef, 0)
            // DC
            val t = dcH(c.dcTable).decode(r)
            if (t < 0 || t > 11 || r.sawMarker) return None
            c.dcPred += extend(r.readBits(t), t)
            coef(0) = c.dcPred * qt(c.tq)(0)
            // AC
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = acH(c.acTable).decode(r)
              if (rs < 0 || r.sawMarker) return None
              val run = rs >> 4; val size = rs & 0x0F
              if (size == 0) {
                if (run == 15) k += 16 else eob = true // EOB / ZRL
              } else {
                k += run
                if (k > 63) return None
                // DQT stores the table in ZIGZAG order: the quantizer for
                // the coefficient at zigzag position k is qt(k), while the
                // coefficient lands at its NATURAL position Zigzag(k)
                coef(Zigzag(k)) = extend(r.readBits(size), size) * qt(c.tq)(k)
                k += 1
              }
            }
            idct8x8(coef, px)
            // place the block in the component plane
            val ox = (mx * c.h + bx) * 8; val oy = (my * c.v + by) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                c.data((oy + yy) * c.bw + ox + xx) = clamp(px(yy * 8 + xx) + 128)
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }

    // assemble the raster: grayscale straight, color via YCbCr→RGB with
    // replicate upsampling of subsampled chroma
    val channels = if (comps.length == 1) 1 else 3
    val out = new Array[Byte](width * height * channels)
    if (channels == 1) {
      val c = comps(0)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          out(y * width + x) = c.data(y * c.bw + x).toByte
          x += 1
        }
        y += 1
      }
    } else {
      // select Y/Cb/Cr by COMPONENT ID (JFIF pins 1/2/3, but T.81 lets the
      // frame header list them in any order); fall back to SOF position
      // only when the stream uses non-JFIF ids
      val (cy, cb, cr) =
        (comps.find(_.id == 1), comps.find(_.id == 2), comps.find(_.id == 3)) match {
          case (Some(y0), Some(b0), Some(r0)) => (y0, b0, r0)
          case _ => (comps(0), comps(1), comps(2))
        }
      def sample(c: Component, x: Int, y: Int): Int = {
        val sx = x * c.h / hMax; val sy = y * c.v / vMax
        c.data(sy * c.bw + sx)
      }
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yy = sample(cy, x, y).toDouble
          val b = sample(cb, x, y) - 128.0
          val r2 = sample(cr, x, y) - 128.0
          val o = (y * width + x) * 3
          out(o) = clamp(yy + 1.402 * r2).toByte
          out(o + 1) = clamp(yy - 0.344136 * b - 0.714136 * r2).toByte
          out(o + 2) = clamp(yy + 1.772 * b).toByte
          x += 1
        }
        y += 1
      }
    }
    Some(Multimodal.PngImage(width, height, channels, out))
  }
}
