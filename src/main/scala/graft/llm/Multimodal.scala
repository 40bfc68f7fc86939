package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus the distributed decode/feature-extract
  * scaffolding.
  *
  * Header metadata extraction ([[decodeImageMeta]] / the ImageMeta native
  * expression) is REAL byte arithmetic: PNG IHDR dimensions at their fixed
  * offsets and a proper JPEG marker walk to the SOF segment — pure public
  * format knowledge (PNG spec §11.2.2, JPEG/JFIF ITU T.81 §B.2.2), no
  * codec library needed. PIXEL decoding is real across the family:
  * [[decodePng]] (full 8-bit truecolor: chunk walk + CRC, zlib inflate,
  * all five scanline filters) with [[encodePng]] as its synthesis twin,
  * [[Jpeg.decode]] (baseline sequential Huffman + reference IDCT +
  * YCbCr), [[decodeApngFrames]] (animation frame extraction), and
  * [[decodeWav]] (RIFF/PCM audio); [[imageFrameDecoder]] /
  * [[pngFrameDecoder]] / [[apngFrameDecoder]] / [[wavFrameDecoder]] feed
  * the typed [[decodeFrames]] boundary. `fakeFrameDecoder` remains only
  * as the stand-in for codecs outside the family (video containers,
  * compressed audio), where a JNI/JavaCV decoder is a one-function swap.
  */
object Multimodal {

  /** Parse image dimensions from the payload's HEADER BYTES — the real
    * thing, not a stub: PNG = 8-byte signature then the IHDR chunk's
    * big-endian width/height at offsets 16/20; JPEG = SOI then a marker
    * walk (skipping variable-length APPn/COM/quantization segments by
    * their big-endian lengths) to the first SOF0–SOF15 frame header,
    * whose payload is precision(1), height(2 BE), width(2 BE). Returns
    * None for anything unparseable (wrong magic, truncated, no SOF).
    * Driver twin of the ImageMeta native expression — specs assert parity.
    */
  def decodeImageMeta(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    val pngSig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
    if (bytes.length >= 24 && pngSig.indices.forall(i => u8(i) == pngSig(i)) &&
        u8(12) == 'I' && u8(13) == 'H' && u8(14) == 'D' && u8(15) == 'R')
      Some(("png", be32(16), be32(20)))
    else if (bytes.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8) {
      var i = 2
      while (i + 3 < bytes.length) {
        if (u8(i) != 0xFF) return None // marker desync: not a JPEG stream
        val marker = u8(i + 1)
        if (marker == 0xFF) i += 1 // fill byte
        else if (marker >= 0xC0 && marker <= 0xCF &&
                 marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
          // SOFn: length(2) precision(1) height(2) width(2) ...
          if (i + 8 >= bytes.length) return None
          return Some(("jpeg", be16(i + 7), be16(i + 5)))
        } else if ((marker >= 0xD0 && marker <= 0xD9) || marker == 0x01)
          i += 2 // standalone marker, no length field
        else {
          val segLen = be16(i + 2)
          if (segLen < 2) return None
          i += 2 + segLen
        }
      }
      None
    } else if (bytes.length >= 10 && u8(0) == 'G' && u8(1) == 'I' &&
        u8(2) == 'F' && u8(3) == '8' &&
        (u8(4) == '7' || u8(4) == '9') && u8(5) == 'a') {
      // GIF logical screen descriptor: w/h as LE16
      Some(("gif", u8(6) | (u8(7) << 8), u8(8) | (u8(9) << 8)))
    } else None
  }

  /** A decoded-media metadata record. */
  final case class MediaMeta(media_id: Long, n_bytes: Long, width: Int,
      height: Int, n_frames: Int)

  /** A fully decoded raster: `pixels` is row-major interleaved bytes
    * (`channels` per pixel — 3 = RGB, 4 = RGBA), exactly the PNG raw
    * scanline layout after defiltering.
    */
  final case class PngImage(width: Int, height: Int, channels: Int,
      pixels: Array[Byte])

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** REAL PNG encoder (PNG spec, ISO/IEC 15948): 8-bit non-interlaced
    * RGB/RGBA, scanlines filtered with type `y % 5` — deliberately cycling
    * through ALL FIVE filter types (None/Sub/Up/Average/Paeth) so a decoder
    * that mishandles any predictor produces wrong pixels — then
    * zlib-compressed (JDK Deflater) into one IDAT, with correct CRC32 on
    * every chunk. `pixel(x, y, c)` supplies each channel byte. Used to
    * synthesize test/gate images; the bytes are valid PNG (spec-checked
    * against the JDK's own ImageIO reader).
    */
  /** Filter (type `y % 5`, all five predictors exercised) and
    * zlib-deflate one raster — the shared scanline core of [[encodePng]]
    * and the APNG frame writer.
    */
  private def filterAndDeflate(width: Int, height: Int, channels: Int,
                               pixel: (Int, Int, Int) => Int): Array[Byte] = {
    val stride = width * channels
    val raw = new Array[Byte](height * (1 + stride))
    var prev = new Array[Int](stride)
    var cur = new Array[Int](stride)
    var off = 0
    var y = 0
    while (y < height) {
      val ft = y % 5
      raw(off) = ft.toByte; off += 1
      var i = 0
      var x = 0
      while (x < width) {
        var c = 0
        while (c < channels) { cur(i) = pixel(x, y, c) & 0xFF; i += 1; c += 1 }
        x += 1
      }
      i = 0
      while (i < stride) {
        val a = if (i >= channels) cur(i - channels) else 0
        val b = prev(i)
        val d = if (i >= channels) prev(i - channels) else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) >>> 1
          case _ => paeth(a, b, d)
        }
        raw(off) = ((cur(i) - pred) & 0xFF).toByte
        off += 1; i += 1
      }
      val t = prev; prev = cur; cur = t
      y += 1
    }
    // Per-task amortized native zlib stream (a new Deflater allocates a
    // native stream per call — measurable when the encoder runs per row),
    // at BEST_SPEED: the synthesized rasters are small and the level only
    // changes the COMPRESSED byte stream, never the decoded raster the
    // gates and specs pin (encode is deterministic at any fixed level, so
    // equal inputs still produce byte-identical payloads).
    val defl = pngDeflater.get()
    defl.reset()
    defl.setInput(raw); defl.finish()
    val zOut = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!defl.finished()) zOut.write(buf, 0, defl.deflate(buf))
    zOut.toByteArray
  }

  private val pngDeflater = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
  }

  private val pngInflater = new ThreadLocal[java.util.zip.Inflater] {
    override def initialValue(): java.util.zip.Inflater =
      new java.util.zip.Inflater()
  }

  /** Chunk writer shared by the PNG and APNG encoders: length, tag, data,
    * CRC32 over tag+data — the spec layout byte for byte.
    */
  private final class ChunkWriter {
    val out = new java.io.ByteArrayOutputStream(1024)
    def be32(v: Int): Unit = {
      out.write((v >>> 24) & 0xFF); out.write((v >>> 16) & 0xFF)
      out.write((v >>> 8) & 0xFF); out.write(v & 0xFF)
    }
    def chunk(tag: String, data: Array[Byte]): Unit = {
      be32(data.length)
      val tb = tag.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      out.write(tb); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      be32(crc.getValue.toInt)
    }
    def signature(): Unit =
      out.write(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    def ihdr(width: Int, height: Int, channels: Int): Unit =
      chunk("IHDR", java.nio.ByteBuffer.allocate(13)
        .putInt(width).putInt(height)
        .put(8.toByte).put((if (channels == 3) 2 else 6).toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte).array())
  }

  def encodePng(width: Int, height: Int, channels: Int,
                pixel: (Int, Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0 && (channels == 3 || channels == 4),
      s"unsupported raster ${width}x$height/$channels")
    val w = new ChunkWriter
    w.signature()
    w.ihdr(width, height, channels)
    w.chunk("IDAT", filterAndDeflate(width, height, channels, pixel))
    w.chunk("IEND", Array.emptyByteArray)
    w.out.toByteArray
  }

  /** REAL PNG pixel decoder — the frame-content counterpart of
    * [[decodeImageMeta]]'s header walk, closing the last stubbed corner of
    * the multimodal family: chunk walk with CRC32 verification, IDAT
    * concatenation, zlib inflate (JDK Inflater), and full scanline
    * DEFILTERING of all five predictor types. Supports the dominant
    * web-corpus layout — 8-bit non-interlaced truecolor (RGB / RGBA);
    * returns None for anything else (palette, 16-bit, interlaced, CRC
    * mismatch, truncated stream) rather than guessing. Pure JDK — no codec
    * library; per-row cost is O(bytes), a columnar map like every other
    * doc-local kernel.
    */
  def decodePng(bytes: Array[Byte]): Option[PngImage] = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    def be32(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
    if (bytes.length < 45 || !sig.indices.forall(i => u8(i) == sig(i))) return None
    var width = 0; var height = 0; var channels = 0
    var sawIhdr = false
    val idat = new java.io.ByteArrayOutputStream()
    var pos = 8
    var done = false
    while (!done) {
      if (pos + 8 > bytes.length) return None
      val len = be32(pos)
      if (len < 0 || pos + 12 + len > bytes.length) return None
      val tag = new String(bytes, pos + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, pos + 4, 4 + len)
      if (crc.getValue.toInt != be32(pos + 8 + len)) return None
      tag match {
        case "IHDR" =>
          if (len != 13) return None
          width = be32(pos + 8); height = be32(pos + 12)
          val depth = u8(pos + 16); val colorType = u8(pos + 17)
          val interlace = u8(pos + 20)
          if (depth != 8 || interlace != 0 ||
              (colorType != 2 && colorType != 6)) return None
          channels = if (colorType == 2) 3 else 4
          if (width <= 0 || height <= 0 ||
              width.toLong * height * channels > (1L << 30)) return None
          sawIhdr = true
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case "IEND" => done = true
        case _ => () // ancillary chunk: CRC checked, content skipped
      }
      pos += 12 + len
    }
    if (!sawIhdr || idat.size() == 0) return None
    inflateRaster(idat.toByteArray, width, height, channels)
      .map(PngImage(width, height, channels, _))
  }

  /** zlib-inflate one frame's filtered scanlines and DEFILTER all five
    * predictor types — the shared raster core of [[decodePng]] and the
    * APNG frame walk. None on truncation, bad filter bytes, or a stream
    * that doesn't fit the expected raster exactly.
    */
  private def inflateRaster(z: Array[Byte], width: Int, height: Int,
                            channels: Int): Option[Array[Byte]] = {
    val stride = width * channels
    val raw = new Array[Byte](height * (1 + stride))
    // per-task amortized native zlib stream (reset per use), mirroring the
    // encoder's pngDeflater — a fresh Inflater allocates a native stream
    // per decoded frame, measurable when the decoder runs per row
    val infl = pngInflater.get()
    infl.reset()
    infl.setInput(z)
    var got = 0
    try {
      while (got < raw.length && !infl.finished()) {
        val n = infl.inflate(raw, got, raw.length - got)
        if (n == 0 && infl.needsInput()) return None // truncated stream
        got += n
      }
    } catch { case _: java.util.zip.DataFormatException => return None }
    if (got != raw.length) return None
    val px = new Array[Byte](height * stride)
    var y = 0
    while (y < height) {
      val ft = raw(y * (1 + stride)) & 0xFF
      if (ft > 4) return None
      val in = y * (1 + stride) + 1
      val outRow = y * stride
      var i = 0
      while (i < stride) {
        val a = if (i >= channels) px(outRow + i - channels) & 0xFF else 0
        val b = if (y > 0) px(outRow - stride + i) & 0xFF else 0
        val c = if (y > 0 && i >= channels) px(outRow - stride + i - channels) & 0xFF else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) >>> 1
          case _ => paeth(a, b, c)
        }
        px(outRow + i) = (((raw(in + i) & 0xFF) + pred) & 0xFF).toByte
        i += 1
      }
      y += 1
    }
    Some(px)
  }

  /** A decoded PCM clip: 16-bit samples, interleaved when stereo. */
  final case class WavAudio(sampleRate: Int, channels: Int,
      samples: Array[Short])

  /** REAL WAV encoder (RIFF/WAVE, 16-bit PCM): the canonical little-endian
    * chunk layout — RIFF size header, `fmt ` with PCM tag/channels/rates,
    * `data` with interleaved s16le samples. Pure public format knowledge
    * (Microsoft/IBM RIFF spec); used to synthesize gate/test clips.
    */
  def encodeWav(sampleRate: Int, channels: Int,
                samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && (channels == 1 || channels == 2) &&
      samples.length % channels == 0, s"bad clip $sampleRate/$channels")
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    buf.putInt(36 + dataLen)
    buf.put("WAVE".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    buf.put("fmt ".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    buf.putInt(16).putShort(1).putShort(channels.toShort)
    buf.putInt(sampleRate).putInt(sampleRate * channels * 2)
    buf.putShort((channels * 2).toShort).putShort(16)
    buf.put("data".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    buf.putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** REAL WAV decoder — the audio counterpart of [[decodePng]]: RIFF
    * signature check, chunk walk on little-endian sizes (even-padded per
    * the spec), `fmt ` validation, then format dispatch: PCM (tag 1,
    * 16-bit, mono/stereo) reads s16le samples; IMA ADPCM (tag 0x11,
    * 4-bit, mono) decodes the block stream through [[Adpcm]], truncated
    * to the `fact` chunk's true sample count. Returns None for other
    * formats/bit depths, truncated chunks, or a missing fmt/data — never
    * guesses. Pure JDK byte arithmetic, doc-local like every decode
    * kernel here.
    */
  def decodeWav(bytes: Array[Byte]): Option[WavAudio] = {
    if (bytes.length < 44) return None
    val b = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(i: Int): String =
      new String(bytes, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var fmtTag = 0; var sampleRate = 0; var channels = 0; var bits = 0
    var blockAlign = 0; var sawFmt = false
    var factSamples = -1
    var dataOff = -1; var dataLen = -1
    var pos = 12
    while (pos + 8 <= bytes.length) {
      val id = tag(pos)
      val len = b.getInt(pos + 4)
      // hostile-bytes guard: a negative length would loop the walk
      // forever, an oversized one would read (PCM) or zero-pad (ADPCM)
      // past EOF — both are the documented None, like the JPEG walk.
      // Long arithmetic: len near Int.MaxValue must not wrap the sum
      // negative and slip past the bound
      if (len < 0 || pos + 8 + len.toLong > bytes.length) return None
      id match {
        case "fmt " =>
          if (len < 16) return None
          fmtTag = b.getShort(pos + 8) & 0xFFFF
          channels = b.getShort(pos + 10) & 0xFFFF
          sampleRate = b.getInt(pos + 12)
          blockAlign = b.getShort(pos + 20) & 0xFFFF
          bits = b.getShort(pos + 22) & 0xFFFF
          if (sampleRate <= 0) return None
          sawFmt = true
        case "fact" =>
          if (len < 4) return None
          factSamples = b.getInt(pos + 8)
        case "data" =>
          dataOff = pos + 8; dataLen = len
        case _ => () // LIST/cue …: skipped by size
      }
      pos += 8 + len + (len & 1) // chunks are even-padded
    }
    if (!sawFmt || dataOff < 0) return None
    fmtTag match {
      case 1 => // integer PCM, 16-bit, mono/stereo
        if (bits != 16 || (channels != 1 && channels != 2)) return None
        if (dataLen % 2 != 0) return None
        val samples = new Array[Short](dataLen / 2)
        var i = 0
        while (i < samples.length) {
          samples(i) = b.getShort(dataOff + 2 * i); i += 1
        }
        if (samples.length % channels != 0) return None
        Some(WavAudio(sampleRate, channels, samples))
      case 0x11 => // IMA ADPCM, 4-bit, mono blocks
        if (bits != 4 || channels != 1 || blockAlign < 8) return None
        val data = java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + dataLen)
        val n =
          if (factSamples >= 0) factSamples
          else (dataLen / blockAlign) * Adpcm.samplesPerBlock(blockAlign)
        Adpcm.decodeBlocks(data, blockAlign, n)
          .map(WavAudio(sampleRate, 1, _))
      case _ => None
    }
  }

  /** REAL IMA-ADPCM WAV encoder (WAVE format tag 0x11, mono): the
    * standard compressed-WAV layout — extended `fmt ` with
    * wSamplesPerBlock, a `fact` chunk carrying the TRUE sample count (how
    * readers truncate the zero-padded final block), and the [[Adpcm]]
    * block stream. 4:1-ish compression, integer-exact decode.
    */
  def encodeWavAdpcm(sampleRate: Int, samples: Array[Short],
                     blockAlign: Int = 256): Array[Byte] = {
    require(sampleRate > 0, s"bad rate $sampleRate")
    val data = Adpcm.encodeBlocks(samples, blockAlign)
    val spb = Adpcm.samplesPerBlock(blockAlign)
    val buf = java.nio.ByteBuffer.allocate(12 + 8 + 20 + 8 + 4 + 8 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    buf.putInt(4 + 8 + 20 + 8 + 4 + 8 + data.length)
    buf.put("WAVE".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    buf.put("fmt ".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    buf.putInt(20).putShort(0x11).putShort(1)
    buf.putInt(sampleRate)
    // average byte rate over full blocks — informational per the spec
    buf.putInt((sampleRate.toLong * blockAlign / spb).toInt)
    buf.putShort(blockAlign.toShort).putShort(4)
    buf.putShort(2).putShort(spb.toShort) // cbSize + wSamplesPerBlock
    buf.put("fact".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    buf.putInt(4).putInt(samples.length)
    buf.put("data".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    buf.putInt(data.length)
    buf.put(data)
    buf.array()
  }

  /** REAL APNG encoder (the PNG spec's Animated PNG extension, now part
    * of core PNG): acTL animation control, one fcTL frame control per
    * frame with running sequence numbers, frame 0 in IDAT and subsequent
    * frames in fdAT chunks (sequence number + the frame's own complete
    * zlib stream). All frames full-canvas, dispose NONE / blend SOURCE —
    * the common synthesized-clip layout. `pixel(f, x, y, c)` supplies
    * each frame's channel bytes; every frame cycles all five scanline
    * filters like [[encodePng]].
    */
  def encodeApng(width: Int, height: Int, channels: Int, nFrames: Int,
                 pixel: (Int, Int, Int, Int) => Int): Array[Byte] = {
    require(nFrames >= 1 && width > 0 && height > 0 &&
      (channels == 3 || channels == 4), s"bad clip ${width}x$height×$nFrames")
    val w = new ChunkWriter
    w.signature()
    w.ihdr(width, height, channels)
    w.chunk("acTL", java.nio.ByteBuffer.allocate(8)
      .putInt(nFrames).putInt(0).array())
    var seq = 0
    def fctl(): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(26)
      b.putInt(seq).putInt(width).putInt(height).putInt(0).putInt(0)
      b.putShort(1).putShort(10).put(0.toByte).put(0.toByte)
      seq += 1
      b.array()
    }
    w.chunk("fcTL", fctl())
    w.chunk("IDAT",
      filterAndDeflate(width, height, channels, pixel(0, _, _, _)))
    var f = 1
    while (f < nFrames) {
      w.chunk("fcTL", fctl())
      val z = filterAndDeflate(width, height, channels, pixel(f, _, _, _))
      val fd = java.nio.ByteBuffer.allocate(4 + z.length)
        .putInt(seq).put(z).array()
      seq += 1
      w.chunk("fdAT", fd)
      f += 1
    }
    w.chunk("IEND", Array.emptyByteArray)
    w.out.toByteArray
  }

  /** REAL APNG frame extraction — the video-shaped decode: chunk walk
    * with CRC32 verification, acTL/fcTL/fdAT bookkeeping with strict
    * sequence-number checking, then each frame's zlib stream inflated and
    * defiltered through the shared raster core. Supports the full-canvas
    * frame subset [[encodeApng]] writes (8-bit truecolor, no regional
    * offsets, dispose NONE / blend SOURCE) and returns None for anything
    * else — including a plain PNG (no acTL). One decoded frame per fcTL,
    * in presentation order.
    */
  def decodeApngFrames(bytes: Array[Byte]): Option[Seq[PngImage]] = {
    def u8(i: Int): Int = bytes(i) & 0xFF
    def be32(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
    if (bytes.length < 57 || !sig.indices.forall(i => u8(i) == sig(i))) return None
    var width = 0; var height = 0; var channels = 0
    var nFrames = -1
    var expectSeq = 0
    // frames under assembly: data buffer per fcTL seen so far
    val frames = scala.collection.mutable.ArrayBuffer.empty[java.io.ByteArrayOutputStream]
    var pos = 8
    var done = false
    while (!done) {
      if (pos + 8 > bytes.length) return None
      val len = be32(pos)
      if (len < 0 || pos + 12 + len > bytes.length) return None
      val tag = new String(bytes, pos + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, pos + 4, 4 + len)
      if (crc.getValue.toInt != be32(pos + 8 + len)) return None
      tag match {
        case "IHDR" =>
          if (len != 13) return None
          width = be32(pos + 8); height = be32(pos + 12)
          val depth = u8(pos + 16); val colorType = u8(pos + 17)
          if (depth != 8 || u8(pos + 20) != 0 ||
              (colorType != 2 && colorType != 6)) return None
          channels = if (colorType == 2) 3 else 4
          if (width <= 0 || height <= 0 ||
              width.toLong * height * channels > (1L << 30)) return None
        case "acTL" =>
          if (len != 8) return None
          nFrames = be32(pos + 8)
          if (nFrames < 1) return None
        case "fcTL" =>
          if (len != 26 || be32(pos + 8) != expectSeq) return None
          expectSeq += 1
          // full-canvas subset only: dims must match, offsets zero
          if (be32(pos + 12) != width || be32(pos + 16) != height ||
              be32(pos + 20) != 0 || be32(pos + 24) != 0) return None
          frames += new java.io.ByteArrayOutputStream()
        case "IDAT" =>
          if (frames.isEmpty) return None // default image not in animation
          frames.head.write(bytes, pos + 8, len)
        case "fdAT" =>
          if (len < 4 || frames.size < 2 || be32(pos + 8) != expectSeq) return None
          expectSeq += 1
          frames.last.write(bytes, pos + 12, len - 4)
        case "IEND" => done = true
        case _ => ()
      }
      pos += 12 + len
    }
    if (nFrames < 0 || frames.size != nFrames) return None
    val out = frames.map { buf =>
      if (buf.size() == 0) return None
      inflateRaster(buf.toByteArray, width, height, channels) match {
        case Some(px) => PngImage(width, height, channels, px)
        case None => return None
      }
    }
    Some(out.toSeq)
  }

  /** Frame-SAMPLING decoder for [[decodeFrames]] over APNG payloads — the
    * video curation shape: decode the animation, keep every
    * `sampleEvery`-th frame, one feature row per KEPT frame —
    * [frameIndex, width, height, channels, meanR, meanG, meanB] (the
    * shape shared with [[mjpegFrameDecoder]]). Undecodable payloads
    * produce no frames.
    */
  def apngFrameDecoder(sampleEvery: Int = 2)(bytes: Array[Byte]): Iterator[Array[Float]] =
    decodeApngFrames(bytes) match {
      case None => Iterator.empty
      case Some(fs) =>
        fs.iterator.zipWithIndex
          .filter(_._2 % sampleEvery == 0)
          .map { case (img, fi) =>
            val n = img.width * img.height
            val sums = new Array[Long](3)
            var p = 0
            while (p < n) {
              var c = 0
              while (c < 3) {
                sums(c) += img.pixels(p * img.channels + c) & 0xFF; c += 1
              }
              p += 1
            }
            // row shape shared with mjpegFrameDecoder so the dispatching
            // clipFrameDecoder yields ONE uniform relation over mixed
            // containers: [fi, width, height, channels, meanR, meanG, meanB]
            Array(fi.toFloat, img.width.toFloat, img.height.toFloat,
              img.channels.toFloat,
              sums(0).toFloat / n, sums(1).toFloat / n, sums(2).toFloat / n)
          }
    }

  /** GIF frame decoder for [[decodeFrames]] — the animated-GIF leg of the
    * clip family: palette-resolved per-frame channel means in the uniform
    * clip row shape ([fi, width, height, channels, meanR, meanG, meanB]).
    */
  def gifFrameDecoder(sampleEvery: Int = 2)(bytes: Array[Byte]): Iterator[Array[Float]] =
    Gif.decodeFrames(bytes) match {
      case None => Iterator.empty
      case Some(fs) =>
        fs.iterator.zipWithIndex
          .filter(_._2 % sampleEvery == 0)
          .map { case (img, fi) =>
            val n = img.width * img.height
            val sums = new Array[Long](3)
            var p = 0
            while (p < n) {
              val c = img.rgb(p)
              sums(0) += (c >> 16) & 0xFF; sums(1) += (c >> 8) & 0xFF
              sums(2) += c & 0xFF
              p += 1
            }
            Array(fi.toFloat, img.width.toFloat, img.height.toFloat, 3f,
              sums(0).toFloat / n, sums(1).toFloat / n, sums(2).toFloat / n)
          }
    }

  /** Integer-exact per-frame GIF stats for the gate ([fi, width, height,
    * sumR, sumG, sumB] — sums, not means, so the oracle replays them
    * exactly; every value < 2²⁴ is float-exact).
    */
  def gifFrameSums(bytes: Array[Byte]): Iterator[Array[Float]] =
    Gif.decodeFrames(bytes) match {
      case None => Iterator.empty
      case Some(fs) =>
        fs.iterator.zipWithIndex.map { case (img, fi) =>
          val n = img.width * img.height
          val sums = new Array[Long](3)
          var p = 0
          while (p < n) {
            val c = img.rgb(p)
            sums(0) += (c >> 16) & 0xFF; sums(1) += (c >> 8) & 0xFF
            sums(2) += c & 0xFF
            p += 1
          }
          Array(fi.toFloat, img.width.toFloat, img.height.toFloat,
            sums(0).toFloat, sums(1).toFloat, sums(2).toFloat)
        }
    }

  /** Clip-level video near-dup pairs by SAMPLED-FRAME content hash — the
    * dedup op a video corpus actually runs (re-uploads, re-encodes of the
    * same cut, clips sharing stock footage): decode every `sampleEvery`-th
    * frame of each clip for real, hash each decoded raster
    * (dimension-prefixed polynomial fold), and pair clips sharing any
    * frame hash — `(clip_a, clip_b, n_shared)` with the shared-frame
    * count. Containers dispatch by magic bytes (APNG or MJPEG — mixed
    * corpora dedup in one relation, since the hash is over the DECODED
    * raster). The join is a hash-bucket equi-join (never all-pairs);
    * frame contents appearing in more than `maxDf` clips are dropped
    * BEFORE pairing (black frames, channel intros — the
    * ubiquitous-content hazard that would otherwise make a bucket
    * quadratic, the same df guard as [[Dedup.winnowOverlap]]).
    */
  def clipDupPairs(media: DataFrame, idCol: String = "media_id",
                   contentCol: String = "content", sampleEvery: Int = 2,
                   maxDf: Int = 1000): DataFrame = {
    val fh = media.select(col(idCol).as("id"),
        explode(graft.functions.native.clipFrameHashes(col(contentCol),
          sampleEvery)).as("f"))
      .select(col("id"), col("f").getField("fhash").as("fhash"))
      // one row per distinct frame CONTENT per clip: a clip internally
      // repeating a raster (black frames, held stills) must not multiply
      // n_shared through the within-hash self-join
      .distinct()
      .localCheckpoint(false) // feeds the df guard AND both join sides
    val rare = fh.groupBy("fhash").agg(count(lit(1)).as("_df"))
      .where(col("_df") <= maxDf).select("fhash")
    val kept = fh.join(rare, "fhash")
    kept.alias("a").join(kept.alias("b"),
        col("a.fhash") === col("b.fhash") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("clip_a"), col("b.id").as("clip_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** CLIP near-dup by per-frame DCT PERCEPTUAL hash — [[clipDupPairs]]
    * with [[graft.functions.ClipFrameDctHashes]] in place of the exact
    * raster fold: clips pair on shared frame-level DCT hashes, so a
    * re-exposed re-upload (every pixel of every frame different) still
    * collides frame-for-frame at hash EQUALITY — the zero-AC-row-sum
    * exactness, at clip granularity. Same posture: per-clip distinct
    * hashes, df guard against ubiquitous frames (black/held stills are
    * WORSE for a perceptual hash — re-exposures of them collide too),
    * only (id, 8-byte hash) shuffles. Returns (clip_a, clip_b, n_shared).
    */
  def clipDupPairsDct(media: DataFrame, idCol: String = "media_id",
                      contentCol: String = "content", sampleEvery: Int = 2,
                      maxDf: Int = 1000): DataFrame = {
    val fh = media.select(col(idCol).as("id"),
        explode(graft.functions.native.clipFrameDctHashes(col(contentCol),
          sampleEvery)).as("f"))
      .select(col("id"), col("f").getField("fhash").as("fhash"))
      .distinct()
      .localCheckpoint(false) // feeds the df guard AND both join sides
    val rare = fh.groupBy("fhash").agg(count(lit(1)).as("_df"))
      .where(col("_df") <= maxDf).select("fhash")
    val kept = fh.join(rare, "fhash")
    kept.alias("a").join(kept.alias("b"),
        col("a.fhash") === col("b.fhash") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("clip_a"), col("b.id").as("clip_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** IMAGE near-dup by perceptual hash: every payload decodes through the
    * real PNG path into a 64-bit average-hash
    * ([[graft.functions.ImageAHash64]]), candidates block on 4×16-bit hash
    * BANDS (the simhash pigeonhole: ≤ 3 flipped bits cannot touch all 4
    * bands, so Hamming ≤ 3 recall is guaranteed; 4..`tau` pairs are
    * caught whenever a band survives — the aHash near-dups this gate
    * targets are brightness shifts, which leave the hash IDENTICAL), and
    * survivors verify by exact popcount. Payloads decode by magic bytes
    * — PNG and baseline JPEG hash through one raster rule, so a PNG
    * original pairs with its JPEG re-encode. Scale
    * posture matches [[clipDupPairs]]: only (id, hash) enters the
    * exchange — 16 bytes per image however large the rasters — bucket
    * df capped at `maxDf` so a hot band cannot go quadratic. The cap
    * default is far lower than the text operators' (64 vs 1000) because
    * perceptual-hash bands are STRUCTURED, not uniform: natural and
    * synthetic images alike concentrate on a few band values (dark top
    * rows, flat backgrounds → all-zero bands shared by thousands), while
    * a true re-upload cluster is rarely more than dozens of copies — a
    * bucket above the cap is a degenerate pattern, not a dup cluster.
    * Returns (id_a, id_b, hamming).
    */
  def imageDupPairs(media: DataFrame, idCol: String = "media_id",
                    contentCol: String = "content", tau: Int = 6,
                    maxDf: Int = 64): DataFrame =
    hash64DupPairs(media.select(col(idCol).as("id"),
      graft.functions.native.imageAHash64(col(contentCol)).as("ph")),
      tau, maxDf)

  /** IMAGE near-dup by DCT perceptual hash — [[imageDupPairs]] with the
    * frequency-domain [[graft.functions.ImageDctHash64]] in place of the
    * cell-mean aHash: the raster bins to 32×32, an integer 2D DCT keeps
    * the top-left 8×8 coefficients, bits compare each AC coefficient to
    * their median. Because the DC coefficient never enters a bit, a
    * uniform brightness shift leaves the hash EXACTLY unchanged (the
    * fixed-point basis rows sum to zero — no margin argument needed),
    * while structural change redistributes low-frequency energy and
    * flips ~half the bits. Same banded pigeonhole blocking, df guard and
    * exact popcount verify; only (id, 8-byte hash) ever shuffles.
    */
  def imageDupPairsDct(media: DataFrame, idCol: String = "media_id",
                       contentCol: String = "content", tau: Int = 6,
                       maxDf: Int = 64): DataFrame =
    hash64DupPairs(media.select(col(idCol).as("id"),
      graft.functions.native.imageDctHash64(col(contentCol)).as("ph")),
      tau, maxDf)

  /** The shared banded-Hamming pair kernel over any 64-bit perceptual
    * hash relation `(id, ph)`: 4×16-bit band blocking (≤ 3 flipped bits
    * cannot touch all 4 bands), per-(band, bucket) df guard at `maxDf`,
    * exact popcount verify at `tau`. Returns (id_a, id_b, hamming).
    */
  private def hash64DupPairs(hashed: DataFrame, tau: Int,
                             maxDf: Int): DataFrame = {
    val ph = hashed.where(col("ph").isNotNull)
    val bands = ph.select(col("id"), col("ph"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bucket",
        expr("shiftright(ph, 16 * band)").bitwiseAND(lit(65535L)))
      .localCheckpoint(false) // feeds the df guard AND both join sides
    val rare = bands.groupBy("band", "bucket").agg(count(lit(1)).as("_df"))
      .where(col("_df") <= maxDf).select("band", "bucket")
    val kept = bands.join(rare, Seq("band", "bucket"))
    kept.alias("a").join(kept.alias("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
          && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.ph").as("pha"), col("b.ph").as("phb"))
      .distinct() // a pair agreeing on several bands counts once
      .withColumn("hamming",
        bit_count(col("pha").bitwiseXOR(col("phb"))).cast("int"))
      .where(col("hamming") <= tau)
      .select("id_a", "id_b", "hamming")
  }

  /** AUDIO near-dup by decoded-PCM window hash — the audio leg of
    * [[clipDupPairs]] (video) and [[imageDupPairs]] (images), closing the
    * modality family: every payload decodes through the real WAV path,
    * each full `window`-sample span hashes
    * ([[graft.functions.WavWindowHashes]]), clips pair on shared window
    * CONTENT with the same df guard (silence/test-tone windows shared by
    * thousands of clips cannot go quadratic). Only (id, 8-byte hash)
    * enters the exchange — audio bytes never shuffle. Returns
    * (clip_a, clip_b, n_shared) — shared DISTINCT window contents.
    */
  def audioDupPairs(media: DataFrame, idCol: String = "media_id",
                    contentCol: String = "content", window: Int = 256,
                    maxDf: Int = 1000): DataFrame = {
    val wh = media.select(col(idCol).as("id"),
        explode(graft.functions.native.wavWindowHashes(col(contentCol),
          window)).as("whash"))
      .distinct() // a clip repeating a window (looped silence) counts once
      .localCheckpoint(false) // feeds the df guard AND both join sides
    val rare = wh.groupBy("whash").agg(count(lit(1)).as("_df"))
      .where(col("_df") <= maxDf).select("whash")
    val kept = wh.join(rare, "whash")
    kept.alias("a").join(kept.alias("b"),
        col("a.whash") === col("b.whash") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("clip_a"), col("b.id").as("clip_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** AUDIO near-dup by SPECTRAL fingerprint — the frequency-domain leg
    * next to [[audioDupPairs]]'s byte-exact content hashes: clips pair on
    * shared landmark hashes ([[graft.functions.WavSpectralHashes]] —
    * integer-DFT peak-bin runs), which survive transformations that
    * change every PCM byte but not the spectral shape; integer GAIN
    * scaling in particular leaves the fingerprint EXACTLY unchanged
    * (mag² scales by m², every argmax holds). Same scale posture: only
    * (id, 8-byte hash) shuffles, ubiquitous landmarks (silence, test
    * tones) df-capped at `maxDf`. Returns (clip_a, clip_b, n_shared).
    */
  def audioDupPairsSpectral(media: DataFrame, idCol: String = "media_id",
                            contentCol: String = "content", window: Int = 64,
                            shingle: Int = 4, maxDf: Int = 1000): DataFrame = {
    val wh = media.select(col(idCol).as("id"),
        explode(graft.functions.native.wavSpectralHashes(col(contentCol),
          window, shingle)).as("whash"))
      .distinct() // a clip repeating a landmark run counts once
      .localCheckpoint(false) // feeds the df guard AND both join sides
    val rare = wh.groupBy("whash").agg(count(lit(1)).as("_df"))
      .where(col("_df") <= maxDf).select("whash")
    val kept = wh.join(rare, "whash")
    kept.alias("a").join(kept.alias("b"),
        col("a.whash") === col("b.whash") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("clip_a"), col("b.id").as("clip_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Real frame decoder for [[decodeFrames]] over WAV payloads: one
    * feature row per `window`-sample window (last window may be short) —
    * [windowIndex, nSamples, rms, zeroCrossRate, peak] (rms/peak on the
    * raw s16 scale). Undecodable payloads produce no frames.
    */
  def wavFrameDecoder(window: Int = 1024)(bytes: Array[Byte]): Iterator[Array[Float]] =
    decodeWav(bytes) match {
      case None => Iterator.empty
      case Some(a) =>
        val n = a.samples.length
        (0 until (n + window - 1) / window).iterator.map { wi =>
          val lo = wi * window; val hi = math.min(lo + window, n)
          var ss = 0L; var zc = 0L; var peak = 0
          var i = lo
          while (i < hi) {
            val s = a.samples(i).toInt
            ss += s.toLong * s
            if (math.abs(s) > peak) peak = math.abs(s)
            if (i > lo) {
              val p = a.samples(i - 1).toInt
              if ((p < 0 && s >= 0) || (p >= 0 && s < 0)) zc += 1
            }
            i += 1
          }
          val m = hi - lo
          Array(wi.toFloat, m.toFloat, math.sqrt(ss.toDouble / m).toFloat,
            zc.toFloat / math.max(m - 1, 1), peak.toFloat)
        }
    }

  /** A REAL MJPEG-shaped clip: `nFrames` back-to-back baseline JPEG
    * streams (the multipart / motion-JPEG layout — each frame a complete
    * SOI..EOI stream), encoded through the JDK's own ImageIO JPEG writer
    * at `quality`. `pixel(f, x, y, c)` supplies each frame's RGB bytes.
    * The lossy twin of [[encodeApng]]: frames with IDENTICAL inputs
    * produce identical bytes (and so identical decoded rasters — what
    * clip dedup keys on), while pixel CONTENT is quantized and therefore
    * deliberately outside the hash-exact oracle (the JPEG contract, see
    * [[Jpeg]]).
    */
  def encodeMjpeg(width: Int, height: Int, nFrames: Int,
                  pixel: (Int, Int, Int, Int) => Int,
                  quality: Float = 0.9f): Array[Byte] = {
    require(nFrames >= 1 && width > 0 && height > 0,
      s"bad clip ${width}x$height×$nFrames")
    val bos = new java.io.ByteArrayOutputStream()
    // One ImageIO writer per TASK THREAD, not per frame: the registry
    // lookup + writer construction dominated the encode of small frames
    // (the writer is reusable via setOutput per the ImageIO contract, and
    // encoding is deterministic, so the bytes are unchanged).
    val wr = jpegWriter.get()
    var f = 0
    while (f < nFrames) {
      val img = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      // fill the raster's backing int[] directly — same pixel values as
      // setRGB on TYPE_INT_RGB, without the per-call colormodel dance
      val px = img.getRaster.getDataBuffer
        .asInstanceOf[java.awt.image.DataBufferInt].getData
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          px(y * width + x) = (pixel(f, x, y, 0) << 16) |
            (pixel(f, x, y, 1) << 8) | pixel(f, x, y, 2)
          x += 1
        }
        y += 1
      }
      val wp = wr.getDefaultWriteParam
      wp.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      wp.setCompressionQuality(quality)
      // memory-cached stream: no temp-file I/O inside executor tasks
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      wr.setOutput(ios)
      wr.write(null, new javax.imageio.IIOImage(img, null, null), wp)
      ios.flush()
      f += 1
    }
    // release the last stream: a pooled task thread otherwise pins the
    // call's output buffer via the writer's retained setOutput reference
    // for the THREAD's lifetime, not the call's
    wr.setOutput(null)
    bos.toByteArray
  }

  private val jpegWriter = new ThreadLocal[javax.imageio.ImageWriter] {
    override def initialValue(): javax.imageio.ImageWriter =
      javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
  }

  /** `[start, end)` byte ranges of the concatenated JPEG frames of an
    * MJPEG stream — a real marker walk per frame (segments skipped by
    * their declared lengths, entropy data scanned with 0xFF00-stuffing
    * and RST awareness), NOT a byte grep for FFD9, which can occur inside
    * segment payloads. None when the stream is not wall-to-wall
    * well-formed JPEG frames.
    */
  private[graft] def mjpegFrameRanges(bytes: Array[Byte]): Option[Seq[(Int, Int)]] = {
    def u8(i: Int) = bytes(i) & 0xFF
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var p = 0
    while (p < bytes.length) {
      if (p + 2 > bytes.length || u8(p) != 0xFF || u8(p + 1) != 0xD8) return None
      val start = p
      p += 2
      var end = -1
      while (end < 0) {
        if (p + 2 > bytes.length) return None
        if (u8(p) != 0xFF) return None
        val m = u8(p + 1)
        if (m == 0xFF) p += 1 // fill byte
        else if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) p += 2 // standalone
        else if (m == 0xD9) end = p + 2 // EOI
        else if (m == 0xDA) { // SOS: header, then entropy-coded data
          if (p + 4 > bytes.length) return None
          val len = (u8(p + 2) << 8) | u8(p + 3)
          if (len < 2 || p + 2 + len > bytes.length) return None
          p += 2 + len
          var inEntropy = true
          while (inEntropy) {
            if (p + 1 >= bytes.length) return None
            if (u8(p) == 0xFF) {
              val m2 = u8(p + 1)
              if (m2 == 0x00 || (m2 >= 0xD0 && m2 <= 0xD7)) p += 2
              else if (m2 == 0xFF) p += 1
              else inEntropy = false // real marker; outer loop handles it
            } else p += 1
          }
        } else {
          if (p + 4 > bytes.length) return None
          val len = (u8(p + 2) << 8) | u8(p + 3)
          if (len < 2 || p + 2 + len > bytes.length) return None
          p += 2 + len
        }
      }
      out += ((start, end))
      p = end
    }
    if (out.isEmpty) None else Some(out.toSeq)
  }

  /** REAL MJPEG frame extraction: split the concatenated stream by marker
    * walk ([[mjpegFrameRanges]]), then decode EVERY frame through the
    * baseline [[Jpeg.decode]] (Huffman + dequant + IDCT + color convert).
    * Strict like [[decodeApngFrames]]: None if the container walk fails
    * or any frame is undecodable (the scrub posture — a half-broken clip
    * is dropped, not half-invented).
    */
  def decodeMjpegFrames(bytes: Array[Byte]): Option[Seq[PngImage]] =
    mjpegFrameRanges(bytes).flatMap { ranges =>
      val frames = ranges.map { case (s, e) =>
        Jpeg.decode(java.util.Arrays.copyOfRange(bytes, s, e))
      }
      if (frames.forall(_.isDefined)) Some(frames.map(_.get)) else None
    }

  /** Real MJPEG frame decoder for [[decodeFrames]]: every
    * `sampleEvery`-th frame fully decoded, one feature row per SAMPLED
    * frame — [frameIndex, width, height, channels, meanR, meanG, meanB]
    * (means over the decoded raster, 0-255 scale; a grayscale frame
    * replicates its channel). Undecodable payloads produce no frames.
    */
  def mjpegFrameDecoder(sampleEvery: Int = 2)(bytes: Array[Byte]): Iterator[Array[Float]] =
    decodeMjpegFrames(bytes) match {
      case None => Iterator.empty
      case Some(fs) =>
        fs.iterator.zipWithIndex
          .filter(_._2 % sampleEvery == 0)
          .map { case (img, fi) =>
            val n = img.width * img.height
            val sums = new Array[Long](3)
            var p = 0
            while (p < n) {
              var c = 0
              while (c < 3) {
                val ch = math.min(c, img.channels - 1)
                sums(c) += img.pixels(p * img.channels + ch) & 0xFF
                c += 1
              }
              p += 1
            }
            Array(fi.toFloat, img.width.toFloat, img.height.toFloat,
              img.channels.toFloat, sums(0).toFloat / n, sums(1).toFloat / n,
              sums(2).toFloat / n)
          }
    }

  /** Still-image raster decode dispatching on magic bytes: SOI →
    * [[Jpeg.decode]], `GIF8` → [[Gif.decode]] (palette-resolved to the
    * uniform 3-channel raster), PNG signature → [[decodePng]] — ONE
    * decode boundary for mixed-format image corpora (format must never
    * matter to downstream raster consumers: the same image under any of
    * the three codecs feeds identical bytes to the perceptual hashes).
    */
  def decodeImage(bytes: Array[Byte]): Option[PngImage] =
    if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFF &&
        (bytes(1) & 0xFF) == 0xD8) Jpeg.decode(bytes)
    else if (isGif(bytes)) Gif.decode(bytes).map(gifToRgb)
    else decodePng(bytes)

  private def isGif(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && bytes(0) == 'G' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == '8'

  /** Palette-resolve a GIF frame to the uniform 3-channel raster shape —
    * the same bytes an equal-content PNG frame decodes to, which is what
    * makes the raster hashes container-blind.
    */
  private[graft] def gifToRgb(g: Gif.GifImage): PngImage = {
    val px = new Array[Byte](g.width * g.height * 3)
    var p = 0
    while (p < g.width * g.height) {
      val c = g.rgb(p)
      px(p * 3) = ((c >> 16) & 0xFF).toByte
      px(p * 3 + 1) = ((c >> 8) & 0xFF).toByte
      px(p * 3 + 2) = (c & 0xFF).toByte
      p += 1
    }
    PngImage(g.width, g.height, 3, px)
  }

  /** Every frame of an animated GIF as RGB rasters. */
  def gifFramesAsRgb(bytes: Array[Byte]): Option[Seq[PngImage]] =
    if (isGif(bytes)) Gif.decodeFrames(bytes).map(_.map(gifToRgb)) else None

  /** Real CLIP frame decoder for [[decodeFrames]] dispatching on the
    * container's magic bytes — the decoder twin of the
    * [[graft.functions.ClipFrameHashes]] expression, so a mixed
    * APNG/MJPEG corpus feature-extracts through one boundary with ONE
    * uniform row shape: PNG signature → [[apngFrameDecoder]], SOI →
    * [[mjpegFrameDecoder]], both emitting
    * [fi, width, height, channels, meanR, meanG, meanB]. Undecodable
    * payloads produce no frames.
    */
  def clipFrameDecoder(sampleEvery: Int = 2)(bytes: Array[Byte]): Iterator[Array[Float]] =
    if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8)
      mjpegFrameDecoder(sampleEvery)(bytes)
    else if (bytes.length >= 4 && bytes(0) == 'G' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == '8')
      gifFrameDecoder(sampleEvery)(bytes)
    else apngFrameDecoder(sampleEvery)(bytes)

  /** Real IMAGE frame decoder for [[decodeFrames]] dispatching on the
    * payload's magic bytes: PNG through [[decodePng]], JPEG through the
    * baseline [[Jpeg.decode]] — one feature row per PIXEL ROW in either
    * case ([rowIndex, width, channels, mean per channel (first 3, or the
    * gray channel replicated), min, max]). Undecodable payloads produce
    * no frames.
    */
  def imageFrameDecoder(bytes: Array[Byte]): Iterator[Array[Float]] = {
    decodeImage(bytes) match {
      case None => Iterator.empty
      case Some(im) =>
        val stride = im.width * im.channels
        (0 until im.height).iterator.map { y =>
          val sums = new Array[Long](3)
          var mn = 255; var mx = 0
          var x = 0
          while (x < im.width) {
            var c = 0
            while (c < 3) {
              val ch = math.min(c, im.channels - 1)
              val v = im.pixels(y * stride + x * im.channels + ch) & 0xFF
              sums(c) += v
              if (v < mn) mn = v
              if (v > mx) mx = v
              c += 1
            }
            x += 1
          }
          Array(y.toFloat, im.width.toFloat, im.channels.toFloat,
            sums(0).toFloat / im.width, sums(1).toFloat / im.width,
            sums(2).toFloat / im.width, mn.toFloat, mx.toFloat)
        }
    }
  }

  /** Real frame decoder for [[decodeFrames]]: decodes a PNG payload and
    * emits one feature row per PIXEL ROW — [rowIndex, width, channels,
    * meanR, meanG, meanB, min, max] (means/extrema over the row's first
    * three channels, 0-255 scale). Payloads that are not decodable PNGs
    * produce no frames (the scrub posture: undecodable media is dropped,
    * not invented).
    */
  def pngFrameDecoder(bytes: Array[Byte]): Iterator[Array[Float]] =
    decodePng(bytes) match {
      case None => Iterator.empty
      case Some(img) =>
        val stride = img.width * img.channels
        (0 until img.height).iterator.map { y =>
          val sums = new Array[Long](3)
          var mn = 255; var mx = 0
          var x = 0
          while (x < img.width) {
            var c = 0
            while (c < 3) {
              val v = img.pixels(y * stride + x * img.channels + c) & 0xFF
              sums(c) += v
              if (v < mn) mn = v
              if (v > mx) mx = v
              c += 1
            }
            x += 1
          }
          Array(y.toFloat, img.width.toFloat, img.channels.toFloat,
            sums(0).toFloat / img.width, sums(1).toFloat / img.width,
            sums(2).toFloat / img.width, mn.toFloat, mx.toFloat)
        }
    }

  /** Attach a binary payload column. For the synthetic corpus the payload is
    * the UTF-8 document text — standing in for real image/audio bytes.
    */
  def asBinary(docs: DataFrame, textCol: String = "text",
               idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("media_id"),
      encode(col(textCol), "UTF-8").as("content"))

  /** Columnar metadata extraction over the binary payload. Deterministic
    * arithmetic on byte length — the decode STUB — expressed with built-in
    * expressions so it is codegen'd and oracle-checkable.
    */
  def decodeMeta(media: DataFrame): DataFrame = {
    val nb = length(col("content"))
    val width = lit(64) + pmod(nb, lit(576))
    media.select(
      col("media_id"),
      nb.cast("long").as("n_bytes"),
      width.cast("int").as("width"),
      floor(width * 3 / lit(4.0)).cast("int").as("height"),
      (lit(1) + floor(nb / lit(1000.0))).cast("int").as("n_frames"))
  }

  /** Partition sizing for the decode stage: repartition so each task holds
    * ~`targetBytesPerPartition` of payload (decoded frames are usually an
    * order of magnitude larger than the encoded bytes — size for the decoded
    * footprint). Range-partitioning by a random key gives near-uniform byte
    * volume per task without a skewed-hash hot spot.
    */
  def repartitionForDecode(media: DataFrame,
                           targetBytesPerPartition: Long = 64L << 20): DataFrame = {
    val total = media
      .select(coalesce(sum(length(col("content")).cast("long")), lit(0L)))
      .head().getLong(0)
    val parts = math.max(1, (total / targetBytesPerPartition).toInt)
    media.repartition(parts)
  }

  /** The real-decoder boundary: per-partition imperative decode of binary
    * payloads into frame feature rows. `decoder` maps raw bytes to fixed-size
    * frame features; partitions should be pre-sized (repartition by byte
    * volume) so one partition's decoded frames fit in executor memory.
    *
    * A production decoder would wrap libjpeg/ffmpeg here; this container has
    * no codecs, so callers use [[fakeFrameDecoder]] in tests.
    */
  def decodeFrames(spark: SparkSession, media: DataFrame,
                   decoder: Array[Byte] => Iterator[Array[Float]]): DataFrame = {
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] =
      media.select(col("media_id"), col("content")).as[(Long, Array[Byte])]
    ds.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        decoder(bytes).zipWithIndex.map { case (feat, i) => (id, i, feat) }
      }
    }.toDF("media_id", "frame_idx", "features")
  }

  /** Deterministic stand-in decoder: one "frame" per 1000 bytes, each an
    * 8-dim feature vector derived from the frame's byte window.
    */
  def fakeFrameDecoder(bytes: Array[Byte]): Iterator[Array[Float]] = {
    val nFrames = 1 + bytes.length / 1000
    (0 until nFrames).iterator.map { f =>
      val start = f * 1000
      val window = bytes.slice(start, math.min(start + 1000, bytes.length))
      val feat = new Array[Float](8)
      var i = 0
      while (i < window.length) {
        feat(i % 8) += (window(i) & 0xFF) / 255.0f
        i += 1
      }
      feat
    }
  }
}
