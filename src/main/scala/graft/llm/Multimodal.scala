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
  * codec library needed. Only FRAME decoding (pixel data) remains stubbed
  * (`fakeFrameDecoder` — no image/audio codecs in this environment); the
  * Spark-side plumbing — schema, batching, partition sizing, the
  * mapPartitions decode boundary — is real and tested, so swapping in a
  * JNI/JavaCV pixel decoder is a one-function change.
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
    } else None
  }

  /** A decoded-media metadata record. */
  final case class MediaMeta(media_id: Long, n_bytes: Long, width: Int,
      height: Int, n_frames: Int)

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
