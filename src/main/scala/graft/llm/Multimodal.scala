package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus the distributed decode/feature-extract
  * scaffolding.
  *
  * The decode step itself is STUBBED (no image/audio codecs in this
  * environment): `fakeDecode` derives deterministic metadata from the bytes.
  * Everything Spark-side — schema, batching, partition sizing, the
  * mapPartitions decode boundary — is real and tested, so swapping in a
  * JNI/JavaCV decoder is a one-function change.
  */
object Multimodal {

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
