package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** KMV (k-minimum-values) distinct-count sketching over a non-negative LONG
  * id column.
  *
  * Exact `count(DISTINCT x)` shuffles every distinct value to its reducer —
  * state ∝ cardinality, the same shape that makes exact percentile a
  * scale-killer. KMV keeps the k SMALLEST distinct hash values: constant
  * state per (group, task), map-side combinable (merge = set-union, keep k
  * smallest), with standard error ≈ 1/√(k−2). Spark's own
  * approx_count_distinct (HLL++) has the same posture but hashes with
  * xxhash64 — a query keyed on it can never be replayed by another engine.
  * This sketch hashes with the repo's engine-agnostic basis (one
  * [[graft.llm.Corpus.mix32]]-style scatter round, then the seeded affine
  * draw, all exact BIGINT arithmetic mod 1e9+7), so the DuckDB oracle
  * rebuilds the IDENTICAL k-minima and estimates, bit for bit.
  */
private[functions] object KmvOps {
  /** One mix32 scatter round (JVM twin of Corpus.mix32's Column form;
    * identical for the non-negative ids the sketch is defined over) then
    * the seeded affine draw into [0, P1).
    */
  def hash(x: Long, a: Long, b: Long): Long = {
    val m = graft.llm.Corpus.M32
    val x0 = x % m
    val x1 = ((x0 ^ (x0 >>> 16)) * graft.llm.Corpus.MixK) % m
    val x2 = ((x1 ^ (x1 >>> 16)) * graft.llm.Corpus.MixK) % m
    val mixed = x2 ^ (x2 >>> 16)
    (a * (mixed % PolyHash.P1) + b) % PolyHash.P1
  }

  def insert(buf: java.util.TreeSet[java.lang.Long], h: Long, k: Int): Unit =
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) { buf.add(h); if (buf.size > k) { buf.pollLast(); () } }

  def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long], k: Int): java.util.TreeSet[java.lang.Long] = {
    b1.addAll(b2)
    while (b1.size > k) b1.pollLast()
    b1
  }

  def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.size)
    buf.forEach(h => { bb.putLong(h); () })
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < bytes.length / 8) { out.add(bb.getLong()); i += 1 }
    out
  }
}

/** Buffer plumbing shared by the KMV aggregates (a trait, not an abstract
  * class: Java deserialization of the expression tree requires the
  * concrete case classes to sit directly on the serializable Spark
  * hierarchy).
  */
private[functions] trait KmvBufferOps {
  self: TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] =>

  def child: Expression
  def k: Int
  def seed: Long

  @transient private lazy val ab = graft.llm.Corpus.hashConstants(seed)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) KmvOps.insert(buf, KmvOps.hash(v.asInstanceOf[Long], ab._1, ab._2), k)
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] =
    KmvOps.merge(b1, b2, k)

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] =
    KmvOps.serialize(buf)
  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] =
    KmvOps.deserialize(bytes)

  override def nullable: Boolean = false
}

/** Distinct-count ESTIMATE: with h₍ₖ₎ the k-th smallest distinct hash in
  * [0, P1), est = (k−1)·P1/h₍ₖ₎ — one IEEE division of
  * exactly-representable integers, deterministic across engines. Fewer
  * than k distinct hashes means the sketch IS the distinct set: the
  * estimate is the exact count.
  */
case class KmvDistinctAgg(child: Expression, k: Int, seed: Long,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] with KmvBufferOps {

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toDouble
    else ((k - 1).toDouble * PolyHash.P1.toDouble) / buf.last().toDouble

  override def dataType: DataType = DoubleType

  override def withNewMutableAggBufferOffset(o: Int): KmvDistinctAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvDistinctAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KmvDistinctAgg =
    copy(child = c)
}

/** The raw SKETCH: the ascending array of the k smallest distinct hashes —
  * the composable form. Sketches of different relations combine into
  * theta-style set-operation estimates ([[graft.analytics.Sketches
  * .kmvOverlap]]): θ = min of the two k-th minima bounds the region both
  * sketches observed exhaustively, and the common hashes below θ estimate
  * the intersection.
  */
case class KmvMinimaAgg(child: Expression, k: Int, seed: Long,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] with KmvBufferOps {

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    var i = 0
    buf.forEach(h => { arr(i) = h; i += 1 })
    new GenericArrayData(arr)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def withNewMutableAggBufferOffset(o: Int): KmvMinimaAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvMinimaAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KmvMinimaAgg =
    copy(child = c)
}
