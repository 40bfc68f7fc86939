package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType}

/** KMV (k-minimum-values) distinct-count sketch over a non-negative LONG id
  * column.
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
  * rebuilds the IDENTICAL k-minima and estimate, bit for bit.
  *
  * Estimator: with h₍ₖ₎ the k-th smallest distinct hash in [0, P1),
  * est = (k−1) · P1 / h₍ₖ₎ — one IEEE division of exactly-representable
  * integers, deterministic across engines. Fewer than k distinct hashes
  * means the sketch IS the distinct set: the estimate is the exact count.
  */
case class KmvDistinctAgg(child: Expression, k: Int, seed: Long,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {
  require(k >= 2, s"KMV needs k >= 2: $k")

  private val (a, b) = graft.llm.Corpus.hashConstants(seed)

  private def hash(x: Long): Long = {
    // the mix32 scatter round (JVM twin of Corpus.mix32's Column form;
    // identical for the non-negative ids this sketch is defined over)
    val m = graft.llm.Corpus.M32
    val x0 = x % m
    val x1 = ((x0 ^ (x0 >>> 16)) * graft.llm.Corpus.MixK) % m
    val x2 = ((x1 ^ (x1 >>> 16)) * graft.llm.Corpus.MixK) % m
    val mixed = x2 ^ (x2 >>> 16)
    (a * (mixed % PolyHash.P1) + b) % PolyHash.P1
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = hash(v.asInstanceOf[Long])
      if (buf.size < k) { buf.add(h); () }
      else if (h < buf.last()) { buf.add(h); if (buf.size > k) { buf.pollLast(); () } }
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    b1.addAll(b2)
    while (b1.size > k) b1.pollLast()
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toDouble
    else ((k - 1).toDouble * PolyHash.P1.toDouble) / buf.last().toDouble

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.size)
    buf.forEach(h => { bb.putLong(h); () })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < bytes.length / 8) { out.add(bb.getLong()); i += 1 }
    out
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(o: Int): KmvDistinctAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvDistinctAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KmvDistinctAgg =
    copy(child = c)
}
