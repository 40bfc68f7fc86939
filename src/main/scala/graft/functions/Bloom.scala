package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Bloom-filter kernels over the engine-agnostic [[PolyHash]] basis.
  *
  * Membership hashing is classic double hashing: element s probes positions
  * `(h1(s) + i·h2(s)) mod m` for i ∈ [0, k). Both h1 and h2 are plain
  * modular polynomial hashes (< 2^30, so h1 + i·h2 never overflows BIGINT
  * for any sane k), which means a SQL oracle can rebuild the EXACT bit set
  * — false positives included — with integer arithmetic. A bloom built on
  * xxhash64 or Spark's built-in BloomFilterAggregate could never be checked
  * cross-engine.
  *
  * Determinism contract: the bitmap is an OR-fold of per-element bit sets —
  * commutative and associative — so the filter is bit-identical for any
  * partitioning, merge order, or engine. Decisions made through it
  * (including its false positives) are therefore reproducible artifacts,
  * not sampling noise.
  */
object Bloom {
  /** Bit positions of `s` in an `mBits` filter with `k` probes. */
  def positions(s: String, mBits: Int, k: Int): Array[Long] = {
    val a = PolyHash.h1(s)
    val b = PolyHash.h2(s)
    Array.tabulate(k)(i => (a + i.toLong * b) % mBits)
  }
}

/** Aggregate an array<string> column (one element set per array entry) into
  * an `mBits`-wide bloom bitmap as array<long> of `mBits/64` words. The
  * buffer is a primitive long[]: partial aggregation is map-side, the
  * shuffle carries one fixed-size bitmap per task — independent of how many
  * elements were inserted, which is the whole point at corpus scale.
  */
case class BloomBitsAgg(child: Expression, mBits: Int, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {
  require(mBits > 0 && mBits % 64 == 0, s"mBits must be a positive multiple of 64: $mBits")
  require(k >= 1, s"k must be >= 1: $k")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](mBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var j = 0
      while (j < n) {
        val s = arr.getUTF8String(j).toString
        val a = PolyHash.h1(s)
        val b = PolyHash.h2(s)
        var i = 0
        while (i < k) {
          val pos = ((a + i.toLong * b) % mBits).toInt
          buf(pos >>> 6) |= (1L << (pos & 63))
          i += 1
        }
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(o: Int): BloomBitsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomBitsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BloomBitsAgg =
    copy(child = c)
}

/** Count of `items` (array<string>) whose k probe positions are ALL set in
  * `bits` (the array<long> bitmap [[BloomBitsAgg]] builds) — the per-row
  * "how many of this document's shingles might the filter contain" probe,
  * one tight loop per row.
  */
case class BloomCountHits(left: Expression, right: Expression, mBits: Int, k: Int)
    extends BinaryExpression with CodegenFallback {
  require(mBits > 0 && mBits % 64 == 0, s"mBits must be a positive multiple of 64: $mBits")
  require(k >= 1, s"k must be >= 1: $k")

  override def dataType: DataType = IntegerType

  override def nullSafeEval(bitsAny: Any, itemsAny: Any): Any = {
    val bits = bitsAny.asInstanceOf[ArrayData].toLongArray()
    val items = itemsAny.asInstanceOf[ArrayData]
    val n = items.numElements()
    var hits = 0
    var j = 0
    while (j < n) {
      val s = items.getUTF8String(j).toString
      val a = PolyHash.h1(s)
      val b = PolyHash.h2(s)
      var all = true
      var i = 0
      while (all && i < k) {
        val pos = ((a + i.toLong * b) % mBits).toInt
        all = (bits(pos >>> 6) & (1L << (pos & 63))) != 0
        i += 1
      }
      if (all) hits += 1
      j += 1
    }
    hits
  }

  override def checkInputDataTypes() = {
    val ok = left.dataType.isInstanceOf[ArrayType] &&
      left.dataType.asInstanceOf[ArrayType].elementType == LongType &&
      right.dataType.isInstanceOf[ArrayType] &&
      right.dataType.asInstanceOf[ArrayType].elementType == StringType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bloom_count_hits expects (array<bigint>, array<string>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomCountHits =
    copy(left = l, right = r)
}
