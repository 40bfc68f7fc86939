package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Elementwise sum of array<double> vectors — the aggregation primitive for
  * embedding mean-pooling and k-means centroids. A TypedImperativeAggregate
  * with a primitive double[] buffer: partial aggregation happens map-side,
  * so the shuffle carries one vector per (group, task) instead of one row
  * per (vector, dimension) as the posexplode formulation does.
  */
case class VectorSumD(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val b = if (buf.length < n) java.util.Arrays.copyOf(buf, n) else buf
      var i = 0
      while (i < n) { b(i) += arr.getDouble(i); i += 1 }
      b
    }
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    val (long, short) = if (b1.length >= b2.length) (b1, b2) else (b2, b1)
    var i = 0
    while (i < short.length) { long(i) += short(i); i += 1 }
    long
  }

  override def eval(buf: Array[Double]): Any =
    if (buf.isEmpty) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def withNewMutableAggBufferOffset(o: Int): VectorSumD =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorSumD =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): VectorSumD = copy(child = c)
}
