package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaccard similarity of two array<string> or array<bigint> columns as
  * ONE hash-set pass.
  *
  * The declarative form `size(array_intersect(a,b)) /
  * size(array_union(a,b))` materializes two intermediate arrays per row
  * pair; only their sizes are consumed. This expression computes both
  * distinct-count semantics (identical to array_intersect/array_union and
  * to DuckDB's list_intersect/list_distinct(list_concat)) without building
  * either array. NULL on empty union, matching Divide's null-on-zero.
  * A NULL *element* counts as one distinct value present in its array —
  * exactly array_intersect/array_union's semantics — so the FuseJaccard
  * rewrite is safe on containsNull arrays too. The bigint path serves the
  * PairsIndex hashed-shingle sets (same statistic, 64-bit element space).
  */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType

  // Both operands must agree on the element type: nullSafeEval dispatches
  // ONE accessor (getLong vs getUTF8String) for both sides, so a mixed
  // array<bigint>/array<string> call must fail analysis, not read garbage.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "jaccard_sim requires two array<string> or two array<bigint> " +
          s"arguments, got ${l.catalogString} and ${r.catalogString}")
    }

  private lazy val isLongElems = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val setA = new java.util.HashSet[AnyRef]()
    def elem(arr: ArrayData, i: Int): AnyRef =
      if (isLongElems) java.lang.Long.valueOf(arr.getLong(i))
      else arr.getUTF8String(i)
    var hasNullA = false
    var i = 0
    val na = a.numElements()
    while (i < na) {
      if (a.isNullAt(i)) hasNullA = true else setA.add(elem(a, i))
      i += 1
    }
    val seenB = new java.util.HashSet[AnyRef]()
    var hasNullB = false
    var inter = 0
    var j = 0
    val nb = b.numElements()
    while (j < nb) {
      if (b.isNullAt(j)) {
        if (!hasNullB) { hasNullB = true; if (hasNullA) inter += 1 }
      } else {
        val el = elem(b, j)
        if (seenB.add(el) && setA.contains(el)) inter += 1
      }
      j += 1
    }
    val union = setA.size() + (if (hasNullA) 1 else 0) +
      seenB.size() + (if (hasNullB) 1 else 0) - inter
    if (union == 0) null else java.lang.Double.valueOf(inter.toDouble / union)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSim =
    copy(left = l, right = r)
}

/** Optimizer rule: rewrite the declarative Jaccard form into [[JaccardSim]].
  * Injected by GraftExtensions (`injectOptimizerRule`), so spark.sql users
  * writing the textbook formulation get the fused evaluation for free.
  */
object FuseJaccard extends Rule[LogicalPlan] {
  private def stripCast(e: Expression): Expression = e match {
    case c: Cast if c.dataType == DoubleType => c.child
    case other => other
  }

  private def isStringArray(dt: DataType): Boolean = dt match {
    case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case d: Divide =>
        (stripCast(d.left), stripCast(d.right)) match {
          case (Size(ArrayIntersect(a1, b1), _), Size(ArrayUnion(a2, b2), _))
              if a1.semanticEquals(a2) && b1.semanticEquals(b2) &&
                isStringArray(a1.dataType) && isStringArray(b1.dataType) =>
            JaccardSim(a1, b1)
          case _ => d
        }
    }
}
