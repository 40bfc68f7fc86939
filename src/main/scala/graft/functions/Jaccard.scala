package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaccard similarity of two array<string> columns as ONE hash-set pass.
  *
  * The declarative form `size(array_intersect(a,b)) /
  * size(array_union(a,b))` materializes two intermediate arrays per row
  * pair; only their sizes are consumed. This expression computes both
  * distinct-count semantics (identical to array_intersect/array_union and
  * to DuckDB's list_intersect/list_distinct(list_concat)) without building
  * either array. NULL on empty union, matching Divide's null-on-zero.
  */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val setA = new java.util.HashSet[UTF8String]()
    var i = 0
    val na = a.numElements()
    while (i < na) {
      if (!a.isNullAt(i)) setA.add(a.getUTF8String(i))
      i += 1
    }
    val seenB = new java.util.HashSet[UTF8String]()
    var inter = 0
    var j = 0
    val nb = b.numElements()
    while (j < nb) {
      if (!b.isNullAt(j)) {
        val el = b.getUTF8String(j)
        if (seenB.add(el) && setA.contains(el)) inter += 1
      }
      j += 1
    }
    val union = setA.size() + seenB.size() - inter
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

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case d: Divide =>
        (stripCast(d.left), stripCast(d.right)) match {
          case (Size(ArrayIntersect(a1, b1), _), Size(ArrayUnion(a2, b2), _))
              if a1.semanticEquals(a2) && b1.semanticEquals(b2) &&
                a1.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] &&
                a1.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
                  .elementType == org.apache.spark.sql.types.StringType =>
            JaccardSim(a1, b1)
          case _ => d
        }
    }
}
