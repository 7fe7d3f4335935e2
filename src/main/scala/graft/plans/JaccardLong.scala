package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ExprBridge
import org.apache.spark.sql.types._

/** Jaccard*100 (truncated int) between two long arrays, counting
  * DISTINCT elements — value-identical to the declarative
  * `jaccard100(array_distinct(a), array_distinct(b))` (set cardinality
  * is order-independent, so sort+dedup+merge gives the same counts as
  * the hash-set array functions), but primitive sorts and one merge
  * instead of four interpreted array traversals with boxing. */
case class JaccardLong100(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = JaccardLong100.sortedDistinct(l.asInstanceOf[ArrayData])
    val b = JaccardLong100.sortedDistinct(r.asInstanceOf[ArrayData])
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      val c = java.lang.Long.compare(a(i), b(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val union = a.length + b.length - inter
    if (union == 0) 0
    else math.floor(inter.toDouble * 100 / union.toDouble).toInt
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object JaccardLong100 {
  private def sortedDistinct(arr: ArrayData): Array[Long] = {
    val n = arr.numElements()
    val a = arr.toLongArray()
    java.util.Arrays.sort(a)
    var w = 0
    var i = 0
    while (i < n) {
      if (w == 0 || a(i) != a(w - 1)) { a(w) = a(i); w += 1 }
      i += 1
    }
    if (w == n) a else java.util.Arrays.copyOf(a, w)
  }

  def column(a: Column, b: Column): Column =
    ExprBridge.toColumn(JaccardLong100(ExprBridge.toExpression(a), ExprBridge.toExpression(b)))
}
