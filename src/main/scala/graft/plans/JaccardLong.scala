package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
    extends BinaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.expect("graft_jaccard_long", Seq(
      TypeChecks.longArray("left", left.dataType),
      TypeChecks.longArray("right", right.dataType)))

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(l: Any, r: Any): Any =
    KernelOps.jaccardLong100(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.KernelOps.jaccardLong100($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object JaccardLong100 {
  def column(a: Column, b: Column): Column =
    ExprBridge.toColumn(JaccardLong100(ExprBridge.toExpression(a), ExprBridge.toExpression(b)))
}
