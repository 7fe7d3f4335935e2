package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ExprBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact levenshtein ratio floor(100·(1 − lev/maxlen)), maxlen >= 1 —
  * value-identical to [[graft.functions.Similarity.ratio]] (the
  * declarative `levenshtein` + arithmetic the DuckDB oracle mirrors)
  * but a byte-level rolling-row DP. Exact for the engine's normalized
  * ASCII inputs, where byte distance == character distance; used by
  * ranking paths (top-k) that need true scores with no qualifying
  * floor. */
case class RatioScore(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.expect("graft_ratio", Seq(
      TypeChecks.string("left", left.dataType),
      TypeChecks.string("right", right.dataType)))

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(l: Any, r: Any): Any =
    KernelOps.ratioScore(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.KernelOps.ratioScore($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object RatioScore {
  def column(a: Column, b: Column): Column =
    ExprBridge.toColumn(RatioScore(ExprBridge.toExpression(a), ExprBridge.toExpression(b)))
}
