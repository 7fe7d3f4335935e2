package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ExprBridge
import org.apache.spark.sql.types._

/** Custom Catalyst expression: MinHash signature from precomputed
  * per-shingle base hashes — value-identical to the declarative
  * `transform(sequence(...), j -> array_min(transform(...)))` nest in
  * graft.functions.Hashing (which the DuckDB oracle mirrors), but one
  * tight primitive loop instead of H interpreted array traversals with
  * per-element boxing: sig[j] = min over h of (A_j·h + B_j) mod M31,
  * A_j = (j+1)·999983 mod M31, B_j = j·101, M31 = 2^31-1.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {
  // a negative count would surface as a NegativeArraySizeException
  // mid-query instead of a constructor-time message
  require(numHashes >= 1, s"need numHashes >= 1, got $numHashes")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.expect("graft_minhash", Seq(TypeChecks.longArray("base_hashes", child.dataType)))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    KernelOps.minhashSig(v.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.KernelOps.minhashSig($c, $numHashes)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashSig {
  def column(baseHashes: Column, numHashes: Int): Column =
    ExprBridge.toColumn(MinHashSig(ExprBridge.toExpression(baseHashes), numHashes))
}
