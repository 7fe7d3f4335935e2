package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ExprBridge
import org.apache.spark.sql.types._

/** Native vector-math expressions for the ANN/near-dup operators —
  * value-identical (bitwise, FP-order included) to the declarative
  * `aggregate(zip_with(...))` folds in [[graft.functions.Vectors]]
  * that the DuckDB oracle mirrors, but a primitive loop instead of
  * per-element interpreted lambdas with boxing (the HOF expressions
  * are never codegen'd). Codegen emits one static [[KernelOps]] call
  * per expression, so the kernels run inside the whole-stage loop.
  *
  * FP exactness contract: elements are promoted to double BEFORE the
  * multiply and accumulated by a sequential left fold in index order —
  * the same operation order as the declarative twin and the DuckDB
  * `list_sum(list_transform(...))`, so results are bit-identical.
  */
private object VecUtil {
  def isFloatArr(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
}

/** Sequential-fold dot product; null when lengths differ or an element
  * is null (the zip_with padding / null-propagation semantics of the
  * declarative twin) — hence nullable even over non-null children. */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.expect("graft_vec_dot", Seq(
      TypeChecks.vecArray("a", left.dataType),
      TypeChecks.vecArray("b", right.dataType)))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  @transient private lazy val lf = VecUtil.isFloatArr(left)
  @transient private lazy val rf = VecUtil.isFloatArr(right)
  override protected def nullSafeEval(l: Any, r: Any): Any =
    KernelOps.vecDot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], lf, rf)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("dot")
      s"""
         |java.lang.Double $boxed = graft.plans.KernelOps.vecDot($a, $b, $lf, $rf);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** All `tables` sign-LSH bucket ids in one pass over the vector.
  * Per (table, bit j): proj_j = Σ_i v_i · comp(table·bits+j, i) folded
  * sequentially in i; bit j set iff proj_j > 0 (a null/length-0 vector
  * contributes no set bits — the declarative null-propagation). */
case class LshBuckets(child: Expression, bits: Int, tables: Int,
                      tableOffset: Int = 0)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.expect("graft_lsh_buckets", Seq(TypeChecks.vecArray("vec", child.dataType)))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  @transient private lazy val vf = VecUtil.isFloatArr(child)
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    // declarative twin: when(NULL > 0, ...).otherwise(0) → all-zero buckets
    if (v == null) KernelOps.lshBucketsNull(tables)
    else KernelOps.lshBuckets(v.asInstanceOf[ArrayData], vf, bits, tables,
      tableOffset)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val resultCode = code"""
      |${c.code}
      |ArrayData ${ev.value} = ${c.isNull}
      |  ? graft.plans.KernelOps.lshBucketsNull($tables)
      |  : graft.plans.KernelOps.lshBuckets(${c.value}, $vf, $bits, $tables, $tableOffset);
    """.stripMargin
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Product-quantization encode in one primitive pass: per subspace,
  * the index of the L2-nearest codeword. Value-identical to the
  * declarative `SimilaritySearch.pqEncode` twin (VectorsSpec
  * property-checks them over the embeddings corpus): distances fold
  * sequentially in element order with the same promote-then-subtract
  * arithmetic, and ties keep the FIRST codeword index — matching
  * `array_position(dists, array_min(dists))`. A subspace with missing
  * or null elements yields a null code element, like the zip_with
  * null-padding chain. The m × k × subDim codeword table rides in the
  * expression as plain doubles (a few KB — ships with the task
  * closure, no broadcast round-trip; codegen pins it in the generated
  * class's reference array). */
case class PqEncode(child: Expression, codebook: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.expect("graft_pq_encode",
      Seq(TypeChecks.vecArray("vec", child.dataType)))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
  @transient private lazy val vf = VecUtil.isFloatArr(child)
  // twin parity on the edges: a null VECTOR yields an array of m null
  // codes (slice/zip_with/aggregate null-propagate per ELEMENT in the
  // declarative chain, never to the outer array)
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) KernelOps.pqEncodeNull(codebook.length)
    else KernelOps.pqEncode(v.asInstanceOf[ArrayData], vf, codebook)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "double[][][]")
    val resultCode = code"""
      |${c.code}
      |ArrayData ${ev.value} = ${c.isNull}
      |  ? graft.plans.KernelOps.pqEncodeNull(${codebook.length})
      |  : graft.plans.KernelOps.pqEncode(${c.value}, $vf, $cb);
    """.stripMargin
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Dot product of two PQ-decoded codes straight off their codebooks —
  * bitwise-identical to `VecDot(pqDecode(left, cbLeft),
  * pqDecode(right, cbRight))` (KernelOps.pqPairDot documents the
  * parity contract) with zero per-pair array materialization. Children
  * are the two `array<int>` code columns; the codebooks ride in the
  * expression like [[PqEncode]]'s (a few KB of plain doubles, pinned
  * in the generated class's reference array). */
case class PqPairDot(left: Expression, right: Expression,
                     cbLeft: Array[Array[Array[Double]]],
                     cbRight: Array[Array[Array[Double]]])
    extends BinaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.expect("graft_pq_pair_dot", Seq(
      TypeChecks.intArray("code_a", left.dataType),
      TypeChecks.intArray("code_b", right.dataType)))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override protected def nullSafeEval(l: Any, r: Any): Any =
    KernelOps.pqPairDot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      cbLeft, cbRight)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ca = ctx.addReferenceObj("pqPairCbA", cbLeft, "double[][][]")
    val cb = ctx.addReferenceObj("pqPairCbB", cbRight, "double[][][]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("pairDot")
      s"""
         |java.lang.Double $boxed = graft.plans.KernelOps.pqPairDot($a, $b, $ca, $cb);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin
    })
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** MinHash signature agreement count over two `array<bigint>`
  * signatures — bitwise-identical to the declarative
  * `aggregate(zip_with(a, b, (x,y) => when(x===y,1).otherwise(0)), 0, _+_)`
  * (KernelOps.sigAgree documents the edge parity), but codegen'd: the
  * HOF pair is CodegenFallback and was evaluated interpreted per
  * candidate pair inside the d8 verification join's condition. */
case class SigAgree(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.expect("graft_sig_agree", Seq(
      TypeChecks.longArray("sig_a", left.dataType),
      TypeChecks.longArray("sig_b", right.dataType)))
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override protected def nullSafeEval(l: Any, r: Any): Any =
    KernelOps.sigAgree(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.KernelOps.sigAgree($a, $b).intValue();")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** PQ reconstruction squared error ‖v − decode(encode(v))‖² — the
  * codebook-staleness statistic, evaluated once per batch ROW by the
  * incremental-ANN drift check. The declarative chain materializes the
  * code, the decoded array (flatten + m element_at), an elementwise
  * zip_with product array, and folds it with an interpreted aggregate
  * lambda — per row; this is one primitive pass reading the codebook
  * directly (parity contract in [[KernelOps.pqReconSqErr]]). */
case class PqReconSqErr(child: Expression, codebook: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.expect("graft_pq_recon_sqerr",
      Seq(TypeChecks.vecArray("vec", child.dataType)))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  @transient private lazy val vf = VecUtil.isFloatArr(child)
  override protected def nullSafeEval(v: Any): Any =
    KernelOps.pqReconSqErr(v.asInstanceOf[ArrayData], vf, codebook)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqReconCb", codebook, "double[][][]")
    nullSafeCodeGen(ctx, ev, a => {
      val boxed = ctx.freshName("sqerr")
      s"""
         |java.lang.Double $boxed = graft.plans.KernelOps.pqReconSqErr($a, $vf, $cb);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object VecExprs {
  def dot(a: Column, b: Column): Column =
    ExprBridge.toColumn(VecDot(ExprBridge.toExpression(a), ExprBridge.toExpression(b)))
  /** array of bucket ids for tables 0..tables-1 */
  def lshBuckets(v: Column, bits: Int, tables: Int): Column =
    ExprBridge.toColumn(LshBuckets(ExprBridge.toExpression(v), bits, tables))
  /** array of bucket ids for absolute tables offset..offset+tables-1 —
    * an independent hyperplane family for hot-bucket refinement. */
  def lshBucketsOff(v: Column, bits: Int, tables: Int, tableOffset: Int): Column =
    ExprBridge.toColumn(
      LshBuckets(ExprBridge.toExpression(v), bits, tables, tableOffset))
  def pqEncode(v: Column, codebook: Array[Array[Array[Double]]]): Column =
    ExprBridge.toColumn(PqEncode(ExprBridge.toExpression(v), codebook))
  /** agreement count of two minhash signatures (codegen'd HOF twin) */
  def sigAgree(a: Column, b: Column): Column =
    ExprBridge.toColumn(SigAgree(ExprBridge.toExpression(a),
      ExprBridge.toExpression(b)))
  /** dot(decode(cbA, a), decode(cbB, b)) without materializing either
    * decoded array — the near-dup screens' per-collision hot path. */
  def pqPairDot(a: Column, b: Column, cbA: Array[Array[Array[Double]]],
                cbB: Array[Array[Array[Double]]]): Column =
    ExprBridge.toColumn(PqPairDot(ExprBridge.toExpression(a),
      ExprBridge.toExpression(b), cbA, cbB))
  /** ‖v − decode(encode(v))‖² — the drift statistic's per-row kernel. */
  def pqReconSqErr(v: Column, codebook: Array[Array[Array[Double]]]): Column =
    ExprBridge.toColumn(PqReconSqErr(ExprBridge.toExpression(v), codebook))
}
