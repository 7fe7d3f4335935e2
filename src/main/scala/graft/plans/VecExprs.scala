package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ExprBridge
import org.apache.spark.sql.types._

/** Native vector-math expressions for the ANN/near-dup operators —
  * value-identical (bitwise, FP-order included) to the declarative
  * `aggregate(zip_with(...))` folds in [[graft.functions.Vectors]]
  * that the DuckDB oracle mirrors, but a primitive loop instead of
  * per-element interpreted lambdas with boxing (the HOF expressions
  * are never codegen'd).
  *
  * FP exactness contract: elements are promoted to double BEFORE the
  * multiply and accumulated by a sequential left fold in index order —
  * the same operation order as the declarative twin and the DuckDB
  * `list_sum(list_transform(...))`, so results are bit-identical.
  */
private object VecUtil {
  /** Element getter promoting float→double (exact) to match
    * `x.cast("double")`. */
  def get(a: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
  def isFloatArr(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
}

/** Sequential-fold dot product; null when lengths differ or an element
  * is null (the zip_with padding / null-propagation semantics of the
  * declarative twin). */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  @transient private lazy val lf = VecUtil.isFloatArr(left)
  @transient private lazy val rf = VecUtil.isFloatArr(right)
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += VecUtil.get(a, lf, i) * VecUtil.get(b, rf, i)
      i += 1
    }
    acc
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** All `tables` sign-LSH bucket ids in one pass over the vector.
  * Per (table, bit j): proj_j = Σ_i v_i · comp(table·bits+j, i) folded
  * sequentially in i; bit j set iff proj_j > 0 (a null/length-0 vector
  * contributes no set bits — the declarative null-propagation). */
case class LshBuckets(child: Expression, bits: Int, tables: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  @transient private lazy val vf = VecUtil.isFloatArr(child)
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    // declarative twin: when(NULL > 0, ...).otherwise(0) → all-zero buckets
    if (v == null) {
      new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Long](tables))
    } else nullSafeEval(v)
  }
  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Long](tables)
    var anyNull = n == 0
    var i = 0
    while (i < n && !anyNull) { anyNull = a.isNullAt(i); i += 1 }
    if (!anyNull) {
      var t = 0
      while (t < tables) {
        var bucket = 0L
        var j = 0
        while (j < bits) {
          val plane = (t.toLong * bits + j) * 40503L
          var acc = 0.0
          var k = 0
          while (k < n) {
            // hyperplaneComponent(j, i): ((i*2654435761 + j*40503) % 1997) - 998,
            // i is the 1-based sequence index
            val comp = (((k + 1).toLong * 2654435761L + plane) % 1997L - 998L).toDouble
            acc += VecUtil.get(a, vf, k) * comp
            k += 1
          }
          // Spark SQL (and DuckDB) order NaN above every finite value,
          // so a NaN projection satisfies `proj > 0` in the declarative
          // twin — mirror that, not Java's NaN-comparisons-are-false
          if (acc > 0.0 || acc.isNaN) bucket |= (1L << j)
          j += 1
        }
        out(t) = bucket
        t += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
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
  * closure, no broadcast round-trip). */
case class PqEncode(child: Expression, codebook: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
  @transient private lazy val vf = VecUtil.isFloatArr(child)
  // twin parity on the edges: a null VECTOR yields an array of m null
  // codes (slice/zip_with/aggregate null-propagate per ELEMENT in the
  // declarative chain, never to the outer array)
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        new Array[Any](codebook.length))
    else nullSafeEval(v)
  }
  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val m = codebook.length
    val subDim = codebook(0)(0).length
    val out = new Array[Any](m)
    var mi = 0
    while (mi < m) {
      val base = mi * subDim
      var ok = a.numElements() >= base + subDim
      var j = 0
      while (ok && j < subDim) { if (a.isNullAt(base + j)) ok = false; j += 1 }
      if (!ok) out(mi) = null
      else {
        val cws = codebook(mi)
        var bestK = 0
        var bestD = 0.0
        var first = true
        var ki = 0
        while (ki < cws.length) {
          val cw = cws(ki)
          var acc = 0.0
          var t = 0
          while (t < subDim) {
            val d = VecUtil.get(a, vf, base + t) - cw(t)
            acc += d * d
            t += 1
          }
          // Double.compare ranks NaN above every finite value — the
          // same total order array_min/array_position use, so a NaN
          // distance never beats a finite one (and an all-NaN subspace
          // keeps codeword 0, the twin's first-position answer)
          if (first || java.lang.Double.compare(acc, bestD) < 0) {
            bestD = acc; bestK = ki; first = false
          }
          ki += 1
        }
        out(mi) = bestK
      }
      mi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object VecExprs {
  def dot(a: Column, b: Column): Column =
    ExprBridge.toColumn(VecDot(ExprBridge.toExpression(a), ExprBridge.toExpression(b)))
  /** array of bucket ids for tables 0..tables-1 */
  def lshBuckets(v: Column, bits: Int, tables: Int): Column =
    ExprBridge.toColumn(LshBuckets(ExprBridge.toExpression(v), bits, tables))
  def pqEncode(v: Column, codebook: Array[Array[Array[Double]]]): Column =
    ExprBridge.toColumn(PqEncode(ExprBridge.toExpression(v), codebook))
}
