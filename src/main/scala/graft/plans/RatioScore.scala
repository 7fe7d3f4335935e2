package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val lu = l.asInstanceOf[UTF8String]
    val ru = r.asInstanceOf[UTF8String]
    if (lu.numBytes != lu.numChars || ru.numBytes != ru.numChars) {
      // non-ASCII: defer to Spark's own char-level distance
      val ml = math.max(math.max(lu.numChars, ru.numChars), 1)
      val d = lu.levenshteinDistance(ru)
      math.floor(100.0 * (1.0 - d.toDouble / ml.toDouble)).toInt
    } else {
      val a = lu.getBytes
      val b = ru.getBytes
      val ml = math.max(math.max(a.length, b.length), 1)
      val d = FuzzyBestScore.boundedLevenshtein(a, b, ml)
      math.floor(100.0 * (1.0 - d.toDouble / ml.toDouble)).toInt
    }
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object RatioScore {
  def column(a: Column, b: Column): Column =
    ExprBridge.toColumn(RatioScore(ExprBridge.toExpression(a), ExprBridge.toExpression(b)))
}
