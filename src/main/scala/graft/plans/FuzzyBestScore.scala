package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ExprBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expression: the reference's multi-strategy fuzzy
  * score (J-1 hot path) computed in ONE pass over primitive char arrays.
  *
  * Semantically identical to the declarative chain it replaces
  * (token-sort / token-set / plain levenshtein-ratio qualifying at
  * `floorScore`, keyword-Jaccard qualifying at 30, max of qualifiers,
  * 0 when none qualify — see graft.operators.MatchJoin and the DuckDB
  * oracle twins), but ~an order of magnitude cheaper per pair: the
  * generic expression tree costs ~40 interpreted nodes and a dozen array
  * allocations per pair, while this eval does banded early-exit
  * levenshtein and merge-joins over the pre-sorted token arrays with no
  * garbage. The inputs are the per-side precomputed columns, so the
  * N×M stage stays allocation-light.
  *
  * children: left_sorted, right_sorted, left_norm, right_norm,
  *           left_set, right_set (sorted distinct token arrays),
  *           left_kw, right_kw (sorted distinct keyword arrays)
  */
case class FuzzyBestScore(children: Seq[Expression], floorScore: Int, kwFloor: Int = 30)
    extends Expression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) return 0
    val leftSorted = vals(0).asInstanceOf[UTF8String].toString
    val rightSorted = vals(1).asInstanceOf[UTF8String].toString
    val leftNorm = vals(2).asInstanceOf[UTF8String].toString
    val rightNorm = vals(3).asInstanceOf[UTF8String].toString
    val leftSet = strings(vals(4))
    val rightSet = strings(vals(5))
    val leftKw = strings(vals(6))
    val rightKw = strings(vals(7))

    var best = 0
    def consider(s: Int, floor: Int): Unit = if (s >= floor && s > best) best = s

    consider(FuzzyBestScore.ratioAtLeast(leftSorted, rightSorted, floorScore), floorScore)
    if (best < 100) {
      consider(FuzzyBestScore.tokenSetRatioAtLeast(leftSet, rightSet, floorScore), floorScore)
      consider(FuzzyBestScore.ratioAtLeast(leftNorm, rightNorm, floorScore), floorScore)
      consider(FuzzyBestScore.jaccard100(leftKw, rightKw), kwFloor)
    } else {
      // best is already the maximum possible; remaining strategies can't exceed it
      consider(FuzzyBestScore.jaccard100(leftKw, rightKw), kwFloor)
    }
    best
  }

  private def strings(v: Any): Array[String] = {
    val arr = v.asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements())(i =>
      if (arr.isNullAt(i)) "" else arr.getUTF8String(i).toString)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object FuzzyBestScore {

  def column(leftSorted: Column, rightSorted: Column, leftNorm: Column, rightNorm: Column,
             leftSet: Column, rightSet: Column, leftKw: Column, rightKw: Column,
             floorScore: Int): Column = {
    val exprs = Seq(leftSorted, rightSorted, leftNorm, rightNorm,
      leftSet, rightSet, leftKw, rightKw).map(ExprBridge.toExpression)
    ExprBridge.toColumn(FuzzyBestScore(exprs, floorScore))
  }

  /** floor(100*(1 - lev/maxlen)) if >= floorScore else -1; banded DP with
    * early exit (band width = max edits allowed by the floor). */
  def ratioAtLeast(a: String, b: String, floorScore: Int): Int = {
    val la = a.length; val lb = b.length
    val ml = math.max(math.max(la, lb), 1)
    val maxD = ml * (100 - floorScore) / 100 // floor of allowed edits
    if (math.abs(la - lb) > maxD) return -1
    val d = boundedLevenshtein(a, b, maxD)
    if (d < 0) -1
    else math.floor(100.0 * (1.0 - d.toDouble / ml.toDouble)).toInt
  }

  /** Levenshtein distance if <= maxD, else -1. Classic rolling-row DP
    * restricted to the |i-j| <= maxD band. */
  def boundedLevenshtein(a: String, b: String, maxD: Int): Int = {
    val la = a.length; val lb = b.length
    if (la == 0) return if (lb <= maxD) lb else -1
    if (lb == 0) return if (la <= maxD) la else -1
    if (math.abs(la - lb) > maxD) return -1
    val INF = Int.MaxValue / 2
    var prev = new Array[Int](lb + 1)
    var curr = new Array[Int](lb + 1)
    java.util.Arrays.fill(prev, INF)
    var j = 0
    while (j <= math.min(lb, maxD)) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= la) {
      java.util.Arrays.fill(curr, INF)
      val from = math.max(1, i - maxD)
      val to = math.min(lb, i + maxD)
      if (from == 1 && i <= maxD) curr(0) = i
      var rowMin = curr(0)
      var jj = from
      while (jj <= to) {
        val cost = if (a.charAt(i - 1) == b.charAt(jj - 1)) 0 else 1
        var v = prev(jj - 1) + cost
        val del = prev(jj) + 1
        if (del < v) v = del
        val ins = curr(jj - 1) + 1
        if (ins < v) v = ins
        curr(jj) = v
        if (v < rowMin) rowMin = v
        jj += 1
      }
      if (rowMin > maxD) return -1
      val t = prev; prev = curr; curr = t
      i += 1
    }
    if (prev(lb) <= maxD) prev(lb) else -1
  }

  /** token_set_ratio over pre-sorted distinct token arrays; -1 if below
    * floor. Merge-join set ops, zero intermediate collections. */
  def tokenSetRatioAtLeast(ta: Array[String], tb: Array[String], floorScore: Int): Int = {
    val inter = new StringBuilder
    val restA = new StringBuilder
    val restB = new StringBuilder
    var i = 0; var j = 0
    while (i < ta.length && j < tb.length) {
      val c = ta(i).compareTo(tb(j))
      if (c == 0) { append(inter, ta(i)); i += 1; j += 1 }
      else if (c < 0) { append(restA, ta(i)); i += 1 }
      else { append(restB, tb(j)); j += 1 }
    }
    while (i < ta.length) { append(restA, ta(i)); i += 1 }
    while (j < tb.length) { append(restB, tb(j)); j += 1 }
    val s0 = inter.toString
    val t1 = joinNonEmpty(s0, restA.toString)
    val t2 = joinNonEmpty(s0, restB.toString)
    var best = -1
    def c(x: Int): Unit = if (x > best) best = x
    c(ratioAtLeast(s0, t1, floorScore))
    c(ratioAtLeast(s0, t2, floorScore))
    c(ratioAtLeast(t1, t2, floorScore))
    best
  }

  private def append(sb: StringBuilder, s: String): Unit = {
    if (sb.nonEmpty) sb.append(' ')
    sb.append(s)
  }

  private def joinNonEmpty(a: String, b: String): String =
    if (a.isEmpty) b else if (b.isEmpty) a else a + " " + b

  /** Jaccard*100 truncated over sorted distinct arrays; 0 if either empty. */
  def jaccard100(ka: Array[String], kb: Array[String]): Int = {
    if (ka.isEmpty || kb.isEmpty) return 0
    var i = 0; var j = 0; var inter = 0
    while (i < ka.length && j < kb.length) {
      val c = ka(i).compareTo(kb(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val union = ka.length + kb.length - inter
    (inter.toLong * 100 / union).toInt
  }
}
