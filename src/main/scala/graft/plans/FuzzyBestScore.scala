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
  * score (J-1 hot path) computed in ONE pass over primitive byte
  * arrays.
  *
  * Semantically identical to the declarative chain it replaces
  * (token-sort / token-set / plain levenshtein-ratio qualifying at
  * `floorScore`, keyword-Jaccard qualifying at `kwFloor`, max of the
  * qualifiers, 0 when none qualify — see graft.operators.MatchJoin and
  * the DuckDB oracle twins), but ~an order of magnitude cheaper per
  * pair: banded early-exit levenshtein and merge-joins over the
  * pre-sorted token arrays, no UTF-16 decoding and no intermediate
  * collections.
  *
  * Byte-level processing is exact because every scorer input comes out
  * of the normalization chain, which strips to `[A-Za-z0-9 ]` — ASCII
  * only, where byte distance == codepoint distance and byte order ==
  * UTF8String binary order (the order array_sort produced).
  *
  * children: left_sorted, right_sorted, left_norm, right_norm,
  *           left_set, right_set (sorted distinct token arrays),
  *           left_kw, right_kw (sorted distinct keyword arrays)
  */
case class FuzzyBestScore(children: Seq[Expression], floorScore: Int, kwFloor: Int = 30)
    extends Expression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  @transient private lazy val c = children.toArray

  override def eval(input: InternalRow): Any = {
    import FuzzyBestScore._
    val v0 = c(0).eval(input); val v1 = c(1).eval(input)
    val v2 = c(2).eval(input); val v3 = c(3).eval(input)
    val v4 = c(4).eval(input); val v5 = c(5).eval(input)
    val v6 = c(6).eval(input); val v7 = c(7).eval(input)
    if (v0 == null || v1 == null || v2 == null || v3 == null ||
      v4 == null || v5 == null || v6 == null || v7 == null) return 0
    val leftSorted = v0.asInstanceOf[UTF8String].getBytes
    val rightSorted = v1.asInstanceOf[UTF8String].getBytes

    var best = 0
    def consider(s: Int, floor: Int): Unit = if (s >= floor && s > best) best = s

    consider(ratioAtLeast(leftSorted, rightSorted, floorScore), floorScore)
    if (best < 100) {
      consider(tokenSetRatioAtLeast(byteArrays(v4), byteArrays(v5), floorScore), floorScore)
      consider(ratioAtLeast(v2.asInstanceOf[UTF8String].getBytes,
        v3.asInstanceOf[UTF8String].getBytes, floorScore), floorScore)
    }
    consider(jaccard100(byteArrays(v6), byteArrays(v7)), kwFloor)
    best
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

  private def byteArrays(v: Any): Array[Array[Byte]] = {
    val arr = v.asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements())(i =>
      if (arr.isNullAt(i)) Array.emptyByteArray else arr.getUTF8String(i).getBytes)
  }

  private def compareBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  /** floor(100*(1 - lev/maxlen)) if >= floorScore else -1; banded DP with
    * early exit (band width = max edits allowed by the floor). */
  def ratioAtLeast(a: Array[Byte], b: Array[Byte], floorScore: Int): Int = {
    val la = a.length; val lb = b.length
    val ml = math.max(math.max(la, lb), 1)
    val maxD = ml * (100 - floorScore) / 100 // floor of allowed edits
    if (math.abs(la - lb) > maxD) return -1
    val d = boundedLevenshtein(a, b, maxD)
    if (d < 0) -1
    else math.floor(100.0 * (1.0 - d.toDouble / ml.toDouble)).toInt
  }

  def ratioAtLeast(a: String, b: String, floorScore: Int): Int =
    ratioAtLeast(a.getBytes("UTF-8"), b.getBytes("UTF-8"), floorScore)

  /** Levenshtein distance if <= maxD, else -1. Rolling-row DP restricted
    * to the |i-j| <= maxD band. */
  def boundedLevenshtein(a: Array[Byte], b: Array[Byte], maxD: Int): Int = {
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
      var rowMin = if (curr(0) < INF) curr(0) else INF
      var jj = from
      while (jj <= to) {
        val cost = if (a(i - 1) == b(jj - 1)) 0 else 1
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
    * floor. Merge-join set ops into flat byte buffers. */
  def tokenSetRatioAtLeast(ta: Array[Array[Byte]], tb: Array[Array[Byte]],
                           floorScore: Int): Int = {
    var total = 0
    ta.foreach(total += _.length + 1)
    tb.foreach(total += _.length + 1)
    val inter = new ByteBuf(total)
    val restA = new ByteBuf(total)
    val restB = new ByteBuf(total)
    var i = 0; var j = 0
    while (i < ta.length && j < tb.length) {
      val c = compareBytes(ta(i), tb(j))
      if (c == 0) { inter.append(ta(i)); i += 1; j += 1 }
      else if (c < 0) { restA.append(ta(i)); i += 1 }
      else { restB.append(tb(j)); j += 1 }
    }
    while (i < ta.length) { restA.append(ta(i)); i += 1 }
    while (j < tb.length) { restB.append(tb(j)); j += 1 }
    val s0 = inter.bytes
    val t1 = joinNonEmpty(s0, restA.bytes)
    val t2 = joinNonEmpty(s0, restB.bytes)
    var best = -1
    def c(x: Int): Unit = if (x > best) best = x
    c(ratioAtLeast(s0, t1, floorScore))
    c(ratioAtLeast(s0, t2, floorScore))
    c(ratioAtLeast(t1, t2, floorScore))
    best
  }

  private final class ByteBuf(capacity: Int) {
    private val buf = new Array[Byte](capacity)
    private var len = 0
    def append(tok: Array[Byte]): Unit = {
      if (len > 0) { buf(len) = ' '; len += 1 }
      System.arraycopy(tok, 0, buf, len, tok.length)
      len += tok.length
    }
    def bytes: Array[Byte] = java.util.Arrays.copyOf(buf, len)
  }

  private def joinNonEmpty(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      val out = new Array[Byte](a.length + 1 + b.length)
      System.arraycopy(a, 0, out, 0, a.length)
      out(a.length) = ' '
      System.arraycopy(b, 0, out, a.length + 1, b.length)
      out
    }

  /** Jaccard*100 truncated over sorted distinct arrays; 0 if either empty. */
  def jaccard100(ka: Array[Array[Byte]], kb: Array[Array[Byte]]): Int = {
    if (ka.isEmpty || kb.isEmpty) return 0
    var i = 0; var j = 0; var inter = 0
    while (i < ka.length && j < kb.length) {
      val c = compareBytes(ka(i), kb(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val union = ka.length + kb.length - inter
    (inter.toLong * 100 / union).toInt
  }
}
