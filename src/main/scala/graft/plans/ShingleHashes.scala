package graft.plans

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ExprBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expression: word-k-shingle 60-bit hashes in one
  * pass — value-identical to the declarative
  * `shingleHashes(shingles(text, k))` chain in graft.functions.Hashing
  * (which the DuckDB oracle mirrors):
  *
  *   split(text, " ") → k-shingles joined with " " (a doc shorter than
  *   k tokens contributes its whole text as one shingle) → per shingle
  *   conv(substr(md5(s),1,15),16,10) % (2^31-1)
  *
  * The declarative form runs through interpreted higher-order-function
  * lambdas — one boxed array_join(slice(...)) plus an md5→hex→conv
  * string round-trip PER SHINGLE (~2M digests at sf0.1). Here: one
  * tokenize, a reused MessageDigest, and the 60-bit value read straight
  * off the first 7.5 digest bytes (== parsing the first 15 hex chars).
  *
  * Codegen emits a single static call into [[KernelOps]], so the
  * expression stays inside the whole-stage loop (no interpreted-eval
  * boundary, no InternalRow materialization).
  */
case class ShingleHashes64(child: Expression, k: Int, modM31: Boolean = true)
    extends UnaryExpression {
  // k = 0 would hash the empty string at EVERY position — every
  // document's shingle set identical, the whole corpus mutually
  // duplicate with jaccard100 = 100 and no error anywhere
  require(k > 0, "need shingle size k > 0")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.expect("graft_shingle_hashes", Seq(TypeChecks.string("text", child.dataType)))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    KernelOps.shingleHashes(v.asInstanceOf[UTF8String], k, modM31)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.KernelOps.shingleHashes($c, $k, $modM31)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** SimHash from per-token 60-bit hashes, `bits` wide — value-identical
  * to the declarative fold in graft.functions.Hashing.simhashFromHashes
  * (bit j set iff the ±1 votes from token-hash bit j sum positive; all
  * inputs are positive 60-bit values, so `>>` agrees with the
  * declarative arithmetic shift), one pass per token instead of `bits`
  * interpreted array traversals. Codegen: static [[KernelOps]] call. */
case class SimHash64(child: Expression, bits: Int)
    extends UnaryExpression {
  // bits > 64: JVM shift amounts wrap mod 64, double-counting bit 0's
  // vote — a silently corrupt signature, not an error
  require(bits >= 1 && bits <= 64, s"need 1 <= bits <= 64, got $bits")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.expect("graft_simhash", Seq(TypeChecks.longArray("hashes", child.dataType)))

  override def dataType: DataType = LongType

  override protected def nullSafeEval(v: Any): Any =
    KernelOps.simhash(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.KernelOps.simhash($c, $bits)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHash64 {
  def column(hashes: Column, bits: Int): Column =
    ExprBridge.toColumn(SimHash64(ExprBridge.toExpression(hashes), bits))
}

/** Single-pass SIGMOD'03 winnowing per document: word-k-gram 60-bit
  * hash stream (same gram/hash definition as [[ShingleHashes64]] with
  * `modM31=false`) → minimum of every `w`-long sliding window (monotonic
  * deque, O(n)) → the DISTINCT selected values, sorted ascending. A
  * stream shorter than `w` contributes its global minimum.
  *
  * Winnowing is sequential over one document's gram stream and touches
  * nothing outside the row, so it belongs in a scalar kernel: the
  * composed plan (posexplode → count window → sliding-min window →
  * filter → distinct) exchanges the full gram table — ~w/2× larger
  * than this expression's output — across two WindowExecs before
  * sampling throws most of it away. Codegen: static [[KernelOps]]
  * call inside the scan stage's whole-stage loop.
  */
case class WinnowFingerprints64(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k > 0, "need gram size k > 0")
  require(w > 0, "need window w > 0")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.expect("graft_winnow", Seq(TypeChecks.string("text", child.dataType)))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    KernelOps.winnow(v.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.KernelOps.winnow($c, $k, $w)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object WinnowFingerprints64 {
  def column(text: Column, k: Int, w: Int): Column =
    ExprBridge.toColumn(WinnowFingerprints64(ExprBridge.toExpression(text), k, w))
}

/** `array_sort(array_distinct(<array<bigint>>))` as one primitive pass —
  * bitwise-identical output (longs have a total order; array_distinct
  * keeps at most one null, which array_sort's default comparator places
  * LAST; a null input array propagates), but without the per-comparison
  * interpreted lambda `array_sort` wraps around its default comparator
  * (ArraySort is a higher-order function — CodegenFallback, boxed
  * comparator call per comparison per row) or array_distinct's
  * intermediate array. Used where sorted-distinct gram/shingle sets are
  * built once per document (the minhash `sh` column). */
case class SortedDistinctLongs(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.expect("graft_sorted_distinct",
      Seq(TypeChecks.longArray("hashes", child.dataType)))
  override def dataType: DataType = child.dataType
  override protected def nullSafeEval(v: Any): Any =
    KernelOps.sortedDistinctLongs(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.KernelOps.sortedDistinctLongs($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SortedDistinctLongs {
  def column(arr: Column): Column =
    ExprBridge.toColumn(SortedDistinctLongs(ExprBridge.toExpression(arr)))
}

object ShingleHashes64 {
  val M31 = 2147483647L

  private[plans] val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 15 hex chars of md5 parsed base-16 == top 60 bits of the
    * digest: bytes 0..6 whole, high nibble of byte 7. */
  private[plans] def hash60(md: MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }

  def column(text: Column, k: Int): Column =
    ExprBridge.toColumn(ShingleHashes64(ExprBridge.toExpression(text), k))

  /** Raw 60-bit gram hashes (no mod-2³¹) — for set-identity uses where
    * 31-bit collisions would corrupt intersection counts. */
  def column60(text: Column, k: Int): Column =
    ExprBridge.toColumn(ShingleHashes64(ExprBridge.toExpression(text), k, modM31 = false))

  /** k=1, no M31 reduction == graft.functions.Hashing.tokenHashes. */
  def tokenColumn(text: Column): Column =
    ExprBridge.toColumn(ShingleHashes64(ExprBridge.toExpression(text), 1, modM31 = false))
}
