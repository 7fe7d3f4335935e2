package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the engine's custom expressions: registers
  *  - graft_fuzzy_score(left_sorted, right_sorted, left_norm,
  *    right_norm, left_set, right_set, left_kw, right_kw [, floor]) —
  *    the J-1 multi-strategy scorer ([[FuzzyBestScore]]);
  *  - graft_minhash(base_hashes, num_hashes) — [[MinHashSig]];
  * so `spark.sql(...)` pipelines can use them without the Scala DSL.
  *
  * Wire up either per-session ([[GraftExtensions.register]]) or at
  * session build time via
  * `SparkSession.builder().withExtensions(new GraftExtensions)` /
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.definitions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = {
    // foldable-check FIRST: eval(null) on a non-foldable expression (a
    // column reference) throws an opaque Unresolved/Unsupported
    // exception instead of the message this function exists to give
    if (!e.foldable) throw new IllegalArgumentException(
      s"$what must be an int literal, got the non-literal expression $e")
    e.eval(null) match {
      case i: Int => i
      case other => throw new IllegalArgumentException(
        s"$what must be an int literal, got $other")
    }
  }

  private[plans] val definitions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_fuzzy_score",
      new ExpressionInfo(classOf[FuzzyBestScore].getName, "graft_fuzzy_score"),
      (exprs: Seq[Expression]) => exprs match {
        case args if args.length == 8 => FuzzyBestScore(args, 60)
        case args if args.length == 9 =>
          FuzzyBestScore(args.take(8), intLit(args(8), "floor"))
        case args =>
          throw new IllegalArgumentException(s"graft_fuzzy_score takes 8 or 9 args, got ${args.length}")
      }),
    ("graft_minhash",
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(h, n) => MinHashSig(h, intLit(n, "num_hashes"))
        case args =>
          throw new IllegalArgumentException(s"graft_minhash takes 2 args, got ${args.length}")
      }),
    unary("graft_normalize_name", classOf[NormalizeName].getName, NormalizeName),
    unary("graft_keywords", classOf[KeywordsArr].getName, KeywordsArr),
    unary("graft_extract_title", classOf[ExtractFromTitle].getName, ExtractFromTitle),
    unary("graft_valid_name", classOf[IsValidCompanyName].getName, IsValidCompanyName),
    binary("graft_ratio", classOf[RatioScore].getName, RatioScore),
    binary("graft_jaccard_long", classOf[JaccardLong100].getName, JaccardLong100),
    ("graft_shingle_hashes",
      new ExpressionInfo(classOf[ShingleHashes64].getName, "graft_shingle_hashes"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(t, k) => ShingleHashes64(t, intLit(k, "k"))
        case args =>
          throw new IllegalArgumentException(s"graft_shingle_hashes takes 2 args, got ${args.length}")
      }),
    ("graft_lsh_buckets",
      new ExpressionInfo(classOf[LshBuckets].getName, "graft_lsh_buckets"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(v, bits, tables) =>
          LshBuckets(v, intLit(bits, "bits"), intLit(tables, "tables"))
        case args =>
          throw new IllegalArgumentException(s"graft_lsh_buckets takes 3 args, got ${args.length}")
      }))

  private def unary(name: String, cls: String, mk: Expression => Expression) =
    (name, new ExpressionInfo(cls, name),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c) => mk(c)
        case args => throw new IllegalArgumentException(s"$name takes 1 arg, got ${args.length}")
      })

  private def binary(name: String, cls: String, mk: (Expression, Expression) => Expression) =
    (name, new ExpressionInfo(cls, name),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(a, b) => mk(a, b)
        case args => throw new IllegalArgumentException(s"$name takes 2 args, got ${args.length}")
      })

  /** Imperative registration on an existing session (tests, REPL). */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")
    }
}
