package graft.plans

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Domain guards and analysis-time type checks of the custom kernel
  * expressions — the edges the fuzz twins structurally miss (twins
  * compare VALID inputs; these pin what invalid inputs DO). */
class KernelGuardSpec extends SparkSpec {
  import spark.implicits._

  test("fuzzy length gates survive Int overflow past ~21 MB of text") {
    // pre-fix: ml * (100 - floor) wrapped negative for ml > ~53 MB at
    // floor 60, so two IDENTICAL huge strings gated to score 0
    assert(FuzzyBestScore.lengthGate(60000000, 60000000, 60),
      "identical-length giants must pass the feasibility gate")
    assert(!FuzzyBestScore.lengthGate(60000000, 20000000, 60),
      "a 3x length difference can never reach score 60")
    // unchanged small-domain behavior
    assert(FuzzyBestScore.lengthGate(100, 100, 60))
    assert(!FuzzyBestScore.lengthGate(100, 30, 60))
  }

  test("kernel expressions reject degenerate shape parameters at build time") {
    val c = lit("a b c")
    intercept[IllegalArgumentException] { ShingleHashes64.column(c, 0) }
    intercept[IllegalArgumentException] {
      SimHash64(org.apache.spark.sql.graft.ExprBridge.toExpression(
        typedLit(Seq(1L))), bits = 65)
    }
    intercept[IllegalArgumentException] {
      MinHashSig(org.apache.spark.sql.graft.ExprBridge.toExpression(
        typedLit(Seq(1L))), numHashes = -1)
    }
  }

  test("minhash of an empty base-hash array fails loudly, never an all-zero signature") {
    // the declarative twin yields NULL elements here, which the
    // kernel's containsNull=false type cannot represent — an all-zero
    // signature would band-collide every empty document silently
    val e = intercept[IllegalArgumentException] {
      KernelOps.minhashSig(new GenericArrayData(Array.empty[Long]), 4)
    }
    assert(e.getMessage.contains("empty"))
  }

  test("jaccard sorted fast path is value-identical to the sorting path") {
    val df = Seq((Seq(5L, 1L, 3L, 3L), Seq(3L, 9L, 1L))).toDF("a", "b")
    val unsorted = df.select(JaccardLong100.column($"a", $"b")).head.getInt(0)
    val sorted = df.select(JaccardLong100.column(
      array_sort(array_distinct($"a")), array_sort(array_distinct($"b"))))
      .head.getInt(0)
    assert(unsorted == sorted)
    assert(unsorted == 50) // {1,3,5} vs {1,3,9}: 2 shared of 4 -> 50
  }

  test("SQL-surface type confusion fails at analysis time, not as garbage values") {
    GraftExtensions.register(spark)
    // string array into the long-array Jaccard: raw bytes would
    // otherwise reinterpret as 8-byte longs — plausible garbage
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_jaccard_long(array('a','b'), array('a'))").collect()
    }
    assert(e1.getMessage.contains("ARRAY<BIGINT>"), e1.getMessage)
    // int array into the float/double vector kernel
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_lsh_buckets(array(1, 2, 3), 4, 2)").collect()
    }
    assert(e2.getMessage.contains("ARRAY<FLOAT>"), e2.getMessage)
    // numeric into a string kernel
    val e3 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_ratio(1, 2)").collect()
    }
    assert(e3.getMessage.contains("STRING"), e3.getMessage)
    // non-literal shape argument gets the intended message, not an
    // opaque eval crash
    val e4 = intercept[Exception] {
      spark.sql("SELECT graft_minhash(array(1L), id) FROM range(1)").collect()
    }
    assert(e4.getMessage.contains("int literal"), e4.getMessage)
  }

  test("Column-API vector kernels type-check too: dot and pqEncode reject non-vector arrays") {
    // VecDot/PqEncode are reachable through the public Vectors DSL with
    // arbitrary Columns — an array<int> would otherwise reinterpret its
    // 4-byte packing as doubles on unsafe rows (plausible garbage)
    import org.apache.spark.sql.functions.col
    val ints = Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b")
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      ints.select(graft.functions.Vectors.dot(col("a"), col("b"))).collect()
    }
    assert(e1.getMessage.contains("ARRAY<FLOAT>"), e1.getMessage)
    val cb = Array.fill(1)(Array.fill(2)(Array.fill(2)(0.0)))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      ints.select(graft.plans.VecExprs.pqEncode(col("a"), cb)).collect()
    }
    assert(e2.getMessage.contains("ARRAY<FLOAT>"), e2.getMessage)
  }
}
