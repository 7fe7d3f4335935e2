package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ledger, Quality}

class QualityLedgerSpec extends SparkSpec {
  import spark.implicits._

  test("quality suite: counts, nulls, conditionals, distribution, dups") {
    val df = Seq(("a", Some(1)), ("a", None), ("b", Some(5))).toDF("k", "v")
    assert(Quality.rowCounts(Seq("t" -> df)).head().getLong(1) == 3)
    val nulls = Quality.nullCounts(df, Seq("v")).head()
    assert(nulls.getLong(0) == 3 && nulls.getLong(1) == 1)
    val conds = Quality.conditionalCounts(df, Seq("big" -> (col("v") > 2))).head()
    assert(conds.getLong(1) == 1)
    val dups = Quality.duplicateKeys(df, "k").collect()
    assert(dups.length == 1 && dups.head.getString(0) == "a")
    assert(Quality.distribution(df, "k").count() == 2)
  }

  test("ledger: pending excludes processed; record stamps distinct paths") {
    val all = Seq("f1", "f2", "f3").toDF("file_path")
    val done = Seq("f2").toDF("file_path")
    val pending = Ledger.pending(all, done).as[String].collect().toSet
    assert(pending == Set("f1", "f3"))
    val recorded = Ledger.record(Seq("f1", "f1", "f3").toDF("file_path"))
    assert(recorded.count() == 2)
    assert(recorded.columns.toSeq == Seq("file_path", "processed_at"))
  }

  test("ledger: a recorded NULL path stays recorded (null-safe anti-join)") {
    // a plain equality anti-join never matches NULL = NULL, so a
    // malformed NULL-path manifest row would be re-extracted every
    // batch forever — the failure an idempotency ledger exists to stop
    val all = Seq(Some("f1"), None, Some("f3")).toDF("file_path")
    val done = Seq(Option.empty[String], Some("f1")).toDF("file_path")
    val pending = Ledger.pending(all, done).as[Option[String]].collect().toSet
    assert(pending == Set(Some("f3")), s"NULL path leaked through: $pending")
  }

  test("driver smoke: entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
