package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Names
import graft.model.Tables

object Profile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    spark.read.parquet(s"$d/customer.parquet").count()
    val ccCols = Seq(
      "c_custkey AS cc_id",
      """CASE CAST(c_custkey % 5 AS INT)
        | WHEN 0 THEN concat(c_name, ' Pty Ltd | Home')
        | WHEN 1 THEN concat('The ', c_name, ' Group')
        | WHEN 2 THEN concat('RSS ', c_name)
        | WHEN 3 THEN '  '
        | ELSE concat(c_name, ' & Associates (AU)')
        |END AS company_name""".stripMargin)
    val customer = spark.read.parquet(s"$d/customer.parquet")
    val cc = Tables.spread(customer.filter(col("c_custkey") % 7 === 0).selectExpr(ccCols: _*))
    time("cc base") { cc.count() }
    val f4 = cc.filter(col("company_name").isNotNull && length(trim(col("company_name"))) >= 3)
    time("f4 filter") { f4.count() }
    val ex = f4.withColumn("extracted_name", Names.extractFromTitle(col("company_name")))
    time("extract") { ex.filter(length(col("extracted_name")) >= 0).count() }
    val pinned = Tables.spread(ex)
    val valid = pinned.filter(Names.isValidCompanyName(col("extracted_name")))
    time("validity") { valid.count() }
    val norm = valid.withColumn("nc", Names.normalizeName(col("extracted_name")))
      .filter(length(col("nc")) >= 3)
    time("norm gate") { norm.count() }
    time("norm gate again") { norm.count() }
    spark.stop()
  }
}
