package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Scratch: decompose u1's superlinear x10 cell — broadcast fuzzy join
  * per-pair cost vs broadcast-side size, and the blockedJoin scale path
  * on the same inputs. */
object U1Prof {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("target/scaledata/x10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $name%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val ccCols = Seq(
      "c_custkey AS cc_id",
      "concat('https://www.c', CAST(c_custkey AS STRING), '.com.au') AS website_url",
      """CASE CAST(c_custkey % 5 AS INT)
        | WHEN 0 THEN concat(c_name, ' Pty Ltd | Home')
        | WHEN 1 THEN concat('The ', c_name, ' Group')
        | WHEN 2 THEN concat('RSS ', c_name)
        | WHEN 3 THEN '  '
        | ELSE concat(c_name, ' & Associates (AU)')
        |END AS company_name""".stripMargin,
      "CASE CAST(c_custkey % 3 AS INT) WHEN 0 THEN 'Technology' WHEN 1 THEN 'Mining' ELSE NULL END AS industry")
    val customer = spark.read.parquet(s"$d/customer.parquet")
    val abr = Tables.spread(customer.selectExpr(
      "CAST(c_custkey AS STRING) AS abn", "c_name AS entity_name")
      .orderBy(col("abn")).limit(10000))
    def ccAt(maxKey: Long) = Tables.spread(
      customer.filter(col("c_custkey") % 7 === 0 && col("c_custkey") < maxKey)
        .selectExpr(ccCols: _*))

    // Equality mode: does the token-blocked scale path accept the SAME
    // (left, right, confidence) set as the exact broadcast product on
    // this corpus? (Blocking can only lose a pair whose every shared
    // keyword token is more frequent than maxTokenFreq on the right —
    // the measured-zero-diff result is corpus evidence, not a theorem.)
    if (args.length > 1 && args(1) == "eq") {
      // Cap choice matters at scale: ScaleGen gives every base
      // customer ~mult replicas sharing its numeric name token, so a
      // cap below the replica multiplicity (50 at x100) starves most
      // left rows of any block — measured 3999/10000 accepted vs the
      // broadcast product's 10000. The blockedJoin DEFAULT (1000) is
      // the configuration under test; extra caps via args(2..).
      val caps = if (args.length > 2) args.drop(2).map(_.toLong).toSeq
                 else Seq(1000L)
      val cand = graft.pipeline.Pipeline.cleanCandidates(ccAt(Long.MaxValue))
        .select(col("cc_id"), col("extracted_name"))
      def ck(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
        df.select(col("left_key"), col("right_key"), col("merged_confidence"))
          .localCheckpoint(true)
      val bc = time("eq broadcastJoin")(ck(graft.operators.MatchJoin.broadcastJoin(
        abr, "abn", "entity_name", cand, "cc_id", "extracted_name", 80)))
      val nBc = bc.count()
      for (cap <- caps) {
        val bl = time(s"eq blockedJoin cap=$cap")(ck(graft.operators.MatchJoin.blockedJoin(
          abr, "abn", "entity_name", cand, "cc_id", "extracted_name",
          80, maxTokenFreq = cap)))
        val nBl = bl.count()
        val onlyBc = bc.exceptAll(bl).count(); val onlyBl = bl.exceptAll(bc).count()
        println(s"PROF eq cap=$cap broadcast=$nBc blocked=$nBl " +
          s"onlyBroadcast=$onlyBc onlyBlocked=$onlyBl")
      }
      spark.stop(); return
    }

    for (round <- 1 to 2) {
      // full candidate side (x-scale sized broadcast)
      time(s"r$round broadcastJoin full cand") {
        val cand = graft.pipeline.Pipeline.cleanCandidates(ccAt(Long.MaxValue))
        graft.operators.MatchJoin.broadcastJoin(
          abr, "abn", "entity_name",
          cand.select(col("cc_id"), col("extracted_name")), "cc_id", "extracted_name",
          80).count()
      }
      // replica-0-only candidate side (x1-sized broadcast, same left)
      time(s"r$round broadcastJoin cand<200k") {
        val cand = graft.pipeline.Pipeline.cleanCandidates(ccAt(200000L))
        graft.operators.MatchJoin.broadcastJoin(
          abr, "abn", "entity_name",
          cand.select(col("cc_id"), col("extracted_name")), "cc_id", "extracted_name",
          80).count()
      }
      // blockedJoin scale path, full candidate side
      time(s"r$round blockedJoin full cand") {
        val cand = graft.pipeline.Pipeline.cleanCandidates(ccAt(Long.MaxValue))
        graft.operators.MatchJoin.blockedJoin(
          abr, "abn", "entity_name",
          cand.select(col("cc_id"), col("extracted_name")), "cc_id", "extracted_name",
          80, maxTokenFreq = 50L).count()
      }
    }
    spark.stop()
  }
}
