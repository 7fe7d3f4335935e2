package graft.sources

import java.io.{BufferedOutputStream, ByteArrayInputStream, FileOutputStream}
import java.util.zip.ZipInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S-4 ingest edge: ZIP expansion (reference scripts/extract_abr.py:
  * 93-110 downloads the ABR bulk ZIP and iterates member XMLs in one
  * Python process). Spark-native shape: a `binaryFile` scan of the ZIP
  * archives — one task per archive — expands members to plain XML files
  * in a staging directory, and the XML relation ([[AbrXml.read]]) then
  * scans those with ordinary split parallelism. Expansion is a narrow
  * per-file map (no shuffle); at 100 TB the archives distribute across
  * executors and the staging dir is object storage.
  */
object AbrZip {

  /** Expand every member of every ZIP under `zipGlob` into `outDir`.
    * Returns the member manifest (zip, member, bytes written) — also the
    * natural input to the S-3 processed-files ledger.
    *
    * Collision safety: members land under a per-archive subdirectory
    * (hash of the zip path — two ZIPs with identically-named members
    * cannot overwrite each other), and each member file name carries a
    * hash of the RAW member path before sanitization (`a/b.xml` vs
    * `a_b.xml` stay distinct). Callers wanting run isolation should
    * stage into a fresh directory — [[readZipped]] does. */
  def expand(spark: SparkSession, zipGlob: String, outDir: String): DataFrame = {
    import spark.implicits._
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val bin = spark.read.format("binaryFile").load(zipGlob)
      .select(col("path"), col("content"))
    bin.as[(String, Array[Byte])].mapPartitions(_.flatMap { case (zipPath, bytes) =>
      val zipDir = f"$outDir/zip_${zipPath.hashCode & 0xffffffffL}%08x"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(zipDir))
      val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
      Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
        .filterNot(_.isDirectory)
        .map { entry =>
          val raw = entry.getName
          val safeName =
            f"m${raw.hashCode & 0xffffffffL}%08x_${raw.replaceAll("[/\\\\]", "_")}"
          val target = s"$zipDir/$safeName"
          val out = new BufferedOutputStream(new FileOutputStream(target))
          val buf = new Array[Byte](64 * 1024)
          var n = 0L
          var r = zin.read(buf)
          while (r >= 0) {
            out.write(buf, 0, r); n += r; r = zin.read(buf)
          }
          out.close()
          (zipPath, raw, n)
        }.toList
    }).toDF("zip", "member", "bytes")
  }

  /** Full S-4 lifecycle: expand ZIPs, then read the member XMLs into
    * the staging_abr shape. Stages into a FRESH unique subdirectory per
    * run so stale members from prior runs can never leak into the scan. */
  def readZipped(spark: SparkSession, zipGlob: String, stagingDir: String): DataFrame = {
    val runDir = s"$stagingDir/run_${java.util.UUID.randomUUID().toString.take(8)}"
    expand(spark, zipGlob, runDir).count() // materialize the expansion
    AbrXml.read(spark, s"$runDir/*/*")
  }
}
