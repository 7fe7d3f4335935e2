package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** S-1/F-1..F-3: Common Crawl WARC ingestion — the reference's
  * thread-pooled HTTP fetch + warcio iteration
  * (scripts/extract_commoncrawl.py:53-77) re-expressed as a
  * `binaryFile` scan + per-partition record parsing: Spark gives one
  * task per WARC file (the reference's 12-thread pool becomes the
  * scheduler's file parallelism), and the Lock-guarded shared buffer
  * (:100-134) disappears into partitioned writes.
  */
object Warc {

  case class WarcRecord(file: String, rec_type: String, target_uri: String, body: String)

  /** S-6: the crawl-index source — a (possibly gzipped) text file of
    * WARC paths, sliced to the first `maxFiles` in file order (the
    * reference's `warc.paths.gz` fetch + `[:MAX_WARCS]`,
    * scripts/extract_commoncrawl.py:13-14,82-84). `spark.read.text`
    * decompresses .gz transparently; a single gzip member is one
    * unsplittable partition, so line order is file order. */
  def readIndex(spark: SparkSession, path: String, maxFiles: Int): DataFrame =
    spark.read.text(path).limit(maxFiles)
      .select(col("value").as("file_path"))

  /** Read .warc / .warc.gz files into (file, rec_type, target_uri, body). */
  def read(spark: SparkSession, pathGlob: String): Dataset[WarcRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (path, bytes) => parseFile(path, bytes) })
  }

  private[graft] def parseFile(path: String, bytes: Array[Byte]): Iterator[WarcRecord] = {
    val records = scala.collection.mutable.ArrayBuffer[WarcRecord]()
    try parseInto(path, bytes, records)
    catch {
      case _: java.io.IOException =>
        // corrupt archive (bad gzip magic, CRC mismatch, truncated
        // deflate stream): keep the records parsed before the
        // corruption point. The reference's per-file try/except
        // (extract_commoncrawl.py:75-77) drops the WHOLE file here —
        // partial recovery with the same task-never-dies containment.
    }
    records.iterator
  }

  private def parseInto(path: String, bytes: Array[Byte],
                        records: scala.collection.mutable.ArrayBuffer[WarcRecord]): Unit = {
    val in = new ByteArrayInputStream(bytes)
    val stream = new java.io.BufferedInputStream(
      if (path.endsWith(".gz")) new GZIPInputStream(in) else in)
    // byte-level line reads: WARC Content-Length counts BYTES, so the
    // record body must be consumed as bytes — a char Reader over-reads
    // every multi-byte UTF-8 body by (bytes − chars) and swallows the
    // following records' header lines into the body
    def readLine(): String = {
      val first = stream.read()
      if (first < 0) return null
      val sb = new java.io.ByteArrayOutputStream(128)
      var c = first
      while (c >= 0 && c != '\n') { if (c != '\r') sb.write(c); c = stream.read() }
      new String(sb.toByteArray, StandardCharsets.UTF_8)
    }
    // shared body-read buffer — per-record allocation would churn GC
    // on record-dense archives
    val chunk = new Array[Byte](1 << 16)
    var line = readLine()
    while (line != null) {
      if (line.startsWith("WARC/")) {
        val headers = scala.collection.mutable.Map[String, String]()
        var h = readLine()
        while (h != null && h.nonEmpty) {
          val i = h.indexOf(':')
          if (i > 0) headers(h.substring(0, i).trim.toLowerCase) = h.substring(i + 1).trim
          h = readLine()
        }
        // defensive length parse: crawl-scale WARCs routinely carry
        // garbage headers, and a non-numeric / negative Content-Length
        // must skip the body, not kill the task (the reference contains
        // per-file failures the same way, extract_commoncrawl.py:75-77
        // — but drops the WHOLE file where this keeps parsed records)
        val len = headers.get("content-length")
          .flatMap(_.toIntOption).filter(_ >= 0).getOrElse(0)
        // chunked body read: allocation tracks the bytes PRESENT, not
        // the declared length — a hostile Content-Length of 2^31-1
        // would otherwise allocate 2 GB per record before EOF is seen
        val body = new java.io.ByteArrayOutputStream(math.min(len, 1 << 16))
        var remaining = len
        var eof = false
        while (remaining > 0 && !eof) {
          val n = stream.read(chunk, 0, math.min(chunk.length, remaining))
          if (n < 0) eof = true else { body.write(chunk, 0, n); remaining -= n }
        }
        // truncated input keeps only the bytes actually read — never
        // NUL padding from the unwritten buffer tail
        val rec = WarcRecord(path,
          headers.getOrElse("warc-type", ""),
          headers.getOrElse("warc-target-uri", ""),
          new String(body.toByteArray, StandardCharsets.UTF_8))
        if (eof) {
          // EOF inside the body: a genuinely truncated file and an
          // over-declared length are indistinguishable here — keep the
          // partial record (the tested truncation contract)
          records += rec
          line = null
        } else {
          // frame validation: a well-formed record ends with a blank
          // terminator line. A non-blank next line means the declared
          // Content-Length was WRONG (an over-declaration just swallowed
          // the following bytes into this body) — the record is provably
          // mis-framed, so drop it rather than emit a body corrupted
          // with raw WARC framing; the outer loop then resyncs on the
          // next surviving "WARC/" header line
          line = readLine()
          if (line == null || line.isEmpty) {
            records += rec
            if (line != null) line = readLine()
          }
        }
      } else line = readLine()
    }
  }

  /** The reference's t1 extraction chain over parsed WARC records:
    * response filter (F-1), ".au" substring filter (F-2), regex
    * title/meta projection (F-3, nulls when absent) — all native
    * expressions (reference scripts/extract_commoncrawl.py:26-50,63-67). */
  def extractCompanies(records: DataFrame): DataFrame =
    records
      .filter(col("rec_type") === "response")
      .filter(col("target_uri").contains(".au"))
      .select(
        col("target_uri").as("website_url"),
        nullif(trim(regexp_extract(col("body"), "(?is)<title>(.*?)</title>", 1)), lit(""))
          .as("company_name"),
        nullif(trim(regexp_extract(col("body"),
          "(?is)<meta\\s+name=[\"']industry[\"']\\s+content=[\"'](.*?)[\"']", 1)), lit(""))
          .as("industry"))
}
