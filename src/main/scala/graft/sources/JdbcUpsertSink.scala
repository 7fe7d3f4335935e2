package graft.sources

import java.sql.{Connection, DriverManager, SQLException}

import org.apache.spark.sql.{DataFrame, Row}

/** S-2's actual sink in the reference: batched JDBC upsert with
  * insert-if-absent semantics — Postgres `execute_values` +
  * `ON CONFLICT (abn) DO NOTHING` (reference scripts/extract_abr.py:57-66,
  * scripts/entity_matching.py:476-485). This is the Spark-native
  * equivalent: `foreachPartition`, one connection per partition, batched
  * single-statement upserts, duplicate keys silently skipped.
  *
  * Scale shape: no driver-side collect — every partition streams its rows
  * straight into the target over its own connection, so sink throughput
  * scales with executor count (bounded by what the RDBMS accepts; size
  * the DataFrame's partition count to the target's connection budget).
  * First-arrival-wins across concurrent partitions is exactly as
  * nondeterministic as the reference's parallel workers; pre-dedup with
  * [[graft.operators.Dedup.keepFirst]] when a deterministic winner is
  * required.
  *
  * Dialects: `postgresql` emits the reference's ON CONFLICT form.
  * `derby` (the embedded engine this sandbox can actually run) emits a
  * single-statement `MERGE ... WHEN NOT MATCHED THEN INSERT`, which has
  * identical skip-duplicates semantics. Races between concurrent
  * partitions inserting the same new key surface as duplicate-key errors
  * (SQLState 23505) — the batch falls back to row-at-a-time and ignores
  * exactly those, which is precisely what DO NOTHING does in-engine.
  */
object JdbcUpsertSink {

  private val DupKeySqlState = "23505"

  /** Single-row insert-if-absent statement with `?` placeholders (one per
    * column, key included in `cols`). */
  def upsertSql(dialect: String, table: String, cols: Seq[String],
                keyCol: String, keySqlType: String): String = {
    val colList = cols.mkString(", ")
    val placeholders = cols.map(_ => "?").mkString(", ")
    dialect match {
      case "postgresql" =>
        s"INSERT INTO $table ($colList) VALUES ($placeholders) ON CONFLICT ($keyCol) DO NOTHING"
      case "derby" =>
        // Derby requires a typed CAST for a parameter in the ON clause;
        // SYSDUMMY1 is the standard 1-row source for a values-merge.
        s"""MERGE INTO $table t USING SYSIBM.SYSDUMMY1 s
           |ON t.$keyCol = CAST(? AS $keySqlType)
           |WHEN NOT MATCHED THEN INSERT ($colList) VALUES ($placeholders)""".stripMargin
      case other =>
        throw new IllegalArgumentException(s"unsupported jdbc dialect: $other")
    }
  }

  private def dialectOf(url: String): String =
    if (url.startsWith("jdbc:postgresql")) "postgresql"
    else if (url.startsWith("jdbc:derby")) "derby"
    else throw new IllegalArgumentException(s"cannot infer dialect from $url")

  /** One writer at a time per EMBEDDED Derby database. Concurrent
    * partition tasks in one JVM can deadlock inside Derby's engine on
    * raw Java monitors — observed live (round 9, full-suite run): task A
    * in `BaseContainerHandle.close` holds the container-handle monitor
    * and waits for a `StoredPage` monitor, while task B in
    * `BasePage.releaseExclusive` holds that page monitor and waits for
    * the container handle (DerbyObservable notify/delete inversion,
    * reached from MERGE error-cleanup racing another task's page
    * release). That is a JVM-level deadlock: no SQLException, no lock
    * timeout, both tasks parked forever — the 40xxx retry path below
    * never sees it. Server dialects (postgresql) keep full per-partition
    * parallelism; embedded Derby exists only as the sandbox's in-process
    * test double, where serialized writes cost nothing real. Keyed per
    * URL so distinct test databases don't serialize each other. */
  private val embeddedWriteLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Canonical lock key for an embedded-Derby URL: the database path
    * alone, attributes stripped, the optional `directory:`
    * subsubprotocol (Derby's explicit spelling of the default) removed,
    * and the path resolved absolute. URL variants of the SAME database
    * (`;create=true` appended, relative vs absolute path,
    * `jdbc:derby:directory:foo` vs `jdbc:derby:foo`) must map to ONE
    * lock — keyed on the raw URL string they would take distinct locks
    * and the JVM-level deadlock the lock exists to prevent would stay
    * reachable. */
  private[graft] def embeddedLockKey(url: String): String = {
    val db = url.stripPrefix("jdbc:derby:").takeWhile(_ != ';')
    if (db.startsWith("memory:")) db
    else {
      val dir = db.stripPrefix("directory:")
      try new java.io.File(dir).getCanonicalPath
      catch { case _: java.io.IOException => new java.io.File(dir).getAbsolutePath }
    }
  }

  private def withDialectLock[A](dialect: String, url: String)(body: => A): A =
    if (dialect == "derby") {
      val lock = embeddedWriteLocks.computeIfAbsent(embeddedLockKey(url), _ => new Object)
      lock.synchronized(body)
    } else body

  /** Write `df` into `table`, skipping rows whose `keyCol` already exists
    * (reference ON-CONFLICT-DO-NOTHING parity). `cols` defaults to the
    * DataFrame's columns; the target table and its unique/PK constraint
    * on `keyCol` must already exist. */
  def writeIfAbsent(df: DataFrame, url: String, table: String, keyCol: String,
                    keySqlType: String = "VARCHAR(64)",
                    batchSize: Int = 500): Unit = {
    val cols = df.columns.toSeq
    require(cols.contains(keyCol), s"key column $keyCol not in ${cols.mkString(",")}")
    val dialect = dialectOf(url)
    val sql = upsertSql(dialect, table, cols, keyCol, keySqlType)
    val keyIdx = cols.indexOf(keyCol)
    // derby's MERGE binds the key once in ON plus every column; postgres
    // binds only the columns
    val bindKeyFirst = dialect == "derby"
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.nonEmpty) withDialectLock(dialect, url) {
        val conn = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(sql)
          try {
            var pending = List.empty[Row]
            var n = 0
            def bind(r: Row): Unit = {
              var p = 1
              if (bindKeyFirst) { ps.setObject(p, r.get(keyIdx)); p += 1 }
              var i = 0
              while (i < cols.length) { ps.setObject(p + i, r.get(i)); i += 1 }
            }
            // Row-at-a-time recovery path with per-row commit: ignores
            // duplicate-key (the in-engine DO NOTHING outcome of a
            // concurrent-partition race) and retries transient lock
            // errors (Derby's MERGE can deadlock where Postgres's ON
            // CONFLICT resolves in-engine; SQLState 40xxx). Anything
            // else — schema mismatch, constraint violations on other
            // columns — still fails the task loudly.
            def execRowWithRetry(r: Row): Unit = {
              var attempts = 0
              var done = false
              while (!done) {
                bind(r)
                done = try { ps.executeUpdate(); conn.commit(); true }
                catch {
                  case e: SQLException if isDupKey(e) => conn.rollback(); true
                  case e: SQLException
                      if isTransient(e) && attempts < 20 =>
                    conn.rollback(); attempts += 1
                    Thread.sleep(5L * attempts)
                    false
                }
              }
            }
            def flush(): Unit = if (pending.nonEmpty) {
              try {
                ps.executeBatch()
                conn.commit()
              } catch {
                case _: SQLException =>
                  conn.rollback()
                  ps.clearBatch()
                  pending.reverse.foreach(execRowWithRetry)
              }
              pending = Nil
              n = 0
            }
            rows.foreach { r =>
              bind(r)
              ps.addBatch()
              pending ::= r
              n += 1
              if (n >= batchSize) flush()
            }
            flush()
          } finally ps.close()
        } finally conn.close()
      }
    }
  }

  private def isDupKey(e: SQLException): Boolean =
    anyState(e)(DupKeySqlState.equals)

  /** Deadlock / lock-timeout class (SQLState 40xxx) — safe to retry. */
  private def isTransient(e: SQLException): Boolean =
    anyState(e)(s => s != null && s.startsWith("40"))

  private def anyState(e: SQLException)(p: String => Boolean): Boolean = {
    var cur: SQLException = e
    while (cur != null) {
      if (p(cur.getSQLState)) return true
      cur = cur.getNextException
    }
    false
  }

  /** Convenience for tests/tools: run DDL/queries on the target. */
  def withConnection[A](url: String)(f: Connection => A): A = {
    val conn = DriverManager.getConnection(url)
    try f(conn) finally conn.close()
  }
}
