package graft.ledger

import java.sql.{Connection, DriverManager, PreparedStatement, Timestamp}
import java.time.Instant
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** JDBC-backed [[Ledger]] — the shape the reference actually deploys:
  * `file_processing_status` as a real SQL table on RDS PostgreSQL
  * (sudo_code.txt:25-49), with batch selection via
  * `SELECT ... FOR UPDATE SKIP LOCKED` (psuedo_code.txt:170).
  *
  * This sandbox runs it on embedded Derby (the only JDBC engine shipped
  * with Spark, `/opt/spark/jars/derby-*.jar`); dialect notes for a real
  * Postgres deployment:
  *
  *  - conflict-ignore registration: Derby has no `ON CONFLICT DO
  *    NOTHING`, so [[register]] uses `INSERT ... SELECT ... WHERE NOT
  *    EXISTS` per key inside ONE transaction — Postgres would use the
  *    reference's `ON CONFLICT (s3_key) DO NOTHING` batch verbatim.
  *  - multi-runner claim: Derby supports `FOR UPDATE` (row locks) but
  *    not `SKIP LOCKED`; [[claimBatch]] wins each key with an atomic
  *    conditional UPDATE (status-guarded CAS — exactly one runner's
  *    statement matches the row), and a Postgres deployment swaps it
  *    for `SELECT ... FOR UPDATE SKIP LOCKED` so concurrent runners
  *    shard the backlog instead of blocking on it. Zero double-claims
  *    under two concurrent runners is asserted in LedgerSpec.
  *  - every mutator is a single SQL statement (or one transaction), so —
  *    unlike the parquet ledger's single-writer contract — two
  *    JdbcLedger instances CAN safely drive the same table; state lives
  *    in the database, nothing is cached driver-side.
  *
  * Stale-PROCESSING reclaim happens at construction, mirroring
  * [[ParquetLedger]]'s load-time rule (a multi-runner deployment would
  * use lease timeouts instead; documented, not implemented — this
  * sandbox is single-JVM).
  */
final class JdbcLedger(spark: SparkSession, url: String, maxRetries: Int = 3)
    extends Ledger {
  import Ledger._

  private val conn: Connection = DriverManager.getConnection(url)
  conn.setAutoCommit(true)
  ensureTable()
  reclaimStale()

  private def now(): Timestamp = Timestamp.from(Instant.now())

  private def ensureTable(): Unit = {
    val meta = conn.getMetaData.getTables(null, null, "FILE_PROCESSING_STATUS", null)
    val exists = meta.next()
    meta.close()
    if (!exists) {
      val st = conn.createStatement()
      // mirrors the RDS DDL (sudo_code.txt:27-47); Derby types
      st.executeUpdate(
        """CREATE TABLE file_processing_status (
          |  id BIGINT GENERATED ALWAYS AS IDENTITY PRIMARY KEY,
          |  s3_key VARCHAR(1024) NOT NULL UNIQUE,
          |  file_size BIGINT,
          |  processing_status VARCHAR(16) NOT NULL,
          |  retry_count INT NOT NULL,
          |  error_message VARCHAR(4096),
          |  job_run_id VARCHAR(64),
          |  created_at TIMESTAMP NOT NULL,
          |  updated_at TIMESTAMP NOT NULL,
          |  processed_at TIMESTAMP
          |)""".stripMargin)
      // the selection predicate's index (sudo_code.txt:48: status index)
      st.executeUpdate(
        "CREATE INDEX idx_fps_status ON file_processing_status (processing_status)")
      st.close()
    }
  }

  private def reclaimStale(): Unit = {
    val ps = conn.prepareStatement(
      """UPDATE file_processing_status
        |SET processing_status = ?, error_message = ?, updated_at = ?
        |WHERE processing_status = ?""".stripMargin)
    ps.setString(1, Failed)
    ps.setString(2, "reclaimed: writer crashed mid-batch")
    ps.setTimestamp(3, now())
    ps.setString(4, Processing)
    ps.executeUpdate()
    ps.close()
  }

  def snapshot(): DataFrame = {
    val st = conn.createStatement()
    val rs = st.executeQuery(
      """SELECT s3_key, file_size, processing_status, retry_count, error_message,
        |       job_run_id, created_at, updated_at, processed_at
        |FROM file_processing_status ORDER BY id""".stripMargin)
    val rows = Iterator.continually(rs).takeWhile(_.next()).map { r =>
      Row(r.getString(1), r.getLong(2), r.getString(3), r.getInt(4),
        r.getString(5), r.getString(6), r.getTimestamp(7), r.getTimestamp(8),
        r.getTimestamp(9))
    }.toVector
    rs.close(); st.close()
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, rows.size / 100000 + 1)), Schema)
  }

  def register(files: Seq[(String, Long)]): Long = {
    // one transaction; Postgres replaces the NOT EXISTS dance with the
    // reference's `ON CONFLICT (s3_key) DO NOTHING` executeBatch
    conn.setAutoCommit(false)
    try {
      val ps = conn.prepareStatement(
        """INSERT INTO file_processing_status
          |  (s3_key, file_size, processing_status, retry_count, created_at, updated_at)
          |SELECT ?, ?, ?, 0, ?, ? FROM SYSIBM.SYSDUMMY1
          |WHERE NOT EXISTS
          |  (SELECT 1 FROM file_processing_status WHERE s3_key = ?)""".stripMargin)
      val ts = now()
      var inserted = 0L
      files.foreach { case (k, sz) =>
        ps.setString(1, k); ps.setLong(2, sz); ps.setString(3, Pending)
        ps.setTimestamp(4, ts); ps.setTimestamp(5, ts); ps.setString(6, k)
        inserted += ps.executeUpdate()
      }
      ps.close()
      conn.commit()
      inserted
    } catch {
      case e: Throwable => conn.rollback(); throw e
    } finally conn.setAutoCommit(true)
  }

  def selectBatch(n: Int): Seq[String] = {
    val ps = conn.prepareStatement(
      s"""SELECT s3_key FROM file_processing_status
         |WHERE processing_status IN ('$Pending', '$Failed') AND retry_count < ?
         |ORDER BY created_at, s3_key
         |FETCH FIRST ? ROWS ONLY""".stripMargin)
    ps.setInt(1, maxRetries)
    ps.setInt(2, n)
    val rs = ps.executeQuery()
    val keys = Iterator.continually(rs).takeWhile(_.next()).map(_.getString(1)).toVector
    rs.close(); ps.close()
    keys
  }

  private def inClause(ps: PreparedStatement, from: Int, keys: Seq[String]): Unit =
    keys.zipWithIndex.foreach { case (k, i) => ps.setString(from + i, k) }
  private def marks(n: Int): String = Seq.fill(n)("?").mkString(", ")

  /** MULTI-RUNNER claim (the Derby analogue of the reference's `FOR
    * UPDATE SKIP LOCKED`, psuedo_code.txt:170): select candidates, then
    * win each key with a CONDITIONAL single-statement UPDATE — `WHERE
    * processing_status` still claimable — which is atomic per statement,
    * so exactly ONE runner's update matches each row; the loser's
    * update touches 0 rows and it simply proceeds with the keys it won.
    * Returns the won keys (possibly fewer than `n` when rivals claimed
    * overlapping candidates — the backlog shards instead of blocking).
    * A Postgres deployment replaces candidate-select + per-key CAS with
    * `SELECT ... FOR UPDATE SKIP LOCKED` in one transaction; the
    * interface and the zero-double-claim guarantee are identical
    * (LedgerSpec proves it with two concurrent runners draining one
    * Derby ledger). */
  def claimBatch(n: Int, runId: String): Seq[String] = {
    val candidates = selectBatch(n)
    candidates.filter { k =>
      val ps = conn.prepareStatement(
        s"""UPDATE file_processing_status
           |SET processing_status = ?, retry_count = retry_count + 1,
           |    job_run_id = ?, updated_at = ?
           |WHERE s3_key = ? AND processing_status IN ('$Pending', '$Failed')
           |  AND retry_count < ?""".stripMargin)
      ps.setString(1, Processing); ps.setString(2, runId); ps.setTimestamp(3, now())
      ps.setString(4, k); ps.setInt(5, maxRetries)
      val won = try ps.executeUpdate() == 1 finally ps.close()
      won
    }
  }

  def markProcessing(keys: Seq[String], runId: String): Unit = {
    if (keys.isEmpty) return
    val ps = conn.prepareStatement(
      s"""UPDATE file_processing_status
         |SET processing_status = ?, retry_count = retry_count + 1,
         |    job_run_id = ?, updated_at = ?
         |WHERE s3_key IN (${marks(keys.size)})""".stripMargin)
    ps.setString(1, Processing); ps.setString(2, runId); ps.setTimestamp(3, now())
    inClause(ps, 4, keys)
    ps.executeUpdate(); ps.close()
  }

  def markOutcome(outcomes: Map[String, String], runId: String,
                  errors: Map[String, String] = Map.empty): Unit = {
    if (outcomes.isEmpty) return
    val ts = now()
    conn.setAutoCommit(false)
    try {
      outcomes.groupBy(_._2).foreach { case (status, group) =>
        val keys = group.keys.toSeq
        val terminal = status == Succeeded || status == Quarantined
        keys.foreach { k =>
          val ps = conn.prepareStatement(
            s"""UPDATE file_processing_status
               |SET processing_status = ?, job_run_id = ?, error_message = ?,
               |    updated_at = ?${if (terminal) ", processed_at = ?" else ""}
               |WHERE s3_key = ?""".stripMargin)
          ps.setString(1, status); ps.setString(2, runId)
          ps.setString(3, errors.get(k).orNull); ps.setTimestamp(4, ts)
          if (terminal) { ps.setTimestamp(5, ts); ps.setString(6, k) }
          else ps.setString(5, k)
          ps.executeUpdate(); ps.close()
        }
      }
      conn.commit()
    } catch {
      case e: Throwable => conn.rollback(); throw e
    } finally conn.setAutoCommit(true)
  }

  def failInFlight(runId: String, err: String): Unit = {
    val ps = conn.prepareStatement(
      """UPDATE file_processing_status
        |SET processing_status = ?, error_message = ?, updated_at = ?
        |WHERE processing_status = ? AND job_run_id = ?""".stripMargin)
    ps.setString(1, Failed); ps.setString(2, err); ps.setTimestamp(3, now())
    ps.setString(4, Processing); ps.setString(5, runId)
    ps.executeUpdate(); ps.close()
  }

  def quarantineExhausted(runId: String): Long = {
    val ts = now()
    val ps = conn.prepareStatement(
      """UPDATE file_processing_status
        |SET processing_status = ?, job_run_id = ?, updated_at = ?, processed_at = ?
        |WHERE processing_status = ? AND retry_count >= ?""".stripMargin)
    ps.setString(1, Quarantined); ps.setString(2, runId)
    ps.setTimestamp(3, ts); ps.setTimestamp(4, ts)
    ps.setString(5, Failed); ps.setInt(6, maxRetries)
    val n = ps.executeUpdate().toLong
    ps.close()
    n
  }

  def close(): Unit = conn.close()
}

object JdbcLedger {
  /** Embedded-Derby url for a ledger living under `dir` (creates the
    * database on first open). */
  def derbyUrl(dir: String): String = s"jdbc:derby:$dir/ledger-db;create=true"
}
