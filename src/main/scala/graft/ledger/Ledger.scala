package graft.ledger

import java.sql.Timestamp
import java.time.Instant
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** S4/S5: the file-processing ledger — the reference's PostgreSQL
  * `file_processing_status` table (DDL at sudo_code.txt:25-49) as a
  * pluggable trait (SURVEY.md §7.3: "JDBC stays pluggable behind the
  * `Ledger` trait"). Two implementations ship:
  *
  *  - [[ParquetLedger]]: single-writer, versioned, parquet-persisted
  *    state table — zero external dependencies, the default.
  *  - [[JdbcLedger]]: a real SQL table behind a JDBC url (embedded Derby
  *    in this sandbox; the Postgres-dialect differences are documented on
  *    the class) — the shape the reference actually deploys
  *    (psuedo_code.txt:170 `SELECT ... FOR UPDATE SKIP LOCKED`).
  *
  * State machine (sudo_code.txt:35): PENDING → PROCESSING →
  * {SUCCEEDED | FAILED | QUARANTINED}; FAILED → PROCESSING (retry, with
  * `retry_count + 1`); FAILED rows that exhaust the retry budget are no
  * longer selectable and are finalized QUARANTINED — giving the
  * reference's declared-but-unused fifth state a job (SURVEY.md §7.5).
  */
trait Ledger {
  /** Latest ledger state as a DataFrame (for the audit/query surface). */
  def snapshot(): DataFrame

  /** S5 registration: `INSERT ... ON CONFLICT (s3_key) DO NOTHING`
    * (psuedo_code.txt:112-125). Returns the number of newly registered
    * files (A3, `COUNT_NEW_FILES` of sudo_code.txt:87-100). */
  def register(files: Seq[(String, Long)]): Long

  /** S4/O1 batch selection: oldest-first top-k over selectable rows —
    * `SELECT s3_key ... WHERE processing_status IN ('PENDING','FAILED')
    * ORDER BY created_at LIMIT n` (psuedo_code.txt:170), with the
    * retry-budget guard. */
  def selectBatch(n: Int): Seq[String]

  /** PENDING/FAILED → PROCESSING with retry_count + 1 (psuedo_code.txt:180). */
  def markProcessing(keys: Seq[String], runId: String): Unit

  /** Terminal (or retryable-failure) transitions for a batch, keyed by
    * status; stamps processed_at for terminal states. */
  def markOutcome(outcomes: Map[String, String], runId: String,
                  errors: Map[String, String] = Map.empty): Unit

  /** Crash recovery within a run (T3, psuedo_code.txt:252-259): any row
    * still PROCESSING under this run is FAILED for re-pickup. */
  def failInFlight(runId: String, err: String): Unit

  /** FAILED rows out of retry budget → QUARANTINED (terminal). */
  def quarantineExhausted(runId: String): Long
}

object Ledger {
  val Pending = "PENDING"
  val Processing = "PROCESSING"
  val Succeeded = "SUCCEEDED"
  val Failed = "FAILED"
  val Quarantined = "QUARANTINED"

  /** Mirrors the RDS DDL (sudo_code.txt:27-47). */
  val Schema: StructType = StructType(Seq(
    StructField("s3_key", StringType),
    StructField("file_size", LongType),
    StructField("processing_status", StringType),
    StructField("retry_count", IntegerType),
    StructField("error_message", StringType),
    StructField("job_run_id", StringType),
    StructField("created_at", TimestampType),
    StructField("updated_at", TimestampType),
    StructField("processed_at", TimestampType)))

  /** Default implementation (parquet-backed, single writer). */
  def apply(spark: SparkSession, dir: String, maxRetries: Int = 3): Ledger =
    new ParquetLedger(spark, dir, maxRetries)

  /** Version directories under a parquet ledger dir. Shared by the
    * writer and [[readOnlySnapshot]] so the name contract lives once;
    * `v\d{5,}` because %05d grows past five digits after 99999 commits
    * (a 15-min loop at ~3 commits/batch gets there in years, not
    * never). */
  private[ledger] def listVersions(fs: FileSystem, dir: String): Seq[Int] = {
    val p = new Path(dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.matches("v\\d{5,}")).map(_.drop(1).toInt)
  }

  /** Read-only view of the latest committed parquet-ledger version, for
    * monitoring/audit paths. Unlike constructing a [[ParquetLedger]],
    * this performs NO filesystem writes and NO state transitions: it
    * does not reclaim in-flight PROCESSING rows as FAILED (they are
    * legitimately in flight when a live writer owns the ledger) and does
    * not prune version directories out from under that writer. The
    * snapshot is EAGER (localCheckpoint) so a live writer pruning the
    * read version after this call cannot fail the caller's later
    * actions; the read itself retries once if it loses that race.
    * Returns an empty frame with the ledger schema when no version
    * exists. */
  def readOnlySnapshot(spark: SparkSession, dir: String): DataFrame = {
    val fs = FileSystem.get(new Path(dir).toUri, spark.sparkContext.hadoopConfiguration)
    def attempt(): DataFrame = {
      val versions = listVersions(fs, dir)
      if (versions.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], Schema)
      else spark.read.parquet(new Path(dir, f"v${versions.max}%05d").toString)
        .localCheckpoint(true)
    }
    try attempt()
    catch { case _: org.apache.spark.SparkException | _: java.io.FileNotFoundException =>
      attempt() // the version fell out of the writer's retention window mid-read
    }
  }

  private[ledger] case class Rec(
      s3Key: String, fileSize: Long, status: String, retry: Int,
      error: Option[String], runId: Option[String],
      createdAt: Timestamp, updatedAt: Timestamp, processedAt: Option[Timestamp])

  private[ledger] def toRows(state: Seq[Rec]): Seq[Row] = state.map(r => Row(
    r.s3Key, r.fileSize, r.status, r.retry,
    r.error.orNull, r.runId.orNull, r.createdAt, r.updatedAt, r.processedAt.orNull))
}

/** Parquet-backed [[Ledger]].
  *
  * Execution model mirrors the reference exactly: ledger operations are
  * DRIVER TRANSACTIONS (SURVEY.md §2.1 S4 — "not a distributed read"),
  * so state lives in driver memory and every mutation persists a
  * complete new version directory `v%05d` (write-to-tmp + atomic
  * rename). The ledger is metadata-scale — one row per FILE, not per
  * record; 9 TB of weekly JSON drops is ~1e5-1e6 rows — so the
  * in-memory copy is a few MB and a version write is one tiny parquet
  * footprint. Selection/update never cost a cluster job; only the
  * durability write does.
  *
  * Durability cost is BOUNDED (not O(history)): because every version is
  * a complete snapshot, any retained version alone is a valid recovery
  * point, so commits keep a fixed window of the last [[versionWindow]]
  * versions and delete the one falling out — directory size stays ≤
  * window+1 forever. The current version number is tracked in memory
  * after load (single-writer invariant), so a commit does ONE exists
  * check + one delete, never an O(versions) directory re-list.
  *
  * Concurrency (T4): the reference gets multi-runner safety from
  * `FOR UPDATE SKIP LOCKED` (psuedo_code.txt:170); here the documented
  * contract is ONE writer instance per ledger directory (readers are
  * free). Crash recovery: rows still PROCESSING when a ledger is LOADED
  * are stale by definition (single writer) and are reclaimed as FAILED
  * for re-pickup — the reference's crashed-work rule
  * (psuedo_code.txt:57-59). A multi-runner deployment plugs [[JdbcLedger]]
  * behind the same trait.
  *
  * Audit columns mirror the DDL: retry_count, error_message, job_run_id,
  * created_at / updated_at / processed_at (the reference's `NOW()`, F3).
  */
final class ParquetLedger(spark: SparkSession, dir: String, maxRetries: Int = 3,
                          versionWindow: Int = 8) extends Ledger {
  import Ledger._

  private val fs: FileSystem =
    FileSystem.get(new Path(dir).toUri, spark.sparkContext.hadoopConfiguration)

  // Single directory listing at construction; afterwards the version
  // counter lives in memory (single-writer invariant) and commits never
  // re-list. Also prunes any versions an older build left beyond the
  // retention window.
  private var curVersion: Int = listVersions().foldLeft(0)(math.max)
  private var state: Vector[Rec] = load()
  private var dirty = false // stale-PROCESSING reclaim pending persistence
  pruneBeyondWindow()

  private def now(): Timestamp = Timestamp.from(Instant.now())

  private def versionPath(v: Int) = new Path(dir, f"v$v%05d")

  private def listVersions(): Seq[Int] = Ledger.listVersions(fs, dir)

  private def pruneBeyondWindow(): Unit =
    listVersions().filter(_ <= curVersion - versionWindow)
      .foreach(v => fs.delete(versionPath(v), true): Unit)

  private def load(): Vector[Rec] = {
    val rows =
      if (curVersion == 0) Vector.empty
      else spark.read.parquet(versionPath(curVersion).toString).collect().toVector.map { r =>
        Rec(r.getAs[String]("s3_key"), r.getAs[Long]("file_size"),
          r.getAs[String]("processing_status"), r.getAs[Int]("retry_count"),
          Option(r.getAs[String]("error_message")), Option(r.getAs[String]("job_run_id")),
          r.getAs[Timestamp]("created_at"), r.getAs[Timestamp]("updated_at"),
          Option(r.getAs[Timestamp]("processed_at")))
      }
    // crashed-work reclaim: PROCESSING at load time is stale (T3)
    val reclaimed = rows.map { r =>
      if (r.status == Processing)
        r.copy(status = Failed, error = Some("reclaimed: writer crashed mid-batch"),
          updatedAt = now())
      else r
    }
    dirty = reclaimed != rows
    reclaimed
  }

  private def commit(): Unit = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(toRows(state), 1), Schema)
    val next = curVersion + 1
    val tmp = new Path(dir, s".tmp-$next")
    df.write.mode("overwrite").parquet(tmp.toString)
    if (!fs.rename(tmp, versionPath(next)))
      throw new java.io.IOException(s"ledger commit race: v$next already exists")
    curVersion = next
    // retention: the version falling out of the window; every retained
    // version is a full snapshot, so this deletes no recovery capability
    val evicted = versionPath(next - versionWindow)
    if (next - versionWindow > 0 && fs.exists(evicted)) fs.delete(evicted, true): Unit
    dirty = false
  }

  def snapshot(): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(toRows(state), math.max(1, state.size / 100000 + 1)),
      Schema)

  def register(files: Seq[(String, Long)]): Long = {
    val known = state.map(_.s3Key).toSet
    val ts = now()
    val fresh = files.filterNot { case (k, _) => known(k) }
      .map { case (k, sz) => Rec(k, sz, Pending, 0, None, None, ts, ts, None) }
    if (fresh.nonEmpty || dirty) {
      state = state ++ fresh
      commit()
    }
    fresh.size.toLong
  }

  def selectBatch(n: Int): Seq[String] =
    state.filter(r => (r.status == Pending || r.status == Failed) && r.retry < maxRetries)
      .sortBy(r => (r.createdAt.getTime, r.s3Key))
      .take(n).map(_.s3Key)

  def markProcessing(keys: Seq[String], runId: String): Unit =
    mutate(keys.toSet) { r =>
      r.copy(status = Processing, retry = r.retry + 1, runId = Some(runId))
    }

  def markOutcome(outcomes: Map[String, String], runId: String,
                  errors: Map[String, String] = Map.empty): Unit = {
    if (outcomes.isEmpty) return
    val ts = now()
    mutate(outcomes.keySet) { r =>
      val st = outcomes(r.s3Key)
      r.copy(status = st, runId = Some(runId), error = errors.get(r.s3Key),
        processedAt = if (st == Succeeded || st == Quarantined) Some(ts) else r.processedAt)
    }
  }

  def failInFlight(runId: String, err: String): Unit =
    mutate(state.filter(r => r.status == Processing && r.runId.contains(runId))
      .map(_.s3Key).toSet) { r =>
      r.copy(status = Failed, error = Some(err))
    }

  def quarantineExhausted(runId: String): Long = {
    val hit = state.filter(r => r.status == Failed && r.retry >= maxRetries).map(_.s3Key).toSet
    if (hit.nonEmpty) {
      val ts = now()
      mutate(hit)(r => r.copy(status = Quarantined, runId = Some(runId), processedAt = Some(ts)))
    }
    hit.size.toLong
  }

  private def mutate(keys: Set[String])(f: Rec => Rec): Unit = {
    if (keys.isEmpty) return
    val ts = now()
    state = state.map(r => if (keys(r.s3Key)) f(r).copy(updatedAt = ts) else r)
    commit()
  }
}
