package graft.ledger

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S4/S5: the file-processing ledger — the reference's PostgreSQL
  * `file_processing_status` table (DDL at sudo_code.txt:25-49) re-homed
  * as a single-writer, versioned, Parquet-backed state table
  * (SURVEY.md §7.3).
  *
  * State machine (sudo_code.txt:35): PENDING → PROCESSING →
  * {SUCCEEDED | FAILED | QUARANTINED}; FAILED → PROCESSING (retry, with
  * `retry_count + 1`); FAILED rows that exhaust [[maxRetries]] are no
  * longer selectable and are finalized QUARANTINED — giving the
  * reference's declared-but-unused fifth state a job (SURVEY.md §7.5).
  *
  * Concurrency: the reference gets multi-runner safety from
  * `FOR UPDATE SKIP LOCKED` (psuedo_code.txt:170). Here every mutation
  * writes a complete new version directory `v%05d` via write-to-tmp +
  * atomic rename, and readers take max(version) — safe for one writer +
  * any readers, which is the engine's documented T4 semantics; a real
  * multi-runner deployment plugs a JDBC ledger behind the same API.
  *
  * Audit columns mirror the DDL: retry_count, error_message, job_run_id,
  * created_at / updated_at / processed_at — stamped with
  * `current_timestamp()` (F3, the reference's `NOW()`).
  *
  * Scale: the ledger is metadata-scale (one row per FILE, not per
  * record) — 9 TB of weekly JSON drops is ~1e5-1e6 rows, trivially a
  * single parquet footprint; every op here is one narrow scan.
  */
final class Ledger(spark: SparkSession, dir: String, maxRetries: Int = 3) {
  import Ledger._

  private val fs: FileSystem =
    FileSystem.get(new Path(dir).toUri, spark.sparkContext.hadoopConfiguration)

  private def versionPath(v: Int) = new Path(dir, f"v$v%05d")

  private def latestVersion: Int = {
    val p = new Path(dir)
    if (!fs.exists(p)) 0
    else fs.listStatus(p).map(_.getPath.getName)
      .filter(_.matches("v\\d{5}")).map(_.drop(1).toInt)
      .foldLeft(0)(math.max)
  }

  /** Latest ledger state (empty frame with the full schema if none). */
  def snapshot(): DataFrame = {
    val v = latestVersion
    if (v == 0) spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schema)
    else spark.read.parquet(versionPath(v).toString)
  }

  private def commit(df: DataFrame): Unit = {
    val next = latestVersion + 1
    val tmp = new Path(dir, s".tmp-$next")
    df.select(Schema.fieldNames.map(col).toSeq: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    if (!fs.rename(tmp, versionPath(next)))
      throw new java.io.IOException(s"ledger commit race: v$next already exists")
  }

  /** S5 registration: `INSERT ... ON CONFLICT (s3_key) DO NOTHING`
    * (psuedo_code.txt:112-125) as an anti-join. Returns the number of
    * newly registered files (A3, `COUNT_NEW_FILES` of sudo_code.txt:87-100).
    */
  def register(files: Seq[(String, Long)]): Long = {
    import spark.implicits._
    val prev = snapshot()
    val incoming = files.toDF("s3_key", "file_size")
      .join(prev.select("s3_key"), Seq("s3_key"), "left_anti")
      .select(
        col("s3_key"), col("file_size"),
        lit(Pending).as("processing_status"),
        lit(0).as("retry_count"),
        lit(null).cast("string").as("error_message"),
        lit(null).cast("string").as("job_run_id"),
        current_timestamp().as("created_at"),
        current_timestamp().as("updated_at"),
        lit(null).cast("timestamp").as("processed_at"))
    val n = incoming.count()
    if (n > 0) commit(prev.unionByName(incoming))
    n
  }

  /** S4/O1 batch selection: oldest-first top-k over selectable rows —
    * `SELECT s3_key ... WHERE processing_status IN ('PENDING','FAILED')
    * ORDER BY created_at LIMIT n` (psuedo_code.txt:170), with the
    * retry-budget guard.
    */
  def selectBatch(n: Int): Seq[String] =
    snapshot()
      .filter(col("processing_status").isin(Pending, Failed) &&
        col("retry_count") < maxRetries)
      .orderBy(col("created_at"), col("s3_key"))
      .limit(n)
      .select("s3_key")
      .collect().map(_.getString(0)).toSeq

  /** PENDING/FAILED → PROCESSING with retry_count + 1 (psuedo_code.txt:180). */
  def markProcessing(keys: Seq[String], runId: String): Unit =
    transition(keys) { df =>
      df.withColumn("retry_count", col("retry_count") + 1)
        .withColumn("processing_status", lit(Processing))
        .withColumn("job_run_id", lit(runId))
    }

  /** Terminal (or retryable-failure) transitions for a batch, keyed by
    * status; stamps processed_at for terminal states.
    */
  def markOutcome(outcomes: Map[String, String], runId: String,
                  errors: Map[String, String] = Map.empty): Unit = {
    if (outcomes.isEmpty) return
    val statusOf = typedLit(outcomes)
    val errorOf = typedLit(errors)
    transition(outcomes.keys.toSeq) { df =>
      val st = statusOf(col("s3_key"))
      df.withColumn("processing_status", st)
        .withColumn("error_message", errorOf(col("s3_key")))
        .withColumn("job_run_id", lit(runId))
        .withColumn("processed_at",
          when(st.isin(Succeeded, Quarantined), current_timestamp())
            .otherwise(col("processed_at")))
    }
  }

  /** Crash recovery (T3, psuedo_code.txt:252-259): any row still
    * PROCESSING under this run is downgraded to FAILED for re-pickup.
    */
  def failInFlight(runId: String, err: String): Unit = {
    val prev = snapshot()
    val hit = col("processing_status") === Processing && col("job_run_id") === runId
    commit(prev
      .withColumn("error_message", when(hit, lit(err)).otherwise(col("error_message")))
      .withColumn("updated_at", when(hit, current_timestamp()).otherwise(col("updated_at")))
      .withColumn("processing_status", when(hit, lit(Failed)).otherwise(col("processing_status"))))
  }

  /** FAILED rows out of retry budget → QUARANTINED (terminal). */
  def quarantineExhausted(runId: String): Long = {
    val prev = snapshot()
    val hit = col("processing_status") === Failed && col("retry_count") >= maxRetries
    val n = prev.filter(hit).count()
    if (n > 0)
      commit(prev
        .withColumn("processed_at", when(hit, current_timestamp()).otherwise(col("processed_at")))
        .withColumn("updated_at", when(hit, current_timestamp()).otherwise(col("updated_at")))
        .withColumn("job_run_id", when(hit, lit(runId)).otherwise(col("job_run_id")))
        .withColumn("processing_status", when(hit, lit(Quarantined)).otherwise(col("processing_status"))))
    n
  }

  private def transition(keys: Seq[String])(f: DataFrame => DataFrame): Unit = {
    val prev = snapshot()
    val hit = prev.filter(col("s3_key").isin(keys: _*))
    val rest = prev.filter(!col("s3_key").isin(keys: _*))
    commit(rest.unionByName(f(hit).withColumn("updated_at", current_timestamp())))
  }
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
}
