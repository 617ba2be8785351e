package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{current_timestamp, lit}

/** S7 + T5: the dead-letter queue — append-only JSON, one directory per
  * job run (`CORRUPT_RECORDS_DF.write.mode("append").json(dlq + runId)`,
  * psuedo_code.txt:203). Quarantine, not watermarks, is the reference's
  * whole late/bad-data story (SURVEY.md §2.9 T5).
  */
object DlqWriter {
  /** `mode` is per-run-DIRECTORY: "append" for ledger runs (each run id
    * is fresh), "overwrite" for streaming micro-batches whose ids are
    * stable across restarts — replaying a crashed batch then overwrites
    * its own directory instead of duplicating it. */
  def write(dlqRows: DataFrame, dlqDir: String, runId: String,
            mode: String = "append"): Unit =
    dlqRows
      .withColumn("job_run_id", lit(runId))
      .withColumn("quarantined_at", current_timestamp())
      .write.mode(mode)
      .json(s"$dlqDir/$runId")

  /** All DLQ records across runs (audit surface). */
  def read(spark: SparkSession, dlqDir: String): DataFrame =
    spark.read.json(s"$dlqDir/*")
}
