package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{StringType, StructType}
import graft.ingest._
import graft.pipeline.LakeLayout

/** The Structured-Streaming form of the reference's scheduled micro-batch
  * loop (T1, sudo_code.txt:104-109): instead of a cron re-running a batch
  * job against a ledger, a file-source stream with
  * `Trigger.AvailableNow` drains whatever has landed and stops; the
  * stream CHECKPOINT plays the ledger's file-tracking role (a re-run
  * processes nothing new — T2/T3 come from the engine, not hand-rolled
  * state). Both runners share the same Segregator/Transformer/writer
  * stages via `foreachBatch`, so the pipeline semantics — permissive
  * split, all-or-nothing file quarantine, DLQ, partitioned curated
  * append — are identical to [[graft.pipeline.BatchProcessor]].
  *
  * Delivery semantics, stated precisely: `foreachBatch` is AT-LEAST-ONCE
  * across crashes — a batch that wrote output but died before the
  * checkpoint commit is replayed on restart. The DLQ write is idempotent
  * (batch-id-keyed directory, overwritten on replay); the curated
  * parquet APPEND is not, so a crash inside a micro-batch can duplicate
  * that batch's curated rows. Exactly-once curated output needs either
  * the ledger runner (whose curated markers bound replay per FILE) or a
  * transactional table format under the sink. Across clean runs —
  * including the re-drain StreamingSpec asserts — output is
  * exactly-once.
  *
  * Trade-off vs the ledger runner (documented, both shipped): the
  * checkpoint is opaque (no per-file audit rows, no retry counters, no
  * QUARANTINED state to query), which is exactly why the reference built
  * an external ledger. Use this runner when the audit surface is not
  * required; at scale `maxFilesPerTrigger` bounds each micro-batch the
  * same way BATCH_SIZE_FILES_TO_SELECT does (psuedo_code.txt:148).
  */
object StreamingIngest {
  import RawJsonReader.{CorruptCol, SourceCol}

  /** Drain everything currently in `layout.rawDir` into the curated lake
    * + DLQ, exactly once per file across invocations (checkpoint under
    * the lake root). Blocks until the stream finishes.
    */
  def runAvailableNow(spark: SparkSession, layout: LakeLayout, contract: StructType,
                      maxFilesPerTrigger: Option[Int] = None): Unit = {
    val schema =
      if (contract.fieldNames.contains(CorruptCol)) contract
      else contract.add(CorruptCol, StringType, nullable = true)
    val reader = spark.readStream
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val raw = reader
      .option("recursiveFileLookup", "true")
      .json(layout.rawDir)
      .withColumn(SourceCol, regexp_replace(input_file_name(), "^file:(//)?", ""))

    val q = raw.writeStream
      .option("checkpointLocation", s"${layout.root}/checkpoint")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processMicroBatch(spark, batch.persist(), layout, s"stream-$batchId")
        batch.unpersist()
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** One micro-batch through the shared ingest stages — the §3.1 body
    * minus ledger bookkeeping (the checkpoint owns file-level
    * exactly-once here). */
  private def processMicroBatch(spark: SparkSession, raw: DataFrame,
                                layout: LakeLayout, runId: String): Unit = {
    val quarFiles = Segregator.fileDispositions(raw, "event_timestamp", "MODE")
      .filter(col("n_corrupt") + col("n_datebad") > 0)
      .select(SourceCol)
    val dlq = Segregator.dlqRecords(raw, "event_timestamp", "MODE", quarFiles)
    if (!dlq.isEmpty) DlqWriter.write(dlq, layout.dlqDir, runId, mode = "overwrite")
    val good = Segregator.goodRecords(raw, "event_timestamp", "MODE")
      .join(broadcast(quarFiles), Seq(SourceCol), "left_anti")
    if (!good.isEmpty)
      CuratedWriter.append(
        Transformer.curate(good).withColumnRenamed(SourceCol, "source_file"),
        layout.curatedDir)
  }
}
