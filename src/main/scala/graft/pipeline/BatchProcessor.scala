package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ingest._
import graft.ledger.{Discovery, Ledger}

/** Directory layout of one lake instance (mirrors the reference's
  * prefixes, psuedo_code.txt:5-11). */
final case class LakeLayout(root: String) {
  val rawDir = s"$root/raw"
  val processedDir = s"$root/raw-processed"
  val curatedDir = s"$root/curated"
  val dlqDir = s"$root/dlq"
  val ledgerDir = s"$root/ledger"
}

/** §3.1: `JsonToParquetBatchProcessor` — the reference's core ETL job
  * (psuedo_code.txt:143-265), orchestrated over the Spark-native parts:
  *
  *   select batch (O1) → PROCESSING → permissive read (S1/S2) →
  *   segregate (P6/P7) → DLQ (S7/T5) → transform (P1-P5/F1) →
  *   partitioned parquet append (S6) → archive clean files (S8) →
  *   per-file terminal status (S5), current_timestamp audit stamps (F3).
  *
  * Differences from the reference, on purpose (SURVEY.md §7.5):
  *  - file success is ALL-OR-NOTHING: a file with any corrupt or
  *    unpartitionable record is QUARANTINED and none of its rows reach
  *    the curated lake (they all go to the DLQ), where the reference
  *    re-appends partial files on retry. Replay of a FAILED file is
  *    guarded by a per-file curated MARKER so a retry after a failed
  *    archive (or a crash after the append) does not re-append its rows;
  *    the residual duplicate window is a crash between the append and
  *    the marker write — closing that fully needs a transactional table
  *    format under the sink;
  *  - per-file dispositions come from ONE aggregate (file-level collect
  *    bounded by batch size), not `distinct().collect()` per branch —
  *    and the raw frame is persisted across its four uses (pitfall P1);
  *  - a job-level failure marks the batch FAILED for re-pickup (T3); rows
  *    out of retry budget finalize QUARANTINED.
  *
  * T1/T2: [[runUntilDrained]] is the scheduler loop — re-run until the
  * ledger has no selectable work, then exit gracefully.
  */
final class BatchProcessor(
    spark: SparkSession,
    layout: LakeLayout,
    contract: StructType,
    batchSize: Int = 10000,
    maxRetries: Int = 3) {

  val ledger = new Ledger(spark, layout.ledgerDir, maxRetries)
  private var runCounter = 0

  import RawJsonReader.SourceCol

  /** One scheduled tick. Returns false iff there was no work (T2). */
  def runOnce(): Boolean = {
    runCounter += 1
    val runId = f"run-$runCounter%05d"
    Discovery.run(spark, layout.rawDir, ledger)
    val batch = ledger.selectBatch(batchSize)
    if (batch.isEmpty) return false
    ledger.markProcessing(batch, runId)
    try {
      processBatch(batch, runId)
    } catch {
      case e: Exception =>
        // T3: crash handling — everything still PROCESSING in this run is
        // FAILED for re-pickup next tick (psuedo_code.txt:252-259).
        ledger.failInFlight(runId, Option(e.getMessage).getOrElse(e.getClass.getName))
    }
    // Retry exhaustion can also be reached through per-file FAILED
    // outcomes (e.g. repeated archive failures), so finalize on every
    // tick, not just the exception path.
    ledger.quarantineExhausted(runId)
    true
  }

  private def processBatch(batch: Seq[String], runId: String): Unit = {
    val raw = RawJsonReader.read(spark, batch, contract).persist()
    try {
      // Per-file dispositions in one aggregate; collect is file-level.
      // The column carries input_file_name()'s percent-encoded form while
      // ledger keys are decoded — match through PathNorm, and keep the
      // ENCODED values for the row-level joins below.
      val dispRows = Segregator.fileDispositions(raw, "event_timestamp", "MODE")
        .collect()
        .map(r => r.getAs[String](SourceCol) ->
          (r.getAs[Long]("n_corrupt") + r.getAs[Long]("n_datebad")))
      val disp = dispRows.map { case (enc, bad) => PathNorm.fromString(enc) -> bad }.toMap
      val cleanFiles = batch.filter(f => disp.getOrElse(f, 0L) == 0L)
      val quarFiles = batch.filter(f => disp.getOrElse(f, 0L) > 0L)

      // DLQ: corrupt + unpartitionable + stranded-good rows of quarantined
      // files (S7; nothing is silently dropped).
      val quarEnc = dispRows.collect { case (enc, bad) if bad > 0L => enc }
      if (quarEnc.nonEmpty) {
        import spark.implicits._
        DlqWriter.write(
          Segregator.dlqRecords(raw, "event_timestamp", "MODE", quarEnc.toSeq.toDF(SourceCol)),
          layout.dlqDir, runId)
      }

      // Curate rows of clean files only. Replay safety: a file whose rows
      // already reached the lake on a previous attempt (append succeeded,
      // then archive failed or the writer crashed before SUCCEEDED) has a
      // curated MARKER and is excluded from the append — re-processing it
      // must not duplicate its rows. The residual window is a crash
      // between the append and its marker write; closing it fully needs a
      // transactional table format, which is out of scope and documented.
      val toCurate = cleanFiles.filterNot(markerExists)
      val curateEnc = {
        val toCurateSet = toCurate.toSet
        dispRows.collect {
          case (enc, 0L) if toCurateSet(PathNorm.fromString(enc)) => enc
        }
      }
      if (curateEnc.nonEmpty) {
        import spark.implicits._
        val good = Segregator.goodRecords(raw, "event_timestamp", "MODE")
          .join(broadcast(curateEnc.toSeq.toDF(SourceCol)), Seq(SourceCol), "left_semi")
        CuratedWriter.append(
          Transformer.curate(good).withColumnRenamed(SourceCol, "source_file"),
          layout.curatedDir)
      }
      toCurate.foreach(writeMarker)

      // Archive clean files (S8); a failed move downgrades that file only.
      val (archived, moveFailed) =
        Archiver.archive(spark, cleanFiles, layout.rawDir, layout.processedDir)
      val outcomes =
        archived.map(_ -> Ledger.Succeeded).toMap ++
        quarFiles.map(_ -> Ledger.Quarantined).toMap ++
        moveFailed.map { case (f, _) => f -> Ledger.Failed }.toMap
      val errors =
        quarFiles.map(f => f -> s"${disp(f)} corrupt/unpartitionable record(s)").toMap ++
        moveFailed.map { case (f, m) => f -> s"archive failed: $m" }.toMap
      ledger.markOutcome(outcomes, runId, errors)
      archived.foreach(clearMarker) // SUCCEEDED files are never re-selected
    } finally raw.unpersist(): Unit
  }

  private def markerPath(file: String): java.nio.file.Path = {
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(file.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    java.nio.file.Paths.get(s"${layout.root}/curated-markers/$digest")
  }
  private def markerExists(file: String): Boolean =
    java.nio.file.Files.exists(markerPath(file))
  private def writeMarker(file: String): Unit = {
    val p = markerPath(file)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, file.getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
  }
  private def clearMarker(file: String): Unit =
    java.nio.file.Files.deleteIfExists(markerPath(file)): Unit

  /** T1: the 15-minute scheduler trigger (sudo_code.txt:104-109), folded
    * into a drain loop. Returns the number of ticks that did work. */
  def runUntilDrained(maxTicks: Int = 1000): Int = {
    var ticks = 0
    while (ticks < maxTicks && runOnce()) ticks += 1
    ticks
  }
}

object Contracts {
  /** Source contract for the events-shaped raw JSON (FIXTURES.md §A):
    * the declared skeleton the RawJsonReader merges inference into.
    * Matches the record structure named in the reference
    * (psuedo_code.txt:273-296). */
  val events: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("event_timestamp", StringType),
    StructField("MODE", StringType),
    StructField("metadata", StructType(Seq(
      StructField("app_version", StringType),
      StructField("user_agent", StringType),
      StructField("user_id", LongType)))),
    StructField("payload", StructType(Seq(
      StructField("transaction_id", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType))))))
}
