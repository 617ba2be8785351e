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
  val dedupDlqDir = s"$root/dedup-dlq"
  val qualityDlqDir = s"$root/quality-dlq"
  val ledgerDir = s"$root/ledger"
  val rollupDir = s"$root/rollup"
  val fileBoundsDir = s"$root/filebounds"
  val predStatsDir = s"$root/predstats"
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
  *    archive does not re-append its rows — and the batch's curated
  *    output is STAGED and atomically committed (rename to `.ready`)
  *    before any of it is published, so there is no crash window between
  *    the append and the marker write: a batch either never published
  *    (staging discarded, full retry) or is completed by the
  *    [[recoverStaging]] sweep at the next tick (publish resumed, markers
  *    written, no duplicate rows). Exactly-once without a table format;
  *  - per-file dispositions come from ONE aggregate (file-level collect
  *    bounded by batch size), not `distinct().collect()` per branch —
  *    and the raw frame is persisted across its four uses (pitfall P1);
  *  - a job-level failure marks the batch FAILED for re-pickup (T3); rows
  *    out of retry budget finalize QUARANTINED.
  *
  * T1/T2: [[runUntilDrained]] is the scheduler loop — re-run until the
  * ledger has no selectable work, then exit gracefully.
  *
  * Optional [[DedupStage]]: near-dup rows (vs the lake's MinHash
  * signature index) divert to `dedup-dlq/` instead of the curated lake,
  * the file's ledger row carries a suppression note, and survivors'
  * signatures are appended to the index after the publish commit point
  * — the q83 append-on-commit lifecycle running inside the tick.
  *
  * Optional [[QualityGate]]: runs BEFORE the dedup stage (garbage never
  * pays shingling, never enters the index) — under-threshold rows
  * divert to `quality-dlq/` with their exact score, and the file's
  * ledger row carries a `quality:` note alongside any dedup/scrub note.
  */
final class BatchProcessor(
    spark: SparkSession,
    layout: LakeLayout,
    contract: StructType,
    batchSize: Int = 10000,
    maxRetries: Int = 3,
    ledgerFactory: (SparkSession, String, Int) => Ledger = Ledger(_, _, _),
    dedup: Option[DedupStage] = None,
    quality: Option[QualityGate] = None,
    lakeCompaction: Option[Compactor.TickConfig] = None,
    bloomCols: Seq[String] = Seq.empty) {

  // Fail fast on a bad bloom config (round 20, r19 ADVICE): the
  // per-batch `filter(columns.contains)` guard at the publish sites
  // exists for genuinely drifted batches that LACK a column, but it
  // also silently swallowed a typo'd name — no filters ever published,
  // point lookups quietly stopped pruning — while a present column of
  // an unsupported type sailed past it and crashed every tick inside
  // FileBounds.compute. Validate once, against the contract's curated
  // shape (Transformer.curate is schema-deterministic, so an empty
  // frame yields the exact column/type surface every batch publishes).
  if (bloomCols.nonEmpty) {
    val probe = Transformer.curate(
      spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        StructType(contract.fields.filterNot(_.name == RawJsonReader.CorruptCol))))
      .withColumn("source_file", org.apache.spark.sql.functions.lit("").cast("string"))
    val tracked = FileBounds.boundsColumns(probe.schema)
    val bad = bloomCols.filterNot(tracked.contains)
    require(bad.isEmpty,
      s"bloomCols must name bounds-tracked curated columns " +
        s"(tracked: ${tracked.sorted.mkString(", ")}); invalid: ${bad.mkString(", ")}")
  }

  val ledger: Ledger = ledgerFactory(spark, layout.ledgerDir, maxRetries)
  private var runCounter = 0
  // per-instance token: run-%05d counters restart at run-00001 on every
  // pipeline restart, so anything FILED by runId (the compaction audit
  // reports) must carry this to stay unique across incarnations
  private val instanceToken = java.util.UUID.randomUUID().toString.take(8)
  // partition dirs this tick's publishes moved files into — the
  // candidate set for the maintenance slot's O(touched) compaction
  private val touchedPartitions =
    scala.collection.mutable.LinkedHashSet.empty[String]
  private val stagingRoot = new org.apache.hadoop.fs.Path(s"${layout.root}/curated-staging")
  private val fs = org.apache.hadoop.fs.FileSystem.get(
    new org.apache.hadoop.fs.Path(layout.root).toUri, spark.sparkContext.hadoopConfiguration)

  import RawJsonReader.SourceCol

  /** One scheduled tick. Returns false iff there was no work (T2). */
  def runOnce(): Boolean = {
    runCounter += 1
    val runId = f"run-$runCounter%05d"
    recoverStaging() // complete or discard what a crashed tick left behind
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
    // Index maintenance AFTER the tick's terminal ledger writes: compact
    // any dedup-index store whose per-tick append files have outgrown
    // the stage's threshold (DedupStage.maintain — crash-safe, and this
    // tick is the index's single writer), and fold accumulated rollup
    // batch dirs (crash leaves only absorbable twins, never a gap).
    dedup.foreach(_.maintain(spark): Unit)
    Rollup.compact(spark, layout.rollupDir): Unit
    FileBounds.compact(spark, layout.fileBoundsDir): Unit
    // the layout advisor's workload history folds in the same slot: a
    // long-lived monitor publishing per-interval batches stays bounded
    // without its own maintenance schedule (sums fold, answers unchanged)
    graft.monitor.PredicateStats.compact(spark, layout.root): Unit
    // Lake small-file maintenance, scoped to the partitions this tick's
    // publishes touched — O(touched), never an O(lake) walk. Runs under
    // the tick's single-writer ownership of the lake; a crash mid-swap
    // is healed from the swap journal before the next tick's pass.
    lakeCompaction.foreach { cfg0 =>
      // the ingest's bloom set IS the lake's: the swap rewrite must
      // republish the same filters the per-batch publish does, or
      // compaction would silently strip point-lookup pruning from
      // exactly the files that dominate a mature lake
      val cfg = if (bloomCols.nonEmpty) cfg0.copy(bloomCols = bloomCols) else cfg0
      val touched = touchedPartitions.toSeq.map(new org.apache.hadoop.fs.Path(_))
      val report = Compactor.maintainTouched(spark, layout.curatedDir, touched, cfg)
      // candidate set is consumed only once maintenance RETURNED — a
      // transient maintainTouched failure leaves the touched leaves in
      // the set for the next tick instead of stranding them fragmented
      touchedPartitions.clear()
      // audit surface for Alarms.compaction_recovery (event-only); the
      // instance token keeps a restarted pipeline's run-00001 report
      // from overwriting an earlier incarnation's healed-swap audit row
      Compactor.logReport(fs,
        new org.apache.hadoop.fs.Path(s"${layout.root}/maintenance/compaction"),
        s"$runId-$instanceToken", report)
    }
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
      // already reached the lake on a previous attempt (staged batch
      // committed, then archive failed or the writer crashed before
      // SUCCEEDED) has a curated MARKER and is excluded from the append —
      // re-processing it must not duplicate its rows. The batch's output
      // is staged and committed with one atomic rename before publishing
      // (see stagePublish), so no crash point can both publish rows and
      // lose the marker: recoverStaging finishes the job next tick.
      val toCurate = cleanFiles.filterNot(markerExists)
      val curateEnc = {
        val toCurateSet = toCurate.toSet
        dispRows.collect {
          case (enc, 0L) if toCurateSet(PathNorm.fromString(enc)) => enc
        }
      }
      val curated =
        if (curateEnc.isEmpty) None
        else {
          import spark.implicits._
          val good = Segregator.goodRecords(raw, "event_timestamp", "MODE")
            .join(broadcast(curateEnc.toSeq.toDF(SourceCol)), Seq(SourceCol), "left_semi")
          Some(Transformer.curate(good).withColumnRenamed(SourceCol, "source_file"))
        }

      // Optional quality gate (X6 as an ingest stage), FIRST: one
      // codegen scan scores every curated row; under-threshold rows
      // divert to the quality DLQ with their score, and only the
      // gate's survivors reach the (more expensive) dedup stage below.
      val (gated, qualityNotes) = (curated, quality) match {
        case (Some(df), Some(g)) =>
          val (survivors, flagged0) = g.partition(df)
          val flagged = flagged0.persist()
          // the per-file note collect doubles as the emptiness check —
          // no dedicated isEmpty scan for the common no-garbage tick
          val notes = flagged.groupBy("source_file").count().collect()
            .map(r => PathNorm.fromString(r.getString(0)) ->
              s"quality: ${r.getLong(1)} row(s) suppressed").toMap
          if (notes.nonEmpty) DlqWriter.write(flagged, layout.qualityDlqDir, runId)
          flagged.unpersist()
          (Some(survivors), notes)
        case _ => (curated, Map.empty[String, String])
      }

      // Optional near-dup gate (X2 as an ingest stage): probe the batch
      // against the lake's MinHash signature index, divert flagged rows
      // to the dedup DLQ (with the matched doc + Jaccard), note the
      // suppression on the file's ledger row, and publish survivors
      // only. The survivors frame is persisted because it feeds two
      // sinks: the staged publish and the post-commit index append.
      val (published, dedupNotes) = (gated, dedup) match {
        case (Some(df), Some(cfg)) =>
          // Span-scrub accounting (when the stage scrubs): count rows
          // whose text lost already-in-corpus spans, per source file,
          // then DROP the audit column so it never reaches the lake.
          def splitScrubNotes(survivors: DataFrame): (DataFrame, Map[String, String]) =
            if (!survivors.columns.contains(cfg.ScrubAuditCol)) (survivors, Map.empty)
            else {
              val p = survivors.persist()
              val notes = p.filter(col(cfg.ScrubAuditCol) > 0)
                .groupBy("source_file").count().collect()
                .map(r => PathNorm.fromString(r.getString(0)) ->
                  s"spans scrubbed: ${r.getLong(1)} row(s)").toMap
              val out = p.drop(cfg.ScrubAuditCol)
              p.unpersist() // the caller persists the dropped frame
              (out, notes)
            }
          cfg.partition(spark, df) match {
            case (survivors0, Some(flagged0)) =>
              val flagged = flagged0.persist()
              val notes =
                if (flagged.isEmpty) Map.empty[String, String]
                else {
                  DlqWriter.write(flagged, layout.dedupDlqDir, runId)
                  flagged.groupBy("source_file").count().collect()
                    .map(r => PathNorm.fromString(r.getString(0)) ->
                      s"near-dup: ${r.getLong(1)} row(s) suppressed").toMap
                }
              flagged.unpersist()
              val (survivors, scrubNotes) = splitScrubNotes(survivors0)
              // one ledger slot per file: a file with BOTH suppressions
              // and scrubs carries both notes, "; "-joined (suppression
              // first)
              val merged = (notes.keySet ++ scrubNotes.keySet).map { f =>
                f -> Seq(notes.get(f), scrubNotes.get(f)).flatten.mkString("; ")
              }.toMap
              (Some(survivors.persist()), merged)
            case (survivors0, None) => // nothing flagged this tick
              val (survivors, scrubNotes) = splitScrubNotes(survivors0)
              (Some(survivors.persist()), scrubNotes)
          }
        case _ => (gated, Map.empty[String, String])
      }
      stagePublish(published, toCurate, runId)
      // Append-on-commit, strictly AFTER the publish commit point: a
      // crash between publish and append under-indexes (safe direction —
      // see DedupStage scaladoc) and can never double-append, because a
      // replayed file is marker-excluded from curation.
      if (dedup.isDefined) {
        for (cfg <- dedup; df <- published) cfg.appendSurvivors(spark, df)
        published.foreach(_.unpersist())
      }

      // Archive clean files (S8); a failed move downgrades that file only.
      val (archived, moveFailed) =
        Archiver.archive(spark, cleanFiles, layout.rawDir, layout.processedDir)
      val outcomes =
        archived.map(_ -> Ledger.Succeeded).toMap ++
        quarFiles.map(_ -> Ledger.Quarantined).toMap ++
        moveFailed.map { case (f, _) => f -> Ledger.Failed }.toMap
      // informational notes merge "; "-joined (quality first — it runs
      // first); real failure messages still win the slot outright
      val infoNotes = (qualityNotes.keySet ++ dedupNotes.keySet).map { f =>
        f -> Seq(qualityNotes.get(f), dedupNotes.get(f)).flatten.mkString("; ")
      }.toMap
      val errors = infoNotes ++
        quarFiles.map(f => f -> s"${disp(f)} corrupt/unpartitionable record(s)").toMap ++
        moveFailed.map { case (f, m) => f -> s"archive failed: $m" }.toMap
      ledger.markOutcome(outcomes, runId, errors)
      archived.foreach(clearMarker) // SUCCEEDED files are never re-selected
    } finally raw.unpersist(): Unit
  }

  // ---- staged atomic publish -----------------------------------------
  //
  // Protocol (two-rename discipline, same as the Compactor's):
  //   1. write the batch's curated rows to curated-staging/<token>
  //   2. write a _manifest of the ledger keys the batch covers
  //   3. rename <token> -> <token>.ready          <- THE commit point
  //   4. move each staged data file into the live lake (resumable:
  //      rename consumes the source, a re-run moves only what remains)
  //   5. write the per-file curated markers (the replay guard)
  //   6. delete the .ready dir
  // A crash before (3) leaves an uncommitted dir that recoverStaging
  // discards — the batch retries from scratch, nothing was published. A
  // crash at/after (3) — including a failed marker write — leaves a
  // .ready dir that recoverStaging COMPLETES (4-6 are all idempotent)
  // before the next batch selection, so the marker guard is in place
  // before the file can be re-processed. No ordering of crashes can
  // duplicate curated rows.

  private def stagePublish(curated: Option[DataFrame], files: Seq[String],
                           runId: String): Unit = {
    if (files.isEmpty) return
    val token = s"$runId-${java.util.UUID.randomUUID().toString.take(8)}"
    val stage = new org.apache.hadoop.fs.Path(stagingRoot, token)
    curated.foreach(df =>
      CuratedWriter.append(df, stage.toString, bloomCols = bloomCols))
    // Rollup partials ride the SAME atomic commit as the rows they
    // summarize (written pre-commit, published by publishReady) — a
    // post-commit append would under-count forever after a crash,
    // because the curated markers exclude the files from re-curation.
    // Computed from the staged parquet (partition dirs restore the
    // y/m/d/mode columns), not the curated frame, so the batch's
    // upstream plan is not executed a second time. Partition-value type
    // INFERENCE on the staged read can disagree with the curated
    // contract (a numeric-looking MODE would infer int where the
    // streaming runner writes string), so the columns are pinned to the
    // contract types before the partials are published — the shared
    // rollup store must stay single-typed across both runners.
    if (curated.isDefined && Staging.countDataFiles(fs, stage) > 0) {
      val stagedDf = spark.read.parquet(stage.toString)
        .withColumn("year", col("year").cast("int"))
        .withColumn("month", col("month").cast("int"))
        .withColumn("day", col("day").cast("int"))
        .withColumn("mode", col("mode").cast("string"))
      Rollup.writePartials(stagedDf,
        new org.apache.hadoop.fs.Path(stage, "_rollup").toString)
      // per-data-file zone statistics, keyed by the FINAL published
      // names (publishReady's prefix is the token, known here) — same
      // atomic commit as the rows and the partials (FileBounds scaladoc)
      FileBounds.writeStaged(stagedDf, s"$token-",
        new org.apache.hadoop.fs.Path(stage, "_filebounds").toString,
        bloomCols.filter(stagedDf.columns.contains))
    }
    writeManifest(stage, files)
    val ready = new org.apache.hadoop.fs.Path(stagingRoot, s"$token.ready")
    if (!fs.rename(stage, ready))
      throw new java.io.IOException(s"staging commit failed: $stage")
    publishReady(ready)
  }

  private def writeManifest(stage: org.apache.hadoop.fs.Path, files: Seq[String]): Unit = {
    fs.mkdirs(stage)
    val out = fs.create(new org.apache.hadoop.fs.Path(stage, "_manifest"), true)
    try out.write(files.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readManifest(ready: org.apache.hadoop.fs.Path): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(ready, "_manifest")
    if (!fs.exists(p)) return Seq.empty
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().filter(_.nonEmpty).toVector
    finally in.close()
  }

  private def publishReady(ready: org.apache.hadoop.fs.Path): Unit = {
    val prefix = ready.getName.stripSuffix(".ready") + "-"
    val (_, touched) = Staging.publishTracked(
      fs, ready, new org.apache.hadoop.fs.Path(layout.curatedDir), prefix)
    if (lakeCompaction.isDefined) touchedPartitions ++= touched.map(_.toString)
    // rollup partials + file bounds: one dir rename each per batch,
    // idempotent on resume (source consumed by the rename; a re-run
    // finds it gone and skips)
    for ((stagedName, destRoot) <- Seq(
        "_rollup" -> layout.rollupDir, "_filebounds" -> layout.fileBoundsDir)) {
      val staged = new org.apache.hadoop.fs.Path(ready, stagedName)
      if (fs.exists(staged)) {
        val dest = new org.apache.hadoop.fs.Path(destRoot,
          ready.getName.stripSuffix(".ready"))
        fs.mkdirs(dest.getParent)
        if (fs.exists(dest)) fs.delete(staged, true)
        else if (!fs.rename(staged, dest))
          throw new java.io.IOException(s"sidecar publish failed: $staged -> $dest")
      }
    }
    // markers AFTER the rows are live: a marker must never exist for rows
    // that aren't in the lake (that ordering could lose data; this one
    // can only retrigger an idempotent publish)
    readManifest(ready).foreach(writeMarker)
    fs.delete(ready, true): Unit
  }

  /** Complete committed-but-unpublished batches; discard uncommitted
    * staging leftovers. Runs before every batch selection. */
  def recoverStaging(): Unit = {
    if (!fs.exists(stagingRoot)) return
    fs.listStatus(stagingRoot).foreach { st =>
      if (st.getPath.getName.endsWith(".ready")) publishReady(st.getPath)
      else fs.delete(st.getPath, true): Unit
    }
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

  /** [[events]] with extra DECLARED payload fields. The batch runner
    * infers undeclared payload columns per tick (two-pass inference, so
    * a base64 `img`/`wav`/`avi` appears when the tick's files carry
    * one), but the STREAMING twin runs on a static schema — Structured
    * Streaming cannot re-infer per micro-batch — so a multimodal stream
    * must DECLARE its payload columns for the fingerprint gates to see
    * them. StreamingSpec's video-gate test is the executable form of
    * this posture. */
  def eventsWithPayload(extra: (String, DataType)*): StructType = {
    val pIdx = events.fieldIndex("payload")
    val p = events(pIdx).dataType.asInstanceOf[StructType]
    val p2 = extra.foldLeft(p)((acc, f) => acc.add(f._1, f._2))
    StructType(events.updated(pIdx, events(pIdx).copy(dataType = p2)))
  }
}
