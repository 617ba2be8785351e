package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{StringType, StructType}
import graft.ingest._
import graft.pipeline.{DedupStage, LakeLayout, QualityGate}

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
  * Delivery semantics: `foreachBatch` is AT-LEAST-ONCE across crashes —
  * a batch that wrote output but died before the checkpoint commit is
  * replayed on restart. Every sink write here is therefore made
  * IDEMPOTENT per micro-batch, which upgrades the end-to-end result to
  * exactly-once: the DLQ write is batch-id-keyed and overwritten on
  * replay, and the curated append goes through a batch-id-keyed staging
  * dir whose publish step (a) first sweeps any `b<id>-`-prefixed files a
  * crashed attempt already published into the touched partitions, then
  * (b) moves the staged files in, then (c) records a commit marker that
  * short-circuits any later replay. The sweep relies on micro-batch
  * determinism (same checkpointed input files → same partitions touched),
  * which is Structured Streaming's own replay contract. Verified by the
  * kill-between-publish-and-commit test in StreamingSpec.
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
    *
    * Optional `dedup`: the SAME near-dup gate the ledger runner wires in
    * ([[graft.pipeline.DedupStage]]) — each micro-batch is probed
    * against the lake's signature index (and against itself), flagged
    * rows divert to the batch-id-keyed dedup DLQ, survivors publish,
    * and their signatures are appended through the replay-idempotent
    * staged path ([[DedupStage.appendSurvivorsStaged]]) before the
    * commit marker — so a crashed batch's replay converges to exactly
    * one copy of everything: curated rows (prefix sweep), DLQ rows
    * (overwrite), and index rows (prefix sweep).
    *
    * Optional `quality`: the SAME ingest-time quality gate as the
    * ledger runner ([[graft.pipeline.QualityGate]]), run BEFORE the
    * dedup probe — under-threshold rows divert to the batch-id-keyed
    * quality DLQ (overwritten on replay) and never enter the index.
    */
  def runAvailableNow(spark: SparkSession, layout: LakeLayout, contract: StructType,
                      maxFilesPerTrigger: Option[Int] = None,
                      dedup: Option[DedupStage] = None,
                      quality: Option[QualityGate] = None,
                      lakeCompaction: Option[graft.ingest.Compactor.TickConfig] = None,
                      bloomCols: Seq[String] = Seq.empty
                     ): Unit = {
    // fail fast on a bad bloom config before the stream starts — same
    // rule and rationale as BatchProcessor's construction-time check
    // (a typo'd name silently published no filters; a present column
    // of an unsupported type crashed every micro-batch)
    if (bloomCols.nonEmpty) {
      val probe = Transformer.curate(
        spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          StructType(contract.fields.filterNot(_.name == CorruptCol))))
        .withColumn("source_file", lit("").cast("string"))
      val tracked = FileBounds.boundsColumns(probe.schema)
      val bad = bloomCols.filterNot(tracked.contains)
      require(bad.isEmpty,
        s"bloomCols must name bounds-tracked curated columns " +
          s"(tracked: ${tracked.sorted.mkString(", ")}); invalid: ${bad.mkString(", ")}")
    }
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
        // the ingest's bloom set IS the lake's (BatchProcessor has the
        // same rule): maintenance swaps must republish what the
        // per-batch publish does
        val cfg = if (bloomCols.isEmpty) lakeCompaction
          else lakeCompaction.map(_.copy(bloomCols = bloomCols))
        processMicroBatch(spark, batch.persist(), layout, s"stream-$batchId",
          dedup, quality, cfg, bloomCols)
        batch.unpersist()
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** One micro-batch through the shared ingest stages — the §3.1 body
    * minus ledger bookkeeping (the checkpoint owns file-level
    * exactly-once here; the staged publish below owns row-level
    * exactly-once across mid-batch crashes). */
  private def processMicroBatch(spark: SparkSession, raw: DataFrame,
                                layout: LakeLayout, runId: String,
                                dedup: Option[DedupStage],
                                quality: Option[QualityGate],
                                lakeCompaction: Option[graft.ingest.Compactor.TickConfig],
                                bloomCols: Seq[String] = Seq.empty
                               ): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(layout.root).toUri,
      spark.sparkContext.hadoopConfiguration)
    val commitMarker = new org.apache.hadoop.fs.Path(
      s"${layout.root}/stream-commits/$runId")
    if (fs.exists(commitMarker)) return // replay of a fully published batch
    // partition dirs this batch's publish touches — the post-marker
    // lake-compaction slot's O(touched) candidate set
    val touched = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.hadoop.fs.Path]

    val quarFiles = Segregator.fileDispositions(raw, "event_timestamp", "MODE")
      .filter(col("n_corrupt") + col("n_datebad") > 0)
      .select(SourceCol)
    val dlq = Segregator.dlqRecords(raw, "event_timestamp", "MODE", quarFiles)
    if (!dlq.isEmpty) DlqWriter.write(dlq, layout.dlqDir, runId, mode = "overwrite")
    val good = Segregator.goodRecords(raw, "event_timestamp", "MODE")
      .join(broadcast(quarFiles), Seq(SourceCol), "left_anti")
    if (!good.isEmpty) {
      val curated0 = Transformer.curate(good).withColumnRenamed(SourceCol, "source_file")
      // quality gate FIRST (the ledger runner's ordering): garbage rows
      // divert to the batch-id-keyed quality DLQ with their score —
      // replay overwrites, micro-batch determinism makes re-flags
      // identical — and never reach the dedup probe or the index
      val curated = quality match {
        case Some(g) =>
          val (survivors, qFlagged) = g.partition(curated0)
          val f = qFlagged.persist()
          if (!f.isEmpty)
            DlqWriter.write(f, layout.qualityDlqDir, runId, mode = "overwrite")
          f.unpersist()
          survivors
        case None => curated0
      }
      // near-dup gate (the ledger runner's stage, streaming-shaped):
      // flagged rows divert to the batch-id-keyed dedup DLQ — replay
      // overwrites, micro-batch determinism makes the re-flags identical
      val (published, flagged) = dedup match {
        case Some(cfg) =>
          // the scrub audit column is ledger-runner bookkeeping — this
          // runner has no per-file ledger slot, so just drop it
          val (sv, fl) = cfg.partition(spark, curated)
          (sv.drop(cfg.ScrubAuditCol), fl)
        case None => (curated, None)
      }
      val pub = published.persist() // publish + index append both read it
      flagged.filter(!_.isEmpty).foreach(f =>
        DlqWriter.write(f, layout.dedupDlqDir, runId, mode = "overwrite"))
      // batch-id-keyed staging: a replay OVERWRITES the whole staging dir
      // (so partial staging is self-healing), and the deterministic
      // `b<id>-` prefix lets publish replace a crashed attempt's partial
      // output instead of adding to it
      val stage = new org.apache.hadoop.fs.Path(s"${layout.root}/stream-staging/$runId")
      fs.delete(stage, true)
      pub.repartition(CuratedWriter.PartitionCols.map(col): _*)
        .write.mode("overwrite")
        .options(CuratedWriter.bloomOptions(pub, bloomCols))
        .partitionBy(CuratedWriter.PartitionCols: _*)
        .parquet(stage.toString)
      // per-data-file zone statistics, computed from the staged files
      // BEFORE publish consumes them, keyed by their published names
      // (the deterministic b<id>- prefix); batch-id-keyed overwrite like
      // the DLQs/partials, so a replay converges to one copy. Guard: a
      // fully-gated batch stages zero data files — nothing to bound.
      if (Staging.countDataFiles(fs, stage) > 0)
      graft.ingest.FileBounds.writeStaged(
        spark.read.parquet(stage.toString)
          .withColumn("year", col("year").cast("int"))
          .withColumn("month", col("month").cast("int"))
          .withColumn("day", col("day").cast("int"))
          .withColumn("mode", col("mode").cast("string")),
        s"b$runId-", s"${layout.fileBoundsDir}/b$runId",
        bloomCols.filter(pub.columns.contains))
      val (_, touchedDirs) = Staging.publishTracked(fs, stage,
        new org.apache.hadoop.fs.Path(layout.curatedDir),
        prefix = s"b$runId-", replaceExistingPrefix = true)
      touched ++= touchedDirs
      fs.delete(stage, true)
      // rollup partials, batch-id-keyed like the DLQs: a replay rewrites
      // the same dir with identical content (micro-batch determinism),
      // so after any crash/replay sequence exactly one copy remains;
      // ordering before the commit marker means a committed batch is
      // always counted
      graft.ingest.Rollup.writePartials(pub, s"${layout.rollupDir}/b$runId")
      // survivors' signatures enter the index through the staged,
      // prefix-swept path, so a crash ANYWHERE in this method replays
      // to exactly one copy of the batch's index rows; ordering before
      // the commit marker means a committed batch is always indexed
      dedup.foreach(cfg => cfg.appendSurvivorsStaged(spark, pub, runId))
      pub.unpersist(): Unit
    }
    // commit marker LAST: a crash anywhere above replays the whole batch
    // idempotently; after the marker, replays are no-ops
    fs.mkdirs(commitMarker.getParent)
    val out = fs.create(commitMarker, true)
    out.close()
    // Index maintenance strictly AFTER the marker: compaction renames
    // away the b<token>-/f<token>- prefixes a replayed appendStaged
    // would sweep on, so it must only run once this batch can no longer
    // replay (the marker short-circuits it). Crash mid-compaction
    // self-heals via the two-rename swap on the next batch's call.
    // Rollup folding is marker-safe for the same reason: a replayed
    // batch would overwrite its b<id> dir, so fold only after the
    // marker guarantees no replay — and its crash mode is absorbable
    // twins, not gaps.
    dedup.foreach(_.maintain(spark): Unit)
    graft.ingest.Rollup.compact(spark, layout.rollupDir): Unit
    graft.ingest.FileBounds.compact(spark, layout.fileBoundsDir): Unit
    // Lake small-file maintenance, also strictly AFTER the marker: the
    // rewrite renames away the b<runId>- prefixes a replayed publish
    // would sweep on (replaceExistingPrefix), so it must only run once
    // this batch can no longer replay. Scoped to the partitions this
    // batch touched — O(touched), never an O(lake) walk.
    lakeCompaction.foreach { cfg =>
      val report = graft.ingest.Compactor
        .maintainTouched(spark, layout.curatedDir, touched.toSeq, cfg)
      // audit surface for Alarms.compaction_recovery (event-only;
      // run-id-named so a replayed batch overwrites, never duplicates)
      graft.ingest.Compactor.logReport(fs,
        new org.apache.hadoop.fs.Path(s"${layout.root}/maintenance/compaction"),
        runId, report)
    }
  }
}
