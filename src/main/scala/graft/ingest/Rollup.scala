package graft.ingest

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained partition statistics for the curated lake —
  * the "daily stats without a 100 TB rescan" operator. Consumers ask
  * "how many rows / how much value / how many distinct users landed per
  * (year, month, day, mode)?" constantly (monitoring, billing, recipe
  * sizing); recomputing that from the lake scans everything, so the
  * ingest runners fold the answer forward instead: every published
  * batch also publishes its PARTIAL aggregate, and the reader merges
  * partials — cost proportional to the metadata (one row per file ×
  * partition, the same order as the ledger itself), never the data.
  *
  * Partial granularity is (source_file, year, month, day, mode), one
  * row per combination, because the FILE is this pipeline's unit of
  * exactly-once (all-or-nothing quarantine, curated markers): whatever
  * path a file's rows took into the lake, its partial rows are a pure
  * function of the file, so the reader can collapse accidental twins
  * (a replayed publish, a crashed compaction) by keying on the file —
  * [[stats]] is correct under every duplication the runners can
  * produce, without coordination.
  *
  * Exactly-once posture per runner:
  *  - ledger runner: partials are written INTO the batch's staging dir
  *    (`_rollup/`, invisible to [[Staging.publish]]'s data-file walk)
  *    BEFORE the atomic `.ready` commit, and moved into
  *    `rollup/<token>/` by the (idempotent, resumable) publish step —
  *    so a batch's partials are published iff its rows are, and a
  *    marker-excluded retry (whose curated frame no longer carries the
  *    already-published files) can never lose them;
  *  - streaming runner: partials land at `rollup/b<batchId>/` with
  *    overwrite semantics before the commit marker — a replay rewrites
  *    the same dir with identical content (micro-batch determinism,
  *    the DLQ posture).
  *
  * Mergeable aggregates only: counts and integer-exact value sums add,
  * min/max timestamps min/max, distinct users travel as HLL sketches
  * (register-wise max is associative + commutative, so the merged
  * sketch is BYTE-IDENTICAL in estimate to a whole-lake sketch —
  * asserted in RollupSpec), and per-user event counts travel as
  * frequent-items sketches (`approx_top_k_accumulate`/`_combine` —
  * DataSketches ItemsSketch, whose merge is associative), so "who are
  * this month's heavy hitters" is also a metadata fold (q117). The
  * frequency sketch is EXACT while the distinct-user count stays under
  * ~¾ of [[TopKCapacity]] — true at every demo scale, asserted by
  * q117's oracle — and degrades to guaranteed-error-bounded estimates
  * beyond it (the HLL ±tol posture). Nothing in a partial needs
  * revisiting once written.
  *
  * [[compact]] (maintenance-slot, single-writer per lake like the
  * index compactions) bounds the batch-dir count: merged output renames
  * IN before sources delete, so a crash only ever leaves duplicates —
  * which the per-file read-side collapse absorbs — never a gap.
  */
object Rollup {
  /** Frequent-items sketch capacity (`maxItemsTracked`). Per-user counts
    * fold EXACTLY while the merged distinct-user count stays under
    * ~0.75×this; beyond it the sketch guarantees bounded-error
    * estimates. Sized for the demo/bench scales (≤1,500 distinct users
    * per month) with ~2.7× headroom; a production lake tracking more
    * users gets the documented approximate regime, like the HLL reach. */
  val TopKCapacity = 4096

  /** The STORED form of the frequency sketch is the bare serialized
    * BINARY — not the engine's 4-field sketch struct — for the same
    * reason `users_hll` is stored as bytes: a bare binary keeps every
    * fold stage hash-aggregable and shuffle rows minimal, while the
    * struct's other three fields are derivable repo constants
    * ([[TopKCapacity]] and the bigint item type). [[topKStructSql]]
    * rebuilds the engine struct transiently at each fold site. */
  private def topKStructSql(c: String): String =
    s"struct($c AS sketch, CAST($TopKCapacity AS INT) AS maxItemsTracked, " +
      "CAST(NULL AS BIGINT) AS itemDataType, " +
      "'item BIGINT NOT NULL' AS itemDataTypeDDL)"

  /** Merge a BINARY sketch column into one combined sketch, as BINARY.
    * The FILTER guards nulls: `approx_top_k_combine` neither skips null
    * inputs nor serializes a buffer that received zero inputs. */
  def topKCombine(c: String): org.apache.spark.sql.Column =
    expr(s"approx_top_k_combine(${topKStructSql(c)}) " +
      s"FILTER (WHERE $c IS NOT NULL)").getField("sketch")

  /** (item, count) rows of a combined BINARY sketch column — exact
    * below capacity, bounded-error beyond (scaladoc above). */
  def topKEstimate(c: String): org.apache.spark.sql.Column =
    expr(s"approx_top_k_estimate(${topKStructSql(c)}, $TopKCapacity)")

  /** A VALID empty frequency sketch's bytes, as a literal column.
    * Pre-sketch partials are backfilled with this rather than null so
    * no fold group can end up with zero combine inputs — an empty
    * sketch merges as a no-op. The bytes come from running an empty
    * accumulate once per JVM (never hand-pinned: they belong to the
    * DataSketches wire format, which the engine version owns). */
  @volatile private var emptyTopKBytes: Array[Byte] = _
  private def emptyTopK(s: SparkSession): org.apache.spark.sql.Column = {
    if (emptyTopKBytes == null)
      emptyTopKBytes = s.sql(
        s"""SELECT approx_top_k_accumulate(u, $TopKCapacity)
           |FROM (SELECT CAST(id AS BIGINT) AS u FROM range(0))""".stripMargin)
        .collect()(0).getStruct(0).getAs[Array[Byte]]("sketch")
    lit(emptyTopKBytes)
  }

  /** Read + generation-normalize a set of partial paths. Fast path: one
    * mergeSchema read over everything. A store that MIXES top_users
    * generations across batch dirs (struct-generation dirs beside
    * bare-BINARY dirs) cannot parquet-merge at all — struct vs binary is
    * an incompatible merge, a hard read error — so on failure the read
    * falls back to per-top-level-dir reads, normalizes EACH dir to the
    * bare-BINARY form, and unions by name: graceful degradation instead
    * of requiring a compaction run after the generation upgrade. The
    * fallback costs one schema inference per batch dir — bounded by
    * [[compact]]'s `maxBatchDirs`, metadata-sized. */
  private def readNormalized(s: SparkSession, paths: Seq[String],
                             ignoreMissing: Boolean): DataFrame = {
    def rd(ps: Seq[String]) = {
      def r0 = {
        var r = s.read
          .option("recursiveFileLookup", "true")
          .option("mergeSchema", "true")
        if (ignoreMissing) r = r.option("ignoreMissingFiles", "true")
        r
      }
      // schema memoized per listing state (SchemaMemo): the serve rule
      // constructs this read per candidate aggregate per optimizer
      // pass, and inference is a footer-merge JOB per construction. An
      // unmergeable store (mixed top_users generations) throws out of
      // the inference thunk uncached — the fallback below sees the
      // same error the plain read raised.
      r0.schema(SchemaMemo.mergedSchema(s, ps, r0.parquet(ps: _*).schema))
        .parquet(ps: _*)
    }
    try normalizeTopK(s, rd(paths))
    catch {
      case scala.util.control.NonFatal(e) =>
        val units = paths.flatMap { p =>
          val root = new Path(p)
          val fs = graft.engine.Fs.of(s.sparkContext.hadoopConfiguration, root)
          if (!fs.exists(root)) Seq.empty
          else if (fs.getFileStatus(root).isFile) Seq(p)
          else fs.listStatus(root).toSeq
            .filter(st => !st.getPath.getName.startsWith(".") &&
              !st.getPath.getName.startsWith("_"))
            .map(_.getPath.toString)
        }
        // the fallback exists for ONE failure mode — the struct-vs-
        // binary schema-merge incompatibility across generation dirs.
        // With no per-dir units to retry (every path absent/empty) the
        // original error was something else entirely; masking it behind
        // an empty .reduce crash would bury a genuine read failure.
        if (units.isEmpty) throw e
        units.map(u => normalizeTopK(s, rd(Seq(u))))
          .reduce(_.unionByName(_, allowMissingColumns = true))
    }
  }

  /** See the generation-tolerance note in [[filePartials]]. */
  private def normalizeTopK(s: SparkSession, raw: DataFrame): DataFrame =
    raw.schema.find(_.name == "top_users") match {
      case None => raw.withColumn("top_users", emptyTopK(s))
      case Some(f) if f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType] =>
        raw.withColumn("top_users",
          coalesce(col("top_users.sketch"), emptyTopK(s)))
      case _ =>
        raw.withColumn("top_users", coalesce(col("top_users"), emptyTopK(s)))
    }

  /** The lake's file-lineage column, synthesized per PHYSICAL file for
    * foreign lakes that never carried one — the key [[backfill]] and
    * [[reconcile]] collapse/count on must be the SAME on both sides. */
  private def lineageOf(lake: DataFrame): DataFrame =
    if (lake.columns.contains("source_file")) lake
    else lake.withColumn("source_file",
      regexp_extract(col("_metadata.file_path"), "[^/]+$", 0))

  /** Partition-stat partials of one published batch: one row per
    * (source_file, year, month, day, mode). `value_e6` is the
    * integer-exact scaled sum (the repo's e6 oracle convention);
    * `users_hll` an HLL sketch of `user_id`; `top_users` a
    * frequent-items sketch of per-user event counts. */
  def partials(curated: DataFrame): DataFrame =
    curated
      .groupBy(col("source_file"), col("year"), col("month"), col("day"), col("mode"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("value")).as("n_value"),
        sum(round(col("value") * lit(1000000)).cast("long")).as("value_e6"),
        min(col("event_time_utc")).as("min_ts"),
        max(col("event_time_utc")).as("max_ts"),
        hll_sketch_agg(col("user_id")).as("users_hll"),
        expr(s"approx_top_k_accumulate(user_id, $TopKCapacity).sketch").as("top_users"))

  /** Write one batch's partials under `dir` (one small file — the row
    * count is bounded by files-in-batch × partitions-per-file). */
  def writePartials(curated: DataFrame, dir: String): Unit =
    partials(curated).coalesce(1).write.mode("overwrite").parquet(dir)

  private[graft] def hasData(s: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    val fs = graft.engine.Fs.of(s.sparkContext.hadoopConfiguration, p)
    Staging.countDataFiles(fs, p) > 0
  }

  /** All partial rows currently published, collapsed to ONE row per
    * (source_file, year, month, day, mode) — the dedupe that makes
    * every duplication mode harmless (identical twins, so `first` of
    * each stat is exact). */
  private[graft] def filePartials(s: SparkSession, rollupDir: String): DataFrame = {
    // Readers run CONCURRENT with the pipeline (alarms, rewritten user
    // queries in other sessions) while [[compact]] deletes source batch
    // dirs after its merged rename — a listed file can vanish before
    // the scan reaches it. ignoreMissingFiles (scoped to this read, not
    // session-wide) turns that race into a skipped file; the rows it
    // carried are never lost because the merged dir duplicates them and
    // the per-file collapse below absorbs the duplication.
    // Generation tolerance, one expression per store vintage: absent
    // column (pre-sketch store) backfills a valid EMPTY sketch so the
    // fold sees only mergeable values; a struct-typed column (the
    // short-lived generation that stored the engine's 4-field sketch
    // struct) narrows to its bytes; the current form is the bare BINARY.
    // Mixed-generation stores that defeat one mergeSchema read fall
    // back to a per-dir normalize + union (readNormalized).
    val raw = readNormalized(s, Seq(rollupDir), ignoreMissing = true)
    raw.groupBy("source_file", "year", "month", "day", "mode")
      .agg(
        first("n_rows").as("n_rows"),
        first("n_value").as("n_value"),
        first("value_e6").as("value_e6"),
        first("min_ts").as("min_ts"),
        first("max_ts").as("max_ts"),
        first("users_hll").as("users_hll"),
        first("top_users").as("top_users"))
  }

  /** Merged per-partition statistics: (year, month, day, mode, n_files,
    * n_rows, n_value, value_e6, min_ts, max_ts, n_users_est). Cost is
    * one scan of the partial rows — metadata-sized at any lake size.
    * Empty/absent rollup dir → empty frame. */
  def stats(s: SparkSession, rollupDir: String): DataFrame = {
    if (!hasData(s, rollupDir))
      return s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "year INT, month INT, day INT, mode STRING, n_files BIGINT, " +
            "n_rows BIGINT, n_value BIGINT, value_e6 BIGINT, " +
            // users_hll/top_users BEFORE n_users_est — the computed
            // branch appends n_users_est last (withColumn), and
            // positional consumers (union-by-position) must see one
            // column order from both; NTZ timestamps match the curated
            // contract (Segregator)
            "min_ts TIMESTAMP_NTZ, max_ts TIMESTAMP_NTZ, users_hll BINARY, " +
            "top_users BINARY, " +
            "n_users_est BIGINT"))
    filePartials(s, rollupDir)
      .groupBy("year", "month", "day", "mode")
      .agg(
        count(lit(1)).as("n_files"),
        sum("n_rows").as("n_rows"),
        sum("n_value").as("n_value"),
        sum("value_e6").as("value_e6"),
        min("min_ts").as("min_ts"),
        max("max_ts").as("max_ts"),
        hll_union_agg(col("users_hll")).as("users_hll"),
        topKCombine("top_users").as("top_users"))
      // the merged sketches stay columns so consumers can fold FURTHER
      // (month/global reach, heavy hitters) without revisiting partials
      .withColumn("n_users_est",
        coalesce(hll_sketch_estimate(col("users_hll")), lit(0L)))
  }

  /** The auditor for the fold-forward chain — the query you run RARELY,
    * because it pays the one full lake scan the rollup exists to avoid,
    * to certify that the incremental statistics still equal reality.
    *
    * Both sides aggregate to (year, month, mode) plus one global row
    * (GROUPING SETS), then full-outer-join null-safely so a partition
    * present on only ONE side (a lost batch, a phantom partial)
    * surfaces as a mismatch row instead of silently dropping. The
    * rollup side folds the per-file partials directly: distinct files
    * via countDistinct(source_file) (per-day n_files cannot be summed
    * upward — one file spans many days), user reach via
    * `hll_union_agg` over the per-partial sketches — the "fold
    * further" path, month and global reach from the same sketches the
    * daily stats carry.
    *
    * Output carries the EXACT lake-side statistics plus match flags
    * (the q44 convention: engine-specific estimates never reach the
    * hash compare — `reach_ok` asserts the folded HLL estimate lands
    * within `reachTolPct` of the exact distinct count, integer
    * arithmetic only). Any flag at 0 means the fold-forward chain
    * diverged from the lake.
    *
    * Scale shape: the exact side is one scan + one shuffled aggregate
    * (what any direct query would pay); the rollup side is
    * metadata-sized; the join is aggregate×aggregate (bounded by
    * partition count), so reconciliation costs one lake scan — the
    * floor for an exactness audit. */
  def reconcile(s: SparkSession, curatedDir: String, rollupDir: String,
                reachTolPct: Int = 5): DataFrame = {
    val grain = Seq(col("year"), col("month"), col("mode"))
    val sets = Seq(grain, Seq.empty[org.apache.spark.sql.Column])

    // a lake with no partials at all (pre-rollup runners) must AUDIT as
    // divergent — every lake-side row flagged — not throw on the read
    val parts =
      if (hasData(s, rollupDir)) filePartials(s, rollupDir)
      else s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "source_file STRING, year INT, month INT, day INT, mode STRING, " +
            "n_rows BIGINT, n_value BIGINT, value_e6 BIGINT, " +
            "min_ts TIMESTAMP_NTZ, max_ts TIMESTAMP_NTZ, users_hll BINARY, " +
            "top_users BINARY"))

    val folded = parts
      .groupingSets(sets, grain: _*)
      .agg(
        sum("n_rows").as("r_rows"),
        sum("n_value").as("r_value"),
        sum("value_e6").as("r_value_e6"),
        countDistinct(col("source_file")).as("r_files"),
        coalesce(hll_sketch_estimate(hll_union_agg(col("users_hll"))), lit(0L))
          .as("r_users_est"))

    // snapshot read, not a plain directory scan: under the compactor's
    // deferred-deletion grace window a plain read would double-count
    // retired-but-present twins — the exact side must audit the lake's
    // LIVE rows (CuratedWriter.read resolves each leaf's swap-meta).
    // Lineage is synthesized for foreign lakes so a BACKFILLED store
    // audits against the same per-file key it was derived with.
    val exact = lineageOf(CuratedWriter.read(s, curatedDir))
      .groupingSets(sets, grain: _*)
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("value")).as("n_value"),
        sum(round(col("value") * lit(1000000)).cast("long")).as("value_e6"),
        countDistinct(col("source_file")).as("n_files"),
        countDistinct(col("user_id")).as("n_users"))

    val joined = exact.join(folded,
      exact("year") <=> folded("year") &&
        exact("month") <=> folded("month") &&
        exact("mode") <=> folded("mode"),
      "full_outer")

    def flag(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(c, lit(1)).otherwise(lit(0)).cast("int")

    joined.select(
      coalesce(exact("year"), folded("year"), lit(0)).cast("int").as("year"),
      coalesce(exact("month"), folded("month"), lit(0)).cast("int").as("month"),
      coalesce(exact("mode"), folded("mode"), lit("ALL")).as("mode"),
      coalesce(col("n_rows"), lit(0L)).as("n_rows"),
      coalesce(col("n_value"), lit(0L)).as("n_value"),
      coalesce(col("value_e6"), lit(0L)).as("value_e6"),
      coalesce(col("n_files"), lit(0L)).as("n_files"),
      coalesce(col("n_users"), lit(0L)).as("n_users"),
      flag(col("n_rows") <=> col("r_rows")).as("rows_match"),
      flag(col("n_value") <=> col("r_value")).as("value_match"),
      flag(col("value_e6") <=> col("r_value_e6")).as("value_e6_match"),
      flag(col("n_files") <=> col("r_files")).as("files_match"),
      // |est − exact|·100 ≤ exact·tol, all longs — no float compare
      flag(col("r_users_est").isNotNull && col("n_users").isNotNull &&
        abs(col("r_users_est") - col("n_users")) * lit(100L) <=
          col("n_users") * lit(reachTolPct.toLong)).as("reach_ok"))
  }

  /** MIGRATION: backfill the statistics stores for a lake whose history
    * predates the rollup protocol — the documented alternative to
    * disabling the serve/skip rules
    * (`spark.graft.rollup.{metadataAgg,partitionSkip}=false`). One lake
    * scan computes BOTH sidecars from the rows themselves:
    *
    *  - rollup partials at (source_file, partition) grain — from the
    *    lake's own lineage column when present, else per PHYSICAL FILE
    *    (`_metadata.file_path`), which preserves the per-file
    *    twin-collapse contract for foreign lakes that never carried
    *    lineage;
    *  - file bounds at (data_file, partition) grain, keyed by the
    *    CURRENT physical file names — exactly what the file-grain skip
    *    rule matches against the listing.
    *
    * Overwrites both stores wholesale into single `backfill-<token>`
    * batch dirs (prior partial dirs, if any, are REPLACED — a backfill
    * is a statement that the stores should equal the lake as scanned,
    * and merging with unknown-provenance history could double-count).
    * Run it under the lake's single-maintenance-writer discipline with
    * no concurrent publishes (a migration, not a tick), then audit with
    * [[reconcile]] — RollupSpec's backfill case requires all-green
    * flags and both rules firing afterwards. Cost: one full lake scan —
    * the floor for deriving statistics a lake never maintained. */
  def backfill(s: SparkSession, curatedDir: String, rollupDir: String,
               fileBoundsDir: String): Unit = {
    val lake = CuratedWriter.read(s, curatedDir)
    val withLineage = lineageOf(lake)
    val token = java.util.UUID.randomUUID().toString.take(8)
    for (dir <- Seq(rollupDir, fileBoundsDir)) {
      val p = new Path(dir)
      val fs = graft.engine.Fs.of(s.sparkContext.hadoopConfiguration, p)
      if (fs.exists(p)) fs.delete(p, true): Unit
    }
    writePartials(withLineage, s"$rollupDir/backfill-$token")
    // the FULL curated schema rides into the bounds compute, so the
    // backfilled store carries the generic per-column triplets for
    // every numeric/timestamp column the lake holds TODAY — a migrated
    // lake is immediately skippable on the same columns a graft-written
    // one is (FileBounds.boundsColumns)
    FileBounds.writeStaged(
      lake.select(col("*"), col("_metadata")),
      prefix = "", dir = s"$fileBoundsDir/backfill-$token")
  }

  /** Maintenance: when more than `maxBatchDirs` batch dirs have
    * accumulated, fold them into one `merged-*` dir. Safe order —
    * write merged (hidden tmp), rename IN, delete sources: a crash
    * leaves source+merged twins that [[stats]]' per-file collapse
    * absorbs, and the next compaction sweeps them. Batches published
    * concurrently with the fold are untouched (not in the listed set).
    * Returns true when a fold ran. Caller is the lake's single
    * maintenance writer (the tick/micro-batch loop). */
  def compact(s: SparkSession, rollupDir: String, maxBatchDirs: Int = 16): Boolean = {
    val root = new Path(rollupDir)
    val fs: FileSystem = graft.engine.Fs.of(s.sparkContext.hadoopConfiguration, root)
    if (!fs.exists(root)) return false
    val dirs = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && !st.getPath.getName.startsWith(".") &&
        !st.getPath.getName.startsWith("_"))
      .map(_.getPath)
    if (dirs.size <= maxBatchDirs) return false
    val token = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new Path(root, s".compact-$token")
    fs.delete(tmp, true)
    // collapse to one row per (file, partition) so twins from earlier
    // crashes fold away instead of accumulating across compactions;
    // per-dir normalize fallback for mixed-generation stores
    val raw = readNormalized(s, dirs.map(_.toString), ignoreMissing = false)
    val merged = raw
      .groupBy("source_file", "year", "month", "day", "mode")
      .agg(
        first("n_rows").as("n_rows"),
        first("n_value").as("n_value"),
        first("value_e6").as("value_e6"),
        first("min_ts").as("min_ts"),
        first("max_ts").as("max_ts"),
        first("users_hll").as("users_hll"),
        first("top_users").as("top_users"))
    merged.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val live = new Path(root, s"merged-$token")
    if (!fs.rename(tmp, live))
      throw new java.io.IOException(s"rollup compaction rename failed: $tmp -> $live")
    dirs.foreach(d => fs.delete(d, true): Unit)
    true
  }
}
