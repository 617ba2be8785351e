package graft.ingest

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-DATA-FILE statistics sidecar for the curated lake — the
  * file-grain complement of the partition-grain rollup partials
  * ([[Rollup]]), and the statistics behind two skipping moves the
  * partials alone cannot make (the Iceberg-manifest move, from numbers
  * this pipeline already computes in the publish path):
  *
  *  - FILE-grain zone skipping: inside a qualifying partition, a fresh
  *    (uncompacted) appended file whose `[min_ts, max_ts]` misses the
  *    query's event-time window is dropped from the scan's file listing
  *    — compacted files get the same effect from their sorted row
  *    groups, so with this the WHOLE partition prunes, not just its
  *    compacted head ([[graft.plans.RollupPartitionSkip]]).
  *  - COLUMN zone maps: `min_val`/`max_val` (legacy names) plus a
  *    `nn_/min_/max_<col>` triplet for EVERY numeric/timestamp curated
  *    column ([[boundsColumns]], schema-driven — round 17) fold to
  *    partition grain, so a range predicate on any such column prunes
  *    partitions the event-time zones cannot — including columns added
  *    after the lake's history began (per-column coverage fails open
  *    for pre-upgrade files).
  *
  * One row per (data_file, year, month, day, mode), where `data_file`
  * is the file's FINAL published basename (the publish prefix is known
  * before the rows are staged, so the bounds ride the SAME atomic
  * commit as the rows and the rollup partials — a batch's bounds are
  * published iff its rows are).
  *
  * Trust contract, WEAKER than the partials' by design (and that is
  * what keeps it sound): a consumer may only act on a bounds row whose
  * `data_file` appears in the lake's CURRENT listing — a listed file
  * with no bounds row (a pre-upgrade append, a crash-window compaction
  * generation) is simply not skippable, and a bounds row whose file is
  * gone is ignored dead weight. File content is immutable once
  * published and names are unique per publish token/generation, so a
  * matched row is always accurate. Partition-grain VALUE folding
  * additionally requires COVERAGE — Σ live bounds `n_rows` per
  * partition equal to the partials' Σ `n_rows` — which holds across
  * compaction because each swap publishes ONE atomic batch pairing the
  * rewritten generation's fresh rows with TOMBSTONES for the replaced
  * names ([[writeSwapBatch]], round 18 — before it, `sw<g>-` files
  * stayed boundless and file-grain skipping silently died on the
  * compacted bulk of a mature lake), and fails safe on
  * partially-upgraded lakes (under-coverage → no value skipping).
  *
  * Store layout mirrors the rollup: one small parquet dir per published
  * batch under `<lake root>/filebounds/`, duplication-absorbing per-key
  * `first()` collapse on read, [[compact]] folding accumulated batch
  * dirs in the maintenance slot.
  */
object FileBounds {
  /** The partition key every bounds row carries. */
  val PartCols: Seq[String] = Seq("year", "month", "day", "mode")

  /** The two LEGACY bounds columns, stored under their round-16 names
    * (`min_ts`/`max_ts`, `min_val`/`max_val`) with the legacy trust
    * rule: every bounds row tracks them, a NULL min/max means the
    * file's column is all-null. Kept verbatim so pre-generalization
    * stores stay readable without migration. */
  val TsCol = "event_time_utc"
  val ValCol = "value"

  /** Storage names for a GENERIC bounds column `c`. `nn_<c>` — the
    * file's non-null count of `c` — is what disambiguates the two
    * meanings a NULL `min_<c>` could have after a schema-evolving
    * mergeSchema read: `nn_<c>` NULL = this bounds row predates column
    * `c` (UNKNOWN, never skippable on `c`); `nn_<c>` = 0 = the file's
    * `c` is all-null (KNOWN, skippable under any range predicate on
    * `c`). The legacy pair predates the disambiguator and keeps its
    * always-tracked rule instead. */
  def nnCol(c: String): String = s"nn_$c"
  def minCol(c: String): String = s"min_$c"
  def maxCol(c: String): String = s"max_$c"

  /** Storage name for column `c`'s per-file Bloom filter (serialized
    * `org.apache.spark.util.sketch.BloomFilter` over `xxhash64(c)`,
    * built by [[graft.functions.BloomBuildAgg]]). OPT-IN per store
    * (the `blooms` parameter of [[compute]]/[[writeStaged]]/
    * [[writeSwapBatch]], `Compactor.TickConfig.bloomCols`): min/max
    * windows are a few bytes per file, a useful Bloom is kilobytes, so
    * the operator names the id-shaped columns worth it. A NULL filter
    * (pre-bloom batch, un-threaded heal, foreign writer) keeps the
    * file — fail-open like every other sidecar gap. */
  def bfCol(c: String): String = s"bf_$c"

  /** Storage name for column `c`'s ACHIEVED per-file false-positive
    * rate (`BloomFilter.expectedFpp` after insertion) — the audit
    * column that makes drop power observable without probing: a file
    * whose fpp drifted toward 1.0 has silently lost its membership
    * pruning (it was written past its ceiling) and should be queued
    * for a bounds rewrite. NULL on pre-round-20 stores (fail-open,
    * audit-only — the probe path never reads it). */
  def bfppCol(c: String): String = s"bfpp_$c"

  /** Storage name for column `c`'s WRITE-TIME hash type
    * (`DataType.simpleString` of the curated column as staged) — the
    * per-ROW probe gate (round 21, r20 ADVICE): `xxhash64` is
    * width-sensitive, so a filter built while `c` was INT must never be
    * probed with BIGINT-hashed literals. The skip rule's previous pin
    * compared the query type against the MERGED sidecar schema, which a
    * contract widening (or a [[compact]] fold casting old rows to the
    * widened type while their filter bytes stay int-hashed) defeats —
    * every probe would miss and files that DO contain matches would be
    * silently dropped. With the type on the row, each file is probed
    * iff ITS filter was built at the query's type; NULL (a pre-round-21
    * row in a store that has the column) keeps the file — fail-open
    * like every sidecar gap. */
  def bfTypeCol(c: String): String = s"bft_$c"

  /** Bloom sizing: each file's filter is sized from ITS OWN row count
    * (round 20 — `graft_bloom_agg_auto`), clamped to
    * [[BloomFloorItems]]..`bloomExpectedItems`. The caller's
    * `bloomExpectedItems` is thus a CEILING, not the size every filter
    * gets: a store whose file sizes differ 100× (fresh micro-batch
    * appends beside compacted bulk) gets kilobyte filters on the small
    * files and full-size ones on the large, instead of a fleet of
    * uniformly oversized (sidecar bloat) or undersized (drop power
    * silently lost to false positives) filters. The default ceiling is
    * production file grain (a 128 MB parquet file of curated events
    * holds ~1M rows, ~1.05 MB filter at [[BloomFpp]]); past the
    * ceiling the filter stays correct and degrades to a higher
    * false-positive rate — never a wrong drop. The ACHIEVED fpp per
    * file is recorded beside each filter ([[bfppCol]]) for audit. */
  val BloomExpectedItems = 1000000L
  val BloomFpp = 0.03

  /** Smallest filter worth publishing (~1.3 KB at 3%): below this the
    * per-row sizing gain is noise next to the sidecar row itself. */
  val BloomFloorItems = 1024L

  /** Tombstone marker: a row with `_dead = true` retires EVERY bounds
    * row for its (data_file, partition) key — the mechanism lake
    * compaction uses to replace a swapped-out file's statistics without
    * rewriting the append-only store ([[writeSwapBatch]]). [[all]]
    * filters dead keys out; [[compact]] drops them permanently (file
    * names are unique per publish token/generation, so a retired key
    * can never be legitimately re-published). Underscore-prefixed so
    * [[boundsColumns]] never mistakes it for a data column. */
  val DeadCol = "_dead"

  private def isSupported(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType |
         org.apache.spark.sql.types.DoubleType | org.apache.spark.sql.types.FloatType |
         org.apache.spark.sql.types.TimestampNTZType |
         org.apache.spark.sql.types.StringType => true
    case _ => false
  }

  /** STRING bounds are stored only for files where EVERY value fits
    * this many characters; a file with a longer value stores NULL
    * min/max with `nn_<c>` > 0 — the "bounds withheld" marker (for a
    * numeric column that combination is impossible: a non-empty min is
    * never null). Withheld bounds keep the file UNSKIPPABLE and break
    * the partition's string-coverage proof, both fail-open. The cap
    * bounds the sidecar's row size against free-text columns
    * (user_agent and friends) — the same concern Iceberg solves with
    * truncated bounds; withholding is the simpler move that needs no
    * upper-bound increment arithmetic and is equally sound. */
  val StringBoundsCap = 64

  /** The columns of `schema` that get GENERIC per-file bounds: every
    * top-level numeric/timestamp column that is not a partition column
    * and not one of the legacy pair. Schema-driven, so a curated column
    * added last quarter starts accruing bounds with the next published
    * batch — no config, no migration (its pre-upgrade files are simply
    * UNKNOWN for it, which fails open to no skipping; [[graft.ingest.Rollup.backfill]]
    * rewrites the store when retroactive coverage is wanted). */
  def boundsColumns(schema: org.apache.spark.sql.types.StructType): Seq[String] =
    schema.fields.toSeq
      .filter(f => !PartCols.contains(f.name) && f.name != TsCol && f.name != ValCol &&
        !f.name.startsWith("_") && isSupported(f.dataType))
      .map(_.name)

  /** Bounds of one staged batch, keyed by FINAL published file name
    * (`prefix` + staged basename — the rename `Staging.publishTracked`
    * will perform). `staged` must carry the curated columns plus
    * `_metadata` (i.e. be a read OF the staged parquet, not the
    * upstream frame). Tracks the legacy pair plus every
    * [[boundsColumns]] column of the staged schema, plus a per-file
    * Bloom filter ([[bfCol]]) for each `blooms` column — which must
    * name tracked bounds columns (a typo'd bloom config would
    * otherwise silently publish no filters and every point lookup
    * would quietly stop pruning). */
  def compute(staged: DataFrame, prefix: String,
              blooms: Seq[String] = Seq.empty,
              bloomExpectedItems: Long = BloomExpectedItems,
              bloomFpp: Double = BloomFpp): DataFrame = {
    val cols = boundsColumns(staged.schema)
    val badBlooms = blooms.filterNot(cols.contains)
    require(badBlooms.isEmpty,
      s"bloom columns must be tracked bounds columns; not tracked: $badBlooms")
    if (blooms.nonEmpty)
      graft.functions.BloomExpressions.register(staged.sparkSession)
    val strings = cols.filter(c =>
      staged.schema(c).dataType == org.apache.spark.sql.types.StringType)
    val generic = cols.flatMap { c =>
      Seq(count(col(c)).as(nnCol(c)),
        min(col(c)).as(minCol(c)),
        max(col(c)).as(maxCol(c))) ++
        // per-file longest value — the all-or-nothing withhold gate
        (if (strings.contains(c)) Seq(max(length(col(c))).as(s"_len_$c")) else Seq.empty) ++
        // auto-sized per file (object scaladoc): expectedItems derives
        // from the group's own row count, bloomExpectedItems caps it
        (if (blooms.contains(c))
          Seq(call_function("graft_bloom_agg_auto", xxhash64(col(c)),
            lit(math.min(BloomFloorItems, bloomExpectedItems)),
            lit(bloomExpectedItems), lit(bloomFpp)).as(s"_bfa_$c"))
        else Seq.empty)
    }
    val aggs = Seq(
      count(lit(1)).as("n_rows"),
      min(col(TsCol)).as("min_ts"),
      max(col(TsCol)).as("max_ts"),
      min(col(ValCol)).as("min_val"),
      max(col(ValCol)).as("max_val")) ++ generic
    val agged = staged
      .groupBy(
        concat(lit(prefix),
          regexp_extract(col("_metadata.file_path"), "[^/]+$", 0)).as("data_file"),
        col("year"), col("month"), col("day"), col("mode"))
      .agg(aggs.head, aggs.tail: _*)
    // split the auto-agg struct into the probe column (bf_<c>, binary —
    // the format the skip rule consumes, unchanged) and the audit
    // column (bfpp_<c>, the filter's achieved fpp)
    val withBlooms = blooms.foldLeft(agged) { (df, c) =>
      df.withColumn(bfCol(c), col(s"_bfa_$c")("bf"))
        .withColumn(bfppCol(c), col(s"_bfa_$c")("fpp"))
        .withColumn(bfTypeCol(c), lit(staged.schema(c).dataType.simpleString))
        .drop(s"_bfa_$c")
    }
    // withhold a string column's bounds for files holding ANY value
    // past the cap (per-file all-or-nothing: a per-VALUE filter would
    // be unsound — a long string can sort below every short one)
    strings.foldLeft(withBlooms) { (df, c) =>
      df.withColumn(minCol(c),
          when(col(s"_len_$c") <= StringBoundsCap, col(minCol(c))))
        .withColumn(maxCol(c),
          when(col(s"_len_$c") <= StringBoundsCap, col(maxCol(c))))
        .drop(s"_len_$c")
    }
  }

  /** Write one batch's bounds under `dir` (one small file — row count
    * bounded by files-written × partitions-per-file). */
  def writeStaged(staged: DataFrame, prefix: String, dir: String,
                  blooms: Seq[String] = Seq.empty,
                  bloomExpectedItems: Long = BloomExpectedItems,
                  bloomFpp: Double = BloomFpp): Unit =
    compute(staged, prefix, blooms, bloomExpectedItems, bloomFpp)
      .coalesce(1).write.mode("overwrite").parquet(dir)

  /** One lake-compaction swap's bounds publish: fresh rows for the
    * committed generation's output files (a column-pruned second read of
    * data the rewrite just wrote, still page-cache-warm — bounded by one
    * leaf) plus TOMBSTONE rows retiring the replaced files' statistics,
    * in ONE batch dir made visible by a single directory rename. Fresh
    * rows and tombstones being atomic is what preserves the partition
    * coverage proof (Σ live bounds rows ≡ Σ partial rows) across the
    * swap: before the rename the old rows stand in for the identical
    * rewritten content, after it the new rows do — no observable state
    * double-counts, so partition-grain value/generic skipping survives
    * compaction and the rewritten files regain FILE-grain skipping (the
    * round-17 hole: `sw<g>-` files used to stay boundless forever).
    *
    * Ordering (Compactor): runs AFTER the leaf's swap-meta commit. A
    * crash between commit and this publish leaves the generation
    * boundless — pure fail-open — and the still-standing swap journal
    * entry routes the next maintenance pass through [[reconcileLeaf]],
    * which heals exactly that state. A no-op when the leaf lacks the
    * legacy pair (not a curated lake — leave the store untouched). */
  def writeSwapBatch(s: SparkSession, dir: String, newFiles: Seq[String],
                     y: Int, m: Int, d: Int, mode: String,
                     replaced: Seq[String],
                     blooms: Seq[String] = Seq.empty,
                     bloomExpectedItems: Long = BloomExpectedItems,
                     bloomFpp: Double = BloomFpp): Boolean = {
    import s.implicits._
    val fresh =
      if (newFiles.isEmpty) None
      else {
        val staged = s.read.parquet(newFiles: _*)
          .select(col("*"), col("_metadata"))
          .withColumn("year", lit(y)).withColumn("month", lit(m))
          .withColumn("day", lit(d)).withColumn("mode", lit(mode))
        if (!staged.columns.contains(TsCol) || !staged.columns.contains(ValCol))
          return false // not curated-shaped: old rows stay authoritative
        // a bloom column the rewritten generation doesn't carry (schema
        // drift mid-lake) publishes no filter for it — fail-open, the
        // same posture as a pre-bloom batch
        val present = blooms.filter(boundsColumns(staged.schema).contains)
        Some(compute(staged, prefix = "", present, bloomExpectedItems, bloomFpp)
          .withColumn(DeadCol, lit(false)))
      }
    val tombs =
      if (replaced.isEmpty) None
      else Some(replaced.toDF("data_file")
        .withColumn("year", lit(y)).withColumn("month", lit(m))
        .withColumn("day", lit(d)).withColumn("mode", lit(mode))
        .withColumn(DeadCol, lit(true)))
    val out = (fresh, tombs) match {
      case (Some(f), Some(t)) => f.unionByName(t, allowMissingColumns = true)
      case (Some(f), None) => f
      case (None, Some(t)) => t
      case (None, None) => return false
    }
    val p = new Path(dir)
    val fs = graft.engine.Fs.of(s.sparkContext.hadoopConfiguration, p)
    val tmp = new Path(p.getParent,
      s".swapb-${java.util.UUID.randomUUID().toString.take(8)}")
    fs.delete(tmp, true)
    out.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"bounds swap-batch rename failed: $tmp -> $p")
    true
  }

  /** Journal-heal companion ([[Compactor.recoverJournal]]): bring the
    * store's view of ONE leaf back in line with the leaf's CURRENT live
    * listing after a crashed swap — live files with no live bounds row
    * get rows recomputed from the files themselves; names no longer
    * live (retired, deleted, or uncommitted strays healed away) still
    * carrying live rows get tombstoned. Idempotent (a clean leaf
    * publishes nothing); one metadata-sized store read plus at most one
    * leaf-bounded recompute. Returns true when a batch was published. */
  def reconcileLeaf(s: SparkSession, fbDir: String, leaf: Path,
                    y: Int, m: Int, d: Int, mode: String,
                    liveNames: Seq[String],
                    blooms: Seq[String] = Seq.empty): Boolean = {
    if (!hasData(s, fbDir)) return false
    val have = all(s, fbDir)
      .filter(col("year") === y && col("month") === m &&
        col("day") === d && col("mode") === mode)
      .select("data_file").collect().map(_.getString(0)).toSet
    val liveSet = liveNames.toSet
    val missing = liveNames.filterNot(have).sorted
    val stale = (have -- liveSet).toSeq.sorted
    if (missing.isEmpty && stale.isEmpty) return false
    writeSwapBatch(s,
      new Path(new Path(fbDir),
        s"heal-${java.util.UUID.randomUUID().toString.take(8)}").toString,
      missing.map(n => new Path(leaf, n).toString), y, m, d, mode, stale, blooms)
  }

  def hasData(s: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    val fs = graft.engine.Fs.of(s.sparkContext.hadoopConfiguration, p)
    Staging.countDataFiles(fs, p) > 0
  }

  /** One `first()` per non-key column, derived from the frame's own
    * (merged) schema — the twin-collapse aggregation shared by [[all]]
    * and [[compact]]. Works over any column generation: a batch dir
    * that predates a generic column contributes nulls for it.
    * `ignoreNulls` lets a key holding both a real row and a tombstone
    * (stats all null) keep the real statistics — the verdict for such a
    * key is decided by the `max(_dead)` marker, not by which twin
    * `first()` happened to see; identical twins are unaffected (all
    * null stays null). */
  private def collapseTwins(raw: DataFrame): DataFrame = {
    val keys = "data_file" +: PartCols
    val aggs = raw.columns.toSeq.filterNot(keys.contains)
      .map {
        case DeadCol => max(col(DeadCol)).as(DeadCol) // any tombstone kills the key
        case c => first(col(c), ignoreNulls = true).as(c)
      }
    raw.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Drop tombstoned keys (and the marker itself) from a collapsed
    * frame — the read-side half of the tombstone contract. */
  private def dropDead(collapsed: DataFrame): DataFrame =
    if (!collapsed.columns.contains(DeadCol)) collapsed
    else collapsed.filter(!coalesce(col(DeadCol), lit(false))).drop(DeadCol)

  /** All bounds rows currently published, collapsed to ONE row per
    * (data_file, partition) — same duplication-absorbing posture as
    * `Rollup.filePartials` (a replayed publish or a crashed [[compact]]
    * leaves identical twins). mergeSchema: batch dirs written before a
    * curated column existed lack its bounds triplet — the merged read
    * surfaces those rows with NULL `nn_<c>` (= unknown), exactly the
    * fail-open the trust contract needs. */
  def all(s: SparkSession, dir: String): DataFrame =
    dropDead(collapseTwins(rawRead(s, dir)))

  /** The store's raw merged read, with the schema memoized per listing
    * state ([[SchemaMemo]]) so repeated constructions — the skip rule
    * builds this frame per fold, q116/q126 per evaluation — don't each
    * pay a footer-merge inference job. */
  private def rawRead(s: SparkSession, dir: String): DataFrame = {
    def rd = s.read
      .option("recursiveFileLookup", "true")
      .option("mergeSchema", "true")
      .option("ignoreMissingFiles", "true") // racing [[compact]]'s source deletes
    rd.schema(SchemaMemo.mergedSchema(s, Seq(dir), rd.parquet(dir).schema))
      .parquet(dir)
  }

  /** Store-size audit — the operator's gauge for sidecar growth under
    * swap churn (r18 verdict watch item). ONE metadata-sized row:
    * `rows_raw` is what the zone fold physically reads (every published
    * bounds row, twins and tombstones included), `rows_live` what [[all]]
    * serves after collapse, `rows_dead` the tombstoned keys awaiting
    * permanent removal, `n_batches` the batch dirs the next [[compact]]
    * call folds. `rows_raw` pulling away from `rows_live` — or
    * `n_batches` sitting past the compact threshold across ticks —
    * means the maintenance slot is not running; no file listing needed,
    * the fold input size IS the audit. */
  def storeAudit(s: SparkSession, dir: String): DataFrame = {
    val root = new Path(dir)
    val fs: FileSystem = graft.engine.Fs.of(s.sparkContext.hadoopConfiguration, root)
    val nBatches =
      if (!fs.exists(root)) 0L
      else fs.listStatus(root).count(st => st.isDirectory &&
        !st.getPath.getName.startsWith(".") &&
        !st.getPath.getName.startsWith("_")).toLong
    val raw = rawRead(s, dir)
    val collapsed = collapseTwins(raw)
    val deadFlag =
      if (collapsed.columns.contains(DeadCol)) coalesce(col(DeadCol), lit(false))
      else lit(false)
    raw.agg(count(lit(1)).as("rows_raw"))
      .crossJoin(collapsed.agg(
        count(lit(1)).as("keys_total"),
        sum(when(deadFlag, 1L).otherwise(0L)).as("keys_dead")))
      .select(col("rows_raw"),
        (col("keys_total") - col("keys_dead")).as("rows_live"),
        col("keys_dead").as("rows_dead"),
        lit(nBatches).as("n_batches"))
  }

  /** Maintenance: fold accumulated batch dirs (same slot, same
    * single-maintenance-writer discipline, and same crash posture as
    * `Rollup.compact` — merged renames in before sources delete, so a
    * crash leaves only absorbable twins). */
  def compact(s: SparkSession, dir: String, maxBatchDirs: Int = 16): Boolean = {
    val root = new Path(dir)
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
    // dropDead here makes tombstoned keys' removal PERMANENT: the fold
    // covers every batch dir, so a tombstone and all rows it retires are
    // in scope together, and a retired file name can never re-appear
    dropDead(collapseTwins(
      s.read.option("recursiveFileLookup", "true")
        .option("mergeSchema", "true") // mixed column generations fold fine
        .parquet(dirs.map(_.toString): _*)))
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val live = new Path(root, s"merged-$token")
    if (!fs.rename(tmp, live))
      throw new java.io.IOException(s"filebounds compaction rename failed: $tmp -> $live")
    dirs.foreach(d => fs.delete(d, true): Unit)
    true
  }

  /** The partition-grain zone fold with its PER-COLUMN coverage proof,
    * for the legacy `value` column plus any subset of the store's
    * generic bounds columns. Per (year, month, day, mode):
    *
    *  - `vmin`/`vmax`/`covered` — the legacy value zones: `covered`
    *    iff the bounds rows account for EXACTLY the partition's row
    *    count as recorded by the rollup partials (every bounds row
    *    tracks `value` by the legacy rule, so row coverage IS column
    *    coverage);
    *  - per generic `c`: `zmin_<c>`/`zmax_<c>`/`covered_<c>` — here
    *    coverage counts only rows that KNOW `c` (`nn_<c>` non-null),
    *    so a partition with any pre-`c` file is uncovered FOR `c`
    *    while staying covered for columns those files do track.
    *
    * Only a covered partition may be skipped on that column; an
    * uncovered one (partial upgrade, foreign writes) is simply not
    * prunable on it. One aggregate over the store regardless of how
    * many columns are asked for. */
  def partitionZones(s: SparkSession, fileBoundsDir: String,
                     rollupDir: String, generics: Seq[String] = Seq.empty): DataFrame = {
    val pRows = Rollup.filePartials(s, rollupDir)
      .groupBy("year", "month", "day", "mode")
      .agg(sum("n_rows").as("p_rows"))
    val b0 = all(s, fileBoundsDir)
    val gAggs = generics.flatMap { c =>
      // a row "knows" column c when it carries usable statistics for
      // it: numeric/timestamp — the nn_<c> disambiguator is present;
      // string — bounds present OR known-all-null (a present nn with
      // NULL bounds is the WITHHELD marker, which must break coverage,
      // and which cannot occur for a numeric column)
      val known =
        if (b0.schema(minCol(c)).dataType == org.apache.spark.sql.types.StringType)
          col(minCol(c)).isNotNull || col(nnCol(c)) === 0
        else col(nnCol(c)).isNotNull
      Seq(sum(when(known, col("n_rows"))).as(s"b_rows_$c"),
        // the partition's known non-null count — when covered, the TRUE
        // non-null count, which is what services IS [NOT] NULL zones
        sum(when(known, coalesce(col(nnCol(c)), lit(0L)))).as(s"znn_$c"),
        min(minCol(c)).as(s"zmin_$c"), max(maxCol(c)).as(s"zmax_$c"))
    }
    val aggs = Seq(sum("n_rows").as("b_rows"),
      min("min_val").as("vmin"), max("max_val").as("vmax")) ++ gAggs
    val b = b0
      .groupBy("year", "month", "day", "mode")
      .agg(aggs.head, aggs.tail: _*)
    val out = Seq(col("year"), col("month"), col("day"), col("mode"),
      col("p_rows"), col("vmin"), col("vmax"),
      (col("b_rows") <=> col("p_rows")).as("covered")) ++
      generics.flatMap(c => Seq(col(s"zmin_$c"), col(s"zmax_$c"), col(s"znn_$c"),
        (col(s"b_rows_$c") <=> col("p_rows")).as(s"covered_$c")))
    pRows.join(b, Seq("year", "month", "day", "mode"), "left")
      .select(out: _*)
  }

  /** The legacy value-only fold, kept as the documented entry point for
    * value-zone consumers and specs. */
  def partitionValueZones(s: SparkSession, fileBoundsDir: String,
                          rollupDir: String): DataFrame =
    partitionZones(s, fileBoundsDir, rollupDir)

  /** String-bounds observability (round 18): per tracked string column,
    * how many live bounds rows carry the column at all (`files_known`)
    * and how many WITHHELD their min/max under [[StringBoundsCap]]
    * (`files_withheld`: nn > 0 with NULL bounds — a value longer than
    * the cap somewhere in the file). This is the metadata answer to
    * "why doesn't my string predicate prune": a withheld file is
    * unskippable and breaks its partition's string-coverage proof, both
    * silently by design — this fold makes the silence inspectable
    * (q126 keeps it on the oracle surface). One metadata-sized
    * aggregate over the store; columns ordered by name. */
  def withheldAudit(s: SparkSession, dir: String): DataFrame = {
    val b = all(s, dir)
    val strings = b.schema.fields.toSeq
      .filter(f => f.name.startsWith("min_") &&
        f.dataType == org.apache.spark.sql.types.StringType)
      .map(_.name.stripPrefix("min_"))
      .filter(c => b.columns.contains(nnCol(c))) // generic cols carry nn_
      .sorted
    if (strings.isEmpty)
      return s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("col_name",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("files_known",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("files_withheld",
            org.apache.spark.sql.types.LongType))))
    val aggs = strings.flatMap { c =>
      Seq(sum(when(col(nnCol(c)).isNotNull, 1L).otherwise(0L)).as(s"k_$c"),
        sum(when(col(nnCol(c)) > 0 && col(minCol(c)).isNull, 1L)
          .otherwise(0L)).as(s"w_$c"))
    }
    b.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${strings.length}, " +
        strings.map(c => s"'$c', k_$c, w_$c").mkString(", ") +
        ") AS (col_name, files_known, files_withheld)")
  }

  /** Convenience for callers building zone predicates. */
  def intersects(mn: Column, mx: Column,
                 lo: Option[(Double, Boolean)], hi: Option[(Double, Boolean)]): Column =
    intersectsLits(mn, mx,
      lo.map { case (v, i) => (lit(v), i) }, hi.map { case (v, i) => (lit(v), i) })

  /** Zone-intersection predicate against arbitrary typed literal
    * bounds (the generalized form: callers hand the literal Columns so
    * the comparison stays same-typed with the stored min/max — no
    * widening to double, no precision cliff for long columns). */
  def intersectsLits(mn: Column, mx: Column,
                     lo: Option[(Column, Boolean)], hi: Option[(Column, Boolean)]): Column = {
    val loOk = lo.map { case (v, incl) =>
      if (incl) mx >= v else mx > v
    }
    val hiOk = hi.map { case (v, incl) =>
      if (incl) mn <= v else mn < v
    }
    (loOk.toSeq ++ hiOk.toSeq).reduceOption(_ && _).getOrElse(lit(true))
  }
}
