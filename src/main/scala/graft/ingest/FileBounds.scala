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
  *  - VALUE-column zone maps: `min_val`/`max_val` fold to partition
  *    grain, so a `value`-range predicate prunes partitions the
  *    event-time zones cannot.
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
  * with no bounds row (a compaction-written `sw<g>-` file, a
  * pre-upgrade append) is simply not skippable, and a bounds row whose
  * file is gone (retired by compaction) is ignored dead weight. File
  * content is immutable once published and names are unique per
  * publish token, so a matched row is always accurate. Partition-grain
  * VALUE folding additionally requires COVERAGE — Σ bounds `n_rows`
  * per partition equal to the partials' Σ `n_rows` — which holds even
  * across compaction (rewrites preserve row content, so stale entries
  * still sum to the partition's true row count) and fails safe on
  * partially-upgraded lakes (under-coverage → no value skipping).
  *
  * Store layout mirrors the rollup: one small parquet dir per published
  * batch under `<lake root>/filebounds/`, duplication-absorbing per-key
  * `first()` collapse on read, [[compact]] folding accumulated batch
  * dirs in the maintenance slot.
  */
object FileBounds {
  /** Bounds of one staged batch, keyed by FINAL published file name
    * (`prefix` + staged basename — the rename `Staging.publishTracked`
    * will perform). `staged` must carry the curated columns plus
    * `_metadata` (i.e. be a read OF the staged parquet, not the
    * upstream frame). */
  def compute(staged: DataFrame, prefix: String): DataFrame =
    staged
      .groupBy(
        concat(lit(prefix),
          regexp_extract(col("_metadata.file_path"), "[^/]+$", 0)).as("data_file"),
        col("year"), col("month"), col("day"), col("mode"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("event_time_utc")).as("min_ts"),
        max(col("event_time_utc")).as("max_ts"),
        min(col("value")).as("min_val"),
        max(col("value")).as("max_val"))

  /** Write one batch's bounds under `dir` (one small file — row count
    * bounded by files-written × partitions-per-file). */
  def writeStaged(staged: DataFrame, prefix: String, dir: String): Unit =
    compute(staged, prefix).coalesce(1).write.mode("overwrite").parquet(dir)

  def hasData(s: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    Staging.countDataFiles(fs, p) > 0
  }

  /** All bounds rows currently published, collapsed to ONE row per
    * (data_file, partition) — same duplication-absorbing posture as
    * `Rollup.filePartials` (a replayed publish or a crashed [[compact]]
    * leaves identical twins). */
  def all(s: SparkSession, dir: String): DataFrame =
    s.read
      .option("recursiveFileLookup", "true")
      .option("ignoreMissingFiles", "true") // racing [[compact]]'s source deletes
      .parquet(dir)
      .groupBy("data_file", "year", "month", "day", "mode")
      .agg(
        first("n_rows").as("n_rows"),
        first("min_ts").as("min_ts"),
        first("max_ts").as("max_ts"),
        first("min_val").as("min_val"),
        first("max_val").as("max_val"))

  /** Maintenance: fold accumulated batch dirs (same slot, same
    * single-maintenance-writer discipline, and same crash posture as
    * `Rollup.compact` — merged renames in before sources delete, so a
    * crash leaves only absorbable twins). */
  def compact(s: SparkSession, dir: String, maxBatchDirs: Int = 16): Boolean = {
    val root = new Path(dir)
    val fs: FileSystem = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return false
    val dirs = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && !st.getPath.getName.startsWith(".") &&
        !st.getPath.getName.startsWith("_"))
      .map(_.getPath)
    if (dirs.size <= maxBatchDirs) return false
    val token = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new Path(root, s".compact-$token")
    fs.delete(tmp, true)
    s.read.option("recursiveFileLookup", "true")
      .parquet(dirs.map(_.toString): _*)
      .groupBy("data_file", "year", "month", "day", "mode")
      .agg(
        first("n_rows").as("n_rows"),
        first("min_ts").as("min_ts"),
        first("max_ts").as("max_ts"),
        first("min_val").as("min_val"),
        first("max_val").as("max_val"))
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val live = new Path(root, s"merged-$token")
    if (!fs.rename(tmp, live))
      throw new java.io.IOException(s"filebounds compaction rename failed: $tmp -> $live")
    dirs.foreach(d => fs.delete(d, true): Unit)
    true
  }

  /** The partition-grain VALUE zone fold with its coverage proof: per
    * (year, month, day, mode), the folded min/max of `value` plus
    * `covered` — whether the bounds rows account for EXACTLY the
    * partition's row count as recorded by the rollup partials. Only a
    * covered partition may be value-skipped; an uncovered one (partial
    * upgrade, foreign writes) is simply not prunable on value. */
  def partitionValueZones(s: SparkSession, fileBoundsDir: String,
                          rollupDir: String): DataFrame = {
    val pRows = Rollup.filePartials(s, rollupDir)
      .groupBy("year", "month", "day", "mode")
      .agg(sum("n_rows").as("p_rows"))
    val b = all(s, fileBoundsDir)
      .groupBy("year", "month", "day", "mode")
      .agg(sum("n_rows").as("b_rows"),
        min("min_val").as("vmin"), max("max_val").as("vmax"))
    pRows.join(b, Seq("year", "month", "day", "mode"), "left")
      .select(col("year"), col("month"), col("day"), col("mode"),
        col("vmin"), col("vmax"),
        (col("b_rows") <=> col("p_rows")).as("covered"))
  }

  /** Convenience for callers building zone predicates. */
  def intersects(mn: Column, mx: Column,
                 lo: Option[(Double, Boolean)], hi: Option[(Double, Boolean)]): Column = {
    val loOk = lo.map { case (v, incl) =>
      if (incl) mx >= lit(v) else mx > lit(v)
    }
    val hiOk = hi.map { case (v, incl) =>
      if (incl) mn <= lit(v) else mn < lit(v)
    }
    (loOk.toSeq ++ hiOk.toSeq).reduceOption(_ && _).getOrElse(lit(true))
  }
}
