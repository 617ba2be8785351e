package graft.ingest

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import scala.collection.mutable.ArrayBuffer

/** Small-file maintenance for the curated lake (SURVEY.md §7.5: the
  * 9 TB-backfill + weekly-drop design guarantees a small-file problem —
  * every scheduler tick appends a few files to every touched partition,
  * and a year of 15-minute ticks is ~35k appends).
  *
  * Per-PARTITION compaction, not whole-table rewrite: leaf partition
  * directories whose data-file count exceeds `maxFilesPerPartition` are
  * each rewritten into ceil(bytes/targetBytes) files and swapped in with
  * two renames (leaf → .old-leaf, tmp → leaf). The unit of work and of
  * failure is one partition directory; recovery runs first on every
  * invocation and completes or rolls back any swap a previous run left
  * half-done (`.old-X` with no `X` → restore; with `X` → drop leftover),
  * so the job is re-runnable and readers only ever see a partition fully
  * old or fully new. The rewrite reads with mergeSchema=true — partition
  * files can carry different schema generations (additive drift), and a
  * single-footer read would silently drop drifted columns.
  *
  * Two entry points, two recovery scopes:
  *
  *  - [[compact]] — the standalone whole-lake job: walks the tree for
  *    oversized leaves and runs the full-walk [[recover]] sweep first.
  *    At 100 TB the candidate scan is a listing, partitions compact
  *    independently (a bounded thread pool drives `parallelism`
  *    concurrent rewrite jobs — Spark schedules jobs from multiple
  *    driver threads natively), and untouched partitions cost nothing.
  *  - [[maintainTouched]] — the INGEST-TICK slot: the runner already
  *    knows exactly which partition dirs its publish moved files into,
  *    so per-tick maintenance inspects ONLY those leaves — O(touched),
  *    never an O(lake) listing walk. Crash-safety without the walk
  *    comes from a swap JOURNAL (`_compactions/` at the lake root,
  *    hidden from readers): an entry naming the leaf is created before
  *    the swap-out rename and removed after the old files are dropped,
  *    so [[recoverJournal]] heals exactly the leaves a crashed tick
  *    could have left half-swapped, by reading one small directory.
  *    [[compact]] journals its swaps too — its full-walk recovery also
  *    catches pre-journal legacy states, but a crashed standalone job
  *    followed only by ticks is still healed by the journal.
  *
  * When `sortCol` is set (the ingest default: `event_time_utc`), the
  * rewrite range-partitions and sorts by that column instead of
  * hash-scattering: output files tile the column's range and every
  * parquet row group carries tight min/max stats, so pushed-down time
  * predicates skip whole files' row groups at read time — the
  * within-partition complement of `RollupPartitionSkip`'s zone maps
  * (which prune whole partitions). Compaction never touches row
  * CONTENT, so the rollup partials summarizing these rows — keyed by
  * original source file, folded at partition grain — stay exact:
  * `Rollup.reconcile` is required green across compaction in
  * IngestSpec and the q115 fixture.
  */
object Compactor {
  final case class Report(partitionsCompacted: Int, filesBefore: Int, filesAfter: Int,
                          recovered: Int)

  /** Per-tick maintenance knobs for the ingest runners' slot. */
  final case class TickConfig(
      maxFilesPerPartition: Int = 8,
      targetBytesPerFile: Long = 128L * 1024 * 1024,
      sortCol: Option[String] = Some("event_time_utc"),
      parallelism: Int = 4)

  /** Persist a tick's maintenance report under `reportDir` — the audit
    * surface `Alarms.compaction_recovery` consumes. EVENT-only: a tick
    * that neither rewrote nor recovered anything writes no file, so the
    * healthy-idle steady state accretes nothing (this module exists to
    * fight small files, not mint them). One tiny JSON file per
    * eventful tick, named by run id (idempotent under replay). */
  def logReport(fs: FileSystem, reportDir: Path, runId: String, r: Report): Unit = {
    if (r.partitionsCompacted == 0 && r.recovered == 0) return
    fs.mkdirs(reportDir)
    val out = fs.create(new Path(reportDir, s"$runId.json"), true)
    try out.write(
      (s"""{"run_id":"$runId","partitions_compacted":${r.partitionsCompacted},""" +
        s""""files_before":${r.filesBefore},"files_after":${r.filesAfter},""" +
        s""""recovered":${r.recovered}}""").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def isHidden(name: String): Boolean =
    name.startsWith("_") || name.startsWith(".")

  private def dataFiles(fs: FileSystem, dir: Path): Seq[Path] =
    fs.listStatus(dir).toSeq
      .filter(s => s.isFile && !isHidden(s.getPath.getName))
      .map(_.getPath)

  // ---- swap journal ----------------------------------------------------

  private def journalDir(root: Path) = new Path(root, "_compactions")

  private def journalEntry(root: Path, leaf: Path): Path = {
    val rel = root.toUri.relativize(leaf.toUri).getPath
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(rel.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    new Path(journalDir(root), digest)
  }

  private def writeJournal(fs: FileSystem, root: Path, leaf: Path): Path = {
    val rel = root.toUri.relativize(leaf.toUri).getPath
    val entry = journalEntry(root, leaf)
    fs.mkdirs(entry.getParent)
    val out = fs.create(entry, true)
    try out.write(rel.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    entry
  }

  /** Complete or roll back the one half-swapped state a crash can leave
    * at `leaf`: missing live dir with its `.old-` beside it → restore;
    * then drop any `.compact-`/`.old-` leftovers next to a live dir.
    * Returns 1 when a restore ran. */
  private def healLeaf(fs: FileSystem, leaf: Path): Int = {
    val old = new Path(leaf.getParent, s".old-${leaf.getName}")
    val tmp = new Path(leaf.getParent, s".compact-${leaf.getName}")
    var restored = 0
    if (!fs.exists(leaf) && fs.exists(old)) {
      if (!fs.rename(old, leaf))
        throw new java.io.IOException(s"recovery restore failed: $old")
      restored = 1
    }
    if (fs.exists(leaf)) {
      fs.delete(old, true)
      fs.delete(tmp, true): Unit
    }
    restored
  }

  /** Heal exactly the leaves named in the swap journal — the O(pending)
    * recovery for the ingest-tick path. Returns restored count. */
  def recoverJournal(fs: FileSystem, root: Path): Int = {
    val dir = journalDir(root)
    if (!fs.exists(dir)) return 0
    var restored = 0
    fs.listStatus(dir).toSeq.filter(_.isFile).foreach { st =>
      val in = fs.open(st.getPath)
      val rel =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      if (rel.nonEmpty && !rel.startsWith("/") && !rel.contains("..") &&
          !rel.contains(":"))
        restored += healLeaf(fs, new Path(root, rel))
      fs.delete(st.getPath, false): Unit
    }
    restored
  }

  // ---- the per-leaf rewrite ---------------------------------------------

  /** Rewrite one oversized leaf. Returns (filesBefore, filesAfter,
    * compacted 0/1). The swap is journaled against `root`. */
  private def compactLeaf(spark: SparkSession, fs: FileSystem, root: Path,
                          leaf: Path, maxFilesPerPartition: Int,
                          targetBytesPerFile: Long,
                          sortCol: Option[String]): (Int, Int, Int) = {
    val files = dataFiles(fs, leaf)
    if (files.size <= maxFilesPerPartition) return (files.size, files.size, 0)
    val bytes = files.map(f => fs.getFileStatus(f).getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytesPerFile).toInt)
    val tmp = new Path(leaf.getParent, s".compact-${leaf.getName}")
    fs.delete(tmp, true)
    // one leaf holds one partition's rows; partition values live in
    // the directory name, so the rewrite carries data columns only
    val df = spark.read.option("mergeSchema", "true").parquet(leaf.toString)
    val laid = sortCol.filter(df.columns.contains) match {
      // range-tile + sort: each output file covers a disjoint slice of
      // the column and every row group carries tight min/max, so pushed
      // time predicates skip row groups at read time
      case Some(c) => df.repartitionByRange(nOut, col(c)).sortWithinPartitions(c)
      case None => df.repartition(nOut)
    }
    laid.write.mode("overwrite").parquet(tmp.toString)
    val entry = writeJournal(fs, root, leaf)
    val old = new Path(leaf.getParent, s".old-${leaf.getName}")
    if (!fs.rename(leaf, old)) throw new java.io.IOException(s"swap-out failed: $leaf")
    if (!fs.rename(tmp, leaf)) {
      fs.rename(old, leaf) // restore
      fs.delete(entry, false)
      throw new java.io.IOException(s"swap-in failed: $leaf")
    }
    fs.delete(old, true)
    fs.delete(entry, false)
    (files.size, dataFiles(fs, leaf).size, 1)
  }

  private def runPool(leaves: Seq[Path], parallelism: Int)
                     (work: Path => (Int, Int, Int)): Seq[(Int, Int, Int)] = {
    if (leaves.isEmpty) return Seq.empty
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(parallelism, leaves.size)))
    try {
      import scala.jdk.CollectionConverters._
      val tasks: Seq[java.util.concurrent.Callable[(Int, Int, Int)]] =
        leaves.map(leaf => (() => work(leaf)): java.util.concurrent.Callable[(Int, Int, Int)])
      pool.invokeAll(tasks.asJava).asScala.toSeq.map(_.get()) // rethrows leaf failures
    } finally pool.shutdown()
  }

  // ---- entry points -----------------------------------------------------

  /** The standalone whole-lake job: full-walk recovery, then rewrite
    * every oversized leaf. */
  def compact(spark: SparkSession, lakeDir: String,
              maxFilesPerPartition: Int = 4,
              targetBytesPerFile: Long = 128L * 1024 * 1024,
              parallelism: Int = 4,
              sortCol: Option[String] = None): Report = {
    val raw = new Path(lakeDir)
    val fs = FileSystem.get(raw.toUri, spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(raw)) return Report(0, 0, 0, 0)
    // qualify so journal-relativize and prefix checks see the same form
    // listStatus returns (lakeDir strings are often workspace-relative)
    val root = fs.makeQualified(raw)

    val recovered = recoverJournal(fs, root) + recover(fs, root)

    // leaf partition dirs (no visible subdirectories). Files sitting in
    // mixed dirs (stray writes next to partition subdirs) are counted in
    // the totals but never rewritten.
    val leaves = ArrayBuffer.empty[Path]
    var strayFiles = 0
    def walk(dir: Path): Unit = {
      val children = fs.listStatus(dir).toSeq
      val subdirs = children.filter(s => s.isDirectory && !isHidden(s.getPath.getName))
      if (subdirs.isEmpty) { if (dataFiles(fs, dir).nonEmpty) leaves += dir }
      else {
        strayFiles += dataFiles(fs, dir).size
        subdirs.foreach(s => walk(s.getPath))
      }
    }
    walk(root)

    val results = runPool(leaves.toSeq, parallelism)(
      compactLeaf(spark, fs, root, _, maxFilesPerPartition, targetBytesPerFile, sortCol))
    Report(
      results.map(_._3).sum,
      strayFiles + results.map(_._1).sum,
      strayFiles + results.map(_._2).sum,
      recovered)
  }

  /** The ingest-tick slot: heal journaled swaps, then inspect ONLY the
    * partition dirs this tick's publish touched — O(touched) per tick,
    * no lake walk. Callers run under the lake's single-writer
    * discipline (the tick owns the lake, same as `Rollup.compact`). */
  def maintainTouched(spark: SparkSession, lakeDir: String, touched: Seq[Path],
                      cfg: TickConfig = TickConfig()): Report = {
    val raw = new Path(lakeDir)
    val fs = FileSystem.get(raw.toUri, spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(raw)) return Report(0, 0, 0, 0)
    val root = fs.makeQualified(raw)
    val recovered = recoverJournal(fs, root)
    val rootPrefix = root.toUri.getPath + "/"
    val leaves = touched.distinct.map(fs.makeQualified)
      .filter(p => p.toUri.getPath.startsWith(rootPrefix) && fs.exists(p))
    val results = runPool(leaves, cfg.parallelism)(
      compactLeaf(spark, fs, root, _, cfg.maxFilesPerPartition,
        cfg.targetBytesPerFile, cfg.sortCol))
    Report(
      results.map(_._3).sum,
      results.map(_._1).sum,
      results.map(_._2).sum,
      recovered)
  }

  /** Complete or roll back swaps interrupted by a crash, by walking the
    * whole tree: a `.old-X` dir whose `X` is missing means the crash hit
    * between the two renames — restore it (the `.compact-X` rewrite, if
    * complete, is discarded; re-running compaction redoes it). Leftover
    * `.compact-*`/`.old-*` next to a live `X` are deleted. Returns the
    * number of restored partitions. */
  def recover(fs: FileSystem, root: Path): Int = {
    var restored = 0
    def sweep(dir: Path): Unit = {
      val children = fs.listStatus(dir).toSeq
      children.filter(_.isDirectory).foreach { st =>
        val name = st.getPath.getName
        if (name.startsWith(".old-")) {
          val live = new Path(dir, name.stripPrefix(".old-"))
          if (!fs.exists(live)) {
            if (!fs.rename(st.getPath, live))
              throw new java.io.IOException(s"recovery restore failed: ${st.getPath}")
            restored += 1
          } else fs.delete(st.getPath, true): Unit
        } else if (name.startsWith(".compact-")) {
          fs.delete(st.getPath, true): Unit
        } else if (!isHidden(name)) sweep(st.getPath)
      }
    }
    if (fs.exists(root)) sweep(root)
    restored
  }
}
