package graft.ingest

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
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
  * failure is one partition directory; [[recover]] runs first on every
  * invocation and completes or rolls back any swap a previous run left
  * half-done (`.old-X` with no `X` → restore; with `X` → drop leftover),
  * so the job is re-runnable and readers only ever see a partition fully
  * old or fully new. The rewrite reads with mergeSchema=true — partition
  * files can carry different schema generations (additive drift), and a
  * single-footer read would silently drop drifted columns. At 100 TB the
  * candidate scan is a listing, partitions compact independently (a
  * bounded thread pool drives `parallelism` concurrent rewrite jobs —
  * Spark schedules jobs from multiple driver threads natively), and
  * untouched partitions cost nothing.
  */
object Compactor {
  final case class Report(partitionsCompacted: Int, filesBefore: Int, filesAfter: Int,
                          recovered: Int)

  private def isHidden(name: String): Boolean =
    name.startsWith("_") || name.startsWith(".")

  def compact(spark: SparkSession, lakeDir: String,
              maxFilesPerPartition: Int = 4,
              targetBytesPerFile: Long = 128L * 1024 * 1024,
              parallelism: Int = 4): Report = {
    val root = new Path(lakeDir)
    val fs = FileSystem.get(root.toUri, spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Report(0, 0, 0, 0)

    val recovered = recover(fs, root)

    def dataFiles(dir: Path): Seq[Path] =
      fs.listStatus(dir).toSeq
        .filter(s => s.isFile && !isHidden(s.getPath.getName))
        .map(_.getPath)

    // leaf partition dirs (no visible subdirectories). Files sitting in
    // mixed dirs (stray writes next to partition subdirs) are counted in
    // the totals but never rewritten.
    val leaves = ArrayBuffer.empty[Path]
    var strayFiles = 0
    def walk(dir: Path): Unit = {
      val children = fs.listStatus(dir).toSeq
      val subdirs = children.filter(s => s.isDirectory && !isHidden(s.getPath.getName))
      if (subdirs.isEmpty) { if (dataFiles(dir).nonEmpty) leaves += dir }
      else {
        strayFiles += dataFiles(dir).size
        subdirs.foreach(s => walk(s.getPath))
      }
    }
    walk(root)

    // each leaf is an independent unit of work and of failure; run up to
    // `parallelism` leaf rewrites concurrently (each is its own Spark job)
    def compactLeaf(leaf: Path): (Int, Int, Int) = { // (before, after, compacted)
      val files = dataFiles(leaf)
      if (files.size > maxFilesPerPartition) {
        val bytes = files.map(f => fs.getFileStatus(f).getLen).sum
        val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytesPerFile).toInt)
        val tmp = new Path(leaf.getParent, s".compact-${leaf.getName}")
        fs.delete(tmp, true)
        // one leaf holds one partition's rows; partition values live in
        // the directory name, so the rewrite carries data columns only
        spark.read.option("mergeSchema", "true").parquet(leaf.toString)
          .repartition(nOut)
          .write.mode("overwrite").parquet(tmp.toString)
        val old = new Path(leaf.getParent, s".old-${leaf.getName}")
        if (!fs.rename(leaf, old)) throw new java.io.IOException(s"swap-out failed: $leaf")
        if (!fs.rename(tmp, leaf)) {
          fs.rename(old, leaf) // restore
          throw new java.io.IOException(s"swap-in failed: $leaf")
        }
        fs.delete(old, true)
        (files.size, dataFiles(leaf).size, 1)
      } else (files.size, files.size, 0)
    }

    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(parallelism, leaves.size)))
    val results =
      try {
        import scala.jdk.CollectionConverters._
        val tasks: Seq[java.util.concurrent.Callable[(Int, Int, Int)]] =
          leaves.toSeq.map(leaf =>
            (() => compactLeaf(leaf)): java.util.concurrent.Callable[(Int, Int, Int)])
        pool.invokeAll(tasks.asJava).asScala.toSeq.map(_.get()) // rethrows leaf failures
      } finally pool.shutdown()
    Report(
      results.map(_._3).sum,
      strayFiles + results.map(_._1).sum,
      strayFiles + results.map(_._2).sum,
      recovered)
  }

  /** Complete or roll back swaps interrupted by a crash: a `.old-X` dir
    * whose `X` is missing means the crash hit between the two renames —
    * restore it (the `.compact-X` rewrite, if complete, is discarded;
    * re-running compaction redoes it). Leftover `.compact-*`/`.old-*`
    * next to a live `X` are deleted. Returns the number of restored
    * partitions. */
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
