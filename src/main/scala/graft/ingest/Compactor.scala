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
  * two renames (leaf → leaf.old, tmp → leaf). The unit of work and of
  * failure is one partition directory — a crash mid-compaction leaves
  * every partition either fully old or fully new, and the job is
  * re-runnable (single-writer discipline, same as the ledger). At 100 TB
  * the candidate scan is a listing, partitions compact independently
  * (driver loop here; trivially parallelizable), and untouched
  * partitions cost nothing.
  */
object Compactor {
  final case class Report(partitionsCompacted: Int, filesBefore: Int, filesAfter: Int)

  def compact(spark: SparkSession, lakeDir: String,
              maxFilesPerPartition: Int = 4,
              targetBytesPerFile: Long = 128L * 1024 * 1024): Report = {
    val root = new Path(lakeDir)
    val fs = FileSystem.get(root.toUri, spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Report(0, 0, 0)

    def dataFiles(dir: Path): Seq[Path] =
      fs.listStatus(dir).toSeq
        .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
          !s.getPath.getName.startsWith("."))
        .map(_.getPath)

    // leaf partition dirs = directories that contain data files directly
    val leaves = ArrayBuffer.empty[Path]
    def walk(dir: Path): Unit = {
      val children = fs.listStatus(dir).toSeq
      val subdirs = children.filter(_.isDirectory)
      if (subdirs.isEmpty) { if (dataFiles(dir).nonEmpty) leaves += dir }
      else subdirs.foreach(s => walk(s.getPath))
    }
    walk(root)

    var compacted = 0
    var before = 0
    var after = 0
    leaves.foreach { leaf =>
      val files = dataFiles(leaf)
      before += files.size
      if (files.size > maxFilesPerPartition) {
        val bytes = files.map(f => fs.getFileStatus(f).getLen).sum
        val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytesPerFile).toInt)
        val tmp = new Path(leaf.getParent, s".compact-${leaf.getName}")
        fs.delete(tmp, true)
        // one leaf holds one partition's rows; partition values live in
        // the directory name, so the rewrite carries data columns only
        spark.read.parquet(leaf.toString)
          .repartition(nOut)
          .write.mode("overwrite").parquet(tmp.toString)
        val old = new Path(leaf.getParent, s".old-${leaf.getName}")
        if (!fs.rename(leaf, old)) throw new java.io.IOException(s"swap-out failed: $leaf")
        if (!fs.rename(tmp, leaf)) {
          fs.rename(old, leaf) // restore
          throw new java.io.IOException(s"swap-in failed: $leaf")
        }
        fs.delete(old, true)
        compacted += 1
        after += dataFiles(leaf).size
      } else after += files.size
    }
    Report(compacted, before, after)
  }
}
