package graft.ingest

import org.apache.hadoop.fs.{FileSystem, Path}
import scala.collection.mutable.ArrayBuffer

/** Staged-publish primitive shared by the batch and streaming runners:
  * move the data files of a staged partition tree into the same relative
  * locations under the live lake, file by file, via rename.
  *
  * Why this shape (SURVEY.md §7.5's exactly-once-without-a-table-format
  * recommendation): a parquet `append` that dies mid-job leaves orphan
  * rows the next retry duplicates. Writing the batch to a private
  * staging tree first makes the batch's durability decision a single
  * atomic rename (the caller's commit point), and the publish step is
  * RESUMABLE — each rename removes its source, so a crash mid-publish
  * re-runs and moves only what remains; a moved file can never move
  * twice. File names get a caller-chosen prefix: unique per attempt for
  * the batch runner (uniqueness under concurrent appends), deterministic
  * per micro-batch for the streaming runner (so a replay can first sweep
  * the partial files of a crashed attempt — `replaceExistingPrefix`).
  *
  * Object-store note: on HDFS/local these renames are atomic metadata
  * ops; on S3A a rename is copy+delete, so the same protocol holds but
  * the commit point should move to an S3-committer/table format at that
  * deployment — documented trade-off, same code path.
  */
object Staging {
  private def visible(name: String): Boolean =
    !name.startsWith("_") && !name.startsWith(".")

  /** Count the visible data files under `dir` (recursing through
    * visible subdirectories — partitioned stores keep files one level
    * down). THE definition of "data file" for every file-count
    * compaction trigger (`DedupStage.maintain`,
    * `IvfIndex.compactIfFragmented`): marker/CRC names (`_*`, `.*`)
    * never count, and a change to the rule lands everywhere at once. */
  def countDataFiles(fs: FileSystem, dir: Path): Int =
    if (!fs.exists(dir)) 0
    else {
      val st = fs.listStatus(dir)
      st.count(s => s.isFile && visible(s.getPath.getName)) +
        st.filter(s => s.isDirectory && visible(s.getPath.getName))
          .map(s => countDataFiles(fs, s.getPath)).sum
    }

  /** Compact-swap discipline shared by the durable-index compactions
    * (`MinHashIndex.compact`, `IvfIndex.compact`): `write` rewrites the
    * store into a hidden staging dir beside it, then two renames swap
    * it live (live → `.old-<store>`, staged → live, old dropped). A
    * crash between the renames leaves the live path absent with the
    * `.old` beside it; the next call SELF-HEALS by renaming it back
    * before re-staging — require-checked like the swap renames, so a
    * failed recovery surfaces instead of leaving the store headless.
    * Callers run under their index's single-writer discipline. Runs
    * through the Hadoop [[FileSystem]] bound to `root`'s scheme — the
    * index family lives wherever the lake lives (local, HDFS, object
    * store), not on the driver's local disk. Local-FS/HDFS renames are
    * atomic metadata ops; see the object-store note above for S3A
    * deployments. */
  def compactStore(fs: FileSystem, root: Path, store: String)
                  (write: Path => Unit): Unit = {
    val live = new Path(root, store)
    val old = new Path(root, s".old-$store")
    val staged = new Path(root, s".compact-$store")
    if (!fs.exists(live) && fs.exists(old))
      require(fs.rename(old, live), s"compact: self-heal rename failed for $store")
    if (fs.exists(live)) {
      fs.delete(staged, true)
      write(staged)
      fs.delete(old, true)
      require(fs.rename(live, old), s"compact: rename-out failed for $store")
      require(fs.rename(staged, live), s"compact: rename-in failed for $store")
      fs.delete(old, true): Unit
    }
  }

  /** (relative partition path, data files) for every directory under
    * `root` that directly contains visible files. */
  private def leaves(fs: FileSystem, root: Path): Seq[(Seq[String], Seq[Path])] = {
    val out = ArrayBuffer.empty[(Seq[String], Seq[Path])]
    def walk(dir: Path, rel: Vector[String]): Unit = {
      val st = fs.listStatus(dir)
      val files = st.toSeq.collect {
        case s if s.isFile && visible(s.getPath.getName) => s.getPath
      }
      if (files.nonEmpty) out += ((rel, files))
      st.toSeq.filter(s => s.isDirectory && visible(s.getPath.getName))
        .foreach(s => walk(s.getPath, rel :+ s.getPath.getName))
    }
    if (fs.exists(root)) walk(root, Vector.empty)
    out.toSeq
  }

  /** Publish `stagedRoot`'s data files into `liveRoot`. Returns the
    * number of files moved (0 on a fully-resumed publish). */
  def publish(fs: FileSystem, stagedRoot: Path, liveRoot: Path, prefix: String,
              replaceExistingPrefix: Boolean = false): Int =
    publishTracked(fs, stagedRoot, liveRoot, prefix, replaceExistingPrefix)._1

  /** [[publish]], also returning the distinct destination directories
    * files landed in — the partition dirs this publish TOUCHED, which is
    * exactly the candidate set a per-tick small-file compaction needs
    * (`Compactor.maintainTouched`): O(touched) maintenance instead of an
    * O(lake) listing walk. */
  def publishTracked(fs: FileSystem, stagedRoot: Path, liveRoot: Path, prefix: String,
                     replaceExistingPrefix: Boolean = false): (Int, Seq[Path]) = {
    var moved = 0
    val touched = ArrayBuffer.empty[Path]
    leaves(fs, stagedRoot).foreach { case (rel, files) =>
      val dest = rel.foldLeft(liveRoot)(new Path(_, _))
      fs.mkdirs(dest)
      if (replaceExistingPrefix)
        fs.listStatus(dest).toSeq
          .filter(s => s.isFile && s.getPath.getName.startsWith(prefix))
          .foreach(s => fs.delete(s.getPath, false): Unit)
      if (files.nonEmpty) touched += dest
      files.foreach { f =>
        val to = new Path(dest, prefix + f.getName)
        if (!fs.rename(f, to))
          throw new java.io.IOException(s"staged publish rename failed: $f -> $to")
        moved += 1
      }
    }
    (moved, touched.toSeq)
  }
}
