package graft.ingest

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** S8: raw-file archival — move each successfully processed source file
  * from the landing prefix to the processed prefix, preserving subfolder
  * structure (psuedo_code.txt:230-238). Per-file try/catch so one failed
  * move downgrades that file, not the batch (psuedo_code.txt:244-248).
  *
  * Driver-side and O(files) by design, mirroring the reference; the cost
  * is bounded by the batch size (10k files/run), and the Hadoop
  * FileSystem API keeps it object-store-portable (rename on S3A =
  * copy+delete, exactly the reference's `copy_object`+`delete_object`).
  */
object Archiver {
  /** Returns (archivedOk, failed) path lists. */
  def archive(spark: SparkSession, files: Seq[String],
              rawDir: String, processedDir: String): (Seq[String], Seq[(String, String)]) = {
    val fs = FileSystem.get(new Path(rawDir).toUri, spark.sparkContext.hadoopConfiguration)
    val rawPrefix = new Path(rawDir).toUri.getPath.stripSuffix("/") + "/"
    val ok = Seq.newBuilder[String]
    val bad = Seq.newBuilder[(String, String)]
    files.foreach { f =>
      try {
        val rel = f.stripPrefix(rawPrefix)
        require(rel != f, s"$f is not under $rawPrefix")
        val dest = new Path(processedDir, rel)
        fs.mkdirs(dest.getParent)
        if (!fs.rename(new Path(f), dest))
          throw new java.io.IOException(s"rename returned false for $f")
        ok += f
      } catch {
        case e: Exception => bad += f -> e.getMessage
      }
    }
    (ok.result(), bad.result())
  }
}
