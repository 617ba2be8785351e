package graft.ledger

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable.ArrayBuffer

/** S3 + §3.2: the discovery job (`FileListerAndDbPopulator`,
  * psuedo_code.txt:66-137) — recursively list the raw landing prefix and
  * register every data file in the ledger, conflict-ignore, so the job is
  * re-runnable by construction.
  *
  * The reference's boto3 `list_objects_v2` paginator loop maps to the
  * Hadoop FileSystem listing API (object-store-portable: the same call
  * pages through S3A). Driver-only, like the reference (no Spark stage);
  * at 100 TB the listing is still O(files) metadata, and the per-1,000
  * batched inserts (psuedo_code.txt:103-125) are subsumed by the ledger's
  * single-commit register.
  */
object Discovery {
  /** Data files only: skip committer markers (_SUCCESS), checksums and
    * other dot/underscore files — same convention Spark's own readers use.
    */
  def listDataFiles(spark: SparkSession, rawDir: String): Seq[(String, Long)] = {
    val root = new Path(rawDir)
    val fs = FileSystem.get(root.toUri, spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val out = ArrayBuffer.empty[(String, Long)]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (!name.startsWith("_") && !name.startsWith("."))
        out += ((graft.ingest.PathNorm.fromUri(st.getPath.toUri), st.getLen))
    }
    out.sortBy(_._1).toSeq
  }

  /** Returns the number of newly registered files. */
  def run(spark: SparkSession, rawDir: String, ledger: Ledger): Long =
    ledger.register(listDataFiles(spark, rawDir))
}
