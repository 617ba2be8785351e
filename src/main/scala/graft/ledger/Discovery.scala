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
  /** Landing-zone manifest location: an underscore-prefixed directory, so
    * both the tree-walk below and Spark's own file readers skip it as
    * metadata. */
  def manifestDir(rawDir: String): String = s"$rawDir/$ManifestName"
  val ManifestName = "_manifest"

  /** Data files only: skip committer markers (_SUCCESS), checksums and
    * other dot/underscore files — same convention Spark's own readers use.
    *
    * When the landing zone carries a manifest (`_manifest/` parquet of
    * (path, size) rows, written by the upstream producer or
    * [[writeManifest]]), it is preferred over the walk: a recursive
    * listing is one driver-side metadata call per ~1,000 objects, so at
    * the ~100k-file mark (minutes of driver list latency on an object
    * store; S3 inventory exists for exactly this reason) discovery should
    * be manifest-driven — the manifest read is one parquet scan
    * regardless of file count. The walk remains the zero-setup fallback,
    * and both paths yield identical [[graft.ingest.PathNorm]]-normalized
    * keys (asserted in IngestSpec). */
  def listDataFiles(spark: SparkSession, rawDir: String): Seq[(String, Long)] = {
    val root = new Path(rawDir)
    val fs = FileSystem.get(root.toUri, spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    if (fs.exists(new Path(manifestDir(rawDir)))) listViaManifest(spark, rawDir)
    else listViaWalk(fs, root)
  }

  private def listViaWalk(fs: FileSystem, root: Path): Seq[(String, Long)] = {
    val qroot = fs.makeQualified(root)
    val out = ArrayBuffer.empty[(String, Long)]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val st = it.next()
      // A file is metadata if ANY segment below root is _- or .-prefixed,
      // not just its basename: the parquet parts under `_manifest/` have
      // ordinary part-*.parquet names, and discovering them as data rows
      // would let a manifest republish (mode overwrite) delete files the
      // ledger had just registered.
      var p = st.getPath
      var hidden = false
      while (p != null && p != qroot) {
        val n = p.getName
        if (n.startsWith("_") || n.startsWith(".")) hidden = true
        p = p.getParent
      }
      if (!hidden)
        out += ((graft.ingest.PathNorm.fromUri(st.getPath.toUri), st.getLen))
    }
    out.sortBy(_._1).toSeq
  }

  /** Manifest-driven listing: read (rel_path, size) rows from the
    * `_manifest/` parquet and resolve each against the landing root into
    * the same normalized absolute key the walk produces. Paths are stored
    * RELATIVE so the manifest survives a lake relocation (and a snapshot
    * restore). Collected on the driver — a manifest row is ~100 bytes, so
    * even a 10M-file zone is a ~1 GB driver read; beyond that the ledger
    * register itself should go distributed, not this listing. */
  def listViaManifest(spark: SparkSession, rawDir: String): Seq[(String, Long)] = {
    val rootUri = new Path(rawDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(new Path(rawDir)).toUri
    spark.read.parquet(manifestDir(rawDir))
      .select("rel_path", "size").collect()
      .map { r =>
        val abs = new Path(new Path(rootUri), r.getAs[String]("rel_path"))
        (graft.ingest.PathNorm.fromUri(abs.toUri), r.getAs[Long]("size"))
      }
      .sortBy(_._1).toSeq
  }

  /** Producer-side helper: walk the zone once and write its manifest
    * (one coalesced parquet of relative paths), making every later
    * discovery manifest-driven. */
  def writeManifest(spark: SparkSession, rawDir: String): Long = {
    val root = new Path(rawDir)
    val fs = FileSystem.get(root.toUri, spark.sparkContext.hadoopConfiguration)
    val rootKey = graft.ingest.PathNorm.fromUri(fs.makeQualified(root).toUri)
    val rows = listViaWalk(fs, root).map { case (p, len) =>
      (p.stripPrefix(rootKey).stripPrefix("/"), len)
    }
    import spark.implicits._
    rows.toDF("rel_path", "size").coalesce(1)
      .write.mode("overwrite").parquet(manifestDir(rawDir))
    rows.size.toLong
  }

  /** Returns the number of newly registered files. */
  def run(spark: SparkSession, rawDir: String, ledger: Ledger): Long =
    ledger.register(listDataFiles(spark, rawDir))
}
