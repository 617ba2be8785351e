package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Merged-schema memo for the metadata STORES (rollup partials, bounds
  * sidecar) — round 21. Every `mergeSchema=true` read launches a
  * distributed footer-merge job at DataFrame CONSTRUCTION, and the
  * optimizer rules construct store reads several times per query
  * (RollupMetadataAggregate builds the partials frame per candidate
  * aggregate per fixpoint pass), so one bench query paid the same
  * 40-90 ms inference job four-plus times. The merged schema is a pure
  * function of the store's file set; memoize it on the listing
  * signature (every file's path:len:mtime) and pass it explicitly —
  * per-file clipping/null-filling behaves identically, inference only
  * ever DETERMINED the requested schema. A publish, swap, compaction
  * or drift column changes the signature and re-infers.
  *
  * Failures are never cached: a store whose generations cannot
  * parquet-merge (Rollup's struct-vs-binary top_users case) throws out
  * of the inference thunk, and the caller's fallback sees the same
  * error it would have seen from the plain read.
  *
  * [[graft.ingest.CuratedWriter.read]] keeps its own twin (it already
  * holds the live FileStatuses, so it signs without a second walk);
  * this one walks — the stores are metadata-sized, so the walk is
  * microseconds against the job it replaces. Bounded LRU like the skip
  * rule's fold cache. */
private[graft] object SchemaMemo {
  private val cache: java.util.Map[String, StructType] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, StructType](16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, StructType]): Boolean = size() > 64
      })

  /** Count of ACTUAL inference runs (cache misses) — for specs. */
  private[graft] val inferCount = new java.util.concurrent.atomic.AtomicLong

  private[graft] def clear(): Unit = cache.clear()

  /** Append every visible file's path:len:mtime under `p` to `sb` — a
    * plain listStatus walk, NOT `fs.listFiles(recursive)`: the
    * RemoteIterator resolves block locations per file, which on the
    * local filesystem measured ~5 ms/file (≈0.4 s per signature on a
    * 70-file store) vs ~0.05 ms/file for the status walk. Shared with
    * the skip rule's fold-cache signature. */
  private[graft] def signListing(fs: org.apache.hadoop.fs.FileSystem,
                                 p: Path, sb: StringBuilder): Unit = {
    // The reads this memo fronts are built with ignoreMissingFiles to
    // survive a concurrent compaction deleting source dirs between
    // listing and scan; the signature walk must tolerate the same race.
    // A dir that vanishes between the parent and child listStatus is
    // skipped — the next signature (post-compaction) differs anyway, so
    // the vanished entry can never serve a stale schema.
    val entries =
      try fs.listStatus(p)
      catch { case _: java.io.FileNotFoundException =>
        Array.empty[org.apache.hadoop.fs.FileStatus] }
    entries.foreach { st =>
      val n = st.getPath.getName
      if (!n.startsWith(".") && !n.startsWith("_")) {
        if (st.isDirectory) signListing(fs, st.getPath, sb)
        else sb.append('|').append(st.getPath.toString)
          .append(':').append(st.getLen)
          .append(':').append(st.getModificationTime): Unit
      }
    }
  }

  /** The merged schema `infer` would produce over `roots`, memoized on
    * the roots' current recursive listing. */
  def mergedSchema(s: SparkSession, roots: Seq[String],
                   infer: => StructType): StructType = {
    val sb = new StringBuilder
    roots.sorted.foreach { r =>
      sb.append('#').append(r)
      val p = new Path(r)
      val fs = graft.engine.Fs.of(s.sparkContext.hadoopConfiguration, p)
      if (fs.exists(p)) signListing(fs, p, sb)
    }
    val key = java.util.UUID.nameUUIDFromBytes(
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString
    cache.get(key) match {
      case null =>
        inferCount.incrementAndGet(): Unit
        val schema = infer
        cache.put(key, schema)
        schema
      case hit => hit
    }
  }
}
