package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      // the library's SQL surface, via the real static-conf path
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Memory page size for per-task agg/sort buffers (round 22,
      // parameterised): the derived default on a large-heap driver is
      // 64 MB, and RowBasedKeyValueBatch ZEROES one page per task per
      // hash aggregate — executor stack sampling showed page zero-fill
      // as the largest single slice of the export-audit scan tasks.
      // 16 MB balances the two regimes measured on this engine: 4 MB
      // pages shrink the fast hash map enough that wide-value aggregates
      // (q91's shingle/list states) fall back to sort-based aggregation
      // (q91 jobSum 2.1-2.9 s), while 64 MB re-inflates the zero-fill
      // (q118 jobSum 0.9-1.8 s); 16 MB reads best on BOTH (1.4-1.7 /
      // 0.5-0.75). Large per-task state chains pages and oversize
      // records get dedicated pages, so genuinely big tasks still work.
      .config("spark.buffer.pageSize", sys.env.getOrElse("SPARK_GRAFT_PAGE_SIZE", "16m"))
      // Guarded takes (minhashEdges' candidate-id take, the closure
      // operators' edge take) expect to DRAIN a metadata-sized frame:
      // the default limit escalation (scan 1 partition, then 4, 16, ...)
      // turns that one wave into up to 4 sequential jobs per take.
      // Start at the core count; deployments whose takes hit huge frames
      // early keep the escalation win by exporting a lower value.
      .config("spark.sql.limit.initialNumPartitions",
        sys.env.getOrElse("SPARK_GRAFT_LIMIT_INIT_PARTS", cpus))
      // driver-side stats for moderate explicit-path listings (see
      // graft.Bench for the measurement and the storage-tier caveat)
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
        sys.env.getOrElse("SPARK_GRAFT_LIST_PAR_THRESHOLD", "512"))
      // AQE for cached-plan materialization — see graft.Bench; the
      // oracle compare runs under the same conf as the bench so the
      // verified plans ARE the timed plans
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_AQE_CACHE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "var/demo/spark-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // restore the tracked demo-artifact snapshot (if one exists for this
    // sf) so the lazily-built ingest/stream/index artifacts behind
    // q38-q41/q45-q48/q51/q52/q55 don't pay full construction per round
    pipeline.DemoCache.primeFromSnapshot(sfDir): Unit
    new java.io.File(outDir).mkdirs()
    // Subset runs (dev/smoke.sh's pre-snapshot gate): comma-separated
    // query-name prefixes, e.g. SPARK_GRAFT_VERIFY_ONLY=q111,q112.
    // Unset (the driver's path) dumps every registered query.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val selected = only match {
      case Some(prefixes) =>
        SparkEntry.queries.filter { case (n, _) => prefixes.exists(n.startsWith) }
      case None => SparkEntry.queries
    }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // the dump is one pass per query — drop each query's caches so the
      // 70+-query sweep doesn't accumulate corpus-sized storage entries
      queries.QueryCaches.releaseAll()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
