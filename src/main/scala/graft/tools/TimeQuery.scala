package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev-only: time individual SparkEntry queries by name at sf0.1.
  * Usage: sbt "runMain graft.tools.TimeQuery q31_lang_guess q32_minhash_neardup"
  * Each query runs twice (cold, warm) so one-time session warm-up is visible.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "var/demo/spark-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      Seq("cold", "warm").foreach { tag =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        println(f"[time] $name $tag rows=$n $sec%.3f s")
      }
    }
    spark.stop()
  }
}
