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
      // 4 MB suits this engine's many metadata-sized aggregates; large
      // per-task state simply chains pages (and oversize records get
      // dedicated pages), so genuinely big tasks are unaffected.
      .config("spark.buffer.pageSize", sys.env.getOrElse("SPARK_GRAFT_PAGE_SIZE", "4m"))
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
