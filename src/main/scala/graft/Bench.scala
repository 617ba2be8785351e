package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      // the library's SQL surface, via the real static-conf path
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Pre-build every demo artifact OUTSIDE the timing loop, so
    // q38/q41/q45/q46/q48/q52/q55 time the QUERY, not the one-time
    // construction of demo lakes / bucketed tables / stream checkpoints.
    // The aggregate construction cost is reported separately below.
    val b0 = System.nanoTime()
    pipeline.IngestDemo.ensure(spark, sfDir)
    pipeline.IngestDemo.ensureDayDim(spark, sfDir)
    pipeline.IngestDemo.ensureBucketed(spark, sfDir)
    pipeline.IngestDemo.ensureCatalog(spark, sfDir)
    pipeline.IngestDemo.ensureEvolvedCatalog(spark, sfDir)
    pipeline.StreamDemo.ensure(spark, sfDir)
    pipeline.StreamDemo.ensureHourly(spark, sfDir).count()
    pipeline.StreamDemo.ensureStreamJoin(spark, sfDir).count()
    pipeline.StreamDemo.ensureStreamDedup(spark, sfDir).count()
    pipeline.IvfIndex.ensure(spark, sfDir)
    queries.LangModelStore.ensure(spark, sfDir)
    val buildSec = (System.nanoTime() - b0) / 1e9

    // A failed query must never masquerade as a timing: record per-query
    // errors and exit non-zero so the driver sees a broken bench as broken.
    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failed ::= name
          false
        }
      val sec = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      // release each query's persisted frames: timings stay attributable
      // (no cross-query cache hits) and executor memory stays bounded
      // across the 50+-query loop instead of accumulating 50 caches
      spark.catalog.clearCache()
      name -> sec
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"build_sec":$buildSec,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
