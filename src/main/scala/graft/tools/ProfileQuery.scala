package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only: profile individual SparkEntry queries under the EXACT
  * bench session (extensions + shuffle partitions + warehouse), split
  * into driver/planning time vs Spark job time. For each query: one
  * cold run, then `SPARK_GRAFT_PROFILE_REPS` (default 3) warm runs;
  * per run prints total wall, the sum of job wall-clock, per-job
  * (duration, stages, tasks) and the residue (= wall − jobs ≈ analysis
  * + optimization + driver work between jobs). The bench's cache
  * hygiene (QueryCaches.releaseAll + clearCache) runs between reps so
  * numbers match Bench's attribution.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... java -cp ... graft.tools.ProfileQuery q119_valuerange_skip
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "3").toInt
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", classOf[graft.GraftExtensions].getName)
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
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
        sys.env.getOrElse("SPARK_GRAFT_LIST_PAR_THRESHOLD", "512"))
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_AQE_CACHE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "var/demo/spark-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // per-job wall + task counts, reset per run
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, String, Int)]()
    val stageTasks = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        jobs.put(js.jobId, (js.time, -1L, site, js.stageInfos.map(_.numTasks).sum)): Unit
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val cur = jobs.getOrDefault(je.jobId, (je.time, -1L, "?", 0))
        jobs.put(je.jobId, (cur._1, je.time, cur._3, cur._4)): Unit
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stageTasks.addAndGet(sc.stageInfo.numTasks): Unit
    })

    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (0 to reps).foreach { rep =>
        jobs.clear()
        stageTasks.set(0)
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        graft.queries.QueryCaches.releaseAll()
        spark.catalog.clearCache()
        // let listener events drain so per-job numbers are complete
        // (listenerBus is private[spark]; a short sleep suffices for a
        // dev profiler)
        Thread.sleep(200)
        import scala.jdk.CollectionConverters._
        val done = jobs.asScala.toSeq.sortBy(_._1)
          .collect { case (id, (s, e, site, nt)) if e >= 0 =>
            (id, (e - s) / 1e3, site, nt) }
        val jobSum = done.map(_._2).sum
        val tag = if (rep == 0) "cold" else s"warm$rep"
        println(f"[prof] $name $tag rows=$n wall=$wall%.3f jobs=${done.size} " +
          f"jobSum=$jobSum%.3f residue=${wall - jobSum}%.3f tasks=${stageTasks.get}")
        if (sys.env.contains("SPARK_GRAFT_PROFILE_JOBS"))
          done.foreach { case (id, d, site, nt) =>
            println(f"[prof]   job#$id $d%.3f s tasks=$nt $site") }
        System.gc()
      }
    }
    spark.stop()
  }
}
