package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: stage-by-stage wall timings of the q91 recipe's plan
  * boundaries at sf0.1 — materializes each QueryCaches-tracked frame
  * (and the final aggregate) separately so the per-stage cost split is
  * visible. Run after a change to the recipe, before a full bench. */
object RecipeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[recipe-probe] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 3).foreach { rep =>
      timed(s"rep$rep full")(
        graft.SparkEntry.queries("q91_curation_recipe")(spark, sfDir).count())
      graft.queries.QueryCaches.releaseAll()
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
