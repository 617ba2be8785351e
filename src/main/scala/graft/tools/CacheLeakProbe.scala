package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe for the x100 rep-growth pathology: run one cache-planting
  * corpus query N times through the exact release cycle Bench uses
  * (QueryCaches.releaseAll + catalog.clearCache + System.gc) and print
  * the JVM's BLOCK-LEVEL storage truth after each cycle — persistent
  * RDD count, MemoryStore bytes, heap in use. If storage bytes climb
  * across reps while the registries report empty, release is not
  * reaching the blocks. */
object CacheLeakProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("var/scale/x100full")
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def report(tag: String): Unit = {
      val sc = spark.sparkContext
      val rdds = sc.getPersistentRDDs
      val storage = sc.getExecutorMemoryStatus.values
        .map { case (max, free) => max - free }.sum
      val rt = Runtime.getRuntime
      println(f"[leak] $tag rdds=${rdds.size} blocksBytes=${storage / 1e9}%.2f GB " +
        f"heapUsed=${(rt.totalMemory - rt.freeMemory) / 1e9}%.2f GB")
      rdds.values.take(3).foreach(r => println(s"[leak]   pinned: ${r.name} ${r.id}"))
    }
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q32_minhash_neardup")(spark, sfDir).count()
      graft.queries.QueryCaches.releaseAll()
      spark.catalog.clearCache()
      val wall = (System.nanoTime() - t0) / 1e9
      System.gc()
      Thread.sleep(2000) // let any async removal land before reading
      report(f"rep$i wall=$wall%.1f")
    }
    spark.stop()
  }
}
