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
