package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev-only: print a SparkEntry query's full result (schema + rows).
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ShowQuery q90_dedup_dlq_audit"
  */
object ShowQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
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
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      println(s"=== $name ===")
      df.printSchema()
      df.show(200, false)
    }
    spark.stop()
  }
}
