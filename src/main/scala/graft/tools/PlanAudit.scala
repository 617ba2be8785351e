package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev-only: prints the formatted physical plan of named queries so the
  * scan-level facts (PushedFilters, ReadSchema, broadcast choice) can be
  * audited after every change. Usage: runMain graft.tools.PlanAudit q01 q06
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "var/demo/spark-warehouse")
      // same extensions as Verify/Bench so audited plans are the
      // production plans (incl. the rollup metadata-aggregate rewrite)
      .config("spark.sql.extensions", classOf[graft.GraftExtensions].getName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val wanted = if (args.isEmpty) graft.SparkEntry.queries.keys.toSeq.sorted else args.toSeq
    wanted.foreach { prefix =>
      graft.SparkEntry.queries.filter(_._1.startsWith(prefix)).toSeq.sortBy(_._1).foreach {
        case (name, fn) =>
          println(s"===== $name =====")
          fn(spark, sf).explain("formatted")
      }
    }
    spark.stop()
  }
}
