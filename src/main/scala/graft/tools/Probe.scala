package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev-only smoke: drives SparkEntry.entry exactly as the driver does. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    df.show(10, false)
    println(s"entry rows=${df.count()}")
    df.explain("formatted")
    spark.stop()
  }
}
