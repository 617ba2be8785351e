package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: per-language accuracy of the q31 guesser at each SF — the
  * measurement behind the q31 self-check floor (see TextOps q31). */
object LangAcc {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfs = if (args.isEmpty) Seq("sf0.001", "sf0.01", "sf0.1") else args.toSeq
    for (sf <- sfs) {
      val d = s"/root/testdata/$sf"
      graft.functions.LangGuessExpr.register(spark, graft.queries.LangModelStore.ensure(spark, d))
      graft.engine.Tables.load(spark, d, "documents")
        .filter(length(col("text")) >= 3)
        .select(col("lang"), expr("lang_guess(text)").as("guessed"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          sum(when(col("guessed") === col("lang"), 1L).otherwise(0L)).as("ok"))
        .collect()
        .sortBy(_.getString(0))
        .foreach(x => println(
          f"ACC $sf ${x.getString(0)} ${x.getLong(2).toDouble / x.getLong(1)}%.4f n=${x.getLong(1)}"))
    }
    spark.stop()
  }
}
