package graft.tools

import org.apache.spark.sql.SparkSession
import graft.queries.ScaleProbe

/** One-kernel slice of [[ScaleStress]]: the embedding near-dup kernel
  * at the x10/x100 tiers only — the dev loop for tuning q49's operating
  * point (occupancy / pre-gate) without paying the full multi-kernel
  * sweep. Prints the same `SCALE {json}` rows. */
object EmbedProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tiers = if (args.isEmpty) Seq("x10" -> "var/scale/x10", "x100" -> "var/scale/x100")
                else args.toSeq.map(t => t -> s"var/scale/$t")
    tiers.foreach { case (tier, dir) =>
      println(s"SCALE ${ScaleProbe.embed(spark, dir, tier).json}")
    }
    spark.stop()
  }
}
