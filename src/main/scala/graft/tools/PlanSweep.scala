package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev-loop probe: dump which SparkEntry queries plan a CartesianProduct
  * or BroadcastNestedLoopJoin, and which plan a BroadcastHashJoin, at a
  * given sf. Calibrates PlanContractSpec's whitelist; not driver-run. */
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "var/demo/spark-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.pipeline.DemoCache.primeFromSnapshot(sfDir): Unit
    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      try {
        val plan = SparkEntry.runAndRelease(spark, sfDir, name) { df =>
          df.queryExecution.executedPlan.toString
        }
        val cart = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoopJoin")
        val bhj = plan.contains("BroadcastHashJoin")
        val nex = "(?<!Broadcast)Exchange".r.findAllIn(plan).size
        println(s"[plansweep] $name cartesian=$cart bnlj=$bnlj bhj=$bhj shuffles=$nex")
      } catch {
        case e: Throwable =>
          println(s"[plansweep] $name ERROR ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
