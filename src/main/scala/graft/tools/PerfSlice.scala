package graft.queries
// (lives beside the tools mains; declared in graft.queries for access
// to the private[queries] kernel pieces)

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage timer for the q49 kernel at a given tier: times the
  * collision enumeration, the gated stream, the distinct, and the full
  * query separately so operating-point work targets the real cost. */
object PerfSlice {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("var/scale/x100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.engine.Tables.load(spark, dir, "embeddings")
    val n = e.count()
    def time(tag: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[slice] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
      QueryCaches.releaseAll()
      spark.catalog.clearCache()
      System.gc()
    }
    graft.functions.VectorExpressions.register(spark)
    val table = graft.functions.CosByIdExpr.build(e.select("vec_id", "embedding"))
    graft.functions.CosByIdExpr.register(spark, table)
    graft.functions.QuantCosByIdExpr.register(spark,
      graft.functions.QuantCosByIdExpr.buildFrom(table))
    for (_ <- 0 until 2) {
      time("enumerate")(VectorOps.lshSelfCollisions(e, n).count())
      time("enumerate+gate")(VectorOps.lshSelfCollisions(e, n)
        .filter(expr("qcos_by_id(a_id, b_id)") >= 380000L).count())
      time("full_q49")(VectorOps.embedNeardupPairs(spark, e).count())
    }
    spark.stop()
  }
}
