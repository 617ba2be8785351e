package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage-level attribution for q49 at sf0.1 (internals copied
  * from VectorOps — keep in sync when profiling). */
object ProfileQ49 {
  private val Tables_ = 8
  private def hyperplane(t: Int, j: Int, dim: Int): Seq[Float] =
    (0 until dim).map { i =>
      var h = t * 0x9E3779B1 + j * 0x85EBCA77 + i * 0xC2B2AE3D
      h ^= h >>> 16; h *= 0x85EBCA6B; h ^= h >>> 13; h *= 0xC2B2AE35; h ^= h >>> 16
      if ((h & 1) == 0) 1.0f else -1.0f
    }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name ${(System.nanoTime() - t0) / 1e9}%.3f s -> $r"); r
    }
    (1 to 2).foreach { rnd =>
      println(s"[prof] ---- round $rnd ----")
      graft.functions.VectorExpressions.register(spark)
      val e = graft.engine.Tables.load(spark, d, "embeddings")
      val bits = 5
      val dim = 64
      val buckets = e.withColumn("codes",
        array((0 until Tables_).map { tt =>
          (0 until bits).map { j =>
            when(call_function("vec_dot", col("embedding"),
              typedLit(hyperplane(tt, j, dim))) > 0.0, lit(1L << j)).otherwise(lit(0L))
          }.reduce(_ + _)
        }: _*))
        .select(col("vec_id"), posexplode(col("codes")).as(Seq("t", "code")))
        .persist()
      t("buckets")(buckets.count())
      if (rnd == 2) buckets.explain("formatted")
      val mp = expr(s"array_union(array(code), transform(sequence(0, ${bits - 1}), " +
        "j -> code ^ shiftleft(1L, j)))")
      val left = buckets.select(col("vec_id").as("a_id"), col("t"), explode(mp).as("code"))
      t("left")(left.count())
      val joined = left
        .join(buckets.select(col("vec_id").as("b_id"), col("t"), col("code")), Seq("t", "code"))
        .filter(col("a_id") < col("b_id"))
      t("join_out")(joined.count())
      val cands = joined.select("a_id", "b_id").distinct().persist()
      t("cands")(cands.count())
      val verified = cands
        .join(e.select(col("vec_id").as("a_id"), col("embedding").as("ea")), Seq("a_id"))
        .join(e.select(col("vec_id").as("b_id"), col("embedding").as("eb")), Seq("b_id"))
        .withColumn("cos_e6",
          round(expr("vec_dot(ea, eb) / (sqrt(vec_dot(ea, ea)) * sqrt(vec_dot(eb, eb)))")
            * lit(1000000.0)).cast("long"))
        .filter(col("cos_e6") >= 450000)
      t("verify")(verified.count())
      t("sorted")(verified.select("a_id", "b_id", "cos_e6").orderBy("a_id", "b_id").count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
