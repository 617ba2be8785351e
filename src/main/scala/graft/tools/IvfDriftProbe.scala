package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: inspect the IVF drift-retrain lifecycle — cell occupancy
  * histograms and per-probe-set recall before/after retrain. */
object IvfDriftProbe {
  def main(args: Array[String]): Unit = {
    val sf = "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.IvfIndex
    val e = graft.engine.Tables.load(spark, sf, "embeddings")
    val root = java.nio.file.Files.createTempDirectory("ivf-drift-probe").toFile
    IvfIndex.build(spark, root.getPath, e)
    val cellsDir = new java.io.File(root, "cells").getPath
    def hist(tag: String): Unit = {
      val h = spark.read.parquet(cellsDir).groupBy("cell").count()
        .orderBy("cell").collect().map(r => s"${r.get(0)}:${r.get(1)}").mkString(" ")
      System.err.println(s"[ivf-probe] $tag cells: $h")
    }
    hist("build")
    val offset = 1000000L
    val drifted = e.filter(col("vec_id") % 5 === 0)
      .select((col("vec_id") + offset).as("vec_id"),
        expr("transform(embedding, x -> CAST(x + 0.5 AS FLOAT))").as("embedding"))
    IvfIndex.append(spark, root.getPath, drifted)
    hist("appended")
    System.err.println(s"[ivf-probe] drift ratio: ${IvfIndex.driftRatio(spark, root.getPath)}")
    IvfIndex.retrain(spark, root.getPath)
    hist("retrained")
    System.err.println(s"[ivf-probe] post ratio: ${IvfIndex.driftRatio(spark, root.getPath)}")
    // where did the displaced rows land?
    val mix = spark.read.parquet(cellsDir)
      .groupBy("cell").agg(
        sum(when(col("b_id") >= offset, 1).otherwise(0)).as("n_drift"),
        count(lit(1)).as("n"))
      .orderBy("cell").collect()
      .map(r => s"${r.get(0)}:${r.get(1)}/${r.get(2)}").mkString(" ")
    System.err.println(s"[ivf-probe] drift-mix (cell:drift/total): $mix")
    spark.stop()
  }
}
