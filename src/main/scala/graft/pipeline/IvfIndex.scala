package graft.pipeline

import java.io.File
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable
import graft.engine.Tables

/** Durable IVF index for the embeddings corpus (q51): a k-means coarse
  * quantizer trained with Lloyd iterations as DataFrame passes, and the
  * corpus written cell-PARTITIONED to parquet. An IVF index is a
  * build-once/query-many artifact in every production vector system —
  * exactly like the bucketed join tables (q48) and the catalog (q41),
  * it is constructed by `ensure` (memoized per JVM, pre-built by Bench
  * outside the timing loop) and only the probe-side work happens at
  * query time. Because the corpus is partitioned by cell, a probe's
  * nprobe-cell lookup reads only those cell directories — the
  * ~nprobe/k scan fraction that makes IVF the second index layout at
  * 100 TB.
  *
  * Deterministic: init = vectors 0..k-1, fixed iteration count, argmax
  * tie-broken toward the lower cell id — centroids are a pure function
  * of the corpus, so q51's output is replayable and VectorSpec's recall
  * bound is stable.
  */
object IvfIndex {
  val K = 16
  private val Iterations = 3
  private val built = mutable.Map.empty[String, (Seq[Array[Float]], String)]

  /** `n` nearest cells of `embedding` (by L2, via the v·c − |c|²/2
    * argmax identity) against driver-resident centroid literals. */
  def cellsOf(cents: Seq[Array[Float]], n: Int): Column = {
    val scored = array(cents.zipWithIndex.map { case (c, j) =>
      val norm2 = c.map(x => x.toDouble * x.toDouble).sum
      struct((call_function("vec_dot", col("embedding"), typedLit(c.toSeq))
        - lit(norm2 / 2)).as("s"), lit(j).as("c"))
    }: _*)
    val best = array_sort(scored, (l, r) =>
      when(l.getField("s") > r.getField("s"), -1)
        .when(l.getField("s") < r.getField("s"), 1)
        .when(l.getField("c") < r.getField("c"), -1).otherwise(1))
    transform(slice(best, 1, n), x => x.getField("c"))
  }

  /** The Hadoop [[FileSystem]] bound to `root`'s scheme — like the
    * MinHash index, the IVF index lives beside the lake (any FS URI the
    * deployment's Hadoop conf binds), so centroid I/O and compaction
    * renames never touch `java.io.File`. */
  private def fsOf(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Trained centroids stored beside the cells (float → exact decimal
    * string round-trips bit-for-bit, so reloaded centroids are
    * identical to the trained ones). */
  def loadCentroids(spark: SparkSession, root: String): Seq[Array[Float]] = {
    val in = fsOf(spark, root).open(new Path(root, "centroids.txt"))
    val txt =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    txt.split("\n").toSeq.map(_.split(",").map(_.toFloat))
  }

  /** Train the coarse quantizer on `e` (vec_id, embedding) and write the
    * index at `root`: cell-partitioned corpus under `cells/`, centroids
    * beside it. Returns the trained centroids. */
  def build(spark: SparkSession, root: String, e: DataFrame): Seq[Array[Float]] = {
    graft.functions.VectorExpressions.register(spark) // cellsOf needs vec_dot
    val dir = s"$root/cells"
    var cents: Seq[Array[Float]] = e.filter(col("vec_id") < K)
      .orderBy("vec_id").collect()
      .map(_.getAs[Seq[Float]]("embedding").toArray)
    for (_ <- 1 to Iterations) {
      cents = e.withColumn("cell", element_at(cellsOf(cents, 1), 1))
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("cell", "pos").agg(avg(col("x").cast("double")).as("m"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell"), expr("transform(pm, p -> cast(p.m as float))").as("c"))
        .orderBy("cell").collect()
        .map(_.getAs[Seq[Float]]("c").toArray)
    }
    e.withColumn("cell", element_at(cellsOf(cents, 1), 1))
      .select(col("vec_id").as("b_id"), col("cell"), col("embedding").as("eb"))
      .write.mode("overwrite").partitionBy("cell").parquet(dir)
    val out = fsOf(spark, root).create(new Path(root, "centroids.txt"), true)
    try out.write(cents.map(_.mkString(",")).mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    cents
  }

  /** Compact the cell store: every [[append]] adds one file per touched
    * cell partition, so the lifecycle between re-trains accumulates
    * small files that probe planning pays for. Content-preserving
    * rewrite to ~one file per cell (`repartition` by the cell column —
    * each cell hashes to one task) behind [[graft.ingest.Staging
    * .compactStore]]'s crash-safe two-rename swap; centroids are
    * untouched, so probe routing is identical. Runs under the index's
    * single-writer discipline. */
  def compact(spark: SparkSession, root: String): Unit =
    graft.ingest.Staging.compactStore(fsOf(spark, root), new Path(root), "cells") { staged =>
      spark.read.parquet(s"$root/cells")
        .repartition(col("cell"))
        .write.partitionBy("cell").parquet(staged.toString)
    }

  /** Insert new vectors into an EXISTING index at `root`: assign each to
    * its nearest TRAINED cell and append to that cell's partition — no
    * re-train, the centroids are immutable after [[build]]. This is the
    * production insert path every IVF deployment runs between periodic
    * re-trains: because probes rank the SAME frozen centroids that
    * route storage, an inserted vector is always found through the cell
    * it was filed under — recall degrades only as far as the data
    * DISTRIBUTION drifts from the trained quantizer (VectorSpec pins
    * recall ≥ 0.9 after a 10% append). Cell partitions only gain files
    * (append-only, like the MinHash index), so concurrent probes are
    * snapshot-safe; appends are single-writer by the same Ledger
    * discipline. */
  def append(spark: SparkSession, root: String, vecs: DataFrame): Unit = {
    graft.functions.VectorExpressions.register(spark) // cellsOf needs vec_dot
    val cents = loadCentroids(spark, root)
    vecs.withColumn("cell", element_at(cellsOf(cents, 1), 1))
      .select(col("vec_id").as("b_id"), col("cell"), col("embedding").as("eb"))
      .write.mode("append").partitionBy("cell")
      .parquet(s"$root/cells")
  }

  /** Build (or return) the index for this corpus: (centroids,
    * cell-partitioned corpus path). The index is durable across JVMs
    * ([[DemoCache]]): the cell-partitioned corpus stays where it was
    * written and the trained centroids are stored beside it, so a warm
    * `var/demo/` dir skips the k-means passes entirely — the
    * build-once/query-many lifecycle a production IVF index has (plus
    * the [[append]] insert path between re-trains). */
  def ensure(spark: SparkSession, sfDir: String): (Seq[Array[Float]], String) =
    synchronized {
      built.getOrElseUpdate(sfDir, {
        val root = DemoCache.root(s"ivf/${new File(sfDir).getName}")
        DemoCache.cached(root, sfDir) {
          build(spark, root.getPath, Tables.load(spark, sfDir, "embeddings")): Unit
        }
        (loadCentroids(spark, root.getPath), new File(root, "cells").getPath)
      })
    }
}
