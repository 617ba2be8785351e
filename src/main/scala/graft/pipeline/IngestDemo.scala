package graft.pipeline

import java.io.File
import java.net.URI
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Builds (once per JVM per scale factor) a complete mini-lake under
  * `target/ingest/<sf>/` by running the full §3.1 pipeline over the
  * generated fixtures, so the q38-q41 CORRECTNESS entries have a real
  * ingest run to interrogate. batchSize=3 forces multiple scheduler
  * ticks (T1) and a multi-append curated lake (exercising the read-side
  * mergeSchema union across drifted and undrifted batches).
  */
object IngestDemo {
  val BatchSize = 3
  private val built = mutable.Map.empty[String, LakeLayout]
  private val catalogued = mutable.Set.empty[String]

  private def deleteRec(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(deleteRec)
    f.delete(): Unit
  }

  /** Run (or reuse) the demo pipeline for this scale factor. */
  def ensure(spark: SparkSession, sfDir: String): LakeLayout = synchronized {
    built.getOrElseUpdate(sfDir, {
      val sfName = new File(sfDir).getName
      val root = new File(s"target/ingest/$sfName").getAbsoluteFile
      deleteRec(root) // stale output from a previous JVM would double-append
      val layout = LakeLayout(root.getPath)
      Fixtures.generateInto(spark, sfDir, layout)
      val bp = new BatchProcessor(spark, layout, Contracts.events, batchSize = BatchSize)
      bp.runUntilDrained()
      layout
    })
  }

  /** Tiny day-dimension parquet for the dynamic-partition-pruning demo
    * (q52): day 1..31 with a peak flag on days 10 and 20. Written as a
    * real file scan (a LocalRelation would constant-fold and bypass DPP). */
  def ensureDayDim(spark: SparkSession, sfDir: String): String = synchronized {
    val layout = ensure(spark, sfDir)
    val path = s"${layout.root}/day_dim"
    if (!new File(path).exists()) {
      import spark.implicits._
      // the filter below must stay a literal comparison (attr = 'peak');
      // a bare boolean column would simplify to an attribute reference,
      // which the DPP rule's selectivity check rejects
      (1 to 31).map(d => (d, if (d == 10 || d == 20) "peak" else "off"))
        .toDF("day", "kind")
        .coalesce(1).write.mode("overwrite").parquet(path)
    }
    path
  }

  /** Bucketed fact tables for the co-located-join demo (q48): orders and
    * lineitem written `bucketBy(8, key).sortBy(key)` into the catalog, so
    * an equi-join on the key needs NO exchange and NO sort — the physical
    * co-location a 100 TB star join is laid out for. Memoized per
    * (JVM, sf); returns the two table names. */
  def ensureBucketed(spark: SparkSession, sfDir: String): (String, String) = synchronized {
    val sfTag = new File(sfDir).getName.replace('.', '_').replace('-', '_')
    val (ot, lt) = (s"bkt_orders_$sfTag", s"bkt_lineitem_$sfTag")
    if (!catalogued.contains(ot)) {
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      val whPath = if (wh.contains(":")) new URI(wh).getPath else wh
      for ((tbl, src, key) <- Seq((ot, "orders", "o_orderkey"), (lt, "lineitem", "l_orderkey"))) {
        spark.sql(s"DROP TABLE IF EXISTS $tbl")
        deleteRec(new File(whPath, tbl.toLowerCase))
        graft.engine.Tables.load(spark, sfDir, src)
          .write.mode("overwrite")
          .bucketBy(8, key).sortBy(key)
          .saveAsTable(tbl)
        catalogued += tbl
      }
    }
    (ot, lt)
  }

  /** Catalog schema evolution on append (psuedo_code.txt:353-363 — the
    * "schema auto-updated by the writer" Glue-Catalog discussion): a
    * registered table's schema is a CATALOG fact, so when a drifted
    * batch arrives the writer must evolve the catalog first
    * (`ALTER TABLE ... ADD COLUMNS`, Spark's public analogue of Glue's
    * updateTable) and then append — `spark.table` consumers see the new
    * column immediately, pre-drift rows read it as NULL, and an append
    * attempted WITHOUT the evolution step is rejected by Spark's
    * schema check (asserted in CatalogEvolutionSpec). The table starts
    * from real curated-lake rows (days 1-2) so the demo covers the
    * reference's actual flow: lake → catalog → drifted append.
    */
  def ensureEvolvedCatalog(spark: SparkSession, sfDir: String): String = synchronized {
    val tbl = "evolved_events_" + new File(sfDir).getName.replace('.', '_').replace('-', '_')
    if (!catalogued.contains(tbl)) {
      val layout = ensure(spark, sfDir)
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      val whPath = if (wh.contains(":")) new URI(wh).getPath else wh
      deleteRec(new File(whPath, tbl.toLowerCase))
      import org.apache.spark.sql.functions.col
      graft.ingest.CuratedWriter.read(spark, layout.curatedDir)
        .filter(col("year") === 2024 && col("month") === 1 && col("day").between(1, 2))
        .select(col("record_id"), col("mode"), col("value"))
        .write.saveAsTable(tbl)
      // drift arrives: evolve the CATALOG schema, then append
      spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (note STRING)")
      import spark.implicits._
      Seq(("evo-1", "training", 1.0, "evolved"), ("evo-2", "eval", 2.5, "evolved"))
        .toDF("record_id", "mode", "value", "note")
        .write.mode("append").saveAsTable(tbl)
      catalogued += tbl
    }
    tbl
  }

  /** S9: register the curated lake in the session catalog via
    * `saveAsTable` (psuedo_code.txt:328-347) — partitioned managed table,
    * so `spark.table(...)` consumers get catalog-driven partition
    * pruning (P9). Returns the table name.
    */
  def ensureCatalog(spark: SparkSession, sfDir: String): String = synchronized {
    val layout = ensure(spark, sfDir)
    val tbl = "curated_events_" + new File(sfDir).getName.replace('.', '_').replace('-', '_')
    if (!catalogued.contains(tbl)) {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      // in-memory catalog forgets tables across JVMs but the warehouse
      // directory survives — clear it so CREATE doesn't trip on leftovers
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      val whPath = if (wh.contains(":")) new URI(wh).getPath else wh
      deleteRec(new File(whPath, tbl.toLowerCase))
      graft.ingest.CuratedWriter.read(spark, layout.curatedDir)
        .write.mode("overwrite")
        .partitionBy(graft.ingest.CuratedWriter.PartitionCols: _*)
        .saveAsTable(tbl)
      catalogued += tbl
    }
    tbl
  }
}
