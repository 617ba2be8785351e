package graft.pipeline

import java.io.File
import java.net.URI
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Builds (once per JVM per scale factor) a complete mini-lake under
  * `var/demo/ingest/<sf>/` by running the full §3.1 pipeline over the
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

  /** Run (or reuse) the demo pipeline for this scale factor. The drained
    * lake is a pure function of the fixtures, so a completed build is
    * reused across JVMs ([[DemoCache]]); a half-drained lake from an
    * interrupted JVM carries no marker and is deleted, so it can never
    * double-append. */
  def ensure(spark: SparkSession, sfDir: String): LakeLayout = synchronized {
    built.getOrElseUpdate(sfDir, {
      val sfName = new File(sfDir).getName
      val root = DemoCache.root(s"ingest/$sfName")
      val layout = LakeLayout(root.getPath)
      DemoCache.cached(root, sfDir) {
        Fixtures.generateInto(spark, sfDir, layout)
        val bp = new BatchProcessor(spark, layout, Contracts.events, batchSize = BatchSize)
        bp.runUntilDrained()
      }
      layout
    })
  }

  private val builtCompact = mutable.Map.empty[String, LakeLayout]

  /** A second demo lake drained with the tick-slot LAKE COMPACTION
    * enabled (`Compactor.maintainTouched` via `lakeCompaction`), for
    * q115: raw shards are keyed by (day, event_id parity) so every
    * curated partition receives exactly TWO single-file appends across
    * two ticks — the second trips the 1-file threshold and the slot
    * rewrites the partition, sorted by event time, while ingest keeps
    * running. The build REQUIRES the post-drain invariants that make
    * compaction safe to interleave with ingest: every leaf holds
    * exactly one data file (the rewrite actually ran, everywhere) and
    * `Rollup.reconcile` is all-green (the partials published before
    * the rewrites still exactly describe the rewritten lake — rollup
    * identity is row content, not file layout). q115's oracle then
    * proves the compacted lake's rows equal a recompute from the
    * original events, so a row lost or doubled by any swap turns the
    * driver row red. */
  def ensureCompacted(spark: SparkSession, sfDir: String): LakeLayout = synchronized {
    builtCompact.getOrElseUpdate(sfDir, {
      import org.apache.spark.sql.functions._
      val sfName = new File(sfDir).getName
      val root = DemoCache.root(s"ingest-compact/$sfName")
      val layout = LakeLayout(root.getPath)
      DemoCache.cached(root, sfDir) {
        val ev = graft.engine.Tables.load(spark, sfDir, "events")
          .filter(year(col("ts")) === 2024 && month(col("ts")) === 1 &&
            dayofmonth(col("ts")).between(10, 16))
        ev.withColumn("shard", concat(lit("d"), dayofmonth(col("ts")),
            lit("p"), pmod(col("event_id"), lit(2))))
          .select(col("shard"), to_json(struct(
            concat(lit("e-"), col("event_id")).as("id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("event_timestamp"),
            col("event_type").as("MODE"),
            struct(
              concat(lit("1."), pmod(col("user_id"), lit(5)), lit(".0")).as("app_version"),
              concat(lit("ua-"), pmod(col("user_id"), lit(7))).as("user_agent"),
              col("user_id").as("user_id")).as("metadata"),
            struct(
              concat(lit("t-"), col("event_id")).as("transaction_id"),
              col("value").as("value"),
              col("props").as("props")).as("payload"))).as("value"))
          // one text file per (day, parity) shard: repartition by the
          // shard key gives each dir exactly one writing task
          .repartition(col("shard"))
          .write.mode("overwrite").partitionBy("shard")
          .text(s"${layout.rawDir}/good")
        val bp = new BatchProcessor(spark, layout, Contracts.events, batchSize = 1,
          lakeCompaction = Some(graft.ingest.Compactor.TickConfig(
            maxFilesPerPartition = 1, sortCol = Some("event_time_utc"))))
        bp.runUntilDrained()
        // the drain's final swaps leave their replaced files pending
        // deletion (the reader-safe grace cycle); this lake is a frozen
        // fixture with no future ticks, so run the deferred deletion
        // explicitly before pinning the physical-layout invariants
        graft.ingest.Compactor.sweepRetired(spark, layout.curatedDir): Unit
        // every leaf must be exactly one file: proof the slot compacted
        // each partition after its second append
        val leaves = mutable.ArrayBuffer.empty[File]
        def walk(d: File): Unit = {
          val kids = Option(d.listFiles()).toSeq.flatten
          val subs = kids.filter(f => f.isDirectory &&
            !f.getName.startsWith("_") && !f.getName.startsWith("."))
          if (subs.isEmpty) leaves += d else subs.foreach(walk)
        }
        walk(new File(layout.curatedDir))
        leaves.foreach { leaf =>
          val n = Option(leaf.listFiles()).toSeq.flatten.count(f =>
            f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
          require(n == 1, s"compaction demo: leaf $leaf holds $n files, expected 1")
        }
        require(leaves.nonEmpty, "compaction demo: empty curated lake")
        // q116's sorted_ok=1 is a data-dependent outcome of "every cell
        // got appends from both parities" — ENFORCE the guarantee it
        // pins at build time instead of trusting the generator: every
        // (day, mode) leaf's single file must be internally event-time
        // sorted (parquet row order via _metadata.row_index, the same
        // evidence q116 reads), so a parity-starved never-compacted cell
        // fails the build here, not the oracle later
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("fp").orderBy("ri")
        val unsorted = graft.ingest.CuratedWriter.read(spark, layout.curatedDir)
          .select(col("event_time_utc"),
            col("_metadata.file_path").as("fp"), col("_metadata.row_index").as("ri"))
          .withColumn("prev",
            org.apache.spark.sql.functions.lag(col("event_time_utc"), 1)
              .over(w))
          .filter(col("prev").isNotNull && col("prev") > col("event_time_utc"))
          .count()
        require(unsorted == 0,
          s"compaction demo: $unsorted out-of-order rows — a leaf escaped the sorting rewrite")
        // the rollup chain must survive the rewrites exactly
        val flags = graft.ingest.Rollup
          .reconcile(spark, layout.curatedDir, layout.rollupDir)
          .select("rows_match", "value_match", "value_e6_match", "files_match", "reach_ok")
          .collect()
        require(flags.nonEmpty &&
          flags.forall(r => (0 until 5).forall(i => r.getInt(i) == 1)),
          "compaction demo: rollup reconcile diverged after lake compaction")
      }
      layout
    })
  }

  private val builtCluster = mutable.Map.empty[String, LakeLayout]

  /** A third demo lake whose maintenance compaction CLUSTERS instead of
    * time-sorting (`Compactor` with `clusterCols = (event_time_utc,
    * user_id)` → [[graft.ingest.ZCluster]]), for q127: the same
    * days-10-16 events slice as [[ensureCompacted]], written as FOUR
    * direct appends per curated partition (each spanning the full
    * user_id range — the layout ingest naturally produces, where
    * user-window queries can prune nothing at file grain), then
    * compacted along the interleaved z-curve so every output file
    * covers a NARROW slice of both time and user space. Bounds and
    * partials are published exactly as the pipeline would
    * (`FileBounds.compute` per append; `Rollup.writePartials` once),
    * so the post-swap store is maintained by the same
    * `writeSwapBatch` path production compaction uses. Build-time
    * requires pin the invariants q127's oracle then interrogates:
    * every leaf rewritten to generation 1, the bounds store serving
    * ONLY sw1- rows, full per-column coverage, and rollup reconcile
    * green (row content untouched by the z-layout). */
  def ensureClustered(spark: SparkSession, sfDir: String): LakeLayout = synchronized {
    builtCluster.getOrElseUpdate(sfDir, {
      import org.apache.spark.sql.functions._
      val sfName = new File(sfDir).getName
      val root = DemoCache.root(s"ingest-cluster/$sfName")
      val layout = LakeLayout(root.getPath)
      DemoCache.cached(root, sfDir) {
        val base = graft.engine.Tables.load(spark, sfDir, "events")
          .filter(year(col("ts")) === 2024 && month(col("ts")) === 1 &&
            dayofmonth(col("ts")).between(10, 16))
          .select(
            concat(lit("e-"), col("event_id")).as("record_id"),
            concat(lit("seed-"), pmod(col("event_id"), lit(4))).as("source_file"),
            col("user_id"),
            col("value"),
            col("ts").cast("timestamp_ntz").as("event_time_utc"),
            year(col("ts")).as("year"), month(col("ts")).as("month"),
            dayofmonth(col("ts")).as("day"), col("event_type").as("mode"),
            pmod(col("event_id"), lit(4)).as("seed"))
        // four appends, each one file per leaf (repartition by the
        // partition values gives each leaf's rows to exactly one task),
        // each spanning the leaf's FULL user range — the pre-compaction
        // worst case for user-window file pruning
        for (p <- 0 until 4)
          base.filter(col("seed") === p).drop("seed")
            .repartition(col("year"), col("month"), col("day"), col("mode"))
            .write.mode("append")
            .partitionBy("year", "month", "day", "mode")
            .parquet(layout.curatedDir)
        // one bounds publish over all four appends (file names are
        // unique per append, so one batch covers the whole pre-swap
        // listing) and one partials publish — the swap batches the
        // compactor writes below then maintain both stores exactly as
        // production ticks would
        graft.ingest.FileBounds.writeStaged(
          spark.read.parquet(layout.curatedDir)
            .select(col("*"), col("_metadata")), "",
          s"${layout.fileBoundsDir}/b0")
        graft.ingest.Rollup.writePartials(
          spark.read.parquet(layout.curatedDir), s"${layout.rollupDir}/b0")
        val report = graft.ingest.Compactor.compact(spark, layout.curatedDir,
          maxFilesPerPartition = 1, targetBytesPerFile = 16L * 1024,
          parallelism = 4, sortCol = Some("event_time_utc"),
          clusterCols = Seq("event_time_utc", "user_id"))
        require(report.partitionsCompacted > 0, "cluster demo: nothing compacted")
        graft.ingest.Compactor.sweepRetired(spark, layout.curatedDir): Unit
        // the bounds store's live view must contain the rewritten
        // generation, and the per-partition coverage proof below must
        // hold EVERYWHERE — coverage is what catches an un-tombstoned
        // replaced file (its rows would double-count the partition).
        // (A tiny leaf that received only one append never compacts
        // and legitimately keeps its original rows, so "all sw1-"
        // would be too strict at small scale factors.)
        val live = graft.ingest.FileBounds.all(spark, layout.fileBoundsDir)
          .select("data_file").collect().map(_.getString(0))
        require(live.exists(_.startsWith("sw1-")),
          s"cluster demo: no rewritten-generation bounds rows: ${live.take(5).toSeq}")
        val zones = graft.ingest.FileBounds.partitionZones(spark,
          layout.fileBoundsDir, layout.rollupDir, Seq("user_id")).collect()
        require(zones.nonEmpty && zones.forall(_.getAs[Boolean]("covered_user_id")),
          "cluster demo: user_id coverage broke across the clustered swap")
        val flags = graft.ingest.Rollup
          .reconcile(spark, layout.curatedDir, layout.rollupDir)
          .select("rows_match", "value_match", "value_e6_match", "reach_ok")
          .collect()
        require(flags.nonEmpty &&
          flags.forall(r => (0 until 4).forall(i => r.getInt(i) == 1)),
          "cluster demo: rollup reconcile diverged after clustered compaction")
      }
      layout
    })
  }

  private val builtBloom = mutable.Map.empty[String, LakeLayout]

  /** A fourth demo lake whose bounds sidecar carries per-file BLOOM
    * FILTERS (q129): the days-10-16 events slice with a hash-shaped
    * `lookup_key` column (a Knuth-multiplicative scramble of event_id,
    * so the key order is UNCORRELATED with the lake's time layout —
    * the UUID-lookup shape where every file's [min, max] window spans
    * essentially the whole key space and range-based file pruning is
    * structurally useless). Written as FOUR direct appends per leaf
    * like [[ensureClustered]]'s pre-compaction state, bounds published
    * once with `blooms = lookup_key`
    * ([[graft.ingest.FileBounds.bfCol]]), so a point/IN probe on the
    * key drops files whose filters reject every probed value — the
    * membership complement of the zone windows. The parquet files also
    * carry NATIVE parquet bloom filters on the column (writer option),
    * so the files a false positive keeps still row-group-skip inside
    * the scan. Build-time requires pin what q129 then interrogates:
    * every live sidecar row carries a filter and every leaf is
    * lookup_key-covered. */
  def ensureBloomed(spark: SparkSession, sfDir: String): LakeLayout = synchronized {
    builtBloom.getOrElseUpdate(sfDir, {
      import org.apache.spark.sql.functions._
      val sfName = new File(sfDir).getName
      val root = DemoCache.root(s"ingest-bloom/$sfName")
      val layout = LakeLayout(root.getPath)
      DemoCache.cached(root, sfDir) {
        val base = graft.engine.Tables.load(spark, sfDir, "events")
          .filter(year(col("ts")) === 2024 && month(col("ts")) === 1 &&
            dayofmonth(col("ts")).between(10, 16))
          .select(
            concat(lit("e-"), col("event_id")).as("record_id"),
            concat(lit("seed-"), pmod(col("event_id"), lit(4))).as("source_file"),
            col("user_id"),
            // the hash-shaped id: multiplier and modulus are both
            // DuckDB-exact integer arithmetic (no overflow below
            // event_id ~3.4e9), so the oracle recomputes the key
            // bit-for-bit from the original events
            concat(lit("k-"),
              (col("event_id") * lit(2654435761L)) % lit(1000000007L))
              .as("lookup_key"),
            col("value"),
            col("ts").cast("timestamp_ntz").as("event_time_utc"),
            year(col("ts")).as("year"), month(col("ts")).as("month"),
            dayofmonth(col("ts")).as("day"), col("event_type").as("mode"),
            pmod(col("event_id"), lit(4)).as("seed"))
        for (p <- 0 until 4)
          base.filter(col("seed") === p).drop("seed")
            .repartition(col("year"), col("month"), col("day"), col("mode"))
            .write.mode("append")
            // native parquet blooms ride the data files themselves —
            // row-group skipping inside whatever the sidecar keeps
            .option("parquet.bloom.filter.enabled#lookup_key", "true")
            .option("parquet.bloom.filter.expected.ndv#lookup_key", "100000")
            .partitionBy("year", "month", "day", "mode")
            .parquet(layout.curatedDir)
        graft.ingest.FileBounds.writeStaged(
          spark.read.parquet(layout.curatedDir)
            .select(col("*"), col("_metadata")), "",
          s"${layout.fileBoundsDir}/b0",
          blooms = Seq("lookup_key"),
          // demo-sized filters: ~1.2 KB at 1% over these file grains
          bloomExpectedItems = 8192, bloomFpp = 0.01)
        graft.ingest.Rollup.writePartials(
          spark.read.parquet(layout.curatedDir), s"${layout.rollupDir}/b0")
        val fb = graft.ingest.FileBounds.all(spark, layout.fileBoundsDir)
        require(fb.columns.contains(graft.ingest.FileBounds.bfCol("lookup_key")),
          "bloom demo: sidecar carries no bf_lookup_key column")
        val missing = fb.filter(
          col(graft.ingest.FileBounds.bfCol("lookup_key")).isNull).count()
        require(missing == 0, s"bloom demo: $missing sidecar rows lack a filter")
        val zones = graft.ingest.FileBounds.partitionZones(spark,
          layout.fileBoundsDir, layout.rollupDir, Seq("lookup_key")).collect()
        require(zones.nonEmpty && zones.forall(_.getAs[Boolean]("covered_lookup_key")),
          "bloom demo: lookup_key coverage incomplete")
      }
      layout
    })
  }

  /** The bloom lake plus an ENGINEERED, published predicate history —
    * q130's fixture (round 20). A fixed mix of membership probes on the
    * hash-shaped `lookup_key` (6 point + 1 three-literal IN), window
    * probes on `event_time_utc` (4) and `value` (3), and nullness
    * probes on `user_id` (2) is classified straight off each plan
    * ([[graft.monitor.PredicateStats.extract]] — no execution needed,
    * the optimized plan is available lazily) and published as ONE
    * token-keyed predstats batch. The token doubles as the idempotence
    * marker: re-invocations (bench reps, verify + bench in one JVM) see
    * the batch dir and publish nothing, so the history counts — which
    * the q130 oracle pins as literals — never inflate. */
  def ensureAdvisorHistory(spark: SparkSession, sfDir: String): LakeLayout =
    synchronized {
      import org.apache.spark.sql.functions._
      val lay = ensureBloomed(spark, sfDir)
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new org.apache.hadoop.fs.Path(lay.root).toUri,
        spark.sparkContext.hadoopConfiguration)
      val store = new org.apache.hadoop.fs.Path(
        graft.monitor.PredicateStats.storeDir(lay.root))
      // versioned marker: a history published by an older builder is
      // REPLACED wholesale (history() SUMS batches, so leaving a stale
      // batch beside a new one would inflate the oracle-pinned counts)
      val marker = new org.apache.hadoop.fs.Path(store, "_GRAFT_ADVDEMO_v2")
      if (fs.exists(marker)) return lay
      fs.delete(store, true)
      val lake = spark.read.parquet(lay.curatedDir)
      val events = scala.collection.mutable.ArrayBuffer
        .empty[graft.monitor.PredicateEvent]
      def observe(df: org.apache.spark.sql.DataFrame): Unit =
        events ++= graft.monitor.PredicateStats.extract(df.queryExecution)
      // probe keys sit MID-RANGE ("k-5<i>" sorts inside [k-1…, k-9…]
      // at every scale factor): a below-window key would let the zone
      // rules prune the plan to a statically-empty relation, and
      // PropagateEmptyRelation folds the Filter away — no event, and
      // the oracle-pinned counts would drift with sf (the k-0 lesson)
      (0 until 6).foreach(i =>
        observe(lake.filter(col("lookup_key") === s"k-5$i")))
      observe(lake.filter(col("lookup_key").isin("k-51", "k-52", "k-53")))
      (0 until 4).foreach(i => observe(lake.filter(
        col("event_time_utc") >=
          lit(s"2024-01-1$i 00:00:00").cast("timestamp_ntz"))))
      (0 until 3).foreach(i =>
        observe(lake.filter(col("value") > lit(0.25 * i))))
      (0 until 2).foreach(_ =>
        observe(lake.filter(col("user_id").isNotNull)))
      require(graft.monitor.PredicateStats.publish(
        spark, lay.root, events.toSeq, "demo-history"),
        "advisor demo: no predicates extracted from the engineered history")
      fs.create(marker, true).close()
      lay
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

  private def warehousePath(spark: SparkSession): String = {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    if (wh.contains(":")) new URI(wh).getPath else wh
  }

  // table DDL captured at build time so warm JVMs re-register without a
  // schema-inference read over the data files
  private def writeDdl(memo: File, tbl: String, ddl: String): Unit =
    java.nio.file.Files.write(new File(memo, s"$tbl.ddl").toPath,
      ddl.getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
  private def readDdl(memo: File, tbl: String): String =
    new String(java.nio.file.Files.readAllBytes(new File(memo, s"$tbl.ddl").toPath),
      java.nio.charset.StandardCharsets.UTF_8)

  /** Bucketed fact tables for the co-located-join demo (q48): orders and
    * lineitem written `bucketBy(8, key).sortBy(key)` into the catalog, so
    * an equi-join on the key needs NO exchange and NO sort — the physical
    * co-location a 100 TB star join is laid out for. The FILES survive
    * across JVMs ([[DemoCache]]); the in-memory catalog does not, so a
    * warm JVM re-registers them as external tables over the same bucketed
    * layout (`CREATE TABLE ... CLUSTERED BY ... LOCATION`) instead of
    * rewriting the data. Returns the two table names. */
  def ensureBucketed(spark: SparkSession, sfDir: String): (String, String) = synchronized {
    val sfTag = new File(sfDir).getName.replace('.', '_').replace('-', '_')
    val (ot, lt) = (s"bkt_orders_$sfTag", s"bkt_lineitem_$sfTag")
    if (!catalogued.contains(ot)) {
      val whPath = warehousePath(spark)
      val memo = new File(warehousePath(spark), s"_graft_memo/bucketed_$sfTag").getAbsoluteFile
      DemoCache.cached(memo, sfDir) {
        for ((tbl, src, key) <- Seq((ot, "orders", "o_orderkey"), (lt, "lineitem", "l_orderkey"))) {
          spark.sql(s"DROP TABLE IF EXISTS $tbl")
          deleteRec(new File(whPath, tbl.toLowerCase))
          graft.engine.Tables.load(spark, sfDir, src)
            .write.mode("overwrite")
            .bucketBy(8, key).sortBy(key)
            .saveAsTable(tbl)
          memo.mkdirs()
          writeDdl(memo, tbl, spark.table(tbl).schema.toDDL)
        }
      }
      for ((tbl, key) <- Seq((ot, "o_orderkey"), (lt, "l_orderkey"))) {
        if (!spark.catalog.tableExists(tbl)) {
          val loc = new File(whPath, tbl.toLowerCase).getAbsolutePath
          spark.sql(s"CREATE TABLE $tbl (${readDdl(memo, tbl)}) USING parquet " +
            s"CLUSTERED BY ($key) SORTED BY ($key) INTO 8 BUCKETS LOCATION '$loc'")
        }
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
    val sfTag = new File(sfDir).getName.replace('.', '_').replace('-', '_')
    val tbl = "evolved_events_" + sfTag
    if (!catalogued.contains(tbl)) {
      val whPath = warehousePath(spark)
      val loc = new File(whPath, tbl.toLowerCase).getAbsolutePath
      val memo = new File(warehousePath(spark), s"_graft_memo/evolved_$sfTag").getAbsoluteFile
      DemoCache.cached(memo, sfDir) {
        val layout = ensure(spark, sfDir)
        spark.sql(s"DROP TABLE IF EXISTS $tbl")
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
        memo.mkdirs()
        writeDdl(memo, tbl, spark.table(tbl).schema.toDDL)
      }
      if (!spark.catalog.tableExists(tbl)) {
        // warm JVM: files survived, catalog didn't — re-register over the
        // EVOLVED schema (pre-drift files read `note` as NULL, exactly as
        // the evolved catalog serves them)
        spark.sql(s"CREATE TABLE $tbl (${readDdl(memo, tbl)}) USING parquet LOCATION '$loc'")
      }
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
    val sfTag = new File(sfDir).getName.replace('.', '_').replace('-', '_')
    val tbl = "curated_events_" + sfTag
    if (!catalogued.contains(tbl)) {
      val whPath = warehousePath(spark)
      val loc = new File(whPath, tbl.toLowerCase).getAbsolutePath
      val memo = new File(warehousePath(spark), s"_graft_memo/catalog_$sfTag").getAbsoluteFile
      DemoCache.cached(memo, sfDir) {
        val layout = ensure(spark, sfDir)
        spark.sql(s"DROP TABLE IF EXISTS $tbl")
        // in-memory catalog forgets tables across JVMs but the warehouse
        // directory survives — clear it so CREATE doesn't trip on leftovers
        deleteRec(new File(whPath, tbl.toLowerCase))
        graft.ingest.CuratedWriter.read(spark, layout.curatedDir)
          .write.mode("overwrite")
          .partitionBy(graft.ingest.CuratedWriter.PartitionCols: _*)
          .saveAsTable(tbl)
        memo.mkdirs()
        writeDdl(memo, tbl, spark.table(tbl).schema.toDDL)
      }
      if (!spark.catalog.tableExists(tbl)) {
        // warm JVM: re-register the surviving partitioned layout as an
        // external table, then recover its partitions into the catalog so
        // catalog-driven pruning (q41) works exactly as on the cold path
        val parts = graft.ingest.CuratedWriter.PartitionCols
        spark.sql(s"CREATE TABLE $tbl (${readDdl(memo, tbl)}) USING parquet " +
          s"PARTITIONED BY (${parts.mkString(", ")}) LOCATION '$loc'")
        spark.sql(s"MSCK REPAIR TABLE $tbl")
      }
      catalogued += tbl
    }
    tbl
  }
}
