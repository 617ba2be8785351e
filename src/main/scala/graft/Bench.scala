package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Per query: one COLD run (first execution in this JVM
  * — pays Janino codegen + JIT) then `SPARK_GRAFT_BENCH_REPS` (default
  * 3) timed WARM runs; the regression signal is the warm MEDIAN, which
  * round-6 analysis showed is stable where single cold samples swung
  * 3-5× on unchanged code. The cache is cleared between every run so
  * timings stay attributable (no cross-query or cross-rep cache hits).
  *
  * Output: human-readable `[bench]` progress lines on stderr, then
  * THREE JSON lines on stdout — `cold_detail`, `noise_detail`
  * (per-query warm MIN + the median rep's process-CPU/wall "effective
  * cores", the co-tenant-interference diagnostics), and LAST the
  * contract line — totals first (`value` = sum of warm medians,
  * `total_cold`/`total_warm_min` beside it), then the per-query warm
  * medians, all rounded to ms so the line survives a truncated log
  * tail.
  *
  * Demo artifacts are built OUTSIDE the timing loop and memoized across
  * JVMs (pipeline/DemoCache.scala) — warm `var/demo/`, or the tracked
  * `assets/demo-<sf>.tgz` snapshot on a wiped workspace — so
  * `build_sec` is seconds, not the 50-75 s full construction.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default = the driver's benched configuration (local[32], the
    // documented contract) — a 4-core default silently recorded 4-core
    // timings for any env-less local reproduction
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // Optional subset run (the x100 corpus-bench row): comma-separated
    // query-name prefixes, e.g. SPARK_GRAFT_BENCH_ONLY=q26,q32,q49.
    // Unset = the full contract sweep. Artifact pre-builds below are
    // skipped when no selected query needs them.
    val only: Option[Seq[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    def selected(name: String): Boolean = only.forall(_.exists(name.startsWith))
    // Machine-checkable noise control (round-14 brief #2): three
    // TPC-H-shaped queries whose code has not changed since round 7,
    // with their r12 clean-room sf0.1 warm medians pinned as the
    // baseline. control_ratio = (this run's control sum) / 0.945 — ≈1.0
    // on a quiet machine; a uniform elevation (r13 measured 1.27 on
    // these untouched queries) marks the artifact as
    // environment-inflated, and a reader divides it out before calling
    // any cross-round delta a regression (README §bench). Defined for
    // any run that executed all three controls over the sf0.1 relational
    // BYTES — which includes the x10full/x100full corpus tiers, whose
    // relational tables are symlinks into sf0.1 (ScaleStress assembles
    // them that way). -1 only when the relational bytes genuinely differ
    // (sf0.001, sf0.01 — no pinned clean-room baseline exists there).
    val controlBase = Map(
      "q48_bucketed_join" -> 0.239, "q50_small_qty_revenue" -> 0.401,
      "q59_salted_join" -> 0.305)
    // canonicalization resolves the tier symlinks, so "the control
    // tables are sf0.1's" is checked on the actual files, not dir names
    val sf01Bytes = Seq("lineitem.parquet", "orders.parquet").forall { t =>
      val f = new java.io.File(sfDir, t)
      f.exists && f.getCanonicalFile.getParentFile.getName == "sf0.1"
    }
    val spark = SparkSession.builder()
      // the library's SQL surface, via the real static-conf path
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Memory page size for per-task agg/sort buffers (round 22,
      // parameterised): the derived default on a large-heap driver is
      // 64 MB, and RowBasedKeyValueBatch ZEROES one page per task per
      // hash aggregate — executor stack sampling showed page zero-fill
      // as the largest single slice of the export-audit scan tasks.
      // 16 MB balances the two regimes measured on this engine: 4 MB
      // pages shrink the fast hash map enough that wide-value aggregates
      // (q91's shingle/list states) fall back to sort-based aggregation
      // (q91 jobSum 2.1-2.9 s), while 64 MB re-inflates the zero-fill
      // (q118 jobSum 0.9-1.8 s); 16 MB reads best on BOTH (1.4-1.7 /
      // 0.5-0.75). Large per-task state chains pages and oversize
      // records get dedicated pages, so genuinely big tasks still work.
      .config("spark.buffer.pageSize", sys.env.getOrElse("SPARK_GRAFT_PAGE_SIZE", "16m"))
      // Guarded takes (minhashEdges' candidate-id take, the closure
      // operators' edge take) expect to DRAIN a metadata-sized frame:
      // the default limit escalation (scan 1 partition, then 4, 16, ...)
      // turns that one wave into up to 4 sequential jobs per take.
      // Start at the core count; deployments whose takes hit huge frames
      // early keep the escalation win by exporting a lower value.
      .config("spark.sql.limit.initialNumPartitions",
        sys.env.getOrElse("SPARK_GRAFT_LIMIT_INIT_PARTS", cpus))
      // Explicit-path scans (snapshot-pinned reads, symlink-resolved
      // external reads) pass one root PER FILE; above this many roots
      // Spark stats them in a distributed job whose task-scheduling
      // overhead (~2 ms/path) dwarfs a driver-side stat on this
      // storage tier (measured: q121 spent 0.6-0.7 s/run in a 301-task
      // listing job). Storage-dependent, so parameterised: deployments
      // on high-latency object stores (where 512 serial stats would be
      // the slower side) export a lower value.
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
        sys.env.getOrElse("SPARK_GRAFT_LIST_PAR_THRESHOLD", "512"))
      // AQE for CACHED-plan materialization (default false upstream,
      // for cache-partitioning plan stability — nothing here relies on
      // it): the engine persists bounded intermediates (shingle
      // corpora, candidate edges, gated docs) whose materialization
      // otherwise runs every exchange at the static 32 partitions no
      // matter how few rows flow; with AQE the coalescing matches data
      // size at ANY scale (measured: q32 204→49 tasks, q65 122→28,
      // identical results).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_AQE_CACHE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "var/demo/spark-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Pre-build every demo artifact OUTSIDE the timing loop, so
    // q38/q41/q45/q46/q48/q52/q55 time the QUERY, not the one-time
    // construction of demo lakes / bucketed tables / stream checkpoints.
    // The aggregate construction cost is reported separately below.
    val b0 = System.nanoTime()
    def step(name: String)(body: => Any): Unit = {
      val t = System.nanoTime()
      body
      System.err.println(f"[bench] build $name ${(System.nanoTime() - t) / 1e9}%.1f s")
    }
    // Restore the tracked artifact snapshot (assets/demo-<sf>.tgz) when
    // the cache is cold: the driver wipes target/ AND untracked files
    // between rounds, so without this every driver bench paid the full
    // ~50-75 s construction (BENCH_r07 build_sec). A version-stale
    // snapshot is caught by the per-artifact marker check and rebuilt.
    step("snapshot")(pipeline.DemoCache.primeFromSnapshot(sfDir))
    // The four artifact families are independent (each object serializes
    // internally on its own lock) — build them concurrently; on a
    // snapshot hit each step is a marker check plus re-registration.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    // Artifact chains, keyed by the names SparkEntry.artifactDeps uses.
    // WHICH chains run is derived from that per-query registry (kept
    // next to the query defs so the mapping can't drift from the
    // sweep): a chain is pre-built iff a SELECTED query declares it.
    val chainBuilders = Map[String, () => Future[Any]](
      "ingest" -> (() => Future {
        step("ingest")(pipeline.IngestDemo.ensure(spark, sfDir))
        step("daydim")(pipeline.IngestDemo.ensureDayDim(spark, sfDir))
        step("bucketed")(pipeline.IngestDemo.ensureBucketed(spark, sfDir))
        step("catalog")(pipeline.IngestDemo.ensureCatalog(spark, sfDir))
        step("evolved")(pipeline.IngestDemo.ensureEvolvedCatalog(spark, sfDir))
      }),
      "stream" -> (() => Future {
        step("stream")(pipeline.StreamDemo.ensure(spark, sfDir))
        step("hourly")(pipeline.StreamDemo.ensureHourly(spark, sfDir).count())
        step("sjoin")(pipeline.StreamDemo.ensureStreamJoin(spark, sfDir).count())
        step("sdedup")(pipeline.StreamDemo.ensureStreamDedup(spark, sfDir).count())
      }),
      "compactlake" -> (() => Future(step("compactlake")(
        pipeline.IngestDemo.ensureCompacted(spark, sfDir)))),
      "clusterlake" -> (() => Future(step("clusterlake")(
        pipeline.IngestDemo.ensureClustered(spark, sfDir)))),
      "bloomlake" -> (() => Future(step("bloomlake")(
        pipeline.IngestDemo.ensureBloomed(spark, sfDir)))),
      "ivf" -> (() => Future(step("ivf")(pipeline.IvfIndex.ensure(spark, sfDir)))),
      "embedtables" -> (() => Future(
        step("embedtables")(queries.EmbedTableStore.ensure(spark, sfDir)))),
      "mhindex" -> (() => Future {
        step("mhindex")(queries.MinHashIndex.ensure(spark, sfDir))
        step("mhappend")(queries.MinHashIndex.ensureAppended(spark, sfDir))
      }),
      "sneardup" -> (() => Future(step("sneardup")(
        pipeline.StreamDemo.ensureStreamNearDedup(spark, sfDir).count()))),
      "deduplake" -> (() => Future(step("deduplake")(
        pipeline.DedupDemo.ensure(spark, sfDir)))),
      "mgatelake" -> (() => Future(step("mgatelake")(
        pipeline.DedupDemo.ensureMultiGate(spark, sfDir)))),
      "fpidx" -> (() => Future(step("fpidx")(
        queries.MultimodalOps.ensureFpIndex(spark, sfDir)))),
      "export" -> (() => Future(step("export")(
        queries.ExportOps.ensureExport(spark, sfDir)))),
      "exportappend" -> (() => Future(step("exportappend")(
        queries.ExportOps.ensureAppendExport(spark, sfDir)))),
      "langmodel" -> (() =>
        Future(step("langmodel")(queries.LangModelStore.ensure(spark, sfDir)))),
      "qualmodel" -> (() =>
        Future(step("qualmodel")(queries.QualityModelStore.ensure(spark, sfDir)))))
    // registry hygiene: an artifactDeps entry for an unknown query or an
    // unknown chain is a bug, not a silent no-op
    SparkEntry.artifactDeps.foreach { case (q, cs) =>
      require(SparkEntry.queries.contains(q), s"artifactDeps: unknown query $q")
      cs.foreach(c => require(chainBuilders.contains(c), s"artifactDeps: unknown chain $c ($q)"))
    }
    // the quiet-window gate below runs the control trio regardless of
    // the subset selection, so their artifact chains must exist
    val gateEnabled = sys.env.contains("SPARK_GRAFT_BENCH_MAX_CONTROL")
    val needed = SparkEntry.artifactDeps
      .collect { case (q, cs) if selected(q) ||
        (gateEnabled && controlBase.contains(q)) => cs }.flatten.toSet
    needed.toSeq.map(chainBuilders).map(_())
      .foreach(Await.result(_, Duration.Inf))
    val buildSec = (System.nanoTime() - b0) / 1e9
    // dev loop: measure/pre-warm the artifact build without the 72-query sweep
    if (sys.env.get("SPARK_GRAFT_BUILD_ONLY").contains("1")) {
      System.err.println(f"[bench] build TOTAL $buildSec%.1f s (build-only exit)")
      spark.stop(); return
    }

    // Quiet-window capture gate (round 20, r19 verdict #3; DEFAULT-ON
    // since round 22, r20 verdict #4): every committed artifact that
    // relied on someone exporting the env landed contended (BENCH_r20
    // @ 1.572, BENCH_r21 @ 1.969 — while the gated dev captures of the
    // same code read 1.19-1.39). The gate now defaults to a GENEROUS
    // threshold (1.45) with a short stakeout (3 retries × 60 s) so an
    // env-less driver invocation waits out a transient co-tenant burst
    // but never stalls a real bench by more than ~4 minutes.
    // SPARK_GRAFT_BENCH_MAX_CONTROL still overrides (a number tightens/
    // loosens the threshold; "off" disables the gate entirely), and
    // SPARK_GRAFT_BENCH_CONTROL_RETRIES / _SLEEP_SEC still control the
    // stakeout (export 30/120 for the manual ~1h hunt). Every probe
    // lands in the artifact as control_attempts, so a reader sees
    // exactly how contended the capture was; after exhausting retries
    // the sweep runs anyway (a stamped degraded artifact beats none)
    // with the final probe on record.
    var controlAttempts = List.empty[Double]
    def controlProbe(): Double = {
      val sum = controlBase.keys.toSeq.sorted.map { name =>
        val fn = SparkEntry.queries(name)
        def once(): Double = {
          val t0 = System.nanoTime()
          fn(spark, sfDir).count(): Unit
          queries.QueryCaches.releaseAll()
          spark.catalog.clearCache()
          (System.nanoTime() - t0) / 1e9
        }
        once() // cold (codegen/JIT) — discarded, like the sweep's
        Seq.fill(3)(once()).sorted.apply(1)
      }.sum
      math.round(sum / controlBase.values.sum * 1000) / 1000.0
    }
    val gateConf = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_CONTROL", "1.45")
    gateConf.toDoubleOption.foreach { gate =>
      if (!sf01Bytes)
        System.err.println("[bench] control gate skipped: no sf0.1 control baseline " +
          "for these relational bytes")
      else {
        val retries = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONTROL_RETRIES", "3").toInt
        val sleepSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONTROL_SLEEP_SEC", "60").toInt
        // two UNRECORDED warmup passes: the first executions of the
        // trio in a fresh JVM pay deep JIT (measured: q48 keeps
        // improving through ~8 executions), which would read as phantom
        // contention in attempt #1 and burn a retry on a quiet machine
        (0 until 2).foreach(_ => controlProbe(): Unit)
        var attempt = controlProbe()
        controlAttempts = List(attempt)
        var left = retries
        while (attempt > gate && left > 0) {
          System.err.println(f"[bench] control $attempt%.3f > gate $gate%.2f — " +
            f"sleeping ${sleepSec}s (${left} retries left)")
          Thread.sleep(sleepSec * 1000L)
          attempt = controlProbe()
          controlAttempts = controlAttempts :+ attempt
          left -= 1
        }
        if (attempt > gate)
          System.err.println(f"[bench] control gate EXHAUSTED at $attempt%.3f — " +
            "sweeping anyway; artifact carries the attempt trail")
        else System.err.println(f"[bench] control gate passed at $attempt%.3f " +
          f"(attempt ${controlAttempts.size})")
      }
    }

    // A failed query must never masquerade as a timing: record per-query
    // errors and exit non-zero so the driver sees a broken bench as broken.
    var failed = List.empty[String]
    def r3(v: Double) = math.round(v * 1000) / 1000.0
    // BENCH_r09 was inflated +47% by a co-tenant process stealing cores
    // for a ~40 s window (ten adjacent queries 3-14× their clean
    // timings; a judge re-run reproduced none of it). Make the artifact
    // self-diagnosing instead of requiring that re-run: alongside each
    // warm MEDIAN record the warm MIN (one clean rep survives most
    // interference windows) and the rep's process-CPU/wall ratio — the
    // "effective cores" this JVM actually burned. Our own heavy stages
    // hold effective cores near the core count; an interference window
    // shows wall inflating while OUR cpu stays flat, so the ratio drops
    // on exactly the inflated queries. README §bench documents the read.
    val osBean = java.lang.management.ManagementFactory.getPlatformMXBean(
      classOf[com.sun.management.OperatingSystemMXBean])
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
        .filter(t => selected(t._1)).map { case (name, fn) =>
      def once(): (Double, Double) = {
        val c0 = osBean.getProcessCpuTime
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            failed ::= name
            false
          }
        // release each query's persisted frames: timings stay attributable
        // (no cross-query or cross-rep cache hits) and executor memory
        // stays bounded across the 70+-query loop. releaseAll drains the
        // QueryCaches registry (dropping the Dataset references);
        // clearCache stays as the catch-all for anything untracked.
        queries.QueryCaches.releaseAll()
        spark.catalog.clearCache()
        val wall = (System.nanoTime() - t0) / 1e9
        val cpu = (osBean.getProcessCpuTime - c0) / 1e9
        // OUTSIDE the timed window: Spark's ContextCleaner releases
        // dropped shuffle/broadcast state only when the JVM collects
        // the owning objects, and a bench JVM under its default GC
        // cadence accumulates it across the 80+-query loop — at the
        // x100 tier this showed as monotonically growing reps
        // (q34 2.8 → 14.7 → 19.1 s) with effective cores collapsing.
        // One explicit collection per run keeps every timing a clean
        // slate without charging the cleanup to any query.
        System.gc()
        if (ok) (wall, cpu / wall) else (-1.0, -1.0)
      }
      val (cold, _) = once()
      val warms = if (cold >= 0) Seq.fill(reps)(once()).filter(_._1 >= 0)
                  else Seq.empty
      val byWall = warms.map(_._1).sorted
      val median = if (byWall.isEmpty) -1.0 else byWall(byWall.size / 2)
      val wmin = if (byWall.isEmpty) -1.0 else byWall.head
      // the MEDIAN rep's ratio — the rep the headline number comes from
      val ratio = if (warms.isEmpty) -1.0
        else warms.sortBy(_._1).apply(warms.size / 2)._2
      System.err.println(f"[bench] $name cold=$cold%.2f warm_median=$median%.2f " +
        f"warm_min=$wmin%.2f ecores=$ratio%.1f " +
        byWall.map(w => f"$w%.2f").mkString("[", ",", "]"))
      (name, r3(cold), r3(median), r3(wmin), r3(ratio))
    }
    def jmap(f: ((String, Double, Double, Double, Double)) => Double): String =
      results.map(t => s"\"" + t._1 + "\":" + f(t)).mkString("{", ",", "}")
    val qs = jmap(_._3)
    val totalWarm = r3(results.collect { case (_, _, m, _, _) if m >= 0 => m }.sum)
    val totalCold = r3(results.collect { case (_, c, _, _, _) if c >= 0 => c }.sum)
    val totalMin = r3(results.collect { case (_, _, _, w, _) if w >= 0 => w }.sum)
    val errs = failed.distinct.map("\"" + _ + "\"").mkString("[", ",", "]")
    // detail lines first (cold + noise diagnostics), the contract line
    // LAST with the totals repeated at the line's END so a
    // head-truncated log tail (round 6 lost q01-q11 that way) still
    // shows them. total_warm_min ≈ total_warm_median on a quiet
    // machine; a large gap — or an ecores dip over a contiguous block —
    // marks the artifact as interference-contaminated.
    val subset = only.map(p => s""","subset":"${p.mkString(",")}"""").getOrElse("")
    val ctrl = results.filter(t => controlBase.contains(t._1) && t._3 >= 0)
    val controlRatio =
      if (sf01Bytes && ctrl.size == controlBase.size)
        r3(ctrl.map(_._3).sum / controlBase.values.sum)
      else -1.0
    // Post-sweep control probe (round 22, r20 verdict #5): the entry
    // gate brackets the sweep's START only — r20's 61.73 s headline
    // carried a mid-sweep contention block the entry probe could not
    // see. Re-running the trio AFTER the sweep stamps `control_exit`
    // beside `control_ratio`, so a reader can localize a window that
    // degraded (entry quiet / exit contended) without a judge re-run.
    // Costs the trio's ~12 warm runs (~3-5 s), entirely outside every
    // recorded timing.
    val controlExit =
      if (sf01Bytes && ctrl.size == controlBase.size && failed.isEmpty)
        controlProbe()
      else -1.0
    // the gate's probe trail (empty = gate not enabled): how many
    // windows the capture waited out before this artifact was recorded
    val attempts =
      if (controlAttempts.isEmpty) ""
      else controlAttempts.mkString(""","control_attempts":[""", ",", "]")
    val lines = Seq(
      s"""{"metric":"cold_detail","unit":"sec","cold":${jmap(_._2)}}""",
      s"""{"metric":"noise_detail","unit":"sec","cores":$cpus,"warm_min":${jmap(_._4)},"ecores_median_rep":${jmap(_._5)}}""",
      s"""{"metric":"total_warm_median","value":$totalWarm,"unit":"sec","reps":$reps,"errors":$errs,"queries":$qs,"build_sec":${r3(buildSec)},"sf":"$sfDir"$subset,"control_ratio":$controlRatio,"control_exit":$controlExit$attempts,"total_cold":$totalCold,"total_warm_min":$totalMin,"total_warm_median":$totalWarm}""")
    lines.foreach(println)
    // self-contained artifact: BENCH_r11's driver log truncated mid-line
    // and dropped q01-q28 per-query medians from the parsed artifact —
    // the same three lines land in a file so a truncated stdout tail can
    // never lose them again (the driver's stdout contract is unchanged)
    // Subset runs (SPARK_GRAFT_BENCH_ONLY) land in a "-subset" sibling so
    // a dev-loop measurement can never clobber the last full-sweep artifact.
    try {
      val tag = if (only.isDefined) "-subset" else ""
      val out = java.nio.file.Paths.get("var", "bench",
        s"bench-${new java.io.File(sfDir).getName}$tag.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out, lines.mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[bench] artifact written to $out")
    } catch { case e: Exception =>
      System.err.println(s"[bench] artifact file write failed (stdout intact): $e")
    }
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
