package graft.monitor

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ingest.{Compactor, CuratedWriter, FileBounds, Rollup}

/** [[LayoutAdvisor]] + [[PredicateStats]]: predicate capture must
  * classify real plan shapes (and only over curated lakes), the
  * durable history must fold/compact without changing answers, and —
  * the point of the whole loop — the advisor's recommended layout must
  * BEAT the default layout on the engine's own skip machinery. */
class LayoutAdvisorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withExtendedSession[T](f: SparkSession => T): T = {
    val base = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try f(SparkSession.builder()
      .withExtensions(new graft.GraftExtensions().apply(_))
      .getOrCreate())
    finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  private def scannedFiles(df: DataFrame): Int = {
    val locations = df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation.asInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation].location
    }
    assert(locations.size == 1, s"expected one relation: $locations")
    locations.head.inputFiles.length
  }

  /** One-partition curated lake with a hash-shaped `lookup_key` (every
    * file spans the key space — lo/hi sentinels) and a `user_id` that
    * is uniform and DECORRELATED from event time, appended as 4 files:
    * the layout where neither membership nor user-range probes can
    * prune anything until the advisor's levers are applied. */
  private def advisableLake(n: Int = 512): String = {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-adv").toString
    val rows = (0 until n).map { i =>
      val minute = (i * 27) % n
      val uid = ((i * 13) % n).toLong
      // lo/hi sentinels land in EVERY seed file (i 0..3 → "aa",
      // 4..7 → "zz"), so each file's key window spans the whole space
      // and any file drop is attributable to membership statistics
      val key = if (i < 4) "aa" else if (i < 8) "zz"
        else s"k-${(i.toLong * 2654435761L) % 1000000007L}"
      (s"seed-${i % 4}", uid, key,
        f"2024-03-07 ${minute / 60}%02d:${minute % 60}%02d:00", i.toDouble, i % 4)
    }
    val df = rows.toDF("source_file", "user_id", "lookup_key", "ts_s", "value", "seed")
      .withColumn("event_time_utc", col("ts_s").cast("timestamp_ntz"))
      .drop("ts_s")
      .withColumn("year", lit(2024)).withColumn("month", lit(3))
      .withColumn("day", lit(7)).withColumn("mode", lit("training"))
    for (p <- 0 until 4)
      df.filter(col("seed") === p).drop("seed").coalesce(1)
        .write.mode("append").partitionBy("year", "month", "day", "mode")
        .parquet(s"$root/curated")
    Rollup.writePartials(spark.read.parquet(s"$root/curated"), s"$root/rollup/b0")
    FileBounds.writeStaged(
      spark.read.parquet(s"$root/curated").select(col("*"), col("_metadata")),
      "", s"$root/filebounds/b0")
    graft.plans.RollupPartitionSkip.clearCache()
    root
  }

  test("extract classifies plan shapes over a curated scan; foreign dirs yield nothing") {
    val root = advisableLake()
    val lake = spark.read.parquet(s"$root/curated")
    // two queries: an equality+IN on one column AND-ed together could
    // legitimately be folded by the optimizer, which is exactly why the
    // capture classifies what SURVIVED optimization
    val events = PredicateStats.extract(
      lake.filter(col("lookup_key") === "k-7" &&
        col("user_id") > 100L && col("user_id") <= 400L &&
        col("source_file").startsWith("seed") &&
        col("value").isNotNull)
        .queryExecution) ++
      PredicateStats.extract(
        lake.filter(col("lookup_key").isin("aa", "zz", "k-9")).queryExecution)
    val byColOp = events.groupBy(e => (e.column, e.opClass))
      .view.mapValues(_.map(_.nLiterals).sum).toMap
    assert(byColOp(("lookup_key", "eq")) == 4, s"1 point + IN(3): $byColOp") // 1 + 3 literals
    assert(byColOp.contains(("user_id", "range")) &&
      events.count(e => e.column == "user_id" && e.opClass == "range") == 2)
    assert(byColOp.contains(("source_file", "prefix")))
    assert(byColOp.contains(("value", "notnull")))
    assert(events.forall(e => new org.apache.hadoop.fs.Path(e.lake).getName
      == new org.apache.hadoop.fs.Path(root).getName), s"lake attribution: $events")

    // a same-shaped copy NOT named `curated` must record nothing
    val copy = s"$root/curated-sample"
    lake.limit(4).write.parquet(copy)
    val foreign = PredicateStats.extract(
      spark.read.parquet(copy).filter(col("lookup_key") === "k-7").queryExecution)
    assert(foreign.isEmpty, s"non-lake scan captured: $foreign")
  }

  test("the monitor's listener captures predicates from executed queries") {
    val root = advisableLake()
    val mon = new GraftMonitor()
    mon.attach(spark)
    try {
      spark.read.parquet(s"$root/curated")
        .filter(col("lookup_key") === "k-11").count(): Unit
      // the listener bus is async — poll briefly
      val deadline = System.currentTimeMillis() + 10000
      var got = mon.predicateEvents
      while (got.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(50)
        got = mon.predicateEvents
      }
      assert(got.exists(e => e.column == "lookup_key" && e.opClass == "eq"),
        s"listener captured: $got")
    } finally mon.detach(spark)
  }

  test("publish/history/compact: token replays converge, sums fold, growth stays bounded") {
    val root = advisableLake()
    def ev(c: String, op: String, n: Int) =
      PredicateEvent(root, c, op, n, 0L)
    (0 until 20).foreach { i =>
      assert(PredicateStats.publish(spark, root,
        Seq(ev("lookup_key", "eq", 1), ev("user_id", "range", 1)), s"t$i"))
    }
    // replaying one token must converge, not double-count
    assert(PredicateStats.publish(spark, root,
      Seq(ev("lookup_key", "eq", 1), ev("user_id", "range", 1)), "t0"))
    def counts() = PredicateStats.history(spark, root)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val before = counts()
    assert(before(("lookup_key", "eq")) == 20L, s"history: $before")
    assert(before(("user_id", "range")) == 20L)
    // events for a DIFFERENT lake never land in this store
    assert(!PredicateStats.publish(spark, root,
      Seq(PredicateEvent("/somewhere/else", "x", "eq", 1, 0L)), "alien"))
    // compact folds 21 batch dirs to one; answers identical
    assert(PredicateStats.compact(spark, root, maxBatchDirs = 4))
    val dirs = new java.io.File(PredicateStats.storeDir(root)).listFiles()
      .count(f => f.isDirectory && !f.getName.startsWith("."))
    assert(dirs == 1, s"compaction left $dirs dirs")
    assert(counts() == before, "compaction changed the history")
  }

  test("the recommended layout beats the default on the skip machinery; q130 matches its pins") {
    val root = advisableLake()
    // engineered workload: membership-probe the hash key, window-probe
    // the user id — published through the monitor's drain path
    val mon = new GraftMonitor()
    val lake = spark.read.parquet(s"$root/curated")
    def observe(df: DataFrame): Unit =
      mon.recordPredicates(PredicateStats.extract(df.queryExecution))
    (0 until 5).foreach(i => observe(lake.filter(col("lookup_key") === s"k-$i")))
    (0 until 3).foreach(i => observe(lake.filter(col("user_id") >= lit(100L * i))))
    assert(mon.publishPredicates(spark, root, "hist"))
    assert(mon.predicateEvents.isEmpty, "publish must drain the ring")

    val rec = LayoutAdvisor.recommend(spark, root).collect()
      .map(r => r.getString(0) -> r.getString(4)).toMap
    assert(rec("lookup_key") == "bloom", s"recommendations: $rec")
    assert(rec("user_id") == "cluster", s"recommendations: $rec")
    assert(rec("value") == "none" && rec("event_time_utc") == "none",
      s"unprobed columns must stay none: $rec")
    val bloomCols = LayoutAdvisor.recommend(spark, root).collect()
      .filter(_.getString(4) == "bloom").map(_.getString(0)).toSeq
    val clusterCols = LayoutAdvisor.recommend(spark, root).collect()
      .filter(_.getString(4) == "cluster").map(_.getString(0)).toSeq

    // the advisor's verdicts fold into a runnable maintenance config
    // (taken NOW, on the pre-rewrite layout the verdicts describe):
    // bloom picks → bloomCols, cluster picks (range-ranked, MaxCols
    // cap) → clusterCols, and the caller's unrelated knobs survive
    val base = Compactor.TickConfig(sortCol = None, graceCycles = 3)
    val cfg = LayoutAdvisor.advisedTickConfig(spark, root, base)
    assert(cfg.bloomCols == bloomCols.sorted, s"cfg blooms: ${cfg.bloomCols}")
    assert(cfg.clusterCols == clusterCols, s"cfg clusters: ${cfg.clusterCols}")
    assert(cfg.sortCol.isEmpty, "user_id cluster pick must not steal sortCol")
    assert(cfg.graceCycles == 3, "unrelated knobs must stay the caller's")

    // BLOOM lever: republish the sidecar with the recommended bloom
    // columns; the point lookup that listed every file on the default
    // layout now lists fewer — and identical rows
    val probeKey = s"k-${(10L * 2654435761L) % 1000000007L}" // i=10, file seed-2
    def probe(s: SparkSession) = CuratedWriter.read(s, s"$root/curated")
      .filter(col("lookup_key") === probeKey)
      .select("source_file", "user_id", "value")
    val wantProbe = probe(spark).collect().map(_.toSeq).sortBy(_.mkString("|"))
    withExtendedSession { s =>
      assert(scannedFiles(probe(s)) == 4, "fixture: default layout must keep all files")
    }
    FileBounds.writeStaged(
      spark.read.parquet(s"$root/curated").select(col("*"), col("_metadata")),
      "", s"$root/filebounds/b1", bloomCols,
      bloomExpectedItems = 8192, bloomFpp = 0.001)
    graft.plans.RollupPartitionSkip.clearCache()
    withExtendedSession { s =>
      val df = probe(s)
      assert(scannedFiles(df) < 4, "recommended blooms did not prune")
      assert(df.collect().map(_.toSeq).sortBy(_.mkString("|"))
        .sameElements(wantProbe), "bloom layout changed the answer")
    }

    // CLUSTER lever: compact with the recommended cluster columns; the
    // user-range probe that spanned every file now drops files (the
    // ZClusterSpec contrast, driven by the ADVISOR's output)
    def userQ(s: SparkSession) = CuratedWriter.read(s, s"$root/curated")
      .filter(col("user_id") >= lit(384L))
      .select("source_file", "user_id", "value")
    val wantUser = userQ(spark).collect().map(_.toSeq).sortBy(_.mkString("|"))
    val leafBytes = new java.io.File(
      s"$root/curated/year=2024/month=3/day=7/mode=training")
      .listFiles().filter(f => f.isFile && !f.getName.startsWith(".") &&
        !f.getName.startsWith("_")).map(_.length()).sum
    val r = Compactor.compact(spark, s"$root/curated",
      maxFilesPerPartition = 1, targetBytesPerFile = (leafBytes + 3) / 4,
      sortCol = Some("event_time_utc"), clusterCols = clusterCols)
    assert(r.partitionsCompacted == 1)
    Compactor.sweepRetired(spark, s"$root/curated"): Unit
    graft.plans.RollupPartitionSkip.clearCache()
    withExtendedSession { s =>
      val total = CuratedWriter.read(s, s"$root/curated").inputFiles.length
      val df = userQ(s)
      assert(scannedFiles(df) < total,
        s"recommended clustering did not prune (kept all $total)")
      assert(df.collect().map(_.toSeq).sortBy(_.mkString("|"))
        .sameElements(wantUser), "clustered layout changed the answer")
    }

    // the REGISTERED q130 against its oracle pins (sf0.001)
    val got = graft.SparkEntry.queries("q130_layout_advisor")(
      spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val want = Seq(
      ("event_time_utc", 0L, 4L, "cluster"),
      ("lookup_key", 7L, 0L, "bloom"),
      ("record_id", 0L, 0L, "none"),
      ("source_file", 0L, 0L, "none"),
      ("user_id", 0L, 0L, "none"),
      ("value", 0L, 3L, "cluster"))
    assert(got.toSeq == want, s"q130 drifted from its pins: ${got.toSeq}")
  }
}
