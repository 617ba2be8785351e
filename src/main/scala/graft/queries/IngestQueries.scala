package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Cols.cents
import graft.ingest.{CuratedWriter, DlqWriter}
import graft.ledger.Ledger
import graft.pipeline.{DedupDemo, IngestDemo}

/** CORRECTNESS surface for the ingest pipeline (SURVEY.md §3.1 — the
  * reference's core loop). Each query first ensures the demo pipeline has
  * run for this scale factor (memoized per JVM), then interrogates its
  * outputs. The oracles work because the fixtures are a deterministic
  * JSON export of the driver's `events` table plus hand-written files
  * with fixed counts: DuckDB queries `events.parquet`/literals, Spark
  * queries what the pipeline actually produced (see
  * [[graft.pipeline.Fixtures]]).
  */
object IngestQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Cloned session with the zone-skip IN cap lowered to 64 (q128).
    * The complement-form rewrite only engages when MORE partitions
    * qualify than the cap — on a 10k-partition production lake the
    * default 1000 does that naturally, but the demo lake's 151 leaves
    * never can, so the q-entry exercises the exact production code
    * path through the session-conf knob instead of a bigger fixture.
    * Memoized PER OUTER SESSION (not per context) like
    * Alarms.evalSession: newSession() per bench rep would re-derive
    * SessionState (~0.5 s/call), and the clone inherits ITS PARENT's
    * extensions object — keying by context would let a plain session's
    * clone shadow an extended one's. Under the driver's plain Verify
    * session (no extensions) the query degrades to the identical
    * unrewritten scan — same rows either way, which is what the oracle
    * checks; the PLAN is pinned in RollupSkipSpec. */
  private val antiCapSessions = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, SparkSession]

  /** q129's probe keys per sf dir (see the query's comment). */
  private val bloomProbeKeys =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]
  private def antiCapSession(outer: SparkSession): SparkSession = {
    antiCapSessions.keySet.removeIf(_.sparkContext.isStopped)
    antiCapSessions.computeIfAbsent(outer, o => {
      val c = o.newSession()
      c.conf.set(graft.plans.RollupPartitionSkip.MaxInLiteralsKey, "64")
      c
    })
  }

  val defs: Map[String, Q] = Map(
    // S1/S7/P6 + the ledger's file dispositions: segregation counts.
    // 8 raw files → 5 clean (SUCCEEDED) + 3 quarantined; curated gets
    // every events row + the 4 drift rows; DLQ gets 12 rows.
    "q38_ingest_segregation" -> ((s, d) => {
      val lay = IngestDemo.ensure(s, d)
      val led = Ledger(s, lay.ledgerDir).snapshot()
      led.agg(
        sum(when(col("processing_status") === Ledger.Succeeded, 1L).otherwise(0L))
          .as("clean_files"),
        sum(when(col("processing_status") === Ledger.Quarantined, 1L).otherwise(0L))
          .as("quarantined_files"))
        .crossJoin(CuratedWriter.read(s, lay.curatedDir).agg(count(lit(1)).as("curated_rows")))
        .crossJoin(DlqWriter.read(s, lay.dlqDir).agg(count(lit(1)).as("dlq_rows")))
    }),

    // S6/S10/P9/F1: partition-pruned aggregate over the curated lake —
    // the filter hits only year=2024/month=1/day∈[10,12] directories
    // (PartitionFilters in the plan), and values must match DuckDB
    // aggregating the original events rows.
    "q39_ingest_pruned" -> ((s, d) => {
      val lay = IngestDemo.ensure(s, d)
      CuratedWriter.read(s, lay.curatedDir)
        .filter(col("year") === 2024 && col("month") === 1 && col("day").between(10, 12))
        .groupBy("mode")
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_value_c"))
        .orderBy("mode")
    }),

    // S4/S5/A3/F3/T3: ledger state-machine audit — every file reached a
    // terminal state in exactly one PROCESSING pass (retry_count 1), and
    // terminal rows carry a processed_at stamp (current_timestamp).
    "q40_ledger_audit" -> ((s, d) => {
      val lay = IngestDemo.ensure(s, d)
      Ledger(s, lay.ledgerDir).snapshot()
        .groupBy("processing_status")
        .agg(
          count(lit(1)).as("n_files"),
          sum(col("retry_count")).cast("long").as("n_retries"),
          count(col("processed_at")).as("n_stamped"),
          count(col("error_message")).as("n_errors"))
        .orderBy("processing_status")
    }),

    // T1 via Structured Streaming: the checkpointed AvailableNow runner
    // must produce the exact same curated/DLQ record counts as the
    // ledger-driven batch runner over the same landing zone.
    "q45_stream_ingest" -> ((s, d) => {
      val lay = graft.pipeline.StreamDemo.ensure(s, d)
      CuratedWriter.read(s, lay.curatedDir).agg(count(lit(1)).as("curated_rows"))
        .crossJoin(DlqWriter.read(s, lay.dlqDir).agg(count(lit(1)).as("dlq_rows")))
    }),

    // T6 as a real stream: watermarked tumbling-window counts computed by
    // a streaming query over the streamed curated lake; DuckDB recomputes
    // the same hourly histogram from the original events (+ the 4 drift
    // rows the fixtures add at 2024-01-25 10:00).
    "q46_stream_hourly" -> ((s, d) =>
      graft.pipeline.StreamDemo.ensureHourly(s, d)),

    // S9 + schema evolution (psuedo_code.txt:353-363): a catalog table
    // evolved in place — ALTER TABLE ADD COLUMNS, then a drifted append —
    // queried via spark.table. Pre-drift rows read the new column as
    // NULL; the '(pre)'/'evolved' split proves both generations are
    // served through the evolved catalog schema.
    "q55_catalog_evolution" -> ((s, d) => {
      val tbl = IngestDemo.ensureEvolvedCatalog(s, d)
      s.table(tbl)
        .groupBy(coalesce(col("note"), lit("(pre)")).as("note"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_value_c"))
        .orderBy("note")
    }),

    // T6 as a STREAM-STREAM join: views joined to the same user's
    // purchases within 30 minutes, computed by a watermarked
    // stream-stream inner join over the streamed curated lake, then
    // aggregated in batch from the materialized pair table. The oracle
    // recomputes the pairs from the original events with a plain batch
    // join — the streaming pair set must match it exactly.
    "q61_stream_join" -> ((s, d) => {
      graft.pipeline.StreamDemo.ensureStreamJoin(s, d)
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("user_id")).as("n_users"),
          sum(col("p_us") - col("v_us")).as("sum_gap_us"))
    }),

    // T5/X1 as a STREAM: exactly-once recovery from at-least-once file
    // delivery — the landing zone holds the events table as two
    // overlapping deliveries (a replayed upstream file), and the
    // streaming runner dedups on the event key with
    // dropDuplicatesWithinWatermark. The deduped stream must equal the
    // original table exactly; landing_rows > n_events proves the replay
    // existed and was suppressed.
    "q72_stream_dedup" -> ((s, d) => {
      val deduped = graft.pipeline.StreamDemo.ensureStreamDedup(s, d)
      val raw = graft.engine.Tables.parquet(s, graft.pipeline.StreamDemo.streamDedupLanding(d))
        .agg(count(lit(1)).as("landing_rows"))
      deduped
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          sum(cents(col("value"))).as("sum_value_c"))
        .crossJoin(raw)
    }),

    // Monitoring-as-verification (sudo_code.txt:268-276): the reference's
    // CloudWatch alarm set evaluated as a declarative query over the
    // drained demo lake — DLQ activity (12 records) and file quarantine
    // (3 files) ALARM; job failure and ledger backlog are OK because the
    // drain loop ran every file to a terminal state; data_freshness is
    // OK because even the synthetic drift mode (day 25) lags the lake's
    // newest event (Jan 30) by under the 7-day threshold — at every sf,
    // since real modes lag by hours. Listener-sourced failure events and
    // the freshness FIRING polarity are exercised in MonitorSpec
    // (nondeterministic timings stay out of the oracle surface).
    "q57_monitor_alarms" -> ((s, d) => {
      val lay = IngestDemo.ensure(s, d)
      graft.monitor.Alarms.evaluate(s, lay)
    }),

    // M1 in its FIRING state: q57 pins the alarm set on a lake whose
    // gates never fired (all-quiet except ingest's own DLQ); this row
    // pins it on the dedup-demo lake where BOTH ingest gates diverted
    // rows — the alarm counts are the same closed forms q90 audits
    // (3 near-dup suppressions, 1 quality suppression, nothing corrupt,
    // ledger drained). Together the two rows pin both alarm polarities.
    "q94_gate_alarms" -> ((s, d) => {
      val lay = DedupDemo.ensure(s, d)
      graft.monitor.Alarms.evaluate(s, lay)
    }),

    // X2/X6 audit surface (the reference's DLQ-as-audit philosophy,
    // psuedo_code.txt:195-208, applied to BOTH ingest gates): "what got
    // suppressed, why, and when" — per-tick suppression counts by
    // reason from the dedup DLQ (batch↔index vs intra-batch, with the
    // exact verify Jaccard) and the QUALITY DLQ (the q77 gate at
    // ingest), unioned with the span-scrub accounting the ledger notes
    // carry. Runs over [[DedupDemo]]'s engineered 3-tick history, where
    // every suppression, its jac_e6, and the garbage doc's score are
    // closed forms (see that scaladoc) — so the oracle pins the full
    // audit trail as literals. Scale shape: the DLQs hold only
    // suppressed rows and the ledger one row per file; all three
    // aggregates are trivially hash-partitioned.
    "q90_dedup_dlq_audit" -> ((s, d) => {
      val lay = DedupDemo.ensure(s, d)
      val dlq = DlqWriter.read(s, lay.dedupDlqDir)
        .groupBy(col("job_run_id"), col("dup_reason").as("reason"))
        .agg(count(lit(1)).as("n"), max(col("jac_e6")).as("max_jac_e6"))
      val qual = DlqWriter.read(s, lay.qualityDlqDir)
        .groupBy(col("job_run_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("job_run_id"), lit("quality").as("reason"), col("n"),
          lit(null).cast("long").as("max_jac_e6"))
      val scrubs = Ledger(s, lay.ledgerDir).snapshot()
        .filter(col("error_message").rlike("spans scrubbed: \\d+ row"))
        .select(col("job_run_id"),
          regexp_extract(col("error_message"), "spans scrubbed: (\\d+) row", 1)
            .cast("long").as("n_rows"))
        .groupBy("job_run_id")
        .agg(sum(col("n_rows")).as("n"))
        .select(col("job_run_id"), lit("span-scrub").as("reason"), col("n"),
          lit(null).cast("long").as("max_jac_e6"))
      dlq.unionByName(qual).unionByName(scrubs).orderBy("job_run_id", "reason")
    }),

    // The FULL multi-gate drill (round-12 brief #5, video gate added in
    // round 14): quality + text near-dup + image + audio + video
    // fingerprints in ONE drain over DedupDemo.ensureMultiGate's
    // planted multi-modality lake — every gate exercises BOTH its
    // windows (same-tick pair in tick 1, index hit in tick 2), each
    // suppression's score is a closed form pinned literally in the
    // oracle, and the `curated` row audits the published lake itself
    // (4 survivors). The q90 audit shape extended to the per-modality
    // reason namespaces (fp_* image, au_* audio, vi_* video).
    "q106_multigate_audit" -> ((s, d) => {
      val lay = DedupDemo.ensureMultiGate(s, d)
      val dlq = DlqWriter.read(s, lay.dedupDlqDir)
        .groupBy(col("job_run_id"), col("dup_reason").as("reason"))
        .agg(count(lit(1)).as("n"), max(col("jac_e6")).as("max_jac_e6"))
      val qual = DlqWriter.read(s, lay.qualityDlqDir)
        .groupBy(col("job_run_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("job_run_id"), lit("quality").as("reason"), col("n"),
          lit(null).cast("long").as("max_jac_e6"))
      val curated = CuratedWriter.read(s, lay.curatedDir)
        .agg(count(lit(1)).as("n"))
        .select(lit("lake").as("job_run_id"), lit("curated").as("reason"),
          col("n"), lit(null).cast("long").as("max_jac_e6"))
      dlq.unionByName(qual).unionByName(curated).orderBy("job_run_id", "reason")
    }),

    // S6→rollup: incrementally-maintained partition statistics — every
    // published batch also published its partial aggregate (atomically
    // with the rows it summarizes, graft.ingest.Rollup), and this query
    // merges the partials at METADATA cost: one row per file×partition,
    // never a lake scan. The oracle recomputes the same statistics from
    // the ORIGINAL events table (the q39 convention), so a divergence
    // anywhere in the fold-forward chain — a lost batch, a double
    // count, a compaction gap — turns this row red. n_files counts the
    // distinct raw files contributing to each partition (good shards
    // are event_id%4; the drift file adds day-25/synthetic).
    "q109_rollup_stats" -> ((s, d) => {
      val lay = IngestDemo.ensure(s, d)
      graft.ingest.Rollup.stats(s, lay.rollupDir)
        .select(col("year"), col("month"), col("day"), col("mode"),
          col("n_files"), col("n_rows"), col("n_value"), col("value_e6"))
        .orderBy("year", "month", "day", "mode")
    }),

    // The q109 chain's AUDITOR: reconcile the incrementally-maintained
    // rollup against an exact lake recompute at month + global grain
    // (graft.ingest.Rollup.reconcile — the one query that pays a lake
    // scan, run rarely to certify the fold-forward chain). Every match
    // flag must be 1: the exact side and the metadata side agree on
    // rows/values/files, and the month/global HLL fold (sketches merged
    // ACROSS the daily partials — the "fold further" path) estimates
    // within 5% of the exact distinct-user count (q44's convention:
    // engine-specific estimates never reach the hash compare). The
    // oracle recomputes the exact side from the original events table
    // with all flags literal 1 — a lost batch, a phantom partial, or a
    // degraded sketch turns this row red.
    "q110_rollup_reconcile" -> ((s, d) => {
      val lay = IngestDemo.ensure(s, d)
      graft.ingest.Rollup.reconcile(s, lay.curatedDir, lay.rollupDir)
        .orderBy("year", "month", "mode")
    }),

    // The rollup chain's CONSUMPTION payoff: a plain partition-grain
    // aggregate a user would write against the lake — row counts, value
    // null-counts and time bounds per (year, month, day, mode) over a
    // date window. Under a session carrying GraftExtensions (Verify and
    // Bench both do), plans/RollupMetadataAggregate answers it from the
    // q109 partials: the optimized plan scans `rollup/` (metadata-sized
    // at any lake size), never `curated/` — RollupRewriteSpec asserts
    // the swap; THIS query's oracle proves the served answer equals an
    // exact recompute from the original events; q110 is the standing
    // auditor of that equivalence. Timestamps leave as epoch micros so
    // the hash compare is integer-exact (the q46 convention). The day
    // window keeps the drift-file synthetic rows (day 25) out, so the
    // oracle is a pure events recompute.
    "q111_metadata_agg" -> ((s, d) => {
      val lay = IngestDemo.ensure(s, d)
      CuratedWriter.read(s, lay.curatedDir)
        .filter(col("year") === 2024 && col("month") === 1 && col("day").between(5, 20))
        .groupBy("year", "month", "day", "mode")
        .agg(count(lit(1)).as("n_rows"), count(col("value")).as("n_value"),
          min(col("event_time_utc")).as("first_ts"),
          max(col("event_time_utc")).as("last_ts"))
        .select(col("year"), col("month"), col("day"), col("mode"),
          col("n_rows"), col("n_value"),
          unix_micros(col("first_ts").cast("timestamp")).as("first_us"),
          unix_micros(col("last_ts").cast("timestamp")).as("last_us"))
        .orderBy("year", "month", "day", "mode")
    }),

    // The WIDENED servable surface of the rollup rewrite: month-grain
    // value totals via the integer-exact e6 convention (= Σ value_e6 of
    // the stored partials — exact, integer addition is associative) and
    // distinct-user reach via hll_sketch_estimate(hll_sketch_agg(...))
    // (= estimate of the register-wise-max union of stored sketches).
    // The served side never scans the lake under GraftExtensions; the
    // exact side (countDistinct — deliberately NOT servable) always
    // does, and the q44 convention keeps the engine-specific estimate
    // out of the hash compare: only the ±5% reach_ok flag is emitted.
    // NOTE ON COST: this query is an AUDITOR, not a serving path — the
    // deliberate exact-side lake scan is the whole point (it proves the
    // rewrite against a recompute), which is why q112 runs ~3× its
    // q111/q113 siblings in every bench sweep. A consumer wanting the
    // served numbers alone runs just the first frame and pays metadata
    // cost only.
    "q112_metadata_value" -> ((s, d) => {
      val lay = IngestDemo.ensure(s, d)
      val window = col("year") === 2024 && col("month") === 1 &&
        col("day").between(5, 20)
      val served = CuratedWriter.read(s, lay.curatedDir)
        .filter(window)
        .groupBy("year", "month", "mode")
        .agg(count(lit(1)).as("n_rows"), count(col("value")).as("n_value"),
          sum(round(col("value") * lit(1000000)).cast("long")).as("value_e6"),
          hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("users_est"))
      val exact = CuratedWriter.read(s, lay.curatedDir)
        .filter(window)
        .groupBy("year", "month", "mode")
        .agg(countDistinct(col("user_id")).as("n_users"))
      served.join(exact, Seq("year", "month", "mode"))
        .select(col("year"), col("month"), col("mode"),
          col("n_rows"), col("n_value"), col("value_e6"),
          when(abs(col("users_est") - col("n_users")) * lit(100L) <=
            col("n_users") * lit(5L), lit(1)).otherwise(lit(0))
            .cast("int").as("reach_ok"))
        .orderBy("year", "month", "mode")
    }),

    // The rewrite's GLOBAL branch on the oracle surface: an ungrouped
    // whole-window rollcall ("how much landed this month?") — the shape
    // every dashboard headline tile asks. Served from the partials like
    // q111, but through the rule's empty-grouping path, whose count
    // fold must coalesce to 0 over an empty selection (Sum over no rows
    // is NULL where Count is 0 — the branch RollupRewriteSpec pins);
    // HLL reach is deliberately absent (global reach is the one shape
    // the rule declines: estimate-0 vs union-NULL would be observable).
    "q113_metadata_global" -> ((s, d) => {
      val lay = IngestDemo.ensure(s, d)
      CuratedWriter.read(s, lay.curatedDir)
        .filter(col("year") === 2024 && col("month") === 1 && col("day").between(5, 20))
        .agg(count(lit(1)).as("n_rows"), count(col("value")).as("n_value"),
          sum(round(col("value") * lit(1000000)).cast("long")).as("value_e6"),
          unix_micros(min(col("event_time_utc")).cast("timestamp")).as("first_us"),
          unix_micros(max(col("event_time_utc")).cast("timestamp")).as("last_us"))
    }),

    // The SECOND rollup payoff on the oracle surface: an EVENT-TIME
    // range query (the shape partition pruning cannot touch — the
    // predicate is on a data column, not year/month/day). Under
    // GraftExtensions, plans/RollupPartitionSkip folds the partials'
    // per-partition min/max into a zone predicate and the scan reads
    // only the overlapping partitions (RollupSkipSpec asserts the
    // pruning); this query's oracle proves the skipped answer equals
    // the events recompute. The aggregate itself is deliberately NOT
    // servable (the filter references event_time_utc), so q114
    // exercises the skip rule in isolation from the serve rule.
    "q114_timerange_skip" -> ((s, d) => {
      val lay = IngestDemo.ensure(s, d)
      CuratedWriter.read(s, lay.curatedDir)
        .filter(col("event_time_utc") >= lit("2024-01-10 00:00:00").cast("timestamp_ntz") &&
          col("event_time_utc") < lit("2024-01-12 00:00:00").cast("timestamp_ntz"))
        .groupBy("mode")
        .agg(count(lit(1)).as("n_rows"),
          sum(round(col("value") * lit(1000000)).cast("long")).as("value_e6"),
          unix_micros(min(col("event_time_utc")).cast("timestamp")).as("first_us"),
          unix_micros(max(col("event_time_utc")).cast("timestamp")).as("last_us"))
        .orderBy("mode")
    }),

    // Lake small-file MAINTENANCE, end-to-end on the oracle surface:
    // IngestDemo.ensureCompacted drains a lake whose every partition
    // receives two single-file appends with the tick-slot compaction
    // enabled (Compactor.maintainTouched — O(touched partitions) per
    // tick, event-time-sorted rewrites, journaled crash-safe swaps), so
    // by drain end every leaf has been rewritten down to one file while
    // ingest kept running (the fixture REQUIREs it, plus an all-green
    // Rollup.reconcile across the rewrites). This query recomputes
    // partition-grain statistics from the COMPACTED files; the oracle
    // recomputes them from the original events — a row lost, doubled,
    // or value-mangled by any interleaved swap turns the row red.
    // n_src (distinct ORIGIN files still named by every row) pins that
    // per-row lineage survived the rewrites — and, because countDistinct
    // is one of RollupMetadataAggregate's documented declines, it also
    // guarantees this query really SCANS the compacted files rather
    // than being served from the rollup partials (which would verify
    // the metadata, not the data, defeating the point).
    "q115_compacted_lake" -> ((s, d) => {
      val lay = IngestDemo.ensureCompacted(s, d)
      CuratedWriter.read(s, lay.curatedDir)
        .groupBy("day", "mode")
        .agg(count(lit(1)).as("n_rows"), count(col("value")).as("n_value"),
          countDistinct(col("source_file")).as("n_src"),
          sum(round(col("value") * lit(1000000)).cast("long")).as("value_e6"),
          unix_micros(min(col("event_time_utc")).cast("timestamp")).as("first_us"),
          unix_micros(max(col("event_time_utc")).cast("timestamp")).as("last_us"))
        .select(col("day").cast("int").as("day"), col("mode"), col("n_rows"),
          col("n_value"), col("n_src"), col("value_e6"), col("first_us"), col("last_us"))
        .orderBy("day", "mode")
    }),

    // HEAVY HITTERS at metadata cost: per-user event counts travel in
    // the rollup partials as frequent-items sketches
    // (approx_top_k_accumulate at file×partition grain), so "which
    // users sent ≥80 events this month" folds from the partial store —
    // never a lake scan, the q109 posture extended from reach to
    // frequency. At demo scale the merged sketch is EXACT (distinct
    // users ≪ the sketch capacity, Rollup.TopKCapacity scaladoc), so
    // the oracle is a plain exact recompute from the original events —
    // any eviction, merge error, or lost partial turns the row red. At
    // production cardinalities the same fold degrades to
    // guaranteed-error-bounded estimates (the HLL reach posture).
    // Threshold 80 ≈ 1.2× the generator's ~67 events/user mean, which
    // is scale-invariant, so the result is a non-empty upper tail at
    // every sf.
    "q117_heavy_hitters" -> ((s, d) => {
      val lay = IngestDemo.ensure(s, d)
      graft.ingest.Rollup.stats(s, lay.rollupDir)
        .filter(col("mode") =!= "synthetic")
        .agg(graft.ingest.Rollup.topKCombine("top_users").as("sk"))
        .select(explode(graft.ingest.Rollup.topKEstimate("sk")).as("e"))
        .select(col("e.item").cast("long").as("user_id"),
          col("e.count").cast("long").as("n_events"))
        .filter(col("n_events") >= 80)
        .orderBy(desc("n_events"), col("user_id"))
    }),

    // VALUE-range zone maps on the oracle surface (round 16): a value
    // predicate is invisible to the date partitioning AND to the
    // event-time zones — the FileBounds sidecar's per-file value
    // min/max, folded to partition grain under the coverage proof
    // (Σ bounds rows ≡ Σ partial rows), prunes it instead
    // (plans/RollupPartitionSkip move 2; RollupSkipSpec asserts the
    // pruning on a crafted lake — at demo scale the near-uniform value
    // distribution keeps most partitions qualifying, which is honest:
    // zone maps pay off exactly when data clusters). This query's
    // oracle proves the value-zoned answer equals the events recompute;
    // extremes leave as e6 ints (integer-exact cross-engine).
    "q119_valuerange_skip" -> ((s, d) => {
      val lay = IngestDemo.ensure(s, d)
      CuratedWriter.read(s, lay.curatedDir)
        .filter(col("value") >= lit(300.0))
        .groupBy("mode")
        .agg(count(lit(1)).as("n_rows"),
          sum(round(col("value") * lit(1000000)).cast("long")).as("value_e6"),
          round(min(col("value")) * lit(1000000)).cast("long").as("min_v_e6"),
          round(max(col("value")) * lit(1000000)).cast("long").as("max_v_e6"))
        .orderBy("mode")
    }),

    // GENERALIZED zone maps (round 17): the bounds sidecar is no longer
    // two hardcoded columns — FileBounds.boundsColumns gives every
    // numeric/timestamp curated column a per-file (nn_, min_, max_)
    // triplet, schema-driven, so "filter on a column added last
    // quarter" prunes like the originals do. This query range-filters
    // user_id — a column the round-16 store knew nothing about — and
    // its oracle proves the generically-zoned answer equals the events
    // recompute (RollupSkipSpec asserts the actual partition/file
    // pruning on crafted lakes with disjoint per-partition user ranges,
    // plus the fail-open on mixed-generation stores).
    "q120_colrange_skip" -> ((s, d) => {
      val lay = IngestDemo.ensure(s, d)
      CuratedWriter.read(s, lay.curatedDir)
        .filter(col("user_id") >= lit(3L) && col("user_id") < lit(10L))
        .groupBy("mode")
        .agg(count(lit(1)).as("n_rows"),
          sum(round(col("value") * lit(1000000)).cast("long")).as("value_e6"),
          min(col("user_id")).as("min_uid"),
          max(col("user_id")).as("max_uid"))
        .orderBy("mode")
    }),

    // EXTERNAL snapshot consumption (round 17): the reference's
    // consumption layer is Athena reading the lake directly
    // (diagram_1.txt:98-101) — an engine that cannot run this library's
    // snapshot-pinned reads. LakeSnapshot.publishSymlinks opts the lake
    // into per-leaf symlink manifests (the Delta symlink_format_manifest
    // move), and THIS query reads the lake exactly as that external
    // engine would: resolve the `_symlinks/` listings, then a PLAIN
    // spark.read.parquet over the listed paths (basePath for partition
    // discovery — no LakeSnapshot code at scan time). The oracle proves
    // the externally-resolved snapshot equals the events recompute;
    // CompactionReaderSpec proves the same read stays row-identical
    // ACROSS a concurrent swap (old manifests resolve to retired-not-
    // deleted files, refreshed manifests to the compacted generation).
    // The publish guard re-seeds the tree when the workspace moved
    // (manifest paths are absolute, the snapshot convention) — one lake
    // walk, once per workspace.
    // STRING zone maps (round 17): the bounds sidecar tracks string
    // columns too (all-or-nothing per file under FileBounds'
    // StringBoundsCap — withheld bounds fail open), so a range or
    // membership predicate on a short string column (app_version here)
    // prunes partitions/files exactly like a numeric one. The window
    // extraction compares UTF8String-side so the Scala tighten/invert
    // decisions agree with Spark's binary string order. Oracle
    // recomputes through the app_version derivation's integer preimage
    // (uid%5 ∈ {3,4}) — cross-engine string MIN/MAX stays safe because
    // the values are ASCII.
    "q122_strrange_skip" -> ((s, d) => {
      val lay = IngestDemo.ensure(s, d)
      CuratedWriter.read(s, lay.curatedDir)
        .filter(col("app_version") >= lit("1.3.0") && col("app_version") < lit("1.5.0"))
        .groupBy("mode")
        .agg(count(lit(1)).as("n_rows"),
          sum(round(col("value") * lit(1000000)).cast("long")).as("value_e6"),
          min(col("app_version")).as("min_av"),
          max(col("app_version")).as("max_av"))
        .orderBy("mode")
    }),

    // PREFIX predicates (round 17): `LIKE 'p%'` reaches the zone maps
    // as a [p, nextPrefix(p)) window under binary string order, so an
    // id-prefix probe — the "fetch one tenant/shard's records" shape —
    // prunes partitions and files like a range does. transaction_id is
    // "t-<event_id>", so the prefix's integer preimage is exact for the
    // oracle.
    "q123_prefix_skip" -> ((s, d) => {
      val lay = IngestDemo.ensure(s, d)
      CuratedWriter.read(s, lay.curatedDir)
        .filter(col("transaction_id").like("t-1%"))
        .groupBy("mode")
        .agg(count(lit(1)).as("n_rows"),
          sum(round(col("value") * lit(1000000)).cast("long")).as("value_e6"),
          min(col("transaction_id")).as("min_tid"),
          max(col("transaction_id")).as("max_tid"))
        .orderBy("mode")
    }),

    // DISJUNCTION windows (round 18): "compare two periods" — the BI
    // staple over the reference's DATE/MODE consumption pattern
    // (diagram_1.txt:100) — is an OR of two event-time ranges, which no
    // single [lo, hi] window represents. The skip rule folds an Or
    // conjunct whose every disjunct bounds ONE column into a UNION of
    // windows (RollupPartitionSkip round-18 extraction): a partition or
    // file prunes when its zone intersects NEITHER window. Before this,
    // the shape scanned the whole lake. The oracle proves the
    // union-pruned answer equals the events recompute; RollupSkipSpec
    // asserts the actual partition drops and the mixed-column bail-out.
    "q124_orwindow_skip" -> ((s, d) => {
      val lay = IngestDemo.ensure(s, d)
      CuratedWriter.read(s, lay.curatedDir)
        .filter(
          (col("event_time_utc") >= lit("2024-01-05 00:00:00").cast("timestamp_ntz") &&
            col("event_time_utc") < lit("2024-01-07 00:00:00").cast("timestamp_ntz")) ||
          (col("event_time_utc") >= lit("2024-01-20 00:00:00").cast("timestamp_ntz") &&
            col("event_time_utc") < lit("2024-01-22 00:00:00").cast("timestamp_ntz")))
        .groupBy("mode")
        .agg(count(lit(1)).as("n_rows"),
          sum(round(col("value") * lit(1000000)).cast("long")).as("value_e6"),
          unix_micros(min(col("event_time_utc")).cast("timestamp")).as("first_us"),
          unix_micros(max(col("event_time_utc")).cast("timestamp")).as("last_us"))
        .orderBy("mode")
    }),

    // NULLNESS zones (round 18): the sidecar's nn_<c> null counts make
    // IS [NOT] NULL prunable — a covered partition with zero nulls
    // cannot satisfy IS NULL, an all-null one cannot satisfy IS NOT
    // NULL. The probe column is extra_field, the fixture's DRIFTED key
    // (present only in the day-25 drift batch): `IS NULL` selects
    // exactly the pre-drift history and PRUNES the drift partition —
    // the inverse shape (`IS NOT NULL`, "find the records that have the
    // new field") prunes everything else and is RollupSkipSpec-pinned.
    // The oracle is the plain events recompute (drift rows are the only
    // non-null extra_field carriers and they are synthetic additions).
    "q125_nullness_skip" -> ((s, d) => {
      val lay = IngestDemo.ensure(s, d)
      CuratedWriter.read(s, lay.curatedDir)
        .filter(col("extra_field").isNull)
        .groupBy("mode")
        .agg(count(lit(1)).as("n_rows"),
          sum(round(col("value") * lit(1000000)).cast("long")).as("value_e6"))
        .orderBy("mode")
    }),

    // WITHHELD-bounds observability (round 18): StringBoundsCap silently
    // withholds a file's string min/max when any value exceeds the cap
    // (fail-open, FileBounds scaladoc) — sound, but "why doesn't my
    // string predicate prune" was unanswerable from metadata. This
    // audit folds the store once: per tracked string column, how many
    // files know it vs withheld it. On the demo lake exactly ONE column
    // is withheld — source_file, the lineage column, whose absolute raw
    // paths exceed the 64-char cap in every file — and every id-shaped
    // column (the ones predicates actually prune on) is fully covered;
    // the flags are deterministic, so the oracle pins them as literals.
    "q126_withheld_audit" -> ((s, d) => {
      val lay = IngestDemo.ensure(s, d)
      graft.ingest.FileBounds.withheldAudit(s, lay.fileBoundsDir)
        .select(col("col_name"),
          (col("files_withheld") > 0).cast("int").as("any_withheld"),
          (col("files_known") > 0).cast("int").as("any_known"))
        .orderBy("col_name")
    }),

    // CLUSTERED compaction (round 18): the time-sorted rewrite keeps
    // file-grain zone windows tight on event time ONLY — every output
    // file still spans the full user_id range, so the id-window half of
    // the reference's consumption mix (diagram_1.txt:100-107: date/mode
    // slices AND id-shaped lookups over one curated lake) prunes
    // nothing on the compacted bulk. q127's fixture lake is compacted
    // along an interleaved z-curve over (event_time_utc, user_id)
    // instead (Compactor.clusterCols → ZCluster), so the swap-batch
    // bounds narrow on BOTH columns; this user-window aggregate then
    // proves the clustered lake's rows are exactly the events
    // recompute — a row lost, doubled, or content-mangled by the
    // z-layout turns the driver row red. ZClusterSpec pins the layout
    // payoff itself (per-file spans narrow, both window shapes drop
    // files) on a controlled lake.
    "q127_clustered_skip" -> ((s, d) => {
      val lay = IngestDemo.ensureClustered(s, d)
      CuratedWriter.read(s, lay.curatedDir)
        .filter(col("user_id") >= lit(3L) && col("user_id") <= lit(9L))
        .groupBy("mode")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("user_id")).as("n_users"),
          sum(round(col("value") * lit(1000000)).cast("long")).as("value_e6"),
          unix_micros(min(col("event_time_utc")).cast("timestamp")).as("first_us"),
          unix_micros(max(col("event_time_utc")).cast("timestamp")).as("last_us"))
        .orderBy("mode")
    }),

    // COMPLEMENT-form membership (round 19): the wide-window shape — a
    // filter most of a lake satisfies — is where the positive IN list
    // overflows its cap and the rewrite flips to `NOT (struct IN
    // (excluded...))` instead of declining (RollupPartitionSkip
    // complement path). Everything from Jan 3 on qualifies ~145 of the
    // demo lake's 151 leaves; under this query's lowered cap (64, via
    // [[antiCapSession]]) the qualifying list overflows while the ~10
    // excluded leaves fit, so the NOT-IN conjunct — not a decline —
    // serves the scan (RollupSkipSpec pins the plan; the driver's hash
    // check here pins the rows). The synthetic drift partition is
    // excluded the same way q121 does, so the oracle is the plain
    // events recompute of the window.
    "q128_antiwindow_skip" -> ((s, d) => {
      val lay = IngestDemo.ensure(s, d)
      CuratedWriter.read(antiCapSession(s), lay.curatedDir)
        .filter(col("event_time_utc") >=
            lit("2024-01-03 00:00:00").cast("timestamp_ntz") &&
          col("mode") =!= "synthetic")
        .groupBy("mode")
        .agg(count(lit(1)).as("n_rows"),
          sum(round(col("value") * lit(1000000)).cast("long")).as("value_e6"),
          unix_micros(min(col("event_time_utc")).cast("timestamp")).as("first_us"),
          unix_micros(max(col("event_time_utc")).cast("timestamp")).as("last_us"))
        .orderBy("mode")
    }),

    // BLOOM-filter file skipping (round 19): the membership complement
    // of the zone windows, for the id-lookup half of the reference's
    // consumption mix on UNCLUSTERED hash-shaped keys — q129's fixture
    // lake ([[IngestDemo.ensureBloomed]]) carries a Knuth-scrambled
    // `lookup_key` whose per-file [min, max] spans essentially the
    // whole key space in EVERY file, so range/prefix/z-cluster pruning
    // is structurally useless; the sidecar's per-file Bloom filters
    // (`bf_lookup_key`) are what drop the files whose filters reject
    // every probed key. Probe keys are the three smallest day-12 event
    // ids, recomputed per scale factor on both sides, so the probe
    // always hits the lake's window and the oracle recomputes the
    // exact keys from the original events. The driver's hash check
    // pins the rows; BloomSkipSpec pins the plan (fewer files listed
    // than a bloom-less twin keeps, never a containing file dropped).
    "q129_bloom_lookup" -> ((s, d) => {
      val lay = IngestDemo.ensureBloomed(s, d)
      // probe keys are a pure function of the immutable testdata —
      // memoized per sf so repeated invocations (bench reps) pay the
      // tiny selection job once, like the demo lakes themselves
      val keys = bloomProbeKeys.computeIfAbsent(d, dir =>
        graft.engine.Tables.load(s, dir, "events")
          .filter(year(col("ts")) === 2024 && month(col("ts")) === 1 &&
            dayofmonth(col("ts")) === 12)
          .orderBy("event_id").limit(3)
          .select(concat(lit("k-"),
            (col("event_id") * lit(2654435761L)) % lit(1000000007L)).as("k"))
          .collect().map(_.getString(0)).toSeq)
      CuratedWriter.read(s, lay.curatedDir)
        .filter(col("lookup_key").isin(keys: _*))
        .agg(count(lit(1)).as("n_rows"),
          sum(round(col("value") * lit(1000000)).cast("long")).as("value_e6"),
          min(col("record_id")).as("min_rid"),
          max(col("record_id")).as("max_rid"))
    }),

    // The LAYOUT ADVISOR (round 20): fold an engineered, published
    // predicate history (IngestDemo.ensureAdvisorHistory — 7 membership
    // probes on the hash-shaped lookup_key, 4+3 window probes on
    // event_time_utc/value, nullness-only on user_id) with the bloom
    // lake's bounds-sidecar window widths into one verdict row per
    // advisable column: lookup_key → `bloom` (membership-probed, windows
    // structurally useless), event_time_utc/value → `cluster`
    // (window-probed), everything else → `none`. The oracle pins the
    // whole verdict table as literals — counts are engineered constants
    // and verdicts are sf-independent (a hash-shaped key is wide at
    // every scale). LayoutAdvisorSpec drives the recommended layout
    // through the skip machinery and shows it beats the default.
    "q130_layout_advisor" -> ((s, d) => {
      val lay = IngestDemo.ensureAdvisorHistory(s, d)
      graft.monitor.LayoutAdvisor.recommend(s, lay.root)
        .select("col_name", "eq_q", "range_q", "verdict")
        .orderBy("col_name")
    }),

    "q121_external_snapshot" -> ((s, d) => {
      val lay = IngestDemo.ensure(s, d)
      val root0 = new org.apache.hadoop.fs.Path(lay.curatedDir)
      val fs = graft.engine.Fs.of(s.sparkContext.hadoopConfiguration, root0)
      val root = fs.makeQualified(root0)
      // staleness probe on ONE manifest (round 22): the old probe
      // resolved the ENTIRE symlink tree — ~180 driver-side manifest
      // opens per run — only to test its first path; the fresh/stale
      // answer is identical reading just the first manifest's first line
      val slDir = new org.apache.hadoop.fs.Path(root, graft.ingest.LakeSnapshot.SymlinkDir)
      val firstManifest =
        if (!fs.exists(slDir)) None
        else fs.listStatus(slDir).toSeq
          .filter(st => st.isFile && st.getPath.getName.endsWith(".txt") &&
            !st.getPath.getName.startsWith(".")).sortBy(_.getPath.getName).headOption
      val stale = firstManifest.forall { st =>
        val in = fs.open(st.getPath)
        val head =
          try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
            .find(_.nonEmpty)
          finally in.close()
        head.forall(p => !fs.exists(new org.apache.hadoop.fs.Path(p)))
      }
      if (stale) graft.ingest.LakeSnapshot.publishSymlinks(fs, root): Unit
      // plan memo keyed on the _symlinks dir listing (the snapshot's
      // whole identity — manifests are replaced atomically in place):
      // re-resolving ~180 manifests and re-constructing the 300-path
      // read cost ~0.4 s/run of pure driver metadata work
      graft.engine.Tables.memo(s, slDir.toString) {
        val paths = graft.ingest.LakeSnapshot.symlinkSnapshotPaths(fs, root)
        s.read.option("basePath", lay.curatedDir).parquet(paths: _*)
      }
        .filter(col("event_time_utc") >= lit("2024-01-15 00:00:00").cast("timestamp_ntz") &&
          col("mode") =!= "synthetic")
        .groupBy("mode")
        .agg(count(lit(1)).as("n_rows"),
          sum(round(col("value") * lit(1000000)).cast("long")).as("value_e6"))
        .orderBy("mode")
    }),

    // The q115 lake's PHYSICAL LAYOUT invariants, pinned by the oracle
    // as literals: after maintenance every (day, mode) partition is
    // exactly ONE file (n_files via count(distinct _metadata.file_path)
    // must equal the oracle's literal 1) and each file is internally
    // SORTED by event time (sorted_ok: a lag() over _metadata.row_index
    // per file — parquet row position, so the check sees the file's
    // byte order, not an incidental scan order — must equal the
    // oracle's literal 1). This makes the compactor's two layout
    // promises — merged files, range-tiled row groups — driver-checked
    // facts rather than spec-only assertions.
    "q116_layout_audit" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val lay = IngestDemo.ensureCompacted(s, d)
      val w = Window.partitionBy("fp").orderBy("ri")
      // fb_live (round 19): the sidecar's LIVE row count per leaf, on
      // the same audit row as the physical file count. On a healthy
      // compacted lake the two are EQUAL (one bounds row per live file
      // — the swap-batch + tombstone protocol's invariant); a gap means
      // bounds rows leaked past a swap (fold input growing, skipping
      // degrading) and the metadata-only read here surfaces it without
      // listing a single data file.
      val fb = graft.ingest.FileBounds.all(s, lay.fileBoundsDir)
        .groupBy(col("day").cast("int").as("day"), col("mode"))
        .agg(count(lit(1)).as("fb_live"))
      CuratedWriter.read(s, lay.curatedDir)
        .select(col("day"), col("mode"), col("event_time_utc"),
          col("_metadata.file_path").as("fp"), col("_metadata.row_index").as("ri"))
        .withColumn("prev", lag(col("event_time_utc"), 1).over(w))
        .groupBy(col("day").cast("int").as("day"), col("mode"))
        .agg(countDistinct(col("fp")).as("n_files"),
          min(when(col("prev").isNull ||
            col("prev") <= col("event_time_utc"), 1).otherwise(0))
            .cast("int").as("sorted_ok"),
          count(lit(1)).as("n_rows"))
        .join(fb, Seq("day", "mode"), "left")
        .withColumn("fb_live", coalesce(col("fb_live"), lit(0L)))
        .orderBy("day", "mode")
    }),

    // S9/P9/S10: the catalog consumption path — saveAsTable'd curated
    // lake read back via spark.table with partition-pruning filters.
    "q41_catalog_pruned" -> ((s, d) => {
      val tbl = IngestDemo.ensureCatalog(s, d)
      s.table(tbl)
        .filter(col("mode") === "purchase" &&
          col("year") === 2024 && col("month") === 1 && col("day").between(5, 8))
        .groupBy("day")
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_value_c"))
        .orderBy("day")
    }))

  val defsBucketed: Map[String, Q] = Map(
    // P9 at runtime: DYNAMIC partition pruning — the pruning value is not
    // a literal but comes from a joined dimension (peak days), so
    // Catalyst injects a dynamicpruning# subquery into the partitioned
    // table's PartitionFilters and only day=10/day=20 directories are
    // scanned (asserted on the plan in PruningSpec). The static-literal
    // variant is q39/q41.
    "q52_dpp_pruned" -> ((s, d) => {
      val tbl = IngestDemo.ensureCatalog(s, d)
      val dim = graft.engine.Tables.parquet(s, IngestDemo.ensureDayDim(s, d))
        .filter(col("kind") === "peak")
      s.table(tbl)
        .join(broadcast(dim), Seq("day"))
        .filter(col("year") === 2024 && col("month") === 1)
        .groupBy("mode")
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_value_c"))
        .orderBy("mode")
    }),

    // J1 at lay-out level: co-located (bucketed) star join — both fact
    // tables bucketed 8 ways on the order key with in-bucket sort, so the
    // sort-merge join runs with ZERO exchange and ZERO sort operators
    // (asserted on the physical plan in BucketedJoinSpec). The merge hint
    // keeps Catalyst from broadcasting the small test-scale side, which
    // would hide the property being demonstrated.
    "q48_bucketed_join" -> ((s, d) => {
      val (ot, lt) = IngestDemo.ensureBucketed(s, d)
      s.table(lt).hint("merge")
        .join(s.table(ot), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("rev_c"))
        .orderBy("o_orderpriority")
    }))

  val oracles: Map[String, String] = Map(
    "q52_dpp_pruned" ->
      """SELECT event_type AS mode, COUNT(*) AS n,
         CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
         FROM events WHERE day(ts) IN (10, 20)
         GROUP BY 1 ORDER BY 1""",
    "q48_bucketed_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
         CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
           AS rev_c
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY 1 ORDER BY 1""",
    "q38_ingest_segregation" ->
      """SELECT CAST(5 AS BIGINT) AS clean_files, CAST(3 AS BIGINT) AS quarantined_files,
         (SELECT COUNT(*) FROM events) + 4 AS curated_rows, CAST(12 AS BIGINT) AS dlq_rows""",
    "q39_ingest_pruned" ->
      """SELECT event_type AS mode, COUNT(*) AS n,
         CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
         FROM events
         WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-13'
         GROUP BY 1 ORDER BY 1""",
    "q109_rollup_stats" ->
      """WITH base AS (
           SELECT year(ts) AS y, month(ts) AS m, day(ts) AS d,
                  event_type AS mode, event_id % 4 AS shard, value FROM events),
         agg AS (
           SELECT y, m, d, mode, COUNT(DISTINCT shard) AS n_files,
                  COUNT(*) AS n_rows, COUNT(value) AS n_value,
                  SUM(CAST(ROUND(value*1000000) AS BIGINT)) AS value_e6
           FROM base GROUP BY 1, 2, 3, 4
           UNION ALL
           SELECT 2024, 1, 25, 'synthetic', 1, 4, 4, 9000000)
         SELECT CAST(y AS INT) AS year, CAST(m AS INT) AS month,
                CAST(d AS INT) AS day, mode,
                CAST(n_files AS BIGINT) AS n_files, CAST(n_rows AS BIGINT) AS n_rows,
                CAST(n_value AS BIGINT) AS n_value, CAST(value_e6 AS BIGINT) AS value_e6
         FROM agg ORDER BY 1, 2, 3, 4""",
    "q110_rollup_reconcile" ->
      """WITH base AS (
           SELECT year(ts) AS y, month(ts) AS m, event_type AS mode,
                  CAST(event_id % 4 AS VARCHAR) AS f, value, user_id FROM events
           UNION ALL
           SELECT 2024, 1, 'synthetic', 'drift', 2.25, 1 FROM range(4))
         SELECT CAST(COALESCE(y, 0) AS INT) AS year,
                CAST(COALESCE(m, 0) AS INT) AS month,
                COALESCE(mode, 'ALL') AS mode,
                COUNT(*) AS n_rows, COUNT(value) AS n_value,
                CAST(SUM(CAST(ROUND(value*1000000) AS BIGINT)) AS BIGINT) AS value_e6,
                COUNT(DISTINCT f) AS n_files,
                COUNT(DISTINCT user_id) AS n_users,
                CAST(1 AS INT) AS rows_match, CAST(1 AS INT) AS value_match,
                CAST(1 AS INT) AS value_e6_match, CAST(1 AS INT) AS files_match,
                CAST(1 AS INT) AS reach_ok
         FROM base GROUP BY GROUPING SETS ((y, m, mode), ())
         ORDER BY 1, 2, 3""",
    "q111_metadata_agg" ->
      """SELECT CAST(year(ts) AS INT) AS year, CAST(month(ts) AS INT) AS month,
              CAST(day(ts) AS INT) AS day, event_type AS mode,
              COUNT(*) AS n_rows, COUNT(value) AS n_value,
              epoch_us(MIN(ts)) AS first_us, epoch_us(MAX(ts)) AS last_us
         FROM events
         WHERE year(ts) = 2024 AND month(ts) = 1 AND day(ts) BETWEEN 5 AND 20
         GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4""",
    "q112_metadata_value" ->
      """SELECT CAST(year(ts) AS INT) AS year, CAST(month(ts) AS INT) AS month,
              event_type AS mode,
              COUNT(*) AS n_rows, COUNT(value) AS n_value,
              CAST(SUM(CAST(ROUND(value*1000000) AS BIGINT)) AS BIGINT) AS value_e6,
              CAST(1 AS INT) AS reach_ok
         FROM events
         WHERE year(ts) = 2024 AND month(ts) = 1 AND day(ts) BETWEEN 5 AND 20
         GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    "q113_metadata_global" ->
      """SELECT COUNT(*) AS n_rows, COUNT(value) AS n_value,
              CAST(SUM(CAST(ROUND(value*1000000) AS BIGINT)) AS BIGINT) AS value_e6,
              epoch_us(MIN(ts)) AS first_us, epoch_us(MAX(ts)) AS last_us
         FROM events
         WHERE year(ts) = 2024 AND month(ts) = 1 AND day(ts) BETWEEN 5 AND 20""",
    "q114_timerange_skip" ->
      """SELECT event_type AS mode, COUNT(*) AS n_rows,
              CAST(SUM(CAST(ROUND(value*1000000) AS BIGINT)) AS BIGINT) AS value_e6,
              epoch_us(MIN(ts)) AS first_us, epoch_us(MAX(ts)) AS last_us
         FROM events
         WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
           AND ts < TIMESTAMP '2024-01-12 00:00:00'
         GROUP BY 1 ORDER BY 1""",
    "q115_compacted_lake" ->
      """SELECT CAST(day(ts) AS INT) AS day, event_type AS mode,
              COUNT(*) AS n_rows, COUNT(value) AS n_value,
              COUNT(DISTINCT event_id % 2) AS n_src,
              CAST(SUM(CAST(ROUND(value*1000000) AS BIGINT)) AS BIGINT) AS value_e6,
              epoch_us(MIN(ts)) AS first_us, epoch_us(MAX(ts)) AS last_us
         FROM events
         WHERE year(ts) = 2024 AND month(ts) = 1 AND day(ts) BETWEEN 10 AND 16
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q119_valuerange_skip" ->
      """SELECT event_type AS mode, COUNT(*) AS n_rows,
              CAST(SUM(CAST(ROUND(value*1000000) AS BIGINT)) AS BIGINT) AS value_e6,
              CAST(ROUND(MIN(value)*1000000) AS BIGINT) AS min_v_e6,
              CAST(ROUND(MAX(value)*1000000) AS BIGINT) AS max_v_e6
         FROM events WHERE value >= 300.0
         GROUP BY 1 ORDER BY 1""",
    "q120_colrange_skip" ->
      """SELECT event_type AS mode, COUNT(*) AS n_rows,
              CAST(SUM(CAST(ROUND(value*1000000) AS BIGINT)) AS BIGINT) AS value_e6,
              MIN(user_id) AS min_uid, MAX(user_id) AS max_uid
         FROM events WHERE user_id >= 3 AND user_id < 10
         GROUP BY 1 ORDER BY 1""",
    "q121_external_snapshot" ->
      """SELECT event_type AS mode, COUNT(*) AS n_rows,
              CAST(SUM(CAST(ROUND(value*1000000) AS BIGINT)) AS BIGINT) AS value_e6
         FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
         GROUP BY 1 ORDER BY 1""",
    "q122_strrange_skip" ->
      """SELECT event_type AS mode, COUNT(*) AS n_rows,
              CAST(SUM(CAST(ROUND(value*1000000) AS BIGINT)) AS BIGINT) AS value_e6,
              MIN('1.' || CAST(user_id % 5 AS VARCHAR) || '.0') AS min_av,
              MAX('1.' || CAST(user_id % 5 AS VARCHAR) || '.0') AS max_av
         FROM events WHERE user_id % 5 IN (3, 4)
         GROUP BY 1 ORDER BY 1""",
    "q123_prefix_skip" ->
      """SELECT event_type AS mode, COUNT(*) AS n_rows,
              CAST(SUM(CAST(ROUND(value*1000000) AS BIGINT)) AS BIGINT) AS value_e6,
              MIN('t-' || CAST(event_id AS VARCHAR)) AS min_tid,
              MAX('t-' || CAST(event_id AS VARCHAR)) AS max_tid
         FROM events WHERE ('t-' || CAST(event_id AS VARCHAR)) LIKE 't-1%'
         GROUP BY 1 ORDER BY 1""",
    "q124_orwindow_skip" ->
      """SELECT event_type AS mode, COUNT(*) AS n_rows,
              CAST(SUM(CAST(ROUND(value*1000000) AS BIGINT)) AS BIGINT) AS value_e6,
              epoch_us(MIN(ts)) AS first_us, epoch_us(MAX(ts)) AS last_us
         FROM events
         WHERE (ts >= TIMESTAMP '2024-01-05 00:00:00'
                AND ts < TIMESTAMP '2024-01-07 00:00:00')
            OR (ts >= TIMESTAMP '2024-01-20 00:00:00'
                AND ts < TIMESTAMP '2024-01-22 00:00:00')
         GROUP BY 1 ORDER BY 1""",
    "q128_antiwindow_skip" ->
      """SELECT event_type AS mode, COUNT(*) AS n_rows,
              CAST(SUM(CAST(ROUND(value*1000000) AS BIGINT)) AS BIGINT) AS value_e6,
              epoch_us(MIN(ts)) AS first_us, epoch_us(MAX(ts)) AS last_us
         FROM events WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'
         GROUP BY 1 ORDER BY 1""",
    "q125_nullness_skip" ->
      """SELECT event_type AS mode, COUNT(*) AS n_rows,
              CAST(SUM(CAST(ROUND(value*1000000) AS BIGINT)) AS BIGINT) AS value_e6
         FROM events
         GROUP BY 1 ORDER BY 1""",
    "q129_bloom_lookup" ->
      """WITH keys AS (
           SELECT 'k-' || CAST((event_id * 2654435761) % 1000000007 AS VARCHAR) AS k
           FROM events
           WHERE year(ts) = 2024 AND month(ts) = 1 AND day(ts) = 12
           ORDER BY event_id LIMIT 3)
         SELECT COUNT(*) AS n_rows,
              CAST(SUM(CAST(ROUND(value*1000000) AS BIGINT)) AS BIGINT) AS value_e6,
              MIN('e-' || CAST(event_id AS VARCHAR)) AS min_rid,
              MAX('e-' || CAST(event_id AS VARCHAR)) AS max_rid
         FROM events
         WHERE year(ts) = 2024 AND month(ts) = 1 AND day(ts) BETWEEN 10 AND 16
           AND 'k-' || CAST((event_id * 2654435761) % 1000000007 AS VARCHAR)
               IN (SELECT k FROM keys)""",
    // deterministic by construction: the engineered history's counts
    // are constants and the verdicts are scale-independent (the
    // hash-shaped key's windows are wide at every sf; the probed
    // time/value columns cross the cluster threshold by count alone)
    "q130_layout_advisor" ->
      """SELECT * FROM (VALUES
           ('event_time_utc', CAST(0 AS BIGINT), CAST(4 AS BIGINT), 'cluster'),
           ('lookup_key', CAST(7 AS BIGINT), CAST(0 AS BIGINT), 'bloom'),
           ('record_id', CAST(0 AS BIGINT), CAST(0 AS BIGINT), 'none'),
           ('source_file', CAST(0 AS BIGINT), CAST(0 AS BIGINT), 'none'),
           ('user_id', CAST(0 AS BIGINT), CAST(0 AS BIGINT), 'none'),
           ('value', CAST(0 AS BIGINT), CAST(3 AS BIGINT), 'cluster'))
         AS t(col_name, eq_q, range_q, verdict) ORDER BY col_name""",
    // deterministic by construction: the tracked string columns are the
    // fixture schema's, and only source_file (absolute raw paths, always
    // past the 64-char cap) ever withholds bounds
    "q126_withheld_audit" ->
      """SELECT * FROM (VALUES
           ('app_version', 0, 1), ('extra_field', 0, 1), ('ml_mode', 0, 1),
           ('record_id', 0, 1), ('source_file', 1, 1),
           ('transaction_id', 0, 1), ('user_agent', 0, 1))
         AS t(col_name, any_withheld, any_known) ORDER BY col_name""",
    "q127_clustered_skip" ->
      """SELECT event_type AS mode, COUNT(*) AS n_rows,
              COUNT(DISTINCT user_id) AS n_users,
              CAST(SUM(CAST(ROUND(value*1000000) AS BIGINT)) AS BIGINT) AS value_e6,
              epoch_us(MIN(ts)) AS first_us, epoch_us(MAX(ts)) AS last_us
         FROM events
         WHERE year(ts) = 2024 AND month(ts) = 1 AND day(ts) BETWEEN 10 AND 16
           AND user_id BETWEEN 3 AND 9
         GROUP BY 1 ORDER BY 1""",
    "q116_layout_audit" ->
      """SELECT CAST(day(ts) AS INT) AS day, event_type AS mode,
              CAST(1 AS BIGINT) AS n_files, CAST(1 AS INT) AS sorted_ok,
              COUNT(*) AS n_rows, CAST(1 AS BIGINT) AS fb_live
         FROM events
         WHERE year(ts) = 2024 AND month(ts) = 1 AND day(ts) BETWEEN 10 AND 16
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q117_heavy_hitters" ->
      """SELECT user_id, COUNT(*) AS n_events
         FROM events
         WHERE year(ts) = 2024 AND month(ts) = 1
         GROUP BY 1 HAVING COUNT(*) >= 80
         ORDER BY n_events DESC, user_id""",
    "q40_ledger_audit" ->
      """SELECT 'QUARANTINED' AS processing_status, CAST(3 AS BIGINT) AS n_files,
              CAST(3 AS BIGINT) AS n_retries, CAST(3 AS BIGINT) AS n_stamped,
              CAST(3 AS BIGINT) AS n_errors
         UNION ALL
         SELECT 'SUCCEEDED', CAST(5 AS BIGINT), CAST(5 AS BIGINT), CAST(5 AS BIGINT),
              CAST(0 AS BIGINT)
         ORDER BY processing_status""",
    "q45_stream_ingest" ->
      """SELECT (SELECT COUNT(*) FROM events) + 4 AS curated_rows,
         CAST(12 AS BIGINT) AS dlq_rows""",
    "q46_stream_hourly" ->
      """WITH ev AS (
           SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS h FROM events
           UNION ALL
           SELECT epoch_us(TIMESTAMP '2024-01-25 10:00:00') AS h FROM range(4))
         SELECT h AS h_start_us, COUNT(*) AS n FROM ev GROUP BY 1 ORDER BY 1""",
    "q55_catalog_evolution" ->
      """SELECT '(pre)' AS note, COUNT(*) AS n,
         CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
         FROM events
         WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-03'
         UNION ALL
         SELECT 'evolved', CAST(2 AS BIGINT), CAST(350 AS BIGINT)
         ORDER BY note""",
    "q61_stream_join" ->
      """SELECT COUNT(*) AS n_pairs, COUNT(DISTINCT v.user_id) AS n_users,
         CAST(SUM(epoch_us(p.ts) - epoch_us(v.ts)) AS BIGINT) AS sum_gap_us
         FROM events v JOIN events p
           ON v.user_id = p.user_id
          AND v.event_type = 'view' AND p.event_type = 'purchase'
          AND epoch_us(p.ts) > epoch_us(v.ts)
          AND epoch_us(p.ts) <= epoch_us(v.ts) + 1800000000""",
    "q72_stream_dedup" ->
      """SELECT (SELECT COUNT(*) FROM events) AS n_events,
         (SELECT COUNT(DISTINCT user_id) FROM events) AS n_users,
         (SELECT CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) FROM events)
           AS sum_value_c,
         (SELECT CAST(COUNT(*) + SUM(CASE WHEN event_id % 10 IN (5, 6) THEN 1 ELSE 0 END)
                 AS BIGINT)
          FROM events) AS landing_rows""",
    "q57_monitor_alarms" ->
      """SELECT 'compaction_recovery' AS alarm, 'OK' AS state, CAST(0 AS BIGINT) AS metric
         UNION ALL SELECT 'data_freshness', 'OK', CAST(0 AS BIGINT)
         UNION ALL SELECT 'dedup_dlq_activity', 'OK', CAST(0 AS BIGINT)
         UNION ALL SELECT 'dlq_activity', 'ALARM', CAST(12 AS BIGINT)
         UNION ALL SELECT 'file_quarantine', 'ALARM', CAST(3 AS BIGINT)
         UNION ALL SELECT 'job_failure', 'OK', CAST(0 AS BIGINT)
         UNION ALL SELECT 'ledger_backlog', 'OK', CAST(0 AS BIGINT)
         UNION ALL SELECT 'quality_dlq_activity', 'OK', CAST(0 AS BIGINT)
         UNION ALL SELECT 'sketch_saturation', 'OK', CAST(0 AS BIGINT)
         UNION ALL SELECT 'slow_actions', 'OK', CAST(0 AS BIGINT)
         ORDER BY alarm""",
    // q94: the alarm set over the dedup-demo lake — the gate alarms in
    // their firing state, counts forced by the same fixture as q90.
    "q94_gate_alarms" ->
      """SELECT 'compaction_recovery' AS alarm, 'OK' AS state, CAST(0 AS BIGINT) AS metric
         UNION ALL SELECT 'data_freshness', 'OK', CAST(0 AS BIGINT)
         UNION ALL SELECT 'dedup_dlq_activity', 'ALARM', CAST(5 AS BIGINT)
         UNION ALL SELECT 'dlq_activity', 'OK', CAST(0 AS BIGINT)
         UNION ALL SELECT 'file_quarantine', 'OK', CAST(0 AS BIGINT)
         UNION ALL SELECT 'job_failure', 'OK', CAST(0 AS BIGINT)
         UNION ALL SELECT 'ledger_backlog', 'OK', CAST(0 AS BIGINT)
         UNION ALL SELECT 'quality_dlq_activity', 'ALARM', CAST(1 AS BIGINT)
         UNION ALL SELECT 'sketch_saturation', 'OK', CAST(0 AS BIGINT)
         UNION ALL SELECT 'slow_actions', 'OK', CAST(0 AS BIGINT)
         ORDER BY alarm""",
    // q90: every value is forced by DedupDemo's engineered fixture —
    // 959184 = round(47e6/49), the Jaccard of two 50-token docs
    // differing in the last token (47 of 49 distinct 3-shingles shared);
    // the tick-1 'quality' row is the planted garbage doc the ingest
    // quality gate diverts (score −3224999, DedupDemo.GarbageScoreE6);
    // the fingerprint-gate rows carry exact Hamming SIMILARITIES
    // ((64−h)·15625): tick-1 'fp_batch' = the identical planted image
    // pair (Hamming 0 → 1000000), tick-3 'fp_index' = the one-block-
    // flipped image vs the indexed tick-1 survivor (Hamming 1 → 984375).
    "q90_dedup_dlq_audit" ->
      """SELECT 'run-00001' AS job_run_id, 'batch' AS reason,
              CAST(1 AS BIGINT) AS n, CAST(959184 AS BIGINT) AS max_jac_e6
         UNION ALL SELECT 'run-00001', 'fp_batch', CAST(1 AS BIGINT), CAST(1000000 AS BIGINT)
         UNION ALL SELECT 'run-00001', 'quality', CAST(1 AS BIGINT), CAST(NULL AS BIGINT)
         UNION ALL SELECT 'run-00003', 'index', CAST(1 AS BIGINT), CAST(959184 AS BIGINT)
         UNION ALL SELECT 'run-00003', 'span-scrub', CAST(1 AS BIGINT), CAST(NULL AS BIGINT)
         UNION ALL SELECT 'run-00005', 'fp_index', CAST(1 AS BIGINT), CAST(984375 AS BIGINT)
         UNION ALL SELECT 'run-00005', 'index', CAST(1 AS BIGINT), CAST(959184 AS BIGINT)
         ORDER BY job_run_id, reason""",
    // q106: every value forced by ensureMultiGate's engineered fixture —
    // four disjoint tick-1 pairs (text 959184 / image 1000000 / audio
    // 1000000 / video 1000000), the garbage doc, four tick-2 index hits
    // (959184 / 984375 / 984375 / 984375), and the 4-doc published lake
    "q106_multigate_audit" ->
      """SELECT 'lake' AS job_run_id, 'curated' AS reason,
              CAST(4 AS BIGINT) AS n, CAST(NULL AS BIGINT) AS max_jac_e6
         UNION ALL SELECT 'run-00001', 'au_batch', CAST(1 AS BIGINT), CAST(1000000 AS BIGINT)
         UNION ALL SELECT 'run-00001', 'batch', CAST(1 AS BIGINT), CAST(959184 AS BIGINT)
         UNION ALL SELECT 'run-00001', 'fp_batch', CAST(1 AS BIGINT), CAST(1000000 AS BIGINT)
         UNION ALL SELECT 'run-00001', 'quality', CAST(1 AS BIGINT), CAST(NULL AS BIGINT)
         UNION ALL SELECT 'run-00001', 'vi_batch', CAST(1 AS BIGINT), CAST(1000000 AS BIGINT)
         UNION ALL SELECT 'run-00003', 'au_index', CAST(1 AS BIGINT), CAST(984375 AS BIGINT)
         UNION ALL SELECT 'run-00003', 'fp_index', CAST(1 AS BIGINT), CAST(984375 AS BIGINT)
         UNION ALL SELECT 'run-00003', 'index', CAST(1 AS BIGINT), CAST(959184 AS BIGINT)
         UNION ALL SELECT 'run-00003', 'vi_index', CAST(1 AS BIGINT), CAST(984375 AS BIGINT)
         ORDER BY job_run_id, reason""",
    "q41_catalog_pruned" ->
      """SELECT CAST(day(ts) AS INT) AS day, COUNT(*) AS n,
         CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
         FROM events
         WHERE event_type = 'purchase'
           AND ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-09'
         GROUP BY 1 ORDER BY 1""")
}
