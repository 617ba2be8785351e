package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the per-module query inventories; every key in [[queries]]
  * that is SQL-expressible has a DuckDB oracle in [[oracleSql]].
  */
object SparkEntry {
  /** Flagship (SURVEY.md §7.6): the minimum end-to-end slice — raw JSON
    * fixtures → permissive read → segregate/DLQ → transform → partitioned
    * curated lake → partition-pruned aggregate. One DataFrame that proves
    * ingest → curate → query works. Driver smoke-checks rows>0 at sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q39_ingest_pruned")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.defs ++ EventOps.defs ++ TextOps.defs ++ DedupOps.defs ++
      VectorOps.defs ++ IngestQueries.defs ++ IngestQueries.defsBucketed ++
      MultimodalOps.defs ++ CurationOps.defs ++ ExportOps.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ EventOps.oracles ++ TextOps.oracles ++ DedupOps.oracles ++
      VectorOps.oracles ++ IngestQueries.oracles ++ MultimodalOps.oracles ++
      CurationOps.oracles ++ ExportOps.oracles

  /** Query name → the pre-buildable demo-artifact CHAINS it consumes
    * (chain names are Bench's vocabulary; Bench pre-builds exactly the
    * chains the selected queries list here, OUTSIDE its timing loop).
    * Lives beside [[queries]] so adding a query to the sweep and
    * declaring its artifacts is one edit site — previously Bench kept
    * hand-maintained prefix lists that could silently drift, charging a
    * new query's artifact construction to its own cold timing.
    * [[graft.Bench]] asserts every key here exists in [[queries]]. */
  val artifactDeps: Map[String, Seq[String]] = Map(
    "q38_ingest_segregation" -> Seq("ingest"),
    "q39_ingest_pruned" -> Seq("ingest"),
    "q40_ledger_audit" -> Seq("ingest"),
    "q41_catalog_pruned" -> Seq("ingest"),
    "q109_rollup_stats" -> Seq("ingest"),
    "q110_rollup_reconcile" -> Seq("ingest"),
    "q111_metadata_agg" -> Seq("ingest"),
    "q112_metadata_value" -> Seq("ingest"),
    "q113_metadata_global" -> Seq("ingest"),
    "q114_timerange_skip" -> Seq("ingest"),
    "q115_compacted_lake" -> Seq("compactlake"),
    "q116_layout_audit" -> Seq("compactlake"),
    "q117_heavy_hitters" -> Seq("ingest"),
    "q119_valuerange_skip" -> Seq("ingest"),
    "q120_colrange_skip" -> Seq("ingest"),
    "q121_external_snapshot" -> Seq("ingest"),
    "q122_strrange_skip" -> Seq("ingest"),
    "q123_prefix_skip" -> Seq("ingest"),
    "q124_orwindow_skip" -> Seq("ingest"),
    "q125_nullness_skip" -> Seq("ingest"),
    "q126_withheld_audit" -> Seq("ingest"),
    "q127_clustered_skip" -> Seq("clusterlake"),
    "q128_antiwindow_skip" -> Seq("ingest"),
    "q129_bloom_lookup" -> Seq("bloomlake"),
    "q130_layout_advisor" -> Seq("bloomlake"),
    "q48_bucketed_join" -> Seq("ingest"),
    "q52_dpp_pruned" -> Seq("ingest"),
    "q55_catalog_evolution" -> Seq("ingest"),
    "q57_monitor_alarms" -> Seq("ingest"),
    "q45_stream_ingest" -> Seq("stream"),
    "q46_stream_hourly" -> Seq("stream"),
    "q61_stream_join" -> Seq("stream"),
    "q72_stream_dedup" -> Seq("stream"),
    "q51_ann_ivf" -> Seq("ivf"),
    "q64_quantized_topk" -> Seq("ivf"),
    "q49_embed_neardup" -> Seq("embedtables"),
    "q82_indexed_dedup" -> Seq("mhindex"),
    "q83_appended_dedup" -> Seq("mhindex"),
    "q89_indexed_spans" -> Seq("mhindex"),
    "q86_stream_neardup" -> Seq("sneardup"),
    "q31_lang_guess" -> Seq("langmodel"),
    "q84_trained_quality" -> Seq("qualmodel"),
    "q90_dedup_dlq_audit" -> Seq("deduplake"),
    "q94_gate_alarms" -> Seq("deduplake"),
    "q106_multigate_audit" -> Seq("mgatelake"),
    "q108_export_roundtrip" -> Seq("export"),
    "q118_export_append" -> Seq("exportappend"),
    "q99_image_fp_probe" -> Seq("fpidx"))

  /** Library-consumer cache hygiene: run `queries(name)` through
    * `action` (which must EXECUTE the frame — count/collect/write), then
    * unpersist exactly the session-lifetime caches the query planted
    * (the shingled corpus in q32/q33/q65/q74, the LSH bucket coding in
    * q49, …). Precise alternative to `spark.catalog.clearCache()`, which
    * would also evict the caller's own cached tables. Ownership is a
    * per-call thread-bound token (QueryCaches.scoped), so frames tracked
    * before the call — or by a concurrent runAndRelease on another
    * thread — are untouched; release is newest-first and non-blocking. */
  def runAndRelease[A](spark: SparkSession, sfDir: String, name: String)
                      (action: DataFrame => A): A =
    QueryCaches.scoped(action(queries(name)(spark, sfDir)))
}
