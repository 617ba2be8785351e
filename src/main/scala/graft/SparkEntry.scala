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
      MultimodalOps.defs ++ CurationOps.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ EventOps.oracles ++ TextOps.oracles ++ DedupOps.oracles ++
      VectorOps.oracles ++ IngestQueries.oracles ++ MultimodalOps.oracles ++
      CurationOps.oracles

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
