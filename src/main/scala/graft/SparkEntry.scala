package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the per-module query inventories; every key in [[queries]]
  * that is SQL-expressible has a DuckDB oracle in [[oracleSql]].
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.defs ++ EventOps.defs ++ TextOps.defs ++ DedupOps.defs ++
      VectorOps.defs ++ IngestQueries.defs ++ MultimodalOps.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ EventOps.oracles ++ TextOps.oracles ++ DedupOps.oracles ++
      VectorOps.oracles ++ IngestQueries.oracles ++ MultimodalOps.oracles
}
