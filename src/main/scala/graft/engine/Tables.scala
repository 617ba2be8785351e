package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet star schema (TESTDATA.md).
  *
  * All tables are read as-is except `events`, whose `ts` column is parquet
  * TIMESTAMP(NANOS) — Spark has no nanosecond timestamp type, so we read it
  * via `spark.sql.legacy.parquet.nanosAsLong` and normalize to:
  *   - `ts_us`  : epoch microseconds (bigint, exact; floor(nanos/1000) ==
  *                DuckDB's `epoch_us(ts)` for positive epochs)
  *   - `ts`     : TIMESTAMP_NTZ at microsecond precision (for window()/
  *                date_trunc style operators; session TZ is pinned UTC)
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = name match {
    case "events" =>
      // Session builders (Verify/Bench/specs) must set
      // spark.sql.legacy.parquet.nanosAsLong=true; setting it here as a
      // conf mutation inside a loader would race a parallel query runner.
      require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false").equalsIgnoreCase("true"),
        "session must set spark.sql.legacy.parquet.nanosAsLong=true to read events.parquet")
      val raw = spark.read.parquet(s"$sfDir/events.parquet")
      raw
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("ts", timestamp_micros(col("ts_us")).cast("timestamp_ntz"))
    case _ =>
      spark.read.parquet(s"$sfDir/$name.parquet")
  }
}

/** Column helpers shared by the query inventory.
  *
  * Money/score columns are emitted as *scaled integers* (cents, 1e-4, 1e-6
  * units). Rationale: double-sum results depend on addition order, which
  * differs between Spark partial aggregation and the DuckDB oracle; rounding
  * each ROW to an integer before the SUM makes the aggregate an exact bigint
  * sum that is order-independent and hash-comparable. The per-row
  * `round(x * scale)` is computed on identical IEEE doubles in both engines,
  * so it yields identical integers.
  */
object Cols {
  /** x → integer cents. Oracle equivalent: CAST(ROUND(x*100) AS BIGINT). */
  def cents(c: Column): Column = round(c * lit(100)).cast("long")
  /** x → integer 1e-4 units. */
  def e4(c: Column): Column = round(c * lit(10000)).cast("long")
  /** x → integer 1e-6 units. */
  def e6(c: Column): Column = round(c * lit(1000000)).cast("long")
}
