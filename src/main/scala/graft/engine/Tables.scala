package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet star schema (TESTDATA.md).
  *
  * All tables are read as-is except `events`, whose physical `ts` layout
  * has varied across driver generations — parquet TIMESTAMP(NANOS) (no
  * Spark type; read as BIGINT nanos via
  * `spark.sql.legacy.parquet.nanosAsLong`) and plain timestamp[us]
  * (read as TIMESTAMP_NTZ). The loader is SCHEMA-ADAPTIVE over the
  * physical type and always normalizes to the same logical contract, so
  * no query or oracle tracks the storage layout:
  *   - `ts_us`  : epoch microseconds (bigint, exact; floor(nanos/1000) ==
  *                DuckDB's `epoch_us(ts)` for positive epochs)
  *   - `ts`     : TIMESTAMP_NTZ at microsecond precision (for window()/
  *                date_trunc style operators; session TZ is pinned UTC)
  */
object Tables {
  /** Constructed-plan memo — round 22. `spark.read.parquet` pays a file
    * listing plus a footer schema-inference AT CONSTRUCTION, and every
    * query run re-constructs its table reads from scratch: driver stack
    * sampling under the bench session showed ~30% of a cheap query's
    * warm residue inside `DataFrameReader.parquet`. The logical plan of
    * a path read is a pure function of the session and the file set, so
    * memoize the loaded (and, for events, normalized) DataFrame keyed by
    * (session, path, shallow listing signature). This is the posture a
    * catalog table already has (Spark caches a table's relation and file
    * index until the data changes); nothing about EXECUTION is cached —
    * every action still scans the parquet bytes. A replaced or appended
    * file changes the signature (len/mtime of the file, or of the
    * directory's direct children) and re-constructs; a vanished path
    * falls through to the uncached read so error semantics are the
    * reader's own. Bounded LRU; keyed by session identity so a stopped
    * session's plans age out. */
  private val planCache: java.util.Map[String, DataFrame] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, DataFrame](32, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, DataFrame]): Boolean = size() > 64
      })

  private[graft] def clearPlanCache(): Unit = planCache.clear()

  private def listingSig(spark: SparkSession, path: String): Option[String] =
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = graft.engine.Fs.of(spark.sparkContext.hadoopConfiguration, p)
      val st = fs.getFileStatus(p)
      if (st.isDirectory)
        Some(fs.listStatus(p)
          .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
          .sorted.mkString(","))
      else Some(s"${st.getLen}:${st.getModificationTime}")
    } catch { case _: java.io.IOException => None }

  /** `construct` memoized on (session, path, current listing signature).
    * Shared by [[load]] and the store readers ([[parquet]]): any plain
    * path read whose plan is a pure function of the file set. */
  private[graft] def memo(spark: SparkSession, path: String)
                         (construct: => DataFrame): DataFrame =
    listingSig(spark, path) match {
      case None => construct // missing/unreadable: the reader's own error
      case Some(sig) =>
        val key = s"${System.identityHashCode(spark)}|$path|$sig"
        planCache.get(key) match {
          case null =>
            val df = construct
            planCache.put(key, df)
            df
          case hit => hit
        }
    }

  /** Memoized `spark.read.parquet(path)` — for the durable stores
    * (minhash bands/shingles, fingerprint index, day-dim) that are
    * immutable between maintenance writes. A maintenance write changes
    * the listing signature and re-constructs. */
  def parquet(spark: SparkSession, path: String): DataFrame =
    memo(spark, path)(spark.read.parquet(path))

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    memo(spark, s"$sfDir/$name.parquet")(build(spark, sfDir, name))

  private def build(spark: SparkSession, sfDir: String, name: String): DataFrame = name match {
    case "events" =>
      // NANOS layouts need spark.sql.legacy.parquet.nanosAsLong=true; the
      // session builders (Verify/Bench/specs) all set it. It must be a
      // builder conf, not a mutation here — a runtime set would race a
      // parallel query runner; it is a no-op for non-NANOS layouts.
      val raw = spark.read.parquet(s"$sfDir/events.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>   // TIMESTAMP(NANOS) as bigint
          raw.withColumn("ts_us", expr("ts div 1000"))
            .withColumn("ts", timestamp_micros(col("ts_us")).cast("timestamp_ntz"))
        case _ =>                                     // timestamp[us] (NTZ or LTZ)
          // NTZ → TIMESTAMP is instant-preserving under the pinned-UTC
          // session TZ, so unix_micros sees the same epoch DuckDB's
          // epoch_us(ts) computes on the raw file.
          raw.withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
            .withColumn("ts", col("ts").cast("timestamp_ntz"))
      }
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
