package graft.pipeline

import java.io.File
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampNTZType}
import scala.collection.mutable
import graft.streaming.{EventStreams, StreamingIngest}

/** Streaming twin of [[IngestDemo]]: the same fixture landing zone
  * drained by the Structured-Streaming runner (checkpointed file source,
  * `Trigger.AvailableNow`) instead of the ledger loop, so q45/q46 can
  * verify that the streaming path produces byte-identical pipeline
  * results and that streaming windowed aggregation matches the batch
  * oracle.
  *
  * Every stream here is finite (`AvailableNow`) and deterministic, so
  * each result is a pure function of the fixtures — the memory-sink
  * tables are persisted to parquet and reused across JVMs via
  * [[DemoCache]] (on a cache hit the parquet is re-registered as the
  * same-named temp view instead of re-running the stream). The streams
  * themselves are still executed for real every time the cache is cold
  * and on every StreamingSpec run.
  */
object StreamDemo {
  private val built = mutable.Map.empty[String, LakeLayout]
  private val hourly = mutable.Map.empty[String, String]
  private val joined = mutable.Map.empty[String, String]

  private def sfName(sfDir: String) = new File(sfDir).getName

  def ensure(spark: SparkSession, sfDir: String): LakeLayout = synchronized {
    built.getOrElseUpdate(sfDir, {
      val root = DemoCache.root(s"stream/${sfName(sfDir)}")
      val layout = LakeLayout(root.getPath)
      DemoCache.cached(root, sfDir) {
        Fixtures.generateInto(spark, sfDir, layout)
        StreamingIngest.runAvailableNow(spark, layout, Contracts.events)
      }
      layout
    })
  }

  /** Run the finite stream `start` into a memory table `name`, persist
    * the result to parquet under `memoRoot`, and on later JVMs skip the
    * stream and re-register the parquet as the `name` temp view. */
  private def memoStream(spark: SparkSession, sfDir: String, name: String)
                        (run: => Unit): String = {
    val memo = DemoCache.root(s"stream/${sfName(sfDir)}-memo/$name")
    val data = new File(memo, "data").getPath
    val hit = DemoCache.cached(memo, sfDir) {
      run
      spark.table(name).coalesce(1).write.mode("overwrite").parquet(data)
    }
    if (hit) spark.read.parquet(data).createOrReplaceTempView(name)
    name
  }

  /** Run the watermarked hourly-window aggregation as a STREAM over the
    * streamed curated lake (memory sink, complete mode — every window in
    * the result is the final count). Returns the materialized table. */
  def ensureHourly(spark: SparkSession, sfDir: String): DataFrame = synchronized {
    val layout = ensure(spark, sfDir)
    val tbl = hourly.getOrElseUpdate(sfDir, {
      val name = "stream_hourly_" + sfName(sfDir).replace('.', '_').replace('-', '_')
      memoStream(spark, sfDir, name) {
        val src = spark.readStream
          .schema(StructType(Seq(StructField("event_time_utc", TimestampNTZType))))
          .option("recursiveFileLookup", "true")
          .parquet(layout.curatedDir)
        EventStreams.hourlyCounts(src, "event_time_utc")
          .writeStream.format("memory").queryName(name)
          .outputMode("complete")
          .trigger(Trigger.AvailableNow())
          .start().awaitTermination()
      }
    })
    spark.table(tbl).orderBy(col("h_start_us"))
  }

  /** Run the stream-stream view→purchase join over the streamed curated
    * lake (memory sink, append mode — inner-join pairs emit on match).
    * Returns the materialized pair table. */
  def ensureStreamJoin(spark: SparkSession, sfDir: String): DataFrame = synchronized {
    val layout = ensure(spark, sfDir)
    val tbl = joined.getOrElseUpdate(sfDir, {
      val name = "stream_join_" + sfName(sfDir).replace('.', '_').replace('-', '_')
      memoStream(spark, sfDir, name) {
        val src = spark.readStream
          .schema(StructType(Seq(
            StructField("event_time_utc", TimestampNTZType),
            // ml_mode, not mode: mode is a PARTITION column of the curated
            // lake, so it is absent from the data files and an explicit
            // schema + recursiveFileLookup would read it as null
            StructField("ml_mode", StringType),
            StructField("user_id", LongType))))
          .option("recursiveFileLookup", "true")
          .parquet(layout.curatedDir)
        EventStreams.viewPurchasePairs(src, "event_time_utc", "ml_mode",
          gapMinutes = 30, lateness = "60 days")
          .writeStream.format("memory").queryName(name)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start().awaitTermination()
      }
    })
    spark.table(tbl)
  }

  /** Streaming exact-dedup of an at-least-once landing zone. The fixture
    * writes the events table as two overlapping deliveries (shards 0-6,
    * then a REPLAY of shards 5-9 — the upstream-retries-a-file scenario),
    * and the stream recovers exactly-once semantics with
    * `dropDuplicatesWithinWatermark` on the event key. The watermark
    * delay is the state-size dial: it must cover how far apart the
    * original and its replay can arrive — here it is DERIVED from the
    * data (full event-time span + 1 day slack), so the dedup is exact for
    * any fixture and the result is a pure function of the data; a
    * deployment sizes it to the redelivery window instead. Returns the
    * deduped memory table; [[streamDedupLanding]] exposes the raw
    * landing dir so callers can count pre-dedup rows. */
  def ensureStreamDedup(spark: SparkSession, sfDir: String): DataFrame = synchronized {
    val tbl = deduped.getOrElseUpdate(sfDir, {
      val name = "stream_dedup_" + sfName(sfDir).replace('.', '_').replace('-', '_')
      val root = DemoCache.root(s"stream/${sfName(sfDir)}-dedup")
      val landing = new File(root, "landing").getPath
      val data = new File(root, "result").getPath
      val hit = DemoCache.cached(root, sfDir) {
        val ev = graft.engine.Tables.load(spark, sfDir, "events")
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"))
        ev.filter(col("event_id") % 10 < 7)
          .write.mode("append").parquet(landing)
        ev.filter(col("event_id") % 10 >= 5)
          .write.mode("append").parquet(landing)
        // watermark delay derived from the data: the whole event-time span
        // plus a day of slack covers any original/replay arrival gap in a
        // finite drain, whatever range the fixture generator produces
        val mm = ev.agg(
          org.apache.spark.sql.functions.min(col("ts")).as("lo"),
          org.apache.spark.sql.functions.max(col("ts")).as("hi")).head()
        val spanDays = java.time.Duration.between(
          mm.getAs[java.time.LocalDateTime]("lo"),
          mm.getAs[java.time.LocalDateTime]("hi")).toDays + 2
        val src = spark.readStream
          .schema(StructType(Seq(
            StructField("event_id", LongType),
            StructField("ts", TimestampNTZType),
            StructField("user_id", LongType),
            StructField("event_type", StringType),
            StructField("value", org.apache.spark.sql.types.DoubleType))))
          .parquet(landing)
        // watermarks require TIMESTAMP (not NTZ); session TZ is pinned UTC
        // so the cast is value-preserving
        src.withColumn("ts_w", col("ts").cast("timestamp"))
          .withWatermark("ts_w", s"$spanDays days")
          .dropDuplicatesWithinWatermark("event_id")
          .drop("ts_w")
          .writeStream.format("memory").queryName(name)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start().awaitTermination()
        spark.table(name).coalesce(1).write.mode("overwrite").parquet(data)
      }
      if (hit) spark.read.parquet(data).createOrReplaceTempView(name)
      dedupLanding(sfDir) = landing
      name
    })
    spark.table(tbl)
  }

  /** Raw landing dir built by [[ensureStreamDedup]] (call that first). */
  def streamDedupLanding(sfDir: String): String = synchronized(dedupLanding(sfDir))

  /** Streaming NEAR-dup dedup (q86): the q82 batch probe as a live
    * stream — incoming docs land as files, the stream shingles and
    * signatures them, probes the durable [[graft.queries.MinHashIndex]]
    * (corpus = doc_id < CorpusCap) with stream-static joins, and emits
    * exact-verified `(new_id, old_id, jac_e6)` edges in append mode.
    * The batch (doc_id 400-499) arrives as two deliveries so a
    * micro-batch boundary falls inside it — edges must not depend on
    * arrival batching (they don't: the probe is stateless per row and
    * the pair dedup is arrival-order-independent because a pair's
    * jac_e6 is the same whenever it fires). Must emit exactly the q79
    * cross-set edge set — the oracle is the same SQL. */
  def ensureStreamNearDedup(spark: SparkSession, sfDir: String): DataFrame = synchronized {
    val tbl = nearDeduped.getOrElseUpdate(sfDir, {
      val name = "stream_neardup_" + sfName(sfDir).replace('.', '_').replace('-', '_')
      val root = DemoCache.root(s"stream/${sfName(sfDir)}-neardup")
      val landing = new File(root, "landing").getPath
      val data = new File(root, "result").getPath
      val hit = DemoCache.cached(root, sfDir) {
        val idx = graft.queries.MinHashIndex.ensure(spark, sfDir)
        val batch = graft.engine.Tables.load(spark, sfDir, "documents")
          .filter(col("doc_id") >= 400 && col("doc_id") < 500)
          .select(col("doc_id"), col("text"))
        batch.filter(col("doc_id") % 2 === 0).coalesce(1)
          .write.mode("append").parquet(landing)
        batch.filter(col("doc_id") % 2 =!= 0).coalesce(1)
          .write.mode("append").parquet(landing)
        val src = spark.readStream
          .schema(StructType(Seq(
            StructField("doc_id", LongType),
            StructField("text", StringType))))
          // one file per micro-batch: the two deliveries really cross a
          // micro-batch boundary instead of collapsing into one
          .option("maxFilesPerTrigger", "1")
          .parquet(landing)
        graft.queries.MinHashIndex.probeStream(spark, idx, src, minJ = 0.8)
          .writeStream.format("memory").queryName(name)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start().awaitTermination()
        spark.table(name).coalesce(1).write.mode("overwrite").parquet(data)
      }
      if (hit) spark.read.parquet(data).createOrReplaceTempView(name)
      name
    })
    spark.table(tbl)
  }

  private val deduped = mutable.Map.empty[String, String]
  private val dedupLanding = mutable.Map.empty[String, String]
  private val nearDeduped = mutable.Map.empty[String, String]
}
