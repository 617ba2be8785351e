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
  * oracle. */
object StreamDemo {
  private val built = mutable.Map.empty[String, LakeLayout]
  private val hourly = mutable.Map.empty[String, String]
  private val joined = mutable.Map.empty[String, String]

  private def deleteRec(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(deleteRec)
    f.delete(): Unit
  }

  def ensure(spark: SparkSession, sfDir: String): LakeLayout = synchronized {
    built.getOrElseUpdate(sfDir, {
      val root = new File(s"target/stream/${new File(sfDir).getName}").getAbsoluteFile
      deleteRec(root)
      val layout = LakeLayout(root.getPath)
      Fixtures.generateInto(spark, sfDir, layout)
      StreamingIngest.runAvailableNow(spark, layout, Contracts.events)
      layout
    })
  }

  /** Run the watermarked hourly-window aggregation as a STREAM over the
    * streamed curated lake (memory sink, complete mode — every window in
    * the result is the final count). Returns the materialized table. */
  def ensureHourly(spark: SparkSession, sfDir: String): DataFrame = synchronized {
    val layout = ensure(spark, sfDir)
    val tbl = hourly.getOrElseUpdate(sfDir, {
      val name = "stream_hourly_" + new File(sfDir).getName.replace('.', '_').replace('-', '_')
      val src = spark.readStream
        .schema(StructType(Seq(StructField("event_time_utc", TimestampNTZType))))
        .option("recursiveFileLookup", "true")
        .parquet(layout.curatedDir)
      EventStreams.hourlyCounts(src, "event_time_utc")
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start().awaitTermination()
      name
    })
    spark.table(tbl).orderBy(col("h_start_us"))
  }

  /** Run the stream-stream view→purchase join over the streamed curated
    * lake (memory sink, append mode — inner-join pairs emit on match).
    * Returns the materialized pair table. */
  def ensureStreamJoin(spark: SparkSession, sfDir: String): DataFrame = synchronized {
    val layout = ensure(spark, sfDir)
    val tbl = joined.getOrElseUpdate(sfDir, {
      val name = "stream_join_" + new File(sfDir).getName.replace('.', '_').replace('-', '_')
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
      name
    })
    spark.table(tbl)
  }

  /** Streaming exact-dedup of an at-least-once landing zone. The fixture
    * writes the events table as two overlapping deliveries (shards 0-6,
    * then a REPLAY of shards 5-9 — the upstream-retries-a-file scenario),
    * and the stream recovers exactly-once semantics with
    * `dropDuplicatesWithinWatermark` on the event key. The watermark
    * delay is the state-size dial: it must cover how far apart the
    * original and its replay can arrive (here: the whole finite drain, so
    * the dedup is exact and the result is a pure function of the data —
    * a deployment sizes it to the redelivery window). Returns the
    * deduped memory table; [[streamDedupLanding]] exposes the raw
    * landing dir so callers can count pre-dedup rows. */
  def ensureStreamDedup(spark: SparkSession, sfDir: String): DataFrame = synchronized {
    val tbl = deduped.getOrElseUpdate(sfDir, {
      val name = "stream_dedup_" + new File(sfDir).getName.replace('.', '_').replace('-', '_')
      val root = new File(s"target/stream/${new File(sfDir).getName}-dedup").getAbsoluteFile
      deleteRec(root)
      val landing = new File(root, "landing").getPath
      val ev = graft.engine.Tables.load(spark, sfDir, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      ev.filter(col("event_id") % 10 < 7)
        .write.mode("append").parquet(landing)
      ev.filter(col("event_id") % 10 >= 5)
        .write.mode("append").parquet(landing)
      dedupLanding(sfDir) = landing
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
        .withWatermark("ts_w", "3650 days")
        .dropDuplicatesWithinWatermark("event_id")
        .drop("ts_w")
        .writeStream.format("memory").queryName(name)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start().awaitTermination()
      name
    })
    spark.table(tbl)
  }

  /** Raw landing dir built by [[ensureStreamDedup]] (call that first). */
  def streamDedupLanding(sfDir: String): String = synchronized(dedupLanding(sfDir))

  private val deduped = mutable.Map.empty[String, String]
  private val dedupLanding = mutable.Map.empty[String, String]
}
