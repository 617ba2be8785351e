package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** FIXTURES.md §A: deterministic raw-JSON landing data for the ingest
  * pipeline, derived from the driver's `events` table so the curated
  * lake has a DuckDB oracle (the oracle queries `events.parquet`
  * directly, the engine queries what the pipeline produced from the
  * JSON export of the same rows).
  *
  * Layout under `<root>/raw/`:
  *  - `good/` — every events row as one JSON record, 4 shard files
  *    (clean; modes are the 5 real event types, all in 2024-01);
  *  - `extra/drift.jsonl` — 4 clean records with schema drift
  *    (`extra_field`, `payload.extra_nested`), MODE=synthetic, day 25;
  *  - `extra/mixed.jsonl` — 3 good synthetic records (day 26) + 5
  *    malformed lines → whole file quarantined, all 8 rows to DLQ;
  *  - `extra/nulldates.jsonl` — 2 parseable records with missing/bogus
  *    `event_timestamp` → unpartitionable → file quarantined;
  *  - `extra/badmeta.jsonl` — 2 records where `metadata` is a string
  *    (incompatible drift, psuedo_code.txt:362) → corrupt under the
  *    contract schema → file quarantined.
  *
  * Deterministic counts (asserted by q38/q40 oracles): 8 raw files,
  * 5 clean (4 good shards + drift), 3 quarantined; curated rows =
  * |events| + 4; DLQ rows = 5 + 3 + 2 + 2 = 12.
  */
object Fixtures {
  val SyntheticMeta =
    """"metadata":{"app_version":"9.9.9","user_agent":"ua-x","user_id":1}"""

  private val shared = scala.collection.mutable.Map.empty[String, String]

  /** The fixture landing zone is deterministic per scale factor, and two
    * demo pipelines (ledger-batch and streaming) each consume one — and
    * the batch runner archives files out of its copy. So the Spark
    * export runs once per sf into a shared template dir (cached across
    * JVMs via [[DemoCache]]), and each demo gets a plain filesystem copy
    * (~ms) instead of a second distributed JSON export. */
  def generateInto(spark: SparkSession, sfDir: String, layout: LakeLayout): Unit = synchronized {
    val template = shared.getOrElseUpdate(sfDir, {
      val dir = DemoCache.root(s"fixtures/${new java.io.File(sfDir).getName}")
      DemoCache.cached(dir, sfDir) {
        generate(spark, sfDir, LakeLayout(dir.getPath))
      }
      s"$dir/raw"
    })
    copyRec(new java.io.File(template), new java.io.File(layout.rawDir))
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(deleteRec)
    f.delete(): Unit
  }

  private def copyRec(src: java.io.File, dst: java.io.File): Unit = {
    if (src.isDirectory) {
      dst.mkdirs()
      Option(src.listFiles()).toSeq.flatten
        .foreach(c => copyRec(c, new java.io.File(dst, c.getName)))
    } else
      Files.copy(src.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
  }

  def generate(spark: SparkSession, sfDir: String, layout: LakeLayout): Unit = {
    // Good shards: JSON round-trip of the events table. The timestamp is
    // formatted at microsecond precision and parsed back with the same
    // session (UTC) semantics, so partition derivation matches DuckDB
    // computing day(ts) on the original parquet.
    val ev = Tables.load(spark, sfDir, "events")
    ev.withColumn("shard", pmod(col("event_id"), lit(4)))
      .select(col("shard"), to_json(struct(
        concat(lit("e-"), col("event_id")).as("id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("event_timestamp"),
        col("event_type").as("MODE"),
        struct(
          concat(lit("1."), pmod(col("user_id"), lit(5)), lit(".0")).as("app_version"),
          concat(lit("ua-"), pmod(col("user_id"), lit(7))).as("user_agent"),
          col("user_id").as("user_id")).as("metadata"),
        struct(
          concat(lit("t-"), col("event_id")).as("transaction_id"),
          col("value").as("value"),
          col("props").as("props")).as("payload"))).as("value"))
      .repartition(4, col("shard"))
      // partitionBy (not plain repartition) fixes the file count at
      // exactly one per shard value even when the hash partitioner
      // collides two shard values into one task.
      .write.mode("overwrite").partitionBy("shard")
      .text(s"${layout.rawDir}/good")

    def syntheticRecord(id: String, ts: String, extra: String = ""): String =
      s"""{"id":"$id","event_timestamp":"$ts","MODE":"synthetic",$SyntheticMeta,""" +
        s""""payload":{"transaction_id":"t-$id","value":1.5,"props":"{\\"k\\":1}"$extra}}"""

    def writeLines(rel: String, lines: Seq[String]): Unit = {
      val p = Paths.get(s"${layout.rawDir}/$rel")
      Files.createDirectories(p.getParent)
      Files.write(p, lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    }

    writeLines("extra/drift.jsonl", (1 to 4).map { i =>
      s"""{"id":"d-$i","event_timestamp":"2024-01-25 10:0$i:00.000000","MODE":"synthetic",""" +
        SyntheticMeta + "," +
        s""""payload":{"transaction_id":"t-d$i","value":2.25,"props":"{\\"k\\":2}",""" +
        s""""extra_nested":"x$i"},"extra_field":"alpha$i"}"""
    })

    writeLines("extra/mixed.jsonl",
      (1 to 3).map(i => syntheticRecord(s"m-$i", s"2024-01-26 08:0$i:00.000000")) ++ Seq(
        """{"id": "m-4", "event_""",      // truncated mid-key
        """this line is not json at all""",
        """{"id": }""",                   // missing value
        """{"unterminated": "oops""",     // unclosed string
        """}{"""))                        // garbage

    writeLines("extra/nulldates.jsonl", Seq(
      syntheticRecord("n-1", "not-a-timestamp"),
      s"""{"id":"n-2","MODE":"synthetic",$SyntheticMeta,""" +
        s""""payload":{"transaction_id":"t-n2","value":1.5,"props":"{\\"k\\":1}"}}"""))

    writeLines("extra/badmeta.jsonl", (1 to 2).map { i =>
      s"""{"id":"b-$i","event_timestamp":"2024-01-27 09:0$i:00.000000","MODE":"synthetic",""" +
        s""""metadata":"not-a-struct","payload":{"transaction_id":"t-b$i","value":1.5,"props":"{\\"k\\":1}"}}"""
    })
  }
}
