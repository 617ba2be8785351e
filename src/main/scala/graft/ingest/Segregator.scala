package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P6/P7: the good-vs-corrupt split of a permissive read
  * (psuedo_code.txt:192-193) plus the engine's two refinements:
  *
  *  - records that parse but cannot yield a valid partition key (null
  *    `event_timestamp` after try_cast, or null `MODE`) are *date-bad* —
  *    routing them to the DLQ instead of `year=__HIVE_DEFAULT_PARTITION__`
  *    is SURVEY.md §4.3 pitfall P6;
  *  - per-file dispositions are derived with ONE aggregate over the batch
  *    (no `distinct().collect()` of row-level data — SURVEY.md §7.5): the
  *    collect is file-level only, bounded by the batch size.
  */
object Segregator {
  import RawJsonReader.{CorruptCol, SourceCol}

  /** try_cast the raw string timestamp; ANSI mode is on in Spark 4, so a
    * plain cast would throw on the first malformed date instead of
    * quarantining it. */
  def eventTime(c: Column): Column = c.try_cast("timestamp_ntz")

  private def isCorrupt = col(CorruptCol).isNotNull
  private def isDateBad(tsCol: String, modeCol: String) =
    col(CorruptCol).isNull &&
      (eventTime(col(tsCol)).isNull || col(modeCol).isNull)

  /** Per-file record dispositions: (source_path, n_records, n_corrupt,
    * n_datebad). A file is *clean* iff n_corrupt = 0 and n_datebad = 0 —
    * file success is all-or-nothing so replay stays exactly-once
    * (SURVEY.md §7.5; the reference instead re-appends partial files,
    * psuedo_code.txt:195-208).
    */
  def fileDispositions(raw: DataFrame, tsCol: String, modeCol: String): DataFrame =
    raw.groupBy(SourceCol).agg(
      count(lit(1)).as("n_records"),
      sum(when(isCorrupt, 1L).otherwise(0L)).as("n_corrupt"),
      sum(when(isDateBad(tsCol, modeCol), 1L).otherwise(0L)).as("n_datebad"))

  /** Well-formed records (corrupt column dropped — P7). */
  def goodRecords(raw: DataFrame, tsCol: String, modeCol: String): DataFrame =
    raw.filter(!isCorrupt && !isDateBad(tsCol, modeCol)).drop(CorruptCol)

  /** Rows destined for the DLQ, with a reason column: unparseable JSON,
    * parseable-but-unpartitionable, or good rows stranded in a
    * quarantined file (all-or-nothing file semantics — nothing is
    * silently dropped). `quarantinedFiles` is a broadcastable one-column
    * (source_path) frame of files with any bad record.
    */
  def dlqRecords(raw: DataFrame, tsCol: String, modeCol: String,
                 quarantinedFiles: DataFrame): DataFrame = {
    val reason = when(isCorrupt, "corrupt_json")
      .when(isDateBad(tsCol, modeCol), "null_partition_key")
      .otherwise("quarantined_file")
    raw
      .join(broadcast(quarantinedFiles), Seq(SourceCol), "left_semi")
      .select(
        col(SourceCol),
        reason.as("reason"),
        coalesce(col(CorruptCol),
          to_json(struct(raw.columns
            .filterNot(c => c == CorruptCol || c == SourceCol).map(col).toSeq: _*)))
          .as("raw_record"))
  }
}
