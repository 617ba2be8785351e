package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** P1-P5 + F1: the reference's `Apply_Transformations`
  * (psuedo_code.txt:268-298) done with sound physics:
  *
  *  - star passthrough FIRST, then rename/promote/drop — selecting named
  *    columns *and* `col("*")` as the pseudocode literally does would
  *    duplicate them and fail the Parquet write (SURVEY.md §4.3 P5);
  *  - selective flattening (P2): named nested fields are promoted to top
  *    level (`metadata.*`, `payload.transaction_id`, ...); everything
  *    else — including fields that arrived via schema drift — stays
  *    nested under `payload` (psuedo_code.txt:283-284);
  *  - permissive casts (P3) via try_cast (ANSI is on in Spark 4);
  *  - partition columns `year`/`month`/`day` (F1) + `mode`
  *    (psuedo_code.txt:294-296). Callers must route null-date records
  *    away first ([[Segregator]]); here the cast is total.
  */
object Transformer {

  /** Promote a nested field if the batch schema has it, else typed null —
    * keeps the curated schema stable across batches that predate a
    * drifted field. */
  private def fieldOrNull(df: DataFrame, path: String, tpe: String): Column = {
    val parts = path.split('.')
    val exists = parts.foldLeft(Option(df.schema: Any)) {
      case (Some(s: StructType), p) => s.fields.find(_.name == p).map(_.dataType)
      case _ => None
    }.isDefined
    (if (exists) col(path) else lit(null)).try_cast(tpe)
  }

  /** Good records → curated shape. Input: the raw columns of the events
    * source contract (plus any drifted extras, preserved by `col("*")`).
    */
  def curate(good: DataFrame): DataFrame = {
    good
      .select(col("*")) // P4: keep every inferred top-level key
      .withColumn("record_id", col("id").try_cast("string"))
      .withColumn("event_time_utc", Segregator.eventTime(col("event_timestamp")))
      .withColumn("ml_mode", col("MODE").try_cast("string"))
      .withColumn("app_version", fieldOrNull(good, "metadata.app_version", "string"))
      .withColumn("user_agent", fieldOrNull(good, "metadata.user_agent", "string"))
      .withColumn("user_id", fieldOrNull(good, "metadata.user_id", "long"))
      .withColumn("transaction_id", fieldOrNull(good, "payload.transaction_id", "string"))
      .withColumn("value", fieldOrNull(good, "payload.value", "double"))
      .drop("id", "event_timestamp", "MODE", "metadata")
      .withColumn("year", year(col("event_time_utc")))
      .withColumn("month", month(col("event_time_utc")))
      .withColumn("day", dayofmonth(col("event_time_utc")))
      .withColumn("mode", col("ml_mode"))
  }
}
