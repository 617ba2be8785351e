package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** S6 + S10: the partitioned Parquet lake.
  *
  * Write: `.mode("append").partitionBy("year","month","day","mode")`
  * (psuedo_code.txt:217-220). The reference also passes
  * `option("mergeSchema","True")` to the WRITER, where it is a no-op —
  * merging is a read-side option (SURVEY.md §4.3 P4); the intended
  * union-of-schemas semantics are delivered by [[read]] passing
  * `mergeSchema=true`.
  *
  * Scale posture: rows are repartitioned by the partition columns before
  * the write so each task owns whole partitions (bounded file counts, no
  * 32-tasks × 150-partitions small-file explosion); `maxRecordsPerFile`
  * caps individual files so one hot day/mode still splits.
  */
object CuratedWriter {
  val PartitionCols: Seq[String] = Seq("year", "month", "day", "mode")

  def append(curated: DataFrame, lakeDir: String,
             maxRecordsPerFile: Long = 5000000L): Unit =
    curated
      .repartition(PartitionCols.map(col): _*)
      .write
      .mode("append")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(PartitionCols: _*)
      .parquet(lakeDir)

  /** Consumption-side scan with union-of-schemas across appends. */
  def read(spark: SparkSession, lakeDir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(lakeDir)
}
