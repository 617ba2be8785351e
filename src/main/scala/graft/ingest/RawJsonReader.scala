package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S1 + S2 + the SURVEY.md §4.3 P2 fix: permissive JSON scan with a
  * corrupt-record sidecar column and file lineage.
  *
  * The reference reads with `mode=PERMISSIVE` and
  * `columnNameOfCorruptRecord=_corrupt_record` (psuedo_code.txt:185-188)
  * and then filters on `_corrupt_record` — which Spark rejects on an
  * inferred-schema read unless the schema explicitly contains the corrupt
  * column (pitfall P2). This reader therefore does the two-pass dance:
  *
  *  1. infer the batch's schema (union across files; conflicting types
  *     collapse to string per Spark's JSON type merging);
  *  2. merge inferred with the declared source *contract*
  *     ([[mergePreferContract]]): contract types win conflicts, inferred
  *     adds new top-level/nested fields (schema evolution, the
  *     union-of-schemas semantics of psuedo_code.txt:353-362);
  *  3. re-read with the merged schema + `_corrupt_record string`.
  *
  * The contract-wins rule is what turns *incompatible* drift (e.g.
  * `metadata` arriving as a string where the contract says struct,
  * psuedo_code.txt:362) into per-record corrupt rows — they fail to parse
  * against the struct type and land in the DLQ instead of silently
  * downgrading the whole column to string for everyone.
  *
  * Scale note: the inference pass re-lists and re-reads the batch once.
  * At 100 TB batches, bound it with `samplingRatio` or skip it entirely
  * by passing `inferExtra = false` (contract-only read) — evolution then
  * comes from periodic contract refreshes rather than per-batch scans.
  */
object RawJsonReader {
  val CorruptCol = "_corrupt_record"
  val SourceCol = "source_path"

  /** Recursive union of contract and inferred schemas; on conflict the
    * contract type wins, inferred-only fields are kept (evolution), and
    * contract-only fields stay (records missing them read as null).
    */
  def mergePreferContract(contract: DataType, inferred: DataType): DataType =
    (contract, inferred) match {
      case (c: StructType, i: StructType) =>
        val cNames = c.fieldNames.toSet
        val merged = c.fields.map { cf =>
          i.fields.find(_.name == cf.name) match {
            case Some(f) =>
              StructField(cf.name, mergePreferContract(cf.dataType, f.dataType), nullable = true)
            case None => cf.copy(nullable = true)
          }
        } ++ i.fields.filterNot(f => cNames(f.name))
        StructType(merged)
      case (c: ArrayType, i: ArrayType) =>
        ArrayType(mergePreferContract(c.elementType, i.elementType), containsNull = true)
      case (c, _) => c
    }

  /** Permissive read of `paths` against `contract`, with `_corrupt_record`
    * and a normalized `source_path` lineage column (F2, psuedo_code.txt:189).
    */
  def read(spark: SparkSession, paths: Seq[String], contract: StructType,
           inferExtra: Boolean = true): DataFrame = {
    val base =
      if (inferExtra) {
        val inferred = spark.read
          .option("mode", "PERMISSIVE")
          .json(paths: _*)
          .schema
        mergePreferContract(contract, inferred).asInstanceOf[StructType]
      } else contract
    val withCorrupt =
      if (base.fieldNames.contains(CorruptCol)) base
      else base.add(CorruptCol, StringType, nullable = true)
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(withCorrupt)
      .json(paths: _*)
      // input_file_name() yields a PERCENT-ENCODED URI; only the scheme
      // is stripped here (keeps the column cheap and codegen'd). Driver-
      // side consumers that compare against ledger keys must decode via
      // PathNorm.fromString — see BatchProcessor.processBatch.
      .withColumn(SourceCol, regexp_replace(input_file_name(), "^file:(//)?", ""))
  }
}
