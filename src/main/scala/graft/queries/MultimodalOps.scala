package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** X5: multimodal columns — image/audio/video payloads carried as opaque
  * `binary` columns with typed, queryable metadata (SURVEY.md §2.10 X5).
  *
  * The corpus-side design for a 100 TB training-data lake:
  *   - the payload is BinaryType, never parsed by the engine itself;
  *   - per-payload metadata (size, content fingerprint, decoded
  *     dimensions) are ordinary columns so selection/dedup/stats stay
  *     columnar and pruned — a scan that only needs `modality` and
  *     `byte_len` never touches the bytes;
  *   - the DECODE step is a stub by design: real image/audio decoding
  *     runs as a batched Arrow UDF (`mapInPandas`/`mapPartitions` over
  *     batches of (id, payload) with bounded batch byte-size); this
  *     container has no codec libraries, so the decode here is a
  *     deterministic fake derived from the byte length. The Spark-side
  *     plumbing — BinaryType schema, per-modality grouping, fingerprint
  *     dedup — is real and oracle-checked.
  *
  * The demo derives payloads from `documents.text` bytes so DuckDB can
  * verify every derived column (`encode()`/`sha256()`/`octet_length()`).
  */
object MultimodalOps {
  type Q = (SparkSession, String) => DataFrame

  /** Deterministic fake decode: dimensions derived from byte length.
    * A real decoder replaces exactly this projection with an Arrow UDF. */
  private def fakeDecode(df: DataFrame): DataFrame =
    df.withColumn("width", lit(320) + col("byte_len") % 1280)
      .withColumn("height", lit(240) + (col("byte_len") * 7) % 720)

  val defs: Map[String, Q] = Map(
    // Per-modality corpus stats over binary payloads: row counts, byte
    // volume, fingerprint-distinct payloads (binary exact-dedup surface),
    // decoded-dimension ranges. One hash-partitioned aggregate.
    "q42_multimodal_stats" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
      val tagged = docs.select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
        col("text").cast("binary").as("payload"),
        expr("octet_length(text)").cast("long").as("byte_len"))
        .withColumn("fp", sha2(col("payload"), 256))
      fakeDecode(tagged)
        .groupBy("modality")
        .agg(
          count(lit(1)).as("n"),
          sum(col("byte_len")).as("total_bytes"),
          countDistinct(col("fp")).as("n_fp"),
          min(col("width")).as("min_width"),
          max(col("height")).as("max_height"))
        .orderBy("modality")
    }))

  val oracles: Map[String, String] = Map(
    "q42_multimodal_stats" ->
      """SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
                AS modality,
              COUNT(*) AS n,
              CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
              COUNT(DISTINCT sha256(text)) AS n_fp,
              CAST(MIN(320 + octet_length(encode(text)) % 1280) AS BIGINT) AS min_width,
              CAST(MAX(240 + (octet_length(encode(text)) * 7) % 720) AS BIGINT) AS max_height
         FROM documents GROUP BY 1 ORDER BY 1""")
}
