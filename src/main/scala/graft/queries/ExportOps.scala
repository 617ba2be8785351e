package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Training-set EXPORT operators — the step after curation/ordering
  * where the selected corpus leaves the lake as training shards, plus
  * the mixture-temperature rebalance that decides how much of each
  * source the export takes (psuedo_code.txt:1's "ML training data
  * platform" north star: curate → mix → export).
  *
  *  - q104 shard export audit: deterministic 16-way shard assignment
  *    (md5 hex-nibble, the q66/q67 idiom under a distinct salt) with a
  *    per-shard deterministic ORDER — rank by a second md5 key — and a
  *    rank-weighted modular checksum that pins the order doc-for-doc
  *    (the per-shard analogue of q78/q91's order_md5: the compare sorts
  *    rows, so order must live in a VALUE). [[exportShards]] is the
  *    matching sink: one pass, `partitionBy(shard)`, rows pre-sorted so
  *    each shard's name-ordered file set IS the training order (ExportSpec reads a
  *    shard back and asserts it).
  *  - q105 temperature mixture: per-source token quotas ∝ T_d^0.5
  *    (the multinomial temperature-sampling rebalance of XLM-R/mT5,
  *    alpha = 0.5 as sqrt — kept integer-exact cross-engine via
  *    floor(sqrt(T_d·1e6)) before any sum), then a deterministic
  *    md5-order greedy fill to quota per source ([[quotaFill]], the
  *    per-source-budget generalization of q87's two-phase kernel).
  *
  * SCALE: shard ranks are computed with the same TWO-PHASE split as
  * q87's budgetFill — a naive `row_number over (partition by shard)`
  * serializes each shard into one sort partition, and 16 shards over
  * 100 TB means 16 reducers. The order key's own 2-hex-char prefix
  * refines each shard into 256 subshards whose starting offsets come
  * from a window over a bounded (shard × subshard) frame; the global
  * per-shard rank is offset + intra-subshard row_number, byte-identical
  * to the single-window form (ExportSpec checks equivalence).
  */
object ExportOps {
  private def docs(s: SparkSession, d: String) = Tables.load(s, d, "documents")

  /** Whitespace token count — the corpus-wide convention (CurationOps). */
  private def nTokens(c: org.apache.spark.sql.Column) =
    size(split(c, " ")).cast("long")

  /** q104 salts: shard assignment and intra-shard order are INDEPENDENT
    * md5 draws, so shard membership never correlates with position. */
  private val ShardSalt = "graft104s:"
  private val OrderSalt = "graft104o:"

  /** q105: export token budget across all sources (the mixture's total
    * size), and the fill-order salt. */
  val TempBudget = 30000L
  private val MixSalt = "graft105:"

  /** q104 checksum modulus (~1e6): keeps every partial product ≤ ~1e12
    * so a BIGINT sum cannot overflow on either engine — DuckDB promotes
    * SUM to int128, Spark wraps at 64 bits; staying under 2^63 keeps
    * them equal. */
  private val ChkMod = 1000003L

  /** (doc_id, shard, rk, n_tok, rnk): deterministic shard + global
    * per-shard rank, two-phase (see object scaladoc). `singlePhase`
    * exists only for ExportSpec's equivalence check. */
  private[queries] def shardRanked(df: DataFrame, singlePhase: Boolean = false): DataFrame = {
    val base = df
      .withColumn("shard",
        substring(md5(concat(lit(ShardSalt), col("doc_id").cast("string"))), 1, 1))
      .withColumn("rk", md5(concat(lit(OrderSalt), col("doc_id").cast("string"))))
    if (singlePhase) {
      val w = Window.partitionBy("shard").orderBy("rk", "doc_id")
      return base.withColumn("rnk", row_number().over(w).cast("long"))
    }
    val sub = base.withColumn("sub", substring(col("rk"), 1, 2))
    // phase 1: per-(shard, subshard) row counts — ≤ 16×256 rows — and
    // each subshard's starting offset within its shard
    val offsets = sub.groupBy("shard", "sub")
      .agg(count(lit(1)).as("n"))
      .withColumn("off", coalesce(
        sum("n").over(Window.partitionBy("shard").orderBy("sub")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("shard", "sub", "off")
    // phase 2: 256× the parallelism; (sub, rk) order == rk order
    // because sub is rk's own prefix
    val wIntra = Window.partitionBy("shard", "sub").orderBy("rk", "doc_id")
    sub.join(broadcast(offsets), Seq("shard", "sub"))
      .withColumn("rnk", (col("off") + row_number().over(wIntra)).cast("long"))
      .drop("sub", "n", "off")
  }

  /** The export sink: one pass over the curated frame → parquet
    * `outDir/shard=<h>/` with rows written in training order. The rank
    * ASSIGNMENT is two-phase (object scaladoc); the physical layout is
    * a RANGE partition over `(shard, rnk)` into `numPartitions` write
    * tasks (default: max(256, the session's shuffle parallelism) — 16×
    * the shard count) + `sortWithinPartitions` — NOT `repartition(shard)`,
    * which would cap the export at 16 active writers and make each
    * shard a single-task ~6 TB sort at the 100 TB target. Under the
    * range partition a shard's rows span several consecutive output
    * partitions in rank order, so `partitionBy(shard)` still yields one
    * directory per shard whose part files, taken in LEXICOGRAPHIC NAME
    * ORDER (Spark's zero-padded part numbering follows the range
    * order), concatenate to the exact training order — a training
    * loader reads the file list sorted by name and never sorts rows;
    * `rnk` is also embedded per row so any consumer can order-check or
    * re-sort cheaply. ExportSpec asserts the name-ordered read-back and
    * that >16 write tasks actually ran. */
  def exportShards(s: SparkSession, df: DataFrame, outDir: String,
                   numPartitions: Int = 0): Unit = {
    val n =
      if (numPartitions > 0) numPartitions
      else math.max(256, s.conf.get("spark.sql.shuffle.partitions", "200").toInt)
    shardRanked(df.select(col("doc_id"), col("source"), col("text")))
      .select("shard", "rnk", "doc_id", "source", "text")
      .repartitionByRange(n, col("shard"), col("rnk"))
      .sortWithinPartitions("shard", "rnk")
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    writeManifest(s, outDir)
  }

  /** The q104 rank-weighted checksum term, shared by the audit query
    * and the export manifest — ONE definition, so the manifest's
    * `order_sum` is bit-identical to the audit row's by construction. */
  private def chkTerm(rnk: Column, docId: Column): Column =
    pmod(pmod(rnk, lit(ChkMod)) * pmod(docId, lit(ChkMod)), lit(ChkMod))

  /** Loader-side validation manifest for an exported shard tree:
    * `outDir/_manifest.json` lists, per shard, the part files IN RANK
    * ORDER with each file's row count and `[lo, hi]` rank interval,
    * plus the shard totals and the q104 rank-weighted checksum. The
    * manifest's file order is the loader contract (below 100k write
    * tasks it coincides with lexicographic part-file name order, but
    * the manifest stays correct when Spark's part numbering outgrows
    * its zero padding); a loader asserts "every file present, nothing
    * truncated, ranks tile 1..n, checksum matches" from one small file
    * before an epoch instead of discovering a hole mid-run, and the
    * checksum cross-checks against the q104 audit row doc-for-doc.
    * What the manifest does NOT certify is INTRA-file physical row
    * order (its statistics are order-invariant aggregates) — that is
    * the embedded `rnk` column's job, and ExportSpec's read-back test
    * pins it at the sink level. Generation is ONE distributed scan of
    * the written export grouped by physical file — only one row per
    * part file reaches the driver, bounded by the writer task count at
    * any corpus size — and FAILS if the rank intervals stop tiling
    * 1..n densely (gap, overlap, or a duplicate-plus-missing pair
    * inside one file), so a sink layout regression surfaces at write
    * time, not in a consumer. */
  def writeManifest(s: SparkSession, outDir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(outDir, "_manifest.json")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    def put(json: String): Unit = {
      val out = fs.create(p, true)
      try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    // an empty selection writes an empty (but valid) export tree: no
    // part files means nothing to scan — emit the empty manifest
    // instead of letting schema inference throw
    val anyData = fs.exists(new org.apache.hadoop.fs.Path(outDir)) &&
      graft.ingest.Staging.countDataFiles(fs,
        new org.apache.hadoop.fs.Path(outDir)) > 0
    if (!anyData) { put("""{"n_total":0,"n_shards":0,"shards":[]}"""); return }
    val perFile = s.read.parquet(outDir)
      .groupBy(col("shard").cast("string").as("shard"),
        regexp_extract(input_file_name(), "[^/]+$", 0).as("file"))
      .agg(count(lit(1)).as("n"), min("rnk").as("lo"), max("rnk").as("hi"),
        countDistinct("rnk").as("nd"),
        sum(chkTerm(col("rnk"), col("doc_id"))).as("chk"))
      .collect()
    val shardsJson = perFile.groupBy(_.getString(0)).toSeq.sortBy(_._1)
      .map { case (shard, rows) =>
        // rank order, NOT name order: rank intervals are the contract,
        // and lo-order survives part numbers outgrowing their padding
        val files = rows.sortBy(_.getLong(3))
        var expect = 1L
        files.foreach { r =>
          val (lo, hi, cnt, nd) = (r.getLong(3), r.getLong(4), r.getLong(2), r.getLong(5))
          require(lo == expect && hi - lo + 1 == cnt && nd == cnt,
            s"export layout broken: shard $shard file ${r.getString(1)} " +
              s"covers [$lo,$hi] with $cnt rows ($nd distinct ranks), " +
              s"expected a dense duplicate-free interval starting at $expect")
          expect = hi + 1
        }
        val fileJson = files.map(r =>
          s"""{"file":"${r.getString(1)}","n":${r.getLong(2)},""" +
            s""""lo":${r.getLong(3)},"hi":${r.getLong(4)}}""").mkString("[", ",", "]")
        val orderSum = files.map(_.getLong(6)).sum
        val n = files.map(_.getLong(2)).sum
        (n, s"""{"shard":"$shard","n":$n,"order_sum":$orderSum,"files":$fileJson}""")
      }
    put(s"""{"n_total":${shardsJson.map(_._1).sum},""" +
      s""""n_shards":${shardsJson.size},""" +
      s""""shards":${shardsJson.map(_._2).mkString("[", ",", "]")}}""")
  }

  /** Greedy per-source fill to a PER-SOURCE quota in deterministic md5
    * order — q87's budgetFill generalized from one constant budget to a
    * (source, quota) frame (broadcast: one row per source). Same
    * two-phase shape; returns selected rows with input columns. */
  private[queries] def quotaFill(df: DataFrame, quotas: DataFrame, salt: String): DataFrame = {
    val base = df
      .withColumn("rk", md5(concat(lit(salt), col("doc_id").cast("string"))))
      .withColumn("sub", substring(col("rk"), 1, 2))
    val shardOffsets = base.groupBy("source", "sub")
      .agg(sum("n_tok").as("sh_tok"))
      .withColumn("sh_off", coalesce(
        sum("sh_tok").over(Window.partitionBy("source").orderBy("sub")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .join(quotas, Seq("source"))
      .filter(col("sh_off") < col("quota"))
      .select("source", "sub", "sh_off", "quota")
    val wIntra = Window.partitionBy("source", "sub").orderBy("rk", "doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(shardOffsets), Seq("source", "sub"))
      .withColumn("cum_before",
        col("sh_off") + coalesce(sum(col("n_tok")).over(wIntra), lit(0L)))
      .filter(col("cum_before") < col("quota"))
      .drop("rk", "sub", "sh_off", "quota", "cum_before")
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-shard export audit: sizes, token balance, the head doc, and a
    // rank-weighted checksum Σ ((rnk mod M)·(doc_id mod M)) mod M that
    // any cross-shard or intra-shard order change breaks.
    "q104_shard_export" -> ((s, d) => {
      shardRanked(docs(s, d).select(col("doc_id"), nTokens(col("text")).as("n_tok")))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_seqs"),
          sum("n_tok").as("n_tokens"),
          sum(chkTerm(col("rnk"), col("doc_id"))).as("order_sum"),
          min_by(col("doc_id"), col("rk")).as("first_doc"))
        .orderBy("shard")
    }),

    // Temperature-scaled mixture: quota_d = TempBudget · s_d / Σ s_d
    // with s_d = floor(sqrt(T_d·1e6)) — integer thereafter, so both
    // engines compute IDENTICAL quotas (a double Σ√T_d would differ in
    // the last ulp by addition order). The global Σ s_d window is over
    // one row per source — a bounded frame, not a corpus window.
    "q105_temperature_mixture" -> ((s, d) => {
      val base = docs(s, d)
        .select(col("doc_id"), col("source"), nTokens(col("text")).as("n_tok"))
      val tot = base.groupBy("source")
        .agg(count(lit(1)).as("n_total"), sum("n_tok").as("tokens_total"))
        .withColumn("s", floor(sqrt(col("tokens_total").cast("double") * 1e6)).cast("long"))
      val quotas = tot
        .withColumn("s_sum", sum("s").over(Window.partitionBy()))
        .withColumn("quota", expr(s"${TempBudget}L * s div s_sum"))
        .select("source", "n_total", "tokens_total", "quota")
      val selAgg = quotaFill(base, quotas.select("source", "quota"), MixSalt)
        .groupBy("source")
        .agg(count(lit(1)).as("n_sel"), sum("n_tok").as("sel_tokens"))
      quotas.join(selAgg, Seq("source"), "left")
        .select(col("source"), col("n_total"), col("tokens_total"), col("quota"),
          coalesce(col("n_sel"), lit(0L)).as("n_sel"),
          coalesce(col("sel_tokens"), lit(0L)).as("sel_tokens"))
        .orderBy("source")
    }))

  def oracles: Map[String, String] = Map(
    "q104_shard_export" ->
      s"""WITH base AS (
            SELECT doc_id,
              substr(md5('$ShardSalt' || CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
              md5('$OrderSalt' || CAST(doc_id AS VARCHAR)) AS rk,
              CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
            FROM documents),
          r AS (
            SELECT *, CAST(ROW_NUMBER() OVER (
              PARTITION BY shard ORDER BY rk, doc_id) AS BIGINT) AS rnk
            FROM base)
          SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_seqs,
                 CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
                 CAST(SUM(((rnk % $ChkMod) * (doc_id % $ChkMod)) % $ChkMod) AS BIGINT) AS order_sum,
                 MIN_BY(doc_id, rk) AS first_doc
          FROM r GROUP BY 1 ORDER BY 1""",
    "q105_temperature_mixture" ->
      s"""WITH base AS (
            SELECT doc_id, source,
              CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
              md5('$MixSalt' || CAST(doc_id AS VARCHAR)) AS rk
            FROM documents),
          tot AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_total,
                   CAST(SUM(n_tok) AS BIGINT) AS tokens_total,
                   CAST(FLOOR(SQRT(CAST(SUM(n_tok) AS DOUBLE) * 1000000.0)) AS BIGINT) AS s
            FROM base GROUP BY 1),
          q AS (
            SELECT source, n_total, tokens_total,
                   CAST(($TempBudget * s) // (SELECT SUM(s) FROM tot) AS BIGINT) AS quota
            FROM tot),
          c AS (
            SELECT b.*, COALESCE(SUM(n_tok) OVER (PARTITION BY b.source
                ORDER BY rk, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
            FROM base b),
          sel AS (
            SELECT c.source, CAST(COUNT(*) AS BIGINT) AS n_sel,
                   CAST(SUM(c.n_tok) AS BIGINT) AS sel_tokens
            FROM c JOIN q USING (source) WHERE cum_before < quota GROUP BY 1)
          SELECT q.source, q.n_total, q.tokens_total, q.quota,
                 COALESCE(sel.n_sel, 0) AS n_sel,
                 COALESCE(sel.sel_tokens, 0) AS sel_tokens
          FROM q LEFT JOIN sel USING (source) ORDER BY 1""")
}
