package graft.queries

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable 64-bit perceptual-fingerprint index — the MULTIMODAL member
  * of the lake's dedup-index family (SURVEY.md §2.10 X2×X5): the
  * [[MinHashIndex]] build/probe/append lifecycle applied to the q97/q98
  * fingerprints (image block-hash, audio RMS-delta, video frame-luma
  * delta), so an ingest tick can quarantine payloads that perceptually
  * near-duplicate an ALREADY-INGESTED image/audio/video instead of
  * re-ingesting visual duplicates forever — the reference's
  * quarantine-at-ingest philosophy (psuedo_code.txt:195-208) extended to
  * the modality its north star names.
  *
  * One artifact: `fps/` (doc_id, fp) — 16 bytes per indexed payload.
  * No feature store is needed (unlike MinHash's shingle sets): the
  * fingerprint IS the verification feature — the exact check is one
  * codegen `bit_count(a ^ b) <= maxHamming` on the candidate pair, so
  * probe verification never joins anything by id.
  *
  * Candidate generation is EXACT and bucket-bounded at any index size:
  * both sides explode into [[DedupOps.tripleKeyed]]'s 20 block-triple
  * keys (Manku multi-index — Hamming <= 3 damages at most 3 of 6
  * blocks, so some triple survives intact; ~33-bit keys outgrow any
  * corpus, see simhashCandidates' scaladoc), the batch side BROADCASTS
  * into the equi-join, and the index side is scanned in place — it
  * never shuffles, so per-batch probe cost is O(batch fps + touched
  * buckets), independent of index size. The 100 TB shape.
  *
  * LIFECYCLE, CONCURRENCY: exactly [[MinHashIndex]]'s — append-on-commit
  * as new immutable parquet files under a single-writer discipline;
  * probes are snapshot-safe because appends only ADD files;
  * [[appendStaged]] gives AT-LEAST-ONCE callers a replay-idempotent
  * commit via the same deterministic-prefix sweep; [[compact]] is the
  * same crash-safe two-rename rewrite.
  */
object FingerprintIndex {
  /** Store directory name under the index root. */
  val Store = "fps"

  /** Exact e6-scaled Hamming SIMILARITY, the fingerprint family's
    * analogue of the MinHash gate's `jac_e6`: (64 − hamming)·1e6/64 =
    * (64 − hamming)·15625 exactly (integer — no rounding). Hamming 0 →
    * 1000000, 1 → 984375, 2 → 968750, 3 → 953125. Lets fingerprint
    * suppressions ride the SAME dedup-DLQ audit columns as text
    * suppressions (q90). */
  def simE6(hamming: Column): Column =
    ((lit(64L) - hamming) * lit(15625L)).cast("long")

  private def fsOf(s: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Does the fingerprint store exist under `root`? The first-tick
    * probe guard in [[graft.pipeline.DedupStage]]. `store` selects the
    * per-modality namespace (see [[graft.pipeline.FingerprintGate
    * .store]] — image and audio fingerprints live in different feature
    * spaces and must not share one Hamming bucket space). */
  def storeExists(s: SparkSession, root: String, store: String = Store): Boolean =
    fsOf(s, root).exists(new Path(root, store))

  private def normalized(fps: DataFrame): DataFrame =
    fps.select(col("doc_id").cast("long").as("doc_id"), col("fp").cast("long").as("fp"))

  /** From-scratch build of the store at `root` over a (doc_id, fp)
    * frame (overwrites). */
  def build(s: SparkSession, root: String, fps: DataFrame,
            store: String = Store): Unit =
    normalized(fps).write.mode("overwrite").parquet(s"$root/$store")

  /** Append-on-commit: add a committed batch's fingerprints. Append-only
    * (new files land beside existing ones); caller is the single writer. */
  def append(s: SparkSession, root: String, fps: DataFrame,
             store: String = Store): Unit =
    normalized(fps).write.mode("append").parquet(s"$root/$store")

  /** Replay-idempotent [[append]] for AT-LEAST-ONCE callers (the
    * streaming ingest twin): stage, then publish with a deterministic
    * `f<token>-` prefix sweeping any files a crashed previous attempt of
    * the same token already moved — replaying a token converges to
    * exactly one copy. The `f` prefix is disjoint from [[MinHashIndex
    * .appendStaged]]'s `b<token>-` so both indexes can share one root. */
  def appendStaged(s: SparkSession, root: String, fps: DataFrame,
                   token: String, store: String = Store): Unit = {
    val fs = fsOf(s, root)
    val stage = new Path(new Path(root), s".append-$store-$token")
    fs.delete(stage, true)
    normalized(fps).write.mode("overwrite").parquet(s"${stage.toString}/$store")
    graft.ingest.Staging.publish(fs, stage, new Path(root), s"f$token-",
      replaceExistingPrefix = true)
    fs.delete(stage, true): Unit
  }

  /** Probe a batch of (doc_id, fp) fingerprints against the index at
    * `root`: one row `(new_id, old_id, hamming)` per batch↔index pair
    * within `maxHamming`. The batch side (one ingest tick) broadcasts;
    * the index side never shuffles. `new_id == old_id` pairs are
    * dropped — a doc is never a duplicate of itself, which keeps an
    * at-least-once caller's replay benign (its own already-appended
    * entries cannot suppress it). Exact for `maxHamming` <= 3 (the
    * block-triple pigeonhole bound). */
  def probe(s: SparkSession, root: String, fps: DataFrame,
            maxHamming: Int = 3, store: String = Store): DataFrame = {
    require(maxHamming <= 3,
      s"block-triple candidates are exact only to Hamming 3 (got $maxHamming)")
    val old = DedupOps.tripleKeyed(graft.engine.Tables.parquet(s, s"$root/$store"), "fp")
      .select(col("combo"), col("ck"), col("doc_id").as("old_id"), col("fp").as("hb"))
    val neu = broadcast(DedupOps.tripleKeyed(normalized(fps), "fp")
      .select(col("combo"), col("ck"), col("doc_id").as("new_id"), col("fp").as("ha")))
    neu.join(old, Seq("combo", "ck"))
      .filter(col("new_id") =!= col("old_id"))
      .select("new_id", "old_id", "ha", "hb").distinct()
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("new_id"), col("old_id"), col("hamming").cast("long").as("hamming"))
  }

  /** Verified Hamming-radius pairs WITHIN one (doc_id, fp) frame — the
    * q97 kernel re-exported for the ingest gate's intra-batch window
    * (both copies arrived in the same tick; neither is indexed yet).
    * One row `(a_id, b_id, hamming)` per unordered pair, `a_id < b_id`. */
  def selfEdges(fps: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      s"block-triple candidates are exact only to Hamming 3 (got $maxHamming)")
    DedupOps.simhashCandidates(
        normalized(fps).select(col("doc_id"), col("fp").as("simhash")))
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming").cast("long").as("hamming"))
  }

  /** Compact the append-only store (content-preserving rewrite into
    * `targetFiles` files, crash-safe via [[graft.ingest.Staging
    * .compactStore]]'s two-rename swap). Single-writer, like every
    * other index mutation. */
  def compact(s: SparkSession, root: String, targetFiles: Int = 1,
              store: String = Store): Unit =
    graft.ingest.Staging.compactStore(fsOf(s, root), new Path(root), store) { staged =>
      s.read.parquet(s"$root/$store").coalesce(targetFiles)
        .write.parquet(staged.toString)
    }
}
