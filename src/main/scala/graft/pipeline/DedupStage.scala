package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{FingerprintIndex, MinHashIndex}

/** Multimodal fingerprint gate config for [[DedupStage]] (X2×X5 at
  * ingest): rows whose 64-bit perceptual fingerprint near-duplicates an
  * already-ingested payload (or a same-tick batch-mate's) divert to the
  * dedup DLQ like text near-dups, and survivors' fingerprints are
  * appended to the durable [[graft.queries.FingerprintIndex]] after the
  * publish commit point — closing the window the round-11 lake left
  * open: text was gated at ingest, pixels were not, so a LAION-shape
  * lake re-ingested visual duplicates forever.
  *
  * `extract` appends [[FingerprintGate.FpCol]] (nullable long) to the
  * curated frame — e.g. `unbase64` a payload field and run it through
  * [[graft.queries.ImageHash.hash]]; NULL means "no fingerprintable
  * payload" (text-only row, corrupt image, absent column) and the row
  * passes the gate untouched. It must be TOTAL: decode failures become
  * null fingerprints, never exceptions (the decoder family's quarantine
  * contract). Suppressions ride the same DLQ audit columns as text
  * flags, with `jac_e6` carrying the exact Hamming SIMILARITY
  * ([[FingerprintIndex.simE6]]: (64−hamming)·15625) and `dup_reason`
  * `"fp_index"` / `"fp_batch"` (q90 audits both). */
final case class FingerprintGate(
    extract: DataFrame => DataFrame,
    maxHamming: Int = 3,
    /** Audit/namespace tag: DLQ reasons are `"<tag>_index"` /
      * `"<tag>_batch"` and the durable store directory is
      * `"fps_<tag>"` (`"fp"` keeps the default `fps/` store). A
      * MULTIMODAL lake runs one gate per modality — image and audio
      * fingerprints are 64-bit values in DIFFERENT feature spaces, so
      * sharing one store would let an image hash near-collide an audio
      * fingerprint and flag a spurious cross-modality duplicate;
      * per-gate stores keep each bucket space modality-pure. */
    tag: String = "fp") {
  /** Store directory under the index root (see [[graft.queries
    * .FingerprintIndex]]). */
  def store: String =
    if (tag == "fp") graft.queries.FingerprintIndex.Store else s"fps_$tag"
}

object FingerprintGate {
  /** The nullable-long fingerprint column [[FingerprintGate.extract]]
    * appends. Never reaches the lake — the gate reads it off a derived
    * projection, not the published frame. */
  val FpCol = "_fp"
}

/** Optional near-dup gate for the ingest pipeline (SURVEY.md §2.10 X2
  * as an INGEST STAGE, not a standalone query): after segregation and
  * curation, the batch's rows are probed against the lake's durable
  * MinHash signature index ([[graft.queries.MinHashIndex]]); rows that
  * near-duplicate an already-ingested doc are diverted to a dedup DLQ
  * (with the matched doc and exact Jaccard) instead of the curated
  * lake, and the SURVIVORS' signatures are appended to the index after
  * the publish commit point — so the next tick probes an index that
  * already contains this tick (the q83 lifecycle, running inside
  * [[BatchProcessor]]).
  *
  * Semantics and scale:
  *  - BOTH duplicate windows are closed: batch↔index (rows matching an
  *    already-ingested doc) AND batch↔batch (two copies arriving in the
  *    SAME tick — invisible to the index probe because neither copy is
  *    indexed yet; the q32 self-join kernel pairs them and the minimum
  *    keyed id per duplicate component survives), so no duplicate
  *    reaches the lake regardless of arrival interleaving — the
  *    reference's idempotency philosophy (psuedo_code.txt:57-59);
  *  - per-tick cost is O(batch signatures + touched buckets),
  *    independent of index size — the batch side broadcasts, the index
  *    side never shuffles ([[MinHashIndex.probeShingled]]); the
  *    intra-batch self-join is batch↔batch only (one tick, broadcast
  *    scale);
  *  - `id`/`text` are caller-chosen columns over the CURATED frame;
  *    ids are keyed through xxhash64 so any id type joins the index's
  *    long doc_id space; docs under 3 tokens are never flagged and
  *    never indexed (no shingles);
  *  - index append is AFTER publish: a crash between them under-indexes
  *    (a future dup of this batch could slip through) but can never
  *    double-publish or double-append — replayed files are
  *    marker-excluded from curation, so their rows are not re-appended.
  *    Appends inherit the single-writer discipline of the ticks that
  *    issue them.
  */
final case class DedupStage(
    /** Index location as a Hadoop FS URI (or schemeless local path) —
      * the index lives beside the lake it guards, so any scheme the
      * deployment's Hadoop conf binds works (`file:`, `hdfs:`,
      * `s3a:`, ...); all existence probes and writes go through the
      * [[org.apache.hadoop.fs.FileSystem]] API. */
    indexRoot: String,
    id: Column,
    text: Column,
    minJaccard: Double = 0.8,
    /** When set, doc-level SURVIVORS are additionally span-scrubbed
      * (the Lee-et-al exact-substring pass at ingest, q88/q89): tokens
      * inside any [[graft.queries.MinHashIndex.probeSpans]] span —
      * a window-for-window match against already-committed docs — are
      * dropped before publish AND before the index append, so the lake
      * never stores the duplicated paragraph twice. The setter writes
      * the scrubbed text back into the caller's schema (needed because
      * `text` may be a nested field — e.g.
      * `(df, c) => df.withColumn("payload", col("payload").withField("props", c))`).
      * Rows whose text was touched are counted into the ledger note via
      * the `_scrubbed_spans` audit column (dropped before publish). */
    spanScrub: Option[(DataFrame, Column) => DataFrame] = None,
    /** Optional multimodal fingerprint gates (see [[FingerprintGate]]),
      * one per modality: each runs AFTER the text windows over their
      * survivors (a row already flagged against the lake or a batch-mate
      * is out either way), with the same two windows — batch↔index
      * against the gate's own durable [[FingerprintIndex]] store under
      * [[indexRoot]], then batch↔batch among the remainder — and the
      * same append-on-commit lifecycle. Stores are per-gate
      * ([[FingerprintGate.store]]) so modality bucket spaces never
      * cross-collide; gates run in order, each over the previous gates'
      * survivors. */
    fingerprints: Seq[FingerprintGate] = Nil,
    /** File-count compaction trigger for the stage's durable stores
      * (MinHash `bands`/`shingles`/`winhashes` + one `fps_<tag>` per
      * gate): every tick appends one small parquet file per store, so
      * after thousands of ticks probe PLANNING pays a thousands-file
      * listing — the degradation [[graft.queries.MinHashIndex.compact]]
      * / [[graft.queries.FingerprintIndex.compact]] exist to undo.
      * [[maintain]] (called by both runners after their commit point)
      * compacts any store whose visible data-file count exceeds this.
      * The trigger is a FILE count, not a byte size: the bounded cost
      * is per-file open/footer/listing overhead, which is
      * size-independent. */
    compactThresholdFiles: Int = 256) {

  /** Audit column [[partition]] adds to survivors under [[spanScrub]]:
    * number of already-in-corpus spans removed from the row's text
    * (0 = untouched). [[graft.pipeline.BatchProcessor]] notes per-file
    * counts and drops the column before the staged publish. */
  val ScrubAuditCol = "_scrubbed_spans"

  private def keyed(curated: DataFrame): DataFrame =
    curated.withColumn("_dedup_id", xxhash64(id))

  /** Split the curated batch into (survivors, flagged near-dups). The
    * flagged frame carries the curated columns plus `dup_of` (the best
    * Jaccard match — an index doc_id for batch↔index flags, the
    * SURVIVING batch-mate's keyed id for intra-batch flags), `jac_e6`,
    * and `dup_reason` (`"index"` = matched an already-ingested doc,
    * `"batch"` = matched a same-tick batch-mate — the audit dimension
    * the dedup DLQ consumer aggregates by, q90); None when nothing is
    * flagged. The duplicate RESOLUTION
    * (index probe + intra-batch self-join + union-find) runs eagerly
    * here — its result is a driver-resident flag list bounded by the
    * tick's suppression count, the same batch-bounded budget as
    * [[BatchProcessor]]'s per-file disposition collect — and the
    * returned frames join that list back as a broadcast local relation,
    * so materializing them never re-runs the probe. */
  def partition(s: SparkSession, curated: DataFrame): (DataFrame, Option[DataFrame]) = {
    val k = keyed(curated)
    val sh = MinHashIndex.shingle(
      k.select(col("_dedup_id").as("doc_id"), text.as("text"))).persist()
    // 1. batch ↔ index: best match per batch row, max by Jaccard.
    //    Skipped on the first tick (no index to probe against yet).
    val indexDups: Array[(Long, Long, Long)] =
      if (!MinHashIndex.storeExists(s, indexRoot, "bands")) Array.empty
      else MinHashIndex.probeShingled(s, indexRoot, sh, minJaccard)
        .groupBy("new_id")
        .agg(max(struct(col("jac_e6"), col("old_id"))).as("m"))
        .select(col("new_id"), col("m.old_id"), col("m.jac_e6"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // 2. batch ↔ batch among the index survivors: a row already flagged
    //    against the lake is out either way; its batch-mates dedup among
    //    themselves (keeping one whose only match was the flagged row is
    //    correct — vs the LAKE it is no duplicate).
    val shSurv =
      if (indexDups.isEmpty) sh
      else {
        import s.implicits._
        sh.join(broadcast(indexDups.map(_._1).toSeq.toDF("doc_id")),
          Seq("doc_id"), "left_anti")
      }
    val batchDups = intraBatchDups(s, shSurv)
    sh.unpersist()
    val textDups = indexDups.toSeq.map { case (a, b, j) => (a, b, j, "index") } ++
      batchDups.map { case (a, b, j) => (a, b, j, "batch") }
    // each gate sees every earlier flag (text first, then prior gates)
    val dups = fingerprints.foldLeft(textDups) { (acc, g) =>
      acc ++ fingerprintDups(s, k, g, acc.map(_._1).toSet)
    }
    val (survivors0, flagged) =
      if (dups.isEmpty) (k, None)
      else {
        import s.implicits._
        val dupsDf = broadcast(dups.toDF("new_id", "dup_of", "jac_e6", "dup_reason"))
        (k.join(dupsDf.select("new_id"), k("_dedup_id") === col("new_id"), "left_anti"),
          Some(k.join(dupsDf, k("_dedup_id") === col("new_id"))
            .drop("new_id", "_dedup_id")))
      }
    val survivors = spanScrub match {
      case Some(setter) => scrubSpans(s, survivors0, setter).drop("_dedup_id")
      case None => survivors0.drop("_dedup_id")
    }
    (survivors, flagged)
  }

  /** Pair duplicates WITHIN one tick — the window the index probe cannot
    * see (both copies arrived together; neither is indexed yet). Runs
    * the q32 self-join kernel ([[MinHashIndex.selfEdges]]) over the
    * batch's shingles, collects the verified edge set to the driver
    * (bounded by the tick's duplicate pair mass — one tick, not the
    * corpus), and closes it with union-find so transitive chains
    * (A~B~C) keep exactly one copy: per component the MINIMUM keyed id
    * survives; every other member is flagged `(id, dup_of = the
    * surviving batch-mate, jac_e6 = its best incident edge)`. `dup_of`
    * always names a doc that IS being published, even mid-chain (C's
    * best match B may itself be flagged; C's `dup_of` is the component
    * survivor A). */
  private def intraBatchDups(s: SparkSession, shSurv: DataFrame): Seq[(Long, Long, Long)] =
    closeEdges(MinHashIndex.selfEdges(s, shSurv, minJaccard)
      .select("a_id", "b_id", "jac_e6")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))

  /** Union-find closure of a driver-resident `(a, b, score)` edge list
    * (bounded by the tick's duplicate pair mass): per component the
    * MINIMUM id survives; every other member is flagged `(id, rep,
    * best incident score)`. Shared by the text and fingerprint
    * intra-batch windows — scores are jac_e6 / sim_e6 respectively,
    * both "bigger = more similar". */
  private def closeEdges(edges: Array[(Long, Long, Long)]): Seq[(Long, Long, Long)] = {
    if (edges.isEmpty) return Nil
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    val best = scala.collection.mutable.LongMap.empty[Long]
    edges.foreach { case (a, b, j) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val ra = find(a); val rb = find(b)
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
      best(a) = math.max(best.getOrElse(a, Long.MinValue), j)
      best(b) = math.max(best.getOrElse(b, Long.MinValue), j)
    }
    parent.keys.toSeq.flatMap { id =>
      val rep = find(id)
      if (rep == id) None else Some((id, rep, best(id)))
    }
  }

  /** One fingerprint gate's two windows over the earlier flags'
    * survivors (see [[fingerprints]]): batch↔index against the gate's
    * durable [[FingerprintIndex]] store (best match per row = MINIMUM
    * Hamming, skipped on the first tick like the text probe), then
    * batch↔batch among the remainder via [[FingerprintIndex.selfEdges]]
    * + [[closeEdges]]. Rows in `alreadyFlagged` and rows with a null
    * fingerprint never participate. Scores are [[FingerprintIndex
    * .simE6]] similarities so the flags ride the same `jac_e6` DLQ
    * column as text flags; reasons are `<tag>_index` / `<tag>_batch`. */
  private def fingerprintDups(s: SparkSession, k: DataFrame, g: FingerprintGate,
                              alreadyFlagged: Set[Long]): Seq[(Long, Long, Long, String)] = {
    import s.implicits._
    val simE6 = (h: Long) => (64L - h) * 15625L
    val kf = g.extract(k)
      .filter(col(FingerprintGate.FpCol).isNotNull)
      .select(col("_dedup_id").as("doc_id"), col(FingerprintGate.FpCol).as("fp"))
    val fps = (if (alreadyFlagged.isEmpty) kf
               else kf.join(broadcast(alreadyFlagged.toSeq.toDF("doc_id")),
                 Seq("doc_id"), "left_anti")).persist()
    val idxFlags: Array[(Long, Long, Long)] =
      if (!FingerprintIndex.storeExists(s, indexRoot, g.store)) Array.empty
      else FingerprintIndex.probe(s, indexRoot, fps, g.maxHamming, g.store)
        .groupBy("new_id")
        .agg(min(struct(col("hamming"), col("old_id"))).as("m"))
        .select(col("new_id"), col("m.old_id"), col("m.hamming"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val fpSurv =
      if (idxFlags.isEmpty) fps
      else fps.join(broadcast(idxFlags.map(_._1).toSeq.toDF("doc_id")),
        Seq("doc_id"), "left_anti")
    val batchFlags = closeEdges(FingerprintIndex.selfEdges(fpSurv, g.maxHamming)
      .collect().map(r => (r.getLong(0), r.getLong(1), simE6(r.getLong(2)))))
    fps.unpersist()
    idxFlags.toSeq.map { case (a, b, h) => (a, b, simE6(h), s"${g.tag}_index") } ++
      batchFlags.map { case (a, b, e6) => (a, b, e6, s"${g.tag}_batch") }
  }

  /** Span-scrub doc-level survivors against the index's winhashes store
    * (see [[spanScrub]]): per surviving row, drop every token inside an
    * already-in-corpus span and write the reassembled text back through
    * the setter. The span list is [[MinHashIndex.probeSpans]]' output
    * grouped per doc — a tiny broadcast build side (one ingest tick's
    * matches); the token filter is one scan pass (the q81 kernel). */
  private def scrubSpans(s: SparkSession, keyedSurvivors: DataFrame,
                         setter: (DataFrame, Column) => DataFrame): DataFrame = {
    if (!MinHashIndex.storeExists(s, indexRoot, "winhashes"))
      return keyedSurvivors.withColumn(ScrubAuditCol, lit(0L))
    val spans = MinHashIndex.probeSpans(s, indexRoot,
        keyedSurvivors.select(col("_dedup_id").as("doc_id"), text.as("text")))
      .groupBy("doc_id")
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("_sp"))
      .select(col("doc_id").as("_sp_id"), col("_sp"))
    val joined = keyedSurvivors
      .join(broadcast(spans), col("_dedup_id") === col("_sp_id"), "left")
      .withColumn("_tk", split(text, " "))
      .withColumn("_keep", expr(
        "filter(transform(_tk, (t, i) -> struct(t AS t, i AS i)), " +
          "x -> _sp IS NULL OR NOT exists(_sp, " +
          "r -> x.i >= r.span_start AND x.i < r.span_end))"))
    val scrubbedText = expr("array_join(transform(_keep, x -> x.t), ' ')")
    setter(
      joined
        .withColumn(ScrubAuditCol,
          coalesce(expr("size(_sp)").cast("long"), lit(0L))),
      when(col("_sp").isNull, text).otherwise(scrubbedText))
      .drop("_sp_id", "_sp", "_tk", "_keep")
  }

  /** Survivors' (doc_id, fp) rows for the fingerprint-store append —
    * re-extracted from the published frame (the extract is one cheap
    * codegen/byte-walk pass over a batch-bounded frame; re-running it
    * beats threading a side frame through the publish path). */
  private def survivorFps(g: FingerprintGate, survivors: DataFrame): DataFrame =
    g.extract(survivors.withColumn("_dedup_id", xxhash64(id)))
      .filter(col(FingerprintGate.FpCol).isNotNull)
      .select(col("_dedup_id").as("doc_id"), col(FingerprintGate.FpCol).as("fp"))

  /** Append-on-commit: index the published survivors so the NEXT tick
    * probes against them. Call strictly after the publish commit point.
    * Each [[fingerprints]] gate's survivors are appended to its own
    * [[FingerprintIndex]] store in the same step. */
  def appendSurvivors(s: SparkSession, survivors: DataFrame): Unit = {
    MinHashIndex.append(s, indexRoot,
      survivors.select(xxhash64(id).as("doc_id"), text.as("text")))
    for (g <- fingerprints)
      FingerprintIndex.append(s, indexRoot, survivorFps(g, survivors), g.store)
  }

  /** [[appendSurvivors]] for AT-LEAST-ONCE callers: the streaming twin's
    * `foreachBatch` may replay a micro-batch after a crash, so its
    * append goes through [[MinHashIndex.appendStaged]] keyed by the
    * deterministic micro-batch token — a replayed token sweeps the
    * crashed attempt's files before moving its own, converging to
    * exactly one copy (no double-append window). */
  def appendSurvivorsStaged(s: SparkSession, survivors: DataFrame,
                            token: String): Unit = {
    MinHashIndex.appendStaged(s, indexRoot,
      survivors.select(xxhash64(id).as("doc_id"), text.as("text")), token)
    for (g <- fingerprints)
      FingerprintIndex.appendStaged(s, indexRoot, survivorFps(g, survivors),
        token, g.store)
  }

  /** The tick's index-maintenance slot: compact every durable store
    * whose visible data-file count exceeds [[compactThresholdFiles]]
    * (each tick's append adds one file per store; unbounded ticks would
    * otherwise make probe planning pay an unbounded listing). Returns
    * the compacted store names (empty = nothing was fragmented).
    *
    * Callers run it AFTER their commit point, under the index's
    * single-writer discipline — in particular the streaming runner
    * calls it only after the micro-batch's commit marker exists,
    * because compaction renames away the `b<token>-`/`f<token>-`
    * prefixes a replayed [[appendSurvivorsStaged]] would key its sweep
    * on (the interleaving [[graft.queries.MinHashIndex.compact]]'s
    * scaladoc forbids). Compaction itself is crash-safe per store via
    * [[graft.ingest.Staging.compactStore]]'s two-rename swap, so a
    * tick dying mid-maintenance self-heals on the next tick's call.
    * Probe semantics are content-identical across a compaction
    * (IngestSpec drives a post-compaction tick and asserts identical
    * suppressions). */
  def maintain(s: SparkSession): Seq[String] = {
    val rootPath = new org.apache.hadoop.fs.Path(indexRoot)
    val fs = rootPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    def dataFiles(store: String): Int =
      graft.ingest.Staging.countDataFiles(fs,
        new org.apache.hadoop.fs.Path(rootPath, store))
    val minhashStores = Seq("bands", "shingles", "winhashes")
    val compactedText =
      if (minhashStores.exists(dataFiles(_) > compactThresholdFiles)) {
        // one fragmented store compacts the family: the three stores
        // fragment in lockstep (every append writes all three) and
        // MinHashIndex.compact rewrites them together
        MinHashIndex.compact(s, indexRoot)
        minhashStores
      } else Nil
    val compactedFps = fingerprints.map(_.store).distinct
      .filter(dataFiles(_) > compactThresholdFiles)
    compactedFps.foreach(st => FingerprintIndex.compact(s, indexRoot, store = st))
    compactedText ++ compactedFps
  }
}
