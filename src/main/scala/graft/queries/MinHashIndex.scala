package graft.queries

import java.io.File
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable
import graft.engine.Tables
import graft.pipeline.DemoCache

/** Durable MinHash signature index over the EXISTING corpus (q82/q83):
  * the band rows and shingle sets of every already-ingested doc, written
  * to parquet under `var/demo` and probed by each incoming
  * batch (roots `minhash/<sf>` and `minhash_app/<sf>`). This is the
  * production form of the q79 incremental dedup: a live pipeline amortizes the corpus-side shingle+signature pass into a
  * durable index, so per-batch work is ONLY the batch's own signatures
  * plus the bucket probe — the same build-once/query-many lifecycle as
  * the IVF index (q51) and the bucketed join tables (q48).
  *
  * Two artifacts, the classic index + feature-store split:
  *  - `bands/`    (doc_id, band, bh): the probe target;
  *  - `shingles/` (doc_id, sh): exact-verification features, joined
  *    BY ID only for the (tiny) collision set.
  *
  * LIFECYCLE (q83): the index is append-on-commit, not build-once. After
  * a batch's near-dups are resolved, [[append]] adds the surviving docs'
  * band rows + shingles as NEW parquet files in the same directories —
  * an append-only write, existing files are immutable — so batch N+1
  * probes an index that already contains batch N. DedupSpec proves two
  * sequential appends produce byte-identical index CONTENT to one
  * from-scratch build over the union.
  *
  * CONCURRENCY: appends follow the repo's single-writer discipline (the
  * parquet-Ledger rule, Ledger.scala) — one ingest driver owns the index
  * and serializes appends through the commit path ([[graft.pipeline
  * .BatchProcessor]] ticks are sequential); readers are snapshot-safe
  * because parquet append only ADDS files and a probe lists the
  * directory once at plan time. At 100 TB the same contract holds with
  * the band table bucketed by (band, bh); multi-writer deployments would
  * swap the directory listing for a transactional table format, which is
  * an orthogonal storage choice — the probe and append plans are
  * unchanged.
  *
  * Memoized per JVM and durable across JVMs via [[DemoCache]] markers;
  * Bench builds both roots outside the timing loop. The q82 root indexes
  * doc_id < [[CorpusCap]] — the same "existing corpus" split q79
  * recomputes in-flight, so DedupSpec can assert the two paths emit
  * identical edges. The q83 root starts from the same corpus and then
  * [[append]]s batch A (doc_id [[CorpusCap]]..<[[BatchSplit]]), so the
  * q83 probe of batch B (doc_id >= [[BatchSplit]]) sees corpus ∪ A.
  */
object MinHashIndex {
  val CorpusCap = 400
  /** q83 split: batch A = [CorpusCap, BatchSplit), batch B = [BatchSplit, 500). */
  val BatchSplit = 450
  private val built = mutable.Map.empty[String, String]

  /** The Hadoop [[FileSystem]] bound to `root`'s scheme. All index file
    * handling (existence probes, compaction renames) goes through this,
    * never `java.io.File` — the index lives beside the lake it guards
    * (diagram_1.txt:8-11 puts the lake on object storage), so `root`
    * may be any FS URI the deployment's Hadoop conf can bind
    * (`file:`, `hdfs:`, `s3a:`, ...). */
  private def fsOf(s: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Does store `store` (e.g. "bands") exist under the index `root`?
    * The first-tick probe guard in [[graft.pipeline.DedupStage]]. */
  def storeExists(s: SparkSession, root: String, store: String): Boolean =
    fsOf(s, root).exists(new Path(root, store))

  /** Shingle `docsDf` and write its band rows + shingle sets + span
    * window hashes into the index at `root` with the given save mode
    * ("overwrite" = initial build, "append" = commit a new batch).
    * `winhashes/` is the third store: the distinct [[DedupOps
    * .SpanWindow]]-token window hashes of the indexed docs — the probe
    * target of the INCREMENTAL span dedup (q88/q89). Distinct is
    * per-write only (append-only files are immutable), which is
    * sufficient because every consumer probes it with SEMI joins —
    * duplicate keys across files change nothing. */
  private def write(s: SparkSession, root: String, docsDf: DataFrame,
                    mode: String): Unit = {
    val sh = DedupOps.shingled(docsDf)
    // the shingled frame feeds both stores; persist it unless a query
    // closure already cached the same canonical plan this session (a
    // second persist would only warn, and unpersisting here would evict
    // the other owner's cache)
    val ownCache = sh.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    if (ownCache) sh.persist()
    sh.write.mode(mode).parquet(s"$root/shingles")
    DedupOps.bandRows(s, sh)
      .write.mode(mode).parquet(s"$root/bands")
    if (ownCache) sh.unpersist()
    DedupOps.spanWindows(docsDf).select("wh").dropDuplicates("wh")
      .write.mode(mode).parquet(s"$root/winhashes")
    ()
  }

  /** Probe the `winhashes` store with a batch of `(doc_id, text)` docs
    * (q89; the ingest-time Lee-et-al pass against the DURABLE index):
    * merged per-doc spans of the batch whose windows already exist in
    * the indexed corpus. Both probes are broadcast semi joins — the
    * batch's window-hash set out to the store scan, the matched set
    * back over the batch — so the index side never shuffles and the
    * per-batch cost is O(batch windows + store scan). */
  def probeSpans(s: SparkSession, root: String, docsDf: DataFrame): DataFrame = {
    val wins = DedupOps.spanWindows(docsDf)
    val store = graft.engine.Tables.parquet(s, s"$root/winhashes")
    val matched = store
      .join(broadcast(wins.select("wh").distinct()), Seq("wh"), "left_semi")
      .select("wh").distinct()
    DedupOps.mergeSpans(
      wins.join(broadcast(matched), Seq("wh"), "left_semi").select("doc_id", "pos"))
  }

  /** From-scratch index build at `root` over `docsDf` (overwrites). */
  def build(s: SparkSession, root: String, docsDf: DataFrame): Unit =
    write(s, root, docsDf, "overwrite")

  /** (doc_id, sh) for an arbitrary `(doc_id, text)` frame — the dedup
    * kernels' shingling (codegen token 3-grams, distinct; <3-token docs
    * drop out), public so index writers/probers outside this package
    * (the ingest [[graft.pipeline.DedupStage]]) share the exact
    * definition the index content was built with. */
  def shingle(docs: DataFrame): DataFrame = DedupOps.shingled(docs)

  /** Verified near-dup edges WITHIN one [[shingle]]d frame — the q32
    * self-join kernel (band-bucket candidates, exact-Jaccard verify),
    * re-exported for probers outside this package. The ingest
    * [[graft.pipeline.DedupStage]] runs it over ONE tick's shingles to
    * pair intra-batch duplicates the index probe cannot see (both copies
    * arrived together, neither is indexed yet). One row
    * `(a_id, b_id, jac_e6)` per unordered pair with Jaccard >= `minJ`,
    * `a_id < b_id`. */
  def selfEdges(s: SparkSession, sh: DataFrame, minJ: Double): DataFrame =
    DedupOps.minhashEdges(s, sh, minJ)

  /** Probe an already-[[shingle]]d batch against the index at `root`:
    * one row `(new_id, old_id, jac_e6)` per batch↔index pair with exact
    * Jaccard >= `minJ`. The batch side (tiny — one ingest tick)
    * broadcasts into the band join and the shingle verify, so the index
    * side is scanned in place and never shuffles; only (new, old)
    * band-bucket collisions are exact-verified, BY ID, against the
    * shingle store. Per-batch cost is O(batch signatures + touched
    * buckets) — independent of corpus pair mass at any index size.
    *
    * A doc is never a duplicate of ITSELF: pairs with `new_id ==
    * old_id` are dropped, the index-probe form of the self-join
    * kernel's `a_id < b_id` convention. This is also what makes an
    * AT-LEAST-ONCE caller's replay benign — a replayed batch whose
    * first attempt already appended to the index re-probes its own
    * entries (same keyed ids) and must not suppress itself. */
  def probeShingled(s: SparkSession, root: String, sh: DataFrame,
                    minJ: Double): DataFrame = {
    val bands = graft.engine.Tables.parquet(s, s"$root/bands")
    val oldSh = graft.engine.Tables.parquet(s, s"$root/shingles")
    val cands = broadcast(DedupOps.bandRows(s, sh)
      .select(col("doc_id").as("new_id"), col("band"), col("bh")))
      .join(bands.select(col("doc_id").as("old_id"), col("band"), col("bh")),
        Seq("band", "bh"))
      .filter(col("new_id") =!= col("old_id"))
      .select("new_id", "old_id").distinct()
    val withSh = cands
      .join(broadcast(sh.select(col("doc_id").as("new_id"), col("sh").as("sha"))),
        Seq("new_id"))
      .join(oldSh.select(col("doc_id").as("old_id"), col("sh").as("shb")), Seq("old_id"))
    val (inter, uni) = DedupOps.interUni(col("sha"), col("shb"))
    withSh.withColumn("inter", inter).withColumn("uni", uni)
      .filter(col("inter") * lit(1.0) / col("uni") >= minJ)
      .select(col("new_id"), col("old_id"),
        round(col("inter") * lit(1000000.0) / col("uni")).cast("long").as("jac_e6"))
  }

  /** Streaming twin of [[probeShingled]] (q86): the same band-probe +
    * exact-verify against the index, as a plan over a STREAMING
    * `(doc_id, text)` source. Every stage is stateless (codegen
    * shingle/signature projections, stream-STATIC joins against the
    * band and shingle stores — the index side is a batch scan, so no
    * watermark is needed) except the final pair dedup, which collapses
    * multi-band collisions of the same pair; its state is one key per
    * emitted edge — the verified-duplicate set, orders of magnitude
    * smaller than the stream. That state bound is an API-LEVEL
    * contract, not a comment: a CONTINUOUS deployment must pass
    * `watermark = Some(eventTimeCol -> delay)` — the stream gets
    * `withWatermark` and the pair dedup becomes
    * `dropDuplicatesWithinWatermark`, so emitted-edge state ages out
    * after `delay` (a pair re-colliding later re-verifies to the same
    * exact Jaccard, so late re-emission is idempotent for downstream
    * suppression). `watermark = None` keeps ALL emitted edges and is
    * only legal under a FINITE drain (AvailableNow, the q86 harness) —
    * exactly-once edge emission over a bounded run. The doc's shingle
    * array rides along the band rows (`carry`) because banding and
    * verification both derive from the same stream — joining them by id
    * would be a stream-stream join. */
  def probeStream(s: SparkSession, root: String, docsStream: DataFrame,
                  minJ: Double,
                  watermark: Option[(String, String)] = None): DataFrame = {
    val bands = graft.engine.Tables.parquet(s, s"$root/bands")
    val oldSh = graft.engine.Tables.parquet(s, s"$root/shingles")
    // Under a watermark the event-time column must ride the whole plan
    // (withWatermark → band rows → joins → the state-bounded dedup), so
    // it joins `sh` in the carry set and appears in the OUTPUT schema —
    // the continuous consumer needs it downstream anyway.
    val (src, carryCols) = watermark match {
      case Some((tsCol, delay)) =>
        graft.functions.Shingle3.register(s)
        (docsStream.withWatermark(tsCol, delay)
          .select(col("doc_id"), expr("shingle3(text)").as("sh"), col(tsCol))
          .filter(size(col("sh")) >= 1), Seq("sh", tsCol))
      case None => (DedupOps.shingled(docsStream), Seq("sh"))
    }
    val tsSel = watermark.map(w => col(w._1)).toSeq
    val neu = DedupOps.bandRows(s, src, carry = carryCols)
      .select(Seq(col("doc_id").as("new_id"), col("sh").as("sha"),
        col("band"), col("bh")) ++ tsSel: _*)
    val withSh = neu
      .join(bands.select(col("doc_id").as("old_id"), col("band"), col("bh")),
        Seq("band", "bh"))
      .filter(col("new_id") =!= col("old_id")) // never a dup of itself
      .join(oldSh.select(col("doc_id").as("old_id"), col("sh").as("shb")),
        Seq("old_id"))
    val (inter, uni) = DedupOps.interUni(col("sha"), col("shb"))
    val edges = withSh.withColumn("inter", inter).withColumn("uni", uni)
      .filter(col("inter") * lit(1.0) / col("uni") >= minJ)
      .select(Seq(col("new_id"), col("old_id"),
        round(col("inter") * lit(1000000.0) / col("uni")).cast("long").as("jac_e6"))
        ++ tsSel: _*)
    watermark match {
      case Some(_) => edges.dropDuplicatesWithinWatermark("new_id", "old_id")
      case None => edges.dropDuplicates("new_id", "old_id")
    }
  }

  /** Append-on-commit: add a committed batch's docs to the index at
    * `root`. Append-only — new parquet files land next to the existing
    * ones; nothing is rewritten, so concurrent probes stay snapshot-safe
    * (see CONCURRENCY above). Caller is the single writer. */
  def append(s: SparkSession, root: String, docsDf: DataFrame): Unit =
    write(s, root, docsDf, "append")

  /** Replay-IDEMPOTENT append for AT-LEAST-ONCE callers (the streaming
    * ingest twin, whose `foreachBatch` may re-run a batch after a
    * crash): the batch's index rows are first written to a hidden
    * staging dir, then moved into the live stores with a DETERMINISTIC
    * `b<token>-` file prefix, sweeping any files a crashed previous
    * attempt of the same token already moved ([[graft.ingest.Staging
    * .publish]] with `replaceExistingPrefix`) — so replaying a token
    * converges to exactly one copy of its rows, closing the
    * double-append window plain [[append]] has under replay. Also
    * CREATES the index on the very first batch (the stores spring into
    * existence with the first publish). Single-writer like every other
    * index mutation; in particular a [[compact]] must not interleave
    * with an in-flight token's replay window (compaction renames away
    * the `b<token>-` prefixes the sweep keys on). */
  def appendStaged(s: SparkSession, root: String, docsDf: DataFrame,
                   token: String): Unit = {
    val fs = fsOf(s, root)
    val stage = new Path(new Path(root), s".append-$token")
    fs.delete(stage, true)
    write(s, stage.toString, docsDf, "overwrite")
    graft.ingest.Staging.publish(fs, stage, new Path(root), s"b$token-",
      replaceExistingPrefix = true)
    fs.delete(stage, true): Unit
  }

  /** Compact the append-only index stores: after thousands of ingest
    * ticks each store is thousands of small parquet files, and probe
    * planning pays the listing. Content-preserving rewrite of each
    * store into `targetFiles` files; `winhashes` is additionally
    * re-distincted globally (appends are distinct per write only —
    * semantics under the semi-join consumers are unchanged, size
    * shrinks). Runs under the index's single-writer discipline (the
    * tick that would append instead compacts; concurrent probes from
    * other sessions follow the Ledger rule of not racing the writer).
    *
    * Crash-safe per store via [[graft.ingest.Staging.compactStore]]'s
    * two-rename swap (a crash between the renames self-heals on the
    * next call — asserted in DedupSpec with a simulated crash
    * window). */
  def compact(s: SparkSession, root: String, targetFiles: Int = 1): Unit = {
    val fs = fsOf(s, root)
    Seq("bands", "shingles", "winhashes").foreach { store =>
      graft.ingest.Staging.compactStore(fs, new Path(root), store) { staged =>
        val df0 = s.read.parquet(s"$root/$store")
        val df = if (store == "winhashes") df0.dropDuplicates("wh") else df0
        df.coalesce(targetFiles).write.parquet(staged.toString)
      }
    }
  }

  /** Build (or return) the q82 index root: corpus = doc_id < [[CorpusCap]]. */
  def ensure(s: SparkSession, sfDir: String): String = synchronized {
    built.getOrElseUpdate(sfDir, {
      val root = DemoCache.root(s"minhash/${new File(sfDir).getName}")
      DemoCache.cached(root, sfDir) {
        build(s, root.getPath,
          Tables.load(s, sfDir, "documents").filter(col("doc_id") < CorpusCap))
      }
      root.getPath
    })
  }

  /** Build (or return) the q83 appended-lifecycle root: the [[CorpusCap]]
    * corpus build followed by an [[append]] of batch A — exercising the
    * exact write path an ingest tick runs on commit, so the q83 probe
    * measures a post-append index, not a freshly built one. */
  def ensureAppended(s: SparkSession, sfDir: String): String = synchronized {
    built.getOrElseUpdate(s"$sfDir#app", {
      val root = DemoCache.root(s"minhash_app/${new File(sfDir).getName}")
      DemoCache.cached(root, sfDir) {
        val docs = Tables.load(s, sfDir, "documents")
        build(s, root.getPath, docs.filter(col("doc_id") < CorpusCap))
        append(s, root.getPath, docs.filter(
          col("doc_id") >= CorpusCap && col("doc_id") < BatchSplit))
      }
      root.getPath
    })
  }
}
