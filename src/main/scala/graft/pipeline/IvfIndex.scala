package graft.pipeline

import java.io.File
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable
import graft.engine.Tables

/** Durable IVF index for the embeddings corpus (q51): a k-means coarse
  * quantizer trained with Lloyd iterations as DataFrame passes, and the
  * corpus written cell-PARTITIONED to parquet. An IVF index is a
  * build-once/query-many artifact in every production vector system —
  * exactly like the bucketed join tables (q48) and the catalog (q41),
  * it is constructed by `ensure` (memoized per JVM, pre-built by Bench
  * outside the timing loop) and only the probe-side work happens at
  * query time. Because the corpus is partitioned by cell, a probe's
  * nprobe-cell lookup reads only those cell directories — the
  * ~nprobe/k scan fraction that makes IVF the second index layout at
  * 100 TB.
  *
  * Deterministic: init = vectors 0..k-1, fixed iteration count, argmax
  * tie-broken toward the lower cell id — centroids are a pure function
  * of the corpus, so q51's output is replayable and VectorSpec's recall
  * bound is stable.
  */
object IvfIndex {
  val K = 16
  private val Iterations = 3
  private val built = mutable.Map.empty[String, (Seq[Array[Float]], String)]

  /** `n` nearest cells of `embedding` (by L2, via the v·c − |c|²/2
    * argmax identity) against driver-resident centroid literals. */
  def cellsOf(cents: Seq[Array[Float]], n: Int): Column = {
    val scored = array(cents.zipWithIndex.map { case (c, j) =>
      val norm2 = c.map(x => x.toDouble * x.toDouble).sum
      struct((call_function("vec_dot", col("embedding"), typedLit(c.toSeq))
        - lit(norm2 / 2)).as("s"), lit(j).as("c"))
    }: _*)
    val best = array_sort(scored, (l, r) =>
      when(l.getField("s") > r.getField("s"), -1)
        .when(l.getField("s") < r.getField("s"), 1)
        .when(l.getField("c") < r.getField("c"), -1).otherwise(1))
    transform(slice(best, 1, n), x => x.getField("c"))
  }

  /** The Hadoop [[FileSystem]] bound to `root`'s scheme — like the
    * MinHash index, the IVF index lives beside the lake (any FS URI the
    * deployment's Hadoop conf binds), so centroid I/O and compaction
    * renames never touch `java.io.File`. */
  private def fsOf(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Trained centroids, stored INSIDE the cell store as
    * `cells/_centroids.txt` (parquet readers skip `_`-prefixed files):
    * quantizer and storage layout are one artifact, so [[retrain]]'s
    * two-rename swap replaces them ATOMICALLY — a crash can never leave
    * new centroids routing probes over an old cell layout (or vice
    * versa), which a root-level centroids file could. Float → exact
    * decimal string round-trips bit-for-bit, so reloaded centroids are
    * identical to the trained ones. */
  def loadCentroids(spark: SparkSession, root: String): Seq[Array[Float]] =
    readMeta(spark, root, "_centroids.txt").split("\n").toSeq
      .map(_.split(",").map(_.toFloat))

  /** Build-time mean squared assignment distance (`cells/_stats.txt`) —
    * the drift baseline [[driftRatio]] compares against. */
  def loadBaseline(spark: SparkSession, root: String): Double =
    readMeta(spark, root, "_stats.txt").trim.toDouble

  /** Incremental drift accumulator riding the store (`cells/_drift.txt`,
    * maintained by [[append]]/[[appendStaged]], reset by every
    * (re-)train): trained row count, Σ squared assignment distance of
    * all appended-since-train rows, their count, and the last staged
    * append's token (the replay guard). Lets a STREAMING maintenance
    * slot check drift per micro-batch at O(batch) instead of re-scanning
    * the whole store ([[driftRatioIncremental]]). */
  private val DriftMeta = "_drift.txt"

  private def readMeta(spark: SparkSession, root: String, name: String): String = {
    val in = fsOf(spark, root).open(new Path(s"$root/cells", name))
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  private def writeMeta(fs: FileSystem, cellsDir: Path, name: String,
                        content: String): Unit = {
    val out = fs.create(new Path(cellsDir, name), true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Deterministic k-means++ seeds over a bounded driver sample — the
    * RE-train init: the 2048 vectors with the smallest xxhash64(vec_id)
    * (one TakeOrdered scan, ~0.5 MB at 64 dims — bounded at any corpus
    * size) are collected, then K seeds are drawn by the classic
    * D²-weighted rule with a FIXED-seed PRNG (the sample order is
    * deterministic, so the whole init is). D² sampling allocates seeds
    * ∝ region mass × spread, so an appended region holding a real
    * share of the corpus is guaranteed seeds of its own — which the
    * lowest-id init cannot promise when appends drifted (measured: an
    * unseeded displaced cloud left Lloyd at a distorted local optimum,
    * two degenerate cells, −0.10 original-probe recall), and which
    * farthest-first over-corrects (it chases spatial extremes and
    * over-seeds whichever blob has the farthest outliers, −0.22). */
  private def kppInit(spark: SparkSession, e: DataFrame): Seq[Array[Float]] = {
    val sample = e.withColumn("h", xxhash64(col("vec_id")))
      .orderBy("h", "vec_id").limit(2048).collect()
      .map(_.getAs[Seq[Float]]("embedding").toArray)
    def d2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val rnd = new scala.util.Random(42)
    val seeds = scala.collection.mutable.ArrayBuffer(sample.head)
    val minD = sample.map(d2(_, sample.head))
    while (seeds.length < math.min(K, sample.length)) {
      val total = minD.sum
      var pick = rnd.nextDouble() * total
      var i = 0
      while (i < sample.length - 1 && pick > minD(i)) { pick -= minD(i); i += 1 }
      seeds += sample(i)
      var j = 0
      while (j < sample.length) { minD(j) = math.min(minD(j), d2(sample(j), sample(i))); j += 1 }
    }
    seeds.toSeq
  }

  /** Lloyd iterations over `e` (vec_id, embedding) from the given
    * seeds. Deterministic: fixed iteration count, argmax tie-broken
    * toward the lower cell id; a cell that loses every member drops
    * out (K shrinks), matching classic Lloyd. */
  private def train(spark: SparkSession, e: DataFrame,
                    init: Seq[Array[Float]]): Seq[Array[Float]] = {
    graft.functions.VectorExpressions.register(spark) // cellsOf needs vec_dot
    var cents: Seq[Array[Float]] = init
    for (_ <- 1 to Iterations) {
      cents = e.withColumn("cell", element_at(cellsOf(cents, 1), 1))
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("cell", "pos").agg(avg(col("x").cast("double")).as("m"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell"), expr("transform(pm, p -> cast(p.m as float))").as("c"))
        .orderBy("cell").collect()
        .map(_.getAs[Seq[Float]]("c").toArray).toIndexedSeq
    }
    cents
  }

  /** Mean squared L2 distance of `e`'s vectors to their ASSIGNED (=
    * nearest) centroid: |v − c|² = |v|² − 2·(v·c − |c|²/2), one scan,
    * no shuffle (global avg). The quantizer-quality scalar. */
  private def meanAssignDist(spark: SparkSession, e: DataFrame,
                             cents: Seq[Array[Float]]): Double = {
    val (s, n) = sumCountAssignDist(spark, e, cents)
    s / n
  }

  /** (Σ squared assignment distance, row count) over `e` — the same
    * scan as [[meanAssignDist]] kept un-divided so [[append]] can fold
    * a batch into the incremental drift accumulator. */
  private def sumCountAssignDist(spark: SparkSession, e: DataFrame,
                                 cents: Seq[Array[Float]]): (Double, Long) = {
    graft.functions.VectorExpressions.register(spark)
    val best = greatest(cents.map { c =>
      val norm2 = c.map(x => x.toDouble * x.toDouble).sum
      call_function("vec_dot", col("embedding"), typedLit(c.toSeq)) - lit(norm2 / 2)
    }: _*)
    val r = e.select(
      sum(expr("aggregate(embedding, 0D, (a, x) -> a + CAST(x AS DOUBLE) * x)")
        - lit(2.0) * best).as("s"),
      count(lit(1)).as("n")).first()
    if (r.isNullAt(0)) (0.0, 0L) else (r.getDouble(0), r.getLong(1))
  }

  /** Write assignment + metadata for `e` under `dir` (the shared tail
    * of [[build]] and [[retrain]]). `lastToken` seeds the accumulator's
    * replay-guard slot: a fresh [[build]] has no append history ("-"),
    * but [[retrain]] MUST carry the previous stamp forward — the
    * re-train that fires inside a streaming batch rewrites every cell
    * file (blinding the prefix sweep), so the token stamp is the only
    * thing standing between a crash-replay of that batch and a
    * double-append. */
  private def writeIndex(spark: SparkSession, fs: FileSystem, dir: String,
                         e: DataFrame, cents: Seq[Array[Float]],
                         lastToken: String = "-"): Unit = {
    e.withColumn("cell", element_at(cellsOf(cents, 1), 1))
      .select(col("vec_id").as("b_id"), col("cell"), col("embedding").as("eb"))
      .write.mode("overwrite").partitionBy("cell").parquet(dir)
    writeMeta(fs, new Path(dir), "_centroids.txt",
      cents.map(_.mkString(",")).mkString("\n"))
    val (s, n) = sumCountAssignDist(spark, e, cents)
    writeMeta(fs, new Path(dir), "_stats.txt", (s / n).toString)
    // incremental drift accumulator (see driftRatioIncremental):
    // "trained-row-count appended-sumD2 appended-count last-append-token"
    writeMeta(fs, new Path(dir), DriftMeta, s"$n 0.0 0 $lastToken")
  }

  /** Train the coarse quantizer on `e` (vec_id, embedding) and write the
    * index at `root`: cell-partitioned corpus under `cells/` with the
    * centroids and the drift baseline stored inside it. Returns the
    * trained centroids. */
  def build(spark: SparkSession, root: String, e: DataFrame): Seq[Array[Float]] = {
    graft.functions.VectorExpressions.register(spark)
    // build init: the K lowest-id vectors (a TakeOrdered — scales to
    // any corpus). A fresh build samples one distribution, so simple
    // seeds suffice; RE-trains use farthest-first (see retrain).
    val init = e.orderBy("vec_id").limit(K).collect()
      .map(_.getAs[Seq[Float]]("embedding").toArray).toSeq
    val cents = train(spark, e, init)
    writeIndex(spark, fsOf(spark, root), s"$root/cells", e, cents)
    cents
  }

  /** Compact the cell store: every [[append]] adds one file per touched
    * cell partition, so the lifecycle between re-trains accumulates
    * small files that probe planning pays for. Content-preserving
    * rewrite to ~one file per cell (`repartition` by the cell column —
    * each cell hashes to one task) behind [[graft.ingest.Staging
    * .compactStore]]'s crash-safe two-rename swap; centroids are
    * untouched, so probe routing is identical. Runs under the index's
    * single-writer discipline. */
  def compact(spark: SparkSession, root: String): Unit = {
    val fs = fsOf(spark, root)
    graft.ingest.Staging.compactStore(fs, new Path(root), "cells") { staged =>
      spark.read.parquet(s"$root/cells")
        .repartition(col("cell"))
        .write.partitionBy("cell").parquet(staged.toString)
      // the quantizer rides the store (see loadCentroids): carry the
      // metadata files into the staged rewrite
      writeMeta(fs, staged, "_centroids.txt", readMeta(spark, root, "_centroids.txt"))
      writeMeta(fs, staged, "_stats.txt", readMeta(spark, root, "_stats.txt"))
      if (fs.exists(new Path(s"$root/cells", DriftMeta)))
        writeMeta(fs, staged, DriftMeta, readMeta(spark, root, DriftMeta))
    }
  }

  /** Quantizer-drift measure: current mean squared assignment distance
    * over the WHOLE store (one scan of `cells/`, no shuffle) divided by
    * the build-time baseline stored beside it. ≈1.0 right after a
    * (re-)train; grows as appends drift from the trained distribution —
    * appended vectors land in cells whose centroid no longer summarizes
    * them, degrading probe recall with no visible failure. */
  def driftRatio(spark: SparkSession, root: String): Double = {
    val cents = loadCentroids(spark, root)
    val e = spark.read.parquet(s"$root/cells")
      .select(col("b_id").as("vec_id"), col("eb").as("embedding"))
    meanAssignDist(spark, e, cents) / loadBaseline(spark, root)
  }

  /** [[driftRatio]] from the `_drift.txt` accumulator — O(1), no store
    * scan: current store-wide mean assignment distance is the weighted
    * mean of the trained rows (baseline · n_train — assignments are a
    * pure function of the frozen centroids, so the build-time scan
    * stays exact) and the appended rows' accumulated Σd². Identical to
    * the full-scan value up to float addition order. None when the
    * store predates the accumulator (fall back to the scan). */
  def driftRatioIncremental(spark: SparkSession, root: String): Option[Double] = {
    val fs = fsOf(spark, root)
    if (!fs.exists(new Path(s"$root/cells", DriftMeta))) return None
    val parts = readMeta(spark, root, DriftMeta).trim.split("\\s+")
    val (nTrain, sumApp, nApp) = (parts(0).toLong, parts(1).toDouble, parts(2).toLong)
    val baseline = loadBaseline(spark, root)
    if (nTrain + nApp == 0) return Some(1.0)
    Some(((baseline * nTrain + sumApp) / (nTrain + nApp)) / baseline)
  }

  /** Fold one appended batch's (Σd², count) into the accumulator.
    * `token` guards at-least-once replays: a staged re-append of the
    * SAME token must not double-count (the crashed attempt may already
    * have accumulated). Ordering — publish, then accumulate-and-stamp —
    * makes every crash point converge: before the stamp the replay
    * re-accumulates over swept (replaced, not duplicated) files; after
    * it, the replay skips. A crash between a plain append and its
    * accumulate under-counts drift, which only DELAYS the re-train
    * trigger — the safe direction. */
  private def accumulateDrift(spark: SparkSession, fs: FileSystem, root: String,
                              batchSum: Double, batchN: Long,
                              token: String): Unit = {
    if (!fs.exists(new Path(s"$root/cells", DriftMeta))) return // legacy store
    val parts = readMeta(spark, root, DriftMeta).trim.split("\\s+")
    if (parts.length > 3 && parts(3) == token && token != "-") return // replay
    // A plain append (token "-") must PRESERVE a previously stored
    // staged-append stamp: if a streaming drain crashed after
    // appendStaged + retrain (the re-train renamed every cell file, so
    // the v<token>- prefix sweep is blind) and a batch append ran before
    // the drain restarted, overwriting the stamp would let the
    // re-delivered micro-batch re-append — the exact double-append the
    // stamp exists to prevent.
    val kept = if (token == "-" && parts.length > 3) parts(3) else token
    writeMeta(fs, new Path(s"$root/cells"), DriftMeta,
      s"${parts(0)} ${parts(1).toDouble + batchSum} ${parts(2).toLong + batchN} $kept")
  }

  /** Re-train the coarse quantizer over the CURRENT store contents and
    * swap the result in via the family's crash-safe two-rename
    * discipline ([[graft.ingest.Staging.compactStore]]): the staged dir
    * holds the re-assigned cell partitions AND the new centroids +
    * baseline (they live inside the store — [[loadCentroids]]), so a
    * crash anywhere leaves either the complete old index or the
    * complete new one, never new centroids over old cells. Row set is
    * preserved exactly; only assignment (and therefore probe routing)
    * changes. Single-writer, like every other index mutation. */
  def retrain(spark: SparkSession, root: String): Unit = {
    val fs = fsOf(spark, root)
    // carry the last append's replay token into the new baseline: the
    // rows of the append that TRIGGERED this re-train are inside the
    // retrained store, so a crash-replay of that batch must keep
    // short-circuiting on the stamp (the re-train renamed every cell
    // file, so the v<token>- prefix sweep can no longer catch it)
    val prevToken =
      if (fs.exists(new Path(s"$root/cells", DriftMeta))) {
        val parts = readMeta(spark, root, DriftMeta).trim.split("\\s+")
        if (parts.length > 3) parts(3) else "-"
      } else "-"
    val e = spark.read.parquet(s"$root/cells")
      .select(col("b_id").as("vec_id"), col("eb").as("embedding"))
      .persist()
    val cents = train(spark, e, kppInit(spark, e))
    graft.ingest.Staging.compactStore(fs, new Path(root), "cells") { staged =>
      writeIndex(spark, fs, staged.toString, e, cents, prevToken)
    }
    e.unpersist(): Unit
  }

  /** The drift TRIGGER (round-11 brief #5): re-train when
    * [[driftRatio]] exceeds `threshold`, else no-op. Returns whether a
    * re-train ran. A deployment calls this from the same maintenance
    * slot as [[compact]] — both are single-writer store rewrites; the
    * 1.25 default fires on genuine distribution shift (mirrored /
    * displaced appends measure ≥2×) but not on same-distribution
    * growth (≈1.0). */
  def retrainIfDrifted(spark: SparkSession, root: String,
                       threshold: Double = 1.25): Boolean = {
    // the O(1) accumulator when the store maintains it (equal to the
    // full scan up to float addition order); the scan for legacy stores
    val ratio = driftRatioIncremental(spark, root)
      .getOrElse(driftRatio(spark, root))
    val drifted = ratio > threshold
    if (drifted) retrain(spark, root)
    drifted
  }

  /** Insert new vectors into an EXISTING index at `root`: assign each to
    * its nearest TRAINED cell and append to that cell's partition — no
    * re-train, the centroids are immutable after [[build]]. This is the
    * production insert path every IVF deployment runs between periodic
    * re-trains: because probes rank the SAME frozen centroids that
    * route storage, an inserted vector is always found through the cell
    * it was filed under — recall degrades only as far as the data
    * DISTRIBUTION drifts from the trained quantizer (VectorSpec pins
    * recall ≥ 0.9 after a 10% append). Cell partitions only gain files
    * (append-only, like the MinHash index), so concurrent probes are
    * snapshot-safe; appends are single-writer by the same Ledger
    * discipline. */
  def append(spark: SparkSession, root: String, vecs: DataFrame): Unit = {
    graft.functions.VectorExpressions.register(spark) // cellsOf needs vec_dot
    val cents = loadCentroids(spark, root)
    val v = vecs.persist()
    v.withColumn("cell", element_at(cellsOf(cents, 1), 1))
      .select(col("vec_id").as("b_id"), col("cell"), col("embedding").as("eb"))
      .write.mode("append").partitionBy("cell")
      .parquet(s"$root/cells")
    val (s, n) = sumCountAssignDist(spark, v, cents)
    v.unpersist()
    accumulateDrift(spark, fsOf(spark, root), root, s, n, "-")
  }

  /** Replay-idempotent [[append]] for AT-LEAST-ONCE callers (the
    * streaming maintenance path, [[appendStream]]): the batch's cell
    * files stage first and publish with a deterministic `v<token>-`
    * prefix sweeping any files a crashed attempt of the same token
    * already moved ([[graft.ingest.Staging.publish]] with
    * `replaceExistingPrefix`), and the drift accumulator is stamped
    * with the token so a replay never double-counts. Single-writer like
    * every other index mutation. */
  def appendStaged(spark: SparkSession, root: String, vecs: DataFrame,
                   token: String): Unit = {
    graft.functions.VectorExpressions.register(spark)
    val fs = fsOf(spark, root)
    // Token-stamp short-circuit: the accumulator stamp is written
    // strictly AFTER the publish, so a matching stamp proves the whole
    // append (files + accounting) completed — the replay is a no-op.
    // This is stronger than the prefix sweep alone: once stamped, even
    // a compaction that renamed the token's prefixes away (making the
    // sweep blind) cannot lead to a double-append, which is what makes
    // compaction safe in the streaming maintenance slot below.
    // The "-" sentinel is reserved for plain appends and seeded stores —
    // it must never match the stamp (a seeded store's stamp IS "-"),
    // or a caller passing the sentinel would silently drop the append.
    require(token != "-", "appendStaged token must not be the '-' sentinel")
    if (fs.exists(new Path(s"$root/cells", DriftMeta))) {
      val parts = readMeta(spark, root, DriftMeta).trim.split("\\s+")
      if (parts.length > 3 && parts(3) == token) return
    }
    val cents = loadCentroids(spark, root)
    val stage = new Path(new Path(root), s".append-cells-$token")
    fs.delete(stage, true)
    val v = vecs.persist()
    v.withColumn("cell", element_at(cellsOf(cents, 1), 1))
      .select(col("vec_id").as("b_id"), col("cell"), col("embedding").as("eb"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"${stage.toString}/cells")
    graft.ingest.Staging.publish(fs, stage, new Path(root), s"v$token-",
      replaceExistingPrefix = true)
    fs.delete(stage, true)
    val (s, n) = sumCountAssignDist(spark, v, cents)
    v.unpersist()
    accumulateDrift(spark, fs, root, s, n, token)
  }

  /** The STREAMING maintenance path (round-12 brief #6): drain a
    * streaming `(vec_id, embedding)` source into the index —
    * [[appendStaged]] per micro-batch (replay-idempotent), then the
    * drift check in the SAME single-writer slot, so a continuously-fed
    * index re-trains itself when appended mass has drifted instead of
    * silently degrading recall between batch-side maintenance windows.
    * The per-batch check reads the O(1) accumulator
    * ([[driftRatioIncremental]]) — no per-tick store scan — and a fired
    * re-train resets it, so one drift episode triggers exactly one
    * re-train. Returns the number of re-trains the drain performed.
    * Blocks until the AvailableNow drain finishes. */
  def appendStream(spark: SparkSession, root: String, vecs: DataFrame,
                   checkpoint: String, driftThreshold: Double = 1.25,
                   compactThresholdFiles: Int = 256): Int = {
    val retrains = new java.util.concurrent.atomic.AtomicInteger(0)
    val fs = fsOf(spark, root)
    // Legacy stores (pre-accumulator) have nowhere to hold the replay
    // stamp, so their appends would rely on the prefix sweep alone —
    // which a mid-drain re-train blinds. Seed the accumulator once
    // before the drain: the store's current rows count as trained mass
    // (under-counting any pre-existing drift, which only DELAYS the
    // first trigger — the safe direction, see accumulateDrift).
    if (!fs.exists(new Path(s"$root/cells", DriftMeta))) {
      val n = spark.read.parquet(s"$root/cells").count()
      writeMeta(fs, new Path(s"$root/cells"), DriftMeta, s"$n 0.0 0 -")
    }
    val ckptTag = checkpointTag(spark, checkpoint)
    val q = vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val token = f"ivf$ckptTag-$batchId%05d"
        appendStaged(spark, root, batch, token)
        // maintenance in the same single-writer slot, AFTER the token
        // stamp (appendStaged wrote it with the accumulator) so a
        // replay of this batch short-circuits instead of relying on
        // the prefix sweep the compaction below would blind
        if (retrainIfDrifted(spark, root, driftThreshold))
          retrains.incrementAndGet(): Unit
        else {
          compactIfFragmented(spark, root, compactThresholdFiles)
          ()
        }
      }
      .start()
    q.awaitTermination()
    retrains.get
  }

  /** Checkpoint identity for a drain's replay tokens: stable across
    * RESTARTS (same checkpoint → same tag, so a re-delivered batchId
    * rebuilds the same token and the stamp short-circuits it) and
    * distinct across DRAINS (a fresh checkpoint also starts at batchId
    * 0; without the tag its first batch would look like a replay of
    * the previous drain's and be silently dropped). The path is fully
    * QUALIFIED first so equivalent spellings of the same location
    * ("/x" vs "file:///x" — Spark resolves both to one checkpoint and
    * re-delivers the same batch) hash identically; MurmurHash3 is
    * JVM-stable and avoids MessageDigest's FIPS-mode sensitivities.
    * Computed once per drain, not per micro-batch. */
  private[graft] def checkpointTag(spark: SparkSession,
                                   checkpoint: String): String = {
    val p = new Path(checkpoint)
    val qualified =
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .makeQualified(p).toString
    f"${scala.util.hashing.MurmurHash3.stringHash(qualified) & 0xFFFFFFFFL}%08x"
  }

  /** File-count compaction trigger for the cell store (the
    * [[graft.pipeline.DedupStage.maintain]] discipline applied to the
    * IVF index): every append lands one small file per touched cell
    * partition, so an unbounded stream of micro-batches makes probe
    * planning pay an unbounded listing. Compacts when the store's
    * visible data-file count exceeds `threshold`; returns whether it
    * fired. ONLY safe for callers whose appends are token-stamped
    * ([[appendStaged]]) or who cannot replay — compaction renames away
    * staged prefixes, and the stamp (not the sweep) is what keeps a
    * post-compaction replay idempotent; the guard below therefore
    * requires the accumulator meta to exist. */
  def compactIfFragmented(spark: SparkSession, root: String,
                          threshold: Int = 256): Boolean = {
    val fs = fsOf(spark, root)
    if (!fs.exists(new Path(s"$root/cells", DriftMeta))) return false
    val fragmented = graft.ingest.Staging.countDataFiles(
      fs, new Path(s"$root/cells")) > threshold
    if (fragmented) compact(spark, root)
    fragmented
  }

  /** Build (or return) the index for this corpus: (centroids,
    * cell-partitioned corpus path). The index is durable across JVMs
    * ([[DemoCache]]): the cell-partitioned corpus stays where it was
    * written and the trained centroids are stored beside it, so a warm
    * `var/demo/` dir skips the k-means passes entirely — the
    * build-once/query-many lifecycle a production IVF index has (plus
    * the [[append]] insert path between re-trains). */
  def ensure(spark: SparkSession, sfDir: String): (Seq[Array[Float]], String) =
    synchronized {
      built.getOrElseUpdate(sfDir, {
        val root = DemoCache.root(s"ivf/${new File(sfDir).getName}")
        DemoCache.cached(root, sfDir) {
          build(spark, root.getPath, Tables.load(spark, sfDir, "embeddings")): Unit
        }
        (loadCentroids(spark, root.getPath), new File(root, "cells").getPath)
      })
    }
}
