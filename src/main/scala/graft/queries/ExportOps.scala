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
  /** Size-adaptive writer-task count (round 22, guide §2/§6): the old
    * default — max(256, shuffle parallelism) regardless of input size —
    * wrote the bench-scale export as ~800 part files of 4-8 KB, and
    * every downstream audit scan (q108/q118's deep validation, the
    * loader preflight) paid ~25 parquet reader-inits per task. The
    * writer count now derives from the INPUT's estimated bytes at a
    * target of `spark.graft.export.writerTargetBytes` (default 256 MB
    * of estimated input per writer — post-compression files land well
    * inside the 128 MB-1 GB guidance), floored at 64 (4× the shard
    * count: the >16-writers scale contract ExportSpec pins, with
    * headroom) and CAPPED at the old default — a deployment whose
    * admin sized shuffle parallelism for the cluster never gets MORE
    * writers than before, small inputs just stop paying the
    * 256-tiny-files tax. An explicit `numPartitions` still wins. */
  private def writerTasks(s: SparkSession, df: DataFrame, numPartitions: Int): Int =
    if (numPartitions > 0) numPartitions
    else {
      val cap = math.max(256, s.conf.get("spark.sql.shuffle.partitions", "200").toInt)
      val target = s.conf.getOption("spark.graft.export.writerTargetBytes")
        .map(_.toLong).getOrElse(256L * 1024 * 1024)
      val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
      val bySize = (bytes / target).min(BigInt(cap)).toInt
      math.max(64, bySize)
    }

  def exportShards(s: SparkSession, df: DataFrame, outDir: String,
                   numPartitions: Int = 0): Unit = {
    val n = writerTasks(s, df, numPartitions)
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

  /** INCREMENTAL export — the weekly-drop path (sudo_code.txt:8-9):
    * append one tick's curated survivors to an EXISTING shard tree and
    * extend its manifest, at O(new data) cost — never the full-corpus
    * rewrite [[exportShards]] pays. At the 100 TB target the corpus
    * export is write-once; every subsequent drop flows through here.
    *
    *  - Ranks CONTINUE per shard from the manifest's recorded totals:
    *    the canonical incremental training order is GENERATION-major
    *    (the base export first, then each appended tick in append
    *    order), md5-minor within a generation — q118's oracle recomputes
    *    exactly this order from first principles and pins it
    *    doc-for-doc via the rank-weighted checksum, so "manifest
    *    extension ≡ full re-export under the canonical order" is a
    *    verified equivalence, not a convention.
    *  - The INCOMING manifest is validated first (structural tiling +
    *    disk-vs-manifest presence; `deep` adds the per-file recount) —
    *    a stale or tampered manifest FAILS the append before any write
    *    (ExportSpec's tamper case) instead of minting overlapping
    *    ranks.
    *  - New files are written to a hidden staging dir (one Spark job
    *    over the new docs only), moved into the shard dirs under an
    *    append-unique `a<token>-` prefix, and the manifest is rewritten
    *    LAST from the old entries plus the new files' independently
    *    recounted stats. A crash between move and manifest leaves
    *    unlisted files that fail the loader's presence check LOUDLY
    *    (never silent rows); recovery is deleting that token's files or
    *    finishing the append.
    *
    * Caller contract: `newDocs` is disjoint from every previously
    * exported tick (the ingest pipeline's exactly-once file discipline
    * upstream) — a re-passed doc would legitimately rank twice. */
  def exportShardsAppend(s: SparkSession, newDocs: DataFrame, outDir: String,
                         numPartitions: Int = 0, deep: Boolean = false): Unit = {
    val m = readManifest(s, outDir)
    validateExport(s, outDir, m, deep): Unit // stale/tampered manifest dies here
    if (newDocs.isEmpty) return
    val token = java.util.UUID.randomUUID().toString.take(8)
    // size-adaptive like the base export, over the NEW docs only — a
    // small weekly drop no longer sprays 256 tiny files per append
    val n = writerTasks(s, newDocs, numPartitions)
    import s.implicits._
    val offsets = m.shards.map(t => (t._1, t._2)).toDF("shard", "off")
    val staged = shardRanked(newDocs.select(col("doc_id"), col("source"), col("text")))
      .join(broadcast(offsets), Seq("shard"), "left")
      .withColumn("rnk", col("rnk") + coalesce(col("off"), lit(0L)))
      .select(col("shard"), col("rnk"), col("doc_id"), col("source"), col("text"))
      .repartitionByRange(n, col("shard"), col("rnk"))
      .sortWithinPartitions("shard", "rnk")
    val root = new org.apache.hadoop.fs.Path(outDir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(root, s".append-$token")
    fs.delete(tmp, true)
    staged.write.mode("overwrite").partitionBy("shard").parquet(tmp.toString)
    // independent recount of the NEW files only — one scan of the new
    // data, the same evidence grain the manifest carries
    val newStats = perFileStats(s, tmp.toString)
    // move the new files into the live shard dirs under the append token
    newStats.map(_.getString(0)).distinct.foreach(shard =>
      fs.mkdirs(new org.apache.hadoop.fs.Path(root, s"shard=$shard")): Unit)
    parallelRenames(fs, newStats.toSeq.map { r =>
      val (shard, file) = (r.getString(0), r.getString(1))
      (new org.apache.hadoop.fs.Path(tmp, s"shard=$shard/$file"),
        new org.apache.hadoop.fs.Path(root, s"shard=$shard/a$token-$file"))
    })
    fs.delete(tmp, true)
    // extend the manifest: old entries stay verbatim, each shard's new
    // entries follow in rank order, totals and checksums add
    val oldByShard = m.files.groupBy(_.shard)
    val oldTotals = m.shards.map(t => t._1 -> ((t._2, t._3))).toMap
    val newByShard = newStats.groupBy(_.getString(0))
    val shards = (oldTotals.keySet ++ newByShard.keySet).toSeq.sorted.map { shard =>
      val (oldN, oldSum) = oldTotals.getOrElse(shard, (0L, 0L))
      val fresh = newByShard.getOrElse(shard, Array.empty[org.apache.spark.sql.Row])
        .sortBy(_.getLong(3))
      var expect = oldN + 1
      fresh.foreach { r =>
        val (lo, hi, cnt, nd) = (r.getLong(3), r.getLong(4), r.getLong(2), r.getLong(5))
        require(lo == expect && hi - lo + 1 == cnt && nd == cnt,
          s"append layout broken: shard $shard file ${r.getString(1)} covers " +
            s"[$lo,$hi] with $cnt rows ($nd distinct ranks), expected a dense " +
            s"duplicate-free interval starting at $expect")
        expect = hi + 1
      }
      val files =
        oldByShard.getOrElse(shard, Seq.empty).sortBy(_.pos)
          .map(e => (e.file, e.n, e.lo, e.hi)) ++
        fresh.map(r => (s"a$token-${r.getString(1)}", r.getLong(2),
          r.getLong(3), r.getLong(4)))
      (shard, oldN + fresh.map(_.getLong(2)).sum,
        oldSum + fresh.map(_.getLong(6)).sum, files.toSeq)
    }
    putManifest(fs, root, shards)
  }

  /** Render + write `_manifest.json` from explicit per-shard data —
    * shared by [[writeManifest]] (full recount), [[exportShardsAppend]]
    * (old entries + new-file recount) and [[compactShards]] (old
    * entries with merged intervals substituted). The write goes through
    * a hidden temp + rename — the manifest is the export's COMMIT
    * POINTER (append and compaction both swap it as their last step),
    * so a reader must see the old complete bytes or the new complete
    * bytes, never a truncation. */
  private def putManifest(fs: org.apache.hadoop.fs.FileSystem,
                          root: org.apache.hadoop.fs.Path,
                          shards: Seq[(String, Long, Long, Seq[(String, Long, Long, Long)])])
      : Unit = {
    val shardsJson = shards.map { case (shard, n, orderSum, files) =>
      val fileJson = files.map { case (f, fn, lo, hi) =>
        s"""{"file":"$f","n":$fn,"lo":$lo,"hi":$hi}"""
      }.mkString("[", ",", "]")
      s"""{"shard":"$shard","n":$n,"order_sum":$orderSum,"files":$fileJson}"""
    }
    val json = s"""{"n_total":${shards.map(_._2).sum},""" +
      s""""n_shards":${shards.size},""" +
      s""""shards":${shardsJson.mkString("[", ",", "]")}}"""
    val tmp = new org.apache.hadoop.fs.Path(root,
      s"._manifest-${java.util.UUID.randomUUID().toString.take(8)}")
    fs.mkdirs(root)
    val out = fs.create(tmp, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val live = new org.apache.hadoop.fs.Path(root, "_manifest.json")
    // atomic replace (never delete-then-rename): the manifest is the
    // export's commit pointer, and a window where it is ABSENT makes
    // every concurrent readManifest fail spuriously on every append/
    // compaction commit
    graft.ingest.LakeSnapshot.replaceAtomic(fs, tmp, live)
  }

  /** Bounded-parallel file moves: object-store latency × hundreds of
    * part files makes a serial driver rename loop seconds per tick, and
    * renames on independent files don't order-depend. Rethrows the
    * first failure. */
  private def parallelRenames(fs: org.apache.hadoop.fs.FileSystem,
                              moves: Seq[(org.apache.hadoop.fs.Path, org.apache.hadoop.fs.Path)],
                              parallelism: Int = 16): Unit = {
    if (moves.isEmpty) return
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(parallelism, moves.size)))
    try {
      import scala.jdk.CollectionConverters._
      val tasks: Seq[java.util.concurrent.Callable[Unit]] = moves.map {
        case (from, to) => (() => {
          if (!fs.rename(from, to))
            throw new java.io.IOException(s"move failed: $from -> $to")
        }): java.util.concurrent.Callable[Unit]
      }
      pool.invokeAll(tasks.asJava).asScala.foreach(_.get()): Unit // rethrows
    } finally pool.shutdown()
  }

  /** Maintenance report of one [[compactShards]] run. Both file counts
    * are scoped to the COMPACTED shards only (files replaced vs files
    * they merged into), so before/after are directly comparable;
    * untouched shards appear in neither. */
  final case class ShardCompactionReport(shardsCompacted: Int,
                                         filesBefore: Int, filesAfter: Int)

  /** EXPORT-TREE compaction — the maintenance the weekly append path
    * ([[exportShardsAppend]]) makes necessary: every tick adds
    * `a<token>-` part files to each shard dir forever, and the
    * training-data artifact decays into a small-file swamp exactly like
    * the lake did before its compactor. Per SHARD whose manifest lists
    * more than `maxFilesPerShard` files: merge the shard's
    * rank-contiguous files into ceil(bytes/targetBytes) new files and
    * substitute the merged rank intervals into the manifest — the
    * rank-interval contract is exactly what makes a manifest-preserving
    * merge well-defined (rows are already globally rank-ordered, so a
    * range repartition over (shard, rnk) re-tiles each shard densely).
    *
    * Content is untouched: per compacted shard the merged files'
    * recounted totals AND rank-weighted checksum must equal the old
    * manifest's (required, not assumed) — so `readShards` returns
    * byte-identical rows and q104/q108/q118's audit checksums survive
    * verbatim. Untouched shards keep their manifest entries verbatim.
    *
    * Crash posture (the lake compactor's two-rename discipline, with
    * the manifest as the single commit pointer): merged files are
    * written to a hidden staging dir, moved in under a `c<token>-`
    * prefix (unlisted strays — a concurrent reader's presence check
    * fails LOUDLY, same documented posture as a mid-append crash), then
    * ONE atomic manifest swap commits, then the replaced files are
    * deleted. A crash before the swap leaves strays; after it, leftover
    * replaced files; [[recoverExport]] heals both states from the
    * manifest alone. Runs under the export's single-maintenance-writer
    * discipline (the same tick slot that appends). */
  def compactShards(s: SparkSession, outDir: String,
                    maxFilesPerShard: Int = 8,
                    targetBytesPerFile: Long = 128L * 1024 * 1024,
                    deep: Boolean = false): ShardCompactionReport = {
    val m = readManifest(s, outDir)
    validateExport(s, outDir, m, deep): Unit
    val byShard = m.files.groupBy(_.shard)
    val big = m.shards.filter { case (shard, _, _) =>
      byShard.getOrElse(shard, Seq.empty).size > maxFilesPerShard
    }.map(_._1)
    if (big.isEmpty) return ShardCompactionReport(0, 0, 0)
    val root = new org.apache.hadoop.fs.Path(outDir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    val token = java.util.UUID.randomUUID().toString.take(8)
    // the MANIFEST-listed files are the shard's content — a rewrite over
    // the whole directory would merge in strays from an earlier crash
    // (unlisted pre-commit append files, a crashed compaction's own
    // leftovers) and poison the merge; reading exactly the listed paths
    // makes a dirty tree unable to change the rewrite's input
    val listedPaths: Map[String, Seq[org.apache.hadoop.fs.Path]] = big.map { sh =>
      sh -> byShard.getOrElse(sh, Seq.empty).map(e =>
        new org.apache.hadoop.fs.Path(root, s"shard=$sh/${e.file}"))
    }.toMap
    val bytesOf: Map[String, Long] = big.map { sh =>
      sh -> listedPaths(sh).map(fs.getFileStatus(_).getLen).sum
    }.toMap
    val tmp = new org.apache.hadoop.fs.Path(root, s".compact-$token")
    fs.delete(tmp, true)
    // one rewrite JOB per oversized shard (a bounded driver pool drives
    // them concurrently — Spark schedules jobs from multiple threads
    // natively, the Compactor's own pattern): per-shard range
    // partitioning aligns every output-file boundary to the shard by
    // construction, so a shard comes out with EXACTLY
    // ceil(bytes/target) files and one pass converges (a single
    // all-shards range partition would sample (shard, rnk) boundaries
    // and could split a shard across extra files, re-tripping the
    // threshold forever)
    locally {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.max(1, math.min(4, big.size)))
      try {
        import scala.jdk.CollectionConverters._
        val tasks: Seq[java.util.concurrent.Callable[Unit]] = big.map { sh =>
          (() => {
            val k = math.max(1L,
              math.ceil(bytesOf(sh).toDouble / targetBytesPerFile).toLong).toInt
            s.read.parquet(listedPaths(sh).map(_.toString): _*)
              .repartitionByRange(k, col("rnk"))
              .sortWithinPartitions("rnk")
              .write.mode("overwrite").parquet(s"$tmp/shard=$sh")
          }): java.util.concurrent.Callable[Unit]
        }
        pool.invokeAll(tasks.asJava).asScala.foreach(_.get()): Unit // rethrows
      } finally pool.shutdown()
    }
    val merged = perFileStats(s, tmp.toString)
    parallelRenames(fs, merged.toSeq.map { r =>
      val (shard, file) = (r.getString(0), r.getString(1))
      (new org.apache.hadoop.fs.Path(tmp, s"shard=$shard/$file"),
        new org.apache.hadoop.fs.Path(root, s"shard=$shard/c$token-$file"))
    })
    // substitute the merged intervals; require exact content identity
    // (totals + checksum) before committing anything
    val mergedByShard = merged.groupBy(_.getString(0))
    val oldTotals = m.shards.map(t => t._1 -> ((t._2, t._3))).toMap
    val replaced = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val shards = m.shards.map { case (shard, n, orderSum) =>
      if (!big.contains(shard))
        (shard, n, orderSum, byShard.getOrElse(shard, Seq.empty).sortBy(_.pos)
          .map(e => (e.file, e.n, e.lo, e.hi)))
      else {
        val rows = mergedByShard.getOrElse(shard, Array.empty[org.apache.spark.sql.Row])
          .sortBy(_.getLong(3))
        var expect = 1L
        rows.foreach { r =>
          val (lo, hi, cnt, nd) = (r.getLong(3), r.getLong(4), r.getLong(2), r.getLong(5))
          require(lo == expect && hi - lo + 1 == cnt && nd == cnt,
            s"shard compaction broke the rank tiling: shard $shard file " +
              s"c$token-${r.getString(1)} covers [$lo,$hi] with $cnt rows")
          expect = hi + 1
        }
        val (oldN, oldSum) = oldTotals(shard)
        require(rows.map(_.getLong(2)).sum == oldN &&
          rows.map(_.getLong(6)).sum == oldSum,
          s"shard compaction changed shard $shard content: " +
            s"rows ${rows.map(_.getLong(2)).sum}/$oldN " +
            s"checksum ${rows.map(_.getLong(6)).sum}/$oldSum")
        byShard.getOrElse(shard, Seq.empty).foreach(e => replaced += shard -> e.file)
        (shard, n, orderSum,
          rows.map(r => (s"c$token-${r.getString(1)}", r.getLong(2),
            r.getLong(3), r.getLong(4))).toSeq)
      }
    }
    putManifest(fs, root, shards) // THE commit
    replaced.foreach { case (shard, f) =>
      fs.delete(new org.apache.hadoop.fs.Path(root, s"shard=$shard/$f"), false): Unit
    }
    fs.delete(tmp, true)
    ShardCompactionReport(big.size, replaced.size, merged.length)
  }

  /** Heal an export tree after a crashed [[exportShardsAppend]] or
    * [[compactShards]], from the manifest alone. The manifest is the
    * commit pointer, so the live file set is exactly what it lists:
    * when every LISTED file is present, any unlisted data file is a
    * pre-commit stray (crashed append) or a post-commit leftover
    * (crashed compaction's replaced files) and is deleted; when a
    * listed file is MISSING the tree lost committed data — that is not
    * healable here and fails loudly. Returns files deleted; the healed
    * tree re-validates. */
  def recoverExport(s: SparkSession, outDir: String): Int = {
    val m = readManifest(s, outDir)
    val root = new org.apache.hadoop.fs.Path(outDir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    val listed = m.files.groupBy(_.shard).view.mapValues(_.map(_.file).toSet).toMap
    var deleted = 0
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("shard="))
      .foreach { st =>
        val shard = st.getPath.getName.stripPrefix("shard=")
        val want = listed.getOrElse(shard, Set.empty)
        val have = fs.listStatus(st.getPath).toSeq.map(_.getPath.getName)
          .filterNot(n => n.startsWith("_") || n.startsWith(".")).toSet
        val missing = want -- have
        require(missing.isEmpty,
          s"export $outDir shard $shard lost committed files: " +
            s"${missing.toSeq.sorted.mkString(",")} — not recoverable by stray deletion")
        (have -- want).foreach { stray =>
          if (fs.delete(new org.apache.hadoop.fs.Path(st.getPath, stray), false))
            deleted += 1
        }
      }
    // a crashed compaction can also leave its hidden staging dir
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && (st.getPath.getName.startsWith(".compact-") ||
        st.getPath.getName.startsWith(".append-")))
      .foreach(st => fs.delete(st.getPath, true): Unit)
    deleted
  }

  /** Loader-side validation manifest for an exported shard tree:
    * `outDir/_manifest.json` lists, per shard, the part files IN RANK
    * ORDER with each file's row count and `[lo, hi]` rank interval,
    * plus the shard totals and the q104 rank-weighted checksum. The
    * manifest's file order is the loader contract (below 100k write
    * tasks it coincides with lexicographic part-file name order, but
    * the manifest stays correct when Spark's part numbering outgrows
    * its zero padding); [[readShards]] is the executable loader half —
    * it asserts "every file present, nothing truncated, ranks tile
    * 1..n, checksum matches" before an epoch instead of discovering a
    * hole mid-run, and the checksum cross-checks against the q104 audit
    * row doc-for-doc.
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
    val root = new org.apache.hadoop.fs.Path(outDir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    // an empty selection writes an empty (but valid) export tree: no
    // part files means nothing to scan — emit the empty manifest
    // instead of letting schema inference throw
    val anyData = fs.exists(root) &&
      graft.ingest.Staging.countDataFiles(fs, root) > 0
    if (!anyData) { putManifest(fs, root, Seq.empty); return }
    val perFile = perFileStats(s, outDir)
    val shards = perFile.groupBy(_.getString(0)).toSeq.sortBy(_._1)
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
        (shard, files.map(_.getLong(2)).sum, files.map(_.getLong(6)).sum,
          files.map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq)
      }
    putManifest(fs, root, shards)
  }

  /** ONE distributed scan of an export tree grouped by physical part
    * file — the shared recount behind [[writeManifest]] (produces the
    * manifest) and [[readShards]]' deep validation (re-derives the same
    * rows independently and compares). One row per part file reaches
    * the driver, bounded by the writer task count at any corpus size. */
  private def perFileStats(s: SparkSession, outDir: String) =
    graft.engine.Tables.parquet(s, outDir)
      .groupBy(col("shard").cast("string").as("shard"),
        regexp_extract(input_file_name(), "[^/]+$", 0).as("file"))
      .agg(count(lit(1)).as("n"), min("rnk").as("lo"), max("rnk").as("hi"),
        countDistinct("rnk").as("nd"),
        sum(chkTerm(col("rnk"), col("doc_id"))).as("chk"))
      .collect()

  /** One manifest file entry: where the loader expects `n` rows
    * covering ranks `[lo, hi]` of `shard`. `pos` is the entry's LISTED
    * position — the manifest's file order IS the loader contract, so
    * validation walks entries in listed order (a swapped pair must fail
    * loudly, not be silently repaired by re-sorting). */
  final case class ManifestEntry(shard: String, pos: Int, file: String,
                                 n: Long, lo: Long, hi: Long)

  /** Parsed `_manifest.json`: total rows, per-shard (n, order_sum), and
    * every file entry in listed order. Driver-side and bounded — the
    * manifest has one entry per writer task, never per row. */
  final case class Manifest(nTotal: Long, shards: Seq[(String, Long, Long)],
                            files: Seq[ManifestEntry])

  /** Parse `outDir/_manifest.json`. Fails loudly when absent — an
    * export without its manifest is an incomplete export. */
  def readManifest(s: SparkSession, outDir: String): Manifest = {
    val p = new org.apache.hadoop.fs.Path(outDir, "_manifest.json")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no _manifest.json under $outDir — not a completed export")
    val in = fs.open(p)
    val json = try {
      val bos = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 65536, false)
      bos.toString(java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
    import scala.jdk.CollectionConverters._
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val shardNodes = root.get("shards").elements().asScala.toSeq
    val shards = shardNodes.map(sh =>
      (sh.get("shard").asText(), sh.get("n").asLong(), sh.get("order_sum").asLong()))
    val files = shardNodes.flatMap { sh =>
      sh.get("files").elements().asScala.toSeq.zipWithIndex.map { case (f, i) =>
        ManifestEntry(sh.get("shard").asText(), i, f.get("file").asText(),
          f.get("n").asLong(), f.get("lo").asLong(), f.get("hi").asLong())
      }
    }
    Manifest(root.get("n_total").asLong(), shards, files)
  }

  /** The loader contract, executable (the read-side twin of
    * [[exportShards]]/[[writeManifest]]): validate an export tree
    * against its `_manifest.json` and return the shard frame. EVERY
    * check runs before any row is served:
    *
    *  1. structural — per shard, the listed entries tile ranks `1..n`
    *     densely in LISTED order (gap, overlap, or a swapped pair of
    *     manifest entries fails here, in the listed-order walk — never
    *     silently repaired by re-sorting on `lo`), and per-shard /
    *     grand totals are internally consistent;
    *  2. presence — the disk's part-file set per shard EQUALS the
    *     manifest's (a deleted file AND an unlisted stray both fail);
    *  3. deep (default on) — ONE distributed scan grouped by physical
    *     file ([[perFileStats]], the writer's own recount re-derived
    *     independently) must reproduce every entry's row count and rank
    *     interval (a truncated or substituted file fails here) and every
    *     shard's rank-weighted checksum (any doc_id↔rank reassignment
    *     fails, cross-checkable against the q104 audit row). Deep costs
    *     one export scan — run it once per epoch or after transport;
    *     `deep = false` keeps checks 1-2 for cheap per-run preflight.
    *
    * The returned frame carries `(shard, rnk, doc_id, source, text)` —
    * training order lives in the `rnk` VALUE (the q78/q104 convention),
    * so no global sort is forced on a 100 TB read just to certify
    * order; a sequential consumer that wants physical streaming order
    * takes [[orderedFiles]] and reads file-by-file (each file is
    * internally rank-sorted by the sink and validation proved the files
    * tile, so concatenation in manifest order IS the training order). */
  def readShards(s: SparkSession, outDir: String, deep: Boolean = true): DataFrame = {
    val m = readManifest(s, outDir)
    validateExport(s, outDir, m, deep): Unit
    if (m.nTotal == 0) {
      // presence above proved the tree holds no part files, so there is
      // nothing to scan — hand back an empty frame with the contract
      // schema rather than asking parquet to infer one from zero files
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("shard", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("rnk", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
      return s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
    graft.engine.Tables.parquet(s, outDir)
      .select(col("shard").cast("string").as("shard"), col("rnk"),
        col("doc_id"), col("source"), col("text"))
  }

  /** Checks 1-3 of the loader contract over an already-parsed manifest
    * (shared by [[readShards]] and [[orderedFiles]] so the manifest is
    * opened and parsed once per preflight). Returns the deep recount's
    * per-(shard, file) stats — (n, lo, hi, nDistinct, checksum) —
    * when `deep` ran, so audit consumers ([[loaderAudit]]) can fold
    * their answer from the SAME scan instead of re-reading the tree;
    * empty when `deep` was off or the export is empty. */
  private def validateExport(s: SparkSession, outDir: String, m: Manifest,
                             deep: Boolean)
      : Map[(String, String), (Long, Long, Long, Long, Long)] = {
    // 1. structural: walk the SHARD list (not groups derived from the
    //    file entries) so a shard whose files array was dropped from
    //    the manifest still fails its tiling check instead of being
    //    silently skipped; then listed-order dense tiling per shard
    val byShard = m.files.groupBy(_.shard)
    val unknown = byShard.keySet -- m.shards.map(_._1).toSet
    require(unknown.isEmpty,
      s"manifest of $outDir lists files for shards absent from its shard " +
        s"list: ${unknown.toSeq.sorted.mkString(",")}")
    m.shards.foreach { case (shard, shardN, _) =>
      var expect = 1L
      byShard.getOrElse(shard, Seq.empty).sortBy(_.pos).foreach { e =>
        require(e.lo == expect && e.hi - e.lo + 1 == e.n,
          s"manifest of $outDir is not a dense rank tiling: shard $shard " +
            s"entry #${e.pos} (${e.file}) claims [${e.lo},${e.hi}] n=${e.n}, " +
            s"expected an interval starting at $expect — entries out of order or overlapping")
        expect = e.hi + 1
      }
      require(expect - 1 == shardN,
        s"manifest shard $shard total $shardN != tiled file rows ${expect - 1}")
    }
    require(m.shards.map(_._2).sum == m.nTotal,
      s"manifest n_total ${m.nTotal} != per-shard sum ${m.shards.map(_._2).sum}")
    // 2. presence: disk part-file set per shard == manifest's set. Runs
    //    for the EMPTY manifest too — a stale {"n_total":0} manifest
    //    sitting over real shard dirs (a crashed re-export) must fail
    //    here, not validate clean and serve zero rows
    val root = new org.apache.hadoop.fs.Path(outDir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    val onDisk: Map[String, Set[String]] = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("shard="))
      .map { st =>
        val shard = st.getPath.getName.stripPrefix("shard=")
        val parts = fs.listStatus(st.getPath).toSeq.map(_.getPath.getName)
          .filterNot(n => n.startsWith("_") || n.startsWith(".")).toSet
        shard -> parts
      }.toMap
    val listed = byShard.view.mapValues(_.map(_.file).toSet).toMap
    (m.shards.map(_._1) ++ listed.keySet ++ onDisk.keySet).distinct.sorted.foreach { shard =>
      val want = listed.getOrElse(shard, Set.empty)
      val have = onDisk.getOrElse(shard, Set.empty)
      require(want == have,
        s"export $outDir shard $shard does not match its manifest: " +
          s"missing on disk = ${(want -- have).toSeq.sorted.mkString(",")} " +
          s"unlisted on disk = ${(have -- want).toSeq.sorted.mkString(",")}")
    }
    // 3. deep: independent recount must reproduce every entry + checksum
    //    (vacuous for an empty export — presence proved no part files)
    if (deep && m.nTotal > 0) {
      val actual = perFileStats(s, outDir)
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
      m.files.foreach { e =>
        val (n, lo, hi, nd, _) = actual.getOrElse((e.shard, e.file),
          sys.error(s"listed file ${e.shard}/${e.file} yielded no rows on rescan"))
        require(n == e.n && lo == e.lo && hi == e.hi && nd == n,
          s"export file ${e.shard}/${e.file} does not match its manifest entry: " +
            s"disk has $n rows ($nd distinct ranks) over [$lo,$hi], " +
            s"manifest claims ${e.n} over [${e.lo},${e.hi}] — truncated or substituted")
      }
      val chkByShard = actual.toSeq.groupBy(_._1._1)
        .view.mapValues(_.map(_._2._5).sum).toMap
      m.shards.foreach { case (shard, _, orderSum) =>
        val got = chkByShard.getOrElse(shard, 0L)
        require(got == orderSum,
          s"export shard $shard checksum $got != manifest order_sum $orderSum — " +
            "doc/rank content changed under an intact file layout")
      }
      actual
    } else Map.empty
  }

  /** Validated per-shard loader audit — the q108/q118 shape: per shard,
    * `n_docs` and `max_rnk` folded from deep validation's OWN
    * distributed recount of the physical part files, `order_sum` from
    * the validated manifest, rows ordered by shard. Round 21: the
    * previous composition re-scanned the export tree for a groupBy that
    * deep validation had byte-for-byte already proven (every per-file
    * n/lo/hi equals its manifest entry, or validation throws before any
    * row is served) — one export scan now serves both, identical rows
    * by construction, and at lake scale the audit's I/O halves. */
  def loaderAudit(s: SparkSession, outDir: String): DataFrame = {
    val m = readManifest(s, outDir)
    val stats = validateExport(s, outDir, m, deep = true)
    import s.implicits._
    val orderSums = m.shards.map(sh => sh._1 -> sh._3).toMap
    stats.toSeq.groupBy(_._1._1).toSeq
      .map { case (shard, es) =>
        (shard, es.map(_._2._1).sum, es.map(_._2._3).max, orderSums(shard))
      }
      .sortBy(_._1)
      .toDF("shard", "n_docs", "max_rnk", "order_sum")
  }

  /** Per-shard ABSOLUTE part-file paths in training order, validated
    * (presence + structural always; `deep` as in [[readShards]]) — the
    * entry point for a sequential training loader that streams files
    * instead of running a Spark job: each file is internally
    * rank-sorted by the sink, and validation proved the files tile
    * `1..n` densely in this order, so concatenating them IS the
    * training order with no sort at any scale. */
  def orderedFiles(s: SparkSession, outDir: String,
                   deep: Boolean = false): Seq[(String, Seq[String])] = {
    val m = readManifest(s, outDir)
    validateExport(s, outDir, m, deep): Unit
    m.files.groupBy(_.shard).toSeq.sortBy(_._1).map { case (shard, entries) =>
      shard -> entries.sortBy(_.pos).map(e => s"$outDir/shard=$shard/${e.file}")
    }
  }

  private val builtExports = scala.collection.mutable.Map.empty[String, String]

  /** Build (once per JVM per sf; durable across JVMs under
    * [[graft.pipeline.DemoCache]], like the MinHash/IVF stores) the
    * q108 export tree: the documents corpus through the [[exportShards]]
    * sink into `var/demo/export/<sf>/shards`. Bench pre-builds it
    * outside the timing loop, so q108 times the LOADER
    * ([[readShards]]), not the one-time sink run. */
  def ensureExport(s: SparkSession, d: String): String = synchronized {
    builtExports.getOrElseUpdate(d, {
      val root = graft.pipeline.DemoCache.root(
        s"export/${new java.io.File(d).getName}")
      val dir = new java.io.File(root, "shards").getPath
      graft.pipeline.DemoCache.cached(root, d) {
        exportShards(s, docs(s, d).select(col("doc_id"), col("source"), col("text")), dir)
      }
      dir
    })
  }

  private val builtAppendExports = scala.collection.mutable.Map.empty[String, String]

  /** The q118 incremental-export tree (built once per JVM per sf;
    * durable under [[graft.pipeline.DemoCache]]): a BASE export of the
    * documents whose `doc_id % 3 != 0` (the historical corpus), then an
    * [[exportShardsAppend]] of the `doc_id % 3 == 0` remainder (the
    * weekly drop). The split is a pure function of the table, so the
    * oracle can re-derive each doc's generation — and with it the
    * canonical incremental order — from first principles. */
  def ensureAppendExport(s: SparkSession, d: String): String = synchronized {
    builtAppendExports.getOrElseUpdate(d, {
      val root = graft.pipeline.DemoCache.root(
        s"exportappend/${new java.io.File(d).getName}")
      val dir = new java.io.File(root, "shards").getPath
      graft.pipeline.DemoCache.cached(root, d) {
        val all = docs(s, d).select(col("doc_id"), col("source"), col("text"))
        exportShards(s, all.filter(pmod(col("doc_id"), lit(3)) =!= 0), dir)
        exportShardsAppend(s, all.filter(pmod(col("doc_id"), lit(3)) === 0), dir)
      }
      dir
    })
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

    // The export LOADER on the oracle surface (round-14: the read-side
    // twin of q104): a real exported shard tree (built once, DemoCache'd)
    // is read back through readShards with FULL validation — structural
    // tiling, disk-vs-manifest presence, the deep per-file recount and
    // checksum — and the returned frame is re-aggregated per shard:
    // n_docs and max_rnk from the FRAME (the parquet the sink physically
    // wrote), order_sum from the MANIFEST. The oracle recomputes all
    // three from the raw documents table — so the row only matches if
    // sink, manifest, and loader all agree with the logical shard/rank
    // spec doc-for-doc. max_rnk == n_docs is the dense-rank invariant,
    // cross-checked by both engines from different evidence.
    // round 21: n_docs/max_rnk fold from deep validation's own
    // distributed recount of the physical files ([[loaderAudit]]) —
    // the prior shape re-scanned the tree for an aggregate validation
    // had already proven equal, doubling the audit's I/O
    "q108_export_roundtrip" -> ((s, d) => loaderAudit(s, ensureExport(s, d))),

    // INCREMENTAL export on the oracle surface (round-16: the
    // weekly-drop path): a base export extended by exportShardsAppend,
    // read back through readShards with FULL validation (tiling,
    // presence, deep recount, checksums) and re-aggregated per shard —
    // n_docs/max_rnk from the appended parquet, order_sum from the
    // EXTENDED manifest. The oracle recomputes all three from the raw
    // documents table under the canonical incremental order
    // (generation-major, md5-minor), so the row matches only if
    // manifest extension ≡ a full re-export under that order,
    // doc-for-doc (the rank-weighted checksum pins every doc→rank
    // assignment). max_rnk == n_docs is the dense-rank invariant ACROSS
    // the append boundary — an off-by-one in the offset join breaks it.
    // round 21: single-scan loader audit, like q108 — the appended
    // tree's recount + EXTENDED-manifest checks are unchanged
    "q118_export_append" -> ((s, d) => loaderAudit(s, ensureAppendExport(s, d))),

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
    // q108: the same base/rank CTEs as q104 — the oracle knows nothing
    // of the export tree; Spark's row comes from the written parquet +
    // manifest, DuckDB's from first principles on documents
    "q108_export_roundtrip" ->
      s"""WITH base AS (
            SELECT doc_id,
              substr(md5('$ShardSalt' || CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
              md5('$OrderSalt' || CAST(doc_id AS VARCHAR)) AS rk
            FROM documents),
          r AS (
            SELECT *, CAST(ROW_NUMBER() OVER (
              PARTITION BY shard ORDER BY rk, doc_id) AS BIGINT) AS rnk
            FROM base)
          SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(MAX(rnk) AS BIGINT) AS max_rnk,
                 CAST(SUM(((rnk % $ChkMod) * (doc_id % $ChkMod)) % $ChkMod) AS BIGINT) AS order_sum
          FROM r GROUP BY 1 ORDER BY 1""",
    // q118: the oracle knows nothing of the append machinery — it ranks
    // every doc from first principles under the canonical incremental
    // order (generation = the doc_id%3 split, md5 within a generation)
    "q118_export_append" ->
      s"""WITH base AS (
            SELECT doc_id,
              substr(md5('$ShardSalt' || CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
              md5('$OrderSalt' || CAST(doc_id AS VARCHAR)) AS rk,
              CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS gen
            FROM documents),
          r AS (
            SELECT *, CAST(ROW_NUMBER() OVER (
              PARTITION BY shard ORDER BY gen, rk, doc_id) AS BIGINT) AS rnk
            FROM base)
          SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(MAX(rnk) AS BIGINT) AS max_rnk,
                 CAST(SUM(((rnk % $ChkMod) * (doc_id % $ChkMod)) % $ChkMod) AS BIGINT) AS order_sum
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
