package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Instrumented runners for the dedup/ANN kernels, measuring the numbers
  * the 100 TB claims rest on: INPUT rows, CANDIDATE pairs (the frame
  * between bucketing and verification — the thing that must not go
  * quadratic), OUTPUT pairs, and end-to-end seconds. Driven by
  * [[graft.tools.ScaleStress]] across corpus tiers (sf0.01 → sf0.1 →
  * a 10× blow-up of sf0.1); the harness asserts candidate growth stays
  * ~linear in corpus size.
  *
  * Methodology: the candidate count is measured in its own pass, then
  * the cache is cleared and the FULL kernel (candidates + verification)
  * is timed end-to-end from cold cache, so `secs` is the real operator
  * cost at that tier and is never flattered by the counting pass.
  */
object ScaleProbe {
  final case class Stat(kernel: String, tier: String, nInput: Long,
                        nCandidates: Long, nOutput: Long, secs: Double) {
    def json: String =
      s"""{"kernel":"$kernel","tier":"$tier","n_input":$nInput,""" +
        s""""n_candidates":$nCandidates,"n_output":$nOutput,"secs":${math.round(secs * 1000) / 1000.0}}"""
  }

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** MinHash-LSH near-dup edges (the q32/q74 kernel) at >= 0.8 Jaccard. */
  def minhash(s: SparkSession, dir: String, tier: String): Stat = {
    val docs = Tables.load(s, dir, "documents")
    val nIn = docs.count()
    s.catalog.clearCache()
    val base0 = DedupOps.shingled(docs).persist()
    val nc = DedupOps.minhashCandidates(s, base0).count()
    s.catalog.clearCache()
    val base = DedupOps.shingled(docs).persist()
    val (ne, secs) = timed(DedupOps.minhashEdges(s, base, minJ = 0.8).count())
    s.catalog.clearCache()
    Stat("minhash_lsh", tier, nIn, nc, ne, secs)
  }

  /** SimHash near-dup pairs (the q34 kernel), hamming <= 3. */
  def simhash(s: SparkSession, dir: String, tier: String): Stat = {
    val docs = Tables.load(s, dir, "documents")
    val nIn = docs.count()
    s.catalog.clearCache()
    val nc = DedupOps.simhashCandidates(DedupOps.simhashed(docs)).count()
    s.catalog.clearCache()
    val (np, secs) = timed(DedupOps.simhashPairs(s, dir).count())
    s.catalog.clearCache()
    Stat("simhash", tier, nIn, nc, np, secs)
  }

  /** Embedding-cosine near-dup pairs (the q49 kernel), cos >= 0.45. */
  def embed(s: SparkSession, dir: String, tier: String): Stat = {
    val e = Tables.load(s, dir, "embeddings")
    val nIn = e.count()
    s.catalog.clearCache()
    val nc = VectorOps.lshSelfCollisions(e, nIn)
      .select(least(col("a_id"), col("b_id")).as("a"),
        greatest(col("a_id"), col("b_id")).as("b"))
      .distinct().count()
    s.catalog.clearCache()
    // the verify tables are build-once artifacts — construct outside the
    // timed window like every other ensure'd index
    EmbedTableStore.ensure(s, dir)
    val (np, secs) = timed(
      VectorOps.embedNeardupPairs(s, e, tablesBound = true).count())
    s.catalog.clearCache()
    Stat("embed_lsh", tier, nIn, nc, np, secs)
  }

  /** Semantic decontamination (the q92 kernel): nCandidates = cosines
    * evaluated (|eval| × corpus — linear in corpus BY CONSTRUCTION,
    * since the eval side is a fixed driver-collected literal set and
    * the plan is a single scan with map-side filter; there is no
    * bucketing stage whose occupancy could drift), nOutput = flagged
    * vectors. The growth claim here is wall time ∝ corpus size at a
    * fixed eval set. */
  def semantic(s: SparkSession, dir: String, tier: String): Stat = {
    val e = Tables.load(s, dir, "embeddings")
    val nIn = e.count()
    val nEval = e.filter(col("vec_id") < VectorOps.NumProbes).count()
    s.catalog.clearCache()
    val (nOut, secs) = timed(VectorOps.semanticContam(e).count())
    s.catalog.clearCache()
    Stat("semantic_decontam", tier, nIn, (nIn - nEval) * nEval, nOut, secs)
  }

  /** Transitive duplicate groups (the q65/q74 closure) over the verified
    * minhash edge set: nCandidates = edges in, nOutput = labeled docs. */
  def components(s: SparkSession, dir: String, tier: String): Stat = {
    val docs = Tables.load(s, dir, "documents")
    val nIn = docs.count()
    s.catalog.clearCache()
    val (out, secs) = timed {
      val base = DedupOps.shingled(docs).persist()
      val edges = DedupOps.minhashEdges(s, base, minJ = 0.8)
      val packed = edges.select(
        shiftleft(col("a_id"), 32).bitwiseOR(col("b_id")).as("pk")).persist()
      val ne = packed.count()
      val labeled = DedupOps.componentLabels(s, packed).count()
      (ne, labeled)
    }
    s.catalog.clearCache()
    Stat("components", tier, nIn, out._1, out._2, secs)
  }

  /** Benchmark decontamination (the q75 kernel): nCandidates = corpus
    * grams matching the broadcast eval-set gram table (the join output
    * feeding the per-doc aggregate — the frame that must track corpus
    * size, not corpus × benchmark), nOutput = flagged docs. */
  def decontam(s: SparkSession, dir: String, tier: String): Stat = {
    val docs = Tables.load(s, dir, "documents")
    val nIn = docs.count()
    s.catalog.clearCache()
    def sh = DedupOps.shingled(docs)
    def benchGrams = sh.filter(col("doc_id") < 50)
      .select(explode(col("sh")).as("g")).distinct()
    val nc = sh.filter(col("doc_id") >= 50)
      .select(col("doc_id"), explode(col("sh")).as("g"))
      .join(broadcast(benchGrams), Seq("g")).count()
    s.catalog.clearCache()
    val (nOut, secs) = timed(
      CurationOps.defs("q75_decontaminate")(s, dir).count())
    s.catalog.clearCache()
    Stat("decontam", tier, nIn, nc, nOut, secs)
  }

  /** Substring span dedup (the q76 kernel): nCandidates = marked
    * duplicated window positions (the join-back output feeding the
    * span merge — duplication MASS, linear in corpus size for a
    * structure-preserving blow-up), nOutput = merged span rows. */
  def spans(s: SparkSession, dir: String, tier: String): Stat = {
    val docs = Tables.load(s, dir, "documents")
    val nIn = docs.count()
    s.catalog.clearCache()
    val nc = DedupOps.spanDupMarks(DedupOps.spanWindows(docs).persist()).count()
    s.catalog.clearCache()
    val (nOut, secs) = timed(DedupOps.defs("q76_span_dedup")(s, dir).count())
    s.catalog.clearCache()
    Stat("span_dedup", tier, nIn, nc, nOut, secs)
  }

  /** Incremental dedup (the q79 kernel SHAPE, not its exact split: q79
    * and its oracle cap the corpus at doc_id < 400, while this harness
    * deliberately probes the batch against the ENTIRE rest of the
    * corpus — the growth claim needs the corpus side to scale with the
    * tier, and a <400 cap would freeze it): a FIXED 100-doc batch
    * (doc_id 400-499) probed against everything else. nCandidates =
    * (new, old) band collisions — the number that must stay ~CONSTANT
    * as the corpus grows (the batch touches its own buckets, not the
    * corpus's pair mass); nOutput = verified cross edges. secs includes
    * re-banding the corpus side each run — in production that index is
    * write-once, so the growth claim rides on candidates, not secs. */
  def incremental(s: SparkSession, dir: String, tier: String): Stat = {
    val d = Tables.load(s, dir, "documents")
    val nIn = d.count()
    s.catalog.clearCache()
    def sh = DedupOps.shingled(d)
    def old(f: DataFrame) = f.filter(!col("doc_id").between(400, 499))
    def neu(f: DataFrame) = f.filter(col("doc_id").between(400, 499))
    val sh0 = sh.persist()
    val nc = DedupOps.bandRows(s, neu(sh0))
      .select(col("doc_id").as("new_id"), col("band"), col("bh"))
      .join(DedupOps.bandRows(s, old(sh0))
        .select(col("doc_id").as("old_id"), col("band"), col("bh")), Seq("band", "bh"))
      .select("new_id", "old_id").distinct().count()
    s.catalog.clearCache()
    val (ne, secs) = timed {
      val base = sh.persist()
      val cands = DedupOps.bandRows(s, neu(base))
        .select(col("doc_id").as("new_id"), col("band"), col("bh"))
        .join(DedupOps.bandRows(s, old(base))
          .select(col("doc_id").as("old_id"), col("band"), col("bh")), Seq("band", "bh"))
        .select("new_id", "old_id").distinct()
      cands
        .join(base.select(col("doc_id").as("new_id"), col("sh").as("sha")), Seq("new_id"))
        .join(base.select(col("doc_id").as("old_id"), col("sh").as("shb")), Seq("old_id"))
        .filter(size(array_intersect(col("sha"), col("shb"))).cast("double")
          / (size(col("sha")) + size(col("shb"))
            - size(array_intersect(col("sha"), col("shb")))) >= 0.8)
        .count()
    }
    s.catalog.clearCache()
    Stat("incremental", tier, nIn, nc, ne, secs)
  }

  /** Incremental SPAN dedup (the q88/q89 kernel, same fixed-batch shape
    * as [[incremental]]): the 100-doc batch's windows probed against
    * the rest of the corpus's window set. nCandidates = matched marks
    * (batch window positions already present in the corpus) — the
    * number that must stay ~CONSTANT as the corpus grows: the blow-up
    * replicas live in disjoint token spaces, so a growing corpus adds
    * no new matches for a fixed batch, and any growth here would mean
    * the probe is leaking corpus-side mass. nOutput = merged spans.
    * secs includes re-hashing the corpus windows each run — in
    * production that is the write-once `winhashes` store. */
  def incrementalSpans(s: SparkSession, dir: String, tier: String): Stat = {
    val d = Tables.load(s, dir, "documents")
    val nIn = d.count()
    s.catalog.clearCache()
    def probeMarks(): DataFrame = {
      val batchWins = DedupOps.spanWindows(d.filter(col("doc_id").between(400, 499)))
      val corpusWins = DedupOps.spanWindows(d.filter(!col("doc_id").between(400, 499)))
      val matched = corpusWins
        .join(broadcast(batchWins.select("wh").distinct()), Seq("wh"), "left_semi")
        .select("wh").distinct()
      batchWins.join(broadcast(matched), Seq("wh"), "left_semi")
        .select("doc_id", "pos")
    }
    val nc = probeMarks().count()
    s.catalog.clearCache()
    val (nOut, secs) = timed(DedupOps.mergeSpans(probeMarks()).count())
    s.catalog.clearCache()
    Stat("incr_spans", tier, nIn, nc, nOut, secs)
  }

  /** Deterministic per-image 64-bit pattern for the [[imagehash]]
    * probe's synthetic corpus: scene = id >> 2 mixed through the
    * splitmix64 finalizer (cross-scene Hamming concentrates at ~32
    * bits, so true cross-scene pairs are negligible at any tier);
    * variants within a scene are two exact dups, a one-block edit
    * (Hamming 1), and the bit-inverse (Hamming 64 — unrelated), so
    * TRUE pair mass is exactly 3 per scene — linear in corpus, the
    * duplicate-density-preserving shape the text blow-up uses. */
  private[queries] def imagePattern(id: Long): Long = {
    var z = (id >> 2) + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    val base = z ^ (z >>> 31)
    (id & 3L) match {
      case 2L => base ^ 1L
      case 3L => ~base
      case _  => base
    }
  }

  /** Perceptual image near-dup (the q97 kernel): one synthetic 32×32
    * 24bpp BMP per document id (≈3.1 KB built and REALLY byte-walked —
    * the hash kernel is the thing measured), then the shared
    * block-triple multi-index + bit_count verify. Payloads never
    * materialize: built, hashed, and dropped inside one streamed
    * mapPartitions pass. */
  def imagehash(s: SparkSession, dir: String, tier: String): Stat = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val ids = Tables.load(s, dir, "documents").select("doc_id")
    val nIn = ids.count()
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("simhash", LongType)))
    def hashed: DataFrame = ids.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val pat = imagePattern(id)
        val b = ImageHash.bmpGridBytes(32, 32, (rr, cc) =>
          if (((pat >>> ((rr / 4) * 8 + (cc / 4))) & 1L) == 1L) 200 else 50)
        val (h, err) = ImageHash.blockHash64(b)
        require(err == null && h == pat, s"self-check: hash != pattern for $id")
        Row(id, h)
      }
    }(Encoders.row(schema))
    s.catalog.clearCache()
    val nc = DedupOps.simhashCandidates(hashed).count()
    s.catalog.clearCache()
    val (np, secs) = timed(
      DedupOps.simhashCandidates(hashed)
        .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
        .filter(col("hamming") <= 3).count())
    s.catalog.clearCache()
    Stat("imagehash", tier, nIn, nc, np, secs)
  }

  /** The [[ExportOps.exportShards]] SINK end-to-end at tier scale —
    * shard assignment, two-phase ranking, the ≥256-task range-partition
    * write, and the validation manifest — then the full
    * [[ExportOps.readShards]] loader validation (structural + presence
    * + deep recount) over what was written. `secs` times the SINK (the
    * round-12 16-writer fix's measured row); `n_candidates` reports the
    * PART-FILE count the manifest lists (the writer parallelism that
    * fix bought — must be ≫16); `n_output` the manifest's exported row
    * total, which the deep validation re-proves equals the input.
    * Writes under `var/scale/export-<tier>/` (left in place; reruns
    * overwrite). */
  def exportSink(s: SparkSession, dir: String, tier: String): Stat = {
    val docs = Tables.load(s, dir, "documents").select("doc_id", "source", "text")
    val nIn = docs.count()
    s.catalog.clearCache()
    val out = s"var/scale/export-$tier"
    val (_, secs) = timed(ExportOps.exportShards(s, docs, out))
    val m = ExportOps.readManifest(s, out)
    require(m.nTotal == nIn, s"export lost rows: wrote ${m.nTotal} of $nIn")
    ExportOps.readShards(s, out, deep = true).count(): Unit
    s.catalog.clearCache()
    Stat("export_shards", tier, nIn, m.files.size.toLong, m.nTotal, secs)
  }

  /** Export-tree MAINTENANCE (the round-17 shard compactor + the
    * parallel-rename append) on a FILES-PER-SHARD axis at FIXED corpus
    * size — the state `slices` maintenance-free weekly append ticks
    * leave behind. Builds a base export plus (slices-2) appends of
    * equal doc_id-mod slices, then measures:
    *
    *  - `export_append` — the LAST append tick's wall, with the tree
    *    already holding the accumulated file mass (`n_candidates` =
    *    part files BEFORE that append): at fixed per-tick data this
    *    must hold ~flat as the axis grows, or appends degrade with tree
    *    age (the serial-rename failure mode the bounded pool fixes);
    *  - `export_compact` — ONE compactShards pass over the accreted
    *    tree (`n_candidates` = files before, `n_output` = files after),
    *    REQUIRED to shrink the file count and to re-validate under the
    *    full deep loader contract (rank tiling + per-shard checksums
    *    unchanged — content identity, not just row counts).
    *
    * Rebuilds fresh per run under `var/scale/exportmaint-<tier>/`. */
  def exportMaintenance(s: SparkSession, dir: String, tier: String,
                        slices: Int): Seq[Stat] = {
    val docs = Tables.load(s, dir, "documents").select("doc_id", "source", "text")
    val nIn = docs.count()
    val out = s"var/scale/exportmaint-$tier"
    graft.pipeline.DemoCache.deleteRec(new java.io.File(out))
    def slice(i: Int) = docs.filter(pmod(col("doc_id"), lit(slices)) === i)
    ExportOps.exportShards(s, slice(0), out)
    (1 until slices - 1).foreach(i => ExportOps.exportShardsAppend(s, slice(i), out))
    val beforeAppend = ExportOps.readManifest(s, out).files.size
    val (_, appendSecs) = timed(ExportOps.exportShardsAppend(s, slice(slices - 1), out))
    val before = ExportOps.readManifest(s, out).files.size
    val (rep, secs) = timed(ExportOps.compactShards(s, out, maxFilesPerShard = 8))
    val after = ExportOps.readManifest(s, out).files.size
    require(rep.shardsCompacted > 0 && after < before,
      s"export compaction did not shrink the tree ($before -> $after)")
    ExportOps.readShards(s, out, deep = true).count(): Unit
    s.catalog.clearCache()
    Seq(
      Stat("export_append", tier, nIn / slices, beforeAppend.toLong,
        ExportOps.readManifest(s, out).nTotal, appendSecs),
      Stat("export_compact", tier, nIn, before.toLong, after.toLong, secs))
  }

  def all(s: SparkSession, dir: String, tier: String): Seq[Stat] =
    Seq(minhash(s, dir, tier), simhash(s, dir, tier),
      embed(s, dir, tier), components(s, dir, tier), decontam(s, dir, tier),
      spans(s, dir, tier), incremental(s, dir, tier),
      incrementalSpans(s, dir, tier), semantic(s, dir, tier),
      imagehash(s, dir, tier), exportSink(s, dir, tier))

  /** The incremental-rollup family (q109/q110/q111) across LAKE tiers:
    * a synthetic curated lake replicated `copies`× from the sf0.1
    * events table (per-copy day-grained files, per-copy-shifted user
    * ids — distinct-user mass grows with the lake like a real one's
    * would), with partials published for every file. Three stats per
    * tier, measuring the X7 scale claim directly:
    *
    *  - `rollup_stats` — the q109 metadata fold. `n_candidates` = the
    *    partial rows scanned (files × partitions touched), the ONLY
    *    thing its cost may track;
    *  - `rollup_serve` — a q111-shaped partition-grain aggregate
    *    (counts, time bounds, e6 value sum over a day window) routed
    *    through [[graft.plans.RollupMetadataAggregate]]. The kernel
    *    REQUIRES the optimized plan to scan the partial store — a tier
    *    where the rewrite silently declined would otherwise time a
    *    lake scan and flatter nothing — and row-compares the served
    *    answer against the direct lake recompute with the rule
    *    disabled (untimed), so the flat line is also a PROVEN-exact
    *    line at every tier;
    *  - `rollup_reconcile` — the q110 auditor, the family's one
    *    deliberate lake scan (`n_candidates` = lake rows). The kernel
    *    requires every audit flag to be 1: the fold-forward chain must
    *    equal reality at every tier, else the timing is meaningless.
    *
    * Expected growth: stats/serve ∝ partial rows (metadata — ×copies
    * but kilobyte-scale), reconcile ∝ lake rows (linear, the floor for
    * an exactness audit). Lakes build once under
    * `var/scale/rollup/<tier>/` (marker-memoized like the blow-ups). */
  def rollupFamily(s: SparkSession, tier: String, copies: Int): Seq[Stat] = {
    import graft.ingest.Rollup
    val root = s"var/scale/rollup/$tier"
    val curatedDir = s"$root/curated"
    val rollupDir = s"$root/rollup"
    val ok = new java.io.File(s"$root/_OK")
    if (!ok.exists) {
      val ev = Tables.load(s, "/root/testdata/sf0.1", "events")
      // day-grained files like a real ingest's (a file covers one day,
      // two files per (copy, day)) so partial rows per file stay at the
      // modes-per-day cardinality instead of every partition at once
      ev.withColumn("cp", explode(sequence(lit(0), lit(copies - 1))))
        .select(
          concat(lit("scale-"), col("cp"), lit("-"),
            date_format(col("ts"), "yyyyMMdd"), lit("-f"),
            pmod(col("event_id"), lit(2))).as("source_file"),
          (col("user_id") + col("cp") * lit(1000000L)).as("user_id"),
          col("ts").as("event_time_utc"),
          col("value"),
          year(col("ts")).as("year"), month(col("ts")).as("month"),
          dayofmonth(col("ts")).as("day"), col("event_type").as("mode"))
        .write.mode("overwrite")
        .partitionBy("year", "month", "day", "mode").parquet(curatedDir)
      Rollup.partials(s.read.parquet(curatedDir))
        .repartition(math.min(copies, 32))
        .write.mode("overwrite").parquet(s"$rollupDir/b0")
      ok.createNewFile(): Unit
    }
    val nIn = s.read.parquet(curatedDir).count()
    val nPartials = Rollup.filePartials(s, rollupDir).count()
    s.catalog.clearCache()
    val (nStats, statsSecs) = timed(Rollup.stats(s, rollupDir).count())
    s.catalog.clearCache()

    def serveQ() = s.read.parquet(curatedDir)
      .filter(col("year") === 2024 && col("month") === 1 &&
        col("day").between(5, 20))
      .groupBy("year", "month", "day", "mode")
      .agg(count(lit(1)).as("n_rows"), count(col("value")).as("n_value"),
        min(col("event_time_utc")).as("first_ts"),
        max(col("event_time_utc")).as("last_ts"),
        sum(round(col("value") * lit(1000000)).cast("long")).as("value_e6"))
    val served = serveQ()
    val scansPartials = served.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.exists(_.toString.contains("/rollup"))
          case _ => false
        }
    }
    require(scansPartials == Seq(true),
      s"rollup_serve($tier): rewrite did not fire (plan scans: $scansPartials)")
    val (nServe, serveSecs) = timed(served.count())
    s.conf.set(graft.plans.RollupMetadataAggregate.EnabledKey, "false")
    val direct =
      try serveQ().collect().map(_.toSeq).sortBy(_.mkString("|"))
      finally s.conf.set(graft.plans.RollupMetadataAggregate.EnabledKey, "true")
    val servedRows = served.collect().map(_.toSeq).sortBy(_.mkString("|"))
    require(servedRows.sameElements(direct),
      s"rollup_serve($tier): served answer diverges from the lake recompute")
    s.catalog.clearCache()

    val (nRec, recSecs) = timed(Rollup.reconcile(s, curatedDir, rollupDir).count())
    val bad = Rollup.reconcile(s, curatedDir, rollupDir)
      .filter(col("rows_match") =!= 1 || col("value_match") =!= 1 ||
        col("value_e6_match") =!= 1 || col("files_match") =!= 1 ||
        col("reach_ok") =!= 1).count()
    require(bad == 0, s"rollup_reconcile($tier): $bad divergent audit rows")
    s.catalog.clearCache()
    Seq(Stat("rollup_stats", tier, nIn, nPartials, nStats, statsSecs),
      Stat("rollup_serve", tier, nIn, nPartials, nServe, serveSecs),
      Stat("rollup_reconcile", tier, nIn, nIn, nRec, recSecs)) ++
      rollupSkip(s, tier, copies)
  }

  /** The zone-map pruning payoff ([[graft.plans.RollupPartitionSkip]],
    * q114) across lake tiers whose PARTITION COUNT grows with the tier
    * — the axis the [[rollupFamily]] lake deliberately holds fixed.
    * Copy k shifts the sf0.1 events by k months, so `lake100` spans
    * ~8 years of day-grain partitions (~15k leaves) while a user's
    * two-day event-time window stays the same size. Two stats per
    * tier over the SAME query:
    *
    *  - `rollup_skip` — the window aggregate with the rule on.
    *    `n_candidates` = partitions actually scanned, which must stay
    *    FLAT across tiers (the window qualifies the same ~10
    *    day×mode zones no matter how much history surrounds it); the
    *    timing is end-to-end cold including the zone fold (the fold
    *    cache is cleared first), so the flat line carries the rule's
    *    own metadata cost honestly;
    *  - `rollup_fullscan` — the identical query with the rule off:
    *    every partition is listed and read (`n_candidates` = all of
    *    them, linear in the tier), the 100 TB failure mode the rule
    *    exists to delete.
    *
    * A third stat isolates the term neither query owns:
    *
    *  - `rollup_discovery` — building the relation's file index from a
    *    cold FileStatusCache (`n_candidates` = leaf partitions
    *    discovered). On a bare parquet directory this is linear in the
    *    partition count and is paid BEFORE any pruning can happen; it
    *    is the term a catalog deletes (a metastore-backed read defers
    *    listing to `CatalogFileIndex`, and the zone predicate this
    *    rule conjoins reaches `PruneFileSourcePartitions`, so only the
    *    qualifying partitions are ever listed — RollupSkipSpec proves
    *    the composition on a catalog-backed lake). The skip/fullscan
    *    timings below therefore run on an already-resolved relation —
    *    the steady state of any service that queries a lake more than
    *    once — so they measure the work the rule actually changes:
    *    zone fold + planning + scan.
    *
    * The kernel REQUIRES the two answers row-equal (the skip is only a
    * rewrite if it changes nothing but the partitions touched) and the
    * skip side strictly fewer partitions. Lakes build once under
    * `var/scale/rollupskip/<tier>/` (marker-memoized). */
  def rollupSkip(s: SparkSession, tier: String, copies: Int): Seq[Stat] = {
    import graft.ingest.Rollup
    val root = s"var/scale/rollupskip/$tier"
    val curatedDir = s"$root/curated"
    val rollupDir = s"$root/rollup"
    val ok = new java.io.File(s"$root/_OK")
    if (!ok.exists) {
      val ev = Tables.load(s, "/root/testdata/sf0.1", "events")
      ev.withColumn("cp", explode(sequence(lit(0), lit(copies - 1))))
        .withColumn("sts", expr("timestampadd(MONTH, cp, ts)"))
        .select(
          concat(lit("scale-"), col("cp"), lit("-"),
            date_format(col("sts"), "yyyyMMdd"), lit("-f"),
            pmod(col("event_id"), lit(2))).as("source_file"),
          col("user_id"),
          col("sts").cast("timestamp_ntz").as("event_time_utc"),
          col("value"),
          year(col("sts")).as("year"), month(col("sts")).as("month"),
          dayofmonth(col("sts")).as("day"), col("event_type").as("mode"))
        // one writer per month: each task owns ~150 leaf dirs instead
        // of every task spraying files into all of them
        .repartition(math.max(copies, 8), col("year"), col("month"))
        .write.mode("overwrite")
        .partitionBy("year", "month", "day", "mode").parquet(curatedDir)
      Rollup.partials(s.read.parquet(curatedDir))
        .repartition(math.min(copies, 32))
        .write.mode("overwrite").parquet(s"$rollupDir/b0")
      ok.createNewFile(): Unit
    }
    // discovery from a cold FileStatusCache: the linear pre-pruning
    // term a catalog deletes (`read.parquet` builds the InMemoryFileIndex
    // eagerly — listing + partition inference + schema, no data read)
    org.apache.spark.sql.execution.datasources.FileStatusCache
      .resetForTesting()
    val (nTotalParts, discoverySecs) = timed {
      s.read.parquet(curatedDir).queryExecution.analyzed.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation.asInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.asInstanceOf[
              org.apache.spark.sql.execution.datasources.InMemoryFileIndex]
            .partitionSpec().partitions.size.toLong
      }.sum
    }
    val nIn = s.read.parquet(curatedDir).count()

    // ONE resolved relation for both timed queries — each q() shares
    // its file index, so the timings measure fold + planning + scan,
    // not re-listing
    val base = s.read.parquet(curatedDir)
    def q() = base
      .filter(col("event_time_utc") >= lit("2024-01-10 00:00:00").cast("timestamp_ntz") &&
        col("event_time_utc") < lit("2024-01-12 00:00:00").cast("timestamp_ntz"))
      .groupBy("mode")
      .agg(count(lit(1)).as("n_rows"),
        sum(round(col("value") * lit(1000000)).cast("long")).as("value_e6"))
    def scannedPartitions(df: DataFrame): Long =
      df.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.partitionCount.toLong
      }.sum

    graft.plans.RollupPartitionSkip.clearCache()
    s.catalog.clearCache()
    val partsOn = scannedPartitions(q())
    // timed pass re-plans from a cleared fold cache: the flat number
    // includes the zone fold, not just the pruned scan
    graft.plans.RollupPartitionSkip.clearCache()
    val (rowsOn, onSecs) =
      timed(q().collect().map(_.toSeq).sortBy(_.mkString("|")))
    s.conf.set(graft.plans.RollupPartitionSkip.EnabledKey, "false")
    val (rowsOff, offSecs, partsOff) =
      try {
        s.catalog.clearCache()
        val po = scannedPartitions(q())
        val (r, t) = timed(q().collect().map(_.toSeq).sortBy(_.mkString("|")))
        (r, t, po)
      } finally s.conf.set(graft.plans.RollupPartitionSkip.EnabledKey, "true")
    require(rowsOn.sameElements(rowsOff),
      s"rollup_skip($tier): pruned answer diverges from the full scan")
    require(partsOn < partsOff,
      s"rollup_skip($tier): no pruning ($partsOn vs $partsOff partitions)")
    s.catalog.clearCache()

    // the COMPLEMENT (NOT-IN) form, end-to-end on the partition-count
    // ladder: a wide window qualifying MORE partitions than the IN cap
    // (everything after the first month — >1000 leaves at lake10/100)
    // while excluding a bounded cold set (~150 leaves). The kernel
    // REQUIRES the optimized plan to carry exactly one Not conjunct
    // (the complement membership — the old behavior declined entirely
    // and scanned everything) and the answer to row-match the rule-off
    // recompute. Skipped at lake1, whose single month leaves the wide
    // window nothing to qualify.
    val anti =
      if (copies < 10) Seq.empty
      else {
        def qa() = base
          .filter(col("event_time_utc") >=
            lit("2024-02-01 00:00:00").cast("timestamp_ntz"))
          .groupBy("mode")
          .agg(count(lit(1)).as("n_rows"),
            sum(round(col("value") * lit(1000000)).cast("long")).as("value_e6"))
        graft.plans.RollupPartitionSkip.clearCache()
        s.catalog.clearCache()
        val planned = qa()
        val nNot = planned.queryExecution.optimizedPlan.collect {
          case fl: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            fl.condition.collect {
              case n: org.apache.spark.sql.catalyst.expressions.Not => n
            }.size
        }.sum
        require(nNot == 1,
          s"rollup_antiskip($tier): complement form not planned ($nNot Not conjuncts)")
        val partsAnti = scannedPartitions(planned)
        graft.plans.RollupPartitionSkip.clearCache()
        val (rowsAnti, antiSecs) =
          timed(qa().collect().map(_.toSeq).sortBy(_.mkString("|")))
        s.conf.set(graft.plans.RollupPartitionSkip.EnabledKey, "false")
        val (rowsAntiOff, partsAntiOff) =
          try {
            s.catalog.clearCache()
            (qa().collect().map(_.toSeq).sortBy(_.mkString("|")),
              scannedPartitions(qa()))
          } finally s.conf.set(graft.plans.RollupPartitionSkip.EnabledKey, "true")
        require(rowsAnti.sameElements(rowsAntiOff),
          s"rollup_antiskip($tier): complement answer diverges from the full scan")
        require(partsAnti < partsAntiOff,
          s"rollup_antiskip($tier): excluded partitions not pruned " +
            s"($partsAnti vs $partsAntiOff)")
        s.catalog.clearCache()
        Seq(Stat("rollup_antiskip", tier, nIn, partsAnti, rowsAnti.length, antiSecs))
      }
    Seq(Stat("rollup_discovery", tier, nIn, nTotalParts, nTotalParts, discoverySecs),
      Stat("rollup_skip", tier, nIn, partsOn, rowsOn.length, onSecs),
      Stat("rollup_fullscan", tier, nIn, partsOff, rowsOff.length, offSecs)) ++ anti
  }

  /** FILE-grain zone skipping ([[graft.plans.RollupPartitionSkip]] move
    * 3, the round-16 FileBounds payoff) along the FILES-PER-PARTITION
    * axis: identical data (one month of sf0.1 events, ~150 day×mode
    * leaves), written as `bands` hour-band appends per partition — the
    * shape `bands` maintenance-free ticks of an hourly feed produce,
    * each file covering a disjoint 24/bands-hour slice, with the
    * FileBounds sidecar recording every file's time bounds. A TWO-HOUR
    * event-time window on one day then needs only the 1-4 files whose
    * band intersects it:
    *
    *  - `fileskip_on` — rule on. `n_candidates` = files the scan
    *    actually READ (the executed plan's numFiles metric): partition
    *    zones cut the lake to the one day's leaves, file-grain zones
    *    cut those leaves to the intersecting bands — files-read tracks
    *    the WINDOW share (2h/24h × bands per leaf), not the lake's
    *    file count;
    *  - `fileskip_off` — identical query, rule off: an event-time
    *    predicate prunes nothing, every file in every partition is
    *    read — linear in `bands` at constant data.
    *
    * The kernel REQUIRES the answers row-equal and strictly fewer files
    * read with the rule on. Like the fragmentation ladder, the `fN`
    * tier names sit outside the growth-verdict windows on purpose: the
    * axis varies file count at constant data. */
  def fileSkip(s: SparkSession, tier: String, bands: Int): Seq[Stat] = {
    import graft.ingest.{FileBounds, Rollup}
    val root = s"var/scale/fileskip/$tier"
    val curatedDir = s"$root/curated"
    val ok = new java.io.File(s"$root/_OK")
    if (!ok.exists) {
      DemoLikeDelete.deleteRec(new java.io.File(root))
      val ev = Tables.load(s, "/root/testdata/sf0.1", "events")
        .filter(year(col("ts")) === 2024 && month(col("ts")) === 1)
        .select(
          // raw-file lineage at the band grain — the shape an hourly
          // feed's ticks produce (one upstream file per day per band),
          // so the partial store stays ledger-sized, not row-sized
          concat(lit("d"), dayofmonth(col("ts")), lit("-b"),
            floor((hour(col("ts")) * 60 + minute(col("ts"))) * bands / 1440))
            .as("source_file"),
          col("user_id"),
          col("ts").cast("timestamp_ntz").as("event_time_utc"),
          col("value"),
          year(col("ts")).as("year"), month(col("ts")).as("month"),
          dayofmonth(col("ts")).as("day"), col("event_type").as("mode"))
        .persist()
      // one append per hour band: each lands exactly one file per
      // touched leaf (one task owns each partition)
      (0 until bands).foreach { b =>
        ev.filter(floor((hour(col("event_time_utc")) * 60 +
            minute(col("event_time_utc"))) * bands / 1440) === b)
          .repartition(col("year"), col("month"), col("day"), col("mode"))
          .write.mode("append")
          .partitionBy("year", "month", "day", "mode").parquet(curatedDir)
      }
      ev.unpersist()
      val lakeWithMeta = s.read.parquet(curatedDir)
        .select(col("event_time_utc"), col("value"), col("_metadata"),
          col("year"), col("month"), col("day"), col("mode"))
      Rollup.partials(s.read.parquet(curatedDir))
        .coalesce(1).write.mode("overwrite").parquet(s"$root/rollup/b0")
      FileBounds.compute(lakeWithMeta, "")
        .coalesce(1).write.mode("overwrite").parquet(s"$root/filebounds/b0")
      ok.createNewFile(): Unit
    }
    val nIn = s.read.parquet(curatedDir).count()
    def q() = s.read.parquet(curatedDir)
      .filter(col("event_time_utc") >= lit("2024-01-10 10:00:00").cast("timestamp_ntz") &&
        col("event_time_utc") < lit("2024-01-10 12:00:00").cast("timestamp_ntz"))
      .groupBy("mode")
      .agg(count(lit(1)).as("n_rows"),
        sum(round(col("value") * lit(1000000)).cast("long")).as("value_e6"))
    def run(): (Seq[Seq[Any]], Double, Long) = {
      // cold fold once (the rollup_skip ladder already prices the cold
      // fold term honestly), then time the STEADY STATE a repeated
      // window hits — fold cached per (store signature, window), the
      // posture of any service that queries a lake more than once
      graft.plans.RollupPartitionSkip.clearCache()
      s.catalog.clearCache()
      q().collect()
      s.catalog.clearCache()
      val df = q()
      val (rows, secs) = timed(df.collect().map(_.toSeq).sortBy(_.mkString("|")))
      // files the scan will actually read: partition pruning AND the
      // file-grain listing swap both land in selectedPartitions
      val nFiles = df.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.totalNumberOfFiles
      }.sum
      (rows.toSeq, secs, nFiles)
    }
    val (rowsOn, onSecs, filesOn) = run()
    s.conf.set(graft.plans.RollupPartitionSkip.EnabledKey, "false")
    val (rowsOff, offSecs, filesOff) =
      try run()
      finally s.conf.set(graft.plans.RollupPartitionSkip.EnabledKey, "true")
    require(rowsOn == rowsOff,
      s"file_skip($tier): pruned answer diverges from the full scan")
    require(filesOn < filesOff,
      s"file_skip($tier): no file pruning ($filesOn vs $filesOff files)")
    Seq(Stat("fileskip_on", tier, nIn, filesOn, rowsOn.length, onSecs),
      Stat("fileskip_off", tier, nIn, filesOff, rowsOff.length, offSecs))
  }

  /** zcluster ladder (round 18): what interleaved clustering buys ON
    * TOP of bounds-preserving compaction. Twin lakes per tier — one
    * month of sf0.1 events ×copies, appended as 4 full-range files per
    * leaf — compacted through the SAME swap path with the SAME output
    * sizing, one `sortCol`-only (time-tiled: every output file still
    * spans the full user range) and one `clusterCols = (event_time_utc,
    * user_id)` ([[graft.ingest.ZCluster]]). A top-decile user-window
    * aggregate with NO time bound then runs on both with the skip rule
    * on — partition pruning cannot act, so file-grain user windows are
    * the only lever:
    *
    *  - `zcluster_sorted` — the time-sorted twin: `n_candidates` = its
    *    total files, `n_output` = files the scan kept. Full-range files
    *    never prune, so kept ≈ total — the pre-round-18 floor.
    *  - `zcluster` — the clustered twin, same fields: kept files drop
    *    with the per-file user span the z-curve bought.
    *
    * The twins' answers are REQUIRED row-identical and the clustered
    * side strictly fewer kept files; timings are the steady state
    * (fold cached, file index resolved). */
  def zCluster(s: SparkSession, tier: String, copies: Int): Seq[Stat] = {
    import graft.ingest.{Compactor, CuratedWriter, FileBounds, Rollup}
    val root = s"var/scale/zcluster/$tier"
    val twins = Seq("sorted" -> Seq.empty[String],
      "clustered" -> Seq("event_time_utc", "user_id"))
    val ok = new java.io.File(s"$root/_OK")
    if (!ok.exists) {
      DemoLikeDelete.deleteRec(new java.io.File(root))
      // copies are PERTURBED (ts +cp seconds, value +cp·1e-6): byte-for-
      // byte duplicate rows dictionary/RLE-compress into ~nothing, which
      // would silently flatten the tier axis to ~1 output file per leaf
      val ev = Tables.load(s, "/root/testdata/sf0.1", "events")
        .filter(year(col("ts")) === 2024 && month(col("ts")) === 1)
        .withColumn("cp", explode(sequence(lit(0), lit(copies - 1))))
        .withColumn("sts", expr("timestampadd(SECOND, cp, ts)"))
        .select(
          concat(lit("z"), col("cp"), lit("-d"), dayofmonth(col("sts")),
            lit("-s"), pmod(col("event_id") + col("cp"), lit(4))).as("source_file"),
          col("user_id"), col("sts").cast("timestamp_ntz").as("event_time_utc"),
          (col("value") + col("cp") * lit(1e-6)).as("value"),
          year(col("sts")).as("year"), month(col("sts")).as("month"),
          dayofmonth(col("sts")).as("day"), col("event_type").as("mode"),
          pmod(col("event_id") + col("cp"), lit(4)).as("seed"))
        .persist()
      for ((name, cluster) <- twins) {
        val curated = s"$root/$name/curated"
        (0 until 4).foreach { p =>
          ev.filter(col("seed") === p).drop("seed")
            .repartition(col("year"), col("month"), col("day"), col("mode"))
            .write.mode("append")
            .partitionBy("year", "month", "day", "mode").parquet(curated)
        }
        Rollup.partials(s.read.parquet(curated))
          .coalesce(1).write.mode("overwrite").parquet(s"$root/$name/rollup/b0")
        FileBounds.writeStaged(
          s.read.parquet(curated).select(col("*"), col("_metadata")), "",
          s"$root/$name/filebounds/b0")
        // output sizing scales with the tier so files-per-leaf stays
        // ~constant (~8, the shape a 128 MB-target leaf holds at
        // warehouse scale): the axis varies DATA, not fragment count
        Compactor.compact(s, curated, maxFilesPerPartition = 1,
          targetBytesPerFile = 3L * 1024 * copies, parallelism = 8,
          sortCol = Some("event_time_utc"), clusterCols = cluster): Unit
        Compactor.sweepRetired(s, curated): Unit
      }
      ev.unpersist()
      ok.createNewFile(): Unit
    }
    val nIn = s.read.parquet(s"$root/clustered/curated").count()
    def q(curated: String) = CuratedWriter.read(s, curated)
      .filter(col("user_id") >= lit(1350L))
      .groupBy("mode")
      .agg(count(lit(1)).as("n_rows"),
        sum(round(col("value") * lit(1000000)).cast("long")).as("value_e6"))
    def run(name: String): (Seq[Seq[Any]], Double, Long, Long) = {
      val curated = s"$root/$name/curated"
      graft.plans.RollupPartitionSkip.clearCache()
      s.catalog.clearCache()
      q(curated).collect() // cold fold priced by the rollup ladder
      s.catalog.clearCache()
      val df = q(curated)
      val (rows, secs) = timed(df.collect().map(_.toSeq).sortBy(_.mkString("|")))
      val kept = df.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.totalNumberOfFiles
      }.sum
      (rows.toSeq, secs, kept, CuratedWriter.read(s, curated).inputFiles.length.toLong)
    }
    val (rowsS, secsS, keptS, totS) = run("sorted")
    val (rowsC, secsC, keptC, totC) = run("clustered")
    require(rowsS == rowsC, s"zcluster($tier): twin lakes disagree on the answer")
    require(keptC < keptS,
      s"zcluster($tier): clustering dropped no files ($keptC vs $keptS kept)")
    Seq(Stat("zcluster_sorted", tier, nIn, totS, keptS, secsS),
      Stat("zcluster", tier, nIn, totC, keptC, secsC))
  }

  /** bloomskip ladder (round 19): what per-file Bloom filters buy for
    * POINT lookups on a hash-shaped key, along the FILES-PER-PARTITION
    * axis (the fileskip lakes' tier names). One month of sf0.1 events
    * with a Knuth-scrambled `lookup_key`, written as `bands` appends
    * per leaf — every file spans essentially the WHOLE key space, so
    * min/max windows keep everything BY CONSTRUCTION (required below:
    * kept-by-windows == total files); the sidecar's `bf_lookup_key`
    * filters are the only statistics that can narrow the listing.
    *
    *  - `bloomskip_on` — rule on: `n_candidates` = files the executed
    *    scan read. Expect ~the containing file (+ false positives at
    *    the configured fpp) regardless of the tier's file count.
    *  - `bloomskip_off` — identical query, rule off: every file read —
    *    linear in `bands` at constant data, the cost every UUID lookup
    *    pays forever on an unclustered 100 TB lake without membership
    *    statistics.
    *
    * Rows are REQUIRED equal both sides. Steady-state timing like
    * [[fileSkip]]: one cold fold, then the cached-fold re-run. */
  def bloomSkip(s: SparkSession, tier: String, bands: Int): Seq[Stat] = {
    import graft.ingest.{FileBounds, Rollup}
    val root = s"var/scale/bloomskip/$tier"
    val curatedDir = s"$root/curated"
    val ok = new java.io.File(s"$root/_OK")
    if (!ok.exists) {
      DemoLikeDelete.deleteRec(new java.io.File(root))
      val ev = Tables.load(s, "/root/testdata/sf0.1", "events")
        .filter(year(col("ts")) === 2024 && month(col("ts")) === 1)
        .select(
          concat(lit("d"), dayofmonth(col("ts")), lit("-b"),
            pmod(col("event_id"), lit(bands.toLong))).as("source_file"),
          col("user_id"),
          concat(lit("k-"),
            (col("event_id") * lit(2654435761L)) % lit(1000000007L))
            .as("lookup_key"),
          col("ts").cast("timestamp_ntz").as("event_time_utc"),
          col("value"),
          year(col("ts")).as("year"), month(col("ts")).as("month"),
          dayofmonth(col("ts")).as("day"), col("event_type").as("mode"),
          pmod(col("event_id"), lit(bands.toLong)).as("band"))
        .persist()
      // one append per id-parity band: each lands one file per leaf,
      // and every band samples the full key range (ids stripe across
      // bands) — the windows-cannot-prune worst case, engineered
      (0 until bands).foreach { b =>
        ev.filter(col("band") === b).drop("band")
          .repartition(col("year"), col("month"), col("day"), col("mode"))
          .write.mode("append")
          .partitionBy("year", "month", "day", "mode").parquet(curatedDir)
      }
      ev.unpersist()
      Rollup.partials(s.read.parquet(curatedDir))
        .coalesce(1).write.mode("overwrite").parquet(s"$root/rollup/b0")
      FileBounds.writeStaged(
        s.read.parquet(curatedDir).select(col("*"), col("_metadata")),
        "", s"$root/filebounds/b0", blooms = Seq("lookup_key"),
        bloomExpectedItems = 16384, bloomFpp = 0.01)
      ok.createNewFile(): Unit
    }
    val nIn = s.read.parquet(curatedDir).count()
    // the probe key: a fixed mid-month event's scrambled id (event ids
    // are dense from 0, so id 5000 exists at sf0.1's 100k rows)
    val probeKey = s"k-${(5000L * 2654435761L) % 1000000007L}"
    // attribution: what a bloom-LESS sidecar's windows would keep for
    // this probe, evaluated directly over the store — ~everything at
    // low band counts (each file samples the full key space); at high
    // band counts the smallest files hold few enough keys that their
    // [min, max] excludes the probe by chance, so the windows term is
    // REPORTED as its own rung (`bloomskip_windows`) rather than
    // assumed, and the bloom verdict below must beat it outright
    val fb = FileBounds.all(s, s"$root/filebounds")
    val winKept = fb.filter(col("min_lookup_key") <= lit(probeKey) &&
      col("max_lookup_key") >= lit(probeKey)).count()
    val fbTotal = fb.count()
    def q() = s.read.parquet(curatedDir)
      .filter(col("lookup_key") === probeKey)
      .select("source_file", "user_id", "value", "day", "mode")
    def run(): (Seq[Seq[Any]], Double, Long) = {
      graft.plans.RollupPartitionSkip.clearCache()
      s.catalog.clearCache()
      q().collect()
      s.catalog.clearCache()
      val df = q()
      val (rows, secs) = timed(df.collect().map(_.toSeq).sortBy(_.mkString("|")))
      val nFiles = df.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.totalNumberOfFiles
      }.sum
      (rows.toSeq, secs, nFiles)
    }
    val (rowsOn, onSecs, filesOn) = run()
    s.conf.set(graft.plans.RollupPartitionSkip.EnabledKey, "false")
    val (rowsOff, offSecs, filesOff) =
      try run()
      finally s.conf.set(graft.plans.RollupPartitionSkip.EnabledKey, "true")
    require(rowsOn == rowsOff,
      s"bloom_skip($tier): pruned answer diverges from the full scan")
    require(rowsOn.nonEmpty, s"bloom_skip($tier): probe key matched nothing")
    require(filesOn < winKept,
      s"bloom_skip($tier): blooms beat windows nowhere ($filesOn vs $winKept kept)")
    require(filesOn < filesOff,
      s"bloom_skip($tier): no file pruning ($filesOn vs $filesOff files)")
    Seq(Stat("bloomskip_on", tier, nIn, filesOn, rowsOn.length, onSecs),
      // the windows-only counterfactual: n_candidates = files a
      // bloom-less sidecar would keep (no timing of its own — the off
      // run below prices the no-statistics end)
      Stat("bloomskip_windows", tier, nIn, winKept, fbTotal.toInt, 0.0),
      Stat("bloomskip_off", tier, nIn, filesOff, rowsOff.length, offSecs))
  }

  /** bloomrg ladder (round 20, r19 verdict #5): what the NATIVE parquet
    * bloom filters buy at ROW-GROUP grain INSIDE a kept file — the
    * half of the membership story the sidecar ladder cannot see (it
    * measures whole-file drops only). Twin single-file lakes of
    * `mult`× one sf0.1 events month with a hash-shaped key and ~1 MB
    * row groups: every row group spans the key space, so min/max
    * row-group statistics keep everything by construction, and the key
    * is high-cardinality enough that its data pages fall OFF dictionary
    * encoding (footer-verified — with a live dictionary parquet's
    * dictionary filtering would already drop the row groups and the
    * bloom would be redundant; the probe REPORTS that honestly via the
    * `bloomrg_dict` rung instead of measuring a tautology). The rungs:
    *
    *  - `bloomrg_on`  — point lookup on the bloomed twin: parquet-mr
    *    consumes its own filters for the pushed equality predicate and
    *    skips non-matching row groups (n_candidates = row groups in
    *    the file; secs = the scan).
    *  - `bloomrg_off` — identical file without blooms: every row group
    *    decoded, linear in the file's size forever.
    *  - `bloomrg_dict` — n_candidates 1/0: whether the key column's
    *    data pages are dictionary-encoded (0 expected = the bloom is
    *    the live mechanism).
    *
    * Rows are REQUIRED equal across the twins; the on-twin's footer is
    * REQUIRED to actually carry bloom offsets (attribution). */
  def bloomRowGroups(s: SparkSession, tier: String, mult: Int): Seq[Stat] = {
    val root = s"var/scale/bloomrg/$tier"
    val ok = new java.io.File(s"$root/_OK")
    def fileDir(b: Boolean) = s"$root/${if (b) "on" else "off"}"
    if (!ok.exists) {
      DemoLikeDelete.deleteRec(new java.io.File(root))
      val ev = Tables.load(s, "/root/testdata/sf0.1", "events")
        .filter(year(col("ts")) === 2024 && month(col("ts")) === 1)
        .select(col("event_id"), col("user_id"), col("value"),
          col("ts").cast("timestamp_ntz").as("event_time_utc"))
        .crossJoin(s.range(mult.toLong).select(col("id").as("rep")))
        .select(
          concat(lit("k-"),
            ((col("event_id") * lit(mult.toLong) + col("rep")) *
              lit(2654435761L)) % lit(1000000007L)).as("lookup_key"),
          col("user_id"), col("value"), col("event_time_utc"))
      for (bloom <- Seq(true, false))
        ev.coalesce(1).write.mode("overwrite")
          .option("parquet.block.size", (1 << 20).toString)
          .options(if (!bloom) Map.empty[String, String] else Map(
            "parquet.bloom.filter.enabled#lookup_key" -> "true",
            "parquet.bloom.filter.expected.ndv#lookup_key" -> "100000",
            "parquet.bloom.filter.adaptive.enabled" -> "true"))
          .parquet(fileDir(bloom))
      ok.createNewFile(): Unit
    }
    // footer audit: row-group count, bloom presence, dictionary state
    def footer(b: Boolean): (Int, Boolean, Boolean) = {
      val f = new java.io.File(fileDir(b)).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath),
          s.sparkContext.hadoopConfiguration))
      try {
        import scala.jdk.CollectionConverters._
        val blocks = rd.getFooter.getBlocks.asScala
        val chunks = blocks.map(_.getColumns.asScala
          .find(_.getPath.toDotString == "lookup_key").get)
        (blocks.size,
          chunks.forall(_.getBloomFilterOffset >= 0),
          chunks.exists(_.getEncodings.asScala.exists(e =>
            e.name.contains("DICTIONARY"))))
      } finally rd.close()
    }
    val (nRg, hasBloom, dictOn) = footer(true)
    val (_, _, dictOff) = footer(false)
    require(nRg > 4, s"bloomrg($tier): fixture produced only $nRg row groups")
    require(hasBloom, s"bloomrg($tier): on-twin carries no bloom filters")
    val nIn = s.read.parquet(fileDir(true)).count()
    val probeKey = s"k-${(5000L * mult * 2654435761L) % 1000000007L}"
    def run(b: Boolean): (Seq[Seq[Any]], Double) = {
      s.catalog.clearCache()
      def q() = s.read.parquet(fileDir(b))
        .filter(col("lookup_key") === probeKey)
        .select("lookup_key", "user_id", "value")
      q().collect() // page-cache + codegen warm, both twins equally
      val (rows, secs) = timed(q().collect().map(_.toSeq).sortBy(_.mkString("|")))
      (rows.toSeq, secs)
    }
    val (rowsOn, onSecs) = run(true)
    val (rowsOff, offSecs) = run(false)
    require(rowsOn == rowsOff, s"bloomrg($tier): twins disagree on the answer")
    require(rowsOn.nonEmpty, s"bloomrg($tier): probe key matched nothing")
    // STRUCTURAL attribution, independent of timing noise: ask
    // parquet-mr itself how many records survive its row-group-level
    // filters (stats + dictionary + bloom) for this exact predicate —
    // the bloomed twin must admit ~one row group's rows, the bloom-less
    // twin (hash-shaped key: min/max useless, no dictionary) all of
    // them. This is the number the wall-clock rungs above can only
    // hint at once decode parallelism hides the saved work.
    def rgSurvivors(b: Boolean): Long = {
      val f = new java.io.File(fileDir(b)).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val conf = new org.apache.hadoop.conf.Configuration(
        s.sparkContext.hadoopConfiguration)
      val eq = org.apache.parquet.filter2.predicate.FilterApi.eq(
        org.apache.parquet.filter2.predicate.FilterApi.binaryColumn("lookup_key"),
        org.apache.parquet.io.api.Binary.fromString(probeKey))
      val opts = org.apache.parquet.HadoopReadOptions.builder(conf)
        .withRecordFilter(org.apache.parquet.filter2.compat.FilterCompat.get(eq))
        .build()
      val rd = new org.apache.parquet.hadoop.ParquetFileReader(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf), opts)
      try rd.getFilteredRecordCount finally rd.close()
    }
    val survOn = rgSurvivors(true)
    val survOff = rgSurvivors(false)
    require(survOn < survOff,
      s"bloomrg($tier): bloom admitted no fewer rows ($survOn vs $survOff)")
    Seq(Stat("bloomrg_on", tier, nIn, nRg.toLong, rowsOn.length, onSecs),
      Stat("bloomrg_off", tier, nIn, nRg.toLong, rowsOff.length, offSecs),
      // rows ADMITTED past row-group filtering, bloomed vs bloom-less
      Stat("bloomrg_rgrows", tier, nIn, survOn, survOff, 0.0),
      Stat("bloomrg_dict", tier, nIn, if (dictOn || dictOff) 1 else 0, 0, 0.0))
  }

  /** The small-file problem and its fix ([[graft.ingest.Compactor]],
    * q115) along the FRAGMENTATION axis: identical data (one month of
    * sf0.1 events, ~150 day×mode leaves), written as `frag` files per
    * leaf — the state a tick-appending pipeline without maintenance
    * reaches after `frag` ticks. Three stats per tier:
    *
    *  - `compact_scan_frag` — a full-lake aggregate on the fragmented
    *    lake, cold file index (`n_candidates` = data files). The rows
    *    never change across tiers; only the file count does, so the
    *    slope of this line is pure per-file overhead (listing, footer
    *    reads, per-split scheduling) — the cost a 100 TB lake pays
    *    FOREVER on every query if nobody compacts.
    *  - `compact_rewrite` — the standalone Compactor job, event-time-
    *    sorted rewrites (`n_candidates` = files before, `n_output` =
    *    files after). Bytes are constant across tiers, so this should
    *    stay ~flat: compaction cost tracks data size, not fragment
    *    count — paid once, deleting the scan penalty permanently.
    *  - `compact_scan_tight` — the same aggregate after, cold index,
    *    REQUIRED row-equal to the fragmented answer.
    *
    * Lakes build once under `var/scale/compact/<tier>/`
    * (marker-memoized); the rewrite mutates them, so the `_OK` marker
    * is written only after the full triple completes and a re-run
    * rebuilds from scratch. */
  def lakeCompact(s: SparkSession, tier: String, frag: Int): Seq[Stat] = {
    import graft.ingest.Compactor
    val root = s"var/scale/compact/$tier"
    val lakeDir = s"$root/curated"
    val ok = new java.io.File(s"$root/_OK")
    // the triple is one atomic experiment: never resume a half-run
    if (ok.exists) DemoLikeDelete.deleteRec(new java.io.File(root))
    val ev = Tables.load(s, "/root/testdata/sf0.1", "events")
      .filter(year(col("ts")) === 2024 && month(col("ts")) === 1)
      .select(
        concat(lit("t-"), col("event_id")).as("txn"),
        col("user_id"),
        col("ts").cast("timestamp_ntz").as("event_time_utc"),
        col("value"),
        year(col("ts")).as("year"), month(col("ts")).as("month"),
        dayofmonth(col("ts")).as("day"), col("event_type").as("mode"))
      .persist()
    // one append per fragment slice: each lands exactly one file per
    // touched leaf, the shape `frag` maintenance-free ticks produce
    (0 until frag).foreach { k =>
      ev.filter(pmod(col("user_id"), lit(frag)) === k)
        .repartition(col("year"), col("month"))
        .write.mode("append")
        .partitionBy("year", "month", "day", "mode").parquet(lakeDir)
    }
    val nIn = ev.count()
    ev.unpersist()

    def countFiles(dir: java.io.File): Long = {
      val kids = Option(dir.listFiles()).toSeq.flatten
      kids.count(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith(".")).toLong +
        kids.filter(f => f.isDirectory && !f.getName.startsWith("_") &&
          !f.getName.startsWith(".")).map(countFiles).sum
    }
    def scan() = {
      org.apache.spark.sql.execution.datasources.FileStatusCache.resetForTesting()
      s.catalog.clearCache()
      timed {
        s.read.parquet(lakeDir).groupBy("mode")
          .agg(count(lit(1)).as("n"),
            sum(round(col("value") * lit(1000000)).cast("long")).as("value_e6"))
          .collect().map(_.toSeq).sortBy(_.mkString("|"))
      }
    }

    val filesBefore = countFiles(new java.io.File(lakeDir))
    val (rowsFrag, fragSecs) = scan()
    val (report, rewriteSecs) = timed {
      val r = Compactor.compact(s, lakeDir, maxFilesPerPartition = 1,
        parallelism = 8, sortCol = Some("event_time_utc"))
      // the reader-safe swap defers old-file deletion to the NEXT
      // maintenance invocation; this kernel measures the steady state,
      // so run the deferred deletion inside the maintenance timing —
      // the total cost a production lake pays across the two ticks
      Compactor.sweepRetired(s, lakeDir): Unit
      r
    }
    require(report.filesAfter < report.filesBefore,
      s"lake_compact($tier): no files merged ($report)")
    val filesAfter = countFiles(new java.io.File(lakeDir))
    val (rowsTight, tightSecs) = scan()
    require(rowsFrag.length == rowsTight.length &&
      rowsFrag.zip(rowsTight).forall { case (a, b) => a == b },
      s"lake_compact($tier): compacted answer diverges from the fragmented one")
    ok.getParentFile.mkdirs()
    ok.createNewFile(): Unit
    Seq(Stat("compact_scan_frag", tier, nIn, filesBefore, rowsFrag.length, fragSecs),
      Stat("compact_rewrite", tier, nIn, filesBefore, filesAfter, rewriteSecs),
      Stat("compact_scan_tight", tier, nIn, filesAfter, rowsTight.length, tightSecs))
  }

  private object DemoLikeDelete {
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(deleteRec)
      f.delete(): Unit
    }
  }
}
