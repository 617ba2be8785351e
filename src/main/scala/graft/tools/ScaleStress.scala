package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.queries.ScaleProbe

/** Scale-stress harness for the dedup/ANN 100 TB claims: runs the
  * minhash / simhash / embedding / span-dedup kernels and the
  * transitive closure at corpus tiers — sf0.01, sf0.1 (both
  * driver-provided), a deterministic 10× blow-up of sf0.1 under
  * `var/scale/x10`, and a 100× documents-only blow-up under
  * `var/scale/x100` for the cheapest corpus kernels — and asserts
  * CANDIDATE growth is sub-quadratic in corpus size. Also assembles
  * `var/scale/x10full` (sf0.1 relational tables + x10 corpus, via
  * symlinks) so the whole-bench 10× row needs no manual step.
  *
  * The blow-up preserves duplicate DENSITY instead of densifying it
  * (which would make any bucketed algorithm look quadratic for the
  * wrong reason):
  *  - documents: replica k prefixes every token with `r{k}x`, so each
  *    replica reproduces the original near-dup structure in a disjoint
  *    shingle space — 10× docs carry ≈10× true pairs, and any
  *    super-linear candidate growth is the algorithm's own doing
  *    (band-hash collisions), which is exactly what is measured.
  *  - embeddings: replica k applies a per-replica deterministic sign
  *    flip per dimension (an orthogonal transform — norms and
  *    intra-replica cosines are preserved exactly), so each replica
  *    reproduces the original neighborhood structure in a different
  *    orthant; the adaptive LSH code width must absorb the 10× corpus
  *    with ~constant candidates per vector.
  *
  * Output: one `SCALE {json}` line per (kernel, tier) with input rows,
  * candidate pairs, output pairs, end-to-end seconds; then PASS/FAIL
  * growth verdicts (candidates must grow < blowup × 3 — linear is
  * ~10×, quadratic ~100×). Exits non-zero on a quadratic kernel.
  * Results are recorded in README.md §scale.
  */
object ScaleStress {
  private val IdOffset = 10000000L // 100 copies * 1e7 < 2^32: packed-pair-safe

  /** Lake-replication tiers for the rollup family (×1/×10/×100 of the
    * sf0.1 events table as a curated lake — 100k/1M/10M rows). */
  private val RollupTiers = Seq("lake1" -> 1, "lake10" -> 10, "lake100" -> 100)
  // fragmentation axis: same data, 4/16/64 files per partition — the
  // state 4/16/64 maintenance-free ingest ticks leave behind
  private val CompactTiers = Seq("frag4" -> 4, "frag16" -> 16, "frag64" -> 64)
  private val FileSkipTiers = Seq("f4" -> 4, "f12" -> 12, "f48" -> 48)
  // clustered-compaction axis: lake size (files-per-leaf held ~constant)
  private val ZClusterTiers = Seq("lake1" -> 1, "lake10" -> 10)
  // row-groups-per-file axis: events-month multiplier → ~1 MB row
  // groups, so m4 ≈ tens of row groups and m16 ≈ a 128 MB-class file
  private val BloomRgTiers = Seq("m4" -> 4, "m16" -> 16)
  // append-tick axis for export-tree maintenance: 4/16/64 generations
  // of weekly appends at fixed corpus size (files-per-shard grows ~axis)
  private val ExportMaintTiers = Seq("a4" -> 4, "a16" -> 16, "a64" -> 64)

  private def ensureBlowup(spark: SparkSession, src: String, out: String,
                           copies: Int, withEmbeddings: Boolean): Unit = {
    val ok = new java.io.File(s"$out/_OK")
    if (ok.exists) return
    val docs = Tables.load(spark, src, "documents")
    (0 until copies).map { k =>
      if (k == 0) docs
      else docs.select(
        (col("doc_id") + lit(k * IdOffset)).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          t => concat(lit(s"r${k}x"), t)), " ").as("text"),
        col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }.reduce(_.unionByName(_))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    if (withEmbeddings) {
      val e = Tables.load(spark, src, "embeddings")
      (0 until copies).map { k =>
        if (k == 0) e
        else e.select(
          (col("vec_id") + lit(k * IdOffset)).as("vec_id"),
          expr(s"transform(embedding, (x, i) -> " +
            s"CAST(x * (1 - 2 * pmod(hash(i, $k), 2)) AS FLOAT))").as("embedding"),
          col("label"))
      }.reduce(_.unionByName(_))
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    }
    ok.getParentFile.mkdirs()
    ok.createNewFile()
    ()
  }

  /** Assemble the full 10× LAKE the whole-bench row runs against:
    * symlinks to the sf0.1 relational/event tables beside the x10
    * documents/embeddings, so `SPARK_GRAFT_SF_DIR=var/scale/x10full
    * runMain graft.Bench` works on a wiped workspace with no manual
    * step. Symlinks, not copies — the sources are immutable driver
    * data and the blow-up output; the lake is just a view. */
  private def ensureFullLake(src: String, x10: String, out: String): Unit = {
    import java.nio.file.{Files, LinkOption, Paths}
    val okF = new java.io.File(s"$out/_OK")
    if (okF.exists) return
    new java.io.File(out).mkdirs()
    val blown = Set("documents.parquet", "embeddings.parquet")
    val links =
      Option(new java.io.File(src).listFiles()).toSeq.flatten
        .filter(f => f.getName.endsWith(".parquet") && !blown(f.getName))
        .map(f => f.getName -> f.toPath.toAbsolutePath) ++
      blown.toSeq.sorted.map(n => n -> Paths.get(x10, n).toAbsolutePath)
    links.foreach { case (name, target) =>
      val l = Paths.get(out, name)
      if (!Files.exists(l, LinkOption.NOFOLLOW_LINKS))
        Files.createSymbolicLink(l, target): Unit
    }
    okF.createNewFile()
    ()
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the rollup_serve kernel measures the RollupMetadataAggregate
      // rewrite, which only exists under the extensions
      .config("spark.sql.extensions", classOf[graft.GraftExtensions].getName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sf01 = "/root/testdata/sf0.1"
    val x10 = "var/scale/x10"
    val x100 = "var/scale/x100"
    ensureBlowup(spark, sf01, x10, copies = 10, withEmbeddings = true)
    ensureFullLake(sf01, x10, "var/scale/x10full")
    // x100: one more decade of the growth curve — 500k docs / 200k
    // vectors — for the kernels cheap enough to run it: minhash,
    // decontam, span dedup, and the embedding near-dup kernel (whose
    // adaptive code width must absorb the decade: 200k vectors → 12-bit
    // codes, per-bucket occupancy held ≈constant).
    ensureBlowup(spark, sf01, x100, copies = 100, withEmbeddings = true)
    // x100full: the whole-LAKE view at 100× corpus (sf0.1 relational
    // tables beside the x100 documents/embeddings), so the corpus-query
    // subset of the full bench can run one decade deeper:
    // SPARK_GRAFT_SF_DIR=var/scale/x100full + SPARK_GRAFT_BENCH_ONLY.
    ensureFullLake(sf01, x100, "var/scale/x100full")

    // `runMain graft.tools.ScaleStress assemble` — build the blow-up
    // lakes only (for the x10full/x100full bench rows) without the
    // multi-tier kernel sweep + growth verdicts.
    if (args.headOption.contains("assemble")) { spark.stop(); return }

    // `runMain graft.tools.ScaleStress probe <kernel...>` — run ONLY the
    // named kernels at every tier (SCALE lines, no growth verdicts): the
    // selective form for timing one new kernel without paying the full
    // multi-tier sweep. Kernel names = the Stat.kernel strings.
    if (args.headOption.contains("probe")) {
      val wanted0 = args.drop(1).toSet
      // the rollup family runs on its own LAKE-replication tier axis
      // (lake1/lake10/lake100), not the document tiers below
      if (wanted0.contains("rollup"))
        for ((tier, copies) <- RollupTiers;
             st <- ScaleProbe.rollupFamily(spark, tier, copies))
          println(s"SCALE ${st.json}")
      // the compaction family runs on the FRAGMENTATION tier axis
      if (wanted0.contains("compact"))
        for ((tier, frag) <- CompactTiers;
             st <- ScaleProbe.lakeCompact(spark, tier, frag))
          println(s"SCALE ${st.json}")
      // file-grain zone skipping runs on the FILES-PER-PARTITION axis
      if (wanted0.contains("fileskip"))
        for ((tier, bands) <- FileSkipTiers;
             st <- ScaleProbe.fileSkip(spark, tier, bands))
          println(s"SCALE ${st.json}")
      // export maintenance runs on the FILES-PER-SHARD (append-tick) axis
      if (wanted0.contains("exportmaint"))
        for ((tier, slices) <- ExportMaintTiers;
             st <- ScaleProbe.exportMaintenance(spark, sf01, tier, slices))
          println(s"SCALE ${st.json}")
      // clustered compaction runs on the LAKE-size axis (twin lakes)
      if (wanted0.contains("zcluster"))
        for ((tier, copies) <- ZClusterTiers;
             st <- ScaleProbe.zCluster(spark, tier, copies))
          println(s"SCALE ${st.json}")
      // bloom membership skipping runs on the FILES-PER-PARTITION axis
      if (wanted0.contains("bloomskip"))
        for ((tier, bands) <- FileSkipTiers;
             st <- ScaleProbe.bloomSkip(spark, tier, bands))
          println(s"SCALE ${st.json}")
      // native-parquet bloom ROW-GROUP skipping runs on the
      // row-groups-per-file axis (single kept file, twin on/off)
      if (wanted0.contains("bloomrg"))
        for ((tier, mult) <- BloomRgTiers;
             st <- ScaleProbe.bloomRowGroups(spark, tier, mult))
          println(s"SCALE ${st.json}")
      val wanted =
        wanted0 - "rollup" - "compact" - "fileskip" - "exportmaint" -
          "zcluster" - "bloomskip" - "bloomrg"
      if (wanted.isEmpty && wanted0.subsetOf(
          Set("rollup", "compact", "fileskip", "exportmaint", "zcluster",
            "bloomskip", "bloomrg"))) {
        spark.stop(); return
      }
      val probes: Map[String, (SparkSession, String, String) => ScaleProbe.Stat] = Map(
        "minhash_lsh" -> (ScaleProbe.minhash _),
        "simhash" -> (ScaleProbe.simhash _),
        "embed_lsh" -> (ScaleProbe.embed _),
        "components" -> (ScaleProbe.components _),
        "decontam" -> (ScaleProbe.decontam _),
        "span_dedup" -> (ScaleProbe.spans _),
        "incremental" -> (ScaleProbe.incremental _),
        "incr_spans" -> (ScaleProbe.incrementalSpans _),
        "semantic_decontam" -> (ScaleProbe.semantic _),
        "imagehash" -> (ScaleProbe.imagehash _),
        "export_shards" -> (ScaleProbe.exportSink _))
      val unknown = wanted.diff(probes.keySet)
      require(unknown.isEmpty, s"unknown kernels: $unknown (have: ${probes.keys.mkString(",")})")
      for ((tier, dir) <- Seq("sf0.01" -> "/root/testdata/sf0.01",
             "sf0.1" -> sf01, "x10" -> x10, "x100" -> x100);
           k <- wanted.toSeq.sorted)
        println(s"SCALE ${probes(k)(spark, dir, tier).json}")
      spark.stop(); return
    }

    val stats =
      Seq("sf0.01" -> "/root/testdata/sf0.01", "sf0.1" -> sf01, "x10" -> x10)
        .flatMap { case (tier, dir) =>
          val ss = ScaleProbe.all(spark, dir, tier)
          ss.foreach(st => println(s"SCALE ${st.json}"))
          ss
        } ++ {
        val ss = Seq(ScaleProbe.minhash(spark, x100, "x100"),
          ScaleProbe.decontam(spark, x100, "x100"),
          ScaleProbe.spans(spark, x100, "x100"),
          ScaleProbe.embed(spark, x100, "x100"),
          ScaleProbe.incremental(spark, x100, "x100"),
          ScaleProbe.incrementalSpans(spark, x100, "x100"),
          // affordable at x100 since the block-triple multi-index:
          // candidates track true pair mass, not n²/buckets
          ScaleProbe.simhash(spark, x100, "x100"),
          ScaleProbe.semantic(spark, x100, "x100"),
          ScaleProbe.imagehash(spark, x100, "x100"),
          ScaleProbe.exportSink(spark, x100, "x100"))
        ss.foreach(st => println(s"SCALE ${st.json}"))
        ss
      }

    // the rollup family's lake-tier ladder (its kernels carry their own
    // exactness requires; a rewrite that declines or an audit flag at 0
    // aborts the sweep rather than printing a flattering number)
    val rollupStats = RollupTiers.flatMap { case (tier, copies) =>
      val ss = ScaleProbe.rollupFamily(spark, tier, copies)
      ss.foreach(st => println(s"SCALE ${st.json}"))
      ss
    }

    // the compaction family's fragmentation ladder (row-equality and
    // files-merged requires live inside the kernel); its frag* tier
    // names are outside every verdict window on purpose — the axis
    // varies FILE COUNT at constant data, so candidate-growth bounds
    // keyed to input growth don't apply
    CompactTiers.foreach { case (tier, frag) =>
      ScaleProbe.lakeCompact(spark, tier, frag)
        .foreach(st => println(s"SCALE ${st.json}"))
    }

    // file-grain zone skipping along the FILES-PER-PARTITION axis (same
    // outside-the-verdict-window posture as the fragmentation ladder:
    // the axis varies file count at constant data; the kernel carries
    // its own row-equality + fewer-files requires)
    FileSkipTiers.foreach { case (tier, bands) =>
      ScaleProbe.fileSkip(spark, tier, bands)
        .foreach(st => println(s"SCALE ${st.json}"))
    }

    // growth verdicts between consecutive tiers (each ~10× the last,
    // x10 -> x100 also structure-preserving); kernels not run at a tier
    // (vector kernels at x100) simply have no verdict row there
    var failed = false
    val allStats = stats ++ rollupStats
    for (Seq(lo, hi) <- (Seq("sf0.01", "sf0.1", "x10", "x100").sliding(2) ++
           RollupTiers.map(_._1).sliding(2)).toSeq) {
      val a = allStats.filter(_.tier == lo)
      val b = allStats.filter(_.tier == hi)
      for (sa <- a; sb <- b if sa.kernel == sb.kernel) {
        val inRatio = sb.nInput.toDouble / sa.nInput
        val outRatio = sb.nOutput.toDouble / math.max(1, sa.nOutput)
        val candRatio = sb.nCandidates.toDouble / math.max(1, sa.nCandidates)
        // Sub-quadratic bound: candidates may track corpus size (linear)
        // or the TRUE pair structure (the sf0.01→sf0.1 driver corpora are
        // different distributions — sf0.1 carries ~95× the true simhash
        // pairs, and a candidate set that tracks real duplicate mass is
        // the design goal, not a failure). The quadratic failure mode —
        // candidates ∝ n² regardless of structure — exceeds this bound
        // immediately (it would be ×100 on the structure-preserving
        // sf0.1→x10 blow-up, where outRatio ≈ inRatio ≈ 10). 3× slack
        // covers bucket-occupancy noise and the log-factor from the
        // corpus-adaptive LSH code width.
        val bound = math.max(inRatio, outRatio) * 3
        val ok = candRatio <= bound
        if (!ok) failed = true
        println(f"GROWTH ${sa.kernel}%-12s $lo->$hi input×$inRatio%.1f " +
          f"output×$outRatio%.1f candidates×$candRatio%.1f (bound $bound%.1f) " +
          f"secs ${sa.secs}%.2f->${sb.secs}%.2f ${if (ok) "PASS" else "FAIL"}")
      }
    }
    spark.stop()
    if (failed) sys.exit(1)
  }
}
