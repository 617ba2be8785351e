package graft.pipeline

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ingest._

/** The incrementally-maintained rollup ([[graft.ingest.Rollup]]) must
  * equal a direct recompute over the curated lake after EVERY runner
  * path and failure mode: multi-tick ledger drains, the publish-crash
  * window, partial-row duplication, compaction (clean and crashed),
  * and the streaming twin. The HLL user sketch must merge losslessly
  * (merged estimate == whole-lake sketch estimate). */
class RollupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeLines(path: String, lines: Seq[String]): Unit = {
    val p = Paths.get(path)
    Files.createDirectories(p.getParent)
    Files.write(p, lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8)): Unit
  }

  private def rec(id: String, ts: String, mode: String, user: Long, value: Double): String =
    s"""{"id":"$id","event_timestamp":"$ts","MODE":"$mode",""" +
      s""""metadata":{"app_version":"2.4.1","user_agent":"svc/1.0","user_id":$user},""" +
      s""""payload":{"transaction_id":"t-$id","value":$value,"props":"{\\"k\\":1}"}}"""

  private def freshLake(): LakeLayout =
    LakeLayout(Files.createTempDirectory("graft-rollup").toString)

  /** Ground truth, recomputed from the curated lake itself — the scan
    * the rollup exists to avoid. Includes the whole-lake HLL estimate,
    * which the merged per-file sketches must reproduce EXACTLY
    * (register-wise max is associative: same input set, same registers,
    * same estimate). */
  private def recompute(lay: LakeLayout): DataFrame =
    CuratedWriter.read(spark, lay.curatedDir)
      .groupBy("year", "month", "day", "mode")
      .agg(
        countDistinct(col("source_file")).as("n_files"),
        count(lit(1)).as("n_rows"),
        count(col("value")).as("n_value"),
        sum(round(col("value") * lit(1000000)).cast("long")).as("value_e6"),
        min(col("event_time_utc")).as("min_ts"),
        max(col("event_time_utc")).as("max_ts"),
        coalesce(hll_sketch_estimate(hll_sketch_agg(col("user_id"))), lit(0L))
          .as("n_users_est"))

  private def assertStatsMatch(lay: LakeLayout, clue: String): Unit = {
    val cols = Seq("year", "month", "day", "mode", "n_files", "n_rows",
      "n_value", "value_e6", "min_ts", "max_ts", "n_users_est")
    val got = Rollup.stats(spark, lay.rollupDir)
      .select(cols.map(col): _*).orderBy("year", "month", "day", "mode")
      .collect().toSeq
    val want = recompute(lay)
      .select(cols.map(col): _*).orderBy("year", "month", "day", "mode")
      .collect().toSeq
    assert(got == want, s"$clue: rollup != lake recompute\n got: $got\nwant: $want")
  }

  /** 3 ticks (batchSize=2, 5 files), 3 partitions, users spread so the
    * distinct count differs from the row count. */
  private def drainedLake(): LakeLayout = {
    val lay = freshLake()
    writeLines(s"${lay.rawDir}/a.jsonl", Seq(
      rec("a-1", "2024-03-07 10:00:00.000000", "training", 1L, 1.25),
      rec("a-2", "2024-03-07 11:00:00.000000", "training", 2L, 2.5)))
    writeLines(s"${lay.rawDir}/b.jsonl", Seq(
      rec("b-1", "2024-03-07 12:00:00.000000", "training", 1L, 0.75),
      rec("b-2", "2024-03-08 09:00:00.000000", "eval", 3L, 4.0)))
    writeLines(s"${lay.rawDir}/c.jsonl", Seq(
      rec("c-1", "2024-03-08 10:30:00.000000", "eval", 3L, 1.0)))
    writeLines(s"${lay.rawDir}/d.jsonl", Seq(
      rec("d-1", "2024-03-09 08:00:00.000000", "training", 4L, 10.125)))
    writeLines(s"${lay.rawDir}/e.jsonl", Seq(
      rec("e-1", "2024-03-07 23:59:59.000000", "training", 5L, 3.125)))
    new BatchProcessor(spark, lay, Contracts.events, batchSize = 2).runUntilDrained()
    lay
  }

  test("multi-tick ledger drain: merged rollup equals a direct lake recompute") {
    val lay = drainedLake()
    // one partial dir per published batch (3 ticks)
    val dirs = new File(lay.rollupDir).listFiles().filter(_.isDirectory)
    assert(dirs.length == 3, s"expected one rollup dir per tick, got ${dirs.map(_.getName).toSeq}")
    assertStatsMatch(lay, "after drain")
    // the metadata really is per file × partition: b.jsonl spans two
    // partitions, so 6 partial rows for 5 files
    val partials = spark.read.option("recursiveFileLookup", "true").parquet(lay.rollupDir)
    assert(partials.count() == 6)
  }

  test("duplicated partial dirs (crashed fold / double publish) are absorbed by the per-file collapse") {
    val lay = drainedLake()
    val dirs = new File(lay.rollupDir).listFiles().filter(_.isDirectory)
    val victim = dirs.minBy(_.getName)
    // simulate the worst crash artifact: a full byte-copy of one batch
    // dir under a different name
    def copyRec(src: File, dst: File): Unit =
      if (src.isDirectory) {
        dst.mkdirs(); src.listFiles().foreach(c => copyRec(c, new File(dst, c.getName)))
      } else Files.copy(src.toPath, dst.toPath): Unit
    copyRec(victim, new File(lay.rollupDir, "twin-" + victim.getName))
    assertStatsMatch(lay, "with a duplicated batch dir")
  }

  test("compaction folds batch dirs without changing the answer; a crashed fold's leftovers are safe") {
    val lay = drainedLake()
    assert(Rollup.compact(spark, lay.rollupDir, maxBatchDirs = 0))
    val afterDirs = new File(lay.rollupDir).listFiles()
      .filter(f => f.isDirectory && !f.getName.startsWith("."))
    assert(afterDirs.length == 1 && afterDirs.head.getName.startsWith("merged-"))
    assertStatsMatch(lay, "after compaction")
    // crashed fold: merged renamed in but one source survived — twins
    // only, stats unchanged; the NEXT fold sweeps both
    def copyRec(src: File, dst: File): Unit =
      if (src.isDirectory) {
        dst.mkdirs(); src.listFiles().foreach(c => copyRec(c, new File(dst, c.getName)))
      } else Files.copy(src.toPath, dst.toPath): Unit
    copyRec(afterDirs.head, new File(lay.rollupDir, "run-leftover"))
    assertStatsMatch(lay, "after a simulated crashed fold")
    assert(Rollup.compact(spark, lay.rollupDir, maxBatchDirs = 1))
    assertStatsMatch(lay, "after the healing fold")
    // below threshold → no-op
    assert(!Rollup.compact(spark, lay.rollupDir, maxBatchDirs = 1))
  }

  test("publish-crash window: a batch recovered from .ready publishes its partials exactly once") {
    val lay = freshLake()
    writeLines(s"${lay.rawDir}/ok.jsonl", Seq(
      rec("p-1", "2024-03-07 10:00:00.000000", "training", 1L, 1.25),
      rec("p-2", "2024-03-07 11:00:00.000000", "training", 2L, 2.5)))
    // block the marker write AFTER the staged commit (the IngestSpec
    // crash harness): rows publish, partials publish, tick fails at
    // markers, .ready awaits recovery
    writeLines(s"${lay.root}/curated-markers", Seq("blocker"))
    val bp = new BatchProcessor(spark, lay, Contracts.events, batchSize = 2, maxRetries = 5)
    bp.runOnce()
    assertStatsMatch(lay, "after the marker-write crash")
    Files.delete(Paths.get(s"${lay.root}/curated-markers"))
    bp.runUntilDrained()
    // recovery + retry must not have double-published the partials
    assertStatsMatch(lay, "after recovery")
    assert(Rollup.stats(spark, lay.rollupDir)
      .agg(sum("n_rows")).collect().head.getLong(0) == 2L)
  }

  test("streaming twin: the micro-batch runner's rollup equals the lake recompute") {
    val lay = freshLake()
    writeLines(s"${lay.rawDir}/s1.jsonl", Seq(
      rec("s-1", "2024-03-07 10:00:00.000000", "training", 1L, 1.25),
      rec("s-2", "2024-03-08 10:00:00.000000", "eval", 2L, 2.5)))
    writeLines(s"${lay.rawDir}/s2.jsonl", Seq(
      rec("s-3", "2024-03-07 12:00:00.000000", "training", 1L, 0.5)))
    graft.streaming.StreamingIngest.runAvailableNow(spark, lay, Contracts.events,
      maxFilesPerTrigger = Some(1))
    assertStatsMatch(lay, "streaming drain")
    // late files: a second drain folds forward, not over
    writeLines(s"${lay.rawDir}/s3.jsonl", Seq(
      rec("s-4", "2024-03-09 09:00:00.000000", "training", 3L, 7.0)))
    graft.streaming.StreamingIngest.runAvailableNow(spark, lay, Contracts.events,
      maxFilesPerTrigger = Some(1))
    assertStatsMatch(lay, "streaming second drain")
    // the streaming-published frequency sketches fold exactly too: the
    // q117 shape works unchanged on a lake the streaming runner wrote
    val folded = Rollup.stats(spark, lay.rollupDir)
      .agg(Rollup.topKCombine("top_users").as("sk"))
      .select(explode(Rollup.topKEstimate("sk")).as("e"))
      .select(col("e.item").cast("long"), col("e.count").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exactCounts = CuratedWriter.read(spark, lay.curatedDir)
      .groupBy("user_id").agg(count(lit(1)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(folded == exactCounts,
      s"streaming-published sketches diverged: $folded vs $exactCounts")
  }

  test("reconcile certifies a drained lake and flags a tampered partial, on both grains") {
    val lay = drainedLake()
    val flagCols = Seq("rows_match", "value_match", "value_e6_match",
      "files_match", "reach_ok")
    def flags() = Rollup.reconcile(spark, lay.curatedDir, lay.rollupDir)
      .orderBy("year", "month", "mode").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2)) ->
        flagCols.zipWithIndex.map { case (c, i) => c -> r.getInt(8 + i) }.toMap)
      .toMap

    val clean = flags()
    // month rows for both modes plus the global row, every flag green
    assert(clean.keySet == Set((0, 0, "ALL"), (2024, 3, "training"), (2024, 3, "eval")),
      s"unexpected grains: ${clean.keySet}")
    assert(clean.values.forall(_.values.forall(_ == 1)), s"clean lake not green: $clean")

    // tamper: rewrite one partial's n_rows (+1) — the audit must flag
    // the victim partition's row count at month AND global grain while
    // the untouched stats stay green
    val victimDir = new File(lay.rollupDir).listFiles()
      .filter(_.isDirectory).minBy(_.getName)
    val rows = spark.read.parquet(victimDir.toString)
    val mode = rows.orderBy("source_file", "year", "month", "day", "mode")
      .select("mode").collect().head.getString(0)
    val tampered = rows.withColumn("n_rows",
      when(col("mode") === mode, col("n_rows") + 1L).otherwise(col("n_rows")))
    val tmp = new File(victimDir.getParentFile, ".tamper")
    tampered.write.mode("overwrite").parquet(tmp.toString)
    def deleteRec(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(deleteRec)
      f.delete(): Unit
    }
    deleteRec(victimDir)
    assert(tmp.renameTo(victimDir))

    val dirty = flags()
    assert(dirty((2024, 3, mode))("rows_match") == 0, s"month grain missed the tamper: $dirty")
    assert(dirty((0, 0, "ALL"))("rows_match") == 0, s"global grain missed the tamper: $dirty")
    // the untampered statistics are still certified
    assert(dirty((2024, 3, mode))("value_e6_match") == 1)
    assert(dirty.filter { case (k, _) => k._3 != mode && k._3 != "ALL" }
      .values.forall(_.values.forall(_ == 1)), s"innocent rows flagged: $dirty")
  }

  test("reconcile surfaces a lost batch as a one-sided mismatch, not a dropped row") {
    val lay = drainedLake()
    // delete one batch's partials wholesale — the lake has rows the
    // rollup never saw; the full-outer join must keep the partition
    // visible with its exact stats and flags at 0
    val victim = new File(lay.rollupDir).listFiles().filter(_.isDirectory).minBy(_.getName)
    def deleteRec(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(deleteRec)
      f.delete(): Unit
    }
    deleteRec(victim)
    val out = Rollup.reconcile(spark, lay.curatedDir, lay.rollupDir)
      .orderBy("year", "month", "mode").collect()
    assert(out.exists(r => r.getInt(8) == 0), s"lost batch not flagged: ${out.toSeq}")
    // exact lake-side stats still reported on every row (never nulled)
    assert(out.forall(r => r.getLong(3) > 0L), s"exact stats dropped: ${out.toSeq}")
  }

  test("reconcile on a lake with no rollup at all audits divergent instead of throwing") {
    val lay = drainedLake()
    def deleteRec(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(deleteRec)
      f.delete(): Unit
    }
    deleteRec(new File(lay.rollupDir))
    val out = Rollup.reconcile(spark, lay.curatedDir, lay.rollupDir)
      .orderBy("year", "month", "mode").collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getInt(8) == 0), s"missing rollup not flagged: ${out.toSeq}")
    assert(out.forall(r => r.getLong(3) > 0L), "exact stats must still report")
  }

  test("HLL user sketches merge losslessly and estimate accurately at spread cardinality") {
    val lay = freshLake()
    // 40 rows, 25 distinct users, spread over 4 files × 2 partitions
    (0 until 4).foreach { f =>
      writeLines(s"${lay.rawDir}/u$f.jsonl", (0 until 10).map { i =>
        val user = (f * 10 + i) % 25
        val mode = if (i % 2 == 0) "training" else "eval"
        rec(s"u$f-$i", s"2024-03-0${f + 1} 0$i:00:00.000000", mode, user.toLong, 1.0)
      })
    }
    new BatchProcessor(spark, lay, Contracts.events, batchSize = 2).runUntilDrained()
    assertStatsMatch(lay, "HLL lake") // includes merged-vs-direct estimate equality
    val est = Rollup.stats(spark, lay.rollupDir)
      .agg(coalesce(hll_sketch_estimate(hll_union_agg(col("users_hll"))), lit(0L)))
    // the global fold across partitions also matches a direct global sketch
    val direct = CuratedWriter.read(spark, lay.curatedDir)
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))))
    assert(est.collect().head.getLong(0) == direct.collect().head.getLong(0),
      "global HLL fold diverged from the direct whole-lake sketch")
    val exact = CuratedWriter.read(spark, lay.curatedDir)
      .agg(countDistinct("user_id")).collect().head.getLong(0)
    val got = direct.collect().head.getLong(0)
    assert(math.abs(got - exact).toDouble / exact <= 0.05,
      s"HLL estimate $got too far from exact $exact")
  }

  test("top_users frequency sketches fold to EXACT per-user counts below capacity") {
    val lay = freshLake()
    // 40 rows / 25 users spread over 4 files × 2 partitions: every user
    // well under TopKCapacity, so the fold must be exact, not bounded
    (0 until 4).foreach { f =>
      writeLines(s"${lay.rawDir}/u$f.jsonl", (0 until 10).map { i =>
        val user = (f * 10 + i) % 25
        val mode = if (i % 2 == 0) "training" else "eval"
        rec(s"u$f-$i", s"2024-03-0${f + 1} 0$i:00:00.000000", mode, user.toLong, 1.0)
      })
    }
    new BatchProcessor(spark, lay, Contracts.events, batchSize = 2).runUntilDrained()
    def asMap(df: DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val folded = asMap(Rollup.stats(spark, lay.rollupDir)
      .agg(Rollup.topKCombine("top_users").as("sk"))
      .select(explode(Rollup.topKEstimate("sk")).as("e"))
      .select(col("e.item").cast("long"), col("e.count").cast("long")))
    val exactCounts = asMap(CuratedWriter.read(spark, lay.curatedDir)
      .groupBy("user_id").agg(count(lit(1))))
    assert(folded == exactCounts,
      s"folded frequency sketch diverged from exact counts: $folded vs $exactCounts")
    // per-mode fold from the SAME per-partition sketches (fold-further)
    val trainFolded = asMap(Rollup.stats(spark, lay.rollupDir)
      .filter(col("mode") === "training")
      .agg(Rollup.topKCombine("top_users").as("sk"))
      .select(explode(Rollup.topKEstimate("sk")).as("e"))
      .select(col("e.item").cast("long"), col("e.count").cast("long")))
    val trainExact = asMap(CuratedWriter.read(spark, lay.curatedDir)
      .filter(col("mode") === "training")
      .groupBy("user_id").agg(count(lit(1))))
    assert(trainFolded == trainExact)
  }

  test("a pre-sketch rollup store (no top_users column) still folds: stats and reconcile green") {
    val lay = drainedLake()
    // rewrite every batch dir WITHOUT the top_users column — the store
    // layout a pre-upgrade pipeline left behind
    val dirs = new File(lay.rollupDir).listFiles().filter(_.isDirectory)
    dirs.foreach { d =>
      val stripped = spark.read.parquet(d.toString).drop("top_users")
      val tmp = new File(d.getParentFile, s".legacy-${d.getName}")
      stripped.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      def deleteRec(f: File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(deleteRec)
        f.delete(): Unit
      }
      deleteRec(d)
      assert(tmp.renameTo(d))
    }
    assertStatsMatch(lay, "legacy store")
    val flags = Rollup.reconcile(spark, lay.curatedDir, lay.rollupDir)
      .select("rows_match", "value_match", "value_e6_match", "files_match", "reach_ok")
      .collect()
    assert(flags.nonEmpty && flags.forall(r => (0 until 5).forall(i => r.getInt(i) == 1)))
    // the heavy-hitters fold on a legacy store degrades to empty, not an error
    val hh = Rollup.stats(spark, lay.rollupDir)
      .agg(Rollup.topKCombine("top_users").as("sk"))
      .select(explode(Rollup.topKEstimate("sk")).as("e"))
    assert(hh.collect().isEmpty)
  }
}
