package graft.pipeline

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ingest._
import graft.plans.RollupMetadataAggregate

/** [[graft.plans.RollupMetadataAggregate]]: a servable partition-grain
  * aggregate over a rollup-maintained lake must be answered from the
  * metadata partials — same rows, rollup scan instead of lake scan —
  * and every non-servable shape must leave the plan untouched. */
class RollupRewriteSpec extends AnyFunSuite {
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

  /** 3-tick drained lake, 3 partitions (the RollupSpec fixture). */
  private def drainedLake(): LakeLayout = {
    val lay = LakeLayout(Files.createTempDirectory("graft-rrw").toString)
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
    new BatchProcessor(spark, lay, Contracts.events, batchSize = 2).runUntilDrained()
    lay
  }

  /** Second session over the shared context carrying the extension
    * (the GraftExtensionsSpec pattern — `spark.sql.extensions` is a
    * static conf, `withExtensions` is the in-JVM equivalent). */
  private def withExtendedSession[T](f: SparkSession => T): T = {
    val base = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try f(SparkSession.builder()
      .withExtensions(new graft.GraftExtensions().apply(_))
      .getOrCreate())
    finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  /** Root paths of every parquet relation left in the optimized plan. */
  private def scanRoots(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Seq.empty
      }
    }.flatten

  private def assertServed(df: DataFrame): Unit = {
    val roots = scanRoots(df)
    assert(roots.exists(_.contains("/rollup")), s"not rewritten, scans: $roots")
    assert(!roots.exists(_.contains("/curated")), s"lake scan survived: $roots")
  }

  private def assertUntouched(df: DataFrame): Unit = {
    val roots = scanRoots(df)
    assert(roots.exists(_.contains("/curated")), s"lake scan missing: $roots")
    assert(!roots.exists(_.contains("/rollup")), s"unexpected rewrite: $roots")
  }

  private def servable(s: SparkSession, lay: LakeLayout): DataFrame =
    CuratedWriter.read(s, lay.curatedDir)
      .filter(col("year") === 2024 && col("day").between(7, 8))
      .groupBy("year", "month", "day", "mode")
      .agg(count(lit(1)).as("n_rows"), count(col("value")).as("n_value"),
        min(col("event_time_utc")).as("first_ts"),
        max(col("event_time_utc")).as("last_ts"))
      .orderBy("year", "month", "day", "mode")

  // ---- the REGISTERED contract queries, not paraphrases: round-14's
  // q111 failed analysis on its FIRST execution anywhere because the
  // spec tested a same-shaped rebuild instead of the query itself.
  // These run SparkEntry.queries verbatim under the extended session.

  private val sfDir = "/root/testdata/sf0.001"

  test("the registered q111_metadata_agg executes, is served from rollup, matches direct") {
    val want = graft.SparkEntry.queries("q111_metadata_agg")(spark, sfDir).collect().toSeq
    assert(want.nonEmpty)
    withExtendedSession { s =>
      val df = graft.SparkEntry.queries("q111_metadata_agg")(s, sfDir)
      assertServed(df)
      assert(df.collect().toSeq == want, "served q111 != direct q111")
    }
  }

  test("the registered q115_compacted_lake SCANS the compacted files, never the partials") {
    // q115 proves the compacted DATA is exact — an answer served from
    // the rollup partials would verify the metadata instead, silently.
    // Its countDistinct(source_file) is a documented decline, so the
    // optimized plan must keep the curated scan.
    withExtendedSession { s =>
      val df = graft.SparkEntry.queries("q115_compacted_lake")(s, sfDir)
      val roots = scanRoots(df)
      assert(roots.exists(_.contains("/curated")) && !roots.exists(_.contains("/rollup")),
        s"q115 must read the lake, got scans: $roots")
      assert(df.collect().nonEmpty)
    }
  }

  test("the registered q112_metadata_value serves its metadata side, matches direct") {
    val want = graft.SparkEntry.queries("q112_metadata_value")(spark, sfDir).collect().toSeq
    assert(want.nonEmpty)
    withExtendedSession { s =>
      val df = graft.SparkEntry.queries("q112_metadata_value")(s, sfDir)
      val roots = scanRoots(df)
      assert(roots.exists(_.contains("/rollup")), s"served side not rewritten: $roots")
      assert(roots.count(_.contains("/curated")) == 1,
        s"exactly one lake scan (the exact countDistinct side) expected: $roots")
      assert(df.collect().toSeq == want, "served q112 != direct q112")
    }
  }

  test("the registered q113_metadata_global serves the global branch, matches direct") {
    val want = graft.SparkEntry.queries("q113_metadata_global")(spark, sfDir).collect().toSeq
    assert(want.nonEmpty)
    withExtendedSession { s =>
      val df = graft.SparkEntry.queries("q113_metadata_global")(s, sfDir)
      assertServed(df)
      assert(df.collect().toSeq == want, "served q113 != direct q113")
    }
  }

  test("e6 value sums and grouped HLL reach are served; raw sketch and global reach are not") {
    val lay = drainedLake()
    withExtendedSession { s =>
      def lake = CuratedWriter.read(s, lay.curatedDir)
      val e6 = lake.groupBy("mode")
        .agg(sum(round(col("value") * lit(1000000)).cast("long")).as("value_e6"))
        .orderBy("mode")
      assertServed(e6)
      assert(e6.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
        Seq(("eval", 5000000L), ("training", 14625000L)))

      val reach = lake.groupBy("mode")
        .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
        .orderBy("mode")
      assertServed(reach)
      assert(reach.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
        Seq(("eval", 1L), ("training", 3L)))

      // raw sketch BYTES may differ between a direct sketch and a union
      // of partials — only the estimate shape is servable
      assertUntouched(lake.groupBy("mode")
        .agg(hll_sketch_agg(col("user_id")).as("sk")))
      // global reach: empty selection yields 0 direct but NULL from a
      // union over no partial rows — the swap would be observable
      assertUntouched(lake
        .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est")))
    }
  }

  test("a lake-shaped parquet copy beside the lake is never served whole-lake statistics") {
    val lay = drainedLake()
    // exact curated schema (year/month/day/mode restored as data
    // columns), placed under the lake root where the rollup sibling
    // exists — only the `curated` name pin keeps this from being
    // served the WHOLE lake's statistics
    val sampleDir = s"${lay.root}/curated-sample"
    CuratedWriter.read(spark, lay.curatedDir).limit(2).write.parquet(sampleDir)
    withExtendedSession { s =>
      val df = s.read.parquet(sampleDir)
        .groupBy("mode").agg(count(lit(1)).as("n"))
      val roots = scanRoots(df)
      assert(!roots.exists(_.contains("/rollup")),
        s"sample dir served whole-lake statistics: $roots")
      assert(df.collect().map(_.getLong(1)).sum == 2L)
    }
  }

  test("servable aggregate is served from the rollup and matches the lake answer") {
    val lay = drainedLake()
    val want = servable(spark, lay).collect().toSeq
    assert(want.nonEmpty)
    withExtendedSession { s =>
      val df = servable(s, lay)
      assertServed(df)
      assert(df.collect().toSeq == want, "rewritten answer != lake answer")
    }
  }

  test("global ungrouped count rewrites, and an empty selection still returns 0") {
    val lay = drainedLake()
    withExtendedSession { s =>
      val all = CuratedWriter.read(s, lay.curatedDir).agg(count(lit(1)).as("n"))
      assertServed(all)
      assert(all.collect().head.getLong(0) == 6L)

      val none = CuratedWriter.read(s, lay.curatedDir)
        .filter(col("year") === 1999).agg(count(lit(1)).as("n"))
      assertServed(none)
      assert(none.collect().head.getLong(0) == 0L, "empty selection must count 0, not null")
    }
  }

  test("distinct partition values are served from metadata") {
    val lay = drainedLake()
    withExtendedSession { s =>
      val df = CuratedWriter.read(s, lay.curatedDir)
        .select("year", "month", "day", "mode").distinct()
      assertServed(df)
      assert(df.count() == 3L)
    }
  }

  test("non-servable shapes keep the lake scan") {
    val lay = drainedLake()
    withExtendedSession { s =>
      def lake = CuratedWriter.read(s, lay.curatedDir)
      // a sum at a rounding scale the partials don't carry
      assertUntouched(lake.groupBy("mode")
        .agg(sum(round(col("value") * 100).cast("long")).as("c")))
      // grouping by a non-partition column
      assertUntouched(lake.groupBy("mode", "user_id").agg(count(lit(1)).as("n")))
      // a filter on a data column
      assertUntouched(lake.filter(col("value") > 1.0)
        .groupBy("mode").agg(count(lit(1)).as("n")))
      // DISTINCT aggregate
      assertUntouched(lake.groupBy("mode")
        .agg(countDistinct(col("source_file")).as("nf")))
      // count of a column the partials don't null-count
      assertUntouched(lake.groupBy("mode").agg(count(col("user_id")).as("n")))
      // approx_top_k: deliberately unservable even though the partials
      // carry frequency sketches — a merge of partial sketches only
      // equals a direct sketch while both stay under their (different)
      // capacities, so the swap could be observable (unlike the HLL
      // union, which is estimate-identical by construction)
      assertUntouched(lake.groupBy("mode")
        .agg(expr("approx_top_k(user_id, 5)").as("tk")))
    }
  }

  test("the serve rule fires on a compacted lake's snapshot-pinned read") {
    val lay = drainedLake()
    // compact the lake so CuratedWriter.read takes the PINNED-LISTING
    // path (explicit file roots + basePath) — the round-16 consumption
    // shape; the lake-identity test must recognize it or every
    // compacted lake silently loses the metadata serve
    val report = graft.ingest.Compactor.compact(spark, lay.curatedDir,
      maxFilesPerPartition = 0, sortCol = Some("event_time_utc"))
    assert(report.partitionsCompacted > 0, s"fixture never compacted: $report")
    val want = servable(spark, lay).collect().toSeq
    withExtendedSession { s =>
      val df = servable(s, lay)
      // the relation really is the pinned shape (multiple file roots)
      val multiRoot = df.queryExecution.analyzed.collect {
        case l: LogicalRelation => l.relation match {
          case fs: HadoopFsRelation => fs.location.rootPaths.size
          case _ => 0
        }
      }.sum
      assert(multiRoot > 1, "fixture regression: read was not pinned-listing")
      assertServed(df)
      assert(df.collect().toSeq == want, "served answer diverges on the pinned read")
    }
  }

  test("a partition-subtree or file-subset basePath read is never served whole-lake stats") {
    val lay = drainedLake()
    withExtendedSession { s =>
      // subtree read: no Filter in the plan — the restriction lives in
      // the LISTING, so a whole-lake rewrite would be silently wrong
      // (round-20 fix: the basePath shape requires the listed roots to
      // equal the lake's live file set)
      val subtree = s.read.option("basePath", lay.curatedDir)
        .parquet(s"${lay.curatedDir}/year=2024/month=3/day=7")
        .groupBy("mode").agg(count(lit(1)).as("n"))
      assertUntouched(subtree)
      assert(subtree.collect().map(_.getLong(1)).sum == 3L,
        "subtree read must count only the subtree's rows")

      // file-subset read: same hole, file-shaped roots
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new org.apache.hadoop.fs.Path(lay.curatedDir).toUri,
        s.sparkContext.hadoopConfiguration)
      val one = LakeSnapshot.liveFiles(fs,
        fs.makeQualified(new org.apache.hadoop.fs.Path(lay.curatedDir)))
        .map(_.getPath.toString).sorted.take(1)
      val subset = s.read.option("basePath", lay.curatedDir).parquet(one: _*)
        .groupBy("mode").agg(count(lit(1)).as("n"))
      assertUntouched(subset)
      assert(subset.collect().map(_.getLong(1)).sum < 6L,
        "file-subset read must not see the whole lake")
    }
  }

  test("approx_top_k serves from the stored sketches ONLY under the explicit opt-in flag") {
    val lay = drainedLake()
    def q(s: SparkSession) = CuratedWriter.read(s, lay.curatedDir)
      .groupBy("year", "month", "mode")
      .agg(expr("approx_top_k(user_id, 3)").as("top"))
    // tie-stable normalization: the sketch orders equal-count items
    // arbitrarily, so compare the (group, item, count) SET, not the
    // array order
    def norm(df: DataFrame): Seq[String] = df
      .select(col("year"), col("month"), col("mode"), explode(col("top")).as("e"))
      .select(col("year"), col("month"), col("mode"),
        col("e.item").cast("long"), col("e.count").cast("long"))
      .collect().map(_.toString).sorted.toSeq
    val want = norm(q(spark)) // ground truth, no extensions
    withExtendedSession { s =>
      // default OFF: the exactness contract holds, plan untouched
      assertUntouched(q(s))
      s.conf.set(RollupMetadataAggregate.ApproxServeKey, "true")
      try {
        val served = q(s)
        assertServed(served)
        // at this cardinality (≪ capacity) the served sketch fold is
        // EXACT, so the opted-in answer equals the direct one
        assert(norm(served) == want, "served approx_top_k != direct at sub-capacity scale")
        // the opt-in never loosens the other guards: k above the stored
        // capacity cannot be served (the stored sketches only track
        // TopKCapacity items)
        assertUntouched(CuratedWriter.read(s, lay.curatedDir)
          .groupBy("mode")
          .agg(expr(s"approx_top_k(user_id, ${graft.ingest.Rollup.TopKCapacity * 2})")
            .as("tk")))
        // global (ungrouped) stays declined — empty-selection shape
        assertUntouched(CuratedWriter.read(s, lay.curatedDir)
          .agg(expr("approx_top_k(user_id, 3)").as("tk")))
      } finally s.conf.unset(RollupMetadataAggregate.ApproxServeKey)
    }
  }

  test("a lake without a rollup store, and a disabled conf, are left untouched") {
    val lay = drainedLake()
    withExtendedSession { s =>
      s.conf.set(RollupMetadataAggregate.EnabledKey, "false")
      try assertUntouched(servable(s, lay))
      finally s.conf.unset(RollupMetadataAggregate.EnabledKey)

      def deleteRec(f: File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(deleteRec)
        f.delete(): Unit
      }
      deleteRec(new File(lay.rollupDir))
      assertUntouched(servable(s, lay))
    }
  }
}
