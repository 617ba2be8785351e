package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** [[ZCluster]] + `Compactor.clusterCols`: the interleaved rewrite must
  * (a) leave row content bit-identical, (b) narrow file-grain zone
  * windows on EVERY clustered column so both window shapes drop files
  * — where the single-`sortCol` rewrite provably cannot drop any on
  * the non-sort column — and (c) degrade safely when cluster columns
  * are unusable (strings, all-null) instead of failing the swap. */
class ZClusterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** One-partition curated lake: `n` rows whose user_id and event time
    * are uniform and DECORRELATED (two coprime strides), appended as 4
    * files that each span the full range of both columns — the layout
    * ingest naturally produces, where neither column can prune files. */
  private def seededLake(n: Int = 512): String = {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-zc").toString
    val rows = (0 until n).map { i =>
      val minute = (i * 27) % n
      val uid = ((i * 13) % n).toLong
      (s"seed-${i % 4}", uid, f"u$uid%04d",
        f"2024-03-07 ${minute / 60}%02d:${minute % 60}%02d:00", i.toDouble, i % 4)
    }
    // tag: a zero-padded id STRING (binary order == numeric order),
    // decorrelated from event time exactly like user_id — the
    // string-window clustering fixture
    val df = rows.toDF("source_file", "user_id", "tag", "ts_s", "value", "seed")
      .withColumn("event_time_utc", col("ts_s").cast("timestamp_ntz"))
      .drop("ts_s")
      .withColumn("year", lit(2024)).withColumn("month", lit(3))
      .withColumn("day", lit(7)).withColumn("mode", lit("training"))
    for (p <- 0 until 4)
      df.filter(col("seed") === p).drop("seed").coalesce(1)
        .write.mode("append").partitionBy("year", "month", "day", "mode")
        .parquet(s"$root/curated")
    Rollup.writePartials(spark.read.parquet(s"$root/curated"), s"$root/rollup/b0")
    FileBounds.writeStaged(
      spark.read.parquet(s"$root/curated").select(col("*"), col("_metadata")),
      "", s"$root/filebounds/b0")
    graft.plans.RollupPartitionSkip.clearCache()
    root
  }

  private def leafBytes(root: String): Long =
    new java.io.File(s"$root/curated/year=2024/month=3/day=7/mode=training")
      .listFiles().filter(f => f.isFile && !f.getName.startsWith(".") &&
        !f.getName.startsWith("_")).map(_.length()).sum

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

  private def scannedFiles(df: DataFrame): Int = {
    val locations = df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation.asInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation].location
    }
    assert(locations.size == 1, s"expected one relation: $locations")
    locations.head.inputFiles.length
  }

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.select("source_file", "user_id", "value", "event_time_utc")
      .collect().map(_.toSeq.toVector).toSeq.sortBy(_.mkString("|"))

  private def compactWith(root: String, cluster: Seq[String]): Unit = {
    val r = Compactor.compact(spark, s"$root/curated",
      maxFilesPerPartition = 1, targetBytesPerFile = (leafBytes(root) + 3) / 4,
      sortCol = Some("event_time_utc"), clusterCols = cluster)
    assert(r.partitionsCompacted == 1)
    Compactor.sweepRetired(spark, s"$root/curated"): Unit
    graft.plans.RollupPartitionSkip.clearCache()
  }

  test("z-clustered compaction drops files for BOTH window shapes; sort-only cannot; rows identical") {
    val zRoot = seededLake()
    val sRoot = seededLake()
    val want = sortedRows(spark.read.parquet(s"$zRoot/curated"))

    compactWith(zRoot, Seq("event_time_utc", "user_id"))
    compactWith(sRoot, Seq.empty)

    // content identity under the z layout (and under the sort layout)
    assert(sortedRows(spark.read.parquet(s"$zRoot/curated")) == want,
      "z-clustered rewrite changed row content")
    assert(sortedRows(spark.read.parquet(s"$sRoot/curated")) == want,
      "sorted rewrite changed row content")

    // top-quarter windows on each clustered column: z layout must drop
    // at least one file for BOTH; the time-sorted twin must drop for
    // time but CANNOT drop for user (every file spans the full range)
    def userQ(s: SparkSession, root: String) =
      CuratedWriter.read(s, s"$root/curated").filter(col("user_id") >= lit(384L))
    def tsQ(s: SparkSession, root: String) =
      CuratedWriter.read(s, s"$root/curated")
        .filter(col("event_time_utc") >=
          lit("2024-03-07 06:24:00").cast("timestamp_ntz"))
    val wantUser = sortedRows(userQ(spark, zRoot))
    val wantTs = sortedRows(tsQ(spark, zRoot))
    assert(wantUser.nonEmpty && wantTs.nonEmpty)
    withExtendedSession { s =>
      val zTotal = CuratedWriter.read(s, s"$zRoot/curated").inputFiles.length
      val sTotal = CuratedWriter.read(s, s"$sRoot/curated").inputFiles.length
      assert(zTotal >= 3 && sTotal >= 3,
        s"rewrites produced too few files to measure pruning ($zTotal, $sTotal)")
      assert(scannedFiles(userQ(s, zRoot)) < zTotal,
        "z layout: user window dropped no files")
      assert(scannedFiles(tsQ(s, zRoot)) < zTotal,
        "z layout: time window dropped no files")
      assert(scannedFiles(tsQ(s, sRoot)) < sTotal,
        "sorted layout: time window dropped no files")
      assert(scannedFiles(userQ(s, sRoot)) == sTotal,
        "sorted layout unexpectedly pruned on user_id — fixture no longer adversarial")
      assert(sortedRows(userQ(s, zRoot)) == wantUser, "pruned user window changed rows")
      assert(sortedRows(tsQ(s, zRoot)) == wantTs, "pruned time window changed rows")
    }
  }

  test("unusable cluster columns degrade: binary is skipped, an all-null column goes inert") {
    val root = seededLake(256)
    // blob (binary) is not cluster-keyable (no total-order image we
    // track bounds for); extra (double) is supported but ALL NULL, so
    // its quantiles are empty and its rank pins to 0 — user_id must
    // still cluster through the remaining bits. (Strings used to be
    // the skipped example here; they cluster since round 19.)
    val withCols = spark.read.parquet(s"$root/curated")
      .withColumn("blob", col("user_id").cast("string").cast("binary"))
      .withColumn("extra", lit(null).cast("double"))
    val tmp = Files.createTempDirectory("graft-zc2").toString
    withCols.write.partitionBy("year", "month", "day", "mode")
      .parquet(s"$tmp/curated")
    val want = sortedRows(spark.read.parquet(s"$tmp/curated"))
    val r = Compactor.compact(spark, s"$tmp/curated",
      maxFilesPerPartition = 1, targetBytesPerFile = (leafBytes(tmp) + 3) / 4,
      sortCol = Some("event_time_utc"),
      clusterCols = Seq("blob", "extra", "user_id"))
    assert(r.partitionsCompacted == 1)
    Compactor.sweepRetired(spark, s"$tmp/curated"): Unit
    assert(sortedRows(spark.read.parquet(s"$tmp/curated")) == want,
      "degraded cluster rewrite changed row content")
    // the surviving column still tiles: no live file spans the full
    // user range (inert-extra interleave is monotone in user rank)
    val leaf = s"$tmp/curated/year=2024/month=3/day=7/mode=training"
    val files = new java.io.File(leaf).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
    assert(files.length >= 3, s"expected a multi-file rewrite: ${files.length}")
    val spans = files.map { f =>
      val mm = spark.read.parquet(f.getPath)
        .agg(min("user_id"), max("user_id")).head()
      mm.getLong(1) - mm.getLong(0)
    }
    assert(spans.forall(_ < 255L),
      s"a file spans the full user range despite clustering: ${spans.toSeq}")
  }

  test("a string window keeps fewer files on the string-clustered twin") {
    // r18 verdict #6: strings were excluded from cluster keys while the
    // bounds sidecar already tracked capped string min/max per file and
    // the skip rule pruned on them — so an app_version/transaction_id
    // window got nothing from clustering. The 8-byte binary-prefix
    // image closes that: cluster on (event_time_utc, tag) and a string
    // range window must drop files on the clustered twin where the
    // time-sorted twin provably cannot (every file spans the full tag
    // range there), rows identical throughout.
    val zRoot = seededLake()
    val sRoot = seededLake()
    compactWith(zRoot, Seq("event_time_utc", "tag"))
    compactWith(sRoot, Seq.empty)
    def tagQ(s: SparkSession, root: String) =
      CuratedWriter.read(s, s"$root/curated").filter(col("tag") >= lit("u0384"))
    val want = sortedRows(tagQ(spark, zRoot))
    assert(want.nonEmpty)
    assert(sortedRows(tagQ(spark, sRoot)) == want)
    withExtendedSession { s =>
      val zTotal = CuratedWriter.read(s, s"$zRoot/curated").inputFiles.length
      val sTotal = CuratedWriter.read(s, s"$sRoot/curated").inputFiles.length
      assert(zTotal >= 3 && sTotal >= 3,
        s"rewrites produced too few files to measure pruning ($zTotal, $sTotal)")
      assert(scannedFiles(tagQ(s, zRoot)) < zTotal,
        "string-clustered layout: tag window dropped no files")
      assert(scannedFiles(tagQ(s, sRoot)) == sTotal,
        "sorted layout unexpectedly pruned on tag — fixture no longer adversarial")
      assert(sortedRows(tagQ(s, zRoot)) == want, "pruned tag window changed rows")
      assert(sortedRows(tagQ(s, sRoot)) == want)
    }
  }

  test("the registered q127_clustered_skip matches its direct run") {
    val sfDir = "/root/testdata/sf0.001"
    val want = graft.SparkEntry.queries("q127_clustered_skip")(spark, sfDir)
      .collect().toSeq
    assert(want.nonEmpty, "q127 returned nothing")
    withExtendedSession { s =>
      val df = graft.SparkEntry.queries("q127_clustered_skip")(s, sfDir)
      assert(df.collect().toSeq == want, "zone-pruned q127 != direct q127")
    }
  }
}
