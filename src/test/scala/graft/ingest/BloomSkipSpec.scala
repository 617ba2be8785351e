package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ingest.{Compactor, FileBounds, Rollup}
import graft.plans.RollupPartitionSkip

/** Per-file Bloom skipping ([[graft.functions.BloomExpressions]] +
  * FileBounds `bf_<c>` + the skip rule's membership probe): a point/IN
  * predicate on a bloom-tracked column must drop the files whose
  * filters reject every probed value — the case zone WINDOWS cannot
  * make when every file spans the key space — while keeping containing
  * files, bloom-less files (fail-open), and identical rows. Compaction
  * with `TickConfig.bloomCols` must republish filters for the
  * rewritten generation. */
class BloomSkipSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

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

  private def listedFiles(df: DataFrame): Seq[String] = {
    val locations = df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation.asInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation].location
    }
    assert(locations.size == 1, s"expected one relation, got ${locations.size}")
    locations.head.inputFiles.toSeq
  }

  /** One partition, one file per append, every file's key window
    * SPANNING the probe space by construction (lo/hi sentinels), so any
    * file drop is attributable to the Bloom probe alone. Returns the
    * lake root. */
  private def bloomLake(fileKeys: Seq[Seq[String]],
                        blooms: Seq[String] = Seq("lookup_key")): String = {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-bloom").toString
    fileKeys.zipWithIndex.foreach { case (keys, i) =>
      keys.zipWithIndex.map { case (k, j) => (s"f-$i", 10L * i + j, k, 1.0 + i) }
        .toDF("source_file", "user_id", "lookup_key", "value")
        .withColumn("event_time_utc",
          lit("2024-03-07 10:00:00").cast("timestamp_ntz"))
        .withColumn("year", lit(2024)).withColumn("month", lit(3))
        .withColumn("day", lit(7)).withColumn("mode", lit("training"))
        .coalesce(1)
        .write.mode("append").partitionBy("year", "month", "day", "mode")
        .parquet(s"$root/curated")
    }
    Rollup.writePartials(spark.read.parquet(s"$root/curated"), s"$root/rollup/b0")
    FileBounds.writeStaged(
      spark.read.parquet(s"$root/curated").select(col("*"), col("_metadata")),
      "", s"$root/filebounds/b0", blooms,
      bloomExpectedItems = 64, bloomFpp = 0.001)
    RollupPartitionSkip.clearCache()
    root
  }

  private def lake(s: SparkSession, root: String): DataFrame =
    s.read.parquet(s"$root/curated")

  // every file's window is ["aa", "zz"] ⊇ any probe — windows keep all
  private val spanning = Seq(
    Seq("aa", "m5", "zz"),  // file 0: holds the point probe
    Seq("aa", "n6", "zz"),  // file 1: holds the second IN probe
    Seq("aa", "q7", "zz"))  // file 2: holds neither

  test("a point lookup drops bloom-rejecting files the windows keep; rows identical") {
    val root = bloomLake(spanning)
    def q(s: SparkSession) = lake(s, root)
      .filter(col("lookup_key") === "m5")
      .select("source_file", "user_id", "value")
    val want = q(spark).collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(want.length == 1 && want.head.head == "f-0")
    withExtendedSession { s =>
      val df = q(s)
      val listed = listedFiles(df)
      // the window verdict keeps all three (every file spans the key
      // space); only the Bloom probe can have narrowed the listing
      assert(listed.length == 1,
        s"expected exactly the containing file: ${listed.map(_.split('/').last)}")
      assert(df.collect().map(_.toSeq).sortBy(_.mkString("|")).sameElements(want),
        "bloom pruning changed the answer")
    }
  }

  test("an IN probe keeps every containing file, drops the rest") {
    val root = bloomLake(spanning)
    def q(s: SparkSession) = lake(s, root)
      .filter(col("lookup_key").isin("m5", "n6"))
      .select("source_file", "lookup_key", "value")
    val want = q(spark).collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(want.length == 2)
    withExtendedSession { s =>
      val df = q(s)
      assert(listedFiles(df).length == 2, "expected files 0 and 1 kept, 2 dropped")
      assert(df.collect().map(_.toSeq).sortBy(_.mkString("|")).sameElements(want))
    }
  }

  test("a bloom-less bounds row keeps its file (fail-open), filters still drop theirs") {
    // files 0 and 1 publish filters; file 2's bounds arrive in a second
    // batch WITHOUT blooms (a pre-bloom store generation) — its bf is
    // NULL after the merged read and the probe may not touch it
    import spark.implicits._
    val root = Files.createTempDirectory("graft-bloomless").toString
    def append(keys: Seq[String], i: Int): Unit =
      keys.zipWithIndex.map { case (k, j) => (s"f-$i", 10L * i + j, k, 1.0 + i) }
        .toDF("source_file", "user_id", "lookup_key", "value")
        .withColumn("event_time_utc",
          lit("2024-03-07 10:00:00").cast("timestamp_ntz"))
        .withColumn("year", lit(2024)).withColumn("month", lit(3))
        .withColumn("day", lit(7)).withColumn("mode", lit("training"))
        .coalesce(1)
        .write.mode("append").partitionBy("year", "month", "day", "mode")
        .parquet(s"$root/curated")
    append(spanning(0), 0)
    append(spanning(1), 1)
    val withBlooms = spark.read.parquet(s"$root/curated")
    FileBounds.writeStaged(withBlooms.select(col("*"), col("_metadata")),
      "", s"$root/filebounds/b0", Seq("lookup_key"),
      bloomExpectedItems = 64, bloomFpp = 0.001)
    append(spanning(2), 2)
    val all = spark.read.parquet(s"$root/curated")
    FileBounds.writeStaged(
      all.filter(col("source_file") === "f-2").select(col("*"), col("_metadata")),
      "", s"$root/filebounds/b1") // no blooms
    Rollup.writePartials(spark.read.parquet(s"$root/curated"), s"$root/rollup/b0")
    RollupPartitionSkip.clearCache()
    // probe a key NO file holds: 0 and 1 bloom-drop, 2 is UNKNOWN → kept
    def q(s: SparkSession) = lake(s, root)
      .filter(col("lookup_key") === "x9")
      .select("source_file", "value")
    assert(q(spark).collect().isEmpty)
    withExtendedSession { s =>
      val df = q(s)
      val listed = listedFiles(df)
      assert(listed.length == 1, s"expected only the bloom-less file kept: $listed")
      assert(df.collect().isEmpty)
    }
  }

  test("compaction with bloomCols republishes filters; pruning survives the swap") {
    val root = bloomLake(spanning)
    val report = Compactor.compact(spark, s"$root/curated",
      maxFilesPerPartition = 1, targetBytesPerFile = 4L * 1024,
      parallelism = 2, sortCol = Some("event_time_utc"),
      bloomCols = Seq("lookup_key"))
    assert(report.partitionsCompacted == 1)
    Compactor.sweepRetired(spark, s"$root/curated"): Unit
    RollupPartitionSkip.clearCache()
    val live = FileBounds.all(spark, s"$root/filebounds")
    val sw = live.filter(col("data_file").startsWith("sw1-"))
    assert(sw.count() > 0, "no rewritten-generation bounds rows")
    assert(sw.filter(col(FileBounds.bfCol("lookup_key")).isNull).count() == 0,
      "compaction dropped the rewritten files' Bloom filters")
    // the rewritten generation's files also inherit NATIVE parquet
    // blooms (Compactor passes bloomCols as writer options)
    val swFile = {
      def find(d: java.io.File): Option[java.io.File] = {
        val kids = Option(d.listFiles()).toSeq.flatten
        kids.find(f => f.isFile && f.getName.startsWith("sw1-"))
          .orElse(kids.filter(f => f.isDirectory && !f.getName.startsWith("_"))
            .flatMap(find).headOption)
      }
      find(new java.io.File(s"$root/curated"))
        .getOrElse(fail("no sw1- file on the compacted lake"))
    }
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(swFile.getAbsolutePath),
        spark.sparkContext.hadoopConfiguration))
    try {
      import scala.jdk.CollectionConverters._
      val chunk = reader.getFooter.getBlocks.asScala.head.getColumns.asScala
        .find(_.getPath.toDotString == "lookup_key")
        .getOrElse(fail("no lookup_key chunk in the rewritten file"))
      // parquet-mr intentionally omits the bloom when every page is
      // dictionary-encoded (the dictionary IS an exact membership
      // filter, strictly better) — this tiny fixture always dict-
      // encodes, so the contract here is "bloom OR all-dict"; the q129
      // demo-lake footer test below covers the bloom-emitted branch
      val allDict = chunk.getEncodingStats != null &&
        !chunk.getEncodingStats.hasNonDictionaryEncodedPages
      assert(chunk.getBloomFilterOffset >= 0 || allDict,
        "compaction rewrite carried neither a native bloom nor dict-only pages")
    } finally reader.close()
    // a probe for an absent key drops the whole rewritten leaf
    def q(s: SparkSession) = CuratedWriter.read(s, s"$root/curated")
      .filter(col("lookup_key") === "x9")
      .select("source_file", "value")
    assert(q(spark).collect().isEmpty)
    withExtendedSession { s =>
      val df = q(s)
      assert(listedFiles(df).isEmpty,
        "expected the compacted file bloom-dropped for an absent key")
      assert(df.collect().isEmpty)
    }
  }

  test("a probe set past BloomProbeMaxValues stands down (windows only, rows intact)") {
    val root = bloomLake(spanning)
    val keys = (0 until RollupPartitionSkip.BloomProbeMaxValues + 1)
      .map(i => s"v$i") :+ "m5"
    def q(s: SparkSession) = lake(s, root)
      .filter(col("lookup_key").isin(keys: _*))
      .select("source_file", "lookup_key")
    val want = q(spark).collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(want.length == 1)
    withExtendedSession { s =>
      val df = q(s)
      // oversized set: no bloom probe; the spanning windows keep all 3
      assert(listedFiles(df).length == 3)
      assert(df.collect().map(_.toSeq).sortBy(_.mkString("|")).sameElements(want))
    }
  }

  test("the registered q129_bloom_lookup executes, bloom-prunes, matches direct") {
    val sfDir = "/root/testdata/sf0.001"
    val want = graft.SparkEntry.queries("q129_bloom_lookup")(spark, sfDir)
      .collect().toSeq
    assert(want.length == 1 && want.head.getLong(0) > 0,
      s"probe keys found no rows: $want")
    withExtendedSession { s =>
      val df = graft.SparkEntry.queries("q129_bloom_lookup")(s, sfDir)
      val lakeFiles = {
        val lay = graft.pipeline.IngestDemo.ensureBloomed(s, sfDir)
        s.read.parquet(lay.curatedDir).select(input_file_name())
          .distinct().count()
      }
      val listed = listedFiles(df).length
      assert(listed < lakeFiles,
        s"no bloom file pruning on q129's lake ($listed of $lakeFiles listed)")
      assert(df.collect().toSeq == want, "bloom-pruned q129 != direct q129")
    }
  }

  test("the q129 lake's data files carry NATIVE parquet bloom filters on lookup_key") {
    val lay = graft.pipeline.IngestDemo.ensureBloomed(spark, "/root/testdata/sf0.001")
    val leaf = new java.io.File(lay.curatedDir)
    def firstParquet(d: java.io.File): java.io.File = {
      val kids = Option(d.listFiles()).toSeq.flatten
      kids.find(f => f.isFile && f.getName.endsWith(".parquet"))
        .getOrElse(firstParquet(kids.filter(f =>
          f.isDirectory && !f.getName.startsWith("_")).head))
    }
    val file = firstParquet(leaf)
    val conf = spark.sparkContext.hadoopConfiguration
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.getAbsolutePath), conf))
    try {
      import scala.jdk.CollectionConverters._
      val chunk = reader.getFooter.getBlocks.asScala.head.getColumns.asScala
        .find(_.getPath.toDotString == "lookup_key")
        .getOrElse(fail("no lookup_key column chunk"))
      assert(chunk.getBloomFilterOffset >= 0,
        "writer option did not produce a native parquet bloom filter")
    } finally reader.close()
  }

  test("a widened read schema stands the bloom probe down (hash types must agree)") {
    // xxhash64 is width-sensitive: the same value hashed as INT and as
    // BIGINT gives different bits, so a filter built at the write-time
    // type must never be probed with literals at a WIDENED read type —
    // every probe would miss and files that DO contain matches would be
    // silently dropped. The round-20 pin: probe only when the query
    // attribute's type equals the sidecar's min_<c> type.
    import spark.implicits._
    val root = Files.createTempDirectory("graft-bloomwide").toString
    (0 until 3).foreach { i =>
      Seq((s"f-$i", 10L * i, 100 * i + 5, 1.0 + i))
        .toDF("source_file", "user_id", "k_int", "value")
        .withColumn("event_time_utc",
          lit("2024-03-07 10:00:00").cast("timestamp_ntz"))
        .withColumn("year", lit(2024)).withColumn("month", lit(3))
        .withColumn("day", lit(7)).withColumn("mode", lit("training"))
        .coalesce(1)
        .write.mode("append").partitionBy("year", "month", "day", "mode")
        .parquet(s"$root/curated")
    }
    Rollup.writePartials(spark.read.parquet(s"$root/curated"), s"$root/rollup/b0")
    FileBounds.writeStaged(
      spark.read.parquet(s"$root/curated").select(col("*"), col("_metadata")),
      "", s"$root/filebounds/b0", Seq("k_int"),
      bloomExpectedItems = 64, bloomFpp = 0.001)
    RollupPartitionSkip.clearCache()
    // widened consumption schema: k_int read as BIGINT (Spark 4 parquet
    // type promotion) — the schema-evolution shape the ADVICE flagged
    val wide = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("source_file",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("k_int",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("event_time_utc",
        org.apache.spark.sql.types.TimestampNTZType),
      org.apache.spark.sql.types.StructField("year",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("month",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("day",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("mode",
        org.apache.spark.sql.types.StringType)))
    def q(s: SparkSession) = s.read.schema(wide).parquet(s"$root/curated")
      .filter(col("k_int") === 105L)
      .select("source_file", "value")
    val want = q(spark).collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(want.length == 1 && want.head.head == "f-1")
    withExtendedSession { s =>
      val df = q(s)
      // the value WINDOWS legitimately prune the two non-containing
      // files (their casts coerce across the widening); the bloom probe
      // must stand down — its long-typed literal hash would reject the
      // int-built filter and drop the CONTAINING file too (zero rows)
      assert(listedFiles(df).nonEmpty,
        "bloom probe ran across a type widening — containing file dropped")
      assert(df.collect().map(_.toSeq).sortBy(_.mkString("|")).sameElements(want),
        "widened read lost rows")
    }
  }

  test("a widened-then-folded store probes per row: int-built filters stand " +
      "down, bigint-built still drop") {
    // The round-20 pin compared the query type against the MERGED
    // sidecar schema — after a contract widening plus a maintenance
    // fold that casts old rows' min/max to the widened type, that pin
    // PASSES while the old rows' filter bytes are still int-hashed;
    // probing them long-typed misses every time and drops files that DO
    // contain matches. Round 21 records the write-time hash type per
    // row (bft_<c>) and gates each file's probe on it.
    import spark.implicits._
    val root = Files.createTempDirectory("graft-bloommix").toString
    def append(df: DataFrame): Unit = df
      .withColumn("event_time_utc",
        lit("2024-03-07 10:00:00").cast("timestamp_ntz"))
      .withColumn("year", lit(2024)).withColumn("month", lit(3))
      .withColumn("day", lit(7)).withColumn("mode", lit("training"))
      .coalesce(1)
      .write.mode("append").partitionBy("year", "month", "day", "mode")
      .parquet(s"$root/curated")
    // pre-widening file: k is INT; its bounds batch hashes at "int".
    // lo/hi sentinels make every file's window SPAN the probe space, so
    // any drop below is attributable to the Bloom probe alone
    append(Seq(("f-0", 0L, 1, 1.0), ("f-0", 1L, 105, 1.0),
      ("f-0", 2L, 1000000, 1.0)).toDF("source_file", "user_id", "k", "value"))
    FileBounds.writeStaged(
      spark.read.parquet(s"$root/curated").select(col("*"), col("_metadata")),
      "", s"$root/filebounds/b0", Seq("k"),
      bloomExpectedItems = 64, bloomFpp = 0.001)
    val wide = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("source_file",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("event_time_utc",
        org.apache.spark.sql.types.TimestampNTZType),
      org.apache.spark.sql.types.StructField("year",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("month",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("day",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("mode",
        org.apache.spark.sql.types.StringType)))
    // post-widening file: k is BIGINT; its bounds batch hashes at "bigint"
    append(Seq(("f-1", 10L, 1L, 2.0), ("f-1", 11L, 205L, 2.0),
      ("f-1", 12L, 1000000L, 2.0)).toDF("source_file", "user_id", "k", "value"))
    FileBounds.writeStaged(
      spark.read.schema(wide).parquet(s"$root/curated")
        .filter(col("source_file") === "f-1").select(col("*"), col("_metadata")),
      "", s"$root/filebounds/b1", Seq("k"),
      bloomExpectedItems = 64, bloomFpp = 0.001)
    // simulate the maintenance fold casting the narrow batch to the
    // widened type (FileBounds.compact's merged write does exactly
    // this): the MERGED min_k is now uniformly BIGINT, so a
    // schema-level pin alone would pass for long-typed probes
    val b0cast = spark.read.parquet(s"$root/filebounds/b0")
      .withColumn(FileBounds.minCol("k"), col(FileBounds.minCol("k")).cast("long"))
      .withColumn(FileBounds.maxCol("k"), col(FileBounds.maxCol("k")).cast("long"))
    b0cast.coalesce(1).write.mode("overwrite").parquet(s"$root/filebounds/b0w")
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$root/filebounds/b0"))
    Rollup.writePartials(
      spark.read.schema(wide).parquet(s"$root/curated"), s"$root/rollup/b0")
    RollupPartitionSkip.clearCache()
    def q(s: SparkSession, key: Long) = s.read.schema(wide)
      .parquet(s"$root/curated")
      .filter(col("k") === key).select("source_file", "value")
    // a key only the INT-written file holds: its filter is int-hashed,
    // a long-typed probe would reject it — the per-row gate must keep it
    val want = q(spark, 105L).collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(want.length == 1 && want.head.head == "f-0")
    withExtendedSession { s =>
      val df = q(s, 105L)
      assert(df.collect().map(_.toSeq).sortBy(_.mkString("|")).sameElements(want),
        "per-row hash-type gate failed: int-built filter was probed long-typed " +
          "and its containing file dropped")
      // and the bigint-built filter keeps its drop power: a key neither
      // file holds drops f-1 (probed at its own type) while f-0 is kept
      // fail-open (type mismatch)
      val absent = q(s, 999L)
      val listed = listedFiles(absent).map(_.split('/').last)
      assert(absent.collect().isEmpty)
      assert(listed.length == 1,
        s"expected only the type-mismatched file kept fail-open: $listed")
    }
  }

  test("a typo'd or unsupported bloom column fails pipeline construction loudly") {
    // round 20 (r19 ADVICE): the per-batch `filter(columns.contains)`
    // guard silently swallowed a misspelled bloom column — no filters
    // ever published, point lookups quietly stopped pruning
    val lay = graft.pipeline.LakeLayout(
      Files.createTempDirectory("graft-bloomcfg").toString)
    val e = intercept[IllegalArgumentException](new graft.pipeline.BatchProcessor(
      spark, lay, graft.pipeline.Contracts.events,
      bloomCols = Seq("lookup_keey")))
    assert(e.getMessage.contains("lookup_keey"), e.getMessage)
    // a valid curated column constructs fine
    new graft.pipeline.BatchProcessor(spark, lay, graft.pipeline.Contracts.events,
      bloomCols = Seq("transaction_id")): Unit
  }

  test("sidecar filters are sized from each file's own row count; achieved fpp recorded") {
    // 100×-skewed lake under ONE ceiling literal (round 20, r19 verdict
    // #2): the small file must get a small filter (sidecar bytes
    // bounded) without the big file losing drop power — the fixed-size
    // agg forced the operator to pick one of those failures
    import spark.implicits._
    // lo/hi sentinels make every file's window SPAN the key space (the
    // `spanning` fixture's move), so any drop below is the Bloom's
    val big = "aa" +: (0 until 60000).map(i => f"big-$i%05d") :+ "zz"
    val small = "aa" +: (0 until 20).map(i => s"sm-$i") :+ "zz"
    val root = Files.createTempDirectory("graft-bloomskew").toString
    Seq(big, small).zipWithIndex.foreach { case (keys, i) =>
      keys.zipWithIndex.map { case (k, j) => (s"f-$i", 10L * i + j, k, 1.0 + i) }
        .toDF("source_file", "user_id", "lookup_key", "value")
        .withColumn("event_time_utc",
          lit("2024-03-07 10:00:00").cast("timestamp_ntz"))
        .withColumn("year", lit(2024)).withColumn("month", lit(3))
        .withColumn("day", lit(7)).withColumn("mode", lit("training"))
        .coalesce(1)
        .write.mode("append").partitionBy("year", "month", "day", "mode")
        .parquet(s"$root/curated")
    }
    Rollup.writePartials(spark.read.parquet(s"$root/curated"), s"$root/rollup/b0")
    FileBounds.writeStaged(
      spark.read.parquet(s"$root/curated").select(col("*"), col("_metadata")),
      "", s"$root/filebounds/b0", Seq("lookup_key"),
      bloomExpectedItems = 65536, bloomFpp = 0.01)
    RollupPartitionSkip.clearCache()
    val fb = FileBounds.all(spark, s"$root/filebounds")
      .select(col("data_file"), col("n_rows"),
        length(col(FileBounds.bfCol("lookup_key"))).as("bf_bytes"),
        col(FileBounds.bfppCol("lookup_key")).as("fpp"))
      .collect().sortBy(_.getAs[Long]("n_rows"))
    assert(fb.length == 2)
    val (smallRow, bigRow) = (fb.head, fb.last)
    // per-file sizing: the 20-row file's filter is a fraction of the
    // 2000-row file's (floor-clamped, never ceiling-sized)
    assert(smallRow.getAs[Int]("bf_bytes") * 4 < bigRow.getAs[Int]("bf_bytes"),
      s"small file not right-sized: $fb")
    // achieved fpp is recorded and healthy on BOTH: the full file sits
    // at ~the target (exact-fill rounding can nudge it a hair past),
    // the floor-clamped small file far below it
    assert(fb.forall(r => !r.isNullAt(r.fieldIndex("fpp"))),
      s"fpp audit column missing: ${fb.mkString(";")}")
    assert(bigRow.getAs[Double]("fpp") <= 0.02,
      s"full file drifted past its sizing target: ${fb.mkString(";")}")
    assert(smallRow.getAs[Double]("fpp") < 0.001,
      s"floor-clamped file should sit far below target: ${fb.mkString(";")}")
    // drop power preserved on the small file: a key only IT holds keeps
    // exactly one file under the probe
    def q(s: SparkSession) = s.read.parquet(s"$root/curated")
      .filter(col("lookup_key") === "sm-7").select("source_file", "value")
    val want = q(spark).collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(want.length == 1 && want.head.head == "f-1")
    withExtendedSession { s =>
      val df = q(s)
      assert(listedFiles(df).length == 1,
        "auto-sized filters lost their drop power")
      assert(df.collect().map(_.toSeq).sortBy(_.mkString("|")).sameElements(want))
    }
  }

  test("bloom agg covers every inserted value; rejects most absent ones") {
    import spark.implicits._
    graft.functions.BloomExpressions.register(spark)
    val present = (0 until 200).map(i => s"id-$i")
    val bfRow = present.toDF("k")
      .agg(call_function("graft_bloom_agg", xxhash64(col("k")),
        lit(1000L), lit(0.01)).as("bf"))
    val probe = bfRow.select(
      (0 until 200).map(i =>
        call_function("graft_bloom_contains_any", col("bf"),
          array(xxhash64(lit(s"id-$i")))).as(s"p$i")): _*)
      .collect().head
    assert((0 until 200).forall(probe.getBoolean), "a present value was rejected")
    val absentHits = bfRow.select(
      (0 until 100).map(i =>
        call_function("graft_bloom_contains_any", col("bf"),
          array(xxhash64(lit(s"absent-$i")))).as(s"a$i")): _*)
      .collect().head
    val fp = (0 until 100).count(absentHits.getBoolean)
    assert(fp <= 10, s"false-positive rate implausibly high: $fp/100")
  }
}
