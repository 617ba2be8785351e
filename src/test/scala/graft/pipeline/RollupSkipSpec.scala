package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ingest.Rollup
import graft.plans.RollupPartitionSkip

/** [[graft.plans.RollupPartitionSkip]]: an event-time range filter over
  * a rollup-maintained lake must pick up a partition-struct IN zone
  * predicate folded from the partials' min/max bounds — fewer
  * partitions scanned, identical rows — and every shape outside the
  * contract (no literal bounds, disabled conf, foreign lake) must
  * leave the plan untouched. */
class RollupSkipSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** A curated lake written directly at partition grain (3 days × 2
    * modes, one file per partition via one source_file each) with its
    * partials published — the minimal fixture for zone tests. Day 9
    * carries ONLY null event times (its zone bounds are null). */
  private def syntheticLake(): String = {
    val root = Files.createTempDirectory("graft-skip").toString
    val rows = Seq(
      // (source_file, user, ts, value, y, m, d, mode)
      ("f-a", 1L, "2024-03-07 10:00:00", 1.25, 2024, 3, 7, "training"),
      ("f-a", 2L, "2024-03-07 11:00:00", 2.5, 2024, 3, 7, "training"),
      ("f-b", 1L, "2024-03-07 12:30:00", 0.75, 2024, 3, 7, "eval"),
      ("f-c", 3L, "2024-03-08 09:00:00", 4.0, 2024, 3, 8, "training"),
      ("f-c", 3L, "2024-03-08 10:30:00", 1.0, 2024, 3, 8, "eval"),
      ("f-d", 4L, null, 10.125, 2024, 3, 9, "training"))
    import spark.implicits._
    rows.toDF("source_file", "user_id", "ts_s", "value", "year", "month", "day", "mode")
      .withColumn("event_time_utc", col("ts_s").cast("timestamp_ntz"))
      .drop("ts_s")
      .write.partitionBy("year", "month", "day", "mode")
      .parquet(s"$root/curated")
    Rollup.writePartials(spark.read.parquet(s"$root/curated"), s"$root/rollup/b0")
    RollupPartitionSkip.clearCache()
    root
  }

  private def lake(s: SparkSession, root: String): DataFrame =
    s.read.parquet(s"$root/curated")

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

  /** The zone predicates (our IN-over-partition-struct) found among the
    * scan's partition filters, and the scanned partition count. */
  private def zoneScan(df: DataFrame): (Seq[String], Int) = {
    val scans = df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty, s"no parquet scan:\n${df.queryExecution.sparkPlan}")
    val zones = scans.flatMap(_.partitionFilters).map(_.toString)
      .filter(s => s.contains("named_struct") || s.contains("struct"))
    (zones, scans.map(_.selectedPartitions.partitionCount).sum)
  }

  // the REGISTERED contract query, not a paraphrase (the q111 lesson)
  test("the registered q114_timerange_skip executes, is zone-pruned, matches direct") {
    val sfDir = "/root/testdata/sf0.001"
    val want = graft.SparkEntry.queries("q114_timerange_skip")(spark, sfDir)
      .collect().toSeq
    assert(want.nonEmpty)
    withExtendedSession { s =>
      val df = graft.SparkEntry.queries("q114_timerange_skip")(s, sfDir)
      val (zones, _) = zoneScan(df)
      assert(zones.nonEmpty, "q114's scan carries no zone predicate")
      assert(df.collect().toSeq == want, "zone-pruned q114 != direct q114")
    }
  }

  test("a day window scans only the zone-qualifying partitions, rows unchanged") {
    val root = syntheticLake()
    val lo = lit("2024-03-08 00:00:00").cast("timestamp_ntz")
    val hi = lit("2024-03-09 00:00:00").cast("timestamp_ntz")
    def q(s: SparkSession) = lake(s, root)
      .filter(col("event_time_utc") >= lo && col("event_time_utc") < hi)
      .select("source_file", "user_id", "value", "day", "mode")
    val want = q(spark).collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(want.length == 2)
    withExtendedSession { s =>
      val df = q(s)
      val (zones, nParts) = zoneScan(df)
      assert(zones.nonEmpty, "no zone predicate among partition filters")
      // 5 partitions total; only day 8's two qualify (day 7 out of
      // window, day 9's bounds are NULL — all-null event times)
      assert(nParts == 2, s"expected 2 scanned partitions, got $nParts")
      assert(df.collect().map(_.toSeq).sortBy(_.mkString("|")).sameElements(want))
    }
  }

  test("extra conjuncts ride along unchanged; one-sided bounds still prune") {
    val root = syntheticLake()
    def q(s: SparkSession) = lake(s, root)
      .filter(col("event_time_utc") >= lit("2024-03-08 00:00:00").cast("timestamp_ntz") &&
        col("mode") === "training" && col("value") > lit(2.0))
      .select("source_file", "user_id", "value")
    val want = q(spark).collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(want.length == 1) // f-c 4.0 (day 9's null ts fails the range)
    withExtendedSession { s =>
      val df = q(s)
      val (zones, nParts) = zoneScan(df)
      assert(zones.nonEmpty, "no zone predicate for a one-sided bound")
      // day 7 (both modes) is zone-skipped; day 9 is null-zone-skipped;
      // mode=training partition filter intersects what remains
      assert(nParts == 1, s"expected 1 scanned partition, got $nParts")
      assert(df.collect().map(_.toSeq).sortBy(_.mkString("|")).sameElements(want))
    }
  }

  test("an unsatisfiable window collapses to an empty scan without a fold") {
    val root = syntheticLake()
    withExtendedSession { s =>
      val df = lake(s, root)
        .filter(col("event_time_utc") >= lit("2024-03-09 00:00:00").cast("timestamp_ntz") &&
          col("event_time_utc") <= lit("2024-03-07 00:00:00").cast("timestamp_ntz"))
      assert(df.count() == 0)
      val scans = df.queryExecution.sparkPlan.collect {
        case f: FileSourceScanExec => f
      }
      assert(scans.isEmpty || scans.forall(_.selectedPartitions.partitionCount == 0),
        s"inverted window still scans:\n${df.queryExecution.sparkPlan}")
    }
  }

  test("the optimized plan carries exactly one zone conjunct (fixpoint, not accretion)") {
    val root = syntheticLake()
    withExtendedSession { s =>
      val df = lake(s, root)
        .filter(col("event_time_utc") >= lit("2024-03-08 00:00:00").cast("timestamp_ntz"))
      val conds = df.queryExecution.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
      }
      val nZone = conds.flatMap(c => c.collect {
        case i: org.apache.spark.sql.catalyst.expressions.In => i
        case i: org.apache.spark.sql.catalyst.expressions.InSet => i
      }).size
      assert(nZone == 1, s"expected exactly one zone IN, got $nZone in $conds")
      assert(df.count() == 2) // day 8's two rows; the null day adds nothing
    }
  }

  test("no literal bound, a disabled conf, and a rollup-less lake are untouched") {
    val root = syntheticLake()
    withExtendedSession { s =>
      // no literal bounds: a null test constrains no range
      val noLit = lake(s, root).filter(col("event_time_utc").isNotNull)
      val (z1, _) = zoneScan(noLit)
      assert(z1.isEmpty, s"zone predicate without a literal bound: $z1")

      // disabled conf
      s.conf.set(RollupPartitionSkip.EnabledKey, "false")
      try {
        val off = lake(s, root)
          .filter(col("event_time_utc") >= lit("2024-03-08 00:00:00").cast("timestamp_ntz"))
        val (z2, n2) = zoneScan(off)
        assert(z2.isEmpty, s"zone predicate under disabled conf: $z2")
        assert(n2 == 5)
      } finally s.conf.set(RollupPartitionSkip.EnabledKey, "true")

      // a lake with no rollup sibling: same data, no partials
      val bare = Files.createTempDirectory("graft-skip-bare").toString
      lake(s, root).write.partitionBy("year", "month", "day", "mode")
        .parquet(s"$bare/curated")
      val noStore = s.read.parquet(s"$bare/curated")
        .filter(col("event_time_utc") >= lit("2024-03-08 00:00:00").cast("timestamp_ntz"))
      val (z3, _) = zoneScan(noStore)
      assert(z3.isEmpty, s"zone predicate without a partial store: $z3")
    }
  }

  test("catalog-backed lake: the zone predicate prunes the metastore listing itself") {
    // On a bare parquet directory, discovery (listing every partition
    // dir) happens BEFORE pruning can bite. The scale path is a
    // catalog table over the same location: reads resolve to a
    // deferred CatalogFileIndex, the zone IN conjunct reaches
    // PruneFileSourcePartitions, and only qualifying partitions are
    // ever listed. This test pins that composition: after optimization
    // the relation's file index must no longer be the CatalogFileIndex
    // (it was pruned and materialized) and must hold only day-8 files.
    val root = syntheticLake()
    withExtendedSession { s =>
      s.sql("DROP TABLE IF EXISTS zone_cat")
      s.sql(
        s"""CREATE TABLE zone_cat
           |  (source_file STRING, user_id BIGINT, value DOUBLE,
           |   event_time_utc TIMESTAMP_NTZ,
           |   year INT, month INT, day INT, mode STRING)
           |USING parquet PARTITIONED BY (year, month, day, mode)
           |LOCATION '$root/curated'""".stripMargin)
      try {
        s.sql("MSCK REPAIR TABLE zone_cat")
        val df = s.table("zone_cat")
          .filter(col("event_time_utc") >= lit("2024-03-08 00:00:00").cast("timestamp_ntz") &&
            col("event_time_utc") < lit("2024-03-09 00:00:00").cast("timestamp_ntz"))
          .select("source_file", "user_id", "value", "day", "mode")
        val locations = df.queryExecution.optimizedPlan.collect {
          case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            l.relation.asInstanceOf[
              org.apache.spark.sql.execution.datasources.HadoopFsRelation].location
        }
        assert(locations.size == 1)
        assert(!locations.head.isInstanceOf[
          org.apache.spark.sql.execution.datasources.CatalogFileIndex],
          "zone predicate never reached PruneFileSourcePartitions — " +
            "the catalog listing was not pruned")
        val listed = locations.head.inputFiles
        assert(listed.nonEmpty && listed.forall(_.contains("day=8")),
          s"pruned catalog listing still holds non-qualifying files: ${listed.toSeq}")
        val got = df.collect().map(_.toSeq).sortBy(_.mkString("|"))
        val want = lake(s, root)
          .filter(col("event_time_utc") >= lit("2024-03-08 00:00:00").cast("timestamp_ntz") &&
            col("event_time_utc") < lit("2024-03-09 00:00:00").cast("timestamp_ntz"))
          .select("source_file", "user_id", "value", "day", "mode")
          .collect().map(_.toSeq).sortBy(_.mkString("|"))
        assert(got.length == 2 && got.sameElements(want))
      } finally s.sql("DROP TABLE IF EXISTS zone_cat")
    }
  }

  /** Per-file bounds for a hand-built lake: compute from the real files
    * (exact names via `_metadata`), optionally dropping some rows to
    * simulate files the sidecar doesn't know (compaction output,
    * pre-upgrade appends). */
  private def publishBounds(root: String,
                            dropRow: org.apache.spark.sql.Row => Boolean = _ => false,
                            legacyOnly: Boolean = false,
                            batch: String = "b0")
      : Unit = {
    val lake = spark.read.parquet(s"$root/curated")
    // legacyOnly reproduces a round-16 store: bounds computed from the
    // two original columns alone, no generic triplets
    val fed =
      if (legacyOnly) lake.select(col("event_time_utc"), col("value"),
        col("_metadata"), col("year"), col("month"), col("day"), col("mode"))
      else lake.select(col("*"), col("_metadata"))
    val b = graft.ingest.FileBounds.compute(fed, "")
    val keptRows = b.collect().filterNot(dropRow).toSeq
    val schema = b.schema
    spark.createDataFrame(
      spark.sparkContext.parallelize(keptRows, 1), schema)
      .write.mode("overwrite").parquet(s"$root/filebounds/$batch")
    RollupPartitionSkip.clearCache()
  }

  test("value-range zones prune covered partitions and never touch uncovered ones") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-vskip").toString
    // three partitions with DISJOINT value ranges; day 9 will be left
    // UNCOVERED by the bounds sidecar (simulating pre-upgrade history)
    val rows = Seq(
      ("f-a", 1L, "2024-03-07 10:00:00", 1.0, 2024, 3, 7, "training"),
      ("f-a", 2L, "2024-03-07 11:00:00", 2.0, 2024, 3, 7, "training"),
      ("f-b", 3L, "2024-03-08 09:00:00", 100.0, 2024, 3, 8, "training"),
      ("f-b", 3L, "2024-03-08 10:30:00", 200.0, 2024, 3, 8, "training"),
      ("f-c", 4L, "2024-03-09 09:00:00", 5.0, 2024, 3, 9, "training"),
      ("f-c", 4L, "2024-03-09 10:00:00", 6.0, 2024, 3, 9, "training"))
    rows.toDF("source_file", "user_id", "ts_s", "value", "year", "month", "day", "mode")
      .withColumn("event_time_utc", col("ts_s").cast("timestamp_ntz"))
      .drop("ts_s")
      .write.partitionBy("year", "month", "day", "mode").parquet(s"$root/curated")
    Rollup.writePartials(spark.read.parquet(s"$root/curated"), s"$root/rollup/b0")
    publishBounds(root, dropRow = _.getAs[Int]("day") == 9)

    def q(s: SparkSession) = lake(s, root)
      .filter(col("value") >= lit(50.0))
      .select("source_file", "user_id", "value", "day")
    val want = q(spark).collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(want.length == 2) // day 8's two rows
    withExtendedSession { s =>
      val df = q(s)
      val (zones, nParts) = zoneScan(df)
      assert(zones.nonEmpty, "no zone predicate for a pure value window")
      // day 7 value-skipped (covered, [1,2] misses >=50); day 8 kept;
      // day 9 kept DESPITE [5,6] missing the window — it is uncovered,
      // and an uncovered partition must never be value-skipped
      assert(nParts == 2, s"expected 2 scanned partitions, got $nParts")
      assert(df.collect().map(_.toSeq).sortBy(_.mkString("|")).sameElements(want))
    }
  }

  test("file-grain zones drop an uncompacted file the window misses, keep unknown files") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-fskip").toString
    val lakeDir = s"$root/curated"
    def writeRows(rs: Seq[(String, Long, String, Double)]): Unit =
      rs.toDF("source_file", "user_id", "ts_s", "value")
        .withColumn("event_time_utc", col("ts_s").cast("timestamp_ntz"))
        .drop("ts_s")
        .withColumn("year", lit(2024)).withColumn("month", lit(3))
        .withColumn("day", lit(7)).withColumn("mode", lit("training"))
        .coalesce(1)
        .write.mode("append").partitionBy("year", "month", "day", "mode")
        .parquet(lakeDir)
    // three files in ONE partition: a morning append, an evening append,
    // and a file spanning both (standing in for a compacted rewrite the
    // sidecar doesn't know)
    writeRows(Seq(("f-m", 1L, "2024-03-07 08:00:00", 1.0),
      ("f-m", 2L, "2024-03-07 09:00:00", 2.0)))
    writeRows(Seq(("f-e", 3L, "2024-03-07 18:00:00", 3.0),
      ("f-e", 4L, "2024-03-07 19:00:00", 4.0)))
    writeRows(Seq(("f-x", 5L, "2024-03-07 08:30:00", 5.0),
      ("f-x", 6L, "2024-03-07 18:30:00", 6.0)))
    Rollup.writePartials(spark.read.parquet(lakeDir), s"$root/rollup/b0")
    // bounds for the morning and evening files only — the spanning file
    // has no row, like compaction output
    publishBounds(root, dropRow = r => {
      val mn = r.getAs[java.time.LocalDateTime]("min_ts")
      val mx = r.getAs[java.time.LocalDateTime]("max_ts")
      mn.getHour < 12 && mx.getHour > 12
    })

    def q(s: SparkSession) = lake(s, root)
      .filter(col("event_time_utc") >= lit("2024-03-07 07:00:00").cast("timestamp_ntz") &&
        col("event_time_utc") < lit("2024-03-07 10:00:00").cast("timestamp_ntz"))
      .select("source_file", "user_id", "value")
    val want = q(spark).collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(want.length == 3) // f-m's two + f-x's morning row
    withExtendedSession { s =>
      val df = q(s)
      val locations = df.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation.asInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation].location
      }
      assert(locations.size == 1)
      val listed = locations.head.inputFiles
      // files-read < files-present: the evening file is zone-dropped,
      // the morning file and the UNKNOWN spanning file are read
      assert(listed.length == 2,
        s"expected 2 of 3 files in the pruned listing: ${listed.toSeq}")
      assert(df.collect().map(_.toSeq).sortBy(_.mkString("|")).sameElements(want),
        "file-grain pruning changed the answer")
      // fixpoint: the swapped relation is never re-swapped, the plan is
      // stable under a second optimization
      assert(df.queryExecution.optimizedPlan.sameResult(df.queryExecution.optimizedPlan))
    }
  }

  test("zone pruning fires on a compacted lake's snapshot-pinned read") {
    val root = syntheticLake()
    // fragment day 8 with a second append, then compact: the lake now
    // has swap history and CuratedWriter.read takes the pinned-listing
    // path — the zone rule must keep pruning it
    import spark.implicits._
    Seq(("f-e", 5L, "2024-03-08 20:00:00", 3.0, 2024, 3, 8, "training"))
      .toDF("source_file", "user_id", "ts_s", "value", "year", "month", "day", "mode")
      .withColumn("event_time_utc", col("ts_s").cast("timestamp_ntz"))
      .drop("ts_s")
      .write.mode("append").partitionBy("year", "month", "day", "mode")
      .parquet(s"$root/curated")
    Rollup.writePartials(
      spark.read.parquet(s"$root/curated")
        .filter(col("day") === 8 && col("user_id") === 5), s"$root/rollup/b1")
    val report = graft.ingest.Compactor.compact(spark, s"$root/curated",
      maxFilesPerPartition = 0, sortCol = Some("event_time_utc"))
    assert(report.partitionsCompacted > 0)
    RollupPartitionSkip.clearCache()
    def q(s: SparkSession) = graft.ingest.CuratedWriter.read(s, s"$root/curated")
      .filter(col("event_time_utc") >= lit("2024-03-08 00:00:00").cast("timestamp_ntz") &&
        col("event_time_utc") < lit("2024-03-09 00:00:00").cast("timestamp_ntz"))
      .select("source_file", "user_id", "value", "day", "mode")
    val want = q(spark).collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(want.length == 3)
    withExtendedSession { s =>
      val df = q(s)
      val (zones, nParts) = zoneScan(df)
      assert(zones.nonEmpty, "no zone predicate on the pinned-listing read")
      assert(nParts == 2, s"expected 2 scanned partitions, got $nParts")
      assert(df.collect().map(_.toSeq).sortBy(_.mkString("|")).sameElements(want))
    }
  }

  test("the registered q119_valuerange_skip executes and matches its direct run") {
    val sfDir = "/root/testdata/sf0.001"
    val want = graft.SparkEntry.queries("q119_valuerange_skip")(spark, sfDir)
      .collect().toSeq
    withExtendedSession { s =>
      val df = graft.SparkEntry.queries("q119_valuerange_skip")(s, sfDir)
      assert(df.collect().toSeq == want, "value-zoned q119 != direct q119")
    }
  }

  test("a pre-rollup lake backfills its stores in one scan; rules fire, reconcile green") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-backfill").toString
    // a lake with NO lineage column and NO statistics stores — foreign
    // history the rules would otherwise require disabling for
    Seq(
      (1L, "2024-03-07 10:00:00", 1.25, 2024, 3, 7, "training"),
      (2L, "2024-03-07 11:00:00", 2.5, 2024, 3, 7, "training"),
      (3L, "2024-03-08 09:00:00", 4.0, 2024, 3, 8, "training"),
      (3L, "2024-03-08 10:30:00", 1.0, 2024, 3, 8, "eval"))
      .toDF("user_id", "ts_s", "value", "year", "month", "day", "mode")
      .withColumn("event_time_utc", col("ts_s").cast("timestamp_ntz"))
      .drop("ts_s")
      .write.partitionBy("year", "month", "day", "mode").parquet(s"$root/curated")
    // no stores yet: the zone rule stays silent
    RollupPartitionSkip.clearCache()
    withExtendedSession { s =>
      val (z0, _) = zoneScan(lake(s, root)
        .filter(col("event_time_utc") >= lit("2024-03-08 00:00:00").cast("timestamp_ntz")))
      assert(z0.isEmpty, "zone predicate on a store-less lake")
    }
    Rollup.backfill(spark, s"$root/curated", s"$root/rollup", s"$root/filebounds")
    RollupPartitionSkip.clearCache()
    // the backfilled partials equal the lake exactly (synthesized
    // per-physical-file lineage preserves the twin-collapse key)
    val flags = Rollup.reconcile(spark, s"$root/curated", s"$root/rollup")
      .select("rows_match", "value_match", "value_e6_match", "files_match", "reach_ok")
      .collect()
    assert(flags.nonEmpty &&
      flags.forall(r => (0 until 5).forall(i => r.getInt(i) == 1)),
      "backfilled partials diverge from the lake")
    // the backfilled store carries the generalized triplets for the
    // lake's own numeric columns (boundsColumns over the full schema)
    val bcols = graft.ingest.FileBounds.all(spark, s"$root/filebounds").columns.toSet
    assert(Set("nn_user_id", "min_user_id", "max_user_id").subsetOf(bcols),
      s"backfill produced no generic user_id triplet: $bcols")
    withExtendedSession { s =>
      // zone skip prunes off the backfilled bounds
      val df = lake(s, root)
        .filter(col("event_time_utc") >= lit("2024-03-08 00:00:00").cast("timestamp_ntz"))
        .select("user_id", "value", "day", "mode")
      val (zones, nParts) = zoneScan(df)
      assert(zones.nonEmpty && nParts == 2, s"no pruning after backfill ($nParts)")
      assert(df.count() == 2)
      // ... and on the generic column: day 7 (users 1-2) prunes under a
      // user_id window only the day-8 partitions satisfy
      val du = lake(s, root)
        .filter(col("user_id") >= lit(3L))
        .select("user_id", "day", "mode")
      val (zu, nu) = zoneScan(du)
      assert(zu.nonEmpty && nu == 2, s"no generic-column pruning after backfill ($nu)")
      assert(du.count() == 2)
      // the serve rule answers from the backfilled partials
      val served = lake(s, root)
        .groupBy("year", "month", "day", "mode")
        .agg(count(lit(1)).as("n_rows"), count(col("value")).as("n_value"))
      val roots = served.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation.asInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.rootPaths.map(_.toString)
      }.flatten
      assert(roots.exists(_.contains("/rollup")) && !roots.exists(_.contains("/curated")),
        s"serve rule not firing after backfill: $roots")
      assert(served.collect().map(_.getLong(4)).sum == 4L)
    }
  }

  /** A lake whose partitions have DISJOINT user_id ranges — the
    * third-column fixture for the generalized (schema-driven) zones.
    * day 7: users 1-2, day 8: users 100-200, day 9: users 5000+. */
  private def userLake(): String = {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-uskip").toString
    val rows = Seq(
      ("f-a", 1L, "2024-03-07 10:00:00", 1.0, 2024, 3, 7, "training"),
      ("f-a", 2L, "2024-03-07 11:00:00", 2.0, 2024, 3, 7, "training"),
      ("f-b", 100L, "2024-03-08 09:00:00", 3.0, 2024, 3, 8, "training"),
      ("f-b", 200L, "2024-03-08 10:30:00", 4.0, 2024, 3, 8, "training"),
      ("f-c", 5000L, "2024-03-09 09:00:00", 5.0, 2024, 3, 9, "training"),
      ("f-c", 5001L, "2024-03-09 10:00:00", 6.0, 2024, 3, 9, "training"))
    rows.toDF("source_file", "user_id", "ts_s", "value", "year", "month", "day", "mode")
      .withColumn("event_time_utc", col("ts_s").cast("timestamp_ntz"))
      .drop("ts_s")
      .write.partitionBy("year", "month", "day", "mode").parquet(s"$root/curated")
    Rollup.writePartials(spark.read.parquet(s"$root/curated"), s"$root/rollup/b0")
    root
  }

  test("a generic column's range prunes covered partitions under the per-column proof") {
    val root = userLake()
    publishBounds(root)
    // the store self-describes the generalized triplet
    val cols = graft.ingest.FileBounds.all(spark, s"$root/filebounds").columns.toSet
    assert(Set("nn_user_id", "min_user_id", "max_user_id").subsetOf(cols),
      s"no generic user_id triplet in the store: $cols")
    def q(s: SparkSession) = lake(s, root)
      .filter(col("user_id") >= lit(50L) && col("user_id") <= lit(400L))
      .select("source_file", "user_id", "value", "day")
    val want = q(spark).collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(want.length == 2) // day 8's two rows
    withExtendedSession { s =>
      val df = q(s)
      val (zones, nParts) = zoneScan(df)
      assert(zones.nonEmpty, "no zone predicate for a generic-column window")
      // day 7 ([1,2]) and day 9 ([5000,5001]) miss [50,400]: both are
      // covered for user_id, both prune; only day 8 scans
      assert(nParts == 1, s"expected 1 scanned partition, got $nParts")
      assert(df.collect().map(_.toSeq).sortBy(_.mkString("|")).sameElements(want))
    }
  }

  test("a mixed-generation store fails open per column: legacy rows are UNKNOWN for user_id") {
    val root = userLake()
    // day 7's bounds predate the generalization (legacy two-column
    // rows); day 8/9's carry the user_id triplet — the upgraded-lake
    // shape after the generalization ships mid-history
    publishBounds(root, dropRow = _.getAs[Int]("day") != 7,
      legacyOnly = true, batch = "b0")
    publishBounds(root, dropRow = _.getAs[Int]("day") == 7, batch = "b1")
    def q(s: SparkSession) = lake(s, root)
      .filter(col("user_id") >= lit(50000L)) // beyond every partition's range
      .select("source_file", "user_id", "day")
    assert(q(spark).collect().isEmpty)
    withExtendedSession { s =>
      val df = q(s)
      val (zones, nParts) = zoneScan(df)
      assert(zones.nonEmpty, "no zone predicate over the mixed-generation store")
      // day 8/9 are covered-for-user_id and prune; day 7's legacy rows
      // are UNKNOWN for user_id (null nn_user_id after the merged read),
      // so it MUST be kept despite its rows also missing the window —
      // skipping on unknown bounds would be a wrong-results bug
      assert(nParts == 1, s"expected exactly day 7 kept, got $nParts")
      assert(df.collect().isEmpty)
    }
  }

  test("file-grain drops apply to generic columns; UNKNOWN files are kept") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-ufskip").toString
    val lakeDir = s"$root/curated"
    def writeRows(rs: Seq[(String, Long, String, Double)]): Unit =
      rs.toDF("source_file", "user_id", "ts_s", "value")
        .withColumn("event_time_utc", col("ts_s").cast("timestamp_ntz"))
        .drop("ts_s")
        .withColumn("year", lit(2024)).withColumn("month", lit(3))
        .withColumn("day", lit(7)).withColumn("mode", lit("training"))
        .coalesce(1)
        .write.mode("append").partitionBy("year", "month", "day", "mode")
        .parquet(lakeDir)
    // one partition, three files with disjoint user ranges; the third
    // file's bounds row is DROPPED (simulating compaction output the
    // sidecar doesn't know)
    writeRows(Seq(("f-lo", 1L, "2024-03-07 08:00:00", 1.0),
      ("f-lo", 2L, "2024-03-07 09:00:00", 2.0)))
    writeRows(Seq(("f-hi", 900L, "2024-03-07 18:00:00", 3.0),
      ("f-hi", 901L, "2024-03-07 19:00:00", 4.0)))
    writeRows(Seq(("f-un", 450L, "2024-03-07 12:00:00", 5.0)))
    Rollup.writePartials(spark.read.parquet(lakeDir), s"$root/rollup/b0")
    publishBounds(root, dropRow = _.getAs[Long]("min_user_id") == 450L)
    def q(s: SparkSession) = lake(s, root)
      .filter(col("user_id") >= lit(400L) && col("user_id") < lit(500L))
      .select("source_file", "user_id")
    val want = q(spark).collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(want.length == 1) // f-un's row
    withExtendedSession { s =>
      val df = q(s)
      val locations = df.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation.asInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation].location
      }
      assert(locations.size == 1)
      val listed = locations.head.inputFiles
      // f-lo and f-hi are user-zone-dropped; the UNKNOWN file is read
      assert(listed.length == 1,
        s"expected 1 of 3 files in the pruned listing: ${listed.toSeq}")
      assert(df.collect().map(_.toSeq).sortBy(_.mkString("|")).sameElements(want),
        "generic file-grain pruning changed the answer")
    }
  }

  test("string zones prune on binary order; over-cap values withhold bounds and fail open") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-sskip").toString
    val long = "z" * 80 // past StringBoundsCap: bounds for its file are withheld
    val rows = Seq(
      ("f-a", 1L, "alpha", "2024-03-07 10:00:00", 1.0, 2024, 3, 7, "training"),
      ("f-a", 2L, "bravo", "2024-03-07 11:00:00", 2.0, 2024, 3, 7, "training"),
      ("f-b", 3L, "mike", "2024-03-08 09:00:00", 3.0, 2024, 3, 8, "training"),
      ("f-b", 4L, "november", "2024-03-08 10:30:00", 4.0, 2024, 3, 8, "training"),
      ("f-c", 5L, "alpha", "2024-03-09 09:00:00", 5.0, 2024, 3, 9, "training"),
      ("f-c", 6L, long, "2024-03-09 10:00:00", 6.0, 2024, 3, 9, "training"))
    rows.toDF("source_file", "user_id", "tag", "ts_s", "value",
        "year", "month", "day", "mode")
      .withColumn("event_time_utc", col("ts_s").cast("timestamp_ntz"))
      .drop("ts_s")
      .write.partitionBy("year", "month", "day", "mode").parquet(s"$root/curated")
    Rollup.writePartials(spark.read.parquet(s"$root/curated"), s"$root/rollup/b0")
    publishBounds(root)
    // the sidecar tracks the string column, and day 9's bounds row
    // carries the WITHHELD marker (values present, bounds null)
    val b = graft.ingest.FileBounds.all(spark, s"$root/filebounds")
    val d9 = b.filter(col("day") === 9).collect()
    assert(d9.length == 1 && d9(0).getAs[Long]("nn_tag") == 2 &&
      d9(0).getAs[String]("min_tag") == null,
      s"day 9's over-cap file must withhold its string bounds: ${d9.toSeq}")
    def q(s: SparkSession) = lake(s, root)
      .filter(col("tag") >= lit("m") && col("tag") < lit("o"))
      .select("source_file", "user_id", "tag", "day")
    val want = q(spark).collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(want.length == 2) // day 8's mike + november
    withExtendedSession { s =>
      val df = q(s)
      val (zones, nParts) = zoneScan(df)
      assert(zones.nonEmpty, "no zone predicate for a string window")
      // day 7 ([alpha,bravo]) misses [m,o) and is covered → pruned;
      // day 9's window also misses BUT its bounds are withheld →
      // uncovered → MUST be scanned (skipping on withheld bounds would
      // be a wrong-results bug); day 8 qualifies
      assert(nParts == 2, s"expected day 8 + fail-open day 9, got $nParts")
      assert(df.collect().map(_.toSeq).sortBy(_.mkString("|")).sameElements(want))
    }
  }

  test("prefix predicates prune via [p, nextPrefix(p)); boundary chars increment soundly") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-pskip").toString
    val rows = Seq(
      ("f-a", 1L, "alpha", "2024-03-07 10:00:00", 1.0, 2024, 3, 7, "training"),
      ("f-a", 2L, "amber", "2024-03-07 11:00:00", 2.0, 2024, 3, 7, "training"),
      ("f-b", 3L, "mike", "2024-03-08 09:00:00", 3.0, 2024, 3, 8, "training"),
      ("f-b", 4L, "mono", "2024-03-08 10:30:00", 4.0, 2024, 3, 8, "training"),
      ("f-c", 5L, "zeta", "2024-03-09 09:00:00", 5.0, 2024, 3, 9, "training"))
    rows.toDF("source_file", "user_id", "tag", "ts_s", "value",
        "year", "month", "day", "mode")
      .withColumn("event_time_utc", col("ts_s").cast("timestamp_ntz"))
      .drop("ts_s")
      .write.partitionBy("year", "month", "day", "mode").parquet(s"$root/curated")
    Rollup.writePartials(spark.read.parquet(s"$root/curated"), s"$root/rollup/b0")
    publishBounds(root)
    def q(s: SparkSession) = lake(s, root)
      .filter(col("tag").like("m%"))
      .select("source_file", "user_id", "tag", "day")
    val want = q(spark).collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(want.length == 2) // mike + mono
    withExtendedSession { s =>
      val df = q(s)
      val (zones, nParts) = zoneScan(df)
      assert(zones.nonEmpty, "no zone predicate for a prefix window")
      // window ["m","n"): day 7 ([alpha,amber]) and day 9 ([zeta]) prune
      assert(nParts == 1, s"expected only day 8 scanned, got $nParts")
      assert(df.collect().map(_.toSeq).sortBy(_.mkString("|")).sameElements(want))
    }
    // the increment arithmetic itself
    import graft.plans.RollupPartitionSkip.nextPrefix
    assert(nextPrefix("abc").contains("abd"))
    assert(nextPrefix("ab퟿").contains("ab")) // skips the surrogate gap
    val maxCp = new String(Character.toChars(0x10FFFF))
    assert(nextPrefix("a" + maxCp).contains("b")) // overflow walks left
    assert(nextPrefix(maxCp * 3).isEmpty) // no finite upper bound
  }

  test("membership lists prune through their [min,max] envelope, In and InSet alike") {
    val root = userLake()
    publishBounds(root)
    // a short list stays a Catalyst In; >10 literals get OptimizeIn'd
    // into an InSet — both shapes must reach the window extraction
    // (the fixpoint guard only matches In/InSet over OUR partition
    // struct, never a plain column's membership)
    def qIn(s: SparkSession) = lake(s, root)
      .filter(col("user_id").isin(100L, 200L))
      .select("source_file", "user_id", "day")
    def qInSet(s: SparkSession) = lake(s, root)
      .filter(col("user_id").isin((100L to 111L): _*))
      .select("source_file", "user_id", "day")
    val wantIn = qIn(spark).collect().map(_.toSeq).sortBy(_.mkString("|"))
    val wantSet = qInSet(spark).collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(wantIn.length == 2 && wantSet.length == 1)
    withExtendedSession { s =>
      val dfIn = qIn(s)
      val (z1, n1) = zoneScan(dfIn)
      // envelope [100,200]: day 7 ([1,2]) and day 9 ([5000,5001]) prune
      assert(z1.nonEmpty && n1 == 1, s"In-list not pruned ($n1, $z1)")
      assert(dfIn.collect().map(_.toSeq).sortBy(_.mkString("|")).sameElements(wantIn))
      val dfSet = qInSet(s)
      val optimized = dfSet.queryExecution.optimizedPlan.toString
      val (z2, n2) = zoneScan(dfSet)
      assert(z2.nonEmpty && n2 == 1,
        s"InSet not pruned ($n2, $z2); plan: $optimized")
      assert(dfSet.collect().map(_.toSeq).sortBy(_.mkString("|")).sameElements(wantSet))
    }
  }

  test("the registered q120_colrange_skip executes and matches its direct run") {
    val sfDir = "/root/testdata/sf0.001"
    val want = graft.SparkEntry.queries("q120_colrange_skip")(spark, sfDir)
      .collect().toSeq
    assert(want.nonEmpty)
    withExtendedSession { s =>
      val df = graft.SparkEntry.queries("q120_colrange_skip")(s, sfDir)
      assert(df.collect().toSeq == want, "generically-zoned q120 != direct q120")
    }
  }

  test("the registered q122_strrange_skip executes and matches its direct run") {
    val sfDir = "/root/testdata/sf0.001"
    val want = graft.SparkEntry.queries("q122_strrange_skip")(spark, sfDir)
      .collect().toSeq
    assert(want.nonEmpty)
    withExtendedSession { s =>
      val df = graft.SparkEntry.queries("q122_strrange_skip")(s, sfDir)
      assert(df.collect().toSeq == want, "string-zoned q122 != direct q122")
    }
  }

  test("past the IN cap the rewrite flips to NOT-IN over the excluded partitions") {
    val root = userLake() // 3 partitions: day 7 [1,2], day 8 [100,200], day 9 [5000+]
    publishBounds(root)
    val savedMax = RollupPartitionSkip.MaxInLiterals
    RollupPartitionSkip.MaxInLiterals = 1
    try {
      RollupPartitionSkip.clearCache()
      // two partitions qualify (> cap 1); ONE is excluded (fits) — the
      // old behavior declined entirely, the complement form prunes it
      def q(s: SparkSession) = lake(s, root)
        .filter(col("user_id") >= lit(50L))
        .select("source_file", "user_id", "day")
      val want = q(spark).collect().map(_.toSeq).sortBy(_.mkString("|"))
      assert(want.length == 4) // day 8 + day 9
      withExtendedSession { s =>
        val df = q(s)
        val (zones, nParts) = zoneScan(df)
        assert(zones.nonEmpty, "no complement predicate past the IN cap")
        assert(nParts == 2, s"excluded partition not pruned ($nParts)")
        assert(df.collect().map(_.toSeq).sortBy(_.mkString("|")).sameElements(want))
        // fixpoint: the NOT-IN conjunct is recognized as our own output
        val conds = df.queryExecution.optimizedPlan.collect {
          case fl: org.apache.spark.sql.catalyst.plans.logical.Filter => fl.condition
        }
        val nZone = conds.flatMap(c => c.collect {
          case n: org.apache.spark.sql.catalyst.expressions.Not => n
        }).size
        assert(nZone == 1, s"expected exactly one NOT-IN zone conjunct in $conds")
        // every partition qualifying (cap still 1): both sides bounded
        // out — the plan must be left alone, rows intact
        val all = lake(s, root).filter(col("user_id") >= lit(0L))
          .select("source_file", "user_id", "day")
        val (zAll, nAll) = zoneScan(all)
        assert(zAll.isEmpty && nAll == 3,
          s"all-qualifying window must leave the plan unchanged ($zAll, $nAll)")
        assert(all.count() == 6)
      }
    } finally {
      RollupPartitionSkip.MaxInLiterals = savedMax
      RollupPartitionSkip.clearCache()
    }
  }

  test("the registered q128_antiwindow_skip plans the COMPLEMENT form and matches direct") {
    // r18 "What's missing #3": the NOT-IN complement was spec- and
    // ladder-covered but had no oracle q-entry. q128 runs a wide window
    // (everything from Jan 3) under a cloned session whose IN cap is
    // lowered to 64 via the session conf — ~145 of the demo lake's
    // leaves qualify (> cap), the ~10 excluded fit — so the COMPLEMENT
    // conjunct, not a decline and not the positive form, must serve it.
    val sfDir = "/root/testdata/sf0.001"
    val direct = graft.SparkEntry.queries("q128_antiwindow_skip")(spark, sfDir)
    val (zonesPlain, nAll) = zoneScan(direct)
    assert(zonesPlain.isEmpty, "plain session must not rewrite")
    val want = direct.collect().toSeq
    assert(want.nonEmpty)
    withExtendedSession { s =>
      val df = graft.SparkEntry.queries("q128_antiwindow_skip")(s, sfDir)
      val (zones, nParts) = zoneScan(df)
      assert(zones.nonEmpty, "q128's scan carries no zone predicate")
      assert(nParts < nAll,
        s"complement form pruned nothing ($nParts of $nAll partitions)")
      // the conjunct is the complement (Not over In/InSet — the
      // optimizer may convert the literal list), never the positive IN
      import org.apache.spark.sql.catalyst.expressions.{In, InSet, Not}
      val conds = df.queryExecution.optimizedPlan.collect {
        case fl: org.apache.spark.sql.catalyst.plans.logical.Filter => fl.condition
      }
      val nNot = conds.flatMap(c => c.collect {
        case n @ Not(_: In) => n
        case n @ Not(_: InSet) => n
      }).size
      assert(nNot == 1, s"expected exactly one NOT-IN complement conjunct in $conds")
      assert(df.collect().toSeq == want, "complement-pruned q128 != direct q128")
    }
  }

  test("an OR of ranges on one column prunes through the union of windows") {
    val root = syntheticLake()
    // two windows: day-7 morning OR day-8 late-morning onward.
    // Qualifying zones: (7,training) [10:00,11:00] hits window 1;
    // (8,eval) [10:30] hits window 2. Pruned: (7,eval) [12:30] misses
    // both, (8,training) [09:00] misses both, day 9 is all-null.
    def q(s: SparkSession) = lake(s, root)
      .filter(
        (col("event_time_utc") >= lit("2024-03-07 00:00:00").cast("timestamp_ntz") &&
          col("event_time_utc") < lit("2024-03-07 12:00:00").cast("timestamp_ntz")) ||
        (col("event_time_utc") >= lit("2024-03-08 10:00:00").cast("timestamp_ntz") &&
          col("event_time_utc") < lit("2024-03-09 00:00:00").cast("timestamp_ntz")))
      .select("source_file", "user_id", "value", "day", "mode")
    val want = q(spark).collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(want.length == 3)
    withExtendedSession { s =>
      val df = q(s)
      val (zones, nParts) = zoneScan(df)
      assert(zones.nonEmpty, "no zone predicate for a two-window OR")
      assert(nParts == 2, s"expected 2 scanned partitions, got $nParts")
      assert(df.collect().map(_.toSeq).sortBy(_.mkString("|")).sameElements(want))

      // an OR whose disjuncts constrain DIFFERENT columns admits rows
      // with any value of either column — it must constrain nothing
      val mixed = lake(s, root)
        .filter(col("event_time_utc") >= lit("2024-03-08 00:00:00").cast("timestamp_ntz") ||
          col("value") > lit(5.0))
      val (zm, nm) = zoneScan(mixed)
      assert(zm.isEmpty && nm == 5,
        s"mixed-column OR must not prune ($zm, $nm)")
      assert(mixed.count() == 3) // day 8's two + day 9's 10.125
    }
  }

  test("nullness zones: IS NULL and IS NOT NULL prune on the nn counts, fail open when unknown") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-nskip").toString
    // day 7: tag fully populated; day 8: mixed; day 9: all-null tag
    val rows = Seq(
      ("f-a", 1L, "alpha", "2024-03-07 10:00:00", 1.0, 2024, 3, 7, "training"),
      ("f-a", 2L, "bravo", "2024-03-07 11:00:00", 2.0, 2024, 3, 7, "training"),
      ("f-b", 3L, "mike", "2024-03-08 09:00:00", 3.0, 2024, 3, 8, "training"),
      ("f-b", 4L, null, "2024-03-08 10:30:00", 4.0, 2024, 3, 8, "training"),
      ("f-c", 5L, null, "2024-03-09 09:00:00", 5.0, 2024, 3, 9, "training"),
      ("f-c", 6L, null, "2024-03-09 10:00:00", 6.0, 2024, 3, 9, "training"))
    rows.toDF("source_file", "user_id", "tag", "ts_s", "value",
        "year", "month", "day", "mode")
      .withColumn("event_time_utc", col("ts_s").cast("timestamp_ntz"))
      .drop("ts_s")
      .write.partitionBy("year", "month", "day", "mode").parquet(s"$root/curated")
    Rollup.writePartials(spark.read.parquet(s"$root/curated"), s"$root/rollup/b0")
    publishBounds(root)

    def qNull(s: SparkSession) = lake(s, root)
      .filter(col("tag").isNull).select("source_file", "user_id", "day")
    def qNotNull(s: SparkSession) = lake(s, root)
      .filter(col("tag").isNotNull).select("source_file", "user_id", "tag", "day")
    val wantNull = qNull(spark).collect().map(_.toSeq).sortBy(_.mkString("|"))
    val wantNot = qNotNull(spark).collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(wantNull.length == 3 && wantNot.length == 3)
    withExtendedSession { s =>
      // IS NULL: day 7 is covered with zero nulls — pruned; 8 and 9 scan
      val dfN = qNull(s)
      val (z1, n1) = zoneScan(dfN)
      assert(z1.nonEmpty && n1 == 2, s"IS NULL did not prune the no-null day ($n1, $z1)")
      assert(dfN.collect().map(_.toSeq).sortBy(_.mkString("|")).sameElements(wantNull))
      // IS NOT NULL: day 9 is covered all-null — pruned; 7 and 8 scan
      val dfNN = qNotNull(s)
      val (z2, n2) = zoneScan(dfNN)
      assert(z2.nonEmpty && n2 == 2, s"IS NOT NULL did not prune the all-null day ($n2, $z2)")
      assert(dfNN.collect().map(_.toSeq).sortBy(_.mkString("|")).sameElements(wantNot))
    }

    // mixed-generation fail-open: when day 7's bounds rows predate the
    // tag triplet, the partition is UNCOVERED for tag and IS NULL must
    // scan it despite its zero nulls
    publishBounds(root, dropRow = _.getAs[Int]("day") != 7,
      legacyOnly = true, batch = "b0")
    publishBounds(root, dropRow = _.getAs[Int]("day") == 7, batch = "b1")
    withExtendedSession { s =>
      val dfN = qNull(s)
      val (z3, n3) = zoneScan(dfN)
      // every partition is kept (7 uncovered, 8 has nulls, 9 all-null
      // satisfies IS NULL), so the rewrite adds NO predicate at all —
      // the all-qualifying fast path — and scans everything
      assert(z3.isEmpty && n3 == 3,
        s"uncovered partition was nullness-pruned — wrong-results hazard ($n3, $z3)")
      assert(dfN.collect().map(_.toSeq).sortBy(_.mkString("|")).sameElements(wantNull))
    }
  }

  test("nullness drops at file grain inside one partition; UNKNOWN files kept") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-nfskip").toString
    val lakeDir = s"$root/curated"
    def writeRows(rs: Seq[(String, Long, String, Double)]): Unit =
      rs.toDF("source_file", "user_id", "tag", "value")
        .withColumn("event_time_utc",
          lit("2024-03-07 08:00:00").cast("timestamp_ntz"))
        .withColumn("year", lit(2024)).withColumn("month", lit(3))
        .withColumn("day", lit(7)).withColumn("mode", lit("training"))
        .coalesce(1)
        .write.mode("append").partitionBy("year", "month", "day", "mode")
        .parquet(lakeDir)
    writeRows(Seq(("f-full", 1L, "alpha", 1.0), ("f-full", 2L, "bravo", 2.0)))
    writeRows(Seq(("f-null", 3L, null, 3.0), ("f-null", 4L, null, 4.0)))
    writeRows(Seq(("f-un", 5L, null, 5.0))) // bounds row dropped below
    Rollup.writePartials(spark.read.parquet(lakeDir), s"$root/rollup/b0")
    publishBounds(root, dropRow = _.getAs[Long]("nn_user_id") == 1L)
    def q(s: SparkSession) = lake(s, root)
      .filter(col("tag").isNotNull).select("source_file", "user_id", "tag")
    val want = q(spark).collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(want.length == 2)
    withExtendedSession { s =>
      val df = q(s)
      val locations = df.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation.asInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation].location
      }
      assert(locations.size == 1)
      val listed = locations.head.inputFiles
      // f-null (known all-null tag) is dropped; f-full qualifies; f-un
      // has no bounds row — UNKNOWN, must be read
      assert(listed.length == 2,
        s"expected 2 of 3 files after the nullness drop: ${listed.toSeq}")
      assert(df.collect().map(_.toSeq).sortBy(_.mkString("|")).sameElements(want))
    }
  }

  test("the registered q124_orwindow_skip and q125_nullness_skip match their direct runs") {
    val sfDir = "/root/testdata/sf0.001"
    for (name <- Seq("q124_orwindow_skip", "q125_nullness_skip")) {
      val want = graft.SparkEntry.queries(name)(spark, sfDir).collect().toSeq
      assert(want.nonEmpty, s"$name returned nothing")
      withExtendedSession { s =>
        val df = graft.SparkEntry.queries(name)(s, sfDir)
        if (name == "q124_orwindow_skip") {
          val (zones, _) = zoneScan(df)
          assert(zones.nonEmpty, s"$name's scan carries no zone predicate")
        }
        assert(df.collect().toSeq == want, s"zone-pruned $name != direct $name")
      }
    }
  }

  test("lake compaction republishes bounds: partition AND file grain survive the swap") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-cbskip").toString
    val lakeDir = s"$root/curated"
    def writeRows(rs: Seq[(String, Long, String, Double)]): Unit =
      rs.toDF("source_file", "user_id", "ts_s", "value")
        .withColumn("event_time_utc", col("ts_s").cast("timestamp_ntz"))
        .drop("ts_s")
        .withColumn("year", lit(2024)).withColumn("month", lit(3))
        .withColumn("day", lit(7)).withColumn("mode", lit("training"))
        .coalesce(1)
        .write.mode("append").partitionBy("year", "month", "day", "mode")
        .parquet(lakeDir)
    // one partition, three appended files with disjoint user ranges
    writeRows(Seq(("f-lo", 1L, "2024-03-07 08:00:00", 1.0),
      ("f-lo", 2L, "2024-03-07 09:00:00", 2.0)))
    writeRows(Seq(("f-mid", 450L, "2024-03-07 12:00:00", 5.0),
      ("f-mid", 451L, "2024-03-07 13:00:00", 6.0)))
    writeRows(Seq(("f-hi", 900L, "2024-03-07 18:00:00", 3.0),
      ("f-hi", 901L, "2024-03-07 19:00:00", 4.0)))
    Rollup.writePartials(spark.read.parquet(lakeDir), s"$root/rollup/b0")
    publishBounds(root)
    // compact the partition into ~3 user-sorted files: the rewrite must
    // publish fresh bounds for its sw1- outputs and tombstone the three
    // replaced files' rows in one atomic sidecar batch
    val bytes = new java.io.File(s"$lakeDir/year=2024/month=3/day=7/mode=training")
      .listFiles().filter(f => f.isFile && !f.getName.startsWith(".") &&
        !f.getName.startsWith("_")).map(_.length()).sum
    val report = graft.ingest.Compactor.compact(spark, lakeDir,
      maxFilesPerPartition = 0, targetBytesPerFile = (bytes + 2) / 3,
      sortCol = Some("user_id"))
    assert(report.partitionsCompacted == 1)
    graft.ingest.Compactor.sweepRetired(spark, lakeDir): Unit
    RollupPartitionSkip.clearCache()
    // the store's LIVE view now describes exactly the sw1- files: the
    // replaced names are tombstoned, the outputs have fresh rows
    val live = graft.ingest.FileBounds.all(spark, s"$root/filebounds")
      .select("data_file").collect().map(_.getString(0)).toSet
    assert(live.nonEmpty && live.forall(_.startsWith("sw1-")),
      s"store still serves replaced files' rows after the swap: $live")
    // partition-grain COVERAGE survived the swap (a double-count from
    // un-tombstoned old rows would break it and kill this prune)
    val z = graft.ingest.FileBounds.partitionZones(spark,
      s"$root/filebounds", s"$root/rollup", Seq("user_id")).collect()
    assert(z.length == 1 && z(0).getAs[Boolean]("covered_user_id"),
      s"partition no longer covered for user_id after compaction: ${z.toSeq}")
    def q(s: SparkSession) = graft.ingest.CuratedWriter.read(s, lakeDir)
      .filter(col("user_id") >= lit(1L) && col("user_id") <= lit(5L))
      .select("source_file", "user_id")
    val want = q(spark).collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(want.length == 2) // f-lo's two rows
    withExtendedSession { s =>
      val df = q(s)
      val locations = df.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation.asInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation].location
      }
      assert(locations.size == 1)
      val listed = locations.head.inputFiles
      val total = graft.ingest.CuratedWriter.read(s, lakeDir)
        .select("user_id").inputFiles.length
      // FILE-grain zone skipping on the COMPACTED files — the round-17
      // hole: sw- outputs used to be boundless and always scanned
      assert(total >= 2 && listed.length < total,
        s"no file-grain prune on compacted files ($listed of $total)")
      assert(df.collect().map(_.toSeq).sortBy(_.mkString("|")).sameElements(want),
        "compacted-lake pruning changed the answer")
    }
    // storeAudit (round 19): the operator gauge reads the same story —
    // post-swap the raw store carries originals + tombstones + fresh
    // rows (raw > live, dead = the replaced files), and the maintenance
    // fold makes tombstone removal permanent (raw == live, dead == 0,
    // one merged batch dir)
    val pre = graft.ingest.FileBounds.storeAudit(spark, s"$root/filebounds")
      .collect()(0)
    assert(pre.getAs[Long]("rows_dead") == 3L,
      s"expected the 3 replaced files tombstoned: $pre")
    assert(pre.getAs[Long]("rows_raw") > pre.getAs[Long]("rows_live"), s"$pre")
    assert(pre.getAs[Long]("rows_live") == live.size, s"$pre vs ${live.size}")
    assert(graft.ingest.FileBounds.compact(spark, s"$root/filebounds",
      maxBatchDirs = 0))
    val post = graft.ingest.FileBounds.storeAudit(spark, s"$root/filebounds")
      .collect()(0)
    assert(post.getAs[Long]("rows_dead") == 0L &&
      post.getAs[Long]("n_batches") == 1L, s"$post")
    assert(post.getAs[Long]("rows_raw") == post.getAs[Long]("rows_live"), s"$post")
    assert(post.getAs[Long]("rows_live") == live.size, s"$post vs ${live.size}")
  }

  test("a crashed swap's bounds window heals through the journal reconcile") {
    val root = userLake()
    publishBounds(root)
    val lakeDir = s"$root/curated"
    // compact day 8's partition, then SIMULATE the crash window between
    // the meta commit and the sidecar publish: delete the swap batch the
    // compactor just wrote and re-create the journal entry the crashed
    // tick would have left standing
    val report = graft.ingest.Compactor.compact(spark, lakeDir,
      maxFilesPerPartition = 0, sortCol = Some("event_time_utc"))
    assert(report.partitionsCompacted == 3)
    val fbRoot = new java.io.File(s"$root/filebounds")
    val swapDirs = fbRoot.listFiles().filter(_.getName.startsWith("swap-"))
    assert(swapDirs.length == 3, s"expected 3 swap batches: ${swapDirs.toSeq}")
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(deleteRec)
      f.delete(): Unit
    }
    swapDirs.foreach(deleteRec) // the crash: generation committed, store not
    RollupPartitionSkip.clearCache()
    // the degraded (but sound) state: old rows tombst... are STILL LIVE
    // (their tombstones vanished with the batches), sw files unknown —
    // coverage accidentally holds via the old rows, nothing breaks; the
    // reconcile must converge the store to the real listing
    val fs = new org.apache.hadoop.fs.Path(lakeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val qroot = fs.makeQualified(new org.apache.hadoop.fs.Path(lakeDir))
    var healedAny = false
    def walk(dir: org.apache.hadoop.fs.Path): Unit =
      fs.listStatus(dir).toSeq.filter(st => st.isDirectory &&
        !st.getPath.getName.startsWith(".") && !st.getPath.getName.startsWith("_"))
        .foreach { st =>
          val leaf = st.getPath
          if (fs.listStatus(leaf).exists(_.isFile)) {
            val live = graft.ingest.LakeSnapshot.liveData(fs, leaf)
              .map(_.getPath.getName)
            val rel = qroot.toUri.relativize(leaf.toUri).getPath
            val kv = rel.split('/').flatMap { seg =>
              val i = seg.indexOf('='); if (i <= 0) None
              else Some(seg.take(i) -> seg.drop(i + 1))
            }.toMap
            healedAny |= graft.ingest.FileBounds.reconcileLeaf(spark,
              s"$root/filebounds", leaf, kv("year").toInt, kv("month").toInt,
              kv("day").toInt, kv("mode"), live)
          } else walk(leaf)
        }
    walk(qroot)
    assert(healedAny, "reconcile found nothing to heal in the crash window")
    RollupPartitionSkip.clearCache()
    // post-heal: live view = sw files only, and a second reconcile is a no-op
    val live = graft.ingest.FileBounds.all(spark, s"$root/filebounds")
      .select("data_file").collect().map(_.getString(0)).toSet
    assert(live.nonEmpty && live.forall(_.startsWith("sw1-")),
      s"reconcile left stale rows live: $live")
    def q(s: SparkSession) = graft.ingest.CuratedWriter.read(s, lakeDir)
      .filter(col("user_id") >= lit(50L) && col("user_id") <= lit(400L))
      .select("source_file", "user_id", "day")
    val want = q(spark).collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(want.length == 2)
    withExtendedSession { s =>
      val df = q(s)
      val (zones, nParts) = zoneScan(df)
      assert(zones.nonEmpty && nParts == 1,
        s"healed store does not prune ($nParts, $zones)")
      assert(df.collect().map(_.toSeq).sortBy(_.mkString("|")).sameElements(want))
    }
  }

  test("the zone-fold cache is LRU: a busy session evicts the coldest fold, not every fold") {
    val root = userLake()
    publishBounds(root)
    val savedMax = RollupPartitionSkip.CacheMax
    RollupPartitionSkip.CacheMax = 2
    try {
      RollupPartitionSkip.clearCache()
      def runWin(s: SparkSession, lo: Long): Unit = {
        lake(s, root).filter(col("user_id") >= lit(lo)).count(): Unit
      }
      withExtendedSession { s =>
        val n0 = RollupPartitionSkip.foldCount.get()
        runWin(s, 50L) // fold A
        assert(RollupPartitionSkip.foldCount.get() == n0 + 1)
        runWin(s, 60L) // fold B — cache now full at CacheMax=2
        assert(RollupPartitionSkip.foldCount.get() == n0 + 2)
        runWin(s, 50L) // A again: must HIT (and refresh A's recency)
        assert(RollupPartitionSkip.foldCount.get() == n0 + 2,
          "cache miss on a window that was folded two queries ago")
        runWin(s, 70L) // fold C — evicts the LRU entry (B), not A
        assert(RollupPartitionSkip.foldCount.get() == n0 + 3)
        runWin(s, 50L) // A must still be warm after the eviction
        assert(RollupPartitionSkip.foldCount.get() == n0 + 3,
          "inserting past capacity evicted the HOT fold — LRU broken")
        runWin(s, 60L) // B was the evictee: refolds
        assert(RollupPartitionSkip.foldCount.get() == n0 + 4)
      }
    } finally {
      RollupPartitionSkip.CacheMax = savedMax
      RollupPartitionSkip.clearCache()
    }
  }

  test("a freshly published batch invalidates the zone cache") {
    val root = syntheticLake()
    val win = (df: DataFrame) => df
      .filter(col("event_time_utc") >= lit("2024-03-10 00:00:00").cast("timestamp_ntz"))
    withExtendedSession { s =>
      assert(win(lake(s, root)).count() == 0) // nothing on/after day 10 yet
      // a new batch lands day 10 rows WITH its partials (the runners'
      // atomic-publish contract); the listing signature changes, the
      // cached zone set must not serve the stale answer
      import s.implicits._
      val extra = Seq(("f-e", 9L, "2024-03-10 12:00:00", 7.0, 2024, 3, 10, "training"))
        .toDF("source_file", "user_id", "ts_s", "value", "year", "month", "day", "mode")
        .withColumn("event_time_utc", col("ts_s").cast("timestamp_ntz"))
        .drop("ts_s")
      extra.write.mode("append")
        .partitionBy("year", "month", "day", "mode").parquet(s"$root/curated")
      Rollup.writePartials(
        s.read.parquet(s"$root/curated").filter(col("day") === 10),
        s"$root/rollup/b1")
      assert(win(lake(s, root)).count() == 1,
        "stale zone cache hid a freshly published batch")
    }
  }
}
