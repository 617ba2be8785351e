package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ingest.{CuratedWriter, DlqWriter}
import graft.pipeline.{Contracts, LakeLayout}

/** Streaming semantics the modules promise: checkpointed exactly-once
  * ingest (a second AvailableNow drain processes nothing), and the
  * flatMapGroupsWithState sessionizer agreeing with the built-in
  * session_window on what the closed sessions are. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def rec(id: String, ts: String): String =
    s"""{"id":"$id","event_timestamp":"$ts","MODE":"training",""" +
      s""""metadata":{"app_version":"1.0.0","user_agent":"ua","user_id":1},""" +
      s""""payload":{"transaction_id":"t-$id","value":2.0,"props":"{}"}}"""

  test("AvailableNow drain is exactly-once across re-runs; late files are picked up") {
    val lay = LakeLayout(Files.createTempDirectory("graft-stream").toString)
    def writeFile(name: String, lines: Seq[String]): Unit = {
      val p = Paths.get(s"${lay.rawDir}/$name")
      Files.createDirectories(p.getParent)
      Files.write(p, lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8)): Unit
    }
    writeFile("a.jsonl", Seq(rec("a-1", "2024-03-07 10:00:00.000000"),
      rec("a-2", "2024-03-07 10:05:00.000000")))
    writeFile("bad.jsonl", Seq(rec("b-1", "2024-03-07 11:00:00.000000"), """{"broken"""))

    StreamingIngest.runAvailableNow(spark, lay, Contracts.events)
    assert(CuratedWriter.read(spark, lay.curatedDir).count() == 2)
    assert(spark.read.json(s"${lay.dlqDir}/*").count() == 2) // corrupt + stranded good

    // second drain: checkpoint remembers both files — nothing re-ingested
    StreamingIngest.runAvailableNow(spark, lay, Contracts.events)
    assert(CuratedWriter.read(spark, lay.curatedDir).count() == 2)

    // a newly landed file IS picked up, exactly once
    writeFile("c.jsonl", Seq(rec("c-1", "2024-03-07 12:00:00.000000")))
    StreamingIngest.runAvailableNow(spark, lay, Contracts.events)
    val curated = CuratedWriter.read(spark, lay.curatedDir)
    assert(curated.count() == 3)
    assert(curated.filter(col("record_id") === "c-1").count() == 1)

    // the streaming runner's file-bounds sidecar keys the LIVE published
    // names (the b<batchId>- prefix survives the publish rename) with
    // exact per-file row counts — the name contract the file-grain skip
    // rule matches against, proven on this runner's output too
    val bounds = graft.ingest.FileBounds.all(spark, lay.fileBoundsDir)
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    val liveNames = curated
      .select(regexp_extract(col("_metadata.file_path"), "[^/]+$", 0).as("f"))
      .groupBy("f").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bounds == liveNames,
      s"streaming bounds != live names: $bounds vs $liveNames")
  }

  test("lake compaction in the streaming slot keeps touched partitions tight across batches") {
    val lay = LakeLayout(Files.createTempDirectory("graft-stream-compact").toString)
    def writeFile(name: String, lines: Seq[String]): Unit = {
      val p = Paths.get(s"${lay.rawDir}/$name")
      Files.createDirectories(p.getParent)
      Files.write(p, lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8)): Unit
    }
    val cfg = graft.ingest.Compactor.TickConfig(
      maxFilesPerPartition = 1, sortCol = Some("event_time_utc"))
    // three drains into the same partition: each batch appends one file,
    // and the post-marker slot compacts the touched leaf back to one
    (1 to 3).foreach { i =>
      writeFile(s"f$i.jsonl", Seq(rec(s"r-$i", s"2024-03-07 1$i:00:00.000000")))
      StreamingIngest.runAvailableNow(spark, lay, Contracts.events,
        lakeCompaction = Some(cfg))
    }
    // the final batch's replaced files are retired-pending (deferred
    // deletion, the reader-safe grace cycle) — run the deferred
    // deletion before pinning the steady-state physical layout
    graft.ingest.Compactor.sweepRetired(spark, lay.curatedDir): Unit
    val leaf = new java.io.File(
      s"${lay.curatedDir}/year=2024/month=3/day=7/mode=training")
    val nFiles = Option(leaf.listFiles()).toSeq.flatten.count(f =>
      f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(nFiles == 1, s"streaming slot left $nFiles files in the touched leaf")
    val curated = CuratedWriter.read(spark, lay.curatedDir)
    assert(curated.count() == 3)
    assert(curated.select("record_id").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("r-1", "r-2", "r-3"))
    // the rollup chain survives the rewrites exactly
    val flags = graft.ingest.Rollup.reconcile(spark, lay.curatedDir, lay.rollupDir)
      .select("rows_match", "value_match", "value_e6_match", "files_match", "reach_ok")
      .collect()
    assert(flags.nonEmpty && flags.forall(r => (0 until 5).forall(i => r.getInt(i) == 1)))
  }

  test("a micro-batch replayed after a mid-publish crash does not duplicate curated rows") {
    val lay = LakeLayout(Files.createTempDirectory("graft-stream-replay").toString)
    def writeFile(name: String, lines: Seq[String]): Unit = {
      val p = Paths.get(s"${lay.rawDir}/$name")
      Files.createDirectories(p.getParent)
      Files.write(p, lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8)): Unit
    }
    writeFile("a.jsonl", Seq(rec("r-1", "2024-03-07 10:00:00.000000"),
      rec("r-2", "2024-03-07 10:05:00.000000")))
    // Inject the crash: a FILE squatting on the stream-commits dir makes
    // the commit-marker write fail AFTER the batch's curated rows were
    // published — the foreachBatch dies, the checkpoint never commits,
    // and a restart MUST replay the batch without duplicating its rows.
    Files.createDirectories(Paths.get(lay.root))
    Files.write(Paths.get(s"${lay.root}/stream-commits"),
      "blocker".getBytes(StandardCharsets.UTF_8))
    intercept[Exception] {
      StreamingIngest.runAvailableNow(spark, lay, Contracts.events)
    }
    assert(CuratedWriter.read(spark, lay.curatedDir).count() == 2,
      "publish should precede the commit marker")

    // unblock; the restart replays the uncommitted batch idempotently
    Files.delete(Paths.get(s"${lay.root}/stream-commits"))
    StreamingIngest.runAvailableNow(spark, lay, Contracts.events)
    val curated = CuratedWriter.read(spark, lay.curatedDir)
    assert(curated.count() == 2, "micro-batch replay duplicated curated rows")
    assert(curated.filter(col("record_id") === "r-1").count() == 1)

    // and the recovered stream keeps draining new files exactly-once
    writeFile("b.jsonl", Seq(rec("r-3", "2024-03-07 12:00:00.000000")))
    StreamingIngest.runAvailableNow(spark, lay, Contracts.events)
    assert(CuratedWriter.read(spark, lay.curatedDir).count() == 3)
  }

  test("streaming dedup stage: cross-delivery + intra-batch near-dups suppressed, crash replay never double-appends") {
    import graft.pipeline.DedupStage
    val lay = LakeLayout(Files.createTempDirectory("graft-stream-dedup-stage").toString)
    def drec(id: String, text: String): String =
      s"""{"id":"$id","event_timestamp":"2024-03-07 10:00:00.000000","MODE":"training",""" +
        s""""metadata":{"app_version":"1.0.0","user_agent":"ua","user_id":1},""" +
        s""""payload":{"transaction_id":"t-$id","value":2.0,"props":"$text"}}"""
    def writeFile(name: String, lines: Seq[String]): Unit = {
      val p = Paths.get(s"${lay.rawDir}/$name")
      Files.createDirectories(p.getParent)
      Files.write(p, lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8)): Unit
    }
    val hash = (id: String) => {
      import spark.implicits._
      Seq(id).toDF("i").select(xxhash64(col("i"))).collect()(0).getLong(0)
    }
    val stage = DedupStage(s"${lay.root}/dedup-index",
      id = col("record_id"), text = col("payload.props"))
    def drain(): Unit =
      StreamingIngest.runAvailableNow(spark, lay, Contracts.events, dedup = Some(stage))
    val t = (0 until 50).map(i => s"sd$i").mkString(" ")
    val tnear = ((0 until 49).map(i => s"sd$i") :+ "changed").mkString(" ")

    // delivery 1 crashes AFTER publish+append, BEFORE the commit marker
    // (a file squatting on stream-commits) — the replay must not
    // double-publish OR double-append the batch's index rows
    writeFile("a.jsonl", Seq(
      drec("a-1", t), drec("a-2", (0 until 50).map(i => s"ss$i").mkString(" "))))
    Files.createDirectories(Paths.get(lay.root))
    Files.write(Paths.get(s"${lay.root}/stream-commits"),
      "blocker".getBytes(StandardCharsets.UTF_8))
    intercept[Exception] { drain() }
    Files.delete(Paths.get(s"${lay.root}/stream-commits"))
    drain() // replay: its probe sees the crashed attempt's own index
    // entries (append ran before the crash) — the probe's self-pair
    // filter is what keeps the batch from suppressing itself here
    assert(CuratedWriter.read(spark, lay.curatedDir).count() == 2)
    val shingleIds = spark.read.parquet(s"${lay.root}/dedup-index/shingles")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(shingleIds.sorted == Seq(hash("a-1"), hash("a-2")).sorted,
      s"replay double-appended the index: $shingleIds")

    // delivery 2: b-1 near-dups a-1 ACROSS deliveries (via the replayed
    // index); c-1 ~ c-2 WITHIN the delivery (intra-batch window)
    val u = (0 until 50).map(i => s"uu$i").mkString(" ")
    val unear = ((0 until 49).map(i => s"uu$i") :+ "flip").mkString(" ")
    writeFile("b.jsonl", Seq(drec("b-1", tnear), drec("c-1", u), drec("c-2", unear)))
    drain()
    val (cSurvivor, cDropped) =
      if (hash("c-1") < hash("c-2")) ("c-1", "c-2") else ("c-2", "c-1")
    val curatedIds = CuratedWriter.read(spark, lay.curatedDir)
      .select("record_id").collect().map(_.getString(0)).sorted.toSeq
    assert(curatedIds == Seq("a-1", "a-2", cSurvivor).sorted, s"curated: $curatedIds")
    // the suppression edges match the batch runner's kernel exactly:
    // dup_of is the matched doc's keyed id in both windows
    val dd = DlqWriter.read(spark, lay.dedupDlqDir)
      .select("record_id", "dup_of").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dd == Map("b-1" -> hash("a-1"), cDropped -> hash(cSurvivor)),
      s"dedup DLQ edges: $dd")
    // a third delivery near-dup of the intra-batch survivor proves the
    // survivor (and only it) was appended on commit
    writeFile("c.jsonl", Seq(drec("late-1", u)))
    drain()
    val late = DlqWriter.read(spark, lay.dedupDlqDir)
      .filter(col("record_id") === "late-1").select("dup_of").collect()
    assert(late.length == 1 && late(0).getLong(0) == hash(cSurvivor))
  }

  test("video fingerprint gate in the streaming twin: near-dup clips suppressed across deliveries; crash replay never double-appends the store") {
    import graft.pipeline.{DedupDemo, DedupStage}
    val lay = LakeLayout(Files.createTempDirectory("graft-stream-vi-gate").toString)
    def vrec(id: String, tokPrefix: String, avi: Array[Byte]): String = {
      val text = (0 until 50).map(i => s"$tokPrefix$i").mkString(" ")
      val a = java.util.Base64.getEncoder.encodeToString(avi)
      s"""{"id":"$id","event_timestamp":"2024-03-07 10:00:00.000000","MODE":"training",""" +
        s""""metadata":{"app_version":"1.0.0","user_agent":"ua","user_id":1},""" +
        s""""payload":{"transaction_id":"t-$id","value":2.0,"props":"$text","avi":"$a"}}"""
    }
    def writeFile(name: String, lines: Seq[String]): Unit = {
      val p = Paths.get(s"${lay.rawDir}/$name")
      Files.createDirectories(p.getParent)
      Files.write(p, lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8)): Unit
    }
    val hash = (id: String) => {
      import spark.implicits._
      Seq(id).toDF("i").select(xxhash64(col("i"))).collect()(0).getLong(0)
    }
    val pat = 0x5aa5c33c0ff0e11eL
    val qat = 0x1234fedc5678ba98L
    val stage = DedupStage(s"${lay.root}/dedup-index",
      id = col("record_id"), text = col("payload.props"),
      fingerprints = Seq(DedupDemo.videoFingerprint))
    // the streaming twin runs on a STATIC schema (no per-tick inference,
    // unlike the ledger runner) — a multimodal stream must DECLARE its
    // payload columns for the gate's extract to see them
    val contract = Contracts.eventsWithPayload(
      "avi" -> org.apache.spark.sql.types.StringType)
    def drain(): Unit =
      StreamingIngest.runAvailableNow(spark, lay, contract, dedup = Some(stage))

    // delivery 1: v-1 / v-2 carry UNRELATED clips; the batch crashes
    // AFTER publish + staged fingerprint append, BEFORE the commit
    // marker — the replay must not double-append fps_vi
    writeFile("a.jsonl", Seq(
      vrec("v-1", "va", DedupDemo.demoAvi(pat)),
      vrec("v-2", "vb", DedupDemo.demoAvi(~pat))))
    Files.createDirectories(Paths.get(lay.root))
    Files.write(Paths.get(s"${lay.root}/stream-commits"),
      "blocker".getBytes(StandardCharsets.UTF_8))
    intercept[Exception] { drain() }
    Files.delete(Paths.get(s"${lay.root}/stream-commits"))
    drain() // replay: the probe sees the crashed attempt's own fps and
    // self-filters; the staged append's replay token sweeps its files
    assert(CuratedWriter.read(spark, lay.curatedDir).count() == 2)
    val fpRows = spark.read.parquet(s"${lay.root}/dedup-index/fps_vi")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(fpRows.sorted == Seq(hash("v-1"), hash("v-2")).sorted,
      s"replay double-appended fps_vi: $fpRows")

    // delivery 2: v-3's clip is one bit off v-1's (INDEX window, via the
    // replayed store); w-1 ~ w-2 carry the identical clip (intra-batch)
    writeFile("b.jsonl", Seq(
      vrec("v-3", "vc", DedupDemo.demoAvi(pat ^ 1L)),
      vrec("w-1", "vd", DedupDemo.demoAvi(qat)),
      vrec("w-2", "ve", DedupDemo.demoAvi(qat))))
    drain()
    val (wSurvivor, wDropped) =
      if (hash("w-1") < hash("w-2")) ("w-1", "w-2") else ("w-2", "w-1")
    val dd = DlqWriter.read(spark, lay.dedupDlqDir)
      .select("record_id", "dup_of", "jac_e6", "dup_reason").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
      .sortBy(_._1)
    assert(dd == Seq(
      ("v-3", hash("v-1"), 984375L, "vi_index"),
      (wDropped, hash(wSurvivor), 1000000L, "vi_batch")), s"dedup DLQ: $dd")

    // delivery 3: an exact copy of the w-survivor's clip flags against
    // it — the staged append-on-commit fed the store
    writeFile("c.jsonl", Seq(vrec("w-3", "vf", DedupDemo.demoAvi(qat))))
    drain()
    val late = DlqWriter.read(spark, lay.dedupDlqDir)
      .filter(col("record_id") === "w-3")
      .select("dup_of", "dup_reason").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(late == Seq((hash(wSurvivor), "vi_index")), s"late copy: $late")
    val curated = CuratedWriter.read(spark, lay.curatedDir)
      .select("record_id").collect().map(_.getString(0)).sorted.toSeq
    assert(curated == Seq("v-1", "v-2", wSurvivor).sorted, s"curated: $curated")
  }

  test("quality gate in the streaming twin: garbage diverts before the probe; survivors publish and index") {
    import graft.pipeline.{DedupDemo, DedupStage, QualityGate}
    val lay = LakeLayout(Files.createTempDirectory("graft-stream-quality").toString)
    def drec(id: String, text: String): String =
      s"""{"id":"$id","event_timestamp":"2024-03-07 10:00:00.000000","MODE":"training",""" +
        s""""metadata":{"app_version":"1.0.0","user_agent":"ua","user_id":1},""" +
        s""""payload":{"transaction_id":"t-$id","value":2.0,"props":"$text"}}"""
    def writeFile(name: String, lines: Seq[String]): Unit = {
      val p = Paths.get(s"${lay.rawDir}/$name")
      Files.createDirectories(p.getParent)
      Files.write(p, lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8)): Unit
    }
    val hash = (id: String) => {
      import spark.implicits._
      Seq(id).toDF("i").select(xxhash64(col("i"))).collect()(0).getLong(0)
    }
    val stage = DedupStage(s"${lay.root}/dedup-index",
      id = col("record_id"), text = col("payload.props"))
    def drain(): Unit = StreamingIngest.runAvailableNow(spark, lay, Contracts.events,
      dedup = Some(stage), quality = Some(QualityGate(col("payload.props"))))
    val t = (0 until 50).map(i => s"sq$i").mkString(" ")

    // delivery 1: a-1 clean, a-2 garbage — the gate diverts a-2 with the
    // closed-form score; only a-1 publishes and only a-1 is indexed
    writeFile("a.jsonl", Seq(
      drec("a-1", t), drec("a-2", Seq.fill(25)("zz").mkString(" "))))
    drain()
    val curated1 = CuratedWriter.read(spark, lay.curatedDir)
      .select("record_id").collect().map(_.getString(0)).toSeq
    assert(curated1 == Seq("a-1"), s"curated: $curated1")
    val qd = DlqWriter.read(spark, lay.qualityDlqDir)
      .select("record_id", "quality_score_e6").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(qd == Seq(("a-2", DedupDemo.GarbageScoreE6)), s"quality DLQ: $qd")
    val shingleIds = spark.read.parquet(s"${lay.root}/dedup-index/shingles")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(shingleIds == Seq(hash("a-1")), s"index must hold only the survivor: $shingleIds")

    // delivery 2: a near-dup of a-1 still flags through the dedup probe
    // (the gates compose in the ledger runner's order)
    writeFile("b.jsonl", Seq(
      drec("b-1", ((0 until 49).map(i => s"sq$i") :+ "flip").mkString(" "))))
    drain()
    val dd = DlqWriter.read(spark, lay.dedupDlqDir)
      .select("record_id", "dup_of").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dd == Map("b-1" -> hash("a-1")), s"dedup DLQ: $dd")
  }

  test("flatMapGroupsWithState closed sessions == session_window sessions minus each user's last") {
    import spark.implicits._
    val ev = graft.engine.Tables.load(spark, sf, "events")

    // truth from the batch session_window operator (oracle-checked as q47)
    val all = ev.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"))
      .select("user_id", "n_events", "start_us", "end_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val lastStart = all.groupBy(_._1).map { case (u, rows) => u -> rows.map(_._3).max }
    val truth = all.filterNot { case (u, _, s, _) => lastStart(u) == s }.toSet

    // streamed through the custom-state operator
    val input = MemoryStream[EventStreams.SessionEvent](spark)
    input.addData(ev.select(col("user_id"), col("ts_us"))
      .as[EventStreams.SessionEvent].collect().toSeq)
    val name = "closed_sessions_spec"
    EventStreams.closedSessions(input.toDS(), 30)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start().awaitTermination()
    val got = spark.table(name)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == truth,
      s"closed-session mismatch: extra=${(got -- truth).take(3)} missing=${(truth -- got).take(3)}")
  }

  test("watermarked hourly windows emit finalized counts in append mode") {
    import spark.implicits._
    val ev = graft.engine.Tables.load(spark, sf, "events")
    val truth = ev.groupBy(window(col("ts").cast("timestamp"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("h"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val rows = ev.select(col("ts").as("event_time_utc")).coalesce(1)

    val dir = Files.createTempDirectory("graft-wm").toString
    rows.write.parquet(s"$dir/data")
    val src = spark.readStream.schema(rows.schema).parquet(s"$dir/data")
    val name = "wm_hourly_spec"
    EventStreams.hourlyCounts(src, "event_time_utc")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start().awaitTermination()
    val got = spark.table(name).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // append mode only emits windows the final watermark (max event - 2h)
    // has passed; every emitted window must carry its exact final count
    assert(got.nonEmpty)
    assert(got.forall { case (h, n) => truth.get(h).contains(n) },
      s"non-final window emitted: ${got.filterNot { case (h, n) => truth.get(h).contains(n) }.take(3)}")
    val flushedThrough = truth.keys.max - 2 * 3600000000L
    assert(got.keys.toSeq.sorted == truth.keys.filter(_ < flushedThrough - 3600000000L).toSeq.sorted ||
      got.size >= truth.count(_._1 < flushedThrough - 3600000000L),
      "watermark did not flush completed windows")
  }

  test("the q77 quality-score gate applies unchanged to a stream (scan-only claim)") {
    // withQualityScore is pure per-row column algebra, so the SAME
    // function must gate a readStream exactly as it gates a batch scan
    // — the property that lets a deployment reuse the curation gate in
    // its streaming ingest path with no rewrite.
    val docs = graft.engine.Tables.load(spark, sf, "documents")
      .select("doc_id", "text")
    val truth = graft.queries.CurationOps.withQualityScore(docs)
      .filter(col("quality_score_e6") >= graft.queries.CurationOps.QualityMinE6)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    val dir = Files.createTempDirectory("graft-qgate").toString
    docs.coalesce(1).write.parquet(s"$dir/data")
    val src = spark.readStream.schema(docs.schema).parquet(s"$dir/data")
    val name = "q77_stream_gate"
    graft.queries.CurationOps.withQualityScore(src)
      .filter(col("quality_score_e6") >= graft.queries.CurationOps.QualityMinE6)
      .select("doc_id")
      .writeStream.format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start().awaitTermination()
    val got = spark.table(name).collect().map(_.getLong(0)).toSet
    assert(got == truth, s"stream gate kept ${got.size} docs, batch kept ${truth.size}")
  }

  test("stream-stream view->purchase join emits exactly the batch join's pairs") {
    val ev = graft.engine.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_type"), col("ts_us"))
    def side(t: String, uid: String, us: String) =
      ev.filter(col("event_type") === t)
        .select(col("user_id").as(uid), col("ts_us").as(us))
    val truth = side("view", "user_id", "v_us")
      .join(side("purchase", "p_user", "p_us"),
        col("user_id") === col("p_user") && col("p_us") > col("v_us") &&
          col("p_us") <= col("v_us") + 1800000000L)
      .select("user_id", "v_us", "p_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val streamed = graft.pipeline.StreamDemo.ensureStreamJoin(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(truth.nonEmpty)
    assert(streamed == truth,
      s"missing=${(truth -- streamed).take(3)} extra=${(streamed -- truth).take(3)}")
  }

  test("streaming dedup of a replayed landing zone emits each event exactly once") {
    val deduped = graft.pipeline.StreamDemo.ensureStreamDedup(spark, sf)
    val ids = deduped.select("event_id").collect().map(_.getLong(0))
    assert(ids.length === ids.distinct.length, "dedup must emit no event twice")
    val truth = graft.engine.Tables.load(spark, sf, "events")
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(ids.toSet === truth, "deduped stream must equal the original event set")
    // the landing zone really contained replays (shards 5-6 delivered twice)
    val landing = spark.read.parquet(graft.pipeline.StreamDemo.streamDedupLanding(sf))
    assert(landing.count() > truth.size, "fixture must contain replayed rows")
  }

  test("probeStream watermark contract: continuous form emits the same edges with aged-out state") {
    // The q86 harness drains AvailableNow (watermark = None is legal);
    // a CONTINUOUS caller must pass the event-time watermark. Assert the
    // watermarked form (1) finds the same verified edge, (2) carries the
    // event-time column through to the output, and (3) actually runs the
    // state-bounded dedup (a watermark is present on the state operator).
    import spark.implicits._
    import org.apache.spark.sql.types._
    val tmp = Files.createTempDirectory("graft-wmprobe").toString
    def doc(p: String, last: String): String =
      ((0 until 49).map(i => s"$p$i") :+ last).mkString(" ")
    graft.queries.MinHashIndex.append(spark, s"$tmp/idx",
      Seq((1L, doc("aa", "aa49")), (2L, doc("bb", "bb49"))).toDF("doc_id", "text"))
    Seq((3L, doc("aa", "zz"), java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
        (4L, doc("cc", "cc49"), java.sql.Timestamp.valueOf("2024-01-01 00:01:00")))
      .toDF("doc_id", "text", "ts").coalesce(1).write.parquet(s"$tmp/landing")
    val src = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType), StructField("ts", TimestampType))))
      .parquet(s"$tmp/landing")
    val q = graft.queries.MinHashIndex
      .probeStream(spark, s"$tmp/idx", src, minJ = 0.8,
        watermark = Some("ts" -> "10 minutes"))
      .writeStream.format("memory").queryName("wm_probe").outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table("wm_probe")
    assert(out.columns.toSeq == Seq("new_id", "old_id", "jac_e6", "ts"),
      "watermarked form must carry the event-time column through")
    val rows = out.select("new_id", "old_id", "jac_e6").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == Seq((3L, 1L, 959184L)), s"edges: $rows")
    val st = q.lastProgress.stateOperators
    assert(st.nonEmpty && st.exists(_.operatorName.toLowerCase.contains("dedupe")),
      s"expected a dedup state operator: ${st.map(_.operatorName).toSeq}")
  }

  test("probeStream under a continuous trigger: pair-dedup state provably evicts") {
    // The round-11 contract made AvailableNow the only legal drain
    // without a watermark; this pins the CONTINUOUS side of the deal:
    // under a ProcessingTime trigger with the event-time watermark, the
    // emitted-edge state of dropDuplicatesWithinWatermark is REMOVED as
    // the watermark advances — state is bounded by the dup pairs inside
    // one watermark window, not by the run's lifetime.
    import spark.implicits._
    import org.apache.spark.sql.types._
    val tmp = Files.createTempDirectory("graft-contprobe").toString
    def doc(p: String, last: String): String =
      ((0 until 49).map(i => s"$p$i") :+ last).mkString(" ")
    graft.queries.MinHashIndex.append(spark, s"$tmp/idx",
      Seq((1L, doc("aa", "aa49")), (2L, doc("bb", "bb49")),
          (3L, doc("cc", "cc49"))).toDF("doc_id", "text"))
    // three landing files = three micro-batches (maxFilesPerTrigger=1),
    // each one edge, event times an hour apart with a 10-minute delay —
    // by batch 3 the 00:00 pair key is far below the watermark
    def land(name: String, id: Long, p: String, ts: String): Unit =
      Seq((id, doc(p, "zz"), java.sql.Timestamp.valueOf(ts)))
        .toDF("doc_id", "text", "ts").coalesce(1).write.parquet(s"$tmp/landing/$name")
    land("f1", 11L, "aa", "2024-01-01 00:00:00")
    land("f2", 12L, "bb", "2024-01-01 01:00:00")
    land("f3", 13L, "cc", "2024-01-01 02:00:00")
    val src = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType), StructField("ts", TimestampType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/landing/*")
    val q = graft.queries.MinHashIndex
      .probeStream(spark, s"$tmp/idx", src, minJ = 0.8,
        watermark = Some("ts" -> "10 minutes"))
      .writeStream.format("memory").queryName("cont_probe").outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (spark.table("cont_probe").count() < 3 && System.nanoTime() < deadline)
      Thread.sleep(100)
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("cont_probe").select("new_id", "old_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set((11L, 1L), (12L, 2L), (13L, 3L)), s"edges: $rows")
    // the state-bound evidence: keys were REMOVED as the watermark
    // advanced, and the final state holds fewer keys than were emitted
    val progs = q.recentProgress.toSeq
    val removed = progs.flatMap(_.stateOperators).map(_.numRowsRemoved).sum
    assert(removed >= 1, s"no state eviction observed across ${progs.size} progresses")
    val finalState = progs.flatMap(_.stateOperators).lastOption.map(_.numRowsTotal)
    assert(finalState.exists(_ < 3), s"state did not stay bounded: $finalState")
  }
}
