package graft.pipeline

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.ingest._
import graft.ledger.Ledger

/** End-to-end §3.1 pipeline semantics on a hand-built mini landing zone:
  * corrupt split + DLQ, all-or-nothing file quarantine, schema drift
  * (additive and incompatible), partition layout, ledger state machine,
  * archival, idempotent re-run, and crash-retry exhaustion. */
class IngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeLines(path: String, lines: Seq[String]): Unit = {
    val p = Paths.get(path)
    Files.createDirectories(p.getParent)
    Files.write(p, lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8)): Unit
  }

  private def rec(id: String, ts: String = "2024-03-07 11:22:33.000000",
                  mode: String = "training"): String =
    s"""{"id":"$id","event_timestamp":"$ts","MODE":"$mode",""" +
      s""""metadata":{"app_version":"2.4.1","user_agent":"svc/1.0","user_id":7},""" +
      s""""payload":{"transaction_id":"t-$id","value":9.5,"props":"{\\"k\\":1}"}}"""

  private def freshLake(): LakeLayout = {
    val dir = Files.createTempDirectory("graft-ingest").toString
    LakeLayout(dir)
  }

  private lazy val lake: LakeLayout = {
    val lay = freshLake()
    writeLines(s"${lay.rawDir}/good.jsonl", Seq(rec("g-1"), rec("g-2"), rec("g-3", mode = "eval")))
    writeLines(s"${lay.rawDir}/drift.jsonl", Seq(
      s"""{"id":"d-1","event_timestamp":"2024-03-08 01:02:03.000000","MODE":"training",""" +
        s""""metadata":{"app_version":"3.0.0","user_agent":"svc/2.0","user_id":9},""" +
        s""""payload":{"transaction_id":"t-d1","value":1.25,"props":"{}","extra_nested":"xn"},""" +
        s""""extra_field":"drifted"}"""))
    writeLines(s"${lay.rawDir}/mixed.jsonl", Seq(
      rec("m-1"), """{"id": "m-2", "event_""", """not json"""))
    writeLines(s"${lay.rawDir}/nulldate.jsonl", Seq(rec("n-1", ts = "not-a-date")))
    writeLines(s"${lay.rawDir}/badmeta.jsonl", Seq(
      s"""{"id":"b-1","event_timestamp":"2024-03-07 00:00:00.000000","MODE":"training",""" +
        s""""metadata":"not-a-struct","payload":{"transaction_id":"t-b1","value":1.0,"props":"{}"}}"""))
    new BatchProcessor(spark, lay, Contracts.events, batchSize = 2).runUntilDrained()
    lay
  }

  test("dedup stage: a tick-2 near-dup of a tick-1 doc is flagged, diverted, and ledger-noted") {
    val lay = freshLake()
    def drec(id: String, text: String): String =
      s"""{"id":"$id","event_timestamp":"2024-03-07 11:22:33.000000","MODE":"training",""" +
        s""""metadata":{"app_version":"2.4.1","user_agent":"svc/1.0","user_id":7},""" +
        s""""payload":{"transaction_id":"t-$id","value":9.5,"props":"$text"}}"""
    val t1 = (0 until 50).map(i => s"tok$i").mkString(" ")
    val t1near = ((0 until 49).map(i => s"tok$i") :+ "changed").mkString(" ")
    val t2uniq = (0 until 50).map(i => s"qq$i").mkString(" ")
    val t2near = ((0 until 49).map(i => s"qq$i") :+ "flipped").mkString(" ")
    val stage = DedupStage(s"${lay.root}/dedup-index",
      id = col("record_id"), text = col("payload.props"))
    val bp = new BatchProcessor(spark, lay, Contracts.events, dedup = Some(stage))

    // tick 1: first batch — index doesn't exist yet, everything publishes
    writeLines(s"${lay.rawDir}/t1.jsonl", Seq(
      drec("a-1", t1), drec("a-2", (0 until 50).map(i => s"zz$i").mkString(" "))))
    assert(bp.runUntilDrained() == 1)
    // tick 2: b-1 near-dups a-1 (one of 50 tokens changed) — must divert
    writeLines(s"${lay.rawDir}/t2.jsonl", Seq(drec("b-1", t1near), drec("b-2", t2uniq)))
    assert(bp.runUntilDrained() == 1)
    // tick 3: c-1 near-dups b-2, a TICK-2 SURVIVOR — proves tick 2's
    // survivors were appended on commit, not just the initial build
    writeLines(s"${lay.rawDir}/t3.jsonl", Seq(drec("c-1", t2near)))
    assert(bp.runUntilDrained() == 1)

    val curatedIds = CuratedWriter.read(spark, lay.curatedDir)
      .select("record_id").collect().map(_.getString(0)).sorted.toSeq
    assert(curatedIds == Seq("a-1", "a-2", "b-2"), s"curated: $curatedIds")
    val dd = DlqWriter.read(spark, lay.dedupDlqDir)
    val flaggedRows = dd.select("record_id", "dup_of", "jac_e6").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    // both flags matched an already-INGESTED doc → audit reason "index"
    assert(dd.select("dup_reason").collect().map(_.getString(0)).toSeq ==
      Seq("index", "index"))
    val hash = (id: String) => {
      import spark.implicits._
      Seq(id).toDF("i").select(xxhash64(col("i"))).collect()(0).getLong(0)
    }
    assert(flaggedRows.map(_._1) == Seq("b-1", "c-1"))
    assert(flaggedRows(0)._2 == hash("a-1") && flaggedRows(1)._2 == hash("b-2"),
      s"dup_of mismatch: $flaggedRows")
    assert(flaggedRows.forall(_._3 >= 800000L), s"sub-threshold jac: $flaggedRows")
    // ledger audit: the files SUCCEEDED and carry the suppression note
    val led = Ledger(spark, lay.ledgerDir).snapshot()
      .filter(col("error_message").contains("near-dup"))
      .select("s3_key", "processing_status", "error_message").collect()
    assert(led.length == 2, s"expected 2 noted files: ${led.toSeq}")
    assert(led.forall(_.getString(1) == Ledger.Succeeded))
    assert(led.map(r => new File(r.getString(0)).getName).sorted.toSeq ==
      Seq("t2.jsonl", "t3.jsonl"))
    assert(led.forall(_.getString(2) == "near-dup: 1 row(s) suppressed"))
  }

  test("dedup stage: two copies arriving in ONE tick publish exactly one (intra-batch window)") {
    val lay = freshLake()
    def drec(id: String, text: String): String =
      s"""{"id":"$id","event_timestamp":"2024-03-07 11:22:33.000000","MODE":"training",""" +
        s""""metadata":{"app_version":"2.4.1","user_agent":"svc/1.0","user_id":7},""" +
        s""""payload":{"transaction_id":"t-$id","value":9.5,"props":"$text"}}"""
    val t = (0 until 50).map(i => s"ib$i").mkString(" ")
    val tnear = ((0 until 49).map(i => s"ib$i") :+ "changed").mkString(" ")
    val stage = DedupStage(s"${lay.root}/dedup-index",
      id = col("record_id"), text = col("payload.props"))
    val bp = new BatchProcessor(spark, lay, Contracts.events, dedup = Some(stage))

    // ONE tick, FIRST tick (no index exists yet — the intra-batch window
    // is the only defense): dup-1 ~ dup-2, u-1 unique
    writeLines(s"${lay.rawDir}/t1.jsonl", Seq(
      drec("dup-1", t), drec("dup-2", tnear),
      drec("u-1", (0 until 50).map(i => s"uu$i").mkString(" "))))
    assert(bp.runUntilDrained() == 1)

    val hash = (id: String) => {
      import spark.implicits._
      Seq(id).toDF("i").select(xxhash64(col("i"))).collect()(0).getLong(0)
    }
    // min keyed id survives, deterministically
    val (survivor, dropped) =
      if (hash("dup-1") < hash("dup-2")) ("dup-1", "dup-2") else ("dup-2", "dup-1")
    val curatedIds = CuratedWriter.read(spark, lay.curatedDir)
      .select("record_id").collect().map(_.getString(0)).sorted.toSeq
    assert(curatedIds == Seq(survivor, "u-1").sorted, s"curated: $curatedIds")
    // the dropped copy is flagged with its BATCH-MATE's keyed id, and
    // the audit reason distinguishes the window that caught it
    val dd = DlqWriter.read(spark, lay.dedupDlqDir)
      .select("record_id", "dup_of", "jac_e6", "dup_reason").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(dd.map(_._1) == Seq(dropped), s"dedup DLQ: $dd")
    assert(dd(0)._4 == "batch", s"intra-batch flag must carry reason 'batch': $dd")
    assert(dd(0)._2 == hash(survivor), s"dup_of must be the surviving batch-mate: $dd")
    assert(dd(0)._3 >= 800000L, s"sub-threshold jac: $dd")
    // only the survivor was indexed: a LATER copy of t flags against the
    // survivor, proving the dropped copy never reached the index
    writeLines(s"${lay.rawDir}/t2.jsonl", Seq(drec("late-1", t)))
    assert(bp.runUntilDrained() == 1)
    val dd2 = DlqWriter.read(spark, lay.dedupDlqDir)
      .filter(col("record_id") === "late-1").select("dup_of").collect()
    assert(dd2.length == 1 && dd2(0).getLong(0) == hash(survivor),
      s"late copy must match the indexed survivor: ${dd2.toSeq}")
  }

  test("fingerprint gate: near-dup images are suppressed across ticks AND within a tick") {
    val lay = freshLake()
    def irec(id: String, tokPrefix: String, img: Option[Array[Byte]]): String = {
      val imgField = img.map(b =>
        s""","img":"${java.util.Base64.getEncoder.encodeToString(b)}"""").getOrElse("")
      val text = (0 until 50).map(i => s"$tokPrefix$i").mkString(" ")
      s"""{"id":"$id","event_timestamp":"2024-03-07 11:22:33.000000","MODE":"training",""" +
        s""""metadata":{"app_version":"2.4.1","user_agent":"svc/1.0","user_id":7},""" +
        s""""payload":{"transaction_id":"t-$id","value":9.5,"props":"$text"$imgField}}"""
    }
    // imgA / imgA1: Hamming 1 apart; imgB (inverted pattern): Hamming 64
    val imgA = DedupDemo.demoImg(flip00 = false)
    val imgA1 = DedupDemo.demoImg(flip00 = true)
    val imgB = graft.queries.ImageHash.bmpGridBytes(32, 32, (r, c) =>
      if (((0xa5 >> (c / 4)) & 1) == 1) 200 else 50)
    val stage = DedupStage(s"${lay.root}/dedup-index",
      id = col("record_id"), text = col("payload.props"),
      fingerprints = Seq(DedupDemo.imageFingerprint))
    val bp = new BatchProcessor(spark, lay, Contracts.events, dedup = Some(stage))
    val hash = (id: String) => {
      import spark.implicits._
      Seq(id).toDF("i").select(xxhash64(col("i"))).collect()(0).getLong(0)
    }

    // tick 1 (FIRST tick, no index): i-1 and i-2 carry the IDENTICAL
    // image under unique texts — the intra-batch fingerprint window
    // keeps exactly one; u-1 has no image and passes untouched
    writeLines(s"${lay.rawDir}/t1.jsonl", Seq(
      irec("i-1", "aa", Some(imgA)), irec("i-2", "bb", Some(imgA)),
      irec("u-1", "cc", None)))
    assert(bp.runUntilDrained() == 1)
    val (survivor, dropped) =
      if (hash("i-1") < hash("i-2")) ("i-1", "i-2") else ("i-2", "i-1")
    val cur1 = CuratedWriter.read(spark, lay.curatedDir)
      .select("record_id").collect().map(_.getString(0)).sorted.toSeq
    assert(cur1 == Seq(survivor, "u-1").sorted, s"curated after t1: $cur1")
    val dd1 = DlqWriter.read(spark, lay.dedupDlqDir)
      .select("record_id", "dup_of", "jac_e6", "dup_reason").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(dd1 == Seq((dropped, hash(survivor), 1000000L, "fp_batch")), s"DLQ: $dd1")
    // only the survivor's fingerprint was indexed (null-fp rows never are)
    val store1 = spark.read
      .parquet(s"${lay.root}/dedup-index/${graft.queries.FingerprintIndex.Store}")
    assert(store1.count() == 1)

    // tick 2: i-3's image is ONE block off the indexed survivor → the
    // INDEX window flags it (the cross-tick near-dup the round-11 lake
    // let through); i-4's image is unrelated and publishes
    writeLines(s"${lay.rawDir}/t2.jsonl", Seq(
      irec("i-3", "dd", Some(imgA1)), irec("i-4", "ee", Some(imgB))))
    assert(bp.runUntilDrained() == 1)
    val dd2 = DlqWriter.read(spark, lay.dedupDlqDir)
      .filter(col("record_id") === "i-3")
      .select("dup_of", "jac_e6", "dup_reason").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(dd2 == Seq((hash(survivor), 984375L, "fp_index")), s"DLQ i-3: $dd2")

    // tick 3: an exact copy of i-4's image flags against i-4 — the
    // tick-2 append-on-commit fed the index
    writeLines(s"${lay.rawDir}/t3.jsonl", Seq(irec("i-5", "ff", Some(imgB))))
    assert(bp.runUntilDrained() == 1)
    val dd3 = DlqWriter.read(spark, lay.dedupDlqDir)
      .filter(col("record_id") === "i-5")
      .select("dup_of", "jac_e6", "dup_reason").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(dd3 == Seq((hash("i-4"), 1000000L, "fp_index")), s"DLQ i-5: $dd3")
    val curated = CuratedWriter.read(spark, lay.curatedDir)
      .select("record_id").collect().map(_.getString(0)).sorted.toSeq
    assert(curated == Seq(survivor, "i-4", "u-1").sorted, s"curated: $curated")
  }

  test("video fingerprint gate: near-dup clips are suppressed across ticks AND within a tick") {
    val lay = freshLake()
    def vrec(id: String, tokPrefix: String, avi: Option[Array[Byte]]): String = {
      val aviField = avi.map(b =>
        s""","avi":"${java.util.Base64.getEncoder.encodeToString(b)}"""").getOrElse("")
      val text = (0 until 50).map(i => s"$tokPrefix$i").mkString(" ")
      s"""{"id":"$id","event_timestamp":"2024-03-07 11:22:33.000000","MODE":"training",""" +
        s""""metadata":{"app_version":"2.4.1","user_agent":"svc/1.0","user_id":7},""" +
        s""""payload":{"transaction_id":"t-$id","value":9.5,"props":"$text"$aviField}}"""
    }
    // clipA / clipA1: Hamming 1 apart; clipB (inverted pattern): Hamming 64
    val pat = 0x0f0f0f0f0f0f0f0fL
    val clipA = DedupDemo.demoAvi(pat)
    val clipA1 = DedupDemo.demoAvi(pat ^ 1L)
    val clipB = DedupDemo.demoAvi(~pat)
    val stage = DedupStage(s"${lay.root}/dedup-index",
      id = col("record_id"), text = col("payload.props"),
      fingerprints = Seq(DedupDemo.videoFingerprint))
    val bp = new BatchProcessor(spark, lay, Contracts.events, dedup = Some(stage))
    val hash = (id: String) => {
      import spark.implicits._
      Seq(id).toDF("i").select(xxhash64(col("i"))).collect()(0).getLong(0)
    }

    // tick 1 (FIRST tick, no index): v-1 and v-2 carry the IDENTICAL
    // clip under unique texts — the intra-batch video window keeps
    // exactly one; u-1 has no clip and passes untouched
    writeLines(s"${lay.rawDir}/t1.jsonl", Seq(
      vrec("v-1", "aa", Some(clipA)), vrec("v-2", "bb", Some(clipA)),
      vrec("u-1", "cc", None)))
    assert(bp.runUntilDrained() == 1)
    val (survivor, dropped) =
      if (hash("v-1") < hash("v-2")) ("v-1", "v-2") else ("v-2", "v-1")
    val cur1 = CuratedWriter.read(spark, lay.curatedDir)
      .select("record_id").collect().map(_.getString(0)).sorted.toSeq
    assert(cur1 == Seq(survivor, "u-1").sorted, s"curated after t1: $cur1")
    val dd1 = DlqWriter.read(spark, lay.dedupDlqDir)
      .select("record_id", "dup_of", "jac_e6", "dup_reason").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(dd1 == Seq((dropped, hash(survivor), 1000000L, "vi_batch")), s"DLQ: $dd1")
    // only the survivor's fingerprint was indexed, in the gate's OWN
    // namespaced store (null-fp rows never are)
    val store1 = spark.read.parquet(s"${lay.root}/dedup-index/fps_vi")
    assert(store1.count() == 1)

    // tick 2: v-3's clip is ONE fingerprint bit off the indexed
    // survivor → the INDEX window flags it; v-4's clip is unrelated
    // and publishes
    writeLines(s"${lay.rawDir}/t2.jsonl", Seq(
      vrec("v-3", "dd", Some(clipA1)), vrec("v-4", "ee", Some(clipB))))
    assert(bp.runUntilDrained() == 1)
    val dd2 = DlqWriter.read(spark, lay.dedupDlqDir)
      .filter(col("record_id") === "v-3")
      .select("dup_of", "jac_e6", "dup_reason").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(dd2 == Seq((hash(survivor), 984375L, "vi_index")), s"DLQ v-3: $dd2")

    // tick 3: an exact copy of v-4's clip flags against v-4 — the
    // tick-2 append-on-commit fed the index
    writeLines(s"${lay.rawDir}/t3.jsonl", Seq(vrec("v-5", "ff", Some(clipB))))
    assert(bp.runUntilDrained() == 1)
    val dd3 = DlqWriter.read(spark, lay.dedupDlqDir)
      .filter(col("record_id") === "v-5")
      .select("dup_of", "jac_e6", "dup_reason").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(dd3 == Seq((hash("v-4"), 1000000L, "vi_index")), s"DLQ v-5: $dd3")
    val curated = CuratedWriter.read(spark, lay.curatedDir)
      .select("record_id").collect().map(_.getString(0)).sorted.toSeq
    assert(curated == Seq(survivor, "v-4", "u-1").sorted, s"curated: $curated")
  }

  test("index maintenance: fragmented stores compact on the file-count threshold; post-compaction probes are identical") {
    val lay = freshLake()
    def irec(id: String, tokPrefix: String, img: Option[Array[Byte]]): String = {
      val imgField = img.map(b =>
        s""","img":"${java.util.Base64.getEncoder.encodeToString(b)}"""").getOrElse("")
      val text = (0 until 50).map(i => s"$tokPrefix$i").mkString(" ")
      s"""{"id":"$id","event_timestamp":"2024-03-07 11:22:33.000000","MODE":"training",""" +
        s""""metadata":{"app_version":"2.4.1","user_agent":"svc/1.0","user_id":7},""" +
        s""""payload":{"transaction_id":"t-$id","value":9.5,"props":"$text"$imgField}}"""
    }
    def pat(p: Int, flip00: Boolean = false): Array[Byte] =
      graft.queries.ImageHash.bmpGridBytes(32, 32, (r, c) => {
        val bit = ((p >> (c / 4)) & 1) == 1
        val inv = flip00 && r / 4 == 0 && c / 4 == 0
        if (bit ^ inv) 200 else 50
      })
    val stage = DedupStage(s"${lay.root}/dedup-index",
      id = col("record_id"), text = col("payload.props"),
      fingerprints = Seq(DedupDemo.imageFingerprint),
      compactThresholdFiles = 2)
    val bp = new BatchProcessor(spark, lay, Contracts.events, dedup = Some(stage))
    def files(store: String): Int = {
      val d = new File(s"${lay.root}/dedup-index/$store")
      if (!d.exists) 0
      else d.listFiles.count(f => f.isFile &&
        !f.getName.startsWith("_") && !f.getName.startsWith("."))
    }

    // 5 ticks, each one UNIQUE doc with a UNIQUE image: every tick
    // appends at least one parquet file per store (bands/shingles/
    // winhashes/fps), so un-maintained stores would hold >= 5 data
    // files; the threshold-2 trigger must keep every listing bounded
    val pats = Seq(0x01, 0x02, 0x04, 0x08, 0x10) // pairwise block-Hamming >= 8
    for (k <- 1 to 5) {
      writeLines(s"${lay.rawDir}/t$k.jsonl",
        Seq(irec(s"d-$k", s"p${k}w", Some(pat(pats(k - 1))))))
      assert(bp.runUntilDrained() == 1)
    }
    for (st <- Seq("bands", "shingles", "winhashes", "fps"))
      assert(files(st) <= 3,
        s"$st: ${files(st)} files after 5 ticks — compaction never fired")

    // the compacted index must probe EXACTLY like the fragmented one:
    // a text near-dup of tick-1's doc and an image near-dup of tick-1's
    // image (Hamming 1) both flag with the same dup_of / scores the
    // uncompacted index would produce
    val hash = (id: String) => {
      import spark.implicits._
      Seq(id).toDF("i").select(xxhash64(col("i"))).collect()(0).getLong(0)
    }
    val t1near = ((0 until 49).map(i => s"p1w$i") :+ "changed").mkString(" ")
    writeLines(s"${lay.rawDir}/t6.jsonl", Seq(
      s"""{"id":"n-1","event_timestamp":"2024-03-07 11:22:33.000000","MODE":"training",""" +
        s""""metadata":{"app_version":"2.4.1","user_agent":"svc/1.0","user_id":7},""" +
        s""""payload":{"transaction_id":"t-n-1","value":9.5,"props":"$t1near"}}""",
      irec("n-2", "qq", Some(pat(0x01, flip00 = true)))))
    assert(bp.runUntilDrained() == 1)
    val dd = DlqWriter.read(spark, lay.dedupDlqDir)
      .select("record_id", "dup_of", "jac_e6", "dup_reason").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq
    assert(dd.map(x => (x._1, x._2, x._4)) ==
      Seq(("n-1", hash("d-1"), "index"), ("n-2", hash("d-1"), "fp_index")),
      s"post-compaction DLQ: $dd")
    assert(dd(0)._3 >= 800000L && dd(1)._3 == 984375L, s"scores: $dd")
    val curated = CuratedWriter.read(spark, lay.curatedDir)
      .select("record_id").collect().map(_.getString(0)).sorted.toSeq
    assert(curated == (1 to 5).map(k => s"d-$k"), s"curated: $curated")
  }

  test("two fingerprint gates keep separate stores: equal fingerprints across modalities never cross-flag") {
    val lay = freshLake()
    def pat(p: Int, flip00: Boolean = false): Array[Byte] =
      graft.queries.ImageHash.bmpGridBytes(32, 32, (r, c) => {
        val bit = ((p >> (c / 4)) & 1) == 1
        val inv = flip00 && r / 4 == 0 && c / 4 == 0
        if (bit ^ inv) 200 else 50
      })
    def b64(b: Array[Byte]) = java.util.Base64.getEncoder.encodeToString(b)
    def rrec(id: String, tokPrefix: String, img: Option[Array[Byte]],
             thumb: Option[Array[Byte]]): String = {
      val text = (0 until 50).map(i => s"$tokPrefix$i").mkString(" ")
      val extra = img.map(b => s""","img":"${b64(b)}"""").getOrElse("") +
        thumb.map(b => s""","thumb":"${b64(b)}"""").getOrElse("")
      s"""{"id":"$id","event_timestamp":"2024-03-07 11:22:33.000000","MODE":"training",""" +
        s""""metadata":{"app_version":"2.4.1","user_agent":"svc/1.0","user_id":7},""" +
        s""""payload":{"transaction_id":"t-$id","value":9.5,"props":"$text"$extra}}"""
    }
    def gateOn(field: String, tag: String): FingerprintGate =
      FingerprintGate(tag = tag, extract = df => {
        val hasField = df.schema.fields.find(_.name == "payload").exists(
          _.dataType match {
            case s: org.apache.spark.sql.types.StructType => s.fieldNames.contains(field)
            case _ => false
          })
        if (!hasField) df.withColumn(FingerprintGate.FpCol, lit(null).cast("long"))
        else {
          val withBin = df.withColumn("_fpb", unbase64(col(s"payload.$field")))
          graft.queries.ImageHash.hash(withBin, "_fpb")
            .withColumn(FingerprintGate.FpCol, col("img_hash"))
            .drop("_fpb", "img_hash", "hash_err")
        }
      })
    val stage = DedupStage(s"${lay.root}/dedup-index",
      id = col("record_id"), text = col("payload.props"),
      fingerprints = Seq(gateOn("img", "fp"), gateOn("thumb", "th")))
    val bp = new BatchProcessor(spark, lay, Contracts.events, dedup = Some(stage))

    val imgA = pat(0x5a)
    val thumbT = pat(0x33) // Hamming 32 from imgA — unrelated content
    writeLines(s"${lay.rawDir}/t1.jsonl", Seq(
      rrec("r-1", "aa", Some(imgA), Some(thumbT))))
    assert(bp.runUntilDrained() == 1)
    // both stores exist, one fingerprint each, in their own namespaces
    assert(spark.read.parquet(s"${lay.root}/dedup-index/fps").count() == 1)
    assert(spark.read.parquet(s"${lay.root}/dedup-index/fps_th").count() == 1)

    // tick 2: r-2's IMG near-dups the indexed img (fp_index); r-3's
    // THUMB near-dups the indexed thumb (th_index); r-4's THUMB is
    // byte-identical to r-1's IMG — the equal 64-bit value in the OTHER
    // modality's store must NOT flag it
    writeLines(s"${lay.rawDir}/t2.jsonl", Seq(
      rrec("r-2", "bb", Some(pat(0x5a, flip00 = true)), None),
      rrec("r-3", "cc", None, Some(pat(0x33, flip00 = true))),
      rrec("r-4", "dd", None, Some(imgA))))
    assert(bp.runUntilDrained() == 1)
    val dd = DlqWriter.read(spark, lay.dedupDlqDir)
      .select("record_id", "dup_reason").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
    assert(dd == Seq(("r-2", "fp_index"), ("r-3", "th_index")), s"DLQ: $dd")
    val curated = CuratedWriter.read(spark, lay.curatedDir)
      .select("record_id").collect().map(_.getString(0)).sorted.toSeq
    assert(curated == Seq("r-1", "r-4"), s"curated: $curated")
  }

  test("quality gate: garbage diverts with its exact score; a file with quality AND near-dup rows carries both notes") {
    val lay = freshLake()
    def drec(id: String, text: String): String =
      s"""{"id":"$id","event_timestamp":"2024-03-07 11:22:33.000000","MODE":"training",""" +
        s""""metadata":{"app_version":"2.4.1","user_agent":"svc/1.0","user_id":7},""" +
        s""""payload":{"transaction_id":"t-$id","value":9.5,"props":"$text"}}"""
    val t = (0 until 50).map(i => s"qg$i").mkString(" ")
    val tnear = ((0 until 49).map(i => s"qg$i") :+ "changed").mkString(" ")
    val garbage = Seq.fill(25)("zz").mkString(" ")
    val stage = DedupStage(s"${lay.root}/dedup-index",
      id = col("record_id"), text = col("payload.props"))
    val bp = new BatchProcessor(spark, lay, Contracts.events,
      dedup = Some(stage), quality = Some(QualityGate(col("payload.props"))))

    // tick 1: the original publishes and is indexed
    writeLines(s"${lay.rawDir}/t1.jsonl", Seq(drec("a-1", t)))
    assert(bp.runUntilDrained() == 1)
    // tick 2, ONE file: b-1 near-dups a-1 (dedup window), b-2 is garbage
    // (quality window), b-3 is clean, b-4 has NULL text (no score — the
    // gate must KEEP what it cannot judge, not silently drop it) — the
    // file publishes b-3 + b-4 and its single ledger slot carries BOTH
    // notes
    writeLines(s"${lay.rawDir}/t2.jsonl", Seq(
      drec("b-1", tnear), drec("b-2", garbage),
      drec("b-3", (0 until 50).map(i => s"ok$i").mkString(" ")),
      s"""{"id":"b-4","event_timestamp":"2024-03-07 11:22:33.000000","MODE":"training",""" +
        s""""metadata":{"app_version":"2.4.1","user_agent":"svc/1.0","user_id":7},""" +
        s""""payload":{"transaction_id":"t-b4","value":9.5,"props":null}}"""))
    assert(bp.runUntilDrained() == 1)

    val curatedIds = CuratedWriter.read(spark, lay.curatedDir)
      .select("record_id").collect().map(_.getString(0)).sorted.toSeq
    assert(curatedIds == Seq("a-1", "b-3", "b-4"), s"curated: $curatedIds")
    // quality DLQ: the garbage row with the closed-form q77 score
    val qd = DlqWriter.read(spark, lay.qualityDlqDir)
      .select("record_id", "quality_score_e6").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(qd == Seq(("b-2", DedupDemo.GarbageScoreE6)), s"quality DLQ: $qd")
    // dedup DLQ: only the near-dup (the garbage row never reached the
    // probe — quality runs first)
    val dd = DlqWriter.read(spark, lay.dedupDlqDir)
      .select("record_id").collect().map(_.getString(0)).toSeq
    assert(dd == Seq("b-1"), s"dedup DLQ: $dd")
    // one ledger slot, both notes, quality first
    val led = Ledger(spark, lay.ledgerDir).snapshot()
      .filter(col("s3_key").contains("t2.jsonl"))
      .select("processing_status", "error_message").collect()
    assert(led.length == 1 && led(0).getString(0) == Ledger.Succeeded)
    assert(led(0).getString(1) ==
      "quality: 1 row(s) suppressed; near-dup: 1 row(s) suppressed",
      s"note: ${led(0).getString(1)}")
  }

  test("quality gate: the TRAINED q84 scorer plugs in at ingest and suppresses the garbage doc") {
    import spark.implicits._
    val lay = freshLake()
    def drec(id: String, text: String): String =
      s"""{"id":"$id","event_timestamp":"2024-03-07 11:22:33.000000","MODE":"training",""" +
        s""""metadata":{"app_version":"2.4.1","user_agent":"svc/1.0","user_id":7},""" +
        s""""payload":{"transaction_id":"t-$id","value":9.5,"props":"$text"}}"""
    // train on the CurationSpec-shape corpus: weak labels from the fixed
    // gate, natural docs vs repetition-heavy garbage
    val clean = (0 until 60).map { i =>
      val words = (0 until 40).map(j => s"word${(i * 7 + j * 3) % 97}")
      (i.toLong, s"the quick item ${words.take(20).mkString(" ")} and a " +
        s"detail of ${words.drop(20).mkString(" ")} in the set")
    }
    val garbage =
      (60 until 70).map(i => (i.toLong, Seq.fill(30)(s"blob$i blob$i").mkString(" "))) ++
      (70 until 80).map(i => (i.toLong, Seq.fill(40)(s"zqxj${i}wvkpt${i}mmmm").mkString(" ")))
    val model = graft.queries.QualityModelStore.trainOn(
      (clean ++ garbage).toDF("doc_id", "text"))

    val bp = new BatchProcessor(spark, lay, Contracts.events,
      quality = Some(QualityGate.trained(col("payload.props"), model)))
    // g-1 is the q90/q106 planted garbage doc; c-1 is natural text with
    // stopwords — the trained margin must separate them at the 0 boundary
    writeLines(s"${lay.rawDir}/t1.jsonl", Seq(
      drec("c-1", "the quick brown fox jumps over a lazy dog and then " +
        "walks back to the start of the field for another run at it"),
      drec("g-1", Seq.fill(25)("zz").mkString(" "))))
    assert(bp.runUntilDrained() == 1)

    val curatedIds = CuratedWriter.read(spark, lay.curatedDir)
      .select("record_id").collect().map(_.getString(0)).toSeq
    assert(curatedIds == Seq("c-1"), s"curated: $curatedIds")
    // the DLQ audit column carries the TRAINED margin (×1e6): negative
    // for the suppressed doc, and equal to an offline re-score of the
    // same text — the ingest decision is bit-identical to the offline one
    val qd = DlqWriter.read(spark, lay.qualityDlqDir)
      .select("record_id", "quality_score_e6").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(qd.map(_._1) == Seq("g-1") && qd(0)._2 < 0L, s"quality DLQ: $qd")
    val offline = graft.queries.CurationOps.withQualityScore(
        Seq((1L, Seq.fill(25)("zz").mkString(" "))).toDF("doc_id", "text"))
      .select(org.apache.spark.sql.functions.round(model.scoreCol * 1e6).cast("long"))
      .first().getLong(0)
    assert(qd(0)._2 == offline, s"ingest score ${qd(0)._2} != offline $offline")
    // ledger note: same suppression accounting as the fixed gate
    val led = Ledger(spark, lay.ledgerDir).snapshot()
      .filter(col("s3_key").contains("t1.jsonl"))
      .select("error_message").collect()
    assert(led.length == 1 && led(0).getString(0) == "quality: 1 row(s) suppressed",
      s"note: ${led.map(_.getString(0)).toSeq}")
  }

  test("dedup stage: one file with BOTH a suppressed row and a scrubbed row carries both notes") {
    val lay = freshLake()
    def drec(id: String, text: String): String =
      s"""{"id":"$id","event_timestamp":"2024-03-07 11:22:33.000000","MODE":"training",""" +
        s""""metadata":{"app_version":"2.4.1","user_agent":"svc/1.0","user_id":7},""" +
        s""""payload":{"transaction_id":"t-$id","value":9.5,"props":"$text"}}"""
    val t1 = (0 until 50).map(i => s"tok$i").mkString(" ")
    val eUniq = (0 until 30).map(i => s"ee$i")
    val stage = DedupStage(s"${lay.root}/dedup-index",
      id = col("record_id"), text = col("payload.props"),
      spanScrub = Some((df, c) =>
        df.withColumn("payload", col("payload").withField("props", c))))
    val bp = new BatchProcessor(spark, lay, Contracts.events, dedup = Some(stage))

    writeLines(s"${lay.rawDir}/t1.jsonl", Seq(drec("a-1", t1)))
    assert(bp.runUntilDrained() == 1)
    // tick 2, ONE file: b-1 doc-level near-dups a-1 (suppressed); e-1
    // shares only a 25-token run with a-1 (published, scrubbed)
    writeLines(s"${lay.rawDir}/t2.jsonl", Seq(
      drec("b-1", ((0 until 49).map(i => s"tok$i") :+ "changed").mkString(" ")),
      drec("e-1", (eUniq ++ (0 until 25).map(i => s"tok$i")).mkString(" "))))
    assert(bp.runUntilDrained() == 1)

    val curated = CuratedWriter.read(spark, lay.curatedDir)
      .select(col("record_id"), col("payload.props").as("p")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(curated.keySet == Set("a-1", "e-1"), s"curated: ${curated.keySet}")
    assert(curated("e-1") == eUniq.mkString(" "),
      s"copied run must be scrubbed: got '${curated("e-1")}'")
    val led = Ledger(spark, lay.ledgerDir).snapshot()
      .filter(col("error_message").isNotNull && col("error_message") =!= "")
      .select("s3_key", "error_message").collect()
      .map(r => new File(r.getString(0)).getName -> r.getString(1)).toMap
    assert(led.get("t2.jsonl").contains(
      "near-dup: 1 row(s) suppressed; spans scrubbed: 1 row(s)"), s"ledger: $led")
  }

  test("span-scrub stage: a tick-2 doc sharing a paragraph with tick 1 is scrubbed, not dropped") {
    val lay = freshLake()
    def drec(id: String, text: String): String =
      s"""{"id":"$id","event_timestamp":"2024-03-07 11:22:33.000000","MODE":"training",""" +
        s""""metadata":{"app_version":"2.4.1","user_agent":"svc/1.0","user_id":7},""" +
        s""""payload":{"transaction_id":"t-$id","value":9.5,"props":"$text"}}"""
    // tick-1 doc A: 50 tokens. tick-2 doc E: 30 unique tokens followed by
    // a 25-token run copied from A — whole-doc Jaccard ~0.29 (passes the
    // 0.8 doc gate) but every W=20 window inside the copied run is
    // already in the corpus, so the run must be scrubbed before publish.
    val t1 = (0 until 50).map(i => s"tok$i").mkString(" ")
    val eUniq = (0 until 30).map(i => s"ee$i")
    val t2 = (eUniq ++ (0 until 25).map(i => s"tok$i")).mkString(" ")
    val stage = DedupStage(s"${lay.root}/dedup-index",
      id = col("record_id"), text = col("payload.props"),
      spanScrub = Some((df, c) =>
        df.withColumn("payload", col("payload").withField("props", c))))
    val bp = new BatchProcessor(spark, lay, Contracts.events, dedup = Some(stage))

    writeLines(s"${lay.rawDir}/t1.jsonl", Seq(drec("a-1", t1)))
    assert(bp.runUntilDrained() == 1)
    writeLines(s"${lay.rawDir}/t2.jsonl", Seq(drec("e-1", t2)))
    assert(bp.runUntilDrained() == 1)

    val curated = CuratedWriter.read(spark, lay.curatedDir)
      .select(col("record_id"), col("payload.props").as("p")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // both docs published (no doc-level suppression), E's run removed
    assert(curated.keySet == Set("a-1", "e-1"), s"curated: ${curated.keySet}")
    assert(curated("a-1") == t1, "tick-1 doc must be untouched")
    assert(curated("e-1") == eUniq.mkString(" "),
      s"copied run must be scrubbed: got '${curated("e-1")}'")
    // ledger carries the scrub note; nothing reached the dedup DLQ
    val led = Ledger(spark, lay.ledgerDir).snapshot()
      .filter(col("error_message").contains("spans scrubbed"))
      .select("s3_key", "error_message").collect()
    assert(led.length == 1 &&
      new java.io.File(led(0).getString(0)).getName == "t2.jsonl" &&
      led(0).getString(1) == "spans scrubbed: 1 row(s)", s"ledger: ${led.toSeq}")
    assert(!new java.io.File(lay.dedupDlqDir).exists())
  }

  test("manifest-driven discovery: listing comes from the manifest, and the drain works off it") {
    import graft.ledger.Discovery
    val lay = freshLake()
    writeLines(s"${lay.rawDir}/a.jsonl", Seq(rec("a-1"), rec("a-2")))
    writeLines(s"${lay.rawDir}/b.jsonl", Seq(rec("b-1")))
    writeLines(s"${lay.rawDir}/sub/c.jsonl", Seq(rec("c-1")))
    val walked = Discovery.listDataFiles(spark, lay.rawDir)
    assert(walked.size == 3)

    // writing the manifest switches discovery to the manifest path, with
    // identical normalized (path, size) keys
    assert(Discovery.writeManifest(spark, lay.rawDir) == 3)
    val viaManifest = Discovery.listDataFiles(spark, lay.rawDir)
    assert(viaManifest == walked,
      s"manifest listing diverged:\n$viaManifest\nvs walk:\n$walked")

    // proof the manifest is authoritative: a file landed AFTER the
    // manifest write is invisible until the producer republishes
    writeLines(s"${lay.rawDir}/late.jsonl", Seq(rec("l-1")))
    assert(Discovery.listDataFiles(spark, lay.rawDir) == walked)

    // REPUBLISH round-trip: writeManifest walks the zone again, and the
    // walk must NOT see the previous manifest's own parquet parts as
    // data (they are under _manifest/ but have ordinary part-* names) —
    // if it did, the overwrite would delete the very files it just
    // listed, leaving dangling manifest rows for the drain to choke on.
    assert(Discovery.writeManifest(spark, lay.rawDir) == 4)
    val republished = Discovery.listDataFiles(spark, lay.rawDir)
    assert(republished.map(_._1).exists(_.endsWith("late.jsonl")))
    assert(republished.size == 4)
    assert(republished.forall { case (p, _) => !p.contains("_manifest") },
      s"manifest internals leaked into discovery: $republished")

    // the drain registers and processes exactly the manifest's files
    new BatchProcessor(spark, lay, Contracts.events, batchSize = 2).runUntilDrained()
    val led = Ledger(spark, lay.ledgerDir).snapshot().collect()
    assert(led.length == 4, s"ledger rows: ${led.length}")
    assert(led.forall(_.getAs[String]("processing_status") == "SUCCEEDED"))
    val curated = CuratedWriter.read(spark, lay.curatedDir)
    assert(curated.count() == 5) // a-1 a-2 b-1 c-1 + l-1 via the republish
  }

  test("corrupt/unpartitionable records land in the DLQ with reasons; clean-file rows are curated") {
    val dlq = DlqWriter.read(spark, lake.dlqDir)
    val byReason = dlq.groupBy("reason").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // mixed: 2 corrupt + 1 stranded good; badmeta: 1 corrupt (incompatible
    // drift vs the struct contract); nulldate: 1 unpartitionable
    assert(byReason == Map(
      "corrupt_json" -> 3L, "quarantined_file" -> 1L, "null_partition_key" -> 1L))
    val curated = CuratedWriter.read(spark, lake.curatedDir)
    assert(curated.count() == 4) // 3 good + 1 drift; nothing from quarantined files
    assert(curated.select("record_id").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("d-1", "g-1", "g-2", "g-3"))
  }

  test("additive drift evolves the curated schema; older rows read as null") {
    val curated = CuratedWriter.read(spark, lake.curatedDir)
    assert(curated.columns.contains("extra_field"))
    assert(curated.filter(col("extra_field") === "drifted").count() == 1)
    assert(curated.filter(col("extra_field").isNull).count() == 3)
    // selectively-flattened nested drift survives inside payload
    assert(curated.select(col("payload.extra_nested")).collect()
      .flatMap(r => Option(r.getString(0))).toSeq == Seq("xn"))
  }

  test("partition layout is year/month/day/mode derived from the event time") {
    val d = new File(s"${lake.curatedDir}/year=2024/month=3/day=7/mode=training")
    assert(d.isDirectory, s"missing partition dir $d")
    val modes = CuratedWriter.read(spark, lake.curatedDir)
      .filter(col("day") === 7).select("mode").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    assert(modes == Seq("eval", "training"))
  }

  test("ledger reaches terminal states with audit stamps; clean files are archived") {
    val led = Ledger(spark, lake.ledgerDir).snapshot().collect()
      .map(r => new File(r.getAs[String]("s3_key")).getName ->
        (r.getAs[String]("processing_status"), r.getAs[Int]("retry_count"),
          r.getAs[java.sql.Timestamp]("processed_at"))).toMap
    assert(led("good.jsonl")._1 == Ledger.Succeeded)
    assert(led("drift.jsonl")._1 == Ledger.Succeeded)
    assert(Seq("mixed.jsonl", "nulldate.jsonl", "badmeta.jsonl")
      .forall(f => led(f)._1 == Ledger.Quarantined))
    assert(led.values.forall { case (_, retries, stamp) => retries == 1 && stamp != null })
    // S8: clean files moved raw -> raw-processed; quarantined files remain
    assert(!new File(s"${lake.rawDir}/good.jsonl").exists())
    assert(new File(s"${lake.processedDir}/good.jsonl").exists())
    assert(new File(s"${lake.rawDir}/mixed.jsonl").exists())
  }

  test("re-running the drained pipeline does no work and changes nothing (idempotence)") {
    val before = CuratedWriter.read(spark, lake.curatedDir).count()
    val ticks = new BatchProcessor(spark, lake, Contracts.events, batchSize = 2)
      .runUntilDrained()
    assert(ticks == 0)
    assert(CuratedWriter.read(spark, lake.curatedDir).count() == before)
  }

  test("file names needing URI encoding (spaces) still curate, quarantine, and archive correctly") {
    val lay = freshLake()
    writeLines(s"${lay.rawDir}/with space.jsonl", Seq(rec("s-1"), rec("s-2")))
    writeLines(s"${lay.rawDir}/bad name%20.jsonl", Seq(rec("s-3"), """{"broken"""))
    val bp = new BatchProcessor(spark, lay, Contracts.events, batchSize = 4)
    bp.runUntilDrained()
    // the clean space-named file curates and archives; the corrupt one
    // quarantines with ALL its rows dead-lettered — encoding mismatches
    // between input_file_name() and ledger keys would silently drop both
    val curated = CuratedWriter.read(spark, lay.curatedDir)
    assert(curated.select("record_id").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("s-1", "s-2"))
    assert(spark.read.json(s"${lay.dlqDir}/*").count() == 2)
    assert(new File(s"${lay.processedDir}/with space.jsonl").exists())
    val statuses = bp.ledger.snapshot().collect()
      .map(r => new File(r.getAs[String]("s3_key")).getName -> r.getAs[String]("processing_status"))
      .toMap
    assert(statuses("with space.jsonl") == Ledger.Succeeded)
    assert(statuses("bad name%20.jsonl") == Ledger.Quarantined)
  }

  test("a persistently failing batch is retried to exhaustion then quarantined (T3)") {
    val lay = freshLake()
    writeLines(s"${lay.rawDir}/ok.jsonl", Seq(rec("x-1")))
    val bp = new BatchProcessor(spark, lay, Contracts.events, batchSize = 2, maxRetries = 3)
    assert(bp.runUntilDrained() == 1)
    // single-writer contract: mutations go through the processor's ledger
    bp.ledger.register(Seq(("/nonexistent/gone.jsonl", 0L)))
    assert(bp.runUntilDrained() == 3) // three failing attempts, then exhausted
    val row = bp.ledger.snapshot().filter(col("s3_key") === "/nonexistent/gone.jsonl")
      .collect().head
    assert(row.getAs[String]("processing_status") == Ledger.Quarantined)
    assert(row.getAs[Int]("retry_count") == 3)
    assert(row.getAs[String]("error_message") != null)
  }

  test("archive failure does not re-append curated rows on retry (marker guard)") {
    val lay = freshLake()
    writeLines(s"${lay.rawDir}/ok.jsonl", Seq(rec("a-1"), rec("a-2")))
    // block the archive destination: rename onto an existing FILE fails,
    // downgrading the file to FAILED after its rows were already curated
    writeLines(s"${lay.processedDir}/ok.jsonl", Seq("blocker"))
    val bp = new BatchProcessor(spark, lay, Contracts.events, batchSize = 2, maxRetries = 5)
    bp.runOnce() // one tick only — the drain loop would retry to exhaustion
    assert(CuratedWriter.read(spark, lay.curatedDir).count() == 2)
    val firstState = bp.ledger.snapshot()
      .filter(col("s3_key").endsWith("/raw/ok.jsonl")).collect().head
    assert(firstState.getAs[String]("processing_status") != Ledger.Succeeded)

    // unblock and re-drain: the file archives and succeeds, and its rows
    // are NOT appended a second time — the curated marker excluded it
    Files.delete(Paths.get(s"${lay.processedDir}/ok.jsonl"))
    bp.runUntilDrained()
    assert(CuratedWriter.read(spark, lay.curatedDir).count() == 2,
      "retry after failed archive duplicated curated rows")
    val state = bp.ledger.snapshot()
      .filter(col("s3_key").endsWith("/raw/ok.jsonl")).collect().head
    assert(state.getAs[String]("processing_status") == Ledger.Succeeded)
    assert(new File(s"${lay.processedDir}/ok.jsonl").exists())
  }

  test("a crash between curated publish and marker write does not duplicate rows (staged atomic publish)") {
    val lay = freshLake()
    writeLines(s"${lay.rawDir}/ok.jsonl", Seq(rec("p-1"), rec("p-2")))
    // Inject the crash: a FILE squatting on the marker directory makes
    // writeMarker throw AFTER the staged batch was committed and its
    // rows published — exactly the window the old append-then-mark flow
    // could not survive.
    writeLines(s"${lay.root}/curated-markers", Seq("blocker"))
    val bp = new BatchProcessor(spark, lay, Contracts.events, batchSize = 2, maxRetries = 5)
    bp.runOnce()
    // rows are live (publish precedes markers), the tick failed at the
    // marker step, and the committed .ready staging dir awaits recovery
    assert(CuratedWriter.read(spark, lay.curatedDir).count() == 2)
    assert(bp.ledger.snapshot().filter(col("s3_key").endsWith("/raw/ok.jsonl"))
      .collect().head.getAs[String]("processing_status") != Ledger.Succeeded)
    val staged = new File(s"${lay.root}/curated-staging").listFiles()
    assert(staged != null && staged.exists(_.getName.endsWith(".ready")),
      "committed staging batch missing after marker-write crash")

    // unblock and re-drain: recovery completes the publish (writes the
    // markers), the retry skips the already-published rows, archives, and
    // succeeds — with NO duplicate curated rows
    Files.delete(Paths.get(s"${lay.root}/curated-markers"))
    bp.runUntilDrained()
    assert(CuratedWriter.read(spark, lay.curatedDir).count() == 2,
      "crash between publish and marker write duplicated curated rows")
    assert(bp.ledger.snapshot().filter(col("s3_key").endsWith("/raw/ok.jsonl"))
      .collect().head.getAs[String]("processing_status") == Ledger.Succeeded)
    assert(new File(s"${lay.processedDir}/ok.jsonl").exists())
    val leftover = new File(s"${lay.root}/curated-staging").listFiles()
    assert(leftover == null || leftover.isEmpty, "staging not cleaned up after recovery")
  }

  test("an uncommitted staging dir (crash before the ready rename) is discarded, not published") {
    val lay = freshLake()
    writeLines(s"${lay.rawDir}/ok.jsonl", Seq(rec("u-1")))
    // plant a fake uncommitted staging attempt with visible parquet-ish
    // files; recovery must delete it without moving anything
    writeLines(s"${lay.root}/curated-staging/run-99999-deadbeef/year=2024/month=3/day=7/mode=training/part-0.parquet",
      Seq("not really parquet"))
    val bp = new BatchProcessor(spark, lay, Contracts.events, batchSize = 2)
    bp.runUntilDrained()
    val curated = CuratedWriter.read(spark, lay.curatedDir)
    assert(curated.count() == 1) // only the real row; the planted file never published
    assert(new File(s"${lay.root}/curated-staging").listFiles() == null ||
      new File(s"${lay.root}/curated-staging").listFiles().isEmpty)
  }

  test("runner-published file bounds key the LIVE file names, and file-grain skip fires end-to-end") {
    import graft.ingest.FileBounds
    val lay = freshLake()
    // three single-file ticks into ONE partition, disjoint time bands —
    // the shape an hourly feed produces; batchSize=1 → one published
    // file per tick, each with its own bounds row
    Seq(("a", "08"), ("b", "13"), ("c", "19")).foreach { case (n, h) =>
      writeLines(s"${lay.rawDir}/$n.jsonl", Seq(
        rec(s"$n-1", ts = s"2024-03-07 $h:00:00.000000"),
        rec(s"$n-2", ts = s"2024-03-07 $h:30:00.000000")))
    }
    new BatchProcessor(spark, lay, Contracts.events, batchSize = 1).runUntilDrained()
    // 1. store ↔ lake NAME AGREEMENT: every bounds row names a live
    //    file, every live data file has a bounds row (a prefix drift in
    //    stagePublish would silently kill file-grain skipping — the
    //    drop set just never matches)
    val bounds = FileBounds.all(spark, lay.fileBoundsDir).collect()
      .map(r => r.getString(0) -> r.getLong(5)).toMap
    val liveNames = CuratedWriter.read(spark, lay.curatedDir)
      .select(org.apache.spark.sql.functions
        .regexp_extract(col("_metadata.file_path"), "[^/]+$", 0).as("f"))
      .groupBy("f").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bounds.keySet == liveNames.keySet,
      s"bounds names != live names: ${bounds.keySet} vs ${liveNames.keySet}")
    liveNames.foreach { case (f, n) =>
      assert(bounds(f) == n, s"bounds row count for $f: ${bounds(f)} != $n")
    }
    // 2. end-to-end: a narrow window under the extended session reads
    //    FEWER files than the partition holds — the runner-written
    //    bounds drive real listing pruning
    val base = TestSpark.spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s = org.apache.spark.sql.SparkSession.builder()
        .withExtensions(new graft.GraftExtensions().apply(_)).getOrCreate()
      graft.plans.RollupPartitionSkip.clearCache()
      val df = CuratedWriter.read(s, lay.curatedDir)
        .filter(col("event_time_utc") >= lit("2024-03-07 12:00:00").cast("timestamp_ntz") &&
          col("event_time_utc") < lit("2024-03-07 14:00:00").cast("timestamp_ntz"))
        .select("record_id")
      val listed = df.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation.asInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.inputFiles
      }.flatten
      assert(listed.length == 1,
        s"expected 1 of 3 files in the pruned listing: ${listed.toSeq}")
      assert(df.collect().map(_.getString(0)).sorted.toSeq == Seq("b-1", "b-2"))
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }

  test("compaction rewrites many partitions concurrently, preserving all rows") {
    import graft.ingest.Compactor
    import spark.implicits._
    val lakeDir = Files.createTempDirectory("graft-compact-par").toString
    // 6 single-day partitions × 3 small appends each
    (1 to 6).foreach { day =>
      (1 to 3).foreach { i =>
        Seq((s"r-$day-$i", day * 100 + i)).toDF("record_id", "v")
          .coalesce(1).write.mode("append").parquet(s"$lakeDir/day=$day")
      }
    }
    val before = spark.read.parquet(lakeDir).collect().map(_.toString).sorted.toSeq
    val report = Compactor.compact(spark, lakeDir, maxFilesPerPartition = 1, parallelism = 4)
    assert(report.partitionsCompacted == 6)
    assert(report.filesAfter < report.filesBefore)
    // snapshot read: the replaced files are retired-pending (deferred
    // deletion), live rows must be exactly the originals
    assert(CuratedWriter.read(spark, lakeDir).collect().map(_.toString).sorted.toSeq == before)
    // the NEXT maintenance invocation physically deletes the retired
    // files; after it, even a plain directory read is exact again
    assert(Compactor.sweepRetired(spark, lakeDir) > 0)
    assert(spark.read.parquet(lakeDir).collect().map(_.toString).sorted.toSeq == before)
  }

  test("compaction merges small partition files, preserving rows and drifted columns") {
    import graft.ingest.Compactor
    val lay = freshLake()
    // five single-record appends into the same partition → 5+ small
    // files; the last one carries a drifted column, so the leaf dir
    // mixes schema generations and the rewrite must union them
    (1 to 4).foreach { i =>
      writeLines(s"${lay.rawDir}/f$i.jsonl", Seq(rec(s"c-$i")))
      new BatchProcessor(spark, lay, Contracts.events, batchSize = 1).runUntilDrained(): Unit
    }
    writeLines(s"${lay.rawDir}/f5.jsonl", Seq(
      rec("c-5").stripSuffix("}") + ""","extra_field":"drifted"}"""))
    new BatchProcessor(spark, lay, Contracts.events, batchSize = 1).runUntilDrained(): Unit

    val beforeRows = CuratedWriter.read(spark, lay.curatedDir)
      .collect().map(_.toString).sorted.toSeq
    val report = Compactor.compact(spark, lay.curatedDir, maxFilesPerPartition = 1)
    assert(report.partitionsCompacted >= 1)
    assert(report.filesAfter < report.filesBefore, s"expected fewer files, got $report")
    val after = CuratedWriter.read(spark, lay.curatedDir)
    assert(after.collect().map(_.toString).sorted.toSeq == beforeRows)
    assert(after.filter(col("extra_field") === "drifted").count() == 1,
      "drifted column lost in compaction rewrite")
    // idempotent: a second pass finds nothing oversized
    assert(Compactor.compact(spark, lay.curatedDir, maxFilesPerPartition = 1)
      .partitionsCompacted == 0)

    // crash recovery: simulate death between the two swap renames by
    // hiding a live partition under its .old- name — the next run
    // restores it before compacting
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("file:///"), spark.sparkContext.hadoopConfiguration)
    val leaf = new org.apache.hadoop.fs.Path(
      s"${lay.curatedDir}/year=2024/month=3/day=7/mode=training")
    val hidden = new org.apache.hadoop.fs.Path(leaf.getParent, ".old-mode=training")
    assert(fs.rename(leaf, hidden)) // readers are now blind to the partition
    val rec2 = Compactor.compact(spark, lay.curatedDir, maxFilesPerPartition = 1)
    assert(rec2.recovered == 1)
    assert(CuratedWriter.read(spark, lay.curatedDir)
      .collect().map(_.toString).sorted.toSeq == beforeRows)
  }

  test("sorted compaction range-tiles output files by event time") {
    import graft.ingest.Compactor
    val lay = freshLake()
    // six single-record appends into one partition with interleaved
    // event times — the unsorted lake's files each span random times
    val hours = Seq("09", "03", "11", "01", "07", "05")
    hours.zipWithIndex.foreach { case (h, i) =>
      writeLines(s"${lay.rawDir}/s$i.jsonl",
        Seq(rec(s"s-$i", ts = s"2024-03-07 $h:00:00.000000")))
      new BatchProcessor(spark, lay, Contracts.events, batchSize = 1).runUntilDrained(): Unit
    }
    val leaf = s"${lay.curatedDir}/year=2024/month=3/day=7/mode=training"
    val bytes = new File(leaf).listFiles().filter(_.isFile)
      .filterNot(f => f.getName.startsWith("_") || f.getName.startsWith("."))
      .map(_.length).sum
    val before = CuratedWriter.read(spark, lay.curatedDir)
      .collect().map(_.toString).sorted.toSeq
    // target a third of the bytes so the rewrite must produce >1 file —
    // range-tiling is only observable across file boundaries
    val report = Compactor.compact(spark, lay.curatedDir, maxFilesPerPartition = 1,
      targetBytesPerFile = math.max(1L, bytes / 3), sortCol = Some("event_time_utc"))
    assert(report.partitionsCompacted == 1)
    val after = CuratedWriter.read(spark, lay.curatedDir)
    assert(after.collect().map(_.toString).sorted.toSeq == before)
    // per-file time ranges must be disjoint: each output file owns a
    // contiguous slice, so parquet row-group min/max stats can answer a
    // time predicate with zero decoded pages in non-matching files
    val ranges = after
      .groupBy(input_file_name().as("f"))
      .agg(min(col("event_time_utc").cast("string")).as("lo"),
        max(col("event_time_utc").cast("string")).as("hi"))
      .collect().map(r => (r.getString(1), r.getString(2))).sortBy(_._1)
    assert(ranges.length > 1, s"rewrite produced one file; can't observe tiling")
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) =>
        assert(hi <= lo, s"overlapping file time ranges: ${ranges.toSeq}")
      case _ =>
    }
  }

  test("tick-slot compaction keeps touched partitions tight and never walks the rest") {
    import graft.ingest.Compactor
    val lay = freshLake()
    val cfg = Compactor.TickConfig(maxFilesPerPartition = 1)
    // tick 1 creates the day-7 partition
    writeLines(s"${lay.rawDir}/a.jsonl", Seq(rec("a-1")))
    new BatchProcessor(spark, lay, Contracts.events, batchSize = 1,
      lakeCompaction = Some(cfg)).runUntilDrained(): Unit
    // fragment day-7 BEHIND the pipeline's back (same schema, so reads
    // stay clean): it is now oversized but no future tick touches it
    val frozen = s"${lay.curatedDir}/year=2024/month=3/day=7/mode=training"
    val rows = spark.read.parquet(frozen).collect()
    val schema = spark.read.parquet(frozen).schema
    (1 to 3).foreach { _ =>
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
        .coalesce(1).write.mode("append").parquet(frozen)
    }
    def nFiles(dir: String) = new File(dir).listFiles().filter(_.isFile)
      .count(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
    val frozenFiles = nFiles(frozen)
    assert(frozenFiles >= 4)
    // ticks 2..4 append to day-8 only; the slot compacts day-8 each
    // tick (touched) and must never rewrite day-7 (untouched)
    (1 to 3).foreach { i =>
      writeLines(s"${lay.rawDir}/b$i.jsonl",
        Seq(rec(s"b-$i", ts = "2024-03-08 10:00:00.000000")))
      new BatchProcessor(spark, lay, Contracts.events, batchSize = 1,
        lakeCompaction = Some(cfg)).runUntilDrained(): Unit
    }
    // clear the final tick's deferred deletions so the physical
    // file-count asserts below see the steady-state layout
    Compactor.sweepRetired(spark, lay.curatedDir): Unit
    val touched = s"${lay.curatedDir}/year=2024/month=3/day=8/mode=training"
    assert(nFiles(touched) == 1,
      s"touched partition not kept tight: ${nFiles(touched)} files")
    assert(nFiles(frozen) == frozenFiles,
      "tick-slot compaction rewrote a partition no tick touched")
    // the compacted lake still reconciles exactly against its partials
    // (the planted duplicate rows in day-7 are invisible to the partials,
    // so restrict the audit to what the pipeline actually published)
    val audit = graft.ingest.Rollup.reconcile(spark, lay.curatedDir, lay.rollupDir)
      .filter(col("mode").isin("ALL", "training"))
      .select("rows_match", "value_match", "value_e6_match", "files_match", "reach_ok")
      .collect()
    assert(audit.nonEmpty)
    // day-7 carries planted rows (flagged by design); day-8's published
    // rows must stay exact through three compaction passes
    val day8 = graft.ingest.Rollup.stats(spark, lay.rollupDir)
      .filter(col("day") === 8).select("n_rows").collect()
    assert(day8.map(_.getLong(0)).sum == 3L)
    assert(spark.read.parquet(touched).count() == 3L)
  }

  test("journal recovery heals a crashed tick-slot swap without a lake walk") {
    import graft.ingest.Compactor
    import org.apache.hadoop.fs.Path
    val lay = freshLake()
    writeLines(s"${lay.rawDir}/j.jsonl", Seq(rec("j-1")))
    new BatchProcessor(spark, lay, Contracts.events, batchSize = 1).runUntilDrained(): Unit
    val before = CuratedWriter.read(spark, lay.curatedDir)
      .collect().map(_.toString).sorted.toSeq
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("file:///"), spark.sparkContext.hadoopConfiguration)
    val root = fs.makeQualified(new Path(lay.curatedDir))
    val leaf = new Path(root, "year=2024/month=3/day=7/mode=training")
    // simulate death between the swap renames: journal entry present,
    // live dir hidden under .old- (readers are blind to the partition)
    val entryDir = new Path(root, "_compactions")
    fs.mkdirs(entryDir)
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest("year=2024/month=3/day=7/mode=training"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    val out = fs.create(new Path(entryDir, digest), true)
    out.write("year=2024/month=3/day=7/mode=training"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)); out.close()
    assert(fs.rename(leaf, new Path(leaf.getParent, ".old-mode=training")))
    // an EMPTY touched set still heals: recovery reads the journal dir,
    // not the lake tree
    val report = Compactor.maintainTouched(spark, lay.curatedDir, Seq.empty)
    assert(report.recovered == 1)
    assert(fs.listStatus(entryDir).isEmpty, "journal entry not consumed")
    assert(CuratedWriter.read(spark, lay.curatedDir)
      .collect().map(_.toString).sorted.toSeq == before)
  }

  test("schema merge: contract wins conflicts, inferred-only fields are kept") {
    val contract = StructType(Seq(
      StructField("a", StringType),
      StructField("m", StructType(Seq(StructField("x", LongType))))))
    val inferred = StructType(Seq(
      StructField("a", LongType),          // conflict -> contract
      StructField("m", StructType(Seq(
        StructField("x", StringType),      // nested conflict -> contract
        StructField("y", DoubleType)))),   // nested addition -> kept
      StructField("b", BooleanType)))      // addition -> kept
    val merged = RawJsonReader.mergePreferContract(contract, inferred)
      .asInstanceOf[StructType]
    assert(merged("a").dataType == StringType)
    assert(merged("b").dataType == BooleanType)
    val m = merged("m").dataType.asInstanceOf[StructType]
    assert(m("x").dataType == LongType && m("y").dataType == DoubleType)
  }
}
