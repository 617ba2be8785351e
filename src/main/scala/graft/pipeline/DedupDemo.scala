package graft.pipeline

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lit, unbase64}
import scala.collection.mutable

/** Builds (once per JVM per scale factor) a mini-lake whose ingest runs
  * the FULL dedup gate — [[DedupStage]] with the span scrubber — over a
  * hand-designed three-tick landing zone, so the dedup-DLQ audit query
  * (q90) has a complete suppression history to interrogate: the DLQ the
  * reference treats as the operator's audit surface
  * (psuedo_code.txt:195-208), here extended to near-dup suppressions.
  *
  * The fixture is engineered so every suppression outcome is forced and
  * its exact Jaccard is a closed form (docs are 50 distinct tokens; a
  * near-copy changes only the LAST token, so exactly 1 of the 48
  * 3-token shingles differs: jac_e6 = round(47e6/49) = 959184 for every
  * planted pair, whichever copy survives — the near-dup groups are
  * cliques, so survivor choice can't change later match results):
  *
  *   tick 1 (run-00001): a-1 ~ a-2 (same-tick pair → ONE survives the
  *     intra-batch window, reason "batch"), a-3, a-4 unique; a-5 is
  *     GARBAGE (25 identical tokens → the q77 score is the closed form
  *     [[GarbageScoreE6]] < 0) — the quality gate diverts it to the
  *     quality DLQ before the dedup probe ever sees it. d-1 and d-2
  *     carry IDENTICAL base64 BMP payloads under unique texts — the
  *     FINGERPRINT intra-batch window flags one (reason "fp_batch",
  *     sim_e6 = 1000000: Hamming 0) and the survivor's fingerprint is
  *     indexed on commit.
  *   tick 2 (run-00003): b-1 ~ the tick-1 "aa" survivor (index probe,
  *     reason "index"); b-2 unique; b-3 = 30 fresh tokens + a 25-token
  *     run copied from a-1 — BELOW the 0.8 doc gate but every interior
  *     W=20 window is already indexed, so it publishes SCRUBBED
  *     (ledger note "spans scrubbed: 1 row(s)"). No image payloads —
  *     the curated frame has no `payload.img` field this tick, which
  *     also pins the gate's absent-column null path.
  *   tick 3 (run-00005): c-1 ~ b-2, a TICK-2 SURVIVOR (proves
  *     append-on-commit feeds the audit trail too); c-2 unique; d-3's
  *     image is the tick-1 image with ONE block inverted — the
  *     fingerprint INDEX probe flags it (reason "fp_index", sim_e6 =
  *     984375: Hamming 1 vs whichever of d-1/d-2 survived, identical
  *     either way).
  *
  * Even run-ids are the drain loop's empty closing ticks. Expected lake
  * state: 7 curated docs, 5 dedup-DLQ rows (1 batch + 2 index, all
  * jac_e6 = 959184; 1 fp_batch at 1000000 + 1 fp_index at 984375),
  * 1 quality-DLQ row (a-5, score [[GarbageScoreE6]]), 3 noted ledger
  * files (t1 carries the quality AND near-dup notes "; "-joined).
  */
object DedupDemo {
  private val built = mutable.Map.empty[String, LakeLayout]

  /** jac_e6 of every planted near-pair: 47 of 49 distinct shingles
    * shared (50 distinct tokens, last token changed). */
  val PairJacE6: Long = math.round(47e6 / 49) // = 959184

  /** q77 score of the planted garbage doc (25 × "zz"): stop = 0,
    * dup2_e6 = round((1 − 1/24)·1e6) = 958333 (one distinct bigram),
    * toklen_e6 = 2e6 (2-char tokens) → |2e6−5e6| div 5 = 600000,
    * length bonus = 10000·25: 0 − 3·958333 − 600000 + 250000. */
  val GarbageScoreE6: Long = -3224999L

  private def writeLines(path: String, lines: Seq[String]): Unit = {
    val p = Paths.get(path)
    Files.createDirectories(p.getParent)
    Files.write(p, lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8)): Unit
  }

  private def rec(id: String, text: String, img: Option[Array[Byte]] = None): String = {
    val imgField = img.map(b =>
      s""","img":"${java.util.Base64.getEncoder.encodeToString(b)}"""").getOrElse("")
    s"""{"id":"$id","event_timestamp":"2024-03-07 11:22:33.000000","MODE":"training",""" +
      s""""metadata":{"app_version":"2.4.1","user_agent":"svc/1.0","user_id":7},""" +
      s""""payload":{"transaction_id":"t-$id","value":9.5,"props":"$text"$imgField}}"""
  }

  private def base(p: String): String = (0 until 50).map(i => s"$p$i").mkString(" ")
  private def near(p: String, tail: String): String =
    ((0 until 49).map(i => s"$p$i") :+ tail).mkString(" ")

  /** 32×32 24bpp BMP with the 8×8 block pattern 0x5A per block row;
    * `flip00` inverts block (0,0) — exactly one fingerprint bit, so the
    * planted image pair distances are closed forms (0 and 1). */
  def demoImg(flip00: Boolean): Array[Byte] =
    graft.queries.ImageHash.bmpGridBytes(32, 32, (r, c) => {
      val bit = ((0x5a >> (c / 4)) & 1) == 1
      val inv = flip00 && r / 4 == 0 && c / 4 == 0
      if (bit ^ inv) 200 else 50
    })

  /** The demo's fingerprint extract: base64-decode `payload.img` (when
    * the tick's curated schema has it — inference only sees the field
    * on ticks whose raw JSON carries images) and block-hash it; rows
    * without a decodable image get a null fingerprint and pass. */
  def imageFingerprint: FingerprintGate = FingerprintGate(extract = df => {
    val hasImg = df.schema.fields.find(_.name == "payload").exists(
      _.dataType match {
        case s: org.apache.spark.sql.types.StructType => s.fieldNames.contains("img")
        case _ => false
      })
    if (!hasImg) df.withColumn(FingerprintGate.FpCol, lit(null).cast("long"))
    else {
      val withBin = df.withColumn("_fp_bytes", unbase64(col("payload.img")))
      graft.queries.ImageHash.hash(withBin, "_fp_bytes")
        .withColumn(FingerprintGate.FpCol, col("img_hash"))
        .drop("_fp_bytes", "img_hash", "hash_err")
    }
  })

  /** The multi-gate demo's AUDIO fingerprint gate (tag `au`, store
    * `fps_au`): base64-decode `payload.wav`, parse the WAV container,
    * sample EVERY 20 ms frame, and pack the q98 RMS-delta fingerprint
    * (bit k = rms rises across frame pair k). The per-doc fingerprint
    * is computed by the q98 kernel verbatim (decode → frame sample →
    * one codegen higher-order aggregate) and joined back by the gate's
    * keyed id, so rows without a decodable WAV get a null fingerprint
    * and pass — the gate family's total-function contract. */
  def audioFingerprint: FingerprintGate = FingerprintGate(tag = "au", extract = df => {
    val hasWav = df.schema.fields.find(_.name == "payload").exists(
      _.dataType match {
        case s: org.apache.spark.sql.types.StructType => s.fieldNames.contains("wav")
        case _ => false
      })
    if (!hasWav) df.withColumn(FingerprintGate.FpCol, lit(null).cast("long"))
    else {
      val bin = df
        .select(col("_dedup_id").as("doc_id"), unbase64(col("payload.wav")).as("payload"))
        .filter(col("payload").isNotNull)
      val decoded = graft.queries.AudioDecode.decode(bin)
        .filter(col("decode_err").isNull)
      val fp = graft.queries.MultimodalOps.deltaFingerprint(
        graft.queries.AudioDecode.sampleFrames(decoded, everyNth = 1), "frame_rms")
        .select(col("doc_id").as("_fp_au_id"), col("simhash").as(FingerprintGate.FpCol))
      df.join(org.apache.spark.sql.functions.broadcast(fp),
        col("_dedup_id") === col("_fp_au_id"), "left").drop("_fp_au_id")
    }
  })

  /** PCM16 WAV whose RMS-delta fingerprint IS `pattern`: frame 2k has
    * amplitude 200, frame 2k+1 has 300 if pattern bit k is set else 100
    * (the q98 fixture's construction) — so planted Hamming distances
    * are closed forms: equal patterns → 0, `pattern ^ 1` → 1. */
  def demoWav(pattern: Long): Array[Byte] = {
    val amps = (0 until 129).map { f =>
      if (f % 2 == 0) 200
      else if (((pattern >>> (f / 2)) & 1L) == 1L) 300 else 100
    }
    graft.queries.AudioDecode.wavBytesVar(8000, amps, 160)
  }

  /** The multi-gate demo's VIDEO fingerprint gate (tag `vi`, store
    * `fps_vi`) — the third modality of the X5 gate matrix:
    * base64-decode `payload.avi`, parse the AVI container, sample EVERY
    * '00db' frame, and pack the q102 frame-mean delta fingerprint
    * (bit k = mean luma rises across frame pair k). Same shape as
    * [[audioFingerprint]]: the per-doc fingerprint is the q102 kernel
    * verbatim (decode → frame sample → one codegen higher-order
    * aggregate) joined back by the gate's keyed id; rows without a
    * decodable AVI get a null fingerprint and pass — the gate family's
    * total-function contract. */
  def videoFingerprint: FingerprintGate = FingerprintGate(tag = "vi", extract = df => {
    val hasAvi = df.schema.fields.find(_.name == "payload").exists(
      _.dataType match {
        case s: org.apache.spark.sql.types.StructType => s.fieldNames.contains("avi")
        case _ => false
      })
    if (!hasAvi) df.withColumn(FingerprintGate.FpCol, lit(null).cast("long"))
    else {
      val bin = df
        .select(col("_dedup_id").as("doc_id"), unbase64(col("payload.avi")).as("payload"))
        .filter(col("payload").isNotNull)
      val decoded = graft.queries.VideoDecode.decode(bin)
        .filter(col("decode_err").isNull)
      val fp = graft.queries.MultimodalOps.deltaFingerprint(
        graft.queries.VideoDecode.sampleFrames(decoded, everyNth = 1), "frame_mean")
        .select(col("doc_id").as("_fp_vi_id"), col("simhash").as(FingerprintGate.FpCol))
      df.join(org.apache.spark.sql.functions.broadcast(fp),
        col("_dedup_id") === col("_fp_vi_id"), "left").drop("_fp_vi_id")
    }
  })

  /** 8×8 AVI whose frame-mean delta fingerprint IS `pattern`: frame 2k
    * is the constant pixel 100, frame 2k+1 is 200 if pattern bit k is
    * set else 50 ([[graft.queries.VideoDecode.aviBytes]] frames have
    * exact constant means) — so planted Hamming distances are closed
    * forms: equal patterns → 0, `pattern ^ 1` → 1. */
  def demoAvi(pattern: Long): Array[Byte] =
    graft.queries.VideoDecode.aviBytes(8, 8, 40000, 129, k =>
      if (k % 2 == 0) 100
      else if (((pattern >>> (k / 2)) & 1L) == 1L) 200 else 50)

  /** Run (or reuse) the dedup-gated demo lake for this scale factor.
    * The fixture is scale-independent (the OPERATOR history is what q90
    * audits), but artifacts are cached per sf like every other demo so
    * concurrent sf runs never share mutable state. */
  def ensure(spark: SparkSession, sfDir: String): LakeLayout = synchronized {
    built.getOrElseUpdate(sfDir, {
      val sfName = new File(sfDir).getName
      val root = DemoCache.root(s"deduplake/$sfName")
      val layout = LakeLayout(root.getPath)
      DemoCache.cached(root, sfDir) {
        val stage = DedupStage(s"${layout.root}/dedup-index",
          id = col("record_id"), text = col("payload.props"),
          spanScrub = Some((df, c) =>
            df.withColumn("payload", col("payload").withField("props", c))),
          fingerprints = Seq(imageFingerprint))
        val bp = new BatchProcessor(spark, layout, Contracts.events,
          dedup = Some(stage),
          quality = Some(QualityGate(text = col("payload.props"))))
        writeLines(s"${layout.rawDir}/t1.jsonl", Seq(
          rec("a-1", base("aa")), rec("a-2", near("aa", "x2")),
          rec("a-3", base("bb")), rec("a-4", base("cc")),
          rec("a-5", Seq.fill(25)("zz").mkString(" ")),
          rec("d-1", base("gg"), Some(demoImg(flip00 = false))),
          rec("d-2", base("hh"), Some(demoImg(flip00 = false)))))
        require(bp.runUntilDrained() == 1, "dedup demo tick 1 did no work")
        writeLines(s"${layout.rawDir}/t2.jsonl", Seq(
          rec("b-1", near("aa", "x3")), rec("b-2", base("dd")),
          rec("b-3", ((0 until 30).map(i => s"ee$i") ++
            (0 until 25).map(i => s"aa$i")).mkString(" "))))
        require(bp.runUntilDrained() == 1, "dedup demo tick 2 did no work")
        writeLines(s"${layout.rawDir}/t3.jsonl", Seq(
          rec("c-1", near("dd", "x9")), rec("c-2", base("ff")),
          rec("d-3", base("ii"), Some(demoImg(flip00 = true)))))
        require(bp.runUntilDrained() == 1, "dedup demo tick 3 did no work")
      }
      layout
    })
  }

  private val builtMg = mutable.Map.empty[String, LakeLayout]

  /** Record with any of the optional payload modalities (base64 BMP
    * under `payload.img`, base64 WAV under `payload.wav`, base64 AVI
    * under `payload.avi`). */
  private def recMm(id: String, text: String, img: Option[Array[Byte]] = None,
                    wav: Option[Array[Byte]] = None,
                    avi: Option[Array[Byte]] = None): String = {
    def b64(b: Array[Byte]) = java.util.Base64.getEncoder.encodeToString(b)
    val extra = img.map(b => s""","img":"${b64(b)}"""").getOrElse("") +
      wav.map(b => s""","wav":"${b64(b)}"""").getOrElse("") +
      avi.map(b => s""","avi":"${b64(b)}"""").getOrElse("")
    s"""{"id":"$id","event_timestamp":"2024-03-07 11:22:33.000000","MODE":"training",""" +
      s""""metadata":{"app_version":"2.4.1","user_agent":"svc/1.0","user_id":7},""" +
      s""""payload":{"transaction_id":"t-$id","value":9.5,"props":"$text"$extra}}"""
  }

  /** The audio fingerprint pattern of the planted WAV pair: any fixed
    * 64-bit value works; `^ 1` is its Hamming-1 neighbor. */
  private val WavPattern = 0x5a5a5a5a5a5a5a5aL

  /** The video fingerprint pattern of the planted AVI pair (same role
    * as [[WavPattern]], distinct value so the spaces never collide). */
  private val AviPattern = 0x3c3c3c3c3c3c3c3cL

  /** The q106 lake: EVERY ingest gate in ONE drain — quality, text
    * near-dup, image, audio AND video fingerprints (one namespaced
    * store per modality) — over a planted multi-modality landing zone
    * where each gate's suppression is a closed form, and each gate
    * exercises BOTH of its windows across the two ticks:
    *
    *   tick 1 (run-00001): four DISJOINT same-tick pairs — t-1 ~ t-2
    *     (near-texts, no payloads → ONE survives, reason "batch",
    *     jac_e6 [[PairJacE6]]), i-1 ~ i-2 (unique texts, IDENTICAL
    *     images → "fp_batch", 1000000), u-1 ~ u-2 (unique texts,
    *     IDENTICAL audio → "au_batch", 1000000), v-1 ~ v-2 (unique
    *     texts, IDENTICAL video → "vi_batch", 1000000); g-1 is the
    *     garbage doc (quality DLQ, score [[GarbageScoreE6]]). Pairs are
    *     disjoint so every closed form is independent of WHICH clique
    *     member survives. Survivors' text signatures + per-modality
    *     fingerprints index on commit.
    *   tick 2 (run-00003): one INDEX-window hit per gate — t-3 near
    *     the tick-1 text survivor ("index", [[PairJacE6]]), i-3 the
    *     tick-1 image with one block inverted ("fp_index", 984375),
    *     u-3 the tick-1 audio with fingerprint bit 0 flipped
    *     ("au_index", 984375), v-3 the tick-1 clip with fingerprint
    *     bit 0 flipped ("vi_index", 984375).
    *
    * Lake state: 4 curated docs (one survivor per tick-1 pair... plus
    * none from tick 2), 8 dedup-DLQ rows across 8 distinct reasons,
    * 1 quality-DLQ row — q106 audits the whole history with every
    * value literal-pinned. */
  def ensureMultiGate(spark: SparkSession, sfDir: String): LakeLayout = synchronized {
    builtMg.getOrElseUpdate(sfDir, {
      val sfName = new File(sfDir).getName
      val root = DemoCache.root(s"multigatelake/$sfName")
      val layout = LakeLayout(root.getPath)
      DemoCache.cached(root, sfDir) {
        val stage = DedupStage(s"${layout.root}/dedup-index",
          id = col("record_id"), text = col("payload.props"),
          fingerprints = Seq(imageFingerprint, audioFingerprint, videoFingerprint))
        val bp = new BatchProcessor(spark, layout, Contracts.events,
          dedup = Some(stage),
          quality = Some(QualityGate(text = col("payload.props"))))
        writeLines(s"${layout.rawDir}/t1.jsonl", Seq(
          recMm("t-1", base("aa")), recMm("t-2", near("aa", "x2")),
          recMm("i-1", base("bb"), img = Some(demoImg(flip00 = false))),
          recMm("i-2", base("cc"), img = Some(demoImg(flip00 = false))),
          recMm("u-1", base("dd"), wav = Some(demoWav(WavPattern))),
          recMm("u-2", base("ee"), wav = Some(demoWav(WavPattern))),
          recMm("v-1", base("ff"), avi = Some(demoAvi(AviPattern))),
          recMm("v-2", base("ii"), avi = Some(demoAvi(AviPattern))),
          recMm("g-1", Seq.fill(25)("zz").mkString(" "))))
        require(bp.runUntilDrained() == 1, "multi-gate demo tick 1 did no work")
        writeLines(s"${layout.rawDir}/t2.jsonl", Seq(
          recMm("t-3", near("aa", "x3")),
          recMm("i-3", base("gg"), img = Some(demoImg(flip00 = true))),
          recMm("u-3", base("hh"), wav = Some(demoWav(WavPattern ^ 1L))),
          recMm("v-3", base("jj"), avi = Some(demoAvi(AviPattern ^ 1L)))))
        require(bp.runUntilDrained() == 1, "multi-gate demo tick 2 did no work")
      }
      layout
    })
  }
}
