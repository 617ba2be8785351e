package graft.pipeline

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
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
  *     quality DLQ before the dedup probe ever sees it.
  *   tick 2 (run-00003): b-1 ~ the tick-1 "aa" survivor (index probe,
  *     reason "index"); b-2 unique; b-3 = 30 fresh tokens + a 25-token
  *     run copied from a-1 — BELOW the 0.8 doc gate but every interior
  *     W=20 window is already indexed, so it publishes SCRUBBED
  *     (ledger note "spans scrubbed: 1 row(s)").
  *   tick 3 (run-00005): c-1 ~ b-2, a TICK-2 SURVIVOR (proves
  *     append-on-commit feeds the audit trail too); c-2 unique.
  *
  * Even run-ids are the drain loop's empty closing ticks. Expected lake
  * state: 6 curated docs, 3 dedup-DLQ rows (1 batch + 2 index, all
  * jac_e6 = 959184), 1 quality-DLQ row (a-5, score [[GarbageScoreE6]]),
  * 3 noted ledger files (t1 carries the quality AND near-dup notes
  * "; "-joined).
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

  private def rec(id: String, text: String): String =
    s"""{"id":"$id","event_timestamp":"2024-03-07 11:22:33.000000","MODE":"training",""" +
      s""""metadata":{"app_version":"2.4.1","user_agent":"svc/1.0","user_id":7},""" +
      s""""payload":{"transaction_id":"t-$id","value":9.5,"props":"$text"}}"""

  private def base(p: String): String = (0 until 50).map(i => s"$p$i").mkString(" ")
  private def near(p: String, tail: String): String =
    ((0 until 49).map(i => s"$p$i") :+ tail).mkString(" ")

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
            df.withColumn("payload", col("payload").withField("props", c))))
        val bp = new BatchProcessor(spark, layout, Contracts.events,
          dedup = Some(stage),
          quality = Some(QualityGate(text = col("payload.props"))))
        writeLines(s"${layout.rawDir}/t1.jsonl", Seq(
          rec("a-1", base("aa")), rec("a-2", near("aa", "x2")),
          rec("a-3", base("bb")), rec("a-4", base("cc")),
          rec("a-5", Seq.fill(25)("zz").mkString(" "))))
        require(bp.runUntilDrained() == 1, "dedup demo tick 1 did no work")
        writeLines(s"${layout.rawDir}/t2.jsonl", Seq(
          rec("b-1", near("aa", "x3")), rec("b-2", base("dd")),
          rec("b-3", ((0 until 30).map(i => s"ee$i") ++
            (0 until 25).map(i => s"aa$i")).mkString(" "))))
        require(bp.runUntilDrained() == 1, "dedup demo tick 2 did no work")
        writeLines(s"${layout.rawDir}/t3.jsonl", Seq(
          rec("c-1", near("dd", "x9")), rec("c-2", base("ff"))))
        require(bp.runUntilDrained() == 1, "dedup demo tick 3 did no work")
      }
      layout
    })
  }
}
