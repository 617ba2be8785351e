package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, round}
import graft.queries.{CurationOps, QualityModel}

/** Optional quality gate for the ingest pipeline (SURVEY.md §2.10 X6 as
  * an INGEST STAGE): the C4/CCNet-style "filter at ingestion" pass.
  * After segregation and curation — and BEFORE the near-dup gate, so
  * garbage never pays shingling — each row's text is scored by the q77
  * codegen scorer ([[CurationOps.withQualityScoreOn]]); rows under the
  * threshold divert to a quality DLQ (carrying their exact score, the
  * DLQ-as-audit discipline of the dedup stage) and the file's ledger
  * row carries a suppression note.
  *
  * Scale shape: the scorer is ONE compiled byte walk per row
  * ([[graft.functions.QualityFeatures]]) composed into the batch scan —
  * no join, no shuffle, no driver state; the flagged frame holds only
  * suppressed rows. The same gate formula drives the standalone q77/q93
  * surfaces, so "what would this gate have dropped" is answerable
  * offline before turning it on at ingest (q93's calibration sweep),
  * and the ingest decision is bit-identical to the offline answer.
  *
  * The SCORER is a seam: by default the fixed-weight q77 formula (a
  * closed form, which keeps the q90/q106 fixtures oracle-exact); pass a
  * TRAINED [[graft.queries.QualityModel]] (the q84 logistic, via
  * [[QualityGate.trained]]) to gate on the learned margin instead. Both
  * scorers read the same codegen feature struct, so swapping them
  * changes only the final column expression — still one byte walk per
  * row, still whole-stage codegen, no UDF either way.
  *
  * Composition with [[DedupStage]] (both runners wire quality FIRST):
  * quality-flagged rows never reach the dedup probe, never enter the
  * signature index, and never publish — the lake and its index only
  * ever see rows that passed both gates.
  */
final case class QualityGate(
    /** Text column over the CURATED frame (may be nested, e.g.
      * `col("payload.props")`). */
    text: Column,
    /** Keep threshold (e6 units): `quality_score_e6 >= minScoreE6`
      * publishes. The default is the q70/q77 gate setting; under a
      * trained [[scorer]] the score is the logistic margin ×1e6, whose
      * natural threshold is 0 (the decision boundary —
      * [[QualityGate.trained]]'s default). */
    minScoreE6: Long = CurationOps.QualityMinE6,
    /** When set, score with the TRAINED q84 model instead of the fixed
      * q77 weights: [[ScoreCol]] becomes `round(margin · 1e6)` over the
      * same feature columns. The DLQ audit column keeps its name — a
      * consumer reads "the gate's score in e6 units" either way. */
    scorer: Option[QualityModel] = None) {

  /** Audit column the flagged frame carries into the quality DLQ. */
  val ScoreCol = "quality_score_e6"

  private val helperCols = Seq("q_f", "q_n", "q_stop_e6", "q_toklen_e6", "q_dup2_e6")

  /** Split the curated batch into (survivors, flagged). Survivors keep
    * the caller's schema exactly (the staged publish and the index
    * append downstream depend on it); the flagged frame adds
    * [[ScoreCol]] and may be EMPTY — callers decide emptiness from work
    * they already do (the per-file note collect in the ledger runner, a
    * persisted isEmpty in the streaming runner) instead of this method
    * paying an extra scoring scan of every tick for the answer.
    *
    * A row whose text is NULL has no score (`quality_features` is
    * null-intolerant, so the score column is NULL — under a trained
    * scorer the null features null out the margin the same way): it
    * KEEPS — the gate drops rows it judged bad, never rows it could not
    * judge (the [[DedupStage]] posture, which never flags docs too
    * short to shingle). Without the explicit null arm such rows would
    * fail BOTH filters and silently vanish from the pipeline. */
  def partition(curated: DataFrame): (DataFrame, DataFrame) = {
    val base = CurationOps.withQualityScoreOn(curated, text)
    val scored = scorer match {
      case Some(m) => base.withColumn(ScoreCol, round(m.scoreCol * 1e6).cast("long"))
      case None => base
    }
    val keep = scored.filter(col(ScoreCol) >= minScoreE6 || col(ScoreCol).isNull)
      .drop(helperCols :+ ScoreCol: _*)
    val flagged = scored.filter(col(ScoreCol) < minScoreE6)
      .drop(helperCols: _*)
    (keep, flagged)
  }
}

object QualityGate {
  /** Gate on the TRAINED q84 logistic ([[graft.queries
    * .QualityModelStore]]): keep iff the margin (×1e6) clears
    * `minMarginE6` — default 0, the decision boundary. The fixed-weight
    * default gate stays the zero-argument path so existing fixtures'
    * closed-form scores are untouched. */
  def trained(text: Column, model: QualityModel, minMarginE6: Long = 0L): QualityGate =
    QualityGate(text, minMarginE6, Some(model))
}
