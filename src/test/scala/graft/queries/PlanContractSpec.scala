package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** Physical-plan contracts for the WHOLE query surface. The 100 TB
  * claims in SURVEY §2 ("small sides broadcast", "never all-pairs")
  * are design statements until a plan asserts them — this spec freezes
  * them as executable invariants, so a future edit that silently
  * degrades a broadcast into a shuffle join, or a bounded cross join
  * into a cartesian product, fails the suite instead of surviving to a
  * bench regression.
  *
  * Contracts:
  *  1. NO query plans a `CartesianProduct` — ever. The only all-pairs
  *     shapes in the repo put a provably bounded frame on one side, and
  *     a bounded side must plan as a broadcast nested loop, not a
  *     partition-cartesian.
  *  2. `BroadcastNestedLoopJoin` appears ONLY in the whitelisted
  *     queries whose bounded side is part of the operator's documented
  *     shape (scalar audit rows, capped truth sides, bounded probe
  *     sets). Anything new that plans a BNLJ must justify itself here.
  *  3. Queries whose scale story REQUIRES a broadcast (index probes
  *     that must not shuffle the index, dimension joins, broadcast
  *     eval/offset frames) must actually plan a `BroadcastHashJoin` or
  *     `BroadcastExchange`.
  *
  * Plans are inspected at sf0.001 via the initial physical plan
  * (`executedPlan` before execution): join strategy selection happens
  * at planning time, and every required broadcast below comes from an
  * explicit `broadcast()` hint or a frame with a bounded size estimate,
  * so the assertion is deterministic — AQE can only ADD broadcasts at
  * runtime, never remove these.
  */
class PlanContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Queries allowed to plan a BroadcastNestedLoopJoin, each because a
    * documented BOUNDED frame sits on the broadcast side. */
  private val bnljWhitelist: Map[String, String] = Map(
    "q34_simhash_neardup" -> "capped <=1000-rep truth side + scalar-agg audit row",
    "q35_cosine_topk" -> "brute-force baseline: bounded probe set x corpus",
    "q36_ann_lsh" -> "bounded probe set x bucket candidates",
    "q37_label_centroids" -> "small centroid frame cross join",
    "q38_ingest_segregation" -> "scalar disposition counts -> one audit row",
    "q45_stream_ingest" -> "scalar stream-vs-batch counts -> one audit row",
    "q51_ann_ivf" -> "bounded probe set x selected IVF cells",
    "q64_quantized_topk" -> "bounded probe set x int8 corpus",
    "q72_stream_dedup" -> "scalar replay-suppression counts -> one audit row",
    "q84_trained_quality" -> "driver-trained scalar model/AUC frame")

  /** Queries whose 100 TB story REQUIRES a broadcast join: the index /
    * corpus side must stay in place while the small side ships. */
  private val requiredBroadcast = Seq(
    "q05_local_volume",      // TPC-H-shape 6-way join: dims broadcast
    "q75_decontaminate",     // eval-set grams broadcast into the corpus scan
    "q79_incremental_dedup", // batch bands broadcast; corpus index never shuffles
    "q82_indexed_dedup",     // batch side broadcast into the durable index probe
    "q83_appended_dedup",    // same probe across the append lifecycle
    "q88_incremental_spans", // span semi-joins broadcast both directions
    "q89_indexed_spans",     // durable winhash store probed via broadcast semi
    "q91_curation_recipe",   // contaminated-id set + small joins broadcast
    "q99_image_fp_probe",    // batch fingerprints broadcast; fp index scanned in place
    "q104_shard_export",     // 256-row shard-offset frame broadcast into the rank join
    "q105_temperature_mixture") // (source, quota) frame broadcast into quotaFill
    // q108_export_roundtrip left round 21's list: loaderAudit folds the
    // audit from deep validation's own recount into a local relation —
    // there is no join left whose broadcast shape a contract could pin.

  private def planOf(name: String): String =
    SparkEntry.runAndRelease(spark, sf, name)(_.queryExecution.executedPlan.toString)

  test("no query plans a CartesianProduct; BNLJ only where whitelisted") {
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    for (name <- SparkEntry.queries.keys.toSeq.sorted) {
      val plan = planOf(name)
      if (plan.contains("CartesianProduct"))
        offenders += s"$name plans a CartesianProduct"
      if (plan.contains("BroadcastNestedLoopJoin") && !bnljWhitelist.contains(name))
        offenders += s"$name plans an unwhitelisted BroadcastNestedLoopJoin"
      if (requiredBroadcast.contains(name) && !plan.contains("BroadcastExchange"))
        offenders += s"$name lost its required broadcast join"
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  /** Queries whose SURVEY row claims "scan-only / no shuffle before the
    * final sort": per-row column algebra that composes into any scan at
    * any scale. Their plans must show at most ONE non-broadcast
    * exchange — the output sort's range partition — or the claim is
    * broken and the 100 TB cost model with it. */
  private val scanShaped = Seq(
    "q02_filter_project", "q06_forecast_revenue", "q29_quality_scores",
    "q30_fingerprints", "q53_regex_tokens", "q54_winnow_fingerprints",
    "q71_repetition_ngrams", "q77_quality_scorer", "q78_train_order",
    "q92_semantic_decontam", "q93_gate_calibration", "q107_top_ngram_chars")

  test("scan-shaped queries shuffle at most once (the output sort)") {
    val offenders = scanShaped.flatMap { name =>
      val n = "(?<!Broadcast)Exchange".r.findAllIn(planOf(name)).size
      if (n > 1) Some(s"$name plans $n shuffles") else None
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("the BNLJ whitelist is tight: every entry still plans one") {
    // a whitelist entry whose query no longer plans a BNLJ is stale —
    // prune it so contract 2 stays a real gate, not a grandfather list
    val stale = bnljWhitelist.keys.toSeq.sorted
      .filterNot(name => planOf(name).contains("BroadcastNestedLoopJoin"))
    assert(stale.isEmpty, s"stale whitelist entries (no BNLJ planned): $stale")
  }
}
