package graft.queries

import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.{ExpandExec, FileSourceScanExec}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins q63's physical shape. The query is overhead-dominated (9 output
  * rows; BENCH warm medians for it fluctuate ±0.2 s between rounds on
  * IDENTICAL input — the r8 "regression" to 0.39 s reverted to 0.21 s
  * at 10× corpus with no code change), so wall-clock alone cannot
  * guard it. What matters at 100 TB is the plan: the Expand that
  * implements `unpivot` must sit ABOVE the aggregate — melting first
  * would triple the fact-table scan through the shuffle; melting the
  * 3-row aggregate output is free. This spec turns any such plan
  * regression red regardless of timing noise. */
class UnpivotPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q63 melts AFTER the aggregate, reads 4 columns, shuffles twice") {
    val df = Relational.defs("q63_unpivot_metrics")(spark, "/root/testdata/sf0.001")
    // pre-AQE physical plan (the PruningSpec idiom): collect() does not
    // descend through an AdaptiveSparkPlanExec wrapper
    val plan = df.queryExecution.sparkPlan

    // the unpivot Expand exists and has an aggregate BELOW it (operating
    // on grouped rows, never on the raw lineitem scan)
    val expands = plan.collect { case e: ExpandExec => e }
    assert(expands.size == 1, s"expected one Expand:\n$plan")
    assert(expands.head.collect { case a: BaseAggregateExec => a }.nonEmpty,
      s"unpivot Expand must consume the AGGREGATED frame, found it below:\n$plan")

    // column pruning reaches the scan: the 3 money inputs + the group key
    val scans = plan.collect { case s: FileSourceScanExec => s }
    assert(scans.size == 1)
    assert(scans.head.requiredSchema.fieldNames.toSet ==
      Set("l_extendedprice", "l_discount", "l_tax", "l_returnflag"),
      s"scan not pruned to the 4 needed columns: ${scans.head.requiredSchema}")

    // exactly two shuffles: the aggregate's and the final sort's.
    // Exchange placement is lazy under AQE (stages materialize during
    // execution), so count them on a non-adaptive build of the same plan.
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val prepared = Relational.defs("q63_unpivot_metrics")(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan
      val shuffles = prepared.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.size == 2, s"expected 2 exchanges, got ${shuffles.size}:\n$prepared")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }
}
