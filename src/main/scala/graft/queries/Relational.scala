package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.{Cols, Tables}
import graft.engine.Cols.{cents, e4, e6}

/** Relational query inventory over the TPC-H-ish star schema
  * (SURVEY.md §2.2-§2.8: projections/filters, joins J1-J4, aggregations
  * A4-A6, windows W1-W3, sorts/limits O1-O3, set operations).
  *
  * Every query has a DuckDB oracle (ANSI SQL) producing identical columns;
  * all money/ratio outputs are scaled integers (see [[graft.engine.Cols]]).
  * Reference basis: the consumption layer of the design
  * (diagram_1.txt:94-108, diagram3:116-143) implies the full relational
  * surface; joins/windows are `implied` operators per SURVEY.md §2.3-§2.5.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** Foldable timestamp literal. Date predicates compare the raw parquet
    * timestamp column against a constant bound (e.g. `to_date(ts) <= D`
    * becomes `ts < D+1day`): wrapping the COLUMN in to_date() defeats
    * Parquet row-group min/max pushdown, which at 100 TB turns every date
    * filter into a full scan. Session TZ is pinned UTC so the rewrite is
    * exactly equivalent.
    */
  private def ts(v: String) = lit(v).cast("timestamp")

  /** Rank index h = (n−1)·p for the linear-interpolation quantile
    * definition, computed in IEEE double — the SAME operation sequence
    * the oracle SQL spells out (double literals `0.5e0`/`0.95e0`), so
    * floor/frac agree bit-for-bit across engines. */
  private def qH(p: Double): Column = (col("n") - 1).cast("double") * lit(p)

  /** round(lo + frac(h)·(hi − lo)) on e6-scaled long quantile neighbors;
    * `hi` is NULL when h is the last index (frac 0), so coalesce to lo. */
  private def qInterp(lo: Column, hi: Column, h: Column): Column =
    round(lo.cast("double") +
      (h - floor(h).cast("double")) * (coalesce(hi, lo) - lo).cast("double"))
      .cast("long")

  /** Per-group quantile NEIGHBORS by explicit rank arithmetic: values are
    * e6-quantized to longs first (so the interpolation inputs are exact
    * integers in both engines), ranked per group, and the two values
    * flanking h = (n−1)·p for p ∈ {0.5, 0.95} are picked by rank in one
    * aggregate pass. One shuffle for the window sort; the aggregate
    * reuses the same partitioning. `extraAggs` lets q73 fold its
    * percentile_approx sketch into the same pass. */
  private def rankQuantileAgg(events: DataFrame,
                              extraAggs: Seq[Column] = Nil): DataFrame = {
    val byType = Window.partitionBy("event_type")
    val ranked = events
      .select(col("event_type"), col("value"),
        round(col("value") * 1e6).cast("long").as("ve6"))
      .withColumn("rn", row_number().over(byType.orderBy("ve6")))
      .withColumn("n", count(lit(1)).over(byType))
    def at(off: Long, p: Double): Column =
      max(when((col("rn") - 1) === floor(qH(p)) + off, col("ve6")))
    val aggs = Seq(
      at(0, 0.5).as("lo50"), at(1, 0.5).as("hi50"),
      at(0, 0.95).as("lo95"), at(1, 0.95).as("hi95")) ++ extraAggs
    ranked.groupBy("event_type").agg(max(col("n")).as("n"), aggs: _*)
  }

  val defs: Map[String, Q] = Map(
    // A4/A1: grouped aggregation with map-side partial agg; filter pushed to scan.
    "q01_pricing_summary" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") < ts("2000-12-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity")).cast("long").as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_base_c"),
          sum(e4(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_c4"),
          sum(e6(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))).as("sum_charge_c6"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // P1/P3/P6/P9: projection + predicate pushdown (PushedFilters in plan).
    "q02_filter_project" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_returnflag") === "R" && col("l_quantity") < 5 &&
          col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
          col("l_shipdate") < ts("2000-01-01 00:00:00"))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("long").as("qty"),
          cents(col("l_extendedprice")).as("price_c"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // J1: 3-way join + agg + top-k (TPC-H Q3 shape). customer is the small
    // side → broadcast; orders⨝lineitem shuffles on orderkey.
    "q03_shipping_priority" -> ((s, d) => {
      val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, d, "orders").filter(col("o_orderdate") < ts("1998-06-01 00:00:00"))
      val l = t(s, d, "lineitem").filter(col("l_shipdate") >= ts("1998-06-02 00:00:00"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("odate"), col("o_orderpriority"))
        .agg(sum(e4(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_c4"))
        .orderBy(col("revenue_c4").desc, col("l_orderkey"))
        .limit(10)
    }),

    // J2: broadcast dimension joins (region 5 rows, nation 25 rows).
    "q04_region_rollcall" -> ((s, d) => {
      val r = broadcast(t(s, d, "region"))
      val n = broadcast(t(s, d, "nation"))
      t(s, d, "customer")
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_cust"), sum(cents(col("c_acctbal"))).as("bal_c"))
        .orderBy("r_name")
    }),

    // J1 x5: the TPC-H Q5 shape — local supplier volume within one region.
    "q05_local_volume" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(
        col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
        col("o_orderdate") < ts("1998-01-01 00:00:00"))
      val l = t(s, d, "lineitem")
      val su = t(s, d, "supplier")
      val n = broadcast(t(s, d, "nation"))
      val r = broadcast(t(s, d, "region").filter(col("r_name") === "ASIA"))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .join(su, col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(sum(e4(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_c4"))
        .orderBy(col("revenue_c4").desc, col("n_name"))
    }),

    // A4 scalar aggregate over a pushed-down range predicate (TPC-H Q6 shape).
    "q06_forecast_revenue" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
          col("l_shipdate") < ts("1997-01-01 00:00:00") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(e6(col("l_extendedprice") * col("l_discount"))).as("revenue_c6"))
    }),

    // J3: left-semi join (EXISTS).
    "q07_active_customers" -> ((s, d) => {
      val o = t(s, d, "orders").filter(col("o_orderdate") >= ts("1999-01-01 00:00:00"))
      t(s, d, "customer")
        .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_cust"))
        .orderBy("c_mktsegment")
    }),

    // J3: left-anti join (NOT EXISTS).
    "q08_dormant_customers" -> ((s, d) => {
      val o = t(s, d, "orders").filter(col("o_orderdate") >= ts("2000-01-01 00:00:00"))
      t(s, d, "customer")
        .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_cust"))
        .orderBy("n_name")
    }),

    // J4: theta join — equi key plus a range predicate.
    "q09_richer_suppliers" -> ((s, d) => {
      val su = t(s, d, "supplier")
      val c = t(s, d, "customer")
      su.join(c, col("s_nationkey") === col("c_nationkey") && col("s_acctbal") > col("c_acctbal"))
        .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_pairs"),
          sum(cents(col("s_acctbal") - col("c_acctbal"))).as("gap_c"))
        .orderBy("n_name")
    }),

    // O2/O3: global top-k (TakeOrderedAndProject — no full sort at scale).
    "q10_top_customers" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy("o_custkey")
        .agg(sum(cents(col("o_totalprice"))).as("total_c"), count(lit(1)).as("n_orders"))
        .orderBy(col("total_c").desc, col("o_custkey"))
        .limit(15)
    }),

    // W1: ranking window functions with deterministic tiebreak.
    "q11_segment_rank" -> ((s, d) => {
      val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, d, "customer")
        .select(col("c_mktsegment"), col("c_custkey"), cents(col("c_acctbal")).as("bal_c"),
          row_number().over(w).as("rn"), ntile(4).over(w).as("quartile"))
        .filter(col("rn") <= 5)
        .orderBy("c_mktsegment", "rn")
    }),

    // W3: framed window aggregates (running total + moving 3-row sum), exact
    // via integer cents.
    "q12_running_totals" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, d, "orders")
        .filter(col("o_custkey") < 50)
        .select(col("o_custkey"), col("o_orderkey"),
          sum(cents(col("o_totalprice"))).over(w.rowsBetween(Window.unboundedPreceding, 0)).as("run_c"),
          sum(cents(col("o_totalprice"))).over(w.rowsBetween(-2, 0)).as("mov3_c"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // A6: rollup with grouping-null coalescing.
    "q14_rollup_returns" -> ((s, d) => {
      t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity")).cast("long").as("sum_qty"), count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("sum_qty"), col("n"))
        .orderBy("flag", "status")
    }),

    // A6: cube.
    "q15_cube_orders" -> ((s, d) => {
      t(s, d, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("total_c"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total_c"))
        .orderBy("status", "priority")
    }),

    // Set operations: intersect / except / union-all over nation keysets.
    "q16_nation_setops" -> ((s, d) => {
      val custN = t(s, d, "customer").select(col("c_nationkey").as("nk")).distinct()
      val suppN = t(s, d, "supplier").select(col("s_nationkey").as("nk")).distinct()
      val both = custN.intersect(suppN).withColumn("tag", lit("both"))
      val custOnly = custN.except(suppN).withColumn("tag", lit("cust_only"))
      val suppOnly = suppN.except(custN).withColumn("tag", lit("supp_only"))
      both.unionAll(custOnly).unionAll(suppOnly)
        .select(col("tag"), col("nk"))
        .orderBy("tag", "nk")
    }),

    // A5: exact distinct aggregation.
    "q17_segment_reach" -> ((s, d) => {
      t(s, d, "customer")
        .groupBy("c_mktsegment")
        .agg(countDistinct(col("c_nationkey")).as("n_nations"), count(lit(1)).as("n_cust"))
        .orderBy("c_mktsegment")
    }),

    // A5: approximate distinct (HyperLogLog++) on the fact table — the
    // 100 TB path for reach counting, where exact countDistinct shuffles
    // every distinct key. The approx estimate is engine-specific, so the
    // oracle checks the EXACT count plus a self-check flag that the HLL
    // estimate landed within 5% of it (rsd is configured at 1%).
    "q44_approx_reach" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_orderkey")).as("n_exact"),
          approx_count_distinct(col("l_orderkey"), rsd = 0.01).as("n_approx"))
        .select(col("l_returnflag"), col("n_exact"),
          when(abs(col("n_approx") - col("n_exact")) <= col("n_exact") * 0.05, 1)
            .otherwise(0).cast("int").as("approx_ok"))
        .orderBy("l_returnflag")
    }),

    // A5/consumption: exact percentiles per group, emitted as e6-scaled
    // longs so float formatting can't reach the hash compare. The
    // interpolation is OWNED by the query (explicit rank arithmetic on
    // e6-quantized values — see [[rankQuantileAgg]]) rather than
    // delegated to each engine's `percentile`/`quantile_cont` internals:
    // those interpolate doubles in different evaluation orders and can
    // disagree by 1 ulp on boundary values, which was the one latent
    // cross-engine flake left in the oracle suite. The exact form is
    // the correctness baseline; at 100 TB the same query swaps in
    // percentile_approx (t-digest) exactly as q44 pairs exact/approx
    // distinct — the approx estimate is engine-specific, so the oracle
    // pins the exact one.
    "q60_quantiles" -> ((s, d) => {
      rankQuantileAgg(t(s, d, "events"))
        .select(col("event_type"), col("n"),
          qInterp(col("lo50"), col("hi50"), qH(0.5)).as("p50_e6"),
          qInterp(col("lo95"), col("hi95"), qH(0.95)).as("p95_e6"))
        .orderBy("event_type")
    }),

    // A5 scale path: the percentile_approx (t-digest style sketch) form
    // q60's scaladoc promises — at 100 TB exact percentiles buffer every
    // group value, while the approx sketch is bounded-memory and
    // merges map-side. The sketch estimate is engine-specific, so the
    // oracle pins the exact values (same owned-interpolation form as
    // q60) plus a q44-style self-check flag: at accuracy 10000 the rank
    // error is <= n/10000 rows, so the approx answer must land within
    // 5% (or 0.05 absolute, = 5e4 at e6 scale) of exact.
    "q73_approx_quantiles" -> ((s, d) => {
      def near(aE6: Column, eE6: Column): Column =
        abs(aE6 - eE6.cast("double")) <=
          greatest(abs(eE6.cast("double")) * 0.05, lit(50000.0))
      rankQuantileAgg(t(s, d, "events"),
        Seq(expr("percentile_approx(value, array(0.5, 0.95), 10000)").as("qa")))
        .select(col("event_type"), col("n"),
          qInterp(col("lo50"), col("hi50"), qH(0.5)).as("p50_e6"),
          qInterp(col("lo95"), col("hi95"), qH(0.95)).as("p95_e6"),
          col("qa"))
        .select(col("event_type"), col("n"), col("p50_e6"), col("p95_e6"),
          when(near(element_at(col("qa"), 1) * 1e6, col("p50_e6")) &&
            near(element_at(col("qa"), 2) * 1e6, col("p95_e6")), 1)
            .otherwise(0).cast("int").as("approx_ok"))
        .orderBy("event_type")
    }),

    // A6/consumption: pivot — long-to-wide conditional aggregation. The
    // value list is EXPLICIT (view/purchase/click), which is the 100 TB
    // form: with it, pivot is a single pass of conditional aggregates;
    // without it, Spark first runs a distinct scan just to learn the
    // columns. The oracle is the equivalent FILTER'd aggregate.
    "q62_pivot_traffic" -> ((s, d) => {
      t(s, d, "events")
        .withColumn("day", dayofmonth(col("ts")))
        .groupBy("day")
        .pivot("event_type", Seq("view", "purchase", "click"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select(col("day"), col("view").as("n_view"),
          col("purchase").as("n_purchase"), col("click").as("n_click"))
        .orderBy("day")
    }),

    // A6/consumption: unpivot (wide→long melt, the inverse of q62's
    // pivot) — three per-flag money aggregates melted into a tidy
    // (flag, metric, value) frame with the Dataset `unpivot` API. One
    // aggregate pass plus a rows×metrics Expand; no shuffle beyond the
    // aggregate's. Oracle is the equivalent UNION ALL. 9 output rows →
    // overhead-dominated wall time that jitters ±0.2 s between bench
    // rounds; the shape that matters (Expand ABOVE the aggregate, 4-col
    // pruned scan, 2 exchanges) is pinned by UnpivotPlanSpec.
    "q63_unpivot_metrics" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          sum(cents(col("l_extendedprice"))).as("base_c"),
          sum(cents(col("l_extendedprice") * col("l_discount"))).as("disc_c"),
          sum(cents(col("l_extendedprice") * col("l_tax"))).as("tax_c"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("base_c"), col("disc_c"), col("tax_c")),
          "metric", "value_c")
        .orderBy("l_returnflag", "metric")
    }),

    // Correlated scalar subquery (TPC-H Q17 shape): lineitems whose
    // quantity is below 20% of their part's average quantity. Written as
    // SQL so Catalyst's subquery decorrelation runs (it rewrites the
    // correlated aggregate into a grouped join — verify with PlanAudit:
    // one aggregation over lineitem, one join, no per-row re-scan).
    "q50_small_qty_revenue" -> ((s, d) => {
      // view names carry the scale-factor tag: a fixed global name would
      // race a parallel runner using another sfDir on the same session
      // (same-sfDir re-registration is idempotent and harmless)
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      Tables.load(s, d, "lineitem").createOrReplaceTempView(s"v_lineitem_$tag")
      Tables.load(s, d, "part").createOrReplaceTempView(s"v_part_$tag")
      s.sql(
        s"""SELECT p_brand,
                  CAST(COUNT(*) AS BIGINT) AS n_small,
                  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
           FROM v_lineitem_$tag JOIN v_part_$tag ON l_partkey = p_partkey
           WHERE l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                               FROM v_lineitem_$tag l2
                               WHERE l2.l_partkey = p_partkey)
           GROUP BY p_brand ORDER BY p_brand""")
    }),

    // A4 + HAVING + join-back (TPC-H Q18 shape): large-quantity orders.
    "q18_big_orders" -> ((s, d) => {
      val big = t(s, d, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity")).cast("long").as("sum_qty"))
        .filter(col("sum_qty") > 200)
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      big.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("odate"),
          cents(col("o_totalprice")).as("total_c"), col("sum_qty"))
        .orderBy(col("total_c").desc, col("o_orderkey"))
        .limit(20)
    }),

    // Conditional aggregation (TPC-H Q14 shape): promo revenue share.
    "q19_case_agg" -> ((s, d) => {
      val l = t(s, d, "lineitem")
      val p = t(s, d, "part")
      l.join(p, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(
          sum(when(col("p_size") < 25, e4(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .otherwise(lit(0L))).as("small_rev_c4"),
          sum(e4(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("all_rev_c4"),
          count(lit(1)).as("n"))
        .orderBy("p_brand")
    }))

  /** DuckDB mirror of [[rankQuantileAgg]] + [[qInterp]]: e6-quantize,
    * rank, pick flanking values, interpolate — all in DOUBLE. */
  private def rankQuantileSql(withApproxFlag: Boolean): String = {
    val flag = if (withApproxFlag) ", CAST(1 AS INT) AS approx_ok" else ""
    s"""WITH v AS (
          SELECT event_type, CAST(ROUND(value * 1000000) AS BIGINT) AS ve6 FROM events),
        r AS (
          SELECT event_type, ve6,
                 ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ve6) AS rn,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM v),
        a AS (
          SELECT event_type, MAX(n) AS n,
                 MAX(CASE WHEN rn - 1 = FLOOR((n - 1) * 0.5e0) THEN ve6 END) AS lo50,
                 MAX(CASE WHEN rn - 1 = FLOOR((n - 1) * 0.5e0) + 1 THEN ve6 END) AS hi50,
                 MAX(CASE WHEN rn - 1 = FLOOR((n - 1) * 0.95e0) THEN ve6 END) AS lo95,
                 MAX(CASE WHEN rn - 1 = FLOOR((n - 1) * 0.95e0) + 1 THEN ve6 END) AS hi95
          FROM r GROUP BY 1)
        SELECT event_type, n,
          CAST(ROUND(lo50 + ((n - 1) * 0.5e0 - FLOOR((n - 1) * 0.5e0))
            * (COALESCE(hi50, lo50) - lo50)) AS BIGINT) AS p50_e6,
          CAST(ROUND(lo95 + ((n - 1) * 0.95e0 - FLOOR((n - 1) * 0.95e0))
            * (COALESCE(hi95, lo95) - lo95)) AS BIGINT) AS p95_e6$flag
        FROM a ORDER BY 1"""
  }

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
         CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_c,
         CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*10000) AS BIGINT)) AS BIGINT) AS sum_disc_c4,
         CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*(1+l_tax)*1000000) AS BIGINT)) AS BIGINT) AS sum_charge_c6,
         COUNT(*) AS count_order
         FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '2000-12-01'
         GROUP BY 1,2 ORDER BY 1,2""",
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty,
         CAST(ROUND(l_extendedprice*100) AS BIGINT) AS price_c
         FROM lineitem
         WHERE l_returnflag = 'R' AND l_quantity < 5
           AND CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1999-12-31'
         ORDER BY l_orderkey, l_linenumber""",
    "q03_shipping_priority" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS odate, o_orderpriority,
         CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*10000) AS BIGINT)) AS BIGINT) AS revenue_c4
         FROM customer, orders, lineitem
         WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
           AND CAST(o_orderdate AS DATE) < DATE '1998-06-01' AND CAST(l_shipdate AS DATE) > DATE '1998-06-01'
         GROUP BY 1,2,3 ORDER BY revenue_c4 DESC, l_orderkey LIMIT 10""",
    "q04_region_rollcall" ->
      """SELECT r_name, COUNT(*) AS n_cust,
         CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT) AS bal_c
         FROM customer, nation, region
         WHERE c_nationkey = n_nationkey AND n_regionkey = r_regionkey
         GROUP BY 1 ORDER BY 1""",
    "q05_local_volume" ->
      """SELECT n_name,
         CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*10000) AS BIGINT)) AS BIGINT) AS revenue_c4
         FROM customer, orders, lineitem, supplier, nation, region
         WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
           AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
           AND r_name = 'ASIA'
           AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01' AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
         GROUP BY 1 ORDER BY revenue_c4 DESC, n_name""",
    "q06_forecast_revenue" ->
      """SELECT CAST(SUM(CAST(ROUND(l_extendedprice*l_discount*1000000) AS BIGINT)) AS BIGINT) AS revenue_c6
         FROM lineitem
         WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01' AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
    "q07_active_customers" ->
      """SELECT c_mktsegment, COUNT(*) AS n_cust FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                       AND CAST(o_orderdate AS DATE) >= DATE '1999-01-01')
         GROUP BY 1 ORDER BY 1""",
    "q08_dormant_customers" ->
      """SELECT n_name, COUNT(*) AS n_cust FROM customer JOIN nation ON c_nationkey = n_nationkey
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                           AND CAST(o_orderdate AS DATE) >= DATE '2000-01-01')
         GROUP BY 1 ORDER BY 1""",
    "q09_richer_suppliers" ->
      """SELECT n_name, COUNT(*) AS n_pairs,
         CAST(SUM(CAST(ROUND((s_acctbal - c_acctbal)*100) AS BIGINT)) AS BIGINT) AS gap_c
         FROM supplier JOIN customer ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
         JOIN nation ON s_nationkey = n_nationkey
         GROUP BY 1 ORDER BY 1""",
    "q10_top_customers" ->
      """SELECT o_custkey, CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_c,
         COUNT(*) AS n_orders
         FROM orders GROUP BY 1 ORDER BY total_c DESC, o_custkey LIMIT 15""",
    "q11_segment_rank" ->
      """SELECT c_mktsegment, c_custkey, CAST(ROUND(c_acctbal*100) AS BIGINT) AS bal_c, rn, quartile
         FROM (SELECT c_mktsegment, c_custkey, c_acctbal,
                 ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn,
                 NTILE(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS quartile
               FROM customer) x
         WHERE rn <= 5 ORDER BY c_mktsegment, rn""",
    "q12_running_totals" ->
      """SELECT o_custkey, o_orderkey,
         CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_c,
         CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS mov3_c
         FROM orders WHERE o_custkey < 50 ORDER BY o_custkey, o_orderkey""",
    "q14_rollup_returns" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS flag, COALESCE(l_linestatus, 'ALL') AS status,
         CAST(SUM(l_quantity) AS BIGINT) AS sum_qty, COUNT(*) AS n
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus) ORDER BY 1, 2""",
    "q15_cube_orders" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status, COALESCE(o_orderpriority, 'ALL') AS priority,
         COUNT(*) AS n, CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_c
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority) ORDER BY 1, 2""",
    "q16_nation_setops" ->
      """WITH cn AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
            sn AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
         SELECT 'both' AS tag, nk FROM (SELECT nk FROM cn INTERSECT SELECT nk FROM sn)
         UNION ALL
         SELECT 'cust_only' AS tag, nk FROM (SELECT nk FROM cn EXCEPT SELECT nk FROM sn)
         UNION ALL
         SELECT 'supp_only' AS tag, nk FROM (SELECT nk FROM sn EXCEPT SELECT nk FROM cn)
         ORDER BY tag, nk""",
    "q17_segment_reach" ->
      """SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS n_nations, COUNT(*) AS n_cust
         FROM customer GROUP BY 1 ORDER BY 1""",
    "q44_approx_reach" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS n_exact,
         CAST(1 AS INT) AS approx_ok
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "q63_unpivot_metrics" ->
      """WITH w AS (
           SELECT l_returnflag,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS base_c,
             CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT) AS disc_c,
             CAST(SUM(CAST(ROUND(l_extendedprice * l_tax * 100) AS BIGINT)) AS BIGINT) AS tax_c
           FROM lineitem GROUP BY 1)
         SELECT l_returnflag, 'base_c' AS metric, base_c AS value_c FROM w
         UNION ALL SELECT l_returnflag, 'disc_c', disc_c FROM w
         UNION ALL SELECT l_returnflag, 'tax_c', tax_c FROM w
         ORDER BY l_returnflag, metric""",
    "q62_pivot_traffic" ->
      """SELECT CAST(day(ts) AS INT) AS day,
         COUNT(*) FILTER (event_type = 'view') AS n_view,
         COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
         COUNT(*) FILTER (event_type = 'click') AS n_click
         FROM events GROUP BY 1 ORDER BY 1""",
    // Explicit-rank quantile oracle: the SAME double-arithmetic steps the
    // Spark side owns (0.5e0/0.95e0 are DOUBLE literals — a bare 0.95
    // would be DECIMAL in DuckDB and floor differently on boundaries).
    "q60_quantiles" -> rankQuantileSql(withApproxFlag = false),
    "q73_approx_quantiles" -> rankQuantileSql(withApproxFlag = true),
    "q50_small_qty_revenue" ->
      """SELECT p_brand, COUNT(*) AS n_small,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                             FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
         GROUP BY p_brand ORDER BY p_brand""",
    "q18_big_orders" ->
      """SELECT c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS odate,
         CAST(ROUND(o_totalprice*100) AS BIGINT) AS total_c, sum_qty
         FROM (SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
               FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 200) big
         JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey
         ORDER BY total_c DESC, o_orderkey LIMIT 20""",
    "q19_case_agg" ->
      """SELECT p_brand,
         CAST(SUM(CASE WHEN p_size < 25 THEN CAST(ROUND(l_extendedprice*(1-l_discount)*10000) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS small_rev_c4,
         CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*10000) AS BIGINT)) AS BIGINT) AS all_rev_c4,
         COUNT(*) AS n
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY 1 ORDER BY 1""")
}
