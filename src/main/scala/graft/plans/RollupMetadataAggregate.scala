package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.planning.PhysicalOperation
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{IntegerType, StringType}

/** Serve partition-grain aggregates over the curated lake from the
  * q109 rollup partials instead of the lake itself — the engine's one
  * custom `Rule[LogicalPlan]`, and the consumption payoff of the
  * rollup publish protocol ([[graft.ingest.Rollup]]).
  *
  * A monitoring/billing/recipe-sizing query like
  *
  * {{{
  *   CuratedWriter.read(s, curatedDir)
  *     .filter($"year" === 2024 && $"month" === 1)
  *     .groupBy("year", "month", "day", "mode")
  *     .agg(count(lit(1)), count($"value"), min($"event_time_utc"), ...)
  * }}}
  *
  * is answered exactly by folding the per-file partial rows the ingest
  * runners publish atomically with every batch — a metadata-sized scan
  * (one row per file x partition, ledger-order cardinality) instead of
  * the 100 TB lake scan the plan literally asks for. This is the same
  * move as Spark's own `OptimizeMetadataOnlyQuery` (partition values
  * from the catalog) extended to row counts, null counts and time
  * bounds, or a warehouse answering `COUNT(*)` from table statistics —
  * but backed by statistics this pipeline maintains *exactly* (q109's
  * oracle) and can audit against reality (q110, `Rollup.reconcile`).
  *
  * The rewrite fires only when every piece is provably servable:
  *
  *  - the aggregate's child is a plain projection/filter over a single
  *    parquet root whose SIBLING `rollup/` directory has data, and whose
  *    schema carries the curated-lake columns (`year/month/day/mode`
  *    partitions + `event_time_utc` + `value`) — the rollup store
  *    itself fails the schema test, so the rule can never self-apply;
  *  - every filter references partition columns only (they transpose
  *    1:1 onto the partials, which carry the same columns);
  *  - every grouping expression is a bare partition-column attribute;
  *  - every aggregate is one of `count(1)`/`count(*)` (= Σ n_rows),
  *    `count(value)` (= Σ n_value), `min(event_time_utc)` (= min of
  *    per-file minima), `max(event_time_utc)` — no DISTINCT, no FILTER
  *    clause. Anything else (a `sum(value)` at a different rounding
  *    scale, a non-partition grouping, `countDistinct`) leaves the plan
  *    untouched.
  *
  * Counts wrap in `coalesce(sum, 0)` so a global aggregate over an
  * empty selection still returns 0 like `count` does. The replacement
  * re-aliases its outputs under the ORIGINAL expression IDs, so parent
  * operators (sorts, projections) resolve unchanged.
  *
  * Trust contract (documented, not assumed silently): partials are
  * published atomically with the rows they summarize by BOTH runners
  * (ledger: inside the `.ready` commit; streaming: before the commit
  * marker — RollupSpec proves drain == recompute for every crash mode),
  * so a lake written exclusively by graft runners is complete by
  * construction, and `rollup/` directories only ever exist because a
  * runner created one. A lake with pre-rollup history must either
  * backfill partials or disable the rule
  * (`spark.graft.rollup.metadataAgg=false`); q110's reconcile is the
  * auditor that certifies — or refutes — the equivalence this rewrite
  * relies on. Reads concurrent with an in-flight publish can race the
  * data/partial pair like any non-snapshot parquet reader can race the
  * lake itself; the engine's consumption posture (query between ticks,
  * or on the marker-gated view) is unchanged by the rewrite.
  *
  * Cost of the rule itself: structural matching is pure; the one
  * filesystem existence check (does `../rollup` contain data?) runs
  * only after an aggregate already shape-matched, i.e. at most one
  * listing call per candidate aggregate per optimization — driver-side
  * metadata traffic of the same order as the scan planning it replaces.
  */
case class RollupMetadataAggregate(session: SparkSession) extends Rule[LogicalPlan] {
  import RollupMetadataAggregate._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "true").toBoolean) return plan
    plan.transformDown {
      case agg: Aggregate =>
        try rewrite(agg).getOrElse(agg)
        catch { case scala.util.control.NonFatal(_) => agg }
    }
  }

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    val (projects, filters, rollupDir) = agg.child match {
      case PhysicalOperation(p, f, rel: LogicalRelation) =>
        val dir = servableLakeRollup(rel).getOrElse(return None)
        (p, f, dir)
      case _ => return None
    }
    // projections must be bare column pass-throughs (column pruning's
    // Project), never computed columns the aggregate might reference
    if (!projects.forall(_.isInstanceOf[AttributeReference])) return None
    // filters: deterministic, partition-columns only
    if (!filters.forall(f =>
        f.deterministic && f.references.forall(a => PartitionCols(a.name))))
      return None
    // grouping: bare partition-column attributes only
    val groupNames = agg.groupingExpressions.map {
      case a: AttributeReference if PartitionCols(a.name) => a.name
      case _ => return None
    }

    // the partials store, collapsed to one exact row per (file,
    // partition) — duplication-absorbing, see Rollup.filePartials
    val partials =
      graft.ingest.Rollup.filePartials(session, rollupDir).queryExecution.analyzed
    val pAttr: Map[String, Attribute] = partials.output.map(a => a.name -> a).toMap

    def servedAgg(fn: Expression): Option[Expression] = fn match {
      case Count(Seq(Literal(1, _))) =>
        Some(Coalesce(Seq(Sum(pAttr("n_rows")).toAggregateExpression(), Literal(0L))))
      case Count(Seq(a: AttributeReference)) if a.name == "value" =>
        Some(Coalesce(Seq(Sum(pAttr("n_value")).toAggregateExpression(), Literal(0L))))
      case Min(a: AttributeReference) if a.name == "event_time_utc" =>
        Some(Min(pAttr("min_ts")).toAggregateExpression())
      case Max(a: AttributeReference) if a.name == "event_time_utc" =>
        Some(Max(pAttr("max_ts")).toAggregateExpression())
      case _ => None
    }

    val newResult: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference if groupNames.contains(a.name) =>
        Alias(pAttr(a.name), a.name)(exprId = a.exprId)
      case al @ Alias(a: AttributeReference, name) if groupNames.contains(a.name) =>
        Alias(pAttr(a.name), name)(exprId = al.exprId)
      case al @ Alias(ae: AggregateExpression, name)
          if !ae.isDistinct && ae.filter.isEmpty =>
        val served = servedAgg(ae.aggregateFunction).getOrElse(return None)
        // exact type equality keeps the swap invisible to parents
        if (served.dataType != al.dataType) return None
        Alias(served, name)(exprId = al.exprId)
      case _ => return None
    }

    val transposed = filters.map(_.transform {
      case a: AttributeReference => pAttr(a.name)
    })
    val filtered = transposed.reduceOption(And)
      .map(Filter(_, partials)).getOrElse(partials)
    Some(Aggregate(groupNames.map(pAttr(_)), newResult, filtered, None))
  }

  /** The relation qualifies iff it is a single-root parquet scan with
    * the curated-lake schema and a sibling `rollup/` directory that
    * actually holds partials; returns that directory. */
  private def servableLakeRollup(rel: LogicalRelation): Option[String] =
    rel.relation match {
      case fs: HadoopFsRelation if fs.location.rootPaths.lengthCompare(1) == 0 =>
        val names = rel.schema.fields.map(f => f.name -> f.dataType).toMap
        val lakeShaped =
          names.get("year").contains(IntegerType) &&
            names.get("month").contains(IntegerType) &&
            names.get("day").contains(IntegerType) &&
            names.get("mode").contains(StringType) &&
            names.contains("event_time_utc") && names.contains("value")
        if (!lakeShaped) return None
        val root = fs.location.rootPaths.head
        Option(root.getParent).map(new Path(_, "rollup").toString)
          .filter(graft.ingest.Rollup.hasData(session, _))
      case _ => None
    }
}

object RollupMetadataAggregate {
  /** Session conf killing the rewrite (default on): set to `false` for
    * lakes whose history predates the rollup protocol. */
  val EnabledKey = "spark.graft.rollup.metadataAgg"

  private val PartitionCols = Set("year", "month", "day", "mode")
}
