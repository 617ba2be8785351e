package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HllSketchAgg, HllUnionAgg, Max, Min, Sum}
import org.apache.spark.sql.catalyst.planning.PhysicalOperation
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, TimestampNTZType}

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
  *    per-file minima), `max(event_time_utc)`,
  *    `sum(round(value*1e6)::long)` (= Σ value_e6, the repo's
  *    integer-exact e6 convention — exact because integer addition is
  *    associative), or `hll_sketch_estimate(hll_sketch_agg(user_id))`
  *    (= estimate of the register-wise-max union of stored sketches,
  *    grouped aggregates only) — no DISTINCT, no FILTER clause.
  *    Deterministic scalar wrappers around served aggregates
  *    (`unix_micros(min(...))`, count arithmetic) are rebuilt
  *    unchanged. Anything else (a raw fp `sum(value)`, a sum at a
  *    different rounding scale, a non-partition grouping,
  *    `countDistinct`, the raw sketch bytes) leaves the plan untouched.
  *
  * `approx_top_k(user_id, k)` is unservable BY DEFAULT even though the
  * partials carry frequency sketches: the HLL serve is legal because a
  * union of partial HLLs is ESTIMATE-IDENTICAL to a direct sketch by
  * construction (register-wise max), but a merge of frequency sketches
  * only equals a direct sketch while both sides stay under their
  * (different) capacities — beyond that the swap would be observable,
  * violating this rule's exactness contract. Heavy-hitter consumers
  * use the reader-side fold (q117's shape) and accept its documented
  * error envelope explicitly — or OPT IN to the served form with
  * `spark.graft.rollup.approxServe=true` ([[RollupMetadataAggregate.ApproxServeKey]]):
  * grouped `approx_top_k(user_id, k)` with foldable
  * `k ≤ Rollup.TopKCapacity` is then answered by combining the stored
  * sketches (metadata cost), EXACT below ~¾ of `Rollup.TopKCapacity`
  * distinct users per group and error-bounded by the DataSketches
  * guarantee beyond — the same envelope q117 documents, and the
  * `sketch_saturation` alarm is the boundary's observer. The flag is
  * the user's explicit acceptance that the answer may differ from the
  * direct scan's in the saturated regime; the default keeps the rule
  * exactness-only.
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
        val dir = RollupMetadataAggregate.servableLakeRollup(session, rel)
          .getOrElse(return None)
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

    // name-matched column reference, looking through analyzer casts
    def isCol(e: Expression, name: String): Boolean = e match {
      case a: AttributeReference => a.name == name
      case c: Cast => isCol(c.child, name)
      case _ => false
    }
    // the e6 scale literal in whatever numeric shape analysis left it
    def isMillion(e: Expression): Boolean = e match {
      case Literal(v: Double, _) => v == 1e6
      case Literal(v: Int, _) => v == 1000000
      case Literal(v: Long, _) => v == 1000000L
      case c: Cast => isMillion(c.child)
      case _ => false
    }
    // the repo's integer-exact value convention, exactly as
    // Rollup.partials computes value_e6: round(value * 1e6)::long
    def isE6Sum(e: Expression): Boolean = e match {
      case c: Cast if c.dataType == LongType =>
        c.child match {
          case r: Round if r.scale.foldable &&
              Option(r.scale.eval()).exists(_.toString == "0") =>
            r.child match {
              case m: Multiply =>
                (isCol(m.left, "value") && isMillion(m.right)) ||
                  (isCol(m.right, "value") && isMillion(m.left))
              case _ => false
            }
          case _ => false
        }
      case _ => false
    }

    def servedAgg(fn: Expression): Option[Expression] = fn match {
      // opt-in approximate serve (object scaladoc): grouped
      // approx_top_k(user_id, k) from the stored frequency sketches.
      // Grouped only — a global aggregate over an empty selection
      // returns an empty array from a direct sketch but a null/absent
      // state from a combine over zero partial rows, and even the
      // opted-in swap must not change the EMPTY answer's shape.
      case t: aggregate.ApproxTopK
          if conf.getConfString(ApproxServeKey, "false").toBoolean &&
            agg.groupingExpressions.nonEmpty &&
            isCol(t.expr, "user_id") && t.k.foldable &&
            Option(t.k.eval()).exists(_.asInstanceOf[Int] <=
              graft.ingest.Rollup.TopKCapacity) =>
        val cap = Literal(graft.ingest.Rollup.TopKCapacity)
        val state = CreateNamedStruct(Seq(
          Literal("sketch"), pAttr("top_users"),
          Literal("maxItemsTracked"), cap,
          Literal("itemDataType"), Literal.create(null, LongType),
          Literal("itemDataTypeDDL"), Literal("item BIGINT NOT NULL")))
        Some(new ApproxTopKEstimate(
          new aggregate.ApproxTopKCombine(state, cap).toAggregateExpression(), t.k))
      case Count(Seq(Literal(1, _))) =>
        Some(Coalesce(Seq(Sum(pAttr("n_rows")).toAggregateExpression(), Literal(0L))))
      case Count(Seq(a: AttributeReference)) if a.name == "value" =>
        Some(Coalesce(Seq(Sum(pAttr("n_value")).toAggregateExpression(), Literal(0L))))
      case Min(a: AttributeReference) if a.name == "event_time_utc" =>
        Some(Min(pAttr("min_ts")).toAggregateExpression())
      case Max(a: AttributeReference) if a.name == "event_time_utc" =>
        Some(Max(pAttr("max_ts")).toAggregateExpression())
      // sum(round(value*1e6)::long) = Σ value_e6 — integer addition is
      // associative, so the fold is EXACT (a raw double sum(value) is
      // declined on purpose: fp addition is order-dependent and the
      // partials deliberately store only the exact scaled form)
      case s: Sum if isE6Sum(s.child) =>
        Some(Sum(pAttr("value_e6")).toAggregateExpression())
      case _ => None
    }

    // Serve an entire result expression: grouping attrs transpose onto
    // the partials, recognized aggregates fold from stored partials,
    // and any DETERMINISTIC scalar wrapper (unix_micros(min(...)),
    // hll_sketch_estimate(...), count arithmetic) is rebuilt unchanged
    // around the served children. Anything unrecognized declines the
    // whole rewrite.
    def rewriteExpr(e: Expression): Option[Expression] = e match {
      case a: AttributeReference =>
        if (groupNames.contains(a.name)) Some(pAttr(a.name)) else None
      // distinct-user reach: hll_sketch_estimate(hll_sketch_agg(user_id))
      // is served from the stored sketches via register-wise-max union —
      // ESTIMATE-identical (RollupSpec asserts it), which is why only the
      // estimate shape is served: the raw sketch BYTES may differ between
      // a direct sketch and a union of partial sketches, so a query
      // returning the binary sketch itself is declined by the generic
      // cases below (HllSketchAgg never appears in servedAgg). Grouped
      // aggregates only: on a global aggregate over zero rows a direct
      // sketch yields estimate 0 while a union over no partial rows is
      // NULL, and the swap must never be observable.
      case est: HllSketchEstimate if agg.groupingExpressions.nonEmpty =>
        est.child match {
          case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
            ae.aggregateFunction match {
              case h: HllSketchAgg if isCol(h.left, "user_id") &&
                  h.lgConfigK == new HllSketchAgg(h.left).lgConfigK =>
                Some(new HllSketchEstimate(
                  new HllUnionAgg(pAttr("users_hll")).toAggregateExpression()))
              case _ => None
            }
          case _ =>
            val kid = rewriteExpr(est.child)
            kid.map(k => est.withNewChildren(Seq(k)))
        }
      case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
        servedAgg(ae.aggregateFunction)
      case _: AggregateExpression => None
      case e if !e.deterministic => None
      case e =>
        val kids = e.children.map(rewriteExpr)
        if (kids.exists(_.isEmpty)) None
        else Some(e.withNewChildren(kids.map(_.get)))
    }

    val newResult: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference if groupNames.contains(a.name) =>
        Alias(pAttr(a.name), a.name)(exprId = a.exprId)
      case al @ Alias(child, name) =>
        val served = rewriteExpr(child).getOrElse(return None)
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

}

object RollupMetadataAggregate {
  /** Session conf killing the rewrite (default on): set to `false` for
    * lakes whose history predates the rollup protocol. */
  val EnabledKey = "spark.graft.rollup.metadataAgg"

  /** Opt-in (default OFF): serve grouped `approx_top_k(user_id, k)`
    * from the stored frequency sketches — metadata cost, exact below
    * ~¾ of `Rollup.TopKCapacity` distinct users per group,
    * DataSketches-error-bounded beyond (object scaladoc). */
  val ApproxServeKey = "spark.graft.rollup.approxServe"

  private val PartitionCols = Set("year", "month", "day", "mode")

  /** The relation qualifies iff it is a parquet scan of a directory
    * NAMED `curated` — the `LakeLayout` identity invariant, the only
    * directory the runners publish partials for — with the curated-lake
    * schema and a sibling `rollup/` directory that actually holds
    * partials; returns that directory. Two scan shapes qualify: the
    * plain single-root directory read, and [[graft.ingest.CuratedWriter.read]]'s
    * snapshot-pinned listing (explicit live files under a `basePath` —
    * the compacted-lake consumption path), recognized by the basePath
    * option with every root under it. The name pin matters: schema
    * shape alone would also match any lake-shaped parquet COPY placed
    * under the lake root (a `curated-sample/`, a debug snapshot), and
    * serving whole-lake statistics for a sample is an exact-looking
    * wrong answer with no error. `event_time_utc` is pinned to
    * TIMESTAMP_NTZ — the curated contract (Segregator) — so a foreign
    * zoned-timestamp lake can never be zone-pruned against
    * offset-shifted NTZ bounds or served NTZ-typed partial minima.
    * Shared with [[RollupPartitionSkip]] — one lake-identity test for
    * both rules.
    *
    * The basePath shape additionally requires COVERAGE (round 20, r19
    * ADVICE): the explicit listing must equal the lake's CURRENT live
    * file set. Without it, a partition-subtree read —
    * `spark.read.option("basePath", lake).parquet(s"\$lake/year=2024")`
    * — carries no Filter in the plan (the restriction lives entirely in
    * the listing), so the rewrite would serve WHOLE-lake aggregates for
    * a subtree scan: an exact-looking wrong answer. Equality against
    * [[graft.ingest.LakeSnapshot.liveFiles]] declines directory
    * rootPaths, file subsets, and one-cycle-stale symlink manifests
    * alike — all fail open to the real scan. The walk is driver
    * metadata work of the same order the pinned listing itself paid,
    * and only the basePath shape pays it. */
  private[plans] def servableLakeRollup(session: SparkSession,
                                        rel: LogicalRelation): Option[String] =
    rel.relation match {
      case fs: HadoopFsRelation =>
        // an explicit basePath wins even over a SINGLE root path: a
        // snapshot-pinned read of a fully-compacted small lake lists
        // exactly one live file, and that file's own path would
        // otherwise stand in as the root and fail the name check —
        // declining zone service on precisely the lake state
        // compaction works towards (one file per leaf)
        val (root, pinned) = fs.options.get("basePath").map(new Path(_)) match {
          case Some(base) =>
            val roots = fs.location.rootPaths
            if (roots == Seq(base)) (base, None) // redundant basePath on a dir read
            else {
              val prefix = base.toString.stripSuffix("/") + "/"
              if (!roots.forall(_.toString.startsWith(prefix))) return None
              (base, Some(roots))
            }
          case None => fs.location.rootPaths match {
            case Seq(single) => (single, None)
            case _ => return None
          }
        }
        if (root.getName != "curated") return None
        val names = rel.schema.fields.map(f => f.name -> f.dataType).toMap
        val lakeShaped =
          names.get("year").contains(IntegerType) &&
            names.get("month").contains(IntegerType) &&
            names.get("day").contains(IntegerType) &&
            names.get("mode").contains(StringType) &&
            names.get("event_time_utc").contains(TimestampNTZType) &&
            names.contains("value")
        if (!lakeShaped) return None
        // coverage pin for pinned listings (scaladoc): serve only when
        // the listed roots are exactly the lake's live data files
        pinned.foreach { roots =>
          val hfs = graft.engine.Fs.of(session.sparkContext.hadoopConfiguration, root)
          val listed = roots.map(hfs.makeQualified(_).toString).toSet
          val live = graft.ingest.LakeSnapshot
            .liveFiles(hfs, hfs.makeQualified(root))
            .map(_.getPath.toString).toSet
          if (listed != live) return None
        }
        Option(root.getParent).map(new Path(_, "rollup").toString)
          .filter(graft.ingest.Rollup.hasData(session, _))
      case _ => None
    }
}
