package graft.plans

import java.time.{LocalDateTime, ZoneOffset}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.planning.PhysicalOperation
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.TimestampNTZType

/** Zone-map partition skipping from the rollup's time bounds — the
  * engine's second custom `Rule[LogicalPlan]`, and the *pruning* payoff
  * of the partial store the *serving* rule
  * ([[RollupMetadataAggregate]]) already consumes.
  *
  * The curated lake is partitioned by `(year, month, day, mode)`, but
  * consumers filter by EVENT TIME: `event_time_utc BETWEEN a AND b`.
  * Spark cannot see that event time is correlated with the date
  * partitions, so a time-range query scans every partition — at
  * 100 TB, a full-lake scan for a two-day window. Lakehouse formats
  * solve this with file statistics (Delta/Iceberg data skipping, the
  * classic zone map); this rule solves it with statistics the pipeline
  * already maintains exactly: the per-(file, partition)
  * `min_ts`/`max_ts` the runners publish atomically with every batch
  * ([[graft.ingest.Rollup]]).
  *
  * Rewrite: for a `Filter` over (a bare-column projection of) the
  * curated lake whose condition constrains `event_time_utc` by
  * timestamp literals, fold the partials to per-partition time zones,
  * keep the partitions whose `[min_ts, max_ts]` intersects the
  * constraint window, and CONJOIN a
  * `struct(year, month, day, mode) IN (qualifying...)` predicate onto
  * the filter. The added conjunct references partition columns only,
  * so scan planning turns it into a partition filter: non-qualifying
  * directories are never listed into the scan. The original condition
  * is kept unchanged — the rewrite only ever ADDS a predicate implied
  * by it (rows outside the qualifying partitions cannot satisfy the
  * range constraint), so the result is untouched row-for-row no matter
  * what else the condition tests.
  *
  * Soundness details:
  *  - a range comparison is never satisfied by a NULL
  *    `event_time_utc`, so a partition whose zone bounds are NULL
  *    (all-null rows) is safe to skip — the zone filter's comparison
  *    null semantics drop it;
  *  - an inverted window (`lo > hi`, unsatisfiable) skips everything
  *    outright rather than consulting zones that test a different
  *    question;
  *  - bounds are read from BOTH comparison orientations
  *    (`ts >= lit` / `lit <= ts`) and through nothing else: a cast or
  *    arithmetic around the column defeats the zone map honestly (the
  *    rule declines rather than guesses);
  *  - the trust contract is the serving rule's, verbatim: partials are
  *    published atomically with the rows they summarize by both
  *    runners, so a graft-written lake is fully covered; a lake with
  *    pre-rollup history must backfill or disable
  *    (`spark.graft.rollup.partitionSkip=false`); q110's reconcile is
  *    the standing auditor.
  *
  * Cost and idempotence: the qualifying fold is one job over the
  * metadata-sized partial store, executed AT OPTIMIZATION TIME — the
  * same order of driver work as the partition listing it saves, and
  * the same move as Spark's own `OptimizeMetadataOnlyQuery` and
  * dynamic-partition-pruning subqueries. Results are cached per
  * (store listing signature, window), so optimizer fixpoint
  * iterations, AQE re-plans and repeated windows in a session reuse
  * one fold until a new batch lands (the signature changes, the cache
  * misses, the fold re-runs). A filter already carrying a
  * partition-struct IN conjunct — the rewrite's own output shape — is
  * left untouched, making the rule a fixpoint after one application.
  * When every partition qualifies the plan is left unchanged (no
  * predicate noise for no skipping), and when more than
  * [[RollupPartitionSkip.MaxInLiterals]] qualify the rule declines: an
  * IN-list that long prunes little and costs evaluation.
  */
case class RollupPartitionSkip(session: SparkSession) extends Rule[LogicalPlan] {
  import RollupPartitionSkip._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "true").toBoolean) return plan
    plan.transformDown {
      case f: Filter =>
        try rewrite(f).getOrElse(f)
        catch {
          case scala.util.control.NonFatal(e) =>
            if (sys.env.contains("GRAFT_RULE_DEBUG")) e.printStackTrace()
            f
        }
    }
  }

  private def rewrite(f: Filter): Option[Filter] = {
    val rollupDir = f.child match {
      case PhysicalOperation(projects, _, rel: LogicalRelation)
          if projects.forall(_.isInstanceOf[AttributeReference]) =>
        RollupMetadataAggregate.servableLakeRollup(session, rel).getOrElse(return None)
      case _ => return None
    }
    // partition attrs must be visible at this Filter (they always are
    // when the filter sits on the relation; a pruned projection in
    // between declines the rewrite instead of reaching under it)
    val byName = f.child.output.map(a => a.name -> a).toMap
    val partAttrs = PartitionColsOrdered.flatMap(byName.get)
    if (partAttrs.size != PartitionColsOrdered.size) return None

    val conjuncts = splitConjuncts(f.condition)
    // already rewritten (our own output shape): fixpoint reached
    if (conjuncts.exists(isZonePredicate)) return None

    // the tightest [lo, hi] micros window implied by top-level conjuncts
    var lo = Option.empty[Long]
    var hi = Option.empty[Long]
    def tightenLo(v: Long): Unit = lo = Some(lo.fold(v)(math.max(_, v)))
    def tightenHi(v: Long): Unit = hi = Some(hi.fold(v)(math.min(_, v)))
    // NTZ literals only: the lake contract pins event_time_utc to
    // TIMESTAMP_NTZ (servableLakeRollup), so a comparison against a
    // zoned TimestampType literal can only arise through a cast around
    // the column — which defeats the zone map honestly (decline rather
    // than risk offset-shifted bounds in a non-UTC session)
    def tsMicros(e: Expression): Option[Long] = e match {
      case Literal(v: Long, TimestampNTZType) => Some(v)
      case _ => None
    }
    def isEventTs(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name == "event_time_utc"
      case _ => false
    }
    conjuncts.foreach {
      case GreaterThanOrEqual(c, l) if isEventTs(c) => tsMicros(l).foreach(tightenLo)
      case GreaterThan(c, l) if isEventTs(c) => tsMicros(l).foreach(v => tightenLo(v + 1))
      case LessThanOrEqual(c, l) if isEventTs(c) => tsMicros(l).foreach(tightenHi)
      case LessThan(c, l) if isEventTs(c) => tsMicros(l).foreach(v => tightenHi(v - 1))
      case EqualTo(c, l) if isEventTs(c) =>
        tsMicros(l).foreach { v => tightenLo(v); tightenHi(v) }
      case EqualTo(l, c) if isEventTs(c) =>
        tsMicros(l).foreach { v => tightenLo(v); tightenHi(v) }
      case GreaterThanOrEqual(l, c) if isEventTs(c) => tsMicros(l).foreach(tightenHi)
      case GreaterThan(l, c) if isEventTs(c) => tsMicros(l).foreach(v => tightenHi(v - 1))
      case LessThanOrEqual(l, c) if isEventTs(c) => tsMicros(l).foreach(tightenLo)
      case LessThan(l, c) if isEventTs(c) => tsMicros(l).foreach(v => tightenLo(v + 1))
      case _ => ()
    }
    if (lo.isEmpty && hi.isEmpty) return None

    val inverted = lo.zip(hi).exists { case (l, h) => l > h }
    val zones =
      if (inverted) Seq.empty
      else qualifying(session, rollupDir, lo, hi).getOrElse(return None)
    val inPred =
      if (zones.isEmpty) Literal.FalseLiteral
      else {
        val struct = CreateStruct(partAttrs)
        In(struct, zones.map { case (y, m, d, mode) =>
          Literal(
            new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
              Array[Any](y, m, d,
                org.apache.spark.unsafe.types.UTF8String.fromString(mode))),
            struct.dataType)
        })
      }
    Some(Filter(And(f.condition, inPred), f.child))
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Our own output shape, in both its pre- and post-`OptimizeIn`
    * forms (plus the empty-window literal-false), so a second pass —
    * or the next fixpoint iteration — never re-folds. */
  private def isZonePredicate(e: Expression): Boolean = {
    def isPartStruct(c: Expression): Boolean = c match {
      case s: CreateNamedStruct =>
        s.valExprs.collect { case a: AttributeReference => a.name } ==
          PartitionColsOrdered && s.valExprs.size == PartitionColsOrdered.size
      case _ => false
    }
    e match {
      case In(c, _) => isPartStruct(c)
      case InSet(c, _) => isPartStruct(c)
      case Literal.FalseLiteral => true
      case _ => false
    }
  }
}

object RollupPartitionSkip {
  /** Session conf killing the rewrite (default on): set to `false` for
    * lakes whose history predates the rollup protocol. */
  val EnabledKey = "spark.graft.rollup.partitionSkip"

  /** Decline the rewrite when more partitions than this qualify — an
    * IN-list that long prunes little and costs predicate evaluation. */
  val MaxInLiterals = 1000

  private val PartitionColsOrdered = Seq("year", "month", "day", "mode")

  /** (store listing signature, lo, hi) → (qualifying zones, total
    * partitions). The signature folds every partial file's
    * (path, length, mtime), so a newly published batch invalidates
    * exactly the affected store's entries. Bounded at [[CacheMax]]
    * entries (cleared wholesale past it — one fold per distinct
    * (store state, window) is already the steady state). */
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (String, Option[Long], Option[Long]),
    (Seq[(Int, Int, Int, String)], Long)]()
  private val CacheMax = 64

  private[graft] def clearCache(): Unit = cache.clear()

  private def listingSignature(s: SparkSession, rollupDir: String): String = {
    val p = new Path(rollupDir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    val sb = new StringBuilder(rollupDir)
    while (it.hasNext) {
      val st = it.next()
      if (!st.getPath.getName.startsWith(".") && !st.getPath.getName.startsWith("_"))
        sb.append('|').append(st.getPath.toString)
          .append(':').append(st.getLen).append(':').append(st.getModificationTime)
    }
    java.util.UUID.nameUUIDFromBytes(
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString
  }

  private def ntzLit(v: Long): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.lit(
      LocalDateTime.ofEpochSecond(Math.floorDiv(v, 1000000L),
        (Math.floorMod(v, 1000000L) * 1000L).toInt, ZoneOffset.UTC))

  /** Partition tuples whose [min_ts, max_ts] zone intersects [lo, hi],
    * from one metadata-sized fold of the partial store; None (decline)
    * when more than [[MaxInLiterals]] qualify or when EVERY partition
    * does (no skipping to buy — leave the plan clean). NULL-bounded
    * partitions (all-null event times) never intersect a range window
    * and drop out with the comparison's null semantics. */
  private def qualifying(s: SparkSession, rollupDir: String,
                         lo: Option[Long], hi: Option[Long])
      : Option[Seq[(Int, Int, Int, String)]] = {
    import org.apache.spark.sql.functions._
    val key = (listingSignature(s, rollupDir), lo, hi)
    val (zones, total) = cache.get(key) match {
      case null =>
        val bounds = graft.ingest.Rollup.filePartials(s, rollupDir)
          .groupBy("year", "month", "day", "mode")
          .agg(min("min_ts").as("zmin"), max("max_ts").as("zmax"))
          .persist()
        try {
          val windowed = Seq(
            lo.map(v => col("zmax") >= ntzLit(v)),
            hi.map(v => col("zmin") <= ntzLit(v))).flatten.reduce(_ && _)
          val nTotal = bounds.count()
          val rows = bounds.filter(windowed)
            .select("year", "month", "day", "mode")
            .limit(MaxInLiterals + 1)
            .collect()
            .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3)))
            .toSeq
          if (cache.size >= CacheMax) cache.clear()
          cache.put(key, (rows, nTotal))
          (rows, nTotal)
        } finally bounds.unpersist(): Unit
      case hit => hit
    }
    if (zones.size > MaxInLiterals || zones.size.toLong >= total) None
    else Some(zones)
  }
}
