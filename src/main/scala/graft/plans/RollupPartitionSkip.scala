package graft.plans

import java.time.{LocalDateTime, ZoneOffset}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.planning.PhysicalOperation
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}
import org.apache.spark.sql.types.{DoubleType, TimestampNTZType}

/** Zone-map data skipping from the pipeline's own statistics — the
  * engine's second custom `Rule[LogicalPlan]`, and the *pruning* payoff
  * of the stores the *serving* rule ([[RollupMetadataAggregate]])
  * already consumes. Three moves, composable in one rewrite:
  *
  * 1. PARTITION-grain event-time zones (round 15). The curated lake is
  *    partitioned by `(year, month, day, mode)`, but consumers filter
  *    by EVENT TIME; the rollup partials' per-(file, partition)
  *    `min_ts`/`max_ts` fold to partition zones, and a conjoined
  *    `struct(year, month, day, mode) IN (qualifying...)` predicate
  *    turns into a partition filter at scan planning — non-qualifying
  *    directories are never listed.
  * 2. PARTITION-grain VALUE zones (round 16). The [[graft.ingest.FileBounds]]
  *    sidecar carries per-data-file `min_val`/`max_val`; folded to
  *    partition grain they prune `value`-range predicates the same way
  *    — but only for partitions the sidecar provably COVERS (Σ bounds
  *    rows == Σ partial rows; see FileBounds scaladoc for why coverage
  *    survives compaction and fails safe on partial upgrades).
  * 3. FILE-grain zones (round 16). Inside qualifying partitions, a
  *    listed file whose recorded `[min_ts, max_ts]`/`[min_val,
  *    max_val]` cannot intersect the window is dropped from the scan's
  *    listing (the relation's `FileIndex` is swapped for a
  *    [[ZonePrunedFileIndex]] over the kept files). This is what makes
  *    a qualifying partition's UNCOMPACTED tail prune: compacted files
  *    get row-group skipping from their sorted rewrite, fresh appends
  *    get it from here. Files without a bounds row (compaction output,
  *    pre-upgrade appends) are always kept — dropping fewer files is
  *    always sound.
  *
  * The original condition is kept unchanged — the rewrite only ever
  * ADDS a predicate implied by it and REMOVES files provably empty
  * under it, so the result is untouched row-for-row no matter what
  * else the condition tests.
  *
  * Soundness details:
  *  - a range comparison is never satisfied by a NULL column, so a
  *    partition (or file) whose zone bounds are NULL — all-null values
  *    — is safe to skip under a range constraint on that column;
  *  - an inverted window (`lo > hi`, unsatisfiable) skips everything
  *    outright rather than consulting zones that test a different
  *    question;
  *  - bounds are read from BOTH comparison orientations
  *    (`ts >= lit` / `lit <= ts`) and through nothing else: a cast or
  *    arithmetic around the column defeats the zone map honestly (the
  *    rule declines rather than guesses); event-time literals must be
  *    TIMESTAMP_NTZ (the lake contract — `servableLakeRollup` pins the
  *    column type) and value literals DOUBLE;
  *  - the trust contract is the serving rule's, verbatim: partials and
  *    bounds are published atomically with the rows they summarize by
  *    both runners, so a graft-written lake is fully covered; a lake
  *    with pre-rollup history must backfill or disable
  *    (`spark.graft.rollup.partitionSkip=false`); q110's reconcile is
  *    the standing auditor.
  *
  * Cost and idempotence: the qualifying fold is one job over the
  * metadata-sized stores, executed AT OPTIMIZATION TIME — the same
  * order of driver work as the partition listing it saves, and the
  * same move as Spark's own `OptimizeMetadataOnlyQuery` and
  * dynamic-partition-pruning subqueries. The file-drop set is collected
  * only for the ≤[[RollupPartitionSkip.MaxInLiterals]] qualifying
  * partitions (bounded rows) and capped at
  * [[RollupPartitionSkip.MaxDropFiles]] — a truncated drop set skips
  * less, never wrongly. Results are cached per (store listing
  * signatures, window), so optimizer fixpoint iterations, AQE re-plans
  * and repeated windows in a session reuse one fold until a new batch
  * lands. Fixpoint: a filter already carrying the zone IN conjunct is
  * left untouched, and a relation already carrying a
  * [[ZonePrunedFileIndex]] is never re-swapped. When every partition
  * qualifies and no file drops, the plan is left unchanged; when more
  * than MaxInLiterals partitions qualify the rule declines entirely
  * (an IN-list that long prunes little and the bounded drop-collect
  * loses its bound).
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

  private def dbg[T](tag: String)(b: => T): T =
    if (!sys.env.contains("GRAFT_RULE_DEBUG")) b
    else {
      val t0 = System.nanoTime()
      val r = b
      System.err.println(f"[skip-rule] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

  private def rewrite(f: Filter): Option[Filter] = {
    val (rel, rollupDir) = f.child match {
      case PhysicalOperation(projects, _, r: LogicalRelation)
          if projects.forall(_.isInstanceOf[AttributeReference]) =>
        (r, RollupMetadataAggregate.servableLakeRollup(session, r)
          .getOrElse(return None))
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
    def isCol(e: Expression, name: String): Boolean = e match {
      case a: AttributeReference => a.name == name
      case _ => false
    }
    // the tightest value window, as (bound, inclusive) pairs — doubles
    // have no ±1 trick, so exclusivity travels explicitly
    var vlo = Option.empty[(Double, Boolean)]
    var vhi = Option.empty[(Double, Boolean)]
    def dbl(e: Expression): Option[Double] = e match {
      case Literal(v: Double, DoubleType) => Some(v)
      case _ => None
    }
    def tightenVlo(v: Double, incl: Boolean): Unit = vlo = Some(vlo match {
      case Some((c, ci)) if c > v || (c == v && !ci) => (c, ci)
      case _ => (v, incl)
    })
    def tightenVhi(v: Double, incl: Boolean): Unit = vhi = Some(vhi match {
      case Some((c, ci)) if c < v || (c == v && !ci) => (c, ci)
      case _ => (v, incl)
    })
    conjuncts.foreach {
      case GreaterThanOrEqual(c, l) if isCol(c, TsCol) => tsMicros(l).foreach(tightenLo)
      case GreaterThan(c, l) if isCol(c, TsCol) => tsMicros(l).foreach(v => tightenLo(v + 1))
      case LessThanOrEqual(c, l) if isCol(c, TsCol) => tsMicros(l).foreach(tightenHi)
      case LessThan(c, l) if isCol(c, TsCol) => tsMicros(l).foreach(v => tightenHi(v - 1))
      case EqualTo(c, l) if isCol(c, TsCol) =>
        tsMicros(l).foreach { v => tightenLo(v); tightenHi(v) }
      case EqualTo(l, c) if isCol(c, TsCol) =>
        tsMicros(l).foreach { v => tightenLo(v); tightenHi(v) }
      case GreaterThanOrEqual(l, c) if isCol(c, TsCol) => tsMicros(l).foreach(tightenHi)
      case GreaterThan(l, c) if isCol(c, TsCol) => tsMicros(l).foreach(v => tightenHi(v - 1))
      case LessThanOrEqual(l, c) if isCol(c, TsCol) => tsMicros(l).foreach(tightenLo)
      case LessThan(l, c) if isCol(c, TsCol) => tsMicros(l).foreach(v => tightenLo(v + 1))

      case GreaterThanOrEqual(c, l) if isCol(c, ValCol) => dbl(l).foreach(tightenVlo(_, true))
      case GreaterThan(c, l) if isCol(c, ValCol) => dbl(l).foreach(tightenVlo(_, false))
      case LessThanOrEqual(c, l) if isCol(c, ValCol) => dbl(l).foreach(tightenVhi(_, true))
      case LessThan(c, l) if isCol(c, ValCol) => dbl(l).foreach(tightenVhi(_, false))
      case EqualTo(c, l) if isCol(c, ValCol) =>
        dbl(l).foreach { v => tightenVlo(v, true); tightenVhi(v, true) }
      case EqualTo(l, c) if isCol(c, ValCol) =>
        dbl(l).foreach { v => tightenVlo(v, true); tightenVhi(v, true) }
      case GreaterThanOrEqual(l, c) if isCol(c, ValCol) => dbl(l).foreach(tightenVhi(_, true))
      case GreaterThan(l, c) if isCol(c, ValCol) => dbl(l).foreach(tightenVhi(_, false))
      case LessThanOrEqual(l, c) if isCol(c, ValCol) => dbl(l).foreach(tightenVlo(_, true))
      case LessThan(l, c) if isCol(c, ValCol) => dbl(l).foreach(tightenVlo(_, false))
      case _ => ()
    }
    if (lo.isEmpty && hi.isEmpty && vlo.isEmpty && vhi.isEmpty) return None

    val tsInverted = lo.zip(hi).exists { case (l, h) => l > h }
    val vInverted = vlo.zip(vhi).exists { case ((a, ai), (b, bi)) =>
      a > b || (a == b && !(ai && bi))
    }
    val fold =
      if (tsInverted || vInverted) Folded(Seq.empty, Long.MaxValue, Set.empty)
      else dbg("foldZones")(
        foldZones(session, rollupDir, lo, hi, vlo, vhi).getOrElse(return None))

    val inPredOpt =
      if (fold.zones.size.toLong >= fold.total) None
      else if (fold.zones.isEmpty) Some(Literal.FalseLiteral)
      else {
        val struct = CreateStruct(partAttrs)
        Some(In(struct, fold.zones.map { case (y, m, d, mode) =>
          Literal(
            new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
              Array[Any](y, m, d,
                org.apache.spark.unsafe.types.UTF8String.fromString(mode))),
            struct.dataType)
        }))
      }

    // FILE-grain: swap the relation's listing for the kept subset. Only
    // for concrete already-materialized listings (a CatalogFileIndex's
    // deferred listing is the partition-IN pred's job, not ours to
    // materialize), and never twice (ZonePrunedFileIndex is the
    // fixpoint marker). The swap constructs the pruned index from the
    // FileStatuses the original index already holds — ZERO filesystem
    // calls, no re-listing job (an InMemoryFileIndex over thousands of
    // explicit paths would re-stat every one). When the partition
    // IN-pred is also added, non-qualifying partitions are dropped from
    // the index wholesale (their rows cannot pass the conjunct), so the
    // pruned index is bounded by the qualifying-partition file count.
    val hfs = rel.relation.asInstanceOf[HadoopFsRelation]
    val newRelOpt =
      if (fold.drop.isEmpty ||
          !hfs.location.isInstanceOf[
            org.apache.spark.sql.execution.datasources.PartitioningAwareFileIndex] ||
          hfs.location.isInstanceOf[ZonePrunedFileIndex]) None
      else dbg("file-grain swap") {
        val ps = hfs.partitionSchema
        val idx = PartitionColsOrdered.map(ps.fieldIndex)
        val zoneSet = fold.zones.toSet
        var dropped = 0
        val keptDirs = scala.collection.mutable.ArrayBuffer.empty[
          (org.apache.spark.sql.execution.datasources.PartitionPath,
            Array[org.apache.hadoop.fs.FileStatus])]
        hfs.location.listFiles(Nil, Nil).foreach { pd =>
          val key = (pd.values.getInt(idx(0)), pd.values.getInt(idx(1)),
            pd.values.getInt(idx(2)), pd.values.getUTF8String(idx(3)).toString)
          if (inPredOpt.isDefined && !zoneSet.contains(key)) {
            dropped += pd.files.size // whole partition outside the IN-pred
          } else {
            val kept = pd.files.collect {
              case st if !fold.drop.contains((key, st.getPath.getName)) =>
                st.fileStatus
            }
            dropped += pd.files.size - kept.size
            if (kept.nonEmpty)
              keptDirs += ((org.apache.spark.sql.execution.datasources
                .PartitionPath(pd.values, kept.head.getPath.getParent),
                kept.toArray))
          }
        }
        if (dropped == 0) None
        else {
          val base = new Path(new Path(rollupDir).getParent, "curated")
          val fs = base.getFileSystem(session.sparkContext.hadoopConfiguration)
          val spec = org.apache.spark.sql.execution.datasources.PartitionSpec(
            ps, keptDirs.map(_._1).toSeq)
          val pruned = new ZonePrunedFileIndex(session, fs.makeQualified(base),
            spec, keptDirs.map(t => t._1.path -> t._2).toMap)
          Some(rel.copy(relation = hfs.copy(location = pruned)(session)))
        }
      }

    if (inPredOpt.isEmpty && newRelOpt.isEmpty) return None
    val newChild = newRelOpt match {
      case Some(nr) => f.child.transformUp {
        case r: LogicalRelation if r eq rel => nr
      }
      case None => f.child
    }
    Some(Filter(inPredOpt.map(And(f.condition, _)).getOrElse(f.condition), newChild))
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

/** The file-grain swap's marker + mechanism: a
  * `PartitioningAwareFileIndex` over the zone-kept files, constructed
  * ENTIRELY from the FileStatuses and partition values the original
  * index already resolved — zero filesystem calls, so the swap costs
  * driver-memory bookkeeping, never a re-listing job. Partition-filter
  * pruning, `_metadata`, and scan planning behave exactly as on the
  * index it replaces (all inherited from the same base class Spark's
  * own indexes share). Its concrete type doubles as the rule's
  * fixpoint marker (a relation is never swapped twice), and its single
  * root path keeps the lake-identity test intact. */
private[plans] class ZonePrunedFileIndex(
    session: SparkSession, lakeRoot: Path,
    spec: org.apache.spark.sql.execution.datasources.PartitionSpec,
    dirFiles: Map[Path, Array[org.apache.hadoop.fs.FileStatus]])
  extends org.apache.spark.sql.execution.datasources.PartitioningAwareFileIndex(
    session, Map.empty, None) {
  override def rootPaths: Seq[Path] = Seq(lakeRoot)
  override def partitionSpec(): org.apache.spark.sql.execution.datasources.PartitionSpec =
    spec
  override protected val leafFiles
      : scala.collection.mutable.LinkedHashMap[Path, org.apache.hadoop.fs.FileStatus] = {
    val m = scala.collection.mutable.LinkedHashMap
      .empty[Path, org.apache.hadoop.fs.FileStatus]
    dirFiles.valuesIterator.flatten.foreach(st => m += st.getPath -> st)
    m
  }
  override protected val leafDirToChildrenFiles
      : Map[Path, Array[org.apache.hadoop.fs.FileStatus]] = dirFiles
  override def refresh(): Unit = ()
}

object RollupPartitionSkip {
  /** Session conf killing the rewrite (default on): set to `false` for
    * lakes whose history predates the rollup protocol. */
  val EnabledKey = "spark.graft.rollup.partitionSkip"

  /** Decline the rewrite when more partitions than this qualify — an
    * IN-list that long prunes little, costs predicate evaluation, and
    * unbounds the file-drop collect. */
  val MaxInLiterals = 1000

  /** Cap on the collected file-drop set: a truncated set skips fewer
    * files, never wrongly. 10k × ~100 B keys is ~1 MB of driver state
    * for a window crossing every one of MaxInLiterals partitions. */
  val MaxDropFiles = 10000

  private val PartitionColsOrdered = Seq("year", "month", "day", "mode")
  private val TsCol = "event_time_utc"
  private val ValCol = "value"

  private[plans] final case class Folded(
      zones: Seq[(Int, Int, Int, String)], total: Long,
      drop: Set[((Int, Int, Int, String), String)])

  /** (partials sig, bounds sig, lo, hi, vlo, vhi) → fold. The signature
    * folds every store file's (path, length, mtime), so a newly
    * published batch invalidates exactly the affected store's entries.
    * Bounded at [[CacheMax]] entries (cleared wholesale past it — one
    * fold per distinct (store state, window) is already the steady
    * state). */
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (String, String, Option[Long], Option[Long],
      Option[(Double, Boolean)], Option[(Double, Boolean)]), Folded]()
  private val CacheMax = 64

  private[graft] def clearCache(): Unit = cache.clear()

  private def listingSignature(s: SparkSession, dir: String): String = {
    val p = new Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return "absent"
    val it = fs.listFiles(p, true)
    val sb = new StringBuilder(dir)
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

  /** One metadata-sized fold: qualifying partition zones (time ∩
    * covered-value), the total partition count, and the per-file drop
    * set inside qualifying partitions. None (decline) when more than
    * [[MaxInLiterals]] partitions qualify. NULL-bounded partitions and
    * files (all-null column) never intersect a range window on that
    * column and are skipped under it — the comparison's null semantics
    * for the partition fold, an explicit coalesce for the file filter. */
  private def foldZones(s: SparkSession, rollupDir: String,
                        lo: Option[Long], hi: Option[Long],
                        vlo: Option[(Double, Boolean)], vhi: Option[(Double, Boolean)])
      : Option[Folded] = {
    import org.apache.spark.sql.functions._
    val fbDir = new Path(new Path(rollupDir).getParent, "filebounds").toString
    val fbSig = listingSignature(s, fbDir)
    val key = (listingSignature(s, rollupDir), fbSig, lo, hi, vlo, vhi)
    val folded = cache.get(key) match {
      case null =>
        val haveFb = fbSig != "absent" &&
          graft.ingest.FileBounds.hasData(s, fbDir)
        val tsBounds = graft.ingest.Rollup.filePartials(s, rollupDir)
          .groupBy("year", "month", "day", "mode")
          .agg(min("min_ts").as("zmin"), max("max_ts").as("zmax"))
        val tsKeep = Seq(
          lo.map(v => col("zmax") >= ntzLit(v)),
          hi.map(v => col("zmin") <= ntzLit(v))).flatten
          .reduceOption(_ && _).getOrElse(lit(true))
        val wantValue = vlo.isDefined || vhi.isDefined
        val bounds =
          if (!wantValue || !haveFb) tsBounds.withColumn("keep", tsKeep)
          else {
            // value zones apply only where the sidecar COVERS the
            // partition (FileBounds.partitionValueZones) — an uncovered
            // partition keeps its time-only verdict
            val vz = graft.ingest.FileBounds
              .partitionValueZones(s, fbDir, rollupDir)
            val vKeep = !coalesce(col("covered"), lit(false)) ||
              coalesce(graft.ingest.FileBounds.intersects(
                col("vmin"), col("vmax"), vlo, vhi), lit(false))
            tsBounds.join(vz, Seq("year", "month", "day", "mode"), "left")
              .withColumn("keep", tsKeep && vKeep)
          }
        val persisted = bounds.persist()
        try {
          val nTotal = persisted.count()
          val rows = persisted.filter(col("keep"))
            .select("year", "month", "day", "mode")
            .limit(MaxInLiterals + 1)
            .collect()
            .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3)))
            .toSeq
          val drop: Set[((Int, Int, Int, String), String)] =
            if (!haveFb || rows.size > MaxInLiterals || rows.isEmpty) Set.empty
            else {
              import s.implicits._
              val zdf = broadcast(rows.toDF("year", "month", "day", "mode"))
              val fIntersect = Seq(
                lo.map(v => col("max_ts") >= ntzLit(v)),
                hi.map(v => col("min_ts") <= ntzLit(v))).flatten
                .reduceOption(_ && _).getOrElse(lit(true)) &&
                graft.ingest.FileBounds.intersects(
                  col("min_val"), col("max_val"), vlo, vhi)
              graft.ingest.FileBounds.all(s, fbDir)
                .join(zdf, Seq("year", "month", "day", "mode"))
                .filter(!coalesce(fIntersect, lit(false)))
                .select("year", "month", "day", "mode", "data_file")
                .limit(MaxDropFiles)
                .collect()
                .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3)),
                  r.getString(4)))
                .toSet
            }
          val result = Folded(rows, nTotal, drop)
          if (cache.size >= CacheMax) cache.clear()
          cache.put(key, result)
          result
        } finally persisted.unpersist(): Unit
      case hit => hit
    }
    if (folded.zones.size > MaxInLiterals) None else Some(folded)
  }
}
