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
  * 2. PARTITION-grain COLUMN zones (round 16 for `value`, generalized
  *    round 17 to every bounds column). The [[graft.ingest.FileBounds]]
  *    sidecar carries per-data-file min/max for `value` AND for every
  *    numeric/timestamp curated column (`nn_/min_/max_<col>` triplets,
  *    schema-driven — FileBounds.boundsColumns); folded to partition
  *    grain they prune range predicates on those columns the same way
  *    — but only for partitions the sidecar provably COVERS FOR THAT
  *    COLUMN (legacy: Σ bounds rows == Σ partial rows; generic: the Σ
  *    runs over rows that KNOW the column, so a pre-upgrade file makes
  *    its partition uncovered for new columns while staying covered for
  *    old ones; see FileBounds scaladoc for why coverage survives
  *    compaction and fails safe on partial upgrades).
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
  * than MaxInLiterals partitions qualify, the rewrite flips to the
  * COMPLEMENT form — `NOT (struct IN (non-qualifying...))` — whenever
  * the excluded set fits the same cap (a wide window over a
  * 10k-partition lake that misses a few hundred cold partitions still
  * prunes them), and declines only when BOTH membership lists exceed
  * it (nothing bounded would prune much anyway).
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

    // the tightest per-COLUMN [lo, hi] windows implied by top-level
    // conjuncts, for every supported column the filter's child exposes
    // (timestamp_ntz + the numeric types the bounds sidecar tracks).
    // A comparison qualifies only when the literal's type EQUALS the
    // column's (coercion has already run, so a same-typed literal is
    // what an honest range predicate looks like; a cast AROUND the
    // column defeats the zone map and the rule declines rather than
    // guesses — same posture for NTZ-vs-zoned timestamps as round 15).
    val colTypes: Map[String, org.apache.spark.sql.types.DataType] =
      f.child.output.collect {
        case a: AttributeReference if !PartitionColsOrdered.contains(a.name) &&
            supportedType(a.dataType) => a.name -> a.dataType
      }.toMap
    val ranges = extractRanges(conjuncts, colTypes)
    // disjunction windows (round 18): a top-level `Or` conjunct whose
    // EVERY disjunct bounds one common column folds to a UNION of
    // windows on it — the "compare two date ranges" BI staple. Each
    // disjunct's extracted window is a SUPERSET of that disjunct's rows
    // (the tightener only intersects recognized constraints; everything
    // unrecognized, including predicates on other columns, just widens),
    // so the union covers every row the Or admits — pruning a zone that
    // intersects none of the windows is sound. A disjunct that bounds
    // the column not at all (satisfied via other columns, an IS NULL,
    // an opaque function) removes the column from the candidate set.
    val orSets = scala.collection.mutable.Map.empty[String, Vector[Seq[Win]]]
    conjuncts.foreach {
      case or: Or =>
        val maps = splitDisjuncts(or).map(d => extractRanges(splitConjuncts(d), colTypes))
        maps.map(_.keySet).reduceOption(_ intersect _).getOrElse(Set.empty[String])
          .foreach { c =>
            orSets(c) = orSets.getOrElse(c, Vector.empty) :+ maps.map(_(c))
          }
      case _ => ()
    }
    // nullness constraints (round 18): serviced from the sidecar's
    // nn_<c> null counts (and, for the legacy value column, its
    // all-null-means-null-bounds rule) — `IS NULL` prunes partitions/
    // files provably free of nulls, `IS NOT NULL` prunes all-null ones
    val nulls = scala.collection.mutable.Map.empty[String, (Boolean, Boolean)]
    conjuncts.foreach {
      case IsNull(a: AttributeReference) if colTypes.contains(a.name) =>
        nulls(a.name) = (true, nulls.getOrElse(a.name, (false, false))._2)
      case IsNotNull(a: AttributeReference) if colTypes.contains(a.name) =>
        nulls(a.name) = (nulls.getOrElse(a.name, (false, false))._1, true)
      case _ => ()
    }
    // exact membership sets (round 19): an equality / IN / INSET
    // conjunct pins the column to a FINITE value set — beyond the
    // [min, max] envelope the window extraction already takes, the
    // drop path can probe each candidate file's Bloom filter
    // ([[graft.ingest.FileBounds.bfCol]]) for the set, which is what
    // prunes point lookups on hash-shaped columns whose windows span
    // everything. Multiple membership conjuncts intersect; a set past
    // [[BloomProbeMaxValues]] disqualifies (the probe array is driver
    // state and the envelope window still applies).
    val eqSets = extractEqSets(conjuncts, colTypes)
    val consCols = ranges.keySet ++ orSets.keySet ++ nulls.keySet
    val cons: Map[String, ColCons] = consCols.map { c =>
      val (isN, notN) = nulls.getOrElse(c, (false, false))
      c -> ColCons(colTypes(c),
        ranges.get(c).map(w => Seq(Seq(w))).getOrElse(Seq.empty) ++
          orSets.getOrElse(c, Vector.empty),
        notNull = notN, isNull = isN,
        eqs = eqSets.getOrElse(c, Seq.empty))
    }.toMap
    // any recognized constraint triggers the fold — including a bare
    // IS NOT NULL on a sidecar-tracked column (the drifted-column
    // payoff: `WHERE extra_field IS NOT NULL` prunes every partition
    // whose files predate the field, which on an evolving lake is most
    // of it). Event-time nullness alone does NOT trigger: the partials
    // carry no null counts, so the fold could never act on it (Catalyst
    // infers IsNotNull for every compared column — a range on ts
    // triggers via its window as before).
    if (!cons.exists { case (c, k) =>
        k.sets.nonEmpty || k.isNull || (k.notNull && c != TsCol) }) return None

    // unsatisfiable shapes collapse to an empty scan without a fold:
    // a column required null AND range-bounded (or non-null) matches
    // nothing, as does a disjunction set whose every window is inverted
    val inverted = cons.values.exists { k =>
      (k.isNull && (k.notNull || k.sets.nonEmpty)) ||
        k.sets.exists(set => set.forall(winInverted(k.dt, _)))
    }
    val fold =
      if (inverted) Folded(Seq.empty, Long.MaxValue, Set.empty)
      else dbg("foldZones")(
        foldZones(session, rollupDir, cons).getOrElse(return None))

    def structLits(keys: Seq[(Int, Int, Int, String)]): (Expression, Seq[Literal]) = {
      val struct = CreateStruct(partAttrs)
      (struct, keys.map { case (y, m, d, mode) =>
        Literal(
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](y, m, d,
              org.apache.spark.unsafe.types.UTF8String.fromString(mode))),
          struct.dataType)
      })
    }
    val antiMode = fold.zones.size > maxInLiterals(session)
    val inPredOpt =
      if (antiMode) {
        // complement form: more partitions qualify than the IN cap, but
        // the EXCLUDED set is small — prune it with NOT IN instead of
        // declining (foldZones guaranteed anti fits the cap here)
        if (fold.anti.isEmpty) None
        else {
          val (struct, lits) = structLits(fold.anti)
          Some(Not(In(struct, lits)))
        }
      }
      else if (fold.zones.size.toLong >= fold.total) None
      else if (fold.zones.isEmpty) Some(Literal.FalseLiteral)
      else {
        val (struct, lits) = structLits(fold.zones)
        Some(In(struct, lits))
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
          if (inPredOpt.isDefined && !antiMode && !zoneSet.contains(key)) {
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
          val fs = graft.engine.Fs.of(session.sparkContext.hadoopConfiguration, base)
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

  private def splitDisjuncts(e: Expression): Seq[Expression] = e match {
    case Or(l, r) => splitDisjuncts(l) ++ splitDisjuncts(r)
    case other => Seq(other)
  }

  private def winInverted(dt: org.apache.spark.sql.types.DataType, w: Win): Boolean =
    w.lo.zip(w.hi).exists { case ((a, ai), (b, bi)) =>
      val c = ordOf(dt).compare(a, b)
      c > 0 || (c == 0 && !(ai && bi))
    }

  /** The tightest single [lo, hi] window per column implied by `preds`
    * taken as a CONJUNCTION — the round-15 matcher, factored out so the
    * disjunction handler can run it per Or-branch. Unrecognized
    * predicates tighten nothing, so every returned window is a SUPERSET
    * of the conjunction's rows on its column — exactly the property
    * both callers (top-level conjuncts, Or-disjuncts) rely on.
    * A comparison qualifies only when the literal's type EQUALS the
    * column's (coercion has already run, so a same-typed literal is
    * what an honest range predicate looks like; a cast AROUND the
    * column defeats the zone map and the matcher declines rather than
    * guesses — the round-15 posture). */
  private def extractRanges(preds: Seq[Expression],
                            colTypes: Map[String, org.apache.spark.sql.types.DataType])
      : Map[String, Win] = {
    val wins = scala.collection.mutable.Map.empty[String, Win]
    def tighten(name: String, v: Any, incl: Boolean, isLo: Boolean): Unit = {
      val dt = colTypes(name)
      val ord = ordOf(dt)
      val w = wins.getOrElse(name, Win(dt, None, None))
      val cur = if (isLo) w.lo else w.hi
      val chosen = cur match {
        case None => (v, incl)
        case Some((cv, ci)) =>
          val c = ord.compare(v, cv)
          if ((isLo && c > 0) || (!isLo && c < 0)) (v, incl)
          else if (c == 0) (cv, ci && incl) // same bound: exclusive is stricter
          else (cv, ci)
      }
      wins(name) = if (isLo) w.copy(lo = Some(chosen)) else w.copy(hi = Some(chosen))
    }
    def litFor(a: AttributeReference, e: Expression): Option[Any] = e match {
      case Literal(v, dt) if v != null && colTypes.get(a.name).contains(dt) &&
          dt == a.dataType => Some(v)
      case _ => None
    }
    preds.foreach {
      case GreaterThanOrEqual(a: AttributeReference, l) =>
        litFor(a, l).foreach(tighten(a.name, _, incl = true, isLo = true))
      case GreaterThan(a: AttributeReference, l) =>
        litFor(a, l).foreach(tighten(a.name, _, incl = false, isLo = true))
      case LessThanOrEqual(a: AttributeReference, l) =>
        litFor(a, l).foreach(tighten(a.name, _, incl = true, isLo = false))
      case LessThan(a: AttributeReference, l) =>
        litFor(a, l).foreach(tighten(a.name, _, incl = false, isLo = false))
      case EqualTo(a: AttributeReference, l) =>
        litFor(a, l).foreach { v =>
          tighten(a.name, v, incl = true, isLo = true)
          tighten(a.name, v, incl = true, isLo = false)
        }
      case EqualTo(l, a: AttributeReference) =>
        litFor(a, l).foreach { v =>
          tighten(a.name, v, incl = true, isLo = true)
          tighten(a.name, v, incl = true, isLo = false)
        }
      // null-safe equality against a NON-null literal is plain equality
      // (litFor rejects null literals; `a <=> NULL` selects null rows,
      // which no range window may stand in for)
      case EqualNullSafe(a: AttributeReference, l) =>
        litFor(a, l).foreach { v =>
          tighten(a.name, v, incl = true, isLo = true)
          tighten(a.name, v, incl = true, isLo = false)
        }
      case EqualNullSafe(l, a: AttributeReference) =>
        litFor(a, l).foreach { v =>
          tighten(a.name, v, incl = true, isLo = true)
          tighten(a.name, v, incl = true, isLo = false)
        }
      // prefix predicates (LIKE 'p%' arrives as StartsWith): the
      // matching set lies in [p, nextPrefix(p)) under binary string
      // order — any string starting with p compares >= p, and < the
      // prefix with its last code point incremented. A prefix of all
      // U+10FFFFs has no upper bound; the lower bound still prunes.
      case StartsWith(a: AttributeReference, l) =>
        litFor(a, l).foreach { v =>
          tighten(a.name, v, incl = true, isLo = true)
          nextPrefix(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)
            .foreach(np => tighten(a.name,
              org.apache.spark.unsafe.types.UTF8String.fromString(np),
              incl = false, isLo = false))
        }
      case GreaterThanOrEqual(l, a: AttributeReference) =>
        litFor(a, l).foreach(tighten(a.name, _, incl = true, isLo = false))
      case GreaterThan(l, a: AttributeReference) =>
        litFor(a, l).foreach(tighten(a.name, _, incl = false, isLo = false))
      case LessThanOrEqual(l, a: AttributeReference) =>
        litFor(a, l).foreach(tighten(a.name, _, incl = true, isLo = true))
      case LessThan(l, a: AttributeReference) =>
        litFor(a, l).foreach(tighten(a.name, _, incl = false, isLo = true))
      // membership lists imply the [min, max] envelope (null elements
      // never satisfy an IN, so dropping them only loosens the window —
      // sound). InSet is the same predicate after OptimizeIn; its
      // values are already internal-typed like Literal values. The
      // fixpoint guard only matches In/InSet over OUR partition
      // struct, so a plain column membership reaches here.
      case In(a: AttributeReference, elems) if colTypes.contains(a.name) &&
          elems.forall(_.isInstanceOf[Literal]) =>
        val vs = elems.collect {
          case Literal(v, dt) if v != null && dt == a.dataType => v
        }
        if (vs.nonEmpty) {
          val ord = ordOf(a.dataType)
          tighten(a.name, vs.min(ord), incl = true, isLo = true)
          tighten(a.name, vs.max(ord), incl = true, isLo = false)
        }
      case InSet(a: AttributeReference, set) if colTypes.contains(a.name) =>
        val vs = set.toSeq.filter(_ != null)
        if (vs.nonEmpty) {
          val ord = ordOf(a.dataType)
          tighten(a.name, vs.min(ord), incl = true, isLo = true)
          tighten(a.name, vs.max(ord), incl = true, isLo = false)
        }
      case _ => ()
    }
    wins.toMap
  }

  /** The finite value set each column is pinned to by top-level
    * membership conjuncts (equality both orientations, null-safe
    * equality against non-null literals, IN/INSET over same-typed
    * literals), intersected across conjuncts. A column is dropped when
    * any contributing set exceeds [[BloomProbeMaxValues]] or the
    * intersection is empty (the unsatisfiable case is the window
    * tightener's to collapse; probing nothing is simply sound).
    * Same-typed literals only — the [[extractRanges]] posture. */
  private def extractEqSets(preds: Seq[Expression],
                            colTypes: Map[String, org.apache.spark.sql.types.DataType])
      : Map[String, Seq[Any]] = {
    val sets = scala.collection.mutable.Map.empty[String, Option[Set[Any]]]
    def add(name: String, vs: Set[Any]): Unit = {
      val next =
        if (vs.isEmpty || vs.size > BloomProbeMaxValues) None
        else sets.get(name).flatten match {
          case Some(cur) => Some(cur intersect vs)
          case None if sets.contains(name) => None // already disqualified
          case None => Some(vs)
        }
      sets(name) = next.filter(_.nonEmpty)
    }
    def lits(a: AttributeReference, elems: Seq[Expression]): Option[Set[Any]] = {
      val vs = elems.collect {
        case Literal(v, dt) if v != null && dt == a.dataType => v
      }
      // every element must be a clean literal or the set is not the
      // predicate's full value set (a non-literal element could match
      // values outside it — probing the literals alone would over-drop)
      if (vs.size == elems.size) Some(vs.toSet) else None
    }
    preds.foreach {
      case EqualTo(a: AttributeReference, l: Literal) if colTypes.contains(a.name) =>
        lits(a, Seq(l)).foreach(add(a.name, _))
      case EqualTo(l: Literal, a: AttributeReference) if colTypes.contains(a.name) =>
        lits(a, Seq(l)).foreach(add(a.name, _))
      case EqualNullSafe(a: AttributeReference, l: Literal)
          if colTypes.contains(a.name) =>
        lits(a, Seq(l)).foreach(add(a.name, _))
      case EqualNullSafe(l: Literal, a: AttributeReference)
          if colTypes.contains(a.name) =>
        lits(a, Seq(l)).foreach(add(a.name, _))
      case In(a: AttributeReference, elems) if colTypes.contains(a.name) =>
        lits(a, elems).foreach(add(a.name, _))
      case InSet(a: AttributeReference, vset) if colTypes.contains(a.name) =>
        val vs = vset.filter(_ != null)
        if (vs.nonEmpty) add(a.name, vs.toSet)
      case _ => ()
    }
    sets.collect { case (c, Some(vs)) => c -> vs.toSeq }.toMap
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
      case Not(In(c, _)) => isPartStruct(c) // the complement form
      case Not(InSet(c, _)) => isPartStruct(c)
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

  /** Cap on either membership list. When more partitions than this
    * QUALIFY, the rewrite flips to COMPLEMENT form — `NOT (struct IN
    * (non-qualifying...))` — provided the non-qualifying side fits the
    * same cap (the common 100 TB shape: a wide window over a
    * 10k-partition lake that excludes a few hundred cold partitions
    * still prunes them, where the old behavior declined entirely); when
    * BOTH sides exceed it the rule declines. File-grain drops stay
    * positive-mode only (their collect is bounded by the qualifying
    * list). Var for specs; production value 1000. */
  private[graft] var MaxInLiterals = 1000

  /** Session-conf override of [[MaxInLiterals]]: the cap is a real
    * operator knob (driver-memory budget vs prune reach varies by
    * deployment), and a per-SESSION value lets one analytics session
    * tune it without moving every other session on the context. Read at
    * rule-apply time; part of the fold-cache key, so two sessions with
    * different caps can never serve each other's folds. q128 runs the
    * complement form on the driver's oracle surface through this knob
    * — the demo lake's 151 leaves could never overflow the production
    * cap. */
  val MaxInLiteralsKey = "spark.graft.rollup.maxInLiterals"

  private def maxInLiterals(s: SparkSession): Int =
    s.conf.getOption(MaxInLiteralsKey).map(_.trim.toInt).getOrElse(MaxInLiterals)

  /** Cap on the collected file-drop set: a truncated set skips fewer
    * files, never wrongly. 10k × ~100 B keys is ~1 MB of driver state
    * for a window crossing every one of MaxInLiterals partitions. */
  val MaxDropFiles = 10000

  private val PartitionColsOrdered = Seq("year", "month", "day", "mode")
  private val TsCol = graft.ingest.FileBounds.TsCol
  private val ValCol = graft.ingest.FileBounds.ValCol

  /** One column's extracted range window: typed literal bounds (values
    * are the Catalyst literal values of `dt`) with inclusivity. */
  private[plans] final case class Win(
      dt: org.apache.spark.sql.types.DataType,
      lo: Option[(Any, Boolean)], hi: Option[(Any, Boolean)])

  /** The types a zone window can be extracted for: the timestamp lake
    * contract plus the numeric types [[graft.ingest.FileBounds]]
    * tracks. Every one has an exact Scala ordering ([[ordOf]]) and an
    * exact same-typed literal ([[litOf]]) — no widening to double, so
    * long columns never hit a precision cliff. */
  private def supportedType(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case TimestampNTZType | DoubleType |
         org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.FloatType |
         org.apache.spark.sql.types.StringType => true
    case _ => false
  }

  private def ordOf(dt: org.apache.spark.sql.types.DataType): Ordering[Any] = (dt match {
    case TimestampNTZType | org.apache.spark.sql.types.LongType =>
      Ordering.Long.on[Any](_.asInstanceOf[Long])
    case org.apache.spark.sql.types.IntegerType => Ordering.Int.on[Any](_.asInstanceOf[Int])
    case DoubleType => Ordering.Double.TotalOrdering.on[Any](_.asInstanceOf[Double])
    case org.apache.spark.sql.types.FloatType =>
      Ordering.Float.TotalOrdering.on[Any](_.asInstanceOf[Float])
    // UTF8String.compareTo IS Spark's binary string order — the Scala-
    // side tighten/inversion decisions must agree with the engine's
    // comparisons or an "inverted window" could wrongly empty the scan
    case org.apache.spark.sql.types.StringType =>
      new Ordering[Any] {
        def compare(a: Any, b: Any): Int =
          a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
            .compareTo(b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
      }
    case other => throw new IllegalStateException(s"unsupported zone type $other")
  })

  private def litOf(v: Any, dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.Column = dt match {
    case TimestampNTZType => ntzLit(v.asInstanceOf[Long])
    case org.apache.spark.sql.types.StringType =>
      org.apache.spark.sql.functions.lit(v.toString) // UTF8String → String literal
    case _ => org.apache.spark.sql.functions.lit(v) // Int/Long/Double/Float round-trip
  }

  /** The least string strictly greater than every string starting with
    * `s`, in code-point (= UTF-8 byte) order: increment the last
    * incrementable code point and drop everything after it, skipping
    * the surrogate gap. None when every code point is U+10FFFF (no
    * finite upper bound exists). */
  private[graft] def nextPrefix(s: String): Option[String] = {
    val cps = s.codePoints().toArray
    var i = cps.length - 1
    while (i >= 0) {
      if (cps(i) < 0x10FFFF) {
        var n = cps(i) + 1
        if (n >= 0xD800 && n <= 0xDFFF) n = 0xE000
        return Some(new String(cps.take(i) :+ n, 0, i + 1))
      }
      i -= 1
    }
    None
  }

  private def loLits(w: Win): Option[(org.apache.spark.sql.Column, Boolean)] =
    w.lo.map { case (v, i) => (litOf(v, w.dt), i) }
  private def hiLits(w: Win): Option[(org.apache.spark.sql.Column, Boolean)] =
    w.hi.map { case (v, i) => (litOf(v, w.dt), i) }

  /** Everything the filter asserts about ONE column that zones can act
    * on: `sets` is a CONJUNCTION of window-DISJUNCTIONS (each inner Seq
    * came from one top-level conjunct — a plain range contributes a
    * singleton, an `Or` of ranges the union of its branch windows); a
    * zone may be skipped under a set only when it intersects NONE of
    * the set's windows. `isNull`/`notNull` carry top-level IS [NOT]
    * NULL conjuncts, serviced from the sidecar's null counts.
    * `eqs` carries the finite value set membership conjuncts pin the
    * column to (when one exists and fits [[BloomProbeMaxValues]]) —
    * the drop path probes candidate files' Bloom filters for it. */
  private[plans] final case class ColCons(
      dt: org.apache.spark.sql.types.DataType,
      sets: Seq[Seq[Win]],
      notNull: Boolean = false,
      isNull: Boolean = false,
      eqs: Seq[Any] = Seq.empty)

  /** Cap on a Bloom-probed value set: the probe hashes are literal
    * driver/plan state (8 B each) and a predicate pinning a column to
    * more than this many values is no longer a point lookup — the
    * envelope window still applies, the Bloom probe just stands down. */
  val BloomProbeMaxValues = 256

  /** Zone keep-predicate for one column's window sets over stored
    * [mn, mx] bounds: AND over sets of (OR over the set's windows of
    * "zone intersects window"). None when the column has no sets (a
    * pure nullness constraint). NULL bounds propagate null — callers
    * coalesce to the soundness default they need. */
  private def setsKeep(mn: org.apache.spark.sql.Column,
                       mx: org.apache.spark.sql.Column,
                       k: ColCons): Option[org.apache.spark.sql.Column] =
    if (k.sets.isEmpty) None
    else Some(k.sets.map(set =>
      set.map(w => graft.ingest.FileBounds.intersectsLits(mn, mx, loLits(w), hiLits(w)))
        .reduce(_ || _)).reduce(_ && _))

  /** `zones` = qualifying partitions (collected to MaxInLiterals+1);
    * `anti` = NON-qualifying partitions, collected only when `zones`
    * overflowed the cap (the complement-form path), empty otherwise. */
  private[plans] final case class Folded(
      zones: Seq[(Int, Int, Int, String)], total: Long,
      drop: Set[((Int, Int, Int, String), String)],
      anti: Seq[(Int, Int, Int, String)] = Seq.empty)

  /** (partials sig, bounds sig, windows) → fold. The signature folds
    * every store file's (path, length, mtime), so a newly published
    * batch invalidates exactly the affected store's entries. Bounded at
    * [[CacheMax]] entries with LRU eviction (access-ordered
    * LinkedHashMap): a busy multi-lake session evicts the coldest
    * (lake, window) fold, never every lake's folds at once. */
  private type CacheKey = (String, String, Map[String, ColCons], Int)
  private val cache: java.util.Map[CacheKey, Folded] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[CacheKey, Folded](16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[CacheKey, Folded]): Boolean = size() > CacheMax
      })
  private[graft] var CacheMax = 64

  /** Count of ACTUAL folds run (cache misses) — observable by specs
    * pinning the LRU contract. */
  private[graft] val foldCount = new java.util.concurrent.atomic.AtomicLong

  private[graft] def clearCache(): Unit = cache.clear()

  private def listingSignature(s: SparkSession, dir: String): String = {
    val p = new Path(dir)
    val fs = graft.engine.Fs.of(s.sparkContext.hadoopConfiguration, p)
    if (!fs.exists(p)) return "absent"
    val sb = new StringBuilder(dir)
    // listStatus walk, not fs.listFiles(recursive) — the located-status
    // iterator resolves block locations per file (~5 ms/file locally),
    // which made the fold cache's HIT path cost ~0.4 s per query on the
    // clustered demo store (round 21; SchemaMemo documents the numbers)
    graft.ingest.SchemaMemo.signListing(fs, p, sb)
    java.util.UUID.nameUUIDFromBytes(
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString
  }

  private def ntzLit(v: Long): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.lit(
      LocalDateTime.ofEpochSecond(Math.floorDiv(v, 1000000L),
        (Math.floorMod(v, 1000000L) * 1000L).toInt, ZoneOffset.UTC))

  /** One metadata-sized fold: qualifying partition zones (event-time ∩
    * every covered bounds column with a window), the total partition
    * count, and the per-file drop set inside qualifying partitions.
    * None (decline) when more than [[MaxInLiterals]] partitions qualify
    * or when no window is serviceable by any store. NULL-bounded
    * partitions and files (all-null column) never intersect a range
    * window on that column and are skipped under it — the comparison's
    * null semantics for the partition fold, an explicit coalesce for
    * the file filter. Generic columns additionally distinguish UNKNOWN
    * (`nn_<c>` NULL after a schema-evolving merge: the row predates the
    * column — never skippable) from known-all-null (`nn_<c>` = 0 —
    * skippable), per FileBounds' trust contract. */
  private def foldZones(s: SparkSession, rollupDir: String,
                        wins: Map[String, ColCons]): Option[Folded] = {
    import org.apache.spark.sql.functions._
    val fbDir = new Path(new Path(rollupDir).getParent, "filebounds").toString
    val fbSig = listingSignature(s, fbDir)
    val cap = maxInLiterals(s)
    val key = (listingSignature(s, rollupDir), fbSig, wins, cap)
    val folded = cache.get(key) match {
      case null =>
        foldCount.incrementAndGet(): Unit
        val haveFb = fbSig != "absent" &&
          graft.ingest.FileBounds.hasData(s, fbDir)
        val fbAll = if (haveFb) Some(graft.ingest.FileBounds.all(s, fbDir)) else None
        // which constraints can any store actually service? The partials
        // track event time (ranges only — no null counts); the sidecar
        // services value ranges + value IS NOT NULL (its legacy
        // NULL-bounds-means-all-null rule) and, for generic columns,
        // ranges plus BOTH null directions (the nn_<c> counts).
        val tsWin = wins.get(TsCol).filter(_.sets.nonEmpty)
        val valWin = wins.get(ValCol)
          .filter(k => haveFb && (k.sets.nonEmpty || k.notNull))
        val genWins = wins.filter { case (c, k) =>
          c != TsCol && c != ValCol &&
            (k.sets.nonEmpty || k.notNull || k.isNull) && fbAll.exists { df =>
              val cols = df.columns.toSet
              cols.contains(graft.ingest.FileBounds.nnCol(c)) &&
                cols.contains(graft.ingest.FileBounds.minCol(c))
            }
        }
        if (tsWin.isEmpty && valWin.isEmpty && genWins.isEmpty) return None
        val tsBounds = graft.ingest.Rollup.filePartials(s, rollupDir)
          .groupBy("year", "month", "day", "mode")
          .agg(min("min_ts").as("pzmin"), max("max_ts").as("pzmax"))
        val tsKeep = tsWin.flatMap(k => setsKeep(col("pzmin"), col("pzmax"), k))
          .getOrElse(lit(true))
        val bounds =
          if (valWin.isEmpty && genWins.isEmpty) tsBounds.withColumn("keep", tsKeep)
          else {
            // per-column zones apply only where the sidecar COVERS the
            // partition FOR THAT COLUMN (FileBounds.partitionZones) —
            // an uncovered partition keeps its other columns' verdict
            val vz = graft.ingest.FileBounds
              .partitionZones(s, fbDir, rollupDir, genWins.keys.toSeq.sorted)
            val vKeep = valWin.map { k =>
              val range = setsKeep(col("vmin"), col("vmax"), k)
                .map(coalesce(_, lit(false))).getOrElse(lit(true))
              // covered + NULL vmin = every file all-null (legacy rule)
              val nonNull = if (k.notNull) col("vmin").isNotNull else lit(true)
              !coalesce(col("covered"), lit(false)) || (range && nonNull)
            }.getOrElse(lit(true))
            val gKeep = genWins.toSeq.sortBy(_._1).map { case (c, k) =>
              val range = setsKeep(col(s"zmin_$c"), col(s"zmax_$c"), k)
                .map(coalesce(_, lit(false))).getOrElse(lit(true))
              // covered ⇒ znn_<c> = the partition's true non-null count
              // and p_rows its true row count: no non-nulls fails
              // IS NOT NULL, no nulls fails IS NULL
              val nonNull =
                if (k.notNull) coalesce(col(s"znn_$c") > 0, lit(true)) else lit(true)
              val someNull =
                if (k.isNull) coalesce(col(s"znn_$c") < col("p_rows"), lit(true))
                else lit(true)
              !coalesce(col(s"covered_$c"), lit(false)) ||
                (range && nonNull && someNull)
            }.reduceOption(_ && _).getOrElse(lit(true))
            tsBounds.join(vz, Seq("year", "month", "day", "mode"), "left")
              .withColumn("keep", tsKeep && vKeep && gKeep)
          }
        val persisted = bounds.persist()
        try {
          val nTotal = persisted.count()
          val rows = persisted.filter(col("keep"))
            .select("year", "month", "day", "mode")
            .limit(cap + 1)
            .collect()
            .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3)))
            .toSeq
          // qualifying side overflowed: collect the complement instead
          // (NULL keep = non-intersecting zone = non-qualifying, hence
          // the coalesce — the positive filter drops those rows too)
          val anti: Seq[(Int, Int, Int, String)] =
            if (rows.size <= cap) Seq.empty
            else persisted.filter(!coalesce(col("keep"), lit(false)))
              .select("year", "month", "day", "mode")
              .limit(cap + 1)
              .collect()
              .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3)))
              .toSeq
          val drop: Set[((Int, Int, Int, String), String)] =
            if (!haveFb || rows.size > cap || rows.isEmpty) Set.empty
            else {
              import s.implicits._
              val zdf = broadcast(rows.toDF("year", "month", "day", "mode"))
              // legacy pair: every bounds row tracks them; NULL bounds =
              // all-null column = cannot satisfy a range = droppable
              // (and cannot satisfy IS NOT NULL — the value nullness
              // check rides on the same rule)
              val legacyKeep = coalesce(
                tsWin.flatMap(k => setsKeep(col("min_ts"), col("max_ts"), k))
                  .getOrElse(lit(true)) &&
                valWin.flatMap(k => setsKeep(col("min_val"), col("max_val"), k))
                  .getOrElse(lit(true)), lit(false)) &&
                valWin.filter(_.notNull)
                  .map(_ => col("min_val").isNotNull).getOrElse(lit(true))
              // generic columns: UNKNOWN rows (nn_<c> NULL) always
              // keep; string rows with WITHHELD bounds (nn > 0, NULL
              // min — values past StringBoundsCap) keep under RANGES
              // but their nn/n_rows null statistics stay valid, so the
              // nullness checks still apply to them
              val genKeep = genWins.toSeq.sortBy(_._1).map { case (c, k) =>
                val nn = col(graft.ingest.FileBounds.nnCol(c))
                val mn = col(graft.ingest.FileBounds.minCol(c))
                val withheld =
                  if (fbAll.get.schema(graft.ingest.FileBounds.minCol(c)).dataType ==
                      org.apache.spark.sql.types.StringType)
                    nn > 0 && mn.isNull
                  else lit(false)
                val range = setsKeep(mn,
                  col(graft.ingest.FileBounds.maxCol(c)), k) match {
                  case None => lit(true)
                  case Some(x) => withheld || coalesce(x, lit(false))
                }
                val nonNull = if (k.notNull) nn > 0 else lit(true)
                val someNull = if (k.isNull) nn < col("n_rows") else lit(true)
                // Bloom membership (round 19): a file whose filter
                // rejects EVERY value the predicate pins the column to
                // provably holds none of them — the point-lookup drop
                // range windows cannot make on hash-shaped columns
                // (and, unlike ranges, valid even for WITHHELD string
                // bounds). Probe hashes are xxhash64 over the same-typed
                // literals — bit-identical to what the writer fed the
                // filter. NULL filter (pre-bloom batch, un-threaded
                // heal) keeps the file; fail-open like every gap.
                val bfName = graft.ingest.FileBounds.bfCol(c)
                // Hash-type pin: xxhash64 is width-sensitive (hashing
                // the same value as INT and as BIGINT gives different
                // bits), and the filter was built over xxhash64(col) at
                // the WRITE-time type. Round 21 (r20 ADVICE): the pin
                // is PER ROW when the store records the write-time type
                // (FileBounds.bfTypeCol) — a merged-schema pin passes
                // under contract widening while older rows' filters
                // were hashed at the narrow type, so every probe of
                // those rows would miss and files that DO contain
                // matches would be silently dropped. A row whose
                // bft_<c> differs from (or predates — NULL) the query
                // type keeps its file; rows written at the query's type
                // still probe, so a widened lake keeps its point-lookup
                // pruning on post-widening files. Stores without the
                // type column fall back to the round-20 merged-schema
                // pin (their batch dirs cannot mix widths — a mixed
                // mergeSchema read fails before reaching here).
                val btName = graft.ingest.FileBounds.bfTypeCol(c)
                val hasBt = fbAll.get.columns.contains(btName)
                val writtenDt =
                  fbAll.get.schema(graft.ingest.FileBounds.minCol(c)).dataType
                val bloom =
                  if (k.eqs.isEmpty || !fbAll.get.columns.contains(bfName) ||
                      (!hasBt && writtenDt != k.dt)) lit(true)
                  else {
                    graft.functions.BloomExpressions.register(s)
                    val hashes = array(k.eqs.map(v => xxhash64(litOf(v, k.dt))): _*)
                    val typeOk =
                      if (hasBt) col(btName) === lit(k.dt.simpleString)
                      else lit(true)
                    col(bfName).isNull || !coalesce(typeOk, lit(false)) || coalesce(
                      call_function("graft_bloom_contains_any", col(bfName), hashes),
                      lit(true))
                  }
                nn.isNull || (range && nonNull && someNull && bloom)
              }.reduceOption(_ && _).getOrElse(lit(true))
              fbAll.get
                .join(zdf, Seq("year", "month", "day", "mode"))
                .filter(!(legacyKeep && genKeep))
                .select("year", "month", "day", "mode", "data_file")
                .limit(MaxDropFiles)
                .collect()
                .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3)),
                  r.getString(4)))
                .toSet
            }
          val result = Folded(rows, nTotal, drop, anti)
          cache.put(key, result)
          result
        } finally persisted.unpersist(): Unit
      case hit => hit
    }
    // decline only when NEITHER membership form fits the cap
    if (folded.zones.size > cap &&
        (folded.anti.isEmpty || folded.anti.size > cap)) None
    else Some(folded)
  }
}
