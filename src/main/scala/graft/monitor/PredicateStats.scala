package graft.monitor

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** One observed scan predicate over a curated lake — the WORKLOAD
  * EVIDENCE half of the layout advisor (SURVEY.md §2 M1 + the
  * reference's "uses partitions for cost/performance" consumption
  * premise, diagram3:133): which column, which operator class, how
  * many literals. Captured from executed plans (never from row data),
  * so the stream is metadata-sized by construction. */
final case class PredicateEvent(
    lake: String, // curated-lake root the scan read
    column: String, // data/partition column the conjunct constrains
    opClass: String, // "eq" | "range" | "prefix" | "isnull" | "notnull"
    nLiterals: Int, // 1 for comparisons, |list| for IN/INSET
    ts_ms: Long)

/** Predicate-history capture + durable store.
  *
  * CAPTURE ([[extract]]): walk an executed query's OPTIMIZED plan for
  * Filter nodes above curated-lake scans and classify each conjunct
  * that pins a single column against literals. The optimized plan is
  * the right altitude: casts are coerced, conjunctions are flattened,
  * and what remains above the relation is exactly what pushdown and
  * the skip rules saw.
  *
  * STORE ([[publish]]/[[history]]/[[compact]]): the rollup-partial
  * protocol, applied to workload stats — one small parquet dir per
  * published batch under `<lake root>/predstats/`, rows
  * `(col_name, op_class, n_queries, n_literals)`, SUM-foldable by
  * construction so [[history]] is a plain aggregate over batch dirs
  * and [[compact]] can fold accumulated dirs in the maintenance slot
  * without changing any answer. Publishing by TOKEN with overwrite
  * makes replays converge (the DLQ/staging idempotence discipline).
  * This is what makes the advisor's input survive restarts (r19
  * verdict #6): the in-memory ring ([[GraftMonitor]]) is bounded and
  * process-local; the store is the durable, bounded-growth history.
  */
object PredicateStats {
  /** Store directory name under the lake root (sibling of `rollup/`
    * and `filebounds/`). */
  val StoreDir = "predstats"

  def storeDir(lakeRoot: String): String = s"$lakeRoot/$StoreDir"

  // ---- capture --------------------------------------------------------

  /** The lake root of a curated-lake scan, or None. Same name pin as
    * the serve rules (a directory literally named `curated`), but no
    * store probes — capture must stay cheap enough for a listener
    * thread. Subtree/subset basePath reads are fine HERE (unlike
    * metadata serving): a predicate observed over part of the lake is
    * still workload evidence for the lake. */
  private def lakeRootOf(rel: LogicalRelation): Option[String] =
    rel.relation match {
      case fs: HadoopFsRelation =>
        val root = fs.options.get("basePath").map(new Path(_))
          .orElse(fs.location.rootPaths match {
            case Seq(single) => Some(single)
            case _ => None
          })
        root.filter(_.getName == "curated")
          .flatMap(r => Option(r.getParent)).map(_.toString)
      case _ => None
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Unwrap the coercion casts analysis inserts around attributes. */
  private def attrOf(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case Cast(inner, _, _, _) => attrOf(inner)
    case _ => None
  }

  private def isLit(e: Expression): Boolean = e match {
    case _: Literal => true
    case Cast(inner, _, _, _) => isLit(inner)
    case _ => false
  }

  /** Classify one conjunct; None for shapes the advisor has no lever
    * for (multi-column comparisons, UDFs, disjunctions, ...). */
  private[monitor] def classify(e: Expression): Option[(String, String, Int)] =
    e match {
      case EqualTo(l, r) if attrOf(l).isDefined && isLit(r) =>
        attrOf(l).map(c => (c, "eq", 1))
      case EqualTo(l, r) if attrOf(r).isDefined && isLit(l) =>
        attrOf(r).map(c => (c, "eq", 1))
      case EqualNullSafe(l, r) if attrOf(l).isDefined && isLit(r) =>
        attrOf(l).map(c => (c, "eq", 1))
      case In(v, list) if attrOf(v).isDefined && list.forall(isLit) =>
        attrOf(v).map(c => (c, "eq", list.size))
      case InSet(v, set) if attrOf(v).isDefined =>
        attrOf(v).map(c => (c, "eq", set.size))
      case GreaterThan(l, r) if attrOf(l).isDefined && isLit(r) =>
        attrOf(l).map(c => (c, "range", 1))
      case GreaterThan(l, r) if attrOf(r).isDefined && isLit(l) =>
        attrOf(r).map(c => (c, "range", 1))
      case GreaterThanOrEqual(l, r) if attrOf(l).isDefined && isLit(r) =>
        attrOf(l).map(c => (c, "range", 1))
      case GreaterThanOrEqual(l, r) if attrOf(r).isDefined && isLit(l) =>
        attrOf(r).map(c => (c, "range", 1))
      case LessThan(l, r) if attrOf(l).isDefined && isLit(r) =>
        attrOf(l).map(c => (c, "range", 1))
      case LessThan(l, r) if attrOf(r).isDefined && isLit(l) =>
        attrOf(r).map(c => (c, "range", 1))
      case LessThanOrEqual(l, r) if attrOf(l).isDefined && isLit(r) =>
        attrOf(l).map(c => (c, "range", 1))
      case LessThanOrEqual(l, r) if attrOf(r).isDefined && isLit(l) =>
        attrOf(r).map(c => (c, "range", 1))
      case StartsWith(l, r) if attrOf(l).isDefined && isLit(r) =>
        attrOf(l).map(c => (c, "prefix", 1))
      case IsNull(v) => attrOf(v).map(c => (c, "isnull", 0))
      case IsNotNull(v) => attrOf(v).map(c => (c, "notnull", 0))
      case _ => None
    }

  /** Every classified (lake, column, op) conjunct in the executed
    * query's optimized plan. One plan walk, no jobs, no row access —
    * safe on the listener-bus thread. */
  def extract(qe: QueryExecution): Seq[PredicateEvent] = {
    val now = System.currentTimeMillis()
    qe.optimizedPlan.collect {
      case f: logical.Filter =>
        val lakes = f.child.collect {
          case l: LogicalRelation => lakeRootOf(l)
        }.flatten.distinct
        if (lakes.isEmpty) Seq.empty
        else for {
          conjunct <- splitConjuncts(f.condition)
          (c, op, n) <- classify(conjunct).toSeq
          lake <- lakes
        } yield PredicateEvent(lake, c, op, n, now)
    }.flatten
  }

  // ---- durable store --------------------------------------------------

  /** The subset of `events` belonging to `lakeRoot` — matched against
    * both the raw and the filesystem-qualified spelling of the root
    * (capture records whatever spelling the scan's plan carried).
    * Shared by [[publish]] and the monitor's ring-drain bookkeeping:
    * the drain must remove exactly what was published, or a monitor
    * observing two lakes silently discards the second lake's
    * unpublished evidence on every publish of the first (r20 ADVICE). */
  def forLake(spark: SparkSession, lakeRoot: String,
              events: Seq[PredicateEvent]): Seq[PredicateEvent] = {
    val qual = {
      val p = new Path(lakeRoot)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.makeQualified(p).toString
    }
    events.filter(e => e.lake == lakeRoot || e.lake == qual)
  }

  /** Fold `events` for ONE lake into a token-keyed batch dir
    * (`<lakeRoot>/predstats/<token>`, overwrite). Returns false when
    * `events` holds nothing for this lake. Replaying a FAILED publish
    * with its token converges (the overwrite); a token must be FRESH
    * after a successful publish — the monitor drains published events
    * from its ring, so reusing the token would overwrite the earlier
    * batch with only newer events and silently lose its counts
    * (r20 ADVICE — the IngestDemo marker discipline applies to the
    * caller's token choice, not here). */
  def publish(spark: SparkSession, lakeRoot: String,
              events: Seq[PredicateEvent], token: String): Boolean = {
    val mine = forLake(spark, lakeRoot, events)
    if (mine.isEmpty) return false
    import spark.implicits._
    val rows = mine.groupBy(e => (e.column, e.opClass))
      .map { case ((c, op), es) =>
        (c, op, es.size.toLong, es.map(_.nLiterals.toLong).sum) }
      .toSeq.sortBy(t => (t._1, t._2))
    rows.toDF("col_name", "op_class", "n_queries", "n_literals")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${storeDir(lakeRoot)}/$token")
    true
  }

  /** The lake's full workload history: SUM over every published batch.
    * Empty frame (correct schema) when the store doesn't exist. */
  def history(spark: SparkSession, lakeRoot: String): DataFrame = {
    val dir = new Path(storeDir(lakeRoot))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) {
      import spark.implicits._
      return Seq.empty[(String, String, Long, Long)]
        .toDF("col_name", "op_class", "n_queries", "n_literals")
    }
    spark.read
      .option("recursiveFileLookup", "true")
      .option("ignoreMissingFiles", "true") // racing [[compact]] deletes
      .parquet(dir.toString)
      .groupBy("col_name", "op_class")
      .agg(sum("n_queries").as("n_queries"), sum("n_literals").as("n_literals"))
  }

  /** Fold accumulated batch dirs into one (the FileBounds.compact
    * shape: write merged → atomic rename → delete sources). Sums fold,
    * so the answer never changes; growth stays bounded by the compact
    * threshold regardless of how many publishes a long-lived monitor
    * makes. A publish racing the fold lands in a NEW dir the fold
    * never listed — absorbed next pass. */
  def compact(spark: SparkSession, lakeRoot: String,
              maxBatchDirs: Int = 16): Boolean = {
    val root = new Path(storeDir(lakeRoot))
    val fs: FileSystem = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return false
    val dirs = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && !st.getPath.getName.startsWith(".") &&
        !st.getPath.getName.startsWith("_"))
      .map(_.getPath)
    if (dirs.size <= maxBatchDirs) return false
    val token = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new Path(root, s".compact-$token")
    fs.delete(tmp, true)
    spark.read.option("recursiveFileLookup", "true")
      .parquet(dirs.map(_.toString): _*)
      .groupBy("col_name", "op_class")
      .agg(sum("n_queries").as("n_queries"), sum("n_literals").as("n_literals"))
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val live = new Path(root, s"merged-$token")
    if (!fs.rename(tmp, live))
      throw new java.io.IOException(s"predstats compaction rename failed: $tmp -> $live")
    dirs.foreach(d => fs.delete(d, true): Unit)
    true
  }
}
