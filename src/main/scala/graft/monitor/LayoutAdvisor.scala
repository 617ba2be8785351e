package graft.monitor

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The layout advisor (round 20, r19 verdict #1): close the loop from
  * OBSERVED WORKLOAD to RECOMMENDED PHYSICAL LAYOUT. The reference's
  * whole consumption premise is that the lake's partitioning serves
  * query cost ("uses partitions for cost/performance", diagram3:133)
  * — which assumes someone CHOSE the layout well; this makes the
  * engine that someone.
  *
  * The engine has five manual layout levers — `sortCol`, `clusterCols`,
  * `bloomCols`, zone-map coverage, compaction thresholds
  * ([[graft.ingest.Compactor.TickConfig]]) — and, until this object,
  * nothing that recommends them: an operator of a 100 TB lake does not
  * know a-priori that `transaction_id` deserves a Bloom filter and
  * `(user_id, event_time)` deserve the z-curve. The evidence was
  * already captured on both sides; this folds it:
  *
  *  - WORKLOAD: the predicate history ([[PredicateStats]]) — which
  *    columns queries pin with equality/IN (membership shape) vs
  *    range/prefix (window shape), and how often.
  *  - PHYSICS: the bounds sidecar ([[graft.ingest.FileBounds]]) —
  *    per-file min/max windows, from which the per-column WINDOW WIDTH
  *    RATIO (mean per-file width / global width, measured on
  *    [[graft.ingest.ZCluster.numExpr]]'s monotone image so strings
  *    and timestamps rank exactly like the pruning compares them)
  *    says whether range-style pruning can even in principle help:
  *    a hash-shaped key spans ~the whole space in EVERY file
  *    (ratio → 1), so only membership statistics can drop its files.
  *
  * Verdict per column — the same closed-form, report-shaped discipline
  * as the monitoring queries (q93), never a planner hook:
  *
  *  - `bloom`: membership-probed at least [[MinEqProbes]] times AND
  *    windows wide ([[WideWindow]] ≤ ratio, or ratio unknown — a lake
  *    with no sidecar coverage has no range pruning to lose). The
  *    cheap lever: a Bloom sidecar column prunes point/IN lookups
  *    without relocating a single row.
  *  - `cluster`: window-probed at least [[MinRangeProbes]] times (and
  *    not a bloom pick — on a membership-probed hash-shaped key,
  *    re-laying the lake out by an uncorrelated key would disturb
  *    every other window for marginal gain). The expensive lever:
  *    compaction-time z-clustering tightens this column's windows so
  *    the EXISTING zone maps start dropping files.
  *  - `none`: no evidence, or nullness-only probes (zone nullness
  *    statistics already serve those).
  *
  * Consumption: feed `bloom` verdicts to `TickConfig.bloomCols` /
  * `BatchProcessor(bloomCols = ...)` and `cluster` verdicts to
  * `TickConfig.clusterCols`/`sortCol` at the next maintenance window.
  * The q130 oracle pins the verdict table for an engineered history;
  * LayoutAdvisorSpec drives the recommended layout through the actual
  * skip machinery and shows it beats the default.
  */
object LayoutAdvisor {
  /** Membership probes needed before a Bloom sidecar column pays for
    * its kilobytes-per-file. */
  val MinEqProbes = 4L

  /** Window probes needed before a re-layout (clustering) is worth a
    * compaction pass. */
  val MinRangeProbes = 2L

  /** Mean-width ratio at which windows are called structurally useless
    * for point lookups (every probe lands inside ~every file). */
  val WideWindow = 0.5

  private val outSchema = StructType(Seq(
    StructField("col_name", StringType, nullable = false),
    StructField("eq_q", LongType, nullable = false),
    StructField("range_q", LongType, nullable = false),
    StructField("width_e2", IntegerType, nullable = true),
    StructField("verdict", StringType, nullable = false)))

  /** One recommendation row per advisable column of the lake at
    * `lakeRoot` (every bounds-tracked column plus the legacy
    * event-time/value pair): `(col_name, eq_q, range_q, width_e2,
    * verdict)`. `width_e2` is the window-width ratio in percent (NULL
    * when the sidecar has no evidence for the column). Driver cost:
    * one metadata-sized aggregate over the bounds store plus the
    * predstats history fold — never a data-file read. */
  def recommend(spark: SparkSession, lakeRoot: String): DataFrame = {
    import graft.ingest.FileBounds

    // ---- workload side: (column -> eq probes, range+prefix probes)
    val hist = PredicateStats.history(spark, lakeRoot)
      .collect().map { r =>
        (r.getString(0), r.getString(1), r.getLong(2))
      }
    val eqQ = hist.collect { case (c, "eq", n) => c -> n }
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).sum }
    val rangeQ = hist.collect { case (c, op, n) if op == "range" || op == "prefix" => c -> n }
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).sum }

    // ---- physics side: per-column mean window width / global width
    val fbDir = s"$lakeRoot/filebounds"
    val fbExists = {
      val p = new Path(fbDir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }
    val fbOpt = if (fbExists) Some(FileBounds.all(spark, fbDir)) else None
    // (column, min col, max col) — the generic triplets plus the legacy pair
    val tracked: Seq[(String, String, String)] = fbOpt.map { fb =>
      val generic = fb.schema.fieldNames.toSeq.collect {
        case n if n.startsWith("min_") && n != "min_ts" && n != "min_val" &&
          fb.schema.fieldNames.contains(s"max_${n.stripPrefix("min_")}") =>
          val c = n.stripPrefix("min_")
          (c, n, s"max_$c")
      }
      Seq((FileBounds.TsCol, "min_ts", "max_ts"),
        (FileBounds.ValCol, "min_val", "max_val")) ++ generic.sorted
    }.getOrElse(Seq.empty)
    val widths: Map[String, Option[Double]] =
      if (tracked.isEmpty) Map.empty
      else {
        val fb = fbOpt.get
        val aggs = tracked.flatMap { case (c, mn, mx) =>
          val dt = fb.schema(mn).dataType
          def img(col: String): Column = graft.ingest.ZCluster.numExpr(dt, col)
          // order-statistics de-bias: k uniform samples over a span S
          // observe an expected max-min of S·(k-1)/(k+1), so a small
          // file's narrow window is NOT evidence the column clusters —
          // scale each file's width by (k+1)/(k-1) (k = the file's
          // non-null count; legacy pair rides n_rows) before averaging,
          // or fixture-scale lakes with handfuls of rows per file would
          // read hash-shaped columns as "narrow" and verdicts would
          // drift with the scale factor
          val cnt = (if (c == FileBounds.TsCol || c == FileBounds.ValCol)
            col("n_rows")
          else coalesce(col(FileBounds.nnCol(c)), col("n_rows"))).cast("double")
          val w = when(col(mn).isNotNull && col(mx).isNotNull && cnt >= 2.0,
            (img(mx) - img(mn)) * (cnt + 1.0) / (cnt - 1.0))
          Seq(avg(w).as(s"w_$c"),
            max(when(col(mx).isNotNull, img(mx))).as(s"hi_$c"),
            min(when(col(mn).isNotNull, img(mn))).as(s"lo_$c"))
        }
        val row = fb.agg(aggs.head, aggs.tail: _*).collect().head
        tracked.map { case (c, _, _) =>
          val (w, hi, lo) = (row.getAs[Any](s"w_$c"), row.getAs[Any](s"hi_$c"),
            row.getAs[Any](s"lo_$c"))
          val ratio = (w, hi, lo) match {
            case (wv: java.lang.Double, hv: java.lang.Double, lv: java.lang.Double) =>
              val span = hv - lv
              Some(if (span <= 0.0) 0.0 else math.min(1.0, wv / span))
            case _ => None // no known-bounds file at all for this column
          }
          c -> ratio
        }.toMap
      }

    // ---- fold: one row per advisable column
    val cols = (tracked.map(_._1) ++ eqQ.keys ++ rangeQ.keys).distinct
      .filter(c => tracked.exists(_._1 == c)) // only columns the sidecar can act on
      .sorted
    val rows = cols.map { c =>
      val eq = eqQ.getOrElse(c, 0L)
      val rg = rangeQ.getOrElse(c, 0L)
      val width = widths.getOrElse(c, None)
      // unknown width = nothing for range pruning to lose — the bloom
      // lever is still live (scaladoc)
      val wide = width.forall(_ >= WideWindow)
      val verdict =
        if (eq >= MinEqProbes && wide) "bloom"
        else if (rg >= MinRangeProbes) "cluster"
        else "none"
      Row(c, eq, rg, width.map(w => (w * 100).round.toInt).orNull, verdict)
    }
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), outSchema)
  }

  /** The operational end of the loop: fold [[recommend]]'s verdicts
    * into a ready-to-run maintenance config. `bloom` verdicts become
    * `bloomCols` (sorted — the ingest runners and the compaction
    * rewrite then publish sidecar + native filters for exactly the
    * membership-probed columns); `cluster` verdicts become
    * `clusterCols`, ranked by window-probe count and capped at
    * [[graft.ingest.ZCluster.MaxCols]] (each z-curve column costs
    * discriminating bits, so the most-probed columns get them); and
    * when the event-time column itself is a cluster pick it also takes
    * `sortCol` (the within-file row-group order lever — the layout
    * every time-windowed consumer reads). Everything else — file-size
    * targets, grace cycles, parallelism — stays the caller's.
    *
    * Deliberately NOT self-applying: the caller reviews and passes the
    * result to the next maintenance tick (`BatchProcessor(
    * lakeCompaction = Some(advised))`) — a layout rewrite is an
    * expensive, operator-visible act, and the advisor's job is to make
    * the decision obvious, not to take it silently. */
  def advisedTickConfig(spark: SparkSession, lakeRoot: String,
                        base: graft.ingest.Compactor.TickConfig =
                          graft.ingest.Compactor.TickConfig())
      : graft.ingest.Compactor.TickConfig = {
    val rec = recommend(spark, lakeRoot).collect()
    val blooms = rec.filter(_.getString(4) == "bloom")
      .map(_.getString(0)).sorted.toSeq
    val clusters = rec.filter(_.getString(4) == "cluster")
      .sortBy(r => (-r.getLong(2), r.getString(0)))
      .map(_.getString(0)).take(graft.ingest.ZCluster.MaxCols).toSeq
    base.copy(
      bloomCols = blooms,
      clusterCols = clusters,
      sortCol =
        if (clusters.contains(graft.ingest.FileBounds.TsCol))
          Some(graft.ingest.FileBounds.TsCol)
        else base.sortCol)
  }
}
