package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Interleaved multi-column clustering (Z-order) for compaction
  * rewrites — the layout that makes the zone maps compaction now
  * PRESERVES (FileBounds.writeSwapBatch) actually TIGHT on more than
  * one column.
  *
  * Why: the single-`sortCol` rewrite tiles output files along event
  * time, so time windows prune files and row groups — but every output
  * file still spans the FULL range of every other column (user_id,
  * value, …), so a generic-column window keeps all of them; the bounds
  * are present yet useless. The reference's consumption layer names
  * exactly this mix — time/partition slices AND id-shaped lookups over
  * the same curated lake (diagram_1.txt:100-107, psuedo_code.txt:
  * 352-365) — and at 100 TB the compacted bulk is where most scanned
  * bytes live. Interleaving the sort key's bits across k columns makes
  * each output file cover ~1/2^(ceil(log2 nOut)/k) of EACH column's
  * value space: every clustered column's file-grain windows narrow, at
  * the cost of none of them being perfectly sorted (the classic
  * Z-order trade, same as Delta OPTIMIZE ZORDER BY / Iceberg
  * sort-order z-curves).
  *
  * Mechanics, per rewritten leaf (all bounded by ONE leaf, data the
  * compactor is already rewriting):
  *
  *   1. per cluster column, [[Buckets]]-quantile boundaries via
  *      `approxQuantile` (one stat action; boundaries are
  *      metadata-sized). Quantile ranks — not min/max linear scaling —
  *      so skew cannot collapse the curve: each rank bucket holds
  *      ~1/16 of the leaf's ROWS regardless of value distribution;
  *   2. per row, rank in [0, 16) per column = count of boundaries ≤
  *      value (a codegen higher-order `filter` over a 15-element
  *      literal array; NULL ranks 0, so nulls cluster together at the
  *      curve's origin instead of scattering);
  *   3. z = bit-interleave of the ranks (4 bits × ≤[[MaxCols]]
  *      columns, column i's bit j at position j·k+i — pure
  *      shiftleft/bitwiseOR column algebra, whole-stage codegen);
  *   4. `repartitionByRange` on z (output files tile the curve) +
  *      `sortWithinPartitions(z, tieBreak)` (row groups tile it too,
  *      so parquet min/max row-group stats stay tight for pushed
  *      predicates on every clustered column).
  *
  * The z column is internal and dropped before the write; row CONTENT
  * is untouched, so the rollup-reconcile identity the compaction demo
  * pins holds unchanged. Strings cluster through an 8-byte
  * binary-prefix image (round 19 — see [[supported]]); columns of
  * genuinely unsupported type (arrays, structs, binary) are skipped;
  * one usable column degrades to the plain range-sort layout, zero to
  * the caller's fallback. Callers opt in per lake via
  * `Compactor.TickConfig.clusterCols` — the default remains
  * time-sorted tiling, which is optimal when consumption is
  * time-window-only.
  */
object ZCluster {
  /** Rank buckets per column (4 bits). 16 is deliberate, not tunable:
    * more buckets only help when nOut exceeds 2^(4k) files per leaf,
    * which a per-leaf compactor never produces. */
  val Buckets = 16
  private val BitsPerCol = 4

  /** Interleave at most this many columns (16 z bits). Beyond 4 the
    * per-column selectivity gain (1/2 per doubling of files) is noise;
    * extra requested columns are ignored in caller order. */
  val MaxCols = 4

  /** Cluster-keyable: totally ordered with a monotone numeric image
    * for the quantile ranks. Strings qualify through their 8-byte
    * binary prefix (round 19 — [[numExpr]]); before that they were
    * excluded and an app_version/transaction_id window got nothing
    * from clustering while the bounds sidecar was already tracking
    * (capped) string min/max per file. */
  def supported(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case TimestampType | TimestampNTZType | DateType => true
    case StringType => true
    case _ => false
  }

  /** Monotone numeric image of a supported column (ordering is all the
    * rank buckets need; exact values never matter). Strings map to the
    * first 8 bytes as an unsigned big-endian integer — `rpad` on the
    * BINARY cast left-aligns (pads short values with 0x00, truncates
    * long ones), so the image is monotone under BINARY order, which is
    * both Spark's string comparison order (UTF8String compares
    * byte-wise) and the order FileBounds' string zone windows are
    * tightened in — the rank buckets and the pruning agree by
    * construction. Values equal in their first 8 bytes collapse into
    * one rank bucket, which only coarsens the curve (a shared
    * `t-`-style prefix costs 2 of 8 discriminating bytes and still
    * leaves 6 — plenty for 16 buckets). */
  // private[graft]: the layout advisor reuses the same monotone image
  // to measure per-file window width in a type-generic way — advisor
  // width buckets and cluster rank buckets agreeing on the ordering is
  // what makes "cluster this column" a self-consistent recommendation
  private[graft] def numExpr(dt: DataType, c: String): Column = dt match {
    case TimestampType => unix_micros(col(c)).cast("double")
    // session-tz reinterpretation is monotone, which is sufficient
    case TimestampNTZType => unix_micros(col(c).cast(TimestampType)).cast("double")
    case DateType => unix_date(col(c)).cast("double")
    case StringType =>
      expr(s"conv(hex(rpad(cast(`$c` AS BINARY), 8, x'00')), 16, 10)")
        .cast("double")
    case _ => col(c).cast("double")
  }

  /** The z-value column for `cols` over `df` (callers pass only
    * [[supported]] columns). One driver-side approxQuantile action on
    * `df`; the returned Column is pure codegen algebra. */
  private def zValue(df: DataFrame, cols: Seq[String]): Column = {
    val k = cols.size
    val nums = cols.map(c => numExpr(df.schema(c).dataType, c))
    val names = cols.indices.map(i => s"__zq_$i")
    val probs = (1 until Buckets).map(_.toDouble / Buckets).toArray
    val bounds = df.select(nums.zip(names).map { case (e, n) => e.as(n) }: _*)
      .stat.approxQuantile(names.toArray, probs, 0.001)
    val ranks = nums.zip(bounds).map { case (v, bs) =>
      // an all-null column has no quantiles: constant rank 0 (it stops
      // influencing the curve, the remaining columns still cluster)
      if (bs.isEmpty) lit(0L)
      else {
        val arr = array(bs.toSeq.map(lit): _*)
        // count of boundaries ≤ value; NULL value matches none → rank 0
        size(filter(arr, b => v >= b)).cast("long")
      }
    }
    (0 until BitsPerCol).flatMap { j =>
      ranks.zipWithIndex.map { case (r, i) =>
        shiftleft(shiftrightunsigned(r, j).bitwiseAND(lit(1L)), j * k + i)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** Layout selection for a compaction rewrite, in ONE place so the
    * usable-column rules cannot drift between callers: z-curve over
    * `clusterCols` when ≥2 are present and [[supported]] (z-tiled
    * partitions, z-then-`sortCol` local sort — one output file each
    * under the compactor's write); a single usable cluster column
    * degrades to plain range-sort on it; none falls back to range-sort
    * on `sortCol`; neither present hash-scatters into `nOut`. */
  def layoutFor(df: DataFrame, clusterCols: Seq[String],
                sortCol: Option[String], nOut: Int): DataFrame = {
    val n = math.max(1, nOut)
    val usable = clusterCols.filter(c => df.columns.contains(c) &&
      supported(df.schema(c).dataType)).take(MaxCols)
    val sort = sortCol.filter(df.columns.contains)
    if (usable.size >= 2) {
      val zc = "__graft_zv"
      val tie = sort.filterNot(usable.contains)
      df.withColumn(zc, zValue(df, usable))
        .repartitionByRange(n, col(zc))
        .sortWithinPartitions((col(zc) +: tie.map(col).toSeq): _*)
        .drop(zc)
    } else (usable.headOption orElse sort) match {
      case Some(c) =>
        val tie = sort.filter(_ != c).toSeq
        df.repartitionByRange(n, col(c))
          .sortWithinPartitions((col(c) +: tie.map(col)): _*)
      case None => df.repartition(n)
    }
  }
}
