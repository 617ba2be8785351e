package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.Tables

/** Near-duplicate detection over `documents` (SURVEY.md §2.10 X2; north-star
  * LLM-pipeline dedup surface).
  *
  * Three independent algorithms, all shuffle-bounded (no cartesian product
  * anywhere — the scale path at 100 TB is banded equi-joins):
  *
  *  - MinHash + LSH (q32): token 3-shingles → 64 minhash signatures →
  *    16 bands × 4 rows → band-hash equi-self-join for candidates →
  *    exact Jaccard verification ≥ 0.8. With b=16, r=4 the probability of
  *    missing a pair at J=0.8 is (1-0.8^4)^16 ≈ 3e-4, and every emitted
  *    pair is exact-verified, so output ≈ the exact ≥0.8 pair set.
  *  - SimHash (q34): 64-bit per-token-hash bit votes → block-triple
  *    multi-index (6 blocks, all 20 triples; pigeonhole: hamming ≤ 3 ⇒
  *    some triple intact — Manku et al., WWW'07) → verified by
  *    bit_count(xor) ≤ 3.
  *  - Exact n-gram Jaccard probe search (q33): a small probe set against
  *    the full corpus — broadcast join, SQL-oracle-checkable.
  */
object DedupOps {
  type Q = (SparkSession, String) => DataFrame
  private def docs(s: SparkSession, d: String) = Tables.load(s, d, "documents")

  private val NumHashes = 64
  private val Bands = 16
  private val RowsPerBand = NumHashes / Bands

  /** q76 sliding-window width in tokens. Lee et al. use 50 BPE tokens;
    * the synthetic corpus averages ~55 whitespace tokens per doc
    * (TESTDATA.md), so 20 keeps the operator exercised on real shared
    * spans at every SF while preserving the construction exactly.
    * Aliases the [[graft.functions.SpanHashes.DefaultWindow]] constant
    * the SQL surface defaults to, so operator and SQL cannot diverge. */
  private[queries] val SpanWindow = graft.functions.SpanHashes.DefaultWindow

  /** Max verified near-dup edges collected for driver-side union-find in
    * q65. Edges are packed `(a<<32)|b` into ONE long column and collected
    * as a primitive `Array[Long]` — true 8 bytes/edge, so the cap is
    * 32 MB on the driver (collecting two-column `Row`s instead would box
    * every edge at ~80+ bytes). Above the cap the distributed min-label
    * propagation path runs instead. */
  private val DriverEdgeCap = 4L * 1000 * 1000

  /** Candidate-id cap for [[minhashEdges]]' map-side broadcast
    * semi-filter: 10M longs ≈ 80 MB hashed — comfortably inside the
    * broadcast budget, far above any sub-quadratic candidate frame the
    * ScaleStress ladder produces (x100: ~10^5 ids), and a hard stop
    * before a skew-blown band hash turns the hint into a driver OOM.
    * Above it the semi join falls back to shuffle (degraded, correct). */
  private val MaxBroadcastCandIds = 10L * 1000 * 1000

  /** doc_id + distinct token-3-shingle set (the unit of Jaccard).
    * One codegen byte walk per doc ([[graft.functions.Shingle3]]) —
    * the portable `split`+`transform`+`array_distinct` form runs
    * through interpreted higher-order functions and was the dominant
    * cost of every text-dedup query (ShingleSpec asserts exact
    * element-for-element parity with it). An EMPTY shingle array marks
    * a <3-token doc, matching the old `size(toks) >= 3` filter. */
  private[queries] def shingled(df: DataFrame): DataFrame = {
    graft.functions.Shingle3.register(df.sparkSession)
    df.select(col("doc_id"), expr("shingle3(text)").as("sh"))
      .filter(size(col("sh")) >= 1)
  }

  /** Exact Jaccard between two distinct-shingle arrays, as (inter, uni).
    * The arrays are already distinct, so |A∪B| = |A|+|B|−|A∩B| — one
    * hash-set intersection per pair instead of intersect + union. */
  private[queries] def interUni(a: Column, b: Column): (Column, Column) = {
    val inter = size(array_intersect(a, b)).cast("long")
    (inter, size(a).cast("long") + size(b).cast("long") - inter)
  }

  /** Connected-component labels (doc_id, rep = component MINIMUM id)
    * over a persisted single-column frame of packed `(a<<32)|b` edges.
    * Two paths, picked by the EDGE count — never the corpus size.
    * Verified near-dup edges are orders of magnitude fewer than documents
    * (a dedup pipeline expects a few % dup rate), so even at 100 TB the
    * pair graph usually fits on the driver: 8 bytes/edge (primitive
    * collect of the packed column) means [[DriverEdgeCap]] is 32 MB
    * collected. Under the cap, a driver union-find replaces ~2×diameter
    * compiled join/aggregate stages — the component step becomes one
    * collect + one broadcast join-back. Over the cap, distributed
    * min-label propagation (rep ← min(rep, neighbors' reps) until
    * fixpoint — the GraphX-CC construction as DataFrame passes) whose
    * per-round shuffle is proportional to the duplicate subgraph.
    * `edgeList`'s tracker share is released (via
    * [[QueryCaches.earlyRelease]] — refcount-safe under a concurrent
    * tracker of the same plan) once labels are materialized. Both paths
    * produce identical labels (asserted in DedupSpec, which forces the
    * distributed path with `driverCap = 0`). */
  /** Union-find over packed `(a<<32)|b` edges — union by smaller root,
    * so the surviving root is the component's MINIMUM id, matching
    * min-label propagation and the recursive-CTE oracle exactly.
    * Returns the parent map; callers resolve with [[ufFind]]. */
  private def unionFind(packed: Array[Long])
      : scala.collection.mutable.LongMap[Long] = {
    val parent = scala.collection.mutable.LongMap.empty[Long]
    packed.foreach { pk =>
      val a = pk >>> 32; val b = pk & 0xFFFFFFFFL
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val ra = ufFind(parent, a); val rb = ufFind(parent, b)
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    parent
  }

  private def ufFind(parent: scala.collection.mutable.LongMap[Long],
                     x: Long): Long = {
    var r = x
    while (parent(r) != r) r = parent(r)
    var c = x
    while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
    r
  }

  def componentLabels(s: SparkSession, edgeList: DataFrame,
                      driverCap: Long = DriverEdgeCap): DataFrame = {
    // ONE guarded take (round 22): the old shape paid a count() job for
    // the cap decision and then a collect() job for the same bytes.
    // take(cap+1) IS both — under the cap the returned rows are exactly
    // the collect, over it the overflow row flips to the distributed
    // path. (The bench sessions set spark.sql.limit.initialNumPartitions
    // to the core count, so the take drains a metadata-sized frame in
    // one wave instead of the 1→4→16 escalation ladder.)
    import s.implicits._
    // clamp before toInt: a caller disabling the cap (Long.MaxValue)
    // must not overflow take's Int argument
    val takeN = driverCap.min(Int.MaxValue - 1L).toInt + 1
    val packed: Array[Long] = edgeList.as[Long].take(takeN)
    if (sys.env.contains("GRAFT_DEBUG"))
      System.err.println(s"[q65] edge build: ${packed.length}" +
        (if (packed.length >= takeN) "+ (over cap)" else "") + " edges")
    if (packed.length < takeN) {
      QueryCaches.earlyRelease(edgeList)
      val parent = unionFind(packed)
      parent.keys.toSeq.map(k => (k, ufFind(parent, k))).toDF("doc_id", "rep")
    } else componentLabelsDistributed(s, edgeList)
  }

  /** Distributed min-label propagation — the over-cap path. */
  private def componentLabelsDistributed(s: SparkSession,
                                         edgeList: DataFrame): DataFrame = {
    {
      val ab = edgeList.select(
        shiftrightunsigned(col("pk"), 32).as("a"),
        col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("b"))
      val sym = ab
        .unionAll(ab.select(col("b").as("a"), col("a").as("b"))).persist()
      // Iterate ONLY over edge-touched nodes: an isolated doc is trivially
      // its own component. sym is symmetric, so the `a` column alone
      // covers all touched nodes.
      var lab = sym.select(col("a").as("doc_id"))
        .distinct().withColumn("rep", col("doc_id")).persist()
      // Reps only ever decrease (min-propagation), so sum(rep) is strictly
      // monotone until fixpoint — convergence is one cheap aggregate on the
      // cached frame instead of a join-and-count against the prior round.
      var lastSum = lab.agg(sum("rep")).first().getLong(0)
      var converged = false
      var rounds = 0
      val maxRounds = 50
      while (!converged && rounds < maxRounds) {
        val next = sym
          .join(lab.select(col("doc_id").as("a"), col("rep").as("arep")), Seq("a"))
          .join(lab.select(col("doc_id").as("b"), col("rep").as("brep")), Seq("b"))
          .groupBy(col("a").as("doc_id"))
          .agg(least(min(col("arep")), min(col("brep"))).as("rep"))
          .persist()
        val sm = next.agg(sum("rep")).first().getLong(0)
        converged = sm == lastSum
        lastSum = sm
        lab.unpersist()
        lab = next
        rounds += 1
        if (sys.env.contains("GRAFT_DEBUG"))
          System.err.println(s"[q65] round=$rounds sum=$sm")
      }
      // a partially-propagated labeling is a WRONG answer (split dedup
      // groups), never return one silently
      if (!converged) throw new IllegalStateException(
        s"q65 label propagation did not converge in $maxRounds rounds " +
          "(duplicate-chain diameter exceeds the cap; raise maxRounds)")
      // lab is materialized (each round's agg forced it); the edge
      // frames won't be touched again — release their cached blocks so
      // repeated invocations in one session don't accumulate storage
      sym.unpersist()
      QueryCaches.earlyRelease(edgeList)
      QueryCaches.note(lab)
    }
  }

  /** Component SIZES `(rep, n_members)` over a persisted packed edge
    * list, rows globally ordered by `rep` — the cluster-collapse shape
    * the multimodal group queries (q100/q101/q103) and simhashGroups
    * consume. Round 21: the previous composition ran
    * `componentLabels(...).groupBy(rep).count.orderBy(rep)`, which on
    * the (common) driver union-find path planned TWO 32-partition
    * exchanges over a LOCAL labels frame — per profile, ~0.2-0.3 s of
    * pure task scheduling per evaluation for a ≤hundreds-row fold the
    * driver had already done the hard part of. Here the sizes fold in
    * the same union-find pass and come back as one pre-sorted local
    * relation: zero exchanges, identical rows and order (DedupSpec pins
    * local == distributed including order). Over the cap, the
    * distributed labels path runs with the groupBy/orderBy exactly as
    * before — the fold is proportional to the duplicate subgraph. */
  def componentSizes(s: SparkSession, edgeList: DataFrame,
                     driverCap: Long = DriverEdgeCap): DataFrame = {
    // same one-take guard as componentLabels (round 22): count+collect
    // was two jobs for one array of bytes
    import s.implicits._
    val takeN = driverCap.min(Int.MaxValue - 1L).toInt + 1
    val packed: Array[Long] = edgeList.as[Long].take(takeN)
    if (sys.env.contains("GRAFT_DEBUG"))
      System.err.println(s"[q65] edge build: ${packed.length}" +
        (if (packed.length >= takeN) "+ (over cap)" else "") + " edges")
    if (packed.length < takeN) {
      QueryCaches.earlyRelease(edgeList)
      val parent = unionFind(packed)
      val sizes = scala.collection.mutable.LongMap.empty[Long]
      parent.keys.foreach { k =>
        val r = ufFind(parent, k)
        sizes(r) = sizes.getOrElse(r, 0L) + 1L
      }
      sizes.toSeq.sortBy(_._1).toDF("rep", "n_members")
    } else
      componentLabelsDistributed(s, edgeList)
        .groupBy(col("rep")).agg(count(lit(1)).cast("long").as("n_members"))
        .orderBy("rep")
  }

  /** Exact-verified MinHash-LSH near-dup edges (a_id < b_id, jac_e6) over
    * a shingled frame (the q32 kernel, reused by the q74 curation
    * pipeline). `base` should be persisted by the caller — it feeds the
    * signature pass plus the two verification join-backs.
    *
    * The band explode and the self-join carry ONLY (band, bh, doc_id) —
    * never the shingle arrays. Carrying `sh` through the 16-way explode
    * would shuffle ≈16× the tokenized corpus and make the candidate
    * distinct compare whole arrays; at 100 TB that is the bottleneck.
    * Shingle sets are joined back BY ID only for the (small) verified
    * candidate set; the corpus is re-shingled rather than re-shuffled. */
  /** Distinct LSH candidate pairs (a_id < b_id) from band-hash
    * collisions — the pre-verification frame whose growth the
    * scale-stress harness (tools/ScaleStress) measures: bucket-bounded
    * candidate generation must grow ~linearly with the corpus, never
    * quadratically. */
  /** (doc_id, band, bh) — the LSH signature index of a shingled frame:
    * 64 minhashes in one codegen pass (one xxhash64 per shingle plus 64
    * seeded finalizer mixes, graft.functions.MinHashSignature — not 64
    * full string re-hashes through interpreted higher-order functions),
    * folded into 16 band keys of 4 consecutive signature slots. This is
    * the frame a production deployment PERSISTS as a bucketed table:
    * the self-join (q32) and the incremental batch probe (q79) are both
    * equi-joins against it. */
  /** `carry` columns ride along unchanged — the streaming probe (q86)
    * keeps each doc's shingle array beside its band rows this way,
    * because joining the bands back to the shingles by id would be a
    * stream-stream self-join. */
  private[queries] def bandRows(s: SparkSession, base: DataFrame,
                                carry: Seq[String] = Nil): DataFrame = {
    graft.functions.MinHashSignature.register(s, NumHashes)
    val cc = carry.map(col)
    val sig = base.select(col("doc_id") +: cc :+ expr("minhash_sig(sh)").as("sig"): _*)
    val bandCols = (0 until Bands).map { b =>
      val rows = (0 until RowsPerBand).map(r => col("sig").getItem(b * RowsPerBand + r))
      struct(lit(b).as("band"), xxhash64(lit(b) +: rows: _*).as("bh"))
    }
    sig.select(col("doc_id") +: cc :+ explode(array(bandCols: _*)).as("bk"): _*)
      .select(col("doc_id") +: cc :+ col("bk.band") :+ col("bk.bh"): _*)
  }

  private[queries] def minhashCandidates(s: SparkSession, base: DataFrame): DataFrame = {
    val exploded = bandRows(s, base)
    val a = exploded.select(col("band"), col("bh"), col("doc_id").as("a_id"))
    val b = exploded.select(col("band"), col("bh"), col("doc_id").as("b_id"))
    a.join(b, Seq("band", "bh")).filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
  }

  private[queries] def minhashEdges(s: SparkSession, base: DataFrame,
                                    minJ: Double): DataFrame = {
    // Persisted (registry-tracked): the candidate pairs seed BOTH the
    // id broadcast below and the verification join, and recomputing
    // them would re-run the band self-join.
    val cands = QueryCaches.track(minhashCandidates(s, base))
    // Verification needs shingle arrays for CANDIDATE ids only — a
    // vanishing fraction of the corpus under bucketed LSH. The old
    // shape joined the FULL corpus by id twice, so every doc's array
    // was shuffle-WRITTEN twice per evaluation (at the x100 tier those
    // two corpus-wide exchanges were the kernel's whole I/O bill —
    // jstack showed the reps inside shuffle spill merges; at 100 TB
    // they are the difference between "shuffle the candidates" and
    // "shuffle the lake"). The id list is O(candidates) — the quantity
    // the ScaleStress ladder already bounds sub-quadratic — so
    // broadcast it and semi-filter the corpus MAP-SIDE: only
    // candidates' arrays ever enter an exchange.
    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      if (sys.env.contains("GRAFT_DEBUG"))
        System.err.println(
          f"[minhash] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // ONE blocking candidate-sized job (round 20, r19 verdict #4 — the
    // r19 shape paid three: a guard count over the cands cache, then a
    // broadcast-exchange build re-running the distinct, then slim's
    // materialization): filling the cands cache, computing the distinct
    // id set, deciding the broadcast guard, and materializing the
    // broadcast PAYLOAD all come out of this single take(). The cap+1
    // take IS the guard — if the distinct id set fits the cap the rows
    // are already in hand (the exact bytes a broadcast build would have
    // collected to the driver anyway), and the join side becomes a
    // broadcast LOCAL relation with no candidate-sized exchange left in
    // the final query; if it overflows, fall back to the shuffled semi
    // join, which merely degrades — never a driver OOM, never a failed
    // query (pathological band-hash skew only).
    val candIdsDistinct = cands.select(col("a_id").as("doc_id"))
      .union(cands.select(col("b_id").as("doc_id"))).distinct()
    val idRows = timed("cand-ids")(
      candIdsDistinct.take(MaxBroadcastCandIds.toInt + 1))
    val idSide =
      if (idRows.length <= MaxBroadcastCandIds)
        broadcast(s.createDataFrame(
          java.util.Arrays.asList(idRows: _*),
          org.apache.spark.sql.types.StructType(
            candIdsDistinct.schema.fields.toSeq)))
      else candIdsDistinct
    // TRACKED: the verification join consumes slim TWICE (a_id and b_id
    // sides), and `base` is often the tail of a cached-but-still-priced
    // upstream chain (q91: gate→exact-dedup→decontam). Untracked, each
    // side re-ran that chain — the r18 `weak` mark was q91 paying the
    // semi-filter scan 2× plus the broadcast build once more. slim is
    // O(candidate ids) rows, so the cache is bounded by the same
    // sub-quadratic quantity as cands.
    val slim = QueryCaches.track(
      base.join(idSide, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("sh")))
    // Materialize BEFORE the two-sided verification join: its a_id and
    // b_id branches otherwise race to populate the cache, and each
    // racer re-runs the corpus semi-filter scan (observable as
    // BlockManager "already exists" duplicate-compute warnings) — at
    // lake scale that is the whole corpus scanned twice. One blocking
    // candidate-sized job pins the single-scan guarantee.
    timed("slim")(slim.count())
    val withSh = cands
      .join(slim.select(col("doc_id").as("a_id"), col("sh").as("sha")), Seq("a_id"))
      .join(slim.select(col("doc_id").as("b_id"), col("sh").as("shb")), Seq("b_id"))
    val (inter, uni) = interUni(col("sha"), col("shb"))
    withSh
      .withColumn("inter", inter).withColumn("uni", uni)
      .filter(col("inter") * lit(1.0) / col("uni") >= minJ)
      .select(col("a_id"), col("b_id"),
        round(col("inter") * lit(1000000.0) / col("uni")).cast("long").as("jac_e6"))
  }

  val defs: Map[String, Q] = Map(
    // X2: MinHash-LSH near-dup pairs, exact-verified. DIRECT oracle: the
    // exact >= 0.8 Jaccard edge set (DuckDB gram-join CTE, the q65/q74
    // shape). Every emitted pair is exact-verified, so the only way the
    // LSH side can diverge from the oracle is a MISSED candidate —
    // b=16/r=4 misses a J=0.8 pair with p ≈ 3e-4, the same hard-signal
    // trade q74 accepted; a banding/signature regression turns this row
    // red. Recall vs brute force is additionally asserted in DedupSpec.
    "q32_minhash_neardup" -> ((s, d) => {
      // The shingled corpus is used three times (signatures + the two
      // verification join-backs); persist so tokenize+shingle runs once.
      // MEMORY_AND_DISK spills under pressure, so this holds at scale —
      // the cached form is (doc_id, distinct shingles), not raw text.
      // Lifetime note: the query contract returns a lazy DataFrame, so
      // the cache cannot be unpersisted here; it is tracked in
      // QueryCaches so SparkEntry.runAndRelease drops it once the caller
      // has executed the result.
      val base = QueryCaches.track(shingled(docs(s, d)))
      minhashEdges(s, base, minJ = 0.8).orderBy("a_id", "b_id")
    }),

    // X2: exact n-gram-Jaccard similarity search — probes doc_id<20
    // against the whole corpus, oracle-checked. Intersections come from
    // an exploded-shingle equi-join against the BROADCAST probe grams —
    // work is O(total corpus grams) hash probes, not O(probes × corpus)
    // per-pair array intersections (the previous form paid a full
    // array_intersect for every probe/doc pair even when nothing
    // overlapped). Probe-bounded at any corpus size: the broadcast side
    // is only the probe set's grams, the corpus is scanned once, and
    // only actually-overlapping (probe, doc) pairs reach the aggregate.
    "q33_jaccard_search" -> ((s, d) => {
      // probe grams + probe/corpus sizes all derive from one shingled
      // frame → persist
      val all = QueryCaches.track(shingled(docs(s, d)))
      val sizes = all.select(col("doc_id"), size(col("sh")).cast("long").as("n"))
      val probeG = all.filter(col("doc_id") < 20)
        .select(col("doc_id").as("a_id"), explode(col("sh")).as("g"))
      val corpusG = all.select(col("doc_id").as("b_id"), explode(col("sh")).as("g"))
      val inter = corpusG.join(broadcast(probeG), Seq("g"))
        .filter(col("a_id") =!= col("b_id"))
        .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
      inter
        .join(broadcast(sizes.select(col("doc_id").as("a_id"), col("n").as("na"))), Seq("a_id"))
        .join(sizes.select(col("doc_id").as("b_id"), col("n").as("nb")), Seq("b_id"))
        .withColumn("uni", col("na") + col("nb") - col("inter"))
        .filter(col("inter") * lit(1.0) / col("uni") >= 0.5)
        .select(col("a_id"), col("b_id"), col("inter"), col("uni"),
          round(col("inter") * lit(1000000.0) / col("uni")).cast("long").as("jac_e6"))
        .orderBy("a_id", "b_id")
    }),

    // X2 closure: transitive dedup GROUPS — a dedup pipeline keeps one
    // representative per duplicate CLUSTER, which is connected components
    // over the near-dup pair graph, not the raw pair list. Edges here are
    // exact 3-shingle Jaccard ≥ 0.5 (computed with the q33 gram-join
    // shape) so DuckDB can verify the FULL transitive closure with a
    // recursive CTE. Components are two-path by edge count: a driver
    // union-find when the verified pair graph fits (the common dedup
    // case — see DriverEdgeCap), else iterative min-label propagation
    // (rep ← min(rep, neighbors' reps) until fixpoint — the GraphX-CC
    // construction as DataFrame passes, each iteration one join +
    // aggregate, iteration count = cluster diameter). At 100 TB the same
    // closure operator runs over LSH-generated edges (q32/q34/q49); the
    // doc_id<1000 cap bounds the exact edge build, not the operator.
    "q65_dup_groups" -> ((s, d) => {
      val universe = QueryCaches.track(shingled(docs(s, d)).filter(col("doc_id") < 1000))
      val grams = universe.select(col("doc_id"), explode(col("sh")).as("g"))
      val sizes = universe.select(col("doc_id"), size(col("sh")).cast("long").as("n"))
      val inter = grams.select(col("doc_id").as("a"), col("g"))
        .join(grams.select(col("doc_id").as("b"), col("g")), Seq("g"))
        .filter(col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("i"))
      val edges = inter
        .join(broadcast(sizes.select(col("doc_id").as("a"), col("n").as("na"))), Seq("a"))
        .join(broadcast(sizes.select(col("doc_id").as("b"), col("n").as("nb"))), Seq("b"))
        .filter(col("i") * lit(1.0) / (col("na") + col("nb") - col("i")) >= 0.5)
        .select("a", "b")
      // one packed-long column: 8 bytes/edge through the shuffle, the
      // distinct, the cache, AND the driver collect (valid while
      // doc_id < 2^32 — same packing as the q49 big-corpus path)
      val edgeList = QueryCaches.track(edges.select(
        shiftleft(col("a").cast("long"), 32)
          .bitwiseOR(col("b").cast("long")).as("pk")))
      val labels = componentLabels(s, edgeList)
      universe.select(col("doc_id"))
        .join(labels, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("rep"), col("doc_id")).as("rep"))
        .orderBy("doc_id")
    }),

    // X2: SimHash near-dup — driver-visible SELF-CHECK row. The real
    // operator is [[simhashPairs]] (the block-triple banded join, run
    // over the FULL corpus here); the query compares its output
    // restricted to doc_id < 1000 against an in-query brute-force
    // hamming truth over the same capped rep set (the q44/q73
    // approx-self-check shape — the xxhash64-based simhash is not
    // DuckDB-computable, so the truth side must be in-query). Chunk
    // bucketing is EXACT by pigeonhole (hamming ≤ 3 damages ≤ 3 of 6
    // blocks ⇒ some block triple intact), so match_ok = 1 is a theorem; a
    // bucketing/hamming regression flips it and the driver's hash
    // compare turns red. n_reps (distinct-text representatives under
    // the cap) is recomputed by the oracle from `documents` directly.
    // The capped cross-join is the TRUTH side only (≤1000 reps →
    // ≤500k pairs); the operator itself never goes quadratic.
    "q34_simhash_neardup" -> ((s, d) => {
      // ONE simhash pass feeds both the kernel (candidates → verify) and
      // the capped truth side — the (doc_id, simhash) frame is tiny
      // (16 bytes/doc), so caching it is free and recomputing it was the
      // whole-corpus tokenize+hash twice over.
      val simAll = QueryCaches.track(simhashed(docs(s, d)))
      val pairs = simhashPairsFrom(simAll)
      val capped = simAll.filter(col("doc_id") < 1000)
      val truth = capped.select(col("doc_id").as("a_id"), col("simhash").as("ha"))
        .crossJoin(capped.select(col("doc_id").as("b_id"), col("simhash").as("hb")))
        .filter(col("a_id") < col("b_id"))
        .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))).cast("int"))
        .filter(col("hamming") <= 3)
        .select("a_id", "b_id", "hamming")
      val got = pairs.filter(col("a_id") < 1000 && col("b_id") < 1000)
      // symmetric difference via union-tag: rows present in exactly one
      // side sum to 1 or 2, matched rows to 3
      val mism = truth.withColumn("src", lit(1L))
        .unionAll(got.withColumn("src", lit(2L)))
        .groupBy("a_id", "b_id", "hamming").agg(sum("src").as("t"))
        .filter(col("t") =!= 3L)
      capped.agg(count(lit(1)).as("n_reps"))
        .crossJoin(mism.agg(count(lit(1)).as("n_bad")))
        .select(col("n_reps"),
          when(col("n_bad") === 0, 1).otherwise(0).cast("int").as("match_ok"))
    }),

    // X2 incremental: dedup an INCOMING batch against the EXISTING
    // corpus — the production shape for continuous ingestion. A live
    // pipeline cannot re-pair the whole corpus per batch; it keeps the
    // corpus's band rows as a write-once signature INDEX (a bucketed
    // table at 100 TB — recomputed here from the split), probes it
    // with the batch's bands in one equi-join, and exact-verifies only
    // (new, old) collisions. Cost per batch: O(batch signatures +
    // touched buckets), independent of corpus pair mass. Docs < 400
    // stand in for the existing corpus, 400-499 for the batch; the
    // oracle recomputes the exact cross-set >= 0.8 Jaccard edges (the
    // q32 trade: every emitted pair is verified, misses at p ~ 3e-4).
    "q79_incremental_dedup" -> ((s, d) => {
      val sh = QueryCaches.track(shingled(docs(s, d)))
      val old = sh.filter(col("doc_id") < 400)
      val neu = sh.filter(col("doc_id") >= 400 && col("doc_id") < 500)
      val cands = bandRows(s, neu).select(col("doc_id").as("new_id"), col("band"), col("bh"))
        .join(bandRows(s, old).select(col("doc_id").as("old_id"), col("band"), col("bh")),
          Seq("band", "bh"))
        .select("new_id", "old_id").distinct()
      val withSh = cands
        .join(sh.select(col("doc_id").as("new_id"), col("sh").as("sha")), Seq("new_id"))
        .join(sh.select(col("doc_id").as("old_id"), col("sh").as("shb")), Seq("old_id"))
      val (inter, uni) = interUni(col("sha"), col("shb"))
      withSh.withColumn("inter", inter).withColumn("uni", uni)
        .filter(col("inter") * lit(1.0) / col("uni") >= 0.8)
        .select(col("new_id"), col("old_id"),
          round(col("inter") * lit(1000000.0) / col("uni")).cast("long").as("jac_e6"))
        .orderBy("new_id", "old_id")
    }),

    // X2 incremental, INDEXED: q79 against the durable signature index
    // ([[MinHashIndex]] — band rows + shingle feature store written
    // once under var/demo, the production lifecycle where the corpus
    // side is amortized across batches). Per-batch work: signature the
    // 100-doc batch, broadcast-probe the band index (the index side is
    // scanned in place, never shuffled), exact-verify collisions
    // against the shingle store BY ID. Emits the same edge set as q79
    // (asserted in DedupSpec); the bench gap between the two IS the
    // measured value of owning the index.
    "q82_indexed_dedup" -> ((s, d) =>
      indexedProbe(s, d, MinHashIndex.ensure(s, d), lo = 400, hi = 500)),

    // X2 incremental, APPENDED: the q82 lifecycle COMPLETED — the index
    // probed here is not a one-shot build but corpus + an appended
    // batch A ([[MinHashIndex.ensureAppended]]: build docs < 400, then
    // append-on-commit docs 400-449), and the probe batch B is docs
    // 450-499. This is the steady state of continuous ingestion: every
    // committed batch's band rows + shingles land in the index as
    // append-only parquet files, so batch N+1's probe sees batch N
    // without any corpus-side recompute. DedupSpec proves sequential
    // appends ≡ a from-scratch build over the union; the oracle is the
    // exact cross-set >= 0.8 Jaccard edges with the corpus EXTENDED to
    // doc_id < 450 — a probe against a stale (pre-append) index would
    // miss every B↔A edge and hash-mismatch.
    "q83_appended_dedup" -> ((s, d) =>
      indexedProbe(s, d, MinHashIndex.ensureAppended(s, d),
        lo = MinHashIndex.BatchSplit, hi = 500)),

    // X2 incremental, STREAMING: the q82 probe as a LIVE Structured
    // Streaming query — docs land as files, the stream signatures them
    // and probes the durable index with stream-static joins
    // ([[MinHashIndex.probeStream]]; harness
    // [[graft.pipeline.StreamDemo.ensureStreamNearDedup]], two
    // deliveries so a micro-batch boundary falls inside the batch).
    // Same oracle as q79/q82: the streaming path must emit exactly the
    // batch path's cross-set edge set, independent of arrival batching.
    "q86_stream_neardup" -> ((s, d) =>
      graft.pipeline.StreamDemo.ensureStreamNearDedup(s, d)
        .orderBy("new_id", "old_id")),

    // X2 incremental SPANS: the Lee-et-al exact-substring probe at
    // ingest time — which [[SpanWindow]]-token windows of an INCOMING
    // batch already exist in the corpus (cross-set only, the q79
    // discipline: within-batch dups are the batch's own q76 pass).
    // Production shape: the corpus's distinct window hashes are the
    // third store of the durable signature index (append-only parquet
    // beside bands/shingles); the probe broadcasts the BATCH's window
    // hashes (one ingest tick — tiny) against the index scan, collects
    // the matched hashes (tinier), and broadcasts them back over the
    // batch — the corpus/index side never shuffles, per-batch cost is
    // O(batch windows + index scan), and both joins are semi
    // (duplicate-insensitive, so an append-only index needs no global
    // re-distinct). Emits the batch docs' merged already-in-corpus
    // spans — exactly what an ingest gate scrubs before commit.
    "q88_incremental_spans" -> ((s, d) => {
      val all = docs(s, d)
      val batchWins = QueryCaches.track(spanWindows(
        all.filter(col("doc_id") >= 400 && col("doc_id") < 500)))
      val batchWh = batchWins.select("wh").distinct()
      val matched = spanWindows(all.filter(col("doc_id") < 400))
        .join(broadcast(batchWh), Seq("wh"), "left_semi")
        .select("wh").distinct()
      val marks = batchWins.join(broadcast(matched), Seq("wh"), "left_semi")
        .select("doc_id", "pos")
      mergeSpans(marks)
    }),

    // X2 incremental SPANS, INDEXED: q88 against the durable index's
    // `winhashes` store ([[MinHashIndex]] — written at build time and
    // on every append-on-commit beside bands/shingles, so the store
    // already contains every committed doc's windows and the corpus
    // side is never recomputed). Same oracle as q88: two paths
    // (recompute / durable store), one truth; DedupSpec asserts
    // span-set equality.
    "q89_indexed_spans" -> ((s, d) =>
      MinHashIndex.probeSpans(s, MinHashIndex.ensure(s, d),
        docs(s, d).filter(col("doc_id") >= 400 && col("doc_id") < 500))),

    // X2: substring-level exact span dedup — the Lee et al. modality
    // ("Deduplicating Training Data Makes Language Models Better",
    // exact-substring dedup at >= 50 BPE tokens) that DOC-level LSH
    // cannot catch: two long documents sharing one boilerplate
    // paragraph have tiny whole-doc Jaccard, but the paragraph should
    // still be scrubbed. Every [[SpanWindow]]-token sliding window is
    // hashed; a window appearing in >= 2 DISTINCT docs marks its
    // [pos, pos+W) token range, and per doc the marked ranges merge
    // into maximal spans — the (doc_id, span) form a scrubbing pass
    // consumes. DIRECT oracle: DuckDB recomputes the windows on the
    // window STRINGS (no xxhash64 needed oracle-side), so the whole
    // output — not a capped slice — is hash-compared.
    "q76_span_dedup" -> ((s, d) => spanDedup(s, d)),

    // X2: the SCRUB composed on q76's spans — the actionable half of
    // exact-substring dedup: drop every token inside a duplicated
    // span and reassemble the doc. Per-doc accounting plus the md5 of
    // the scrubbed text (the driver compare needs the exact bytes in a
    // VALUE, and shipping whole texts through the oracle diff would
    // dwarf the signal). Spans per doc are a tiny collected list (the
    // left join's build side is q76's output, orders of magnitude
    // smaller than the corpus), and the token filter is one scan pass.
    "q81_span_scrub" -> ((s, d) => {
      val spans = spanDedup(s, d)
        .groupBy("doc_id")
        .agg(collect_list(struct(col("span_start"), col("span_end"))).as("sp"))
      docs(s, d).join(spans, Seq("doc_id"), "left")
        .withColumn("tk", split(col("text"), " "))
        .withColumn("keep", expr(
          "filter(transform(tk, (t, i) -> struct(t AS t, i AS i)), " +
            "x -> sp IS NULL OR NOT exists(sp, " +
            "r -> x.i >= r.span_start AND x.i < r.span_end))"))
        .select(col("doc_id"),
          size(col("tk")).cast("long").as("n_before"),
          size(col("keep")).cast("long").as("n_after"),
          md5(expr("array_join(transform(keep, x -> x.t), ' ')")).as("scrub_md5"))
        .orderBy("doc_id")
    }))

  /** The q82/q83 probe body: dedup the batch `[lo, hi)` against the
    * durable signature index at `idxRoot` (band rows + shingle feature
    * store — see [[MinHashIndex]]). Per-batch work: signature the batch,
    * broadcast-probe the band index (the index side is scanned in
    * place, never shuffled), exact-verify collisions against the
    * shingle store BY ID. Emits the same edge set as the recomputing
    * q79 path over the same split (asserted in DedupSpec); the bench
    * gap between the two IS the measured value of owning the index. */
  private def indexedProbe(s: SparkSession, d: String, idxRoot: String,
                           lo: Int, hi: Int): DataFrame = {
    val neu = QueryCaches.track(shingled(
      docs(s, d).filter(col("doc_id") >= lo && col("doc_id") < hi)))
    MinHashIndex.probeShingled(s, idxRoot, neu, minJ = 0.8)
      .orderBy("new_id", "old_id")
  }

  /** doc_id → 64-bit simhash over distinct-text representatives (the
    * exact-dedup pre-pass that bounds bucket occupancy — see
    * [[simhashPairs]]). Bit k of the simhash is set iff the sum over
    * tokens of sign(bit k of xxhash64(token)) is positive, computed by
    * the codegen [[graft.functions.SimHash64]] expression (one token
    * hash + 64 bit-votes per token, bit-compatible with the SQL
    * xxhash64 form DedupSpec uses as brute-force truth). */
  private[queries] def simhashed(df: DataFrame): DataFrame = {
    val repW = Window.partitionBy("th").orderBy("doc_id")
    val base = df
      .withColumn("th", xxhash64(col("text")))
      .withColumn("rn", row_number().over(repW))
      .filter(col("rn") === 1)
      .withColumn("toks", array_distinct(split(col("text"), " ")))
      .filter(size(col("toks")) >= 1)
    graft.functions.SimHash64.register(df.sparkSession)
    base.withColumn("simhash", expr("simhash64(toks)"))
      .select("doc_id", "simhash")
  }

  /** SimHash near-dup pairs (hamming ≤ 3), block-triple candidates —
    * the q34 kernel. Candidates come from a 20-way triple-key explode +
    * equi-self-join (pigeonhole: hamming ≤ 3 ⇒ some block triple
    * intact — the candidate set is EXACT, not probabilistic), verified
    * by `bit_count(xor) ≤ 3`.
    *
    * Skew guard: exact-duplicate texts all collapse to one simhash, so a
    * boilerplate-heavy corpus makes one (combo, ck) bucket quadratic. An
    * exact-dedup pre-pass (min doc_id per distinct text — the q26 kernel,
    * inside [[simhashed]]) bounds every bucket by the number of DISTINCT
    * texts in it; pairs are then near-dup pairs among distinct-text
    * representatives, which is the useful answer for a dedup pipeline
    * anyway (exact dups are already handled by X1). DedupSpec asserts
    * this completes with bounded output on a 50×-replicated boilerplate
    * fixture. */
  /** 64-bit simhash split into 6 blocks (11,11,11,11,10,10 bits). */
  private val SimBlocks: Seq[(Int, Int)] = {
    val widths = Seq(11, 11, 11, 11, 10, 10)
    widths.scanLeft(0)(_ + _).zip(widths)
  }
  /** All 20 block triples — the multi-index of Manku et al. (WWW'07):
    * hamming <= 3 damages at most 3 blocks, so >= 3 of 6 are intact and
    * SOME triple matches exactly — the candidate set stays EXACT. */
  private val BlockTriples: Seq[Seq[Int]] =
    SimBlocks.indices.combinations(3).map(_.toSeq).toSeq

  /** Distinct block-triple-collision candidates (a_id, b_id, ha, hb) —
    * the pre-verification frame the scale-stress harness measures.
    *
    * Why triples of ~11-bit blocks instead of the single 16-bit chunks
    * of the classic 4-way split: bucketing keys must OUTGROW the corpus
    * or random co-occupancy goes quadratic. A 16-bit chunk has 65k
    * buckets — at 50k distinct sims the ×4 chunk tables measured 17.9M
    * candidates against 2.2M true pairs (the n²/65536 term). A triple
    * key spans ~32 bits (4B buckets), so random collisions are
    * negligible at any realistic shard size and candidates track TRUE
    * near-dup mass; the price is a 20-way explode instead of 4-way on
    * a 16-byte frame. Same pigeonhole exactness, measured in
    * ScaleStress. */
  /** (doc_id, <fpCol>, combo, ck): the 20-way block-triple key explode
    * of a (doc_id, 64-bit fingerprint) frame — the shared candidate-key
    * builder of the Hamming-radius family. [[simhashCandidates]]
    * self-joins it; [[FingerprintIndex.probe]] equi-joins a BROADCAST
    * batch side against a durable index side on the same (combo, ck)
    * keys, so both paths inherit the identical pigeonhole-exactness and
    * bucket-size arguments. */
  private[queries] def tripleKeyed(df: DataFrame, fpCol: String): DataFrame = {
    val comboCols = BlockTriples.zipWithIndex.map { case (t, id) =>
      val key = t.map { bi =>
        val (off, w) = SimBlocks(bi)
        shiftright(col(fpCol), off).bitwiseAND(lit((1L << w) - 1))
      }.reduceLeft((a, b) => shiftleft(a, 11).bitwiseOR(b)) // <= 33 bits
      struct(lit(id).as("combo"), key.as("ck"))
    }
    df.select(col("doc_id"), col(fpCol), explode(array(comboCols: _*)).as("x"))
      .select(col("doc_id"), col(fpCol), col("x.combo"), col("x.ck"))
  }

  private[queries] def simhashCandidates(sim: DataFrame): DataFrame = {
    val blocks = tripleKeyed(sim, "simhash")
    val a = blocks.select(col("combo"), col("ck"),
      col("doc_id").as("a_id"), col("simhash").as("ha"))
    val b = blocks.select(col("combo"), col("ck"),
      col("doc_id").as("b_id"), col("simhash").as("hb"))
    a.join(b, Seq("combo", "ck")).filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "ha", "hb").distinct()
  }

  /** Verified hamming ≤ 3 pairs from an already-simhashed frame — lets a
    * caller that needs the simhash frame for something else (the q34
    * truth side) share ONE pass instead of recomputing it. */
  private[queries] def simhashPairsFrom(sim: DataFrame): DataFrame =
    simhashCandidates(sim)
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= 3)
      .select(col("a_id"), col("b_id"), col("hamming").cast("int").as("hamming"))
      .orderBy("a_id", "b_id")

  private[queries] def simhashPairs(s: SparkSession, d: String): DataFrame =
    simhashPairsFrom(simhashed(docs(s, d)))

  /** Group-collapsed SimHash output: ONE row per near-dup cluster —
    * `(rep, n_members)`, rep = the cluster's minimum doc_id (its seed) —
    * instead of one row per pair. This is the form to compose into a
    * curation pipeline (q65/q74 shape): the pair list is O(k²/2) in a
    * k-document near-dup cluster, so a boilerplate-heavy corpus can emit
    * quadratically many pairs even though candidate GENERATION is
    * bucket-bounded; the collapsed form is O(k) via the same
    * [[componentLabels]] closure the other dedup families use (driver
    * union-find under the edge cap, min-label propagation above it).
    * Pair vs collapsed equivalence is asserted in DedupSpec on the
    * replicated-boilerplate fixture. */
  private[queries] def simhashGroups(s: SparkSession, d: String): DataFrame = {
    val edgeList = QueryCaches.track(simhashPairs(s, d).select(
      shiftleft(col("a_id").cast("long"), 32)
        .bitwiseOR(col("b_id").cast("long")).as("pk")))
    componentSizes(s, edgeList)
  }

  /** (doc_id, pos, wh): one 64-bit hash per [[SpanWindow]]-token sliding
    * window (pos = 0-based start token). The join key through every
    * downstream shuffle is the 8-byte hash, never the window string —
    * at 100 TB the dup-detection group-by moves hashes only. The scan
    * pass is the codegen [[graft.functions.SpanHashes]] byte walk (one
    * in-place xxh64 per window, zero intermediate arrays/strings;
    * hash↔string equivalence-class bijection asserted in
    * SpanHashesSpec); short docs emit no windows. */
  private[queries] def spanWindows(df: DataFrame): DataFrame = {
    graft.functions.SpanHashes.register(df.sparkSession, SpanWindow)
    df.select(col("doc_id"), posexplode(expr("span_hashes(text)")).as(Seq("pos", "wh")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("wh"))
  }

  /** (doc_id, pos) of every window duplicated across >= 2 distinct docs.
    * "Distinct docs" is tested as min(doc_id) != max(doc_id): unlike
    * count(distinct), min/max are map-side combinable, so the dup
    * group-by partial-aggregates before the shuffle. The join back is
    * hash-vs-hash; AQE converts it to broadcast when the dup set is
    * small (the common case — duplicated distinct windows are a tiny
    * fraction of corpus windows), and it degrades to a plain shuffle
    * join on a boilerplate-heavy crawl rather than OOMing a broadcast. */
  private[queries] def spanDupMarks(wins: DataFrame): DataFrame = {
    val dup = wins.groupBy("wh")
      .agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
      .filter(col("mn") =!= col("mx")).select("wh")
    wins.join(dup, Seq("wh")).select("doc_id", "pos")
  }

  /** Interval-merge marked window starts `(doc_id, pos)` into maximal
    * spans: (doc_id, span_start, span_end, n_windows), span_end
    * exclusive in token positions. One per-doc sort window: a new span
    * begins where the gap to the previous start exceeds W. */
  private[queries] def mergeSpans(marks: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    marks
      .withColumn("brk",
        when(col("pos") - lag("pos", 1).over(w) > SpanWindow, 1).otherwise(0))
      .withColumn("grp", sum("brk").over(w))
      .groupBy("doc_id", "grp")
      .agg(min("pos").as("span_start"),
        (max("pos") + SpanWindow).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col("doc_id"), col("span_start"), col("span_end"), col("n_windows"))
      .orderBy("doc_id", "span_start")
  }

  /** Merged duplicated spans per doc over the whole corpus (q76). */
  private[queries] def spanDedup(s: SparkSession, d: String): DataFrame = {
    val wins = QueryCaches.track(spanWindows(docs(s, d)))
    mergeSpans(spanDupMarks(wins))
  }

  /** Shared oracle CTE chain computing the q76 merged spans on the
    * window STRINGS (DuckDB needs no xxhash64 — the hash is an
    * engine-side compression of the same equality). min<>max ==
    * "appears in >= 2 distinct docs". */
  private val SpanCtes =
    s"""toks AS (
           SELECT doc_id, string_split(text, ' ') AS t FROM documents
         ), win AS (
           SELECT doc_id, i - 1 AS pos,
                  array_to_string(t[i:i+${SpanWindow - 1}], ' ') AS w
           FROM toks, UNNEST(generate_series(1, len(t) - ${SpanWindow - 1})) AS u(i)
           WHERE len(t) >= $SpanWindow
         ), dup AS (
           SELECT w FROM win GROUP BY w HAVING MIN(doc_id) <> MAX(doc_id)
         ), marked AS (
           SELECT doc_id, pos FROM win JOIN dup USING (w)
         ), brk AS (
           SELECT doc_id, pos,
             CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                    > $SpanWindow THEN 1 ELSE 0 END AS b
           FROM marked
         ), grp AS (
           SELECT doc_id, pos,
             SUM(b) OVER (PARTITION BY doc_id ORDER BY pos) AS g
           FROM brk
         ), spans AS (
           SELECT doc_id, MIN(pos) AS span_start,
                  MAX(pos) + $SpanWindow AS span_end,
                  CAST(COUNT(*) AS BIGINT) AS n_windows
           FROM grp GROUP BY doc_id, g
         )"""

  /** q79/q82/q83 shared oracle shape: exact cross-set >= 0.8 Jaccard
    * edges between the batch (doc_id [lo, hi)) and the corpus
    * (doc_id < oldCap). q79/q82 use (400, 400, 500); q83 extends the
    * corpus past the appended batch A: (450, 450, 500). */
  private def crossSetOracleSql(oldCap: Int, lo: Int, hi: Int) =
    s"""WITH tok AS (
           SELECT doc_id, unnest(list_distinct(sh)) AS g FROM (
             SELECT doc_id, string_split(text, ' ') AS t,
               [t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(string_split(text,' ')) - 1)] AS sh
             FROM documents) x WHERE len(t) >= 3),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY 1),
         inter AS (
           SELECT b.doc_id AS new_id, a.doc_id AS old_id, COUNT(*) AS i
           FROM tok a JOIN tok b ON a.g = b.g
           WHERE a.doc_id < $oldCap AND b.doc_id >= $lo AND b.doc_id < $hi
           GROUP BY 1, 2)
         SELECT new_id, old_id,
           CAST(ROUND(CAST(i AS DOUBLE) * 1000000 / (sa.n + sb.n - i)) AS BIGINT) AS jac_e6
         FROM inter JOIN sizes sa ON sa.doc_id = old_id JOIN sizes sb ON sb.doc_id = new_id
         WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
         ORDER BY new_id, old_id"""

  private val CrossSetOracleSql = crossSetOracleSql(400, 400, 500)

  /** q88/q89 shared oracle: cross-set span marks recomputed on the
    * window STRINGS (q76 discipline) — batch docs' windows that exist
    * in the corpus, merged with the same break/group CTEs. */
  private val CrossSetSpanOracleSql =
    s"""WITH toks AS (
           SELECT doc_id, string_split(text, ' ') AS t FROM documents
         ), win AS (
           SELECT doc_id, i - 1 AS pos,
                  array_to_string(t[i:i+${SpanWindow - 1}], ' ') AS w
           FROM toks, UNNEST(generate_series(1, len(t) - ${SpanWindow - 1})) AS u(i)
           WHERE len(t) >= $SpanWindow
         ), marked AS (
           SELECT b.doc_id, b.pos FROM win b
           WHERE b.doc_id >= 400 AND b.doc_id < 500
             AND EXISTS (SELECT 1 FROM win c WHERE c.doc_id < 400 AND c.w = b.w)
         ), brk AS (
           SELECT doc_id, pos,
             CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                    > $SpanWindow THEN 1 ELSE 0 END AS b
           FROM marked
         ), grp AS (
           SELECT doc_id, pos,
             SUM(b) OVER (PARTITION BY doc_id ORDER BY pos) AS g
           FROM brk
         ), spans AS (
           SELECT doc_id, MIN(pos) AS span_start,
                  MAX(pos) + $SpanWindow AS span_end,
                  CAST(COUNT(*) AS BIGINT) AS n_windows
           FROM grp GROUP BY doc_id, g
         )
         SELECT doc_id, span_start, span_end, n_windows
         FROM spans ORDER BY doc_id, span_start"""

  val oracles: Map[String, String] = Map(
    "q76_span_dedup" ->
      s"""WITH $SpanCtes
         SELECT doc_id, span_start, span_end, n_windows
         FROM spans ORDER BY doc_id, span_start""",
    // q81: the scrub composed on the same spans — token kept iff it is
    // inside no merged span; md5 of the reassembled text pins the exact
    // scrubbed bytes.
    "q81_span_scrub" ->
      s"""WITH $SpanCtes,
         pos AS (
           SELECT doc_id, i - 1 AS p, t[i] AS tok
           FROM toks, UNNEST(generate_series(1, len(t))) AS u(i)
         ), kept AS (
           SELECT p.doc_id, p.p, p.tok FROM pos p
           WHERE NOT EXISTS (SELECT 1 FROM spans s
             WHERE s.doc_id = p.doc_id AND p.p >= s.span_start AND p.p < s.span_end)
         ), agg AS (
           SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_after,
                  md5(string_agg(tok, ' ' ORDER BY p)) AS scrub_md5
           FROM kept GROUP BY 1
         )
         SELECT b.doc_id,
                CAST(len(string_split(b.text, ' ')) AS BIGINT) AS n_before,
                COALESCE(a.n_after, 0) AS n_after,
                COALESCE(a.scrub_md5, md5('')) AS scrub_md5
         FROM documents b LEFT JOIN agg a ON a.doc_id = b.doc_id
         ORDER BY b.doc_id""",
    // The simhash itself is xxhash64-based (not DuckDB-computable), so
    // the truth side of the pair comparison is in-query; the oracle
    // recomputes the capped rep count from `documents` and pins the
    // theorem flag at 1 (q44/q73 pattern).
    "q34_simhash_neardup" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_reps, CAST(1 AS INT) AS match_ok
         FROM (SELECT MIN(doc_id) AS m FROM documents GROUP BY text) x
         WHERE m < 1000""",
    "q32_minhash_neardup" ->
      """WITH tok AS (
           SELECT doc_id, unnest(list_distinct(sh)) AS g FROM (
             SELECT doc_id, string_split(text, ' ') AS t,
               [t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(string_split(text,' ')) - 1)] AS sh
             FROM documents) x WHERE len(t) >= 3),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY 1),
         inter AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS i
           FROM tok a JOIN tok b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT a_id, b_id,
           CAST(ROUND(CAST(i AS DOUBLE) * 1000000 / (sa.n + sb.n - i)) AS BIGINT) AS jac_e6
         FROM inter JOIN sizes sa ON sa.doc_id = a_id JOIN sizes sb ON sb.doc_id = b_id
         WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
         ORDER BY a_id, b_id""",
    // q79/q82: the exact cross-set >= 0.8 Jaccard edges between the
    // batch (doc_id 400-499) and the existing corpus (doc_id < 400) —
    // the q32 construction restricted to cross pairs. One oracle for
    // both: the recomputing (q79) and indexed (q82) paths must emit
    // the SAME edges.
    "q79_incremental_dedup" -> CrossSetOracleSql,
    "q82_indexed_dedup" -> CrossSetOracleSql,
    // q86: the STREAMING probe of the same index over the same batch —
    // three paths (recompute / indexed batch / indexed stream), one
    // truth.
    "q86_stream_neardup" -> CrossSetOracleSql,
    // q88/q89: cross-set span marks recomputed on the window STRINGS
    // (the q76 oracle discipline), merged with the same break/group
    // CTEs. One oracle for both paths — recompute and durable store
    // must emit identical spans.
    "q88_incremental_spans" -> CrossSetSpanOracleSql,
    "q89_indexed_spans" -> CrossSetSpanOracleSql,
    // q83: same construction with the corpus extended over the appended
    // batch A — the probe runs against index(docs < 400 ∪ docs 400-449),
    // so the truth side is every cross edge from batch B (450-499) into
    // doc_id < 450. A stale index (no append) would miss all B↔A edges.
    "q83_appended_dedup" ->
      crossSetOracleSql(MinHashIndex.BatchSplit, MinHashIndex.BatchSplit, 500),
    "q65_dup_groups" ->
      """WITH RECURSIVE
           tok AS (
             SELECT doc_id, unnest(list_distinct(sh)) AS g FROM (
               SELECT doc_id, string_split(text, ' ') AS t,
                 [t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(string_split(text,' ')) - 1)] AS sh
               FROM documents WHERE doc_id < 1000) x WHERE len(t) >= 3),
           sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY 1),
           inter AS (
             SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS i
             FROM tok a JOIN tok b ON a.g = b.g AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
           edges AS (
             SELECT a, b FROM inter
             JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
             WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5),
           sym AS (SELECT a, b FROM edges UNION ALL SELECT b, a FROM edges),
           walk(id, r) AS (
             SELECT doc_id, doc_id FROM sizes
             UNION
             SELECT s.b, w.r FROM walk w JOIN sym s ON s.a = w.id)
         SELECT id AS doc_id, MIN(r) AS rep FROM walk GROUP BY 1 ORDER BY 1""",
    "q33_jaccard_search" ->
      """WITH tok AS (
           SELECT doc_id, unnest(list_distinct(sh)) AS g FROM (
             SELECT doc_id, string_split(text, ' ') AS t,
               [t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(string_split(text,' ')) - 1)] AS sh
             FROM documents) x WHERE len(t) >= 3),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY 1),
         inter AS (
           SELECT p.doc_id AS a_id, o.doc_id AS b_id, COUNT(*) AS i
           FROM tok p JOIN tok o ON p.g = o.g AND p.doc_id < 20 AND o.doc_id <> p.doc_id
           GROUP BY 1, 2)
         SELECT a_id, b_id, CAST(i AS BIGINT) AS inter,
           CAST(sa.n + sb.n - i AS BIGINT) AS uni,
           CAST(ROUND(CAST(i AS DOUBLE) * 1000000 / (sa.n + sb.n - i)) AS BIGINT) AS jac_e6
         FROM inter JOIN sizes sa ON sa.doc_id = a_id JOIN sizes sb ON sb.doc_id = b_id
         WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5
         ORDER BY a_id, b_id""")
}
