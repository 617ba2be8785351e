package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.Tables

/** Vector-similarity search over `embeddings` (SURVEY.md §2.10 X3;
  * north-star LLM-pipeline similarity surface). 64-dim float vectors,
  * 10 cluster labels (TESTDATA.md).
  *
  * No UDFs anywhere — dot products run on the codegen `vec_dot`
  * expression (float arrays) or the higher-order `aggregate(zip_with)`
  * form (double arrays):
  *
  *  - q35: exact brute-force cosine top-k for a probe set. Probes are
  *    broadcast, so the corpus is scanned once with no shuffle before the
  *    per-probe top-k; this is the correctness baseline and oracle-checked.
  *  - q36: approximate NN via random-hyperplane LSH (8 tables ×
  *    corpus-adaptive-width Rademacher sign codes, multi-probe over
  *    hamming-1 neighbors). The 100 TB path: candidates come from an
  *    equi-join on (table, code) — the corpus is never crossed with the
  *    probes — and only the candidate set is exactly re-ranked. Rows-only
  *    (probabilistic); recall vs q35 is asserted in VectorSpec.
  *  - q51: approximate NN via IVF — k-means coarse quantizer (Lloyd
  *    iterations as DataFrame passes), nprobe nearest cells per probe,
  *    exact re-rank of cell members. The other standard ANN layout;
  *    recall vs q35 asserted in VectorSpec.
  *  - q49: embedding-cosine near-duplicate pairs (the LSH machinery as a
  *    self-join + exact verify) — the vector member of the dedup family.
  *  - q37: per-label centroid (elementwise mean via posexplode — a single
  *    shuffle keyed (label, pos), so no vector ever aggregates on one
  *    node) + pairwise centroid cosine. Oracle-checked.
  *  - q92: SEMANTIC decontamination — the embedding-space complement of
  *    q75's n-gram containment scrub. The eval set is vectors, not
  *    grams, so paraphrased leakage that shares no 8-gram with the
  *    benchmark still gets caught by cosine proximity. Eval vectors ride
  *    the scan as literals (an eval set is KBs–MBs at any corpus scale),
  *    so the corpus is scanned ONCE with zero shuffle and only the
  *    flagged sliver leaves the map side.
  *
  * Cosines are emitted as `round(cos * 1e6)` integers for the same
  * order-independence reason as the money columns (graft.engine.Cols).
  */
object VectorOps {
  type Q = (SparkSession, String) => DataFrame
  private def embs(s: SparkSession, d: String) = Tables.load(s, d, "embeddings")

  /** Double-precision dot product of two DOUBLE arrays (portable
    * higher-order-function form; used for the q37 centroid vectors). */
  private def dotd(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** round(cosine(a, b) * 1e6) as long, over double arrays. */
  private def cosE6(a: Column, b: Column): Column =
    round(dotd(a, b) / (sqrt(dotd(a, a)) * sqrt(dotd(b, b))) * lit(1000000.0))
      .cast("long")

  /** Same cosine over FLOAT arrays via the codegen
    * [[graft.functions.FloatVectorDot]] expression — identical double
    * accumulation order as [[dotd]], so results are bit-equal; the float
    * loop lives inside whole-stage codegen instead of the interpreted
    * higher-order-function path (SURVEY.md §7.4). */
  private def cosE6F(a: String, b: String): Column =
    round(expr(s"vec_dot($a, $b) / (sqrt(vec_dot($a, $a)) * sqrt(vec_dot($b, $b)))")
      * lit(1000000.0)).cast("long")

  private[queries] val NumProbes = 10
  private val TopK = 5
  private val Tables_ = 8       // LSH tables
  private val MinBits = 4
  // Clamp only as a guard rail, far above any tested tier: occupancy
  // stays ≈bucketTarget(n) up to n = 2^30 · 16 ≈ 1.7e10 vectors (codes are
  // one long per table; flips shift within bits 0..29), so the
  // adaptive width — not this cap — sets the operating point for every
  // realistic corpus. 24 would have started inflating buckets one
  // decade past 1e9 vectors.
  private val MaxBits = 30

  /** q49's quantized pre-gate margin (e6 units): the int8-SQ cosine's
    * error bound for 64-dim vectors is < 0.064 of the norm product
    * ([[graft.functions.QuantCosTable]] scaladoc derives it), so
    * gating candidates at `threshold − 70000` can never drop a pair
    * whose EXACT cosine meets the threshold — precision and recall of
    * the verified output are untouched; the gate only shrinks the
    * candidate-distinct shuffle and the exact-verify workload to the
    * near-threshold sliver. */
  private val QGateMarginE6 = 70000L

  /** Corpus row count under which the embedding table is comfortably
    * broadcastable (~1M × 64 floats ≈ 256 MB) and q49 verifies raw
    * collisions map-side instead of paying a candidate-distinct shuffle. */
  private val BroadcastRows = 1000000L

  /** q92 semantic-contamination threshold (e6 units). Deliberately
    * LOOSER than q49's 0.45 near-dup bound: decontamination wants the
    * paraphrase-adjacent halo around each eval item, not just its
    * near-copies. On this corpus's cluster geometry (same-cluster
    * cosine ≈ 0.45, cross-cluster median ≈ 0.19) 0.35 flags the
    * eval-adjacent tail at every gated sf (7/11/43 vectors at
    * sf0.001/0.01/0.1) without swallowing whole clusters. */
  private val SemContamE6 = 350000L

  /** Aimed-for vectors per bucket — NOT scale-adaptive, on measured
    * evidence: the corpus's true pairs sit right at the 0.45 threshold
    * (sf0.01 min 0.4496; 602k such pairs at the x100 tier), and a
    * tighter-bucket experiment (target 16 above 50k vectors, i.e. two
    * more code bits) cut candidates 3× but LOST 46% of the x100 output
    * pairs — threshold pairs need the fat buckets at every scale. The
    * per-vector candidate budget (tables × probes × occupancy ≈ 3.6k)
    * is instead paid efficiently: hash-probe enumeration
    * ([[lshSelfCollisions]]) and the quantized pre-gate keep the cost
    * per candidate to a streamed codegen row. */
  private val BucketTarget = 64

  private def bucketTarget(n: Long): Int = BucketTarget

  /** Code width scales with corpus size so each bucket holds
    * ≈[[bucketTarget]] vectors: bits = clamp(ceil(log2(n/target)), 4, 30).
    * 500 vectors → 4 bits; 1e9 vectors → 26 bits. A fixed width is wrong
    * at one end or the other: 8 bits = 256 buckets is a 256× linear scan
    * at 100 TB, while 16 bits on a 500-vector test corpus leaves every
    * bucket near-empty and recall collapses. The count() is parquet
    * metadata only (an index build knows its corpus size).
    */
  private def codeBits(n: Long): Int =
    math.max(MinBits, math.min(MaxBits,
      math.ceil(math.log(math.max(1.0, n.toDouble / bucketTarget(n))) / math.log(2.0)).toInt))

  /** (vec_id, t, code) bucket rows: all per-table sign codes in ONE
    * fused codegen pass (graft.functions.LshCodesExpr — bit-identical to
    * the unrolled vec_dot-vs-literal-hyperplane form, but the generated
    * code is a single tight loop instead of tables×bits unrolled dot
    * products, which dominated cold-run Janino/JIT cost). `carry`
    * columns ride along on every bucket row. */
  private def lshBuckets(df: DataFrame, bits: Int, dim: Int,
                         carry: Seq[String] = Nil): DataFrame = {
    graft.functions.LshCodesExpr.register(df.sparkSession, bits, Tables_, dim)
    df.withColumn("codes", expr("lsh_codes(embedding)"))
      .select(col("vec_id") +: carry.map(col) :+ posexplode(col("codes")).as(Seq("t", "code")): _*)
  }

  /** The exact code plus all hamming-1 flips (multi-probe ring). */
  private def multiProbe(bits: Int): Column = expr(
    s"array_union(array(code), transform(sequence(0, ${bits - 1}), " +
      "j -> code ^ shiftleft(1L, j)))")

  /** The exact code plus UPWARD hamming-1 flips only (0-bits set to 1).
    * For a SELF-join this yields the identical candidate set as the full
    * ring at ~half the explode: a hamming-1 pair's two codes differ in
    * exactly one bit, so the member holding the 0 flips up to the other —
    * every such pair is produced exactly once (vs twice with ± flips),
    * provided the pair key is direction-free (least/greatest packing,
    * not an a<b filter on the join output). */
  private def upProbe(bits: Int): Column = expr(
    s"array_union(array(code), transform(" +
      s"filter(sequence(0, ${bits - 1}), j -> (code & shiftleft(1L, j)) = 0), " +
      "j -> code | shiftleft(1L, j)))")

  /** Exact brute-force cosine top-k picks for the probe set (the q35
    * frame): probes broadcast, corpus scanned once, per-probe top-k via
    * window rank. Also the in-query truth side of the q36/q51/q64
    * self-checks. */
  def exactTopK(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    val e = embs(s, d)
    val probes = e.filter(col("vec_id") < NumProbes)
      .select(col("vec_id").as("a_id"), col("embedding").as("ea"))
    val corpus = e.select(col("vec_id").as("b_id"), col("embedding").as("eb"))
    val w = Window.partitionBy("a_id").orderBy(col("cos_e6").desc, col("b_id"))
    broadcast(probes).join(corpus, col("a_id") =!= col("b_id"))
      .withColumn("cos_e6", cosE6F("ea", "eb"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TopK)
      .select(col("a_id"), col("b_id"), col("rnk"), col("cos_e6"))
      .orderBy("a_id", "rnk")
  }

  /** Driver-visible self-check frame for an ANN operator: per probe, the
    * EXACT top-k summary (count, Σb_id, Σcos_e6 — all DuckDB-derivable)
    * plus `recall_ok` = 1 iff the ANN picks overlap the exact top-k in at
    * least `minOverlap` of [[TopK]] positions. The oracle recomputes the
    * exact side and pins the flag at 1 (the q44/q73 approx-self-check
    * pattern): the whole ANN stack is deterministic (fmix32 hyperplanes,
    * fixed k-means init, fixed quantizer), so the flag is a pure function
    * of the corpus — a regression in bucketing, probing, or re-ranking
    * flips it to 0 and the driver's hash compare turns red. Per-probe
    * floors are set just under the measured per-probe overlap so the
    * check is tight but not tie-flaky; the MEAN recall bounds stay
    * asserted in VectorSpec against the full pick frames. */
  private def annSelfCheck(exact: DataFrame, ann: DataFrame, minOverlap: Int): DataFrame = {
    val hits = exact.select("a_id", "b_id")
      .join(ann.select("a_id", "b_id"), Seq("a_id", "b_id"))
      .groupBy("a_id").agg(count(lit(1)).as("n_hit"))
    exact.groupBy("a_id")
      .agg(count(lit(1)).as("n_exact"),
        sum("b_id").as("exact_bsum"),
        sum("cos_e6").as("exact_sum_e6"))
      .join(hits, Seq("a_id"), "left")
      .select(col("a_id"), col("n_exact"), col("exact_bsum"), col("exact_sum_e6"),
        when(coalesce(col("n_hit"), lit(0L)) >= minOverlap, 1)
          .otherwise(0).cast("int").as("recall_ok"))
      .orderBy("a_id")
  }

  /** Raw LSH ANN top-k picks (the pre-round-7 q36 frame: a_id, b_id,
    * rnk, cos_e6). */
  def lshPicks(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    val e = embs(s, d)
    val bits = codeBits(e.count())
    val dim = e.select(size(col("embedding"))).first().getInt(0)
    val buckets = lshBuckets(e, bits, dim)
    val probes = lshBuckets(e.filter(col("vec_id") < NumProbes), bits, dim)
      .withColumnRenamed("vec_id", "a_id")
      // multi-probe expansion: the exact code + all bits hamming-1 flips
      .select(col("a_id"), col("t"), explode(multiProbe(bits)).as("code"))
    val cands = broadcast(probes)
      .join(buckets.select(col("vec_id").as("b_id"), col("t"), col("code")), Seq("t", "code"))
      .filter(col("a_id") =!= col("b_id"))
      .select("a_id", "b_id").distinct()
    val withVec = cands
      .join(e.select(col("vec_id").as("a_id"), col("embedding").as("ea")), Seq("a_id"))
      .join(e.select(col("vec_id").as("b_id"), col("embedding").as("eb")), Seq("b_id"))
    val w = Window.partitionBy("a_id").orderBy(col("cos_e6").desc, col("b_id"))
    withVec
      .withColumn("cos_e6", cosE6F("ea", "eb"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TopK)
      .select(col("a_id"), col("b_id"), col("rnk"), col("cos_e6"))
      .orderBy("a_id", "rnk")
  }

  /** Raw IVF ANN top-k picks (the pre-round-7 q51 frame). */
  def ivfPicks(s: SparkSession, d: String): DataFrame = {
    val (cents, corpusDir) = graft.pipeline.IvfIndex.ensure(s, d)
    ivfPicksAt(s, d, cents, corpusDir)
  }

  /** [[ivfPicks]] against an explicit index (centroids + cell dir) —
    * lets VectorSpec probe a freshly built-then-appended index instead
    * of the durable demo artifact. `nprobe` is the scan-fraction/recall
    * dial: 4 of 16 cells is the q51 operating point; deployments probe
    * one more cell between re-trains to offset quantizer staleness. */
  def ivfPicksAt(s: SparkSession, d: String, cents: Seq[Array[Float]],
                 corpusDir: String, nprobe: Int = 4): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    val corpus = graft.engine.Tables.parquet(s, corpusDir)
    val probes = embs(s, d).filter(col("vec_id") < NumProbes)
      .withColumn("cell", explode(graft.pipeline.IvfIndex.cellsOf(cents, nprobe)))
      .select(col("vec_id").as("a_id"), col("cell"), col("embedding").as("ea"))
    val w = Window.partitionBy("a_id").orderBy(col("cos_e6").desc, col("b_id"))
    broadcast(probes).join(corpus, Seq("cell"))
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("cos_e6", cosE6F("ea", "eb"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TopK)
      .select(col("a_id"), col("b_id"), col("rnk"), col("cos_e6"))
      .orderBy("a_id", "rnk")
  }

  /** Raw int8-SQ ANN top-k picks (the pre-round-7 q64 frame). */
  def sq8Picks(s: SparkSession, d: String): DataFrame = {
    graft.functions.VectorExpressions.register(s)
    graft.functions.QuantizeExpressions.register(s)
    val e = embs(s, d)
    def quantized(idCol: String) = e
      .select(col("vec_id").as(idCol), expr("vec_quantize(embedding)").as("qs"))
      .select(col(idCol), col("qs"),
        sqrt(expr("vec_dot_q8(qs.q, qs.scale, qs.q, qs.scale)")).as("qn"))
    val qprobes = quantized("a_id").filter(col("a_id") < NumProbes)
      .select(col("a_id"), col("qs").as("qp"), col("qn").as("qna"))
    val qcorpus = quantized("b_id")
      .select(col("b_id"), col("qs").as("qc"), col("qn").as("qnb"))
    val wq = Window.partitionBy("a_id").orderBy(col("qcos").desc, col("b_id"))
    val cands = broadcast(qprobes).join(qcorpus, col("a_id") =!= col("b_id"))
      .withColumn("qdot", expr("vec_dot_q8(qp.q, qp.scale, qc.q, qc.scale)"))
      .withColumn("qcos", when(col("qna") * col("qnb") > 0,
        col("qdot") / (col("qna") * col("qnb"))).otherwise(lit(-2.0)))
      .withColumn("qrnk", row_number().over(wq))
      .filter(col("qrnk") <= TopK * 4)
      .select("a_id", "b_id")
    // exact re-rank: float vectors fetched for the candidate set only
    val w = Window.partitionBy("a_id").orderBy(col("cos_e6").desc, col("b_id"))
    cands
      .join(broadcast(e.filter(col("vec_id") < NumProbes)
        .select(col("vec_id").as("a_id"), col("embedding").as("ea"))), Seq("a_id"))
      .join(e.select(col("vec_id").as("b_id"), col("embedding").as("eb")), Seq("b_id"))
      .withColumn("cos_e6", cosE6F("ea", "eb"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TopK)
      .select(col("a_id"), col("b_id"), col("rnk"), col("cos_e6"))
      .orderBy("a_id", "rnk")
  }

  val defs: Map[String, Q] = Map(
    // X3 baseline: exact cosine top-k per probe, probes broadcast.
    "q35_cosine_topk" -> ((s, d) => exactTopK(s, d)),

    // X3 scale path: random-hyperplane LSH buckets → candidate equi-join →
    // exact re-rank of candidates only. Hyperplanes are deterministic
    // Rademacher (±1) vectors — computed ONCE on the driver from a
    // murmur-fmix32 of (table, bit, dim) and shipped as array<float>
    // literals — so the query needs no stored model, replays identically
    // anywhere, and the per-vector coding is `bits × tables` codegen'd
    // vec_dot loops instead of millions of interpreted lambda/hash calls.
    // Code width is corpus-adaptive (see [[codeBits]]) so the candidate
    // set stays ≈ tables × bucketTarget(n) per probe at any scale; recall
    // lost to bucket boundaries is bought back with multi-probe — each
    // probe also visits every hamming-1 neighbor of its code (bits+1
    // buckets per table, ~200 lookups per probe vector at 24 bits).
    // Probes are coded from a pre-filtered 10-row frame, so the expensive
    // corpus coding pass runs exactly once (on the right side of the join).
    // Driver-visible output is the [[annSelfCheck]] frame (exact top-k
    // summary + recall_ok, floor 4/5 per probe — measured 5/5 at the
    // gated sf); the raw ANN picks stay available via [[lshPicks]], and
    // VectorSpec asserts mean recall >= 0.9 on them. The extra exact pass
    // is the same 10-broadcast-probe scan q35 runs — per-probe-bounded,
    // not quadratic; at 100 TB a deployment samples probes for the same
    // continuous recall audit.
    "q36_ann_lsh" -> ((s, d) =>
      annSelfCheck(exactTopK(s, d), lshPicks(s, d), minOverlap = 4)),

    // X3 scale path #2: IVF — the OTHER standard ANN index. A coarse
    // k-means quantizer (Lloyd iterations as pure DataFrame passes:
    // assignment = argmax of codegen vec_dot against 16 broadcast
    // centroid literals, update = the q37 posexplode-mean) partitions the
    // corpus into cells; each probe searches only its nprobe=4 nearest
    // cells and re-ranks those candidates exactly. The index is a
    // DURABLE artifact (pipeline.IvfIndex, cell-partitioned parquet —
    // build-once/query-many like the bucketed tables), so query time is
    // probe coding + a broadcast join against only the probed cells'
    // partitions. At 100 TB: centroids are KBs (always broadcastable),
    // the candidate scan is ≈ nprobe/k of the corpus per probe.
    // Deterministic: init = vectors 0..k-1, fixed iteration count.
    // Driver-visible output is the [[annSelfCheck]] frame (floor 3/5 per
    // probe — nprobe=4 of 16 cells legitimately misses boundary
    // neighbors; measured per-probe overlap at the gated sf is 3-5/5 and
    // the mean bound >= 0.85 stays asserted in VectorSpec on [[ivfPicks]]).
    "q51_ann_ivf" -> ((s, d) =>
      annSelfCheck(exactTopK(s, d), ivfPicks(s, d), minOverlap = 3)),

    // X3 storage path: int8 scalar quantization (the FAISS-SQ8 layout).
    // The corpus is quantized once into struct(scale, q: array<tinyint>)
    // — the STORED index form, 4× smaller than float32 — candidates are
    // ranked by quantized cosine entirely on the int8 column, and only
    // the top 4·k candidates per probe fetch their float vectors for
    // exact re-ranking. At 100 TB that means the ranking scan reads a
    // quarter of the bytes and the float column is touched for ~40 rows
    // per probe. Driver-visible output is the [[annSelfCheck]] frame
    // (floor 4/5 per probe — measured 5/5 at the gated sf); raw picks via
    // [[sq8Picks]], mean recall >= 0.9 asserted in VectorSpec, and the
    // ≤2% dot-product error bound in VectorExpressionsSpec.
    "q64_quantized_topk" -> ((s, d) =>
      annSelfCheck(exactTopK(s, d), sq8Picks(s, d), minOverlap = 4)),

    // X2/X3: embedding-cosine near-duplicate pairs — the vector-space
    // member of the dedup family (exact / MinHash / SimHash / embedding).
    // Same LSH machinery as q36 but as a SELF-join: every vector's
    // buckets, multi-probed on the left side, equi-joined on (table,
    // code); colliding pairs are exactly verified with the codegen
    // vec_dot and kept at cos ≥ 0.45 (the driver corpus is
    // cluster-spread, so this is same-cluster neighbor mining; a dedup
    // deployment raises τ). Never all-pairs: candidate volume ≈ tables ×
    // Σ bucket², bounded by the adaptive code width.
    //
    // Two verification paths, picked by CORPUS row count (known from the
    // bits computation). Broadcastable corpus: verify the raw collision
    // stream map-side against the broadcast embeddings and distinct only
    // the (tiny) verified output — a pair colliding in several tables
    // costs one extra codegen vec_dot, and the multi-million-candidate
    // distinct shuffle disappears entirely. Big corpus: candidates are
    // DISTINCT'd before verification, packed into one 64-bit key (valid
    // while vec_id < 2^32) so the dedup shuffle carries 8 bytes per
    // candidate, and embeddings join back BY ID for the deduped set only
    // — at 1e9 rows the join back is itself a shuffle, so paying 8
    // bytes/candidate to shrink it by the table×probe duplication factor
    // is the right trade, and the vector is never amplified through the
    // explode/join. Oracle-checked against the brute-force TRUE pair set
    // (see oracles — the multi-probe index achieves recall 1.0 at the
    // gated sfs); VectorSpec asserts the contractual precision 1.0 /
    // recall ≥ 0.9 bounds independently.
    "q49_embed_neardup" -> ((s, d) => {
      // the verify tables are build-once index artifacts (Bench
      // pre-builds them; a no-op when already bound to this corpus)
      EmbedTableStore.ensure(s, d)
      embedNeardupPairs(s, embs(s, d), tablesBound = true).orderBy("a_id", "b_id")
    }),

    // X6/X3: SEMANTIC decontamination — flag corpus vectors cosine-close
    // to the eval probe set (vec_id < NumProbes, the q35/q75 eval-set
    // stand-in). Complements q75: n-gram containment catches verbatim
    // leakage, this catches paraphrased leakage living near the eval
    // items in embedding space. Plan: one corpus scan, eval set as
    // vec_dot literals, map-side max + filter — no join, no shuffle
    // (see [[semanticContam]]). Oracle pins the exact flagged set with
    // nearest-eval attribution.
    "q92_semantic_decontam" -> ((s, d) =>
      semanticContam(embs(s, d)).orderBy("vec_id")),

    // X3/A4: elementwise per-label centroids + pairwise centroid cosine.
    "q37_label_centroids" -> ((s, d) => {
      val cent = embs(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("label", "pos")
        .agg(avg(col("x").cast("double")).as("m"))
        .groupBy("label")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("label"), expr("transform(pm, p -> p.m)").as("e"))
      val a = cent.select(col("label").as("la"), col("e").as("ea"))
      val b = cent.select(col("label").as("lb"), col("e").as("eb"))
      broadcast(a).join(b, col("la") < col("lb"))
        .select(col("la"), col("lb"), cosE6(col("ea"), col("eb")).as("cos_e6"))
        .orderBy("la", "lb")
    }))

  /** The q49 raw collision stream: upward-multi-probed LSH self-join
    * over (table, code) buckets — every candidate pair reaches the join
    * exactly once, pre-distinct. Exposed (with [[embedNeardupPairs]])
    * so the scale-stress harness can measure candidate growth. */
  private[queries] def lshSelfCollisions(e: DataFrame, n: Long): DataFrame = {
    graft.functions.VectorExpressions.register(e.sparkSession)
    val bits = codeBits(n)
    val dim = e.select(size(col("embedding"))).first().getInt(0)
    // the corpus coding pass feeds BOTH sides of the self-join; persist
    // so it runs once (same session-lifetime note as the q32 cache)
    val buckets = QueryCaches.track(lshBuckets(e, bits, dim))
    // upward-only multi-probe: same candidate set as the full hamming-1
    // ring (see upProbe) but each cross-bucket pair reaches the join
    // once, and the ~bits/2 zero-bit flips halve the exploded left side
    val left = buckets.select(col("vec_id").as("a_id"), col("t"),
      explode(upProbe(bits)).as("code"))
    // The bucket key (t, code) is packed into ONE long — t in the high
    // bits, the ≤[[MaxBits]]-bit code in the low — so the broadcast
    // hash join below builds a dense LongHashedRelation instead of the
    // generic row-keyed relation; at ~500 matches out per probe row the
    // per-probe relation machinery is the enumeration's constant factor.
    def packTC(df: DataFrame) = df.withColumn("tc",
      shiftleft(col("t").cast("long"), 32).bitwiseOR(col("code")))
    // BROADCAST the un-exploded bucket side whenever it fits (n × tables
    // rows of 24 bytes — ~190 MB even at the 1M-vector broadcast cap):
    // the collision stream is hundreds-to-thousands of rows OUT per row
    // IN, and a sort-merge join pays per-output-row buffered-iterator
    // work for exactly that shape, while a broadcast hash join streams
    // the matches inside whole-stage codegen, fused with the downstream
    // pre-gate filter — and drops the explode side's shuffle entirely.
    // Past the cap the equi-join shuffles on tc like any big join; the
    // candidate mass per vector is the same either way.
    val right = packTC(buckets.select(col("vec_id").as("b_id"), col("t"), col("code")))
      .select("b_id", "tc")
    if (n <= BroadcastRows) {
      // EXPLICIT fan-out of the probe side first: its input partitioning
      // is the corpus scan's (a handful of files), and AQE sizes
      // shuffles by INPUT bytes — blind to the ~500-rows-out-per-row-in
      // blow-up through this join — so without this the whole collision
      // stream runs on a few tasks. An explicit numPartitions is
      // respected by AQE; the 12.8M-row probe shuffle is noise next to
      // the 0.65B-row output it balances.
      packTC(left).select("a_id", "tc")
        .repartition(left.sparkSession.sessionState.conf.numShufflePartitions)
        .join(broadcast(right), Seq("tc"))
        .filter(col("a_id") =!= col("b_id"))
    } else
      packTC(left).select("a_id", "tc").join(right, Seq("tc"))
        .filter(col("a_id") =!= col("b_id"))
  }

  /** q92 kernel: flag corpus vectors within [[SemContamE6]] cosine of
    * ANY eval vector, returning (vec_id, label, eval_id, max_cos_e6)
    * for the flagged sliver — eval_id is the nearest eval item
    * (cos desc, id asc on ties), the audit trail a scrub report needs.
    *
    * Scale shape: the eval frame is collected on the driver (BOUNDED by
    * construction — an eval benchmark is thousands of items, KBs–MBs;
    * same discipline as the IVF centroids and the q36 hyperplanes) and
    * shipped as float-array literals inside codegen `vec_dot` calls, so
    * the plan is scan → per-row max over |eval| dots → map-side filter.
    * No join, no shuffle, no per-corpus-row state: at 100 TB the cost is
    * one corpus scan regardless of how the corpus is partitioned, and
    * only flagged rows (the contamination report) reach the output sort.
    * An eval set too big for literals would ride a driver-registered
    * table (the [[graft.functions.CosByIdExpr]] path q49 uses) — the
    * corpus side never changes.
    *
    * Float literals are rendered via `Float.toString`, which round-trips
    * exactly through the SQL double literal → FLOAT cast; the driver-side
    * eval norm accumulates left-to-right in double like `vec_dot` and
    * DuckDB's `list_sum`, keeping the e6 rounding bit-identical to the
    * oracle's. */
  private[queries] def semanticContam(e: DataFrame): DataFrame = {
    graft.functions.VectorExpressions.register(e.sparkSession)
    val evalRows = e.filter(col("vec_id") < NumProbes)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getAs[scala.collection.Seq[Float]](1)))
      .sortBy(_._1)
    require(evalRows.nonEmpty, "semanticContam: empty eval probe set")
    val cands = evalRows.map { case (id, v) =>
      val arrSql = v.map(x => s"CAST(${x.toString} AS FLOAT)")
        .mkString("array(", ",", ")")
      val nrm = math.sqrt(v.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
      val cos = round(expr(s"vec_dot(embedding, $arrSql)")
        / (sqrt(expr("vec_dot(embedding, embedding)")) * lit(nrm))
        * lit(1000000.0)).cast("long")
      // negated id: array_max is lexicographic on (cos, ni), so ties
      // resolve to the LOWEST eval id deterministically
      struct(cos.as("c"), lit(-id).as("ni"))
    }
    e.filter(col("vec_id") >= NumProbes)
      .withColumn("best", array_max(array(cands.toIndexedSeq: _*)))
      .filter(col("best.c") >= SemContamE6)
      .select(col("vec_id"), col("label"),
        (-col("best.ni")).cast("int").as("eval_id"),
        col("best.c").as("max_cos_e6"))
  }

  /** Embedding near-dup pair kernel (the q49 body, minus the final
    * sort). `tablesBound` = the caller already ran [[EmbedTableStore
    * .ensure]] for THIS corpus (the artifact lifecycle); false = build
    * and register the driver verify tables inline (ad-hoc corpora). */
  private[queries] def embedNeardupPairs(s: SparkSession, e: DataFrame,
                                         tablesBound: Boolean = false): DataFrame = {
      graft.functions.VectorExpressions.register(s)
      val n = e.count()
      val rawPairs = lshSelfCollisions(e, n)
      // Per-vector norms are computed ONCE per vector, not per candidate
      // pair — verification is then one dot + a divide per pair. Both
      // paths' arithmetic is bit-identical to the join + vec_dot form.
      def side(idCol: String, vecCol: String, nCol: String) =
        e.select(col("vec_id").as(idCol), col("embedding").as(vecCol),
          sqrt(expr("vec_dot(embedding, embedding)")).as(nCol))
      val pairCos = round(expr("vec_dot(ea, eb)") / (col("na") * col("nb"))
        * lit(1000000.0)).cast("long")
      val verified =
        if (n <= BroadcastRows) {
          // join-free: the corpus rides inside the codegen cos_by_id /
          // qcos_by_id expressions (driver-resident tables, one ship per
          // executor). Two-phase verification, the q64 shape applied to
          // the collision stream:
          //   1. QUANTIZED PRE-GATE, per collision, BEFORE the distinct:
          //      one int8 dot against the 4×-smaller SQ8 table drops
          //      every pair whose cosine cannot reach the threshold
          //      (conservative margin — see QGateMarginE6), so the
          //      collision mass that reaches the pair-key distinct is
          //      the near-threshold sliver, not the full bucket
          //      cross-product (0.65B rows at the x100 tier);
          //   2. exact float re-rank once per UNIQUE surviving pair.
          // The gate runs map-side inside the collision-producing stage —
          // no extra shuffle — and cannot change the verified output.
          if (!tablesBound) {
            val table = graft.functions.CosByIdExpr.build(e.select("vec_id", "embedding"))
            graft.functions.CosByIdExpr.register(s, table)
            graft.functions.QuantCosByIdExpr.register(s,
              graft.functions.QuantCosByIdExpr.buildFrom(table))
          }
          rawPairs
            .filter(expr("qcos_by_id(a_id, b_id)") >= lit(450000L - QGateMarginE6))
            .select(shiftleft(least(col("a_id"), col("b_id")), 32)
              .bitwiseOR(greatest(col("a_id"), col("b_id"))).as("pk"))
            .distinct()
            // unsigned shift: see the big-corpus path below
            .select(shiftrightunsigned(col("pk"), 32).as("a_id"),
              col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("b_id"))
            .withColumn("cos_e6", expr("cos_by_id(a_id, b_id)"))
            .filter(col("cos_e6") >= 450000)
            .select("a_id", "b_id", "cos_e6")
        } else {
          // Beyond the broadcast cap the float corpus cannot ride a
          // driver table, so verification joins back by id. The same
          // two-phase shape still applies at that scale — the SQ8 code
          // table is 4× smaller than the corpus, so a deployment
          // quantizes DISTRIBUTED and broadcasts just the codes to
          // pre-gate the collision stream before this distinct; the
          // exact join-back then sees only the near-threshold sliver.
          val cands = rawPairs
            .select(shiftleft(least(col("a_id"), col("b_id")), 32)
              .bitwiseOR(greatest(col("a_id"), col("b_id"))).as("pk"))
            .distinct()
            // unsigned shift: an a_id in [2^31, 2^32) sets pk's sign bit,
            // and an arithmetic shift would sign-extend it into a negative id
            .select(shiftrightunsigned(col("pk"), 32).as("a_id"),
              col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("b_id"))
          cands
            .join(side("a_id", "ea", "na"), Seq("a_id"))
            .join(side("b_id", "eb", "nb"), Seq("b_id"))
            .withColumn("cos_e6", pairCos)
            .filter(col("cos_e6") >= 450000)
            .select("a_id", "b_id", "cos_e6")
        }
      verified
  }

  /** Shared oracle CTE: exact per-probe top-k, identical to the q35
    * oracle (cos desc, b_id tiebreak). */
  private def exactTopKSql: String =
    s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                   FROM embeddings),
        n AS (SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x*x))) AS nrm FROM v),
        pairs AS (
          SELECT p.vec_id AS a_id, c.vec_id AS b_id,
                 CAST(ROUND(list_sum(list_transform(range(1, len(p.e) + 1), i -> p.e[i] * c.e[i]))
                      / (p.nrm * c.nrm) * 1000000) AS BIGINT) AS cos_e6
          FROM n p JOIN n c ON p.vec_id < $NumProbes AND c.vec_id <> p.vec_id),
        ranked AS (
          SELECT a_id, b_id, cos_e6,
                 ROW_NUMBER() OVER (PARTITION BY a_id ORDER BY cos_e6 DESC, b_id) AS rnk
          FROM pairs)"""

  /** The q36/q51/q64 self-check oracle: exact top-k summary per probe +
    * the recall flag pinned at 1 (q44/q73 pattern). */
  private def annSelfCheckSql: String =
    s"""$exactTopKSql
        SELECT a_id, COUNT(*) AS n_exact, CAST(SUM(b_id) AS BIGINT) AS exact_bsum,
               CAST(SUM(cos_e6) AS BIGINT) AS exact_sum_e6, CAST(1 AS INT) AS recall_ok
        FROM ranked WHERE rnk <= $TopK GROUP BY a_id ORDER BY a_id"""

  val oracles: Map[String, String] = Map(
    "q36_ann_lsh" -> annSelfCheckSql,
    "q51_ann_ivf" -> annSelfCheckSql,
    "q64_quantized_topk" -> annSelfCheckSql,
    // q49: the oracle is the brute-force TRUE pair set (rounded-threshold
    // filter, identical to the engine's). This pins precision AND recall
    // at exactly 1.0 — measured true at the gated scale factors; the LSH
    // contract is only recall >= 0.9 (VectorSpec), so if a future corpus
    // drops a boundary pair this row turns red while the operator still
    // meets its spec bound — that is the desired hard-signal behavior.
    "q49_embed_neardup" ->
      """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                    FROM embeddings),
         n AS (SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x*x))) AS nrm FROM v),
         p AS (
           SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                  CAST(ROUND(list_sum(list_transform(range(1, len(a.e) + 1), i -> a.e[i] * b.e[i]))
                       / (a.nrm * b.nrm) * 1000000) AS BIGINT) AS cos_e6
           FROM n a JOIN n b ON a.vec_id < b.vec_id)
         SELECT a_id, b_id, cos_e6 FROM p WHERE cos_e6 >= 450000 ORDER BY a_id, b_id""",
    // q92: brute-force recompute of the flagged set — max cosine to any
    // eval vector with nearest-eval attribution (cos desc, id asc).
    "q92_semantic_decontam" ->
      s"""WITH v AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                     FROM embeddings),
          n AS (SELECT vec_id, label, e, sqrt(list_sum(list_transform(e, x -> x*x))) AS nrm FROM v),
          pc AS (
            SELECT c.vec_id, c.label, p.vec_id AS eval_id,
                   CAST(ROUND(list_sum(list_transform(range(1, len(p.e) + 1), i -> p.e[i] * c.e[i]))
                        / (p.nrm * c.nrm) * 1000000) AS BIGINT) AS cos_e6
            FROM n c JOIN n p ON p.vec_id < $NumProbes AND c.vec_id >= $NumProbes),
          best AS (
            SELECT vec_id, label, eval_id, cos_e6,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos_e6 DESC, eval_id) AS rnk
            FROM pc)
          SELECT vec_id, label, CAST(eval_id AS INT) AS eval_id, cos_e6 AS max_cos_e6
          FROM best WHERE rnk = 1 AND cos_e6 >= $SemContamE6 ORDER BY vec_id""",
    "q35_cosine_topk" ->
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                     FROM embeddings),
          n AS (SELECT vec_id, e, sqrt(list_sum(list_transform(e, x -> x*x))) AS nrm FROM v),
          pairs AS (
            SELECT p.vec_id AS a_id, c.vec_id AS b_id,
                   CAST(ROUND(list_sum(list_transform(range(1, len(p.e) + 1), i -> p.e[i] * c.e[i]))
                        / (p.nrm * c.nrm) * 1000000) AS BIGINT) AS cos_e6
            FROM n p JOIN n c ON p.vec_id < $NumProbes AND c.vec_id <> p.vec_id),
          ranked AS (
            SELECT a_id, b_id, cos_e6,
                   CAST(ROW_NUMBER() OVER (PARTITION BY a_id ORDER BY cos_e6 DESC, b_id) AS INT) AS rnk
            FROM pairs)
          SELECT a_id, b_id, rnk, cos_e6 FROM ranked WHERE rnk <= $TopK ORDER BY a_id, rnk""",
    "q37_label_centroids" ->
      """WITH ex AS (SELECT label, i AS pos, CAST(embedding[i] AS DOUBLE) AS x
                     FROM embeddings, range(1, 65) t(i)),
          cent AS (SELECT label, pos, AVG(x) AS m FROM ex GROUP BY 1, 2),
          vec AS (SELECT label, list(m ORDER BY pos) AS e FROM cent GROUP BY 1)
          SELECT a.label AS la, b.label AS lb,
                 CAST(ROUND(list_sum(list_transform(range(1, 65), i -> a.e[i] * b.e[i]))
                      / (sqrt(list_sum(list_transform(a.e, x -> x*x)))
                         * sqrt(list_sum(list_transform(b.e, x -> x*x)))) * 1000000) AS BIGINT) AS cos_e6
          FROM vec a JOIN vec b ON a.label < b.label
          ORDER BY la, lb""")
}
