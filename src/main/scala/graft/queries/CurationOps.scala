package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.Tables

/** Training-data curation operators over `documents` (SURVEY.md §2.10
  * north-star: the ops a large-scale LLM training pipeline runs after
  * dedup/quality scoring to turn a corpus into a training set).
  *
  * All six are pure column algebra — deterministic, oracle-checked
  * against DuckDB, and shuffle-minimal by construction:
  *
  *  - q66 split assignment: hash-based train/val/test. `md5(doc_id)` is
  *    stateless and reproducible — the split of any doc is decidable in
  *    isolation, so assignment is a scan-only projection (no shuffle, no
  *    stored split table, stable under corpus growth — the properties
  *    that make hash-splits the standard over random sampling).
  *  - q67 sequence packing: concat-and-chunk packing of docs into
  *    fixed token budgets. Packing is inherently sequential, so it runs
  *    per-SHARD (16 md5 shards): each shard's cumulative-sum window is
  *    independent — at 100 TB this is an embarrassingly parallel window
  *    per shard, never a global single-partition window.
  *  - q68 PII redaction: regex email/phone scrub with audit counts. The
  *    corpus text carries no PII (synthetic), so deterministic fake PII
  *    is appended per-doc first; the redaction+audit pass is the real
  *    operator. Scan-only: no shuffle before the per-lang audit agg.
  *  - q69 mixture sampling: per-source weighted downsampling via md5
  *    threshold — the "data mixture" step that reweights sources before
  *    training. Scan-only filter; rates are exact in expectation and
  *    deterministic per doc (re-runs select the SAME docs, unlike
  *    `sample()`).
  *  - q70 curation pipeline: quality gate → exact dedup (min doc_id per
  *    text hash) → split assignment → per-(split, source) accounting.
  *    One hash shuffle (the dedup row_number) + one agg shuffle.
  *  - q71 repetition filter: duplicate 2-/3-gram fraction per doc (the
  *    Gopher repetition quality signal). Per-row only — no shuffle.
  *  - q74 near-dup curation FLAGSHIP: q70 plus the near-duplicate stage —
  *    MinHash-LSH edges over the deduped representatives, transitive
  *    closure to duplicate groups, keep the min-id representative.
  *  - q75 benchmark decontamination: n-gram CONTAINMENT of each training
  *    doc against a held-out eval set (the GPT-3/PaLM-style test-set
  *    overlap scrub — asymmetric, unlike Jaccard: a doc that swallows a
  *    whole benchmark item is contaminated no matter how much else it
  *    contains). Eval-set grams are broadcast (benchmark suites are
  *    MB-scale even against a 100 TB corpus), the corpus is scanned
  *    once, and only (doc_id, n_hit) rows reach the aggregate — the
  *    same probe-bounded gram-join shape as q33.
  *  - q93 gate calibration sweep: survivors (docs AND tokens) at every
  *    rung of a fixed threshold grid, in ONE corpus scan — conditional
  *    partial aggregates collapse map-side, so the tuning table that
  *    answers "where does the gate meet my token budget" costs a scan,
  *    not a pipeline re-run per candidate threshold.
  *
  * Token counts reuse the whitespace idiom hash-matched since q27/q28
  * (`size(split(text, ' '))` ≡ DuckDB `len(string_split(text, ' '))`).
  */
object CurationOps {
  type Q = (SparkSession, String) => DataFrame
  private def docs(s: SparkSession, d: String) = Tables.load(s, d, "documents")

  private def nTokens(c: Column): Column = size(split(c, " ")).cast("long")

  /** First k lowercase-hex chars of md5(doc_id) — the deterministic
    * per-doc randomness source. Identical bytes in Spark and DuckDB
    * (both hash the UTF-8 of the decimal string), so hex-prefix string
    * compares agree across engines. */
  private def idHex(k: Int): Column =
    substring(md5(col("doc_id").cast("string")), 1, k)

  /** 75/12.5/12.5 split on the first hex nibble: 0-b train, c-d val,
    * e-f test. */
  private def splitCol: Column =
    when(idHex(1) < "c", "train").when(idHex(1) < "e", "val").otherwise("test")

  private val PackBudget = 512 // tokens per packed sequence

  /** Keep threshold for [[withQualityScore]]: score >= 0 passes. At the
    * calibrated weights, 0 sits near the 2nd percentile of the corpus
    * score distribution — the gate drops only the clearly degenerate
    * tail (repetition-heavy / stopword-free / pathological token
    * lengths), never the bulk. */
  val QualityMinE6 = 0L

  /** q85 keep threshold: mean bigram probability >= 0.03 (e6). Real docs
    * on the driver corpus score ~26k-41k under the en-slice reference
    * model; out-of-vocabulary token soup scores ~0 (no reference hit
    * contributes), so the gate separates gibberish from language by a
    * wide margin (CurationSpec plants both). */
  val FluencyMinE6 = 30000L

  /** q87 per-source token budget (the selection unit recipes actually
    * state). Sized so the driver corpus part-fills every source: the
    * greedy fill stops mid-source, exercising the budget boundary. */
  val TokenBudget = 1000L

  /** q93 calibration grid (e6 units): the gate thresholds the sweep
    * reports survivors at. Fixed literals — a data-derived grid would
    * make the report (and its oracle) corpus-dependent. 0..1e6 step 1e5
    * spans the scorer's observed mass on this corpus (min ≈ −0.45e6,
    * median ≈ 0.49e6, max ≈ 1.08e6 across the gated sfs), so every row
    * is non-degenerate: survivors shrink monotonically and the top rung
    * still keeps at least one doc. */
  val CalibrationGridE6: Seq[Long] = (0L to 1000000L by 100000L).toSeq

  /** q91 decontamination threshold: containment >= 15% drops the doc.
    * q75's 5% is the right benchmark-scrub default, but this synthetic
    * corpus shares its generator vocabulary so 5% flags ~82% of it
    * (q75's own numbers) and would starve every later recipe stage;
    * at 15% each stage has real survivors AND real drops, and the
    * budget fill still hits its boundary. */
  val RecipeContamE6 = 150000L

  /** Per-doc `quality_score_e6` — the scorer hook for the curation gate
    * (q70/q74), exposed standalone as q77. A linear model over the
    * q29/q71 quality signals with fixed calibrated weights mirroring
    * the sign structure of the published heuristics (C4/Gopher:
    * stopword presence is evidence of natural language; repeated
    * bigrams and extreme mean token lengths are evidence of boilerplate
    * or garbage; very short docs carry little signal):
    *
    *   score_e6 = 2*stop_ratio_e6 - 3*dup2_e6
    *              - |tok_len_e6 - 5e6| div 5 + 10000*min(n_tokens, 100)
    *
    * Everything after the per-feature e6 rounding (the q29/q71 idiom,
    * hash-matched since those rows) is EXACT bigint arithmetic, so the
    * gate thresholds identically in Spark and the DuckDB oracle — a
    * sigmoid would rank identically but compare doubles across two libm
    * implementations at the threshold boundary. Helper columns are
    * q_-prefixed; callers select away what they don't need. Scan-only:
    * no shuffle, composes into any gate at any scale.
    *
    * The raw signals come from the codegen
    * [[graft.functions.QualityFeatures]] expression (one compiled byte
    * walk; parity with the portable HOF forms in QualityFeaturesSpec) —
    * the portable forms re-ran `split(text)` per feature term through
    * interpreted lambdas when inlined into q70's gate predicate,
    * measured at 0.27 s → 2.5 s warm at sf0.1. */
  def withQualityScore(df: DataFrame): DataFrame =
    withQualityScoreOn(df, col("text"))

  /** [[withQualityScore]] over an ARBITRARY text column — the form the
    * ingest-time quality gate ([[graft.pipeline.QualityGate]]) needs,
    * where the text lives in a nested payload field rather than a
    * top-level `text` column. One definition of the score formula; the
    * q77 surface and the ingest gate cannot drift apart. */
  def withQualityScoreOn(df: DataFrame, text: Column): DataFrame = {
    graft.functions.QualityFeatures.register(df.sparkSession)
    df.withColumn("q_f", call_function("quality_features", text))
      .withColumn("q_n", col("q_f.n_tokens"))
      .withColumn("q_stop_e6",
        round(col("q_f.n_stop").cast("double") * 1000000 / col("q_n")).cast("long"))
      .withColumn("q_toklen_e6",
        round(col("q_f.nospace").cast("double") * 1000000 / col("q_n")).cast("long"))
      .withColumn("q_dup2_e6", when(col("q_n") >= 2,
        round((lit(1.0) - col("q_f.bi_distinct").cast("double") / (col("q_n") - 1))
          * 1000000).cast("long"))
        .otherwise(0L))
      .withColumn("quality_score_e6",
        lit(2L) * col("q_stop_e6") - lit(3L) * col("q_dup2_e6")
          - expr("abs(q_toklen_e6 - 5000000) div 5")
          + lit(10000L) * least(col("q_n"), lit(100L)))
  }

  val defs: Map[String, Q] = Map(
    // Deterministic hash split + per-split accounting.
    "q66_split_assign" -> ((s, d) => {
      docs(s, d)
        .withColumn("split", splitCol)
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(nTokens(col("text"))).as("n_tokens"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy("split")
    }),

    // Concat-and-chunk sequence packing, parallel per md5 shard: a doc
    // belongs to the bin where its tokens START (floor(prefix/budget)),
    // which is exactly the chunk layout a sequential packer produces.
    // The shard count is the parallelism dial — each shard is one
    // independent cumulative-sum window. 16 (one hex nibble) keeps the
    // oracle output readable at test scale; a 100 TB run widens the
    // prefix (3 hex chars = 4096 shards) so no window partition holds
    // more than ~corpus/shards tokens. Nothing else changes.
    "q67_pack_sequences" -> ((s, d) => {
      val w = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs(s, d)
        .select(col("doc_id"), idHex(1).as("shard"), nTokens(col("text")).as("n_tok"))
        .withColumn("cum", sum(col("n_tok")).over(w))
        .withColumn("bin",
          floor((col("cum") - col("n_tok")) / lit(PackBudget.toDouble)).cast("long"))
        .groupBy("shard", "bin")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("n_tokens"),
          min(col("doc_id")).as("first_doc"))
        .orderBy("shard", "bin")
    }),

    // PII scrub with audit trail. Fake-but-deterministic PII is appended
    // (corpus text is synthetic words only, so patterns cannot collide
    // with natural text); the operator is the redact + audit pass.
    "q68_pii_redact" -> ((s, d) => {
      val emailPat = "[a-z0-9]+@[a-z]+\\.[a-z]+"
      val phonePat = "\\d{3}-\\d{4}"
      docs(s, d)
        .withColumn("text2", concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.com or tel 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .withColumn("n_email",
          size(regexp_extract_all(col("text2"), lit(emailPat), lit(0))).cast("long"))
        .withColumn("n_phone",
          size(regexp_extract_all(col("text2"), lit(phonePat), lit(0))).cast("long"))
        .withColumn("clean",
          regexp_replace(regexp_replace(col("text2"), emailPat, "<EMAIL>"),
            phonePat, "<PHONE>"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_email")).as("n_emails"),
          sum(col("n_phone")).as("n_phones"),
          sum((length(col("text2")) - length(col("clean"))).cast("long")).as("chars_removed"))
        .orderBy("lang")
    }),

    // Per-source weighted downsampling (data-mixture reweighting):
    // keep iff the doc's 2-hex-char bucket (256 buckets) is under the
    // source's threshold — 12.5% / 25% / 50% / 100% tiers here.
    "q69_mixture_sample" -> ((s, d) => {
      val thr = when(col("source").isin("src0", "src1", "src2"), "20")
        .when(col("source").isin("src3", "src4", "src5"), "40")
        .when(col("source").isin("src6", "src7"), "80")
        .otherwise("zz") // sorts after every hex string: keep all
      docs(s, d)
        .withColumn("keep", idHex(2) < thr)
        .groupBy("source")
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("keep"), nTokens(col("text"))).otherwise(0L)).as("kept_tokens"))
        .orderBy("source")
    }),

    // Repetition filter (the Gopher-style quality signal): fraction of
    // duplicate 2-/3-grams within each doc. Pure per-row column algebra —
    // no shuffle at all before the final sort — so it composes into any
    // scan at any scale. Docs with >5% duplicate 2-grams are flagged.
    "q71_repetition_ngrams" -> ((s, d) => {
      docs(s, d)
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 3)
        .withColumn("g2", expr(
          "transform(sequence(0, size(toks)-2), i -> concat_ws(' ', toks[i], toks[i+1]))"))
        .withColumn("g3", expr(
          "transform(sequence(0, size(toks)-3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))
        .withColumn("dup2_e6", round((lit(1.0) -
          size(array_distinct(col("g2"))).cast("double") / size(col("g2"))) * 1000000)
          .cast("long"))
        .withColumn("dup3_e6", round((lit(1.0) -
          size(array_distinct(col("g3"))).cast("double") / size(col("g3"))) * 1000000)
          .cast("long"))
        .select(col("doc_id"), col("dup2_e6"), col("dup3_e6"),
          when(col("dup2_e6") > 50000, 1L).otherwise(0L).as("flagged"))
        .orderBy("doc_id")
    }),

    // Top-n-gram concentration (the other half of the Gopher repetition
    // family next to q71): the fraction of a doc's characters covered by
    // its single most frequent word 2-/3-gram. q71 measures how many
    // grams REPEAT; this measures how much of the doc ONE gram dominates
    // — boilerplate headers and keyword-stuffed spam score high here
    // while staying under q71's duplicate-fraction radar. Per-row column
    // algebra only (the per-doc mode runs inside higher-order functions
    // over the token array), so it composes into any scan at any scale.
    // The per-doc mode is a single pass over the SORTED gram array —
    // sort, then one `aggregate` counting run lengths — O(L log L) per
    // document, so an MB-scale web doc costs a sort, not the O(L²)
    // lambda storm a distinct×filter count would (at 150k tokens that
    // is ~10¹⁰ evaluations on one row — a straggler-task cost bomb).
    // All outputs are INTEGERS — chars-covered numerator and n_chars
    // denominator ship separately, and the Gopher-style gates (top
    // 2-gram > 20%, top 3-gram > 18% of chars) are integer cross
    // products — so the oracle compare is exact with no float rounding.
    // Gram ties break to the lexicographically greatest gram in both
    // engines (array_max / list max over ASCII strings).
    "q107_top_ngram_chars" -> ((s, d) => {
      // Run-length mode over the sorted grams: equal grams are adjacent
      // after array_sort, so one aggregate pass tracks the current run
      // and the best-so-far. `run >= bc` (not `>`) encodes the tie rule:
      // the array is ascending, so a later run of equal count replaces
      // the best with the lexicographically GREATER gram — identical to
      // the oracle's max-over-ties.
      def topGram(g: String): String =
        s"""aggregate(array_sort($g),
           |  named_struct('prev', cast(null as string), 'run', 0L,
           |               'bc', 0L, 'bg', cast(null as string)),
           |  (a, x) -> named_struct(
           |    'prev', x,
           |    'run', if(x <=> a.prev, a.run + 1L, 1L),
           |    'bc', if(if(x <=> a.prev, a.run + 1L, 1L) >= a.bc,
           |             if(x <=> a.prev, a.run + 1L, 1L), a.bc),
           |    'bg', if(if(x <=> a.prev, a.run + 1L, 1L) >= a.bc, x, a.bg)),
           |  a -> named_struct('cnt', a.bc, 'gram', a.bg))""".stripMargin
      docs(s, d)
        .withColumn("toks", split(col("text"), " "))
        .filter(size(col("toks")) >= 3)
        .withColumn("g2", expr(
          "transform(sequence(0, size(toks)-2), i -> concat_ws(' ', toks[i], toks[i+1]))"))
        .withColumn("g3", expr(
          "transform(sequence(0, size(toks)-3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))
        .withColumn("t2", expr(topGram("g2")))
        .withColumn("t3", expr(topGram("g3")))
        .withColumn("top2_cnt", col("t2.cnt"))
        .withColumn("top2_gram", col("t2.gram"))
        .withColumn("top3_cnt", col("t3.cnt"))
        .withColumn("top3_gram", col("t3.gram"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .withColumn("chars_top2", col("top2_cnt") * length(col("top2_gram")))
        .withColumn("chars_top3", col("top3_cnt") * length(col("top3_gram")))
        .select(col("doc_id"), col("top2_cnt"), col("top2_gram"),
          col("chars_top2"), col("top3_cnt"), col("chars_top3"), col("n_chars"),
          when(col("chars_top2") * 5 > col("n_chars") ||
               col("chars_top3") * 50 > col("n_chars") * 9, 1L).otherwise(0L)
            .as("flagged"))
        .orderBy("doc_id")
    }),

    // Deterministic training-order shuffle: the pipeline's LAST stage
    // materializes the corpus in a seed-keyed pseudorandom order, so a
    // training run is reproducible doc-for-doc and the stream is
    // decorrelated from source/ingest order. The order is a TOTAL sort
    // by md5(seed:doc_id) — at 100 TB that is Spark's range-partitioned
    // distributed sort (sample → range boundaries → per-shard sorted
    // write, no single reducer), and a new epoch is just a new seed.
    // The driver-visible row pins the head of epoch0's order with an
    // explicit rank (the compare sorts rows, so order must live in a
    // VALUE): top-100 via TakeOrderedAndProject (scale-safe top-k),
    // then rank within the 100-row result — the bounded-window q03/q10
    // idiom, never a global row_number.
    "q78_train_order" -> ((s, d) => {
      val key = md5(concat(lit("epoch0:"), col("doc_id").cast("string")))
      val top = docs(s, d)
        .select(col("doc_id"), key.as("shuffle_key"))
        .orderBy("shuffle_key").limit(100)
      top.withColumn("rank",
          row_number().over(Window.orderBy("shuffle_key")).cast("long"))
        .select(col("rank"), col("doc_id"), col("shuffle_key"))
        .orderBy("rank")
    }),

    // The scorer hook standalone (see [[withQualityScore]]): per-doc
    // features + score + keep flag over the whole corpus, fully
    // oracle-recomputed. Scan-only at any scale.
    "q77_quality_scorer" -> ((s, d) => {
      withQualityScore(docs(s, d))
        .select(col("doc_id"), col("q_n").as("n_tokens"),
          col("q_stop_e6").as("stop_ratio_e6"), col("q_dup2_e6").as("dup2_e6"),
          col("q_toklen_e6").as("tok_len_e6"), col("quality_score_e6"),
          when(col("quality_score_e6") >= QualityMinE6, 1).otherwise(0)
            .cast("int").as("keep"))
        .orderBy("doc_id")
    }),

    // TRAINED quality scorer (the q31 LangModel lifecycle applied to
    // q77): logistic weights learned by [[QualityModelStore]] from weak
    // labels the fixed-weight gate supplies, scored as pure column
    // algebra over the codegen feature struct. The trained score is a
    // float ranking, not cross-engine-exact, so the driver row is the
    // q34/q44 self-check shape: the in-query evaluation computes the
    // rank-sum (Mann-Whitney) AUC of the trained score against the weak
    // labels on a BOUNDED deterministic eval sample and pins `auc_ok`
    // at 1 (trained AUC >= 0.95 — the learned ranking must reproduce
    // the heuristic gate's separation); n_scored and n_eval are exact
    // and recomputed by the DuckDB oracle (the md5-nibble sample is
    // engine-portable). CurationSpec does the planted-garbage
    // evaluation where ground truth is independent of the weak labels.
    "q84_trained_quality" -> ((s, d) => {
      val m = QualityModelStore.ensure(s, d)
      val scored = withQualityScore(docs(s, d))
        .withColumn("t_score", m.scoreCol)
        .withColumn("label",
          when(col("quality_score_e6") >= QualityMinE6, 1).otherwise(0))
      // bounded eval sample: first hex nibble of md5(doc_id) < '4' —
      // a deterministic ~25% subsample, so the global rank window below
      // is over a capped frame, never the corpus
      val eval = scored
        .filter(substring(md5(col("doc_id").cast("string")), 1, 1) < "4")
      val auc = aucOf(eval, col("t_score"), col("label"))
      scored.agg(count(lit(1)).as("n_scored"))
        .crossJoin(eval.agg(count(lit(1)).as("n_eval")))
        .crossJoin(auc.select(
          when(col("auc") >= 0.95 || col("degenerate") === 1, 1).otherwise(0)
            .cast("int").as("auc_ok")))
        .select(col("n_scored"), col("n_eval"), col("auc_ok"))
    }),

    // Reference-LM fluency filter (the CCNet/LLaMA shape: score every
    // doc under a language model trained on a trusted reference slice,
    // drop what the model finds implausible — the filter that catches
    // gibberish and boilerplate which per-doc heuristics like q77
    // cannot, because fluency is a property of token SEQUENCES, not
    // counts). The model is a bigram LM over the corpus's `lang='en'`
    // slice: p(b|a) = count(a b)/count(a ·) as exact e6 integers (the
    // q80 idiom — bit-identical across engines, where log-prob sums
    // would compare libm doubles). Per doc: mean bigram probability,
    // hit count (pairs the reference has seen — OOV-heavy docs score
    // near 0), and the keep gate at [[FluencyMinE6]].
    //
    // Scale shape: the reference slice is bounded by construction (a
    // curated corpus, MB-to-GB against 100 TB), so the model BROADCASTS
    // into the scoring join; the corpus pass is one explode + broadcast
    // hash join + per-doc re-agg whose partial aggregation collapses
    // each doc's pairs before the doc_id shuffle. No corpus-side wide
    // shuffle, no all-pairs anything.
    "q85_lm_fluency" -> ((s, d) => {
      val pairs = docs(s, d)
        .withColumn("t", split(col("text"), " "))
        .filter(size(col("t")) >= 2)
        .select(col("doc_id"), col("lang"), explode(expr(
          "transform(sequence(0, size(t) - 2), i -> struct(t[i] AS a, t[i+1] AS b))")).as("p"))
        .select(col("doc_id"), col("lang"), col("p.a").as("a"), col("p.b").as("b"))
      val ref = pairs.filter(col("lang") === "en")
      val probs = ref.groupBy("a", "b").agg(count(lit(1)).as("cb"))
        .join(ref.groupBy("a").agg(count(lit(1)).as("ca")), Seq("a"))
        .withColumn("p_e6",
          round(col("cb").cast("double") * 1000000 / col("ca")).cast("long"))
        .select("a", "b", "p_e6")
      pairs.join(broadcast(probs), Seq("a", "b"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_pairs"),
          count(col("p_e6")).as("n_hit"),
          round(sum(coalesce(col("p_e6"), lit(0L))).cast("double") / count(lit(1)))
            .cast("long").as("fluency_e6"))
        .withColumn("keep",
          when(col("fluency_e6") >= FluencyMinE6, 1).otherwise(0).cast("int"))
        .orderBy("doc_id")
    }),

    // Per-source token-BUDGET selection (the mixture step stated in
    // tokens, as training recipes state it — "N tokens from source X" —
    // where q69 reweights by doc fraction): docs are taken in the
    // deterministic md5 order until the source's budget is exhausted;
    // the doc that crosses the line is included (greedy fill). Output
    // is the per-source account plus the md5 of the selected id list,
    // so the oracle pins the exact selection, not just its size. The
    // fill kernel is [[budgetFill]], shared with the q91 recipe.
    "q87_token_budget" -> ((s, d) => {
      budgetFill(docs(s, d)
          .select(col("doc_id"), col("source"), nTokens(col("text")).as("n_tok")),
          TokenBudget, "graft87:")
        .groupBy("source")
        .agg(count(lit(1)).as("n_sel"),
          sum(col("n_tok")).as("tok_sel"),
          md5(expr("array_join(transform(sort_array(collect_list(doc_id))," +
            " x -> cast(x AS string)), ',')")).as("sel_md5"))
        .orderBy("source")
    }),

    // Gate CALIBRATION sweep: for every threshold on the fixed grid,
    // how many docs and tokens survive `quality_score_e6 >= t`? This is
    // the tuning surface behind every gate choice in q70/q74/q91 —
    // "where do I set the gate to land my token budget" is answered by
    // reading this report, not by re-running the pipeline per guess.
    // Plan shape: ONE corpus scan with 2×|grid| conditional partial
    // aggregates (map-side combine reduces each partition to a single
    // row, so the shuffle is |partitions| rows regardless of corpus
    // size), then an explode of the 1-row result into the |grid|-row
    // report. No per-threshold passes, no join, no window over data.
    "q93_gate_calibration" -> ((s, d) => {
      val scored = withQualityScore(docs(s, d))
      val aggs = CalibrationGridE6.flatMap(t => Seq(
        sum(when(col("quality_score_e6") >= t, 1L).otherwise(0L)).as(s"d_$t"),
        sum(when(col("quality_score_e6") >= t, col("q_n")).otherwise(0L)).as(s"t_$t")))
      scored.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(CalibrationGridE6.map(t =>
          struct(lit(t).as("threshold_e6"), col(s"d_$t").as("n_docs"),
            col(s"t_$t").as("n_tokens"))): _*)).as("r"))
        .select(col("r.threshold_e6"), col("r.n_docs"), col("r.n_tokens"))
        .orderBy("threshold_e6")
    }),

    // The CAPSTONE recipe (see [[recipe]]).
    "q91_curation_recipe" -> ((s, d) => recipe(s, d)),

    // End-to-end curation: quality gate (bounds + the q77 scorer) →
    // exact dedup → hash split → per-(split, source) accounting.
    "q70_curation_pipeline" -> ((s, d) => {
      val rw = Window.partitionBy(md5(col("text"))).orderBy("doc_id")
      withQualityScore(docs(s, d))
        .withColumn("n_tok", col("q_n"))
        .filter(col("n_tok").between(20, 200) && col("n_chars") >= 100 &&
          col("quality_score_e6") >= QualityMinE6)
        // prune BEFORE the dedup window: without this the q_f feature
        // struct and the derived q_* helper columns ride through the
        // md5-partition shuffle (the 0.27 s → 2.5 s warm regression at
        // sf0.1 was measured on the abandoned portable-HOF scorer,
        // whose q_toks array was the worst offender; the pruning
        // matters for the codegen form too)
        .select(col("doc_id"), col("source"), col("text"), col("n_tok"))
        .withColumn("rn", row_number().over(rw))
        .filter(col("rn") === 1)
        .withColumn("split", splitCol)
        .groupBy("split", "source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
        .orderBy("split", "source")
    }),

    // The FLAGSHIP near-dup curation pipeline — the full LLM-training-set
    // shape the north star names, composed from the family's kernels:
    // quality gate (q70's) → exact dedup (q26 kernel) → MinHash-LSH
    // near-dup EDGES among the surviving representatives (q32 kernel,
    // exact-Jaccard-verified at 0.8) → transitive duplicate GROUPS (q65
    // kernel: driver union-find / distributed min-label propagation) →
    // keep the component-minimum representative → hash split (q66
    // kernel) → per-(split, source) accounting of kept docs, kept
    // tokens, and near-dup drops. Every stage is the scale-shaped form
    // verified piecewise by its own query; the doc_id < 1000 cap bounds
    // the ORACLE's recursive-CTE closure (like q65), not the operator.
    // The oracle recomputes the exact >= 0.8 Jaccard edge set — the
    // banded LSH candidates reproduce it exactly here (b=16/r=4 misses
    // a J=0.8 pair with p ~ 3e-4; a miss would split a component and
    // turn this row red, which is the desired hard signal).
    "q74_neardup_curation" -> ((s, d) => {
      val rw = Window.partitionBy(md5(col("text"))).orderBy("doc_id")
      val reps = QueryCaches.track(withQualityScore(docs(s, d)
        .filter(col("doc_id") < 1000))
        .withColumn("n_tok", col("q_n"))
        .filter(col("n_tok").between(20, 200) && col("n_chars") >= 100 &&
          col("quality_score_e6") >= QualityMinE6)
        // prune before the dedup window (see q70): no scorer arrays
        // through the md5-partition shuffle
        .select("doc_id", "source", "text", "n_tok")
        .withColumn("rn", row_number().over(rw))
        .filter(col("rn") === 1)
        .select("doc_id", "source", "text", "n_tok"))
      val sh = QueryCaches.track(DedupOps.shingled(reps))
      val edges = DedupOps.minhashEdges(s, sh, minJ = 0.8)
      val packed = QueryCaches.track(edges.select(
        shiftleft(col("a_id"), 32).bitwiseOR(col("b_id")).as("pk")))
      val labels = DedupOps.componentLabels(s, packed)
      reps.join(labels, Seq("doc_id"), "left")
        .withColumn("rep", coalesce(col("rep"), col("doc_id")))
        .withColumn("kept", col("doc_id") === col("rep"))
        .withColumn("split", splitCol)
        .groupBy("split", "source")
        .agg(sum(when(col("kept"), 1L).otherwise(0L)).as("n_docs"),
          sum(when(col("kept"), col("n_tok")).otherwise(0L)).as("n_tokens"),
          sum(when(!col("kept"), 1L).otherwise(0L)).as("n_neardup_dropped"))
        .orderBy("split", "source")
    }),

    // Benchmark decontamination: docs whose 3-gram CONTAINMENT vs the
    // eval set (doc_id < 50 stands in for a benchmark suite) reaches 5%.
    // Both engines filter on the ROUNDED e6 value so the threshold
    // boundary is computed identically.
    "q75_decontaminate" -> ((s, d) => {
      // persist the shingled corpus (QueryCaches lifetime, the q33
      // pattern): the explode then iterates MATERIALIZED arrays instead
      // of re-evaluating the transform+distinct shingle expression on
      // both sides of the Project/Generate boundary — measured 7.0 s →
      // sub-second warm at sf0.1 without it vs with it
      val sh = QueryCaches.track(DedupOps.shingled(docs(s, d)))
      val benchGrams = sh.filter(col("doc_id") < 50)
        .select(explode(col("sh")).as("g")).distinct()
      // ONE corpus scan: n_grams rides through the explode (8 bytes/gram
      // against a broadcast hash probe — cheaper than a second shingle
      // pass + join-back), and only gram-matching rows reach the agg
      sh.filter(col("doc_id") >= 50)
        .select(col("doc_id"), size(col("sh")).cast("long").as("n_grams"),
          explode(col("sh")).as("g"))
        .join(broadcast(benchGrams), Seq("g"))
        .groupBy("doc_id", "n_grams").agg(count(lit(1)).as("n_hit"))
        .withColumn("contam_e6",
          round(col("n_hit") * lit(1000000.0) / col("n_grams")).cast("long"))
        .filter(col("contam_e6") >= 50000)
        .select("doc_id", "n_grams", "n_hit", "contam_e6")
        .orderBy("doc_id")
    }))

  /** Greedy per-source token-budget fill in the deterministic md5
    * order — the q87 kernel, returning the SELECTED rows with the
    * input's columns. Input must carry (doc_id, source, n_tok).
    *
    * Scale shape — TWO-PHASE shard split, because the naive form (one
    * running-sum window per source) serializes each source into a
    * single sort partition, and at 100 TB one source can be most of
    * the corpus. The md5 order is refined by its own prefix: shard =
    * first 2 hex chars of rk, so global md5 order == (shard, rk)
    * order. Phase 1 aggregates per-(source, shard) token sums (256
    * tiny rows per source) and computes each shard's STARTING offset
    * with a window over that bounded frame. Phase 2 joins the offsets
    * back (broadcast — sources × 256 rows) and runs the running-sum
    * window per (source, shard): 256× the parallelism, each partition
    * 1/256th of the source, and the doc's global cum_before is
    * shard_offset + intra-shard prefix. Byte-identical output to the
    * single-window form; CurationSpec checks against an independent
    * greedy recompute. */
  private def budgetFill(df: DataFrame, budget: Long, salt: String): DataFrame = {
    val base = df
      .withColumn("rk", md5(concat(lit(salt), col("doc_id").cast("string"))))
      .withColumn("shard", substring(col("rk"), 1, 2))
    val shardOffsets = base.groupBy("source", "shard")
      .agg(sum("n_tok").as("sh_tok"))
      .withColumn("sh_off", coalesce(
        sum("sh_tok").over(Window.partitionBy("source").orderBy("shard")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      // shards whose offset is already past the budget cannot select
      // anything — prune them before the per-shard window
      .filter(col("sh_off") < budget)
      .select("source", "shard", "sh_off")
    val wIntra = Window.partitionBy("source", "shard").orderBy("rk", "doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(shardOffsets), Seq("source", "shard"))
      .withColumn("cum_before",
        col("sh_off") + coalesce(sum(col("n_tok")).over(wIntra), lit(0L)))
      .filter(col("cum_before") < budget)
      .drop("rk", "shard", "sh_off", "cum_before")
  }

  /** q91 — the CAPSTONE: the end-to-end training-set recipe the north
    * star describes ("ML training data platform", sudo_code.txt:1),
    * composed from the family's individually-verified kernels in the
    * order a production curation run applies them:
    *
    *   1. quality gate (q77 scorer + q70 bounds) over the corpus with
    *      the held-out eval set (doc_id < 50, the q75 stand-in)
    *      excluded;
    *   2. exact dedup — min doc_id per md5(text) (q26/q70 kernel);
    *   3. benchmark decontamination — drop docs whose 3-gram
    *      containment vs the eval set reaches [[RecipeContamE6]]
    *      (q75 kernel; the eval grams broadcast);
    *   4. near-dup dedup — MinHash-LSH edges at J >= 0.8, transitive
    *      closure, keep the component-minimum rep (q32/q65/q74
    *      kernels). This is the batch recompute form; at ingest the
    *      same semantics run incrementally via [[graft.pipeline
    *      .DedupStage]] against the durable index (q82/q83);
    *   5. per-source token-budget selection ([[budgetFill]], q87);
    *   6. deterministic training order — the q78 epoch shuffle key.
    *
    * Output: one row per source accounting every gated doc's fate
    * (gated / exact-dup / contaminated / near-dup / selected) plus
    * `order_md5`, the md5 of the SELECTED ids concatenated in training
    * order — so the oracle pins the entire manifest, not a prefix.
    * Every stage is the scale-shaped form its own query verified:
    * scan-only gate, one hash shuffle for the dedup window, broadcast
    * gram probe, banded LSH (never all-pairs), edge-capped closure,
    * two-phase budget windows, and an aggregate whose per-source state
    * is the selected-id list (bounded by the token budget). */
  def recipe(s: SparkSession, d: String): DataFrame = {
    // GRAFT_DEBUG: force each cached stage boundary separately so the
    // per-stage cost split is visible (the frames are persisted, so the
    // forced actions are not double-charged to the final plan)
    def dbg[A](tag: String)(f: => A): Unit =
      if (sys.env.contains("GRAFT_DEBUG")) {
        val t0 = System.nanoTime()
        f
        System.err.println(f"[q91] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    val rw = Window.partitionBy(md5(col("text"))).orderBy("doc_id")
    val gated = QueryCaches.track(
      withQualityScore(docs(s, d).filter(col("doc_id") >= 50))
        .withColumn("n_tok", col("q_n"))
        .filter(col("n_tok").between(20, 200) && col("n_chars") >= 100 &&
          col("quality_score_e6") >= QualityMinE6)
        // prune before the dedup window (q70): no scorer arrays through
        // the md5-partition shuffle
        .select(col("doc_id"), col("source"), col("text"), col("n_tok"))
        .withColumn("rn", row_number().over(rw)))
    dbg("gate+exact-dedup")(gated.count())
    val reps = gated.filter(col("rn") === 1).select("doc_id", "source", "text", "n_tok")
    val sh = QueryCaches.track(DedupOps.shingled(reps))
    dbg("shingle")(sh.count())
    val benchGrams = DedupOps.shingled(docs(s, d).filter(col("doc_id") < 50))
      .select(explode(col("sh")).as("g")).distinct()
    // TRACKED: the contaminated-id set is tiny but costs a full
    // gram-explode scan, and it feeds THREE consumers (the shClean
    // anti-join — which minhashEdges' candidate + two verify branches
    // each re-evaluate — the `clean` join, and the final accounting
    // join); uncached it re-ran per branch and dominated the recipe's
    // overhead over its parts (round-11 brief #4: 8.25 s vs ~3 s).
    val contam = QueryCaches.track(sh
      .select(col("doc_id"), size(col("sh")).cast("long").as("n_grams"),
        explode(col("sh")).as("g"))
      .join(broadcast(benchGrams), Seq("g"))
      .groupBy("doc_id", "n_grams").agg(count(lit(1)).as("n_hit"))
      .filter(round(col("n_hit") * lit(1000000.0) / col("n_grams")).cast("long")
        >= RecipeContamE6)
      .select(col("doc_id"), lit(1L).as("is_contam")))
    dbg("decontam")(contam.count())
    val shClean = sh.join(broadcast(contam.select("doc_id")), Seq("doc_id"), "left_anti")
    val packed = QueryCaches.track(DedupOps.minhashEdges(s, shClean, minJ = 0.8)
      .select(shiftleft(col("a_id"), 32).bitwiseOR(col("b_id")).as("pk")))
    dbg("lsh-edges")(packed.count())
    val labels = DedupOps.componentLabels(s, packed)
    dbg("closure")(labels.count())
    // contam and labels are id-lists bounded by the contaminated /
    // edge-touched doc counts — broadcast both joins so the reps/gated
    // side never shuffles for them
    val clean = reps
      .join(broadcast(contam), Seq("doc_id"), "left")
      .join(broadcast(labels), Seq("doc_id"), "left")
      .filter(col("is_contam").isNull &&
        coalesce(col("rep"), col("doc_id")) === col("doc_id"))
      .select("doc_id", "source", "n_tok")
    val sel = budgetFill(clean, TokenBudget, "graft91:")
      .select(col("doc_id"), lit(1L).as("is_sel"),
        md5(concat(lit("epoch0:"), col("doc_id").cast("string"))).as("shuffle_key"))
    gated
      .join(broadcast(contam), Seq("doc_id"), "left")
      .join(broadcast(labels), Seq("doc_id"), "left")
      .join(broadcast(sel), Seq("doc_id"), "left")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_gated"),
        sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_exact_dup"),
        sum(when(col("rn") === 1 && col("is_contam").isNotNull, 1L).otherwise(0L))
          .as("n_contaminated"),
        sum(when(col("rn") === 1 && col("is_contam").isNull &&
          coalesce(col("rep"), col("doc_id")) =!= col("doc_id"), 1L).otherwise(0L))
          .as("n_neardup"),
        sum(when(col("is_sel").isNotNull, 1L).otherwise(0L)).as("n_sel"),
        sum(when(col("is_sel").isNotNull, col("n_tok")).otherwise(0L)).as("tok_sel"),
        md5(expr("array_join(transform(array_sort(collect_list(" +
          "CASE WHEN is_sel IS NOT NULL THEN struct(shuffle_key, doc_id) END))," +
          " x -> cast(x.doc_id AS string)), ',')")).as("order_md5"))
      .orderBy("source")
  }

  /** Oracle mirror of [[withQualityScore]]: scored documents with
    * (doc_id, source, text, n_chars, n_tok, stop_e6, dup2_e6,
    * toklen_e6, score_e6). Everything after the per-feature e6
    * rounding is bigint arithmetic (`//` = integer division on the
    * abs(), matching Spark's `div` for non-negative operands). */
  private val ScoredDocsSql =
    """SELECT doc_id, source, text, n_chars, n_tok, stop_e6, dup2_e6, toklen_e6,
         2*stop_e6 - 3*dup2_e6 - abs(toklen_e6 - 5000000)//5
           + 10000*least(n_tok, 100) AS score_e6
       FROM (
         SELECT doc_id, source, text, n_chars, len(tk) AS n_tok,
           CAST(ROUND(CAST(len(list_filter(tk,
               t -> t IN ('the','a','of','and','to','in'))) AS DOUBLE)
             * 1000000 / len(tk)) AS BIGINT) AS stop_e6,
           CAST(ROUND(CAST(len(replace(text, ' ', '')) AS DOUBLE)
             * 1000000 / len(tk)) AS BIGINT) AS toklen_e6,
           CASE WHEN len(tk) >= 2 THEN
             CAST(ROUND((1.0 - CAST(len(list_distinct(
                 [tk[i] || ' ' || tk[i+1] FOR i IN range(1, len(tk))])) AS DOUBLE)
               / (len(tk) - 1)) * 1000000) AS BIGINT)
           ELSE 0 END AS dup2_e6
         FROM (SELECT doc_id, source, text, n_chars,
                      string_split(text, ' ') AS tk FROM documents) t0) t1"""

  private val SplitSql =
    """CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' THEN 'train'
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e' THEN 'val'
            ELSE 'test' END"""

  /** Rank-sum (Mann-Whitney U) AUC of `score` ranking binary `label`,
    * tie-corrected via average ranks — one row (auc, degenerate). The
    * rank is ONE GLOBAL WINDOW over `df`: callers pass a bounded eval
    * frame (a hash subsample, a fixture), never the corpus. `degenerate`
    * = 1 when either class is empty (AUC undefined; reported as 1.0 so
    * self-check flags stay pinned on tiny fixtures). */
  private[queries] def aucOf(df: DataFrame, score: Column, label: Column): DataFrame = {
    val ranked = df.select(score.as("s"), label.as("y"))
      .withColumn("r", row_number().over(Window.orderBy(col("s"))))
    val avgR = ranked.groupBy("s").agg(avg(col("r")).as("ar"))
    ranked.join(avgR, "s")
      .agg(sum(col("y")).as("np"),
        sum(lit(1) - col("y")).as("nn"),
        sum(when(col("y") === 1, col("ar"))).as("sr"))
      .select(
        when(col("np") * col("nn") === 0, 1).otherwise(0)
          .cast("int").as("degenerate"),
        when(col("np") * col("nn") === 0, lit(1.0)).otherwise(
          (col("sr") - col("np") * (col("np") + lit(1)) / lit(2.0)) /
            (col("np") * col("nn"))).as("auc"))
  }

  val oracles: Map[String, String] = Map(
    // q84: the exact columns (doc counts; the md5-nibble eval sample is
    // engine-portable) plus the pinned self-check flag — the float AUC
    // itself is in-query only (q34/q44 pattern).
    "q84_trained_quality" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_scored,
                CAST(SUM(CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '4'
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_eval,
                CAST(1 AS INT) AS auc_ok
         FROM documents""",
    // q85: the bigram model is recomputed from the same en slice the
    // query trains on (deterministic), so the oracle pins every doc's
    // exact e6 fluency and the gate flag — a model/scoring drift on
    // either side hash-mismatches.
    "q85_lm_fluency" ->
      s"""WITH tok AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
          pairs AS (
            SELECT doc_id, lang, t[i] AS a, t[i+1] AS b
            FROM tok, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
            WHERE len(t) >= 2),
          model AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS cb
                    FROM pairs WHERE lang = 'en' GROUP BY 1, 2),
          ctx AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS ca
                  FROM pairs WHERE lang = 'en' GROUP BY 1),
          probs AS (SELECT a, b,
                      CAST(ROUND(CAST(cb AS DOUBLE) * 1000000 / ca) AS BIGINT) AS p_e6
                    FROM model JOIN ctx USING (a)),
          scored AS (
            SELECT p.doc_id,
              CAST(COUNT(*) AS BIGINT) AS n_pairs,
              CAST(COUNT(m.p_e6) AS BIGINT) AS n_hit,
              CAST(ROUND(CAST(SUM(COALESCE(m.p_e6, 0)) AS DOUBLE) / COUNT(*)) AS BIGINT)
                AS fluency_e6
            FROM pairs p LEFT JOIN probs m ON m.a = p.a AND m.b = p.b
            GROUP BY 1)
          SELECT doc_id, n_pairs, n_hit, fluency_e6,
            CAST(CASE WHEN fluency_e6 >= $FluencyMinE6 THEN 1 ELSE 0 END AS INT) AS keep
          FROM scored ORDER BY doc_id""",
    "q87_token_budget" ->
      s"""WITH base AS (
            SELECT doc_id, source,
              CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
              md5('graft87:' || CAST(doc_id AS VARCHAR)) AS rk
            FROM documents),
          c AS (
            SELECT *, COALESCE(SUM(n_tok) OVER (PARTITION BY source
                ORDER BY rk, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
            FROM base)
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sel,
                 CAST(SUM(n_tok) AS BIGINT) AS tok_sel,
                 md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)) AS sel_md5
          FROM c WHERE cum_before < $TokenBudget GROUP BY 1 ORDER BY 1""",
    // q93: the same scored frame, surviving docs/tokens per grid rung.
    "q93_gate_calibration" ->
      s"""WITH g AS (SELECT UNNEST([${CalibrationGridE6.mkString(",")}]) AS t)
          SELECT CAST(g.t AS BIGINT) AS threshold_e6,
                 CAST(SUM(CASE WHEN sd.score_e6 >= g.t THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
                 CAST(SUM(CASE WHEN sd.score_e6 >= g.t THEN sd.n_tok ELSE 0 END) AS BIGINT) AS n_tokens
          FROM g, ($ScoredDocsSql) sd GROUP BY g.t ORDER BY threshold_e6""",
    "q66_split_assign" ->
      s"""SELECT $SplitSql AS split, COUNT(*) AS n_docs,
          CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
          COUNT(DISTINCT source) AS n_sources
          FROM documents GROUP BY 1 ORDER BY 1""",
    "q67_pack_sequences" ->
      s"""WITH t AS (
            SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
                   len(string_split(text, ' ')) AS n_tok
            FROM documents),
          c AS (
            SELECT doc_id, shard, n_tok,
                   SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM t)
          SELECT shard, CAST(FLOOR((cum - n_tok) / $PackBudget.0) AS BIGINT) AS bin,
                 COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
                 MIN(doc_id) AS first_doc
          FROM c GROUP BY 1, 2 ORDER BY 1, 2""",
    "q68_pii_redact" ->
      """WITH p AS (
           SELECT lang,
                  text || ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@mail.com or tel 555-'
                       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text2
           FROM documents),
         r AS (
           SELECT lang, text2,
                  len(regexp_extract_all(text2, '[a-z0-9]+@[a-z]+\.[a-z]+')) AS n_email,
                  len(regexp_extract_all(text2, '\d{3}-\d{4}')) AS n_phone,
                  regexp_replace(regexp_replace(text2,
                    '[a-z0-9]+@[a-z]+\.[a-z]+', '<EMAIL>', 'g'),
                    '\d{3}-\d{4}', '<PHONE>', 'g') AS clean
           FROM p)
         SELECT lang, COUNT(*) AS n_docs,
                CAST(SUM(n_email) AS BIGINT) AS n_emails,
                CAST(SUM(n_phone) AS BIGINT) AS n_phones,
                CAST(SUM(length(text2) - length(clean)) AS BIGINT) AS chars_removed
         FROM r GROUP BY 1 ORDER BY 1""",
    "q69_mixture_sample" ->
      """WITH t AS (
           SELECT source, len(string_split(text, ' ')) AS n_tok,
                  substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS h2,
                  CASE WHEN source IN ('src0','src1','src2') THEN '20'
                       WHEN source IN ('src3','src4','src5') THEN '40'
                       WHEN source IN ('src6','src7') THEN '80'
                       ELSE 'zz' END AS thr
           FROM documents)
         SELECT source, COUNT(*) AS n_total,
                CAST(SUM(CASE WHEN h2 < thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                CAST(SUM(CASE WHEN h2 < thr THEN n_tok ELSE 0 END) AS BIGINT) AS kept_tokens
         FROM t GROUP BY 1 ORDER BY 1""",
    "q71_repetition_ngrams" ->
      """WITH t AS (
           SELECT doc_id, string_split(text, ' ') AS tk FROM documents
           WHERE len(string_split(text, ' ')) >= 3),
         g AS (
           SELECT doc_id,
                  [tk[i] || ' ' || tk[i+1] FOR i IN range(1, len(tk))] AS g2,
                  [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                   FOR i IN range(1, len(tk) - 1)] AS g3
           FROM t),
         r AS (
           SELECT doc_id,
                  CAST(ROUND((1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2))
                    * 1000000) AS BIGINT) AS dup2_e6,
                  CAST(ROUND((1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3))
                    * 1000000) AS BIGINT) AS dup3_e6
           FROM g)
         SELECT doc_id, dup2_e6, dup3_e6,
                CAST(CASE WHEN dup2_e6 > 50000 THEN 1 ELSE 0 END AS BIGINT) AS flagged
         FROM r ORDER BY doc_id""",
    "q107_top_ngram_chars" ->
      """WITH t AS (
           SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents
           WHERE len(string_split(text, ' ')) >= 3),
         g AS (
           SELECT doc_id, text,
                  [tk[i] || ' ' || tk[i+1] FOR i IN range(1, len(tk))] AS g2,
                  [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                   FOR i IN range(1, len(tk) - 1)] AS g3
           FROM t),
         m AS (
           SELECT doc_id, text, g2, g3,
                  list_aggregate(list_transform(list_distinct(g2),
                    x -> len(list_filter(g2, y -> y = x))), 'max') AS top2_cnt,
                  list_aggregate(list_transform(list_distinct(g3),
                    x -> len(list_filter(g3, y -> y = x))), 'max') AS top3_cnt
           FROM g),
         r AS (
           SELECT doc_id,
                  CAST(top2_cnt AS BIGINT) AS top2_cnt,
                  list_aggregate(list_filter(list_distinct(g2),
                    x -> len(list_filter(g2, y -> y = x)) = top2_cnt), 'max')
                    AS top2_gram,
                  CAST(top3_cnt AS BIGINT) AS top3_cnt,
                  list_aggregate(list_filter(list_distinct(g3),
                    x -> len(list_filter(g3, y -> y = x)) = top3_cnt), 'max')
                    AS top3_gram,
                  CAST(len(text) AS BIGINT) AS n_chars
           FROM m)
         SELECT doc_id, top2_cnt, top2_gram,
                top2_cnt * len(top2_gram) AS chars_top2,
                top3_cnt,
                top3_cnt * len(top3_gram) AS chars_top3,
                n_chars,
                CAST(CASE WHEN top2_cnt * len(top2_gram) * 5 > n_chars
                            OR top3_cnt * len(top3_gram) * 50 > n_chars * 9
                          THEN 1 ELSE 0 END AS BIGINT) AS flagged
         FROM r ORDER BY doc_id""",
    "q78_train_order" ->
      """SELECT CAST(ROW_NUMBER() OVER (ORDER BY md5('epoch0:' || CAST(doc_id AS VARCHAR)))
                AS BIGINT) AS rank,
              doc_id,
              md5('epoch0:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
         FROM documents ORDER BY shuffle_key LIMIT 100""",
    "q77_quality_scorer" ->
      s"""SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
            stop_e6 AS stop_ratio_e6, dup2_e6, toklen_e6 AS tok_len_e6,
            CAST(score_e6 AS BIGINT) AS quality_score_e6,
            CAST(CASE WHEN score_e6 >= $QualityMinE6 THEN 1 ELSE 0 END AS INTEGER) AS keep
          FROM ($ScoredDocsSql) sd ORDER BY doc_id""",
    "q70_curation_pipeline" ->
      s"""WITH base AS (
            SELECT doc_id, source, text, n_tok
            FROM ($ScoredDocsSql) sd
            WHERE n_tok BETWEEN 20 AND 200 AND n_chars >= 100
              AND score_e6 >= $QualityMinE6),
          ded AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
            FROM base)
          SELECT $SplitSql AS split, source, COUNT(*) AS n_docs,
                 CAST(SUM(n_tok) AS BIGINT) AS n_tokens
          FROM ded WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""",
    "q74_neardup_curation" ->
      s"""WITH RECURSIVE
           base AS (
             SELECT doc_id, source, text, n_tok
             FROM ($ScoredDocsSql) sd
             WHERE doc_id < 1000
               AND n_tok BETWEEN 20 AND 200 AND n_chars >= 100
               AND score_e6 >= $QualityMinE6),
           ded AS (
             SELECT doc_id, source, text, n_tok FROM (
               SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
               FROM base) x WHERE rn = 1),
           tok AS (
             SELECT doc_id, unnest(list_distinct(sh)) AS g FROM (
               SELECT doc_id, string_split(text, ' ') AS t,
                 [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                  FOR i IN range(1, len(string_split(text, ' ')) - 1)] AS sh
               FROM ded) x),
           sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY 1),
           inter AS (
             SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS i
             FROM tok a JOIN tok b ON a.g = b.g AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
           edges AS (
             SELECT a, b FROM inter
             JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
             WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8),
           sym AS (SELECT a, b FROM edges UNION ALL SELECT b, a FROM edges),
           walk(id, r) AS (
             SELECT doc_id, doc_id FROM ded
             UNION
             SELECT s.b, w.r FROM walk w JOIN sym s ON s.a = w.id),
           labs AS (SELECT id AS doc_id, MIN(r) AS rep FROM walk GROUP BY 1),
           j AS (
             SELECT d.doc_id AS doc_id, d.source AS source, d.n_tok AS n_tok, l.rep AS rep
             FROM ded d JOIN labs l ON l.doc_id = d.doc_id)
         SELECT $SplitSql AS split, source,
                CAST(SUM(CASE WHEN rep = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
                CAST(SUM(CASE WHEN rep = doc_id THEN n_tok ELSE 0 END) AS BIGINT) AS n_tokens,
                CAST(SUM(CASE WHEN rep <> doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_neardup_dropped
         FROM j GROUP BY 1, 2 ORDER BY 1, 2""",
    // q91: the full recipe recomputed from first principles — the q70
    // gate, the q75 containment CTE, the q74 exact-Jaccard recursive
    // closure, the q87 single-window budget fill (equivalent to the
    // two-phase form by the shard-prefix argument), and the q78 order
    // key — chained. string_agg's ORDER BY includes doc_id as the
    // tiebreak to mirror Spark's struct sort.
    "q91_curation_recipe" ->
      s"""WITH RECURSIVE
           gated AS (
             SELECT doc_id, source, text, n_tok,
               ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
             FROM ($ScoredDocsSql) sd
             WHERE doc_id >= 50
               AND n_tok BETWEEN 20 AND 200 AND n_chars >= 100
               AND score_e6 >= $QualityMinE6),
           reps AS (SELECT doc_id, source, text, n_tok FROM gated WHERE rn = 1),
           tokr AS (
             SELECT doc_id, unnest(list_distinct(sh)) AS g FROM (
               SELECT doc_id, string_split(text, ' ') AS t,
                 [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                  FOR i IN range(1, len(string_split(text, ' ')) - 1)] AS sh
               FROM reps) x),
           toke AS (
             SELECT DISTINCT unnest(list_distinct(sh)) AS g FROM (
               SELECT string_split(text, ' ') AS t,
                 [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                  FOR i IN range(1, len(string_split(text, ' ')) - 1)] AS sh
               FROM documents WHERE doc_id < 50) x),
           sizes AS (SELECT doc_id, COUNT(*) AS n FROM tokr GROUP BY 1),
           contam AS (
             SELECT s.doc_id FROM sizes s JOIN (
               SELECT c.doc_id, COUNT(*) AS n_hit
               FROM tokr c JOIN toke b ON c.g = b.g GROUP BY 1) h
               ON h.doc_id = s.doc_id
             WHERE CAST(ROUND(h.n_hit * 1000000.0 / s.n) AS BIGINT) >= $RecipeContamE6),
           ded AS (SELECT * FROM reps
                   WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
           inter AS (
             SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS i
             FROM tokr a JOIN tokr b ON a.g = b.g AND a.doc_id < b.doc_id
             WHERE a.doc_id IN (SELECT doc_id FROM ded)
               AND b.doc_id IN (SELECT doc_id FROM ded)
             GROUP BY 1, 2),
           edges AS (
             SELECT a, b FROM inter
             JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
             WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8),
           sym AS (SELECT a, b FROM edges UNION ALL SELECT b, a FROM edges),
           walk(id, r) AS (
             SELECT doc_id, doc_id FROM ded
             UNION
             SELECT s.b, w.r FROM walk w JOIN sym s ON s.a = w.id),
           labs AS (SELECT id AS doc_id, MIN(r) AS rep FROM walk GROUP BY 1),
           clean AS (
             SELECT d.doc_id, d.source, d.n_tok
             FROM ded d JOIN labs l ON l.doc_id = d.doc_id
             WHERE l.rep = d.doc_id),
           cum AS (
             SELECT *, COALESCE(SUM(n_tok) OVER (PARTITION BY source
                 ORDER BY md5('graft91:' || CAST(doc_id AS VARCHAR)), doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
             FROM clean),
           sel AS (SELECT doc_id FROM cum WHERE cum_before < $TokenBudget),
           fate AS (
             SELECT g.doc_id, g.source, g.n_tok, g.rn,
               g.doc_id IN (SELECT doc_id FROM contam) AS is_contam,
               l.rep AS rep,
               g.doc_id IN (SELECT doc_id FROM sel) AS is_sel
             FROM gated g LEFT JOIN labs l ON l.doc_id = g.doc_id)
         SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_gated,
           CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup,
           CAST(SUM(CASE WHEN rn = 1 AND is_contam THEN 1 ELSE 0 END) AS BIGINT)
             AS n_contaminated,
           CAST(SUM(CASE WHEN rn = 1 AND NOT is_contam AND rep IS NOT NULL
                          AND rep <> doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_neardup,
           CAST(SUM(CASE WHEN is_sel THEN 1 ELSE 0 END) AS BIGINT) AS n_sel,
           CAST(SUM(CASE WHEN is_sel THEN n_tok ELSE 0 END) AS BIGINT) AS tok_sel,
           md5(COALESCE(string_agg(CASE WHEN is_sel THEN CAST(doc_id AS VARCHAR) END, ','
             ORDER BY md5('epoch0:' || CAST(doc_id AS VARCHAR)), doc_id), ''))
             AS order_md5
         FROM fate GROUP BY 1 ORDER BY 1""",
    "q75_decontaminate" ->
      """WITH tok AS (
           SELECT doc_id, unnest(list_distinct(sh)) AS g FROM (
             SELECT doc_id, string_split(text, ' ') AS t,
               [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                FOR i IN range(1, len(string_split(text, ' ')) - 1)] AS sh
             FROM documents) x WHERE len(t) >= 3),
         bench AS (SELECT DISTINCT g FROM tok WHERE doc_id < 50),
         corpus AS (SELECT doc_id, g FROM tok WHERE doc_id >= 50),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM corpus GROUP BY 1),
         hits AS (
           SELECT c.doc_id, COUNT(*) AS n_hit
           FROM corpus c JOIN bench b ON c.g = b.g GROUP BY 1)
         SELECT s.doc_id, CAST(s.n AS BIGINT) AS n_grams,
                CAST(h.n_hit AS BIGINT) AS n_hit,
                CAST(ROUND(h.n_hit * 1000000.0 / s.n) AS BIGINT) AS contam_e6
         FROM sizes s JOIN hits h ON h.doc_id = s.doc_id
         WHERE CAST(ROUND(h.n_hit * 1000000.0 / s.n) AS BIGINT) >= 50000
         ORDER BY 1""")
}
