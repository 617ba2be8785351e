package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.Tables

/** Text-analysis operators over the `documents` corpus (SURVEY.md §2.10
  * X1/X4; north-star LLM-pipeline surface): exact dedup, corpus statistics,
  * token counting, quality scoring, document fingerprinting, language
  * guessing. All are pure column algebra (no UDFs) so they stay inside
  * whole-stage codegen and scale by partition count.
  */
object TextOps {
  type Q = (SparkSession, String) => DataFrame
  private def docs(s: SparkSession, d: String) = Tables.load(s, d, "documents")

  /** Stopword list used by the quality score (fixed, mirrored in oracle). */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  private def tokens(c: Column): Column = split(c, " ")

  val defs: Map[String, Q] = Map(
    // X1: exact deduplication. Content-hash the text, keep the smallest
    // doc_id per hash. One shuffle on the 256-bit hash — at 100 TB this
    // partitions evenly (hash keys) and never materializes full texts on
    // a single node.
    "q26_exact_dedup" -> ((s, d) => {
      val w = Window.partitionBy("h").orderBy("doc_id")
      docs(s, d)
        .withColumn("h", sha2(col("text"), 256))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("doc_id")
        .orderBy("doc_id")
    }),

    // Corpus-level statistics in one pass (A5/A7).
    "q27_corpus_stats" -> ((s, d) => {
      docs(s, d).agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("n_unique_text"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"),
        sum(col("n_chars")).as("sum_chars"),
        sum(size(tokens(col("text"))).cast("long")).as("sum_tokens"))
    }),

    // X4/A7: per-language token statistics.
    "q28_token_stats" -> ((s, d) => {
      docs(s, d)
        .withColumn("n_tokens", size(tokens(col("text"))).cast("long"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"),
          sum(col("n_chars")).as("sum_chars"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy("lang")
    }),

    // X4: per-document quality signals — token count, stopword ratio,
    // mean token length (scaled-integer outputs; see Cols scaladoc).
    "q29_quality_scores" -> ((s, d) => {
      docs(s, d)
        .filter(col("doc_id") < 100)
        .withColumn("toks", tokens(col("text")))
        .withColumn("n_tokens", size(col("toks")).cast("long"))
        .withColumn("n_stop",
          size(filter(col("toks"), t => t.isInCollection(Stopwords))).cast("long"))
        .withColumn("chars_nospace", length(regexp_replace(col("text"), " ", "")).cast("long"))
        .select(col("doc_id"), col("n_tokens"),
          round(col("n_stop") * lit(1000000.0) / col("n_tokens")).cast("long").as("stop_ratio_e6"),
          round(col("chars_nospace") * lit(1000000.0) / col("n_tokens")).cast("long").as("tok_len_e6"))
        .orderBy("doc_id")
    }),

    // X4: content fingerprinting (md5 of the raw text).
    "q30_fingerprints" -> ((s, d) => {
      docs(s, d)
        .filter(col("doc_id") < 200)
        .select(col("doc_id"), md5(col("text")).as("fp"))
        .orderBy("doc_id")
    }),

    // X4: character-trigram language guesser as a naive-Bayes unigram LM —
    // per-language trigram log-likelihoods with add-0.5 smoothing,
    // classify by argmax of summed log-probs. (Replaces the rank-distance
    // heuristic: 50.6% vs 29% accuracy on the overlapping-vocabulary
    // driver corpus at sf0.01; perfect on separable corpora — LangGuessSpec.)
    //
    // Scale shape: profiles are capped at the top-2000 trigrams per
    // language (the ranking window runs over the already-aggregated
    // (lang, gram) counts, orders of magnitude smaller than the corpus)
    // and broadcast; unmatched grams contribute a per-language default
    // via (n_doc − n_matched) × default, so the doc-side cost is one
    // grouped count plus a broadcast join. Log-probs are scaled to 1e-6
    // integers so score sums are order-independent — bit-identical
    // across runs and partitionings (determinism asserted in
    // LangGuessSpec). No SQL oracle (model output): rows-only.
    "q31_lang_guess" -> ((s, d) => {
      val dd = docs(s, d)
      val tri = dd.select(col("doc_id"), col("lang"),
        explode(expr(
          "transform(sequence(0, greatest(length(text)-3, 0)), i -> substring(text, i+1, 3))")).as("g"))
        .filter(length(col("g")) === 3)
      def logpE6(cnt: Column, tot: Column): Column =
        round(log((cnt + lit(0.5)) / (tot + lit(1000.0))) * 1e6).cast("long")
      // (lang, gram) counts feed BOTH the totals and the profiles; persist
      // this small aggregate (distinct grams × langs, not corpus-sized) so
      // the corpus-wide trigram explode below it runs once, not twice.
      val profCounts = tri.groupBy("lang", "g").agg(count(lit(1)).as("cnt")).persist()
      val langTot = profCounts.groupBy("lang").agg(sum(col("cnt")).as("tot"))
      val profRank = Window.partitionBy("lang").orderBy(col("cnt").desc, col("g"))
      val profiles = profCounts
        .withColumn("rn", row_number().over(profRank)).filter(col("rn") <= 2000)
        .join(langTot, Seq("lang"))
        .select(col("lang").as("p_lang"), col("g"), logpE6(col("cnt"), col("tot")).as("lp_e6"))
      val defaults = langTot
        .select(col("lang").as("p_lang"), logpE6(lit(0.0), col("tot")).as("def_e6"))
      val docG = tri.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      val docTot = docG.groupBy("doc_id").agg(sum(col("c")).as("n_doc"))
      val matched = docG.join(broadcast(profiles), Seq("g"))
        .groupBy("doc_id", "p_lang")
        .agg(sum(col("c") * col("lp_e6")).as("m_sum"), sum(col("c")).as("m_cnt"))
      val scored = docTot.crossJoin(broadcast(defaults))
        .join(matched, Seq("doc_id", "p_lang"), "left")
        .withColumn("score_e6", coalesce(col("m_sum"), lit(0L)) +
          (col("n_doc") - coalesce(col("m_cnt"), lit(0L))) * col("def_e6"))
      val best = scored.groupBy("doc_id")
        .agg(max(struct(col("score_e6").as("sc"), col("p_lang").as("pl"))).as("b"))
        .select(col("doc_id"), col("b.pl").as("guessed"))
      best.join(dd.select("doc_id", "lang"), Seq("doc_id"))
        .groupBy(col("lang"), col("guessed"))
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "guessed")
    }))

  val oracles: Map[String, String] = Map(
    "q26_exact_dedup" ->
      """SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text ORDER BY 1""",
    "q27_corpus_stats" ->
      """SELECT COUNT(*) AS n_docs, COUNT(DISTINCT text) AS n_unique_text,
         COUNT(DISTINCT lang) AS n_langs, COUNT(DISTINCT source) AS n_sources,
         CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens
         FROM documents""",
    "q28_token_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens,
         CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         COUNT(DISTINCT source) AS n_sources
         FROM documents GROUP BY 1 ORDER BY 1""",
    "q29_quality_scores" ->
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(ROUND(CAST(len(list_filter(string_split(text, ' '),
             t -> t IN ('the','a','of','and','to','in'))) AS DOUBLE) * 1000000
           / len(string_split(text, ' '))) AS BIGINT) AS stop_ratio_e6,
         CAST(ROUND(CAST(len(replace(text, ' ', '')) AS DOUBLE) * 1000000
           / len(string_split(text, ' '))) AS BIGINT) AS tok_len_e6
         FROM documents WHERE doc_id < 100 ORDER BY doc_id""",
    "q30_fingerprints" ->
      """SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id < 200 ORDER BY doc_id""")
}
