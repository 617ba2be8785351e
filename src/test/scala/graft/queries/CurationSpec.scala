package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Properties of the curation operators the DuckDB oracle cannot express:
  * partition/packing invariants, redaction completeness, and determinism
  * of the hash-based sampling (the reason hash sampling beats `sample()`
  * for training-data reproducibility).
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def docsCount: Long =
    graft.engine.Tables.load(spark, sf, "documents").count()

  test("q66 split: partitions the corpus, exactly three splits, stable across runs") {
    val a = CurationOps.defs("q66_split_assign")(spark, sf).collect()
    assert(a.map(_.getString(0)).toSet === Set("train", "val", "test"))
    assert(a.map(_.getLong(1)).sum === docsCount)
    val b = CurationOps.defs("q66_split_assign")(spark, sf).collect()
    assert(a.toSeq === b.toSeq, "hash split must be deterministic")
  }

  test("q67 packing: bins consecutive per shard, capacity bound, tokens conserved") {
    val rows = CurationOps.defs("q67_pack_sequences")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = graft.engine.Tables.load(spark, sf, "documents")
      .select(size(split(col("text"), " ")).cast("long").as("n"))
    val maxDoc = docs.agg(max("n")).first().getLong(0)
    val totalTokens = docs.agg(sum("n")).first().getLong(0)
    // PRECONDITION for the consecutive-bins assertion below: a single doc
    // longer than 2x the 512-token budget makes its successor skip a bin
    // (bin = starting offset / budget — still q67's defined semantics,
    // but the gap would fail the stricter invariant this test checks).
    // If the fixture ever grows such docs, weaken the assertion to
    // "bins non-decreasing with gaps only after over-budget docs".
    assert(maxDoc <= 2 * 512, s"fixture precondition violated: maxDoc=$maxDoc")
    // bins within a shard are 0..k consecutive (concat-and-chunk never
    // skips a chunk: each bin starts where the previous filled up)
    rows.groupBy(_._1).foreach { case (shard, bs) =>
      val ids = bs.map(_._2).sorted
      assert(ids === (0L until ids.length).toArray.toSeq,
        s"shard $shard bins not consecutive: ${ids.mkString(",")}")
    }
    // a bin holds at most budget-1 carried tokens plus one doc that
    // crosses the boundary, so its sum is < budget + maxDoc
    rows.foreach { case (shard, bin, _, toks) =>
      assert(toks < 512 + maxDoc, s"bin ($shard,$bin) overfull: $toks")
    }
    assert(rows.map(_._4).sum === totalTokens, "packing must conserve tokens")
    assert(rows.map(_._3).sum === docsCount, "packing must conserve docs")
  }

  test("q68 redaction: every doc audited, injected PII fully scrubbed") {
    val rows = CurationOps.defs("q68_pii_redact")(spark, sf).collect()
    // each doc gets exactly one email and one phone injected
    assert(rows.map(_.getLong(1)).sum === docsCount)
    assert(rows.map(_.getLong(2)).sum === docsCount, "one email per doc")
    assert(rows.map(_.getLong(3)).sum === docsCount, "one phone per doc")
    // '<EMAIL>'/'<PHONE>' are shorter than any injected match, so a
    // complete scrub strictly shrinks every doc
    assert(rows.forall(_.getLong(4) > 0), "redaction must remove characters")
    // independent completeness check: re-apply the operator's regexes to
    // the cleaned text and demand zero residual matches
    val emailPat = "[a-z0-9]+@[a-z]+\\.[a-z]+"
    val phonePat = "\\d{3}-\\d{4}"
    val residual = graft.engine.Tables.load(spark, sf, "documents")
      .withColumn("text2", concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.com or tel 555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
      .withColumn("clean",
        regexp_replace(regexp_replace(col("text2"), emailPat, "<EMAIL>"), phonePat, "<PHONE>"))
      .filter(size(regexp_extract_all(col("clean"), lit(emailPat), lit(0))) > 0 ||
        size(regexp_extract_all(col("clean"), lit(phonePat), lit(0))) > 0)
      .count()
    assert(residual === 0L, "cleaned text must contain no residual PII matches")
  }

  test("q69 mixture sampling: deterministic, bounded, keep-all tier keeps all") {
    val a = CurationOps.defs("q69_mixture_sample")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val b = CurationOps.defs("q69_mixture_sample")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(a.toSeq === b.toSeq, "hash sampling must select the same docs every run")
    a.foreach { case (src, total, kept, _) =>
      assert(kept <= total, s"$src kept more than it saw")
      val tiered = Set("src0", "src1", "src2", "src3", "src4", "src5", "src6", "src7")
      if (!tiered.contains(src)) assert(kept === total, s"$src is keep-all tier")
    }
  }

  test("q74 near-dup curation: transitive groups collapse to min-id reps, accounting conserves docs") {
    import spark.implicits._
    import java.nio.file.Files
    // 50-token base text; B = A with last token changed (3-shingle
    // Jaccard ~0.88 >= 0.8), C = B with FIRST token changed (C~B ~0.88,
    // but C~A ~0.78 < 0.8) — so {A,B,C} is one duplicate GROUP only via
    // the transitive closure through B. Doc 3 is an EXACT copy of A
    // (removed by the exact-dedup stage before near-dup ever sees it),
    // and 100..109 are unrelated singletons.
    val base = (0 until 50).map(i => s"w$i")
    val a = base.mkString(" ")
    val b = (base.dropRight(1) :+ "zlast").mkString(" ")
    val c = ("zfirst" +: base.drop(1).dropRight(1) :+ "zlast").mkString(" ")
    val rows = Seq((0L, a), (1L, b), (2L, c), (3L, a)) ++
      (100 until 110).map(i => (i.toLong, (0 until 50).map(j => s"u${i}t$j").mkString(" ")))
    val dir = Files.createTempDirectory("graft-q74").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CurationOps.defs("q74_neardup_curation")(spark, dir).collect()
    val kept = out.map(_.getLong(2)).sum
    val dropped = out.map(_.getLong(4)).sum
    // 13 reps after exact dedup (0,1,2 + 10 singletons); the {0,1,2}
    // group elects rep 0, so 2 near-dup drops and 11 kept
    assert(kept === 11L, s"kept $kept, rows: ${out.mkString(";")}")
    assert(dropped === 2L, s"dropped $dropped")
    assert(out.map(_.getString(0)).toSet.subsetOf(Set("train", "val", "test")))
  }

  test("q75 decontamination: verbatim benchmark inclusion flagged, clean docs pass") {
    import spark.implicits._
    import java.nio.file.Files
    val bench = (0 until 30).map(j => s"benchtok$j").mkString(" ")
    // doc 100 swallows the whole benchmark item inside unrelated text
    // (containment ~60% of its grams), doc 101 shares only a 2-token
    // overlap (no 3-gram in common), doc 102 is fully unrelated
    val contaminated = s"prefix0 prefix1 prefix2 $bench suffix0 suffix1 suffix2"
    val brushing = s"benchtok0 benchtok1 ${(0 until 40).map(j => s"clean$j").mkString(" ")}"
    val unrelated = (0 until 40).map(j => s"other$j").mkString(" ")
    val rows = Seq((10L, bench), (100L, contaminated), (101L, brushing), (102L, unrelated))
    val dir = Files.createTempDirectory("graft-q75").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CurationOps.defs("q75_decontaminate")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out.contains(100L), s"verbatim inclusion not flagged: $out")
    assert(out(100L) >= 500000L, s"containment should be majority: ${out(100L)}")
    assert(!out.contains(101L), "2-token brush must not flag (no shared 3-gram)")
    assert(!out.contains(102L), "unrelated doc flagged")
    assert(!out.contains(10L), "benchmark doc itself must not appear (eval side)")
  }

  test("q76 span dedup: planted shared spans found, merged, disjoint runs kept apart") {
    import spark.implicits._
    import java.nio.file.Files
    // W = 20. Tokens are namespaced per doc except the planted runs, so
    // every expected row is derivable by hand:
    //  - doc 1 owns a0..a79; doc 2 embeds a20..a59 at position 5
    //    → doc 1 windows start 20..40 (span [20,60)), doc 2 start 5..25
    //    (span [5,45)), 21 windows each
    //  - doc 4 embeds a20..a44 at position 10 (starts 10..15, span
    //    [10,35)) and a40..a59 at position 65 (one window, span
    //    [65,85)); the 50-token start gap > W keeps the spans separate
    //  - doc 3 is all-unique → no rows
    def toks(p: String, r: Range) = r.map(i => s"$p$i")
    val a = toks("a", 0 until 80)
    val rows = Seq(
      1L -> a.mkString(" "),
      2L -> (toks("b", 0 until 5) ++ a.slice(20, 60) ++ toks("b", 5 until 40)).mkString(" "),
      3L -> toks("c", 0 until 50).mkString(" "),
      4L -> (toks("d", 0 until 10) ++ a.slice(20, 45) ++
        toks("d", 10 until 40) ++ a.slice(40, 60)).mkString(" "))
    val dir = Files.createTempDirectory("graft-span").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = graft.queries.DedupOps.defs("q76_span_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 20L, 60L, 21L),
      (2L, 5L, 45L, 21L),
      (4L, 10L, 35L, 6L),
      (4L, 65L, 85L, 1L)), s"got ${got.mkString(", ")}")

    // the q81 scrub on the same fixture: every planted span's tokens are
    // removed, untouched docs keep their exact bytes
    val scrub = graft.queries.DedupOps.defs("q81_span_scrub")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(scrub(1L)._1 == 80L && scrub(1L)._2 == 40L) // minus [20,60)
    assert(scrub(2L)._1 == 80L && scrub(2L)._2 == 40L) // minus [5,45)
    assert(scrub(4L)._1 == 85L && scrub(4L)._2 == 40L) // minus [10,35)+[65,85)
    val d3md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(rows(2)._2.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(scrub(3L) == ((50L, 50L, d3md5)), "span-free doc must be byte-identical")
  }

  test("q77 scorer: monotone in the quality signals, and the q70 gate uses it") {
    import spark.implicits._
    import java.nio.file.Files
    def score(texts: Seq[String]): Seq[Long] = {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      CurationOps.withQualityScore(df).orderBy("doc_id")
        .select("quality_score_e6").collect().map(_.getLong(0)).toSeq
    }
    // vary ONE signal at a time: same token count, rising repetition
    val distinct60 = (0 until 60).map(i => s"tok$i")
    val rep0 = distinct60.mkString(" ")
    val rep30 = ((0 until 30) ++ (0 until 30)).map(i => s"tok$i").mkString(" ")
    val rep60 = Seq.fill(60)("tok0").mkString(" ")
    val Seq(s0, s30, s60) = score(Seq(rep0, rep30, rep60))
    assert(s0 > s30 && s30 > s60, s"repetition must lower the score: $s0, $s30, $s60")

    // six distinct stopwords replace six distinct tokens: dup2 stays 0,
    // only stopword density (and slightly mean token length) moves
    val withStops = (graft.queries.TextOps.Stopwords ++ distinct60.drop(6)).mkString(" ")
    val Seq(sBase, sStop) = score(Seq(rep0, withStops))
    assert(sStop > sBase, s"stopword density must raise the score: $sStop <= $sBase")

    // the hook IS the gate: a degenerate doc that passes the bounds
    // gate (60 tokens, 299 chars) but scores below QualityMinE6 is
    // dropped from the q70 accounting; the clean doc survives
    assert(s0 >= CurationOps.QualityMinE6 && s60 < CurationOps.QualityMinE6)
    val dir = Files.createTempDirectory("graft-score").toString
    Seq((1L, rep0, "en", "srcA"), (2L, rep60, "en", "srcA"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CurationOps.defs("q70_curation_pipeline")(spark, dir).collect()
    assert(out.map(_.getLong(2)).sum == 1L,
      s"scorer gate must drop the degenerate doc: ${out.mkString(", ")}")
  }

  test("q84 trained scorer: deterministic retrain, AUC >= the fixed gate on planted garbage") {
    import spark.implicits._
    // ground truth INDEPENDENT of the weak labels: 60 natural-language
    // docs (stopword-bearing, varied vocabulary) vs 20 planted-garbage
    // docs (repetition-heavy, stopword-free, degenerate token lengths)
    val clean = (0 until 60).map { i =>
      val words = (0 until 40).map(j => s"word${(i * 7 + j * 3) % 97}")
      (i.toLong, s"the quick item ${words.take(20).mkString(" ")} and a " +
        s"detail of ${words.drop(20).mkString(" ")} in the set", 0)
    }
    val garbage =
      (60 until 70).map(i => (i.toLong, Seq.fill(30)(s"blob$i blob$i").mkString(" "), 1)) ++
      (70 until 80).map(i => (i.toLong, Seq.fill(40)(s"zqxj${i}wvkpt${i}mmmm").mkString(" "), 1))
    val fixture = (clean ++ garbage).toDF("doc_id", "text", "is_garbage")

    // weak labels come from the fixed-weight heuristic, truth does not
    val m1 = QualityModelStore.trainOn(fixture.select("doc_id", "text"))
    val m2 = QualityModelStore.trainOn(fixture.select("doc_id", "text"))
    assert(m1.w.toSeq == m2.w.toSeq && m1.b == m2.b,
      "retrain must be bit-identical")

    val scored = CurationOps.withQualityScore(fixture)
      .withColumn("t_score", m1.scoreCol)
      .withColumn("truth", lit(1) - col("is_garbage")) // 1 = keep-worthy
    def auc(score: org.apache.spark.sql.Column): Double =
      CurationOps.aucOf(scored, score, col("truth")).first().getDouble(1)
    val aucTrained = auc(col("t_score"))
    val aucFixed = auc(col("quality_score_e6"))
    assert(aucTrained >= aucFixed,
      s"trained AUC $aucTrained below fixed-weight AUC $aucFixed")
    assert(aucTrained >= 0.95, s"trained AUC $aucTrained")
  }

  test("q85 fluency: reference-vocabulary docs kept, OOV garbage scored to zero") {
    import spark.implicits._
    import java.nio.file.Files
    // 30 reference docs share one phrase distribution (the en slice IS
    // the training corpus); 5 garbage docs use per-doc-unique tokens, so
    // every one of their bigrams is out of vocabulary
    val phrase = "the cat sat on the mat and the dog ran to the house by the lake"
    val clean = (0L until 30L).map(i => (i, phrase, "en", "srcA"))
    val junk = (30L until 35L).map(i =>
      (i, (0 until 16).map(j => s"zx${i}q$j").mkString(" "), "xx", "srcB"))
    val dir = Files.createTempDirectory("graft-q85").toString
    (clean ++ junk).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = CurationOps.defs("q85_lm_fluency")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    assert(rows.size == 35)
    (0L until 30L).foreach { i =>
      val (nPairs, nHit, flu, keep) = rows(i)
      assert(nHit == nPairs && keep == 1 && flu >= CurationOps.FluencyMinE6,
        s"reference doc $i must pass the gate: hit=$nHit/$nPairs flu=$flu")
    }
    (30L until 35L).foreach { i =>
      val (_, nHit, flu, keep) = rows(i)
      assert(nHit == 0 && flu == 0 && keep == 0,
        s"OOV doc $i must score zero: hit=$nHit flu=$flu keep=$keep")
    }
  }

  test("q87 token budget: selection equals the greedy md5-order fill, deterministic") {
    // independent recompute of the whole semantics: md5 order per
    // source, greedy take while the pre-doc cumulative sum is under
    // budget, then compare (n_sel, tok_sel, md5-of-id-list) per source
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = graft.engine.Tables.load(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ").length.toLong))
    val expect = docs.groupBy(_._2).map { case (src, ds) =>
      val ordered = ds.map { case (id, _, n) => (md5hex(s"graft87:$id"), id, n) }
        .sortBy(t => (t._1, t._2))
      var cum = 0L
      val sel = ordered.takeWhile { case (_, _, n) =>
        val ok = cum < CurationOps.TokenBudget; cum += n; ok
      }
      src -> (sel.length.toLong, sel.map(_._3).sum,
        md5hex(sel.map(_._2).sorted.mkString(",")))
    }
    val a = CurationOps.defs("q87_token_budget")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(a == expect, s"selection mismatch: got $a expected $expect")
    val b = CurationOps.defs("q87_token_budget")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(a == b, "budget selection must be deterministic")
  }

  test("q93 calibration: rows equal per-threshold recounts of the scored frame") {
    import org.apache.spark.sql.functions._
    // first-principles: for each grid rung, re-filter the scored frame
    // and compare (n_docs, n_tokens) — the sweep's conditional-aggregate
    // form must be exactly the naive per-threshold recount
    val scored = CurationOps.withQualityScore(
        graft.engine.Tables.load(spark, sf, "documents"))
      .select(col("quality_score_e6").as("s"), col("q_n").cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = CurationOps.defs("q93_gate_calibration")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(got.map(_._1) == CurationOps.CalibrationGridE6.toList,
      s"grid mismatch: ${got.map(_._1)}")
    got.foreach { case (t, nd, nt) =>
      val surv = scored.filter(_._1 >= t)
      assert(nd == surv.length && nt == surv.map(_._2).sum,
        s"rung $t: got ($nd, $nt) expected (${surv.length}, ${surv.map(_._2).sum})")
    }
    // monotone by construction; assert anyway so a grid edit that breaks
    // the report shape (e.g. unsorted rungs) fails loudly
    assert(got.map(_._2) == got.map(_._2).sorted.reverse, "n_docs not non-increasing")
    assert(got.map(_._3) == got.map(_._3).sorted.reverse, "n_tokens not non-increasing")
    assert(got.last._2 >= 1, "top rung degenerate (no survivors)")
  }

  test("q87 boundary shapes: over-budget first doc, exact fill, tiny source") {
    import spark.implicits._
    import java.nio.file.Files
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // srcBig: one 5000-token doc — over budget alone, but greedy fill
    //   includes the doc that CROSSES the line, so it is selected.
    // srcMany: 1500 one-token docs — selection must stop at exactly
    //   budget docs (cum_before of doc k is k), exercising the
    //   two-phase shard-offset arithmetic across many md5 shards.
    // srcOne: a single 7-token doc — budget never reached, all selected.
    val rows =
      Seq((1000000L, Seq.fill(5000)("b").mkString(" "), "srcBig")) ++
      (0L until 1500L).map(i => (2000000L + i, "m", "srcMany")) ++
      Seq((3000000L, Seq.fill(7)("o").mkString(" "), "srcOne"))
    val dir = Files.createTempDirectory("graft-q87b").toString
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val expect = rows.groupBy(_._3).map { case (src, ds) =>
      val ordered = ds.map { case (id, t, _) =>
        (md5hex(s"graft87:$id"), id, t.split(" ").length.toLong) }
        .sortBy(x => (x._1, x._2))
      var cum = 0L
      val sel = ordered.takeWhile { case (_, _, n) =>
        val ok = cum < CurationOps.TokenBudget; cum += n; ok
      }
      src -> (sel.length.toLong, sel.map(_._3).sum,
        md5hex(sel.map(_._2).sorted.mkString(",")))
    }
    val got = CurationOps.defs("q87_token_budget")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got == expect, s"got $got expected $expect")
    assert(got("srcBig")._1 == 1L && got("srcBig")._2 == 5000L,
      "the crossing doc must be selected even when alone over budget")
    assert(got("srcMany")._1 == CurationOps.TokenBudget,
      "one-token docs must fill to exactly the budget")
    assert(got("srcOne")._1 == 1L && got("srcOne")._2 == 7L)
  }

  test("q91 recipe: equals a first-principles recompute of all six stages") {
    // Independent driver-side recompute of the ENTIRE recipe — scoring,
    // gate, exact dedup, containment, exact-Jaccard closure, greedy
    // budget fill, training order — sharing no code with the operator.
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val stop = Set("the", "a", "of", "and", "to", "in")
    val all = graft.engine.Tables.load(spark, sf, "documents")
      .select("doc_id", "source", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    def grams(text: String): Set[String] = {
      val t = text.split(" ")
      if (t.length < 3) Set.empty
      else (0 to t.length - 3).map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}").toSet
    }
    // stage 1: gate (q77 score recomputed from its published formula)
    val gated = all.filter { case (id, _, text, nChars) =>
      val tk = text.split(" ")
      val n = tk.length.toLong
      val stopE6 = math.round(tk.count(stop) * 1e6 / n)
      val toklenE6 = math.round(text.replace(" ", "").length * 1e6 / n)
      val dup2E6 = if (n >= 2)
        math.round((1.0 - tk.sliding(2).map(_.mkString(" ")).toSet.size.toDouble / (n - 1)) * 1e6)
      else 0L
      val score = 2 * stopE6 - 3 * dup2E6 - math.abs(toklenE6 - 5000000L) / 5 +
        10000L * math.min(n, 100L)
      id >= 50 && n >= 20 && n <= 200 && nChars >= 100 && score >= CurationOps.QualityMinE6
    }
    // stage 2: exact dedup (min id per text)
    val repIds = gated.groupBy(_._3).map(_._2.map(_._1).min).toSet
    val reps = gated.filter(t => repIds(t._1))
    // stage 3: decontamination (containment vs the eval-set grams)
    val evalGrams = all.filter(_._1 < 50).flatMap(t => grams(t._3)).toSet
    val contam = reps.filter { t =>
      val g = grams(t._3)
      math.round(g.count(evalGrams).toDouble * 1e6 / g.size) >= CurationOps.RecipeContamE6
    }.map(_._1).toSet
    // stage 4: exact-Jaccard >= 0.8 closure, min-id rep survives
    val ded = reps.filterNot(t => contam(t._1))
    val gs = ded.map(t => t._1 -> grams(t._3)).toMap
    val ids = ded.map(_._1).sorted
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (i <- ids.indices; j <- i + 1 until ids.length) {
      val (a, b) = (gs(ids(i)), gs(ids(j)))
      val inter = (a & b).size
      if (inter.toDouble / (a.size + b.size - inter) >= 0.8) {
        val (ra, rb) = (find(ids(i)), find(ids(j)))
        if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
      }
    }
    val survivors = ded.filter(t => find(t._1) == t._1)
    // stages 5+6: greedy budget fill in md5 order, then training order
    val expect = survivors.groupBy(_._2).map { case (src, ds) =>
      val ordered = ds.map { case (id, _, text, _) =>
        (md5hex(s"graft91:$id"), id, text.split(" ").length.toLong) }
        .sortBy(t => (t._1, t._2))
      var cum = 0L
      val sel = ordered.takeWhile { case (_, _, n) =>
        val ok = cum < CurationOps.TokenBudget; cum += n; ok
      }
      val inOrder = sel.map(_._2).sortBy(id => (md5hex(s"epoch0:$id"), id))
      src -> (sel.length.toLong, sel.map(_._3).sum, md5hex(inOrder.mkString(",")))
    }
    val gatedBySrc = gated.groupBy(_._2)
    val got = CurationOps.defs("q91_curation_recipe")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7))).toMap
    assert(got.keySet == gatedBySrc.keySet)
    got.foreach { case (src, (nGated, nExact, nContam, nNeardup, nSel, tokSel, orderMd5)) =>
      val g = gatedBySrc(src)
      assert(nGated == g.length, s"$src n_gated")
      assert(nExact == g.count(t => !repIds(t._1)), s"$src n_exact_dup")
      assert(nContam == g.count(t => contam(t._1)), s"$src n_contaminated")
      assert(nNeardup == g.count(t => repIds(t._1) && !contam(t._1) &&
        parent.contains(t._1) && find(t._1) != t._1), s"$src n_neardup")
      val (eSel, eTok, eMd5) = expect(src)
      assert((nSel, tokSel, orderMd5) == ((eSel, eTok, eMd5)),
        s"$src selection mismatch: got ($nSel, $tokSel, $orderMd5)")
    }
  }

  test("q107 top-gram concentration: planted repetition measured exactly, ties break high") {
    import spark.implicits._
    import java.nio.file.Files
    // doc 0: "spam ham" * 4 — 7 bigrams ("spam ham" x4, "ham spam" x3),
    // 6 trigrams in a 3-3 TIE ("spam ham spam" vs "ham spam ham", max
    // picks the s-prefixed one). n_chars = 35, chars_top2 = 4*8 = 32,
    // 32*5 > 35 -> flagged. doc 1: 50 all-distinct tokens -> every gram
    // count 1, nothing near the 20%/18% gates. doc 2: "a b c d" — all
    // bigram counts tie at 1, the mode must break to "c d" (lexicographic
    // max), pinning the cross-engine tie rule the oracle relies on.
    val rows = Seq(
      (0L, Seq.fill(4)("spam ham").mkString(" ")),
      (1L, (0 until 50).map(i => s"d1t$i").mkString(" ")),
      (2L, "a b c d"))
    val dir = Files.createTempDirectory("graft-q107").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CurationOps.defs("q107_top_ngram_chars")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    val d0 = out(0L)
    assert(d0.getLong(1) === 4L && d0.getString(2) === "spam ham")
    assert(d0.getLong(3) === 32L, "chars_top2 = cnt * len(gram)")
    assert(d0.getLong(4) === 3L && d0.getLong(5) === 39L,
      "trigram tie must resolve to 'spam ham spam' (13 chars * 3)")
    assert(d0.getLong(6) === 35L && d0.getLong(7) === 1L)
    val d1 = out(1L)
    assert(d1.getLong(1) === 1L && d1.getLong(4) === 1L && d1.getLong(7) === 0L)
    assert(out(2L).getString(2) === "c d", "all-tied bigrams break to the max")
  }

  test("q78 train order: deterministic, dense ranks, order decorrelated from doc_id") {
    val a = CurationOps.defs("q78_train_order")(spark, sf).collect()
    val b = CurationOps.defs("q78_train_order")(spark, sf).collect()
    assert(a.toSeq == b.toSeq, "seeded shuffle must be reproducible run-to-run")
    assert(a.map(_.getLong(0)).toSeq == (1L to 100L), "ranks must be dense 1..100")
    // hash order must not be doc_id order (the whole point of the shuffle)
    val ids = a.map(_.getLong(1)).toSeq
    assert(ids != ids.sorted, "shuffled head should not be in doc_id order")
  }

  test("q70 pipeline: output within gates, splits partition the kept set") {
    val rows = CurationOps.defs("q70_curation_pipeline")(spark, sf).collect()
    val kept = rows.map(_.getLong(2)).sum
    assert(kept > 0 && kept <= docsCount)
    assert(rows.map(_.getString(0)).toSet.subsetOf(Set("train", "val", "test")))
    // per-(split,source) mean tokens must respect the quality gate bounds
    rows.foreach { r =>
      val mean = r.getLong(3).toDouble / r.getLong(2)
      assert(mean >= 20 && mean <= 200, s"mean tokens $mean outside quality gate")
    }
  }
}
