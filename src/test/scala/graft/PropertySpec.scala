package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.RawJsonReader

/** SURVEY.md §5.4 property-based coverage (ScalaCheck generators with a
  * pinned seed, so every run checks the same cases — no flaky sampling):
  *  - JSON→Parquet round-trip preserves values and types through the
  *    permissive contract-merged read;
  *  - exact dedup (X1 kernel) is idempotent;
  *  - the MinHash Jaccard estimate honors its concentration bound
  *    (64 hashes ⇒ σ ≤ 1/16) on known-similarity pairs.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(seed + i)))

  test("JSON round-trip preserves values through the contract-merged permissive read") {
    import spark.implicits._
    val recGen = for {
      id <- Gen.identifier.map(_.take(12))
      n <- Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)
      x <- Gen.chooseNum(-1e12, 1e12)
      s <- Gen.asciiPrintableStr.map(_.take(40))
      arr <- Gen.listOfN(3, Gen.chooseNum(-1000L, 1000L))
    } yield (id, n, x, s, arr)
    val rows = sample(recGen, 80, seed = 7L).distinctBy(_._1)
    val df = rows.toDF("id", "n", "x", "s", "arr")
    val dir = Files.createTempDirectory("graft-prop").toString
    df.coalesce(1).write.mode("overwrite").json(s"$dir/raw")

    val contract = StructType(Seq(
      StructField("id", StringType), StructField("n", LongType),
      StructField("x", DoubleType), StructField("s", StringType),
      StructField("arr", ArrayType(LongType))))
    // cache() before a corrupt-column-only query — the §4.3 P2 rule
    // applies to tests too (Spark refuses corrupt-only projections on
    // raw file scans)
    val back = RawJsonReader.read(spark, Seq(s"$dir/raw"), contract).cache()
    assert(back.filter(col(RawJsonReader.CorruptCol).isNotNull).count() == 0)
    val got = back.select("id", "n", "x", "s", "arr")
      .as[(String, Long, Double, String, Seq[Long])].collect().toSet
    assert(got == rows.map(t => (t._1, t._2, t._3, t._4, t._5.toSeq)).toSet)
  }

  test("exact dedup is idempotent and keeps one representative per distinct text") {
    import spark.implicits._
    val textGen = Gen.listOfN(8, Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))
      .map(_.mkString(" "))
    val texts = sample(textGen, 120, seed = 11L) // few distinct values → many dups
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    def dedup(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("text").agg(min("doc_id").as("doc_id")).select("doc_id", "text")
    val once = dedup(docs).collect().toSet
    val twice = dedup(dedup(docs)).collect().toSet
    assert(once == twice)
    assert(once.size == texts.distinct.size)
  }

  test("MinHash Jaccard estimate concentrates around the exact value (64 hashes)") {
    import spark.implicits._
    // pairs with controlled overlap: |A|=40 shingles, B shares k of them
    val pairs = (0 until 60).map { p =>
      val k = p % 41
      val a = (0 until 40).map(i => s"sh-$p-$i")
      val b = (0 until k).map(i => s"sh-$p-$i") ++ (0 until (40 - k)).map(i => s"other-$p-$i")
      (p.toLong, a, b, k.toDouble / (80 - k)) // exact Jaccard = k / (|A|+|B|-k)
    }
    val df = pairs.toDF("pid", "sha", "shb", "jexact")
    val minhashEq = (0 until 64).map { j =>
      (array_min(transform(col("sha"), x => xxhash64(lit(j), x))) ===
        array_min(transform(col("shb"), x => xxhash64(lit(j), x)))).cast("int")
    }.reduce(_ + _).cast("double") / 64.0
    val got = df.select(col("pid"), col("jexact"), minhashEq.as("jest"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    // 4σ bound per pair (σ = sqrt(J(1-J)/64) ≤ 1/16) and a tight mean
    assert(got.forall { case (je, js) => math.abs(je - js) <= 0.25 },
      s"outlier: ${got.filter { case (je, js) => math.abs(je - js) > 0.25 }.take(3).toSeq}")
    val meanErr = got.map { case (je, js) => math.abs(je - js) }.sum / got.length
    assert(meanErr < 0.08, s"mean |err| $meanErr")
  }

  test("q107 top-gram mode matches a first-principles recount, ties included") {
    import spark.implicits._
    // Small alphabet forces heavy gram repetition AND frequent count
    // ties, exercising exactly the cross-engine tie rule the oracle
    // depends on (max count, then lexicographically greatest gram).
    val docGen = for {
      n <- Gen.chooseNum(3, 24)
      toks <- Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "d"))
    } yield toks
    val docs = sample(docGen, 120, seed = 41L)
    val df = docs.zipWithIndex
      .map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = Files.createTempDirectory("graft-q107-prop").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.CurationOps.defs("q107_top_ngram_chars")(spark, dir)
      .select("doc_id", "top2_cnt", "top2_gram", "chars_top2", "n_chars")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getLong(3))).toMap
    def expected(toks: Seq[String]): (Long, String, Long) = {
      val g2 = toks.sliding(2).map(_.mkString(" ")).toSeq
      val byCnt = g2.groupBy(identity).view.mapValues(_.size).toMap
      val topCnt = byCnt.values.max
      val topGram = byCnt.collect { case (g, c) if c == topCnt => g }.max
      (topCnt.toLong, topGram, topCnt.toLong * topGram.length)
    }
    docs.zipWithIndex.foreach { case (toks, i) =>
      assert(got(i.toLong) === expected(toks),
        s"doc $i (${toks.mkString(" ")}): expression and recount disagree")
    }
  }

  test("q107 long-doc guard: a 50k-token mostly-unique doc completes in bounded time") {
    import spark.implicits._
    // ~50k DISTINCT grams is the adversarial shape for any
    // distinct×filter counting (O(L²) ≈ 2.5e9 lambda evals — minutes on
    // one row); the shipped single-pass sorted run-length mode is
    // O(L log L) and finishes in seconds. Plant one gram 50 times so
    // the answer is a closed form, not just "it returned".
    val toks = (0 until 50000).map { i =>
      if (i % 1000 == 0) "p" else if (i % 1000 == 1) "q" else s"t$i"
    }
    val df = Seq((0L, toks.mkString(" ")))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = Files.createTempDirectory("graft-q107-long").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val t0 = System.nanoTime()
    val row = graft.queries.CurationOps.defs("q107_top_ngram_chars")(spark, dir)
      .select("top2_cnt", "top2_gram", "chars_top2")
      .collect().head
    val secs = (System.nanoTime() - t0) / 1e9
    assert(row.getLong(0) === 50L && row.getString(1) === "p q" &&
      row.getLong(2) === 150L, s"unexpected mode: $row")
    assert(secs < 30.0, f"50k-token doc took $secs%.1f s — per-row mode is not O(L log L)")
  }

  test("media decoders are total: random and mutated payloads never throw") {
    val rnd = new scala.util.Random(42)
    // pure-random byte arrays of many sizes
    val randoms = (0 until 400).map { i =>
      val b = new Array[Byte](rnd.nextInt(200)); rnd.nextBytes(b); b
    }
    // valid payloads with one mutated byte (header-adjacent corruption
    // is likelier to hit parser edge cases than pure noise)
    val mutated = (0 until 400).map { i =>
      val base = (i % 3) match {
        case 0 => graft.queries.ImageDecode.pngBytes(16 + i, 16 + i)
        case 1 => graft.queries.ImageDecode.bmpBytes(16 + i, 16 + i)
        case _ => graft.queries.AudioDecode.wavBytes(8000, 1, 100, 160)
      }
      if (base.nonEmpty) base(rnd.nextInt(base.length)) = rnd.nextInt(256).toByte
      base
    }
    // truncations of a valid payload at every prefix length
    val wav = graft.queries.AudioDecode.wavBytes(16000, 2, 300, 320)
    val truncated = (0 until wav.length).map(wav.take(_))
    (randoms ++ mutated ++ truncated).foreach { b =>
      val h = graft.queries.ImageDecode.parseHeader(b)
      assert(h != null && (h.err != null || h.fmt != null))
      val m = graft.queries.AudioDecode.parseWav(b)
      assert(m != null && (m.err != null || m.fmt == "wav"))
    }
  }
}
