package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The verification the probabilistic dedup operators promise:
  *  - q32 (MinHash-LSH) recall vs the brute-force exact-Jaccard pair set,
  *    and exact precision (every emitted pair is Jaccard-verified);
  *  - q34 (SimHash) equals the brute-force hamming<=3 pair set over
  *    distinct-text representatives — the 4x16-bit chunk bucketing is
  *    exhaustive by pigeonhole, so this is set equality, not recall;
  *  - both complete with bounded output on a boilerplate-heavy corpus
  *    (the hot-bucket skew guard).
  */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Same shingling definition the operators use (token 3-grams, distinct). */
  private def shingled(docs: DataFrame): DataFrame =
    docs.withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .withColumn("sh", array_distinct(expr(
        "transform(sequence(0, size(toks)-3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))")))
      .select("doc_id", "sh")

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  /** Brute-force exact-Jaccard >= minJ pairs (cartesian; test-scale only). */
  private def bruteJaccard(docs: DataFrame, minJ: Double): Set[(Long, Long)] = {
    val s = shingled(docs)
    val a = s.select(col("doc_id").as("a_id"), col("sh").as("sha"))
    val b = s.select(col("doc_id").as("b_id"), col("sh").as("shb"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("j",
        size(array_intersect(col("sha"), col("shb"))).cast("double") /
          size(array_union(col("sha"), col("shb"))))
      .filter(col("j") >= minJ)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("q32 MinHash-LSH: precision 1.0 and recall >= 0.95 vs brute force at sf0.001") {
    val docs = graft.engine.Tables.load(spark, sf, "documents")
    val truth = bruteJaccard(docs, 0.8)
    val got = pairSet(DedupOps.defs("q32_minhash_neardup")(spark, sf))
    assert(truth.nonEmpty, "test corpus must contain near-duplicate pairs")
    // every emitted pair is exact-verified in the query, so none may be false
    assert((got -- truth).isEmpty, s"false positives: ${(got -- truth).take(5)}")
    val recall = (got & truth).size.toDouble / truth.size
    // b=16 bands of r=4: P(miss | J=0.8) = (1-0.8^4)^16 ~ 3e-4
    assert(recall >= 0.95, s"recall $recall over ${truth.size} true pairs")
  }

  test("q34 SimHash: equals brute-force hamming<=3 over distinct-text representatives") {
    import spark.implicits._
    val docs = graft.engine.Tables.load(spark, sf, "documents")
    // representatives: min doc_id per distinct text (the operator's pre-pass)
    val reps = docs.groupBy("text").agg(min("doc_id").as("doc_id"))
    val sim = reps
      .withColumn("toks", array_distinct(split(col("text"), " ")))
      .filter(size(col("toks")) >= 1)
      .withColumn("simhash", expr(
        """aggregate(
             zip_with(
               aggregate(toks, array_repeat(0L, 64),
                 (acc, t) -> zip_with(acc, sequence(0, 63),
                   (a, k) -> a + if((shiftright(xxhash64(t), k) & 1L) = 1L, 1L, -1L))),
               sequence(0, 63),
               (v, k) -> if(v > 0L, shiftleft(1L, k), 0L)),
             0L, (acc, x) -> acc | x)"""))
      .select("doc_id", "simhash")
    val a = sim.select(col("doc_id").as("a_id"), col("simhash").as("ha"))
    val b = sim.select(col("doc_id").as("b_id"), col("simhash").as("hb"))
    val truth = a.join(b, col("a_id") < col("b_id"))
      .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) <= 3)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = pairSet(DedupOps.simhashPairs(spark, sf))
    assert(got == truth, s"got ${got.size} pairs, truth ${truth.size}")
    // the driver-visible q34 self-check row must agree: match_ok pinned 1
    val check = DedupOps.defs("q34_simhash_neardup")(spark, sf).collect()
    assert(check.length == 1 && check(0).getInt(1) == 1,
      s"q34 self-check row: ${check.toSeq}")
  }

  test("q79 incremental dedup == q32 self-join restricted to the cross-set") {
    // the batch probe must find exactly the batch↔corpus edges the full
    // self-join finds — an incremental path that misses (or invents)
    // cross pairs would silently let duplicates into the lake
    val full = DedupOps.defs("q32_minhash_neardup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val crossFromFull = full.collect {
      case (a, b, j) if a < 400 && b >= 400 && b < 500 => (b, a, j)
    }
    val inc = DedupOps.defs("q79_incremental_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc == crossFromFull,
      s"incremental ${inc.size} pairs vs cross-restricted full ${crossFromFull.size}")
    // the durable-index path must emit the identical edge set
    val indexed = DedupOps.defs("q82_indexed_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(indexed == inc, s"indexed ${indexed.size} pairs vs recomputed ${inc.size}")
  }

  test("q83 appended-index probe == cross edges with the corpus extended over batch A") {
    // after the append-on-commit of batch A (400-449), batch B's probe
    // must find exactly the B↔(corpus ∪ A) edges of the full self-join;
    // a stale (pre-append) index would miss every B↔A edge
    val split = MinHashIndex.BatchSplit
    val full = DedupOps.defs("q32_minhash_neardup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val crossFromFull = full.collect {
      case (a, b, j) if a < split && b >= split && b < 500 => (b, a, j)
    }
    val app = DedupOps.defs("q83_appended_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(app == crossFromFull,
      s"appended-index probe ${app.size} pairs vs cross-restricted full ${crossFromFull.size}")
  }

  test("q86 streaming probe == the batch probe's edge set, across a micro-batch boundary") {
    // the streaming path (file landing → shingle/signature → stream-
    // static band probe → exact verify → pair dedup) must emit exactly
    // the recomputing batch path's cross-set edges, even though the
    // batch arrives as two deliveries crossing a micro-batch boundary
    val stream = DedupOps.defs("q86_stream_neardup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = DedupOps.defs("q79_incremental_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(stream == batch,
      s"streaming ${stream.size} edges vs batch ${batch.size}")
  }

  test("q88 incremental spans: cross-set runs marked, within-batch runs ignored") {
    import spark.implicits._
    // W = 20. Corpus doc 10 owns a0..a79; batch doc 400 embeds a20..a59
    // at position 5 → its windows starting 5..25 are in the corpus, span
    // [5,45), 21 windows. Batch docs 401 and 402 SHARE b0..b39 — a
    // within-batch dup, which the cross-set probe must NOT mark (that's
    // the batch's own q76 pass). Corpus docs 10/11 share a40..a79 — a
    // corpus-corpus dup, absent from the output (batch docs only).
    def toks(p: String, r: Range) = r.map(i => s"$p$i")
    val a = toks("a", 0 until 80)
    val b = toks("b", 0 until 40)
    val rows = Seq(
      10L -> a.mkString(" "),
      11L -> (toks("c", 0 until 30) ++ a.slice(40, 80)).mkString(" "),
      400L -> (toks("d", 0 until 5) ++ a.slice(20, 60) ++ toks("d", 5 until 40)).mkString(" "),
      401L -> (b ++ toks("e", 0 until 30)).mkString(" "),
      402L -> (toks("f", 0 until 30) ++ b).mkString(" "))
    val dir = Files.createTempDirectory("graft-q88").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = DedupOps.defs("q88_incremental_spans")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((400L, 5L, 45L, 21L)), s"got ${got.mkString(", ")}")
  }

  test("q89 durable-store span probe == the recomputing q88 path") {
    val a = DedupOps.defs("q88_incremental_spans")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val b = DedupOps.defs("q89_indexed_spans")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(a == b, s"recompute ${a.size} spans vs indexed ${b.size}")
  }

  test("two sequential appends produce the same index content as one from-scratch build") {
    import java.io.File
    val docs = graft.engine.Tables.load(spark, sf, "documents")
    val seq = Files.createTempDirectory("graft-mhidx-seq").toFile
    MinHashIndex.build(spark, seq.getPath, docs.filter(col("doc_id") < 400))
    MinHashIndex.append(spark, seq.getPath,
      docs.filter(col("doc_id") >= 400 && col("doc_id") < 450))
    MinHashIndex.append(spark, seq.getPath,
      docs.filter(col("doc_id") >= 450 && col("doc_id") < 500))
    val full = Files.createTempDirectory("graft-mhidx-full").toFile
    MinHashIndex.build(spark, full.getPath, docs.filter(col("doc_id") < 500))
    def bands(r: File): Set[(Long, Int, Long)] =
      spark.read.parquet(new File(r, "bands").getPath).collect()
        .map(x => (x.getLong(0), x.getInt(1), x.getLong(2))).toSet
    def shingles(r: File): Set[(Long, Set[String])] =
      spark.read.parquet(new File(r, "shingles").getPath).collect()
        .map(x => (x.getLong(0), x.getSeq[String](1).toSet)).toSet
    assert(bands(seq) == bands(full),
      s"band rows diverge: seq ${bands(seq).size} vs full ${bands(full).size}")
    assert(shingles(seq) == shingles(full), "shingle store diverges")
    // winhashes is distinct-per-write (append-only), so the SETS must
    // agree even though the sequential path may hold a hash twice
    def winhashes(r: File): Set[Long] =
      spark.read.parquet(new File(r, "winhashes").getPath).collect()
        .map(_.getLong(0)).toSet
    assert(winhashes(seq) == winhashes(full), "winhash store diverges")
  }

  test("index compaction: content preserved, probe unchanged, crash window self-heals") {
    import java.io.File
    val docs = graft.engine.Tables.load(spark, sf, "documents")
    val root = Files.createTempDirectory("graft-mhidx-compact").toFile
    MinHashIndex.build(spark, root.getPath, docs.filter(col("doc_id") < 200))
    (200 until 400 by 50).foreach(lo => MinHashIndex.append(spark, root.getPath,
      docs.filter(col("doc_id") >= lo && col("doc_id") < lo + 50)))
    def files(store: String): Int =
      Option(new File(root, store).listFiles()).toSeq.flatten
        .count(f => f.getName.endsWith(".parquet"))
    def bands(): Set[(Long, Int, Long)] =
      spark.read.parquet(new File(root, "bands").getPath).collect()
        .map(x => (x.getLong(0), x.getInt(1), x.getLong(2))).toSet
    def winhashes(): Set[Long] =
      spark.read.parquet(new File(root, "winhashes").getPath).collect()
        .map(_.getLong(0)).toSet
    val batch = DedupOps.shingled(
      docs.filter(col("doc_id") >= 400 && col("doc_id") < 500))
    def probe(): Set[(Long, Long, Long)] =
      MinHashIndex.probeShingled(spark, root.getPath, batch, 0.8).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val (b0, w0, p0) = (bands(), winhashes(), probe())
    assert(files("bands") > 1, "fixture must start multi-file")

    MinHashIndex.compact(spark, root.getPath)
    assert(files("bands") == 1 && files("shingles") == 1 && files("winhashes") == 1)
    assert(bands() == b0 && winhashes() == w0, "compaction changed index content")
    assert(probe() == p0, "compaction changed probe results")

    // simulated crash between the two renames: live store gone, .old
    // beside it — the next compact call must restore then re-compact
    val live = new File(root, "bands")
    assert(live.renameTo(new File(root, ".old-bands")))
    MinHashIndex.compact(spark, root.getPath)
    assert(bands() == b0 && probe() == p0, "crash-window recovery lost content")
  }

  test("boilerplate-heavy corpus: bounded candidates, planted near-dup found") {
    import spark.implicits._
    val toks = (0 until 50).map(i => s"tok$i").mkString(" ")
    val tweaked = ((0 until 49).map(i => s"tok$i") :+ "changed").mkString(" ")
    val rows =
      (0 until 60).map(i => (i.toLong, toks)) ++                  // 60 exact copies
      (60 until 120).map(i => (i.toLong, s"other $toks")) ++      // 60 copies of a shifted text
      Seq((200L, tweaked)) ++                                     // near-dup of doc 0
      (300 until 340).map(i => (i.toLong, (0 until 50).map(j => s"u${i}t$j").mkString(" ")))
    val dir = Files.createTempDirectory("graft-dedup").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val q34 = DedupOps.simhashPairs(spark, dir).collect()
    // exact-dup pre-pass: no pair may join two copies of the same text,
    // and candidate volume stays far below the 60*59/2-per-clone blowup
    val q34Pairs = q34.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!q34Pairs.contains((0L, 1L)) && !q34Pairs.contains((60L, 61L)))
    assert(q34.length < 200, s"expected bounded output, got ${q34.length}")

    val q32 = pairSet(DedupOps.defs("q32_minhash_neardup")(spark, dir))
    assert(q32.contains((0L, 200L)), s"planted near-dup missing from $q32")
  }

  test("q34 group-collapse: one row per cluster, consistent with the pair output") {
    import spark.implicits._
    // same boilerplate shape as above: clone families collapse to one rep
    // each; doc 200 is a hamming-close tweak of doc 0's rep
    val toks = (0 until 50).map(i => s"tok$i").mkString(" ")
    val tweaked = ((0 until 49).map(i => s"tok$i") :+ "changed").mkString(" ")
    val rows =
      (0 until 60).map(i => (i.toLong, toks)) ++
      (60 until 120).map(i => (i.toLong, s"other $toks")) ++
      Seq((200L, tweaked)) ++
      // permutations of doc 0's tokens: distinct TEXT (survives the
      // exact-dedup pre-pass) but the same distinct-token SET, so the
      // simhash is identical — a guaranteed hamming-0 clique {rep of
      // 0..59, 400, 401} that must collapse to ONE group row
      Seq((400L, (0 until 50).map(i => s"tok${49 - i}").mkString(" ")),
          (401L, ((25 until 50) ++ (0 until 25)).map(i => s"tok$i").mkString(" "))) ++
      (300 until 340).map(i => (i.toLong, (0 until 50).map(j => s"u${i}t$j").mkString(" ")))
    val dir = Files.createTempDirectory("graft-dedup-groups").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val pairs = DedupOps.simhashPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // brute-force union-find over the pair list = expected (rep, size)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    pairs.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    val expected = parent.keys.groupBy(find).map { case (r, m) => r -> m.size.toLong }

    val groups = DedupOps.simhashGroups(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups == expected, s"groups $groups != pair-derived $expected")
    // collapsed form: one row per CLUSTER (every cluster >= 2 members),
    // never the O(k^2/2) pair blowup of a clone family
    assert(groups.values.forall(_ >= 2))
    assert(groups.size < pairs.length, s"${groups.size} groups vs ${pairs.length} pairs")
  }

  test("q65 component paths agree: driver union-find == distributed min-label propagation") {
    import spark.implicits._
    // chain 1-2-3-4, pair 10-11, triangle 20-21-22, isolated edge 30-31;
    // packed (a<<32)|b edges, as the operator builds them
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L), (30L, 31L))
    def packed() = edges.map { case (a, b) => (a << 32) | b }
      .toDF("pk").persist()
    def labels(cap: Long): Map[Long, Long] =
      DedupOps.componentLabels(spark, packed(), driverCap = cap)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDriver = labels(cap = Long.MaxValue)
    val viaPropagation = labels(cap = 0) // force the distributed path
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L,
      30L -> 30L, 31L -> 30L)
    assert(viaDriver == expected, s"driver path: $viaDriver")
    assert(viaPropagation == expected, s"propagation path: $viaPropagation")
  }

  test("componentSizes: driver fold == distributed fold, rows ordered by rep") {
    import spark.implicits._
    // round 21: the driver path folds (rep, n_members) inside the
    // union-find and returns a pre-sorted LOCAL relation (no exchanges);
    // rows AND order must equal the distributed groupBy/orderBy path
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L), (30L, 31L))
    def packed() = edges.map { case (a, b) => (a << 32) | b }
      .toDF("pk").persist()
    def sizes(cap: Long): Seq[(Long, Long)] =
      DedupOps.componentSizes(spark, packed(), driverCap = cap)
        .collect().toSeq.map(r => r.getLong(0) -> r.getLong(1))
    val viaDriver = sizes(cap = Long.MaxValue)
    val viaPropagation = sizes(cap = 0)
    val expected = Seq(1L -> 4L, 10L -> 2L, 20L -> 3L, 30L -> 2L)
    assert(viaDriver == expected, s"driver path: $viaDriver")
    assert(viaPropagation == expected, s"propagation path: $viaPropagation")
  }
}
