package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Properties of the export operators the DuckDB oracle cannot express:
  * the two-phase rank's byte-identity with the single-window form, the
  * physical sink's layout + read-back order, and the temperature
  * mixture's quota arithmetic staying integer-exact and conservative.
  */
class ExportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def docs = graft.engine.Tables.load(spark, sf, "documents")

  test("q104 two-phase shard rank is byte-identical to the single-window form") {
    val in = docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
    val two = ExportOps.shardRanked(in).select("doc_id", "shard", "rnk")
    val one = ExportOps.shardRanked(in, singlePhase = true).select("doc_id", "shard", "rnk")
    assert(two.exceptAll(one).isEmpty && one.exceptAll(two).isEmpty,
      "two-phase offsets must reproduce the global per-shard rank exactly")
  }

  test("q104 ranks are a permutation of 1..n per shard and shards partition the corpus") {
    val r = ExportOps.shardRanked(
      docs.select(col("doc_id"), lit(1L).as("n_tok")))
    val perShard = r.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("rnk").as("lo"), max("rnk").as("hi"),
        countDistinct("rnk").as("d"))
      .collect()
    assert(perShard.map(_.getLong(1)).sum === docs.count())
    perShard.foreach { row =>
      assert(row.getLong(2) === 1L && row.getLong(3) === row.getLong(1) &&
        row.getLong(4) === row.getLong(1),
        s"shard ${row.getString(0)}: ranks must be exactly 1..n")
    }
  }

  test("exportShards writes one dir per shard, each shard's name-ordered files " +
      "concatenate to rank order, and >16 tasks wrote the export") {
    val out = Files.createTempDirectory("graft-shards-").toString
    try {
      ExportOps.exportShards(spark, docs.select("doc_id", "source", "text"), out)
      val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
        .map(_.getName).filter(_.startsWith("shard=")).sorted
      assert(dirs.length === 16, s"expected 16 shard dirs, got ${dirs.toSeq}")
      // The scale contract (round-12 finding): the physical sink must
      // NOT serialize each shard into one writer — the range partition
      // over (shard, rnk) spreads the export over many tasks. Part-file
      // names embed the writing partition id; distinct ids across the
      // export = number of tasks that produced data.
      val partFiles = dirs.flatMap { d =>
        new java.io.File(s"$out/$d").listFiles()
          .filter(f => f.isFile && f.getName.startsWith("part-"))
          .map(f => d -> f.getName)
      }
      val taskIds = partFiles.map(_._2.split("-")(1)).distinct
      assert(taskIds.length > 16,
        s"export must engage more write tasks than shards (16): got ${taskIds.length}")
      // The consumer contract: within each shard dir, reading the part
      // files in LEXICOGRAPHIC NAME ORDER concatenates to rank order —
      // a training loader sorts the file list by name and never sorts
      // rows. (Reading the whole dir in one spark.read is NOT the
      // contract: Spark bin-packs splits by size, not name.)
      dirs.foreach { d =>
        val files = new java.io.File(s"$out/$d").listFiles()
          .filter(f => f.isFile && f.getName.startsWith("part-"))
          .map(_.getName).sorted
        val rnks = files.flatMap { f =>
          spark.read.parquet(s"$out/$d/$f").select("rnk").collect().map(_.getLong(0))
        }
        assert(rnks.length > 0, s"$d: empty shard")
        assert(rnks.zip(rnks.tail).forall { case (a, b) => a <= b },
          s"$d: name-ordered file set must concatenate to rank order")
        assert(rnks.head === 1L && rnks.last === rnks.length.toLong,
          s"$d: concatenation must be the full 1..n rank sequence")
      }
      // and the full export is lossless
      assert(spark.read.parquet(out).count() === docs.count())
      // The manifest (written by the sink) must agree with an
      // independent recount of the physical tree: totals, per-shard
      // file lists in name order, per-file row counts, and the
      // order_sum cross-checked against the q104 audit query itself.
      val mf = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(out, "_manifest.json")), "UTF-8")
      val m = spark.read.option("multiLine", true)
        .json(spark.createDataset(Seq(mf))(org.apache.spark.sql.Encoders.STRING))
      val head = m.select("n_total", "n_shards").collect().head
      assert(head.getLong(0) === docs.count() && head.getLong(1) === 16L)
      val shardRows = m.select(explode(col("shards")).as("s"))
        .select(col("s.shard"), col("s.n"), col("s.order_sum"), col("s.files"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2),
            r.getSeq[org.apache.spark.sql.Row](3).map(_.getAs[String]("file"))))
        .toMap
      val audit = ExportOps.defs("q104_shard_export")(spark, sf)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
      dirs.foreach { d =>
        val shard = d.stripPrefix("shard=")
        val actualFiles = new java.io.File(s"$out/$d").listFiles()
          .filter(f => f.isFile && f.getName.startsWith("part-"))
          .map(_.getName).sorted.toSeq
        val (mn, mChk, mFiles) = shardRows(shard)
        assert(mFiles == actualFiles, s"$d: manifest file list diverges")
        assert(mn === spark.read.parquet(s"$out/$d").count(), s"$d: manifest count")
        val (an, aChk) = audit(shard)
        assert(mn === an && mChk === aChk,
          s"$d: manifest (n=$mn, chk=$mChk) disagrees with the q104 audit ($an, $aChk)")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  test("exporting an empty selection writes a valid empty manifest, not a crash") {
    val out = Files.createTempDirectory("graft-shards-empty-").toString
    try {
      ExportOps.exportShards(spark,
        docs.select("doc_id", "source", "text").filter(lit(false)), out)
      val mf = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(out, "_manifest.json")), "UTF-8")
      assert(mf.contains("\"n_total\":0") && mf.contains("\"shards\":[]"), mf)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  test("readShards round-trips a multi-file export and validates before serving") {
    val out = Files.createTempDirectory("graft-reader-").toString
    try {
      ExportOps.exportShards(spark, docs.select("doc_id", "source", "text"), out)
      // deep round-trip: every row back, ranks intact
      val back = ExportOps.readShards(spark, out, deep = true)
      assert(back.count() === docs.count())
      assert(back.select("doc_id").exceptAll(docs.select("doc_id")).isEmpty,
        "reader must serve exactly the exported doc set")
      // orderedFiles: per shard, the validated paths concatenate to 1..n
      val files = ExportOps.orderedFiles(spark, out)
      assert(files.map(_._1).sorted === files.map(_._1),
        "shards must list in sorted order")
      files.foreach { case (shard, paths) =>
        assert(paths.nonEmpty, s"shard $shard has no files")
        val rnks = paths.flatMap(p =>
          spark.read.parquet(p).select("rnk").collect().map(_.getLong(0)))
        assert(rnks === (1L to rnks.length.toLong),
          s"shard $shard: manifest-ordered files must concatenate to ranks 1..n")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  test("readShards round-trips an empty export") {
    val out = Files.createTempDirectory("graft-reader-empty-").toString
    try {
      ExportOps.exportShards(spark,
        docs.select("doc_id", "source", "text").filter(lit(false)), out)
      val back = ExportOps.readShards(spark, out, deep = true)
      assert(back.count() === 0L)
      assert(back.columns.toSeq === Seq("shard", "rnk", "doc_id", "source", "text"))
      assert(ExportOps.orderedFiles(spark, out).isEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  test("readShards fails loudly on every tamper class before serving a row") {
    val out = Files.createTempDirectory("graft-tamper-").toString
    try {
      ExportOps.exportShards(spark, docs.select("doc_id", "source", "text"), out)
      val shardDirs = new java.io.File(out).listFiles()
        .filter(d => d.isDirectory && d.getName.startsWith("shard=")).sortBy(_.getName)
      // pick a shard with ≥2 part files so an entry swap is possible
      val multi = shardDirs.find(
        _.listFiles().count(f => f.isFile && f.getName.startsWith("part-")) >= 2)
        .getOrElse(fail("fixture needs a shard with >=2 part files"))
      val victim = multi.listFiles()
        .filter(f => f.isFile && f.getName.startsWith("part-")).minBy(_.getName)
      val manifestPath = java.nio.file.Paths.get(out, "_manifest.json")
      val goodManifest = java.nio.file.Files.readAllBytes(manifestPath)
      val goodVictim = java.nio.file.Files.readAllBytes(victim.toPath)

      // 1. DELETED part file → presence check (shallow is enough)
      assert(victim.delete())
      val eDel = intercept[IllegalArgumentException] {
        ExportOps.readShards(spark, out, deep = false)
      }
      assert(eDel.getMessage.contains("missing on disk"), eDel.getMessage)
      java.nio.file.Files.write(victim.toPath, goodVictim)

      // 2. TRUNCATED file (valid parquet, fewer rows) → deep recount.
      //    Rewrite the victim in place with its first row dropped.
      val rows = spark.read.parquet(victim.getPath)
      val tmp = Files.createTempDirectory("graft-trunc-").toString
      rows.orderBy("rnk").limit((rows.count() - 1).toInt)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val rewritten = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-")).get
      java.nio.file.Files.copy(rewritten.toPath, victim.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      // drop the stale Hadoop .crc sidecar: the local ChecksumFileSystem
      // would otherwise fail the read on CRC before the manifest check
      // runs (a real tamperer does not leave a matching checksum behind)
      val crc = new java.io.File(victim.getParentFile, s".${victim.getName}.crc")
      if (crc.exists()) assert(crc.delete())
      val eTrunc = intercept[IllegalArgumentException] {
        ExportOps.readShards(spark, out, deep = true)
      }
      assert(eTrunc.getMessage.contains("truncated or substituted"), eTrunc.getMessage)
      // ...and shallow validation alone must NOT catch it (file present,
      // manifest intact) — deep is what certifies content
      ExportOps.readShards(spark, out, deep = false)
      java.nio.file.Files.write(victim.toPath, goodVictim)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))

      // 3. SWAPPED manifest entries → structural listed-order walk,
      //    before any filesystem or scan work
      val mf = new String(goodManifest, "UTF-8")
      val m = ExportOps.readManifest(spark, out)
      val swapIn = m.files.filter(_.shard == multi.getName.stripPrefix("shard="))
        .sortBy(_.pos).take(2)
      val Seq(a, b) = swapIn.map(e => s"""{"file":"${e.file}","n":${e.n},"lo":${e.lo},"hi":${e.hi}}""")
      val swapped = mf.replace(a, " PLACEHOLDER ")
        .replace(b, a).replace(" PLACEHOLDER ", b)
      assert(swapped != mf, "swap fixture must change the manifest")
      java.nio.file.Files.write(manifestPath, swapped.getBytes("UTF-8"))
      val mfCrc = new java.io.File(new java.io.File(out), "._manifest.json.crc")
      if (mfCrc.exists()) assert(mfCrc.delete())
      val eSwap = intercept[IllegalArgumentException] {
        ExportOps.readShards(spark, out, deep = false)
      }
      assert(eSwap.getMessage.contains("not a dense rank tiling"), eSwap.getMessage)
      java.nio.file.Files.write(manifestPath, goodManifest)

      // 4. STALE EMPTY MANIFEST over a real tree (a crashed re-export
      //    left {"n_total":0} behind) → presence check must fail even
      //    shallow, never validate clean and serve zero rows
      java.nio.file.Files.write(manifestPath,
        """{"n_total":0,"shards":[]}""".getBytes("UTF-8"))
      if (mfCrc.exists()) assert(mfCrc.delete())
      val eStale = intercept[IllegalArgumentException] {
        ExportOps.readShards(spark, out, deep = false)
      }
      assert(eStale.getMessage.contains("unlisted on disk"), eStale.getMessage)
      java.nio.file.Files.write(manifestPath, goodManifest)

      // 5. DROPPED FILES ARRAY: a shard keeps its {"n":...} entry but
      //    loses its files list → the shard-walk structural check fails
      //    (0 tiled rows != n), instead of the shard being skipped
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val tree = mapper.readTree(goodManifest)
      val shardArr = tree.get("shards")
        .asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode]
      val victimShard = multi.getName.stripPrefix("shard=")
      (0 until shardArr.size()).foreach { i =>
        val node = shardArr.get(i)
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        if (node.get("shard").asText() == victimShard) {
          node.set[com.fasterxml.jackson.databind.JsonNode](
            "files", mapper.createArrayNode())
          ()
        }
      }
      java.nio.file.Files.write(manifestPath,
        mapper.writeValueAsBytes(tree))
      if (mfCrc.exists()) assert(mfCrc.delete())
      val eDropped = intercept[IllegalArgumentException] {
        ExportOps.readShards(spark, out, deep = false)
      }
      assert(eDropped.getMessage.contains("tiled file rows"), eDropped.getMessage)
      java.nio.file.Files.write(manifestPath, goodManifest)

      // restored export validates clean again
      assert(ExportOps.readShards(spark, out, deep = true).count() === docs.count())
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  test("q105 quotas: integer-exact, sum ≤ budget, fill stops at quota per source") {
    val rows = ExportOps.defs("q105_temperature_mixture")(spark, sf).collect()
    val budget = ExportOps.TempBudget
    // quotas are the floor split of the budget: Σ quota ≤ budget, and
    // within one doc's slack of it (floor division loses < nSources)
    val quotaSum = rows.map(_.getLong(3)).sum
    assert(quotaSum <= budget && quotaSum > budget - rows.length,
      s"quota split must floor-partition the budget: $quotaSum vs $budget")
    rows.foreach { r =>
      val (tokTotal, quota, nSel, selTok) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      // greedy fill invariant: the selection passed the quota by at most
      // one document (the doc that crossed the line is kept, q87's
      // semantics), and never selects more than the source has
      assert(selTok <= tokTotal)
      if (quota >= tokTotal) assert(selTok === tokTotal,
        s"${r.getString(0)}: quota covers the source, everything must be selected")
      else assert(selTok >= quota,
        s"${r.getString(0)}: greedy fill must reach quota $quota, got $selTok")
      // a source with any quota and any docs selects at least one doc
      if (quota > 0 && tokTotal > 0) assert(nSel > 0)
    }
    // temperature flattens the mixture: the selected-token share of the
    // largest source must not exceed its raw-token share (sqrt pulls
    // every above-average source down toward the mean)
    val totalTok = rows.map(_.getLong(2)).sum.toDouble
    val biggest = rows.maxBy(_.getLong(2))
    val rawShare = biggest.getLong(2) / totalTok
    val quotaShare = biggest.getLong(3) / quotaSum.toDouble
    assert(quotaShare <= rawShare + 1e-9,
      f"sqrt temperature must flatten: biggest source raw=$rawShare%.3f quota=$quotaShare%.3f")
  }

  test("q105 is deterministic across runs") {
    val a = ExportOps.defs("q105_temperature_mixture")(spark, sf).collect()
    val b = ExportOps.defs("q105_temperature_mixture")(spark, sf).collect()
    assert(a.toSeq === b.toSeq)
  }

  test("exportShardsAppend extends ranks doc-for-doc to the canonical incremental order") {
    val out = Files.createTempDirectory("graft-append-").toString
    try {
      val all = docs.select(col("doc_id"), col("source"), col("text"))
      ExportOps.exportShards(spark, all.filter(pmod(col("doc_id"), lit(3)) =!= 0), out)
      ExportOps.exportShardsAppend(spark, all.filter(pmod(col("doc_id"), lit(3)) === 0), out)
      // the appended tree validates under the FULL loader contract
      // (tiling, presence, deep recount, checksums) — the dense-rank
      // guarantee holds ACROSS the append boundary
      val back = ExportOps.readShards(spark, out, deep = true)
        .select("shard", "rnk", "doc_id")
      // expected: generation-major (base first), md5-minor — the order a
      // full re-export with a generation-aware sort key would produce
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("shard").orderBy("gen", "rk", "doc_id")
      val expected = all
        .withColumn("gen", when(pmod(col("doc_id"), lit(3)) === 0, 1).otherwise(0))
        .withColumn("shard",
          substring(md5(concat(lit("graft104s:"), col("doc_id").cast("string"))), 1, 1))
        .withColumn("rk", md5(concat(lit("graft104o:"), col("doc_id").cast("string"))))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .select("shard", "rnk", "doc_id")
      assert(back.exceptAll(expected).isEmpty && expected.exceptAll(back).isEmpty,
        "appended export diverges from the canonical incremental ranking")
      // a second append stacks a THIRD generation on the same tree —
      // manifest extension composes
      import spark.implicits._
      val extra = Seq((900001L, "web", "alpha beta gamma")).toDF("doc_id", "source", "text")
      ExportOps.exportShardsAppend(spark, extra, out)
      val back2 = ExportOps.readShards(spark, out, deep = true)
      assert(back2.count() === all.count() + 1)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  test("compactShards merges appended files per shard; rows, ranks and checksums identical") {
    val out = Files.createTempDirectory("graft-shardcompact-").toString
    try {
      val all = docs.select(col("doc_id"), col("source"), col("text"))
      // a base export plus three weekly appends: every shard accretes
      // a<token>- files, the decay compactShards exists to reverse
      ExportOps.exportShards(spark, all.filter(pmod(col("doc_id"), lit(5)) === 0), out)
      (1 to 3).foreach(i => ExportOps.exportShardsAppend(spark,
        all.filter(pmod(col("doc_id"), lit(5)) === i), out))
      def shardFiles(): Int = new java.io.File(out).listFiles()
        .filter(d => d.isDirectory && d.getName.startsWith("shard="))
        .map(_.listFiles().count(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith("."))).sum
      val mBefore = ExportOps.readManifest(spark, out)
      val before = ExportOps.readShards(spark, out, deep = true)
        .collect().map(_.toSeq).sortBy(_.mkString("|"))
      val filesBefore = shardFiles()

      val report = ExportOps.compactShards(spark, out, maxFilesPerShard = 2)
      assert(report.shardsCompacted > 0, "nothing compacted on a 4-generation tree")
      assert(shardFiles() < filesBefore,
        s"compaction did not reduce the file count ($filesBefore -> ${shardFiles()})")
      // the FULL loader contract re-validates (tiling, presence, deep
      // recount, per-shard checksums) and the rows come back identical
      // — ranks included, so the training order is untouched
      val after = ExportOps.readShards(spark, out, deep = true)
        .collect().map(_.toSeq).sortBy(_.mkString("|"))
      assert(after.sameElements(before), "compaction changed the served rows")
      val mAfter = ExportOps.readManifest(spark, out)
      assert(mAfter.nTotal == mBefore.nTotal &&
        mAfter.shards.sortBy(_._1) == mBefore.shards.sortBy(_._1),
        "compaction changed shard totals or order checksums")
      // idempotent: everything now fits the threshold
      assert(ExportOps.compactShards(spark, out, maxFilesPerShard = 2)
        .shardsCompacted == 0)
      // the tree keeps accepting appends afterwards — manifest
      // extension and interval substitution compose
      ExportOps.exportShardsAppend(spark,
        all.filter(pmod(col("doc_id"), lit(5)) === 4), out)
      assert(ExportOps.readShards(spark, out, deep = true).count() == all.count())
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  test("recoverExport heals crash strays from the manifest alone; lost files fail loudly") {
    val out = Files.createTempDirectory("graft-recover-").toString
    try {
      val all = docs.select(col("doc_id"), col("source"), col("text"))
      ExportOps.exportShards(spark, all, out)
      // a crashed append/compaction leaves moved-in files the manifest
      // never committed: plant one and watch validation fail loudly
      val shardDir = new java.io.File(out).listFiles()
        .filter(d => d.isDirectory && d.getName.startsWith("shard=")).head
      val part = shardDir.listFiles().filter(f => f.isFile &&
        !f.getName.startsWith("_") && !f.getName.startsWith(".")).head
      val stray = new java.io.File(shardDir, s"aDEAD-${part.getName}")
      java.nio.file.Files.copy(part.toPath, stray.toPath)
      val e = intercept[IllegalArgumentException] {
        ExportOps.readShards(spark, out, deep = false).count()
      }
      assert(e.getMessage.contains("unlisted on disk"), e.getMessage)
      assert(ExportOps.recoverExport(spark, out) == 1)
      assert(!stray.exists)
      assert(ExportOps.readShards(spark, out, deep = true).count() == all.count())
      // a LISTED file gone missing is committed data loss — recovery
      // must refuse, not silently shrink the corpus
      assert(part.delete())
      val eLost = intercept[IllegalArgumentException] {
        ExportOps.recoverExport(spark, out)
      }
      assert(eLost.getMessage.contains("lost committed files"), eLost.getMessage)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  test("exportShardsAppend refuses a stale or tampered manifest before writing anything") {
    val out = Files.createTempDirectory("graft-append-stale-").toString
    try {
      val all = docs.select(col("doc_id"), col("source"), col("text"))
      ExportOps.exportShards(spark, all.filter(pmod(col("doc_id"), lit(3)) =!= 0), out)
      val manifestPath = java.nio.file.Paths.get(out, "_manifest.json")
      val staleManifest = java.nio.file.Files.readAllBytes(manifestPath)
      // manual NIO writes below bypass Hadoop's local-FS checksum layer;
      // drop the stale .crc sidecar so the read sees the doctored bytes
      def unCrc(): Unit =
        java.nio.file.Files.deleteIfExists(
          java.nio.file.Paths.get(out, "._manifest.json.crc")): Unit
      ExportOps.exportShardsAppend(spark, all.filter(pmod(col("doc_id"), lit(3)) === 0), out)
      val nFiles = new java.io.File(out).listFiles()
        .filter(d => d.isDirectory && d.getName.startsWith("shard="))
        .map(_.listFiles().count(_.isFile)).sum

      // STALE manifest (a crashed earlier append, an operator rollback):
      // the tree carries files the manifest never heard of — the append
      // must die in preflight, not mint overlapping ranks on top
      java.nio.file.Files.write(manifestPath, staleManifest)
      unCrc()
      import spark.implicits._
      val more = Seq((900002L, "web", "delta epsilon")).toDF("doc_id", "source", "text")
      val eStale = intercept[IllegalArgumentException] {
        ExportOps.exportShardsAppend(spark, more, out)
      }
      assert(eStale.getMessage.contains("unlisted on disk"), eStale.getMessage)
      // preflight failure wrote NOTHING: file count unchanged
      val nAfter = new java.io.File(out).listFiles()
        .filter(d => d.isDirectory && d.getName.startsWith("shard="))
        .map(_.listFiles().count(_.isFile)).sum
      assert(nAfter === nFiles, "failed append must not touch the tree")

      // TAMPERED totals (manifest edited by hand): structural check
      val doctored = new String(staleManifest, "UTF-8")
        .replaceFirst(""""n_total":(\d+)""", """"n_total":999999""")
      java.nio.file.Files.write(manifestPath, doctored.getBytes("UTF-8"))
      unCrc()
      val eTamper = intercept[IllegalArgumentException] {
        ExportOps.exportShardsAppend(spark, more, out)
      }
      assert(eTamper.getMessage.contains("n_total"), eTamper.getMessage)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }
}
