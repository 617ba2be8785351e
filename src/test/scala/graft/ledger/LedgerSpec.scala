package graft.ledger

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The ledger state machine (sudo_code.txt:25-49) exercised IDENTICALLY
  * against both implementations — the parquet single-writer default and
  * the Derby-backed [[JdbcLedger]] (the reference's actual RDS shape) —
  * plus the parquet ledger's bounded-durability guarantees: a fixed
  * version window regardless of commit count, and no O(history) listing
  * on the commit path (50k-file stress drain).
  */
class LedgerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  System.setProperty("derby.system.home", "target/derby")

  private def freshDir(): String = Files.createTempDirectory("graft-ledger").toString

  private val impls: Seq[(String, String => Ledger)] = Seq(
    "parquet" -> ((dir: String) => new ParquetLedger(spark, dir, maxRetries = 3)),
    "jdbc" -> ((dir: String) => new JdbcLedger(spark, JdbcLedger.derbyUrl(dir), maxRetries = 3)))

  private def statusOf(led: Ledger): Map[String, (String, Int, Boolean, Option[String])] =
    led.snapshot().collect().map { r =>
      r.getAs[String]("s3_key") ->
        ((r.getAs[String]("processing_status"), r.getAs[Int]("retry_count"),
          r.getAs[java.sql.Timestamp]("processed_at") != null,
          Option(r.getAs[String]("error_message"))))
    }.toMap

  for ((name, mk) <- impls) {
    test(s"$name: registration is conflict-ignore; selection is oldest-first top-k") {
      val dir = freshDir()
      val led = mk(dir)
      assert(led.register(Seq(("f/a", 1L), ("f/b", 2L), ("f/c", 3L))) == 3L)
      assert(led.register(Seq(("f/a", 1L), ("f/d", 4L))) == 1L) // a ignored
      assert(led.selectBatch(2) == Seq("f/a", "f/b")) // same created_at -> key order
      assert(led.selectBatch(10).size == 4)
    }

    test(s"$name: full transition cycle PENDING→PROCESSING→{SUCCEEDED,FAILED}→QUARANTINED") {
      val dir = freshDir()
      val led = mk(dir)
      led.register(Seq(("g/a", 1L), ("g/b", 2L)))
      led.markProcessing(Seq("g/a", "g/b"), "r1")
      assert(statusOf(led)("g/a") == ((Ledger.Processing, 1, false, None)))
      led.markOutcome(Map("g/a" -> Ledger.Succeeded, "g/b" -> Ledger.Failed),
        "r1", Map("g/b" -> "boom"))
      val s1 = statusOf(led)
      assert(s1("g/a") == ((Ledger.Succeeded, 1, true, None)))
      assert(s1("g/b") == ((Ledger.Failed, 1, false, Some("boom"))))
      // FAILED is re-selectable until the retry budget is gone
      assert(led.selectBatch(10) == Seq("g/b"))
      led.markProcessing(Seq("g/b"), "r2")
      led.markOutcome(Map("g/b" -> Ledger.Failed), "r2", Map("g/b" -> "boom2"))
      led.markProcessing(Seq("g/b"), "r3")
      led.markOutcome(Map("g/b" -> Ledger.Failed), "r3", Map("g/b" -> "boom3"))
      assert(led.selectBatch(10).isEmpty) // retry budget (3) exhausted
      assert(led.quarantineExhausted("r4") == 1L)
      val s2 = statusOf(led)
      assert(s2("g/b")._1 == Ledger.Quarantined && s2("g/b")._3)
      assert(led.quarantineExhausted("r5") == 0L) // idempotent
    }

    test(s"$name: failInFlight downs only this run's PROCESSING rows; reload reclaims stale ones") {
      val dir = freshDir()
      val led = mk(dir)
      led.register(Seq(("h/a", 1L), ("h/b", 2L)))
      led.markProcessing(Seq("h/a"), "r1")
      led.markProcessing(Seq("h/b"), "r2")
      led.failInFlight("r1", "driver died")
      val s = statusOf(led)
      assert(s("h/a") == ((Ledger.Failed, 1, false, Some("driver died"))))
      assert(s("h/b")._1 == Ledger.Processing) // other run untouched
      // a NEW ledger instance over the same store reclaims stale PROCESSING
      val led2 = mk(dir)
      val s2 = statusOf(led2)
      assert(s2("h/b")._1 == Ledger.Failed)
      assert(s2("h/b")._4.exists(_.contains("reclaimed")))
    }
  }

  test("parquet: version directory count stays bounded across many commits and reloads") {
    val dir = freshDir()
    val led = new ParquetLedger(spark, dir, maxRetries = 3, versionWindow = 8)
    led.register((1 to 10).map(i => (f"v/f$i%02d", i.toLong)))
    (1 to 15).foreach { i =>
      val batch = led.selectBatch(1)
      led.markProcessing(batch, s"r$i")
      led.markOutcome(batch.map(_ -> Ledger.Succeeded).toMap, s"r$i")
    }
    def versions(): Seq[String] =
      new java.io.File(dir).listFiles().toSeq.map(_.getName).filter(_.matches("v\\d{5}")).sorted
    assert(versions().size <= 8, s"version window leaked: ${versions()}")
    // reload from the bounded window: full state intact
    val led2 = new ParquetLedger(spark, dir, maxRetries = 3, versionWindow = 8)
    val s = statusOf(led2)
    assert(s.size == 10)
    assert(s.values.count(_._1 == Ledger.Succeeded) == 10)
    assert(versions().size <= 8)
  }

  test("parquet: 50k-file drain keeps commit cost and version count bounded (stress)") {
    val dir = freshDir()
    val t0 = System.nanoTime()
    val led = new ParquetLedger(spark, dir, maxRetries = 3)
    val n = 50000
    assert(led.register((1 to n).map(i => (f"s/f$i%06d", i.toLong))) == n.toLong)
    var drained = 0
    var round = 0
    while (drained < n) {
      round += 1
      val batch = led.selectBatch(10000)
      assert(batch.size == 10000)
      led.markProcessing(batch, s"r$round")
      led.markOutcome(batch.map(_ -> Ledger.Succeeded).toMap, s"r$round")
      drained += batch.size
    }
    val secs = (System.nanoTime() - t0) / 1e9
    val versionCount = new java.io.File(dir).listFiles()
      .map(_.getName).count(_.matches("v\\d{5}"))
    assert(versionCount <= 8, s"version count $versionCount exceeds window")
    assert(led.selectBatch(1).isEmpty)
    assert(led.snapshot().filter(col("processing_status") === Ledger.Succeeded).count() == n.toLong)
    assert(secs < 60.0, f"50k-file drain took $secs%.1f s (budget 60 s)")
  }

  test("jdbc ledger: two concurrent runners drain one backlog with zero double-claims") {
    // the multi-runner contract claimBatch documents: every key is won
    // by EXACTLY one runner (atomic status-guarded CAS), nothing is
    // skipped, and both runners make progress instead of blocking
    val dir = Files.createTempDirectory("graft-jdbc-conc").toString
    val keys = (0 until 200).map(i => f"s3://bucket/f$i%03d.jsonl")
    val seed = new JdbcLedger(spark, JdbcLedger.derbyUrl(dir), maxRetries = 3)
    seed.register(keys.map(k => k -> 10L))
    // both connections exist BEFORE work starts (construction reclaims
    // stale PROCESSING rows; mid-drain construction would steal claims)
    val ledgers = Seq(new JdbcLedger(spark, JdbcLedger.derbyUrl(dir), maxRetries = 3),
      new JdbcLedger(spark, JdbcLedger.derbyUrl(dir), maxRetries = 3))
    val claimed = Seq.fill(2)(scala.collection.mutable.ArrayBuffer.empty[String])
    // a Phaser gates every claim round so BOTH runners issue their
    // claims against the same candidate window simultaneously — the CAS
    // contention is exercised every round, not only if the scheduler
    // happens to interleave them
    val phaser = new java.util.concurrent.Phaser(2)
    val threads = (0 until 2).map { i =>
      new Thread(() => {
        val led = ledgers(i)
        val runId = s"runner-$i"
        var done = false
        while (!done) {
          phaser.arriveAndAwaitAdvance()
          val batch = led.claimBatch(10, runId)
          if (batch.isEmpty) { done = true; phaser.arriveAndDeregister() }
          else {
            claimed(i) ++= batch
            led.markOutcome(batch.map(_ -> Ledger.Succeeded).toMap, runId)
          }
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(threads.forall(!_.isAlive), "runner did not finish")
    val (a, b) = (claimed(0).toSet, claimed(1).toSet)
    assert((a & b).isEmpty, s"double-claimed: ${(a & b).take(5)}")
    assert(claimed(0).size + claimed(1).size == 200,
      s"claims must partition the backlog: ${claimed(0).size} + ${claimed(1).size}")
    assert((a | b) == keys.toSet, "full coverage")
    val st = statusOf(seed)
    assert(st.values.forall(_._1 == Ledger.Succeeded), "all terminal SUCCEEDED")
  }

  test("ledger dialects: the executed SQL is engine-neutral; the Postgres strategy is the reference's") {
    // this sandbox ships exactly one JDBC engine (Derby), so the
    // not-Derby-bound claim is proven structurally: everything the suite
    // executes — including the two-drainer race above — goes through
    // LedgerDialect.Ansi, whose statements contain no engine-specific
    // syntax; the Postgres strategy (psuedo_code.txt:170 /
    // sudo_code.txt:25-49) is real selectable code whose SQL shapes are
    // pinned here.
    assert(LedgerDialect.forUrl(JdbcLedger.derbyUrl("/tmp/x")) eq LedgerDialect.Ansi)
    assert(LedgerDialect.forUrl("jdbc:postgresql://db:5432/lake") eq LedgerDialect.Postgres)
    // ANSI dialect: no Derby-isms (the old SYSIBM.SYSDUMMY1 dummy-table
    // dance), no Postgres-isms, and no VALUES-in-FROM (Derby spells it
    // `VALUES 1`, MySQL `VALUES ROW(1)`, Oracle not at all) — the
    // conflict-ignore is a plain insert with the duplicate-key
    // violation tolerated, the only form every mainstream engine runs
    val ansiSql = LedgerDialect.Ansi.insertIgnoreSql.toUpperCase
    assert(!ansiSql.contains("SYSIBM") && !ansiSql.contains("DUAL") &&
      !ansiSql.contains("ON CONFLICT") && !ansiSql.contains("FROM") &&
      !ansiSql.contains("NOT EXISTS"), s"engine-specific token in: $ansiSql")
    assert(LedgerDialect.Ansi.insertIgnoreSql.contains("VALUES (?, ?, ?, 0, ?, ?)"))
    // Postgres dialect: the reference's deployment verbatim
    assert(LedgerDialect.Postgres.insertIgnoreSql.contains("ON CONFLICT (s3_key) DO NOTHING"))
    assert(LedgerDialect.Postgres.claimSelectSql.contains("FOR UPDATE SKIP LOCKED"))
    assert(LedgerDialect.Postgres.claimSelectSql.contains("ORDER BY created_at, s3_key"),
      "the SKIP LOCKED claim must keep the oldest-first contract")
  }

  test("ansi insert-ignorer: duplicate reports 0, null key rejected, real errors propagate") {
    // executor-level contract (not just SQL-string pinning): the
    // conflict-ignore must swallow ONLY already-registered keys —
    // every other failure must surface, because a swallowed genuine
    // error silently unregisters a file forever
    val dir = Files.createTempDirectory("graft-jdbc-ign").toString
    val led = new JdbcLedger(spark, JdbcLedger.derbyUrl(dir), maxRetries = 3,
      dialect = LedgerDialect.Ansi)
    assert(led.register(Seq("x.jsonl" -> 1L)) == 1)
    assert(led.register(Seq("x.jsonl" -> 1L)) == 0, "duplicate must report 0 rows")
    intercept[IllegalArgumentException] {
      led.register(Seq((null: String) -> 1L))
    }
    // a genuinely different statement failure (value too long for the
    // VARCHAR(1024) column, SQLState class 22) must propagate — the
    // catch is duplicate-states only, never a blanket swallow
    val huge = "k" * 5000
    intercept[java.sql.SQLException] { led.register(Seq(huge -> 1L)) }
    // and the failed batch rolled back: the ledger is unchanged
    assert(statusOf(led).keySet == Set("x.jsonl"))
  }

  test("jdbc ledger registration + claim run under an explicitly selected dialect") {
    // the dialect parameter is honored end to end: drive a register →
    // claim → outcome cycle with the Ansi dialect passed EXPLICITLY
    // (not via URL inference) and check the lifecycle is intact
    val dir = Files.createTempDirectory("graft-jdbc-dialect").toString
    val led = new JdbcLedger(spark, JdbcLedger.derbyUrl(dir), maxRetries = 3,
      dialect = LedgerDialect.Ansi)
    assert(led.register(Seq("a.jsonl" -> 1L, "b.jsonl" -> 2L)) == 2)
    assert(led.register(Seq("a.jsonl" -> 1L, "c.jsonl" -> 3L)) == 1, "conflict-ignore")
    val won = led.claimBatch(10, "runner-d")
    assert(won.sorted == Seq("a.jsonl", "b.jsonl", "c.jsonl"))
    led.markOutcome(won.map(_ -> Ledger.Succeeded).toMap, "runner-d")
    val st = statusOf(led)
    assert(st.values.forall(_._1 == Ledger.Succeeded))
  }

  test("jdbc ledger drives the full batch pipeline end to end") {
    import java.nio.charset.StandardCharsets
    import graft.pipeline.{BatchProcessor, Contracts, LakeLayout}
    val lay = LakeLayout(Files.createTempDirectory("graft-jdbc-lake").toString)
    def rec(id: String): String =
      s"""{"id":"$id","event_timestamp":"2024-03-07 11:22:33.000000","MODE":"training",""" +
        s""""metadata":{"app_version":"2.4.1","user_agent":"svc/1.0","user_id":7},""" +
        s""""payload":{"transaction_id":"t-$id","value":9.5,"props":"{}"}}"""
    val p = java.nio.file.Paths.get(s"${lay.rawDir}/good.jsonl")
    Files.createDirectories(p.getParent)
    Files.write(p, (Seq(rec("j-1"), rec("j-2")).mkString("", "\n", "\n"))
      .getBytes(StandardCharsets.UTF_8))
    val bad = java.nio.file.Paths.get(s"${lay.rawDir}/bad.jsonl")
    Files.write(bad, s"""${rec("j-3")}\n{"broken\n""".getBytes(StandardCharsets.UTF_8))

    val bp = new BatchProcessor(spark, lay, Contracts.events, batchSize = 2,
      ledgerFactory = (s, d, m) => new JdbcLedger(s, JdbcLedger.derbyUrl(d), m))
    assert(bp.runUntilDrained() >= 1)
    assert(graft.ingest.CuratedWriter.read(spark, lay.curatedDir).count() == 2)
    val st = statusOf(bp.ledger)
    assert(st.find(_._1.endsWith("good.jsonl")).get._2._1 == Ledger.Succeeded)
    assert(st.find(_._1.endsWith("bad.jsonl")).get._2._1 == Ledger.Quarantined)
  }
}
