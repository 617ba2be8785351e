package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` must serve the codegen
  * expressions to pure SQL, matching their Scala-registered semantics. */
class GraftExtensionsSpec extends AnyFunSuite {

  /** Build a second session (sharing the JVM's SparkContext) carrying
    * [[GraftExtensions]], run `f`, restore the shared test session.
    * `spark.sql.extensions` is a STATIC conf read at SparkContext
    * creation, so in a shared-context test JVM the public
    * `builder.withExtensions` API is the way to apply the same class;
    * the config-string path is exercised by the Verify/Bench mains,
    * whose fresh JVMs set it at context build. Never stops the new
    * session — that would kill the shared context. */
  private def withExtendedSession[T](f: SparkSession => T): T = {
    val base = TestSpark.spark // force-create the shared context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try f(SparkSession.builder()
      .withExtensions(new GraftExtensions().apply(_))
      .getOrCreate())
    finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("vec_dot, minhash_sig and simhash64 are callable from pure SQL") {
    withExtendedSession { s =>
      val d = s.sql(
        "SELECT vec_dot(array(cast(1.0 AS float), cast(2.0 AS float)), " +
          "array(cast(3.0 AS float), cast(4.0 AS float))) AS d").first().getDouble(0)
      assert(d == 11.0)

      val sig = s.sql("SELECT minhash_sig(array('a', 'b', 'c')) AS sig")
        .first().getSeq[Long](0)
      assert(sig.length == 64)

      val sig16 = s.sql("SELECT minhash_sig(array('a', 'b', 'c'), 16) AS sig")
        .first().getSeq[Long](0)
      assert(sig16.length == 16)
      // narrower signature = a prefix-independent but deterministic family:
      // same input twice gives the same signature
      assert(sig16 == s.sql("SELECT minhash_sig(array('a', 'b', 'c'), 16)")
        .first().getSeq[Long](0))

      val sh = s.sql("SELECT simhash64(array('x', 'y')) AS h").first().getLong(0)
      assert(sh == s.sql("SELECT simhash64(array('x', 'y'))").first().getLong(0))

      // int8 quantization round-trip from pure SQL (scale = 2/127 is a
      // float, so the reconstruction is approximate, not exact)
      val qd = s.sql(
        "WITH q AS (SELECT vec_quantize(array(cast(2.0 AS float), cast(0.0 AS float))) AS v) " +
          "SELECT vec_dot_q8(v.q, v.scale, v.q, v.scale) FROM q").first().getDouble(0)
      assert(math.abs(qd - 4.0) < 1e-6, s"quantized self-dot $qd")

      // the curation-scorer feature walk: 5 tokens, 1 stopword ('the'),
      // 4 distinct of 4 bigrams, nospace = 18 chars minus 4 separators
      val qf = s.sql("SELECT quality_features('the cat sat on mat') AS f")
        .selectExpr("f.n_tokens", "f.n_stop", "f.nospace", "f.bi_distinct")
        .first()
      assert((qf.getLong(0), qf.getLong(1), qf.getLong(2), qf.getLong(3))
        == ((5L, 1L, 14L, 4L)))

      // span hashes: default 20-token window → a 21-token doc has 2
      // windows; explicit width 3 → n-2 windows, deterministic
      val doc = (0 until 21).map(i => s"t$i").mkString(" ")
      assert(s.sql(s"SELECT size(span_hashes('$doc')) AS n").first().getInt(0) == 2)
      val h3a = s.sql("SELECT span_hashes('a b c d', 3) AS h").first().getSeq[Long](0)
      assert(h3a.length == 2)
      assert(h3a == s.sql("SELECT span_hashes('a b c d', 3)").first().getSeq[Long](0))
    }
  }

  test("wrong arity surfaces as a clear message, not an index error") {
    withExtendedSession { s =>
      val e = intercept[Exception](s.sql("SELECT vec_dot_q8(array(cast(1 AS tinyint)))"))
      assert(e.getMessage.contains("vec_dot_q8 expects 4"), e.getMessage)
      // round 20: the bloom builders are arity-checked too — a wrong
      // count used to die as an IndexOutOfBoundsException internal error
      val ea = intercept[Exception](
        s.sql("SELECT graft_bloom_agg(xxhash64('x'))"))
      assert(ea.getMessage.contains("graft_bloom_agg expects 3"), ea.getMessage)
      val ep = intercept[Exception](
        s.sql("SELECT graft_bloom_contains_any(cast(null AS binary))"))
      assert(ep.getMessage.contains("graft_bloom_contains_any expects 2"), ep.getMessage)
    }
  }

  test("an extension-built session can BUILD and probe bloom filters via SQL") {
    withExtendedSession { s =>
      // build over two values, probe a member and a stranger — the
      // build half used to be absent from the extension (round 20):
      // pure-SQL deployments could probe sidecars but never publish one
      val row = s.sql(
        """WITH t AS (SELECT explode(array('a', 'b')) AS v),
                bf AS (SELECT graft_bloom_agg(xxhash64(v), 64, 0.01) AS f FROM t)
           SELECT graft_bloom_contains_any(f, array(xxhash64('a'))) AS hit,
                  graft_bloom_contains_any(f, array(xxhash64('zz'))) AS miss
           FROM bf""").first()
      assert(row.getBoolean(0), "member must hit")
      assert(!row.getBoolean(1), "stranger should miss at this fpp")
    }
  }

  test("extension semantics match the per-query Scala registration") {
    val base = TestSpark.spark
    graft.functions.VectorExpressions.register(base)
    graft.functions.SimHash64.register(base)
    val fromScala = base.sql("SELECT simhash64(array('alpha', 'beta', 'gamma')) AS h")
      .first().getLong(0)
    val fromExt = withExtendedSession(
      _.sql("SELECT simhash64(array('alpha', 'beta', 'gamma')) AS h").first().getLong(0))
    assert(fromScala == fromExt)
  }
}
