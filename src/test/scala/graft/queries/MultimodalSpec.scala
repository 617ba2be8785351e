package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import ImageDecode.{Header, bmpBytes, parseHeader, pngBytes}

/** The X5 decode boundary: header parsing against known byte layouts
  * (including hand-corrupted ones), failure quarantine into decode_err,
  * and the end-to-end q56 aggregate over the deterministic fixture. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("PNG and BMP headers decode to their exact dimensions") {
    assert(parseHeader(pngBytes(640, 480)) == Header("png", 640, 480, null))
    assert(parseHeader(pngBytes(1, 1)) == Header("png", 1, 1, null))
    assert(parseHeader(bmpBytes(13, 7)) == Header("bmp", 13, 7, null))
    // negative BMP height encodes top-down row order; dimensions still real
    assert(parseHeader(bmpBytes(13, -7)) == Header("bmp", 13, 7, null))
  }

  test("corrupt payloads quarantine into decode_err instead of throwing") {
    assert(parseHeader(Array.empty[Byte]) == Header(null, null, null, "empty"))
    assert(parseHeader(null) == Header(null, null, null, "empty"))
    assert(parseHeader(Array[Byte](1, 2, 3)) == Header(null, null, null, "unknown_format"))
    assert(parseHeader(pngBytes(640, 480).take(12)) == Header("png", null, null, "truncated"))
    assert(parseHeader(bmpBytes(13, 7).take(20)) == Header("bmp", null, null, "truncated"))
    assert(parseHeader(pngBytes(0, 480)) == Header("png", null, null, "bad_dimensions"))
    // PNG signature with a non-IHDR first chunk
    val badChunk = pngBytes(640, 480)
    badChunk(12) = 'X'.toByte
    assert(parseHeader(badChunk) == Header("png", null, null, "bad_ihdr"))
    // BMP with an ancient core header the parser doesn't speak
    val coreBmp = bmpBytes(13, 7)
    coreBmp(14) = 12
    assert(parseHeader(coreBmp).err == "unsupported_dib_12")
  }

  test("decode appends metadata columns over the frame; valid and corrupt rows coexist") {
    import spark.implicits._
    val df = Seq(
      (1L, pngBytes(320, 200)),
      (2L, bmpBytes(64, 32)),
      (3L, Array[Byte](9, 9))).toDF("id", "payload")
    val out = ImageDecode.decode(df).collect().map(r =>
      r.getAs[Long]("id") ->
        ((r.getAs[String]("fmt"), r.getAs[Any]("width"), r.getAs[Any]("height"),
          r.getAs[String]("decode_err")))).toMap
    assert(out(1L) == (("png", 320, 200, null)))
    assert(out(2L) == (("bmp", 64, 32, null)))
    assert(out(3L) == ((null, null, null, "unknown_format")))
  }

  test("q56 end-to-end: per-format counts and dimension sums over the 300-payload fixture") {
    val rows = SparkEntry_q56(spark).collect()
      .map(r => r.getAs[String]("fmt") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_err")))).toMap
    assert(rows("png")._1 == 100 && rows("png")._2 == 0)
    assert(rows("bmp")._1 == 100 && rows("bmp")._2 == 0)
    assert(rows("(bad)")._1 == 100 && rows("(bad)")._2 == 100)
  }

  private def SparkEntry_q56(s: org.apache.spark.sql.SparkSession) =
    MultimodalOps.defs("q56_image_decode")(s, "/root/testdata/sf0.001")
}
