package graft.queries

import java.io.ByteArrayOutputStream
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** X5's decode boundary, for real: batched decoding of binary image
  * payloads into typed metadata columns, implemented as a
  * `mapPartitions` stage — the one place in the engine where
  * per-record imperative byte work is genuinely outside Spark SQL's
  * expression surface (SURVEY.md §2.10 X5; preference order (d), taken
  * deliberately and only here).
  *
  * Scale/batch shape: the iterator is streamed — one payload resident
  * per task at a time, so task memory is bounded by the largest single
  * payload regardless of partition size; at 100 TB the binary column's
  * parquet pages are the batch unit and partition count is the
  * parallelism. Decode FAILURES are data, not exceptions: they land in
  * a `decode_err` column (the quarantine surface, mirroring the ingest
  * DLQ's reason column) so one corrupt payload never kills a task.
  *
  * The codecs are pure-JVM header parsers (PNG IHDR, BMP
  * BITMAPINFOHEADER) — no native libraries in this container; a real
  * deployment swaps `parseHeader` for a full decoder behind the same
  * column contract.
  */
object ImageDecode {
  /** Decoded header facts; null fields where parsing failed. */
  final case class Header(fmt: String, width: Integer, height: Integer, err: String)

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  private val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Parse one payload's image header. Total, never throws. */
  def parseHeader(b: Array[Byte]): Header = {
    if (b == null || b.isEmpty) return Header(null, null, null, "empty")
    if (b.length >= 8 && b.take(8).sameElements(PngSig)) {
      if (b.length < 24) return Header("png", null, null, "truncated")
      val ihdr = new String(b.slice(12, 16), java.nio.charset.StandardCharsets.US_ASCII)
      if (ihdr != "IHDR") return Header("png", null, null, "bad_ihdr")
      val (w, h) = (be32(b, 16), be32(b, 20))
      if (w <= 0 || h <= 0) return Header("png", null, null, "bad_dimensions")
      Header("png", w, h, null)
    } else if (b.length >= 2 && b(0) == 'B'.toByte && b(1) == 'M'.toByte) {
      if (b.length < 26) return Header("bmp", null, null, "truncated")
      val dibSize = le32(b, 14)
      if (dibSize < 40) return Header("bmp", null, null, s"unsupported_dib_$dibSize")
      val w = le32(b, 18)
      val h = math.abs(le32(b, 22)) // negative height = top-down row order
      if (w <= 0 || h == 0) return Header("bmp", null, null, "bad_dimensions")
      Header("bmp", w, h, null)
    } else Header(null, null, null, "unknown_format")
  }

  /** Decode `payloadCol` across the frame: appends (fmt, width, height,
    * decode_err). The metadata columns stay ordinary Spark columns, so
    * everything downstream (dedup, stats, selection) remains columnar. */
  def decode(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val outSchema = df.schema
      .add("fmt", StringType).add("width", IntegerType)
      .add("height", IntegerType).add("decode_err", StringType)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.map { row =>
        val h = parseHeader(row.getAs[Array[Byte]](idx))
        Row.fromSeq(row.toSeq ++ Seq(h.fmt, h.width, h.height, h.err))
      }
    }(Encoders.row(outSchema))
  }

  // ---- deterministic fixture payloads (also used by the spec) --------

  /** Minimal valid PNG prefix: signature + IHDR chunk (CRC zeroed — the
    * header parser, like most sniffing decoders, does not verify it). */
  def pngBytes(w: Int, h: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(PngSig, 0, 8)
    def be(v: Int): Unit =
      Seq(24, 16, 8, 0).foreach(s => out.write((v >>> s) & 0xff))
    be(13)
    out.write("IHDR".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    be(w); be(h)
    out.write(8); out.write(2); out.write(0); out.write(0); out.write(0) // depth/type/etc
    be(0) // CRC (unchecked)
    out.toByteArray
  }

  /** Minimal BMP: 14-byte file header + 40-byte BITMAPINFOHEADER, no
    * pixel data. Negative `h` encodes top-down row order (parser abs's). */
  def bmpBytes(w: Int, h: Int): Array[Byte] = {
    val b = new Array[Byte](54)
    def le(v: Int, o: Int): Unit =
      (0 until 4).foreach(i => b(o + i) = ((v >>> (8 * i)) & 0xff).toByte)
    b(0) = 'B'.toByte; b(1) = 'M'.toByte
    le(54, 2)  // file size (header only)
    le(54, 10) // pixel-data offset
    le(40, 14) // DIB header size
    le(w, 18); le(h, 22)
    b(26) = 1  // planes
    b(28) = 24 // bpp
    b
  }
}
