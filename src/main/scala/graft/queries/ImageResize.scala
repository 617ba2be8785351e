package graft.queries

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** X5's resize member: payload-to-payload image transformation — the
  * verb that, with decode ([[ImageDecode]]) and frame-sampling
  * ([[AudioDecode]]/[[VideoDecode]]), completes the multimodal surface
  * a training pipeline needs (SURVEY.md §2.10 X5): thumbnail/normalize
  * images BEFORE feature extraction so downstream stages see bounded
  * pixel counts.
  *
  * [[resize]] is a streamed `mapPartitions` stage (one payload resident
  * per task): each 24-bit uncompressed BMP is nearest-neighbor
  * DECIMATED by the smallest integer stride `s` that fits the result
  * inside `maxW`×`maxH` (s = max(ceil(w/maxW), ceil(h/maxH)); already
  * -fitting payloads pass through re-encoded at s = 1), and re-emitted
  * as a fully valid BMP payload column next to its new dimensions and
  * an exact pixel checksum (`sum_px` = sum of every emitted pixel
  * byte, padding excluded) so correctness of the byte walk is
  * verifiable without re-parsing. Failures are data (`resize_err`),
  * never exceptions — same quarantine contract as the decoders.
  *
  * Integer decimation (not interpolation) is the deliberate choice: it
  * is deterministic across JVMs (no float rounding), the output is a
  * pure function of input bytes, and for dedup/fingerprint pipelines a
  * stable downsample matters more than resample quality. A real
  * deployment swaps the kernel for an area-average behind the same
  * column contract. PNG payloads are not resized here (their pixel
  * data sits behind zlib + row filters — a full codec, not a header
  * walk); they quarantine as `unsupported_fmt`.
  */
object ImageResize {
  final case class Resized(payload: Array[Byte], width: Integer, height: Integer,
      sumPx: java.lang.Long, err: String)

  private def le16(b: Array[Byte], o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  private def bad(err: String): Resized = Resized(null, null, null, null, err)

  /** Resize one BMP payload to fit `maxW`×`maxH`. Total, never throws.
    * Row order is preserved as stored (bottom-up vs top-down does not
    * matter to a decimation: stored row j of the output samples stored
    * row j·s of the input). */
  def resizeBmp(b: Array[Byte], maxW: Int, maxH: Int): Resized = {
    if (b == null || b.length < 2) return bad("empty")
    if (!(b(0) == 'B'.toByte && b(1) == 'M'.toByte)) return bad("unsupported_fmt")
    if (b.length < 54) return bad("truncated")
    val dataOff = le32(b, 10)
    val dib = le32(b, 14)
    if (dib < 40) return bad(s"unsupported_dib_$dib")
    val w = le32(b, 18)
    val hRaw = le32(b, 22)
    // abs(Int.MinValue) is still negative — `h <= 0` (not `h == 0`)
    // rejects the crafted hRaw = 0x80000000 header that would otherwise
    // wrap the output allocation size negative
    val h = math.abs(hRaw)
    if (w <= 0 || h <= 0) return bad("bad_dimensions")
    if (le16(b, 26) != 1) return bad("bad_planes")
    if (le16(b, 28) != 24) return bad(s"unsupported_bpp_${le16(b, 28)}")
    if (le32(b, 30) != 0) return bad("unsupported_compression")
    // stride in Long space: a crafted w near 2^31/3 must fail the
    // length check below, not overflow into a negative stride
    val strideL = (w.toLong * 3 + 3) / 4 * 4
    if (dataOff < 54 || dataOff.toLong + h.toLong * strideL > b.length)
      return bad("truncated_pixels")
    val stride = strideL.toInt
    val s = math.max((w + maxW - 1) / maxW, (h + maxH - 1) / maxH)
    val ow = (w + s - 1) / s
    val oh = (h + s - 1) / s
    val ostride = (ow * 3 + 3) / 4 * 4
    val out = new Array[Byte](54 + oh * ostride)
    def le32w(v: Int, o: Int): Unit =
      (0 until 4).foreach(i => out(o + i) = ((v >>> (8 * i)) & 0xff).toByte)
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    le32w(out.length, 2)
    le32w(54, 10)
    le32w(40, 14)
    le32w(ow, 18)
    le32w(if (hRaw < 0) -oh else oh, 22)
    out(26) = 1
    out(28) = 24
    var sum = 0L
    var j = 0
    while (j < oh) {
      val inRow = dataOff + (j * s) * stride
      val outRow = 54 + j * ostride
      var i = 0
      while (i < ow) {
        val ip = inRow + (i * s) * 3
        val op = outRow + i * 3
        out(op) = b(ip); out(op + 1) = b(ip + 1); out(op + 2) = b(ip + 2)
        sum += (b(ip) & 0xff) + (b(ip + 1) & 0xff) + (b(ip + 2) & 0xff)
        i += 1
      }
      j += 1
    }
    Resized(out, ow, oh, sum, null)
  }

  /** Resize `payloadCol` across the frame: appends (out_payload,
    * out_width, out_height, sum_px, resize_err). The resized payload is
    * itself a decodable BMP — [[ImageDecode.decode]] round-trips it. */
  def resize(df: DataFrame, maxW: Int, maxH: Int,
             payloadCol: String = "payload"): DataFrame = {
    val outSchema = df.schema
      .add("out_payload", BinaryType).add("out_width", IntegerType)
      .add("out_height", IntegerType).add("sum_px", LongType)
      .add("resize_err", StringType)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.map { row =>
        val r = resizeBmp(row.getAs[Array[Byte]](idx), maxW, maxH)
        Row.fromSeq(row.toSeq ++ Seq(r.payload, r.width, r.height, r.sumPx, r.err))
      }
    }(Encoders.row(outSchema))
  }

  // ---- deterministic fixture payloads (also used by the spec) --------

  /** Full 24bpp BMP with pixel data: every channel of every pixel in
    * stored row r equals `rowVal(r) & 0xff` (row-constant images make
    * any decimation's pixel sum a closed form DuckDB can recompute). */
  def bmpPixBytes(w: Int, h: Int, rowVal: Int => Int): Array[Byte] = {
    val stride = (w * 3 + 3) / 4 * 4
    val b = new Array[Byte](54 + h * stride)
    def le32w(v: Int, o: Int): Unit =
      (0 until 4).foreach(i => b(o + i) = ((v >>> (8 * i)) & 0xff).toByte)
    b(0) = 'B'.toByte; b(1) = 'M'.toByte
    le32w(b.length, 2)
    le32w(54, 10)
    le32w(40, 14)
    le32w(w, 18); le32w(h, 22)
    b(26) = 1; b(28) = 24
    (0 until h).foreach { r =>
      val v = (rowVal(r) & 0xff).toByte
      val row = 54 + r * stride
      (0 until w * 3).foreach(i => b(row + i) = v)
    }
    b
  }
}
