package graft.queries

import java.io.ByteArrayOutputStream
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** X5's video member: container decode + frame-sampling feature
  * extraction over binary AVI payloads — completes the X5 modality set
  * ([[ImageDecode]] image, [[AudioDecode]] audio; SURVEY.md §2.10 X5).
  *
  * Same two-stage, streamed-`mapPartitions` design as audio (one payload
  * resident per task, so task memory is bounded by the largest payload):
  *
  *  - [[decode]] walks the RIFF/'AVI ' LIST chain to the 'hdrl'→'avih'
  *    main header (microseconds-per-frame, total frames, width, height)
  *    into typed columns; failures land in `decode_err`, never
  *    exceptions.
  *  - [[sampleFrames]] is the frame-sampler a multimodal training
  *    pipeline needs: every `everyNth`-th '00db' (uncompressed DIB)
  *    frame chunk in the 'movi' LIST is reduced to one feature row
  *    (mean luma over the frame's bytes). Output rows ≈
  *    payload_count × n_frames / everyNth — a bounded, columnar frame
  *    table that downstream dedup/similarity/stats query without ever
  *    touching payload bytes again.
  *
  * The codec is a pure-JVM parser for 8-bit uncompressed frames (no
  * native video libs in this container); a real deployment swaps the
  * per-frame reduction for a full codec behind the same column contract.
  */
object VideoDecode {
  final case class Meta(fmt: String, usPerFrame: Integer, width: Integer,
      height: Integer, nFrames: java.lang.Long, durationMs: java.lang.Long, err: String)

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def bad(fmt: String, err: String): Meta =
    Meta(fmt, null, null, null, null, null, err)

  /** Parse one AVI payload's header. Total, never throws. The 'movi'
    * byte range is re-derived by [[sampleFrames]] so the meta stays a
    * plain serializable row (same split as [[AudioDecode.parseWav]]). */
  def parseAvi(b: Array[Byte]): Meta = {
    if (b == null || b.length < 12) return bad(null, "truncated")
    if (tag(b, 0) != "RIFF" || tag(b, 8) != "AVI ") return bad(null, "unknown_format")
    var off = 12
    var upf, w, h = -1
    var nFrames = -1L
    var moviSeen = false
    while (off + 8 <= b.length && (upf < 0 || !moviSeen)) {
      val id = tag(b, off)
      val sz = le32(b, off + 4)
      if (sz < 0) return bad("avi", "bad_chunk")
      if (id == "LIST" && off + 12 <= b.length) {
        tag(b, off + 8) match {
          case "hdrl" =>
            // inner chunk walk for the 'avih' main header (56-byte body:
            // dwMicroSecPerFrame @0, dwTotalFrames @16, dwWidth @32,
            // dwHeight @36)
            var in = off + 12
            val end = math.min(off.toLong + 8L + sz, b.length.toLong).toInt
            while (in + 8 <= end && upf < 0) {
              val iid = tag(b, in)
              val isz = le32(b, in + 4)
              if (isz < 0) return bad("avi", "bad_chunk")
              if (iid == "avih") {
                if (in + 8 + 40 > b.length) return bad("avi", "truncated")
                upf = le32(b, in + 8)
                nFrames = le32(b, in + 8 + 16).toLong & 0xffffffffL
                w = le32(b, in + 8 + 32)
                h = le32(b, in + 8 + 36)
              }
              val nxt = in.toLong + 8L + isz + (isz & 1)
              in = if (nxt > end.toLong) end else nxt.toInt
            }
          case "movi" => moviSeen = true
          case _ => ()
        }
      }
      // 2-byte-aligned advance in Long space: a crafted sz near 2^31
      // must end the walk, not overflow off into a negative index
      val next = off.toLong + 8L + sz + (sz & 1)
      off = if (next > b.length.toLong) b.length else next.toInt
    }
    if (upf < 0) return bad("avi", "missing_header")
    if (!moviSeen) return bad("avi", "missing_movi")
    if (upf == 0 || w <= 0 || h <= 0) return bad("avi", "bad_header")
    Meta("avi", upf, w, h, nFrames, nFrames * upf / 1000L, null)
  }

  /** Decode `payloadCol` across the frame: appends (video_fmt,
    * us_per_frame, width, height, n_frames, duration_ms, decode_err). */
  def decode(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val outSchema = df.schema
      .add("video_fmt", StringType).add("us_per_frame", IntegerType)
      .add("width", IntegerType).add("height", IntegerType)
      .add("n_frames", LongType).add("duration_ms", LongType)
      .add("decode_err", StringType)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.map { row =>
        val m = parseAvi(row.getAs[Array[Byte]](idx))
        Row.fromSeq(row.toSeq ++ Seq(m.fmt, m.usPerFrame, m.width, m.height,
          m.nFrames, m.durationMs, m.err))
      }
    }(Encoders.row(outSchema))
  }

  /** Byte range (offset, length) of the 'movi' LIST body, or null. */
  private def moviRange(b: Array[Byte]): (Int, Int) = {
    var off = 12
    while (off + 8 <= b.length) {
      val sz = le32(b, off + 4)
      if (sz < 0) return null
      if (tag(b, off) == "LIST" && off + 12 <= b.length && tag(b, off + 8) == "movi") {
        val len = math.min(sz.toLong - 4, b.length.toLong - off - 12).toInt
        return (off + 12, math.max(len, 0))
      }
      val next = off.toLong + 8L + sz + (sz & 1)
      off = if (next > b.length.toLong) b.length else next.toInt
    }
    null
  }

  /** Frame-sample valid payloads: one output row per sampled frame —
    * '00db' chunk k (k ≡ 0 mod `everyNth`) reduces to
    * mean = round(avg(unsigned byte)) over the frame's pixels. Rows with
    * decode_err are dropped (they stay on the decode surface; this is
    * the feature path). */
  def sampleFrames(decoded: DataFrame, payloadCol: String = "payload",
                   everyNth: Int = 2): DataFrame = {
    val fields = decoded.schema.fieldNames
    val keep = fields.filter(f => f != payloadCol).toSeq
    val outSchema = StructType(
      keep.map(f => decoded.schema(f)) ++
        Seq(StructField("frame_idx", IntegerType), StructField("frame_mean", LongType)))
    val pIdx = decoded.schema.fieldIndex(payloadCol)
    val keepIdx = keep.map(decoded.schema.fieldIndex)
    val errIdx = decoded.schema.fieldIndex("decode_err")
    decoded.mapPartitions { it =>
      it.flatMap { row =>
        if (!row.isNullAt(errIdx)) Iterator.empty
        else {
          val b = row.getAs[Array[Byte]](pIdx)
          val mv = moviRange(b)
          if (mv == null) Iterator.empty
          else {
            val (moviOff, moviLen) = mv
            val end = moviOff + moviLen
            val base = keepIdx.map(row.get)
            new Iterator[Row] {
              private var off = moviOff
              private var k = 0
              private var nextRow: Row = advance()
              private def advance(): Row = {
                while (off + 8 <= end) {
                  val id = tag(b, off)
                  val sz = le32(b, off + 4)
                  if (sz < 0) return null
                  val dataOff = off + 8
                  val dataLen = math.min(sz.toLong, (end - dataOff).toLong).toInt
                  val nxt = off.toLong + 8L + sz + (sz & 1)
                  off = if (nxt > end.toLong) end else nxt.toInt
                  if (id == "00db" && dataLen > 0) {
                    val myK = k
                    k += 1
                    if (myK % everyNth == 0) {
                      var sum = 0L
                      var i = 0
                      while (i < dataLen) { sum += (b(dataOff + i) & 0xff); i += 1 }
                      return Row.fromSeq(base ++ Seq[Any](myK,
                        math.round(sum.toDouble / dataLen)))
                    }
                  }
                }
                null
              }
              def hasNext: Boolean = nextRow != null
              def next(): Row = { val r = nextRow; nextRow = advance(); r }
            }
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  // ---- deterministic fixture payloads (also used by the spec) --------

  /** Minimal AVI: RIFF/'AVI ' + hdrl(avih) + movi with `nFrames` '00db'
    * frames of `width`×`height` 8-bit pixels, frame k filled with the
    * constant `pixOf(k)` (so any frame's mean luma is exactly `pixOf(k)`
    * — DuckDB recomputes features without parsing a byte). */
  def aviBytes(width: Int, height: Int, usPerFrame: Int, nFrames: Int,
               pixOf: Int => Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def le32w(v: Int): Unit = (0 until 4).foreach(i => out.write((v >>> (8 * i)) & 0xff))
    def tagw(s: String): Unit = out.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val frameLen = width * height
    val framePadded = frameLen + (frameLen & 1)
    val moviBody = 4 + nFrames * (8 + framePadded)
    val hdrlBody = 4 + 8 + 56
    val riffBody = 4 + (8 + hdrlBody) + (8 + moviBody)
    tagw("RIFF"); le32w(riffBody); tagw("AVI ")
    tagw("LIST"); le32w(hdrlBody); tagw("hdrl")
    tagw("avih"); le32w(56)
    le32w(usPerFrame)                        // dwMicroSecPerFrame
    le32w(0); le32w(0); le32w(0)             // maxBytesPerSec, padding, flags
    le32w(nFrames)                           // dwTotalFrames
    le32w(0); le32w(1); le32w(0)             // initialFrames, streams, bufSize
    le32w(width); le32w(height)              // dwWidth, dwHeight
    (0 until 4).foreach(_ => le32w(0))       // reserved
    tagw("LIST"); le32w(moviBody); tagw("movi")
    (0 until nFrames).foreach { k =>
      tagw("00db"); le32w(frameLen)
      val pix = pixOf(k) & 0xff
      (0 until frameLen).foreach(_ => out.write(pix))
      if ((frameLen & 1) == 1) out.write(0)  // 2-byte chunk alignment
    }
    out.toByteArray
  }
}
