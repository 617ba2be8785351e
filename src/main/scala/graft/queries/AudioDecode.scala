package graft.queries

import java.io.ByteArrayOutputStream
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** X5's audio member: batched decode + frame-sampling feature extraction
  * over binary WAV payloads — the audio analogue of [[ImageDecode]]
  * (SURVEY.md §2.10 X5; north-star multimodal surface).
  *
  * Two stages, both streamed `mapPartitions` (one payload resident per
  * task at a time, so task memory is bounded by the largest payload):
  *
  *  - [[decode]] parses the RIFF/WAVE header chain (fmt + data chunks)
  *    into typed columns (sample_rate, channels, bits, n_samples,
  *    duration_ms); failures land in `decode_err`, never exceptions.
  *  - [[sampleFrames]] is the frame-sampler a training pipeline needs:
  *    every `everyNth`-th complete `frameMs` window of PCM is reduced to
  *    one feature row (frame RMS over interleaved channels). Output rows
  *    ≈ payload_count × duration/(frameMs×everyNth) — a bounded,
  *    columnar frame table that downstream dedup/stats query without
  *    ever touching payload bytes again.
  *
  * The codec is a pure-JVM PCM16 parser (no native audio libs in this
  * container); a real deployment swaps the sample loop for a full codec
  * behind the same column contract.
  */
object AudioDecode {
  final case class Meta(fmt: String, sampleRate: Integer, channels: Integer,
      bits: Integer, nSamples: java.lang.Long, durationMs: java.lang.Long, err: String)

  private def le16(b: Array[Byte], o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private val NoMeta = (null: Integer, null: Integer, null: Integer,
    null: java.lang.Long, null: java.lang.Long)
  private def bad(fmt: String, err: String): Meta =
    Meta(fmt, NoMeta._1, NoMeta._2, NoMeta._3, NoMeta._4, NoMeta._5, err)

  /** Parse one WAV payload's chunk chain. Total, never throws.
    * `(dataOff, dataLen)` for the PCM region come back via the returned
    * meta's nSamples (per channel) — the byte range itself is re-derived
    * by [[sampleFrames]] so the meta stays a plain serializable row. */
  def parseWav(b: Array[Byte]): Meta = {
    if (b == null || b.length < 12) return bad(null, "truncated")
    if (tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return bad(null, "unknown_format")
    var off = 12
    var rate, ch, bits = -1
    var codec = -1
    var dataLen = -1
    while (off + 8 <= b.length && (rate < 0 || dataLen < 0)) {
      val id = tag(b, off)
      val sz = le32(b, off + 4)
      if (sz < 0) return bad("wav", "bad_chunk")
      if (id == "fmt ") {
        if (off + 8 + 16 > b.length) return bad("wav", "truncated")
        codec = le16(b, off + 8)
        ch = le16(b, off + 10)
        rate = le32(b, off + 12)
        bits = le16(b, off + 22)
      } else if (id == "data") {
        dataLen = math.min(sz, b.length - off - 8) // tolerate truncated tail
        if (dataLen < sz) return bad("wav", "truncated_data")
      }
      // 2-byte-aligned advance in Long space: a crafted sz near 2^31 must
      // end the walk, not overflow off into a negative index
      val next = off.toLong + 8L + sz + (sz & 1)
      off = if (next > b.length.toLong) b.length else next.toInt
    }
    if (rate < 0 || dataLen < 0) return bad("wav", "missing_chunk")
    if (codec != 1) return bad("wav", s"unsupported_codec_$codec")
    if (ch <= 0 || rate <= 0 || bits != 16) return bad("wav", "bad_format")
    val nSamples = dataLen.toLong / (ch * 2)
    Meta("wav", rate, ch, bits, nSamples, nSamples * 1000L / rate, null)
  }

  /** Decode `payloadCol` across the frame: appends (audio_fmt,
    * sample_rate, channels, bits, n_samples, duration_ms, decode_err). */
  def decode(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val outSchema = df.schema
      .add("audio_fmt", StringType).add("sample_rate", IntegerType)
      .add("channels", IntegerType).add("bits", IntegerType)
      .add("n_samples", LongType).add("duration_ms", LongType)
      .add("decode_err", StringType)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.map { row =>
        val m = parseWav(row.getAs[Array[Byte]](idx))
        Row.fromSeq(row.toSeq ++ Seq(m.fmt, m.sampleRate, m.channels, m.bits,
          m.nSamples, m.durationMs, m.err))
      }
    }(Encoders.row(outSchema))
  }

  /** PCM data offset of a well-formed payload (the chunk walk again —
    * kept out of [[Meta]] so decode output stays plain columns). */
  private def dataOffset(b: Array[Byte]): Int = {
    var off = 12
    while (off + 8 <= b.length) {
      if (tag(b, off) == "data") return off + 8
      val sz = le32(b, off + 4)
      if (sz < 0) return -1
      val next = off.toLong + 8L + sz + (sz & 1)
      off = if (next > b.length.toLong) b.length else next.toInt
    }
    -1
  }

  /** Frame-sample valid PCM16 payloads: one output row per sampled frame
    * — frame k (complete `frameMs` windows only, k ≡ 0 mod `everyNth`)
    * reduces to rms = round(sqrt(mean(sample²))) over the frame's
    * interleaved samples. Rows with decode_err are dropped (they stay on
    * the decode surface; this is the feature path). */
  def sampleFrames(decoded: DataFrame, payloadCol: String = "payload",
                   frameMs: Int = 20, everyNth: Int = 3): DataFrame = {
    val fields = decoded.schema.fieldNames
    val keep = fields.filter(f => f != payloadCol).toSeq
    val outSchema = StructType(
      keep.map(f => decoded.schema(f)) ++
        Seq(StructField("frame_idx", IntegerType), StructField("frame_rms", LongType)))
    val pIdx = decoded.schema.fieldIndex(payloadCol)
    val keepIdx = keep.map(decoded.schema.fieldIndex)
    val errIdx = decoded.schema.fieldIndex("decode_err")
    val rateIdx = decoded.schema.fieldIndex("sample_rate")
    val chIdx = decoded.schema.fieldIndex("channels")
    val nIdx = decoded.schema.fieldIndex("n_samples")
    decoded.mapPartitions { it =>
      it.flatMap { row =>
        if (!row.isNullAt(errIdx) || row.isNullAt(rateIdx)) Iterator.empty
        else {
          val b = row.getAs[Array[Byte]](pIdx)
          val rate = row.getInt(rateIdx)
          val ch = row.getInt(chIdx)
          val nPerCh = row.getLong(nIdx)
          val off = dataOffset(b)
          val frameSamples = rate.toLong * frameMs / 1000
          val nFrames = if (frameSamples == 0) 0L else nPerCh / frameSamples
          val base = keepIdx.map(row.get)
          (0L until nFrames).iterator
            .filter(_ % everyNth == 0)
            .map { k =>
              val start = off + k * frameSamples * ch * 2
              var sum2 = 0.0
              var i = 0
              val n = (frameSamples * ch).toInt
              while (i < n) {
                val s = (le16(b, (start + i * 2).toInt).toShort).toDouble
                sum2 += s * s
                i += 1
              }
              Row.fromSeq(base ++ Seq[Any](k.toInt, math.round(math.sqrt(sum2 / n))))
            }
        }
      }
    }(Encoders.row(outSchema))
  }

  // ---- deterministic fixture payloads (also used by the spec) --------

  /** Minimal PCM16 WAV: RIFF/WAVE + fmt + data, every sample = the
    * constant `amplitude` on every channel (so any frame's RMS is
    * exactly `amplitude` — DuckDB recomputes features without parsing). */
  def wavBytes(rate: Int, channels: Int, amplitude: Int, nSamplesPerChannel: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def le16w(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    def le32w(v: Int): Unit = (0 until 4).foreach(i => out.write((v >>> (8 * i)) & 0xff))
    def tagw(s: String): Unit = out.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val dataLen = nSamplesPerChannel * channels * 2
    tagw("RIFF"); le32w(36 + dataLen); tagw("WAVE")
    tagw("fmt "); le32w(16)
    le16w(1); le16w(channels); le32w(rate)
    le32w(rate * channels * 2); le16w(channels * 2); le16w(16)
    tagw("data"); le32w(dataLen)
    (0 until nSamplesPerChannel * channels).foreach(_ => le16w(amplitude))
    out.toByteArray
  }

  /** Mono PCM16 WAV with per-FRAME constant amplitudes: frame f's
    * `samplesPerFrame` samples all equal `amps(f)`, so frame f's RMS is
    * exactly `amps(f)` — the variable-amplitude fixture the audio
    * fingerprint (q98) encodes its delta bits in. */
  def wavBytesVar(rate: Int, amps: Seq[Int], samplesPerFrame: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def le16w(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    def le32w(v: Int): Unit = (0 until 4).foreach(i => out.write((v >>> (8 * i)) & 0xff))
    def tagw(s: String): Unit = out.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val dataLen = amps.length * samplesPerFrame * 2
    tagw("RIFF"); le32w(36 + dataLen); tagw("WAVE")
    tagw("fmt "); le32w(16)
    le16w(1); le16w(1); le32w(rate)
    le32w(rate * 2); le16w(2); le16w(16)
    tagw("data"); le32w(dataLen)
    amps.foreach(a => (0 until samplesPerFrame).foreach(_ => le16w(a)))
    out.toByteArray
  }
}
