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

  // ---- audio (AudioDecode) -------------------------------------------

  test("WAV headers decode to exact rate/channels/samples/duration") {
    val m = AudioDecode.parseWav(AudioDecode.wavBytes(8000, 1, 500, 1600))
    assert(m.fmt == "wav" && m.err == null)
    assert(m.sampleRate == 8000 && m.channels == 1 && m.bits == 16)
    assert(m.nSamples == 1600L && m.durationMs == 200L)
    val st = AudioDecode.parseWav(AudioDecode.wavBytes(16000, 2, 300, 320))
    assert(st.channels == 2 && st.nSamples == 320L && st.durationMs == 20L)
  }

  test("corrupt WAV payloads quarantine into err instead of throwing") {
    assert(AudioDecode.parseWav(null).err == "truncated")
    assert(AudioDecode.parseWav("RIFFxx".getBytes).err == "truncated")
    assert(AudioDecode.parseWav("NOTRIFFNOTWAVE".getBytes).err == "unknown_format")
    val full = AudioDecode.wavBytes(8000, 1, 500, 160)
    assert(AudioDecode.parseWav(full.take(100)).err == "truncated_data")
    // fmt chunk present, data chunk missing
    assert(AudioDecode.parseWav(full.take(36)).err == "missing_chunk")
    // non-PCM codec id
    val alaw = full.clone(); alaw(20) = 6
    assert(AudioDecode.parseWav(alaw).err == "unsupported_codec_6")
    // chunk size near 2^31 must end the walk, not overflow the offset
    val evil = full.clone()
    evil(16) = 0xf0.toByte; evil(17) = 0xff.toByte
    evil(18) = 0xff.toByte; evil(19) = 0x7f.toByte
    assert(AudioDecode.parseWav(evil).err == "missing_chunk")
  }

  test("frame sampling emits every 3rd complete 20ms frame with exact RMS") {
    import spark.implicits._
    // 8000 Hz mono: 160 samples per 20ms frame; 7 complete frames (+ a
    // partial tail that must be ignored) -> sampled frames k = 0, 3, 6
    val df = Seq(
      (1L, AudioDecode.wavBytes(8000, 1, 700, 7 * 160 + 80)),
      (2L, AudioDecode.wavBytes(16000, 2, 250, 4 * 320)), // stereo: k = 0, 3
      (3L, "RIFFxx".getBytes)).toDF("doc_id", "payload")
    val frames = AudioDecode.sampleFrames(AudioDecode.decode(df))
      .select("doc_id", "frame_idx", "frame_rms").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(frames.keySet == Set((1L, 0), (1L, 3), (1L, 6), (2L, 0), (2L, 3)))
    assert(frames.values.toSet == Set(700L, 250L)) // constant wave -> rms = amplitude
    assert(frames((1L, 0)) == 700L && frames((2L, 3)) == 250L)
  }

  // ---- video (VideoDecode) -------------------------------------------

  test("AVI headers decode to exact rate/dimensions/frames/duration") {
    val m = VideoDecode.parseAvi(VideoDecode.aviBytes(320, 240, 40000, 25, _ => 50))
    assert(m.fmt == "avi" && m.err == null)
    assert(m.usPerFrame == 40000 && m.width == 320 && m.height == 240)
    assert(m.nFrames == 25L && m.durationMs == 1000L)
  }

  test("corrupt AVI payloads quarantine into err instead of throwing") {
    assert(VideoDecode.parseAvi(null).err == "truncated")
    assert(VideoDecode.parseAvi("RIFFxx".getBytes).err == "truncated")
    assert(VideoDecode.parseAvi("NOTRIFFNOTAVI_".getBytes).err == "unknown_format")
    val full = VideoDecode.aviBytes(16, 12, 40000, 3, _ => 50)
    // header LIST present, movi LIST cut off
    assert(VideoDecode.parseAvi(full.take(84)).err == "missing_movi")
    // zero-µs frame rate is a bad header, not a divide crash
    assert(VideoDecode.parseAvi(VideoDecode.aviBytes(16, 12, 0, 3, _ => 50)).err == "bad_header")
    // chunk size near 2^31 must end the walk, not overflow the offset
    val evil = full.clone()
    evil(16) = 0xf0.toByte; evil(17) = 0xff.toByte
    evil(18) = 0xff.toByte; evil(19) = 0x7f.toByte
    assert(VideoDecode.parseAvi(evil).err != null)
  }

  test("video frame sampling emits every 2nd frame with exact mean luma") {
    import spark.implicits._
    // 5 frames, frame k's pixels all = 100 + 10k -> sampled k = 0, 2, 4
    val df = Seq(
      (1L, VideoDecode.aviBytes(16, 12, 40000, 5, k => 100 + 10 * k)),
      (2L, "RIFFxx".getBytes)).toDF("doc_id", "payload")
    val frames = VideoDecode.sampleFrames(VideoDecode.decode(df))
      .select("doc_id", "frame_idx", "frame_mean").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(frames.keySet == Set((1L, 0), (1L, 2), (1L, 4)))
    assert(frames((1L, 0)) == 100L && frames((1L, 2)) == 120L && frames((1L, 4)) == 140L)
  }

  test("q95 end-to-end: per-rate decode + frame aggregates over the 240-payload fixture") {
    val rows = MultimodalOps.defs("q95_video_frames")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => r.getAs[String]("rate") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_err"), r.getAs[Long]("n_frames")))).toMap
    assert(rows.keySet == Set("(bad)", "20000", "33000", "40000"))
    assert(rows("(bad)") == ((60L, 60L, 0L)))
    assert(rows("40000")._1 == 60 && rows("40000")._2 == 0)
    assert(rows("40000")._3 > 0 && rows("33000")._3 > 0 && rows("20000")._3 > 0)
  }

  // ---- resize (ImageResize) ------------------------------------------

  test("BMP resize decimates to the exact fitting dimensions and round-trips through decode") {
    // 40×30 into a 16×16 box: s = max(ceil(40/16), ceil(30/16)) = 3 -> 14×10
    val in = ImageResize.bmpPixBytes(40, 30, r => 50 + r)
    val r = ImageResize.resizeBmp(in, 16, 16)
    assert(r.err == null && r.width == 14 && r.height == 10)
    // sampled rows j·3: pixels = 50 + 3j -> Σ bytes = 14·3·Σ(50 + 3j)
    assert(r.sumPx == 14L * 3 * ((0 until 10).map(j => 50 + 3 * j).sum))
    // the output is itself a decodable BMP with the new dimensions
    assert(parseHeader(r.payload) == Header("bmp", 14, 10, null))
    // already-fitting payloads pass through at stride 1, dims unchanged
    val small = ImageResize.resizeBmp(ImageResize.bmpPixBytes(12, 9, _ => 7), 16, 16)
    assert(small.err == null && small.width == 12 && small.height == 9)
    assert(small.sumPx == 12L * 3 * 9 * 7)
  }

  test("non-resizable payloads quarantine into resize_err instead of throwing") {
    assert(ImageResize.resizeBmp(null, 16, 16).err == "empty")
    assert(ImageResize.resizeBmp(pngBytes(64, 64), 16, 16).err == "unsupported_fmt")
    assert(ImageResize.resizeBmp(bmpBytes(20, 20), 16, 16).err == "truncated_pixels")
    val trunc = ImageResize.bmpPixBytes(20, 20, _ => 9).take(154)
    assert(ImageResize.resizeBmp(trunc, 16, 16).err == "truncated_pixels")
    val bpp8 = ImageResize.bmpPixBytes(20, 20, _ => 9)
    bpp8(28) = 8
    assert(ImageResize.resizeBmp(bpp8, 16, 16).err == "unsupported_bpp_8")
    // a crafted width near 2^31/3 must fail the length check, not
    // overflow the stride into a negative allocation
    val evilW = bmpBytes(0x30000000, 2)
    assert(ImageResize.resizeBmp(evilW, 16, 16).err == "truncated_pixels")
    assert(ImageHash.blockHash64(evilW)._2 == "truncated_pixels")
    // height = Int.MinValue survives math.abs still negative; it must
    // quarantine as bad_dimensions, not wrap the output allocation
    // negative (resize) or silently hash to 0 (blockhash)
    val evilH = ImageResize.bmpPixBytes(40, 2, _ => 9)
    evilH(22) = 0; evilH(23) = 0; evilH(24) = 0; evilH(25) = 0x80.toByte
    assert(ImageResize.resizeBmp(evilH, 16, 16).err == "bad_dimensions")
    assert(ImageHash.blockHash64(evilH)._2 == "bad_dimensions")
  }

  test("q96 end-to-end: per-outcome resize aggregates over the 200-payload fixture") {
    val rows = MultimodalOps.defs("q96_image_resize")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => r.getAs[String]("status") ->
        ((r.getAs[Long]("n"), r.getAs[Any]("sum_w")))).toMap
    assert(rows.keySet == Set("ok", "truncated_pixels"))
    assert(rows("ok")._1 == 134 && rows("truncated_pixels")._1 == 66)
    assert(rows("truncated_pixels")._2 == null) // no dims for quarantined rows
  }

  // ---- perceptual hash (ImageHash) -----------------------------------

  test("block hash packs the 8x8 block pattern exactly; a one-block edit flips one bit") {
    // pattern byte 0b10110001 replicated per block row
    def img(invert00: Boolean) = ImageHash.bmpGridBytes(32, 32, (r, c) => {
      val bit = ((0xb1 >> (c / 4)) & 1) == 1
      val inv = invert00 && r / 4 == 0 && c / 4 == 0
      if (bit ^ inv) 200 else 50
    })
    val (h0, e0) = ImageHash.blockHash64(img(invert00 = false))
    assert(e0 == null)
    val expected = (0 until 8).map(bi => 0xb1L << (8 * bi)).reduce(_ | _)
    assert(h0 == expected)
    val (h1, _) = ImageHash.blockHash64(img(invert00 = true))
    assert(java.lang.Long.bitCount(h0 ^ h1) == 1 && (h0 ^ h1) == 1L)
    // exact content copy -> identical hash
    val (h2, _) = ImageHash.blockHash64(img(invert00 = false))
    assert(h0 == h2)
  }

  test("non-hashable payloads quarantine into hash_err instead of throwing") {
    assert(ImageHash.blockHash64(null)._2 == "empty")
    assert(ImageHash.blockHash64(pngBytes(64, 64))._2 == "unsupported_fmt")
    assert(ImageHash.blockHash64(bmpBytes(20, 20))._2 == "truncated_pixels")
    assert(ImageHash.blockHash64("BMx".getBytes)._2 == "truncated")
  }

  test("q97 end-to-end: exactly the planted near-dup pairs at their exact Hamming distances") {
    val rows = MultimodalOps.defs("q97_image_neardup")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) -> r.getAs[Long]("hamming"))
    assert(rows.length == 180) // 60 scenes x 3 pairs, nothing cross-scene
    val m = rows.toMap
    assert(m((0L, 1L)) == 0L && m((0L, 2L)) == 1L && m((1L, 2L)) == 1L)
    assert(m((236L, 238L)) == 1L) // last scene
    assert(!m.keySet.exists { case (a, b) => a / 4 != b / 4 }) // no cross-scene pair
  }

  test("FingerprintIndex lifecycle: build, probe, append-on-commit, staged replay") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-fpidx").toString
    // fingerprints with known Hamming geometry: 0x0F vs 0x0E differ in 1
    // bit; 0xF0F0... is far from both
    FingerprintIndex.build(spark, root, Seq((1L, 0x0FL), (2L, 0xF0F0F0F0L)).toDF("doc_id", "fp"))
    val p1 = FingerprintIndex.probe(spark, root, Seq((10L, 0x0EL)).toDF("doc_id", "fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(p1.toSeq == Seq((10L, 1L, 1L)))
    // append-on-commit: the next probe sees the appended fingerprint
    FingerprintIndex.append(spark, root, Seq((10L, 0x0EL)).toDF("doc_id", "fp"))
    val p2 = FingerprintIndex.probe(spark, root, Seq((11L, 0x0EL)).toDF("doc_id", "fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._2)
    assert(p2.toSeq == Seq((11L, 1L, 1L), (11L, 10L, 0L)))
    // a replayed doc never suppresses itself (same keyed id dropped)
    val p3 = FingerprintIndex.probe(spark, root, Seq((10L, 0x0EL)).toDF("doc_id", "fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(p3.toSeq == Seq((10L, 1L, 1L))) // its own indexed entry is dropped
    // staged append replay converges to exactly one copy of the token
    FingerprintIndex.appendStaged(spark, root, Seq((20L, 0xFFL)).toDF("doc_id", "fp"), "t1")
    FingerprintIndex.appendStaged(spark, root, Seq((20L, 0xFFL)).toDF("doc_id", "fp"), "t1")
    val store = spark.read.parquet(s"$root/${FingerprintIndex.Store}")
    assert(store.filter(col("doc_id") === 20L).count() == 1)
    // selfEdges: the intra-batch window, a_id < b_id, exact Hamming
    val se = FingerprintIndex.selfEdges(
      Seq((1L, 0x0FL), (2L, 0x0EL), (3L, 0xF0F0F0F0L)).toDF("doc_id", "fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(se.toSeq == Seq((1L, 2L, 1L)))
    // compact preserves content
    val before = store.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    FingerprintIndex.compact(spark, root)
    val after = spark.read.parquet(s"$root/${FingerprintIndex.Store}")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(before.sameElements(after))
  }

  test("q99 end-to-end: batch-vs-index probe finds exactly the planted matches") {
    val rows = MultimodalOps.defs("q99_image_fp_probe")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("old_id")) -> r.getAs[Long]("hamming"))
    assert(rows.length == 120) // per scene: v1->v0 at 0, v2->v0 at 1
    val m = rows.toMap
    assert(m((1L, 0L)) == 0L && m((2L, 0L)) == 1L)
    assert(m((237L, 236L)) == 0L && m((238L, 236L)) == 1L)
    assert(rows.forall { case ((n, o), _) => n / 4 == o / 4 }) // no cross-scene
  }

  test("variable-amplitude WAV frames carry their exact per-frame RMS") {
    import spark.implicits._
    val amps = Seq(200, 300, 200, 100, 200, 300)
    val df = Seq((1L, AudioDecode.wavBytesVar(8000, amps, 160))).toDF("doc_id", "payload")
    val frames = AudioDecode.sampleFrames(AudioDecode.decode(df), everyNth = 1)
      .select("frame_idx", "frame_rms").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(frames == amps.indices.map(i => i -> amps(i).toLong).toMap)
  }

  test("q98 end-to-end: exactly the planted audio near-dup pairs at their Hamming distances") {
    val rows = MultimodalOps.defs("q98_audio_neardup")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) -> r.getAs[Long]("hamming"))
    assert(rows.length == 180)
    val m = rows.toMap
    assert(m((0L, 1L)) == 0L && m((0L, 2L)) == 1L && m((1L, 2L)) == 1L)
    assert(!m.keySet.exists { case (a, b) => a / 4 != b / 4 })
  }

  test("q102 end-to-end: exactly the planted video near-dup pairs at their Hamming distances") {
    val rows = MultimodalOps.defs("q102_video_neardup")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) -> r.getAs[Long]("hamming"))
    assert(rows.length == 180)
    val m = rows.toMap
    assert(m((0L, 1L)) == 0L && m((0L, 2L)) == 1L && m((1L, 2L)) == 1L)
    assert(m((236L, 238L)) == 1L)
    assert(!m.keySet.exists { case (a, b) => a / 4 != b / 4 })
  }

  test("collapsed forms equal the closure of their own pair forms, per modality") {
    import spark.implicits._
    for ((groupsQ, pairsQ) <- Seq(
        "q100_image_neardup_groups" -> "q97_image_neardup",
        "q101_audio_neardup_groups" -> "q98_audio_neardup",
        "q103_video_neardup_groups" -> "q102_video_neardup")) {
      val pairs = MultimodalOps.defs(pairsQ)(spark, "/root/testdata/sf0.001")
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      // closure by brute force over the collected pair list
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
      pairs.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
      }
      val expected = parent.keys.groupBy(find).map { case (rep, ms) => (rep, ms.size.toLong) }
        .toSeq.sorted
      val got = MultimodalOps.defs(groupsQ)(spark, "/root/testdata/sf0.001")
        .collect().map(r => (r.getAs[Long]("rep"), r.getAs[Long]("n_members"))).toSeq
      assert(got == expected, s"$groupsQ vs closure of $pairsQ")
      assert(got.length == 60 && got.forall(_._2 == 3L), s"$groupsQ cluster shape")
    }
  }

  test("q58 end-to-end: per-rate decode + frame aggregates over the 240-payload fixture") {
    val rows = MultimodalOps.defs("q58_audio_frames")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => r.getAs[String]("rate") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_err"), r.getAs[Long]("n_frames")))).toMap
    // 60 payloads per class; nf cycles 5..14 over ids, sampled = ceil(nf/3)
    assert(rows.keySet == Set("(bad)", "16000", "44100", "8000"))
    assert(rows("(bad)") == ((60L, 60L, 0L)))
    assert(rows("8000")._1 == 60 && rows("8000")._2 == 0)
    assert(rows("8000")._3 > 0 && rows("16000")._3 > 0 && rows("44100")._3 > 0)
  }
}
