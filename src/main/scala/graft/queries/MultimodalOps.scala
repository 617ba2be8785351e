package graft.queries

import java.io.File
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.mutable
import graft.engine.Tables
import graft.pipeline.DemoCache

/** X5: multimodal columns — image/audio/video payloads carried as opaque
  * `binary` columns with typed, queryable metadata (SURVEY.md §2.10 X5).
  *
  * The corpus-side design for a 100 TB training-data lake:
  *   - the payload is BinaryType, never parsed by the engine itself;
  *   - per-payload metadata (size, content fingerprint, decoded
  *     dimensions) are ordinary columns so selection/dedup/stats stay
  *     columnar and pruned — a scan that only needs `modality` and
  *     `byte_len` never touches the bytes;
  *   - the DECODE boundary is REAL (q56): [[ImageDecode.decode]] is a
  *     streamed `mapPartitions` stage parsing PNG/BMP headers in pure
  *     JVM code — bounded memory (one payload per task at a time),
  *     decode failures quarantined into a `decode_err` column, metadata
  *     results as ordinary columns. q42 keeps the arithmetic
  *     dimension-derivation variant because its point is the
  *     metadata-only aggregate shape (every column DuckDB-verifiable
  *     from `documents.text` via `encode()`/`sha256()`/`octet_length()`).
  */
object MultimodalOps {
  type Q = (SparkSession, String) => DataFrame

  /** Arithmetic dimension derivation for q42's metadata-shape demo (the
    * real byte-parsing decode is [[ImageDecode.decode]], q56). */
  private def fakeDecode(df: DataFrame): DataFrame =
    df.withColumn("width", lit(320) + col("byte_len") % 1280)
      .withColumn("height", lit(240) + (col("byte_len") * 7) % 720)

  /** Deterministic binary image corpus for the decode demo: 300 payloads,
    * ids ≡ 0 (mod 3) valid PNG, ≡ 1 valid BMP, ≡ 2 corrupt bytes —
    * dimensions a pure function of the id so DuckDB can recompute every
    * aggregate without parsing a byte. */
  private def imageFixture(s: SparkSession): DataFrame = {
    val rows = (0 until 300).map { id =>
      val w = 16 + id % 480
      val h = 16 + (id * 3) % 360
      val payload = (id % 3) match {
        case 0 => ImageDecode.pngBytes(w, h)
        case 1 => ImageDecode.bmpBytes(w, h)
        case _ => Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) // truncated JPEG-ish
      }
      Row(id.toLong, payload)
    }
    s.createDataFrame(s.sparkContext.parallelize(rows, 4),
      StructType(Seq(StructField("doc_id", LongType), StructField("payload", BinaryType))))
  }

  /** Deterministic binary WAV corpus for the audio demo: 240 payloads,
    * id ≡ 0/1/3 (mod 4) valid PCM16 at 8000/16000(stereo)/44100 Hz with
    * every sample = 100·(1 + id % 50) and exactly 5 + id % 10 complete
    * 20 ms frames; id ≡ 2 is a truncated RIFF. Every frame/duration
    * feature is a pure function of the id, so DuckDB recomputes the
    * aggregates without parsing a byte. */
  /** Fixture-frame memo — round 22. The six deterministic binary
    * corpora (BMP/WAV/AVI byte payloads) were synthesized ON THE DRIVER
    * on every call: q101's profile showed 0.75-1.0 s/run of driver
    * residue against 0.34-0.57 s of actual job time, most of it the 240
    * WAV payload builds. Input construction is the category Bench
    * already pre-builds OUTSIDE the timed loop for the lake demos; the
    * fixtures are pure functions of the id, so memoize the constructed
    * frame per (session, fixture). Decode / fingerprint / pair compute
    * still runs distributed on every action.  */
  private val fixtureCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def fixture(s: SparkSession, name: String)
                     (build: => DataFrame): DataFrame =
    fixtureCache.computeIfAbsent(
      s"${System.identityHashCode(s)}|$name", _ => build)

  private def audioFixture(s: SparkSession): DataFrame = fixture(s, "audioFixture") {
    val rows = (0 until 240).map { id =>
      val amp = 100 * (1 + id % 50)
      val nf = 5 + id % 10
      val payload = (id % 4) match {
        case 0 => AudioDecode.wavBytes(8000, 1, amp, nf * 160)
        case 1 => AudioDecode.wavBytes(16000, 2, amp, nf * 320)
        case 3 => AudioDecode.wavBytes(44100, 1, amp, nf * 882)
        case _ => "RIFFxx".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      }
      Row(id.toLong, payload)
    }
    s.createDataFrame(s.sparkContext.parallelize(rows, 4),
      StructType(Seq(StructField("doc_id", LongType), StructField("payload", BinaryType))))
  }

  /** Deterministic binary AVI corpus for the video demo: 240 payloads,
    * id ≡ 0/1/3 (mod 4) valid 8-bit uncompressed video at 40000/33000/
    * 20000 µs per frame with exactly 4 + id % 6 frames, frame k filled
    * with the constant pixel 10 + id % 100 + k; id ≡ 2 is a truncated
    * RIFF. Every frame/duration feature is a pure function of the id,
    * so DuckDB recomputes the aggregates without parsing a byte. */
  private def videoFixture(s: SparkSession): DataFrame = fixture(s, "videoFixture") {
    val rows = (0 until 240).map { id =>
      val base = 10 + id % 100
      val nf = 4 + id % 6
      val pix = (k: Int) => base + k
      val payload = (id % 4) match {
        case 0 => VideoDecode.aviBytes(16, 12, 40000, nf, pix)
        case 1 => VideoDecode.aviBytes(32, 18, 33000, nf, pix)
        case 3 => VideoDecode.aviBytes(8, 8, 20000, nf, pix)
        case _ => "RIFFxx".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      }
      Row(id.toLong, payload)
    }
    s.createDataFrame(s.sparkContext.parallelize(rows, 4),
      StructType(Seq(StructField("doc_id", LongType), StructField("payload", BinaryType))))
  }

  /** Deterministic 24bpp BMP corpus for the resize demo: 200 payloads,
    * id ≡ 0 (mod 3) oversized (40-55 × 30-37, decimated), ≡ 1 already
    * fitting (8-16 × 6-10, pass-through at stride 1), ≡ 2 header-valid
    * but pixel-truncated. Stored row r's pixels all equal
    * 10 + id % 90 + r, so any decimation's pixel sum is a closed form
    * DuckDB recomputes without parsing a byte. */
  private def resizeFixture(s: SparkSession): DataFrame = fixture(s, "resizeFixture") {
    val rows = (0 until 200).map { id =>
      val base = 10 + id % 90
      val payload = (id % 3) match {
        case 0 => ImageResize.bmpPixBytes(40 + id % 16, 30 + id % 8, r => base + r)
        case 1 => ImageResize.bmpPixBytes(8 + id % 9, 6 + id % 5, r => base + r)
        case _ => ImageResize.bmpPixBytes(20, 20, _ => base).take(54 + 100)
      }
      Row(id.toLong, payload)
    }
    s.createDataFrame(s.sparkContext.parallelize(rows, 4),
      StructType(Seq(StructField("doc_id", LongType), StructField("payload", BinaryType))))
  }

  /** Deterministic image corpus for the perceptual near-dup demo: 60
    * scenes × 4 variants (id = scene·4 + v) as 32×32 24bpp BMPs built
    * from an 8×8 block pattern — block (bi,bj) is bright (200) iff bit
    * bj of the scene's pattern byte is set, identically per block row.
    *   v0, v1: the scene pattern (v1 is an exact perceptual dup of v0)
    *   v2: the scene pattern with block (0,0) inverted (Hamming 1)
    *   v3: the bit-inverted pattern (Hamming 64 — unrelated image)
    * Cross-scene Hamming is ≥ 8 (pattern bytes differ in ≥1 bit, each
    * replicated over 8 block rows), so the ≤3 near-dup set is exactly
    * {(v0,v1,0), (v0,v2,1), (v1,v2,1)} per scene — a closed form.
    * Ids 240-249 are corrupt payloads exercising the hash_err filter. */
  private def hashFixture(s: SparkSession): DataFrame = fixture(s, "hashFixture") {
    val rows = (0 until 250).map { id =>
      val payload = if (id >= 240) "BMx".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      else {
        val scene = id / 4
        val pattern = if (id % 4 == 3) scene ^ 0xff else scene
        ImageHash.bmpGridBytes(32, 32, (r, c) => {
          val bi = r / 4; val bj = c / 4
          val bit = ((pattern >> bj) & 1) == 1
          val inv = id % 4 == 2 && bi == 0 && bj == 0
          if (bit ^ inv) 200 else 50
        })
      }
      Row(id.toLong, payload)
    }
    s.createDataFrame(s.sparkContext.parallelize(rows, 4),
      StructType(Seq(StructField("doc_id", LongType), StructField("payload", BinaryType))))
  }

  /** Deterministic WAV corpus for the audio near-dup demo: 60 scenes ×
    * 4 variants (id = scene·4 + v), 8000 Hz mono, 129 20 ms frames per
    * payload. Frames encode a 64-bit pattern as RMS DELTAS — frame 2k
    * has amplitude 200, frame 2k+1 has 300 if pattern bit k is set else
    * 100 — so fingerprint bit k (rms[2k+1] > rms[2k]) EQUALS pattern
    * bit k. Patterns are the scene byte replicated 8× (cross-scene
    * Hamming ≥ 8); variants mirror the q97 scheme: v0/v1 exact dups,
    * v2 one flipped bit, v3 the bit-inverse. Ids 240-249 are corrupt. */
  private def audioNdFixture(s: SparkSession): DataFrame = fixture(s, "audioNdFixture") {
    val rows = (0 until 250).map { id =>
      val payload = if (id >= 240) "RIFFxx".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      else {
        val scene = id / 4
        val base = if (id % 4 == 3) scene ^ 0xff else scene
        val pattern = (0 until 8).map(bi => base.toLong << (8 * bi)).reduce(_ | _) ^
          (if (id % 4 == 2) 1L else 0L)
        val amps = (0 until 129).map { f =>
          if (f % 2 == 0) 200
          else if (((pattern >>> (f / 2)) & 1L) == 1L) 300 else 100
        }
        AudioDecode.wavBytesVar(8000, amps, 160)
      }
      Row(id.toLong, payload)
    }
    s.createDataFrame(s.sparkContext.parallelize(rows, 4),
      StructType(Seq(StructField("doc_id", LongType), StructField("payload", BinaryType))))
  }

  /** Build (or return) the q99 fingerprint-index root: the durable
    * [[FingerprintIndex]] over the v0 images of [[hashFixture]] — the
    * "already-ingested corpus" the q99 batch probes, built once per sf
    * under [[DemoCache]] exactly like [[MinHashIndex.ensure]]. */
  private val fpBuilt = mutable.Map.empty[String, String]
  def ensureFpIndex(s: SparkSession, sfDir: String): String = synchronized {
    fpBuilt.getOrElseUpdate(sfDir, {
      val root = DemoCache.root(s"fpidx/${new File(sfDir).getName}")
      DemoCache.cached(root, sfDir) {
        FingerprintIndex.build(s, root.getPath,
          ImageHash.hash(hashFixture(s).filter(col("doc_id") % 4 === 0))
            .filter(col("hash_err").isNull)
            .select(col("doc_id"), col("img_hash").as("fp")))
      }
      root.getPath
    })
  }

  /** Deterministic AVI corpus for the video near-dup demo: the q98
    * scene/variant scheme over the THIRD modality — 60 scenes × 4
    * variants (id = scene·4 + v), 8×8 8-bit frames, 129 frames per
    * clip. Frames encode a 64-bit pattern as LUMA DELTAS — frame 2k has
    * constant pixel 150, frame 2k+1 has 250 if pattern bit k is set
    * else 50 — so fingerprint bit k (mean[2k+1] > mean[2k]) EQUALS
    * pattern bit k. Patterns are the scene byte replicated 8×
    * (cross-scene Hamming ≥ 8); v0/v1 exact dups, v2 one flipped bit,
    * v3 the bit-inverse. Ids 240-249 are corrupt RIFFs. */
  private def videoNdFixture(s: SparkSession): DataFrame = fixture(s, "videoNdFixture") {
    val rows = (0 until 250).map { id =>
      val payload = if (id >= 240) "RIFFxx".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      else {
        val scene = id / 4
        val base = if (id % 4 == 3) scene ^ 0xff else scene
        val pattern = (0 until 8).map(bi => base.toLong << (8 * bi)).reduce(_ | _) ^
          (if (id % 4 == 2) 1L else 0L)
        VideoDecode.aviBytes(8, 8, 40000, 129, k =>
          if (k % 2 == 0) 150
          else if (((pattern >>> (k / 2)) & 1L) == 1L) 250 else 50)
      }
      Row(id.toLong, payload)
    }
    s.createDataFrame(s.sparkContext.parallelize(rows, 4),
      StructType(Seq(StructField("doc_id", LongType), StructField("payload", BinaryType))))
  }

  /** Verified Hamming ≤ 3 pairs for the image / audio / video near-dup
    * fixtures — the shared q97/q98/q102 kernel bodies, split out so the
    * pair-form queries and their CLUSTER-collapsed forms (q100/q101/
    * q103) run the same plan up to the final shape. */
  private def imagePairs(s: SparkSession): DataFrame = {
    val hashed = ImageHash.hash(hashFixture(s))
      .filter(col("hash_err").isNull)
      .select(col("doc_id"), col("img_hash").as("simhash"))
    DedupOps.simhashCandidates(hashed)
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= 3)
      .select(col("a_id"), col("b_id"), col("hamming").cast("long").as("hamming"))
  }

  /** Pack a 64-bit rise/fall fingerprint from per-frame feature rows:
    * bit k = feature[2k+1] > feature[2k] (robust to uniform gain /
    * brightness — the delta-fingerprint family's shape), as ONE
    * higher-order codegen expression over the collected frame array. */
  private[graft] def deltaFingerprint(frames: DataFrame, featureCol: String): DataFrame =
    frames
      .groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("frame_idx"), col(featureCol))))
        .as("fr"))
      .select(col("doc_id"), expr(
        s"""aggregate(sequence(0, 63), CAST(0 AS BIGINT),
           (acc, k) -> acc | IF(fr[2*k+1].$featureCol > fr[2*k].$featureCol,
                                shiftleft(CAST(1 AS BIGINT), k),
                                CAST(0 AS BIGINT)))""").as("simhash"))

  private def audioPairs(s: SparkSession): DataFrame = {
    val decoded = AudioDecode.decode(audioNdFixture(s))
      .filter(col("decode_err").isNull)
    val fp = deltaFingerprint(
      AudioDecode.sampleFrames(decoded, everyNth = 1), "frame_rms")
    DedupOps.simhashCandidates(fp)
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= 3)
      .select(col("a_id"), col("b_id"), col("hamming").cast("long").as("hamming"))
  }

  private def videoPairs(s: SparkSession): DataFrame = {
    val decoded = VideoDecode.decode(videoNdFixture(s))
      .filter(col("decode_err").isNull)
    val fp = deltaFingerprint(
      VideoDecode.sampleFrames(decoded, everyNth = 1), "frame_mean")
    DedupOps.simhashCandidates(fp)
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= 3)
      .select(col("a_id"), col("b_id"), col("hamming").cast("long").as("hamming"))
  }

  /** Cluster-collapse a verified pair frame: `(rep, n_members)`, rep =
    * component-minimum doc_id — the q65 closure over multimodal edges,
    * removing the O(k²) pair-list caveat the pair forms document (a
    * k-payload boilerplate cluster emits k·(k−1)/2 pairs but exactly
    * one collapsed row). Same [[DedupOps.componentLabels]] operator the
    * text families use: driver union-find under the edge cap,
    * distributed min-label propagation above it. */
  private def collapsed(s: SparkSession, pairs: DataFrame): DataFrame = {
    val edgeList = QueryCaches.track(pairs.select(
      shiftleft(col("a_id").cast("long"), 32)
        .bitwiseOR(col("b_id").cast("long")).as("pk")))
    // componentSizes folds (rep, n_members) inside the driver
    // union-find pass and returns a pre-sorted local relation — the
    // groupBy/orderBy composition it replaces paid two 32-partition
    // exchanges over a local labels frame (round 21; rows identical,
    // DedupSpec pins it)
    DedupOps.componentSizes(s, edgeList)
  }

  val defs: Map[String, Q] = Map(
    // Per-modality corpus stats over binary payloads: row counts, byte
    // volume, fingerprint-distinct payloads (binary exact-dedup surface),
    // decoded-dimension ranges. One hash-partitioned aggregate.
    "q42_multimodal_stats" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
      val tagged = docs.select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
        col("text").cast("binary").as("payload"),
        expr("octet_length(text)").cast("long").as("byte_len"))
        .withColumn("fp", sha2(col("payload"), 256))
      fakeDecode(tagged)
        .groupBy("modality")
        .agg(
          count(lit(1)).as("n"),
          sum(col("byte_len")).as("total_bytes"),
          countDistinct(col("fp")).as("n_fp"),
          min(col("width")).as("min_width"),
          max(col("height")).as("max_height"))
        .orderBy("modality")
    }),

    // X5 decode boundary: real byte-level header decode over binary
    // payloads (streamed mapPartitions, failures to decode_err), then a
    // per-format metadata aggregate. Oracle recomputes the dimensions
    // from the id arithmetic the fixture used.
    "q56_image_decode" -> ((s, d) => {
      ImageDecode.decode(imageFixture(s))
        .groupBy(coalesce(col("fmt"), lit("(bad)")).as("fmt"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("width")).as("sum_w"),
          sum(col("height")).as("sum_h"),
          count(col("decode_err")).as("n_err"))
        .orderBy("fmt")
    }),

    // X5 audio: WAV header decode + every-3rd-20ms-frame RMS sampling
    // (AudioDecode), aggregated per sample rate with the corrupt group
    // kept visible. The frame table is the feature surface a training
    // pipeline joins/dedups on; payload bytes are touched exactly once.
    "q58_audio_frames" -> ((s, d) => {
      // decoded feeds both aggregate branches; persist so the fixture
      // build + header chunk-walk run once (the frame sampler's PCM walk
      // is inherently a second pass over the sampled windows only)
      val decoded = QueryCaches.track(AudioDecode.decode(audioFixture(s)))
      val frames = AudioDecode.sampleFrames(decoded)
      val byRate = decoded
        .groupBy(coalesce(col("sample_rate").cast("string"), lit("(bad)")).as("rate"))
        .agg(count(lit(1)).as("n"), count(col("decode_err")).as("n_err"),
          sum(col("duration_ms")).as("sum_ms"))
      val frameAgg = frames
        .groupBy(col("sample_rate").cast("string").as("rate"))
        .agg(count(lit(1)).as("n_frames"), sum(col("frame_rms")).as("sum_rms"))
      byRate.join(frameAgg, Seq("rate"), "left")
        .na.fill(0L, Seq("n_frames", "sum_rms"))
        .orderBy("rate")
    }),

    // X5 video: AVI container decode + every-2nd-frame mean-luma
    // sampling (VideoDecode), aggregated per frame rate with the
    // corrupt group kept visible — the q58 shape over the third
    // modality, completing X5's decode surface.
    "q95_video_frames" -> ((s, d) => {
      val decoded = QueryCaches.track(VideoDecode.decode(videoFixture(s)))
      val frames = VideoDecode.sampleFrames(decoded)
      val byRate = decoded
        .groupBy(coalesce(col("us_per_frame").cast("string"), lit("(bad)")).as("rate"))
        .agg(count(lit(1)).as("n"), count(col("decode_err")).as("n_err"),
          sum(col("duration_ms")).as("sum_ms"))
      val frameAgg = frames
        .groupBy(col("us_per_frame").cast("string").as("rate"))
        .agg(count(lit(1)).as("n_frames"), sum(col("frame_mean")).as("sum_mean"))
      byRate.join(frameAgg, Seq("rate"), "left")
        .na.fill(0L, Seq("n_frames", "sum_mean"))
        .orderBy("rate")
    }),

    // X5 resize: payload-to-payload BMP thumbnail pass (ImageResize) —
    // integer nearest-neighbor decimation into a 16×16 box, emitting a
    // valid BMP payload + exact pixel checksum per row; aggregated per
    // outcome with the truncated group kept visible.
    "q96_image_resize" -> ((s, d) => {
      ImageResize.resize(resizeFixture(s), 16, 16)
        .groupBy(coalesce(col("resize_err"), lit("ok")).as("status"))
        .agg(count(lit(1)).as("n"),
          sum(col("out_width")).as("sum_w"),
          sum(col("out_height")).as("sum_h"),
          sum(expr("octet_length(out_payload)")).as("sum_bytes"),
          sum(col("sum_px")).as("sum_px"))
        .orderBy("status")
    }),

    // X5×X2 perceptual image near-dup: block-hash64 per payload
    // (ImageHash byte walk), then EXACTLY q34's Manku block-triple
    // multi-index — the image hash rides `DedupOps.simhashCandidates`
    // (6 blocks, all 20 triples, ~32-bit bucket keys that outgrow any
    // corpus; pigeonhole keeps the candidate set exact), verified by
    // one codegen bit_count. Never all-pairs, shared scale story.
    // Pair form (one row per verified pair — O(k²) in a k-member
    // cluster); the production composition is the CLUSTER-collapsed
    // q100, which closes the same edges into (rep, n_members).
    "q97_image_neardup" -> ((s, d) => imagePairs(s).orderBy("a_id", "b_id")),

    // X5×X2 audio near-dup: PURE COMPOSITION of verified pieces — WAV
    // decode → per-frame RMS (q58's sampler at every frame) → a 64-bit
    // delta fingerprint packed in one codegen higher-order expression
    // (bit k = rms rises across frame pair k; robust to uniform gain,
    // the audio-fingerprint family's shape) → the SAME block-triple
    // index + bit_count verify as q34/q97. No new byte-walk code.
    // Pair form; q101 is the cluster-collapsed composition.
    "q98_audio_neardup" -> ((s, d) => audioPairs(s).orderBy("a_id", "b_id")),

    // X5×X2 completed for VIDEO: frame-luma delta fingerprint over
    // q95's existing frame sampler (q98's exact recipe — one
    // higher-order aggregate, zero new byte-walk code), the SAME
    // block-triple index + bit_count verify. Pair form.
    "q102_video_neardup" -> ((s, d) => videoPairs(s).orderBy("a_id", "b_id")),

    // CLUSTER-collapsed forms of q97/q98/q102 — one row per near-dup
    // component, (rep = min doc_id, n_members), via the shared
    // componentLabels closure (q65's operator over multimodal edges).
    // This is the form a curation pipeline composes: pair lists are
    // O(k²) per k-member cluster; the collapsed form is O(k).
    "q100_image_neardup_groups" -> ((s, d) => collapsed(s, imagePairs(s))),
    "q101_audio_neardup_groups" -> ((s, d) => collapsed(s, audioPairs(s))),
    "q103_video_neardup_groups" -> ((s, d) => collapsed(s, videoPairs(s))),

    // X2×X5 at INGEST shape: probe one batch's image fingerprints
    // against the lake's DURABLE FingerprintIndex (built once over the
    // v0 "already-ingested" images, probed by the v1/v2/v3 arrivals) —
    // the batch-vs-index form of q97, the plan the ingest gate
    // (DedupStage.fingerprint) runs per tick. Batch side broadcasts,
    // index side never shuffles; candidates are the same exact
    // block-triple buckets; verify is one codegen bit_count. Expected:
    // per scene, v1 matches its v0 at Hamming 0 and v2 at Hamming 1;
    // v3 (the inverted pattern) matches nothing within 3.
    "q99_image_fp_probe" -> ((s, d) => {
      val root = ensureFpIndex(s, d)
      val batch = ImageHash.hash(hashFixture(s).filter(col("doc_id") % 4 =!= 0))
        .filter(col("hash_err").isNull)
        .select(col("doc_id"), col("img_hash").as("fp"))
      FingerprintIndex.probe(s, root, batch)
        .orderBy("new_id", "old_id")
    }))

  val oracles: Map[String, String] = Map(
    "q42_multimodal_stats" ->
      """SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
                AS modality,
              COUNT(*) AS n,
              CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
              COUNT(DISTINCT sha256(text)) AS n_fp,
              CAST(MIN(320 + octet_length(encode(text)) % 1280) AS BIGINT) AS min_width,
              CAST(MAX(240 + (octet_length(encode(text)) * 7) % 720) AS BIGINT) AS max_height
         FROM documents GROUP BY 1 ORDER BY 1""",
    "q56_image_decode" ->
      """WITH r AS (SELECT range AS id FROM range(300))
         SELECT CASE id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'bmp' ELSE '(bad)' END AS fmt,
                COUNT(*) AS n,
                CAST(SUM(CASE WHEN id % 3 IN (0, 1) THEN 16 + id % 480 END) AS BIGINT) AS sum_w,
                CAST(SUM(CASE WHEN id % 3 IN (0, 1) THEN 16 + (id * 3) % 360 END) AS BIGINT) AS sum_h,
                CAST(SUM(CASE WHEN id % 3 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_err
         FROM r GROUP BY 1 ORDER BY 1""",
    "q58_audio_frames" ->
      """WITH v AS (
           SELECT range AS id,
             CASE range % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000 WHEN 3 THEN 44100 END AS rate,
             5 + range % 10 AS nf,
             100 * (1 + range % 50) AS amp
           FROM range(240))
         SELECT CASE WHEN rate IS NULL THEN '(bad)' ELSE CAST(rate AS VARCHAR) END AS rate,
                COUNT(*) AS n,
                CAST(SUM(CASE WHEN rate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_err,
                CAST(SUM(nf * 20) FILTER (rate IS NOT NULL) AS BIGINT) AS sum_ms,
                CAST(COALESCE(SUM((nf + 2) // 3) FILTER (rate IS NOT NULL), 0) AS BIGINT)
                  AS n_frames,
                CAST(COALESCE(SUM(((nf + 2) // 3) * amp) FILTER (rate IS NOT NULL), 0) AS BIGINT)
                  AS sum_rms
         FROM v GROUP BY 1 ORDER BY 1""",
    // sampled frames k = 0,2,4,… of nf ⇒ ns = (nf+1)//2; frame k's mean
    // is exactly base + k, so Σ means = ns·base + ns·(ns−1)
    "q95_video_frames" ->
      """WITH v AS (
           SELECT range AS id,
             CASE range % 4 WHEN 0 THEN 40000 WHEN 1 THEN 33000 WHEN 3 THEN 20000 END AS upf,
             4 + range % 6 AS nf,
             10 + range % 100 AS base
           FROM range(240))
         SELECT CASE WHEN upf IS NULL THEN '(bad)' ELSE CAST(upf AS VARCHAR) END AS rate,
                COUNT(*) AS n,
                CAST(SUM(CASE WHEN upf IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_err,
                CAST(SUM(nf * upf // 1000) FILTER (upf IS NOT NULL) AS BIGINT) AS sum_ms,
                CAST(COALESCE(SUM((nf + 1) // 2) FILTER (upf IS NOT NULL), 0) AS BIGINT)
                  AS n_frames,
                CAST(COALESCE(SUM((nf + 1) // 2 * base + (nf + 1) // 2 * ((nf + 1) // 2 - 1))
                       FILTER (upf IS NOT NULL), 0) AS BIGINT)
                  AS sum_mean
         FROM v GROUP BY 1 ORDER BY 1""",
    // stride s = max(ceil(w/16), ceil(h/16)); out dims = ceil-div by s;
    // stored row j of the output samples input row j·s whose pixels all
    // equal base + j·s, so Σ pixel bytes = ow·3·(oh·base + s·oh·(oh−1)/2)
    "q96_image_resize" ->
      """WITH c AS (
           SELECT range AS id, 10 + range % 90 AS base,
             CASE range % 3 WHEN 0 THEN 40 + range % 16 WHEN 1 THEN 8 + range % 9 END AS w,
             CASE range % 3 WHEN 0 THEN 30 + range % 8 WHEN 1 THEN 6 + range % 5 END AS h
           FROM range(200)),
         g AS (SELECT *, GREATEST((w + 15) // 16, (h + 15) // 16) AS s FROM c),
         o AS (SELECT CASE WHEN w IS NULL THEN 'truncated_pixels' ELSE 'ok' END AS status,
                      (w + s - 1) // s AS ow, (h + s - 1) // s AS oh, s, base
                 FROM g)
         SELECT status, COUNT(*) AS n,
                CAST(SUM(ow) AS BIGINT) AS sum_w,
                CAST(SUM(oh) AS BIGINT) AS sum_h,
                CAST(SUM(54 + oh * ((ow * 3 + 3) // 4 * 4)) AS BIGINT) AS sum_bytes,
                CAST(SUM(ow * 3 * (oh * base + s * oh * (oh - 1) // 2)) AS BIGINT) AS sum_px
         FROM o GROUP BY 1 ORDER BY 1""",
    // the fixture's near-dup set is a closed form (see hashFixture):
    // per scene exactly (v0,v1) at Hamming 0 and (v0,v2),(v1,v2) at 1
    "q97_image_neardup" ->
      """WITH s AS (SELECT range AS sc FROM range(60)),
         p AS (
           SELECT sc * 4 AS a_id, sc * 4 + 1 AS b_id, 0 AS hm FROM s
           UNION ALL SELECT sc * 4, sc * 4 + 2, 1 FROM s
           UNION ALL SELECT sc * 4 + 1, sc * 4 + 2, 1 FROM s)
         SELECT CAST(a_id AS BIGINT) AS a_id, CAST(b_id AS BIGINT) AS b_id,
                CAST(hm AS BIGINT) AS hamming
         FROM p ORDER BY 1, 2""",
    // the fixture's probe result is a closed form (see hashFixture/
    // fpIndex): per scene exactly v1→v0 at Hamming 0 and v2→v0 at 1
    "q99_image_fp_probe" ->
      """WITH s AS (SELECT range AS sc FROM range(60)),
         p AS (
           SELECT sc * 4 + 1 AS new_id, sc * 4 AS old_id, 0 AS hm FROM s
           UNION ALL SELECT sc * 4 + 2, sc * 4, 1 FROM s)
         SELECT CAST(new_id AS BIGINT) AS new_id, CAST(old_id AS BIGINT) AS old_id,
                CAST(hm AS BIGINT) AS hamming
         FROM p ORDER BY 1, 2""",
    // same scene/variant scheme as q97 (see audioNdFixture): the
    // near-dup set is the identical closed form
    "q98_audio_neardup" ->
      """WITH s AS (SELECT range AS sc FROM range(60)),
         p AS (
           SELECT sc * 4 AS a_id, sc * 4 + 1 AS b_id, 0 AS hm FROM s
           UNION ALL SELECT sc * 4, sc * 4 + 2, 1 FROM s
           UNION ALL SELECT sc * 4 + 1, sc * 4 + 2, 1 FROM s)
         SELECT CAST(a_id AS BIGINT) AS a_id, CAST(b_id AS BIGINT) AS b_id,
                CAST(hm AS BIGINT) AS hamming
         FROM p ORDER BY 1, 2""",
    // same scheme again over the video fixture (see videoNdFixture)
    "q102_video_neardup" ->
      """WITH s AS (SELECT range AS sc FROM range(60)),
         p AS (
           SELECT sc * 4 AS a_id, sc * 4 + 1 AS b_id, 0 AS hm FROM s
           UNION ALL SELECT sc * 4, sc * 4 + 2, 1 FROM s
           UNION ALL SELECT sc * 4 + 1, sc * 4 + 2, 1 FROM s)
         SELECT CAST(a_id AS BIGINT) AS a_id, CAST(b_id AS BIGINT) AS b_id,
                CAST(hm AS BIGINT) AS hamming
         FROM p ORDER BY 1, 2""",
    // collapsed forms: the oracle RECOMPUTES the transitive closure over
    // the planted pair list (recursive CTE, q65's shape) rather than
    // assuming cluster sizes — a closure regression shows up even though
    // the fixture's components happen to be triangles
    "q100_image_neardup_groups" -> GroupsOracle,
    "q101_audio_neardup_groups" -> GroupsOracle,
    "q103_video_neardup_groups" -> GroupsOracle)

  /** Shared collapsed-form oracle for q100/q101/q103: all three fixtures
    * plant the identical scene/variant pair structure, and the closure
    * is recomputed from it with a recursive CTE. (`def`, not `val`: the
    * oracles map above initializes first.) */
  private def GroupsOracle: String =
    """WITH RECURSIVE
         s AS (SELECT range AS sc FROM range(60)),
         p AS (
           SELECT sc * 4 AS a, sc * 4 + 1 AS b FROM s
           UNION ALL SELECT sc * 4, sc * 4 + 2 FROM s
           UNION ALL SELECT sc * 4 + 1, sc * 4 + 2 FROM s),
         sym AS (SELECT a, b FROM p UNION ALL SELECT b, a FROM p),
         nodes AS (SELECT DISTINCT a AS id FROM sym),
         walk(id, r) AS (
           SELECT id, id FROM nodes
           UNION
           SELECT sy.b, w.r FROM walk w JOIN sym sy ON sy.a = w.id),
         lab AS (SELECT id, MIN(r) AS rep FROM walk GROUP BY 1)
       SELECT CAST(rep AS BIGINT) AS rep, COUNT(*) AS n_members
       FROM lab GROUP BY 1 ORDER BY 1"""
}
