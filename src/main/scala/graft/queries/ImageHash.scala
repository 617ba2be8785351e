package graft.queries

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Perceptual image hashing — the X5×X2 composition: near-duplicate
  * IMAGE detection over binary payloads, the visual analogue of q32's
  * MinHash text pass (a LAION-style corpus dedups images by perceptual
  * hash + Hamming-radius join, not by exact bytes).
  *
  * [[hash]] reduces each 24bpp BMP to a 64-bit BLOCK HASH (blockhash
  * family): the pixel grid is cut into 8×8 blocks (ceil-split
  * boundaries, so any dimensions work), each block's mean luma is
  * compared against fixed mid-gray (125), and the 64 outcomes pack into
  * one long — bit (bi·8+bj) for block row bi, column bj. A streamed
  * `mapPartitions` byte walk like the [[ImageDecode]] family (binary
  * format parsing is the one surface outside Spark SQL's expression
  * set); failures are data (`hash_err`), never exceptions.
  *
  * The fixed mid-gray threshold (vs the classic image-mean) is the
  * deterministic choice: the hash of a payload is a pure function of
  * its bytes with no image-global coupling, so a one-block edit flips
  * exactly one bit — which is what makes the Hamming-radius join
  * contract exact and testable.
  *
  * Downstream near-dup mining is PURE Spark SQL and scale-shaped like
  * q34's SimHash pass (Manku multi-index): a hash within Hamming
  * distance 3 of another must share at least one of its four 16-bit
  * pieces, so candidates come from an equi-join on (piece_idx, piece) —
  * a hash-partitioned shuffle on 16-bit buckets, never an all-pairs
  * comparison — and the verify is one codegen'd
  * `bit_count(a_hash ^ b_hash)`.
  */
object ImageHash {
  /** Block-hash one BMP payload; (hash, null) or (null, err). Total. */
  def blockHash64(b: Array[Byte]): (java.lang.Long, String) = {
    if (b == null || b.length < 2) return (null, "empty")
    if (!(b(0) == 'B'.toByte && b(1) == 'M'.toByte)) return (null, "unsupported_fmt")
    if (b.length < 54) return (null, "truncated")
    def le16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def le32(o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    val dataOff = le32(10)
    if (le32(14) < 40) return (null, s"unsupported_dib_${le32(14)}")
    val w = le32(18)
    // abs(Int.MinValue) is still negative — `h <= 0` (not `h == 0`)
    // quarantines the crafted hRaw = 0x80000000 header that would
    // otherwise skip every block loop and silently hash to 0
    val h = math.abs(le32(22))
    if (w <= 0 || h <= 0) return (null, "bad_dimensions")
    if (le16(26) != 1 || le16(28) != 24 || le32(30) != 0) return (null, "unsupported_encoding")
    // stride in Long space: a crafted w near 2^31/3 must fail the
    // length check below, not overflow into a negative stride
    val strideL = (w.toLong * 3 + 3) / 4 * 4
    if (dataOff < 54 || dataOff.toLong + h.toLong * strideL > b.length)
      return (null, "truncated_pixels")
    val stride = strideL.toInt
    var hash = 0L
    var bi = 0
    while (bi < 8) {
      val r0 = bi * h / 8; val r1 = (bi + 1) * h / 8
      var bj = 0
      while (bj < 8) {
        val c0 = bj * w / 8; val c1 = (bj + 1) * w / 8
        var sum = 0L
        var n = 0L
        var r = r0
        while (r < r1) {
          val row = dataOff + r * stride
          var c = c0
          while (c < c1) {
            // mean of the three channels as the luma proxy
            val p = row + c * 3
            sum += (b(p) & 0xff) + (b(p + 1) & 0xff) + (b(p + 2) & 0xff)
            n += 3
            c += 1
          }
          r += 1
        }
        // empty block (dims < 8): inherits bit 0 — deterministic
        if (n > 0 && sum > 125L * n) hash |= 1L << (bi * 8 + bj)
        bj += 1
      }
      bi += 1
    }
    (hash, null)
  }

  /** Hash `payloadCol` across the frame: appends (img_hash, hash_err). */
  def hash(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val outSchema = df.schema
      .add("img_hash", LongType).add("hash_err", StringType)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.map { row =>
        val (hsh, err) = blockHash64(row.getAs[Array[Byte]](idx))
        Row.fromSeq(row.toSeq ++ Seq(hsh, err))
      }
    }(Encoders.row(outSchema))
  }

  /** Full 24bpp BMP with per-pixel values from `pix(storedRow, col)`
    * on all three channels (fixture/spec builder; the block-patterned
    * sibling of [[ImageResize.bmpPixBytes]]). */
  def bmpGridBytes(w: Int, h: Int, pix: (Int, Int) => Int): Array[Byte] = {
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
      val row = 54 + r * stride
      (0 until w).foreach { c =>
        val v = (pix(r, c) & 0xff).toByte
        b(row + c * 3) = v; b(row + c * 3 + 1) = v; b(row + c * 3 + 2) = v
      }
    }
    b
  }
}
