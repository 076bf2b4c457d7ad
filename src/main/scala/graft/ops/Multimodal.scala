package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct alongside.
  *
  * The Spark-side plumbing is real and tested — schema, partition-wise
  * batch processing via `mapPartitions` over a typed Dataset, stable
  * output schema for downstream relational ops. The actual media
  * decoding is STUBBED (this container ships no image/audio codecs):
  * [[MediaCodec.decodeStub]] derives deterministic fake metadata from
  * the bytes, and is the single seam to swap for a real decoder
  * (javacv / a JNI codec) in production.
  *
  * 100 TB notes: decode work is per-partition with no shuffle; binary
  * payloads never pass through a wide transformation, and the metadata
  * struct is columnar so later filters (`meta.width > 512`) prune
  * without touching bytes.
  */
object Multimodal {

  final case class MediaMeta(
      format: String, width: Int, height: Int, nFrames: Int, durationMs: Long)

  final case class MediaRecord(id: Long, media: Array[Byte])
  final case class DecodedRecord(
      id: Long, nBytes: Long, contentHash: Long, meta: MediaMeta)

  /** STUB decoder — deterministic fake metadata derived from the
    * payload bytes. Replace with a real codec in production; the
    * signature (bytes in, typed meta out, no Spark types) is the
    * production seam.
    */
  object MediaCodec {
    private val formats = Array("png", "jpeg", "wav", "mp4")

    def decodeStub(bytes: Array[Byte]): MediaMeta = {
      val h = java.util.Arrays.hashCode(bytes)
      val pos = (h & Int.MaxValue)
      MediaMeta(
        format = formats(pos % formats.length),
        width = 16 + pos % 4096,
        height = 16 + (pos / 7) % 4096,
        nFrames = 1 + (pos / 11) % 300,
        durationMs = (pos / 13) % 600000L)
    }

    /** STUB frame sampler: byte-range slices standing in for decoded
      * frames — real implementation would seek key-frames.
      */
    def sampleFramesStub(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
      val clamped = math.max(1, math.min(n, bytes.length))
      (0 until clamped).map { i =>
        val start = i * bytes.length / clamped
        val end = (i + 1) * bytes.length / clamped
        java.util.Arrays.copyOfRange(bytes, start, end)
      }
    }
  }

  /** Decode a binary media column partition-wise: typed Dataset in,
    * typed Dataset out, one pass, no shuffle. The per-partition iterator
    * is where a real codec would amortize native init per task.
    */
  def decode(spark: SparkSession, df: DataFrame, idCol: String, mediaCol: String): Dataset[DecodedRecord] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(mediaCol).as("media"))
      .as[MediaRecord]
      .mapPartitions { it =>
        // real codec: init native decoder once per partition here
        it.map { r =>
          DecodedRecord(
            id = r.id,
            nBytes = r.media.length.toLong,
            contentHash = java.util.Arrays.hashCode(r.media).toLong,
            meta = MediaCodec.decodeStub(r.media))
        }
      }
  }

  /** Frame sampling as a generator: one output row per sampled frame,
    * schema (id, frame_idx, frame bytes).
    */
  def sampleFrames(spark: SparkSession, df: DataFrame, idCol: String,
      mediaCol: String, framesPerDoc: Int): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(mediaCol).as("media"))
      .as[MediaRecord]
      .flatMap { r =>
        MediaCodec.sampleFramesStub(r.media, framesPerDoc)
          .zipWithIndex.map { case (f, i) => (r.id, i, f) }
      }
      .toDF("id", "frame_idx", "frame")
  }

  final case class ResizedRecord(
      id: Long, n_in: Int, n_out: Int, resized: Array[Byte])

  /** STUB resize: nearest-neighbor resample of the payload treated as a
    * 1-D byte signal — out(i) = in(⌊i·len/n⌋), the exact index rule a
    * real nearest-neighbor image resize applies per axis (a real codec
    * would decode, resample the pixel grid, re-encode; the index
    * arithmetic is the part worth pinning). Downsamples when len > n,
    * repeats samples when len < n; empty payloads resize to empty
    * (a fake 64-byte output for zero input would be invented data).
    */
  def resizeStub(spark: SparkSession, df: DataFrame, idCol: String,
      mediaCol: String, targetBytes: Int): DataFrame = {
    import spark.implicits._
    require(targetBytes > 0, "targetBytes must be positive")
    df.select(col(idCol).cast("long").as("id"), col(mediaCol).as("media"))
      .as[MediaRecord]
      .map { r =>
        val len = r.media.length
        val out =
          if (len == 0) Array.empty[Byte]
          else Array.tabulate(targetBytes)(i =>
            r.media((i.toLong * len / targetBytes).toInt))
        ResizedRecord(r.id, len, out.length, out)
      }.toDF()
  }

  final case class PhashRecord(id: Long, sim: Long)

  /** 64-bit average-hash (aHash) perceptual fingerprint of the payload:
    * nearest-neighbor-resample to 64 bytes (the [[resizeStub]] index
    * rule — on decoded pixels this is the classic 8×8 downsample), then
    * bit i = 1 iff sample_i ≥ mean. The threshold compares in exact
    * integers (`b_i·64 ≥ Σb`) so there is no floating mean to diverge
    * on, and the whole derivation is closed-form replayable in SQL from
    * the payload hex. Empty payloads get no row (no content to hash).
    */
  def phash64(spark: SparkSession, df: DataFrame, idCol: String,
      mediaCol: String): Dataset[PhashRecord] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(mediaCol).as("media"))
      .as[MediaRecord]
      .flatMap { r =>
        val len = r.media.length
        if (len == 0) None
        else {
          val s = Array.tabulate(64)(i =>
            r.media((i.toLong * len / 64).toInt) & 0xff)
          val total = s.sum // ≤ 64·255: exact in Int
          var h = 0L
          var i = 0
          while (i < 64) {
            if (s(i) * 64 >= total) h |= (1L << i)
            i += 1
          }
          Some(PhashRecord(r.id, h))
        }
      }
  }

  /** Perceptual near-dup pairs over a binary media column: [[phash64]]
    * fingerprints joined through [[Dedup.hammingNearDup]]'s pigeonhole
    * blocks — recall 1.0 within the bound, so the result EQUALS the
    * all-pairs comparison the oracle runs. This is image-dedup shaped:
    * at production scale the fingerprint widens (resample 256 bytes →
    * 4-long hash, 32-bit blocks) rather than the threshold growing.
    */
  def phashNearDup(spark: SparkSession, df: DataFrame, idCol: String,
      mediaCol: String, maxHamming: Int = 9,
      maxBucket: Int = 10000): DataFrame =
    Dedup.hammingNearDup(
      Staged(phash64(spark, df, idCol, mediaCol).toDF()),
      maxHamming, maxBucket)

  final case class FrameRecord(
      id: Long, frame_idx: Int, frame: Array[Byte], mean_byte: Option[Double])

  /** Frame sampling + per-frame feature extraction in one typed pass:
    * each sampled frame carries its mean unsigned-byte value — the
    * pixel-mean stand-in for a real per-frame feature extractor (the
    * imperative loop over frame bytes is exactly where a conv feature
    * or perceptual hash would run). Empty frames (zero-length media)
    * yield a NULL feature, not a fake zero.
    *
    * No shuffle: a generator over the media partition, frames never
    * leave their task until the caller asks.
    */
  def frameFeatures(spark: SparkSession, df: DataFrame, idCol: String,
      mediaCol: String, framesPerDoc: Int): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(mediaCol).as("media"))
      .as[MediaRecord]
      .flatMap { r =>
        MediaCodec.sampleFramesStub(r.media, framesPerDoc)
          .zipWithIndex.map { case (f, i) =>
            val mean =
              if (f.isEmpty) None
              else {
                var s = 0L
                var j = 0
                while (j < f.length) { s += (f(j) & 0xff); j += 1 }
                // integer sum is exact; ONE division — bit-identical to
                // any other engine's avg over the same bytes
                Some(s.toDouble / f.length)
              }
            FrameRecord(r.id, i, f, mean)
          }
      }.toDF()
  }
}
