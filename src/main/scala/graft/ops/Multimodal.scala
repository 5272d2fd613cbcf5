package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque BINARY columns with
  * typed metadata, batch feature extraction, and frame sampling.
  *
  * The Spark-side shape is real and tested — schema, partition-size
  * control, batched per-partition processing; only the codec itself is
  * a STUB (this container has no image/audio libraries), clearly marked
  * in [[StubCodec]]: it derives deterministic fake dimensions/features
  * from the bytes so the pipeline is end-to-end testable.
  *
  * Scale notes: media rows are large — the knobs that matter are
  * (a) `spark.sql.files.maxPartitionBytes` so a partition of blobs fits
  * in executor memory, (b) per-partition batching (mapPartitions) so a
  * decoder is initialized once per task, not once per row, and
  * (c) keeping metadata in separate (pruned) columns so metadata-only
  * queries never read the blob column from parquet.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, mime: String, media: Array[Byte])
  case class MediaFeatures(
      doc_id: Long, mime: String, n_bytes: Int,
      width: Int, height: Int, channels: Int, brightness: Double)
  case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** ======================= STUB ==============================
    * Deterministic fake decoder standing in for an image library
    * (libjpeg / ffmpeg / PIL are not in this container). Real
    * implementation would decode `bytes` and measure the frame; the
    * stub derives stable pseudo-features from the byte content, so
    * plumbing, schemas and tests are real even though pixels are not.
    */
  object StubCodec {
    def decode(bytes: Array[Byte]): (Int, Int, Int, Double) = {
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      val width = 64 + math.floorMod(h, 1024).toInt
      val height = 64 + math.floorMod(h >> 10, 1024).toInt
      val channels = 1 + math.floorMod(h >> 20, 4).toInt
      val brightness = math.floorMod(h >> 22, 1000).toDouble / 1000.0
      (width, height, channels, brightness)
    }
  }

  /** Attach a synthetic binary media column to the documents table
    * (deterministic bytes derived from the text — the fixtures carry no
    * real blobs). Schema shape is the contract: (id, mime, media BINARY).
    */
  def attachMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      concat(lit("image/"), element_at(array(lit("png"), lit("jpeg"), lit("webp")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int"))).as("mime"),
      // deterministic fake payload; unhex(sha2) = 32 opaque bytes
      to_binary(sha2(col("text"), 256), lit("hex")).as("media"))

  /** Batched feature extraction: one decoder per partition, iterator in
    * / iterator out (never materializes the partition), preserving
    * Spark's streaming execution within the task.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-task decoder init would go here (STUB: none needed)
      rows.map { r =>
        val (w, h, c, b) = StubCodec.decode(r.media)
        MediaFeatures(r.doc_id, r.mime, r.media.length, w, h, c, b)
      }
    }
  }

  /** Frame sampling for video-like payloads: every `stride`-th frame
    * index up to `nFrames`, exploded to one row per sampled frame with
    * a byte-slice as the (stub) frame payload.
    */
  def sampleFrames(media: DataFrame, nFrames: Int = 8, stride: Int = 2): DataFrame =
    media.select(
      col("doc_id"), col("media"),
      posexplode(sequence(lit(0), lit(nFrames - 1), lit(stride)))
        .as(Seq("pos", "frame_idx")))
      .select(col("doc_id"), col("frame_idx"),
        // stub frame payload: a 4-byte slice per frame index (real
        // impl: container demux at the sampled frame)
        substring(col("media"), col("frame_idx") * 4 + 1, lit(4)).as("frame"))

  case class ResizedMedia(doc_id: Long, mime: String, media: Array[Byte],
                          width: Int, height: Int)

  /** Batched resize-to-target: decode (STUB), scale to fit
    * (maxW, maxH) preserving aspect ratio, re-encode (STUB: the payload
    * is passed through; a real impl re-encodes pixels). The Spark shape
    * is the contract — iterator-in/iterator-out mapPartitions so one
    * scaler instance serves the whole task, output dims in pruned
    * metadata columns so downstream filters (e.g. drop tiny images)
    * never touch bytes.
    */
  def resize(spark: SparkSession, media: DataFrame,
             maxW: Int = 256, maxH: Int = 256): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-task scaler init would go here (STUB: none needed)
      rows.map { r =>
        val (w, h, _, _) = StubCodec.decode(r.media)
        val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
        val nw = math.max(1, math.round(w * scale).toInt)
        val nh = math.max(1, math.round(h * scale).toInt)
        // ===== STUB: real impl re-encodes the scaled pixel buffer =====
        ResizedMedia(r.doc_id, r.mime, r.media, nw, nh)
      }
    }
  }

  case class MediaEmbedding(doc_id: Long, embedding: Array[Double])

  /** ======================= STUB ==============================
    * Media -> embedding extraction (a real pipeline runs a vision/audio
    * encoder here). The stub derives a deterministic unit vector from
    * the payload bytes so the downstream ANN plumbing (partitioning,
    * kNN, dedup-by-embedding) is exercised with real Spark mechanics.
    * Batched per partition like extractFeatures (one encoder init per
    * task in a real deployment).
    */
  def embedStub(spark: SparkSession, media: DataFrame,
                dim: Int = 16): Dataset[MediaEmbedding] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val v = new Array[Double](dim)
        var h = 0x9e3779b97f4a7c15L
        var i = 0
        while (i < r.media.length) { h = h * 31 + r.media(i); i += 1 }
        var d = 0
        var norm = 0.0
        while (d < dim) {
          h = graft.functions.VectorOps.mix64(h + d)
          v(d) = (h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
          norm += v(d) * v(d)
          d += 1
        }
        val inv = 1.0 / math.sqrt(norm)
        d = 0
        while (d < dim) { v(d) *= inv; d += 1 }
        MediaEmbedding(r.doc_id, v)
      }
    }
  }

  /** Metadata-only projection — must never touch the blob column
    * (verify with .explain: ReadSchema excludes `media`).
    */
  def mediaStats(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF()
      .groupBy(col("mime"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        (sum(col("width").cast("bigint")) / count(lit(1))).as("avg_width"),
        (sum(col("brightness")) / count(lit(1))).as("avg_brightness"))
      .orderBy(col("mime"))
}
