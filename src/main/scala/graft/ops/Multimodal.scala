package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque BINARY columns with
  * typed metadata, batch feature extraction, and frame sampling.
  *
  * The Spark-side shape is real and tested — schema, partition-size
  * control, batched per-partition processing. Real image formats
  * (PNG/JPEG/GIF/BMP) decode and rescale through the JDK's
  * `javax.imageio` ([[Codec]]); payloads with no JDK decoder
  * (audio/video, the synthetic fixture blobs) fall back to the
  * clearly-marked [[StubCodec]], which derives deterministic fake
  * dimensions/features from the bytes so the pipeline stays total and
  * end-to-end testable.
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

  /** Image decoding. Real formats (PNG/JPEG/GIF/BMP) decode through the
    * JDK's `javax.imageio` — no external libraries needed; payloads
    * ImageIO cannot parse (unknown containers, the synthetic fixture
    * blobs) fall back to the deterministic [[StubCodec]] so the
    * pipeline stays total. Decoders are cheap to invoke per row;
    * per-task init (mapPartitions) still applies for codecs that need
    * warm state (a video demuxer would).
    */
  object Codec {
    /** bytes -> decoded image, or null when no JDK reader applies. */
    def decodeImage(bytes: Array[Byte]): java.awt.image.BufferedImage =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }

    /** bytes -> (width, height, channels, mean-luminance in [0,1]). */
    def decode(bytes: Array[Byte]): (Int, Int, Int, Double) =
      measure(decodeImage(bytes), bytes)

    private[Multimodal] def measure(img: java.awt.image.BufferedImage,
                                    bytes: Array[Byte]): (Int, Int, Int, Double) = {
      if (img == null) StubCodec.decode(bytes)
      else {
        val w = img.getWidth
        val h = img.getHeight
        val channels = img.getColorModel.getNumComponents
        // Rec.601 luma averaged over a bounded pixel grid — step =
        // max(1, dim/64) gives up to 127 samples per axis (<= 127x127
        // total; dims just under a step multiple sample densest), so
        // huge frames cost O(1), not O(pixels)
        val stepX = math.max(1, w / 64)
        val stepY = math.max(1, h / 64)
        var sum = 0.0
        var n = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            sum += (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
            n += 1
            x += stepX
          }
          y += stepY
        }
        (w, h, channels, if (n == 0) 0.0 else sum / n)
      }
    }

    /** Scale an already-decoded image to exactly (w, h) and re-encode
      * as PNG. Draws the source BufferedImage directly with bilinear
      * interpolation — `Image.getScaledInstance` would hand a lazy
      * ToolkitImage to a null-observer drawImage, which can re-encode a
      * partially-drawn (black) frame; the BufferedImage overload is
      * synchronous by contract.
      */
    def reencodeScaled(img: java.awt.image.BufferedImage,
                       w: Int, h: Int): Array[Byte] = {
      val out = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
  }

  /** The 64-bit polynomial byte fold (h = 31·h + b, signed bytes)
    * behind every deterministic stub feature — ONE Scala definition
    * because q48's DuckDB twin reproduces this exact arithmetic in
    * HUGEINT SQL, so a tweak must change precisely two places (here
    * and that twin), not four.
    */
  private[ops] def byteFold64(bytes: Array[Byte], seed: Long): Long = {
    var h = seed
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    h
  }

  /** mix-draw -> uniform double in [0, 1): the 53-bit-mantissa
    * conversion shared by the stub grids/embeddings.
    */
  private[ops] def toUnitDouble(h: Long): Double =
    (h >>> 11).toDouble / (1L << 53).toDouble

  /** ======================= STUB ==============================
    * Deterministic fallback for payloads with no real decoder in this
    * container (audio/video formats; the fixtures' synthetic blobs).
    * Derives stable pseudo-features from the byte content, so plumbing,
    * schemas and tests are real even when pixels are not.
    */
  object StubCodec {
    def decode(bytes: Array[Byte]): (Int, Int, Int, Double) = {
      val h = byteFold64(bytes, 1125899906842597L)
      val width = 64 + math.floorMod(h, 1024).toInt
      val height = 64 + math.floorMod(h >> 10, 1024).toInt
      val channels = 1 + math.floorMod(h >> 20, 4).toInt
      val brightness = math.floorMod(h >> 22, 1000).toDouble / 1000.0
      (width, height, channels, brightness)
    }
  }

  /** Perceptual image hashing (dHash, 64-bit): the luma-gradient
    * fingerprint behind image NEAR-dup detection (q177) — robust to
    * re-encoding, rescaling, and small pixel edits, which byte-level
    * dedup (exact hashes) can never catch. The grid is 8 rows x 9
    * columns of Rec.601 luma point-samples; bit (row, col) is set iff
    * the right neighbor is strictly brighter — 64 horizontal-gradient
    * signs, the standard dHash construction (Krawetz, "Kind of Like
    * That", 2013 — published algorithm). Decodable payloads
    * (PNG/JPEG/GIF/BMP via [[Codec]]) hash their real pixels; payloads
    * with no JDK decoder fall back to a [[StubCodec]]-style
    * deterministic pseudo-luma grid derived from the bytes, so the
    * pipeline stays total and the banding/verify stages are exercised
    * end-to-end on the synthetic fixture (identical payloads collide
    * at hamming 0 — the exact-dup floor).
    */
  object PHash {
    /** 8x9 Rec.601 luma point-grid of a decoded image; row-major,
      * 72 entries. Point sampling at x = gx·(w−1)/8, y = gy·(h−1)/7 is
      * scale-covariant: a resized copy samples (approximately) the
      * same image locations, which is what makes dHash survive
      * thumbnailing.
      */
    private[ops] def lumaGrid(img: java.awt.image.BufferedImage): Array[Double] = {
      val out = new Array[Double](72)
      val w = img.getWidth
      val h = img.getHeight
      var gy = 0
      while (gy < 8) {
        var gx = 0
        while (gx < 9) {
          val x = if (w <= 1) 0 else gx * (w - 1) / 8
          val y = if (h <= 1) 0 else gy * (h - 1) / 7
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          out(gy * 9 + gx) = 0.299 * r + 0.587 * g + 0.114 * b
          gx += 1
        }
        gy += 1
      }
      out
    }

    /** ======================= STUB ==============================
      * Deterministic pseudo-luma grid for payloads with no JDK
      * decoder (the fixtures' synthetic blobs): stable per byte
      * content, so equal payloads hash equal (hamming 0) and the
      * downstream banding/verify plumbing is real even when pixels
      * are not.
      */
    private[ops] def stubGrid(bytes: Array[Byte]): Array[Double] = {
      var h = byteFold64(bytes, 1125899906842597L)
      val out = new Array[Double](72)
      var i = 0
      while (i < 72) {
        h = graft.functions.VectorOps.mix64(h + i)
        out(i) = toUnitDouble(h) * 255.0
        i += 1
      }
      out
    }

    /** bytes -> 64-bit dHash (decoded pixels when a JDK reader
      * applies, stub grid otherwise). Bit gy*8+gx = 1 iff
      * grid(gy, gx+1) > grid(gy, gx).
      */
    def dhash64(bytes: Array[Byte]): Long = {
      val img = Codec.decodeImage(bytes)
      val g = if (img != null) lumaGrid(img) else stubGrid(bytes)
      var sig = 0L
      var gy = 0
      while (gy < 8) {
        var gx = 0
        while (gx < 8) {
          if (g(gy * 9 + gx + 1) > g(gy * 9 + gx))
            sig |= 1L << (gy * 8 + gx)
          gx += 1
        }
        gy += 1
      }
      sig
    }
  }

  case class MediaSig(doc_id: Long, sig: Long)

  /** (doc_id, sig BIGINT) dHash signatures over a media frame — the
    * image half of q177's near-dup pipeline; the banding + hamming
    * verify over this frame is [[Dedup.simhashBandPairs]], the SAME
    * single definition the SimHash text pairs run (one banded
    * candidate join + bit_count verify serves both modalities).
    * Batched per partition like [[extractFeatures]] (one decoder per
    * task); [[spread]] applies the same junk-row and small-scan
    * handling. Dumped by graft.Verify as `aux_phash64` for q177's
    * two-stage oracle.
    */
  def phashSig64(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    spread(spark, media).as[MediaRow].mapPartitions { rows =>
      rows.map(r => MediaSig(r.doc_id, PHash.dhash64(r.media)))
    }.toDF("doc_id", "sig")
  }

  /** ==================== STUB (pixels only) =====================
    * Deterministic 64x48 grayscale PNG: a sinusoidal luma pattern
    * keyed by the pattern id `g` (frequency pair + phase — 50
    * distinct patterns) plus 8 `seed`-derived single-pixel edits (the
    * "small retouch" a real near-duplicate image carries). Same-`g`
    * images are true pixel-level NEAR-duplicates; different `g` are
    * far apart. StrictMath.sin so the bytes are identical wherever
    * the frame is recomputed. The pixels are synthetic (the fixture
    * ships no real images) but the output is a REAL PNG and
    * everything downstream — ImageIO decode, luma sampling, dHash —
    * runs the real image path.
    */
  private[ops] def renderPng(g: Int, seed: Long): Array[Byte] = {
    val w = 64
    val h = 48
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val fx = 1 + g % 5
    val fy = 1 + (g / 5) % 5
    val ph = (g / 25) * 1.1
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = 128.0 + 110.0 * StrictMath.sin(
          2.0 * math.Pi * (fx * x.toDouble / w + fy * y.toDouble / h) + ph)
        val c = math.max(0, math.min(255, v.toInt))
        img.setRGB(x, y, (c << 16) | (c << 8) | c)
        x += 1
      }
      y += 1
    }
    var hs = seed
    var k = 0
    while (k < 8) {
      hs = graft.functions.VectorOps.mix64(hs + k)
      val px = math.floorMod(hs, w).toInt
      val py = math.floorMod(hs >> 16, h).toInt
      val c = math.floorMod(hs >> 32, 256).toInt
      img.setRGB(px, py, (c << 16) | (c << 8) | c)
      k += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Attach a REAL-image media column to a documents frame: one
    * [[renderPng]] PNG per doc, pattern id doc_id % 50 — so the
    * corpus carries genuine pixel-level near-dup GROUPS (re-encoded
    * retouched copies of ~10 base images per 500 docs) for q177 to
    * find through the real decode path. Junk rows (null doc_id) are
    * not images and are dropped, the [[spread]] convention.
    */
  def attachSyntheticImages(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).filter(col("doc_id").isNotNull)
      .as[Long]
      .map(id => MediaRow(id, "image/png", renderPng((id % 50).toInt, id)))
      .toDF("doc_id", "mime", "media")
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

  /** The TEXT side of a paired image/text corpus, as media rows: the
    * document's own UTF-8 bytes under the MediaRow contract, so the
    * SAME deterministic [[embedStub]] kernel yields a text-space
    * embedding that is decorrelated from [[attachMedia]]'s image-side
    * payload (different bytes -> different byteFold64 stream). A real
    * pipeline runs a text encoder here; the Spark-side plumbing —
    * schema, spread, batch shape — is what q204 exercises. Null text
    * yields a null payload, excluded at the shared [[spread]] junk
    * gate like every failed download.
    */
  def attachTextBytes(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), lit("text/plain").as("mime"),
      encode(col("text"), "UTF-8").as("media"))

  /** Estimated scan-task count for the frame's file sources, read from
    * the OPTIMIZED LOGICAL plan's leaf metadata (file-index byte totals
    * over the split size) — no plan-to-RDD conversion, no physical
    * planning, no job. `.rdd.getNumPartitions` here would force a full
    * RDD conversion per call and still report the pre-AQE count.
    * In-memory leaves (LocalRelation test frames) estimate as 1: tiny
    * by construction, so they take the repartition branch. Any OTHER
    * leaf (DSv2 scans — Iceberg/Delta, or parquet with V1 disabled)
    * estimates as already-parallel: those sources split by
    * maxPartitionBytes themselves, and estimating them as 1 would
    * force a full exchange of every blob at any scale — the exact
    * shuffle the no-op promise below rules out. The forced spread is
    * an optimization reserved for scans we can PROVE under-parallel.
    */
  private def estimatedScanTasks(spark: SparkSession, df: DataFrame): Long = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val maxSplit = math.max(1L, spark.sessionState.conf.filesMaxPartitionBytes)
    df.queryExecution.optimizedPlan.collectLeaves().map {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation =>
          math.max(1L, fs.location.sizeInBytes / maxSplit)
        case _ => 1L
      }
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => 1L
      case _ => spark.sparkContext.defaultParallelism.toLong
    }.sum
  }

  /** Codec work is CPU-bound per row and mapPartitions inherits the
    * scan's partitioning: a corpus stored in fewer files than cores
    * runs the whole decode on a handful of tasks (measured: ONE 0.56s
    * task at sf0.1 with 31 cores idle). Spread first — the exchange
    * moves each blob once, then every core decodes; when the scan
    * splits into >= cores tasks (the 100 TB case) this is a no-op, no
    * exchange added. The gate reads driver-side plan metadata only
    * (see [[estimatedScanTasks]]).
    */
  private def spread(spark: SparkSession, media: DataFrame): DataFrame = {
    // junk media rows degrade row-local at the shared entry: a NULL
    // payload would NPE the typed kernels (media.length, decode) and a
    // NULL doc_id fails the non-nullable MediaRow encoder — either
    // would kill the whole scan on one bad row (a failed download is
    // routine at pipeline scale)
    val clean = media.filter(col("doc_id").isNotNull && col("media").isNotNull)
    if (estimatedScanTasks(spark, clean) >= spark.sparkContext.defaultParallelism) clean
    else clean.repartition(spark.sparkContext.defaultParallelism)
  }

  /** Batched feature extraction: one decoder per partition, iterator in
    * / iterator out (never materializes the partition), preserving
    * Spark's streaming execution within the task.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    spread(spark, media).as[MediaRow].mapPartitions { rows =>
      // per-task decoder init would go here (ImageIO is stateless)
      rows.map { r =>
        val (w, h, c, b) = Codec.decode(r.media)
        MediaFeatures(r.doc_id, r.mime, r.media.length, w, h, c, b)
      }
    }
  }

  /** Frame sampling for video-like payloads: every `stride`-th frame
    * index up to `nFrames`, exploded to one row per sampled frame with
    * a byte-slice as the (stub) frame payload.
    */
  def sampleFrames(media: DataFrame, nFrames: Int = 8, stride: Int = 2): DataFrame =
    // the shared entry: junk rows (NULL doc_id / NULL media — a failed
    // download is routine) degrade row-local here exactly as in every
    // sibling op, and the byte-slice work spreads across cores
    spread(media.sparkSession, media).select(
      col("doc_id"), col("media"),
      posexplode(sequence(lit(0), lit(nFrames - 1), lit(stride)))
        .as(Seq("pos", "frame_idx")))
      .select(col("doc_id"), col("frame_idx"),
        // stub frame payload: a 4-byte slice per frame index (real
        // impl: container demux at the sampled frame)
        substring(col("media"), col("frame_idx") * 4 + 1, lit(4)).as("frame"))

  case class ResizedMedia(doc_id: Long, mime: String, media: Array[Byte],
                          width: Int, height: Int)

  /** Batched resize-to-target: decode, scale to fit (maxW, maxH)
    * preserving aspect ratio, re-encode. Decodable images are really
    * rescaled and re-encoded as PNG via ImageIO; stub payloads pass
    * their bytes through (dimensions still computed so downstream
    * filters work). The Spark shape is the contract —
    * iterator-in/iterator-out mapPartitions so one scaler instance
    * serves the whole task, output dims in pruned metadata columns so
    * downstream filters (e.g. drop tiny images) never touch bytes.
    */
  def resize(spark: SparkSession, media: DataFrame,
             maxW: Int = 256, maxH: Int = 256): Dataset[ResizedMedia] = {
    import spark.implicits._
    spread(spark, media).as[MediaRow].mapPartitions { rows =>
      // per-task scaler init would go here (ImageIO is stateless)
      rows.map { r =>
        // decode ONCE; dims and the rescale source share the image.
        // getWidth/getHeight are O(1) — Codec.measure would pay its
        // full luma-sampling loop just to discard the brightness
        val img = Codec.decodeImage(r.media)
        val (w, h) =
          if (img != null) (img.getWidth, img.getHeight)
          else { val (sw, sh, _, _) = StubCodec.decode(r.media); (sw, sh) }
        val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
        val nw = math.max(1, math.round(w * scale).toInt)
        val nh = math.max(1, math.round(h * scale).toInt)
        if (img != null && scale < 1.0)
          ResizedMedia(r.doc_id, "image/png", Codec.reencodeScaled(img, nw, nh), nw, nh)
        else
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
    spread(spark, media).as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val v = new Array[Double](dim)
        var h = byteFold64(r.media, 0x9e3779b97f4a7c15L)
        var d = 0
        var norm = 0.0
        while (d < dim) {
          h = graft.functions.VectorOps.mix64(h + d)
          v(d) = toUnitDouble(h) * 2.0 - 1.0
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
    * (verify with .explain: ReadSchema excludes `media`). THE single
    * definition of the q48 rollup (q48's builder calls this): the
    * brightness mean quantizes each value to integer millis before the
    * sum so the result is independent of partition summation order —
    * the repo's float discipline, and what lets the q48 oracle
    * hash-match a raw-double sum never could.
    */
  def mediaStats(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF()
      .groupBy(col("mime"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        (sum(col("width").cast("bigint")) / count(lit(1))).as("avg_width"),
        ((sum(round(col("brightness") * 1000).cast("bigint")) / lit(1000.0))
          / count(lit(1))).as("avg_brightness"))
      .orderBy(col("mime"))
}
