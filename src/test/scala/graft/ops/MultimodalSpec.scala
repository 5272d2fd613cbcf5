package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  val docs = Seq(
    (0L, "alpha beta gamma"),
    (1L, "delta epsilon zeta"),
    (2L, "alpha beta gamma")).toDF("doc_id", "text")

  test("attachMedia: binary payload is deterministic in the text") {
    val m = Multimodal.attachMedia(docs)
    val rows = m.select("doc_id", "media").as[(Long, Array[Byte])].collect()
      .map { case (id, b) => id -> b.toSeq }.toMap
    assert(rows(0L) == rows(2L)) // same text -> same bytes
    assert(rows(0L) != rows(1L))
    assert(rows(0L).length == 32) // sha256 payload
    val mimes = m.select("mime").as[String].collect().toSet
    assert(mimes.subsetOf(Set("image/png", "image/jpeg", "image/webp")))
  }

  /** Recall gate for the q57 embed-kNN path (the pattern q47/q51/q102
    * carry for the text/vector ANN ops): plant pairs with IDENTICAL
    * media payloads — the deterministic embed makes them exact
    * embedding duplicates, cosine 1 — among distinct-payload noise,
    * and require every planted query to retrieve its partner at
    * rank 1. Also a separation check: no noise doc scores ~1 against
    * a planted query.
    */
  test("embed kNN retrieves planted duplicate-payload pairs at rank 1 (recall@1 = 1)") {
    val noise = (0L until 100L).map(i => (i, s"unique content number $i with words"))
    val planted = (0L until 10L).map(i => (1000L + i, s"unique content number $i with words"))
    val corpus = (noise ++ planted).toDF("doc_id", "text")
    val emb = Multimodal.embedStub(spark, Multimodal.attachMedia(corpus))
      .toDF("vec_id", "v")
    val hits = Similarity.bruteForceKnn(
      emb.filter(col("vec_id") >= 1000L).toDF("qid", "qv"), emb, k = 3)
    val top1 = hits.filter(col("rnk") === 1)
      .select(col("qid"), col("cid"), col("score"))
      .as[(Long, Long, Double)].collect()
    assert(top1.length == 10)
    val recallAt1 = top1.count { case (q, c, _) => c == q - 1000L } / 10.0
    assert(recallAt1 == 1.0, s"recall@1 = $recallAt1: ${top1.toSeq}")
    top1.foreach { case (q, _, s) =>
      assert(s > 1.0 - 1e-9, s"planted partner of $q scored $s, expected ~1") }
    // separation: second-ranked (a noise doc) is well below the partner
    val rnk2 = hits.filter(col("rnk") === 2).select(col("score")).as[Double].collect()
    assert(rnk2.forall(_ < 0.999), s"noise doc scored near 1: ${rnk2.max}")
  }

  test("extractFeatures: stub codec yields stable, bounded features") {
    val f = Multimodal.extractFeatures(spark, Multimodal.attachMedia(docs)).collect()
    assert(f.length == 3)
    val f0 = f.find(_.doc_id == 0L).get
    val f2 = f.find(_.doc_id == 2L).get
    assert(f0.width == f2.width && f0.brightness == f2.brightness)
    assert(f.forall(x => x.width >= 64 && x.width < 64 + 1024))
    assert(f.forall(x => x.channels >= 1 && x.channels <= 4))
    assert(f.forall(x => x.brightness >= 0.0 && x.brightness < 1.0))
    assert(f.forall(x => x.n_bytes == 32))
  }

  test("junk media rows (NULL payload / NULL doc_id) drop row-local, never NPE the scan") {
    val junk = Seq[(java.lang.Long, String, Array[Byte])](
      (1L, "image/stub", Array[Byte](1, 2, 3, 4)),
      (2L, "image/stub", null),
      (null, "image/stub", Array[Byte](9, 9)))
      .toDF("doc_id", "mime", "media")
    assert(Multimodal.embedStub(spark, junk).collect().map(_.doc_id).toSeq == Seq(1L))
    assert(Multimodal.extractFeatures(spark, junk).collect().map(_.doc_id).toSeq == Seq(1L))
    assert(Multimodal.resize(spark, junk).collect().map(_.doc_id).toSeq == Seq(1L))
    assert(Multimodal.sampleFrames(junk, nFrames = 4, stride = 2)
      .select("doc_id").distinct().as[Long].collect().toSeq == Seq(1L),
      "sampleFrames must drop junk rows at the shared entry like every sibling op")
  }

  test("sampleFrames: stride sampling with per-frame byte-slice payload") {
    val frames = Multimodal.sampleFrames(Multimodal.attachMedia(docs), nFrames = 8, stride = 2)
      .filter($"doc_id" === 0L).select("frame_idx", "frame")
      .as[(Int, Array[Byte])].collect().sortBy(_._1)
    assert(frames.map(_._1).toList == List(0, 2, 4, 6))
    assert(frames.forall(_._2.length == 4))
    // different frames slice different bytes
    assert(frames(0)._2.toSeq != frames(1)._2.toSeq)
  }

  test("mediaStats groups by mime with metadata only") {
    val stats = Multimodal.mediaStats(
      Multimodal.extractFeatures(spark, Multimodal.attachMedia(docs)))
    val n = stats.agg(sum("n")).as[Long].head()
    assert(n == 3)
  }

  test("real PNG decodes to true dimensions and really rescales") {
    import java.awt.image.BufferedImage
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val white = png(320, 200, 0xffffff)
    val black = png(8, 8, 0x000000)
    val media = Seq((1L, "image/png", white), (2L, "image/png", black))
      .toDF("doc_id", "mime", "media")
    val f = Multimodal.extractFeatures(spark, media).collect().sortBy(_.doc_id)
    assert(f(0).width == 320 && f(0).height == 200 && f(0).channels == 3)
    assert(f(0).brightness > 0.99)
    assert(f(1).width == 8 && f(1).height == 8)
    assert(f(1).brightness < 0.01)
    // resize really rescales and re-encodes: the output payload decodes
    // at the new dimensions and keeps its (white) content
    val out = Multimodal.resize(spark, media, maxW = 100, maxH = 100)
      .collect().sortBy(_.doc_id)
    assert(out(0).width == 100 && out(0).height == 63) // 320x200 fit in 100-box
    assert(out(0).mime == "image/png")
    val (w2, h2, _, b2) = Multimodal.Codec.decode(out(0).media)
    assert(w2 == 100 && h2 == 63)
    assert(b2 > 0.98)
    // images already inside the box are not upscaled or re-encoded
    assert(out(1).width == 8 && out(1).media.sameElements(black))
  }

  test("resize: aspect ratio preserved, fits target box, bytes batched per partition") {
    val out = Multimodal.resize(spark, Multimodal.attachMedia(docs),
      maxW = 100, maxH = 100).collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.width <= 100 && r.height <= 100)
      assert(r.width >= 1 && r.height >= 1)
      val (w, h, _, _) = Multimodal.StubCodec.decode(r.media)
      // scaled dims keep the original aspect ratio within rounding
      val scale = math.min(1.0, math.min(100.0 / w, 100.0 / h))
      assert(r.width == math.max(1, math.round(w * scale).toInt))
      assert(r.height == math.max(1, math.round(h * scale).toInt))
    }
  }

  test("q177 dHash: re-encoded/rescaled/retouched copies land under the threshold, different images far above") {
    import graft.ops.Multimodal.PHash
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val base = Multimodal.renderPng(7, seed = 1L)
    val retouched = Multimodal.renderPng(7, seed = 999L) // same pattern, different pixel edits
    val different = Multimodal.renderPng(23, seed = 1L)  // different frequency pair
    val hBase = PHash.dhash64(base)
    assert(hamming(hBase, PHash.dhash64(retouched)) <= 10,
      "a retouched copy of the same image must stay under the near-dup threshold")
    assert(hamming(hBase, PHash.dhash64(different)) > 10,
      "a different pattern must not read as a near-dup")
    // rescale robustness — the POINT of a perceptual hash: a half-size
    // re-encoded thumbnail of the same image keeps (nearly) the same
    // gradient signs, where any exact byte/content hash is blind
    val img = Multimodal.Codec.decodeImage(base)
    val thumb = Multimodal.Codec.reencodeScaled(img, 32, 24)
    assert(!thumb.sameElements(base), "the thumbnail is a genuinely different byte payload")
    assert(hamming(hBase, PHash.dhash64(thumb)) <= 10,
      "a re-encoded half-size thumbnail must stay under the threshold")
    // stub path: equal non-image payloads hash equal (the exact-dup floor)
    val blobA = Array.tabulate[Byte](40)(i => (i * 7).toByte)
    val blobB = blobA.clone()
    assert(PHash.dhash64(blobA) == PHash.dhash64(blobB))
  }

  test("q177 pipeline: planted near-dup image pairs found, cross-pattern pairs absent") {
    // same-pattern docs (doc_id % 50) must pair up through the banded
    // join + hamming verify; different patterns must not
    val docs = Seq((1L, "a"), (51L, "b"), (101L, "c"), (2L, "d"), (13L, "e"))
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("s")).withColumn("n_chars", length(col("text")))
    val sig = Multimodal.phashSig64(spark, Multimodal.attachSyntheticImages(spark, docs))
    val pairs = Dedup.simhashBandPairs(sig, maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 51L)) && pairs.contains((1L, 101L))
      && pairs.contains((51L, 101L)),
      s"pattern-1 trio must pair, got $pairs")
    assert(!pairs.exists { case (a, b) => a % 50 != b % 50 },
      s"cross-pattern pair leaked: $pairs")
  }
}
