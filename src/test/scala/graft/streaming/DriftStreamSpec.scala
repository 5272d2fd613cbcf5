package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class LenDoc(doc_id: Long, n_chars: Long)

/** Streaming drift monitor: each checkpointed micro-batch's chi² must
  * BIT-EXACTLY equal the q151 batch kernel
  * ([[graft.ops.CorpusDrift.sourceLengthDrift]]) run over the prefix
  * corpus with every batch tagged as its own source — through replay,
  * compaction (keepLatest), and the compaction-crash backup window.
  */
class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  // three batches with deliberately different length regimes: b2 is a
  // shifted feed (all docs ~5 buckets longer), so its chi² must spike
  private val b1 = Seq(LenDoc(1, 100), LenDoc(2, 150), LenDoc(3, 420))
  private val b2 = Seq(LenDoc(4, 1100), LenDoc(5, 1180), LenDoc(6, 1250))
  private val b3 = Seq(LenDoc(7, 120), LenDoc(8, 410), LenDoc(9, 1210))

  /** The q151 kernel over batches 0..k, each tagged as its own source,
    * keeping only the row for batch k — the parity reference.
    */
  private def kernelRow(upTo: Int): (Long, Long, Double) = {
    val batches = Seq(b1, b2, b3).take(upTo + 1)
    val tagged = batches.zipWithIndex.flatMap { case (b, i) =>
      b.map(d => (d.doc_id, s"b$i", d.n_chars))
    }.toDF("doc_id", "source", "n_chars")
    val r = graft.ops.CorpusDrift.sourceLengthDrift(tagged)
      .filter(col("source") === s"b$upTo")
      .select(col("n_docs"), col("dof"), col("chi2"))
      .as[(Long, Long, Double)].head()
    r
  }

  private def streamedRow(outDir: String, k: Int): (Long, Long, Long, Double) =
    spark.read.parquet(s"$outDir/batch_id=$k")
      .select(col("n_docs"), col("n_total"), col("dof"), col("chi2"))
      .as[(Long, Long, Long, Double)].head()

  test("streamed chi2 == q151 kernel over the tagged prefix corpus; replay, compaction, crash window") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("drift-stream").toString
    val mem = MemoryStream[LenDoc]
    val q = DriftStream.monitor(mem.toDF(),
      s"$dir/ref", s"$dir/out", s"$dir/ckpt")
    try {
      Seq(b1, b2, b3).foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    // bit-exact parity per batch, incl. batch 0 against an empty
    // reference (its own histogram IS the corpus -> chi2 = 0)
    (0 to 2).foreach { k =>
      val (nd, nt, dof, chi2) = streamedRow(s"$dir/out", k)
      val (knd, kdof, kchi2) = kernelRow(k)
      assert(nd == knd && dof == kdof, s"batch $k shape mismatch")
      assert(chi2 == kchi2, s"batch $k: streamed $chi2 != kernel $kchi2")
      assert(nt == Seq(b1, b2, b3).take(k + 1).map(_.size).sum.toLong)
    }
    assert(streamedRow(s"$dir/out", 0)._4 == 0.0,
      "first batch defines the corpus and cannot drift from it")
    // the shifted feed (b2) must spike vs the conforming b3
    assert(streamedRow(s"$dir/out", 1)._4 > streamedRow(s"$dir/out", 2)._4,
      "shifted-length batch must score higher drift than a conforming one")

    // replaying the LAST batch overwrites its own partitions; the
    // batch_id < current guard keeps its own snapshot out of its
    // reference, so the score is byte-identical
    val before = streamedRow(s"$dir/out", 2)
    DriftStream.scoreBatch(b3.toDF(), 2L, s"$dir/ref", s"$dir/out")
    assert(streamedRow(s"$dir/out", 2) == before)
    val view = DriftStream.readHistogram(spark, s"$dir/ref")
      .as[(Long, Long)].collect().toSet
    // keep partition 1's cumulative snapshot for the leftover scenario
    val snap1 = spark.read.parquet(s"$dir/ref/batch_id=1")
      .as[(Long, Long)].collect().toSeq

    // compaction folds all but the latest snapshot (keepLatest: the
    // newest partition may belong to an uncommitted batch, and folding
    // it into batch 0 would put the batch inside its replay reference)
    DriftStream.compactHistogram(spark, s"$dir/ref")
    val parts = new java.io.File(s"$dir/ref").listFiles()
      .map(_.getName).filter(_.startsWith("batch_id=")).toSeq.sorted
    assert(parts == Seq("batch_id=0", "batch_id=2"), s"compaction left: $parts")
    assert(DriftStream.readHistogram(spark, s"$dir/ref")
      .as[(Long, Long)].collect().toSet == view)

    // replay after compaction: still byte-identical (the guard can
    // still exclude the batch's own contribution)
    DriftStream.scoreBatch(b3.toDF(), 2L, s"$dir/ref", s"$dir/out")
    assert(streamedRow(s"$dir/out", 2) == before,
      "replay after compaction diverged")

    // DeltaStore's delete-loop crash window: compaction may die during
    // its trailing per-partition deletes, leaving an already-folded
    // partition behind. A SUM-of-deltas design would double-count it —
    // cumulative latest-wins snapshots must not care. Simulate the
    // leftover and assert both the view and a replay are unchanged.
    snap1.toDF("bucket", "c").write.mode("overwrite")
      .parquet(s"$dir/ref/batch_id=1")
    assert(DriftStream.readHistogram(spark, s"$dir/ref")
      .as[(Long, Long)].collect().toSet == view,
      "leftover superseded snapshot changed the reference view")
    DriftStream.scoreBatch(b3.toDF(), 2L, s"$dir/ref", s"$dir/out")
    assert(streamedRow(s"$dir/out", 2) == before,
      "leftover superseded snapshot changed a replay's score")

    // compaction-crash window: batch_id=0 renamed aside — readers must
    // serve the sibling backup unchanged; next compaction restores it
    val fs = new org.apache.hadoop.fs.Path(s"$dir/ref")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(s"$dir/ref/batch_id=0"),
      new org.apache.hadoop.fs.Path(s"$dir/ref_old0")))
    assert(DriftStream.readHistogram(spark, s"$dir/ref")
      .as[(Long, Long)].collect().toSet == view)
    DriftStream.compactHistogram(spark, s"$dir/ref")
    assert(DriftStream.readHistogram(spark, s"$dir/ref")
      .as[(Long, Long)].collect().toSet == view)
  }

  test("junk n_chars rows excluded identically by stream and batch (shared bucket guard)") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("drift-junk").toString
    // each batch carries one junk row (negative n_chars — the value
    // class where Spark div-truncation and DuckDB //-floor disagree);
    // the single-definition lengthBucketed guard must exclude it on
    // BOTH sides or the bit-exact parity contract breaks
    val j1 = Seq(LenDoc(1, 100), LenDoc(2, -7), LenDoc(3, 420))
    val j2 = Seq(LenDoc(4, 1100), LenDoc(5, -1), LenDoc(6, 1250))
    val mem = MemoryStream[LenDoc]
    val q = DriftStream.monitor(mem.toDF(),
      s"$dir/ref", s"$dir/out", s"$dir/ckpt")
    try {
      Seq(j1, j2).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    (0 to 1).foreach { k =>
      val (nd, _, dof, chi2) = streamedRow(s"$dir/out", k)
      val tagged = Seq(j1, j2).take(k + 1).zipWithIndex.flatMap { case (b, i) =>
        b.map(d => (d.doc_id, s"b$i", d.n_chars))
      }.toDF("doc_id", "source", "n_chars")
      val (knd, kdof, kchi2) = graft.ops.CorpusDrift.sourceLengthDrift(tagged)
        .filter(col("source") === s"b$k")
        .select(col("n_docs"), col("dof"), col("chi2"))
        .as[(Long, Long, Double)].head()
      assert(nd == knd && dof == kdof && chi2 == kchi2,
        s"junk-batch $k parity: ($nd,$dof,$chi2) vs ($knd,$kdof,$kchi2)")
      assert(nd == 2L, "a junk row must not count as a document")
    }
  }

  test("mid-delete compaction crash at double-digit ids: leftovers are a " +
      "suffix, latest-wins view and replay unchanged") {
    // Twelve committed batches so ids reach double digits — listStatus
    // is lexicographic (batch_id=10 < batch_id=2) and a delete loop in
    // that order could remove the NEWEST folded snapshot while older
    // ones survive; a latest-wins read would then pick a stale
    // leftover over batch 0's newer fold. DeltaStore deletes
    // oldest-first (numeric), so a crash must always leave a SUFFIX.
    val dir = java.nio.file.Files.createTempDirectory("drift-crash").toString
    val batches = (0 to 11).map { k =>
      Seq(LenDoc(k * 10L, 50L + 200L * (k % 4)), LenDoc(k * 10L + 1, 1100L))
    }
    batches.zipWithIndex.foreach { case (b, k) =>
      DriftStream.scoreBatch(b.toDF(), k.toLong, s"$dir/ref", s"$dir/out")
    }
    val view = DriftStream.readHistogram(spark, s"$dir/ref")
      .as[(Long, Long)].collect().toSet
    val before = streamedRow(s"$dir/out", 11)

    // crash the delete loop after two deletions (keepLatest holds back
    // batch 11; folded range is 0..10, so deletes are 1,2 then boom)
    var deleted = Vector.empty[String]
    val boom = intercept[RuntimeException] {
      DriftStream.compactHistogram(spark, s"$dir/ref", onDelete = p => {
        if (deleted.size == 2) sys.error("simulated mid-delete crash")
        deleted :+= p.getName
      })
    }
    assert(boom.getMessage.contains("simulated"))
    assert(deleted == Vector("batch_id=1", "batch_id=2"),
      s"deletes must run oldest-first numeric, got $deleted")
    val survivors = new java.io.File(s"$dir/ref").listFiles()
      .map(_.getName).filter(_.startsWith("batch_id="))
      .map(_.stripPrefix("batch_id=").toLong).toSeq.sorted
    assert(survivors == Seq(0L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L, 11L),
      s"survivors must be a suffix of the folded range plus 0: $survivors")

    // latest-wins read still serves the newest snapshot, and a replay
    // of the (uncommitted-eligible) last batch is byte-identical
    assert(DriftStream.readHistogram(spark, s"$dir/ref")
      .as[(Long, Long)].collect().toSet == view,
      "mid-delete crash changed the reference view")
    DriftStream.scoreBatch(batches(11).toDF(), 11L, s"$dir/ref", s"$dir/out")
    assert(streamedRow(s"$dir/out", 11) == before,
      "mid-delete crash changed a replayed batch's score")

    // the next compaction re-folds the suffix and converges
    DriftStream.compactHistogram(spark, s"$dir/ref")
    val after = new java.io.File(s"$dir/ref").listFiles()
      .map(_.getName).filter(_.startsWith("batch_id=")).toSeq.sorted
    assert(after == Seq("batch_id=0", "batch_id=11"), s"post-crash compaction left: $after")
    assert(DriftStream.readHistogram(spark, s"$dir/ref")
      .as[(Long, Long)].collect().toSet == view)
  }

  test("quality monitor: streamed chi2 == q163 kernel over the tagged prefix corpus; replay byte-identical") {
    implicit val sq = spark.sqlContext
    // three feeds: qb1/qb3 prose (stopwords, length -> high deciles),
    // qb2 digit-soup shorts -> bottom deciles, must spike
    val prose = "the quick brown fox jumps over the lazy dog and runs " +
      "on to the river where it is seen in the morning light again"
    val qb1 = (1 to 4).map(i => (i.toLong, s"$prose v$i"))
    val qb2 = (5 to 8).map(i => (i.toLong, s"404 12 9999 31337 007 $i"))
    val qb3 = (9 to 12).map(i => (i.toLong, s"$prose w$i"))
    val batches = Seq(qb1, qb2, qb3)
    val dir = java.nio.file.Files.createTempDirectory("drift-quality").toString
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = DriftStream.monitorQuality(
      mem.toDF().toDF("doc_id", "text"),
      s"$dir/ref", s"$dir/out", s"$dir/ckpt")
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    // parity reference: the q163 batch kernel over batches 0..k, each
    // tagged as its own source, keeping batch k's row
    def kernelRow(upTo: Int): (Long, Long, Double) = {
      val tagged = batches.take(upTo + 1).zipWithIndex.flatMap {
        case (b, i) => b.map { case (id, t) => (id, s"b$i", t) }
      }.toDF("doc_id", "source", "text")
      graft.ops.CorpusDrift.qualityScoreDrift(tagged)
        .filter(col("source") === s"b$upTo")
        .select(col("n_docs"), col("dof"), col("chi2"))
        .as[(Long, Long, Double)].head()
    }
    (0 to 2).foreach { k =>
      val (nd, nt, dof, chi2) = streamedRow(s"$dir/out", k)
      val (knd, kdof, kchi2) = kernelRow(k)
      assert(nd == knd && dof == kdof, s"quality batch $k shape mismatch")
      assert(chi2 == kchi2,
        s"quality batch $k: streamed $chi2 != kernel $kchi2")
      assert(nt == batches.take(k + 1).map(_.size).sum.toLong)
    }
    // the junk feed must spike vs the conforming follow-up batch
    assert(streamedRow(s"$dir/out", 1)._4 > streamedRow(s"$dir/out", 2)._4,
      "digit-soup batch must score higher quality drift than prose")

    // replay byte-identity through the shared guard/state machinery
    val before = streamedRow(s"$dir/out", 2)
    DriftStream.scoreQualityBatch(qb3.toDF("doc_id", "text"), 2L,
      s"$dir/ref", s"$dir/out")
    assert(streamedRow(s"$dir/out", 2) == before,
      "quality replay diverged")
  }

  test("empty batch: no score row, reference carried forward unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("drift-empty").toString
    DriftStream.scoreBatch(b1.toDF(), 0L, s"$dir/ref", s"$dir/out")
    val view = DriftStream.readHistogram(spark, s"$dir/ref")
      .as[(Long, Long)].collect().toSet
    DriftStream.scoreBatch(b1.toDF().limit(0), 1L, s"$dir/ref", s"$dir/out")
    assert(spark.read.parquet(s"$dir/out/batch_id=1").count() == 0,
      "an empty batch has no distribution to score")
    assert(DriftStream.readHistogram(spark, s"$dir/ref")
      .as[(Long, Long)].collect().toSet == view,
      "empty batch must persist the reference unchanged")
    // and the NEXT batch still scores against the carried reference
    DriftStream.scoreBatch(b2.toDF(), 2L, s"$dir/ref", s"$dir/out")
    assert(spark.read.parquet(s"$dir/out/batch_id=2").count() == 1)
  }

  // ---- embedding (q197-axis) monitor ----

  // DIRECTIONALLY distinct frozen centers (assignment distance is
  // cosine — collinear centers would be indistinguishable)
  private val centers: Array[Array[Double]] =
    (0 until 8).map(i => Array(1.0, i.toDouble)).toArray
  private def vb(ids: Seq[Long], y: Float) =
    ids.map(id => (id, Seq(2.0f, y)))
  private val vb1 = vb(Seq(10L, 11L, 12L), 0.0f)   // cell 0
  private val vb2 = vb(Seq(13L, 14L, 15L), 14.0f)  // cell 7 — shifted feed
  private val vb3 = vb(Seq(16L, 17L), 0.0f) ++ vb(Seq(18L), 14.0f)

  /** The q197 chi² spine over batches 0..k tagged as their own source
    * with the SAME frozen centers, keeping batch k's row — the parity
    * reference (the embedding analogue of [[kernelRow]]).
    */
  private def cellKernelRow(upTo: Int): (Long, Long, Double) = {
    val batches = Seq(vb1, vb2, vb3).take(upTo + 1)
    val tagged = batches.zipWithIndex.flatMap { case (b, i) =>
      b.map(v => (v._1, s"b$i", v._2))
    }.toDF("vec_id", "source", "embedding")
    graft.ops.CorpusDrift.chiSquareByBucket(
      graft.cluster.KMeansAssign.assignMap(
          tagged.select(col("source"),
            col("embedding").cast("array<double>").as("v")),
          centers, "v")
        .select(col("source"), col("center_id").cast("bigint").as("bucket")))
      .filter(col("source") === s"b$upTo")
      .select(col("n_docs"), col("dof"), col("chi2"))
      .as[(Long, Long, Double)].head()
  }

  test("streamed embedding chi2 == cell-occupancy kernel over the tagged prefix; replay idempotent") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("embdrift").toString
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = DriftStream.monitorEmbedding(
      mem.toDF().toDF("vec_id", "embedding"), centers,
      s"$dir/ref", s"$dir/out", s"$dir/ckpt")
    try {
      Seq(vb1, vb2, vb3).foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    (0 to 2).foreach { k =>
      val (nd, _, dof, chi2) = streamedRow(s"$dir/out", k)
      val (knd, kdof, kchi2) = cellKernelRow(k)
      assert(nd == knd && dof == kdof, s"batch $k shape mismatch")
      assert(chi2 == kchi2, s"batch $k: streamed $chi2 != kernel $kchi2")
    }
    // the cell-shifted feed (vb2) must spike vs the mostly-conforming vb3
    assert(streamedRow(s"$dir/out", 1)._4 > streamedRow(s"$dir/out", 2)._4)
    // replay of the last batch is byte-identical (the batch_id guard)
    val before = streamedRow(s"$dir/out", 2)
    DriftStream.scoreEmbeddingBatch(
      vb3.toDF("vec_id", "embedding"), 2L, centers, s"$dir/ref", s"$dir/out")
    assert(streamedRow(s"$dir/out", 2) == before, "embedding replay diverged")
    // null-vector junk is excluded by the shared assignment convention
    DriftStream.scoreEmbeddingBatch(
      Seq((30L, Seq(2.0f, 0.0f)), (31L, null.asInstanceOf[Seq[Float]]))
        .toDF("vec_id", "embedding"),
      3L, centers, s"$dir/ref", s"$dir/out")
    assert(streamedRow(s"$dir/out", 3)._1 == 1L,
      "null-vector row must not enter the batch histogram")
  }
}
