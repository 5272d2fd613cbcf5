package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class InDoc(doc_id: Long, ts: Timestamp, text: String)
case class KeyedDoc(doc_id: Long, text: String)

class NearDupStreamSpec extends SparkSpec {
  import spark.implicits._

  // NOTE times start well after the epoch: a row whose event time sits
  // exactly AT the current watermark (the initial watermark is 0) is
  // dropped as late BEFORE the stateful operator — a doc at t(0) in
  // the first micro-batch silently vanishes.
  private def t(minutes: Long) = new Timestamp((100 + minutes) * 60000L)

  // doc 2 is a near-dup of doc 1 (one word changed); 3 is unrelated
  private val base = Seq(
    InDoc(1L, t(0), "spark streams deduplicate documents with minhash bands here"),
    InDoc(2L, t(1), "spark streams deduplicate documents with minhash buckets here"),
    InDoc(3L, t(1), "completely different text about gardens and orchids in spring"))

  test("lshBucketAnchors flags the same candidate docs as the batch LSH join") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[InDoc]
    val q = NearDupStream.lshBucketAnchors(spark, mem.toDF(),
      nHashes = 16, bandSize = 2, shingleSize = 2)
      .writeStream.format("memory").queryName("anchors")
      .outputMode("append").start()
    try {
      mem.addData(base: _*)
      q.processAllAvailable()
      val hits = spark.table("anchors")
        .as[NearDupStream.BucketHit].collect().toSeq
      // every doc emits one row per band (a missing doc here means its
      // rows were dropped as late — see the t() note above)
      assert(hits.map(_.doc_id).toSet == Set(1L, 2L, 3L))
      assert(hits.groupBy(_.doc_id).forall(_._2.size == 8))
      val flagged = hits.filter(h => h.anchor_id != h.doc_id)
        .map(_.doc_id).toSet
      // batch contract: docs that share a bucket with an earlier doc
      // (arrival order == id order here) are exactly the batch join's
      // higher-id candidates
      val batchFlagged = graft.ops.Dedup.minhashCandidates(
        base.toDF().select(col("doc_id"), col("text")),
        nHashes = 16, bandSize = 2, shingleSize = 2)
        .select(col("d2")).as[Long].collect().toSet
      assert(flagged == batchFlagged)
      assert(flagged.contains(2L) && !flagged.contains(3L))
      // anchors point at the bucket's first arrival
      assert(hits.filter(h => h.doc_id == 2L && h.anchor_id != 2L)
        .forall(_.anchor_id == 1L))
    } finally q.stop()
  }

  test("bucket state expires past watermark + ttl: recurrence re-anchors to itself") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[InDoc]
    val q = NearDupStream.lshBucketAnchors(spark, mem.toDF(),
      nHashes = 16, bandSize = 2, shingleSize = 2,
      watermarkDelay = "1 minutes", bucketTtlMs = 5L * 60000L)
      .writeStream.format("memory").queryName("anchors_ttl")
      .outputMode("append").start()
    try {
      mem.addData(InDoc(1L, t(0),
        "spark streams deduplicate documents with minhash bands here"))
      q.processAllAvailable()
      // push the watermark far past t(0) + ttl: buckets for doc 1 die
      mem.addData(InDoc(50L, t(1000),
        "completely different text about gardens and orchids in spring"))
      q.processAllAvailable()
      // identical content to doc 1, inside the new watermark: its
      // buckets are gone, so it must anchor to itself (horizon trade)
      mem.addData(InDoc(60L, t(1001),
        "spark streams deduplicate documents with minhash bands here"))
      q.processAllAvailable()
      val hits = spark.table("anchors_ttl")
        .as[NearDupStream.BucketHit].collect().toSeq
      assert(hits.filter(_.doc_id == 60L).forall(_.anchor_id == 60L))
    } finally q.stop()
  }

  test("fold mode: case/diacritic-disguised dup anchors cross-batch; raw stream misses it") {
    implicit val sq = spark.sqlContext
    val original = InDoc(1L, t(0),
      "the quick brown fox jumps over the lazy dog near the river bank")
    // case + accent disguise, a LATER batch: folds to the original
    val disguised = InDoc(2L, t(1),
      "The Quick Brown Fox jumps over the lazy dog near the rivér bank")
    def flagged(fold: Boolean, name: String): Set[Long] = {
      val mem = MemoryStream[InDoc]
      val q = NearDupStream.lshBucketAnchors(spark, mem.toDF(),
        nHashes = 16, bandSize = 2, shingleSize = 2, fold = fold)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        mem.addData(original)
        q.processAllAvailable()
        mem.addData(disguised)
        q.processAllAvailable()
      } finally q.stop()
      spark.table(name).as[NearDupStream.BucketHit]
        .collect().filter(h => h.anchor_id != h.doc_id).map(_.doc_id).toSet
    }
    assert(flagged(fold = false, "anchors_raw").isEmpty,
      "raw stream must miss the disguised dup (control)")
    val caught = flagged(fold = true, "anchors_folded")
    assert(caught == Set(2L), s"folded stream must anchor the disguise: $caught")
    // stream gate == batch gate: the folded batch chain proposes the
    // same candidate set over the same rows
    val batchFlagged = graft.ops.Dedup.candidatesFromBands(
      graft.ops.Dedup.bandsFromSignatures(
        graft.ops.Dedup.foldedMinhashSignatures(
          Seq(original, disguised).toDF().select(col("doc_id"), col("text")),
          nHashes = 16, shingleSize = 2),
        nHashes = 16, bandSize = 2))
      .select(col("d2")).as[Long].collect().toSet
    assert(caught == batchFlagged,
      s"stream $caught != batch folded chain $batchFlagged")
  }

  test("dedupOnIngest drops cross-batch duplicate keys via the history store") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("neardup-ingest").toString
    val mem = MemoryStream[KeyedDoc]
    val q = NearDupStream.dedupOnIngest(mem.toDF(), "doc_id",
      s"$dir/history", s"$dir/out", s"$dir/ckpt",
      expectedItems = 1000L, fpp = 0.01)
    try {
      mem.addData(KeyedDoc(1L, "a"), KeyedDoc(2L, "b"), KeyedDoc(2L, "a2"))
      q.processAllAvailable()
      mem.addData(KeyedDoc(2L, "b"), KeyedDoc(3L, "c"))
      q.processAllAvailable()
      val out = spark.read.parquet(s"$dir/out")
        .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
      // batch 1 kept {1,2} — key 2's in-batch dup collapsed to the
      // row-wise MIN payload ("a2" < "b"), the deterministic keep;
      // batch 2 kept only {3} (2 already in history)
      assert(out.sortBy(_._1) == Seq(1L -> "a", 2L -> "a2", 3L -> "c"))
      val hist = spark.read.parquet(s"$dir/history")
        .select(col("doc_id")).as[Long].collect().toSeq
      assert(hist.sorted == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  /** Streaming band-index maintenance: N micro-batches (including a
    * re-ingested doc) must leave the persisted index serving exactly
    * what one batch rebuild over the latest-wins corpus would, through
    * both the merge-on-read view and after compaction; and a replayed
    * indexBatch must be a no-op (partition overwrite).
    */
  test("maintainBandIndex: stream of deltas == batch rebuild; compaction and replay safe") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("neardup-bandidx").toString
    val mem = MemoryStream[KeyedDoc]
    val q = NearDupStream.maintainBandIndex(mem.toDF(),
      s"$dir/index", s"$dir/ckpt", nHashes = 16, bandSize = 2, shingleSize = 2)
    val docsB1 = Seq(
      KeyedDoc(1L, "spark streams deduplicate documents with minhash bands here"),
      KeyedDoc(2L, "completely different text about gardens and orchids in spring"))
    val docsB2 = Seq(
      // doc 1 RE-INGESTED with new content: must supersede at read time
      KeyedDoc(1L, "revised spark document with fresh words and new shingles"),
      KeyedDoc(3L, "a third unrelated document mentioning telescopes and comets"))
    try {
      mem.addData(docsB1: _*)
      q.processAllAvailable()
      mem.addData(docsB2: _*)
      q.processAllAvailable()
    } finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Int, Long)].collect().toSet
    val latestCorpus = (docsB1.filter(_.doc_id != 1L) ++ docsB2).toDF()
    val rebuilt = rows(graft.ops.Dedup.bandSignatures(latestCorpus,
      nHashes = 16, bandSize = 2, shingleSize = 2))
    val served = rows(NearDupStream.readBandIndex(spark, s"$dir/index"))
    assert(served == rebuilt, "merge-on-read view diverged from batch rebuild")
    // replaying the last micro-batch (crash before checkpoint commit)
    // overwrites its own partition — the view must not change
    NearDupStream.indexBatch(docsB2.toDF(), 1L, s"$dir/index", 16, 2, 2)
    assert(rows(NearDupStream.readBandIndex(spark, s"$dir/index")) == rebuilt)
    // compaction folds to one partition; serving unchanged
    NearDupStream.compactBandIndex(spark, s"$dir/index")
    val parts = new java.io.File(s"$dir/index").listFiles()
      .map(_.getName).filter(_.startsWith("batch_id="))
    assert(parts.toSeq == Seq("batch_id=0"), s"compaction left: ${parts.toSeq}")
    assert(rows(NearDupStream.readBandIndex(spark, s"$dir/index")) == rebuilt)
    // and the probe path works against the compacted index
    val probe = graft.ops.Dedup.probeBandIndex(
      NearDupStream.readBandIndex(spark, s"$dir/index"),
      Seq(KeyedDoc(9L, "revised spark document with fresh words and new shingles")).toDF(),
      nHashes = 16, bandSize = 2, shingleSize = 2)
      .as[(Long, Long)].collect().toSet
    assert(probe.contains((9L, 1L)), s"probe missed the re-ingested twin: $probe")
  }

  test("compaction crash window: the batch_id=0 backup serves in place on read") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("neardup-crash").toString
    val idx = s"$dir/index"
    NearDupStream.indexBatch(Seq(
      KeyedDoc(1L, "alpha beta gamma delta epsilon zeta"),
      KeyedDoc(2L, "one two three four five six")).toDF(), 0L, idx, 16, 2, 2)
    NearDupStream.indexBatch(Seq(
      KeyedDoc(3L, "seven eight nine ten eleven twelve")).toDF(), 1L, idx, 16, 2, 2)
    NearDupStream.compactBandIndex(spark, idx)
    val before = NearDupStream.readBandIndex(spark, idx)
      .as[(Long, Int, Long)].collect().toSet
    // simulate a crash between the backup rename and the swap: the
    // compacted partition is aside as _old0, root has no batch_id=0
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(s"$idx/batch_id=0"),
      new org.apache.hadoop.fs.Path(idx + "_old0"))
    val restored = NearDupStream.readBandIndex(spark, idx)
      .as[(Long, Int, Long)].collect().toSet
    assert(restored == before, "backup must restore transparently")
    // a post-compaction delta still merges latest-wins on top
    NearDupStream.indexBatch(Seq(
      KeyedDoc(3L, "replacement words entirely different from before now")).toDF(),
      7L, idx, 16, 2, 2)
    val served = NearDupStream.readBandIndex(spark, idx)
      .as[(Long, Int, Long)].collect().toSet
    val expect = graft.ops.Dedup.bandSignatures(Seq(
        KeyedDoc(1L, "alpha beta gamma delta epsilon zeta"),
        KeyedDoc(2L, "one two three four five six"),
        KeyedDoc(3L, "replacement words entirely different from before now")).toDF(),
      nHashes = 16, bandSize = 2, shingleSize = 2)
      .as[(Long, Int, Long)].collect().toSet
    assert(served == expect)
  }

  test("processBatch replay is idempotent: a batch never dedups against its own keys") {
    val dir = java.nio.file.Files.createTempDirectory("neardup-replay").toString
    def run(batch: Seq[KeyedDoc], id: Long): Unit =
      NearDupStream.processBatch(batch.toDF(), id, "doc_id",
        s"$dir/history", s"$dir/out", 1000L, 0.01)
    run(Seq(KeyedDoc(1L, "a"), KeyedDoc(2L, "b")), 0L)
    // crash before checkpoint commit -> the same batchId replays with
    // its own history partition already on disk; it must re-emit both
    // rows, not dedup itself to empty
    run(Seq(KeyedDoc(1L, "a"), KeyedDoc(2L, "b")), 0L)
    val out0 = spark.read.parquet(s"$dir/out/batch_id=0")
      .select(col("doc_id")).as[Long].collect().toSeq
    assert(out0.sorted == Seq(1L, 2L))
    // the next batch still dedups against batch 0's history
    run(Seq(KeyedDoc(2L, "b"), KeyedDoc(3L, "c")), 1L)
    val out1 = spark.read.parquet(s"$dir/out/batch_id=1")
      .select(col("doc_id")).as[Long].collect().toSeq
    assert(out1 == Seq(3L))
  }
}
