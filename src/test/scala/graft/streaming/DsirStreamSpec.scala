package graft.streaming

import graft.SparkSpec
import graft.ops.CurationOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class DsirDoc(doc_id: Option[Long], text: String, source: String)

/** Streaming DSIR state: after every checkpointed micro-batch, the
  * streamed bucket table must BIT-EXACTLY equal the q176 kernel's
  * [[CurationOps.dsirBucketCounts]] over the concatenated prefix
  * corpus, and a selection from the streamed counts must equal
  * [[CurationOps.dsirSelect]] over that prefix — same weights, same
  * Gumbel keys, same top-k. Proven through replay, compaction, a
  * leftover superseded partition, and the compaction-crash backup
  * window.
  */
class DsirStreamSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fixture = graft.ops.Tables.documents(spark, sfDir)
    .select(col("doc_id"), col("text"), col("source"))
    .as[DsirDoc].collect().toSeq
  // null-id junk rides in batch 0; the rest split by doc_id mod 3
  private lazy val batches: Seq[Seq[DsirDoc]] = (0 to 2).map { k =>
    fixture.filter(d => d.doc_id.map(i => ((i % 3) + 3) % 3 == k)
      .getOrElse(k == 0))
  }
  private def prefix(upTo: Int): DataFrame =
    batches.take(upTo + 1).flatten.toDF()

  private type B = (Long, Long, Long)

  private def kernelBuckets(upTo: Int): Set[B] =
    CurationOps.dsirBucketCounts(
        CurationOps.dsirBigrams(CurationOps.dsirBase(prefix(upTo)), 256))
      .as[B].collect().toSet

  private def streamedBuckets(dir: String): Set[B] =
    DsirStream.readBuckets(spark, dir).as[B].collect().toSet

  private type Sel = (Long, String, Long, Long, Long)

  test("streamed buckets == q176 counts over the prefix; selection from streamed state == dsirSelect; replay, compaction, crash windows") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("dsir-stream").toString
    val buckets = s"$dir/buckets"
    val mem = MemoryStream[DsirDoc]
    val q = DsirStream.monitor(mem.toDF(), buckets, s"$dir/ckpt")
    try {
      batches.foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    // bit-exact bucket parity per prefix (each batch's own snapshot is
    // the full cumulative table through it)
    (0 to 2).foreach { k =>
      val streamed = spark.read.parquet(s"$buckets/batch_id=$k")
        .select(col("bucket"), col("cnt_r"), col("cnt_t"))
        .as[B].collect().toSet
      assert(streamed == kernelBuckets(k),
        s"batch $k: streamed buckets != kernel counts over the prefix")
    }
    // fixture sanity: the parity is not vacuous
    assert(kernelBuckets(2).exists(_._3 > 0L),
      "fixture must contain target-labelled bigrams")

    // selection parity: streamed sufficient statistic reproduces the
    // batch selection over the full seen corpus — ordered rows
    val selStream = DsirStream.selectCurrent(spark, prefix(2), buckets)
      .as[Sel].collect().toSeq
    val selKernel = CurationOps.dsirSelect(prefix(2))
      .as[Sel].collect().toSeq
    assert(selStream == selKernel, "selection from streamed counts diverged")
    assert(selKernel.nonEmpty)

    // replaying the LAST batch overwrites its partition byte-identically
    val before = streamedBuckets(buckets)
    DsirStream.updateBatch(batches(2).toDF(), 2L, buckets, 256)
    assert(streamedBuckets(buckets) == before, "replay diverged")

    // keep partition 1 for the leftover scenario below
    val snap1 = spark.read.parquet(s"$buckets/batch_id=1")
      .select(col("bucket"), col("cnt_r"), col("cnt_t"))
      .as[B].collect().toSeq

    // compaction: view unchanged, replay still identical
    DsirStream.compactBuckets(spark, buckets)
    val parts = new java.io.File(buckets).listFiles()
      .map(_.getName).filter(_.startsWith("batch_id=")).toSeq.sorted
    assert(parts == Seq("batch_id=0", "batch_id=2"), s"compaction left: $parts")
    assert(streamedBuckets(buckets) == before)
    DsirStream.updateBatch(batches(2).toDF(), 2L, buckets, 256)
    assert(streamedBuckets(buckets) == before, "replay after compaction diverged")

    // leftover superseded partition (the delete-loop crash window):
    // latest-wins must ignore the stale cumulative snapshot
    snap1.toDF("bucket", "cnt_r", "cnt_t").coalesce(1)
      .write.mode("overwrite").parquet(s"$buckets/batch_id=1")
    assert(streamedBuckets(buckets) == before,
      "leftover superseded partition changed the reference")
    DsirStream.updateBatch(batches(2).toDF(), 2L, buckets, 256)
    assert(streamedBuckets(buckets) == before)

    // compaction-crash backup window: batch_id=0 renamed aside — the
    // reader unions the backup in place, latest-wins still picks 2
    val fs = new org.apache.hadoop.fs.Path(buckets)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(s"$buckets/batch_id=0"),
      new org.apache.hadoop.fs.Path(buckets + "_old0")))
    assert(streamedBuckets(buckets) == before,
      "backup window changed the reference")
    DsirStream.compactBuckets(spark, buckets)
    assert(streamedBuckets(buckets) == before)
  }

  test("candidates hashing to unseen buckets: smoothed count-zero weight, no dropped docs") {
    val dir = java.nio.file.Files.createTempDirectory("dsir-unseen").toString
    val buckets = s"$dir/buckets"
    // tiny reference: only batch 0's smallest docs -> sparse bucket coverage
    val tiny = batches(0).filter(d => Option(d.text).exists(_.length < 200)).take(3)
    assert(tiny.nonEmpty)
    DsirStream.updateBatch(tiny.toDF(), 0L, buckets, 256)
    val ref = DsirStream.readBuckets(spark, buckets).as[B].collect()
    assert(ref.length < 256, "reference must leave some buckets unseen")
    // a candidate pool large enough that some bigram hits an unseen bucket
    val cands = batches(1).toDF()
    val nCand = graft.ops.CurationOps.dsirBase(cands).count()
    val sel = DsirStream.selectCurrent(spark, cands, buckets, 256, k = 100000)
      .collect()
    assert(sel.length == nCand,
      s"every candidate must be scored and ranked: ${sel.length} vs $nCand")
  }

  test("empty batch persists the reference unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("dsir-empty").toString
    val buckets = s"$dir/buckets"
    DsirStream.updateBatch(batches(0).toDF(), 0L, buckets, 256)
    val before = streamedBuckets(buckets)
    DsirStream.updateBatch(batches(0).toDF().limit(0), 1L, buckets, 256)
    assert(streamedBuckets(buckets) == before)
    assert(before == kernelBuckets(0))
  }
}
