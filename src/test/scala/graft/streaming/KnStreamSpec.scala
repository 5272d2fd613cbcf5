package graft.streaming

import graft.SparkSpec
import graft.ops.TextAnalytics
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class KnDoc(doc_id: Option[Long], text: String)

/** Streaming KN trainer: after every checkpointed micro-batch, the
  * streamed bigram-count store must BIT-EXACTLY equal the q189
  * kernel's [[TextAnalytics.knCounts]] over the concatenated prefix
  * corpus, and scoring from the streamed model must equal the batch
  * kernel [[TextAnalytics.knBigramLogProb]] over that prefix — same
  * derived statistics, same exact micro-nat scores. Proven through
  * replay, compaction, a leftover superseded partition, and the
  * compaction-crash backup window; the unseen-bigram backoff arms are
  * pinned against hand-derived exact values.
  */
class KnStreamSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fixture = graft.ops.Tables.documents(spark, sfDir)
    .select(col("doc_id"), col("text"))
    .as[KnDoc].collect().toSeq
  private lazy val batches: Seq[Seq[KnDoc]] = (0 to 2).map { k =>
    fixture.filter(d => d.doc_id.map(i => ((i % 3) + 3) % 3 == k)
      .getOrElse(k == 0))
  }
  private def prefix(upTo: Int): DataFrame =
    batches.take(upTo + 1).flatten.toDF()

  private type C = (String, String, Long)
  private type Sc = (Long, Long, Long, Double)

  private def kernelCounts(upTo: Int): Set[C] =
    TextAnalytics.knCounts(TextAnalytics.knBigrams(
        prefix(upTo).select(col("doc_id"),
          TextAnalytics.toks(col("text")).as("t"))))
      .as[C].collect().toSet

  private def streamed(dir: String): Set[C] =
    KnStream.readCounts(spark, dir).as[C].collect().toSet

  test("streamed counts == q189 trainer over the prefix; scoring parity; replay, compaction, crash windows") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("kn-stream").toString
    val cnt = s"$dir/counts"
    val mem = MemoryStream[KnDoc]
    val q = KnStream.monitor(mem.toDF(), cnt, s"$dir/ckpt")
    try {
      batches.foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    (0 to 2).foreach { k =>
      assert(KnStream.readCounts(spark, cnt, Some(k + 1L))
          .as[C].collect().toSet == kernelCounts(k),
        s"batch $k: streamed counts != kernel over the prefix")
    }

    // scoring parity over the full seen corpus (self-scoring: only
    // the seen-bigram arm fires, the q189 contract)
    val scStream = KnStream.scoreCurrent(spark, prefix(2), cnt)
      .as[Sc].collect().toSet
    val scKernel = TextAnalytics.knBigramLogProb(prefix(2))
      .as[Sc].collect().toSet
    assert(scStream == scKernel, "scores from streamed model diverged")
    assert(scKernel.exists(_._3 != 0L), "fixture must produce nonzero scores")

    // replaying the LAST batch overwrites its partition byte-identically
    val before = streamed(cnt)
    KnStream.updateBatch(batches(2).toDF(), 2L, cnt)
    assert(streamed(cnt) == before, "replay diverged")

    val snap1 = spark.read.parquet(s"$cnt/batch_id=1")
      .select(col("w1"), col("w2"), col("c12")).as[C].collect().toSeq

    KnStream.compact(spark, cnt)
    val parts = new java.io.File(cnt).listFiles()
      .map(_.getName).filter(_.startsWith("batch_id=")).toSeq.sorted
    assert(parts == Seq("batch_id=0", "batch_id=2"), s"compaction left: $parts")
    assert(streamed(cnt) == before)
    KnStream.updateBatch(batches(2).toDF(), 2L, cnt)
    assert(streamed(cnt) == before, "replay after compaction diverged")

    // leftover superseded partition: latest-wins per key must ignore
    // the stale cumulative rows (a sum-of-deltas fold would not)
    snap1.toDF("w1", "w2", "c12").coalesce(1)
      .write.mode("overwrite").parquet(s"$cnt/batch_id=1")
    assert(streamed(cnt) == before,
      "leftover superseded partition changed the model")

    // compaction-crash backup window
    val fs = new org.apache.hadoop.fs.Path(cnt)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(s"$cnt/batch_id=0"),
      new org.apache.hadoop.fs.Path(cnt + "_old0")))
    assert(streamed(cnt) == before, "backup window changed the model")
    KnStream.compact(spark, cnt)
    assert(streamed(cnt) == before)
  }

  test("unseen-bigram scoring: pure backoff for known ends, zero for unknown, no dropped docs") {
    val dir = java.nio.file.Files.createTempDirectory("kn-unseen").toString
    val cnt = s"$dir/counts"
    KnStream.updateBatch(batches(0).toDF(), 0L, cnt)
    val counts = KnStream.readCounts(spark, cnt).as[C].collect()
    val pairs = counts.map(c => (c._1, c._2)).toSet
    val c1 = counts.groupBy(_._1).map { case (w, g) => w -> g.map(_._3).sum }
    val n1f = counts.groupBy(_._1).map { case (w, g) => w -> g.size.toLong }
    val n1b = counts.groupBy(_._2).map { case (w, g) => w -> g.size.toLong }
    val nn = counts.length.toLong
    // a seen context and a seen continuation that never co-occur
    val (x, y) = (for {
      a <- c1.keys.toSeq.sorted
      b <- n1b.keys.toSeq.sorted
      if !pairs.contains((a, b))
    } yield (a, b)).head
    def lnMicro(v: Long): Long = graft.ops.Sampling.lnMicro(v)
    val backoff = lnMicro(3L * n1f(x) * n1b(y)) - lnMicro(4L * c1(x) * nn)
    val out = KnStream.scoreCurrent(spark,
        Seq(KnDoc(Some(901L), s"$x $y"), KnDoc(Some(902L), "zzqx zzqy")).toDF(),
        cnt)
      .as[Sc].collect().map(r => r._1 -> r).toMap
    assert(out(901L) == ((901L, 1L, backoff,
      backoff.toDouble / (1.0 * 1e6))),
      s"unseen pair with known ends must take the exact backoff mass: ${out(901L)}")
    assert(out(902L) == ((902L, 1L, 0L, 0.0)),
      "a bigram with unknown ends contributes zero, and the doc is not dropped")
  }

  test("empty batch persists the store unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("kn-empty").toString
    val cnt = s"$dir/counts"
    KnStream.updateBatch(batches(0).toDF(), 0L, cnt)
    val before = streamed(cnt)
    KnStream.updateBatch(Seq.empty[KnDoc].toDF(), 1L, cnt)
    assert(streamed(cnt) == before, "an empty batch changed the model")
  }
}
