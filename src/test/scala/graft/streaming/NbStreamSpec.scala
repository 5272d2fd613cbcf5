package graft.streaming

import graft.SparkSpec
import graft.ops.TextAnalytics
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class NbDoc(doc_id: Option[Long], text: String, source: String)

/** Streaming NB trainer: after every checkpointed micro-batch, the
  * streamed token-count and prior stores must BIT-EXACTLY equal the
  * q178 kernel's [[TextAnalytics.nbTokenCounts]]/nbPriorCounts over
  * the concatenated prefix corpus, and scoring from the streamed
  * model must equal the batch kernel's nbScoreFromCounts over that
  * prefix — same llr table, same prior, same exact micro-nat scores.
  * Proven through replay, compaction of both stores, a leftover
  * superseded partition, and the compaction-crash backup window.
  */
class NbStreamSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fixture = graft.ops.Tables.documents(spark, sfDir)
    .select(col("doc_id"), col("text"), col("source"))
    .as[NbDoc].collect().toSeq
  private lazy val batches: Seq[Seq[NbDoc]] = (0 to 2).map { k =>
    fixture.filter(d => d.doc_id.map(i => ((i % 3) + 3) % 3 == k)
      .getOrElse(k == 0))
  }
  private def prefix(upTo: Int): DataFrame =
    batches.take(upTo + 1).flatten.toDF()

  private type T = (String, Long, Long)

  private def kernelTokens(upTo: Int): Set[T] =
    TextAnalytics.nbTokenCounts(
        TextAnalytics.nbOccurrences(TextAnalytics.nbBase(prefix(upTo))))
      .as[T].collect().toSet

  private def kernelPrior(upTo: Int): (Long, Long) =
    TextAnalytics.nbPriorCounts(TextAnalytics.nbBase(prefix(upTo)))
      .as[(Long, Long)].head()

  private def streamedTokens(dir: String): Set[T] =
    NbStream.readTokenCounts(spark, dir).as[T].collect().toSet

  private type Sc = (Long, String, Long, Long)

  test("streamed model == q178 trainer over the prefix; scoring from streamed state == batch kernel; replay, compaction, crash windows") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("nb-stream").toString
    val toks = s"$dir/tokens"
    val pri = s"$dir/prior"
    val mem = MemoryStream[NbDoc]
    val q = NbStream.monitor(mem.toDF(), toks, pri, s"$dir/ckpt")
    try {
      batches.foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    // bit-exact model parity per prefix
    (0 to 2).foreach { k =>
      assert(NbStream.readTokenCounts(spark, toks, Some(k + 1L))
          .as[T].collect().toSet == kernelTokens(k),
        s"batch $k: streamed token counts != kernel over the prefix")
      assert(NbStream.readPrior(spark, pri, Some(k + 1L)) == kernelPrior(k),
        s"batch $k: streamed prior != kernel over the prefix")
    }
    // fixture sanity: both classes are populated
    val (npd, nnd) = kernelPrior(2)
    assert(npd > 0L && nnd > 0L, "fixture must label both classes")

    // scoring parity over the full seen corpus
    val scStream = NbStream.scoreCurrent(spark, prefix(2), toks, pri)
      .as[Sc].collect().toSet
    val base = TextAnalytics.nbBase(prefix(2))
    val occ = TextAnalytics.nbOccurrences(base)
    val scKernel = TextAnalytics.nbScoreFromCounts(base, occ,
        TextAnalytics.nbTokenCounts(occ),
        TextAnalytics.nbPriorCounts(base))
      .as[Sc].collect().toSet
    assert(scStream == scKernel, "scores from streamed model diverged")
    assert(scKernel.nonEmpty)

    // replaying the LAST batch overwrites its partitions byte-identically
    val beforeT = streamedTokens(toks)
    val beforeP = NbStream.readPrior(spark, pri)
    NbStream.updateBatch(batches(2).toDF(), 2L, toks, pri)
    assert(streamedTokens(toks) == beforeT, "token replay diverged")
    assert(NbStream.readPrior(spark, pri) == beforeP, "prior replay diverged")

    // keep token partition 1 for the leftover scenario below
    val snap1 = spark.read.parquet(s"$toks/batch_id=1")
      .select(col("w"), col("c_pos"), col("c_neg"))
      .as[T].collect().toSeq

    // compaction of both stores: view unchanged, replay still identical
    NbStream.compactTokens(spark, toks)
    NbStream.compactPrior(spark, pri)
    val parts = new java.io.File(toks).listFiles()
      .map(_.getName).filter(_.startsWith("batch_id=")).toSeq.sorted
    assert(parts == Seq("batch_id=0", "batch_id=2"), s"compaction left: $parts")
    assert(streamedTokens(toks) == beforeT)
    assert(NbStream.readPrior(spark, pri) == beforeP)
    NbStream.updateBatch(batches(2).toDF(), 2L, toks, pri)
    assert(streamedTokens(toks) == beforeT, "replay after compaction diverged")

    // leftover superseded partition: latest-wins per key must ignore
    // the stale cumulative rows (a sum-of-deltas fold would not)
    snap1.toDF("w", "c_pos", "c_neg").coalesce(1)
      .write.mode("overwrite").parquet(s"$toks/batch_id=1")
    assert(streamedTokens(toks) == beforeT,
      "leftover superseded token partition changed the model")
    NbStream.updateBatch(batches(2).toDF(), 2L, toks, pri)
    assert(streamedTokens(toks) == beforeT)

    // compaction-crash backup window on the token store
    val fs = new org.apache.hadoop.fs.Path(toks)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(s"$toks/batch_id=0"),
      new org.apache.hadoop.fs.Path(toks + "_old0")))
    assert(streamedTokens(toks) == beforeT,
      "backup window changed the model")
    NbStream.compactTokens(spark, toks)
    assert(streamedTokens(toks) == beforeT)
  }

  test("scoring candidates with unseen tokens: smoothed count-zero llr, no dropped docs") {
    val dir = java.nio.file.Files.createTempDirectory("nb-unseen").toString
    val toks = s"$dir/tokens"
    val pri = s"$dir/prior"
    NbStream.updateBatch(batches(0).toDF(), 0L, toks, pri)
    // a fresh candidate whose tokens the model has NEVER seen
    val cand = Seq(NbDoc(Some(777000L), "zzqx zzqy zzqz zzqw", "fresh")).toDF()
    val out = NbStream.scoreCurrent(spark, cand, toks, pri)
      .as[Sc].collect()
    assert(out.length == 1, "an all-unseen candidate must still be scored")
    val (npd, nnd) = NbStream.readPrior(spark, pri)
    val tc = NbStream.readTokenCounts(spark, toks)
      .as[T].collect()
    val v = tc.length.toLong
    val np = tc.map(_._2).sum
    val nn = tc.map(_._3).sum
    def lnMicro(x: Long): Long = graft.ops.Sampling.lnMicro(x)
    val perTok = lnMicro(1L) - lnMicro(np + v) - lnMicro(1L) + lnMicro(nn + v)
    val prior = if (npd > 0 && nnd > 0) lnMicro(npd) - lnMicro(nnd) else 0L
    assert(out.head._3 == 4L * perTok + prior,
      s"unseen tokens must take the add-one-smoothed count-zero llr: ${out.head._3}")
  }

  test("empty batch persists both stores unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("nb-empty").toString
    val toks = s"$dir/tokens"
    val pri = s"$dir/prior"
    NbStream.updateBatch(batches(0).toDF(), 0L, toks, pri)
    val beforeT = streamedTokens(toks)
    val beforeP = NbStream.readPrior(spark, pri)
    NbStream.updateBatch(batches(0).toDF().limit(0), 1L, toks, pri)
    assert(streamedTokens(toks) == beforeT)
    assert(NbStream.readPrior(spark, pri) == beforeP)
    assert(beforeT == kernelTokens(0) && beforeP == kernelPrior(0))
  }
}
