package graft.streaming

import graft.SparkSpec
import graft.ops.UnigramLm
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class UniDoc(doc_id: Option[Long], text: String, source: String)

/** Streaming unigram-tokenizer stats: after every checkpointed
  * micro-batch, the streamed (source, word) count store must
  * BIT-EXACTLY equal [[UnigramLm.sourceWordCounts]] over the
  * concatenated prefix corpus, and the report rebuilt from streamed
  * state must equal the batch kernel [[UnigramLm.unigramSegmentation]]
  * over that prefix — same vocabulary cut, same Viterbi DP, same
  * exact integers. Proven through replay, compaction, a leftover
  * superseded partition, and the compaction-crash backup window.
  */
class UnigramStreamSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fixture = graft.ops.Tables.documents(spark, sfDir)
    .select(col("doc_id"), col("text"), col("source"))
    .as[UniDoc].collect().toSeq
  private lazy val batches: Seq[Seq[UniDoc]] = (0 to 2).map { k =>
    fixture.filter(d => d.doc_id.map(i => ((i % 3) + 3) % 3 == k)
      .getOrElse(k == 0))
  }
  private def prefix(upTo: Int): DataFrame =
    batches.take(upTo + 1).flatten.toDF()

  private type C = (String, String, Long)
  private type R = (String, Long, Long, Double, Long, Double)

  private def kernelCounts(upTo: Int): Set[C] =
    UnigramLm.sourceWordCounts(prefix(upTo)).as[C].collect().toSet

  private def streamed(dir: String): Set[C] =
    UnigramStream.readCounts(spark, dir).as[C].collect().toSet

  test("streamed counts == batch counts per prefix; report parity; replay, compaction, crash windows") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("uni-stream").toString
    val cnt = s"$dir/sw"
    val mem = MemoryStream[UniDoc]
    val q = UnigramStream.monitor(mem.toDF(), cnt, s"$dir/ckpt")
    try {
      batches.foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    (0 to 2).foreach { k =>
      assert(UnigramStream.readCounts(spark, cnt, Some(k + 1L))
          .as[C].collect().toSet == kernelCounts(k),
        s"batch $k: streamed counts != kernel over the prefix")
    }

    // full-report parity: vocabulary cut, DP, and rollup all re-derive
    // from the streamed store bit-exactly
    val repStream = UnigramStream.currentSegmentation(spark, cnt)
      .as[R].collect().toSet
    val repKernel = UnigramLm.unigramSegmentation(prefix(2))
      .as[R].collect().toSet
    assert(repStream == repKernel, "report from streamed state diverged")
    assert(repKernel.nonEmpty)

    // EM-round parity: the q199 trainer (E-step piece counts, M-step
    // prune + re-estimate, second Viterbi) re-derives from the SAME
    // streamed store bit-exactly — the stream==batch invariant every
    // trainer in the family meets
    def emSet(df: DataFrame) = df
      .select(col("source"), col("n_words"), col("n_pieces_v1"),
        col("n_pieces_em"), col("fertility_v1"), col("fertility_em"),
        col("sum_lp_em_micro"), col("mean_lp_em"), col("n_vocab_v1"),
        col("n_vocab_em"))
      .as[(String, Long, Long, Long, Double, Double, Long, Double,
           Long, Long)].collect().toSet
    val emStream = emSet(UnigramStream.currentEmSegmentation(spark, cnt))
    val emKernel = emSet(UnigramLm.emSegmentation(prefix(2)))
    assert(emStream == emKernel, "EM round from streamed state diverged")
    assert(emKernel.nonEmpty)

    val before = streamed(cnt)
    UnigramStream.updateBatch(batches(2).toDF(), 2L, cnt)
    assert(streamed(cnt) == before, "replay diverged")

    val snap1 = spark.read.parquet(s"$cnt/batch_id=1")
      .select(col("source"), col("word"), col("swn")).as[C].collect().toSeq

    UnigramStream.compact(spark, cnt)
    val parts = new java.io.File(cnt).listFiles()
      .map(_.getName).filter(_.startsWith("batch_id=")).toSeq.sorted
    assert(parts == Seq("batch_id=0", "batch_id=2"), s"compaction left: $parts")
    assert(streamed(cnt) == before)
    UnigramStream.updateBatch(batches(2).toDF(), 2L, cnt)
    assert(streamed(cnt) == before, "replay after compaction diverged")

    snap1.toDF("source", "word", "swn").coalesce(1)
      .write.mode("overwrite").parquet(s"$cnt/batch_id=1")
    assert(streamed(cnt) == before,
      "leftover superseded partition changed the counts")

    val fs = new org.apache.hadoop.fs.Path(cnt)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(s"$cnt/batch_id=0"),
      new org.apache.hadoop.fs.Path(cnt + "_old0")))
    assert(streamed(cnt) == before, "backup window changed the counts")
    UnigramStream.compact(spark, cnt)
    assert(streamed(cnt) == before)
  }

  test("empty batch persists the store unchanged; null sources are keys, not drops") {
    val dir = java.nio.file.Files.createTempDirectory("uni-empty").toString
    val cnt = s"$dir/sw"
    UnigramStream.updateBatch(
      Seq(UniDoc(Some(1L), "a b a", null), UniDoc(Some(2L), "b", "s")).toDF(),
      0L, cnt)
    val c0 = streamed(cnt)
    assert(c0 == Set((null, "a", 2L), (null, "b", 1L), ("s", "b", 1L)),
      s"null-source counts must be keyed, got $c0")
    UnigramStream.updateBatch(Seq.empty[UniDoc].toDF(), 1L, cnt)
    assert(streamed(cnt) == c0, "an empty batch changed the counts")
    // a second batch touching the null-source key must fold into it
    UnigramStream.updateBatch(
      Seq(UniDoc(Some(3L), "a", null)).toDF(), 2L, cnt)
    assert(streamed(cnt) == Set((null, "a", 3L), (null, "b", 1L), ("s", "b", 1L)),
      "cumulative fold under a null key diverged")
  }
}
