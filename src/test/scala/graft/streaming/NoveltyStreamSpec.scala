package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming incremental novelty: N checkpointed micro-batches through
  * [[NoveltyStream.scoreAndIndex]] must score every document exactly
  * as the one-shot batch [[graft.ops.CorpusDrift.ngramNovelty]] over
  * the concatenated corpus (monotone doc_ids), through replay of the
  * last batch, compaction, and the compaction-crash backup window.
  */
class NoveltyStreamSpec extends SparkSpec {
  import spark.implicits._

  private val b1 = Seq(
    KeyedDoc(1L, "alpha beta gamma delta epsilon zeta"),
    KeyedDoc(2L, "alpha beta gamma delta unrelated words"))
  private val b2 = Seq(
    // doc 3 repeats doc 1's text verbatim: novelty must be 0.0
    KeyedDoc(3L, "alpha beta gamma delta epsilon zeta"),
    KeyedDoc(4L, "entirely fresh content nothing shared here"))
  private val b3 = Seq(
    KeyedDoc(5L, "entirely fresh content alpha beta gamma overlaps both"))

  private def scores(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), col("n_shingles"), col("n_novel"), col("novelty"))
      .as[(Long, Long, Long, Double)].collect().toSet

  test("streamed per-batch novelty == one-shot batch kernel; replay, compaction, crash window") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("novelty-stream").toString
    val mem = MemoryStream[KeyedDoc]
    val q = NoveltyStream.scoreAndIndex(mem.toDF(),
      s"$dir/index", s"$dir/out", s"$dir/ckpt", n = 3)
    try {
      Seq(b1, b2, b3).foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val oneShot = scores(graft.ops.CorpusDrift.ngramNovelty(
      (b1 ++ b2 ++ b3).toDF(), n = 3))
    val streamed = scores(spark.read.parquet(s"$dir/out"))
    assert(streamed == oneShot,
      s"streamed scores diverged from the one-shot kernel: $streamed vs $oneShot")
    // doc 3 is a verbatim re-crawl of doc 1 — the index must zero it
    assert(streamed.find(_._1 == 3L).get._4 == 0.0)

    // replaying the LAST micro-batch (crash before checkpoint commit)
    // overwrites its own partitions; scores and index view unchanged.
    // The replay guard (batch_id < current) keeps the batch's own
    // half-written delta out of its history view.
    NoveltyStream.scoreBatch(b3.toDF(), 2L, s"$dir/index", s"$dir/out", 3)
    assert(scores(spark.read.parquet(s"$dir/out")) == oneShot)
    val view = NoveltyStream.readFirstSeen(spark, s"$dir/index")
      .as[(Long, Long)].collect().toSet

    // compaction folds everything EXCEPT the latest partition (which
    // may belong to an uncommitted batch — keepLatest); the first-seen
    // view is unchanged
    NoveltyStream.compactFirstSeen(spark, s"$dir/index")
    val parts = new java.io.File(s"$dir/index").listFiles()
      .map(_.getName).filter(_.startsWith("batch_id=")).toSeq.sorted
    assert(parts == Seq("batch_id=0", "batch_id=2"), s"compaction left: $parts")
    assert(NoveltyStream.readFirstSeen(spark, s"$dir/index")
      .as[(Long, Long)].collect().toSet == view)

    // the scenario keepLatest exists for: batch 2's checkpoint never
    // committed, compaction ran during the outage (above), and the
    // stream now REPLAYS batch 2 — its own delta must still be
    // excludable by the batch_id < 2 guard, so the replay scores
    // exactly as the original run did
    NoveltyStream.scoreBatch(b3.toDF(), 2L, s"$dir/index", s"$dir/out", 3)
    assert(scores(spark.read.parquet(s"$dir/out")) == oneShot,
      "replay after compaction diverged — the latest delta was folded away")

    // compaction-crash window: batch_id=0 renamed aside to the sibling
    // backup — readers must serve the backup in place, unchanged
    val fs = new org.apache.hadoop.fs.Path(s"$dir/index")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(s"$dir/index/batch_id=0"),
      new org.apache.hadoop.fs.Path(s"$dir/index_old0")))
    assert(NoveltyStream.readFirstSeen(spark, s"$dir/index")
      .as[(Long, Long)].collect().toSet == view)
    // the writer-side recovery restores it on the next compaction
    NoveltyStream.compactFirstSeen(spark, s"$dir/index")
    assert(NoveltyStream.readFirstSeen(spark, s"$dir/index")
      .as[(Long, Long)].collect().toSet == view)
  }

  test("empty index scores everything by within-batch first occurrence") {
    val scored = scores({
      val dir = java.nio.file.Files.createTempDirectory("novelty-empty").toString
      NoveltyStream.scoreBatch(b1.toDF(), 0L, s"$dir/index", s"$dir/out", 3)
      spark.read.parquet(s"$dir/out")
    })
    assert(scored == scores(graft.ops.CorpusDrift.ngramNovelty(b1.toDF(), n = 3)))
  }
}
