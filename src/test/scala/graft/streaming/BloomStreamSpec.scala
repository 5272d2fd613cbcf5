package graft.streaming

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class BenchDoc(doc_id: Long, text: String)

/** Streaming Bloom-filter maintenance: after every micro-batch the
  * packed words must BIT-EXACTLY equal the batch kernel over the
  * union of all delivered benchmark docs, bits must only ever be
  * SET (the monotone-merge contract), and the streamed gate must
  * flag exactly like the batch gate.
  */
class BloomStreamSpec extends SparkSpec {
  import spark.implicits._

  private val b0 = Seq(BenchDoc(1, "alpha beta gamma delta epsilon"),
    BenchDoc(2, "one two three four five six"))
  private val b1 = Seq(BenchDoc(3, "seven eight nine ten eleven twelve"))
  private val b2 = Seq(BenchDoc(1, "alpha beta gamma delta epsilon"), // re-delivery
    BenchDoc(4, "thirteen fourteen fifteen sixteen"))
  private val batches = Seq(b0, b1, b2)

  private def kernelWords(upTo: Int): Array[Long] =
    Dedup.bloomWords(Dedup.shingleSet4(spark,
        batches.take(upTo + 1).flatten.map(d => (d.doc_id, d.text))
          .toDF("doc_id", "text"))
      .select(col("sh")).distinct())

  test("streamed words == batch kernel over the union; monotone; gate parity; replay; compaction") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("bloom-stream").toString
    val wordsD = s"$dir/words"
    val mem = MemoryStream[BenchDoc]
    val q = BloomStream.maintain(mem.toDF(), wordsD, s"$dir/ckpt")
    try {
      var prevBits = 0
      batches.zipWithIndex.foreach { case (b, k) =>
        mem.addData(b: _*)
        q.processAllAvailable()
        val streamed = BloomStream.readWords(spark, wordsD)
        assert(streamed.sameElements(kernelWords(k)),
          s"batch $k: streamed filter != batch kernel")
        val bits = streamed.map(java.lang.Long.bitCount).sum
        assert(bits >= prevBits, s"batch $k: bits went DOWN ($prevBits -> $bits)")
        prevBits = bits
      }

      // gate parity on a probe corpus: a member of each batch + a miss
      val probes = Seq((10L, "alpha beta gamma delta epsilon"),
        (11L, "thirteen fourteen fifteen sixteen"),
        (12L, "zz yy xx ww vv uu")).toDF("doc_id", "text")
      val shingled = Dedup.shingleSet4(spark, probes)
      def hits(df: org.apache.spark.sql.DataFrame) =
        df.select(col("doc_id"), col("sh"), col("bloom_hit"))
          .as[(Long, String, Boolean)].collect().toSet
      val fromStream = hits(BloomStream.flagFromStream(spark, shingled, wordsD))
      val fromBatch = hits(Dedup.bloomFlag(shingled, kernelWords(2)))
      assert(fromStream == fromBatch && fromStream.nonEmpty)
      // the members really flag (no false negatives through the stream)
      assert(fromStream.filter(r => r._1 == 10L || r._1 == 11L)
        .forall(_._3), "benchmark member missed by the streamed gate")

      // replay is idempotent (scoped read + OR determinism)
      BloomStream.processBatch(b2.toDF(), 2L, wordsD)
      assert(BloomStream.readWords(spark, wordsD).sameElements(kernelWords(2)))

      // compaction preserves the filter
      BloomStream.compactWords(spark, wordsD)
      assert(BloomStream.readWords(spark, wordsD).sameElements(kernelWords(2)))
    } finally q.stop()
  }
}
