package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The engine's narrow per-document operators (quality scoring,
  * language-ID, MinHash signatures) are plain column expressions /
  * codegen kernels, so they lift to Structured Streaming UNCHANGED —
  * the same transform runs on `readStream` with no operator rewrite.
  * This spec proves the lift: each batch op applied to a MemoryStream
  * produces exactly its batch result on the same rows. At 100 TB this
  * is the curation-on-ingest path: score/filter/fingerprint documents
  * as they land, before they ever hit cold storage.
  */
case class StreamDoc(doc_id: Long, text: String, lang: String)

class StreamingTextOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    StreamDoc(0L, "the quick brown fox jumps over the lazy dog", "en"),
    StreamDoc(1L, "der hund und die katze sind nicht da", "de"),
    StreamDoc(2L, "el perro y la casa de los gatos", "es"),
    StreamDoc(3L, "numbers 123 456 and punctuation!!! here", "en"),
    StreamDoc(4L, "a a a a a a a a", "en"))

  private def runStream(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                        name: String): Seq[org.apache.spark.sql.Row] = {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[StreamDoc]
    val query = f(mem.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      mem.addData(docs: _*)
      query.processAllAvailable()
      spark.table(name).collect().toSeq
    } finally query.stop()
  }

  test("language-ID lifts to streaming with batch-identical results") {
    val batch = graft.ops.TextAnalytics.langId(docs.toDF())
      .select("doc_id", "predicted_lang").as[(Long, String)].collect().toMap
    val streamed = runStream(df => graft.ops.TextAnalytics.langId(df)
      .select(col("doc_id"), col("predicted_lang")), "langid_stream")
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(streamed == batch)
    assert(streamed(1L) == "de" && streamed(2L) == "es")
  }

  test("MinHash signatures lift to streaming (codegen kernel in a stream stage)") {
    val sig = (df: org.apache.spark.sql.DataFrame) =>
      graft.ops.Dedup.minhashSignatures(df, nHashes = 16, shingleSize = 2)
        .select(col("doc_id"), col("mh").cast("array<string>").as("mh"))
    val batch = sig(docs.toDF()).as[(Long, Seq[String])].collect().toMap
    val streamed = runStream(sig, "minhash_stream")
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(streamed == batch)
    assert(streamed.values.forall(_.length == 16))
  }

  test("quality/token stats lift to streaming") {
    val stats = (df: org.apache.spark.sql.DataFrame) => {
      val t = graft.ops.TextAnalytics.toks(col("text"))
      df.select(col("doc_id"), size(t).cast("bigint").as("n_tokens"),
        size(array_distinct(t)).cast("bigint").as("n_distinct"))
    }
    val batch = stats(docs.toDF()).as[(Long, Long, Long)].collect().toSet
    val streamed = runStream(stats, "stats_stream")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed.contains((4L, 8L, 1L))) // the repetitive doc
  }
}
