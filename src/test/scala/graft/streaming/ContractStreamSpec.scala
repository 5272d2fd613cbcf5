package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class CDoc(doc_id: Option[Long], text: String, lang: String,
                source: String, n_chars: Option[Long])

/** Streaming contract gate: after every checkpointed micro-batch, the
  * per-source violation report must BIT-EXACTLY equal the q152 batch
  * kernel ([[graft.ops.CurationOps.dataContract]]) over the
  * concatenated prefix corpus — including the RETROACTIVE dup
  * transitions (a duplicate arriving in batch k flips its batch-j
  * first occurrence to violating, possibly under another source, and
  * un-cleans it) and NULL-doc_id junk rows, which both engines' window
  * semantics group as ONE key. Proven through replay, compaction of
  * both stores, a leftover superseded partition, and the
  * compaction-crash backup window.
  */
class ContractStreamSpec extends SparkSpec {
  import spark.implicits._

  // b1: clean rows, a null-text junk row, a NULL-doc_id row (clean for
  // now), id 10's first occurrence (clean row under sA)
  private val b1 = Seq(
    CDoc(Some(10L), "ok text", "en", "sA", Some(7L)),
    CDoc(Some(11L), "more ok", "en", "sA", Some(7L)),
    CDoc(Some(12L), null, "en", "sB", Some(0L)),
    CDoc(None, "null id row", "en", "sB", Some(11L)))
  // b2: id 10 reappears under ANOTHER source (retroactive dup for sA),
  // an in-batch dup pair (id 20 twice), a bad-lang row
  private val b2 = Seq(
    CDoc(Some(10L), "copy of ten", "en", "sB", Some(11L)),
    CDoc(Some(20L), "twin a", "en", "sC", Some(6L)),
    CDoc(Some(20L), "twin b", "en", "sC", Some(6L)),
    CDoc(Some(21L), "bad lang", "xx", "sC", Some(8L)))
  // b3: id 10 a third time, a SECOND NULL-doc_id row (the two
  // null-key rows now form a dup group spanning b1/b3 and sources),
  // an n_chars mismatch row
  private val b3 = Seq(
    CDoc(Some(10L), "third ten", "en", "sA", Some(9L)),
    CDoc(None, "second null id", "fr", "sC", Some(14L)),
    CDoc(Some(30L), "short", "de", "sB", Some(999L)))

  private def batches = Seq(b1, b2, b3)

  private type Rep = (String, Long, Long, Long, Long, Long, Long)

  private def kernelRows(upTo: Int): Set[Rep] = {
    val concat = batches.take(upTo + 1).flatten.toDF()
    graft.ops.CurationOps.dataContract(concat)
      .as[Rep].collect().toSet
  }

  private def streamedRows(reportDir: String, beforeBatch: Option[Long] = None): Set[Rep] =
    ContractStream.readReport(spark, reportDir, beforeBatch)
      .as[Rep].collect().toSet

  test("streamed report == q152 kernel over the prefix corpus; retroactive dups; replay, compaction, crash windows") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("contract-stream").toString
    val ids = s"$dir/ids"
    val rep = s"$dir/rep"
    val mem = MemoryStream[CDoc]
    val q = ContractStream.monitor(mem.toDF(), ids, rep, s"$dir/ckpt")
    try {
      batches.foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    // bit-exact parity per prefix (read each batch's own snapshot)
    (0 to 2).foreach { k =>
      val streamed = spark.read.parquet(s"$rep/batch_id=$k")
        .select(col("source"), col("n_rows"), col("n_null_text"),
          col("n_len_mismatch"), col("n_bad_lang"), col("n_dup_id"),
          col("n_clean"))
        .as[Rep].collect().toSet
      assert(streamed == kernelRows(k),
        s"batch $k: streamed report != batch kernel over the prefix\n" +
          s"streamed: ${streamed.toSeq.sortBy(_._1)}\n" +
          s"kernel:   ${kernelRows(k).toSeq.sortBy(_._1)}")
    }
    // the retroactive transition is really exercised: after b2, sA's
    // id-10 row (clean in b1) must be a dup and no longer clean
    val afterB2 = spark.read.parquet(s"$rep/batch_id=1")
      .filter(col("source") === "sA")
      .select(col("n_dup_id"), col("n_clean")).as[(Long, Long)].head()
    assert(afterB2._1 == 1L, "sA's first occurrence must turn dup when sB ships the copy")
    assert(afterB2._2 == 1L, "only sA's other row stays clean")
    // the two NULL-doc_id rows (b1 sB, b3 sC) form one dup group
    val afterB3 = kernelRows(2)
    assert(streamedRows(rep) == afterB3)
    assert(afterB3.find(_._1 == "sB").get._6 >= 2L,
      "fixture sanity: sB holds id-10's copy AND a null-id dup row")

    // replaying the LAST batch overwrites its own partitions
    // byte-identically (the batch_id < current guard)
    val before = streamedRows(rep)
    ContractStream.scoreBatch(b3.toDF(), 2L, ids, rep)
    assert(streamedRows(rep) == before, "replay diverged")

    // keep partition 1's cumulative id snapshot for the leftover
    // scenario below (compaction deletes it)
    val snap1Schema = spark.read.parquet(s"$ids/batch_id=1")
      .select(col("doc_id"), col("source"), col("n"), col("rc")).schema
    val snap1 = spark.read.parquet(s"$ids/batch_id=1")
      .select(col("doc_id"), col("source"), col("n"), col("rc"))
      .collect().toSeq

    // compaction of both stores: view unchanged, replay still identical
    ContractStream.compactIds(spark, ids)
    ContractStream.compactReport(spark, rep)
    val idParts = new java.io.File(ids).listFiles()
      .map(_.getName).filter(_.startsWith("batch_id=")).toSeq.sorted
    assert(idParts == Seq("batch_id=0", "batch_id=2"), s"ids compaction left: $idParts")
    assert(streamedRows(rep) == before)
    ContractStream.scoreBatch(b3.toDF(), 2L, ids, rep)
    assert(streamedRows(rep) == before, "replay after compaction diverged")

    // leftover superseded partition (the delete-loop crash window): a
    // SUM-of-deltas id fold would double-count id 10 — the latest-wins
    // key fold must not care
    spark.createDataFrame(
        spark.sparkContext.parallelize(snap1), snap1Schema)
      .write.mode("overwrite").parquet(s"$ids/batch_id=1")
    ContractStream.scoreBatch(b3.toDF(), 2L, ids, rep)
    assert(streamedRows(rep) == before,
      "leftover superseded id partition changed a replay")

    // compaction-crash backup window on the ids store: batch_id=0
    // renamed aside — the reader unions the backup in place
    val fs = new org.apache.hadoop.fs.Path(ids)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(s"$ids/batch_id=0"),
      new org.apache.hadoop.fs.Path(ids + "_old0")))
    ContractStream.scoreBatch(b3.toDF(), 2L, ids, rep)
    assert(streamedRows(rep) == before,
      "replay against the backup window diverged")
    ContractStream.compactIds(spark, ids)
    ContractStream.scoreBatch(b3.toDF(), 2L, ids, rep)
    assert(streamedRows(rep) == before)
  }

  test("empty batch: report snapshot carried forward unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("contract-empty").toString
    val ids = s"$dir/ids"
    val rep = s"$dir/rep"
    ContractStream.scoreBatch(b1.toDF(), 0L, ids, rep)
    val before = streamedRows(rep)
    ContractStream.scoreBatch(b1.toDF().limit(0), 1L, ids, rep)
    assert(streamedRows(rep) == before,
      "an empty batch must not change the counters")
    assert(streamedRows(rep) == kernelRows(0))
  }
}
