package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming distribution-drift monitor — the ingest-time lift of the
  * batch chi-square drift query (q151): every micro-batch of documents
  * is scored against the length-distribution accumulated from all
  * batches up to and INCLUDING itself (exactly q151's source-vs-corpus
  * semantics, with "source" = this batch and "corpus" = everything
  * seen so far), then contributes its own histogram to the reference.
  * A feed that suddenly ships truncated or concatenated documents
  * shows up as a chi² spike on the batch where it happens — while the
  * corpus totals N and the running buckets never have to be rebuilt.
  *
  * Cross-batch state is the bucketed histogram — BUCKET-count-sized
  * (hundreds of rows), not corpus-sized — persisted as [[DeltaStore]]
  * delta partitions folded by SUM (count histograms are the canonical
  * mergeable state, the q142 property). Scoring reads only partitions
  * with `batch_id < current` and a replayed batch overwrites its own
  * partitions, so the crash/replay contract is [[NoveltyStream]]'s:
  * replay is byte-identical, and compaction keeps the latest
  * (possibly uncommitted) delta out of the fold (`keepLatest`).
  *
  * PARITY (spec-pinned, bit-exact): the streamed chi² of batch k
  * equals the `source = <tag k>` row of
  * [[graft.ops.CorpusDrift.sourceLengthDrift]] run over the
  * concatenation of batches 0..k with each batch tagged as its own
  * source — same term formula, same ordered-bucket fold, evaluated
  * here from incremental histogram state instead of a corpus rescan.
  */
object DriftStream {

  /** Monitor a streaming (doc_id, n_chars) frame: per micro-batch, a
    * one-row chi² score lands in `outDir/batch_id=<k>` and the batch's
    * histogram delta in `refDir/batch_id=<k>`.
    */
  def monitor(docs: DataFrame, refDir: String, outDir: String,
              checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        scoreBatch(batch, batchId, refDir, outDir)
      }
      .outputMode("update")
      .start()

  /** One micro-batch of [[monitor]], named so replay idempotence is
    * directly testable. Empty batches score nothing and write an
    * empty delta (harmless under the SUM fold).
    */
  private[streaming] def scoreBatch(batch: DataFrame, batchId: Long,
                                    refDir: String, outDir: String): Unit = {
    val spark = batch.sparkSession
    val hb = histogram(batch)
    val ref = readHistogram(spark, refDir, beforeBatch = Some(batchId))
    // combined = reference + this batch: q151's "corpus includes the
    // source", which also guarantees e_b > 0 for every batch bucket
    val combined = ref.unionByName(hb)
      .groupBy(col("bucket")).agg(sum(col("c")).cast("bigint").as("c"))
    // scalars are bucket-rollup-sized driver reads, not corpus reads
    val nDocs = hb.agg(coalesce(sum(col("c")), lit(0L))).head().getLong(0)
    val nTot = combined.agg(coalesce(sum(col("c")), lit(0L))).head().getLong(0)
    val nb = combined.count()
    val score =
      if (nDocs == 0L) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], scoreSchema)
      else {
        // MIRROR of sourceLengthDrift's term + fold, evaluated over the
        // combined bucket spine: e = n_docs·c_b/N as doubles in the same
        // op order, zero-observed buckets paying their full e_b penalty,
        // terms folded in bucket order from 0.0 — bit-equal by
        // construction to the batch kernel over the tagged prefix corpus
        val e = lit(nDocs.toDouble) * col("c").cast("double") / lit(nTot.toDouble)
        combined.join(hb.toDF("bucket", "o"), Seq("bucket"), "left")
          .select(col("bucket"),
            ((coalesce(col("o"), lit(0L)).cast("double") - e)
              * (coalesce(col("o"), lit(0L)).cast("double") - e) / e).as("term"))
          .agg(sort_array(collect_list(struct(col("bucket"), col("term"))))
            .as("ts"))
          .select(
            lit(nDocs).as("n_docs"),
            lit(nTot).as("n_total"),
            lit(nb - 1L).as("dof"),
            aggregate(col("ts"), lit(0.0),
              (acc, t) => acc + t.getField("term")).as("chi2"))
      }
    score.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
    hb.write.mode("overwrite").parquet(s"$refDir/batch_id=$batchId")
  }

  private val scoreSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_docs",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("n_total",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("dof",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("chi2",
      org.apache.spark.sql.types.DoubleType)))

  /** q151's 200-char bucketing of an (n_chars) frame to (bucket, c). */
  private[streaming] def histogram(docs: DataFrame): DataFrame =
    docs.select(expr("n_chars div 200").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).cast("bigint").as("c"))

  /** Current reference histogram: sum(c) per bucket over the delta
    * partitions (sum is the mergeable fold — superseded partitions
    * left by a compaction crash are snapshot-scoped and never
    * double-counted, [[DeltaStore]]'s contract). `beforeBatch`
    * excludes partitions at or past a batch id — the replay guard.
    * An absent directory is a valid empty reference.
    */
  def readHistogram(spark: SparkSession, refDir: String,
                    beforeBatch: Option[Long] = None): DataFrame =
    DeltaStore.readRaw(spark, refDir) match {
      case Some(raw) =>
        val scoped = beforeBatch match {
          case Some(b) => raw.filter(col("batch_id") < b)
          case None => raw
        }
        scoped.groupBy(col("bucket")).agg(sum(col("c")).cast("bigint").as("c"))
      case None =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("bucket",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("c",
              org.apache.spark.sql.types.LongType))))
    }

  /** Fold delta partitions into `batch_id=0` with the sum merge.
    * `keepLatest = true` for the same reason as
    * [[NoveltyStream.compactFirstSeen]]: the newest partition may
    * belong to an uncommitted batch, and folding it into batch 0
    * would defeat the `batch_id < current` replay guard — worse here
    * than for the min-fold index, because a SUM fold would
    * double-count the replayed batch's contribution.
    */
  def compactHistogram(spark: SparkSession, refDir: String): Unit =
    DeltaStore.compact(spark, refDir, raw =>
      raw.groupBy(col("bucket")).agg(sum(col("c")).cast("bigint").as("c")),
      keepLatest = true)
}
