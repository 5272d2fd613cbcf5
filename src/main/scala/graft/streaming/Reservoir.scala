package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ops.CurationOps

/** Streaming weighted reservoir: the incremental form of the q125
  * Efraimidis–Spirakis sampler ([[CurationOps.weightedSample]]).
  *
  * WHY THIS IS EXACT (not approximate): every document's A-ES key
  * ln(u)/w is a pure function of (doc_id, token count) — no RNG, no
  * state — and "weighted sample of the corpus" = "top-k keys of the
  * corpus". Top-k is mergeable: top-k(A ∪ B) = top-k(top-k(A) ∪
  * top-k(B)). So a reservoir that folds each micro-batch's OWN top-k
  * into the running top-k holds, after any prefix of batches, exactly
  * the batch sampler's answer on the union of those batches — the
  * stream==batch identity the spec asserts on random micro-batch
  * splits. Replay after a crash is idempotent for the same reason:
  * re-merging rows already in the reservoir changes nothing (dedup on
  * doc_id, keys are deterministic).
  *
  * Scale: per batch the work is the batch's narrow key map + its
  * per-partition top-k heaps, then a 2k-row driver-side-free merge;
  * the stored reservoir is k rows. Nothing corpus-sized is ever kept
  * or shuffled — this is the 100 TB ingest shape (sample maintained
  * while the corpus lands, no recompute).
  */
object Reservoir {

  /** Maintain the k-row reservoir under `reservoirDir` as `docs`
    * stream in (foreachBatch + atomic directory swap, the
    * NearDupStream.maintainBandIndex pattern).
    */
  def maintainWeightedReservoir(docs: DataFrame, reservoirDir: String,
                                checkpointDir: String, k: Int): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        reservoirBatch(batch, reservoirDir, k)
      }
      .outputMode("update")
      .start()

  /** One micro-batch fold: current reservoir ∪ batch top-k → top-k,
    * swapped in atomically (write-to-sibling + rename, so a reader
    * never sees a half-written reservoir and a crashed fold leaves
    * the old reservoir intact).
    */
  private[streaming] def reservoirBatch(batch: DataFrame, reservoirDir: String,
                                        k: Int): Unit = {
    val spark = batch.sparkSession
    val delta = CurationOps.weightedSample(batch, k)
    val merged = readReservoir(spark, reservoirDir) match {
      case Some(cur) =>
        cur.unionByName(delta)
          .dropDuplicates("doc_id") // deterministic keys: replayed/re-ingested docs are no-ops
          .orderBy(col("skey").desc, col("doc_id"))
          .limit(k)
      case None => delta
    }
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(reservoirDir)
    val fs = root.getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(reservoirDir + "_swap")
    merged.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    fs.delete(root, true)
    fs.rename(tmp, root)
  }

  /** The current reservoir, or None before the first fold. */
  def readReservoir(spark: SparkSession, reservoirDir: String): Option[DataFrame] = {
    val root = new org.apache.hadoop.fs.Path(reservoirDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) Some(spark.read.parquet(reservoirDir)) else None
  }
}
