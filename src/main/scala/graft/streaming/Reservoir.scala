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
    * swapped in via write-sibling + backup-rename so EVERY crash
    * window leaves a recoverable state (see [[readReservoir]]):
    * the new reservoir is fully written to `_swap` while the old one
    * is still live, the old directory is renamed aside (not deleted)
    * before the swap lands, and the backup is dropped only after the
    * new root exists. A reader never sees a half-written reservoir;
    * a crash at any point loses at most the CURRENT batch's fold,
    * which the streaming checkpoint replays idempotently.
    *
    * Re-ingested doc_ids whose text changed carry a DIFFERENT skey;
    * the winner is the max (skey, doc_id) row — an explicit,
    * partition-order-independent rule (raw dropDuplicates would keep
    * an arbitrary encounter-order row and break determinism).
    */
  private[streaming] def reservoirBatch(batch: DataFrame, reservoirDir: String,
                                        k: Int): Unit = {
    val spark = batch.sparkSession
    // writer-side crash repair BEFORE the fold: restore a backup left
    // by a swap that died mid-rename. Only this single-writer entry
    // point repairs by rename; the serving read path falls back to
    // reading the backup in place (see readReservoir).
    recoverReservoir(spark, reservoirDir)
    val delta = CurationOps.weightedSample(batch, k)
    val merged = readReservoir(spark, reservoirDir) match {
      case Some(cur) =>
        cur.unionByName(delta)
          .groupBy(col("doc_id"))
          .agg(
            max_by(struct(col("source"), col("n_tokens"), col("skey")),
              struct(col("skey"), col("doc_id"))).as("__w"))
          .select(col("doc_id"), col("__w.source").as("source"),
            col("__w.n_tokens").as("n_tokens"), col("__w.skey").as("skey"))
          .orderBy(col("skey").desc, col("doc_id"))
          .limit(k)
      case None => delta
    }
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(reservoirDir)
    val fs = root.getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(reservoirDir + "_swap")
    val old = new org.apache.hadoop.fs.Path(reservoirDir + "_old")
    // materializes `merged` while the old root is still readable,
    // then the shared sibling-backup swap (one definition: SwapDir)
    merged.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    SwapDir.swap(fs, root, tmp, old, "reservoir")
  }

  /** Writer-only crash repair: if a fold died between the backup
    * rename and the swap (root missing but `_old` present), rename
    * the backup back — the interrupted fold is replayed by the
    * checkpoint, so restoring the pre-fold state is exactly right.
    * Called solely from [[reservoirBatch]] (the single writer); a
    * read-path rename would race a live swap and rename the backup
    * INTO the just-landed root dir (see [[SwapDir.recover]]).
    */
  private def recoverReservoir(spark: SparkSession, reservoirDir: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(reservoirDir)
    SwapDir.recover(
      root.getFileSystem(spark.sparkContext.hadoopConfiguration),
      root, new org.apache.hadoop.fs.Path(reservoirDir + "_old"), "reservoir")
  }

  /** The current reservoir, or None before the first fold. If a crash
    * landed between the backup-rename and the swap (root missing but
    * `_old` present), serve the backup IN PLACE — the read path never
    * renames (see [[recoverReservoir]]).
    *
    * CONCURRENCY (the DeltaStore.compact contract, same shape): this
    * read tolerates any CRASHED swap's leftovers, but racing a LIVE
    * swap is not atomic — the exists checks can land inside the
    * writer's two-rename window and transiently see neither root nor
    * backup (a populated reservoir reading as None) or read a backup
    * the writer deletes moments later. A serving reader must be
    * serialized with reservoirBatch (free under the serial
    * foreachBatch loop; an external reader polls between triggers or
    * retries on miss/failure — every miss window is bounded by one
    * swap).
    */
  def readReservoir(spark: SparkSession, reservoirDir: String): Option[DataFrame] = {
    val root = new org.apache.hadoop.fs.Path(reservoirDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(reservoirDir + "_old")
    if (fs.exists(root)) Some(spark.read.parquet(reservoirDir))
    else if (fs.exists(old)) Some(spark.read.parquet(old.toString))
    else None
  }
}
