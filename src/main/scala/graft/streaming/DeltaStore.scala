package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared delta-directory store for streaming-maintained indexes
  * (the LSH band index, the first-seen novelty index): each committed
  * micro-batch writes a `batch_id=<k>` partition; reads union the
  * partitions and fold them with an index-specific merge; a compactor
  * folds everything into `batch_id=0`.
  *
  * Crash contract (shared by every index built on this store):
  *  - the maintainer's per-batch write is a DETERMINISTIC overwrite of
  *    its own partition, so a replayed micro-batch (checkpoint says
  *    uncommitted) lands byte-identically — exactly-once by rewrite;
  *  - compaction snapshots the partition list AT ENTRY, folds only the
  *    snapshot, and deletes only the snapshot afterwards — a delta the
  *    maintainer commits mid-compaction is never dropped (the
  *    streaming checkpoint marks it committed and never replays it);
  *  - the `batch_id=0` replacement goes through a sibling backup
  *    rename: a crash at any point leaves the old partitions, the
  *    backup, or the new fold readable. Readers recover READ-ONLY by
  *    unioning the backup in place as batch 0 (renaming it back from a
  *    read path would race a LIVE compactor's swap — a restore between
  *    the compactor's two renames makes its second rename land the new
  *    fold INSIDE the restored dir, nesting a partition dir and
  *    duplicating rows); only the compactor — the single writer —
  *    repairs by rename;
  *  - a crash during the trailing per-partition deletes leaves
  *    already-folded partitions behind. Deletes run OLDEST-FIRST
  *    (ascending numeric batch_id — NOT listStatus order, which is
  *    lexicographic and would delete batch_id=10 before batch_id=2),
  *    so the survivors always form a SUFFIX {k..max} of the folded id
  *    range. That shape is what makes leftovers harmless for every
  *    fold this store supports:
  *      - latest-wins keyed on batch_id (the drift reference, the
  *        band index's per-doc merge): for any key, the max surviving
  *        batch holding it is either the key's true latest delta
  *        (which also won inside batch 0's fold — same value) or
  *        absent (batch 0 wins). A PREFIX of survivors would break
  *        this: an old leftover would shadow batch 0's newer fold for
  *        keys whose latest delta was already deleted;
  *      - order-insensitive idempotent folds (min, set-union — the
  *        novelty first-seen index): re-folding any subset of
  *        already-folded rows is a no-op regardless of survivor shape.
  *    The next compaction folds the suffix again — by the same
  *    argument the re-fold reproduces batch 0 exactly — then resumes
  *    the deletes.
  */
/** The sibling-backup two-rename swap shared by every directory-
  * valued piece of compact-in-place state (DeltaStore's `batch_id=0`
  * fold, the Reservoir root, and the ANN cell stores'
  * [[graft.ops.CellStore]] compaction): ONE definition of the
  * crash-window machinery — delete stale backup, checked rename
  * target→backup, checked rename tmp→target, delete backup — plus the
  * WRITER-ONLY recovery. Previously duplicated per store; a fix to
  * one swap path could silently miss the other.
  */
private[graft] object SwapDir {
  import org.apache.hadoop.fs.FileSystem

  /** Swap fully-written `tmp` content into `target`. Every rename is
    * checked: a silently-failed rename would lose the new content (or
    * strand it in tmp) undetected. A crash at any point leaves the
    * old target, the backup, or the new target readable — readers
    * fall back to the backup IN PLACE and only the single writer
    * repairs by rename (see [[recover]]).
    */
  def swap(fs: FileSystem, target: Path, tmp: Path, backup: Path,
           label: String): Unit = {
    // safety-by-construction, not caller discipline: if a previous
    // swap died between its two renames, the backup is the ONLY copy —
    // deleting it below would silently destroy the state. Every caller
    // must recover() first; fail loudly if one forgot.
    if (!fs.exists(target) && fs.exists(backup))
      sys.error(s"$label: swap without recovery — $target missing while " +
        s"backup $backup exists (call recover first)")
    fs.delete(backup, true) // stale backup from a prior completed swap
    if (fs.exists(target) && !fs.rename(target, backup))
      sys.error(s"$label: rename $target -> $backup failed")
    if (!fs.rename(tmp, target))
      sys.error(s"$label: rename $tmp -> $target failed")
    fs.delete(backup, true)
  }

  /** WRITER-ONLY crash repair: a swap that died between the backup
    * rename and landing the new target leaves the backup as the only
    * copy — rename it back. Never call from a read path: restoring
    * between a LIVE swap's two renames would make its second rename
    * land the new content INSIDE the restored dir, nesting and
    * duplicating rows.
    */
  def recover(fs: FileSystem, target: Path, backup: Path,
              label: String): Unit =
    if (!fs.exists(target) && fs.exists(backup) && !fs.rename(backup, target))
      sys.error(s"$label recovery: rename $backup -> $target failed")
}

private[streaming] object DeltaStore {

  /** Raw union of all delta partitions, `batch_id` taken from the
    * partition directories, with a crashed compaction's sibling backup
    * unioned IN PLACE as batch 0. None when the root holds no
    * `batch_id=` partitions and no backup exists (callers pick their
    * empty-index semantics).
    */
  def readRaw(spark: SparkSession, indexDir: String): Option[DataFrame] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(indexDir)
    val fs = root.getFileSystem(conf)
    val zero = new Path(s"$indexDir/batch_id=0")
    val old = new Path(indexDir + "_old0")
    val backup = !fs.exists(zero) && fs.exists(old)
    val hasParts = fs.exists(root) &&
      fs.listStatus(root).exists(_.getPath.getName.startsWith("batch_id="))
    if (hasParts) {
      val live = spark.read.parquet(indexDir) // batch_id from partition dirs
      Some(
        if (backup)
          live.unionByName(spark.read.parquet(old.toString)
            .withColumn("batch_id",
              lit(0).cast(live.schema("batch_id").dataType)))
        else live)
    } else if (backup)
      Some(spark.read.parquet(old.toString).withColumn("batch_id", lit(0L)))
    else None
  }

  /** Scoped store read shared by the replay-guarded maintainers: the
    * raw union filtered to `batch_id < beforeBatch` (the guard — a
    * batch scoring itself must not see its own possibly-half-written
    * partition), falling back to an EMPTY frame of `schema` when the
    * store does not exist yet. Centralized here because the guard
    * semantics are load-bearing for crash correctness and must not
    * drift between indexes.
    */
  def readScopedOr(spark: SparkSession, indexDir: String,
                   beforeBatch: Option[Long],
                   schema: org.apache.spark.sql.types.StructType): DataFrame =
    readRaw(spark, indexDir) match {
      case Some(raw) =>
        beforeBatch match {
          case Some(b) => raw.filter(col("batch_id") < b)
          case None => raw
        }
      case None =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }

  /** Whole-snapshot LATEST-WINS fold over a raw delta union: keep only
    * the max-batch_id partition's rows, projected to `cols`. THE one
    * definition of the cumulative-snapshot store discipline
    * (DriftStream's histograms, ContractStream's report, DsirStream's
    * buckets, NbStream's prior) — each partition holds a complete
    * cumulative snapshot, so the newest one IS the state and every
    * leftover from a crashed compaction is itself a valid (older)
    * snapshot. Previously copy-pasted per store; a fix to the fold
    * semantics could silently miss a copy (the SwapDir argument).
    */
  def latestSnapshot(raw: DataFrame, cols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    raw.withColumn("__mx", max(col("batch_id").cast("long")).over(w))
      .filter(col("batch_id").cast("long") === col("__mx"))
      .select(cols.map(col): _*)
  }

  /** The read-path form of [[latestSnapshot]] over a store directory:
    * scoped raw read (`beforeBatch` = the replay guard), then the
    * max-batch_id snapshot, falling back to the empty frame for an
    * absent store. Two jobs (max + filter) — fine for reporting APIs;
    * per-micro-batch HOT paths with driver-sized state should collect
    * once and pick the max driver-side instead (the DriftStream
    * scoreBatchWith pattern).
    */
  def readLatestSnapshot(spark: SparkSession, indexDir: String,
                         beforeBatch: Option[Long],
                         schema: org.apache.spark.sql.types.StructType,
                         cols: Seq[String]): DataFrame = {
    val raw = readScopedOr(spark, indexDir, beforeBatch, schema)
      .withColumn("batch_id", col("batch_id").cast("long"))
    val latest = raw.agg(max(col("batch_id"))).head().get(0)
    if (latest == null) raw.select(cols.map(col): _*)
    else raw.filter(col("batch_id") === lit(latest)).select(cols.map(col): _*)
  }

  /** If a compaction crashed between renaming the old `batch_id=0`
    * aside and landing the new one, restore the backup — the folded
    * content it held is not yet anywhere else. WRITER-ONLY: called
    * solely from [[compact]] (readers fall back to reading the backup
    * in place — see [[readRaw]]), so the restore can never race a
    * live swap.
    */
  private def recoverCompaction(spark: SparkSession, indexDir: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val zero = new Path(s"$indexDir/batch_id=0")
    SwapDir.recover(zero.getFileSystem(conf), zero,
      new Path(indexDir + "_old0"), "delta-store")
  }

  /** Fold the delta partitions present AT ENTRY into `batch_id=0`
    * with the index's own merge (`fold` receives the raw union with
    * its `batch_id` column and returns the folded rows), dropping
    * superseded rows.
    *
    * CONCURRENCY CONTRACT (precise — the crash contract above covers
    * crashes, not live races): maintainer WRITES are safe at any time
    * (a delta committed mid-compaction is outside the entry snapshot
    * and never dropped), but maintainer/serving READS must be
    * serialized with compaction — the batch_id=0 swap is two renames
    * and the trailing deletes are not atomic, so a parquet listing
    * landing inside those windows can transiently miss batch 0, see
    * it twice (new fold + in-place backup both as batch 0), or hit
    * deleted files. The intended deployment gives this for free:
    * foreachBatch is serial, and the maintainers run compaction
    * BETWEEN micro-batches in the same driver loop (the spec/usage
    * pattern); a separately-scheduled compactor must take the same
    * turn-taking (e.g. pause the stream or lock the index dir).
    * Readers DO safely tolerate any crashed compaction's leftovers —
    * that is the crash contract above.
    *
    * `keepLatest` excludes the HIGHEST batch_id partition from the
    * fold. Required for any index whose maintainer reads history
    * filtered by `batch_id < current` (the novelty index's replay
    * guard): the latest partition may belong to a batch whose
    * checkpoint has not committed yet, and folding it into batch_id=0
    * would erase the provenance the guard filters on — a crash-replay
    * of that batch would then score against its own shingles. Indexes
    * whose replay never reads the store (the band index: a replayed
    * micro-batch recomputes its delta from the batch data alone) can
    * leave it false and compact everything.
    */
  def compact(spark: SparkSession, indexDir: String,
              fold: DataFrame => DataFrame,
              keepLatest: Boolean = false,
              // test seam: invoked before each trailing per-partition
              // delete so specs can crash the delete loop mid-way and
              // exercise the suffix-survivor contract above
              onDelete: Path => Unit = _ => ()): Unit = {
    recoverCompaction(spark, indexDir)
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(indexDir)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return
    val all = fs.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith("batch_id=")).toSeq
    def idOf(p: Path): Long = p.getName.stripPrefix("batch_id=").toLong
    val snapshot =
      if (keepLatest && all.nonEmpty) {
        val latest = all.maxBy(idOf)
        // keeping only batch 0 behind would fold nothing new; skip
        all.filterNot(_ == latest)
      } else all
    if (snapshot.isEmpty || snapshot.forall(_.getName == "batch_id=0")) return
    val tmp = new Path(indexDir + "_compacting")
    val zero = new Path(s"$indexDir/batch_id=0")
    val old0 = new Path(indexDir + "_old0")
    fold(spark.read.option("basePath", indexDir)
        .parquet(snapshot.map(_.toString): _*))
      .write.mode("overwrite").parquet(tmp.toString + "/batch_id=0")
    SwapDir.swap(fs, zero, new Path(tmp, "batch_id=0"), old0,
      "delta-store compaction")
    // OLDEST-FIRST (ascending numeric id): a crash anywhere in this
    // loop leaves a SUFFIX of the folded range behind — the only
    // leftover shape under which latest-wins-on-batch_id reads and
    // re-folds are unchanged (see the crash contract above)
    snapshot.filter(_.getName != "batch_id=0").sortBy(idOf).foreach { p =>
      onDelete(p); fs.delete(p, true)
    }
    fs.delete(tmp, true)
  }
}
