package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared persistence machinery for ANN cell tables — ONE definition
  * of the center_id-partitioned parquet layout's tombstone and
  * compaction crash contract, consumed by BOTH ANN lifecycles (the
  * IVF-PQ index in [[Pq]] and the plain-IVF index in [[Similarity]]).
  * A second copy of the rename-swap dance would inevitably drift on
  * exactly the crash windows the specs pin.
  *
  * Layout under `path`:
  *   - `cells/`       rows keyed `cid`, PARTITIONED BY `center_id`
  *                    (probe pruning at the storage layer)
  *   - `tombstones/`  appended (cid) parquet files — O(delta) deletes,
  *                    applied at load, folded by compaction
  *   - `cells_old/`   transient backup during a compaction swap
  *
  * Crash contract (the [[Pq.compactIndex]] scaladoc, verbatim): a
  * tombstone appended after compaction's snapshot is neither folded
  * nor deleted — it stays pending and applies on every load until the
  * next compaction. A crash before the swap leaves the old cells +
  * all tombstones; between the backup rename and the swap,
  * [[recoverCells]] restores the backup on the next WRITER entry
  * (readers serve the backup in place via [[resolveCellsPath]] — a
  * read must never rename under a live swap); after the swap, at
  * worst some folded tombstone files survive and re-apply as no-ops.
  */
private[ops] object CellStore {

  private def hfs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** READ-path cells location: if a compaction died mid-swap, serve
    * the sibling backup IN PLACE (same partitioned layout, so probe
    * pruning is unaffected) — never rename from a read path.
    */
  def resolveCellsPath(spark: SparkSession, path: String): String = {
    val cellsP = new org.apache.hadoop.fs.Path(path + "/cells")
    val fs = hfs(spark, cellsP)
    val old = new org.apache.hadoop.fs.Path(path + "/cells_old")
    if (!fs.exists(cellsP) && fs.exists(old)) old.toString else cellsP.toString
  }

  /** Pending tombstone FILES (not just the dir: compaction deletes
    * folded files individually, which can leave the directory empty —
    * reading an empty dir fails schema inference).
    */
  def tombstoneFiles(spark: SparkSession, path: String): Seq[org.apache.hadoop.fs.Path] = {
    val tomb = new org.apache.hadoop.fs.Path(path + "/tombstones")
    val fs = hfs(spark, tomb)
    if (fs.exists(tomb))
      fs.listStatus(tomb).map(_.getPath)
        .filter(p => !p.getName.startsWith("_")).toSeq
    else Seq.empty
  }

  /** Apply pending tombstones to a loaded cells frame: one anti
    * equi-join on `cid` — the center_id partition filter still pushes
    * to the cell scan, so probe pruning survives deletes.
    */
  def applyTombstones(spark: SparkSession, path: String,
                      cells0: DataFrame): DataFrame = {
    val tombFiles = tombstoneFiles(spark, path)
    if (tombFiles.nonEmpty)
      cells0.join(
        spark.read.parquet(tombFiles.map(_.toString): _*)
          .select(col("cid")).distinct(),
        Seq("cid"), "left_anti")
    else cells0
  }

  /** Initialize the layout for a FRESH index save: clear a compaction
    * backup or half-written rewrite left by a PREVIOUS index at the
    * same path (so the read path's backup fallback can never serve the
    * old index's cells beside the new meta). Called BEFORE writing
    * cells/meta; the previous index's tombstones are cleared AFTER the
    * new cells land ([[clearTombstones]]) — deliberately not here: a
    * save that died between clearing tombstones and writing the new
    * cells would leave the OLD index served with its takedowns
    * resurrected (a compliance bug), whereas the write-then-clear
    * order's crash window at worst OVER-deletes the new index (old
    * tombstones applied to re-ingested ids) until the interrupted save
    * is re-run — never an un-deleted takedown.
    */
  def clearForSave(spark: SparkSession, path: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = hfs(spark, root)
    Seq("cells_old", "cells_compacting").foreach { d =>
      fs.delete(new org.apache.hadoop.fs.Path(path + "/" + d), true)
    }
  }

  /** Drop the PREVIOUS index's tombstones after a fresh save's cells
    * and meta have landed — without this, a rebuilt index saved over a
    * previously-used path is silently served with the old index's
    * deletes applied (a re-ingested id would vanish from every search
    * with no error). Every save path ([[graft.ops.Similarity.saveIvfIndex]],
    * [[Pq.saveIndex]]) calls [[clearForSave]] before and this after
    * its writes; see [[clearForSave]] for why the order matters.
    */
  def clearTombstones(spark: SparkSession, path: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    hfs(spark, root).delete(
      new org.apache.hadoop.fs.Path(path + "/tombstones"), true)
  }

  /** Tombstone-delete from a PERSISTED store without rewriting cells:
    * append the ids beside the cell files — O(delta), immediately
    * visible to every load. Idempotent: re-deleting an id appends a
    * duplicate row the load-time distinct collapses.
    */
  def appendTombstones(spark: SparkSession, path: String, ids: DataFrame): Unit =
    ids.toDF("cid").select(col("cid")).distinct()
      .write.mode("append").parquet(path + "/tombstones")

  /** If a compaction crashed between renaming the old cells aside and
    * landing the rewrite, restore the backup. WRITER-ONLY: reads use
    * [[resolveCellsPath]] instead, so a serving load can never race a
    * live swap.
    */
  def recoverCells(spark: SparkSession, path: String): Unit = {
    val cellsP = new org.apache.hadoop.fs.Path(path + "/cells")
    graft.streaming.SwapDir.recover(hfs(spark, cellsP), cellsP,
      new org.apache.hadoop.fs.Path(path + "/cells_old"), "cell store")
  }

  /** Fold pending tombstones into the cell files: rewrite surviving
    * rows (same PARTITIONED BY center_id layout), swap via a sibling
    * backup rename, then drop exactly the tombstone FILES snapshotted
    * at entry (see the object scaladoc for the crash windows).
    */
  def compactCells(spark: SparkSession, path: String): Unit = {
    recoverCells(spark, path)
    val cellsP = new org.apache.hadoop.fs.Path(path + "/cells")
    val fs = hfs(spark, cellsP)
    val tombDir = new org.apache.hadoop.fs.Path(path + "/tombstones")
    val tombFiles = tombstoneFiles(spark, path)
    val cells0 = spark.read.parquet(cellsP.toString)
    val cells =
      if (tombFiles.nonEmpty)
        cells0.join(
          spark.read.parquet(tombFiles.map(_.toString): _*)
            .select(col("cid")).distinct(),
          Seq("cid"), "left_anti")
      else cells0
    val tmp = new org.apache.hadoop.fs.Path(path + "/cells_compacting")
    val old = new org.apache.hadoop.fs.Path(path + "/cells_old")
    cells.write.mode("overwrite").partitionBy("center_id").parquet(tmp.toString)
    // the shared checked-rename swap (SwapDir — one definition of the
    // crash windows for every compact-in-place store)
    graft.streaming.SwapDir.swap(fs, cellsP, tmp, old, "cell compaction")
    tombFiles.foreach(f => fs.delete(f, false))
    // drop the dir only when no DATA file landed since the snapshot:
    // strip leftover _SUCCESS markers, then a non-recursive delete
    // refuses a non-empty dir, so a concurrent append is never lost
    if (tombFiles.nonEmpty && fs.exists(tombDir)) {
      val remaining = fs.listStatus(tombDir).map(_.getPath)
      if (remaining.forall(_.getName.startsWith("_"))) {
        remaining.foreach(f => fs.delete(f, false))
        scala.util.Try(fs.delete(tombDir, false))
      }
    }
  }
}
