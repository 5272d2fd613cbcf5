package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.functions.{cosine_similarity, pq_adc_dot, pq_encode, pq_lut, unit_normalize}

/** Product quantization (Jegou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI'11) — the memory-bound scale path
  * for ANN: each corpus vector is replaced by m codeword indices
  * (m bytes-ish vs dim*8 bytes), and candidate scoring becomes m table
  * lookups (ADC) instead of a dim-length dot product.
  *
  * Spark shape:
  *  - TRAIN: per-subspace k-means on a driver-side sample — codebook
  *    state is m*ksub*subDim doubles (a few KB), the same
  *    driver-parameterizes-the-plan pattern as Lloyd centers.
  *  - ENCODE: one narrow codegen'd map over the corpus
  *    ([[graft.functions.PqEncodeExpr]] — codebooks ride in as a
  *    codegen reference object; the 100 TB side never shuffles).
  *  - SEARCH: queries get a per-query LUT (PqLutExpr, once per query),
  *    candidates score with m lookups (PqAdcDotExpr), top-`rerank`
  *    survive to an exact re-rank over the full vectors.
  *
  * Vectors are unit-normalized up front so dot = cosine: ADC then
  * ranks by approximate cosine directly, and the exact re-rank uses
  * the true cosine. At warehouse scale the encoded corpus (cell id +
  * m ints + the vector) is what you'd persist partitioned by cell;
  * only the re-rank reads full vectors, and only for candidates.
  */
object Pq {

  /** Train per-subspace codebooks with driver-side Lloyd over a
    * deterministic hash-sample of the corpus (xxhash64 of the id —
    * seed-stable, scan-pushed filter, no full-data sort). Sample size
    * is bounded by `sampleN`; k-means over `sampleN * dim` doubles is
    * driver-trivial for any sane sampleN.
    *
    * @return codebooks[m][ksub][subDim] with subDim = dim / m
    */
  def trainCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                     dim: Int, m: Int, ksub: Int,
                     sampleN: Int = 2048, iters: Int = 10): Array[Array[Array[Double]]] = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    require(ksub >= 1, s"ksub must be >= 1, got $ksub")
    val subDim = dim / m
    // deterministic pseudo-random subset: order by the id hash, keep N
    // null vectors (the embeddings loader's junk-line convention) must
    // not reach the driver math: filter scan-side, before the sample cut
    val sample: Array[Array[Double]] = corpus
      .where(col(vecCol).isNotNull)
      .select(col(vecCol).as("v"), xxhash64(col(idCol)).as("h"))
      .orderBy(col("h"))
      .limit(sampleN)
      .select(col("v"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "pq training sample is empty")
    Array.tabulate(m) { j =>
      val off = j * subDim
      val sub = sample.map { v =>
        Array.tabulate(subDim)(i => if (off + i < v.length) v(off + i) else 0.0)
      }
      lloydDriver(sub, ksub, iters)
    }
  }

  /** Plain driver-side Lloyd (L2) over an in-memory sample: init =
    * evenly-strided sample points (deterministic), empty cells keep
    * their previous centroid. All driver math — the sample is small by
    * contract.
    */
  private[ops] def lloydDriver(points: Array[Array[Double]], k: Int,
                               iters: Int): Array[Array[Double]] = {
    val n = points.length
    val d = points(0).length
    var centers = Array.tabulate(math.min(k, n))(c => points(c * n / math.min(k, n)).clone())
    // fewer distinct points than k: pad by repeating (harmless — dead
    // codewords are never selected by argmin when a closer one exists)
    if (centers.length < k) centers = Array.tabulate(k)(c => centers(c % centers.length).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.ofDim[Double](k, d)
      val counts = new Array[Int](k)
      var p = 0
      while (p < n) {
        val v = points(p)
        var best = 0
        var bestD = Double.PositiveInfinity
        var c = 0
        while (c < k) {
          val w = centers(c)
          var dist = 0.0
          var i = 0
          while (i < d) { val df = v(i) - w(i); dist += df * df; i += 1 }
          if (dist < bestD) { bestD = dist; best = c }
          c += 1
        }
        var i = 0
        while (i < d) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
        p += 1
      }
      centers = Array.tabulate(k) { c =>
        if (counts(c) == 0) centers(c)
        else Array.tabulate(d)(i => sums(c)(i) / counts(c))
      }
      it += 1
    }
    centers
  }

  /** IVF-PQ top-k cosine ANN: coarse k-means cells bound the search to
    * `nProbe` cells per query (as [[Similarity.ivfKnn]]), PQ-ADC ranks
    * the in-cell candidates with m lookups each, and only the top
    * `rerank` per query pay an exact cosine. Recall knobs: nProbe
    * (cell coverage) and rerank (ADC error tolerance).
    *
    * corpus: (cid, cv); queries: (qid, qv) — both ARRAY<DOUBLE>.
    */
  /** A trained IVF-PQ index: driver-side quantizer state (coarse
    * centers + per-subspace codebooks) and the encoded corpus
    * (cid, cv, cvn, center_id, codes) — everything serving needs.
    */
  case class PqIndex(centers: Array[Array[Double]],
                     codebooks: Array[Array[Array[Double]]],
                     cells: DataFrame)

  /** Train + encode, no search: the offline half of the ANN lifecycle.
    * Driver-side state is a few KB; the encode is the single narrow
    * codegen pass over the corpus (see object scaladoc).
    */
  def buildIndex(spark: SparkSession, corpus: DataFrame,
                 dim: Int = 64, nCells: Int = 16, m: Int = 8,
                 ksub: Int = 16, lloydIters: Int = 2): PqIndex = {
    import graft.cluster.KMeansAssign
    val c = corpus.toDF("cid", "cv")
      .withColumn("cvn", unit_normalize(col("cv")))
    val centers = KMeansAssign.lloydCenters(c, nCells, lloydIters, "cid", "cvn")
    val codebooks = trainCodebooks(c, "cid", "cvn", dim, m, ksub)
    val cells = KMeansAssign.assignMap(c, centers, "cvn").drop("dist")
      .withColumn("codes", pq_encode(col("cvn"), codebooks))
    PqIndex(centers, codebooks, cells)
  }

  /** Persist an index: encoded cells as parquet PARTITIONED BY CELL —
    * a probe of nProbe cells then prunes at the storage layer (the
    * IvfLayoutSpec pattern, and the layout you'd ship to a serving
    * fleet) — plus the driver quantizer state as one small parquet row
    * of nested arrays (no side files, no custom format).
    */
  def saveIndex(idx: PqIndex, path: String): Unit = {
    val spark = idx.cells.sparkSession
    // a fresh index must not inherit a previous index's half-finished
    // compaction (cleared up front) or tombstones (cleared AFTER the
    // new cells land — CellStore.clearForSave has the crash-window
    // ordering argument)
    CellStore.clearForSave(spark, path)
    idx.cells.write.mode("overwrite")
      .partitionBy("center_id").parquet(path + "/cells")
    import spark.implicits._
    Seq((idx.centers.map(_.toSeq).toSeq,
        idx.codebooks.map(_.map(_.toSeq).toSeq).toSeq))
      .toDF("centers", "codebooks")
      .coalesce(1).write.mode("overwrite").parquet(path + "/meta")
    CellStore.clearTombstones(spark, path)
  }

  /** Load a persisted index; the cells frame is lazy (scans prune by
    * center_id at serve time). Pending tombstones (see
    * [[deleteFromSavedIndex]]) are applied as one anti equi-join on id
    * — the center_id partition filter still pushes to the cell scan,
    * so probe pruning survives deletes.
    */
  def loadIndex(spark: SparkSession, path: String): PqIndex = {
    import scala.collection.{Seq => CSeq}
    val meta = spark.read.parquet(path + "/meta").collect()(0)
    // row cells hold mutable.ArraySeq — declare collection.Seq, not
    // immutable.Seq (getSeq's cast is unchecked erasure)
    val centers = meta.getSeq[CSeq[Double]](meta.fieldIndex("centers"))
      .map(_.toArray).toArray
    val codebooks = meta.getSeq[CSeq[CSeq[Double]]](meta.fieldIndex("codebooks"))
      .map(_.map(_.toArray).toArray).toArray
    // crash fallback + tombstone application: the shared CellStore
    // read path (one definition of the layout contract for both ANN
    // lifecycles)
    val cells = CellStore.applyTombstones(spark, path,
      spark.read.parquet(CellStore.resolveCellsPath(spark, path)))
    PqIndex(centers, codebooks, cells)
  }

  /** Hard-delete ids from a live index: one anti equi-join on id;
    * quantizers untouched (standard IVF maintenance — deletes never
    * retrain, re-train only on drift). Encoding is deterministic under
    * frozen quantizers, so the surviving cells are exactly what a
    * fresh encode of the remaining corpus would produce — search
    * equality with rebuild-without-deleted is spec-proven.
    */
  def deleteFromIndex(idx: PqIndex, ids: DataFrame): PqIndex =
    PqIndex(idx.centers, idx.codebooks,
      idx.cells.join(ids.toDF("cid").select(col("cid")).distinct(),
        Seq("cid"), "left_anti"))

  /** Delete from a PERSISTED index without rewriting cells: append the
    * ids to a tombstone table beside the cell files — O(delta) work,
    * what a takedown pipeline needs (deletes must be cheap and
    * immediately visible; [[loadIndex]] applies them, [[compactIndex]]
    * folds them in). Idempotent: re-deleting an id appends a duplicate
    * tombstone row that the load-time distinct collapses.
    */
  def deleteFromSavedIndex(spark: SparkSession, path: String, ids: DataFrame): Unit =
    CellStore.appendTombstones(spark, path, ids)

  /** Fold pending tombstones into the cell files: rewrite the
    * surviving rows (same PARTITIONED BY center_id layout — probe
    * pruning is preserved), swap via a sibling BACKUP rename, then
    * drop exactly the tombstone FILES that were snapshotted at entry.
    * Quantizers are untouched; only data files move.
    *
    * Concurrency + crash contract: a tombstone appended by
    * [[deleteFromSavedIndex]] after the snapshot is neither folded nor
    * deleted — it stays pending and applies on every load until the
    * next compaction (deleting the whole tombstone DIR here would
    * resurrect that vector). A crash before the swap leaves the old
    * cells + all tombstones; between the backup rename and the swap,
    * [[CellStore.recoverCells]] restores the backup on the next WRITER
    * entry ([[loadIndex]] reads the backup in place instead, so a
    * serving load can never race a live swap); after the swap, at
    * worst some folded tombstone files survive and re-apply as no-ops
    * (the ids are already gone from the cells).
    */
  def compactIndex(spark: SparkSession, path: String): PqIndex = {
    CellStore.compactCells(spark, path)
    loadIndex(spark, path)
  }

  def ivfPqKnn(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
               k: Int, dim: Int = 64, nCells: Int = 16, nProbe: Int = 4,
               m: Int = 8, ksub: Int = 16, rerank: Int = 32,
               lloydIters: Int = 2): DataFrame = {
    val idx = buildIndex(spark, corpus, dim, nCells, m, ksub, lloydIters)
    searchIndex(spark, idx, queries, k, nProbe, rerank)
  }

  /** Incremental insert: encode a delta batch with the EXISTING
    * quantizers (centers and codebooks unchanged — standard IVF
    * maintenance; re-train only on drift) and REPLACE re-ingested ids.
    * Delta-only work: one narrow assign+encode map over the delta and
    * one anti equi-join strike on the old cells — the history is never
    * re-encoded. Same MERGE shape as Dedup.upsertBandIndex.
    */
  def insertIntoIndex(idx: PqIndex, delta: DataFrame): PqIndex = {
    import graft.cluster.KMeansAssign
    // one winner per id within the delta batch (an at-least-once feed
    // can repeat an id): deterministic row-wise minimum, else both
    // versions' codes would survive and merge != rebuild
    val named = delta.toDF("cid", "cv")
    val wd = Window.partitionBy(col("cid")).orderBy(col("cv"))
    val d = named
      .withColumn("__rn", row_number().over(wd))
      .filter(col("__rn") === 1).drop("__rn")
      .withColumn("cvn", unit_normalize(col("cv")))
    val enc = KMeansAssign.assignMap(d, idx.centers, "cvn").drop("dist")
      .withColumn("codes", pq_encode(col("cvn"), idx.codebooks))
    val kept = idx.cells
      .join(enc.select(col("cid")).distinct(), Seq("cid"), "left_anti")
      .select(enc.columns.map(col): _*)
    PqIndex(idx.centers, idx.codebooks, kept.unionByName(enc))
  }

  /** The online half: probe + ADC shortlist + exact re-rank against a
    * built (or loaded) [[PqIndex]].
    */
  def searchIndex(spark: SparkSession, idx: PqIndex, queries: DataFrame,
                  k: Int, nProbe: Int = 4, rerank: Int = 32): DataFrame = {
    require(rerank >= k, s"rerank=$rerank must be >= k=$k")
    val ksub = idx.codebooks(0).length
    val codebooks = idx.codebooks
    val cells = idx.cells
    // probe representatives = the coarse quantizer ITSELF, straight
    // from driver state: K rows, zero scans. Recomputing cell means
    // here (the old phrasing) paid a full posexplode+agg scan of the
    // persisted cells on EVERY search call — defeating the
    // partitioned-layout pruning — and drifted from the quantizer the
    // assignments actually used once insertIntoIndex added vectors.
    import spark.implicits._
    val centroids = idx.centers.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toSeq) }
      .toDF("center_id", "repr")
    // probe plan: nProbe nearest cells per query + the query's LUT
    val q = queries.toDF("qid", "qv")
      .withColumn("qvn", unit_normalize(col("qv")))
      .withColumn("lut", pq_lut(col("qvn"), codebooks))
    val wp = Window.partitionBy(col("qid")).orderBy(col("cdist"), col("center_id"))
    val probes = q.crossJoin(broadcast(centroids))
      .select(col("qid"), col("qv"), col("lut"), col("center_id"),
        graft.functions.functions.cosine_distance(col("qvn"), col("repr")).as("cdist"))
      .withColumn("prnk", row_number().over(wp))
      .filter(col("prnk") <= nProbe)
      .select(col("qid"), col("qv"), col("lut"), col("center_id"))
    // ADC scan inside probed cells (m lookups per candidate), keep
    // top-`rerank` per query by approximate dot. No broadcast hint on
    // the probe side: each probe row carries the query vector AND its
    // m*ksub-double LUT, so a large serving batch would OOM the driver
    // if force-broadcast. AQE sees the actual post-window size and
    // broadcasts the common small-batch case on its own, while a huge
    // query set degrades gracefully to a shuffled equi-join on
    // center_id (plan-asserted both ways in PqSpec).
    val wa = Window.partitionBy(col("qid")).orderBy(col("adc").desc, col("cid"))
    val shortlist = cells.join(probes, "center_id")
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("qv"), col("cid"), col("cv"),
        pq_adc_dot(col("lut"), col("codes"), ksub).as("adc"))
      .withColumn("arnk", row_number().over(wa))
      .filter(col("arnk") <= rerank)
    // exact re-rank of the shortlist only
    val wr = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("cid"))
    shortlist
      .select(col("qid"), col("cid"),
        cosine_similarity(col("qv"), col("cv")).as("score"))
      .withColumn("rnk", row_number().over(wr))
      .filter(col("rnk") <= k)
  }
}
