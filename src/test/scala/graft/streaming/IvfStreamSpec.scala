package graft.streaming

import graft.SparkSpec
import graft.ops.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class IvfVec(vec_id: Long, v: Array[Double])

/** Streaming IVF maintenance: after every micro-batch the served cell
  * view must BIT-EXACTLY equal (a) the batch lifecycle folded in batch
  * order — upsertIvfCells then deleteFromIvfIndex — and (b) the
  * from-scratch assignMap rebuild over the latest-wins live corpus;
  * and knnFromStream must equal searchIvfIndex over that rebuilt
  * index. Through re-ingestion-across-cells, takedowns, a takedown +
  * re-upsert of the same id in one batch, replay, and compaction.
  */
class IvfStreamSpec extends SparkSpec {
  import spark.implicits._

  private val centers: Array[Array[Double]] =
    Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(-1.0, -1.0))

  // b0: 1,2 near c0; 3 near c1; 4 near c2; 5 between
  private val b0 = Seq(
    IvfVec(1, Array(0.9, 0.1)), IvfVec(2, Array(0.8, -0.1)),
    IvfVec(3, Array(0.1, 1.1)), IvfVec(4, Array(-0.9, -0.8)),
    IvfVec(5, Array(0.4, 0.5)))
  // b1: 2 MOVES to c1's cell; new 6; TAKEDOWN 3
  private val b1 = Seq(
    IvfVec(2, Array(-0.1, 0.9)), IvfVec(6, Array(1.2, 0.2)),
    IvfVec(3, null))
  // b2: takedown AND re-upsert of 2 in ONE batch (upsert wins);
  // takedown 1; 3 returns after its delete
  private val b2 = Seq(
    IvfVec(2, null), IvfVec(2, Array(0.7, 0.6)),
    IvfVec(1, null), IvfVec(3, Array(-1.1, -0.9)))

  private val batches = Seq(b0, b1, b2)

  /** Latest-wins live corpus after batches 0..upTo (driver oracle).
    * In-batch winner: row-min non-null vector; all-null = takedown.
    */
  private def live(upTo: Int): Seq[(Long, Seq[Double])] = {
    val m = scala.collection.mutable.Map[Long, Array[Double]]()
    batches.take(upTo + 1).foreach { b =>
      b.groupBy(_.vec_id).foreach { case (id, rows) =>
        val nonNull = rows.map(_.v).filter(_ != null)
        if (nonNull.isEmpty) m.remove(id)
        else m(id) = nonNull.minBy(_.toSeq.mkString(","))
      }
    }
    // the deterministic row-min of arrays is array-lexicographic; for
    // this fixture no id has two distinct non-null rows in one batch,
    // so the fold above never actually has to tie-break
    m.toSeq.map { case (id, v) => (id, v.toSeq) }
  }

  private def cellsOf(df: DataFrame): Set[(Long, Seq[Double], Int)] =
    df.select(col("cid").cast("long"), col("cv").cast("array<double>"),
        col("center_id").cast("int"))
      .as[(Long, Seq[Double], Int)].collect().toSet

  private def rebuild(upTo: Int): DataFrame =
    graft.cluster.KMeansAssign.assignMap(
      live(upTo).toDF("cid", "cv").select(col("cid"),
        col("cv").cast("array<double>").as("cv")),
      centers, "cv").drop("dist")

  test("streamed cells == batch lifecycle fold == rebuild; serve parity; replay; compaction") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ivf-stream").toString
    val cellsD = s"$dir/cells"
    val mem = MemoryStream[IvfVec]
    val q = IvfStream.maintain(mem.toDF(), centers, cellsD, s"$dir/ckpt")

    // the batch lifecycle's running state, (vec_id, v, center_id)
    var lifecycle: DataFrame =
      Seq.empty[(Long, Seq[Double], Int)].toDF("vec_id", "v", "center_id")
        .select(col("vec_id"), col("v").cast("array<double>").as("v"),
          col("center_id"))
    try {
      batches.zipWithIndex.foreach { case (b, k) =>
        mem.addData(b: _*)
        q.processAllAvailable()
        // fold the batch kernels: upserts (non-null winners), then
        // the takedown ids (ids whose batch rows were ALL null)
        val ups = b.filter(_.v != null).map(r => (r.vec_id, r.v.toSeq))
          .toDF("vec_id", "v")
          .select(col("vec_id"), col("v").cast("array<double>").as("v"))
        val delIds = b.groupBy(_.vec_id)
          .collect { case (id, rows) if rows.forall(_.v == null) => id }.toSeq
        val afterUps = Similarity.upsertIvfCells(lifecycle, ups, centers)
        lifecycle = Similarity.deleteFromIvfIndex(
            Similarity.IvfIndex(centers,
              afterUps.select(col("vec_id").as("cid"), col("v").as("cv"),
                col("center_id"))),
            delIds.toDF("cid")).cells
          .select(col("cid").as("vec_id"), col("cv").as("v"),
            col("center_id"))
          .localCheckpoint(false)

        val streamed = cellsOf(IvfStream.readCells(spark, cellsD))
        val kernelView = cellsOf(lifecycle.select(col("vec_id").as("cid"),
          col("v").as("cv"), col("center_id")))
        val rebuilt = cellsOf(rebuild(k))
        assert(streamed == kernelView, s"batch $k: stream != lifecycle fold")
        assert(streamed == rebuilt, s"batch $k: stream != rebuild")
      }

      // serve parity on the final state
      val queries = Seq((100L, Seq(0.9, 0.2)), (101L, Seq(-0.4, 0.6)))
        .toDF("qid", "qv")
        .select(col("qid"), col("qv").cast("array<double>").as("qv"))
      def serveRows(df: DataFrame) =
        df.select(col("qid"), col("cid"), col("score"), col("rnk"))
          .as[(Long, Long, Double, Int)].collect().toSet
      val fromStream = serveRows(
        IvfStream.knnFromStream(spark, cellsD, centers, queries, k = 2))
      val fromBatch = serveRows(Similarity.searchIvfIndex(spark,
        Similarity.IvfIndex(centers,
          rebuild(2).select(col("cid"), col("cv"), col("center_id"))),
        queries, k = 2))
      assert(fromStream == fromBatch && fromStream.nonEmpty)

      // replay of the last batch is idempotent (deterministic
      // overwrite of its own partition)
      val before = cellsOf(IvfStream.readCells(spark, cellsD))
      IvfStream.processBatch(b2.toDF(), batchId = 2L, centers, cellsD)
      assert(cellsOf(IvfStream.readCells(spark, cellsD)) == before)

      // compaction folds to one partition, drops tombstones, view intact
      IvfStream.compactCells(spark, cellsD)
      assert(cellsOf(IvfStream.readCells(spark, cellsD)) == before)
      val raw = spark.read.parquet(cellsD)
      assert(raw.select(col("batch_id")).distinct().as[Long].collect()
        .toSeq == Seq(0L))
      assert(raw.filter(col("deleted")).isEmpty, "tombstones survived compaction")
      // deleted ids are really gone: 1 was taken down in b2
      assert(!cellsOf(IvfStream.readCells(spark, cellsD)).exists(_._1 == 1L))
    } finally q.stop()
  }
}
