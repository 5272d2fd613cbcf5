package graft.streaming

import graft.SparkSpec
import graft.cluster.KMeansAssign
import graft.ops.{Similarity, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class GVec(vec_id: Long, v: Option[Seq[Double]])

/** Streaming graph-ANN maintenance: after every checkpointed
  * micro-batch the streamed (nodes, edges) state must BIT-EXACTLY
  * equal the from-scratch rebuild ([[Similarity.twoCellAssign]] +
  * [[Similarity.graphEdges]]) over the logically-current corpus
  * (later batches win re-ingested ids, taken-down ids removed), and
  * [[GraphStream.serveFromStream]] must equal
  * [[Similarity.graphServe]] over that rebuilt state — proven through
  * upserts, re-ingests, takedowns, replay, and compaction.
  */
class GraphStreamSpec extends SparkSpec {
  import spark.implicits._

  private val M = 8

  private lazy val emb = Tables.embeddings(spark, sfDir)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    .filter(col("v").isNotNull)
    .localCheckpoint(false)
  private lazy val centers =
    KMeansAssign.lloydCenters(emb, 8, iters = 1, "vec_id", "v")
  private lazy val centroids = KMeansAssign.centroidMeans(
      KMeansAssign.assignMap(emb.toDF("vid", "vv"), centers, "vv").drop("dist"),
      "vv")
    .withColumnRenamed("cvec", "repr")
    .localCheckpoint(false)

  private lazy val fixture: Seq[(Long, Seq[Double])] =
    emb.as[(Long, Seq[Double])].collect().toSeq
  private def perturb(v: Seq[Double]): Seq[Double] =
    v.updated(0, v.head + 0.5)
  // batch 2 re-ingests and takes down ids from EARLIER batches
  // alongside its own third of the corpus (ids already in batch 2's
  // own third are excluded from both sets — a same-batch original +
  // re-ingest pair would resolve by the row-min winner rule instead
  // of last-write-wins, which is not what this scenario models)
  private def reIngest(id: Long) = id % 20 == 1 && id % 3 != 2
  private def takedown(id: Long) = id % 20 == 2 && id % 3 != 2
  private lazy val batches: Seq[Seq[GVec]] = Seq(
    fixture.filter(_._1 % 3 == 0).map(x => GVec(x._1, Some(x._2))),
    fixture.filter(_._1 % 3 == 1).map(x => GVec(x._1, Some(x._2))),
    fixture.filter(_._1 % 3 == 2).map(x => GVec(x._1, Some(x._2))) ++
      fixture.filter(x => reIngest(x._1)).map(x => GVec(x._1, Some(perturb(x._2)))) ++
      fixture.filter(x => takedown(x._1)).map(x => GVec(x._1, None)))

  /** The logically-current corpus after batches 0..upTo. */
  private def current(upTo: Int): DataFrame = {
    val base = fixture.filter(x => x._1 % 3 <= upTo)
    val rows =
      if (upTo < 2) base
      else base.filter(x => !takedown(x._1))
        .map(x => if (reIngest(x._1)) (x._1, perturb(x._2)) else x)
    rows.toDF("vec_id", "v")
  }

  private type N = (Long, Seq[Double], Int, Int)
  private type E = (Long, Long, Long)
  private type R = (Long, Long, Double, Long)

  private def rebuildState(corpus: DataFrame): (DataFrame, DataFrame) = {
    val asg2 = Similarity.twoCellAssign(spark, corpus, centers)
      .localCheckpoint(false)
    val nodes = asg2.groupBy(col("vid"), col("vv"))
      .agg(min(when(col("arn") === 1, col("center_id"))).as("c1"),
        min(when(col("arn") === 2, col("center_id"))).as("c2"))
    val edges = Similarity.graphEdges(asg2,
      asg2.filter(col("arn") === 1)
        .select(col("vid"), col("vv"), col("center_id")), M)
    (nodes, edges)
  }

  private def nodeSet(df: DataFrame) =
    df.select(col("vid"), col("vv"), col("c1"), col("c2"))
      .as[N].collect().toSet
  private def edgeSet(df: DataFrame) = df.as[E].collect().toSet

  test("streamed nodes+edges == from-scratch rebuild per prefix; serve parity; replay; compaction") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graph-stream").toString
    val (nd, ed) = (s"$dir/nodes", s"$dir/edges")
    val mem = MemoryStream[GVec]
    val q = GraphStream.maintain(mem.toDF(), centers, nd, ed, s"$dir/ckpt", M)
    try {
      batches.foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    (0 to 2).foreach { k =>
      val (wantN, wantE) = rebuildState(current(k))
      assert(nodeSet(GraphStream.readNodes(spark, nd, Some(k + 1L)))
          == nodeSet(wantN), s"batch $k: nodes != rebuild")
      assert(edgeSet(GraphStream.readEdges(spark, ed, Some(k + 1L)))
          == edgeSet(wantE), s"batch $k: edges != rebuild")
    }

    // takedowns really vanished and re-ingests really moved
    val live = GraphStream.readNodes(spark, nd)
    assert(live.filter(pmod(col("vid"), lit(20)) === 2
      && pmod(col("vid"), lit(3)) =!= 2).count() == 0)

    // serve parity against the rebuilt state, frozen centroids
    val queries = emb.filter(col("vec_id") < 10).toDF("qid", "qv")
    val (rn, re) = rebuildState(current(2))
    val want = Similarity.graphServe(queries,
        rn.select(col("vid"), col("vv"), col("c1").as("center_id")),
        re.select(col("src"), col("dst")), centroids,
        k = 10, beam = 32, hops = 4)
      .as[R].collect().toSet
    val got = GraphStream.serveFromStream(spark, nd, ed, centroids, queries,
        k = 10, beam = 32, hops = 4)
      .as[R].collect().toSet
    assert(got == want, "serve from stream diverged from the rebuilt graph")
    assert(want.nonEmpty)

    // replay idempotence (the store is read scoped, so a crashed batch
    // 2 re-running lands byte-identically)
    val beforeN = nodeSet(GraphStream.readNodes(spark, nd))
    val beforeE = edgeSet(GraphStream.readEdges(spark, ed))
    GraphStream.processBatch(batches(2).toDF(), 2L, centers, nd, ed, M)
    assert(nodeSet(GraphStream.readNodes(spark, nd)) == beforeN, "node replay diverged")
    assert(edgeSet(GraphStream.readEdges(spark, ed)) == beforeE, "edge replay diverged")

    // compaction folds without changing either view; replay after
    // compaction still lands identically (keepLatest guard)
    GraphStream.compactNodes(spark, nd)
    GraphStream.compactEdges(spark, ed)
    assert(nodeSet(GraphStream.readNodes(spark, nd)) == beforeN, "node compaction diverged")
    assert(edgeSet(GraphStream.readEdges(spark, ed)) == beforeE, "edge compaction diverged")
    GraphStream.processBatch(batches(2).toDF(), 2L, centers, nd, ed, M)
    assert(edgeSet(GraphStream.readEdges(spark, ed)) == beforeE,
      "replay after compaction diverged")
  }

  test("empty batch writes nothing; a same-batch upsert beats a takedown (min ignores nulls)") {
    val dir = java.nio.file.Files.createTempDirectory("graph-empty").toString
    val (nd, ed) = (s"$dir/nodes", s"$dir/edges")
    val b0 = Seq(GVec(1L, Some(Seq(1.0, 0.0))), GVec(2L, Some(Seq(0.0, 1.0))))
    val ctr = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    GraphStream.processBatch(b0.toDF(), 0L, ctr, nd, ed, 2)
    val before = nodeSet(GraphStream.readNodes(spark, nd))
    GraphStream.processBatch(Seq.empty[GVec].toDF(), 1L, ctr, nd, ed, 2)
    assert(nodeSet(GraphStream.readNodes(spark, nd)) == before)
    // id 1: takedown AND upsert in one batch -> the upsert wins
    GraphStream.processBatch(
      Seq(GVec(1L, None), GVec(1L, Some(Seq(0.5, 0.5)))).toDF(),
      2L, ctr, nd, ed, 2)
    val after = nodeSet(GraphStream.readNodes(spark, nd))
    assert(after.exists(n => n._1 == 1L && n._2 == Seq(0.5, 0.5)),
      s"same-batch upsert must beat the takedown: $after")
    // and a pure takedown batch removes the node AND its edges
    GraphStream.processBatch(Seq(GVec(1L, None)).toDF(), 3L, ctr, nd, ed, 2)
    assert(!nodeSet(GraphStream.readNodes(spark, nd)).exists(_._1 == 1L),
      "taken-down node still live")
    val edges = edgeSet(GraphStream.readEdges(spark, ed))
    assert(!edges.exists(e => e._1 == 1L || e._2 == 1L),
      s"taken-down node leaked through the edge table: $edges")
  }
}
