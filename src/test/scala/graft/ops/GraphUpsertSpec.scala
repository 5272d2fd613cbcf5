package graft.ops

import graft.SparkSpec
import graft.cluster.KMeansAssign
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q209 incremental graph maintenance: the merged (nodes, edges)
  * state after [[Similarity.upsertGraphEdges]] must equal the
  * from-scratch rebuild over the merged corpus EXACTLY, for random
  * re-ingest/new-id deltas — the locality argument (only consumers of
  * touched cells recompute) is only safe if it is invisible in the
  * output. Plus the ingest junk rules: at-least-once duplicate ids
  * resolve to the row-min winner, null vectors never become nodes.
  */
class GraphUpsertSpec extends SparkSpec {
  import spark.implicits._

  private type E = (Long, Long, Long)

  private lazy val emb = Tables.embeddings(spark, sfDir)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    .filter(col("v").isNotNull)
    .localCheckpoint(false)
  private lazy val centers =
    KMeansAssign.lloydCenters(emb, 8, iters = 1, "vec_id", "v")

  private def edgesOf(vecs: DataFrame): DataFrame = {
    val n = Similarity.twoCellAssign(spark, vecs, centers)
      .localCheckpoint(false)
    Similarity.graphEdges(n,
      n.filter(col("arn") === 1).select(col("vid"), col("vv"), col("center_id")),
      m = 8)
  }

  test("merge == rebuild over random deltas (fuzz)") {
    val nodes = Similarity.twoCellAssign(spark, emb, centers)
      .localCheckpoint(false)
    val baseEdges = edgesOf(emb).localCheckpoint(false)
    val baseSet = baseEdges.as[E].collect().toSet
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val reIds = (0 until 500 by 7).map(_.toLong)
        .filter(_ => rnd.nextBoolean()).take(20)
      val delta = emb.filter(col("vec_id").isin(reIds: _*))
        .select(col("vec_id"),
          transform(col("v"), (x, i) =>
            when(i === lit(seed % 64), x + lit(0.25 * seed)).otherwise(x))
            .as("v"))
        .unionByName(emb.filter(col("vec_id") < 3)
          .select((col("vec_id") + lit(1000L * seed)).as("vec_id"), col("v")))
      val (nodes2, merged) =
        Similarity.upsertGraphEdges(spark, nodes, baseEdges, delta, centers, 8)
      val mergedCorpus = emb
        .join(delta.select(col("vec_id")), Seq("vec_id"), "left_anti")
        .unionByName(delta)
      val want = edgesOf(mergedCorpus).as[E].collect().toSet
      val got = merged.as[E].collect().toSet
      assert(got == want, s"seed $seed: merge != rebuild " +
        s"(extra=${(got -- want).take(3)}, missing=${(want -- got).take(3)})")
      assert(got != baseSet, s"seed $seed: vacuous — delta changed no edge")
      // node state merged too: every delta id present exactly twice
      // (two cell ranks), replaced versions gone
      val dIds = delta.select(col("vec_id")).distinct()
        .as[Long].collect().toSet
      val counts = nodes2.filter(col("vid").isin(dIds.toSeq: _*))
        .groupBy(col("vid")).count().as[(Long, Long)].collect().toMap
      assert(counts.keySet == dIds && counts.values.forall(_ == 2L))
    }
  }

  test("duplicate id resolves to the row-min winner; null vectors never enter") {
    val base = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)), (1L, Seq(0.9, 0.1, 0.0, 0.0)),
      (2L, Seq(0.0, 1.0, 0.0, 0.0)), (3L, Seq(0.0, 0.9, 0.1, 0.0)),
      (4L, Seq(0.0, 0.0, 1.0, 0.0)), (5L, Seq(0.0, 0.0, 0.9, 0.1)))
      .toDF("vec_id", "v")
    val ctr = KMeansAssign.lloydCenters(base, 2, iters = 1, "vec_id", "v")
    val nodes = Similarity.twoCellAssign(spark, base, ctr)
    val edges = Similarity.graphEdges(nodes,
      nodes.filter(col("arn") === 1)
        .select(col("vid"), col("vv"), col("center_id")), m = 2)
    // id 1 delivered TWICE (row-min = the 0.1-leading vector) plus a
    // null-vector junk row that must not become a node
    val delta = Seq(
      (1L, Some(Seq(0.9, 0.0, 0.0, 0.1))),
      (1L, Some(Seq(0.1, 0.0, 0.0, 0.9))),
      (99L, None))
      .toDF("vec_id", "v")
    val (nodes2, merged) =
      Similarity.upsertGraphEdges(spark, nodes, edges, delta, ctr, m = 2)
    assert(nodes2.filter(col("vid") === 99L).count() == 0,
      "null-vector junk row became a node")
    val winnerCorpus = base.filter(col("vec_id") =!= 1L)
      .unionByName(Seq((1L, Seq(0.1, 0.0, 0.0, 0.9))).toDF("vec_id", "v"))
    val rebuilt = {
      val n = Similarity.twoCellAssign(spark, winnerCorpus, ctr)
      Similarity.graphEdges(n,
        n.filter(col("arn") === 1)
          .select(col("vid"), col("vv"), col("center_id")), m = 2)
    }
    assert(merged.as[E].collect().toSet == rebuilt.as[E].collect().toSet,
      "winner-rule merge != rebuild over the winner corpus")
  }
}
