package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Integer PageRank invariants: exact agreement with a plain-Scala
  * replay of the same integer recurrence (so the distributed fold adds
  * nothing), partitioning invariance (BIGINT sums are order-free), and
  * approximate mass conservation.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  // small directed graph, every node with out-degree >= 1:
  // a classic 4-node web (1 <-> 2, 2 -> 3, 3 -> 1, 4 -> 1, 1 -> 4)
  private val edgeList = Seq(
    (1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (4L, 1L), (1L, 4L))

  private def scalaPageRank(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var r = nodes.map(_ -> Graph.RankScale).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(e => r(e._1) / outdeg(e._1)).sum
      }
      r = nodes.map(n => n -> (Graph.Teleport + 17 * in.getOrElse(n, 0L) / 20)).toMap
    }
    r
  }

  test("pageRank equals the plain-Scala integer recurrence exactly") {
    val edges = edgeList.toDF("src", "dst")
    val got = Graph.pageRank(edges, 5).as[(Long, Long)].collect().toMap
    assert(got == scalaPageRank(edgeList, 5))
  }

  test("pageRank is invariant to input partitioning (integer sums are order-free)") {
    val e1 = edgeList.toDF("src", "dst").repartition(1)
    val e7 = edgeList.toDF("src", "dst").repartition(7, col("dst"))
    val a = Graph.pageRank(e1, 4).as[(Long, Long)].collect().toMap
    val b = Graph.pageRank(e7, 4).as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("rank mass is conserved up to floor loss") {
    val edges = edgeList.toDF("src", "dst")
    val n = 4
    val total = Graph.pageRank(edges, 5).agg(sum("rank")).as[Long].head()
    // each of the n nodes floors at most ~1 unit per in-edge per iter;
    // mass stays within 0.1% of n * RankScale
    assert(math.abs(total - n * Graph.RankScale) < n * Graph.RankScale / 1000)
  }

  test("tradeEdges is symmetric and id-spaces are disjoint") {
    val o = Tables.orders(spark, sfDir)
    val l = Tables.lineitem(spark, sfDir)
    val e = Graph.tradeEdges(o, l).cache()
    val fwd = e.filter(col("src") < Graph.SupplierOffset)
    val bwd = e.filter(col("src") >= Graph.SupplierOffset)
    assert(fwd.count() == bwd.count())
    assert(e.count() == e.distinct().count())
    // every forward edge has its mirror
    val unmatched = fwd.as[(Long, Long)].collect().toSet
      .diff(bwd.as[(Long, Long)].collect().toSet.map((p: (Long, Long)) => (p._2, p._1)))
    assert(unmatched.isEmpty)
    e.unpersist()
  }
}
