package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q208 graph ANN: the beam walk must deliver high recall at the
  * shipped operating point, and its best-so-far set must be MONOTONE
  * in hops — an exact-top-k member that enters the beam can never be
  * evicted (at most k−1 corpus items outrank it, and beam ≥ k), so
  * per-query n_hits is non-decreasing as the walk runs longer. That
  * is the property that makes "more hops" a pure latency/recall knob
  * with no regression risk, the claim the scaladoc ships.
  */
class GraphAnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sfDir)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  private def run(hops: Int): Map[Long, (Long, Long)] =
    Similarity.graphAnnRecall(spark, emb, emb.filter(col("vec_id") < 10),
        k = 10, nCells = 8, m = 8, beam = 32, hops = hops)
      .select(col("qid"), col("n_brute"), col("n_hits"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  private lazy val at4 = run(4)

  test("every query answered; full brute reference; recall high at the shipped point") {
    assert(at4.keySet == (0L until 10L).toSet)
    at4.foreach { case (q, (nb, nh)) =>
      assert(nb == 10L, s"query $q: brute reference short ($nb)")
      assert(nh <= nb)
    }
    val mean = at4.values.map(_._2).sum.toDouble / (10 * 10)
    assert(mean >= 0.8, s"mean recall $mean below the shipped point's floor")
  }

  test("best-so-far monotone: n_hits never decreases with more hops") {
    val at1 = run(1)
    val at2 = run(2)
    (0L until 10L).foreach { q =>
      assert(at1(q)._2 <= at2(q)._2 && at2(q)._2 <= at4(q)._2,
        s"query $q: hits regressed across hops " +
          s"(${at1(q)._2}, ${at2(q)._2}, ${at4(q)._2})")
    }
    // and the walk genuinely walks: hop 1 alone must not already be
    // the full answer everywhere (otherwise the test proves nothing)
    assert(at1.values.map(_._2).sum < at4.values.map(_._2).sum,
      "hop 1 already saturated — monotonicity vacuous on this fixture")
  }
}
