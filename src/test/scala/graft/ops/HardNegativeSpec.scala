package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q204 hard-negative mining: planted duplicate-caption pairs surface
  * at margin exactly 0 (the mislabeled-pair signal), and the fixture
  * output holds the ranking/exclusion invariants.
  */
class HardNegativeSpec extends SparkSpec {
  import spark.implicits._

  test("a duplicate caption is the hardest negative, at margin exactly 0") {
    // docs 1 and 2 share text; 3..5 differ. Both stub kernels are
    // pure functions of the bytes, so 2's text embedding ties 1's own
    // positive exactly.
    val docs = Seq(
      (1L, "the same caption for two different images"),
      (2L, "the same caption for two different images"),
      (3L, "an unrelated description of something else"),
      (4L, "yet another caption about other content"),
      (5L, "fifth document with distinct words entirely"))
      .toDF("doc_id", "text")
    val txt = Multimodal.embedStub(spark, Multimodal.attachTextBytes(docs))
      .toDF("vec_id", "v")
    val img = Multimodal.embedStub(spark, Multimodal.attachMedia(docs))
      .toDF("vec_id", "v")
    val anchors = img.filter(col("vec_id") === 1L).toDF("qid", "qv")
    val posSim = anchors.join(txt.toDF("qid", "pv"), Seq("qid"))
      .select(col("qid"),
        graft.functions.functions.cosine_similarity(col("qv"), col("pv"))
          .as("pos_sim"))
    val mined = Similarity.bruteForceKnn(anchors, txt, k = 4)
      .join(posSim, Seq("qid"))
      .select(col("cid"), (col("pos_sim") - col("score")).as("margin"))
      .as[(Long, Double)].collect().toMap
    assert(mined(2L) == 0.0,
      s"duplicate caption should tie the positive exactly, got ${mined(2L)}")
    // distinct captions are distinct byte streams — their sims land
    // away from the positive (the stub is unaligned by construction,
    // so the sign of those margins is arbitrary; only the planted tie
    // is exact)
    assert(mined.filter(_._1 != 2L).values.forall(_ != 0.0),
      s"distinct captions should not tie the positive: $mined")
  }

  test("fixture invariants: 3 negatives per anchor, self excluded, ranked by sim") {
    val rows = NonOracle.q204.build(spark, sfDir)
      .select(col("qid"), col("rnk"), col("neg_id"), col("pos_sim"),
        col("neg_sim"), col("margin"))
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(rows.length == 20 * 3)
    rows.foreach { case (q, r, n, p, ns, m) =>
      assert(n != q, s"anchor $q mined itself")
      assert(r >= 1 && r <= 3)
      assert(m == p - ns)
    }
    rows.groupBy(_._1).values.foreach { g =>
      val byRank = g.sortBy(_._2).map(_._5)
      assert(byRank.sliding(2).forall {
        case Array(a, b) => a >= b
        case _ => true
      }, "neg_sim not nonincreasing in rank")
    }
  }
}
