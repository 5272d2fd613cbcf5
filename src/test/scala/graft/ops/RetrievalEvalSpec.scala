package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q200 retrieval-eval harness: structural invariants of the metric
  * machinery over the fixture corpus (the value-level correctness is
  * the full-replay DuckDB oracle). recall/ndcg are bounded, DCG never
  * beats the ideal, and the relevance set is system-independent.
  */
class RetrievalEvalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = NonOracle.retrievalEval(spark, sfDir).collect()

  test("three systems x five queries, metrics bounded, dcg <= idcg") {
    assert(rows.length == 15, s"expected 15 rows, got ${rows.length}")
    assert(rows.map(_.getString(0)).toSet == Set("tfidf", "bm25", "rrf"))
    rows.foreach { r =>
      val (nRel, nHits) = (r.getLong(2), r.getLong(3))
      val recall = r.getDouble(4)
      val (dcg, idcg) = (r.getLong(5), r.getLong(6))
      val ndcg = r.getDouble(7)
      assert(nHits <= math.min(nRel, 10L), "hits bounded by relevant and k")
      assert(recall >= 0.0 && recall <= 1.0, s"recall $recall out of range")
      assert(dcg >= 0L && dcg <= idcg,
        s"DCG $dcg must not beat the ideal $idcg")
      assert(ndcg >= 0.0 && ndcg <= 1.0, s"ndcg $ndcg out of range")
      if (nRel > 0) assert(recall == nHits.toDouble / nRel.toDouble)
    }
  }

  test("the relevance set is system-independent (same n_rel and idcg per query)") {
    rows.groupBy(_.getLong(1)).foreach { case (qid, rs) =>
      assert(rs.map(_.getLong(2)).distinct.length == 1,
        s"qid $qid: n_rel differs across systems")
      assert(rs.map(_.getLong(6)).distinct.length == 1,
        s"qid $qid: idcg differs across systems")
    }
  }

  test("the per-rank micro discount is the pinned single-rounded table") {
    // w_r = round(1e6 ln2 / ln(r+1)): spot-check anchors a drifted
    // formula would miss (r=1 exactly 1e6; weights strictly decrease)
    def w(r: Int): Long =
      math.round(1e6 * math.log(2.0) / math.log(r + 1.0))
    assert(w(1) == 1000000L)
    (1 until 10).foreach(r => assert(w(r) > w(r + 1), s"w not decreasing at $r"))
  }
}
