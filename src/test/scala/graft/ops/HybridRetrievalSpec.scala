package graft.ops

import graft.SparkSpec

/** q188 hybrid RRF fusion: structural and arithmetic invariants of the
  * fused shortlist on the fixture (the two arms themselves are gated
  * by their own suites — BM25 by the q115 oracle, stub-embedding kNN
  * by MultimodalSpec/q57 — so this spec pins what FUSION adds).
  */
class HybridRetrievalSpec extends SparkSpec {

  private lazy val fused =
    NonOracle.q188.build(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getDouble(4), r.getInt(5)))

  test("q188: every query doc gets a shortlist; self never retrieved; ranks contiguous") {
    val byQ = fused.groupBy(_._1)
    assert(byQ.keySet == (0L until 5L).toSet, "one shortlist per query doc")
    byQ.foreach { case (qid, rows) =>
      assert(rows.forall(_._2 != qid), s"q$qid: self must be excluded")
      val rnks = rows.map(_._6).sorted.toSeq
      assert(rnks == (1 to rows.length), s"q$qid: fused ranks contiguous")
      rows.foreach { r =>
        assert(r._3.isDefined || r._4.isDefined,
          s"q$qid/${r._2}: a fused candidate must come from some arm")
      }
      // per-arm ranks are each contiguous from 1 over their presences
      // ONLY as sets (an arm's rank k candidate may fall out of the
      // fused top-10); presences must at least be distinct and >= 1
      Seq(rows.flatMap(_._3), rows.flatMap(_._4)).foreach { arm =>
        assert(arm.distinct.length == arm.length && arm.forall(_ >= 1))
      }
    }
  }

  test("q188: rrf recomputes from the arm ranks and orders the shortlist") {
    fused.groupBy(_._1).foreach { case (qid, rows) =>
      rows.foreach { case (_, cid, rs, rd, rrf, _) =>
        val expect = rs.map(r => 1.0 / (60.0 + r)).getOrElse(0.0) +
          rd.map(r => 1.0 / (60.0 + r)).getOrElse(0.0)
        assert(rrf == expect, s"q$qid/$cid: rrf must be the literal sum")
      }
      val inOrder = rows.sortBy(_._6).toSeq
      inOrder.sliding(2).foreach { pair =>
        if (pair.length == 2) {
          val (a, b) = (pair(0), pair(1))
          assert(a._5 > b._5 || (a._5 == b._5 && a._2 < b._2),
            s"q$qid: fused order must be (rrf desc, cid)")
        }
      }
      // a doc top-ranked in BOTH arms must be fused rank 1
      inOrder.find(r => r._3.contains(1L) && r._4.contains(1L)).foreach { r =>
        assert(r._6 == 1, s"q$qid: double rank-1 candidate must fuse first")
      }
    }
  }
}
