package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q206 BM25 tuning curve: the sweep's default grid point must agree
  * with q200's bm25 row EXACTLY (same engine, same metrics — the
  * cross-query consistency that makes the curve trustworthy), and the
  * tau columns must hold their combinatorial invariants.
  */
class Bm25TuningSpec extends SparkSpec {
  import spark.implicits._

  private lazy val sweep = NonOracle.q206.build(spark, sfDir)
    .select(col("system"), col("qid"), col("n_rel"), col("n_hits"),
      col("recall"), col("dcg_micro"), col("idcg_micro"), col("ndcg"),
      col("n_pairs"), col("n_conc"), col("n_disc"), col("tau"))
    .as[(String, Long, Long, Long, Double, Long, Long, Double,
         Long, Long, Long, Double)].collect()

  test("grid covers 6 points x 5 queries; default point == q200's bm25 row") {
    assert(sweep.length == NonOracle.bm25Grid.length * 5)
    val q200bm = NonOracle.q200.build(spark, sfDir)
      .filter(col("system") === "bm25")
      .select(col("qid"), col("n_rel"), col("n_hits"), col("recall"),
        col("dcg_micro"), col("idcg_micro"), col("ndcg"))
      .as[(Long, Long, Long, Double, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val defaultRows = sweep.filter(_._1 == "bm25_k1=1.2_b=0.75")
    assert(defaultRows.length == 5)
    defaultRows.foreach { r =>
      val e = q200bm(r._2)
      assert((r._3, r._4, r._5, r._6, r._7, r._8) ==
        ((e._2, e._3, e._4, e._5, e._6, e._7)),
        s"qid ${r._2}: sweep default ${r} != q200 bm25 $e")
    }
  }

  test("tau invariants: |tau| <= 1, pairs = C(k,2), conc+disc <= pairs") {
    // Expected pairs per query derived from the DATA, not the fixture
    // literal 45: an arm ranks m = min(k, nScored - 1) candidates
    // (every doc sharing >= 1 query term is scored; self is always
    // scored — the query's terms are its own — and always dropped), so
    // n_pairs = C(m, 2). On a corpus where a query has fewer than k+1
    // scored candidates the arm is legitimately short and the code's
    // LEFT-join defaults handle it; the assertion must follow.
    import org.apache.spark.sql.expressions.Window
    val tokens = Tables.documents(spark, sfDir).select(col("doc_id"),
      explode(TextAnalytics.toks(col("text"))).as("term"))
    val tf = tokens.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("tf").desc, col("term"))
    // the shared eval operating point (NonOracle.EvalNQ/EvalNTerms/
    // EvalK), not re-hardcoded literals: if the constants move, this
    // spec must keep testing the operating point the oracles run
    val queries = tf.filter(col("doc_id") < NonOracle.EvalNQ)
      .select(col("doc_id").as("qid"), col("term"), col("tf"))
      .withColumn("r", row_number().over(wq))
      .filter(col("r") <= NonOracle.EvalNTerms)
      .select(col("qid"), col("term"))
    val expPairs = tokens.select(col("doc_id"), col("term")).distinct()
      .join(queries, "term")
      .select(col("qid"), col("doc_id")).distinct()
      .groupBy(col("qid")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect()
      .map { case (q, nScored) =>
        val m = math.min(NonOracle.EvalK.toLong, nScored - 1)
        q -> m * (m - 1) / 2
      }.toMap
    sweep.foreach { case (sys, qid, _, _, _, _, _, _, np, nc, nd, tau) =>
      assert(np == expPairs(qid),
        s"$sys/$qid: n_pairs $np != C(min(EvalK, nScored-1), 2) = ${expPairs(qid)}")
      assert(nc + nd <= np, s"$sys/$qid: conc $nc + disc $nd > pairs $np")
      assert(math.abs(tau) <= 1.0)
      if (np > 0) assert(tau == (nc - nd).toDouble / np.toDouble)
      else assert(tau == 0.0)
    }
    // the sweep must actually discriminate somewhere on this fixture
    // (tau varies across grid points — the reason the column exists)
    val bySys = sweep.groupBy(_._1).view.mapValues(_.map(_._12).sum).toMap
    assert(bySys.values.toSet.size > 1,
      s"tau failed to discriminate any grid point: $bySys")
  }
}
