package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q203 DoReMi-style domain reweighting: normalization, monotonicity
  * in excess loss, the eta=0 no-op identity, and the exact-integer
  * consistency of the per-source rollup with q189's per-doc scores.
  */
class DoremiSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir)
  private lazy val out = CurationOps.doremiWeights(docs)
    .select(col("source"), col("n_bigrams"), col("kn_sum_micro"),
      col("excess"), col("doremi_weight"), col("boost"))
    .as[(String, Long, Long, Double, Double, Double)].collect()

  test("weights are a distribution and boosts are monotone in excess loss") {
    assert(out.nonEmpty)
    val sum = out.sortBy(_._1).map(_._5).sum
    assert(math.abs(sum - 1.0) < 1e-9, s"weight sum $sum != 1")
    out.foreach { case (s, _, _, _, w, _) =>
      assert(w > 0.0 && w < 1.0, s"source $s weight $w out of (0,1)")
    }
    // higher excess (harder for the LM) must never get a lower boost
    val byExcess = out.sortBy(_._4)
    byExcess.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._6 <= b._6 + 1e-12,
          s"boost not monotone: ${a._1}(${a._4})=${a._6} > ${b._1}(${b._4})=${b._6}")
      case _ =>
    }
  }

  test("eta = 0 is the no-op mixture: every boost exactly 1, weights = token shares") {
    val zero = CurationOps.doremiWeights(docs, eta = 0.0)
      .select(col("source"), col("n_tokens"), col("doremi_weight"), col("boost"))
      .as[(String, Long, Double, Double)].collect()
    val totTok = zero.map(_._2).sum
    zero.foreach { case (s, nt, w, b) =>
      // sigma(0) = 0.5 cancels algebraically; in floats the
      // normalizer is the fold of the ROUNDED shares, which need not
      // sum to exactly 1.0 on every fixture — so tolerance, not ==
      assert(math.abs(b - 1.0) < 1e-12, s"source $s boost $b != 1 at eta=0")
      assert(math.abs(w - nt.toDouble / totTok) < 1e-12)
    }
  }

  test("per-source integer rollup equals the sum of q189 per-doc scores") {
    val perDoc = TextAnalytics.knBigramLogProb(docs)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(sum(col("n_bigrams")).as("nb"), sum(col("kn_sum_micro")).as("s"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    out.foreach { case (s, nb, micro, _, _, _) =>
      assert(perDoc(s) == ((nb, micro)),
        s"source $s rollup ($nb, $micro) != per-doc sum ${perDoc(s)}")
    }
  }
}
