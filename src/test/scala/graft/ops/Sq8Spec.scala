package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Quality gates for the SQ8 quantizer (q149) and the IVF-SQ8 serving
  * path (q150) — the oracle proves cross-engine determinism; these
  * prove the numbers are USEFUL:
  *  - the per-component reconstruction error is bounded by half a
  *    quantization step, range/(2*254) — the defining property of
  *    half-up rounding to 255 levels; a formula regression (wrong
  *    scale, truncation instead of rounding) doubles it;
  *  - IVF-SQ8 top-3 must recover most of the exact brute-force top-3
  *    (3-probe over 8 cells, measured 0.9 at this fixture; gated at
  *    0.7 to absorb fixture regeneration).
  */
class Sq8Spec extends SparkSpec {

  test("q149 reconstruction error <= half a quantization step per dimension") {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val widest = emb.select(posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("dim")).agg((max(col("x")) - min(col("x"))).as("range"))
      .agg(max(col("range"))).head().getDouble(0)
    val maxErr = Similarity.q149.build(spark, sfDir)
      .agg(max(col("err_max"))).head().getDouble(0)
    val bound = widest / (2.0 * 254.0) * (1.0 + 1e-9)
    assert(maxErr <= bound,
      s"SQ8 err_max $maxErr exceeds the half-step bound $bound")
  }

  test("q150 IVF-SQ8 top-3 recalls >= 0.7 of exact brute-force top-3") {
    val ivf = Similarity.q150.build(spark, sfDir)
      .select(col("qid"), col("cid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val exact = Similarity.bruteForceKnn(
      emb.filter(col("vec_id") < 10).toDF("qid", "qv"), emb, 3)
      .select(col("qid"), col("cid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf & exact).size.toDouble / exact.size
    assert(recall >= 0.7, s"IVF-SQ8 recall@3 = $recall (pairs: $ivf vs $exact)")
  }
}
