package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q196 cross-modal consistency: planted pairs land in the right cell
  * of the paired-modality matrix. Image near-dup-ness rides the q177
  * synthetic-pattern fixture (doc_id % 50 selects the pattern, spec-
  * pinned in MultimodalSpec: same pattern ≤ 10 hamming, cross-pattern
  * above); text near-dup-ness is the MinHash slot-agreement criterion
  * over the planted texts.
  */
class CrossModalSpec extends SparkSpec {
  import spark.implicits._

  test("planted pairs classify as both_dup / image_only / text_only") {
    // ids 1 & 51: same image pattern (1 mod 50), DISJOINT texts
    // ids 2 & 3: different patterns, IDENTICAL texts
    // ids 4 & 54: same pattern (4 mod 50) AND identical texts
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (51L, "zeta eta theta iota kappa"),
      (2L, "lambda mu nu xi omicron pi rho"),
      (3L, "lambda mu nu xi omicron pi rho"),
      (4L, "sigma tau upsilon phi chi"),
      (54L, "sigma tau upsilon phi chi")
    ).toDF("doc_id", "text")
    val out = NonOracle.crossModalConsistency(spark, docs)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == Set("both_dup", "image_only", "text_only"),
      s"unexpected classes: ${out.keySet}")
    assert(out("image_only") == (1L, 2L), s"1-51 must be image_only: $out")
    assert(out("text_only") == (1L, 2L), s"2-3 must be text_only: $out")
    assert(out("both_dup") == (1L, 2L), s"4-54 must be both_dup: $out")
  }

  test("a NULL-text doc can only surface through the image arm") {
    // 5 & 55 share a pattern; 55 has no caption at all
    val docs = Seq(
      (5L, Some("words that never repeat anywhere else")),
      (55L, Option.empty[String])
    ).toDF("doc_id", "text")
    val out = NonOracle.crossModalConsistency(spark, docs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("image_only" -> 1L),
      s"caption-absent must classify image_only: $out")
  }
}
