package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental HLL state maintenance (q106): merged sketch state must
  * estimate identically to a full rebuild (HLL union is register-wise
  * max — lossless for a fixed lgConfigK), and the estimate must track
  * exact distinct counts within the lgK=12 error regime.
  */
class SketchMergeSpec extends SparkSpec {
  import spark.implicits._

  private def terms = Tables.documents(spark, sfDir)
    .select(col("source"), col("doc_id"),
      explode(TextAnalytics.toks(col("text"))).as("term"))

  test("merge of split-batch sketches estimates identically to a full rebuild") {
    val hist = Sketches.distinctSketch(terms.filter(col("doc_id") < 250), "source", "term")
    val delta = Sketches.distinctSketch(terms.filter(col("doc_id") >= 250), "source", "term")
    val merged = Sketches.estimates(
      Sketches.mergeSketchStates(hist, delta, "source"), "source")
      .as[(String, Long)].collect().toMap
    val full = Sketches.estimates(
      Sketches.distinctSketch(terms, "source", "term"), "source")
      .as[(String, Long)].collect().toMap
    assert(merged == full)
    assert(merged.nonEmpty)
  }

  test("null-key sketch groups merge to ONE row (null-safe join), matching a rebuild") {
    val base = Seq((Some("a"), "t1"), (None, "t1"), (None, "t2"))
      .toDF("k", "term")
    val delta = Seq((Some("a"), "t3"), (None, "t3"), (None, "t4"))
      .toDF("k", "term")
    val merged = Sketches.estimates(
      Sketches.mergeSketchStates(
        Sketches.distinctSketch(base, "k", "term"),
        Sketches.distinctSketch(delta, "k", "term"), "k"), "k")
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1))
    assert(merged.count(_._1.isEmpty) == 1,
      "null-key groups must merge to one row, not two half-covering rows")
    val full = Sketches.estimates(
      Sketches.distinctSketch(base.unionByName(delta), "k", "term"), "k")
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(merged.toMap == full)
  }

  test("keys present in only one state pass through the merge") {
    val hist = Sketches.distinctSketch(
      Seq(("a", "x"), ("a", "y")).toDF("k", "v"), "k", "v")
    val delta = Sketches.distinctSketch(
      Seq(("b", "z")).toDF("k", "v"), "k", "v")
    val est = Sketches.estimates(
      Sketches.mergeSketchStates(hist, delta, "k"), "k")
      .as[(String, Long)].collect().toMap
    assert(est == Map("a" -> 2L, "b" -> 1L))
  }

  test("estimates track exact distinct counts within the lgK=12 regime") {
    val est = Sketches.estimates(
      Sketches.distinctSketch(terms, "source", "term"), "source")
      .as[(String, Long)].collect().toMap
    val exact = terms.groupBy(col("source"))
      .agg(countDistinct(col("term")).as("n"))
      .as[(String, Long)].collect().toMap
    est.foreach { case (k, e) =>
      val rel = math.abs(e - exact(k)).toDouble / exact(k)
      assert(rel <= 0.05, s"$k: est=$e exact=${exact(k)} rel=$rel")
    }
  }
}
