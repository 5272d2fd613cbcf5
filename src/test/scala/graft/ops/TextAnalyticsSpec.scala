package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("langId: zero-signal docs resolve to the first profile, not lex-max") {
    val d = Seq((1L, "xyzzy qwerty", "en")).toDF("doc_id", "text", "lang")
    val out = TextAnalytics.langId(d)
      .select("predicted_lang").as[String].head()
    assert(out == "en")
  }

  test("q109 quality classifier: score strictly increasing in z, bounded (0,1), keep = score>=0.5") {
    val out = TextAnalytics.q109.build(spark, sfDir)
      .select("z", "score", "keep").as[(Double, Double, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (z, s, k) =>
      assert(s > 0.0 && s < 1.0, s"score $s out of (0,1)")
      assert(s == 0.5 + 0.5 * (z / (1.0 + math.abs(z))), "squash formula drift")
      assert(k == (if (s >= 0.5) 1L else 0L))
    }
    // monotone: sort by z, scores must be non-decreasing (rational
    // sigmoid is strictly increasing; equal z -> equal score)
    val byZ = out.sortBy(_._1).map(_._2)
    assert(byZ.zip(byZ.tail).forall { case (a, b) => a <= b })
    // the gate actually separates: both classes present on the fixture
    assert(out.exists(_._3 == 1L) && out.exists(_._3 == 0L))
  }

  test("bigramLogProb: hand-computed add-one bigram LM, position-order fold") {
    val d = Seq(
      (1L, "a b a b"), // bigrams (a,b) (b,a) (a,b)
      (2L, "a b c"),   // bigrams (a,b) (b,c)
      (3L, "x"))       // under the window: n=0, avg=0
      .toDF("doc_id", "text")
    // V=4; c(a,b)=3 c(b,a)=1 c(b,c)=1; contexts c1(a)=3 c1(b)=2
    def lp(c12: Long, c1: Long): Double = {
      val raw = math.log((c12 + 1.0) / (c1 + 4.0))
      BigDecimal(raw).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val ab = lp(3, 3); val ba = lp(1, 2); val bc = lp(1, 2)
    val out = TextAnalytics.bigramLogProb(d)
      .orderBy(col("doc_id")).as[(Long, Long, Double)].collect()
    assert(out(0) == ((1L, 3L, (0.0 + ab + ba + ab) / 3.0)))
    assert(out(1) == ((2L, 2L, (0.0 + ab + bc) / 2.0)))
    assert(out(2) == ((3L, 0L, 0.0)))
    // repartitioning the corpus does not move a single bit
    val rep = TextAnalytics.bigramLogProb(d.repartition(5))
      .orderBy(col("doc_id")).as[(Long, Long, Double)].collect()
    assert(out.toSeq == rep.toSeq)
  }

  test("langId: CJK text predicted zh; function words predict their language") {
    val d = Seq(
      (1L, "\u4e2d\u6587\u6587\u672c\u5904\u7406", "zh"),
      (2L, "der hund und die katze ist da", "de"),
      (3L, "the cat and the dog of the house", "en")).toDF("doc_id", "text", "lang")
    val out = TextAnalytics.langId(d)
      .select("doc_id", "predicted_lang").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "zh", 2L -> "de", 3L -> "en"))
  }
}
