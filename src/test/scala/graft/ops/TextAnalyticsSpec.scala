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
