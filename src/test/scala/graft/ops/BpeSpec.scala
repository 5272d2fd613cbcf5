package graft.ops

import graft.SparkSpec
import graft.functions.functions.{bpe_merge_pair, bpe_segment}
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the worked example from Sennrich et al. (ACL'16), section 3.2
  private def sennrich = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    .toDF("word", "freq")

  test("train reproduces the Sennrich worked example merge order") {
    val merges = Bpe.train(sennrich, nMerges = 5)
    assert(merges == Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")))
  }

  test("driver fast path and distributed loop learn identical merges") {
    val docs = Tables.documents(spark, sfDir).limit(120)
    val words = Bpe.wordFreqs(docs)
    val driver = Bpe.train(words, nMerges = 12)
    val distributed = Bpe.train(words, nMerges = 12, driverMaxTypes = 0L)
    assert(driver == distributed)
    assert(driver.size == 12)
  }

  test("segment applies learned merges greedily by rank: lowest -> low + est</w>") {
    val merges = Bpe.train(sennrich, nMerges = 5)
    val out = Seq("lowest").toDF("w")
      .select(bpe_segment(col("w"), merges).as("s"))
      .as[Seq[String]].head()
    assert(out == Seq("low", "est</w>"))
  }

  test("segments always reassemble to the original word + marker") {
    val merges = Bpe.train(sennrich, nMerges = 5)
    val words = Seq("low", "lower", "newest", "widest", "slowest", "xyz", "w")
    val out = words.toDF("w")
      .select(col("w"), concat_ws("", bpe_segment(col("w"), merges)).as("j"))
      .as[(String, String)].collect()
    out.foreach { case (w, j) => assert(j == w + "</w>", w) }
  }

  test("merge kernel is left-to-right non-overlapping") {
    val out = Seq(Seq("a", "a", "a")).toDF("s")
      .select(bpe_merge_pair(col("s"), "a", "a"))
      .as[Seq[String]].head()
    assert(out == Seq("aa", "a"))
  }

  test("minCount stops training before memorizing singletons") {
    val words = Seq(("ab", 1L), ("cd", 1L)).toDF("word", "freq")
    assert(Bpe.train(words, nMerges = 10, minCount = 2).isEmpty)
    // with minCount=1 it merges until every word is one symbol
    val all = Bpe.train(words, nMerges = 10, minCount = 1)
    assert(all.nonEmpty && all.size <= 4)
  }

  test("segmentTokens flattens per-token subwords over a text column") {
    val merges = Bpe.train(sennrich, nMerges = 5)
    val out = Seq("low lowest").toDF("text")
      .select(Bpe.segmentTokens(col("text"), merges).as("t"))
      .as[Seq[String]].head()
    assert(out == Seq("low", "</w>", "low", "est</w>"))
  }

  test("wordFreqs counts corpus word types") {
    val docs = Seq("a b a", "b a").toDF("text")
    val f = Bpe.wordFreqs(docs).as[(String, Long)].collect().toMap
    assert(f == Map("a" -> 3L, "b" -> 2L))
  }
}
