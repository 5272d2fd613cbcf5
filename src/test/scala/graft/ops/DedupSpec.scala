package graft.ops

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy dog near the river edge"), // near dup of 0
    (3L, "completely different content about spark query engines and shuffles"),
    (4L, "another unrelated text mentioning parquet files and column pruning"))
    .toDF("doc_id", "text")

  test("minhashCandidates finds exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.minhashCandidates(docs, nHashes = 32, bandSize = 4)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), s"exact dup pair missing from $pairs")
    assert(!pairs.contains((3L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhashPairs: identical docs at hamming 0; unrelated docs not paired") {
    val pairs = Dedup.simhashPairs(docs, maxHamming = 10)
      .as[(Long, Long, Int)].collect()
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m.get((0L, 1L)).contains(0))
    assert(!m.contains((0L, 3L)) || m((0L, 3L)) > 10)
  }

  test("shingles produces n-grams in order") {
    val s = docs.filter($"doc_id" === 3L)
      .select(Dedup.shingles($"text", 3)).as[Seq[String]].head()
    assert(s.head == "completely different content")
    assert(s.contains("spark query engines"))
  }

  test("saltedSumAgg equals plain aggregation") {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, 10.0), (1L, 20.0), (2L, 5.0), (1L, 30.0)).toDF("k", "v")
    val salted = Skew.saltedSumAgg(df, col("k"), buckets = 4,
      ("total", sum(col("v"))), ("cnt", count(lit(1))))
      .select("key", "total", "cnt").as[(Long, Double, Long)].collect()
      .map { case (k, t, c) => k -> (t, c) }.toMap
    assert(salted == Map(1L -> (60.0, 3L), 2L -> (5.0, 1L)))
  }

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
