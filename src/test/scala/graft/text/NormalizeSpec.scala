package graft.text

import graft.SparkSpec

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("tokenize -> strip punct -> stopwords -> stem (golden micro-corpus)") {
    // FIXTURES.md §A: 3 docs, stopword "the"
    val docs = Seq(
      (1L, "the cats meeting agreed"),
      (2L, "ponies ties cats!"),
      (3L, "agreed, meetings matting")).toDF("doc_id", "text")
    val out = Normalize.tokens(docs, stopwords = Seq("the"))
      .as[(Long, String)].collect().toSet
    assert(out == Set(
      (1L, "cat"), (1L, "meet"), (1L, "agre"),
      (2L, "poni"), (2L, "ti"), (2L, "cat"),
      (3L, "agre"), (3L, "meet"), (3L, "mat")))
  }

  test("punctuation-only tokens dropped; stopword match is pre-stem") {
    val docs = Seq((1L, "... the-cat runs! runs")).toDF("doc_id", "text")
    // "the-cat" -> punct strip -> "thecat": NOT a stopword ("the" is)
    val out = Normalize.tokens(docs, stopwords = Seq("the", "runs"))
      .as[(Long, String)].collect().toList
    // "runs" is a stopword pre-stem so both occurrences drop;
    // "..." strips to empty and drops; "the-cat" -> thecat (stemmed)
    assert(out == List((1L, "thecat")))
  }

  test("duplicate (term, doc) postings preserved in tokens (set semantics applied at index build)") {
    val docs = Seq((1L, "cat cat cats")).toDF("doc_id", "text")
    val out = Normalize.tokens(docs).as[(Long, String)].collect().toList
    assert(out == List((1L, "cat"), (1L, "cat"), (1L, "cat")))
  }

  test("stopword filter by broadcast anti-join") {
    val toks = Seq((1L, "cat"), (1L, "dog"), (2L, "cat")).toDF("doc_id", "term")
    val stops = Seq("cat").toDF("w")
    val out = Normalize.dropStopwordsByJoin(toks, stops)
      .as[(Long, String)].collect().toList
    assert(out == List((1L, "dog")))
  }
}
