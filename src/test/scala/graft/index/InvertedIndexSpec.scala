package graft.index

import graft.SparkSpec
import graft.text.Normalize

class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  val docs = Seq(
    (1L, "the cats meeting agreed"),
    (2L, "ponies ties cats!"),
    (3L, "agreed, meetings matting")).toDF("doc_id", "text")
  lazy val toks = Normalize.tokens(docs, stopwords = Seq("the"))

  test("term-document presence matrix matches FIXTURES.md golden") {
    val m = InvertedIndex.termDocMatrix(toks, n = 3, firstId = 1L)
      .as[(String, Seq[Int])].collect().toMap
    assert(m == Map(
      "cat" -> Seq(1, 1, 0),
      "meet" -> Seq(1, 0, 1),
      "agre" -> Seq(1, 0, 1),
      "poni" -> Seq(0, 1, 0),
      "ti" -> Seq(0, 1, 0),
      "mat" -> Seq(0, 0, 1)))
  }

  test("duplicate postings collapse (set semantics, reference :463-465)") {
    val dup = Seq((1L, "cat cat cats")).toDF("doc_id", "text")
    val m = InvertedIndex.termDocMatrix(Normalize.tokens(dup), n = 1, firstId = 1L)
      .as[(String, Seq[Int])].collect().toMap
    assert(m == Map("cat" -> Seq(1)))
  }

  test("reference byte format has the trailing comma") {
    val dup = Seq((1L, "cat"), (2L, "dog")).toDF("doc_id", "text")
    val lines = InvertedIndex.referenceFormat(
      InvertedIndex.termDocMatrix(Normalize.tokens(dup), n = 2, firstId = 1L))
      .as[(String, String)].collect().toMap
    assert(lines("cat") == "[1,0,]")
    assert(lines("dog") == "[0,1,]")
  }

  test("postings are sorted and deduped; docFreq counts distinct docs") {
    val p = InvertedIndex.postings(toks).as[(String, Seq[Long])].collect().toMap
    assert(p("cat") == Seq(1L, 2L))
    assert(p("agre") == Seq(1L, 3L))
    val df = InvertedIndex.docFreq(toks).as[(String, Long)].collect().toMap
    assert(df("cat") == 2L && df("poni") == 1L)
  }

  test("tfidf: rarer terms weigh more at equal tf") {
    val d = Seq((1L, "aa bb"), (2L, "aa cc")).toDF("doc_id", "text")
    val t = Normalize.tokens(d, stem = false)
    val w = InvertedIndex.tfidf(t, 2).as[(Long, String, Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._5).toMap
    assert(w((1L, "bb")) > w((1L, "aa")))
  }

  test("termDocMatrixFast (BitSet TypedImperativeAggregate) == termDocMatrix") {
    val slow = InvertedIndex.termDocMatrix(toks, n = 3, firstId = 1L)
      .as[(String, Seq[Int])].collect().toMap
    val fast = InvertedIndex.termDocMatrixFast(toks, n = 3, firstId = 1L)
      .as[(String, Seq[Int])].collect().toMap
    assert(fast == slow)
  }

  test("termDocMatrixFast ignores out-of-range doc ids (reference threw AIOOBE)") {
    val t = Seq((0L, "cat"), (99L, "cat")).toDF("doc_id", "term")
    val m = InvertedIndex.termDocMatrixFast(t, n = 2, firstId = 0L)
      .as[(String, Seq[Int])].collect().toMap
    assert(m == Map("cat" -> Seq(1, 0)))
  }

  test("termDocMatrixFast on the real corpus at sf0.001 matches slow path") {
    val docs = graft.ops.Tables.documents(spark, sfDir)
    val t = Normalize.tokens(docs)
    val n = docs.count().toInt
    val slow = InvertedIndex.termDocMatrix(t, n).as[(String, Seq[Int])].collect().toMap
    val fast = InvertedIndex.termDocMatrixFast(t, n).as[(String, Seq[Int])].collect().toMap
    assert(fast == slow)
  }

  test("mergePostings(delta) == full rebuild over the union") {
    val deltaDocs = Seq(
      (4L, "cats return with new ponies"),   // extends cat/poni postings
      (5L, "entirely novel words arrive"))   // new terms
      .toDF("doc_id", "text")
    val deltaToks = Normalize.tokens(deltaDocs, stopwords = Seq("the"))
    val merged = InvertedIndex.mergePostings(InvertedIndex.postings(toks), deltaToks)
      .as[(String, Seq[Long])].collect().toMap
    val rebuilt = InvertedIndex.postings(
      Normalize.tokens(docs.union(deltaDocs), stopwords = Seq("the")))
      .as[(String, Seq[Long])].collect().toMap
    assert(merged == rebuilt)
    assert(merged("cat") == Seq(1L, 2L, 4L))   // extended posting
    assert(merged("mat") == Seq(3L))           // untouched posting survives
    assert(merged.contains("novel"))           // delta-only term appears
  }

  /** Production ingest is a SEQUENCE of merges, not one: N folded
    * deltas must equal one rebuild regardless of arrival order (posting
    * union is commutative/associative, so any drift — lost sort,
    * duplicate ids, dropped terms — compounds and surfaces here).
    * Property-style: random token deltas, random fold orders.
    */
  test("mergePostings: folding N random deltas in any order == one rebuild") {
    val rng = new scala.util.Random(41)
    val vocab = Vector("ant", "bee", "cat", "dog", "eel", "fox", "gnu", "hen")
    for (trial <- 1 to 3) {
      // 4 deltas x ~10 postings; doc ids overlap across deltas so
      // set-union (not bag) semantics are exercised between merges
      val deltas = Vector.fill(4) {
        Seq.fill(10)((rng.nextInt(12).toLong, vocab(rng.nextInt(vocab.size))))
          .toDF("doc_id", "term")
      }
      val order = rng.shuffle(deltas.indices.toList)
      val folded = order.tail
        .foldLeft(InvertedIndex.postings(deltas(order.head))) {
          (idx, i) => InvertedIndex.mergePostings(idx, deltas(i))
        }
        .as[(String, Seq[Long])].collect().toMap
      val rebuilt = InvertedIndex.postings(deltas.reduce(_ unionByName _))
        .as[(String, Seq[Long])].collect().toMap
      assert(folded == rebuilt, s"trial $trial, fold order $order")
    }
  }
}
