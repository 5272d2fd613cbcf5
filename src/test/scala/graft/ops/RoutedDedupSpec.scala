package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Script-routed dedup: a mixed-script corpus must route CJK-dense
  * docs to the char-gram chain and spaced text to the word chain in
  * ONE pass, catch near-dups on BOTH sides, and never propose a
  * cross-script candidate — the action q129's detection enables.
  */
class RoutedDedupSpec extends SparkSpec {
  import spark.implicits._

  private val enA =
    "the quick brown fox jumps over the lazy dog near the river bank today"
  private val enB = // truncation dup: shingle sets nest, Jaccard ~0.83
    "the quick brown fox jumps over the lazy dog near the river"
  private val zhA =
    "春江潮水连海平海上明月共潮生滟滟随波千万里何处春江无月明江流宛转绕芳甸月照花林皆似霰空里流霜不觉飞汀上白沙看不见"
  private val zhB = zhA.dropRight(6) // char-chain truncation near-dup
  private val zhC =
    "北国风光千里冰封万里雪飘望长城内外惟余莽莽大河上下顿失滔滔山舞银蛇原驰蜡象欲与天公试比高须晴日看红装素裹分外妖娆"

  private val docs = Seq(
    (1L, enA), (2L, enB), (3L, zhA), (4L, zhB), (5L, zhC),
    (6L, "completely unrelated english text about telescopes and comets tonight"))
    .toDF("doc_id", "text")

  test("routing: CJK-dense docs take the char kernel, spaced text the word kernel") {
    val routes = Dedup.scriptRoutedSignatures(docs)
      .select(col("doc_id"), col("route"))
      .as[(Long, String)].collect().toMap
    assert(Seq(1L, 2L, 6L).forall(routes(_) == "word"), routes)
    assert(Seq(3L, 4L, 5L).forall(routes(_) == "char"), routes)
    // the char-routed signature equals the char kernel's, the
    // word-routed the word kernel's — routing picks, never mixes
    val routed = Dedup.scriptRoutedSignatures(docs)
      .select(col("doc_id"), col("mh")).as[(Long, Seq[Long])].collect().toMap
    val word = Dedup.minhashSignatures(docs)
      .as[(Long, Seq[Long])].collect().toMap
    val char = Dedup.charMinhashSignatures(docs)
      .as[(Long, Seq[Long])].collect().toMap
    assert(routed(1L) == word(1L) && routed(3L) == char(3L))
  }

  test("routed chain verifies near-dups on BOTH scripts, nothing cross-script") {
    val sigs = Dedup.scriptRoutedSignatures(docs).localCheckpoint(false)
    val verified = Dedup.verifyCandidates(
      Dedup.scriptRoutedCandidates(docs), sigs.drop("route"))
      .as[(Long, Long)].collect().toSet
    assert(verified == Set((1L, 2L), (3L, 4L)),
      s"routed chain must strike the en pair and the zh pair only: $verified")
    // control: the unrouted word chain is blind to the zh pair
    val wordOnly = Dedup.verifiedPairs(
      Dedup.minhashSignatures(docs).localCheckpoint(false))
      .as[(Long, Long)].collect().toSet
    assert(!wordOnly.contains((3L, 4L)),
      s"word chain unexpectedly caught the CJK pair: $wordOnly")
  }

  test("routedPairReport: plants recovered per route, zero cross-script pairs") {
    val corpus = Seq(
      (1L, enA), (100001L, enA.split(" ").dropRight(2).mkString(" ")),
      (3L, zhA), (100003L, zhB),
      (5L, "totally different english words about sailing ships and harbors"),
      (7L, zhC))
      .toDF("doc_id", "text")
    val rep = Dedup.routedPairReport(corpus)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(rep == Seq(
      ("char", 3L, 1L, 1L),
      ("word", 3L, 1L, 1L)),
      s"each route must hold 3 docs, 1 pair, 1 recovered plant: $rep")
  }

  test("null/empty text never becomes a candidate; bands are route-disjoint") {
    val withJunk = docs.unionByName(
      Seq((7L, null.asInstanceOf[String]), (8L, "")).toDF("doc_id", "text"))
    val cand = Dedup.scriptRoutedCandidates(withJunk)
      .as[(Long, Long)].collect().toSet
    // null word-kernel sig is null (dropped by the band guard); empty
    // text yields the all-MaxValue sig — it may only ever pair with
    // another empty doc, and there is none here
    assert(cand.forall { case (a, b) => a <= 6L && b <= 6L }, cand)
    val bands = Dedup.bandsFromSignatures(
      Dedup.scriptRoutedSignatures(withJunk), keep = Seq("route"))
    val byRoute = bands.groupBy(col("route"))
      .agg(countDistinct(col("doc_id")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(byRoute("word") == 4L && byRoute("char") == 3L, byRoute.toString)
  }
}
