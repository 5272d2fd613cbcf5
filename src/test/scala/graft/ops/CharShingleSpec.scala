package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Char-shingle near-dup for space-free scripts: the codepoint-n-gram
  * chain must strike a CJK near-duplicate the whitespace-token chain
  * is structurally blind to (a zh doc is ONE token), the fused codegen
  * kernel must equal the Column formulation bit-for-bit across
  * CJK/non-BMP/short/empty text, and the q211 impact report must
  * expose exactly the restored recall.
  */
class CharShingleSpec extends SparkSpec {
  import spark.implicits._

  // real CJK fixtures (the production blind spot the operator exists
  // for): b is a near-dup of a — same text with a short edit at the
  // end; c is unrelated. No whitespace anywhere, so the word chain
  // sees three 1-token docs.
  private val zhA =
    "春江潮水连海平海上明月共潮生滟滟随波千万里何处春江无月明江流宛转绕芳甸月照花林皆似霰空里流霜不觉飞汀上白沙看不见"
  private val zhB = // last 6 chars dropped — a truncation near-dup
    zhA.dropRight(6)
  private val zhC =
    "北国风光千里冰封万里雪飘望长城内外惟余莽莽大河上下顿失滔滔山舞银蛇原驰蜡象欲与天公试比高须晴日看红装素裹分外妖娆"

  private val docs = Seq(
    (1L, zhA, "zhsrc"),
    (2L, zhB, "zhsrc"),
    (3L, zhC, "zhsrc"))
    .toDF("doc_id", "text", "source")

  test("char banded chain strikes the CJK truncation dup; word chain misses it") {
    def pairs(sigs: org.apache.spark.sql.DataFrame) =
      Dedup.verifiedPairs(sigs.localCheckpoint(false))
        .as[(Long, Long)].collect().toSet
    val word = pairs(Dedup.minhashSignatures(docs))
    val char = pairs(Dedup.charMinhashSignatures(docs))
    assert(!word.contains((1L, 2L)),
      s"word chain unexpectedly paired the CJK truncation dup: $word")
    assert(char == Set((1L, 2L)),
      s"char chain must pair exactly the truncation dup, got $char")
  }

  test("exact charJaccardPairs agrees: the planted pair and only it") {
    val p = Dedup.charJaccardPairs(docs, 4)
      .as[(Long, Long)].collect().toSet
    assert(p == Set((1L, 2L)), s"exact char pairs: $p")
  }

  test("fused kernel == minhash_sig(charShingles) across CJK, non-BMP, short, empty, ascii") {
    val fixtures = Seq(
      zhA, zhB, zhC,
      "abc def ghi",        // spaces are just code points to the char chain
      "ab",                 // shorter than n: ONE gram (the whole doc)
      "",                   // empty: all-MaxValue signature
      "a",                  // single char
      "😀😁😂😃😄", // non-BMP emoji
      "é合ßcombininǵmarks")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val both = fixtures.select(
      graft.functions.functions.char_shingle_minhash(col("text"), 32, 4)
        .as("fused"),
      graft.functions.functions.minhash_sig(
        Dedup.charShingles(col("text"), 4), 32).as("column"))
      .as[(Seq[Long], Seq[Long])].collect()
    both.zipWithIndex.foreach { case ((f, c), i) =>
      assert(f == c, s"fixture $i: fused $f != column $c")
    }
    // null text: the fused kernel is null-on-null (the band chain's
    // null-signature guard drops the doc, the ShingleMinHashExpr
    // contract); the Column path yields an EMPTY gram list (the doc
    // contributes no rows once exploded) whose minhash is the
    // all-MaxValue empty-set signature — both routes mean "this doc
    // can never pair", spec-pinned so neither drifts
    val n = Seq((0L, Option.empty[String])).toDF("doc_id", "text")
      .select(
        graft.functions.functions.char_shingle_minhash(col("text"), 32, 4),
        Dedup.charShingles(col("text"), 4))
      .collect().head
    assert(n.isNullAt(0), "fused kernel must be null on null text")
    assert(n.getSeq[String](1) == Seq.empty,
      "column path must yield an empty gram list on null text")
  }

  test("charShingles column semantics: sliding codepoint windows, min-1-window") {
    val got = Seq((1L, "abcde"), (2L, "ab"), (3L, ""))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.charShingles(col("text"), 3).as("g"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) == Seq("abc", "bcd", "cde"))
    assert(got(2L) == Seq("ab"))
    assert(got(3L) == Seq.empty)
  }

  test("q212 calibration: the CJK truncation pair is audited, estimate tracks exact") {
    val rows = NonOracle.charMinhashCalibration(docs)
      .as[(Long, Long, Long, Double, Long, Long, Double, Double)]
      .collect().toSeq
    val pair = rows.find(r => r._1 == 1L && r._2 == 2L)
    assert(pair.isDefined, s"truncation pair missing from the audit: $rows")
    val p = pair.get
    assert(p._7 >= 0.7, s"exact char Jaccard unexpectedly low: $p")
    // 32 slots: deterministic per fixture; a drift past 0.25 means the
    // kernel or the band derivation changed, not noise
    assert(p._8 <= 0.25, s"estimate off exact by more than 0.25: $p")
    assert(p._4 === p._3.toDouble / 32.0)
    assert(rows.forall(r => r._5 <= r._6), "intersection must bound union")
    // the unrelated doc must never audit as a high-Jaccard pair
    assert(rows.filter(r => r._2 == 3L || r._1 == 3L).forall(_._7 < 0.7), rows)
  }

  test("q211 impact report: gained pairs on the space-free corpus, no lost pairs") {
    val rep = Dedup.q211.build(spark, sfDir)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(rep.nonEmpty)
    val gained = rep.map(_._4).sum
    assert(gained > 0,
      s"planted truncation dups must be char-only gains, got $rep")
    // a word pair is a byte-identical blob pair -> char Jaccard 1:
    // losses are structurally impossible
    assert(rep.forall(_._5 == 0L), s"impossible word-only pairs: $rep")
    // every char count dominates its word count
    assert(rep.forall(r => r._3 >= r._2), s"char must dominate word: $rep")
  }
}
