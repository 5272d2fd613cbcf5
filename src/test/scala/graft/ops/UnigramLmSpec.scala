package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private def mapOf(vs: (String, Long)*): java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    vs.foreach { case (p, lp) => m.put(p, java.lang.Long.valueOf(lp)) }
    m
  }

  private def seg(w: String, vs: (String, Long)*): Option[(Long, Long)] =
    Option(UnigramLm.segment(UTF8String.fromString(w), mapOf(vs: _*), UnigramLm.MaxPiece))
      .map(r => (r.getLong(0), r.getLong(1)))

  /** Exhaustive reference: enumerate EVERY segmentation into vocab
    * pieces of length <= MaxPiece, pick max total score, ties to the
    * segmentation whose FINAL piece is longest, recursively (the DP's
    * local rule applied from the end).
    */
  private def brute(w: String, vocab: Map[String, Long]): Option[(Long, Long)] = {
    if (w.isEmpty) return Some((0L, 0L))
    val cands = (1 to math.min(UnigramLm.MaxPiece, w.length)).flatMap { l =>
      val piece = w.substring(w.length - l)
      vocab.get(piece).flatMap(lp =>
        brute(w.substring(0, w.length - l), vocab)
          .map { case (n, s) => (l.toLong, n + 1L, s + lp) })
    }
    if (cands.isEmpty) None
    // max score, then longest final piece (candidates differ in l)
    else Some(cands.maxBy(c => (c._3, c._1)) match { case (_, n, s) => (n, s) })
  }

  test("Viterbi kernel matches exhaustive enumeration on random words and vocabs") {
    val rnd = new scala.util.Random(11)
    val alpha = "abc"
    (1 to 300).foreach { _ =>
      val w = (1 to (1 + rnd.nextInt(9))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      // random vocab: all chars + random multi-grams with random
      // integer scores (negative, micro-nat-like)
      val pieces = alpha.map(_.toString) ++
        (1 to 6).map(_ => (1 to (2 + rnd.nextInt(3)))
          .map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
      val vocab = pieces.distinct
        .map(p => p -> -(100000L + rnd.nextInt(3000000).toLong)).toMap
      val got = seg(w, vocab.toSeq: _*)
      val want = brute(w, vocab)
      assert(got == want, s"word '$w' vocab $vocab: kernel $got != brute $want")
    }
  }

  test("Viterbi beats greedy longest-match when the prefix piece traps it") {
    // greedy longest-first reads 'aba'+'b' = -11; the DP finds
    // 'ab'+'ab' = -4
    val got = seg("abab",
      "a" -> -6L, "b" -> -10L, "ab" -> -2L, "aba" -> -1L)
    assert(got.contains((2L, -4L)), s"expected ab+ab at -4, got $got")
  }

  test("tie rule: equal scores resolve to the longer final piece") {
    // 'ab' as one piece scores -4; 'a'+'b' also -4 (=-2 + -2): the
    // kernel must report ONE piece (the longer final piece wins)
    val got = seg("ab", "a" -> -2L, "b" -> -2L, "ab" -> -4L)
    assert(got.contains((1L, -4L)), s"tie must prefer the longer piece: $got")
  }

  test("unsegmentable word returns null; empty segments to zero pieces") {
    assert(seg("xyz", "a" -> -1L).isEmpty)
    assert(seg("", "a" -> -1L).contains((0L, 0L)))
  }

  test("q192 rollup: fertility bounded by 1..word-length, all sources present, lp negative") {
    val out = UnigramLm.unigramSegmentation(Tables.documents(spark, sfDir))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nw, npc, ppw, sum, mean) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getDouble(5))
      assert(nw > 0 && npc >= nw,
        "every word is at least one piece")
      assert(ppw >= 1.0, s"fertility $ppw below 1")
      assert(sum < 0 && mean < 0.0, "log-probs must be negative")
    }
    // with a 64-piece multi vocab over this corpus's frequent words,
    // segmentation must do better than characters: fertility strictly
    // below the mean word length
    val avgLen = Tables.documents(spark, sfDir)
      .select(explode(TextAnalytics.toks(col("text"))).as("w"))
      .agg(avg(length(col("w")))).head().getDouble(0)
    out.foreach(r => assert(r.getDouble(3) < avgLen,
      s"fertility ${r.getDouble(3)} not below the character baseline $avgLen"))
  }

  test("q194 comparison: both fertilities in [1, char baseline], ratio consistent") {
    val rows = UnigramLm.tokenizerComparison(Tables.documents(spark, sfDir))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, nb, nu) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (fb, fu, ratio) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(nw > 0 && nb >= nw && nu >= nw,
        "every word costs at least one unit in both families")
      assert(fb >= 1.0 && fu >= 1.0)
      assert(ratio == nu.toDouble / nb.toDouble,
        "the ratio column must be the single division of the exact counts")
    }
  }

  private def pieces(w: String, vs: (String, Long)*): Option[Seq[String]] =
    Option(UnigramLm.segmentPieces(UTF8String.fromString(w), mapOf(vs: _*),
      UnigramLm.MaxPiece))
      .map(_.toSeq[UTF8String](
        org.apache.spark.sql.types.StringType).map(_.toString))

  test("segmentPieces is segment() materialized: same count, score re-derives, concat == word") {
    val rnd = new scala.util.Random(23)
    val alpha = "abc"
    (1 to 300).foreach { _ =>
      val w = (1 to (1 + rnd.nextInt(9))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val vocabPieces = alpha.map(_.toString) ++
        (1 to 6).map(_ => (1 to (2 + rnd.nextInt(3)))
          .map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
      val vocab = vocabPieces.distinct
        .map(p => p -> -(100000L + rnd.nextInt(3000000).toLong)).toMap
      val ps = pieces(w, vocab.toSeq: _*)
      val cnt = seg(w, vocab.toSeq: _*)
      assert(ps.isDefined == cnt.isDefined, s"'$w': null-ness diverged")
      (ps, cnt) match {
        case (Some(pp), Some((n, s))) =>
          assert(pp.mkString("") == w, s"'$w': pieces $pp do not concat back")
          assert(pp.length.toLong == n, s"'$w': ${pp.length} pieces vs count $n")
          assert(pp.map(vocab).sum == s, s"'$w': piece scores do not re-derive $s")
          assert(pp.forall(p => p.nonEmpty && p.length <= UnigramLm.MaxPiece))
        case _ => ()
      }
    }
    assert(pieces("xyz", "a" -> -1L).isEmpty)
    assert(pieces("", "a" -> -1L).contains(Seq.empty))
  }

  test("segmentPieces honors the ties-to-longer rule") {
    // 'ab' one piece vs 'a'+'b', equal scores: the longer piece wins
    assert(pieces("ab", "a" -> -2L, "b" -> -2L, "ab" -> -4L)
      .contains(Seq("ab")))
    // greedy trap: DP must pick ab+ab over aba+b
    assert(pieces("abab",
      "a" -> -6L, "b" -> -10L, "ab" -> -2L, "aba" -> -1L)
      .contains(Seq("ab", "ab")))
  }

  test("q199 EM round: words conserved, v1 counts match q192, char vocab survives, multi vocab pruned") {
    val docs = Tables.documents(spark, sfDir)
    val em = UnigramLm.emSegmentation(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val v1 = UnigramLm.unigramSegmentation(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(em.keySet == v1.keySet, "EM round changed the source set")
    em.foreach { case (src, r) =>
      val base = v1(src)
      assert(r.getLong(1) == base.getLong(1), s"$src: n_words drifted")
      assert(r.getLong(2) == base.getLong(2),
        s"$src: n_pieces_v1 != q192's n_pieces — the v1 segmentation drifted")
      val (nVocab1, nVocabEm) = (r.getLong(8), r.getLong(9))
      // prune direction: multi pieces can only drop out; chars survive
      assert(nVocabEm <= nVocab1,
        s"EM vocab $nVocabEm grew past the v1 vocab $nVocab1")
      assert(r.getLong(3) >= r.getLong(1),
        "every word costs at least one EM piece")
      assert(r.getDouble(7) < 0.0, "mean EM log-prob must be negative")
    }
  }
}
