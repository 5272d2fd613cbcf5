package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics of the curation query batch (q90-q95) beyond the oracle
  * hash-check: chunk coverage/reassembly, redaction completeness,
  * frequency-score invariants, stratified quantile-filter behavior,
  * mixture proportions, and sketch-vs-exact heavy-hitter equality.
  */
class CurationOpsSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sfDir)

  test("q90 chunks cover every token and reassemble each document") {
    val chunks = CurationOps.q90.build(spark, sfDir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1))).toMap
    val originals = docs
      .select(col("doc_id"), TextAnalytics.toks(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(chunks.keySet == originals.filter(_._2.nonEmpty).keySet)
    originals.foreach { case (id, toks) =>
      val rows = chunks(id)
      // stride arithmetic: starts at 0,24,... <= n-1
      assert(rows.length == (toks.length - 1) / 24 + 1, s"doc $id chunk count")
      // stride-24 prefixes of each chunk reassemble the token stream
      val reassembled = rows.flatMap { r =>
        r.getString(2).split(" ").take(24)
      }
      assert(reassembled.toSeq == toks, s"doc $id reassembly")
      // every chunk except possibly the last is full-width only if
      // enough tokens remain; sizes match least(32, n - start)
      rows.zipWithIndex.foreach { case (r, i) =>
        val expected = math.min(32, toks.length - i * 24)
        assert(r.getLong(3) == expected, s"doc $id chunk $i size")
        assert(r.getString(2).split(" ").length == expected)
      }
    }
  }

  test("q91 redacts every synthesized email/phone/ip and counts them") {
    val rows = CurationOps.q91.build(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == 1, "one email per note")
      assert(r.getLong(2) == 1, "one phone per note")
      assert(r.getLong(3) == 1, "one ip per note")
      val clean = r.getString(4)
      assert(clean.contains("<EMAIL>") && clean.contains("<PHONE>")
        && clean.contains("<IP>"))
      assert(!clean.matches(".*[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}.*"),
        s"ip survived: $clean")
      assert(!clean.contains("@"), s"email survived: $clean")
      assert(!clean.matches(""".*\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}.*"""),
        s"phone survived: $clean")
    }
  }

  test("q92 frequency-score invariants hold against directly computed counts") {
    val out = CurationOps.q92.build(spark, sfDir).collect()
    val tokCounts = docs
      .select(col("doc_id"), TextAnalytics.toks(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val corpusFreq = tokCounts.values.flatten
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(out.length == tokCounts.count(_._2.nonEmpty))
    out.foreach { r =>
      val (id, n, sumF, minF, avgF) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      val toks = tokCounts(id)
      assert(n == toks.length)
      assert(sumF == toks.map(corpusFreq).sum, s"doc $id sum_freq")
      assert(minF == toks.map(corpusFreq).min, s"doc $id min_freq")
      assert(avgF == sumF.toDouble / n)
    }
  }

  test("q93 keeps exactly the top-75% quality docs within each language") {
    val kept = CurationOps.q93.build(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getLong(0))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val all = TextAnalytics.qualityBase(docs)
      .select(col("lang"), col("doc_id"), col("qscore")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    all.foreach { case (lang, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._2)).map(_._2)
      val n = ordered.length
      // percent_rank >= 0.25  <=>  rank-1 >= 0.25*(n-1)
      val expected = ordered.zipWithIndex.collect {
        case (id, i) if i >= 0.25 * (n - 1) => id
      }.toSet
      assert(kept.getOrElse(lang, Set.empty) == expected, s"lang $lang")
    }
  }

  test("q94 mixture: per-source keeps floor(w*T/100) in deterministic hash order") {
    val out = CurationOps.q94.build(spark, sfDir).collect()
    val bySource = out.groupBy(_.getString(0))
    val counts = docs.groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val wt = counts.keys.map(s => s -> (if (s.length == 4) 7L else 3L)).toMap
    val t = counts.map { case (s, n) => n * 100 / wt(s) }.min
    bySource.foreach { case (src, rows) =>
      val keepN = wt(src) * t / 100
      assert(rows.length == keepN, s"$src kept ${rows.length}, want $keepN")
      assert(rows.forall(_.getLong(3) == keepN))
    }
    // the mixture actually rebalances: heavy sources keep more
    val kept4 = bySource.filter(_._1.length == 4).values.map(_.length).toSeq
    val kept5 = bySource.filter(_._1.length == 5).values.map(_.length).toSeq
    assert(kept4.nonEmpty && kept5.nonEmpty && kept4.min > kept5.max)
    // deterministic: a second run selects the same doc ids
    val again = CurationOps.q94.build(spark, sfDir).collect()
    assert(again.map(_.getLong(1)).toSeq == out.map(_.getLong(1)).toSeq)
  }

  test("q107 span dedup: every surviving chunk is globally unique; totals partition") {
    val out = CurationOps.q107.build(spark, sfDir).collect()
    assert(out.nonEmpty)
    // totals partition: kept + removed == chunks, removal actually fires
    out.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2), s"doc ${r.getLong(0)}")
    }
    assert(out.map(_.getLong(2)).sum > 0, "corpus has repeats; none removed")
    // global uniqueness: the same 3-token chunk never survives twice —
    // rebuild surviving chunks from clean_text (chunks are 3 tokens
    // except possibly a shorter tail chunk per doc)
    val survivors = out.flatMap { r =>
      r.getString(3).split(" ").filter(_.nonEmpty).grouped(3).map(_.mkString(" "))
    }
    // grouped(3) can mis-slice when a doc has a short TAIL chunk, so
    // check at the strongest granularity that is reconstruction-safe:
    // full-length chunks
    val full = survivors.filter(_.split(" ").length == 3)
    assert(full.length == full.distinct.length,
      "a 3-token chunk survived span-dedup twice")
  }

  test("q108 bigram LM: probabilities in (0,1], top-3 per head, heads frequent") {
    val out = CurationOps.q108.build(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (pairN, leftN, condP, rnk) =
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5))
      assert(leftN >= 100 && pairN <= leftN && rnk >= 1 && rnk <= 3)
      assert(condP == pairN.toDouble / leftN.toDouble)
    }
    // per head: ranks are 1..k with no gaps and cond_p non-increasing
    out.groupBy(_.getString(0)).values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(5))
      assert(sorted.map(_.getLong(5)).toSeq == (1L to sorted.length))
      val ps = sorted.map(_.getDouble(4))
      assert(ps.zip(ps.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q110 temperature weights: largest source pins 1.0, small sources boosted, monotone") {
    val out = CurationOps.q110.build(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.length > 1)
    out.foreach { case (src, n, rel, boost) =>
      assert(rel > 0.0 && rel <= 1.0, s"$src rel_weight $rel")
      assert(boost >= 1.0, s"$src boost $boost < 1 — sqrt smoothing must upweight")
      assert(n > 0)
    }
    assert(out.count(_._3 == 1.0) >= 1, "largest source must have rel_weight 1.0")
    // monotone in n_tokens; strictly smaller source => strictly larger boost
    val byN = out.sortBy(_._2)
    byN.zip(byN.tail).foreach { case (a, b) =>
      assert(a._3 <= b._3, "rel_weight not monotone in size")
      if (a._2 < b._2) assert(a._4 >= b._4, "boost not anti-monotone in size")
    }
  }

  test("q113 sliding-span dedup: keep-first, interval merge, within-doc repeats") {
    import spark.implicits._
    val shared = (1 to 12).map(i => s"shared$i").mkString(" ") // 12-token passage
    val corpus = Seq(
      // doc 0: first occurrence of the passage — must be KEPT whole
      (0L, s"alpha beta $shared gamma delta"),
      // doc 1: re-occurrence mid-doc — the 5 overlapping 8-grams must
      // merge into ONE 12-token interval, not 5 cuts
      (1L, s"intro words here $shared closing words there now"),
      // doc 2: unique text, long enough to window — untouched
      (2L, (1 to 20).map(i => s"unique$i").mkString(" ")),
      // doc 3: the passage repeated TWICE within one doc — second copy
      // cut even though doc 3 is not doc 0 (the keep is global-first)
      (3L, s"$shared bridge $shared"),
      // doc 4: shorter than the window — no grams, untouched
      (4L, "tiny doc under window"))
      .toDF("doc_id", "text")
    val out = CurationOps.slidingSpanDedup(corpus, n = 8)
      .orderBy(col("doc_id"))
      .as[(Long, Long, Long, String)].collect()
    val byId = out.map(r => r._1 -> r).toMap
    // doc 0 untouched (it is the global first occurrence)
    assert(byId(0L)._3 == 0L && byId(0L)._4 == s"alpha beta $shared gamma delta")
    // doc 1: exactly the 12 passage tokens removed, in one merged span
    assert(byId(1L)._3 == 12L,
      s"doc 1 removed ${byId(1L)._3} tokens (overlap not merged?)")
    assert(byId(1L)._4 == "intro words here closing words there now")
    // doc 2 untouched
    assert(byId(2L)._3 == 0L && byId(2L)._4.startsWith("unique1 "))
    // doc 3: both copies are re-occurrences of doc 0's passage
    assert(byId(3L)._4 == "bridge", s"doc 3 kept '${byId(3L)._4}'")
    assert(byId(3L)._3 == 24L)
    // doc 4 untouched despite being under the window size
    assert(byId(4L)._3 == 0L && byId(4L)._4 == "tiny doc under window")
    // conservation: n_tokens - removed == kept token count, every doc
    out.foreach { case (id, n, rem, clean) =>
      val kept = if (clean.isEmpty) 0 else clean.split(" ").length
      assert(n - rem == kept, s"doc $id token accounting")
    }
  }

  test("q143 exact-substr spans: lengths, sources, diagonals on a hand corpus") {
    import spark.implicits._
    val shared = (1 to 12).map(i => s"shared$i").mkString(" ") // 12 tokens
    val corpus = Seq(
      (0L, s"alpha beta $shared gamma delta"),                   // source
      (1L, s"intro words here $shared closing words there now"), // re-occurrence
      (2L, (1 to 20).map(i => s"unique$i").mkString(" ")),       // unique
      (3L, s"$shared bridge $shared"))                            // two copies
      .toDF("doc_id", "text")
    val out = CurationOps.exactSubstrSpans(corpus, n = 8, minLen = 12)
      .orderBy(col("doc_id"), col("start"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    // doc 1: the passage sits at tokens 3..14; doc 0's copy at 2..13 —
    // ONE span of exactly 12 tokens on one diagonal
    // doc 3: copy 1 at 0..11, copy 2 at 13..24, both vs doc 0 at 2..13
    assert(out.toList == List(
      (1L, 3L, 15L, 0L, 2L, 12L),
      (3L, 0L, 12L, 0L, 2L, 12L),
      (3L, 13L, 25L, 0L, 2L, 12L)), out.toList.toString)
    // reported spans are REAL duplicates: the tokens equal the source's
    val toksOf = corpus.as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split("\\s+").toVector }.toMap
    out.foreach { case (d, s, e, sd, ss, len) =>
      assert(e - s == len)
      assert(toksOf(d).slice(s.toInt, e.toInt) ==
        toksOf(sd).slice(ss.toInt, (ss + len).toInt),
        s"span ($d,$s) does not match its source")
    }
  }

  test("q143 at minLen = n covers exactly q113's struck windows") {
    import spark.implicits._
    // fixture corpus: the span union at the window threshold must equal
    // the fixed-window removal positions (the removal-set equivalence
    // that makes q143 the attribution layer over q113)
    val docs = Tables.documents(spark, sfDir)
    val n = 8
    val spans = CurationOps.exactSubstrSpans(docs, n = n, minLen = n)
      .select(col("doc_id"), col("start"), col("end_tok"))
      .as[(Long, Long, Long)].collect()
    val covered = spans.flatMap { case (d, s, e) => (s until e).map(d -> _) }.toSet
    // recompute q113's struck positions directly: duplicated windows
    // (cnt > 1, rn > 1) cover [start, start + n)
    val struck = CurationOps.slidingSpanDedup(docs, n = n)
      .select(col("doc_id"), col("n_tokens"), col("removed_tokens"))
      .as[(Long, Long, Long)].collect()
    val removedByDoc = struck.map(r => r._1 -> r._3).toMap
    val coveredByDoc = covered.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    removedByDoc.filter(_._2 > 0).foreach { case (d, rem) =>
      assert(coveredByDoc.getOrElse(d, 0L) == rem,
        s"doc $d: q143 covers ${coveredByDoc.getOrElse(d, 0L)} tokens, q113 removed $rem")
    }
    assert(coveredByDoc.keySet == removedByDoc.filter(_._2 > 0).keySet)
  }

  test("q143 anchored semantics: scattered first occurrences fragment the span (documented)") {
    import spark.implicits._
    // w1..w9 first appear as one passage in doc 0; x+w1..w8 in doc 1
    // puts doc 1's window (w1..w8) on a DIFFERENT diagonal vs doc 0
    // than doc 2's copy of w1..w9 — doc 2 still reports one full span
    // (all its windows anchor to doc 0 on one diagonal)
    val ws = (1 to 9).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (0L, ws),                    // canonical for all w-windows
      (1L, s"x $ws"),              // re-occurrence, shifted diagonal
      (2L, ws))                    // exact copy of doc 0
      .toDF("doc_id", "text")
    val out = CurationOps.exactSubstrSpans(corpus, n = 8, minLen = 8)
      .orderBy(col("doc_id"), col("start"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toList
    assert(out == List(
      (1L, 1L, 10L, 0L, 0L, 9L),   // doc 1: one 9-token span vs doc 0
      (2L, 0L, 9L, 0L, 0L, 9L)),   // doc 2: one 9-token span vs doc 0
      out.toString)
  }

  test("q144 longest repeated substring: cross-doc, overlapping, and no-dup cases") {
    import spark.implicits._
    val shared = (1 to 12).map(i => s"shared$i").mkString(" ")
    val cross = Seq(
      (0L, s"alpha beta $shared gamma"),
      (1L, s"intro $shared closing words"),
      (2L, "totally unrelated text right here"))
      .toDF("doc_id", "text")
    val got = CurationOps.longestRepeatedSubstring(cross)
      .as[(Long, String, Long, Long, Long, Long, Long)].collect().toList
    // the 12-token passage is the longest repeat; first occurrence in
    // doc 0 at token 2, second in doc 1 at token 1; exactly 2 occs
    assert(got == List((12L, shared, 0L, 2L, 1L, 1L, 2L)), got.toString)

    // overlapping WITHIN one doc: "a a a a a" repeats "a a a a" at
    // starts 0 and 1 (overlap allowed, the standard LRS convention)
    val overlap = Seq((7L, "a a a a a")).toDF("doc_id", "text")
    val ov = CurationOps.longestRepeatedSubstring(overlap)
      .as[(Long, String, Long, Long, Long, Long, Long)].collect().toList
    assert(ov == List((4L, "a a a a", 7L, 0L, 7L, 1L, 2L)), ov.toString)

    // all-unique corpus: no duplicated window at any length -> empty
    val uniq = Seq((1L, "w1 w2 w3"), (2L, "w4 w5")).toDF("doc_id", "text")
    assert(CurationOps.longestRepeatedSubstring(uniq).count() == 0L)
  }

  test("q144 matches a plain-Scala brute force on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(144L)
    (1 to 3).foreach { trial =>
      val vocab = Vector("a", "b", "c", "d")
      val rows = (0L until 10L).map { i =>
        (i, Seq.fill(3 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      }
      // brute force: all (doc, start, len) substrings, longest with
      // count >= 2, lexicographic-min winner, first two occurrences
      val subs = rows.flatMap { case (id, tx) =>
        val t = tx.split("\\s+").toVector
        for {
          len <- 1 to t.length; s <- 0 to t.length - len
        } yield (t.slice(s, s + len).mkString(" "), len, id, s.toLong)
      }
      val dup = subs.groupBy(x => (x._2, x._1)).filter(_._2.size >= 2)
      val expect =
        if (dup.isEmpty) Nil
        else {
          val ml = dup.keys.map(_._1).max
          val ws = dup.keys.filter(_._1 == ml).map(_._2).min
          val occ = dup((ml, ws)).map(x => (x._3, x._4)).sorted
          List((ml.toLong, ws, occ(0)._1, occ(0)._2, occ(1)._1, occ(1)._2,
            occ.size.toLong))
        }
      val got = CurationOps.longestRepeatedSubstring(rows.toDF("doc_id", "text"))
        .as[(Long, String, Long, Long, Long, Long, Long)].collect().toList
      assert(got == expect, s"trial $trial: got $got expect $expect")
    }
  }

  test("q95 sketch-verified heavy hitters equal the exact full group-by") {
    val sketch = CurationOps.q95.build(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val terms = docs.select(explode(TextAnalytics.toks(col("text"))).as("term"))
    val n = terms.count()
    val exact = terms.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 30 > n)
      .orderBy(col("cnt").desc, col("term"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(sketch.toSeq == exact.toSeq)
    assert(exact.nonEmpty, "fixture should produce at least one heavy hitter")
  }

  test("q125 weighted sample: matches plain-Scala A-ES replay; zero-weight excluded; no sort exchange") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val synth = (1L to 300L).map { id =>
      // two weight classes + zero-weight docs: long docs (40 tokens)
      // must be sampled more often than short (4), empty never
      val n = if (id % 10 == 0) 0 else if (id % 3 == 0) 40 else 4
      (id, s"s${id % 5}", Seq.fill(n)("w" + rnd.nextInt(50)).mkString(" "))
    }.toDF("doc_id", "source", "text")
    val k = 60

    def round9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ref = (1L to 300L).flatMap { id =>
      val n = if (id % 10 == 0) 0L else if (id % 3 == 0) 40L else 4L
      if (n == 0) None
      else {
        val h = (id * 2654435761L) % 4294967296L
        val key = round9(math.log((h.toDouble + 0.5) / 4294967296.0)) / n.toDouble
        Some((id, key))
      }
    }.sortBy { case (id, key) => (-key, id) }.take(k)

    val df = CurationOps.weightedSample(synth, k)
    val got = df.select(col("doc_id"), col("skey")).as[(Long, Double)].collect().toSeq
    assert(got == ref)
    assert(got.forall(_._1 % 10 != 0), "zero-weight doc sampled")
    // the weighting bites: with 1/10 the weight, short docs must be a
    // minority of the sample even though they are 2x as numerous
    val longDocs = got.count(_._1 % 3 == 0)
    assert(longDocs > k / 2, s"only $longDocs/${k} long docs sampled")
    // top-k never pays a global sort: no shuffle exchange in the plan
    df.collect()
    def nodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p +: (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => nodes(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => nodes(q.plan)
        case _ => p.children.flatMap(nodes)
      })
    val all = nodes(df.queryExecution.executedPlan)
    assert(all.exists(_.isInstanceOf[org.apache.spark.sql.execution.TakeOrderedAndProjectExec]),
      "expected TakeOrderedAndProject (per-partition heaps)")
    assert(!all.exists(_.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike]),
      "top-k sampling must not shuffle")
  }

  test("q152 data contract: each planted violation is counted once, in its source, and only there") {
    import spark.implicits._
    val docs = Seq(
      // clean row
      (0L, "good text here", "en", "feed_a", 14L),
      // null text (n_chars irrelevant — not double-counted as len mismatch)
      (1L, null.asInstanceOf[String], "en", "feed_a", 0L),
      // empty text counts as null_text
      (2L, "", "en", "feed_a", 0L),
      // n_chars lies about the length
      (3L, "short", "en", "feed_b", 999L),
      // lang outside the declared domain
      (4L, "hello there", "xx", "feed_b", 11L),
      // doc_id collision ACROSS sources: both rows flagged
      (5L, "dup id row one", "en", "feed_a", 14L),
      (5L, "dup id row two", "en", "feed_b", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = CurationOps.dataContract(docs)
      .select("source", "n_rows", "n_null_text", "n_len_mismatch",
        "n_bad_lang", "n_dup_id", "n_clean")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("feed_a") == (("feed_a", 4L, 2L, 0L, 0L, 1L, 1L)))
    assert(got("feed_b") == (("feed_b", 3L, 0L, 1L, 1L, 1L, 0L)))
  }

  test("q152 matches a plain-Scala replay on random corpora with injected violations") {
    import spark.implicits._
    val rnd = new scala.util.Random(1520)
    val langs = Seq("de", "en", "es", "fr", "zh")
    val rows: Seq[(Long, String, String, String, Long)] = (0 until 120).map { i =>
      val text: String =
        if (rnd.nextInt(10) == 0) null
        else if (rnd.nextInt(10) == 0) ""
        else Seq.fill(1 + rnd.nextInt(6))("w" + rnd.nextInt(9)).mkString(" ")
      val nChars: Long =
        if (text != null && rnd.nextInt(8) == 0) text.length + 7L
        else if (text == null) 0L else text.length.toLong
      val lang = if (rnd.nextInt(12) == 0) "qq" else langs(rnd.nextInt(5))
      // ~10% doc_id collisions
      val id = if (rnd.nextInt(10) == 0) rnd.nextInt(20).toLong else 1000L + i
      (id, text, lang, s"s${rnd.nextInt(4)}", nChars)
    }
    val got = CurationOps.dataContract(
        rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
      .select("source", "n_rows", "n_null_text", "n_len_mismatch",
        "n_bad_lang", "n_dup_id", "n_clean")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val idCount = rows.groupBy(_._1).view.mapValues(_.size).toMap
    val want = rows.groupBy(_._4).map { case (src, rs) =>
      val flags = rs.map { case (id, text, lang, _, nChars) =>
        val vNull = text == null || text.isEmpty
        val vLen = text != null && nChars != text.length.toLong
        val vLang = !langs.contains(lang)
        val vDup = idCount(id) > 1
        (vNull, vLen, vLang, vDup)
      }
      src -> ((src, rs.size.toLong,
        flags.count(_._1).toLong, flags.count(_._2).toLong,
        flags.count(_._3).toLong, flags.count(_._4).toLong,
        flags.count(f => !f._1 && !f._2 && !f._3 && !f._4).toLong))
    }
    assert(got == want)
  }

  test("q154 boundary stitch: pair accounting, self-stitch exclusion, short docs vanish") {
    import spark.implicits._
    val docs = Seq(
      (0L, "x y mid a b"),   // tail "a b"
      (1L, "a b tail w"),    // head "a b" -> stitches with doc 0
      (2L, "p q p q"),       // head == tail == "p q" (self)
      (3L, "w w end p q"),   // tail "p q" -> stitches with doc 2's head
      (4L, "solo"),          // < 2 tokens -> no boundary
      (5L, "a b"))           // head == tail == "a b" (len-2 doc)
      .toDF("doc_id", "text")
    val got = CurationOps.boundaryStitch(docs)
      .select(col("key"), col("n_tail"), col("n_head"), col("n_self"), col("stitch_pairs"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // "a b": tails {0, 5}, heads {1, 5}, self {5}
    //   pairs = 2*2 - 1 = 3: (0->1), (0->5), (5->1); (5->5) excluded
    assert(got("a b") == ((2L, 2L, 1L, 3L)))
    // "p q": tails {2, 3}, heads {2}, self {2} -> pairs = 2*1 - 1 = 1 (3->2)
    assert(got("p q") == ((2L, 1L, 1L, 1L)))
    // no other key has stitch evidence; doc 4 contributed nothing
    assert(got.keySet == Set("a b", "p q"))
  }

  test("q157 padding audit: hand-computed waste at each candidate length; empty docs excluded") {
    import spark.implicits._
    val docs = Seq(
      "a b c",                                  // 3 tokens
      (1 to 10).map(i => s"t$i").mkString(" "), // 10 tokens
      "")                                       // 0 tokens -> not a sequence
      .map(Tuple1(_)).toDF("text")
    val got = CurationOps.paddingAudit(docs, candidateLens = Seq(4L, 8L))
      .select("max_len", "n_seqs", "total_tokens", "kept_tokens",
        "padding_tokens", "truncated_tokens", "padding_frac", "truncated_frac")
      .as[(Long, Long, Long, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // L=4: doc1 kept 3 pad 1; doc2 kept 4 trunc 6 -> pad 1/8, trunc 6/13
    assert(got(4L) == ((4L, 2L, 13L, 7L, 1L, 6L, 1.0 / 8.0, 6.0 / 13.0)))
    // L=8: doc1 kept 3 pad 5; doc2 kept 8 trunc 2 -> pad 5/16, trunc 2/13
    assert(got(8L) == ((8L, 2L, 13L, 11L, 5L, 2L, 5.0 / 16.0, 2.0 / 13.0)))
  }

  test("q159 memorization risk: in-doc-only repeats flag; cross-doc presence or minReps excludes") {
    import spark.implicits._
    val corpus = Seq(
      // "p q r s" twice in doc 1 and nowhere else -> the hazard shape
      (1L, "p q r s x p q r s"),
      // "a b c d" 3x in doc 2 BUT also in doc 3 -> globally non-unique
      (2L, "a b c d y a b c d z a b c d"),
      (3L, "a b c d k l m n"),
      // "k l m n" once each in docs 3 and 4 -> neither repeated nor unique
      (4L, "k l m n o j h g"),
      // overlapping in-doc repeats: "u v w t" 3x, its rotations 2x each
      (5L, "u v w t u v w t u v w t")
    ).toDF("doc_id", "text")
    def run(minReps: Int) =
      CurationOps.memorizationRisk(corpus, n = 4, minReps = minReps)
        .select(col("doc_id"), col("start"), col("n_reps"), col("span_text"))
        .as[(Long, Long, Long, String)].collect().toSet
    assert(run(2) == Set(
      (1L, 0L, 2L, "p q r s"),
      (5L, 0L, 3L, "u v w t"),
      (5L, 1L, 2L, "v w t u"),
      (5L, 2L, 2L, "w t u v"),
      (5L, 3L, 2L, "t u v w")))
    assert(run(3) == Set((5L, 0L, 3L, "u v w t")),
      "minReps must gate on the in-doc repeat count")
  }

  test("q161 epoch allocation: exact budget split by sqrt weight; strict > maxEpochs flag") {
    import spark.implicits._
    // srcA 10 tokens, srcB 40 -> weights 0.5 and 1.0 (sqrt exact),
    // wsum 1.5; budget 240 -> A: 80 tokens = 8 epochs (over), B: 160
    // tokens = 4.0 epochs EXACTLY -> not over (strict >). All doubles
    // here are exact binary fractions, so equality asserts are safe.
    val corpus = Seq(
      (1L, "srcA", (1 to 10).map(i => s"a$i").mkString(" ")),
      (2L, "srcB", (1 to 40).map(i => s"b$i").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val got = CurationOps.epochAllocation(corpus, budgetTokens = 240L)
      .select(col("source"), col("n_tokens"), col("weight"),
        col("alloc_tokens"), col("epochs"), col("epochs_ceil"),
        col("over_repeated"))
      .as[(String, Long, Double, Double, Double, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("srcA") == (("srcA", 10L, 0.5, 80.0, 8.0, 8L, 1L)))
    assert(got("srcB") == (("srcB", 40L, 1.0, 160.0, 4.0, 4L, 0L)),
      "exactly maxEpochs must NOT flag (strict >)")
  }

  test("q154 matches a plain-Scala replay on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(154)
    val words = Vector("m", "n", "o")
    val docs = (0L until 80L).map { i =>
      (i, Seq.fill(2 + rnd.nextInt(6))(words(rnd.nextInt(words.size))).mkString(" "))
    }
    val hk = docs.map { case (_, t) =>
      val toks = t.split("\\s+").filter(_.nonEmpty)
      (toks.take(2).mkString(" "), toks.takeRight(2).mkString(" "))
    }
    val keys = hk.flatMap { case (h, tl) => Seq(h, tl) }.distinct
    val want = keys.map { k =>
      val nt = hk.count(_._2 == k).toLong
      val nh = hk.count(_._1 == k).toLong
      val ns = hk.count(p => p._1 == k && p._2 == k).toLong
      k -> ((nt, nh, ns, nt * nh - ns))
    }.filter(_._2._4 > 0).toMap
    val got = CurationOps.boundaryStitch(docs.toDF("doc_id", "text"))
      .select(col("key"), col("n_tail"), col("n_head"), col("n_self"), col("stitch_pairs"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == want)
  }

  test("duplicateTextFraction: shared passage covers BOTH docs; unique doc at 0") {
    import spark.implicits._
    val passage = (1 to 8).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      (1L, s"$passage u1 u2"),         // shared 8-gram at [0, 8) of 10
      (2L, s"q1 q2 $passage"),         // same passage at [2, 10) of 10
      (3L, "all fresh tokens here never repeated anywhere at all"),
      (4L, null))                      // junk
      .toDF("doc_id", "text")
    val out = CurationOps.duplicateTextFraction(docs, n = 8)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1)), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((10L, 8L, 0.8)))
    assert(out(2L) == ((10L, 8L, 0.8)),
      "q166 marks ALL occurrences — the first copy too, unlike q113's keep-first")
    assert(out(3L)._2 == 0L && out(3L)._3 == 0.0)
    assert(out(4L) == ((-1L, 0L, 0.0)), "junk row: NULL n_tokens, zero coverage")
  }

  test("qualityDupEntanglement: co-ranked source rho=1, anti-ranked rho=-1, singleton 0; junk excluded") {
    import spark.implicits._
    val p = "pa pb pc pd pe pf pg ph"                // 8 non-stop tokens
    val q = "the of to is in it on and"              // 8 stop tokens
    val docs = Seq(
      // sA: score rank == dup rank for all three docs => rho = 1
      (1L, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10 a11 a12 a13 a14 a15 a16", "sA"),
      (2L, s"$p $p u1 u2 u3 u4 the of to is", "sA"), // dup 16/24, 4 stops
      (3L, s"$q $q", "sA"),                          // dup 1.0, stop-heavy
      // sB: reversed ranks => rho = -1
      (4L, "the b1 of b2 to b3 is b4 in b5 it b6 on b7 and b8", "sB"),
      (5L, "w1 w2 w3 w4 w5 w6 w7 w8 w1 w2 w3 w4 w5 w6 w7 w8", "sB"),
      // sC: single doc => rho 0.0 by convention
      (6L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10", "sC"),
      // sD: dup_frac CONSTANT (0.0 for both) while scores differ —
      // Spearman undefined at zero variance; the doc_id tie-break must
      // not fabricate |rho| = 1
      (9L, "d1 d2 d3 d4 d5 d6 d7 d8", "sD"),
      (10L, "the of to is dx1 dx2 dx3 dx4", "sD"),
      // junk + empty rows: excluded (zero tokens / null text)
      (7L, null, "sA"), (8L, "   ", "sA"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
    val out = CurationOps.qualityDupEntanglement(docs)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(3), r.getLong(4)))).toMap
    assert(out("sA") == ((3L, 1.0, 1L)), "perfectly co-ranked gates flag entangled")
    assert(out("sB") == ((2L, -1.0, 1L)), "perfectly anti-ranked gates flag entangled")
    assert(out("sC") == ((1L, 0.0, 0L)), "n < 2 reports no evidence")
    assert(out("sD") == ((2L, 0.0, 0L)),
      "constant dup side (clean source) must report 0.0, not a tie-break artifact")
  }

  test("q176 DSIR: target-vocabulary docs outweigh off-target docs; featureless docs excluded") {
    import spark.implicits._
    // target = gopher-pass docs. Build a corpus where target docs share
    // a distinctive vocabulary and off-target docs share a different
    // one: DSIR log-ratio weights must rank a target-vocab candidate
    // above an off-target-vocab candidate.
    val targetText = ("the data of science is in the model and " +
      "the method of training is in the corpus and ") * 4 // gopher-pass: 64 toks, stops, alpha
    val junkVocab = "zzq xxv wwk qqj" // never in target docs
    val rows =
      (1L to 6L).map(i => (i, targetText, "en", "sT", targetText.length.toLong)) ++
      Seq(
        // candidate A: pure target vocabulary, but NOT gopher-pass (short)
        (10L, "the data of science is in the model", "en", "sA", 35L),
        // candidate B: pure off-target vocabulary, same length class
        (11L, junkVocab + " " + junkVocab, "en", "sB", 20L),
        // featureless: one token / null text -> not candidates
        (12L, "single", "en", "sC", 6L),
        (13L, null, "en", "sC", 0L))
    val d = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = CurationOps.dsirSelect(d, nBuckets = 256, k = 100).collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(!byId.contains(12L) && !byId.contains(13L),
      "docs with < 2 tokens carry no features and must not be candidates")
    val lwA = byId(10L).getLong(3)
    val lwB = byId(11L).getLong(3)
    assert(lwA > lwB,
      s"target-vocab candidate must outweigh off-target ($lwA vs $lwB)")
    // target-vocab buckets have c_t ≈ c_r, so A's weight sits near zero
    // (its own raw occurrences pull it a hair negative — when raw looks
    // like target, DSIR selection is ~uniform, which is correct); the
    // off-target doc's buckets are raw-only (c_t = 0) and each bigram
    // pays ~ln of the smoothed zero ratio — strongly negative
    assert(math.abs(lwA) < 1000000L,
      s"target-vocab weight should be ~0 (|lw| < 1 nat), got $lwA")
    assert(lwB < -1000000L,
      s"pure-off-target weight should be << -1 nat, got $lwB")
    // replayability: the selection is a pure function of the input
    val out2 = CurationOps.dsirSelect(d, nBuckets = 256, k = 100).collect()
    assert(out.map(_.toSeq).toSeq == out2.map(_.toSeq).toSeq,
      "selection must be byte-replayable")
  }

  test("q179 host rollup: template-farm host flagged by dup volume + gopher share; junk text is a fail, not volume") {
    import spark.implicits._
    val tmpl = ("lorem ipsum dolor sit amet " * 4).trim // 20 tokens, repeated across docs
    // gopher-pass docs with NO internal repetition (any repeated
    // 8-gram would register as duplicated text): 2 stops + 58 distinct
    // words each, disjoint between the two docs
    def clean(tag: Char): String = "the and " + (0 until 58)
      .map(i => s"word$tag${('a' + i / 26).toChar}${('a' + i % 26).toChar}")
      .mkString(" ")
    val rows = Seq(
      // host www.farm0.example.com (doc_id % 3 == 0, source "farm"):
      // every doc is the same template -> all 8-gram windows duplicated
      (3L, tmpl, "farm"), (6L, tmpl, "farm"), (9L, tmpl, "farm"),
      // host www.good1.example.com: distinct clean docs
      (1L, clean('p'), "good"), (4L, clean('q'), "good"),
      // junk row on the good host shard: counts as a gopher FAIL but
      // contributes no token volume
      (7L, null, "good"))
    val d = rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", coalesce(length(col("text")), lit(0L)))
    val out = CurationOps.hostCurationRollup(d)
      .collect().map(r => r.getString(0) -> r).toMap
    val farm = out("www.farm0.example.com")
    assert(farm.getLong(1) == 3L)
    assert(farm.getDouble(4) == 1.0, s"all template text is duplicated, dup_frac = ${farm.getDouble(4)}")
    assert(farm.getDouble(6) == 1.0, "20-token template docs fail the Gopher count rule")
    val good = out("www.good1.example.com")
    assert(good.getLong(1) == 3L, "junk row still counts as a document of its host")
    assert(good.getLong(5) == 1L, "exactly the junk doc is a gopher fail")
    assert(good.getLong(2) == 2L * 60L, s"junk text adds no token volume, got ${good.getLong(2)}")
    assert(good.getDouble(4) == 0.0, "distinct clean docs share no 8-gram windows")
  }

  test("q182 funnel: each planted doc dies at its own stage; counts monotone") {
    import spark.implicits._
    def filler(tag: String, n: Int) = (0 until n)
      .map(i => s"$tag${('a' + i / 26).toChar}${('a' + i % 26).toChar}")
    // gopher+classifier-passing doc: 35 unique fillers FIRST (so the
    // 30-char exact key is unique per tag), then 25 stopwords
    def cleanDoc(tag: String) =
      (filler(tag, 35) ++ Seq.fill(5)(Seq("the", "and", "of", "to", "is")).flatten)
        .mkString(" ")
    val nearA = cleanDoc("na")
    val nearB = nearA.split(" ").reverse.mkString(" ") // same token SET, other prefix
    // gopher-pass but classifier-fail: 2 stops only + digit-bearing
    // fillers (digit_ratio drives z below 0)
    val lowq = (filler("w1", 58) ++ Seq("the", "and")).mkString(" ")
    val rows = Seq(
      (1L, cleanDoc("one"), "s"),   // survives everything
      (2L, cleanDoc("two"), "s"),   // exact-dup representative, survives
      (12L, cleanDoc("two"), "s"),  // exact copy -> struck at exact stage
      (3L, nearA, "s"),             // near-dup representative, survives
      (13L, nearB, "s"),            // near-dup member -> struck at near-dup stage
      (6L, "tiny text here", "s"),  // 3 tokens -> struck at gopher
      (7L, lowq, "s"))              // gopher-pass, score < 0.5 -> struck at classifier
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val junk = Seq((4L, null.asInstanceOf[String], "s", "en", 0L),
      (5L, "dup id row a", "s", "en", 12L), (5L, "dup id row b", "s", "en", 12L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    val out = CurationOps.curationFunnel(rows.unionByName(junk)).collect()
    assert(out.length == 1)
    val r = out.head
    assert((1 to 6).map(r.getLong).toSeq == Seq(10L, 7L, 6L, 5L, 4L, 3L),
      s"funnel = ${(1 to 6).map(r.getLong)}")
    assert(r.getDouble(7) == 0.3)
  }

  test("q183 manifest: full epochs complete, fractional epoch is the deterministic hkey cut, order reproducible") {
    import spark.implicits._
    def words(tag: String, n: Int) =
      (0 until n).map(i => s"$tag$i").mkString(" ")
    // big: 4 docs x 25 tokens = 100; small: 2 docs x 10 = 20
    val rows = Seq(
      (1L, words("b1w", 25), "big"), (2L, words("b2w", 25), "big"),
      (3L, words("b3w", 25), "big"), (4L, words("b4w", 25), "big"),
      (10L, words("s1w", 10), "small"), (11L, words("s2w", 10), "small"),
      (99L, null.asInstanceOf[String], "small")) // junk: never scheduled
      .toDF("doc_id", "text", "source")
    val full = CurationOps.trainingManifest(rows, budgetTokens = 200L, k = 100000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4)))
    // contiguous 1-based positions in okey order
    assert(full.map(_._1).toSeq == (1L to full.length))
    assert(full.map(_._5).toSeq == full.map(_._5).toSeq.sorted)
    assert(!full.exists(_._3 == 99L), "junk doc must not be scheduled")
    // (doc, epoch) pairs unique
    assert(full.map(e => (e._3, e._2)).distinct.length == full.length)
    // epochs: big ~1.38 (floor 1), small ~3.09 (floor 3) — every doc
    // appears in every FULL epoch
    val alloc = CurationOps.epochAllocation(rows, 200L)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(math.floor(alloc("big")) == 1.0 && math.floor(alloc("small")) == 3.0,
      s"fixture drifted: $alloc")
    for (d <- Seq(1L, 2L, 3L, 4L))
      assert(full.exists(e => e._3 == d && e._2 == 1L))
    for (d <- Seq(10L, 11L); ep <- 1L to 3L)
      assert(full.exists(e => e._3 == d && e._2 == ep))
    // the fractional final epoch keeps EXACTLY the hkey-under-frac docs
    def hkey(x: Long): Long = {
      val a = x % 4294967296L
      ((a >> 16) * 2654435761L % 4294967296L * 65536L
        + (a & 65535L) * 2654435761L) % 4294967296L
    }
    def kept(d: Long, ep: Long, frac: Double): Boolean =
      (hkey((d % 67108864L) * 65536L + ep) + 0.5) / 4294967296.0 < frac
    for (d <- Seq(1L, 2L, 3L, 4L))
      assert(full.exists(e => e._3 == d && e._2 == 2L)
        == kept(d, 2L, alloc("big") - 1.0), s"big doc $d fractional epoch")
    for (d <- Seq(10L, 11L))
      assert(full.exists(e => e._3 == d && e._2 == 4L)
        == kept(d, 4L, alloc("small") - 3.0), s"small doc $d fractional epoch")
    // byte-deterministic replay
    val again = CurationOps.trainingManifest(rows, budgetTokens = 200L, k = 100000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4)))
    assert(again.toSeq == full.toSeq)
  }

  test("q183: NULL-id junk with real text is never scheduled (its NULL hash keys would order differently across engines)") {
    import spark.implicits._
    val text = (0 until 30).map(i => s"w$i").mkString(" ")
    val rows = Seq((Some(1L), text, "s"), (Option.empty[Long], text + " x", "s"))
      .toDF("doc_id", "text", "source")
    val out = CurationOps.trainingManifest(rows, budgetTokens = 100L, k = 1000)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(!_.isNullAt(2)), "a NULL-id row must not appear in the manifest")
    assert(out.forall(_.getLong(2) == 1L))
  }

  test("embeddingCoverage: missing embeddings and orphan embeddings both surface, per source") {
    import spark.implicits._
    val docs = Seq(
      (Some(1L), "sA"), (Some(2L), "sA"), (Some(3L), "sB"),
      // junk doc row (NULL doc_id): a DOCUMENT of sA with no embedding,
      // NOT an orphan embedding (the side-marker discipline)
      (None, "sA"))
      .toDF("doc_id", "source")
    val emb = Seq(Some(1L), Some(3L), Some(99L), None) // 99 + junk NULL: orphans
      .toDF("vec_id")
    val out = CurationOps.embeddingCoverage(docs, emb)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out("sA") == ((3L, 1L, 2L, 0L, 1.0 / 3.0)),
      "the junk doc counts as an unembedded sA document")
    assert(out("sB") == ((1L, 1L, 0L, 0L, 1.0)))
    assert(out("(orphan_embedding)") == ((0L, 0L, 0L, 2L, 0.0)),
      "embeddings referencing no document (incl. a NULL-id junk row) must be reported")
  }

  test("q184 column profile: exact nulls/distincts/lengths on a controlled frame; numeric min/max only for numeric cols") {
    import spark.implicits._
    val df = Seq(
      (Option(1L), Option("ab"), Option("en"), Option("s1"), Option(2L)),
      (Option(2L), Option.empty[String], Option("en"), Option("s1"), Option(0L)),
      (Option.empty[Long], Option("xyz"), Option.empty[String], Option("s2"), Option(3L)),
      (Option(4L), Option("ab"), Option("de"), Option.empty[String], Option.empty[Long]))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = CurationOps.columnProfile(df, Set("doc_id", "n_chars"))
      .collect()
    assert(rows.length == 5)
    val p = rows.map(r => r.getString(0) -> r).toMap
    // every column: 4 rows, exactly one null => null_share 0.25
    p.values.foreach { r =>
      assert(r.getLong(1) == 4L, s"${r.getString(0)} n_rows")
      assert(r.getLong(2) == 1L, s"${r.getString(0)} n_null")
      assert(r.getDouble(3) == 0.25, s"${r.getString(0)} null_share")
    }
    def stats(c: String) = {
      val r = p(c)
      (r.getLong(4), r.getLong(5), r.getLong(6),
        if (r.isNullAt(7)) None else Some(r.getLong(7)),
        if (r.isNullAt(8)) None else Some(r.getLong(8)))
    }
    assert(stats("doc_id") == ((3L, 1L, 1L, Some(1L), Some(4L))))
    assert(stats("text") == ((2L, 2L, 3L, None, None)),
      "duplicate 'ab' collapses in n_distinct; numeric min/max stay NULL")
    assert(stats("lang") == ((2L, 2L, 2L, None, None)))
    assert(stats("source") == ((2L, 2L, 2L, None, None)))
    assert(stats("n_chars") == ((3L, 1L, 1L, Some(0L), Some(3L))),
      "rendered length of 0/2/3 is one char; numeric min is the true 0")
  }

  test("q184 on the fixture: one row per documents column; doc_id distincts match an independent count") {
    val out = CurationOps.q184.build(spark, sfDir).collect()
    assert(out.map(_.getString(0)).toSeq ==
      Seq("doc_id", "lang", "n_chars", "source", "text"))
    val idRow = out.find(_.getString(0) == "doc_id").get
    val expected = docs.select(countDistinct(col("doc_id"))).first().getLong(0)
    assert(idRow.getLong(4) == expected)
    assert(idRow.getLong(1) == docs.count())
  }

  test("q193 takedown propagation: hand-counted stores and the dup re-exposure") {
    import spark.implicits._
    // 0 and 97 are struck (doc_id % 97 = 0); doc 1 duplicates doc 0's
    // text, so the kept representative (min id 0) dies while a copy
    // survives -> one re-exposure; 'unique' is owned solely by a
    // struck doc -> one emptied posting key
    val d = Seq(
      (0L, "aaa bbb"), (97L, "unique"), (1L, "aaa bbb"), (2L, "ccc"))
      .toDF("doc_id", "text")
    val out = CurationOps.takedownPropagation(d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("documents") == ((2L, 2L, 2L, 0L)))
    // postings: aaa{0,1} bbb{0,1} unique{97} ccc{2} -> 3 struck rows,
    // 3 terms touched, 'unique' emptied
    assert(out("postings") == ((3L, 3L, 1L, 0L)))
    assert(out("exact_dup_groups") == ((2L, 2L, 1L, 1L)),
      "rep 0 struck with survivor 1 must count as a re-exposure")
    // both struck docs carry text -> 8 band rows each
    val (brm, btch, bemp, bre) = out("band_buckets")
    assert(brm == 16L && btch >= 1L && bemp <= btch && bre == 0L)
  }
}
