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

  test("q126 gopher rules: each rule trips on its planted violation and only there") {
    // 60 tokens, mean word length 4.0, stopword hits, all-alpha
    val good = ("the quick brown fox jumps over the lazy dog again " * 6).trim
    val docs = Seq(
      (1L, "s0", good),                                     // passes all
      (2L, "s0", "the of and is too short"),                // < 50 tokens
      (3L, "s0", ("the of " + "x" * 800 + " ") * 30),       // mean word length > 10
      (4L, "s0", ("the of " + Seq.fill(64)("1234 4567").mkString(" "))), // < 80% alpha
      (5L, "s0", ("walrus otter heron " * 20).trim),        // 60 toks, no stopwords
      (6L, "s1", good)                                      // second source isolated
    ).toDF("doc_id", "source", "text")
    val out = TextAnalytics.gopherRules(docs)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    // (n_docs, n_pass, fail_count, fail_wordlen, fail_alpha, fail_stop)
    assert(out("s0") == ((5L, 1L, 1L, 1L, 1L, 1L)))
    assert(out("s1") == ((1L, 1L, 0L, 0L, 0L, 0L)))
  }

  test("q127 lexical stats: TTR/hapax/top-10 mass match a direct computation") {
    val docs = Seq(
      (1L, "s0", "aa bb aa cc aa bb dd"),
      (2L, "s0", "aa ee"),
      (3L, "s1", "zz")).toDF("doc_id", "source", "text")
    val out = TextAnalytics.lexicalStats(docs)
      .as[(String, Long, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // s0: tokens=9, types=5 (aa4 bb2 cc1 dd1 ee1), hapax=3; top10 covers all
    assert(out("s0")._2 == 9L && out("s0")._3 == 5L && out("s0")._4 == 3L)
    assert(out("s0")._5 == 5.0 / 9.0 && out("s0")._6 == 3.0 / 5.0 && out("s0")._7 == 1.0)
    // s1: a single hapax type
    assert(out("s1") == (("s1", 1L, 1L, 1L, 1.0, 1.0, 1.0)))
    // top-10 mass strictly < 1 once the vocabulary exceeds 10 types
    val wide = (1 to 30).map(i => (i.toLong, "w", s"t$i t$i common")).toDF("doc_id", "source", "text")
    val ws = TextAnalytics.lexicalStats(wide)
      .as[(String, Long, Long, Long, Double, Double, Double)].collect().head
    // 31 types over 90 tokens: top10 = common(30) + nine t_i pairs(18) = 48
    assert(ws._2 == 90L && ws._3 == 31L && ws._7 == 48.0 / 90.0)
  }

  test("q142 approx quantiles: exact <= approx <= exact + width - 1 vs q121 on the fixture") {
    val w = TextAnalytics.quantileBucketWidth
    val exact = TextAnalytics.q121.build(spark, sfDir)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5))).toMap
    val approx = TextAnalytics.q142.build(spark, sfDir)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5))).toMap
    assert(exact.nonEmpty && exact.keySet == approx.keySet)
    exact.foreach { case (src, (e50, e90, e99)) =>
      val (a50, a90, a99) = approx(src)
      Seq(("p50", e50, a50), ("p90", e90, a90), ("p99", e99, a99)).foreach {
        case (q, e, a) =>
          assert(e <= a && a <= e + w - 1,
            s"$src $q: approx $a outside [$e, ${e + w - 1}]")
      }
    }
  }

  test("q142 histogram is MERGEABLE: summed split histograms equal the full run") {
    // the 100 TB property: per-snapshot histograms fold by addition —
    // histogram each half separately, merge by summing bucket counts,
    // and the quantile rollup must equal the single-pass run
    val docs = Tables.documents(spark, sfDir)
    val full = TextAnalytics.approxLengthQuantiles(docs)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    val ha = TextAnalytics.lengthHistogram(docs.filter(col("doc_id") % 2 === 0))
    val hb = TextAnalytics.lengthHistogram(docs.filter(col("doc_id") % 2 === 1))
    val mergedHist = ha.unionByName(hb)
      .groupBy(col("source"), col("bkt"))
      .agg(sum(col("c")).cast("bigint").as("c"))
    val merged = TextAnalytics.quantilesFromHistogram(mergedHist)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(merged == full)
  }

  test("q158 calibration audit: bucket identities and the ordered ECE fold hold bit-exactly") {
    val rows = TextAnalytics.q158.build(spark, sfDir)
      .as[(Long, Long, Long, Double, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSeq == rows.map(_._1).toSeq.sorted)
    assert(rows.forall(r => r._1 >= 0 && r._1 <= 9), "score in (0,1) => decile 0..9")
    assert(rows.forall(r => r._3 >= 0 && r._3 <= r._2), "0 <= n_pos <= n_docs")
    val n = rows.map(_._2).sum
    rows.foreach { case (b, nd, np, mid, rate, gap, _) =>
      // same literal double ops as both engines
      assert(mid == (b.toDouble + 0.5) / 10.0)
      assert(rate == np.toDouble / nd.toDouble)
      assert(gap == math.abs(mid - rate))
    }
    // ECE = left fold of (n_b/N)*gap_b in bucket order from 0.0 — the
    // scalar every row repeats must equal a driver-side replay
    val ece = rows.sortBy(_._1)
      .foldLeft(0.0) { case (a, r) => a + r._2.toDouble / n.toDouble * r._6 }
    assert(rows.forall(_._7 == ece), s"ECE fold mismatch: ${rows.head._7} vs $ece")
  }

  test("repetitionLoops: token, bigram, trigram runs; junk rows rep 0") {
    val docs = Seq(
      (1L, "na na na na stop"),              // rep_1 = 4
      (2L, "ab cd ab cd ab cd"),             // rep_2 = 3, rep_1 = 1
      (3L, "x y z x y z x y z tail"),        // rep_3 = 3
      (4L, "one two three four five six"),   // no loops
      (5L, null),                            // junk
      (6L, "w w w w w"))                     // rep_1 = 5 -> looped
      .toDF("doc_id", "text")
    val out = TextAnalytics.repetitionLoops(docs).orderBy(col("doc_id"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(out(1L) == ((4L, 2L, 1L, false)))
    assert(out(2L) == ((1L, 3L, 1L, true)), "phrase loop at L=2 must flag")
    assert(out(3L)._3 == 3L)
    assert(out(3L)._4 == true)
    assert(out(4L) == ((1L, 1L, 1L, false)))
    assert(out(5L) == ((0L, 0L, 0L, false)), "junk row must report 0 reps")
    assert(out(6L)._1 == 5L && out(6L)._4 == true)
  }

  test("max_repeat_run codegen kernel == interpreted fold reference on random arrays") {
    import graft.functions.functions.max_repeat_run
    val rnd = new scala.util.Random(42)
    // small alphabet forces frequent accidental repeats at every L
    val docs = (0 until 60).map { i =>
      val n = rnd.nextInt(30)
      (i.toLong, (0 until n).map(_ => "abc" (rnd.nextInt(3)).toString).mkString(" "))
    }.toDF("doc_id", "text")
    val t = TextAnalytics.toks(col("text"))
    val withNt = docs.select(col("doc_id"), t.as("t"))
      .withColumn("nt", when(col("t").isNotNull, size(col("t"))))
    for (l <- 1 to 3) {
      val kern = when(col("nt") >= 2 * l, lit(1) + max_repeat_run(col("t"), l))
        .otherwise(when(col("nt") >= l, lit(1)).otherwise(lit(0))).cast("bigint")
      val rows = withNt
        .select(col("doc_id"), kern.as("k"),
          TextAnalytics.maxConsecRepInterpreted(col("t"), col("nt"), l).as("r"))
        .collect()
      rows.foreach(r => assert(r.getLong(1) == r.getLong(2),
        s"doc ${r.getLong(0)} L=$l: kernel ${r.getLong(1)} != reference ${r.getLong(2)}"))
    }
  }

  test("max_repeat_run == interpreted fold on arrays WITH null elements (structural null==null)") {
    import graft.functions.functions.max_repeat_run
    // Spark's array equality treats null elements as EQUAL
    // (array(null) === array(null) is true); the kernel must agree or
    // the kernel==reference pin silently excludes null-element arrays
    val rnd = new scala.util.Random(7)
    val docs = (0 until 40).map { i =>
      val n = rnd.nextInt(20)
      (i.toLong, (0 until n).map(_ =>
        if (rnd.nextInt(4) == 0) null else "ab"(rnd.nextInt(2)).toString))
    }.toDF("doc_id", "t")
      .withColumn("nt", when(col("t").isNotNull, size(col("t"))))
    for (l <- 1 to 3) {
      val kern = when(col("nt") >= 2 * l, lit(1) + max_repeat_run(col("t"), l))
        .otherwise(when(col("nt") >= l, lit(1)).otherwise(lit(0))).cast("bigint")
      val rows = docs
        .select(col("doc_id"), kern.as("k"),
          TextAnalytics.maxConsecRepInterpreted(col("t"), col("nt"), l).as("r"))
        .collect()
      rows.foreach(r => assert(r.getLong(1) == r.getLong(2),
        s"doc ${r.getLong(0)} L=$l: kernel ${r.getLong(1)} != reference ${r.getLong(2)}"))
    }
    // the canonical case spelled out: [null, null] at L=1 is one
    // repeat run (null == null), so reps = 2, matching the fold
    val two = Seq((0L, Seq[String](null, null))).toDF("doc_id", "t")
      .select(lit(1) + max_repeat_run(col("t"), 1)).head().getInt(0)
    assert(two == 2, "null==null must count as a stride-1 repeat")
  }

  test("q178 NB classifier: learns a lexical signal the fixed gate cannot see") {
    import spark.implicits._
    // pos docs pass every Gopher rule; neg docs fail ONLY the
    // word-length rule (avg > 10 chars) — a feature the fixed q109
    // classifier does not read. Both classes share nt, stop ratio,
    // and zero punct/digits, so every fixed score is IDENTICAL
    // (auc_fixed = 0.5, all ties), while the vocabularies are
    // disjoint outside the stopwords, so the learned NB separates
    // perfectly (auc_nb = 1.0).
    val posBase = "the cats and dogs race into barns on warm days "
    val negBase = "the catastrophically and dinosaurically proceeding " +
      "magnificently extraordinarily on unquestionably wonderfulness "
    // unique per-doc tails are LETTERS-ONLY and length-matched within
    // each class: a digit (or varying text length) would shift
    // digit_ratio/punct_ratio and break the all-fixed-scores-tie
    val tag = "abcd"
    val rows =
      (1L to 4L).map(i => (i, (posBase * 5) + s"tail${tag(i.toInt - 1)}", "en", "s1")) ++
      (5L to 8L).map(i =>
        (i, (negBase * 5) + s"extraordinarines${tag(i.toInt - 5)}", "en", "s1"))
    val d = rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    val out = TextAnalytics.nbClassifierAudit(d).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(1), r.getLong(2)) == ((4L, 4L)),
      s"4 gopher-pass vs 4 wordlen-fail expected, got ${r.getLong(1)}/${r.getLong(2)}")
    assert(r.getDouble(3) == 1.0,
      s"NB must separate the disjoint vocabularies, auc_nb = ${r.getDouble(3)}")
    assert(r.getDouble(4) == 0.5,
      s"fixed gate sees identical features: all-tied AUC must be 0.5, got ${r.getDouble(4)}")
  }

  test("aucBySource: perfect separation 1.0; ties average (not tie-break); one-class sources 0.0") {
    import spark.implicits._
    val scored = Seq(
      // sA: every positive above every negative => AUC 1.0
      ("sA", 0.9, 1L), ("sA", 0.8, 1L), ("sA", 0.7, 0L), ("sA", 0.6, 0L),
      // sB: pos {0.8, 0.6}, neg {0.8, 0.4} — the 0.8 TIE is worth 0.5,
      // so AUC = (0.5 + 1 + 0 + 1) / 4 = 0.625; a row_number tie-break
      // would fabricate 0.75 or 0.5 depending on order
      ("sB", 0.8, 1L), ("sB", 0.6, 1L), ("sB", 0.8, 0L), ("sB", 0.4, 0L),
      // sC: all positive — AUC undefined, reported 0.0
      ("sC", 0.5, 1L), ("sC", 0.9, 1L))
      .toDF("source", "score", "pos")
    val out = TextAnalytics.aucBySource(scored)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("sA") == ((2L, 2L, 1.0)))
    assert(out("sB") == ((2L, 2L, 0.625)), "tied scores must contribute 1/2, not a fabricated order")
    assert(out("sC") == ((2L, 0L, 0.0)))
  }

  test("classifierDiscrimination: gopher-passing docs outrank junk in a separable fixture") {
    import spark.implicits._
    // a "good" doc: 60 tokens, sane word lengths, alphabetic, stops
    val good = (("the quick brown fox jumps over the lazy dog and " * 6).trim)
    val bad = "x! y? z." // fails nt >= 50; scores low (punct-heavy)
    val docs = Seq(
      (1L, good, "s1"), (2L, good + " extra words here", "s1"),
      (3L, bad, "s1"), (4L, "1 2 3 4 5 6 7", "s1"))
      .toDF("doc_id", "text", "source").withColumn("lang", lit("en"))
    val out = TextAnalytics.classifierDiscrimination(docs)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val (np, nn, auc) = out("s1")
    assert(np == 2L && nn == 2L)
    assert(auc == 1.0, s"separable fixture must score AUC 1.0, got $auc")
  }

  test("q186 gate disagreement: NB acts on the lexical signal, the fixed gate ties — disagreement is exactly one class") {
    import spark.implicits._
    // the q178 corpus: 4 Gopher-pass docs vs 4 docs failing only the
    // word-length rule; every FIXED feature is identical across all 8
    // docs (one z for everyone), while the NB vocabularies separate
    // the classes perfectly
    val posBase = "the cats and dogs race into barns on warm days "
    val negBase = "the catastrophically and dinosaurically proceeding " +
      "magnificently extraordinarily on unquestionably wonderfulness "
    val tag = "abcd"
    val rows =
      (1L to 4L).map(i => (i, (posBase * 5) + s"tail${tag(i.toInt - 1)}", "en", "s1")) ++
      (5L to 8L).map(i =>
        (i, (negBase * 5) + s"extraordinarines${tag(i.toInt - 5)}", "en", "s1"))
    val d = rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    val out = TextAnalytics.gateDisagreement(d).collect()
    assert(out.length == 1)
    val r = out.head
    val (nDocs, bp, fo, no, bf) =
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    assert(nDocs == 8L && bp + fo + no + bf == 8L,
      "the four confusion cells must partition the docs")
    assert(r.getLong(8) == 8L,
      s"NB separates the classes perfectly: n_nb_correct = ${r.getLong(8)}")
    assert(r.getLong(7) == 4L,
      "one shared fixed z: the uniform gate is right on exactly one of the 4/4 classes")
    assert(r.getDouble(6) == 0.5,
      "uniform fixed gate vs 4/4 NB split: disagreement is exactly one class")
    // the two gates' pass counts are consistent with the cells
    assert(bp + fo == 0L || bp + fo == 8L,
      "identical fixed features => the fixed gate passes all docs or none")
    assert(bp + no == 4L, "NB passes exactly the Gopher-pass class")
  }

  test("q187 zipf audit: exact -1 slope on a 4/2 frequency pair; flat and singleton sources degrade to the documented zeros") {
    import spark.implicits._
    val docs = Seq(
      // freqs 4,2 at ranks 1,2: slope = (ln2-ln4)/(ln2-ln1) = -1
      // EXACTLY even in micro-nats (1386294 = 2*693147)
      (1L, "aa aa aa aa bb bb", "zipf"),
      // equal freqs: zero y-variance => slope 0, r2 0, dev 1
      (2L, "cc cc cc dd dd dd", "flat"),
      // single type: no fit (n_types < 2)
      (3L, "ee", "one"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
    val out = TextAnalytics.zipfAudit(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    val (nt, ntok, slope, intercept, r2, dev) = out("zipf")
    assert((nt, ntok) == ((2L, 6L)))
    assert(slope == -1.0, s"micro-nat-exact -1 expected, got $slope")
    assert(r2 == 1.0, s"two points fit perfectly, got $r2")
    assert(dev == 0.0)
    // intercept = mean(y) - slope*mean(x) = (1386294+693147)/2 + 693147/2
    //           = 1386294 micro-nats -> 1.386294 nats (ln of freq at rank 1)
    assert(intercept == 1.386294, s"ln-Zipf-constant in nats, got $intercept")
    assert(out("flat") == ((2L, 6L, 0.0, 1.098612, 0.0, 1.0)),
      "zero y-variance: slope 0 (intercept = mean ln freq = ln 3), r2 0, dev 1")
    assert(out("one") == ((1L, 1L, 0.0, 0.0, 0.0, 1.0)),
      "a single type cannot be fit")
  }

  /** Independent Scala reference of the q189 KN statistics over a
    * token list corpus — plain Maps, no Spark, no shared code with
    * the kernel.
    */
  private def knRef(docs: Seq[(Long, String)]) = {
    val tokd = docs.map { case (id, t) =>
      id -> t.split("[ \t\n\f\r]+").filter(_.nonEmpty).toSeq }
    val bgs = tokd.flatMap { case (id, w) =>
      if (w.length >= 2) w.sliding(2).map(p => (id, p(0), p(1))).toSeq else Nil }
    val c12 = bgs.groupBy(b => (b._2, b._3)).view.mapValues(_.size.toLong).toMap
    val c1 = c12.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n1f = c12.keys.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1b = c12.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nn = c12.size.toLong
    (tokd, bgs, c12, c1, n1f, n1b, nn)
  }

  test("q189 KN: per-context probabilities sum to exactly 1 (integer identity)") {
    // sum over OBSERVED (w1,w2) of (4*c12-3)*NN plus sum over ALL
    // second-word types of 3*n1f(w1)*n1b(w2) must equal 4*c1(w1)*NN
    // for every context w1 — the exact-rational normalization of the
    // interpolated KN model over a common denominator
    val (_, _, c12, c1, n1f, n1b, nn) = knRef(Seq(
      1L -> "a b a b c b", 2L -> "b c d a a", 3L -> "c a b b b x y"))
    val secondTypes = n1b.keys.toSeq
    c1.keys.foreach { w1 =>
      val disc = c12.collect { case ((h, _), c) if h == w1 =>
        BigInt(4 * c - 3) * BigInt(nn) }.sum
      val back = secondTypes.map(w2 =>
        BigInt(3) * BigInt(n1f(w1)) * BigInt(n1b(w2))).sum
      assert(disc + back == BigInt(4) * BigInt(c1(w1)) * BigInt(nn),
        s"KN mass for context '$w1' does not normalize")
    }
  }

  test("q189 KN kernel matches an independent reference, zeros on degenerate docs") {
    import spark.implicits._
    val corpus = Seq(1L -> "a b a b c b", 2L -> "b c d a a",
      3L -> "c a b b b x y", 4L -> "solo", 5L -> "")
    val (tokd, bgs, c12, c1, n1f, n1b, nn) = knRef(corpus)
    def lnMicro(x: Long): Long = graft.ops.Sampling.lnMicro(x)
    val expected = tokd.map { case (id, w) =>
      val mine = bgs.filter(_._1 == id)
      val s = mine.map { case (_, w1, w2) =>
        lnMicro((4 * c12((w1, w2)) - 3) * nn + 3 * n1f(w1) * n1b(w2)) -
          lnMicro(4 * c1(w1) * nn) }.sum
      val n = mine.size.toLong
      id -> ((n, s, if (n == 0) 0.0 else s.toDouble / (n.toDouble * 1e6)))
    }.toMap
    val out = TextAnalytics.knBigramLogProb(
      corpus.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet == expected.keySet)
    expected.foreach { case (id, e) =>
      assert(out(id) == e, s"doc $id: kernel ${out(id)} != reference $e")
    }
    assert(out(4L) == ((0L, 0L, 0.0)), "one-token doc scores zero")
    assert(out(5L) == ((0L, 0L, 0.0)), "empty doc scores zero")
  }

  test("q189 KN discounts frequent-but-predictable continuations below their raw MLE share") {
    import spark.implicits._
    // 'q' follows ONLY 'p' (predictable) though frequent; 'z' follows
    // many contexts. KN's continuation count must hold P(q | fresh
    // context) below P(z | fresh context) even when raw unigram
    // frequency says otherwise.
    val docs = Seq(
      1L -> "p q p q p q p q p q p q",
      2L -> "a z b z c z d z",
      3L -> "e z f q") // f->q: the fresh context for q; e->z for z
    val (_, _, c12, c1, n1f, n1b, nn) = knRef(docs.map(d => (d._1, d._2)))
    def p(w1: String, w2: String): Double =
      ((4.0 * c12((w1, w2)) - 3.0) * nn + 3.0 * n1f(w1) * n1b(w2)) /
        (4.0 * c1(w1) * nn)
    assert(n1b("q") < n1b("z"), "fixture: q has fewer distinct contexts")
    assert(p("f", "q") < p("e", "z"),
      "continuation smoothing must rank the versatile word higher in a fresh context")
  }

  test("q191 operating points: confusion identities and threshold monotonicity per gate") {
    val rows = TextAnalytics.gateOperatingPoints(spark,
      Tables.documents(spark, sfDir))
      .orderBy(col("gate"), col("thr_num")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getDouble(7), r.getDouble(8),
        r.getDouble(9)))
    assert(rows.length == 38, "19 thresholds x 2 gates")
    rows.groupBy(_._1).foreach { case (gate, g) =>
      // tp+fn and fp+tn are the label marginals — constant across
      // thresholds for a gate (every doc is classified at every cut)
      assert(g.map(r => r._3 + r._5).distinct.size == 1,
        s"$gate: positives leak across thresholds")
      assert(g.map(r => r._4 + r._6).distinct.size == 1,
        s"$gate: negatives leak across thresholds")
      // raising the cut can only shrink the predicted-positive set
      g.sortBy(_._2).sliding(2).foreach { case Array(a, b) =>
        assert(b._3 + b._4 <= a._3 + a._4,
          s"$gate: predicted positives grew as the threshold rose " +
            s"(${a._2} -> ${b._2}: ${a._3 + a._4} -> ${b._3 + b._4})")
        assert(b._8 <= a._8,
          s"$gate: recall must be non-increasing in the threshold")
      }
      g.foreach { case (_, t, tp, fp, fn, _, prec, rec, f1) =>
        assert(prec >= 0.0 && prec <= 1.0 && rec >= 0.0 && rec <= 1.0 &&
          f1 >= 0.0 && f1 <= 1.0, s"$gate@$t: ratio out of [0,1]")
        if (2 * tp + fp + fn > 0)
          assert(f1 == 2.0 * tp / (2.0 * tp + fp + fn).toDouble,
            s"$gate@$t: f1 must be the single exact division")
      }
    }
  }
}
