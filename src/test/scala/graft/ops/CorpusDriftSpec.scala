package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.util.Random

/** Edge-case semantics for the drift/novelty/attribution/representative
  * operators (q133–q136). The DuckDB oracle proves fixture agreement;
  * these prove the kernels on shapes the fixture never produces
  * (unattributed purchases, tie timestamps, identical and disjoint
  * sources, re-crawled duplicates) plus plain-Scala replays on random
  * inputs.
  */
class CorpusDriftSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------
  // q133 click attribution
  // ---------------------------------------------------------------

  private def eventsDf(rows: Seq[(Long, Long, String, Long)]): DataFrame =
    rows.toDF("event_id", "user_id", "event_type", "tsm")
      .select(col("event_id"), col("user_id"), col("event_type"),
        timestamp_micros(col("tsm")).as("ts"))

  test("q133: window edges, ties, and unattributed purchases") {
    val S = 1000000L
    val ev = eventsDf(Seq(
      // user 1: click at t=100, purchase at t=200 -> gap 100
      (1L, 1L, "click", 100 * S),
      (2L, 1L, "purchase", 200 * S),
      // user 1: purchase exactly 1h after the click -> still attributed
      (3L, 1L, "purchase", (100 + 3600) * S),
      // user 1: purchase 1h+1us after the click -> expired
      (4L, 1L, "purchase", (100 + 3600) * S + 1),
      // user 2: purchase before any click -> unattributed
      (5L, 2L, "purchase", 50 * S),
      (6L, 2L, "click", 60 * S),
      // user 2: two clicks at the same ts -> max event_id wins
      (7L, 2L, "click", 70 * S),
      (8L, 2L, "click", 70 * S),
      (9L, 2L, "purchase", 80 * S),
      // user 3: click at the same instant as the purchase -> gap 0
      (10L, 3L, "click", 500 * S),
      (11L, 3L, "purchase", 500 * S)))
    val got = Extended.clickAttribution(ev)
      .select(col("event_id"), col("click_id"), col("gap_s"))
      .as[(Long, Option[Long], Option[Long])].collect()
      .map { case (k, a, b) => k -> ((a, b)) }.toMap
    assert(got(2L) == ((Some(1L), Some(100L))))
    assert(got(3L) == ((Some(1L), Some(3600L))))
    assert(got(4L) == ((None, None)), s"expired click must not attribute: ${got(4L)}")
    assert(got(5L) == ((None, None)))
    assert(got(9L) == ((Some(8L), Some(10L))), "same-ts tie must pick max event_id")
    assert(got(11L) == ((Some(10L), Some(0L))))
  }

  // ---------------------------------------------------------------
  // q134 source divergence
  // ---------------------------------------------------------------

  private def docsDf(rows: Seq[(Long, String, String)]): DataFrame =
    rows.toDF("doc_id", "source", "text")

  test("q134: identical sources diverge 0; disjoint sources emit l1=2.0") {
    val d = docsDf(Seq(
      (1L, "a", "x y z x"),
      (2L, "b", "x x y z"),   // same multiset as a
      (3L, "c", "p q r")))    // disjoint from both
    val got = CorpusDrift.sourceDivergence(d)
      .select(col("s1"), col("s2"), col("l1"))
      .as[(String, String, Double)].collect()
      .map { case (a, b, l) => (a, b) -> l }.toMap
    assert(got(("a", "b")) == 0.0)
    assert(got(("a", "c")) == 2.0 && got(("b", "c")) == 2.0,
      "zero-shared-vocab pairs are maximal drift and must surface, not vanish")
    assert(got.size == 3, "every source pair emits exactly one row")
  }

  test("q134: random corpora match a plain-Scala L1 over full vocab") {
    val rnd = new Random(134L)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val rows = for {
      s <- Seq("s1", "s2", "s3"); i <- 0 until 10
    } yield {
      val n = 1 + rnd.nextInt(12)
      (s.hashCode.toLong + i, s,
        Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val got = CorpusDrift.sourceDivergence(docsDf(rows))
      .select(col("s1"), col("s2"), col("l1"))
      .as[(String, String, Double)].collect()
      .map { case (a, b, l) => (a, b) -> l }.toMap
    val counts: Map[String, Map[String, Long]] = rows.groupBy(_._2).map {
      case (s, rs) =>
        s -> rs.flatMap(_._3.split("\\s+")).groupBy(identity)
          .map { case (t, ts) => t -> ts.size.toLong }
    }
    for {
      s1 <- counts.keys; s2 <- counts.keys if s1 < s2
    } {
      val (c1, c2) = (counts(s1), counts(s2))
      val (n1, n2) = (c1.values.sum, c2.values.sum)
      val expect = (c1.keySet ++ c2.keySet).toSeq.map { t =>
        math.abs(c1.getOrElse(t, 0L) * n2 - c2.getOrElse(t, 0L) * n1).toDouble
      }.sum / (n1.toDouble * n2.toDouble)
      assert(math.abs(got((s1, s2)) - expect) < 1e-12,
        s"($s1,$s2): got ${got((s1, s2))}, expected $expect")
      assert(got((s1, s2)) >= 0.0 && got((s1, s2)) <= 2.0)
    }
  }

  // ---------------------------------------------------------------
  // q136 n-gram novelty
  // ---------------------------------------------------------------

  test("q136: first doc scores 1.0, an exact re-crawl scores 0.0") {
    val text = (1 to 20).map(i => s"w$i").mkString(" ")
    val d = Seq((1L, "s", text), (2L, "s", text),
      (3L, "s", "completely different words here now ok yes done"))
      .toDF("doc_id", "source", "text")
    val got = CorpusDrift.ngramNovelty(d)
      .select(col("doc_id"), col("novelty"))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) == 1.0)
    assert(got(2L) == 0.0, "verbatim duplicate of an earlier doc has no novel shingles")
    assert(got(3L) == 1.0)
  }

  test("q136: random docs match a plain-Scala replay (min-1-window shingles)") {
    val rnd = new Random(136L)
    val vocab = Vector("a", "b", "c", "d", "e")
    val rows = (0L until 12L).map { i =>
      (i, "s", Seq.fill(1 + rnd.nextInt(14))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }
    def shingles8(text: String): Set[String] = {
      val t = text.split("\\s+").filter(_.nonEmpty)
      if (t.isEmpty) Set.empty
      else (0 to math.max(t.length - 8, 0))
        .map(i => t.slice(i, i + 8).mkString(" ")).toSet
    }
    val firsts = rows.flatMap { case (id, _, tx) => shingles8(tx).map(_ -> id) }
      .groupBy(_._1).map { case (sh, xs) => sh -> xs.map(_._2).min }
    val expect = rows.map { case (id, _, tx) =>
      val sh = shingles8(tx)
      id -> ((sh.size.toLong, sh.count(s => firsts(s) == id).toLong))
    }.toMap
    val got = CorpusDrift.ngramNovelty(rows.toDF("doc_id", "source", "text"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"))
      .as[(Long, Long, Long)].collect()
      .map { case (id, a, b) => id -> ((a, b)) }.toMap
    assert(got == expect)
  }

  // ---------------------------------------------------------------
  // q135 cluster representative
  // ---------------------------------------------------------------

  test("q135: representative is its cluster's max-qscore member (fixture)") {
    val reps = SparkEntry_q135(spark, sfDir)
    // cross-check against q85's membership + the shared quality kernel
    val members = Dedup.q85.build(spark, sfDir)
      .select(col("cluster_id"), col("members"))
      .as[(Long, String)].collect()
      .map { case (c, m) => c -> m.split(",").map(_.toLong).toSeq }.toMap
    val qs = TextAnalytics.qualityBase(
        Tables.documents(spark, sfDir).filter(col("doc_id") < 100))
      .select(col("doc_id"), col("qscore")).as[(Long, Double)].collect().toMap
    assert(reps.nonEmpty)
    reps.foreach { case (cid, rep, repQ, nMembers, nDisplaced) =>
      val mem = members(cid)
      assert(mem.contains(rep), s"rep $rep not in cluster $cid")
      assert(nMembers == mem.size && nDisplaced == mem.size - 1)
      val maxQ = mem.map(qs).max
      assert(repQ == maxQ, s"cluster $cid rep qscore $repQ != max $maxQ")
      assert(rep == mem.filter(d => qs(d) == maxQ).min,
        "qscore tie must break to the lowest doc_id")
    }
  }

  private def SparkEntry_q135(s: org.apache.spark.sql.SparkSession, dir: String) =
    Dedup.q135.build(s, dir)
      .select(col("cluster_id"), col("rep_doc_id"), col("rep_qscore"),
        col("n_members"), col("n_displaced"))
      .as[(Long, Long, Double, Long, Long)].collect().toSeq

  // ---------------------------------------------------------------
  // incremental first-seen index + per-batch novelty
  // ---------------------------------------------------------------

  private def randomDocs(seed: Long, ids: Range): Seq[(Long, String, String)] = {
    val rnd = new Random(seed)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    ids.map { i =>
      (i.toLong, "s", Seq.fill(1 + rnd.nextInt(16))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }
  }

  test("first-seen index: N-delta fold in any order == full rebuild") {
    val all = randomDocs(7L, 0 until 30)
    val batches = Seq(all.slice(0, 7), all.slice(7, 19), all.slice(19, 30))
    val rebuild = CorpusDrift.buildFirstSeen(docsDf(all))
      .as[(Long, Long)].collect().toSet
    // fold the three deltas in every permutation
    batches.permutations.foreach { perm =>
      val folded = perm.foldLeft(CorpusDrift.buildFirstSeen(docsDf(Seq.empty))) {
        (idx, b) => CorpusDrift.upsertFirstSeen(idx, docsDf(b))
      }.as[(Long, Long)].collect().toSet
      assert(folded == rebuild, "fold order must not matter")
    }
  }

  test("per-batch novelty vs folded index == one-shot q136 over the full corpus") {
    val all = randomDocs(8L, 0 until 36)
    val batches = Seq(all.slice(0, 12), all.slice(12, 25), all.slice(25, 36))
    val oneShot = CorpusDrift.ngramNovelty(docsDf(all))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"))
      .as[(Long, Long, Long)].collect().toSet
    var index = CorpusDrift.buildFirstSeen(docsDf(Seq.empty))
    val incremental = batches.flatMap { b =>
      val scored = CorpusDrift.noveltyAgainstIndex(index, docsDf(b))
        .select(col("doc_id"), col("n_shingles"), col("n_novel"))
        .as[(Long, Long, Long)].collect()
      index = CorpusDrift.upsertFirstSeen(index, docsDf(b))
      scored
    }.toSet
    assert(incremental == oneShot,
      s"onlyInc=${(incremental -- oneShot).take(3)} onlyFull=${(oneShot -- incremental).take(3)}")
  }

  test("bloom pre-strike novelty equals the plain index kernel (incl. empty index)") {
    val all = randomDocs(9L, 0 until 40)
    val batches = Seq(all.slice(0, 14), all.slice(14, 28), all.slice(28, 40))
    var index = CorpusDrift.buildFirstSeen(docsDf(Seq.empty))
    batches.foreach { b =>
      val plain = CorpusDrift.noveltyAgainstIndex(index, docsDf(b))
        .select(col("doc_id"), col("n_shingles"), col("n_novel"))
        .as[(Long, Long, Long)].collect().toSet
      // tiny bloom (high collision pressure) so false positives are
      // actually exercised: exactness must not depend on fpp
      val bloomed = CorpusDrift.noveltyAgainstIndexBloom(index, docsDf(b),
          expectedItems = 8L, fpp = 0.5)
        .select(col("doc_id"), col("n_shingles"), col("n_novel"))
        .as[(Long, Long, Long)].collect().toSet
      assert(bloomed == plain,
        s"onlyBloom=${(bloomed -- plain).take(3)} onlyPlain=${(plain -- bloomed).take(3)}")
      index = CorpusDrift.upsertFirstSeen(index, docsDf(b))
    }
  }

  // ---------------------------------------------------------------
  // q156 snapshot diff
  // ---------------------------------------------------------------

  test("q156: add/remove/change/unchanged accounting, source attribution, token deltas") {
    val va = Seq(
      (1L, "s1", "one two three"),        // unchanged
      (2L, "s1", "old words here"),       // changed in B (and re-sourced)
      (3L, "s2", "will be removed soon"), // removed
      // PRESENT row with null text: must read as changed (text filled
      // in B), never as "added" — presence is a row property
      (5L, "s3", null.asInstanceOf[String]))
      .toDF("doc_id", "source", "text")
    val vb = Seq(
      (1L, "s1", "one two three"),
      // changed doc moved to source s2: B's source wins the attribution
      (2L, "s2", "new words here now"),
      (4L, "s2", "brand new document"),   // added
      (5L, "s3", "text arrived late"))    // null -> text = changed
      .toDF("doc_id", "source", "text")
    val got = CorpusDrift.snapshotDiff(va, vb)
      .select("source", "n_added", "n_removed", "n_changed", "n_unchanged",
        "tok_delta")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // s1: doc 1 unchanged (delta 0)
    assert(got("s1") == (("s1", 0L, 0L, 0L, 1L, 0L)))
    // s2: doc 4 added (+3 tokens), doc 3 removed (-4), doc 2 changed
    // under its NEW source (4 - 3 = +1) -> net 0
    assert(got("s2") == (("s2", 1L, 1L, 1L, 0L, 0L)))
    // s3: null-text row present in BOTH snapshots -> changed, +3 tokens
    assert(got("s3") == (("s3", 0L, 0L, 1L, 0L, 3L)))
  }

  test("q163 quality drift: a boilerplate-shipping source spikes; conforming sources don't") {
    // srcA/srcB: normal prose (stopwords, long docs -> high qscore
    // deciles); srcC: digit-soup shorts (digit_ratio ~1, no stopwords
    // -> bottom deciles). srcC's decile histogram diverges from the
    // corpus where srcA/srcB mirror each other.
    val prose = "the quick brown fox jumps over the lazy dog and runs on " +
      "to the river where it is seen in the morning light again and again"
    val junk = "404 12 9999 31337 007 55 1234567"
    val docs = (
      (1 to 8).map(i => (i.toLong, "srcA", prose + s" v$i")) ++
      (9 to 16).map(i => (i.toLong, "srcB", prose + s" w$i")) ++
      (17 to 24).map(i => (i.toLong, "srcC", junk + s" $i"))
    ).map { case (id, src, t) => (id, "en", src, t) }
      .toDF("doc_id", "lang", "source", "text")
    val got = CorpusDrift.qualityScoreDrift(docs)
      .select("source", "n_docs", "dof", "chi2")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == Set("srcA", "srcB", "srcC"))
    assert(got.values.forall(_._2 == 8L))
    assert(got("srcC")._4 > got("srcA")._4 * 3 &&
      got("srcC")._4 > got("srcB")._4 * 3,
      s"junk source must dominate the drift statistic: $got")
    // identical-quality sources score identically (same decile rows)
    assert(got("srcA")._4 == got("srcB")._4)
  }

  test("q151 length buckets exclude junk n_chars (negative/NULL) on both engines' semantics") {
    import spark.implicits._
    val docs = Seq[(String, java.lang.Long)](
      ("a", 100L), ("a", 300L), ("b", 100L), ("b", 300L),
      ("a", -1L),   // Spark div -> bucket 0, DuckDB // -> bucket -1: must be excluded
      ("b", null))  // NULL bucket folds nulls-first vs nulls-last: must be excluded
      .toDF("source", "n_chars")
      .select(col("source"), col("n_chars").cast("long").as("n_chars"))
    val clean = docs.filter(col("n_chars").isNotNull && col("n_chars") >= 0)
    val a = CorpusDrift.sourceLengthDrift(docs)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    val b = CorpusDrift.sourceLengthDrift(clean)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(a == b, "junk rows must not reach the chi-square spine")
    assert(a("a")._1 == 2L && a("b")._1 == 2L)
  }

  test("q197 embedding cell drift: shifted current window spikes, conforming one does not") {
    import spark.implicits._
    // centers = first 8 by vec_id (lloydIters=1): 8 DIRECTIONALLY
    // distinct anchors (assignment distance is cosine — collinear
    // anchors would be indistinguishable); ref vectors (id % 10 < 8)
    // point exactly along center 0, cur vectors along center 7
    val anchors = (0 until 8).map(i => (i.toLong, Seq(1.0f, i.toFloat)))
    val ref = Seq(10L, 11L, 20L, 21L, 30L).map(id => (id, Seq(2.0f, 0.0f)))
    val cur = Seq(18L, 19L, 28L).map(id => (id, Seq(2.0f, 14.0f)))
    val junk = Seq((99L, null.asInstanceOf[Seq[Float]]))
    val emb = (anchors ++ ref ++ cur ++ junk).toDF("vec_id", "embedding")
    val out = CorpusDrift.embeddingCellDrift(emb)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(out.keySet == Set("ref", "cur"))
    // 8 anchors (ids 0..7, all % 10 < 8) + 5 ref = 13; junk excluded
    assert(out("ref")._1 == 13L, s"ref window miscounted: $out")
    assert(out("cur")._1 == 3L)
    assert(out("cur")._2 > out("ref")._2,
      "the shifted current window must out-score the reference")

    // a conforming current window (same cell as ref mass) scores lower
    // than the shifted one did
    val cur2 = Seq(18L, 19L, 28L).map(id => (id, Seq(2.0f, 0.0f)))
    val emb2 = (anchors ++ ref ++ cur2).toDF("vec_id", "embedding")
    val out2 = CorpusDrift.embeddingCellDrift(emb2)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out2("cur") < out("cur")._2,
      "a conforming window must score below the shifted one")
  }

  test("q201 per-cell drilldown re-folds to q197's scalar and conserves the windows") {
    import spark.implicits._
    val anchors = (0 until 8).map(i => (i.toLong, Seq(1.0f, i.toFloat)))
    val ref = Seq(10L, 11L, 20L, 21L, 30L).map(id => (id, Seq(2.0f, 0.0f)))
    val cur = Seq(18L, 19L, 28L).map(id => (id, Seq(2.0f, 14.0f)))
    val emb = (anchors ++ ref ++ cur).toDF("vec_id", "embedding")
    val detail = CorpusDrift.embeddingCellDriftDetail(emb)
      .orderBy(col("cell")).collect()
    val scalar = CorpusDrift.embeddingCellDrift(emb)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    // exact-integer window conservation
    assert(detail.map(_.getLong(1)).sum == scalar("ref")._1)
    assert(detail.map(_.getLong(2)).sum == scalar("cur")._1)
    // the per-cell cur terms, folded in cell order from 0.0, ARE the
    // q197 cur chi2 (same formula, same fold order) — bit-equal
    val refolded = detail.map(_.getDouble(6)).foldLeft(0.0)(_ + _)
    assert(refolded == scalar("cur")._2,
      s"detail terms $refolded != q197 chi2 ${scalar("cur")._2}")
    // shares sum to 1 per window (exact counts over exact totals)
    assert(math.abs(detail.map(_.getDouble(3)).sum - 1.0) < 1e-12)
    assert(math.abs(detail.map(_.getDouble(4)).sum - 1.0) < 1e-12)
    // the shifted cell carries the dominant term
    val top = detail.maxBy(_.getDouble(6))
    assert(top.getLong(0) == 7L && top.getDouble(5) > 0.0,
      s"cell 7 must dominate the drift: ${top}")
  }
}
