package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-family) subword segmentation — the second
  * tokenizer family next to BPE (q38/q105/q160/q170). Where BPE builds
  * words bottom-up along a learned merge order, the unigram model
  * scores every possible segmentation under piece log-probabilities
  * and keeps the Viterbi-best one (Kudo 2018's inference step, with
  * the frequency-derived piece distribution standing in for the
  * EM-trained one — same pipeline shape; an EM-trained piece table
  * plugs in as a different lp map).
  *
  * Determinism contract: piece probabilities are exact rationals
  * (substring frequency over vocabulary total), ln enters ONLY via
  * the micro-nat discipline (one rounded ln per DISTINCT vocab piece
  * — the q116/q176 rule), and the Viterbi DP maximizes an INTEGER
  * score with a pinned tie rule (equal score → longer final piece),
  * so both engines segment identically with no float fold anywhere.
  */
object UnigramLm {

  /** Maximum piece length enumerated into the vocabulary (and the DP
    * lookback width — the two must agree, and the DuckDB twin's
    * carried-state window is sized by it).
    */
  val MaxPiece = 4

  /** Multi-character vocabulary budget (all observed single characters
    * are always in, so every word stays segmentable).
    */
  val TopMulti = 64

  /** Viterbi segmentation of one word under integer micro-nat piece
    * scores: best[i] = max over L ≤ MaxPiece of best[i−L] + lp(piece
    * ending at i), ties to the LONGER piece (the twin's struct-max
    * (score, L) order — iterating L ascending with >= keeps the
    * largest maximal L). Returns (piece count, total score) or null
    * when the word cannot be segmented from the vocab (impossible
    * when the vocab carries every observed character; the guard keeps
    * a foreign word from crashing the scan).
    *
    * The DP indexes CODE POINTS, the same unit the vocabulary
    * enumeration (Spark `substr`/`length`) and the DuckDB twin count
    * — an astral-plane word segments by whole characters instead of
    * silently nulling out because its vocab pieces (whole code
    * points) never matched the kernel's former UTF-16 surrogate-half
    * substrings.
    */
  def segment(w: org.apache.spark.unsafe.types.UTF8String,
              vocab: java.util.HashMap[String, java.lang.Long],
              maxPiece: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val s = w.toString
    val cps = s.codePoints().toArray
    val n = cps.length
    val score = new Array[Long](n + 1)
    val np = new Array[Long](n + 1)
    val reach = new Array[Boolean](n + 1)
    reach(0) = true
    var i = 1
    while (i <= n) {
      var bestS = Long.MinValue
      var bestN = 0L
      var found = false
      var L = 1
      val maxL = math.min(maxPiece, i)
      while (L <= maxL) {
        if (reach(i - L)) {
          val lp = vocab.get(new String(cps, i - L, L))
          if (lp != null) {
            val cand = score(i - L) + lp.longValue()
            if (!found || cand >= bestS) {
              bestS = cand
              bestN = np(i - L) + 1L
              found = true
            }
          }
        }
        L += 1
      }
      if (found) { score(i) = bestS; np(i) = bestN; reach(i) = true }
      i += 1
    }
    if (!reach(n)) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](np(n), score(n)))
  }

  /** [[segment]] with the PIECES materialized: the same forward DP
    * (same candidate order, same ties-to-longer rule — the chosen L is
    * the LAST `>=` update, i.e. the largest maximizer) plus a recorded
    * per-position choice and a backtrack, returning the Viterbi piece
    * sequence left-to-right. The q199 E-step consumes this (expected
    * piece counts under the Viterbi segmentation); kept separate from
    * [[segment]] so the hot q192 path never allocates piece arrays.
    * Returns null when the word cannot be segmented (as there).
    */
  def segmentPieces(w: org.apache.spark.unsafe.types.UTF8String,
                    vocab: java.util.HashMap[String, java.lang.Long],
                    maxPiece: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val s = w.toString
    val cps = s.codePoints().toArray
    val n = cps.length
    val score = new Array[Long](n + 1)
    val reach = new Array[Boolean](n + 1)
    val choice = new Array[Int](n + 1)
    reach(0) = true
    var i = 1
    while (i <= n) {
      var bestS = Long.MinValue
      var bestL = 0
      var found = false
      var L = 1
      val maxL = math.min(maxPiece, i)
      while (L <= maxL) {
        if (reach(i - L)) {
          val lp = vocab.get(new String(cps, i - L, L))
          if (lp != null) {
            val cand = score(i - L) + lp.longValue()
            if (!found || cand >= bestS) {
              bestS = cand
              bestL = L
              found = true
            }
          }
        }
        L += 1
      }
      if (found) { score(i) = bestS; choice(i) = bestL; reach(i) = true }
      i += 1
    }
    if (!reach(n)) null
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      var p = n
      while (p > 0) {
        val L = choice(p)
        out += org.apache.spark.unsafe.types.UTF8String
          .fromString(new String(cps, p - L, L))
        p -= L
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        out.reverse.toArray)
    }
  }

  def all: Seq[QueryDef] = Seq(q192, q194, q199)

  private val duckToks = TwinSql.toksSql

  /** The (source, word, count) and (word, count) frequency tables plus
    * the piece vocabulary with micro-nat log-probs, collected to the
    * driver (vocabulary-sized by construction: observed characters +
    * [[TopMulti]] substrings — the BPE-merge/k-means-centers collect
    * precedent). Piece frequency counts EVERY occurrence position in
    * every word type, weighted by word frequency; ties at the
    * multi-piece cutoff break (freq desc, piece asc).
    */
  private def pieceLp(wf: DataFrame): Seq[(String, Long)] = {
    val sub = wf
      .select(col("word"), col("wn"),
        explode(sequence(lit(1), length(col("word")))).as("s"))
      .select(col("word"), col("wn"), col("s"),
        explode(sequence(lit(1), lit(MaxPiece))).as("l"))
      .filter(col("s") + col("l") <= length(col("word")) + 1)
      .select(expr("substr(word, s, l)").as("piece"), col("wn"))
      .groupBy(col("piece")).agg(sum(col("wn")).cast("bigint").as("freq"))
    val chars = sub.filter(length(col("piece")) === 1)
    val multi = sub.filter(length(col("piece")) >= 2)
      .orderBy(col("freq").desc, col("piece")).limit(TopMulti)
    val vocab = chars.union(multi).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    require(vocab.length <= 100000,
      s"unigram vocab ${vocab.length} exceeds the driver-side budget")
    val tot = vocab.map(_._2).sum
    // the ONE driver-side micro-nat rounding (Sampling.lnMicro(Long)):
    // a local math.round here would be a third, subtly different rule
    vocab.map { case (p, f) =>
      p -> (Sampling.lnMicro(f) - Sampling.lnMicro(tot))
    }.toSeq
  }

  /** Per-source segmentation rollup (the q192 kernel): word counts,
    * Viterbi piece counts, pieces-per-word fertility, and the mean
    * per-word log-prob in nats. The DP runs once per word TYPE (the
    * type table is vocabulary-bounded, never corpus-sized) through
    * the codegen [[graft.functions.UnigramSegmentExpr]]; per-source
    * occurrence counts then weight the type results.
    *
    * Scale: ONE corpus-sized aggregate (the (source, word) counts —
    * partial+final, map-side combined); everything downstream is
    * word-type- or vocabulary-sized: the substring enumeration
    * explodes the type table, the top-[[TopMulti]] cut is
    * TakeOrdered (never a global sort), the lp map broadcasts inside
    * the codegen expression, and the rollup re-aggregates the type
    * join to source rows.
    */
  /** The (source, word, swn) occurrence-count table — the unigram
    * pipeline's COMPLETE sufficient statistic (word freqs, the piece
    * vocabulary, the lp map, every segmentation, and the rollup all
    * derive from it), additive over batches (what
    * [[graft.streaming.UnigramStream]] maintains incrementally). ONE
    * definition shared by the batch kernel and the stream — their
    * parity is bit-exact only because both sides count with this
    * exact chain.
    */
  private[graft] def sourceWordCounts(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), explode(TextAnalytics.toks(col("text"))).as("word"))
      .groupBy(col("source"), col("word"))
      .agg(count(lit(1)).cast("bigint").as("swn"))

  /** The full per-source rollup given the trainer state (`sw` from
    * [[sourceWordCounts]] or the streaming store): derive the vocab +
    * lp map, Viterbi-segment the word types, weight by occurrence
    * counts.
    */
  private[graft] def segmentationFromCounts(sw: DataFrame): DataFrame = {
    val wf = sw.groupBy(col("word")).agg(sum(col("swn")).cast("bigint").as("wn"))
    val lp = pieceLp(wf)
    val seg = wf
      .select(col("word"),
        graft.functions.functions.unigram_segment(col("word"), lp, MaxPiece)
          .as("seg"))
      .select(col("word"), col("seg.n_pieces").as("np"),
        col("seg.score_micro").as("sc"))
    sw.join(seg, Seq("word"))
      .groupBy(col("source"))
      .agg(sum(col("swn")).cast("bigint").as("n_words"),
        sum(col("swn") * col("np")).cast("bigint").as("n_pieces"),
        sum(col("swn") * col("sc")).cast("bigint").as("sum_lp_micro"))
      .select(col("source"), col("n_words"), col("n_pieces"),
        (col("n_pieces").cast("double") / col("n_words").cast("double"))
          .as("pieces_per_word"),
        col("sum_lp_micro"),
        (col("sum_lp_micro").cast("double")
          / (col("n_words").cast("double") * lit(1000000.0))).as("mean_lp"))
  }

  def unigramSegmentation(docs: DataFrame): DataFrame =
    segmentationFromCounts(sourceWordCounts(docs))

  /** The q192 twin's CTE chain (d → sw → wf → piece vocab → lp →
    * the recursive Viterbi → seg), parameterized by a doc-level WHERE
    * clause — ONE definition interpolated into the q192 full-corpus
    * oracle and the q194 comparison (which trains on the BPE chain's
    * doc_id < 500 slice): a drifted copy of the vocabulary cut or the
    * DP in either would grade a different tokenizer than the engine
    * ships. Callers prepend WITH RECURSIVE.
    */
  /** The recursive Viterbi CTE pair (`$v`, `$seg`) stepping the words
    * of `wf` one character at a time under the piece table `$lp` —
    * ONE text generator shared by the v1 chain and the q199 EM re-run
    * (a drifted copy of the DP would grade a different segmentation
    * than the engine ships). Candidates ranked by the struct order
    * (score desc, piece-length desc) mirroring the kernel's tie rule.
    *
    * `$seg` is MATERIALIZED: DuckDB 1.0 inlines CTEs per reference,
    * so a downstream CTE that consumes the DP result from inside its
    * own recursion (q199's backtrack) would otherwise re-run the
    * ENTIRE forward recursion once per reference per iteration — the
    * multiplicative re-evaluation that made r12's q199 oracle cost
    * 782 s of DuckDB (measured; 0.7 s materialized) and zeroed the
    * driver's compare artifact. Same data, same plan semantics — the
    * hint only pins evaluate-once.
    */
  private def viterbiSql(lp: String, v: String, seg: String): String =
    s"""$v AS (
       |  SELECT word, 0 AS i,
       |    CAST(0 AS BIGINT) AS s0, CAST(0 AS BIGINT) AS n0,
       |    CAST(NULL AS BIGINT) AS s1, CAST(NULL AS BIGINT) AS n1,
       |    CAST(NULL AS BIGINT) AS s2, CAST(NULL AS BIGINT) AS n2,
       |    CAST(NULL AS BIGINT) AS s3, CAST(NULL AS BIGINT) AS n3
       |  FROM wf
       |  UNION ALL
       |  SELECT word, i + 1,
       |    best.s, best.n, s0, n0, s1, n1, s2, n2
       |  FROM (
       |    SELECT vv.word, vv.i, vv.s0, vv.n0, vv.s1, vv.n1, vv.s2, vv.n2,
       |      list_reverse_sort(list_filter([
       |        {'s': vv.s0 + p1.lp, 'l': CAST(1 AS BIGINT), 'n': vv.n0 + 1},
       |        {'s': vv.s1 + p2.lp, 'l': CAST(2 AS BIGINT), 'n': vv.n1 + 1},
       |        {'s': vv.s2 + p3.lp, 'l': CAST(3 AS BIGINT), 'n': vv.n2 + 1},
       |        {'s': vv.s3 + p4.lp, 'l': CAST(4 AS BIGINT), 'n': vv.n3 + 1}
       |      ], x -> x.s IS NOT NULL))[1] AS best
       |    FROM $v vv
       |    LEFT JOIN $lp p1 ON p1.piece = substr(vv.word, vv.i + 1, 1)
       |    LEFT JOIN $lp p2 ON vv.i >= 1 AND p2.piece = substr(vv.word, vv.i, 2)
       |    LEFT JOIN $lp p3 ON vv.i >= 2 AND p3.piece = substr(vv.word, vv.i - 1, 3)
       |    LEFT JOIN $lp p4 ON vv.i >= 3 AND p4.piece = substr(vv.word, vv.i - 2, 4)
       |    WHERE vv.i < length(vv.word))),
       |$seg AS MATERIALIZED (
       |  SELECT word, n0 AS np, s0 AS sc
       |  FROM $v WHERE i = length(word))""".stripMargin

  private[ops] def unigramChainSql(docWhere: String): String =
    s"""d AS (SELECT source, unnest($duckToks) AS word
       |      FROM documents $docWhere),
       |sw AS MATERIALIZED (
       |  SELECT source, word, CAST(count(*) AS BIGINT) AS swn
       |  FROM d GROUP BY source, word),
       |wf AS MATERIALIZED (
       |  SELECT word, CAST(sum(swn) AS BIGINT) AS wn
       |  FROM sw GROUP BY word),
       |sub AS MATERIALIZED (
       |  SELECT substr(word, s, l) AS piece, CAST(sum(wn) AS BIGINT) AS freq
       |  FROM (
       |    SELECT word, wn, s, unnest(range(1, ${MaxPiece + 1})) AS l
       |    FROM (SELECT word, wn, unnest(range(1, length(word) + 1)) AS s
       |          FROM wf))
       |  WHERE s + l <= length(word) + 1
       |  GROUP BY piece),
       |chars AS MATERIALIZED (SELECT piece, freq FROM sub WHERE length(piece) = 1),
       |multi AS (
       |  SELECT piece, freq FROM (
       |    SELECT piece, freq,
       |      row_number() OVER (ORDER BY freq DESC, piece) AS rk
       |    FROM sub WHERE length(piece) >= 2)
       |  WHERE rk <= $TopMulti),
       |vocab AS MATERIALIZED (SELECT * FROM chars UNION ALL SELECT * FROM multi),
       |tot AS (SELECT CAST(sum(freq) AS BIGINT) AS tot FROM vocab),
       |lp AS MATERIALIZED (
       |  SELECT piece,
       |    ${Sampling.duckLnMicro("freq")} - ${Sampling.duckLnMicro("tot")}
       |      AS lp
       |  FROM vocab, tot),
       |${viterbiSql("lp", "v", "seg")}""".stripMargin

  /** q192: [[unigramSegmentation]] over the documents table. FULL
    * REPLAY oracle: DuckDB re-derives the word frequencies, the piece
    * vocabulary (same enumeration, same (freq desc, piece asc) cut),
    * the micro-nat piece scores, and the ENTIRE Viterbi DP — a
    * recursive CTE stepping one character at a time, carrying the
    * best (score, piece-count) for the trailing [[MaxPiece]]
    * positions, candidates ranked by the struct order (score desc,
    * piece-length desc) that mirrors the kernel's tie rule.
    */
  val q192: QueryDef = QueryDef.sql(
    "q192_unigram_segmentation",
    s"""WITH RECURSIVE
       |${unigramChainSql("")},
       |r AS (
       |  SELECT sw.source,
       |    CAST(sum(sw.swn) AS BIGINT) AS n_words,
       |    CAST(sum(sw.swn * seg.np) AS BIGINT) AS n_pieces,
       |    CAST(sum(sw.swn * seg.sc) AS BIGINT) AS sum_lp_micro
       |  FROM sw JOIN seg USING (word)
       |  GROUP BY sw.source)
       |SELECT source, n_words, n_pieces,
       |  CAST(n_pieces AS DOUBLE) / CAST(n_words AS DOUBLE) AS pieces_per_word,
       |  sum_lp_micro,
       |  CAST(sum_lp_micro AS DOUBLE) / (CAST(n_words AS DOUBLE) * 1000000.0)
       |    AS mean_lp
       |FROM r
       |ORDER BY source""".stripMargin) { (s, dir) =>
    unigramSegmentation(Tables.documents(s, dir)).orderBy(col("source"))
  }

  /** Tokenizer-family comparison (q194): BPE (the q105/q160 20-merge
    * vocabulary) and unigram-LM (the q192 Viterbi) trained on the
    * SAME corpus slice and weighting (the BPE chain's doc_id < 500
    * scope), graded per source by fertility — the decision table for
    * WHICH tokenizer family to ship, which neither q160 (BPE alone)
    * nor q192 (unigram alone, full corpus) can answer because a
    * fertility comparison is only meaningful when both vocabularies
    * saw identical training data. unigram_to_bpe > 1 means BPE packs
    * this source tighter; the families' budgets differ (20 merges vs
    * 64 multi-char pieces), so the column reads as an operating-point
    * comparison of the SHIPPED configurations, not a theorem about
    * the algorithms.
    *
    * Scale: ONE corpus (source, word) rollup (checkpointed — trainer
    * word freqs, both segmenters, and the fertility rollup all derive
    * from it); both segmentations run on word-TYPE rows via codegen
    * expressions; the report is an S-row aggregate. FULL-REPLAY
    * ORACLE: DuckDB re-learns the 20 BPE merges (the unrolled q105
    * chain), re-derives the unigram vocabulary and re-runs the
    * recursive Viterbi (the q192 chain, slice-scoped), and joins both
    * segmentations — integer sums + literal divisions.
    */
  def tokenizerComparison(docs0: DataFrame): DataFrame = {
    val docs = docs0.filter(col("doc_id") < 500)
    val sw = docs
      .select(col("source"), explode(TextAnalytics.toks(col("text"))).as("word"))
      .groupBy(col("source"), col("word"))
      .agg(count(lit(1)).cast("bigint").as("swn"))
      .localCheckpoint(true)
    val wf = sw.groupBy(col("word")).agg(sum(col("swn")).cast("bigint").as("wn"))
    val merges = Bpe.train(
      wf.select(col("word"), col("wn").as("freq")), nMerges = 20)
    val lp = pieceLp(wf)
    val seg = wf.select(col("word"),
      size(graft.functions.functions.bpe_segment(col("word"), merges))
        .cast("bigint").as("bpe_units"),
      graft.functions.functions.unigram_segment(col("word"), lp, MaxPiece)
        .getField("n_pieces").as("uni_pieces"))
    sw.join(seg, Seq("word"))
      .groupBy(col("source"))
      .agg(sum(col("swn")).cast("bigint").as("n_words"),
        sum(col("swn") * col("bpe_units")).cast("bigint").as("n_bpe_units"),
        sum(col("swn") * col("uni_pieces")).cast("bigint")
          .as("n_unigram_pieces"))
      .select(col("source"), col("n_words"), col("n_bpe_units"),
        col("n_unigram_pieces"),
        (col("n_bpe_units").cast("double") / col("n_words").cast("double"))
          .as("fertility_bpe"),
        (col("n_unigram_pieces").cast("double") / col("n_words").cast("double"))
          .as("fertility_unigram"),
        (col("n_unigram_pieces").cast("double")
          / col("n_bpe_units").cast("double")).as("unigram_to_bpe"))
  }

  val q194: QueryDef = QueryDef.sql(
    "q194_tokenizer_comparison",
    NonOracle.bpeChainSql(20).replaceFirst("^WITH ", "WITH RECURSIVE\n") +
      s""",
         |${unigramChainSql("WHERE doc_id < 500")},
         |u AS (SELECT word, CAST(len(s) AS BIGINT) AS units FROM seg20),
         |r AS (
         |  SELECT sw.source,
         |    CAST(sum(sw.swn) AS BIGINT) AS n_words,
         |    CAST(sum(sw.swn * u.units) AS BIGINT) AS n_bpe_units,
         |    CAST(sum(sw.swn * seg.np) AS BIGINT) AS n_unigram_pieces
         |  FROM sw JOIN u USING (word) JOIN seg USING (word)
         |  GROUP BY sw.source)
         |SELECT source, n_words, n_bpe_units, n_unigram_pieces,
         |  CAST(n_bpe_units AS DOUBLE) / CAST(n_words AS DOUBLE)
         |    AS fertility_bpe,
         |  CAST(n_unigram_pieces AS DOUBLE) / CAST(n_words AS DOUBLE)
         |    AS fertility_unigram,
         |  CAST(n_unigram_pieces AS DOUBLE) / CAST(n_bpe_units AS DOUBLE)
         |    AS unigram_to_bpe
         |FROM r ORDER BY source""".stripMargin) { (s, dir) =>
    tokenizerComparison(Tables.documents(s, dir)).orderBy(col("source"))
  }

  /** One hard-EM training round for the unigram LM (q199): the
    * SentencePiece-shaped refinement q192's frequency-seeded
    * vocabulary was the honest v1 of. E-step: expected piece counts
    * under the VITERBI segmentation of every word type (hard EM —
    * each word contributes its best path, weighted by corpus word
    * frequency), through the [[segmentPieces]] kernel. M-step:
    * re-estimate piece log-probs from those counts and PRUNE — a
    * multi-char piece the Viterbi never uses drops out of the
    * vocabulary (the q192 seed keeps the `TopMulti` most FREQUENT
    * substrings; after one EM round only the ones that earn their
    * place in actual segmentations survive); single characters stay
    * unconditionally (segmentability invariant) with add-one
    * smoothing (count can be 0 when every occurrence of a char rides
    * inside multi-char pieces; ln needs positivity — documented
    * asymmetry, identical both engines). Output: per source, the
    * fertility and mean log-prob under BOTH vocabularies plus the
    * global vocab sizes — the table that says what the EM round
    * bought (fertility_em ≤ fertility_v1 on corpora where pruned
    * probability mass re-concentrates on used pieces).
    *
    * Exactness: counts are integers; piece log-probs go through the
    * one [[Sampling.lnMicro]] discipline; the DP maximizes integer
    * micro-nat scores (ties to the longer piece) in both rounds.
    *
    * Scale: q192's shape twice — ONE corpus-sized (source, word)
    * aggregate feeds everything; the E-step explodes pieces over word
    * TYPES (vocabulary-bounded), both vocab collects sit under the
    * 100k `require`, and both segmentation passes are codegen narrow
    * maps over the word-type table.
    *
    * FULL-REPLAY ORACLE: DuckDB re-derives the v1 chain (the q192
    * recursive Viterbi), BACKTRACKS the DP to the piece sequence (a
    * second recursive CTE walking positions down, choosing at each
    * position the longest piece whose source state + piece score
    * exactly reproduces the DP value — provably the forward tie
    * rule's choice), recounts, re-estimates, and re-runs the ENTIRE
    * second Viterbi under the EM table. Verification economics: the
    * chain's shared CTEs are MATERIALIZED because DuckDB 1.0 inlines
    * CTEs per reference — the backtrack referencing the forward DP 5×
    * per iteration, and the second Viterbi referencing the EM lp map
    * (whose lineage includes the whole backtrack) 4× per iteration,
    * multiplied into the 782 s replay that zeroed the r12 driver
    * compare. Materialized, the identical full replay runs in 0.7 s
    * (both measured on the driver's DuckDB at sf0.01).
    */
  def emSegmentation(docs: DataFrame): DataFrame =
    emFromCounts(sourceWordCounts(docs))

  /** [[emSegmentation]] given the trainer state (`sw` from
    * [[sourceWordCounts]] or the streaming store) — the EM round's
    * whole derivation from the unigram pipeline's one sufficient
    * statistic, shared verbatim by the batch query and
    * [[graft.streaming.UnigramStream.currentEmSegmentation]] (their
    * bit-exact parity holds only because both sides run this exact
    * chain).
    */
  private[graft] def emFromCounts(sw: DataFrame): DataFrame = {
    val wf = sw.groupBy(col("word"))
      .agg(sum(col("swn")).cast("bigint").as("wn"))
      .localCheckpoint(false)
    val lp1 = pieceLp(wf)
    val pieces = wf.select(col("word"), col("wn"),
      graft.functions.functions.unigram_segment_pieces(col("word"), lp1, MaxPiece)
        .as("ps"))
      .localCheckpoint(false)
    val pc: Map[String, Long] = pieces
      .filter(col("ps").isNotNull)
      .select(explode(col("ps")).as("piece"), col("wn"))
      .groupBy(col("piece")).agg(sum(col("wn")).cast("bigint").as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def nCp(p: String): Int = p.codePointCount(0, p.length)
    val emVocab: Seq[(String, Long)] =
      lp1.map(_._1).filter(nCp(_) == 1)
        .map(c => c -> (pc.getOrElse(c, 0L) + 1L)) ++
      pc.toSeq.filter { case (p, _) => nCp(p) >= 2 }.sortBy(_._1)
    require(emVocab.length <= 100000,
      s"unigram EM vocab ${emVocab.length} exceeds the driver-side budget")
    val emTot = emVocab.map(_._2).sum
    val lpEm = emVocab.map { case (p, f) =>
      p -> (Sampling.lnMicro(f) - Sampling.lnMicro(emTot))
    }
    val seg = pieces.select(col("word"),
      size(col("ps")).cast("bigint").as("np1"),
      graft.functions.functions.unigram_segment(col("word"), lpEm, MaxPiece)
        .as("s2"))
      .select(col("word"), col("np1"),
        col("s2.n_pieces").as("np2"), col("s2.score_micro").as("sc2"))
    sw.join(seg, Seq("word"))
      .groupBy(col("source"))
      .agg(sum(col("swn")).cast("bigint").as("n_words"),
        sum(col("swn") * col("np1")).cast("bigint").as("n_pieces_v1"),
        sum(col("swn") * col("np2")).cast("bigint").as("n_pieces_em"),
        sum(col("swn") * col("sc2")).cast("bigint").as("sum_lp_em_micro"))
      .select(col("source"), col("n_words"), col("n_pieces_v1"),
        col("n_pieces_em"),
        (col("n_pieces_v1").cast("double") / col("n_words").cast("double"))
          .as("fertility_v1"),
        (col("n_pieces_em").cast("double") / col("n_words").cast("double"))
          .as("fertility_em"),
        col("sum_lp_em_micro"),
        (col("sum_lp_em_micro").cast("double")
          / (col("n_words").cast("double") * lit(1000000.0))).as("mean_lp_em"),
        lit(lp1.size.toLong).as("n_vocab_v1"),
        lit(emVocab.size.toLong).as("n_vocab_em"))
  }

  val q199: QueryDef = QueryDef.sql(
    "q199_unigram_em_round",
    s"""WITH RECURSIVE
       |${unigramChainSql("")},
       |dp AS MATERIALIZED (SELECT word, i, s0 FROM v),
       |bt AS (
       |  SELECT word, CAST(length(word) AS BIGINT) AS pos,
       |    CAST(NULL AS VARCHAR) AS piece
       |  FROM seg WHERE np IS NOT NULL
       |  UNION ALL
       |  SELECT word, pos - pick.l, pick.pc FROM (
       |    SELECT b.word, b.pos,
       |      list_reverse_sort(list_filter([
       |        CASE WHEN d1.s0 IS NOT NULL AND p1.lp IS NOT NULL
       |               AND d1.s0 + p1.lp = d0.s0
       |             THEN {'l': CAST(1 AS BIGINT), 'pc': p1.piece} END,
       |        CASE WHEN d2.s0 IS NOT NULL AND p2.lp IS NOT NULL
       |               AND d2.s0 + p2.lp = d0.s0
       |             THEN {'l': CAST(2 AS BIGINT), 'pc': p2.piece} END,
       |        CASE WHEN d3.s0 IS NOT NULL AND p3.lp IS NOT NULL
       |               AND d3.s0 + p3.lp = d0.s0
       |             THEN {'l': CAST(3 AS BIGINT), 'pc': p3.piece} END,
       |        CASE WHEN d4.s0 IS NOT NULL AND p4.lp IS NOT NULL
       |               AND d4.s0 + p4.lp = d0.s0
       |             THEN {'l': CAST(4 AS BIGINT), 'pc': p4.piece} END
       |      ], x -> x IS NOT NULL))[1] AS pick
       |    FROM bt b
       |    JOIN dp d0 ON d0.word = b.word AND d0.i = b.pos
       |    LEFT JOIN dp d1 ON d1.word = b.word AND d1.i = b.pos - 1
       |    LEFT JOIN lp p1 ON p1.piece = substr(b.word, b.pos, 1)
       |    LEFT JOIN dp d2 ON d2.word = b.word AND d2.i = b.pos - 2
       |    LEFT JOIN lp p2 ON b.pos >= 2 AND p2.piece = substr(b.word, b.pos - 1, 2)
       |    LEFT JOIN dp d3 ON d3.word = b.word AND d3.i = b.pos - 3
       |    LEFT JOIN lp p3 ON b.pos >= 3 AND p3.piece = substr(b.word, b.pos - 2, 3)
       |    LEFT JOIN dp d4 ON d4.word = b.word AND d4.i = b.pos - 4
       |    LEFT JOIN lp p4 ON b.pos >= 4 AND p4.piece = substr(b.word, b.pos - 3, 4)
       |    WHERE b.pos > 0)),
       |bp AS MATERIALIZED (SELECT word, piece FROM bt WHERE piece IS NOT NULL),
       |pcnt AS MATERIALIZED (
       |  SELECT piece, CAST(sum(wf.wn) AS BIGINT) AS cnt
       |  FROM bp JOIN wf USING (word) GROUP BY piece),
       |emv AS MATERIALIZED (
       |  SELECT c.piece, CAST(COALESCE(p.cnt, 0) + 1 AS BIGINT) AS freq
       |  FROM chars c LEFT JOIN pcnt p USING (piece)
       |  UNION ALL
       |  SELECT piece, cnt AS freq FROM pcnt WHERE length(piece) >= 2),
       |emtot AS (SELECT CAST(sum(freq) AS BIGINT) AS tot FROM emv),
       |emlp AS MATERIALIZED (
       |  SELECT piece,
       |    ${Sampling.duckLnMicro("freq")} - ${Sampling.duckLnMicro("tot")}
       |      AS lp
       |  FROM emv, emtot),
       |${viterbiSql("emlp", "v2", "seg2")},
       |nv AS (SELECT CAST(count(*) AS BIGINT) AS n_vocab_v1 FROM vocab),
       |nev AS (SELECT CAST(count(*) AS BIGINT) AS n_vocab_em FROM emv),
       |r AS (
       |  SELECT sw.source,
       |    CAST(sum(sw.swn) AS BIGINT) AS n_words,
       |    CAST(sum(sw.swn * s1.np) AS BIGINT) AS n_pieces_v1,
       |    CAST(sum(sw.swn * s2.np) AS BIGINT) AS n_pieces_em,
       |    CAST(sum(sw.swn * s2.sc) AS BIGINT) AS sum_lp_em_micro
       |  FROM sw JOIN seg s1 USING (word) JOIN seg2 s2 USING (word)
       |  GROUP BY sw.source)
       |SELECT source, n_words, n_pieces_v1, n_pieces_em,
       |  CAST(n_pieces_v1 AS DOUBLE) / CAST(n_words AS DOUBLE) AS fertility_v1,
       |  CAST(n_pieces_em AS DOUBLE) / CAST(n_words AS DOUBLE) AS fertility_em,
       |  sum_lp_em_micro,
       |  CAST(sum_lp_em_micro AS DOUBLE) / (CAST(n_words AS DOUBLE) * 1000000.0)
       |    AS mean_lp_em,
       |  nv.n_vocab_v1, nev.n_vocab_em
       |FROM r CROSS JOIN nv CROSS JOIN nev
       |ORDER BY source""".stripMargin) { (s, dir) =>
    emSegmentation(Tables.documents(s, dir)).orderBy(col("source"))
  }
}
