package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.functions.{bpe_merge_pair, bpe_segment}

/** Distributed BPE tokenizer training (Sennrich et al., "Neural
  * Machine Translation of Rare Words with Subword Units", ACL'16) —
  * the tokenizer-fitting step of a pretraining pipeline, shaped for
  * Spark:
  *
  *  - the working set is the WORD-TYPE table (distinct words with
  *    corpus frequencies), not the corpus: one aggregation reduces
  *    100 TB of text to a vocabulary-sized frame, and every iteration
  *    after that touches only word types;
  *  - merges are learned in BATCHES: each round is (a) one
  *    partial+final aggregate counting adjacent symbol pairs weighted
  *    by word frequency, (b) a (batch+1)-row top-k collect, (c) one
  *    codegen'd narrow map applying every merge of the maximal
  *    symbol-disjoint ranked prefix in order
  *    ([[graft.functions.MergePairExpr]]) — provably identical output
  *    to one-merge-per-job (see [[train]]), at ~1/batchSize the job
  *    count; driver state is the merge list only;
  *  - lineage is truncated per iteration (localCheckpoint) so the plan
  *    does not grow with the merge count — the connectedComponents
  *    iterative-loop pattern.
  *
  * Inference ([[segmentTokens]]) applies the learned ranking greedily
  * per word via the codegen'd [[graft.functions.BpeSegmentExpr]] — a
  * narrow scan-speed map, the 100 TB side.
  */
object Bpe {

  /** Word-type frequency table of a corpus text column: the one
    * corpus-sized aggregation in BPE training.
    */
  def wordFreqs(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(TextAnalytics.toks(col(textCol))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))

  /** Pair-count rounds (= Spark aggregate jobs) the last distributed
    * [[train]] ran — diagnostic for the batching specs; the whole
    * point of merge batching is that this is ≪ nMerges.
    */
  @volatile private[graft] var lastDistributedRounds: Int = 0

  /** Learn `nMerges` BPE merges from a (word, freq) table. Ties break
    * deterministically on (count desc, pair lexicographic). Stops
    * early when the best pair's weighted count drops below `minCount`
    * (merging singletons only memorizes the sample).
    *
    * DISPATCH (the connectedComponents pattern): a word-type table up
    * to `driverMaxTypes` rows collects and trains on the driver —
    * each distributed iteration costs ~150 ms of PLANNING (new plan,
    * analysis, codegen) regardless of data size, which dwarfs the
    * compute for vocabulary-sized inputs. Larger vocabularies run the
    * distributed loop, BATCHED: each round is one partial+final
    * pair-count aggregate, a (batchSize+1)-row collect, and one
    * codegen'd narrow map applying a whole batch of merges in rank
    * order — so a 32k-merge vocabulary costs ~32k/batchSize Spark
    * jobs, not 32k. Both paths produce identical merges (same counts,
    * same tie-break; spec-asserted including batched-vs-one-at-a-time
    * identity on tie-heavy corpora).
    *
    * WHY BATCHING IS EXACT (not approximate): the batch taken per
    * round is the maximal PREFIX r1..rk of the (cnt desc, a, b)
    * ranking that is pairwise symbol-disjoint, shrunk until
    * cnt(rk) > cnt(r_{k+1}) (the first excluded row). Sequential BPE
    * then picks exactly r1..rk, by induction on j: pairs untouched by
    * merges r1..r_{j-1} keep their counts, and the best untouched pair
    * is r_j itself (the ranking is a prefix); every pair CHANGED or
    * CREATED by those merges has each occurrence bounded by an
    * occurrence of some ORIGINAL pair q sharing a symbol with the
    * batch — q cannot be in the prefix (pairwise disjoint), so
    * rank(q) ≥ k+1 and cnt(q) ≤ cnt(r_{k+1}) < cnt(r_j). A batch of
    * size 1 is plain sequential, so progress is always ≥ 1 merge per
    * round even on pathological all-tied corpora.
    */
  def train(words: DataFrame, nMerges: Int, minCount: Long = 2L,
            driverMaxTypes: Long = 1L << 17, batchSize: Int = 64): Seq[(String, String)] = {
    val spark = words.sparkSession
    val merges = scala.collection.mutable.ListBuffer[(String, String)]()
    // initial symbols: CODE POINTS + the end-of-word marker. Java
    // regex "." matches one code point, so regexp_extract_all keeps a
    // supplementary character (emoji, rare CJK) as one symbol —
    // split(word, "") would yield UTF-16 code units, i.e. surrogate
    // halves that training could merge across into invalid subwords.
    // This matches the code-point iteration of the bpeSegment
    // inference kernel (VectorOps.bpeSegment).
    val init = words
      .filter(col("word") =!= "")
      .select(col("freq"),
        concat(regexp_extract_all(col("word"), lit("(?s)."), lit(0)),
          array(lit("</w>"))).as("s"))
      .localCheckpoint(true)
    val nTypes = init.count()
    if (nTypes <= driverMaxTypes) {
      val local = init.collect().map(r =>
        (r.getLong(0), r.getSeq[String](1).toArray))
      init.unpersist(blocking = false)
      return trainDriver(local, nMerges, minCount)
    }
    val parts = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong, nTypes / 65536L + 1L)).toInt
    var syms = init.repartition(parts).localCheckpoint(true)
    init.unpersist(blocking = false)
    lastDistributedRounds = 0
    try {
      var done = false
      while (merges.size < nMerges && !done) {
        lastDistributedRounds += 1
        val want = math.min(math.max(batchSize, 1), nMerges - merges.size)
        // adjacent pair counts, weighted by word frequency. `s` is an
        // attribute reference here, so the lambda re-reads it O(1) —
        // see shingles() for why that matters with interpreted HOFs.
        // want+1 rows: the first EXCLUDED row's count is the shrink
        // boundary of the safe batch (see scaladoc proof).
        val rows = syms
          .filter(size(col("s")) >= 2)
          .select(col("freq"),
            explode(transform(sequence(lit(0), size(col("s")) - 2), i =>
              struct(element_at(col("s"), i + 1).as("a"),
                element_at(col("s"), i + 2).as("b")))).as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum(col("freq")).as("cnt"))
          .orderBy(col("cnt").desc, col("a"), col("b"))
          .limit(want + 1)
          .collect()
        // maximal pairwise symbol-disjoint RANKED PREFIX — the prefix
        // stops (never skips) at the first row sharing a symbol, else
        // order-equivalence to sequential merging is lost
        val batch = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
        val used = scala.collection.mutable.HashSet[String]()
        var j = 0
        var open = true
        while (open && j < math.min(want, rows.length)) {
          val (a, b, c) = (rows(j).getString(0), rows(j).getString(1), rows(j).getLong(2))
          if (c < minCount || used(a) || used(b)) open = false
          else { batch += ((a, b, c)); used += a; used += b; j += 1 }
        }
        if (batch.isEmpty) done = true // table exhausted or best < minCount
        else {
          // shrink until strictly above the first excluded count, so no
          // merge-created pair can tie a batch element at its turn
          val boundary =
            if (batch.size < rows.length) rows(batch.size).getLong(2)
            else Long.MinValue // collect came back short: pair table exhausted
          while (batch.size >= 2 && batch.last._3 <= boundary)
            batch.remove(batch.size - 1)
          merges ++= batch.map(t => (t._1, t._2))
          // apply the whole batch in rank order as one nested codegen'd
          // narrow map, then truncate lineage so the plan stays one map
          // deep regardless of the merge count
          val mergedCol = batch.foldLeft(col("s")) {
            case (c, (a, b, _)) => bpe_merge_pair(c, a, b)
          }
          val next = syms
            .select(col("freq"), mergedCol.as("s"))
            .localCheckpoint(true)
          syms.unpersist(blocking = false)
          syms = next
        }
      }
      merges.toList
    } finally syms.unpersist(blocking = false)
  }

  /** UTF-8 binary (code-point) string comparison — the ordering
    * Spark's `orderBy` uses on strings.
    */
  private def u8Lt(x: String, y: String): Boolean =
    org.apache.spark.unsafe.types.UTF8String.fromString(x)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(y)) < 0

  /** Driver twin of the distributed loop: identical counting, argmax
    * tie-break, and merge semantics over an in-memory word-type table.
    */
  private[ops] def trainDriver(words: Array[(Long, Array[String])],
                               nMerges: Int, minCount: Long): Seq[(String, String)] = {
    val merges = scala.collection.mutable.ListBuffer[(String, String)]()
    var syms = words
    var it = 0
    var done = false
    while (it < nMerges && !done) {
      val counts = new java.util.HashMap[(String, String), Long]()
      syms.foreach { case (freq, s) =>
        var i = 0
        while (i < s.length - 1) {
          counts.merge((s(i), s(i + 1)), freq, (x, y) => x + y)
          i += 1
        }
      }
      var best: (String, String) = null
      var bestCnt = -1L
      counts.forEach { (p, c) =>
        // same order as (cnt desc, a asc, b asc) — with `asc` being
        // Spark's string ordering, i.e. UTF-8 BINARY (code-point)
        // order, NOT Java's UTF-16 code-unit order: they disagree for
        // supplementary characters (a surrogate half 0xD800-0xDFFF
        // sorts between BMP chars in UTF-16 but code points sort
        // numerically in UTF-8), and the driver and distributed paths
        // must pick the same merge on count ties.
        if (c > bestCnt || (c == bestCnt &&
          (u8Lt(p._1, best._1) || (p._1 == best._1 && u8Lt(p._2, best._2))))) {
          best = p; bestCnt = c
        }
      }
      if (best == null || bestCnt < minCount) done = true
      else {
        merges += best
        val (a, b) = best
        syms = syms.map { case (freq, s) =>
          var hit = false
          var i = 0
          while (!hit && i < s.length - 1) {
            hit = s(i) == a && s(i + 1) == b; i += 1
          }
          if (!hit) (freq, s)
          else {
            val out = new scala.collection.mutable.ArrayBuffer[String](s.length)
            var j = 0
            while (j < s.length) {
              if (j + 1 < s.length && s(j) == a && s(j + 1) == b) {
                out += a + b; j += 2
              } else { out += s(j); j += 1 }
            }
            (freq, out.toArray)
          }
        }
      }
      it += 1
    }
    merges.toList
  }

  /** Greedy BPE segmentation of every whitespace token of `textCol`:
    * ARRAY<STRING> of subword units (each word's last unit carries the
    * "</w>" marker). Narrow codegen'd map — apply-side of the trained
    * tokenizer.
    */
  def segmentTokens(text: Column, merges: Seq[(String, String)]): Column =
    flatten(transform(TextAnalytics.toks(text), w => bpe_segment(w, merges)))
}
