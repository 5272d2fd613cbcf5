package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index / term-document matrix construction (reference Job 1:
  * operators A1-A3, ProcessData.java:454-472).
  *
  * The reference reduces each term's postings into a dense 0/1 presence
  * vector of width N = corpus size, with set semantics (duplicate
  * (term, doc) postings collapse, :463-465). Spark formulation: one
  * hash-aggregate on `term` (the pipeline's single exchange), building
  * the posting set with `collect_set` and densifying with built-in
  * array expressions — Catalyst runs the aggregation as sound
  * partial + final (the map-side combine the reference had to disable,
  * :653).
  *
  * Scale note: a dense presence vector of width N is only sane for
  * bounded N (the reference caps it at 1000 files, :637). At 100 TB the
  * posting *list* form (`postings`) is the primary representation —
  * sorted doc-id arrays per term, which stay proportional to actual
  * postings; the dense form is derived, for workloads (like the
  * reference's clustering) that want fixed-width vectors.
  */
object InvertedIndex {

  /** tokens(doc_id, term) -> postings(term, doc_ids ARRAY<BIGINT> sorted). */
  def postings(tokens: DataFrame): DataFrame =
    tokens
      .groupBy(col("term"))
      .agg(array_sort(collect_set(col("doc_id"))).as("doc_ids"))

  /** tokens(doc_id, term) -> matrix(term, vec ARRAY<INT> of width n).
    *
    * `vec(i) = 1` iff doc with id = `firstId + i` contains the term.
    * The reference requires doc ids in 1..N (AIOOBE otherwise,
    * :463-465); here the id domain is [firstId, firstId + n).
    */
  def termDocMatrix(tokens: DataFrame, n: Int, firstId: Long = 0L): DataFrame = {
    // same contract as termDocMatrixFast's require: n = 0 would make
    // the two-arg sequence(firstId, firstId - 1) silently DESCEND,
    // emitting width-2 garbage vectors instead of an error
    require(n >= 1, s"termDocMatrix needs n >= 1, got $n")
    postings(tokens).select(
      col("term"),
      transform(
        sequence(lit(firstId), lit(firstId + n - 1)),
        d => when(array_contains(col("doc_ids"), d), 1).otherwise(0)
      ).as("vec"))
  }

  /** Perf path for the dense matrix: one TypedImperativeAggregate with
    * a BitSet buffer ([[graft.functions.PresenceVectorAgg]]) — no
    * intermediate set allocation, partial buffers are n/8-byte bit
    * images merged by OR. Semantics identical to [[termDocMatrix]].
    */
  def termDocMatrixFast(tokens: DataFrame, n: Int, firstId: Long = 0L): DataFrame =
    tokens
      .groupBy(col("term"))
      .agg(graft.functions.PresenceVectorAgg
        .presence_vector(col("doc_id"), n, firstId).as("vec"))

  /** Document frequency per term (the classic IDF numerator). */
  def docFreq(tokens: DataFrame): DataFrame =
    tokens.groupBy(col("term"))
      .agg(count_distinct(col("doc_id")).as("df"))

  /** TF-IDF weighted postings: (doc_id, term, tf, df, tfidf).
    *
    * df is a window count over the tf aggregate (tf has one row per
    * (doc, term), so rows-per-term = distinct docs containing the
    * term). Single lineage: the tokenize/stem pipeline and the tf
    * aggregation run ONCE — no self-join of two re-derived branches
    * (which Spark would execute as two full scans: the pruned
    * aggregates differ, defeating ReuseExchange). Scale: the window
    * partitions by term — the same shuffle a tf⋈df join would need,
    * minus the second scan and the broadcast; per-term partitions are
    * bounded by the corpus doc count.
    */
  def tfidf(tokens: DataFrame, nDocs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    tokens.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .withColumn("tfidf",
        col("tf") * log(lit(nDocs.toDouble + 1.0) / (col("df") + 1.0)))
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("tfidf"))
  }

  /** Reference byte-format serialization of a presence vector:
    * `[b1,b2,...,bN,]` — note the trailing comma (ProcessData.java:457-469).
    * Only for byte-compat text output; not used internally.
    */
  def referenceFormat(matrix: DataFrame): DataFrame =
    matrix.select(
      col("term"),
      concat(lit("["), concat_ws(",", col("vec")), lit(",]")).as("line"))

  /** Incremental index maintenance: fold a delta corpus's postings into
    * an existing index without rebuilding it. Exactly equivalent to
    * re-running [[postings]] over the union of both corpora (spec'd),
    * but the existing index is touched only on terms the delta
    * mentions.
    *
    * Scale shape: a full-outer equi-join on `term` + a sorted array
    * union. An ingest delta's vocabulary is a sliver of the corpus
    * vocabulary, so with the index stored bucketed by term (see
    * sources.Bucketing) the join shuffles ONLY the delta side; without
    * bucketing AQE broadcasts the delta's postings. Either way the
    * 100 TB-side index never re-aggregates — the difference between
    * O(delta) and O(corpus) per ingest cycle.
    *
    * Deletes are the same join with `array_except`; a tombstone column
    * would make this a general merge — omitted until something needs it.
    */
  def mergePostings(existing: DataFrame, deltaTokens: DataFrame): DataFrame = {
    val delta = postings(deltaTokens)
    val ex = existing.toDF("term", "old_ids")
    val dl = delta.toDF("dterm", "new_ids")
    // NULL-SAFE join on term: a junk-token posting group (term NULL)
    // exists on both sides under groupBy's null-group semantics, and a
    // null-unsafe equi-join would never match them — the merge would
    // emit TWO term=NULL rows where the spec'd-equivalent rebuild
    // emits one (silent duplicate-key index corruption)
    ex.join(dl, ex("term") <=> dl("dterm"), "full_outer")
      .select(
        coalesce(ex("term"), dl("dterm")).as("term"),
        // type-agnostic null handling (doc ids may be int or bigint):
        // a term missing from one side keeps the other side's postings
        when(col("old_ids").isNull, col("new_ids"))
          .when(col("new_ids").isNull, col("old_ids"))
          .otherwise(array_sort(array_union(col("old_ids"), col("new_ids"))))
          .as("doc_ids"))
  }
}
