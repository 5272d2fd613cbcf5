package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Query-time retrieval over the inverted-index family: the searching
  * counterpart of [[InvertedIndex]]'s build side. Disjunctive (OR)
  * multi-term queries are scored by summed TF-IDF — the classic
  * ranked-retrieval shape (Salton's vector model; the idf form matches
  * q42's smoothed ln((N+1)/(df+1))) — or Okapi BM25.
  *
  * Scale shape: the postings aggregate IS the index build — the ONE
  * corpus-wide exchange; df, dl, and avgdl all derive from it
  * (vocabulary/posting-sized follow-ups), so the token stream is
  * aggregated exactly once per plan, and a caller holding a persisted
  * index skips the build entirely via the `*Postings` variants. The
  * query set is broadcast (queries are human-sized; the posting side
  * never shuffles for the match), per-(query, doc) accumulation
  * exchanges only MATCHED postings (candidate-sized, not
  * corpus-sized), and the top-k window partitions by query — never a
  * global sort. Per-term contributions are summed in sorted term order
  * via an array fold, so scores are reproducible bit-for-bit across
  * engines and across partitionings (float addition is not
  * associative; an unordered SUM would not be).
  */
object Retrieval {

  /** The postings table (term, doc_id, tf) — one partial+final
    * exchange over the (doc_id, term) token stream. This is the frame
    * a serving deployment persists; everything else derives from it.
    */
  def postings(tokens: DataFrame): DataFrame =
    tokens.groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))

  /** Rank the top `k` documents per query by summed TF-IDF.
    *
    * @param tokens  (doc_id, term) one row per token occurrence
    * @param queries (qid, term) one row per query term
    * @param nDocs   corpus document count (for the idf numerator)
    * @return (qid, doc_id, score, n_matched, rnk), rnk 1..k per qid
    */
  def search(tokens: DataFrame, queries: DataFrame, nDocs: Long,
             k: Int): DataFrame =
    searchPostings(postings(tokens), queries, nDocs, k)

  /** [[search]] from a prebuilt [[postings]] table (persisted index
    * serving path; also lets one materialized build feed several
    * query-time actions).
    */
  def searchPostings(tf: DataFrame, queries: DataFrame, nDocs: Long,
                     k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // df from the postings table, not a second token pass: one row per
    // (term, doc) means count(*) IS countDistinct(doc_id), and when tf
    // is built inline the exchange under both branches is canonically
    // identical, so ReuseExchange runs the corpus aggregate ONCE
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // the q42 weight, per (term, doc): rounded so the ln ulp noise
    // cannot differ across engines (same literal formula in the twin)
    val weighted = tf.join(df, "term")
      .withColumn("w",
        round(col("tf") * log((lit(nDocs) + lit(1.0)) / (col("df") + lit(1.0))), 9))
    topK(weighted.join(broadcast(queries), "term"), k)
  }

  /** Rank the top `k` documents per query by Okapi BM25 (Robertson et
    * al.) — the production default [[search]]'s flat TF-IDF
    * approximates: term frequency saturates (k1) and is normalized by
    * document length against the corpus mean (b).
    *
    * Float discipline (the q114 contract, extended): idf is the ONLY
    * transcendental — ln of the query-independent smoothed odds,
    * rounded to 9 decimals so the last-ulp libm difference between
    * engines vanishes; avgdl is an exact integer ratio (sum(dl)/N
    * stays integer arithmetic until ONE final division); the
    * saturation term is a fixed left-to-right `* / +` chain written
    * identically in the DuckDB twin (each op correctly rounded, so the
    * chain is bit-reproducible); per-term weights fold in sorted term
    * order.
    *
    * @param tokens  (doc_id, term) one row per token occurrence
    * @param queries (qid, term) one row per query term
    * @param nDocs   corpus document count
    * @return (qid, doc_id, score, n_matched, rnk), rnk 1..k per qid
    */
  def searchBm25(tokens: DataFrame, queries: DataFrame, nDocs: Long, k: Int,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame =
    searchBm25Postings(postings(tokens), queries, nDocs, k, k1, b)

  /** The BM25 sufficient statistics of a postings table — per-posting
    * doc length, per-term rounded idf, the scalar avgdl — computed
    * ONCE and shared across every (k1, b) operating point (the q206
    * sweep's shape, mirroring its twin's single tfdl/idf/ad CTE set;
    * before the extraction each grid arm re-aggregated all three).
    * dl is a posting-table-sized aggregate reused for BOTH the
    * per-doc normalization and avgdl (the previous per-search shape
    * paid a corpus-wide window SORT for dl plus a duplicate
    * aggregation pass for avgdl).
    */
  case class Bm25Stats(tfdl: DataFrame, idf: DataFrame, avgdl: DataFrame)

  def bm25Stats(tf: DataFrame, nDocs: Long): Bm25Stats = {
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val tfdl = tf.join(dl, "doc_id")
    val idf = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .withColumn("idf",
        round(log((lit(nDocs.toDouble) - col("df") + lit(0.5)) /
          (col("df") + lit(0.5)) + lit(1.0)), 9))
      .select(col("term"), col("idf"))
    val avgdl = dl.agg((sum(col("dl")).cast("double") /
      count(lit(1)).cast("double")).as("avgdl"))
    Bm25Stats(tfdl, idf, avgdl)
  }

  /** [[searchBm25]] from a prebuilt [[postings]] table. */
  def searchBm25Postings(tf: DataFrame, queries: DataFrame, nDocs: Long,
                         k: Int, k1: Double = 1.2,
                         b: Double = 0.75): DataFrame =
    searchBm25FromStats(bm25Stats(tf, nDocs), queries, k, k1, b)

  /** [[searchBm25Postings]] at one (k1, b) point over precomputed
    * [[Bm25Stats]].
    */
  def searchBm25FromStats(stats: Bm25Stats, queries: DataFrame, k: Int,
                          k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // scalar constants folded driver-side: ONE double each, so the
    // twin can embed the same literal value (k1+1 and 1-b are single
    // correctly-rounded ops — reproducible from the same inputs)
    val tfD = col("tf").cast("double")
    val sat = tfD * lit(k1 + 1.0) /
      (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl")))
    val weighted = stats.tfdl.join(stats.idf, "term")
      .crossJoin(broadcast(stats.avgdl))
      .withColumn("w", col("idf") * sat)
    topK(weighted.join(broadcast(queries), "term"), k)
  }

  /** Shared tail: fold matched per-term weights in sorted term order,
    * rank per query, keep the top k.
    */
  private def topK(matched: DataFrame, k: Int): DataFrame = {
    val scored = matched.groupBy(col("qid"), col("doc_id"))
      .agg(
        aggregate(
          transform(array_sort(collect_list(struct(col("term"), col("w")))),
            x => x.getField("w")),
          lit(0.0), (acc, x) => acc + x).as("score"),
        count(lit(1)).as("n_matched"))
    val wq = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rnk", row_number().over(wq)).filter(col("rnk") <= k)
  }
}
