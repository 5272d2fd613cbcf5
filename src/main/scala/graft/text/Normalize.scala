package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.functions.porter_stem

/** Text-normalization pipeline: tokenize -> strip punctuation ->
  * drop stopwords -> Porter-stem (reference operators F1-F5,
  * ProcessData.java:387-420). All stages are built-in Catalyst column
  * expressions except the stemmer, which is the codegen-friendly
  * [[graft.functions.PorterStemExpr]] — the whole pipeline stays inside
  * one whole-stage-codegen span with no shuffle.
  *
  * Scale note: the pipeline is embarrassingly parallel (narrow, per-row)
  * — at 100 TB it runs at scan speed with zero exchanges; the stopword
  * set rides along as a literal array (equivalent of the reference's
  * DistributedCache broadcast, :372-385).
  */
object Normalize {

  /** Default stopword list (the reference takes it as a runtime file;
    * the engine takes any Seq[String]).
    */
  val defaultStopwords: Seq[String] = Seq(
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from", "has",
    "he", "in", "is", "it", "its", "of", "on", "that", "the", "to", "was",
    "were", "will", "with")

  /** Strip all Unicode punctuation from a token (reference F2, `\p{P}`
    * at ProcessData.java:405).
    */
  def stripPunct(c: Column): Column = regexp_replace(c, "\\p{P}", "")

  /** docs(docId, text) -> tokens(docId, term).
    *
    * Order of operations matches the reference (ProcessData.java:405-416):
    * punctuation strip, then stopword test on the *unstemmed* token,
    * then stem. Empty tokens after punctuation-strip are dropped
    * (divergence D5, SURVEY.md §7). Tokens are lowercased so stemming
    * and stopword matching behave uniformly.
    */
  def tokens(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      stopwords: Seq[String] = defaultStopwords,
      stem: Boolean = true): DataFrame = {
    val raw = docs.select(
      col(idCol).as("doc_id"),
      explode(split(col(textCol), "\\s+")).as("tok"))
    val cleaned = raw
      .withColumn("tok", lower(stripPunct(col("tok"))))
      .filter(length(col("tok")) > 0)
      // stopword filter: semantically a broadcast anti-join; for a
      // literal list `isin` folds to a codegen'd set-membership test.
      .filter(!col("tok").isin(stopwords: _*))
    val termed =
      if (stem) cleaned.withColumn("term", porter_stem(col("tok")))
      else cleaned.withColumn("term", col("tok"))
    termed.select(col("doc_id"), col("term"))
  }

  /** Stopword filtering against a *table* of stopwords (the scalable
    * form when the list itself is large): broadcast left-anti join.
    */
  def dropStopwordsByJoin(tokens: DataFrame, stopwords: DataFrame): DataFrame =
    tokens.join(broadcast(stopwords), tokens("term") === stopwords.col(stopwords.columns.head), "left_anti")
}
