package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextAnalytics}

/** End-to-end training-data curation: the composition every individual
  * operator exists to serve. One call takes a raw documents table
  * through quality scoring -> language filter -> exact dedup ->
  * MinHash-LSH near-dup removal, and reports per-stage counts.
  *
  * Scale shape: stages 1-2 are narrow (scan speed); exact dedup is one
  * exchange on the text hash; near-dup is the narrow signature pass +
  * one band equi-join. Nothing in the pipeline collects to the driver
  * except the final stage-count aggregates.
  */
object Curation {

  case class Report(input: Long, afterQuality: Long, afterLang: Long,
                    afterExact: Long, afterNearDup: Long)

  /** @param docs        (doc_id, text, lang, ...) table
    * @param minTokens   quality floor: minimum whitespace tokens
    * @param maxPunctRatio quality ceiling on punctuation density
    * @param keepLangs   language allowlist (empty = keep all)
    * @return (curated docs, per-stage report)
    */
  def curate(spark: SparkSession, docs: DataFrame,
             minTokens: Int = 8, maxPunctRatio: Double = 0.2,
             keepLangs: Seq[String] = Nil,
             nHashes: Int = 32, bandSize: Int = 4): (DataFrame, Report) = {
    val input = docs.count()

    // 1. quality: narrow per-doc metrics, no shuffle
    val toks = TextAnalytics.toks(col("text"))
    val quality = docs
      .withColumn("_n_tokens", size(toks))
      .withColumn("_punct_ratio",
        (length(col("text")) - length(regexp_replace(col("text"), "\\p{P}", "")))
          / greatest(length(col("text")), lit(1)))
      .filter(col("_n_tokens") >= minTokens
        && col("_punct_ratio") <= maxPunctRatio)
      .drop("_n_tokens", "_punct_ratio")
    val afterQuality = quality.count()

    // 2. language allowlist (narrow)
    val langed =
      if (keepLangs.isEmpty) quality
      else quality.filter(col("lang").isin(keepLangs: _*))
    val afterLang = langed.count()

    // 3. exact dedup: keep lowest doc_id per exact text (one exchange)
    val exactKeep = langed
      .groupBy(col("text").as("_t"))
      .agg(min(col("doc_id")).as("_keep"))
      .select(col("_keep").as("doc_id"))
    val exact = langed.join(exactKeep, "doc_id")
    val afterExact = exact.count()

    // 4. near-dup: LSH candidates, drop the higher doc_id of each pair
    val dupIds = Dedup.minhashCandidates(exact, nHashes, bandSize)
      .select(col("d2").as("doc_id")).distinct()
    val curated = exact.join(dupIds, Seq("doc_id"), "left_anti")
    val afterNearDup = curated.count()

    (curated, Report(input, afterQuality, afterLang, afterExact, afterNearDup))
  }
}
