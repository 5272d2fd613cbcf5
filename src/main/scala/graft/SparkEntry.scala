package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.index.InvertedIndex
import graft.ops._
import graft.text.Normalize

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's full named-query surface: the reference's
  * own pipeline (inverted index + cosine k-means) plus the relational /
  * text / dedup / similarity / multimodal operator suites. Entries with
  * DuckDB-expressible semantics also appear in `oracleSql` (same column
  * names, deterministic ordering) for the driver's hash-compare.
  */
object SparkEntry {

  private def allDefs: Seq[QueryDef] =
    Relational.all ++ Extended.all ++ TextAnalytics.all ++ Dedup.all ++
      Similarity.all ++ MlOracle.all ++ IndexOracle.all ++ NonOracle.all ++
      CurationOps.all ++ Layout.all ++ TrainingData.all ++ Graph.all ++
      CorpusDrift.all ++ UnigramLm.all

  /** Flagship: reference Job 1 (normalize -> term-document matrix) over
    * the sf0.001 documents corpus; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val docs = ops.Tables.documents(spark, "/root/testdata/sf0.001")
    val n = docs.count().toInt
    InvertedIndex.termDocMatrixFast(Normalize.tokens(docs), n)
      .orderBy(col("term"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (Porter stemming, k-means, engine-hash dedup, LSH, multimodal).
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
