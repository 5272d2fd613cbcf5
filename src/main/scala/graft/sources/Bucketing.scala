package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout: the shuffle-elimination story for the big
  * fact-fact join (lineitem <-> orders on orderkey).
  *
  * A plain equi-join of two large tables costs two full shuffles. If
  * both sides are *written* bucketed (hash-partitioned into B files)
  * and sorted by the join key, Spark's scan reports the bucketing as
  * its output partitioning and the join runs as a zero-exchange
  * sort-merge join — at 100 TB that converts the dominant network cost
  * of the relational suite into a one-time layout decision at ingest.
  *
  * Verified by BucketingSpec: the bucketed join's physical plan
  * contains no ShuffleExchange.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key. When both carry the
    * same bucketing, Catalyst plans SortMergeJoin with zero exchanges.
    */
  def bucketedEquiJoin(spark: SparkSession, leftTable: String,
                       rightTable: String, leftKey: String,
                       rightKey: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.table(leftTable)
      .join(spark.table(rightTable), col(leftKey) === col(rightKey))
  }
}
