package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sinks (SURVEY.md §2 S7). The reference's only sink is
  * TextOutputFormat `key \t value` lines (ProcessData.java:659,676);
  * the engine's primary sink is partitioned parquet.
  */
object Sinks {

  /** Reference byte-format text sink: `key \t value` lines. The two
    * columns are stringified; pass a pre-formatted DataFrame for exact
    * byte compatibility (e.g. InvertedIndex.referenceFormat).
    */
  def writeTsv(df: DataFrame, path: String): Unit = {
    val Array(k, v) = df.columns
    df.select(concat(col(k).cast("string"), lit("\t"), col(v).cast("string"))
      .as("line"))
      .write.mode("overwrite").text(path)
  }

  /** Engine-native sink: snappy parquet, optionally partitioned by
    * columns (the 100 TB layout: partition by coarse key, sorted within
    * files for min/max pruning).
    */
  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
                   sortWithin: Seq[String] = Nil): Unit = {
    val sorted =
      if (sortWithin.nonEmpty) df.sortWithinPartitions(sortWithin.map(col): _*)
      else df
    val w = sorted.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
  }
}
