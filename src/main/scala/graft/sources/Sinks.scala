package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sinks (SURVEY.md §2 S7). The reference's only sink is
  * TextOutputFormat `key \t value` lines (ProcessData.java:659,676);
  * the engine's primary sink is partitioned parquet.
  */
object Sinks {

  /** Reference byte-format text sink: `key \t value` lines. The two
    * columns are stringified; pass a pre-formatted DataFrame for exact
    * byte compatibility (e.g. InvertedIndex.referenceFormat). `mode`
    * follows DataFrameWriter ("overwrite" default; RunReference passes
    * "error" to refuse clobbering an existing dir like Hadoop MR does).
    */
  def writeTsv(df: DataFrame, path: String, mode: String = "overwrite"): Unit = {
    val Array(k, v) = df.columns
    df.select(concat(col(k).cast("string"), lit("\t"), col(v).cast("string"))
      .as("line"))
      .write.mode(mode).text(path)
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

  /** Small-file compaction: rewrite a parquet directory into
    * ~`targetBytes`-sized files (computed from the source's actual
    * on-disk size, min 1 partition). The chronic ingest problem at
    * scale — streaming/micro-batch writers leave thousands of KB-sized
    * files whose per-file open/footer cost dominates scans; periodic
    * compaction restores scan bandwidth. Returns the output file count.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long = 128L * 1024 * 1024): Int = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inDir), spark.sparkContext.hadoopConfiguration)
    // in-place compaction would let the overwrite delete the source
    // before the lazy scan reads it — require distinct, non-nested dirs
    val inQ = fs.makeQualified(new org.apache.hadoop.fs.Path(inDir))
    val outQ = fs.makeQualified(new org.apache.hadoop.fs.Path(outDir))
    require(inQ != outQ && !outQ.toString.startsWith(inQ.toString + "/")
        && !inQ.toString.startsWith(outQ.toString + "/"),
      s"compact: outDir must not overlap inDir ($inQ vs $outQ)")
    val totalBytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(inDir)).getLength
    val parts = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inDir)
      .repartition(parts)
      .write.mode("overwrite").parquet(outDir)
    fs.listStatus(new org.apache.hadoop.fs.Path(outDir))
      .count(_.getPath.getName.startsWith("part-"))
  }

  /** Header CSV interchange sink/source pair. Reading back with the
    * writer's schema (not inference) keeps types exact and skips the
    * sampling pass a 100 TB inference would cost.
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String,
              schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** ORC columnar sink/source pair (bundled with Spark): the second
    * columnar interchange format after parquet — same pushdown/pruning
    * machinery (predicate pushdown via ORC SearchArguments, column
    * projection, splittable stripes), for estates standardized on ORC.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** JSON-lines interchange sink/source pair (one object per line —
    * splittable, so a 100 TB directory still parallelizes by line
    * ranges, unlike multi-line JSON).
    */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJsonl(spark: SparkSession, path: String,
                schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
