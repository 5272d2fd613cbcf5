package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated parquet fixture tables
  * (TESTDATA.md). All queries take the scale-factor directory at call
  * time so the same plan runs at any SF.
  */
object Tables {
  def region(s: SparkSession, dir: String): DataFrame = load(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame = load(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame = load(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = load(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame = load(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame = load(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame = load(s, dir, "lineitem")
  /** events.parquet's physical timestamp encoding has varied across
    * driver fixture generations (TIMESTAMP(NANOS) surfaced as raw
    * longs under nanosAsLong; TIMESTAMP(MICROS) inferred as NTZ);
    * normalize to a TimestampType column (microsecond precision) here
    * so every downstream operator sees the same type regardless.
    */
  def events(s: SparkSession, dir: String): DataFrame =
    normalizeEventTs(load(s, dir, "events"))

  /** Shared by the batch and streaming event readers: the fixture's
    * timestamp column must always surface as TimestampType (LTZ,
    * microsecond precision) regardless of how the driver wrote it.
    * Two physical encodings have been observed across fixture
    * generations: TIMESTAMP(NANOS), which the vectorized reader only
    * surfaces as raw nano-longs (nanosAsLong), and TIMESTAMP(MICROS,
    * isAdjustedToUTC=false), which Spark 4 infers as TIMESTAMP_NTZ.
    * The NTZ->LTZ cast reinterprets wall time in the session zone;
    * every entrypoint (GraftSession/Verify/Bench/SparkSpec) pins
    * spark.sql.session.timeZone=UTC, so it is micros-exact and keeps
    * unix_micros()/window arithmetic and the dumped parquet type
    * identical across fixture generations.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // FLOOR division, not `div` (truncation): a pre-epoch instant
        // encoded as nanos must land on the same microsecond a MICROS
        // fixture generation would write (floor), or the two
        // generations this normalization exists to unify differ by
        // 1us below 1970. pmod is non-negative, so (ts - pmod)/1000
        // floors for every sign.
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr(
              "(ts - pmod(ts, 1000)) div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  def documents(s: SparkSession, dir: String): DataFrame = load(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = load(s, dir, "embeddings")

  def load(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")
}
