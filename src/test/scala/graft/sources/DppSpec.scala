package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dynamic Partition Pruning: a dimension-side filter prunes the
  * partitioned fact scan at RUNTIME (the filter value is only known
  * after the dim is read) — on a date/tenant-partitioned 100 TB fact
  * table this is the difference between scanning one partition and
  * scanning everything, without any static predicate on the fact.
  */
class DppSpec extends SparkSpec {
  import spark.implicits._

  test("dim filter dynamically prunes the partitioned fact scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    graft.ops.Tables.orders(spark, sfDir)
      .write.mode("overwrite").partitionBy("o_orderpriority").parquet(dir)
    // the dim must be a real file source: an in-memory LocalRelation
    // gets its filter constant-folded away and the DPP rule then sees
    // no selective predicate to derive the pruning subquery from
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dpp-dim").toString
    Seq(
      ("1-URGENT", "high"), ("2-HIGH", "high"), ("3-MEDIUM", "mid"),
      ("4-NOT SPECIFIED", "low"), ("5-LOW", "low"))
      .toDF("prio", "tier")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)

    val fact = spark.read.parquet(dir)
    val joined = fact
      .join(dim, fact("o_orderpriority") === dim("prio"))
      .filter(col("tier") === "high") // selective predicate on the DIM only
      .groupBy(col("prio")).agg(count(lit(1)).as("n"))

    // the optimized plan carries a dynamicpruning subquery on the fact scan
    val planTxt = joined.queryExecution.executedPlan.toString
    assert(planTxt.contains("dynamicpruning"),
      s"no dynamic pruning in plan:\n${planTxt.take(1500)}")

    // and at runtime only the two matching partitions' files are read
    // (input_file_name is pinned to the fact side pre-join — it cannot
    // resolve over a two-source join)
    val factWithFile = fact.withColumn("_f", input_file_name())
    val touched = factWithFile
      .join(dim, factWithFile("o_orderpriority") === dim("prio"))
      .filter(col("tier") === "high")
      .select(col("_f")).distinct().as[String].collect()
    assert(touched.nonEmpty)
    assert(touched.forall(f =>
      f.contains("o_orderpriority=1-URGENT") || f.contains("o_orderpriority=2-HIGH")),
      s"scan escaped pruned partitions: ${touched.filterNot(f =>
        f.contains("1-URGENT") || f.contains("2-HIGH")).take(3).toList}")

    // correctness: counts match an unpartitioned computation
    val expected = graft.ops.Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH")).count()
    assert(joined.agg(sum("n")).as[Long].head() == expected)
  }
}
