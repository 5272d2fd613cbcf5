package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/** Proves the shuffle-elimination claim: a join of two tables bucketed
  * on the join key plans with ZERO shuffle exchanges, while the same
  * join on plain parquet needs two.
  */
class BucketingSpec extends SparkSpec {

  private def countShuffles(df: org.apache.spark.sql.DataFrame): Int = {
    val plan = df.queryExecution.executedPlan
    var n = 0
    plan.foreach { case _: ShuffleExchangeLike => n += 1; case _ => () }
    n
  }

  /** AQE's AdaptiveSparkPlanExec hides its children from plan
    * traversal until execution; disable it here so the static physical
    * plan (where bucketing-vs-shuffle is decided) is inspectable.
    */
  private def withoutAqe[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  /** shared fixture: both tests read these tables; lazy so the write
    * happens once regardless of which test runs first
    */
  private lazy val bucketedTables: Unit = {
    Bucketing.writeBucketed(graft.ops.Tables.lineitem(spark, sfDir),
      "li_bucketed", "l_orderkey", 4)
    Bucketing.writeBucketed(graft.ops.Tables.orders(spark, sfDir),
      "o_bucketed", "o_orderkey", 4)
  }

  test("bucketed fact-fact join plans with zero exchanges") { withoutAqe {
    bucketedTables
    val li = graft.ops.Tables.lineitem(spark, sfDir)
    val o = graft.ops.Tables.orders(spark, sfDir)

    val joined = Bucketing.bucketedEquiJoin(
      spark, "li_bucketed", "o_bucketed", "l_orderkey", "o_orderkey")
    assert(joined.count() == li.count()) // every lineitem has its order
    assert(countShuffles(joined) == 0,
      s"expected zero exchanges:\n${joined.queryExecution.executedPlan}")

    // control: the same join over raw parquet must shuffle (no
    // broadcast: disable the threshold for the control measurement)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      plain.count()
      assert(countShuffles(plain) >= 2)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  } }

  test("bucketed aggregation on the bucket key needs no exchange") { withoutAqe {
    bucketedTables
    val agg = spark.table("li_bucketed")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("q"))
    agg.count()
    assert(countShuffles(agg) == 0,
      s"expected zero exchanges:\n${agg.queryExecution.executedPlan}")
  } }
}
