package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Accuracy bounds for the approximate sketches (q52 is rows-only at
  * the oracle because sketch internals are engine-specific): HLL
  * distinct counts must land within the configured relative error of
  * exact, and approx percentiles within rank tolerance of the exact
  * order statistics, on the real fixture data.
  */
class SketchAccuracySpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 3x configured rsd of exact") {
    val li = Tables.lineitem(spark, sfDir)
    val rows = li.groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (flag, approx, exact) =>
      val rel = math.abs(approx - exact).toDouble / exact
      assert(rel <= 0.06, s"$flag: approx=$approx exact=$exact rel=$rel")
    }
  }

  test("percentile_approx(0.5) within 2% rank tolerance of the exact median") {
    val li = Tables.lineitem(spark, sfDir).select(col("l_extendedprice").as("v"))
    val approx = li.agg(
      percentile_approx(col("v"), lit(0.5), lit(1000))).as[Double].head()
    val n = li.count()
    // rank of the approx value must sit near n/2
    val rank = li.filter(col("v") <= approx).count()
    val relRankErr = math.abs(rank - n / 2.0) / n
    assert(relRankErr <= 0.02, s"approx median $approx at rank $rank of $n")
  }
}
