package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Proves the join-side skew story: with a manufactured hot key, AQE's
  * skew-join handling splits the oversized partition into parallel
  * sub-reads (OptimizeSkewedJoin), so one straggler reducer becomes
  * many — the runtime complement to the aggregation-side salting in
  * [[Skew.saltedSumAgg]]. Thresholds are lowered to trigger on test
  * data; on a cluster the defaults (256 MB) apply.
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the skewed join partition (isSkew sub-partitions)") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 50k rows of key 0 (hot) + 64 singleton keys, joined to a dim
      val fact = spark.range(50000).select(
        when(col("id") < 49936, 0L).otherwise(col("id") % 64 + 1).as("k"),
        concat(lit("payload-"), col("id")).as("payload"))
      val dim = spark.range(65).select(col("id").as("k"),
        concat(lit("dim-"), col("id")).as("dval"))
      val joined = fact.join(dim, "k")
      // execute THIS frame (count() would plan a separate query and the
      // inspected adaptive plan would stay initial/unexecuted)
      assert(joined.collect().length == 50000) // correctness unaffected
      val plan = joined.queryExecution.executedPlan
      var adaptive: Option[org.apache.spark.sql.execution.SparkPlan] = None
      plan.foreach {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          if (adaptive.isEmpty) adaptive = Some(a.executedPlan)
        case _ => ()
      }
      val txt = adaptive.getOrElse(plan).toString
      assert(txt.contains("skew=true") || txt.contains("AQEShuffleRead skewed"),
        s"no skew split in adaptive plan:\n${txt.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("saltedSumAgg equals plain aggregation") {
    import spark.implicits._
    val df = Seq((1L, 10.0), (1L, 20.0), (2L, 5.0), (1L, 30.0)).toDF("k", "v")
    val salted = Skew.saltedSumAgg(df, col("k"), buckets = 4,
      ("total", sum(col("v"))), ("cnt", count(lit(1))))
      .select("key", "total", "cnt").as[(Long, Double, Long)].collect()
      .map { case (k, t, c) => k -> (t, c) }.toMap
    assert(salted == Map(1L -> (60.0, 3L), 2L -> (5.0, 1L)))
  }

  test("saltedSumAgg rejects broken contracts at the call site, not mid-stage") {
    import spark.implicits._
    val df = Seq((1L, 10.0)).toDF("k", "v")
    // buckets = 0: pmod(x, 0) is NULL under default config — the salt
    // silently degrades to a single group (the exact straggler plan
    // this helper fixes) rather than failing
    assert(intercept[IllegalArgumentException] {
      Skew.saltedSumAgg(df, col("k"), buckets = 0, ("t", sum(col("v"))))
    }.getMessage.contains("buckets"))
    assert(intercept[IllegalArgumentException] {
      Skew.saltedSumAgg(df, col("k"), buckets = 4)
    }.getMessage.contains("at least one"))
    assert(intercept[IllegalArgumentException] {
      Skew.saltedSumAgg(df, col("k"), buckets = 4, ("key", sum(col("v"))))
    }.getMessage.contains("collides"))
  }

  test("sampling hkey is exact and non-negative past the 64-bit overflow boundary") {
    import spark.implicits._
    // id * 2654435761 overflows Long for id >= ~3.47e9: the naive form
    // wrapped NEGATIVE in Spark (poisoning ln-based sampling weights)
    // while the DuckDB twin errored. The split form must equal exact
    // BigInt arithmetic everywhere and the naive form where it was valid.
    val ids = Seq(0L, 1L, 42L, 500000L, 3469999999L, 3470000000L,
      4000000000L, 4294967295L, 7000000000L, Long.MaxValue / 2654435761L + 7L)
    val got = ids.toDF("id")
      .select(col("id"), graft.ops.Sampling.hkey(col("id")).as("h"))
      .as[(Long, Long)].collect().toMap
    ids.foreach { id =>
      val exact = ((BigInt(id) * BigInt(2654435761L)) mod BigInt(4294967296L)).toLong
      assert(got(id) == exact, s"hkey($id) = ${got(id)} != exact $exact")
      assert(got(id) >= 0L)
    }
  }
}
