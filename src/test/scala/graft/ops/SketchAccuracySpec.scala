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

  test("q128 auditable HLL within 3 standard errors of exact, per source and in aggregate") {
    val docs = Tables.documents(spark, sfDir)
    val est = Sketches.hllEstimates(
      Sketches.hllRegisters(Sketches.hllHashes(docs)))
    val exact = docs
      .select(col("source"), explode(TextAnalytics.toks(col("text"))).as("term"))
      .groupBy(col("source")).agg(countDistinct(col("term")).as("n_exact"))
    val rows = exact.join(est, "source")
      .as[(String, Long, Double)].collect()
    assert(rows.nonEmpty)
    // m=512 => std err 1.04/sqrt(512) ~ 4.6%; allow 3 sigma ~ 13.8%
    rows.foreach { case (src, ex, e) =>
      val rel = math.abs(e - ex) / ex
      assert(rel <= 3 * 1.04 / math.sqrt(Sketches.HllM), s"$src: est=$e exact=$ex rel=$rel")
    }
    // unbiasedness in aggregate: mean relative error well inside 1 sigma
    val meanRel = rows.map { case (_, ex, e) => (e - ex) / ex }.sum / rows.length
    assert(math.abs(meanRel) <= 1.04 / math.sqrt(Sketches.HllM), s"mean rel err $meanRel")
  }

  test("q128 register merge (max) makes the incremental estimate equal the rebuild exactly") {
    val docs = Tables.documents(spark, sfDir)
    val hist = Sketches.hllRegisters(Sketches.hllHashes(docs.filter(col("doc_id") < 300)))
    val delta = Sketches.hllRegisters(Sketches.hllHashes(docs.filter(col("doc_id") >= 300)))
    val merged = hist.unionByName(delta)
      .groupBy(col("source"), col("idx")).agg(max(col("rho")).as("rho"))
    val a = Sketches.hllEstimates(merged)
      .as[(String, Double)].collect().toMap
    val b = Sketches.hllEstimates(Sketches.hllRegisters(Sketches.hllHashes(docs)))
      .as[(String, Double)].collect().toMap
    assert(a == b) // register-wise max is lossless: bit-identical estimates
  }

  test("q130 CMS never underestimates and stays inside the e/w error bound") {
    val docs = Tables.documents(spark, sfDir)
    val tc = docs
      .select(explode(TextAnalytics.toks(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val hashes = Sketches.cmsHashes(docs)
    val counters = Sketches.cmsCounters(tc, hashes)
    val est = Sketches.cmsEstimates(tc.select(col("term")), hashes, counters)
    val n = tc.agg(sum(col("cnt"))).as[Long].head()
    val rows = tc.join(est, "term").as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    // one-sided guarantee: a counter includes every colliding term's
    // count, so the min over rows can never fall below the true count
    rows.foreach { case (t, ex, e) =>
      assert(e >= ex, s"$t: cms=$e < exact=$ex")
    }
    // Cormode-Muthukrishnan: err <= (e/w)*N with prob 1 - e^-d per
    // term; gate the 99th percentile of errors, not the max, so the
    // probabilistic bound is tested without flaking on the tail
    val bound = math.E / Sketches.CmsW * n
    val errs = rows.map { case (_, ex, e) => (e - ex).toDouble }.sorted
    val p99 = errs((errs.length * 99) / 100 min (errs.length - 1))
    assert(p99 <= bound, s"p99 err $p99 > bound $bound (N=$n)")
  }

  test("q130 CMS counter merge (sum) makes the incremental estimate equal the rebuild") {
    val docs = Tables.documents(spark, sfDir)
    def tcOf(d: org.apache.spark.sql.DataFrame) = d
      .select(explode(TextAnalytics.toks(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val hashes = Sketches.cmsHashes(docs)
    val a = Sketches.cmsCounters(tcOf(docs.filter(col("doc_id") < 300)), hashes)
    val b = Sketches.cmsCounters(tcOf(docs.filter(col("doc_id") >= 300)), hashes)
    val merged = a.unionByName(b)
      .groupBy(col("j"), col("bucket")).agg(sum(col("c")).as("c"))
    val full = Sketches.cmsCounters(tcOf(docs), hashes)
    val probe = tcOf(docs).select(col("term"))
    val em = Sketches.cmsEstimates(probe, hashes, merged)
      .as[(String, Long)].collect().toMap
    val ef = Sketches.cmsEstimates(probe, hashes, full)
      .as[(String, Long)].collect().toMap
    assert(em == ef) // counters are linear: per-bucket sums merge losslessly
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
