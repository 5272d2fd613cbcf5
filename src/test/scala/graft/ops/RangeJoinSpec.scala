package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naive(points: Seq[java.lang.Double],
                    ranges: Seq[(Long, Double, Double)]): Set[(Double, Long)] =
    (for {
      p <- points if p != null
      (id, lo, hi) <- ranges if lo <= p && p < hi
    } yield (p.doubleValue, id)).toSet

  private val ranges = Seq(
    (1L, 0.0, 10.0), (2L, 5.0, 7.0), (3L, -20.0, -3.5),
    (4L, 9.99, 10.01), (5L, 50.0, 50.0), // empty: lo == hi
    (6L, 30.0, 20.0), // inverted: drops
    (7L, 100.0, 140.0))
  private val points: Seq[java.lang.Double] =
    Seq(0.0, 5.0, 6.99, 7.0, 9.99, 10.0, -3.5, -19.9, 50.0, 139.999, 140.0,
      null)

  private def run(w: Double): Set[(Double, Long)] = {
    val p = points.toDF("p")
    val r = ranges.toDF("id", "lo", "hi")
    RangeJoin.pointInInterval(p, "p", r, "lo", "hi", w)
      .select($"p", $"id").as[(Double, Long)].collect().toSet
  }

  test("binned result equals the naive nested loop, including " +
    "hi-exclusive / lo-inclusive edges, negatives, empty and inverted " +
    "ranges, null points") {
    assert(run(4.0) == naive(points, ranges))
  }

  test("result is invariant to bin width") {
    val expected = naive(points, ranges)
    for (w <- Seq(0.7, 1.0, 13.0, 1000.0)) assert(run(w) == expected, s"w=$w")
  }

  test("a pathologically wide range routes to the leftover join: no blowup, no dropped match") {
    // hi = 1e12 with w = 0.5 would explode to 2e12 bin rows (and fail
    // Spark's sequence cap) without the maxBinsPerRange guard; the
    // overflow range must instead match through the broadcast leftover
    // side with identical semantics
    val wideRanges = ranges :+ (8L, -5.0, 1.0e12)
    val p = points.toDF("p")
    val r = wideRanges.toDF("id", "lo", "hi")
    val out = RangeJoin.pointInInterval(p, "p", r, "lo", "hi",
        binWidth = 0.5, maxBinsPerRange = 64L)
      .select($"p", $"id").as[(Double, Long)].collect().toSet
    assert(out == naive(points, wideRanges))
    // the wide range really did match (it covers most points), so the
    // leftover path was exercised, not vacuous
    assert(out.count(_._2 == 8L) > 3)
    // and a normal-width range still travels the binned path with a
    // tiny cap forcing EVERYTHING through leftover: same answer
    val allLeftover = RangeJoin.pointInInterval(p, "p", r, "lo", "hi",
        binWidth = 0.5, maxBinsPerRange = 1L)
      .select($"p", $"id").as[(Double, Long)].collect().toSet
    assert(allLeftover == naive(points, wideRanges))
  }

  test("an open-ended (infinite) range cannot wrap the bin-count guard") {
    // floor(+inf / w) clamps to Long.MaxValue; pre-fix the LONG bin
    // count wrapped negative, sailed under the threshold, and the
    // range hit the sequence explode the guard exists to prevent —
    // the double-typed count saturates instead, so the range routes
    // to the leftover join and still matches exactly
    val p = points.toDF("p")
    val r = (ranges :+ (9L, 0.0, Double.PositiveInfinity)).toDF("id", "lo", "hi")
    val out = RangeJoin.pointInInterval(p, "p", r, "lo", "hi",
        binWidth = 0.5, maxBinsPerRange = 64L)
      .select($"p", $"id").as[(Double, Long)].collect().toSet
    val inf = out.filter(_._2 == 9L)
    assert(inf == points.filter(p => p != null && p >= 0.0)
        .map(_.doubleValue -> 9L).toSet,
      s"open-ended range must match every non-negative point: $inf")
  }

  test("suggestBinWidth handles integer-typed range bounds") {
    import spark.implicits._
    // percentile_approx returns the INPUT type — pre-fix, BIGINT
    // lo/hi (the GeoIP-as-longs shape) threw ClassCastException
    val r = Seq((0L, 10L), (0L, 20L), (0L, 30L)).toDF("lo", "hi")
    assert(RangeJoin.suggestBinWidth(r, "lo", "hi") == Some(20.0))
  }

  test("overlapping ranges yield one row per matching pair, no dupes") {
    val out = run(4.0).toSeq
    // p=5.0 and 6.99 fall in both range 1 and 2
    assert(out.count(_._1 == 5.0) == 2)
    val df = RangeJoin.pointInInterval(
      points.toDF("p"), "p", ranges.toDF("id", "lo", "hi"), "lo", "hi", 4.0)
    assert(df.count() == df.distinct().count())
  }

  test("plan is an equi-join on the bin, not a nested loop") {
    val df = RangeJoin.pointInInterval(
      points.toDF("p"), "p", ranges.toDF("id", "lo", "hi"), "lo", "hi", 4.0)
    df.collect()
    val executed = df.queryExecution.executedPlan
    assert(executed.collect { case b: BroadcastNestedLoopJoinExec => b }.isEmpty,
      s"expected no nested-loop join:\n$executed")
  }

  test("suggestBinWidth returns the median valid width; None when empty") {
    val r = ranges.toDF("id", "lo", "hi")
    // valid widths: 10, 2, 16.5, 0.02, 40 -> median 10
    val w = RangeJoin.suggestBinWidth(r, "lo", "hi").get
    assert(w > 1.9 && w < 17.0, s"median width out of range: $w")
    assert(RangeJoin.suggestBinWidth(
      Seq.empty[(Long, Double, Double)].toDF("id", "lo", "hi"),
      "lo", "hi").isEmpty)
  }

  test("rejects non-positive or non-finite bin widths and name collisions") {
    val p = points.toDF("p")
    val r = ranges.toDF("id", "lo", "hi")
    intercept[IllegalArgumentException](
      RangeJoin.pointInInterval(p, "p", r, "lo", "hi", 0.0))
    intercept[IllegalArgumentException](
      RangeJoin.pointInInterval(p, "p", r, "lo", "hi", Double.NaN))
    intercept[IllegalArgumentException](
      RangeJoin.pointInInterval(p.withColumnRenamed("p", "lo"), "lo",
        r, "lo", "hi", 1.0))
  }
}
