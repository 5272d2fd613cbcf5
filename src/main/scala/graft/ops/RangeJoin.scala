package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval join with NO equi key — the range-lookup shape
  * (GeoIP/CIDR tables, price bands, time buckets) that web-log
  * analytics hits constantly and that Spark plans as a broadcast
  * nested-loop join: O(|points| x |ranges|) comparisons, and an OOM
  * or a cartesian the moment the range side outgrows the broadcast
  * threshold.
  *
  * Binned formulation instead:
  *   1. each point maps to exactly one bin: `floor(p / w)`;
  *   2. each range `[lo, hi)` explodes to the bins it covers:
  *      `sequence(floor(lo/w), floor(hi/w))`;
  *   3. equi-join on the bin, then re-check the exact predicate
  *      `lo <= p < hi`.
  *
  * No duplicates by construction (a point owns one bin; a range lists
  * each covered bin once), no false negatives (floor is monotone under
  * IEEE division by a positive w, so `lo <= p < hi` implies
  * `floor(lo/w) <= floor(p/w) <= floor(hi/w)`).
  *
  * Scale: the join is a plain shuffled equi-join on a numeric key —
  * partial-aggregatable, AQE-splittable when a bin is hot. Cost is
  * `|points| + sum(width_i / w + 2)` candidate rows instead of
  * `|points| x |ranges|`. Pick `w` near the median range width:
  * much smaller explodes the range side; much larger piles unrelated
  * points and ranges into the same bin and the post-filter does the
  * nested-loop's work locally. [[suggestBinWidth]] computes that
  * median with one tiny aggregate over the (by-assumption much
  * smaller) range side.
  */
object RangeJoin {

  /** All (point, range) pairs with `lo <= point < hi`, as the joined
    * row set. Null or empty (`lo >= hi`) ranges and null points drop —
    * they can match nothing. Column names must not collide.
    *
    * Wide-outlier guard: a single pathological range (an open-ended
    * sentinel like `hi = 1e12` against a median-derived width) would
    * explode to `width/w` bin rows — millions of rows from one input
    * row, and past ~2.1e9 Spark's `sequence` fails the whole job.
    * Ranges covering more than `maxBinsPerRange` bins are therefore
    * routed around the explode: they join the point side by the exact
    * predicate through a broadcast nested-loop LEFTOVER join instead.
    * By the same assumption that makes binning sensible (widths
    * concentrated near the median), overflow ranges are rare — the
    * broadcast side is a sliver — while correctness is preserved for
    * arbitrary inputs: no OOM, no sequence failure, no dropped match.
    *
    * @param binWidth        bin width in point units; > 0, finite.
    * @param maxBinsPerRange max bins a range may explode to before it
    *                        is routed to the leftover join; >= 1.
    */
  def pointInInterval(
      points: DataFrame, pointCol: String,
      ranges: DataFrame, loCol: String, hiCol: String,
      binWidth: Double, maxBinsPerRange: Long = 4096L): DataFrame = {
    require(binWidth > 0 && java.lang.Double.isFinite(binWidth),
      s"binWidth must be positive and finite, got $binWidth")
    require(maxBinsPerRange >= 1L,
      s"maxBinsPerRange must be >= 1, got $maxBinsPerRange")
    require(points.columns.toSet.intersect(ranges.columns.toSet).isEmpty,
      "point and range column names collide")
    // withColumn REPLACES an existing column silently — a real _bin
    // column would be clobbered by the internal bin key
    require(!points.columns.contains("_bin") && !ranges.columns.contains("_bin"),
      "'_bin' is reserved by pointInInterval; rename the input column")
    val w = lit(binWidth)
    val p = points.filter(col(pointCol).isNotNull)
    val valid = ranges
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull &&
        col(loCol) < col(hiCol))
    // bin count in DOUBLE, not long: floor() of an open-ended sentinel
    // (hi = +Infinity, or any hi/w beyond 2^63) clamps to Long.MaxValue
    // and the long subtraction then WRAPS negative — sailing under the
    // threshold and into the very sequence explode this guard exists
    // to prevent. Doubles saturate instead of wrapping, and a
    // ~4096-scale threshold is exact in double arithmetic.
    val nBins = floor(col(hiCol) / w).cast("double") -
      floor(col(loCol) / w).cast("double") + 1.0
    val r = valid.filter(nBins <= maxBinsPerRange.toDouble)
      .withColumn("_bin",
        explode(sequence(floor(col(loCol) / w), floor(col(hiCol) / w))))
    val binned = p.withColumn("_bin", floor(col(pointCol) / w))
      .join(r, "_bin")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_bin")
    val leftover = p.join(
      broadcast(valid.filter(nBins > maxBinsPerRange.toDouble)),
      col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
    binned.unionByName(leftover.select(binned.columns.map(col): _*))
  }

  /** Median range width — the recommended bin width — via one
    * aggregate over the range side. Driver-side scalar by design: it
    * parameterizes the plan, the same way AQE reads shuffle stats.
    * Returns None when the range side has no valid rows.
    */
  def suggestBinWidth(
      ranges: DataFrame, loCol: String, hiCol: String): Option[Double] = {
    val row = ranges
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull &&
        col(loCol) < col(hiCol))
      // cast to double: percentile_approx returns the INPUT type, so
      // integer-typed lo/hi (the GeoIP-as-BIGINT shape this class
      // motivates) would hand getDouble a java.lang.Long
      .agg(percentile_approx((col(hiCol) - col(loCol)).cast("double"),
        lit(0.5), lit(1000)))
      .head()
    if (row.isNullAt(0)) None
    else Option(row.getDouble(0)).filter(v => v > 0 && java.lang.Double.isFinite(v))
  }
}
