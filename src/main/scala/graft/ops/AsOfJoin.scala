package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the most recent
  * right row with `rightTime <= leftTime` within the same key — the
  * time-series primitive Spark lacks as a built-in operator.
  *
  * Implementation is the scalable union+window formulation, not a
  * per-key collect or an inequality (nested-loop) join:
  *   1. tag and union both inputs on a common (key, time) spine;
  *   2. one hash exchange on key + one in-partition sort on
  *      (time, side) — rows of the right stream sort before co-timed
  *      left rows, making the match inclusive;
  *   3. running `last(_, ignoreNulls)` carries the latest right payload
  *      forward; filter back to left rows.
  *
  * Scale: exactly one shuffle of |L|+|R| rows and one sort — the same
  * cost profile as a sort-merge join; no K×N blowup, no broadcast
  * requirement, arbitrary key cardinality. Right side should be unique
  * per (key, time) for deterministic semantics (pre-aggregate if not —
  * engines disagree on tie-winners otherwise).
  */
object AsOfJoin {

  /** @param payload right-side columns to carry onto matched left rows
    *                 (names must not collide with left's columns). The
    *                 payload travels as ONE struct so a match is always
    *                 a single consistent right row, even when individual
    *                 payload values are null. NULL SEMANTICS are SQL's
    *                 (and DuckDB ASOF JOIN's, the q37 oracle): right
    *                 rows with a null key or null time are non-matches
    *                 and are dropped up front, and a left row with a
    *                 null (or uncastable) time never matches — without
    *                 the explicit mask, the forward walk's DESCENDING
    *                 order would sort null times LAST and hand them the
    *                 key's minimum-time right row as a spurious match.
    */
  def asofBackward(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String]): DataFrame =
    asofImpl(left, right, leftKey, rightKey, leftTime, rightTime, payload,
      forward = false)

  /** Forward as-of join: for each left row, the EARLIEST right row with
    * `rightTime >= leftTime` in the same key — "what happened next"
    * (next error after a purchase, next fill after an order). Same
    * cost profile as [[asofBackward]]: one exchange, one sort, no
    * K x N blowup — the in-partition walk just runs time-descending so
    * the running carry holds the nearest FUTURE right row instead of
    * the nearest past one.
    */
  def asofForward(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String]): DataFrame =
    asofImpl(left, right, leftKey, rightKey, leftTime, rightTime, payload,
      forward = true)

  /** Shared union+window spine. Ordering: backward walks time
    * ascending, forward descending; in BOTH directions right rows sort
    * before co-timed left rows (`_side` 0 < 1), which makes the match
    * inclusive at equal timestamps.
    */
  private def asofImpl(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String], forward: Boolean): DataFrame = {
    require(payload.forall(!left.columns.contains(_)),
      s"payload columns ${payload.mkString(",")} collide with left columns")
    val leftCols = left.columns.toSeq
    // the spine's internal columns are reserved, like RangeJoin's
    // _bin and Skew's _salt/_key — a left column named _t would make
    // the window orderBy ambiguous deep in the job instead of here
    require(Seq("_k", "_t", "_side", "_p").forall(n => !leftCols.contains(n)),
      "left columns _k/_t/_side/_p are reserved by the as-of spine")
    val l = left.select(
      Seq(col(leftKey).as("_k"), col(leftTime).cast("timestamp").as("_t"),
        lit(1).as("_side")) ++
        leftCols.map(col) :+
        lit(null).as("_p"): _*)
    // null-key right rows could only ever pair with null-key left
    // rows (the window groups nulls into one partition, unlike a SQL
    // join) — drop them with the null-time rows
    val r = right.filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
        Seq(col(rightKey).as("_k"), col(rightTime).cast("timestamp").as("_t"),
          lit(0).as("_side")) ++
          leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
          struct(payload.map(col): _*).as("_p"): _*)
    val timeOrder = if (forward) col("_t").desc else col("_t").asc
    val w = Window.partitionBy(col("_k"))
      .orderBy(timeOrder, col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r, allowMissingColumns = false)
      .select(
        (Seq(col("_side"), col("_t")) ++ leftCols.map(col) :+
          last(col("_p"), ignoreNulls = true).over(w).as("_p")): _*)
    carried.filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        // null-time mask: in the forward (descending) walk a null _t
        // sorts LAST and the running carry holds the key's
        // minimum-time right row — a spurious match under SQL
        // semantics (rightTime >= null is null). Backward happens to
        // be safe (nulls sort first), but both directions mask so the
        // semantics are symmetric.
        payload.map(c => when(col("_t").isNotNull, col(s"_p.$c")).as(c)): _*)
  }
}
