package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable sketch STATE as a first-class dataset — the incremental
  * half of approximate analytics (q52 covers one-shot estimates):
  * per-group HLL sketches are persisted as binary state, and a new
  * batch folds in with a register-wise union instead of a rescan of
  * history — the same never-rescan-history contract as
  * [[graft.index.InvertedIndex.mergePostings]] and
  * [[Dedup.dedupAgainstHistory]].
  *
  * Scale: sketch state is O(groups x 2^lgK) bytes regardless of data
  * size; the merge is a full-outer equi-join on the group key between
  * two state tables (both sketch-sized, both tiny next to the data
  * that produced them). Estimates from merged state are IDENTICAL to
  * a full rebuild — HLL union is register-wise max, which is lossless
  * given one lgConfigK (spec-asserted).
  */
object Sketches {

  /** Per-group HLL distinct sketch of `valueCol` — the state-build
    * pass (one partial+final aggregate over the batch).
    */
  def distinctSketch(df: DataFrame, keyCol: String, valueCol: String,
                     lgK: Int = 12): DataFrame =
    df.groupBy(col(keyCol))
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Fold a delta state into an existing state: full-outer on the key,
    * register-wise union where both sides exist, pass-through where
    * only one does. Both inputs are (key, sketch) frames from
    * [[distinctSketch]] with the same lgK.
    */
  def mergeSketchStates(state: DataFrame, delta: DataFrame,
                        keyCol: String): DataFrame = {
    val a = state.toDF(keyCol, "sk_a")
    val b = delta.toDF(keyCol, "sk_b")
    a.join(b, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("sk_a").isNull, col("sk_b"))
          .when(col("sk_b").isNull, col("sk_a"))
          .otherwise(hll_union(col("sk_a"), col("sk_b"))).as("sketch"))
  }

  /** Distinct-count estimates from a (key, sketch) state table. */
  def estimates(state: DataFrame, keyCol: String): DataFrame =
    state.select(col(keyCol),
      hll_sketch_estimate(col("sketch")).as("n_distinct"))
}
