package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot keys at scale.
  *
  * AQE's skew-join splitting covers joins; for *aggregations* with
  * decomposable functions the classic fix is salting: pre-aggregate on
  * (key, salt) to spread a hot key over `buckets` reducers, then
  * finish on key. Two exchanges, but each moves only pre-aggregated
  * rows — at 100 TB this converts a single straggler reducer into
  * `buckets` parallel ones.
  */
object Skew {

  /** Two-phase salted aggregation for sum-decomposable aggregates.
    * OUTPUT CONTRACT: the grouping key comes back as a column named
    * "key" (the input key expression may be arbitrary, so its name
    * cannot be preserved in general); agg output names must not use
    * "key".
    * @param aggs (outName, aggExpr) pairs where aggExpr is the phase-1
    *             aggregate over (key, salt); phase 2 combines the
    *             partials with SUM — so aggExpr must be sum() or
    *             count() (anything whose partials combine by addition).
    *             Non-additive aggregates (max, avg, distinct) would be
    *             silently wrong here — compose them from additive
    *             pieces instead (e.g. avg = salted sum / salted count).
    */
  def saltedSumAgg(df: DataFrame, key: Column, buckets: Int,
                   aggs: (String, Column)*): DataFrame = {
    // the salt must be DETERMINISTIC per row content: a salt built from
    // partition id / monotonically_increasing_id changes on stage
    // retry, and recomputed map tasks would then route rows to
    // different buckets than already-fetched outputs assumed (the
    // classic repartition-correctness hazard) — sums could silently
    // drop or double-count. Hashing the row content spreads a hot key
    // across buckets just as well, reproducibly.
    //
    // Known limitation of content-derived salts: EXACT-duplicate rows
    // of a hot key all hash to one bucket, so a key whose volume is
    // dominated by identical rows degrades back to a single reducer.
    // That trade is deliberate — the retry-safe alternatives all
    // reintroduce nondeterminism. If duplicated-row hot keys are the
    // actual workload, pre-aggregate the duplicates first
    // (groupBy(all columns).count) and salt the distinct rows.
    //
    // xxhash64 fails analysis on MapType inputs (maps are unorderable /
    // unhashable in Spark): salt only over hashable columns. The key
    // column(s) are always hashable-or-failing anyway (groupBy would
    // reject them), and dropping a map column from the SALT merely
    // coarsens the spread, never the result.
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    val saltCols = df.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name))
    require(saltCols.nonEmpty,
      "saltedSumAgg: no hashable columns to derive a deterministic salt from")
    require(!df.columns.contains("_salt") && !df.columns.contains("_key"),
      "'_salt'/'_key' are reserved by saltedSumAgg; rename the input column")
    // buckets <= 0 would not fail here: pmod(x, 0) is NULL under the
    // default config, so every hot-key row lands in ONE (_key, null)
    // group — the single-straggler plan this helper exists to fix,
    // silently — and ANSI mode instead dies mid-stage
    require(buckets > 0, s"saltedSumAgg: buckets must be > 0, got $buckets")
    require(aggs.nonEmpty, "saltedSumAgg: at least one (name, agg) pair required")
    // the grouping key comes back named "key" (documented output
    // contract); an agg column of that name would make the rename
    // produce two ambiguous 'key' columns downstream
    require(!aggs.exists(_._1 == "key"),
      "saltedSumAgg: agg output name 'key' collides with the grouping column")
    val salted = df
      .withColumn("_salt",
        pmod(xxhash64(saltCols: _*), lit(buckets.toLong)))
      .groupBy(key.as("_key"), col("_salt"))
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, c) => c.as(n) }: _*)
    salted
      .groupBy(col("_key"))
      .agg(sum(col(aggs.head._1)).as(aggs.head._1),
        aggs.tail.map { case (n, _) => sum(col(n)).as(n) }: _*)
      .withColumnRenamed("_key", "key")
  }
}
