package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MERGE INTO semantics for corpus snapshots without a table format:
  * apply a CDC delta (inserts/updates/deletes, optionally ordered by a
  * sequence column) onto a snapshot and produce the next snapshot — the
  * refresh step a training-corpus pipeline runs between crawls, and the
  * batch twin of [[graft.index.InvertedIndex]]'s incremental merge.
  *
  * Plan shape: resolve the delta to one winner per key (window over
  * the DELTA only — the small side), then
  *   next = snapshot ANTI-JOIN delta-keys  UNION ALL  delta-upserts.
  * The snapshot — the 100 TB side — is touched by exactly one
  * left-anti equi-join, which AQE turns into a broadcast when the
  * delta is small (the common case); with both sides bucketed by key
  * even that exchange disappears. No full-table rewrite, no
  * driver-side state.
  */
object Cdc {

  /** @param snapshot current state; one row per `key` (by contract).
    * @param delta    change rows: `key`, payload columns matching
    *                 snapshot's schema, plus `opCol` ('I'nsert/'U'psert
    *                 or 'D'elete).
    * @param seqCol   optional total-order column within the delta;
    *                 highest wins per key (ties: deletes win, the
    *                 conservative choice). Without it the delta must be
    *                 unique per key (enforced defensively by the same
    *                 dedup with a constant sequence).
    */
  def applyCdc(snapshot: DataFrame, delta: DataFrame, key: String,
               opCol: String = "op", seqCol: Option[String] = None): DataFrame = {
    val cols = snapshot.columns.toSeq
    require(cols.contains(key), s"key $key missing from snapshot")
    val seq = seqCol.map(col).getOrElse(lit(0L))
    // one winner per key: latest sequence; deletes beat upserts on ties
    val w = Window.partitionBy(col(key))
      .orderBy(seq.desc, when(col(opCol) === "D", 0).otherwise(1))
    // internal rank column: withColumn silently REPLACES an existing
    // column of the same name, so a fixed "_rn" would clobber real
    // delta data — pick the first _graft_rn[_i] the delta doesn't have
    val rn = (Iterator("_graft_rn") ++ Iterator.from(1).map(i => s"_graft_rn_$i"))
      .find(n => !delta.columns.contains(n)).get
    // junk change rows degrade row-local, never mutate state: a NULL
    // op would otherwise fail BOTH op tests — dropped from upserts yet
    // still anti-joined out of the snapshot, silently DELETING its key
    // — and a NULL key row would flow through as a phantom snapshot row
    val resolved = delta
      .filter(col(opCol).isNotNull && col(key).isNotNull)
      .withColumn(rn, row_number().over(w))
      .filter(col(rn) === 1)
    val upserts = resolved.filter(col(opCol) =!= "D").select(cols.map(col): _*)
    snapshot
      .join(resolved.select(col(key)), Seq(key), "left_anti")
      .unionByName(upserts)
  }
}
