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
    val b = delta.toDF("_mk_b", "sk_b")
    // NULL-SAFE key join: a junk-row sketch group (key NULL) exists on
    // both sides under groupBy's null-group semantics, and a
    // null-unsafe join would emit TWO null-key rows each covering half
    // the data — the mergePostings defect, same fix
    a.join(b, col(keyCol) <=> col("_mk_b"), "full_outer")
      .select(coalesce(col(keyCol), col("_mk_b")).as(keyCol),
        when(col("sk_a").isNull, col("sk_b"))
          .when(col("sk_b").isNull, col("sk_a"))
          .otherwise(hll_union(col("sk_a"), col("sk_b"))).as("sketch"))
  }

  /** Distinct-count estimates from a (key, sketch) state table. */
  def estimates(state: DataFrame, keyCol: String): DataFrame =
    state.select(col(keyCol),
      hll_sketch_estimate(col("sketch")).as("n_distinct"))

  // -----------------------------------------------------------------
  // Auditable HLL (q128): graft-native HyperLogLog whose ENTIRE
  // estimation path is replayable in plain SQL
  // -----------------------------------------------------------------

  /** Register count 2^9 = 512 (std err 1.04/sqrt(512) ~ 4.6%). */
  val HllLgK = 9
  val HllM = 1 << HllLgK

  /** 63-bit hashes of the distinct (source, term) pairs — the ONLY
    * engine-internal step of the auditable HLL (xxhash64), dumped as
    * the aux artifact so DuckDB re-derives registers and estimate from
    * it. Masking the sign bit keeps every downstream shift/mask
    * non-negative, where arithmetic and logical shifts agree across
    * engines.
    */
  def hllHashes(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), explode(TextAnalytics.toks(col("text"))).as("term"))
      .select(col("source"),
        xxhash64(col("term")).bitwiseAND(lit(Long.MaxValue)).as("hbits"))
      .distinct()

  /** Per-split hashes for the auditable merge (q106): part 0 = history
    * (doc_id < splitAt), part 1 = the delta batch, distinct WITHIN
    * each part — so the oracle re-derives per-part registers, replays
    * the register-wise max merge, and checks it against the full
    * rebuild. Only the xxhash64 is engine-internal; everything past it
    * is integer arithmetic.
    */
  def hllHashesSplit(docs: DataFrame, splitAt: Long): DataFrame =
    docs
      .select(
        when(col("doc_id") < splitAt, lit(0)).otherwise(lit(1)).as("part"),
        col("source"), explode(TextAnalytics.toks(col("text"))).as("term"))
      .select(col("part"), col("source"),
        xxhash64(col("term")).bitwiseAND(lit(Long.MaxValue)).as("hbits"))
      .distinct()

  /** Fold one auditable register-table state into another: union +
    * register-wise max — the lossless HLL merge as PLAIN INTEGER
    * arithmetic over (source, idx, rho) rows, the cross-engine-
    * replayable twin of [[mergeSketchStates]]' binary hll_union.
    * Merge == rebuild exactly, because max is associative over the
    * per-part maxes (q106's oracle re-derives both sides).
    */
  def mergeRegisterStates(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("source"), col("idx"))
      .agg(max(col("rho")).as("rho"))

  /** (source, idx, rho) register table: idx = low lgK bits, rho =
    * leading-zero run of the remaining 54-bit budget + 1, computed
    * with INTEGER/STRING ops only (bit length via `bin()`, no libm) so
    * DuckDB replays it exactly.
    */
  def hllRegisters(hashes: DataFrame): DataFrame =
    hashes
      .select(col("source"),
        col("hbits").bitwiseAND(lit((HllM - 1).toLong)).cast("int").as("idx"),
        shiftright(col("hbits"), HllLgK).as("rest"))
      .select(col("source"), col("idx"),
        when(col("rest") === 0L, lit(63 - HllLgK + 1))
          .otherwise(lit(63 - HllLgK + 1) - length(bin(col("rest"))))
          .cast("int").as("rho"))
      .groupBy(col("source"), col("idx"))
      .agg(max(col("rho")).as("rho"))

  /** Per-source estimate from a register table (Flajolet et al. 2007):
    * E = alpha_m * m^2 / sum_j 2^-M_j, with linear counting below
    * 2.5m when empty registers remain. Every term 2^-M_j is an EXACT
    * power of two (1.0 / (1L << rho) — integer shift + one exact
    * division, no libm pow), summed in register-index order so the
    * float fold is associativity-fixed; ln in the small-range branch
    * uses the rounded-ln discipline. The branch condition compares
    * identically-derived values, so both engines take the same arm.
    */
  def hllEstimates(registers: DataFrame): DataFrame = {
    val alphaMM = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(HllM.toDouble)) *
      lit((HllM.toLong * HllM).toDouble)
    registers
      .groupBy(col("source"))
      .agg(map_from_entries(collect_list(struct(col("idx"), col("rho")))).as("rm"))
      .select(col("source"),
        aggregate(
          transform(sequence(lit(0), lit(HllM - 1)), i =>
            lit(1.0) / call_function("shiftleft", lit(1L),
              coalesce(element_at(col("rm"), i), lit(0))).cast("double")),
          lit(0.0), (a, x) => a + x).as("z"),
        (lit(HllM) - size(col("rm"))).cast("bigint").as("v"))
      .select(col("source"), col("v"),
        (alphaMM / col("z")).as("raw"))
      .select(col("source"),
        when(col("raw") <= lit(2.5 * HllM) && col("v") > 0L,
          lit(HllM.toDouble) * round(log(lit(HllM.toDouble) / col("v").cast("double")), 9))
          .otherwise(col("raw")).as("hll_est"))
  }

  // -----------------------------------------------------------------
  // Auditable Count-Min sketch (q130): heavy-hitter frequency
  // estimates whose whole path PAST the hash is integer arithmetic
  // -----------------------------------------------------------------

  /** Depth (independent hash rows) and width (buckets per row). With
    * d=4, w=256: overestimate <= e/w * N with prob 1 - e^-d per the
    * Cormode-Muthukrishnan bound; never underestimates (gated).
    */
  val CmsD = 4
  val CmsW = 256

  /** Per-distinct-term bucket indexes under the d seeded hashes — the
    * ONLY engine-internal step (xxhash64 with the row index as a
    * leading hashed column); dumped as the aux artifact so DuckDB
    * re-derives counters and estimates from it. Columns: term, h0..h3.
    */
  def cmsHashes(docs: DataFrame): DataFrame = {
    val terms = docs
      .select(explode(TextAnalytics.toks(col("text"))).as("term"))
      .distinct()
    val buckets = (0 until CmsD).map { j =>
      xxhash64(lit(j), col("term")).bitwiseAND(lit((CmsW - 1).toLong))
        .cast("int").as(s"h$j")
    }
    terms.select(col("term") +: buckets: _*)
  }

  /** The d x w counter matrix from exact term counts + the hash table:
    * counters[j][b] = sum of counts of terms hashing to b in row j.
    * Pure BIGINT sums — order-independent, replayable. The matrix is
    * d*w rows regardless of corpus size; at 100 TB the only big job is
    * the term-count aggregate (map-side combined, one exchange).
    */
  def cmsCounters(termCounts: DataFrame, hashes: DataFrame): DataFrame = {
    val perRow = (0 until CmsD).map { j =>
      termCounts.join(hashes, "term")
        .select(lit(j).as("j"), col(s"h$j").as("bucket"), col("cnt"))
    }
    perRow.reduce(_ unionByName _)
      .groupBy(col("j"), col("bucket"))
      .agg(sum(col("cnt")).as("c"))
  }

  /** Point estimate per term: min over the d rows of the counter the
    * term hashes into. Guaranteed >= the true count (every counter
    * includes the term's own contribution) — SketchAccuracySpec gates
    * both sides of the bound.
    */
  def cmsEstimates(terms: DataFrame, hashes: DataFrame,
                   counters: DataFrame): DataFrame = {
    val withH = terms.join(hashes, "term")
    val probes = (0 until CmsD).map { j =>
      withH.select(col("term"), lit(j).as("j"), col(s"h$j").as("bucket"))
    }
    probes.reduce(_ unionByName _)
      .join(counters, Seq("j", "bucket"))
      .groupBy(col("term"))
      .agg(min(col("c")).as("n_cms"))
  }
}
