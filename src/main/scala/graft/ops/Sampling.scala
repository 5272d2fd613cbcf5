package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic sampling key shared by the q67 oracle query and the
  * curation balancing/sampling stages: Knuth's multiplicative hash
  * (id·2654435761 mod 2^32) in plain integer arithmetic, reproducible
  * in any SQL engine (no engine RNG, no engine hash).
  *
  * OVERFLOW-FREE BY CONSTRUCTION: the naive `id * 2654435761 % 2^32`
  * overflows 64-bit for id ≳ 3.47e9 — Spark (non-ANSI) silently wraps
  * NEGATIVE (poisoning the downstream `ln(hkey + 0.5)` sampling
  * weights) while DuckDB raises a BIGINT out-of-range error, so the
  * documented cross-engine lockstep broke exactly at the corpus scale
  * this engine targets. Both forms below compute the product in split
  * 16-bit halves — every intermediate < 2^49 — and are value-identical
  * to the naive form wherever it didn't overflow (ids < 2^63/2654435761
  * ≈ 3.47e9 — the stated wrap boundary), so existing oracle hashes are
  * unchanged. Ids are non-negative by
  * contract (doc_id/event_id); [[hkey]] uses pmod/shift forms that
  * agree with the twin's `//`/`%` on that domain.
  */
object Sampling {

  /** (id · 2654435761) mod 2^32, exact for any non-negative BIGINT id. */
  def hkey(id: Column): Column = {
    val a = pmod(id, lit(4294967296L))
    val ah = shiftright(a, 16) // a < 2^32 => high half < 2^16
    val al = a.bitwiseAND(lit(65535L))
    pmod(
      pmod(ah * lit(2654435761L), lit(4294967296L)) * lit(65536L)
        + al * lit(2654435761L),
      lit(4294967296L))
  }

  /** The DuckDB-SQL twin of [[hkey]] over an expression string —
    * single definition interpolated into every oracle that orders or
    * weights by the sampling key.
    */
  def duckHkey(id: String): String =
    s"((((($id) % 4294967296) // 65536) * 2654435761 % 4294967296) * 65536" +
      s" + (($id) % 4294967296) % 65536 * 2654435761) % 4294967296"

  /** ln(x) in MICRO-NAT INTEGER units: round(ln(x)·10⁶) as BIGINT —
    * the cross-engine log discipline behind the DSIR weights (q176)
    * and the Naive Bayes log-likelihood ratios (q178). One libm ln per
    * DISTINCT bucket/token (the q116 rule), ONE rounding, and
    * everything downstream — per-doc sums over arbitrarily many
    * occurrences, rank comparisons, top-k keys — is exact 64-bit
    * integer arithmetic, order-free and partitioning-free where a
    * double sum would diverge between engines on summation order.
    * Micro (not nano) units keep the rounding boundary ~10⁹ ulps away
    * from either engine's last-bit ln disagreement while a corpus-
    * scale sum of |lp| ≤ ~30·10⁶ stays far inside BIGINT.
    * Both [[lnMicro]] and [[duckLnMicro]] round HALF-AWAY-FROM-ZERO
    * (Spark's HALF_UP on doubles == DuckDB's round()).
    *
    * PRECONDITION: x ≥ 1. The lockstep contract does NOT cover x ≤ 0 —
    * Spark's log returns NULL there (the pipeline keeps running) while
    * DuckDB's ln(0) is -inf and the BIGINT cast ABORTS the oracle
    * query: silent NULLs on one engine, a fatal error on the other.
    * Every caller guarantees positivity structurally (add-one
    * smoothing, count+B totals, `> 0` CASE guards) — a new caller
    * interpolating [[duckLnMicro]] over an expression that can reach 0
    * must add the same.
    */
  def lnMicro(x: Column): Column =
    round(log(x.cast("double")) * lit(1000000.0)).cast("bigint")

  /** Driver-side twin of the Column [[lnMicro]] for vocabulary-bounded
    * collect paths (the q192 piece table): SAME rounding discipline —
    * java.math HALF_UP (= half-away-from-zero) through BigDecimal,
    * exactly Spark's `round` on doubles — where a bare
    * `math.round(ln·1e6)` would be floor(x+0.5), a THIRD rounding
    * rule that disagrees on negative half-boundaries. One definition;
    * the precondition (x ≥ 1) and micro-nat semantics above apply.
    */
  def lnMicro(x: Long): Long =
    java.math.BigDecimal.valueOf(math.log(x.toDouble) * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  /** The DuckDB twin of [[lnMicro]] over an expression string. */
  def duckLnMicro(x: String): String =
    s"CAST(round(ln(CAST(($x) AS DOUBLE)) * 1000000.0) AS BIGINT)"
}
