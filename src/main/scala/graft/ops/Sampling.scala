package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic sampling key shared by the q67 oracle query and the
  * curation balancing stage: Knuth's multiplicative hash in plain
  * BIGINT arithmetic, reproducible in any SQL engine (no engine RNG,
  * no engine hash). Keep the constants in lockstep with the DuckDB SQL
  * in Extended.q67.
  */
object Sampling {
  def hkey(id: Column): Column = (id * lit(2654435761L)) % lit(4294967296L)
}
