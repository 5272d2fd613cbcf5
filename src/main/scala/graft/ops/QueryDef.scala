package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named engine query: the Spark plan builder plus (when the
  * semantics are ANSI-SQL-expressible) the equivalent DuckDB SQL the
  * driver's oracle runs over the same parquet tables.
  *
  * Determinism contract for oracle-checked queries (so value hashes
  * match across engines):
  *  - every query ends in a total ORDER BY (unique key tie-breaks);
  *  - money aggregates go through DECIMAL(18,2) (exact, engine-neutral)
  *    and are cast to DOUBLE only at the end;
  *  - double-valued expressions use the *same literal formula and fold
  *    order* on both sides so IEEE results are bit-identical;
  *  - derived integers are BIGINT on both sides.
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, build, Some(oracle))

  /** Non-SQL-expressible operator: driver records a weaker rows-only check. */
  def rowsOnly(name: String)(build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, build, None)
}
