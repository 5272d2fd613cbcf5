package graft.ops

/** Shared DuckDB-twin SQL fragments. These strings are load-bearing
  * for the bit-exact oracle contract: the cosine fold must be the
  * LITERAL-identical formula to the codegen CosineSimilarityExpr
  * (dot and norms accumulated in index order), and the zero-norm
  * guard must mirror VectorOps.cosine's zero-norm => 0.0 convention.
  * One definition, consumed by every twin that scores vectors — a
  * future change (e.g. also guarding NULL norms) lands everywhere or
  * nowhere.
  */
private[ops] object TwinSql {

  /** The q31 cosine formula over two DuckDB list columns. */
  def cos(a: String, b: String): String =
    s"""list_sum(list_transform(range(1, len($a) + 1),
       |      i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))
       |    / (sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |       * sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))""".stripMargin

  /** [[cos]] with Spark's zero-norm convention (VectorOps.cosine
    * returns 0.0 when either norm is zero): unguarded, DuckDB divides
    * by zero (NULL/inf) where Spark scores 0.0, silently diverging a
    * shortlist ranking on a degenerate vector — e.g. an all-zero
    * SQ8-reconstructed candidate when a dimension's corpus range
    * collapses. Use this form wherever a twin SCORES vectors (the
    * distance stages express the same guard as `THEN 1.0`).
    */
  def cosZ(a: String, b: String): String =
    s"""CASE WHEN list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) = 0
       |       OR list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) = 0
       |     THEN 0.0
       |     ELSE ${cos(a, b)} END""".stripMargin
}
