package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Markup -> training text extraction: the first transform a web-crawl
  * corpus pipeline applies to raw HTML. Pure codegen'd string
  * expressions (regexp_replace / replace chains) — scan-speed, narrow,
  * no UDF — and deliberately RE2-compatible (no backreferences, no
  * lookahead) so the identical patterns run in engines with either
  * regex dialect (the DuckDB oracle twin runs these patterns verbatim
  * with the 'g' flag).
  */
object TextExtract {

  /** Visible text of an HTML fragment: drops script/style/comment
    * blocks (their content is never prose), strips remaining tags,
    * decodes the six common entities (amp last — no double-decode),
    * collapses whitespace runs, trims.
    */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&"
    ).foldLeft(noTags) { case (c, (ent, ch)) => replace(c, lit(ent), lit(ch)) }
    // explicit class, not \s: Java's \s includes vertical tab \x0B,
    // RE2's does not — a U+000B in the markup would collapse on Spark
    // but survive in the twin, breaking the dialect-identity contract
    trim(regexp_replace(decoded, "[ \\t\\n\\x0B\\f\\r]+", " "))
  }

  /** The same chain as DuckDB SQL over an expression string — kept
    * beside the Spark chain so the two can only drift loudly (q104
    * hash-checks them against each other).
    */
  def stripHtmlDuckSql(expr: String): String = {
    val noBlocks =
      s"""regexp_replace(regexp_replace(regexp_replace($expr,
         |  '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
         |  '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
         |  '(?s)<!--.*?-->', ' ', 'g')""".stripMargin
    val noTags = s"regexp_replace($noBlocks, '<[^>]+>', ' ', 'g')"
    val decoded = Seq(
      // inside a single-quoted SQL literal only the single quote needs
      // doubling ('' = one '); a double quote stands as itself
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "''", "&nbsp;" -> " ", "&amp;" -> "&"
    ).foldLeft(noTags) { case (c, (ent, ch)) => s"replace($c, '$ent', '$ch')" }
    s"trim(regexp_replace($decoded, '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))"
  }
}
