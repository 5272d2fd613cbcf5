package graft.ops

import graft.text.Normalize

/** DuckDB-SQL replica of the Porter stemmer ([[graft.text.Porter]]),
  * generated as a chain of MATERIALIZED CTEs, so the driver's oracle can
  * independently verify the stemmed text pipeline (q40/q41/q42) instead
  * of falling back to a rows-only check.
  *
  * Construction notes:
  *  - Each algorithm step is one CTE layer computing the next word form
  *    from the previous; conditions (measure, vowel-in-stem, *o rule,
  *    double consonant) are derived from a consonant/vowel (CV) form
  *    string built with a list_reduce fold (y's class depends on the
  *    class of the previous character, so it is a scan, not a map).
  *  - measure(stem) = number of VC runs = len(regexp_extract_all(cv,
  *    'V+C')) on the CV form.
  *  - CTEs MUST be MATERIALIZED: DuckDB inlines plain CTEs at every use
  *    site, and each layer references the previous word-form column
  *    many times, so inlining explodes the expression tree
  *    exponentially (observed: >20 GB planning memory on 463 rows).
  *  - Validated word-for-word against the Scala kernel on a 463-word
  *    stress list covering every step's rules plus the published
  *    departures (bli->ble, logi->log) and bug-fix guards.
  *
  * The stemmer is applied to the DISTINCT token vocabulary and joined
  * back — the same shape a scaled engine uses (stem the dictionary, not
  * the token stream).
  */
object PorterSql {

  /** CV-form of string expression `x`: one V/C class char per input
    * char; y is a vowel iff the previous char is a consonant.
    */
  private def cv(x: String): String =
    s"list_reduce(list_prepend('', regexp_extract_all($x, '.')), " +
      "(a, c) -> a || (CASE WHEN c IN ('a','e','i','o','u') THEN 'V' " +
      "WHEN c = 'y' THEN (CASE WHEN a = '' OR right(a, 1) <> 'C' THEN 'C' ELSE 'V' END) " +
      "ELSE 'C' END))"

  /** Porter measure m from a CV-form expression: count of VC runs. */
  private def m(cvx: String): String =
    s"len(regexp_extract_all($cvx, 'V+C'))"

  private val step2: Seq[(String, String)] = Seq(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence",
    "anci" -> "ance", "izer" -> "ize", "bli" -> "ble", "alli" -> "al",
    "entli" -> "ent", "eli" -> "e", "ousli" -> "ous", "ization" -> "ize",
    "ation" -> "ate", "ator" -> "ate", "alism" -> "al",
    "iveness" -> "ive", "fulness" -> "ful", "ousness" -> "ous",
    "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble", "logi" -> "log")

  private val step3: Seq[(String, String)] = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private val step4: Seq[String] = Seq(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  private def suffixCase(w: String, pairs: Seq[(String, String)]): String =
    pairs.map { case (s, _) =>
      s"WHEN right($w, ${s.length}) = '$s' THEN '$s'"
    }.mkString("CASE ", " ", " ELSE '' END")

  private def repCase(sufCol: String, pairs: Seq[(String, String)]): String =
    pairs.map { case (s, r) => s"WHEN '$s' THEN '$r'" }
      .mkString(s"CASE $sufCol ", " ", " ELSE '' END")

  private def step4Case(w: String): String =
    step4.map {
      case "ion" =>
        s"WHEN right($w, 3) = 'ion' AND length($w) >= 4 " +
          s"AND substr($w, length($w) - 3, 1) IN ('s','t') THEN 'ion'"
      case s =>
        s"WHEN right($w, ${s.length}) = '$s' THEN '$s'"
    }.mkString("CASE ", " ", " ELSE '' END")

  /** CTE chain stemming column `wcol` of relation `src` (all other
    * columns carried through); the final CTE `p_out` adds `stem`.
    * Splice as: `WITH ${PorterSql.chain(src, wcol)}, ...`.
    */
  def chain(src: String, wcol: String): String = s"""
p_in AS MATERIALIZED (SELECT *, $wcol AS w0 FROM $src),
p1a AS MATERIALIZED (
  SELECT *,
    CASE WHEN right(w0, 4) = 'sses' THEN left(w0, length(w0) - 2)
         WHEN right(w0, 3) = 'ies' THEN left(w0, length(w0) - 3) || 'i'
         WHEN right(w0, 1) = 's' AND right(w0, 2) <> 'ss' THEN left(w0, length(w0) - 1)
         ELSE w0 END AS w1
  FROM p_in),
p1b1 AS MATERIALIZED (
  SELECT *,
    CASE WHEN right(w1, 3) = 'eed' THEN
           (CASE WHEN ${m(cv("left(w1, length(w1) - 3)"))} > 0
                 THEN left(w1, length(w1) - 1) ELSE w1 END)
         WHEN right(w1, 2) = 'ed' AND contains(${cv("left(w1, length(w1) - 2)")}, 'V')
           THEN left(w1, length(w1) - 2)
         WHEN right(w1, 3) = 'ing' AND contains(${cv("left(w1, length(w1) - 3)")}, 'V')
           THEN left(w1, length(w1) - 3)
         ELSE w1 END AS wb,
    (right(w1, 3) <> 'eed' AND
     ((right(w1, 2) = 'ed' AND contains(${cv("left(w1, length(w1) - 2)")}, 'V'))
      OR (right(w1, 3) = 'ing' AND contains(${cv("left(w1, length(w1) - 3)")}, 'V')))) AS fx
  FROM p1a),
p1b2 AS MATERIALIZED (
  SELECT * EXCLUDE (cvb),
    CASE WHEN NOT fx THEN wb
         WHEN right(wb, 2) IN ('at','bl','iz') THEN wb || 'e'
         WHEN length(wb) >= 2 AND right(cvb, 1) = 'C'
              AND right(wb, 1) = substr(wb, length(wb) - 1, 1)
              AND right(wb, 1) NOT IN ('l','s','z')
           THEN left(wb, length(wb) - 1)
         WHEN ${m("cvb")} = 1 AND right(cvb, 3) = 'CVC'
              AND right(wb, 1) NOT IN ('w','x','y')
           THEN wb || 'e'
         ELSE wb END AS w2
  FROM (SELECT *, ${cv("wb")} AS cvb FROM p1b1)),
p1c AS MATERIALIZED (
  SELECT *,
    CASE WHEN right(w2, 1) = 'y' AND contains(${cv("left(w2, length(w2) - 1)")}, 'V')
         THEN left(w2, length(w2) - 1) || 'i' ELSE w2 END AS w3
  FROM p1b2),
p2 AS MATERIALIZED (
  SELECT * EXCLUDE (suf2, stem2, rep2),
    CASE WHEN suf2 <> '' AND ${m(cv("stem2"))} > 0 THEN stem2 || rep2 ELSE w3 END AS w4
  FROM (
    SELECT *, left(w3, length(w3) - length(suf2)) AS stem2,
      ${repCase("suf2", step2)} AS rep2
    FROM (SELECT *, ${suffixCase("w3", step2)} AS suf2 FROM p1c))),
p3 AS MATERIALIZED (
  SELECT * EXCLUDE (suf3, stem3, rep3),
    CASE WHEN suf3 <> '' AND ${m(cv("stem3"))} > 0 THEN stem3 || rep3 ELSE w4 END AS w5
  FROM (
    SELECT *, left(w4, length(w4) - length(suf3)) AS stem3,
      ${repCase("suf3", step3)} AS rep3
    FROM (SELECT *, ${suffixCase("w4", step3)} AS suf3 FROM p2))),
p4 AS MATERIALIZED (
  SELECT * EXCLUDE (suf4, stem4),
    CASE WHEN suf4 <> '' AND ${m(cv("stem4"))} > 1 THEN stem4 ELSE w5 END AS w6
  FROM (
    SELECT *, left(w5, length(w5) - length(suf4)) AS stem4
    FROM (SELECT *, ${step4Case("w5")} AS suf4 FROM p3))),
p5 AS MATERIALIZED (
  SELECT * EXCLUDE (cvw, m5, w7),
    CASE WHEN right(w7, 2) = 'll'
              AND len(regexp_extract_all(left(cvw, length(w7)), 'V+C')) > 1
         THEN left(w7, length(w7) - 1) ELSE w7 END AS w8
  FROM (
    SELECT *,
      CASE WHEN right(w6, 1) = 'e' AND
                (m5 > 1 OR (m5 = 1 AND NOT (
                   length(w6) >= 4 AND substr(cvw, length(w6) - 3, 3) = 'CVC'
                   AND substr(w6, length(w6) - 1, 1) NOT IN ('w','x','y'))))
           THEN left(w6, length(w6) - 1) ELSE w6 END AS w7
    FROM (SELECT *, ${m("cvw")} AS m5 FROM
      (SELECT *, ${cv("w6")} AS cvw FROM p4)))),
p_out AS MATERIALIZED (
  SELECT * EXCLUDE (w0, w1, wb, fx, w2, w3, w4, w5, w6, w8),
    CASE WHEN length($wcol) < 3 THEN $wcol ELSE w8 END AS stem
  FROM p5)"""

  /** Tokenization + normalization CTEs replicating
    * [[graft.text.Normalize.tokens]] over `documents`, ending in
    * `tokens(doc_id, term)` with Porter-stemmed terms: whitespace
    * split, punctuation strip, lowercase, drop empties and stopwords,
    * stem the distinct vocabulary, join back.
    */
  def tokensCtes: String = {
    val stops = Normalize.defaultStopwords.map(s => s"'$s'").mkString(", ")
    s"""toks AS MATERIALIZED (
  SELECT doc_id, tok FROM (
    SELECT doc_id, lower(regexp_replace(t, '\\p{P}', '', 'g')) AS tok
    FROM (SELECT doc_id, unnest(string_split_regex(text, '[ \\t\\n\\x0B\\f\\r]+')) AS t FROM documents))
  WHERE tok <> '' AND tok NOT IN ($stops)),
vocab AS MATERIALIZED (SELECT DISTINCT tok FROM toks),
${chain("vocab", "tok")},
tokens AS MATERIALIZED (
  SELECT t.doc_id, p.stem AS term FROM toks t JOIN p_out p USING (tok))"""
  }
}
