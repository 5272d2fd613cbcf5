package graft.text

/** Unicode text folding for normalization-ahead-of-shingling near-dup
  * (q207): NFC-compose, lowercase (root locale — full Unicode case
  * mapping), then strip diacritics by NFD-decomposing and dropping
  * non-spacing marks (category Mn), re-composed to NFC. Folds the
  * trivially-disguised duplicates multilingual corpora carry ("Café"
  * vs "cafe", "naïve" vs "naive") onto one shingle stream while
  * leaving caseless scripts (CJK), emoji, and non-BMP text untouched.
  *
  * Cross-engine contract: the DuckDB twin is
  * `nfc_normalize(strip_accents(lower(nfc_normalize(x))))` — utf8proc
  * under DuckDB and ICU-free java.text.Normalizer here agree on this
  * chain across Latin accents, Turkish İ (both lower to i + combining
  * dot, which the strip removes), ß (neither engine case-folds it to
  * ss — `lower`, not full casefold, on both sides), Greek/Cyrillic
  * case, ligatures (neither decomposes ﬁ — compatibility mappings are
  * deliberately NOT applied; NFKC would also fold ½, ², and math
  * alphanumerics, a content-altering step a dedup gate must not
  * take), and non-BMP code points (verified empirically per class;
  * FoldSpec pins the JVM side including non-BMP).
  *
  * Final sigma: the one place the engines' `lower` disagree — the JVM
  * applies Unicode's contextual Final_Sigma rule (ΟΔΟΣ → οδος, word-
  * final ς U+03C2) while DuckDB's lower does not (…σ U+03C3), and a
  * literal typed ς passes through both lowers untouched. Both chains
  * therefore end by folding ς → σ (exactly what full Unicode casefold
  * does with final sigma), which also makes 'ΟΔΟΣ' and 'οδός' one
  * dedup key — the point of the fold.
  */
object Fold {

  def fold(s: String): String = {
    val lower = java.text.Normalizer
      .normalize(s, java.text.Normalizer.Form.NFC)
      .toLowerCase(java.util.Locale.ROOT)
    val nfd = java.text.Normalizer
      .normalize(lower, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    java.text.Normalizer
      .normalize(sb.toString, java.text.Normalizer.Form.NFC)
      .replace('ς', 'σ') // final sigma (see scaladoc)
  }
}
