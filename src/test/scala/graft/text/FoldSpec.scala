package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Goldens for the q207 case/diacritic fold — each case pins one
  * class of the cross-engine contract documented on [[Fold]] (the
  * DuckDB side `nfc_normalize(strip_accents(lower(nfc_normalize)))`
  * was verified to agree on every class here).
  */
class FoldSpec extends AnyFunSuite {

  private val goldens = Seq(
    // identity on the lowercase-ASCII class the fixtures live in
    "hello world 42" -> "hello world 42",
    // Latin case + precomposed accents
    "Café ÉLAN" -> "cafe elan",
    "naïve façade" -> "naive facade",
    "crème brûlée" -> "creme brulee",
    // DECOMPOSED input (e + combining acute) folds to the same output
    // as precomposed — the leading NFC makes the two spellings one key
    "Café" -> "cafe",
    // ß is NOT expanded (lower, not full casefold, on both engines)
    "Straße" -> "straße",
    // Turkish İ lowers to i + combining dot; the strip removes the dot
    "İstanbul" -> "istanbul",
    // stroke in ł is NOT a combining mark — it survives the fold
    "ŁÓDŹ" -> "łodz",
    // Greek + Cyrillic case; final sigma folds to medial σ on BOTH
    // engines (the JVM's contextual Final_Sigma lowercase vs DuckDB's
    // non-contextual lower was the one divergence — both chains end
    // with ς → σ, which also unifies 'ΟΔΟΣ' and 'οδός' as one key)
    "Ωμέγα" -> "ωμεγα",
    "ΟΔΟΣ" -> "οδοσ",
    "οδός" -> "οδοσ",
    "ς" -> "σ",
    "Привет МИР" -> "привет мир",
    // caseless scripts untouched
    "日本語テスト" -> "日本語テスト",
    // ligatures and other compatibility forms deliberately NOT folded
    "ﬁligree ½" -> "ﬁligree ½",
    // non-BMP: emoji and math alphanumerics (no case mappings) pass
    // through whole — no surrogate-half mangling
    "😀 ok" -> "😀 ok",
    "𝐀math" -> "𝐀math")

  test("golden folds per contract class") {
    goldens.foreach { case (in, want) =>
      assert(Fold.fold(in) == want, s"fold(${in})")
    }
  }

  test("idempotent: fold(fold(x)) == fold(x)") {
    goldens.foreach { case (in, _) =>
      val once = Fold.fold(in)
      assert(Fold.fold(once) == once, s"not idempotent on $in")
    }
  }

  test("empty and whitespace-only strings are fixed points") {
    assert(Fold.fold("") == "")
    assert(Fold.fold(" \t\n") == " \t\n")
  }
}
