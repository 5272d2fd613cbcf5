package graft.text

/** Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
  * stripping", Program 14(3) 1980), implemented from the published
  * algorithm description, including the two documented departures of
  * Porter's own reference implementation (`bli`->`ble`, `logi`->`log`)
  * and its two published bug fixes (the length guard before the
  * double-suffix step, and the `j >= 0` guard on the `ion` test).
  *
  * The reference engine embeds the same published stemmer as its only
  * nontrivial scalar function (`/root/reference/ProcessData.java:45-361`,
  * applied per token at `:407-413`); this is an independent Scala
  * implementation of that public algorithm, not a translation.
  *
  * Semantics: total on any string; words shorter than 3 chars are
  * returned unchanged (the algorithm's `k > 1` guard); operates on
  * lowercase ASCII letters — any other character is treated as a
  * consonant, matching the published implementation's behavior.
  */
object Porter {

  /** Stem a single word. Thread-safe, allocation-light (one char array). */
  def stem(word: String): String = {
    if (word == null || word.length < 3) return word
    val s = new State(word.toCharArray)
    s.step1ab()
    s.step1c()
    s.step2()
    s.step3()
    s.step4()
    s.step5()
    // always materialize from the buffer: steps can rewrite characters
    // in place without changing the length (e.g. step 1c's y -> i)
    new String(s.b, 0, s.k + 1)
  }

  /** Mutable per-call stemming state over a char buffer b[0..k]. */
  private final class State(val b: Array[Char]) {
    /** index of last char of the current word */
    var k: Int = b.length - 1
    /** index of last char of the stem candidate (set by `ends`) */
    private var j: Int = 0

    private def isCons(i: Int): Boolean = b(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y'                         => if (i == 0) true else !isCons(i - 1)
      case _                           => true
    }

    /** Measure: number of VC sequences in b[0..j] (the [C](VC)^m[V] form). */
    private def measure(): Int = {
      var n = 0
      var i = 0
      // skip initial consonants
      while (i <= j && isCons(i)) i += 1
      while (i <= j) {
        // in a vowel run
        while (i <= j && !isCons(i)) i += 1
        if (i > j) return n
        n += 1
        while (i <= j && isCons(i)) i += 1
      }
      n
    }

    private def vowelInStem(): Boolean = {
      var i = 0
      while (i <= j) { if (!isCons(i)) return true; i += 1 }
      false
    }

    /** b[i-1] == b[i] and both consonants. */
    private def doubleC(i: Int): Boolean =
      i >= 1 && b(i) == b(i - 1) && isCons(i)

    /** consonant-vowel-consonant ending at i, final consonant not w/x/y. */
    private def cvc(i: Int): Boolean = {
      if (i < 2 || !isCons(i) || isCons(i - 1) || !isCons(i - 2)) return false
      val ch = b(i)
      ch != 'w' && ch != 'x' && ch != 'y'
    }

    /** true iff b[0..k] ends with s; on match sets j = k - s.length. */
    private def ends(s: String): Boolean = {
      val l = s.length
      if (l > k + 1) return false
      var i = 0
      while (i < l) {
        if (b(k - l + 1 + i) != s.charAt(i)) return false
        i += 1
      }
      j = k - l
      true
    }

    /** overwrite b[j+1..] with s and truncate there. */
    private def setTo(s: String): Unit = {
      var i = 0
      while (i < s.length) { b(j + 1 + i) = s.charAt(i); i += 1 }
      k = j + s.length
    }

    /** conditional replace: only when the stem has measure > 0. */
    private def replaceM0(s: String): Unit =
      if (measure() > 0) setTo(s)

    /** Step 1a (plurals) + 1b (-ed / -ing). */
    def step1ab(): Unit = {
      if (b(k) == 's') {
        if (ends("sses")) k -= 2
        else if (ends("ies")) setTo("i")
        else if (b(k - 1) != 's') k -= 1
      }
      if (ends("eed")) {
        if (measure() > 0) k -= 1
      } else if ((ends("ed") || ends("ing")) && vowelInStem()) {
        k = j
        if (ends("at")) setTo("ate")
        else if (ends("bl")) setTo("ble")
        else if (ends("iz")) setTo("ize")
        else if (doubleC(k)) {
          k -= 1
          val ch = b(k)
          if (ch == 'l' || ch == 's' || ch == 'z') k += 1
        } else if (measure() == 1 && cvc(k)) setTo("e")
      }
    }

    /** Step 1c: terminal y -> i when the stem contains a vowel. */
    def step1c(): Unit =
      if (ends("y") && vowelInStem()) b(k) = 'i'

    /** Step 2: map double suffixes to single ones (measure > 0). */
    def step2(): Unit = {
      if (k == 0) return // guard: published "Bug 1" fix
      b(k - 1) match {
        case 'a' =>
          if (ends("ational")) replaceM0("ate")
          else if (ends("tional")) replaceM0("tion")
        case 'c' =>
          if (ends("enci")) replaceM0("ence")
          else if (ends("anci")) replaceM0("ance")
        case 'e' =>
          if (ends("izer")) replaceM0("ize")
        case 'l' =>
          if (ends("bli")) replaceM0("ble") // departure (published: abli->able)
          else if (ends("alli")) replaceM0("al")
          else if (ends("entli")) replaceM0("ent")
          else if (ends("eli")) replaceM0("e")
          else if (ends("ousli")) replaceM0("ous")
        case 'o' =>
          if (ends("ization")) replaceM0("ize")
          else if (ends("ation")) replaceM0("ate")
          else if (ends("ator")) replaceM0("ate")
        case 's' =>
          if (ends("alism")) replaceM0("al")
          else if (ends("iveness")) replaceM0("ive")
          else if (ends("fulness")) replaceM0("ful")
          else if (ends("ousness")) replaceM0("ous")
        case 't' =>
          if (ends("aliti")) replaceM0("al")
          else if (ends("iviti")) replaceM0("ive")
          else if (ends("biliti")) replaceM0("ble")
        case 'g' =>
          if (ends("logi")) replaceM0("log") // departure
        case _ => ()
      }
    }

    /** Step 3: -ic-, -full, -ness etc. */
    def step3(): Unit = b(k) match {
      case 'e' =>
        if (ends("icate")) replaceM0("ic")
        else if (ends("ative")) replaceM0("")
        else if (ends("alize")) replaceM0("al")
      case 'i' =>
        if (ends("iciti")) replaceM0("ic")
      case 'l' =>
        if (ends("ical")) replaceM0("ic")
        else if (ends("ful")) replaceM0("")
      case 's' =>
        if (ends("ness")) replaceM0("")
      case _ => ()
    }

    /** Step 4: drop -ant, -ence, etc. when measure > 1. */
    def step4(): Unit = {
      if (k == 0) return
      val matched = b(k - 1) match {
        case 'a' => ends("al")
        case 'c' => ends("ance") || ends("ence")
        case 'e' => ends("er")
        case 'i' => ends("ic")
        case 'l' => ends("able") || ends("ible")
        case 'n' => ends("ant") || ends("ement") || ends("ment") || ends("ent")
        case 'o' =>
          // j >= 0 guard: published "Bug 2" fix
          (ends("ion") && j >= 0 && (b(j) == 's' || b(j) == 't')) || ends("ou")
        case 's' => ends("ism")
        case 't' => ends("ate") || ends("iti")
        case 'u' => ends("ous")
        case 'v' => ends("ive")
        case 'z' => ends("ize")
        case _   => false
      }
      if (matched && measure() > 1) k = j
    }

    /** Step 5: remove final -e and double -ll for measure > 1. */
    def step5(): Unit = {
      j = k
      if (b(k) == 'e') {
        val m = measure()
        if (m > 1 || (m == 1 && !cvc(k - 1))) k -= 1
      }
      if (b(k) == 'l' && doubleC(k) && measure() > 1) k -= 1
    }
  }
}
