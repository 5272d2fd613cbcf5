package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Primitive-typed vector kernels shared by the interpreted and
  * codegen paths of the custom Catalyst expressions. Operating on
  * `ArrayData` directly (getDouble/getFloat) avoids per-element boxing,
  * which is what makes the custom expressions beat the equivalent
  * higher-order-function (`aggregate`/`zip_with`) formulation in the
  * hot loops of similarity search at scale.
  */
object VectorOps {

  /** Cosine similarity between two double vectors.
    * Formula pinned as dot / (sqrt(na) * sqrt(nb)) — the same literal
    * formula used in the DuckDB oracle SQL so both engines produce
    * bit-identical doubles on identical inputs.
    * Returns 0.0 when either norm is zero (degenerate vector).
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Cosine distance = 1 - cosine similarity. The reference computes
    * this (intendedly) at ProcessData.java:567-576; its `^`-as-power
    * bug is fixed here per SURVEY.md §7 D2.
    */
  def cosineDistance(a: ArrayData, b: ArrayData): Double =
    1.0 - cosine(a, b)

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  def norm(a: ArrayData): Double = {
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val x = a.getDouble(i); s += x * x; i += 1 }
    math.sqrt(s)
  }

  /** 64-bit SimHash over an array of term-id longs: bit b of the hash is
    * set when the sum over terms of +/-1 (bit b of mix(term)) is positive.
    * Null elements mix a fixed sentinel (rollingWindowHashes' policy:
    * SQL-registered, so null elements are legal) — ArrayData.getLong
    * would otherwise silently unbox them to 0L and cast a real term-id
    * 0's full vote, skewing the fingerprint invisibly.
    */
  def simhash64(termIds: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = termIds.numElements()
    var i = 0
    while (i < n) {
      val h = if (termIds.isNullAt(i)) mix64(0x517cc1b727220a95L)
        else mix64(termIds.getLong(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** MinHash signature over an array of strings (shingles): each
    * element is xxhash64'd once; the j-th permutation is the splitmix64
    * mix of (h ^ mix64(j+1)) — one byte pass per element + nHashes
    * cheap mixes, all inside one compiled kernel.
    */
  /** The per-slot permutation constants mix64(j+1) — hoisted out of
    * the per-element loop: recomputing them inside cost n·nHashes
    * redundant mixes per row in the map-side dedup hot path.
    */
  private def permConsts(nHashes: Int): Array[Long] = {
    val p = new Array[Long](nHashes)
    var j = 0
    while (j < nHashes) { p(j) = mix64(j + 1L); j += 1 }
    p
  }

  def minhashSig(arr: ArrayData, nHashes: Int): ArrayData = {
    val out = new Array[Long](nHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    val perm = permConsts(nHashes)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      // null elements are legal (SQL-registered) — hash a fixed
      // sentinel like rollingWindowHashes instead of NPE'ing
      val h = if (s == null) mix64(FnvOffset ^ 0x517cc1b727220a95L)
        else org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      var j = 0
      while (j < nHashes) {
        val hj = mix64(h ^ perm(j))
        if (hj < out(j)) out(j) = hj
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Fused tokenize -> word-shingle -> MinHash kernel over a raw text
    * value: whitespace tokens, k-word shingles, each hashed once,
    * permutations by bit mixing. One compiled pass per document, no
    * intermediate arrays materialized in the row format.
    */
  def shingleMinhashSig(text: org.apache.spark.unsafe.types.UTF8String,
                        nHashes: Int, k: Int): ArrayData = {
    val out = new Array[Long](nHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    val toks = text.toString.split("\\s+")
    var nTok = 0
    var t = 0
    while (t < toks.length) { if (toks(t).nonEmpty) { toks(nTok) = toks(t); nTok += 1 }; t += 1 }
    if (nTok > 0) {
      val m = math.max(nTok - k + 1, 1)
      val perm = permConsts(nHashes)
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i < m) {
        sb.setLength(0)
        var w = i
        val end = math.min(i + k, nTok)
        while (w < end) {
          if (w > i) sb.append(' ')
          sb.append(toks(w))
          w += 1
        }
        val bytes = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
        var j = 0
        while (j < nHashes) {
          val hj = mix64(h ^ perm(j))
          if (hj < out(j)) out(j) = hj
          j += 1
        }
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Fused text -> CODEPOINT n-gram -> MinHash kernel: the char-level
    * twin of [[shingleMinhashSig]] for space-free scripts (CJK, Thai),
    * where whitespace tokenization degenerates every document to one
    * token and the word-shingle dedup gates go blind. One UTF-8 scan
    * records each code point's byte offset; every n-codepoint window
    * is hashed ZERO-COPY off the UTF8String's own bytes (no substring
    * materialization, no intermediate array), permutations by the same
    * bit mixing as every other MinHash kernel here — so the output
    * feeds the unchanged band/verify chain (Dedup.bandsFromSignatures)
    * interchangeably with the word kernel's.
    *
    * Same min-1-window contract as the word kernel: a doc shorter
    * than n code points yields ONE gram (the whole doc); empty text
    * yields the all-MaxValue signature (= MinHash of the empty set),
    * exactly [[minhashSig]] over the empty gram array. Gram identity
    * matches the Column formulation (substr over codepoint indexes):
    * same bytes, same XXH64 seed 42 — spec-pinned equal to
    * minhash_sig(char_shingles(text)) in CharShingleSpec. Malformed
    * UTF-8 follows the karpRabin contract: an invalid lead byte
    * advances one byte and never swallows following characters.
    */
  def charShingleMinhashSig(text: org.apache.spark.unsafe.types.UTF8String,
                            nHashes: Int, n: Int): ArrayData = {
    val out = new Array[Long](nHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    val nb = text.numBytes
    if (nb > 0) {
      // byte offset of each code point + terminal, one pass; sized to
      // the byte count (>= the code point count)
      val offs = new Array[Int](nb + 1)
      var cp = 0
      var i = 0
      while (i < nb) {
        offs(cp) = i
        i += org.apache.spark.unsafe.types.UTF8String
          .numBytesForFirstByte(text.getByte(i))
        cp += 1
      }
      offs(cp) = nb
      val m = math.max(cp - n + 1, 1)
      val perm = permConsts(nHashes)
      val base = text.getBaseObject
      val baseOff = text.getBaseOffset
      var s = 0
      while (s < m) {
        val e = math.min(s + n, cp)
        val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          base, baseOff + offs(s), offs(e) - offs(s), 42L)
        var j = 0
        while (j < nHashes) {
          val hj = mix64(h ^ perm(j))
          if (hj < out(j)) out(j) = hj
          j += 1
        }
        s += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Karp-Rabin document fingerprint (q39): fold (h*31 + codepoint)
    * mod 1e9+7 over the text's code points, SKIPPING '\n' — the exact
    * value of the q39 DuckDB twin's
    * `list_reduce(regexp_extract_all(text, '.') -> ascii)` (RE2's `.`
    * matches every character except newline; `ascii` is the code
    * point). Decodes UTF-8 straight off the UTF8String bytes: one
    * compiled pass, no per-character string array — the interpreted
    * `aggregate` HOF formulation this replaces materialized a
    * doc-length array of single-char strings per row.
    *
    * DELIBERATE line-terminator divergence from the replaced Spark
    * HOF: Java's regex `.` also excludes \r, NEL (U+0085), LS
    * (U+2028), and PS (U+2029), which RE2/DuckDB does NOT — so on
    * text containing those, the OLD Spark fold disagreed with its own
    * oracle (a latent hash mismatch waiting for a \r in the fixture).
    * This kernel sides with the twin: only '\n' is skipped; a "a\rb"
    * doc now folds (97,13,98). Spec-pinned both ways
    * (KarpRabinSpec).
    *
    * Malformed UTF-8 (Spark never validates; latin-1 ingest can
    * produce it) is folded garbage-in-garbage-out but SAFELY: a byte
    * that is not the start of a complete, well-formed sequence — an
    * invalid lead byte, a stray continuation byte, OR a valid lead
    * whose following bytes are not 10xxxxxx continuations (latin-1
    * 0xE9 "é" followed by ASCII) — decodes as its own 1-byte code
    * point and never swallows the following real characters.
    *
    * Overflow-free: h < 1e9+7 and code points < 0x110000, so
    * h*31 + cp < 2^35.
    */
  def karpRabin(text: org.apache.spark.unsafe.types.UTF8String): Long = {
    val n = text.numBytes
    var i = 0
    var h = 0L
    while (i < n) {
      val b0 = text.getByte(i) & 0xFF
      var cp = 0
      var len = 1
      if (b0 < 0x80) cp = b0
      else if ((b0 & 0xE0) == 0xC0) { cp = b0 & 0x1F; len = 2 }
      else if ((b0 & 0xF0) == 0xE0) { cp = b0 & 0x0F; len = 3 }
      else if ((b0 & 0xF8) == 0xF0) { cp = b0 & 0x07; len = 4 }
      else cp = b0 // invalid lead/continuation byte: 1-byte garbage,
                   // never swallows the following characters
      var j = 1
      while (j < len && i + j < n &&
             (text.getByte(i + j) & 0xC0) == 0x80) {
        cp = (cp << 6) | (text.getByte(i + j) & 0x3F)
        j += 1
      }
      if (j < len) { cp = b0; len = 1 } // truncated / non-continuation
                   // follower: the lead is 1-byte garbage on its own
                   // and every following byte re-enters the decoder
      if (cp != '\n') h = (h * 31L + cp) % 1000000007L
      i += len
    }
    h
  }

  /** Nearest of `centers` (K rows x dim) to `v` by cosine distance;
    * returns a (center_id INT, dist DOUBLE) InternalRow. Deterministic
    * tie-break on the lower center index (strict `<`), matching the
    * `min(struct(dist, center_id))` argmin in KMeansAssign.assign.
    * Callers guarantee a non-empty, dimension-consistent center set
    * (NearestCenterExpr validates at construction); a point vector
    * shorter/longer than the centers scores over the common prefix
    * (documented truncation — row-local junk must not kill the scan).
    */
  def nearestCenter(v: ArrayData,
                    centers: Array[Array[Double]]): org.apache.spark.sql.catalyst.InternalRow = {
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < centers.length) {
      val ctr = centers(c)
      val n = math.min(v.numElements(), ctr.length)
      var dot = 0.0
      var na = 0.0
      var nb = 0.0
      var i = 0
      while (i < n) {
        val x = v.getDouble(i)
        val y = ctr(i)
        dot += x * y
        na += x * x
        nb += y * y
        i += 1
      }
      val sim = if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
      val d = 1.0 - sim
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](best, bestD))
  }

  /** Sign-random-projection bucket of `v` against `planes` (nPlanes x
    * dim): bit p of the result is set when dot(planes(p), v) >= 0.
    * The sign-LSH hashing kernel shared by the interpreted and codegen
    * paths of [[SignBucketExpr]]. Dimensions beyond min(|v|, dim) are
    * ignored (callers validate dims; see SignBucketExpr).
    */
  def signBucket(v: ArrayData, planes: Array[Array[Double]]): Int = {
    var sig = 0
    var p = 0
    while (p < planes.length) {
      val pl = planes(p)
      val n = math.min(pl.length, v.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { s += pl(i) * v.getDouble(i); i += 1 }
      if (s >= 0) sig |= (1 << p)
      p += 1
    }
    sig
  }

  /** Real-valued random projection of `v` against `planes` (m x dim):
    * component p is dot(planes(p), v) folded in index order over the
    * common prefix — the JL sketch whose SIGN BIT [[signBucket]]
    * keeps. Shared by the interpreted and codegen paths of
    * [[JlProjectExpr]]; dimensions beyond min(|v|, dim) are ignored
    * (signBucket's convention).
    */
  def jlProject(v: ArrayData, planes: Array[Array[Double]]): ArrayData = {
    val out = new Array[Any](planes.length)
    var p = 0
    while (p < planes.length) {
      val pl = planes(p)
      val n = math.min(pl.length, v.numElements())
      var s = 0.0
      var i = 0
      while (i < n) { s += pl(i) * v.getDouble(i); i += 1 }
      out(p) = s
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** splitmix64 finalizer — public-domain bit mixer. */
  def mix64(v: Long): Long = {
    var z = v + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Unit-L2-normalized copy of `v` (zero vector passes through
    * unchanged — it has no direction and downstream dot products
    * correctly score it 0).
    */
  def unitNormalize(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val out = new Array[Double](n)
    var s = 0.0
    var i = 0
    while (i < n) { val x = v.getDouble(i); out(i) = x; s += x * x; i += 1 }
    if (s > 0.0) {
      val inv = 1.0 / math.sqrt(s)
      i = 0
      while (i < n) { out(i) *= inv; i += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Product-quantization encode: split `v` into `codebooks.length`
    * contiguous subspaces and return, per subspace, the index of the
    * L2-nearest codeword — the m-byte sketch that stands in for the
    * full vector during ADC candidate scoring. Subspace j covers
    * dimensions [j*subDim, (j+1)*subDim); a vector shorter than the
    * codebook layout scores missing dimensions as 0 (row-local junk
    * must not kill the scan).
    */
  def pqEncode(v: ArrayData, codebooks: Array[Array[Array[Double]]]): ArrayData = {
    val m = codebooks.length
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cb = codebooks(j)
      val subDim = cb(0).length
      val off = j * subDim
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < cb.length) {
        val w = cb(c)
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val x = if (off + i < v.numElements()) v.getDouble(off + i) else 0.0
          val diff = x - w(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  /** Per-query ADC lookup table: lut(j*ksub + c) = dot(q_sub_j,
    * codeword_{j,c}). Computed ONCE per query (m*ksub*subDim mults);
    * every candidate afterwards costs only m array lookups
    * ([[pqAdcDot]]) — the asymmetric-distance-computation split that
    * makes PQ scanning cheap (Jegou et al., TPAMI'11).
    */
  def pqLut(q: ArrayData, codebooks: Array[Array[Array[Double]]]): ArrayData = {
    val m = codebooks.length
    val ksub = codebooks(0).length
    val out = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      val cb = codebooks(j)
      val subDim = cb(0).length
      val off = j * subDim
      var c = 0
      while (c < ksub) {
        val w = cb(c)
        var s = 0.0
        var i = 0
        while (i < subDim) {
          val x = if (off + i < q.numElements()) q.getDouble(off + i) else 0.0
          s += x * w(i)
          i += 1
        }
        out(j * ksub + c) = s
        c += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** ADC approximate dot product: sum over subspaces of the LUT entry
    * the candidate's code selects. `ksub` = codewords per subspace
    * (the LUT stride).
    */
  def pqAdcDot(lut: ArrayData, codes: ArrayData, ksub: Int): Double = {
    val m = codes.numElements()
    // a ksub that disagrees with the LUT layout would silently read the
    // wrong slot — and on UnsafeArrayData an out-of-range index reads
    // arbitrary memory rather than throwing. Fail loudly instead.
    require(ksub > 0 && m.toLong * ksub == lut.numElements(),
      s"pq_adc_dot: ksub=$ksub inconsistent with m=$m codes " +
        s"and lut of ${lut.numElements()} entries")
    var s = 0.0
    var j = 0
    while (j < m) {
      val c = codes.getInt(j)
      require(c >= 0 && c < ksub, s"pq_adc_dot: code $c out of [0,$ksub)")
      s += lut.getDouble(j * ksub + c)
      j += 1
    }
    s
  }

  /** One BPE merge step over a symbol array: every adjacent (a, b)
    * becomes the single symbol a+b, left to right, non-overlapping —
    * the per-word-type kernel of [[graft.ops.Bpe.train]]'s iteration.
    */
  def mergePair(s: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val n = s.numElements()
    val out = new Array[Any](n)
    var w = 0
    var i = 0
    while (i < n) {
      val cur = s.getUTF8String(i)
      // null elements (legal in SQL arrays) match no pattern and copy
      // through — cur.equals(a) would NPE; a/b are non-null by
      // construction (they come from learned merges)
      if (cur != null && i + 1 < n && cur.equals(a) &&
          b.equals(s.getUTF8String(i + 1))) {
        out(w) = UTF8String.concat(a, b)
        i += 2
      } else {
        out(w) = cur
        i += 1
      }
      w += 1
    }
    val trimmed = if (w == out.length) out else {
      val t = new Array[Any](w); System.arraycopy(out, 0, t, 0, w); t
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(trimmed)
  }

  /** Greedy BPE segmentation of one word against a trained merge
    * ranking ("a b" -> rank): start from characters + the "</w>"
    * end-of-word marker, repeatedly merge the best-ranked adjacent
    * pair until none applies — the standard inference loop (Sennrich
    * et al., ACL'16). Words are short; the quadratic-in-|word| driver
    * loop is row-local and allocation-light.
    */
  def bpeSegment(word: UTF8String,
                 ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val w = word.toString
    var syms = new java.util.ArrayList[String](w.length + 1)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val len = Character.charCount(cp)
      syms.add(w.substring(i, i + len))
      i += len
    }
    syms.add("</w>")
    var done = false
    while (!done && syms.size > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var j = 0
      while (j < syms.size - 1) {
        val r = ranks.get(syms.get(j) + " " + syms.get(j + 1))
        if (r != null && r < bestRank) { bestRank = r; bestAt = j }
        j += 1
      }
      if (bestAt < 0) done = true
      else {
        val merged = syms.get(bestAt) + syms.get(bestAt + 1)
        val next = new java.util.ArrayList[String](syms.size - 1)
        var k = 0
        while (k < syms.size) {
          if (k == bestAt) { next.add(merged); k += 2 }
          else { next.add(syms.get(k)); k += 1 }
        }
        syms = next
      }
    }
    val out = new Array[Any](syms.size)
    var k = 0
    while (k < syms.size) { out(k) = UTF8String.fromString(syms.get(k)); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  /** 64-bit hash of one token's UTF-8 bytes (FNV-1a + the shared
    * splitmix64 finalizer, which decorrelates the FNV values before
    * the polynomial combine).
    */
  private def tokenHash(s: UTF8String): Long = {
    val n = s.numBytes()
    var h = FnvOffset
    var i = 0
    while (i < n) {
      h ^= (s.getByte(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    mix64(h)
  }

  /** All `len`-token-window rolling hashes of a string array:
    * out(i) = polynomial hash (mod 2^64) of token hashes [i, i+len),
    * i in [0, n-len]. Total cost O(total token bytes + n) — each token
    * is hashed ONCE and windows roll in O(1), vs the O(n·len)
    * slice+concat+xxhash64 formulation (per-window concatenation
    * re-reads len tokens). The polynomial runs over per-token 64-bit
    * hashes, so there is no concat-boundary ambiguity (("ab","c") vs
    * ("a","bc") hash differently by construction, which a
    * delimiter-joined concat only gets by trusting the delimiter to
    * never occur in a token). Equal windows ALWAYS collide (the probe
    * use-case needs that direction to be certain); unequal windows
    * collide with ~2^-64 probability — callers that need exactness
    * verify candidates on raw strings (q144's walk-down).
    */
  def rollingWindowHashes(arr: ArrayData, len: Int): ArrayData = {
    val n = arr.numElements()
    if (len <= 0 || n < len)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.emptyLongArray)
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      // null elements are legal in ARRAY<STRING> (containsNull) and
      // the function is SQL-registered: hash them as a fixed sentinel
      // (distinct from the empty string's FNV state) so null == null
      // windows still collide and nothing NPEs
      th(i) = if (s == null) mix64(FnvOffset ^ 0x517cc1b727220a95L)
        else tokenHash(s)
      i += 1
    }
    // B^(len-1) mod 2^64 for the roll-off term
    var bp = 1L
    var k = 1
    while (k < len) { bp *= FnvPrime; k += 1 }
    val out = new Array[Long](n - len + 1)
    var h = 0L
    i = 0
    while (i < len) { h = h * FnvPrime + th(i); i += 1 }
    out(0) = h
    i = len
    while (i < n) {
      h = (h - th(i - len) * bp) * FnvPrime + th(i)
      out(i - len + 1) = h
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Longest run of consecutive stride-`len` block equalities in a
    * token array: the max r such that positions i, i+len, ...,
    * i+(r-1)*len all satisfy block(i) == block(i+len) element-wise —
    * i.e. some len-token block appears r+1 times back-to-back. Runs
    * are tracked per residue class mod len (stride-len chains cannot
    * cross classes). Returns the run count r (0 when n < 2*len); the
    * caller's repetition count is 1 + r. Null elements compare EQUAL
    * to null and UNEQUAL to any value — Spark's structural array
    * equality (`array(null) === array(null)` is TRUE), so the kernel
    * matches the interpreted `slice === slice` fold on EVERY array,
    * null elements included (unreachable via toks, but the
    * kernel==reference spec pin holds unconditionally). O(len * n),
    * one pass, no allocation beyond the len-int run table.
    */
  def maxRepeatRun(arr: ArrayData, len: Int): Int = {
    val n = arr.numElements()
    val m = n - 2 * len // last position with a stride-len successor
    if (len <= 0 || m < 0) return 0
    val runs = new Array[Int](len)
    var best = 0
    var i = 0
    while (i <= m) {
      var eq = true
      var j = 0
      while (eq && j < len) {
        val aNull = arr.isNullAt(i + j)
        val bNull = arr.isNullAt(i + len + j)
        eq = if (aNull || bNull) aNull && bNull
          else arr.getUTF8String(i + j).equals(arr.getUTF8String(i + len + j))
        j += 1
      }
      val cls = i % len
      val r = if (eq) runs(cls) + 1 else 0
      runs(cls) = r
      if (r > best) best = r
      i += 1
    }
    best
  }
}
