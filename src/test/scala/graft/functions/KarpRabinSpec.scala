package graft.functions

import graft.SparkSpec
import graft.functions.{functions => gf}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** KarpRabinExpr (q39's fingerprint kernel). Its contract is the
  * DUCKDB TWIN's semantics — RE2's `.` skips ONLY '\n', `ascii` is
  * the full code point — which the kernel must match on every input.
  * The Spark HOF it replaced (`aggregate(regexp_extract_all(text,
  * '.') -> ascii)`) used JAVA regex, whose `.` also excludes \r, NEL
  * (U+0085), LS (U+2028), PS (U+2029): on text containing those, the
  * old fold disagreed with its own oracle. The kernel deliberately
  * sides with the twin; both the equivalence (outside the
  * line-terminator set) and the divergence (on it) are pinned here.
  */
class KarpRabinSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  // mixes 1-, 2-, 3- and 4-byte UTF-8, newlines in every position,
  // and the empty string — but NOT \r/NEL/LS/PS, where old-HOF
  // equivalence deliberately does not hold (see the divergence test)
  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 40)
    cs <- Gen.listOfN(n, Gen.oneOf(
      "a", "Z", "0", " ", "\n", "\n\n", "é", "ß", "多", "語", "😀"))
  } yield cs.mkString

  private def hofFingerprint(texts: Seq[String]): Seq[Long] =
    texts.toDF("text").select(
      aggregate(
        transform(regexp_extract_all(col("text"), lit("."), lit(0)),
          c => ascii(c).cast("bigint")),
        lit(0L),
        (a, b) => (a * 31L + b) % 1000000007L).as("f"))
      .as[Long].collect().toSeq

  private def kernelFingerprint(texts: Seq[String]): Seq[Long] =
    texts.toDF("text")
      .select(gf.karp_rabin_fingerprint(col("text")).as("f"))
      .as[Long].collect().toSeq

  /** The twin's exact semantics, replayed reference-style: code
    * points in order, only '\n' skipped, (h*31 + cp) mod 1e9+7.
    */
  private def re2Fingerprint(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp != '\n') h = (h * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }

  test("kernel == the replaced HOF outside the Java-vs-RE2 line-terminator set") {
    val texts = samples(textGen, 200) ++ Seq(
      "", "\n", "plain ascii only", "ends with newline\n",
      "\nstarts with newline", "mixé 多byte 😀 tail")
    assert(kernelFingerprint(texts) == hofFingerprint(texts))
  }

  test("kernel == RE2/DuckDB semantics on ALL inputs, including \\r/NEL/LS/PS") {
    val texts = samples(textGen, 60) ++ Seq(
      "a\rb", "\r", "a\u0085b", "a\u2028b", "a\u2029b",
      "cr\rlf\n mixed\r\n", "ends\r")
    texts.foreach { t =>
      assert(kernelFingerprint(Seq(t)) == Seq(re2Fingerprint(t)),
        s"kernel != RE2 reference for ${t.map(_.toInt).mkString("[", ",", "]")}")
    }
  }

  test("deliberate divergence from the old HOF: \\r is NOT skipped (it was a latent oracle mismatch)") {
    // Java regex '.' drops the \r, RE2/DuckDB keeps it — the kernel
    // must fold it, so "a\rb" != "ab" under the kernel while the old
    // HOF conflated them (and would have hash-mismatched DuckDB)
    assert(kernelFingerprint(Seq("a\rb")) == Seq((97L * 31 + 13) * 31 % 1000000007L + 98),
      "\\r must be folded like any non-\\n code point")
    assert(kernelFingerprint(Seq("a\rb")) != kernelFingerprint(Seq("ab")))
    assert(hofFingerprint(Seq("a\rb")) == hofFingerprint(Seq("ab")),
      "(documenting the old HOF's Java-regex behavior this kernel left behind)")
  }

  test("known values: empty 0; 'ab' = (97*31+98) mod p; newline skipped") {
    assert(kernelFingerprint(Seq("")) == Seq(0L))
    assert(kernelFingerprint(Seq("ab")) == Seq(97L * 31 + 98))
    assert(kernelFingerprint(Seq("a\nb")) == kernelFingerprint(Seq("ab")),
      "newline must be skipped exactly as RE2's '.' skips it")
  }

  test("malformed UTF-8 with a VALID lead byte never swallows following real characters") {
    import org.apache.spark.unsafe.types.UTF8String
    val p = 1000000007L
    def h(cps: Long*): Long = cps.foldLeft(0L)((a, c) => (a * 31 + c) % p)
    // latin-1 "é" = 0xE9 is a well-formed 3-byte LEAD, but 'a','b' are
    // not 10xxxxxx continuations: the lead must fold as its own 1-byte
    // garbage code point and 'a','b' must survive as themselves
    val latin1 = UTF8String.fromBytes(Array(0xE9, 'a', 'b').map(_.toByte))
    assert(VectorOps.karpRabin(latin1) == h(0xE9, 'a', 'b'))
    // 2-byte lead 0xC3 + ASCII follower
    assert(VectorOps.karpRabin(UTF8String.fromBytes(Array(0xC3, 'x').map(_.toByte)))
      == h(0xC3, 'x'))
    // truncated sequence at end-of-string: lead alone is 1-byte garbage
    assert(VectorOps.karpRabin(UTF8String.fromBytes(Array[Byte](0xE9.toByte)))
      == h(0xE9))
    // valid lead + one valid continuation + truncation: lead garbage,
    // the continuation re-enters as its own stray-continuation garbage
    assert(VectorOps.karpRabin(UTF8String.fromBytes(Array(0xE9, 0xA0).map(_.toByte)))
      == h(0xE9, 0xA0))
    // well-formed text is untouched: "é" proper (0xC3 0xA9) decodes as U+00E9
    assert(VectorOps.karpRabin(UTF8String.fromString("éab")) == h(0xE9, 'a', 'b'))
  }

  test("callable from SQL") {
    gf.register(spark)
    val r = spark.sql("SELECT karp_rabin_fingerprint('ab') AS f").head()
    assert(r.getLong(0) == 97L * 31 + 98)
  }
}
