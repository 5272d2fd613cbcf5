package graft.functions

import graft.SparkSpec
import graft.functions.{functions => gf}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** KarpRabinExpr (q39's fingerprint kernel) must equal the
  * formulation it replaced — Spark's own
  * `aggregate(regexp_extract_all(text, '.') -> ascii, ...)` fold —
  * character for character, because the DuckDB twin still runs that
  * formulation. The interesting disagreements live at newlines (both
  * regex engines' `.` skips them) and multi-byte code points (the
  * kernel decodes UTF-8 itself; `ascii` is the full code point, not
  * the first byte).
  */
class KarpRabinSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  // mixes 1-, 2-, 3- and 4-byte UTF-8, newlines in every position,
  // and the empty string
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

  test("kernel == the regexp_extract_all + aggregate fold it replaced") {
    val texts = samples(textGen, 200) ++ Seq(
      "", "\n", "plain ascii only", "ends with newline\n",
      "\nstarts with newline", "mixé 多byte 😀 tail")
    assert(kernelFingerprint(texts) == hofFingerprint(texts))
  }

  test("known values: empty 0; 'ab' = (97*31+98) mod p; newline skipped") {
    assert(kernelFingerprint(Seq("")) == Seq(0L))
    assert(kernelFingerprint(Seq("ab")) == Seq(97L * 31 + 98))
    assert(kernelFingerprint(Seq("a\nb")) == kernelFingerprint(Seq("ab")),
      "newline must be skipped exactly as RE2's '.' skips it")
  }

  test("callable from SQL") {
    gf.register(spark)
    val r = spark.sql("SELECT karp_rabin_fingerprint('ab') AS f").head()
    assert(r.getLong(0) == 97L * 31 + 98)
  }
}
