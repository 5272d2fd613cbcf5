package graft.functions

import graft.SparkSpec
import graft.functions.{functions => gf}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** RollingWindowHashExpr invariants: the rolled O(1)-per-window
  * recurrence must equal a fresh per-window polynomial recompute
  * (that equality is what makes the q144 probe sound), equal windows
  * must ALWAYS share a hash (the probe's certain direction), and the
  * token-boundary construction must keep ("ab","c") and ("a","bc")
  * apart where delimiter-concat schemes rely on the delimiter.
  */
class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  private val tokArray: Gen[Seq[String]] = for {
    n <- Gen.choose(0, 30)
    xs <- Gen.listOfN(n, Gen.oneOf("a", "b", "ab", "ba", "xyz", "", "é多"))
  } yield xs

  private def hashesOf(arrays: Seq[Seq[String]], len: Int): Seq[Seq[Long]] = {
    val df = arrays.map(Tuple1(_)).toDF("t")
    df.select(gf.rolling_window_hashes(col("t"), len).as("h"))
      .as[Seq[Long]].collect().toSeq
  }

  test("rolled hashes equal a fresh polynomial recompute of every window") {
    val arrays = samples(tokArray, 80)
    for (len <- Seq(1, 2, 3, 7)) {
      val got = hashesOf(arrays, len)
      arrays.zip(got).foreach { case (xs, hs) =>
        assert(hs.length == math.max(0, xs.length - len + 1),
          s"window count for n=${xs.length}, len=$len")
        // independent recompute: each window hashed from scratch via a
        // single-window call (n == len => exactly one un-rolled hash)
        xs.sliding(len).filter(_.length == len).toSeq.zip(hs).foreach {
          case (win, h) =>
            val fresh = hashesOf(Seq(win), len).head
            assert(fresh.length == 1 && fresh.head == h,
              s"rolled hash != fresh hash for window $win of $xs")
        }
      }
    }
  }

  test("equal windows always collide; token boundaries are not ambiguous") {
    // same window content at different positions/documents
    val a = Seq("p", "q", "r", "s", "p", "q", "r")
    val hs = hashesOf(Seq(a), 3).head
    assert(hs(0) == hs(4), "identical windows at offsets 0 and 4 must match")
    // ("ab","c") vs ("a","bc") concatenate identically but must hash apart
    val Seq(h1, h2) = hashesOf(Seq(Seq("ab", "c"), Seq("a", "bc")), 2).map(_.head)
    assert(h1 != h2, "token-boundary ambiguity: (ab,c) collided with (a,bc)")
  }

  test("callable from SQL with a literal len arg") {
    gf.register(spark)
    val r = spark.sql(
      "SELECT rolling_window_hashes(array('a','b','c'), 2) AS h").head()
    assert(r.getSeq[Long](0).length == 2)
  }

  test("null array elements hash as a sentinel (no NPE; null==null, null!=empty)") {
    gf.register(spark)
    val r = spark.sql(
      """SELECT rolling_window_hashes(array('a', CAST(NULL AS STRING), 'a', CAST(NULL AS STRING)), 2) AS h,
        |       rolling_window_hashes(array(CAST(NULL AS STRING)), 1) AS hn,
        |       rolling_window_hashes(array(''), 1) AS he""".stripMargin).head()
    val h = r.getSeq[Long](0)
    assert(h.length == 3 && h(0) == h(2), "equal (tok,null) windows must collide")
    assert(r.getSeq[Long](1).head != r.getSeq[Long](2).head,
      "null sentinel must differ from the empty string's hash")
  }
}
