package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property-based invariants over randomized inputs (SURVEY.md §5.3):
  * presence-vector shape, fast/reference aggregate equivalence,
  * cosine kernel bounds, nearest-center argmin correctness vs a plain
  * Scala reimplementation, and clustering partition totality.
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  private val posting: Gen[(Long, String)] = for {
    doc <- Gen.choose(0L, 9L)
    term <- Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon")
  } yield (doc, term)

  test("property: presence vectors have width N, values in {0,1}, and row-sum = df") {
    val tokens = samples(posting, 300).toDF("doc_id", "term")
    val n = 10
    val m = graft.index.InvertedIndex.termDocMatrix(tokens, n)
      .as[(String, Seq[Int])].collect()
    assert(m.nonEmpty)
    m.foreach { case (term, vec) =>
      assert(vec.length == n, term)
      assert(vec.forall(v => v == 0 || v == 1), term)
    }
    val df = tokens.distinct().groupBy("term").count()
      .as[(String, Long)].collect().toMap
    m.foreach { case (term, vec) => assert(vec.sum.toLong == df(term), term) }
  }

  test("property: BitSet fast path is equivalent to the built-in presence matrix") {
    val tokens = samples(posting, 300).toDF("doc_id", "term")
    val a = graft.index.InvertedIndex.termDocMatrix(tokens, 10)
      .as[(String, Seq[Int])].collect().toMap
    val b = graft.index.InvertedIndex.termDocMatrixFast(tokens, 10)
      .as[(String, Seq[Int])].collect().toMap
    assert(a == b)
  }

  private val vec: Gen[Seq[Double]] = for {
    n <- Gen.const(6)
    xs <- Gen.listOfN(n, Gen.choose(-5.0, 5.0))
  } yield xs

  test("property: cosine similarity in [-1,1]; d(v,v)=0 for nonzero v; scale-invariant") {
    import graft.functions.functions.{cosine_distance, cosine_similarity}
    val pairs = samples(vec, 60).zip(samples(vec, 60))
      .filter { case (a, b) => a.exists(_ != 0.0) && b.exists(_ != 0.0) }
    val df = pairs.toDF("a", "b")
    val rows = df.select(
      cosine_similarity(col("a"), col("b")).as("s"),
      cosine_distance(col("a"), col("a")).as("dself"),
      cosine_similarity(transform(col("a"), _ * 3.0), col("b")).as("s3"))
      .as[(Double, Double, Double)].collect()
    rows.foreach { case (s, dself, s3) =>
      assert(s >= -1.0000001 && s <= 1.0000001)
      assert(math.abs(dself) < 1e-12)
      assert(math.abs(s - s3) < 1e-9) // scale invariance
    }
  }

  test("property: nearestCenter matches a plain Scala argmin with the same tie-break") {
    val centers = samples(vec, 5).map(_.toArray).toArray
    val points = samples(vec, 80).filter(_.exists(_ != 0.0))
    def cos(a: Seq[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (na * nb)
    }
    val out = graft.cluster.KMeansAssign.assignMap(
      points.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "vec"),
      centers)
      .select("id", "center_id").as[(Long, Int)].collect().toMap
    points.zipWithIndex.foreach { case (p, i) =>
      val dists = centers.map(c => 1.0 - cos(p, c))
      val expected = dists.indices.minBy(j => (dists(j), j))
      assert(out(i.toLong) == expected, s"point $i: $dists")
    }
  }

  test("property: clustering is a partition — every point in exactly one cluster") {
    val centers = samples(vec, 4).map(_.toArray).toArray
    val pts = samples(vec, 50).filter(_.exists(_ != 0.0))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "vec")
    val assigned = graft.cluster.KMeansAssign.assignMap(pts, centers)
    val clusters = graft.cluster.KMeansAssign.clusters(assigned)
      .select(explode(col("members")).as("m")).as[Long].collect()
    assert(clusters.length == clusters.distinct.length) // no point twice
    assert(clusters.toSet == assigned.select("id").as[Long].collect().toSet)
  }

  test("property: signBucket expression matches a plain Scala fold; scale-invariant; bounded") {
    val dim = 8
    val nPlanes = 6
    val planes = Array.tabulate(nPlanes, dim)((p, d) =>
      (graft.functions.VectorOps.mix64(p.toLong * 977L + d) >>> 11).toDouble
        / (1L << 53).toDouble * 2.0 - 1.0)
    val vecGen: Gen[Seq[Double]] =
      Gen.listOfN(dim, Gen.choose(-5.0, 5.0)).map(_.toSeq)
    val vecs = samples(vecGen, 60).zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val df = vecs.toDF("id", "v")
    val got = df.select(col("id"),
        graft.functions.functions.sign_bucket(col("v"), planes).as("b"))
      .as[(Long, Int)].collect().toMap
    def ref(v: Seq[Double]): Int =
      planes.zipWithIndex.foldLeft(0) { case (sig, (pl, p)) =>
        val dot = pl.zip(v).map { case (a, b) => a * b }.sum
        if (dot >= 0) sig | (1 << p) else sig
      }
    vecs.foreach { case (id, v) =>
      assert(got(id) == ref(v), s"id=$id")
      assert(got(id) >= 0 && got(id) < (1 << nPlanes))
    }
    // positive scaling never changes a sign pattern (cosine-LSH core)
    val scaled = vecs.map { case (id, v) => (id, v.map(_ * 7.5)) }.toDF("id", "v")
      .select(col("id"),
        graft.functions.functions.sign_bucket(col("v"), planes).as("b"))
      .as[(Long, Int)].collect().toMap
    assert(scaled == got)
  }

  test("property: spanDedup is idempotent and its survivors are globally unique") {
    // small vocabulary forces heavy cross-doc chunk collisions
    val docGen: Gen[String] = for {
      len <- Gen.choose(0, 40)
      ws <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d"))
    } yield ws.mkString(" ")
    val docs = samples(docGen, 80).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val once = graft.ops.CurationOps.spanDedup(docs)
    val rows = once.collect()
    // partition: kept + removed == total, and dedup actually fires on
    // a 4-word vocabulary
    rows.foreach(r => assert(r.getLong(1) >= r.getLong(2)))
    assert(rows.map(_.getLong(2)).sum > 0, "no dups removed on a 4-word vocab")
    // survivors globally unique at full-chunk granularity
    val full = rows.flatMap(_.getString(3).split(" ").filter(_.nonEmpty)
      .grouped(3).map(_.mkString(" "))).filter(_.split(" ").length == 3)
    assert(full.length == full.distinct.length)
    // idempotence: a second pass over the cleaned text removes nothing
    val again = graft.ops.CurationOps.spanDedup(
      once.select(col("doc_id"), col("clean_text").as("text"))
        .filter(length(col("text")) > 0))
    assert(again.collect().forall(_.getLong(2) == 0L),
      "second span-dedup pass removed chunks — not idempotent")
  }

  private val tokArray: Gen[Seq[String]] = for {
    n <- Gen.choose(1, 40)
    xs <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "dd", "e"))
  } yield xs

  test("property: sorted-run folds match plain-Scala counting (q86 top-token, q147 Simpson)") {
    val arrays = samples(tokArray, 120)
    val df = arrays.map(Tuple1(_)).toDF("t")
    val got = df.select(
      graft.ops.TextAnalytics.topTokenCount(col("t")).as("top"),
      graft.ops.TextAnalytics.sumSqRunLengths(col("t")).as("ss"))
      .as[(Int, Long)].collect()
    arrays.zip(got).foreach { case (xs, (top, ss)) =>
      val counts = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(top.toLong == counts.values.max,
        s"topTokenCount mismatch on $xs")
      assert(ss == counts.values.map(c => c * c).sum,
        s"sumSqRunLengths mismatch on $xs")
    }
  }
}
