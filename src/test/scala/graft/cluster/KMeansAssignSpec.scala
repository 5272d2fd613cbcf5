package graft.cluster

import graft.SparkSpec
import graft.functions.functions.{cosine_distance, cosine_similarity}
import org.apache.spark.sql.functions._

class KMeansAssignSpec extends SparkSpec {
  import spark.implicits._

  test("cosine distance: d(v,v)=0, orthogonal=1, opposite=2") {
    val df = Seq(
      (Seq(1.0, 0.0), Seq(1.0, 0.0)),
      (Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (Seq(1.0, 0.0), Seq(-1.0, 0.0))).toDF("a", "b")
    val d = df.select(cosine_distance(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(d(0)) < 1e-12)
    assert(math.abs(d(1) - 1.0) < 1e-12)
    assert(math.abs(d(2) - 2.0) < 1e-12)
  }

  test("cosine similarity is scale-invariant") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(10.0, 20.0, 30.0))).toDF("a", "b")
    val s = df.select(cosine_similarity(col("a"), col("b"))).as[Double].head()
    assert(math.abs(s - 1.0) < 1e-12)
  }

  test("assign: true argmin with deterministic tie-break (fixes reference D1)") {
    val points = Seq(
      (1L, Seq(1.0, 0.0)),   // exactly center 0
      (2L, Seq(0.0, 2.0)),   // exactly center 1 (scaled)
      (3L, Seq(1.0, 1.0))).toDF("id", "vec") // equidistant -> lower center id
    val centers = Seq(
      (0, Seq(1.0, 0.0)),
      (1, Seq(0.0, 1.0))).toDF("center_id", "cvec")
    val a = KMeansAssign.assign(points, centers)
      .select("id", "center_id").as[(Long, Int)].collect().toMap
    assert(a == Map(1L -> 0, 2L -> 1, 3L -> 0))
  }

  test("clusters: members sorted, sequential ids in center order") {
    val assigns = Seq(
      (5L, 7), (3L, 7), (9L, 2)).toDF("id", "center_id")
    val c = KMeansAssign.clusters(assigns)
      .select("cluster_id", "center_id", "size", "members")
      .as[(Int, Int, Long, Seq[Long])].collect().sortBy(_._1)
    assert(c(0) == ((1, 2, 1L, Seq(9L))))
    assert(c(1) == ((2, 7, 2L, Seq(3L, 5L))))
  }

  test("every point assigned exactly once; union of clusters == points") {
    val points = (1L to 50L).map(i => (i, Seq(math.cos(i.toDouble), math.sin(i.toDouble)))).toDF("id", "vec")
    val centers = Seq((0, Seq(1.0, 0.0)), (1, Seq(-1.0, 0.0)), (2, Seq(0.0, 1.0))).toDF("center_id", "cvec")
    val a = KMeansAssign.assign(points, centers)
    assert(a.count() == 50)
    assert(a.select("id").distinct().count() == 50)
    val members = KMeansAssign.clusters(a)
      .select(explode(col("members"))).as[Long].collect().toSet
    assert(members == (1L to 50L).toSet)
  }

  test("lloydConverge stops early on a converged input with unchanged assignment") {
    // Two exact point masses whose first-k init IS the fixed point:
    // the first update step measures zero centroid shift, so the loop
    // must stop after 1 step no matter how large maxIter is.
    val pts = (Seq.tabulate(10)(i => (i.toLong * 2, Seq(1.0, 0.0))) ++
      Seq.tabulate(10)(i => (i.toLong * 2 + 1, Seq(0.0, 1.0)))).toDF("id", "vec")
    val (centers, steps) = KMeansAssign.lloydConverge(pts, k = 2, maxIter = 50)
    assert(steps == 1, s"converged input ran $steps update steps")
    assert(centers(0).toSeq == Seq(1.0, 0.0) && centers(1).toSeq == Seq(0.0, 1.0))
    // and the early stop changes nothing vs running more iterations
    val more = KMeansAssign.lloydCenters(pts, k = 2, iters = 5)
    assert(centers.map(_.toSeq).toSeq == more.map(_.toSeq).toSeq)
    val a1 = KMeansAssign.assignMap(pts, centers).select("id", "center_id")
      .as[(Long, Int)].collect().toMap
    val a2 = KMeansAssign.assignMap(pts, more).select("id", "center_id")
      .as[(Long, Int)].collect().toMap
    assert(a1 == a2)
  }

  test("centroidMeans recomputation is bit-stable within a session") {
    // The q53 two-stage oracle dumps centroidMeans as an aux artifact
    // while the query recomputes the same frame in a separate action:
    // the per-slot MEAN is a float aggregation, so the contract is that
    // repeated local-mode actions over the same input merge partials in
    // the same order and reproduce every double BIT-identically. A
    // failure here means the aux artifact can silently diverge from the
    // query it vouches for.
    val pts = Seq.tabulate(200)(i =>
      (i.toLong, Seq.tabulate(16)(d => math.sin(i * 31 + d) * (d + 1))))
      .toDF("id", "vec").repartition(4)
    val centers = KMeansAssign.lloydCenters(pts, k = 4, iters = 1)
    val cells = KMeansAssign.assignMap(pts, centers).drop("dist")
    def snap(): Map[Int, Seq[Long]] =
      KMeansAssign.centroidMeans(cells, "vec")
        .as[(Int, Seq[Double])].collect()
        .map { case (c, v) => c -> v.map(java.lang.Double.doubleToRawLongBits) }
        .toMap
    val first = snap()
    (1 to 3).foreach { r =>
      assert(snap() == first, s"centroidMeans drifted on recomputation $r")
    }
  }

  test("lloyd converges on two obvious 2-D clusters") {
    val pts = (Seq.tabulate(20)(i => (i.toLong, Seq(10.0 + i % 3, 1.0))) ++
      Seq.tabulate(20)(i => (20L + i, Seq(-5.0, 8.0 + i % 3)))).toDF("id", "vec")
    val out = KMeansAssign.lloyd(pts, k = 2, maxIter = 3)
    val groups = out.select("id", "center_id").as[(Long, Int)].collect()
      .groupBy(_._2).map(_._2.map(_._1).toSet).toSet
    assert(groups == Set((0L until 20L).toSet, (20L until 40L).toSet))
  }

  test("a short/empty junk seed must not truncate the center set to its prefix") {
    // id 0 (lowest — the seed whose length used to define the conform
    // dim) is a zero-length junk vector; unguarded, every center would
    // truncate to length 0, every distance would read 1.0, and the
    // whole clustering would degenerate into cell 0 with instant fake
    // convergence
    val pts = (Seq((0L, Seq.empty[Double])) ++
      Seq.tabulate(10)(i => (1L + i, Seq(10.0 + i % 3, 1.0))) ++
      Seq.tabulate(10)(i => (11L + i, Seq(-5.0, 8.0 + i % 3)))).toDF("id", "vec")
    val (centers, _) = KMeansAssign.lloydConverge(pts, k = 3, maxIter = 4,
      tol = 0.0)
    assert(centers.forall(_.length == 2),
      "conform dim must be the LARGEST seed's length, zero-padding the junk seed up")
    val out = KMeansAssign.assignMap(pts.where(col("id") > 0L), centers)
    val groups = out.select("id", "center_id").as[(Long, Int)].collect()
      .groupBy(_._2).map(_._2.map(_._1).toSet).filter(_.nonEmpty).toSet
    assert(groups.exists(_ == (11L until 21L).toSet),
      "the real clusters must survive a junk lowest-id seed")
  }

  test("lloydConverge degrades loudly (not fatally) when fewer non-null vectors than k exist") {
    val pts = Seq((0L, Some(Seq(1.0, 0.0))), (1L, None), (2L, Some(Seq(0.0, 1.0))))
      .toDF("id", "vec")
    // a small slice with fewer vectors than a library-default k is a
    // legitimate input: the build returns a valid smaller index (and
    // reports the shortfall on stderr) instead of aborting the pipeline
    val (centers, _) = KMeansAssign.lloydConverge(pts, k = 3, maxIter = 2)
    assert(centers.length == 2, "under-k builds the available centers")
    // truly empty input still fails fast — zero centers assign nothing
    val empty = Seq((0L, None: Option[Seq[Double]])).toDF("id", "vec")
    val e = intercept[IllegalArgumentException] {
      KMeansAssign.lloydConverge(empty, k = 2, maxIter = 2)
    }
    assert(e.getMessage.contains("zero non-null"))
  }
}
