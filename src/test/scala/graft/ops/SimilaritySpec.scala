package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  val vecs = Seq(
    (0L, Seq(1.0, 0.0, 0.0)),
    (1L, Seq(0.9, 0.1, 0.0)),  // closest to 0
    (2L, Seq(0.0, 1.0, 0.0)),
    (3L, Seq(0.0, 0.9, 0.2)),  // closest to 2
    (4L, Seq(-1.0, 0.0, 0.0))) // opposite of 0
    .toDF("vec_id", "v")

  test("bruteForceKnn: nearest neighbor ordering is correct") {
    val out = Similarity.bruteForceKnn(
      vecs.filter($"vec_id" === 0L).toDF("qid", "qv"), vecs, k = 4)
      .select("qid", "cid", "rnk").as[(Long, Long, Int)].collect()
      .sortBy(_._3)
    assert(out.map(_._2).toList == List(1L, 2L, 3L, 4L))
  }

  test("lshKnn returns only true-ish neighbors and respects k") {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val res = Similarity.lshKnn(spark, emb, emb.filter(col("vec_id") < 5), k = 3, nPlanes = 4)
    val rows = res.select("qid", "cid", "score", "rnk")
      .as[(Long, Long, Double, Int)].collect()
    assert(rows.nonEmpty)
    assert(rows.groupBy(_._1).forall(_._2.length <= 3))
    assert(rows.forall(r => r._1 != r._2))
    // scores are real cosines (bounded) and ranks order them descending
    assert(rows.forall(r => r._3 >= -1.0000001 && r._3 <= 1.0000001))
    rows.groupBy(_._1).values.foreach { rs =>
      val byRank = rs.sortBy(_._4).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"scores not descending by rank: ${rs.toList}")
    }
    // the scores must be the TRUE cosine of the returned pair, not an
    // artifact of the bucketing path
    val lookup = emb.as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    rows.foreach { case (q, c, s, _) =>
      assert(math.abs(s - cos(lookup(q), lookup(c))) < 1e-9)
    }
  }

  test("lsh recall vs brute force on real embeddings") {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceKnn(queries.toDF("qid", "qv"), emb, k = 1)
      .select("qid", "cid").as[(Long, Long)].collect().toMap
    assert(exact.size == 20) // each query has a nearest neighbor
    // few planes -> big buckets -> recall@1 should be high
    val approx = Similarity.lshKnn(spark, emb, queries, k = 1, nPlanes = 4)
      .select("qid", "cid").as[(Long, Long)].collect().toMap
    val recall = exact.count { case (q, n) => approx.get(q).contains(n) }
      .toDouble / exact.size
    assert(recall >= 0.5, s"LSH recall@1 = $recall vs exact")
  }

  test("probeMasks enumerates exactly the hamming ball, deterministically") {
    // |ball(n, p)| = sum C(n, i); all masks distinct, popcount <= p
    val m0 = Similarity.probeMasks(12, 0)
    assert(m0 == Seq(0))
    val m1 = Similarity.probeMasks(12, 1)
    assert(m1.size == 13 && m1.head == 0)
    assert(m1.tail == (0 until 12).map(1 << _))
    val m2 = Similarity.probeMasks(12, 2)
    assert(m2.size == 1 + 12 + 66)
    assert(m2.distinct.size == m2.size)
    assert(m2.forall(m => Integer.bitCount(m) <= 2))
    assert(Similarity.probeMasks(3, 3).size == 8) // full hypercube
  }

  test("deeper multi-probe: recall@1 monotone in probe depth; >= 0.7 at tuned bucket density") {
    // The test embeddings are near-random (nearest-neighbor cosine
    // ~0.3, per-plane agreement ~0.6), so recall follows the sign-LSH
    // binomial exactly: at nPlanes=12 the hamming-2 ball captures only
    // ~8% of true neighbors (measured 0.2 here); recall comes either
    // from deeper probes or from sizing nPlanes to the corpus (the
    // production rule: nPlanes ~ log2(corpus / target bucket size)).
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceKnn(queries.toDF("qid", "qv"), emb, k = 1)
      .select("qid", "cid").as[(Long, Long)].collect().toMap
    def recallAt(nPlanes: Int, flips: Int): Double = {
      val approx = Similarity.lshKnn(spark, emb, queries, k = 1,
        nPlanes = nPlanes, probeFlips = flips)
        .select("qid", "cid").as[(Long, Long)].collect().toMap
      exact.count { case (q, n) => approx.get(q).contains(n) }.toDouble / exact.size
    }
    // tuned bucket density (2^6 = 64 buckets over ~500 vectors): the
    // hamming-2 ball recovers most true neighbors
    assert(recallAt(6, 2) >= 0.7, "recall@1 at nPlanes=6, 2 flips")
    // over-partitioned (12 planes): recall is monotone in probe depth
    // (more probed buckets can only add candidates) and deep probing
    // recovers what shallow probing lost
    val r1 = recallAt(12, 1)
    val r2 = recallAt(12, 2)
    val r5 = recallAt(12, 5)
    assert(r1 <= r2 + 1e-9 && r2 <= r5 + 1e-9, s"recall not monotone: $r1, $r2, $r5")
    assert(r5 >= 0.7, s"recall@1 with 5 flips = $r5")
    // every query still produces at most k rows
    val out = Similarity.lshKnn(spark, emb, queries, k = 1, nPlanes = 12, probeFlips = 2)
      .groupBy("qid").count().as[(Long, Long)].collect()
    assert(out.forall(_._2 <= 1))
  }

  test("ivfKnn: full probe equals brute force; partial probe has decent recall@1") {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .filter(col("vec_id") < 200)
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceKnn(queries.toDF("qid", "qv"), emb, k = 1)
      .select("qid", "cid").as[(Long, Long)].collect().toMap
    // probing every cell must reproduce exact search
    val full = Similarity.ivfKnn(spark, emb, queries, k = 1,
      nCells = 4, nProbe = 4, lloydIters = 1)
      .select("qid", "cid").as[(Long, Long)].collect().toMap
    assert(full == exact)
    // probing half the cells keeps most top-1 neighbors
    val partial = Similarity.ivfKnn(spark, emb, queries, k = 1,
      nCells = 4, nProbe = 2, lloydIters = 1)
      .select("qid", "cid").as[(Long, Long)].collect().toMap
    val recall = exact.count { case (q, n) => partial.get(q).contains(n) }.toDouble / exact.size
    assert(recall >= 0.5, s"recall@1 = $recall")
  }

  test("nearestCentroidConfusion: separable labels sit on the diagonal") {
    // two tight clusters around (1,0) and (0,1), one deliberate stray
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f), 0), (1L, Seq(0.9f, 0.1f), 0), (2L, Seq(1.1f, -0.1f), 0),
      (3L, Seq(0.0f, 1.0f), 1), (4L, Seq(0.1f, 0.9f), 1),
      (5L, Seq(0.95f, 0.05f), 1)) // labeled 1, sits in cluster 0... almost
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.nearestCentroidConfusion(emb)
      .as[(Long, Long, Long)].collect().toSet
    // centroid(0) = (1, 0); centroid(1) = ((0+0.1+0.95)/3, (1+0.9+0.05)/3)
    // = (0.35, 0.65). Vector 5 at (0.95, 0.05): d2 to c0 = 0.005, to
    // c1 = 0.72 -> predicted 0. All of label 0 stays at 0; vectors
    // 3 and 4 stay at 1.
    assert(out == Set((0L, 0L, 3L), (1L, 0L, 1L), (1L, 1L, 2L)))
  }

  test("nearestCentroidConfusion: bit-identical across block sizes and partitionings") {
    val emb = Tables.embeddings(spark, sfDir)
    val a = Similarity.nearestCentroidConfusion(emb)
      .as[(Long, Long, Long)].collect().toSeq
    // different physical partitioning, same two-level tree -> same bits
    val b = Similarity.nearestCentroidConfusion(emb.repartition(7))
      .as[(Long, Long, Long)].collect().toSeq
    assert(a == b)
    // a DIFFERENT block size changes the association tree, which may
    // move last-ulp bits but must never move a classification at this
    // fixture's separation: same confusion cells
    val c = Similarity.nearestCentroidConfusion(emb, blockSize = 64)
      .as[(Long, Long, Long)].collect().toSeq
    assert(a == c)
  }

  test("labelNoiseFromKnn flags a planted mislabel, clears clean members") {
    // two tight clusters of 6; vector 11 sits in cluster A but wears
    // label 1 — all 5 of its neighbors disagree
    val a = (0L to 5L).map(i => (i, 0L, Seq(1.0 + 0.01 * i, 0.0)))
    val b = (6L to 10L).map(i => (i, 1L, Seq(0.0, 1.0 + 0.01 * i)))
    val e = (a ++ b :+ ((11L, 1L, Seq(1.0, 0.001))))
      .toDF("vec_id", "label", "v")
    val knn = Similarity.bruteForceKnn(
      e.select(col("vec_id").as("qid"), col("v").as("qv")),
      e.select(col("vec_id"), col("v")), k = 5)
    val out = Similarity.labelNoiseFromKnn(knn, e.select(col("vec_id"), col("label")), k = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(4))).toMap
    assert(out(11L) == ((0L, true)), "planted mislabel must be suspect with 0 agreeing")
    assert(out(0L)._2 == false)
    assert(out(7L)._2 == false)
  }

  test("embeddingOutliers flags a planted far vector, clears the tight cluster") {
    val tight = (0L to 7L).map(i => (i, 0L, Seq(1.0f + 0.01f * i, 0.0f)))
    val e = (tight :+ ((8L, 0L, Seq(30.0f, 40.0f)))) // far outlier, same label
      .toDF("vec_id", "label", "embedding")
    val out = Similarity.embeddingOutliers(e)
      .collect().map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    assert(out(8L), "planted far vector must flag as outlier")
    assert((0L to 7L).forall(!out(_)), "tight members must not flag")
  }

  test("ivfCellBalance: planted hot cell flags at load >= 2; cum_share ranks largest-first") {
    import spark.implicits._
    // first-4-by-id init => centers are the 4 axis directions; ids 4-7
    // all point near +x, so cell 0 holds 5 of 8 vectors (load 2.5)
    val e = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)),
      (2L, Seq(-1.0, 0.0)), (3L, Seq(0.0, -1.0)),
      (4L, Seq(2.0, 0.1)), (5L, Seq(3.0, -0.1)),
      (6L, Seq(5.0, 0.2)), (7L, Seq(4.0, 0.05)))
      .toDF("vec_id", "v")
    val rows = Similarity.ivfCellBalance(e, nCells = 4)
      .orderBy(col("n_vecs").desc, col("center_id"))
      .as[(Long, Long, Double, Double, Long)].collect()
    assert(rows.map(r => r._1 -> r._2).toSeq ==
      Seq(0L -> 5L, 1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(rows.head._3 == 2.5 && rows.head._5 == 1L, "hot cell at load 2.5")
    assert(rows.tail.forall(_._5 == 0L), "balanced cells don't flag")
    assert(rows.map(_._4).toSeq == Seq(5.0 / 8, 6.0 / 8, 7.0 / 8, 1.0),
      "cumulative share ranks largest cells first")
  }

  test("IVF index lifecycle: tombstoned serve == live delete == rebuild-without-deleted; compact keeps layout") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .filter(col("v").isNotNull)
    val idx = Similarity.buildIvfIndex(spark, emb, nCells = 4, lloydIters = 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfdel").toString
    Similarity.saveIvfIndex(idx, dir)
    val dels = emb.filter(pmod(col("vec_id"), lit(7)) === 0).select(col("vec_id"))
    val delIds = dels.as[Long].collect().toSet
    val queries = emb.filter(col("vec_id") < 5)
    Similarity.deleteFromSavedIvfIndex(spark, dir, dels)
    def hits(i: Similarity.IvfIndex): Seq[(Long, Long, Int)] =
      Similarity.searchIvfIndex(spark, i, queries, k = 3, nProbe = 2)
        .select(col("qid"), col("cid"), col("rnk"))
        .as[(Long, Long, Int)].collect().toSeq.sorted
    val tombstoned = hits(Similarity.loadIvfIndex(spark, dir))
    assert(tombstoned.nonEmpty)
    assert(tombstoned.map(_._2).toSet.intersect(delIds).isEmpty,
      "a deleted vector must never be served")
    // == a fresh assignment of the remaining corpus under the SAME quantizer
    val remaining = emb.join(dels.toDF("vec_id"), Seq("vec_id"), "left_anti")
    val rebuilt = Similarity.IvfIndex(idx.centers,
      graft.cluster.KMeansAssign.assignMap(
        remaining.toDF("cid", "cv"), idx.centers, "cv").drop("dist"))
    assert(hits(rebuilt) == tombstoned, "tombstoned serve != rebuild-without-deleted")
    // the live-frame delete agrees with the persisted one
    assert(hits(Similarity.deleteFromIvfIndex(idx, dels)) == tombstoned)
    // compact: tombstones folded in, partition layout preserved, serve unchanged
    val compacted = Similarity.compactIvfIndex(spark, dir)
    assert(!new java.io.File(dir + "/tombstones").exists(), "tombstones not folded in")
    val parts = new java.io.File(dir + "/cells").listFiles()
      .map(_.getName).filter(_.startsWith("center_id="))
    assert(parts.length >= 2, "compaction lost the center_id partition layout")
    assert(hits(compacted) == tombstoned)
    // the compacted store holds exactly the surviving assignment rows
    val cellRows = compacted.cells.select(col("cid"), col("center_id"))
      .as[(Long, Int)].collect().toSet
    val rebuiltRows = rebuilt.cells.select(col("cid"), col("center_id"))
      .as[(Long, Int)].collect().toSet
    assert(cellRows == rebuiltRows, "compacted cells diverged from re-assignment")
  }

  test("a fresh save over a previously-used path clears stale tombstones") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .filter(col("v").isNotNull)
    val idx = Similarity.buildIvfIndex(spark, emb, nCells = 4, lloydIters = 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfresave").toString
    Similarity.saveIvfIndex(idx, dir)
    val someId = idx.cells.select(col("cid")).as[Long].head()
    Similarity.deleteFromSavedIvfIndex(spark, dir, Seq(someId).toDF("vec_id"))
    // the world rebuilds: the id is re-ingested and a FRESH index is
    // saved over the same path — the old takedown must not survive
    Similarity.saveIvfIndex(idx, dir)
    val loaded = Similarity.loadIvfIndex(spark, dir)
    assert(loaded.cells.filter(col("cid") === someId).count() == 1,
      "a stale tombstone from the previous index silently deleted a re-ingested id")
    assert(!new java.io.File(dir + "/tombstones").exists(),
      "save must clear the previous index's tombstones")
  }

  test("q180 recall curve: monotone non-decreasing in nprobe, exactly 1.0 at nprobe = nCells") {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val rows = Similarity.ivfRecallCurve(spark, emb,
      emb.filter(col("vec_id") < 10), k = 10, nCells = 8, lloydIters = 1)
      .orderBy(col("nprobe")).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getDouble(4)))
    assert(rows.map(_._1).toSeq == (1L to 8L),
      "one curve point per probe depth, zero-hit depths included")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 <= b._3,
        s"recall must be monotone in nprobe: ${a._1}->${a._3} vs ${b._1}->${b._3}")
    }
    assert(rows.last._3 == 1.0,
      "probing every cell IS the exact search: recall must be exactly 1.0")
    assert(rows.head._3 > 0.0, "probing the nearest cell must find something")
  }

  test("jlProject kernel: per-plane index-order dots, sign bits agree with signBucket") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val planes = Array(Array(1.0, -2.0, 0.5), Array(0.0, 3.0, -1.0))
    val v = new GenericArrayData(Array[Any](2.0, 1.0, 4.0))
    val out = graft.functions.VectorOps.jlProject(v, planes)
    assert(out.numElements() == 2)
    assert(out.getDouble(0) == 1.0 * 2.0 + -2.0 * 1.0 + 0.5 * 4.0)
    assert(out.getDouble(1) == 0.0 * 2.0 + 3.0 * 1.0 + -1.0 * 4.0)
    // ragged input: dimensions beyond the common prefix are ignored
    val short = new GenericArrayData(Array[Any](2.0, 1.0))
    assert(graft.functions.VectorOps.jlProject(short, planes).getDouble(0) == 0.0)
    // the sign bit of every projected component IS the sign-LSH bucket
    // bit — same planes, same fold, one family
    val rnd = new scala.util.Random(7)
    (1 to 20).foreach { _ =>
      val x = new GenericArrayData(
        Array.fill[Any](8)(rnd.nextDouble() * 2 - 1))
      val pl = graft.ops.Similarity.signPlanes(12, 8)
      val proj = graft.functions.VectorOps.jlProject(x, pl)
      val bucket = graft.functions.VectorOps.signBucket(x, pl)
      (0 until 12).foreach { p =>
        assert(((bucket >> p) & 1) == (if (proj.getDouble(p) >= 0) 1 else 0),
          s"plane $p: sign bit diverges from the projected component")
      }
    }
  }

  test("q190 JL curve: prefix-stable planes, one row per dim, recall bounded and exact-by-31 high") {
    // prefix property the curve's shared projection rests on: the
    // m-plane set is literally the first m rows of the 31-plane set
    val all = Similarity.jlPlanes
    val eight = Similarity.signPlanes(8, 64)
    (0 until 8).foreach(p => assert(all(p).sameElements(eight(p)),
      s"plane $p must not depend on the set width"))
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val rows = Similarity.jlRecallCurve(spark, emb,
      emb.filter(col("vec_id") < 10), k = 10)
      .orderBy(col("proj_dim")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.map(_._1).toSeq == Seq(4L, 8L, 16L, 31L),
      "one curve point per projection dim, zero-hit dims included")
    rows.foreach { case (m, k, nq, nh, rec) =>
      assert(k == 10L && nq > 0)
      assert(nh >= 0 && nh <= k * nq, s"dim $m: hits out of range")
      assert(rec >= 0.0 && rec <= 1.0, s"dim $m: recall $rec out of [0,1]")
    }
    // JL in expectation: the widest projection must beat the narrowest
    // on any non-adversarial corpus (the fixture is driver-generated
    // gaussian-ish); equality would mean the slice plumbing is dead
    assert(rows.last._5 > rows.head._5,
      "31-dim recall must exceed 4-dim recall on the fixture")
  }
}
