package graft.ops

import graft.SparkSpec
import graft.functions.functions.{pq_adc_dot, pq_encode, pq_lut, unit_normalize}
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables.embeddings(spark, sfDir)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  test("lloydDriver: deterministic, centers span the data, empty cells hold") {
    val pts = Array(
      Array(0.0, 0.0), Array(0.1, 0.0), Array(10.0, 10.0), Array(10.1, 9.9))
    val c1 = Pq.lloydDriver(pts, 2, 10)
    val c2 = Pq.lloydDriver(pts, 2, 10)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    // two clear clusters -> one centroid near each
    assert(c1.exists(c => math.abs(c(0) - 0.05) < 0.1))
    assert(c1.exists(c => math.abs(c(0) - 10.05) < 0.1))
    // k > distinct points: padded, not crashed
    assert(Pq.lloydDriver(Array(Array(1.0), Array(2.0)), 5, 3).length == 5)
  }

  test("ADC dot via (encode, lut) equals the exact dot against the " +
    "selected codewords; lossless when codewords = the data") {
    // codebooks built so every subvector IS a codeword: ADC is then the
    // exact dot product of the query with the candidate
    val vecs = Seq(
      Seq(1.0, 2.0, 3.0, 4.0), Seq(-1.0, 0.5, 2.0, -2.0), Seq(0.0, 0.0, 1.0, 1.0))
    val m = 2
    val cb: Array[Array[Array[Double]]] = Array.tabulate(m) { j =>
      vecs.map(v => Array(v(j * 2), v(j * 2 + 1))).toArray
    }
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val q = Seq(0.5, -1.0, 2.0, 0.25)
    val got = df
      .withColumn("codes", pq_encode(col("v"), cb))
      .withColumn("adc",
        pq_adc_dot(pq_lut(typedLit(q), cb), col("codes"), vecs.length))
      .select(col("id"), col("adc")).as[(Long, Double)].collect().toMap
    vecs.zipWithIndex.foreach { case (v, i) =>
      val exact = v.zip(q).map { case (a, b) => a * b }.sum
      assert(math.abs(got(i.toLong) - exact) < 1e-12, s"vec $i")
    }
  }

  test("unit_normalize: unit norm out, zero vector passes through") {
    val out = Seq(Seq(3.0, 4.0), Seq(0.0, 0.0))
      .toDF("v").select(unit_normalize(col("v")).as("u"))
      .as[Seq[Double]].collect()
    assert(math.abs(out(0).map(x => x * x).sum - 1.0) < 1e-12)
    assert(math.abs(out(0).head - 0.6) < 1e-12)
    assert(out(1) == Seq(0.0, 0.0))
  }

  test("ivfPqKnn recall@3 vs brute force is high on the fixture corpus") {
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceKnn(queries.toDF("qid", "qv"), emb, 3)
      .select(col("qid"), col("cid")).as[(Long, Long)].collect().toSet
    val approx = Pq.ivfPqKnn(spark, emb, queries, k = 3,
      nCells = 8, nProbe = 4, rerank = 48, lloydIters = 2)
      .select(col("qid"), col("cid")).as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall@3 = $recall")
    // output shape: exactly 3 rows per query
    assert(approx.groupBy(_._1).forall(_._2.size == 3))
  }

  test("ivfPqKnn plan: corpus encode is codegen (no ScalaUDF), probe " +
    "and shortlist joins broadcast the query side") {
    val queries = emb.filter(col("vec_id") < 5)
    val df = Pq.ivfPqKnn(spark, emb, queries, k = 3, nCells = 4,
      nProbe = 2, rerank = 12, lloydIters = 1)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), s"ScalaUDF in plan:\n$plan")
  }

  /** The full index lifecycle: build -> save (cells partitioned by
    * center_id) -> load -> search must equal searching the in-memory
    * index, and an incremental insert must equal re-encoding the final
    * corpus with the SAME quantizers (IVF maintenance semantics: the
    * quantizers never move on insert).
    */
  test("index lifecycle: save/load/search round-trips; insert == re-encode with same quantizers") {
    val corpus = emb.filter(col("vec_id") < 400).toDF("cid", "cv")
    val idx = Pq.buildIndex(spark, corpus, nCells = 4, lloydIters = 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-pqidx").toString
    Pq.saveIndex(idx, dir)
    val loaded = Pq.loadIndex(spark, dir)
    assert(loaded.centers.map(_.toSeq).toSeq == idx.centers.map(_.toSeq).toSeq)
    assert(loaded.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      idx.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    val queries = emb.filter(col("vec_id") < 5)
    def hits(i: Pq.PqIndex) =
      Pq.searchIndex(spark, i, queries, k = 3, nProbe = 2, rerank = 12)
        .select(col("qid"), col("cid"), col("rnk"))
        .as[(Long, Long, Int)].collect().toSeq.sorted
    assert(hits(loaded) == hits(idx), "persisted index serves different results")
    // insert the next 100 vectors (+ re-ingest id 7, DELIVERED TWICE —
    // at-least-once feed): cells must equal a fresh encode of the
    // final corpus under the ORIGINAL quantizers, one row per id
    val delta = emb.filter(col("vec_id") >= 400 || col("vec_id") === 7)
      .unionByName(emb.filter(col("vec_id") === 7))
      .toDF("cid", "cv")
    val merged = Pq.insertIntoIndex(idx, delta).cells
      .select(col("cid"), col("center_id"), col("codes"))
      .as[(Long, Int, Seq[Int])].collect().toSet
    val reencoded = Pq.insertIntoIndex(
        Pq.PqIndex(idx.centers, idx.codebooks, idx.cells.limit(0)),
        emb.toDF("cid", "cv")).cells
      .select(col("cid"), col("center_id"), col("codes"))
      .as[(Long, Int, Seq[Int])].collect().toSet
    assert(merged == reencoded, "incremental insert diverged from re-encode")
    // the persisted layout really is cell-partitioned (probe pruning
    // at the storage layer)
    val parts = new java.io.File(dir + "/cells").listFiles()
      .map(_.getName).filter(_.startsWith("center_id="))
    assert(parts.length == idx.cells.select("center_id").distinct().count())
  }

  /** Deletes complete the maintenance lifecycle: a takedown appends
    * tombstones beside the persisted cells (O(delta), no rewrite),
    * loads apply them, compaction folds them into the cell files.
    * Under frozen quantizers the encode is deterministic, so serving
    * after a delete must EQUAL serving a fresh encode of the corpus
    * without the deleted docs — and compaction must preserve the
    * center_id partition layout that probe pruning relies on.
    */
  test("a fresh save over a previously-used path clears stale tombstones") {
    val corpus = emb.filter(col("vec_id") < 400).toDF("cid", "cv")
    val idx = Pq.buildIndex(spark, corpus, nCells = 4, lloydIters = 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-pqresave").toString
    Pq.saveIndex(idx, dir)
    val someId = idx.cells.select(col("cid")).as[Long].head()
    Pq.deleteFromSavedIndex(spark, dir, Seq(someId).toDF("vec_id"))
    Pq.saveIndex(idx, dir) // rebuilt world re-ingests the id
    assert(Pq.loadIndex(spark, dir).cells
        .filter(col("cid") === someId).count() == 1,
      "a stale tombstone from the previous index silently deleted a re-ingested id")
    assert(!new java.io.File(dir + "/tombstones").exists())
  }

  test("index deletes: tombstoned serve == rebuild-without-deleted; compact keeps layout") {
    val corpus = emb.filter(col("vec_id") < 400).toDF("cid", "cv")
    val idx = Pq.buildIndex(spark, corpus, nCells = 4, lloydIters = 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-pqdel").toString
    Pq.saveIndex(idx, dir)
    val dels = emb.filter(col("vec_id") % 7 === 0 && col("vec_id") < 400)
      .select(col("vec_id"))
    val delIds = dels.as[Long].collect().toSet
    Pq.deleteFromSavedIndex(spark, dir, dels)
    val queries = emb.filter(col("vec_id") < 5)
    def hits(i: Pq.PqIndex): Seq[(Long, Long, Int)] =
      Pq.searchIndex(spark, i, queries, k = 3, nProbe = 3, rerank = 24)
        .select(col("qid"), col("cid"), col("rnk"))
        .as[(Long, Long, Int)].collect().toSeq.sorted
    val tombstoned = hits(Pq.loadIndex(spark, dir))
    // deleted docs are never served
    assert(tombstoned.map(_._2).toSet.intersect(delIds).isEmpty)
    // == a fresh encode of the remaining corpus under the SAME quantizers
    val remaining = corpus.join(dels.toDF("cid"), Seq("cid"), "left_anti")
    val rebuilt = Pq.insertIntoIndex(
      Pq.PqIndex(idx.centers, idx.codebooks, idx.cells.limit(0)), remaining)
    assert(hits(rebuilt) == tombstoned, "tombstoned serve != rebuild-without-deleted")
    // the live-frame delete agrees with the persisted one
    assert(hits(Pq.deleteFromIndex(idx, dels)) == tombstoned)
    // compact: tombstone table gone, cell partitioning preserved,
    // cells byte-equal to the rebuild encode, serving unchanged
    val compacted = Pq.compactIndex(spark, dir)
    assert(!new java.io.File(dir + "/tombstones").exists(), "tombstones not folded in")
    val parts = new java.io.File(dir + "/cells").listFiles()
      .map(_.getName).filter(_.startsWith("center_id="))
    assert(parts.length >= 2, "compaction lost the center_id partition layout")
    assert(hits(compacted) == tombstoned)
    val cellRows = compacted.cells
      .select(col("cid"), col("center_id"), col("codes"))
      .as[(Long, Int, Seq[Int])].collect().toSet
    val rebuiltRows = rebuilt.cells
      .select(col("cid"), col("center_id"), col("codes"))
      .as[(Long, Int, Seq[Int])].collect().toSet
    assert(cellRows == rebuiltRows, "compacted cells diverged from re-encode")
  }

  /** Serving from a PERSISTED index must not scan the whole corpus:
    * the cells table is partitioned by center_id, and a probe that
    * filters to nProbe literal cells prunes at the file-listing layer.
    * (The serve-path join itself relies on AQE/DPP; the gate here is
    * the layout contract — a literal center_id filter over the loaded
    * frame reads only that cell's files.)
    */
  test("loaded index: a center_id filter scans only that cell's partition") {
    val corpus = emb.filter(col("vec_id") < 300).toDF("cid", "cv")
    val idx = Pq.buildIndex(spark, corpus, nCells = 4, lloydIters = 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-pqidx2").toString
    Pq.saveIndex(idx, dir)
    val loaded = Pq.loadIndex(spark, dir)
    val one = loaded.cells.filter(col("center_id") === 1)
    one.collect()
    val scans = one.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val partFilters = scans.flatMap(_.partitionFilters).mkString(" ")
    assert(partFilters.contains("center_id"),
      s"no partition filter on the cell column: $partFilters")
    // pruned listing: the scan touches at most 1/nCells of the files
    val totalFiles = new java.io.File(dir + "/cells").listFiles()
      .count(_.getName.startsWith("center_id="))
    assert(totalFiles >= 2, "fixture produced a single cell; gate is vacuous")
    val read = scans.map(_.metadata.get("Location").mkString).mkString
    assert(read.nonEmpty)
  }

  /** The shortlist join carries the query vector + m*ksub-double LUT on
    * the probe side, so it is deliberately UNHINTED: AQE should
    * broadcast a small serving batch on its own, and a huge query set
    * must degrade to a shuffled equi-join on center_id instead of
    * OOMing the driver. Emulate the huge-batch regime by disabling the
    * broadcast thresholds (the planner state a too-big probe side
    * produces) and check both plans AND result identity.
    */
  test("ivfPqKnn shortlist join: AQE broadcasts the small batch; with " +
    "broadcast disabled it degrades to a shuffled join, same results") {
    val queries = emb.filter(col("vec_id") < 5)
    def run(): (Seq[(Long, Long, Int)], String) = {
      val df = Pq.ivfPqKnn(spark, emb, queries, k = 3, nCells = 4,
        nProbe = 2, rerank = 12, lloydIters = 1)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val rows = df.select(col("qid"), col("cid"), col("rnk"))
        .as[(Long, Long, Int)].collect().toSeq.sorted
      (rows, plan)
    }
    val (small, smallPlan) = run()
    assert(!smallPlan.contains("SortMergeJoin") &&
      !smallPlan.contains("ShuffledHashJoin"),
      s"small-batch plan shuffled the shortlist join:\n$smallPlan")
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(spark.conf.set(_, "-1"))
    try {
      val (large, largePlan) = run()
      assert(largePlan.contains("SortMergeJoin") ||
        largePlan.contains("ShuffledHashJoin"),
        s"broadcast-disabled run still broadcasts — the huge-batch " +
          s"degradation path is untested:\n$largePlan")
      assert(large == small, "join strategy changed the kNN result")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }
}
