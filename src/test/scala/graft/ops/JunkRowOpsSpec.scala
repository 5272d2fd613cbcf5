package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Junk-row behavior of the ANN/dedup OPERATOR surface (the loader
  * policy — "junk degrades row-local, never kills the scan" — applied
  * one layer up): null vectors, null text, null edge endpoints, and
  * ragged embeddings must not NPE driver-side math, collapse LSH
  * buckets, corrupt token sums, or null-poison distance argmins.
  */
class JunkRowOpsSpec extends SparkSpec {
  import spark.implicits._

  test("Pq.trainCodebooks skips null vectors instead of NPEing the driver") {
    val corpus = Seq(
      (0L, Some(Seq(1.0, 0.0, 0.0, 0.0))),
      (1L, None), // the embeddings loader's junk-line convention
      (2L, Some(Seq(0.0, 1.0, 0.0, 1.0))),
      (3L, Some(Seq(1.0, 1.0, 0.0, 0.0))))
      .toDF("vec_id", "v")
    val books = Pq.trainCodebooks(corpus, "vec_id", "v", dim = 4, m = 2, ksub = 2,
      sampleN = 10, iters = 2)
    assert(books.length == 2 && books.forall(_.forall(_.forall(d => !d.isNaN))))
  }

  test("bandSignatures emits NO band rows for null-text docs (no seed-bucket collapse)") {
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, null), (3L, null))
      .toDF("doc_id", "text")
    val bands = Dedup.bandSignatures(docs, nHashes = 8, bandSize = 4)
    assert(bands.filter(col("doc_id") =!= 1L).count() == 0,
      "null-text docs must not band (xxhash64(NULL slice) = seed would pair them all)")
    assert(bands.filter(col("doc_id") === 1L).count() == 2)
    // and therefore no junk candidate pairs between the null-text docs
    val cands = Dedup.minhashCandidates(docs, nHashes = 8, bandSize = 4)
    assert(cands.count() == 0)
  }

  test("dedupImpact: null-text docs contribute NULL tokens (twin sum-skip), not -1") {
    val docs = Seq(
      (1L, "one two three", "src"),
      (2L, null, "src"),
      (3L, "four five", "src"))
      .toDF("doc_id", "text", "source")
    val row = Dedup.dedupImpact(docs).collect().head
    assert(row.getAs[Long]("n_docs") == 3L)
    // size(toks(null)) is -1 under this config: an unguarded sum would
    // report 4, DuckDB's len(NULL) sum-skip reports 5
    assert(row.getAs[Long]("n_tokens") == 5L)
  }

  test("connectedComponents drops null-endpoint edges identically on both dispatch paths") {
    val pairs = Seq(
      (Some(1L), Some(2L)), (Some(2L), Some(3L)),
      (None, Some(7L)), (Some(8L), None), // junk upstream rows
      (Some(10L), Some(11L)))
      .toDF("a", "b")
    val local = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.connectedComponents(pairs, localEdgeLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L)
    assert(local == expected, "local union-find must not NPE on null ids")
    assert(dist == expected, "distributed loop must agree with the local path")
  }

  test("nearestCentroidConfusion: ragged vector assigned by common-prefix distance, not null-poisoned") {
    val emb = Seq(
      (0L, 0L, Seq(0.0, 0.0, 0.0)),
      (1L, 0L, Seq(0.0, 0.0, 0.0)),
      (2L, 1L, Seq(10.0, 10.0, 10.0)),
      (3L, 1L, Seq(10.0, 10.0, 10.0)),
      (4L, 0L, Seq(9.0, 9.0))) // ragged: one dim short
      .toDF("vec_id", "label", "embedding")
    val cells = Similarity.nearestCentroidConfusion(emb)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // centroids: c0 = [3,3,0] (the ragged vec contributes dims 0-1),
    // c1 = [10,10,10]; the ragged vec's prefix distances are 72 vs 2,
    // so it classifies as label 1 — a null-padded zip_with would have
    // nulled EVERY distance and nulls-first argmin'd it to label 0
    assert(cells == Map((0L, 0L) -> 2L, (0L, 1L) -> 1L, (1L, 1L) -> 2L))
  }

  test("silhouetteByLabel survives ragged vectors with finite means") {
    val emb = Seq(
      (0L, 0L, Seq(0.0, 0.0, 0.0)),
      (1L, 0L, Seq(0.1, 0.0)), // ragged
      (2L, 1L, Seq(10.0, 10.0, 10.0)))
      .toDF("vec_id", "label", "embedding")
    val rows = Similarity.silhouetteByLabel(emb).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val s = r.getDouble(2)
      assert(!s.isNaN && s >= -1.0 && s <= 1.0, s"mean_silhouette out of range: $s")
    }
  }

  test("dedupByEmbedding plan has no top-k window (threshold path skips the rank sort)") {
    val e = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)))
      .toDF("vec_id", "v")
    val out = Dedup.dedupByEmbedding(spark, e, threshold = 0.95, nPlanes = 4)
    assert(out.count() == 2, "one of the two identical vectors must be struck")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("row_number"),
      "unbounded-threshold dedup must not pay a per-qid rank window:\n" + plan)
  }
}
