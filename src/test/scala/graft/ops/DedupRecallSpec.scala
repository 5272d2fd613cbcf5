package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Recall of the PRODUCTION dedup paths (xxhash64 MinHash-LSH, SimHash
  * banding — rows-only in the oracle because DuckDB can't reproduce the
  * engine hash) against exact ground truth computed on the real fixture
  * corpus. This closes the verification gap for the non-oracle queries:
  * the approximate candidate generators must recover the planted
  * near-duplicates that an exact pass finds.
  */
class DedupRecallSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir)
    .filter(col("doc_id") < 200)

  /** Exact pairwise set-Jaccard over every doc pair, parameterized by
    * the tokenizer so each sketch is judged against ITS OWN metric:
    * 3-word shingles for MinHash, distinct tokens for SimHash.
    * Quadratic is fine in a test; production verifies only LSH
    * candidates.
    */
  private def exactPairs(tokenizer: Column => Column,
                         minJaccard: Double): Set[(Long, Long)] = {
    val t = docs
      .select(col("doc_id"), explode(tokenizer(col("text"))).as("term"))
      .distinct()
    val sz = t.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = t.toDF("d1", "term")
      .join(t.toDF("d2", "term2"),
        col("term") === col("term2") && col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("n_common"))
    val jac = col("n_common") / (col("n1") + col("n2") - col("n_common"))
    inter
      .join(sz.toDF("dk1", "n1"), col("dk1") === col("d1"))
      .join(sz.toDF("dk2", "n2"), col("dk2") === col("d2"))
      .filter(jac >= minJaccard)
      .select(col("d1"), col("d2")).as[(Long, Long)].collect().toSet
  }

  test("minhashCandidates recovers the exact Jaccard>=0.8 pairs on the fixture corpus") {
    // MinHash estimates SHINGLE-set Jaccard (token-set similarity is a
    // different metric: the templated corpus shares vocabulary but not
    // phrasing)
    val truth = exactPairs(Dedup.shingles(_, 3), 0.8)
    assert(truth.nonEmpty, "fixture corpus has no planted near-dups at 0.8")
    val cand = Dedup.minhashCandidates(docs)
      .as[(Long, Long)].collect().toSet
    val missed = truth -- cand
    val recall = 1.0 - missed.size.toDouble / truth.size
    assert(recall >= 0.9,
      s"LSH recall $recall; missed ${missed.take(5)} of ${truth.size}")
  }

  /** The corpus has no byte-identical docs (only templated near-dups),
    * so the SimHash check is precision: a pair the operator flags as
    * hamming-close must actually share most of its vocabulary. SimHash
    * is computed over distinct token ids, so token-set Jaccard is the
    * matching ground-truth metric here (not shingles).
    */
  /** Pigeonhole gate for the multi-band candidate join: a pair within
    * hamming distance 3 differs in at most 3 of the 4 disjoint 16-bit
    * bands, so at least one band matches exactly and the pair MUST be
    * a candidate — recall is 1.0 by construction, not probabilistic.
    * (The replaced single-high-band scheme missed ~44% of hamming-2
    * pairs: both flips in the low 48 bits meant no candidate row.)
    */
  test("simhash multi-band recall = 1.0 on planted hamming<=3 signature pairs") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).flatMap { i =>
      val base = rnd.nextLong()
      var pert = base
      (0 until 1 + rnd.nextInt(3)).foreach { _ =>
        pert ^= (1L << rnd.nextInt(64)) // repeats may cancel; still <= 3
      }
      Seq((i.toLong * 2, base), (i.toLong * 2 + 1, pert))
    }
    val planted = (0 until 200).map(i => (i.toLong * 2, i.toLong * 2 + 1)).toSet
    val found = Dedup.simhashBandPairs(rows.toDF("doc_id", "sig"), maxHamming = 3)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val missed = planted -- found
    assert(missed.isEmpty,
      s"multi-band simhash missed ${missed.size} planted hamming<=3 pairs: ${missed.take(5)}")
  }

  test("simhashPairs precision: low-hamming pairs share high token-set Jaccard") {
    val flagged = Dedup.simhashPairs(docs, maxHamming = 4)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(flagged.nonEmpty, "no simhash pairs on the fixture corpus")
    val similar = exactPairs(TextAnalytics.toks, 0.5)
    val falsePos = flagged -- similar
    val precision = 1.0 - falsePos.size.toDouble / flagged.size
    assert(precision >= 0.9,
      s"simhash precision $precision; false positives ${falsePos.take(5)}")
  }
}
