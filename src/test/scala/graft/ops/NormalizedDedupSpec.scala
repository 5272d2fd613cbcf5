package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q207 normalized near-dup: the folded MinHash chain must strike a
  * case/diacritic-disguised duplicate the raw chain misses, the
  * impact report must expose exactly that gain per source, and on the
  * accent-free fixture corpus the fold must be a no-op (raw == norm
  * yields — the identity envelope the oracle exercises).
  */
class NormalizedDedupSpec extends SparkSpec {
  import spark.implicits._

  // base text long enough for 3-shingles and a stable Jaccard
  private val base =
    "the quick brown fox jumps over the lazy dog near the river bank today"
  private val disguised = // same words, case + accent disguise
    "The Quick Brown Fox jumps over the lazy dog near the rivér bank today"

  // ids 4/5: an exact dup pair in a NULL-source junk group — its
  // tallies must land on the null spine row (null-safe join), not
  // silently zero out
  private val junk =
    "some orphaned ingestion record with no source attribution at all here"
  private val docs = Seq(
    (1L, base, "srcA"),
    (2L, disguised, "srcA"),
    (3L, "completely different content about spark catalyst optimizer rules and codegen stages", "srcB"),
    (4L, junk, null),
    (5L, junk, null))
    .toDF("doc_id", "text", "source")

  test("folded MinHash strikes the disguised duplicate; raw chain misses it") {
    def pairs(sigs: org.apache.spark.sql.DataFrame) =
      Dedup.verifiedPairs(sigs.localCheckpoint(false))
        .as[(Long, Long)].collect().toSet
    val raw = pairs(Dedup.minhashSignatures(docs))
    val folded = pairs(Dedup.foldedMinhashSignatures(docs))
    assert(!raw.contains((1L, 2L)),
      s"raw chain unexpectedly paired the disguised dup: $raw")
    assert(folded == Set((1L, 2L), (4L, 5L)),
      s"folded chain must pair the disguised dup + the exact junk dup, got $folded")
    assert(raw.contains((4L, 5L)), "exact dup must pair in the raw chain too")
  }

  test("impact report: gain charged to the pair's d1 source, zero rows kept, null source reported") {
    val rep = Dedup.normalizedPairImpact(docs)
      .orderBy(col("source"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(rep == Seq(
      (null, 1L, 1L, 0L, 0L),
      ("srcA", 0L, 1L, 1L, 0L),
      ("srcB", 0L, 0L, 0L, 0L)), s"impact report: $rep")
  }

  test("fixture corpus (lowercase ASCII): fold is the identity — raw == norm") {
    val rep = Dedup.q207.build(spark, sfDir)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rep.nonEmpty)
    rep.foreach { case (src, nRaw, nNorm, gained, lost) =>
      assert(nRaw == nNorm && gained == 0L && lost == 0L,
        s"$src: fold must be a no-op on the ASCII fixture")
    }
    // and the fixture actually has pairs to compare (q85's slice does)
    assert(rep.map(_._2).sum > 0, "fixture slice has no raw pairs at all")
  }
}
