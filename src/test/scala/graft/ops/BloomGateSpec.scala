package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q202's portable Bloom gate: the no-false-negative guarantee (every
  * exact member is flagged), hand-computed bit positions (the packed
  * words really encode the KR/Kirsch-Mitzenmacher formula the scaladoc
  * claims), and the fixture-level audit invariants.
  */
class BloomGateSpec extends SparkSpec {
  import spark.implicits._

  /** The KR fold and K-M positions re-spelled by hand (independent of
    * the Column implementation under test).
    */
  private def kr(s: String, mult: Long): Long =
    s.foldLeft(0L)((a, c) => (a * mult + c.toLong) % 1000000007L)
  private def positions(s: String): Seq[Long] = {
    val (h1, h2) = (kr(s, 31L), kr(s, 131L))
    (0 until 3).map(j => (h1 + j * h2 + 13L * j) % Dedup.BloomBits)
  }

  test("bloomWords packs exactly the hand-computed K-M bit positions") {
    val sh = Seq("alpha beta gamma delta", "one two three four").toDF("sh")
    val words = Dedup.bloomWords(sh)
    val expect = Seq("alpha beta gamma delta", "one two three four")
      .flatMap(positions).toSet
    val got = (0L until Dedup.BloomBits.toLong).filter(p =>
      ((words((p >> 6).toInt) >> (p & 63).toInt) & 1L) == 1L).toSet
    assert(got == expect, s"set bits $got != hand-computed $expect")
  }

  test("bloomFlag: members always hit (no false negatives); a fresh probe can miss") {
    val bench = Seq("alpha beta gamma delta", "one two three four").toDF("sh")
    val words = Dedup.bloomWords(bench)
    val probes = Seq(
      (1L, "alpha beta gamma delta"), // member
      (2L, "one two three four"),     // member
      (3L, "zz yy xx ww qq"))         // novel (verified non-colliding below)
      .toDF("doc_id", "sh")
    val out = Dedup.bloomFlag(probes, words)
      .select(col("doc_id"), col("bloom_hit")).as[(Long, Boolean)]
      .collect().toMap
    assert(out(1L) && out(2L), "exact member not flagged — false negative")
    // the novel probe's three positions genuinely avoid the set bits
    // (checked by hand so the assertion is about the kernel, not luck)
    val benchBits = Seq("alpha beta gamma delta", "one two three four")
      .flatMap(positions).toSet
    val novelHit = positions("zz yy xx ww qq").forall(benchBits.contains)
    assert(out(3L) == novelHit)
  }

  test("q205 eval-burn invariants: every benchmark item reported, burns bounded, fraction exact") {
    val rows = Dedup.q205.build(spark, sfDir)
      .select(col("doc_id"), col("n_sh"), col("n_burned"),
        col("n_corpus_docs"), col("max_overlap"), col("frac_burned"))
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(rows.length == 50, s"expected all 50 benchmark items, got ${rows.length}")
    rows.foreach { case (id, nSh, burned, nDocs, mx, frac) =>
      assert(id >= 450L && id < 500L)
      assert(burned <= nSh, s"item $id: burned $burned > shingles $nSh")
      assert(mx <= burned, s"item $id: single-doc overlap $mx > total burned")
      assert((burned > 0) == (nDocs > 0))
      assert(frac == burned.toDouble / nSh.toDouble)
    }
  }

  test("q202 audit invariants on the fixture: flagged ⊇ exact per doc, benchmark excluded") {
    val rows = Dedup.q202.build(spark, sfDir)
      .select(col("doc_id"), col("n_sh"), col("n_flagged"), col("n_exact"),
        col("n_fp"))
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, nSh, fl, ex, fp) =>
      assert(!(id >= 450L && id < 500L), s"benchmark doc $id in corpus rows")
      assert(fl >= ex, s"doc $id: flagged $fl < exact $ex — false negative")
      assert(fp == fl - ex && fp >= 0L, s"doc $id: fp $fp inconsistent")
      assert(fl <= nSh && ex <= nSh)
    }
  }
}
