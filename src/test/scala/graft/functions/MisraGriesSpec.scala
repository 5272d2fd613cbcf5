package graft.functions

import graft.SparkSpec
import graft.functions.MisraGriesAgg.misra_gries
import org.apache.spark.sql.functions._

/** Misra-Gries summary: the mergeable-sketch guarantee (every item
  * with frequency > N/(k+1) survives any partitioning/merge order)
  * and the bounded candidate size, on streams with planted heavy
  * items among a long light tail.
  */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  private def candidates(items: Seq[String], k: Int, parts: Int): Seq[String] =
    items.toDF("term").repartition(parts)
      .agg(misra_gries(col("term"), k).as("cand"))
      .head().getSeq[String](0)

  test("planted heavy items survive across partitions; size bounded by k") {
    val heavy = Seq.fill(500)("h1") ++ Seq.fill(300)("h2")
    val light = (0 until 2000).map(i => s"w$i")
    val stream = scala.util.Random.shuffle(heavy ++ light) // N=2800
    for (parts <- Seq(1, 7)) {
      val cand = candidates(stream, k = 10, parts = parts)
      // N/(k+1) = 254.5: h1 (500) and h2 (300) are guaranteed
      assert(cand.contains("h1") && cand.contains("h2"),
        s"parts=$parts lost a guaranteed heavy item: $cand")
      assert(cand.size <= 10)
    }
  }

  test("k=1 finds a strict majority element") {
    val stream = Seq.fill(600)("maj") ++ (0 until 500).map(i => s"x$i")
    val cand = candidates(scala.util.Random.shuffle(stream), k = 1, parts = 5)
    assert(cand == Seq("maj"))
  }

  test("nulls are ignored; fewer than k distinct items are all kept exactly") {
    val df = Seq(Some("a"), Some("a"), None, Some("b"), None)
      .toDF("term").repartition(3)
    val cand = df.agg(misra_gries(col("term"), 8).as("c")).head().getSeq[String](0)
    // under k distinct: no decrements ever fire, so the summary is exact
    assert(cand == Seq("a", "b")) // count desc, then term
  }

  test("randomized guarantee: all above-threshold items present, any k") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 3) {
      val k = 4 + rnd.nextInt(12)
      // Zipf-ish: item i gets ~1000/(i+1) copies
      val items = (0 until 40).flatMap(i => Seq.fill(1000 / (i + 1))(s"t$i"))
      val n = items.size
      val exact = items.groupBy(identity).view.mapValues(_.size)
      val mustHave = exact.filter { case (_, c) => c > n.toDouble / (k + 1) }.keys
      val cand = candidates(rnd.shuffle(items), k, parts = 1 + rnd.nextInt(8))
      val missing = mustHave.filterNot(cand.contains)
      assert(missing.isEmpty, s"trial=$trial k=$k missing=$missing")
      assert(cand.size <= k)
    }
  }
}
