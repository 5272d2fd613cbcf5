package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class ClusterDoc(doc_id: Long, text: String)

/** Streaming cluster maintenance: the component view after every
  * micro-batch must BIT-EXACTLY equal the batch near-dup pipeline
  * (minhashSignatures → verifiedPairs → connectedComponents) over the
  * prefix corpus with later batches winning re-ingested doc_ids —
  * through new-doc joins, cluster-leaving re-ingests, replay,
  * compaction of all three stores, and a leftover superseded
  * partition.
  */
class ClusterStreamSpec extends SparkSpec {
  import spark.implicits._

  // batch 0: clusters {1,2} and {3,4}, loner 5
  // batch 1: 6 joins {1,2}; 7 is new and alone
  // batch 2: RE-INGEST 3 with cluster-1 text (bridges what remains of
  //          its old cluster? no — 3 leaves {3,4}, joins {1,2,6});
  //          8 duplicates 4, rebuilding a pair for it
  private val t1 = "alpha beta gamma delta epsilon zeta"
  private val t2 = "one two three four five six seven"
  private val b0 = Seq(ClusterDoc(1, t1), ClusterDoc(2, t1),
    ClusterDoc(3, t2), ClusterDoc(4, t2),
    ClusterDoc(5, "loner text matching nothing else"))
  private val b1 = Seq(ClusterDoc(6, t1),
    ClusterDoc(7, "another unmatched island of words"))
  private val b2 = Seq(ClusterDoc(3, t1), ClusterDoc(8, t2))

  /** The batch kernel over the delta-wins prefix corpus. */
  private def kernel(upTo: Int): Set[(Long, Long)] = {
    val latest = Seq(b0, b1, b2).take(upTo + 1).zipWithIndex
      .flatMap { case (b, i) => b.map(d => (d.doc_id, d.text, i)) }
      .groupBy(_._1).map { case (id, vs) =>
        val w = vs.maxBy(_._3); (id, w._2)
      }.toSeq
    val sigs = graft.ops.Dedup.minhashSignatures(
      latest.toDF("doc_id", "text")).localCheckpoint(false)
    graft.ops.Dedup.connectedComponents(
        graft.ops.Dedup.verifiedPairs(sigs))
      .select(col("v"), col("component"))
      .as[(Long, Long)].collect().toSet
  }

  private def view(compDir: String): Set[(Long, Long)] =
    ClusterStream.readComponents(spark, compDir)
      .as[(Long, Long)].collect().toSet

  test("streamed components == batch pipeline over the delta-wins prefix; replay, compaction, leftover") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("cluster-stream").toString
    val (sigD, pairD, compD) = (s"$dir/sig", s"$dir/pairs", s"$dir/comp")
    val mem = MemoryStream[ClusterDoc]
    val q = ClusterStream.maintain(mem.toDF(), sigD, pairD, compD, s"$dir/ckpt")
    val views = try {
      Seq(b0, b1, b2).zipWithIndex.map { case (b, k) =>
        mem.addData(b: _*)
        q.processAllAvailable()
        val v = view(compD)
        assert(v == kernel(k), s"batch $k: streamed $v != kernel ${kernel(k)}")
        v
      }
    } finally q.stop()
    // semantics spot-checks on the final state
    val byComp = views.last.groupBy(_._2).values.map(_.map(_._1)).toSet
    assert(byComp == Set(Set(1L, 2L, 3L, 6L), Set(4L, 8L)),
      s"final clusters wrong: $byComp")

    // replay of the last batch is byte-identical (scoped reads exclude
    // the batch's own partitions)
    ClusterStream.processBatch(b2.toDF(), 2L, sigD, pairD, compD)
    assert(view(compD) == views.last, "replay diverged")
    val pairsBefore = ClusterStream.readPairs(spark, pairD)
      .as[(Long, Long)].collect().toSet

    // compaction of all three stores preserves every view and replay
    val snap1 = spark.read.parquet(s"$compD/batch_id=1")
      .select(col("v"), col("component")).as[(Long, Long)].collect().toSeq
    ClusterStream.compactSigs(spark, sigD)
    ClusterStream.compactPairs(spark, pairD)
    ClusterStream.compactComponents(spark, compD)
    assert(view(compD) == views.last, "compaction changed the component view")
    assert(ClusterStream.readPairs(spark, pairD)
      .as[(Long, Long)].collect().toSet == pairsBefore,
      "compaction changed the edge store")
    ClusterStream.processBatch(b2.toDF(), 2L, sigD, pairD, compD)
    assert(view(compD) == views.last, "replay after compaction diverged")

    // leftover superseded snapshot (the compaction delete-crash
    // window): an older comp snapshot re-appearing must change nothing
    snap1.toDF("v", "component").write.mode("overwrite")
      .parquet(s"$compD/batch_id=1")
    assert(view(compD) == views.last,
      "leftover superseded snapshot changed the view")
  }

  test("in-batch duplicate delivery of one doc_id resolves deterministically") {
    val dir = java.nio.file.Files.createTempDirectory("cluster-dup").toString
    val (sigD, pairD, compD) = (s"$dir/sig", s"$dir/pairs", s"$dir/comp")
    // doc 9 delivered twice with different texts: row-min text wins
    // ("aaa..." < t1); the winner pairs with 1, the loser would not
    val batch = Seq(ClusterDoc(1, t1), ClusterDoc(9, t1),
      ClusterDoc(9, "zzz unmatched text way out there"))
    ClusterStream.processBatch(batch.toDF(), 0L, sigD, pairD, compD)
    val v = view(compD).groupBy(_._2).values.map(_.map(_._1)).toSet
    assert(v == Set(Set(1L, 9L)),
      s"row-min winner must pair 9 with 1: $v")
  }
}
