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
  // batch 3: TAKEDOWN of 3 (leaves {1,2,3,6}) and of loner 5 (never
  //          in the component view); 8 taken down AND re-upserted in
  //          the same batch (upsert wins — 8 stays paired with 4)
  private val t1 = "alpha beta gamma delta epsilon zeta"
  private val t2 = "one two three four five six seven"
  private val b0 = Seq(ClusterDoc(1, t1), ClusterDoc(2, t1),
    ClusterDoc(3, t2), ClusterDoc(4, t2),
    ClusterDoc(5, "loner text matching nothing else"))
  private val b1 = Seq(ClusterDoc(6, t1),
    ClusterDoc(7, "another unmatched island of words"))
  private val b2 = Seq(ClusterDoc(3, t1), ClusterDoc(8, t2))
  private val b3 = Seq(ClusterDoc(3, null), ClusterDoc(5, null),
    ClusterDoc(8, null), ClusterDoc(8, t2))
  // batch 4: PURE-takedown batch (no upserts at all): removing 4
  //          strikes the {4,8} edge, so 8 — never itself taken down —
  //          drops out of the component view too (no surviving edge)
  private val b4 = Seq(ClusterDoc(4, null))

  /** The batch kernel over the delta-wins prefix corpus: later batches
    * win re-ingested ids, in-batch winner is the row-min non-null
    * text, and an all-null batch entry REMOVES the id (takedown).
    */
  private def kernel(upTo: Int): Set[(Long, Long)] = {
    val m = scala.collection.mutable.Map[Long, String]()
    Seq(b0, b1, b2, b3, b4).take(upTo + 1).foreach { b =>
      b.groupBy(_.doc_id).foreach { case (id, rows) =>
        val nn = rows.map(_.text).filter(_ != null)
        if (nn.isEmpty) m.remove(id) else m(id) = nn.min
      }
    }
    val latest = m.toSeq
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
      Seq(b0, b1, b2, b3, b4).zipWithIndex.map { case (b, k) =>
        mem.addData(b: _*)
        q.processAllAvailable()
        val v = view(compD)
        assert(v == kernel(k), s"batch $k: streamed $v != kernel ${kernel(k)}")
        v
      }
    } finally q.stop()
    // semantics spot-checks on the final state: 3's takedown removed
    // it from its cluster; the same-batch takedown+re-upsert of 8
    // resolved to the upsert — and then b4's pure-takedown batch
    // removed 4, dropping 8 (no surviving edge) with it
    val byComp = views.last.groupBy(_._2).values.map(_.map(_._1)).toSet
    assert(byComp == Set(Set(1L, 2L, 6L)),
      s"final clusters wrong: $byComp")

    // replay of the last batch is byte-identical (scoped reads exclude
    // the batch's own partitions)
    ClusterStream.processBatch(b4.toDF(), 4L, sigD, pairD, compD)
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
    ClusterStream.processBatch(b4.toDF(), 4L, sigD, pairD, compD)
    assert(view(compD) == views.last, "replay after compaction diverged")
    // the taken-down ids are invisible to the signature READ view
    // after compaction: keepLatest keeps only the MAX partition (b4);
    // b3 is folded, and the fold's mh-isNotNull filter GC's the 3/5
    // tombstones together with every older row they shadowed — the
    // docs are simply absent, not shadowed; live signatures survive
    val liveSigDocs = {
      val raw = spark.read.parquet(sigD)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("batch_id").cast("long").desc)
      raw.withColumn("__rn", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("__rn") === 1).filter(col("mh").isNotNull)
        .select(col("doc_id")).as[Long].collect().toSet
    }
    assert(!liveSigDocs.contains(3L) && !liveSigDocs.contains(5L) &&
      !liveSigDocs.contains(4L),
      s"taken-down signatures still live after compaction: $liveSigDocs")
    // 8 was taken down only as part of its same-batch re-upsert: its
    // SIGNATURE survives (it is still a live doc) even though it left
    // the component view when 4 vanished
    assert(liveSigDocs.contains(8L) && liveSigDocs.contains(1L),
      s"live signatures lost by compaction: $liveSigDocs")

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
