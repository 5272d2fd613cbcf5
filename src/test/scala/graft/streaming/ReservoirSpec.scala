package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class RDoc(doc_id: Long, source: String, text: String)

/** Stream == batch identity for the weighted reservoir: the A-ES
  * top-k is mergeable, so folding per-micro-batch top-ks must land on
  * exactly the batch sampler's corpus answer — for ANY split of the
  * corpus into micro-batches. Plus replay idempotence (the crash
  * contract) and the empty-reservoir/short-corpus edges.
  */
class ReservoirSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(31L)
  private val corpus: Seq[RDoc] = (1L to 240L).map { id =>
    val n = if (id % 7 == 0) 0 else 1 + rnd.nextInt(60)
    RDoc(id, s"s${id % 3}", Seq.fill(n)("tok" + rnd.nextInt(40)).mkString(" "))
  }

  private def batchAnswer(k: Int): Seq[(Long, Double)] =
    graft.ops.CurationOps.weightedSample(corpus.toDF(), k)
      .select(col("doc_id"), col("skey")).as[(Long, Double)].collect().toSeq

  test("reservoir after a random micro-batch split equals the batch sampler exactly") {
    implicit val sq = spark.sqlContext
    val k = 40
    val dir = java.nio.file.Files.createTempDirectory("res").toString + "/r"
    val ckpt = java.nio.file.Files.createTempDirectory("res-ckpt").toString
    val mem = MemoryStream[RDoc]
    val q = Reservoir.maintainWeightedReservoir(mem.toDF(), dir, ckpt, k)
    try {
      // random split into 2-6 uneven micro-batches
      val shuffled = rnd.shuffle(corpus)
      var rest = shuffled
      while (rest.nonEmpty) {
        val take = math.min(rest.length, 1 + rnd.nextInt(100))
        mem.addData(rest.take(take): _*)
        q.processAllAvailable()
        rest = rest.drop(take)
      }
      val got = Reservoir.readReservoir(spark, dir).get
        .orderBy(col("skey").desc, col("doc_id"))
        .select(col("doc_id"), col("skey")).as[(Long, Double)].collect().toSeq
      assert(got == batchAnswer(k))
    } finally q.stop()
  }

  test("replaying a batch is a no-op; re-ingested docs never duplicate") {
    val k = 25
    val dir = java.nio.file.Files.createTempDirectory("res2").toString + "/r"
    val (a, b) = corpus.splitAt(150)
    Reservoir.reservoirBatch(a.toDF(), dir, k)
    Reservoir.reservoirBatch(b.toDF(), dir, k)
    val before = Reservoir.readReservoir(spark, dir).get
      .orderBy(col("skey").desc, col("doc_id")).collect().toSeq
    // crash-replay of the second batch, then a full re-ingest of the first
    Reservoir.reservoirBatch(b.toDF(), dir, k)
    Reservoir.reservoirBatch(a.toDF(), dir, k)
    val after = Reservoir.readReservoir(spark, dir).get
      .orderBy(col("skey").desc, col("doc_id")).collect().toSeq
    assert(after == before)
    assert(after.map(_.getLong(0)).distinct.size == after.size)
    assert(after.size == k)
  }

  test("re-ingested doc with CHANGED text resolves to the max-skey version, deterministically") {
    val k = 100 // > corpus slice, so the conflicted doc is always retained
    val dir = java.nio.file.Files.createTempDirectory("res4").toString + "/r"
    Reservoir.reservoirBatch(corpus.take(60).toDF(), dir, k)
    // re-crawl doc 3 with different text -> different n_tokens/skey
    val recrawl = RDoc(3L, "s0", "one two three four five")
    Reservoir.reservoirBatch(Seq(recrawl).toDF(), dir, k)
    val rows = Reservoir.readReservoir(spark, dir).get
      .select(col("doc_id"), col("skey")).as[(Long, Double)].collect().toMap
    // expected winner: max skey among the two versions of doc 3
    val versions = graft.ops.CurationOps
      .weightedSample(Seq(corpus(2), recrawl).toDF(), 10)
      .select(col("doc_id"), col("skey")).as[(Long, Double)].collect()
      .map(_._2)
    assert(rows.contains(3L), "k exceeds corpus size, doc 3 must be present")
    assert(rows(3L) == versions.max,
      s"conflicting re-ingest must keep the max-skey version: ${rows(3L)} vs ${versions.toList}")
    // determinism: replay in the opposite order lands on the same reservoir
    val dir2 = java.nio.file.Files.createTempDirectory("res5").toString + "/r"
    Reservoir.reservoirBatch(Seq(recrawl).toDF(), dir2, k)
    Reservoir.reservoirBatch(corpus.take(60).toDF(), dir2, k)
    val rows2 = Reservoir.readReservoir(spark, dir2).get
      .select(col("doc_id"), col("skey")).as[(Long, Double)].collect().toMap
    assert(rows == rows2)
  }

  test("crash between backup-rename and swap: readReservoir serves the backup in place") {
    val k = 25
    val base = java.nio.file.Files.createTempDirectory("res6").toString
    val dir = base + "/r"
    Reservoir.reservoirBatch(corpus.take(80).toDF(), dir, k)
    val before = Reservoir.readReservoir(spark, dir).get
      .orderBy(col("skey").desc, col("doc_id")).collect().toSeq
    // simulate the crash window: root renamed aside, swap never landed
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + "_old"))
    val restored = Reservoir.readReservoir(spark, dir).get
      .orderBy(col("skey").desc, col("doc_id")).collect().toSeq
    assert(restored == before)
    // and the next fold proceeds normally from the restored state
    Reservoir.reservoirBatch(corpus.drop(80).toDF(), dir, k)
    assert(Reservoir.readReservoir(spark, dir).get.count() == k)
  }

  test("corpus smaller than k: reservoir holds every weighted doc, no padding") {
    val k = 1000
    val dir = java.nio.file.Files.createTempDirectory("res3").toString + "/r"
    Reservoir.reservoirBatch(corpus.take(30).toDF(), dir, k)
    val rows = Reservoir.readReservoir(spark, dir).get.collect()
    val expected = corpus.take(30).count(d => d.text.trim.nonEmpty)
    assert(rows.length == expected)
    assert(Reservoir.readReservoir(spark, dir + "-missing").isEmpty)
  }
}
