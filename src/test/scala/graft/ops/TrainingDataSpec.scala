package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics of the curation additions (q97-q99) beyond the oracle
  * hash-check: semantic-dedup drop/keep invariants, quota-cap bounds
  * and top-quality selection, and split stability properties.
  */
class TrainingDataSpec extends SparkSpec {

  test("q97 semantic dedup: rosters partition clusters and every drop has a lower-id witness") {
    import graft.functions.functions.cosine_similarity
    val out = TrainingData.q97.build(spark, sfDir).collect()
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("vec"))
    val centers = emb.filter(col("id") < 8)
      .select(col("id").cast("int").as("center_id"), col("vec").as("cvec"))
    val assigned = graft.cluster.KMeansAssign.assign(emb, centers)
      .select(col("id"), col("center_id")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // survivors + n_dropped account for every assigned vector, per cluster
    val byCenter = assigned.groupBy(_._2).view.mapValues(_.size).toMap
    out.foreach { r =>
      val (cid, nDocs, nDropped) = (r.getInt(0), r.getLong(1), r.getLong(2))
      val survivors = r.getString(3).split(",").filter(_.nonEmpty)
      assert(nDocs == byCenter(cid), s"cluster $cid size")
      assert(survivors.length + nDropped == nDocs, s"cluster $cid partition")
    }
    // every dropped vector has a similar lower-id vector in its cluster
    val surviving = out.flatMap(_.getString(3).split(",").filter(_.nonEmpty))
      .map(_.toLong).toSet
    val droppedIds = assigned.keySet -- surviving
    val vecs = emb.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    droppedIds.foreach { d =>
      val witnesses = assigned.collect {
        case (id, c) if c == assigned(d) && id < d &&
          cos(vecs(id), vecs(d)) >= 0.35 => id
      }
      assert(witnesses.nonEmpty, s"dropped $d has no lower-id similar witness")
    }
  }

  /** The production SemDeDup entry ([[TrainingData.semanticDedup]])
    * learns its own centers (Lloyd) instead of q97's fixture-pinned
    * ones. The contract worth gating is the survivor invariant: after
    * the keep-lowest pass, NO surviving pair within a cluster is
    * cosine-similar at/above the threshold (if survivors x < y were
    * similar, x would have dropped y), plus determinism — Lloyd init
    * is first-k, so two runs must agree exactly.
    */
  test("semanticDedup library path: survivor pairs below threshold within every cluster; deterministic") {
    val thr = 0.35
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("vec"))
      .filter(col("id") < 200)
    def run() = TrainingData.semanticDedup(emb, k = 6, threshold = thr,
        lloydIters = 3)
      .select(col("id"), col("center_id")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toSeq.sorted
    val survivors = run()
    assert(survivors.nonEmpty, "semantic dedup dropped everything")
    assert(survivors.size < 200, "semantic dedup dropped nothing on a corpus with near-dup embeddings")
    val vecs = emb.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    survivors.groupBy(_._2).values.foreach { members =>
      val ids = members.map(_._1).sorted
      for (i <- ids.indices; j <- i + 1 until ids.length)
        assert(cos(vecs(ids(i)), vecs(ids(j))) < thr,
          s"surviving pair (${ids(i)}, ${ids(j)}) above threshold in one cluster")
    }
    assert(run() == survivors, "semanticDedup is nondeterministic")
  }

  test("q98 quota cap: never more than 15 per source, and they are that source's best") {
    val kept = TrainingData.q98.build(spark, sfDir).collect()
    val perSource = kept.groupBy(_.getString(0))
    perSource.foreach { case (src, rows) =>
      assert(rows.length <= 15, s"source $src over quota")
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to rows.length), s"$src ranks")
    }
    // kept set = top-15 by (qscore desc, doc_id) of the full quality table
    val full = TextAnalytics.qualityBase(Tables.documents(spark, sfDir))
      .select(col("source"), col("doc_id"), col("qscore")).collect()
      .groupBy(_.getString(0))
    perSource.foreach { case (src, rows) =>
      val expect = full(src).sortBy(r => (-r.getDouble(2), r.getLong(1)))
        .take(15).map(_.getLong(1)).toSet
      assert(rows.map(_.getLong(2)).toSet == expect, s"$src kept set")
    }
  }

  test("q99 split: deterministic, content-keyed, ~80/10/10") {
    val a = TrainingData.q99.build(spark, sfDir).collect()
    val b = TrainingData.q99.build(spark, sfDir).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq, "nondeterministic output")
    val bySplit = a.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    val n = a.length.toDouble
    assert(bySplit("train") / n > 0.6 && bySplit("train") / n < 0.95)
    assert(bySplit.getOrElse("val", 0) + bySplit.getOrElse("test", 0) > 0)
    // identical text => identical split (content-keyed, not id-keyed)
    val fpToSplit = a.map(r => r.getLong(1) -> r.getString(2)).distinct
    assert(fpToSplit.map(_._1).distinct.length == fpToSplit.length,
      "same fingerprint mapped to two splits")
  }

  /** q99's exact Karp-Rabin fingerprint + split, replayed in Scala. */
  private def q99Split(text: String): String = {
    val fp = text.foldLeft(0L)((a, c) => (a * 31L + c.toLong) % 1000000007L)
    if (fp % 100 < 80) "train" else if (fp % 100 < 90) "val" else "test"
  }

  test("q155: clusters never straddle splits; singletons split exactly as q99") {
    import spark.implicits._
    val near = "one two three four five six seven eight nine ten"
    val docs = Seq(
      (0L, near),                     // cluster {0,1,2}: high token overlap
      (1L, near + " eleven"),
      (2L, "ten nine eight seven six five four three two one"),
      (3L, "completely unrelated text about something else entirely"),
      (4L, "another standalone document with its own words only"))
      .toDF("doc_id", "text")
    val got = TrainingData.leakageSafeSplit(docs)
      .select("doc_id", "cluster_id", "cluster_size", "split")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    // the near-dup trio lands in ONE cluster with ONE split
    assert(Set(0L, 1L, 2L).map(got(_)._2) == Set(0L), "trio must cluster under min id 0")
    assert(Set(0L, 1L, 2L).map(got(_)._4).size == 1, "cluster split must be unanimous")
    assert(got(0L)._3 == 3L)
    // the cluster's split is the q99 split of the REPRESENTATIVE (doc 0)
    assert(got(0L)._4 == q99Split(near))
    // singletons: own cluster, size 1, and exactly q99's doc-level split
    Seq(3L, 4L).foreach { d =>
      assert(got(d)._2 == d && got(d)._3 == 1L)
      assert(got(d)._4 == q99Split(if (d == 3) "completely unrelated text about something else entirely"
        else "another standalone document with its own words only"))
    }
  }

  test("q155 on the fixture: q99 WOULD leak the big near-dup cluster; q155 does not") {
    import spark.implicits._
    val out = TrainingData.q155.build(spark, sfDir)
      .select("doc_id", "cluster_id", "split")
      .as[(Long, Long, String)].collect()
    // no cluster straddles splits
    val bySplit = out.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    bySplit.foreach { case (cid, splits) =>
      assert(splits.size == 1, s"cluster $cid spans splits $splits")
    }
    // the leak q155 exists to prevent: q99's doc-level split DOES cut at
    // least one multi-member near-dup cluster across train/test|val
    val q99 = TrainingData.q99.build(spark, sfDir)
      .filter(col("doc_id") < 100)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val multi = out.groupBy(_._2).filter(_._2.length > 1)
    assert(multi.nonEmpty, "fixture has no multi-member cluster under doc_id<100")
    val leaked = multi.values.exists(ms => ms.map(m => q99(m._1)).toSet.size > 1)
    assert(leaked,
      "expected q99's independent split to straddle at least one near-dup cluster")
  }
}
