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
}
