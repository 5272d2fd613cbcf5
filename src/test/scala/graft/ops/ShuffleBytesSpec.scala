package graft.ops

import graft.SparkSpec
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Efficiency-regression harness: measures ACTUAL shuffle traffic via
  * a task-metrics listener. The fact table at sf0.001 is ~6k lineitem
  * rows / ~100 KB; partial aggregation and broadcast joins must keep
  * the wire traffic group-sized (KBs), so a generous ceiling still
  * catches a regression that shuffles fact-table rows (which would be
  * 100s of KB here and TBs at production scale).
  */
class ShuffleBytesSpec extends SparkSpec {

  private def shuffleBytes(body: => Unit): Long = {
    val total = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) total.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      // listener events are async: give the bus a moment to drain
      // (local mode delivers within milliseconds; poll generously)
      var waited = 0
      while (total.get() == 0 && waited < 2000) {
        Thread.sleep(100); waited += 100
      }
      Thread.sleep(300)
    } finally spark.sparkContext.removeSparkListener(listener)
    total.get()
  }

  test("q01 full-scan aggregate shuffles only group-sized partials") {
    val bytes = shuffleBytes {
      Relational.q01.build(spark, sfDir).collect()
    }
    // ~6 groups x 4 partitions of partial rows + the sort exchange:
    // a few KB. 64 KB flags a plan that shuffles fact rows.
    assert(bytes > 0, "expected at least the aggregate exchange")
    assert(bytes < 64 * 1024, s"q01 shuffled $bytes bytes")
  }

  test("q05 star join shuffles no fact rows (broadcast dims + partial agg)") {
    val bytes = shuffleBytes {
      Relational.q05.build(spark, sfDir).collect()
    }
    assert(bytes < 64 * 1024, s"q05 shuffled $bytes bytes")
  }

  test("q86 repetition metrics shuffle only the final sort (narrow per-doc math)") {
    val bytes = shuffleBytes {
      TextAnalytics.q86.build(spark, sfDir).collect()
    }
    // per-doc arithmetic is narrow; the only exchange is the ORDER BY
    // over ~100 result rows (plus range-partitioning sampling)
    assert(bytes < 128 * 1024, s"q86 shuffled $bytes bytes")
  }

  test("q147 lexical diversity shuffles only the output sort (array-local folds)") {
    val bytes = shuffleBytes {
      TextAnalytics.q147.build(spark, sfDir).collect()
    }
    // Σc² and the type count are array-local per doc — the ONLY
    // exchange is the ORDER BY over result rows (plus its range
    // sampling). A corpus-sized exchange here means someone rewrote
    // the fold as explode+groupBy.
    assert(bytes < 128 * 1024, s"q147 shuffled $bytes bytes")
  }

  test("q149 SQ8 encode is narrow: only the dim-bounds aggregate and output sort shuffle") {
    val bytes = shuffleBytes {
      Similarity.q149.build(spark, sfDir).collect()
    }
    // bounds job: 64 dims x partitions of (dim, min, max) partials;
    // encode: pure map with literal-array bounds; output sort over
    // vector-count rows. The embedding payloads must never shuffle —
    // at 100 TB the corpus side of SQ8 stays where it is.
    assert(bytes > 0, "expected the dim-bounds exchange")
    assert(bytes < 256 * 1024, s"q149 shuffled $bytes bytes")
  }

  test("q158 calibration audit shuffles only 10-bucket partials (score+label fused in one pass)") {
    val bytes = shuffleBytes {
      TextAnalytics.q158.build(spark, sfDir).collect()
    }
    // one partial+final aggregate to <= 10 (bucket, n, n_pos) rows per
    // partition plus the bucket-ordered sort; corpus text/token data
    // must never cross the wire
    assert(bytes > 0, "expected the bucket aggregate exchange")
    assert(bytes < 64 * 1024, s"q158 shuffled $bytes bytes")
  }

  test("q159 memorization risk ships hash+position rows, never window text") {
    val bytes = shuffleBytes {
      CurationOps.q159.build(spark, sfDir).collect()
    }
    // the one content-keyed exchange carries (g: i64, doc_id, start)
    // per window occurrence (~3.5k windows at sf0.001 -> low 100s of
    // KB with row overhead); shipping the joined 4-token window
    // STRINGS instead would multiply this several-fold — the ceiling
    // is set between the two
    assert(bytes > 0, "expected the window-hash exchange")
    assert(bytes < 512 * 1024, s"q159 shuffled $bytes bytes")
  }

  test("connectedComponents rounds shuffle label-sized rows, not edge payloads") {
    import spark.implicits._
    // 200 vertices, ~400 edges of (long, long): label frames are
    // ~vertex-count rows per round; a regression that shuffles
    // edge x label blowups or materialized payloads would be MBs
    val pairs = (0L until 199L).map(i => (i, i + 1)) ++
      (0L until 100L).map(i => (i * 2, i * 2 + 1))
    // localEdgeLimit=0: gate the DISTRIBUTED loop's wire traffic (the
    // default would take the driver union-find path at this size)
    val bytes = shuffleBytes {
      Dedup.connectedComponents(pairs.toDF("a", "b"), localEdgeLimit = 0L).collect()
    }
    assert(bytes > 0)
    assert(bytes < 2 * 1024 * 1024, s"components shuffled $bytes bytes")
  }

  test("dedupAgainstHistory shuffles only the suspect sliver, not the history") {
    import spark.implicits._
    val history = (0L until 2000L).map(i => (i, s"hist $i")).toDF("doc_id", "text")
    // 20 dups in 1000 incoming: the exact-verify join's left side is
    // |dups| + fpp-sized, so wire traffic must be sliver-scale even
    // though history is 2000 rows (bloom build is treeAggregate-only)
    val incoming = ((1980L until 2000L) ++ (10000L until 10980L))
      .map(i => (i, s"inc $i")).toDF("doc_id", "text")
    val bytes = shuffleBytes {
      Dedup.dedupAgainstHistory(incoming, history, "doc_id",
        expectedItems = 2000L, fpp = 0.01).collect()
    }
    // floor guards a probe that silently matches nothing (zero shuffle
    // would mean the suspect-key distinct never ran on real suspects)
    assert(bytes > 0, "expected the sliver-sized suspect-key exchange")
    assert(bytes < 64 * 1024, s"bloom dedup shuffled $bytes bytes")
  }

  test("nearest-center assignment shuffles nothing at all") {
    val emb = Tables.embeddings(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("vec_id").as("id"),
        org.apache.spark.sql.functions.col("embedding").cast("array<double>").as("vec"))
    val centers = Array.tabulate(4, 8)((i, j) => (i * 8 + j + 1).toDouble)
    val bytes = shuffleBytes {
      graft.cluster.KMeansAssign.assignMap(emb, centers).collect()
    }
    assert(bytes == 0, s"assignment shuffled $bytes bytes")
  }
}
