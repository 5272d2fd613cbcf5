package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Bpe

/** Measures what BPE merge batching buys above the driver-training
  * threshold: trains on a synthetic word-type table LARGER than
  * Bpe.train's 128k-type driver cutoff, once with batchSize=1 (the
  * pre-batching one-Spark-job-per-merge behavior) and once batched,
  * printing wall time and pair-count rounds for each. Also reports the
  * batch profile on real corpus text (documents table), where early
  * letter-level merges conflict and the tail batches well.
  *
  * Usage: runMain graft.tools.BpePerf [sfDir] [nTypes] [nMerges]
  */
object BpePerf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val nTypes = if (args.length > 1) args(1).toInt else 160000
    val nMerges = if (args.length > 2) args(2).toInt else 48
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic >128k-type table: distinct words from a base-20
    // consonant alphabet (id encoding ⇒ all distinct), Zipf-ish freqs
    val alpha = "bcdfghjklmnpqrstvwxz"
    val enc = udf { (id: Long) =>
      val sb = new StringBuilder
      var v = id + 400L // ≥3 letters so pair structure is non-trivial
      while (v > 0) { sb.append(alpha((v % 20).toInt)); v /= 20 }
      sb.toString
    }
    val words = spark.range(nTypes)
      .select(enc(col("id")).as("word"),
        (floor(lit(1000000L) / (col("id") + 1L)) + 1L).cast("long").as("freq"))
      .localCheckpoint(true)
    require(words.count() == nTypes)

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    // warmup (codegen, shuffle infra)
    Bpe.train(words, nMerges = 2, minCount = 1, driverMaxTypes = 0L)

    val (seqMerges, seqSec) =
      time(Bpe.train(words, nMerges, minCount = 1, driverMaxTypes = 0L, batchSize = 1))
    val seqRounds = Bpe.lastDistributedRounds
    val (batMerges, batSec) =
      time(Bpe.train(words, nMerges, minCount = 1, driverMaxTypes = 0L, batchSize = 64))
    val batRounds = Bpe.lastDistributedRounds
    require(seqMerges == batMerges, "batched diverged from sequential")

    // real-text batch profile: corpus word types, batched vs not
    val corpus = Bpe.wordFreqs(graft.ops.Tables.documents(spark, sfDir))
      .localCheckpoint(true)
    val (_, corpSeqSec) =
      time(Bpe.train(corpus, nMerges, driverMaxTypes = 0L, batchSize = 1))
    val corpSeqRounds = Bpe.lastDistributedRounds
    val (_, corpBatSec) =
      time(Bpe.train(corpus, nMerges, driverMaxTypes = 0L, batchSize = 64))
    val corpBatRounds = Bpe.lastDistributedRounds

    println(s"""{"tool":"BpePerf","nTypes":$nTypes,"nMerges":$nMerges,""" +
      f""""synthetic":{"seq_sec":$seqSec%.2f,"seq_rounds":$seqRounds,""" +
      f""""batched_sec":$batSec%.2f,"batched_rounds":$batRounds},""" +
      f""""corpus":{"seq_sec":$corpSeqSec%.2f,"seq_rounds":$corpSeqRounds,""" +
      f""""batched_sec":$corpBatSec%.2f,"batched_rounds":$corpBatRounds}}""")
    spark.stop()
  }
}
