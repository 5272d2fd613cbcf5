package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev A/B for the q136 exchange-key decision: time the n-gram novelty
  * kernel with RAW-STRING shingle keys (the pre-round-8 shape) against
  * the shipped xxhash64-keyed kernel, printing wall time and total
  * shuffle-write bytes for each. Evidence behind the PLANS.md "q136 at
  * 100x" entry.
  *
  * Usage: runMain graft.tools.NoveltyAb [corpusDir]
  */
object NoveltyAb {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shufW = new AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          shufW.addAndGet(e.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    val docs = spark.read.parquet(dir + "/documents.parquet")
      .select(col("doc_id"), col("text"))

    // string-keyed variant: identical logic, the exchange ships the
    // raw -free space-joined 8-gram
    def stringKeyed() = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("sh"))
      docs
        .select(col("doc_id"),
          explode(array_distinct(graft.ops.Dedup.shingles(col("text"), 8))).as("sh"))
        .withColumn("first_doc", min(col("doc_id")).over(w))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("bigint").as("n_shingles"),
          sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
            .cast("bigint").as("n_novel"))
    }
    def hashKeyed() = graft.ops.CorpusDrift.ngramNovelty(docs)

    def run(label: String, f: () => org.apache.spark.sql.DataFrame): Unit = {
      f().queryExecution.toRdd.count() // warmup
      Thread.sleep(500) // drain warmup task-end events BEFORE the reset:
      // the listener bus is async, so a late warmup event after set(0)
      // would leak into the measured run's byte count
      val t0 = System.nanoTime(); shufW.set(0)
      f().queryExecution.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9 // BEFORE the drain sleep
      Thread.sleep(500) // let straggler task-end events drain
      println(f"[ab] $label%-12s wall=$wall%6.2fs " +
        f"shufW=${shufW.get() / 1048576.0}%8.1f MiB")
    }
    run("string-key", () => stringKeyed())
    run("hash-key", () => hashKeyed())
    spark.stop()
  }
}
