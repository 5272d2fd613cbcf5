package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Dev probe: run one query once (after warmup), print per-stage wall
  * time, task count, GC time, shuffle bytes. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    // toRdd.count() executes the query's own physical plan; a
    // Dataset.count() re-optimizes for the row count alone and can
    // prune whole operators (q136's window + sh exchange) out of the
    // measurement
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { w =>
      fn(spark, w).queryExecution.toRdd.count()
    }
    case class S(var submitted: Long = 0, var completed: Long = 0,
                 var tasks: Int = 0, var gc: Long = 0, var run: Long = 0,
                 var shufR: Long = 0, var shufW: Long = 0, var nm: String = "")
    val stages = mutable.LinkedHashMap[Int, S]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = {
        val s = stages.getOrElseUpdate(e.stageInfo.stageId, S())
        s.submitted = System.currentTimeMillis(); s.nm = e.stageInfo.name.take(60)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val s = stages.getOrElseUpdate(e.stageInfo.stageId, S())
        s.completed = System.currentTimeMillis()
        s.tasks = e.stageInfo.numTasks
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val s = stages.getOrElseUpdate(e.stageId, S())
        if (e.taskMetrics != null) {
          s.gc += e.taskMetrics.jvmGCTime
          s.run += e.taskMetrics.executorRunTime
          s.shufR += e.taskMetrics.shuffleReadMetrics.totalBytesRead
          s.shufW += e.taskMetrics.shuffleWriteMetrics.bytesWritten
        }
      }
    })
    val t0 = System.nanoTime()
    fn(spark, sfDir).queryExecution.toRdd.count()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"[probe] $name total=$total%.2fs")
    stages.toSeq.sortBy(_._1).foreach { case (id, s) =>
      println(f"[probe] stage=$id%3d wall=${(s.completed - s.submitted) / 1e3}%6.2fs tasks=${s.tasks}%3d runSum=${s.run / 1e3}%7.2fs gcSum=${s.gc / 1e3}%6.2fs shufR=${s.shufR}%9d shufW=${s.shufW}%9d ${s.nm}")
    }
    spark.stop()
  }
}
