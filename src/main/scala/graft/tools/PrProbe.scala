package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only phase probe for q131: times the edge build, each PageRank
  * iteration's materialization, and the final top-k separately, so a
  * total-time regression is attributable to a phase instead of a rerun
  * guess. Not part of the bench or the registry.
  */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("PRPROBE_AQE", "true"))
      .config("spark.sql.codegen.wholeStage",
        sys.env.getOrElse("PRPROBE_WSCG", "true"))
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("PRPROBE_BYPASS", "200"))
      .config("spark.local.dir",
        sys.env.getOrElse("PRPROBE_LOCALDIR", "/tmp"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // bisection: does merely CONSTRUCTING the full registry (class-load
    // of every ops object) poison subsequent runs?
    if (sys.env.contains("PRPROBE_TOUCH_REGISTRY"))
      println(s"[prprobe] registry size = ${graft.SparkEntry.queries.size}")
    import graft.ops.{Graph, Tables}
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prprobe] $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    (1 to reps).foreach { rep =>
      println(s"[prprobe] --- rep $rep ---")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
      val repT0 = System.nanoTime()
      val edges = Graph.tradeEdges(Tables.orders(spark, sfDir), Tables.lineitem(spark, sfDir))
      val eRaw = edges.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val out = eRaw.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = t("edge+degree cache")(out.count())
      println(s"[prprobe] nodes=$n")
      val nodes = out.select(col("src").as("node"))
      var ranks = nodes.select(col("node"), lit(Graph.RankScale).as("rank"))
      for (i <- 1 to 5) {
        val rankDeg = out
          .join(broadcast(ranks.withColumnRenamed("node", "src")), "src")
          .select(col("src"), expr("rank div outdeg").as("c"))
        val contrib = eRaw.join(broadcast(rankDeg), "src")
          .select(col("dst").as("node"), col("c"))
          .groupBy(col("node")).agg(sum(col("c")).as("insum"))
        val next = nodes.join(broadcast(contrib), Seq("node"), "left")
          .select(col("node"),
            (lit(Graph.Teleport) +
              expr("17 * (coalesce(insum, 0L) div 20) + (17 * (coalesce(insum, 0L) % 20)) div 20"))
              .as("rank"))
        // the localCheckpoint CALL runs AQE stage materialization (real
        // jobs) before returning — time it apart from the final count;
        // split planning (executedPlan) from the rdd+checkpoint step,
        // and record process-CPU alongside wall to spot idle waits
        val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
          .asInstanceOf[com.sun.management.OperatingSystemMXBean]
        val c0 = os.getProcessCpuTime
        t(s"iter $i plan")(next.queryExecution.executedPlan)
        val c1 = os.getProcessCpuTime
        ranks = t(s"iter $i construct")(next.localCheckpoint(eager = false))
        val c2 = os.getProcessCpuTime
        t(s"iter $i materialize")(ranks.queryExecution.toRdd.count())
        println(f"[prprobe] iter $i cpu plan=${(c1 - c0) / 1e9}%.2f construct=${(c2 - c1) / 1e9}%.2f")
      }
      t("topk")(ranks.orderBy(col("rank").desc, col("node")).limit(25)
        .queryExecution.toRdd.count())
      println(f"[prprobe] rep total            ${(System.nanoTime() - repT0) / 1e9}%7.3f s")
    }
    spark.stop()
  }
}
