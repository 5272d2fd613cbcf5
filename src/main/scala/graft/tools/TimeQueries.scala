package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev micro-bench: time named SparkEntry queries repeatedly under the
  * same session config as graft.Bench, to separate real plan
  * regressions from run-to-run variance (GC, page cache, JIT).
  *
  * Usage: runMain graft.tools.TimeQueries [<reps>] <qprefix> [<qprefix>...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS — both
  * defaulted IDENTICALLY to graft.Bench, so timings explain bench runs.
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    // leading integer = reps; a non-numeric first arg is a query prefix
    val reps = args.headOption.flatMap(a => scala.util.Try(a.toInt).toOption)
      .getOrElse(3)
    val prefixes =
      (if (args.headOption.exists(a => scala.util.Try(a.toInt).isSuccess))
        args.drop(1) else args).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val picked = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.isEmpty || prefixes.exists(n.startsWith) }
    // warmup (codegen + JIT) on the small SFs, same as Bench
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { wdir =>
      picked.foreach { case (_, fn) =>
        try fn(spark, wdir).queryExecution.toRdd.count()
        catch { case _: Throwable => () }
      }
    }
    picked.foreach { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        // toRdd: execute the query's own plan (count() would let column
        // pruning delete operators that only feed non-key aggregates)
        fn(spark, sfDir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[time] $name%-28s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
