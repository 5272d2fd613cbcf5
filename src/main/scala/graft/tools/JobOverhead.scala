package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: measure raw per-job scheduling overhead on this box — a
  * trivial 32-task job repeated N times. q131 runs ~15-20 jobs per
  * rep (AQE stage materialization x 5 iterations), so per-job
  * overhead multiplies into its recorded time like no other query.
  */
object JobOverhead {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 60
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext
    val rdd = sc.parallelize(1 to 32, 32)
    rdd.count() // warm
    val ts = (1 to n).map { _ =>
      val t0 = System.nanoTime()
      rdd.count()
      (System.nanoTime() - t0) / 1e6
    }
    val sorted = ts.sorted
    println(f"[jobovh] n=$n min=${sorted.head}%.1f ms p50=${sorted(n / 2)}%.1f ms " +
      f"p90=${sorted(n * 9 / 10)}%.1f ms max=${sorted.last}%.1f ms")
    spark.stop()
  }
}
