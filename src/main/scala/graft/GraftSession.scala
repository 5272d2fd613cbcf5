package graft

import org.apache.spark.sql.SparkSession

/** One-stop session factory for library users: graft functions
  * registered, recommended local-mode configs applied. On a cluster,
  * prefer `spark.sql.extensions=graft.functions.GraftExtensions` in
  * spark-defaults and tune partitions to the executor count.
  */
object GraftSession {
  def builder(master: String = "local[*]",
              shufflePartitions: Int = Runtime.getRuntime.availableProcessors())
      : SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(new functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def getOrCreate(): SparkSession = {
    val s = builder().getOrCreate()
    // cover the case where an existing session was returned
    functions.functions.register(s)
    s
  }
}
