package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {

  test("compact rewrites a many-small-files directory into few right-sized files") {
    val in = java.nio.file.Files.createTempDirectory("graft-small").toString
    // simulate a micro-batch writer: 64 tiny files
    graft.ops.Tables.lineitem(spark, sfDir)
      .repartition(64)
      .write.mode("overwrite").parquet(in)
    val inFiles = new java.io.File(in).listFiles()
      .count(_.getName.startsWith("part-"))
    assert(inFiles == 64)

    val out = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val outFiles = Sinks.compact(spark, in, out, targetBytes = 512L * 1024)
    assert(outFiles < 8, s"expected few output files, got $outFiles")
    // row-level equality survives the rewrite
    assert(spark.read.parquet(out).count() ==
      graft.ops.Tables.lineitem(spark, sfDir).count())
  }
}
