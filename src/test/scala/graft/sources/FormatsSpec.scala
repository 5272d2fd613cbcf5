package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Interchange-format coverage: CSV and JSON-lines roundtrips preserve
  * values and types; parquet schema evolution merges; a partitioned
  * layout prunes partitions at the scan.
  */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val sample = graft.ops.Tables.orders(spark, sfDir)
    .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    .limit(200)

  test("CSV roundtrip preserves rows and explicit schema") {
    val dir = tmp("graft-csv")
    Sinks.writeCsv(sample, dir)
    val back = Sinks.readCsv(spark, dir, sample.schema)
    assert(back.schema == sample.schema)
    assert(back.orderBy("o_orderkey").collect().toSeq ==
      sample.orderBy("o_orderkey").collect().toSeq)
  }

  test("JSON-lines roundtrip preserves rows and explicit schema") {
    val dir = tmp("graft-jsonl")
    Sinks.writeJsonl(sample, dir)
    val back = Sinks.readJsonl(spark, dir, sample.schema)
    assert(back.orderBy("o_orderkey").collect().toSeq ==
      sample.orderBy("o_orderkey").collect().toSeq)
  }

  test("ORC roundtrip preserves rows/schema and pushes filters to the scan") {
    val dir = tmp("graft-orc")
    Sinks.writeOrc(sample, dir)
    val back = Sinks.readOrc(spark, dir)
    assert(back.schema == sample.schema)
    assert(back.orderBy("o_orderkey").collect().toSeq ==
      sample.orderBy("o_orderkey").collect().toSeq)
    // same pushdown machinery as parquet: the selective filter must
    // reach the ORC scan, not run as a post-scan Filter only
    val q = back.filter(col("o_totalprice") > 100000.0)
    q.count()
    val scans = q.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val pushed = scans.flatMap(_.metadata.get("PushedFilters")).mkString
    assert(pushed.contains("GreaterThan"), s"no ORC filter pushdown: $pushed")
  }

  test("parquet schema evolution: mergeSchema unions columns across file generations") {
    val dir = tmp("graft-evolve")
    Seq((1L, "a")).toDF("id", "v1").write.parquet(s"$dir/gen=1")
    Seq((2L, 3.5)).toDF("id", "v2").write.parquet(s"$dir/gen=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "v1", "v2", "gen"))
    assert(merged.count() == 2)
    // old-generation rows surface the new column as null, not an error
    assert(merged.filter(col("v2").isNull).count() == 1)
  }

  test("partitioned layout prunes partitions: lang=en scan reads only its directory") {
    val dir = tmp("graft-part")
    Sinks.writeParquet(graft.ops.Tables.documents(spark, sfDir),
      dir, partitionBy = Seq("lang"))
    val en = spark.read.parquet(dir).filter(col("lang") === "en")
    en.count()
    val scans = en.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    // partition filter present and only the en directory's files touched
    assert(scans.head.partitionFilters.nonEmpty,
      "lang predicate did not become a partition filter")
    val touched = en.select(input_file_name()).distinct()
      .as[String].collect()
    assert(touched.nonEmpty && touched.forall(_.contains("lang=en")),
      s"scan touched non-en files: ${touched.filterNot(_.contains("lang=en")).take(3).toList}")
    val allLangs = spark.read.parquet(dir).select(input_file_name()).distinct().count()
    assert(touched.length < allLangs,
      s"no pruning: ${touched.length} of $allLangs files")
  }
}
