package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Proves the IVF storage claim in ARCHITECTURE.md: cell assignments
  * written `partitionBy(center_id)` give probe queries partition-level
  * pruning — a 2-of-8-cells probe touches only those cells' files, so
  * at 100 TB the ANN search reads corpus*nProbe/nCells bytes, not the
  * corpus.
  */
class IvfLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("probe-limited read of a cell-partitioned index touches only probed cells' files") {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("cid"),
        col("embedding").cast("array<double>").as("cv"))
    val centers = graft.cluster.KMeansAssign.lloydCenters(
      emb, k = 8, iters = 2, idCol = "cid", vecCol = "cv")
    val cells = graft.cluster.KMeansAssign.assignMap(emb, centers, "cv")
      .drop("dist")

    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    graft.sources.Sinks.writeParquet(cells, dir, partitionBy = Seq("center_id"))

    val probed = Seq(2, 5)
    val scan = spark.read.parquet(dir)
      .filter(col("center_id").isin(probed: _*))
    val files = scan.select(input_file_name()).distinct().as[String].collect()
    assert(files.nonEmpty)
    assert(files.forall(f => probed.exists(p => f.contains(s"center_id=$p"))),
      s"probe read escaped its cells: ${files.filterNot(f => probed.exists(p => f.contains(s"center_id=$p"))).take(3).toList}")

    // and the probed read returns exactly the cells' members
    val expected = cells.filter(col("center_id").isin(probed: _*)).count()
    assert(scan.count() == expected && expected > 0)
  }
}
