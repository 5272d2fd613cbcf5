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

  test("upsertIvfCells: merge == rebuild; delta wins re-ingests; in-batch dups resolve deterministically; junk skipped") {
    import graft.cluster.KMeansAssign
    val vecs = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)),
      (2L, Seq(0.9, 0.1)), (3L, Seq(0.1, 0.9)), (4L, Seq(-1.0, 0.0)))
      .toDF("vec_id", "v")
    val centers = KMeansAssign.lloydCenters(vecs, k = 2, iters = 1, "vec_id", "v")
    val base = KMeansAssign.assignMap(vecs, centers, "v").drop("dist")
    // delta: id 2 re-ingested FLIPPED to the +y cell, id 9 brand new,
    // id 9 delivered TWICE (at-least-once), one junk null row
    val delta = Seq(
      (2L, Some(Seq(0.1, 0.9))),
      (9L, Some(Seq(0.0, 2.0))), (9L, Some(Seq(0.0, 3.0))),
      (7L, None))
      .toDF("vec_id", "v")
    val merged = Similarity.upsertIvfCells(base, delta, centers)
    val got = merged.select("vec_id", "center_id")
      .as[(Long, Int)].collect().toMap
    // merge == rebuild: assign the post-merge vector set directly
    val rebuilt = KMeansAssign.assignMap(
      Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)), (2L, Seq(0.1, 0.9)),
        (3L, Seq(0.1, 0.9)), (4L, Seq(-1.0, 0.0)),
        (9L, Seq(0.0, 2.0))) // row-min winner of the two id-9 versions
        .toDF("vec_id", "v"), centers, "v")
      .select("vec_id", "center_id").as[(Long, Int)].collect().toMap
    assert(got == rebuilt, "incremental merge must equal a full rebuild")
    assert(got(2L) == got(1L), "re-ingested vector must move to its new cell")
    assert(!got.contains(7L), "junk null vector must not become an index member")
  }
}
