package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling probe for the graph-ANN family (q208 build / q209 upsert /
  * q208-q210 serve) with a QUANTIZER RETRAINED PER SCALE — the harness
  * variant the registered queries cannot use. The registered faces pin
  * nCells = 8 (fixture seeds), so under ScaleCheck's id-shifted
  * replication cell SIZES grow with the factor instead of cell COUNTS
  * and the 2-cell edge-candidate join grows quadratically BY FIXTURE
  * CONSTRUCTION — which is why q208-q210 are excluded from the main
  * probe. In production the standard kNN-graph build scales nCells
  * with N, keeping cells bounded; this probe does exactly that
  * (nCells = baseCells x factor at the scaled corpus, seeds re-drawn
  * from the replicated table), so the ratios measure the OPERATOR's
  * scaling shape, not the frozen fixture layout:
  *
  *  - build: Lloyd seeds + 2-cell assignment + the m-NN edge table.
  *    Candidates per node stay ~2 cell sizes, so ideal is ~linear
  *    (ratio <= factor).
  *  - upsert: the q174-shaped replica-0 delta against the prebuilt
  *    state. Touched cells are delta-sized; at larger nCells the
  *    consumer region is a SMALLER fraction of the corpus, so the
  *    ratio should sit well under the factor (delta-locality).
  *  - serve: the hub-entry beam walk over the prebuilt graph. Per-hop
  *    frontier work is beam x m per query; in this engine each hop is
  *    an equi-join that SCANS the edge table (no point index), so the
  *    honest expectation is linear-in-N scan cost at scan speed, not
  *    corpus-size independence.
  *
  * Measurement only (single rep after a full 1x warmup pass — run on
  * a quiet box); correctness oracles always run against the untouched
  * driver fixtures.
  *
  * Usage: runMain graft.tools.GraphScaleCheck [sfDir] [factor] [baseCells]
  */
object GraphScaleCheck {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.01")
    val factor = if (args.length > 1) args(1).toInt else 10
    val baseCells = if (args.length > 2) args(2).toInt else 8
    val spark = ScaleCheck.session()
    val out = ScaleCheck.ensureScaledCorpus(spark, base, factor)

    // the q208 operating point (GraphM / GraphBeam / GraphHops)
    val m = 8
    val beam = 32
    val hops = 4

    def emb(dir: String): DataFrame = spark.read
      .parquet(dir + "/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .filter(col("v").isNotNull)

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    /** One full lifecycle at (dir, nCells); returns stage -> seconds. */
    def run(dir: String, nCells: Int): Map[String, Double] = {
      import graft.cluster.KMeansAssign
      import graft.ops.Similarity
      val e = emb(dir).localCheckpoint(true)
      val n = e.count()
      var centers: Array[Array[Double]] = null
      var nodes: DataFrame = null
      var edges: DataFrame = null
      // eager checkpoints INSIDE the timer: build time must charge the
      // materialization of the state the later stages consume
      val tBuild = timed {
        centers = KMeansAssign.lloydCenters(e, nCells, 1, "vec_id", "v")
        nodes = Similarity.twoCellAssign(spark, e, centers)
          .localCheckpoint(true)
        edges = Similarity.graphEdges(nodes,
          nodes.filter(col("arn") === 1)
            .select(col("vid"), col("vv"), col("center_id")), m)
          .localCheckpoint(true)
      }
      // the q174/q209 delta shape: replica-0 ids re-ingested with dim 0
      // nudged, plus 5 brand-new ids — delta size is scale-INVARIANT,
      // so the ratio isolates the consumer-region recompute
      val delta = e.filter(col("vec_id") < 10)
        .select(col("vec_id"),
          transform(col("v"), (x, i) => when(i === 0, x + 0.5).otherwise(x))
            .as("v"))
        .unionByName(e.filter(col("vec_id") < 5)
          .select((col("vec_id") + 100000L).as("vec_id"), col("v")))
      val tUpsert = timed {
        val (_, merged) =
          Similarity.upsertGraphEdges(spark, nodes, edges, delta, centers, m)
        merged.queryExecution.toRdd.count()
      }
      val prim = nodes.filter(col("arn") === 1)
        .select(col("vid"), col("vv"), col("center_id"))
      // frozen probe means: prebuilt serving state, outside the timer
      val centroids = KMeansAssign.centroidMeans(
          KMeansAssign.assignMap(e.toDF("vid", "vv"), centers, "vv")
            .drop("dist"), "vv")
        .withColumnRenamed("cvec", "repr")
        .localCheckpoint(true)
      val tServe = timed {
        Similarity.graphServe(
            e.filter(col("vec_id") < 10).toDF("qid", "qv"),
            prim, edges.select(col("src"), col("dst")), centroids,
            k = 10, beam = beam, hops = hops)
          .queryExecution.toRdd.count()
      }
      println(f"[graphscale] $dir%-40s n=$n%8d nCells=$nCells%5d " +
        f"build=$tBuild%7.2f upsert=$tUpsert%7.2f serve=$tServe%7.2f")
      Map("build" -> tBuild, "upsert" -> tUpsert, "serve" -> tServe)
    }

    run(base, baseCells) // warmup: codegen + JIT for every stage shape
    val t1 = run(base, baseCells)
    val tk = run(out, baseCells * factor)
    println(f"[graphscale] ${"stage"}%-8s ${"1x"}%7s ${factor + "x"}%7s  ratio (ideal <= $factor)")
    Seq("build", "upsert", "serve").foreach { s =>
      println(f"[graphscale] $s%-8s ${t1(s)}%7.2f ${tk(s)}%7.2f  ${tk(s) / t1(s)}%5.2fx")
    }
    spark.stop()
  }
}
