package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev micro-bench for the connected-components loop shapes (q85).
  * Times the production implementation against candidate formulations
  * on the real q85 pair set. Usage: runMain graft.tools.CCPerf <sfDir>
  */
object CCPerf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // q85's pair set (Jaccard >= 0.7 over doc_id < 100)
    import graft.ops.{Tables, TextAnalytics}
    val t = Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), explode(TextAnalytics.toks(col("text"))).as("term"))
      .distinct()
    val sz = t.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = t.toDF("d1", "term")
      .join(t.toDF("d2", "term2"), col("term") === col("term2") && col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("n_common"))
    val jac = col("n_common") / (col("n1") + col("n2") - col("n_common"))
    val pairs = inter
      .join(sz.toDF("dk1", "n1"), col("dk1") === col("d1"))
      .join(sz.toDF("dk2", "n2"), col("dk2") === col("d2"))
      .filter(jac >= 0.7)
      .select(col("d1"), col("d2"))
      .cache()
    println(s"[ccperf] pairs = ${pairs.count()}")

    def time(name: String, reps: Int)(f: => DataFrame): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = f.count()
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, n)
      }
      println(f"[ccperf] $name%-24s rows=${times.head._2} " +
        times.map(t => f"${t._1}%7.3f").mkString(" "))
    }

    // default dispatch (union-find for a pair set this small) AND the
    // distributed loop (forced) — the loop variants below compare
    // against "loop", not "current"
    time("current", 3)(graft.ops.Dedup.connectedComponents(pairs))
    time("loop", 3)(
      graft.ops.Dedup.connectedComponents(pairs, localEdgeLimit = 0L))

    // Dispatch-boundary probe: 256-byte string ids (URL/hash-sized) at
    // edge counts straddling the 64 MB estimated-driver-bytes budget.
    // 50k pairs ≈ 61 MB estimated -> driver union-find; 200k pairs
    // ≈ 243 MB -> the SAME call auto-switches to the distributed loop
    // before the collect would strain a default driver heap.
    def fatGraph(n: Int): DataFrame = spark.range(n)
      .select(concat(lit("h" * 256), col("id")).as("a"),
        concat(lit("h" * 256), (col("id") + 1L) % (n / 10)).as("b"))
      .cache()
    Seq(50000, 200000).foreach { n =>
      val g = fatGraph(n)
      g.count()
      time(s"fat${n / 1000}k-auto", 2)(graft.ops.Dedup.connectedComponents(g))
      println(s"[ccperf] fat${n / 1000}k dispatched local=${graft.ops.Dedup.lastDispatchLocal}")
      g.unpersist(blocking = false)
    }

    // Variant: per-round instrumentation of the current shape
    def instrumented(pairsDf: DataFrame, maxIter: Int = 25): DataFrame = {
      val e = pairsDf.toDF("a", "b")
      val sym = e.union(e.select(col("b"), col("a")))
        .toDF("src", "dst").distinct().cache()
      var labels = sym.select(col("src").as("v")).distinct()
        .withColumn("label", col("v"))
      val idType = labels.schema("label").dataType
      var it = 0
      var converged = false
      while (!converged && it < maxIter) {
        val r0 = System.nanoTime()
        val viaNbr = sym.join(labels, sym("dst") === labels("v"))
          .select(sym("src").as("v"), col("label"))
        val hop = labels
          .select(col("v"), col("label"), col("label").as("old"))
          .union(viaNbr.select(col("v"), col("label"),
            lit(null).cast(idType).as("old")))
          .groupBy(col("v"))
          .agg(min(col("label")).as("l1"), max(col("old")).as("old"))
          .localCheckpoint(false)
        labels = hop
          .join(hop.select(col("v").as("lv"), col("l1").as("label")),
            col("l1") === col("lv"))
          .select(col("v"), col("label"), col("old"))
          .localCheckpoint(false)
        val changed = labels
          .agg(count(when(col("label") =!= col("old"), 1)))
          .head().getLong(0)
        labels = labels.drop("old")
        converged = changed == 0L
        it += 1
        println(f"[cc] round $it changed=$changed dt=${(System.nanoTime() - r0) / 1e9}%.3f")
      }
      sym.unpersist(blocking = false)
      labels.select(col("v"), col("label").as("component"))
    }
    time("instrumented", 2)(instrumented(pairs))

    // Variant B: self-loop edges (single join, no union branch), observe
    // for the changed count, one lazy checkpoint per round.
    def variantB(pairsDf: DataFrame, maxIter: Int = 25): DataFrame = {
      val e = pairsDf.toDF("a", "b")
      val symNoSelf = e.union(e.select(col("b"), col("a")))
        .toDF("src", "dst").distinct()
      val verts = symNoSelf.select(col("src")).distinct()
      val sym = symNoSelf
        .union(verts.select(col("src"), col("src").as("dst")))
        .cache()
      var labels = verts.select(col("src").as("v"))
        .withColumn("label", col("v"))
      var it = 0
      var converged = false
      while (!converged && it < maxIter) {
        val r0 = System.nanoTime()
        val hop = sym.join(labels, sym("dst") === labels("v"))
          .groupBy(sym("src").as("v2"))
          .agg(min(col("label")).as("l1"),
            max(when(sym("dst") === sym("src"), col("label"))).as("old"))
          .withColumnRenamed("v2", "v")
          .localCheckpoint(false)
        val obs = new org.apache.spark.sql.Observation()
        val jumped = hop
          .join(hop.select(col("v").as("lv"), col("l1").as("label")),
            col("l1") === col("lv"))
          .select(col("v"), col("label"), col("old"))
          .observe(obs, count(when(col("label") =!= col("old"), 1)).as("changed"))
          .localCheckpoint(true)
        labels = jumped.drop("old")
        val changed = obs.get("changed").asInstanceOf[Long]
        converged = changed == 0L
        it += 1
        println(f"[ccB] round $it changed=$changed dt=${(System.nanoTime() - r0) / 1e9}%.3f")
      }
      sym.unpersist(blocking = false)
      labels.select(col("v"), col("label").as("component"))
    }
    time("variantB", 2)(variantB(pairs))

    // Variant C: current shape, but with spark.sql.shuffle.partitions
    // scoped to the loop and sized from the edge count.
    def variantC(pairsDf: DataFrame, maxIter: Int = 25): DataFrame = {
      val spk = pairsDf.sparkSession
      val e = pairsDf.toDF("a", "b")
      val sym = e.union(e.select(col("b"), col("a")))
        .toDF("src", "dst").distinct().cache()
      val nEdges = sym.count()
      val parts = math.max(1L, math.min(
        spk.sparkContext.defaultParallelism.toLong, nEdges / 50000L)).toInt
      val prev = spk.conf.get("spark.sql.shuffle.partitions")
      spk.conf.set("spark.sql.shuffle.partitions", parts.toString)
      try {
        var labels = sym.select(col("src").as("v")).distinct()
          .withColumn("label", col("v"))
        val idType = labels.schema("label").dataType
        var it = 0
        var converged = false
        while (!converged && it < maxIter) {
          val r0 = System.nanoTime()
          val viaNbr = sym.join(labels, sym("dst") === labels("v"))
            .select(sym("src").as("v"), col("label"))
          val hop = labels
            .select(col("v"), col("label"), col("label").as("old"))
            .union(viaNbr.select(col("v"), col("label"),
              lit(null).cast(idType).as("old")))
            .groupBy(col("v"))
            .agg(min(col("label")).as("l1"), max(col("old")).as("old"))
            .localCheckpoint(false)
          labels = hop
            .join(hop.select(col("v").as("lv"), col("l1").as("label")),
              col("l1") === col("lv"))
            .select(col("v"), col("label"), col("old"))
            .localCheckpoint(false)
          val changed = labels
            .agg(count(when(col("label") =!= col("old"), 1)))
            .head().getLong(0)
          labels = labels.drop("old")
          converged = changed == 0L
          it += 1
          println(f"[ccC] round $it changed=$changed dt=${(System.nanoTime() - r0) / 1e9}%.3f parts=$parts")
        }
        labels.select(col("v"), col("label").as("component"))
      } finally {
        spk.conf.set("spark.sql.shuffle.partitions", prev)
        sym.unpersist(blocking = false)
      }
    }
    time("variantC", 2)(variantC(pairs))

    // Variant D: C plus AQE disabled inside the loop (trivial plans;
    // AQE's per-stage re-planning jobs dominate at small round sizes).
    def variantD(pairsDf: DataFrame, maxIter: Int = 25): DataFrame = {
      val spk = pairsDf.sparkSession
      val e = pairsDf.toDF("a", "b")
      val sym = e.union(e.select(col("b"), col("a")))
        .toDF("src", "dst").distinct().cache()
      val nEdges = sym.count()
      val parts = math.max(1L, math.min(
        spk.sparkContext.defaultParallelism.toLong, nEdges / 50000L)).toInt
      val prevParts = spk.conf.get("spark.sql.shuffle.partitions")
      val prevAqe = spk.conf.get("spark.sql.adaptive.enabled")
      spk.conf.set("spark.sql.shuffle.partitions", parts.toString)
      spk.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        var labels = sym.select(col("src").as("v")).distinct()
          .withColumn("label", col("v"))
        val idType = labels.schema("label").dataType
        var it = 0
        var converged = false
        while (!converged && it < maxIter) {
          val r0 = System.nanoTime()
          val viaNbr = sym.join(labels, sym("dst") === labels("v"))
            .select(sym("src").as("v"), col("label"))
          val hop = labels
            .select(col("v"), col("label"), col("label").as("old"))
            .union(viaNbr.select(col("v"), col("label"),
              lit(null).cast(idType).as("old")))
            .groupBy(col("v"))
            .agg(min(col("label")).as("l1"), max(col("old")).as("old"))
            .localCheckpoint(false)
          labels = hop
            .join(hop.select(col("v").as("lv"), col("l1").as("label")),
              col("l1") === col("lv"))
            .select(col("v"), col("label"), col("old"))
            .localCheckpoint(false)
          val changed = labels
            .agg(count(when(col("label") =!= col("old"), 1)))
            .head().getLong(0)
          labels = labels.drop("old")
          converged = changed == 0L
          it += 1
          println(f"[ccD] round $it changed=$changed dt=${(System.nanoTime() - r0) / 1e9}%.3f parts=$parts")
        }
        labels.select(col("v"), col("label").as("component"))
      } finally {
        spk.conf.set("spark.sql.shuffle.partitions", prevParts)
        spk.conf.set("spark.sql.adaptive.enabled", prevAqe)
        sym.unpersist(blocking = false)
      }
    }
    time("variantD", 2)(variantD(pairs))
    spark.stop()
  }
}
