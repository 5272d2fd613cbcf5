package graft.cluster

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.functions.cosine_distance

/** Cosine k-means assignment (reference Job 2: K1-K4 + A4,
  * ProcessData.java:479-618), with the reference's bugs fixed per
  * SURVEY.md §7: true argmin (D1), real squares in the norm (D2),
  * N-dimensional vectors (D3), sound partial aggregation and
  * deterministic cluster numbering (D4).
  *
  * Shape: broadcast nested-loop join of the (large) point set against
  * the (small, K-row) centroid set, then a per-point argmin. This is
  * exactly the reference's DistributedCache pattern re-expressed as
  * `crossJoin(broadcast(centers))` + `min_by` — no shuffle of the big
  * side beyond the final per-point aggregate, which AQE executes as
  * partial+final hash aggregation.
  *
  * Scale note: cost is O(points * K * dim) map-side work and the
  * points never move; at 100 TB this is scan-bound. K is assumed
  * broadcastable (thousands of centroids, not millions).
  */
object KMeansAssign {

  /** points(id, vec ARRAY<DOUBLE>) x centers(center_id, cvec) ->
    * (id, center_id, dist): each point with its nearest centroid by
    * cosine distance; deterministic tie-break on the lower center_id.
    */
  def assign(points: DataFrame, centers: DataFrame,
             idCol: String = "id", vecCol: String = "vec",
             centerIdCol: String = "center_id", centerVecCol: String = "cvec"): DataFrame = {
    val joined = points.crossJoin(broadcast(centers))
      .withColumn("dist", cosine_distance(col(vecCol), col(centerVecCol)))
    joined
      .groupBy(col(idCol))
      .agg(min(struct(col("dist"), col(centerIdCol))).as("best"))
      .select(col(idCol), col("best.dist").as("dist"),
        col(s"best.$centerIdCol").as(centerIdCol))
  }

  /** Cluster membership aggregation (reference A4): members per center,
    * with deterministic sequential cluster ids 1..K in center-id order
    * (the reference's mutable `cluster++` renumbering, made sound via
    * row_number — SURVEY.md §2 A4).
    */
  def clusters(assignments: DataFrame, memberCol: String = "id",
               centerIdCol: String = "center_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    assignments
      .groupBy(col(centerIdCol))
      .agg(
        count(lit(1)).as("size"),
        array_sort(collect_list(col(memberCol))).as("members"))
      // K rows at this point: a global window over K centroids is cheap.
      .withColumn("cluster_id",
        row_number().over(Window.orderBy(col(centerIdCol))))
      .select(col("cluster_id"), col(centerIdCol), col("size"), col("members"))
  }

  /** Mean vector per assigned center: explode to (center, dim-pos,
    * value) and average per slot — never materializes a group's member
    * vectors in one buffer, so group size is unbounded (100 TB-safe),
    * and the per-slot avg runs as partial+final hash aggregation.
    * Input must carry `center_id` and the vector column.
    */
  def centroidMeans(assignedPoints: DataFrame, vecCol: String): DataFrame =
    assignedPoints
      .select(col("center_id"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col("center_id"), col("pos")).agg(avg(col("x")).as("m"))
      .groupBy(col("center_id"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("cvec"))

  /** Narrow nearest-center assignment against a driver-side center set:
    * the K centroids ride into the generated code as a reference object
    * (the reference's DistributedCache broadcast pattern, without even
    * a BroadcastExchange), so assignment is a pure codegen'd map —
    * the points never shuffle. Output: the input columns plus
    * (center_id, dist). This is the shape to use whenever the centers
    * already live on the driver (Lloyd loops, IVF quantizers).
    */
  def assignMap(points: DataFrame, centers: Array[Array[Double]],
                vecCol: String = "vec"): DataFrame =
    points
      .withColumn("nc", graft.functions.functions.nearest_center(col(vecCol), centers))
      .withColumn("center_id", col("nc.center_id"))
      .withColumn("dist", col("nc.dist"))
      .drop("nc")

  /** Driver-side Lloyd refinement: deterministic init (first k points
    * by id), then `iters - 1` update steps, each a narrow assignMap
    * pass + the scale-safe per-slot mean + a K-row collect. A center
    * whose cell goes empty keeps its previous position (standard
    * practice; keeps ids dense and stable). Returns the K centroids.
    * tol = 0.0 keeps the historical fixed-iteration semantics exactly:
    * the loop only stops early on a bit-identical fixpoint, where the
    * remaining iterations could not change anything anyway.
    */
  def lloydCenters(points: DataFrame, k: Int, iters: Int,
                   idCol: String = "id", vecCol: String = "vec"): Array[Array[Double]] =
    lloydConverge(points, k, iters, idCol, vecCol, tol = 0.0)._1

  /** [[lloydCenters]] with a convergence stop: update steps end early
    * once the largest centroid shift (L-inf over all centers and
    * dimensions) drops to `tol` or below — a converged clustering pays
    * one final no-shift pass instead of `maxIter` scans. Returns
    * (centroids, updateStepsRun).
    */
  def lloydConverge(points: DataFrame, k: Int, maxIter: Int,
                    idCol: String = "id", vecCol: String = "vec",
                    tol: Double = 1e-9): (Array[Array[Double]], Int) = {
    // multi-iteration loops re-scan the input once per update step:
    // pin it for the loop's lifetime (a single-iteration call reads the
    // source twice either way — init + caller — and skips the cache).
    // ONLY if the caller hasn't already persisted it — the finally
    // unpersist below would otherwise silently destroy a
    // caller-managed cache on the same frame.
    val callerPersisted =
      points.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val pts = if (maxIter > 1 && !callerPersisted) points.cache() else points
    try {
      // null vectors (the loader's junk-line convention) must not reach
      // the driver math — one junk row among the k lowest ids would NPE
      // here and kill the job (the Pq.trainCodebooks precedent)
      val first: Array[Array[Double]] = pts
        .where(col(vecCol).isNotNull)
        .orderBy(col(idCol)).limit(k)
        .orderBy(col(idCol))
        .select(col(vecCol))
        .collect().map(_.getSeq[Double](0).toArray)
      // degraded-but-working beats a pipeline abort: small corpora /
      // per-source slices legitimately hold fewer vectors than a
      // library-default k (IVF nCells=16, semantic-dedup k), and the
      // old behavior — fewer centers, higher ids simply absent — is a
      // valid index. The failure mode worth killing was the SILENCE,
      // so under-k now reports itself. Truly empty input still fails:
      // zero centers can't assign anything.
      require(first.nonEmpty,
        s"k-means got zero non-null vectors (k=$k) — nothing to seed from")
      if (first.length < k)
        System.err.println(s"[kmeans] only ${first.length} non-null vectors " +
          s"for k=$k — building ${first.length} centers (ids " +
          s"${first.length}..${k - 1} will not appear downstream)")
      // conform every center to the LARGEST seed's dimension: the
      // assignment kernel tolerates ragged POINT vectors (common-prefix
      // scoring — "row-local junk must not kill the scan"), but
      // NearestCenterExpr requires a rectangular center set, so one
      // junk row among the first k (or a long junk member inflating a
      // centroidMeans cell to max member length) would otherwise abort
      // the whole job on the next assignMap. Zero-padding is neutral
      // under cosine (zeros add nothing to dot or norms). Max, not the
      // first seed's length: a zero-length/short junk vector holding
      // the lowest id would otherwise TRUNCATE every center to its
      // prefix and silently degenerate the whole clustering (dist 1.0
      // everywhere, everything in cell 0, instant fake convergence).
      val dim = if (first.isEmpty) 0 else first.map(_.length).max
      def conform(v: Array[Double]): Array[Double] =
        if (v.length == dim) v
        else java.util.Arrays.copyOf(v, dim)
      var centers: Array[Array[Double]] = first.map(conform)
      var it = 1
      var steps = 0
      var converged = false
      while (it < maxIter && !converged) {
        val means = centroidMeans(assignMap(pts, centers, vecCol), vecCol)
          .collect()
          .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
          .toMap
        val next = Array.tabulate(centers.length)(i =>
          conform(means.getOrElse(i, centers(i))))
        var shift = 0.0
        var c = 0
        while (c < centers.length) {
          val a = centers(c)
          val b = next(c)
          val n = math.min(a.length, b.length)
          var d = 0
          while (d < n) { shift = math.max(shift, math.abs(a(d) - b(d))); d += 1 }
          c += 1
        }
        centers = next
        steps += 1
        converged = shift <= tol
        it += 1
      }
      (centers, steps)
    } finally if (maxIter > 1 && !callerPersisted) pts.unpersist(blocking = false)
  }

  /** Full Lloyd iteration generalization (the reference only does the
    * assignment step; a real engine wants the loop): k-means with
    * cosine distance. Centroid update = arithmetic mean of member
    * vectors. Iterations run as a driver loop: each pass is a narrow
    * broadcast-map assignment (zero shuffle of the points) + the
    * partial/final per-slot mean aggregation, with only the K new
    * centroids collected and re-shipped. The returned frame is a lazy
    * narrow plan over the input — nothing is cached or materialized.
    */
  def lloyd(points: DataFrame, k: Int, maxIter: Int,
            idCol: String = "id", vecCol: String = "vec"): DataFrame = {
    val centers = lloydCenters(points, k, maxIter, idCol, vecCol)
    assignMap(points, centers, vecCol)
      .select(col(idCol), col("dist"), col("center_id"))
  }
}
