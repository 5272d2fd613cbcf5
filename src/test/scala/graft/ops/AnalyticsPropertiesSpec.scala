package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized-input invariants for the round-7 analytics operators
  * (q117/q119–q124 kernels): each kernel is replayed against a plain
  * Scala reimplementation on synthesized frames, plus the structural
  * invariants (totality, bounds, monotone ranks) that must hold on ANY
  * input. The DuckDB oracle proves fixture agreement; these prove the
  * semantics on shapes the fixture doesn't exercise (singleton labels,
  * empty sources, all-tied lengths, malformed JSON).
  */
class AnalyticsPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val EPOCH = 1704067200000000L // 2024-01-01, the kernels' week-0 anchor
  private val DAY = 86400000000L
  private val WEEK = 604800000000L

  /** (user_id, event_type, ts) frame from raw micros ≥ EPOCH. */
  private def eventsDf(rows: Seq[(Long, String, Long)]): DataFrame =
    rows.toDF("user_id", "event_type", "tsm")
      .select(col("user_id"), col("event_type"),
        timestamp_micros(col("tsm")).as("ts"))

  // ---------------------------------------------------------------
  // q117 / q120: centroid classifier + silhouette over labeled vectors
  // ---------------------------------------------------------------

  private val rnd = new Random(20260813L)
  private val dim = 4
  private val labeled: Seq[(Long, Seq[Float], Int)] = {
    // three loose clusters + one singleton label (id 99): the shapes
    // the sf fixtures never produce
    val core = (0L until 45L).map { i =>
      val lab = (i % 3).toInt
      val base = Array.fill(dim)(lab * 2.0 + rnd.nextGaussian() * 0.8)
      (i, base.map(_.toFloat).toSeq, lab)
    }
    core :+ ((45L, Seq.fill(dim)(9.5f), 99))
  }

  private def embDf(rows: Seq[(Long, Seq[Float], Int)]): DataFrame =
    rows.toDF("vec_id", "embedding", "label")

  /** Plain-Scala centroids in the kernels' association order: per
    * (label, dim) sum in vec_id order (all ids < 1024 = one block).
    */
  private def centroidsRef(rows: Seq[(Long, Seq[Float], Int)]): Map[Int, Array[Double]] =
    rows.groupBy(_._3).map { case (lab, vs) =>
      val sorted = vs.sortBy(_._1)
      val c = Array.tabulate(dim) { d =>
        sorted.foldLeft(0.0)((a, v) => a + v._2(d).toDouble) / vs.size
      }
      lab -> c
    }

  test("property: q117 confusion matrix matches a plain-Scala Rocchio classifier; cells partition N") {
    val cents = centroidsRef(labeled)
    val ref = labeled.groupBy { case (_, v, lab) =>
      val pred = cents.toSeq.map { case (cl, c) =>
        val d2 = v.indices.foldLeft(0.0) { (a, i) =>
          val dx = v(i).toDouble - c(i); a + dx * dx
        }
        (d2, cl)
      }.minBy(identity) // (d2, label) lexicographic = the kernel's tie-break
      (lab.toLong, pred._2.toLong)
    }.map { case (k, vs) => k -> vs.size.toLong }

    val got = Similarity.nearestCentroidConfusion(embDf(labeled))
      .as[(Long, Long, Long)].collect()
      .map { case (l, p, n) => (l, p) -> n }.toMap
    assert(got == ref)
    assert(got.values.sum == labeled.size.toLong)
  }

  test("property: q120 silhouette matches plain Scala; s in [-1,1]; singleton label scores 1; n partitions") {
    val cents = centroidsRef(labeled)
    val perVec = labeled.map { case (id, v, lab) =>
      def dist(c: Array[Double]): Double =
        math.sqrt(v.indices.foldLeft(0.0) { (acc, i) =>
          val dx = v(i).toDouble - c(i); acc + dx * dx
        })
      val a = dist(cents(lab))
      val b = cents.filter(_._1 != lab).values.map(dist).min
      val s = if (math.max(a, b) > 0) (b - a) / math.max(a, b) else 0.0
      (id, lab.toLong, s)
    }
    val ref = perVec.groupBy(_._2).map { case (lab, vs) =>
      // kernel association order: per-label sum in vec_id order
      lab -> (vs.size.toLong, vs.sortBy(_._1).foldLeft(0.0)(_ + _._3) / vs.size)
    }

    val got = Similarity.silhouetteByLabel(embDf(labeled))
      .as[(Long, Long, Double)].collect()
    assert(got.map(_._1).toSeq == got.map(_._1).toSeq.sorted)
    got.foreach { case (lab, n, s) =>
      assert(s >= -1.0 - 1e-12 && s <= 1.0 + 1e-12, s"label $lab s=$s")
      val (rn, rs) = ref(lab)
      assert(n == rn, s"label $lab n")
      assert(math.abs(s - rs) <= 1e-9, s"label $lab: $s vs $rs")
    }
    // the singleton label: a=0, b>0 => s=1 exactly
    assert(got.find(_._1 == 99L).get._3 == 1.0)
    assert(got.map(_._2).sum == labeled.size.toLong)
  }

  // ---------------------------------------------------------------
  // q119: weekly retention cohorts
  // ---------------------------------------------------------------

  test("property: q119 retention matches plain Scala; offset-0 cell equals cohort size; offsets non-negative") {
    val evs = (1 to 400).map { _ =>
      val u = 1L + rnd.nextInt(8)
      val t = EPOCH + (rnd.nextLong() & Long.MaxValue) % (6 * WEEK)
      (u, "e", t)
    }
    val wk = evs.map { case (u, _, t) => (u, (t - EPOCH) / WEEK) }.distinct
    val cohort = wk.groupBy(_._1).map { case (u, ws) => u -> ws.map(_._2).min }
    val ref = wk.groupBy { case (u, w) => (cohort(u), w - cohort(u)) }
      .map { case (k, vs) => k -> vs.map(_._1).distinct.size.toLong }

    val got = Extended.retentionCohorts(eventsDf(evs))
      .as[(Long, Long, Long)].collect()
      .map { case (c, o, n) => (c, o) -> n }.toMap
    assert(got == ref)
    got.keys.foreach { case (_, off) => assert(off >= 0L) }
    val cohortSizes = cohort.groupBy(_._2).map { case (w, us) => w -> us.size.toLong }
    cohortSizes.foreach { case (w, size) =>
      assert(got((w, 0L)) == size, s"cohort $w offset-0")
      // no later cell can exceed the cohort
      got.filter(_._1._1 == w).values.foreach(n => assert(n <= size))
    }
  }

  // ---------------------------------------------------------------
  // q121: exact per-source length quantiles
  // ---------------------------------------------------------------

  test("property: q121 quantiles equal rank-selected values of the sorted lengths; p50<=p90<=p99") {
    val docs = (1 to 120).map { i =>
      val src = s"s${i % 4}"
      // include all-tied lengths for one source and an empty doc
      val n = if (i % 4 == 3) 5 else rnd.nextInt(40)
      (i.toLong, src, Seq.fill(n)("w").mkString(" "))
    }.toDF("doc_id", "source", "text")

    // reference lengths read directly from the frame (no generator drift)
    val lens = docs.select(col("source"),
        size(filter(split(col("text"), "\\s+"), t => length(t) > 0)).cast("long").as("nt"))
      .as[(String, Long)].collect().toSeq
    val refQ = lens.groupBy(_._1).map { case (src, vs) =>
      val sorted = vs.map(_._2).sorted
      val n = sorted.length
      def at(num: Long, den: Long): Long = sorted(((num * n + num) / den - 1).toInt)
      src -> (n.toLong, at(1, 2), at(9, 10), at(99, 100))
    }

    val got = TextAnalytics.lengthQuantiles(docs)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.length == refQ.size)
    got.foreach { case (src, n, p50, p90, p99) =>
      val (rn, r50, r90, r99) = refQ(src)
      assert((n, p50, p90, p99) == ((rn, r50, r90, r99)), src)
      assert(p50 <= p90 && p90 <= p99, src)
    }
  }

  // ---------------------------------------------------------------
  // q122 / q123: event-rate anomalies (batch + prequential)
  // ---------------------------------------------------------------

  /** Shared generator: bursty per-user day counts (mostly 1-3 events a
    * day, occasional 15-30 bursts) as raw events.
    */
  private def burstyEvents(): Seq[(Long, String, Long)] =
    (1L to 6L).flatMap { u =>
      (0 until 20).flatMap { day =>
        val n = if (rnd.nextDouble() < 0.1) 15 + rnd.nextInt(15)
                else 1 + rnd.nextInt(3)
        (0 until n).map(k => (u, "e", EPOCH + day * DAY + k * 1000L))
      }
    }

  test("property: q122 flags exactly the days a plain-Scala 3-sigma detector flags") {
    val evs = burstyEvents()
    val counts = evs.groupBy(e => (e._1, (e._3 - EPOCH) / DAY))
      .map { case (k, vs) => k -> vs.size.toLong }
    val ref = counts.groupBy(_._1._1).flatMap { case (u, ds) =>
      val nd = ds.size.toLong
      if (nd < 2) Nil
      else {
        val sx = ds.values.sum
        val sxx = ds.values.map(c => c * c).sum
        val mean = sx.toDouble / nd.toDouble
        val std = math.sqrt((nd * sxx - sx * sx).toDouble / (nd * (nd - 1)).toDouble)
        ds.collect { case ((_, day), cnt) if cnt.toDouble > mean + 3.0 * std =>
          (u, day, cnt, mean, std)
        }
      }
    }.toSet

    val got = Extended.rateAnomalies(eventsDf(evs), sigma = 3.0)
      .as[(Long, Long, Long, Double, Double)].collect().toSet
    assert(got == ref) // exact doubles: both sides are one division + one sqrt of exact ints
    assert(got.nonEmpty) // the generator plants bursts; an empty set means the detector is dead
  }

  test("property: q123 prequential flags match a plain-Scala online detector; every flag has >=2 prior days") {
    val evs = burstyEvents()
    val counts = evs.groupBy(e => (e._1, (e._3 - EPOCH) / DAY))
      .map { case (k, vs) => k -> vs.size.toLong }
    val ref = counts.groupBy(_._1._1).flatMap { case (u, ds) =>
      val ordered = ds.toSeq.map { case ((_, day), cnt) => (day, cnt) }.sortBy(_._1)
      var n = 0L; var sx = 0L; var sxx = 0L
      ordered.flatMap { case (day, cnt) =>
        val out =
          if (n >= 2) {
            val mean = sx.toDouble / n.toDouble
            val std = math.sqrt((n * sxx - sx * sx).toDouble / (n * (n - 1)).toDouble)
            if (cnt.toDouble > mean + 3.0 * std) Some((u, day, cnt, mean, std)) else None
          } else None
        n += 1; sx += cnt; sxx += cnt * cnt
        out
      }
    }.toSet

    val got = Extended.prequentialAnomalies(eventsDf(evs), sigma = 3.0)
      .as[(Long, Long, Long, Double, Double)].collect().toSet
    assert(got == ref)
    // structural: a flagged day needs two strictly-earlier active days
    val dayRank = counts.keys.toSeq.groupBy(_._1).map { case (u, ks) =>
      u -> ks.map(_._2).sorted.zipWithIndex.toMap
    }
    got.foreach { case (u, day, _, _, _) => assert(dayRank(u)(day) >= 2) }
  }

  // ---------------------------------------------------------------
  // q124: schema-on-read JSON extraction
  // ---------------------------------------------------------------

  test("property: q124 aggregates match a plain parse; malformed JSON nulls, never fails") {
    val evs = (1 to 300).map { i =>
      val et = s"t${i % 3}"
      val props = i % 5 match {
        case 0 => s"""{"k": ${i % 37}, "other": "x"}"""
        case 1 => s"""{"other": 1}"""             // k absent
        case 2 => "{not json at all"              // malformed
        case 3 => null                            // null props
        case _ => s"""{"k": ${-(i % 11)}}"""      // negative k
      }
      (et, props)
    }
    val df = evs.toDF("event_type", "props")

    val ref = evs.groupBy(_._1).map { case (et, vs) =>
      val ks = vs.flatMap { case (_, p) =>
        // the declared-schema contract: a JSON number field `k`, else NULL
        Option(p).flatMap { s =>
          """"k"\s*:\s*(-?\d+)""".r.findFirstMatchIn(s)
            .filter(_ => s.trim.startsWith("{") && s.trim.endsWith("}"))
            .map(_.group(1).toLong)
        }
      }
      et -> (vs.size.toLong, ks.size.toLong,
        if (ks.isEmpty) None else Some((ks.sum, ks.min, ks.max)))
    }

    val got = Extended.jsonPropsSummary(df)
      .as[(String, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect()
    assert(got.length == ref.size)
    got.foreach { case (et, n, nk, sk, mn, mx) =>
      val (rn, rnk, agg) = ref(et)
      assert(n == rn, s"$et n_events")
      assert(nk == rnk, s"$et n_with_k")
      agg match {
        case Some((rs, rmn, rmx)) =>
          assert((sk, mn, mx) == ((Some(rs), Some(rmn), Some(rmx))), et)
        case None =>
          assert(sk.isEmpty && mn.isEmpty && mx.isEmpty, et)
      }
    }
  }
}
