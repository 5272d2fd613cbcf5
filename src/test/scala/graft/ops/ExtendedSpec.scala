package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExtendedSpec extends SparkSpec {
  import spark.implicits._

  test("q63 pivot equals the conditional-aggregation form") {
    val pivoted = Extended.q63.build(spark, sfDir)
    val manual = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("l_returnflag") === "A",
          col("l_quantity").cast("decimal(18,2)"))).cast("double").as("qty_a"),
        sum(when(col("l_returnflag") === "N",
          col("l_quantity").cast("decimal(18,2)"))).cast("double").as("qty_n"),
        sum(when(col("l_returnflag") === "R",
          col("l_quantity").cast("decimal(18,2)"))).cast("double").as("qty_r"))
      .orderBy(col("l_linestatus"))
    assert(pivoted.collect().toSeq == manual.collect().toSeq)
  }

  test("q64 unpivot is the exact inverse reshape of the wide aggregate") {
    val long = Extended.q64.build(spark, sfDir)
      .as[(String, String, Long)].collect()
    assert(long.map(_._2).distinct.sorted.toSeq == Seq("n_f", "n_o", "n_p"))
    // every (priority, status) cell appears exactly once
    assert(long.map(r => (r._1, r._2)).distinct.length == long.length)
  }

  test("q65 parse_url splits host and path consistently") {
    val rows = Extended.q65.build(spark, sfDir)
      .select("host", "path").as[(String, String)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (h, p) =>
      h.matches("www\\.site\\d\\.example\\.com") && p.startsWith("/") &&
        !p.contains("?")
    })
  }

  test("q67 stratified sample is deterministic and capped per stratum") {
    val a = Extended.q67.build(spark, sfDir).collect().toSeq
    val b = Extended.q67.build(spark, sfDir).collect().toSeq
    assert(a == b) // no RNG anywhere — bit-stable across runs
    val perSource = a.groupBy(_.getString(0)).view.mapValues(_.size)
    assert(perSource.values.forall(_ <= 20))
  }

  test("q111 debounce: first event per key kept; consecutive kept events > 5 min apart; drops have a close predecessor") {
    val keptIds = Extended.q111.build(spark, sfDir).collect()
      .map(_.getLong(2)).toSet
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .as[(Long, String, Long, Long)].collect()
    val gapUs = 300000000L
    evs.groupBy(e => (e._1, e._2)).values.foreach { group =>
      val sorted = group.sortBy(e => (e._4, e._3))
      assert(keptIds.contains(sorted.head._3), "first event of a key must survive")
      // lag semantics: kept iff gap to immediate predecessor > 5 min
      sorted.zip(sorted.tail).foreach { case (prev, cur) =>
        val expectKept = cur._4 - prev._4 > gapUs
        assert(keptIds.contains(cur._3) == expectKept,
          s"event ${cur._3} kept=${keptIds.contains(cur._3)} want=$expectKept")
      }
      // implied invariant: consecutive KEPT events are > 5 min apart
      val kept = sorted.filter(e => keptIds.contains(e._3))
      kept.zip(kept.tail).foreach { case (a, b) =>
        assert(b._4 - a._4 > gapUs, s"kept pair ${a._3},${b._3} within window")
      }
    }
  }

  test("q72 salted aggregation matches the plain one-phase GROUP BY") {
    val salted = Extended.q72.build(spark, sfDir)
    val plain = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_suppkey").as("key"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("revenue"))
      .orderBy(col("key"))
    assert(salted.collect().toSeq == plain.collect().toSeq)
  }

  test("q118 funnel: steps must be strictly ordered in time, per user") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val events = Seq(
      // user 1: full ordered path
      (1L, "view", ts(10)), (1L, "click", ts(20)), (1L, "purchase", ts(30)),
      // user 2: clicked BEFORE viewing, then purchased — click must not
      // count (no click after the view), so neither does the purchase
      (2L, "click", ts(10)), (2L, "view", ts(20)), (2L, "purchase", ts(30)),
      // user 3: view+click, purchase exactly AT the click ts — strict >
      // excludes it
      (3L, "view", ts(10)), (3L, "click", ts(20)), (3L, "purchase", ts(20)),
      // user 4: never viewed
      (4L, "purchase", ts(5)))
      .toDF("user_id", "event_type", "ts")
    val out = Extended.funnel(events, Seq("view", "click", "purchase"))
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    // step1: users 1,2,3; step2: users 1,3; step3: user 1 only
    assert(out.map(r => (r._1, r._2)).toSeq == Seq((1L, 3L), (2L, 2L), (3L, 1L)))
    assert(out(1)._3 == 2.0 / 3.0 && out(2)._3 == 1.0 / 3.0)
  }
}
