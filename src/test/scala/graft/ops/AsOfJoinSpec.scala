package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  def t(min: Int): Timestamp = new Timestamp(1700000000000L + min * 60000L)

  test("backward as-of: latest right row at-or-before each left time, per key") {
    val quotes = Seq(
      (1L, t(0), 100.0), (1L, t(10), 110.0), (1L, t(20), 120.0),
      (2L, t(5), 50.0)).toDF("qkey", "qts", "px")
    val trades = Seq(
      (1L, t(0), "exact-at-first"),    // ts == quote ts -> inclusive match
      (1L, t(15), "between"),          // matches t(10) quote
      (1L, t(25), "after-last"),       // matches t(20) quote
      (2L, t(4), "before-any"),        // no quote yet -> null
      (3L, t(9), "no-key"))            // key never quoted -> null
      .toDF("tkey", "tts", "label")

    val out = AsOfJoin.asofBackward(trades, quotes,
      "tkey", "qkey", "tts", "qts", payload = Seq("px"))
      .select("label", "px").as[(String, Option[Double])].collect().toMap

    assert(out == Map(
      "exact-at-first" -> Some(100.0),
      "between" -> Some(110.0),
      "after-last" -> Some(120.0),
      "before-any" -> None,
      "no-key" -> None))
  }

  test("left rows and columns are preserved") {
    val l = Seq((1L, t(1), "a"), (1L, t(2), "b")).toDF("k", "ts", "tag")
    val r = Seq((1L, t(0), 7L)).toDF("k2", "ts2", "v")
    val out = AsOfJoin.asofBackward(l, r, "k", "k2", "ts", "ts2", Seq("v"))
    assert(out.count() == 2)
    assert(out.columns.toSet == Set("k", "ts", "tag", "v"))
  }

  test("forward as-of: earliest right row at-or-after each left time, per key") {
    val fills = Seq(
      (1L, t(10), 110.0), (1L, t(20), 120.0), (1L, t(30), 130.0),
      (2L, t(5), 50.0)).toDF("fkey", "fts", "px")
    val orders = Seq(
      (1L, t(10), "exact-at-first"),   // ts == fill ts -> inclusive match
      (1L, t(15), "between"),          // next fill is t(20)
      (1L, t(31), "after-last"),       // no future fill -> null
      (2L, t(6), "past-only"),         // only fill is in the past -> null
      (3L, t(9), "no-key"))            // key never filled -> null
      .toDF("okey", "ots", "label")

    val out = AsOfJoin.asofForward(orders, fills,
      "okey", "fkey", "ots", "fts", payload = Seq("px"))
      .select("label", "px").as[(String, Option[Double])].collect().toMap

    assert(out == Map(
      "exact-at-first" -> Some(110.0),
      "between" -> Some(120.0),
      "after-last" -> None,
      "past-only" -> None,
      "no-key" -> None))
  }

  test("random inputs: both directions match a plain-Scala reference") {
    val rnd = new scala.util.Random(37L)
    val rights = Seq.tabulate(120) { i =>
      (rnd.nextInt(6).toLong, t(rnd.nextInt(200)), i.toLong)
    }.distinctBy(r => (r._1, r._2)) // unique (key, ts): the documented contract
    val lefts = Seq.tabulate(80) { i =>
      (rnd.nextInt(8).toLong, t(rnd.nextInt(200)), s"L$i")
    }
    val rdf = rights.toDF("k2", "ts2", "v")
    val ldf = lefts.toDF("k", "ts", "tag")
    def refMatch(k: Long, ts: Timestamp, fwd: Boolean): Option[Long] = {
      val cand = rights.filter(r => r._1 == k &&
        (if (fwd) !r._2.before(ts) else !r._2.after(ts)))
      if (cand.isEmpty) None
      else Some((if (fwd) cand.minBy(_._2.getTime) else cand.maxBy(_._2.getTime))._3)
    }
    val fwd = AsOfJoin.asofForward(ldf, rdf, "k", "k2", "ts", "ts2", Seq("v"))
      .select("tag", "v").as[(String, Option[Long])].collect().toMap
    val bwd = AsOfJoin.asofBackward(ldf, rdf, "k", "k2", "ts", "ts2", Seq("v"))
      .select("tag", "v").as[(String, Option[Long])].collect().toMap
    lefts.foreach { case (k, ts, tag) =>
      assert(fwd(tag) == refMatch(k, ts, fwd = true), s"forward mismatch at $tag")
      assert(bwd(tag) == refMatch(k, ts, fwd = false), s"backward mismatch at $tag")
    }
  }

  test("forward and backward agree on exact-timestamp matches (inclusive both ways)") {
    val r = Seq((1L, t(10), 1L)).toDF("k2", "ts2", "v")
    val l = Seq((1L, t(10), "at")).toDF("k", "ts", "tag")
    val fwd = AsOfJoin.asofForward(l, r, "k", "k2", "ts", "ts2", Seq("v"))
      .select("v").as[Option[Long]].head()
    val bwd = AsOfJoin.asofBackward(l, r, "k", "k2", "ts", "ts2", Seq("v"))
      .select("v").as[Option[Long]].head()
    assert(fwd == Some(1L) && bwd == Some(1L))
  }

  test("null left time never matches (SQL semantics), in BOTH directions") {
    // forward's DESCENDING walk sorts null times LAST — pre-fix the
    // running carry handed such a row the key's minimum-time right
    // row as a spurious match (backward happened to be safe)
    val r = Seq((1L, t(10), 1L), (1L, t(20), 2L)).toDF("k2", "ts2", "v")
    val l = Seq((1L, Option(t(15)), "real"), (1L, Option.empty[Timestamp], "nullts"))
      .toDF("k", "ts", "tag")
    val fwd = AsOfJoin.asofForward(l, r, "k", "k2", "ts", "ts2", Seq("v"))
      .select("tag", "v").as[(String, Option[Long])].collect().toMap
    val bwd = AsOfJoin.asofBackward(l, r, "k", "k2", "ts", "ts2", Seq("v"))
      .select("tag", "v").as[(String, Option[Long])].collect().toMap
    assert(fwd == Map("real" -> Some(2L), "nullts" -> None), fwd)
    assert(bwd == Map("real" -> Some(1L), "nullts" -> None), bwd)
  }

  test("null keys never match null keys (window nulls-group != join semantics)") {
    val r = Seq((Option.empty[Long], t(5), 7L), (Option(1L), t(5), 8L))
      .toDF("k2", "ts2", "v")
    val l = Seq((Option.empty[Long], t(10), "nullkey"), (Option(1L), t(10), "real"))
      .toDF("k", "ts", "tag")
    for (dir <- Seq(true, false)) {
      val got = (if (dir) AsOfJoin.asofForward(l, r, "k", "k2", "ts", "ts2", Seq("v"))
                 else AsOfJoin.asofBackward(l, r, "k", "k2", "ts", "ts2", Seq("v")))
        .select("tag", "v").as[(String, Option[Long])].collect().toMap
      assert(got("nullkey").isEmpty,
        s"null-key left row must not match a null-key right row (forward=$dir)")
      // real key unaffected: backward matches the t(5) quote; forward
      // has no right row at-or-after t(10)
      assert(got("real") == (if (dir) None else Some(8L)),
        s"real key semantics changed (forward=$dir): $got")
    }
  }

  test("reserved internal column names are rejected up front") {
    val r = Seq((1L, t(5), 7L)).toDF("k2", "ts2", "v")
    val bad = Seq((1L, t(10), "x")).toDF("k", "ts", "_t")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asofBackward(bad, r, "k", "k2", "ts", "ts2", Seq("v"))
    }
    assert(e.getMessage.contains("reserved"))
  }
}
