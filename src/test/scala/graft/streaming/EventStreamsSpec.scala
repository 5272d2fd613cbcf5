package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._
  import EventStreams._

  def ts(min: Long): Timestamp = new Timestamp(1700000000000L + min * 60000L)

  val events = Seq(
    Event(1L, ts(0), 1L, "click", 1.0),
    Event(2L, ts(5), 1L, "click", 2.0),
    Event(3L, ts(90), 1L, "view", 3.0),  // >30min gap -> new session
    Event(4L, ts(2), 2L, "click", 4.0))

  test("sessionizeBatch: gap splits sessions; aggregates per session") {
    val out = sessionizeBatch(events.toDF(), gapMinutes = 30)
      .select("user_id", "n_events", "total_value")
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    // user 1: sessions (2 events, 3.0) and (1 event, 3.0); user 2: (1 event, 4.0)
    assert(out.toList == List((1L, 1L, 3.0), (1L, 2L, 3.0), (2L, 1L, 4.0)))
  }

  test("hourlyCounts on batch data matches manual aggregation") {
    val out = hourlyCounts(events.toDF())
      .select("event_type", "n").as[(String, Long)].collect().toSet
    // UTC epoch-aligned 1h windows: ts(0)=22:13, ts(2)=22:15, ts(5)=22:18
    // share one window (3 clicks); ts(90)=23:43 is the lone view
    assert(out == Set(("click", 3L), ("view", 1L)), out)
  }

  test("streaming: windowed counts with watermark through MemoryStream") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val query = hourlyCounts(mem.toDF())
      .writeStream.format("memory").queryName("hourly_test")
      .outputMode("update").start()
    try {
      mem.addData(events: _*)
      query.processAllAvailable()
      val rows = spark.table("hourly_test")
        .select("event_type", "n").as[(String, Long)].collect()
      assert(rows.nonEmpty)
      assert(rows.map(_._2).sum == 4L)
    } finally query.stop()
  }

  test("streaming: sessionize closes sessions by gap and by watermark timeout") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val query = sessionize(spark, mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions_test")
      .outputMode("append").start()
    try {
      mem.addData(events: _*)
      query.processAllAvailable()
      val afterBatch1 = spark.table("sessions_test").as[Session].collect()
      // user 1's first session (2 events) closed by the gap to ts(90)
      assert(afterBatch1.exists(s => s.user_id == 1L && s.n_events == 2 && s.total_value == 3.0))

      // advance the watermark far past every open session's deadline:
      // open sessions (user 1 @t90, user 2 @t2) must flush via the
      // event-time timeout
      mem.addData(Event(99L, ts(600), 42L, "click", 0.0))
      query.processAllAvailable()
      mem.addData(Event(100L, ts(610), 42L, "click", 0.0))
      query.processAllAvailable()
      val all = spark.table("sessions_test").as[Session].collect()
      assert(all.exists(s => s.user_id == 1L && s.n_events == 1 && s.total_value == 3.0),
        s"user 1 trailing session missing: ${all.toList}")
      assert(all.exists(s => s.user_id == 2L && s.n_events == 1 && s.total_value == 4.0),
        s"user 2 session missing: ${all.toList}")
    } finally query.stop()
  }

  test("file-source stream over the fixture parquet matches batch totals") {
    // the file stream source needs a directory: stage the fixture file
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("part-0.parquet"))
    val stream = EventStreams.hourlyCounts(
      EventStreams.readEventStream(spark, dir.toString))
    val q = stream.writeStream.format("memory").queryName("hourly_file")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hourly_file")
        .agg(sum("n")).as[Long].head()
      val batch = graft.ops.Tables.events(spark, sfDir).count()
      assert(streamed == batch)
    } finally q.stop()
  }

  test("sessionize also runs in BATCH mode (event-time timeout is a no-op there)") {
    val out = sessionize(spark, events.toDS(), gapMinutes = 30).collect()
    // batch emits only gap-closed sessions (no watermark to flush tails)
    assert(out.exists(s => s.user_id == 1L && s.n_events == 2 && s.total_value == 3.0))
  }

  test("dedupStream drops repeated event_ids within the watermark") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val query = dedupStream(mem.toDF())
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      // event_id 1 delivered three times (at-least-once upstream)
      mem.addData(
        Event(1L, ts(0), 1L, "click", 1.0),
        Event(1L, ts(0), 1L, "click", 1.0),
        Event(2L, ts(1), 1L, "view", 2.0))
      query.processAllAvailable()
      mem.addData(Event(1L, ts(2), 1L, "click", 1.0))
      query.processAllAvailable()
      val ids = spark.table("dedup_test").select("event_id").as[Long].collect()
      assert(ids.sorted.toSeq == Seq(1L, 2L), s"got ${ids.toList}")
    } finally query.stop()
  }

  test("debounce stream equals the batch q111 kept set on in-order fixture events") {
    implicit val sq = spark.sqlContext
    // real fixture slice, fed to the stream in event-time order
    val fixture = graft.ops.Tables.events(spark, sfDir)
      .filter(col("user_id") < 10)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val batchKept = graft.ops.Extended.q111.build(spark, sfDir)
      .filter(col("user_id") < 10)
      .select("event_id").as[Long].collect().toSet
    val mem = MemoryStream[Event]
    val query = debounce(spark, mem.toDS())
      .writeStream.format("memory").queryName("debounce_test")
      .outputMode("append").start()
    try {
      // two micro-batches to exercise cross-batch state
      val (a, b) = fixture.splitAt(fixture.length / 2)
      mem.addData(a.toIndexedSeq: _*)
      query.processAllAvailable()
      mem.addData(b.toIndexedSeq: _*)
      query.processAllAvailable()
      // synthetic retry storm on a key the fixture doesn't use,
      // AFTER all fixture event times (so its watermark can't mark the
      // fixture late), split ACROSS micro-batches so dropping
      // exercises carried state: only the first event survives (each
      // is 1 min after its predecessor)
      val t0 = fixture.last.ts.getTime
      def storm(id: Long, offMin: Int) =
        Event(1000000L + id, new java.sql.Timestamp(t0 + offMin * 60000L),
          9999L, "retry", 0.0)
      mem.addData(storm(1, 1))
      query.processAllAvailable()
      mem.addData(storm(2, 2), storm(3, 3))
      query.processAllAvailable()
      val kept = spark.table("debounce_test")
        .select("event_id").as[Long].collect().toSet
      val streamKept = kept.filter(_ < 1000000L)
      assert(streamKept == batchKept,
        s"stream/batch diverge: onlyStream=${(streamKept -- batchKept).take(5)} " +
          s"onlyBatch=${(batchKept -- streamKept).take(5)}")
      assert(kept.filter(_ >= 1000000L) == Set(1000001L),
        "retry storm: only the first event may survive, across micro-batches")
    } finally query.stop()
  }

  test("debounce also runs in BATCH mode with identical lag semantics") {
    val fixture = graft.ops.Tables.events(spark, sfDir)
      .filter(col("user_id") < 10)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value")).as[Event]
    val out = debounce(spark, fixture).select("event_id").as[Long].collect().toSet
    val batchKept = graft.ops.Extended.q111.build(spark, sfDir)
      .filter(col("user_id") < 10)
      .select("event_id").as[Long].collect().toSet
    assert(out == batchKept)
  }

  test("attributionJoin pairs purchases with prior clicks inside the lag window") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val query = attributionJoin(mem.toDF(), maxLagMinutes = 60)
      .writeStream.format("memory").queryName("attr_test")
      .outputMode("append").start()
    try {
      mem.addData(
        Event(10L, ts(0), 1L, "click", 0.0),
        Event(11L, ts(30), 1L, "purchase", 9.99),   // within 60min of click 10
        Event(12L, ts(200), 1L, "purchase", 5.00),  // too late for click 10
        Event(13L, ts(5), 2L, "purchase", 1.00))    // other user: no click
      query.processAllAvailable()
      val rows = spark.table("attr_test")
        .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
      assert(rows == Set((10L, 11L)), s"got $rows")
    } finally query.stop()
  }

  test("attributionJoin has identical semantics on a batch frame") {
    val batch = attributionJoin(
      Seq(
        Event(10L, ts(0), 1L, "click", 0.0),
        Event(11L, ts(30), 1L, "purchase", 9.99),
        Event(12L, ts(200), 1L, "purchase", 5.00)).toDF())
      .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
    assert(batch == Set((10L, 11L)))
  }

  test("writeParquetStream: checkpointed sink is exactly-once across restarts") {
    val in = java.nio.file.Files.createTempDirectory("graft-sink-in")
    val out = java.nio.file.Files.createTempDirectory("graft-sink-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sink-ckpt").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      in.resolve("part-0.parquet"))

    def drain(): Unit = {
      val q = EventStreams.writeParquetStream(
        EventStreams.readEventStream(spark, in.toString)
          .select(col("event_id"), col("ts"), col("user_id")),
        out, ckpt)
      q.awaitTermination()
    }
    drain()
    val batchRows = graft.ops.Tables.events(spark, sfDir).count()
    assert(spark.read.parquet(out).count() == batchRows)

    // restart from the same checkpoint with one new input file: only
    // the new file's rows are appended, committed batches never replay
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      in.resolve("part-1.parquet"))
    drain()
    assert(spark.read.parquet(out).count() == 2 * batchRows)
    assert(spark.read.parquet(out).select("event_id").distinct().count() == batchRows)
  }

  test("rateAnomalies stream equals the batch q123 prequential detector") {
    val fixture = graft.ops.Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val batch = graft.ops.Extended
      .prequentialAnomalies(
        graft.ops.Tables.events(spark, sfDir).select(col("user_id"), col("ts")),
        sigma = 3.0)
      .as[(Long, Long, Long, Double, Double)].collect().toSet
    assert(batch.nonEmpty, "fixture should produce 3-sigma anomalies")
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val query = rateAnomalies(spark, mem.toDS())
      .writeStream.format("memory").queryName("rate_anomaly_test")
      .outputMode("append").start()
    try {
      // three micro-batches so day closure crosses batch boundaries
      val (a, rest) = fixture.splitAt(fixture.length / 3)
      val (b, c) = rest.splitAt(rest.length / 2)
      Seq(a, b, c).foreach { part =>
        mem.addData(part.toIndexedSeq: _*)
        query.processAllAvailable()
      }
      // sentinel events on an unused user push the watermark past every
      // fixture day (delay = 1 day), then one more batch so the
      // event-time timeouts actually fire and flush trailing days
      val t0 = fixture.last.ts.getTime
      mem.addData(Event(9000001L,
        new Timestamp(t0 + 3L * 86400000L), 999999L, "tick", 0.0))
      query.processAllAvailable()
      mem.addData(Event(9000002L,
        new Timestamp(t0 + 4L * 86400000L), 999999L, "tick", 0.0))
      query.processAllAvailable()
      val streamed = spark.table("rate_anomaly_test")
        .filter(col("user_id") =!= 999999L)
        .select(col("user_id"), col("day"), col("cnt"),
          col("mean_cnt"), col("std_cnt"))
        .as[(Long, Long, Long, Double, Double)].collect().toSet
      assert(streamed == batch,
        s"stream/batch diverge: onlyStream=${(streamed -- batch).take(3)} " +
          s"onlyBatch=${(batch -- streamed).take(3)}")
    } finally query.stop()
  }

  test("attribution stream equals the batch q133 kernel") {
    val fixture = graft.ops.Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val batch = graft.ops.Extended
      .clickAttribution(graft.ops.Tables.events(spark, sfDir))
      .select(col("event_id"), col("user_id"), col("ts_s"),
        col("click_id"), col("gap_s"))
      .as[(Long, Long, String, Option[Long], Option[Long])].collect().toSet
    assert(batch.nonEmpty && batch.exists(_._4.isDefined),
      "fixture should contain attributed purchases")
    assert(batch.exists(_._4.isEmpty),
      "fixture should contain unattributed purchases")
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val query = attribution(spark, mem.toDS())
      .writeStream.format("memory").queryName("attribution_test")
      .outputMode("append").start()
    try {
      // event-time-ordered micro-batches: the documented parity regime
      val (a, rest) = fixture.splitAt(fixture.length / 3)
      val (b, c) = rest.splitAt(rest.length / 2)
      Seq(a, b, c).foreach { part =>
        mem.addData(part.toIndexedSeq: _*)
        query.processAllAvailable()
      }
      val streamed = spark.table("attribution_test")
        .as[(Long, Long, String, Option[Long], Option[Long])].collect().toSet
      assert(streamed == batch,
        s"stream/batch diverge: onlyStream=${(streamed -- batch).take(3)} " +
          s"onlyBatch=${(batch -- streamed).take(3)}")
    } finally query.stop()
  }

  test("sessionize stream equals sessionizeBatch on the fixture across micro-batches") {
    // the documented parity regime: event-time-ordered input split
    // across micro-batches, so sessions STITCH across batch boundaries
    // (a session opened in batch 1 extends in batch 2 and closes by a
    // later gap or by the watermark timeout)
    val fixture = graft.ops.Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    val batch = sessionizeBatch(
        graft.ops.Tables.events(spark, sfDir)
          .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
            col("value")))
      .select(col("user_id"), unix_micros(col("session_start")).as("s"),
        unix_micros(col("session_end")).as("e"), col("n_events"),
        col("total_value"))
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2, r._3, r._4) -> r._5).toMap
    assert(batch.nonEmpty)
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val query = sessionize(spark, mem.toDS())
      .writeStream.format("memory").queryName("sessionize_parity_test")
      .outputMode("append").start()
    try {
      // three micro-batches: cross-batch session stitching is the point
      val (a, rest) = fixture.splitAt(fixture.length / 3)
      val (b, c) = rest.splitAt(rest.length / 2)
      Seq(a, b, c).foreach { part =>
        mem.addData(part.toIndexedSeq: _*)
        query.processAllAvailable()
      }
      // sentinel ticks on an unused user push the watermark past every
      // open session's (last + gap) deadline; a second tick advances
      // the batch in which the event-time timeouts actually fire
      val t0 = fixture.last.ts.getTime
      mem.addData(Event(9000001L,
        new Timestamp(t0 + 86400000L), 999999L, "tick", 0.0))
      query.processAllAvailable()
      mem.addData(Event(9000002L,
        new Timestamp(t0 + 2 * 86400000L), 999999L, "tick", 0.0))
      query.processAllAvailable()
      val streamed = spark.table("sessionize_parity_test")
        .filter(col("user_id") =!= 999999L)
        .select(col("user_id"), unix_micros(col("session_start")).as("s"),
          unix_micros(col("session_end")).as("e"),
          col("n_events").cast("long"), col("total_value"))
        .as[(Long, Long, Long, Long, Double)].collect()
        .map(r => (r._1, r._2, r._3, r._4) -> r._5).toMap
      assert(streamed.keySet == batch.keySet,
        s"stream/batch session sets diverge: " +
          s"onlyStream=${(streamed.keySet -- batch.keySet).take(3)} " +
          s"onlyBatch=${(batch.keySet -- streamed.keySet).take(3)}")
      // double sums fold in different orders (stream: event-time order;
      // batch: partition order) — compare per-session with a relative
      // tolerance instead of bit equality
      streamed.foreach { case (k, v) =>
        val b = batch(k)
        assert(math.abs(v - b) <= 1e-9 * math.max(1.0, math.abs(b)),
          s"total_value diverges for session $k: stream=$v batch=$b")
      }
    } finally query.stop()
  }

  test("attribution state expiry is correctness-neutral (timeout then late purchase)") {
    implicit val sq = spark.sqlContext
    val S = 1000L // ms per second
    def ev(id: Long, user: Long, tpe: String, tMs: Long) =
      Event(id, new Timestamp(tMs), user, tpe, 0.0)
    val mem = MemoryStream[Event]
    // delay 90m: the t=3h tick moves the watermark to 1.5h — past the
    // click+window timeout (1h), so user 1's state expires, while the
    // t=2h purchase is still within allowed lateness and is processed
    val query = attribution(spark, mem.toDS(),
        windowUs = 3600000000L, watermarkDelay = "90 minutes")
      .writeStream.format("memory").queryName("attribution_ttl_test")
      .outputMode("append").start()
    try {
      // click at t=0; watermark pushed past click+window by a far-future
      // event on another user -> user 1's state times out
      mem.addData(ev(1L, 1L, "click", 0L))
      query.processAllAvailable()
      mem.addData(ev(2L, 2L, "click", 3L * 3600 * S))
      query.processAllAvailable()
      // purchase 2h after the click: outside the window, so expiry must
      // not change the answer — unattributed either way
      mem.addData(ev(3L, 1L, "purchase", 2L * 3600 * S))
      query.processAllAvailable()
      val got = spark.table("attribution_ttl_test")
        .as[(Long, Long, String, Option[Long], Option[Long])].collect()
        .filter(_._1 == 3L)
      assert(got.length == 1 && got.head._4.isEmpty,
        s"expired-state purchase must be unattributed: ${got.toList}")
    } finally query.stop()
  }

  test("debounce: an admissible late straggler never regresses state (in-order events after it stay batch-identical)") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val query = debounce(spark, mem.toDS()) // gap 5 min, watermark 10 min
      .writeStream.format("memory").queryName("debounce_late_test")
      .outputMode("append").start()
    try {
      // batch 1: t=100min (kept; watermark after batch -> 90min)
      mem.addData(Event(1L, ts(100), 7L, "retry", 0.0))
      query.processAllAvailable()
      // batch 2: admissible late straggler t=95 (>= watermark 90) plus
      // an in-order event t=101. If the straggler regressed state to
      // 95, the 101 event would see a 6min > 5min gap and be WRONGLY
      // kept — batch lag compares it to t=100 (1min) and drops it.
      mem.addData(Event(2L, ts(95), 7L, "retry", 0.0),
        Event(3L, ts(101), 7L, "retry", 0.0))
      query.processAllAvailable()
      val kept = spark.table("debounce_late_test")
        .select("event_id").as[Long].collect().toSet
      assert(kept == Set(1L),
        s"late straggler corrupted debounce state: kept $kept")
    } finally query.stop()
  }

  test("sessionize: an admissible event older than start-gap becomes its own session, never glue") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    // huge watermark delay keeps a very old event admissible
    val query = sessionize(spark, mem.toDS(), gapMinutes = 30,
        watermarkDelay = "600 minutes")
      .writeStream.format("memory").queryName("session_late_test")
      .outputMode("append").start()
    try {
      mem.addData(Event(1L, ts(300), 5L, "view", 1.0))
      query.processAllAvailable()
      // t=0 is 270min before the open session's start - far past the
      // 30min gap: the batch kernel puts it in a SEPARATE session.
      // Pre-fix it merged and dragged session_start back to t=0.
      mem.addData(Event(2L, ts(0), 5L, "view", 2.0))
      query.processAllAvailable()
      val got = spark.table("session_late_test")
        .as[Session].collect().toList
      assert(got.map(s => (s.session_start, s.session_end, s.n_events)) ==
        List((ts(0), ts(0), 1)),
        s"too-old straggler must emit as a singleton session: $got")
      // and the open session was untouched: an in-order event still
      // chains to it under the gap rule
      mem.addData(Event(3L, ts(310), 5L, "view", 3.0))
      query.processAllAvailable()
      assert(spark.table("session_late_test").as[Session].collect().length == 1,
        "open session must remain open (t=310 chains to t=300)")
    } finally query.stop()
  }

  test("attribution ts_s renders in the SESSION timezone and floors pre-1970 millis (q133 parity off-UTC)") {
    val tzBefore = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      // pre-1970 pair: click 1969-12-31T23:59:00Z, purchase at
      // 23:59:59.9995Z — truncation toward zero would render the
      // purchase as 1970-01-01 00:00:00 UTC; floor + NY zone must
      // match batch date_format exactly
      val click = new Timestamp(-60000L)
      val purchase = new Timestamp(-1L); purchase.setNanos(999500000)
      val evs = Seq(
        Event(1L, click, 3L, "click", 0.0),
        Event(2L, purchase, 3L, "purchase", 5.0))
      // batch execution of the streaming operator (timeouts never fire)
      val streamed = attribution(spark, evs.toDS())
        .select("event_id", "ts_s").as[(Long, String)].collect().toMap
      val batch = graft.ops.Extended.clickAttribution(evs.toDF())
        .select("event_id", "ts_s").as[(Long, String)].collect().toMap
      assert(streamed(2L) == batch(2L),
        s"stream ts_s '${streamed(2L)}' != batch '${batch(2L)}' off-UTC/pre-1970")
      assert(streamed(2L) == "1969-12-31 18:59:59", streamed(2L))
    } finally spark.conf.set("spark.sql.session.timeZone", tzBefore)
  }
}
