package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, sum}
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamOps
import graft.streaming.StreamOps.SessionEvent

class StreamOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private var sinkId = 0
  private def nextSink(): String = { sinkId += 1; s"stream_sink_$sinkId" }

  case class Ev(event_id: Long, ts: Timestamp, event_type: String, value: Double)

  test("windowedCounts aggregates per event-time window under a watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val sink = nextSink()
    val q = StreamOps.windowedCounts(in.toDF(), "1 hour", "2 hours")
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(
        Ev(1, ts("2024-01-01 10:05:00"), "click", 1.0),
        Ev(2, ts("2024-01-01 10:55:00"), "click", 2.0),
        Ev(3, ts("2024-01-01 11:05:00"), "click", 4.0),
        Ev(4, ts("2024-01-01 10:30:00"), "view", 8.0))
      q.processAllAvailable()
      val rows = spark.table(sink)
        .select("w_start", "event_type", "n_events", "sum_value")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(rows === Set(
        (ts("2024-01-01 10:00:00"), "click", 2L, 3.0),
        (ts("2024-01-01 11:00:00"), "click", 1L, 4.0),
        (ts("2024-01-01 10:00:00"), "view", 1L, 8.0)))
    } finally q.stop()
  }

  test("ohlcStream: closed hours emit once and match the batch bars " +
       "bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val sink = nextSink()
    val q = StreamOps.ohlcStream(in.toDF(), watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append()).start()
    try {
      val batch = Seq(
        Ev(2, ts("2024-01-01 10:05:00"), "m", 5.0),
        Ev(1, ts("2024-01-01 10:05:00"), "m", 1.0), // same ts: id ties
        Ev(3, ts("2024-01-01 10:50:00"), "m", 9.0),
        Ev(4, ts("2024-01-01 10:55:00"), "m", 2.0))
      in.addData(batch)
      q.processAllAvailable()
      assert(spark.table(sink).count() === 0, "hour still open")
      // advance the watermark past 11:10 to close the 10:00 hour
      in.addData(Ev(9, ts("2024-01-01 11:30:00"), "m", 7.0))
      q.processAllAvailable()
      in.addData(Ev(10, ts("2024-01-01 11:31:00"), "m", 0.0))
      q.processAllAvailable()
      val streamed = spark.table(sink)
        .select("bar_ts", "event_type", "n", "open", "high", "low",
          "close")
        .as[(Timestamp, String, Long, Double, Double, Double, Double)]
        .collect().toSet
      val batchBars = graft.operators.EventOps.ohlcBars(
          batch.map(e => (e.event_id, e.ts, e.event_type, e.value))
            .toDF("event_id", "ts", "event_type", "value"))
        .select("bar_ts", "event_type", "n", "open", "high", "low",
          "close")
        .as[(Timestamp, String, Long, Double, Double, Double, Double)]
        .collect().toSet
      assert(streamed === batchBars,
        s"stream/batch parity: $streamed vs $batchBars")
      assert(streamed.head._4 === 1.0 && streamed.head._7 === 2.0,
        "open = lowest id at the tied opening ts, close = last event")
    } finally q.stop()
  }

  test("changepointStream: watermark-closed hourly counts replay through " +
       "changepointFromHourly bit-identical to batch changepoint") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val sink = nextSink()
    val q = StreamOps.changepointStream(in.toDF(),
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append()).start()
    try {
      // a level shift: hours 10 and 11 hold one event, hour 12 holds
      // four — D_k peaks at the 11->12 boundary
      val closed = Seq(
        Ev(1, ts("2024-01-01 10:05:00"), "m", 1.0),
        Ev(2, ts("2024-01-01 11:05:00"), "m", 1.0),
        Ev(3, ts("2024-01-01 12:05:00"), "m", 1.0),
        Ev(4, ts("2024-01-01 12:10:00"), "m", 1.0),
        Ev(5, ts("2024-01-01 12:15:00"), "m", 1.0),
        Ev(6, ts("2024-01-01 12:20:00"), "m", 1.0))
      // hour 12 splits across two triggers, forcing a state-store merge
      // of the stored count with the second trigger's partial; the
      // watermark after both (12:20 − 10min) has closed hours 10 and 11
      // but hour 12 is still open
      in.addData(closed.take(4))
      q.processAllAvailable()
      in.addData(closed.drop(4))
      q.processAllAvailable()
      assert(spark.table(sink).count() <= 2, "hour 12 still open")
      // advance the watermark far past 13:10 to close hours 10..12
      in.addData(Ev(9, ts("2024-01-01 14:30:00"), "m", 7.0))
      q.processAllAvailable()
      in.addData(Ev(10, ts("2024-01-01 14:31:00"), "m", 0.0))
      q.processAllAvailable()
      val hourly = spark.table(sink)
      assert(hourly.count() === 3, "exactly the three closed hours emit")
      val monitor = graft.operators.EventOps
        .changepointFromHourly(hourly)
        .select("event_type", "k", "bucket_ts", "n_buckets", "d",
          "mean_before", "mean_after")
        .as[(String, Long, Timestamp, Long, Long, Double, Double)]
        .collect().toSet
      val batchCp = graft.operators.EventOps.changepoint(
          closed.map(e => (e.event_id, e.ts, e.event_type, e.value))
            .toDF("event_id", "ts", "event_type", "value"))
        .select("event_type", "k", "bucket_ts", "n_buckets", "d",
          "mean_before", "mean_after")
        .as[(String, Long, Timestamp, Long, Long, Double, Double)]
        .collect().toSet
      assert(monitor === batchCp,
        s"stream/batch parity: $monitor vs $batchCp")
      // and the located shift is the 11->12 boundary (k = 2, the
      // last bucket of the low regime)
      assert(monitor.head._2 === 2L &&
        monitor.head._3 === ts("2024-01-01 11:00:00"))
    } finally q.stop()
  }

  test("frequentItemsStream: per-window MG candidates contain every heavy key") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val sink = nextSink()
    val q = StreamOps.frequentItemsStream(in.toDF(), "event_type", k = 2,
        "1 hour", "2 hours")
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Complete()).start()
    try {
      // two triggers over one window force a state-store merge of the
      // stored sketch with the second trigger's partial
      in.addData(
        Ev(1, ts("2024-01-01 10:05:00"), "click", 1.0),
        Ev(2, ts("2024-01-01 10:10:00"), "click", 1.0),
        Ev(3, ts("2024-01-01 10:15:00"), "view", 1.0))
      q.processAllAvailable()
      in.addData(
        Ev(4, ts("2024-01-01 10:20:00"), "click", 1.0),
        Ev(5, ts("2024-01-01 10:25:00"), "click", 1.0),
        Ev(6, ts("2024-01-01 10:30:00"), "scroll", 1.0),
        Ev(7, ts("2024-01-01 11:05:00"), "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table(sink)
        .as[(Timestamp, String, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
      val w10 = rows(ts("2024-01-01 10:00:00"))
      // window 10:00 holds n=6 (4 click, 1 view, 1 scroll), k=2 →
      // threshold 6/3 = 2: click(4) is guaranteed present with weight
      // in [4 - 2, 4]; the summary never exceeds k entries
      assert(w10.contains("click"))
      assert(w10("click") >= 2L && w10("click") <= 4L)
      assert(w10.size <= 2)
      assert(rows(ts("2024-01-01 11:00:00")) === Map("view" -> 1L))
    } finally q.stop()
  }

  test("cmsStream: windowed counter grid merges across triggers; probe " +
       "recovers exact counts at sane width") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val sink = nextSink()
    val q = StreamOps.cmsStream(in.toDF(), "event_type", width = 64,
        depth = 3, "1 hour", "2 hours")
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(
        Ev(1, ts("2024-01-01 10:05:00"), "click", 1.0),
        Ev(2, ts("2024-01-01 10:10:00"), "view", 1.0))
      q.processAllAvailable()
      in.addData( // second trigger folds into the SAME window's counters
        Ev(3, ts("2024-01-01 10:20:00"), "click", 1.0),
        Ev(4, ts("2024-01-01 11:05:00"), "view", 1.0))
      q.processAllAvailable()
      val sketch10 = spark.table(sink)
        .filter(col("w_start") === ts("2024-01-01 10:00:00"))
        .select("i", "b", "c")
      // grid bounded by d×w regardless of key count; mass = d·rows
      assert(sketch10.count() <= 64L * 3)
      assert(sketch10.agg(sum("c")).as[Long].head() === 3L * 3)
      // batch probe over the streamed sketch: 2 keys in 64 buckets
      // collide with nothing, so estimates are EXACT
      val keys = Seq("click", "view", "absent").toDF("event_type")
      val est = operators.Profiling.cmsProbe(keys, sketch10,
          "event_type", width = 64, depth = 3)
        .as[(String, Long)].collect().toMap
      assert(est === Map("click" -> 2L, "view" -> 1L, "absent" -> 0L),
        "streamed and batch-built sketches share the hash family")
    } finally q.stop()
  }

  test("quantileStream: digest state merges across triggers; rank guarantee") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val sink = nextSink()
    val q = StreamOps.quantileStream(in.toDF(), "value", p = 0.5,
        accuracy = 100, groupCol = "event_type",
        windowLength = "1 hour", watermarkDelay = "2 hours")
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Complete()).start()
    try {
      // two triggers over one window: the stored digest for (10:00,
      // click) must merge with the second trigger's partial
      in.addData(
        Ev(1, ts("2024-01-01 10:05:00"), "click", 10.0),
        Ev(2, ts("2024-01-01 10:10:00"), "click", 20.0))
      q.processAllAvailable()
      in.addData(
        Ev(3, ts("2024-01-01 10:20:00"), "click", 30.0),
        Ev(4, ts("2024-01-01 10:25:00"), "click", 40.0),
        Ev(5, ts("2024-01-01 10:30:00"), "click", 50.0),
        Ev(6, ts("2024-01-01 11:05:00"), "view", 7.0))
      q.processAllAvailable()
      val rows = spark.table(sink)
        .as[(Timestamp, String, Double)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      // {10,20,30,40,50}: with n=5 ≤ accuracy the sketch is exact → 30
      assert(rows((ts("2024-01-01 10:00:00"), "click")) === 30.0,
        "median over BOTH triggers — digest merged, not replaced")
      assert(rows((ts("2024-01-01 11:00:00"), "view")) === 7.0)
    } finally q.stop()
  }

  test("dedupStream drops duplicate event ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val sink = nextSink()
    val q = StreamOps.dedupStream(in.toDF(), "1 hour")
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        Ev(1, ts("2024-01-01 10:00:00"), "click", 1.0),
        Ev(1, ts("2024-01-01 10:00:01"), "click", 1.0), // dup id
        Ev(2, ts("2024-01-01 10:00:02"), "view", 2.0))
      q.processAllAvailable()
      in.addData(Ev(1, ts("2024-01-01 10:10:00"), "click", 9.0)) // still dup
      q.processAllAvailable()
      assert(spark.table(sink).select("event_id").as[Long].collect().sorted
        === Array(1L, 2L))
    } finally q.stop()
  }

  test("file-source stream: windowed counts over parquet files, AvailableNow") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    Seq(
      (1L, ts("2024-01-01 10:05:00"), "click", 1.0),
      (2L, ts("2024-01-01 10:55:00"), "click", 2.0),
      (3L, ts("2024-01-01 11:05:00"), "view", 4.0))
      .toDF("event_id", "ts", "event_type", "value")
      .write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val in = StreamOps.readEventsStream(spark, s"$dir/in", schema)
    assert(in.isStreaming)
    val sink = nextSink()
    val q = StreamOps.windowedCounts(in, "1 hour", "2 hours")
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000)
      val rows = spark.table(sink)
        .select("w_start", "event_type", "n_events")
        .as[(Timestamp, String, Long)].collect().toSet
      assert(rows === Set(
        (ts("2024-01-01 10:00:00"), "click", 2L),
        (ts("2024-01-01 11:00:00"), "view", 1L)))
    } finally q.stop()
  }

  test("windowedCounts drops events older than the watermark (late data)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val sink = nextSink()
    // Append mode: a window only emits once finalized by the watermark,
    // and late events behind the watermark are dropped.
    val q = StreamOps.windowedCounts(in.toDF(), "1 hour", "30 minutes")
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(Ev(1, ts("2024-01-01 10:10:00"), "click", 1.0))
      q.processAllAvailable()
      // advance watermark far past the 10:00 window (wm = 14:00 - 0:30)
      in.addData(Ev(2, ts("2024-01-01 14:00:00"), "click", 1.0))
      q.processAllAvailable()
      // this event is 3h behind the watermark — must be ignored
      in.addData(Ev(3, ts("2024-01-01 10:20:00"), "click", 7.0))
      q.processAllAvailable()
      // one more batch so finalized windows flush
      in.addData(Ev(4, ts("2024-01-01 15:00:00"), "click", 1.0))
      q.processAllAvailable()
      val tenOClock = spark.table(sink)
        .filter(col("w_start") === ts("2024-01-01 10:00:00"))
        .select("n_events").as[Long].collect()
      assert(tenOClock.toSeq === Seq(1L),
        "the 10:00 window holds only the on-time event; the late one dropped")
    } finally q.stop()
  }

  test("enrichStream: stream-static left join keeps unmatched events") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("click", 1.0), ("view", 0.1)).toDF("event_type", "weight")
    val in = MemoryStream[Ev]
    val sink = nextSink()
    val q = StreamOps.enrichStream(in.toDF(), dim, "event_type")
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        Ev(1, ts("2024-01-01 10:00:00"), "click", 1.0),
        Ev(2, ts("2024-01-01 10:00:01"), "install", 2.0)) // not in dim
      q.processAllAvailable()
      val rows = spark.table(sink)
        .select("event_id", "weight").as[(Long, Option[Double])]
        .collect().toMap
      assert(rows(1L).contains(1.0))
      assert(rows(2L).isEmpty, "left join: unmatched event survives with null")
    } finally q.stop()
  }

  test("writeParquetStream: file-to-file incremental pipeline, restart-safe") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-sink").toString
    Seq((1L, ts("2024-01-01 10:05:00"), "click", 1.0))
      .toDF("event_id", "ts", "event_type", "value")
      .write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    def runOnce(): Unit = {
      val in = StreamOps.readEventsStream(spark, s"$dir/in", schema)
      val q = StreamOps.writeParquetStream(in.filter(col("value") > 0),
        s"$dir/out", s"$dir/ckpt", partitionBy = Seq("event_type"))
      q.awaitTermination(60000); q.stop()
    }
    runOnce()
    assert(spark.read.parquet(s"$dir/out").count() === 1)
    // second batch of input + a restarted query: only the new file is
    // processed (checkpoint), output is cumulative, not duplicated
    Seq((2L, ts("2024-01-01 10:06:00"), "view", 2.0))
      .toDF("event_id", "ts", "event_type", "value")
      .write.mode("append").parquet(s"$dir/in")
    runOnce()
    val out = spark.read.parquet(s"$dir/out")
    assert(out.count() === 2, "no reprocessing, no loss across restarts")
    val partDirs = new java.io.File(s"$dir/out").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("event_type="))
    assert(partDirs.sorted.toSeq === Seq("event_type=click", "event_type=view"),
      "Hive-layout partition directories on disk")
  }

  test("joinStreamsWithin pairs events in the window, drops far-apart ones") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val sink = nextSink()
    val q = StreamOps.joinStreamsWithin(
        clicks.toDF().toDF("user_id", "cts", "click_id"),
        purchases.toDF().toDF("user_id", "pts", "amount"),
        "user_id", "cts", "pts", within = "1 hour")
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData(
        (7L, ts("2024-01-01 10:00:00"), 1L),
        (8L, ts("2024-01-01 10:00:00"), 2L))
      purchases.addData(
        (7L, ts("2024-01-01 10:30:00"), 9.99),   // within 1h of click 1
        (8L, ts("2024-01-01 15:00:00"), 5.00))   // 5h later — outside
      q.processAllAvailable()
      val rows = spark.table(sink)
        .select("click_id", "amount").as[(Long, Double)].collect().toSet
      assert(rows === Set((1L, 9.99)),
        "only the within-window pair joins; no cross-user pairing")
    } finally q.stop()
  }

  test("joinStreamsWithin left_outer: unmatched left emits null-padded after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val sink = nextSink()
    val q = StreamOps.joinStreamsWithin(
        clicks.toDF().toDF("user_id", "cts", "click_id"),
        purchases.toDF().toDF("user_id", "pts", "amount"),
        "user_id", "cts", "pts", within = "1 hour",
        watermarkDelay = "1 minute", joinType = "left_outer")
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData(
        (7L, ts("2024-01-01 10:00:00"), 1L),   // will match
        (8L, ts("2024-01-01 10:00:00"), 2L))   // never matches
      purchases.addData((7L, ts("2024-01-01 10:30:00"), 9.99))
      q.processAllAvailable()
      // advance both watermarks far past 10:00 + 1h + delay, twice so the
      // state-store eviction that emits the null-padded row runs
      for (_ <- 1 to 2) {
        clicks.addData((99L, ts("2024-01-01 20:00:00"), 99L))
        purchases.addData((98L, ts("2024-01-01 20:00:00"), 0.0))
        q.processAllAvailable()
      }
      val rows = spark.table(sink)
        .filter(col("click_id").isin(1L, 2L))
        .select("click_id", "amount")
        .as[(Long, Option[Double])].collect().toSet
      assert(rows === Set((1L, Some(9.99)), (2L, None)),
        "matched row joins; unmatched left emits once with nulls")
    } finally q.stop()
  }

  test("sessionize splits same-batch events separated by more than the gap") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    val sink = nextSink()
    val q = StreamOps.sessionize(in.toDS(), gapMs = 5 * 60 * 1000L,
        watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append()).start()
    try {
      // user 7's whole history in ONE batch (AvailableNow-style replay):
      // [10:00, 10:02] then 30 min of silence then [10:32, 10:33].
      in.addData(
        SessionEvent(7L, ts("2024-01-01 10:00:00"), 1.0),
        SessionEvent(7L, ts("2024-01-01 10:02:00"), 2.0),
        SessionEvent(7L, ts("2024-01-01 10:32:00"), 4.0),
        SessionEvent(7L, ts("2024-01-01 10:33:00"), 8.0))
      q.processAllAvailable()
      // The first session closes on the data path, before any timeout.
      val early = spark.table(sink)
        .select("user_id", "session_start", "session_end", "n_events", "sum_value")
        .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet
      assert(early === Set(
        (7L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:02:00"), 2L, 3.0)))
      // Advance the watermark so the second session times out too.
      in.addData(SessionEvent(99L, ts("2024-01-01 12:00:00"), 0.0))
      q.processAllAvailable()
      in.addData(SessionEvent(99L, ts("2024-01-01 12:00:01"), 0.0))
      q.processAllAvailable()
      val all = spark.table(sink)
        .select("user_id", "session_start", "session_end", "n_events", "sum_value")
        .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet
      assert(all.contains(
        (7L, ts("2024-01-01 10:32:00"), ts("2024-01-01 10:33:00"), 2L, 12.0)))
    } finally q.stop()
  }

  test("sessionize: late events split, extend, and coalesce like a batch pass") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    val sink = nextSink()
    // long watermark delay so the late events are still admitted
    val q = StreamOps.sessionize(in.toDS(), gapMs = 5 * 60 * 1000L,
        watermarkDelay = "2 hours")
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(SessionEvent(7L, ts("2024-01-01 10:30:00"), 1.0))
      q.processAllAvailable()
      // 30 min late — far more than the 5-min gap before [10:30]'s
      // start, so it must become a separate session, not merge
      in.addData(SessionEvent(7L, ts("2024-01-01 10:00:00"), 2.0))
      q.processAllAvailable()
      // later late event within gap of 10:00: must coalesce with it
      // (the session is still pending, not yet emitted)
      in.addData(SessionEvent(7L, ts("2024-01-01 10:02:00"), 4.0))
      q.processAllAvailable()
      assert(spark.table(sink).count() === 0,
        "nothing final until the watermark passes end + gap")
      // advance the watermark past 10:02 + gap but not past 10:30 + gap
      in.addData(SessionEvent(99L, ts("2024-01-01 12:31:00"), 0.0))
      q.processAllAvailable()
      in.addData(SessionEvent(99L, ts("2024-01-01 12:31:01"), 0.0))
      q.processAllAvailable()
      val sessions = spark.table(sink)
        .filter(col("user_id") === 7L)
        .select("user_id", "session_start", "session_end", "n_events", "sum_value")
        .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet
      assert(sessions === Set(
        (7L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:02:00"), 2L, 6.0)),
        "the two late events form ONE session, exactly as batch would; " +
          "[10:30] may or may not have expired yet depending on wm")
    } finally q.stop()
  }

  test("upsertStream: per-batch SCD-1 merge into a keyed manifest table") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Long)]
    val dir = java.nio.file.Files.createTempDirectory("graft-upsert").toString
    val table = s"$dir/table"; val ckpt = s"$dir/ckpt"
    def run(): Unit = {
      val q = StreamOps.upsertStream(
        in.toDF().toDF("k", "v", "ver"), table, ckpt,
        keys = Seq("k"), versionCol = Some("ver"), nBuckets = 8)
      try q.processAllAvailable() finally q.stop()
    }
    def state(): Set[(Long, String, Long)] =
      graft.sources.ManifestTable.read(spark, table)
        .select("k", "v", "ver").as[(Long, String, Long)].collect().toSet
    // batch 1: two keys, within-batch duplicate on k=1 (ver 2 wins)
    in.addData((1L, "a1", 1L), (1L, "a2", 2L), (2L, "b1", 1L))
    run()
    assert(state() === Set((1L, "a2", 2L), (2L, "b1", 1L)))
    // batch 2: update k=2, insert k=3; k=1 untouched
    in.addData((2L, "b2", 5L), (3L, "c1", 1L))
    run()
    assert(state() === Set((1L, "a2", 2L), (2L, "b2", 5L), (3L, "c1", 1L)))
    // the streaming commits recorded their batch ids (replay protection)
    val Some((version, batchId)) =
      graft.sources.ManifestTable.currentVersionAndBatch(spark, table)
    assert(version === 2L && batchId === 1L)
  }

  test("rateDriftStream: log-ratio vs baseline per window; novel keys " +
       "flag as drift") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val baseline = Seq(("click", 2.0), ("view", 4.0))
      .toDF("event_type", "expected")
    val sink = nextSink()
    val q = StreamOps.rateDriftStream(in.toDF(), baseline)
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(
        Ev(1, ts("2024-01-01 10:05:00"), "click", 1.0),
        Ev(2, ts("2024-01-01 10:10:00"), "click", 1.0),
        Ev(3, ts("2024-01-01 10:15:00"), "click", 1.0),
        Ev(4, ts("2024-01-01 10:20:00"), "click", 1.0),
        Ev(5, ts("2024-01-01 10:25:00"), "view", 1.0),
        Ev(6, ts("2024-01-01 10:30:00"), "purchase", 1.0))
      q.processAllAvailable()
      val rows = spark.table(sink)
        .select("event_type", "cnt", "log_ratio", "drifted")
        .as[(String, Long, Option[Double], Boolean)].collect().toSet
      assert(rows === Set(
        ("click", 4L, Some(0.693147181), true),   // 2x up: ln 2, flagged
        ("view", 1L, Some(-1.386294361), true),   // 4x down, flagged
        ("purchase", 1L, None, true)),            // novel key = drift
        "log-ratio threshold is inclusive at ln 2; novelty flags")
      // a within-band window must NOT flag
      in.addData(
        Ev(7, ts("2024-01-01 11:05:00"), "click", 1.0),
        Ev(8, ts("2024-01-01 11:10:00"), "click", 1.0),
        Ev(9, ts("2024-01-01 11:20:00"), "click", 1.0))
      q.processAllAvailable()
      val w11 = spark.table(sink)
        .filter(col("window_start") === ts("2024-01-01 11:00:00"))
        .select("event_type", "drifted").as[(String, Boolean)].collect()
      assert(w11.toSeq === Seq(("click", false)),
        "3 clicks vs expected 2: |ln 1.5| < ln 2, inside the band")
    } finally q.stop()
  }

  test("guardedUpsertStream: poisoned micro-batch bounces whole; audit " +
       "table records both verdicts") {
    import graft.operators.Profiling.{InRange, NotNull}
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Long)]
    val dir = java.nio.file.Files.createTempDirectory("graft-guard").toString
    val table = s"$dir/table"; val audit = s"$dir/audit"
    val ckpt = s"$dir/ckpt"
    def run(): Unit = {
      val q = StreamOps.guardedUpsertStream(
        in.toDF().toDF("k", "v", "ver"), table, audit, ckpt,
        keys = Seq("k"), rules = Seq(NotNull("v"), InRange("ver", 0, 10)),
        nBuckets = 8)
      try q.processAllAvailable() finally q.stop()
    }
    def state(): Set[(Long, String, Long)] =
      graft.sources.ManifestTable.read(spark, table)
        .select("k", "v", "ver").as[(Long, String, Long)].collect().toSet
    in.addData((1L, "a", 1L), (2L, "b", 2L))       // clean → commits
    run()
    assert(state() === Set((1L, "a", 1L), (2L, "b", 2L)))
    in.addData((2L, "b2", 99L), (3L, "c", 1L))     // 99 > 10 → bounced
    run()
    assert(state() === Set((1L, "a", 1L), (2L, "b", 2L)),
      "a violating micro-batch must not change the governed table")
    val auditRows = graft.sources.ManifestTable.read(spark, audit)
      .select("batch_id", "rule", "violations", "committed")
      .as[(Long, String, Long, Boolean)].collect().toSet
    assert(auditRows === Set(
      (0L, "not_null(v)", 0L, true), (0L, "in_range(ver)", 0L, true),
      (1L, "not_null(v)", 0L, false), (1L, "in_range(ver)", 1L, false)),
      "audit trail carries per-batch, per-rule verdicts")
  }

  test("dedupIngestStream: batches probe the growing index; near-dups die") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val dir = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val idx = s"$dir/index"; val out = s"$dir/docs"; val ckpt = s"$dir/ckpt"
    def run(): Unit = {
      val q = StreamOps.dedupIngestStream(
        in.toDF().toDF("doc_id", "text"), idx, out, ckpt, nBuckets = 8)
      try q.processAllAvailable() finally q.stop()
    }
    def kept(): Set[Long] =
      graft.sources.ManifestTable.read(spark, out)
        .select("doc_id").as[Long].collect().toSet
    val tA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val tB = "one two three four five six seven eight nine ten"
    val tD = "red orange yellow green blue indigo violet umber ochre teal"
    // batch 1: two unrelated docs — first commit, nothing to collide with
    in.addData((1L, tA), (2L, tB))
    run()
    assert(kept() === Set(1L, 2L))
    // batch 2: doc 3 duplicates doc 1's text (certain LSH recall), doc 4
    // is new — the probe runs against the index batch 1 built
    in.addData((3L, tA), (4L, tD))
    run()
    assert(kept() === Set(1L, 2L, 4L))
    // the index holds signatures for survivors only (bands × 3 docs),
    // so dead doc 3 can never contaminate a later probe
    val idxIds = graft.sources.ManifestTable.read(spark, idx)
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(idxIds === Set(1L, 2L, 4L))
    // batch 3: a dup of batch-2 survivor 4 — the EXTENDED index catches it
    in.addData((5L, tD))
    run()
    assert(kept() === Set(1L, 2L, 4L))
  }

  test("mediaIngestStream: batches probe the growing perceptual index; " +
       "near-dup payloads die, the extended index catches re-ingests") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Array[Byte])]
    val dir = java.nio.file.Files
      .createTempDirectory("graft-media-ingest").toString
    val (idx, out, ckpt) = (s"$dir/sigidx", s"$dir/media", s"$dir/ckpt")
    def run(): Unit = {
      val q = StreamOps.mediaIngestStream(
        in.toDF().toDF("media_id", "payload"), idx, out, ckpt,
        nBuckets = 8)
      try q.processAllAvailable() finally q.stop()
    }
    def kept(): Set[Long] =
      graft.sources.ManifestTable.read(spark, out)
        .select("media_id").as[Long].collect().toSet
    def b(s: String) = s.getBytes("UTF-8")
    // batch 1: two unrelated payloads seed the index
    in.addData((1L, b("ABCDEFGH" * 4)), (2L, b("QRSTUVWX" * 3)))
    run()
    assert(kept() === Set(1L, 2L))
    // batch 2: 3 perceptually duplicates 1 (same window set, different
    // repeat count), 4 is new
    in.addData((3L, b("ABCDEFGH" * 2)), (4L, b("13572468" * 3)))
    run()
    assert(kept() === Set(1L, 2L, 4L))
    // the index holds survivors only — dead 3 can't contaminate later
    assert(graft.sources.ManifestTable.read(spark, idx)
      .select("media_id").as[Long].collect().toSet === Set(1L, 2L, 4L))
    // batch 3: a dup of batch-2 survivor 4 — the EXTENDED index bites
    in.addData((5L, b("13572468" * 6)))
    run()
    assert(kept() === Set(1L, 2L, 4L))
  }

  test("classifyStream labels every doc from the stored model, " +
      "including all-OOV docs") {
    import graft.operators.TextAnalysis
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val dir = java.nio.file.Files
      .createTempDirectory("graft-classify").toString
    val (mp, pp, out, ckpt) =
      (s"$dir/model", s"$dir/priors", s"$dir/pred", s"$dir/ckpt")
    // train once, commit the artifact; the stream only ever reads it
    val train = Seq(
      (1L, "spam", "buy cheap pills now"),
      (2L, "spam", "cheap pills cheap deals"),
      (3L, "ham", "meeting notes for tuesday"),
      (4L, "ham", "notes about the quarterly report")
    ).toDF("doc_id", "label", "text")
    val (model, priors) = TextAnalysis.nbTrain(train, "label", "text")
    graft.sources.ManifestTable.upsertBatch(model, mp,
      Seq("token", "label"), nBuckets = 4, batchId = 0L)
    graft.sources.ManifestTable.upsertBatch(priors, pp,
      Seq("label"), nBuckets = 1, batchId = 0L)
    def run(): Unit = {
      val q = StreamOps.classifyStream(
        in.toDF().toDF("doc_id", "text"), mp, pp, out, ckpt, nBuckets = 4)
      try q.processAllAvailable() finally q.stop()
    }
    def preds(): Map[Long, String] =
      graft.sources.ManifestTable.read(spark, out)
        .select("doc_id", "predicted").as[(Long, String)].collect().toMap
    in.addData((10L, "cheap deals now"), (11L, "quarterly meeting notes"))
    run()
    assert(preds() === Map(10L -> "spam", 11L -> "ham"))
    // batch 2: an all-OOV doc still gets labeled (prior tie → ham, the
    // first label) — the stream never drops an input
    in.addData((12L, "zzz qqq www"))
    run()
    assert(preds() === Map(10L -> "spam", 11L -> "ham", 12L -> "ham"))
  }

  test("encodeStream tokenizes each batch from the stored artifact, " +
      "unseen words fall apart into trained subwords") {
    import graft.operators.Ngrams
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val dir = java.nio.file.Files
      .createTempDirectory("graft-encode").toString
    val (mp, vp, out, ckpt) =
      (s"$dir/merges", s"$dir/vocab", s"$dir/ids", s"$dir/ckpt")
    val train = Seq((1L, "aa aa ab")).toDF("doc_id", "text")
    graft.sources.ManifestTable.upsertBatch(
      Ngrams.bpeTrain(train, numMerges = 1), mp,
      Seq("rank"), nBuckets = 1, batchId = 0L)
    graft.sources.ManifestTable.upsertBatch(
      Ngrams.bpeVocab(train, numMerges = 1), vp, // a=1, aa=2, b=3
      Seq("sym"), nBuckets = 1, batchId = 0L)
    def run(): Unit = {
      val q = StreamOps.encodeStream(
        in.toDF().toDF("doc_id", "text"), mp, vp, out, ckpt, nBuckets = 4)
      try q.processAllAvailable() finally q.stop()
    }
    def ids(): Map[Long, String] =
      graft.sources.ManifestTable.read(spark, out)
        .select("doc_id", "token_ids").as[(Long, String)].collect().toMap
    in.addData((10L, "aa ab"))
    run()
    assert(ids() === Map(10L -> "2,1,3"))
    // batch 2: unseen "aab" → merge replay → [aa, b]; novel chars → OOV
    in.addData((11L, "aab cd"))
    run()
    assert(ids() === Map(10L -> "2,1,3", 11L -> "2,3,0,0"))
  }

  test("unigramEncodeStream encodes each batch from the stored " +
      "vocabulary; stream output equals the direct encode; replay " +
      "is a no-op") {
    import graft.operators.Ngrams
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val dir = java.nio.file.Files
      .createTempDirectory("graft-uni-stream").toString
    val (vp, out, ckpt) = (s"$dir/vocab", s"$dir/ids", s"$dir/ckpt")
    val train = Seq((1L, "alpha beta alpha gamma")).toDF("doc_id", "text")
    Ngrams.clearUnigramCache()
    graft.sources.ManifestTable.upsertBatch(
      Ngrams.unigramTrain(train, vocabSize = 8, maxPieceLen = 3,
        rounds = 1, seedSize = 4),
      vp, Seq("piece"), nBuckets = 1, batchId = 0L)
    def run(): Unit = {
      val q = StreamOps.unigramEncodeStream(
        in.toDF().toDF("doc_id", "text"), vp, out, ckpt,
        maxPieceLen = 3, nBuckets = 4)
      try q.processAllAvailable() finally q.stop()
    }
    def got(): Map[Long, (Long, Long, String)] =
      graft.sources.ManifestTable.read(spark, out)
        .select("doc_id", "n_toks", "n_ids", "token_ids")
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val batch1 = Seq((10L, "alpha gamma"), (11L, "beta zz9"))
      .toDF("doc_id", "text")
    in.addData((10L, "alpha gamma"), (11L, "beta zz9"))
    run()
    // stream output == the direct serve-path call on the same batch
    val direct = Ngrams.unigramEncodeWithVocab(batch1,
        graft.sources.ManifestTable.read(spark, vp), maxPieceLen = 3)
      .select("doc_id", "n_toks", "n_ids", "token_ids")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got() === direct, "stream/batch encode parity")
    assert(direct(11L)._3.split(",").last === "0",
      "word with out-of-vocab char encodes as OOV through the stream")
    // replay: wiping the checkpoint and re-processing the same data
    // must not duplicate rows (batch-id keyed upsert detects it)
    val before = got()
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(ckpt))
    in.addData((10L, "alpha gamma"), (11L, "beta zz9"))
    run()
    assert(got() === before, "replayed batch is a no-op")
    Ngrams.clearUnigramCache()
  }

  test("annEnrichStream: micro-batches probe the STORED IVF index; " +
      "stream output equals the batch probe; replay is a no-op") {
    import graft.operators.Similarity
    implicit val sqlCtx = spark.sqlContext
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ann-stream").toString
    val (idx, out, ckpt) = (s"$dir/ivf", s"$dir/nn", s"$dir/ckpt")
    // build + commit the index once; the stream only ever reads it
    val (cents, cells) = Similarity.ivfIndex(e, nlist = 8, iters = 2)
    Similarity.writeIvfIndex(idx, cents, cells)
    val in = MemoryStream[(Long, Array[Float])]
    def run(): Unit = {
      val q = StreamOps.annEnrichStream(
        in.toDF().toDF("vec_id", "embedding"), idx, out, ckpt,
        k = 5, nprobe = 4, nBuckets = 8)
      try q.processAllAvailable() finally q.stop()
    }
    def got(): Set[(Long, Long, Int)] =
      graft.sources.ManifestTable.read(spark, out)
        .select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
    val qvecs = e.filter(col("vec_id") < 4)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    in.addData(qvecs.toSeq)
    run()
    // batch/stream probe parity: the stream's appended rows are exactly
    // the batch probe of the same stored index over the same queries
    val (rc, ra) = Similarity.readIvfIndex(spark, idx)
    val batchProbe = Similarity.ivfTopKFromIndex(rc, ra,
        e.filter(col("vec_id") < 4), 5, nprobe = 4)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(got() === batchProbe && batchProbe.nonEmpty)
    // restart with no new data: recorded batch ids make replays no-ops
    run()
    assert(got() === batchProbe)
    // a second query batch appends under a new batch id; (query, rank)-
    // keyed upsert means a re-embedded query id REPLACES its neighbors:
    // query 2 now carries vec 3's embedding, so its rank-1 neighbor is
    // the indexed vec 3 itself at sim ~1
    in.addData((2L, qvecs.find(_._1 == 3L).get._2))
    run()
    val q2 = graft.sources.ManifestTable.read(spark, out)
      .filter(col("query_id") === 2L)
      .select("rank", "neighbor_id", "sim")
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(q2.length === 5, "all five old rank rows must be replaced")
    assert(q2.head._2 === 3L && math.abs(q2.head._3 - 1.0) < 1e-9,
      s"re-embedded query's top hit must be its source vector, got ${q2.head}")
  }

  test("sessionize closes a session after the event-time gap and emits once") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    val sink = nextSink()
    val q = StreamOps.sessionize(in.toDS(), gapMs = 5 * 60 * 1000L,
        watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append()).start()
    try {
      // user 7: two events 2 min apart → one session [10:00, 10:02]
      in.addData(
        SessionEvent(7L, ts("2024-01-01 10:00:00"), 1.5),
        SessionEvent(7L, ts("2024-01-01 10:02:00"), 2.5))
      q.processAllAvailable()
      assert(spark.table(sink).count() === 0, "session still open")
      // a far-future event advances the watermark beyond end+gap → timeout
      in.addData(SessionEvent(99L, ts("2024-01-01 11:00:00"), 0.0))
      q.processAllAvailable()
      // one more batch so the timeout fires after the watermark update
      in.addData(SessionEvent(99L, ts("2024-01-01 11:00:01"), 0.0))
      q.processAllAvailable()
      val sessions = spark.table(sink)
        .select("user_id", "session_start", "session_end", "n_events", "sum_value")
        .as[(Long, Timestamp, Timestamp, Long, Double)].collect()
      assert(sessions.length === 1)
      assert(sessions(0) === ((7L, ts("2024-01-01 10:00:00"),
        ts("2024-01-01 10:02:00"), 2L, 4.0)))
    } finally q.stop()
  }

  test("changepoint monitor closed end-to-end: changepointStream → " +
       "upsertStream manifest landing → changepointFromHourly replay " +
       "is bit-identical to batch changepoint over the ADMITTED events " +
       "across restarts — a late-but-admitted row merges into its hour, " +
       "a too-late row drops on both sides") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val dir = java.nio.file.Files.createTempDirectory("graft-cpmon").toString
    val table = s"$dir/hourly"; val ckpt = s"$dir/ckpt"
    // one query instance per trigger batch (the upsertStream spec's
    // restart pattern): the watermark survives via the checkpoint, so
    // trigger 2's late-row admission decision replays batch semantics
    def run(): Unit = {
      val q = StreamOps.upsertStream(
        StreamOps.changepointStream(in.toDF(),
          watermarkDelay = "30 minutes"),
        table, ckpt, keys = Seq("event_type", "bucket_ts"), nBuckets = 8)
      try q.processAllAvailable() finally q.stop()
    }
    // trigger 1: a level shift — hours 10 and 11 hold one event each,
    // hour 12 holds two; watermark after this batch = 12:10 − 30min
    // = 11:40
    val t1 = Seq(
      Ev(1, ts("2024-01-01 10:05:00"), "m", 1.0),
      Ev(2, ts("2024-01-01 11:05:00"), "m", 1.0),
      Ev(3, ts("2024-01-01 12:05:00"), "m", 1.0),
      Ev(4, ts("2024-01-01 12:10:00"), "m", 1.0))
    in.addData(t1)
    run()
    // trigger 2: one LATE row inside the watermark (11:50 ≥ 11:40 —
    // admitted, merges into hour 11), one TOO-LATE row behind it
    // (10:45 < 11:40 — dropped), one on-time row growing hour 12
    val lateAdmitted = Ev(5, ts("2024-01-01 11:50:00"), "m", 1.0)
    val tooLate = Ev(6, ts("2024-01-01 10:45:00"), "m", 1.0)
    val onTime = Ev(7, ts("2024-01-01 12:20:00"), "m", 1.0)
    in.addData(Seq(lateAdmitted, tooLate, onTime))
    run()
    // the landed hourly table is the upsert-converged count per hour:
    // the admitted late row LIFTED hour 11 to 2 (update-mode re-emit +
    // SCD-1 merge), the dropped row left hour 10 at 1
    val hourly = graft.sources.ManifestTable.read(spark, table)
    val counts = hourly.select("bucket_ts", "cnt")
      .as[(Timestamp, Long)].collect().toMap
    assert(counts === Map(
      ts("2024-01-01 10:00:00") -> 1L,
      ts("2024-01-01 11:00:00") -> 2L,
      ts("2024-01-01 12:00:00") -> 3L))
    // replay the CUSUM argmax over the landed table; batch twin runs
    // over exactly the admitted events (everything but the dropped row)
    val cols = Seq("event_type", "k", "bucket_ts", "n_buckets", "d",
      "mean_before", "mean_after")
    val monitor = graft.operators.EventOps.changepointFromHourly(hourly)
      .select(cols.head, cols.tail: _*)
      .as[(String, Long, Timestamp, Long, Long, Double, Double)]
      .collect().toSet
    val admitted = t1 :+ lateAdmitted :+ onTime
    val batchCp = graft.operators.EventOps.changepoint(
        admitted.map(e => (e.event_id, e.ts, e.event_type, e.value))
          .toDF("event_id", "ts", "event_type", "value"))
      .select(cols.head, cols.tail: _*)
      .as[(String, Long, Timestamp, Long, Long, Double, Double)]
      .collect().toSet
    assert(monitor === batchCp,
      s"landed-replay/batch parity: $monitor vs $batchCp")
    // and including the dropped row on the batch side BREAKS parity —
    // the admitted-events qualifier is load-bearing, not vacuous
    val batchAll = graft.operators.EventOps.changepoint(
        (admitted :+ tooLate).map(e => (e.event_id, e.ts, e.event_type,
          e.value)).toDF("event_id", "ts", "event_type", "value"))
      .select(cols.head, cols.tail: _*)
      .as[(String, Long, Timestamp, Long, Long, Double, Double)]
      .collect().toSet
    assert(batchAll !== monitor,
      "a changepoint over ALL events must differ once a row was dropped")
  }

  test("nearDupIngestStream: incremental near-dup ingest — within-batch " +
       "keep-first, probe against the growing signature index, " +
       "survivors land per batch, and a replayed batch id skips the " +
       "body instead of self-deduping the corpus empty") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val dir = java.nio.file.Files.createTempDirectory("graft-dedupstr").toString
    val surv = s"$dir/survivors"; val idx = s"$dir/index"
    def run(ckpt: String): Unit = {
      val q = StreamOps.nearDupIngestStream(in.toDF().toDF("doc_id", "text"),
        surv, idx, ckpt, nBuckets = 8)
      try q.processAllAvailable() finally q.stop()
    }
    val tA = "alpha beta gamma delta epsilon zeta"
    val tB = "one two three four five six seven"
    val tC = "red green blue cyan magenta yellow"
    // batch 0: doc 2 duplicates doc 1 within the batch → keep-first
    in.addData((1L, tA), (2L, tA), (3L, tB))
    run(s"$dir/ckpt")
    def survivorsOf(b: Long): Set[Long] =
      spark.read.parquet(s"$surv/ingest_batch=$b")
        .select("doc_id").as[Long].collect().toSet
    assert(survivorsOf(0L) === Set(1L, 3L))
    // batch 1: doc 4 duplicates the STANDING corpus (doc 1), doc 5 novel
    in.addData((4L, tA), (5L, tC))
    run(s"$dir/ckpt")
    assert(survivorsOf(1L) === Set(5L))
    // the index holds exactly the survivors' signatures
    assert(graft.sources.ManifestTable.read(spark, idx)
      .select("doc_id").distinct().as[Long].collect().toSet ===
      Set(1L, 3L, 5L))
    // replay pin: a FRESH checkpoint restarts batch ids at 0 — the
    // manifest already records batch 1, so the guarded body must skip
    // (an unguarded replay would probe batch-0 docs against an index
    // CONTAINING their own signatures and overwrite survivors empty)
    val in2 = MemoryStream[(Long, String)]
    in2.addData((1L, tA), (2L, tA), (3L, tB))
    val q2 = StreamOps.nearDupIngestStream(in2.toDF().toDF("doc_id", "text"),
      surv, idx, s"$dir/ckpt_replay", nBuckets = 8)
    try q2.processAllAvailable() finally q2.stop()
    assert(survivorsOf(0L) === Set(1L, 3L),
      "replayed batch id must not rewrite the landed survivors")
    val Some((_, lastBatch)) =
      graft.sources.ManifestTable.currentVersionAndBatch(spark, idx)
    assert(lastBatch === 1L, "replay must not advance the index")
  }
}
