package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.EventOps

class EventOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel: first A, min delay to B within window; non-converters null") {
    val events = Seq(
      // user 1: click at 10:00, purchases at 10:30 (in) and 10:10 (in, min)
      (1L, ts("2024-01-01 10:00:00"), "click"),
      (1L, ts("2024-01-01 10:30:00"), "purchase"),
      (1L, ts("2024-01-01 10:10:00"), "purchase"),
      // user 2: click, purchase 2h later → outside the 1h window
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 11:00:00"), "purchase"),
      // user 3: purchase BEFORE the first click never counts
      (3L, ts("2024-01-01 08:00:00"), "purchase"),
      (3L, ts("2024-01-01 08:30:00"), "click"),
      // user 4: purchase only, no click → not in the funnel at all
      (4L, ts("2024-01-01 07:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val out = EventOps.funnel(events, "click", "purchase",
        withinUs = 3600L * 1000000L)
      .orderBy("user_id")
      .as[(Long, Long, Option[Long])].collect().toSeq
    val base = ts("2024-01-01 10:00:00").getTime * 1000L
    assert(out.map(_._1) === Seq(1L, 2L, 3L))
    assert(out(0)._3 === Some(600L * 1000000L), "min delay, not first-seen")
    assert(out(1)._3 === None, "outside window")
    assert(out(2)._3 === None, "B before first A does not convert")
    assert(out(0)._2 === base)
  }

  test("sessionizeBatch splits on gaps > threshold, aggregates per session") {
    val events = Seq(
      // user 1: two sessions separated by a 2h gap
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:30:00"), 2.0),
      (1L, ts("2024-01-01 13:00:00"), 4.0),
      // user 2: one session, single event
      (2L, ts("2024-01-01 09:00:00"), 8.0)
    ).toDF("user_id", "ts", "value")
    val out = EventOps.sessionizeBatch(events, gapMs = 3600 * 1000L)
      .orderBy("user_id", "session_start")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSeq
    assert(out === Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00"), 2L, 3.0),
      (1L, ts("2024-01-01 13:00:00"), ts("2024-01-01 13:00:00"), 1L, 4.0),
      (2L, ts("2024-01-01 09:00:00"), ts("2024-01-01 09:00:00"), 1L, 8.0)))
  }

  test("sessionizeBatch: a gap of exactly the threshold stays one session") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 11:00:00"), 2.0) // exactly 1h later
    ).toDF("user_id", "ts", "value")
    val out = EventOps.sessionizeBatch(events, gapMs = 3600 * 1000L)
    assert(out.count() === 1, "gap == threshold is NOT greater-than → same session")
  }

  test("batch and streaming sessionization agree on closed sessions") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamOps
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamOps.SessionEvent]
    val q = StreamOps.sessionize(in.toDS(), gapMs = 3600 * 1000L,
        watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("sess_parity")
      .outputMode("append").start()
    try {
      in.addData(
        StreamOps.SessionEvent(1L, ts("2024-01-01 10:00:00"), 1.0),
        StreamOps.SessionEvent(1L, ts("2024-01-01 10:30:00"), 2.0))
      q.processAllAvailable()
      in.addData(StreamOps.SessionEvent(9L, ts("2024-01-02 00:00:00"), 0.0))
      q.processAllAvailable()
      in.addData(StreamOps.SessionEvent(9L, ts("2024-01-02 00:00:01"), 0.0))
      q.processAllAvailable()
      val streamed = spark.table("sess_parity")
        .filter(col("user_id") === 1L)
        .select("session_start", "session_end", "n_events", "sum_value")
        .as[(Timestamp, Timestamp, Long, Double)].collect().toSeq
      val batch = EventOps.sessionizeBatch(
          Seq((1L, ts("2024-01-01 10:00:00"), 1.0),
              (1L, ts("2024-01-01 10:30:00"), 2.0)).toDF("user_id", "ts", "value"),
          gapMs = 3600 * 1000L)
        .select("session_start", "session_end", "n_events", "sum_value")
        .as[(Timestamp, Timestamp, Long, Double)].collect().toSeq
      assert(streamed === batch)
    } finally q.stop()
  }
}
