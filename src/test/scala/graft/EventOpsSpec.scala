package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.EventOps

class EventOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("linearAttribution: equal split over the path, credit mass " +
       "conserved, organic conversions whole") {
    // u1 path: click, view, view, PURCHASE(12) → click 1/3, view 2/3
    // u2: PURCHASE(6) with no touches → (none) gets 1.0
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 0.0),
      (2L, ts("2024-01-01 10:01:00"), 1L, "view", 0.0),
      (3L, ts("2024-01-01 10:02:00"), 1L, "view", 0.0),
      (4L, ts("2024-01-01 10:03:00"), 1L, "purchase", 12.0),
      (5L, ts("2024-01-01 10:00:00"), 2L, "purchase", 6.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventOps.linearAttribution(ev, Seq("click", "view"),
        "purchase")
      .as[(String, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(out("click")._2 === 0.333333333 && out("click")._3 === 4.0)
    assert(out("view")._2 === 0.666666667 && out("view")._3 === 8.0)
    assert(out("(none)")._2 === 1.0 && out("(none)")._3 === 6.0)
    // credit mass ≈ number of conversions (rounding leaves ulps)
    assert(math.abs(out.values.map(_._2).sum - 2.0) < 1e-6)
  }

  test("churnLabels: active-before users label by horizon silence; " +
       "post-cutoff arrivals excluded") {
    val cutoff = ts("2024-01-20 00:00:00")
    val ev = Seq(
      // u1: active before, active in horizon → not churned
      (1L, ts("2024-01-10 00:00:00"), 1L, "e"),
      (2L, ts("2024-01-22 00:00:00"), 1L, "e"),
      // u2: active before, silent in horizon, active after → churned
      (3L, ts("2024-01-15 00:00:00"), 2L, "e"),
      (4L, ts("2024-01-29 00:00:00"), 2L, "e"),
      // u3: first seen after cutoff → excluded
      (5L, ts("2024-01-21 00:00:00"), 3L, "e"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = EventOps.churnLabels(ev, cutoff, horizonDays = 7)
      .select("user_id", "n_events_before", "churned")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L) === ((1L, 1L, false)))
    assert(out(2L) === ((2L, 1L, true)),
      "an event AFTER the horizon must not rescue the label")
  }

  test("nextEventHitRate: per-state argmax prediction, deterministic " +
       "tie, in-sample hit rate") {
    // user 1: A→B, B→A, A→B ; user 2: A→C
    // from A: B twice, C once → predict B; hits 2/3
    // from B: A once → predict A; hits 1/1
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "A"),
      (2L, ts("2024-01-01 10:01:00"), 1L, "B"),
      (3L, ts("2024-01-01 10:02:00"), 1L, "A"),
      (4L, ts("2024-01-01 10:03:00"), 1L, "B"),
      (5L, ts("2024-01-01 10:00:00"), 2L, "A"),
      (6L, ts("2024-01-01 10:05:00"), 2L, "C"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = EventOps.nextEventHitRate(ev)
      .select("from_type", "predicted", "n_transitions", "n_hits")
      .as[(String, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("A") === (("A", "B", 3L, 2L)))
    assert(out("B") === (("B", "A", 1L, 1L)))
    // tie: from C nothing follows → C absent from the report
    assert(!out.contains("C"))
  }

  test("ohlcBars: open/close by (ts, id) tie order, exact decimal sum, " +
       "null values drop") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:05:00"), Some(5.0)),
      (2L, ts("2024-01-01 10:05:00"), Some(1.0)),  // same ts: id breaks tie
      (3L, ts("2024-01-01 10:50:00"), Some(9.0)),
      (4L, ts("2024-01-01 10:55:00"), Some(2.0)),
      (5L, ts("2024-01-01 10:59:00"), None),        // null: dropped
      (6L, ts("2024-01-01 11:01:00"), Some(7.0)))
      .toDF("event_id", "ts", "value")
      .withColumn("event_type", lit("m"))
    val out = EventOps.ohlcBars(ev)
      .select("bar_ts", "n", "open", "high", "low", "close")
      .as[(Timestamp, Long, Double, Double, Double, Double)]
      .collect().sortBy(_._1.getTime)
    assert(out.length === 2)
    assert(out(0) === ((ts("2024-01-01 10:00:00"), 4L, 5.0, 9.0, 1.0, 2.0)),
      s"open = earliest (lowest id on tie), close = latest, got ${out(0)}")
    assert(out(1)._2 === 1L && out(1)._3 === 7.0 && out(1)._6 === 7.0)
  }

  test("ohlcBars: sum_value_nanos is BIGINT, exact nano sum, and a " +
       "bar past 2^63-1 nano-units raises instead of wrapping") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:05:00"), 0.1),
      (2L, ts("2024-01-01 10:06:00"), 0.2))
      .toDF("event_id", "ts", "value")
      .withColumn("event_type", lit("m"))
    val bars = EventOps.ohlcBars(ev)
    assert(bars.schema("sum_value_nanos").dataType ===
      org.apache.spark.sql.types.LongType)
    val nanos = bars.select("sum_value_nanos").as[Long].head()
    assert(nanos === 300000000L, "0.1+0.2 sums exactly in nano-units")
    // two rows of 5e9 unit-mass → 1e19 nano-units > Long.MaxValue:
    // the guard must raise, not wrap
    val hot = Seq(
      (1L, ts("2024-01-01 10:05:00"), 5.0e9),
      (2L, ts("2024-01-01 10:06:00"), 5.0e9))
      .toDF("event_id", "ts", "value")
      .withColumn("event_type", lit("m"))
    val e = intercept[Exception] {
      EventOps.ohlcBars(hot).collect()
    }
    def msgs(t: Throwable): List[String] =
      if (t == null) Nil
      else Option(t.getMessage).toList ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("overflows BIGINT")), s"got: $e")
  }

  test("cohortRetention: first-event cohorts, distinct users per offset") {
    // u1 first in Jan, active Jan+Feb+Apr (two Feb events count once);
    // u2 first in Jan, active Jan only; u3 first in Feb, active Feb+Mar
    val events = Seq(
      (1L, ts("2024-01-05 00:00:00")), (1L, ts("2024-02-10 00:00:00")),
      (1L, ts("2024-02-20 00:00:00")), (1L, ts("2024-04-01 00:00:00")),
      (2L, ts("2024-01-15 00:00:00")),
      (3L, ts("2024-02-01 00:00:00")), (3L, ts("2024-03-30 00:00:00"))
    ).toDF("user_id", "ts")
    val out = EventOps.cohortRetention(events)
      .as[(Timestamp, Long, Long)].collect()
      .map(r => (r._1.toString.take(7), r._2, r._3)).toSet
    assert(out === Set(
      ("2024-01", 0L, 2L),  // Jan cohort: u1+u2 active in month 0
      ("2024-01", 1L, 1L),  // u1 in Feb
      ("2024-01", 3L, 1L),  // u1 in Apr
      ("2024-02", 0L, 1L),  // Feb cohort: u3
      ("2024-02", 1L, 1L))) // u3 in Mar
    // weekly granularity: 2024-01-05 is week of Jan 1 (Mon); Jan 15 is
    // two weeks later — offsets count exact 7-day periods
    val weekly = EventOps.cohortRetention(
        events.filter(col("user_id") === 2L ||
          (col("user_id") === 1L && month(col("ts")) === 1)),
        granularity = "week")
      .as[(Timestamp, Long, Long)].collect().toSet
    assert(weekly.map(r => (r._1.toString.take(10), r._2, r._3)) === Set(
      ("2024-01-01", 0L, 1L),   // u1 cohort week Jan 1, active that week
      ("2024-01-15", 0L, 1L)))  // u2 cohort week Jan 15
  }

  test("transitionMatrix: per-user consecutive pairs, P(to|from) sums to 1") {
    // u1: A→B→A ; u2: A→B — transitions A→B ×2, B→A ×1; last events
    // of each user emit nothing
    val df = Seq(
      (1L, ts("2026-01-01 00:00:00"), 10L, "A"),
      (2L, ts("2026-01-01 00:01:00"), 10L, "B"),
      (3L, ts("2026-01-01 00:02:00"), 10L, "A"),
      (4L, ts("2026-01-01 00:00:00"), 20L, "A"),
      (5L, ts("2026-01-01 00:01:00"), 20L, "B")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = EventOps.transitionMatrix(df)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out === Map(
      ("A", "B") -> ((2L, 1.0)),
      ("B", "A") -> ((1L, 1.0))))
    // equal-timestamp tie broken by event_id: u3 sees X(id 6) then Y(id 7)
    val tie = Seq(
      (7L, ts("2026-01-01 00:00:00"), 30L, "Y"),
      (6L, ts("2026-01-01 00:00:00"), 30L, "X")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val t2 = EventOps.transitionMatrix(tie)
      .as[(String, String, Long, Double)].collect()
    assert(t2.toSeq === Seq(("X", "Y", 1L, 1.0)))
  }

  test("transitionEntropy: rails score 0, uniform fanout scores ln(n)") {
    // u1..u4 each A→B then A→C twice total each way: A fans out 50/50;
    // B and C are rails into D
    val rows = (1L to 4L).flatMap { u =>
      val mid = if (u % 2 == 0) "B" else "C"
      Seq((u * 10L, ts("2026-01-01 00:00:00"), u, "A"),
          (u * 10L + 1, ts("2026-01-01 00:01:00"), u, mid),
          (u * 10L + 2, ts("2026-01-01 00:02:00"), u, "D"))
    }
    val out = EventOps.transitionEntropy(
        rows.toDF("event_id", "ts", "user_id", "event_type"))
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out("A") === (("A", 4L, 2L, 0.693147181)),
      "two successors at 2/2: H = ln 2")
    assert(out("B") === (("B", 2L, 1L, 0.0)) &&
           out("C") === (("C", 2L, 1L, 0.0)),
      "single successor: the journey is a rail")
    assert(!out.contains("D"), "terminal states emit no transitions")
  }

  test("sequencePatterns: order-sensitive triples per user stream, " +
       "support cut, short streams emit nothing") {
    // u1: A B C D  -> ABC, BCD ; u2: A B C -> ABC ; u3: B A -> nothing
    val rows = Seq(
      (1L, "00:00", 1L, "A"), (2L, "00:01", 1L, "B"),
      (3L, "00:02", 1L, "C"), (4L, "00:03", 1L, "D"),
      (5L, "00:00", 2L, "A"), (6L, "00:01", 2L, "B"),
      (7L, "00:02", 2L, "C"),
      (8L, "00:00", 3L, "B"), (9L, "00:01", 3L, "A")
    ).map { case (id, t, u, e) => (id, ts(s"2026-01-01 $t:00"), u, e) }
      .toDF("event_id", "ts", "user_id", "event_type")
    val all = EventOps.sequencePatterns(rows, minSupport = 1)
      .as[(String, String, String, Long)].collect().toSet
    assert(all === Set(("A", "B", "C", 2L), ("B", "C", "D", 1L)),
      "triples never cross users; u3's 2-event stream emits none")
    val cut = EventOps.sequencePatterns(rows, minSupport = 2)
      .as[(String, String, String, Long)].collect().toSet
    assert(cut === Set(("A", "B", "C", 2L)))
  }

  test("seasonalityStrength: a pure weekly cycle scores 1, white noise " +
       "across cells scores ~0, constants are NULL") {
    // type P: two weeks where each hour-of-week cell repeats its count
    // exactly -> SSE = 0 -> r2 = 1
    val periodic = for {
      week <- 0 to 1; h <- 0 until 24
      n = (h % 3) + 1; i <- 1 to n
    } yield (week * 1000L + h * 10L + i,
      ts(f"2026-01-${5 + week * 7}%02d $h%02d:00:00"), 1L, "P")
    // type C: identical count every hour -> SST = 0 -> NULL
    val const = for (d <- 5 to 6; h <- 0 until 4)
      yield (90000L + d * 100L + h, ts(f"2026-01-$d%02d $h%02d:15:00"),
        2L, "C")
    val df = (periodic ++ const)
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = EventOps.seasonalityStrength(df)
      .as[(String, Long, Option[Double])].collect().map(r => r._1 -> r)
      .toMap
    assert(out("P") === (("P", 48L, Some(1.0))),
      "exact weekly repetition: the fingerprint explains everything")
    assert(out("C")._3.isEmpty, "constant series: no variance to explain")
  }

  test("gapPercentiles: exact interpolated dwell percentiles in seconds") {
    // u1 gaps: 10s, 20s, 40s (same type) -> med 20, p90 = 20+0.8*20 = 36
    val rows = Seq(0L, 10L, 30L, 70L).zipWithIndex.map { case (t, i) =>
      (i.toLong, ts(f"2026-01-01 00:0${t / 60}%d:${t % 60}%02d"), 1L, "e")
    }.toDF("event_id", "ts", "user_id", "event_type")
    val Array(r) = EventOps.gapPercentiles(rows)
      .as[(String, Long, Double, Double)].collect()
    assert(r === (("e", 3L, 20.0, 36.0)))
  }

  test("survivalCurve: sparse observed ages, reverse-cumulative counts") {
    // u1: one day (lifespan 0); u2, u3: 3-day span (lifespan 2)
    val rows = Seq(
      (1L, "2026-01-01", 1L),
      (2L, "2026-01-01", 2L), (3L, "2026-01-03", 2L),
      (4L, "2026-01-02", 3L), (5L, "2026-01-04", 3L))
      .map { case (id, day, u) => (id, ts(s"$day 10:00:00"), u, "e") }
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = EventOps.survivalCurve(rows)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out === Map(
      0L -> ((0L, 3L, 1.0)),
      2L -> ((2L, 2L, 0.666666667))),
      "rows only at observed lifespans; everyone survives to age 0")
  }

  test("bounceRate: single-event sessions flag; day from session start") {
    // u1: a 2-event session then, an hour+ later, a 1-event session;
    // u2: one 1-event session next day
    val rows = Seq(
      (1L, "2026-01-01 10:00:00", 1L), (2L, "2026-01-01 10:10:00", 1L),
      (3L, "2026-01-01 12:00:00", 1L),
      (4L, "2026-01-02 09:00:00", 2L))
      .map { case (id, at, u) => (id, ts(at), u, "e", 1.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventOps.bounceRate(rows, gapMs = 3600000L)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val d1 = out.keys.min
    assert(out(d1) === ((d1, 2L, 1L, 0.5)))
    assert(out(d1 + 1) === ((d1 + 1, 1L, 1L, 1.0)))
  }

  test("peakConcurrency: overlaps stack, back-to-back don't, midnight " +
       "spans count in both days") {
    val us = 1000000L
    def iv(s: Long, e: Long) = (s * us, e * us)
    val day = 86400L
    val rows = Seq(
      iv(100, 200), iv(150, 250), iv(180, 190), // triple overlap at 180
      iv(250, 300),                             // back-to-back with #2
      iv(day - 50, day + 50))                   // spans midnight
      .toDF("start_us", "end_us")
    val out = EventOps.peakConcurrency(rows)
      .as[(Long, Long)].collect().toMap
    assert(out(0L) === 3L,
      "three stacked at t=180; the end at 250 offsets the next start")
    assert(out(1L) === 1L, "the midnight span opens day 1 alone")
  }

  test("cohortLtv: first-period cohorts, exact cell revenue, cumulative " +
       "walk per cohort") {
    // week cohorts: u1 starts week w, spends 1.0 then 2.0 next week;
    // u2 starts week w+1 (joins u1's second week as its OWN cohort 0)
    val rows = Seq(
      (1L, "2026-01-05", 1L, 1.0),   // Monday, week A
      (2L, "2026-01-12", 1L, 2.0),   // week A+1
      (3L, "2026-01-13", 2L, 5.0),   // u2's first week = A+1
      (4L, "2026-01-12", 1L, 0.5))   // same cell as event 2
      .map { case (id, day, u, v) =>
        (id, ts(s"$day 10:00:00"), u, "e", v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventOps.cohortLtv(rows, granularity = "week")
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    val a = out.keys.map(_._1).min
    assert(out((a, 0L)) === ((a, 0L, 1L, 1.0, 1.0)))
    assert(out((a, 1L)) === ((a, 1L, 1L, 2.5, 3.5)),
      "same-cell events sum; cumulative carries the cohort's week 0")
    assert(out((a + 1, 0L)) === ((a + 1, 0L, 1L, 5.0, 5.0)),
      "u2 anchors its own cohort, not u1's")
    // month granularity collapses everything into one cell here
    assert(EventOps.cohortLtv(rows, granularity = "month").count() === 1)
    intercept[IllegalArgumentException] {
      EventOps.cohortLtv(rows, granularity = "day")
    }
  }

  test("streakHistogram: consecutive days chain, gaps break, same-day " +
       "repeats collapse") {
    // u1: days 1,2,3 then 5 -> longest 3; u2: days 1,1,1 -> longest 1;
    // u3: days 2,3 -> longest 2
    val rows = Seq(
      (1L, "01", 1L), (2L, "02", 1L), (3L, "03", 1L), (4L, "05", 1L),
      (5L, "01", 2L), (6L, "01", 2L), (7L, "01", 2L),
      (8L, "02", 3L), (9L, "03", 3L))
      .map { case (id, dd, u) =>
        (id, ts(s"2026-01-$dd 10:00:00"), u, "e") }
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = EventOps.streakHistogram(rows)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(3L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("topPaths: ordered prefixes, depth cut, support cut") {
    // u1, u2: A>B>C ; u3: A>B (short stream keeps its short path);
    // u4: B>A>C (order matters)
    val rows = Seq(
      (1L, 0, 1L, "A"), (2L, 1, 1L, "B"), (3L, 2, 1L, "C"), (4L, 3, 1L, "D"),
      (5L, 0, 2L, "A"), (6L, 1, 2L, "B"), (7L, 2, 2L, "C"),
      (8L, 0, 3L, "A"), (9L, 1, 3L, "B"),
      (10L, 0, 4L, "B"), (11L, 1, 4L, "A"), (12L, 2, 4L, "C"))
      .map { case (id, m, u, e) =>
        (id, ts(f"2026-01-01 00:0$m%d:00"), u, e) }
      .toDF("event_id", "ts", "user_id", "event_type")
    val all = EventOps.topPaths(rows, depth = 3, minSupport = 1)
      .as[(String, Long)].collect().toMap
    assert(all === Map("A>B>C" -> 2L, "A>B" -> 1L, "B>A>C" -> 1L),
      "the 4th event never enters a depth-3 path; order distinguishes")
    val cut = EventOps.topPaths(rows, depth = 3, minSupport = 2)
      .as[(String, Long)].collect().toMap
    assert(cut === Map("A>B>C" -> 2L))
  }

  test("abTest: per-user conversion flags, exact arm counts, pooled z; " +
       "degenerate pools yield NULL z") {
    // arm A (even ids): u0 converts, u2 doesn't; arm B (odd): u1, u3
    // convert -> rates 0.5 vs 1.0, lift 0.5
    val rows = Seq(
      (1L, 0L, "view"), (2L, 0L, "purchase"), (3L, 0L, "purchase"),
      (4L, 2L, "view"),
      (5L, 1L, "purchase"), (6L, 3L, "view"), (7L, 3L, "purchase"))
      .map { case (id, u, e) =>
        (id, ts("2026-01-01 00:00:00"), u, e) }
      .toDF("event_id", "ts", "user_id", "event_type")
    val Array(r) = EventOps.abTest(rows,
        org.apache.spark.sql.functions.pmod(col("user_id"),
          org.apache.spark.sql.functions.lit(2)) === 1, "purchase")
      .as[(Long, Long, Long, Long, Double, Double, Double,
           Option[Double])].collect()
    assert((r._1, r._2, r._3, r._4) === ((2L, 2L, 1L, 2L)),
      "duplicate conversions count once per user")
    assert((r._5, r._6, r._7) === ((0.5, 1.0, 0.5)))
    // z = 0.5 / sqrt(0.75*0.25*(1/2+1/2)) = 1.154700538
    assert(math.abs(r._8.get - 1.154700538) < 1e-9)
    // every user converts: pooled rate 1 -> z undefined, not Infinity
    val allConv = Seq((1L, 0L, "purchase"), (2L, 1L, "purchase"))
      .map { case (id, u, e) => (id, ts("2026-01-01 00:00:00"), u, e) }
      .toDF("event_id", "ts", "user_id", "event_type")
    assert(EventOps.abTest(allConv,
        org.apache.spark.sql.functions.pmod(col("user_id"),
          org.apache.spark.sql.functions.lit(2)) === 1, "purchase")
      .select("z").as[Option[Double]].head().isEmpty)
  }

  test("rollingActiveUsers: trailing-window distincts, users count once " +
       "per window, stickiness exact") {
    // u1 active day 0 and day 2; u2 active day 0 only; window 3 days
    val rows = Seq(
      (1L, "2026-01-01", 1L), (2L, "2026-01-01", 2L),
      (3L, "2026-01-03", 1L), (4L, "2026-01-03", 1L)) // same-day dup
      .map { case (id, day, u) => (id, ts(s"$day 10:00:00"), u, "e") }
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = EventOps.rollingActiveUsers(rows, windowDays = 3)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val d0 = out.keys.min
    assert(out(d0) === ((d0, 2L, 2L, 1.0)),
      "day 0: both users active that day and in its trailing window")
    assert(out(d0 + 2) === ((d0 + 2, 1L, 2L, 0.5)),
      "day 2: u1 is today's DAU; u2 still in the 3-day window from day 0")
    assert(out.size === 2, "only OBSERVED days report (no padding days)")
  }

  test("coalesceIntervals: overlapping and touching intervals merge, " +
       "gaps split islands, keys never mix") {
    def iv(u: Long, s: String, e: String) =
      (u, ts(s"2026-01-01 $s"), ts(s"2026-01-01 $e"))
    val df = Seq(
      iv(1L, "00:00:00", "00:10:00"),   // island 1
      iv(1L, "00:05:00", "00:12:00"),   //   overlaps
      iv(1L, "00:12:00", "00:15:00"),   //   touches (closed semantics)
      iv(1L, "00:20:00", "00:25:00"),   // island 2 after a gap
      iv(1L, "00:21:00", "00:22:00"),   //   contained
      iv(2L, "00:00:00", "00:01:00"))   // other key
      .toDF("k", "s_ts", "e_ts")
    val out = EventOps.coalesceIntervals(df, "k", "s_ts", "e_ts")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    def us(t0: String) =
      ts(s"2026-01-01 $t0").getTime * 1000L
    assert(out((1L, 1L)) === ((1L, 1L, 3L, us("00:00:00"), us("00:15:00"))))
    assert(out((1L, 2L)) === ((1L, 2L, 2L, us("00:20:00"), us("00:25:00"))),
      "a contained interval merges without extending the cover")
    assert(out((2L, 1L)) === ((2L, 1L, 1L, us("00:00:00"), us("00:01:00"))))
  }

  test("debounce: burst starters survive, bursts number per user, " +
       "first event always starts burst 1") {
    // u1: events at 0s, 1s, 2s (one burst), 100s, 101s (second burst)
    // u2: single event
    val rows = Seq(
      (1L, "00:00:00", 1L), (2L, "00:00:01", 1L), (3L, "00:00:02", 1L),
      (4L, "00:01:40", 1L), (5L, "00:01:41", 1L),
      (6L, "00:00:00", 2L))
      .map { case (id, at, u) => (id, ts(s"2026-01-01 $at"), u, "e") }
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = EventOps.debounce(rows, gapUs = 10L * 1000000L)
      .select("event_id", "user_id", "burst")
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 1L, 1L), (4L, 1L, 2L), (6L, 2L, 1L)),
      "only gap-exceeding events start bursts; numbering is per user")
    // gap exactly equal to the threshold does NOT start a new burst
    val eq = Seq(
      (1L, ts("2026-01-01 00:00:00"), 1L, "e"),
      (2L, ts("2026-01-01 00:00:10"), 1L, "e"))
      .toDF("event_id", "ts", "user_id", "event_type")
    assert(EventOps.debounce(eq, gapUs = 10L * 1000000L).count() === 1,
      "strict > semantics at the boundary")
  }

  test("audienceOverlap: exact pair intersections from one distinct " +
       "pass; disjoint pairs absent; duplicate events collapse") {
    val rows = Seq(
      (1L, "A", 1L), (2L, "A", 2L), (3L, "A", 3L), (4L, "A", 3L), // dup
      (5L, "B", 2L), (6L, "B", 3L), (7L, "B", 4L),
      (8L, "C", 9L))
      .map { case (id, t, u) =>
        (id, ts("2026-01-01 00:00:00"), u, t) }
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = EventOps.audienceOverlap(rows)
      .as[(String, String, Long, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(out.keySet === Set(("A", "B")),
      "C shares no user with anyone — no dense grid rows")
    assert(out(("A", "B")) === (("A", "B", 3L, 3L, 2L, true)),
      "duplicate (type,user) events count once")
  }

  test("timeToConvert: pre-touch conversions don't count; exact " +
       "interpolated delay percentiles") {
    val rows = Seq(
      // u1: view then purchase +10s
      (1L, "2026-01-01 00:00:00", 1L, "view"),
      (2L, "2026-01-01 00:00:10", 1L, "purchase"),
      // u2: view only
      (3L, "2026-01-01 00:00:00", 2L, "view"),
      // u3: purchase BEFORE its only view — not a conversion
      (4L, "2026-01-01 00:00:00", 3L, "purchase"),
      (5L, "2026-01-01 00:00:10", 3L, "view"),
      // u4: view then purchase +30s (an earlier same-user view too)
      (6L, "2026-01-01 00:00:00", 4L, "view"),
      (7L, "2026-01-01 00:00:30", 4L, "purchase"),
      // u5: purchase with no view at all — outside the touched base
      (8L, "2026-01-01 00:00:00", 5L, "purchase"))
      .map { case (id, at, u, t) => (id, ts(at), u, t) }
      .toDF("event_id", "ts", "user_id", "event_type")
    val Array(r) = EventOps.timeToConvert(rows, "view", "purchase")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(r === ((4L, 2L, 0.5, 2.0e7, 2.8e7)),
      "delays {10s, 30s}: median 20s, p90 = 10 + 0.9·20 = 28s")
  }

  test("attribution: first/last preceding touch per conversion; organic " +
       "purchases land in (none)") {
    val df = Seq(
      // u10: view → click → purchase(5.0) → purchase(2.0)
      //   first_touch = view, last_touch = click for BOTH purchases
      (1L, ts("2026-01-01 00:00:00"), 10L, "view", 0.0),
      (2L, ts("2026-01-01 00:01:00"), 10L, "click", 0.0),
      (3L, ts("2026-01-01 00:02:00"), 10L, "purchase", 5.0),
      (4L, ts("2026-01-01 00:03:00"), 10L, "purchase", 2.0),
      // u20: purchase with no preceding touch → (none, none)
      (5L, ts("2026-01-01 00:00:00"), 20L, "purchase", 7.0),
      // u30: click AFTER the purchase must not attribute
      (6L, ts("2026-01-01 00:00:00"), 30L, "purchase", 1.0),
      (7L, ts("2026-01-01 00:01:00"), 30L, "click", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventOps.attribution(df, Seq("click", "view"), "purchase")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out === Map(
      ("view", "click") -> ((2L, 7.0)),
      ("(none)", "(none)") -> ((2L, 8.0))))
  }

  test("gapStats: per-user gaps attribute to the earlier event's type; " +
      "last events open no gap") {
    // u1: A --60s--> B --120s--> A ; u2: B --30s--> B
    val df = Seq(
      (1L, ts("2026-01-01 00:00:00"), 10L, "A"),
      (2L, ts("2026-01-01 00:01:00"), 10L, "B"),
      (3L, ts("2026-01-01 00:03:00"), 10L, "A"),
      (4L, ts("2026-01-01 00:00:00"), 20L, "B"),
      (5L, ts("2026-01-01 00:00:30"), 20L, "B")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = EventOps.gapStats(df)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val s = 1000000L
    assert(out === Map(
      "A" -> ((1L, 60 * s, 60 * s, 60 * s)),     // u1's first A → B
      "B" -> ((2L, 150 * s, 30 * s, 120 * s))),  // u1 B→A + u2 B→B
      "u1's final A and u2's final B open no gap")
  }

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

  test("funnelN: per-step windows, same-ts funnel-order ties, report shape") {
    val events = Seq(
      // user 1 completes A→B→C, each hop inside the 1h window
      (1L, ts("2024-01-01 10:00:00"), "A"),
      (1L, ts("2024-01-01 10:30:00"), "B"),
      (1L, ts("2024-01-01 11:00:00"), "C"),
      // user 2: B 2h after A → stalls at step 1 (C never reachable)
      (2L, ts("2024-01-01 09:00:00"), "A"),
      (2L, ts("2024-01-01 11:00:00"), "B"),
      (2L, ts("2024-01-01 11:10:00"), "C"),
      // user 3: B and A at the SAME timestamp — inclusive >= matches
      (3L, ts("2024-01-01 08:00:00"), "A"),
      (3L, ts("2024-01-01 08:00:00"), "B"),
      // user 4: B before the first A → stalls at step 1
      (4L, ts("2024-01-01 07:00:00"), "B"),
      (4L, ts("2024-01-01 07:30:00"), "A"),
      // user 5: only C → never enters the funnel
      (5L, ts("2024-01-01 06:00:00"), "C")
    ).toDF("user_id", "ts", "event_type")
    val out = EventOps.funnelN(events, Seq("A", "B", "C"),
        withinUs = 3600L * 1000000L)
      .orderBy("step_idx")
      .as[(Long, String, Long)].collect().toSeq
    assert(out === Seq((1L, "A", 4L), (2L, "B", 2L), (3L, "C", 1L)))
  }

  test("funnelN: per-user cap plans WindowGroupLimit, keeps earliest events") {
    val events = Seq(
      (6L, ts("2024-01-01 10:00:00"), "A"),
      (6L, ts("2024-01-01 10:05:00"), "A"),
      (6L, ts("2024-01-01 10:30:00"), "B"),
      (6L, ts("2024-01-01 11:00:00"), "C")
    ).toDF("user_id", "ts", "event_type")
    val steps = Seq("A", "B", "C"); val hour = 3600L * 1000000L
    // a generous cap is a no-op on results…
    val full = EventOps.funnelN(events, steps, hour)
      .orderBy("step_idx").as[(Long, String, Long)].collect().toSeq
    assert(full === Seq((1L, "A", 1L), (2L, "B", 1L), (3L, "C", 1L)))
    // …but always bounds per-user task state: the row_number <= cap
    // filter must be rewritten to a WindowGroupLimit (truncation runs
    // map-side BEFORE the exchange, so a 10M-event bot user never
    // buffers more than the cap anywhere). The optimizer skips the
    // rewrite when the cap exceeds the child's KNOWN maxRows — true
    // for this 4-row fixture under the default cap, never for a real
    // unbounded scan — so the plan assertion uses a fixture-tight cap.
    val p = EventOps.funnelN(events, steps, hour, maxEventsPerUser = 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      s"per-user cap must plan a WindowGroupLimit:\n$p")
    // a tight cap keeps the EARLIEST events by (time, step rank): user 6
    // truncated to (A, A, B) reaches stage 2 — a monotone undercount,
    // never a phantom conversion
    val tight = EventOps.funnelN(events, steps, hour, maxEventsPerUser = 3)
      .orderBy("step_idx").as[(Long, String, Long)].collect().toSeq
    assert(tight === Seq((1L, "A", 1L), (2L, "B", 1L), (3L, "C", 0L)))
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

  test("frequentPairs: distinct per-user baskets, exact support and lift") {
    // u1 {A,B}, u2 {A,B}, u3 {A,C}, u4 {B}; duplicate (u1, A) events
    // must not inflate support
    val events = Seq(
      (1L, "A"), (1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "C"), (4L, "B")
    ).toDF("user_id", "event_type")
    val out = EventOps.frequentPairs(events, minSupport = 1L)
      .as[(String, String, Long, Double)].collect().toSet
    assert(out === Set(
      ("A", "B", 2L, 0.888888889), // 2·4/(3·3)
      ("A", "C", 1L, 1.333333333)  // 1·4/(3·1)
    ), "support over distinct baskets; lift = support·N/(cA·cB)")
    assert(EventOps.frequentPairs(events, minSupport = 2L).count() === 1,
      "minSupport prunes the singleton pair")
  }

  test("autocorrelation: exact integer-sum Pearson; degenerate series " +
       "go NULL or vanish") {
    def burst(tp: String, hour: Int, n: Int) = (1 to n).map(i =>
      (tp, ts(f"2024-01-01 $hour%02d:0${i % 6}:00")))
    // alt: counts 1,3,1,3,1,3 -> r1 = -1; lin: 1,2,3 -> r1 = 1;
    // konst: 2,2,2 -> zero variance -> NULL; solo: one hour -> no pair
    val events = (
      burst("alt", 0, 1) ++ burst("alt", 1, 3) ++ burst("alt", 2, 1) ++
      burst("alt", 3, 3) ++ burst("alt", 4, 1) ++ burst("alt", 5, 3) ++
      burst("lin", 0, 1) ++ burst("lin", 1, 2) ++ burst("lin", 2, 3) ++
      burst("konst", 0, 2) ++ burst("konst", 1, 2) ++ burst("konst", 2, 2) ++
      burst("solo", 0, 4)
    ).toDF("event_type", "ts")
    val out = EventOps.autocorrelation(events, lag = 1)
      .as[(String, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(out("alt") === (("alt", 5L, Some(-1.0))))
    assert(out("lin") === (("lin", 2L, Some(1.0))))
    assert(out("konst")._3 === None, "constant series: undefined, NULL")
    assert(!out.contains("solo"), "series shorter than lag+1 vanish")
  }

  test("changepoint: integer CUSUM locates the level shift; |D| ties " +
       "break to the smallest k; single-bucket series vanish") {
    def burst(tp: String, hour: Int, n: Int) = (1 to n).map(i =>
      (tp, ts(f"2024-01-01 $hour%02d:0${i % 6}:00")))
    // shift: 1,1,1,5,5 → S=(1,2,3,8,13), D_k = 5·S_k − k·13 =
    //   (-8,-16,-24,-12) → k*=3, D=-24, means 1.0 / 5.0
    // sym: 2,1,1,2 → D_k = 4·S_k − k·6 = (2,0,-2): |D| ties at k=1
    //   and k=3 → smallest k wins (k*=1, D=+2)
    // solo: one bucket → no interior split → absent
    val events = (
      burst("shift", 0, 1) ++ burst("shift", 1, 1) ++ burst("shift", 2, 1) ++
      burst("shift", 3, 5) ++ burst("shift", 4, 5) ++
      burst("sym", 0, 2) ++ burst("sym", 1, 1) ++ burst("sym", 2, 1) ++
      burst("sym", 3, 2) ++
      burst("solo", 0, 4)
    ).toDF("event_type", "ts")
    val out = EventOps.changepoint(events)
      .as[(String, Long, java.sql.Timestamp, Long, Long, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(out("shift") === (("shift", 3L, ts("2024-01-01 02:00:00"), 5L,
      -24L, 1.0, 5.0)))
    assert(out("sym") === (("sym", 1L, ts("2024-01-01 00:00:00"), 4L,
      2L, 2.0, 1.333333333)))
    assert(!out.contains("solo"), "no interior split on a 1-bucket series")
  }

  test("saxWords: PAA frame boundaries are integer-exact, symbols " +
       "count breaks strictly below the mean, short series spread") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "a", 10.0),
      (2L, ts("2024-01-01 01:00:00"), "a", 20.0),
      (3L, ts("2024-01-01 02:00:00"), "a", 30.0),
      (4L, ts("2024-01-01 03:00:00"), "a", 40.0),
      (5L, ts("2024-01-01 00:00:00"), "solo", 99.0),
      (6L, ts("2024-01-01 01:00:00"), "solo", 99.0))
      .toDF("event_id", "ts", "event_type", "value")
    // a: n=4, 2 segments → means 15, 35; breaks (15, 35) are NOT
    // counted at equality → symbols 1, 2
    val out = EventOps.saxWords(ev, breaks = Seq(15.0, 35.0),
        segments = 2)
      .as[(String, Long, Long, java.sql.Timestamp, Double, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(out(("a", 0L)) ===
      (("a", 0L, 2L, ts("2024-01-01 00:00:00"), 15.0, 1L)))
    assert(out(("a", 1L)) ===
      (("a", 1L, 2L, ts("2024-01-01 02:00:00"), 35.0, 2L)))
    // solo: n=2 < segments=2? use segments=4 → indices spread (0, 2),
    // singletons, none empty
    val spread = EventOps.saxWords(ev.filter(col("event_type") === "solo"),
        breaks = Seq(15.0), segments = 4)
      .as[(String, Long, Long, java.sql.Timestamp, Double, Long)]
      .collect().map(r => r._2).sorted
    assert(spread.toSeq === Seq(0L, 2L))
  }

  test("anomalousHours: spike against its hour-of-week cell flags at " +
       "exactly the z threshold") {
    // five Sundays 09h with counts 2,2,2,2,12: mean 4, std 4 -> the
    // spike sits at z = 2.0 (inclusive threshold), the rest at -0.5
    val sundays = Seq("2024-01-07", "2024-01-14", "2024-01-21",
      "2024-01-28", "2024-02-04")
    val events = sundays.zip(Seq(2, 2, 2, 2, 12)).flatMap {
      case (day, n) => (1 to n).map(i => ("x", ts(s"$day 09:${10 + i}:00")))
    }.toDF("event_type", "ts")
    val out = EventOps.anomalousHours(events, zThreshold = 2.0)
      .as[(String, java.sql.Timestamp, Long, Double)].collect()
    assert(out.toSeq === Seq(
      ("x", ts("2024-02-04 09:00:00"), 12L, 2.0)),
      "only the spike hour flags; z is the exact integer-sum value")
    assert(EventOps.anomalousHours(events, zThreshold = 2.1).count() === 0,
      "threshold is inclusive at 2.0 and excludes above it")
  }

  test("timeProfile: strftime dow convention (0=Sunday), exact cells") {
    // 2024-01-07 is a Sunday
    val events = Seq(
      (1L, ts("2024-01-07 09:15:00"), 1.5),
      (2L, ts("2024-01-07 09:45:00"), 2.5),
      (3L, ts("2024-01-08 23:00:00"), 4.0)
    ).toDF("user_id", "ts", "value")
    val out = EventOps.timeProfile(events)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(out === Set((0L, 9L, 2L, 4.0), (1L, 23L, 1L, 4.0)),
      "Sunday 9h cell aggregates both events; Monday 23h holds the third")
  }

  test("rfmSegments: monotone users land on the 1..5 diagonal") {
    // user i: i events of value i at increasing times — recency,
    // frequency and monetary all rank users identically, so quintile
    // scores must be the (i,i,i) diagonal with avg_monetary = i^2
    val events = (1 to 5).flatMap { i =>
      (1 to i).map(j => (i.toLong, ts(f"2024-01-0$i 00:0$j:00"), i.toDouble))
    }.toDF("user_id", "ts", "value")
    val out = EventOps.rfmSegments(events)
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(out === (1 to 5).map(i =>
      (i.toLong, i.toLong, i.toLong, 1L, (i * i).toDouble)).toSet)
  }

  test("ewmaSmooth: hand-computed dyadic smoother — short prefixes " +
       "renormalize, series stay independent, layout-independent") {
    import spark.implicits._
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 4.0),
      ("b", 1L, 10.0)).toDF("s", "t", "x")
    val out = EventOps.ewmaSmooth(df, "s", "t", "x", lags = 16)
      .select(col("s"), col("t"), col("ewma"))
      .as[(String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out(("a", 1L)) === 1.0, "first row is its own mean")
    // (2*.5 + 1*.25)/(.75) = 1.666666667
    assert(out(("a", 2L)) === 1.666666667)
    // (4*.5 + 2*.25 + 1*.125)/.875 = 3.0 exactly
    assert(out(("a", 3L)) === 3.0)
    assert(out(("b", 1L)) === 10.0, "series b never sees series a")
    val again = EventOps.ewmaSmooth(df.repartition(5), "s", "t", "x")
      .select(col("s"), col("t"), col("ewma"))
      .as[(String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(again === out)
    intercept[IllegalArgumentException] {
      EventOps.ewmaSmooth(df, "s", "t", "x", lags = 0)
    }
  }

  test("holtSmooth: hand-computed level/trend recurrence, independent " +
       "series, layout independence") {
    import spark.implicits._
    val df = Seq(("a", 1L, 10.0), ("a", 2L, 14.0), ("a", 3L, 16.0),
      ("b", 1L, 5.0)).toDF("s", "t", "x")
    val out = EventOps.holtSmooth(df, "s", "t", "x")
      .as[(String, Long, Double, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // a: l1=10 b1=0; l2=.5*14+.5*10=12, b2=.5*(12-10)=1, f=13;
    //    l3=.5*16+.5*13=14.5, b3=.5*2.5+.5*1=1.75, f=16.25
    assert(out(("a", 1L)) === (("a", 1L, 10.0, 10.0, 0.0, 10.0)))
    assert(out(("a", 2L)) === (("a", 2L, 14.0, 12.0, 1.0, 13.0)))
    assert(out(("a", 3L)) === (("a", 3L, 16.0, 14.5, 1.75, 16.25)))
    assert(out(("b", 1L)) === (("b", 1L, 5.0, 5.0, 0.0, 5.0)))
    val again = EventOps.holtSmooth(df.repartition(5), "s", "t", "x")
      .as[(String, Long, Double, Double, Double, Double)].collect().toSet
    assert(again === out.values.toSet)
    // a constant series is a fixed point with zero trend
    val const = EventOps.holtSmooth(
        (1L to 20L).map(i => ("c", i, 4.5)).toDF("s", "t", "x"),
        "s", "t", "x")
      .as[(String, Long, Double, Double, Double, Double)].collect()
    assert(const.forall(r => r._4 === 4.5 && r._5 === 0.0))
  }

  test("holtSmooth series-length guard: a series longer than maxLen " +
       "raises loudly instead of running a single-task quadratic fold; " +
       "at-cap series pass unchanged") {
    import spark.implicits._
    val series = (1L to 6L).map(i => ("g", i, i.toDouble)).toDF("s", "t", "x")
    val e = intercept[Exception] {
      EventOps.holtSmooth(series, "s", "t", "x", maxLen = 5).collect()
    }
    assert(e.getMessage.contains("holtSmooth") ||
      Option(e.getCause).exists(_.getMessage.contains("holtSmooth")))
    assert(EventOps.holtSmooth(series, "s", "t", "x", maxLen = 6)
      .count() === 6L)
    // per-series: one over-cap series poisons the run even when other
    // series are short (loud, never silently partial)
    val mixed = series.union(Seq(("h", 1L, 1.0)).toDF("s", "t", "x"))
    intercept[Exception] {
      EventOps.holtSmooth(mixed, "s", "t", "x", maxLen = 5).collect()
    }
    intercept[IllegalArgumentException] {
      EventOps.holtSmooth(series, "s", "t", "x", maxLen = 0)
    }
  }
}
