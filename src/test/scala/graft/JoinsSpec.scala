package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Joins

class JoinsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin: backward match, inclusive on equal ts, null when none") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:00")), // before any quote → null
      (2L, "A", ts("2024-01-01 10:05:00")), // exactly at quote q1 → q1
      (3L, "A", ts("2024-01-01 10:20:00")), // between q1 and q2 → q1
      (4L, "A", ts("2024-01-01 11:00:00")), // after q2 → q2
      (5L, "B", ts("2024-01-01 10:30:00"))  // key B → its own quote
    ).toDF("trade_id", "sym", "t_ts")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:05:00"), 100.0),
      ("A", ts("2024-01-01 10:30:00"), 105.0),
      ("B", ts("2024-01-01 10:00:00"), 7.0)
    ).toDF("sym", "q_ts", "px")

    val out = Joins.asofJoin(trades, quotes, "sym", "t_ts", "q_ts",
        Seq("q_ts", "px"), rightPrefix = "q_")
      .select("trade_id", "q_px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out(1L) === None)
    assert(out(2L) === Some(100.0), "equal timestamps match (inclusive)")
    assert(out(3L) === Some(100.0))
    assert(out(4L) === Some(105.0))
    assert(out(5L) === Some(7.0))
  }

  test("asofJoinForward: next match at-or-after, inclusive, null when none") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:00")), // before q1 → q1
      (2L, "A", ts("2024-01-01 10:05:00")), // exactly at q1 → q1 (inclusive)
      (3L, "A", ts("2024-01-01 10:20:00")), // between → q2
      (4L, "A", ts("2024-01-01 11:00:00")), // after last quote → null
      (5L, "B", ts("2024-01-01 09:30:00"))
    ).toDF("trade_id", "sym", "t_ts")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:05:00"), 100.0),
      ("A", ts("2024-01-01 10:30:00"), 105.0),
      ("B", ts("2024-01-01 10:00:00"), 7.0)
    ).toDF("sym", "q_ts", "px")

    val out = Joins.asofJoinForward(trades, quotes, "sym", "t_ts", "q_ts",
        Seq("px"), rightPrefix = "q_")
      .select("trade_id", "q_px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out(1L) === Some(100.0))
    assert(out(2L) === Some(100.0), "equal timestamps match (inclusive)")
    assert(out(3L) === Some(105.0))
    assert(out(4L) === None, "no later quote")
    assert(out(5L) === Some(7.0))
  }

  test("asofJoinNearest: closest side wins, backward on ties, null when no match") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:06:00")), // 1min to q1 back, 24min fwd → back
      (2L, "A", ts("2024-01-01 10:25:00")), // 20min back, 5min fwd → forward
      (3L, "A", ts("2024-01-01 10:17:30")), // 12.5min both ways → backward tie
      (4L, "C", ts("2024-01-01 10:00:00"))  // no quotes for C → null
    ).toDF("trade_id", "sym", "t_ts")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:05:00"), 100.0),
      ("A", ts("2024-01-01 10:30:00"), 105.0)
    ).toDF("sym", "q_ts", "px")
    val out = Joins.asofJoinNearest(trades, quotes, "sym", "t_ts", "q_ts",
        Seq("px"), rightPrefix = "near_")
      .select("trade_id", "near_px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out(1L) === Some(100.0))
    assert(out(2L) === Some(105.0))
    assert(out(3L) === Some(100.0), "equidistant → backward wins")
    assert(out(4L) === None)
  }

  test("asof joins: null timestamps match nothing on either side, either direction") {
    val trades = Seq(
      (1L, "A", Option(ts("2024-01-01 10:10:00"))),
      (2L, "A", Option.empty[Timestamp])
    ).toDF("trade_id", "sym", "t_ts")
    val quotes = Seq(
      ("A", Option(ts("2024-01-01 10:05:00")), 100.0),
      ("A", Option.empty[Timestamp], 42.0) // must never be a fallback match
    ).toDF("sym", "q_ts", "px")
    def run(j: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
                String, String, String, Seq[String], String) =>
              org.apache.spark.sql.DataFrame) =
      j(trades, quotes, "sym", "t_ts", "q_ts", Seq("px"), "q_")
        .select("trade_id", "q_px").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val backward = run(Joins.asofJoin)
    assert(backward(1L) === Some(100.0))
    assert(backward(2L) === None, "null-ts left row stays unmatched")
    val forward = run(Joins.asofJoinForward)
    assert(forward(1L) === None, "no later quote; null-ts quote is not a match")
    assert(forward(2L) === None)
  }

  test("asofJoin: preserves every left row and all left columns") {
    val left = Seq((1L, "A", ts("2024-01-01 00:00:00"), "payload"))
      .toDF("id", "k", "ts", "extra")
    val right = Seq(("A", ts("2023-12-31 00:00:00"), 42.0)).toDF("k", "ts2", "v")
    val out = Joins.asofJoin(left, right, "k", "ts", "ts2", Seq("v"))
    assert(out.columns.toSeq === Seq("id", "k", "ts", "extra", "asof_v"))
    assert(out.count() === 1)
    assert(out.select("extra").as[String].collect()(0) === "payload")
  }

  test("rangeJoin: [lo, hi) containment incl. intervals spanning buckets") {
    val points = Seq((1L, 0.0), (2L, 9.99), (3L, 10.0), (4L, 55.5), (5L, 100.0))
      .toDF("pid", "x")
    val ivals = Seq(("small", 0.0, 10.0), ("wide", 5.0, 100.0))
      .toDF("name", "lo", "hi")
    val out = Joins.rangeJoin(points, "x", ivals, "lo", "hi", bucketWidth = 10.0)
      .select("pid", "name").as[(Long, String)].collect().toSet
    assert(out === Set(
      (1L, "small"), (2L, "small"),           // [0,10) holds 0.0 and 9.99
      (2L, "wide"), (3L, "wide"), (4L, "wide") // [5,100) holds 9.99, 10, 55.5
    ), s"got $out")
    // boundary: x=10.0 excluded from [0,10), x=100.0 excluded from [5,100)
  }

  test("saltedJoin output equals the plain equi-join on skewed data") {
    // heavy-tailed: key "hot" appears 500x, others once
    val big = ((1 to 500).map(i => ("hot", i.toLong)) ++
      Seq(("a", 1000L), ("b", 2000L))).toDF("k", "payload")
    val small = Seq(("hot", "H"), ("a", "A"), ("c", "C")).toDF("k", "tag")
    val salted = Joins.saltedJoin(big, small, "k", salts = 8)
      .select("k", "payload", "tag")
    val plain = big.join(small, "k").select("k", "payload", "tag")
    assert(salted.count() === plain.count())
    assert(rendered(salted) === rendered(plain))
  }

  test("rangeJoin: no duplicate pairs when an interval covers many buckets") {
    val points = Seq((1L, 50.0)).toDF("pid", "x")
    val ivals = Seq(("wide", 0.0, 1000.0)).toDF("name", "lo", "hi")
    val out = Joins.rangeJoin(points, "x", ivals, "lo", "hi", bucketWidth = 1.0)
    assert(out.count() === 1, "point joins through its single bucket only")
  }

  test("bloomPreFilter: no false negatives; bloomJoin equals the plain join") {
    val fact = (1L to 2000L).map(i => (i % 100, i)).toDF("k", "payload")
    val dim = Seq((3L, "three"), (7L, "seven"), (999L, "absent"))
      .toDF("dk", "tag")
    val reduced = Joins.bloomPreFilter(fact, "k", dim, "dk",
      expectedItems = 100L)
    // every true match survives the pre-filter (bloom admits no false
    // negatives) …
    val trueMatches = fact.join(dim, col("k") === col("dk"))
      .select("k", "payload").collect().toSet
    val kept = reduced.join(dim, col("k") === col("dk"))
      .select("k", "payload").collect().toSet
    assert(kept === trueMatches)
    // … and the composed join is indistinguishable from the plain join
    val plain = fact.join(dim, col("k") === col("dk"))
      .select("k", "payload", "tag")
    val bloomed = Joins.bloomJoin(fact, "k", dim, "dk", expectedItems = 100L)
      .select("k", "payload", "tag")
    assert(rendered(bloomed) === rendered(plain))
  }

  test("bloomPreFilter actually reduces a selective probe before the join") {
    // 100 distinct fact keys, dim holds 2 → the pre-filter should cut the
    // fact side to ~2% (+fpp); assert an order-of-magnitude reduction so
    // the test stays robust to bloom false positives
    val fact = (1L to 5000L).map(i => (i % 100, i)).toDF("k", "payload")
    val dim = Seq((1L, "a"), (2L, "b")).toDF("dk", "tag")
    val n = Joins.bloomPreFilter(fact, "k", dim, "dk",
      expectedItems = 100L, fpp = 0.01).count()
    assert(n >= 100, s"true matches must survive, got $n")
    assert(n <= 500, s"pre-filter should cut ~98% of fact rows, kept $n")
  }

  test("intervalJoin equals brute force, exactly-once across buckets, half-open") {
    // bucketWidth 10: intervals span 1-4 buckets; pair (1,2) shares
    // several buckets and must still surface exactly once
    val l = Seq(
      (1L, "u", 0L, 35L),    // spans buckets 0..3
      (2L, "u", 50L, 60L),   // touches r3 end-to-start: NO overlap
      (3L, "u", 90L, 95L),
      (4L, "w", 0L, 100L)    // other key group
    ).toDF("lid", "k", "start", "end")
    val r = Seq(
      (10L, "u", 5L, 30L),   // overlaps l1 across buckets 0..2
      (11L, "u", 40L, 50L),  // [40,50) vs l2 [50,60): half-open, no pair
      (12L, "u", 94L, 99L),  // overlaps l3
      (13L, "w", 99L, 101L)  // overlaps l4 in the w group only
    ).toDF("rid", "k", "start", "end")
    val got = Joins.intervalJoin(l, r, Seq("k"), "lid", "rid",
        bucketWidth = 10L)
      .select("k", "lid", "rid", "ov_start", "ov_end")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val brute = l.as("a").join(r.as("b"),
        col("a.k") === col("b.k") &&
        col("a.start") < col("b.end") && col("b.start") < col("a.end"))
      .select(col("a.k"), col("lid"), col("rid"),
        greatest(col("a.start"), col("b.start")).as("ov_start"),
        least(col("a.end"), col("b.end")).as("ov_end"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got.sorted === brute.sorted)
    assert(got.size === got.distinct.size, "each pair exactly once")
    assert(got.map(p => (p._2, p._3)).toSet ===
      Set((1L, 10L), (3L, 12L), (4L, 13L)))
  }

  test("fuzzyJoin equals brute force: substitution, insertion, deletion, self") {
    val l = Seq((1L, "spark"), (2L, "filter"), (3L, "window"), (4L, "merge"))
      .toDF("id", "s")
    val r = Seq((10L, "spork"),  // substitution → dist 1
                (11L, "filters"), // insertion → dist 1
                (12L, "windo"),   // deletion → dist 1
                (13L, "merge"),   // identical → dist 0
                (14L, "stream")   // nothing within 1
      ).toDF("id", "s")
    val got = Joins.fuzzyJoin(l, r, "id", "s", "id", "s", maxDist = 1)
      .select("left_id", "right_id", "dist")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val brute = l.as("a").join(r.as("b"),
        levenshtein(col("a.s"), col("b.s")) <= 1)
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.s"), col("b.s")).cast("long"))
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(got === brute)
    assert(got.map(p => (p._1, p._2)).toSet ===
      Set((1L, 10L), (2L, 11L), (3L, 12L), (4L, 13L)))
    assert(got.size === got.distinct.size, "each pair exactly once")
  }

  test("fuzzyJoin at depth 2 finds dist-2 pairs brute force finds") {
    val l = Seq((1L, "spark"), (2L, "quantile")).toDF("id", "s")
    val r = Seq((10L, "sprk"),      // dist 1
                (11L, "sprocket"),  // far
                (12L, "quintole"),  // dist 3 — excluded
                (13L, "quanta")     // dist 3 — excluded
      ).toDF("id", "s")
    val got = Joins.fuzzyJoin(l, r, "id", "s", "id", "s", maxDist = 2)
      .select("left_id", "right_id", "dist")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val brute = l.as("a").join(r.as("b"),
        levenshtein(col("a.s"), col("b.s")) <= 2)
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.s"), col("b.s")).cast("long"))
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(got === brute)
  }

  test("fuzzyJoin long-string guard: q-gram path equals brute force, " +
      "boundary-straddling pairs found, worst-case fan-out stays linear") {
    // a ~360-char string at maxDist 2 would emit ~65k deletion variants
    // per row on the old single-path plan; the guard routes it through
    // positional q-grams (one row per gram — linear in length)
    val base = ("the quick brown fox jumps over the lazy dog " * 8).trim
    val l = Seq((1L, base),
                (2L, "a" * 63),  // short class (len <= 64)
                (3L, "entity resolution"),
                // 2000 chars: would be ~2M variants/row at depth 2 on
                // the unguarded plan — the guard makes it ~1985 gram rows
                (4L, "x" * 1000 + "y" * 1000)).toDF("id", "s")
    val r = Seq((10L, base.drop(1)),    // delete at front → dist 1
                (11L, base + "!?"),     // two appends → dist 2
                (12L, "a" * 65),        // dist 2 vs "a"*63 — pair straddles
                                        // the maxLen=64 class boundary
                (13L, ("lorem ipsum " * 30).trim),   // far, same length
                (14L, "x" * 1000 + "y" * 999 + "z")  // dist 1 vs id 4
      ).toDF("id", "s")
    val got = Joins.fuzzyJoin(l, r, "id", "s", "id", "s", maxDist = 2)
      .select("left_id", "right_id", "dist")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val brute = l.as("a").join(r.as("b"),
        levenshtein(col("a.s"), col("b.s")) <= 2)
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.s"), col("b.s")).cast("long"))
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(got === brute)
    assert(got.map(p => (p._1, p._2)).toSet ===
      Set((1L, 10L), (1L, 11L), (2L, 12L), (4L, 14L)))
    assert(got.size === got.distinct.size,
      "pairs found by both class paths must collapse to one row")
  }
}
