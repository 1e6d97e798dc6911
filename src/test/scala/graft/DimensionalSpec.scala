package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Dimensional

class DimensionalSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("upsert: updates replace, new keys append, untouched rows survive") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "v")
    val updates = Seq((2L, "B!", 99.0), (4L, "d", 40.0))
      .toDF("id", "name", "v")
    val out = Dimensional.upsert(target, updates, Seq("id"))
      .as[(Long, String, Double)].collect().toSet
    assert(out === Set(
      (1L, "a", 10.0), (2L, "B!", 99.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("upsert is idempotent for the same updates") {
    val target = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val updates = Seq((2L, "B")).toDF("id", "name")
    val once = Dimensional.upsert(target, updates, Seq("id"))
    val twice = Dimensional.upsert(once, updates, Seq("id"))
    assert(rendered(once.orderBy("id")) === rendered(twice.orderBy("id")))
  }

  test("upsert with versionCol replays a change log latest-wins") {
    val target = Seq((1L, "a", 0L)).toDF("id", "name", "ver")
    val log = Seq((1L, "a1", 1L), (1L, "a2", 2L), (2L, "b1", 5L))
      .toDF("id", "name", "ver")
    val out = Dimensional.upsert(target, log, Seq("id"), versionCol = Some("ver"))
      .as[(Long, String, Long)].collect().toSet
    assert(out === Set((1L, "a2", 2L), (2L, "b1", 5L)),
      "highest version per key wins; no duplicate keys in the output")
  }

  test("scd2 refuses input that already carries history columns") {
    val bad = Seq((1L, ts("2024-01-01 00:00:00"), true))
      .toDF("user_id", "ts", "is_current")
    intercept[IllegalArgumentException] {
      Dimensional.scd2(bad, "user_id", "ts")
    }
  }

  test("scd2: versions chain [from, to), last is open and current") {
    val changes = Seq(
      (7L, ts("2024-01-01 00:00:00"), "bronze"),
      (7L, ts("2024-02-01 00:00:00"), "silver"),
      (7L, ts("2024-03-01 00:00:00"), "gold"),
      (8L, ts("2024-01-15 00:00:00"), "bronze")
    ).toDF("user_id", "ts", "tier")
    val out = Dimensional.scd2(changes, "user_id", "ts")
      .select("user_id", "tier", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean)]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(out((7L, "bronze")) ===
      ((ts("2024-01-01 00:00:00"), Some(ts("2024-02-01 00:00:00")), false)))
    assert(out((7L, "silver")) ===
      ((ts("2024-02-01 00:00:00"), Some(ts("2024-03-01 00:00:00")), false)))
    assert(out((7L, "gold")) ===
      ((ts("2024-03-01 00:00:00"), None, true)))
    assert(out((8L, "bronze"))._3 === true, "single version is current")
  }

  test("scd2 tieBreak makes same-timestamp changes deterministic") {
    val changes = Seq(
      (7L, ts("2024-01-01 00:00:00"), 1L, "first"),
      (7L, ts("2024-01-01 00:00:00"), 2L, "second")
    ).toDF("user_id", "ts", "seq", "v")
    val current = Dimensional.scd2(changes, "user_id", "ts", Seq("seq"))
      .filter(col("is_current")).select("v").as[String].collect()
    assert(current.toSeq === Seq("second"))
  }

  test("maintainSummary: CDF deltas roll the summary to the from-scratch " +
       "truth; emptied groups vanish") {
    val v1 = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L))
      .toDF("k", "g", "v")
    val prev = Dimensional.summarizeForMaintenance(v1, "g", "v")
    // update k=2 (20 -> 25), delete k=3 (group b empties), insert k=4/c
    val cdf = Seq(
      (2L, "a", 20L, "update_preimage"), (2L, "a", 25L, "update_postimage"),
      (3L, "b", 5L, "delete"), (4L, "c", 7L, "insert")
    ).toDF("k", "g", "v", "_change_type")
    val rolled = Dimensional.maintainSummary(prev, cdf, "g", "v")
      .select(col("g"), col("n_rows"), col("sum_dec").cast("double"))
      .as[(String, Long, Double)].collect().toSet
    assert(rolled === Set(("a", 2L, 35.0), ("c", 1L, 7.0)),
      "update nets +5 on a; b drops at count 0; c appears")
    val v2 = Seq((1L, "a", 10L), (2L, "a", 25L), (4L, "c", 7L))
      .toDF("k", "g", "v")
    val direct = Dimensional.summarizeForMaintenance(v2, "g", "v")
      .select(col("g"), col("n_rows"), col("sum_dec").cast("double"))
      .as[(String, Long, Double)].collect().toSet
    assert(rolled === direct, "rolled-forward equals from-scratch")
  }
}
