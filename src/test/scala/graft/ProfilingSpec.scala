package graft

import graft.operators.Profiling

class ProfilingSpec extends SparkTestBase {
  import spark.implicits._

  test("profile: one row per column with nulls, distincts, min/max strings") {
    val df = Seq(
      (1L, Some("a"), Some(2.5)),
      (2L, None, Some(-1.0)),
      (3L, Some("b"), None),
      (4L, Some("a"), Some(2.5))
    ).toDF("id", "s", "v")
    val p = Profiling.profile(df, Seq("id", "s", "v"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(p("id") === (("id", 4L, 0L, 4L, "1", "4")))
    assert(p("s") === (("s", 4L, 1L, 2L, "a", "b")))
    assert(p("v") === (("v", 4L, 1L, 2L, "-1.0", "2.5")))
  }

  test("keySkew: heaviest keys first with exact shares, bounded output") {
    val df = (Seq.fill(6)("hot") ++ Seq.fill(3)("warm") ++ Seq("cold"))
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
    val out = Profiling.keySkew(df, "k", k = 2)
      .as[(String, Long, Double)].collect().toSeq
    assert(out === Seq(("hot", 6L, 0.6), ("warm", 3L, 0.3)))
    // top-k fuses into a bounded selection — no global sort materializes
    val plan = Profiling.keySkew(df, "k", k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must fuse sort+limit:\n$plan")
  }

  test("hllSlices + hllMergedEstimate: slice-merge equals whole-corpus sketch") {
    import org.apache.spark.sql.functions._
    // 400 rows, 120 distinct keys spread over 4 slices with overlap
    val df = (0 until 400).map(i => (i % 4, (i * 7 % 120).toLong))
      .toDF("slice_in", "key")
    val slices = Profiling.hllSlices(df, col("slice_in"), "key")
    assert(slices.count() === 4)
    val Array(est) = Profiling.hllMergedEstimate(slices).collect()
    val approx = est.getLong(0)
    assert(est.getLong(1) === 400L, "row totals carry through the merge")
    // lgK=12 → rsd ~1.6%; 120 distincts should land within ±5%
    assert(math.abs(approx - 120L) <= 6,
      s"merged estimate $approx too far from exact 120")
    // merging slice sketches must agree with sketching the corpus whole
    val Array(whole) = Profiling.hllMergedEstimate(
      Profiling.hllSlices(df, lit(0), "key")).collect()
    assert(approx === whole.getLong(0),
      "sketch union is exact over sketch state: slicing cannot change it")
  }

  test("distributionDrift: smoothed shares over the union key set, KL signs") {
    val a = Seq("x", "x", "x", "y").toDF("src")
    val b = Seq("y", "y", "z", "z").toDF("src")
    val rows = Profiling.distributionDrift(a, b, "src")
      .orderBy("src")
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    // union keys x,y,z (k=3), totals 4/4; add-one smoothing: x present
    // only in a gets a finite positive contribution, z (only in b) a
    // negative one — no division by zero anywhere
    assert(rows.map(r => (r._1, r._2, r._3)) ===
      Seq(("x", 3L, 0L), ("y", 1L, 2L), ("z", 0L, 2L)))
    val byKey = rows.map(r => r._1 -> r).toMap
    assert(byKey("x")._4 === 4.0 / 7 && byKey("x")._5 === 1.0 / 7)
    assert(byKey("x")._6 === 0.792168206)
    assert(byKey("y")._6 === -0.115847174)
    assert(byKey("z")._6 === -0.156944613)
    assert(math.abs(rows.map(_._6).sum -
      rows.map(r => r._4 * math.log(r._4 / r._5)).sum) < 1e-8,
      "summed contributions are total KL(a||b) up to the 9-dec rounding")
  }

  test("profile scans the input once (single aggregate family, no reread)") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    val plan = Profiling.profile(df, Seq("id", "s"))
      .queryExecution.executedPlan.toString
    // multi-distinct goes through one Expand; there must be exactly one
    // scan of the input in the plan
    assert(plan.sliding("LocalTableScan".length)
      .count(_ == "LocalTableScan") === 1, s"input must be scanned once:\n$plan")
  }
}
