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

  test("approxPercentilesChecked: exact median, verdict honors the rank guarantee") {
    val df = ((1 to 99).map(i => ("a", Some(i.toDouble))) ++
      Seq(("b", Some(1.0)), ("b", Some(2.0)), ("b", Some(100.0)),
        ("b", Option.empty[Double])))
      .toDF("g", "v")
    val out = Profiling.approxPercentilesChecked(df, "g", "v")
      .as[(String, Double, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out("a")._2 === 50.0, "odd count → middle element exactly")
    assert(out("a")._3 && out("b")._3,
      "sketch rank guarantee holds on both groups")
    assert(out("b")._2 === 2.0, "nulls ignored; median of {1,2,100} = 2")
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

  test("MisraGries summary is a superset of keys above n/(k+1), size <= k") {
    val rows = Seq.fill(40)("x") ++ Seq.fill(30)("y") ++ (1 to 50).map(i => s"z$i")
    val ds = rows.toDS().repartition(11) // force many partial merges
    val m = ds.select(new graft.functions.MisraGriesAggregator(4).toColumn)
      .head()
    // n=120, n/(k+1)=24: x(40) and y(30) are guaranteed present
    assert(m.contains("x") && m.contains("y"))
    assert(m.size <= 4)
    // weights underestimate true frequency by at most n/(k+1)
    assert(m("x") <= 40L && m("x") >= 40L - 24L)
    assert(m("y") <= 30L && m("y") >= 30L - 24L)
  }

  test("heavyHitters returns exactly the keys above n/(k+1), with exact counts") {
    // n=210, k=3 → threshold 52.5: 'a'(100) qualifies, 'b'(50) does not
    val rows = Seq.fill(100)("a") ++ Seq.fill(50)("b") ++
      (1 to 60).map(i => s"f$i")
    val df = rows.toDF("k").repartition(7)
    val out = Profiling.heavyHitters(df, "k", k = 3).collect()
    assert(out.map(_.getString(0)).toSeq === Seq("a"))
    assert(out(0).getLong(1) === 100L, "counts are exact, not sketch weights")
    assert(out(0).getDouble(2) === 100.0 / 210)
  }

  test("heavyHitters matches the full grouped count on a near-uniform stress case") {
    // 31 distinct keys vs k=30 slots — the sketch's worst case; output
    // must still equal the exact HAVING cnt*(k+1) > n set
    val rows = (0 until 2000).map(i => s"t${i % 31}")
    val df = rows.toDF("k").repartition(13)
    val k = 30
    val out = Profiling.heavyHitters(df, "k", k).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val n = rows.size
    val expected = rows.groupBy(identity)
      .map { case (key, v) => (key, v.size.toLong) }
      .filter { case (_, c) => c * (k + 1) > n }
      .toSeq.sortBy { case (key, c) => (-c, key) }
    assert(out === expected)
    assert(out.nonEmpty, "stress case must actually exercise the threshold")
  }

  test("heavyHittersByGroup applies the threshold per group, exactly") {
    // g1: n=12 → thresh 4: a(8) in, b(4) out. g2: n=3 → thresh 1: c(2) in.
    val rows = Seq.fill(8)(("g1", "a")) ++ Seq.fill(4)(("g1", "b")) ++
      Seq.fill(2)(("g2", "c")) ++ Seq(("g2", "d"))
    val df = rows.toDF("g", "k").repartition(5)
    val out = Profiling.heavyHittersByGroup(df, "g", "k", k = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(out === Seq(("g1", "a", 8L), ("g2", "c", 2L)))
  }

  test("heavyHittersByGroup matches the grouped count on the near-uniform stress case") {
    val rows = (0 until 3000).map(i => (s"g${i % 3}", s"t${i % 31}"))
    val df = rows.toDF("g", "k").repartition(13)
    val k = 30
    val out = Profiling.heavyHittersByGroup(df, "g", "k", k).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val expected = rows.groupBy(identity)
      .map { case ((g, key), v) => (g, key, v.size.toLong) }
      .filter { case (g, _, c) =>
        c * (k + 1) > rows.count(_._1 == g) }
      .toSet
    assert(out === expected)
    assert(out.nonEmpty)
  }

  test("heavyHittersByGroup treats a NULL group as its own group") {
    val rows: Seq[(Option[String], String)] =
      Seq.fill(5)((None, "x")) ++ Seq((None, "y")) ++
      Seq.fill(3)((Some("g"), "z"))
    val df = rows.toDF("g", "k")
    val out = Profiling.heavyHittersByGroup(df, "g", "k", k = 2).collect()
      .map(r => (Option(r.getString(0)), r.getString(1), r.getLong(2))).toSet
    // NULL group: n=6, thresh 2 → x(5) in, y(1) out; g: n=3 → z(3) in
    assert(out === Set((None, "x", 5L), (Some("g"), "z", 3L)))
  }

  test("heavyHitters excludes NULL keys and handles the empty frame") {
    val df = Seq(Some("a"), Some("a"), Some("a"), None).toDF("k")
    val out = Profiling.heavyHitters(df, "k", k = 2).collect()
    assert(out.map(_.getString(0)).toSeq === Seq("a"))
    assert(out(0).getLong(1) === 3L, "n counts non-null rows only")
    val empty = Profiling.heavyHitters(
      spark.emptyDataset[String].toDF("k"), "k", k = 2)
    assert(empty.count() === 0L)
  }

  test("validate: one-scan rule suite with exact violation counts") {
    import Profiling.{InRange, NotNull, OneOf, Unique}
    val df = Seq(
      (Some(1L), Some(10.0), Some("a")),
      (Some(1L), Some(20.0), Some("b")),   // dup id, value out of range
      (Some(2L), None, Some("zzz")),       // null value, bad category
      (None, Some(5.0), None),             // null id, null category
      (None, Some(7.0), Some("a"))         // second null id → dup group
    ).toDF("id", "v", "cat")
    val out = Profiling.validate(df, Seq(
        NotNull("id"), Unique("id"), InRange("v", 0.0, 15.0),
        OneOf("cat", Seq("a", "b"))))
      .as[(String, String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("not_null(id)") === (("not_null(id)", "id", 5L, 2L, false)))
    // 5 rows, 2 distinct non-null ids, 2 nulls → (5-2) - (2-1) = 2 dups
    assert(out("unique(id)") === (("unique(id)", "id", 5L, 2L, false)))
    assert(out("in_range(v)") === (("in_range(v)", "v", 5L, 1L, false)),
      "NULL values are not range violations")
    assert(out("one_of(cat)") === (("one_of(cat)", "cat", 5L, 1L, false)),
      "NULL categories are not membership violations")
    // exactly ONE null: the null group is unique like any other value —
    // no phantom violation (the nullCount-1 formula would report one)
    val oneNull = Seq(Some(1L), Some(2L), None).toDF("id")
    assert(Profiling.validate(oneNull, Seq(Unique("id")))
      .as[(String, String, Long, Long, Boolean)].head()
      === (("unique(id)", "id", 3L, 0L, true)))
    // THREE nulls form one group → exactly 2 duplicate rows
    val threeNulls = Seq(Some(1L), None, None, None).toDF("id")
    assert(Profiling.validate(threeNulls, Seq(Unique("id")))
      .as[(String, String, Long, Long, Boolean)].head()
      === (("unique(id)", "id", 4L, 2L, false)))
    // a clean frame passes everything
    val clean = Seq((1L, 1.0, "a"), (2L, 2.0, "b")).toDF("id", "v", "cat")
    assert(Profiling.validate(clean, Seq(
        NotNull("id"), Unique("id"), InRange("v", 0.0, 15.0),
        OneOf("cat", Seq("a", "b"))))
      .as[(String, String, Long, Long, Boolean)].collect()
      .forall(r => r._4 === 0L && r._5))
  }

  test("ksTwoSample: 0 for identical samples, 1 for disjoint, exact mid-case") {
    val a = Seq(1L, 2L, 3L, 4L).toDF("v")
    assert(Profiling.ksTwoSample(a, a, "v")
      .as[(Long, Long, Long, Double)].head() === ((4L, 4L, 0L, 0.0)))
    val hi = Seq(10L, 11L).toDF("v")
    assert(Profiling.ksTwoSample(a, hi, "v")
      .as[(Long, Long, Long, Double)].head() === ((4L, 2L, 8L, 1.0)))
    // a = {1,2,3,4}, b = {3,4,5,6}: D = |F_a − F_b| peaks at v=2:
    // |2/4 − 0/4| = 1/2 → d_num = |2·4 − 0·4| = 8, ks_d = 8/16
    val b = Seq(3L, 4L, 5L, 6L).toDF("v")
    assert(Profiling.ksTwoSample(a, b, "v")
      .as[(Long, Long, Long, Double)].head() === ((4L, 4L, 8L, 0.5)))
    // binWidth 10 puts {1..4} and {3..6} in one bin each → no drift at
    // that resolution
    assert(Profiling.ksTwoSample(a, b, "v", binWidth = 10.0)
      .as[(Long, Long, Long, Double)].head() === ((4L, 4L, 0L, 0.0)))
    // empty-side contract: defined 0.0, never NULL/NaN
    val none = Seq.empty[Long].toDF("v")
    assert(Profiling.ksTwoSample(a, none, "v")
      .as[(Long, Long, Long, Double)].head() === ((4L, 0L, 0L, 0.0)))
    assert(Profiling.ksTwoSample(none, none, "v")
      .as[(Long, Long, Long, Double)].head() === ((0L, 0L, 0L, 0.0)))
  }

  test("wasserstein1: exact earth-mover distance per group; identical " +
       "and one-sided groups read 0") {
    // g: a = {1.00, 2.00} → b = {3.00}: transport cost
    // (|1−3| + |2−3|)/2 = 1.5. h: only side a → 0.0 by contract.
    // k: identical distributions → 0.0
    val a = Seq(("g", 1.0), ("g", 2.0), ("h", 5.0), ("k", 7.0))
      .toDF("grp", "v")
    val b = Seq(("g", 3.0), ("k", 7.0)).toDF("grp", "v")
    val out = Profiling.wasserstein1(a, b, "grp", "v", scale = 100L)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("g") === (("g", 2L, 1L, 1.5)))
    assert(out("h") === (("h", 1L, 0L, 0.0)))
    assert(out("k") === (("k", 1L, 1L, 0.0)))
  }

  test("mannWhitney: exact 2U with tie halves; dominance reads ±1, " +
       "pure ties read 0, one-sided arms read NULL") {
    // g: a={1,2} all below b={3} → 2U = 4, r = 4/2−1 = +1
    // h: a={3} above b={1,2} → 2U = 0, r = −1
    // t: a={5}, b={5} pure tie → 2U = 1, r = 0
    // o: a only → NULL effect
    val a = Seq(("g", 1.0), ("g", 2.0), ("h", 3.0), ("t", 5.0), ("o", 9.0))
      .toDF("grp", "v")
    val b = Seq(("g", 3.0), ("h", 1.0), ("h", 2.0), ("t", 5.0))
      .toDF("grp", "v")
    val out = Profiling.mannWhitney(a, b, "grp", "v")
      .as[(String, Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(out("g") === (("g", 2L, 1L, 4L, Some(1.0))))
    assert(out("h") === (("h", 1L, 2L, 0L, Some(-1.0))))
    assert(out("t") === (("t", 1L, 1L, 1L, Some(0.0))))
    assert(out("o") === (("o", 1L, 0L, 0L, None)))
  }

  test("spearman: ±1 on monotone maps regardless of shape; exact " +
       "tie-averaged mid-case; constant columns read NULL") {
    // m: y = exp-ish of x (monotone, non-linear) → exactly +1
    // i: inverse order → −1
    // t: x = (1,2,2,3) vs y strictly increasing → ranks (1,2.5,2.5,4)
    //    vs (1,2,3,4): ρ = 3/√10 = 0.948683298 (9-dec)
    // c: constant y → zero rank variance → NULL
    val df = Seq(
      ("m", 1.0, 10.0), ("m", 2.0, 100.0), ("m", 3.0, 1e6),
      ("i", 1.0, 9.0), ("i", 2.0, 5.0), ("i", 3.0, 1.0),
      ("t", 1.0, 10.0), ("t", 2.0, 20.0), ("t", 2.0, 30.0),
      ("t", 3.0, 40.0),
      ("c", 1.0, 7.0), ("c", 2.0, 7.0))
      .toDF("grp", "x", "y")
    val out = Profiling.spearman(df, "grp", "x", "y")
      .as[(String, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(out("m") === (("m", 3L, Some(1.0))))
    assert(out("i") === (("i", 3L, Some(-1.0))))
    assert(out("t") === (("t", 4L, Some(0.948683298))))
    assert(out("c") === (("c", 2L, None)))
  }

  test("kendallTau: ±1 on monotone/inverse maps; hand-computed tie-" +
       "adjusted mid-case; all-tied x reads NULL") {
    // m: strictly concordant → +1;  i: strictly discordant → −1
    // t: (1,1),(2,2),(2,3),(3,4): n=4, n0=6, tx=1 (x=2 pair), ty=0,
    //    C−D=5 → τb = 5/√((6−1)·6) = 5/√30 = 0.912870929 (9-dec)
    // c: x constant → n0−tx = 0 → NULL
    val df = Seq(
      ("m", 1.0, 10L), ("m", 2.0, 20L), ("m", 3.0, 30L),
      ("i", 1.0, 9L), ("i", 2.0, 5L), ("i", 3.0, 1L),
      ("t", 1.0, 1L), ("t", 2.0, 2L), ("t", 2.0, 3L), ("t", 3.0, 4L),
      ("c", 1.0, 7L), ("c", 1.0, 8L))
      .toDF("grp", "x", "y")
    val out = Profiling.kendallTau(df, "grp", "x", "y")
      .as[(String, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(out("m") === (("m", 3L, 3L, Some(1.0))))
    assert(out("i") === (("i", 3L, 3L, Some(-1.0))))
    assert(out("t") === (("t", 4L, 4L, Some(0.912870929))))
    assert(out("c") === (("c", 2L, 2L, None)))
    // duplicate rows collapse into cell counts, same result
    val dup = df.union(df.filter($"grp" === "t"))
    assert(Profiling.kendallTau(dup, "grp", "x", "y")
      .filter($"grp" === "t").as[(String, Long, Long, Option[Double])]
      .head()._2 === 8L)
  }

  test("kendallTau cells-cap guard: a group whose distinct (x, y) cell " +
       "count exceeds maxCells raises loudly instead of running a " +
       "rows²-shaped pair join; at-cap groups pass unchanged") {
    // 6 distinct cells in one group: over a cap of 5, at a cap of 6
    val wide = (1 to 6).map(i => ("g", i.toDouble, i.toLong))
      .toDF("grp", "x", "y")
    val e = intercept[Exception] {
      Profiling.kendallTau(wide, "grp", "x", "y", maxCells = 5).collect()
    }
    assert(e.getMessage.contains("kendallTau") ||
      Option(e.getCause).exists(_.getMessage.contains("kendallTau")))
    assert(Profiling.kendallTau(wide, "grp", "x", "y", maxCells = 6)
      .as[(String, Long, Long, Option[Double])].head() ===
      (("g", 6L, 6L, Some(1.0))))
    // the guard is per-group: an over-cap group poisons the run even
    // when other groups are small (loud, never silently partial)
    val mixed = wide.union(Seq(("h", 1.0, 1L), ("h", 2.0, 2L))
      .toDF("grp", "x", "y"))
    intercept[Exception] {
      Profiling.kendallTau(mixed, "grp", "x", "y", maxCells = 5).collect()
    }
    intercept[IllegalArgumentException] {
      Profiling.kendallTau(wide, "grp", "x", "y", maxCells = 0)
    }
  }

  test("auc: perfect separation reads 1.0, inverted 0.0, all-tied 0.5 " +
       "(the Mann-Whitney tie-half), hand-computed mid-case; one-sided " +
       "groups read NULL") {
    val df = Seq(
      // p: positives strictly above negatives → 1.0
      ("p", 1.0, false), ("p", 2.0, false), ("p", 3.0, true), ("p", 4.0, true),
      // i: inverted → 0.0
      ("i", 9.0, false), ("i", 1.0, true),
      // t: every score tied → U = n·m/2 → 0.5
      ("t", 5.0, true), ("t", 5.0, false), ("t", 5.0, true),
      // m: neg {1, 3}, pos {2, 4}: pairs (1<2),(1<4),(3<4) → U=3 of 4 → 0.75
      ("m", 1.0, false), ("m", 3.0, false), ("m", 2.0, true), ("m", 4.0, true),
      // o: one-sided (positives only) → NULL
      ("o", 1.0, true), ("o", 2.0, true))
      .toDF("grp", "score", "label")
    val out = Profiling.auc(df, "grp", "score", "label")
      .as[(String, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(out("p") === (("p", 2L, 2L, Some(1.0))))
    assert(out("i") === (("i", 1L, 1L, Some(0.0))))
    assert(out("t") === (("t", 1L, 2L, Some(0.5))))
    assert(out("m") === (("m", 2L, 2L, Some(0.75))))
    assert(out("o") === (("o", 0L, 2L, None)))
    // NULL labels drop entirely (neither side)
    val nullRow = Seq(("m", 100.0, Option.empty[Boolean]))
      .toDF("grp", "score", "label")
    assert(Profiling.auc(df.union(nullRow), "grp", "score", "label")
      .filter($"grp" === "m").as[(String, Long, Long, Option[Double])]
      .head() === (("m", 2L, 2L, Some(0.75))))
  }

  test("snapshotDiff: all four statuses, NULL-text pairs read " +
       "unchanged, NULL-vs-text reads changed") {
    val before = Seq(
      (1L, "same text"), (2L, "old text"), (3L, "drops out"),
      (4L, null.asInstanceOf[String]), (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val after = Seq(
      (1L, "same text"), (2L, "new text"), (6L, "brand new"),
      (4L, null.asInstanceOf[String]), (5L, "materialized"))
      .toDF("doc_id", "text")
    val out = Profiling.snapshotDiff(before, after)
      .as[(Long, String)].collect().toMap
    assert(out === Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "changed", 6L -> "added"))
  }

  test("prCurve: hand-computed cumulative curve — distinct scores " +
       "collapse, precision and recall walk the descending thresholds, " +
       "zero-positive groups read NULL recall") {
    val df = Seq(
      // g: scores 3 (pos), 2 (pos + neg), 1 (neg): curve at t=3 →
      // (1, 1, 1.0, 0.5); t=2 → (3, 2, 2/3, 1.0); t=1 → (4, 2, .5, 1.0)
      ("g", 3.0, true), ("g", 2.0, true), ("g", 2.0, false),
      ("g", 1.0, false),
      // z: no positives → recall NULL at every threshold
      ("z", 5.0, false), ("z", 4.0, false))
      .toDF("grp", "score", "label")
    val out = Profiling.prCurve(df, "grp", "score", "label")
      .as[(String, Double, Long, Long, Double, Option[Double])]
      .collect().toSet
    assert(out === Set(
      ("g", 3.0, 1L, 1L, 1.0, Some(0.5)),
      ("g", 2.0, 3L, 2L, 0.666666667, Some(1.0)),
      ("g", 1.0, 4L, 2L, 0.5, Some(1.0)),
      ("z", 5.0, 1L, 0L, 0.0, None),
      ("z", 4.0, 2L, 0L, 0.0, None)))
  }

  test("kAnonymityViolations flags sub-k quasi-identifier groups; " +
      "NULLs group as values") {
    val df = Seq(
      (1L, "US", "A"), (2L, "US", "A"), (3L, "US", "A"),
      (4L, "DE", "B"), (5L, "DE", "B"),
      (6L, null.asInstanceOf[String], "C")
    ).toDF("id", "country", "seg")
    val out = Profiling.kAnonymityViolations(df, Seq("country", "seg"), 3L)
      .as[(String, String, Long)].collect().toSet
    assert(out === Set(("DE", "B", 2L), (null, "C", 1L)),
      "the 3-row US/A group is k-anonymous at k=3; NULL country groups")
    assert(Profiling.kAnonymityViolations(df, Seq("country", "seg"), 2L)
      .count() === 1, "at k=2 only the singleton NULL/C group violates")
  }

  test("benford: leading digits from decimal rendering; sub-1 and NULL " +
       "values drop; law column is exact") {
    val df = Seq[java.lang.Double](123.4, 19.0, 150.0, 0.5, null, 9000.0,
      1.0).toDF("v")
    val out = Profiling.benford(df, "v")
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet === Set(1L, 9L), "0.5 and NULL contribute nothing")
    assert(out(1L) === ((1L, 4L, 0.8, 0.301029996)),
      "123, 19, 150, 1 lead with 1; expected = ln(2)/ln(10)")
    assert(out(9L) === ((9L, 1L, 0.2, 0.045757491)))
  }

  test("mutualInformation: dependent cells score ln2, independent 0, " +
       "NULLs drop") {
    val dep = Seq(("en", "a"), ("en", "a"), ("fr", "b"), ("fr", "b"),
      (null.asInstanceOf[String], "a"))
      .toDF("lang", "source")
    val d = Profiling.mutualInformation(dep, "lang", "source")
      .as[(String, String, Long, Double)].collect().toSet
    assert(d === Set(("en", "a", 2L, 0.693147181),
                     ("fr", "b", 2L, 0.693147181)),
      "perfect dependence: every cell at ln 2; the NULL row is excluded")
    val ind = Seq(("en", "a"), ("en", "b"), ("fr", "a"), ("fr", "b"))
      .toDF("lang", "source")
    val i = Profiling.mutualInformation(ind, "lang", "source")
      .as[(String, String, Long, Double)].collect()
    assert(i.forall(_._4 === 0.0), "independent columns: all cells at 0")
  }

  test("gini: uniform mass scores 0, one-row mass scores (n-1)/n, " +
       "NULL/negative rows drop") {
    val df = Seq(
      ("even", Some(7L)), ("even", Some(7L)), ("even", Some(7L)),
      ("even", Some(7L)),
      ("conc", Some(0L)), ("conc", Some(0L)), ("conc", Some(0L)),
      ("conc", Some(10L)),
      ("conc", None), ("conc", Some(-5L)),
      ("zero", Some(0L)))
      .toDF("src", "v")
    val out = Profiling.gini(df, "src", "v")
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out("even") === (("even", 4L, 28L, 0.0)),
      "equal values: Lorenz curve is the diagonal")
    assert(out("conc") === (("conc", 4L, 10L, 0.75)),
      "all mass on the last rank: G = (n-1)/n; NULL and negative drop")
    assert(!out.contains("zero"), "sum=0 groups have no Lorenz curve")
  }

  test("cohenKappa: perfect=1, independent=0, constant raters -> NULL") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      // perfect agreement, mixed labels
      ("p", true, true), ("p", false, false), ("p", true, true),
      // independence: uniform 2x2 grid
      ("i", true, true), ("i", true, false),
      ("i", false, true), ("i", false, false),
      // both raters constant: pe = 1, kappa undefined
      ("c", true, true), ("c", true, true))
      .toDF("g", "a", "b")
    val out = Profiling.cohenKappa(df, "g", col("a"), col("b"))
      .select("g", "po", "pe", "kappa")
      .as[(String, Double, Double, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(out("p") === (("p", 1.0, 0.555555556, Some(1.0))))
    assert(out("i") === (("i", 0.5, 0.5, Some(0.0))),
      "uniform grid: observed agreement equals chance")
    assert(out("c") === (("c", 1.0, 1.0, None)),
      "degenerate raters: kappa is NULL, not a division blowup")
  }

  test("iqrOutliers: fences from interpolated quartiles, exact censuses") {
    // g: 1..11 plus outliers -100 and 1000 (n=13):
    // q1 = 1 + 0.25*12 = 4? no — quantile over the FULL 13 values:
    // sorted {-100,1..11,1000}; q1 at idx 0.25*12 = 3 -> value 3,
    // q3 at idx 9 -> 9; iqr 6; fences [-6, 18] -> 1 low, 1 high
    val df = ((1 to 11).map(_.toDouble) ++ Seq(-100.0, 1000.0))
      .map(v => ("g", v)).toDF("src", "v")
    val Array(r) = Profiling.iqrOutliers(df, "src", "v")
      .as[(String, Long, Long, Long, Double, Double)].collect()
    assert(r === (("g", 13L, 1L, 1L, 3.0, 9.0)))
    // zero-IQR group: constant bulk, everything off-center is outlier
    val c = (Seq.fill(9)(5.0) ++ Seq(7.0)).map(v => ("c", v))
      .toDF("src", "v")
    val Array(r2) = Profiling.iqrOutliers(c, "src", "v")
      .as[(String, Long, Long, Long, Double, Double)].collect()
    assert(r2 === (("c", 10L, 0L, 1L, 5.0, 5.0)),
      "degenerate quartiles: fences collapse to the constant")
  }

  test("quantileNormalize: rank-based scaling, ties share a value, " +
       "single-row groups pin to 0") {
    val df = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 20L),
      ("a", 4L, 40L), ("b", 5L, 99L)).toDF("g", "id", "v")
    val out = Profiling.quantileNormalize(df, "g", "id", "v")
      .as[(String, Long, Long, Double)].collect().map(r => r._2 -> r._4)
      .toMap
    assert(out(1L) === 0.0 && out(4L) === 1.0,
      "group extremes map to 0 and 1")
    assert(out(2L) === out(3L) && out(2L) === 0.333333333,
      "tied values share rank (rank gap semantics): (2-1)/3")
    assert(out(5L) === 0.0, "a lone row has no distribution: 0, not NaN")
  }

  test("paretoCoverage: smallest head covering the target, exact share, " +
       "ties ordered by group") {
    // weights 50, 30, 15, 5 (total 100): 80% needs the top TWO (80)
    val df = Seq(("a", 50L), ("b", 30L), ("c", 15L), ("d", 5L))
      .flatMap { case (g, w) => Seq((g, w)) }.toDF("g", "w")
    val Array(r) = Profiling.paretoCoverage(df, "g", "w", target = 0.8)
      .as[(Long, Long, Double)].collect()
    assert(r === ((4L, 2L, 0.8)))
    // a just-higher target pulls in the third group
    val Array(r2) = Profiling.paretoCoverage(df, "g", "w", target = 0.81)
      .as[(Long, Long, Double)].collect()
    assert(r2 === ((4L, 3L, 0.95)))
    // single group trivially covers everything
    val Array(r3) = Profiling.paretoCoverage(
      Seq(("only", 7L)).toDF("g", "w"), "g", "w")
      .as[(Long, Long, Double)].collect()
    assert(r3 === ((1L, 1L, 1.0)))
  }

  test("reconcile: exact sums pass, tolerance splits, childless parents " +
       "and zero totals handled") {
    val parents = Seq((1L, 100.0), (2L, 100.0), (3L, 50.0), (4L, 0.0),
      (5L, 0.0)).toDF("pk", "total")
    val children = Seq(
      (1L, 60.0), (1L, 40.0),     // exact
      (2L, 100.5),                // 0.5% off -> within 1%
      (3L, 60.0),                 // 20% off -> mismatch
      (4L, 0.0))                  // both zero -> exact short-circuit
      .toDF("fk", "amount")       // parent 5 has no children
    val Array(r) = Profiling.reconcile(parents, "pk", "total",
        children, "fk", "amount", relTol = 0.01)
      .as[(Long, Long, Long, Double)].collect()
    assert(r === ((5L, 4L, 2L, 0.2)),
      "mismatches: parent 3 (20%) and childless parent 5; worst 0.2")
  }

  test("madOutliers: robust census survives 40% contamination; zero-MAD " +
       "groups count off-median rows") {
    // g: bulk 1..10 plus outliers {1000, 2000, 3000, -999}: median of 14
    // values = 7.5? sorted: -999,1..10,1000,2000,3000 -> median idx 6.5
    // between 6 and 7 = 6.5; MAD robust despite 4/14 contamination
    val df = ((1 to 10).map(_.toDouble) ++ Seq(1000.0, 2000.0, 3000.0,
      -999.0)).map(v => ("g", v)).toDF("src", "v")
    val Array(r) = Profiling.madOutliers(df, "src", "v")
      .as[(String, Long, Long, Double, Double)].collect()
    assert(r._1 === "g" && r._2 === 14L)
    assert(r._4 === 6.5, "median stays in the bulk")
    // deviations from 6.5: {5.5,4.5,...,0.5,...,3.5, 993.5, ...}:
    // median of sorted devs = between 3.5 and 3.5 -> 3.5
    assert(r._5 === 3.5)
    assert(r._3 === 4L, "exactly the four planted outliers exceed 3*MAD")
    // majority-constant group: MAD 0, off-median rows are the census
    val c = (Seq.fill(8)(5.0) ++ Seq(5.1, 9.0)).map(v => ("c", v))
      .toDF("src", "v")
    val Array(r2) = Profiling.madOutliers(c, "src", "v")
      .as[(String, Long, Long, Double, Double)].collect()
    assert(r2 === (("c", 10L, 2L, 5.0, 0.0)),
      "zero MAD: every off-median row counts, no division blowup")
  }

  test("groupedTrend: exact slopes per group; constant-x groups NULL") {
    val df = Seq(
      ("up", 0L, 1L), ("up", 1L, 3L), ("up", 2L, 5L),   // slope 2
      ("dn", 10L, 9L), ("dn", 12L, 5L),                 // slope -2
      ("flat", 7L, 1L), ("flat", 7L, 9L))               // undetermined
      .toDF("g", "x0", "y0")
    val out = Profiling.groupedTrend(df, "g", "x0", "y0")
      .as[(String, Long, Option[Double])].collect().map(r => r._1 -> r)
      .toMap
    assert(out("up") === (("up", 3L, Some(2.0))))
    assert(out("dn") === (("dn", 2L, Some(-2.0))))
    assert(out("flat") === (("flat", 2L, None)),
      "coincident x never fabricates a slope")
    // large-magnitude x (epoch-hour scale): the RELATIVE determinant
    // guard must not reject a legitimate fit
    val big = Seq(("t", 490000L, 1L), ("t", 490001L, 2L),
      ("t", 490002L, 3L)).toDF("g", "x0", "y0")
    assert(Profiling.groupedTrend(big, "g", "x0", "y0")
      .select("slope").as[Option[Double]].head() === Some(1.0))
  }

  test("loglogFit: exact exponent on a pure power law; degenerate and " +
       "non-positive points handled") {
    // y = 8/x^2 over x in {1,2} -> slope exactly -2 through both points
    val pl = Seq((1.0, 8.0), (2.0, 2.0), (0.0, 5.0), (3.0, -1.0))
      .toDF("x0", "y0")
    val Array((n, s)) = Profiling.loglogFit(pl, "x0", "y0")
      .as[(Long, Option[Double])].collect()
    assert(n === 2L, "x<=0 and y<=0 points drop")
    assert(math.abs(s.get + 2.0) < 1e-6)
    // all x equal: no determined line
    val flat = Seq((2.0, 1.0), (2.0, 9.0)).toDF("x0", "y0")
    assert(Profiling.loglogFit(flat, "x0", "y0")
      .select("slope").as[Option[Double]].head().isEmpty)
  }

  test("chi2Independence: perfect dependence scores N, independence 0, " +
       "absent cells fold in closed-form") {
    val dep = Seq(("x", "p"), ("x", "p"), ("y", "q"), ("y", "q"))
      .toDF("a", "b")
    val Array(d) = Profiling.chi2Independence(dep, "a", "b")
      .as[(Long, Long, Long, Double)].collect()
    assert(d === ((4L, 2L, 1L, 4.0)),
      "phi = 1 on a 2x2 -> chi2 = N; the two ABSENT cells contribute " +
      "their expectation via the telescoped identity")
    val ind = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
      .toDF("a", "b")
    val Array(i) = Profiling.chi2Independence(ind, "a", "b")
      .as[(Long, Long, Long, Double)].collect()
    assert(i === ((4L, 4L, 1L, 0.0)), "uniform grid: no dependence")
  }

  test("refIntegrity: orphan rows vs keys, NULL FKs counted separately") {
    val child = Seq(Some(1L), Some(2L), Some(2L), Some(3L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 2L).toDF("pk")
    val Array(r) = Profiling.refIntegrity(child, "fk", parent, "pk", "t")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(r === (("t", 5L, 1L, 1L, 1L)),
      "key 3 orphans once; the NULL FK is not an orphan")
  }

  test("cmsCheckedCounts: exact counts always surface; verdict holds " +
       "at sane width and flags an undersized sketch") {
    val df = (Seq.fill(6)("hot") ++ Seq.fill(3)("warm") ++ Seq("cold") ++
      Seq(null.asInstanceOf[String])).zipWithIndex
      .map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
    val out = Profiling.cmsCheckedCounts(df, "k", width = 256, depth = 3)
      .as[(String, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet === Set("hot", "warm", "cold"), "NULL keys drop")
    assert(out("hot")._2 === 6L && out("warm")._2 === 3L &&
           out("cold")._2 === 1L, "the checkable payload is EXACT")
    assert(out.values.forall(_._3),
      "3 keys in 256 buckets: the overestimate bound must hold")
    // engineered failure: find two keys sharing a bucket at depth=1,
    // w=4, give one of them 10× the mass — the cold key's overestimate
    // (10) exceeds the bound ceil(e·11/4) = 8, so the verdict must flag
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    val byBucket = spark.range(100)
      .select(col("id").cast("string").as("k"),
        pmod(xxhash64(lit(0), col("id").cast("string")), lit(4L)).as("b"))
      .as[(String, Long)].collect().groupBy(_._2)
    val Seq(hot, cold) =
      byBucket.values.find(_.length >= 2).get.take(2).map(_._1).toSeq
    val clash = (Seq.fill(10)(hot) ++ Seq(cold)).zipWithIndex
      .map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
    val flagged = Profiling.cmsCheckedCounts(clash, "k",
        width = 4, depth = 1)
      .as[(String, Long, Boolean)].collect().map(r => r._1 -> r._3).toMap
    assert(flagged(hot), "the heavy key estimates itself fine")
    assert(!flagged(cold),
      "undersized width must surface as a failing verdict, not silence")
  }

  test("cmsJoinSize: exact Σ cntA·cntB payload, structural overestimate, " +
       "disjoint keys read zero") {
    val a = Seq(1L, 1L, 2L, 3L).map(Tuple1(_)).toDF("ka")
    val b = Seq(1L, 2L, 2L, 2L, 9L).map(Tuple1(_)).toDF("kb")
    // exact = 2·1 (key 1) + 1·3 (key 2) = 5
    val Array(r) = Profiling.cmsJoinSize(a, "ka", b, "kb",
        width = 256, depth = 3)
      .as[(Long, Long, Long, Boolean, Boolean)].collect()
    assert(r === ((4L, 5L, 5L, true, true)))
    // disjoint key sets: exact 0, est >= 0 still structural
    val c = Seq(100L, 200L).map(Tuple1(_)).toDF("kc")
    val Array(r2) = Profiling.cmsJoinSize(a, "ka", c, "kc",
        width = 256, depth = 3)
      .as[(Long, Long, Long, Boolean, Boolean)].collect()
    assert(r2._3 === 0L && r2._4 && r2._5)
  }

  test("calibration: deciles clamp at the top, decimal-exact bucket " +
       "means, gap signs read over/under-confidence") {
    val df = Seq(
      (0.05, false), (0.08, false),          // bin 0: rate 0
      (0.55, true), (0.52, false),           // bin 5: rate 0.5
      (1.0, true), (0.97, true)              // 1.0 clamps into bin 9
    ).toDF("score", "label")
    val out = Profiling.calibration(df, "score", "label", bins = 10)
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet === Set(0L, 5L, 9L), "score 1.0 must top-clamp")
    assert(out(0L)._2 === 2L && out(0L)._4 === 0.0)
    assert(out(5L)._4 === 0.5)
    assert(out(9L)._3 === 0.985 && out(9L)._4 === 1.0 &&
      out(9L)._5 === -0.015, s"bin 9 decimal mean/gap, got ${out(9L)}")
    // null scores/labels drop rather than poison a bucket
    val withNulls = Seq((Some(0.5), Some(true)), (None, Some(true)),
        (Some(0.5), None))
      .toDF("score", "label")
    assert(Profiling.calibration(withNulls, "score", "label")
      .as[(Long, Long, Double, Double, Double)].collect().toSeq ===
      Seq((5L, 1L, 0.5, 1.0, -0.5)))
  }

  test("thresholdForPrecision: max-coverage qualifying cut, exact " +
       "basis-point comparison, empty when the bar is unreachable") {
    // scores desc: 0.9(+), 0.8(+), 0.7(-), 0.6(+), 0.5(-)
    // precision curve: 1/1, 2/2, 2/3, 3/4, 3/5 — target 75% keeps 0.6
    val df = Seq((0.9, true), (0.8, true), (0.7, false), (0.6, true),
        (0.5, false)).toDF("score", "label")
    val Array(r) = Profiling.thresholdForPrecision(df, "score", "label",
        targetBp = 7500)
      .as[(Double, Long, Long, Double)].collect()
    assert(r === ((0.6, 4L, 3L, 0.75)),
      s"75% exactly qualifies at the 0.6 cut (4 kept), got $r")
    // an unreachable bar yields an empty report, not a throw
    assert(Profiling.thresholdForPrecision(df, "score", "label",
      targetBp = 9999).count() === 1) // 0.9 cut alone: 1/1 = 100%
    val allNeg = Seq((0.9, false), (0.1, false)).toDF("score", "label")
    assert(Profiling.thresholdForPrecision(allNeg, "score", "label",
      targetBp = 5000).count() === 0)
  }

  test("psi: nonnegative terms, symmetric total, smoothing keeps " +
       "one-sided keys finite") {
    val a = (Seq.fill(8)("x") ++ Seq.fill(2)("y")).map(Tuple1(_)).toDF("k")
    val b = (Seq.fill(2)("x") ++ Seq.fill(8)("z")).map(Tuple1(_)).toDF("k")
    val out = Profiling.psi(a, b, "k")
      .select("k", "psi_term").as[(String, Double)].collect().toMap
    assert(out.keySet === Set("x", "y", "z"),
      "union keys, one-sided included")
    assert(out.values.forall(_ >= 0.0), "PSI terms never go negative")
    // swapping sides leaves every term unchanged (PSI is symmetric)
    val swapped = Profiling.psi(b, a, "k")
      .select("k", "psi_term").as[(String, Double)].collect().toMap
    assert(out === swapped)
    // identical corpora: every term 0
    assert(Profiling.psi(a, a, "k").select("psi_term").as[Double]
      .collect().forall(_ === 0.0))
  }

  test("weightedPercentiles: lower weighted quantile in exact integer " +
       "arithmetic; zero/null weights drop") {
    // group g: values 1(w=1), 2(w=7), 3(w=2) → W=10; p25 → cum≥2.5 → 2;
    // p50 → cum≥5 → 2 (cum 8); p75 → 2; p90 → cum≥9 → 3
    val df = Seq(("g", 1.0, 1L), ("g", 2.0, 4L), ("g", 2.0, 3L),
        ("g", 3.0, 2L), ("g", 4.0, 0L))
      .toDF("grp", "v", "w")
    val out = Profiling.weightedPercentiles(df, "grp", "v", "w")
      .select("pct", "value").as[(Int, Double)].collect().toMap
    assert(out === Map(25 -> 2.0, 50 -> 2.0, 75 -> 2.0, 90 -> 3.0))
    // boundary exactness: W=4, p50 threshold 100·cum >= 50·4 → cum 2
    // EXACTLY reaches it — the first value is the median, no rounding
    val edge = Seq(("h", 1.0, 2L), ("h", 9.0, 2L)).toDF("grp", "v", "w")
    assert(Profiling.weightedPercentiles(edge, "grp", "v", "w",
        pcts = Seq(50))
      .select("value").as[Double].head() === 1.0)
    // a weight at the documented 2^93 nano-unit bound raises loudly
    // instead of silently saturating the limb split
    val hot = Seq(("g", 1.0, 1.0e19)).toDF("grp", "v", "w")
    val e = intercept[Exception] {
      Profiling.weightedPercentiles(hot, "grp", "v", "w").collect()
    }
    def msgs(t: Throwable): List[String] =
      if (t == null) Nil
      else Option(t.getMessage).toList ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("saturates the 2^93 limb split")),
      s"got: $e")
  }

  test("lDiversityViolations: homogeneous groups flag, diverse groups " +
       "pass regardless of size") {
    val df = Seq(
      ("a", "s1"), ("a", "s1"), ("a", "s1"),     // big but homogeneous
      ("b", "s1"), ("b", "s2"),                  // small but diverse
      ("c", "s1"), ("c", "s1"), ("c", "s2"), ("c", "s3"))
      .toDF("quasi", "sens")
    val out = Profiling.lDiversityViolations(df, Seq("quasi"), "sens", 3L)
      .select("quasi", "n_rows", "n_distinct_sensitive")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out === Map("a" -> ((3L, 1L)), "b" -> ((2L, 2L))),
      "a and b fall under l=3; c is 3-diverse")
  }

  test("equiWidthHistogram: floor-divide buckets, exact ranges, " +
       "negatives land below zero") {
    val df = Seq(-25.0, -1.0, 0.0, 9.9, 10.0, 19.5, 42.0)
      .map(v => Tuple1(v)).toDF("v")
    val out = Profiling.equiWidthHistogram(df, "v", width = 10.0)
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(-3L) === ((-3L, 1L, -25.0, -25.0)),
      "floor semantics: -25/10 buckets to -3, not -2")
    assert(out(-1L) === ((-1L, 1L, -1.0, -1.0)))
    assert(out(0L) === ((0L, 2L, 0.0, 9.9)))
    assert(out(1L) === ((1L, 2L, 10.0, 19.5)), "boundary 10.0 goes up")
    assert(out(4L) === ((4L, 1L, 42.0, 42.0)))
    assert(out.size === 5, "empty buckets are absent")
  }

  test("winsorize: interpolated clip bounds, clip counts, exact means") {
    // g: values 1..20 — p05 = 1.95, p90 = 18.1 (index p*(n-1) rule)
    val df = (1 to 20).map(v => ("g", v.toLong)).toDF("src", "v")
    val Array(r) = Profiling.winsorize(df, "src", "v", pLo = 0.05, pHi = 0.9)
      .as[(String, Long, Long, Long, Double, Double)].collect()
    assert(r === (("g", 20L, 1L, 2L, 10.5, 10.4075)),
      "clip {1} low, {19,20} high; after-sum = 1.95 + Σ(2..18) + 2·18.1")
  }

  test("bootstrapCI: interval brackets the point mean, survivors " +
       "bounded by reps, layout-independent") {
    val df = (0 until 200).map(i => ("g", i.toLong, (i % 50).toDouble))
      .toDF("grp", "id", "v")
    val out = Profiling.bootstrapCI(df, "grp", "id", "v", reps = 48)
      .as[(String, Long, Double, Long, Option[Double], Option[Double])]
      .head()
    assert(out._2 === 200L)
    assert(out._3 === 24.5, "point mean is the exact decimal mean")
    assert(out._4 > 0L && out._4 <= 48L)
    assert(out._5.get < out._3 && out._6.get > out._3,
      "percentile CI must bracket the mean on a symmetric 200-row group")
    assert(out._6.get - out._5.get < 10.0,
      "CI of a 200-row mean is a few standard errors wide, not the range")
    // deterministic under layout: the hash coin draws from ids only
    val again = Profiling.bootstrapCI(df.repartition(7), "grp", "id", "v",
        reps = 48)
      .as[(String, Long, Double, Long, Option[Double], Option[Double])]
      .head()
    assert(again === out)
  }

  test("bootstrapCI: key guard raises on negative and oversized keys; " +
       "parameter requires are loud") {
    val bad = Seq(("g", -1L, 1.0)).toDF("grp", "id", "v")
    val e = intercept[Exception] {
      Profiling.bootstrapCI(bad, "grp", "id", "v").collect()
    }
    assert(e.getMessage.contains("bootstrapCI") ||
      Option(e.getCause).exists(_.getMessage.contains("bootstrapCI")))
    val big = Seq(("g", Long.MaxValue / 4, 1.0)).toDF("grp", "id", "v")
    intercept[Exception] {
      Profiling.bootstrapCI(big, "grp", "id", "v").collect()
    }
    intercept[IllegalArgumentException] {
      Profiling.bootstrapCI(bad, "grp", "id", "v", reps = 4)
    }
    intercept[IllegalArgumentException] {
      Profiling.bootstrapCI(bad, "grp", "id", "v", alpha = 0.0)
    }
  }

  test("fleissKappa: perfect agreement reads 1, near-chance reads ~0, " +
       "single-category reads NULL; sub-2-rating items drop") {
    // perfect: every item unanimous, categories split — P_bar 1, P_e .5
    val perfect = Seq((1L, 1L, 0L), (1L, 2L, 0L), (2L, 1L, 1L),
      (2L, 2L, 1L)).toDF("item", "rater", "cat")
    val p = Profiling.fleissKappa(perfect, "item", "rater", "cat")
      .as[(Long, Long, Double, Double, Option[Double])].head()
    assert(p === ((2L, 4L, 1.0, 0.5, Some(1.0))))
    // mixed: A unanimous, B/C 2-1 splits — P_bar 5/9, P_e ~ 5/9
    val mixed = Seq((1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 1L),
      (2L, 1L, 1L), (2L, 2L, 1L), (2L, 3L, 0L),
      (3L, 1L, 0L), (3L, 2L, 0L), (3L, 3L, 1L))
      .toDF("item", "rater", "cat")
    val m = Profiling.fleissKappa(mixed, "item", "rater", "cat")
      .as[(Long, Long, Double, Double, Option[Double])].head()
    assert(m._1 === 3L && m._2 === 9L)
    assert(m._3 === 0.555555555 && math.abs(m._5.get) < 1e-7,
      "balanced 2-1 splits sit at chance: kappa ~ 0")
    // all one category: P_e = 1 -> undefined, and a 1-rating item drops
    val one = Seq((1L, 1L, 7L), (1L, 2L, 7L), (9L, 1L, 7L))
      .toDF("item", "rater", "cat")
    val o = Profiling.fleissKappa(one, "item", "rater", "cat")
      .as[(Long, Long, Double, Double, Option[Double])].head()
    assert(o === ((1L, 2L, 1.0, 1.0, None)))
  }

  test("benjaminiHochberg: textbook step-up selection, monotone capped " +
       "adjusted p, loud q guard") {
    val tests = Seq(("a", 0.01), ("b", 0.02), ("c", 0.04), ("d", 0.5))
      .toDF("test", "p")
    val out = Profiling.benjaminiHochberg(tests, "test", "p", q = 0.1)
      .as[(String, Double, Long, Double, Boolean)].collect()
      .sortBy(_._3)
    // thresholds i*q/m = .025 .05 .075 .1 -> k*=3
    assert(out.map(_._1).toSeq === Seq("a", "b", "c", "d"))
    assert(out.map(_._5).toSeq === Seq(true, true, true, false))
    // adjusted p: suffix-min of m*p/i (= .04, .04, .0533…, .5)
    assert(out.map(_._4).toSeq ===
      Seq(0.04, 0.04, 0.053333333, 0.5))
    // all-null battery: nothing selected, every adjusted p is 1
    val nul = Profiling.benjaminiHochberg(
      Seq(("x", 1.0), ("y", 0.99)).toDF("test", "p"), "test", "p")
      .as[(String, Double, Long, Double, Boolean)].collect()
    assert(nul.forall(r => !r._5))
    intercept[IllegalArgumentException] {
      Profiling.benjaminiHochberg(tests, "test", "p", q = 0.0)
    }
  }

  test("covarianceExact: a per-row scaled-integer overflow NULLs every " +
       "output instead of silently skipping the row (r18 ADVICE)") {
    // |x| >= 1e14 overflows the DECIMAL(18,4) per-row cast at the
    // default scale=4. Under ANSI mode (the Spark 4 default) the cast
    // itself RAISES — already loud; with ANSI off it NULLs the row and
    // sum() would silently SKIP it while n still counts it — the
    // aggregate must go loud-NULL there instead
    val bad = Seq((2.0e14, 1.0), (1.0, 2.0), (2.0, 3.0)).toDF("x", "y")
    val ex = intercept[Exception] {
      Profiling.covarianceExact(bad, "x", "y").collect()
    }
    assert(ex.toString.contains("NUMERIC_VALUE_OUT_OF_RANGE"),
      s"ANSI mode must raise the decimal overflow, got: $ex")
    val ansi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val row = Profiling.covarianceExact(bad, "x", "y").collect()(0)
      assert(row.getAs[Long]("n") === 3L)
      for (c <- Seq("sum_x", "sum_y", "cov_num", "var_num_x", "var_num_y"))
        assert(row.isNullAt(row.fieldIndex(c)),
          s"$c must be NULL when any row overflowed the scaled-int cast")
      // grouped variant: only the group containing the overflow NULLs
      val grouped = Seq(("a", 2.0e14, 1.0), ("a", 1.0, 2.0),
        ("b", 1.0, 2.0), ("b", 2.0, 3.0)).toDF("g", "x", "y")
      val byG = Profiling.covarianceExactBy(grouped, Seq("g"), "x", "y")
        .collect().map(r => r.getAs[String]("g") -> r).toMap
      assert(byG("a").isNullAt(byG("a").fieldIndex("cov_num")))
      assert(byG("b").getAs[Double]("cov_num") === 1.0)
    } finally spark.conf.set("spark.sql.ansi.enabled", ansi)
    // the same data without the overflowing row stays fully defined
    val good = Seq((1.0, 2.0), (2.0, 3.0)).toDF("x", "y")
    val ok = Profiling.covarianceExact(good, "x", "y").collect()(0)
    assert(ok.getAs[Long]("n") === 2L)
    assert(ok.getAs[Double]("cov_num") === 1.0) // 2*(2+6) - 3*5
    assert(ok.getAs[Double]("var_num_x") === 1.0)
  }

  test("bootstrapCI: single-row group degenerates gracefully — every " +
       "surviving replicate mean is the row's value") {
    val df = Seq(("g", 7L, 3.25)).toDF("grp", "id", "v")
    val out = Profiling.bootstrapCI(df, "grp", "id", "v", reps = 48)
      .as[(String, Long, Double, Long, Option[Double], Option[Double])]
      .head()
    assert(out._2 === 1L && out._3 === 3.25)
    assert(out._4 < 48L, "some Poisson(1) draws are 0 — replicates drop")
    assert(out._5 === Some(3.25) && out._6 === Some(3.25))
  }
}
