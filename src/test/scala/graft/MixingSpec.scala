package graft

import org.apache.spark.sql.functions._

import graft.operators.Mixing

class MixingSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = (0L until 400L).map { i =>
    (i, s"src${i % 4}", 100L + (i % 7) * 50L)
  }.toDF("doc_id", "source", "n_chars")

  test("interleaveSources: equal-size sources alternate strictly; ord " +
       "is a dense total order; small sources exhaust early") {
    import graft.operators.Mixing
    val df = (0L until 30L).map(i => (i, s"s${i % 3}"))
      .toDF("doc_id", "source")
    val ordered = Mixing.interleaveSources(df, "source", "doc_id")
      .orderBy("ord").select("source").as[String].collect()
    // three equal sources: every consecutive window of 3 hits all three
    ordered.grouped(3).foreach(w =>
      assert(w.toSet.size === 3, s"non-alternating window: ${w.toSeq}"))
    // unbalanced: s0 has 1 row, s1 has 4 — the tail is all s1, head mixes
    val ub = Seq((1L, "s0"), (2L, "s1"), (3L, "s1"), (4L, "s1"),
        (5L, "s1")).toDF("doc_id", "source")
    val seq2 = Mixing.interleaveSources(ub, "source", "doc_id")
      .orderBy("ord").select("source").as[String].collect()
    assert(seq2.take(2).toSet === Set("s0", "s1"),
      "both sources appear before either repeats")
    assert(seq2.count(_ == "s0") === 1 && seq2.length === 5)
  }

  test("negativeSample: never emits a seen pair, respects k, and is " +
       "bit-deterministic across runs; rounds rotate buckets") {
    import graft.operators.Mixing
    val inter = Seq(
      (1L, 10L), (1L, 11L), (2L, 10L), (3L, 12L), (3L, 13L))
      .toDF("u", "item")
      .unionByName(Seq.tabulate(20)(i => (4L, 100L + i)).toDF("u", "item"))
    val out = Mixing.negativeSample(inter, "u", "item", k = 3,
        buckets = 2)
      .as[(Long, Long, Int)].collect().toSet
    val seen = inter.as[(Long, Long)].collect().toSet
    assert(out.forall(r => !seen.contains((r._1, r._2))),
      "a sampled negative must be unseen for that user")
    assert(out.groupBy(_._1).values.forall(_.size <= 3))
    // determinism: the same call reproduces the same set
    val again = Mixing.negativeSample(inter, "u", "item", k = 3,
        buckets = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(out === again)
    // a different round may pick a different bucket, still no seen pairs
    val r1 = Mixing.negativeSample(inter, "u", "item", k = 3,
        buckets = 2, round = 1L)
      .as[(Long, Long, Int)].collect().toSet
    assert(r1.forall(r => !seen.contains((r._1, r._2))))
  }

  test("neymanAllocation: budget follows N_h*sigma_h, sums exactly to " +
       "totalN, zero-variance strata get nothing") {
    import graft.operators.Mixing
    // a: 100 rows, sd 0 (constant); b: 100 rows spread 0..99;
    // c: 50 rows spread 0..490 (bigger sigma, fewer rows)
    val rows =
      (0 until 100).map(i => ("a", 5.0)) ++
      (0 until 100).map(i => ("b", i.toDouble)) ++
      (0 until 50).map(i => ("c", i * 10.0))
    val df = rows.toDF("s", "v")
    val out = Mixing.neymanAllocation(df, "s", "v", totalN = 100L)
      .select("stratum", "n_rows", "alloc", "alloc_capped")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("a")._3 === 0L, "constant stratum needs no budget")
    assert(out.values.map(_._3).sum === 100L,
      "largest remainder must hit the budget exactly")
    // b: N*sd = 100*28.86 ≈ 2886; c: 50*144.3 ≈ 7217 → c gets ~71%
    assert(out("c")._3 > out("b")._3,
      s"high-variance stratum earns more despite fewer rows: $out")
    assert(out.values.forall(r => r._4 <= r._2), "cap respects N_h")
  }

  test("systematicSampleByRates keeps exact per-stratum fractions") {
    val out = Mixing.systematicSampleByRates(docs, "source", "doc_id",
      Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.0))
    val counts = out.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(counts.getOrElse("src0", 0L) === 100L, "rate 1.0 keeps all")
    assert(counts.getOrElse("src2", 0L) === 0L, "rate 0 drops all")
    assert(counts.getOrElse("src3", 0L) === 0L, "missing stratum drops all")
    // src1 ids ≡ 1 mod 4; kept iff id%100 < 50: residues {1,5,...,49} are
    // 13 of the 25 per 100-block → 52 of 100
    assert(counts("src1") === 52L)
    // determinism: same output on re-evaluation
    assert(rendered(out) === rendered(Mixing.systematicSampleByRates(
      docs, "source", "doc_id", Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.0))))
  }

  test("systematicSampleByRates rounds rates to percent (no float truncation)") {
    // 0.29 * 100 == 28.999999999999996 — truncation would keep only 28
    // of each 100 ids; rounding keeps exactly 29.
    val ids = (0L until 100L).map(i => (i, "s")).toDF("doc_id", "source")
    val kept = Mixing.systematicSampleByRates(ids, "source", "doc_id",
      Map("s" -> 0.29)).count()
    assert(kept === 29L)
    val kept57 = Mixing.systematicSampleByRates(ids, "source", "doc_id",
      Map("s" -> 0.57)).count()
    assert(kept57 === 57L)
  }

  test("sampleByRates approximates requested rates for a fixed seed") {
    val out = Mixing.sampleByRates(docs, "source",
      Map("src0" -> 1.0, "src1" -> 0.5), seed = 7L)
    val counts = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(counts("src0") === 100L)
    assert(counts("src1") > 25L && counts("src1") < 75L)
  }

  test("deterministicGroupSample: k rows per group, reproducible, no helper col") {
    val out = Mixing.deterministicGroupSample(docs, "source", "doc_id", 7)
    val counts = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(counts.values.toSet === Set(7L), "every stratum contributes exactly k")
    assert(!out.columns.contains("__rk"))
    assert(rendered(out) === rendered(
      Mixing.deterministicGroupSample(docs, "source", "doc_id", 7)))
    // k larger than the group → whole group kept
    val all = Mixing.deterministicGroupSample(docs, "source", "doc_id", 1000)
    assert(all.count() === docs.count())
  }

  test("deterministicGroupSample: null keys never crowd out real rows") {
    val withNulls = Seq(
      (Some(1L), "s"), (Some(2L), "s"), (Some(3L), "s"),
      (None: Option[Long], "s"), (None: Option[Long], "s")
    ).toDF("doc_id", "source")
    val kept = Mixing.deterministicGroupSample(withNulls, "source", "doc_id", 3)
      .select("doc_id").as[Option[Long]].collect()
    assert(kept.forall(_.isDefined), "nulls sort last, real keys win the sample")
    assert(kept.length === 3)
  }

  test("packByBudget: greedy shards respect the running budget") {
    val rows = Seq(
      (1L, "s", 400L), (2L, "s", 400L), (3L, "s", 400L), // cum-before 0,400,800
      (4L, "s", 2000L),                                  // cum-before 1200 → shard 1
      (5L, "s", 100L)                                    // cum-before 3200 → shard 3
    ).toDF("doc_id", "source", "n_chars")
    val out = Mixing.packByBudget(rows, "source", "doc_id", "n_chars", 1000L)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 3L))
  }

  test("temperatureSample up-weights rare strata, keeps the largest at cap") {
    // 400 'big' docs vs 100 'rare': tau=0.5 → rates 100% and
    // round(sqrt(100)/sqrt(400)*100) = 50%
    val skewed = (0L until 500L).map { i =>
      (i, if (i < 400) "big" else "rare")
    }.toDF("doc_id", "source")
    val out = Mixing.temperatureSample(skewed, "source", "doc_id", tau = 0.5)
    val counts = out.groupBy("source").count().as[(String, Long)]
      .collect().toMap
    assert(counts("big") === 400L, "largest stratum keeps cap = 100%")
    // rare ids are 400..499; kept iff id%100 < 50 → exactly 50
    assert(counts("rare") === 50L)
    // deterministic on re-evaluation
    assert(rendered(out) === rendered(
      Mixing.temperatureSample(skewed, "source", "doc_id", tau = 0.5)))
    // balanced strata are untouched at any tau
    val balanced = (0L until 200L).map(i => (i, s"s${i % 2}"))
      .toDF("doc_id", "source")
    assert(Mixing.temperatureSample(balanced, "source", "doc_id").count()
      === 200L)
  }

  test("temperatureSample floors vanishing strata at one percent cell") {
    // 100k 'big' vs 3 'rare': sqrt(3)/sqrt(100000) ≈ 0.55% → rounds to 1%,
    // but 1 'ultra' vs 100k: sqrt(1)/sqrt(100000) ≈ 0.32% → would round to
    // 0% and silently ELIMINATE the stratum temperature mixing exists to
    // up-weight. The floor keeps one percent cell, so ids with id%100 == 0
    // survive.
    val skewed = ((0L until 10000L).map(i => (i, "big")) ++
      Seq((10000L, "ultra"), (10100L, "ultra"), (10250L, "ultra")))
      .toDF("doc_id", "source")
    val counts = Mixing.temperatureSample(skewed, "source", "doc_id",
        tau = 0.5)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    // sqrt(3)/sqrt(10000) = 1.7% → 2%; ids 10000, 10100 (%100 = 0) kept,
    // 10250 (%100 = 50) dropped — but never the whole stratum
    assert(counts.contains("ultra"), "rare stratum must not vanish")
    assert(counts("ultra") === 2L)
    // truly sub-0.5% share: sqrt(1)/sqrt(50000) ≈ 0.45% rounds to 0% —
    // only the floor keeps the stratum alive
    val extreme = ((0L until 50000L).map(i => (i, "big")) ++
      Seq((50000L, "solo"))).toDF("doc_id", "source")
    val kept = Mixing.temperatureSample(extreme, "source", "doc_id",
        tau = 0.5)
      .filter(col("source") === "solo").count()
    assert(kept === 1L, "a stratum whose rate rounds to 0% keeps its 1% " +
      "cell (id 50000 % 100 = 0 is inside the floored cell)")
  }

  test("leakageSafeSplit keeps near-dup clusters in one split") {
    // docs 1 and 9001 are near-identical (identical 3-shingle sets —
    // repeated single token), as are 2 and 9002; the rest are singletons.
    // A raw-id split could separate the twins; the cluster-keyed split
    // must not.
    val docs = (
      Seq((1L, "aa aa aa aa"), (9001L, "aa aa aa aa aa"),
          (2L, "bb bb bb bb"), (9002L, "bb bb bb bb bb")) ++
      (100L until 160L).map(i => (i, s"c$i d$i e$i f$i g$i"))
    ).toDF("doc_id", "text")
    val split = Mixing.leakageSafeSplit(docs, "doc_id", "text",
        Seq("train" -> 50, "val" -> 25, "test" -> 25))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(split.size === 64, "every doc gets a split")
    assert(split(1L) === split(9001L), "near-dup twins stay together")
    assert(split(2L) === split(9002L))
    // cluster key = the cluster's min id → the twins' split equals the
    // ORIGINAL doc's raw-key split, so singleton assignment is unchanged
    val raw = Mixing.deterministicSplit(
        docs.filter(col("doc_id") < 9000), "doc_id",
        Seq("train" -> 50, "val" -> 25, "test" -> 25))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(split(1L) === raw(1L) && split(150L) === raw(150L))
  }

  test("capPerGroup keeps at most k rows per group, top under the order") {
    val out = Mixing.capPerGroup(docs, Seq(col("source")),
      Seq(col("n_chars").desc, col("doc_id")), 5)
    val counts = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(counts.values.toSet === Set(5L))
    // the survivors are the largest docs (ties by doc_id): every kept row's
    // n_chars is >= every dropped row's n_chars within its source
    val kept = out.select("source", "n_chars").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val dropped = docs.join(out.select("doc_id"), Seq("doc_id"), "left_anti")
      .select("source", "n_chars").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    dropped.foreach { case (src, mx) => assert(kept(src) >= mx) }
    assert(!out.columns.contains("__rn"))
    // k beyond group size keeps everything
    assert(Mixing.capPerGroup(docs, Seq(col("source")),
      Seq(col("doc_id")), 1000).count() === docs.count())
  }

  test("upsampleByRates: expected multiplicities, determinism, 0-copy drop") {
    val df = (0L until 200L).map(i => (i, if (i < 100) "a" else "b"))
      .toDF("key", "src")
    val rates = Map("a" -> 2.3, "b" -> 0.4)
    val out = Mixing.upsampleByRates(df, "src", "key", rates)
    val byKey = out.groupBy("key", "src").count().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // every 'a' key appears 2 or 3 times, every surviving 'b' exactly once
    assert(byKey.filter(_._2 == "a").forall(r => r._3 == 2L || r._3 == 3L))
    assert(byKey.filter(_._2 == "b").forall(_._3 == 1L))
    // copy_id is dense 0..copies-1 per key
    val ids = out.filter(col("key") === byKey.filter(_._2 == "a").head._1)
      .select("copy_id").as[Long].collect().sorted
    assert(ids === (0L until ids.length).toArray)
    // layout independence: repartitioned input yields the identical bag
    val out2 = Mixing.upsampleByRates(df.repartition(7), "src", "key", rates)
    assert(rendered(out.orderBy("key", "copy_id")) ===
      rendered(out2.orderBy("key", "copy_id")))
    // a stratum missing from rates is dropped; rate 0 emits nothing
    assert(Mixing.upsampleByRates(df, "src", "key", Map("a" -> 0.0))
      .count() === 0)
  }

  test("deterministicSplit: labels partition the corpus, reproducibly") {
    val out = Mixing.deterministicSplit(docs, "doc_id",
      Seq("train" -> 90, "val" -> 5, "test" -> 5))
    assert(out.count() === docs.count(), "split adds a column, drops nothing")
    val bySplit = out.groupBy("split").count().as[(String, Long)]
      .collect().toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bySplit("train") > bySplit.getOrElse("val", 0L))
    // deterministic: identical assignment on re-evaluation
    assert(rendered(out) === rendered(Mixing.deterministicSplit(docs,
      "doc_id", Seq("train" -> 90, "val" -> 5, "test" -> 5))))
    // the same key always gets the same label regardless of the rest of
    // the corpus (membership is a pure function of the key)
    val sub = Mixing.deterministicSplit(docs.filter(col("doc_id") < 50),
      "doc_id", Seq("train" -> 90, "val" -> 5, "test" -> 5))
    val full = out.filter(col("doc_id") < 50)
    assert(rendered(sub) === rendered(full))
    // weights must sum to 100
    intercept[IllegalArgumentException] {
      Mixing.deterministicSplit(docs, "doc_id", Seq("train" -> 50))
    }
  }

  test("packSequences: ordered concat per shard, weights and counts add up") {
    val rows = Seq(
      (1L, "s", 400L, "one"), (2L, "s", 400L, "two"),
      (3L, "s", 400L, "three"), (4L, "s", 100L, "four")
    ).toDF("doc_id", "source", "n_chars", "text")
    val out = Mixing.packSequences(rows, "source", "doc_id", "n_chars",
        "text", budget = 1000L, sep = " | ")
      .orderBy("shard")
      .as[(String, Long, String, Long, Long)].collect().toSeq
    // cum-before 0,400,800,1200 → shards 0,0,0,1
    assert(out === Seq(
      ("s", 0L, "one | two | three", 1200L, 3L),
      ("s", 1L, "four", 100L, 1L)))
  }

  test("weightedGroupSample: heavy rows win, null/zero weights go last, layout-free") {
    import org.apache.spark.sql.functions.col
    // group g1: one row carries 10^9 weight vs unit weights — its
    // priority hash/1e9 <= 4.3 beats every unit row's hash (these keys'
    // hashes are all > 5), so it MUST be the k=1 pick
    val df = Seq(
      ("g1", 1L, 1L), ("g1", 2L, 1L), ("g1", 3L, 1000000000L),
      ("g1", 4L, 1L), ("g2", 10L, 0L), ("g2", 11L, 5L),
      ("g2", 12L, -3L), ("g3", 20L, 7L)
    ).toDF("g", "k", "w")
    val top1 = Mixing.weightedGroupSample(df, "g", "k", "w", 1)
      .select("g", "k").as[(String, Long)].collect().toMap
    assert(top1("g1") === 3L, "the 10^9-weight row must out-rank unit rows")
    assert(top1("g2") === 11L, "zero/negative weights must lose to a positive one")
    assert(top1("g3") === 20L)
    // zero/negative-weight rows still fill up k when positives run out
    val k3 = Mixing.weightedGroupSample(df, "g", "k", "w", 3)
      .filter(col("g") === "g2").count()
    assert(k3 === 3L)
    // layout independence
    val a = Mixing.weightedGroupSample(df, "g", "k", "w", 2)
      .select("g", "k").as[(String, Long)].collect().toSet
    val b = Mixing.weightedGroupSample(df.repartition(13), "g", "k", "w", 2)
      .select("g", "k").as[(String, Long)].collect().toSet
    assert(a === b)
  }

  test("packByBudget: every shard except the last is filled past nothing-fits") {
    val out = Mixing.packByBudget(docs, "source", "doc_id", "n_chars", 1000L)
    // shards are contiguous, starting at 0, per source
    val bySource = out.select("source", "shard").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted.toSeq)
    bySource.foreach { case (_, shards) =>
      assert(shards === (0L until shards.length).toSeq)
    }
  }

  test("stratifiedExactSplit: per-stratum counts exact to boundary rounding") {
    // strata of size 20, 7 and 1 — hash splits would wander; exact split
    // must give floor-boundary counts per stratum
    val docs = ((1L to 20L).map(i => (i, "big")) ++
      (21L to 27L).map(i => (i, "mid")) ++ Seq((28L, "one")))
      .toDF("doc_id", "src")
    val out = Mixing.stratifiedExactSplit(docs, "src", "doc_id",
        Seq("train" -> 90, "val" -> 5, "test" -> 5))
      .select("src", "split").as[(String, String)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    // big (20): train floor(18.0)=18, val floor(19.0)-18=1, test 1
    assert(out(("big", "train")) === 18 &&
      out(("big", "val")) === 1 && out(("big", "test")) === 1)
    // mid (7): train floor(6.3)=6, val floor(6.65)-6=0, test 1
    assert(out(("mid", "train")) === 6 && out(("mid", "test")) === 1 &&
      !out.contains(("mid", "val")))
    // one (1): train floor(0.9)=0, val 0 → test
    assert(out(("one", "test")) === 1)
    // deterministic under re-evaluation and layout changes
    val again = Mixing.stratifiedExactSplit(docs.repartition(7), "src",
        "doc_id", Seq("train" -> 90, "val" -> 5, "test" -> 5))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val first = Mixing.stratifiedExactSplit(docs, "src", "doc_id",
        Seq("train" -> 90, "val" -> 5, "test" -> 5))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(again === first)
  }

  test("kFoldSplit: folds partition the data, stable across layouts") {
    val df = (1L to 200L).toDF("doc_id")
    val folds = Mixing.kFoldSplit(df, "doc_id", k = 4)
      .as[(Long, Long)].collect().toMap
    assert(folds.size === 200, "every row gets exactly one fold")
    assert(folds.values.toSet === Set(0L, 1L, 2L, 3L))
    val again = Mixing.kFoldSplit(df.repartition(7), "doc_id", k = 4)
      .as[(Long, Long)].collect().toMap
    assert(again === folds, "fold of a key is independent of layout")
  }

  test("packWithBoundaries: ids/lens in order, exclusive cumulative starts") {
    val df = Seq(
      (1L, "g", 5L, "aaaaa"), (2L, "g", 4L, "bbbb"), (3L, "g", 8L, "cccccccc")
    ).toDF("doc_id", "source", "n_chars", "text")
    val out = Mixing.packWithBoundaries(df, "source", "doc_id", "n_chars",
        "text", budget = 8L)
      .orderBy("shard")
      .as[(String, Long, String, Seq[Long], Seq[Long], Seq[Long])].collect()
    // cum-before 0,5,9 div 8 → docs 1,2 in shard 0; doc 3 in shard 1
    assert(out.length === 2)
    val (_, s0, seq0, ids0, lens0, starts0) = out(0)
    assert((s0, seq0) === ((0L, "aaaaa <eos> bbbb")))
    assert(ids0 === Seq(1L, 2L) && lens0 === Seq(5L, 4L))
    assert(starts0 === Seq(0L, 5L), "exclusive prefix sums of lens")
    val (_, s1, _, ids1, _, starts1) = out(1)
    assert((s1, ids1, starts1) === ((1L, Seq(3L), Seq(0L))))
  }

  test("packContiguous: exact fixed-length cuts, docs span example " +
      "boundaries, zero-weight docs drop") {
    val df = Seq(
      (1L, "g", 3L), (2L, "g", 5L), (3L, "g", 2L), (4L, "g", 0L)
    ).toDF("doc_id", "source", "n_chars")
    val out = Mixing.packContiguous(df, "source", "doc_id", "n_chars",
        budget = 4L)
      .orderBy("example", "doc_id", "tok_start")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // stream: d1[0,3) d2[3,8) d3[8,10); cuts at 4 and 8 → d2 spans
    // examples 0 and 1; the final example is the partial tail
    assert(out === Seq(
      ("g", 0L, 1L, 0L, 3L),   // d1 whole, into e0
      ("g", 0L, 2L, 0L, 1L),   // d2's first token finishes e0
      ("g", 1L, 2L, 1L, 5L),   // d2's remaining 4 fill e1 exactly
      ("g", 2L, 3L, 0L, 2L)),  // d3 opens the partial tail e2
      "d4 (weight 0) contributes no span")
    // every example except the tail holds exactly `budget` tokens
    val perExample = out.groupBy(_._2).view
      .mapValues(_.map(s => s._5 - s._4).sum).toMap
    assert(perExample === Map(0L -> 4L, 1L -> 4L, 2L -> 2L))
    // the distributed two-level prefix sum must not depend on the
    // bucket width: offsets crossing bucket boundaries are identical
    // to the single-stream math above
    val bucketed = Mixing.packContiguous(df, "source", "doc_id",
        "n_chars", budget = 4L, orderBucketWidth = 2L)
      .orderBy("example", "doc_id", "tok_start")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(bucketed === out, "bucket width is an execution detail")
  }

  test("materializeExamples: spans slice and concatenate to exactly-full " +
      "examples in doc order") {
    val enc = Seq(
      (1L, "10,11,12"),        // 3 ids
      (2L, "20,21,22,23,24"),  // 5 ids — spans the e0/e1 cut
      (3L, "30,31")            // 2 ids — the partial tail
    ).toDF("doc_id", "token_ids")
    val weights = Seq((1L, "g", 3L), (2L, "g", 5L), (3L, "g", 2L))
      .toDF("doc_id", "source", "n_ids")
    val spans = Mixing.packContiguous(weights, "source", "doc_id",
      "n_ids", budget = 4L)
    val out = Mixing.materializeExamples(spans, enc, "doc_id", "source")
      .orderBy("example")
      .as[(String, Long, Long, String)].collect().toSeq
    assert(out === Seq(
      ("g", 0L, 4L, "10,11,12,20"),
      ("g", 1L, 4L, "21,22,23,24"),
      ("g", 2L, 2L, "30,31")),
      "every cut example is exactly full; content follows the stream")
  }

  test("epochShuffle: a permutation, layout-independent, seeds decorrelate") {
    val df = (0L until 64L).toDF("id")
    val e1 = Mixing.epochShuffle(df, "id", seed = 1L)
      .orderBy("epoch_rank").as[(Long, Long)].collect().toSeq
    assert(e1.map(_._2) === (0L until 64L), "ranks are a dense permutation")
    assert(e1.map(_._1).sorted === (0L until 64L), "every key appears once")
    val again = Mixing.epochShuffle(df.repartition(7), "id", seed = 1L)
      .orderBy("epoch_rank").as[(Long, Long)].collect().toSeq
    assert(again === e1, "order must not depend on layout")
    val e2 = Mixing.epochShuffle(df, "id", seed = 2L)
      .orderBy("epoch_rank").as[(Long, Long)].collect().toSeq
    assert(e2.map(_._1) !== e1.map(_._1), "different seeds reorder")
  }

  test("allocateBudget: waterfall cascades caps across rounds, integer-exact") {
    val corpus = Seq(("A", 10L), ("B", 20L), ("C", 1000L), ("D", 7L))
      .toDF("source", "n_chars")
    // round 1: A's ideal 120·98/100 = 117 ≥ 10 → capped; round 2: B's
    // ideal 110/2 = 55 ≥ 20 → capped; round 3: C takes the rest (90)
    val out = Mixing.allocateBudget(corpus,
        Map("A" -> 98L, "B" -> 1L, "C" -> 1L), budget = 120L)
      .as[(String, Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("A") === (("A", 10L, 10L, 10L, 1.0, true)))
    assert(out("B") === (("B", 20L, 20L, 20L, 1.0, true)))
    assert(out("C") === (("C", 1000L, 1000L, 90L, 0.09, false)))
    assert(out("D") === (("D", 7L, 7L, 0L, 0.0, false)),
      "unweighted source is reported with zero allocation")
  }

  test("allocateBudget: maxEpochs scales caps; no-cap case is proportional") {
    val corpus = Seq(("A", 10L), ("B", 30L)).toDF("source", "n_chars")
    val up = Mixing.allocateBudget(corpus, Map("A" -> 1L), budget = 100L,
        maxEpochs = 1.5)
      .as[(String, Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(up("A")._3 === 15L && up("A")._4 === 15L && up("A")._6,
      "cap = floor(avail · maxEpochs); epoch budget caps the allocation")
    val prop = Mixing.allocateBudget(corpus,
        Map("A" -> 1L, "B" -> 3L), budget = 20L)
      .as[(String, Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(prop === Map("A" -> 5L, "B" -> 15L),
      "uncapped budget splits by integer weight shares")
  }

  test("prefix-sum small-input cutoff: forced two-level construction is " +
       "bit-identical to the single-window plan") {
    // ties in weight and order-adjacent rows across bucket boundaries
    // (width 4096 with ids straddling 4096) exercise the monotonicity
    // contract on both sides
    val df = Seq(
      ("a", 1L, 3L), ("a", 2L, 3L), ("a", 4095L, 1L), ("a", 4096L, 2L),
      ("a", 4097L, 5L), ("b", 1L, 7L), ("b", 8191L, 7L), ("b", 8192L, 1L),
      ("c", 10L, 4L)
    ).toDF("g", "id", "w")
    def all(): Seq[Seq[Seq[String]]] = Seq(
      rendered(Mixing.packContiguous(df, "g", "id", "w", budget = 4L)),
      rendered(Mixing.packByBudget(df, "g", "id", "w", budget = 6L)),
      rendered(Mixing.stratifiedExactSplit(df, "g", "id",
        Seq("train" -> 80, "test" -> 20))),
      rendered(Mixing.epochShuffle(df, "id", seed = 3L)))
    val single = all()
    sys.props("graft.mixing.singleWindowMaxBytes") = "0"
    val forced =
      try all()
      finally sys.props.remove("graft.mixing.singleWindowMaxBytes")
    assert(single === forced,
      "both prefix-sum constructions must agree row-for-row")
  }

  test("lengthBuckets: interpolated quartile boundaries, <=-goes-lower, " +
       "exact pad fractions") {
    // token lengths 1..8; interior quartiles of [1..8] are 2.75/4.5/6.25
    val docs = (1 to 8).map(n => (n.toLong, Seq.fill(n)("t").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Mixing.lengthBuckets(docs, nBuckets = 4)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 2L, 1L, 2L, 0.25)),
      "bucket 1 = lens {1,2}: waste (2*2-3)/4")
    assert(out(2L) === ((2L, 2L, 3L, 4L, 0.125)))
    assert(out(3L) === ((3L, 2L, 5L, 6L, 0.083333333)),
      "integer arithmetic until one rounded division")
    assert(out(4L) === ((4L, 2L, 7L, 8L, 0.0625)))
  }

  test("weightedPrioritySample: matches the A-Res reference ranking, " +
       "drops non-positive weights, layout-independent") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def u(id: Long): Double =
      java.lang.Long.parseLong(md5hex(id.toString).take(13), 16) /
        4503599627370496.0
    val rows = (0L until 40L).map(i =>
      (s"s${i % 2}", i, if (i % 10 == 9) 0L else (i % 7) * 100L + 50L))
    val df = rows.toDF("src", "id", "w")
    val got = Mixing.weightedPrioritySample(df, "src", "id", "w", k = 4)
      .as[(String, Long, Long, Long)].collect()
    // reference: top-4 per stratum by round(ln(u)/w, 9) desc, id asc
    val want = rows.filter(_._3 > 0).groupBy(_._1).flatMap {
      case (g, rs) =>
        rs.sortBy { case (_, id, w) =>
          (-BigDecimal(math.log(u(id)) / w)
            .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble, id)
        }.take(4).zipWithIndex.map { case ((_, id, w), r) =>
          (g, id, w, r + 1L) }
    }.toSet
    assert(got.toSet === want, "engine sample = reference A-Res ranking")
    assert(got.count(_._1 == "s0") === 4 && got.count(_._1 == "s1") === 4)
    // zero-weight rows (i % 10 == 9) never appear
    assert(got.forall(_._3 > 0))
    // layout independence
    val re = Mixing.weightedPrioritySample(df.repartition(7), "src",
      "id", "w", k = 4).as[(String, Long, Long, Long)].collect().toSet
    assert(re === got.toSet)
    // the rank cut fuses into the window sort
    val p = Mixing.weightedPrioritySample(df, "src", "id", "w", k = 4)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"))
  }

  test("hashSample: MD5-rank selection is exact, per-group sized, and " +
       "stable under corpus growth") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val df = (0L until 30L).map(i => (s"s${i % 2}", i)).toDF("src", "id")
    val out = Mixing.hashSample(df, "src", "id", k = 5)
      .as[(String, Long, Long)].collect()
    assert(out.count(_._1 == "s0") === 5 && out.count(_._1 == "s1") === 5)
    // the sample IS the first k of the group's md5 sort — recompute it
    val want = (0L until 30L).groupBy(i => s"s${i % 2}").flatMap {
      case (g, ids) =>
        ids.sortBy(i => (md5hex(i.toString), i)).take(5)
          .zipWithIndex.map { case (i, r) => (g, i, r + 1L) }
    }.toSet
    assert(out.toSet === want, "engine sample = reference md5 ranking")
    // growth stability: adding rows only displaces losers — every kept
    // id either stays (with rank <= old rank) or was out-hashed
    val grown = (0L until 60L).map(i => (s"s${i % 2}", i)).toDF("src", "id")
    val kept = Mixing.hashSample(grown, "src", "id", k = 5)
      .as[(String, Long, Long)].collect().map(t => (t._1, t._2)).toSet
    val oldByG = out.groupBy(_._1).view
      .mapValues(_.map(t => md5hex(t._2.toString)).max).toMap
    assert(kept.forall { case (g, i) =>
      md5hex(i.toString) <= oldByG(g) ||
        !out.exists(t => t._1 == g && t._2 == i) },
      "new winners can only enter by hashing below the old cutoff")
    // a group smaller than k returns whole
    val tiny = Seq(("t", 1L), ("t", 2L)).toDF("src", "id")
    assert(Mixing.hashSample(tiny, "src", "id", k = 5).count() === 2)
    // top-k rank filter must fuse into the sort (WindowGroupLimit)
    val plan = Mixing.hashSample(df, "src", "id", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=k must push into the window sort:\n$plan")
  }
}
