package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Property-based invariants (SURVEY.md §5.3) — scalacheck driven
  * directly (no scalatest bridge in the offline dependency set). Spark
  * jobs per sample are not free: generators are small and sample counts
  * modest. */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def check(prop: Prop, samples: Int = 15): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(samples), prop)
    assert(res.passed, res.status.toString)
  }

  private val rowsGen: Gen[List[(Int, Int, Int)]] =
    Gen.listOfN(40, for {
      k <- Gen.choose(0, 5); v <- Gen.choose(0, 9); x <- Gen.choose(0, 99)
    } yield (k, v, x))

  test("property: sampling operators are layout-independent") {
    // the reproducibility contract: repartitioning the input must not
    // change which rows a deterministic sampler keeps
    check(Prop.forAll(rowsGen, Gen.choose(1, 9)) { (rows, parts) =>
      rows.isEmpty || {
        val df = rows.toDF("k", "v", "x")
          .select(col("x").cast("long").as("key"),
                  concat(lit("s"), col("k")).as("src"))
          .dropDuplicates("key")
        val rates = Map("s0" -> 0.5, "s1" -> 0.29, "s2" -> 1.0)
        val a = operators.Mixing.systematicSampleByRates(df, "src", "key", rates)
        val b = operators.Mixing.systematicSampleByRates(
          df.repartition(parts), "src", "key", rates)
        rendered(a.orderBy("key")) == rendered(b.orderBy("key")) && {
          val ga = operators.Mixing.deterministicGroupSample(df, "src", "key", 3)
          val gb = operators.Mixing.deterministicGroupSample(
            df.repartition(parts), "src", "key", 3)
          rendered(ga.orderBy("key")) == rendered(gb.orderBy("key"))
        }
      }
    }, samples = 8)
  }

  test("property: decontaminate output never contains an eval n-gram") {
    val docGen: Gen[List[(Long, String)]] = Gen.listOfN(12, for {
      id <- Gen.choose(0L, 999L)
      words <- Gen.listOfN(6, Gen.oneOf("a", "b", "c", "d"))
    } yield (id, words.mkString(" ")))
    check(Prop.forAll(docGen, docGen) { (trainRows, evalRows) =>
      trainRows.isEmpty || evalRows.isEmpty || {
        val train = trainRows.toDF("doc_id", "text").dropDuplicates("doc_id")
        val eval = evalRows.toDF("doc_id", "text")
        val kept = operators.Ngrams.decontaminate(train, eval, n = 3)
        val evalGrams = eval
          .select(explode(operators.Ngrams.ngramArray(col("text"), 3)).as("g"))
          .distinct()
        val keptGrams = kept
          .select(explode(operators.Ngrams.ngramArray(col("text"), 3)).as("g"))
        // soundness: no kept doc shares a trigram with eval
        keptGrams.join(evalGrams, "g").count() == 0L
      }
    }, samples = 8)
  }

  test("property: dedupKeepFirst is idempotent and emits one row per key") {
    check(Prop.forAll(rowsGen) { rows =>
      rows.isEmpty || {
        val df = rows.toDF("k", "v", "x")
        val once = Dedup.dedupKeepFirst(df, Seq(col("k")),
          Seq(col("v"), col("x")))
        val twice = Dedup.dedupKeepFirst(once, Seq(col("k")),
          Seq(col("v"), col("x")))
        val keys = rows.map(_._1).distinct.size
        once.count() == keys && rendered(once) == rendered(twice)
      }
    }, samples = 10)
  }

  test("property: epoch-millis timestamp round-trip is lossless") {
    val msGen = Gen.listOfN(50, Gen.choose(0L, 4102444800000L)) // ≤ 2100
    check(Prop.forAll(msGen) { ms =>
      ms.isEmpty || {
        val back = ms.toDF("ms")
          .select(unix_millis(timestamp_millis(col("ms"))).as("back"))
          .as[Long].collect().toList
        back == ms
      }
    }, samples = 10)
  }

  test("property: simhash native == HOF on arbitrary token sets") {
    val toksGen = Gen.listOfN(30,
      Gen.listOfN(8, Gen.oneOf("a", "bb", "ccc", "döc", "e f", "", "словo")))
    check(Prop.forAll(toksGen) { docs =>
      docs.isEmpty || {
        val df = docs.map(_.mkString(" ")).toDF("text")
        df.select(
            (Dedup.simhash(split(col("text"), " ")) ===
             Dedup.simhashHof(split(col("text"), " "))).as("eq"))
          .as[Boolean].collect().forall(identity)
      }
    }, samples = 10)
  }

  test("property: asofJoin matches a reference merge on random event sets") {
    import java.sql.Timestamp
    val gen = for {
      left <- Gen.listOfN(25, for {
        k <- Gen.choose(0, 3); t <- Gen.choose(0L, 1000L)
      } yield (k, t))
      right <- Gen.listOfN(15, for {
        k <- Gen.choose(0, 3); t <- Gen.choose(0L, 1000L); v <- Gen.choose(0, 99)
      } yield (k, t, v))
    } yield (left, right)
    check(Prop.forAll(gen) { case (left0, right0) =>
      // unique (k, ts) on both sides keeps the expected value well-defined
      val left = left0.distinctBy(e => (e._1, e._2)).zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, new Timestamp(t)) }
      val right = right0.distinctBy(e => (e._1, e._2))
        .map { case (k, t, v) => (k, new Timestamp(t), v.toDouble) }
      left.isEmpty || right.isEmpty || {
        val l = left.toDF("id", "k", "ts")
        val r = right.toDF("k", "rts", "v")
        val got = graft.operators.Joins.asofJoin(l, r, "k", "ts", "rts",
            Seq("v"))
          .select("id", "asof_v").collect()
          .map(x => x.getLong(0) ->
            (if (x.isNullAt(1)) None else Some(x.getDouble(1)))).toMap
        val expect = left.map { case (id, k, ts) =>
          val c = right.filter(e => e._1 == k && !e._2.after(ts))
          id -> (if (c.isEmpty) None
                 else Some(c.maxBy(_._2.getTime)._3))
        }.toMap
        got == expect
      }
    }, samples = 10)
  }

  test("property: rangeJoin equals the brute-force inequality join") {
    val gen = for {
      pts <- Gen.listOfN(30, Gen.choose(-50.0, 150.0))
      ivs <- Gen.listOfN(8, for {
        lo <- Gen.choose(-40.0, 120.0); len <- Gen.choose(0.0, 60.0)
      } yield (lo, lo + len))
    } yield (pts, ivs)
    check(Prop.forAll(gen) { case (pts, ivs) =>
      pts.isEmpty || ivs.isEmpty || {
        val p = pts.zipWithIndex.map { case (x, i) => (i.toLong, x) }
          .toDF("pid", "x")
        val iv = ivs.zipWithIndex.map { case ((lo, hi), i) =>
          (i.toLong, lo, hi) }.toDF("iid", "lo", "hi")
        val got = graft.operators.Joins.rangeJoin(p, "x", iv, "lo", "hi", 10.0)
          .select("pid", "iid").as[(Long, Long)].collect().toSet
        val expect = (for {
          (i, x) <- pts.zipWithIndex.map { case (x, i) => (i.toLong, x) }
          (j, lo, hi) <- ivs.zipWithIndex.map { case ((lo, hi), i) =>
            (i.toLong, lo, hi) }
          if x >= lo && x < hi
        } yield (i, j)).toSet
        got == expect
      }
    }, samples = 10)
  }

  test("property: fuzzyJoin equals brute-force levenshtein on random strings") {
    val word: Gen[String] = for {
      len <- Gen.choose(1, 6)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val gen = for {
      ls <- Gen.listOfN(12, word); rs <- Gen.listOfN(12, word)
    } yield (ls, rs)
    check(Prop.forAll(gen) { case (ls, rs) =>
      val l = ls.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("id", "s")
      val r = rs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("id", "s")
      val got = graft.operators.Joins.fuzzyJoin(l, r, "id", "s", "id", "s")
        .select("left_id", "right_id").as[(Long, Long)].collect().toSet
      val expect = (for {
        (a, i) <- ls.zipWithIndex; (b, j) <- rs.zipWithIndex
        if levenshteinRef(a, b) <= 1
      } yield (i.toLong, j.toLong)).toSet
      got == expect
    }, samples = 8)
  }

  /** Textbook DP edit distance, the independent reference. */
  private def levenshteinRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("property: dedupChunksGlobal is idempotent and conserves chunks") {
    val docGen: Gen[List[(Long, String)]] = Gen.listOfN(10, for {
      id <- Gen.choose(0L, 999L)
      toks <- Gen.listOfN(12, Gen.oneOf("aa", "bb", "cc", "dd"))
    } yield (id, toks.mkString(" ")))
    check(Prop.forAll(docGen) { docs0 =>
      val docs = docs0.distinctBy(_._1)
      docs.isEmpty || {
        val df = docs.toDF("doc_id", "text")
        val once = Dedup.dedupChunksGlobal(df, "doc_id", "text", 3)
        val twice = Dedup.dedupChunksGlobal(once, "doc_id", "text", 3)
        // idempotent: a deduped corpus has no repeated chunks left
        rendered(once) == rendered(twice) && {
          // global conservation: every distinct chunk survives exactly once
          def chunks(d: org.apache.spark.sql.DataFrame) = d
            .select(explode(transform(
              sequence(lit(0),
                ceil(size(split(col("text"), " ")).cast("double") / 3)
                  .cast("int") - 1),
              i => concat_ws(" ",
                slice(split(col("text"), " "), i * 3 + 1, lit(3))))))
            .as[String].collect()
          val inChunks = chunks(df).toSet
          val outChunks = chunks(once)
          outChunks.distinct.length == outChunks.length &&
            outChunks.toSet.subsetOf(inChunks)
        }
      }
    }, samples = 6)
  }

  test("property: deterministicSplit is a partition function of the key") {
    val gen: Gen[List[Long]] = Gen.listOfN(30, Gen.choose(0L, 100000L))
    check(Prop.forAll(gen, Gen.choose(1, 9)) { (keys, parts) =>
      keys.isEmpty || {
        val df = keys.distinct.toDF("doc_id")
        val w = Seq("train" -> 80, "val" -> 10, "test" -> 10)
        val a = operators.Mixing.deterministicSplit(df, "doc_id", w)
        val b = operators.Mixing.deterministicSplit(
          df.repartition(parts), "doc_id", w)
        // every row labeled with a declared label; layout-independent
        rendered(a.orderBy("doc_id")) == rendered(b.orderBy("doc_id")) &&
          a.select("split").as[String].collect()
            .forall(Set("train", "val", "test"))
      }
    }, samples = 8)
  }

  test("property: chained jaccard is within [0,1]; identical docs give 1") {
    val docGen = Gen.listOfN(6, Gen.listOfN(10,
      Gen.oneOf("x", "y", "z", "w")).map(_.mkString(" ")))
    check(Prop.forAll(docGen) { texts =>
      texts.isEmpty || {
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val js = Dedup.chainedJaccard(df, "doc_id", "text", shingleN = 2)
          .select("jaccard").as[Double].collect()
        js.forall(j => j >= 0.0 && j <= 1.0)
      }
    }, samples = 10)
  }

  test("property: Misra-Gries superset + error bound under arbitrary merge trees") {
    // pure-JVM: exercises reduce/merge directly with random partition
    // layouts — the adversarial merge orders Spark's partial+final
    // aggregation can produce
    val streamGen: Gen[List[String]] = Gen.listOfN(120, Gen.frequency(
      (5, Gen.const("hot")), (3, Gen.const("warm")),
      (2, Gen.choose(0, 30).map(i => s"cold$i"))))
    check(Prop.forAll(streamGen, Gen.choose(1, 8), Gen.choose(2, 6)) {
      (stream, parts, k) =>
        stream.isEmpty || {
          val agg = new graft.functions.MisraGriesAggregator(k)
          val partials = stream
            .grouped(math.max(1, stream.size / parts)).toList
            .map(p => p.foldLeft(agg.zero)(agg.reduce))
          val out = agg.finish(partials.reduceLeft(agg.merge))
          val exact = stream.groupBy(identity)
            .map { case (key, v) => key -> v.size.toLong }
          val thresh = stream.size.toDouble / (k + 1)
          out.size <= k &&
          exact.forall { case (key, c) => c <= thresh || out.contains(key) } &&
          out.forall { case (key, w) =>
            w <= exact(key) && w >= exact(key) - thresh }
        }
    }, samples = 60)
  }

  test("property: winnowing guarantee holds on arbitrary token streams") {
    // the paper's contract: every window of w consecutive k-grams
    // contributes a selected fingerprint, selections are real k-gram
    // positions, and the sketch is layout-independent
    val docsGen: Gen[List[(Long, String)]] = Gen.listOfN(6, for {
      id <- Gen.choose(0, 1000); n <- Gen.choose(0, 14)
      toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d"))
    } yield (id.toLong, toks.mkString(" ")))
    check(Prop.forAll(docsGen, Gen.choose(1, 8)) { (docs0, parts) =>
      val docs = docs0.distinctBy(_._1)
      docs.isEmpty || {
        val df = docs.toDF("doc_id", "text")
        val sel = operators.Ngrams.winnow(df, k = 2, w = 3)
          .as[(Long, Long, Long)].collect()
          .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
        val ok = docs.forall { case (id, text) =>
          val n = text.split(" ").count(_.nonEmpty)
          val grams = math.max(0, n - 1) // k=2 grams for n>=2 tokens
          val pos = sel.getOrElse(id, Set.empty)
          if (n < 2 || grams < 3) pos.isEmpty
          else (0 to grams - 3).forall(s =>
            (s until s + 3).exists(j => pos(j.toLong))) &&
            pos.forall(p => p >= 0 && p < grams)
        }
        val b = operators.Ngrams.winnow(df.repartition(parts), k = 2, w = 3)
          .as[(Long, Long, Long)].collect()
          .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
        ok && sel == b
      }
    }, samples = 8)
  }

  test("property: quantile-boundary operators partition and bound") {
    val rowsGen2: Gen[List[(Int, Int)]] = Gen.listOfN(30, for {
      g <- Gen.choose(0, 2); v <- Gen.choose(0, 50)
    } yield (g, v))
    check(Prop.forAll(rowsGen2) { rows =>
      rows.isEmpty || {
        val docs = rows.zipWithIndex
          .map { case ((g, v), i) =>
            (i.toLong, Seq.fill(v % 9 + 1)("t").mkString(" ")) }
          .toDF("doc_id", "text")
        val lb = operators.Mixing.lengthBuckets(docs, nBuckets = 3)
          .as[(Long, Long, Long, Long, Double)].collect()
        val df2 = rows.map { case (g, v) => (s"g$g", v.toLong) }
          .toDF("src", "v")
        val ws = operators.Profiling
          .winsorize(df2, "src", "v", pLo = 0.1, pHi = 0.9)
          .as[(String, Long, Long, Long, Double, Double)].collect()
        val perSrc = rows.groupBy(r => s"g${r._1}")
        lb.map(_._2).sum == rows.size &&              // buckets partition
        lb.forall(b => b._3 <= b._4 && b._5 >= 0.0 && b._5 < 1.0) &&
        ws.forall { case (src, n, lo, hi, _, _) =>
          val m = perSrc(src).size
          n == m && lo <= m * 0.1 + 1 && hi <= m * 0.1 + 1
        }
      }
    }, samples = 8)
  }

  test("property: gini bounds and mean-preservation, kappa range, CMS " +
       "bound on arbitrary multisets") {
    check(Prop.forAll(rowsGen, Gen.choose(1, 8)) { (rows, parts) =>
      rows.isEmpty || {
        val df = rows.map { case (g, _, x) => (s"g$g", x.toLong) }
          .toDF("src", "v").repartition(parts)
        val gi = operators.Profiling.gini(df, "src", "v")
          .as[(String, Long, Long, Double)].collect()
        val byG = rows.groupBy(r => s"g${r._1}")
        val giniOk = gi.forall { case (g, n, s, v) =>
          val xs = byG(g).map(_._3.toLong).filter(_ >= 0)
          n == xs.size && s == xs.sum &&
          v >= 0.0 && v < 1.0 &&
          // closed form: G = Σ|xi-xj| / (2 n Σx)  (cross-check)
          math.abs(v - xs.flatMap(a => xs.map(b => math.abs(a - b))).sum
            .toDouble / (2.0 * n * s)) < 1e-6
        }
        val kp = operators.Profiling.cohenKappa(df, "src",
            col("v") % 2 === 0, col("v") % 3 === 0)
          .as[(String, Long, Long, Long, Long, Long, Double, Double,
               Option[Double])].collect()
        val kappaOk = kp.forall { r =>
          r._2 == r._3 + r._4 + r._5 + r._6 &&
          r._9.forall(k => k >= -1.0 - 1e-9 && k <= 1.0 + 1e-9)
        }
        val cms = operators.Profiling
          .cmsCheckedCounts(df, "v", width = 64, depth = 4)
          .as[(Long, Long, Boolean)].collect()
        // 10 distinct values in 64 buckets x4 rows: bound must hold
        val cmsOk = cms.forall(_._3) &&
          cms.map(_._2).sum == rows.size
        giniOk && kappaOk && cmsOk
      }
    }, samples = 10)
  }

  test("property: interval coalescing covers exactly the brute-force " +
       "union; peak concurrency equals the pointwise maximum") {
    val ivGen = Gen.listOfN(25, for {
      k <- Gen.choose(0, 2)
      s <- Gen.choose(0L, 200L)
      len <- Gen.choose(1L, 60L)
    } yield (k.toLong, s, s + len))
    check(Prop.forAll(ivGen) { ivs =>
      ivs.isEmpty || {
        val us = 1000000L
        val df = ivs.map { case (k, s, e) =>
          (k, new java.sql.Timestamp(s * 1000L),
            new java.sql.Timestamp(e * 1000L)) }
          .toDF("k", "s_ts", "e_ts")
        val islands = operators.EventOps
          .coalesceIntervals(df, "k", "s_ts", "e_ts")
          .as[(Long, Long, Long, Long, Long)].collect()
        // covered seconds per key == brute-force union of [s, e)
        val coveredOk = ivs.groupBy(_._1).forall { case (k, rs) =>
          val brute = rs.flatMap { case (_, s, e) => s until e }.toSet
          val mine = islands.filter(_._1 == k)
            .flatMap(r => (r._4 / 1000L / 1000L) until
              (r._5 / 1000L / 1000L)).toSet
          brute == mine
        }
        // islands never overlap nor touch within a key
        val disjointOk = islands.groupBy(_._1).forall { case (_, rs) =>
          rs.sortBy(_._4).sliding(2).forall {
            case Array(a, b) => a._5 < b._4
            case _ => true
          }
        }
        // peak concurrency (all keys pooled) == pointwise max over the
        // brute-force timeline (single-day fixture)
        val peak = operators.EventOps.peakConcurrency(
          df.select((org.apache.spark.sql.functions
            .unix_micros(col("s_ts"))).as("start_us"),
            (org.apache.spark.sql.functions
              .unix_micros(col("e_ts"))).as("end_us")))
          .as[(Long, Long)].collect().toMap
        val brutePeak = (0L until 300L).map(t =>
          ivs.count { case (_, s, e) => s <= t && t < e }).max
        coveredOk && disjointOk && peak.getOrElse(0L, 0L) == brutePeak
      }
    }, samples = 10)
  }

  test("property: weighted percentile == unweighted percentile of the " +
       "weight-replicated multiset") {
    // the definitional reduction: a row of weight w behaves exactly
    // like w copies of an unweighted row
    val gen = Gen.listOfN(12, for {
      v <- Gen.choose(0, 20); w <- Gen.choose(1, 5)
    } yield (v.toDouble, w.toLong))
    check(Prop.forAll(gen, Gen.oneOf(25, 50, 75, 90)) { (rows, pct) =>
      rows.isEmpty || {
        val df = rows.map { case (v, w) => ("g", v, w) }
          .toDF("g", "v", "w")
        val got = operators.Profiling
          .weightedPercentiles(df, "g", "v", "w", pcts = Seq(pct))
          .select("value").as[Double].head()
        val expanded = rows.flatMap { case (v, w) =>
          Seq.fill(w.toInt)(v) }.sorted
        // lower quantile: smallest value with cum >= pct% of W
        val total = expanded.size
        val idx = math.max(
          math.ceil(pct.toDouble * total / 100.0).toInt - 1, 0)
        got == expanded(idx)
      }
    }, samples = 12)
  }

  test("property: negativeSample never emits a seen pair, bounds k, and " +
       "ignores input layout") {
    val gen = Gen.listOfN(30, for {
      u <- Gen.choose(1L, 6L); i <- Gen.choose(100L, 115L)
    } yield (u, i))
    check(Prop.forAll(gen, Gen.choose(1, 4)) { (pairs, k) =>
      pairs.isEmpty || {
        val df = pairs.toDF("u", "i")
        val out = operators.Mixing
          .negativeSample(df, "u", "i", k, buckets = 3)
          .as[(Long, Long, Int)].collect()
        val seen = pairs.toSet
        val unseenOk = out.forall(r => !seen.contains((r._1, r._2)))
        val kOk = out.groupBy(_._1).values.forall(_.length <= k)
        val relaid = operators.Mixing
          .negativeSample(df.repartition(7), "u", "i", k, buckets = 3)
          .as[(Long, Long, Int)].collect().toSet
        unseenOk && kOk && relaid == out.toSet
      }
    }, samples = 10)
  }

  test("property: wasserstein1 is a symmetric metric that reads pure " +
       "shifts exactly; mannWhitney arms are complementary") {
    val gen = Gen.listOfN(20, for {
      g <- Gen.choose(0, 1); v <- Gen.choose(0, 20)
    } yield (s"g$g", v * 0.25))
    check(Prop.forAll(gen, gen, Gen.choose(1, 8)) { (ra, rb, shift) =>
      (ra.isEmpty || rb.isEmpty) || {
        val a = ra.toDF("grp", "v"); val b = rb.toDF("grp", "v")
        def w1(x: org.apache.spark.sql.DataFrame,
               y: org.apache.spark.sql.DataFrame) =
          operators.Profiling.wasserstein1(x, y, "grp", "v", scale = 100L)
            .as[(String, Long, Long, Double)].collect()
            .map(r => r._1 -> r._4).toMap
        // identity of indiscernibles + symmetry
        val self = w1(a, a).values.forall(_ == 0.0)
        val sym = w1(a, b) == w1(b, a).map(identity)
        // a pure +shift moves every group's W1 by exactly the shift
        val shifted = w1(a, a.withColumn("v", col("v") + shift))
        val shiftExact = shifted.values.forall(_ == shift.toDouble)
        // Mann-Whitney complementarity: 2U_ab + 2U_ba = 2·n_a·n_b
        val uab = operators.Profiling.mannWhitney(a, b, "grp", "v")
          .as[(String, Long, Long, Long, Option[Double])].collect()
          .map(r => r._1 -> r).toMap
        val uba = operators.Profiling.mannWhitney(b, a, "grp", "v")
          .as[(String, Long, Long, Long, Option[Double])].collect()
          .map(r => r._1 -> r).toMap
        val comp = uab.forall { case (g, (_, na, nb, u2, _)) =>
          uba.get(g).forall { case (_, nb2, na2, u2b, _) =>
            na == na2 && nb == nb2 && u2 + u2b == 2L * na * nb }
        }
        self && sym && shiftExact && comp
      }
    }, samples = 10)
  }

  test("property: kCore output is a fixpoint — every surviving node " +
       "keeps >= k surviving distinct neighbors") {
    val gen = Gen.listOfN(25, for {
      a <- Gen.choose(1L, 10L); b <- Gen.choose(1L, 10L)
    } yield (a, b))
    check(Prop.forAll(gen, Gen.choose(2, 4)) { (edges, k) =>
      edges.isEmpty || {
        val df = edges.toDF("src", "dst")
        val core = operators.Graphs.kCore(df, "src", "dst", k)
          .as[(Long, Long)].collect().toMap
        val und = edges.filter(e => e._1 != e._2)
          .flatMap(e => Seq(e, e.swap)).distinct
        val inCore = core.keySet
        // fixpoint: degrees within the surviving subgraph all >= k,
        // and the reported degree matches
        core.forall { case (n, d) =>
          val nbrs = und.collect {
            case (a, b) if a == n && inCore(b) => b }.distinct
          nbrs.size >= k && nbrs.size == d
        }
      }
    }, samples = 12)
  }

  test("property: repetitionStats fractions are bounded, word counts " +
       "exact, and the result is layout-independent") {
    val docGen = Gen.listOfN(8, for {
      id <- Gen.choose(1L, 1000L)
      words <- Gen.listOfN(12, Gen.oneOf("aa", "bb", "cc", "d"))
    } yield (id, words.mkString(" ")))
    check(Prop.forAll(docGen, Gen.choose(1, 5)) { (docs0, parts) =>
      val docs = docs0.distinctBy(_._1)
      docs.isEmpty || {
        val df = docs.toDF("doc_id", "text")
        val out = operators.TextAnalysis.repetitionStats(df, 2, 3)
          .as[(Long, Long, Double, Double, Double)].collect()
        val byId = docs.toMap
        out.forall { case (id, nw, top, dup, ln) =>
          nw == byId(id).split(" ", -1).length &&
          top >= 0.0 && top <= 1.0 && dup >= 0.0 && dup <= 1.0 &&
          ln >= 0.0 && ln <= 1.0
        } && {
          val again = operators.TextAnalysis
            .repetitionStats(df.repartition(parts), 2, 3)
            .as[(Long, Long, Double, Double, Double)].collect()
          out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq
        }
      }
    }, samples = 8)
  }

  test("property: auc is bounded in [0, 1] and negating the score " +
       "reflects it exactly (the tie-half keeps 1 - auc exact)") {
    val gen = Gen.listOfN(30, for {
      g <- Gen.oneOf("a", "b"); s <- Gen.choose(0, 6)
      l <- Gen.oneOf(true, false)
    } yield (g, s.toDouble, l))
    check(Prop.forAll(gen) { rows =>
      rows.isEmpty || {
        val df = rows.toDF("grp", "score", "label")
        val fwd = operators.Profiling.auc(df, "grp", "score", "label")
          .as[(String, Long, Long, Option[Double])].collect()
          .map(r => r._1 -> r._4).toMap
        val rev = operators.Profiling.auc(
            df.withColumn("score", -col("score")), "grp", "score", "label")
          .as[(String, Long, Long, Option[Double])].collect()
          .map(r => r._1 -> r._4).toMap
        fwd.forall { case (g, a) => (a, rev(g)) match {
          case (Some(x), Some(y)) =>
            x >= 0.0 && x <= 1.0 &&
            math.abs((1.0 - x) - y) < 1e-9
          case (None, None) => true // one-sided both ways
          case _ => false
        }}
      }
    }, samples = 10)
  }

  test("property: prCurve is internally consistent — kept counts walk " +
       "monotonically as thresholds descend, pos_kept <= n_kept, the " +
       "lowest threshold keeps everything, recall ends at 1.0 when " +
       "positives exist") {
    val gen = Gen.listOfN(25, for {
      g <- Gen.oneOf("a", "b"); s <- Gen.choose(0, 5)
      l <- Gen.oneOf(true, false)
    } yield (g, s.toDouble, l))
    check(Prop.forAll(gen) { rows =>
      rows.isEmpty || {
        val df = rows.toDF("grp", "score", "label")
        val curve = operators.Profiling.prCurve(df, "grp", "score", "label")
          .as[(String, Double, Long, Long, Double, Option[Double])]
          .collect().groupBy(_._1)
        curve.forall { case (g, pts0) =>
          val pts = pts0.sortBy(-_._2) // descending thresholds
          val grp = rows.filter(_._1 == g)
          val nPos = grp.count(_._3)
          pts.forall(p => p._4 <= p._3 && p._5 >= 0.0 && p._5 <= 1.0) &&
          pts.zip(pts.tail).forall { case (hi, lo) =>
            hi._3 <= lo._3 && hi._4 <= lo._4 } &&
          pts.last._3 == grp.size &&
          (if (nPos > 0) pts.last._6.contains(1.0) && pts.last._4 == nPos
           else pts.forall(_._6.isEmpty))
        }
      }
    }, samples = 10)
  }

  test("property: bootstrap CI stays inside the data range and brackets " +
       "nothing outside it; replicate count never exceeds reps") {
    val gen: Gen[List[(Long, Double)]] = Gen.listOfN(30, for {
      k <- Gen.choose(0L, 9999L); v <- Gen.choose(-50, 50)
    } yield (k, v.toDouble))
    check(Prop.forAll(gen) { rows =>
      rows.isEmpty || {
        val df = rows.toDF("key", "v").dropDuplicates("key")
          .withColumn("g", lit("g"))
        val r = operators.Profiling.bootstrapCI(df, "g", "key", "v",
            reps = 16)
          .as[(String, Long, Double, Long, Option[Double], Option[Double])]
          .head()
        val vs = rows.map(_._2)
        r._4 <= 16L &&
        r._5.forall(lo => lo >= vs.min && lo <= vs.max) &&
        r._6.forall(hi => hi >= vs.min && hi <= vs.max) &&
        (for (lo <- r._5; hi <- r._6) yield lo <= hi).getOrElse(true)
      }
    }, samples = 8)
  }

  test("property: ewma lies within the window's min/max and equals the " +
       "value on constant series") {
    val gen: Gen[List[(Long, Double)]] = Gen.listOfN(12, for {
      t <- Gen.choose(0L, 999L); v <- Gen.choose(0, 100)
    } yield (t, v.toDouble))
    check(Prop.forAll(gen) { rows =>
      rows.isEmpty || {
        val df = rows.toDF("t", "v").dropDuplicates("t")
          .withColumn("s", lit("s"))
        val out = operators.EventOps.ewmaSmooth(df, "s", "t", "v")
          .select(col("t"), col("v"), col("ewma"))
          .as[(Long, Double, Double)].collect().sortBy(_._1)
        val inRange = out.indices.forall { i =>
          val window = out.slice(math.max(0, i - 15), i + 1).map(_._2)
          out(i)._3 >= window.min - 1e-9 && out(i)._3 <= window.max + 1e-9
        }
        val const = operators.EventOps.ewmaSmooth(
            rows.map(r => (r._1, 7.25)).toDF("t", "v")
              .dropDuplicates("t").withColumn("s", lit("s")),
            "s", "t", "v")
          .select(col("ewma")).as[Double].collect()
        inRange && const.forall(_ === 7.25)
      }
    }, samples = 8)
  }

  test("property: hilbert curve is bijective and unit-step at random " +
       "bit widths; rankEval precision*k always equals hits") {
    check(Prop.forAll(Gen.choose(2, 6)) { bits =>
      val side = 1 << bits
      val grid = (for (x <- 0 until side; y <- 0 until side)
        yield (x.toLong, y.toLong)).toDF("x", "y")
      val out = grid.select(col("x"), col("y"),
          operators.Layout.hilbertValue(col("x"), col("y"), bits).as("h"))
        .as[(Long, Long, Long)].collect()
      val byH = out.map(r => r._3 -> (r._1, r._2)).toMap
      out.map(_._3).toSet == (0L until (side.toLong * side)).toSet &&
      (0L until (side.toLong * side - 1)).forall { h =>
        val (x1, y1) = byH(h); val (x2, y2) = byH(h + 1)
        math.abs(x1 - x2) + math.abs(y1 - y2) == 1L
      }
    }, samples = 5)
    val rankedGen: Gen[List[(Long, Int)]] = Gen.listOfN(8, for {
      id <- Gen.choose(0L, 99L)
    } yield (id, 0)).map(_.map(_._1).distinct.zipWithIndex
      .map { case (id, i) => (id, i + 1) })
    check(Prop.forAll(rankedGen, Gen.choose(1, 8)) { (docs, k) =>
      docs.isEmpty || {
        val ranked = docs.map { case (id, r) => ("q", id, r) }
          .toDF("query_id", "doc_id", "rank")
        val rels = docs.map { case (id, _) => ("q", id, id % 3 == 0) }
          .toDF("query_id", "doc_id", "rel")
          .withColumn("rel", col("rel").cast("long"))
        val r = operators.Search.rankEval(ranked, rels, k)
          .as[(String, Long, Long, Double, Double, Option[Double],
               Option[Double])].head()
        math.abs(r._5 * k - r._3) < 1e-6 &&
        r._6.forall(rec => rec >= 0.0 && rec <= 1.0) &&
        r._7.forall(ap => ap >= 0.0 && ap <= 1.0)
      }
    }, samples = 8)
  }
}
