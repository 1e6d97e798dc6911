package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank"), // near-dup of 1
    (3L, "completely different text about spark partitions and shuffle exchanges here"),
    (4L, "another unrelated document mentioning windows aggregates and joins only"),
    (5L, "the quick brown fox jumps over the lazy dog near the river bank today") // exact dup of 1
  ).toDF("doc_id", "text")

  test("dedupKeepFirst keeps exactly one row per key, first by order") {
    val df = Seq((1, "b", 10), (1, "a", 20), (2, "c", 30)).toDF("k", "v", "x")
    val out = Dedup.dedupKeepFirst(df, Seq(col("k")), Seq(col("v")))
    assert(out.count() === 2)
    assert(out.filter(col("k") === 1).select("v").as[String].collect()(0) === "a")
    assert(!out.columns.contains("__rn"))
  }

  test("exactDedup collapses duplicates on the key subset") {
    assert(Dedup.exactDedup(docs, Seq("text")).count() === 4)
    assert(Dedup.exactDedup(docs, Seq.empty).count() === 5)
  }

  test("shingleCol produces n-gram shingles, distinct") {
    val sh = docs.filter(col("doc_id") === 3)
      .select(Dedup.shingleCol(col("text"), 3).as("sh"))
      .as[Seq[String]].collect()(0)
    assert(sh.contains("completely different text"))
    assert(sh.contains("spark partitions and"))
    assert(sh.distinct.length === sh.length)
  }

  test("minhashNearDups finds the exact and near duplicates, not the rest") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
        shingleN = 3, numHashes = 16, bands = 8, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 5L)), "exact dup must be found (jaccard 1.0)")
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 5L)),
      "near dup (one trailing word removed) must be found")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhashNearDups jaccard is exact (verify step), 1.0 for exact dups") {
    val j = Dedup.minhashNearDups(docs, "doc_id", "text",
        shingleN = 3, numHashes = 16, bands = 8, threshold = 0.5)
      .filter(col("doc_a") === 1 && col("doc_b") === 5)
      .select("jaccard").as[Double].collect()(0)
    assert(j === 1.0)
  }

  test("minhashNearDups ignores empty and whitespace-only documents") {
    val junk = Seq(
      (1L, ""), (2L, "   "), (3L, " "), (4L, "\t"),
      (5L, "real content that says something meaningful about spark plans"),
      (6L, "real content that says something meaningful about spark plans")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(junk, "doc_id", "text",
        shingleN = 3, numHashes = 16, bands = 8, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((5L, 6L)),
      "blank docs must not pair with each other at jaccard 1.0")
  }

  test("simhash native expression matches the HOF formulation bit-for-bit") {
    val both = docs.select(
      Dedup.simhash(split(col("text"), " ")).as("native"),
      Dedup.simhashHof(split(col("text"), " ")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("simhashNearDups: exact dup at hamming 0; unrelated docs not paired") {
    val pairs = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 3)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Int)].collect()
    val asMap = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(asMap.get((1L, 5L)).contains(0), "exact dup → identical simhash")
    assert(!asMap.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("connectedComponents: chains collapse transitively, groups stay apart") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), // chain → all comp 1
      (10L, 11L),                   // separate pair → comp 10
      (20L, 21L), (21L, 20L)        // duplicate/reversed edges tolerated
    ).toDF("doc_a", "doc_b")
    val comps = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(comps === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents: path halving converges a 60-chain within 10 rounds") {
    // plain min-label propagation needs ~diameter (59) iterations here;
    // pointer jumping must land it inside maxIter = 10 (O(log d))
    val pairs = (0L until 60L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val comps = Dedup.connectedComponents(pairs, maxIter = 10)
      .as[(Long, Long)].collect().toMap
    assert(comps.size === 61)
    assert(comps.values.toSet === Set(0L), "one component rooted at 0")
  }

  test("dedupNearClusters keeps one representative per transitive cluster") {
    // docs 1, 2, 5 are near/exact dups of each other (transitively via 1);
    // 3 and 4 are unrelated singletons
    val out = Dedup.dedupNearClusters(docs, "doc_id", "text",
        shingleN = 3, numHashes = 16, bands = 8, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(out === Set(1L, 3L, 4L))
  }

  test("dedupKeepBest keeps the quality argmax per cluster, id tie-break") {
    // cluster {1,2,5}: qualities 10, 99, 99 → survivor = 2 (highest
    // quality, min id among the tie); singletons 3, 4 always survive
    val scored = docs.withColumn("quality",
      when(col("doc_id") === 1, 10).otherwise(
        when(col("doc_id").isin(2, 5), 99).otherwise(50)))
    val out = Dedup.dedupKeepBest(scored, "doc_id", "text", "quality",
        shingleN = 3, numHashes = 16, bands = 8, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(out === Set(2L, 3L, 4L))
    // all original columns survive, no helper columns leak
    assert(Dedup.dedupKeepBest(scored, "doc_id", "text", "quality")
      .columns.toSeq === Seq("doc_id", "text", "quality"))
  }

  test("minhashNearDups bounds mega-buckets: cohort edges, clusters intact") {
    // 300 identical template docs share every LSH bucket — uncapped that
    // is 300·299/2 = 44 850 candidate pairs from ONE bucket. With
    // bucketCap = 20, only the bucket's first 20 docs may stand on the
    // LEFT of a pair: volume is Σ_{a=1..20} (300−a) = 5 790 = cap·size
    // shaped, not size², and per-bucket join WORK is bounded the same
    // way (the left side is capped before the join).
    val template = "the quick brown fox jumps over the lazy dog again and again"
    val docs = (1L to 300L).map(i => (i, template)).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
      shingleN = 3, numHashes = 16, bands = 4, threshold = 0.8,
      bucketCap = 20)
    val collected = pairs.select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect()
    assert(collected.length === (1 to 20).map(a => 300 - a).sum,
      "bounded: every doc pairs with the bucket's first-20 cohort only")
    assert(collected.forall(_._3 === 1.0), "identical docs verify at 1.0")
    assert(collected.forall(p => p._1 < p._2))
    assert(collected.map(_._1).forall(_ <= 20),
      "left side of every pair comes from the capped cohort")
    // no silent loss: transitive clustering still groups ALL 300 docs,
    // exactly as the uncapped clique would
    val comps = Dedup.connectedComponents(
        pairs.select("doc_a", "doc_b"))
      .as[(Long, Long)].collect()
    assert(comps.length === 300)
    assert(comps.map(_._2).distinct.toSeq === Seq(1L),
      "one component, labeled by the minimum id")
  }

  test("dedupChunksGlobal removes repeated chunks, keeps first occurrence") {
    // chunkTokens=2: doc 1 = [a b][c d], doc 2 = [a b][x y], doc 3 = [c d]
    // → doc 2 keeps only "x y" (its "a b" appeared in doc 1), doc 3 dies
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b x y"),
      (3L, "c d")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupChunksGlobal(docs, "doc_id", "text", chunkTokens = 2)
      .as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "a b c d", 2L -> "x y"))
  }

  test("dedupChunksGlobal: NULL-text rows pass through instead of vanishing") {
    val docs = Seq(
      (1L, Some("a b c d")),
      (2L, None),              // no chunks — must still be in the output
      (3L, Some("a b"))        // duplicate chunk of doc 1 → dies
    ).toDF("doc_id", "text")
    val out = Dedup.dedupChunksGlobal(docs, "doc_id", "text", chunkTokens = 2)
      .as[(Long, Option[String])].collect().toMap
    assert(out === Map(1L -> Some("a b c d"), 2L -> None))
  }

  test("dedupChunksGlobal: no duplicate chunks → corpus unchanged") {
    val docs = Seq(
      (1L, "p q r s t u v"),   // 7 tokens → chunks [p..t][u v]
      (2L, "w x y z")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupChunksGlobal(docs, "doc_id", "text", chunkTokens = 5)
      .as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "p q r s t u v", 2L -> "w x y z"))
  }

  test("chainedJaccard computes exact jaccard for (id, id+1) pairs") {
    val out = Dedup.chainedJaccard(docs, "doc_id", "text", shingleN = 3)
    assert(out.count() === 4)
    val j12 = out.filter(col("doc_a") === 1).select("jaccard").as[Double].collect()(0)
    assert(j12 > 0.7 && j12 < 1.0, s"near-dup pair expected high jaccard, got $j12")
    val j34 = out.filter(col("doc_a") === 3).select("jaccard").as[Double].collect()(0)
    assert(j34 === 0.0)
  }

  test("allPairsJaccard equals brute force at every threshold (exact, no misses)") {
    val sh = docs.select(col("doc_id"), Dedup.shingleCol(col("text"), 3).as("sh"))
    val brute = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
         size(array_union(col("a.sh"), col("b.sh")))).as("jaccard"))
    // 1.0 exercises the boundary prefix (k = |X|, prefix length 1);
    // low thresholds exercise wide prefixes and candidate dedup
    for (t <- Seq(0.2, 0.6, 0.9, 1.0)) {
      val expected = brute.filter(col("jaccard") >= t)
        .as[(Long, Long, Double)].collect().toSet
      val got = Dedup.allPairsJaccard(docs, "doc_id", "text", t)
        .as[(Long, Long, Double)].collect().toSet
      assert(got === expected, s"threshold $t")
    }
  }

  test("sortedNeighborhood: within-window pairs only, per block, in sort " +
       "order; cross-block pairs never compared") {
    val df = Seq(
      // block X, sorted by len: 1 (dup of 2), 2, 3 far away
      (1L, "the quick brown fox jumps high", "X", 10L),
      (2L, "the quick brown fox jumps high", "X", 11L),
      (3L, "completely different words entirely here now", "X", 12L),
      // block Y holds another copy of 1 — blocked away, must NOT pair
      (4L, "the quick brown fox jumps high", "Y", 10L)
    ).toDF("doc_id", "text", "blk", "len")
    val out = Dedup.sortedNeighborhood(df, "doc_id", "text",
        col("blk"), col("len"), window = 1, threshold = 0.9)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 2L)),
      "only the adjacent same-block duplicate pair verifies")
    // window 2 reaches (1,3) and (2,3) as candidates, but verify kills
    // them; the threshold=0 run shows the candidate envelope
    val all = Dedup.sortedNeighborhood(df, "doc_id", "text",
        col("blk"), col("len"), window = 2, threshold = 0.0)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(all === Set((1L, 2L), (1L, 3L), (2L, 3L)),
      "candidates are exactly the within-window same-block pairs")
  }

  test("allPairsCosine equals a driver-side brute force at every threshold") {
    import java.math.{BigDecimal => JBD, MathContext, RoundingMode}
    def tfv(s: String): Map[String, Long] = {
      val t = s.split(" ").filter(_.nonEmpty)
      val shs = if (t.length < 3) Seq.empty[String]
                else t.sliding(3).map(_.mkString(" ")).toSeq
      shs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    }
    // mirror the engine arithmetic exactly: integer Σtf² → sqrt → IEEE
    // divide → per-term product rounded HALF_UP to 9 → decimal sum
    def cos(a: Map[String, Long], b: Map[String, Long]): Double = {
      val na = math.sqrt(a.values.map(v => v * v).sum.toDouble)
      val nb = math.sqrt(b.values.map(v => v * v).sum.toDouble)
      val shared = a.keySet.intersect(b.keySet).toSeq.sorted
      if (shared.isEmpty) 0.0
      else shared.map { t =>
        new JBD((a(t) / na) * (b(t) / nb))
          .setScale(9, RoundingMode.HALF_UP)
      }.reduce(_.add(_)).doubleValue()
    }
    val local = docs.as[(Long, String)].collect().map {
      case (id, s) => id -> tfv(s)
    }
    val brute = (for {
      (ia, va) <- local; (ib, vb) <- local if ia < ib
    } yield (ia, ib, cos(va, vb))).toSeq
    for (t <- Seq(0.2, 0.6, 0.9, 1.0)) {
      val expected = brute.filter(_._3 >= t).toSet
      val got = Dedup.allPairsCosine(docs, "doc_id", "text", t)
        .as[(Long, Long, Double)].collect().toSet
      assert(got === expected, s"threshold $t")
    }
  }

  test("allPairsCosine separates repetition the set-Jaccard view cannot") {
    // identical shingle SETS, different TF profiles: Jaccard says 1.0,
    // cosine must say < 1
    val rep = Seq(
      (1L, "a b c a b c a b c"), // tf: (a b c)=3, (b c a)=2, (c a b)=2
      (2L, "a b c")              // tf: (a b c)=1
    ).toDF("doc_id", "text")
    val j = Dedup.allPairsJaccard(rep, "doc_id", "text", 0.99)
    assert(j.count() === 0,
      "shingle SETS differ here ({abc,bca,cab} vs {abc}) — sanity")
    val c = Dedup.allPairsCosine(rep, "doc_id", "text", 0.5)
      .as[(Long, Long, Double)].collect()
    assert(c.length === 1)
    // cos = 3 / (sqrt(9+4+4) · 1) = 3/sqrt(17) ≈ 0.7276
    assert(math.abs(c.head._3 - 3.0 / math.sqrt(17.0)) < 1e-6)
  }

  test("allPairsJaccard finds pairs sharing NO frequent tokens (prefix completeness)") {
    // two docs identical to each other but disjoint from the rest: their
    // only shared shingles are globally rare, so they must surface via
    // their own prefixes, not via common-token collisions
    val aug = docs.union(Seq(
      (10L, "zeta eta theta iota kappa lambda mu nu xi omicron"),
      (11L, "zeta eta theta iota kappa lambda mu nu xi omicron")
    ).toDF("doc_id", "text"))
    val pairs = Dedup.allPairsJaccard(aug, "doc_id", "text", 0.99)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((10L, 11L)))
    assert(pairs.contains((1L, 5L)))
    assert(pairs.size === 2)
  }

  test("containmentJoin equals brute force and catches subsumed docs Jaccard misses") {
    // doc 20 is a verbatim excerpt of doc 21: containment(20→21) = 1.0
    // while Jaccard is low — the case the symmetric join cannot express
    val aug = docs.union(Seq(
      (20L, "alpha beta gamma delta"),
      (21L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon")
    ).toDF("doc_id", "text"))
    val sh = aug.select(col("doc_id"), Dedup.shingleCol(col("text"), 3).as("sh"))
    val brute = sh.as("a").join(sh.as("b"), col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
         size(col("a.sh"))).as("containment"))
    for (t <- Seq(0.5, 0.9, 1.0)) {
      val expected = brute.filter(col("containment") >= t)
        .as[(Long, Long, Double)].collect().toSet
      val got = Dedup.containmentJoin(aug, "doc_id", "text", t)
        .as[(Long, Long, Double)].collect().toSet
      assert(got === expected, s"threshold $t")
    }
    val strict = Dedup.containmentJoin(aug, "doc_id", "text", 1.0)
      .as[(Long, Long, Double)].collect().toSet
    assert(strict.exists(p => p._1 == 20L && p._2 == 21L && p._3 == 1.0),
      "excerpt must be fully contained in its source")
    assert(!strict.exists(p => p._1 == 21L && p._2 == 20L),
      "containment is directional — the long doc is not inside the excerpt")
  }

  test("containmentJoin probeDfCap: default output identical to uncapped; plan carries the cut") {
    val aug = docs.union(Seq(
      (20L, "alpha beta gamma delta"),
      (21L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon")
    ).toDF("doc_id", "text"))
    val capped = Dedup.containmentJoin(aug, "doc_id", "text", 0.5)
    val uncapped = Dedup.containmentJoin(aug, "doc_id", "text", 0.5,
      probeDfCap = Int.MaxValue)
    assert(rendered(capped) === rendered(uncapped),
      "default cap must not change organic-fixture output")
    // the stop-shingle cut is a real filter in the optimized plan, on the
    // probe side's document-frequency column
    assert(capped.queryExecution.optimizedPlan.toString.contains("100000"),
      "probe-side df cap must survive into the optimized plan")
  }

  test("dedupSubstrings masks repeats at any offset, keeps first, short docs whole") {
    val df = Seq(
      (1L, "a b c d e x y z"),      // first occurrence of "a b c d"
      (2L, "p q a b c d r s"),      // same 4-gram at offset 2 → masked
      (3L, "a b c"),                // shorter than n → passes whole
      (4L, "a b c d a b c d")       // in-doc repeat: second run masked
    ).toDF("doc_id", "text")
    val out = Dedup.dedupSubstrings(df, "doc_id", "text", n = 4)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, "a b c d e x y z", 8L, 0L)),
      "the global first occurrence survives intact")
    assert(out(2L) === ((2L, "p q r s", 8L, 4L)),
      "a duplicated span dies at any offset (chunk dedup would miss this)")
    assert(out(3L) === ((3L, "a b c", 3L, 0L)))
    // doc 4 windows: [a b c d](0) first-in-doc-4? global rank for
    // "a b c d": doc1 pos0 is first; doc4's BOTH occurrences are masked,
    // as are its straddling windows — everything covered
    assert(out(4L) === ((4L, "", 8L, 8L)),
      "an all-duplicate doc masks down to empty")
    // NULL text passes through with NULL stats
    val withNull = df.union(Seq((5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text"))
    val n5 = Dedup.dedupSubstrings(withNull, "doc_id", "text", n = 4)
      .filter($"doc_id" === 5L).collect()(0)
    assert(n5.isNullAt(1) && n5.isNullAt(2) && n5.isNullAt(3))
  }

  test("substringDupSpans: maximal cross-doc spans at any alignment; " +
       "within-doc repeats are NOT spans; overlapping windows merge") {
    val df = Seq(
      // docs 1/2 share the 6-token run "a b c d e f" at offsets 0 and 2:
      // three marked 4-windows each, merging to ONE maximal span
      (1L, "a b c d e f x y"),
      (2L, "p q a b c d e f"),
      // doc 3 repeats "u v w z" within itself only → cross-doc ⇒ no span
      (3L, "u v w z u v w z"),
      (4L, "a b c")                       // shorter than n → no windows
    ).toDF("doc_id", "text")
    val out = Dedup.substringDupSpans(df, "doc_id", "text", n = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 0L, 5L, 6L), (2L, 2L, 7L, 6L)),
      "one merged maximal span per doc, at each doc's own offset")
    val again = Dedup.substringDupSpans(df.repartition(5), "doc_id",
      "text", n = 4).as[(Long, Long, Long, Long)].collect().toSet
    assert(again === out, "layout-independent")
    // two shared runs separated by a gap > n stay SEPARATE spans
    val gapped = Seq(
      (1L, "a b c d 1 2 3 4 5 w x y z"),
      (2L, "a b c d 6 7 8 9 0 w x y z first-run-elsewhere")
    ).toDF("doc_id", "text")
    val spans2 = Dedup.substringDupSpans(gapped, "doc_id", "text", n = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(spans2 === Set((1L, 0L, 3L, 4L), (1L, 9L, 12L, 4L),
      (2L, 0L, 3L, 4L), (2L, 9L, 12L, 4L)),
      "a run of exactly n at two non-abutting offsets → two spans")
  }

  test("substringContamSpans/scrubContamSpans: train runs verbatim in " +
       "eval are reported and cut; train-train repeats are NOT") {
    val eval = Seq(
      (1L, "what is the capital of france paris obviously")
    ).toDF("doc_id", "text")
    val train = Seq(
      // quotes the eval item's first 7 tokens at offset 2 → one span
      (101L, "intro text what is the capital of france paris and more"),
      // shares a run with doc 101 but NOT with eval → no span
      (102L, "intro text something entirely different here now ok yes"),
      (103L, "clean document about rivers and mountains flowing east")
    ).toDF("doc_id", "text")
    val spans = Dedup.substringContamSpans(train, eval, "doc_id", "text",
        n = 7).as[(Long, Long, Long, Long)].collect().toSet
    // doc 101 tokens: intro(0) text(1) what(2) ... paris(8) and(9)
    // more(10); eval 7-windows: [what..paris](0), [is..obviously](1);
    // only train wpos 2 matches → span [2, 8], 7 tokens
    assert(spans === Set((101L, 2L, 8L, 7L)),
      s"one contamination span, train side only: $spans")
    val scrub = Dedup.scrubContamSpans(train, eval, "doc_id", "text",
        n = 7).collect().map(r => r.getLong(0) -> r).toMap
    assert(scrub(101L).getString(1) === "intro text and more" &&
      scrub(101L).getLong(3) === 7L,
      "the quote dies, the document survives")
    assert(scrub(102L).getLong(3) === 0L && scrub(103L).getLong(3) === 0L,
      "train-train repetition is not contamination")
    assert(scrub.keySet === Set(101L, 102L, 103L),
      "eval docs never appear in the output")
    val again = Dedup.substringContamSpans(train.repartition(5),
        eval.repartition(3), "doc_id", "text", n = 7)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(again === spans, "layout-independent")
  }

  test("substrIndex: ManifestTable commit/read-back parity; probe against " +
       "the extended index equals the direct cross-corpus pass") {
    val dir = java.nio.file.Files.createTempDirectory("graft-substr-spec")
    def deleteTree(p: java.nio.file.Path): Unit = {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
      finally walk.close()
    }
    try {
      import graft.sources.ManifestTable
      val tbl = dir.toString + "/idx"
      val corpusA = Seq(
        (1L, "what is the capital of france paris obviously")
      ).toDF("doc_id", "text")
      val corpusB = Seq(
        (2L, "the quick brown fox jumps over the lazy dog")
      ).toDF("doc_id", "text")
      val batch = Seq(
        // quotes corpusA's first 7 tokens at offset 2
        (101L, "intro text what is the capital of france paris and more"),
        // quotes ALL of corpusB at offset 2 — indexed only after extension
        (102L, "prefix words the quick brown fox jumps over the lazy dog"),
        (103L, "clean document about rivers and mountains flowing east")
      ).toDF("doc_id", "text")
      assert(ManifestTable.upsertBatch(
        Dedup.substrIndex(corpusA, "doc_id", "text", n = 7),
        tbl, Seq("wh1", "wh2"), nBuckets = 4, batchId = 0L))
      // write/read-back parity: the committed artifact IS the hash table
      val back1 = ManifestTable.read(spark, tbl).select("wh1", "wh2")
      assert(rendered(back1) ===
        rendered(Dedup.substrIndex(corpusA, "doc_id", "text", n = 7)))
      // probe before extension: doc 102's quote of corpusB is unknown
      val spans1 = Dedup.substringSpansAgainstIndex(batch, back1,
          "doc_id", "text", n = 7)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(spans1 === Set((101L, 2L, 8L, 7L)))
      // extend by union-upsert (corpus text never re-read), re-probe
      assert(ManifestTable.upsertBatch(
        Dedup.substrIndex(corpusB, "doc_id", "text", n = 7),
        tbl, Seq("wh1", "wh2"), nBuckets = 4, batchId = 1L))
      val back2 = ManifestTable.read(spark, tbl).select("wh1", "wh2")
      assert(rendered(back2) === rendered(
        Dedup.substrIndex(corpusA.unionAll(corpusB), "doc_id", "text",
          n = 7)),
        "extension is union semantics — repeat windows collapse")
      val spans2 = Dedup.substringSpansAgainstIndex(batch, back2,
          "doc_id", "text", n = 7)
        .as[(Long, Long, Long, Long)].collect().toSet
      val direct = Dedup.substringContamSpans(batch,
          corpusA.unionAll(corpusB), "doc_id", "text", n = 7)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(spans2 === direct,
        "stored-index probe must equal the direct cross-corpus pass")
      assert(spans2 === Set((101L, 2L, 8L, 7L), (102L, 2L, 10L, 9L)))
      // cut mode rides the same spans
      val cut = Dedup.scrubAgainstSubstrIndex(batch, back2,
          "doc_id", "text", n = 7)
        .collect().map(r => r.getLong(0) -> r).toMap
      assert(cut(101L).getString(1) === "intro text and more" &&
        cut(101L).getLong(3) === 7L)
      assert(cut(102L).getString(1) === "prefix words" &&
        cut(102L).getLong(3) === 9L)
      assert(cut(103L).getLong(3) === 0L, "clean doc untouched")
      // layout independence of the probe
      val again = Dedup.substringSpansAgainstIndex(batch.repartition(5),
          back2.repartition(3), "doc_id", "text", n = 7)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(again === spans2)
    } finally deleteTree(dir)
  }

  test("removeSubstringDups cuts EVERY occurrence (first included); " +
       "untouched docs and NULL text pass through") {
    val df = Seq(
      (1L, "a b c d e f x y"),
      (2L, "p q a b c d e f"),
      (3L, "u v w z u v w z"),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Dedup.removeSubstringDups(df, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) === "x y" && out(1L).getLong(3) === 6L,
      "the FIRST copy of a shared run dies too (frequency-kill)")
    assert(out(2L).getString(1) === "p q" && out(2L).getLong(3) === 6L)
    assert(out(3L).getString(1) === "u v w z u v w z" &&
      out(3L).getLong(3) === 0L, "within-doc repetition is content")
    assert(out(4L).isNullAt(1) && out(4L).isNullAt(2) && out(4L).isNullAt(3))
    assert(out(1L).getLong(2) === 8L, "n_tokens is the pre-cut count")
  }

  test("OpCaches releases operator-internal persists; result still correct after") {
    spark.catalog.clearCache() // suites before us leak entries by design
    graft.operators.OpCaches.release(blocking = true)
    val out = Dedup.allPairsJaccard(docs, "doc_id", "text", 0.8)
    val n = out.count()
    assert(graft.operators.OpCaches.registered >= 2,
      "shingle + prefix tables must be registered")
    assert(!spark.sharedState.cacheManager.isEmpty,
      "the operator's persists must be live before release")
    graft.operators.OpCaches.release(blocking = true)
    assert(spark.sharedState.cacheManager.isEmpty,
      "release must drop every operator-registered cache entry")
    assert(graft.operators.OpCaches.registered === 0)
    assert(out.count() === n, "released plan must recompute identically")
  }

  test("simhashRecallAudit: token-set-dup truth, guaranteed recall verdict") {
    // docs 1 and 5 share identical text (same token set); doc 2 drops
    // one token ("today") so its distinct-token set differs — truth must
    // be exactly the (1,5) pair and the pigeonhole guarantees it's found
    val out = Dedup.simhashRecallAudit(docs, "doc_id", "text")
      .as[(Long, Boolean)].collect()
    assert(out.toSeq === Seq((1L, true)))
  }

  test("minhashRecallAudit: truth equals brute force, verdict reflects the floor") {
    // identical-pair corpus: jaccard 1.0 pairs are found by EVERY band,
    // so LSH recall is certain and the verdict must be TRUE at floor 1.0
    val aug = docs.union(Seq(
      (10L, "zeta eta theta iota kappa lambda mu nu xi omicron"),
      (11L, "zeta eta theta iota kappa lambda mu nu xi omicron")
    ).toDF("doc_id", "text"))
    val sh = aug.select(col("doc_id"), Dedup.shingleCol(col("text"), 3).as("sh"))
    val brute = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .filter(size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
        size(array_union(col("a.sh"), col("b.sh"))) >= 0.9)
      .count()
    val (truth, ok) = Dedup.minhashRecallAudit(aug, "doc_id", "text",
        shingleN = 3, numHashes = 16, bands = 4, threshold = 0.9,
        floor = 1.0)
      .as[(Long, Boolean)].collect()(0)
    assert(truth === brute && truth >= 2L)
    assert(ok, "certain-recall corpus must pass a 1.0 floor")
    // an impossible floor (> 1) must flip the verdict, not error
    val (_, notOk) = Dedup.minhashRecallAudit(aug, "doc_id", "text",
        shingleN = 3, numHashes = 16, bands = 4, threshold = 0.9,
        floor = 1.5)
      .as[(Long, Boolean)].collect()(0)
    assert(!notOk)
  }

  test("minhashRecallAudit truthSample: truth restricted to the Knuth-" +
       "rank sample, LSH side still the full corpus") {
    // three identical pairs; the Knuth hash pmod(id*2654435761, 2^32)
    // ranks ids 1..6 as: 5(.090) < 2(.236) < 4(.472) < 1(.618) <
    // 6(.708) < 3(.854) in units of 2^32 — so a k=4 sample keeps
    // {5,2,4,1}: pair (1,2) fully inside, (3,4) and (5,6) lose one
    // endpoint each → sampled truth = 1 of the 3 full-truth pairs
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "one two three four five six seven eight nine ten here"),
      (4L, "one two three four five six seven eight nine ten here"),
      (5L, "red orange yellow green blue indigo violet pink brown black"),
      (6L, "red orange yellow green blue indigo violet pink brown black")
    ).toDF("doc_id", "text")
    val full = Dedup.minhashRecallAudit(docs, "doc_id", "text",
        shingleN = 3, numHashes = 16, bands = 4, threshold = 0.9,
        floor = 1.0)
      .as[(Long, Boolean)].head()
    assert(full === ((3L, true)))
    val sampled = Dedup.minhashRecallAudit(docs, "doc_id", "text",
        shingleN = 3, numHashes = 16, bands = 4, threshold = 0.9,
        floor = 1.0, truthSample = 4)
      .as[(Long, Boolean)].head()
    assert(sampled === ((1L, true)),
      "k=4 Knuth sample keeps {5,2,4,1}: only the (1,2) pair survives " +
        "with both endpoints, and certain recall passes the 1.0 floor")
    // k >= corpus leaves the audit exact
    val kBig = Dedup.minhashRecallAudit(docs, "doc_id", "text",
        shingleN = 3, numHashes = 16, bands = 4, threshold = 0.9,
        floor = 1.0, truthSample = 100)
      .as[(Long, Boolean)].head()
    assert(kBig === full)
  }

  test("dedupAgainstCorpus drops batch near-dups of the corpus, keeps the rest") {
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank today")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"), // near-dup
      (2L, "completely different text about spark partitions and shuffle exchanges here"),
      (3L, "the quick brown fox jumps over the lazy dog near the river bank today") // exact dup
    ).toDF("doc_id", "text")
    val out = Dedup.dedupAgainstCorpus(batch, corpus, "doc_id", "text",
        shingleN = 3, numHashes = 16, bands = 8, threshold = 0.5)
    assert(out.select("doc_id").as[Long].collect().toSet === Set(2L))
    assert(out.columns.toSeq === batch.columns.toSeq, "schema unchanged")
  }

  test("dedupAgainstCorpus leaves in-batch duplicates and signatureless docs alone") {
    val corpus = Seq(
      (100L, "totally unrelated corpus document about graphs and trees here")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (3L, "   "),
      (4L, "")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupAgainstCorpus(batch, corpus, "doc_id", "text",
        shingleN = 3, numHashes = 16, bands = 8, threshold = 0.5)
    assert(out.count() === 4,
      "within-batch dups are out of scope; empty docs match nothing and pass")
  }

  test("dedupAgainstIndex on a stored, read-back signature index matches the direct path") {
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (101L, "totally unrelated corpus document about graphs and trees here")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "completely different text about spark partitions and shuffle exchanges here")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-sigidx")
      .toString + "/idx"
    Dedup.signatureIndex(corpus, "doc_id", "text", shingleN = 3,
      numHashes = 16, bands = 8).write.parquet(dir)
    val viaIndex = Dedup.dedupAgainstIndex(batch, spark.read.parquet(dir),
      "doc_id", "text", shingleN = 3, numHashes = 16, bands = 8,
      threshold = 0.5)
    val direct = Dedup.dedupAgainstCorpus(batch, corpus, "doc_id", "text",
      shingleN = 3, numHashes = 16, bands = 8, threshold = 0.5)
    assert(rendered(viaIndex) === rendered(direct))
    assert(viaIndex.select("doc_id").as[Long].collect().toSet === Set(2L))
  }

  test("removeBoilerplate kills cross-doc frequent chunks everywhere, keeps in-doc repeats") {
    val docs = Seq(
      (1L, "FOOTER TEXT HERE alpha beta gamma"),
      (2L, "FOOTER TEXT HERE delta epsilon zeta"),
      (3L, "FOOTER TEXT HERE eta theta iota"),
      (4L, "dup dup dup dup dup dup"),
      (5L, "FOOTER TEXT HERE"),
      (6L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Dedup.removeBoilerplate(docs, "doc_id", "text",
        chunkTokens = 3, minDocs = 3)
    val m = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) === "alpha beta gamma",
      "the shared chunk dies everywhere, including its first occurrence")
    assert(m(2L) === "delta epsilon zeta")
    assert(m(3L) === "eta theta iota")
    assert(m(4L) === "dup dup dup dup dup dup",
      "repetition inside one document is content, not boilerplate")
    assert(!m.contains(5L), "an all-boilerplate document disappears")
    assert(m.get(6L).contains(null), "NULL text passes through")
    assert(m.size === 5)
  }

  test("dedupChunksWithinDoc trims in-doc repeats, leaves cross-doc repeats alone") {
    val docs2 = Seq(
      (1L, "alpha beta gamma alpha beta gamma alpha beta gamma"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Dedup.dedupChunksWithinDoc(docs2, "doc_id", "text",
        chunkTokens = 3)
    val m = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) === "alpha beta gamma",
      "a thrice-repeated chunk keeps only its first in-doc occurrence")
    assert(m(2L) === "alpha beta gamma delta epsilon zeta",
      "the same chunk in ANOTHER doc is untouched — in-doc scope only")
    assert(m.get(3L).contains(null), "NULL text passes through")
  }

  test("dedupChunksWithinDoc is a pure projection — no exchange in the plan") {
    val docs2 = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val p = Dedup.dedupChunksWithinDoc(docs2, "doc_id", "text", chunkTokens = 2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Window"),
      s"in-doc dedup must not shuffle:\n$p")
  }

  test("removeBoilerplate below minDocs keeps everything intact") {
    val docs = Seq(
      (1L, "FOOTER TEXT HERE alpha beta gamma"),
      (2L, "FOOTER TEXT HERE delta epsilon zeta")
    ).toDF("doc_id", "text")
    val out = Dedup.removeBoilerplate(docs, "doc_id", "text",
        chunkTokens = 3, minDocs = 3)
    assert(rendered(out) === rendered(docs), "2 occurrences < minDocs=3")
  }

  test("nearDupSourceMatrix: canonical source cells with exact pair " +
       "counts") {
    val docs = Seq(
      (1L, "a b c d", "s1"), (2L, "a b c d", "s2"), (3L, "a b c d", "s1"),
      (4L, "x y z q", "s3")
    ).toDF("doc_id", "text", "source")
    val out = Dedup.nearDupSourceMatrix(docs, "doc_id", "text", "source",
        threshold = 0.5)
      .as[(String, String, Long)].collect().toSet
    assert(out === Set(("s1", "s1", 1L), ("s1", "s2", 2L)),
      "within-s1 pair (1,3); cross pairs (1,2),(2,3) fold into one " +
      "canonical (s1,s2) cell; the unique doc appears nowhere")
  }

  test("blockingQuality: completeness vs truth, reduction vs the pair " +
       "space, orientation canonicalized") {
    import graft.operators.Dedup
    val truth = Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")
    // candidates arrive flipped + one dup + one extra pair
    val cand = Seq((2L, 1L), (1L, 2L), (4L, 3L), (5L, 6L))
      .toDF("doc_a", "doc_b")
    val Array(r) = Dedup.blockingQuality(truth, cand, nRows = 6L)
      .as[(Long, Long, Long, Option[Double], Double)].collect()
    assert(r === ((2L, 3L, 2L, Some(1.0), 0.8)),
      s"2/2 truth recalled, 3 of 15 pairs generated -> rr 0.8, got $r")
    // empty truth: completeness NULL, never a divide error
    val Array(r2) = Dedup.blockingQuality(
        truth.limit(0), cand, nRows = 6L)
      .as[(Long, Long, Long, Option[Double], Double)].collect()
    assert(r2._1 === 0L && r2._4.isEmpty)
  }

  test("softDedupWeights: 1/cluster-size weights, singletons keep 1.0") {
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c d"), (5L, "a b c d"),
      (3L, "x y z w")
    ).toDF("doc_id", "text")
    val out = Dedup.softDedupWeights(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    assert(out === Set(
      (1L, 1L, 0.333333333), (2L, 1L, 0.333333333), (5L, 1L, 0.333333333),
      (3L, 3L, 1.0)
    ), "identical docs share the min-id cluster and split one unit of " +
       "weight; the unique doc is its own singleton")
  }
}
