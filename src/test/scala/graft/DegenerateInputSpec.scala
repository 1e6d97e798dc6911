package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** Degenerate-input behavior: empty corpora, empty sides of joins, and
  * single-row inputs must produce empty/identity results — never throw —
  * because at 100 TB a filter chain upstream of any operator can
  * legitimately drain a partition-set to nothing. */
class DegenerateInputSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emptyDocs =
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  private lazy val oneDoc =
    Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
  private lazy val emptyVecs =
    Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
  private lazy val someVecs = Seq(
    (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f))
  ).toDF("vec_id", "embedding")

  test("dedup family: empty and single-doc corpora") {
    assert(Dedup.allPairsJaccard(emptyDocs, "doc_id", "text", 0.8).count() === 0)
    assert(Dedup.allPairsJaccard(oneDoc, "doc_id", "text", 0.8).count() === 0)
    assert(Dedup.containmentJoin(oneDoc, "doc_id", "text", 0.8).count() === 0)
    assert(Dedup.minhashNearDups(emptyDocs, "doc_id", "text").count() === 0)
    assert(Dedup.simhashNearDups(oneDoc, "doc_id", "text").count() === 0)
    assert(Dedup.dedupChunksGlobal(emptyDocs, "doc_id", "text").count() === 0)
    // audit on an empty corpus: zero truth, vacuously passing verdict
    val (truth, ok) = Dedup.minhashRecallAudit(emptyDocs, "doc_id", "text")
      .as[(Long, Boolean)].head()
    assert(truth === 0L && ok)
    // incremental ingest: empty batch stays empty; an empty corpus
    // matches nothing, so the whole batch survives
    assert(Dedup.dedupAgainstCorpus(emptyDocs, oneDoc, "doc_id", "text")
      .count() === 0)
    assert(Dedup.dedupAgainstCorpus(oneDoc, emptyDocs, "doc_id", "text")
      .count() === 1)
    // boilerplate removal: nothing repeats across an empty/1-doc corpus
    assert(Dedup.removeBoilerplate(emptyDocs, "doc_id", "text").count() === 0)
    assert(rendered(Dedup.removeBoilerplate(oneDoc, "doc_id", "text",
      chunkTokens = 2)) === rendered(oneDoc))
  }

  test("incremental substring index: empty corpus, empty batch, empty index") {
    // empty corpus -> empty (but well-formed) index
    val emptyIdx = Dedup.substrIndex(emptyDocs, "doc_id", "text")
    assert(emptyIdx.count() === 0 &&
      emptyIdx.columns.toSeq === Seq("wh1", "wh2"))
    // a doc shorter than n tokens contributes no windows
    assert(Dedup.substrIndex(oneDoc, "doc_id", "text", n = 8).count() === 0)
    val idx = Dedup.substrIndex(oneDoc, "doc_id", "text", n = 3)
    assert(idx.count() === 3, "5 tokens at n=3 -> 3 stride-1 windows")
    // probing an empty batch / against an empty index: no spans, cut
    // passes the batch through whole
    assert(Dedup.substringSpansAgainstIndex(emptyDocs, idx,
      "doc_id", "text", n = 3).count() === 0)
    assert(Dedup.substringSpansAgainstIndex(oneDoc, emptyIdx,
      "doc_id", "text", n = 3).count() === 0)
    val cut = Dedup.scrubAgainstSubstrIndex(oneDoc, emptyIdx,
      "doc_id", "text", n = 3).collect()(0)
    assert(cut.getString(1) === "alpha beta gamma delta epsilon" &&
      cut.getLong(3) === 0L, "empty index cuts nothing")
    // self-probe: every window of the doc is indexed -> fully covered
    val self = Dedup.scrubAgainstSubstrIndex(oneDoc, idx,
      "doc_id", "text", n = 3).collect()(0)
    assert(self.getString(1) === "" && self.getLong(3) === 5L)
  }

  test("clean with scrubEval: empty eval corpus scrubs nothing") {
    val out = CorpusPipeline.clean(oneDoc, minQuality = 0.0,
      scrubEval = Some(emptyDocs), scrubTokens = 3)
    assert(out.count() === 1)
    assert(CorpusPipeline.cleanReport(oneDoc, minQuality = 0.0,
        scrubEval = Some(emptyDocs), scrubTokens = 3)
      .select("outcome").as[String].collect().toSeq === Seq("kept"))
  }

  test("pipeline and mixing: empty corpus flows through whole") {
    assert(CorpusPipeline.clean(emptyDocs).count() === 0)
    assert(CorpusPipeline.cleanReport(emptyDocs).count() === 0)
    val withAux = emptyDocs
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    assert(Mixing.packByBudget(withAux, "source", "doc_id", "n_chars",
      budget = 10L).count() === 0)
    assert(Ngrams.encodeTokens(emptyDocs,
      Seq(("a", 1L)).toDF("tok", "id")).count() === 0)
  }

  test("similarity: empty corpus / empty query sides") {
    assert(Similarity.bruteForceTopK(someVecs, emptyVecs, 1).count() === 0)
    assert(Similarity.cosineNearDups(emptyVecs, 0.9).count() === 0)
    assert(Similarity.semanticDecontaminate(someVecs, emptyVecs).count() === 2,
      "empty eval set decontaminates nothing")
    assert(Similarity.semanticDecontaminate(emptyVecs, someVecs).count() === 0)
  }

  test("joins: empty sides yield empty results, not errors") {
    val emptyIv = Seq.empty[(Long, String, Long, Long)]
      .toDF("rid", "k", "start", "end")
    val oneIv = Seq((1L, "u", 0L, 10L)).toDF("lid", "k", "start", "end")
    assert(Joins.intervalJoin(oneIv, emptyIv, Seq("k"), "lid", "rid").count() === 0)
    assert(Joins.intervalJoin(
      emptyIv.withColumnRenamed("rid", "lid"), oneIv.withColumnRenamed("lid", "rid"),
      Seq("k"), "lid", "rid").count() === 0)
    val emptyEv = Seq.empty[(Long, Long)].toDF("k", "ts")
    val dim = Seq((1L, 5L)).toDF("k", "ts")
    assert(Joins.asofJoin(emptyEv, dim, "k", "ts", "ts", Seq("ts")).count() === 0)
  }

  test("profiling: drift between an empty and a non-empty snapshot") {
    val a = Seq("x", "y").toDF("src")
    val empty = Seq.empty[String].toDF("src")
    val rows = Profiling.distributionDrift(a, empty, "src")
      .as[(String, Long, Long, Double, Double, Double)].collect()
    assert(rows.length === 2 && rows.forall(_._3 == 0L),
      "every key finite via smoothing even with a zero-count side")
  }

  test("heavy hitters: empty frames and all-null keys yield empty, not errors") {
    val empty = Seq.empty[(String, String)].toDF("g", "k")
    assert(Profiling.heavyHitters(empty, "k", k = 3).count() === 0)
    assert(Profiling.heavyHittersByGroup(empty, "g", "k", k = 3).count() === 0)
    val allNull = Seq(("g", null.asInstanceOf[String])).toDF("g", "k")
    assert(Profiling.heavyHitters(allNull, "k", k = 3).count() === 0)
    assert(Profiling.heavyHittersByGroup(allNull, "g", "k", k = 3).count() === 0)
  }

  test("connectedComponents maxIter exhaustion: strict throws, default " +
       "warns and returns partial labels") {
    // 40-node path graph: the initial min(id, neighbor) fold plus ONE
    // propagate+halve round cannot finish a diameter-39 chain, so
    // maxIter = 1 exhausts with labels still moving
    val chain = (0L until 39L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIter = 1, strict = true)
    }
    assert(e.getMessage.contains("NOT converged"))
    // non-strict keeps the exploratory behavior: labels come back (all
    // 40 ids present) even though they are not a fixpoint yet
    val partial = Dedup.connectedComponents(chain, maxIter = 1)
    assert(partial.count() === 40L)
    // and enough iterations converge the same chain to one component
    val full = Dedup.connectedComponents(chain, maxIter = 25, strict = true)
    assert(full.select("comp").distinct().count() === 1L)
  }

  test("r10 operators: empty and single-row inputs flow through") {
    // APSS cosine / SNM on empty and singleton corpora
    assert(Dedup.allPairsCosine(emptyDocs, "doc_id", "text", 0.8)
      .count() === 0)
    assert(Dedup.allPairsCosine(oneDoc, "doc_id", "text", 0.8)
      .count() === 0)
    assert(Dedup.sortedNeighborhood(emptyDocs, "doc_id", "text",
      lit("b"), col("doc_id"), window = 2).count() === 0)
    assert(Dedup.sortedNeighborhood(oneDoc, "doc_id", "text",
      lit("b"), col("doc_id"), window = 2).count() === 0)
    // phrase search: empty corpus; phrase longer than every doc; and the
    // empty-phrase contract must throw, not return garbage
    assert(Search.phraseSearch(emptyDocs, Seq("a", "b")).count() === 0)
    assert(Search.phraseSearch(oneDoc,
      (1 to 9).map(i => s"w$i")).count() === 0)
    intercept[IllegalArgumentException] {
      Search.phraseSearch(oneDoc, Seq.empty)
    }
    // collocations / DSIR weights on empty and sub-bigram corpora
    assert(Ngrams.collocations(emptyDocs).count() === 0)
    assert(Ngrams.collocations(
      Seq((1L, "solo")).toDF("doc_id", "text")).count() === 0)
    assert(Ngrams.importanceWeights(emptyDocs, lit(true)).count() === 0)
    // all-target / no-target degenerate splits still produce weights
    assert(Ngrams.importanceWeights(oneDoc, lit(true)).count() === 1)
    assert(Ngrams.importanceWeights(oneDoc, lit(false)).count() === 1)
    // hard negatives: empty corpus, empty anchors, single-label corpus
    val labeled = someVecs.withColumn("label", lit("only"))
    assert(Similarity.hardNegatives(labeled,
      labeled.limit(0), 3).count() === 0, "no anchors")
    assert(Similarity.hardNegatives(labeled, labeled, 3).count() === 0,
      "a single-label corpus has no negatives")
    // label propagation: empty edges, self-loop-only edges
    assert(Graphs.labelPropagation(
      Seq.empty[(Long, Long)].toDF("src", "dst"), "src", "dst")
      .count() === 0)
    assert(Graphs.labelPropagation(
      Seq((7L, 7L)).toDF("src", "dst"), "src", "dst").count() === 0,
      "self-loops drop; no nodes remain")
    // attribution: no conversions; conversions with no touches at all
    val noConv = Seq((1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"),
      1L, "click", 0.0)).toDF("event_id", "ts", "user_id", "event_type",
      "value")
    assert(EventOps.attribution(noConv, Seq("click"), "purchase")
      .count() === 0)
  }

  test("late-r10 operators: empty and sub-threshold inputs flow through") {
    // winnow: empty corpus; doc shorter than one k-gram; doc with
    // k-grams but fewer than one full window
    assert(Ngrams.winnow(emptyDocs).count() === 0)
    assert(Ngrams.winnow(Seq((1L, "a b")).toDF("doc_id", "text"))
      .count() === 0, "no k-gram fits")
    assert(Ngrams.winnow(oneDoc, k = 3, w = 4).count() === 0,
      "5 tokens = 3 grams < one w=4 window")
    // chi2 / ppmi / lexical diversity on empty corpora
    val emptyLang = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "lang", "text")
    assert(Ngrams.chiSquareTerms(emptyLang).count() === 0)
    assert(Ngrams.chiSquareTerms(
      Seq((1L, "en", "a a b")).toDF("doc_id", "lang", "text"), minDf = 1L)
      .count() === 0, "single-class corpus: nc = N filters every row")
    assert(Ngrams.ppmiCooc(emptyDocs, minCount = 1L).count() === 0)
    assert(Ngrams.ppmiCooc(Seq((1L, "solo")).toDF("doc_id", "text"),
      minCount = 1L).count() === 0, "one token has no context")
    val emptySrc = Seq.empty[(String, String)].toDF("source", "text")
    assert(Ngrams.lexicalDiversity(emptySrc).count() === 0)
    // quantile-boundary family: empty inputs mean empty boundary rows —
    // the broadcast side is empty, results must be empty, not a crash
    assert(Mixing.lengthBuckets(emptyDocs).count() === 0)
    assert(Profiling.winsorize(emptySrc.withColumn("n", lit(1L)),
      "source", "n").count() === 0)
    val emptyEvents = Seq.empty[(Long, java.sql.Timestamp, Double, String)]
      .toDF("user_id", "ts", "value", "event_type")
    assert(EventOps.rfmSegments(emptyEvents).count() === 0)
    assert(EventOps.frequentPairs(emptyEvents).count() === 0)
    // single-user / single-item basket: no pair to emit
    assert(EventOps.frequentPairs(
      Seq((1L, "A"), (1L, "A")).toDF("user_id", "event_type"),
      minSupport = 1L).count() === 0)
    // single-row quantile families: every boundary collapses to the
    // value itself -> one bucket / all scores 1, never a crash
    assert(Mixing.lengthBuckets(oneDoc).count() === 1)
    val oneUser = Seq((1L,
      java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), 2.5))
      .toDF("user_id", "ts", "value")
    assert(EventOps.rfmSegments(oneUser)
      .select("r_score", "f_score", "m_score")
      .as[(Long, Long, Long)].head() === ((1L, 1L, 1L)))
    // kNN graph: empty corpus and a single vector (no candidate pairs)
    assert(Similarity.knnGraph(emptyVecs, 3).count() === 0)
    assert(Similarity.knnGraph(someVecs.limit(1), 3).count() === 0)
    assert(Similarity.mutualKnnGraph(emptyVecs, 3).count() === 0)
    OpCaches.release()
    // association/profile aggregates on empty or all-null frames
    val nullPairs = Seq((null.asInstanceOf[String],
      null.asInstanceOf[String])).toDF("lang", "source")
    assert(Profiling.mutualInformation(nullPairs, "lang", "source")
      .count() === 0, "all-NULL cells contribute nothing")
    val emptyEv = Seq.empty[(Long, java.sql.Timestamp, Double)]
      .toDF("user_id", "ts", "value")
    assert(EventOps.timeProfile(emptyEv).count() === 0)
  }

  test("audit-batch operators: empty, single-row and all-NULL inputs " +
       "flow through") {
    val emptySrc = Seq.empty[(String, Option[Long])].toDF("src", "v")
    assert(Profiling.gini(emptySrc, "src", "v").count() === 0)
    // single row: rank formula gives (2·1·x − 2x)/(1·x) = 0
    assert(Profiling.gini(Seq(("s", 5L)).toDF("src", "v"), "src", "v")
      .select("gini").as[Double].head() === 0.0)
    assert(Profiling.cohenKappa(emptySrc, "src",
      col("v") > 1, col("v") > 2).count() === 0)
    assert(Profiling.iqrOutliers(emptySrc, "src", "v").count() === 0)
    val one = Profiling.iqrOutliers(Seq(("s", 5L)).toDF("src", "v"),
      "src", "v").select("n", "n_low", "n_high")
      .as[(Long, Long, Long)].head()
    assert(one === ((1L, 0L, 0L)), "one row is its own quartiles")
    assert(Profiling.cmsCheckedCounts(emptySrc, "v").count() === 0)
    assert(Profiling.equiWidthHistogram(emptySrc, "v", 10.0).count() === 0)
    assert(Ngrams.zipfSlope(emptyDocs).count() === 1,
      "the fit row survives with n_types=0, slope NULL")
    assert(Ngrams.zipfSlope(emptyDocs)
      .select("slope").as[Option[Double]].head().isEmpty)
    val noText = Seq.empty[(String, String)].toDF("src", "text")
    assert(TextAnalysis.readability(noText, "src").count() === 0)
    assert(TextAnalysis.readability(
      Seq(("s", null.asInstanceOf[String])).toDF("src", "text"), "src")
      .count() === 0, "all-NULL text drops before the group")
    assert(Mixing.hashSample(emptySrc, "src", "v", 3).count() === 0)
    val emptyEdges = Seq.empty[(Option[Long], Option[Long])].toDF("s", "d")
    assert(Graphs.degreeHistogram(emptyEdges, "s", "d").count() === 0)
    val emptyEv4 = Seq.empty[(Long, java.sql.Timestamp, Long, String)]
      .toDF("event_id", "ts", "user_id", "event_type")
    assert(EventOps.transitionEntropy(emptyEv4).count() === 0)
    assert(EventOps.sequencePatterns(emptyEv4).count() === 0)
    // a 2-event stream emits no triple; a 1-event stream no pair
    val short = Seq(
      (1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), 1L, "A"),
      (2L, java.sql.Timestamp.valueOf("2026-01-01 00:01:00"), 1L, "B"))
      .toDF("event_id", "ts", "user_id", "event_type")
    assert(EventOps.sequencePatterns(short, minSupport = 1L).count() === 0)
    assert(EventOps.transitionEntropy(short)
      .select("entropy").as[Double].head() === 0.0,
      "a single observed transition is a rail")
    // audience overlap / conversion on empty or touch-free streams
    assert(EventOps.audienceOverlap(emptyEv4).count() === 0)
    val noTouch = Seq(
      (1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), 1L,
        "purchase")).toDF("event_id", "ts", "user_id", "event_type")
    val Array(ttc) = EventOps.timeToConvert(noTouch, "view", "purchase")
      .select("n_touched", "n_converted", "conv_rate")
      .as[(Long, Long, Option[Double])].collect()
    assert(ttc === ((0L, 0L, None)),
      "an untouched stream reports (rate NULL), not throws")
    // chi2 on a single observed cell: dof 0, statistic 0
    val oneCell = Seq(("x", "p"), ("x", "p")).toDF("a", "b")
    assert(Profiling.chi2Independence(oneCell, "a", "b")
      .select("dof", "chi2").as[(Long, Double)].head() === ((0L, 0.0)))
    assert(Profiling.chi2Independence(
      Seq.empty[(String, String)].toDF("a", "b"), "a", "b")
      .select("n_cells").as[Long].head() === 0L)
    // FK audit against an EMPTY parent: every non-null key orphans
    val ch = Seq(Some(1L), Some(1L), None).toDF("fk")
    val noParent = Seq.empty[Tuple1[Long]].toDF("pk")
    assert(Profiling.refIntegrity(ch, "fk", noParent, "pk", "r")
      .select("n_child", "n_null_keys", "n_orphan_rows", "n_orphan_keys")
      .as[(Long, Long, Long, Long)].head() === ((3L, 1L, 2L, 1L)))
  }

  test("trend/interval/robust-stat operators: empty and single-row " +
       "inputs flow through") {
    val emptyEv4 = Seq.empty[(Long, java.sql.Timestamp, Long, String)]
      .toDF("event_id", "ts", "user_id", "event_type")
    assert(EventOps.debounce(emptyEv4, 1000L).count() === 0)
    val noIv = Seq.empty[(Long, java.sql.Timestamp, java.sql.Timestamp)]
      .toDF("k", "s_ts", "e_ts")
    assert(EventOps.coalesceIntervals(noIv, "k", "s_ts", "e_ts")
      .count() === 0)
    val oneIv = Seq((1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"),
      java.sql.Timestamp.valueOf("2026-01-01 00:01:00")))
      .toDF("k", "s_ts", "e_ts")
    assert(EventOps.coalesceIntervals(oneIv, "k", "s_ts", "e_ts")
      .select("island", "n_merged").as[(Long, Long)].head() === ((1L, 1L)))
    val emptyGV = Seq.empty[(String, Option[Double])].toDF("g", "v")
    assert(Profiling.madOutliers(emptyGV, "g", "v").count() === 0)
    // one row: median = the value, MAD 0, zero outliers
    assert(Profiling.madOutliers(Seq(("g", 4.0)).toDF("g", "v"), "g", "v")
      .select("n", "n_outliers", "median", "mad")
      .as[(Long, Long, Double, Double)].head() === ((1L, 0L, 4.0, 0.0)))
    assert(Profiling.groupedTrend(
      Seq.empty[(String, Long, Long)].toDF("g", "x0", "y0"),
      "g", "x0", "y0").count() === 0)
    // loglogFit's global aggregate keeps its one row with a NULL slope
    assert(Profiling.loglogFit(emptyGV.withColumnRenamed("v", "y0")
        .withColumn("x0", lit(1.0)), "x0", "y0")
      .select("n_points").as[Long].head() === 0L)
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graphs.clusteringCoefficient(noEdges, "src", "dst")
      .count() === 0)
    OpCaches.release()
  }

  test("wave-3 operators: empty, all-null and single-row inputs flow " +
       "through") {
    val emptyEv4 = Seq.empty[(Long, java.sql.Timestamp, Long, String)]
      .toDF("event_id", "ts", "user_id", "event_type")
    assert(EventOps.streakHistogram(emptyEv4).count() === 0)
    assert(EventOps.topPaths(emptyEv4).count() === 0)
    assert(EventOps.audienceOverlap(emptyEv4).count() === 0)
    // abTest on an empty stream: one report row, all-zero arms, NULL z
    val ab = EventOps.abTest(emptyEv4,
      org.apache.spark.sql.functions.pmod(col("user_id"),
        lit(2)) === 1, "purchase")
      .select("n_a", "n_b", "z")
      .as[(Long, Long, Option[Double])].head()
    assert(ab === ((0L, 0L, None)))
    // weighted priority sample: zero/negative/null weights all drop
    val wdf = Seq(("s", 1L, Some(0L)), ("s", 2L, Some(-3L)),
      ("s", 3L, Option.empty[Long]), ("s", 4L, Some(5L)))
      .toDF("src", "id", "w")
    val kept = operators.Mixing
      .weightedPrioritySample(wdf, "src", "id", "w", k = 10)
      .select("id").as[Long].collect().toSet
    assert(kept === Set(4L))
    assert(operators.Mixing.weightedPrioritySample(
      Seq.empty[(String, Long, Long)].toDF("src", "id", "w"),
      "src", "id", "w", 3).count() === 0)
    // reconcile: no parents -> zero-row census is the right answer? No:
    // the one-row report with zero counts (global aggregate semantics)
    val noP = Seq.empty[(Long, Double)].toDF("pk", "total")
    val noC = Seq.empty[(Long, Double)].toDF("fk", "amount")
    assert(Profiling.reconcile(noP, "pk", "total", noC, "fk", "amount")
      .select("n_parents", "n_mismatched")
      .as[(Long, Long)].head() === ((0L, 0L)))
    // wave 4/5: empty corpora flow through the curve/coverage ops
    assert(EventOps.survivalCurve(emptyEv4).count() === 0)
    assert(EventOps.bounceRate(
      emptyEv4.withColumn("value", lit(1.0)), 1000L).count() === 0)
    assert(EventOps.peakConcurrency(
      Seq.empty[(Long, Long)].toDF("start_us", "end_us")).count() === 0)
    // inverted/empty intervals drop rather than emit negative spans
    assert(EventOps.peakConcurrency(
      Seq((100L, 100L), (200L, 100L)).toDF("start_us", "end_us"))
      .count() === 0)
    // an end EXACTLY on a late-epoch day boundary stays half-open:
    // one fragment on its own day, no phantom (day+1, peak 0) row
    // (IEEE double division of (e-1)/usDay would round up here)
    val usDay = 86400000000L
    val kDay = 20000L
    assert(EventOps.peakConcurrency(
      Seq((kDay * usDay + 100L, (kDay + 1L) * usDay))
        .toDF("start_us", "end_us"))
      .as[(Long, Long)].collect().toSeq === Seq((kDay, 1L)))
    assert(EventOps.cohortLtv(emptyEv4.withColumn("value", lit(1.0)))
      .count() === 0)
    val noW = Seq.empty[(String, Option[Long])].toDF("g", "w")
    assert(Profiling.paretoCoverage(noW, "g", "w").count() === 0,
      "no groups -> no coverage row (nothing to cover)")
    // all-zero weights: nothing to cover -> share NULL, never a
    // DIVIDE_BY_ZERO throw under ANSI mode
    val zeroW = Seq(("a", 0L), ("b", 0L)).toDF("g", "w")
    assert(Profiling.paretoCoverage(zeroW, "g", "w")
      .select("share").as[Option[Double]].collect().forall(_.isEmpty),
      "zero total weight reports NULL share, not a throw")
    // single-user survival: one row at age 0, rate 1
    val one = Seq((1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"),
      7L, "e")).toDF("event_id", "ts", "user_id", "event_type")
    assert(EventOps.survivalCurve(one)
      .as[(Long, Long, Double)].head() === ((0L, 1L, 1.0)))
  }

  test("round-11 operators: empty and degenerate inputs flow through") {
    import graft.operators.{Mixing, Ngrams, Similarity}
    val emptyEv = Seq.empty[(Long, java.sql.Timestamp, Long, String,
        Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(EventOps.ohlcBars(emptyEv).count() === 0)
    assert(EventOps.nextEventHitRate(emptyEv).count() === 0)
    assert(EventOps.linearAttribution(emptyEv, Seq("a"), "c")
      .count() === 0)
    assert(EventOps.churnLabels(emptyEv,
      java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), 7).count() === 0)
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    // heapsLaw on an empty corpus: the checkpoint spine survives a NULL
    // max id — 20 all-zero rows, never a throw
    val hl = Ngrams.heapsLaw(emptyDocs, checkpoints = 20)
      .as[(Long, Long, Long, Long)].collect()
    assert(hl.length === 20 && hl.forall(r => r._2 == 0 && r._4 == 0))
    assert(Ngrams.logLikelihoodCollocations(emptyDocs).count() === 0)
    val emptySV = Seq.empty[(Double, Boolean)].toDF("score", "label")
    assert(Profiling.calibration(emptySV, "score", "label").count() === 0)
    assert(Profiling.thresholdForPrecision(emptySV, "score", "label",
      5000).count() === 0)
    val emptyGW = Seq.empty[(String, Double)].toDF("g", "v")
    assert(Profiling.weightedPercentiles(emptyGW, "g", "v", "v")
      .count() === 0)
    // Neyman on an all-constant corpus: zero variance everywhere means
    // nothing to allocate — all-zero allocs, never remainder spraying
    val flat = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0)).toDF("g", "v")
    assert(Mixing.neymanAllocation(flat, "g", "v", 10L)
      .select("alloc").as[Long].collect().forall(_ === 0L))
    assert(Mixing.neymanAllocation(emptyGW, "g", "v", 10L).count() === 0)
    assert(Mixing.negativeSample(
      Seq.empty[(Long, Long)].toDF("u", "i"), "u", "i", 2).count() === 0)
    assert(Mixing.interleaveSources(
      Seq.empty[(Long, String)].toDF("doc_id", "source"),
      "source", "doc_id").count() === 0)
    val emptyVec = Seq.empty[(Long, Array[Float])]
      .toDF("vec_id", "embedding")
    assert(Similarity.embedCovariance(emptyVec).count() === 0)
    assert(Similarity.dimVariance(emptyVec).count() === 0)
    val emptyPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val Array(bq) = graft.operators.Dedup.blockingQuality(
        emptyPairs, emptyPairs, nRows = 5L)
      .as[(Long, Long, Long, Option[Double], Double)].collect()
    assert(bq === ((0L, 0L, 0L, None, 1.0)))
  }

  test("unigram Viterbi word-length cap: a single 100kB whitespace-free " +
       "blob trains/segments/encodes without building the lattice") {
    import graft.operators.Ngrams
    // one normal doc + one document that is a single 100,000-char word
    // (a minified-JS/base64-style blob): without the cap the DP would
    // allocate O(len^2) ≈ 10 GB of path state inside one projection —
    // completing at all IS the assertion; the blob must come back
    // unsegmentable (NULL pieces / one OOV id), same as an OOV word
    val blob = "ab" * 50000
    val docs = Seq((1L, "alpha beta alpha"), (2L, blob))
      .toDF("doc_id", "text")
    Ngrams.clearUnigramCache()
    val vocab = Ngrams.unigramTrain(docs, vocabSize = 8, maxPieceLen = 2,
      rounds = 1, seedSize = 4)
    assert(vocab.count() > 0, "training survives the blob")
    val seg = Ngrams.unigramSegmentWithVocab(docs, vocab,
      maxPieceLen = 2)
    val segRows = seg.collect().map(r =>
      r.getString(0) -> Option(r.get(3))).toMap
    assert(segRows(blob).isEmpty, "past-cap word segments to NULL pieces")
    assert(segRows("alpha").nonEmpty, "normal words still segment")
    val enc = Ngrams.unigramEncodeWithVocab(docs, vocab, maxPieceLen = 2,
      oovId = 0L)
    val blobIds = enc.filter(col("doc_id") === 2)
      .select("token_ids").as[String].head()
    assert(blobIds === "0", "past-cap word encodes as ONE OOV id")
    Ngrams.clearUnigramCache()
    // BPE replay chain on the same blob: O(k·len) with O(len) live
    // state — no lattice, so no cap needed; it must complete and
    // segment the blob fully (25k 'abab' symbols here)
    val merges = Seq(("a", "b"), ("ab", "ab"))
    val bseg = Ngrams.bpeSegmentWithMerges(docs, merges)
      .filter(col("word") === blob)
      .select("n_syms").as[Long].head()
    assert(bseg === 25000L, "chained replace replays linearly on a blob")
    val bvocab = Seq(("abab", 1L)).toDF("sym", "id")
    val benc = Ngrams.bpeEncodeWithMerges(docs.filter(col("doc_id") === 2),
      merges, bvocab)
    assert(benc.select("n_ids").as[Long].head() === 25000L)
  }
}
