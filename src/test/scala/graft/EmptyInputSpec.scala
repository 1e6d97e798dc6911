package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators._

/** Degenerate-input robustness: every operator must return an empty (or
  * correctly-shaped) result on an empty corpus rather than throwing —
  * at 100 TB, empty partitions, empty sources after pruning, and empty
  * filter results are everyday inputs, not edge cases. */
class EmptyInputSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val noDocs =
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  private lazy val noEvents =
    Seq.empty[(Long, Timestamp, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value")
  private lazy val noVecs =
    Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")

  private def assertEmpty(df: DataFrame): Unit =
    assert(df.count() === 0)

  test("dedup family returns empty on an empty corpus") {
    assertEmpty(Dedup.exactDedup(noDocs, Seq("text")))
    assertEmpty(Dedup.minhashNearDups(noDocs, "doc_id", "text"))
    assertEmpty(Dedup.simhashNearDups(noDocs, "doc_id", "text"))
    assertEmpty(Dedup.dedupChunksGlobal(noDocs, "doc_id", "text"))
    assertEmpty(Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")))
  }

  test("text analysis, ngrams, mixing and profiling handle empty input") {
    assertEmpty(TextAnalysis.analyze(noDocs))
    assertEmpty(Ngrams.vocabulary(noDocs))
    assertEmpty(Ngrams.unigramLogProb(noDocs))
    assertEmpty(Mixing.capPerGroup(noDocs, Seq(col("text")),
      Seq(col("doc_id")), 3))
    assertEmpty(Mixing.deterministicSplit(noDocs, "doc_id",
      Seq("train" -> 90, "val" -> 5, "test" -> 5)))
    assertEmpty(Profiling.keySkew(noDocs, "text"))
    // profile emits one row PER PROFILED COLUMN even over zero rows
    val p = Profiling.profile(noDocs, Seq("doc_id", "text"))
      .select("col_name", "n_rows").as[(String, Long)].collect().toMap
    assert(p === Map("doc_id" -> 0L, "text" -> 0L))
  }

  test("events and similarity operators handle empty input") {
    assertEmpty(EventOps.sessionizeBatch(
      noEvents.select("user_id", "ts", "value"), gapMs = 1000L))
    assertEmpty(EventOps.funnel(noEvents, "click", "purchase", 1000000L))
    assertEmpty(EventOps.hourlyRollup(noEvents))
    assertEmpty(Similarity.bruteForceTopK(noVecs, noVecs, 5))
    assertEmpty(Similarity.cosineNearDups(noVecs, 0.9))
  }

  test("round-7 operators handle empty input") {
    assertEmpty(Joins.fuzzyJoin(
      noDocs.toDF("id", "s"), noDocs.toDF("id", "s"), "id", "s", "id", "s"))
    assertEmpty(Ngrams.bigramLogProb(noDocs))
    assertEmpty(Ngrams.bpeTrain(noDocs, numMerges = 3))
    assertEmpty(Ngrams.bpeSegment(noDocs, numMerges = 3))
    assertEmpty(Ngrams.bpePairStats(noDocs))
    assertEmpty(Dedup.dedupSubstrings(noDocs, "doc_id", "text"))
    assertEmpty(Dedup.substringDupSpans(noDocs, "doc_id", "text"))
    assertEmpty(Dedup.removeSubstringDups(noDocs, "doc_id", "text"))
    assertEmpty(Dedup.substringContamSpans(noDocs, noDocs,
      "doc_id", "text"))
    assertEmpty(Dedup.scrubContamSpans(noDocs, noDocs, "doc_id", "text"))
    graft.operators.OpCaches.release()
    // ksTwoSample keeps its one-row shape with zero totals
    val ks = Profiling.ksTwoSample(
      noDocs.select(col("doc_id").as("v")),
      noDocs.select(col("doc_id").as("v")), "v")
    assert(ks.count() === 0 || {
      val r = ks.collect()(0); r.isNullAt(0) || r.getLong(0) === 0L
    })
    // validate over zero rows: every rule passes with zero violations
    val v = Profiling.validate(noDocs,
      Seq(Profiling.NotNull("doc_id"), Profiling.Unique("doc_id")))
      .select("violations", "passed").as[(Long, Boolean)].collect()
    assert(v.toSeq === Seq((0L, true), (0L, true)))
  }

  test("round-9 operators handle empty and degenerate input") {
    val noWeighted = Seq.empty[(Long, String, Long)]
      .toDF("doc_id", "source", "n_chars")
    assertEmpty(Mixing.packContiguous(noWeighted, "source", "doc_id",
      "n_chars", budget = 4L))
    // all-zero weights: no spans, not a divide-by-zero
    assertEmpty(Mixing.packContiguous(
      Seq((1L, "g", 0L), (2L, "g", 0L)).toDF("doc_id", "source", "n_chars"),
      "source", "doc_id", "n_chars", budget = 4L))
    assertEmpty(TextAnalysis.maskTokens(noDocs, maskPct = 15))
    // empty merge list = pure char segmentation, not an error
    val seg = Ngrams.bpeSegmentWithMerges(
      Seq((1L, "ab")).toDF("doc_id", "text"), Seq.empty)
      .as[(String, Long, Long, String)].collect().toSeq
    assert(seg === Seq(("ab", 1L, 2L, "a b")))
    assertEmpty(Ngrams.bpeSegmentWithMerges(noDocs, Seq(("a", "b"))))
    // empty predict batch against a real model: empty, shaped output
    val train = Seq((1L, "a", "tok")).toDF("doc_id", "label", "text")
    val (model, priors) = TextAnalysis.nbTrain(train, "label", "text")
    assertEmpty(TextAnalysis.nbPredict(noDocs, model, priors, "text"))
    graft.operators.OpCaches.release()
    assertEmpty(EventOps.gapStats(noEvents))
    // single event per user: no consecutive pair, no gap row
    assertEmpty(EventOps.gapStats(
      Seq((1L, new Timestamp(0L), 10L, "A", 1.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")))
    assertEmpty(Mixing.epochShuffle(noDocs.select("doc_id"), "doc_id", 1L))
    assertEmpty(Mixing.materializeExamples(
      Seq.empty[(String, Long, Long, Long, Long)]
        .toDF("source", "example", "doc_id", "tok_start", "tok_end"),
      Seq.empty[(Long, String)].toDF("doc_id", "token_ids"),
      "doc_id", "source"))
    // covariance over zero rows keeps its one-row aggregate shape with
    // n = 0 and NULL moment sums (SQL SUM-over-empty), matching DuckDB
    val cov = Profiling.covarianceExact(
      Seq.empty[(Long, Long)].toDF("x", "y"), "x", "y").collect()(0)
    assert(cov.getLong(0) === 0L && cov.isNullAt(1) && cov.isNullAt(3))
    assertEmpty(Profiling.covarianceExactBy(
      Seq.empty[(String, Long, Long)].toDF("g", "x", "y"),
      Seq("g"), "x", "y"))
    assertEmpty(Profiling.kAnonymityViolations(noDocs, Seq("text"), 2L))
    assertEmpty(TextAnalysis.piiStats(noDocs))
  }

  test("round-14 operators handle empty and degenerate input") {
    assertEmpty(EventOps.changepoint(noEvents))
    // one bucket per series: no interior split, empty — not a crash
    assertEmpty(EventOps.changepoint(
      Seq((1L, new Timestamp(0L), 10L, "A", 1.0),
          (2L, new Timestamp(1L), 11L, "A", 2.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")))
    assertEmpty(Ngrams.textRank(noDocs))
    // single-token docs have no adjacent pair: empty graph, empty ranks
    assertEmpty(Ngrams.textRank(
      Seq((1L, "solo"), (2L, "alone")).toDF("doc_id", "text")))
    assertEmpty(Graphs.pageRankWeighted(
      Seq.empty[(Long, Long, Long)].toDF("src", "dst", "w"),
      "src", "dst", "w"))
    assertEmpty(Graphs.hits(
      Seq.empty[(Long, Long)].toDF("src", "dst"), "src", "dst"))
    val noVals = Seq.empty[(String, Double)].toDF("grp", "v")
    assertEmpty(Profiling.wasserstein1(noVals, noVals, "grp", "v"))
    assertEmpty(Profiling.mannWhitney(noVals, noVals, "grp", "v"))
    graft.operators.OpCaches.release()
  }

  test("round-15 operators handle empty and degenerate input") {
    assertEmpty(EventOps.saxMotifs(noEvents, breaks = Seq(1.0)))
    // a series shorter than wordLen has no complete sliding window:
    // it drops from the report instead of emitting a padded word
    assertEmpty(EventOps.saxMotifs(
      Seq((1L, new Timestamp(0L), 10L, "A", 1.0),
          (2L, new Timestamp(1L), 11L, "A", 2.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value"),
      breaks = Seq(1.5), segments = 64, wordLen = 4))
    assertEmpty(Graphs.hitsWeighted(
      Seq.empty[(Long, Long, Long)].toDF("src", "dst", "w"),
      "src", "dst", "w"))
    assertEmpty(EventOps.changepointFromHourly(
      Seq.empty[(String, Timestamp, Long)]
        .toDF("event_type", "bucket_ts", "cnt")))
    // streaming monitor parity seam on a one-bucket series: no interior
    // split point, empty — the batch changepoint contract
    assertEmpty(EventOps.changepointFromHourly(
      Seq(("A", new Timestamp(0L), 5L))
        .toDF("event_type", "bucket_ts", "cnt")))
    // an empty corpus seeds zero k-means centroids: semDedup flows
    // through empty, and the recall audit reports the vacuous pass
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assertEmpty(Similarity.semDedup(noVecs, 0.9, nlist = 4))
    val (t15, ok15) = Similarity.semDedupRecallAudit(noVecs, 0.9, nlist = 4)
      .as[(Long, Boolean)].head()
    assert(t15 === 0L && ok15)
    graft.operators.OpCaches.release()
  }

  test("the r16 batch handles empty input: bootstrap/fleiss/rank-eval/" +
       "ewma/bfs/span-corrupt return empty; logreg raises its " +
       "documented empty-corpus require") {
    assertEmpty(Profiling.bootstrapCI(
      Seq.empty[(String, Long, Double)].toDF("g", "k", "v"), "g", "k", "v"))
    // fleissKappa is a GLOBAL one-row report: empty input yields the
    // zero row with the undefined statistics NULL, like q_auc's shape
    val fk = Profiling.fleissKappa(
        Seq.empty[(Long, Long, Long)].toDF("i", "r", "c"), "i", "r", "c")
      .as[(Long, Long, Option[Double], Option[Double], Option[Double])]
      .head()
    assert(fk === ((0L, 0L, None, None, None)))
    assertEmpty(Search.rankEval(
      Seq.empty[(String, Long, Int)].toDF("query_id", "doc_id", "rank"),
      Seq.empty[(String, Long, Long)].toDF("query_id", "doc_id", "rel"),
      k = 10))
    assertEmpty(EventOps.ewmaSmooth(
      Seq.empty[(String, Long, Double)].toDF("s", "t", "v"), "s", "t", "v"))
    assertEmpty(Graphs.bfsDistances(
      Seq.empty[(Long, Long)].toDF("src", "dst"), "src", "dst",
      Seq.empty[Long].toDF("seed"), "seed", maxHops = 2))
    // empty edges but non-empty seeds: the seeds still report dist 0
    assert(Graphs.bfsDistances(
      Seq.empty[(Long, Long)].toDF("src", "dst"), "src", "dst",
      Seq(5L).toDF("seed"), "seed", maxHops = 2).count() === 1)
    assertEmpty(Ngrams.spanCorrupt(
      Seq.empty[(Long, Array[Long])].toDF("doc_id", "token_ids")))
    assertEmpty(TextAnalysis.logregScore(
      Seq.empty[(Long, String)].toDF("doc_id", "text"),
      Seq(0L, 0L, 0L, 0L)))
    intercept[IllegalArgumentException] {
      TextAnalysis.logregTrain(
        Seq.empty[(Long, String, Boolean)].toDF("doc_id", "text", "y"),
        col("y"))
    }
  }
}
