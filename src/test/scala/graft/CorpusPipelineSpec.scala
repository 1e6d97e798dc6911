package graft

import org.apache.spark.sql.functions._

import graft.operators.CorpusPipeline

class CorpusPipelineSpec extends SparkTestBase {
  import spark.implicits._

  test("clean: exact dups collapse, near-dups drop larger id, PII masked") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
      (3L, "the quick brown fox jumps over the lazy dog near the river bank"),        // near dup of 1
      (4L, "a completely different story about email john@example.com and shuffles here today"),
      (5L, "12 34 !!") // no letters, tiny → quality ≈ 0.18, under the floor
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.clean(docs, minQuality = 0.3,
        jaccardThreshold = 0.5)
      .as[(Long, String)].collect().toMap
    assert(out.keySet === Set(1L, 4L),
      "doc 2 exact-dup, doc 3 near-dup, doc 5 low-quality must all drop")
    assert(out(4L).contains("<EMAIL>"), "redaction applies to survivors")
    assert(!out(4L).contains("@"))
  }

  test("clean with transitive=true collapses a near-dup chain to one doc") {
    // 1 ≈ 2 ≈ 3 form a chain (1 vs 3 differ by two words — below the 0.5
    // pairwise threshold via 2); transitive closure keeps only doc 1
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today now"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (3L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (4L, "a completely different unrelated document about spark internals")
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.clean(docs, jaccardThreshold = 0.5,
        transitive = true)
      .select("doc_id").as[Long].collect().toSet
    assert(out === Set(1L, 4L))
  }

  test("clean with normalize + chunk dedup: case noise collapses, boilerplate dies") {
    val boiler = "subscribe to our newsletter for updates every single day ok"
    val docs = Seq(
      (1L, "The Quick Brown Fox jumps over the lazy dog near the river!!"),
      (2L, "the quick brown fox Jumps over the Lazy Dog near the river"), // exact dup after normalize
      (3L, s"$boiler unique content about mountain hiking trails and gear advice here"),
      (4L, s"$boiler another unrelated essay on deep sea creatures and their habits")
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.clean(docs, minQuality = 0.2,
        jaccardThreshold = 0.5, normalize = true,
        chunkDedupTokens = Some(10))
      .as[(Long, String)].collect().toMap
    assert(out.keySet === Set(1L, 3L, 4L),
      "doc 2 must collapse into doc 1 once case/punctuation normalize away")
    assert(out(3L).startsWith(boiler), "first occurrence keeps the boilerplate")
    assert(!out(4L).contains("subscribe"),
      "doc 4's copy of the boilerplate chunk must be stripped")
  }

  test("clean with intra-doc trim + boilerplate kill runs the full text-surgery ladder") {
    val docs = Seq(
      // in-doc triple repeat: trims to one chunk, then the doc survives
      (1L, "alpha beta gamma alpha beta gamma alpha beta gamma"),
      // boilerplate prefix shared by 3 docs: dies everywhere
      (2L, "COOKIE NOTICE BANNER interesting unique content about rivers flowing east"),
      (3L, "COOKIE NOTICE BANNER another distinct article about mountain trails here"),
      (4L, "COOKIE NOTICE BANNER a third piece describing desert winds and dunes")
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.clean(docs, minQuality = 0.1,
        jaccardThreshold = 0.9,
        intraDocDedupTokens = Some(3),
        boilerplateMinDocs = Some(3), boilerplateChunkTokens = 3)
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "alpha beta gamma",
      "within-doc repetition trimmed before whole-doc dedup")
    assert(Seq(2L, 3L, 4L).forall(i =>
      out(i).startsWith("interesting") || out(i).startsWith("another") ||
      out(i).startsWith("a third")),
      s"the shared banner must die in every doc: $out")
    assert(out.keySet === Set(1L, 2L, 3L, 4L))
  }

  test("clean with substringCutTokens cuts cross-doc duplicated runs " +
       "before whole-doc dedup") {
    val docs = Seq(
      // two otherwise-distinct docs share an 8-token quoted passage at
      // different offsets: the ExactSubstr stage cuts it from BOTH
      (1L, "unique river narrative one two three four five six seven " +
        "eight closing thoughts about water"),
      (2L, "different mountain story begins here one two three four " +
        "five six seven eight and then trails onward")
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.clean(docs, minQuality = 0.0,
        jaccardThreshold = 0.99, substringCutTokens = Some(8))
      .as[(Long, String)].collect().toMap
    assert(out.keySet === Set(1L, 2L))
    assert(!out(1L).contains("one two three four five six seven eight") &&
      !out(2L).contains("one two three four five six seven eight"),
      s"the shared passage must die in both docs: $out")
    assert(out(1L).contains("unique river narrative") &&
      out(2L).contains("different mountain story"),
      "each doc's own content survives the cut")
  }

  test("clean with scrubEval cuts eval-verbatim runs; fully-scrubbed " +
       "docs drop instead of surviving as one empty ghost") {
    val quote = "which of the following best describes the water cycle"
    val train = Seq(
      // doc 1: a long doc quoting one benchmark item — loses the QUOTE
      (1L, s"interesting original essay about rivers $quote and then " +
        "further novel discussion of rainfall patterns"),
      // docs 2+3: nothing BUT eval text — scrub to empty; without the
      // empty-survivor gate they'd collapse to one ghost doc in exact
      // dedup and doc 2 would survive the whole pipeline
      (2L, quote),
      (3L, quote),
      (4L, "a fully unrelated clean document about mountain trails here")
    ).toDF("doc_id", "text")
    val eval_ = Seq((100L, quote)).toDF("doc_id", "text")
    val out = CorpusPipeline.clean(train, minQuality = 0.0,
        jaccardThreshold = 0.99, scrubEval = Some(eval_), scrubTokens = 5)
      .as[(Long, String)].collect().toMap
    assert(out.keySet === Set(1L, 4L),
      s"fully-contaminated docs 2 and 3 must DROP, not ghost-survive: $out")
    assert(!out(1L).contains("water cycle") && !out(1L).contains("best"),
      s"the quoted benchmark item must be scrubbed from doc 1: $out")
    assert(out(1L).contains("interesting original essay") &&
      out(1L).contains("rainfall patterns"),
      "doc 1's own content must survive the scrub")
  }

  test("cleanReport with scrubEval: contam_scrubbed outcome, kept set " +
       "still equals clean's survivors") {
    val quote = "which of the following best describes the water cycle"
    val train = Seq(
      (1L, s"interesting original essay about rivers $quote and then " +
        "further novel discussion of rainfall patterns"),
      (2L, quote),
      (3L, quote),
      (4L, "a fully unrelated clean document about mountain trails here"),
      (5L, "a fully unrelated clean document about mountain trails here")
    ).toDF("doc_id", "text")
    val eval_ = Seq((100L, quote)).toDF("doc_id", "text")
    val report = CorpusPipeline.cleanReport(train, minQuality = 0.0,
        jaccardThreshold = 0.99, scrubEval = Some(eval_), scrubTokens = 5)
      .as[(Long, String)].collect().toMap
    assert(report === Map(1L -> "kept", 2L -> "contam_scrubbed",
      3L -> "contam_scrubbed", 4L -> "kept", 5L -> "exact_dup"))
    val cleanIds = CorpusPipeline.clean(train, minQuality = 0.0,
        jaccardThreshold = 0.99, scrubEval = Some(eval_), scrubTokens = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(report.filter(_._2 == "kept").keySet === cleanIds,
      "report's kept set must equal clean's output in scrub mode too")
  }

  test("scrub mode: born_empty vs contam_scrubbed labels, NULL text " +
       "passes the empty-survivor gate, kept sets stay in parity") {
    val quote = "which of the following best describes the water cycle"
    val train = Seq[(Long, String)](
      (1L, s"interesting original essay about rivers $quote and then " +
        "further novel discussion of rainfall patterns"),
      (2L, quote),  // scrub cuts EVERYTHING → contam_scrubbed
      (3L, ""),     // empty BEFORE the scrub — same gate, different stage
      (4L, null),   // NULL text: applySpanCut pass-through, survives gate
      (5L, null),   // second NULL: exact-dup group of the NULLs
      (6L, "a fully unrelated clean document about mountain trails here")
    ).toDF("doc_id", "text")
    val eval_ = Seq((100L, quote)).toDF("doc_id", "text")
    val report = CorpusPipeline.cleanReport(train, minQuality = 0.0,
        jaccardThreshold = 0.99, scrubEval = Some(eval_), scrubTokens = 5)
      .as[(Long, String)].collect().toMap
    assert(report === Map(1L -> "kept", 2L -> "contam_scrubbed",
      3L -> "born_empty", 4L -> "kept", 5L -> "exact_dup",
      6L -> "kept"),
      s"scrub-emptied vs born-empty must attribute to different stages, " +
      s"NULL text must not be silently dropped: $report")
    val cleanIds = CorpusPipeline.clean(train, minQuality = 0.0,
        jaccardThreshold = 0.99, scrubEval = Some(eval_), scrubTokens = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(report.filter(_._2 == "kept").keySet === cleanIds,
      "kept-set parity must hold with empty and NULL docs in play")
  }

  test("surgery stages keep the no-surgery NULL-text semantics: the " +
       "empty-survivor gate passes NULL through (r18 ADVICE)") {
    val docs = Seq[(Long, String)](
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, null),
      (3L, null)
    ).toDF("doc_id", "text")
    // without surgery NULL-text docs reach exact dedup and collapse to
    // the min id — with a cut stage enabled the gate must not change that
    val noSurgery = CorpusPipeline.clean(docs, minQuality = 0.0,
        jaccardThreshold = 0.99)
      .select("doc_id").as[Long].collect().toSet
    val withSurgery = CorpusPipeline.clean(docs, minQuality = 0.0,
        jaccardThreshold = 0.99, chunkDedupTokens = Some(10))
      .select("doc_id").as[Long].collect().toSet
    assert(noSurgery === Set(1L, 2L))
    assert(withSurgery === noSurgery,
      "enabling a cut stage must not silently drop NULL-text docs")
  }

  test("clean with gopherMinWords gates on the rule verdict too") {
    val good = (1 to 30).map(i => if (i % 3 == 0) "gamma" else "delta")
      .mkString(" ")
    val docs = Seq(
      (1L, good),
      (2L, "short but high alpha ratio text here ok")  // passes score, fails word floor
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.clean(docs, minQuality = 0.2,
        jaccardThreshold = 0.5, gopherMinWords = Some(20L))
      .as[(Long, String)].collect().toMap
    assert(out.keySet === Set(1L), "doc 2 fails the Gopher word floor")
  }

  test("cleanReport: first-gate outcome per doc, kept set equals clean's") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (3L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (4L, "a completely different story about email john@example.com and shuffles here today"),
      (5L, "12 34 !!")
    ).toDF("doc_id", "text")
    val report = CorpusPipeline.cleanReport(docs, minQuality = 0.3,
        jaccardThreshold = 0.5)
      .as[(Long, String)].collect().toMap
    assert(report === Map(1L -> "kept", 2L -> "exact_dup",
      3L -> "near_dup", 4L -> "kept", 5L -> "low_quality"))
    val keptIds = report.filter(_._2 == "kept").keySet
    val cleanIds = CorpusPipeline.clean(docs, minQuality = 0.3,
        jaccardThreshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(keptIds === cleanIds, "report's kept set must equal clean's output")
  }

  test("prepareWithBudget: waterfall rates drive the per-source sample") {
    // two clean sources, keys chosen so the percent bucket is the id
    // itself: src a avail=40 (4 docs × 10 chars), src b avail=20.
    // budget = 30, uniform weights → share 15 each; b caps? 15 < 20 no →
    // alloc 15 each; rates a = round(1500/40)=38%, b = round(1500/20)=75%
    val docs = Seq(
      (1L, "a", "aaaa bbbb2"), (37L, "a", "cccc dddd2"),
      (38L, "a", "eeee ffff2"), (90L, "a", "gggg hhhh2"),
      (2L, "b", "iiii jjjj2"), (74L, "b", "kkkk llll2")
    ).toDF("doc_id", "source", "text")
    val out = CorpusPipeline.prepareWithBudget(docs,
        Map("a" -> 1L, "b" -> 1L), budget = 30L, packBudget = 1000L,
        minQuality = 0.0)
      .select("source", "doc_ids").as[(String, Seq[Long])].collect().toMap
    // a keeps ids with id%100 < 38 → 1, 37; b keeps id%100 < 75 → 2, 74
    assert(out("a") === Seq(1L, 37L))
    assert(out("b") === Seq(2L, 74L))
    graft.operators.OpCaches.release(true)
  }

  test("clean is idempotent on an already-clean corpus") {
    val docs = Seq(
      (1L, "totally unique first document about spark windows and joins"),
      (2L, "another unrelated second document mentioning parquet and shuffles")
    ).toDF("doc_id", "text")
    val once = CorpusPipeline.clean(docs, jaccardThreshold = 0.5)
    val twice = CorpusPipeline.clean(once, jaccardThreshold = 0.5)
    assert(rendered(once) === rendered(twice))
  }
}
