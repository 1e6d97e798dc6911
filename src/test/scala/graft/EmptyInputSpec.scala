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
}
