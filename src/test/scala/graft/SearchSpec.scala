package graft

import org.apache.spark.sql.functions._

import graft.operators.Search

class SearchSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "cat dog cat"),        // "cat" twice in a short doc
    (2L, "cat bird bird bird"), // "cat" once, longer doc
    (3L, "fish fish fish"),     // no query terms
    (4L, "dog")                 // rare term only
  ).toDF("doc_id", "text")

  test("bm25: only matching docs score; tf raises, length normalizes") {
    val out = Search.bm25(docs, Seq("cat", "dog"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(out.keySet === Set(1L, 2L, 4L), "doc 3 matches no query term")
    assert(out(1L)._1 === 2L, "doc 1 matches both terms")
    // doc 1 has cat×2 in 3 tokens; doc 2 has cat×1 in 4 tokens — doc 1's
    // cat contribution alone must beat doc 2's total
    assert(out(1L)._2 > out(2L)._2)
    // "dog" (df=2) idf beats nothing here, but scores must be positive
    assert(out.values.forall(_._2 > 0))
  }

  test("bm25 is deterministic across partition layouts") {
    val a = Search.bm25(docs, Seq("cat", "dog")).collect().toSet
    val b = Search.bm25(docs.repartition(7), Seq("cat", "dog"))
      .collect().toSet
    assert(a === b)
  }

  test("phraseSearch: exact positional match, counts and first position") {
    val corpus = Seq(
      (1L, "the quick brown fox"),       // match at 1
      (2L, "quick brown"),               // match at 0
      (3L, "brown quick"),               // both terms, wrong order
      (4L, "quick crown brown"),         // terms not adjacent
      (5L, "x quick brown y quick brown") // two matches: 1 and 4
    ).toDF("doc_id", "text")
    val out = Search.phraseSearch(corpus, Seq("quick", "brown"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out === Map(1L -> (1L, 1L), 2L -> (1L, 0L), 5L -> (2L, 1L)))
  }

  test("phraseSearch: repeated tokens and overlapping occurrences") {
    val corpus = Seq((1L, "a a a"), (2L, "a b a"), (3L, "b a a b"))
      .toDF("doc_id", "text")
    val out = Search.phraseSearch(corpus, Seq("a", "a"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out === Map(1L -> (2L, 0L), 3L -> (1L, 1L)),
      "\"a a a\" contains \"a a\" at 0 and 1; \"a b a\" not at all")
  }

  test("phraseSearch plan: token stream filtered by broadcast join " +
       "before the aggregation exchange") {
    val plan = Search.phraseSearch(docs, Seq("cat", "dog"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"phrase-term restriction must broadcast:\n$plan")
  }

  test("rankBy: dense 1..topN ranks, score-desc, id tie-break") {
    val scored = Seq((10L, 5.0), (11L, 7.0), (12L, 5.0), (13L, 1.0))
      .toDF("doc_id", "s")
    val out = Search.rankBy(scored, "doc_id", "s", topN = 3)
      .as[(Long, Int)].collect().toMap
    assert(out === Map(11L -> 1, 10L -> 2, 12L -> 3),
      "ties broken by ascending id; doc 13 cut by topN")
  }

  test("rrfFuse: exact reciprocal-rank sums, single-list ids included") {
    val l1 = Seq((1L, 1), (2L, 2)).toDF("id", "rank")
    val l2 = Seq((2L, 1), (3L, 2)).toDF("id", "rank")
    val out = Search.rrfFuse(Seq(l1, l2))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    def c(rank: Int) =
      BigDecimal(1.0 / (60.0 + rank)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    assert(out(2L)._2 === 2L)
    assert(out(2L)._1 === (c(2) + c(1)).toDouble,
      "id in both lists sums both contributions")
    assert(out(1L) === ((c(1).toDouble, 1L)))
    assert(out(3L) === ((c(2).toDouble, 1L)))
  }

  test("ndcgAt: hand-computed gains, unlabeled docs rel 0, all-zero " +
       "labels go NULL") {
    def r9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def gain(rel: Int, rank: Int): Double =
      r9((math.pow(2.0, rel) - 1.0) /
        (math.log(rank + 1.0) / math.log(2.0)))
    val ranked = Seq(("q", 1L, 1), ("q", 2L, 2), ("q", 3L, 3),
      ("z", 9L, 1))
      .toDF("query_id", "doc_id", "rank")
    // D (doc 4) is relevant but unranked — it should cost ndcg via idcg;
    // doc 1 is ranked first but unlabeled -> rel 0
    val rels = Seq(("q", 2L, 2L), ("q", 3L, 1L), ("q", 4L, 3L),
      ("z", 9L, 0L))
      .toDF("query_id", "doc_id", "rel")
    val out = Search.ndcgAt(ranked, rels, k = 10)
      .as[(String, Option[Double])].collect().toMap
    val dcg = gain(0, 1) + gain(2, 2) + gain(1, 3)
    val idcg = gain(3, 1) + gain(2, 2) + gain(1, 3) + gain(0, 4)
    assert(out("q") === Some(r9(dcg / idcg)))
    assert(out("z") === None, "all-zero labels: NDCG undefined, NULL")
    // duplicate labels are a SET (strongest grade wins): repeating
    // (q, 2) with a weaker grade changes neither dcg nor idcg
    val dup = Search.ndcgAt(ranked,
        rels.union(Seq(("q", 2L, 1L)).toDF("query_id", "doc_id", "rel")),
        k = 10)
      .as[(String, Option[Double])].collect().toMap
    assert(dup === out, "duplicate labels change nothing")
  }

  test("rankEval: hand-computed MRR/P@k/R@k/AP@k; no-relevant query " +
       "reads MRR 0 with NULL recall/AP") {
    val ranked = (1 to 5).flatMap(r => Seq(("q1", r.toLong, r),
      ("q2", (10 + r).toLong, r))).toDF("query_id", "doc_id", "rank")
    // q1 relevant: docs 2, 4 (in top-5) and 9 (outside); q2: none
    val rels = Seq(("q1", 2L, 1L), ("q1", 4L, 1L), ("q1", 9L, 1L),
      ("q1", 1L, 0L)).toDF("query_id", "doc_id", "rel")
    val out = Search.rankEval(ranked, rels, k = 5)
      .as[(String, Long, Long, Double, Double, Option[Double],
           Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    // q1: hits {2,4}; first=2 -> MRR .5; P=2/5; R=2/3;
    // AP = (1/2 + 2/4)/min(3,5) = 1/3
    assert(out("q1") === (("q1", 3L, 2L, 0.5, 0.4,
      Some(0.666666667), Some(0.333333333))))
    assert(out("q2") === (("q2", 0L, 0L, 0.0, 0.0, None, None)))
    intercept[IllegalArgumentException] {
      Search.rankEval(ranked, rels, k = 0)
    }
    // duplicate relevance labels are a SET: repeating (q1, 2) must not
    // fan out the join (double-counting rank 2) or inflate n_rel
    val dupRels = rels.union(Seq(("q1", 2L, 2L)).toDF("query_id",
      "doc_id", "rel"))
    val dedup = Search.rankEval(ranked, dupRels, k = 5)
      .as[(String, Long, Long, Double, Double, Option[Double],
           Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(dedup("q1") === out("q1"), "duplicate labels change nothing")
  }
}
