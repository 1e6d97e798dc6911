package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Full-text retrieval over a document corpus: exact Okapi BM25 scoring
  * and reciprocal-rank fusion for hybrid (lexical + vector) search.
  *
  * Tokenization is `split(text, " ")` — the corpus-wide convention shared
  * with [[TextAnalysis]] / [[Ngrams]] and the DuckDB oracles.
  *
  * Engine-exactness: BM25 mixes `ln` and division chains whose results
  * are correctly-rounded IEEE doubles in any engine — EXCEPT that two
  * engines may fold constants differently. Every constant therefore
  * enters as a parsed literal combined at runtime (`lit(k1) + lit(1.0)`,
  * never Scala-side `k1 + 1.0`), per-term weights are rounded to 9
  * decimals, and the per-doc sum runs in DECIMAL(28,9) — the same
  * layout-independence treatment as `Ngrams.unigramLogProb`.
  */
object Search {

  /** Okapi BM25 scores for `queryTerms` over the corpus: one row per
    * document containing at least one query term — (doc_id, n_terms,
    * score), higher is better.
    *
    * Plan shape at scale: the exploded token stream is restricted to the
    * (broadcast) query terms BEFORE any exchange, so the tf aggregation —
    * the only shuffle — carries |query-term hits| rows, not the corpus
    * vocabulary; everything after operates on |matching docs| × |query
    * terms| rows. Document frequencies derive from the same restricted
    * table. Corpus stats (N, avg doc length) ride in as a broadcast
    * single row. */
  def bm25(docs: DataFrame, queryTerms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75,
           idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val spark = docs.sparkSession
    import spark.implicits._
    val qt = queryTerms.distinct.toDF("tok")
    val toksOf = split(col(textCol), " ")
    val tokens = docs.select(col(idCol).as("doc_id"), size(toksOf).as("dl"),
      explode(toksOf).as("tok"))
    val matched = tokens.join(broadcast(qt), "tok")
      .groupBy("doc_id", "dl", "tok")
      .agg(count(lit(1)).as("tf"))
    val dfTbl = matched.groupBy("tok").agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      sum(size(toksOf).cast("long")).as("sum_dl"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val idf = round(log(
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5))
        / (col("df").cast("double") + lit(0.5)) + lit(1.0)), 9)
    val tfNorm = col("tf").cast("double") * (lit(k1) + lit(1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / col("avgdl")))
    matched.join(broadcast(dfTbl), "tok")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", avgdl)
      .withColumn("__w", round(idf * tfNorm, 9))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"),
        sum(col("__w").cast(DecimalType(28, 9))).cast("double").as("score"))
  }

  /** Exact phrase search via positional postings — the distributed form
    * of the positional-inverted-index intersection every full-text
    * engine runs for quoted queries.
    *
    * Construction: the token stream (doc_id, pos, tok) is restricted to
    * the phrase's terms by a broadcast join BEFORE any exchange (same
    * discipline as [[bm25]]), each surviving occurrence emits a candidate
    * start `pos - idx` for every phrase slot `idx` its token fills, and a
    * start is a real occurrence iff all `m` slots are covered —
    * `count(DISTINCT idx) = m` in ONE aggregation. No m-way self-join:
    * phrase length only multiplies the (already term-filtered) emission
    * count, and the single shuffle carries (doc_id, start, idx) triples.
    * Repeated phrase tokens and overlapping occurrences ("a a a" contains
    * "a a" twice) fall out correctly because slots are counted distinctly
    * per start. Output: (doc_id, n_matches, first_pos). */
  def phraseSearch(docs: DataFrame, phrase: Seq[String],
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    val m = phrase.size
    val spark = docs.sparkSession
    import spark.implicits._
    val ph = phrase.zipWithIndex.toDF("tok", "idx")
    val toks = docs.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), " ")))
      .select(col("doc_id"), col("pos"), col("col").as("tok"))
    toks.join(broadcast(ph), "tok")
      .select(col("doc_id"), (col("pos") - col("idx")).as("start"),
        col("idx"))
      .filter(col("start") >= 0)
      .groupBy("doc_id", "start")
      .agg(countDistinct(col("idx")).as("__slots"))
      .filter(col("__slots") === m)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_matches"),
        min(col("start")).cast("long").as("first_pos"))
  }

  /** Dense rank table for fusion: (id, rank) with rank 1 = best, ordered
    * by `scoreCol` descending, ties broken by id — the deterministic
    * total order every ranking must carry before fusing. Capped at
    * `topN` so downstream fusion joins stay bounded. */
  def rankBy(scored: DataFrame, idCol: String, scoreCol: String,
             topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // cut to topN first — orderBy+limit fuses to a distributed
    // TakeOrderedAndProject, so the single-partition ranking window
    // only ever sees topN rows, not the corpus
    val cut = scored.select(col(idCol).as("id"), col(scoreCol))
      .orderBy(col(scoreCol).desc, col(idCol)).limit(topN)
    val w = Window.orderBy(col(scoreCol).desc, col("id"))
    cut.withColumn("rank", row_number().over(w)).select("id", "rank")
  }

  /** Reciprocal-rank fusion: rrf(id) = Σ_lists 1/(c + rank_list(id)),
    * the standard score-free way to combine heterogeneous rankings
    * (lexical BM25 + vector cosine, multiple retrievers …). Input
    * frames each carry (id, rank); ids absent from a list simply
    * contribute nothing. Contributions are 9-decimal-rounded and summed
    * in DECIMAL, so fused scores are exact rationals of integer ranks —
    * engine- and layout-independent. */
  def rrfFuse(rankings: Seq[DataFrame], c: Int = 60): DataFrame = {
    require(rankings.nonEmpty)
    val contribs = rankings.map(_.select(col("id"),
      round(lit(1.0) / (lit(c.toDouble) + col("rank").cast("double")), 9)
        .as("__contrib")))
    contribs.reduce(_ unionByName _)
      .groupBy("id")
      .agg(sum(col("__contrib").cast(DecimalType(28, 9))).cast("double")
             .as("rrf"),
           count(lit(1)).as("n_lists"))
  }

  /** NDCG@k — the ranking-quality metric that closes the retrieval
    * loop: given a ranked list per query and graded relevance labels,
    * the discounted cumulative gain of the ranking normalized by the
    * ideal ordering's. The number a retrieval stack reports when it
    * changes BM25 parameters, fusion weights or the embedding model.
    *
    * Per-position gains ((2^rel − 1)/log₂(rank+1)) are 9-dec-rounded
    * doubles summed in DECIMAL, and the ideal ranking is a rank window
    * over the labels (rel DESC, id — deterministic ties), so NDCG is
    * engine- and layout-exact. Unlabeled ranked docs count rel 0;
    * queries whose labels are all 0 emit NULL (undefined, not 1).
    * Two window sorts over per-query rows — both partition by the
    * query key; label/ranking tables carry ids and small ints only. */
  def ndcgAt(ranked: DataFrame, rels: DataFrame, k: Int,
             queryCol: String = "query_id", idCol: String = "doc_id",
             rankCol: String = "rank", relCol: String = "rel")
      : DataFrame = {
    require(k > 0)
    def gain(rel: Column, rank: Column): Column =
      round((pow(lit(2.0), rel) - 1.0) /
        (log(rank.cast("double") + 1.0) / log(lit(2.0))), 9)
    def decSum(c: Column) = sum(c.cast(DecimalType(28, 9))).cast("double")
    // Labels are a SET (the rankEval rule): duplicate (query, doc)
    // rows would double-count a rank position in dcg AND take two
    // ideal slots in idcg — collapse to one row per pair, strongest
    // grade wins.
    val rels1 = rels.groupBy(col(queryCol), col(idCol))
      .agg(max(col(relCol)).as(relCol))
    val dcg = ranked.filter(col(rankCol) <= k)
      .join(rels1.select(col(queryCol), col(idCol), col(relCol)),
        Seq(queryCol, idCol), "left")
      .withColumn("__g",
        gain(coalesce(col(relCol), lit(0L)).cast("double"), col(rankCol)))
      .groupBy(col(queryCol)).agg(decSum(col("__g")).as("__dcg"))
    val iw = org.apache.spark.sql.expressions.Window
      .partitionBy(col(queryCol))
      .orderBy(col(relCol).desc, col(idCol))
    val idcg = rels1
      .withColumn("__r", row_number().over(iw))
      .filter(col("__r") <= k)
      .withColumn("__g", gain(col(relCol).cast("double"), col("__r")))
      .groupBy(col(queryCol)).agg(decSum(col("__g")).as("__idcg"))
    dcg.join(idcg, Seq(queryCol))
      .select(col(queryCol),
        when(col("__idcg") > 0, round(col("__dcg") / col("__idcg"), 9))
          .as("ndcg"))
  }

  /** The binary-relevance retrieval scorecard beside [[ndcgAt]]'s
    * graded gain: per query, MRR, precision@k, recall@k and AP@k (the
    * MAP summand) from a ranked list and a relevance table — the four
    * numbers every retrieval regression suite tracks together (MRR for
    * first-hit latency, P/R for set quality, AP for full-list order).
    * Standard conventions: a query with no relevant doc in the top k
    * scores MRR 0; recall/AP are NULL (undefined) when the query has
    * no labeled-relevant docs at all; AP normalizes by min(n_rel, k).
    *
    * Engine-exact: hits and cumulative hits are integers off ONE
    * per-query rank window (the input is already ≤ k rows per query,
    * so the window sorts k-bounded partitions, never a corpus); AP
    * terms round to 9 and sum in DECIMAL; the three closing divisions
    * are single IEEE ops rounded to 9. Output: (queryCol, n_rel,
    * hits_at_k, mrr, precision_at_k, recall_at_k, ap_at_k). */
  def rankEval(ranked: DataFrame, rels: DataFrame, k: Int,
               queryCol: String = "query_id", idCol: String = "doc_id",
               rankCol: String = "rank", relCol: String = "rel")
      : DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // Labels are a SET: duplicate (query, doc) relevance rows would
    // fan out the left join and double-count a rank position.
    val relevant = rels.filter(col(relCol) > 0)
      .select(col(queryCol), col(idCol))
      .distinct()
    val nrel = relevant.groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_rel"))
    val joined = ranked.filter(col(rankCol) <= k)
      .join(relevant.withColumn("__hit1", lit(1L)),
        Seq(queryCol, idCol), "left")
      .select(col(queryCol), col(rankCol).cast("long").as("__rank"),
        coalesce(col("__hit1"), lit(0L)).as("__hit"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(queryCol)).orderBy(col("__rank"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val terms = joined
      .withColumn("__cum", sum(col("__hit")).over(w))
      .withColumn("__ap_term", when(col("__hit") === 1,
        round(col("__cum").cast("double") / col("__rank"), 9)))
    val agg = terms.groupBy(col(queryCol)).agg(
      sum(col("__hit")).as("hits_at_k"),
      min(when(col("__hit") === 1, col("__rank"))).as("__first"),
      sum(col("__ap_term").cast(DecimalType(28, 9))).as("__ap_sum"))
    agg.join(nrel, Seq(queryCol), "left")
      .select(col(queryCol),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        col("hits_at_k"),
        coalesce(round(lit(1.0) / col("__first"), 9), lit(0.0)).as("mrr"),
        round(col("hits_at_k").cast("double") / lit(k), 9)
          .as("precision_at_k"),
        when(col("n_rel") > 0,
          round(col("hits_at_k").cast("double") / col("n_rel"), 9))
          .as("recall_at_k"),
        when(col("n_rel") > 0, round(
          coalesce(col("__ap_sum"), lit(0).cast(DecimalType(28, 9)))
            .cast("double") / least(col("n_rel"), lit(k.toLong)), 9))
          .as("ap_at_k"))
  }
}
