package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkTestBase {

  test("fingerprint native expression matches the HOF fold bit-for-bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq("", "a", "hello world", "The quick brown fox! 123",
      "  double  spaces  ", "trailing space ").toDF("text")
    val out = df.select(
      graft.operators.TextAnalysis.fingerprint(col("text")).as("native"),
      graft.operators.TextAnalysis.fingerprintHof(col("text")).as("hof"))
    assert(out.filter(col("native") =!= col("hof")).count() === 0)
  }
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the cat and the dog is a pet of a man"),
    (2L, "der Hund und die Katze das ist gut"),
    (3L, "le chat et la mer les oiseaux est beau"),
    (4L, "xyzzy plugh qwerty"),
    (5L, "")
  ).toDF("doc_id", "text")

  test("langId picks the profile with most stopword hits; und when none") {
    val out = docs.select(col("doc_id"), TextAnalysis.langId(col("text")).as("l"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "en")
    assert(out(2L) === "de")
    assert(out(3L) === "fr")
    assert(out(4L) === "und")
    assert(out(5L) === "und")
  }

  test("token counts: whitespace and BPE-ish") {
    val r = docs.filter(col("doc_id") === 1).select(
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.bpeishTokenCount(col("text")).as("b"))
      .as[(Int, Int)].collect()(0)
    assert(r._1 === 11)
    assert(r._2 === 11, "all-letter words → one BPE-ish token each")
    val punct = Seq((1L, "a1b, c!")).toDF("id", "text")
      .select(TextAnalysis.bpeishTokenCount(col("text")))
      .as[Int].collect()(0)
    // a | 1 | b | , | c | !  — letter runs, single digits, single marks
    assert(punct === 6)
  }

  test("qualityScore is in [0,1] and penalizes degenerate text") {
    val q = docs.select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("q"))
      .as[(Long, Double)].collect().toMap
    assert(q.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(1L) > q(5L), "real text must outscore empty text")
  }

  test("fingerprint matches the documented rolling-hash recurrence") {
    val text = "abc"
    val expected = text.foldLeft(0L)((h, c) => (h * 31 + c.toLong) % 1000000007L)
    val got = Seq((1L, text)).toDF("id", "text")
      .select(TextAnalysis.fingerprint(col("text"))).as[Long].collect()(0)
    assert(got === expected)
  }

  test("redact masks emails, urls, and long digit runs") {
    val cases = Seq(
      (1L, "contact me at jo.doe+x@example.co.uk today"),
      (2L, "see https://example.com/a?b=12345678 for details"),
      (3L, "card 1234567890123456 short 1234567 ok"),
      (4L, "clean text stays untouched"))
      .toDF("id", "text")
    val out = cases.select(col("id"), TextAnalysis.redact(col("text")).as("c"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "contact me at <EMAIL> today")
    assert(out(2L) === "see <URL> for details")
    assert(out(3L) === "card <NUM> short 1234567 ok")
    assert(out(4L) === "clean text stays untouched")
  }

  test("gopherStats: rule bounds catch short, symbol-heavy, numeral-heavy docs") {
    import spark.implicits._
    val good = (1 to 25).map(i => if (i % 2 == 0) "alpha" else "beta")
      .mkString(" ")
    val rows = Seq(
      (1L, good),                                  // passes every rule
      (2L, "too short to pass"),                   // word floor
      (3L, good + " " + ("@#$% " * 5).trim),       // symbol ratio
      (4L, (1 to 25).map(_ => "12345").mkString(" ")) // numerals + mean len
    ).toDF("doc_id", "text")
    val out = rows.select(col("doc_id"),
        TextAnalysis.gopherStats(col("text"), minWords = 20).as("g"))
      .select(col("doc_id"), col("g.n_words"), col("g.mean_word_len"),
        col("g.pass"))
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._4 === true)
    assert(out(2L)._4 === false)
    assert(out(3L)._4 === false)
    assert(out(4L)._4 === false)
    assert(out(2L)._2 === 4L)
    // mean word length excludes the separators
    assert(math.abs(out(4L)._3 - 5.0) < 1e-12)
  }

  test("analyze emits the full projection") {
    val out = TextAnalysis.analyze(docs)
    assert(out.columns.toSeq === Seq("doc_id", "n_chars", "n_tokens",
      "n_bpeish_tokens", "lang_pred", "quality", "fingerprint"))
    assert(out.count() === 5)
  }

  test("qualityPrune keeps the per-group top fraction, ids break ties") {
    // score = text length; group A lengths 5,4,3,2,1 → keepFrac 0.5
    // keeps percent_rank 0 and 0.25 (the two longest)
    val df = Seq(
      (1L, "A", "aaaaa"), (2L, "A", "aaaa"), (3L, "A", "aaa"),
      (4L, "A", "aa"), (5L, "A", "a"),
      // group B: all-equal scores → tie-break keeps the LOWEST id
      (6L, "B", "xx"), (7L, "B", "yy"), (8L, "B", "zz")
    ).toDF("doc_id", "source", "text")
    val kept = TextAnalysis.qualityPrune(df, keepFrac = 0.5,
        score = t => org.apache.spark.sql.functions.length(t))
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 2L, 6L),
      "top half of A by length; B's tie resolved to the first id")
    // full columns survive the prune
    assert(TextAnalysis.qualityPrune(df, 0.5).columns.toSeq ===
      Seq("doc_id", "source", "text"))
  }

  test("blocklistFilter: literal substring semantics, regex chars inert") {
    val df = Seq(
      (1L, "perfectly fine text"),
      (2L, "contains bad phrase here"),
      (3L, "cost is $5.00 (a+b)"),   // only the literal term may match
      (4L, "phrase spans bad\nphrase? no — newline breaks it")
    ).toDF("doc_id", "text")
    val kept = TextAnalysis.blocklistFilter(df, Seq("bad phrase", "$5.00"))
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 4L),
      "doc 2 hits the phrase, doc 3 hits the LITERAL $5.00 (not a regex)")
    assert(TextAnalysis.blocklistFilter(df, Seq("zzz")).count() === 4L)
  }

  test("nbClassify: disjoint vocabularies classify perfectly; " +
       "all-OOV doc gets the prior-only argmax") {
    val train = Seq(
      (1L, "spam", "buy cheap pills now"),
      (2L, "spam", "cheap pills cheap deals"),
      (3L, "ham", "meeting notes for tuesday"),
      (4L, "ham", "notes about the quarterly report")
    ).toDF("doc_id", "label", "text")
    val predict = Seq(
      (10L, "spam", "cheap deals now"),        // spam vocab → spam
      (11L, "ham", "quarterly meeting notes"), // ham vocab → ham
      // "pills" is spam (count 2) but "for"/"tuesday" are ham; hand-run
      // NB: spam = ln½ + ln(3/21) + 2·ln(1/21) ≈ −8.728, ham = ln½ +
      // ln(1/22) + 2·ln(2/22) ≈ −8.580 → ham wins (a real mislabel)
      (12L, "spam", "pills for tuesday"),
      // all OOV → likelihood 0 for both labels → prior-only argmax;
      // equal priors (2 docs each) tie-break to the first label: ham
      (13L, "ham", "zzz qqq www")
    ).toDF("doc_id", "label", "text")
    val out = TextAnalysis.nbClassify(train, predict, "label", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(out === Map(("spam", "spam") -> 1L, ("spam", "ham") -> 1L,
        ("ham", "ham") -> 2L),
      "doc 13 (all OOV) stays, labeled by the prior tie-break (ham); " +
        "10/11 classify right, 12 flips to ham")
  }

  test("piiStats counts the same pattern classes redact masks") {
    val df = Seq(
      (1L, "mail a@b.co and c.d@e.org, see https://x.y/z then 123456789"),
      (2L, "clean text, short digits 1234567")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.piiStats(df).orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 2L, 1L, 1L), (2L, 0L, 0L, 0L)),
      "two emails, one url, one 8+ digit run; 7 digits don't trip")
  }

  test("maskTokens: deterministic positions, 0/100 edges, layout-free") {
    val df = Seq((1L, "a b c d e f g h i j"), (2L, "x y z"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.maskTokens(df, maskPct = 15)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    // repeatable: same inputs, same mask, regardless of partitioning
    val again = TextAnalysis.maskTokens(df.repartition(7), maskPct = 15)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out === again, "the mask must not depend on layout")
    assert(out.map(_._2) === Seq(10L, 3L), "token counts")
    out.foreach { case (_, n, m, pos) =>
      assert(m === (if (pos.isEmpty) 0 else pos.split(",").length))
      assert(m <= n)
    }
    // edges: 0% masks nothing, 100% masks everything
    val none = TextAnalysis.maskTokens(df, maskPct = 0)
      .as[(Long, Long, Long, String)].collect()
    assert(none.forall(r => r._3 === 0L && r._4 === ""))
    val all = TextAnalysis.maskTokens(df, maskPct = 100)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    assert(all.map(_._3).toSeq === Seq(10L, 3L))
    assert(all(1)._4 === "0,1,2")
  }

  test("nbClassify: zero-token-overlap label falls back to prior") {
    // predict doc shares tokens with NO label strongly; equal priors and
    // symmetric counts → tie broken by label order (alpha asc)
    val train = Seq(
      (1L, "a", "tok"),
      (2L, "b", "tok")
    ).toDF("doc_id", "label", "text")
    val predict = Seq((9L, "a", "tok")).toDF("doc_id", "label", "text")
    val out = TextAnalysis.nbClassify(train, predict, "label", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(out === Map(("a", "a") -> 1L), "symmetric scores pick label 'a'")
  }

  test("readability: exact token/char/long-word accounting per group") {
    val df = Seq(
      ("a", "aa bb ccccc"),    // 3 toks, 1 long (>=5), 9 chars in toks
      ("a", "ddddd"),          // 1 tok, 1 long, 5 chars
      ("b", "x y"),            // 2 toks, 0 long, 2 chars
      ("b", null)              // ignored
    ).toDF("src", "text")
    val out = TextAnalysis.readability(df, "src", "text", longLen = 5)
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("a") === (("a", 2L, 4L, 2L, 3.5, 50.0)),
      "14 in-token chars over 4 tokens; 2 of 4 long")
    assert(out("b") === (("b", 1L, 2L, 0L, 1.0, 0.0)),
      "NULL text drops before the group count")
  }

  test("repetitionStats: hand-computed bigram/trigram masses, the " +
       "1.0 cap, duplicated lines, and the fewer-than-n-words zero") {
    val df = Seq(
      // "a b a b a b": cb=11, bigrams = [a b, b a, a b, b a, a b] →
      // top (c=3, l=3) mass 9 → 9/11; trigrams = "a b a"×2 + "b a b"×2
      // (l=5 each) → dup mass 20 > cb → capped 1.0; one line, no dup
      (1L, "a b a b a b"),
      // "x x x x": cb=7, top bigram "x x" c=3 l=3 mass 9 → capped 1.0;
      // trigram "x x x" c=2 l=5 mass 10 → capped 1.0
      (2L, "x x x x"),
      // two words: no trigrams → dup 0.0; top bigram c=1 → 3/3? cb=3,
      // top mass = 1·3 = 3 → 1.0 (a doc that IS one bigram)
      (3L, "p q"),
      // duplicated lines: "ab\ncd\nab" cb=8, lines ab×2 (l=2 each) →
      // mass 4 → 0.5; bigrams within... words: ["ab\ncd\nab"] single
      // word → no bigrams → top 0.0
      (4L, "ab\ncd\nab"),
      // single word, no repetition anywhere
      (5L, "solo"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(df, topN = 2, dupN = 3)
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 6L, 0.818181818, 1.0, 0.0)))
    assert(out(2L) === ((2L, 4L, 1.0, 1.0, 0.0)))
    assert(out(3L) === ((3L, 2L, 1.0, 0.0, 0.0)))
    assert(out(4L) === ((4L, 1L, 0.0, 0.0, 0.5)))
    assert(out(5L) === ((5L, 1L, 0.0, 0.0, 0.0)))
  }

  test("logregTrain: learns the separable length signal — the word-count " +
       "weight turns positive and the served scores separate the classes") {
    import spark.implicits._
    val long = (1 to 10).map(i =>
      (i.toLong, ("w" + i + " ") * 40 + "tail of the long doc", true))
    val short = (11 to 20).map(i => (i.toLong, "tiny doc " + i, false))
    val docs = (long ++ short).toDF("doc_id", "text", "is_long")
    val traj = TextAnalysis.logregTrain(docs, label = col("is_long"),
      iters = 3, lr = 4.0)
    val rows = traj.orderBy("iter")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.length === 3 && rows.forall(_._2 === 20L))
    val w = Seq(rows.last._3, rows.last._4, rows.last._5, rows.last._6)
    assert(w(1) > 0L,
      "long docs are the positive class — the capped-word-count weight " +
      "must move positive")
    val scored = TextAnalysis.logregScore(docs, w)
      .select(col("is_long"), col("score"))
      .as[(Boolean, Double)].collect()
    val pos = scored.filter(_._1).map(_._2)
    val neg = scored.filterNot(_._1).map(_._2)
    assert(pos.min > neg.max,
      "3 GD rounds on a separable length signal must rank every long " +
      "doc above every short one")
    assert(scored.forall(s => s._2 >= 0.0 && s._2 <= 1.0))
  }

  test("logregTrain: layout-independent (exact integer gradient sums) " +
       "and loud on bad parameters / empty corpus") {
    import spark.implicits._
    val docs = (1 to 30).map(i =>
      (i.toLong, ("tok " * (i % 7 + 1)) + "end", i % 3 == 0))
      .toDF("doc_id", "text", "y")
    val a = TextAnalysis.logregTrain(docs, col("y"), iters = 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    val b = TextAnalysis.logregTrain(docs.repartition(7), col("y"),
        iters = 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(a === b)
    intercept[IllegalArgumentException] {
      TextAnalysis.logregTrain(docs, col("y"), iters = 0)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.logregTrain(docs, col("y"), lr = 0.0)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.logregTrain(docs.filter(col("doc_id") < 0), col("y"))
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.logregScore(docs, Seq(1L, 2L))
    }
  }
}
