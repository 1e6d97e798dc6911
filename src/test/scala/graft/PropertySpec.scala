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
}
