package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.plans.RewriteHofDot

class RewriteHofDotSpec extends SparkTestBase {
  import spark.implicits._

  // parquet-backed (not a LocalRelation): ConvertToLocalRelation would
  // otherwise constant-fold the toy data before the plan can be inspected
  private lazy val vecs = {
    val dir = java.nio.file.Files.createTempDirectory("graft-hofdot").toString
    Seq(
      (1L, Array(1.0f, 2.0f, 3.0f), Array(0.5f, -1.0f, 2.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f))
    ).toDF("id", "a", "b").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteHofDot
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq RewriteHofDot)
  }

  test("rule rewrites the HOF dot into graft_float_dot in the plan") {
    withRule {
      val df = vecs.select(col("id"),
        Similarity.dotDHof(col("a"), col("b")).as("d"))
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("graft_float_dot"),
        s"HOF aggregate(zip_with) must rewrite to FloatDot:\n$plan")
      assert(!plan.contains("aggregate("),
        s"the interpreted fold must be gone:\n$plan")
    }
  }

  test("rewritten results are bit-identical to both formulations") {
    val hofRaw = vecs.select(col("id"),
      Similarity.dotDHof(col("a"), col("b")).as("d"))
      .as[(Long, Double)].collect().toMap
    val (rewritten, native) = withRule {
      (vecs.select(col("id"), Similarity.dotDHof(col("a"), col("b")).as("d"))
         .as[(Long, Double)].collect().toMap,
       vecs.select(col("id"), Similarity.dotD(col("a"), col("b")).as("d"))
         .as[(Long, Double)].collect().toMap)
    }
    assert(rewritten === hofRaw)
    assert(rewritten === native)
  }

  test("rewrite is semantics-preserving on ragged and null-element arrays") {
    // zip_with null-pads the shorter array and a null element poisons the
    // product — the HOF fold returns NULL for both. The injected rule runs
    // in EVERY session, so the rewritten plan must return NULL too.
    val dir = java.nio.file.Files.createTempDirectory("graft-hofdot3").toString
    Seq(
      (1L, Some(Seq(Option(1.0f), Option(2.0f), Option(9.0f))),
        Some(Seq(Option(10.0f), Option(10.0f)))),          // ragged
      (2L, Some(Seq(Option(1.0f), None)),
        Some(Seq(Option(2.0f), Option(3.0f)))),            // null element
      (3L, None, Some(Seq(Option(1.0f)))),                 // null array
      (4L, Some(Seq(Option(1.0f), Option(2.0f))),
        Some(Seq(Option(3.0f), Option(4.0f))))             // well-formed
    ).toDF("id", "a", "b").write.mode("overwrite").parquet(dir)
    val ragged = spark.read.parquet(dir)
    val hofRaw = ragged.select(col("id"),
        Similarity.dotDHof(col("a"), col("b")).as("d"))
      .as[(Long, Option[Double])].collect().toMap
    assert(hofRaw(1L).isEmpty && hofRaw(2L).isEmpty && hofRaw(3L).isEmpty,
      "HOF fold: ragged/null inputs → NULL")
    assert(hofRaw(4L).contains(11.0))
    withRule {
      val df = ragged.select(col("id"),
        Similarity.dotDHof(col("a"), col("b")).as("d"))
      assert(df.queryExecution.optimizedPlan.toString.contains("graft_float_dot"),
        "nullable float arrays must still rewrite")
      assert(df.as[(Long, Option[Double])].collect().toMap === hofRaw,
        "rewritten results identical, including the NULLs")
    }
  }

  test("rule is a no-op on folds it cannot prove are dot products") {
    withRule {
      // different zero, different merge op, non-float arrays — untouched
      val sumSquares = vecs.select(
        aggregate(zip_with(col("a"), col("a"),
            (x, y) => x.cast("double") * y.cast("double") + 1.0),
          lit(0.0), (acc, v) => acc + v).as("s"))
      val plan = sumSquares.queryExecution.optimizedPlan.toString
      assert(!plan.contains("graft_float_dot"),
        s"non-dot fold must not rewrite:\n$plan")
      val dir = java.nio.file.Files.createTempDirectory("graft-hofdot2")
        .toString
      Seq((Array(1L, 2L), Array(3L, 4L))).toDF("a", "b")
        .write.mode("overwrite").parquet(dir)
      val longArrays = spark.read.parquet(dir)
        .select(aggregate(zip_with(col("a"), col("b"),
            (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, v) => acc + v).as("s"))
      assert(!longArrays.queryExecution.optimizedPlan.toString
        .contains("graft_float_dot"), "long arrays must not rewrite")
    }
  }
}
