package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus composition operators: per-source mixing (sampling a
  * target distribution out of a heterogeneous corpus) and fixed-budget
  * shard packing (assigning documents to budget-bounded groups for
  * sequence packing / shard writing).
  */
object Mixing {

  /** Per-stratum Bernoulli sampling via Spark's `sampleBy` — the
    * standard mixing primitive. Deterministic for a fixed seed AND fixed
    * partitioning (the RNG is per-partition); for layout-independent
    * reproducibility use [[systematicSampleByRates]]. */
  def sampleByRates(df: DataFrame, strataCol: String,
                    rates: Map[String, Double], seed: Long = 42L): DataFrame =
    df.stat.sampleBy(strataCol, rates, seed)

  /** Systematic per-stratum sampling on a key column: keeps a row iff
    * `key mod 100 < rate*100`. Fully deterministic — independent of
    * partitioning, cluster layout, and engine — which makes sampled
    * corpora reproducible and auditable (the property that matters for
    * data lineage at 100 TB). Rates are rounded to percent granularity
    * (0.29 → 29%, not a float-error 28%). Strata missing from `rates`
    * are dropped. */
  def systematicSampleByRates(df: DataFrame, strataCol: String,
                              keyCol: String,
                              rates: Map[String, Double]): DataFrame = {
    val pct: Column = rates.foldLeft(lit(0L)) { case (acc, (k, r)) =>
      when(col(strataCol) === k, lit(math.round(r * 100))).otherwise(acc)
    }
    df.filter(pmod(col(keyCol), lit(100L)) < pct)
  }

  /** Deterministic k-per-group sample: keeps the k rows with the
    * smallest Knuth multiplicative hash of `keyCol` within each group —
    * a uniform-ish pseudo-random pick that is exactly reproducible
    * across runs, partitionings, and engines (bottom-k-by-hash is the
    * deterministic stand-in for reservoir sampling). One shuffle on the
    * group key; the rank<=k filter gets the WindowGroupLimit pushdown,
    * so map tasks forward at most k rows per group.
    *
    * `keyCol` must be non-negative (Spark's pmod and SQL's sign-
    * preserving % disagree on negatives, breaking the cross-engine
    * claim) and below ~3.4e9 so the multiply fits in a long (ANSI
    * overflow would throw); hash wider keys down first. */
  def deterministicGroupSample(df: DataFrame, groupCol: String,
                               keyCol: String, k: Int): DataFrame = {
    require(k > 0)
    // Null keys hash to null; push them LAST (Spark's ascending default
    // is nulls first, which would hand the whole sample to junk rows)
    // — also DuckDB's default, keeping the oracle formulation aligned.
    val h = pmod(col(keyCol) * lit(2654435761L), lit(4294967296L))
    val w = Window.partitionBy(groupCol)
      .orderBy(h.asc_nulls_last, col(keyCol).asc_nulls_last)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Greedy fixed-budget shard assignment: within each `groupCol`
    * (ordered by `orderCol`), rows are packed into shards of at most
    * `budget` total `weightCol` (a row larger than the budget gets its
    * own shard). Adds a `shard` column = preceding-weight-sum div
    * budget. One shuffle on the group key; the running sum shares it. */
  def packByBudget(df: DataFrame, groupCol: String, orderCol: String,
                   weightCol: String, budget: Long): DataFrame = {
    require(budget > 0)
    val before = Window.partitionBy(groupCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__cum_before",
        coalesce(sum(col(weightCol)).over(before), lit(0L)))
      .withColumn("shard", expr(s"__cum_before div $budget"))
      .drop("__cum_before")
  }
}
