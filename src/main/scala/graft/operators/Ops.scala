package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared operator utilities. */
object Ops {

  /** 2-D skyline (Pareto frontier), both dimensions maximized: the
    * DISTINCT (x, y) points no other point dominates (≥ in both, > in
    * at least one) — the "best trade-offs" selection behind
    * cost-vs-quality triage (biggest recent orders, longest cleanest
    * docs) that a plain ORDER BY can't express.
    *
    * Sort-based and TWO-LEVEL, never the naive n² dominance anti-join
    * and never a whole-corpus single-partition sort: (1) collapse to
    * the per-x maximum y (one grouped aggregate — x is unique after
    * it); (2) range-bucket x by `nBuckets` quantile boundaries from a
    * bounded rank sketch ("boundaries strictly below x" counting, so
    * every point in a higher bucket has STRICTLY larger x — the strict
    * dominance the frontier rule needs); (3) the running "best y at
    * larger x" is then greatest(per-bucket window running max,
    * cross-bucket max from higher buckets) — the local window is
    * PARTITIONED by bucket and the cross-bucket table is nBuckets
    * rows, broadcast. A point survives iff its y strictly exceeds that
    * bound. Double-tied points survive as one collapsed frontier row,
    * matching the NOT-EXISTS dominance definition. The sketch
    * boundaries only shape the plan; the frontier is
    * bucketing-independent. */
  def skyline2D(df: DataFrame, xCol: String, yCol: String,
                nBuckets: Int = 64): DataFrame = {
    require(nBuckets > 1, s"need at least 2 buckets, got $nBuckets")
    val pts = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val perX = pts.groupBy(col(xCol).cast("double").as("x"))
      .agg(max(col(yCol).cast("double")).as("y"))
    val bArr = pts.agg(percentile_approx(col(xCol).cast("double"),
      array((1 until nBuckets).map(i =>
        lit(i.toDouble / nBuckets)): _*), lit(10000)).as("__bs"))
    val withB = perX.crossJoin(broadcast(bArr))
      .select(col("x"), col("y"),
        size(filter(col("__bs"), b => b < col("x"))).cast("long").as("__b"))
    val bmax = withB.groupBy(col("__b")).agg(max(col("y")).as("__bm"))
    val wHigher = Window.orderBy(col("__b").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val crossMax = bmax.select(col("__b"),
      max(col("__bm")).over(wHigher).as("__cm"))
    val wLocal = Window.partitionBy(col("__b")).orderBy(col("x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bound = greatest(max(col("y")).over(wLocal), col("__cm"))
    withB.join(broadcast(crossMax), "__b")
      .select(col("x"), col("y"), bound.as("__d"))
      .filter(col("__d").isNull || col("y") > col("__d"))
      .select(col("x"), col("y"))
  }

  /** Ensure a compute-bound stage runs with cluster-wide parallelism even
    * when the source collapses to a handful of input splits (small files:
    * one parquet row-group = one task). Repartitions by `by` to
    * `defaultParallelism` only when the input has fewer partitions than
    * the cluster has slots — at 100 TB a real source has thousands of
    * splits and this is a no-op, so the extra shuffle is only ever paid
    * on inputs small enough for it to be cheap.
    *
    * The input's parallelism is ESTIMATED from logical-plan statistics
    * (`stats.sizeInBytes / filesMaxPartitionBytes` — the same quantity
    * Spark's file-split planning divides by), which costs a metadata
    * lookup only. The two rejected alternatives both misbehave:
    * `df.rdd.getNumPartitions` forces physical planning + RDD conversion
    * (and codegen) of every composed query at build time, and
    * `executedPlan.outputPartitioning` reads `UnknownPartitioning(0)`
    * for any scan under AQE — which would turn spread into an
    * unconditional shuffle, exactly the failure it exists to avoid.
    * The size estimate errs on the safe side at scale: any source
    * bigger than cores × maxPartitionBytes (a few GB) is left alone.
    */
  def spread(df: DataFrame, by: Column): DataFrame = {
    val spark = df.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    val estSplits =
      df.queryExecution.optimizedPlan.stats.sizeInBytes / maxSplit + 1
    if (estSplits < par) df.repartition(par, by) else df
  }
}
