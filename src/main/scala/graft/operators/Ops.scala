package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Shared operator utilities. */
object Ops {

  /** Ensure a compute-bound stage runs with cluster-wide parallelism even
    * when the source collapses to a handful of input splits (small files:
    * one parquet row-group = one task). Repartitions by `by` to
    * `defaultParallelism` only when the input has fewer partitions than
    * the cluster has slots — at 100 TB a real source has thousands of
    * splits and this is a no-op, so the extra shuffle is only ever paid
    * on inputs small enough for it to be cheap.
    *
    * The partition count is read from the physical plan's output
    * partitioning — NOT via `df.rdd`, which would force RDD conversion
    * (and whole-stage codegen compilation) of every composed query at
    * build time just to read one integer.
    */
  def spread(df: DataFrame, by: Column): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    val n = df.queryExecution.executedPlan.outputPartitioning.numPartitions
    if (n < par) df.repartition(par, by) else df
  }
}
