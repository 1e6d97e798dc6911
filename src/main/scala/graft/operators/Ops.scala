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
