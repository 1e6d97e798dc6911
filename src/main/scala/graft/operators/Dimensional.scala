package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dimensional-modeling operators — the slowly-changing-dimension
  * machinery the reference's star-schema ETL implies but never wrote
  * down (its users table is an SCD-1 "latest wins" built with a window,
  * /root/reference/etl_pipeline.py:143–154).
  */
object Dimensional {

  /** SCD-1 upsert (MERGE semantics without a table format): rows from
    * `updates` replace target rows with the same key; unmatched target
    * rows survive; brand-new keys append. One anti-join — the updates
    * side broadcasts when under the join threshold, so the target side
    * streams through unshuffled. Rewriting only affected partitions is
    * the caller's write-side concern (partition the sink by a
    * key-derived column and use dynamic partition overwrite).
    *
    * `updates` must hold ONE row per key, like SQL MERGE's source (a
    * duplicate would survive into the output and fan out downstream
    * joins); replaying a change log? pass `versionCol` and the highest
    * version per key wins (latest-wins pre-dedup, the reference's users
    * table rule — etl_pipeline.py:143–154). */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String],
             versionCol: Option[String] = None): DataFrame = {
    require(keys.nonEmpty)
    val ups = versionCol match {
      case Some(v) =>
        Dedup.dedupKeepFirst(updates, keys.map(col), Seq(col(v).desc))
      case None => updates
    }
    // no distinct() on the build side: left_anti is unaffected by
    // duplicate build rows, and the aggregate would cost an exchange
    ups.unionByName(
      target.join(ups.select(keys.map(col): _*), keys, "left_anti"))
  }

  /** SCD-2 effective-dated history from a change log: each (key-ordered)
    * change row becomes a version valid from its own timestamp until the
    * next change's ([valid_from, valid_to)); the last version per key is
    * open-ended and flagged current. `tieBreak` columns make the order
    * total when one key can change twice at the same timestamp. One
    * shuffle on the key; the lead window reuses its partitioning. */
  def scd2(changes: DataFrame, key: String, tsCol: String,
           tieBreak: Seq[String] = Nil): DataFrame = {
    val clobbered = Seq("valid_from", "valid_to", "is_current")
      .filter(changes.columns.map(_.toLowerCase).contains)
    require(clobbered.isEmpty,
      s"input already has ${clobbered.mkString(", ")} — scd2 over an " +
        "existing SCD-2 table would silently overwrite its history " +
        "columns; drop or rename them first")
    val ord: Seq[Column] = col(tsCol) +: tieBreak.map(col)
    val w = Window.partitionBy(key).orderBy(ord: _*)
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  private val SumDec = org.apache.spark.sql.types.DecimalType(18, 6)

  /** The maintainable grouped summary (count + Decimal-exact sum) —
    * build it ONCE over a snapshot, then roll it forward with
    * [[maintainSummary]] instead of rescanning the table. The sum stays
    * a Decimal column so incremental maintenance is bit-exact; cast to
    * double only at the consumption edge. */
  def summarizeForMaintenance(df: DataFrame, groupCol: String,
                              valueCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
           sum(col(valueCol).cast(SumDec)).as("sum_dec"))

  /** Incremental view maintenance from a change-data-feed: apply a
    * [[graft.sources.ManifestTable.diff]] (Delta CDF vocabulary —
    * insert / delete / update_preimage / update_postimage) to a
    * previously built [[summarizeForMaintenance]] summary, producing
    * the summary of the NEW snapshot while reading only the changed
    * rows — the materialized-aggregate pattern that turns an O(table)
    * refresh into O(changes). Inserts and post-images add, deletes and
    * pre-images subtract (an update contributes both, so its net
    * effect is the value delta); groups whose count reaches zero drop
    * out. Decimal arithmetic end-to-end, so the rolled-forward summary
    * equals the from-scratch one bit-for-bit — `q_incremental_view`
    * pins exactly that equality against the oracle. */
  def maintainSummary(prev: DataFrame, cdf: DataFrame, groupCol: String,
                      valueCol: String): DataFrame = {
    val sgn = when(col("_change_type").isin("insert", "update_postimage"),
      1L).otherwise(-1L)
    val delta = cdf
      .groupBy(col(groupCol))
      .agg(sum(sgn).as("__dn"),
           sum(col(valueCol).cast(SumDec) * sgn).as("__dsum"))
    prev.join(delta, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("__dn"), lit(0L)))
          .as("n_rows"),
        (coalesce(col("sum_dec"), lit(0).cast(SumDec)) +
          coalesce(col("__dsum"), lit(0).cast(SumDec))).as("sum_dec"))
      .filter(col("n_rows") > 0)
  }
}
