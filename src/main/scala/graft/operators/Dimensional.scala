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
    * side is typically small and broadcasts; the target side streams
    * through unshuffled. Rewriting only affected partitions is the
    * caller's write-side concern (partition the sink by a key-derived
    * column and use dynamic partition overwrite). */
  def upsert(target: DataFrame, updates: DataFrame,
             keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty)
    updates.unionByName(
      target.join(updates.select(keys.map(col): _*).distinct(),
        keys, "left_anti"))
  }

  /** SCD-2 effective-dated history from a change log: each (key-ordered)
    * change row becomes a version valid from its own timestamp until the
    * next change's ([valid_from, valid_to)); the last version per key is
    * open-ended and flagged current. `tieBreak` columns make the order
    * total when one key can change twice at the same timestamp. One
    * shuffle on the key; the lead window reuses its partitioning. */
  def scd2(changes: DataFrame, key: String, tsCol: String,
           tieBreak: Seq[String] = Nil): DataFrame = {
    val ord: Seq[Column] = col(tsCol) +: tieBreak.map(col)
    val w = Window.partitionBy(key).orderBy(ord: _*)
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
