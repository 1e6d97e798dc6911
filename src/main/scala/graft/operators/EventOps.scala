package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-table operators: JSON props extraction, event-time windowed
  * aggregation, approximate distincts (SURVEY.md §2.10 E5–E7). */
object EventOps {

  /** Extract a scalar from the JSON `props` column (E5). get_json_object
    * is evaluated natively per row — no parse-to-struct materialization. */
  def extractProp(events: DataFrame, path: String,
                  as: String = "prop"): DataFrame =
    events.withColumn(as, get_json_object(col("props"), path))

  /** Batch event-time tumbling window aggregation (E6): count + sum(value)
    * per (window, event_type). One shuffle on the composite key; partial
    * aggregation happens map-side. */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value")).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"),
              col("n_events"), col("sum_value"))

  /** Approximate distinct users per event type (E7) — HLL sketch, constant
    * memory per group regardless of cardinality. */
  def approxDistinctUsers(events: DataFrame, rsd: Double = 0.05): DataFrame =
    events.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("approx_users"))
}
