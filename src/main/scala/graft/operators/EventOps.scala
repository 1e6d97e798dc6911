package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-table operators: JSON props extraction, event-time windowed
  * aggregation, approximate distincts, batch sessionization
  * (SURVEY.md §2.10 E5–E7). */
object EventOps {

  /** Gap-based sessionization over a static table — the batch twin of
    * StreamOps.sessionize, same session semantics: a session ends after
    * `gapMs` of event-time silence per user.
    *
    * Classic two-window formulation: flag rows whose gap to the previous
    * event exceeds the threshold (lag), number sessions with a running
    * sum of flags, aggregate per (user, session). One shuffle on the
    * user key; both windows share its partitioning, so no second
    * exchange. */
  def sessionizeBatch(events: DataFrame, gapMs: Long,
                      userCol: String = "user_id", tsCol: String = "ts",
                      valueCol: String = "value"): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(tsCol)
    val running = byUser.rowsBetween(Window.unboundedPreceding,
                                     Window.currentRow)
    val newSession: Column =
      when(lag(col(tsCol), 1).over(byUser).isNull ||
           unix_millis(col(tsCol)) -
             unix_millis(lag(col(tsCol), 1).over(byUser)) > gapMs,
        1L).otherwise(0L)
    events
      .withColumn("__new", newSession)
      .withColumn("__sid", sum(col("__new")).over(running))
      .groupBy(col(userCol), col("__sid"))
      .agg(min(col(tsCol)).as("session_start"),
           max(col(tsCol)).as("session_end"),
           count(lit(1)).as("n_events"),
           sum(col(valueCol).cast(DecimalType(18, 6))).cast("double")
             .as("sum_value"))
      .drop("__sid")
  }

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
