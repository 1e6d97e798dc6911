package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the driver's deterministic parquet corpus (TESTDATA.md).
  * One parquet file per table under `$dir/` — schema comes from the
  * parquet footer (explicit schemas belong to production sources; for the
  * read-only corpus the footer IS the contract).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.ts` has shipped in two physical forms across corpus
    * generations: TIMESTAMP(NANOS) (which Spark 4's converter rejects —
    * read nanos as Long via the legacy conf and convert with exact
    * integer division) and plain timestamp[us] with no zone (which
    * Spark infers as TIMESTAMP_NTZ). The event-time operators
    * (`unix_micros`, watermarks) require the session-zone TIMESTAMP
    * type, so the loader pins `ts` to it either way; the session is
    * pinned UTC (SparkSessionFactory), so the NTZ→LTZ cast is
    * value-preserving and both corpus generations load identically. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else if (name == "events" &&
             df.schema("ts").dataType == TimestampNTZType)
      df.withColumn("ts", expr("CAST(ts AS TIMESTAMP)"))
    else df
  }
}
