package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Loaders for the driver's deterministic parquet corpus (TESTDATA.md).
  * One parquet file per table under `$dir/` — schema comes from the
  * parquet footer (explicit schemas belong to production sources; for the
  * read-only corpus the footer IS the contract).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark 4's converter
    * rejects outright. Read nanos as Long (legacy conf) and convert with
    * exact integer division to a microsecond timestamp — the corpus is
    * µs-precision, so the conversion is lossless. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }
}
