package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary profiling harness — not part of the library
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.001"
    def tryIt(name: String)(f: => Long): Unit =
      try println(s"$name OK rows=" + f)
      catch { case e: Throwable => println(s"$name FAIL: ${e.getMessage.take(150)}") }

    val s = spark
    tryIt("v1-basic") {
      Tables.load(s, d, "customer")
        .join(broadcast(Tables.load(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.load(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(count(lit(1)).as("n_cust"))
        .count()
    }
    tryIt("v2-no-broadcast") {
      Tables.load(s, d, "customer")
        .join(Tables.load(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.load(s, d, "region"), col("n_regionkey") === col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(count(lit(1)).as("n_cust"))
        .count()
    }
    tryIt("v3-preselect") {
      Tables.load(s, d, "customer")
        .join(broadcast(Tables.load(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.load(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .select("r_name", "n_name")
        .rollup("r_name", "n_name")
        .agg(count(lit(1)).as("n_cust"))
        .count()
    }
    tryIt("v4-col-rollup") {
      Tables.load(s, d, "customer")
        .join(broadcast(Tables.load(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.load(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"))
        .count()
    }
    tryIt("v5-plain-table") {
      Tables.load(s, d, "nation").rollup("n_regionkey", "n_name")
        .agg(count(lit(1)).as("n")).count()
    }
    tryIt("v6-toDF-first") {
      val j = Tables.load(s, d, "customer")
        .join(broadcast(Tables.load(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.load(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .select("r_name", "n_name")
      j.toDF("r_name", "n_name").rollup("r_name", "n_name")
        .agg(count(lit(1)).as("n_cust")).count()
    }
    tryIt("v1-with-sort") {
      Tables.load(s, d, "customer")
        .join(broadcast(Tables.load(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.load(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(count(lit(1)).as("n_cust"))
        .sort(asc_nulls_first("r_name"), asc_nulls_first("n_name"))
        .count()
    }
    spark.stop()
  }
}
