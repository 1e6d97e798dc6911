package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary diagnostic harness — not part of the library
object Diag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[diag] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.load(spark, d, "documents").select("doc_id", "text")
    val toks = split(col("text"), " ")
    val perturbed = docs.select(
      (col("doc_id") + 1000000).as("doc_id"),
      concat_ws(" ", slice(toks, lit(1), greatest(size(toks) - 2, lit(1))))
        .as("text"))
    val all = docs.union(perturbed)

    spark.range(1 << 20).selectExpr("sum(id)").collect()
    val hashed = operators.Dedup.simhashDf(all, "doc_id", "text")
    for (i <- 1 to 3)
      time(s"simhashDf count $i")(println("[diag] docs=" + hashed.count()))
    // bucket skew: how big do the 16-bit chunk buckets get?
    val chunked = hashed.select(col("doc_id"),
      explode(transform(sequence(lit(0), lit(3)),
        c => struct(c.as("chunk_id"),
          call_function("shiftrightunsigned", col("simhash"), (c * 16).cast("int"))
            .bitwiseAND(0xFFFFL).as("chunk_val")))).as("ch"))
      .select(col("doc_id"), col("ch.chunk_id"), col("ch.chunk_val"))
    time("bucket skew") {
      chunked.groupBy("chunk_id", "chunk_val").count()
        .orderBy(desc("count")).limit(10).collect()
        .foreach(r => println("[diag] bucket " + r))
      val pairs = chunked.groupBy("chunk_id", "chunk_val")
        .agg(count(lit(1)).as("n"))
        .agg(sum(col("n") * (col("n") - 1) / 2)).collect()(0)
      println("[diag] total candidate pairs = " + pairs)
    }
    for (i <- 1 to 3)
      time(s"full simhashNearDups count $i")(println("[diag] out=" +
        operators.Dedup.simhashNearDups(all, "doc_id", "text", 3).count()))
    spark.stop()
  }
}
