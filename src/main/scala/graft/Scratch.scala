package graft

// temporary profiling harness — not part of the library
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSessionFactory.create(
      master = "local[32]", shufflePartitions = 32)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    if (args.headOption.contains("apj-profile")) {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val threshold = 0.6
      val docs = Tables.load(spark, d, "documents")
      val sh = operators.Ops.spread(
          docs.select(col("doc_id"), col("text")), col("doc_id"))
        .select(col("doc_id"),
          operators.Dedup.shingleCol(col("text"), 3).as("sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      for (i <- 1 to 2) time(s"sh count $i")(println(sh.count()))
      val toks = sh.select(col("doc_id"), size(col("sh")).as("sz"),
        explode(col("sh")).as("tok"))
      time("toks")(println(toks.count()))
      val dfCounts = toks.groupBy("tok").agg(count(lit(1)).as("tok_df"))
      time("dfCounts")(println(dfCounts.count()))
      val ordered = toks.join(dfCounts, "tok")
      val pw = Window.partitionBy(col("doc_id"))
        .orderBy(col("tok_df"), col("tok"))
      val prefixLen = col("sz") -
        ceil(col("sz") * threshold - lit(1e-9)).cast("int") + 1
      val prefix = ordered
        .withColumn("__pos", row_number().over(pw))
        .filter(col("__pos") <= prefixLen)
        .select(col("doc_id"), col("sz"), col("tok"))
      time("prefix")(println(prefix.count()))
      val joined = prefix.as("pa")
        .join(prefix.as("pb"),
          col("pa.tok") === col("pb.tok") &&
            col("pa.doc_id") < col("pb.doc_id") &&
            least(col("pa.sz"), col("pb.sz")).cast("double") >=
              greatest(col("pa.sz"), col("pb.sz")) * threshold - lit(1e-9))
        .select(col("pa.doc_id").as("doc_a"), col("pb.doc_id").as("doc_b"))
      time("cand raw")(println(joined.count()))
      val cand = joined.distinct()
      time("cand distinct")(println(cand.count()))
      val fin = cand
        .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
        .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          (size(array_intersect(col("sha"), col("shb"))).cast("double") /
           size(array_union(col("sha"), col("shb")))).as("jaccard"))
        .filter(col("jaccard") >= threshold)
      time("final")(println(fin.count()))
      time("final again")(println(fin.count()))
    } else {
      for (q <- args; i <- 1 to 3) {
        val fn = SparkEntry.queries(q)
        time(s"$q run$i")(println(s"rows=" + fn(spark, d).count()))
      }
    }
    spark.stop()
  }
}
