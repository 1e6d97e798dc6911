package graft
// temporary diagnostic - deleted before commit
object ProbeBpe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSessionFactory.create(
      master = "local[32]", shufflePartitions = 32, appName = "probe")
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    val d = "/root/testdata/sf0.1"
    for (_ <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries("q_bpe_merges")(spark, d).count()
      println(f"q_bpe_merges: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
