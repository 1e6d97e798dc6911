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
    for (q <- args; i <- 1 to 3) {
      val fn = SparkEntry.queries(q)
      time(s"$q run$i")(println(s"rows=" + fn(spark, d).count()))
    }
    spark.stop()
  }
}
