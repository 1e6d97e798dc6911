package graft

/** Quick smoke of the driver's entry() contract: prints the flagship
  * query's row count and first rows. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSessionFactory.create()
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"[smoke] entry rows=${rows.length}")
    rows.take(5).foreach(r => println(s"[smoke] $r"))
    spark.stop()
  }
}
