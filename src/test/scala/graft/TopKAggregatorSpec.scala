package graft

import org.apache.spark.sql.{Encoders}
import org.apache.spark.sql.functions._

import graft.functions.TopKAggregator

class TopKAggregatorSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val topk3 = udaf(new TopKAggregator(3),
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))

  test("keeps the k best by score desc, ties prefer the smaller id") {
    val df = Seq(
      ("g", 10.0, 1L), ("g", 30.0, 2L), ("g", 20.0, 3L),
      ("g", 30.0, 4L), ("g", 5.0, 5L)
    ).toDF("grp", "score", "id")
    val out = df.groupBy("grp").agg(topk3(col("score"), col("id")).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e._1").as("score"), col("e._2").as("id"))
      .as[(Double, Long)].collect().toSeq
    assert(out === Seq((30.0, 2L), (30.0, 4L), (20.0, 3L)),
      "desc by score, ties ascending by id, k=3 keeps best three")
  }

  test("groups smaller than k emit all their rows, sorted") {
    val df = Seq(("a", 1.0, 9L), ("a", 2.0, 8L)).toDF("grp", "score", "id")
    val out = df.groupBy("grp").agg(topk3(col("score"), col("id")).as("top"))
      .select(size(col("top"))).as[Int].collect()(0)
    assert(out === 2)
  }

  test("matches the window row_number formulation on real data") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val viaAgg = orders.groupBy("o_custkey")
      .agg(topk3(col("o_totalprice"), col("o_orderkey")).as("top"))
      .select(col("o_custkey"), posexplode(col("top")))
      .select(col("o_custkey"), (col("pos") + 1).as("rank"),
              col("col._2").as("o_orderkey"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = orders
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("o_custkey", "rank", "o_orderkey")
    assert(rendered(viaAgg) === rendered(viaWindow))
  }
}
