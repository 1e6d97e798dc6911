package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Z-order layout: interleave correctness against a direct Scala
  * reference, quantize edge behavior, and the property the operator
  * exists for — per-file bounding rectangles tight enough that a
  * selective predicate on EITHER dimension prunes most files, where a
  * single-column sort only prunes on its own column. */
class LayoutSpec extends SparkTestBase {

  private def refZ(dims: Seq[Long], bits: Int): Long =
    (0 until bits).flatMap { i =>
      dims.zipWithIndex.map { case (v, j) =>
        ((v >> i) & 1L) << (i * dims.size + j)
      }
    }.sum

  test("zvalue matches the direct bit-interleave on random points") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(200)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val df = spark.createDataFrame(pts).toDF("x", "y")
      .withColumn("z", Layout.zvalue(Seq(col("x"), col("y")), 8))
    df.collect().foreach { r =>
      assert(r.getLong(2) === refZ(Seq(r.getLong(0), r.getLong(1)), 8))
    }
  }

  test("zvalue interleaves three dimensions") {
    val df = spark.range(1).select(
      Layout.zvalue(Seq(lit(5L), lit(3L), lit(6L)), 4).as("z"))
    // 5=0101, 3=0011, 6=0110 → bit i*3+j of dim j
    assert(df.head.getLong(0) === refZ(Seq(5L, 3L, 6L), 4))
  }

  test("quantize clamps, is monotonic, and spans the full bit range") {
    val df = spark.range(-50, 1050).select(
      col("id"), Layout.quantize(col("id"), 0L, 1000L, 8).as("q"))
    val rows = df.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.head._2 === 0L, "below-lo clamps to 0")
    assert(rows.last._2 === 255L, "above-hi clamps to 2^bits-1")
    rows.sliding(2).foreach { case Array((_, a), (_, b)) =>
      assert(a <= b, "quantize must be monotonic")
    }
    assert(rows.map(_._2).distinct.length === 256, "full range used")
  }

  test("zvalue stays in exact long arithmetic (no double division)") {
    val schema = Layout.quantize(lit(999999999999L), 0L, 1000000000000L, 16)
    val df = spark.range(1).select(schema.as("q"))
    assert(df.schema("q").dataType.typeName === "long")
    assert(df.head.getLong(0) === (999999999999L * 65535L) / 1000000000000L)
  }

  test("clusterBy yields tight per-partition rectangles on both dims") {
    val rnd = new scala.util.Random(11)
    val pts = Seq.fill(20000)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    val df = spark.createDataFrame(pts).toDF("x", "y")
    val nPart = 16

    def rects(laid: org.apache.spark.sql.DataFrame) =
      laid.groupBy(spark_partition_id().as("p"))
        .agg(min("x").as("x0"), max("x").as("x1"),
          min("y").as("y0"), max("y").as("y1"))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    val zRects = rects(Layout.clusterBy(
      df, Seq((col("x"), 0L, 1024L), (col("y"), 0L, 1024L)), nPart, bits = 8))
    val xRects = rects(df.repartitionByRange(nPart, col("x"))
      .sortWithinPartitions("x"))

    // files whose rectangle intersects a narrow band on Y — the
    // dimension the single-column layout did NOT sort on
    def hitY(rs: Array[(Long, Long, Long, Long)]) =
      rs.count { case (_, _, y0, y1) => y1 >= 100 && y0 <= 163 }
    assert(hitY(xRects) === xRects.length,
      "x-sorted layout cannot prune a y-band: every file intersects")
    assert(hitY(zRects) <= zRects.length / 2,
      s"z-order must prune most files for a 1/16 y-band: " +
        s"${hitY(zRects)} of ${zRects.length} hit")
    // and it still prunes on X too (z-order trades a constant factor,
    // not the ability to skip)
    val hitX = zRects.count { case (x0, x1, _, _) => x1 >= 100 && x0 <= 163 }
    assert(hitX <= zRects.length / 2,
      s"z-order must also prune an x-band: $hitX of ${zRects.length} hit")
  }

  test("clusterBy plans one range exchange and stays codegen'd") {
    val df = spark.range(1000).select(
      col("id").as("x"), (col("id") * 7 % 1000).as("y"))
    val laid = Layout.clusterBy(
      df, Seq((col("x"), 0L, 1000L), (col("y"), 0L, 1000L)), 4, bits = 8)
    laid.collect() // finalize the adaptive plan so codegen spans show
    val whole = laid.queryExecution.executedPlan.toString
    // the adaptive dump repeats the tree as Final + Initial — assert on
    // the final section only
    val p = whole.split("== Initial Plan ==")(0)
    assert("rangepartitioning".r.findAllIn(p.toLowerCase).size === 1,
      s"exactly one range exchange:\n$p")
    assert(p.contains("*(1) Project"),
      s"z-value must stay inside a whole-stage-codegen'd project:\n$p")
    assert(!p.toLowerCase.contains("batchevalpython") &&
      !p.contains("UDF"), s"no UDFs in the layout path:\n$p")
  }

  test("hilbertValue: bijective on the grid and every consecutive pair " +
       "of indices is a grid NEIGHBOR — the property Morton lacks") {
    import spark.implicits._
    val bits = 4
    val grid = (for (x <- 0 until 16; y <- 0 until 16)
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val out = grid.select(col("x"), col("y"),
        Layout.hilbertValue(col("x"), col("y"), bits).as("h"))
      .as[(Long, Long, Long)].collect()
    assert(out.map(_._3).toSet === (0L until 256L).toSet,
      "16x16 grid must map bijectively onto [0, 256)")
    val byH = out.map(r => r._3 -> (r._1, r._2)).toMap
    (0L until 255L).foreach { h =>
      val (x1, y1) = byH(h); val (x2, y2) = byH(h + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L,
        s"consecutive Hilbert indices $h,${h + 1} must be grid neighbors")
    }
    // Morton, by contrast, jumps: count the non-adjacent consecutive
    // pairs to pin WHY the Hilbert variant exists
    val mor = grid.select(col("x"), col("y"),
        Layout.zvalue(Seq(col("x"), col("y")), bits).as("z"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._3 -> (r._1, r._2)).toMap
    val jumps = (0L until 255L).count { z =>
      val (x1, y1) = mor(z); val (x2, y2) = mor(z + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1L
    }
    assert(jumps > 0, "Morton must show quadrant jumps on the same grid")
  }

  test("clusterByHilbert: range runs sort by the curve; guards are loud") {
    import spark.implicits._
    val df = (for (x <- 0L until 32L; y <- 0L until 32L)
      yield (x, y)).toDF("a", "b")
    val out = Layout.clusterByHilbert(df,
      Seq((col("a"), 0L, 32L), (col("b"), 0L, 32L)),
      numPartitions = 4, bits = 5)
    assert(out.count() === 1024L)
    intercept[IllegalArgumentException] {
      Layout.clusterByHilbert(df, Seq((col("a"), 0L, 32L)), 4)
    }
    intercept[IllegalArgumentException] {
      Layout.hilbertValue(col("a"), col("b"), 0)
    }
    // the EXPRESSION validates bits too — the SQL surface constructs
    // it directly, where bits=0 would silently shift by -1
    intercept[IllegalArgumentException] {
      org.apache.spark.sql.graft.VectorExprs.hilbertD2(
        col("a"), col("b"), 0)
    }
    intercept[IllegalArgumentException] {
      org.apache.spark.sql.graft.VectorExprs.hilbertD2(
        col("a"), col("b"), 32)
    }
  }
}
