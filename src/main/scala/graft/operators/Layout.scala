package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering for scan pruning.
  *
  * A table range-partitioned on ONE column gives tight per-file zone
  * maps on that column and useless ones on every other; a query that
  * filters on a second dimension scans everything. Z-ordering (Morton
  * codes) interleaves the bits of several dimensions into one sort key,
  * so files that are contiguous in z-value cover small hyper-rectangles
  * of the original space — per-file min/max stats stay tight on ALL
  * interleaved dimensions at once, and a selective predicate on any of
  * them skips most files (the layout trick behind Delta's `OPTIMIZE
  * ZORDER BY` and Databricks' liquid clustering). At 100 TB the
  * difference is a few buckets touched instead of a full scan for every
  * second-dimension query.
  *
  * Everything here is closed-form integer arithmetic over built-in
  * bit expressions — whole-stage-codegen'd, UDF-free, and bit-exactly
  * reproducible in any engine (the q_zorder oracle replays the same
  * formula in SQL).
  */
object Layout {

  /** `v` clamped to [lo, hi] and scaled to an integer in
    * [0, 2^bits) by integer arithmetic:
    * `((v - lo) * (2^bits - 1)) / (hi - lo)`. Exact (no floating
    * point), monotonic, and reproducible; callers pass the column's
    * known-or-profiled bounds (stale bounds only loosen clustering,
    * never break correctness, because of the clamp). */
  def quantize(v: Column, lo: Long, hi: Long, bits: Int): Column = {
    require(bits >= 1 && bits <= 62, s"bits out of range: $bits")
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    val span = hi - lo
    val maxQ = (1L << bits) - 1
    require(span <= Long.MaxValue / maxQ,
      "span * (2^bits - 1) must fit in a Long — use fewer bits")
    val clamped = least(greatest(v.cast("long"), lit(lo)), lit(hi))
    // `div`, not `/`: Divide on longs is a DOUBLE divide in Spark —
    // IntegralDivide keeps the whole formula in exact Long arithmetic
    call_function("div", (clamped - lit(lo)) * lit(maxQ), lit(span))
  }

  /** Morton / Z-value of already-quantized dimensions: output bit
    * `i*n + j` is bit `i` of `dims(j)` (n = dims.size), so consecutive
    * z-values differ in low-order bits of every dimension at once.
    * Inputs must be in [0, 2^bits) — compose with [[quantize]].
    * Expression tree is `n*bits` shift/and/or terms of built-ins —
    * inside whole-stage codegen, no UDF. */
  def zvalue(dims: Seq[Column], bits: Int): Column = {
    val n = dims.size
    require(n >= 1, "need at least one dimension")
    require(bits >= 1 && n * bits <= 62,
      s"n*bits must fit a Long: $n * $bits")
    dims.zipWithIndex.map { case (d, j) =>
      (0 until bits).map { i =>
        shiftleft(shiftright(d.cast("long"), i).bitwiseAND(lit(1L)),
          i * n + j)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** Cluster `df` for multi-dimensional pruning: range-partition into
    * `numPartitions` z-value runs and sort each run, so every output
    * file covers one small hyper-rectangle of the quantized space.
    * `dims` are (column, lo, hi) bounds fed through [[quantize]].
    * One range-exchange (sampled boundaries — no skew pileup even when
    * dimensions correlate) plus an in-partition sort; write the result
    * straight out with any sink to get prunable files. */
  def clusterBy(df: DataFrame, dims: Seq[(Column, Long, Long)],
                numPartitions: Int, bits: Int = 16,
                zCol: String = "__z"): DataFrame = {
    require(numPartitions >= 1)
    val z = zvalue(dims.map { case (c, lo, hi) => quantize(c, lo, hi, bits) },
      bits)
    df.withColumn(zCol, z)
      .repartitionByRange(numPartitions, col(zCol))
      .sortWithinPartitions(zCol)
  }

  /** 2-D Hilbert-curve index of two quantized dimensions — the
    * stronger space-filling curve beside [[zvalue]]: consecutive
    * Hilbert indices are ALWAYS grid neighbors (Manhattan distance 1),
    * where consecutive Morton codes jump across quadrant boundaries,
    * so equal-size Hilbert runs cover more-compact rectangles and the
    * per-file zone maps come out tighter on both dimensions (the
    * measured q_hilbert-vs-q_zorder bucket extents make the difference
    * concrete). Native codegen'd expression — the per-level frame
    * rotation is sequential state a column formula can't carry without
    * a ~3×-per-level expression blow-up. Inputs must be in
    * [0, 2^bits) — compose with [[quantize]]. */
  def hilbertValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    org.apache.spark.sql.graft.VectorExprs.hilbertD2(
      x.cast("long"), y.cast("long"), bits)
  }

  /** [[clusterBy]] with the Hilbert key: range-partition into
    * `numPartitions` Hilbert runs and sort each run. Exactly two
    * dimensions (the d=2 curve; for 3+ dims use [[clusterBy]]'s
    * Morton key, whose interleave generalizes). */
  def clusterByHilbert(df: DataFrame, dims: Seq[(Column, Long, Long)],
                       numPartitions: Int, bits: Int = 16,
                       hCol: String = "__h"): DataFrame = {
    require(numPartitions >= 1)
    require(dims.size == 2, s"Hilbert layout is 2-D, got ${dims.size} dims")
    val Seq((cx, lox, hix), (cy, loy, hiy)) = dims
    val h = hilbertValue(quantize(cx, lox, hix, bits),
      quantize(cy, loy, hiy, bits), bits)
    df.withColumn(hCol, h)
      .repartitionByRange(numPartitions, col(hCol))
      .sortWithinPartitions(hCol)
  }
}
