package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions (with whole-stage codegen) for the hot math
  * in the similarity / dedup operators. Each replaces an interpreted
  * higher-order-function pipeline with a single tight loop that runs inside
  * the generated stage — the preference order the engine follows: built-in
  * functions, then native `Expression` with `doGenCode`, and only then
  * anything slower (SURVEY.md §7.3).
  *
  * Numeric contracts:
  *   - [[FloatDot]] accumulates in Double in index order — bit-identical to
  *     the sequential `aggregate(zip_with(...))` fold it replaces, and to
  *     DuckDB's `list_dot_product` (the correctness oracle for cosine).
  *   - Hashes use Spark's own XXH64 so values line up with the built-in
  *     `xxhash64` function's quality, seeded at 42 like Catalyst does.
  */
object VectorExprs {

  private val X = "org.apache.spark.sql.catalyst.expressions.XXH64"

  /** Dot product of two float-array columns, accumulated in Double in
    * index order. */
  case class FloatDot(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(FloatType), ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_float_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0; var i = 0
      while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** 64-bit SimHash of a string-array (token) column: per token hash, bit i
    * contributes +1/-1 to counter i; output bit i is sign(counter i). One
    * pass over the tokens — replaces an explode + 64-aggregate plan. */
  case class SimHash64(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_simhash64"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val counts = new Array[Int](64)
      var j = 0
      while (j < arr.numElements()) {
        if (!arr.isNullAt(j)) {
          val h = XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
          var i = 0
          while (i < 64) {
            counts(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1); i += 1
          }
        }
        j += 1
      }
      var sig = 0L; var i = 0
      while (i < 64) { if (counts(i) > 0) sig |= (1L << i); i += 1 }
      sig
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val counts = ctx.addMutableState("int[]", "simhashCounts",
        v => s"$v = new int[64];")
      nullSafeCodeGen(ctx, ev, a => {
        val j = ctx.freshName("j"); val i = ctx.freshName("i")
        val h = ctx.freshName("h"); val sig = ctx.freshName("sig")
        s"""
           |java.util.Arrays.fill($counts, 0);
           |for (int $j = 0; $j < $a.numElements(); $j++) {
           |  if (!$a.isNullAt($j)) {
           |    long $h = $X.hashUTF8String($a.getUTF8String($j), 42L);
           |    for (int $i = 0; $i < 64; $i++) {
           |      $counts[$i] += ((($h >>> $i) & 1L) == 1L) ? 1 : -1;
           |    }
           |  }
           |}
           |long $sig = 0L;
           |for (int $i = 0; $i < 64; $i++) {
           |  if ($counts[$i] > 0) $sig |= (1L << $i);
           |}
           |${ev.value} = $sig;
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** MinHash signature of a string-array (shingle) column: one base XXH64
    * per shingle, then `numHashes` cheap re-seeded long-hashes; output[i] =
    * min over shingles of hash_i. Empty input → all Long.MaxValue (callers
    * filter empty shingle sets). */
  case class MinHashSig(child: Expression, numHashes: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(numHashes > 0)
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_minhash_sig"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val mins = Array.fill[Long](numHashes)(Long.MaxValue)
      var j = 0
      while (j < arr.numElements()) {
        if (!arr.isNullAt(j)) {
          val base = XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
          var i = 0
          while (i < numHashes) {
            val h = XXH64.hashLong(base, i.toLong)
            if (h < mins(i)) mins(i) = h
            i += 1
          }
        }
        j += 1
      }
      UnsafeArrayData.fromPrimitiveArray(mins)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val mins = ctx.addMutableState("long[]", "minhashMins",
        v => s"$v = new long[$numHashes];")
      nullSafeCodeGen(ctx, ev, a => {
        val j = ctx.freshName("j"); val i = ctx.freshName("i")
        val base = ctx.freshName("base"); val h = ctx.freshName("h")
        s"""
           |java.util.Arrays.fill($mins, Long.MAX_VALUE);
           |for (int $j = 0; $j < $a.numElements(); $j++) {
           |  if (!$a.isNullAt($j)) {
           |    long $base = $X.hashUTF8String($a.getUTF8String($j), 42L);
           |    for (int $i = 0; $i < $numHashes; $i++) {
           |      long $h = $X.hashLong($base, (long) $i);
           |      if ($h < $mins[$i]) $mins[$i] = $h;
           |    }
           |  }
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
           |  .fromPrimitiveArray($mins);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Random-hyperplane LSH signature of a float-vector column: bit p =
    * sign(<v, plane_p>), plane components derived deterministically from
    * XXH64(dim, XXH64(plane, 42)) mapped to [-1, 1) — no RNG state, so
    * signatures are reproducible across runs and engines. */
  case class LshSign64(child: Expression, numPlanes: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(numPlanes > 0 && numPlanes <= 64)
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_lsh_sign64"

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val n = v.numElements()
      var sig = 0L
      var p = 0
      while (p < numPlanes) {
        val seed = XXH64.hashInt(p, 42L)
        var dot = 0.0; var i = 0
        while (i < n) {
          val comp = XXH64.hashInt(i, seed).toDouble / Long.MaxValue.toDouble
          dot += v.getFloat(i).toDouble * comp
          i += 1
        }
        if (dot > 0) sig |= (1L << p)
        p += 1
      }
      sig
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n"); val p = ctx.freshName("p")
        val i = ctx.freshName("i"); val seed = ctx.freshName("seed")
        val dot = ctx.freshName("dot"); val comp = ctx.freshName("comp")
        val sig = ctx.freshName("sig")
        s"""
           |int $n = $a.numElements();
           |long $sig = 0L;
           |for (int $p = 0; $p < $numPlanes; $p++) {
           |  long $seed = $X.hashInt($p, 42L);
           |  double $dot = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    double $comp = (double) $X.hashInt($i, $seed) / (double) Long.MAX_VALUE;
           |    $dot += (double) $a.getFloat($i) * $comp;
           |  }
           |  if ($dot > 0) $sig |= (1L << $p);
           |}
           |${ev.value} = $sig;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // ---- Column-level API ----

  def floatDot(a: Column, b: Column): Column =
    ExprBridge.column(FloatDot(ExprBridge.expression(a), ExprBridge.expression(b)))

  def simhash64(tokens: Column): Column =
    ExprBridge.column(SimHash64(ExprBridge.expression(tokens)))

  def minhashSig(shingles: Column, numHashes: Int): Column =
    ExprBridge.column(MinHashSig(ExprBridge.expression(shingles), numHashes))

  def lshSign64(vec: Column, numPlanes: Int): Column =
    ExprBridge.column(LshSign64(ExprBridge.expression(vec), numPlanes))
}
