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
    * index order.
    *
    * Degenerate-input semantics MATCH the portable
    * `aggregate(zip_with(a, b, (x, y) => x * y), 0.0, _ + _)` fold on
    * every input, not just well-formed ones: arrays of unequal length
    * yield NULL (zip_with null-pads the shorter side, poisoning the sum)
    * and a NULL element yields NULL (null product → null sum). This is
    * what makes [[graft.plans.RewriteHofDot]] a sound rewrite on ALL
    * user data — ragged or null-holding arrays return the same NULL the
    * HOF formulation returns — with no interpreted guard expressions
    * around the native loop. */
  case class FloatDot(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(FloatType), ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    // can return NULL even for non-null inputs (ragged / null element)
    override def nullable: Boolean = true
    override def prettyName: String = "graft_float_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) return null
      var s = 0.0; var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1
      }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $s = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
           |  }
           |  if (!${ev.isNull}) ${ev.value} = $s;
           |}
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

  /** Cosine similarity of two float-array columns in ONE pass: dot,
    * |a|², |b|² accumulate together (each in Double, index order — the
    * same values as composing three [[FloatDot]] calls, so results are
    * bit-identical to dot/(sqrt·sqrt) and to the DuckDB oracle), then
    * dot / (sqrt(na)·sqrt(nb)). One array traversal instead of three. */
  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(FloatType), ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_cosine"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val xv = x.getFloat(i).toDouble; val yv = y.getFloat(i).toDouble
        dot += xv * yv; na += xv * xv; nb += yv * yv; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $xv = (double) $a.getFloat($i);
           |  double $yv = (double) $b.getFloat($i);
           |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
           |}
           |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Word n-gram shingle hashes of a token array: out[j] =
    * XXH64(concat_ws(" ", tokens[j ..< min(j+n, len)]), seed=42) for
    * j in 0 .. max(len - n, 0). Hash values equal
    * `xxhash64(concat_ws(" ", slice(tokens, j+1, n)))` — the built-in
    * formulation this replaces — but the whole loop lives in one
    * codegen'd expression instead of nested interpreted higher-order
    * functions (transform + slice + concat_ws per shingle). */
  case class ShingleHash64(child: Expression, n: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(n > 0)
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_shingle_hash"

    private val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val m = arr.numElements()
      // No tokens → no shingles. Without this, every empty input would
      // share the hash of the empty string — a degenerate LSH bucket.
      val cnt = if (m == 0) 0 else math.max(m - n, 0) + 1
      val out = new Array[Long](cnt)
      var j = 0
      while (j < cnt) {
        val end = math.min(j + n, m)
        val parts = new Array[org.apache.spark.unsafe.types.UTF8String](end - j)
        var i = j
        while (i < end) {
          // null stays null: UTF8String.concatWs skips null inputs, the
          // same rule as the concat_ws formulation these hashes mirror
          parts(i - j) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
          i += 1
        }
        out(j) = XXH64.hashUTF8String(
          org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*), 42L)
        j += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val u = "org.apache.spark.unsafe.types.UTF8String"
      val sepRef = ctx.addMutableState(u, "shingleSep",
        v => s"""$v = $u.fromString(" ");""")
      nullSafeCodeGen(ctx, ev, a => {
        val m = ctx.freshName("m"); val cnt = ctx.freshName("cnt")
        val out = ctx.freshName("out"); val j = ctx.freshName("j")
        val end = ctx.freshName("end"); val parts = ctx.freshName("parts")
        val i = ctx.freshName("i")
        s"""
           |int $m = $a.numElements();
           |int $cnt = ($m == 0) ? 0 : java.lang.Math.max($m - $n, 0) + 1;
           |long[] $out = new long[$cnt];
           |for (int $j = 0; $j < $cnt; $j++) {
           |  int $end = java.lang.Math.min($j + $n, $m);
           |  $u[] $parts = new $u[$end - $j];
           |  for (int $i = $j; $i < $end; $i++) {
           |    $parts[$i - $j] = $a.isNullAt($i)
           |      ? null : $a.getUTF8String($i);
           |  }
           |  $out[$j] = $X.hashUTF8String($u.concatWs($sepRef, $parts), 42L);
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
           |  .fromPrimitiveArray($out);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** MinHash signature over pre-hashed shingles: signature[i] = min over
    * elements h of XXH64(h, seed=i). Feeding it [[ShingleHash64]] output
    * gives exactly the same signature as [[MinHashSig]] over the string
    * shingles (same base hash), with the string work done once. */
  case class MinHashFromHashes(child: Expression, numHashes: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(numHashes > 0)
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_minhash_from_hashes"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val mins = Array.fill[Long](numHashes)(Long.MaxValue)
      var j = 0
      while (j < arr.numElements()) {
        if (!arr.isNullAt(j)) {
          val base = arr.getLong(j)
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
      val mins = ctx.addMutableState("long[]", "minhashHMins",
        v => s"$v = new long[$numHashes];")
      nullSafeCodeGen(ctx, ev, a => {
        val j = ctx.freshName("j"); val i = ctx.freshName("i")
        val base = ctx.freshName("base"); val h = ctx.freshName("h")
        s"""
           |java.util.Arrays.fill($mins, Long.MAX_VALUE);
           |for (int $j = 0; $j < $a.numElements(); $j++) {
           |  if (!$a.isNullAt($j)) {
           |    long $base = $a.getLong($j);
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

  /** LSH band hashes of a minhash signature: out[b] = fold of
    * XXH64.hashLong over signature rows b*r ..< (b+1)*r starting at seed
    * 42 — one long per band, ready for posexplode into (band_id,
    * band_hash) pairs with no string building. */
  case class BandHashes64(child: Expression, bands: Int, r: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(bands > 0 && r > 0)
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_band_hashes"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val out = new Array[Long](bands)
      var b = 0
      while (b < bands) {
        var h = 42L
        var i = b * r
        val end = math.min((b + 1) * r, arr.numElements())
        while (i < end) { h = XXH64.hashLong(arr.getLong(i), h); i += 1 }
        out(b) = h
        b += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val out = ctx.freshName("out"); val b = ctx.freshName("b")
        val h = ctx.freshName("h"); val i = ctx.freshName("i")
        val end = ctx.freshName("end")
        s"""
           |long[] $out = new long[$bands];
           |for (int $b = 0; $b < $bands; $b++) {
           |  long $h = 42L;
           |  int $end = java.lang.Math.min(($b + 1) * $r, $a.numElements());
           |  for (int $i = $b * $r; $i < $end; $i++) {
           |    $h = $X.hashLong($a.getLong($i), $h);
           |  }
           |  $out[$b] = $h;
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
           |  .fromPrimitiveArray($out);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Word n-gram shingle STRINGS of a token array — full windows only:
    * out[j] = concat_ws(" ", tokens[j ..< j+n]) for j in 0 .. len-n, and
    * an empty array when len < n. The string twin of [[ShingleHash64]],
    * for operators whose output IS the n-gram (frequency tables); one
    * codegen'd loop instead of interpreted transform + slice + concat_ws
    * per window. */
  case class ShingleStrings(child: Expression, n: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(n > 0)
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_shingle_strings"

    private val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val m = arr.numElements()
      val cnt = if (m < n) 0 else m - n + 1
      val out = new Array[AnyRef](cnt)
      var j = 0
      while (j < cnt) {
        val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
        var i = 0
        while (i < n) {
          // null stays null — concatWs skips it, matching concat_ws
          parts(i) = if (arr.isNullAt(j + i)) null else arr.getUTF8String(j + i)
          i += 1
        }
        out(j) = org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*)
        j += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val u = "org.apache.spark.unsafe.types.UTF8String"
      val sepRef = ctx.addMutableState(u, "shingleStrSep",
        v => s"""$v = $u.fromString(" ");""")
      nullSafeCodeGen(ctx, ev, a => {
        val m = ctx.freshName("m"); val cnt = ctx.freshName("cnt")
        val out = ctx.freshName("out"); val j = ctx.freshName("j")
        val parts = ctx.freshName("parts"); val i = ctx.freshName("i")
        s"""
           |int $m = $a.numElements();
           |int $cnt = ($m < $n) ? 0 : $m - $n + 1;
           |Object[] $out = new Object[$cnt];
           |for (int $j = 0; $j < $cnt; $j++) {
           |  $u[] $parts = new $u[$n];
           |  for (int $i = 0; $i < $n; $i++) {
           |    $parts[$i] = $a.isNullAt($j + $i)
           |      ? null : $a.getUTF8String($j + $i);
           |  }
           |  $out[$j] = $u.concatWs($sepRef, $parts);
           |}
           |${ev.value} =
           |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Polynomial rolling hash over a string's UTF-16 characters:
    * h = fold(h * 31 + char) mod 1e9+7 — bit-identical to the
    * `aggregate(split(text, ""), ...)` HOF chain it replaces for BMP
    * text; one codegen'd loop instead of a per-character interpreted
    * fold. */
  case class PolyHash(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_polyhash"

    private val M = 1000000007L

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
      var h = 0L
      var i = 0
      while (i < s.length) { h = (h * 31 + s.charAt(i)) % M; i += 1 }
      h
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val s = ctx.freshName("s"); val h = ctx.freshName("h")
        val i = ctx.freshName("i")
        s"""
           |java.lang.String $s = $a.toString();
           |long $h = 0L;
           |for (int $i = 0; $i < $s.length(); $i++) {
           |  $h = ($h * 31 + $s.charAt($i)) % ${M}L;
           |}
           |${ev.value} = $h;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Shared Jaro–Winkler kernel, reachable from generated code (the
    * match/transposition loops need two scratch boolean arrays, so the
    * implementation lives in ONE static JVM method that whole-stage
    * codegen calls — the same shape Spark's own intrinsics use —
    * rather than inlined array-allocating codegen).
    *
    * Semantics pinned to DuckDB's `jaro_winkler_similarity` (the
    * correctness oracle): either side empty → 0.0 (even both-empty);
    * match window ⌊max(len)/2⌋−1; transpositions = half the
    * out-of-order matches; the Winkler prefix boost (ℓ ≤ 4, p = 0.1)
    * applies only when the Jaro score exceeds 0.7. Comparison is by
    * UTF-16 code unit — identical to DuckDB's per-character walk on
    * BMP text. */
  def jaroWinklerImpl(
      aU: org.apache.spark.unsafe.types.UTF8String,
      bU: org.apache.spark.unsafe.types.UTF8String): Double = {
    val a = aU.toString; val b = bU.toString
    val la = a.length; val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val ma = new Array[Boolean](la); val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!mb(j) && a.charAt(i) == b.charAt(j)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0; var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t / 2) / md) / 3.0
    if (jaro <= 0.7) jaro
    else {
      val lim = math.min(4, math.min(la, lb))
      var l = 0
      while (l < lim && a.charAt(l) == b.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    }
  }

  /** Jaro–Winkler similarity of two strings in [0, 1] — the record-
    * linkage comparator (names, addresses, titles) Spark lacks as a
    * built-in; see [[jaroWinklerImpl]] for the pinned semantics. Used
    * by the blocked fuzzy-match operators where edit distance
    * over-penalizes transposed tokens. */
  case class JaroWinkler(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(StringType, StringType)
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_jaro_winkler"

    override def nullSafeEval(a: Any, b: Any): Any =
      jaroWinklerImpl(
        a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = org.apache.spark.sql.graft.VectorExprs" +
          s".jaroWinklerImpl($a, $b);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Shannon entropy (nats) of a string's BYTE distribution — the
    * gibberish / binary-spill / repeated-filler quality gate (low entropy
    * flags "aaaa…"-style filler and template spam; anomalously high flags
    * encoded binary). One pass over the bytes plus a fixed 256-slot
    * histogram, fully inside whole-stage codegen — zero shuffle, scan-side
    * streamable at any corpus size.
    *
    * Engine-exact contract (the [[graft.operators.Profiling.distributionDrift]]
    * nanonat trick): each byte value contributes the INTEGER term
    * `cnt * round(ln(cnt)·1e9)`, summed as longs — order-independent, so
    * partition layout and evaluation order can't perturb the result — and
    * the closing `(round(ln(n)·1e9) − sumNano/n) / 1e9` is a fixed IEEE
    * sequence DuckDB replays bit-for-bit from its own per-char counts
    * (the driver corpus is ASCII, so bytes = characters there).
    * Empty string → 0.0 by convention. */
  case class ByteEntropy(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_byte_entropy"

    override def nullSafeEval(input: Any): Any = {
      val bytes =
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
      val n = bytes.length
      if (n == 0) 0.0
      else {
        val counts = new Array[Long](256)
        var i = 0
        while (i < n) { counts(bytes(i) & 0xFF) += 1; i += 1 }
        var sumNano = 0L
        var b = 0
        while (b < 256) {
          val c = counts(b)
          if (c > 0) sumNano += c * Math.round(Math.log(c.toDouble) * 1e9)
          b += 1
        }
        (Math.round(Math.log(n.toDouble) * 1e9) - sumNano.toDouble / n) / 1e9
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val counts = ctx.addMutableState("long[]", "entropyCounts",
        v => s"$v = new long[256];")
      nullSafeCodeGen(ctx, ev, a => {
        val bytes = ctx.freshName("bytes"); val n = ctx.freshName("n")
        val i = ctx.freshName("i"); val b = ctx.freshName("b")
        val c = ctx.freshName("c"); val sumNano = ctx.freshName("sumNano")
        s"""
           |byte[] $bytes = $a.getBytes();
           |int $n = $bytes.length;
           |if ($n == 0) {
           |  ${ev.value} = 0.0;
           |} else {
           |  java.util.Arrays.fill($counts, 0L);
           |  for (int $i = 0; $i < $n; $i++) { $counts[$bytes[$i] & 0xFF]++; }
           |  long $sumNano = 0L;
           |  for (int $b = 0; $b < 256; $b++) {
           |    long $c = $counts[$b];
           |    if ($c > 0) {
           |      $sumNano += $c * Math.round(Math.log((double) $c) * 1e9);
           |    }
           |  }
           |  ${ev.value} =
           |    (Math.round(Math.log((double) $n) * 1e9) - $sumNano / (double) $n)
           |      / 1e9;
           |}
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Morton (Z-order) interleave of the low 32 bits of two long columns:
    * bit i of `left` lands at position 2i, bit i of `right` at 2i+1. The
    * space-filling-curve sort key behind `Sources.writeZOrdered` — rows
    * sorted by it cluster in BOTH dimensions, so min/max row-group stats
    * prune scans filtered on either column. Branch-free mask-cascade
    * spreading, inside whole-stage codegen. */
  case class Interleave64(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_interleave"

    override def nullSafeEval(a: Any, b: Any): Any =
      Interleave64.morton(a.asInstanceOf[Long], b.asInstanceOf[Long])

    private def spreadJava(in: String, v: String): String =
      s"""
         |long $v = $in & 0xFFFFFFFFL;
         |$v = ($v | ($v << 16)) & 0x0000FFFF0000FFFFL;
         |$v = ($v | ($v << 8))  & 0x00FF00FF00FF00FFL;
         |$v = ($v | ($v << 4))  & 0x0F0F0F0F0F0F0F0FL;
         |$v = ($v | ($v << 2))  & 0x3333333333333333L;
         |$v = ($v | ($v << 1))  & 0x5555555555555555L;
       """.stripMargin

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val va = ctx.freshName("za"); val vb = ctx.freshName("zb")
        s"""
           |${spreadJava(a, va)}
           |${spreadJava(b, vb)}
           |${ev.value} = $va | ($vb << 1);
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  object Interleave64 {
    def spread(v0: Long): Long = {
      var v = v0 & 0xFFFFFFFFL
      v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
      v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
      v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
      v = (v | (v << 2)) & 0x3333333333333333L
      v = (v | (v << 1)) & 0x5555555555555555L
      v
    }
    def morton(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
  }

  /** 2-D Hilbert-curve index of two quantized long columns (the
    * classic xy2d walk, Warren/Wikipedia formulation): at each of
    * `bits` levels read one bit of each coordinate, accumulate the
    * quadrant's span, and rotate/reflect the frame. Unlike the Morton
    * interleave ([[Interleave64]]), CONSECUTIVE Hilbert indices are
    * always grid neighbors (Manhattan distance 1), so a run of indices
    * covers one connected blob — tighter per-file zone maps than
    * Z-order's quadrant jumps at the same sort cost.
    *
    * The rotation state is why this is a native expression and not a
    * column formula: as nested CASE columns the per-level frame rewrite
    * grows ~3× per level (CollapseProject inlines the chain), while
    * here it is one constant-size loop inside whole-stage codegen.
    * Inputs mask to the low `bits` bits (like [[Interleave64]] masks to
    * 32) — compose with `Layout.quantize`, which guarantees the domain. */
  case class HilbertD2(left: Expression, right: Expression, bits: Int)
      extends BinaryExpression with ExpectsInputTypes {
    // validated HERE, not only in Layout.hilbertValue: the SQL surface
    // (graft_hilbert) constructs the expression directly, and bits = 0
    // would silently shift by -1 (Java shift masking) while bits > 31
    // would overflow s*s in the raw codegen loop
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_hilbert"

    override def nullSafeEval(a: Any, b: Any): Any =
      HilbertD2.xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val x = ctx.freshName("hx"); val y = ctx.freshName("hy")
        val d = ctx.freshName("hd"); val s = ctx.freshName("hs")
        val rx = ctx.freshName("hrx"); val ry = ctx.freshName("hry")
        val t = ctx.freshName("ht")
        val mask = (1L << bits) - 1
        s"""
           |long $x = $a & ${mask}L;
           |long $y = $b & ${mask}L;
           |long $d = 0L;
           |for (long $s = 1L << ${bits - 1}; $s > 0; $s >>= 1) {
           |  long $rx = (($x & $s) > 0) ? 1L : 0L;
           |  long $ry = (($y & $s) > 0) ? 1L : 0L;
           |  $d += $s * $s * ((3L * $rx) ^ $ry);
           |  if ($ry == 0L) {
           |    if ($rx == 1L) { $x = $s - 1L - $x; $y = $s - 1L - $y; }
           |    long $t = $x; $x = $y; $y = $t;
           |  }
           |}
           |${ev.value} = $d;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  object HilbertD2 {
    def xy2d(a: Long, b: Long, bits: Int): Long = {
      val mask = (1L << bits) - 1
      var x = a & mask; var y = b & mask
      var d = 0L
      var s = 1L << (bits - 1)
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3L * rx) ^ ry)
        if (ry == 0L) {
          if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      d
    }
  }

  /** Product-quantization encode: for each of `m` subspaces of a
    * float-vector column, the argmin-squared-L2 code against a codebook
    * BOUND INTO the expression (j-major, code-minor flat layout; the
    * codebook is model state, codebook-sized, so it rides the expression
    * like LSH planes ride [[LshSign64]]). One tight loop per row, no
    * explode/join/window anywhere — the scan-shaped encode a 10^11-vector
    * corpus needs.
    *
    * Numeric contract: d2 = dot(sub,sub) − 2·dot(sub,cent) + dot(cent,cent)
    * with every dot accumulated in Double in index order ([[FloatDot]]'s
    * contract) and the subtraction/addition in that association — bit-
    * identical to the expression-tree formulation it replaces; ties keep
    * the LOWEST code (first minimum), matching a (d2 asc, code) sort.
    * A vector of the wrong length or holding a NULL element yields NULL. */
  case class PqEncode(child: Expression, m: Int, ksub: Int,
                      cents: Seq[Seq[Float]])
      extends UnaryExpression with ExpectsInputTypes {
    require(m > 0 && ksub > 0 && cents.length == m * ksub,
      s"codebook must hold m*ksub=${m * ksub} centroids")
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "graft_pq_encode"

    // the bound codebook would otherwise dump m*ksub float arrays into
    // every plan rendering
    override def toString: String =
      s"graft_pq_encode($child, m=$m, ksub=$ksub, codebook=[bound])"

    @transient private lazy val cArr: Array[Array[Float]] =
      cents.map(_.toArray).toArray
    @transient private lazy val subdim: Int = cArr(0).length
    @transient private lazy val ccNorm: Array[Double] = cArr.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i).toDouble * c(i).toDouble; i += 1 }
      s
    }

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      if (v.numElements() != m * subdim) return null
      var i = 0
      while (i < m * subdim) { if (v.isNullAt(i)) return null; i += 1 }
      val out = new Array[Int](m)
      var j = 0
      while (j < m) {
        val off = j * subdim
        var ss = 0.0; i = 0
        while (i < subdim) {
          val x = v.getFloat(off + i).toDouble; ss += x * x; i += 1
        }
        var best = 0.0; var bestC = -1; var c = 0
        while (c < ksub) {
          val cent = cArr(j * ksub + c)
          var ip = 0.0; i = 0
          while (i < subdim) {
            ip += v.getFloat(off + i).toDouble * cent(i).toDouble; i += 1
          }
          val d2 = ss - 2.0 * ip + ccNorm(j * ksub + c)
          if (bestC < 0 || d2 < best) { best = d2; bestC = c }
          c += 1
        }
        out(j) = bestC; j += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cRef = ctx.addReferenceObj("pqCents", cArr, "float[][]")
      val ccRef = ctx.addReferenceObj("pqCc", ccNorm, "double[]")
      nullSafeCodeGen(ctx, ev, a => {
        val out = ctx.freshName("out"); val j = ctx.freshName("j")
        val i = ctx.freshName("i"); val c = ctx.freshName("c")
        val off = ctx.freshName("off"); val ss = ctx.freshName("ss")
        val ip = ctx.freshName("ip"); val d2 = ctx.freshName("d2")
        val best = ctx.freshName("best"); val bestC = ctx.freshName("bestC")
        val cent = ctx.freshName("cent")
        val x = ctx.freshName("x")
        s"""
           |if ($a.numElements() != ${m * subdim}) { ${ev.isNull} = true; }
           |for (int $i = 0; !${ev.isNull} && $i < ${m * subdim}; $i++) {
           |  if ($a.isNullAt($i)) ${ev.isNull} = true;
           |}
           |if (!${ev.isNull}) {
           |  int[] $out = new int[$m];
           |  for (int $j = 0; $j < $m; $j++) {
           |    int $off = $j * $subdim;
           |    double $ss = 0.0;
           |    for (int $i = 0; $i < $subdim; $i++) {
           |      double $x = (double) $a.getFloat($off + $i); $ss += $x * $x;
           |    }
           |    double $best = 0.0; int $bestC = -1;
           |    for (int $c = 0; $c < $ksub; $c++) {
           |      float[] $cent = $cRef[$j * $ksub + $c];
           |      double $ip = 0.0;
           |      for (int $i = 0; $i < $subdim; $i++) {
           |        $ip += (double) $a.getFloat($off + $i) * (double) $cent[$i];
           |      }
           |      double $d2 = $ss - 2.0 * $ip + $ccRef[$j * $ksub + $c];
           |      if ($bestC < 0 || $d2 < $best) { $best = $d2; $bestC = $c; }
           |    }
           |    $out[$j] = $bestC;
           |  }
           |  ${ev.value} =
           |    new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
           |}
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Per-query ADC lookup table against the same bound codebook:
    * table[j·ksub + c] = dot(subvector j, centroid (j,c)), Double-
    * accumulated in index order — the asymmetric-distance state one query
    * carries to every encoded corpus row. Same null/length semantics as
    * [[PqEncode]]. */
  case class PqAdcTable(child: Expression, m: Int, ksub: Int,
                        cents: Seq[Seq[Float]])
      extends UnaryExpression with ExpectsInputTypes {
    require(m > 0 && ksub > 0 && cents.length == m * ksub,
      s"codebook must hold m*ksub=${m * ksub} centroids")
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "graft_pq_adc_table"

    override def toString: String =
      s"graft_pq_adc_table($child, m=$m, ksub=$ksub, codebook=[bound])"

    @transient private lazy val cArr: Array[Array[Float]] =
      cents.map(_.toArray).toArray
    @transient private lazy val subdim: Int = cArr(0).length

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      if (v.numElements() != m * subdim) return null
      var i = 0
      while (i < m * subdim) { if (v.isNullAt(i)) return null; i += 1 }
      val out = new Array[Double](m * ksub)
      var j = 0
      while (j < m) {
        val off = j * subdim
        var c = 0
        while (c < ksub) {
          val cent = cArr(j * ksub + c)
          var ip = 0.0; i = 0
          while (i < subdim) {
            ip += v.getFloat(off + i).toDouble * cent(i).toDouble; i += 1
          }
          out(j * ksub + c) = ip; c += 1
        }
        j += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cRef = ctx.addReferenceObj("pqCents", cArr, "float[][]")
      nullSafeCodeGen(ctx, ev, a => {
        val out = ctx.freshName("out"); val j = ctx.freshName("j")
        val i = ctx.freshName("i"); val c = ctx.freshName("c")
        val off = ctx.freshName("off"); val ip = ctx.freshName("ip")
        val cent = ctx.freshName("cent")
        s"""
           |if ($a.numElements() != ${m * subdim}) { ${ev.isNull} = true; }
           |for (int $i = 0; !${ev.isNull} && $i < ${m * subdim}; $i++) {
           |  if ($a.isNullAt($i)) ${ev.isNull} = true;
           |}
           |if (!${ev.isNull}) {
           |  double[] $out = new double[${m * ksub}];
           |  for (int $j = 0; $j < $m; $j++) {
           |    int $off = $j * $subdim;
           |    for (int $c = 0; $c < $ksub; $c++) {
           |      float[] $cent = $cRef[$j * $ksub + $c];
           |      double $ip = 0.0;
           |      for (int $i = 0; $i < $subdim; $i++) {
           |        $ip += (double) $a.getFloat($off + $i) * (double) $cent[$i];
           |      }
           |      $out[$j * $ksub + $c] = $ip;
           |    }
           |  }
           |  ${ev.value} =
           |    new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
           |}
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Top-`keep` centroid cells of a float-vector column by cosine
    * similarity, with the (cell id, centroid) table BOUND into the
    * expression (coarse quantizers are model state, nlist-sized). Output
    * is the cell ids ordered by (similarity desc, cell asc) — exactly the
    * `row_number over (sim desc, cell)` contract of the broadcast-join +
    * window formulation it replaces, with [[CosineSim]]'s accumulation
    * (Double, index order, min-length loop, no per-element null checks)
    * reproduced bit-for-bit so assignments are unchanged. One tight loop
    * per row; no join, no window, no shuffle in the assignment pass. */
  case class TopCellsByCosine(child: Expression,
                              cells: Seq[(Long, Seq[Float])], keep: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(cells.nonEmpty && keep > 0)
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_top_cells"

    override def toString: String =
      s"graft_top_cells($child, ncells=${cells.length}, keep=$keep, centroids=[bound])"

    @transient private lazy val sortedCells = cells.sortBy(_._1)
    @transient private lazy val ids: Array[Long] =
      sortedCells.map(_._1).toArray
    @transient private lazy val cArr: Array[Array[Float]] =
      sortedCells.map(_._2.toArray).toArray
    @transient private lazy val keepN = math.min(keep, cells.length)

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val nc = cArr.length
      val sims = new Array[Double](nc)
      var c = 0
      while (c < nc) {
        val cent = cArr(c)
        val n = math.min(v.numElements(), cent.length)
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < n) {
          val xv = v.getFloat(i).toDouble; val yv = cent(i).toDouble
          dot += xv * yv; na += xv * xv; nb += yv * yv; i += 1
        }
        sims(c) = dot / (math.sqrt(na) * math.sqrt(nb))
        c += 1
      }
      val out = new Array[Long](keepN)
      val used = new Array[Boolean](nc)
      var r = 0
      while (r < keepN) {
        var best = -1; c = 0
        while (c < nc) {
          if (!used(c) && (best < 0 || sims(c) > sims(best))) best = c
          c += 1
        }
        used(best) = true; out(r) = ids(best); r += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cRef = ctx.addReferenceObj("cellCents", cArr, "float[][]")
      val idRef = ctx.addReferenceObj("cellIds", ids, "long[]")
      val nc = cArr.length
      nullSafeCodeGen(ctx, ev, a => {
        val sims = ctx.freshName("sims"); val used = ctx.freshName("used")
        val out = ctx.freshName("out"); val c = ctx.freshName("c")
        val i = ctx.freshName("i"); val r = ctx.freshName("r")
        val n = ctx.freshName("n"); val cent = ctx.freshName("cent")
        val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
        val nb = ctx.freshName("nb"); val best = ctx.freshName("best")
        val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
        s"""
           |double[] $sims = new double[$nc];
           |for (int $c = 0; $c < $nc; $c++) {
           |  float[] $cent = $cRef[$c];
           |  int $n = java.lang.Math.min($a.numElements(), $cent.length);
           |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    double $xv = (double) $a.getFloat($i);
           |    double $yv = (double) $cent[$i];
           |    $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
           |  }
           |  $sims[$c] = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
           |}
           |long[] $out = new long[$keepN];
           |boolean[] $used = new boolean[$nc];
           |for (int $r = 0; $r < $keepN; $r++) {
           |  int $best = -1;
           |  for (int $c = 0; $c < $nc; $c++) {
           |    if (!$used[$c] && ($best < 0 || $sims[$c] > $sims[$best])) $best = $c;
           |  }
           |  $used[$best] = true; $out[$r] = $idRef[$best];
           |}
           |${ev.value} =
           |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Block-pair outer products for the dimension covariance
    * ([[graft.operators.Similarity.embedCovariance]]): for every ordered
    * pair (bi ≤ bj) of b-wide dimension blocks, a struct (bi, bj,
    * xy[b²]) where xy[pi·b+pj] = floor(x[bi·b+pi]·x[bj·b+pj]·1e12) —
    * the outer product in integer picounits (floor of the identical
    * IEEE double is engine-portable; the long sum rides the compact
    * decimal fast path downstream). Positions past the row's dimension
    * are NULL. Picounit range is GUARDED, not silently saturated: a
    * non-finite product (NaN/Inf input) or |x·y| ≥ ~9.2e6 (entries
    * beyond ~3e3 on unit-scale embeddings) throws ArithmeticException,
    * matching the oracle's CAST(floor(·) AS BIGINT) raising in DuckDB —
    * the engines diverge loudly together instead of one returning a
    * wrapped covariance.
    *
    * One tight loop replaces a four-deep nested `transform` whose
    * interpreted evaluation (expression-tree walk per product) was the
    * dominant cost of the covariance scan — the d² multiplies per row
    * are irreducible, the per-element interpretation was not. Full
    * non-null blocks emit primitive long arrays (no boxing); only edge
    * blocks and null-holding rows take the boxed path. */
  case class CovBlockPairs(child: Expression, b: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(b >= 1 && b <= 64, s"block size in [1, 64], got $b")
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
    private val xyType = ArrayType(LongType, containsNull = true)
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("bi", IntegerType, nullable = false),
      StructField("bj", IntegerType, nullable = false),
      StructField("xy", xyType, nullable = false))), containsNull = false)
    override def prettyName: String = "graft_cov_block_pairs"

    override def nullSafeEval(input: Any): Any = compute(input)

    // picounit product with the long range guarded (throws like the
    // DuckDB oracle's CAST instead of Scala toLong's silent saturation)
    @inline private def pico(x: Double, y: Double): Long = {
      val p = x * y * 1e12
      if (!java.lang.Double.isFinite(p) ||
          math.abs(p) >= 9.223372036854776e18)
        throw new ArithmeticException(
          s"graft_cov_block_pairs: picounit product $p exceeds long " +
            "range — embedding entries must keep |x*y| < ~9.2e6")
      math.floor(p).toLong
    }

    def compute(input: Any): org.apache.spark.sql.catalyst.util.ArrayData = {
      val v = input.asInstanceOf[ArrayData]
      val d = v.numElements()
      val nb = (d + b - 1) / b
      // hoist the floats (and their null mask) out of the O(d²) loop
      val xs = new Array[Double](d)
      val nulls = new Array[Boolean](d)
      var hasNull = false
      var i = 0
      while (i < d) {
        if (v.isNullAt(i)) { nulls(i) = true; hasNull = true }
        else xs(i) = v.getFloat(i).toDouble
        i += 1
      }
      val out = new Array[Any](nb * (nb + 1) / 2)
      var k = 0; var bi = 0
      while (bi < nb) {
        var bj = bi
        while (bj < nb) {
          val full = (bi + 1) * b <= d && (bj + 1) * b <= d
          val xy: ArrayData =
            if (full && !hasNull) {
              val a = new Array[Long](b * b)
              var pi = 0
              while (pi < b) {
                val x = xs(bi * b + pi); val base = pi * b
                var pj = 0
                while (pj < b) {
                  a(base + pj) = pico(x, xs(bj * b + pj))
                  pj += 1
                }
                pi += 1
              }
              UnsafeArrayData.fromPrimitiveArray(a)
            } else {
              val a = new Array[Any](b * b)
              var pi = 0
              while (pi < b) {
                val ii = bi * b + pi; val base = pi * b
                var pj = 0
                while (pj < b) {
                  val jj = bj * b + pj
                  if (ii < d && jj < d && !nulls(ii) && !nulls(jj))
                    a(base + pj) = java.lang.Long.valueOf(pico(xs(ii), xs(jj)))
                  pj += 1
                }
                pi += 1
              }
              new org.apache.spark.sql.catalyst.util.GenericArrayData(a)
            }
          out(k) = org.apache.spark.sql.catalyst.InternalRow(
            bi, bj, xy)
          k += 1; bj += 1
        }
        bi += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      // the grid loop lives in compute(); generated code calls it once
      // per row, keeping the stage's codegen span unbroken without
      // inlining a struct-building loop into Janino source
      val ref = ctx.addReferenceObj("covBlockPairs", this,
        classOf[CovBlockPairs].getName)
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** ADC score of one encoded corpus row against one query table:
    * Σ_j table[j·ksub + codes[j]], summed j-ascending from 0.0 — the
    * same left fold as the `aggregate(zip_with(...))` HOF it replaces. */
  case class PqAdcScore(left: Expression, right: Expression, ksub: Int)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(IntegerType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_pq_adc_score"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val codes = a.asInstanceOf[ArrayData]
      val table = b.asInstanceOf[ArrayData]
      var s = 0.0; var j = 0
      while (j < codes.numElements()) {
        if (codes.isNullAt(j)) return null
        val idx = j * ksub + codes.getInt(j)
        if (idx < 0 || idx >= table.numElements() || table.isNullAt(idx))
          return null
        s += table.getDouble(idx); j += 1
      }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val s = ctx.freshName("s"); val j = ctx.freshName("j")
        val idx = ctx.freshName("idx")
        s"""
           |double $s = 0.0;
           |for (int $j = 0; !${ev.isNull} && $j < $a.numElements(); $j++) {
           |  if ($a.isNullAt($j)) { ${ev.isNull} = true; break; }
           |  int $idx = $j * $ksub + $a.getInt($j);
           |  if ($idx < 0 || $idx >= $b.numElements() || $b.isNullAt($idx)) {
           |    ${ev.isNull} = true; break;
           |  }
           |  $s += $b.getDouble($idx);
           |}
           |if (!${ev.isNull}) ${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  // ---- Column-level API ----

  def floatDot(a: Column, b: Column): Column =
    ExprBridge.column(FloatDot(ExprBridge.expression(a), ExprBridge.expression(b)))

  def simhash64(tokens: Column): Column =
    ExprBridge.column(SimHash64(ExprBridge.expression(tokens)))

  def minhashSig(shingles: Column, numHashes: Int): Column =
    ExprBridge.column(MinHashSig(ExprBridge.expression(shingles), numHashes))

  def cosineSim(a: Column, b: Column): Column =
    ExprBridge.column(CosineSim(ExprBridge.expression(a), ExprBridge.expression(b)))

  def shingleHash64(tokens: Column, n: Int): Column =
    ExprBridge.column(ShingleHash64(ExprBridge.expression(tokens), n))

  def minhashFromHashes(hashes: Column, numHashes: Int): Column =
    ExprBridge.column(MinHashFromHashes(ExprBridge.expression(hashes), numHashes))

  def bandHashes64(sig: Column, bands: Int, r: Int): Column =
    ExprBridge.column(BandHashes64(ExprBridge.expression(sig), bands, r))

  def lshSign64(vec: Column, numPlanes: Int): Column =
    ExprBridge.column(LshSign64(ExprBridge.expression(vec), numPlanes))

  def shingleStrings(tokens: Column, n: Int): Column =
    ExprBridge.column(ShingleStrings(ExprBridge.expression(tokens), n))

  def polyHash(text: Column): Column =
    ExprBridge.column(PolyHash(ExprBridge.expression(text)))

  def jaroWinkler(a: Column, b: Column): Column =
    ExprBridge.column(
      JaroWinkler(ExprBridge.expression(a), ExprBridge.expression(b)))

  def byteEntropy(text: Column): Column =
    ExprBridge.column(ByteEntropy(ExprBridge.expression(text)))

  def interleave64(a: Column, b: Column): Column =
    ExprBridge.column(
      Interleave64(ExprBridge.expression(a), ExprBridge.expression(b)))

  def hilbertD2(a: Column, b: Column, bits: Int): Column =
    ExprBridge.column(
      HilbertD2(ExprBridge.expression(a), ExprBridge.expression(b), bits))

  def pqEncode(vec: Column, m: Int, ksub: Int,
               cents: Seq[Seq[Float]]): Column =
    ExprBridge.column(PqEncode(ExprBridge.expression(vec), m, ksub, cents))

  def pqAdcTable(vec: Column, m: Int, ksub: Int,
                 cents: Seq[Seq[Float]]): Column =
    ExprBridge.column(PqAdcTable(ExprBridge.expression(vec), m, ksub, cents))

  def pqAdcScore(codes: Column, table: Column, ksub: Int): Column =
    ExprBridge.column(PqAdcScore(
      ExprBridge.expression(codes), ExprBridge.expression(table), ksub))

  def covBlockPairs(vec: Column, blockSize: Int): Column =
    ExprBridge.column(CovBlockPairs(ExprBridge.expression(vec), blockSize))

  def topCellsByCosine(vec: Column, cells: Seq[(Long, Seq[Float])],
                       keep: Int): Column =
    ExprBridge.column(TopCellsByCosine(ExprBridge.expression(vec), cells, keep))
}
