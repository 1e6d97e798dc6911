package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL-surface registration for the graft native expressions: every
  * expression in [[VectorExprs]] is callable from `spark.sql(...)` once
  * registered, with static parameters (hash counts, shingle width, band
  * shape) passed as integer literals.
  *
  * Two registration paths:
  *   - a running session: `GraftFunctions.register(spark)` (temp
  *     functions in the session's registry);
  *   - session construction: `graft.plans.GraftExtensions` via
  *     `spark.sql.extensions` — the standard plug-in point, usable from
  *     spark-submit conf with no code changes.
  */
object GraftFunctions {

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(i: Int, IntegerType) => i
    case other => throw new IllegalArgumentException(
      s"$fn: argument '$arg' must be an integer literal, got $other")
  }

  private def need(n: Int, fn: String)(args: Seq[Expression]): Unit =
    require(args.length == n, s"$fn expects $n arguments, got ${args.length}")

  /** (name, builder) for every graft SQL function. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_float_dot" -> { args =>
      need(2, "graft_float_dot")(args)
      VectorExprs.FloatDot(args(0), args(1))
    },
    "graft_cosine" -> { args =>
      need(2, "graft_cosine")(args)
      VectorExprs.CosineSim(args(0), args(1))
    },
    "graft_simhash64" -> { args =>
      need(1, "graft_simhash64")(args)
      VectorExprs.SimHash64(args(0))
    },
    "graft_minhash_sig" -> { args =>
      need(2, "graft_minhash_sig")(args)
      VectorExprs.MinHashSig(args(0),
        intLit(args(1), "graft_minhash_sig", "numHashes"))
    },
    "graft_shingle_hash" -> { args =>
      need(2, "graft_shingle_hash")(args)
      VectorExprs.ShingleHash64(args(0),
        intLit(args(1), "graft_shingle_hash", "n"))
    },
    "graft_minhash_from_hashes" -> { args =>
      need(2, "graft_minhash_from_hashes")(args)
      VectorExprs.MinHashFromHashes(args(0),
        intLit(args(1), "graft_minhash_from_hashes", "numHashes"))
    },
    "graft_band_hashes" -> { args =>
      need(3, "graft_band_hashes")(args)
      VectorExprs.BandHashes64(args(0),
        intLit(args(1), "graft_band_hashes", "bands"),
        intLit(args(2), "graft_band_hashes", "r"))
    },
    "graft_lsh_sign64" -> { args =>
      need(2, "graft_lsh_sign64")(args)
      VectorExprs.LshSign64(args(0),
        intLit(args(1), "graft_lsh_sign64", "numPlanes"))
    },
    "graft_shingle_strings" -> { args =>
      need(2, "graft_shingle_strings")(args)
      VectorExprs.ShingleStrings(args(0),
        intLit(args(1), "graft_shingle_strings", "n"))
    },
    "graft_polyhash" -> { args =>
      need(1, "graft_polyhash")(args)
      VectorExprs.PolyHash(args(0))
    },
    "graft_byte_entropy" -> { args =>
      need(1, "graft_byte_entropy")(args)
      VectorExprs.ByteEntropy(args(0))
    },
    "graft_interleave" -> { args =>
      need(2, "graft_interleave")(args)
      VectorExprs.Interleave64(args(0), args(1))
    },
    "graft_hilbert" -> { args =>
      need(3, "graft_hilbert")(args)
      VectorExprs.HilbertD2(args(0), args(1),
        intLit(args(2), "graft_hilbert", "bits"))
    },
    "graft_jaro_winkler" -> { args =>
      need(2, "graft_jaro_winkler")(args)
      VectorExprs.JaroWinkler(args(0), args(1))
    })

  def expressionInfo(name: String): ExpressionInfo =
    new ExpressionInfo(VectorExprs.getClass.getName, name)

  def identifiers: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] =
    functions.map { case (name, b) =>
      (FunctionIdentifier(name), expressionInfo(name), b)
    }

  /** Register all graft functions into an existing session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    functions.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
