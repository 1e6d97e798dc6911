package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{GraftFunctions, VectorExprs}

/** The SQL surface of the native expressions: registration + calls via
  * spark.sql, equivalence with the Column-level API. */
class GraftFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val registered = { GraftFunctions.register(spark); true }

  test("graft functions callable from SQL and equal to the Column API") {
    assert(registered)
    Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "text").createOrReplaceTempView("gf_docs")
    val viaSql = spark.sql("""
      SELECT graft_simhash64(split(text, ' ')) AS sh,
             graft_minhash_sig(split(text, ' '), 8) AS sig,
             graft_shingle_hash(split(text, ' '), 3) AS shh,
             graft_band_hashes(graft_minhash_sig(split(text, ' '), 8), 4, 2) AS bh
      FROM gf_docs""").collect()(0)
    val viaCol = spark.table("gf_docs").select(
      VectorExprs.simhash64(split(col("text"), " ")).as("sh"),
      VectorExprs.minhashSig(split(col("text"), " "), 8).as("sig"),
      VectorExprs.shingleHash64(split(col("text"), " "), 3).as("shh"),
      VectorExprs.bandHashes64(
        VectorExprs.minhashSig(split(col("text"), " "), 8), 4, 2).as("bh"))
      .collect()(0)
    assert(viaSql.getLong(0) === viaCol.getLong(0))
    assert(viaSql.getSeq[Long](1) === viaCol.getSeq[Long](1))
    assert(viaSql.getSeq[Long](2) === viaCol.getSeq[Long](2))
    assert(viaSql.getSeq[Long](3) === viaCol.getSeq[Long](3))
    val grams = spark.sql(
      "SELECT graft_shingle_strings(split(text, ' '), 3) FROM gf_docs")
      .collect()(0).getSeq[String](0)
    assert(grams.head === "the quick brown" && grams.length === 7)
  }

  test("graft_float_dot and graft_lsh_sign64 from SQL") {
    assert(registered)
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .createOrReplaceTempView("gf_vecs")
    val r = spark.sql("""
      SELECT graft_float_dot(a, b) AS d, graft_lsh_sign64(a, 16) AS s
      FROM gf_vecs""").collect()(0)
    assert(r.getDouble(0) === 11.0)
    val viaCol = spark.table("gf_vecs")
      .select(VectorExprs.lshSign64(col("a"), 16)).as[Long].collect()(0)
    assert(r.getLong(1) === viaCol)
  }

  test("graft_interleave from SQL matches the column API and Scala reference") {
    assert(registered)
    val r = spark.sql("SELECT graft_interleave(15L, 0L) AS z1, " +
      "graft_interleave(3L, 5L) AS z2").collect()(0)
    assert(r.getLong(0) === 0x55L)
    assert(r.getLong(1) === VectorExprs.Interleave64.morton(3L, 5L))
  }

  test("non-literal static parameter is rejected with a clear error") {
    assert(registered)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash_sig(array('a'), 1 + 1)").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("ShingleHash64 values match the HOF xxhash64-of-concat formulation") {
    val df = Seq("alpha beta gamma delta", "x", "").toDF("text")
    val toks = split(col("text"), " ")
    val both = df.select(
      VectorExprs.shingleHash64(toks, 3).as("native"),
      transform(
        sequence(lit(0), greatest(size(toks) - 3, lit(0))),
        i => xxhash64(concat_ws(" ", slice(toks, i + 1, lit(3))))).as("hof"))
    val rows = both.as[(Seq[Long], Seq[Long])].collect()
    rows.foreach { case (n, h) => assert(n === h) }
  }
}
