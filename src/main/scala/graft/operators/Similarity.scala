package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity search over an `ArrayType(FloatType)` embedding column.
  *
  * All arithmetic is done in Double with a sequential left fold
  * (`aggregate` higher-order function) so results are deterministic and
  * bit-reproducible across engines — required for the DuckDB oracle.
  *
  * Scale design: the brute-force path broadcasts the (small) query set and
  * streams the corpus once — at 100 TB the corpus side stays partitioned,
  * no shuffle until the per-query top-k (a windowed rank on query_id, which
  * shuffles only (query, candidate, score) triples, not vectors). The LSH
  * path prunes candidates by random-hyperplane signature before scoring.
  */
object Similarity {

  /** Dot product of two float-array columns, computed in Double via a
    * sequential fold (index order) — no UDF, stays in expression eval. */
  def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
              lit(0.0), (acc, v) => acc + v)

  def normD(a: Column): Column = sqrt(dotD(a, a))

  def cosine(a: Column, b: Column): Column = dotD(a, b) / (normD(a) * normD(b))

  /** Brute-force cosine top-k: for every vector in `queries`, the k most
    * similar vectors in `corpus` (excluding itself when ids collide).
    * `queries` must be small (broadcast side). Deterministic tie-break on
    * candidate id. Output: query_id, neighbor_id, rank, sim. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * xxhash64 → uniform in [-1, 1). No RNG — reproducible across runs. */
  private def planeComponent(plane: Column, dim: Column): Column =
    (xxhash64(plane, dim).cast("double") / lit(Long.MaxValue.toDouble))

  /** Random-hyperplane signature: bit i = sign of <v, plane_i>. */
  def lshSignature(vec: Column, numPlanes: Int): Column =
    aggregate(
      transform(sequence(lit(0), lit(numPlanes - 1)), p =>
        when(
          aggregate(
            zip_with(vec, sequence(lit(0), size(vec) - 1),
              (x, i) => x.cast("double") * planeComponent(p, i)),
            lit(0.0), (acc, v) => acc + v) > 0,
          call_function("shiftleft", lit(1L), p.cast("int"))).otherwise(0L)),
      lit(0L), (acc, v) => acc.bitwiseOR(v))

  /** LSH-bucketed approximate top-k: candidates limited to vectors sharing
    * the query's hyperplane signature on at least one band, then exact
    * cosine + rank within the candidate set. The bucket join is an
    * equi-join (shuffle by band value) — scales linearly with corpus size
    * for near-uniform buckets. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              numPlanes: Int = 16, bands: Int = 4,
              idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    require(numPlanes % bands == 0)
    val r = numPlanes / bands
    val mask = (1L << r) - 1
    def banded(df: DataFrame, id: String, v: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(v),
          lshSignature(col(vecCol), numPlanes).as("sig"))
        .select(col(id), col(v), explode(
          transform(sequence(lit(0), lit(bands - 1)), bd =>
            struct(bd.as("band_id"),
              call_function("shiftrightunsigned", col("sig"), (bd * r).cast("int"))
                .bitwiseAND(mask).as("band_val")))).as("bv"))
        .select(col(id), col(v), col("bv.band_id"), col("bv.band_val"))
    val q = banded(queries, "query_id", "qv")
    val c = banded(corpus, "neighbor_id", "cv")
    val cand = c.join(q, Seq("band_id", "band_val"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "qv", "neighbor_id", "cv")
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    cand.withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }

  /** Embedding near-duplicate pairs: cosine >= threshold. Candidate
    * generation via LSH band buckets (same plan shape as minhashNearDups —
    * no n² cross join). */
  def cosineNearDups(df: DataFrame, threshold: Double,
                     numPlanes: Int = 16, bands: Int = 4,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    require(numPlanes % bands == 0)
    val r = numPlanes / bands
    val mask = (1L << r) - 1
    val banded = df
      .select(col(idCol).as("id"), col(vecCol).as("v"),
              lshSignature(col(vecCol), numPlanes).as("sig"))
      .select(col("id"), col("v"), explode(
        transform(sequence(lit(0), lit(bands - 1)), bd =>
          struct(bd.as("band_id"),
            call_function("shiftrightunsigned", col("sig"), (bd * r).cast("int"))
              .bitwiseAND(mask).as("band_val")))).as("bv"))
      .select(col("id"), col("v"), col("bv.band_id"), col("bv.band_val"))
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b,
        col("a.band_id") === col("b.band_id") &&
        col("a.band_val") === col("b.band_val") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("vec_a"), col("b.id").as("vec_b"),
              col("a.v").as("va"), col("b.v").as("vb"))
      .dropDuplicates("vec_a", "vec_b")
      .withColumn("sim", cosine(col("va"), col("vb")))
      .filter(col("sim") >= threshold)
      .select("vec_a", "vec_b", "sim")
  }
}
