package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Driver-gate shape rule: every ORACLE-CHECKED query must produce
  * scalar-only top-level columns. The gate materializes both sides into
  * pandas and sorts rows before hashing; an array/map/struct cell makes
  * that sort throw (`TypeError: unhashable type: numpy.ndarray`) and the
  * query goes red regardless of semantics (round-6 verdict, items 1–2).
  * Operators keep their typed array APIs — the registered query is where
  * arrays are serialized to canonical strings (comma-joined / to_json).
  *
  * `.schema` only runs analysis, so this covers all ~160 queries cheaply;
  * the few operators that train model state at plan-build time (k-means,
  * PQ codebooks) do so on the sf0.001 tables. */
class OracleShapeSpec extends SparkTestBase {

  private val d = "/root/testdata/sf0.001"

  test("oracle-checked query outputs contain no array/map/struct columns") {
    val oracleChecked = SparkEntry.queries.keys.toSeq.sorted
      .filter(SparkEntry.oracleSql.contains)
    val offenders = oracleChecked.flatMap { name =>
      val schema = SparkEntry.queries(name)(spark, d).schema
      val bad = schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
                  f.dataType.isInstanceOf[MapType] ||
                  f.dataType.isInstanceOf[StructType] =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
      bad
    }
    assert(offenders.isEmpty,
      s"non-scalar columns in oracle-checked outputs (driver gate would " +
      s"crash sorting these):\n  ${offenders.mkString("\n  ")}")
  }

  test("every registered query has an oracle and every oracle has a query") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert((qs -- os).isEmpty,
      s"queries with no oracle (driver records only a weak rows-only " +
      s"check): ${(qs -- os).toSeq.sorted.mkString(", ")}")
    assert((os -- qs).isEmpty,
      s"orphaned oracle entries (dead SQL the driver would skip): " +
      s"${(os -- qs).toSeq.sorted.mkString(", ")}")
  }

  test("no shadowed duplicate keys in the source registries") {
    // a Map literal silently keeps the LAST binding for a repeated key,
    // so a name collision makes the earlier query/oracle dead code with
    // no runtime symptom (found live: two q_histogram registrations).
    // Count key literals in the SOURCE and pin them to the map sizes:
    // each name must appear exactly twice — once per registry.
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/SparkEntry.scala")),
      "UTF-8")
    val keys = """"(entry|q1_agg|q_[a-z0-9_]+)" ->""".r
      .findAllMatchIn(src).map(_.group(1)).toSeq
    val dupes = keys.groupBy(identity).filter(_._2.size != 2)
    assert(dupes.isEmpty,
      s"registry keys not appearing exactly twice (query + oracle) in " +
      s"source: ${dupes.map { case (k, v) => s"$k×${v.size}" }.toSeq.sorted
        .mkString(", ")}")
    assert(keys.size ===
      SparkEntry.queries.size + SparkEntry.oracleSql.size,
      "source key literals must match the materialized map sizes — a " +
      "mismatch means a Map-literal collision swallowed an entry")
  }
}
