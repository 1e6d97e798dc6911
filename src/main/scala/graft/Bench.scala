package graft

/** Benchmark main — runs every registered query against
  * SPARK_GRAFT_SF_DIR and emits ONE JSON line:
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Honesty rules (VERDICT r5 §4):
  *   - a query that THROWS is reported as the string "failed" in
  *     `queries` (never a fake fast timing), listed with its exception
  *     in `failures`, and excluded from `value`;
  *   - best-of-N (default 3) per query — the noise-robust minimum on a
  *     shared VM — with the first (cold, codegen-inclusive) run recorded
  *     separately in target/bench_detail.json so compile-heavy plans are
  *     readable as fixed cost vs steady state.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSessionFactory.create(appName = "graft-bench")
    // untimed warm-up: scheduler, shuffle machinery, parquet reader and
    // codegen infra all pay one-time JVM costs that would otherwise be
    // billed to whichever query happens to run first
    spark.range(1 << 20).selectExpr("sum(id)").collect()
    // warm-up failure (e.g. bad sfDir) must not kill the harness — the
    // per-query loop records the real failures visibly instead
    try Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_returnflag").count().collect()
    catch { case _: Throwable => () }

    final case class R(name: String, best: Double, cold: Double,
                       error: Option[String])
    def esc(s: String): String =
      s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\n\\r\\t]", " ")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        var error: Option[String] = None
        val times = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          try fn(spark, sfDir).count()
          catch {
            case e: Throwable =>
              error = Some(e.getClass.getName + ": " +
                String.valueOf(e.getMessage).take(160))
          }
          (System.nanoTime() - t0) / 1e9
        }
        R(name, times.min, times.head, error)
    }
    val ok = results.filter(_.error.isEmpty)
    val failed = results.filter(_.error.isDefined)
    val qs = results.map { r =>
      val v = if (r.error.isDefined) "\"failed\"" else r.best.toString
      s"""\"${r.name}\":$v"""
    }.mkString("{", ",", "}")
    val failJson = failed
      .map(r => s"""\"${r.name}\":\"${esc(r.error.get)}\"""")
      .mkString("{", ",", "}")
    val total = ok.map(_.best).sum
    val coldTotal = ok.map(_.cold).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""sf":"$sfDir","runs":$runs,"n_queries":${results.size},""" +
        s""""n_failed":${failed.size},"failures":$failJson,""" +
        s""""cold_total":$coldTotal}"""
    println(line)
    // round artifacts keep only a 2000-char stdout tail — persist the full
    // per-query record (incl. cold/first-run splits) so bench history
    // stays auditable
    val detail = results.map { r =>
      s"""\"${r.name}\":{"best":${r.best},"cold":${r.cold},"error":""" +
        r.error.map(e => s""""${esc(e)}"""").getOrElse("null") + "}"
    }.mkString("{", ",", "}")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/bench.json"), line + "\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/bench_detail.json"), detail + "\n")
    spark.stop()
  }
}
