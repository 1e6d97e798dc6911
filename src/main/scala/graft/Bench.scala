package graft

/** Benchmark main — runs every registered query against
  * SPARK_GRAFT_SF_DIR and emits ONE JSON line:
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Honesty rules (VERDICT r5 §4, refined r6):
  *   - a query is "failed" only when ALL N runs throw (last exception
  *     reported, excluded from `value`); a query with ≥1 successful run
  *     reports best-of-successful-runs and is counted in `n_flaky` /
  *     per-query `flaky` in bench_detail.json, so transient noise is
  *     distinguishable from a hard failure;
  *   - best-of-N (default 3) per query — the noise-robust minimum on a
  *     shared VM — with the first (cold, codegen-inclusive) successful
  *     run recorded separately in target/bench_detail.json so
  *     compile-heavy plans are readable as fixed cost vs steady state;
  *   - the full per-query line prints FIRST, then a compact totals-only
  *     summary line LAST: round records keep only a bounded stdout tail,
  *     which truncates the head of the big line — the compact line is
  *     what survives for the structured record (VERDICT r6 residual 2).
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
                       error: Option[String], flaky: Int)
    def esc(s: String): String =
      s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\n\\r\\t]", " ")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val attempts = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          val err =
            try { fn(spark, sfDir).count(); None }
            catch {
              case e: Throwable =>
                Some(e.getClass.getName + ": " +
                  String.valueOf(e.getMessage).take(160))
            }
          ((System.nanoTime() - t0) / 1e9, err)
        }
        val okTimes = attempts.collect { case (t, None) => t }
        if (okTimes.isEmpty)
          // all runs threw: hard failure; times are time-to-exception
          R(name, attempts.map(_._1).min, attempts.head._1,
            attempts.last._2, runs)
        else
          // ≥1 success: best/cold over SUCCESSFUL runs only (a failed
          // run's time-to-exception is not a measurement)
          R(name, okTimes.min, okTimes.head, None,
            attempts.count(_._2.isDefined))
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
    val nFlaky = results.count(r => r.error.isEmpty && r.flaky > 0)
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""sf":"$sfDir","runs":$runs,"n_queries":${results.size},""" +
        s""""n_failed":${failed.size},"n_flaky":$nFlaky,""" +
        s""""failures":$failJson,"cold_total":$coldTotal}"""
    println(line)
    // the round record keeps only a bounded stdout TAIL, which beheads
    // the big line above — repeat the totals compactly as the LAST line
    // so the structured record always parses (VERDICT r6 residual 2)
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir",""" +
        s""""runs":$runs,"n_queries":${results.size},""" +
        s""""n_failed":${failed.size},"n_flaky":$nFlaky,""" +
        s""""cold_total":$coldTotal}""")
    // round artifacts keep only a 2000-char stdout tail — persist the full
    // per-query record (incl. cold/first-run splits) so bench history
    // stays auditable
    val detail = results.map { r =>
      s"""\"${r.name}\":{"best":${r.best},"cold":${r.cold},"flaky":${r.flaky},"error":""" +
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
