package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites — one JVM-wide session (getOrCreate)
  * so suites don't pay repeated startup, pinned UTC like the harness. */
trait SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkTestBase.session
  import org.apache.spark.sql.DataFrame

  /** Per-suite teardown: free operator-internal persisted state (both
    * per-query frames and the session-scoped BPE training memo) so one
    * suite's caches don't bill memory to suites that run after it. */
  override protected def afterAll(): Unit = {
    try {
      graft.operators.OpCaches.release()
      graft.operators.Ngrams.clearBpeCache()
    graft.operators.Ngrams.clearUnigramCache()
    } finally super.afterAll()
  }

  /** Rows of a DataFrame as a sorted Seq of string-rendered tuples — a
    * deterministic, order-insensitive comparison form. */
  def rendered(df: DataFrame): Seq[Seq[String]] =
    df.collect().toSeq
      .map(r => (0 until r.length).map(i => String.valueOf(r.get(i))))
      .sortBy(_.mkString(""))
}

object SparkTestBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
