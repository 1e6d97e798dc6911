package graft.operators

import org.apache.spark.sql.DataFrame

/** Registry of DataFrames persisted INSIDE graft operators.
  *
  * Several operators persist an intermediate that feeds multiple
  * consumers of the returned plan (e.g. [[Dedup.allPairsJaccard]]'s
  * shingle table, [[Dedup.minhashNearDups]]'s banded signature table).
  * The persist is load-bearing — without it the dominant per-row work
  * runs once per consumer — but Spark's CacheManager holds such entries
  * until an explicit `unpersist`: the ContextCleaner does NOT release
  * them when the returned DataFrame goes out of scope. A long-lived
  * session that invokes these operators over many different inputs
  * would therefore accumulate executor memory/disk without bound.
  *
  * Every operator-internal `persist` is registered here; call
  * [[release]] after the consuming action(s) when the pipeline is done
  * with the operator's output (re-running the returned plan afterwards
  * is still correct — just uncached). Identical re-invocations before a
  * release are harmless: the CacheManager keys entries by canonicalized
  * plan, so they share one entry rather than stacking copies.
  */
object OpCaches {
  private val frames =
    scala.collection.mutable.ListBuffer.empty[java.lang.ref.WeakReference[DataFrame]]

  /** Track an operator-persisted frame for later [[release]]. Weakly
    * referenced: a frame the caller (and cache) no longer reachable
    * costs nothing to keep listed. */
  private[graft] def register(df: DataFrame): DataFrame = synchronized {
    frames += new java.lang.ref.WeakReference(df)
    df
  }

  /** Number of live registered frames (test/observability hook). */
  def registered: Int = synchronized { frames.count(_.get != null) }

  /** Unpersist every frame an operator registered since the last
    * release. Non-blocking by default, matching `Dataset.unpersist()`. */
  def release(blocking: Boolean = false): Unit = synchronized {
    frames.foreach { ref =>
      val df = ref.get
      if (df != null) {
        try df.unpersist(blocking)
        catch { case _: Throwable => () } // stopped session: nothing to free
      }
    }
    frames.clear()
  }
}
