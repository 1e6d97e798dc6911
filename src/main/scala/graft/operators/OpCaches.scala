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
  private val frames = scala.collection.mutable.ListBuffer.empty[DataFrame]
  private val sessionFrames =
    scala.collection.mutable.ListBuffer.empty[DataFrame]

  /** Track an operator-persisted frame for later [[release]]. Strongly
    * referenced on purpose: the returned plan does NOT keep the
    * intermediate's Dataset wrapper alive, and the CacheManager keeps
    * the cached DATA alive regardless of the wrapper — a weak ref here
    * would let GC collect the only handle that can still unpersist the
    * entry. The wrapper itself is a few hundred bytes; the registry is
    * bounded by release() calls, not by data size. */
  private[graft] def register(df: DataFrame): DataFrame = synchronized {
    frames += df
    df
  }

  /** Track a SESSION-scoped persisted frame — model state an operator
    * memoizes across queries (e.g. [[Ngrams]]' BPE training memo).
    * Counted by [[registered]] so the accounting is uniform, but
    * deliberately NOT freed by the per-query [[release]]: the owner
    * bounds and evicts its own entries via [[deregisterSession]] (and a
    * full teardown — spec afterAll, end of Verify — clears the owner's
    * memo, which deregisters everything). */
  private[graft] def registerSession(df: DataFrame): DataFrame =
    synchronized {
      sessionFrames += df
      df
    }

  /** Unpersist and stop tracking one session-scoped frame (memo
    * eviction or full memo clear). Reference-identity match: the owner
    * hands back the exact wrapper it registered. */
  private[graft] def deregisterSession(df: DataFrame): Unit =
    synchronized {
      try df.unpersist()
      catch { case _: Throwable => () } // stopped session: nothing to free
      val i = sessionFrames.indexWhere(_ eq df)
      if (i >= 0) sessionFrames.remove(i)
    }

  /** Number of registered frames awaiting release, per-query AND
    * session-scoped (test/observability hook). */
  def registered: Int = synchronized { frames.size + sessionFrames.size }

  /** Unpersist every PER-QUERY frame an operator registered since the
    * last release; session-scoped frames (bounded memoized model state)
    * survive by design. Non-blocking by default, matching
    * `Dataset.unpersist()`. */
  def release(blocking: Boolean = false): Unit = synchronized {
    frames.foreach { df =>
      try df.unpersist(blocking)
      catch { case _: Throwable => () } // stopped session: nothing to free
    }
    frames.clear()
  }
}
