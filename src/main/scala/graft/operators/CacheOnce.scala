package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Idempotent persist for invocation-deterministic frames (VERDICT
  * r13 item 4). Query builders persist internal frames that feed
  * multiple consumers and leave release to the caller's clearCache
  * (the Verify/Bench per-query discipline) — but a builder re-invoked
  * in the SAME session (bench reps, parity specs, the suite run)
  * re-derives the identical canonicalized plan, and Spark's
  * CacheManager then logs "WARN CacheManager: Asked to cache already
  * cached data" while deduping to the live entry. The repo's cache
  * doctrine (PLANS r10) is zero-tolerance on stacked/duplicate
  * persists, so the reuse must be EXPLICIT: persistFresh persists
  * only when no live entry covers the plan, otherwise returns the
  * frame as-is and the live entry serves it.
  *
  * Ownership: the invocation that first persisted remains the owner;
  * callers release through clearCache. Not for loop-round caches that
  * pair each persist with its own unpersist handle (Sssp/KCore/
  * PageRank/Dedup-CC) — those release themselves, never leave a live
  * duplicate behind, and their unpersist must hit the entry THEY
  * created.
  */
object CacheOnce {
  /** persist() unless an identical-plan cache entry is already live
    * (`df.storageLevel` is the public CacheManager lookup).
    */
  implicit class PersistFreshOps(private val df: DataFrame) extends AnyVal {
    def persistFresh(): DataFrame =
      if (df.storageLevel == StorageLevel.NONE) df.persist() else df
  }

  /** persistFresh with an OWNERSHIP-AWARE release handle: the handle
    * unpersists only if this call created the entry. For builders
    * that persist-then-release an internal frame whose plan another
    * builder may ALSO cache and keep (q138's khop edge frame and
    * q249's k-core edge frame are the same canonicalized plan): a
    * plain persist would warn against the live entry, and a plain
    * release would STEAL it from the invocation that owns it.
    */
  def borrowPersist(df: DataFrame): (DataFrame, () => Unit) =
    if (df.storageLevel == StorageLevel.NONE) {
      val p = df.persist()
      (p, () => { p.unpersist(blocking = true); () })
    } else (df, () => ())
}
