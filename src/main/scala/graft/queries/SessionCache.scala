package graft.queries

import org.apache.spark.sql.SparkSession

/** Session-scoped cache of materialized shared pipeline intermediates (the
  * LSH pair set, its connected components, the Lloyd training run), keyed by
  * (applicationId, data dir). Production dedup DAGs materialize these once
  * and fan them out to many consumers; this is the library-embedded analog.
  *
  * Eviction contract: inserting under a NEW key first releases (unpersists)
  * every entry under a different key. An app iterating over many data dirs
  * (the stress harness, a backfill over dated partitions) would otherwise
  * accumulate session-lifetime caches per dir. One live key is the
  * working-set assumption — consumers of dir A all run before dir B starts —
  * and a consumer holding an evicted frame merely recomputes, it never sees
  * stale data (the cache stores by value, not by path snapshot).
  */
final class SessionCache[V](release: V => Unit) {
  private val entries =
    scala.collection.mutable.LinkedHashMap.empty[(String, String), V]

  def getOrElseUpdate(s: SparkSession, dir: String)(build: => V): V =
    synchronized {
      val key = (s.sparkContext.applicationId, dir)
      entries.get(key) match {
        case Some(v) => v
        case None =>
          var evicted = false
          entries.filterInPlace { case (k, v) =>
            val keep = k == key
            if (!keep) { release(v); evicted = true }
            keep
          }
          // A dir change also invalidates the composable ops' internal
          // lazy persists (pair-miner shingle sets etc.) — they are
          // per-plan-deduped but session-lived otherwise. Releasing is
          // always safe: a late consumer recomputes, never sees stale data.
          if (evicted) graft.ops.CacheRegistry.releaseAll()
          val v = build
          entries.put(key, v)
          v
      }
    }
}
