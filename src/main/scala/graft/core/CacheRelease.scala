package graft.core

import org.apache.spark.sql.SparkSession

/** End-of-run storage release for long multi-query sessions.
  *
  * A 200+-query Verify/Bench session accumulates MEMORY_ONLY blocks
  * from three sources: the memoized LLM-dedup singletons (shingle set,
  * near-dup pairs, clusters — eager localCheckpoints), the cached
  * scan-reuse base, and per-query `localCheckpoint`/`persist` calls
  * whose frames went out of scope but whose blocks wait on the async
  * ContextCleaner. On a real cluster those blocks occupy executor
  * storage memory for the life of the app; releasing them at the end
  * of a batch run returns that memory to execution. Called by
  * [[graft.Bench]] and [[graft.Verify]] after their last query;
  * `CacheReleaseSpec` pins that nothing persisted survives and that
  * released singletons recompute on next use.
  *
  * END-OF-APP ONLY: the final straggler sweep unpersists EVERY RDD
  * registered with the shared SparkContext — including caches a host
  * application or another session persisted for its own use. An
  * embedding application that wants to release graft's storage
  * mid-flight should call [[graft.queries.LlmText.releaseMemo]] and
  * [[graft.queries.ScaleOps.releaseCache]] (scoped to frames this
  * library created) rather than this hook.
  */
object CacheRelease {
  /** Unpersist everything this session/app holds: named singleton
    * caches first (so their owners also forget the now-unrecomputable
    * localCheckpoint frames), then Spark's table/plan cache, then any
    * straggler persisted RDDs still registered with the context. */
  def apply(s: SparkSession): Unit = {
    graft.queries.LlmText.releaseMemo(s)
    graft.queries.ScaleOps.releaseCache(s)
    s.sharedState.cacheManager.clearCache()
    s.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }
}
