package graft

import org.apache.spark.sql.functions._

import graft.ops.{CacheRegistry, Dedup}

/** The composable ops' internal lazy persists (pair-miner shingle sets) are
  * tracked in [[graft.ops.CacheRegistry]]: one handle per distinct cached
  * plan (re-runs don't grow it), all releasable at a session boundary. */
class CacheRegistrySpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i k"),
      (3L, "z y x w v u t s r q"))
      .toDF("doc_id", "text")
  }

  test("miner persists are tracked, plan-deduped, and releasable") {
    CacheRegistry.releaseAll()
    assert(CacheRegistry.size == 0)

    Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5, 5).count()
    val afterFirst = CacheRegistry.size
    assert(afterFirst > 0, "miner persist was not tracked")

    // Same call again: the canonicalized-plan key dedupes the handle.
    Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5, 5).count()
    assert(CacheRegistry.size == afterFirst, "re-run grew the registry")

    CacheRegistry.releaseAll()
    assert(CacheRegistry.size == 0)
  }

  test("SessionCache eviction on dir change releases tracked miner caches") {
    CacheRegistry.releaseAll()
    Dedup.duplicatedSpans(docs, "doc_id", "text", 5).count()
    assert(CacheRegistry.size > 0)

    // Two inserts under different dirs: the second evicts the first and
    // must also drop the ops' tracked persists.
    val cache = new graft.queries.SessionCache[Int](_ => ())
    cache.getOrElseUpdate(spark, "/tmp/dirA")(1)
    cache.getOrElseUpdate(spark, "/tmp/dirB")(2)
    assert(CacheRegistry.size == 0, "dir-change eviction left miner caches live")
  }
}
