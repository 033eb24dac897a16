package graft

import org.apache.spark.sql.functions._

import graft.engine.Catalog
import graft.ops.BloomJoin

/** The explicit-operator complement of [[RuntimeFilterSpec]]: that spec pins
  * Catalyst's own InjectRuntimeFilter firing under tuned thresholds;
  * [[BloomJoin.semiJoinReduce]] is the deterministic form a pipeline calls
  * when it KNOWS the dimension is selective and won't gamble on optimizer
  * heuristics. */
class BloomJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val li = Catalog.load(spark, dir, "lineitem")
    .select("l_orderkey", "l_linenumber", "l_partkey")
  private lazy val smallParts = Catalog.load(spark, dir, "part")
    .filter(col("p_size") === 1)

  private lazy val plainSemi = li
    .join(smallParts, li("l_partkey") === smallParts("p_partkey"), "left_semi")
    .select("l_orderkey", "l_linenumber").collect().toSet

  test("bloom semi-join reduction equals the plain left-semi join") {
    val got = BloomJoin
      .semiJoinReduce(li, smallParts, "l_partkey", "p_partkey")
      .select("l_orderkey", "l_linenumber").collect().toSet
    assert(got == plainSemi)
    assert(got.nonEmpty)
  }

  test("a saturated bloom (tiny capacity, high fpp) still yields the exact result") {
    // Undersized filter → false positives on most probes; the trailing exact
    // semi join must absorb them all. fpp trades shuffle volume, never rows.
    val got = BloomJoin
      .semiJoinReduce(li, smallParts, "l_partkey", "p_partkey",
        expectedItems = 8, fpp = 0.5)
      .select("l_orderkey", "l_linenumber").collect().toSet
    assert(got == plainSemi)
  }

  test("might_contain pre-filter runs on the big side, not after the join") {
    val df = BloomJoin.semiJoinReduce(li, smallParts, "l_partkey", "p_partkey")
    val optimized = df.queryExecution.optimizedPlan
    // the Filter carrying might_contain must sit BELOW the semi join, on the
    // big (left) side — that is the whole point: rows die before the shuffle.
    // (InferFiltersFromConstraints may propagate a copy to the small side
    // too; harmless, so only the left side is pinned.)
    val join = optimized.collectFirst {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.get
    assert(join.left.toString.contains("might_contain"), optimized.toString)
  }
}
