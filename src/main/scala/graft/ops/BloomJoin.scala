package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter semi-join reduction — a runtime filter built over the small
  * side's join keys and applied to the big side BEFORE its shuffle.
  *
  * The reference's planner reduces join input only through static predicate
  * pushdown (minidbs-core optimizer: predicates move below joins, but a
  * join key set is not a predicate it can push). At 100 TB the difference
  * is decisive for selective dimension joins: a plain shuffle join writes
  * the entire fact table to shuffle before dropping the 98% of rows with no
  * partner, while a semi-join reduction drops them at the scan for the cost
  * of shipping one ~MB sketch. This is the manual, operator-level form of
  * Catalyst's own `InjectRuntimeFilter` (which only fires under stats
  * thresholds); building it explicitly makes the reduction deterministic
  * and lets pipelines apply it where the optimizer's heuristics demur.
  */
object BloomJoin {

  /** `big ⋉ small` on `bigKey = smallKey`, with the big side pre-filtered by
    * a Bloom filter aggregated distributively over `small`'s keys (partial
    * sketches merged by OR — one scalar-subquery job, no driver collect of
    * key data). Result-identical to the plain LEFT SEMI join: the exact semi
    * join afterwards removes Bloom false positives, so `fpp` trades shuffle
    * volume, never correctness. Keys are xxhash64-folded on both sides —
    * the same build/probe pairing Catalyst's runtime filter uses.
    */
  def semiJoinReduce(
      big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
      expectedItems: Long = 1L << 20, fpp: Double = 0.01): DataFrame = {
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val bloomDf = small.agg(Bridge.column(
      new BloomFilterAggregate(
        Bridge.expression(xxhash64(col(smallKey))),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression()))
    val mightContain = Bridge.column(BloomFilterMightContain(
      ScalarSubquery(bloomDf.queryExecution.analyzed),
      Bridge.expression(xxhash64(big(bigKey)))))
    big.where(mightContain)
      .join(small, big(bigKey) === small(smallKey), "left_semi")
  }
}
