package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed EXACT interpolated percentiles.
  *
  * Spark's built-in exact `percentile` aggregate buffers every distinct
  * (value, count) pair per partition and merges ALL of them on the single
  * final reducer — fine for low-cardinality columns, a scale-killer for a
  * continuous column at 100 TB (the merge is effectively a driver-side
  * collect of the value distribution; measured 5.6 s on 600 k distinct
  * doubles at sf0.1 where a groupBy of the same column is sub-second).
  *
  * This operator computes the same order statistics with bounded shapes
  * only: one hash aggregate to (value, count), the two-phase
  * [[Packing.globalCumsum]] prefix sum for exact global ranks (equal-width
  * deterministic key slices — no sampling, no single-task window), then one
  * aggregate that picks each target index's bracketing values. Shuffle
  * volume is |distinct values|, no task ever holds the distribution.
  *
  * Interpolation follows the shared quantile_cont definition
  * `lo + g·(hi − lo)` with `g = p·(n−1) − floor(p·(n−1))`, spelled in fixed
  * order so results are bit-identical across engines. The key must be an
  * integer column (money goes through cents — the exactness discipline
  * money columns already use here).
  */
object Quantiles {

  /** The shared expensive shape of the exact-percentile family: one hash
    * aggregate to (value, count) plus the two-phase global prefix sum, as a
    * (keyCol, _cnt, _cum, _start) table. NOT persisted here — one-shot
    * callers go through [[exactPercentiles]] (persist + release per call);
    * serve-many callers session-cache the materialized table once and fan
    * it out to every probs set (binning, winsorization, reporting), which
    * is where the cost belongs: the ranked table depends only on the data,
    * not on which percentiles are asked of it. */
  def rankedCounts(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("_cnt"))
    Packing.globalCumsum(counts, keyCol, col("_cnt"), "_cum")
      .withColumn("_start", col("_cum") - col("_cnt"))
  }

  /** One row with `p0..pk` DOUBLE columns: interpolated percentiles served
    * from a precomputed [[rankedCounts]] table (one bounded aggregate over
    * |distinct| rows + an O(probs) scalar pull). */
  def percentilesFromRanked(
      ranked: DataFrame, keyCol: String, probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs == probs.sorted, "probs must be ascending")
    val totals = ranked.agg(sum(col("_cnt")).as("_n"))
    val joined = ranked.crossJoin(broadcast(totals))
    val aggs = probs.zipWithIndex.flatMap { case (p, i) =>
      val idx = s"($p * (_n - 1))"
      Seq(
        expr(s"CAST(min(CASE WHEN _start <= CAST(floor($idx) AS BIGINT) " +
          s"AND CAST(floor($idx) AS BIGINT) < _cum THEN $keyCol END) AS BIGINT)").as(s"_lo$i"),
        expr(s"CAST(min(CASE WHEN _start <= CAST(ceil($idx) AS BIGINT) " +
          s"AND CAST(ceil($idx) AS BIGINT) < _cum THEN $keyCol END) AS BIGINT)").as(s"_hi$i"))
    }
    // The driver pull is O(probs) scalars — the same legitimate budget as
    // the Lloyd centroid collect.
    val row = joined.agg(aggs.head, aggs.tail: _*)
      .crossJoin(broadcast(totals)).head()
    // Re-emit the interpolation over the collected scalars with the IDENTICAL
    // fixed-order spelling (lo + g·(hi − lo), g = p·(n−1) − floor(p·(n−1)))
    // so results are bit-equal to the in-plan formulation.
    def dlit(name: String): String =
      if (row.isNullAt(row.fieldIndex(name))) "CAST(NULL AS DOUBLE)"
      else s"CAST(${row.getLong(row.fieldIndex(name))} AS DOUBLE)"
    val nLit =
      if (row.isNullAt(row.fieldIndex("_n"))) "CAST(NULL AS BIGINT)"
      else s"CAST(${row.getLong(row.fieldIndex("_n"))} AS BIGINT)"
    val cols = probs.zipWithIndex.map { case (p, i) =>
      expr(s"${dlit(s"_lo$i")} + (($p * ($nLit - 1)) - floor($p * ($nLit - 1))) * " +
        s"(${dlit(s"_hi$i")} - ${dlit(s"_lo$i")})").as(s"p$i")
    }
    ranked.sparkSession.range(1).select(cols: _*)
  }

  /** One row with `p0..pk` DOUBLE columns: the interpolated percentiles of
    * integer column `keyCol` at ascending `probs` (in key units). One-shot
    * composition of [[rankedCounts]] + [[percentilesFromRanked]]:
    * materialize the ranked table (globalCumsum evaluates its subtree more
    * than once and two aggregates read it), serve the bracket row EAGERLY,
    * and release the |distinct|-sized cache right away — a lazily returned
    * plan would pin each call's cache for the session lifetime. */
  def exactPercentiles(df: DataFrame, keyCol: String, probs: Seq[Double]): DataFrame = {
    val ranked = rankedCounts(df, keyCol).persist(StorageLevel.MEMORY_AND_DISK)
    try percentilesFromRanked(ranked, keyCol, probs)
    finally ranked.unpersist()
  }

  /** The shared expensive shape of the PER-GROUP percentile family — the
    * grouped analog of [[rankedCounts]]: one (group, value) hash aggregate,
    * a window cumsum PARTITIONED BY the group (distributed across groups;
    * the within-group sort is bounded by that group's distinct values — no
    * global prefix-sum machinery needed), and the per-group totals joined
    * in, as a (groupCol, keyCol, _cnt, _cum, _start, _n) table. Like the
    * global split, NOT persisted here: one-shot callers compose via
    * [[exactPercentilesByGroup]]; serve-many callers session-cache the
    * materialized table once and fan it out to every probs set (grouped
    * reporting, grouped winsorization) — the table depends only on the
    * data, not on which percentiles are asked of it. */
  def groupedRankedCounts(
      df: DataFrame, groupCol: String, keyCol: String): DataFrame =
    rankAndTotal(
      df.groupBy(col(groupCol), col(keyCol)).agg(count(lit(1)).as("_cnt")),
      groupCol, keyCol)

  /** [[groupedRankedCounts]] over PRE-AGGREGATED (group, key, weight)
    * rows — for inputs that are already ranked/counted tables (e.g. a
    * derived key like |cents − median| computed per DISTINCT value and
    * re-ranked carrying its original multiplicity). The weight column is
    * summed per (group, key); everything downstream is identical, so
    * [[percentilesByGroupFromRanked]] serves both forms. */
  def groupedRankedCountsWeighted(
      df: DataFrame, groupCol: String, keyCol: String,
      weightCol: String): DataFrame =
    rankAndTotal(
      df.groupBy(col(groupCol), col(keyCol))
        .agg(sum(col(weightCol)).as("_cnt")),
      groupCol, keyCol)

  private def rankAndTotal(
      counts: DataFrame, groupCol: String, keyCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(keyCol))
    val totals = counts.groupBy(col(groupCol)).agg(sum(col("_cnt")).as("_n"))
    counts
      .withColumn("_cum", sum(col("_cnt")).over(w))
      .withColumn("_start", col("_cum") - col("_cnt"))
      .join(totals, groupCol)
  }

  /** One row per group with `p0..pk` DOUBLE columns: interpolated
    * percentiles served from a precomputed [[groupedRankedCounts]] table —
    * one bounded hash aggregate on the group key. */
  def percentilesByGroupFromRanked(
      ranked: DataFrame, groupCol: String, keyCol: String,
      probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs == probs.sorted, "probs must be ascending")
    val aggs = probs.zipWithIndex.flatMap { case (p, i) =>
      val idx = s"($p * (_n - 1))"
      Seq(
        expr(s"min(CASE WHEN _start <= CAST(floor($idx) AS BIGINT) " +
          s"AND CAST(floor($idx) AS BIGINT) < _cum THEN $keyCol END)").as(s"_lo$i"),
        expr(s"min(CASE WHEN _start <= CAST(ceil($idx) AS BIGINT) " +
          s"AND CAST(ceil($idx) AS BIGINT) < _cum THEN $keyCol END)").as(s"_hi$i"))
    } :+ min(col("_n")).as("_n")
    val brackets = ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    probs.zipWithIndex.foldLeft(brackets) { case (acc, (p, i)) =>
      acc.withColumn(s"p$i", expr(
        s"CAST(_lo$i AS DOUBLE) + (($p * (_n - 1)) - floor($p * (_n - 1))) * " +
          s"(CAST(_hi$i AS DOUBLE) - CAST(_lo$i AS DOUBLE))"))
    }.select(col(groupCol) +: probs.indices.map(i => col(s"p$i")): _*)
  }

  /** Per-group exact interpolated percentiles: one row per `groupCol` value
    * with `p0..pk` columns — the one-shot composition of
    * [[groupedRankedCounts]] + [[percentilesByGroupFromRanked]]. The global
    * variant above exists precisely because dropping the partition key
    * would funnel everything into one task. Shapes: two hash aggregates +
    * one window + one co-partitioned join, all on the group key. */
  def exactPercentilesByGroup(
      df: DataFrame, groupCol: String, keyCol: String,
      probs: Seq[Double]): DataFrame =
    percentilesByGroupFromRanked(
      groupedRankedCounts(df, groupCol, keyCol), groupCol, keyCol, probs)
}
