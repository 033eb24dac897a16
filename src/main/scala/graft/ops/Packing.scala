package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: assign documents, in a stable
  * global order, to fixed-token-budget bins via an exact global prefix sum.
  *
  * The naive formulation — `SUM(n) OVER (ORDER BY id)` with no partition —
  * funnels the whole table through ONE task (Spark warns "No Partition
  * Defined for Window"); at 100 TB that is not a slow plan, it is a dead
  * one. The scalable shape is the classic two-phase scan: range-partition by
  * the order key, cumsum within each partition, then add each partition's
  * broadcast prefix offset. The result is bit-identical to the global window
  * regardless of where the (sampled, nondeterministic) range boundaries
  * land, because offsets restore the exact global sum.
  */
object Packing {

  /** Add `cumCol` = exact global running sum of `valueCol` in `orderCol`
    * order (inclusive of the current row), computed distributed. `orderCol`
    * must be unique and numeric.
    *
    * Partitions are equal-width slices of the key's [min, max] — computed
    * once, applied as a DETERMINISTIC expression. `repartitionByRange` is
    * unusable here: its boundaries come from sampling, and this plan reads
    * the partitioned subtree twice (local cumsums + offsets); two
    * independent evaluations would sample different boundaries and
    * misalign the offsets (observed at sf0.1 — boundaries only coincided by
    * luck at smaller scale). Key-space skew degrades parallelism, never
    * correctness. */
  def globalCumsum(
      df: DataFrame, orderCol: String, valueCol: Column, cumCol: String,
      numPartitions: Int = 0): DataFrame = {
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val bounds = df.agg(
      min(col(orderCol)).cast("long"), max(col(orderCol)).cast("long")).head
    if (bounds.isNullAt(0)) return df.withColumn(cumCol, valueCol)
    val lo = bounds.getLong(0)
    val span = bounds.getLong(1) - lo + 1
    val width = math.max(1L, (span + parts - 1) / parts)
    val parted = df
      .withColumn("_v", valueCol)
      .withColumn("_pid", ((col(orderCol).cast("long") - lo) / width).cast("int"))
    val local = parted.withColumn("_lcum",
      sum(col("_v")).over(Window.partitionBy("_pid").orderBy(orderCol)))
    // One row per partition — driver-scale; its ordered window is trivial.
    val offsets = parted.groupBy(col("_pid")).agg(sum(col("_v")).as("_psum"))
      .withColumn("_off", coalesce(
        sum(col("_psum")).over(
          Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("_pid"), col("_off"))
    local.join(broadcast(offsets), "_pid")
      .withColumn(cumCol, col("_lcum") + col("_off"))
      .drop("_pid", "_lcum", "_v")
  }

  /** Pack rows into sequential bins of ≤ `budget` tokens (greedy in
    * `orderCol` order, offset-based: a row's bin is the number of whole
    * budgets consumed before it). Adds `n`→tokens, `cum`→global prefix sum,
    * `bin`→bin id. */
  def packSequences(
      df: DataFrame, orderCol: String, tokens: Column, budget: Int): DataFrame =
    globalCumsum(df.withColumn("n", tokens), orderCol, col("n"), "cum")
      .withColumn("bin", expr(s"(cum - n) div $budget"))
}
